"""Sketch-operator properties: CMS one-sided error and consistency."""

from __future__ import annotations

from conftest import SF_DIR

from keycloak_event_stream_spark.operators.sketches import q_sketch_cms


def test_cms_overestimates_only_and_is_consistent(spark):
    r = q_sketch_cms(spark, SF_DIR).collect()[0]
    # CMS never undercounts: total estimate >= total exact, and the
    # worst per-user error is non-negative.
    assert r.total_est >= r.total_exact
    assert r.max_over >= 0
    assert 0 <= r.n_overestimated <= r.n_users
    # every event is attributed to exactly one user
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert r.total_exact == n_events


def test_cms_exact_when_no_collisions(spark):
    """With far fewer keys than buckets and distinct hash rows, the
    sketch should be exact (min over rows kills stray collisions)."""
    import keycloak_event_stream_spark.operators.sketches as mod

    df = spark.createDataFrame(
        [(i % 7,) for i in range(700)], "user_id bigint"
    )
    orig = mod.load_table
    try:
        mod.load_table = lambda s, d, n: df
        r = q_sketch_cms(spark, "ignored").collect()[0]
    finally:
        mod.load_table = orig
    assert r.n_users == 7
    assert r.total_est == r.total_exact == 700
    assert r.max_over == 0 and r.n_overestimated == 0
