"""Observation API: in-flight metrics without a second scan — the
monitoring surface a production pipeline attaches to every landed
batch (row counts, null rates, domain violations) for free during the
action itself."""

from __future__ import annotations

from conftest import SF_DIR
from pyspark.sql import Observation
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table


def test_observe_collects_metrics_during_action(spark):
    ev = load_table(spark, SF_DIR, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("event_type").isNull(), 1).otherwise(0)
        ).alias("null_types"),
        F.min("ts").alias("min_ts"),
    )
    # one action drives both the query result and the metrics
    n = observed.filter(F.col("event_type") == "purchase").count()
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["null_types"] == 0
    assert m["min_ts"] is not None
    assert 0 < n < m["n_rows"]


def test_observe_composes_with_multiband(spark):
    from keycloak_event_stream_spark.operators.insights import (
        q_multiband_singlescan,
    )

    row = q_multiband_singlescan(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    # spot-check one band against a direct filter
    want = ev.filter(
        (F.hour("ts").between(18, 20)) & (F.col("event_type") == "error")
    ).count()
    assert row.h18_20_errors == want
    # all eight bands are disjoint subsets of the table
    total = sum(row[i] for i in range(8))
    assert total <= ev.count()
