"""Round-3 ADVICE regression pins.

Four defects the round-2 advisor flagged, each pinned with the fixture
shape that previously only passed by luck (or quietly planned a
scale-hostile join):

1. q_session_metrics — Spark floors gaps to whole seconds
   (``ts.cast('long')``); the oracle previously used fractional
   ``epoch()`` differences, so microsecond timestamps straddling the
   1800 s boundary could disagree. Both sides now use floored-second
   gaps; pinned with a boundary-straddling fixture.
2. q_growth_accounting — DuckDB ``//`` truncates toward zero while
   Spark ``floor()`` floors, diverging for events before the anchor
   date. Oracle now spells ``floor(.../7.0)``; pinned with a
   pre-anchor fixture.
3. q_stickiness — the trailing-30-day MAU was a pure range-predicate
   join (BroadcastNestedLoopJoin, O(|user-days| x |days|)); now an
   explode-to-covered-days equi-join. Pinned by a plan assertion.
4. q_log_loss_brier — sigmoid saturates to exactly 0/1 for
   |score| >~ 37, making ln(0) = -Inf -> NULL silently dropped from
   the decimal sum. Probability now clamped in both engines; pinned
   with a saturating fixture.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pytest

from keycloak_event_stream_spark.registry import collect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES, ORACLE = collect()


def _run_both(spark, name, sf_dir, tables):
    """Run the registered Spark query and its DuckDB oracle on the
    crafted fixture dir; return (spark_rows, duck_rows) as dicts."""
    sdf = QUERIES[name](spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.isdir(p):  # Spark writes a directory of part files
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    res = con.execute(ORACLE[name])
    cols = [d[0] for d in res.description]
    drows = [dict(zip(cols, r)) for r in res.fetchall()]
    return srows, drows


def _write_events(spark, sf_dir, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def test_session_gap_boundary_straddle(spark, tmp_path):
    """Fractional gap > 1800 s but floored gap == 1800 s: the pair must
    stay in ONE session on both sides (floored discipline), where the
    old fractional oracle would have split it."""
    sf = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 700_000)
    rows = [
        # straddler: fractional gap 1800.2s (would break), but
        # floor(t1)-floor(t0) = 1800 exactly -> same session
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=1800, microseconds=200_000), 1, "click", 1.0, "{}"),
        # clean break: floored gap 1801s -> new session
        (2, t0 + dt.timedelta(seconds=3602), 1, "click", 1.0, "{}"),
        # reverse straddle: fractional gap 1799.8s, floored 1799s -> same session
        (3, dt.datetime(2024, 1, 2, 0, 0, 0, 900_000), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 0, 30, 0, 700_000), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    srows, drows = _run_both(spark, "q_session_metrics", sf, ["events"])
    assert srows[0]["n_sessions"] == drows[0]["n_sessions"] == 3
    assert srows[0] == pytest.approx(drows[0])


def test_growth_accounting_pre_anchor_weeks(spark, tmp_path):
    """Events before the 2024-01-01 anchor produce negative week
    indices; floor(-17/7) = -3 on both sides (DuckDB ``//`` alone would
    say -2)."""
    sf = str(tmp_path)
    rows = [
        (0, dt.datetime(2023, 12, 15, 12, 0, 0), 1, "click", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 3, 12, 0, 0), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 3, 13, 0, 0), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, sf, rows)
    srows, drows = _run_both(spark, "q_growth_accounting", sf, ["events"])
    weeks_s = sorted(r["week"] for r in srows)
    weeks_d = sorted(r["week"] for r in drows)
    assert weeks_s == weeks_d
    assert min(weeks_s) == -3  # floor semantics, not truncation
    key = lambda r: r["week"]  # noqa: E731
    assert sorted(srows, key=key) == sorted(drows, key=key)


def test_stickiness_plan_has_no_nested_loop_join(spark):
    plan = QUERIES["q_stickiness"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_log_loss_saturated_sigmoid_stays_finite(spark, tmp_path):
    """|score| = 50 saturates sigmoid to exactly 0.0/1.0 in double math;
    the clamp keeps every ln() finite and both engines agreeing."""
    sf = str(tmp_path)
    emb = spark.createDataFrame(
        [
            (0, [50.0] + [0.0] * 63, 1),   # y=1, p -> 1 (clamped)
            (1, [-50.0] + [0.0] * 63, 9),  # y=0, p -> 0 (clamped)
            (2, [50.0] + [0.0] * 63, 9),   # y=0, p -> 1: worst case ln(1-p)
            (3, [0.5] + [0.0] * 63, 1),    # ordinary row
        ],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    srows, drows = _run_both(spark, "q_log_loss_brier", sf, ["embeddings"])
    s, d = srows[0], drows[0]
    assert s["n"] == d["n"] == 4
    assert s["log_loss"] is not None and math.isfinite(s["log_loss"])
    # the clamped worst-case term dominates: -ln(1e-15) / 4 ~ 8.6
    assert s["log_loss"] == pytest.approx(d["log_loss"], rel=1e-9)
    assert s["brier"] == pytest.approx(d["brier"], rel=1e-9)
