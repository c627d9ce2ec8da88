"""Round-4 ADVICE regression pins.

Three fixture-shaped defects the round-3 advisor flagged:

1. s_session_flags — the oracle closes sessions with
   ``session_end <= max(ts) - 1h``; whether Spark's append-mode
   session_window emission at the EXACT watermark boundary is
   inclusive was untested. Probed empirically (Spark 4.1): a session
   whose end equals the watermark to the microsecond IS emitted
   (inclusive eviction), so the oracle's ``<=`` is the engine's rule.
   Pinned here with a boundary fixture so an engine upgrade that
   flips the rule fails loudly instead of hash-mismatching at sf0.01.
2. q_churn_hazard_weekly — Spark exploded every calendar week in each
   user's span while the oracle only kept weeks with corpus-wide
   activity; week-dense fixtures hid the divergence. Spark now
   semi-joins the exploded weeks against the observed-week spine;
   pinned with a sparse fixture whose span crosses an empty week.
3. q_first_last_touch_compare — the ordering key was a zero-padded
   string (``lpad(event_id, 10)``) that silently TRUNCATES event_ids
   beyond 10 digits, collapsing distinct keys and leaving the
   tie-break to engine whim. Both engines now order on a numeric
   (epoch_us, event_id) struct; pinned with 11-digit event_ids.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from keycloak_event_stream_spark.registry import collect

QUERIES, ORACLE = collect()

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_events_file(sf_dir, rows):
    """Single-FILE events.parquet (the testdata layout — the streaming
    file source glob-filters on the literal file name, so a directory
    of part files would silently feed it zero rows)."""
    pdf = pd.DataFrame(rows, columns=_EVENT_COLS)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(sf_dir, "events.parquet"),
    )


def _run_both(spark, name, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    con = duckdb.connect()
    p = os.path.join(sf_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    res = con.execute(ORACLE[name])
    cols = [d[0] for d in res.description]
    drows = [dict(zip(cols, r)) for r in res.fetchall()]
    return srows, drows


def test_session_flags_watermark_boundary_inclusive(spark, tmp_path):
    """Session end EXACTLY on (max event time - 1 h): emitted by the
    engine AND included by the oracle's <=; one microsecond past the
    watermark: withheld by both."""
    sf = str(tmp_path)
    rows = [
        # session [00:00:00, 00:30:00): end == watermark -> emitted
        (0, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
        # session end 00:30:00.000001 > watermark -> withheld
        (1, dt.datetime(2024, 1, 1, 0, 0, 0, 1), 3, "purchase", 1.0, "{}"),
        # horizon event: watermark = 01:30:00 - 1h = 00:30:00
        (2, dt.datetime(2024, 1, 1, 1, 30, 0), 2, "purchase", 1.0, "{}"),
    ]
    _write_events_file(sf, rows)
    srows, drows = _run_both(spark, "s_session_flags", sf)
    assert sorted(r["user_id"] for r in srows) == [1]
    assert sorted(r["user_id"] for r in drows) == [1]
    (s,) = srows
    (d,) = drows
    assert s["session_end"] == d["session_end"]
    assert (s["has_view"], s["has_purchase"]) == (1, 0)


def test_churn_hazard_skips_corpus_empty_weeks(spark, tmp_path):
    """User 1 spans weeks 0..4 but the corpus has zero events in weeks
    1 and 3: neither engine may emit at-risk rows for the empty weeks,
    and the at-risk counts must agree on the observed ones."""
    sf = str(tmp_path)

    def at(day, hour=12):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=hour)

    rows = [
        # user 1 active weeks 0, 2, 4 (span covers empty weeks 1, 3)
        (0, at(0), 1, "click", 1.0, "{}"),
        (1, at(14), 1, "click", 1.0, "{}"),
        (2, at(28), 1, "click", 1.0, "{}"),
        # user 2 active weeks 2, 5 (week 5 = horizon, excluded)
        (3, at(15), 2, "view", 1.0, "{}"),
        (4, at(35), 2, "view", 1.0, "{}"),
    ]
    _write_events_file(sf, rows)
    srows, drows = _run_both(spark, "q_churn_hazard_weekly", sf)
    weeks_s = sorted(r["week"] for r in srows)
    weeks_d = sorted(r["week"] for r in drows)
    # observed weeks below the horizon (5): 0, 2, 4 — never 1 or 3
    assert weeks_s == weeks_d == [0, 2, 4]
    key = lambda r: r["week"]  # noqa: E731
    assert sorted(srows, key=key) == sorted(drows, key=key)


def test_first_last_touch_survives_wide_event_ids(spark, tmp_path):
    """11-digit event_ids at an identical timestamp: the numeric
    struct key must order them by full value (the old 10-char lpad
    truncated 10000000001 and 10000000002 to the same prefix on both
    sides, leaving the first/last pick to tie-break luck)."""
    sf = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # two prior touches at the SAME instant, ids 11 digits apart
        (10_000_000_002, t0, 1, "view", 1.0, "{}"),
        (10_000_000_001, t0, 1, "click", 1.0, "{}"),
        (10_000_000_009, t0 + dt.timedelta(hours=1), 1, "purchase", 1.0, "{}"),
    ]
    _write_events_file(sf, rows)
    srows, drows = _run_both(spark, "q_first_last_touch_compare", sf)
    key = lambda r: r["channel"]  # noqa: E731
    srows, drows = sorted(srows, key=key), sorted(drows, key=key)
    assert srows == drows
    by_ch = {r["channel"]: r for r in srows}
    # id 10_000_000_001 (click) is first touch; ...002 (view) is last
    assert by_ch["click"]["first_credits"] == 1
    assert by_ch["view"]["last_credits"] == 1
