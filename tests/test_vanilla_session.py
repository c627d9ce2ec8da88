"""Session-independence: queries must be correct on a caller-supplied
default Spark 4 session, not only under the engine's ``session.py``.

The driver evaluates with default confs, where tz-naive parquet
timestamps infer as TIMESTAMP_NTZ
(``spark.sql.parquet.inferTimestampNTZ.enabled=true``) and the
event-time surface (withWatermark/window/unix_millis) rejects NTZ.
Round-1 failure mode: 9 queries threw AnalysisException. The fix is the
``catalog.normalize_ntz`` boundary cast; these tests pin it.
"""

from __future__ import annotations

import os

import pytest

from keycloak_event_stream_spark.catalog import load_table, table_path
from keycloak_event_stream_spark.registry import collect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# the 9 round-1 vanilla-session casualties (VERDICT.md "What's wrong" #1)
AFFECTED = [
    "q_sessionize",
    "q_time_to_convert",
    "q_interval_merge",
    "s_tumbling_counts",
    "s_sliding_agg",
    "s_session_windows",
    "s_watermark_late",
    "s_stream_dedup",
    "s_stream_stream_join",
]


@pytest.fixture(scope="module")
def vanilla(spark):
    """A session with driver-like defaults: NTZ inference ON."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.session.timeZone", "UTC")
    return s2


def test_fixture_infers_ntz_under_vanilla(vanilla):
    """Precondition: the raw fixture really is NTZ under driver confs —
    otherwise these tests silently stop testing anything."""
    raw = vanilla.read.parquet(table_path(SF_DIR, "events"))
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"


def test_load_table_normalizes_ntz(vanilla):
    df = load_table(vanilla, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("name", AFFECTED)
def test_affected_query_runs_under_vanilla(vanilla, name):
    queries, _ = collect()
    df = queries[name](vanilla, SF_DIR)
    df.limit(5).collect()  # must not raise


def test_sessionize_values_match_engine_session(spark, vanilla):
    """Not just 'does not throw': same rows under both sessions."""
    queries, _ = collect()
    a = queries["q_sessionize"](spark, SF_DIR)
    b = queries["q_sessionize"](vanilla, SF_DIR)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
