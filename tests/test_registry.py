"""Driver-contract invariants: registry completeness and exact-sum
helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from keycloak_event_stream_spark.operators._exact import davg, dsum
from keycloak_event_stream_spark.registry import collect

# rows-only by design: approximate or non-SQL-expressible (documented in
# each op's docstring; the driver records the weaker check).
# Round 4 emptied the set: the two mergeable sketches (q_sketch_hll,
# q_sketch_quantiles) now carry exact counts + within-bound flags on
# the hashed surface (the q_agg_approx_distinct pattern), so all 479
# registered queries are value-checked.
ROWS_ONLY: set[str] = set()


def test_registry_collects_without_errors(capsys):
    queries, oracle = collect()
    err = capsys.readouterr().err
    assert "skipping" not in err, f"broken module: {err}"
    assert len(queries) >= 50
    assert set(oracle) <= set(queries)


def test_every_query_is_oracle_checked_or_declared():
    queries, oracle = collect()
    missing = set(queries) - set(oracle) - ROWS_ONLY
    assert not missing, f"queries without oracle twin: {sorted(missing)}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema
    assert set(E.oracle_sql()) <= set(E.queries())


def test_dsum_order_independent(spark):
    vals = [(0.1,), (0.2,), (0.3,)] * 1000
    df = spark.createDataFrame(vals, "v double")
    a = df.repartition(1).agg(dsum("v", "s")).collect()[0].s
    b = df.repartition(7).agg(dsum("v", "s")).collect()[0].s
    assert a == b == 600.0  # decimal accumulate: no float drift either way


def test_davg(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "v double")
    got = df.agg(davg("v", "m")).collect()[0].m
    assert got == 7.0 / 3


def test_nulls_excluded_from_avg(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    got = df.agg(davg("v", "m"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert got.m == 2.0 and got.n == 3


def test_priority_queries_register_first():
    """The driver's correctness report caps at the first ~50 registered
    queries; the riskiest/newest operators must occupy that window and
    every priority name must actually exist."""
    from keycloak_event_stream_spark.registry import _PRIORITY

    queries, _ = collect()
    names = list(queries)
    assert names[: len(_PRIORITY)] == _PRIORITY
    assert not set(_PRIORITY) - set(queries)


def test_no_duplicate_query_names_within_a_module():
    """registry.collect() raises on cross-module duplicates, but a
    name registered twice in the SAME module silently overwrites the
    first (dict assignment) — which is how a round-2 addition once
    clobbered an existing operator. Scan the decorator sites."""
    import glob
    import os
    import re
    from collections import Counter

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "keycloak_event_stream_spark",
    )
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path).read()
        names = re.findall(r'@_q\(\s*\n?\s*"([^"]+)"', src)
        dups = [n for n, c in Counter(names).items() if c > 1]
        assert not dups, f"{path}: duplicate @_q registrations {dups}"
