"""Pushdown-capable Python DataSource: pruning + filter routing pins."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from keycloak_event_stream_spark.sources import pygen


def _read(spark, audit):
    return pygen.read_eventgen(spark, audit)


def test_shard_filter_prunes_partitions(spark):
    audit = pygen._tmp_audit()
    df = _read(spark, audit).filter(F.col("shard") == 3)
    rows = df.collect()
    assert len(rows) == pygen._ROWS
    assert {r.shard for r in rows} == {3}
    a = json.load(open(audit))
    os.unlink(audit)
    # EqualTo(shard) consumed at planning time -> 1 of 8 partitions
    assert a["planned_partitions"] == 1
    assert a["total_shards"] == 8
    assert any("EqualTo" in p and "shard" in p for p in a["pushed"])


def test_row_filter_pushed_and_residual_split(spark):
    audit = pygen._tmp_audit()
    df = _read(spark, audit).filter(
        (F.col("shard") >= 5)
        & (F.col("event_type") == "click")
        & (F.col("amount") > 100)
    )
    n = df.count()
    a = json.load(open(audit))
    os.unlink(audit)
    assert a["planned_partitions"] == 3  # shards 5,6,7
    assert any("event_type" in p for p in a["pushed"])
    # the amount predicate must stay residual (source doesn't claim it)
    assert any("amount" in r for r in a["residual"])
    # and Spark must still evaluate it above the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan and "amount" in plan
    # values correct despite the split evaluation
    brute = [
        pygen._gen_row(s, s * pygen._ROWS + i)
        for s in range(8)
        for i in range(pygen._ROWS)
    ]
    want = sum(
        1
        for (s, _, t, amt) in brute
        if s >= 5 and t == "click" and amt > 100
    )
    assert n == want


def test_unfiltered_scan_reads_all_shards(spark):
    audit = pygen._tmp_audit()
    df = _read(spark, audit)
    assert df.count() == 8 * pygen._ROWS
    a = json.load(open(audit))
    os.unlink(audit)
    assert a["planned_partitions"] == 8
    assert a["pushed"] == []
