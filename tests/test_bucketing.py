"""Bucketed co-located joins: the pre-paid-shuffle layout, verified at
the plan level (no Exchange on either join side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table
from keycloak_event_stream_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", 8)
    write_bucketed(cust, "b_customer", "o_custkey", 8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, lt, rt, "o_custkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # both sides bucket-aligned
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, "o_custkey").count()
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    expect = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert got == expect


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    df = (
        spark.table(lt)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key = bucket key
