"""Semantics tests for the VARIANT family and native Python UDTFs."""

from __future__ import annotations

from conftest import SF_DIR

from keycloak_event_stream_spark.functions.udtf import (
    q_udtf_first_seen,
    q_udtf_partition_agg,
)
from keycloak_event_stream_spark.functions.variant import (
    q_variant_invalid,
    q_variant_nested,
    q_variant_parse,
)


def test_variant_parse_matches_from_json(spark):
    """variant_get('$.k') agrees with the map-decode path row-for-row."""
    from pyspark.sql import functions as F

    from keycloak_event_stream_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    mism = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("a"),
        F.get_json_object("props", "$.k").cast("bigint").alias("b"),
    ).filter("a IS DISTINCT FROM b")
    assert mism.count() == 0


def test_variant_parse_shapes(spark):
    rows = q_variant_parse(spark, SF_DIR).collect()
    assert [r.event_type for r in rows] == sorted(r.event_type for r in rows)
    assert all(r.min_k >= 0 and r.max_k <= 99 for r in rows)
    assert sum(r.n_events for r in rows) == 1000  # sf0.001 events rows


def test_variant_nested_array_index(spark):
    rows = q_variant_nested(spark, SF_DIR).collect()
    # tags[1] = 2k, filtered to % 3 == 0 -> every kept doc has k % 3 == 0
    assert rows and all(r.sum_tag1 % 3 == 0 for r in rows)


def test_variant_invalid_counts(spark):
    rows = q_variant_invalid(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_valid + r.n_invalid == r.n_rows
        assert r.n_invalid > 0  # the k%10==0 rows really were truncated
        assert r.sum_valid_k % 10 != 0 or r.sum_valid_k >= 0


def test_udtf_first_seen_dedups_in_order(spark):
    """The UDTF emits each word once, at its first position."""
    from keycloak_event_stream_spark.functions.udtf import _register_first_seen

    _register_first_seen(spark)
    spark.createDataFrame(
        [(1, "b a b c a")], "doc_id int, text string"
    ).createOrReplaceTempView("_t_docs")
    got = spark.sql(
        "SELECT s.pos, s.word FROM _t_docs d, LATERAL t_first_seen(d.text) s"
        " ORDER BY s.pos"
    ).collect()
    assert [(r.pos, r.word) for r in got] == [(1, "b"), (2, "a"), (4, "c")]


def test_udtf_first_seen_runs_on_fixture(spark):
    rows = q_udtf_first_seen(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 100
    # document-frequency is bounded by the corpus size
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert all(0 < r.n_docs <= n_docs for r in rows)


def test_udtf_partition_agg_matches_builtin(spark):
    from pyspark.sql import functions as F

    from keycloak_event_stream_spark.catalog import load_table

    got = {
        r.event_type: (r.n, r.sum_k, r.max_user)
        for r in q_udtf_partition_agg(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        r.event_type: (r.n, r.sum_k, r.max_user)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.get_json_object("props", "$.k").cast("bigint")
            ).alias("sum_k"),
            F.max("user_id").alias("max_user"),
        )
        .collect()
    }
    assert got == want
