"""Semantics tests for corpus-profiling additions (llm/textstats.py):
repetition signals and Zipf fit."""

from __future__ import annotations

from conftest import SF_DIR
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table
from keycloak_event_stream_spark.llm.textstats import (
    q_doc_repetition,
    q_zipf_fit,
)


def test_repetition_covers_all_sources_and_bounds(spark):
    rows = q_doc_repetition(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(rows) == n_sources
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        # distinct tokens can never exceed total tokens
        assert 0 < r.total_distinct <= r.total_tokens
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0 <= r.n_repetitive <= r.n_docs


def test_repetition_flags_synthetic_repeater(spark):
    # a doc that is one bigram repeated must be flagged; a doc of all
    # unique tokens must not
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b a b", "s"),
            (2, "q w e r t y u i o p", "s"),
        ],
        "doc_id long, text string, source string",
    )
    base = df.select(
        "doc_id",
        F.split("text", " ").alias("l"),
    ).select(
        "doc_id",
        F.size("l").alias("n_tokens"),
        F.explode(
            F.expr(
                "transform(slice(l, 1, size(l) - 1),"
                " (x, i) -> concat(x, ' ', l[i + 1]))"
            )
        ).alias("bigram"),
    )
    top = (
        base.groupBy("doc_id", "n_tokens", "bigram")
        .count()
        .groupBy("doc_id", "n_tokens")
        .agg(F.max("count").alias("top"))
        .collect()
    )
    flags = {
        r.doc_id: r.top * 5 > r.n_tokens - 1 for r in top
    }
    assert flags[1] is True
    assert flags[2] is False


def test_zipf_slope_negative(spark):
    row = q_zipf_fit(spark, SF_DIR).collect()[0]
    assert 0 < row.n_terms <= 100  # vocab may be < 100 at tiny SF
    # frequencies decay with rank: slope must be negative, and for a
    # word-bag corpus should be sane (not steeper than -3)
    assert -3.0 < row.zipf_slope < 0.0
    # intercept = mean(y) - slope*mean(x) > 0 (ln of counts >= 1)
    assert row.zipf_intercept > 0.0
