"""Vector-operator semantics (llm/vectors.py). Oracle parity is proven
by the harness; these pin the mathematical invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from keycloak_event_stream_spark.llm.vectors import (
    q_embed_centroid,
    q_embed_norm,
    q_embed_quantize,
)
from tests.conftest import SF_DIR


def test_embed_norm_unit_length(spark):
    rows = q_embed_norm(spark, SF_DIR).collect()
    assert rows
    by_vec: dict = {}
    for r in rows:
        assert r["l2"] > 0
        by_vec.setdefault(r["vec_id"], []).append((r["pos"], r["unit_val"]))
    for vec_id, cells in by_vec.items():
        assert sorted(p for p, _ in cells) == list(range(64))
        unit_l2 = math.sqrt(sum(x * x for _, x in cells))
        assert abs(unit_l2 - 1.0) < 1e-9


def test_embed_centroid_matches_plain_mean(spark):
    cents: dict = {}
    for r in q_embed_centroid(spark, SF_DIR).collect():
        cents.setdefault(r["label"], {})[r["pos"]] = r["mean_val"]
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("label", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    by_label: dict = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r["v"])
    assert set(cents) == set(by_label)
    for label, vecs in by_label.items():
        n = len(vecs)
        for d in range(64):
            expect = sum(v[d] for v in vecs) / n
            assert abs(cents[label][d] - expect) < 1e-12


def test_embed_quantize_bounds_and_monotonic(spark):
    rows = q_embed_quantize(spark, SF_DIR).collect()
    assert rows
    by_vec: dict = {}
    for r in rows:
        assert r["mn"] < r["mx"]
        assert -128 <= r["q8_val"] <= 127
        by_vec.setdefault(r["vec_id"], []).append(r["q8_val"])
    for q8 in by_vec.values():
        assert len(q8) == 64
        # extremes map to the ends of the range
        assert max(q8) == 127
        assert min(q8) == -128


def test_pq_codes_shape_and_self_encoding(spark):
    from keycloak_event_stream_spark.catalog import load_table
    from keycloak_event_stream_spark.llm.vectors import q_embed_pq

    rows = q_embed_pq(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    by_vec: dict = {}
    for r in rows:
        assert 0 <= r.code < 16
        by_vec.setdefault(r.vec_id, {})[r.subspace] = r.code
    assert len(by_vec) == emb.count()
    for codes in by_vec.values():
        assert sorted(codes) == list(range(8))
    # codebook vectors must encode to themselves (distance 0, tiebreak
    # by centroid id can only matter on exact duplicates)
    for vid in range(16):
        assert [by_vec[vid][s] for s in range(8)] == [vid] * 8


def test_pca_power_eigenpair_quality(spark):
    import math

    from keycloak_event_stream_spark.llm.vectors import (
        _PCA_D,
        q_embed_pca_power,
        q_embed_covariance,
    )

    rows = q_embed_pca_power(spark, SF_DIR).collect()
    assert [r["dim"] for r in rows] == list(range(1, _PCA_D + 1))
    v = [r["loading"] for r in rows]
    lam = rows[0]["eigenvalue"]
    assert len({r["eigenvalue"] for r in rows}) == 1
    # unit norm and sign convention
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12
    assert v[0] >= 0
    # eigenpair residual: ||Cv - lam*v|| small relative to lam
    cells = {
        (r["i"], r["j"]): r["cov"]
        for r in q_embed_covariance(spark, SF_DIR).collect()
    }
    C = [
        [cells[(min(i, j), max(i, j))] for j in range(1, _PCA_D + 1)]
        for i in range(1, _PCA_D + 1)
    ]
    Cv = [sum(C[i][j] * v[j] for j in range(_PCA_D)) for i in range(_PCA_D)]
    resid = math.sqrt(sum((Cv[i] - lam * v[i]) ** 2 for i in range(_PCA_D)))
    assert lam > 0
    assert resid < 0.05 * lam
