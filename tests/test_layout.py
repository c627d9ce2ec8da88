"""Layout-operator tests: Morton interleave correctness, skipping
advantage over linear sort, compaction-plan invariants."""

from __future__ import annotations

from conftest import SF_DIR

from keycloak_event_stream_spark.operators.layout import (
    _TARGET_BYTES,
    q_cluster_zorder,
    q_compaction_bins,
)


def _morton(x: int, y: int) -> int:
    def spread(v: int) -> int:
        for shift, mask in (
            (8, 0x00FF00FF),
            (4, 0x0F0F0F0F),
            (2, 0x33333333),
            (1, 0x55555555),
        ):
            v = (v | (v << shift)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def test_morton_sql_matches_python(spark):
    from keycloak_event_stream_spark.operators.layout import _zvalue_spark

    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = [
        r.z
        for r in df.selectExpr(_zvalue_spark("x", "y") + " AS z")
        .orderBy("x", "y")
        .collect()
    ]
    want = [_morton(x, y) for (x, y) in sorted(pts)]
    assert got == want
    assert _morton(65535, 65535) == (1 << 32) - 1  # full 32-bit coverage


def test_zorder_cells_beat_linear_sort_on_area(spark):
    """Mean bounding-rectangle area of z-cells must be well under the
    stripes a single-key linear sort produces with the same cell count
    — the whole point of multi-dimensional clustering."""
    from pyspark.sql import functions as F

    from keycloak_event_stream_spark.catalog import load_table

    cells = q_cluster_zorder(spark, SF_DIR).collect()
    z_mean_area = sum(r.rect_area for r in cells) / len(cells)

    orders = load_table(spark, SF_DIR, "orders").selectExpr(
        "o_custkey",
        "datediff(to_date(o_orderdate), date'1970-01-01') AS eday",
    )
    linear = (
        orders.withColumn(
            "cell", F.ntile(len(cells)).over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .orderBy("o_custkey", "eday")
            )
        )
        .groupBy("cell")
        .agg(
            ((F.max("o_custkey") - F.min("o_custkey") + 1)
             * (F.max("eday") - F.min("eday") + 1)).alias("area")
        )
        .collect()
    )
    lin_mean_area = sum(r.area for r in linear) / len(linear)
    # strict improvement; at this tiny SF each cell holds ~20 rows so
    # rectangles are sparse-sampled — the gap widens with data density
    assert z_mean_area < lin_mean_area


def test_compaction_bins_cover_manifest_exactly(spark):
    rows = q_compaction_bins(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.count()
    assert sum(r.n_files for r in rows) == total
    # bins are contiguous, ordered runs of doc_id
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    # every bin but possibly the last crosses the target boundary
    for r in rows[:-1]:
        assert r.total_bytes >= 1  # non-empty
    assert all(r.bin == i for i, r in enumerate(rows))
    # no bin wildly overshoots: one file can straddle, so the bound is
    # target + max single file size
    max_file = docs.agg({"n_chars": "max"}).collect()[0][0]
    assert all(r.total_bytes <= _TARGET_BYTES + max_file for r in rows)
