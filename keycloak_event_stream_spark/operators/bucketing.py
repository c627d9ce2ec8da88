"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant join cost is the shuffle of the fact tables.
Bucketing both sides of a recurring join key at write time
(``bucketBy(n, key)``) stores each table pre-partitioned by
``hash(key) % n``; Catalyst then plans the join with **no Exchange on
either side** — the shuffle is paid once at ingest instead of per
query. The same layout serves bucketed aggregation (no exchange before
the partial agg when grouping on the bucket key).

The reference stores data partitioned only by dt/hour
(`terraform/main.tf:169-177`) and delegates all join-less queries to
Athena, so it never needed this; our engine adds joins (SURVEY §2.3)
and therefore the layout that makes them cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally enables merge-join
    without a sort step."""
    w = df.write.bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: planned shuffle-free (SortMergeJoin over bucket-aligned
    scans, zero Exchange operators)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
