"""Mergeable sketch aggregates (approximate, constant-memory).

At 100 TB exact distinct/percentile either shuffles every value or
sorts; sketches shuffle kilobytes per group and merge associatively —
the only viable shape for interactive cardinality/quantile queries at
that scale. All entries are approximate by nature, so the driver
records the weaker rows-only check (`__spark_entry__` contract); the
unit tests pin accuracy envelopes instead.

- HLL (Apache DataSketches via hll_sketch_agg): build per-group, merge
  across groups with hll_union_agg — the two-level rollup pattern where
  the re-aggregation consumes sketches, not raw data.
- KLL-style quantiles via percentile_approx (t-digest-like bounded
  error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table, spread

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


@_q("q_sketch_hll")  # approximate — rows-only check
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup: per-(type) user sketches, then a grand
    total by *merging sketches* (hll_union_agg) — the raw data is read
    once; the second level aggregates bytes. This is how per-partition
    cardinality rolls up to corpus cardinality without a second scan."""
    ev = spread(load_table(spark, sf_dir, "events"))
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    leveled = per_type.select(
        "event_type",
        "n_events",
        F.expr("hll_sketch_estimate(sketch)").cast("long").alias("approx_users"),
    )
    total = per_type.agg(
        F.lit("__all__").alias("event_type"),
        F.sum("n_events").alias("n_events"),
        F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .cast("long")
        .alias("approx_users"),
    )
    return leveled.unionByName(total)


@_q("q_sketch_quantiles")  # approximate — rows-only check
def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error approximate quantiles per group
    (percentile_approx, accuracy 10000 ≈ 0.01% rank error): constant
    memory per group vs the exact sort-based percentile()."""
    o = spread(load_table(spark, sf_dir, "orders"))
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )
