"""Scale-pattern operators: the 100 TB idioms as first-class queries.

Each operator here packages a distributed-execution pattern that a
1000-executor cluster needs but that produces *bit-identical* results
to the naive formulation — so every one is oracle-checked against the
straightforward DuckDB SQL. The reference delegates all execution to
Athena and has none of these concerns in-process (SURVEY.md §4); they
are north-star engine surface.

Patterns:
- prefilter semi join (runtime-filter shape): cut shuffle input with a
  tiny broadcast digest before the exact join
- salted skew join: spread a hot key over N reducers, exact result
- single-pass table profiler: one scan for per-column quality metrics
- CDC apply: last-writer-wins upsert/delete collapse (the general form
  of the reference's append-only no-op deletes,
  ``FirehoseEventStoreProvider.java:102-121``)
- incremental aggregate maintenance: mergeable partial states instead
  of recompute
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from keycloak_event_stream_spark.catalog import footer_rows, load_table, spread
from keycloak_event_stream_spark.operators._exact import DEC, dsum, sql_dsum

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Prefilter semi join (runtime-filter / bloom shape, exact result)
# ---------------------------------------------------------------------------

_PREFILTER_BUCKETS = 4096


@_q(
    "q_join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join accelerated by a coarse broadcast digest — the manual
    form of a runtime bloom filter (this Spark build does not register
    ``bloom_filter_agg`` in SQL, so the digest is a distinct
    hash-bucket set; same plan shape, zero false negatives).

    Phase 1 broadcasts only the ~4096 distinct bucket ids of the build
    side — a few KB no matter how large the build side grows — and
    drops the bulk of the probe side before it ever reaches the
    shuffle. Phase 2 is the exact semi join on the survivors, so false
    positives from bucket collisions are eliminated and the result is
    bit-identical to the plain semi join the oracle runs. At 100 TB
    this is the difference between shuffling the full fact table and
    shuffling only candidate rows."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spread(load_table(spark, sf_dir, "orders"))
    bucket = lambda col: F.pmod(F.xxhash64(col), F.lit(_PREFILTER_BUCKETS))
    digest = c.select(bucket(F.col("c_custkey")).alias("b")).distinct()
    candidates = o.join(
        F.broadcast(digest),
        bucket(F.col("o_custkey")) == F.col("b"),
        "left_semi",
    )
    return (
        candidates.join(c, candidates.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Salted skew join (exact)
# ---------------------------------------------------------------------------

_SALT_BUCKETS = 8
# Round-12: the salt fan-out is input-derived (r11 verdict #4 — this
# was the one fan-out width still pinned to a constant). One salt
# bucket per ~64 Ki fact rows, floored at the historical 8 and capped
# at 64: a hot key's rows then spread over O(rows/65536) reducers as
# the table grows instead of always 8, while sf0.1 stays at the same
# width the bench has always timed (600 K rows // 65536 = 9 ≈ 8).
# Exactness is unaffected — partials are per-(key, salt) DECIMAL/COUNT
# sums whose merge is order- and width-independent. Conf override for
# cluster tuning: spark.kes.skew.saltBuckets.
_SALT_ROWS_PER_BUCKET = 65536
_SALT_BUCKETS_CAP = 64


def _salt_buckets(spark: SparkSession, sf_dir: str) -> int:
    conf = spark.conf.get("spark.kes.skew.saltBuckets", None)
    if conf:
        try:
            return max(1, int(conf))
        except ValueError:
            pass
    rows = footer_rows(sf_dir, "lineitem")
    return max(
        _SALT_BUCKETS, min(_SALT_BUCKETS_CAP, rows // _SALT_ROWS_PER_BUCKET)
    )


@_q(
    "q_join_salted_skew",
    oracle=f"""
    SELECT s.s_name, {sql_dsum("l.l_extendedprice", "total_price")},
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY s.s_name
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join + aggregate via manual salting: the fact side
    gets a deterministic salt from its unique row id (never ``rand()``
    — retries must reproduce), the dimension side is exploded into one
    replica per salt value, and the join key becomes (suppkey, salt) —
    so a hot supplier's rows spread over 8 reducers instead of one.
    The follow-up aggregate first combines per (name, salt) partials,
    then merges — exact decimal sums make the merge order-independent.
    This is the manual fallback for skew AQE can't fix (e.g. when the
    downstream aggregate, not the join, is the hot spot); result is
    bit-identical to the plain join the oracle runs.

    Round-12 (guide §2.3 "aggregate before you shuffle" / §3): the
    per-(key, salt) partials are computed BEFORE the join — the fact
    rows collapse to at most |suppliers|·|salts| partial rows in the
    map-side combine, keyed by (long, long) instead of (string, long),
    and the join probes those partials rather than every fact row
    (stage attribution before: the 600 K-row probe+aggregate stage
    carried 7.6 s of the query's 8 s warm runMs). The salted join
    itself is kept — it is the named pattern — but now attaches
    s_name to the tiny partial table. Inner-join semantics are
    unchanged: partials for suppkeys absent from supplier drop at the
    join exactly as their rows did, and DECIMAL/COUNT partials merge
    order-independently, so the result is bitwise the same."""
    l = spread(load_table(spark, sf_dir, "lineitem"))
    s = load_table(spark, sf_dir, "supplier")
    n_salt = _salt_buckets(spark, sf_dir)
    salt = F.pmod(
        F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")),
        F.lit(n_salt),
    )
    s_salted = s.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("salt", F.col("salt").cast("bigint"))
    partials = (
        l.select("l_suppkey", salt.alias("salt"), "l_extendedprice")
        .groupBy("l_suppkey", "salt")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("pp"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    joined = partials.join(
        s_salted,
        (partials.l_suppkey == s_salted.s_suppkey)
        & (partials.salt == s_salted.salt),
    )
    return (
        joined.groupBy("s_name")
        .agg(
            F.sum("pp").cast("double").alias("total_price"),
            F.sum("pn").alias("n_items"),
        )
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Single-pass table profiler
# ---------------------------------------------------------------------------

@_q(
    "q_profile_table",
    oracle="""
    SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min_value,
           CAST(max(l_quantity) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
           count(DISTINCT l_suppkey),
           CAST(min(l_suppkey) AS VARCHAR), CAST(max(l_suppkey) AS VARCHAR)
    FROM lineitem
    ORDER BY column_name
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiler: per-column row/null/distinct counts and
    min/max, computed in ONE scan + one aggregate over all profiled
    columns, then unpivoted to a row per column. The oracle spells it
    as three scans with UNION ALL; the Spark plan reads the table
    once — at 100 TB the difference between profiling being free-ish
    and tripling the I/O bill. Numeric min/max are stringified at the
    boundary for a uniform schema (doubles via a fixed format so both
    engines print identically)."""
    l = spread(load_table(spark, sf_dir, "lineitem"))

    def fmt(col: str) -> tuple:
        c = F.col(col)
        dt = dict(l.dtypes)[col]
        to_s = (
            (lambda x: F.format_number(x, 1).cast("string"))
            if dt == "double"
            else (lambda x: x.cast("string"))
        )
        return (
            F.count(F.lit(1)).alias(f"{col}__rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{col}__nulls"),
            F.countDistinct(c).alias(f"{col}__distinct"),
            to_s(F.min(c)).alias(f"{col}__min"),
            to_s(F.max(c)).alias(f"{col}__max"),
        )

    cols = ["l_quantity", "l_returnflag", "l_suppkey"]
    aggs = [a for col in cols for a in fmt(col)]
    one = l.agg(*aggs)
    # unpivot by exploding an array of per-column structs off the single
    # aggregate row — a union of per-column selects would re-execute the
    # aggregate (and re-scan the table) once per column
    structs = [
        F.struct(
            F.lit(col).alias("column_name"),
            F.col(f"{col}__rows").alias("n_rows"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_value"),
            F.col(f"{col}__max").alias("max_value"),
        )
        for col in cols
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# CDC apply (last-writer-wins upsert/delete collapse)
# ---------------------------------------------------------------------------

@_q(
    "q_cdc_apply",
    oracle="""
    SELECT user_id, value AS last_value, ts AS last_ts
    FROM (
      SELECT user_id, value, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application: treat the event stream as a change log per
    user (``error`` rows are tombstones, everything else an upsert)
    and collapse to the latest surviving state per key —
    last-writer-wins by (ts, event_id). One shuffle on the key, one
    window pass; the general form of retention the reference
    explicitly no-ops (``FirehoseEventStoreProvider.java:102-121``
    keeps S3 append-only — this operator is how a downstream engine
    materializes current state from that log). At scale this runs
    per-partition-pruned (only changed partitions) and the window is
    a top-1 per key, which Spark executes without a full sort when
    preceded by partial min/max pruning."""
    ev = spread(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (mergeable partial states)
# ---------------------------------------------------------------------------

@_q(
    "q_incremental_agg",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_spent")}
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-customer
    order rollup is kept as a mergeable state (count + exact decimal
    sum). A new batch of orders (here: everything from 1999 on) is
    aggregated alone and MERGED into the existing state with a
    full-outer join + coalesced addition — never recomputing the base.
    Because the partial state is decimal, merge order cannot change
    the result, and the merged rollup is bit-identical to the full
    recompute the oracle runs. This is the pattern that keeps a 100 TB
    rollup fresh at per-batch cost proportional to the delta."""
    o = spread(load_table(spark, sf_dir, "orders"))
    cut = F.lit("1999-01-01").cast("timestamp")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s"),
        )

    base = state(o.filter(F.col("o_orderdate") < cut))
    delta = state(o.filter(F.col("o_orderdate") >= cut)).select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
    )
    merged = base.join(
        delta, base.o_custkey == delta.d_custkey, "full_outer"
    ).select(
        F.coalesce(base.o_custkey, delta.d_custkey).alias("o_custkey"),
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .alias("n_orders"),
        (
            F.coalesce(F.col("s"), F.lit(0).cast(DEC))
            + F.coalesce(F.col("ds"), F.lit(0).cast(DEC))
        )
        .cast("double")
        .alias("total_spent"),
    )
    return merged.orderBy("o_custkey")


@_q(
    "q_skew_diagnosis",
    oracle="""
    WITH freq AS (
      SELECT l_orderkey AS key, count(*) AS c
      FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_c
      FROM freq
    ), top AS (
      SELECT key, c, row_number() OVER (ORDER BY c DESC, key) AS rn
      FROM freq
    )
    SELECT s.n_keys, s.n_rows, s.max_c,
           CAST(s.max_c AS DOUBLE) * s.n_keys / s.n_rows
             AS skew_ratio,
           CAST(sum(CASE WHEN t.rn <= 10 THEN t.c END) AS BIGINT)
             AS top10_rows
    FROM top t CROSS JOIN stats s
    GROUP BY s.n_keys, s.n_rows, s.max_c
    """,
)
def q_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: key cardinality, hottest-key weight,
    and skew ratio (max key count ÷ mean key count) for the shuffle
    key ``l_orderkey`` — the number you read BEFORE deciding between
    a plain shuffle join, AQE skew splitting, or a manual salt
    (q_join_salted_skew).

    A skew_ratio near 1 means uniform keys; ≥ an order of magnitude
    means the hot key serializes one reducer and salting pays. One
    aggregate to |keys| rows; the hottest-10 weight comes from a
    TakeOrderedAndProject top-k (per-partition heaps, no global sort —
    |keys| scales with the fact table, so a rank window over it would
    be the very bottleneck this query diagnoses); integer counts plus
    one deterministic division. This operationalizes the scale
    posture: measure skew, then pick the join strategy — not the other
    way round.
    """
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_c"),
    )
    top10 = (
        freq.orderBy(F.desc("c"), "key")
        .limit(10)
        .agg(F.sum("c").cast("bigint").alias("top10_rows"))
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        "n_keys",
        "n_rows",
        "max_c",
        (
            F.col("max_c").cast("double")
            * F.col("n_keys")
            / F.col("n_rows")
        ).alias("skew_ratio"),
        "top10_rows",
    )
