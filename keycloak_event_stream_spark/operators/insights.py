"""Behavioral / statistical insight operators: recursive CTEs, marketing
attribution, market-basket co-occurrence, equi-width histograms, and
z-score anomaly detection.

The reference exposes only flat filter/sort/limit event queries
(``AthenaEventQuery.java:136-198``); every operator here is north-star
surface an analytics engine over the same event/star data needs.
Each is written so the fast distributed plan is *provably* equal to the
naive relational spec (the DuckDB oracle):

- recursive CTE (Spark 4 ``WITH RECURSIVE``) for date spines and
  hierarchy closure — the two canonical shapes that otherwise force
  driver-side loops;
- last-touch attribution: one window pass (``last(..., ignorenulls)``),
  no per-conversion self-join;
- market basket: pair generation via self-join above the order key —
  shuffle-partitioned on ``l_orderkey`` so pair explosion stays local;
- histogram: bin arithmetic in one scalar-broadcast pass, IEEE-identical
  expression shape in both engines;
- anomaly z-score: moments from *integer* aggregates (exact,
  order-independent), the floating-point part confined to deterministic
  per-row scalar math.

Scale notes (100 TB): attribution and anomaly shuffle once on their
group key; basket pairs shuffle on ``l_orderkey`` (bounded fan-out =
items-per-order²); histogram is scan + 1-row broadcast; recursion depth
is bounded by data shape (log₁₀ keyspace / spine days), each step one
shuffle-free join against a broadcast frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from keycloak_event_stream_spark.catalog import (
    bounded_eval_scope,
    footer_rows,
    load_table,
    spread,
)
from keycloak_event_stream_spark.operators._scale import (
    exact_ntile,
    two_phase_window,
)

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
# Recursive CTEs (Spark 4 WITH RECURSIVE — new engine surface)
# ---------------------------------------------------------------------------


@_q(
    "q_recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(d, hi) AS (
      SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
             CAST(date_trunc('month', max(o_orderdate)) AS DATE)
      FROM orders
      UNION ALL
      SELECT d + INTERVAL 1 MONTH, hi FROM spine WHERE d < hi
    )
    SELECT s.d AS month,
           COALESCE(o.n_orders, 0) AS n_orders,
           CAST(COALESCE(o.revenue, CAST(0 AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM spine s
    LEFT JOIN (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS d,
             count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ) o ON o.d = s.d
    ORDER BY s.d
    """,
)
def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue series via a recursive date spine.

    Spark 4's ``WITH RECURSIVE`` generates the calendar between
    min/max order month — no driver-side loop, no
    ``spark.range``-plus-arithmetic workaround — then left-joins
    monthly aggregates so zero-order months surface as explicit rows
    (the reference's Athena tables simply have no row for silent
    periods, ``terraform/main.tf:87-95`` partition projection
    notwithstanding).

    Monthly (not daily) granularity keeps recursion depth bounded:
    each recursion level is one iteration of the unrolled plan, so the
    spine step must be chosen so depth stays small (~80 months here vs
    2404 days, which blows the 100-level default limit — a real
    constraint this docstring pins). The upper bound is carried
    *through* the recursion as a column (``hi``) instead of a
    correlated scalar subquery — otherwise every level re-scans the
    orders table (measured 24.5s → ~8s at sf0.01). The aggregate side
    shuffles once on the month; the spine join broadcasts.
    o_totalprice is 2-dp money → DECIMAL(18,2) sum is exact and
    order-independent.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rds_orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(d, hi) AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
                 CAST(date_trunc('month', max(o_orderdate)) AS DATE)
          FROM _rds_orders
          UNION ALL
          SELECT add_months(d, 1), hi FROM spine WHERE d < hi
        )
        SELECT s.d AS month,
               COALESCE(o.n_orders, 0) AS n_orders,
               CAST(COALESCE(o.revenue, CAST(0 AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM spine s
        LEFT JOIN (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS d,
                 count(*) AS n_orders,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
          FROM _rds_orders GROUP BY 1
        ) o ON o.d = s.d
        ORDER BY s.d
        """
    )


# q_recursive_hierarchy's persisted loop-body column (round 12); at
# most one live pin — released at the top of the next call.
_RH_PIN = None


@_q(
    "q_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain(custkey, root, depth) AS (
      SELECT c_custkey, c_custkey, 0
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, t.root, t.depth + 1
      FROM customer c JOIN chain t ON c.c_custkey // 10 = t.custkey
      WHERE c.c_custkey >= 10
    )
    SELECT depth, count(*) AS n_members,
           count(DISTINCT root) AS n_roots,
           CAST(sum(custkey) AS BIGINT) AS key_checksum
    FROM chain GROUP BY depth ORDER BY depth
    """,
)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure depth labelling over a synthetic hierarchy
    (parent(k) = k div 10 — an org-chart stand-in on the customer key
    space), summarized per level.

    The recursive step is an equi-join between the full table and the
    previous frontier — each iteration is one broadcast-able join, and
    depth is bounded by log₁₀(keyspace) (≤7 even at 100 TB key ranges),
    so the unrolled plan stays shallow. This is the shape (bill of
    materials, management chains, category trees) that pre-Spark-4
    required iterative driver loops (cf. our ``q_dedup_components``).
    All outputs are integer aggregates — exact, order-independent.

    Round-12 (guide §5 caching, §2 iteration discipline — the r11
    verdict's 0.60x outlier, finally stage-attributed): the cold run
    executed 57 single-task micro-stages because UnionLoopExec
    re-scans the loop body's base table on EVERY iteration — one full
    customer scan per depth level (~8 at sf0.1), which at 100 TB is
    ~8 full passes over the table for one query. The view now serves
    the persisted single needed column, so every iteration after the
    first reads the (spill-backed) key cache instead of parquet, and
    the loop carries one long per row. The recursion itself — seed,
    step join, aggregate — is unchanged, so the declared result is
    identical. A/B at sf0.1: 5/5 wins, best 0.83 -> 0.72 s. The pin
    from the previous call is released before re-pinning (one live
    pin max, the dedup-module discipline).
    """
    global _RH_PIN
    if _RH_PIN is not None:
        try:
            _RH_PIN.unpersist()
        except Exception:
            pass  # the owning session may already be stopped
    cust = (
        load_table(spark, sf_dir, "customer").select("c_custkey").persist()
    )
    _RH_PIN = cust
    cust.createOrReplaceTempView("_rh_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0
          FROM _rh_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, t.root, t.depth + 1
          FROM _rh_customer c JOIN chain t ON c.c_custkey DIV 10 = t.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT depth, count(*) AS n_members,
               count(DISTINCT root) AS n_roots,
               sum(custkey) AS key_checksum
        FROM chain GROUP BY depth ORDER BY depth
        """
    )


# ---------------------------------------------------------------------------
# Marketing attribution
# ---------------------------------------------------------------------------


@_q(
    "q_attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_type, value, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT touch, count(*) AS n_conversions,
           CAST(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DECIMAL(18,2))
                AS DOUBLE) AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase' AND touch IS NOT NULL
    GROUP BY touch ORDER BY touch
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase's value to the most
    recent non-purchase event in the same user's stream.

    One window pass (``last(..., ignorenulls=True)`` over the user
    timeline, frame ending 1 PRECEDING) tags every conversion — no
    per-conversion self-join, no correlated subquery. At scale this is
    a single shuffle on ``user_id``; the frame keeps only one value of
    running state per open partition. The reference can only filter the
    raw stream per-user (``AthenaEventQuery.java:173-187``) and would
    push this logic to the client.

    ``value`` sums go through DECIMAL(27,6) (order-independent, matches
    the oracle bitwise — the q_timeseries_resample discipline).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(
            (F.col("event_type") == "purchase") & F.col("touch").isNotNull()
        )
        .groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("touch")
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence
# ---------------------------------------------------------------------------

# Max items per basket for the in-row pair expansion (r6 verdict #5:
# the fan-out is quadratic in basket size, the one term the 10x table
# can't bound by construction). A basket past the cap is dropped WHOLE
# — the production convention for co-occurrence mining: a mega-basket
# (a crawler's cart, a wholesale order with thousands of lines) emits
# k²/2 pairs of near-zero lift signal and can single-handedly dominate
# the pair exchange. The filter is a map-side size() predicate on the
# already-aggregated basket row — no extra shuffle — and dropped
# baskets surface through LAST_BASKET_CAP_AUDIT (never a silent cap).
# TPC-H baskets have <= 7 lines, so the default never engages on the
# fixtures and the oracle comparison stays exact.
_BASKET_CAP_CONF = "spark.kes.basket.maxItems"
_BASKET_CAP_DEFAULT = 256

#: Audit DataFrame for the most recent q_market_basket call: one row
#: per (l_orderkey, n_items) basket the cap dropped. Lazy — inspecting
#: it re-runs the basket aggregate (the main query persists nothing),
#: which is the audit's cost, not the query's. Empty ⇔ the cap never
#: engaged.
LAST_BASKET_CAP_AUDIT = None


@_q(
    "q_market_basket",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 part pairs most often ordered together (co-occurrence
    counts over the order "basket").

    One data-sized shuffle: lineitem groups straight to per-order item
    sets (``collect_set`` dedups multi-line repeats of a part, so no
    DISTINCT pre-pass) and pairs are generated *inside* each
    aggregated row by a sorted-array comprehension (pa < pb once each,
    fan-out bounded by items-per-order²). The pair-count exchange that
    follows carries only map-side-combined partials (distinct pairs
    per partition), not raw pairs. This replaces the classic
    self-equi-join
    formulation — measured 2.4s → 1.6s warm at sf0.1, and the win
    grows with scale because the basket array never crosses the wire
    twice. Counts are integers (exact); the top-50 is a
    ``TakeOrderedAndProject`` with full (count, pair) tiebreak so the
    row set is deterministic in both engines.

    Round-7 (r6 verdict #5): the per-basket fan-out is quadratic in
    basket size, so baskets beyond ``spark.kes.basket.maxItems``
    (default 256; TPC-H baskets are <=7 lines, so it never engages on
    the fixtures and the oracle stays exact) are dropped whole by a
    map-side size() filter on the aggregated row — same
    bounded-flood + audit design as the LSH bucket cap
    (``llm/dedup.py`` LAST_CAP_AUDIT): dropped baskets are observable
    through LAST_BASKET_CAP_AUDIT, never silent.
    """
    cap = int(spark.conf.get(_BASKET_CAP_CONF, str(_BASKET_CAP_DEFAULT)))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # Round-11 (guide §2.5, blind coalesce before a fan-out): the basket
    # exchange carries tiny bytes (two ints per row), so AQE coalesced
    # its read to ~4 tasks — but the stage ABOVE it does the quadratic
    # per-basket pair expansion, so the one CPU-heavy stage of the query
    # ran on 4 of 32 cores (stage attribution: 3.6 s CPU / 4 tasks).
    # An explicit keyed repartition at an input-derived width (footer
    # rows, same 8192-rows-per-part family as bounded_eval_scope, capped
    # at the session's shuffle width) pins the fan-out's parallelism:
    # the basket groupBy reuses this exchange (same key, guide §2.4), so
    # the exchange COUNT is unchanged — AQE just no longer coalesces an
    # explicitly-widthed user repartition. Interleaved A/B at sf0.1:
    # 3.84 -> 1.85 s best-of-5, rows identical.
    parts_was = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        width_cap = max(int(parts_was), 32)
    except ValueError:
        width_cap = 32
    width = max(
        4, min(width_cap, footer_rows(sf_dir, "lineitem") // 8192 + 1)
    )
    basket = li.repartition(width, "l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    global LAST_BASKET_CAP_AUDIT
    LAST_BASKET_CAP_AUDIT = basket.select(
        "l_orderkey", F.size("items").alias("n_items")
    ).filter(F.col("n_items") > cap)
    basket = basket.filter(F.size("items") <= cap)
    pairs = basket.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) ->"
                " transform(slice(items, i + 2, size(items) - i - 1),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Equi-width histogram
# ---------------------------------------------------------------------------


@_q(
    "q_histogram_equiwidth",
    oracle="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT LEAST(19, CAST(floor((o_totalprice - lo) * 20.0 / (hi - lo))
                          AS BIGINT)) AS bin,
           count(*) AS n,
           min(o_totalprice) AS bin_min,
           max(o_totalprice) AS bin_max
    FROM orders, bounds
    GROUP BY 1 ORDER BY bin
    """,
)
def q_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of order totals.

    The global min/max is a 1-row aggregate broadcast into the scan
    (scalar cross join) — two passes total, no shuffle beyond the final
    20-group aggregate. The bin expression keeps the *identical* IEEE
    operation order in both engines — ``(x - lo) * 20.0 / (hi - lo)``,
    then ``floor`` — so bin assignment is bit-deterministic without any
    rounding epsilon. The max value is clamped into the last bin
    (LEAST(19, …)), the standard closed-upper-bound convention.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(19),
                # try_divide: a single-valued (or 1-row) input has
                # hi == lo; every row then lands in bin 0
                F.coalesce(
                    F.floor(
                        F.try_divide(
                            (F.col("o_totalprice") - F.col("lo"))
                            * F.lit(20.0),
                            F.col("hi") - F.col("lo"),
                        )
                    ),
                    F.lit(0),
                ),
            ).alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection
# ---------------------------------------------------------------------------


@_q(
    "q_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), moments AS (
      SELECT event_type, count(*) AS n,
             sum(cnt) AS s, sum(cnt * cnt) AS q
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.cnt,
           (CAST(d.cnt AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
             / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE) / (m.n * m.n))
             AS zscore
    FROM daily d JOIN moments m ON d.event_type = m.event_type
    WHERE m.n * m.q - m.s * m.s > 0
      AND abs((CAST(d.cnt AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
              / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE) / (m.n * m.n)))
          > 2.0
    ORDER BY d.event_type, d.day
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume anomalies: days whose count is >2σ from the
    per-type mean (population σ).

    The moments (n, Σx, Σx²) are *integer* aggregates — exact and
    aggregation-order-independent — so the only floating-point math is
    deterministic per-row scalar arithmetic with identical expression
    shape in both engines; the raw double z-score hash-matches bitwise
    with no rounding step. Two shuffles total (daily rollup, per-type
    moments); the moments side is tiny and broadcasts back onto daily.
    This is the textbook pattern for drift/anomaly monitors over the
    reference's event firehose, which itself offers no aggregation at
    all (SURVEY.md §2.2).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
    )
    z = (
        F.col("cnt").cast("double") - F.col("s").cast("double") / F.col("n")
    ) / F.sqrt(
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n") * F.col("n"))
    )
    return (
        daily.join(F.broadcast(moments), "event_type")
        .filter(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
            & (F.abs(z) > 2.0)
        )
        .select("event_type", "day", "cnt", z.alias("zscore"))
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Exact-moment Pearson correlation
# ---------------------------------------------------------------------------


@_q(
    "q_agg_corr",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS yi
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(xi) AS DOUBLE) AS sx,
             CAST(sum(yi) AS DOUBLE) AS sy,
             CAST(sum(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yi * yi AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(sum(CAST(xi * yi AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM cents GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_price
    FROM m ORDER BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag — computed from *exact decimal moments*, not ``F.corr``.

    Spark's/DuckDB's built-in ``corr`` accumulates co-moments in
    floating point, so their results differ by aggregation order and
    never hash-match. Here both columns are first scaled to exact
    integer cents (decimal multiply, then an exact integer-valued
    decimal→bigint cast), so the five moments (Σx, Σy, Σx², Σy², Σxy)
    are *integer* sums — exact, order-independent, and single-rounded
    on the one cast to double. (A fractional DECIMAL(38,4)→DOUBLE cast
    is NOT portable: DuckDB divides after an int128→double conversion
    and drifts a ulp from Spark's correctly-rounded
    BigDecimal.doubleValue — measured on this data.) The scale factors
    cancel in the closed-form r, which is then deterministic scalar
    IEEE math with identical expression shape in both engines: bitwise
    parity on a statistic that is "impossible" to oracle-check naively.
    One shuffle (the group-by); the per-row products pipeline inside
    the scan stage.
    """
    li = load_table(spark, sf_dir, "lineitem")
    xi = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    yi = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    cents = li.select(
        "l_returnflag", xi.alias("xi"), yi.alias("yi")
    )
    c_xi, c_yi = F.col("xi"), F.col("yi")
    m = cents.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c_xi).cast("double").alias("sx"),
        F.sum(c_yi).cast("double").alias("sy"),
        F.sum((c_xi * c_xi).cast("decimal(38,0)")).cast("double").alias(
            "sxx"
        ),
        F.sum((c_yi * c_yi).cast("decimal(38,0)")).cast("double").alias(
            "syy"
        ),
        F.sum((c_xi * c_yi).cast("decimal(38,0)")).cast("double").alias(
            "sxy"
        ),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    return m.select(
        "l_returnflag", "n", r.alias("corr_qty_price")
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Data-quality audit (referential integrity / uniqueness / completeness)
# ---------------------------------------------------------------------------


@_q(
    "q_dq_audit",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS violations
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events_dup_event_id',
           (SELECT count(*) - count(DISTINCT event_id) FROM events)
    UNION ALL
    SELECT 'documents_null_or_empty_text',
           (SELECT count(*) FROM documents
            WHERE text IS NULL OR text = '')
    UNION ALL
    SELECT 'orders_nonpositive_totalprice',
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
    ORDER BY check_name
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline data-quality gate: referential integrity (FK orphans
    via anti join), key uniqueness, completeness, and range checks,
    one labelled row per check.

    The shape that guards every 100 TB training-data ingest: each
    check is a single scan (anti joins broadcast their key side or
    shuffle on the FK; the uniqueness check is one hash aggregate),
    and the union of 1-row results is free. The reference has no
    validation surface at all — malformed rows silently divert to an
    S3 error prefix (``terraform/main.tf:195``); this operator is the
    queryable replacement.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def one(name: str, df_count: DataFrame) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    orphan_li = one(
        "lineitem_orphan_orderkey",
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    orphan_ord = one(
        "orders_orphan_custkey",
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    dup_ev = one(
        "events_dup_event_id",
        events.agg(
            (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                "violations"
            )
        ),
    )
    null_doc = one(
        "documents_null_or_empty_text",
        docs.filter(
            F.col("text").isNull() | (F.col("text") == "")
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    neg_price = one(
        "orders_nonpositive_totalprice",
        orders.filter(F.col("o_totalprice") <= 0).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    return (
        orphan_li.unionByName(orphan_ord)
        .unionByName(dup_ev)
        .unionByName(null_doc)
        .unionByName(neg_price)
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# Year-over-year growth (TPC-DS-style composite)
# ---------------------------------------------------------------------------


@_q(
    "q_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT n.n_name, year(o.o_orderdate) AS yr,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, yr, CAST(revenue AS DOUBLE) AS revenue,
           CAST(lag(revenue) OVER (PARTITION BY n_name ORDER BY yr)
                AS DOUBLE) AS prev_revenue,
           CAST(revenue AS DOUBLE)
             / CAST(lag(revenue) OVER (PARTITION BY n_name ORDER BY yr)
                    AS DOUBLE) - 1.0 AS yoy
    FROM yearly
    ORDER BY n_name, yr
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: star join → yearly
    decimal rollup → ``lag`` window — the TPC-DS Q4/Q74 shape.

    The join side broadcasts both dims (customer is the only shuffled
    input); the yearly aggregate reduces the data to |nation|×|year|
    rows *before* the window, so the window pass is trivially small —
    the order that matters at 100 TB (window-then-aggregate would sort
    the fact table). Revenue stays DECIMAL through the rollup and the
    growth ratio converts each operand to double once — deterministic
    scalar division, identical shape in the oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "n_name",
        "yr",
        F.col("revenue").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (
            F.col("revenue").cast("double") / prev.cast("double") - 1.0
        ).alias("yoy"),
    ).orderBy("n_name", "yr")


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@_q(
    "q_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY 1
    ), scored AS (
      SELECT o_custkey, last_order, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(sum(monetary) AS DOUBLE) AS segment_value
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_score, f_score, m_score
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per-customer
    order rollup, quartile scores via ``ntile``, then segment-level
    counts and value.

    ntile needs a *total* order (ties broken by custkey) or the
    quartile boundaries — and therefore the whole result — are
    engine-dependent; that discipline is what makes a rank-based
    segmentation oracle-checkable at all. Each quartile score is an
    exact ntile reconstructed from a two-phase range-partitioned
    row_number plus the broadcast total (``_scale.exact_ntile``) —
    three parallel k-partition sorts over the per-customer rollup, no
    single-task window at any customer count. Monetary stays DECIMAL
    end-to-end.
    """
    # Bounded-eval width (catalog.bounded_eval_scope, round 9): three
    # two-phase order spreads + the totals join over the per-customer
    # rollup paid corpus width — 6-8.5 s vanilla sf0.01 for a 55-row
    # result, ~3 s at input-derived width (ABA probe; BASELINE.md
    # "Round 9 - width scope, third wave"). WHOLE body under the
    # scope (the pooled range pins compile eagerly), eager
    # localCheckpoint inside.
    with bounded_eval_scope(spark, footer_rows(sf_dir, "orders")):
        orders = load_table(spark, sf_dir, "orders")
        rfm = orders.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        rfm = two_phase_window(
            rfm, [F.col("last_order"), F.col("o_custkey")], row_number="_rn_r"
        )
        rfm = two_phase_window(
            rfm, [F.col("frequency"), F.col("o_custkey")], row_number="_rn_f"
        )
        # round 12: total folds out of the last call's k-row
        # per-partition aggregate (no with_totals re-pass; exact)
        rfm = two_phase_window(
            rfm,
            [F.col("monetary"), F.col("o_custkey")],
            row_number="_rn_m",
            totals={"_n": None},
        )
        scored = rfm.select(
            "o_custkey",
            "monetary",
            exact_ntile(F.col("_rn_r"), F.col("_n"), 4).alias("r_score"),
            exact_ntile(F.col("_rn_f"), F.col("_n"), 4).alias("f_score"),
            exact_ntile(F.col("_rn_m"), F.col("_n"), 4).alias("m_score"),
        )
        return (
            scored.groupBy("r_score", "f_score", "m_score")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum("monetary").cast("double").alias("segment_value"),
            )
            .orderBy("r_score", "f_score", "m_score")
        ).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Deterministic mode (most-frequent value with portable tie-breaking)
# ---------------------------------------------------------------------------


@_q(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rn
      FROM counted
    )
    SELECT l_returnflag, l_quantity AS mode_quantity, cnt AS mode_count
    FROM ranked WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent quantity per return flag) with a
    *portable* tie-break: highest count, then smallest value.

    Both Spark 4 and DuckDB ship a ``mode()`` aggregate, but their
    tie-breaking is implementation-defined (first-seen, which depends
    on scan/aggregation order) — so the built-ins can never
    hash-match across engines or even across runs. The count+window
    formulation pins the semantics and is the scalable shape anyway:
    a two-level aggregation (group×value counts, then a per-group
    top-1), each one shuffle, no single-partition window (the window
    partitions by group).
    """
    li = load_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), "l_quantity"
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Gaps & islands (consecutive-activity runs)
# ---------------------------------------------------------------------------


@_q(
    "q_gaps_islands",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grp AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS anchor
      FROM daily
    ), islands AS (
      SELECT user_id, anchor, count(*) AS len,
             min(day) AS island_start
      FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_islands,
           max(len) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days,
           min(island_start) AS first_active
    FROM islands GROUP BY user_id ORDER BY user_id
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of *consecutive* active days
    (streaks), their count, the longest, and total active days.

    The classic anchor trick — ``day - row_number()`` is constant
    within a consecutive run — turns run detection into a plain
    group-by: one shuffle on ``user_id`` for the window, one hash
    aggregate, no self-join, no iteration. The engagement-streak
    metric every event-analytics stack needs; the reference can only
    return the raw per-user event list (``AthenaEventQuery.java:
    173-187``) and push streak logic client-side.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = daily.select(
        "user_id",
        "day",
        F.date_sub(
            F.col("day"), F.row_number().over(w).cast("int")
        ).alias("anchor"),
    )
    islands = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("island_start"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len").alias("longest_streak"),
            F.sum("len").alias("active_days"),
            F.min("island_start").alias("first_active"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Pareto / ABC analysis (cumulative revenue share)
# ---------------------------------------------------------------------------


@_q(
    "q_pareto_abc",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT o_custkey, cents,
             CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(cents) OVER () AS BIGINT) AS total
      FROM per_cust
    ), classed AS (
      SELECT o_custkey, cents,
             CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.5
                  THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
                  THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY 1 ORDER BY abc_class
    """,
)
def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC segmentation: customers ranked by revenue, running
    cumulative share, classed A (first 50% of revenue) / B (to 80%) /
    C (tail).

    Revenue lives in exact integer *cents* end-to-end (the q_agg_corr
    discipline — a fractional decimal→double cast is not
    engine-portable), so the running sum is exact and the single
    share division is deterministic IEEE. The running share is a
    two-phase range-partitioned cumsum over the *per-customer* rollup
    (|customers| rows, not |orders|) with the grand total broadcast
    back — aggregate-before-window plus a parallel sort, so no
    single-task stage at any customer count. Total order via
    (cents DESC, custkey).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents_expr = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents_expr).alias("cents")
    )
    # round 12: total folds out of the same k-row per-partition
    # aggregate as the offsets (no with_totals re-pass; exact)
    ranked = two_phase_window(
        per_cust,
        [F.desc("cents"), F.col("o_custkey")],
        cumsum={"cum": "cents"},
        totals={"total": "cents"},
    ).select(
        "o_custkey",
        "cents",
        F.col("cum").cast("bigint").alias("cum"),
        "total",
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = ranked.select(
        "cents",
        F.when(share <= 0.5, "A")
        .when(share <= 0.8, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------


@_q(
    "q_ab_test_proportions",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) * 5 > count(*)
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1, 2
    ), arms AS (
      SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
      FROM assign GROUP BY 1
    ), wide AS (
      SELECT max(CASE WHEN arm = 'A' THEN n END) AS na,
             max(CASE WHEN arm = 'A' THEN conv END) AS xa,
             max(CASE WHEN arm = 'B' THEN n END) AS nb,
             max(CASE WHEN arm = 'B' THEN conv END) AS xb
      FROM arms
    )
    SELECT na, xa, nb, xb,
           CAST(xa AS DOUBLE) / na AS rate_a,
           CAST(xb AS DOUBLE) / nb AS rate_b,
           (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
             / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)) AS zstat
    FROM wide
    """,
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic hash split: users in
    even/odd arms, conversion = purchases exceed 20% of the user's
    events (an "any purchase" definition is degenerate on this fixture
    — every user purchases, pooled variance 0, z undefined), pooled-
    variance z statistic.

    The experiment readout every event pipeline ends at. All inputs to
    the statistic are integer counts (exact, order-independent); the z
    formula is deterministic scalar IEEE with identical shape in both
    engines, so even the test statistic hash-matches bitwise. Two
    aggregates (per-user conversion flag, per-arm rollup) and a 2-row
    pivot — nothing here grows with data volume except the first
    shuffle on ``user_id``.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
    ).agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("xa"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("xb"),
    )
    na, xa = F.col("na"), F.col("xa")
    nb, xb = F.col("nb"), F.col("xb")
    rate_a = xa.cast("double") / na
    rate_b = xb.cast("double") / nb
    pooled = (xa + xb).cast("double") / (na + nb)
    z = (rate_a - rate_b) / F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return wide.select(
        "na",
        "xa",
        "nb",
        "xb",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        z.alias("zstat"),
    )


# ---------------------------------------------------------------------------
# Time-to-convert (exact median latency between funnel stages)
# ---------------------------------------------------------------------------


@_q(
    "q_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS purchase_ts
      FROM events GROUP BY 1
    ), lat AS (
      SELECT user_id,
             CAST(epoch_ms(purchase_ts) - epoch_ms(signup_ts) AS BIGINT)
               AS ms
      FROM firsts
      WHERE signup_ts IS NOT NULL AND purchase_ts IS NOT NULL
        AND purchase_ts >= signup_ts
    ), ranked AS (
      SELECT ms, row_number() OVER (ORDER BY ms, user_id) AS rn,
             count(*) OVER () AS n
      FROM lat
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(CASE WHEN rn * 2 = n + 1 OR rn * 2 = n
                          OR rn * 2 = n + 2 THEN ms END) AS BIGINT)
             AS median_lo_ms,
           CAST(max(CASE WHEN rn * 2 = n + 1 OR rn * 2 = n
                          OR rn * 2 = n + 2 THEN ms END) AS BIGINT)
             AS median_hi_ms
    FROM ranked
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency: exact median (reported as
    the lower/upper middle order statistics, integer milliseconds — no
    float midpoint, so the result is exact in any engine).

    Rank arithmetic instead of a percentile function: the two middle
    ranks satisfy 2·rn ∈ {n, n+1, n+2} (the q_winsorize
    integer-cross-multiplication discipline — engine percentile
    interpolation rules differ and can never hash-match). Shape: one
    shuffle for the per-user firsts, one ordered window over the
    |converted users| rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("signup_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchase_ts"),
    )
    lat = firsts.filter(
        F.col("signup_ts").isNotNull()
        & F.col("purchase_ts").isNotNull()
        & (F.col("purchase_ts") >= F.col("signup_ts"))
    ).select(
        "user_id",
        (
            F.unix_millis("purchase_ts") - F.unix_millis("signup_ts")
        ).alias("ms"),
    )
    # round 12: total folds out of the same k-row per-partition
    # aggregate as the offsets (no with_totals re-pass; exact)
    ranked = two_phase_window(
        lat,
        [F.col("ms"), F.col("user_id")],
        row_number="rn",
        totals={"n": None},
    ).select("ms", "rn", "n")
    mid = (
        (F.col("rn") * 2 == F.col("n") + 1)
        | (F.col("rn") * 2 == F.col("n"))
        | (F.col("rn") * 2 == F.col("n") + 2)
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min(F.when(mid, F.col("ms"))).cast("bigint").alias("median_lo_ms"),
        F.max(F.when(mid, F.col("ms"))).cast("bigint").alias("median_hi_ms"),
    )


# ---------------------------------------------------------------------------
# Overlapping-interval merge (coverage stitching)
# ---------------------------------------------------------------------------


@_q(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 1800000 AS e,
             event_id
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, island,
             min(s) AS ms, max(e) AS me
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_intervals,
           CAST(sum(me - ms) AS BIGINT) AS coverage_ms,
           CAST(max(me - ms) AS BIGINT) AS longest_ms
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping activity intervals (each event opens a 30-min
    window) into disjoint coverage spans per user — the
    interval-stitching primitive behind uptime, ad-viewability, and
    session-coverage metrics.

    The sweep: order intervals by start, a new span begins exactly
    when a start exceeds the running max of all previous ends
    (``max(e) OVER (... 1 PRECEDING)``), and the running sum of that
    flag is the span id — one window pass plus two aggregates, no
    self-join, no explosion of overlap pairs (the naive overlap join
    is quadratic per user). All arithmetic is integer epoch millis.
    Strictly more general than gaps-and-islands (arbitrary interval
    lengths, not unit days); same single-shuffle posture on
    ``user_id``.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + 1800000).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_run).cast("bigint").alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("me") - F.col("ms")).cast("bigint").alias(
                "coverage_ms"
            ),
            F.max(F.col("me") - F.col("ms")).cast("bigint").alias(
                "longest_ms"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Multi-band single-scan aggregate (TPC-DS Q88 shape)
# ---------------------------------------------------------------------------


@_q(
    "q_multiband_singlescan",
    oracle="""
    SELECT
      count(CASE WHEN extract(hour FROM ts) BETWEEN 0 AND 2
                  AND event_type = 'view' THEN 1 END) AS h0_2_views,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 3 AND 5
                  AND event_type = 'view' THEN 1 END) AS h3_5_views,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 6 AND 8
                  AND event_type = 'click' THEN 1 END) AS h6_8_clicks,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 9 AND 11
                  AND event_type = 'click' THEN 1 END) AS h9_11_clicks,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 12 AND 14
                  AND event_type = 'purchase' THEN 1 END)
        AS h12_14_purchases,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 15 AND 17
                  AND event_type = 'purchase' THEN 1 END)
        AS h15_17_purchases,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 18 AND 20
                  AND event_type = 'error' THEN 1 END) AS h18_20_errors,
      count(CASE WHEN extract(hour FROM ts) BETWEEN 21 AND 23
                  AND event_type = 'signup' THEN 1 END) AS h21_23_signups
    FROM events
    """,
)
def q_multiband_singlescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight time-band × event-type counts in ONE scan (the TPC-DS Q88
    shape) — conditional aggregation instead of eight filtered
    subqueries.

    The naive formulation (one scan + filter per band, cross-joined)
    reads the fact table eight times; conditional ``count(CASE...)``
    reads it once and keeps all eight accumulators in the same hash
    agg — at 100 TB that is the difference between one pass and
    eight. Catalyst does NOT fuse the eight-subquery form on its own
    (each FROM is an independent scan), so this rewrite is the
    engine-user's job and worth pinning as a named pattern. Integer
    counts; bitwise for free.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    t = F.col("event_type")

    def band(lo: int, hi: int, typ: str):
        return F.count(
            F.when(h.between(lo, hi) & (t == typ), F.lit(1))
        ).alias(f"h{lo}_{hi}_{typ}s")

    return ev.agg(
        band(0, 2, "view"),
        band(3, 5, "view"),
        band(6, 8, "click"),
        band(9, 11, "click"),
        band(12, 14, "purchase"),
        band(15, 17, "purchase"),
        band(18, 20, "error"),
        band(21, 23, "signup"),
    )


# ---------------------------------------------------------------------------
# Percent-of-total window (share-of-group BI shape)
# ---------------------------------------------------------------------------


@_q(
    "q_percent_of_total",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, cents,
           CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT)
             AS share_of_region,
           CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER () AS BIGINT) AS share_of_total
    FROM nat ORDER BY region, nation
    """,
)
def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-group: each nation's revenue as a fraction of its
    region and of the world — the percent-of-total window every BI
    layer reduces to.

    Integer-cent group sums (exact), window totals over the
    |nation|-row rollup (25 rows — the aggregate-before-window
    posture), one double division per share with identical shape in
    both engines. The star join broadcasts all three dims; orders is
    the only shuffled input.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents_expr = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    nat = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents_expr).alias("cents"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        "cents",
        (
            F.col("cents").cast("double")
            / F.sum("cents").over(w_region).cast("bigint")
        ).alias("share_of_region"),
        (
            F.col("cents").cast("double")
            / F.sum("cents").over(w_all).cast("bigint")
        ).alias("share_of_total"),
    ).orderBy("region", "nation")


# ---------------------------------------------------------------------------
# Forward as-of join (completes the as-of family)
# ---------------------------------------------------------------------------


@_q(
    "q_join_asof_forward",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           t.event_id AS next_click_id, t.ts AS next_click_ts
    FROM p LEFT JOIN LATERAL (
      SELECT c.event_id, c.ts FROM c
      WHERE c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.ts, c.event_id LIMIT 1
    ) t ON TRUE
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each purchase, the *earliest* click at-or-
    after it by the same user (post-conversion behavior lookup —
    the mirror of q_join_asof's latest-before).

    Same union-tag idiom, reversed frame: one (user_id) shuffle, one
    sort, ``first(..., ignorenulls)`` over [currentRow,
    unboundedFollowing]. At equal timestamps the purchase row sorts
    before the click (probe flag descending) so a click at exactly
    purchase_ts stays inside the forward frame — the ``ts >=``
    inclusivity pinned the opposite way round from the backward
    variant. DuckDB lacks forward ASOF JOIN; the oracle is the
    correlated LATERAL LIMIT 1 spec, proving the window plan
    equivalent to the quadratic definition.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_probe")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_probe")
    )
    both = p.unionByName(c)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_probe").desc(), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_id = F.when(F.col("is_probe") == 0, F.col("event_id"))
    click_ts = F.when(F.col("is_probe") == 0, F.col("ts"))
    enriched = both.withColumn(
        "next_click_id", F.first(click_id, ignorenulls=True).over(w)
    ).withColumn("next_click_ts", F.first(click_ts, ignorenulls=True).over(w))
    return enriched.filter(F.col("is_probe") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_click_id",
        "next_click_ts",
    )


# ---------------------------------------------------------------------------
# Rank over rollup levels (GROUPING() composite)
# ---------------------------------------------------------------------------


@_q(
    "q_rollup_rank",
    oracle="""
    WITH r AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             GROUPING(r.r_name) + 2 * GROUPING(n.n_name) AS gid,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
    )
    SELECT region, nation, gid, CAST(revenue AS DOUBLE) AS revenue,
           rank() OVER (PARTITION BY gid
                        ORDER BY revenue DESC,
                                 COALESCE(region, ''),
                                 COALESCE(nation, '')) AS rnk
    FROM r
    ORDER BY gid, rnk, region NULLS LAST, nation NULLS LAST
    """,
)
def q_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank within each ROLLUP level (nation / region / grand total),
    labelled by GROUPING() — the TPC-DS Q67 composite: one multi-level
    aggregate, then a per-level leaderboard, no second scan.

    Spark's ``grouping()`` and DuckDB's ``GROUPING()`` agree on the
    0/1 encoding, so the level id (g_region + 2·g_nation) is portable;
    revenue stays DECIMAL; rank ties break on the full name key. The
    rollup is one shuffle over the star join; the rank windows run on
    the ~31-row aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    r = (
        joined.rollup(F.col("r_name"), F.col("n_name"))
        .agg(
            (
                F.grouping(F.col("r_name"))
                + F.lit(2) * F.grouping(F.col("n_name"))
            ).alias("gid"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "revenue"
            ),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "gid",
            "revenue",
        )
    )
    w = Window.partitionBy("gid").orderBy(
        F.desc("revenue"),
        F.coalesce(F.col("region"), F.lit("")),
        F.coalesce(F.col("nation"), F.lit("")),
    )
    return r.select(
        "region",
        "nation",
        "gid",
        F.col("revenue").cast("double").alias("revenue"),
        F.rank().over(w).alias("rnk"),
    ).orderBy(
        "gid",
        "rnk",
        F.col("region").asc_nulls_last(),
        F.col("nation").asc_nulls_last(),
    )


# ---------------------------------------------------------------------------
# Path analysis (top user journeys)
# ---------------------------------------------------------------------------


@_q(
    "q_funnel_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def q_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 opening user journeys: each user's first five events as
    an ordered ``a>b>c`` path, counted across users — the
    path-analysis staple behind onboarding and drop-off dashboards.

    The path string is built from a sorted struct collect
    (``array_sort`` on (rn, type) pairs, then join) — the same
    determinism idiom as q_string_agg, equivalent to DuckDB's ordered
    ``string_agg``. Two shuffles (user window, path count), top-10
    via TakeOrderedAndProject with a full (count, path) tiebreak.
    Path cardinality is bounded by |event_types|⁵, so the count
    aggregate stays small no matter the row count.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Audience overlap (Jaccard between event-type user sets)
# ---------------------------------------------------------------------------


@_q(
    "q_audience_overlap",
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, count(*) AS n FROM m GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY i.type_a, i.type_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: Jaccard similarity between every pair
    of event types' user sets — the segment-overlap census behind
    "users who click also purchase" dashboards.

    |A∩B| comes from a self-join on the *deduplicated* (type, user)
    membership table (shuffle on user_id, pair fan-out bounded by
    types-per-user²); |A∪B| = |A|+|B|−|A∩B| from integer sizes, so
    the only float is one deterministic division per pair. The same
    shape scales to segment×segment overlap at 10⁸ users because
    nothing ever materializes a user set — only counts move.
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.select("event_type", "user_id").distinct()
    sizes = m.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = m.alias("a"), m.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# DataFrame transpose (Spark 4 metrics-matrix pivot)
# ---------------------------------------------------------------------------


@_q(
    "q_transpose",
    oracle="""
    WITH reg AS (
      SELECT r.r_name AS region,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS revenue_cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1
    )
    SELECT 'revenue_cents' AS key,
           max(CASE WHEN region = 'AFRICA' THEN revenue_cents END)
             AS "AFRICA",
           max(CASE WHEN region = 'AMERICA' THEN revenue_cents END)
             AS "AMERICA",
           max(CASE WHEN region = 'ASIA' THEN revenue_cents END)
             AS "ASIA",
           max(CASE WHEN region = 'EUROPE' THEN revenue_cents END)
             AS "EUROPE",
           max(CASE WHEN region = 'MIDDLE EAST' THEN revenue_cents END)
             AS "MIDDLE EAST"
    FROM reg
    UNION ALL
    SELECT 'n_orders',
           max(CASE WHEN region = 'AFRICA' THEN n_orders END),
           max(CASE WHEN region = 'AMERICA' THEN n_orders END),
           max(CASE WHEN region = 'ASIA' THEN n_orders END),
           max(CASE WHEN region = 'EUROPE' THEN n_orders END),
           max(CASE WHEN region = 'MIDDLE EAST' THEN n_orders END)
    FROM reg
    ORDER BY key
    """,
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``DataFrame.transpose()``: the per-region metrics
    rollup flipped into a metrics-matrix (one row per measure, one
    column per region) — the report orientation finance/BI exports
    want, previously a hand-written conditional-aggregation pivot
    (which is exactly what the oracle spells out).

    transpose() uses the first column as the new header and requires
    a least-common type across the value columns — hence both
    measures are bigint (revenue in integer cents). The input is the
    5-row region rollup, so the driver-side flip is free; transpose
    is a small-result operator by construction, never for fact-sized
    frames.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents_expr = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    reg = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(cents_expr).alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .orderBy("region")
    )
    return reg.transpose().orderBy("key")


# ---------------------------------------------------------------------------
# Seasonal profile (day-of-week × hour heatmap)
# ---------------------------------------------------------------------------


@_q(
    "q_seasonal_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS INTEGER) AS dow,
           CAST(extract(hour FROM ts) AS INTEGER) AS hour,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY dow, hour
    """,
)
def q_seasonal_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: event volume and distinct users per
    (ISO day-of-week × hour) cell — the traffic-shape profile behind
    capacity planning and anomaly baselines (the denominator
    q_anomaly_zscore would use in production).

    ISO day numbering (Mon=1..Sun=7) is the portable convention —
    Spark's ``dayofweek`` is Sun=1 and would silently mis-join
    against any ISO-based system; ``weekday()+1`` matches DuckDB's
    ``isodow``. One shuffle to ≤168 cells, count-distinct fused into
    the same aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


# ---------------------------------------------------------------------------
# Bounded trailing-interval window (7-day rolling activity)
# ---------------------------------------------------------------------------


@_q(
    "q_window_trailing_7d",
    oracle="""
    WITH w AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id ORDER BY epoch(ts)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
             ) AS c7,
             CAST(sum(CAST(value AS DECIMAL(27,6))) OVER (
               PARTITION BY user_id ORDER BY epoch(ts)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
             ) AS DECIMAL(27,6)) AS v7
      FROM events
    )
    SELECT user_id,
           CAST(max(c7) AS BIGINT) AS peak_7d_events,
           CAST(max(v7) AS DOUBLE) AS peak_7d_value
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def q_window_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded trailing-interval window: each event's 7-day-back
    rolling event count and value sum per user, fingerprinted by the
    per-user peaks — "busiest week" analytics, the bounded-RANGE
    complement to the unbounded frames in q_window_frame.

    The frame is a true RANGE (bounded by the *ordering value*, epoch
    seconds, not row position): two events 8 days apart never share a
    frame no matter how few rows sit between them. Both engines order
    by the same numeric epoch, so frame membership is identical;
    value sums run in DECIMAL (order-independent). One shuffle on
    ``user_id``; window state is a sliding deque bounded by events-
    per-week, not history length.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    w7 = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-604800, 0)
    )
    w = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w7).alias("c7"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w7)
        .cast("decimal(27,6)")
        .alias("v7"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.max("c7").cast("bigint").alias("peak_7d_events"),
            F.max("v7").cast("double").alias("peak_7d_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Top-p (nucleus) selection per group
# ---------------------------------------------------------------------------


@_q(
    "q_top_p_nucleus",
    oracle="""
    WITH pc AS (
      SELECT p.p_brand, l.l_partkey,
             CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT p_brand, l_partkey, cents,
             CAST(sum(cents) OVER (PARTITION BY p_brand
                                   ORDER BY cents DESC, l_partkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(cents) OVER (PARTITION BY p_brand) AS BIGINT)
               AS total
      FROM pc
    )
    SELECT p_brand,
           count(*) AS nucleus_size,
           CAST(sum(cents) AS BIGINT) AS nucleus_cents,
           CAST(max(total) AS BIGINT) AS brand_cents
    FROM ranked
    WHERE (cum - cents) * 5 < total * 4
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def q_top_p_nucleus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) selection per group: for each brand, the
    minimal prefix of parts (by revenue, descending) whose cumulative
    share reaches 80% — the same cutoff rule as nucleus sampling in
    LLM decoding, here as the "which SKUs are the business" query.

    A row belongs to the nucleus iff the cumulative sum *before* it
    is under the threshold — the inclusive-crossing definition that
    keeps the crossing row and nothing after — stated as the pure
    integer cross-multiplication ``5·(cum − cents) < 4·total``: no
    0.8·total float or cast anywhere (double→bigint casts ROUND in
    DuckDB but TRUNCATE in Spark, an off-by-one at exact boundaries).
    One shuffle for the rollup, then (round 11) a two-phase cumsum
    over the rollup instead of per-brand ordered windows: the rollup
    is |brand × part| — parts-scaled — so the 25-value brand
    partition ran one WindowExec task per brand at any catalog size
    (5.1x at the 100x leg; ~1.6x two-phase). Brand totals come from a
    map-side-combined groupBy broadcast back. Never over raw
    lineitem either way.
    """
    from keycloak_event_stream_spark.operators._scale import (
        two_phase_window,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents_expr = (
        F.col("l_extendedprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    pc = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(cents_expr).alias("cents"))
    )
    totals = pc.groupBy("p_brand").agg(
        F.sum("cents").cast("bigint").alias("total")
    )
    ranked = (
        two_phase_window(
            pc,
            [F.desc("cents"), F.col("l_partkey")],
            partition_by=["p_brand"],
            cumsum={"cum": "cents"},
        )
        .withColumn("cum", F.col("cum").cast("bigint"))
        .join(F.broadcast(totals), "p_brand")
        .select("p_brand", "cents", "cum", "total")
    )
    in_nucleus = (F.col("cum") - F.col("cents")) * 5 < F.col("total") * 4
    return (
        ranked.filter(in_nucleus)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("nucleus_size"),
            F.sum("cents").cast("bigint").alias("nucleus_cents"),
            F.max("total").cast("bigint").alias("brand_cents"),
        )
        .orderBy("p_brand")
    )


@_q(
    "q_attribution_first_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_type, value, ts, event_id,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT touch, count(*) AS n_conversions,
           CAST(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DECIMAL(18,2))
                AS DOUBLE) AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase' AND touch IS NOT NULL
    GROUP BY touch ORDER BY touch
    """,
)
def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution — the acquisition-side complement of
    q_attribution_last_touch: each purchase's value credits the
    EARLIEST non-purchase event in the user's history (``first(...,
    ignorenulls)`` over the same 1-PRECEDING frame; the two models
    bracket multi-touch schemes like linear/U-shaped, which are the
    same window pass collecting the touch list instead of one value).
    Identical cost profile: one shuffle on user_id, one window, exact
    decimal value sums.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.first(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    tagged = ev.select(
        "user_id", "event_type", "value", touch.alias("touch")
    )
    return (
        tagged.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch").isNotNull()
        )
        .groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("touch")
    )


# --- Shapley channel attribution --------------------------------------

_SHAP_CHANNELS = ["click", "error", "signup", "view"]


def _shap_key(subset: tuple) -> str:
    return "|".join(sorted(subset))


def _shap_lattice():
    """Static subset lattice for the 4-channel game: (coalition,
    exact-subset) containment pairs and the per-channel Shapley terms
    with their n-choose weights. Pure combinatorics of the channel
    DOMAIN (16 coalitions, 81 containment pairs, 32 terms) — not
    data-dependent, so both engines consume identical literal tables."""
    import itertools
    import math

    chans = _SHAP_CHANNELS
    n = len(chans)
    subsets = []
    for r in range(n + 1):
        subsets.extend(itertools.combinations(chans, r))
    pairs = [
        (_shap_key(s), _shap_key(t))
        for s in subsets
        for r in range(len(s) + 1)
        for t in itertools.combinations(s, r)
    ]
    terms = []
    for c in chans:
        rest = [x for x in chans if x != c]
        for r in range(len(rest) + 1):
            for s in itertools.combinations(rest, r):
                w = (
                    math.factorial(len(s))
                    * math.factorial(n - 1 - len(s))
                    / math.factorial(n)
                )
                terms.append(
                    (c, _shap_key(tuple(s) + (c,)), _shap_key(s), w)
                )
    return pairs, terms


def _duck_shapley() -> str:
    pairs, terms = _shap_lattice()
    pair_rows = ", ".join(f"('{s}', '{t}')" for s, t in pairs)
    term_rows = ", ".join(
        f"('{c}', '{sw}', '{so}', {w!r})" for c, sw, so, w in terms
    )
    return f"""
    WITH touched AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    conv AS (
      SELECT user_id,
             CAST(max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    keys AS (
      SELECT c.user_id,
             COALESCE(array_to_string(
               list_sort(list(t.event_type)
                         FILTER (WHERE t.event_type IS NOT NULL)),
               '|'), '') AS t_key,
             c.conv
      FROM conv c LEFT JOIN touched t ON t.user_id = c.user_id
      GROUP BY c.user_id, c.conv
    ),
    exact AS (
      SELECT t_key, CAST(sum(conv) AS BIGINT) AS n_conv
      FROM keys GROUP BY t_key
    ),
    contain(s_key, t_key) AS (VALUES {pair_rows}),
    v AS (
      SELECT p.s_key,
             CAST(COALESCE(sum(e.n_conv), 0) AS BIGINT) AS val
      FROM contain p LEFT JOIN exact e ON e.t_key = p.t_key
      GROUP BY p.s_key
    ),
    shap_terms(channel, s_with, s_without, w) AS (VALUES {term_rows}),
    phi AS (
      SELECT st.channel,
             CAST(sum(CAST(round(st.w * (vw.val - vo.val), 6)
                           AS DECIMAL(27,6))) AS DOUBLE) AS phi
      FROM shap_terms st
      JOIN v vw ON vw.s_key = st.s_with
      JOIN v vo ON vo.s_key = st.s_without
      GROUP BY st.channel
    )
    SELECT channel, phi,
           phi / (SELECT CAST(sum(CAST(phi AS DECIMAL(27,6)))
                              AS DOUBLE) FROM phi) AS phi_share
    FROM phi ORDER BY channel
    """


@_q("q_shapley_attribution", oracle=_duck_shapley())
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value conversion attribution over the 4 non-purchase
    channels: the coalition value v(S) = conversions of users whose
    touched-channel set is contained in S, and each channel's phi is
    the weighted sum of its marginal contributions over all coalitions
    — the game-theoretic attribution that first/last-touch
    (q_attribution_*_touch) approximate with positional heuristics.

    The subset lattice (16 coalitions, containment pairs, Shapley
    weights) is DOMAIN combinatorics, generated once as a literal
    table and broadcast — the data side only supplies per-exact-subset
    conversion counts, one |users|-keyed aggregation however large the
    event log. phi sums |channels|x2^(n-1) small products; the only
    floats are the factorial weights, identical literals in both
    engines; term products round at 6 decimals and sum in DECIMAL so
    accumulation order cannot leak into the result."""
    pairs, terms = _shap_lattice()
    spark_pairs = spark.createDataFrame(pairs, "s_key string, t_key string")
    spark_terms = spark.createDataFrame(
        terms, "channel string, s_with string, s_without string, w double"
    )
    e = load_table(spark, sf_dir, "events")
    keys = e.groupBy("user_id").agg(
        F.coalesce(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_set(
                        F.when(
                            F.col("event_type") != "purchase",
                            F.col("event_type"),
                        )
                    )
                ),
            ),
            F.lit(""),
        ).alias("t_key"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("conv"),
    )
    exact = keys.groupBy("t_key").agg(
        F.sum("conv").cast("bigint").alias("n_conv")
    )
    v = (
        F.broadcast(spark_pairs)
        .join(exact, "t_key", "left")
        .groupBy("s_key")
        .agg(
            F.coalesce(F.sum("n_conv"), F.lit(0))
            .cast("bigint")
            .alias("val")
        )
    )
    vw = v.select(F.col("s_key").alias("s_with"), F.col("val").alias("vw"))
    vo = v.select(
        F.col("s_key").alias("s_without"), F.col("val").alias("vo")
    )
    phi = (
        spark_terms.join(F.broadcast(vw), "s_with")
        .join(F.broadcast(vo), "s_without")
        .groupBy("channel")
        .agg(
            F.sum(
                F.round(F.col("w") * (F.col("vw") - F.col("vo")), 6).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("phi")
        )
    )
    tot = phi.agg(
        F.sum(F.col("phi").cast("decimal(27,6)")).cast("double").alias("tot")
    )
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("phi").cast("double").alias("phi"),
            F.try_divide(F.col("phi"), F.col("tot"))
            .cast("double")
            .alias("phi_share"),
        )
        .orderBy("channel")
    )


# --- Markov removal-effect attribution --------------------------------

_MK_STATES = ["start", "click", "error", "signup", "view"]
_MK_GAMES = ["full", "click", "error", "signup", "view"]
_MK_ITERS = 12


def _mk_skeleton():
    """Static dense skeleton of the 5 removal games: for game g, the
    transition (src -> dst) survives only if neither endpoint is the
    removed channel (removing a channel makes paths through it fail,
    i.e. the channel absorbs to null). Domain combinatorics, identical
    literal tables in both engines."""
    cells = []
    for g in _MK_GAMES:
        removed = None if g == "full" else g
        for i, src in enumerate(_MK_STATES, start=1):
            for j, dst in enumerate(_MK_STATES, start=1):
                keep = src != removed and dst != removed
                cells.append((g, i, j, src, dst, 1 if keep else 0))
    bvec = []
    for g in _MK_GAMES:
        removed = None if g == "full" else g
        for i, src in enumerate(_MK_STATES, start=1):
            bvec.append((g, i, src, 1 if src != removed else 0))
    return cells, bvec


def _duck_markov() -> str:
    cells, bvec = _mk_skeleton()
    cell_rows = ", ".join(
        f"('{g}', {i}, {j}, '{s}', '{d}', {k})" for g, i, j, s, d, k in cells
    )
    b_rows = ", ".join(
        f"('{g}', {i}, '{s}', {k})" for g, i, s, k in bvec
    )
    return f"""
    WITH RECURSIVE fp AS (
      SELECT user_id, min(ts) AS fts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    steps AS MATERIALIZED (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             fp.fts IS NOT NULL AS conv
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (fp.fts IS NULL OR e.ts < fp.fts)
    ),
    hops AS (
      SELECT user_id,
             COALESCE(lag(event_type) OVER w, 'start') AS src,
             event_type AS dst
      FROM steps
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    lasts AS (
      SELECT user_id, event_type AS last_ev FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM steps) WHERE rn = 1
    ),
    allu AS (
      SELECT e.user_id,
             CAST(max(CASE WHEN e.event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events e GROUP BY e.user_id
    ),
    terminal AS (
      SELECT a.user_id,
             COALESCE(l.last_ev, 'start') AS src,
             CASE WHEN a.conv = 1 THEN 'conv' ELSE 'null' END AS dst
      FROM allu a LEFT JOIN lasts l ON l.user_id = a.user_id
    ),
    trans AS MATERIALIZED (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT src, dst FROM hops
        UNION ALL SELECT src, dst FROM terminal
      ) GROUP BY src, dst
    ),
    tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM trans
            GROUP BY src),
    prob AS MATERIALIZED (
      SELECT tr.src, tr.dst, CAST(tr.c AS DOUBLE) / tot.t AS p
      FROM trans tr JOIN tot ON tot.src = tr.src
    ),
    cellskel(game, i, j, src, dst, keep) AS (VALUES {cell_rows}),
    bskel(game, i, src, keep) AS (VALUES {b_rows}),
    amat AS MATERIALIZED (
      SELECT game, list(arr ORDER BY i) AS mm FROM (
        SELECT cs.game, cs.i,
               list(CASE WHEN cs.keep = 1
                         THEN COALESCE(pr.p, 0.0) ELSE 0.0 END
                    ORDER BY cs.j) AS arr
        FROM cellskel cs
        LEFT JOIN prob pr ON pr.src = cs.src AND pr.dst = cs.dst
        GROUP BY cs.game, cs.i)
      GROUP BY game
    ),
    bmat AS MATERIALIZED (
      SELECT bs.game,
             list(CASE WHEN bs.keep = 1
                       THEN COALESCE(pr.p, 0.0) ELSE 0.0 END
                  ORDER BY bs.i) AS bb
      FROM bskel bs
      LEFT JOIN prob pr ON pr.src = bs.src AND pr.dst = 'conv'
      GROUP BY bs.game
    ),
    it AS (
      SELECT a.game, 0 AS k,
             list_transform(range(1, 6),
                            x -> CAST(0.0 AS DOUBLE)) AS vv
      FROM amat a
      UNION ALL
      SELECT it.game, it.k + 1,
             list_transform(range(1, 6),
               ii -> list_dot_product(a.mm[ii], it.vv) + b.bb[ii])
      FROM it
      JOIN amat a ON a.game = it.game
      JOIN bmat b ON b.game = it.game
      WHERE it.k < {_MK_ITERS}
    ),
    fin AS (
      SELECT game, vv[1] AS p_start FROM it WHERE k = {_MK_ITERS}
    )
    SELECT g.game AS channel, g.p_start AS conv_prob_without,
           f.p_start AS conv_prob_full,
           1.0 - g.p_start / f.p_start AS removal_effect
    FROM fin g CROSS JOIN (SELECT p_start FROM fin
                           WHERE game = 'full') f
    WHERE g.game <> 'full'
    ORDER BY channel
    """


@_q("q_markov_attribution", oracle=_duck_markov())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: build the first-order channel
    transition graph from per-user journeys (start -> touched channels
    -> conv/null at first purchase), compute the absorption probability
    of converting from 'start' by 12 steps of value iteration
    (p = A·p + b), then re-run the chain with each channel removed
    (paths through it absorb to null) — a channel's credit is how much
    the conversion probability drops without it. The principled
    companion to q_shapley_attribution (set-based) and first/last
    touch (positional).

    Scale: journeys reduce to a |states|² transition count in one
    shuffle; the 5 removal games iterate TOGETHER as 5 rows of
    (matrix, offset) arrays — value iteration is per-row expression
    work with localCheckpoint barriers (the q_embed_pca_power
    pattern), zero additional scans of the event log. Determinism:
    probabilities are single divisions of exact counts; each iteration
    is a sequential dot-product fold — bitwise vs DuckDB's recursive
    CTE."""
    cells, bvec = _mk_skeleton()
    cellskel = spark.createDataFrame(
        cells, "game string, i int, j int, src string, dst string, keep int"
    )
    bskel = spark.createDataFrame(
        bvec, "game string, i int, src string, keep int"
    )
    e = load_table(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
    )
    steps = (
        e.join(F.broadcast(fp), "user_id", "left")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("fts").isNull() | (F.col("ts") < F.col("fts")))
        )
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.col("fts").isNotNull().alias("conv"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = steps.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("start")).alias(
            "src"
        ),
        F.col("event_type").alias("dst"),
    )
    lasts = steps.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type"))["event_type"].alias(
            "last_ev"
        )
    )
    allu = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    terminal = allu.join(lasts, "user_id", "left").select(
        F.coalesce(F.col("last_ev"), F.lit("start")).alias("src"),
        F.when(F.col("conv") == 1, "conv").otherwise("null").alias("dst"),
    )
    trans = (
        hops.unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = trans.groupBy("src").agg(F.sum("c").cast("bigint").alias("t"))
    prob = trans.join(tot, "src").select(
        "src", "dst", (F.col("c").cast("double") / F.col("t")).alias("p")
    )
    p_or_0 = lambda: F.when(
        (F.col("keep") == 1) & F.col("p").isNotNull(), F.col("p")
    ).otherwise(F.lit(0.0))
    amat = (
        F.broadcast(cellskel)
        .join(prob, ["src", "dst"], "left")
        .select("game", "i", "j", p_or_0().alias("pj"))
        .groupBy("game", "i")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(j, pj))),"
                " s -> s.pj)"
            ).alias("arr")
        )
        .groupBy("game")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, arr))),"
                " s -> s.arr)"
            ).alias("mm")
        )
    )
    conv_prob = prob.filter(F.col("dst") == "conv").select(
        "src", F.col("p").alias("p")
    )
    bmat = (
        F.broadcast(bskel)
        .join(conv_prob, "src", "left")
        .select("game", "i", p_or_0().alias("pb"))
        .groupBy("game")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, pb))),"
                " s -> s.pb)"
            ).alias("bb")
        )
    )
    it = (
        amat.join(bmat, "game")
        .withColumn("vv", F.expr("transform(sequence(1, 5), x -> 0.0D)"))
        .localCheckpoint(eager=False)
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    for _ in range(_MK_ITERS):
        it = it.withColumn(
            "vv",
            F.expr(
                "transform(sequence(1, 5),"
                f" ii -> {dot.format(a='element_at(mm, ii)', b='vv')}"
                " + element_at(bb, ii))"
            ),
        ).localCheckpoint(eager=False)
    fin = it.select("game", F.expr("element_at(vv, 1)").alias("p_start"))
    full = fin.filter(F.col("game") == "full").select(
        F.col("p_start").alias("conv_prob_full")
    )
    return (
        fin.filter(F.col("game") != "full")
        .crossJoin(F.broadcast(full))
        .select(
            F.col("game").alias("channel"),
            F.col("p_start").alias("conv_prob_without"),
            "conv_prob_full",
            (
                F.lit(1.0)
                - F.try_divide(F.col("p_start"), F.col("conv_prob_full"))
            ).alias("removal_effect"),
        )
        .orderBy("channel")
    )


@_q(
    "q_user_features",
    oracle="""
    WITH mx AS (SELECT max(ts) AS corpus_max FROM events)
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT time_bucket(INTERVAL 1 DAY, e.ts))
                AS BIGINT) AS active_days,
           CAST(date_diff('second', max(e.ts),
                          any_value(mx.corpus_max)) AS BIGINT)
             AS recency_s,
           CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1
                         ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN e.event_type = 'error' THEN 1
                         ELSE 0 END) AS BIGINT) AS n_error,
           CAST(sum(CAST(round(e.value, 6) AS DECIMAL(27,6)))
                AS DOUBLE) AS total_value,
           CAST(CASE WHEN count(*) > 1
                THEN date_diff('second', min(e.ts), max(e.ts))
                     / (count(*) - 1) END AS DOUBLE)
             AS mean_gap_s
    FROM events e CROSS JOIN mx
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature-store assembly: the wide vector a churn /
    propensity model consumes — recency (seconds behind the corpus
    frontier), frequency, active days, type mix, exact-decimal
    monetary total, and mean inter-event gap — all in ONE pass over
    the events table. This is the materialization pattern for an
    online feature store at 100 TB: conditional aggregates fuse into
    a single shuffle on user_id; the corpus frontier is a 1-row
    broadcast; nothing is computed per-feature-per-scan.

    Counts and second-granularity gaps are integers; the one float
    sum uses the 6-dp decimal discipline; the mean gap is a single
    division (exact integer operands). distinct-day counting stays
    inside the same aggregate (Spark plans a two-phase
    count-distinct, still one logical pass)."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    gap_s = (
        F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct(F.date_trunc("day", F.col("ts")))
            .cast("bigint")
            .alias("active_days"),
            (
                F.unix_timestamp(F.first("corpus_max"))
                - F.unix_timestamp(F.max("ts"))
            )
            .cast("bigint")
            .alias("recency_s"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchase"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_error"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
            F.when(
                F.count(F.lit(1)) > 1,
                (gap_s / (F.count(F.lit(1)) - 1)).cast("double"),
            ).alias("mean_gap_s"),
        )
        .orderBy("user_id")
    )


@_q(
    "q_attribution_time_decay",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts,
             CAST(round(value, 6) AS DECIMAL(27,6)) AS conv_value
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type, ts
      FROM events WHERE event_type IN ('click', 'view')
    ),
    paired AS (
      SELECT c.conv_id, c.conv_value, t.event_type,
             round(exp(-ln(2.0)
                       * (epoch(c.conv_ts) - epoch(t.ts))
                       / (3.5 * 86400.0)), 6) AS w
      FROM conv c
      JOIN touch t ON t.user_id = c.user_id
                  AND t.ts < c.conv_ts
                  AND t.ts >= c.conv_ts - INTERVAL 7 DAYS
    ),
    norm AS (
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_touch,
             CAST(sum(CAST(w AS DECIMAL(27,6))) AS DOUBLE) AS sw
      FROM paired GROUP BY conv_id
    )
    SELECT p.event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CAST(round(CAST(p.conv_value AS DOUBLE)
                               / n.n_touch, 6)
                         AS DECIMAL(27,6))) AS DOUBLE)
             AS credit_linear,
           CAST(sum(CAST(round(CAST(p.conv_value AS DOUBLE)
                               * p.w / n.sw, 6)
                         AS DECIMAL(27,6))) AS DOUBLE)
             AS credit_decay
    FROM paired p JOIN norm n ON n.conv_id = p.conv_id
    GROUP BY p.event_type
    ORDER BY p.event_type
    """,
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, linear and time-decay (half-life 3.5
    days), over the 7-day pre-purchase window — completing the
    attribution ladder next to first/last-touch (position rules),
    Shapley (cooperative value) and Markov (removal effect): linear
    splits each conversion's value evenly across its touches;
    time-decay weights each touch by 2^(−Δ/half-life), normalized
    per conversion.

    Scale: the touch↔conversion pairing is an equi-join on user_id
    with a time-range predicate — both sides shuffle once on the user
    key and the fan-out is bounded by per-user activity in the window,
    never a cross join. Weights and per-touch credits round at 6 dp
    into DECIMAL sums (order-independent); the per-conversion
    normalizer is one extra keyed aggregate."""
    ev = spread(load_table(spark, sf_dir, "events"))
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.round(F.col("value"), 6).cast("decimal(27,6)").alias("conv_value"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        "ts",
    )
    w = F.round(
        F.exp(
            -F.log(F.lit(2.0))
            * (
                F.unix_micros(F.col("conv_ts")) / 1e6
                - F.unix_micros(F.col("ts")) / 1e6
            )
            / (3.5 * 86400.0)
        ),
        6,
    )
    paired = (
        conv.join(
            touch,
            (conv.user_id == touch.user_id)
            & (touch.ts < conv.conv_ts)
            & (touch.ts >= conv.conv_ts - F.expr("INTERVAL 7 DAYS")),
        )
        .select("conv_id", "conv_value", "event_type", w.alias("w"))
    )
    norm = paired.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touch"),
        F.sum(F.col("w").cast("decimal(27,6)")).cast("double").alias("sw"),
    )
    return (
        paired.join(norm, "conv_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(
                F.round(
                    F.col("conv_value").cast("double") / F.col("n_touch"),
                    6,
                ).cast("decimal(27,6)")
            )
            .cast("double")
            .alias("credit_linear"),
            F.sum(
                F.round(
                    F.col("conv_value").cast("double")
                    * F.col("w")
                    / F.col("sw"),
                    6,
                ).cast("decimal(27,6)")
            )
            .cast("double")
            .alias("credit_decay"),
        )
        .orderBy("event_type")
    )


@_q(
    "q_churn_labels",
    oracle="""
    WITH mx AS (
      SELECT max(ts) AS frontier FROM events
    ),
    lab AS (
      SELECT e.user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             max(e.ts) AS last_ts,
             CAST(CASE WHEN max(e.ts) < any_value(mx.frontier)
                                        - INTERVAL 10 DAYS
                       THEN 1 ELSE 0 END AS INTEGER) AS churned
      FROM events e CROSS JOIN mx
      GROUP BY e.user_id
    )
    SELECT user_id, n_events, last_ts, churned,
           CAST(CASE WHEN CAST(user_id AS BIGINT) % 5 = 0
                     THEN 'valid' ELSE 'train' END AS VARCHAR)
             AS split
    FROM lab
    ORDER BY user_id
    """,
)
def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label construction for churn modeling: a user is
    labeled churned when silent for the last 10 days before the
    corpus frontier, with a deterministic 80/20 train/valid split —
    the third leg of the in-engine training-set assembly next to
    q_user_features (the X) and q_temporal_split_embargo (the
    leakage-safe evaluation protocol). Joining this to
    q_user_features on user_id yields a ready (X, y, split) table.

    One shuffle to per-user last-activity, the frontier as a 1-row
    broadcast, and a pure hash split — no RNG, no driver state; at
    100 TB the label build costs exactly one aggregate of the events
    table."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("frontier"))
    lab = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.when(
                F.max("ts")
                < F.first("frontier") - F.expr("INTERVAL 10 DAYS"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("churned"),
        )
    )
    return lab.select(
        "user_id",
        "n_events",
        "last_ts",
        "churned",
        F.when(F.col("user_id").cast("bigint") % 5 == 0, "valid")
        .otherwise("train")
        .cast("string")
        .alias("split"),
    ).orderBy("user_id")


@_q(
    "q_association_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
      FROM items
    ),
    item_n AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
      FROM items GROUP BY l_partkey
    ),
    pair_n AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    top AS (
      SELECT pa, pb, n_ab FROM pair_n
      ORDER BY n_ab DESC, pa, pb LIMIT 25
    )
    SELECT t.pa AS antecedent, t.pb AS consequent, t.n_ab,
           ia.n_item AS n_a, ib.n_item AS n_b, o.n AS n_orders,
           CAST(t.n_ab AS DOUBLE) / o.n AS support,
           CAST(t.n_ab AS DOUBLE) / ia.n_item AS confidence,
           CAST(t.n_ab AS DOUBLE) * o.n
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
    FROM top t
    JOIN item_n ia ON ia.l_partkey = t.pa
    JOIN item_n ib ON ib.l_partkey = t.pb
    CROSS JOIN n_orders o
    ORDER BY t.n_ab DESC, antecedent, consequent
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics (support / confidence / lift) for the
    top-25 co-ordered part pairs — the layer q_market_basket's raw
    counts feed: confidence says "how often does A's basket contain
    B", lift says "more than chance?" (lift < 1 for popular-but-
    unrelated pairs is exactly what raw counts hide).

    Scale: the basket pairing reuses the in-row expansion shuffle;
    the top-25 pair table is tiny and joins the per-item counts by
    key (the big item table is keyed, never broadcast); the order
    total is a 1-row cross join. Every metric is a single division
    of exact BIGINT counts."""
    # Bounded-eval width (catalog.bounded_eval_scope): the pair
    # expansion + its persisted `items` prefix at corpus width measured
    # 19-21 s vanilla for a 25-row result; input-derived width reads
    # ~1 s. The WHOLE body runs under the scope: persist() compiles the
    # cached subtree's physical plan eagerly at call time, so a pin
    # created outside the scope would keep corpus width forever.
    with bounded_eval_scope(spark, footer_rows(sf_dir, "lineitem")):
        li = load_table(spark, sf_dir, "lineitem")
        items = li.select("l_orderkey", "l_partkey").distinct()
        items = items.persist()
        n_orders = items.agg(
            F.countDistinct("l_orderkey").cast("bigint").alias("n")
        )
        item_n = items.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_item")
        )
        a = items.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
        )
        b = items.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
        )
        pair_n = (
            a.join(b, ["ok"])
            .filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        )
        top = pair_n.orderBy(
            F.col("n_ab").desc(), "pa", "pb"
        ).limit(25)
        ia = item_n.select(
            F.col("l_partkey").alias("pa"), F.col("n_item").alias("n_a")
        )
        ib = item_n.select(
            F.col("l_partkey").alias("pb"), F.col("n_item").alias("n_b")
        )
        rules = (
            F.broadcast(top)
            .join(ia, "pa")
            .join(ib, "pb")
            .crossJoin(F.broadcast(n_orders))
            .select(
                F.col("pa").alias("antecedent"),
                F.col("pb").alias("consequent"),
                "n_ab",
                "n_a",
                "n_b",
                F.col("n").alias("n_orders"),
                (F.col("n_ab").cast("double") / F.col("n")).alias("support"),
                (F.col("n_ab").cast("double") / F.col("n_a")).alias(
                    "confidence"
                ),
                (
                    F.col("n_ab").cast("double")
                    * F.col("n")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ).alias("lift"),
            )
            .orderBy(F.col("n_ab").desc(), "antecedent", "consequent")
        )
        try:
            out = rules.localCheckpoint(eager=True)
        finally:
            items.unpersist()
    return out


@_q(
    "q_price_elasticity",
    oracle="""
    WITH obs AS (
      SELECT p.p_brand,
             round(ln(CAST(CAST(CAST(l.l_extendedprice
                                     AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS DOUBLE)
                      / CAST(CAST(CAST(l.l_quantity AS DECIMAL(18,2))
                                  * 100 AS BIGINT) AS DOUBLE)), 6)
               AS lp,
             round(ln(CAST(l.l_quantity AS DOUBLE)), 6) AS lq
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    micro AS (
      SELECT p_brand,
             CAST(CAST(lp AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x,
             CAST(CAST(lq AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS y
      FROM obs
    ),
    m AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(x) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM micro GROUP BY p_brand
    )
    SELECT p_brand, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS elasticity
    FROM m
    ORDER BY p_brand
    """,
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the log-log OLS slope of
    quantity on unit price, d ln q / d ln p — the one-coefficient
    econometric readout (< −1 elastic, −1..0 inelastic) that q_agg_
    linreg's level-space slope can't give because elasticity is a
    RATIO effect. Unit price derives in exact decimal before the one
    log.

    Logs round at 6 dp and are the regression inputs (the
    q_vocab_growth_heaps discipline) so every moment is an exact
    decimal sum; the slope is closed-form per brand. One
    broadcast-dim join (part), one shuffle to |brands| cells."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    qc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    unit = pc.cast("double") / qc.cast("double")
    obs = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .select(
            "p_brand",
            F.round(F.log(unit), 6).alias("lp"),
            F.round(F.log(F.col("l_quantity").cast("double")), 6).alias(
                "lq"
            ),
        )
    )
    # 6-dp logs scale losslessly to integer micro-units, so every
    # moment is an integer sum (the only decimal->double casts are
    # integer-valued — the q_agg_corr int128-portability discipline);
    # the 1e12 scale factor cancels in the slope ratio
    micro = obs.select(
        "p_brand",
        (F.col("lp").cast("decimal(18,6)") * 1000000)
        .cast("bigint")
        .alias("x"),
        (F.col("lq").cast("decimal(18,6)") * 1000000)
        .cast("bigint")
        .alias("y"),
    )
    m = micro.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum("y").cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select("p_brand", "n", slope.alias("elasticity")).orderBy(
        "p_brand"
    )


@_q(
    "q_recency_weighted_value",
    oracle="""
    WITH mx AS (SELECT max(ts) AS frontier FROM events),
    w AS (
      SELECT e.user_id,
             round(CAST(round(e.value, 6) AS DOUBLE)
                   * exp(-ln(2.0)
                         * (epoch(mx.frontier) - epoch(e.ts))
                         / (7.0 * 86400.0)), 6) AS wv
      FROM events e CROSS JOIN mx
      WHERE e.event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(wv AS DECIMAL(27,6))) AS DOUBLE)
             AS decayed_value
    FROM w GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed customer value: each purchase weighted by
    2^(−age/7d) from the corpus frontier — the feature-store column
    that ranks a customer who bought yesterday above one who bought
    the same amount a month ago (plain totals can't), feeding the
    same models as q_user_features / q_churn_labels and using the
    same half-life kernel as q_attribution_time_decay.

    Frontier is a 1-row broadcast; the decay weight is a per-row
    closed form over exact epoch differences, rounded at 6 dp into
    an order-independent DECIMAL sum per user (internal magnitudes
    stay far below the 2^53 drift line). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("frontier"))
    age_s = (
        F.unix_micros(F.col("frontier")) / 1e6
        - F.unix_micros(F.col("ts")) / 1e6
    )
    wv = F.round(
        F.round(F.col("value"), 6).cast("double")
        * F.exp(-F.log(F.lit(2.0)) * age_s / (7.0 * 86400.0)),
        6,
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("wv").cast("decimal(27,6)"))
            .cast("double")
            .alias("decayed_value"),
        )
        .orderBy("user_id")
    )


@_q(
    "q_histogram_2d",
    oracle="""
    WITH rng AS (
      SELECT CAST(min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS pmin,
             CAST(max(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS pmax,
             CAST(min(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS qmin,
             CAST(max(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS qmax
      FROM lineitem
    ),
    binned AS (
      SELECT least(((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) - r.pmin) * 8)
                   // (r.pmax - r.pmin + 1), 7) AS price_bin,
             least(((CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                          AS BIGINT) - r.qmin) * 8)
                   // (r.qmax - r.qmin + 1), 7) AS qty_bin
      FROM lineitem CROSS JOIN rng r
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM binned)
    SELECT CAST(price_bin AS BIGINT) AS price_bin,
           CAST(qty_bin AS BIGINT) AS qty_bin,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(*) AS DOUBLE) / max(t.n) AS share
    FROM binned CROSS JOIN tot t
    GROUP BY price_bin, qty_bin
    ORDER BY price_bin, qty_bin
    """,
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8×8 equi-width 2-D histogram of (price, quantity) — the joint
    heat map behind every price-volume scatter dashboard, and the
    discretization a mutual-information or copula estimate consumes
    (q_histogram_equiwidth is the 1-D marginal; the JOINT cells are
    where "cheap items sell in bulk" becomes visible).

    Bin arithmetic is ALL integer: values quantize to exact cents,
    bin = (v − min)·8 // (max − min + 1), clamped — no float widths,
    so edge values land identically in both engines. Corpus min/max
    ride a 1-row broadcast; one keyed aggregate to ≤64 cells."""
    l = spread(load_table(spark, sf_dir, "lineitem"))
    pc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    qc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    base = l.select(pc.alias("p"), qc.alias("q"))
    rng = base.agg(
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
        F.min("q").alias("qmin"),
        F.max("q").alias("qmax"),
    )

    def bin_(v, lo, hi):
        num = (F.col(v) - F.col(lo)) * 8
        den = F.col(hi) - F.col(lo) + 1
        return F.least((num - num % den) / den, F.lit(7)).cast("bigint")

    binned = base.crossJoin(F.broadcast(rng)).select(
        bin_("p", "pmin", "pmax").alias("price_bin"),
        bin_("q", "qmin", "qmax").alias("qty_bin"),
    )
    tot = binned.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("price_bin", "qty_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            (F.count(F.lit(1)).cast("double") / F.max("n")).alias("share"),
        )
        .orderBy("price_bin", "qty_bin")
    )


@_q(
    "q_attribution_position_based",
    oracle="""
    WITH fp AS (
      SELECT user_id, min(ts) AS p_ts,
             arg_min(event_id,
                     lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS p_eid,
             arg_min(CAST(value AS DOUBLE),
                     lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS p_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    prior AS (
      SELECT e.user_id, e.event_type, fp.p_value,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN fp ON fp.user_id = e.user_id
      WHERE (e.ts < fp.p_ts
             OR (e.ts = fp.p_ts AND e.event_id < fp.p_eid))
        AND e.event_type <> 'purchase'
    ),
    credited AS (
      SELECT event_type,
             round(p_value *
               CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN rn = 1 OR rn = n THEN 0.4
                    ELSE 0.2 / (n - 2) END, 6) AS credit
      FROM prior
    )
    SELECT event_type AS channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CAST(credit AS DECIMAL(27,6))) AS DOUBLE)
             AS attributed_value
    FROM credited
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: each user's first
    purchase credits its value 40% to the FIRST prior touch, 40% to
    the LAST, and splits the remaining 20% equally across the middle
    (journeys of 1 or 2 touches degrade to 100% / 50-50) — the
    industry-default compromise between q_attribution_first_touch and
    _last_touch that q_shapley_attribution is usually benchmarked
    against.

    One broadcast of the |users|-row first-purchase table tags prior
    events; position and journey length come from one user-partitioned
    window pass; weights are CASE rationals over integer (rn, n);
    per-touch credits round to 6 decimals before the DECIMAL channel
    sum (the q_chi_square order-independence discipline). The purchase
    value rides along via arg_min over the zero-padded
    (epoch_us, event_id) total order (full int64 pad widths)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase")
    fpk = F.min(
        F.struct(
            "ts", "event_id", F.col("value").cast("double").alias("value")
        )
    ).alias("fpk")
    fp = p.groupBy("user_id").agg(fpk).select(
        "user_id",
        F.col("fpk.ts").alias("p_ts"),
        F.col("fpk.event_id").alias("p_eid"),
        F.col("fpk.value").alias("p_value"),
    )
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_n = Window.partitionBy("user_id")
    prior = (
        ev.join(F.broadcast(fp), "user_id")
        .filter(
            (
                (F.col("ts") < F.col("p_ts"))
                | (
                    (F.col("ts") == F.col("p_ts"))
                    & (F.col("event_id") < F.col("p_eid"))
                )
            )
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            "p_value",
            F.row_number().over(w_rn).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
    )
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credited = prior.select(
        "event_type",
        F.round(F.col("p_value") * weight, 6).alias("credit"),
    )
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.col("credit").cast("decimal(27,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("channel")
    )
