"""Complete TPC-H suite on the fixture star schema (SURVEY.md §2.3).

Q3/Q5/Q6/Q10/Q18 live in :mod:`.relational_ext`; this module adds the
remaining 17 so every TPC-H query shape is represented. The reference
implements no joins or aggregates at all (SURVEY.md §2.2 — its queries
are single-table filter/sort/paginate SQL strings,
``AthenaEventQuery.java:136-159``), so this whole suite is north-star
engine surface expressed with built-in Catalyst operators.

The fixture schema (FIXTURES.md §A) is TPC-H-ish but reduced: there is
no ``partsupp`` table and no ``l_shipmode`` / ``l_commitdate`` /
``l_receiptdate`` / ``p_container`` / ``c_phone`` columns. Where a query
needs one, the adaptation is documented in its docstring and applied
identically to the Spark plan and the DuckDB oracle, so the correctness
check is still exact:

- ``partsupp``       -> ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``
- lateness predicate -> ``l_shipdate > o_orderdate (+ slack)``
- ``c_phone`` prefix -> last digit of ``c_name``
- ``ps_supplycost``  -> ``p_retailprice``

Exactness discipline: every floating aggregate goes through
:mod:`._exact` (decimal accumulate, double at the boundary) so results
are order-independent — required for the oracle hash and the right call
for a 1000-executor cluster where partial-agg order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from keycloak_event_stream_spark.catalog import load_table, spread
from keycloak_event_stream_spark.operators._exact import (
    DEC,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                     "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): full-scan aggregation into 6 groups
    with 8 simultaneous aggregates. The canonical map-side-combine
    benchmark: each task folds its partition into 6 partial rows, the
    exchange moves |tasks|*6 rows, and whole-stage codegen keeps the
    per-row cost to a handful of decimal adds. Date cutoff adapted to
    the fixture's 2001-11-04 shipdate horizon."""
    l = spread(_t(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (argmin per part)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           s.s_suppkey
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 25 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: ``partsupp`` is the
    distinct (l_partkey, l_suppkey) pairs observed in lineitem, and the
    argmin is over ``s_acctbal`` (no ``ps_supplycost`` column). The
    oracle states it as the original's correlated scalar subquery; the
    Spark plan decorrelates it by hand into a min-over-window — one
    shuffle on p_partkey instead of a per-row subquery, which is how
    Catalyst itself rewrites the correlated form at scale. Dimensions
    (supplier, nation, region) broadcast."""
    ps = (
        spread(_t(spark, sf_dir, "lineitem"))
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, ps.l_partkey == p.p_partkey)
    )
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "s_suppkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey",
            "s_suppkey",
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi join)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the original's
    ``l_commitdate < l_receiptdate`` lateness test becomes
    ``l_shipdate > o_orderdate`` (the fixture carries no commit/receipt
    dates). The EXISTS compiles to a left-semi hash join on orderkey
    with the inequality as a residual — lineitem is never widened, and
    each order contributes at most one row regardless of how many
    lineitems match."""
    o = spread(_t(spark, sf_dir, "orders")).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = spread(_t(spark, sf_dir, "lineitem"))
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair filter over
    a five-way join, revenue per (supplier nation, customer nation,
    ship year). Both nation legs broadcast; the disjunctive pair filter
    sits above them and prunes before the aggregate. The two fact
    joins (lineitem⋈orders, orders⋈customer) are the only shuffles."""
    s = _t(spark, sf_dir, "supplier")
    l = spread(_t(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = spread(_t(spark, sf_dir, "orders"))
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           CAST(sum(CAST(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(sum(CAST(volume AS DECIMAL(27,6))) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_5's share of PROMO-part
    revenue sold into ASIA customers, per order year. Conditional
    aggregation (sum-if / sum) with both sums in exact decimal and the
    share computed in double at the boundary — the division is
    deterministic because both operands are exact. Part filter prunes
    lineitem early via the partkey join; supplier nation rides a
    broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = spread(_t(spark, sf_dir, "lineitem"))
    s = _t(spark, sf_dir, "supplier")
    o = spread(_t(spark, sf_dir, "orders")).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", volume)
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume"))
                    .otherwise(F.lit(0.0))
                    .cast(DEC)
                ).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit measure
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum("amount", "sum_profit")}
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit = revenue minus
    ``p_retailprice * l_quantity`` (the fixture has no
    ``ps_supplycost``), parts chosen by name LIKE '%red%'. Profit per
    supplier nation per order year. The LIKE filter prunes part before
    it broadcasts into lineitem; orders joins on the shuffle."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = spread(_t(spark, sf_dir, "lineitem"))
    s = _t(spark, sf_dir, "supplier")
    o = spread(_t(spark, sf_dir, "orders"))
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("amount", amount)
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (scalar-subquery threshold)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS value
    FROM val
    WHERE v > (SELECT sum(v) * 0.001 FROM val)
    ORDER BY value DESC, l_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: per-part "inventory value"
    is the summed extendedprice shipped by EUROPE-region suppliers (no
    ``partsupp.ps_availqty * ps_supplycost``); keep parts whose value
    exceeds 0.1% of the total. The global threshold is a one-row
    aggregate cross-joined back as a broadcast — the Spark form of the
    scalar subquery, with the threshold comparison done in exact
    decimal on both sides."""
    l = spread(_t(spark, sf_dir, "lineitem"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("v"))
    )
    total = val.agg((F.sum("v") * F.lit(0.001)).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select("l_partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-priority classification
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted:
    ``l_returnflag`` stands in for the missing ``l_shipmode`` IN-list
    and ``l_shipdate > o_orderdate`` for the commit/receipt lateness
    chain. Pivoted conditional counts per flag — integer arithmetic,
    exact by construction."""
    o = spread(_t(spark, sf_dir, "orders"))
    l = spread(_t(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): outer join with a join-side
    predicate (priority <> '5-LOW' stands in for the original's
    comment NOT LIKE), count of orders per customer *including zeros*,
    then the histogram of those counts. Two aggregations: the first
    shuffles on custkey, the second on the (tiny) count domain.
    ``count(o_orderkey)`` counts only non-null matches, so
    customers with no qualifying orders land in the c_count=0 bucket —
    the semantic reason the join must be LEFT with the predicate in
    the ON clause, not a WHERE."""
    c = _t(spark, sf_dir, "customer")
    o = spread(_t(spark, sf_dir, "orders")).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q14",
    oracle="""
    SELECT 100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(27,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO share of one month's revenue
    as a percentage. The fixture's ``p_type`` is a flat enum, so the
    original's ``LIKE 'PROMO%'`` is an exact match here. One broadcast
    join (part is the small side after pruning to partkey+type), one
    global conditional aggregate; exact decimal sums, double ratio."""
    l = spread(_t(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0.0))
                    .cast(DEC)
                ).cast("double")
                / F.sum(rev.cast(DEC)).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (view + scalar max)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max. The original's CREATE VIEW becomes a reused DataFrame; the
    scalar max is a one-row broadcast cross join (not a window over a
    single partition — the per-supplier aggregate may be large at
    scale, and a global-window sort would serialize it through one
    task). Revenue equality is safe because both engines produce the
    identical exact-decimal double."""
    l = spread(_t(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue0, s.s_suppkey == revenue0.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (distinct count with exclusions)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: ``partsupp``
    is the distinct lineitem pair set, and the excluded-supplier
    subquery (originally comment LIKE '%Customer%Complaints%') is
    suppliers with negative account balance. NOT IN compiles to a
    null-aware anti join; s_suppkey is non-null so it degenerates to a
    plain left-anti broadcast. Distinct count per (brand, type, size)
    shuffles once on the group key with the distinct handled by a
    two-phase expand."""
    ps = (
        spread(_t(spark, sf_dir, "lineitem"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated average)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q17",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(27,6)))
                           AS DOUBLE) / count(l2.l_quantity))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders of
    less than 20% of a part's average order quantity. The correlated
    AVG subquery is decorrelated into a per-part aggregate joined back
    on partkey — one extra shuffle of |parts| rows instead of a
    re-scan per row. ``p_type = 'SMALL'`` stands in for the original's
    container predicate. The threshold is an exact-decimal mean scaled
    in double, so both engines compare against bit-identical bounds."""
    l = spread(_t(spark, sf_dir, "lineitem"))
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    per_part = l.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * davg("l_quantity", "_m")).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), l.l_partkey == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q19",
    oracle=f"""
    SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): a disjunction of three
    brand/size/quantity conjuncts spanning both join sides (container
    and shipmode legs dropped — columns absent). Catalyst extracts the
    common part-side implication (brand/size union) below the join via
    predicate inference, so the broadcast build side carries only
    candidate parts; the mixed OR is evaluated as the join residual."""
    l = spread(_t(spark, sf_dir, "lineitem"))
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 10)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 15)
            & (q >= 20) & (q <= 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q20",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(27,6))) > 50)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: suppliers in
    EUROPE who moved more than 50 units of some PROMO part in 1996
    (the original compares ``ps_availqty`` against half the shipped
    quantity; with no partsupp the threshold is absolute). Aggregate →
    HAVING → IN compiles to agg + left-semi join, the same
    decorrelation the original's nested subqueries need. Exact decimal
    quantity sum keeps the HAVING boundary deterministic."""
    l = spread(_t(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    lateness test is ``l_shipdate > o_orderdate + 60 days`` (no
    receipt/commit dates). Sole-late-supplier detection on
    multi-supplier finished orders. Instead of the oracle's
    EXISTS/NOT-EXISTS pair (two more scans of lineitem), the Spark
    plan aggregates each order once — distinct suppliers, distinct
    late suppliers — and joins that profile back to the late rows:
    same semantics, one shuffle on orderkey, three scans total
    becomes two."""
    s = _t(spark, sf_dir, "supplier")
    o = spread(_t(spark, sf_dir, "orders")).filter(
        F.col("o_orderstatus") == "F"
    )
    l = spread(_t(spark, sf_dir, "lineitem"))
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    rows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn("is_late", (F.col("l_shipdate") > late_cut).cast("int"))
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    # Two-level aggregate instead of a double countDistinct: the expand
    # Spark plans for multiple distinct aggregates would double every
    # row through the shuffle; collapsing to (orderkey, suppkey) first
    # ships only distinct pairs, and the second agg input is tiny.
    per_supp = rows.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late")
    )
    profile = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
    )
    late_rows = rows.filter(F.col("is_late") == 1).select(
        F.col("l_orderkey").alias("lk"), "l_suppkey"
    )
    return (
        late_rows.join(
            profile,
            (F.col("lk") == profile.l_orderkey)
            & (profile.n_supp > 1)
            & (profile.n_late_supp == 1),
            "inner",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + scalar threshold)
# ---------------------------------------------------------------------------

@_q(
    "q_tpch_q22",
    oracle=f"""
    WITH candidates AS (
      SELECT substr(c_name, -1) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE substr(c_name, -1) IN ('1', '3', '5', '7', '9')
    )
    SELECT cntrycode, count(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM candidates c
    WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               / count(c_acctbal)
        FROM candidates WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the country code
    is the last digit of ``c_name`` (no ``c_phone`` column). Customers
    in the code set, above the positive-balance average, with no
    orders since 2000 (the original's "no orders in 7 years" lapse
    test) — the NOT EXISTS is a left-anti join on custkey, the
    average an exact-decimal scalar broadcast. The anti join's probe
    side is the already-thinned candidate set, so the big orders scan
    reduces to its distinct custkeys."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring(F.col("c_name"), -1, 1)
    ).filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    o = (
        spread(_t(spark, sf_dir, "orders"))
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntrycode")
    )
