"""Semantics tests for the distributional-statistics suite
(operators/stattests.py)."""

from __future__ import annotations

import math

from conftest import SF_DIR
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table
from keycloak_event_stream_spark.operators.stattests import (
    q_chi_square,
    q_entropy_sources,
    q_gini,
    q_kl_divergence,
    q_ks_test,
)


def test_ks_matches_bruteforce(spark):
    r = q_ks_test(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.ks_d <= 1.0
    ev = load_table(spark, SF_DIR, "events")
    a = sorted(
        x.value for x in ev.filter("event_type = 'click'").collect()
    )
    b = sorted(x.value for x in ev.filter("event_type = 'view'").collect())
    assert (r.n_click, r.n_view) == (len(a), len(b))
    import bisect

    pts = sorted(set(a) | set(b))
    d = max(
        abs(
            bisect.bisect_right(a, x) * len(b)
            - bisect.bisect_right(b, x) * len(a)
        )
        for x in pts
    )
    assert r.d_numer == d
    assert abs(r.ks_d - d / (len(a) * len(b))) < 1e-15


def test_gini_bounds_and_bruteforce(spark):
    r = q_gini(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini < 1.0
    orders = load_table(spark, SF_DIR, "orders")
    cents = sorted(
        x.c
        for x in orders.groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            ).alias("c")
        )
        .collect()
    )
    n, tot = len(cents), sum(cents)
    s_iw = sum((i + 1) * x for i, x in enumerate(cents))
    want = 2.0 * s_iw / (n * tot) - (n + 1) / n
    assert abs(r.gini - want) < 1e-12
    assert r.n == n and r.total_cents == tot


def test_chi_square_nonnegative_and_df(spark):
    r = q_chi_square(spark, SF_DIR).collect()[0]
    assert r.chi2 >= 0.0
    # 5 event types x 2 segments
    assert r.n_cells == 10


def test_entropy_bounds(spark):
    rows = q_entropy_sources(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy_nats <= math.log(r.n_langs) + 1e-6


def test_kl_nonnegative(spark):
    rows = q_kl_divergence(spark, SF_DIR).collect()
    assert rows
    # Gibbs' inequality (up to the 6-dp rounding of each term)
    assert all(r.kl_nats >= -1e-5 for r in rows)


def test_linreg_matches_builtin(spark):
    from keycloak_event_stream_spark.operators.stattests import q_agg_linreg

    rows = q_agg_linreg(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    builtin = {
        r.l_returnflag: (r.s, r.i)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("regr_slope(l_extendedprice, l_quantity)").alias("s"),
            F.expr("regr_intercept(l_extendedprice, l_quantity)").alias("i"),
        )
        .collect()
    }
    for r in rows:
        s, i = builtin[r.l_returnflag]
        # slope is unit-invariant (cents cancel); intercept is in cents
        assert abs(r.slope - s) < 1e-6
        assert abs(r.intercept_cents / 100.0 - i) < 1e-3


def test_benford_shares_sum_to_one(spark):
    from keycloak_event_stream_spark.operators.stattests import q_benford

    rows = q_benford(spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, len(rows) + 1))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-12
    # Benford expectations are the exact law values
    for r in rows:
        assert abs(r.benford_p - math.log10(1 + 1 / r.digit)) < 1e-15
        assert abs(r.abs_dev - abs(r.observed_p - r.benford_p)) < 1e-15


def test_iqr_outliers_beyond_fences(spark):
    from keycloak_event_stream_spark.operators.stattests import (
        q_outlier_iqr,
    )

    rows = q_outlier_iqr(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    for r in rows:
        vals = sorted(
            x.value
            for x in ev.filter(F.col("event_type") == r.event_type).collect()
        )
        n = len(vals)
        # nearest-rank-above quartiles, same arithmetic
        q1 = vals[math.ceil((n + 1) / 4) - 1]
        q3 = vals[math.ceil(3 * (n + 1) / 4) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        want = [v for v in vals if v < lo or v > hi]
        assert r.n_outliers == len(want)
        assert r.min_outlier == min(want) and r.max_outlier == max(want)


def test_welch_ttest_against_scipy_formula(spark):
    from keycloak_event_stream_spark.operators.stattests import q_welch_ttest

    row = q_welch_ttest(spark, SF_DIR).collect()[0]
    cust = load_table(spark, SF_DIR, "customer")
    import statistics

    g = {
        seg: [
            int(round(r.c_acctbal * 100))
            for r in cust.filter(F.col("c_mktsegment") == seg).collect()
        ]
        for seg in ("BUILDING", "MACHINERY")
    }
    x1, x2 = g["BUILDING"], g["MACHINERY"]
    assert row.n1 == len(x1) and row.n2 == len(x2)
    m1, m2 = statistics.fmean(x1), statistics.fmean(x2)
    v1 = statistics.variance(x1)  # sample variance
    v2 = statistics.variance(x2)
    import math

    t = (m1 - m2) / math.sqrt(v1 / len(x1) + v2 / len(x2))
    assert abs(row.t_stat - t) < 1e-6
    df = (v1 / len(x1) + v2 / len(x2)) ** 2 / (
        (v1 / len(x1)) ** 2 / (len(x1) - 1)
        + (v2 / len(x2)) ** 2 / (len(x2) - 1)
    )
    assert abs(row.welch_df - df) / df < 1e-9


def test_kendall_tau_bounds_and_pair_count(spark):
    from keycloak_event_stream_spark.operators.stattests import q_kendall_tau

    row = q_kendall_tau(spark, SF_DIR).collect()[0]
    n_nations = (
        load_table(spark, SF_DIR, "customer")
        .select("c_nationkey").distinct().count()
    )
    assert row.n0 == n_nations * (n_nations - 1) // 2
    assert row.concordant + row.discordant <= row.n0
    assert -1.0 <= row.tau_b <= 1.0


def test_runs_test_counts_reconcile(spark):
    from keycloak_event_stream_spark.operators.stattests import q_runs_test

    row = q_runs_test(spark, SF_DIR).collect()[0]
    # runs bounded by labeled days; both sides non-empty on this data
    assert row.n_above > 0 and row.n_below > 0
    assert 1 <= row.n_runs <= row.n_above + row.n_below
    # lower-median split: below count >= above count (ties dropped)
    assert abs(row.n_above - row.n_below) <= max(row.n_above, row.n_below)
