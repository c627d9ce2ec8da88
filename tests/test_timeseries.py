"""Semantics tests for the time-series statistics operators
(operators/timeseries.py): EWMA, autocorrelation, CUSUM, Mann-Kendall."""

from __future__ import annotations

import math

from conftest import SF_DIR
from pyspark.sql import functions as F

from keycloak_event_stream_spark.catalog import load_table
from keycloak_event_stream_spark.operators.timeseries import (
    q_autocorr_lag1,
    q_cusum_changepoint,
    q_ewma,
    q_mann_kendall,
)


def _daily_cents(spark):
    orders = load_table(spark, SF_DIR, "orders")
    rows = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    return [r.cents for r in rows]


def test_ewma_matches_python_fold(spark):
    rows = {r.o_orderpriority: r for r in q_ewma(spark, SF_DIR).collect()}
    orders = load_table(spark, SF_DIR, "orders")
    prios = [
        r[0]
        for r in orders.select("o_orderpriority").distinct().collect()
    ]
    assert set(rows) == set(prios)
    # replicate one group's fold in plain Python (same IEEE op order)
    prio = sorted(prios)[0]
    daily = (
        orders.filter(F.col("o_orderpriority") == prio)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents")
        )
        .orderBy("day")
        .collect()
    )
    acc = 0.0
    for r in daily:
        acc = float(r.cents) * 0.2 + acc * 0.8
    got = rows[prio]
    assert got.n_days == len(daily)
    assert got.ewma_cents == acc  # bitwise: identical fold order


def test_autocorr_in_range_and_pairs(spark):
    row = q_autocorr_lag1(spark, SF_DIR).collect()[0]
    series = _daily_cents(spark)
    assert row.n_pairs == len(series) - 1
    assert -1.0 <= row.autocorr_lag1 <= 1.0
    # cross-check against a plain-Python Pearson on the lag pairs
    xs, ys = series[:-1], series[1:]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(row.autocorr_lag1 - r) < 1e-9


def test_cusum_matches_python_argmax(spark):
    row = q_cusum_changepoint(spark, SF_DIR).collect()[0]
    series = _daily_cents(spark)
    n, total = len(series), sum(series)
    best, best_t = -1, None
    cum = 0
    for t, x in enumerate(series, start=1):
        cum += x
        s = abs(n * cum - t * total)
        if s > best:
            best, best_t = s, t
    assert row.n_days == n
    assert row.s_abs == best
    assert row.cusum_cents == best / n


def test_mann_kendall_matches_python(spark):
    row = q_mann_kendall(spark, SF_DIR).collect()[0]
    orders = load_table(spark, SF_DIR, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
                "m"
            )
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents")
        )
        .orderBy("m")
        .collect()
    )
    xs = [r.cents for r in monthly]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert row.n_months == n
    assert row.s_stat == s
    # variance numerator: no ties expected on cents, but formula exact
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(xs).values()
        if t > 1
    )
    assert row.var_numer == n * (n - 1) * (2 * n + 5) - tie
    if s > 0:
        z = (s - 1.0) / math.sqrt(row.var_numer / 18.0)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(row.var_numer / 18.0)
    else:
        z = 0.0
    assert abs(row.z_stat - z) < 1e-12
