"""Exact-arithmetic helpers for oracle-comparable aggregates.

Summing IEEE doubles is order-dependent; Spark's partial aggregation
order differs from DuckDB's, so ``sum(double)`` can differ in the last
ulps and break value-hash comparison. The fix — which is also the right
call at 100 TB, where double sums drift much further — is to aggregate
in DECIMAL (exact, associative, order-independent) and cast back to
double only at the output boundary. Per-row double arithmetic
(``a * (1 - b)``) is IEEE-deterministic and identical across engines, so
only the *aggregation* needs the decimal detour.

The reference itself never aggregates (SURVEY.md §2.2) — this discipline
is for the engine surface we add on top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 27 integer+fraction digits, 6 fraction digits: enough for 1e9 rows of
# 1e12-scale values; Spark widens the sum type to decimal(37,6) itself.
DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / count({expr}) AS {alias}"
    )
