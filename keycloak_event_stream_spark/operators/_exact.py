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


# 2^32 — the split pivot for the portable big-integer -> double cast.
_SPLIT = 4_294_967_296


def dbig(c: Column) -> Column:
    """Engine-identical DECIMAL(38,0) -> DOUBLE for integer values that
    may exceed 2^53 (the sf0.1 moment-sum class: sums of squared cents
    reach ~1e19-1e23). A direct CAST drifts in the last ulp: DuckDB's
    int128 -> double conversion is not correctly rounded (measured on
    22240711483861231690: DuckDB ...7fe vs Spark's correctly rounded
    BigDecimal ...7ff). The portable form splits at 2^32:

        lo = c % 2^32          (remainder, sign of dividend — exact)
        hi = (c - lo) / 2^32   (exact multiple: decimal division exact)
        d  = hi * 2^32 + lo    (in double)

    hi and lo each convert to double EXACTLY (|hi| < 2^53 for
    |c| < 2^85, |lo| < 2^32), the power-of-two scaling is exact, and
    the single terminal add rounds identically under IEEE in both
    engines. Pair with :func:`sql_dbig` on the oracle side; divide by
    the 10^s unit scale once in double afterwards (also identical)."""
    lo = c % F.lit(_SPLIT)
    hi = ((c - lo) / F.lit(_SPLIT)).cast("decimal(38,0)")
    return hi.cast("double") * F.lit(float(_SPLIT)) + lo.cast("double")


def sql_dbig(expr: str) -> str:
    """DuckDB twin of :func:`dbig`. MUST route through HUGEINT — on
    DECIMAL operands DuckDB's `//` divides in double (measured: a
    fractional quotient), silently reintroducing the drift."""
    return (
        f"(CAST(CAST({expr} AS HUGEINT) // {_SPLIT} AS DOUBLE)"
        f" * {float(_SPLIT)}"
        f" + CAST(CAST({expr} AS HUGEINT) % {_SPLIT} AS DOUBLE))"
    )
