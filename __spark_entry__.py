"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's canonical read-path
shape, ``AthenaEventQuery.java:136-159``) on sf0.001.
``queries()`` / ``oracle_sql()`` — merged registry of every implemented
operator from SURVEY.md §2.3 with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical event query — IN-list filter +
    inclusive time range + ORDER BY time DESC + offset/limit pagination
    (`AthenaEventQuery.buildSql`, F1-F7) — via the fluent builder."""
    from keycloak_event_stream_spark.catalog import load_table
    from keycloak_event_stream_spark.plans.event_query import EventQueryBuilder

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        EventQueryBuilder(events)
        .types("click", "purchase", "signup")
        .from_time("2024-01-05 00:00:00")
        .to_time("2024-01-25 23:59:59")
        .order_by_descending()
        .first_result(10)
        .max_results(200)
        .to_df()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from keycloak_event_stream_spark.registry import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    from keycloak_event_stream_spark.registry import collect

    return collect()[1]
