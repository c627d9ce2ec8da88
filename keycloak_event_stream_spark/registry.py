"""Merged query registry — the single source for the driver contract.

Each operator module contributes ``QUERIES`` (name -> (spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL). Modules are imported
defensively so a broken module degrades coverage instead of killing the
whole contract.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "keycloak_event_stream_spark.operators.relational",
    "keycloak_event_stream_spark.operators.relational_ext",
    "keycloak_event_stream_spark.operators.tpch",
    "keycloak_event_stream_spark.operators.scale_patterns",
    "keycloak_event_stream_spark.operators.graph",
    "keycloak_event_stream_spark.operators.advanced_sql",
    "keycloak_event_stream_spark.operators.insights",
    "keycloak_event_stream_spark.operators.stattests",
    "keycloak_event_stream_spark.operators.timeseries",
    "keycloak_event_stream_spark.operators.layout",
    "keycloak_event_stream_spark.operators.sketches",
    "keycloak_event_stream_spark.operators.analytics",
    "keycloak_event_stream_spark.operators.bi",
    "keycloak_event_stream_spark.operators.mleval",
    "keycloak_event_stream_spark.functions.scalar",
    "keycloak_event_stream_spark.functions.udfs",
    "keycloak_event_stream_spark.functions.variant",
    "keycloak_event_stream_spark.functions.funcmatrix",
    "keycloak_event_stream_spark.functions.udtf",
    "keycloak_event_stream_spark.plans.event_query",
    "keycloak_event_stream_spark.streaming.queries",
    "keycloak_event_stream_spark.sources.formats",
    "keycloak_event_stream_spark.sources.pushgen",
    "keycloak_event_stream_spark.sources.pysink",
    "keycloak_event_stream_spark.llm.dedup",
    "keycloak_event_stream_spark.llm.simsearch",
    "keycloak_event_stream_spark.llm.textstats",
    "keycloak_event_stream_spark.llm.multimodal",
    "keycloak_event_stream_spark.llm.sampling",
    "keycloak_event_stream_spark.llm.curation",
    "keycloak_event_stream_spark.llm.vectors",
]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # degrade, don't die
            import sys

            print(f"[registry] skipping {modname}: {exc}", file=sys.stderr)
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name} in {modname}")
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle
