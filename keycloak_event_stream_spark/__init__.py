"""keycloak_event_stream_spark — a PySpark-native analytics engine with
the capabilities of the xgp/keycloak-event-stream reference, extended
with large-scale training-data-pipeline operators.

Public surface:

- :func:`keycloak_event_stream_spark.session.get_spark` — configured
  SparkSession factory (AQE, broadcast thresholds, UTC, Arrow).
- :class:`keycloak_event_stream_spark.sources.keycloak.KeycloakEventStore`
  — the reference-compatible event store (ingest + fluent queries).
- :class:`keycloak_event_stream_spark.plans.event_query.EventQueryBuilder`
  — the fluent query layer.
- :func:`keycloak_event_stream_spark.registry.collect` — every named
  operator with its DuckDB oracle twin (the driver contract).
"""

from keycloak_event_stream_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]
