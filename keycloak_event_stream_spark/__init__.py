"""keycloak_event_stream_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference implementation (xgp/keycloak-event-stream:
a Keycloak EventStoreProvider that lands events on S3 Parquet via
Firehose and queries them through Athena), built Spark-first:

- the reference's write path (flatten -> partitioned Parquet,
  ``FirehoseEventStoreProvider.java:123-150`` + ``terraform/main.tf:181-222``)
  becomes Structured Streaming -> partitioned Parquet sink (exactly-once);
- the reference's read path (fluent query builder -> SQL -> Athena,
  ``AthenaEventQuery.java:130-255``) becomes a fluent builder compiling to
  a lazy DataFrame logical plan optimized by Catalyst;
- beyond the reference surface: batch relational operators (joins, aggs,
  windows, set ops, scalar function families) and LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal columns),
  all designed for 100 TB scale (partition pruning, broadcast joins, AQE).
"""

from keycloak_event_stream_spark.session import get_spark
from keycloak_event_stream_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
