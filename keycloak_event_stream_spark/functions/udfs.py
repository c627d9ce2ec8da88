"""UDF surface demonstrations (SURVEY.md §2.3: Python UDF, vectorized
pandas_udf, applyInPandas UDAF-shape; the mapInPandas UDTF-shape lives
in :mod:`keycloak_event_stream_spark.llm.multimodal`).

The engine's rule is UDFs-as-last-resort — every hot path elsewhere is
JVM-side. These entries exist to pin the API surface and its Arrow
plumbing with oracle-checked results:

- plain ``@udf`` is the row-at-a-time slow path (one Python call per
  row, pickled rows) — demonstrated on purpose with a trivial function
  and documented as the thing to avoid;
- ``pandas_udf`` processes Arrow record batches with numpy — the
  acceptable Python path (~10-100x the plain UDF);
- ``applyInPandas`` is the custom-aggregation (UDAF) shape: one pandas
  DataFrame per group, one shuffle on the group key.

Determinism notes: the pandas_udf norm reduces 64-element float64 rows
with numpy's sequential (sub-pairwise-threshold) summation — the same
left-to-right fold DuckDB's list_dot_product uses, so values match
bitwise. The UDAF medians run on int64 event ids, where the midpoint
average is exact in float64 in both engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from keycloak_event_stream_spark.catalog import load_table, spread

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
# Plain Python UDF (row-at-a-time — the documented slow path)
# ---------------------------------------------------------------------------

@F.udf(returnType=T.StringType())
def _reverse_udf(s):
    return s[::-1] if s is not None else None


@_q(
    "q_udf_python",
    oracle="""
    SELECT p_partkey, reverse(p_name) AS name_rev
    FROM part WHERE p_size <= 10
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (string reverse). Each row crosses the
    JVM<->Python boundary individually — never acceptable on a hot path
    (use F.reverse / a pandas_udf); kept to pin the API."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select("p_partkey", _reverse_udf("p_name").alias("name_rev"))


# ---------------------------------------------------------------------------
# Vectorized pandas_udf (Arrow batches + numpy)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.DoubleType())
def _l2_norm_udf(vecs: pd.Series) -> pd.Series:
    import numpy as np

    mat = np.stack(vecs.to_numpy())  # (batch, dim) float64
    # accumulate dim-by-dim (vectorized across the batch): a strict
    # left-to-right fold per row, bit-identical to a sequential dot
    # product — numpy's axis-sum may reorder (SIMD/pairwise) and drift
    # in the last ulp
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return pd.Series(np.sqrt(acc))


@_q(
    "q_udf_pandas_norm",
    oracle="""
    SELECT vec_id, label,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS l2
    FROM embeddings
    """,
)
def q_udf_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized L2 norm over the embedding column: whole Arrow batches
    into numpy, one matmul-shaped reduction per batch. This is the Python
    path worth taking when JVM expressions run out."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return e.select(
        "vec_id",
        "label",
        _l2_norm_udf(F.col("embedding").cast("array<double>")).alias("l2"),
    )


# ---------------------------------------------------------------------------
# applyInPandas (UDAF shape: one pandas frame per group)
# ---------------------------------------------------------------------------

_UDAF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("median_event_id", T.DoubleType()),
        T.StructField("min_event_id", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
    ]
)


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    ids = pdf["event_id"]
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(ids)],
            "median_event_id": [float(ids.median())],
            "min_event_id": [ids.min()],
            "max_event_id": [ids.max()],
        }
    )


@_q(
    "q_udaf_apply_in_pandas",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           median(event_id) AS median_event_id,
           min(event_id) AS min_event_id,
           max(event_id) AS max_event_id
    FROM events GROUP BY user_id
    """,
)
def q_udaf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation via applyInPandas: per-user order statistics
    computed in pandas. One shuffle on the group key, Arrow both ways.
    At 100 TB, group count (not size) must fit the executor — a group's
    whole frame materializes in pandas, so skewed keys need salting or a
    built-in-aggregate rewrite."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_id").groupBy("user_id").applyInPandas(
        _user_stats, _UDAF_SCHEMA
    )


# ---------------------------------------------------------------------------
# Spark 4 Arrow UDF (pyarrow arrays in/out — no pandas conversion)
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.functions import arrow_udf

    @arrow_udf(T.LongType())
    def _codepoints_udf(texts):
        import pyarrow.compute as pc

        return pc.cast(pc.utf8_length(texts), "int64")

    @arrow_udf(T.LongType())
    def _space_tokens_udf(texts):
        import pyarrow.compute as pc

        return pc.cast(
            pc.add(pc.count_substring(texts, " "), 1), "int64"
        )

    _HAVE_ARROW_UDF = True
except ImportError:  # pragma: no cover - older Spark
    _HAVE_ARROW_UDF = False


if _HAVE_ARROW_UDF:

    @_q(
        "q_udf_arrow",
        oracle="""
        SELECT doc_id,
               length(text) AS n_codepoints,
               length(text) - length(replace(text, ' ', '')) + 1
                 AS n_space_tokens
        FROM documents
        """,
    )
    def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spark 4 ``arrow_udf``: the UDF receives/returns *pyarrow
        arrays* directly — zero pandas materialization, so string
        columns stay in Arrow's contiguous UTF-8 buffers end-to-end and
        the kernel (``pyarrow.compute``) runs vectorized C++ over them.
        This sits between ``pandas_udf`` (extra Arrow→pandas copy, with
        object-dtype blowup for strings) and JVM expressions in the
        cost hierarchy; for string-heavy 100 TB document scans the
        avoided copy is the difference between CPU- and
        allocation-bound.

        Codepoint length and space-token counts are integer outputs of
        deterministic kernels — bitwise oracle parity for free.
        """
        d = spread(load_table(spark, sf_dir, "documents"))
        return d.select(
            "doc_id",
            _codepoints_udf(F.col("text")).alias("n_codepoints"),
            _space_tokens_udf(F.col("text")).alias("n_space_tokens"),
        )
