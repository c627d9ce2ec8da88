"""Streaming near-duplicate filter: MinHash-LSH against an
accumulating signature store.

Built-in streaming dedup (``dropDuplicates`` / ...WithinWatermark) is
*exact-key only* (SURVEY §2.3 s_stream_dedup). A training-data intake
stream needs the fuzzier contract — "drop documents near-identical to
anything already admitted" — which no built-in stateful operator
expresses. This is the ``foreachBatch`` realization:

per micro-batch
  1. band-key the batch (``llm.dedup.band_keys`` — the same B×R
     string-minhash family as the batch operator, bytes per doc);
  2. drop docs colliding with the persisted signature store on any
     (band, key) — one broadcast-able left-semi lookup;
  3. dedup *within* the batch (keep the lowest doc_id per collision,
     transitively — first-writer-wins, deterministic);
  4. write survivors to the admitted sink and their signatures to the
     store as a *dynamic overwrite of the batch's own partition*
     (``_batch_id=<id>``), with the store lookup in step 2 excluding
     this batch's own partition. A replayed batch therefore recomputes
     the identical admit set from the identical prior-batch store and
     overwrites its own partition — exactly-once under foreachBatch's
     at-least-once delivery, with no duplicate and no lost document.
     (Plain appends would duplicate on replay if the sink append
     landed but the store append didn't; appending the store first
     would instead *drop* the batch's docs forever on replay.)

The LSH banding rule (collision = candidate = dropped) is the
*recall-biased* variant — the right default for corpus intake, where a
false drop costs one near-dup document and a false admit costs a
training-set contamination. The batch operator's exact-Jaccard confirm
can be spliced between steps 2 and 3 when precision matters more.

Scale: the store is (band, bkey) pairs — bytes per admitted doc; the
per-batch lookup is an equi join keyed by (band, bkey), broadcast
while the store is small, shuffle-partitioned (and ripe for bucketing
on bkey) once it is not. State lives in the store, not executor
memory, so it survives restarts with no checkpoint coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from keycloak_event_stream_spark.llm.dedup import band_keys


def _read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Read the signature store; None only when the path genuinely
    does not exist yet. Any other read error (corruption, transient
    IO) propagates — silently treating it as an empty store would
    mass-admit duplicates."""
    try:
        return spark.read.parquet(store_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    sink_path: str,
    batch_id: int,
) -> None:
    """Process one micro-batch of (doc_id, text): write only
    near-novel docs to ``sink_path``; grow the signature store.
    Idempotent per ``batch_id`` (replay-safe, see module docstring)."""
    bands = band_keys(batch_df).persist()
    store = _read_store(spark, store_path)
    if store is not None:
        # exclude this batch's own partition: a replayed attempt must
        # see exactly the store state its first attempt saw
        known = store.filter(F.col("_batch_id") != batch_id).select(
            "band", "bkey"
        )
        have_store = True
    else:
        have_store = False
    if have_store:
        hit = (
            bands.join(known, ["band", "bkey"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        fresh = batch_df.join(hit, "doc_id", "left_anti")
        fresh_bands = bands.join(hit, "doc_id", "left_anti")
    else:
        fresh = batch_df
        fresh_bands = bands
    # intra-batch: a doc is dropped if any of its band keys is shared
    # with a lower admitted doc_id. One aggregation to the bucket
    # minimum approximates the transitive first-writer-wins rule; the
    # iterated fixpoint (connected components, q_dedup_components) is
    # the batch-side escalation.
    bucket_min = fresh_bands.groupBy("band", "bkey").agg(
        F.min("doc_id").alias("min_doc")
    )
    dropped = (
        fresh_bands.join(bucket_min, ["band", "bkey"])
        .filter(F.col("doc_id") > F.col("min_doc"))
        .select("doc_id")
        .distinct()
    )
    admitted = fresh.join(dropped, "doc_id", "left_anti")
    admitted_bands = fresh_bands.join(dropped, "doc_id", "left_anti")
    (
        admitted.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(sink_path)
    )
    (
        admitted_bands.select("doc_id", "band", "bkey")
        .withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )
    bands.unpersist()


def streaming_near_dup_filter(
    docs_stream: DataFrame, store_path: str, sink_path: str
):
    """Attach the near-dup intake filter to a (doc_id, text) stream;
    returns a DataStreamWriter (caller sets checkpoint/trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        admit_batch(
            batch_df.sparkSession, batch_df, store_path, sink_path, batch_id
        )

    return docs_stream.writeStream.foreachBatch(process)
