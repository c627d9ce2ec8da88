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
  4. append survivors to the admitted sink and their signatures to the
     store — both plain parquet appends, idempotent enough for
     at-least-once foreachBatch because re-appending the same
     signatures only creates already-colliding keys (a replayed batch's
     docs collide with their own prior signatures and are dropped).

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

from keycloak_event_stream_spark.llm.dedup import band_keys


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    sink_path: str,
) -> None:
    """Process one micro-batch of (doc_id, text): append only
    near-novel docs to ``sink_path``; grow the signature store."""
    bands = band_keys(batch_df).persist()
    try:
        known = spark.read.parquet(store_path).select("band", "bkey")
        have_store = True
    except Exception:
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
    admitted.write.mode("append").parquet(sink_path)
    admitted_bands.select("doc_id", "band", "bkey").write.mode(
        "append"
    ).parquet(store_path)
    bands.unpersist()


def streaming_near_dup_filter(
    docs_stream: DataFrame, store_path: str, sink_path: str
):
    """Attach the near-dup intake filter to a (doc_id, text) stream;
    returns a DataStreamWriter (caller sets checkpoint/trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        admit_batch(
            batch_df.sparkSession, batch_df, store_path, sink_path
        )

    return docs_stream.writeStream.foreachBatch(process)
