"""foreachBatch sinks: multi-destination, idempotent-per-batch writes.

The reference's only "transaction" is the Keycloak session tx buffering
events until commit (``FirehoseEventStoreProvider.java:49,63`` — ref
S3), after which delivery is fire-and-forget. Structured Streaming's
``foreachBatch`` is the principled version: the micro-batch is the
commit unit, the checkpoint records which batch ids committed, and the
sink writes keyed by batch id so a replayed batch overwrites itself
instead of duplicating — exactly-once to any sink that can overwrite a
batch-scoped location, and fan-out to several sinks in one pass over
the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partitioned_batch_sink(root: str):
    """Sink fn for ``foreachBatch``: lands each micro-batch under
    ``root/batch_id=N`` with overwrite — replays of batch N (after a
    failure before the checkpoint commit) rewrite the same location, so
    downstream never sees duplicates."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{root}/batch_id={batch_id}")

    return sink


def fan_out(*sinks):
    """Compose several foreachBatch sinks; the batch DataFrame is
    persisted once so N sinks do not recompute the micro-batch N times."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for s in sinks:
                s(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return sink
