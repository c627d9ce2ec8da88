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


def running_user_profile(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful profile operator to an event stream with
    columns (user_id long, ts timestamp, value double).

    The update function is a SELF-CONTAINED nested closure, not a
    module-level function: cloudpickle ships a closure by value, while
    a module-level function travels by reference and makes every
    Python worker ``import keycloak_event_stream_spark`` — which fails
    under a driver whose working directory / PYTHONPATH doesn't expose
    the repo (caught by the round-6 driver-window simulation run from
    a different cwd). A pure-JVM query never notices; this is the one
    windowed operator that ships Python to the workers, so it must not
    assume the package is importable there."""

    def _update_profile(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        """Fold this batch's rows for one user into the running profile."""
        import pandas as pd  # worker-side import; closure ships by value

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


# --- transformWithStateInPandas (Spark 4 stateful-processor API) -----

try:  # Spark >= 4.0, and protobuf present (the state-server protocol
    # between the JVM and the Python worker is protobuf-serialized, so
    # the runtime needs `google.protobuf` even though our code never
    # imports it directly)
    import google.protobuf  # noqa: F401

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark / no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

TYPE_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_distinct_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


class UserTypeProfileProcessor(StatefulProcessor):
    """Per-user profile with *typed, composable state variables* — the
    Spark 4 ``transformWithStateInPandas`` successor to the single
    opaque tuple of ``applyInPandasWithState`` (see
    :func:`running_user_profile` for the v1 API).

    Two state variables per user key:
    - a ``ValueState`` (n_events, last_us) for the scalar running
      profile;
    - a ``MapState`` event_type → count, incrementally maintained —
      a per-key sub-collection the old API could only fake by pickling
      a dict into a blob column (unmergeable, full rewrite per batch;
      MapState updates touch only the changed sub-keys in the state
      store — the property that matters when each user has thousands
      of sub-keys at 100 TB).

    Emits one row per user per micro-batch the user appears in: total
    events, distinct types seen, modal type (count desc, name asc —
    deterministic), last event time. The reference has no stateful
    surface at all (SURVEY.md §2.2).
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState(
            "totals", "n_events BIGINT, last_us BIGINT"
        )
        self._type_counts = handle.getMapState(
            "type_counts", "event_type STRING", "cnt BIGINT"
        )

    def handleInputRows(self, key, rows, timer_values):
        (user_id,) = key
        n, last_us = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last_us = max(last_us, int(batch_max.value // 1_000))
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._type_counts.getValue((etype,))
                    if self._type_counts.containsKey((etype,))
                    else (0,)
                )
                self._type_counts.updateValue((etype,), (prev[0] + int(cnt),))
        self._totals.update((n, last_us))
        counts = [
            (k[0], v[0]) for k, v in self._type_counts.iterator()
        ]
        counts.sort(key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_distinct_types": [len(counts)],
                "top_type": [counts[0][0] if counts else None],
                "last_ts": [pd.Timestamp(last_us * 1_000)],
            }
        )

    def close(self) -> None:
        pass


def running_user_type_profile(events_stream: DataFrame) -> DataFrame:
    """Attach the transformWithStateInPandas profile operator to an
    event stream with columns (user_id long, ts timestamp,
    event_type string)."""
    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and the"
            " google.protobuf package (its JVM<->Python state protocol"
            " is protobuf-serialized)"
        )
    return (
        events_stream.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTypeProfileProcessor(),
            outputStructType=TYPE_PROFILE_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


# UserTypeProfileProcessor is a module-level class handed to
# transformWithStateInPandas — cloudpickle would ship it by reference
# and require this package on every executor's sys.path (the round-7
# /tmp driver-sim failure class). The v1 operator above already ships
# a closure; this registration covers the class. See _shipping.
from keycloak_event_stream_spark._shipping import ship_module_by_value

ship_module_by_value(__name__)
