"""Reference-faithful Keycloak event-store surface, Spark-first.

A user of the reference (xgp/keycloak-event-stream) gets the same
capabilities here with a Spark-native store:

========================  =============================================
reference                 this module
========================  =============================================
Glue user-events table    ``USER_EVENT_SCHEMA`` (terraform/main.tf:113-167)
Glue admin-events table   ``ADMIN_EVENT_SCHEMA`` (terraform/main.tf:258-332)
FlatEvent.java:10-41      :func:`flatten_user_events` (S4, S6)
FlatAdminEvent.java:11-85 :func:`flatten_admin_events` (S5)
Firehose put + buffering  :meth:`KeycloakEventStore.ingest` /
  (S8, S9, S10)           :meth:`ingest_stream` — partitioned parquet,
                          exactly-once vs the reference's at-most-once
                          (FirehoseEventStoreProvider.java:147-149)
createQuery()             :meth:`KeycloakEventStore.create_query`
  (AthenaEventQuery)      (F1-F7 via plans.event_query)
createAdminQuery()        :meth:`create_admin_query` — all 9 filter
  (AthenaAdminEventQuery) dimensions (AthenaAdminEventQuery.java:186-240)
varchar decode (F10-F12)  :func:`decoded_user_events` /
                          :func:`decoded_admin_events` — blank≡null,
                          details map view, AuthDetails recomposition
clear*() no-ops (X1)      :meth:`clear` etc. — deliberate no-ops
========================  =============================================

Deliberate divergences from observed reference behavior (SURVEY §1.4):
Q1 — we write ``eventtype`` end-to-end (the reference's producer emits
``"type"`` against a Glue column named ``eventtype``, landing NULLs);
Q2 — pagination is skip-then-take, not the reference's swapped
LIMIT/OFFSET emission; Q3/Q4 — ``dt``/``hour`` come from *event* time
and time-range queries prune them (with a lateness allowance).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from keycloak_event_stream_spark.plans.event_query import (
    AdminEventQueryBuilder,
    EventQueryBuilder,
    UserEventQueryBuilder,
)

# ---------------------------------------------------------------------------
# Schemas (declared, never inferred — terraform/main.tf:78-178,224-343)
# ---------------------------------------------------------------------------

_DETAILS = T.MapType(T.StringType(), T.StringType())

USER_EVENT_COLUMNS = [
    "id", "eventtype", "realmid", "realmname", "clientid", "userid",
    "sessionid", "ipaddress", "error", "time", "detailsjson",
]

ADMIN_EVENT_COLUMNS = [
    "id", "time", "realmid", "realmname", "operationtype", "resourcetype",
    "resourcepath", "representation", "error", "authrealmid",
    "authrealmname", "authclientid", "authuserid", "authipaddress",
    "detailsjson",
]

USER_EVENT_SCHEMA = T.StructType(
    [T.StructField(c, T.LongType() if c == "time" else T.StringType())
     for c in USER_EVENT_COLUMNS]
)

ADMIN_EVENT_SCHEMA = T.StructType(
    [T.StructField(c, T.LongType() if c == "time" else T.StringType())
     for c in ADMIN_EVENT_COLUMNS]
)

# Raw (pre-flatten) shapes mirroring the Keycloak POJOs the reference
# consumes (org.keycloak.events.Event / admin.AdminEvent).
RAW_USER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),          # enum name
        T.StructField("realmId", T.StringType()),
        T.StructField("realmName", T.StringType()),
        T.StructField("clientId", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("sessionId", T.StringType()),
        T.StructField("ipAddress", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("time", T.LongType()),            # epoch millis
        T.StructField("details", _DETAILS),
    ]
)

RAW_ADMIN_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("realmId", T.StringType()),
        T.StructField("realmName", T.StringType()),
        T.StructField("operationType", T.StringType()),  # enum name
        T.StructField("resourceType", T.StringType()),   # enum name or raw
        T.StructField("resourcePath", T.StringType()),
        T.StructField("representation", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField(
            "authDetails",
            T.StructType(
                [
                    T.StructField("realmId", T.StringType()),
                    T.StructField("realmName", T.StringType()),
                    T.StructField("clientId", T.StringType()),
                    T.StructField("userId", T.StringType()),
                    T.StructField("ipAddress", T.StringType()),
                ]
            ),
        ),
        T.StructField("details", _DETAILS),
    ]
)


# ---------------------------------------------------------------------------
# Flatten (write path: S4, S5, S6)
# ---------------------------------------------------------------------------

def flatten_user_events(raw: DataFrame) -> DataFrame:
    """``Event`` -> flat row (FlatEvent.java:43-55): enum name passes
    through as string, details map -> JSON string (FlatEvents.java:9-18,
    null map -> null string, not '{}'). Writes ``eventtype`` (Q1 fix)."""
    return raw.select(
        F.col("id"),
        F.col("type").alias("eventtype"),
        F.col("realmId").alias("realmid"),
        F.col("realmName").alias("realmname"),
        F.col("clientId").alias("clientid"),
        F.col("userId").alias("userid"),
        F.col("sessionId").alias("sessionid"),
        F.col("ipAddress").alias("ipaddress"),
        F.col("error"),
        F.col("time"),
        F.to_json(F.col("details")).alias("detailsjson"),
    )


def flatten_admin_events(raw: DataFrame) -> DataFrame:
    """``AdminEvent`` -> flat row (FlatAdminEvent.java:56-85): the
    AuthDetails struct flattens to five prefixed columns, all null when
    the struct itself is null (FlatAdminEvent.java:69-82)."""
    return raw.select(
        F.col("id"),
        F.col("time"),
        F.col("realmId").alias("realmid"),
        F.col("realmName").alias("realmname"),
        F.col("operationType").alias("operationtype"),
        F.col("resourceType").alias("resourcetype"),
        F.col("resourcePath").alias("resourcepath"),
        F.col("representation"),
        F.col("error"),
        F.col("authDetails.realmId").alias("authrealmid"),
        F.col("authDetails.realmName").alias("authrealmname"),
        F.col("authDetails.clientId").alias("authclientid"),
        F.col("authDetails.userId").alias("authuserid"),
        F.col("authDetails.ipAddress").alias("authipaddress"),
        F.to_json(F.col("details")).alias("detailsjson"),
    )


def _with_event_time_partitions(flat: DataFrame) -> DataFrame:
    """Derive dt/hour from EVENT time (epoch millis) — not arrival time
    (fixes SURVEY §1.4 Q4; the reference lands by Firehose arrival,
    terraform/main.tf:194)."""
    ts = F.timestamp_millis(F.col("time"))
    return flat.withColumn("dt", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "hour", F.hour(ts)
    )


# ---------------------------------------------------------------------------
# Decode boundary (read path: F10, F11, F12, S7)
# ---------------------------------------------------------------------------

def blank_as_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Empty/blank string -> null on every string column — the decode
    convention the reference applies to each Athena varchar cell
    (AthenaEventQuery.java:246-255, AthenaAdminEventQuery.java:317-326)."""
    cols = columns or [f.name for f in df.schema.fields
                       if isinstance(f.dataType, T.StringType)]
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.trim(F.col(c)) == "", F.lit(None)).otherwise(F.col(c))
        )
    return out


def decoded_user_events(
    df: DataFrame,
    valid_event_types: frozenset[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Typed read view of the flat user-events table: blank≡null (F12),
    ``details`` map recomposed from JSON (S7), ``ts`` timestamp from
    epoch millis. ``valid_event_types`` mirrors the strict
    ``EventType.valueOf`` decode (AthenaEventQuery.java:213-219): rows
    with unknown types get ``eventtype_valid = false`` — a filterable
    CHECK — or, with ``strict=True``, raise at execution exactly like
    the reference's per-row ``IllegalArgumentException``."""
    out = blank_as_null(df, [c for c in USER_EVENT_COLUMNS if c != "time"])
    out = out.withColumn("details", F.from_json("detailsjson", _DETAILS))
    out = out.withColumn("ts", F.timestamp_millis(F.col("time")))
    if valid_event_types is not None:
        valid = F.col("eventtype").isin(sorted(valid_event_types)) | F.col(
            "eventtype"
        ).isNull()
        if strict:
            out = out.withColumn(
                "eventtype",
                F.when(valid, F.col("eventtype")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("unknown event type: "), F.col("eventtype")
                        )
                    )
                ),
            )
        else:
            out = out.withColumn("eventtype_valid", valid)
    return out


def decoded_admin_events(df: DataFrame) -> DataFrame:
    """Typed read view of the flat admin-events table: blank≡null, map
    view, and ``authdetails`` struct recomposed IFF any of the five
    columns is non-null (AthenaAdminEventQuery.java:290-307). Unknown
    resourcetype strings pass through unchanged — the reference's
    ``setResourceTypeAsString`` fallback (:276-284) is the no-op here."""
    out = blank_as_null(df, [c for c in ADMIN_EVENT_COLUMNS if c != "time"])
    auth_cols = ["authrealmid", "authrealmname", "authclientid",
                 "authuserid", "authipaddress"]
    any_set = None
    for c in auth_cols:
        cond = F.col(c).isNotNull()
        any_set = cond if any_set is None else (any_set | cond)
    auth = F.when(
        any_set,
        F.struct(
            F.col("authrealmid").alias("realmid"),
            F.col("authrealmname").alias("realmname"),
            F.col("authclientid").alias("clientid"),
            F.col("authuserid").alias("userid"),
            F.col("authipaddress").alias("ipaddress"),
        ),
    )  # else null struct
    out = out.withColumn("authdetails", auth)
    out = out.withColumn("details", F.from_json("detailsjson", _DETAILS))
    out = out.withColumn("ts", F.timestamp_millis(F.col("time")))
    return out


# ---------------------------------------------------------------------------
# The store (provider lifecycle: FirehoseEventStoreProvider.java)
# ---------------------------------------------------------------------------

class KeycloakEventStore:
    """Spark-native replacement for the reference's provider: same
    observable surface (ingest events, fluent queries, no-op deletes),
    parquet + dt/hour partitioning underneath.

    At 100 TB this is a catalog table; here it's a path. Everything else
    — partition pruning, pushdown, exactly-once ingest — is identical
    code either way.
    """

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self._user_path = f"{self.root}/user-events"
        self._admin_path = f"{self.root}/admin-events"

    # -- write path -----------------------------------------------------
    #: Allowed partition grains, finest first. The layout is always a
    #: PREFIX of the full dt/hour scheme so a coarser-grain write stays
    #: readable (and prunable on dt) alongside full-grain data; hour
    #: simply remains a data column instead of a directory level.
    GRAINS = (("dt", "hour"), ("dt",), ())

    @staticmethod
    def _layout(flat: DataFrame, grain: tuple[str, ...] = ("dt", "hour")) -> DataFrame:
        """Small-files + pruning discipline: co-locate each partition
        dir's rows into one task (one output file per partition per
        batch instead of tasks x partitions), sorted by event time so
        parquet row-group min/max statistics prune time-range scans
        inside the dir. An empty grain (unpartitioned bounded replay)
        skips the co-location shuffle — there is exactly one dir."""
        if not grain:
            return flat.sortWithinPartitions("time")
        return flat.repartition(*grain).sortWithinPartitions("time")

    def ingest(self, raw_events: DataFrame) -> None:
        """Batch ingest of raw user events (the tx-commit flush,
        FirehoseEventStoreProvider.java:123-129, minus the per-event
        HTTPS put — one partitioned parquet append per batch)."""
        flat = _with_event_time_partitions(flatten_user_events(raw_events))
        self._layout(flat).write.partitionBy("dt", "hour").mode("append").parquet(
            self._user_path
        )

    def ingest_admin(self, raw_admin_events: DataFrame) -> None:
        flat = _with_event_time_partitions(flatten_admin_events(raw_admin_events))
        self._layout(flat).write.partitionBy("dt", "hour").mode("append").parquet(
            self._admin_path
        )

    def ingest_stream(
        self,
        raw_stream: DataFrame,
        checkpoint: str,
        admin: bool = False,
        grain: tuple[str, ...] = ("dt", "hour"),
    ):
        """Streaming ingest (the Firehose leg done right): checkpointed
        partitioned parquet sink = exactly-once; the reference logs and
        drops failures (at-most-once,
        FirehoseEventStoreProvider.java:147-149).

        ``grain`` is the partition-dir granularity — one of ``GRAINS``,
        default the production dt/hour layout (terraform/main.tf:194).
        A BOUNDED replay whose fixture would smear a handful of rows
        across hundreds of hour dirs passes a coarser grain (the
        small-files problem inverted: grain must follow data volume —
        streaming/queries.py::_replay_grain derives it from footer
        metadata). Production callers never pass it."""
        self._check_grain(grain)
        flatten = flatten_admin_events if admin else flatten_user_events
        path = self._admin_path if admin else self._user_path
        flat = _with_event_time_partitions(flatten(raw_stream))
        writer = (
            flat.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
        )
        if grain:
            writer = writer.partitionBy(*grain)
        return writer.trigger(availableNow=True).start()

    @classmethod
    def _check_grain(cls, grain: tuple[str, ...]) -> None:
        if tuple(grain) not in cls.GRAINS:
            raise ValueError(
                f"grain {grain!r} is not a dt/hour prefix {cls.GRAINS}"
            )

    def ingest_stream_json(
        self,
        json_stream: DataFrame,
        checkpoint: str,
        admin: bool = False,
        delivery: str = "exactly_once",
        trigger: dict | None = None,
        grain: tuple[str, ...] = ("dt", "hour"),
    ):
        """Streaming ingest from raw JSON lines with a bad-record
        quarantine — the full Firehose delivery story end-to-end.

        ``json_stream`` is a one-column stream of JSON strings
        (``value``), the shape a Kafka value / file-drop / socket
        source produces and exactly what the reference puts on the
        wire (``send()``, FirehoseEventStoreProvider.java:141-150:
        one JSON record per event). Per micro-batch:

        - rows that parse against the declared event schema flatten and
          land partitioned by event-time dt/hour, same as ``ingest``;
        - rows that do NOT parse land untouched under
          ``errors/dt=<arrival-date>/hour=<arrival-hour>/processing-failed/``
          with the batch id — mirroring the delivery stream's
          ``error_output_prefix`` layout (terraform/main.tf:195), where
          failed records keep their raw payload for replay. Arrival
          time is correct here: a record that cannot be parsed has no
          trustworthy event time.

        ``delivery`` selects the reference-fidelity failure mode:

        - ``"exactly_once"`` (default): a batch failure fails the query
          and replays from the checkpoint — the engine's upgrade.
        - ``"at_most_once"``: failures are logged and the batch is
          dropped, the reference's literal contract
          (FirehoseEventStoreProvider.java:147-149 logs
          "Error sending to firehose" and moves on).

        ``grain`` — partition-dir granularity for the GOOD-record
        table, see :meth:`ingest_stream`. The quarantine keeps its
        arrival dt/hour layout regardless (it is written per failing
        batch — a couple of rows — never the volume path).
        """
        if delivery not in ("exactly_once", "at_most_once"):
            raise ValueError(f"unknown delivery mode {delivery!r}")
        self._check_grain(grain)
        flatten = flatten_admin_events if admin else flatten_user_events
        path = self._admin_path if admin else self._user_path
        schema = RAW_ADMIN_EVENT_SCHEMA if admin else RAW_USER_EVENT_SCHEMA
        quarantine = f"{self.root}/errors"
        layout = self._layout

        # PERMISSIVE + _corrupt_record: lenient partial parses (e.g.
        # Jackson accepting unquoted keys) must still be quarantined,
        # not land as all-null rows — same discipline as formats.py's
        # q_source_corrupt_tolerant
        schema_c = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )

        def _process(batch: DataFrame, batch_id: int) -> None:
            parsed = batch.withColumn(
                "_e",
                F.from_json(
                    "value",
                    schema_c,
                    {
                        "mode": "PERMISSIVE",
                        "columnNameOfCorruptRecord": "_corrupt_record",
                    },
                ),
            )
            is_bad = F.col("_e").isNull() | F.col(
                "_e._corrupt_record"
            ).isNotNull()
            bad = parsed.filter(
                is_bad & F.col("value").isNotNull()
            ).select(
                F.col("value").alias("raw"),
                F.lit(batch_id).alias("batch_id"),
                F.date_format(F.current_timestamp(), "yyyy-MM-dd").alias("dt"),
                F.hour(F.current_timestamp()).alias("hour"),
                F.lit("processing-failed").alias("error_type"),
            )
            bad.write.mode("append").partitionBy(
                "dt", "hour", "error_type"
            ).json(quarantine)
            good = (
                parsed.filter(~is_bad)
                .select("_e.*")
                .drop("_corrupt_record")
            )
            flat = _with_event_time_partitions(flatten(good))
            writer = layout(flat, grain).write
            if grain:
                writer = writer.partitionBy(*grain)
            writer.mode("append").parquet(path)

        def _process_at_most_once(batch: DataFrame, batch_id: int) -> None:
            try:
                _process(batch, batch_id)
            except Exception as exc:  # log and drop, per the reference
                import logging

                logging.getLogger(__name__).warning(
                    "dropping batch %s: %s", batch_id, exc
                )

        fn = _process_at_most_once if delivery == "at_most_once" else _process
        # availableNow drains bounded replays (file drops) and stops;
        # unbounded push sources (socket, rate, Kafka) pass e.g.
        # trigger={"processingTime": "1 second"} — the socket leg is the
        # closest analogue of the reference's live network push
        # (FirehoseEventStoreProvider.java:144-146).
        return (
            json_stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def quarantined(self) -> DataFrame:
        """Read back the error prefix (raw payload + batch id) — the
        replay surface for failed records."""
        return self.spark.read.json(f"{self.root}/errors")

    # -- read path ------------------------------------------------------
    @staticmethod
    def _partitioned(schema: T.StructType) -> T.StructType:
        return T.StructType(
            list(schema.fields)
            + [T.StructField("dt", T.StringType()),
               T.StructField("hour", T.IntegerType())]
        )

    def user_events(self) -> DataFrame:
        return self.spark.read.schema(
            self._partitioned(USER_EVENT_SCHEMA)
        ).parquet(self._user_path)

    def admin_events(self) -> DataFrame:
        return self.spark.read.schema(
            self._partitioned(ADMIN_EVENT_SCHEMA)
        ).parquet(self._admin_path)

    def create_query(self) -> UserEventQueryBuilder:
        """Fluent user-event query (createQuery(),
        FirehoseEventStoreProvider.java:79-88): the reference's NAMED
        setters (type/realm/client/user/ip_address/from_date/to_date —
        AthenaEventQuery.java:46-104) plus the generic
        ``where_eq``/``where_in`` surface, inclusive time range, DESC
        default, offset/limit."""
        return UserEventQueryBuilder(
            self.user_events(),
            time_col="time",
            type_col="eventtype",
            id_col="id",
            time_is_millis=True,
            dt_col="dt",
            hour_col="hour",
        )

    def create_admin_query(self) -> AdminEventQueryBuilder:
        """Fluent admin-event query (createAdminQuery(),
        FirehoseEventStoreProvider.java:91-100): the nine filter
        dimensions of AthenaAdminEventQuery.java:186-240 through the
        reference's NAMED setters (realm/auth_realm/auth_client/
        auth_user/auth_ip_address/operation/resource_type/
        resource_path), each delegating to the generic
        ``where_eq``/``where_in`` builder, plus time range / order /
        pagination."""
        return AdminEventQueryBuilder(
            self.admin_events(),
            time_col="time",
            type_col="operationtype",
            id_col="id",
            time_is_millis=True,
            dt_col="dt",
            hour_col="hour",
        )

    # -- deletes: deliberate no-ops (X1) --------------------------------
    def clear(self, realm_id: str | None = None, older_than: int | None = None) -> None:
        """No-op (FirehoseEventStoreProvider.java:102-121): the store is
        append-only; retention = partition drop, never row deletes."""

    def clear_expired_events(self) -> None:
        """No-op (X1)."""

    def clear_admin(self, realm_id: str | None = None, older_than: int | None = None) -> None:
        """No-op (X1)."""


def millis(ts: str) -> int:
    """Epoch-millis helper for tests/examples ('YYYY-MM-DD HH:MM:SS')."""
    return int(
        _dt.datetime.fromisoformat(ts).replace(tzinfo=_dt.timezone.utc).timestamp()
        * 1000
    )
