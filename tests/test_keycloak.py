"""Reference-fidelity layer: flatten, ingest, fluent queries, decode
boundary (SURVEY §2.1 S4-S10, F10-F12, X1)."""

from __future__ import annotations

import pytest

from keycloak_event_stream_spark.sources import keycloak as kc


@pytest.fixture(scope="module")
def raw_user_events(spark):
    rows = [
        ("e1", "LOGIN", "r1", "master", "c1", "u1", "s1", "1.2.3.4", None,
         kc.millis("2024-03-01 10:15:00"), {"k": "v", "q": "it's"}),
        ("e2", "LOGOUT", "r1", "master", "c1", "u2", "s2", "1.2.3.5", None,
         kc.millis("2024-03-01 11:45:00"), None),
        ("e3", "LOGIN_ERROR", "r2", "other", None, "u1", None, "1.2.3.4",
         "invalid_user_credentials", kc.millis("2024-03-02 09:00:00"), {}),
    ]
    return spark.createDataFrame(rows, kc.RAW_USER_EVENT_SCHEMA)


@pytest.fixture(scope="module")
def raw_admin_events(spark):
    rows = [
        ("a1", kc.millis("2024-03-01 10:00:00"), "r1", "master", "CREATE",
         "USER", "users/u9", '{"username":"u9"}', None,
         ("r1", "master", "admin-cli", "adm", "9.9.9.9"), {"d": "x"}),
        ("a2", kc.millis("2024-03-01 12:00:00"), "r1", "master", "DELETE",
         "CUSTOM_THING", "things/1", None, None, None, None),
    ]
    return spark.createDataFrame(rows, kc.RAW_ADMIN_EVENT_SCHEMA)


def test_flatten_user_writes_eventtype_not_type(raw_user_events):
    # Q1 fix: producer key is eventtype end-to-end (the reference emits
    # "type" against a Glue column named eventtype -> NULLs as-written)
    flat = kc.flatten_user_events(raw_user_events)
    assert flat.columns == kc.USER_EVENT_COLUMNS
    by_id = {r.id: r for r in flat.collect()}
    assert by_id["e1"].eventtype == "LOGIN"
    assert '"k":"v"' in by_id["e1"].detailsjson
    assert by_id["e2"].detailsjson is None  # null map -> null, not '{}'
    assert by_id["e3"].detailsjson == "{}"


def test_flatten_admin_null_authdetails_all_five_null(raw_admin_events):
    # FlatAdminEvent.java:69-82
    flat = kc.flatten_admin_events(raw_admin_events)
    assert flat.columns == kc.ADMIN_EVENT_COLUMNS
    by_id = {r.id: r for r in flat.collect()}
    a1, a2 = by_id["a1"], by_id["a2"]
    assert (a1.authrealmid, a1.authclientid, a1.authipaddress) == (
        "r1", "admin-cli", "9.9.9.9")
    assert all(
        getattr(a2, c) is None
        for c in ["authrealmid", "authrealmname", "authclientid",
                  "authuserid", "authipaddress"]
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory, raw_user_events, raw_admin_events):
    root = str(tmp_path_factory.mktemp("kcstore"))
    s = kc.KeycloakEventStore(spark, root)
    s.ingest(raw_user_events)
    s.ingest_admin(raw_admin_events)
    return s


def test_ingest_partitions_by_event_time(store):
    import os

    dts = os.listdir(f"{store.root}/user-events")
    assert "dt=2024-03-01" in dts and "dt=2024-03-02" in dts
    hours = os.listdir(f"{store.root}/user-events/dt=2024-03-01")
    assert set(hours) >= {"hour=10", "hour=11"}


def test_query_roundtrip_with_filters(store):
    got = (
        store.create_query()
        .types("LOGIN", "LOGIN_ERROR", "LOGIN")
        .where_eq("userid", "u1")
        .from_time("2024-03-01 00:00:00")
        .to_time("2024-03-02 23:59:59")
        .to_df()
        .collect()
    )
    assert [r.id for r in got] == ["e3", "e1"]  # DESC default order


def test_admin_query_nine_dimensions(store):
    q = (
        store.create_admin_query()
        .where_eq("realmid", "r1")
        .where_in("operationtype", "CREATE", "UPDATE", "CREATE")
        .where_in("resourcetype", "USER")
        .where_eq("authclientid", "admin-cli")
        .where_eq("resourcepath", "users/u9")
        .to_df()
    )
    got = q.collect()
    assert [r.id for r in got] == ["a1"]
    # IN dedup preserved insertion order (LinkedHashSet semantics)
    assert q is not None


def test_admin_query_named_fluent_surface(store):
    """The reference's NAMED AdminEventQuery setters
    (AthenaAdminEventQuery.java:51-100) as verbatim-portable methods
    delegating to the generic builder — same rows as the where_eq /
    where_in spelling in test_admin_query_nine_dimensions."""
    q = (
        store.create_admin_query()
        .realm("r1")
        .operation("CREATE", "UPDATE", "CREATE")  # varargs dedup
        .resource_type("USER")
        .auth_client("admin-cli")
        .auth_realm("r1")
        .auth_user("adm")
        .auth_ip_address("9.9.9.9")
        .resource_path("users/u9")
    )
    assert [r.id for r in q.to_df().collect()] == ["a1"]
    # LinkedHashSet insertion-order dedup pinned on the IN-lists
    assert q._in["operationtype"] == ["CREATE", "UPDATE"]
    # reference null semantics split by setter kind
    # (AthenaAdminEventQuery.java): varargs are null-guarded no-ops
    # (:81-95), scalar string setters are UNGUARDED assignments — null
    # on nothing-set stays unset...
    q2 = store.create_admin_query().realm(None).operation(None).resource_path(None)
    assert q2._eq == {} and q2._in.get("operationtype", []) == []
    assert q2.to_df().count() == 2
    # ...and null after a set CLEARS the filter (plain field overwrite,
    # :51-55 — r9 ADVICE: a None-no-op here silently diverged)
    q3 = store.create_admin_query().realm("r1").realm(None)
    assert q3._eq == {}
    assert q3.to_df().count() == 2
    q4 = store.create_admin_query().resource_path("users/u9").resource_path(None)
    assert q4._eq == {}


def test_user_query_named_fluent_surface(store):
    """The reference's NAMED EventQuery setters
    (AthenaEventQuery.java:46-104): type/realm/client/user/ip_address/
    from_date/to_date."""
    got = (
        store.create_query()
        .type("LOGIN", "LOGIN_ERROR", "LOGIN")
        .realm("r1")
        .client("c1")
        .user("u1")
        .ip_address("1.2.3.4")
        .from_date("2024-03-01 00:00:00")
        .to_date("2024-03-02 23:59:59")
        .to_df()
        .collect()
    )
    assert [r.id for r in got] == ["e1"]


def test_user_query_scalar_setters_clear_on_none(store):
    """The reference's scalar setters are unguarded assignments
    (AthenaEventQuery.java:53-69,99-103): null overwrites, clearing a
    previously-set filter. fromDate/toDate(Date) ARE null-guarded
    (:72-97), so None there keeps the bound."""
    q = (
        store.create_query()
        .realm("r1")
        .client("c1")
        .user("u1")
        .ip_address("1.2.3.4")
    )
    assert set(q._eq) == {"realmid", "clientid", "userid", "ipaddress"}
    q.client(None).ip_address(None)
    assert set(q._eq) == {"realmid", "userid"}
    # null-guarded pair: None is a no-op, the bound survives
    q.from_date("2024-03-01 00:00:00").from_date(None)
    assert q._from is not None
    q.to_date("2024-03-02 23:59:59").to_date(None)
    assert q._to is not None


def test_decoded_user_events_blank_null_and_map(store):
    df = kc.decoded_user_events(
        store.user_events(), valid_event_types=frozenset({"LOGIN", "LOGOUT"})
    )
    by_id = {r.id: r for r in df.collect()}
    assert by_id["e1"].details == {"k": "v", "q": "it's"}  # quote roundtrip
    assert by_id["e2"].details is None
    assert by_id["e1"].eventtype_valid is True
    assert by_id["e3"].eventtype_valid is False  # strict decode surfaced
    assert by_id["e1"].ts.year == 2024


def test_decoded_admin_recompose_iff_any_nonnull(store):
    df = kc.decoded_admin_events(store.admin_events())
    by_id = {r.id: r for r in df.collect()}
    assert by_id["a1"].authdetails.clientid == "admin-cli"
    assert by_id["a2"].authdetails is None  # all five null -> null struct
    # unknown resourcetype passes through (setResourceTypeAsString fallback)
    assert by_id["a2"].resourcetype == "CUSTOM_THING"


def test_blank_as_null_decode(spark):
    df = spark.createDataFrame([("", " ", "x")], "a string, b string, c string")
    got = kc.blank_as_null(df).collect()[0]
    assert got.a is None and got.b is None and got.c == "x"


def test_clears_are_noops(store):
    n = store.user_events().count()
    store.clear()
    store.clear("r1", 0)
    store.clear_expired_events()
    store.clear_admin()
    assert store.user_events().count() == n


def test_streaming_ingest_exactly_once(spark, tmp_path, raw_user_events):
    src = str(tmp_path / "raw")
    raw_user_events.coalesce(1).write.parquet(src)
    store = kc.KeycloakEventStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(kc.RAW_USER_EVENT_SCHEMA).parquet(src)
    q = store.ingest_stream(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert store.user_events().count() == 3
    # replay with the same checkpoint: no duplicates (exactly-once)
    stream2 = spark.readStream.schema(kc.RAW_USER_EVENT_SCHEMA).parquet(src)
    q2 = store.ingest_stream(stream2, checkpoint=str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert store.user_events().count() == 3


def test_detailsjson_roundtrip_property(spark):
    """Property: any details map survives to_json -> from_json intact —
    quotes, unicode, backslashes, empty strings (ref S6/S7 semantics,
    FlatEvents.java:9-29; exercises the reference's quote-doubling
    concern F8 structurally)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    text = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=40,
    )

    @settings(max_examples=12, deadline=None)
    @given(st.dictionaries(text, text, min_size=0, max_size=6))
    def roundtrip(details):
        df = spark.createDataFrame(
            [(details,)],
            T.StructType(
                [T.StructField("details", T.MapType(T.StringType(), T.StringType()))]
            ),
        )
        out = df.select(
            F.from_json(
                F.to_json("details"), T.MapType(T.StringType(), T.StringType())
            ).alias("rt")
        ).collect()[0].rt
        assert (out or {}) == details or (out is None and not details)

    roundtrip()


def test_strict_decode_raises_on_unknown_type(store):
    """strict=True reproduces the reference's EventType.valueOf throw
    (AthenaEventQuery.java:213-219) at execution time."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = kc.decoded_user_events(
        store.user_events(),
        valid_event_types=frozenset({"LOGIN", "LOGOUT"}),
        strict=True,
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as exc:
        df.collect()  # LOGIN_ERROR row trips the strict decode
    assert "unknown event type" in str(exc.value)
    # strict decode over only-valid rows passes
    ok = kc.decoded_user_events(
        store.user_events().filter("eventtype <> 'LOGIN_ERROR'"),
        valid_event_types=frozenset({"LOGIN", "LOGOUT"}),
        strict=True,
    )
    assert ok.count() == 2


def test_ingest_stream_json_quarantines_poison(spark, tmp_path):
    """End-to-end bad-record path through the store: poison JSON lines
    land under errors/dt=/hour=/processing-failed/ with the raw payload
    preserved (terraform/main.tf:195 layout); good rows commit and are
    queryable. Neither leg loses rows."""
    import json as _json
    import os

    good1 = _json.dumps(
        {"id": "g1", "type": "LOGIN", "realmId": "r1", "time": kc.millis("2024-03-01 10:15:00")}
    )
    good2 = _json.dumps(
        {"id": "g2", "type": "LOGOUT", "realmId": "r1", "time": kc.millis("2024-03-01 11:45:00")}
    )
    poison1 = '{"id": "bad", unquoted-key: }'
    poison2 = "not json at all"
    src = tmp_path / "wire"
    src.mkdir()
    (src / "lines.txt").write_text(
        "\n".join([good1, poison1, good2, poison2]) + "\n"
    )

    store = kc.KeycloakEventStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.text(str(src))
    q = store.ingest_stream_json(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()

    landed = {r.id for r in store.user_events().collect()}
    assert landed == {"g1", "g2"}
    quarantined = store.quarantined().collect()
    assert sorted(r.raw for r in quarantined) == sorted([poison1, poison2])
    # layout mirrors the reference's error_output_prefix
    err_root = os.path.join(str(tmp_path / "store"), "errors")
    deep = []
    for dirpath, _dirs, files in os.walk(err_root):
        deep += [os.path.join(dirpath, f) for f in files if f.endswith(".json")]
    assert all("/dt=" in p and "/hour=" in p and "/error_type=processing-failed" in p for p in deep)


def test_ingest_stream_json_at_most_once_drops_failed_batch(spark, tmp_path):
    """The at-most-once twin of the reference's send(): a batch whose
    write fails is logged and dropped — the query completes and later
    batches still deliver. The exactly-once default, by contrast,
    surfaces the failure."""
    import json as _json

    line = _json.dumps(
        {"id": "g1", "type": "LOGIN", "realmId": "r1", "time": kc.millis("2024-03-01 10:15:00")}
    )
    src = tmp_path / "wire2"
    src.mkdir()
    (src / "lines.txt").write_text(line + "\n")

    root = tmp_path / "store2"
    root.mkdir()
    # sabotage: user-events path exists as a FILE -> parquet write fails
    (root / "user-events").write_text("not a directory")

    store = kc.KeycloakEventStore(spark, str(root))
    stream = spark.readStream.text(str(src))
    q = store.ingest_stream_json(
        stream, checkpoint=str(tmp_path / "ckpt_amo"), delivery="at_most_once"
    )
    q.awaitTermination()  # must NOT raise: batch logged and dropped
    assert q.exception() is None

    stream2 = spark.readStream.text(str(src))
    q2 = store.ingest_stream_json(
        stream2, checkpoint=str(tmp_path / "ckpt_eo"), delivery="exactly_once"
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q2.awaitTermination()


def test_ingest_stream_json_over_live_socket(spark, tmp_path):
    """The live network-push leg (FirehoseEventStoreProvider.java:144-146):
    drive the store end-to-end through a REAL TCP socket source — a
    server thread writes NDJSON events (plus one poison line) over a
    socket, Spark's socket source streams them in, and the store's
    quarantine-aware ingest lands good rows partitioned and bad rows
    under the error prefix. Closes the gap between the reference's
    network push and file-based replays."""
    import json as _json
    import socket
    import threading
    import time as _time

    lines = [
        _json.dumps({"id": f"s{i}", "type": "LOGIN", "realmId": "r1",
                     "time": kc.millis(f"2024-03-01 10:0{i}:00")})
        for i in range(3)
    ] + ["this is not json"]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop_evt = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        stop_evt.wait(60)  # hold the connection open until the test ends
        conn.close()
        srv.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    store = kc.KeycloakEventStore(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    q = store.ingest_stream_json(
        stream,
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 second"},
    )
    try:
        deadline = _time.time() + 60
        landed, quarantined = set(), []
        while _time.time() < deadline:
            try:
                landed = {r.id for r in store.user_events().collect()}
                quarantined = store.quarantined().collect()
            except Exception:
                pass  # store paths not created yet
            if len(landed) == 3 and len(quarantined) == 1:
                break
            _time.sleep(1)
        assert landed == {"s0", "s1", "s2"}
        assert [r.raw for r in quarantined] == ["this is not json"]
    finally:
        q.stop()
        stop_evt.set()
