"""Pinned reference semantics for the fluent event-query builder
(SURVEY.md §5.2 item 2; sources cited per assertion)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from keycloak_event_stream_spark.plans.event_query import EventQueryBuilder


def _ids(df):
    return [r.event_id for r in df.collect()]


def test_default_order_is_desc(events_df):
    # AthenaEventQuery.java:31 — default order DESC
    got = _ids(EventQueryBuilder(events_df).to_df())
    assert got == sorted(got, reverse=True)


def test_ascending_override(events_df):
    got = _ids(EventQueryBuilder(events_df).order_by_ascending().to_df())
    assert got == sorted(got)


def test_in_list_dedup_insertion_order(events_df):
    # LinkedHashSet semantics: duplicates collapse (AthenaEventQuery.java:46-51)
    b = EventQueryBuilder(events_df).types("click", "login", "click")
    assert b._types == ["click", "login"]
    got = b.to_df().select("event_type").distinct().collect()
    assert {r.event_type for r in got} == {"click", "login"}


def test_time_bounds_inclusive(events_df):
    # time >= from AND time <= to, both inclusive (AthenaEventQuery.java:189-195)
    lo = dt.datetime(2024, 1, 1, 0, 13, 0)
    hi = dt.datetime(2024, 1, 1, 0, 39, 0)
    got = _ids(
        EventQueryBuilder(events_df).from_time(lo).to_time(hi).order_by_ascending().to_df()
    )
    assert got == [1, 2, 3]  # minutes 13, 26, 39 — endpoints included


def test_epoch_millis_overload(events_df):
    # Date and long overloads accepted (AthenaEventQuery.java:72-97)
    lo_ms = int(dt.datetime(2024, 1, 1, 0, 13).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    got = _ids(
        EventQueryBuilder(events_df).from_time(lo_ms).order_by_ascending().to_df()
    )
    assert got[0] == 1


def test_max_results_nonpositive_unlimited(events_df):
    # maxResults <= 0 -> unlimited (AthenaEventQuery.java:112-115)
    assert len(_ids(EventQueryBuilder(events_df).max_results(0).to_df())) == 40
    assert len(_ids(EventQueryBuilder(events_df).max_results(-5).to_df())) == 40
    assert len(_ids(EventQueryBuilder(events_df).max_results(7).to_df())) == 7


def test_first_result_negative_ignored_zero_noop(events_df):
    # firstResult < 0 ignored; 0 omitted (AthenaEventQuery.java:106-109,154-156)
    all_ids = _ids(EventQueryBuilder(events_df).to_df())
    assert _ids(EventQueryBuilder(events_df).first_result(-1).to_df()) == all_ids
    assert _ids(EventQueryBuilder(events_df).first_result(0).to_df()) == all_ids
    assert _ids(EventQueryBuilder(events_df).first_result(10).to_df()) == all_ids[10:]


def test_pagination_tiles_the_sorted_stream(events_df):
    # offset+limit windows tile the sorted stream (SURVEY §5.2 item 4)
    pages = []
    for off in range(0, 40, 10):
        pages.extend(
            _ids(EventQueryBuilder(events_df).first_result(off).max_results(10).to_df())
        )
    assert pages == _ids(EventQueryBuilder(events_df).to_df())


def test_conjunctive_equality(events_df):
    got = (
        EventQueryBuilder(events_df)
        .where_eq("user_id", 2)
        .types("click")
        .to_df()
        .collect()
    )
    assert got and all(r.user_id == 2 and r.event_type == "click" for r in got)


def test_partition_pruning_predicates_derived(spark, tmp_path):
    # Time range -> dt predicates with lateness allowance (SURVEY §4, Q3+Q4)
    src = spark.range(0, 100).select(
        F.col("id").alias("event_id"),
        F.expr("timestamp_seconds(1704067200 + id * 3600)").alias("ts"),
        (F.col("id") % 3).alias("user_id"),
        F.lit("click").alias("event_type"),
    )
    path = str(tmp_path / "part_events")
    (
        src.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("hour", F.hour("ts"))
        .write.partitionBy("dt", "hour")
        .parquet(path)
    )
    df = spark.read.parquet(path)
    q = (
        EventQueryBuilder(df, dt_col="dt", hour_col="hour")
        .from_time("2024-01-02 00:00:00")
        .to_time("2024-01-02 23:59:59")
        .to_df()
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dt" in plan  # pruning predicate reached the scan
    rows = q.collect()
    assert len(rows) == 24
    # correctness unaffected by pruning: same rows as a plain time filter
    expect = df.filter(
        (F.col("ts") >= "2024-01-02 00:00:00") & (F.col("ts") <= "2024-01-02 23:59:59")
    ).count()
    assert len(rows) == expect


def test_collect_terminal_with_deadline(events_df):
    rows = (
        EventQueryBuilder(events_df)
        .types("click")
        .max_results(5)
        .collect(timeout_s=60)
    )
    assert len(rows) == 5 and all(r.event_type == "click" for r in rows)


def test_to_local_iterator_streams_rows(events_df):
    it = EventQueryBuilder(events_df).order_by_ascending().to_local_iterator()
    first = next(it)
    assert first.event_id == 0
