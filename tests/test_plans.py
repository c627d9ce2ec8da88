"""Physical-plan shape assertions: the scale properties the engine
promises are pinned here, not just prose (SURVEY.md §4).

These read the *executed/optimized* plan text: if a refactor silently
loses a pushdown, a broadcast, or the top-k specialization, these fail.
"""

from __future__ import annotations

import pytest

from keycloak_event_stream_spark.registry import collect

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return collect()[0]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filters_push_down_to_parquet_scan(spark, queries):
    plan = _plan(queries["q_filter_eq_conj"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(user_id,7)" in plan


def test_projection_prunes_scan_columns(spark, queries):
    plan = _plan(queries["q_scan_project"](spark, SF))
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "props" not in read and "value" not in read  # unused columns gone


def test_topk_compiles_to_take_ordered(spark, queries):
    # per-partition heaps + driver merge; no global sort, no shuffle
    plan = _plan(queries["q_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_star_join_broadcasts_dimensions(spark, queries):
    plan = _plan(queries["q_join_broadcast"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 3  # supplier, nation, region
    assert "SortMergeJoin" not in plan


def test_semi_join_planned_as_semi(spark, queries):
    plan = _plan(queries["q_join_semi"](spark, SF))
    assert "LeftSemi" in plan


def test_agg_has_partial_map_side_combine(spark, queries):
    plan = _plan(queries["q_agg_hash"](spark, SF))
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "HashAggregate" in plan


def test_in_subquery_becomes_semi_join(spark, queries):
    plan = _plan(queries["q_subquery_in"](spark, SF))
    assert "LeftSemi" in plan  # Catalyst decorrelated the IN subquery


def test_whole_stage_codegen_covers_scan_pipeline(spark, queries):
    df = queries["q_filter_range_time"](spark, SF)
    df.collect()  # finalize the AQE plan
    # "*(N)" prefixes mark WholeStageCodegen spans in final-plan text
    assert "*(1) Filter" in _plan(df) or "WholeStageCodegen" in _plan(df)


def test_event_time_range_pushes_raw_bounds_to_scan(spark, queries):
    # The ts range predicate must reach the parquet reader either as a
    # native timestamp bound (timestamp[us] fixtures — pushes directly)
    # or as the redundant raw-nanos twin (TIMESTAMP(NANOS) fixtures,
    # where the decoded-ts predicate is wrapped in timestamp_micros()
    # and cannot push; see catalog._NANO_TS_COLS).
    plan = _plan(queries["q_filter_range_time"](spark, SF))
    assert (
        "GreaterThanOrEqual(ts,17" in plan  # epoch-nanos literal
        or "GreaterThanOrEqual(ts,2024-01-10" in plan  # native timestamp
    )
    assert (
        "LessThanOrEqual(ts,17" in plan
        or "LessThanOrEqual(ts,2024-01-20" in plan
    )


def test_builder_time_range_pushes_raw_bounds(spark):
    from keycloak_event_stream_spark.catalog import load_table
    from keycloak_event_stream_spark.plans.event_query import EventQueryBuilder

    q = (
        EventQueryBuilder(load_table(spark, SF, "events"))
        .from_time("2024-01-05 00:00:00")
        .to_time("2024-01-25 23:59:59")
        .to_df()
    )
    assert "ts_nanos" not in q.columns  # helper column dropped from output
    plan = _plan(q)
    assert (
        "GreaterThanOrEqual(ts,17" in plan
        or "GreaterThanOrEqual(ts,2024-01-05" in plan
    )


def test_join_strategy_hints_respected(spark, queries):
    from keycloak_event_stream_spark.catalog import load_table

    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    shj = orders.join(
        cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
    )
    assert "ShuffledHashJoin" in _plan(shj)
    smj = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    assert "SortMergeJoin" in _plan(smj)


def test_dynamic_partition_pruning(spark, tmp_path):
    """A selective dim filter prunes fact partitions at runtime (DPP):
    the fact scan's PartitionFilters carries a dynamicpruning
    subquery instead of scanning every dt."""
    from pyspark.sql import functions as F

    from keycloak_event_stream_spark.catalog import load_table

    fact_path = str(tmp_path / "fact")
    ev = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("dt").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dts = [r.dt for r in fact.select("dt").distinct().collect()]
    dim = spark.createDataFrame(
        [(d, "keep" if i == 0 else "drop") for i, d in enumerate(sorted(dts))],
        "dt string, flag string",
    )
    joined = fact.join(dim.filter(F.col("flag") == "keep"), "dt")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower()
    # correctness: only the kept partition's rows survive
    assert joined.count() == fact.filter(F.col("dt") == sorted(dts)[0]).count()


def test_tpch_q5_broadcasts_all_dims(spark, queries):
    plan = _plan(queries["q_tpch_q5"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_aqe_splits_skewed_join(spark, tmp_path):
    """A hot key (99% of rows) triggers AQE's skew-join splitting once
    thresholds are in range — the runtime answer to key skew that needs
    no manual salting."""
    from pyspark.sql import functions as F

    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
        F.lpad(F.col("id").cast("string"), 100, "x").alias("pad"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").alias("w")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # keep the wide pad column through the shuffle so the hot
        # partition's bytes clearly cross the skew threshold
        joined = left.join(right, "k").select("k", "pad", "w")
        rows = joined.collect()  # execute THIS plan so AQE finalizes it
        assert len(rows) == 198_010  # hot key 7 + distinct ids < 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_funnel_single_scan_single_shuffle(spark, queries):
    """The single-pass funnel must touch the events table exactly once
    (the per-stage-join formulation scans it once per stage) and
    shuffle only for the one groupBy(user_id)."""
    plan = _plan(queries["q_funnel"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_kmeans_assignment_is_broadcast(spark, queries):
    # the corpus must never shuffle for the assignment step: centroids
    # (k rows) broadcast into a nested-loop cross join; no sort-merge
    # or shuffled-hash join anywhere
    plan = _plan(queries["q_kmeans_lloyd"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # k-row centroid broadcast


def test_market_basket_no_join(spark, queries):
    # the rewrite generates pairs in-row from collect_set baskets:
    # no join operator of any kind in the plan
    plan = _plan(queries["q_market_basket"](spark, SF))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan  # top-50 stays a heap


def test_auc_reduces_before_window(spark, queries):
    # the window (cumulative positives) must run over the per-score
    # aggregate, not raw rows: a HashAggregate keyed by score appears
    # below the Window (later in the printed top-down plan)
    import re

    plan = _plan(queries["q_auc_roc"](spark, SF))
    per_score = re.search(r"HashAggregate\(keys=\[score", plan)
    assert per_score is not None
    assert plan.index("Window") < per_score.start()


def test_hard_negatives_broadcasts_anchors(spark, queries):
    plan = _plan(queries["q_hard_negatives"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    # top-k window is per-anchor, never a global single-partition sort
    assert "windowspecdefinition(q_id" in plan


def test_ndcg_windows_are_partitioned(spark, queries):
    plan = _plan(queries["q_ndcg_eval"](spark, SF))
    assert "BroadcastExchange" in plan
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs and all(s.lstrip().startswith("q_id") for s in specs)


def test_dedup_segments_shuffles_hash_not_text(spark, queries):
    plan = _plan(queries["q_dedup_segments"](spark, SF))
    # the survivor window partitions by the md5 segment hash; the raw
    # token array must not survive past the project below the exchange
    assert "windowspecdefinition(h" in plan
    ex = plan.index("Exchange hashpartitioning(h")
    assert "split(text" not in plan[ex - 400:ex + 400]


def test_bpe_encode_broadcasts_merge_scalars(spark, queries):
    plan = _plan(queries["q_bpe_encode"](spark, SF))
    # the 1-row merge winners reach the vocab via broadcast, and the
    # corpus-side join against the encode map is not a cartesian
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_cross_correlation_single_events_scan(spark, queries):
    # the daily (x, y) rollup is ONE conditional-aggregate pass,
    # persisted: every downstream branch (bounds, spine, both lag
    # sides) reads the cached rollup, so the raw events file
    # materializes once. (InMemoryTableScan's description embeds the
    # cached plan's FileScan text, so counting raw "FileScan" strings
    # over-counts — assert the cache boundary instead.)
    plan = _plan(queries["q_cross_correlation"](spark, SF))
    assert plan.count("InMemoryTableScan") >= 4  # all branches cached
    first_cache = plan.index("InMemoryTableScan")
    assert "FileScan parquet" not in plan[:first_cache]


def test_ridge_regression_single_scan_no_shuffle_rows(spark, queries):
    # sufficient-statistics fit: one lineitem scan reduced to a 1-row
    # moment vector; no join, no window, no row-level shuffle
    plan = _plan(queries["q_ridge_regression"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_instruction_format_no_exchange(spark, queries):
    # per-row template transform: scan -> project -> sort for the
    # deterministic output order; no aggregation/join exchanges beyond
    # the final range partition for ORDER BY
    plan = _plan(queries["q_instruction_format"](spark, SF))
    assert "HashAggregate" not in plan
    assert "Join" not in plan


def test_dedup_prefix_shuffles_hashes_not_text(spark, queries):
    # the exchange after fingerprinting must not carry the text
    # column: the partial aggregate that feeds it outputs only the
    # fingerprint + partial counters (text# appears below the
    # exchange, inside the map-side md5 projection)
    plan = _plan(queries["q_dedup_prefix"](spark, SF))
    ex = plan.index("Exchange hashpartitioning")
    out_start = plan.index("output=[", ex)
    out = plan[out_start : plan.index("]", out_start)]
    assert "text" not in out


def test_levene_broadcasts_group_medians(spark, queries):
    # the |groups|-row median table joins back by broadcast, never a
    # row-level sort-merge join
    plan = _plan(queries["q_levene_test"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gain_curve_rank_is_two_phase(spark, queries):
    # the corpus-wide score rank must run range-partitioned (two-phase
    # primitive), not as a single-partition global window: the only
    # unpartitioned Window allowed is over the 10-decile aggregate
    plan = _plan(queries["q_gain_curve"](spark, SF))
    assert "rangepartitioning" in plan.lower()


def test_stickiness_dedups_before_range_join(spark, queries):
    # the 30-day trailing MAU must range-join the DEDUPED (user, day)
    # membership, never raw events: the join input side carries no
    # event columns
    plan = _plan(queries["q_stickiness"](spark, SF))
    assert "event_type" not in plan  # raw columns pruned before joins


def test_followed_by_matrix_no_self_join(spark, queries):
    # eventually-followed-by is ONE forward-window pass, not an
    # events-x-events self join
    plan = _plan(queries["q_followed_by_matrix"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("FileScan parquet") == 1


class TestGraphBroadcastSizeGuard:
    """The iterative graph family's |V|-sized state vectors (rank /
    hub score / keep set / BFS frontier) carry a size-guarded
    broadcast: hinted while the node count fits under
    spark.kes.graph.broadcastMaxNodes, dropped above it so the planner
    falls back to exchanging the |V|-row state against the cached edge
    layout instead of OOMing at a 100 TB graph. Both plan shapes are
    pinned on the same fixture, and the shuffle path must reproduce
    the broadcast path's rows exactly."""

    GRAPH_QUERIES = (
        "q_graph_pagerank",
        "q_graph_hits",
        "q_graph_kcore",
        "q_graph_bfs_levels",
    )

    CONF = "spark.kes.graph.broadcastMaxNodes"

    def _rows(self, df):
        return sorted(tuple(r) for r in df.collect())

    def test_default_mode_broadcasts_state(self, spark, queries):
        spark.conf.unset(self.CONF)
        plan = _plan(queries["q_graph_pagerank"](spark, SF))
        assert "BroadcastHashJoin" in plan

    def test_forced_shuffle_mode_drops_broadcast_hint(self, spark, queries):
        # with the guard off, the state join must no longer be
        # hint-FORCED: disabling Spark's own auto threshold simulates
        # "planner estimates the state as too big" — an unconditional
        # F.broadcast() hint would override that and still plan BHJ
        # (the pre-guard bug), while the guarded code degrades to a
        # shuffle join
        prev_auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set(self.CONF, "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the default-mode test above leaves pagerank's persisted
        # build tables (pairs/deg) in the CacheManager with plans
        # created under the normal auto threshold — a tiny fixture
        # legitimately plans the orders-lineitem join as BHJ there,
        # and a cache HIT here would splice that stored subtree into
        # this plan string. Clear so everything replans under the
        # forced confs; the assertion is about the guard, not about
        # plans cached before the simulated size estimate changed.
        spark.catalog.clearCache()
        try:
            df = queries["q_graph_pagerank"](spark, SF)
            plan = _plan(df)
            assert "BroadcastHashJoin" not in plan
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        finally:
            spark.conf.unset(self.CONF)
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", prev_auto
            )

    @pytest.mark.parametrize("name", GRAPH_QUERIES)
    def test_shuffle_mode_rows_identical(self, spark, queries, name):
        spark.conf.unset(self.CONF)
        expected = self._rows(queries[name](spark, SF))
        spark.conf.set(self.CONF, "0")
        try:
            got = self._rows(queries[name](spark, SF))
        finally:
            spark.conf.unset(self.CONF)
        assert got == expected


def test_range_binned_join_aqe_skew_splits_hot_bin(spark, tmp_path):
    """Event-time range joins skew in TIME, not key: a flash crowd
    lands 99% of clicks in one 15-minute bin, and the binned equi-join
    (q_join_range_binned) funnels them into one reducer. The bin key
    is an ordinary shuffle key, so AQE's skew-join splitting must
    repair it at runtime — pinned here on a flash-crowd fixture, with
    the row count checked against a brute-force evaluation."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # 40 errors scattered over 10 hours
    for i in range(40):
        rows.append((i, 1, "error", base + dt.timedelta(minutes=15 * i)))
    # flash crowd: 30k clicks inside ONE 15-minute window
    for i in range(30_000):
        rows.append(
            (
                1000 + i,
                2,
                "click",
                base + dt.timedelta(minutes=30, seconds=i % 900),
            )
        )
    # background clicks elsewhere
    for i in range(500):
        rows.append(
            (
                50_000 + i,
                3,
                "click",
                base + dt.timedelta(minutes=17 * (i % 35), seconds=7),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    df.coalesce(2).write.parquet(str(tmp_path / "events.parquet"))

    brute = df.filter(F.col("event_type") == "error").alias("e").join(
        df.filter(F.col("event_type") == "click").alias("c"),
        (F.col("c.ts") >= F.col("e.ts"))
        & (F.col("c.ts") < F.col("e.ts") + F.expr("INTERVAL 15 MINUTE")),
    )
    want = brute.count()
    assert want > 30_000  # the flash crowd really matches

    from keycloak_event_stream_spark.registry import collect as _collect

    q = _collect()[0]["q_join_range_binned"]
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = q(spark, str(tmp_path))
        rows = out.collect()  # execute THIS plan so AQE finalizes it
        assert len(rows) == want
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan  # the hot bin was split at runtime
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
