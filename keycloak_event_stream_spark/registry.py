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
# Round-8 window (per VERDICT r7 "Next round #2"). Coverage
# arithmetic after r7: the registry holds 506 queries; 337 unique
# names are driver-checked (CORRECTNESS_r01..r07 union, zero stale
# reds), 169 never checked (reproduce:
# set(queries) - union(CORRECTNESS_r01..r07 keys)). This window holds
# EXACTLY 50 names: 35 never-checked + 15 re-checks, so a green r8
# sheet lands coverage at 372/506 with 134 remaining (~2.7 more
# windows at 50/round).
#
# This window, in order: (a) the two r7 registrations that only have
# sweep evidence — s_dedup_state_audit (the dropDuplicates key-store
# audit; r6 verdict #6) and q_lsh_intake_recall_eval (the streaming-
# intake recall/precision eval; r6 verdict #7, REWRITTEN this round to
# materialize in one action and release every cache pin — r8 ADVICE);
# (b) round-8 code-change re-checks — q_join_asof_pandas (its
# module-level applyInPandas fn now ships by value; r7 verdict
# "What's wrong #1"), q_dedup_components (the LP broadcast guard now
# bounds sym+self edges at 2*n_sym; r8 ADVICE), q_dedup_near_minhash
# (shared-prefix A/B closed flat, BASELINE.md "Round 8"; prefix now
# posts LAST_PREFIX_PINS), q_graph_hits, q_graph_bfs_levels and
# q_graph_kcore (the eager-loop conf-scope rewrites: hits 8.3->5.7 s
# at sf0.1; bfs 37->8 s and kcore 64->14 s under the vanilla session —
# BASELINE.md "Round 8"), and the five heaviest names touched by the
# bounded-replay width scope in streaming/queries.py::_run_to_memory
# (state width derived from the fixture size instead of the session's
# corpus width — semi join 33.7->2.7 s measured; BASELINE.md "Round 8
# — measured r9 head item", landed late r8): s_stream_stream_semi/
# full/left/_join + s_tumbling_uniques. The scope touches 17 s_*
# names total; the other 12 (all oracle-green in the post-change
# /tmp vanilla sweep) queue for r9 re-checks below. Then the four
# bounded-eval width-scope rewrites (catalog.bounded_eval_scope,
# also landed late r8; BASELINE.md "Round 8 — bounded-eval width
# scope"): q_association_rules, q_shingle_size_sensitivity,
# q_graph_assortativity, q_graph_common_neighbors — their
# multi-shuffle evals at the vanilla session's corpus width measured
# 12-28 s for ≤25-row results and read ~1-2 s warm with input-derived
# width (persist pins now compile inside the scope; pins released
# after the eager materialization).
# (c) the funnel/attribution family; (d) the
# advanced-SQL block; (e) the remaining function packs incl. the
# variant trio; (f) the eventstore pair. The profiling/layout block
# (g) yielded its five slots to the replay re-checks, and
# q_conditional_funcs / q_map_higher_order / q_xml_parse /
# q_regex_extract_all yielded theirs to the bounded-eval re-checks;
# all nine join the r9 queue.
#
# Round-9/10 rotation plan for the 134 never-checked names left after
# a green r8 (verdict r7 #7a): r9 leads with the 12 remaining
# replay-scope re-checks (s_tumbling_counts, s_sliding_agg,
# s_watermark_late, s_session_windows, s_stream_dedup,
# s_stream_static_join, s_stream_kl_monitor, s_stateful_profile,
# s_window_topk, s_tumbling_approx_uniques, s_rate_alert,
# s_session_flags — every one oracle-green in the post-change /tmp
# vanilla sweep), then the nine displaced first-time names — the
# profiling/layout block (q_layout_partitioned_prune,
# q_partition_size_audit, q_dq_audit, q_cluster_zorder,
# q_compaction_bins) and the function-pack four (q_conditional_funcs,
# q_map_higher_order, q_xml_parse, q_regex_extract_all) — and the
# three displaced in the graph rotation (q_catalog_freshness,
# q_null_rate_matrix, q_dup_key_audit); after those 24 slots, r9
# takes the dedup/fingerprint tail
# (q_dedup_bow/_prefix/_keep_best/_ngram_jaccard/_fuzzy_name,
# q_fingerprint[_rolling], q_sim_search_pandas), the curation/sampling
# names (q_dsir_importance, q_stratified_sample, q_sample_per_group,
# q_mixture_weights, q_curation_pipeline, q_instruction_format,
# q_safety_lexicon, q_pit_training_set, q_context_length_plan,
# q_shard_plan), the text/corpus stats tail (q_vocab_coverage,
# q_perplexity_unigram, q_zipf_fit, q_lexical_diversity,
# q_doc_repetition, q_dataset_card, q_token_histogram_log2,
# q_logsumexp_sources, q_tokenizer_fertility, q_char_ngram_profile,
# q_bigram_lm, q_multimodal_cols) and the remaining window/join names
# (q_window_ntile/_ignore_nulls/_nth/_trailing_7d,
# q_join_interval_overlap/_asof_forward, q_gaps_islands,
# q_transition_matrix, q_multiband_singlescan, q_percent_of_total,
# q_rollup_rank); r10 takes the analytics/bi tail (q_yoy_growth,
# q_top_movers_wow, q_market_share_shift, q_audience_overlap,
# q_seasonal_heatmap, q_retention_curve_fit, ...), the embedding tail
# (q_random_projection, q_embed_pca_power/_mmd/_covariance,
# q_dbscan_core, q_coreset_kcenter, q_hard_negatives,
# q_skipgram_cooc), the remaining quality/stat names and everything
# else left in the reproduce set.
_PRIORITY = [
    # (a) new registrations needing first driver proof (2)
    "s_dedup_state_audit",
    "q_lsh_intake_recall_eval",
    # (b) round-8 code-change re-checks (15)
    "q_join_asof_pandas",
    "q_dedup_components",
    "q_dedup_near_minhash",
    "q_graph_hits",
    "q_graph_bfs_levels",
    "q_graph_kcore",
    "s_stream_stream_semi_join",
    "s_stream_stream_full_join",
    "s_stream_stream_left_join",
    "s_stream_stream_join",
    "s_tumbling_uniques",
    "q_association_rules",
    "q_shingle_size_sensitivity",
    "q_graph_assortativity",
    "q_graph_common_neighbors",
    # (c) funnel / attribution family (13, first-time)
    "q_funnel",
    "q_funnel_rates",
    "q_funnel_paths",
    "q_funnel_cohort",
    "q_attribution_first_touch",
    "q_attribution_last_touch",
    "q_shapley_attribution",
    "q_markov_attribution",
    "q_time_to_convert",
    "q_cart_abandonment",
    "q_retention_cohort",
    "q_user_lifecycle",
    "q_cohort_ltv",
    # (d) advanced-SQL block (10, first-time)
    "q_pipe_syntax",
    "q_lateral_topk",
    "q_window_distinct_running",
    "q_sql_scripting",
    "q_execute_immediate",
    "q_collation_group",
    "q_recursive_date_spine",
    "q_grouping_sets_distinct",
    "q_string_agg",
    "q_posexplode_tokens",
    # (e) remaining function packs (8, first-time)
    "q_array_hof",
    "q_bit_funcs",
    "q_hash_funcs",
    "q_try_funcs",
    "q_variant_parse",
    "q_variant_nested",
    "q_variant_invalid",
    "q_url_funcs",
    # (f) eventstore pair (2, first-time) — window cap reached at
    # exactly 50
    "q_eventstore_canonical",
    "q_eventstore_user_filter",
    # ---- refill: past-round windows + locally-verified families ----
    # (q_conditional_funcs, q_map_higher_order, q_xml_parse and
    # q_regex_extract_all yielded their slots to the bounded-eval
    # width-scope re-checks and join the r9 first-time queue.)
    "q_conditional_funcs",
    "q_map_higher_order",
    "q_xml_parse",
    "q_regex_extract_all",
    # (below the ~50 cap: NOT driver-checked this round; relative order
    # preserved from the r7 file as documentation of past windows.
    # The profiling/layout block yielded its five slots to the
    # bounded-replay width-scope re-checks (s_stream_stream_* +
    # s_tumbling_uniques); with q_catalog_freshness, q_null_rate_matrix
    # and q_dup_key_audit — displaced earlier by the graph re-checks —
    # they lead the r9 queue after the 12 remaining replay-scope
    # re-checks listed in the rotation plan above.)
    "q_layout_partitioned_prune",
    "q_partition_size_audit",
    "q_dq_audit",
    "q_cluster_zorder",
    "q_compaction_bins",
    "q_catalog_freshness",
    "q_null_rate_matrix",
    "q_dup_key_audit",
    "q_ngram_novelty",
    "q_market_basket",
    "q_psi_drift",
    "q_agg_bool",
    "s_window_state_audit",
    "s_session_state_audit",
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
    "q_udf_python",
    "q_udf_pandas_norm",
    "q_udf_arrow",
    "q_udaf_apply_in_pandas",
    "q_sql_udf",
    "q_cogroup_enrich",
    "q_udtf_first_seen",
    "q_udtf_partition_agg",
    "q_udtf_polymorphic",
    "q_source_csv_roundtrip",
    "q_source_json_roundtrip",
    "q_source_orc_roundtrip",
    "q_source_binaryfile",
    "q_source_schema_evolution",
    "q_source_corrupt_tolerant",
    "q_sink_pydatasource_roundtrip",
    "q_source_pushgen",
    "s_source_pushgen_stream",
    "s_foreachbatch_mv",
    "s_window_topk",
    "s_stream_static_join",
    "s_stream_kl_monitor",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
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
    "q_value_histogram_text",
    "q_repetition_profile",
    "q_doc_language_mismatch",
    "q_session_handoff",
    "q_market_share_shift",
    "q_dedup_normalization_ladder",
    "q_join_skew_stats",
    "q_error_burst_detection",
    "q_rate_limit_window",
    "q_returns_wilson",
    "q_discount_band_elasticity",
    "q_text_ascii_ratio",
    "q_percentile_trend_weekly",
    "q_retention_curve_fit",
    "q_dedup_cross_source",
    "q_spearman_corr",
    "q_window_nth_value",
    "q_feed_freshness",
    "q_sampling_bias_check",
    "q_histogram_2d",
    "q_reservoir_aes",
    "q_seasonal_index_dow",
    "q_poisson_fit_lines",
    "q_invoice_reconciliation",
    "q_top_movers_wow",
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
