"""Robustness: every operator family must handle empty input tables
(a real pipeline sees empty partitions/days constantly)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from kafka_clickhouse_pipeline_spark.schemas import (
    DOCUMENTS_SCHEMA,
    EMBEDDINGS_SCHEMA,
    EVENTS_SCHEMA,
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A fixture dir with empty (zero-row) core tables; TPC-H tables
    copied tiny from sf0.001 so join queries still resolve."""
    d = tmp_path_factory.mktemp("empty_sf")
    spark.createDataFrame([], EVENTS_SCHEMA).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame([], DOCUMENTS_SCHEMA).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame([], EMBEDDINGS_SCHEMA).write.parquet(f"{d}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


EMPTY_SENSITIVE = [
    # round-8 additions (probed against the empty fixture)
    "q_embedding_anisotropy",
    "q_retrieval_map_at_k",
    "q_mattr_lexical_diversity",
    "q_doc_oov_rate",
    "q_sax_motifs",
    "q_user_ltv_decay",
    "q_ivf_bucket_occupancy",
    "q_label_confusability",
    "q_mmr_diversified_topk",
    "q_vocab_coverage_topk",
    "q_doclen_quantiles_by_lang",
    "q_langid_confusion",
    "q_jsd_sources",
    "q_mutual_info_type_hour",
    "q_dup_cluster_size_hist",
    "q_embedding_norm_stats",
    # round-7 additions (probed against the empty fixture)
    "q_skipgram_pairs",
    "q_neardup_rate_by_source",
    "q_coverage_curve",
    "q_iqr_outliers",
    "q_dataset_card_stats",
    "q_node_jaccard_minhash",
    "q_kneser_ney_bigram",
    "q_char_diversity",
    "q_tokenizer_fertility",
    "q_hellinger_sources",
    "q_winsorized_stats",
    "q_burstiness_hourly",
    "q_spearman_corr",
    "q_audience_overlap",
    "sales_by_hour",
    "status_counts",
    "mv_parse_typed",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q_token_stats",
    "q_quality_score",
    "q_fingerprint",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_embedding_cosine",
    "q_dedup_clusters",
    "q_ann_bruteforce_topk",
    "q_ann_ivf_topk",
    "q_ann_ivf_split_topk",
    "q_ann_ivf_kmeans_topk",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_pivot_user_event_values",
    "q_json_extract_stats",
    "q_asof_last_signup",
    "q_ann_pq_topk",
    "q_ann_lsh_topk",
    "q_fingerprint_winnow",
    "q_gapfill_hourly",
    "q_range_join_quantity_bands",
    "q_unpivot_lineitem_measures",
    "q_ntile_acctbal_quartiles",
    "q7_volume_shipping",
    "q8_market_share",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q22_untapped_segments",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q_retention_cohorts",
    "q_heavy_hitter_users",
    "q_stratified_rebalance",
    "q_zscore_outliers",
    "q_mad_outliers",
    "q_window_percent_rank",
    "q_pagerank_copurchase",
    "q_neardup_threshold_minhash",
    "q_salted_agg_revenue",
    "q_salted_join_brand_volume",
    "q_click_purchase_attribution",
    # round-10 additions (probed against the empty fixture)
    "q_attribution_reduce_candidates",
    "q_mv_parse_multiformat",
    "q_ann_ivf_pq_topk",
    "q_grouping_sets_revenue",  # Spark: 0 rows on empty (cube edge note)
    "q_asof_nearest_signup",
    "q_dedup_containment",
    "q_cube_revenue",
    "q_decontaminate_shingle_overlap",
    "q_quality_gopher",
    "q_pii_redact_stats",
    "q_pack_sequences",
    "q_moving_avg_7d",
    "q_day_over_day",
    "q_division_every_year",
    "q_perplexity_unigram",
    "q_source_vocab_overlap",
    "q_upsert_latest_wins",
    "q_sample_hash_per_source",
    "q_dedup_quality_canonical",
    "q_split_assign",
    "q_token_budget_selection",
    "q_chunk_documents",
    "q_embedding_label_centroids",
    "q_source_mixture_weights",
    "q_split_leakage_audit",
    # round-3 late additions
    "q_semantic_dedup",
    "q_dedup_embedding_lsh",
    "q_dedup_substring_windows",
    "q_perplexity_bigram",
    "q_bpe_pair_counts",
    "q_paragraph_dedup",
    "q_decontaminate_bloom",
    "q_repetition_filters",
    "q_dedup_incremental",
    "q_knn_graph",
    "q_pmi_collocations",
    "q_temperature_sample",
    "q_degree_distribution",
    # round-4 additions
    "q_fuzzy_match_parts",
    "q_fuzzy_canonical_parts",
    "q_label_propagation",
    "q_bpe_train_merges",
    "q_embedding_int8_quantize",
    "q_hard_negatives",
    "q_dedup_incremental_near",
    "q_quality_classifier_hashed",
    "q_tokenize_bpe_apply",
    "q_ann_recall_audit",
    # round-4 second batch
    "q_dsir_importance",
    "q_oov_rate",
    "q_triplet_mining",
    "q_cluster_topics",
    "q_quota_sample",
    "q_embedding_top_pc",
    "q_kcore_mutual_knn",
    "q_embedding_debias_abtt",
    "q_dedup_recall_audit",
    # round-6 completeness sweep: EVERY registered query is now
    # classified (see test_every_registered_query_is_classified);
    # behaviors below were probed empirically against the empty
    # fixture and encode the intended contract
    "stock_top5",
    "recent_sales",
    "q10_top_returning_customers",
    "q13_customer_order_distribution",
    "q16_supplier_part_counts",
    "q3_shipping_priority",
    "q4_order_priority",
    "q9_product_type_profit",
    "q_adamic_adar",
    "q_adamic_adar_capped",
    "q_ann_hamming_topk",
    "q_anomaly_seasonal_residual",
    "q_anti_join_inactive_customers",
    "q_approx_distinct_users",
    "q_array_agg_parts_per_brand",
    "q_basket_itemsets3",
    "q_basket_lift",
    "q_benford_totalprice",
    "q_betweenness_sampled",
    "q_bfs_hops",
    "q_bm25_search",
    "q_boilerplate_ngrams",
    "q_closeness_sampled",
    "q_cms_term_counts",
    "q_compaction_plan",
    "q_curation_pipeline",
    "q_cusum_changepoint",
    "q_date_functions",
    "q_dedup_clusters_twostar",
    "q_dedup_media_exact",
    "q_dedup_prefix_filter",
    "q_dialect_daily_events",
    "q_dialect_flags_report",
    "q_dialect_top_words",
    "q_distinct_customers_per_segment",
    "q_distinct_kmv",
    "q_entropy_by_source",
    "q_event_transitions",
    "q_ewma_backtest",
    "q_ewma_hourly",
    "q_freshness_audit",
    "q_funnel_dropoff_time",
    "q_hamming_recall",
    "q_having_big_orders",
    "q_heavy_hitters",
    "q_holt_backtest",
    "q_hypertable_rollup",
    "q_interevent_times",
    "q_intersect_except_customers",
    "q_k_anonymity_audit",
    "q_knn_classifier",
    "q_lang_id",
    "q_matryoshka_recall",
    "q_media_phash",
    "q_media_phash_neardup",
    "q_modularity_lpa",
    "q_multimodal_resize",
    "q_ngram_novelty",
    "q_node_jaccard",
    "q_node_jaccard_capped",
    "q_null_functions",
    "q_ppr_copurchase",
    "q_profile_lineitem",
    "q_randomwalk_corpus",
    "q_local_clustering_topk",
    "q_ndcg_search_eval",
    "q_padding_waste",
    "q_hits_purchases",
    "q_kaplan_meier",
    "q_markov_stationary",
    "q_rfm_segments",
    "q_rollup_revenue",
    "q_rrf_hybrid_search",
    "q_sample_systematic",
    "q_scd2_user_status",
    "q_session_peak_overlap",
    "q_sessionize",
    "q_silhouette_kmeans",
    "q_skyline_parts",
    "q_string_functions",
    "q_subquery_above_avg_balance",
    "q_tfidf_top_terms",
    "q_theilsen_hourly",
    "q_trend_by_type",
    "q_union_priority_classes",
    "q_value_percentiles",
    "q_value_percentiles_approx",
    "q_weighted_sample",
    "q_window_running_revenue",
    "q_window_top3_parts_per_brand",
]

#: global aggregates without grouping: on empty input they return ONE
#: row (null/zero aggregates) -- the SQL-standard shape, matching the
#: oracle, not zero rows
EMPTY_SCALAR = [
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q_corr_purchase_click",
    "q_funnel_steps",
    "q_corpus_stats",
    "q_triangle_count_copurchase",
    # round-6 completeness sweep
    "q_ab_test_conversion",
    "q_autocorr_hourly",
    "q_bloom_join_audit",
    "q_bootstrap_ci_mean",
    "q_chi2_type_hour",
    "q_classifier_auc",
    "q_degree_assortativity",
    "q_embedding_centroid_drift",
    "q_gini_customer_revenue",
    "q_ks_value_drift",
    "q_mann_whitney_value",
    "q_pareto_revenue_share",
    "q_welch_ttest_value",
    "q_zipf_fit",
    "q_brand_assortativity",
    # round-7 additions (both engines agree on the all-NULL shape:
    # SUM over zero rows is NULL in Spark and DuckDB alike)
    "q_wedge_minhash_recall",
    "q_epoch_shuffle_audit",
    # round-8: ungrouped regression over the (empty) checkpoint frame
    "q_heaps_law_fit",
    # round-8: ungrouped summary over the (empty) audited pair frame
    "q_minhash_estimate_error",
]

#: Fixed output spines: operators whose empty-input result is a
#: constant-shape frame (bin/spine/step rows with zeroed measures),
#: matching their oracles' literal spines.
EMPTY_FIXED_ROWS = {
    "q_calibration_bins": 10,
    "q_constraint_audit": 7,
    "q_funnel_window": 3,
    "q_histogram_value": 20,
    "q_key_skew_audit": 3,
    "q_psi_value_drift": 5,
    "q_seasonality_profile": 168,
    "q_zorder_layout": 2,
}


@pytest.mark.parametrize("name", EMPTY_SENSITIVE)
def test_operator_on_empty_input(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    assert df.count() == 0


@pytest.mark.parametrize("name", EMPTY_SCALAR)
def test_scalar_aggregate_on_empty_input(spark, empty_sf_dir, name):
    rows = entrymod.queries()[name](spark, empty_sf_dir).collect()
    assert len(rows) == 1


@pytest.mark.parametrize("name", sorted(EMPTY_FIXED_ROWS))
def test_fixed_spine_on_empty_input(spark, empty_sf_dir, name):
    rows = entrymod.queries()[name](spark, empty_sf_dir).collect()
    assert len(rows) == EMPTY_FIXED_ROWS[name]


def test_every_registered_query_is_classified():
    """Completeness meta-test (round 6): a new query cannot skip the
    empty-input sweep -- every queries() entry must be in exactly one
    of EMPTY_SENSITIVE / EMPTY_SCALAR / EMPTY_FIXED_ROWS. (The funnel
    NULL-vs-0 bug from ADVICE r5 was exactly this gap: an unswept
    operator whose empty behavior diverged from its oracle.)"""
    classified = (
        set(EMPTY_SENSITIVE) | set(EMPTY_SCALAR) | set(EMPTY_FIXED_ROWS)
    )
    registered = set(entrymod.queries())
    missing = sorted(registered - classified)
    assert not missing, f"queries missing an empty-input class: {missing}"
    unknown = sorted(classified - registered)
    assert not unknown, f"classified but not registered: {unknown}"
    overlap = sorted(
        (set(EMPTY_SENSITIVE) & set(EMPTY_SCALAR))
        | (set(EMPTY_SENSITIVE) & set(EMPTY_FIXED_ROWS))
        | (set(EMPTY_SCALAR) & set(EMPTY_FIXED_ROWS))
    )
    assert not overlap, f"queries in more than one class: {overlap}"
