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
]


@pytest.mark.parametrize("name", EMPTY_SENSITIVE)
def test_operator_on_empty_input(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    assert df.count() == 0


@pytest.mark.parametrize("name", EMPTY_SCALAR)
def test_scalar_aggregate_on_empty_input(spark, empty_sf_dir, name):
    rows = entrymod.queries()[name](spark, empty_sf_dir).collect()
    assert len(rows) == 1
