"""Driver-contract stability: entry() shape and the registry surface.
A rename or accidental drop of a query is a silent correctness-gate
shrink — pin the inventory."""

from __future__ import annotations

from vspace_spark.queries import ORACLES, QUERIES, load_all

load_all()

EXPECTED_QUERIES = {
    # vspace surface
    "term_stats_unigram", "term_stats_ngram", "term_stats_by_source",
    "doc_term_frequencies", "doc_wordcount", "normalize_corpus",
    "vocabulary", "vocab_gated_stats", "source_language_map",
    "tfidf_top3_per_doc", "corpus_job_ini", "term_stats_incremental_merge",
    # relational
    "q1_pricing_summary", "q3_top_unshipped_orders", "q5_nation_revenue",
    "top3_orders_per_customer", "customer_running_spend",
    "rollup_order_totals", "cube_lineitem_counts",
    "customers_without_orders", "customers_with_high_value_order",
    "part_price_bands", "asof_purchase_prior_view",
    "repeat_customers_both_years", "churned_customers_1995",
    "monthly_revenue", "events_json_stats", "user_sessions",
    "daily_event_pivot", "distinct_users_per_type",
    "approx_distinct_users", "customer_order_full_outer",
    "order_rank_suite", "trailing_30d_spend", "grouping_sets_revenue",
    "part_brand_intersect_all", "part_brand_except_all",
    "price_percentiles", "string_functions_suite", "q7_nation_volume",
    "token_positions",
    "math_functions_suite", "doc_token_arrays",
    "orders_above_segment_avg",
    # analytics
    "funnel_view_click_purchase", "cohort_daily_retention",
    "q14_promo_revenue", "q19_disjunctive_predicates",
    "min_cost_supplier_per_part", "tfidf_search", "token_cms_estimates",
    "user_hll_distinct", "vocab_bloom_membership", "events_rollup_cascade",
    "merge_upsert_orders", "daily_revenue_gapfilled",
    "daily_revenue_interpolated",
    # dedup
    "dedup_exact", "dedup_exact_normalized", "dedup_jaccard_pairs",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_clusters", "dedup_keep_best",
    # new in r6: SemDeDup, perceptual-hash, fuzzy edit-distance,
    # variant-typed JSON stats
    "dedup_semantic", "multimodal_phash_dedup", "dedup_fuzzy_pairs",
    "events_variant_stats", "dedup_semantic_fast", "corpus_pmi_bigrams",
    "dedup_semantic_trained",
    "dedup_fuzzy_pairs_qgram", "dedup_fuzzy_pairs_global",
    # new in r9: PassJoin segment generator (exact at all key lengths)
    "dedup_fuzzy_pairs_auto",
    "dedup_fuzzy_pairs_passjoin",
    # new in r11: oracled agreement gates pinning the rows-only
    # matmul/trained twins to their portable counterparts
    "agree_ann_bruteforce_fast", "agree_ann_ivf_pq_fast",
    "agree_dedup_semantic_fast", "agree_dedup_semantic_trained",
    # new in r12: the two streaming ingest fast lanes get the same
    # oracled agreement-gate treatment (VERDICT r11 #2)
    "agree_incr_minhash_xxhash64", "agree_incr_embedding_arrow",
    # similarity
    "ann_bruteforce_top5", "ann_lsh_top5", "ann_ivf_top5",
    "embedding_norms", "ml_tfidf_features",
    # text analysis
    "doc_token_counts", "doc_quality", "doc_language_id",
    "doc_fingerprints", "doc_repetition", "doc_train_test_split",
    "doc_oov_rate", "doc_boilerplate_share", "doc_pii_scrub",
    "source_wc_profile", "doc_length_outliers", "corpus_report",
    # curation
    "doc_decontamination", "doc_pack_sequences", "domain_mixture_weights",
    "curated_corpus", "doc_span_novelty", "shard_manifest",
    "doc_span_scrub", "stratified_sample_uniform", "doc_training_order",
    # relational part 3 (TPC-H shapes)
    "q6_forecast_revenue", "q4_priority_late_orders", "q10_returned_revenue",
    "q13_customer_distribution", "q18_large_quantity_orders",
    "q8_market_share", "q17_small_quantity_revenue", "q15_top_supplier",
    "q21_waiting_suppliers", "q22_lapsed_customer_balance",
    "q9_product_profit", "q12_late_priority_counts",
    "q11_important_stock",
    # round-3 session-3 additions
    "event_transition_matrix", "user_value_ewma",
    "pagerank_purchase_graph", "events_anomaly_zscore",
    "user_rfm_segments", "funnel_conversion_window",
    "temperature_resample", "corpus_jsonl_roundtrip",
    "stream_transition_matrix", "q16_supplier_part_counts",
    "q20_dominant_suppliers", "events_zorder_keys",
    # extras (out-of-window variants)
    "dedup_minhash_lsh_fast", "dedup_simhash_fast", "ann_lsh_top5_fast",
    "ann_bruteforce_top5_fast", "ann_ivf_pq_top5_fast",
    "ann_ivf_fixed_top5", "ann_ivf_pq_top5", "stream_dedup_embeddings",
    "stream_dedup_docs_minhash", "stream_dedup_docs_incremental",
    "stream_dedup_docs_passjoin", "stream_dedup_embeddings_incremental",
    # streaming
    "stream_hourly_counts", "stream_sliding_counts",
    "stream_user_sessions", "stream_dedup_events",
    "stream_stateful_user_totals", "stream_purchase_view_join",
    "stream_purchase_view_left_join", "stream_category_counts",
    "stream_term_stats", "stream_term_stats_ngram", "stream_dedup_docs",
    "stream_purchase_view_full_join",
    # multimodal + UDF shapes
    "multimodal_image_meta", "multimodal_frame_sample",
    "multimodal_resize_plan", "multimodal_features",
    "multimodal_audio_chunks",
    "udtf_token_chunks", "grouped_map_source_ranks",
    "map_functions_suite",
}

ROWS_ONLY = {
    "approx_distinct_users", "dedup_minhash_lsh_fast", "dedup_simhash_fast",
    "ann_lsh_top5_fast", "ann_bruteforce_top5_fast", "ann_ivf_top5",
    "ann_ivf_pq_top5_fast", "ml_tfidf_features", "dedup_semantic_fast",
    "dedup_semantic_trained",
    # multimodal_features left this set in r4: the exact md5-byte
    # projection made the inference path fully oracled
}


def test_registry_inventory_stable():
    assert set(QUERIES) == EXPECTED_QUERIES, (
        set(QUERIES) ^ EXPECTED_QUERIES
    )


def test_every_query_oracled_unless_declared_rows_only():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_entry_contract(spark):
    import __spark_entry__ as ep

    df = ep.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString() == (
        "struct<token:string,document_frequency:bigint,"
        "term_frequency:bigint,tdsum:bigint>"
    )
    assert set(ep.queries()) == EXPECTED_QUERIES
