"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship corpus-stats query on sf0.001.
``queries()`` maps each implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL for the driver's side-by-side check.

Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_extractor_spark import pipelines
from parquet_extractor_spark.operators import (
    analyze,
    classifier,
    contamination,
    corpus_index,
    crawl,
    dedup,
    entities,
    extract,
    media_known_answers,
    media_known_answers_deep,
    media_robustness,
    multimodal,
    multimodal_oracle,
    profiling,
    quality,
    relational,
    selection,
    similarity,
    skew,
    textprep,
    timeseries,
    tpch,
    training,
    versioning,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analyze.corpus_stats(spark, "/root/testdata/sf0.001")


# The declared round-12 driver window (exactly the first 50 keys of
# queries(), asserted by tests/test_relational_oracle.py):
# 1 r12 addition (media_malformed_probes — never driver-checked: the
# malformed-media tolerance table distilled from this round's
# adversarial decoder sweep) + 3 semantics-changed re-checks
# (ivf_pq_recall_eval and
# ann_ivf_pq_refined — the trained PQ codebook grew to
# PQ_K_REFINED=16 codewords this round, so their r11 driver evidence
# no longer certifies the current values; media_known_answer_probes_
# deep — three new probe rows: MP3 VBR walk + Xing, MPEG-2.5
# parameter-stop, WebM/EBML walk) + the 46-query head of the
# r06-green cohort, the stalest driver evidence in the registry
# (the r11 verdict's item 1). The cohort's 4-entry remainder
# (doc_length_quantiles, events_approx_users, pq_codes,
# media_feature_checksums) leads the r13 queue.
R12_WINDOW: tuple[str, ...] = (
    "media_malformed_probes",
    "ivf_pq_recall_eval",
    "media_known_answer_probes_deep",
    "ann_ivf_pq_refined",
    "semantic_decontamination",
    "hard_negative_mining",
    "bloom_decontamination",
    "countmin_heavy_hitters",
    "temperature_mixing_weights",
    "length_bucketing_efficiency",
    "pii_audit",
    "decontamination_report",
    "user_longest_streak_window",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "media_image_metadata",
    "media_gif_frame_checksums",
    "media_apng_frame_checksums",
    "sq8_codes",
    "q1_pricing_summary",
    "doc_chunks",
    "tfidf_top_terms",
    "stratified_sample_by_lang",
    "weighted_sample_by_lang",
    "fuzzy_name_pairs",
    "language_id",
    "quality_scores",
    "bpe_token_counts",
    "doc_fingerprints",
    "repetition_scores",
    "pii_redaction",
    "ngram_decontamination",
    "entity_union_directory",
    "user_longest_streak",
    "user_retention_cohorts",
    "events_hourly_gapfilled",
    "session_funnel",
    "q12_late_lines_by_status",
    "events_distinct_users",
    "pack_sequences",
    "train_val_test_split",
    "source_mixing_weights",
    "kmeans_refine",
    "dsir_importance_weights",
    "bm25_doc_scores",
    "inverted_index",
    "pmi_top_pairs",
    "zipf_token_stats",
    "shard_assignments",
    "cross_source_dedup_candidates",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict order matters: the driver's correctness gate checks the
    FIRST 50 entries (exactly 50). After r07 every registry query has
    at least one green driver row, so from r08 on the window policy is
    pure staleness rotation: (1) every query added this round (never
    driver-checked) goes first; (2) queries whose SEMANTICS changed
    this round go next (their old driver evidence no longer certifies
    the current code); (3) the remaining slots go to the queries whose
    NEWEST green driver row is oldest. The round-12 window is the
    ``R12_WINDOW`` tuple below — kept as DATA, not prose, so the
    composition is machine-checked (test_driver_window_matches_
    declared_tuple) instead of hand-counted: 1 r12 addition
    (media_malformed_probes — the malformed-media tolerance table,
    never driver-checked) + 3 r12-changed queries (ivf_pq_recall_eval
    and
    ann_ivf_pq_refined re-enter because the trained codebook grew to
    16 codewords — new values; media_known_answer_probes_deep because
    of the three new MP3/WebM probe rows) + the 46-query head of the
    r06-green cohort, the registry's stalest driver evidence. The
    r12 simhash_fingerprints aggregation fold is value-identical
    (oracle hash unchanged at sf0.001/0.01), so per the
    value-identical-refactor rule it stays in the tail with this
    note. r13 queue: the r06-green remainder (doc_length_quantiles,
    events_approx_users, pq_codes, media_feature_checksums), then
    the r07-green cohort.
    Every tail entry is re-verified locally each round via
    tools/check_oracle.py at sf0.001/0.01/0.1 (one command:
    ``python -m pytest tests/test_oracle_gate.py``; see COVERAGE.md).
    """
    return {
        # ——— driver window (first 50, exactly — R12_WINDOW): the r12
        #     addition + the 3 r12 semantics-changed queries + the
        #     46-query head of the r06-green cohort (stalest driver
        #     evidence) ———
        "media_malformed_probes":
            media_robustness.media_malformed_probes,
        "ivf_pq_recall_eval": similarity.ivf_pq_recall_eval,
        "media_known_answer_probes_deep":
            media_known_answers_deep.media_known_answer_probes_deep,
        "ann_ivf_pq_refined": similarity.ann_ivf_pq_refined,
        # — r06-green cohort head —
        "semantic_decontamination": similarity.semantic_decontamination,
        "hard_negative_mining": similarity.hard_negative_mining,
        "bloom_decontamination": contamination.bloom_decontamination,
        "countmin_heavy_hitters": corpus_index.countmin_heavy_hitters,
        "temperature_mixing_weights": training.temperature_mixing_weights,
        "length_bucketing_efficiency": training.length_bucketing_efficiency,
        "pii_audit": quality.pii_audit,
        "decontamination_report": contamination.decontamination_report,
        "user_longest_streak_window": timeseries.user_longest_streak_window,
        "bpe_train_merges": textprep.bpe_train_merges,
        "bpe_encode_corpus": textprep.bpe_encode_corpus,
        "media_image_metadata": multimodal.media_image_metadata,
        "media_gif_frame_checksums": multimodal.media_gif_frame_checksums,
        "media_apng_frame_checksums": multimodal.media_apng_frame_checksums,
        "sq8_codes": similarity.sq8_codes,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "doc_chunks": textprep.doc_chunks,
        "tfidf_top_terms": textprep.tfidf_top_terms,
        "stratified_sample_by_lang": textprep.stratified_sample_by_lang,
        "weighted_sample_by_lang": textprep.weighted_sample_by_lang,
        "fuzzy_name_pairs": textprep.fuzzy_name_pairs,
        "language_id": quality.language_id,
        "quality_scores": quality.quality_scores,
        "bpe_token_counts": quality.bpe_token_counts,
        "doc_fingerprints": quality.doc_fingerprints,
        "repetition_scores": quality.repetition_scores,
        "pii_redaction": quality.pii_redaction,
        "ngram_decontamination": contamination.ngram_decontamination,
        "entity_union_directory": timeseries.entity_union_directory,
        "user_longest_streak": timeseries.user_longest_streak,
        "user_retention_cohorts": timeseries.user_retention_cohorts,
        "events_hourly_gapfilled": timeseries.events_hourly_gapfilled,
        "session_funnel": timeseries.session_funnel,
        "q12_late_lines_by_status": tpch.q12_late_lines_by_status,
        "events_distinct_users": relational.events_distinct_users,
        "pack_sequences": training.pack_sequences,
        "train_val_test_split": training.train_val_test_split,
        "source_mixing_weights": training.source_mixing_weights,
        "kmeans_refine": similarity.kmeans_refine,
        "dsir_importance_weights": selection.dsir_importance_weights,
        "bm25_doc_scores": selection.bm25_doc_scores,
        "inverted_index": corpus_index.inverted_index,
        "pmi_top_pairs": corpus_index.pmi_top_pairs,
        "zipf_token_stats": corpus_index.zipf_token_stats,
        "shard_assignments": training.shard_assignments,
        "cross_source_dedup_candidates": dedup.cross_source_dedup_candidates,
        # ——— tail (driver-green r03-r11; re-verified locally each
        #     round via tools/check_oracle.py — see COVERAGE.md) ———
        # — r11-green (displaced r12 window; freshest driver
        #   evidence) —
        "event_trigram_lift": timeseries.event_trigram_lift,
        "dedup_canonical_by_quality": training.dedup_canonical_by_quality,
        "tokenizer_fertility_by_lang": textprep.tokenizer_fertility_by_lang,
        "entity_resolution": entities.entity_resolution,
        "leakage_safe_split": training.leakage_safe_split,
        "ngram_novelty_profile": analyze.ngram_novelty_profile,
        "truncation_waste_report": training.truncation_waste_report,
        "quality_filter_ablation": quality.quality_filter_ablation,
        "events_funnel_ordered": timeseries.events_funnel_ordered,
        "orders_cohort_retention": timeseries.orders_cohort_retention,
        "release_manifest": pipelines.release_manifest,
        "dp_source_release": quality.dp_source_release,
        "events_changepoint_cusum": timeseries.events_changepoint_cusum,
        "customer_repurchase_hazard":
            timeseries.customer_repurchase_hazard,
        "orders_benford_audit": profiling.orders_benford_audit,
        "events_autocorrelation": timeseries.events_autocorrelation,
        "source_length_mannwhitney": analyze.source_length_mannwhitney,
        "customer_revenue_gini": relational.customer_revenue_gini,
        "events_dow_chisq": timeseries.events_dow_chisq,
        "reshard_movement_report": training.reshard_movement_report,
        "source_lexical_diversity": analyze.source_lexical_diversity,
        "classifier_calibration_report":
            classifier.classifier_calibration_report,
        "quality_gate_kappa": quality.quality_gate_kappa,
        "per_source_quality_cutoffs": quality.per_source_quality_cutoffs,
        "cluster_lang_purity": dedup.cluster_lang_purity,
        "orders_seasonal_decomposition":
            timeseries.orders_seasonal_decomposition,
        "warehouse_fk_audit": profiling.warehouse_fk_audit,
        "events_xmr_control": timeseries.events_xmr_control,
        "events_funnel_deadline": timeseries.events_funnel_deadline,
        "orders_backlog_timeline": timeseries.orders_backlog_timeline,
        "source_quality_psi": quality.source_quality_psi,
        "session_top_paths": timeseries.session_top_paths,
        "embedding_covariance_profile":
            similarity.embedding_covariance_profile,
        "dedup_containment_scores": dedup.dedup_containment_scores,
        "events_type_audience_overlap":
            timeseries.events_type_audience_overlap,
        "simhash_bit_balance": dedup.simhash_bit_balance,
        "lineitem_price_mad_outliers":
            profiling.lineitem_price_mad_outliers,
        "classifier_decile_lift": classifier.classifier_decile_lift,
        "source_centroid_separation":
            similarity.source_centroid_separation,
        "top_order_per_customer": relational.top_order_per_customer,
        "top_brands_by_revenue": relational.top_brands_by_revenue,
        "top_docs_by_tokens": analyze.top_docs_by_tokens,
        "tokens_per_lang": analyze.tokens_per_lang,
        "source_token_kl": analyze.source_token_kl,
        "segment_stats_rollup": relational.segment_stats_rollup,
        "dedup_graph_pagerank": dedup.dedup_graph_pagerank,
        "lsh_quality_eval": dedup.lsh_quality_eval,
        "url_canonical_dedup": crawl.url_canonical_dedup,
        # — r10-green —
        "customer_entity_resolution": entities.customer_entity_resolution,
        "brand_price_rank_assoc": timeseries.brand_price_rank_assoc,
        "user_activity_powerlaw": timeseries.user_activity_powerlaw,
        "hybrid_search_rrf": selection.hybrid_search_rrf,
        "join_key_skew": skew.join_key_skew,
        "media_audio_metadata": multimodal.media_audio_metadata,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_exact": dedup.exact_dedup,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_candidates": dedup.minhash_lsh_candidates,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "dedup_components": dedup.dedup_components,
        "knn_bruteforce": similarity.knn_bruteforce,
        "ann_sign_lsh": similarity.ann_sign_lsh,
        "ann_sign_lsh_multiprobe": similarity.ann_sign_lsh_multiprobe,
        "ann_ivf": similarity.ann_ivf,
        "media_resize_checksums": multimodal.media_resize_checksums,
        "lm_bigram_surprisal": selection.lm_bigram_surprisal,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
        "embedding_norm_stats": similarity.embedding_norm_stats,
        "dedup_canonical": training.dedup_canonical,
        "corpus_stats": analyze.corpus_stats,
        "extract_plan": extract.extract_plan,
        "span_scrubbed_docs": selection.span_scrubbed_docs,
        "curriculum_phases": selection.curriculum_phases,
        "phrase_search": corpus_index.phrase_search,
        "source_log_odds_terms": analyze.source_log_odds_terms,
        "source_length_ks": analyze.source_length_ks,
        "q11_important_part_values": tpch.q11_important_part_values,
        "q16_supplier_part_counts": tpch.q16_supplier_part_counts,
        "q20_excess_shippers": tpch.q20_excess_shippers,
        "token_budget_sample": training.token_budget_sample,
        "event_markov_transitions": timeseries.event_markov_transitions,
        "q2_min_price_supplier": tpch.q2_min_price_supplier,
        "q4_order_priority_checking": tpch.q4_order_priority_checking,
        "quality_classifier_scores": quality.quality_classifier_scores,
        "event_volume_anomalies": timeseries.event_volume_anomalies,
        "gopher_quality_flags": quality.gopher_quality_flags,
        "winnowing_fingerprints": quality.winnowing_fingerprints,
        "source_quality_summary": quality.source_quality_summary,
        "chunk_dedup": textprep.chunk_dedup,
        "nfc_normalized_hashes": textprep.nfc_normalized_hashes,
        "bpe_merge_candidates": textprep.bpe_merge_candidates,
        "embedding_outliers": similarity.embedding_outliers,
        "semdedup_keep": similarity.semdedup_keep,
        "ann_ivf_pq": similarity.ann_ivf_pq,
        "dedup_reduction_report": dedup.dedup_reduction_report,
        "ann_random_projection": similarity.ann_random_projection,
        # — r08-green —
        "crawl_politeness_audit": crawl.crawl_politeness_audit,
        "robots_rules_parsed": crawl.robots_rules_parsed,
        "robots_compliance_audit": crawl.robots_compliance_audit,
        "snapshot_contamination_gate":
            contamination.snapshot_contamination_gate,
        "media_known_answer_probes":
            media_known_answers.media_known_answer_probes,
        "longest_dup_span_pow2": selection.longest_dup_span_pow2,
        "mixed_script_audit": quality.mixed_script_audit,
        "orders_point_in_time_dim": versioning.orders_point_in_time_dim,
        # — r08-green (the r08 window's r03 refresh) —
        "asof_view_before_purchase": timeseries.asof_view_before_purchase,
        "brand_price_regression": timeseries.brand_price_regression,
        "brand_price_stats": timeseries.brand_price_stats,
        "brand_small_quantity_revenue":
            relational.brand_small_quantity_revenue,
        "customer_activity_full_join": relational.customer_activity_full_join,
        "customer_order_running_totals":
            relational.customer_order_running_totals,
        "customer_value_quartiles": relational.customer_value_quartiles,
        "customers_lost_since_1995": timeseries.customers_lost_since_1995,
        "customers_without_orders": relational.customers_without_orders,
        "doc_length_histogram": analyze.doc_length_histogram,
        "doc_token_counts": analyze.doc_token_counts,
        "duplicate_spans": selection.duplicate_spans,
        "events_cube": relational.events_cube,
        "events_daily_moving_avg": timeseries.events_daily_moving_avg,
        "events_hourly": relational.events_hourly,
        "events_json_stats": relational.events_json_stats,
        "events_pivot_daily": timeseries.events_pivot_daily,
        "events_pivot_roundtrip": timeseries.events_pivot_roundtrip,
        "events_sessionized": timeseries.events_sessionized,
        "label_centroids": similarity.label_centroids,
        "order_priority_counts": relational.order_priority_counts,
        "orders_priority_grouping_sets":
            relational.orders_priority_grouping_sets,
        "orders_quarter_range_join": timeseries.orders_quarter_range_join,
        "part_type_distinct_brands": relational.part_type_distinct_brands,
        "part_types_sold_both_periods":
            timeseries.part_types_sold_both_periods,
        "q10_returned_items": tpch.q10_returned_items,
        "q13_order_count_distribution": tpch.q13_order_count_distribution,
        "q14_promo_revenue": tpch.q14_promo_revenue,
        "q15_top_supplier": tpch.q15_top_supplier,
        "q18_large_volume_customers": tpch.q18_large_volume_customers,
        "q19_disjunctive_revenue": tpch.q19_disjunctive_revenue,
        "q21_waiting_suppliers": tpch.q21_waiting_suppliers,
        "q22_prospect_customers": tpch.q22_prospect_customers,
        "q3_top_unshipped_orders": relational.q3_top_unshipped_orders,
        "q5_region_revenue": relational.q5_region_revenue,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q7_volume_shipping": tpch.q7_volume_shipping,
        "q8_market_share": tpch.q8_market_share,
        "q9_product_type_profit": tpch.q9_product_type_profit,
        "region_nation_roster": relational.region_nation_roster,
        "sampled_doc_ids": extract.sampled_doc_ids,
        # — r05-r07-green —
        "media_video_metadata": multimodal.media_video_metadata,
        "train_quality_classifier": classifier.train_quality_classifier,
        "trained_classifier_scores": classifier.trained_classifier_scores,
        "doc_length_quantile_sketch": analyze.doc_length_quantile_sketch,
        "label_text_profile": analyze.label_text_profile,
        "surprisal_mixing_weights": selection.surprisal_mixing_weights,
        "source_vocab_overlap": selection.source_vocab_overlap,
        "dedup_graph_triangles": dedup.dedup_graph_triangles,
        "matryoshka_recall": similarity.matryoshka_recall,
        "unimax_mixing_budgets": training.unimax_mixing_budgets,
        "k_anonymity_audit": quality.k_anonymity_audit,
        "ccnet_perplexity_buckets": selection.ccnet_perplexity_buckets,
        "curation_funnel": pipelines.curation_funnel,
        "source_ngram_diversity": analyze.source_ngram_diversity,
        "encoding_audit": quality.encoding_audit,
        "media_phash": multimodal.media_phash,
        "media_phash_near_dups": multimodal.media_phash_near_dups,
        "media_audio_fingerprint": multimodal.media_audio_fingerprint,
        "media_audio_near_dups": multimodal.media_audio_near_dups,
        "media_animation_signatures": multimodal.media_animation_signatures,
        "media_animation_near_dups": multimodal.media_animation_near_dups,
        "media_exif_gps_audit": multimodal.media_exif_gps_audit,
        "media_neardup_eval": multimodal.media_neardup_eval,
        "parquet_footer_stats": analyze.parquet_footer_stats,
        "binary_hamming_recall": similarity.binary_hamming_recall,
        "pack_sequences_nosplit": training.pack_sequences_nosplit,
        "source_vocab_kmv_jaccard": selection.source_vocab_kmv_jaccard,
        "readability_scores": quality.readability_scores,
        "split_leakage_audit": training.split_leakage_audit,
        "dup_cluster_histogram": dedup.dup_cluster_histogram,
        "corpus_novelty_curve": analyze.corpus_novelty_curve,
        "corpus_version_diff": versioning.corpus_version_diff,
        "char_entropy_scores": quality.char_entropy_scores,
        "source_boilerplate_ngrams": analyze.source_boilerplate_ngrams,
        "corpus_integrity_audit": analyze.corpus_integrity_audit,
        "incremental_dedup_candidates":
            versioning.incremental_dedup_candidates,
        "events_profile": profiling.events_profile,
        "orders_constraint_checks": profiling.orders_constraint_checks,
        "embedding_drift_audit": similarity.embedding_drift_audit,
        "events_rolling_active_users": timeseries.events_rolling_active_users,
        "part_affinity_rules": relational.part_affinity_rules,
        "customer_rfm_segments": relational.customer_rfm_segments,
        "events_rolling_active_users_hll":
            timeseries.events_rolling_active_users_hll,
        "scd2_customer_history": versioning.scd2_customer_history,
        "conversion_time_quantiles": timeseries.conversion_time_quantiles,
        "language_id_confusion": quality.language_id_confusion,
        "supplier_concentration_hhi": relational.supplier_concentration_hhi,
        "orders_monthly_growth": timeseries.orders_monthly_growth,
        "embedding_similarity_histogram":
            similarity.embedding_similarity_histogram,
        "customer_revenue_pareto": relational.customer_revenue_pareto,
        # — r06-green remainder (r13 queue head) —
        "doc_length_quantiles": analyze.doc_length_quantiles,
        "events_approx_users": relational.events_approx_users,
        "pq_codes": similarity.pq_codes,
        "media_feature_checksums": multimodal.media_feature_checksums,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "events_approx_users": relational.EVENTS_APPROX_USERS_SQL,
        "pq_codes": similarity.PQ_CODES_SQL,
        "sq8_codes": similarity.SQ8_CODES_SQL,
        "url_canonical_dedup": crawl.URL_CANONICAL_DEDUP_SQL,
        "crawl_politeness_audit": crawl.CRAWL_POLITENESS_AUDIT_SQL,
        "snapshot_contamination_gate":
            contamination.SNAPSHOT_CONTAMINATION_GATE_SQL,
        "media_known_answer_probes":
            media_known_answers.MEDIA_KNOWN_ANSWER_PROBES_SQL,
        "media_known_answer_probes_deep":
            media_known_answers_deep.MEDIA_KNOWN_ANSWER_PROBES_DEEP_SQL,
        "media_malformed_probes":
            media_robustness.MEDIA_MALFORMED_PROBES_SQL,
        "dedup_canonical_by_quality":
            training.DEDUP_CANONICAL_BY_QUALITY_SQL,
        "tokenizer_fertility_by_lang":
            textprep.TOKENIZER_FERTILITY_BY_LANG_SQL,
        "entity_resolution": entities.ENTITY_RESOLUTION_SQL,
        "customer_entity_resolution":
            entities.CUSTOMER_ENTITY_RESOLUTION_SQL,
        "leakage_safe_split": training.LEAKAGE_SAFE_SPLIT_SQL,
        "ngram_novelty_profile": analyze.NGRAM_NOVELTY_SQL,
        "truncation_waste_report": training.TRUNCATION_WASTE_SQL,
        "quality_filter_ablation": quality.QUALITY_FILTER_ABLATION_SQL,
        "events_funnel_ordered": timeseries.EVENTS_FUNNEL_ORDERED_SQL,
        "orders_cohort_retention":
            timeseries.ORDERS_COHORT_RETENTION_SQL,
        "release_manifest": pipelines.RELEASE_MANIFEST_SQL,
        "dp_source_release": quality.DP_SOURCE_RELEASE_SQL,
        "events_changepoint_cusum":
            timeseries.EVENTS_CHANGEPOINT_CUSUM_SQL,
        "customer_repurchase_hazard":
            timeseries.CUSTOMER_REPURCHASE_HAZARD_SQL,
        "orders_benford_audit": profiling.ORDERS_BENFORD_AUDIT_SQL,
        "events_autocorrelation":
            timeseries.EVENTS_AUTOCORRELATION_SQL,
        "source_length_mannwhitney":
            analyze.SOURCE_LENGTH_MANNWHITNEY_SQL,
        "customer_revenue_gini": relational.CUSTOMER_REVENUE_GINI_SQL,
        "events_dow_chisq": timeseries.EVENTS_DOW_CHISQ_SQL,
        "event_trigram_lift": timeseries.EVENT_TRIGRAM_LIFT_SQL,
        "reshard_movement_report":
            training.RESHARD_MOVEMENT_REPORT_SQL,
        "brand_price_rank_assoc": timeseries.BRAND_PRICE_RANK_ASSOC_SQL,
        "source_lexical_diversity": analyze.SOURCE_LEXICAL_DIVERSITY_SQL,
        "classifier_calibration_report":
            classifier.CLASSIFIER_CALIBRATION_SQL,
        "quality_gate_kappa": quality.QUALITY_GATE_KAPPA_SQL,
        "per_source_quality_cutoffs":
            quality.PER_SOURCE_QUALITY_CUTOFFS_SQL,
        "cluster_lang_purity": dedup.CLUSTER_LANG_PURITY_SQL,
        "orders_seasonal_decomposition":
            timeseries.ORDERS_SEASONAL_DECOMPOSITION_SQL,
        "warehouse_fk_audit": profiling.WAREHOUSE_FK_AUDIT_SQL,
        "events_xmr_control": timeseries.EVENTS_XMR_CONTROL_SQL,
        "events_funnel_deadline": timeseries.EVENTS_FUNNEL_DEADLINE_SQL,
        "orders_backlog_timeline":
            timeseries.ORDERS_BACKLOG_TIMELINE_SQL,
        "source_quality_psi": quality.SOURCE_QUALITY_PSI_SQL,
        "session_top_paths": timeseries.SESSION_TOP_PATHS_SQL,
        "embedding_covariance_profile":
            similarity.EMBEDDING_COVARIANCE_PROFILE_SQL,
        "dedup_containment_scores": dedup.DEDUP_CONTAINMENT_SQL,
        "events_type_audience_overlap":
            timeseries.EVENTS_TYPE_AUDIENCE_OVERLAP_SQL,
        "simhash_bit_balance": dedup.SIMHASH_BIT_BALANCE_SQL,
        "lineitem_price_mad_outliers":
            profiling.LINEITEM_PRICE_MAD_OUTLIERS_SQL,
        "user_activity_powerlaw": timeseries.USER_ACTIVITY_POWERLAW_SQL,
        "classifier_decile_lift": classifier.CLASSIFIER_DECILE_LIFT_SQL,
        "source_centroid_separation":
            similarity.SOURCE_CENTROID_SEPARATION_SQL,
        "robots_rules_parsed": crawl.ROBOTS_RULES_PARSED_SQL,
        "robots_compliance_audit": crawl.ROBOTS_COMPLIANCE_AUDIT_SQL,
        "longest_dup_span_pow2": selection.LONGEST_DUP_SPAN_POW2_SQL,
        "mixed_script_audit": quality.MIXED_SCRIPT_AUDIT_SQL,
        "orders_point_in_time_dim":
            versioning.ORDERS_POINT_IN_TIME_DIM_SQL,
        "media_feature_checksums":
            multimodal_oracle.MEDIA_FEATURE_CHECKSUMS_SQL,
        "media_audio_metadata":
            multimodal_oracle.MEDIA_AUDIO_METADATA_SQL,
        "media_video_metadata":
            multimodal_oracle.MEDIA_VIDEO_METADATA_SQL,
        "media_image_metadata":
            multimodal_oracle.MEDIA_IMAGE_METADATA_SQL,
        "media_gif_frame_checksums":
            multimodal_oracle.MEDIA_GIF_FRAME_CHECKSUMS_SQL,
        "media_apng_frame_checksums":
            multimodal_oracle.MEDIA_APNG_FRAME_CHECKSUMS_SQL,
        "bpe_train_merges": textprep.BPE_TRAIN_MERGES_SQL,
        "bpe_encode_corpus": textprep.BPE_ENCODE_CORPUS_SQL,
        "train_quality_classifier":
            classifier.TRAIN_QUALITY_CLASSIFIER_SQL,
        "trained_classifier_scores":
            classifier.TRAINED_CLASSIFIER_SCORES_SQL,
        "semantic_decontamination":
            similarity.SEMANTIC_DECONTAMINATION_SQL,
        "hard_negative_mining": similarity.HARD_NEGATIVE_MINING_SQL,
        "bloom_decontamination":
            contamination.BLOOM_DECONTAMINATION_SQL,
        "countmin_heavy_hitters":
            corpus_index.COUNTMIN_HEAVY_HITTERS_SQL,
        "temperature_mixing_weights": training.TEMPERATURE_MIXING_SQL,
        "length_bucketing_efficiency": training.LENGTH_BUCKETING_SQL,
        "pii_audit": quality.PII_AUDIT_SQL,
        "decontamination_report":
            contamination.DECONTAMINATION_REPORT_SQL,
        "dsir_importance_weights": selection.DSIR_IMPORTANCE_WEIGHTS_SQL,
        "bm25_doc_scores": selection.BM25_DOC_SCORES_SQL,
        "duplicate_spans": selection.DUPLICATE_SPANS_SQL,
        "span_scrubbed_docs": selection.SPAN_SCRUBBED_DOCS_SQL,
        "curriculum_phases": selection.CURRICULUM_PHASES_SQL,
        "lm_bigram_surprisal": selection.LM_BIGRAM_SURPRISAL_SQL,
        "corpus_stats": analyze.CORPUS_STATS_SQL,
        "doc_token_counts": analyze.DOC_TOKEN_COUNTS_SQL,
        "tokens_per_lang": analyze.TOKENS_PER_LANG_SQL,
        "top_docs_by_tokens": analyze.TOP_DOCS_BY_TOKENS_SQL,
        "source_token_kl": analyze.SOURCE_TOKEN_KL_SQL,
        "doc_length_histogram": analyze.DOC_LENGTH_HISTOGRAM_SQL,
        "extract_plan": extract.EXTRACT_PLAN_SQL,
        "sampled_doc_ids": extract.SAMPLED_DOC_IDS_SQL,
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_top_unshipped_orders": relational.Q3_SQL,
        "q5_region_revenue": relational.Q5_SQL,
        "q6_forecast_revenue": relational.Q6_SQL,
        "top_brands_by_revenue": relational.TOP_BRANDS_SQL,
        "top_order_per_customer": relational.TOP_ORDER_PER_CUSTOMER_SQL,
        "customer_order_running_totals": relational.RUNNING_TOTALS_SQL,
        "customer_value_quartiles": relational.CUSTOMER_VALUE_QUARTILES_SQL,
        "customers_without_orders": relational.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "customer_activity_full_join": relational.CUSTOMER_ACTIVITY_FULL_SQL,
        "brand_small_quantity_revenue": relational.BRAND_SMALL_QTY_SQL,
        "order_priority_counts": relational.ORDER_PRIORITY_SQL,
        "segment_stats_rollup": relational.SEGMENT_ROLLUP_SQL,
        "orders_priority_grouping_sets": relational.ORDERS_GROUPING_SETS_SQL,
        "region_nation_roster": relational.REGION_NATION_ROSTER_SQL,
        "events_hourly": relational.EVENTS_HOURLY_SQL,
        "events_json_stats": relational.EVENTS_JSON_SQL,
        "part_type_distinct_brands": relational.PART_TYPE_DISTINCT_SQL,
        "events_distinct_users": relational.EVENTS_DISTINCT_USERS_SQL,
        "events_cube": relational.EVENTS_CUBE_SQL,
        "q7_volume_shipping": tpch.Q7_SQL,
        "q8_market_share": tpch.Q8_SQL,
        "q9_product_type_profit": tpch.Q9_SQL,
        "q10_returned_items": tpch.Q10_SQL,
        "q12_late_lines_by_status": tpch.Q12_SQL,
        "q2_min_price_supplier": tpch.Q2_SQL,
        "q4_order_priority_checking": tpch.Q4_SQL,
        "q11_important_part_values": tpch.Q11_SQL,
        "q16_supplier_part_counts": tpch.Q16_SQL,
        "q20_excess_shippers": tpch.Q20_SQL,
        "q13_order_count_distribution": tpch.Q13_SQL,
        "q14_promo_revenue": tpch.Q14_SQL,
        "q15_top_supplier": tpch.Q15_SQL,
        "q18_large_volume_customers": tpch.Q18_SQL,
        "q19_disjunctive_revenue": tpch.Q19_SQL,
        "q21_waiting_suppliers": tpch.Q21_SQL,
        "q22_prospect_customers": tpch.Q22_SQL,
        "asof_view_before_purchase": timeseries.ASOF_SQL,
        "events_sessionized": timeseries.SESSIONIZED_SQL,
        "events_pivot_daily": timeseries.EVENTS_PIVOT_SQL,
        "events_pivot_roundtrip": timeseries.EVENTS_PIVOT_ROUNDTRIP_SQL,
        "events_daily_moving_avg": timeseries.EVENTS_MOVING_AVG_SQL,
        "brand_price_stats": timeseries.BRAND_PRICE_STATS_SQL,
        "brand_price_regression": timeseries.BRAND_PRICE_REGRESSION_SQL,
        "part_types_sold_both_periods": timeseries.PART_TYPES_BOTH_SQL,
        "orders_quarter_range_join": timeseries.ORDERS_QUARTER_RANGE_SQL,
        "customers_lost_since_1995": timeseries.CUSTOMERS_LOST_SQL,
        "entity_union_directory": timeseries.ENTITY_UNION_SQL,
        "user_longest_streak": timeseries.USER_LONGEST_STREAK_SQL,
        # same oracle: the window twin must produce the identical answer
        "user_longest_streak_window": timeseries.USER_LONGEST_STREAK_SQL,
        "user_retention_cohorts": timeseries.USER_RETENTION_SQL,
        "events_hourly_gapfilled": timeseries.EVENTS_GAPFILL_SQL,
        "event_volume_anomalies": timeseries.EVENT_VOLUME_ANOMALIES_SQL,
        "event_markov_transitions":
            timeseries.EVENT_MARKOV_TRANSITIONS_SQL,
        "session_funnel": timeseries.SESSION_FUNNEL_SQL,
        "dedup_exact": dedup.EXACT_DEDUP_SQL,
        "dedup_ngram_jaccard": dedup.NGRAM_JACCARD_SQL,
        "minhash_signatures": dedup.MINHASH_SIGNATURES_SQL,
        "minhash_lsh_candidates": dedup.MINHASH_LSH_SQL,
        "simhash_fingerprints": dedup.SIMHASH_SQL,
        "dedup_components": dedup.DEDUP_COMPONENTS_SQL,
        "dedup_graph_pagerank": dedup.DEDUP_GRAPH_PAGERANK_SQL,
        "lsh_quality_eval": dedup.LSH_QUALITY_EVAL_SQL,
        "dedup_reduction_report": dedup.DEDUP_REDUCTION_REPORT_SQL,
        "knn_bruteforce": similarity.KNN_BRUTEFORCE_SQL,
        "ann_sign_lsh": similarity.ANN_SIGN_LSH_SQL,
        "ann_sign_lsh_multiprobe": similarity.ANN_SIGN_LSH_MULTIPROBE_SQL,
        "ann_ivf": similarity.ANN_IVF_SQL,
        "ann_random_projection": similarity.ANN_RANDOM_PROJECTION_SQL,
        "embedding_near_dup_pairs": similarity.EMBEDDING_NEAR_DUP_SQL,
        "semdedup_keep": similarity.SEMDEDUP_KEEP_SQL,
        "ann_ivf_pq": similarity.ANN_IVF_PQ_SQL,
        "ivf_pq_recall_eval": similarity.IVF_PQ_RECALL_EVAL_SQL,
        "ann_ivf_pq_refined": similarity.ANN_IVF_PQ_REFINED_SQL,
        "label_centroids": similarity.LABEL_CENTROIDS_SQL,
        "kmeans_refine": similarity.KMEANS_REFINE_SQL,
        "embedding_norm_stats": similarity.EMBEDDING_NORM_STATS_SQL,
        "embedding_outliers": similarity.EMBEDDING_OUTLIERS_SQL,
        "doc_chunks": textprep.DOC_CHUNKS_SQL,
        "tfidf_top_terms": textprep.TFIDF_TOP_TERMS_SQL,
        "stratified_sample_by_lang": textprep.STRATIFIED_SAMPLE_SQL,
        "weighted_sample_by_lang": textprep.WEIGHTED_SAMPLE_SQL,
        "fuzzy_name_pairs": textprep.FUZZY_NAME_PAIRS_SQL,
        "bpe_merge_candidates": textprep.BPE_MERGE_CANDIDATES_SQL,
        "chunk_dedup": textprep.CHUNK_DEDUP_SQL,
        "nfc_normalized_hashes": textprep.NFC_NORMALIZED_HASHES_SQL,
        "language_id": quality.LANGUAGE_ID_SQL,
        "quality_scores": quality.QUALITY_SCORES_SQL,
        "bpe_token_counts": quality.BPE_TOKEN_COUNTS_SQL,
        "doc_fingerprints": quality.DOC_FINGERPRINTS_SQL,
        "repetition_scores": quality.REPETITION_SCORES_SQL,
        "pii_redaction": quality.PII_REDACTION_SQL,
        "gopher_quality_flags": quality.GOPHER_QUALITY_FLAGS_SQL,
        "winnowing_fingerprints": quality.WINNOWING_FINGERPRINTS_SQL,
        "source_quality_summary": quality.SOURCE_QUALITY_SUMMARY_SQL,
        "quality_classifier_scores": quality.QUALITY_CLASSIFIER_SQL,
        "ngram_decontamination": contamination.NGRAM_DECONTAMINATION_SQL,
        "doc_length_quantiles": analyze.DOC_LENGTH_QUANTILES_SQL,
        "doc_length_quantile_sketch": analyze.DOC_LENGTH_QUANTILE_SKETCH_SQL,
        "label_text_profile": analyze.LABEL_TEXT_PROFILE_SQL,
        "surprisal_mixing_weights": selection.SURPRISAL_MIXING_WEIGHTS_SQL,
        "source_vocab_overlap": selection.SOURCE_VOCAB_OVERLAP_SQL,
        "dedup_graph_triangles": dedup.DEDUP_GRAPH_TRIANGLES_SQL,
        "matryoshka_recall": similarity.MATRYOSHKA_RECALL_SQL,
        "unimax_mixing_budgets": training.UNIMAX_MIXING_BUDGETS_SQL,
        "k_anonymity_audit": quality.K_ANONYMITY_AUDIT_SQL,
        "ccnet_perplexity_buckets": selection.CCNET_PERPLEXITY_BUCKETS_SQL,
        "curation_funnel": pipelines.CURATION_FUNNEL_SQL,
        "source_ngram_diversity": analyze.SOURCE_NGRAM_DIVERSITY_SQL,
        "encoding_audit": quality.ENCODING_AUDIT_SQL,
        "media_phash": multimodal_oracle.MEDIA_PHASH_SQL,
        "media_phash_near_dups":
            multimodal_oracle.MEDIA_PHASH_NEAR_DUPS_SQL,
        "media_audio_fingerprint":
            multimodal_oracle.MEDIA_AUDIO_FINGERPRINT_SQL,
        "media_audio_near_dups":
            multimodal_oracle.MEDIA_AUDIO_NEAR_DUPS_SQL,
        "media_animation_signatures":
            multimodal_oracle.MEDIA_ANIMATION_SIGNATURES_SQL,
        "media_animation_near_dups":
            multimodal_oracle.MEDIA_ANIMATION_NEAR_DUPS_SQL,
        "media_exif_gps_audit":
            multimodal_oracle.MEDIA_EXIF_GPS_AUDIT_SQL,
        "media_neardup_eval": multimodal_oracle.MEDIA_NEARDUP_EVAL_SQL,
        "parquet_footer_stats": analyze.PARQUET_FOOTER_STATS_SQL,
        "binary_hamming_recall": similarity.BINARY_HAMMING_RECALL_SQL,
        "pack_sequences_nosplit": training.PACK_SEQUENCES_NOSPLIT_SQL,
        "source_vocab_kmv_jaccard":
            selection.SOURCE_VOCAB_KMV_JACCARD_SQL,
        "readability_scores": quality.READABILITY_SCORES_SQL,
        "split_leakage_audit": training.SPLIT_LEAKAGE_AUDIT_SQL,
        "dup_cluster_histogram": dedup.DUP_CLUSTER_HISTOGRAM_SQL,
        "corpus_novelty_curve": analyze.CORPUS_NOVELTY_CURVE_SQL,
        "inverted_index": corpus_index.INVERTED_INDEX_SQL,
        "pmi_top_pairs": corpus_index.PMI_TOP_PAIRS_SQL,
        "zipf_token_stats": corpus_index.ZIPF_TOKEN_STATS_SQL,
        "phrase_search": corpus_index.PHRASE_SEARCH_SQL,
        "source_log_odds_terms": analyze.SOURCE_LOG_ODDS_TERMS_SQL,
        "source_length_ks": analyze.SOURCE_LENGTH_KS_SQL,
        "hybrid_search_rrf": selection.HYBRID_SEARCH_RRF_SQL,
        "join_key_skew": skew.JOIN_KEY_SKEW_SQL,
        "media_resize_checksums":
            multimodal_oracle.MEDIA_RESIZE_CHECKSUMS_SQL,
        "shard_assignments": training.SHARD_ASSIGNMENTS_SQL,
        "cross_source_dedup_candidates": dedup.CROSS_SOURCE_DEDUP_SQL,
        "pack_sequences": training.PACK_SEQUENCES_SQL,
        "train_val_test_split": training.TRAIN_VAL_TEST_SPLIT_SQL,
        "source_mixing_weights": training.SOURCE_MIXING_WEIGHTS_SQL,
        "token_budget_sample": training.TOKEN_BUDGET_SAMPLE_SQL,
        "dedup_canonical": training.DEDUP_CANONICAL_SQL,
        "corpus_version_diff": versioning.CORPUS_VERSION_DIFF_SQL,
        "incremental_dedup_candidates": versioning.INCREMENTAL_DEDUP_SQL,
        "events_profile": profiling.EVENTS_PROFILE_SQL,
        "orders_constraint_checks":
            profiling.ORDERS_CONSTRAINT_CHECKS_SQL,
        "embedding_drift_audit": similarity.EMBEDDING_DRIFT_AUDIT_SQL,
        "events_rolling_active_users":
            timeseries.EVENTS_ROLLING_ACTIVE_USERS_SQL,
        "part_affinity_rules": relational.PART_AFFINITY_RULES_SQL,
        "customer_rfm_segments": relational.CUSTOMER_RFM_SEGMENTS_SQL,
        "events_rolling_active_users_hll":
            timeseries.EVENTS_ROLLING_ACTIVE_USERS_HLL_SQL,
        "scd2_customer_history": versioning.SCD2_CUSTOMER_HISTORY_SQL,
        "conversion_time_quantiles":
            timeseries.CONVERSION_TIME_QUANTILES_SQL,
        "language_id_confusion": quality.LANGUAGE_ID_CONFUSION_SQL,
        "supplier_concentration_hhi":
            relational.SUPPLIER_CONCENTRATION_HHI_SQL,
        "orders_monthly_growth":
            timeseries.ORDERS_MONTHLY_GROWTH_SQL,
        "embedding_similarity_histogram":
            similarity.EMBEDDING_SIMILARITY_HISTOGRAM_SQL,
        "customer_revenue_pareto":
            relational.CUSTOMER_REVENUE_PARETO_SQL,
        "char_entropy_scores": quality.CHAR_ENTROPY_SCORES_SQL,
        "source_boilerplate_ngrams": analyze.SOURCE_BOILERPLATE_NGRAMS_SQL,
        "corpus_integrity_audit": analyze.CORPUS_INTEGRITY_AUDIT_SQL,
    }
