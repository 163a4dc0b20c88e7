"""Empty-corpus robustness: every behavior/DQ/graph/training query must
return a well-formed (possibly 0-row) DataFrame on 0-row inputs, never
raise — the round-2 advisory found exactly this failure mode in the
embedding near-dup block walker."""

from __future__ import annotations

import pytest

from log_analysis_system_spark.queries import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()

EMPTY_SAFE_QUERIES = [
    "cohort_retention",
    "event_transitions",
    "robust_outlier_events",
    "term_cooccurrence",
    "rfm_segments",
    "session_path_topk",
    "key_skew_profile",
    "timed_funnel",
    "triangle_count_terms",
    "pack_sequences",
    "quality_deciles",
    "source_mixture_weights",
    "dq_checks",
    "dq_profile_lineitem",
    "mixture_schedule",
    "chunk_documents",
    "training_manifest",
    "incremental_dedup_delta",
    "winnow_overlap",
    "source_curation_report",
    "countmin_terms",
    "embedding_near_dup",
    # round-3 additions
    "cdc_apply_changelog",
    "ts_similarity_topk",
    "bm25_rank",
    "hybrid_rrf_topk",
    "drift_psi",
    "hashed_features",
    "ann_pq_topk",
    "trade_reach_hops",
    # round-4 additions (BPE queries are deliberately absent: training on
    # an empty corpus raises a documented ValueError instead of silently
    # emitting an empty merge table)
    "exact_substring_spans",
    "substring_span_scrub",
    "multimodal_decode",
    "bigram_lm_perplexity",
    "multimodal_audio",
    "multimodal_video",
    "multimodal_resize",
    "dedup_containment",
    "source_overlap_matrix",
    "bot_regularity_score",
    "corpus_dup_profile",
    # round-5 additions
    "decontaminate_spans",
    "dedup_containment_capped",
    "score_correlation",
    "unigram_lm_segment_stats",
    "temperature_mixture_weights",
    "ngram_diversity",
    "dedup_keep_best",
    "zorder_skipping_stats",
    # round-6 additions
    "decontaminate_scrub",
    "ann_ivfpq_topk",
    "pq_index_refresh",
    "perplexity_band_filter",
    "dsir_importance_resample",
    "ann_sq8_topk",
    "excess_loss_mixture_weights",
    "gopher_quality_rules",
    "leak_free_split",
    "contamination_by_source",
    "epoch_shuffle_manifest",
    "quality_discriminator",
    "matryoshka_recall_audit",
    "mad_outlier_days",
    "shard_integrity_manifest",
    "fuzzy_customer_pairs",
    "frequent_event_triples",
    "bloom_membership_audit",
    "modality_integrity_checks",
    "salted_skew_join",
    "kneser_ney_perplexity",
    "pca_top_component",
    "jl_projection_audit",
    "dataset_cartography",
    "ppjoin_jaccard",
    "ppjoin_prune_audit",
    "unimax_mixture_allocation",
    "scd2_dimension_build",
    "scd2_asof_enrich",
    "multimodal_phash_neardup",
    "length_bucket_batching",
    "incremental_agg_maintenance",
    "label_propagation_communities",
    "forecast_backtest_mase",
    "dedup_simhash_neardup",
    "pareto_price_size_frontier",
    "hll_precision_curve",
    "dedup_method_agreement",
    # round-7 additions
    "mmr_diversified_topk",
    "point_in_time_features",
    "calibration_ece",
    "discriminator_auc",
    "discriminator_group_fairness",
    "l_diversity_audit",
    "kcore_trade_graph",
    "hits_trade_graph",
    "rolling_distinct_users",
    "weighted_value_percentiles",
    "cuped_adjusted_lift",
    "t_closeness_audit",
    # round-8 additions
    "survival_churn_hazard",
    "seasonal_decompose_daily",
    "conformal_forecast_interval",
    "grouped_ols_two_factor",
    "winsorized_price_stats",
    "bootstrap_revenue_ci",
    "sorted_neighborhood_dedup",
    "sprt_conversion_monitor",
    "zipf_law_fit",
    "xmr_control_chart",
    # on empty input the 2x2 sums are all NULL, which propagates through
    # the cell-mean divisions to a well-formed 1-row all-NULL readout
    "diff_in_diff_lift",
    "theil_sen_trend",
    "mann_kendall_trend",
    "acf_daily_revenue",
    "supplier_attr_counts",
    "link_prediction_scores",
    "compaction_plan",
    "eb_shrunk_quality",
    "isotonic_calibration",
    "join_cardinality_estimate",
    "source_influence_jackknife",
    "markov_attribution",
    "mutual_information_features",
    "rendezvous_sharding",
    "peak_concurrency",
    "vocab_coverage_estimate",
    # round-9 additions
    "textrank_keywords",
    "fellegi_sunter_em",
    "table_stats_analyze",
    "betweenness_centrality",
    "wasserstein_source_drift",
    "rbo_rank_agreement",
    "quantile_summary_rollup",
    "incremental_join_maintenance",
    # round-10 additions
    "shapley_attribution",
    "window_funnel_steps",
    "item_cf_recs",
    "grid_dbscan_clusters",
    "bloom_prefiltered_join",
    "nb_lang_confusion",
    "join_order_advisor",
    "propensity_stratified_att",
    "gini_stump_conversion",
    "ipf_margin_raking",
    "degree_assortativity",
    # round-10 second wave
    "ams_f2_estimate",
    "modularity_communities",
    "randomized_response_rate",
    "rake_keywords",
    "aqp_revenue_estimate",
    "holt_winters_daily",
    "croston_demand_forecast",
    "burst_detection_days",
]
# NOT empty-safe by design: tokenizer_fertility_audit trains BPE merges
# first, and train_bpe raises on a corpus with no mergeable pairs (the
# documented bpe_vocab_train contract) — an empty corpus hits that gate.
# wordpiece_vocab_train shares the contract (train_wordpiece raises the
# same loud ValueError instead of emitting an empty merge table).


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in ("events", "documents", "lineitem", "orders", "customer",
              "embeddings", "supplier", "nation", "region", "part"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE_QUERIES)
def test_query_survives_empty_input(spark, empty_dir, name):
    df = QUERIES[name](spark, empty_dir)
    rows = df.collect()  # must not raise
    assert rows is not None
    assert df.columns  # schema survives


def test_markov_attribution_empty_matches_oracle_shape(spark, empty_dir):
    """On 0-row events the oracle's full_p CTE is empty, so its final
    CROSS JOIN emits 0 rows — the engine must NOT emit 4 all-zero
    channel rows (round-8 advice item: shape, not just no-raise)."""
    rows = QUERIES["markov_attribution"](spark, empty_dir).collect()
    assert rows == []
