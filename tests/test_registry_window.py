"""The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()``. Pin that window: exactly 50 priority names,
all registered, all with oracles, and one representative per operator
family so no SURVEY.md §2 or extension family lacks an official row.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from log_analysis_system_spark.queries import ORACLES, PRIORITY, load_all

WINDOW = 50

# One representative per family that MUST sit inside the driver's window.
FAMILY_REPRESENTATIVES = {
    # §2 core
    "session_agg", "session_stats", "session_filter", "session_detail",
    "hour_histogram", "stratified_sample", "top10_category",
    "top10_session_per_category", "area_top3", "funnel",
    # streaming batch oracles (§2.11) — top3/sliding rotated out round 3,
    # cumulative round 6 (streaming pytest suite + driver_sim cover them)
    "stream_blacklist",
    # behavior analytics family (event_transitions rotated out round 6 —
    # lag-window shape also exercised by funnel + analytic_functions;
    # cohort_retention rotated out round 8 — the survival row reads the
    # same per-customer order-date sequence and strictly extends it with
    # censoring + risk sets; driver_sim + pytest + bench keep it)
    "survival_churn_hazard",
    # scalar + set ops (§2.7/2.8)
    "scalar_functions", "set_ops_users",
    # dedup family (simhash/ngram_jaccard rotated out round 6: banded
    # signatures stay covered by dedup_minhash_lsh, the capped
    # pair_overlap_stats path by dedup_containment_capped; round 7 adds
    # the PPJoin prefix-filter candidate strategy)
    # dedup_exact rotated out round 8 — the md5 hash-agg distinct shape
    # runs inside corpus_pipeline's window row; the slot passes to
    # sorted-neighborhood blocking, the fourth candidate-generation
    # strategy (sort-order windows)
    "sorted_neighborhood_dedup", "dedup_minhash_lsh", "dedup_components",
    "ppjoin_jaccard",
    # ANN family (ann_lsh_topk rotated out round 3 — LSH banding stays
    # officially covered by dedup_minhash_lsh + embedding_near_dup;
    # ann_ivf_trained_topk rotated out late round 6 — its trained coarse
    # quantizer runs inside ann_ivfpq_topk; ann_pq_topk round 7 — flat-PQ
    # training/ADC runs inside ann_ivfpq_topk + pq_index_refresh;
    # ann_brute_topk late round 7 — the brute truth kernel runs inside
    # retrieval_eval_ndcg, which scores it with NDCG/MRR on top)
    "retrieval_eval_ndcg",
    "embedding_near_dup",
    # round-6 ANN additions: the IVF-PQ composition and the
    # staleness-triggered index refresh (both verdict oracles)
    "ann_ivfpq_topk", "pq_index_refresh",
    # text analysis + data quality drift (tfidf/doc_rarity rotated out
    # round 3 for the BM25 / PSI op classes; doc_fingerprint round 7 —
    # rolling-hash shape covered by winnow_overlap — for the trained-LM
    # Kneser-Ney perplexity class)
    "text_metrics", "bm25_rank", "kneser_ney_perplexity", "drift_psi",
    # multimodal / corpus / temporal / sampling / graph / data quality
    # (resample_hourly_dense rotated out round 3; multimodal_frames round 6
    # — decode exercises the same mapInPandas plumbing plus a real codec;
    # sim + pytest cover both)
    # gap_sessions_events rotated out late round 6 (lag+cumsum shape also
    # exercised by funnel + session_agg); the temporal row passes to the
    # rolling-origin MASE backtest, and the graph family gains the
    # label-propagation community row beside pagerank
    # (multimodal_decode rotated out round 7 — the pHash near-dup row
    # composes the same PPM decode + mapInPandas plumbing with a DCT
    # hash and banded Hamming join)
    # multimodal_audio rotated out round 8 — the mapInPandas codec
    # plumbing keeps its row via multimodal_phash_neardup; the WAV parser
    # stays pinned byte-exact in pytest + driver_sim + bench
    "multimodal_phash_neardup",
    # forecast_backtest_mase rotated out round 8 — the temporal slots
    # pass to split-conformal intervals (uncertainty eval) and STL-lite
    # decomposition (series modeling); MASE stays in driver_sim + pytest
    # + bench. sample_weighted_docs rotated out round 8 — weighted A-res
    # sampling stays covered by stratified_sample + driver_sim; the slot
    # passes to the Poisson bootstrap (resampling INFERENCE).
    "corpus_pipeline", "conformal_forecast_interval",
    "seasonal_decompose_daily",
    "dq_checks", "bootstrap_revenue_ci", "balanced_shards",
    "pagerank_trade_graph",
    # label_propagation_communities rotated out late round 8 (LPA rounds
    # stay pinned by pytest + driver_sim + bench); the graph slot passes
    # to the neighborhood-scoring link-prediction class
    "link_prediction_scores",
    # round-4 flagships (TPC-H important_parts / promo_revenue_share /
    # priority_by_line_status rotated out — redundant with Q1/Q3/Q5)
    "exact_substring_spans", "bpe_vocab_train",
    # round-5 flagships (TPC-H shipping_priority / local_supplier_volume /
    # pricing_summary rotated out — join+agg shapes redundant with the
    # session/OLAP rows and Q1's pushdown stays plan-gated; driver_sim +
    # pytest + bench keep them; score_correlation rotated out late round 7
    # — the exact-rank-statistic class passes to the Mann-Whitney ROC-AUC
    # row, whose histogram+prefix-sum shape is the scale path)
    "discriminator_auc", "dedup_containment_capped", "unigram_lm_vocab",
    # round-6 flagships: the decontamination pipeline end-to-end
    "decontaminate_spans", "decontaminate_scrub",
    # OLAP extras (round 7: asof_join_orders → scd2_asof_enrich, same
    # as-of class with interval validity; rollup_lineitem → incremental_
    # agg_maintenance, the IVM contract — rollup stays covered by
    # hypertable_rollup; late round 7: value_percentiles → rolling_
    # distinct_users — the non-decomposable sliding-distinct class had no
    # row, exact percentiles stay via quantile_transform + bench;
    # analytic_functions → coreset_kcenter — window surface exercised by
    # the rank/lag windows in the session/topn/scd2 rows, the iterative
    # data-selection class had none)
    "scd2_asof_enrich", "incremental_agg_maintenance",
    "rolling_distinct_users",
    # pivot_event_matrix rotated out late round 8 (the conditional-agg
    # reshape is witnessed by session_stats' A3 histogram row; driver_sim
    # + pytest keep it); the slot passes to the absorbing-chain
    # attribution class
    "markov_attribution",
    "coreset_kcenter", "range_join_events",
    "skew_safe_event_totals", "hypertable_rollup",
}


def test_priority_is_exactly_the_window():
    assert len(PRIORITY) == WINDOW
    assert len(set(PRIORITY)) == WINDOW


def test_window_covers_every_family():
    missing = FAMILY_REPRESENTATIVES - set(PRIORITY)
    assert not missing, f"families with no official correctness row: {missing}"


def test_entry_order_puts_priority_first_with_oracles():
    load_all()
    names = list(entrymod.queries())
    assert names[:WINDOW] == list(PRIORITY)
    no_oracle = [n for n in names[:WINDOW] if n not in ORACLES]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"
    # oracle ordering must match query ordering for the driver's zip
    assert list(entrymod.oracle_sql())[:WINDOW] == list(PRIORITY)
