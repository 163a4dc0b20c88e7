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
# Rotation rationale (which rows rotated out when, and which window row
# inherits each op class) lives in README.md §"Official-window rotation
# history" — this set is the CURRENT contract only.
FAMILY_REPRESENTATIVES = {
    # §2 core
    "session_agg", "session_stats", "session_filter", "session_detail",
    "hour_histogram", "stratified_sample", "top10_category",
    "top10_session_per_category", "area_top3", "funnel",
    # streaming batch oracle (§2.11)
    "stream_blacklist",
    # behavior analytics
    "survival_churn_hazard", "shapley_attribution",
    "window_funnel_steps",
    # scalar + set ops (§2.7/2.8)
    "scalar_functions", "set_ops_users",
    # dedup: all four candidate-generation strategies + components +
    # spans + decontamination
    "sorted_neighborhood_dedup", "dedup_minhash_lsh", "ppjoin_jaccard",
    "dedup_containment_capped", "dedup_components",
    "exact_substring_spans", "decontaminate_scrub",
    # ANN / retrieval / selection
    "retrieval_eval_ndcg", "ann_ivfpq_topk", "pq_index_refresh",
    "coreset_kcenter",
    # text analysis / trained LMs / tokenizers
    "bm25_rank", "kneser_ney_perplexity", "vocab_coverage_estimate",
    "bpe_vocab_train", "unigram_lm_vocab",
    # multimodal
    "multimodal_phash_neardup",
    # corpus / temporal / statistics / drift / trained linkage
    "corpus_pipeline", "conformal_forecast_interval",
    "wasserstein_source_drift",
    "sprt_conversion_monitor", "fellegi_sunter_em", "dq_checks",
    # sampling-sharding / graph / model eval
    "nb_lang_confusion", "pagerank_trade_graph",
    "betweenness_centrality", "isotonic_calibration",
    # OLAP extras
    "scd2_asof_enrich", "incremental_agg_maintenance",
    "incremental_join_maintenance", "rolling_distinct_users",
    "skew_safe_event_totals", "quantile_summary_rollup",
    "join_order_advisor",
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


def test_readme_battery_count_matches_shipped_registry():
    """Rounds 8 and 9 both shipped operators AFTER the close battery, so
    README froze a stale count (283 recorded vs 285 shipped in round 9).
    Pin the record to the code: the registry size README's battery
    paragraph claims must equal the registry this package registers. Any
    post-battery operator addition fails this test until the battery is
    re-run and the record updated (round-9 verdict item 1)."""
    import re

    from log_analysis_system_spark.queries import QUERIES

    load_all()
    with open("README.md") as f:
        text = f.read()
    m = re.search(r"the full registry \((\d+) queries as of round", text)
    assert m, "README battery paragraph missing its registry count"
    recorded = int(m.group(1))
    assert recorded == len(QUERIES), (
        f"README battery record says {recorded} queries but the shipped "
        f"registry has {len(QUERIES)} — re-run scripts/round_close.sh on "
        f"the final code and update the record in the same commit"
    )
