"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution to a count()-style action (collect for small
results), after a warm-up of the session (JVM + parquet footer caches are
shared, matching how a long-lived engine would serve queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.session import get_spark

# Headline set: the reference-parity jobs (BASELINE.md table) + heaviest
# extension operators.
BENCH_QUERIES = [
    "session_agg",
    "session_stats",
    "session_filter",
    "top10_category",
    "top10_session_per_category",
    "funnel",
    "area_top3",
    "stratified_sample",
    "pricing_summary",
    "stream_sliding_window",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "cube_revenue",
    "analytic_functions",
    "value_percentiles",
    "multimodal_frames",
    "shipping_priority",
    "local_supplier_volume",
    "range_join_events",
    "dedup_components",
    "tfidf_top_terms",
    "corpus_pipeline",
    "hypertable_rollup",
    "forecast_revenue",
    "promo_revenue_share",
    "big_orders",
    "text_normalize",
    "grouping_sets_revenue",
    "supplier_diversity",
]


def main() -> None:
    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once with a trivial job so query timings measure
    # the plan, not first-call setup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
