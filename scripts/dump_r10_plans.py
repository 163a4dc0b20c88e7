"""Dump .explain("formatted") for the round-10 optimization targets to
plans/r10/<query>_<tag>.txt. Usage:

    python scripts/dump_r10_plans.py <tag> [query ...]

Run from a checkout whose code should be captured (the HEAD worktree for
the *_before.txt files, the working tree for *_after.txt). The default
query list is the set of registered queries touched by round 10.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "semantic_clusters",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "pq_index_refresh",
    "bloom_prefiltered_join",
    "item_cf_recs",
    "term_cooccurrence",
    "textrank_keywords",
    "pagerank_trade_graph",
    "label_propagation_communities",
    "dedup_components",
    "winnow_overlap",
    "grid_dbscan_clusters",
]


def main() -> None:
    load_all()
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-r10-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.catalog.clearCache()
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
