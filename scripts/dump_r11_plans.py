"""Dump .explain("formatted") for the round-11 optimization targets to
plans/r11/<query>_<tag>.txt. Usage:

    python scripts/dump_r11_plans.py <tag> [query ...]

Run from a checkout whose code should be captured (a worktree pinned at
the round-10 close commit for the *_before.txt files, the working tree
for *_after.txt). The default query list is the set of registered
queries touched by round 11.
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
    "ann_brute_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivf_trained_topk",
    "semantic_clusters",
    "pq_index_refresh",
]


def main() -> None:
    load_all()
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-r11-{tag}")
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
