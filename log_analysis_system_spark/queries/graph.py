"""Graph analytics: PageRank as iterative DataFrame joins with an exactly-
matching unrolled-SQL oracle. Together with `connected_components`
(dedup.py) this is the engine's iterative-algorithm surface — Spark has no
PySpark-usable GraphX, so the DataFrame formulation IS the production one.

Determinism: ranks live in integer micro-units and every per-edge
contribution is a floor division, so a fixed iteration count produces
bit-identical ranks on any engine and any partitioning — the floating-point
PageRank everyone writes first is neither (summation order changes results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

PR_ITERS = 3
PR_START = 1_000_000  # micro-units
SUPP_OFFSET = 10_000_000  # supplier node ids live above customer keys

_EDGES_SQL = f"""
    SELECT DISTINCT o.o_custkey AS src, {SUPP_OFFSET} + l.l_suppkey AS dst
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION
    SELECT DISTINCT {SUPP_OFFSET} + l.l_suppkey AS src, o.o_custkey AS dst
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
"""


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """Unroll the integer PageRank recurrence into chained CTEs — the same
    generated-SQL technique as the components and overlap oracles."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"pr0 AS (SELECT DISTINCT src AS node, CAST({PR_START} AS BIGINT) AS pr"
        " FROM edges)",
    ]
    for i in range(iters):
        ctes.append(
            f"pr{i + 1} AS ("
            f"SELECT e.dst AS node, "
            f"CAST(150000 + (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr "
            f"FROM edges e "
            f"JOIN pr{i} p ON p.node = e.src "
            f"JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM pr{iters}"
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer PageRank over a directed edge list (src, dst) where every
    node has at least one outgoing edge (build undirected graphs by
    doubling edges — no dangling-mass term needed then).

    Each round is one join (ranks onto edges) + one aggregate (sum of
    floored per-edge contributions) — two shuffles, the same shape GraphX's
    Pregel emits. ``localCheckpoint`` truncates lineage per round so the
    plan stays flat over any iteration count."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pr = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("pr", F.lit(PR_START).cast("long"))
        .localCheckpoint()
    )
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .select("dst", F.expr("pr div outdeg").alias("c"))
        )
        pr = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(
                F.expr("cast(150000 + (85 * sum(c)) div 100 as bigint)").alias(
                    "pr"
                )
            )
            .localCheckpoint()
        )
    return pr


@query("pagerank_trade_graph", oracle=_pagerank_oracle())
def q_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer<->supplier trade graph (edges = distinct
    trading pairs via lineitem x orders, doubled to undirected). {ITERS}
    synchronous rounds in exact integer micro-units; the oracle unrolls the
    identical recurrence as chained CTEs. Ranks surface hub suppliers and
    broadly-sourcing customers — the graph-centrality view of the same
    tables the TPC-H battery scans relationally."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).unionByName(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    return pagerank(edges)
