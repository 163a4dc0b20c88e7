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
from .behavior import COOC_MIN_DOCS, term_pair_edges

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
    plan stays flat over any iteration count. The degree join is
    loop-INVARIANT, so it is attached to the edge list once and
    checkpointed (round-10; the former in-loop form re-joined deg every
    round — guide §2.4), and checkpoints are lazy so each round is a
    single job materialized by the next round's action. The edge input
    itself is pinned first (round-11): `ed` and `pr0` both consume it,
    and when a caller passes an unmaterialized subtree (textrank's
    corpus-scan pair pipeline) the whole subtree re-executed once per
    consumer — measured 2.1 s of textrank's 3.6 s warm wall-clock."""
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    pr = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("pr", F.lit(PR_START).cast("long"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        contrib = ed.join(pr, ed.src == pr.node).select(
            "dst", F.expr("pr div outdeg").alias("c")
        )
        pr = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(
                F.expr("cast(150000 + (85 * sum(c)) div 100 as bigint)").alias(
                    "pr"
                )
            )
            .localCheckpoint(eager=False)
        )
    return pr


_TRI_ORACLE = """
WITH t AS (
    SELECT DISTINCT doc_id, u.term
    FROM documents, unnest(string_split(text, ' ')) AS u(term)
    WHERE u.term <> ''
),
p AS (
    SELECT a.term AS ta, b.term AS tb
    FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2 HAVING count(*) >= {min_docs}
),
deg AS (
    SELECT term, count(*) AS d
    FROM (SELECT ta AS term FROM p UNION ALL SELECT tb FROM p)
    GROUP BY 1
),
o AS (
    SELECT CASE WHEN (da.d, p.ta) < (db.d, p.tb) THEN p.ta ELSE p.tb END AS src,
           CASE WHEN (da.d, p.ta) < (db.d, p.tb) THEN p.tb ELSE p.ta END AS dst
    FROM p JOIN deg da ON da.term = p.ta JOIN deg db ON db.term = p.tb
),
tri AS (
    SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
    FROM o o1
    JOIN o o2 ON o2.src = o1.src AND o1.dst < o2.dst
    JOIN p ON p.ta = least(o1.dst, o2.dst) AND p.tb = greatest(o1.dst, o2.dst)
)
SELECT term, count(*) AS n_triangles
FROM (SELECT a AS term FROM tri UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY 1
"""


@query("triangle_count_terms", oracle=_TRI_ORACLE.format(min_docs=COOC_MIN_DOCS))
def q_triangle_count_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the term co-occurrence graph (edges =
    canonical term pairs sharing >= COOC_MIN_DOCS documents, from
    behavior.term_pair_edges) — the clustering-coefficient numerator, and
    the second member of the iterative/graph family beside PageRank.

    Algorithm: degree orientation. Each undirected edge is directed from
    its lower-(degree, term) endpoint; the resulting DAG gives every
    triangle exactly one vertex with two out-edges, so one self-join on the
    source (wedges, the out-neighbor pair ordered by term to count once)
    plus one closure join against the canonical edge list counts each
    triangle exactly once. Degree orientation is THE distributed-triangle
    trick: it bounds every vertex's out-degree by O(sqrt(|E|)), so the
    wedge join's per-key fan-out — the step that explodes on skewed hub
    nodes under naive orientation — stays bounded at any scale. Plans as
    three shuffle joins on term keys; the oracle expresses the identical
    orientation so both engines count the same triangles.
    """
    p = term_pair_edges(spark, sf_dir).select("term_a", "term_b")
    deg = (
        p.select(F.col("term_a").alias("term"))
        .unionAll(p.select(F.col("term_b").alias("term")))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("term").alias("term_a"), F.col("d").alias("da"))
    db = deg.select(F.col("term").alias("term_b"), F.col("d").alias("db"))
    keyed = p.join(da, "term_a").join(db, "term_b")
    a_first = F.struct("da", "term_a") < F.struct("db", "term_b")
    o = keyed.select(
        F.when(a_first, F.col("term_a")).otherwise(F.col("term_b")).alias("src"),
        F.when(a_first, F.col("term_b")).otherwise(F.col("term_a")).alias("dst"),
    )
    o1 = o.select(F.col("src"), F.col("dst").alias("b"))
    o2 = o.select(F.col("src"), F.col("dst").alias("c"))
    wedges = o1.join(o2, "src").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        p,
        (F.col("term_a") == F.least("b", "c"))
        & (F.col("term_b") == F.greatest("b", "c")),
    ).select("src", "b", "c")
    corners = (
        closed.select(F.col("src").alias("term"))
        .unionAll(closed.select(F.col("b").alias("term")))
        .unionAll(closed.select(F.col("c").alias("term")))
    )
    return corners.groupBy("term").agg(F.count(F.lit(1)).alias("n_triangles"))


@query("pagerank_trade_graph", oracle=_pagerank_oracle())
def q_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer<->supplier trade graph (edges = distinct
    trading pairs via lineitem x orders, doubled to undirected). {ITERS}
    synchronous rounds in exact integer micro-units; the oracle unrolls the
    identical recurrence as chained CTEs. Ranks surface hub suppliers and
    broadly-sourcing customers — the graph-centrality view of the same
    tables the TPC-H battery scans relationally."""
    return pagerank(trade_edges(spark, sf_dir))


# --------------------------------------------- recursive-CTE reachability

REACH_FANOUT = 2   # keep each nation's top-2 trade partners as edges
REACH_MAX_HOPS = 4

# ONE SQL text executed verbatim by BOTH engines (Spark 4 ships recursive
# CTEs; DuckDB always had them) — the strongest cross-engine contract in
# the repo: not just equal results, the same query. The UNION ALL
# recursion enumerates paths, so the edge set is kept sparse (top-K
# partners per nation) and depth-bounded — path count <= n_nations *
# FANOUT^MAX_HOPS regardless of data volume; min(hops) collapses paths to
# BFS distances.
REACH_SQL = f"""
WITH RECURSIVE
trades AS (
    SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS n
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
),
edges AS (
    SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY n DESC, dst) AS rk
        FROM trades
    ) t WHERE rk <= {REACH_FANOUT}
),
reach(src, dst, hops) AS (
    SELECT src, dst, 1 AS hops FROM edges
    UNION ALL
    SELECT r.src, e.dst, r.hops + 1 AS hops
    FROM reach r JOIN edges e ON e.src = r.dst
    WHERE r.hops < {REACH_MAX_HOPS}
)
SELECT src AS src_nation, dst AS dst_nation,
       CAST(min(hops) AS BIGINT) AS hops
FROM reach
WHERE src <> dst
GROUP BY src, dst
"""


@query("trade_reach_hops", oracle=REACH_SQL)
def q_trade_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-hop distances over the nation trade graph via a
    RECURSIVE CTE — the declarative twin of the imperative iterative
    operators (pagerank's Python loop, connected_components'
    convergence-checked rounds). Edges = each nation's top-{REACH_FANOUT}
    partner nations by trade count (sparse by construction), recursion
    depth-capped at {REACH_MAX_HOPS}; min(hops) over enumerated paths
    gives BFS distance.

    The oracle is not a re-implementation: `REACH_SQL` is executed
    VERBATIM by Spark (which ships recursive CTEs since 4.0) and DuckDB,
    over the same registered views. At scale the recursion's working set
    is the bounded edge/path frontier, never the fact table — lineitem is
    touched once in the seed aggregate."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(REACH_SQL)


# ------------------------------------------------ personalized PageRank

PPR_SEED_NATION = "GERMANY"
PPR_TELEPORT = (15 * PR_START) // 100  # per-round seed teleport, micro-units

_PPR_SEEDS_SQL = f"""
    SELECT DISTINCT e.src AS node
    FROM ({_EDGES_SQL}) e
    JOIN customer c ON c.c_custkey = e.src
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE e.src < {SUPP_OFFSET} AND n.n_name = '{PPR_SEED_NATION}'
"""


def _ppr_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled personalized-PageRank recurrence: teleport mass lands ONLY
    on the seed set (rank = relevance TO the seeds), start mass on seeds."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        f"seeds AS ({_PPR_SEEDS_SQL})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"pr0 AS (SELECT nd.node, CAST(CASE WHEN s.node IS NULL THEN 0 "
        f"ELSE {PR_START} END AS BIGINT) AS pr "
        f"FROM nodes nd LEFT JOIN seeds s ON s.node = nd.node)",
    ]
    for i in range(iters):
        ctes.append(
            f"pr{i + 1} AS ("
            f"SELECT e.dst AS node, "
            f"CAST(CASE WHEN s.node IS NULL THEN 0 ELSE {PPR_TELEPORT} END "
            f"+ (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr "
            f"FROM edges e "
            f"JOIN pr{i} p ON p.node = e.src "
            f"JOIN deg d ON d.src = e.src "
            f"LEFT JOIN seeds s ON s.node = e.dst "
            f"GROUP BY e.dst, s.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM pr{iters}"


def personalized_pagerank(
    edges: DataFrame, seeds: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """Integer personalized PageRank: identical recurrence to `pagerank`
    except the teleport term lands only on ``seeds`` (node), so ranks
    measure relevance TO the seed set (random walk with restart). Same
    two-shuffle round shape + localCheckpoint lineage truncation; the
    doubled-undirected-edges requirement guarantees every node receives
    flow, so the teleport join is a plain inner join on the round's agg.
    The degree join is hoisted out of the loop and checkpoints are lazy,
    mirroring `pagerank`'s round-10 shape."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    seeded = nodes.join(
        seeds.select("node").withColumn("is_seed", F.lit(1)), "node", "left"
    )
    pr = seeded.select(
        "node",
        F.when(F.col("is_seed") == 1, PR_START)
        .otherwise(0)
        .cast("long")
        .alias("pr"),
    ).localCheckpoint(eager=False)
    tp = seeded.select(
        "node",
        F.when(F.col("is_seed") == 1, PPR_TELEPORT)
        .otherwise(0)
        .cast("long")
        .alias("tp"),
    ).localCheckpoint(eager=False)
    for _ in range(iters):
        contrib = ed.join(pr, ed.src == pr.node).select(
            "dst", F.expr("pr div outdeg").alias("c")
        )
        flow = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.expr("cast((85 * sum(c)) div 100 as bigint)").alias("flow")
        )
        pr = (
            flow.join(tp, "node")
            .select("node", (F.col("tp") + F.col("flow")).alias("pr"))
            .localCheckpoint(eager=False)
        )
    return pr


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubled-undirected customer<->supplier edge list (src, dst): distinct
    trading pairs via lineitem x orders, supplier ids offset above customer
    keys. The shared graph every iterative operator here walks — matches
    ``_EDGES_SQL`` exactly."""
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
    return pairs.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).unionByName(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


@query("personalized_pagerank_trade", oracle=_ppr_oracle())
def q_personalized_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk-with-restart relevance over the customer<->supplier
    trade graph, personalized to {PPR_SEED_NATION}'s customers: teleport
    mass lands only on the seed set, so high-rank suppliers are the ones
    structurally closest to that market — the 'suppliers similar to what
    GERMANY buys from' recommendation view, where global `pagerank` would
    just surface overall hubs. Integer micro-unit recurrence (floor-div
    per-edge contributions), fixed {PR_ITERS} rounds, unrolled-CTE oracle
    — the established exact-iterative contract."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    edges = trade_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") < SUPP_OFFSET)
        .distinct()
        .join(
            F.broadcast(
                c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                .where(F.col("n_name") == PPR_SEED_NATION)
                .select(F.col("c_custkey").alias("node"))
            ),
            "node",
        )
    )
    return personalized_pagerank(edges, seeds)


# ------------------------------------------ label propagation communities

LPA_ITERS = 3
LPA_FANOUT = 2  # keep each customer's top-2 suppliers as community edges
# Priority encoding base for the (count DESC, label ASC) vote argmax: must
# exceed every node id (customer keys and SUPP_OFFSET + supplier keys both
# stay far below it at test scale; raise alongside SUPP_OFFSET for larger
# key spaces). count * LPA_ENC stays well inside int64 up to degrees ~9e10.
LPA_ENC = 100_000_000

# Sparse affinity edges: each customer keeps its top-LPA_FANOUT suppliers
# by trade count (ties to the smaller key), doubled to undirected. On the
# full bipartite trade graph LPA collapses into one giant community within
# a round or two (everything trades with everything); the strongest-partner
# subgraph is where the market-segment structure actually lives — the same
# sparsification REACH_SQL applies to the nation graph.
_LPA_EDGES_SQL = f"""
    SELECT cust AS src, supp AS dst FROM (
        SELECT cust, supp,
               row_number() OVER (PARTITION BY cust
                                  ORDER BY n DESC, supp) AS rk
        FROM (SELECT o.o_custkey AS cust,
                     {SUPP_OFFSET} + l.l_suppkey AS supp,
                     count(*) AS n
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              GROUP BY 1, 2) t
    ) r WHERE rk <= {LPA_FANOUT}
"""


def _lpa_ctes(iters: int = LPA_ITERS, self_votes: bool = False) -> list[str]:
    """The unrolled synchronous label-propagation recurrence as chained
    CTEs (edge selection, doubling, iters vote rounds) — shared by the
    LPA oracle and the modularity oracle. The per-node argmax over
    (vote count DESC, label ASC) is encoded as
    max(count * LPA_ENC - label) — a single integer max both engines
    evaluate identically, no window needed. ``self_votes`` adds one
    self-loop vote per node to the recurrence (the modularity row's
    oscillation fix; scoring still uses the real edges)."""
    ctes = [
        f"sel AS ({_LPA_EDGES_SQL})",
        "edges AS (SELECT src, dst FROM sel"
        " UNION ALL SELECT dst AS src, src AS dst FROM sel)",
        "lp0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    vote_edges = "edges"
    if self_votes:
        ctes.append(
            "vedges AS (SELECT src, dst FROM edges"
            " UNION ALL SELECT DISTINCT src, src AS dst FROM edges)"
        )
        vote_edges = "vedges"
    for i in range(iters):
        ctes.append(
            f"lp{i + 1} AS ("
            f"SELECT node, CAST((max(p) // {LPA_ENC} + 1) * {LPA_ENC} "
            f"- max(p) - 1 AS BIGINT) AS label "
            f"FROM (SELECT e.dst AS node, "
            f"count(*) * {LPA_ENC} - l.label - 1 AS p "
            f"FROM {vote_edges} e JOIN lp{i} l ON l.node = e.src "
            f"GROUP BY e.dst, l.label) v{i} "
            f"GROUP BY node)"
        )
    return ctes


def _lpa_oracle(iters: int = LPA_ITERS) -> str:
    return (
        "WITH "
        + ",\n".join(_lpa_ctes(iters))
        + f"""
SELECT label AS community, count(*) AS n_members,
       CAST(sum(CASE WHEN node < {SUPP_OFFSET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN node >= {SUPP_OFFSET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_suppliers
FROM lp{iters} GROUP BY label"""
    )


def lpa_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubled-undirected strongest-partner edge list (src, dst) — each
    customer keeps its top-LPA_FANOUT suppliers by trade count (the
    `_LPA_EDGES_SQL` selection), doubled for undirected propagation and
    materialized once: every LPA round joins against it, and without
    the checkpoint the lineitem x orders join + top-K window re-executes
    per round (measured 7.5 s vs ~3 s at bench scale). Shared by
    `label_propagation_communities` and `modularity_communities`."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    trades = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("supp"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cust").orderBy(F.desc("n"), F.asc("supp"))
    sel = (
        trades.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= LPA_FANOUT)
        .select("cust", "supp")
    )
    return (
        sel.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionByName(
            sel.select(
                F.col("supp").alias("src"), F.col("cust").alias("dst")
            )
        )
        .localCheckpoint()
    )


def label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """Synchronous label propagation over a doubled-undirected edge list
    (src, dst): every node starts labeled with its own id; each round every
    node adopts its neighbors' most frequent label, ties broken toward the
    smallest label. Deterministic by construction — the async/randomized
    LPA in the literature is not, which is why the sync variant is the one
    a reproducible pipeline ships.

    Each round is one join (labels onto edges) + one (dst, label) vote
    count + one per-dst integer max — the same two-shuffle round shape as
    `pagerank`, with the argmax folded into
    max(count * LPA_ENC - label - 1) so no per-round window or struct
    comparison is needed. The "- 1" shifts labels to [1, LPA_ENC] inside
    the encoding: without it, label 0 sits exactly on the count*LPA_ENC
    boundary and decodes to the PHANTOM label LPA_ENC instead of 0 —
    customer 0's community propagated under a node id that does not
    exist, a shared engine/oracle bug (both query texts used the same
    encoding) that the pure-Python modularity model pin caught in
    round 10.
    ``localCheckpoint`` truncates lineage per round. Returns (node, label)
    after ``iters`` rounds."""
    lab = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # The argmax encoding max(count * LPA_ENC - label) decodes correctly
    # only while every node id < LPA_ENC; a larger key space (e.g. a raised
    # SUPP_OFFSET) would silently corrupt labels. Fail loudly instead —
    # a 1-row scalar collect over the already-materialized label seed.
    max_node = lab.agg(F.max("node")).first()[0]
    if max_node is not None and max_node >= LPA_ENC:
        raise ValueError(
            f"label_propagation: max node id {max_node} >= LPA_ENC "
            f"{LPA_ENC}; raise LPA_ENC (keep count*LPA_ENC inside int64) "
            "so the integer argmax encoding stays decodable"
        )
    for _ in range(iters):
        votes = (
            edges.join(lab, edges.src == lab.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                "dst",
                (F.col("c") * LPA_ENC - F.col("label") - 1).alias("p"),
            )
        )
        lab = (
            votes.groupBy(F.col("dst").alias("node"))
            .agg(
                F.expr(
                    f"cast((max(p) div {LPA_ENC} + 1) * {LPA_ENC}"
                    f" - max(p) - 1 as bigint)"
                ).alias("label")
            )
            # lazy: each round materializes inside the next action's job
            # instead of paying an eager job barrier per round (round-10)
            .localCheckpoint(eager=False)
        )
    return lab


@query("label_propagation_communities", oracle=_lpa_oracle())
def q_label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Community detection over the strongest-partner trade graph via
    synchronous label propagation: each customer keeps its top-{LPA_FANOUT}
    suppliers by trade count (the sparsification that REACH_SQL applies to
    the nation graph — dense bipartite LPA degenerates to one giant
    community), then {LPA_ITERS} deterministic rounds (majority neighbor
    label, ties to the smallest), then a rollup of community sizes split by
    node side. Where `dedup_components` finds connectivity and
    `pagerank_trade_graph` finds hubs, this finds the market-segment
    structure in between — groups of customers sharing their primary
    suppliers.

    Scale: edge selection is one hash-agg + one per-customer window
    (partitioned, bounded top-K); per LPA round the working set is
    (edges x 1 label) -> (dst, label) vote counts, which hash-aggregate
    map-side before the shuffle; no driver data movement, lineage truncated
    per round. The final community rollup is one hash-agg over #nodes
    rows."""
    edges = lpa_edges(spark, sf_dir)
    lab = label_propagation(edges)
    return lab.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr(
            f"cast(sum(case when node < {SUPP_OFFSET} then 1 else 0 end)"
            f" as bigint)"
        ).alias("n_customers"),
        F.expr(
            f"cast(sum(case when node >= {SUPP_OFFSET} then 1 else 0 end)"
            f" as bigint)"
        ).alias("n_suppliers"),
    )


# --------------------------------------------- k-core extraction

KCORE_K = 45       # minimum surviving degree
KCORE_ROUNDS = 6   # fixed peel rounds (converges in <=3 at tested SFs)


def _kcore_oracle() -> str:
    """Unroll the fixed peel rounds as chained CTEs (the PageRank/LPA
    iterative-oracle contract): each round keeps the nodes whose degree
    is >= K and the edges whose BOTH endpoints survive."""
    ctes = [f"e0 AS ({_EDGES_SQL})"]
    for r in range(KCORE_ROUNDS):
        ctes.append(
            f"k{r} AS (SELECT src FROM e{r} GROUP BY src "
            f"HAVING count(*) >= {KCORE_K})"
        )
        ctes.append(
            f"e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e "
            f"JOIN k{r} a ON a.src = e.src "
            f"JOIN k{r} b ON b.src = e.dst)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{KCORE_ROUNDS} GROUP BY src
"""


@query("kcore_trade_graph", oracle=_kcore_oracle)
def q_kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the customer<->supplier trade graph: iteratively
    peel nodes of degree < {KCORE_K} until the dense mutually-supporting
    core remains — the standard graph primitive for finding the
    densely-connected backbone (and, in pipeline terms, the
    high-redundancy region a curation pass treats differently from
    peripheral one-off trades). Output is every surviving node with its
    residual in-core degree.

    Peeling CASCADES (removing weak customers drops supplier degrees
    below K in later rounds), so a fixed {KCORE_ROUNDS}-round unroll is
    pinned in BOTH engines — the PageRank/LPA fixed-iteration contract;
    measured convergence is <= 3 rounds at sf0.01-0.1, and extra rounds
    are exact no-ops, so the fixed point itself is what both engines
    hash. Scale: each round is one degree hash-agg + two hash semi-joins
    of the edge list against the surviving-node set (the same
    two-exchange round shape as `pagerank`); the edge list shrinks
    monotonically, `localCheckpoint` per round caps lineage. Nothing is
    ever collected to the driver."""
    return kcore_peel(trade_edges(spark, sf_dir))


def kcore_peel(
    edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Run the fixed-round k-core peel on a doubled-undirected (src, dst)
    edge list; returns surviving (node, degree).

    Early-exits on the edge-count fixpoint (a bounded per-round scalar,
    the dedup_components precedent): once a peel removes nothing, every
    further peel is the identity, so stopping produces the SAME table
    the oracle's full fixed-round unroll computes — the count also
    eagerly materializes each round's checkpoint, which the next round
    reuses anyway."""
    edges = edges.localCheckpoint(eager=False)
    n_edges = edges.count()
    for _ in range(rounds):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "leftsemi")
            .join(
                keep.withColumnRenamed("src", "dst"), "dst", "leftsemi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n2 = edges.count()
        if n2 == n_edges:
            break
        n_edges = n2
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


# ---------------------------------------- HITS hubs & authorities

HITS_ROUNDS = 4
HITS_SCALE = 1_000_000


def _hits_oracle() -> str:
    """Unroll the normalized HITS recurrence: per round, authority =
    sum of in-neighbor hub scores, hub = sum of out-neighbor authority
    scores, each rescaled to max {HITS_SCALE} by integer floor-div (the
    scalar max plays the role of the L-inf norm)."""
    ctes = [
        f"""e AS (
    SELECT DISTINCT o.o_custkey AS cust, {SUPP_OFFSET} + l.l_suppkey AS supp
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)""",
        f"h0 AS (SELECT DISTINCT cust, CAST({HITS_SCALE} AS BIGINT) AS v "
        f"FROM e)",
    ]
    for r in range(HITS_ROUNDS):
        ctes.append(
            f"ar{r} AS (SELECT e.supp, CAST(sum(h.v) AS BIGINT) AS v "
            f"FROM e JOIN h{r} h ON h.cust = e.cust GROUP BY e.supp)"
        )
        ctes.append(f"am{r} AS (SELECT max(v) AS m FROM ar{r})")
        ctes.append(
            f"a{r} AS (SELECT supp, CAST(v * {HITS_SCALE} // m AS BIGINT) "
            f"AS v FROM ar{r} CROSS JOIN am{r})"
        )
        ctes.append(
            f"hr{r} AS (SELECT e.cust, CAST(sum(a.v) AS BIGINT) AS v "
            f"FROM e JOIN a{r} a ON a.supp = e.supp GROUP BY e.cust)"
        )
        ctes.append(f"hm{r} AS (SELECT max(v) AS m FROM hr{r})")
        ctes.append(
            f"h{r + 1} AS (SELECT cust, CAST(v * {HITS_SCALE} // m "
            f"AS BIGINT) AS v FROM hr{r} CROSS JOIN hm{r})"
        )
    body = ",\n".join(ctes)
    last_a = f"a{HITS_ROUNDS - 1}"
    last_h = f"h{HITS_ROUNDS}"
    return f"""
WITH {body}
SELECT cust AS node, 'hub' AS role, v AS score_ppm FROM {last_h}
UNION ALL
SELECT supp AS node, 'authority' AS role, v AS score_ppm FROM {last_a}
"""


@query("hits_trade_graph", oracle=_hits_oracle)
def q_hits_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the DIRECTED bipartite trade graph
    (customer -> supplier): authority(s) = sum of pointing customers'
    hub scores, hub(c) = sum of pointed suppliers' authority scores —
    the mutually-recursive centrality pair PageRank's single recurrence
    cannot express (a big customer is one that buys from important
    suppliers; an important supplier is one big customers buy from).

    Exact integer recurrence, fixed {HITS_ROUNDS} rounds (the
    PageRank/LPA contract): each half-step is one edges-to-scores hash
    join + one key-grouped sum, then an L-inf normalization by integer
    floor-div against the round's scalar max — the max is the only
    driver-side value (a 1-row bounded collect, the fixpoint-scalar
    precedent), so scores stay in [0, {HITS_SCALE}] and never overflow
    however many rounds run. The score table is node-bounded and tiny
    next to the edge list, but its checkpoint-backed plan hides size
    statistics, so the planner sort-merge-joined BOTH sides every
    half-round; an explicit broadcast hint on the score side keeps the
    edge list un-shuffled for all {HITS_ROUNDS}x2 half-steps (round-11,
    guide §3.1 — at cluster scale the same recurrence flips to a
    shuffle join past the broadcast cap, a size decision, never a
    correctness one). Both engines floor-div non-negative sums, so the
    unrolled-CTE oracle hash-matches bit for bit."""
    edges = (
        trade_edges(spark, sf_dir)
        .where(F.col("src") < SUPP_OFFSET)
        .select(F.col("src").alias("cust"), F.col("dst").alias("supp"))
        .localCheckpoint(eager=False)
    )
    h = (
        edges.select("cust")
        .distinct()
        .withColumn("v", F.lit(HITS_SCALE).cast("long"))
    )
    empty = h.sparkSession.createDataFrame(
        [], "node long, role string, score_ppm long"
    )
    a = None
    for _ in range(HITS_ROUNDS):
        ar = (
            edges.join(F.broadcast(h.withColumnRenamed("v", "hv")), "cust")
            .groupBy("supp")
            .agg(F.sum("hv").cast("long").alias("v"))
            .localCheckpoint(eager=False)
        )
        am_row = ar.agg(F.max("v")).first()[0]
        if am_row is None:  # empty graph: nothing to rank
            return empty
        am = int(am_row)
        a = ar.select(
            "supp",
            F.expr(f"CAST(v * {HITS_SCALE} div {am}L AS BIGINT)").alias(
                "v"
            ),
        )
        hr = (
            edges.join(F.broadcast(a.withColumnRenamed("v", "av")), "supp")
            .groupBy("cust")
            .agg(F.sum("av").cast("long").alias("v"))
            .localCheckpoint(eager=False)
        )
        hm = int(hr.agg(F.max("v")).first()[0])
        h = hr.select(
            "cust",
            F.expr(f"CAST(v * {HITS_SCALE} div {hm}L AS BIGINT)").alias(
                "v"
            ),
        )
    hubs = h.select(
        F.col("cust").alias("node"),
        F.lit("hub").alias("role"),
        F.col("v").alias("score_ppm"),
    )
    auths = a.select(
        F.col("supp").alias("node"),
        F.lit("authority").alias("role"),
        F.col("v").alias("score_ppm"),
    )
    return hubs.unionByName(auths)


# ---------------------------------------------------------- link prediction

LP_DEG_CAP = 48   # drop hub customers with more distinct suppliers than this
LP_MIN_CN = 4     # emit supplier pairs sharing at least this many customers

_LP_SQL = f"""
WITH cs AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM cs GROUP BY 1),
capped AS (
    SELECT cs.c, cs.s, cdeg.dc FROM cs
    JOIN cdeg ON cdeg.c = cs.c AND cdeg.dc <= {LP_DEG_CAP}
),
sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS ds FROM capped GROUP BY 1),
pairs AS (
    SELECT a.s AS supp_a, b.s AS supp_b,
           CAST(count(*) AS BIGINT) AS common_n,
           CAST(sum(1000000 // a.dc) AS BIGINT) AS ra_micro,
           CAST(sum(CAST(floor(1000000 / ln(a.dc)) AS BIGINT)) AS BIGINT)
               AS aa_micro
    FROM capped a JOIN capped b ON a.c = b.c AND a.s < b.s
    GROUP BY 1, 2
    HAVING count(*) >= {LP_MIN_CN}
)
SELECT p.supp_a, p.supp_b, p.common_n,
       CAST(p.common_n * 1000000 //
            (da.ds + db.ds - p.common_n) AS BIGINT) AS jaccard_ppm,
       p.ra_micro, p.aa_micro
FROM pairs p
JOIN sdeg da ON da.s = p.supp_a
JOIN sdeg db ON db.s = p.supp_b
"""


@query("link_prediction_scores", oracle=_LP_SQL)
def q_link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the bipartite customer->supplier trade graph:
    for every supplier pair sharing >= {MIN_CN} customers, emit the
    classic neighborhood scores — common neighbors, Jaccard (integer ppm),
    resource allocation (Zhou et al. 2009: sum of 1/deg over shared
    neighbors, exact integer micro-units), and Adamic-Adar (sum of
    1/ln(deg), per-term floored to micro-units so the bigint sum is
    order-independent; the floor boundary clearance for every reachable
    degree 2..{CAP} is audited in tests/test_micro_nat_boundary.py).

    Scale shape: the quadratic term keys the self-join on the SHARED
    CUSTOMER, so its size is sum_c deg(c)^2 — bounded by the degree cap
    {CAP} (hub customers, who carry near-zero link signal and all of the
    blow-up risk, are dropped BEFORE the pair join; the cap is the same
    hot-key bound `dedup_containment_capped` applies to shingles, and the
    oracle mirrors it). Everything else is a hash aggregate or a slim
    degree-table join keyed by supplier. No stage is ever all-pairs in
    the supplier count. (Round-11 note: the item_cf basket-array pair
    generator was tried here and measured SLOWER — 4.3 -> 6.1 s warm —
    the interpreted slice/transform HOF tower costs more than the
    codegen'd self-join at deg<=48 pair volume; kept the join form.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cdeg = cs.groupBy("c").agg(F.count(F.lit(1)).alias("dc"))
    # One materialization: the (join + distinct + degree-filter) subtree
    # feeds FOUR consumers (both pair-join sides and two degree lookups);
    # without the pin each consumer would recompute the fact-table join.
    capped = cs.join(
        cdeg.where(F.col("dc") <= LP_DEG_CAP), "c"
    ).localCheckpoint(eager=False)
    sdeg = capped.groupBy("s").agg(F.count(F.lit(1)).alias("ds"))
    b = capped.select(
        F.col("c"), F.col("s").alias("s_b")
    )
    pairs = (
        capped.join(b, "c")
        .where(F.col("s") < F.col("s_b"))
        .groupBy(F.col("s").alias("supp_a"), F.col("s_b").alias("supp_b"))
        .agg(
            F.count(F.lit(1)).alias("common_n"),
            F.sum(F.floor(F.lit(1_000_000) / F.col("dc")))
            .cast("long").alias("ra_micro"),
            F.sum(
                F.floor(F.lit(1_000_000) / F.log(F.col("dc")))
            ).cast("long").alias("aa_micro"),
        )
        .where(F.col("common_n") >= LP_MIN_CN)
    )
    return (
        pairs.join(
            sdeg.select(F.col("s").alias("supp_a"), F.col("ds").alias("da")),
            "supp_a",
        )
        .join(
            sdeg.select(F.col("s").alias("supp_b"), F.col("ds").alias("db")),
            "supp_b",
        )
        .select(
            "supp_a",
            "supp_b",
            "common_n",
            F.floor(
                F.col("common_n") * 1_000_000
                / (F.col("da") + F.col("db") - F.col("common_n"))
            ).cast("long").alias("jaccard_ppm"),
            "ra_micro",
            "aa_micro",
        )
    )


q_link_prediction_scores.__doc__ = q_link_prediction_scores.__doc__.format(
    MIN_CN=LP_MIN_CN, CAP=LP_DEG_CAP
)


# ------------------------------------------ TextRank keyword extraction

TEXTRANK_TOP_K = 20


def _textrank_oracle(iters: int = PR_ITERS) -> str:
    """Unroll the damped integer PageRank recurrence over the DOUBLED
    term co-occurrence edge list — `_pagerank_oracle`'s generated-CTE
    technique pointed at the term graph instead of the trade graph."""
    ctes = [
        """t AS (
    SELECT DISTINCT doc_id, u.term
    FROM documents, unnest(string_split(text, ' ')) AS u(term)
    WHERE u.term <> ''
)""",
        f"""p AS (
    SELECT a.term AS ta, b.term AS tb
    FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2 HAVING count(*) >= {COOC_MIN_DOCS}
)""",
        """edges AS (
    SELECT ta AS src, tb AS dst FROM p
    UNION ALL
    SELECT tb AS src, ta AS dst FROM p
)""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"pr0 AS (SELECT DISTINCT src AS node, CAST({PR_START} AS BIGINT)"
        " AS pr FROM edges)",
    ]
    for i in range(iters):
        ctes.append(
            f"pr{i + 1} AS ("
            f"SELECT e.dst AS node, "
            f"CAST(150000 + (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT)"
            f" AS pr "
            f"FROM edges e "
            f"JOIN pr{i} p ON p.node = e.src "
            f"JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS term, pr AS pr_micro FROM pr{iters}"
        + f"\nORDER BY pr DESC, node LIMIT {TEXTRANK_TOP_K}"
    )


@query("textrank_keywords", oracle=_textrank_oracle())
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): run
    the damped PageRank recurrence over the document-level term
    co-occurrence graph (`term_pair_edges`, doubled to undirected) and
    keep the top-{K} terms by centrality — the classic unsupervised
    keyword/keyphrase ranker, and the corpus-level "what is this corpus
    about" signal a curation pass reads before weighting sources.

    Exactly the `pagerank_trade_graph` integer recurrence (micro-unit
    ranks, per-edge floor division, fixed {ITERS} iterations) pointed at
    a different graph — the iterative kernel is shared code, so the
    determinism argument (bit-identical under any partitioning) is
    inherited. The final cut is a global top-{K} — TakeOrderedAndProject,
    never a full sort.

    Scale shape: the edge list is bounded by co-occurrence support
    (>= {MIN_DOCS} shared docs — rare-pair noise never becomes edges);
    each PageRank round is one join + one hash-agg over that bounded
    edge list; `localCheckpoint` truncates lineage per round. The
    pair-generation stage is the same per-document self-join as
    `term_cooccurrence` (documents are short; per-doc term sets are
    bounded by doc length, so pair volume is sum_d |terms_d|^2, never
    corpus-quadratic)."""
    e = term_pair_edges(spark, sf_dir).select("term_a", "term_b")
    edges = e.select(
        F.col("term_a").alias("src"), F.col("term_b").alias("dst")
    ).unionByName(
        e.select(F.col("term_b").alias("src"), F.col("term_a").alias("dst"))
    )
    pr = pagerank(edges)
    return (
        pr.orderBy(F.desc("pr"), F.asc("node"))
        .limit(TEXTRANK_TOP_K)
        .select(F.col("node").alias("term"), F.col("pr").alias("pr_micro"))
    )


q_textrank_keywords.__doc__ = q_textrank_keywords.__doc__.format(
    K=TEXTRANK_TOP_K, ITERS=PR_ITERS, MIN_DOCS=COOC_MIN_DOCS
)


# ---------------------------- k-source betweenness centrality (Brandes)

BET_SOURCES = 8  # fixed pivot set: the lowest customer node ids
BET_DEPTH = 3  # BFS levels (bipartite trade graph: depth 3 = c->s->c->s)
BET_MICRO = 1_000_000


def _betweenness_oracle() -> str:
    """Unroll Brandes' algorithm (Brandes 2001) for the fixed pivot set:
    {BET_DEPTH} level-synchronous BFS rounds (path counts sigma via
    grouped sums, new nodes via NOT EXISTS against visited levels), then
    the backward dependency accumulation with per-edge floored
    micro-unit terms — the same generated-CTE technique as
    `_pagerank_oracle`."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        f"""srcs AS (
    SELECT src AS s FROM (SELECT DISTINCT src FROM edges
                          WHERE src < {SUPP_OFFSET})
    ORDER BY src LIMIT {BET_SOURCES}
)""",
        "l0 AS (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM srcs)",
    ]
    visited = ["l0"]
    for d in range(1, BET_DEPTH + 1):
        not_exists = " AND ".join(
            f"NOT EXISTS (SELECT 1 FROM {lv} v WHERE v.s = c.s"
            f" AND v.node = c.node)"
            for lv in visited
        )
        ctes.append(
            f"""c{d} AS (
    SELECT st.s, e.dst AS node, CAST(sum(st.sigma) AS BIGINT) AS sigma
    FROM l{d - 1} st JOIN edges e ON e.src = st.node
    GROUP BY 1, 2
)"""
        )
        ctes.append(f"l{d} AS (SELECT c.* FROM c{d} c WHERE {not_exists})")
        visited.append(f"l{d}")
    ctes.append(
        f"d{BET_DEPTH} AS (SELECT s, node, sigma,"
        f" CAST(0 AS BIGINT) AS delta FROM l{BET_DEPTH})"
    )
    for d in range(BET_DEPTH - 1, 0, -1):
        ctes.append(
            f"""d{d} AS (
    SELECT v.s, v.node, v.sigma,
           CAST(coalesce(sum(v.sigma * ({BET_MICRO} + w.delta)
                             // w.sigma), 0) AS BIGINT) AS delta
    FROM l{d} v
    LEFT JOIN edges e ON e.src = v.node
    LEFT JOIN d{d + 1} w ON w.s = v.s AND w.node = e.dst
    GROUP BY 1, 2, 3
)"""
        )
    acc = " UNION ALL ".join(
        f"SELECT node, delta FROM d{d}" for d in range(1, BET_DEPTH)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(sum(delta) AS BIGINT) AS bc_micro
FROM ({acc})
GROUP BY node HAVING sum(delta) > 0
"""
    )


@query("betweenness_centrality", oracle=_betweenness_oracle())
def q_betweenness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-source betweenness centrality (Brandes 2001, pivot-sampled as in
    Brandes & Pich 2007): from a FIXED set of {K} pivot customers, run
    {D} level-synchronous BFS rounds over the doubled trade graph
    accumulating shortest-path counts (sigma), then the backward
    dependency pass delta(v) = sum over depth-(d+1) successors w of
    sigma_v * (1 + delta_w) / sigma_w, per-edge floored to micro-units
    so the bigint sums are order-independent. Output: every node with a
    positive accumulated dependency — the brokers/bridges of the trade
    network, the shortest-PATH centrality class that the eigenvector
    family (`pagerank_trade_graph`, `hits_trade_graph`) cannot see
    (a low-degree node on the only path between two regions scores high
    here and low there).

    Scale shape: exact all-sources Brandes is O(V*E) — the pivot set
    bounds every state table to {K} x |reached nodes| (the standard
    sampled-betweenness estimator, exact for the chosen pivots and
    hash-pinned as such); each BFS round is one join + hash-agg on
    (s, node) plus a left-anti join against the visited set; the
    backward pass is one join per depth against the bounded level
    tables. `localCheckpoint` per level truncates lineage. Depth {D}
    covers customer->supplier->customer->supplier reach; deeper levels
    on the bipartite graph add rapidly-vanishing dependency mass."""
    # One materialization: the lineitem x orders + distinct + double
    # subtree feeds every forward AND backward round (5 joins) — without
    # the pin each round recomputes the fact-table join.
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    srcs = (
        edges.select("src")
        .where(F.col("src") < SUPP_OFFSET)
        .distinct()
        .orderBy("src")
        .limit(BET_SOURCES)
    )
    l0 = srcs.select(
        F.col("src").alias("s"),
        F.col("src").alias("node"),
        F.lit(1).cast("long").alias("sigma"),
    )
    levels = [l0.localCheckpoint(eager=False)]
    visited = levels[0]
    for _ in range(BET_DEPTH):
        prev = levels[-1]
        cand = (
            prev.join(edges, prev.node == edges.src)
            .groupBy("s", F.col("dst").alias("node"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
        )
        ld = cand.join(visited, ["s", "node"], "left_anti").localCheckpoint(
            eager=False
        )
        visited = visited.unionByName(ld).localCheckpoint(eager=False)
        levels.append(ld)
    dep = levels[BET_DEPTH].withColumn("delta", F.lit(0).cast("long"))
    acc = None
    for d in range(BET_DEPTH - 1, 0, -1):
        v = levels[d]
        w = dep.select(
            F.col("s").alias("ws"),
            F.col("node").alias("wnode"),
            F.col("sigma").alias("wsigma"),
            F.col("delta").alias("wdelta"),
        )
        dep = (
            v.join(edges, v.node == edges.src, "left")
            .join(
                w,
                (F.col("ws") == F.col("s"))
                & (F.col("wnode") == F.col("dst")),
                "left",
            )
            .groupBy("s", "node", "sigma")
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(
                            f"sigma * ({BET_MICRO} + wdelta) div wsigma"
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("delta")
            )
            .localCheckpoint(eager=False)
        )
        part = dep.select("node", "delta")
        acc = part if acc is None else acc.unionByName(part)
    return (
        acc.groupBy("node")
        .agg(F.sum("delta").cast("long").alias("bc_micro"))
        .where(F.col("bc_micro") > 0)
    )


q_betweenness_centrality.__doc__ = q_betweenness_centrality.__doc__.format(
    K=BET_SOURCES, D=BET_DEPTH
)


# ------------------- rank-biased overlap: centrality vs frequency

RBO_K = TEXTRANK_TOP_K  # evaluation depth (both rankings are this long)
# (1-p) * p^(d-1) weights for p = 9/10, exact-rational floored to ppb:
# 10^9 * 9^(d-1) // 10^d — Python bigints, embedded as shared literals
# in BOTH the engine expression and the oracle SQL.
RBO_W_PPB = [(10**9 * 9 ** (d - 1)) // 10**d for d in range(1, RBO_K + 1)]


def _rbo_oracle() -> str:
    """Reuse the TextRank unrolled-CTE recurrence for ranking A, a plain
    occurrence-count ranking for B, then the truncated RBO sum with the
    shared ppb weight literals."""
    pr_body = _textrank_oracle().split("\nSELECT node AS term")[0]
    w_list = ", ".join(str(w) for w in RBO_W_PPB)
    return (
        pr_body
        + f""",
ra AS (
    SELECT node AS term,
           CAST(row_number() OVER (ORDER BY pr DESC, node) AS BIGINT) AS r
    FROM pr{PR_ITERS} ORDER BY pr DESC, node LIMIT {RBO_K}
),
freq AS (
    SELECT u.term, CAST(count(*) AS BIGINT) AS n
    FROM documents, unnest(string_split(text, ' ')) AS u(term)
    WHERE u.term <> '' GROUP BY 1
),
rb AS (
    SELECT term,
           CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS r
    FROM freq ORDER BY n DESC, term LIMIT {RBO_K}
),
matched AS (
    SELECT greatest(ra.r, rb.r) AS m
    FROM ra JOIN rb ON rb.term = ra.term
),
depths AS (
    SELECT unnest(range(1, {RBO_K + 1})) AS d
),
xd AS (
    SELECT d.d, CAST(count(m.m) AS BIGINT) AS x
    FROM depths d LEFT JOIN matched m ON m.m <= d.d
    GROUP BY 1
)
SELECT CAST({RBO_K} AS BIGINT) AS k,
       CAST((SELECT count(*) FROM matched) AS BIGINT) AS overlap_at_k,
       CAST(sum(([{w_list}][d] * x) // d) AS BIGINT) AS rbo_ppb
FROM xd
"""
    )


@query("rbo_rank_agreement", oracle=_rbo_oracle())
def q_rbo_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two keyword rankings of the same corpus: TextRank centrality vs raw
    occurrence frequency — the ranking-agreement metric a retrieval
    deployment runs when it swaps rankers (does the expensive ranker
    actually reorder anything?). RBO = (1-p) * sum over depths d of
    p^(d-1) * |A_d intersect B_d| / d, top-weighted so disagreement in
    the head costs more than in the tail — the property Kendall/Spearman
    (whole-ranking, position-uniform; cf. `score_correlation`) and plain
    overlap@k (depth-blind; cf. `dedup_method_agreement`) both lack.

    Exact integers: the (1-p)p^(d-1) weights for p = 9/10 are exact
    rationals floored ONCE to ppb literals shared by both engines
    (Python bigint 10^9 * 9^(d-1) // 10^d — no libm); each depth term is
    one bigint multiply + floor division; truncation at depth {K} (both
    rankings are {K} long, so this is RBO_min — the residual-free lower
    bound). Scale shape: both rankings reduce the corpus to bounded
    top-{K} tables before the intersection; the depth expansion is
    {K} x {K} rows at most."""
    from pyspark.sql import Window

    e = term_pair_edges(spark, sf_dir).select("term_a", "term_b")
    edges = e.select(
        F.col("term_a").alias("src"), F.col("term_b").alias("dst")
    ).unionByName(
        e.select(F.col("term_b").alias("src"), F.col("term_a").alias("dst"))
    )
    wa = Window.partitionBy(F.lit(1)).orderBy(F.desc("pr"), F.asc("node"))
    ra = (
        pagerank(edges)
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(RBO_K)
        .select(
            F.col("node").alias("term"),
            F.row_number().over(wa).cast("long").alias("ra"),
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wb = Window.partitionBy(F.lit(1)).orderBy(F.desc("n"), F.asc("term"))
    rb = (
        freq.orderBy(F.desc("n"), F.asc("term"))
        .limit(RBO_K)
        .select(
            "term",
            F.row_number().over(wb).cast("long").alias("rb"),
        )
    )
    matched = ra.join(rb, "term").select(
        F.greatest("ra", "rb").alias("m")
    )
    w_arr = "array({})".format(
        ", ".join(f"CAST({w} AS BIGINT)" for w in RBO_W_PPB)
    )
    depths = spark.range(1, RBO_K + 1).select(
        F.col("id").cast("long").alias("d")
    )
    xd = (
        depths.join(
            F.broadcast(matched), F.col("m") <= F.col("d"), "left"
        )
        .groupBy("d")
        .agg(F.count("m").cast("long").alias("x"))
    )
    ov = matched.agg(F.count(F.lit(1)).cast("long").alias("overlap_at_k"))
    return (
        xd.agg(
            F.expr(f"sum((element_at({w_arr}, CAST(d AS INT)) * x) div d)")
            .cast("long")
            .alias("rbo_ppb")
        )
        .crossJoin(F.broadcast(ov))
        .select(
            F.lit(RBO_K).cast("long").alias("k"),
            "overlap_at_k",
            "rbo_ppb",
        )
    )


q_rbo_rank_agreement.__doc__ = q_rbo_rank_agreement.__doc__.format(K=RBO_K)


# -------------------------------------------- degree assortativity

_ASSORT_R = (
    "CAST(floor((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " * 1000000"
    " / sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " / sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    " AS BIGINT)"
)

_ASSORT_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY 1),
ed AS (
    SELECT a.d AS du, b.d AS dv
    FROM edges e JOIN deg a ON a.node = e.src
    JOIN deg b ON b.node = e.dst
),
sums AS (
    SELECT CAST(count(*) AS BIGINT) AS m,
           CAST(sum(du) AS BIGINT) AS sx,
           CAST(sum(dv) AS BIGINT) AS sy,
           CAST(sum(du * du) AS BIGINT) AS sxx,
           CAST(sum(dv * dv) AS BIGINT) AS syy,
           CAST(sum(du * dv) AS BIGINT) AS sxy
    FROM ed
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       m AS m_directed_edges,
       {_ASSORT_R} AS assortativity_ppm
FROM sums
"""


@query("degree_assortativity", oracle=_ASSORT_ORACLE)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the trade
    graph: the Pearson correlation of endpoint degrees over the doubled
    undirected edge list — negative for hub-and-spoke bipartite trade
    (high-degree suppliers connect to low-degree customers), the one
    structural scalar the centrality family (`pagerank`/`hits`/
    `betweenness`) does not expose.

    Exactness: all five moments are exact bigint sums over one
    edges-degree join; the single floating step is the closing Pearson
    expression, written as the IDENTICAL text in both engines —
    bigint->double conversion and sqrt are both correctly rounded by
    IEEE (the trend-stats sqrt policy: no boundary audit needed, unlike
    ln). Scale shape: degree hash-agg + one edge-degree equi-join, then
    a 1-row reduce."""
    edges = trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).select(F.col("src").alias("node"), "d")
    ed = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("d", "du")
        .join(
            deg.select(F.col("node").alias("dst"), F.col("d").alias("dv")),
            "dst",
        )
        .select("du", "dv")
    )
    sums = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("du").cast("long").alias("sx"),
        F.sum("dv").cast("long").alias("sy"),
        F.sum(F.col("du") * F.col("du")).cast("long").alias("sxx"),
        F.sum(F.col("dv") * F.col("dv")).cast("long").alias("syy"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("sxy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return sums.crossJoin(F.broadcast(n_nodes)).select(
        "n_nodes",
        F.col("m").alias("m_directed_edges"),
        F.expr(_ASSORT_R).alias("assortativity_ppm"),
    )


# --------------------------------------------- partition modularity

_MOD_Q = (
    "CAST(floor(CAST(snum AS DOUBLE) * 1000000"
    " / CAST(m2 AS DOUBLE) / CAST(m2 AS DOUBLE)) AS BIGINT)"
)


def _modularity_oracle(iters: int = LPA_ITERS) -> str:
    return (
        "WITH "
        + ",\n".join(_lpa_ctes(iters, self_votes=True))
        + f""",
nl AS (SELECT node, label FROM lp{iters}),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY 1),
degc AS (
    SELECT l.label, CAST(sum(d.d) AS BIGINT) AS deg_sum
    FROM deg d JOIN nl l ON l.node = d.node GROUP BY 1
),
intra AS (
    SELECT a.label, CAST(count(*) AS BIGINT) AS e_c
    FROM edges e
    JOIN nl a ON a.node = e.src
    JOIN nl b ON b.node = e.dst AND b.label = a.label
    GROUP BY 1
),
members AS (
    SELECT label, CAST(count(*) AS BIGINT) AS n_members FROM nl GROUP BY 1
),
m2t AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM edges),
gq AS (
    SELECT CAST(sum(CAST(coalesce(i.e_c, 0) * t.m2
                         - g.deg_sum * g.deg_sum AS BIGINT)) AS BIGINT)
               AS snum,
           CAST(max(t.m2) AS BIGINT) AS m2
    FROM degc g LEFT JOIN intra i ON i.label = g.label CROSS JOIN m2t t
)
SELECT m.label AS community, m.n_members,
       CAST(coalesce(i.e_c, 0) AS BIGINT) AS intra_edges,
       g.deg_sum,
       (SELECT {_MOD_Q} FROM gq) AS modularity_ppm
FROM members m
JOIN degc g ON g.label = m.label
LEFT JOIN intra i ON i.label = m.label
"""
    )


@query("modularity_communities", oracle=_modularity_oracle())
def q_modularity_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity of a self-preference LPA partition —
    the quality score the community-detection family was missing:
    Q = sum_c [e_c/2m - (deg_c/2m)^2] over the SAME doubled
    strongest-partner edge list as `label_propagation_communities`
    (shared `lpa_edges`/`label_propagation` bodies, unrolled-CTE
    oracle sharing `_lpa_ctes`). Detecting communities without scoring
    the partition is half an operator — this is the half that says
    whether the segments are real structure or noise.

    The vote recurrence here adds ONE SELF-LOOP VOTE per node
    (Raghavan et al. 2007's self-inclusion): pure neighbor-voting
    sync LPA OSCILLATES on bipartite graphs — labels flip sides every
    round, leaving the "partition" with ZERO intra-community edges and
    Q < 0 (measured -0.019 on this graph) — while the self-vote
    anchors each node and converges to real segments (measured
    Q = +0.488, 76 communities at sf0.01). Scoring always uses the
    real edges, never the self-loops.

    Per community: member count, intra-community directed edge count
    e_c, degree mass deg_c; global Q attached to every row. Exactness:
    e_c/deg_c/m are exact bigints (|snum| <= (2m)^2 ~ 8e9 at sf0.1,
    far inside int64 and double-exact range; a 100 TB deployment
    moves snum to DECIMAL(38) — noted, not needed at any tested SF);
    the one floating step is the closing Q expression written as
    IDENTICAL text in both engines (IEEE multiply/divide are correctly
    rounded, the `degree_assortativity` policy). Scale shape: labels
    join edges twice (hash equi-joins), everything else is hash-agg;
    the LPA rounds themselves are the bounded-iteration recurrence
    already gated under the LPA row."""
    edges = lpa_edges(spark, sf_dir)
    # Pinned (round-11): every LPA round's vote join consumes vedges,
    # and the self-loop distinct is a shuffle that would otherwise
    # re-execute per round (new RDD per round — no shuffle reuse).
    vedges = edges.unionByName(
        edges.select("src").distinct().select(
            F.col("src"), F.col("src").alias("dst")
        )
    ).localCheckpoint(eager=False)
    lab = label_propagation(vedges).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    degc = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(F.sum("d").cast("long").alias("deg_sum"))
    )
    a = lab.select(F.col("node").alias("src"), F.col("label").alias("la"))
    b = lab.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    intra = (
        edges.join(a, "src")
        .join(b, "dst")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    members = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    m2t = edges.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    glob = (
        degc.join(intra, "label", "left")
        .crossJoin(F.broadcast(m2t))
        .agg(
            F.sum(
                F.coalesce("e_c", F.lit(0)) * F.col("m2")
                - F.col("deg_sum") * F.col("deg_sum")
            )
            .cast("long")
            .alias("snum"),
            F.max("m2").cast("long").alias("m2"),
        )
        .select(F.expr(_MOD_Q).alias("modularity_ppm"))
    )
    return (
        members.join(degc, "label")
        .join(intra, "label", "left")
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("label").alias("community"),
            "n_members",
            F.coalesce("e_c", F.lit(0)).cast("long").alias("intra_edges"),
            "deg_sum",
            "modularity_ppm",
        )
    )
