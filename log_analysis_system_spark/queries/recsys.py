"""Recommender-system operators: item-item collaborative filtering.

The classic co-occurrence recommender (Sarwar et al. 2001, Amazon
item-to-item): treat each order as a basket of parts, count pairwise
co-purchases, score item affinity by cosine over basket-membership
vectors, and keep the top-k neighbors per item. The reference system's
top-N family (SURVEY §2.6) ranks items per GROUP; this is the pairwise
ITEM-GRAPH complement a production recommender actually serves — and
the pairs-from-baskets shape is the same candidate-generation pattern
as the dedup LSH band join, so the scale argument carries over.

Scale shape: baskets are deduped (order, part) rows; the pair join is
an equi-join on the order key only, so candidate volume is
sum_orders C(basket_size, 2) — bounded by a deterministic per-basket
cap (BASKET_CAP lowest partkeys; TPC-H baskets max out at 7, so the
cap documents the 100 TB guard without binding here). Cosine is ranked
by exact integer cross-multiplication (co^2 * 1e6 div (n_a * n_b) —
monotone in cosine, no sqrt), and the per-item top-k cut is a
partitioned window over the support-thresholded pair table.

Determinism: counts are exact integers; score_ppm is a floor division
of exact bigints; the top-k ordering (score desc, co desc, partkey asc)
is total. Overflow bound: co^2 * 1e6 needs co <= 3e6 baskets per pair —
beyond that, drop the ppm scale factor (documented, same idiom as the
trend-stats slope scaling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import register_views
from . import query

BASKET_CAP = 32   # deterministic per-basket item cap (lowest partkeys)
MIN_CO = 2        # minimum co-occurrence support for a pair
TOP_K = 3         # neighbors kept per item


_ITEM_CF_ORACLE = f"""
WITH b0 AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
),
b AS (
    SELECT o, i FROM (
        SELECT o, i, row_number() OVER (PARTITION BY o ORDER BY i) AS rn
        FROM b0
    ) WHERE rn <= {BASKET_CAP}
),
n AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM b GROUP BY 1),
co AS (
    SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS co
    FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_CO}
),
sided AS (
    SELECT ia AS item, ib AS other, co FROM co
    UNION ALL
    SELECT ib AS item, ia AS other, co FROM co
),
scored AS (
    SELECT s.item, s.other, s.co,
           CAST(s.co * s.co * 1000000 // (na.ni * nb.ni) AS BIGINT)
               AS score_ppm
    FROM sided s
    JOIN n na ON na.i = s.item
    JOIN n nb ON nb.i = s.other
),
ranked AS (
    SELECT item, other, co, score_ppm,
           row_number() OVER (PARTITION BY item
                              ORDER BY score_ppm DESC, co DESC,
                                       other ASC) AS rk
    FROM scored
)
SELECT CAST(item AS BIGINT) AS item, CAST(other AS BIGINT) AS other,
       co, score_ppm, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {TOP_K}
"""


@query("item_cf_recs", oracle=_ITEM_CF_ORACLE)
def q_item_cf_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets: top-{K}
    most-similar parts per part by exact integer cosine^2 (ppm) with
    co-occurrence support >= {MIN_CO}. See the module docstring for the
    candidate-bounding and determinism argument."""
    register_views(spark, sf_dir)
    # Baskets in ONE aggregation: collect_set dedups (order, part) rows,
    # array_sort + slice keeps the BASKET_CAP lowest partkeys — exactly
    # the distinct + row_number(ORDER BY i) <= cap the previous form spent
    # a distinct shuffle AND a window sort on. Pairs are then generated
    # IN-PLAN from the sorted array (ia < ib by construction), removing
    # the basket self-join outright — the round-10 rewrite cut the plan
    # from 17 textual exchanges to 6 (guide §2.4; pair volume is
    # unchanged: sum_orders C(|basket|, 2)).
    baskets = (
        spark.table("lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
        .groupBy("o")
        .agg(
            F.slice(F.array_sort(F.collect_set("i")), 1, BASKET_CAP).alias(
                "items"
            )
        )
    )
    n = (
        baskets.select(F.explode("items").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(items) - 1), a -> "
        "transform(slice(items, a + 1, size(items) - a), b -> "
        "named_struct('ia', element_at(items, a), 'ib', b))))"
    )
    co = (
        baskets.where(F.size("items") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .select(F.col("pr.ia").alias("ia"), F.col("pr.ib").alias("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .where(F.col("co") >= MIN_CO)
    )
    sided = co.select(
        F.col("ia").alias("item"), F.col("ib").alias("other"), "co"
    ).unionByName(
        co.select(
            F.col("ib").alias("item"), F.col("ia").alias("other"), "co"
        )
    )
    na = n.select(F.col("i").alias("item"), F.col("ni").alias("n_item"))
    nb = n.select(F.col("i").alias("other"), F.col("ni").alias("n_other"))
    scored = (
        sided.join(na, "item")
        .join(nb, "other")
        .select(
            "item",
            "other",
            "co",
            F.expr(
                "CAST(co * co * 1000000 div (n_item * n_other) AS BIGINT)"
            ).alias("score_ppm"),
        )
    )
    w_rank = Window.partitionBy("item").orderBy(
        F.col("score_ppm").desc(), F.col("co").desc(), F.col("other").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= TOP_K)
        .select(
            F.col("item").cast("long"),
            F.col("other").cast("long"),
            "co",
            "score_ppm",
            F.col("rk").cast("int"),
        )
    )


q_item_cf_recs.__doc__ = q_item_cf_recs.__doc__.format(
    K=TOP_K, MIN_CO=MIN_CO
)
