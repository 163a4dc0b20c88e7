"""Exact CART split finding: a Gini decision stump trained distributed.

The operator is the inner loop every distributed tree learner (CART,
xgboost's exact mode, Spark MLlib's trees) runs: for EVERY candidate
threshold of every feature, the class counts of both children, reduced
to the best split — computed here without a per-threshold pass. The
trick is the classic histogram + prefix-scan formulation:

1. units reduce to a per-(feature, value) histogram (one hash-agg:
   n rows, n positives);
2. one ordered prefix-sum window PER FEATURE (partitioned by feature —
   never a global sort) turns the histogram into (n_left, pos_left)
   for every threshold simultaneously; the right child is the
   complement from the feature totals;
3. weighted binary Gini is an exact rational — num/den cleared of
   fractions by cross-multiplication — floored to ppm, and the argmin
   (with (gini, feature, threshold) total-order tiebreak) is one
   min-struct aggregate.

Everything after step 1 is O(distinct feature values), not O(rows) —
the value histogram IS the candidate set (at petabyte scale you bin
values into quantile-sketch buckets first; the prefix-scan shape is
unchanged). All arithmetic is bigint: the scaled Gini numerator is
~N^3 * 1e6, so 64-bit holds up to N ~ 2e4 units; beyond that swap the
ppm floor to DECIMAL(38) — documented bound, same policy as the
recsys ppm scale.

Task: predict second-half-of-month conversion (>= 1 purchase) from
pre-period behavior (event count, error count) — the same design as
`propensity_stratified_att`, giving the causal readout a supervised
counterpart on identical features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query

CART_CUT = "2024-01-16 00:00:00"

_CART_UNITS = f"""
pre AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_pre,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_err
    FROM events WHERE ts < CAST('{CART_CUT}' AS TIMESTAMP)
    GROUP BY 1
),
post AS (
    SELECT DISTINCT user_id AS pu FROM events
    WHERE ts >= CAST('{CART_CUT}' AS TIMESTAMP)
      AND event_type = 'purchase'
),
units AS (
    SELECT p.n_pre, p.n_err,
           CASE WHEN po.pu IS NOT NULL THEN 1 ELSE 0 END AS y
    FROM pre p LEFT JOIN post po ON po.pu = p.user_id
),
melted AS (
    SELECT 'n_pre' AS feature, n_pre AS v, y FROM units
    UNION ALL
    SELECT 'n_err' AS feature, n_err AS v, y FROM units
)
"""

_CART_ORACLE = f"""
WITH {_CART_UNITS},
hist AS (
    SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS pos
    FROM melted GROUP BY 1, 2
),
scan AS (
    SELECT feature, v,
           CAST(sum(n) OVER w AS BIGINT) AS n_l,
           CAST(sum(pos) OVER w AS BIGINT) AS pos_l,
           CAST(sum(n) OVER t AS BIGINT) AS n_tot,
           CAST(sum(pos) OVER t AS BIGINT) AS pos_tot
    FROM hist
    WINDOW w AS (PARTITION BY feature ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           t AS (PARTITION BY feature)
),
cand AS (
    SELECT feature, v AS threshold, n_l, pos_l,
           n_tot - n_l AS n_r, pos_tot - pos_l AS pos_r,
           n_tot, pos_tot
    FROM scan WHERE n_tot - n_l > 0
),
scored AS (
    SELECT feature, threshold, n_l, pos_l, n_r, pos_r, n_tot, pos_tot,
           CAST(((n_r * (n_l * n_l - pos_l * pos_l
                         - (n_l - pos_l) * (n_l - pos_l))
                  + n_l * (n_r * n_r - pos_r * pos_r
                           - (n_r - pos_r) * (n_r - pos_r)))
                 * 1000000) // (n_l * n_r * n_tot) AS BIGINT)
               AS gini_ppm
    FROM cand
),
best AS (
    SELECT min(struct_pack(g := gini_ppm, f := feature, t := threshold))
               AS b
    FROM scored
)
SELECT s.feature, CAST(s.threshold AS BIGINT) AS threshold, s.gini_ppm,
       s.n_l AS n_left, s.pos_l AS pos_left,
       s.n_r AS n_right, s.pos_r AS pos_right,
       s.pos_l * 2 > s.n_l AS pred_left,
       s.pos_r * 2 > s.n_r AS pred_right,
       CAST(((s.n_tot * s.n_tot - s.pos_tot * s.pos_tot
              - (s.n_tot - s.pos_tot) * (s.n_tot - s.pos_tot))
             * 1000000) // (s.n_tot * s.n_tot) AS BIGINT)
           AS root_gini_ppm
FROM scored s JOIN best b
  ON s.gini_ppm = b.b.g AND s.feature = b.b.f AND s.threshold = b.b.t
"""


@query("gini_stump_conversion", oracle=_CART_ORACLE)
def q_gini_stump_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best Gini split for predicting post-period conversion from
    pre-period (event count, error count): one row — chosen feature and
    threshold, both children's exact class counts, majority-vote leaf
    predictions, and the split vs root impurity in ppm. See the module
    docstring for the prefix-scan split-finding recipe and the
    exactness bounds."""
    from ..sources.catalog import read_events

    events = read_events(spark, sf_dir)
    cut = F.lit(CART_CUT).cast("timestamp_ntz")
    pre = (
        events.where(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pre"),
            F.sum((F.col("event_type") == "error").cast("long"))
            .cast("long")
            .alias("n_err"),
        )
    )
    post = (
        events.where(
            (F.col("ts") >= cut) & (F.col("event_type") == "purchase")
        )
        .select(F.col("user_id").alias("pu"))
        .distinct()
    )
    units = pre.join(post, pre.user_id == post.pu, "left").select(
        "n_pre",
        "n_err",
        F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias("y"),
    )
    melted = units.select(
        F.lit("n_pre").alias("feature"), F.col("n_pre").alias("v"), "y"
    ).unionByName(
        units.select(
            F.lit("n_err").alias("feature"), F.col("n_err").alias("v"), "y"
        )
    )
    hist = melted.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = Window.partitionBy("feature")
    scan = hist.select(
        "feature",
        "v",
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("pos").over(w).cast("long").alias("pos_l"),
        F.sum("n").over(t).cast("long").alias("n_tot"),
        F.sum("pos").over(t).cast("long").alias("pos_tot"),
    )
    cand = scan.where(F.col("n_tot") - F.col("n_l") > 0).select(
        "feature",
        F.col("v").alias("threshold"),
        "n_l",
        "pos_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        (F.col("pos_tot") - F.col("pos_l")).alias("pos_r"),
        "n_tot",
        "pos_tot",
    )
    scored = cand.withColumn(
        "gini_ppm",
        F.expr(
            "CAST(((n_r * (n_l * n_l - pos_l * pos_l"
            " - (n_l - pos_l) * (n_l - pos_l))"
            " + n_l * (n_r * n_r - pos_r * pos_r"
            " - (n_r - pos_r) * (n_r - pos_r)))"
            " * 1000000) div (n_l * n_r * n_tot) AS BIGINT)"
        ),
    )
    best = scored.agg(
        F.min(
            F.struct(
                F.col("gini_ppm").alias("g"),
                F.col("feature").alias("f"),
                F.col("threshold").alias("t"),
            )
        ).alias("b")
    )
    return (
        scored.join(
            F.broadcast(best),
            (F.col("gini_ppm") == F.col("b.g"))
            & (F.col("feature") == F.col("b.f"))
            & (F.col("threshold") == F.col("b.t")),
        )
        .select(
            "feature",
            F.col("threshold").cast("long"),
            "gini_ppm",
            F.col("n_l").alias("n_left"),
            F.col("pos_l").alias("pos_left"),
            F.col("n_r").alias("n_right"),
            F.col("pos_r").alias("pos_right"),
            (F.col("pos_l") * 2 > F.col("n_l")).alias("pred_left"),
            (F.col("pos_r") * 2 > F.col("n_r")).alias("pred_right"),
            F.expr(
                "CAST(((n_tot * n_tot - pos_tot * pos_tot"
                " - (n_tot - pos_tot) * (n_tot - pos_tot))"
                " * 1000000) div (n_tot * n_tot) AS BIGINT)"
            ).alias("root_gini_ppm"),
        )
    )
