"""Trained multinomial Naive Bayes text classifier, evaluated on a held-
out split — the classic supervised complement of the heuristic `lang_id`
scorer and the logistic `quality_discriminator`.

Train/eval protocol: docs with doc_id % 4 != 0 train the model, the rest
are scored. Training reduces the corpus to the bounded model tables —
per-(class, word) token counts, per-class token totals, vocabulary size,
class priors — all exact integers from hash-aggs. Scoring is a
broadcast-shaped join: eval tokens cross the |classes|-row class table,
left-join the (class, word) count table, and every per-token add-1
log-likelihood floor(ln((c_cw + 1) / (n_c + V)) * 1e6) lands as integer
micro-nats (the bigram-LM recipe; boundary clearance for every distinct
argument combo is audited in tests/test_micro_nat_boundary.py). Per-doc
per-class scores are exact bigint sums of those micro-nats plus the
floored log-prior; argmax is a min(struct(-score, class)) — total order,
tiebreak on class name — so prediction is engine-deterministic.

Scale shape: the model tables are O(|classes| x vocab), independent of
corpus size; scoring shuffles once on (doc, class) and once on doc; the
confusion matrix is |classes|^2 rows. Nothing iterates, nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

NB_SCALE = 1_000_000  # micro-nats

# Shared CTE text: model tables + per-(doc, class) scores. Kept as one
# string so the oracle and the boundary audit in
# tests/test_micro_nat_boundary.py can never drift from each other.
NB_CTES = """
train AS (
    SELECT lang, text FROM documents WHERE doc_id % 4 <> 0
),
eval_docs AS (
    SELECT doc_id, lang AS true_lang, text FROM documents
    WHERE doc_id % 4 = 0
),
tr_toks AS (
    SELECT lang, w AS word FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM train
    ) WHERE w <> ''
),
cw AS (
    SELECT lang, word, CAST(count(*) AS BIGINT) AS c_cw
    FROM tr_toks GROUP BY 1, 2
),
nc AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_c FROM tr_toks GROUP BY 1
),
vocab AS (
    SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM tr_toks
),
prior AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS d_c,
           (SELECT CAST(count(*) AS BIGINT) FROM train) AS d_tot
    FROM train GROUP BY 1
),
ev_toks AS (
    SELECT doc_id, true_lang, w AS word FROM (
        SELECT doc_id, true_lang, unnest(string_split(text, ' ')) AS w
        FROM eval_docs
    ) WHERE w <> ''
),
tok_ll AS (
    SELECT t.doc_id, t.true_lang, nc.lang,
           CAST(floor(ln((coalesce(cw.c_cw, 0) + 1)
                         / CAST(nc.n_c + vocab.v AS DOUBLE))
                      * 1000000) AS BIGINT) AS ll_micro
    FROM ev_toks t
    CROSS JOIN nc CROSS JOIN vocab
    LEFT JOIN cw ON cw.lang = nc.lang AND cw.word = t.word
),
doc_scores AS (
    SELECT s.doc_id, s.true_lang, s.lang,
           CAST(sum(s.ll_micro)
                + any_value(CAST(floor(ln(p.d_c / CAST(p.d_tot AS DOUBLE))
                                       * 1000000) AS BIGINT))
                AS BIGINT) AS score
    FROM tok_ll s JOIN prior p ON p.lang = s.lang
    GROUP BY 1, 2, 3
)
"""

_NB_ORACLE = f"""
WITH {NB_CTES},
pred AS (
    SELECT doc_id, true_lang,
           min(struct_pack(negscore := -score, lang := lang)).lang
               AS pred_lang
    FROM doc_scores GROUP BY 1, 2
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
"""


def nb_count_partials(train_df: DataFrame):
    """Additive model-count tables from a batch of TRAIN docs:
    (lang, word, c_cw) token counts and (lang, d_c) doc counts. Both are
    SUM-mergeable across batches, and every other model table (per-class
    token totals, vocabulary size, priors) derives from the merged
    counts — which is what makes the NB trainer incrementally
    maintainable (`streaming/nbayes.py`)."""
    tr_toks = train_df.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    cw = tr_toks.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c_cw")
    )
    dc = train_df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("d_c")
    )
    return cw, dc


def nb_confusion_from_counts(
    spark: SparkSession, cw: DataFrame, dc: DataFrame, eval_docs: DataFrame
) -> DataFrame:
    """Shared scoring body: train-count tables + eval docs ->
    (true_lang, pred_lang, n_docs) confusion matrix. Used by the batch
    query below and the streaming trainer's serve path, so the two
    tiers cannot drift."""
    nc = cw.groupBy("lang").agg(F.sum("c_cw").cast("long").alias("n_c"))
    vocab = cw.select("word").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    prior = (
        dc.crossJoin(
            F.broadcast(dc.agg(F.sum("d_c").cast("long").alias("d_tot")))
        )
        .select(
            "lang",
            F.expr(
                f"CAST(floor(ln(d_c / CAST(d_tot AS DOUBLE)) "
                f"* {NB_SCALE}) AS BIGINT)"
            ).alias("prior_micro"),
        )
    )
    ev_toks = (
        eval_docs.select(
            "doc_id",
            "true_lang",
            F.explode(F.split("text", " ")).alias("word"),
        )
        .where(F.col("word") != "")
    )
    classes = nc.crossJoin(F.broadcast(vocab))  # (lang, n_c, v)
    tok_ll = (
        ev_toks.crossJoin(F.broadcast(classes))
        .join(F.broadcast(cw), ["lang", "word"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.expr(
                f"CAST(floor(ln((coalesce(c_cw, 0) + 1) "
                f"/ CAST(n_c + v AS DOUBLE)) * {NB_SCALE}) AS BIGINT)"
            ).alias("ll_micro"),
        )
    )
    doc_scores = (
        tok_ll.groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum("ll_micro").cast("long").alias("ll"))
        .join(F.broadcast(prior), "lang")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (F.col("ll") + F.col("prior_micro")).cast("long").alias(
                "score"
            ),
        )
    )
    pred = (
        doc_scores.groupBy("doc_id", "true_lang")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("negscore"),
                    F.col("lang").alias("lang"),
                )
            ).alias("m")
        )
        .select("true_lang", F.col("m.lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@query("nb_lang_confusion", oracle=_NB_ORACLE)
def q_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix of the trained multinomial Naive Bayes
    language classifier (add-1 smoothing, integer micro-nat scoring).
    See the module docstring for the training protocol and the
    determinism argument."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    train = docs.where(F.col("doc_id") % 4 != 0)
    evald = docs.where(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    cw, dc = nb_count_partials(train)
    return nb_confusion_from_counts(spark, cw, dc, evald)
