"""Incremental NB trainer: the confusion matrix served from streamed
count partials must EQUAL the batch `nb_lang_confusion` query on the
same data — model counts are SUM-mergeable, and the scoring body is
shared, so batch and streaming training cannot drift."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.streaming.nbayes import (
    append_nb_batch,
    nb_trainer,
    serve_nb_confusion,
)
from tests.conftest import SF_DIR

load_all()


def _splits(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.where(F.col("doc_id") % 4 != 0)
    evald = docs.where(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    return docs, train, evald


def test_streamed_nb_equals_batch_query(spark, tmp_path):
    docs, train, evald = _splits(spark)

    # skew the batches: one language arrives almost entirely in the
    # second batch, so no single batch sees a representative model
    inp = str(tmp_path / "input")
    is_late = (F.col("lang") == "de") | (F.col("doc_id") % 2 == 1)
    train.where(~is_late).write.parquet(f"{inp}/c1.parquet")
    train.where(is_late).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = nb_trainer(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    assert len(os.listdir(os.path.join(store, "cw"))) >= 2

    served = {
        tuple(r)
        for r in serve_nb_confusion(spark, store, evald).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["nb_lang_confusion"](spark, SF_DIR).collect()
    }
    assert served == batch and served


def test_replayed_batch_changes_nothing(spark, tmp_path):
    _, train, evald = _splits(spark)
    store = str(tmp_path / "store")
    h1 = train.where(F.col("doc_id") % 2 == 0)
    append_nb_batch(h1, store, 0)
    append_nb_batch(train.where(F.col("doc_id") % 2 == 1), store, 1)
    before = {
        tuple(r)
        for r in serve_nb_confusion(spark, store, evald).collect()
    }
    append_nb_batch(h1, store, 0)  # crash-replay redelivery
    after = {
        tuple(r)
        for r in serve_nb_confusion(spark, store, evald).collect()
    }
    assert before == after
