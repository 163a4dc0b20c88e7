"""Streaming OOV monitor: the served per-source audit over a streamed
held-out split must EQUAL the batch bpe_oov_audit on the same data —
batch and stream score through the shared oov_score helper against the
same trained vocab."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.queries.bpe import (
    N_MERGES,
    train_bpe,
    vocab_to_map,
    word_vocab,
)
from log_analysis_system_spark.streaming.oov import (
    append_oov_batch,
    oov_monitor,
    serve_oov,
)
from tests.conftest import SF_DIR

load_all()


def test_streamed_oov_equals_batch_query(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _, final = train_bpe(
        word_vocab(docs.where(F.col("doc_id") % 2 == 0)), N_MERGES
    )
    vocab_map = vocab_to_map(final).localCheckpoint()

    # the held-out split arrives as two parquet chunks -> two micro-batches
    inp = str(tmp_path / "input")
    val = docs.where(F.col("doc_id") % 2 == 1)
    val.where(F.col("doc_id") % 4 == 1).write.parquet(f"{inp}/c1.parquet")
    val.where(F.col("doc_id") % 4 == 3).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = oov_monitor(stream, vocab_map, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    served = {tuple(r) for r in serve_oov(spark, store).collect()}
    batch = {
        tuple(r) for r in QUERIES["bpe_oov_audit"](spark, SF_DIR).collect()
    }
    assert served == batch and served

    # replayed batch (crash retry) changes nothing
    append_oov_batch(
        val.where(F.col("doc_id") % 4 == 1), vocab_map, store, 0
    )
    assert {tuple(r) for r in serve_oov(spark, store).collect()} == batch
