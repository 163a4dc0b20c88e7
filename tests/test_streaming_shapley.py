"""Streaming Shapley monitor: the attribution table served from streamed
per-batch touch minima must EQUAL the batch `shapley_attribution` query
on the same data — the scoring body is shared, and the min-monoid
partials must reconstruct the identical coalition masks regardless of
how events are split across micro-batches (including events of one user
landing in different batches, and a purchase arriving AFTER the touches
it truncates)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.sources.catalog import read_events
from log_analysis_system_spark.streaming.shapley import (
    append_shapley_batch,
    serve_shapley,
    shapley_monitor,
)
from tests.conftest import SF_DIR

load_all()


def test_streamed_shapley_equals_batch_query(spark, tmp_path):
    ev = read_events(spark, SF_DIR)

    # split by event_id parity — every user's journey is sliced across
    # the two micro-batches, so per-batch state alone cannot answer
    inp = str(tmp_path / "input")
    ev.where(F.col("event_id") % 2 == 0).write.parquet(f"{inp}/c1.parquet")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = shapley_monitor(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    batches = os.listdir(os.path.join(store, "batches"))
    assert len(batches) >= 2, batches

    served = {tuple(r) for r in serve_shapley(spark, store).collect()}
    batch = {
        tuple(r)
        for r in QUERIES["shapley_attribution"](spark, SF_DIR).collect()
    }
    assert served == batch and served


def test_replayed_batch_changes_nothing(spark, tmp_path):
    ev = read_events(spark, SF_DIR)
    store = str(tmp_path / "store")
    half = ev.where(F.col("event_id") % 2 == 0)
    append_shapley_batch(half, store, 0)
    append_shapley_batch(ev.where(F.col("event_id") % 2 == 1), store, 1)
    before = {tuple(r) for r in serve_shapley(spark, store).collect()}
    # replay batch 0 (crash-after-write, restart re-delivers)
    append_shapley_batch(half, store, 0)
    after = {tuple(r) for r in serve_shapley(spark, store).collect()}
    assert before == after
