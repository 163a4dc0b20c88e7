"""Streaming drift monitor: the served PSI report over a streamed window-B
must EQUAL the batch drift_psi query on the same data — batch and streaming
monitors watch identical features through the shared drift_labels helper."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.queries.data_quality import DRIFT_CUT
from log_analysis_system_spark.sources.catalog import read_events
from log_analysis_system_spark.streaming.drift import (
    append_drift_batch,
    bucket_counts,
    drift_monitor,
    serve_drift,
)
from tests.conftest import SF_DIR

load_all()


def test_streamed_psi_equals_batch_query(spark, tmp_path):
    ev = read_events(spark, SF_DIR)
    cut = F.lit(f"{DRIFT_CUT} 00:00:00").cast("timestamp_ntz")
    ref = bucket_counts(ev.where(F.col("ts") < cut))

    # window B arrives as two parquet chunks -> two micro-batches
    inp = str(tmp_path / "input")
    win_b = ev.where(F.col("ts") >= cut)
    win_b.where(F.col("event_id") % 2 == 0).write.parquet(f"{inp}/c1.parquet")
    win_b.where(F.col("event_id") % 2 == 1).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = drift_monitor(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    batches = os.listdir(os.path.join(store, "batches"))
    assert len(batches) >= 2, batches

    served = {tuple(r) for r in serve_drift(spark, store, ref).collect()}
    batch = {tuple(r) for r in QUERIES["drift_psi"](spark, SF_DIR).collect()}
    assert served == batch and served


def test_replayed_batch_changes_nothing(spark, tmp_path):
    ev = read_events(spark, SF_DIR)
    cut = F.lit(f"{DRIFT_CUT} 00:00:00").cast("timestamp_ntz")
    ref = bucket_counts(ev.where(F.col("ts") < cut))
    win_b = ev.where(F.col("ts") >= cut)

    store = str(tmp_path / "store")
    append_drift_batch(win_b, store, 0)
    before = {tuple(r) for r in serve_drift(spark, store, ref).collect()}
    append_drift_batch(win_b, store, 0)  # crash-replay of the same batch
    after = {tuple(r) for r in serve_drift(spark, store, ref).collect()}
    assert before == after and before


def test_streamed_change_point_equals_batch_query(spark, tmp_path):
    """The served CUSUM change point over streamed daily counts must equal
    the batch cusum_change_point query — batch and streaming monitors
    share the exact-integer scoring body."""
    ev = read_events(spark, SF_DIR)
    inp = str(tmp_path / "input")
    ev.where(F.col("event_id") % 2 == 0).write.parquet(f"{inp}/c1.parquet")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(f"{inp}/c2.parquet")

    from log_analysis_system_spark.streaming.drift import (
        level_shift_monitor,
        serve_change_point,
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = level_shift_monitor(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    served = {tuple(r) for r in serve_change_point(spark, store).collect()}
    batch = {
        tuple(r) for r in QUERIES["cusum_change_point"](spark, SF_DIR).collect()
    }
    assert served == batch and served


def test_streamed_sprt_equals_batch_query(spark, tmp_path):
    """Served SPRT verdicts over a streamed event feed must EQUAL the
    batch sprt_conversion_monitor on the same data — the scoring body
    (stats_models.sprt_score) is shared, so only the partial-merge path
    is under test, including same-day counts split across micro-batches."""
    ev = read_events(spark, SF_DIR)
    inp = str(tmp_path / "input")
    # split by event parity so most DAYS straddle both micro-batches —
    # the merge must sum same-day partials, not just concatenate them
    ev.where(F.col("event_id") % 2 == 0).write.parquet(f"{inp}/c1.parquet")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    from log_analysis_system_spark.streaming.drift import (
        append_sprt_batch,
        serve_sprt,
        sprt_monitor,
    )

    store = str(tmp_path / "store")
    q = sprt_monitor(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert len(os.listdir(os.path.join(store, "sprt"))) >= 2

    served = {
        tuple(r) for r in serve_sprt(spark, store).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["sprt_conversion_monitor"](spark, SF_DIR).collect()
    }
    assert served == batch and served

    # crash-replay idempotence: re-appending batch 0 changes nothing
    append_sprt_batch(
        read_events(spark, SF_DIR).where(F.col("event_id") % 2 == 0),
        store,
        0,
    )
    again = {tuple(r) for r in serve_sprt(spark, store).collect()}
    assert again == served


def test_streamed_w1_equals_batch_query(spark, tmp_path):
    """The served per-source Wasserstein distances over a streamed
    documents corpus must EQUAL the batch wasserstein_source_drift query
    on the same data — both run the shared length_bucket_counts /
    w1_from_cells bodies."""
    from log_analysis_system_spark.streaming.drift import (
        append_w1_batch,
        serve_w1,
        w1_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inp = str(tmp_path / "docs_in")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(f"{inp}/c1.parquet")
    docs.where(F.col("doc_id") % 2 == 1).write.parquet(f"{inp}/c2.parquet")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "w1_store")
    q = w1_monitor(stream, store, str(tmp_path / "w1_ckpt"))
    q.processAllAvailable()
    q.stop()

    served = {tuple(r) for r in serve_w1(spark, store).collect()}
    batch = {
        tuple(r)
        for r in QUERIES["wasserstein_source_drift"](spark, SF_DIR).collect()
    }
    assert served == batch and served

    # crash-replay: re-appending batch 0 changes nothing
    append_w1_batch(
        docs.where(F.col("doc_id") % 2 == 0), store, 0
    )
    again = {tuple(r) for r in serve_w1(spark, store).collect()}
    assert again == served

    # pinned-reference mode: sources vs the corpus-level counts
    from log_analysis_system_spark.queries.data_quality import (
        length_bucket_counts,
    )

    ref = (
        length_bucket_counts(docs)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    vs_ref = serve_w1(spark, store, ref).collect()
    assert len(vs_ref) == 20 and all(r["w1_milli"] >= 0 for r in vs_ref)


def test_streamed_burst_labels_equal_batch_query(spark, tmp_path):
    """The served burst labels over streamed daily-count partials must
    EQUAL the batch burst_detection_days query — daily counts are
    additive across micro-batches (same-day partials merge exactly) and
    the Viterbi scoring body (temporal.burst_label_days) is shared, so
    only the partial-merge path is under test."""
    from log_analysis_system_spark.streaming.drift import (
        append_daily_batch,
        serve_burst,
    )

    ev = read_events(spark, SF_DIR)
    store = str(tmp_path / "store")
    # split by event parity so every DAY straddles both batches
    append_daily_batch(ev.where(F.col("event_id") % 2 == 0), store, 0)
    append_daily_batch(ev.where(F.col("event_id") % 2 == 1), store, 1)

    served = {tuple(r) for r in serve_burst(spark, store).collect()}
    batch = {
        tuple(r)
        for r in QUERIES["burst_detection_days"](spark, SF_DIR).collect()
    }
    assert served == batch and served
