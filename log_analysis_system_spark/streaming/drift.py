"""Streaming distribution-drift monitor: per-micro-batch bucket counts
appended as idempotent partials, PSI served on demand against a pinned
reference window.

The batch `drift_psi` query answers "did the second half of the month
drift from the first"; a production ingest wants the same answer
CONTINUOUSLY — is what's arriving NOW still shaped like the corpus the
model was trained on? This module watches the SAME features through the
shared `drift_labels` helper, so batch and streaming monitors can never
disagree about what they measure (the equivalence test pins it).

Design = the incremental rollup store's contract applied to counts:
counts are mergeable partials, each micro-batch writes its own
``batches/batch=<id>`` dir (a replayed batch overwrites itself with
byte-identical content — exactly-once without marker files), and serving
merges partials + joins the reference. State per batch is O(buckets),
never O(rows); nothing about the stream's length accumulates anywhere
except the bounded bucket table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.data_quality import drift_labels, psi_report


def bucket_counts(ev: DataFrame) -> DataFrame:
    """(feature, label, n) counts of the drift features for a batch."""
    return drift_labels(ev).groupBy("feature", "label").agg(
        F.count(F.lit(1)).alias("n")
    )


def append_drift_batch(batch_df: DataFrame, store_dir: str, batch_id: int) -> None:
    """foreachBatch body: persist ONE micro-batch's bucket counts.
    Deterministic content + per-batch dir = idempotent under replay."""
    bucket_counts(batch_df).write.mode("overwrite").parquet(
        f"{store_dir}/batches/batch={batch_id}"
    )


def serve_drift(spark, store_dir: str, reference: DataFrame) -> DataFrame:
    """Merge the streamed partials into the observed distribution and emit
    per-bucket PSI contributions vs the reference counts (feature, label,
    n). Reads O(batches x buckets) partial rows — never the stream."""
    broot = os.path.join(store_dir, "batches")
    dirs = [
        os.path.join(broot, d)
        for d in sorted(os.listdir(broot))
        if d.startswith("batch=")
    ]
    if not dirs:
        raise FileNotFoundError(f"no drift partials under {store_dir}")
    parts = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        parts = parts.unionByName(spark.read.parquet(d))
    observed = parts.groupBy("feature", "label").agg(F.sum("n").alias("n"))
    return psi_report(reference, observed)


def drift_monitor(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Attach the monitor to a streaming events DataFrame."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: append_drift_batch(b, store_dir, i)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ------------------------------------------- streaming level-shift monitor

def daily_counts(ev: DataFrame) -> DataFrame:
    """(d, x) daily event counts for a batch — mergeable partials for the
    CUSUM monitor (counts on the same day sum across batches)."""
    return ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )


def append_daily_batch(batch_df: DataFrame, store_dir: str, batch_id: int) -> None:
    """foreachBatch body for the level-shift monitor: persist one
    micro-batch's daily counts (overwrite-idempotent under replay)."""
    daily_counts(batch_df).write.mode("overwrite").parquet(
        f"{store_dir}/daily/batch={batch_id}"
    )


def serve_change_point(spark, store_dir: str) -> DataFrame:
    """Merge the streamed daily-count partials and run the SAME exact-
    integer CUSUM scoring the batch query uses (`temporal.cusum_top`) —
    the continuously-updatable "when did the level shift" monitor. State
    is O(days), never O(events)."""
    from ..queries.temporal import cusum_top

    broot = os.path.join(store_dir, "daily")
    dirs = [
        os.path.join(broot, d)
        for d in sorted(os.listdir(broot))
        if d.startswith("batch=")
    ]
    if not dirs:
        raise FileNotFoundError(f"no daily partials under {store_dir}")
    parts = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        parts = parts.unionByName(spark.read.parquet(d))
    daily = parts.groupBy("d").agg(F.sum("x").alias("x"))
    return cusum_top(daily)


def level_shift_monitor(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Attach the CUSUM level-shift monitor to a streaming events frame."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: append_daily_batch(b, store_dir, i)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ------------------------------------------- streaming sequential test

def append_sprt_batch(batch_df: DataFrame, store_dir: str, batch_id: int) -> None:
    """foreachBatch body for the SPRT monitor: persist one micro-batch's
    per-day (successes, trials) partials (overwrite-idempotent under
    replay; same-day partials from different batches sum at serve time)."""
    from ..queries.stats_models import sprt_daily_counts

    sprt_daily_counts(batch_df).write.mode("overwrite").parquet(
        f"{store_dir}/sprt/batch={batch_id}"
    )


def serve_sprt(spark, store_dir: str) -> DataFrame:
    """Merge the streamed (day, s, n) partials and run the SAME exact-
    integer Wald scoring the batch query uses (`stats_models.sprt_score`)
    — the continuously-updatable "can we already call the experiment"
    monitor: every appended batch can only extend or tighten the verdict
    sequence, never rewrite history (partials are additive). State is
    O(days), never O(events)."""
    from ..queries.stats_models import sprt_score

    broot = os.path.join(store_dir, "sprt")
    dirs = [
        os.path.join(broot, d)
        for d in sorted(os.listdir(broot))
        if d.startswith("batch=")
    ]
    if not dirs:
        raise FileNotFoundError(f"no sprt partials under {store_dir}")
    parts = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        parts = parts.unionByName(spark.read.parquet(d))
    daily = parts.groupBy("day").agg(
        F.sum("s").cast("long").alias("s"),
        F.sum("n").cast("long").alias("n"),
    )
    return sprt_score(daily)


def sprt_monitor(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Attach the sequential-test monitor to a streaming events frame."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: append_sprt_batch(b, store_dir, i)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# --------------------------------- streaming Wasserstein (W1) monitor

def append_w1_batch(batch_df: DataFrame, store_dir: str, batch_id: int) -> None:
    """foreachBatch body for a streaming DOCUMENTS frame: persist one
    micro-batch's (source, bucket, n) length-bucket counts — mergeable
    partials, idempotent under replay (per-batch dir, deterministic
    content; the `append_drift_batch` contract)."""
    from ..queries.data_quality import length_bucket_counts

    length_bucket_counts(batch_df).write.mode("overwrite").parquet(
        f"{store_dir}/batches/batch={batch_id}"
    )


def _merged_w1_counts(spark, store_dir: str) -> DataFrame:
    import os as _os

    broot = _os.path.join(store_dir, "batches")
    dirs = [
        _os.path.join(broot, d)
        for d in sorted(_os.listdir(broot))
        if d.startswith("batch=")
    ]
    if not dirs:
        raise FileNotFoundError(f"no W1 partials under {store_dir}")
    # One multi-path scan: plan depth and footer reads stay O(1) in the
    # number of batches (counts re-aggregate below, so order is moot).
    parts = spark.read.parquet(*dirs)
    return parts.groupBy("source", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def serve_w1(spark, store_dir: str, reference: DataFrame | None = None) -> DataFrame:
    """Serve per-source 1-D Wasserstein distances from the streamed
    partials — O(batches x buckets) rows read, never the stream.

    reference=None: each source vs the REST of the streamed corpus — the
    exact batch `wasserstein_source_drift` semantics (the parity test
    pins served == batch on the same data). reference=(bucket, n)
    corpus-level counts: each source's streamed distribution vs the
    PINNED reference (the production mode — is what THIS source sends
    now still shaped like the corpus the model trained on?)."""
    from ..queries.data_quality import (
        rest_of_corpus_cells,
        w1_from_cells,
    )

    merged = _merged_w1_counts(spark, store_dir)
    if reference is None:
        return w1_from_cells(rest_of_corpus_cells(merged))
    ref = reference.select("bucket", F.col("n").cast("long").alias("cb"))
    grid = (
        merged.select("bucket")
        .unionByName(ref.select("bucket"))
        .distinct()
    )
    cells = (
        merged.select("source")
        .distinct()
        .crossJoin(F.broadcast(grid))
        .join(merged.withColumnRenamed("n", "ca"), ["source", "bucket"], "left")
        .join(F.broadcast(ref), "bucket", "left")
        .select(
            "source",
            "bucket",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    return w1_from_cells(cells)


def w1_monitor(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Attach the Wasserstein drift monitor to a streaming documents frame."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: append_w1_batch(b, store_dir, i)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# --------------------------------- streaming burst monitor (Viterbi serve)

def serve_burst(spark, store_dir: str):
    """Merge the streamed daily-count partials (the `daily_counts`
    store the CUSUM monitor already writes — counts are additive, so
    the same partials feed both monitors) and run the SAME two-state
    Viterbi scoring body the batch `burst_detection_days` query uses
    (`temporal.burst_label_days`) — the continuously-updatable "are we
    inside a burst episode" monitor. State is O(days), never
    O(events)."""
    from ..queries.temporal import burst_label_days

    broot = os.path.join(store_dir, "daily")
    dirs = [
        os.path.join(broot, d)
        for d in sorted(os.listdir(broot))
        if d.startswith("batch=")
    ]
    if not dirs:
        raise FileNotFoundError(f"no daily partials under {store_dir}")
    parts = spark.read.parquet(*dirs)
    daily = parts.groupBy("d").agg(F.sum("x").cast("long").alias("x")).select(
        F.col("d").alias("day"), "x"
    )
    return burst_label_days(daily)
