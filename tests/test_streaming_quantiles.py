"""Streaming quantile-rollup twin: served percentiles from streamed
per-batch summaries must EQUAL the batch `quantile_summary_rollup`
estimates when micro-batches are day-aligned (the two tiers share the
`qsr_summaries`/`qsr_estimates` bodies verbatim), stay inside the
documented rank-error envelope when days straddle batches, and be
idempotent under crash-replay of a batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.queries.olap_extras import qsr_day_values
from log_analysis_system_spark.sources.catalog import read_events
from log_analysis_system_spark.streaming.quantiles import (
    append_quantile_batch,
    quantile_monitor,
    serve_quantiles,
)
from tests.conftest import SF_DIR

load_all()


def test_day_aligned_stream_equals_batch_query(spark, tmp_path):
    """Each day arrives wholly in one micro-batch (daily-ingest cadence)
    -> the streamed summary union IS the batch summary table and the
    served estimates are bit-identical to the batch query's."""
    ev = read_events(spark, SF_DIR)
    days = sorted(
        r["day"]
        for r in ev.select(F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    assert len(days) >= 2
    cut = days[len(days) // 2]

    inp = str(tmp_path / "input")
    ev.where(F.col("ts").cast("date") <= F.lit(cut)).write.parquet(
        f"{inp}/c1.parquet"
    )
    ev.where(F.col("ts").cast("date") > F.lit(cut)).write.parquet(
        f"{inp}/c2.parquet"
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*.parquet")
    )
    store = str(tmp_path / "store")
    q = quantile_monitor(stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert len(os.listdir(os.path.join(store, "batches"))) >= 2

    served = {tuple(r) for r in serve_quantiles(spark, store).collect()}
    batch = {
        (r["q_bp"], r["est_milli"], r["n_total"])
        for r in QUERIES["quantile_summary_rollup"](spark, SF_DIR).collect()
    }
    assert served == batch and served


def test_split_days_stay_within_rank_error_envelope(spark, tmp_path):
    """Every day straddles both micro-batches (event-parity split) ->
    per-segment summaries merge instead of per-day ones. Estimates need
    not be bit-equal to the batch tier, but the served total must be
    exact and each estimate's TRUE rank must sit within the ~1/R
    worst-case envelope (segment CDF shifts are each <= segment-mass/R
    and add to <= total/R across segments; R=32 -> 31250 ppm, plus
    integer-crossing slack)."""
    ev = read_events(spark, SF_DIR)
    store = str(tmp_path / "store")
    append_quantile_batch(ev.where(F.col("event_id") % 2 == 0), store, 0)
    append_quantile_batch(ev.where(F.col("event_id") % 2 == 1), store, 1)

    served = serve_quantiles(spark, store).collect()
    assert len(served) == 4
    n_total = ev.count()
    v = qsr_day_values(ev)
    for r in served:
        assert r["n_total"] == n_total
        le = v.where(F.col("v") <= int(r["est_milli"])).count()
        rank_ppm = le * 1_000_000 // n_total
        assert abs(rank_ppm - r["q_bp"] * 100) <= 35_000, (
            r["q_bp"],
            rank_ppm,
        )


def test_replayed_batch_changes_nothing(spark, tmp_path):
    ev = read_events(spark, SF_DIR)
    store = str(tmp_path / "store")
    append_quantile_batch(ev, store, 0)
    before = {tuple(r) for r in serve_quantiles(spark, store).collect()}
    append_quantile_batch(ev, store, 0)  # crash-replay of the same batch
    after = {tuple(r) for r in serve_quantiles(spark, store).collect()}
    assert before == after and before
