"""Streaming dedup: at-least-once redelivery collapsed to exactly-once with
bounded (watermark-scoped) state — a capability the reference's DStream
pipeline lacks (redelivered batches double-count)."""

from __future__ import annotations

from tests.test_streaming import _record, _write_chunk, stream_env  # noqa: F401

from log_analysis_system_spark.streaming.ad_analytics import build_file_stream
from log_analysis_system_spark.streaming.dedup import dedup_within_watermark


def test_redelivered_records_are_dropped(spark, stream_env):  # noqa: F811
    r_a = _record(0, "Jiangsu", "Nanjing", 1, 9)
    r_b = _record(5, "Zhejiang", "Hangzhou", 2, 5)
    r_c = _record(30, "Jiangsu", "Suzhou", 3, 7)

    # Batch 1 carries an in-batch duplicate of r_a; batch 2 redelivers r_b
    # (cross-batch duplicate) alongside the new r_c.
    _write_chunk(stream_env["input"], "batch1.txt", [r_a, r_a, r_b])

    stream = build_file_stream(spark, stream_env["input"])
    deduped = dedup_within_watermark(
        stream, ["ts", "user_id", "ad_id"], watermark="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", stream_env["ckpt"])
        .start()
    )
    try:
        q.processAllAvailable()
        _write_chunk(stream_env["input"], "batch2.txt", [r_b, r_c])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, ad_id FROM dedup_sink ORDER BY user_id"
        ).collect()
    finally:
        q.stop()

    # 5 input records -> 3 distinct: both duplicate deliveries suppressed.
    assert [(r["user_id"], r["ad_id"]) for r in rows] == [(1, 9), (2, 5), (3, 7)]
