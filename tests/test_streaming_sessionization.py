"""Streaming sessionization: built-in session_window and the custom
applyInPandasWithState operator, driven through real file-source streams."""

from __future__ import annotations

import os

import pytest

from log_analysis_system_spark.streaming.sessionization import (
    session_window_aggregate,
    stateful_session_stats,
)

BASE_MS = 1704067200000  # 2024-01-01 00:00:00 UTC


def _write_parquet_chunk(spark, path: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(path, exist_ok=True)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, name))


def _stream(spark, path: str):
    return (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def _t(spark, offset_s: int):
    from datetime import datetime, timedelta

    return datetime(2024, 1, 1) + timedelta(seconds=offset_s)


def test_session_window_groups_by_gap(spark, tmp_path):
    inp = str(tmp_path / "in")
    rows = [
        (1, _t(spark, 0)),
        (1, _t(spark, 60)),        # same session (gap 1 min < 30)
        (1, _t(spark, 60 + 3600)), # new session (gap 1 h)
        (2, _t(spark, 0)),
    ]
    _write_parquet_chunk(spark, inp, "c1", rows)
    out = session_window_aggregate(_stream(spark, inp), gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["session_start"].isoformat()): r["step_length"]
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    assert got[(1, "2024-01-01T00:00:00")] == 2
    assert got[(1, "2024-01-01T01:01:00")] == 1
    assert got[(2, "2024-01-01T00:00:00")] == 1


def test_stateful_sessionization_across_batches(spark, tmp_path):
    """The custom operator must carry the open session across micro-batches
    and close it when a later batch's events exceed the gap."""
    inp = str(tmp_path / "in")
    _write_parquet_chunk(
        spark, inp, "c1", [(1, _t(spark, 0)), (1, _t(spark, 30))]
    )
    out = stateful_session_stats(_stream(spark, inp), gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_state")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    rows1 = {
        (r["status"], r["step_length"])
        for r in spark.sql("SELECT * FROM sess_state").collect()
    }
    assert ("open", 2) in rows1

    # batch 2: event 2 hours later -> closes the first session (2 steps),
    # opens a new one (1 step)
    _write_parquet_chunk(spark, inp, "c2", [(1, _t(spark, 2 * 3600))])
    q.processAllAvailable()
    q.stop()
    rows2 = [
        (r["status"], r["step_length"], r["session_start"].isoformat())
        for r in spark.sql("SELECT * FROM sess_state").collect()
    ]
    assert ("closed", 2, "2024-01-01T00:00:00") in rows2
    assert ("open", 1, "2024-01-01T02:00:00") in rows2
