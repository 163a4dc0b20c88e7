"""Stream-stream interval join (impression → click attribution): inner join
across two live file-source streams with watermark-bounded buffering —
the two-stream correlation the reference could only do through MySQL."""

from __future__ import annotations

from tests.test_streaming import _record, _write_chunk  # noqa: F401

from log_analysis_system_spark.streaming.ad_analytics import build_file_stream
from log_analysis_system_spark.streaming.attribution import attribute_clicks


def test_click_attributes_within_horizon(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ckpt")

    # impressions: user 1 sees ad 9 at t=0; user 2 sees ad 5 at t=0
    _write_chunk(
        imp_dir,
        "imps.txt",
        [
            _record(0, "Jiangsu", "Nanjing", 1, 9),
            _record(0, "Zhejiang", "Hangzhou", 2, 5),
        ],
    )
    # clicks: user 1 clicks ad 9 at t=60 (within 2 min: attributed);
    # user 2 clicks ad 5 at t=400 (beyond horizon: dropped);
    # user 1 clicks ad 7 at t=30 (no matching impression: dropped)
    _write_chunk(
        clk_dir,
        "clicks.txt",
        [
            _record(60, "Jiangsu", "Nanjing", 1, 9),
            _record(400, "Zhejiang", "Hangzhou", 2, 5),
            _record(30, "Jiangsu", "Nanjing", 1, 7),
        ],
    )

    joined = attribute_clicks(
        build_file_stream(spark, imp_dir), build_file_stream(spark, clk_dir)
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, ad_id FROM attrib_sink"
        ).collect()
    finally:
        q.stop()

    assert [(r["user_id"], r["ad_id"]) for r in rows] == [(1, 9)]


def test_left_outer_emits_unmatched_on_watermark_expiry(spark, tmp_path):
    """Unmatched impressions must surface with null click_ts once the
    watermark proves no click can still arrive — timeout-driven emission
    from the join state store, not match-driven output."""
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ckpt_outer")

    # user 1 / ad 9 gets a click in-horizon; user 2 / ad 5 never does.
    _write_chunk(
        imp_dir,
        "imps.txt",
        [
            _record(0, "Jiangsu", "Nanjing", 1, 9),
            _record(0, "Zhejiang", "Hangzhou", 2, 5),
        ],
    )
    _write_chunk(clk_dir, "clicks.txt", [_record(60, "Jiangsu", "Nanjing", 1, 9)])

    joined = attribute_clicks(
        build_file_stream(spark, imp_dir),
        build_file_stream(spark, clk_dir),
        how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # Advance BOTH watermarks far past imp_ts + horizon + lateness so
        # the buffered user-2 impression is provably unmatched.
        _write_chunk(imp_dir, "imps2.txt", [_record(10_000, "Jiangsu", "Nanjing", 3, 1)])
        _write_chunk(clk_dir, "clicks2.txt", [_record(10_000, "Jiangsu", "Nanjing", 3, 2)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, ad_id, click_ts FROM attrib_outer_sink"
        ).collect()
    finally:
        q.stop()

    matched = {(r.user_id, r.ad_id) for r in rows if r.click_ts is not None}
    unmatched = {(r.user_id, r.ad_id) for r in rows if r.click_ts is None}
    assert (1, 9) in matched
    assert (2, 5) in unmatched
