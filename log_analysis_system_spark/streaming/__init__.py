from .ad_analytics import (
    build_file_stream,
    build_kafka_stream,
    parse_ad_click_log,
    AdAnalyticsPipeline,
    sliding_window_counts,
    cumulative_stats,
    province_top3,
)

__all__ = [
    "build_file_stream",
    "build_kafka_stream",
    "parse_ad_click_log",
    "AdAnalyticsPipeline",
    "sliding_window_counts",
    "cumulative_stats",
    "province_top3",
]
