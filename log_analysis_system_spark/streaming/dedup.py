"""Streaming deduplication — the stream-side half of the corpus dedup story.

Not present in the reference: its DStream pipeline counts duplicate
deliveries twice (Kafka direct stream is at-least-once into
reduceByKey, reference: src/main/java/com/soto/spark/ad/
AdClickRealTimeSpark.java:232-263 — a redelivered batch increments state
again). Structured Streaming makes exactly-once-per-record a one-line
declaration with BOUNDED state: ``dropDuplicatesWithinWatermark`` keeps each
key only until the watermark passes it, so state size is
O(rate x watermark), not O(stream lifetime).

At 100 TB/day ingest this is the first stage of the corpus pipeline
(``queries/corpus_pipeline.py`` is the batch form): dedup at the door with a
short watermark, so every downstream aggregate sees each record once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    parsed: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered records: rows equal on ``id_cols`` whose event times
    fall within ``watermark`` of each other collapse to the first arrival.

    State per key is dropped once the watermark passes its event time —
    the retention contract: a duplicate arriving LATER than the watermark
    window is not suppressed (pick the watermark from the source's
    redelivery horizon, e.g. the Kafka transaction timeout, not from a
    guess about data lateness).
    """
    return parsed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
