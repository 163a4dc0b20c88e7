"""Stream-stream interval join: ad-click attribution.

Beyond the reference: DStreams could only join a stream against a static
table per batch (reference J8, src/main/java/com/soto/spark/ad/
AdClickRealTimeSpark.java:178-179) — correlating TWO live streams required
routing one through external storage. Structured Streaming joins them
directly, with watermarks bounding the buffered state on both sides.

State contract: each side buffers rows until its watermark passes
``join horizon + lateness``; a click landing within ``horizon`` of its
impression attributes exactly once. This is the standard ads funnel
(impression → click) and the same shape as any event-correlation pipeline
(auth → action, request → error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    horizon: str = "2 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join click events to the impression they follow within ``horizon``
    on (user_id, ad_id). Interval join; both sides watermarked so Spark can
    prove when buffered impressions/clicks are no longer joinable and evict
    them (unbounded state otherwise — the planner rejects the join without
    both watermark and time bound).

    ``how="leftOuter"`` additionally emits each UNMATCHED impression once —
    with null click columns — as soon as the watermark proves no click can
    still arrive for it (imp_ts + horizon < watermark). That is the
    unattributed-impression feed every ads pipeline reports on, and it
    exercises the state store's timeout-driven null emission rather than
    match-driven output."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type for attribution: {how!r}")
    imp = impressions.withWatermark("ts", watermark).select(
        F.col("user_id").alias("i_user"),
        F.col("ad_id").alias("i_ad"),
        F.col("ts").alias("imp_ts"),
    )
    clk = clicks.withWatermark("ts", watermark).select(
        "user_id", "ad_id", F.col("ts").alias("click_ts")
    )
    return imp.join(
        clk,
        F.expr(
            f"i_user = user_id AND i_ad = ad_id "
            f"AND click_ts >= imp_ts "
            f"AND click_ts <= imp_ts + interval {horizon}"
        ),
        how,
    ).select(
        F.coalesce("user_id", "i_user").alias("user_id"),
        F.coalesce("ad_id", "i_ad").alias("ad_id"),
        "imp_ts",
        "click_ts",
    )
