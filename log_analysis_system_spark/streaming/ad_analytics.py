"""Realtime ad-click analytics — Structured Streaming re-design of the
reference's DStream job (SURVEY §2.11 ST1-ST6; AdClickRealTimeSpark.java:37-127).

Topology (reference :96-116, preserved):

  kafka/file source → parse → [anti-join blacklist] → per-batch counts →
    cumulative state upsert → blacklist append (feedback) ;
  cumulative state → province top-3 (windowed rank, keyed replace) ;
  parsed stream → 60-min/10-s sliding window counts.

Differences from the reference, by design:
- State lives in the engine (streaming aggregation / parquet state tables),
  not in per-row MySQL probes inside filter() (:313-337) — the reference's
  pattern does one DB round-trip per record, which is exactly what kills a
  1000-executor deployment.
- Watermarks bound state and define late-data semantics explicitly (ST7;
  the DStream version silently miscounts late records).
- Exactly-once sink semantics via foreachBatch + idempotent (keyed-overwrite)
  writes instead of at-least-once upserts.

Kafka is the production source (S4); tests drive the same DAG from a file
source — the transformations are source-agnostic DataFrame functions.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sinks import overwrite_keyed_parquet

BLACKLIST_THRESHOLD = 2  # reference `> 1` is off-by-one vs its narrative (:330)


def build_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "AdRealTimeLog",
) -> DataFrame:
    """S4/ST1: Kafka direct stream (value = 'ts province city userid adid').
    Requires the spark-sql-kafka package on the classpath; raises a clear
    error otherwise (the container has no Kafka jars — tests use files)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:  # pragma: no cover - no kafka jars in test env
        raise RuntimeError(
            "Kafka source unavailable (spark-sql-kafka jars not on classpath); "
            "use build_file_stream for local runs"
        ) from exc
    return parse_ad_click_log(raw.selectExpr("CAST(value AS STRING) AS value"))


def build_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """Test/replay source: text files of the same space-delimited records the
    reference's mock producer emits (MockRealTimeData.java:39-41)."""
    raw = spark.readStream.format("text").load(path).withColumnRenamed(
        "value", "value"
    )
    return parse_ad_click_log(raw)


def parse_ad_click_log(raw: DataFrame) -> DataFrame:
    """Parse 'timestamp(ms) province city userid adid' into typed columns
    (consumer parse: AdClickRealTimeSpark.java:434-446). Works on both batch
    and streaming DataFrames."""
    p = F.split(F.col("value"), " ")
    return raw.select(
        F.timestamp_millis(p.getItem(0).cast("long")).alias("ts"),
        p.getItem(1).alias("province"),
        p.getItem(2).alias("city"),
        p.getItem(3).cast("long").alias("user_id"),
        p.getItem(4).cast("long").alias("ad_id"),
    ).withColumn("date_key", F.date_format("ts", "yyyy-MM-dd"))


def daily_user_ad_counts(parsed: DataFrame) -> DataFrame:
    """A10 shape: per-batch counts keyed (date, user, ad)."""
    return parsed.groupBy("date_key", "user_id", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )


def cumulative_stats(parsed: DataFrame) -> DataFrame:
    """ST4/A11: unbounded running totals per (date, province, city, ad).
    As a streaming aggregation in update mode the engine maintains the state
    the reference kept in updateStateByKey + checkpoint; day-keyed state is
    bounded by watermarking on the event date downstream."""
    return parsed.groupBy("date_key", "province", "city", "ad_id").agg(
        F.count(F.lit(1)).alias("click_count")
    )


def province_top3(cum_state: DataFrame) -> DataFrame:
    """ST5/W2: province rollup of the cumulative state + top-3 per
    (date, province). Implements the documented intent rank<=3 — the
    reference ships `WHERE rank>=3` (AdClickRealTimeSpark.java:658), recorded
    divergence."""
    rolled = cum_state.groupBy("date_key", "province", "ad_id").agg(
        F.sum("click_count").alias("click_count")
    )
    w = Window.partitionBy("date_key", "province").orderBy(
        F.desc("click_count"), F.asc("ad_id")
    )
    return rolled.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)


def sliding_window_counts(
    parsed: DataFrame,
    window: str = "60 minutes",
    slide: str = "10 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """ST6/A13 + ST7: per-ad sliding-window counts with an explicit lateness
    bound (the reference's reduceByKeyAndWindow has none)."""
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "ad_id")
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(F.col("window.start").alias("window_start"), "ad_id", "click_count")
    )


class AdAnalyticsPipeline:
    """ST3 blacklist feedback loop + ST4/ST5 state, on parquet state tables.

    One ``foreachBatch`` per micro-batch (reference: one DStream graph per
    batch), executing:

      1. anti-join the batch against the current blacklist (J8);
      2. fold the surviving clicks into the cumulative (date,user,ad) counts
         (S10 upsert semantics, implemented as idempotent keyed overwrite);
      3. users whose cumulative count crossed the threshold join the
         blacklist (the feedback edge: visible to step 1 of the NEXT batch —
         exactly the reference's MySQL round-trip topology, :96-99,232-403);
      4. maintain cumulative (date,province,city,ad) stats and the derived
         province top-3 (ST4/ST5).

    State tables are parquet directories (test double for MySQL/lakehouse);
    every write is a keyed overwrite so batch replays are idempotent.
    """

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        self.user_counts_path = os.path.join(state_dir, "ad_user_click_count")
        self.blacklist_path = os.path.join(state_dir, "ad_blacklist")
        self.stat_path = os.path.join(state_dir, "ad_stat")
        self.top3_path = os.path.join(state_dir, "ad_province_top3")

    # -- state I/O -----------------------------------------------------------
    def _write_state(self, df: DataFrame, path: str) -> None:
        """Materialize new state beside the old, then swap — never overwrite
        a path that the producing plan is still reading (in production this
        is a lakehouse table's atomic commit)."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    def _read_state(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        ):
            return spark.read.parquet(path)
        return spark.createDataFrame([], schema)

    def blacklist(self, spark: SparkSession) -> DataFrame:
        return self._read_state(spark, self.blacklist_path, "user_id long")

    def user_counts(self, spark: SparkSession) -> DataFrame:
        return self._read_state(
            spark,
            self.user_counts_path,
            "date_key string, user_id long, ad_id long, click_count long",
        )

    def stats(self, spark: SparkSession) -> DataFrame:
        return self._read_state(
            spark,
            self.stat_path,
            "date_key string, province string, city string, ad_id long, "
            "click_count long",
        )

    # -- the per-batch transaction ------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.cache()

        # 1) J8: drop already-blacklisted users (stream-static anti-join;
        #    static side re-read per batch = reference's per-batch reload).
        clean = batch_df.join(
            F.broadcast(self.blacklist(spark)), "user_id", "left_anti"
        ).cache()

        # 2) fold batch counts into cumulative (date,user,ad) state.
        batch_counts = daily_user_ad_counts(clean)
        merged = (
            self.user_counts(spark)
            .unionByName(batch_counts)
            .groupBy("date_key", "user_id", "ad_id")
            .agg(F.sum("click_count").alias("click_count"))
        )
        self._write_state(merged, self.user_counts_path)

        # 3) feedback edge: newly-over-threshold users join the blacklist.
        offenders = (
            spark.read.parquet(self.user_counts_path)
            .where(F.col("click_count") > BLACKLIST_THRESHOLD)
            .select("user_id")
            .distinct()
        )
        self._write_state(
            self.blacklist(spark).unionByName(offenders).distinct(),
            self.blacklist_path,
        )

        # 4) ST4 cumulative province/city stats + ST5 derived top-3.
        stat = (
            self.stats(spark)
            .unionByName(cumulative_stats(clean))
            .groupBy("date_key", "province", "city", "ad_id")
            .agg(F.sum("click_count").alias("click_count"))
        )
        self._write_state(stat, self.stat_path)
        overwrite_keyed_parquet(
            province_top3(spark.read.parquet(self.stat_path)),
            self.top3_path,
            ["date_key"],
        )
        clean.unpersist()
        batch_df.unpersist()

    def start(self, parsed_stream: DataFrame, checkpoint: str):
        """Attach the per-batch transaction to a parsed stream."""
        return (
            parsed_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start()
        )
