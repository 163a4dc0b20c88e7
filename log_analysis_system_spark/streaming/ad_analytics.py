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
- Exactly-once sink semantics via foreachBatch + atomically-committed
  ``_applied_batch`` markers per state partition: a crash-replayed batch id
  is detected and skipped per partition, instead of at-least-once upserts.

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
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """S4/ST1: Kafka direct stream (value = 'ts province city userid adid').
    Requires the spark-sql-kafka package on the classpath; raises a clear
    error otherwise (the container has no Kafka jars — tests use files).
    ``min_partitions`` should be >= the topic's partition count so a busy
    Kafka partition can fan out across Spark tasks."""
    try:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        if min_partitions is not None:
            reader = reader.option("minPartitions", str(min_partitions))
        raw = reader.load()
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
         (S10 upsert semantics), touching ONLY the batch's date partitions;
      3. users whose cumulative count crossed the threshold join the
         blacklist (the feedback edge: visible to step 1 of the NEXT batch —
         exactly the reference's MySQL round-trip topology, :96-99,232-403);
      4. maintain cumulative (date,province,city,ad) stats and the derived
         province top-3 (ST4/ST5), again only for the batch's dates.

    Scale + exactly-once design: state tables are hive-layout parquet
    directories (``date_key=D/``), the test double for a lakehouse MERGE.
    Per-batch work is O(batch dates' partitions), never O(all state): each
    touched date partition is re-merged beside the live one and committed by
    a single atomic ``os.rename`` whose directory already contains an
    ``_applied_batch`` marker (underscore files are invisible to Spark
    readers). A ``foreachBatch`` re-execution after a crash between commit
    and checkpoint therefore finds ``marker >= batch_id`` and skips the
    partition — replays cannot double-count, partition by partition, even
    mid-crash. The blacklist is a set union (naturally idempotent) and the
    top-3 a deterministic recompute of touched dates, so neither needs a
    marker to replay safely.
    """

    _USER_FILE_SCHEMA = "user_id long, ad_id long, click_count long"
    _STAT_FILE_SCHEMA = (
        "province string, city string, ad_id long, click_count long"
    )

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        self.user_counts_path = os.path.join(state_dir, "ad_user_click_count")
        self.blacklist_path = os.path.join(state_dir, "ad_blacklist")
        self.stat_path = os.path.join(state_dir, "ad_stat")
        self.top3_path = os.path.join(state_dir, "ad_province_top3")

    # -- state I/O -----------------------------------------------------------
    @staticmethod
    def _has_parquet(path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        )

    @staticmethod
    def _applied_batch(part_dir: str) -> int:
        """Batch id committed into ``part_dir`` by the atomic swap, or -1."""
        marker = os.path.join(part_dir, "_applied_batch")
        if os.path.isfile(marker):
            with open(marker) as fh:
                return int(fh.read().strip())
        return -1

    @staticmethod
    def _recover(target: str) -> None:
        """Heal a crash inside ``_swap_in``'s two-rename commit. If the old
        partition was renamed aside but the new one never landed, restore
        the aside (state = pre-batch; the marker makes the replay re-merge).
        If the new one landed and only the aside cleanup was lost, finish
        the cleanup. Either way, exactly one committed directory remains —
        the committed history and its marker can never both vanish."""
        aside = f"{target}.prev"
        if os.path.isdir(aside):
            if os.path.isdir(target):
                shutil.rmtree(aside)
            else:
                os.rename(aside, target)

    def _swap_in(self, df: DataFrame, target: str, batch_id: int) -> None:
        """Materialize ``df`` beside ``target`` with the batch marker inside,
        then commit rename-into-place: the live directory is renamed ASIDE
        (never deleted pre-commit), the new one renamed in, and only then is
        the aside removed — so a crash at any point leaves either the old or
        the new committed state on disk for ``_recover``. Never overwrites a
        path the producing plan may still be reading."""
        tmp = f"{target}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        aside = f"{target}.prev"
        if os.path.isdir(target):
            os.rename(target, aside)
        os.rename(tmp, target)
        if os.path.isdir(aside):
            shutil.rmtree(aside)

    def _merge_date_partition(
        self,
        delta: DataFrame,
        root: str,
        date_key: str,
        key_cols: list[str],
        file_schema: str,
        batch_id: int,
    ) -> None:
        """Fold ``delta`` (this batch's counts for one date, WITHOUT the
        date_key column) into ``root/date_key=.../``. No-op when the
        partition's committed marker says this batch was already applied
        (crash-replay window)."""
        part_dir = os.path.join(root, f"date_key={date_key}")
        self._recover(part_dir)
        if self._applied_batch(part_dir) >= batch_id:
            return
        spark = delta.sparkSession
        if self._has_parquet(part_dir):
            old = spark.read.schema(file_schema).parquet(part_dir)
            merged = (
                old.unionByName(delta)
                .groupBy(*key_cols)
                .agg(F.sum("click_count").alias("click_count"))
            )
        else:
            merged = delta
        os.makedirs(root, exist_ok=True)
        self._swap_in(merged, part_dir, batch_id)

    def _read_state(self, spark: SparkSession, path: str, schema: str) -> DataFrame:
        # Heal any partition whose two-rename commit was interrupted before
        # Spark lists the directory tree.
        if os.path.isdir(path):
            for d in os.listdir(path):
                if d.endswith(".prev"):
                    self._recover(os.path.join(path, d[: -len(".prev")]))
                elif ".tmp-" in d:  # uncommitted write from a crashed batch
                    shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        self._recover(path)
        if self._has_parquet(path):
            return spark.read.schema(schema).parquet(path)
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
        dates = sorted(
            r["date_key"]
            for r in batch_df.select("date_key").distinct().collect()
        )
        if not dates:
            batch_df.unpersist()
            return

        # 1) J8: drop already-blacklisted users (stream-static anti-join;
        #    static side re-read per batch = reference's per-batch reload).
        clean = batch_df.join(
            F.broadcast(self.blacklist(spark)), "user_id", "left_anti"
        ).cache()

        # 2) fold batch counts into the batch's (date,user,ad) partitions.
        batch_counts = daily_user_ad_counts(clean).cache()
        for d in dates:
            self._merge_date_partition(
                batch_counts.where(F.col("date_key") == d).drop("date_key"),
                self.user_counts_path,
                d,
                ["user_id", "ad_id"],
                self._USER_FILE_SCHEMA,
                batch_id,
            )

        # 3) feedback edge: newly-over-threshold users join the blacklist.
        #    Only touched dates can mint offenders; the union is a set, so
        #    replaying it is idempotent without a marker check.
        offenders = (
            self.user_counts(spark)
            .where(F.col("date_key").isin(dates))
            .where(F.col("click_count") > BLACKLIST_THRESHOLD)
            .select("user_id")
            .distinct()
        )
        self._swap_in(
            self.blacklist(spark).unionByName(offenders).distinct(),
            self.blacklist_path,
            batch_id,
        )

        # 4) ST4 cumulative province/city stats + ST5 derived top-3, for the
        #    batch's dates only (partition-pruned read, keyed overwrite).
        batch_stat = cumulative_stats(clean).cache()
        for d in dates:
            self._merge_date_partition(
                batch_stat.where(F.col("date_key") == d).drop("date_key"),
                self.stat_path,
                d,
                ["province", "city", "ad_id"],
                self._STAT_FILE_SCHEMA,
                batch_id,
            )
        overwrite_keyed_parquet(
            province_top3(self.stats(spark).where(F.col("date_key").isin(dates))),
            self.top3_path,
            ["date_key"],
        )
        batch_stat.unpersist()
        batch_counts.unpersist()
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
