"""Skew handling: the engine's stance (SURVEY §4) is that AQE owns skew
mitigation — the reference's manual random-prefix/map-join rewrites
(reference README.md:1365-1507) must not be needed. This test proves the
mechanism actually engages: a pathologically skewed sort-merge join gets its
oversized partition SPLIT at runtime (skew=true in the final adaptive plan),
with thresholds scaled down so the property is testable at local scale."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        # force a shuffle join and make the skew detector fire at KB scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        # 400k-row fact, 90% of rows on key 0; 100-key dim.
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w")))
        [row] = joined.collect()  # run it: AQE re-plans at runtime

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        # correctness unaffected by the split
        expected = (
            fact.withColumn("w", F.col("k") * 2).agg(F.sum("v") + F.sum("w"))
        ).collect()[0][0]
        assert row[0] == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
