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


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Capped mode must (a) still score surviving pairs EXACTLY and (b) drop
    candidates whose only overlap is a hot stop-gram. Corpus: 30 docs all
    sharing one hot shingle; two genuinely-near-dup docs sharing rare ones."""
    from log_analysis_system_spark.queries.dedup import ngram_jaccard_pairs

    hot = "the quick brown"  # one 3-gram shared by everything
    rows = [(i, f"{hot} filler{i} alpha{i} beta{i} gamma{i}") for i in range(30)]
    # docs 100/101: identical except one trailing word -> high true jaccard
    rows += [
        (100, f"{hot} shared rare words one two three four five six"),
        (101, f"{hot} shared rare words one two three four five seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, df_cap=None).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, df_cap=10).collect()
    }
    # the true near-dup pair survives the cap with an IDENTICAL exact score
    assert (100, 101) in capped
    assert capped[(100, 101)] == exact[(100, 101)]
    # every capped pair's score equals the exact score (verification is exact)
    for k, v in capped.items():
        assert exact[k] == v


def test_minhash_lsh_no_forced_broadcast_on_skewed_corpus(spark):
    """With the unconditional broadcast hint removed, a pathological corpus
    (every doc identical -> candidate set is all pairs) must still complete
    and return the full clique; the physical plan carries no static
    broadcast hint — join strategy is AQE's runtime call."""
    from log_analysis_system_spark.queries import QUERIES, load_all

    load_all()
    n = 40
    docs = spark.createDataFrame(
        [(i, "identical content repeated for every single document here")
         for i in range(n)],
        "doc_id long, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = QUERIES["dedup_minhash_lsh"](spark, d)
        rows = out.collect()
        assert len(rows) == n * (n - 1) // 2, "full clique expected"
        assert all(r["jaccard"] == 1.0 for r in rows)


def test_salted_skew_join_parity_and_plan(spark, tmp_path):
    """The salted join must (a) be row-identical to the plain join —
    replication never duplicates or drops a fact row — and (b) compile
    to a shuffle join keyed on (key, salt) with no broadcast: the plan
    shape that actually spreads a hot key over SKEW_JOIN_SALTS reducers."""
    import datetime

    from log_analysis_system_spark.queries.olap_extras import (
        SKEW_JOIN_SALTS,
        q_salted_skew_join,
    )

    base = datetime.datetime(2024, 1, 1)
    # hot key: user 1 owns 200 of 220 events; user 99 has no customer row
    ev = [(i, base + datetime.timedelta(seconds=i),
           1 if i < 200 else (99 if i % 2 else 7),
           "click" if i % 3 else "buy", float(i) * 1.25, "{}")
          for i in range(220)]
    cust = [(1, "n", "a", 1, "p", 0.0, "BUILDING", "c"),
            (7, "n", "a", 1, "p", 0.0, "MACHINERY", "c")]
    d = str(tmp_path)
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_address string, c_nationkey long, "
        "c_phone string, c_acctbal double, c_mktsegment string, "
        "c_comment string",
    ).write.parquet(f"{d}/customer.parquet")

    out = q_salted_skew_join(spark, d)
    got = {(r["segment"], r["event_type"]): (r["n_events"], r["value_micro"])
           for r in out.collect()}

    from collections import defaultdict
    import math

    exp: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    seg = {1: "BUILDING", 7: "MACHINERY"}
    for _i, (_eid, _ts, uid, et, val, _p) in enumerate(ev):
        if uid in seg:  # inner join: user 99 drops
            exp[(seg[uid], et)][0] += 1
            exp[(seg[uid], et)][1] += math.floor(val * 1_000_000)
    assert got == {k: tuple(v) for k, v in exp.items()}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "salt" in plan
    assert SKEW_JOIN_SALTS == 8  # doc constant pinned to the docstring
