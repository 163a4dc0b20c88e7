"""Round-11 phase profiler: time the PQ / IVF-PQ lifecycle halves phase
by phase on a warm session (guide §1 — measure before touching), plus a
per-job breakdown of the other heavy bench rows when asked.

Usage: python scripts/profile_r11.py [sf_dir] [target ...]
Targets: ivfpq pqref lsh hits build_phases
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.session import get_spark

load_all()


class T:
    def __init__(self):
        self.rows = []
        self.t0 = time.perf_counter()

    def lap(self, label):
        t = time.perf_counter()
        self.rows.append((label, t - self.t0))
        self.t0 = t

    def dump(self, title):
        print(f"--- {title}")
        for label, sec in self.rows:
            print(f"  {label:42s} {sec:7.3f}s")
        print(f"  {'TOTAL':42s} {sum(s for _, s in self.rows):7.3f}s")
        self.rows = []
        self.t0 = time.perf_counter()


def profile_ivfpq(spark, sf_dir):
    import pyspark.sql.functions as F

    from log_analysis_system_spark.queries.similarity import (
        N_QUERIES,
        _quantized,
        train_ivf_centroids,
        _ivf_assign_top1,
    )
    from log_analysis_system_spark.queries import similarity_pq as spq

    idx = tempfile.mkdtemp(prefix="prof_ivfpq_")
    t = T()
    try:
        vecs = _quantized(spark, sf_dir).localCheckpoint(eager=True)
        t.lap("vecs checkpoint")
        cents = train_ivf_centroids(vecs)
        t.lap("train_ivf_centroids")
        cents.write.mode("overwrite").parquet(f"{idx}/centroids")
        t.lap("write centroids")
        assigned = _ivf_assign_top1(vecs, cents)
        resid = (
            vecs.join(assigned, "vec_id")
            .join(F.broadcast(cents), "cell_id")
            .select(
                "vec_id",
                "cell_id",
                F.expr("zip_with(e, ce, (x, y) -> x - y)").alias("re"),
                "e",
                "nrm",
            )
            .localCheckpoint(eager=True)
        )
        t.lap("assign + resid checkpoint")
        cb = spq.train_pq_codebooks(resid.select("vec_id", F.col("re").alias("e")))
        cb.write.mode("overwrite").parquet(f"{idx}/codebooks")
        cb_rows = cb.collect()
        t.lap("train_pq_codebooks + write + collect")
        (
            resid.withColumn("codes", spq._pq_codes_udf(cb_rows)("re"))
            .select("cell_id", "vec_id", "codes", "e", "nrm")
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(f"{idx}/codes")
        )
        t.lap("encode + partitioned write")
        t.dump("build_ivfpq_index phases")

        queries = (
            _quantized(spark, sf_dir)
            .where(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "e")
        )
        n = spq.search_ivfpq_index(spark, idx, queries).count()
        t.lap(f"search_ivfpq_index (rows={n})")
        t.dump("ivfpq serve")
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def profile_train_rounds(spark, sf_dir):
    """Time individual Lloyd rounds of IVF + PQ training."""
    import pyspark.sql.functions as F

    from log_analysis_system_spark.queries.similarity import (
        _quantized,
        train_ivf_centroids,
    )
    from log_analysis_system_spark.queries import similarity_pq as spq

    vecs = _quantized(spark, sf_dir).localCheckpoint(eager=True)
    t = T()
    for i in (0, 1, 2, 3):
        train_ivf_centroids(vecs, iters=i)
        t.lap(f"train_ivf iters={i}")
    for i in (0, 1, 2, 3):
        spq.train_pq_codebooks(vecs, iters=i)
        t.lap(f"train_pq iters={i}")
    t.dump("training round scaling")


def profile_pqref(spark, sf_dir):
    import pyspark.sql.functions as F

    from log_analysis_system_spark.queries.similarity import (
        N_QUERIES,
        _norm,
        _quantized,
    )
    from log_analysis_system_spark.queries import similarity_pq as spq

    idx = tempfile.mkdtemp(prefix="prof_pqref_")
    t = T()
    try:
        spq.build_pq_index(spark, sf_dir, idx)
        t.lap("build_pq_index")
        vecs = _quantized(spark, sf_dir)
        delta = vecs.select(
            (F.col("vec_id") + 10**6).alias("vec_id"),
            F.expr(spq.PQ_DRIFT_EXPR).alias("e"),
        ).withColumn("nrm", _norm("e"))
        spq.append_pq_index(spark, idx, delta, batch_id=0)
        t.lap("append_pq_index")
        queries = vecs.where(F.col("vec_id") < N_QUERIES).select(
            (F.col("vec_id") + 2 * 10**6).alias("vec_id"),
            F.expr(spq.PQ_DRIFT_EXPR).alias("e"),
        )
        hits, tot = spq.audit_pq_index_recall(spark, idx, queries)
        t.lap(f"audit#1 (recall={hits}/{tot})")
        # refresh phases, inlined
        from pyspark.sql import Window

        store = spark.read.parquet(f"{idx}/codes").select("vec_id", "e", "nrm")
        tiles = store.select("vec_id").withColumn(
            "t", F.ntile(spq.K_CODES).over(Window.orderBy("vec_id"))
        )
        seed_ids = tiles.groupBy("t").agg(F.min("vec_id").alias("vec_id")).select(
            "vec_id", (F.col("t") - 1).cast("int").alias("code")
        )
        t.lap("seed ntile (lazy — no action)")
        cb = spq.train_pq_codebooks(store.select("vec_id", "e"), seeds=seed_ids)
        cb_rows = cb.collect()
        t.lap("retrain codebooks (store)")
        staged = f"{idx}/codes_staged"
        (
            store.withColumn("codes", spq._pq_codes_udf(cb_rows)("e"))
            .select("vec_id", "codes", "e", "nrm")
            .write.mode("overwrite")
            .parquet(staged)
        )
        t.lap("re-encode store -> staged")
        spark.createDataFrame(
            cb_rows, "sub int, code int, cv array<bigint>"
        ).write.mode("overwrite").parquet(f"{idx}/codebooks")
        shutil.rmtree(f"{idx}/codes")
        os.makedirs(f"{idx}/codes")
        os.rename(staged, f"{idx}/codes/batch=base")
        t.lap("swap")
        hits, tot = spq.audit_pq_index_recall(spark, idx, queries)
        t.lap(f"audit#2 (recall={hits}/{tot})")
        t.dump("pq refresh lifecycle phases")
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def profile_query(spark, sf_dir, name, runs=3):
    t = T()
    for i in range(runs):
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        t.lap(f"{name} run{i} (rows={n})")
    t.dump(f"{name} x{runs} warm")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = sys.argv[2:] or ["ivfpq"]
    spark = get_spark(app_name="profile_r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for tgt in targets:
        if tgt == "ivfpq":
            profile_ivfpq(spark, sf_dir)
        elif tgt == "rounds":
            profile_train_rounds(spark, sf_dir)
        elif tgt == "pqref":
            profile_pqref(spark, sf_dir)
        else:
            profile_query(spark, sf_dir, tgt)
    spark.stop()


if __name__ == "__main__":
    main()
