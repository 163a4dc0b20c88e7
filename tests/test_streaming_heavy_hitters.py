"""Streaming Misra-Gries heavy hitters: the error GUARANTEE (not just
plausibility) checked against exact counts after a multi-batch run, with
bounded per-group state."""

from __future__ import annotations

import json
from collections import Counter

from log_analysis_system_spark.streaming.heavy_hitters import (
    misra_gries_stream,
)

K, GROUPS = 4, 2


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for eid, item in rows:
            f.write(json.dumps({"event_id": eid, "item": item}) + "\n")


def test_misra_gries_guarantee(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # skewed stream: 'a' dominates, 'b' frequent, long tail — across batches
    rows = []
    eid = 0
    for rep, item in [(40, "a"), (18, "b"), (6, "c")] + [
        (2, f"t{i}") for i in range(12)
    ]:
        for _ in range(rep):
            rows.append((eid, item))
            eid += 1
    # interleave deterministically so batches mix heavy and tail items
    rows.sort(key=lambda r: (r[0] * 2654435761) % 88)
    rows = [(i, it) for i, (_, it) in enumerate(rows)]
    _write_batch(inp, "b1.json", rows[: len(rows) // 2])
    _write_batch(inp, "b2.json", rows[len(rows) // 2 :])

    stream = (
        spark.readStream.schema("event_id long, item string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    out = misra_gries_stream(stream, k=K, n_groups=GROUPS)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # last emission per group = final summary
    final = {}
    for r in spark.sql("SELECT * FROM mg_out").collect():
        cur = final.setdefault(r["grp"], {})
        if r["n_processed"] >= cur.get("n_processed", -1):
            if r["n_processed"] > cur.get("n_processed", -1):
                cur.clear()
                cur["n_processed"] = r["n_processed"]
                cur["n_retained"] = r["n_retained"]
                cur["est"] = {}
            cur["est"][r["item"]] = r["est"]

    # exact per-item counts and group assignment from a batch query
    df = spark.createDataFrame(rows, "event_id long, item string")
    from pyspark.sql import functions as F

    assign = {
        r["item"]: r["grp"]
        for r in df.select(
            "item", F.pmod(F.xxhash64("item"), F.lit(GROUPS)).alias("grp")
        ).distinct().collect()
    }
    true_counts = Counter(it for _, it in rows)
    n_g = Counter()
    for it, c in true_counts.items():
        n_g[assign[it]] += c

    for it, t in true_counts.items():
        g = assign[it]
        got = final[g]
        est = got["est"].get(it, 0)
        bound = (got["n_processed"] - got["n_retained"]) / (K + 1)
        assert est <= t, (it, est, t)
        assert t - est <= bound + 1e-9, (it, est, t, bound)
        # guaranteed tracked if t > N_g/(k+1)
        if t > n_g[g] / (K + 1):
            assert it in got["est"], (it, t, n_g[g])
        assert len(got["est"]) <= K
        assert got["n_processed"] == n_g[g]
