"""Sinks (SURVEY §2.1 S8-S11).

The reference hand-rolls a JDBC connection pool and per-partition batched
PreparedStatement writes (jdbc/JDBCHelper.java:16-233,
UserVisitSessionAnalyzeSpark.java:973-1011), a select-then-insert/update
upsert (dao/impl/AdUserClickCountDAOImpl.java:18-89), and a delete-then-insert
partition replace (dao/impl/AdProvinceTop3DAOImpl.java:30-59).

Engine equivalents:
- plain inserts → ``df.write.jdbc(mode='append')`` (S8/S9; batching is the
  connector's job, never per-row driver loops);
- upsert → a ``foreachBatch`` function that executes
  ``INSERT ... ON CONFLICT/ON DUPLICATE KEY UPDATE`` per partition through a
  DB-API connection factory (S10) — state arithmetic (the reference's
  ``click_count = click_count + ?``) is the caller's SQL;
- keyed replace → dynamic partition overwrite on a parquet table (S11) — the
  test double for MySQL delete+insert, and the shape a lakehouse sink takes.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """S8/S9: batched append through the Spark JDBC connector — executors
    write their own partitions in parallel; no driver round-trip."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})


def upsert_foreach_batch(
    upsert_sql: str,
    columns: Sequence[str],
    conn_factory: Callable[[], "object"],
) -> Callable[[DataFrame, int], None]:
    """S10: build a ``foreachBatch(fn)`` callable that upserts each micro-batch.

    ``upsert_sql`` is a DB-API parameterized statement (e.g. SQLite
    ``INSERT INTO t(k, v) VALUES (?, ?) ON CONFLICT(k) DO UPDATE SET
    v = v + excluded.v``); ``conn_factory`` opens a fresh connection inside
    each partition (executor-side — connections never cross serialization
    boundaries).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = list(columns)

        def write_partition(rows) -> None:
            conn = conn_factory()
            try:
                cur = conn.cursor()
                cur.executemany(upsert_sql, [tuple(r[c] for c in cols) for r in rows])
                conn.commit()
            finally:
                conn.close()

        batch_df.select(*cols).foreachPartition(write_partition)

    return sink


def overwrite_keyed_parquet(df: DataFrame, path: str, keys: Sequence[str]) -> None:
    """S11: replace exactly the key partitions present in ``df`` (the
    reference's DELETE WHERE date=? AND province=? + insert). Dynamic
    partition overwrite touches only affected partitions — at 100 TB this is
    a metadata swap per partition, not a table rewrite."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*keys).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
