"""Dialect-native upsert statements (S10): MySQL text parity with the
reference's ON DUPLICATE KEY UPDATE arithmetic, real execution of the
sqlite dialect through upsert_foreach_batch, and real execution of the
Derby MERGE dialect against embedded Derby on Spark's classpath."""

from __future__ import annotations

import sqlite3

import pytest

from log_analysis_system_spark.sinks import upsert_foreach_batch
from log_analysis_system_spark.sinks.dialects import upsert_statement


def test_mysql_statement_matches_reference_arithmetic():
    """The single-statement form of AdUserClickCountDAOImpl.java:18-89:
    insert new (user, date, ad) keys, add click_count to existing ones."""
    stmt = upsert_statement(
        "mysql",
        "ad_user_click_count",
        key_cols=["date", "user_id", "ad_id"],
        increment_cols=["click_count"],
    )
    assert stmt.sql == (
        "INSERT INTO ad_user_click_count (date, user_id, ad_id, click_count) "
        "VALUES (?, ?, ?, ?) "
        "ON DUPLICATE KEY UPDATE click_count = click_count + VALUES(click_count)"
    )
    assert stmt.param_cols == ("date", "user_id", "ad_id", "click_count")


def test_mysql_replace_columns():
    stmt = upsert_statement(
        "mysql", "t", key_cols=["k"], increment_cols=["n"], replace_cols=["v"]
    )
    assert "n = n + VALUES(n)" in stmt.sql and "v = VALUES(v)" in stmt.sql


def test_postgres_statement_shape():
    stmt = upsert_statement(
        "postgres", "clicks", key_cols=["k"], increment_cols=["cnt"]
    )
    assert stmt.sql == (
        "INSERT INTO clicks (k, cnt) VALUES (?, ?) "
        "ON CONFLICT (k) DO UPDATE SET cnt = clicks.cnt + excluded.cnt"
    )


@pytest.mark.parametrize("bad", [
    dict(key_cols=[], increment_cols=["a"]),
    dict(key_cols=["k"]),
    dict(key_cols=["k"], increment_cols=["k"]),
])
def test_rejects_bad_column_roles(bad):
    with pytest.raises(ValueError):
        upsert_statement("mysql", "t", **bad)


def test_unknown_dialect():
    with pytest.raises(ValueError):
        upsert_statement("oracle8i", "t", key_cols=["k"], increment_cols=["n"])


def test_sqlite_dialect_executes_through_foreach_batch(spark, tmp_path):
    """The generated sqlite statement IS the one upsert_foreach_batch runs:
    two batches with overlapping keys accumulate, not overwrite."""
    db = str(tmp_path / "state.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE clicks (user_id INTEGER PRIMARY KEY, cnt INTEGER)"
        )
    stmt = upsert_statement(
        "sqlite", "clicks", key_cols=["user_id"], increment_cols=["cnt"]
    )
    assert stmt.param_cols == ("user_id", "cnt")
    sink = upsert_foreach_batch(
        stmt.sql, list(stmt.param_cols), lambda: sqlite3.connect(db)
    )
    sink(spark.createDataFrame([(1, 2), (2, 1)], "user_id long, cnt long"), 0)
    sink(spark.createDataFrame([(1, 3), (3, 5)], "user_id long, cnt long"), 1)
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT user_id, cnt FROM clicks").fetchall())
    assert got == {1: 5, 2: 1, 3: 5}


def test_derby_merge_executes_for_real(spark, tmp_path):
    """The derby MERGE dialect runs on an actual engine: embedded Derby via
    the JVM already inside the Spark driver. Same accumulate semantics."""
    jvm = spark.sparkContext._jvm
    url = f"jdbc:derby:{tmp_path}/upsertdb;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE clicks (user_id BIGINT PRIMARY KEY, cnt BIGINT)"
        )
        stmt = upsert_statement(
            "derby", "clicks", key_cols=["user_id"], increment_cols=["cnt"]
        )
        assert stmt.param_cols == ("user_id", "cnt", "user_id", "cnt")
        ps = conn.prepareStatement(stmt.sql)
        for row in [{"user_id": 1, "cnt": 2}, {"user_id": 2, "cnt": 1},
                    {"user_id": 1, "cnt": 3}, {"user_id": 3, "cnt": 5}]:
            for i, c in enumerate(stmt.param_cols, start=1):
                ps.setLong(i, row[c])
            ps.executeUpdate()
        rs = st.executeQuery("SELECT user_id, cnt FROM clicks")
        got = {}
        while rs.next():
            got[rs.getLong(1)] = rs.getLong(2)
        assert got == {1: 5, 2: 1, 3: 5}
    finally:
        conn.close()


def test_sqlite_dialect_as_streaming_foreach_batch(spark, tmp_path):
    """The dialect upsert as a REAL Structured Streaming sink: a file
    stream drives writeStream.foreachBatch with the generated statement;
    overlapping keys across micro-batches accumulate exactly once each."""
    import json

    db = str(tmp_path / "stream_state.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE clicks (user_id INTEGER PRIMARY KEY, cnt INTEGER)"
        )
    stmt = upsert_statement(
        "sqlite", "clicks", key_cols=["user_id"], increment_cols=["cnt"]
    )
    sink = upsert_foreach_batch(
        stmt.sql, list(stmt.param_cols), lambda: sqlite3.connect(db)
    )

    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "a.json").write_text(
        "\n".join(json.dumps(r) for r in
                  [{"user_id": 1, "cnt": 2}, {"user_id": 2, "cnt": 1}])
    )
    (inp / "b.json").write_text(
        "\n".join(json.dumps(r) for r in
                  [{"user_id": 1, "cnt": 3}, {"user_id": 3, "cnt": 5}])
    )
    stream = (
        spark.readStream.schema("user_id long, cnt long")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT user_id, cnt FROM clicks").fetchall())
    assert got == {1: 5, 2: 1, 3: 5}
