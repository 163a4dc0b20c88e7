"""Hive-catalog engine mode (reference prod-mode table surface,
util/SparkUtils.java:38-45; DDL README.md:1584-1620).

Runs in a SUBPROCESS: the catalog implementation is fixed at first-session
creation per JVM, and the shared test session is in-memory-catalog."""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_hive_mode_managed_table_persists(tmp_path):
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, ".")
        from log_analysis_system_spark.session import get_spark

        wh = sys.argv[1]
        spark = get_spark(app_name="hive-mode-test", cpus=4,
                          hive_warehouse=wh)
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("CREATE DATABASE IF NOT EXISTS la")
        # the reference's user_visit_action DDL shape, trimmed
        spark.sql(
            "CREATE TABLE IF NOT EXISTS la.user_visit_action ("
            " date_key STRING, user_id BIGINT, session_id STRING,"
            " page_id BIGINT, action_time STRING) USING PARQUET"
        )
        spark.sql(
            "INSERT INTO la.user_visit_action VALUES"
            " ('2024-01-01', 1, 's1', 10, '2024-01-01 00:00:01'),"
            " ('2024-01-01', 2, 's2', 11, '2024-01-01 00:00:02')"
        )
        n = spark.sql(
            "SELECT count(*) AS n FROM la.user_visit_action"
        ).collect()[0]["n"]
        assert n == 2, n
        spark.stop()

        # second session, same metastore: the managed table must still exist
        from pyspark.sql import SparkSession
        SparkSession.builder._options = {}
        spark2 = get_spark(app_name="hive-mode-test-2", cpus=4,
                           hive_warehouse=wh)
        tables = [t.name for t in spark2.catalog.listTables("la")]
        assert "user_visit_action" in tables, tables
        n2 = spark2.sql(
            "SELECT count(*) AS n FROM la.user_visit_action"
        ).collect()[0]["n"]
        assert n2 == 2, n2
        spark2.stop()
        print("HIVE_MODE_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "hive")],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "HIVE_MODE_OK" in proc.stdout
