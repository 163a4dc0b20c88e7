"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``log_analysis_system_spark.queries.*`` — one registry
entry per implemented operator from SURVEY.md §2 plus the training-data
pipeline extensions (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_analysis_system_spark.queries import ORACLES, QUERIES, load_all, ordered

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: sessionized per-session
    aggregate (the reference's core A1 operator)."""
    return QUERIES["session_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Ordered so the first 50 entries (the driver's correctness window) cover
    one representative per operator family — see ``queries.PRIORITY``."""
    return ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return ordered(ORACLES)
