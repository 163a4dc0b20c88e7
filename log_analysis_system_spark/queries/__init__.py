"""Query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline extension
operators) registers here as a named query: a callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, a DuckDB oracle string over the same
parquet tables. ``__spark_entry__.py`` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query function, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        session_analysis,
        topn,
        funnel,
        tpch,
        tpch2,
        dedup,
        similarity,
        text_analysis,
        multimodal,
        streaming_batch,
        scalar_and_setops,
        olap_extras,
        corpus_pipeline,
        temporal,
        sampling_extras,
        graph,
    )
