"""Engine facade — the one object a user of the reference system would swap
in. Three surfaces, all lazy DataFrames:

- ``engine.sql(text)``       : ANSI SQL over the registered tables (the
  reference's SQL-shaped jobs, AreaTop3ProductSpark.java:309-420, used SQL
  text as the API; Catalyst plans it identically to the DataFrame form).
- ``engine.query(name, ...)``: any named query from the registry (every
  SURVEY §2 operator + the training-pipeline extensions).
- ``engine.table(name)``     : a registered source table.

The task-param pattern (reference MySQL ``task`` table, TaskDAOImpl.java:19)
is served by passing a ``TaskParams`` to the ``queries.reference_jobs``
functions directly; this facade covers the declarative surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.compat import register_reference_udfs, rewrite_reference_sql
from .queries import QUERIES, load_all
from .session import get_spark
from .sources.catalog import register_views


class Engine:
    """Bind a SparkSession to a dataset directory and expose SQL + named
    queries. ``sf_dir`` must hold the engine's parquet tables
    (region/nation/.../documents/embeddings — see TESTDATA.md)."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = spark or get_spark(app_name="log-analysis-engine")
        self.sf_dir = sf_dir
        self.tables = register_views(self.spark, sf_dir)
        register_reference_udfs(self.spark)
        load_all()

    def sql(self, text: str) -> DataFrame:
        """Run SQL text over the registered views. The reference's registered
        UDF names resolve (functions/compat.py); its UDAF
        ``group_concat_distinct`` is rewritten to built-in aggregates."""
        return self.spark.sql(rewrite_reference_sql(text))

    def table(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(f"unknown table {name!r}; have {sorted(self.tables)}")
        return self.tables[name]

    def query(self, name: str) -> DataFrame:
        """Run a registry query (see ``queries()`` in __spark_entry__)."""
        if name not in QUERIES:
            raise KeyError(f"unknown query {name!r}; have {sorted(QUERIES)}")
        return QUERIES[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return sorted(QUERIES)
