from .dialects import DIALECTS, UpsertStatement, upsert_statement
from .sinks import (
    jdbc_append,
    overwrite_keyed_parquet,
    upsert_foreach_batch,
)

__all__ = [
    "DIALECTS",
    "UpsertStatement",
    "jdbc_append",
    "overwrite_keyed_parquet",
    "upsert_foreach_batch",
    "upsert_statement",
]
