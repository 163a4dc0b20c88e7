from .sinks import (
    jdbc_append,
    overwrite_keyed_parquet,
    upsert_foreach_batch,
)

__all__ = ["jdbc_append", "overwrite_keyed_parquet", "upsert_foreach_batch"]
