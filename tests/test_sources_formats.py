"""Multi-format source parity: ORC / JSON-lines / CSV round-trips must
reproduce the parquet rows bit-for-bit for the catalog's flat schemas —
the engine serves whichever interchange format an upstream emits."""

from __future__ import annotations

import pytest

from log_analysis_system_spark.sources.catalog import (
    read_events,
    read_table,
    write_table,
)
from tests.conftest import SF_DIR


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_roundtrip_matches_parquet(spark, tmp_path, fmt):
    src = read_events(spark, SF_DIR)
    path = str(tmp_path / f"events_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_table(spark, "/nowhere", "avro")
