"""Guard the oracle Arrow schemas against DECIMAL128/HUGEINT columns.

DuckDB promotes integer ``sum()`` results to HUGEINT (Arrow decimal128),
which the official driver canonicalizes differently from Spark's BIGINT —
the only cause of every official hash failure in rounds 1-2. Every exposed
integer aggregate must be ``CAST(... AS BIGINT)`` in the oracle string; this
test executes every registered oracle under DuckDB at sf0.001 and fails on any
decimal/int128 output column, so the failure mode can't silently return.
"""

from __future__ import annotations

import duckdb
import pytest

from log_analysis_system_spark.queries import ORACLES, load_all
from log_analysis_system_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    load_all()
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_decimal128_oracle_columns(con):
    # Round-11: DESCRIBE binds the query and reports inferred column
    # types WITHOUT executing it — same type verdict as the former
    # fetch_arrow_table() full execution (the binder decides DECIMAL vs
    # BIGINT statically), which spent 537 s re-running every oracle
    # (a quarter of the whole suite) to look at schemas.
    load_all()
    offenders: dict[str, list[str]] = {}
    for name, sql in ORACLES.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            f"{c[0]}:{c[1]}"
            for c in cols
            if "DECIMAL" in c[1].upper() or "INT128" in c[1].upper()
            or "HUGEINT" in c[1].upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with DECIMAL128/HUGEINT output columns (wrap the exposed "
        f"integer sums in CAST(... AS BIGINT)): {offenders}"
    )
