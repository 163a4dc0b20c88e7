"""Simulate the driver's verify gate: run entry() smoke, then every
queries() entry at sf0.01 next to its oracle_sql() in DuckDB, comparing
row count, sorted column names, and an order-insensitive value hash.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from log_analysis_system_spark.session import get_spark
from log_analysis_system_spark.sources.catalog import TABLES


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in sorted(rows):
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TESTDATA", "/root/testdata"
    ) + "/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    edf = entrymod.entry(spark)
    print(f"entry: rows={edf.count()} schema={edf.schema.simpleString()}")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        sdf = queries[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        srows = [tuple(canon(r[c]) for c in cols) for r in sdf.collect()]
        shash = value_hash(cols, srows)
        if name not in oracles:
            print(f"{name:30s} rows={len(srows):6d} spark={shash} (rows-only check)")
            continue
        tbl = con.execute(oracles[name]).fetch_arrow_table()
        dcols = sorted(tbl.column_names)
        pyd = tbl.to_pydict()
        drows = [
            tuple(canon(pyd[c][i]) for c in dcols) for i in range(tbl.num_rows)
        ]
        dhash = value_hash(dcols, drows)
        ok = cols == dcols and len(srows) == len(drows) and shash == dhash
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
        print(
            f"{name:30s} {status} rows={len(srows):6d}/{len(drows):6d} "
            f"spark={shash} duck={dhash}"
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
