"""End-to-end parity: every registered query vs its DuckDB oracle — the local
mirror of the driver's t2 correctness gate. Runs at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to reproduce the driver exactly."""

from __future__ import annotations

import pytest

from log_analysis_system_spark.queries import ORACLES, QUERIES, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, QUERIES[name], ORACLES[name], SF_DIR)


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # Non-SQL-expressible ops would get a weaker rows-only check from the
    # driver. As of round 2 every query carries an oracle — the formerly
    # rows-only HLL sketch now ships a within-tolerance verdict oracle.
    assert not missing, f"queries missing oracles: {missing}"
