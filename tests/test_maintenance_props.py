"""Structural invariants of the round-8 table-maintenance operators —
the properties their docstrings CLAIM, asserted on real data rather than
trusted: compaction bins must partition the small files into ordered,
day-contiguous, size-bounded groups; rendezvous resharding must move
keys ONLY to the new shard."""

from __future__ import annotations

from log_analysis_system_spark.queries import QUERIES, load_all
from tests.conftest import SF_DIR_MID

load_all()

# constants import AFTER load_all: sampling_extras composes another
# module's oracle at import time (the late-binding gotcha)
from log_analysis_system_spark.queries.layout_audit import (  # noqa: E402
    CP_SMALL_MAX,
    CP_TARGET_ROWS,
)
from log_analysis_system_spark.queries.sampling_extras import (  # noqa: E402
    HRW_BEFORE,
)


def test_compaction_bins_are_ordered_contiguous_and_bounded(spark):
    rows = sorted(
        QUERIES["compaction_plan"](spark, SF_DIR_MID).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    assert [r["bin"] for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        # day-contiguity: bins cover disjoint, ordered day ranges
        assert a["last_day"] < b["first_day"]
    for r in rows:
        assert r["first_day"] <= r["last_day"]
        # a bin overshoots the target by at most one (small) file
        assert r["total_rows"] < CP_TARGET_ROWS + CP_SMALL_MAX
    # every bin but the last reaches the target (greedy cumsum binning
    # never leaves a bin short while later files exist)
    for r in rows[:-1]:
        assert r["total_rows"] + CP_SMALL_MAX > CP_TARGET_ROWS


def test_rendezvous_moves_only_to_the_new_shard(spark):
    rows = QUERIES["rendezvous_sharding"](spark, SF_DIR_MID).collect()
    by_shard = {r["shard"]: r for r in rows}
    new = by_shard[max(by_shard)]
    assert new["shard"] == HRW_BEFORE  # the added shard
    assert new["n_before"] == 0 and new["stayed"] == 0
    for s, r in by_shard.items():
        if s < HRW_BEFORE:
            # old shards only LOSE keys, and every key they keep stayed
            assert r["stayed"] == r["n_after"]
            assert r["n_after"] <= r["n_before"]
    moved = sum(r["n_before"] - r["stayed"] for r in rows)
    assert moved == new["n_after"]
