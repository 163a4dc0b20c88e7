"""Property-based tests (hypothesis): operators vs independent pure-Python
models on randomized inputs. Few examples (Spark round-trips are slow), but
each example exercises dozens of rows and the full operator surface,
including boundary alignments unit fixtures rarely hit.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_analysis_system_spark.functions.scalar import round_half_up
from log_analysis_system_spark.operators.rangejoin import range_join
from log_analysis_system_spark.operators.sessionize import sessionize

BASE = datetime(2024, 1, 1, 0, 0, 0)
GAP_S = 120  # 2-minute gap for compact examples

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from log_analysis_system_spark.session import get_spark

        _spark = get_spark(app_name="pytest-prop", cpus="8")
    return _spark


# Events: (user 0-2, offset seconds 0-3600); duplicates/ties included on
# purpose — the tiebreak column must make sessionization total.
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3600)),
    min_size=1,
    max_size=40,
)


def model_sessionize(rows: list[tuple[int, int]]) -> dict[int, str]:
    """Pure-Python gap sessionization over (event_idx sorted by ts, idx)."""
    out: dict[int, str] = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for idx, (u, off) in enumerate(rows):
        by_user.setdefault(u, []).append((off, idx))
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for off, idx in evs:
            if prev is None or off - prev > GAP_S:
                seq += 1
            out[idx] = f"{u}_{seq}"
            prev = off
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionize_matches_model(rows):
    spark = _get_spark()
    df = spark.createDataFrame(
        [
            (idx, u, BASE + timedelta(seconds=off))
            for idx, (u, off) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            df, gap_minutes=GAP_S // 60, tiebreak_col="event_id"
        ).collect()
    }
    assert got == model_sessionize(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 600), min_size=1, max_size=15),
    st.lists(st.integers(0, 600), min_size=1, max_size=15),
)
def test_range_join_matches_bruteforce(loffs, roffs):
    spark = _get_spark()
    d = 60
    left = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=o)) for i, o in enumerate(loffs)],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=o)) for i, o in enumerate(roffs)],
        "rid long, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "lts", "rts", max_diff_s=d).collect()
    }
    want = {
        (li, ri)
        for li, lo in enumerate(loffs)
        for ri, ro in enumerate(roffs)
        if abs(lo - ro) <= d
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=30))
def test_round_half_up_matches_decimal(cents):
    """round_half_up on x/100 to 2dp == Decimal ROUND_HALF_UP (F5 parity:
    the reference's NumberUtils uses BigDecimal HALF_UP)."""
    spark = _get_spark()
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cents)], "i long, c long")
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i", round_half_up(F.col("c") / 300.0, 2).alias("r")
        ).collect()
    }
    for i, c in enumerate(cents):
        want = float(
            (Decimal(c) / Decimal(300)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        )
        assert abs(got[i] - want) <= 1e-9, (c, got[i], want)
