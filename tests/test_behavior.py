"""Behavior-analytics operators (queries/behavior.py): semantic fixtures the
oracle can't isolate, plus plan-shape gates for the scale-critical
properties (broadcast med/MAD joins, no global sorts)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from log_analysis_system_spark.queries.behavior import MAD_K
from tests.conftest import SF_DIR

load_all()


def plan_of(spark, name: str) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_cohort_retention_triangle_shape(spark):
    """Offset 0 exists for every cohort (a user is always active in their own
    first week) and per-cohort offset-0 count >= any later offset."""
    rows = QUERIES["cohort_retention"](spark, SF_DIR).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    assert by_cohort
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"cohort {cohort} missing offset 0"
        assert all(offsets[0] >= n for n in offsets.values())


def test_event_transitions_conservation(spark):
    """Sum of transition counts == total events minus one per active user
    (each user's chain has len(events)-1 edges)."""
    from log_analysis_system_spark.sources.catalog import read_events

    ev = read_events(spark, SF_DIR)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total = (
        QUERIES["event_transitions"](spark, SF_DIR)
        .agg(F.sum("n").alias("s"))
        .collect()[0]["s"]
    )
    assert total == n_events - n_users


def test_robust_outliers_flags_injected_spike(spark):
    """A synthetic series with one wild point flags exactly that point."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=base + datetime.timedelta(minutes=i),
            user_id=1,
            event_type="t",
            value=10.0 + (i % 3),  # 10, 11, 12 repeating
            props="{}",
        )
        for i in range(30)
    ]
    rows.append(
        Row(
            event_id=99,
            ts=base + datetime.timedelta(days=1),
            user_id=1,
            event_type="t",
            value=10_000.0,
            props="{}",
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        out = QUERIES["robust_outlier_events"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 31
    assert r.n_outliers == 1
    assert r.mad_cents > 0


def test_robust_outliers_broadcasts_medians(spark):
    """The per-type med/MAD tables must broadcast back onto the raw scan —
    the 100 TB side is never reshuffled for the join."""
    plan = plan_of(spark, "robust_outlier_events")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_cohort_retention_no_global_sort(spark):
    """Cohort min is a user-partitioned window, never a global sort."""
    plan = plan_of(spark, "cohort_retention")
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_term_cooccurrence_pairs_are_ordered(spark):
    """Emitted pairs are canonical (term_a < term_b) and meet the threshold."""
    df = QUERIES["term_cooccurrence"](spark, SF_DIR)
    bad = df.where(
        (F.col("term_a") >= F.col("term_b")) | (F.col("n_docs") < 3)
    ).count()
    assert bad == 0


def test_mad_fence_constant_is_exact_in_double():
    # Guard: MAD_K must stay a dyadic rational so fence arithmetic is exact.
    assert MAD_K * 2 == int(MAD_K * 2)


def test_session_path_topk_is_heap_not_sort(spark):
    plan = plan_of(spark, "session_path_topk")
    assert "TakeOrderedAndProject" in plan


def test_key_skew_profile_on_known_distribution(spark):
    """3 keys with 1, 4, and 5 rows: max=5, avg=3, p50=4, p99=5,
    top share = 5e6/10."""
    import datetime
    import tempfile

    from pyspark.sql import Row

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, cnt in ((1, 1), (2, 4), (3, 5)):
        for _ in range(cnt):
            rows.append(
                Row(event_id=eid, ts=base + datetime.timedelta(minutes=eid),
                    user_id=uid, event_type="t", value=1.0, props="{}")
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        r = QUERIES["key_skew_profile"](spark, d).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_rows_per_key) == (3, 10, 5)
    assert (r.avg_rows_per_key, r.p50_rows_per_key, r.p99_rows_per_key) == (3, 4, 5)
    assert r.top_key_share_ppm == 500_000


def test_timed_funnel_on_constructed_journeys(spark):
    """u1 converts fully in-window; u2 clicks only; u3's purchase lands
    outside the 24 h window; u4 clicks BEFORE viewing (wrong order)."""
    import datetime
    import tempfile

    from pyspark.sql import Row

    t0 = datetime.datetime(2024, 1, 1)

    def e(eid, uid, typ, minutes):
        return Row(event_id=eid, ts=t0 + datetime.timedelta(minutes=minutes),
                   user_id=uid, event_type=typ, value=1.0, props="{}")

    rows = [
        e(1, 1, "view", 0), e(2, 1, "click", 10), e(3, 1, "purchase", 20),
        e(4, 2, "view", 0), e(5, 2, "click", 30),
        e(6, 3, "view", 0), e(7, 3, "click", 30), e(8, 3, "purchase", 25 * 60),
        e(9, 4, "click", 0), e(10, 4, "view", 10), e(11, 4, "purchase", 20),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        r = QUERIES["timed_funnel"](spark, d).collect()[0]
    # u4's view at minute 10 precedes no click, so step2 excludes it.
    assert (r.n_step1, r.n_step2, r.n_step3) == (4, 3, 1)
    assert r.conv12_ppm == 750_000 and r.conv13_ppm == 250_000


def test_rfm_scores_partition_users_into_quintiles(spark):
    """Every score is 1..5 and bucket sizes follow floor(rank*5/n)+1 —
    within 1 of n/5 per bucket, all users covered exactly once."""
    rows = QUERIES["rfm_segments"](spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0 and len({r.user_id for r in rows}) == n
    for col in ("r_score", "f_score", "m_score"):
        counts: dict = {}
        for r in rows:
            s = r[col]
            assert 1 <= s <= 5
            counts[s] = counts.get(s, 0) + 1
        assert all(abs(c - n / 5) <= 1 for c in counts.values()), (col, counts)


def test_rfm_best_scores_align_with_features(spark):
    """The user with rank-0 frequency holds f_score 1; the least-recent
    user holds the maximal r_score."""
    rows = QUERIES["rfm_segments"](spark, SF_DIR).collect()
    top_freq = max(rows, key=lambda r: (r.frequency, -r.user_id))
    assert top_freq.f_score == 1
    stale = max(rows, key=lambda r: (r.recency_days, r.user_id))
    assert stale.r_score == max(r.r_score for r in rows)


def test_triangle_count_on_known_graph(spark):
    """K4 plus a pendant vertex: docs constructed so the term graph is
    exactly that shape — K4 has 4 triangles, 3 per K4-vertex, 0 pendant."""
    import tempfile

    from pyspark.sql import Row

    # Edge (x, y) exists iff >= 3 docs contain both terms. Build doc sets:
    # K4 over a,b,c,d: all 6 pairs appear in 3 shared docs (the three
    # "abcd" docs). Pendant e attaches to a only via three "a e" docs.
    docs = [Row(doc_id=i, text="a b c d", lang="en", source="s", n_chars=7)
            for i in range(3)]
    docs += [Row(doc_id=10 + i, text="a e", lang="en", source="s", n_chars=3)
             for i in range(3)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
        out = {
            r.term: r.n_triangles
            for r in QUERIES["triangle_count_terms"](spark, d).collect()
        }
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_hourly_anomalies_flags_injected_burst(spark):
    """29 quiet hours at ~4 events + one 200-event burst hour: only the
    burst hour is flagged."""
    import datetime
    import tempfile

    from pyspark.sql import Row

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        n = 200 if h == 7 else 4 + (h % 2)
        for i in range(n):
            rows.append(
                Row(event_id=eid,
                    ts=t0 + datetime.timedelta(hours=h, seconds=i),
                    user_id=1, event_type="t", value=1.0, props="{}")
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        out = QUERIES["hourly_anomalies"](spark, d).collect()
    flagged = {r.hour_ts.hour for r in out if r.is_anomaly}
    assert flagged == {7}


# ------------------------------------ markov_attribution model pins


def test_markov_fixpoint_matches_exact_linear_solve(spark):
    """The 24-round integer fixpoint must approximate the EXACT absorbing-
    chain conversion probability (numpy linear solve on the same
    transition counts) from below, within the tolerance the geometric
    convergence rate implies, and removal effects must be non-negative
    (removing outgoing edges only LOSES mass under the kept-denominator
    semantics)."""
    import numpy as np

    from log_analysis_system_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["markov_attribution"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4
    # independent exact solve on independently recomputed transitions
    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    trans: dict = {}
    for _, g in ev.groupby("user_id"):
        states = []
        for t in g["event_type"]:
            if t == "purchase":
                states.append("CONV")
                break
            states.append(t)
        seq = ["START"] + states
        if seq[-1] != "CONV":
            seq.append("NULL")
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    srcs = sorted({a for a, _ in trans})
    idx = {s: i for i, s in enumerate(srcs)}
    P = np.zeros((len(srcs), len(srcs)))
    r = np.zeros(len(srcs))
    out = {s: 0 for s in srcs}
    for (a, b), n in trans.items():
        out[a] += n
    for (a, b), n in trans.items():
        if b == "CONV":
            r[idx[a]] += n / out[a]
        elif b != "NULL" and b in idx:
            P[idx[a], idx[b]] += n / out[a]
    exact = np.linalg.solve(np.eye(len(srcs)) - P, r)[idx["START"]]
    got = rows[0]["conv_full_micro"] / 1e6
    assert got <= exact + 1e-9, "fixpoint must approach from below"
    assert exact - got < 5e-3, (got, exact)
    for row in rows:
        assert row["removal_micro"] >= 0
        assert 0 <= row["share_ppm"] <= 1_000_000


def test_link_prediction_matches_pandas_model(spark):
    """Scores for every emitted pair must equal a pure-pandas recompute
    of the capped bipartite graph (degree cap, shared-neighbor counts,
    jaccard/RA/AA integer arithmetic)."""
    import math

    import pandas as pd

    from log_analysis_system_spark.queries import QUERIES, load_all
    from log_analysis_system_spark.queries.graph import (
        LP_DEG_CAP,
        LP_MIN_CN,
    )

    load_all()
    sf = "/root/testdata/sf0.001"
    got = {
        (r["supp_a"], r["supp_b"]): r
        for r in QUERIES["link_prediction_scores"](spark, sf).collect()
    }
    li = pd.read_parquet(f"{sf}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    o = pd.read_parquet(f"{sf}/orders.parquet")[["o_orderkey", "o_custkey"]]
    cs = li.merge(
        o, left_on="l_orderkey", right_on="o_orderkey"
    )[["o_custkey", "l_suppkey"]].drop_duplicates()
    deg = cs.groupby("o_custkey").size()
    capped = cs[cs["o_custkey"].map(deg) <= LP_DEG_CAP]
    sdeg = capped.groupby("l_suppkey").size().to_dict()
    want: dict = {}
    for c, g in capped.groupby("o_custkey"):
        supps = sorted(g["l_suppkey"])
        dc = len(supps)
        for i in range(len(supps)):
            for j in range(i + 1, len(supps)):
                k = (supps[i], supps[j])
                cn, ra, aa = want.get(k, (0, 0, 0))
                want[k] = (
                    cn + 1,
                    ra + 1_000_000 // dc,
                    aa + math.floor(1_000_000 / math.log(dc)),
                )
    want = {k: v for k, v in want.items() if v[0] >= LP_MIN_CN}
    assert set(got) == set(want)
    for k, (cn, ra, aa) in want.items():
        row = got[k]
        assert row["common_n"] == cn
        assert row["ra_micro"] == ra
        assert row["aa_micro"] == aa
        da, db = sdeg[k[0]], sdeg[k[1]]
        assert row["jaccard_ppm"] == cn * 1_000_000 // (da + db - cn)
