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


# Docs: short word-soup texts with deliberate near-identical pairs.
docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),  # vocabulary skew -> shared shingles
        st.integers(0, 30),
        st.integers(0, 30),
        st.integers(0, 30),
        st.integers(0, 30),
    ),
    min_size=2,
    max_size=14,
)


@given(docs_strategy, st.integers(1, 6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ngram_jaccard_capped_scores_subset_of_exact(word_ids, df_cap):
    """For ANY corpus and ANY cap: capped-mode pairs are a subset of exact
    pairs, and every surviving pair carries the IDENTICAL exact score."""
    from log_analysis_system_spark.queries.dedup import ngram_jaccard_pairs

    spark = _get_spark()
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{w}" for w in ws))
            for i, ws in enumerate(word_ids)
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, df_cap=None).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, df_cap=df_cap).collect()
    }
    assert set(capped) <= set(exact)
    for k, v in capped.items():
        assert exact[k] == v


@given(events_strategy)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_user_state_intervals_partition_time(rows):
    """Validity intervals per user must tile time: ordered by valid_from,
    each interval's valid_to equals the next's valid_from, exactly one
    is_current (the last), and no interval is empty-negative."""
    from pyspark.sql import functions as F

    from log_analysis_system_spark.queries.temporal import (
        q_user_state_intervals,
    )

    spark = _get_spark()
    import tempfile

    data = [
        (idx, BASE + timedelta(seconds=off), u, ["a", "b"][idx % 2], 0.0, "")
        for idx, (u, off) in enumerate(rows)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = q_user_state_intervals(spark, d).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]


# --------------------------------------------------------------- chunking

docs_strategy = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=90).map(
        lambda ws: " ".join(ws)
    ),
    min_size=1,
    max_size=8,
)


def model_chunks(text: str, C: int, S: int) -> list[tuple[int, int, str]]:
    """Pure-Python chunker: (chunk_idx, n_tokens, chunk_text)."""
    w = text.split(" ")
    n = len(w)
    n_chunks = 1 if n <= C else 1 + -(-(n - C) // S)
    out = []
    for i in range(n_chunks):
        part = w[i * S : i * S + C]
        out.append((i, len(part), " ".join(part)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_chunk_documents_matches_model(texts):
    """chunk_documents boundaries/bytes equal the pure-Python chunker, and
    stitching the stride-aligned prefixes reconstructs every document."""
    import hashlib

    from log_analysis_system_spark.queries.training_prep import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_chunk_documents,
    )

    spark = _get_spark()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            (r["doc_id"], r["chunk_idx"]): (r["chunk_tokens"], r["chunk_md5"])
            for r in q_chunk_documents(spark, d).collect()
        }
    for i, t in enumerate(texts):
        model = model_chunks(t, CHUNK_TOKENS, CHUNK_STRIDE)
        assert {k[1] for k in got if k[0] == i} == {m[0] for m in model}
        for idx, ntok, ctext in model:
            md5 = hashlib.md5(ctext.encode()).hexdigest()
            assert got[(i, idx)] == (ntok, md5), (i, idx)
        # stitching: stride-prefixes of each chunk + full last chunk == doc
        words = []
        for idx, _, ctext in model[:-1]:
            words.extend(ctext.split(" ")[:CHUNK_STRIDE])
        words.extend(model[-1][2].split(" "))
        assert " ".join(words) == t


# ------------------------- global_rank / grouped_prefix_sum vs naive windows

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    st.integers(1, 6),
)
def test_global_rank_matches_naive_row_number(values, nparts):
    """global_rank (range-partition + offset broadcast — the scale-safe
    replacement now load-bearing for score_correlation/quantile_transform)
    must equal the naive single-partition row_number for every partition
    count, including heavy ties (the (value, id) tiebreak makes it total)."""
    from pyspark.sql import functions as F

    from log_analysis_system_spark.operators.sampling import global_rank

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    got = {
        r["id"]: r["rnk"]
        for r in global_rank(
            df, [F.asc("v"), F.asc("id")], num_partitions=nparts
        ).collect()
    }
    exp = {
        idx: rank
        for rank, (v, idx) in enumerate(
            sorted((v, i) for i, v in enumerate(values))
        )
    }
    assert got == exp


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(-5, 5)),
        min_size=1,
        max_size=50,
    ),
    st.integers(1, 5),
)
def test_grouped_prefix_sum_matches_naive_window(rows, nparts):
    """grouped_prefix_sum (range-partitioned slice scan + offset lift) must
    equal the naive `sum(v) OVER (PARTITION BY g ORDER BY o, id)` running
    sum for every partition count — ties on the order key included."""
    from pyspark.sql import functions as F

    from log_analysis_system_spark.operators.sampling import grouped_prefix_sum

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, g, o, v) for i, (g, o, v) in enumerate(rows)],
        "id long, g long, o long, v long",
    )
    got = {
        r["id"]: r["cum"]
        for r in grouped_prefix_sum(
            df,
            ["g"],
            [F.asc("o"), F.asc("id")],
            F.col("v"),
            num_partitions=nparts,
        ).collect()
    }
    exp = {}
    by_g: dict[int, list[tuple[int, int, int]]] = {}
    for i, (g, o, v) in enumerate(rows):
        by_g.setdefault(g, []).append((o, i, v))
    for g, evs in by_g.items():
        evs.sort()
        run = 0
        for o, i, v in evs:
            run += v
            exp[i] = run
    assert got == exp
