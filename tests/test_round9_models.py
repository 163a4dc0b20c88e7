"""Round-9 model pins: the new operators checked against INDEPENDENT
pure-Python/pandas/numpy implementations on the sf0.001 driver data —
the `test_markov_fixpoint_matches_exact_linear_solve` pattern. The
DuckDB oracle already re-implements each query in SQL; these pins add a
third, non-SQL derivation so a shared misunderstanding between the two
query texts cannot hide."""

from __future__ import annotations

import pandas as pd

from log_analysis_system_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def _trade_edges_pd():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    pairs = {
        (int(c), 10_000_000 + int(s))
        for c, s in zip(m["o_custkey"], m["l_suppkey"])
    }
    edges: dict[int, list[int]] = {}
    for c, s in pairs:
        edges.setdefault(c, []).append(s)
        edges.setdefault(s, []).append(c)
    return edges


def test_betweenness_matches_pure_python_brandes(spark):
    """Exact integer match: independently run the level-synchronous
    Brandes unroll (8 pivots, depth 3, per-edge floored micro-unit
    dependencies) in plain Python dictionaries."""
    from log_analysis_system_spark.queries.graph import (
        BET_DEPTH,
        BET_MICRO,
        BET_SOURCES,
    )

    edges = _trade_edges_pd()
    srcs = sorted(n for n in edges if n < 10_000_000)[:BET_SOURCES]
    bc: dict[int, int] = {}
    for s in srcs:
        sigma = {s: 1}
        levels = [[s]]
        seen = {s}
        for _ in range(BET_DEPTH):
            nxt: dict[int, int] = {}
            for u in levels[-1]:
                for v in edges[u]:
                    if v in seen:
                        continue
                    nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, sg in nxt.items():
                sigma[v] = sg
            seen |= set(nxt)
            levels.append(sorted(nxt))
        delta = {v: 0 for v in levels[BET_DEPTH]}
        for d in range(BET_DEPTH - 1, 0, -1):
            nd = {}
            nxt_level = set(levels[d + 1])
            for v in levels[d]:
                acc = 0
                for w in edges[v]:
                    if w in nxt_level:
                        acc += sigma[v] * (BET_MICRO + delta[w]) // sigma[w]
                nd[v] = acc
            delta = nd
            for v, dv in nd.items():
                bc[v] = bc.get(v, 0) + dv
    expect = {v: x for v, x in bc.items() if x > 0}
    got = {
        r["node"]: r["bc_micro"]
        for r in QUERIES["betweenness_centrality"](spark, SF).collect()
    }
    assert got == expect


def test_fellegi_sunter_em_matches_float_em(spark):
    """The integer per-mille EM must track an independent FLOATING-POINT
    EM run on independently recomputed pattern counts: identical pattern
    histogram, posteriors within the per-mille quantization tolerance,
    and the highest-agreement pattern must carry the highest posterior."""
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["snkey"] = [
        re.sub(r"[^a-z0-9]", "", t.lower())[:40] for t in docs["text"]
    ]
    docs["blk"] = docs["snkey"].str[:6]
    cand = set()
    for _, g in docs.sort_values(["snkey", "doc_id"]).groupby("blk"):
        ids = list(g["doc_id"])
        for i, a in enumerate(ids):
            for b in ids[i + 1 : i + 4]:
                cand.add((min(a, b), max(a, b)))
    side = docs.set_index("doc_id")[["source", "lang", "n_chars"]]
    pat: dict[tuple, int] = {}
    for a, b in cand:
        ra, rb = side.loc[a], side.loc[b]
        f = (
            int(ra["source"] == rb["source"]),
            int(ra["lang"] == rb["lang"]),
            int(
                10 * abs(int(ra["n_chars"]) - int(rb["n_chars"]))
                <= min(int(ra["n_chars"]), int(rb["n_chars"]))
            ),
        )
        pat[f] = pat.get(f, 0) + 1
    rows = QUERIES["fellegi_sunter_em"](spark, SF).collect()
    got_counts = {
        (r["f_src"], r["f_lang"], r["f_len"]): r["n_pairs"] for r in rows
    }
    assert got_counts == pat
    # independent float EM
    p, m, u = 0.05, [0.9] * 3, [0.1] * 3
    for _ in range(5):
        tm = tu = 0.0
        nm = [0.0] * 3
        nu = [0.0] * 3
        tot = 0
        for bits, n in pat.items():
            lm, lu = p, 1 - p
            for i in range(3):
                lm *= m[i] if bits[i] else 1 - m[i]
                lu *= u[i] if bits[i] else 1 - u[i]
            post = lm / (lm + lu)
            tm += n * post
            tu += n * (1 - post)
            tot += n
            for i in range(3):
                nm[i] += n * post * bits[i]
                nu[i] += n * (1 - post) * bits[i]
        p = tm / tot
        m = [nm[i] / tm for i in range(3)]
        u = [nu[i] / tu for i in range(3)]
    posts = {}
    for bits, n in pat.items():
        lm, lu = p, 1 - p
        for i in range(3):
            lm *= m[i] if bits[i] else 1 - m[i]
            lu *= u[i] if bits[i] else 1 - u[i]
        posts[bits] = lm / (lm + lu)
    for r in rows:
        bits = (r["f_src"], r["f_lang"], r["f_len"])
        # per-mille parameter quantization drifts the posterior a little;
        # the DECISIONS and ordering are what production consumes
        assert abs(r["match_ppm"] / 1e6 - posts[bits]) < 0.05, (
            bits,
            r["match_ppm"],
            posts[bits],
        )
    best = max(rows, key=lambda r: r["match_ppm"])
    assert (best["f_src"], best["f_lang"], best["f_len"]) == max(
        posts, key=posts.get
    )


def test_table_stats_analyze_matches_pandas(spark):
    """Exact match of NDV/MCV/min/max against pandas value_counts and
    quartiles against numpy's linear interpolation (the percentile
    definition both engines implement)."""
    import numpy as np

    rows = {
        r["col_name"]: r
        for r in QUERIES["table_stats_analyze"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    q = (li["l_quantity"] * 1000).round().astype("int64")
    r = rows["l_quantity"]
    assert r["n_rows"] == len(q)
    assert r["ndv"] == q.nunique()
    vc = q.value_counts()
    top_n = int(vc.max())
    assert r["mcv_n"] == top_n
    assert int(r["mcv_value"]) == min(int(v) for v in vc[vc == top_n].index)
    assert int(r["min_v"]) == int(q.min())
    assert int(r["max_v"]) == int(q.max())
    assert abs(r["p50"] - float(np.percentile(q, 50))) < 1e-6
    rf = rows["l_returnflag"]
    vc2 = li["l_returnflag"].value_counts()
    assert rf["ndv"] == li["l_returnflag"].nunique()
    assert rf["mcv_n"] == int(vc2.max())
    assert rf["p50"] is None


def test_textrank_matches_pure_python_pagerank(spark):
    """Exact integer match: independently rebuild the support-thresholded
    co-occurrence graph in pandas and run the same 3-round damped integer
    PageRank recurrence in plain Python dictionaries; the engine's top-20
    must equal the model's top-20 (pr desc, term asc) with identical
    micro-unit ranks."""
    from collections import Counter

    from log_analysis_system_spark.queries.behavior import COOC_MIN_DOCS
    from log_analysis_system_spark.queries.graph import (
        PR_ITERS,
        PR_START,
        TEXTRANK_TOP_K,
    )

    rows = QUERIES["textrank_keywords"](spark, SF).collect()
    assert len(rows) == len({r["term"] for r in rows}) == TEXTRANK_TOP_K
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pair_docs: Counter = Counter()
    for _, row in docs.iterrows():
        terms = sorted({t for t in row["text"].split(" ") if t})
        for i, a in enumerate(terms):
            for b in terms[i + 1 :]:
                pair_docs[(a, b)] += 1
    adj: dict[str, list[str]] = {}
    for (a, b), n in pair_docs.items():
        if n >= COOC_MIN_DOCS:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    pr = {t: PR_START for t in adj}
    for _ in range(PR_ITERS):
        contrib: dict[str, int] = {}
        for s, nbrs in adj.items():
            c = pr[s] // len(nbrs)
            for d in nbrs:
                contrib[d] = contrib.get(d, 0) + c
        pr = {d: 150_000 + 85 * c // 100 for d, c in contrib.items()}
    expect = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[
        :TEXTRANK_TOP_K
    ]
    got = sorted(
        ((r["term"], r["pr_micro"]) for r in rows),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == expect


def test_wasserstein_matches_numpy_cdf_integral(spark):
    """Exact integer match: recompute each source's W1-vs-rest in numpy
    as the CDF-difference integral over the bucket grid — the textbook
    1-D earth-mover identity, derived independently of both the engine
    plan and the oracle SQL."""
    from log_analysis_system_spark.queries.data_quality import W1_GRID_W

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["bucket"] = docs["n_chars"] // W1_GRID_W
    grid = sorted(docs["bucket"].unique())
    expect = {}
    for src, g in docs.groupby("source"):
        ca = g["bucket"].value_counts()
        rest = docs[docs["source"] != src]["bucket"].value_counts()
        na, nb = len(g), len(docs) - len(g)
        cum_a = cum_b = 0
        s = 0
        for i, bkt in enumerate(grid):
            cum_a += int(ca.get(bkt, 0))
            cum_b += int(rest.get(bkt, 0))
            if i + 1 < len(grid):
                gap = int(grid[i + 1] - bkt)
                s += gap * abs(cum_a * nb - cum_b * na)
        expect[src] = (na, s * 1000 // (na * nb))
    got = {
        r["source"]: (r["n_docs"], r["w1_milli"])
        for r in QUERIES["wasserstein_source_drift"](spark, SF).collect()
    }
    assert got == expect


def test_quantile_summary_rollup_matches_numpy_merge(spark):
    """Exact integer match: rebuild the per-day 32-rank summaries and
    the weighted-CDF merge in numpy/pandas, then check the served
    estimates and audited ranks; also assert every audited rank error
    stays under 2% (the docstring's measured bound with headroom)."""
    import numpy as np

    from log_analysis_system_spark.queries.olap_extras import QSR_QS, QSR_R

    ev = pd.read_parquet(f"{SF}/events.parquet")
    v = pd.DataFrame(
        {
            "day": ev["ts"].dt.date,
            "v": (ev["value"] * 1000).round().astype("int64"),
        }
    )
    wgt: dict[int, int] = {}
    for _, g in v.groupby("day"):
        vals = np.sort(g["v"].values)
        n_d = len(vals)
        for r in range(1, QSR_R + 1):
            x = int(vals[(n_d - 1) * r // QSR_R])
            wgt[x] = wgt.get(x, 0) + n_d
    n = len(v)
    items = sorted(wgt.items())
    expect = {}
    for q in QSR_QS:
        c = 0
        est = None
        for x, w in items:
            c += w
            if c * 10000 >= q * QSR_R * n:
                est = x
                break
        le = int((v["v"] <= est).sum())
        rank_ppm = le * 1_000_000 // n
        expect[q] = (est, n, rank_ppm, abs(rank_ppm - q * 100))
    rows = QUERIES["quantile_summary_rollup"](spark, SF).collect()
    got = {
        r["q_bp"]: (
            r["est_milli"],
            r["n_total"],
            r["rank_ppm"],
            r["err_ppm"],
        )
        for r in rows
    }
    assert got == expect
    assert all(r["err_ppm"] < 20_000 for r in rows), rows
