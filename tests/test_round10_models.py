"""Round-10 model pins: the new operators checked against INDEPENDENT
pure-Python/pandas/numpy implementations on the sf0.001 driver data
(the test_round9_models pattern). The DuckDB oracle already
re-implements each query in SQL; these pins add a third, non-SQL
derivation so a shared misunderstanding between the two query texts
cannot hide — e.g. Shapley is derived here by averaging marginal
contributions over ALL 4! permutations, not via the subset-weight
formula both engines use."""

from __future__ import annotations

import hashlib
import itertools
import math

import pandas as pd

from log_analysis_system_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def _events_pd() -> pd.DataFrame:
    e = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "event_type", "ts", "event_id"]
    ].copy()
    # normalize to integer MICROseconds whatever unit pandas decoded
    e["t"] = e["ts"].astype("datetime64[us]").astype("int64")
    return e


def test_shapley_matches_permutation_average(spark):
    """Exact match against the DEFINITION of the Shapley value: for each
    of the 24 orderings of the 4 channels, the marginal contribution of
    each channel when it joins the coalition of its predecessors;
    phi = mean over orderings. Emitted in 24ths, so the mean is exact."""
    from log_analysis_system_spark.queries.behavior import SHAPLEY_BITS

    e = _events_pd()
    masks: list[int] = []
    for _, g in e.groupby("user_id"):
        p = g[g.event_type == "purchase"].sort_values(["t", "event_id"])
        if p.empty:
            continue
        ft, fid = int(p.iloc[0].t), int(p.iloc[0].event_id)
        before = g[(g.t < ft) | ((g.t == ft) & (g.event_id < fid))]
        m = 0
        for c, b in SHAPLEY_BITS:
            if (before.event_type == c).any():
                m |= b
        masks.append(m)

    def v(s: int) -> int:
        return sum(1 for m in masks if (m & s) == m)

    bits = [b for _, b in SHAPLEY_BITS]
    phi24 = {b: 0 for b in bits}
    for perm in itertools.permutations(bits):
        s = 0
        for b in perm:
            phi24[b] += v(s | b) - v(s)
            s |= b
    got = {
        r["channel"]: (r["phi_24ths"], r["conv_total"], r["conv_untouched"])
        for r in QUERIES["shapley_attribution"](spark, SF).collect()
    }
    for c, b in SHAPLEY_BITS:
        assert got[c][0] == phi24[b], c
        assert got[c][1] == v(15)
        assert got[c][2] == v(0)
    # efficiency axiom: credits partition v(N) - v(empty) exactly
    assert sum(phi24.values()) == 24 * (v(15) - v(0))


def test_window_funnel_matches_brute_force(spark):
    """Exact match against the naive O(n^3)-per-user triple loop over
    (view, click, purchase) chains — no greedy pruning, no SQL."""
    from log_analysis_system_spark.queries.behavior import WF_WINDOW_US

    e = _events_pd()
    w = WF_WINDOW_US
    levels: dict[int, int] = {}
    for uid, g in e.groupby("user_id"):
        ev = sorted(
            (int(r.t), int(r.event_id), r.event_type)
            for r in g.itertuples()
        )
        lvl = 1 if any(x[2] == "view" for x in ev) else 0
        vs = [x for x in ev if x[2] == "view"]
        cs = [x for x in ev if x[2] == "click"]
        ps = [x for x in ev if x[2] == "purchase"]
        for v in vs:
            for c in cs:
                if c[:2] > v[:2] and c[0] - v[0] <= w:
                    lvl = max(lvl, 2)
                    for p in ps:
                        if p[:2] > c[:2] and p[0] - v[0] <= w:
                            lvl = max(lvl, 3)
        levels[int(uid)] = lvl
    want = pd.Series(list(levels.values())).value_counts().to_dict()
    got = {
        r["level"]: r["n_users"]
        for r in QUERIES["window_funnel_steps"](spark, SF).collect()
    }
    assert got == {int(k): int(v) for k, v in want.items()}


def test_item_cf_matches_pandas_model(spark):
    """Exact match against a pandas/pure-Python cosine-ppm ranking."""
    from log_analysis_system_spark.queries.recsys import MIN_CO, TOP_K

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    b = {
        (int(o), int(i))
        for o, i in zip(li.l_orderkey, li.l_partkey)
    }
    ni: dict[int, int] = {}
    baskets: dict[int, list[int]] = {}
    for o, i in b:
        ni[i] = ni.get(i, 0) + 1
        baskets.setdefault(o, []).append(i)
    co: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        for a, c in itertools.combinations(sorted(items), 2):
            co[(a, c)] = co.get((a, c), 0) + 1
    rows = []
    for (a, c), n in co.items():
        if n < MIN_CO:
            continue
        for item, other in ((a, c), (c, a)):
            rows.append(
                (
                    item,
                    other,
                    n,
                    n * n * 1_000_000 // (ni[item] * ni[other]),
                )
            )
    want = set()
    df = pd.DataFrame(rows, columns=["item", "other", "co", "score"])
    for item, g in df.groupby("item"):
        g = g.sort_values(
            ["score", "co", "other"], ascending=[False, False, True]
        )
        for rk, r in enumerate(g.itertuples(), 1):
            if rk > TOP_K:
                break
            want.add((r.item, r.other, r.co, r.score, rk))
    got = {
        (r["item"], r["other"], r["co"], r["score_ppm"], r["rk"])
        for r in QUERIES["item_cf_recs"](spark, SF).collect()
    }
    assert got == want


def test_grid_dbscan_matches_python_bfs(spark):
    """Exact cell labeling against a pure-Python quantize + BFS."""
    from log_analysis_system_spark.queries.density import (
        DB_MINPTS,
        DB_SCALE,
        _GRID,
        _OFF,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    counts: dict[tuple[int, int], int] = {}
    for v in emb.embedding:
        cx = math.floor(float(v[0]) * DB_SCALE)
        cy = math.floor(float(v[1]) * DB_SCALE)
        counts[(cx, cy)] = counts.get((cx, cy), 0) + 1
    core = {c for c, n in counts.items() if n >= DB_MINPTS}
    cid = {c: (c[0] + _OFF) * _GRID + c[1] + _OFF for c in core}
    label = dict(cid)
    # BFS per component, labeling with the component's min cell id
    seen: set[tuple[int, int]] = set()
    for start in core:
        if start in seen:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            cur = frontier.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in core and nb not in comp:
                        comp.add(nb)
                        frontier.append(nb)
        m = min(cid[c] for c in comp)
        for c in comp:
            label[c] = m
        seen |= comp
    want = {(cid[c], label[c], counts[c]) for c in core}
    got = {
        (r["cell_id"], r["cluster_id"], r["n_points"])
        for r in QUERIES["grid_dbscan_clusters"](spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0


def test_bloom_prefiltered_join_matches_python_bloom(spark):
    """Exact audit-count match against a pure-Python md5 Bloom model,
    plus the structural pins: zero false negatives (every true join row
    passes) and revenue == the plain pandas join's revenue."""
    from log_analysis_system_spark.queries.olap_extras import (
        RF_BLOOM_K,
        RF_BLOOM_M,
        RF_DIM_PRIORITY,
    )

    def positions(key: int) -> list[int]:
        h = hashlib.md5(str(key).encode()).hexdigest()
        return [
            int(h[i * 4 : i * 4 + 4], 16) % RF_BLOOM_M
            for i in range(RF_BLOOM_K)
        ]

    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    dim = {
        int(k)
        for k in o[o.o_orderpriority == RF_DIM_PRIORITY].o_orderkey
    }
    bits: set[int] = set()
    for k in dim:
        bits.update(positions(k))
    pos_cache = {
        int(k): all(p in bits for p in positions(int(k)))
        for k in li.l_orderkey.unique()
    }
    passed = li[[pos_cache[int(k)] for k in li.l_orderkey]]
    matched = passed[[int(k) in dim for k in passed.l_orderkey]]
    rev = int(
        sum(
            # HALF_UP like Spark/DuckDB round(), not Python's banker's
            math.floor(p * (1 - d) * 100 + 0.5)
            for p, d in zip(matched.l_extendedprice, matched.l_discount)
        )
    )
    row = QUERIES["bloom_prefiltered_join"](spark, SF).collect()[0]
    assert row["n_fact"] == len(li)
    assert row["n_pass_bloom"] == len(passed)
    assert row["n_false_pass"] == len(passed) - len(matched)
    assert row["n_joined_rows"] == len(matched)
    assert row["revenue_cents"] == rev
    # no false negatives: the plain join has exactly as many rows
    plain = li[[int(k) in dim for k in li.l_orderkey]]
    assert len(plain) == len(matched)


def test_naive_bayes_matches_pure_python(spark):
    """Exact confusion-matrix match against a dictionary-based NB with
    float log-probs (math.log + math.floor reproduces the micro-nat
    floors; the boundary audit guarantees no flip within 1e-7)."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    train = docs[docs.doc_id % 4 != 0]
    ev = docs[docs.doc_id % 4 == 0]
    cw: dict[tuple[str, str], int] = {}
    nc: dict[str, int] = {}
    vocab: set[str] = set()
    for lang, text in zip(train.lang, train.text):
        for w in text.split(" "):
            if not w:
                continue
            cw[(lang, w)] = cw.get((lang, w), 0) + 1
            nc[lang] = nc.get(lang, 0) + 1
            vocab.add(w)
    v = len(vocab)
    dc = train.lang.value_counts().to_dict()
    dtot = len(train)
    prior = {
        c: math.floor(math.log(dc[c] / dtot) * 1_000_000) for c in nc
    }
    conf: dict[tuple[str, str], int] = {}
    for _, r in ev.iterrows():
        toks = [w for w in r.text.split(" ") if w]
        if not toks:
            continue
        best = None
        for c in sorted(nc):
            s = prior[c] + sum(
                math.floor(
                    math.log((cw.get((c, w), 0) + 1) / (nc[c] + v))
                    * 1_000_000
                )
                for w in toks
            )
            if best is None or s > best[0]:
                best = (s, c)
        conf[(r.lang, best[1])] = conf.get((r.lang, best[1]), 0) + 1
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in QUERIES["nb_lang_confusion"](spark, SF).collect()
    }
    assert got == conf


def test_join_order_advisor_matches_python_cms(spark):
    """Exact estimate match against a pure-Python count-min model, and
    the decision pin: chosen marks the minimum estimate."""
    from log_analysis_system_spark.queries.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )
    from log_analysis_system_spark.queries.olap_extras import (
        JC_D,
        JC_W,
        JOA_PRIORITY,
        JOA_RETURNFLAG,
        JOA_SEGMENT,
    )

    def buckets(key: int) -> list[int]:
        base = int(hashlib.md5(str(key).encode()).hexdigest()[:7], 16)
        return [
            (base * MINHASH_A[d] + MINHASH_B[d]) % MINHASH_P % JC_W
            for d in range(JC_D)
        ]

    def cms(keys) -> list[dict[int, int]]:
        sk = [dict() for _ in range(JC_D)]
        for k in keys:
            for d, b in enumerate(buckets(int(k))):
                sk[d][b] = sk[d].get(b, 0) + 1
        return sk

    def est(ka, kb) -> int:
        sa, sb = cms(ka), cms(kb)
        return min(
            sum(c * sb[d].get(b, 0) for b, c in sa[d].items())
            for d in range(JC_D)
        )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    lo_est = est(
        li[li.l_returnflag == JOA_RETURNFLAG].l_orderkey,
        o[o.o_orderpriority == JOA_PRIORITY].o_orderkey,
    )
    oc_est = est(
        o[o.o_orderpriority == JOA_PRIORITY].o_custkey,
        cu[cu.c_mktsegment == JOA_SEGMENT].c_custkey,
    )
    rows = {
        r["first_join"]: r
        for r in QUERIES["join_order_advisor"](spark, SF).collect()
    }
    assert rows["lineitem_orders"]["cms_n"] == lo_est
    assert rows["orders_customer"]["cms_n"] == oc_est
    m = min(lo_est, oc_est)
    for r in rows.values():
        assert r["chosen"] == (r["cms_n"] == m)
        assert r["never_underestimates"]  # one-sided CMS guarantee


def test_propensity_att_matches_pure_python(spark):
    """Exact match against a dictionary-based Cochran subclassification
    model, including the off-support exclusion the sf0.001 strata
    exercise (strata lacking a treated or control group contribute
    nothing to ATT)."""
    from log_analysis_system_spark.queries.stats_models import (
        ATT_CUT,
        ATT_ERR_MIN,
    )

    e = _events_pd()
    cut = pd.Timestamp(ATT_CUT).value // 1000  # ns -> us
    pre: dict[int, list[int]] = {}
    post: dict[int, int] = {}
    for r in e.itertuples():
        u = int(r.user_id)
        if r.t < cut:
            a = pre.setdefault(u, [0, 0])
            a[0] += 1
            a[1] += r.event_type == "error"
        elif r.event_type == "purchase":
            post[u] = post.get(u, 0) + 1

    def stratum(n):
        return 0 if n <= 25 else 1 if n <= 30 else 2 if n <= 35 \
            else 3 if n <= 40 else 4

    cells: dict[tuple[int, bool], list[int]] = {}
    for u, (n_pre, n_err) in pre.items():
        k = (stratum(n_pre), n_err >= ATT_ERR_MIN)
        c = cells.setdefault(k, [0, 0])
        c[0] += 1
        c[1] += post.get(u, 0)
    num = den = 0
    per = {}
    for s in {k[0] for k in cells}:
        nt, yt = cells.get((s, True), [0, 0])
        ncc, yc = cells.get((s, False), [0, 0])
        on = nt > 0 and ncc > 0
        diff = (yt * 1000 // nt - yc * 1000 // ncc) if on else None
        per[s] = (nt, ncc, yt, yc, diff, on)
        if on:
            num += nt * diff
            den += nt
    den = max(den, 1)
    att = num // den if num >= 0 else -((-num) // den)
    rows = {
        r["stratum"]: r
        for r in QUERIES["propensity_stratified_att"](
            spark, SF
        ).collect()
    }
    assert set(rows) == set(per)
    for s, (nt, ncc, yt, yc, diff, on) in per.items():
        r = rows[s]
        assert (
            r["n_treated"], r["n_control"], r["y_treated"],
            r["y_control"], r["diff_milli"], r["on_support"],
            r["att_milli"],
        ) == (nt, ncc, yt, yc, diff, on, att)
    # sf0.001 must actually exercise the positivity rule
    assert any(not v[5] for v in per.values())


def test_gini_stump_matches_exhaustive_python(spark):
    """Exact match against the naive per-threshold loop (no prefix-scan):
    enumerate every candidate split of both features, score weighted
    binary Gini in exact integer ppm, take the (gini, feature,
    threshold) minimum."""
    from log_analysis_system_spark.queries.cart import CART_CUT

    e = _events_pd()
    cut = pd.Timestamp(CART_CUT).value // 1000
    pre: dict[int, list[int]] = {}
    buyers: set[int] = set()
    for r in e.itertuples():
        u = int(r.user_id)
        if r.t < cut:
            a = pre.setdefault(u, [0, 0])
            a[0] += 1
            a[1] += r.event_type == "error"
        elif r.event_type == "purchase":
            buyers.add(u)
    units = [
        (n, err, 1 if u in buyers else 0)
        for u, (n, err) in pre.items()
    ]
    best = None
    for fi, fname in ((0, "n_err"), (1, "n_pre")):
        col = [(u[1] if fname == "n_err" else u[0], u[2]) for u in units]
        for thr in sorted({v for v, _ in col}):
            left = [(v, y) for v, y in col if v <= thr]
            right = [(v, y) for v, y in col if v > thr]
            if not right:
                continue
            nl, pl = len(left), sum(y for _, y in left)
            nr, pr = len(right), sum(y for _, y in right)
            num = nr * (nl * nl - pl * pl - (nl - pl) ** 2) + nl * (
                nr * nr - pr * pr - (nr - pr) ** 2
            )
            g = num * 1_000_000 // (nl * nr * len(col))
            key = (g, fname, thr)
            if best is None or key < best[0]:
                best = (key, nl, pl, nr, pr)
    (g, fname, thr), nl, pl, nr, pr = best
    row = QUERIES["gini_stump_conversion"](spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["feature"], r["threshold"], r["gini_ppm"]) == (fname, thr, g)
    assert (r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (
        nl, pl, nr, pr,
    )
    assert r["pred_left"] == (pl * 2 > nl)
    assert r["pred_right"] == (pr * 2 > nr)
    n, p = nl + nr, pl + pr
    assert r["root_gini_ppm"] == (
        (n * n - p * p - (n - p) ** 2) * 1_000_000 // (n * n)
    )
    # a split can never be worse than the root (at sf0.001 every user
    # converts, so the root is already pure and the bound is tight)
    assert g <= r["root_gini_ppm"]


def test_ipf_raking_matches_float_model_and_converges(spark):
    """Independent check of the integer IPF: a FLOAT-arithmetic raking
    run (no micro-units, no floors) must agree with every final weight
    to within the floor-error envelope, and the achieved margins must
    converge to the reference targets (dev <= 0.1%)."""
    from log_analysis_system_spark.queries.stats_models import (
        IPF_CUT,
        IPF_MU,
        IPF_ROUNDS,
    )

    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cut = pd.Timestamp(IPF_CUT)
    cur = (
        j[j.o_orderdate >= cut]
        .groupby(["o_orderpriority", "c_mktsegment"])
        .size()
    )
    ref = (
        j[j.o_orderdate < cut]
        .groupby(["o_orderpriority", "c_mktsegment"])
        .size()
    )
    rowt = ref.groupby(level=0).sum().to_dict()
    colt = ref.groupby(level=1).sum().to_dict()
    w = {k: float(v) for k, v in cur.items()}
    for _ in range(IPF_ROUNDS):
        rs: dict = {}
        for (p, s), v in w.items():
            rs[p] = rs.get(p, 0.0) + v
        w = {
            (p, s): v * rowt.get(p, 0) / rs[p] if rs[p] else 0.0
            for (p, s), v in w.items()
        }
        cs: dict = {}
        for (p, s), v in w.items():
            cs[s] = cs.get(s, 0.0) + v
        w = {
            (p, s): v * colt.get(s, 0) / cs[s] if cs[s] else 0.0
            for (p, s), v in w.items()
        }
    rows = QUERIES["ipf_margin_raking"](spark, SF).collect()
    assert len(rows) == len(w)
    for r in rows:
        want = w[(r["priority"], r["segment"])]
        got = r["w_micro"] / IPF_MU
        # floors lose < 1 micro-unit per multiply; 2*ROUNDS multiplies
        assert abs(got - want) <= max(1e-3 * want, 1e-3), (r, want)
        assert r["row_dev_ppm"] <= 1000 and r["col_dev_ppm"] <= 1000


def test_assortativity_matches_pure_python(spark):
    """Exact moment sums + the closing Pearson expression reproduced in
    pure Python (same operation order), and the structural sign pin: a
    bipartite hub-and-spoke trade graph is disassortative (r < 0)."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    pairs = {
        (int(c), 10_000_000 + int(s))
        for c, s in zip(m.o_custkey, m.l_suppkey)
    }
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    du = [deg[a] for a, _ in edges]
    dv = [deg[b] for _, b in edges]
    mm = len(edges)
    sx, sy = sum(du), sum(dv)
    sxx = sum(x * x for x in du)
    syy = sum(y * y for y in dv)
    sxy = sum(x * y for x, y in zip(du, dv))
    r = math.floor(
        (float(mm) * sxy - float(sx) * sy) * 1_000_000
        / math.sqrt(float(mm) * sxx - float(sx) * sx)
        / math.sqrt(float(mm) * syy - float(sy) * sy)
    )
    row = QUERIES["degree_assortativity"](spark, SF).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["m_directed_edges"] == mm
    assert row["assortativity_ppm"] == r
    assert r < 0  # bipartite hub-and-spoke -> disassortative


def test_ams_f2_matches_pure_python_sketch(spark):
    """Third derivation of the AMS F2 row: replay the sign-sketch in
    pure Python — md5 hex prefix, affine family, parity sign, median of
    the 7 squared counters — and the exact F2 by Counter. Every output
    integer must match the Spark plan bit-for-bit."""
    from collections import Counter

    from log_analysis_system_spark.queries.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )
    from log_analysis_system_spark.queries.olap_extras import AMS_D

    e = pd.read_parquet(f"{SF}/events.parquet")["user_id"]
    z = [0] * AMS_D
    for uid in e:
        base = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:7], 16)
        for d in range(AMS_D):
            z[d] += 2 * ((base * MINHASH_A[d] + MINHASH_B[d]) % MINHASH_P % 2) - 1
    ams = sorted(v * v for v in z)[AMS_D // 2]
    counts = Counter(int(u) for u in e)
    true_f2 = sum(c * c for c in counts.values())

    row = QUERIES["ams_f2_estimate"](spark, SF).collect()[0]
    assert row["true_f2"] == true_f2
    assert row["n_keys"] == len(counts)
    assert row["ams_f2"] == ams
    assert row["err_ppm"] == abs(ams - true_f2) * 1_000_000 // true_f2


def test_modularity_matches_pure_python_lpa(spark):
    """Third derivation of the modularity row: replay self-preference
    sync LPA and the Q formula in pure Python (dict-of-lists graph,
    explicit vote Counter with the (count DESC, label ASC) tiebreak —
    NOT the integer argmax encoding both query texts use) and compare
    every per-community integer and the global Q bit-for-bit."""
    from collections import Counter, defaultdict

    from log_analysis_system_spark.queries.graph import (
        LPA_FANOUT,
        LPA_ITERS,
        SUPP_OFFSET,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    t = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    pairs = Counter(
        (int(c), SUPP_OFFSET + int(s))
        for c, s in zip(t["o_custkey"], t["l_suppkey"])
    )
    top = defaultdict(list)
    for (c, s), n in pairs.items():
        top[c].append((-n, s))
    edges = []
    for c, lst in top.items():
        for _, s in sorted(lst)[:LPA_FANOUT]:
            edges.append((c, s))
            edges.append((s, c))
    nodes = sorted({u for u, _ in edges})
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    lab = {u: u for u in nodes}
    for _ in range(LPA_ITERS):
        new = {}
        for u in nodes:
            votes = Counter(lab[v] for v in adj[u])
            votes[lab[u]] += 1  # self-preference vote
            new[u] = min(
                votes, key=lambda la: (-votes[la], la)
            )
        lab = new
    m2 = len(edges)
    deg = Counter(u for u, _ in edges)
    deg_c = defaultdict(int)
    e_c = defaultdict(int)
    members = Counter(lab.values())
    for u in nodes:
        deg_c[lab[u]] += deg[u]
    for u, v in edges:
        if lab[u] == lab[v]:
            e_c[lab[u]] += 1
    snum = sum(
        e_c.get(c, 0) * m2 - d * d for c, d in deg_c.items()
    )
    q_ppm = math.floor(float(snum) * 1_000_000 / float(m2) / float(m2))

    rows = QUERIES["modularity_communities"](spark, SF).collect()
    got = {
        r["community"]: (
            r["n_members"],
            r["intra_edges"],
            r["deg_sum"],
            r["modularity_ppm"],
        )
        for r in rows
    }
    want = {
        c: (members[c], e_c.get(c, 0), deg_c[c], q_ppm) for c in members
    }
    assert got == want and q_ppm > 0


def test_randomized_response_matches_pure_python(spark):
    """Third derivation of the randomized-response row: replay the md5
    flip coin, the per-day privatized counts, and the Warner debias in
    pure Python (float estimator + math.floor, not the SQL text) and
    compare every output integer bit-for-bit."""
    from log_analysis_system_spark.queries.data_quality import (
        RR_KEEP_DEN,
        RR_KEEP_NUM,
    )

    e = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_id", "ts", "event_type"]
    ]
    days = {}
    for eid, ts, et in zip(e["event_id"], e["ts"], e["event_type"]):
        day = pd.Timestamp(ts).date()
        bit = 1 if et == "purchase" else 0
        h = int(
            hashlib.md5(f"rr{int(eid)}".encode()).hexdigest()[:7], 16
        )
        keep = h % RR_KEEP_DEN < RR_KEEP_NUM
        n, r, t = days.get(day, (0, 0, 0))
        days[day] = (n + 1, r + (bit if keep else 1 - bit), t + bit)

    want = {}
    for day, (n, r, t) in days.items():
        est = math.floor(float(4 * r - n) * 1_000_000 / float(2 * n))
        true = t * 1_000_000 // n
        want[day] = (n, r, est, true, abs(est - true))

    rows = QUERIES["randomized_response_rate"](spark, SF).collect()
    got = {
        r["day"]: (
            r["n"],
            r["reported_ones"],
            r["est_ppm"],
            r["true_ppm"],
            r["err_ppm"],
        )
        for r in rows
    }
    assert got == want and got


def test_rake_matches_pure_python(spark):
    """Third derivation of the RAKE row: pure-Python phrase
    segmentation (explicit run-splitting on stopwords, not a windowed
    prefix sum), deg/freq word scores, phrase aggregation — every
    emitted (phrase, n_tokens, n_occurrences, score_ppm) bit-for-bit."""
    from collections import Counter, defaultdict

    from log_analysis_system_spark.queries.text_analysis import (
        _EN_STOPWORDS,
        RAKE_MAX_LEN,
        RAKE_TOP_K,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    stop = set(_EN_STOPWORDS)
    phrases = []  # list of token tuples
    for text in docs["text"]:
        run = []
        for tok in [t for t in text.split(" ") if t]:
            if tok in stop:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(tuple(run))
    kept = [p for p in phrases if len(p) <= RAKE_MAX_LEN]
    freq = Counter()
    deg = Counter()
    for p in kept:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    by_phrase = defaultdict(int)
    for p in kept:
        by_phrase[p] += 1
    scored = [
        (" ".join(p), len(p), n, sum(score[w] for w in p))
        for p, n in by_phrase.items()
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    want = set(scored[:RAKE_TOP_K])

    got = {
        (r["phrase"], r["n_tokens"], r["n_occurrences"], r["score_ppm"])
        for r in QUERIES["rake_keywords"](spark, SF).collect()
    }
    assert got == want and len(got) == RAKE_TOP_K


def test_aqp_estimate_matches_pure_python(spark):
    """Third derivation of the AQP row: pure-Python sample membership
    (md5), HT scale-up, dollar-variance CI — every group row
    bit-for-bit, and the planted guarantee that the estimator's CI
    covers the truth for every group at this SF."""
    from collections import defaultdict

    from log_analysis_system_spark.queries.olap_extras import AQP_PCT

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        [
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            "l_extendedprice",
            "l_discount",
        ]
    ]
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])  # nt, st_c, ns, ss_c, sx2
    for ok, ln, rf, ls, px, dc in zip(
        li["l_orderkey"],
        li["l_linenumber"],
        li["l_returnflag"],
        li["l_linestatus"],
        li["l_extendedprice"],
        li["l_discount"],
    ):
        rev = float(px) * (1.0 - float(dc))
        # HALF_UP like both engines' round(), not Python's banker's
        rev_c = int(math.floor(rev * 100 + 0.5))
        rev_d = int(math.floor(rev + 0.5))
        h = int(
            hashlib.md5(f"{int(ok)}-{int(ln)}".encode()).hexdigest()[:7], 16
        )
        ins = h % 100 < AQP_PCT
        a = acc[(rf, ls)]
        a[0] += 1
        a[1] += rev_c
        if ins:
            a[2] += 1
            a[3] += rev_c
            a[4] += rev_d * rev_d
    scale = 100 // AQP_PCT
    want = {}
    for k, (nt, st, ns, ss, sx2) in acc.items():
        est = ss * scale
        err = abs(est - st) * 1_000_000 // st
        covers = abs(est - st) / 100.0 <= 2.0 * math.sqrt(90.0 * float(sx2))
        want[k] = (ns, ns * scale, nt, est, st, err, covers)

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["n_sample"],
            r["n_est"],
            r["n_true"],
            r["sum_est_c"],
            r["sum_true_c"],
            r["err_ppm"],
            r["ci_covers"],
        )
        for r in QUERIES["aqp_revenue_estimate"](spark, SF).collect()
    }
    assert got == want and got
    assert all(v[6] for v in want.values())  # CI covers truth everywhere


def test_holt_winters_matches_pure_python(spark):
    """Third derivation of the Holt-Winters row: the triple-smoothing
    recurrence replayed as a plain Python loop over the daily series
    (floats + math.floor, a rotating 7-slot seasonal list — not the
    SQL register CASEs) and compared bit-for-bit."""
    from log_analysis_system_spark.queries.temporal import HW_M

    e = pd.read_parquet(f"{SF}/events.parquet")[["ts", "value"]]
    e["day"] = e["ts"].astype("datetime64[us]").dt.date
    # HALF_UP per-row rounding like round(value*1000) in both engines
    daily = []
    for day, g in e.groupby("day"):
        y = sum(int(math.floor(float(v) * 1000 + 0.5)) for v in g["value"])
        daily.append((day, y))
    daily.sort()

    s = [0] * HW_M
    want = {}
    for t, (day, y) in enumerate(daily, start=1):
        if t == 1:
            level, b = y, 0
        else:
            sprev = s[(t - 1) % HW_M]
            lnew = math.floor((y - sprev + level + b) / 2.0)
            b = math.floor((lnew - level + b) / 2.0)
            s[(t - 1) % HW_M] = math.floor((y - lnew + sprev) / 2.0)
            level = lnew
        want[day] = (y, level, b, s[t % HW_M], level + b + s[t % HW_M])

    got = {
        r["day"]: (
            r["value_milli"],
            r["level_milli"],
            r["trend_milli"],
            r["season_next_milli"],
            r["forecast_next_milli"],
        )
        for r in QUERIES["holt_winters_daily"](spark, SF).collect()
    }
    assert got == want and len(got) == 30


def test_croston_matches_pure_python(spark):
    """Third derivation of the Croston row: per-part Python loop over
    the (day, qty) demand sequence — explicit date arithmetic and the
    coupled z/p recurrences as float ops + math.floor — compared
    bit-for-bit for every part."""
    import datetime as _dt
    from collections import defaultdict

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_partkey", "l_shipdate", "l_quantity"]
    ]
    dem = defaultdict(lambda: defaultdict(int))
    for pk, sd, q in zip(
        li["l_partkey"], li["l_shipdate"], li["l_quantity"]
    ):
        day = pd.Timestamp(sd).date()
        dem[int(pk)][day] += int(math.floor(float(q) * 100 + 0.5))
    epoch = _dt.date(1970, 1, 1)
    want = {}
    for pk, byday in dem.items():
        seq = sorted(byday.items())
        z = p = None
        prev_ed = None
        for i, (day, q) in enumerate(seq, start=1):
            ed = (day - epoch).days
            if i == 1:
                z, p = q, 1000
            else:
                z = math.floor((q + z) / 2.0)
                p = math.floor(((ed - prev_ed) * 1000 + p) / 2.0)
            prev_ed = ed
        rate = math.floor(float(z * 1000) / float(p))
        want[pk] = (len(seq), z, p, rate)

    got = {
        r["l_partkey"]: (
            r["n_demands"],
            r["z_c"],
            r["p_milli"],
            r["rate_qc_per_day"],
        )
        for r in QUERIES["croston_demand_forecast"](spark, SF).collect()
    }
    assert got == want and got


def test_burst_viterbi_matches_pure_python(spark):
    """Third derivation of the burst row: plain-Python two-state
    Viterbi (forward min-plus loop + explicit backtrack over parent
    pointers) over the daily counts — every (day, x, margin, c0, c1,
    in_burst) bit-for-bit, and the labels must form the optimal state
    sequence of the defined automaton."""
    from collections import Counter

    from log_analysis_system_spark.queries.temporal import (
        BURST_GAMMA_MICRO,
        BURST_S_LN_MICRO,
    )

    e = pd.read_parquet(f"{SF}/events.parquet")[["ts"]]
    days = Counter(pd.Timestamp(t).date() for t in e["ts"])
    seq = sorted(days.items())
    D, T = len(seq), sum(days.values())
    base = math.floor(float(T * 50000) / float(D))
    d1s = [base - x * BURST_S_LN_MICRO for _, x in seq]
    G = BURST_GAMMA_MICRO
    c0, c1 = 0, G + d1s[0]
    trace = [(c0, c1, 0, 0)]
    for d1 in d1s[1:]:
        p0 = 0 if c0 <= c1 else 1
        p1 = 0 if c0 + G <= c1 else 1
        n0 = min(c0, c1)
        n1 = min(c0 + G, c1) + d1
        trace.append((n0, n1, p0, p1))
        c0, c1 = n0, n1
    st = 1 if c1 < c0 else 0
    labels = [0] * D
    labels[D - 1] = st
    for t in range(D - 1, 0, -1):
        st = trace[t][3] if st == 1 else trace[t][2]
        labels[t - 1] = st
    want = {
        seq[t][0]: (seq[t][1], d1s[t], trace[t][0], trace[t][1], labels[t])
        for t in range(D)
    }
    got = {
        r["day"]: (
            r["x"],
            r["burst_margin_micro"],
            r["c0"],
            r["c1"],
            r["in_burst"],
        )
        for r in QUERIES["burst_detection_days"](spark, SF).collect()
    }
    assert got == want and len(got) == 30
