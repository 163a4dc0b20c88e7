"""Round-8 statistical-estimation operators pinned against independent
pure-Python models (pandas/numpy over the same parquet), plus the
structural invariants each estimator must satisfy. The DuckDB oracles are
checked by driver_sim/CORRECTNESS; these tests are the SECOND independent
witness, per the discriminator/cartography precedent."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd
import pytest

from log_analysis_system_spark.queries import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _pd(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


# ------------------------------------------------------------------
# survival_churn_hazard
# ------------------------------------------------------------------


def _py_durations() -> list[tuple[int, int]]:
    """(t_days, event) durations from the orders table, pure pandas."""
    o = _pd("orders")
    day = pd.Series(
        o["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
    )
    df = pd.DataFrame(
        {"cust": o["o_custkey"], "day": day, "key": o["o_orderkey"]}
    ).sort_values(["cust", "day", "key"])
    gmax = int(day.max())
    out = []
    for _, grp in df.groupby("cust", sort=False):
        days = grp["day"].tolist()
        for a, b in zip(days, days[1:]):
            out.append((b - a, 1))
        out.append((gmax - days[-1], 0))
    return out


def test_survival_matches_pure_python_nelson_aalen(spark):
    rows = {
        r["t_days"]: r
        for r in QUERIES["survival_churn_hazard"](spark, SF_DIR).collect()
    }
    durs = _py_durations()
    hist_d = collections.Counter(t for t, e in durs if e == 1)
    hist_c = collections.Counter(t for t, e in durs if e == 0)
    ts = sorted(set(hist_d) | set(hist_c))
    assert set(rows) == set(ts)
    n_risk = len(durs)
    cumhaz = 0
    for t in ts:
        d, c = hist_d.get(t, 0), hist_c.get(t, 0)
        hz = d * 1_000_000 // n_risk
        cumhaz += hz
        r = rows[t]
        assert (r["n_risk"], r["d_events"], r["c_censored"]) == (n_risk, d, c)
        assert (r["hazard_ppm"], r["cumhaz_ppm"]) == (hz, cumhaz)
        n_risk -= d + c
    assert n_risk == 0  # risk set fully consumed == no duration lost


# ------------------------------------------------------------------
# seasonal_decompose_daily
# ------------------------------------------------------------------


def test_seasonal_decomposition_identity_and_calendar(spark):
    rows = QUERIES["seasonal_decompose_daily"](spark, SF_DIR).collect()
    by_day = sorted(rows, key=lambda r: r["day"])
    # dense calendar: consecutive days, no gaps
    days = [r["day"] for r in by_day]
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "calendar not dense"
    # additive identity on interior rows: y*1000 = trend + seasonal + resid
    interior = [r for r in by_day if r["trend_milli"] is not None]
    assert len(interior) == len(by_day) - 6  # 3 edge rows each side
    for r in interior:
        assert (
            r["trend_milli"] + r["seasonal_milli"] + r["resid_milli"]
            == r["y"] * 1000
        )
    # trend is the exact centered 7-day MA
    y = [r["y"] for r in by_day]
    for i, r in enumerate(by_day):
        if r["trend_milli"] is not None:
            assert r["trend_milli"] == sum(y[i - 3 : i + 4]) * 1000 // 7


# ------------------------------------------------------------------
# conformal_forecast_interval
# ------------------------------------------------------------------


def test_conformal_interval_structure(spark):
    rows = QUERIES["conformal_forecast_interval"](spark, SF_DIR).collect()
    assert rows, "no eval months"
    widths = {r["hi_c"] - r["lo_c"] for r in rows}
    assert len(widths) == 1  # split conformal: ONE q, constant width
    (width,) = widths
    assert width >= 0 and width % 2 == 0  # 2 * q_c
    for r in rows:
        assert r["lo_c"] == r["forecast_c"] - width // 2
        assert r["hi_c"] == r["forecast_c"] + width // 2
        assert r["covered"] == int(r["lo_c"] <= r["revenue_c"] <= r["hi_c"])


def test_conformal_quantile_matches_pure_python(spark):
    """Recompute q from the Holt forecaster's own output (the composition
    contract: conformal's pred CTE == holt_forecast_revenue's series)."""
    holt = QUERIES["holt_forecast_revenue"](spark, SF_DIR).collect()
    s = sorted(holt, key=lambda r: r["mon"])
    preds = [
        (b["mon"], b["revenue_c"], a["forecast_next_c"])
        for a, b in zip(s, s[1:])
    ]
    n_cal = math.floor(len(s) * 0.6)
    resid = sorted(
        abs(y - yhat) for mon, y, yhat in preds[: n_cal - 1]
    )  # months t=2..n_cal
    k = min(len(resid), math.ceil(0.9 * (len(resid) + 1)))
    q = resid[k - 1]
    rows = QUERIES["conformal_forecast_interval"](spark, SF_DIR).collect()
    assert all(r["hi_c"] - r["forecast_c"] == q for r in rows)
    # eval set = months strictly after the calibration split
    assert {r["mon"] for r in rows} == {m for m, _, _ in preds[n_cal - 1 :]}


# ------------------------------------------------------------------
# grouped_ols_two_factor
# ------------------------------------------------------------------


def test_grouped_ols_matches_numpy_lstsq(spark):
    rows = QUERIES["grouped_ols_two_factor"](spark, SF_DIR).collect()
    li = _pd("lineitem")
    li["x1"] = li["l_quantity"].round().astype("int64")
    li["x2"] = (li["l_discount"] * 100).round().astype("int64")
    li["y"] = (li["l_extendedprice"] * 100).round().astype("int64")
    for r in rows:
        g = li[li["l_returnflag"] == r["grp"]]
        X = np.column_stack(
            [np.ones(len(g)), g["x1"].to_numpy(), g["x2"].to_numpy()]
        ).astype(float)
        beta, *_ = np.linalg.lstsq(X, g["y"].to_numpy().astype(float), rcond=None)
        assert r["n"] == len(g)
        assert r["beta_qty_c"] == pytest.approx(beta[1], rel=1e-6, abs=1e-4)
        assert r["beta_disc_c"] == pytest.approx(beta[2], rel=1e-6, abs=1e-4)


# ------------------------------------------------------------------
# winsorized_price_stats
# ------------------------------------------------------------------


def test_winsorized_matches_sorted_array_model(spark):
    rows = QUERIES["winsorized_price_stats"](spark, SF_DIR).collect()
    li = _pd("lineitem")
    li["v"] = (li["l_extendedprice"] * 100).round().astype("int64")
    for r in rows:
        vs = np.sort(li[li["l_returnflag"] == r["grp"]]["v"].to_numpy())
        n = len(vs)
        k_lo = (n - 1) * 5 // 100 + 1
        k_hi = (n - 1) * 95 // 100 + 1
        p05, p95 = int(vs[k_lo - 1]), int(vs[k_hi - 1])
        assert (r["n"], r["p05_c"], r["p95_c"]) == (n, p05, p95)
        assert r["winsor_mean_c"] == int(np.clip(vs, p05, p95).sum()) // n
        trim = vs[k_lo - 1 : k_hi]  # ranks k_lo..k_hi inclusive
        assert r["trim_mean_c"] == int(trim.sum()) // len(trim)


# ------------------------------------------------------------------
# bootstrap_revenue_ci
# ------------------------------------------------------------------


def test_bootstrap_weights_and_interval_sanity(spark):
    (row,) = QUERIES["bootstrap_revenue_ci"](spark, SF_DIR).collect()
    o = _pd("orders")
    point = int((o["o_totalprice"] * 100).round().astype("int64").sum())
    assert row["b"] == 40
    assert row["point_total_c"] == point
    assert row["boot_lo_c"] <= row["boot_mean_c"] <= row["boot_hi_c"]
    # Poisson(1) weights: replica totals are unbiased for the point total,
    # so the bootstrap mean sits within a few relative sd of it
    # (sd/total ~ 1/sqrt(n_orders x B) for the mean of replica means).
    assert abs(row["boot_mean_c"] - point) / point < 0.05
    # and the 90%-ish interval spans the point estimate
    assert row["boot_lo_c"] < point < row["boot_hi_c"]


# ------------------------------------------------------------------
# sorted_neighborhood_dedup
# ------------------------------------------------------------------


def test_sorted_neighborhood_pairs_are_verified_exact(spark):
    """Every SNM pair must reproduce the EXACT Jaccard the uncapped
    inverted-index tier computes for the same pair — the verify kernel is
    shared, SNM only changes candidate generation (and so its output is a
    subset of the exact tier's)."""
    snm = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["sorted_neighborhood_dedup"](spark, SF_DIR).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    assert snm, "SNM found no pairs at sf0.001 (fixture has planted dups)"
    assert set(snm) <= set(exact)
    for pair, j in snm.items():
        assert j == exact[pair]


# ------------------------------------------------------------------
# sprt_conversion_monitor
# ------------------------------------------------------------------


def test_sprt_matches_pure_python_llr(spark):
    from log_analysis_system_spark.queries.stats_models import (
        SPRT_A,
        SPRT_L0,
        SPRT_L1,
    )

    rows = sorted(
        QUERIES["sprt_conversion_monitor"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    ev = _pd("events")
    day = pd.Series(ev["ts"].to_numpy().astype("datetime64[D]"))
    s_by = day[ev["event_type"] == "purchase"].value_counts()
    n_by = day.value_counts()
    cum = 0
    for r in rows:
        d = np.datetime64(r["day"], "D")
        s, n = int(s_by.get(d, 0)), int(n_by.get(d, 0))
        llr = s * SPRT_L1 + (n - s) * SPRT_L0
        cum += llr
        assert (r["s"], r["n"], r["llr_micro"], r["cum_llr_micro"]) == (
            s, n, llr, cum,
        )
        expected = (
            "accept_h1" if cum >= SPRT_A
            else "accept_h0" if cum <= -SPRT_A
            else "continue"
        )
        assert r["verdict"] == expected


# ------------------------------------------------------------------
# diff_in_diff_lift
# ------------------------------------------------------------------


def test_did_contrast_is_cell_mean_identity(spark):
    (r,) = QUERIES["diff_in_diff_lift"](spark, SF_DIR).collect()
    assert r["did_millicents"] == (r["m11_milli"] - r["m10_milli"]) - (
        r["m01_milli"] - r["m00_milli"]
    )
    ev = _pd("events")
    assert r["n00"] + r["n01"] + r["n10"] + r["n11"] == len(ev)


# ------------------------------------------------------------------
# zipf_law_fit
# ------------------------------------------------------------------


def test_zipf_exponent_matches_numpy_fit(spark):
    (r,) = QUERIES["zipf_law_fit"](spark, SF_DIR).collect()
    docs = _pd("documents")
    tf = collections.Counter(
        w for t in docs["text"] for w in t.split(" ")
    )
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:512]
    x = np.array(
        [math.floor(math.log(i + 1) * 1e6) for i in range(len(top))],
        dtype=np.int64,
    )
    y = np.array(
        [math.floor(math.log(f) * 1e6) for _, f in top], dtype=np.int64
    )
    n = len(top)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert r["n_terms"] == n
    assert r["zipf_exponent"] == pytest.approx(slope, abs=1e-8)
    # the synthetic corpus is flatter than natural text (~-1); the fit
    # just has to slope downward
    assert r["zipf_exponent"] < 0


# ------------------------------------------------------------------
# xmr_control_chart
# ------------------------------------------------------------------


def test_xmr_limits_match_pure_python(spark):
    rows = sorted(
        QUERIES["xmr_control_chart"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    y = [r["y"] for r in rows]
    mrs = [abs(b - a) for a, b in zip(y, y[1:])]
    ybar = sum(y) * 1000 // len(y)
    mrbar = sum(mrs) * 1000 // (len(y) - 1)
    lcl = ybar - 266 * mrbar // 100
    ucl = ybar + 266 * mrbar // 100
    assert rows[0]["mr"] is None
    for i, r in enumerate(rows):
        assert (r["lcl_milli"], r["ucl_milli"]) == (lcl, ucl)
        if i:
            assert r["mr"] == mrs[i - 1]
        assert r["out_of_control"] == int(
            r["y"] * 1000 < lcl or r["y"] * 1000 > ucl
        )


# ------------------------------------------------------------------
# trend_stats: theil_sen / mann_kendall / acf (shared daily spine)
# ------------------------------------------------------------------


def _py_daily_revenue() -> list[int]:
    """Zero-filled dense daily revenue series (cents), pure pandas."""
    o = _pd("orders")
    day = pd.Series(
        o["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
    )
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    by_day = cents.groupby(day).sum()
    lo, hi = int(day.min()), int(day.max())
    return [int(by_day.get(d, 0)) for d in range(lo, hi + 1)]


def _trunc_div(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


def test_theil_sen_matches_pure_python(spark):
    (r,) = QUERIES["theil_sen_trend"](spark, SF_DIR).collect()
    y = _py_daily_revenue()
    n = len(y)
    slopes = [
        _trunc_div((y[j] - y[i]) * 1_000_000, j - i)
        for i in range(n)
        for j in range(i + 1, n)
    ]
    slopes.sort()
    assert r["n_days"] == n
    assert r["n_pairs"] == len(slopes)
    assert r["theil_sen_slope_ppm"] == slopes[(len(slopes) - 1) // 2]


def test_mann_kendall_matches_pure_python(spark):
    (r,) = QUERIES["mann_kendall_trend"](spark, SF_DIR).collect()
    y = np.array(_py_daily_revenue(), dtype=np.int64)
    n = len(y)
    diff_sign = np.sign(y[None, :] - y[:, None])
    s = int(np.triu(diff_sign, k=1).sum())
    ties = collections.Counter(y.tolist())
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    s_corr = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = s_corr / math.sqrt(var18 / 18.0)
    assert (r["n_days"], r["s_stat"], r["var_s_x18"]) == (n, s, var18)
    assert r["z_score"] == pytest.approx(z, abs=1e-9)
    expected = (
        "no_trend"
        if abs(z) <= 1.959963985
        else "increasing" if s > 0 else "decreasing"
    )
    assert r["verdict"] == expected


def test_acf_matches_pure_python(spark):
    rows = {
        r["lag"]: r
        for r in QUERIES["acf_daily_revenue"](spark, SF_DIR).collect()
    }
    cents = np.array(_py_daily_revenue(), dtype=np.int64)
    dollars = cents // 100
    mu = int(dollars.sum()) // len(dollars)
    y = dollars - mu
    assert set(rows) == set(range(1, 15))
    for lag, r in rows.items():
        a, b = y[:-lag].astype(float), y[lag:].astype(float)
        n = len(a)
        num = n * (a * b).sum() - a.sum() * b.sum()
        den = math.sqrt(
            (n * (a * a).sum() - a.sum() ** 2)
            * (n * (b * b).sum() - b.sum() ** 2)
        )
        assert r["n_pairs"] == n
        assert r["acf"] == pytest.approx(num / den, abs=1e-6)


# ------------------------------------------------------------------
# isotonic_calibration
# ------------------------------------------------------------------


def test_isotonic_matches_pure_python_pav(spark):
    """The minimax-join formulation must equal the classic sequential
    pool-adjacent-violators sweep (stack-based, exact rational pooling)
    on the same buckets, and the fit must be monotone non-decreasing."""
    from log_analysis_system_spark.queries.model_eval import (
        ISO_BUCKET_CAP,
        ISO_BUCKET_W,
    )

    docs = _pd("documents")
    toks = docs["text"].str.split(" ").str.len()
    alpha = docs["text"].str.replace(" ", "", regex=False).str.len()
    ok = (toks >= 40) & (alpha >= 3 * toks) & (alpha <= 8 * toks)
    bucket = np.minimum(toks, ISO_BUCKET_CAP) // ISO_BUCKET_W
    g = (
        pd.DataFrame({"bucket": bucket, "ok": ok.astype(int)})
        .groupby("bucket")
        .agg(n_docs=("ok", "size"), pass_n=("ok", "sum"))
        .sort_index()
    )
    # classic PAV: pool adjacent blocks while means decrease; compare
    # means by cross-multiplication so pooling is exact
    blocks = [
        [int(p), int(n)] for p, n in zip(g["pass_n"], g["n_docs"])
    ]
    stack: list[list[int]] = []
    for b in blocks:
        stack.append(list(b))
        while (
            len(stack) > 1
            and stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]
        ):
            p2, n2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
    # expand: walk blocks again tracking how many buckets each absorbed
    expanded = []
    i = 0
    for p, n in stack:
        acc_p, acc_n, cnt = 0, 0, 0
        while acc_p != p or acc_n != n:
            acc_p += blocks[i + cnt][0]
            acc_n += blocks[i + cnt][1]
            cnt += 1
        expanded.extend([p / n] * cnt)
        i += cnt
    got = {
        r["bucket"]: r["iso_rate"]
        for r in QUERIES["isotonic_calibration"](spark, SF_DIR).collect()
    }
    assert len(got) == len(g)
    iso_sorted = [got[b] for b in g.index]
    assert all(
        iso_sorted[i] <= iso_sorted[i + 1] + 1e-12
        for i in range(len(iso_sorted) - 1)
    ), "isotonic fit is not monotone"
    for b, want in zip(g.index, expanded):
        assert abs(got[b] - round(want, 6)) <= 1e-6, (
            b, got[b], want,
        )
