"""Nonparametric / time-series trend statistics over the daily revenue
series — round-8 third wave of the statistical-estimation family
(`stats_models.py`): Theil-Sen robust slope, the Mann-Kendall trend test,
and the autocorrelation function. All three share the same scale shape:
the orders fact table collapses to the zero-filled per-DAY calendar series
in one hash-agg (the MASE densify argument), and every pairwise construct
after that is over the CALENDAR-BOUNDED day table — C(days,2) pairs is a
function of the time span, not the corpus size, so a pairwise join that
would be a scale-killer on data rows is a bounded, documented cost here
(3 650 days = 6.7M pairs; the corpus could be 100 TB and this table does
not grow).

Determinism: slopes are sign-split truncation divisions on exact bigint
cents (Spark `div` / DuckDB emulation, the CUPED idiom); Mann-Kendall's S
and 18*Var(S) are exact integers; the only doubles are the final z-score
and Pearson r, computed from exact bigint sums in the same operation
order on both engines (sqrt is IEEE-correctly-rounded everywhere, unlike
ln — no boundary audit needed, see tests/test_micro_nat_boundary.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import register_views
from . import query

# the shared densified per-DAY revenue spine, one text per engine dialect
_DAILY_CTE_DUCK = """
observed AS (
    SELECT o_orderdate AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
    FROM orders GROUP BY 1
),
bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM observed),
cal AS (SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))
               AS DATE) AS day FROM bounds),
daily AS (
    SELECT epoch_us(CAST(c.day AS TIMESTAMP)) // 86400000000 AS d,
           CAST(coalesce(o.y, 0) AS BIGINT) AS y
    FROM cal c LEFT JOIN observed o ON o.day = CAST(c.day AS TIMESTAMP)
)
"""

_SS = "CASE WHEN {a} >= 0 THEN ({a}) // ({b}) ELSE -((-({a})) // ({b})) END"


def _daily_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of _DAILY_CTE_DUCK: densified (epoch-day, cents) rows."""
    register_views(spark, sf_dir)
    observed = spark.sql(
        "SELECT cast(o_orderdate AS DATE) AS day, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS y FROM orders GROUP BY 1"
    )
    cal = observed.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    ).select(F.explode(F.sequence("dmin", "dmax")).alias("day"))
    return cal.join(observed, "day", "left").select(
        F.expr(
            "unix_micros(cast(day as timestamp_ltz)) div 86400000000"
        ).alias("d"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )


# ------------------------------------------------------------------
# theil_sen_trend — robust median-of-pairwise-slopes
# ------------------------------------------------------------------

_TS_ORACLE = f"""
WITH {_DAILY_CTE_DUCK},
pairs AS (
    SELECT {_SS.format(a="(b.y - a.y) * 1000000", b="b.d - a.d")}
        AS slope_ppm
    FROM daily a JOIN daily b ON b.d > a.d
),
ranked AS (
    SELECT slope_ppm,
           row_number() OVER (ORDER BY slope_ppm) AS rk,
           count(*) OVER () AS np
    FROM pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       CAST(max(np) AS BIGINT) AS n_pairs,
       CAST(max(slope_ppm) AS BIGINT) AS theil_sen_slope_ppm
FROM ranked WHERE rk = (np - 1) // 2 + 1
"""


@query("theil_sen_trend", oracle=_TS_ORACLE)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the daily-revenue trend: the exact LOWER
    MEDIAN of all C(days,2) pairwise slopes — the robust-regression op
    class (`trend_fit_events`' least-squares slope moves arbitrarily far
    under one corrupted day; Theil-Sen has a 29% breakdown point).
    Slopes are integer ppm/day with the sign-split truncation-division
    idiom (slopes go negative); the median is an exact rank-based order
    statistic, so both engines agree bit-for-bit.

    The pairwise self-join is over the CALENDAR-BOUNDED day series
    (module docstring), and the median comes from the distributed
    `global_rank` operator (range-partition + per-partition ordinal +
    O(parallelism) offset join) — no single-partition sort window even
    over the pair table. Rank ties share a slope VALUE, so the k-th
    value is placement-independent."""
    from ..operators.sampling import global_rank

    daily = _daily_spark(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        F.expr(
            "CASE WHEN (yb - ya) * 1000000 >= 0 "
            "THEN (yb - ya) * 1000000 div (db - da) "
            "ELSE -((-((yb - ya) * 1000000)) div (db - da)) END"
        ).alias("slope_ppm")
    )
    np_df = pairs.agg(F.count(F.lit(1)).cast("long").alias("np"))
    ranked = global_rank(pairs, [F.col("slope_ppm")], rank_col="rk0")
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    med = (
        ranked.crossJoin(F.broadcast(np_df))
        .where(F.expr("rk0 = (np - 1) div 2"))
        .agg(
            F.max("np").cast("long").alias("n_pairs"),
            F.max("slope_ppm").cast("long").alias("theil_sen_slope_ppm"),
        )
    )
    return n_days.crossJoin(F.broadcast(med)).select(
        "n_days", "n_pairs", "theil_sen_slope_ppm"
    )


# ------------------------------------------------------------------
# mann_kendall_trend — nonparametric monotone-trend test
# ------------------------------------------------------------------

_MK_ORACLE = f"""
WITH {_DAILY_CTE_DUCK},
s AS (
    SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
        AS s_stat
    FROM daily a JOIN daily b ON b.d > a.d
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
ties AS (
    SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        AS tie_term
    FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y) g
    WHERE t > 1
)
SELECT n.n AS n_days, s.s_stat,
       n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS var_s_x18,
       CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term > 0
            THEN round((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                             WHEN s.s_stat < 0 THEN s.s_stat + 1
                             ELSE 0 END)
                 / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term)
                        / 18.0), 9)
       END AS z_score,
       CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term <= 0
            THEN NULL
            WHEN abs((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                           WHEN s.s_stat < 0 THEN s.s_stat + 1
                           ELSE 0 END)
                 / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term)
                        / 18.0)) <= 1.959963985
            THEN 'no_trend'
            WHEN s.s_stat > 0 THEN 'increasing' ELSE 'decreasing'
       END AS verdict
FROM s, n, ties
"""


@query("mann_kendall_trend", oracle=_MK_ORACLE)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on daily revenue — the
    distribution-free hypothesis-test complement to `theil_sen_trend`'s
    point estimate: S = sum of sign(y_j - y_i) over ordered day pairs,
    with the exact tie-corrected variance 18*Var(S) = n(n-1)(2n+5) -
    sum_g t_g(t_g-1)(2t_g+5) kept as a bigint. The continuity-corrected
    z = (S -/+ 1)/sqrt(Var) is the one double (sqrt is IEEE-exact);
    verdict at the two-sided 5% level.

    Pure aggregates — the pairwise join needs NO window at all, and the
    tie histogram is a second bounded aggregate over the same day
    table."""
    daily = _daily_spark(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    s = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
        ).cast("long").alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).cast("long").alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    var18 = F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col(
        "tie_term"
    )
    s_corr = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    # var18 > 0 guard: a degenerate series (empty input, or every day
    # tied) zeroes the variance and ANSI Spark raises on the 0/0 double
    # division — both engines emit NULL z/verdict there instead.
    z = s_corr / F.sqrt(var18 / F.lit(18.0))
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        var18.alias("var_s_x18"),
        F.when(var18 > 0, F.round(z, 9)).alias("z_score"),
        F.when(var18 <= 0, F.lit(None).cast("string"))
        .when(F.abs(z) <= 1.959963985, "no_trend")
        .when(F.col("s_stat") > 0, "increasing")
        .otherwise("decreasing")
        .alias("verdict"),
    )


# ------------------------------------------------------------------
# acf_daily_revenue — autocorrelation function, lags 1..14
# ------------------------------------------------------------------

ACF_MAX_LAG = 14

_ACF_ORACLE = f"""
WITH {_DAILY_CTE_DUCK},
mu AS (
    SELECT CAST(sum(y // 100) // count(*) AS BIGINT) AS mu FROM daily
),
dm AS (
    SELECT d, y // 100 - (SELECT mu FROM mu) AS y FROM daily
),
lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
pairs AS (
    SELECT l.lag, a.y AS x, b.y AS y2
    FROM lags l
    JOIN dm a ON TRUE
    JOIN dm b ON b.d = a.d + l.lag
),
s AS (
    SELECT lag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
           CAST(sum(x * y2) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y2 * y2) AS BIGINT) AS syy
    FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
           AS acf
FROM s
"""


@query("acf_daily_revenue", oracle=_ACF_ORACLE)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..{L} — the
    time-series DIAGNOSTIC class (is there weekly structure worth a
    seasonal model? is yesterday predictive?) that motivates the
    forecasting family's lag choices (`forecast_backtest_mase`'s snaive7
    presumes the lag-7 peak this measures). Pearson r per lag from five
    exact bigint sums over the lag-offset equi-join of the densified day
    series with itself (never an inequality join); the division and the
    IEEE-exact sqrt happen once per lag at the output edge.

    One hash-agg to days, one bounded 14-way lag explode + equi-join,
    one grouped aggregate — no windows at all. Overflow bound: the
    series is demeaned by its exact integer DOLLAR mean before the
    second moments (Pearson is shift-invariant, and the sums stay exact
    bigints), so sum(y'^2) is variance-scale, not magnitude-scale —
    raw daily cents squared overflow int64 already at sf0.01."""
    daily0 = _daily_spark(spark, sf_dir).localCheckpoint(eager=False)
    mu = daily0.agg(
        F.expr("CAST(sum(y div 100) div count(*) AS BIGINT)").alias("mu")
    )
    daily = daily0.crossJoin(F.broadcast(mu)).select(
        "d", (F.expr("y div 100") - F.col("mu")).cast("long").alias("y")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("y2"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y2").alias("sy"),
        F.sum(F.col("x") * F.col("y2")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).alias("syy"),
    )
    n_d, sx_d, sy_d, sxy_d, sxx_d, syy_d = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(
            (n_d * sxy_d - sx_d * sy_d)
            / F.sqrt(
                (n_d * sxx_d - sx_d * sx_d) * (n_d * syy_d - sy_d * sy_d)
            ),
            9,
        ).alias("acf"),
    )


q_acf_daily_revenue.__doc__ = q_acf_daily_revenue.__doc__.format(
    L=ACF_MAX_LAG
)
