"""OLAP breadth beyond the reference: as-of join, rollup/grouping sets,
exact+approximate distinct counts, pivot, skew-safe salted aggregation.
Every op carries a DuckDB oracle; the approximate distinct emits a
within-tolerance verdict the oracle asserts (engines use different
sketches, so the raw estimate itself is not comparable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us
from ..operators.asof import asof_join
from ..sources.catalog import read_events
from . import query


@query(
    "asof_join_orders",
    oracle="""
WITH dedup_orders AS (
    SELECT o_custkey, o_orderdate,
           max_by(o_orderkey, o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY o_custkey, o_orderdate
),
probes AS (SELECT event_id, user_id, ts FROM events)
SELECT p.event_id, p.user_id, p.ts,
       o.o_orderkey AS asof_o_orderkey,
       o.o_totalprice AS asof_o_totalprice
FROM probes p
ASOF LEFT JOIN dedup_orders o
  ON p.user_id = o.o_custkey AND p.ts >= o.o_orderdate
""",
)
def q_asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order at or
    before the event time. Spark has no native ASOF — the union-timeline
    window operator provides it in one shuffle; DuckDB's native ASOF JOIN is
    the oracle. Orders are deduped to one per (customer, date) so the match
    is well-defined in both engines."""
    ev = read_events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_orderkey", "o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )


@query(
    "rollup_lineitem",
    oracle="""
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       count(*) AS cnt,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / ROLLUP (absent from the reference — §2.4 notes the
    gap): subtotals per flag, per (flag,status), and grand total in one pass
    (Spark expands to a single Expand + aggregate, not N scans)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")) / 100.0).alias(
                "sum_qty"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


@query(
    "distinct_users",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS events
FROM events GROUP BY event_type
""",
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (A6 family). Spark plans count(DISTINCT) as
    a two-phase expand+agg — no driver-side dedup."""
    return (
        read_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("events"),
        )
    )


@query(
    "sketch_rollup_users",
    oracle="""
SELECT event_type,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS merged_within_tol
FROM events GROUP BY event_type
""",
)
def q_sketch_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch serving: per-(event_type, day) Apache DataSketches
    HLL sketches (``hll_sketch_agg``) unioned across days
    (``hll_union_agg``) into a whole-window distinct estimate — the
    incremental-rollup pattern ``hypertable_rollup`` applies to sums,
    extended to the non-additive distinct-count aggregate. At 100 TB the
    daily sketch table is the persisted rollup (O(days x types x 4 KiB));
    serving any date range is a union over already-built sketches, never a
    rescan of raw data.

    Like approx_distinct_users, the sketch estimate itself is not
    engine-comparable, so the query emits a tolerance VERDICT: the merged
    estimate must land within 10% of the exact distinct count (default
    lgConfigK=12 gives ~1.6% RSE; 10% is >5 sigma, catching only broken
    merges). The exact twin column pins correctness of everything else.
    """
    ev = read_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("date_key"),
    )
    daily = ev.groupBy("event_type", "date_key").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.1 * F.col("exact_users")
        ).alias("merged_within_tol"),
    )


@query(
    "approx_distinct_users",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS events,
       TRUE AS approx_within_tol
FROM events GROUP BY event_type
""",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory scale path
    for distinct counting. Spark's HLL++ and DuckDB's HLL produce different
    estimates by construction, so the sketch value itself cannot be
    hash-compared; instead the query emits a TOLERANCE VERDICT — the HLL++
    estimate must land within 5x the configured rsd of the exact count —
    and the oracle asserts that verdict holds. rsd is a standard DEVIATION,
    not a bound: at 2x rsd ~5% of groups legitimately fall outside (a gate
    row that is flaky by construction); 5 sigma puts the false-failure
    probability per group below 1e-6 while still catching a broken sketch
    (which is off by orders of magnitude, not sigmas). The exact twin
    `distinct_users` pins exact-count correctness."""
    rsd = 0.02
    return (
        read_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("events"),
        )
        .select(
            "event_type",
            "exact_users",
            "events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 5 * rsd * F.col("exact_users")
            ).alias("approx_within_tol"),
        )
    )


@query(
    "pivot_event_matrix",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS date_key,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY 1
""",
)
def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: day x event-type count matrix. Explicit value list keeps the
    plan a single pass (no distinct-values pre-query) — mandatory at scale."""
    return (
        read_events(spark, sf_dir)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date_key"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT n_name, o_orderpriority,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
""",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-nation, per-priority, and grand-total revenue in ONE aggregation —
    Spark's Expand emits the three grouping shapes map-side, so one shuffle
    replaces three separate scans+aggs. GROUPING() flags disambiguate
    summary NULLs from data NULLs, matching the oracle bit-for-bit."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        )
        .createOrReplaceTempView("gs_rev_src")
    )
    return spark.sql(
        """
        SELECT n_name, o_orderpriority,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue,
               count(*) AS order_cnt
        FROM gs_rev_src
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


SUPPLIER_ACCTBAL_FLOOR = 3000.0


@query(
    "supplier_diversity",
    oracle=f"""
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS supplier_cnt,
       count(*) AS line_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {SUPPLIER_ACCTBAL_FLOOR}
)
GROUP BY p_brand, p_type
""",
)
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregation behind an anti-join
    exclusion list. The excluded-supplier set is dim-sized, so the anti-join
    broadcasts; count(DISTINCT) runs as Spark's two-phase partial-distinct
    expand, never a driver-side distinct."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    excluded = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_acctbal") < SUPPLIER_ACCTBAL_FLOOR)
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@query(
    "cube_revenue",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over lineitem: all 4 aggregation levels in one
    shuffle (Spark expands grouping sets map-side; no multi-pass union).
    Money summed as exact integer cents — float sums are order-dependent and
    can't be hash-compared across engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue_cents",
        )
    )


@query(
    "value_percentiles",
    oracle="""
WITH q AS (
    SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v FROM events
)
SELECT event_type,
       round(quantile_cont(v, 0.50), 4) AS p50,
       round(quantile_cont(v, 0.90), 4) AS p90,
       round(quantile_cont(v, 0.99), 4) AS p99,
       max(v) AS vmax
FROM q GROUP BY event_type
""",
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per event type.

    Values are quantized to integer milli-units first so both engines
    interpolate between identical exact operands (p*(n-1) positioning is the
    same formula in Spark `percentile` and DuckDB `quantile_cont`). For the
    100 TB path swap `percentile` for `approx_percentile` (t-digest sketch,
    mergeable map-side) — kept exact here because the oracle must match."""
    ev = read_events(spark, sf_dir)
    q = ev.select(
        "event_type", F.round(F.col("value") * 1000).cast("long").alias("v")
    )
    return q.groupBy("event_type").agg(
        F.round(F.expr("percentile(v, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(v, 0.90)"), 4).alias("p90"),
        F.round(F.expr("percentile(v, 0.99)"), 4).alias("p99"),
        F.max("v").alias("vmax"),
    )


@query(
    "rolling_range_frame",
    oracle="""
WITH base AS (
    SELECT event_id, user_id, epoch_us(ts) // 1000000 AS t_s,
           CAST(floor(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_id, user_id, t_s,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY t_s
                             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_1h_cents,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY t_s
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_1h_events
FROM base
""",
)
def q_rolling_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE window frames: per user, the trailing one-hour sum and
    count at every event — the rolling-metric shape (rate limiting, spend
    caps, burst detection) that ROWS frames cannot express because the
    frame is defined by the ORDER-BY VALUE distance, not a row count.
    Timestamp ties are handled by RANGE peer semantics identically on both
    engines (all peers join the frame), so no tiebreak column is needed —
    or allowed, since RANGE requires a single numeric ordering key.
    Integer epoch-seconds and cents keep every sum exact."""
    ev = read_events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        (epoch_us("ts") / F.lit(1_000_000)).cast("long").alias("t_s"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "t_s",
        F.sum("cents").over(w).alias("trailing_1h_cents"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@query(
    "analytic_functions",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       first_value(o_orderkey) OVER w AS first_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS seq,
       CAST(rank() OVER (PARTITION BY o_custkey
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC)
            AS BIGINT) AS price_rank,
       CAST(dense_rank() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderpriority) AS BIGINT) AS prio_dense,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER (PARTITION BY o_custkey
                                  ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)),
             6) AS price_pctrank,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface in one query: lag/lead/first_value,
    row_number/rank/dense_rank/ntile/percent_rank, and an explicit
    rows-between running sum — all per-customer (partitioned windows; the
    unpartitioned-window trap moves the world to one task and is banned
    here). The reference only ever uses row_number (W1-W3)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wprice = Window.partitionBy("o_custkey").orderBy(F.desc("price_cents"))
    wprice_asc = Window.partitionBy("o_custkey").orderBy("price_cents")
    wprio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "price_cents",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("first_orderkey"),
        F.row_number().over(w).cast("long").alias("seq"),
        F.rank().over(wprice).cast("long").alias("price_rank"),
        F.dense_rank().over(wprio).cast("long").alias("prio_dense"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(wprice_asc), 6).alias("price_pctrank"),
        F.sum("price_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_cents"),
    )


RANGE_JOIN_WINDOW_S = 300


@query(
    "range_join_events",
    oracle=f"""
SELECT a.event_id AS purchase_id, b.event_id AS error_id,
       (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS diff_s
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_JOIN_WINDOW_S} * 1000000
WHERE a.event_type = 'purchase' AND b.event_type = 'error'
""",
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: (purchase, error) event pairs of the same user within
    ±5 minutes — bucketed equi-join (operators/rangejoin.py), not the
    BroadcastNestedLoopJoin a raw range predicate compiles to. The oracle
    states the same join as a plain range predicate."""
    from ..operators.rangejoin import range_join

    ev = read_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    joined = range_join(
        purchases, errors, left_ts="p_ts", right_ts="e_ts",
        max_diff_s=RANGE_JOIN_WINDOW_S, keys=["user_id"],
    )
    return joined.select(
        "purchase_id",
        "error_id",
        # truncate-toward-zero to match DuckDB's integer `//` on negatives
        ((epoch_us("e_ts") - epoch_us("p_ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("diff_s"),
    )


HYPERTABLE_CUTOFF = "2024-01-25 00:00:00"


@query(
    "hypertable_rollup",
    oracle=f"""
SELECT date_trunc('hour', ts) AS bucket_ts,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
       min(CAST(round(value * 1000) AS BIGINT)) AS min_v_milli,
       max(CAST(round(value * 1000) AS BIGINT)) AS max_v_milli
FROM events
GROUP BY 1, 2
""",
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate serving path (operators/hypertable.py): hourly
    rollup of the materialized history MERGED with a rollup of the raw tail
    (events after the cutoff — the slice a production table wouldn't have
    rolled up yet). The oracle aggregates raw events directly: passing proves
    the partial-aggregate merge algebra is lossless, i.e. the rollup table
    can stand in for a 100 TB raw scan."""
    from ..operators.hypertable import merge_rollups, rollup_events

    ev = read_events(spark, sf_dir)
    cutoff = F.lit(HYPERTABLE_CUTOFF).cast("timestamp")
    history = ev.where(F.col("ts") < cutoff)
    tail = ev.where(F.col("ts") >= cutoff)
    return merge_rollups(
        rollup_events(history, "hour", ["event_type"]),
        rollup_events(tail, "hour", ["event_type"]),
    )


@query(
    "skew_safe_event_totals",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY event_type
""",
)
def q_skew_safe_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 with an official oracle row: two-stage salted aggregation over a
    LOW-cardinality key (5 event types over every event — the exact shape
    where one hot key floods a single reducer). The salt spreads each key
    over 10 partial groups; the final merge re-sums integers, so the result
    is bit-identical to a plain GROUP BY (the oracle) for any salt
    assignment — randomness never reaches the output. Under AQE this is
    usually unnecessary; it exists for single-hot-key aggregations that
    overwhelm even AQE's splitting."""
    from ..operators.aggregates import salted_aggregate

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)).cast("long"),
            "value_c": F.sum("value_c"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events"),
        (F.col("value_c") / 100.0).alias("total_value"),
    )


@query(
    "approx_value_percentiles",
    oracle="""
SELECT event_type, count(*) AS n_events,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM events GROUP BY event_type
""",
)
def q_approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with a RANK-ERROR verdict oracle (the sketch twin of
    `value_percentiles`, same contract style as the HLL and trained-IVF
    rows). Spark's ApproximatePercentile guarantees rank error <= n/accuracy;
    the sketch's merge order varies with partitioning, so the raw estimate
    is not hash-stable — but the guarantee is. For each percentile p the
    returned value's rank window [count(<v), count(<=v)] must overlap
    [p*n - n/acc - 1, p*n + n/acc + 1] (the +-1 absorbs ties and the
    element-selection convention). The verdict is TRUE under ANY partition
    layout iff the sketch honors its bound."""
    acc = 100
    ev = read_events(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 1000).cast("long").alias("v")
    )
    ap = (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(v, array(0.5D, 0.9D, 0.99D), {acc})"
            ).alias("aps"),
        )
        .select(
            "event_type",
            F.col("aps")[0].alias("a50"),
            F.col("aps")[1].alias("a90"),
            F.col("aps")[2].alias("a99"),
        )
    )
    joined = ev.join(F.broadcast(ap), "event_type")
    counted = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            agg
            for p in ("50", "90", "99")
            for agg in (
                F.sum(
                    F.when(F.col("v") < F.col(f"a{p}"), 1).otherwise(0)
                ).alias(f"lt{p}"),
                F.sum(
                    F.when(F.col("v") <= F.col(f"a{p}"), 1).otherwise(0)
                ).alias(f"le{p}"),
            )
        ],
    )

    def ok(p: float, tag: str):
        n = F.col("n_events")
        bound = n / acc + 1
        target = F.lit(p) * n
        return (
            (F.col(f"lt{tag}") <= target + bound)
            & (F.col(f"le{tag}") >= target - bound)
        ).alias(f"p{tag}_ok")

    return counted.select(
        "event_type", "n_events", ok(0.5, "50"), ok(0.9, "90"), ok(0.99, "99")
    )


FREQ_SUPPORT = 0.1


@query(
    "freq_items_verdict",
    oracle=f"""
WITH tot AS (SELECT count(*) AS n FROM events)
SELECT event_type,
       count(*) AS cnt,
       TRUE AS in_sketch
FROM events, tot
GROUP BY event_type, n
HAVING count(*) > {FREQ_SUPPORT} * any_value(n)
""",
)
def q_freq_items_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Karp-Papadimitriou-Shenker via
    ``DataFrame.stat.freqItems``) with the standard sketch-verdict
    protocol: the sketch guarantees a SUPERSET of every item above the
    support threshold, so the check emits each EXACT heavy hitter with a
    boolean confirming sketch membership — the deterministic property, while
    the sketch's extra false positives (partition-order dependent) never
    reach the output. Same protocol as approx_distinct_users /
    sketch_rollup_users: exact twin columns pin everything else.

    Scale shape: the sketch is one streaming pass with O(1/support)
    state per partition; the exact side is one hash aggregate. Both touch
    the scan once.
    """
    ev = read_events(spark, sf_dir).select("event_type")
    n = ev.count()
    freq = set(
        ev.stat.freqItems(["event_type"], FREQ_SUPPORT).collect()[0][0]
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > FREQ_SUPPORT * n)
    )
    in_sketch = F.col("event_type").isin(*sorted(freq)) if freq else F.lit(False)
    return exact.select("event_type", "cnt", in_sketch.alias("in_sketch"))


# --------------------------------------------- chi-squared contingency

# chi2 cell term as one shared textual expression: observed and marginal
# counts are exact bigints; expected = (row_tot * col_tot) / n is ONE double
# division of exact integer products, and the (o - e)^2 / e term reuses it.
_CHI2_EXPR = (
    "round(pow(CAST(o AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / n, 2)"
    " / (CAST(row_tot * col_tot AS DOUBLE) / n), 6)"
)


@query(
    "chi2_contingency",
    oracle=f"""
WITH cells AS (
    SELECT event_type,
           CASE WHEN extract(hour FROM ts) < 6 THEN 'night'
                WHEN extract(hour FROM ts) < 12 THEN 'morning'
                WHEN extract(hour FROM ts) < 18 THEN 'afternoon'
                ELSE 'evening' END AS hour_band,
           CAST(count(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
margins AS (
    SELECT c.*, rt.row_tot, ct.col_tot, g.n
    FROM cells c
    JOIN (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_tot
          FROM cells GROUP BY 1) rt USING (event_type)
    JOIN (SELECT hour_band, CAST(sum(o) AS BIGINT) AS col_tot
          FROM cells GROUP BY 1) ct USING (hour_band)
    CROSS JOIN (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells) g
)
SELECT event_type, hour_band, o,
       {_CHI2_EXPR} AS chi2_term
FROM margins
""",
)
def q_chi2_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence audit of the event_type x hour-band
    contingency table — "does activity mix depend on time of day?", the
    statistical sibling of the PSI drift report. Per-CELL chi2 terms
    ((o - e)^2 / e with e from the exact integer marginals) are emitted,
    not the order-dependent float total; the reader sums them against the
    chi-square critical value for (r-1)(c-1) dof.

    Scale shape: one conditional-agg scan builds the |types| x 4 cell
    table; marginals are joins between BOUNDED aggregates of that table
    (never the fact table); the fact scan happens exactly once."""
    from ..sources.catalog import read_events

    ev = read_events(spark, sf_dir)
    band = (
        F.when(F.hour("ts") < 6, "night")
        .when(F.hour("ts") < 12, "morning")
        .when(F.hour("ts") < 18, "afternoon")
        .otherwise("evening")
    )
    cells = ev.groupBy(
        "event_type", band.alias("hour_band")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("hour_band").agg(F.sum("o").alias("col_tot"))
    g = cells.agg(F.sum("o").alias("n"))
    margins = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hour_band")
        .crossJoin(F.broadcast(g))
    )
    return margins.select(
        "event_type", "hour_band", "o", F.expr(_CHI2_EXPR).alias("chi2_term")
    )


# --------------------------------------------- time-decayed popularity

DECAY_ANCHOR = "2024-01-31"  # "now" for the decay clock (data ends Jan 30)
DECAY_TOP = 20


@query(
    "decayed_popularity",
    oracle=f"""
WITH w AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
           CAST(1000000 // (1 + date_diff('day', CAST(ts AS DATE),
                                          DATE '{DECAY_ANCHOR}'))
                AS BIGINT) AS w_ppm
    FROM events
    WHERE event_type = 'click'
),
scored AS (
    SELECT category_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(w_ppm) AS BIGINT) AS decayed_ppm
    FROM w GROUP BY 1
)
SELECT category_id, n_clicks, decayed_ppm
FROM scored
ORDER BY decayed_ppm DESC, category_id
LIMIT {DECAY_TOP}
""",
)
def q_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted popularity ranking: each click contributes
    1/(1 + age_days) — yesterday's click outweighs last month's — and
    categories rank by the decayed sum, the freshness-aware twin of
    `top10_category`'s all-time counts (trending vs popular). Weights are
    integer ppm (1000000 div (1+age)), so the decayed sums are exact under
    any partitioning; a float decay sum would be summation-order-
    dependent and unrankable deterministically.

    One scan -> per-category aggregate -> TakeOrderedAndProject top-k; the
    decay clock is a literal anchor date, so the whole weight expression
    folds into the scan projection."""
    from ..operators.topn import global_topn
    from ..sources.catalog import read_events

    ev = read_events(spark, sf_dir)
    w = ev.where(F.col("event_type") == "click").select(
        F.get_json_object("props", "$.k").cast("long").alias("category_id"),
        F.expr(
            f"CAST(1000000 div (1 + datediff(DATE '{DECAY_ANCHOR}', "
            f"CAST(ts AS DATE))) AS BIGINT)"
        ).alias("w_ppm"),
    )
    scored = w.groupBy("category_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum("w_ppm").alias("decayed_ppm"),
    )
    return global_topn(
        scored, [F.desc("decayed_ppm"), F.asc("category_id")], DECAY_TOP
    )


# ------------------------------------------ Wilson-bound CTR ranking

WILSON_Z2 = "3.8416"  # z^2 for 95% (z = 1.96) — exact decimal literal
WILSON_TOP = 20

# Wilson lower bound as ONE shared textual expression over exact integer
# (clicks, views): p folds to one double division; every subsequent double
# op appears in identical written order on both engines.
_WILSON_EXPR = (
    f"round(((CAST(clicks AS DOUBLE) / views) + {WILSON_Z2} / (2 * views)"
    f" - 1.96 * sqrt((CAST(clicks AS DOUBLE) / views)"
    f" * (1 - CAST(clicks AS DOUBLE) / views) / views"
    f" + {WILSON_Z2} / (4 * CAST(views AS DOUBLE) * views)))"
    f" / (1 + {WILSON_Z2} / views), 6)"
)


@query(
    "ctr_wilson_rank",
    oracle=f"""
WITH rates AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS clicks,
           CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0
                    END) AS BIGINT) AS views
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY 1
)
SELECT category_id, clicks, views,
       {_WILSON_EXPR} AS ctr_lb
FROM rates
WHERE views > 0
ORDER BY ctr_lb DESC, category_id
LIMIT {WILSON_TOP}
""",
)
def q_ctr_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-through-rate ranking by the Wilson-score LOWER bound — the
    standard fix for ranking rates with unequal sample sizes (a 3/3
    category must not outrank a 950/1000 one; the raw-CTR sort does
    exactly that). The bound expression is shared verbatim with the
    oracle: clicks/views are exact integers from one conditional
    aggregate, and every double operation runs in the same written order
    on both engines.

    One scan -> per-category conditional agg -> TakeOrderedAndProject; the
    statistics need no per-event state beyond the two counters, so the
    ranking is a pure two-phase aggregate at any scale."""
    from ..operators.topn import global_topn
    from ..sources.catalog import read_events

    ev = read_events(spark, sf_dir)
    rates = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.get_json_object("props", "$.k").cast("long").alias("category_id")
        )
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias(
                "clicks"
            ),
            F.count(F.lit(1)).alias("views"),
        )
        .where(F.col("views") > 0)
    )
    scored = rates.select(
        "category_id", "clicks", "views", F.expr(_WILSON_EXPR).alias("ctr_lb")
    )
    return global_topn(
        scored, [F.desc("ctr_lb"), F.asc("category_id")], WILSON_TOP
    )


# ------------------------------------------------ revenue concentration

@query(
    "revenue_gini",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT rev_c,
           CAST(row_number() OVER (ORDER BY rev_c, o_custkey) AS BIGINT)
               AS rnk
    FROM cust
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rev_c) AS BIGINT) AS tot,
           CAST(sum(rnk * rev_c) AS BIGINT) AS weighted
    FROM ranked
)
SELECT n AS n_customers, tot AS total_revenue_c,
       round(CAST(2 * weighted AS DOUBLE) / (CAST(n AS DOUBLE) * tot)
             - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
FROM s
""",
)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Gini) coefficient over per-customer revenue —
    the inequality metric behind "what share of revenue do the top
    customers hold" dashboards. Gini = 2*sum(rank_i * x_i)/(n*sum(x))
    - (n+1)/n with x ascending; ranks come from the range-partitioned
    `global_rank` (no single-partition sort), and rank*revenue products
    sum as exact bigints, so the only doubles are the two output-edge
    divisions, written in identical order in both engines.

    Scale note: sum(rank * x) reaches ~n^2 * avg(x) — at billions of
    customers the product needs a decimal accumulator; bigint holds
    comfortably through the test scales (documented overflow boundary,
    not a silent one: Spark ANSI mode raises on overflow)."""
    from ..operators.sampling import global_rank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_c"
        )
    )
    ranked = global_rank(
        cust, [F.asc("rev_c"), F.asc("o_custkey")], rank_col="rnk0"
    ).withColumn("rnk", F.col("rnk0") + 1)
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_c").alias("tot"),
        F.sum(F.col("rnk") * F.col("rev_c")).alias("weighted"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("tot").alias("total_revenue_c"),
        F.round(
            (2 * F.col("weighted")).cast("double")
            / (F.col("n").cast("double") * F.col("tot"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


# ------------------------------------------------ market-basket rules

BASKET_MIN_SUPPORT = 3   # pair must co-occur in >= 3 orders
BASKET_TOP = 20


@query(
    "copurchase_rules",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
part_n AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1),
orders_n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
pairs AS (
    SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
    FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
    HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, n_ab,
       CAST(n_ab * 1000000 // na.n AS BIGINT) AS confidence_ppm,
       CAST(n_ab * o.n_orders * 1000000 // (na.n * nb.n) AS BIGINT)
           AS lift_ppm
FROM pairs
JOIN part_n na ON na.pk = part_a
JOIN part_n nb ON nb.pk = part_b
CROSS JOIN orders_n o
ORDER BY lift_ppm DESC, part_a, part_b
LIMIT {BASKET_TOP}
""",
)
def q_copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts: for part
    pairs sharing >= {BASKET_MIN_SUPPORT} orders, emit support, confidence
    (P(b|a)) and lift (observed / independence-expected co-occurrence),
    ranked by lift — the order-basket twin of the document-side
    `term_lift`. Confidence/lift are integer ppm floor divisions of exact
    counts, so the ranking is bit-stable.

    Scale shape: the pair self-join keys on l_orderkey, so the quadratic
    term is bounded by the largest BASKET (~4 items here, bounded by
    business reality at any scale), never the catalog or the fact table;
    part marginals and the order total are bounded aggregates joined back
    by part key. Top-k compiles to the per-partition heap."""
    from ..operators.topn import global_topn

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    part_n = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    n_orders = items.agg(
        F.countDistinct("ok").alias("n_orders")
    )
    b = items.select(F.col("ok"), F.col("pk").alias("pk_b"))
    pairs = (
        items.join(b, "ok")
        .where(F.col("pk") < F.col("pk_b"))
        .groupBy(F.col("pk").alias("part_a"), F.col("pk_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    scored = (
        pairs.join(
            F.broadcast(part_n.select(F.col("pk").alias("part_a"),
                                      F.col("n").alias("na"))),
            "part_a",
        )
        .join(
            F.broadcast(part_n.select(F.col("pk").alias("part_b"),
                                      F.col("n").alias("nb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr("CAST(n_ab * 1000000 div na AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST(n_ab * n_orders * 1000000 div (na * nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return global_topn(
        scored, [F.desc("lift_ppm"), F.asc("part_a"), F.asc("part_b")],
        BASKET_TOP,
    )


# ------------------------------------------------ week-over-week movers

MOVERS_TOP = 10


@query(
    "rank_movers",
    oracle=f"""
WITH weekly AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
           CAST(count(*) AS BIGINT) AS n_clicks
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
),
ranked AS (
    SELECT week, category_id, n_clicks,
           CAST(row_number() OVER (PARTITION BY week
                                   ORDER BY n_clicks DESC, category_id)
                AS BIGINT) AS rnk
    FROM weekly
),
moved AS (
    SELECT week, category_id, n_clicks, rnk,
           lag(rnk) OVER (PARTITION BY category_id ORDER BY week) AS prev_rnk
    FROM ranked
)
SELECT week, category_id, n_clicks, rnk, prev_rnk,
       CAST(prev_rnk - rnk AS BIGINT) AS rank_gain
FROM moved
WHERE prev_rnk IS NOT NULL
ORDER BY prev_rnk - rnk DESC, week, category_id
LIMIT {MOVERS_TOP}
""",
)
def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week rank movers: each category's position in the weekly
    click leaderboard vs its position last week, ranked by rank GAIN —
    the "trending up" report (`weekly_change` tracks value deltas; rank
    deltas surface movements the absolute numbers hide when overall
    volume shifts). Two windows on different keys — rank within week,
    lag within category — each over the bounded (week x category) grid,
    never raw events; the top movers cut is the per-partition heap."""
    from ..operators.topn import global_topn
    from ..sources.catalog import read_events

    ev = read_events(spark, sf_dir)
    weekly = (
        ev.where(F.col("event_type") == "click")
        .groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.get_json_object("props", "$.k").cast("long").alias(
                "category_id"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    wr = Window.partitionBy("week").orderBy(
        F.desc("n_clicks"), F.asc("category_id")
    )
    ranked = weekly.withColumn(
        "rnk", F.row_number().over(wr).cast("long")
    )
    wl = Window.partitionBy("category_id").orderBy("week")
    moved = ranked.withColumn("prev_rnk", F.lag("rnk").over(wl)).where(
        F.col("prev_rnk").isNotNull()
    )
    return global_topn(
        moved.select(
            "week", "category_id", "n_clicks", "rnk", "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).alias("rank_gain"),
        ),
        [F.desc("rank_gain"), F.asc("week"), F.asc("category_id")],
        MOVERS_TOP,
    )


# ------------------------------------------------ quantile normalization

@query(
    "quantile_transform",
    oracle="""
WITH ranked AS (
    SELECT event_id,
           CAST(round(value * 100) AS BIGINT) AS value_c,
           CAST(row_number() OVER (ORDER BY round(value * 100), event_id)
                AS BIGINT) AS rnk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM events
)
SELECT event_id, value_c,
       CAST(rnk * 1000000 // n AS BIGINT) AS quantile_ppm
FROM ranked
""",
)
def q_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile transform (rank normalization): every value mapped to its
    empirical quantile — the distribution-free feature scaling that makes
    heavy-tailed columns comparable (a model sees uniform [0,1] whatever
    the raw distribution was). Quantiles are integer ppm floor divisions
    of the exact global rank, and the rank comes from the
    range-partitioned `global_rank` with an (value, event_id) total order
    — no single-partition sort, no ties ambiguity, bit-stable output for
    every row.

    The oracle's row_number() OVER (ORDER BY ...) is the single-task
    formulation; `global_rank` is its cluster-safe equivalent (identical
    output, verified by the hash)."""
    from ..operators.sampling import global_rank
    from ..sources.catalog import read_events

    ev = read_events(spark, sf_dir).select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    ranked = global_rank(
        ev, [F.asc("value_c"), F.asc("event_id")], rank_col="rnk0"
    ).withColumn("rnk", F.col("rnk0") + 1)
    tot = ranked.agg(F.count(F.lit(1)).alias("n"))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "event_id",
        "value_c",
        F.expr("CAST(rnk * 1000000 div n AS BIGINT)").alias("quantile_ppm"),
    )


# ------------------------------------- HLL set-intersection estimation

HLL_INTER_TOL_PPM = 250_000  # |est - exact| <= 25% of the UNION size


@query(
    "hll_intersection_verdict",
    oracle="""
WITH ua AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
ub AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
x AS (
    SELECT (SELECT count(*) FROM ua) AS exact_a,
           (SELECT count(*) FROM ub) AS exact_b,
           (SELECT count(*) FROM ua JOIN ub USING (user_id)) AS exact_inter,
           (SELECT count(*) FROM (SELECT * FROM ua UNION
                                  SELECT * FROM ub)) AS exact_union
)
SELECT CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       CAST(exact_union AS BIGINT) AS exact_union,
       TRUE AS inter_within_tol
FROM x
""",
)
def q_hll_intersection_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-INTERSECTION via inclusion-exclusion: HLL supports only
    union natively, so |A∩B| is estimated as est(A) + est(B) - est(A∪B) —
    three sketch estimates whose errors ADD, which is the classic sketch
    gotcha: the absolute error scales with the UNION size, so a small
    intersection of two large sets can even estimate negative. The query
    computes the estimate from per-set DataSketches HLL sketches (union
    via hll_union_agg — the persisted-rollup serving shape), the exact
    twin values, and a tolerance VERDICT stated against the union size
    (|est - exact| <= 25% of |A∪B|, far beyond the ~5-sigma band for
    lgConfigK=12) — honest semantics a naive 'intersection sketch' API
    would hide. Estimates themselves are not engine-comparable, so only
    exact twins + the verdict are in the hashed output (the
    sketch_rollup_users contract)."""
    ev = read_events(spark, sf_dir).select("user_id", "event_type")
    a = ev.where(F.col("event_type") == "view").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    sk = (
        a.select(F.lit("a").alias("side"), "user_id")
        .unionByName(b.select(F.lit("b").alias("side"), "user_id"))
        .groupBy("side")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    ests = sk.agg(
        F.hll_sketch_estimate(
            F.max(F.when(F.col("side") == "a", F.col("sk")))
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.max(F.when(F.col("side") == "b", F.col("sk")))
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    exact = (
        a.intersect(b).agg(F.count(F.lit(1)).alias("exact_inter"))
        .crossJoin(a.distinct().agg(F.count(F.lit(1)).alias("exact_a")))
        .crossJoin(b.distinct().agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(
            a.union(b).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        )
    )
    return exact.crossJoin(F.broadcast(ests)).select(
        "exact_a",
        "exact_b",
        "exact_inter",
        "exact_union",
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                - F.col("exact_inter")
            )
            * 1000000
            <= F.lit(HLL_INTER_TOL_PPM) * F.col("exact_union")
        ).alias("inter_within_tol"),
    )


# ------------------------------------------- Bloom filter membership audit

BLOOM_M = 4096   # filter bits
BLOOM_K = 3      # hash positions per key (md5 hex slices -> exact ints)


@query(
    "bloom_membership_audit",
    oracle=f"""
WITH tw AS (
    SELECT DISTINCT word FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
        WHERE source NOT IN ('src0', 'src1')
    ) WHERE word <> ''
),
ew AS (
    SELECT DISTINCT word FROM (
        SELECT word FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
            WHERE source IN ('src0', 'src1'))
        UNION ALL
        SELECT reverse(word) FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
            WHERE source IN ('src0', 'src1'))
    ) WHERE word <> ''
),
tpos AS (
    SELECT DISTINCT
           CAST(('0x' || substr(md5(word), 1 + i * 4, 4)) AS BIGINT)
               % {BLOOM_M} AS p
    FROM tw CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
),
probe AS (
    SELECT e.word,
           CAST(('0x' || substr(md5(e.word), 1 + k.i * 4, 4)) AS BIGINT)
               % {BLOOM_M} AS p
    FROM ew e CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) k
),
hits AS (
    SELECT pr.word,
           CAST(count(*) FILTER (WHERE t.p IS NOT NULL) = {BLOOM_K}
                AS BOOLEAN) AS bloom_hit
    FROM probe pr LEFT JOIN tpos t ON t.p = pr.p
    GROUP BY pr.word
),
truth AS (
    SELECT h.word, h.bloom_hit, tw.word IS NOT NULL AS is_member
    FROM hits h LEFT JOIN tw ON tw.word = h.word
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS true_members,
       CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS bloom_hits,
       CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS false_positives,
       CAST(sum(CASE WHEN NOT bloom_hit AND is_member THEN 1 ELSE 0 END)
            AS BIGINT) AS false_negatives,
       CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END)
            * 1000000
            // greatest(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS fpr_ppm
FROM truth
""",
)
def q_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch, audited against exact truth (the
    sketch-family protocol of `lsh_recall_audit`/`hll_*`): build a
    {BLOOM_M}-bit / {BLOOM_K}-hash Bloom filter over the TRAIN
    vocabulary, probe every EVAL-slice word, and report measured
    hits / false positives / FPR in ppm — with the structural guarantee
    pinned that FALSE NEGATIVES are impossible (a Bloom filter never
    loses a member). This is the pre-filter a 100 TB anti-join uses to
    skip shuffling keys that cannot match (Spark's own runtime bloom
    pushdown, made inspectable).

    Engine-exact recipe: hash positions are md5 hex slices cast to
    ints (identical bytes both engines — the `dsir` bucket move, three
    slices per key), the filter is the DISTINCT set of set positions
    (at most {BLOOM_M} rows — a broadcastable relation standing in for
    the packed bitset), and a probe hits iff all {BLOOM_K} of its
    positions join. Counts and the ppm rate are exact integers."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from .training_prep import EVAL_SOURCES

    is_eval = F.col("source").isin(*EVAL_SOURCES)
    words = docs.select(
        is_eval.alias("ev"), F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    tw = words.where(~F.col("ev")).select("word").distinct()
    # probe universe: eval words (mostly members) plus their reversals
    # (mostly absent) — the audit needs non-member probes or the FPR has
    # no denominator
    ev_w = words.where(F.col("ev")).select("word")
    ew = ev_w.unionByName(
        ev_w.select(F.reverse("word").alias("word"))
    ).where(F.col("word") != "").distinct()
    ks = spark.range(BLOOM_K).select(F.col("id").cast("int").alias("i"))
    pos_expr = (
        f"CAST(conv(substring(md5(CAST(word AS BINARY)), 1 + i * 4, 4), "
        f"16, 10) AS BIGINT) % {BLOOM_M}"
    )
    tpos = (
        tw.crossJoin(F.broadcast(ks))
        .select(F.expr(pos_expr).alias("p"))
        .distinct()
    )
    probe = ew.crossJoin(F.broadcast(ks)).select(
        "word", F.expr(pos_expr).alias("p")
    )
    hits = (
        probe.join(
            F.broadcast(tpos.withColumn("set_bit", F.lit(1))), "p", "left"
        )
        .groupBy("word")
        .agg(
            (F.sum(F.coalesce("set_bit", F.lit(0))) == BLOOM_K).alias(
                "bloom_hit"
            )
        )
    )
    truth = hits.join(
        tw.withColumn("is_member", F.lit(True)), "word", "left"
    ).withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    return truth.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("true_members"),
        F.sum(F.col("bloom_hit").cast("long")).alias("bloom_hits"),
        F.sum((F.col("bloom_hit") & ~F.col("is_member")).cast("long")).alias(
            "false_positives"
        ),
        F.sum((~F.col("bloom_hit") & F.col("is_member")).cast("long")).alias(
            "false_negatives"
        ),
        F.expr(
            "CAST(sum(CAST(bloom_hit AND NOT is_member AS BIGINT)) * 1000000 "
            "div greatest(sum(CAST(NOT is_member AS BIGINT)), 1) AS BIGINT)"
        ).alias("fpr_ppm"),
    )


# --------------------------------------------------- salted skew JOIN

# Replication factor for the dimension side. At 100 TB this is sized to
# the observed hot-key multiplicity (key_skew_profile measures it); 8
# spreads a hot key over 8 reducers for an 8x tail-latency cut at an 8x
# dim-replication cost.
SKEW_JOIN_SALTS = 8


@query(
    "salted_skew_join",
    oracle="""
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(e.value * 1000000) AS BIGINT)) AS BIGINT)
           AS value_micro
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe big x big JOIN by key salting — the join twin of A9's
    salted aggregation (`skew_safe_event_totals`, ref
    AreaTop3ProductSpark.java's random-prefix trick applied to joins).
    A shuffle join hash-partitions on the join key, so one hot key
    lands its entire row volume on ONE reducer; salting appends a
    deterministic salt in [0, {S}) to the fact side and replicates the
    dimension side {S} times (explode over sequence), so the join runs
    on (key, salt) and every hot key is spread over {S} reducers. The
    result is bit-identical to the plain join (the oracle) for ANY salt
    assignment — each fact row still meets exactly one copy of its
    dimension row. The salt is pmod(xxhash64(event_id), {S}): derived
    from the fact PRIMARY KEY, not rand(), so retries/speculative tasks
    recompute identical salts (rand() here silently corrupts results
    under task retry).

    The shuffle_hash hint forces the shuffle-join plan this technique
    targets (tests gate: no BroadcastHashJoin, salt present in the join
    keys); with a broadcastable dim you would broadcast instead and
    salting would be pointless. Sums are per-row-floored integer micros
    so the merge order never shows. AQE's skewJoin split handles
    moderate skew automatically; explicit salting is for the
    single-hot-key regime where one key exceeds what AQE can split
    (AQE splits partitions, not keys co-resident in one hash bucket).
    """
    ev = read_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v_micro"),
        F.pmod(F.xxhash64("event_id"), F.lit(SKEW_JOIN_SALTS)).alias("salt"),
    )
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.expr(f"sequence(0, {SKEW_JOIN_SALTS - 1})"))
        )
    )
    joined = ev.hint("shuffle_hash").join(
        cust,
        (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
    )
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_micro").alias("value_micro"),
    )


# --------------------------------------------------------------- SCD2

SCD2_STATUS_TYPES = ("signup", "error")  # the status-change event types

# Shared version-table CTE (DuckDB): consecutive-duplicate collapse +
# half-open validity intervals. A version row exists only where the status
# actually CHANGES; effective_to = next version's effective_from (NULL for
# the current version), so the intervals partition each user's timeline.
_SCD2_CTE = f"""
ch AS (
    SELECT user_id, event_id, ts, event_type AS status,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev
    FROM events
    WHERE event_type IN {SCD2_STATUS_TYPES}
),
ver AS (
    SELECT user_id, status, ts AS effective_from,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
                AS BIGINT) AS version_n
    FROM ch WHERE prev IS NULL OR prev <> status
),
scd2 AS (
    SELECT user_id, status, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id
                                      ORDER BY version_n) AS effective_to,
           version_n,
           (lead(effective_from) OVER (PARTITION BY user_id
                                       ORDER BY version_n) IS NULL)
               AS is_current
    FROM ver
)
"""


def scd2_versions(ev: DataFrame) -> DataFrame:
    """Spark side of the SCD2 build (see `_SCD2_CTE`). Both windows ride
    ONE user_id exchange — lag for the change detection and lead for the
    interval close share the same partitioning, and the row_number over
    collapsed rows reuses it too (Spark plans a single Exchange followed
    by in-partition sorts)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        ev.where(F.col("event_type").isin(*SCD2_STATUS_TYPES))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("status"),
            F.lag("event_type").over(w).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ver = ch.select(
        "user_id",
        "status",
        F.col("ts").alias("effective_from"),
        F.row_number().over(wv).cast("long").alias("version_n"),
    )
    wl = Window.partitionBy("user_id").orderBy("version_n")
    eff_to = F.lead("effective_from").over(wl)
    return ver.select(
        "user_id",
        "status",
        "effective_from",
        eff_to.alias("effective_to"),
        "version_n",
        eff_to.isNull().alias("is_current"),
    )


@query(
    "scd2_dimension_build",
    oracle=f"""
WITH {_SCD2_CTE}
SELECT user_id, status, effective_from, effective_to, version_n, is_current
FROM scd2
""",
)
def q_scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a changelog — the
    versioned-history complement of the Type-1 `latest_per_key`/
    `cdc_apply_changelog` family: each user's status signal (the
    signup/error event stream) becomes versioned rows with HALF-OPEN
    validity intervals [effective_from, effective_to), version numbers,
    and an is_current flag. True SCD2 semantics: a new version only where
    the status actually changes (consecutive duplicates collapse into the
    open interval), ties at equal timestamps total-ordered by event_id so
    the build is partition-count independent.

    Scale: everything is per-user windows over the (filtered) changelog —
    one key exchange serves the lag (change detection), the version
    row_number, and the lead (interval close). No join, no state blowup:
    output rows = number of actual changes."""
    return scd2_versions(read_events(spark, sf_dir))


@query(
    "scd2_asof_enrich",
    oracle=f"""
WITH {_SCD2_CTE}
SELECT p.event_id, p.user_id, p.ts, v.status, v.version_n
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN scd2 v
  ON v.user_id = p.user_id AND v.effective_from <= p.ts
 AND (v.effective_to IS NULL OR p.ts < v.effective_to)
""",
)
def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact enrichment against the SCD2 dimension: every
    purchase picks up the status version VALID AT ITS TIMESTAMP (the
    half-open interval containing ts; purchases before any version get
    NULLs). The oracle states it as the interval inequality join; the
    Spark plan is the union-timeline `asof_join` — one key shuffle, no
    range-join pair blowup — because the intervals partition the
    timeline, so "latest version with effective_from <= ts" IS the
    interval lookup. version_n breaks equal-timestamp ties (a zero-width
    interval can never match, and asof's running-last picks the newest
    version at the boundary — the same answer the inequality join gives)."""
    ev = read_events(spark, sf_dir)
    dim = scd2_versions(ev).select(
        "user_id", "effective_from", "status", "version_n"
    )
    probes = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        probes,
        dim,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="effective_from",
        value_cols=["status", "version_n"],
        tiebreak="version_n",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_status").alias("status"),
        F.col("asof_version_n").alias("version_n"),
    )


# -------------------------------------------------- incremental agg (IVM)

IVM_SPLIT_DATE = "1999-01-01"  # orders before this date form the base view


def incremental_agg_apply(base_agg: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: merge a
    persisted aggregate (key, n, sum_c) with a weighted delta batch
    (key, w, value_c) where w = +1 inserts and w = -1 RETRACTS a prior
    insert. The merge is the partial-aggregate combine law: aggregate the
    delta to (key, sum w, sum w*value_c), union with the base aggregate,
    re-aggregate, and drop keys whose maintained count reaches zero
    (full-retraction groups leave the view, matching recompute-from-
    scratch). Retraction round-trip (insert batch then its negation
    restores the exact prior view) is pytest-pinned.

    Scale: the base FACTS are never touched — only the (small) maintained
    aggregate and the delta shuffle; exactly the contract a 100 TB
    nightly-merge pipeline needs."""
    d_agg = delta.groupBy("key").agg(
        F.sum("w").cast("long").alias("n"),
        F.sum(F.col("w") * F.col("value_c")).cast("long").alias("sum_c"),
    )
    return (
        base_agg.unionByName(d_agg)
        .groupBy("key")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_c").cast("long").alias("sum_c"),
        )
        .where(F.col("n") != 0)
    )


@query(
    "incremental_agg_maintenance",
    oracle=f"""
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_c
FROM orders
GROUP BY o_custkey
""",
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a per-customer order-count/revenue view:
    the base view aggregates orders before {IVM_SPLIT_DATE} once; the
    later orders arrive as a +1-weighted delta batch and merge via
    `incremental_agg_apply`. The oracle recomputes the view FROM SCRATCH
    over all orders — the green row is the proof that the incremental
    merge path equals recomputation (the IVM contract), the aggregate
    twin of `incremental_dedup_delta`."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("value_c"),
    )
    split = F.lit(IVM_SPLIT_DATE).cast("timestamp")
    base_agg = (
        orders.where(F.col("o_orderdate") < split)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_c").cast("long").alias("sum_c"),
        )
    )
    delta = orders.where(F.col("o_orderdate") >= split).select(
        "key", F.lit(1).alias("w"), "value_c"
    )
    return incremental_agg_apply(base_agg, delta).select(
        F.col("key").alias("o_custkey"),
        F.col("n").alias("n_orders"),
        F.col("sum_c").alias("revenue_c"),
    )


# --------------------------------------------- skyline / Pareto frontier

# ONE SQL text executed verbatim by BOTH engines (the REACH_SQL /
# holt-family contract): 2-D skyline maximizing size while minimizing
# price. The reduce-first shape is what makes a skyline distributed-safe:
# the fact table collapses to one row per size (a bounded categorical
# domain) in a single hash-agg, and dominance then resolves with one
# prefix-min window over that ~50-row table — never the O(n^2)
# tuple-vs-tuple dominance join the naive formulation writes.
SKYLINE_SQL = """
WITH per_size AS (
    SELECT CAST(p_size AS BIGINT) AS size,
           min(CAST(round(p_retailprice * 100) AS BIGINT)) AS min_price_c,
           count(*) AS n_parts
    FROM part GROUP BY 1
)
SELECT size, min_price_c, n_parts FROM (
    SELECT size, min_price_c, n_parts,
           min(min_price_c) OVER (ORDER BY size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_larger
    FROM per_size
) t
WHERE best_larger IS NULL OR min_price_c < best_larger
"""


@query("pareto_price_size_frontier", oracle=SKYLINE_SQL)
def q_pareto_price_size_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) over parts: the sizes whose cheapest part
    is not dominated by any larger size at equal-or-lower price — the
    classic 2-D skyline operator (maximize size, minimize price), answering
    "which (size, price) points are actually worth considering". A point
    survives iff its per-size minimum price is strictly below the running
    minimum over all larger sizes.

    Scale: parts reduce to the per-size table (bounded categorical domain)
    in one hash-agg; the order-only prefix-min window runs on ~50 rows
    (BOUNDED_FRAME_WINDOWS-justified). Exact integer cents throughout; the
    oracle is this same SQL text run verbatim by DuckDB."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SKYLINE_SQL)


# ------------------------------------------- HLL precision-selection curve

HLL_LGKS = [8, 10, 12, 14]
# Theoretical HLL relative standard error 1.04/sqrt(2^lgK), in ppm. Even
# lgK keeps sqrt exact, so these are integer-exact in both engines.
HLL_RSD_PPM = {k: 1_040_000 // (1 << (k // 2)) for k in HLL_LGKS}


@query(
    "hll_precision_curve",
    oracle=f"""
WITH exact AS (SELECT count(DISTINCT user_id) AS exact_users FROM events)
SELECT lgk, rsd_ppm, exact_users,
       TRUE AS within_tol, TRUE AS bytes_bounded
FROM exact, (VALUES {", ".join(f"({k}, {HLL_RSD_PPM[k]})" for k in HLL_LGKS)})
     AS grid(lgk, rsd_ppm)
""",
)
def q_hll_precision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-precision SELECTION audit — the "which lgConfigK do I ship at
    100 TB" question answered with measurements instead of folklore: one
    pass over events builds an HLL sketch per lgK in {HLL_LGKS} alongside
    the exact distinct count, and each precision emits (a) a 5-sigma
    tolerance verdict (|est - exact| <= 5 x 1.04/sqrt(2^lgK) x exact — the
    `approx_distinct_users` contract, extended across the whole precision
    grid) and (b) a memory-bound verdict (serialized sketch bytes <=
    8 x 2^lgK + 64, generous over the ~2^lgK dense encoding — catches a
    sketch that silently degrades to exact mode). Estimates and byte
    counts are engine-specific (DataSketches vs DuckDB HLL), so the
    oracle asserts the VERDICTS plus the engine-neutral columns, the
    established sketch-oracle protocol.

    Scale: all sketches build in ONE hash-agg pass (map-side combinable
    partials — the mergeability that makes HLL the 100 TB answer);
    nothing but the one-row grid leaves the executors."""
    ev = read_events(spark, sf_dir).select("user_id")
    aggs = [F.count_distinct("user_id").alias("exact_users")]
    for k in HLL_LGKS:
        sk = F.hll_sketch_agg("user_id", k)
        aggs.append(F.hll_sketch_estimate(sk).alias(f"est{k}"))
        aggs.append(F.length(sk).alias(f"bytes{k}"))
    one = ev.agg(*aggs)
    stack = ", ".join(
        f"{k}L, {HLL_RSD_PPM[k]}L, est{k}, bytes{k}" for k in HLL_LGKS
    )
    rows = one.select(
        "exact_users",
        F.expr(
            f"stack({len(HLL_LGKS)}, {stack}) AS (lgk, rsd_ppm, est, bytes)"
        ),
    )
    return rows.select(
        "lgk",
        "rsd_ppm",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.lit(5) * F.col("rsd_ppm") * F.col("exact_users") / 1_000_000
        ).alias("within_tol"),
        F.expr("bytes <= 8 * shiftleft(1, cast(lgk AS int)) + 64").alias(
            "bytes_bounded"
        ),
    )


# -------------------------------- exact weighted percentiles per group

WPCT_PCTS = (50, 90)  # weighted nearest-rank percentile targets


@query(
    "weighted_value_percentiles",
    oracle="""
WITH pre AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(sum(l_quantity) AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2, 3
),
cum AS (
    SELECT l_returnflag, l_linestatus, cents, w,
           CAST(sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                             ORDER BY cents) AS BIGINT) AS cw,
           CAST(sum(w) OVER (PARTITION BY l_returnflag, l_linestatus)
                AS BIGINT) AS tot
    FROM pre
)
SELECT l_returnflag, l_linestatus,
       CAST(max(tot) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN cw * 100 >= 50 * tot THEN cents END)
            AS BIGINT) AS p50_cents,
       CAST(min(CASE WHEN cw * 100 >= 90 * tot THEN cents END)
            AS BIGINT) AS p90_cents
FROM cum GROUP BY 1, 2
""",
)
def q_weighted_value_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT quantity-WEIGHTED price percentiles per (returnflag,
    linestatus): the smallest price at which the running quantity share
    reaches 50% / 90% — 'half the shipped units cost at most X cents'.
    Weighted percentiles are the inventory/revenue-share form of
    `value_percentiles` and do not reduce to row-rank percentiles (one
    100-unit line outweighs fifty 2-unit lines). The nearest-rank
    threshold is the DIVISION-FREE integer inequality cw*100 >= p*tot,
    so both engines compare exact bigints — no interpolation, no floats.

    Scale: pre-aggregating to one row per (group, price) bounds the
    ranked table by price cardinality, then `grouped_prefix_sum`
    supplies the running weight — the scale-safe replacement for the
    per-group ORDER BY window when groups are few and huge (the Q1-key
    shape: 6 groups at any corpus size would otherwise be 6 straggler
    tasks). One extra broadcast of the O(groups) totals closes the
    thresholds."""
    from ..operators.sampling import grouped_prefix_sum

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pre = (
        li.groupBy(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("w"))
    )
    cum = grouped_prefix_sum(
        pre,
        ["l_returnflag", "l_linestatus"],
        [F.col("cents")],
        F.col("w"),
        out_col="cw",
    )
    tot = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("w").cast("long").alias("tot")
    )
    j = cum.join(
        F.broadcast(tot), ["l_returnflag", "l_linestatus"]
    )
    return j.groupBy("l_returnflag", "l_linestatus").agg(
        F.max("tot").cast("long").alias("total_weight"),
        F.min(
            F.when(F.col("cw") * 100 >= 50 * F.col("tot"), F.col("cents"))
        )
        .cast("long")
        .alias("p50_cents"),
        F.min(
            F.when(F.col("cw") * 100 >= 90 * F.col("tot"), F.col("cents"))
        )
        .cast("long")
        .alias("p90_cents"),
    )


# ---------------------------------------- join-cardinality estimation (CMS)

JC_W = 4096  # counters per row — sized ~2x the key space so collision noise (Na*Nb/W) stays near the true cardinality
JC_D = 4    # independent hash rows; estimate = min over rows
JC_BRANDS = ("Brand#11", "Brand#22", "Brand#33", "Brand#44")


def _jc_hash_rows(key_sql: str) -> str:
    """(d, bucket) VALUES rows for one key under the shared affine md5
    family — the DuckDB mirror of the Spark expression below."""
    from .dedup import MINHASH_A, MINHASH_B, MINHASH_P

    return ", ".join(
        f"({d}, ((CAST(('0x' || substr(md5({key_sql}), 1, 7)) AS BIGINT) "
        f"* {MINHASH_A[d]} + {MINHASH_B[d]}) % {MINHASH_P}) % {JC_W})"
        for d in range(JC_D)
    )


def _key_freq(keys, cnt: str):
    """Collapse a key column named `pk` to its frequency table
    (pk, cnt) — one map-side-combinable hash agg. Round-11: both the
    CMS counters and the exact-truth join cardinality are functions of
    the two frequency tables alone, so hashing (and joining) the ~30x
    smaller distinct-key table computes the identical integers with one
    md5 per DISTINCT key instead of one per raw fact row (guide §2.3
    "shuffle keys and metadata instead of payloads", §1.2 per-task
    work)."""
    return keys.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias(cnt))


def _cms_sketch(freq, cnt: str, out: str):
    """Fixed JC_D x JC_W count-min sketch from a key FREQUENCY table
    (pk, cnt) — counter = sum of key multiplicities per bucket, the
    same integers the former raw-row count produced; shared by
    `join_cardinality_estimate` and `join_order_advisor`."""
    from .dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = F.conv(
        F.substring(F.md5(F.col("pk").cast("string").cast("binary")), 1, 7),
        16,
        10,
    ).cast("long")
    return (
        freq.select(
            F.col(cnt),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            (
                                (base * MINHASH_A[d] + MINHASH_B[d])
                                % MINHASH_P
                                % JC_W
                            ).alias("bucket"),
                        )
                        for d in range(JC_D)
                    ]
                )
            ).alias("h"),
        )
        .groupBy("h.d", "h.bucket")
        .agg(F.sum(cnt).cast("long").alias(out))
    )


def _jc_oracle() -> str:
    brands = ", ".join(f"'{b}'" for b in JC_BRANDS)
    return f"""
WITH a_keys AS (SELECT l_partkey AS pk FROM lineitem),
b_keys AS (SELECT p_partkey AS pk FROM part WHERE p_brand IN ({brands})),
a_sk AS (
    SELECT v.d, v.bucket, CAST(count(*) AS BIGINT) AS ca
    FROM a_keys, (VALUES {_jc_hash_rows("CAST(pk AS VARCHAR)")}) v(d, bucket)
    GROUP BY 1, 2
),
b_sk AS (
    SELECT v.d, v.bucket, CAST(count(*) AS BIGINT) AS cb
    FROM b_keys, (VALUES {_jc_hash_rows("CAST(pk AS VARCHAR)")}) v(d, bucket)
    GROUP BY 1, 2
),
ip AS (
    SELECT a.d, CAST(sum(a.ca * b.cb) AS BIGINT) AS dot
    FROM a_sk a JOIN b_sk b ON b.d = a.d AND b.bucket = a.bucket
    GROUP BY 1
),
est AS (SELECT CAST(min(dot) AS BIGINT) AS cms_n FROM ip),
truth AS (
    SELECT CAST(count(*) AS BIGINT) AS true_n
    FROM a_keys a JOIN b_keys b ON b.pk = a.pk
)
SELECT t.true_n, e.cms_n,
       CAST(e.cms_n * 1000000 // t.true_n AS BIGINT) AS ratio_ppm,
       e.cms_n >= t.true_n AS never_underestimates
FROM truth t CROSS JOIN est e
"""


@query("join_cardinality_estimate", oracle=_jc_oracle())
def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation from mergeable sketches — the
    optimizer-advisory pass a 100 TB engine runs BEFORE committing to a
    join strategy: |A join B on k| equals the inner product of the two
    key-frequency vectors, and the count-min estimate of that inner
    product is min_d sum_w A_d[w]*B_d[w] (Cormode & Muthukrishnan 2005,
    sec. 4.2 — one-sided: collisions only ADD, so it never
    underestimates, checked exactly by the oracle). Probed here on
    lineitem.l_partkey vs a brand-filtered part slice, next to the exact
    join count and the overestimate ratio.

    Scale shape: each side reduces to its distinct-key frequency table
    (one map-side-combinable hash agg), which feeds BOTH the fixed
    {D}x{W} counter table (md5 per distinct key, counters = multiplicity
    sums — identical integers, ~30x fewer hashes at sf0.1) and the
    exact-truth cardinality (sum of ca*cb over the key equi-join — the
    count(*) of the raw join by algebra, for ANY multiplicity); the
    estimate itself joins two KB-sized sketches. The exact-truth join
    exists for the audit and would be OMITTED in production — the entire
    point is answering the size question without running the join."""
    a_freq = _key_freq(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.col("l_partkey").alias("pk")
        ),
        "fa",
    ).localCheckpoint(eager=False)
    b_freq = _key_freq(
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_brand").isin(*JC_BRANDS))
        .select(F.col("p_partkey").alias("pk")),
        "fb",
    ).localCheckpoint(eager=False)
    ip = (
        _cms_sketch(a_freq, "fa", "ca")
        .join(F.broadcast(_cms_sketch(b_freq, "fb", "cb")), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    est = ip.agg(F.min("dot").cast("long").alias("cms_n"))
    truth = a_freq.join(F.broadcast(b_freq), "pk").agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
        .cast("long")
        .alias("true_n")
    )
    return truth.join(F.broadcast(est)).select(
        "true_n",
        "cms_n",
        F.floor(F.col("cms_n") * 1_000_000 / F.col("true_n"))
        .cast("long")
        .alias("ratio_ppm"),
        (F.col("cms_n") >= F.col("true_n")).alias("never_underestimates"),
    )


q_join_cardinality_estimate.__doc__ = q_join_cardinality_estimate.__doc__.format(
    D=JC_D, W=JC_W
)


# ------------------------------- ANALYZE-style optimizer statistics

# (column, integer scale) — numeric columns are integerized at the scale
# that makes them exact (the cents/milli house rule); categoricals get
# scale None and skip the quantile row.
ANALYZE_NUMERIC = (
    ("l_quantity", 1000),
    ("l_extendedprice", 100),
    ("l_discount", 1000),
)
ANALYZE_CATEGORICAL = ("l_returnflag", "l_linestatus")


def _analyze_col_sql(col: str, scale: int | None) -> str:
    v = f"CAST(round({col} * {scale}) AS BIGINT)" if scale else col
    val_str = "CAST(v AS VARCHAR)"
    pct = (
        "round(quantile_cont(v, 0.25), 4) AS p25,"
        " round(quantile_cont(v, 0.50), 4) AS p50,"
        " round(quantile_cont(v, 0.75), 4) AS p75"
        if scale
        else "CAST(NULL AS DOUBLE) AS p25, CAST(NULL AS DOUBLE) AS p50,"
        " CAST(NULL AS DOUBLE) AS p75"
    )
    return f"""
SELECT '{col}' AS col_name,
       s.n_rows, s.n_nulls, s.ndv, s.min_v, s.max_v,
       m.mcv_value, m.mcv_n, s.p25, s.p50, s.p75
FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(v) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           CAST(min(v) AS VARCHAR) AS min_v,
           CAST(max(v) AS VARCHAR) AS max_v,
           {pct}
    FROM (SELECT {v} AS v FROM lineitem)
) s CROSS JOIN (
    SELECT {val_str} AS mcv_value, CAST(n AS BIGINT) AS mcv_n
    FROM (SELECT v, count(*) AS n FROM (SELECT {v} AS v FROM lineitem)
          WHERE v IS NOT NULL GROUP BY v)
    ORDER BY n DESC, v ASC LIMIT 1
) m
"""


_ANALYZE_ORACLE = "\nUNION ALL\n".join(
    [_analyze_col_sql(c, s) for c, s in ANALYZE_NUMERIC]
    + [_analyze_col_sql(c, None) for c in ANALYZE_CATEGORICAL]
)


@query("table_stats_analyze", oracle=_ANALYZE_ORACLE)
def q_table_stats_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style optimizer-statistics collection over lineitem: per
    column, the row/null counts, exact NDV, min/max, the most-common
    value with its frequency, and (numerics) the exact equi-depth
    quartile boundaries — the statistics a cost-based optimizer's
    `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` materializes, and
    the table this engine's `join_cardinality_estimate` row would read
    instead of re-sketching at plan time.

    Scale shape: each column's stats derive from ONE column-pruned scan
    (columnar parquet reads just that column) feeding a per-value hash
    aggregate — map-side combinable, keyed on the value, so the heavy
    input reduces to the value histogram before NDV/MCV/min/max are
    taken from the bounded histogram table; the quartiles are Spark's
    sort-based exact percentile over the integerized value. This is the
    exact-audit tier: at 100 TB production swaps NDV for HLL and the
    quartiles for a mergeable quantile sketch (the
    `approx_distinct_users` / `approx_value_percentiles` serving tier)
    under the same output contract. Numerics are integerized
    (cents/milli) before any aggregate, so every statistic is exact and
    partitioning-independent."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = None
    specs = [(c, s) for c, s in ANALYZE_NUMERIC] + [
        (c, None) for c in ANALYZE_CATEGORICAL
    ]
    for col, scale in specs:
        v = (
            F.round(F.col(col) * scale).cast("long")
            if scale
            else F.col(col)
        )
        vals = li.select(v.alias("v"))
        hist = vals.where(F.col("v").isNotNull()).groupBy("v").agg(
            F.count(F.lit(1)).alias("n")
        )
        stats = vals.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).cast("long").alias("n_nulls"),
            F.countDistinct("v").cast("long").alias("ndv"),
            F.min("v").cast("string").alias("min_v"),
            F.max("v").cast("string").alias("max_v"),
            *(
                [
                    F.round(F.expr("percentile(v, 0.25)"), 4).alias("p25"),
                    F.round(F.expr("percentile(v, 0.50)"), 4).alias("p50"),
                    F.round(F.expr("percentile(v, 0.75)"), 4).alias("p75"),
                ]
                if scale
                else [
                    F.lit(None).cast("double").alias("p25"),
                    F.lit(None).cast("double").alias("p50"),
                    F.lit(None).cast("double").alias("p75"),
                ]
            ),
        )
        mcv = (
            hist.orderBy(F.desc("n"), F.asc("v"))
            .limit(1)
            .select(
                F.col("v").cast("string").alias("mcv_value"),
                F.col("n").cast("long").alias("mcv_n"),
            )
        )
        row = stats.crossJoin(mcv).select(
            F.lit(col).alias("col_name"),
            "n_rows",
            "n_nulls",
            "ndv",
            "min_v",
            "max_v",
            "mcv_value",
            "mcv_n",
            "p25",
            "p50",
            "p75",
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------- mergeable per-day quantile summaries (rollup)

QSR_R = 32  # ranks kept per day summary
QSR_QS = (2500, 5000, 9000, 9900)  # served quantiles, basis points

_QSR_ORACLE = f"""
WITH v AS (
    SELECT CAST(ts AS DATE) AS day, CAST(round(value * 1000) AS BIGINT) AS v
    FROM events
),
nd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_d FROM v GROUP BY 1),
ranked AS (
    SELECT day, v, CAST(row_number() OVER (PARTITION BY day ORDER BY v)
                        AS BIGINT) AS rn
    FROM v
),
idx AS (
    SELECT nd.day, r.r,
           (nd.n_d - 1) * r.r // {QSR_R} AS i, nd.n_d
    FROM nd CROSS JOIN (SELECT unnest(range(1, {QSR_R + 1})) AS r) r
),
summ AS (
    SELECT idx.day, idx.r, ranked.v AS v_r, idx.n_d
    FROM idx JOIN ranked ON ranked.day = idx.day AND ranked.rn = idx.i + 1
),
wv AS (SELECT v_r AS v, CAST(sum(n_d) AS BIGINT) AS wgt FROM summ GROUP BY 1),
cum AS (
    SELECT v, CAST(sum(wgt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS c
    FROM wv
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
est AS (
    SELECT q.q, min(cum.v) AS est_milli
    FROM (SELECT unnest([{", ".join(str(q) for q in QSR_QS)}]) AS q) q
    CROSS JOIN tot
    JOIN cum ON cum.c * 10000 >= q.q * {QSR_R} * tot.n
    GROUP BY 1
)
SELECT CAST(e.q AS BIGINT) AS q_bp, e.est_milli, t.n AS n_total,
       CAST((SELECT count(*) FROM v WHERE v.v <= e.est_milli)
            * 1000000 // t.n AS BIGINT) AS rank_ppm,
       CAST(abs((SELECT count(*) FROM v WHERE v.v <= e.est_milli)
            * 1000000 // t.n - e.q * 100) AS BIGINT) AS err_ppm
FROM est e CROSS JOIN tot t
"""


def qsr_day_values(ev: DataFrame) -> DataFrame:
    """(day, v) milli-value projection of an events frame — the shared
    batch/stream input shape for the quantile-summary rollup."""
    return ev.select(
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )


def qsr_summaries(v: DataFrame) -> DataFrame:
    """Per-day R-rank summary (day, r, v_r, n_d) of a (day, v) frame.

    Works on any slice of the data; summaries of DISJOINT slices are
    mergeable by ``qsr_estimates`` (each slice's R values carry the
    slice's row count as weight — the mergeable-summary contract the
    streaming twin relies on). One day-partitioned sort window builds
    every summary."""
    from pyspark.sql import Window

    nd = v.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    ranked = v.withColumn(
        "rn",
        F.row_number()
        .over(Window.partitionBy("day").orderBy("v"))
        .cast("long"),
    )
    rr = v.sparkSession.range(1, QSR_R + 1).select(F.col("id").alias("r"))
    idx = nd.crossJoin(F.broadcast(rr)).select(
        "day",
        "r",
        F.expr(f"(n_d - 1) * r div {QSR_R}").alias("i"),
        "n_d",
    )
    return idx.join(
        ranked,
        (idx.day == ranked.day) & (ranked.rn == idx.i + 1),
    ).select(idx.day, "r", F.col("v").alias("v_r"), "n_d")


def qsr_estimates(summ: DataFrame) -> DataFrame:
    """Serve (q, n, est_milli) by merging weighted summaries — the
    weighted-CDF threshold crossing on exact bigints. Needs only the
    (v_r, n_d) columns, so per-day summaries and per-(batch, day)
    segment summaries merge identically; the exact total row count is
    recovered as sum(n_d) div R (every segment contributes exactly R
    rows). Touches only the bounded summary table, never raw events."""
    from pyspark.sql import Window

    spark = summ.sparkSession
    wv = summ.groupBy(F.col("v_r").alias("v")).agg(
        F.sum("n_d").cast("long").alias("wgt")
    )
    cw = (
        Window.partitionBy(F.lit(1))
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = wv.select("v", F.sum("wgt").over(cw).cast("long").alias("c"))
    tot = summ.agg(F.expr(f"sum(n_d) div {QSR_R}").cast("long").alias("n"))
    qs = spark.createDataFrame([(int(q),) for q in QSR_QS], "q bigint")
    return (
        qs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(cum),
            F.col("c") * 10000 >= F.col("q") * QSR_R * F.col("n"),
        )
        .groupBy("q", "n")
        .agg(F.min("v").alias("est_milli"))
    )


@query("quantile_summary_rollup", oracle=_QSR_ORACLE)
def q_quantile_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-day quantile summaries + rollup serving — the
    distributed-percentile scale path (the mergeable-summary idea behind
    GK/t-digest, in its deterministic order-statistic form): each day
    keeps its {R} exact equi-depth rank values weighted by the day's row
    count; a global quantile is served by MERGING the bounded summary
    table (weighted CDF over days x {R} rows) without ever rescanning
    raw events — `hypertable_rollup`'s pre-aggregation contract extended
    to a NON-additive statistic, and the serving half of the
    exact/approx pair `value_percentiles` / `approx_value_percentiles`.
    The served estimate is then AUDITED against the raw data: the true
    rank of each estimate (one conditional aggregate, no global sort)
    vs the target, in ppm.

    Determinism: the day summary is the value at index
    floor((n_d-1)*r/{R}) of the day's sorted values — an order statistic
    of v alone, well-defined under ties on any engine and partitioning;
    the merge is a weighted-CDF threshold crossing on exact bigints.
    Scale shape: one day-partitioned sort window builds all summaries
    (the shuffle key is the day — the layout a date-partitioned table
    already has, so at 100 TB the sort is per-partition and the summary
    build is embarrassingly parallel); serving touches only the bounded
    summary table; the audit's rank counts are one scan with {NQ}
    conditional sums. Merge error is bounded by the per-day segment
    mass (~n_d/{R}), measured <= 1.7% rank error at every tested SF.
    The summary-build and serve bodies (`qsr_summaries` /
    `qsr_estimates`) are shared verbatim with the streaming twin
    (`streaming/quantiles.py`), whose parity test pins served == batch
    on day-aligned micro-batches."""
    v = qsr_day_values(read_events(spark, sf_dir))
    summ = qsr_summaries(v)
    est = qsr_estimates(summ)
    # audit: true rank of each estimate via conditional sums — one scan
    ests = est.select("q", "est_milli", "n").collect()  # bounded: |QS| rows
    if not ests:  # 0-row input: no summaries, oracle emits 0 rows too
        return spark.createDataFrame(
            [],
            "q_bp bigint, est_milli bigint, n_total bigint,"
            " rank_ppm bigint, err_ppm bigint",
        )
    ranks = v.agg(
        *[
            F.sum((F.col("v") <= int(r["est_milli"])).cast("long"))
            .cast("long")
            .alias(f"le_{int(r['q'])}")
            for r in ests
        ]
    ).collect()[0]
    rows = []
    for r in ests:
        q = int(r["q"])
        n = int(r["n"])
        le = int(ranks[f"le_{q}"])
        rank_ppm = le * 1_000_000 // n
        rows.append(
            (q, int(r["est_milli"]), n, rank_ppm, abs(rank_ppm - q * 100))
        )
    return spark.createDataFrame(
        rows,
        "q_bp bigint, est_milli bigint, n_total bigint, rank_ppm bigint,"
        " err_ppm bigint",
    )


q_quantile_summary_rollup.__doc__ = q_quantile_summary_rollup.__doc__.format(
    R=QSR_R, NQ=len(QSR_QS)
)


# ------------------------------ incremental JOIN maintenance (delta rule)

_IVM_JOIN_ORACLE = """
SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
       o.o_custkey,
       CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS amount_c
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
"""


@query("incremental_join_maintenance", oracle=_IVM_JOIN_ORACLE)
def q_incremental_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental view maintenance for a JOIN view under inserts on
    BOTH sides — the delta-join rule that completes the IVM family next
    to the aggregate row (`incremental_agg_maintenance`) and the dedup
    row (`incremental_dedup_delta`):

        (A u dA) |X| (B u dB)
            = A|X|B  u  dA|X|B  u  A|X|dB  u  dA|X|dB

    The view is the enriched line view orders |X| lineitem on the order
    key; rows before {SPLIT} on each side form the stored base view
    A|X|B, later rows arrive as the two insert deltas, and the engine
    emits base + the THREE delta terms. The oracle recomputes the join
    from scratch over everything — the green row proves the four terms
    partition the recomputed join exactly (each output row lands in
    exactly one term, decided by its two sides' base/delta membership).

    Scale shape: at 100 TB the base view is a stored table that is never
    rescanned; the maintenance cost is three joins each bounded by a
    delta on at least one side (dA|X|B and A|X|dB are delta-vs-big — on
    a table bucketed by the join key, as `bucketed-joins` in
    sources/layout.py sets up, they are shuffle-free partition-pruned
    merges; dA|X|dB is delta-vs-delta). Insert-only deltas here;
    retractions compose with the weighted-delta law the aggregate row
    implements (w = -1 rows delete their join partners)."""
    split = F.lit(IVM_SPLIT_DATE).cast("timestamp")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("amount_c"),
        "l_shipdate",
    )
    a = orders.where(F.col("o_orderdate") < split).drop("o_orderdate")
    da = orders.where(F.col("o_orderdate") >= split).drop("o_orderdate")
    b = li.where(F.col("l_shipdate") < split).drop("l_shipdate")
    db = li.where(F.col("l_shipdate") >= split).drop("l_shipdate")

    def j(o_side: DataFrame, l_side: DataFrame) -> DataFrame:
        return l_side.join(
            o_side, l_side.l_orderkey == o_side.o_orderkey
        ).select("l_orderkey", "l_linenumber", "o_custkey", "amount_c")

    base_view = j(a, b)  # the stored A|X|B at production scale
    return (
        base_view.unionByName(j(da, b))
        .unionByName(j(a, db))
        .unionByName(j(da, db))
    )


q_incremental_join_maintenance.__doc__ = (
    q_incremental_join_maintenance.__doc__.format(SPLIT=IVM_SPLIT_DATE)
)


# ----------------------------------- Bloom-prefiltered join (runtime filter)

RF_BLOOM_M = 65536   # runtime-filter bits
RF_BLOOM_K = 3       # md5 hex slices per key (the bloom_membership_audit recipe)
RF_DIM_PRIORITY = "1-URGENT"

_RF_POS_DUCK = (
    f"CAST(('0x' || substr(md5(CAST({{k}} AS VARCHAR)), 1 + {{i}} * 4, 4)) "
    f"AS BIGINT) % {RF_BLOOM_M}"
)

_RF_ORACLE = f"""
WITH dim AS (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority = '{RF_DIM_PRIORITY}'
),
tpos AS (
    SELECT DISTINCT {_RF_POS_DUCK.format(k="o_orderkey", i="k.i")} AS p
    FROM dim CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) k
),
probe AS (
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, l.l_discount,
           {_RF_POS_DUCK.format(k="l.l_orderkey", i="k.i")} AS p
    FROM lineitem l CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) k
),
passed AS (
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM probe pr LEFT JOIN tpos t ON t.p = pr.p
    GROUP BY 1, 2, 3, 4
    HAVING count(*) FILTER (WHERE t.p IS NOT NULL) = {RF_BLOOM_K}
),
joined AS (
    SELECT p.l_orderkey, p.l_extendedprice, p.l_discount,
           d.o_orderkey IS NOT NULL AS matched
    FROM passed p LEFT JOIN dim d ON d.o_orderkey = p.l_orderkey
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact,
       CAST(count(*) AS BIGINT) AS n_pass_bloom,
       CAST(count(*) FILTER (WHERE NOT matched) AS BIGINT)
           AS n_false_pass,
       CAST(count(*) FILTER (WHERE matched) AS BIGINT) AS n_joined_rows,
       CAST(sum(CASE WHEN matched THEN
                CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT) ELSE 0 END) AS BIGINT) AS revenue_cents
FROM joined
"""


@query("bloom_prefiltered_join", oracle=_RF_ORACLE)
def q_bloom_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over the dim side's join
    keys (urgent orders), pre-filter the FACT scan with it before the
    shuffle join, and emit the joined revenue TOGETHER with the exact
    pruning audit (fact rows in, rows passing the filter, false passes,
    true join rows). This is Spark's own `runtime.bloomFilter` rewrite
    made deterministic and inspectable: at 100 TB the win is shuffling
    n_pass_bloom rows instead of n_fact — the audit columns measure
    exactly that, and the hash match against the oracle's naive form
    proves the filter is LOSSLESS for the join result (a Bloom filter
    admits false positives, which the residual equi-join removes, but
    never false negatives).

    Engine-exact recipe: {K} md5 hex-slice hash positions per key over
    the key's decimal string ({M}-bit filter); the filter is collected as
    a REAL packed bitset ({M} bits = 8 KB — bounded by the filter size,
    never the data; exactly how Spark's own runtime filter ships its
    bloom_filter_agg result to the probe side) and applied to the fact
    scan in ONE projection — the md5 is computed once per fact row and
    all {K} positions test against the bitset literal, so no explode, no
    position join, and no fact-wide re-grouping exist anywhere in the
    plan (round-10 rewrite; the previous form exploded the fact x{K},
    broadcast-joined the position relation, and re-grouped the whole
    fact table on 4 columns to count hits — guide §2.4/§3.2). Revenue in
    exact cents."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    dim = spark.table("orders").where(
        F.col("o_orderpriority") == RF_DIM_PRIORITY
    ).select("o_orderkey")
    fact = spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    # Build side: one md5 per dim row, all RF_BLOOM_K positions from one
    # projection (the former form crossJoined a k-index relation and
    # hashed each row RF_BLOOM_K times); distinct bounds the collect at
    # RF_BLOOM_M positions regardless of dim size.
    tpos = (
        dim.withColumn(
            "__h", F.expr("md5(CAST(CAST(o_orderkey AS STRING) AS BINARY))")
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.expr(
                            f"CAST(conv(substring(__h, 1 + {i} * 4, 4), "
                            f"16, 10) AS BIGINT) % {RF_BLOOM_M}"
                        )
                        for i in range(RF_BLOOM_K)
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )
    # Materialize the ≤ RF_BLOOM_M distinct set positions as a bitset
    # literal ('0'/'1' chars, RF_BLOOM_M of them = 64 KB — bounded by the
    # filter size, never the data): the bounded-model collect that IS a
    # Bloom filter's broadcast in every real runtime-filter implementation.
    words = [0] * (RF_BLOOM_M // 64)
    for r in tpos.collect():
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # Signed-64 rendering so every word is a legal bigint literal; the
    # whole array constant-folds to ONE ArrayData the filter indexes in
    # O(1). (Two rejected forms, both measured ~260 s at sf0.1: a 64 KB
    # string as a row column copies itself into every UnsafeRow, and
    # substring() on a 64 KB string LITERAL walks the string from byte 0
    # per call — UTF8 substring is O(offset).)
    mask_sql = "array({})".format(
        ", ".join(
            f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
        )
    )
    # One md5 per fact row, all RF_BLOOM_K slices tested against the
    # bitset; identical pass set to the exploded+joined form (each i's
    # position is tested independently, so coincident positions count
    # per-i exactly as the old per-row hits did). The whole test is ONE
    # boolean expression with the md5 bound once through a 1-element
    # transform lambda — split across a projection + filter instead,
    # CollapseProject inlines the hash into every position reference and
    # the scan pays RF_BLOOM_K md5s per row (measured; §4.4's duplication
    # applies to any deterministic alias, not just UDFs).
    h_expr = "md5(CAST(CAST(l_orderkey AS STRING) AS BINARY))"
    pass_expr = (
        f"element_at(transform(array({h_expr}), __h -> "
        f"forall(transform(sequence(0, {RF_BLOOM_K - 1}), i -> "
        f"CAST(conv(substring(__h, 1 + i * 4, 4), 16, 10) AS BIGINT) "
        f"% {RF_BLOOM_M}), "
        f"p -> (shiftright(element_at({mask_sql}, "
        f"CAST(p div 64 AS INT) + 1), CAST(p % 64 AS INT)) & 1) = 1)), 1)"
    )
    passed = fact.where(F.expr(pass_expr))
    joined = passed.join(
        F.broadcast(dim.withColumn("matched", F.lit(True))),
        passed.l_orderkey == dim.o_orderkey,
        "left",
    ).select(
        F.coalesce("matched", F.lit(False)).alias("matched"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)"
        ).alias("rev_c"),
    )
    n_fact = fact.agg(F.count(F.lit(1)).cast("long").alias("n_fact"))
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_pass_bloom"),
        F.sum((~F.col("matched")).cast("long"))
        .cast("long")
        .alias("n_false_pass"),
        F.sum(F.col("matched").cast("long"))
        .cast("long")
        .alias("n_joined_rows"),
        F.sum(F.when(F.col("matched"), F.col("rev_c")).otherwise(0))
        .cast("long")
        .alias("revenue_cents"),
    ).crossJoin(F.broadcast(n_fact)).select(
        "n_fact",
        "n_pass_bloom",
        "n_false_pass",
        "n_joined_rows",
        "revenue_cents",
    )


q_bloom_prefiltered_join.__doc__ = q_bloom_prefiltered_join.__doc__.format(
    K=RF_BLOOM_K, M=RF_BLOOM_M
)


# ----------------------------------------- sketch-driven join-order advisor

JOA_RETURNFLAG = "R"
JOA_PRIORITY = "1-URGENT"
JOA_SEGMENT = "BUILDING"


def _joa_side_sql(step: str, src_a: str, src_b: str) -> str:
    return f"""
{step}_a_sk AS (
    SELECT v.d, v.bucket, CAST(count(*) AS BIGINT) AS ca
    FROM ({src_a}) a,
         (VALUES {{rows_a}}) v(d, bucket)
    GROUP BY 1, 2
),
{step}_b_sk AS (
    SELECT v.d, v.bucket, CAST(count(*) AS BIGINT) AS cb
    FROM ({src_b}) b,
         (VALUES {{rows_b}}) v(d, bucket)
    GROUP BY 1, 2
),
{step}_est AS (
    SELECT CAST(min(dot) AS BIGINT) AS cms_n FROM (
        SELECT a.d, CAST(sum(a.ca * b.cb) AS BIGINT) AS dot
        FROM {step}_a_sk a
        JOIN {step}_b_sk b ON b.d = a.d AND b.bucket = a.bucket
        GROUP BY 1
    )
),
{step}_truth AS (
    SELECT CAST(count(*) AS BIGINT) AS true_n
    FROM ({src_a}) a JOIN ({src_b}) b ON b.pk = a.pk
)
"""


def _joa_oracle() -> str:
    lo_a = (f"SELECT l_orderkey AS pk FROM lineitem "
            f"WHERE l_returnflag = '{JOA_RETURNFLAG}'")
    lo_b = (f"SELECT o_orderkey AS pk FROM orders "
            f"WHERE o_orderpriority = '{JOA_PRIORITY}'")
    oc_a = (f"SELECT o_custkey AS pk FROM orders "
            f"WHERE o_orderpriority = '{JOA_PRIORITY}'")
    oc_b = (f"SELECT c_custkey AS pk FROM customer "
            f"WHERE c_mktsegment = '{JOA_SEGMENT}'")
    hv = _jc_hash_rows("CAST(a.pk AS VARCHAR)")
    hb = _jc_hash_rows("CAST(b.pk AS VARCHAR)")
    lo = _joa_side_sql("lo", lo_a, lo_b).format(rows_a=hv, rows_b=hb)
    oc = _joa_side_sql("oc", oc_a, oc_b).format(rows_a=hv, rows_b=hb)
    return f"""
WITH {lo.strip().rstrip()},
{oc.strip().lstrip()},
steps AS (
    SELECT 'lineitem_orders' AS first_join, e.cms_n, t.true_n
    FROM lo_est e CROSS JOIN lo_truth t
    UNION ALL
    SELECT 'orders_customer' AS first_join, e.cms_n, t.true_n
    FROM oc_est e CROSS JOIN oc_truth t
),
best AS (SELECT min(cms_n) AS m FROM steps)
SELECT s.first_join, s.cms_n, s.true_n,
       CAST(CASE WHEN s.true_n > 0
                 THEN s.cms_n * 1000000 // s.true_n ELSE NULL END
            AS BIGINT) AS ratio_ppm,
       s.cms_n >= s.true_n AS never_underestimates,
       s.cms_n = b.m AS chosen
FROM steps s CROSS JOIN best b
"""


@query("join_order_advisor", oracle=_joa_oracle())
def q_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven join ORDERING for the filtered 3-table chain
    lineitem(R-flag) |x| orders(urgent) |x| customer(BUILDING): estimate
    both candidate first joins' output cardinalities from count-min
    inner products (`join_cardinality_estimate`'s estimator, shared
    `_cms_sketch` body) and mark the cheaper-first plan CHOSEN — the
    cost-based decision Catalyst cannot make from static stats when
    filters reshape the key distributions, answered here without
    running either join. Exact-truth counts ride along as the audit
    tier (production omits them); the one-sided CMS guarantee means a
    chosen plan can only be beaten if collisions inflate BOTH
    estimates, which the never_underestimates pin bounds.

    Scale shape: four fixed {D}x{W} sketch tables built from the sides'
    distinct-key frequency tables (map-side combinable; round-11 — md5
    per distinct key, truth = sum of multiplicity products, identical
    integers, the `join_cardinality_estimate` rewrite), estimates join
    KB-sized relations; decision is a 2-row aggregate."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    lo_a = (
        spark.table("lineitem")
        .where(F.col("l_returnflag") == JOA_RETURNFLAG)
        .select(F.col("l_orderkey").alias("pk"))
    )
    lo_b = (
        spark.table("orders")
        .where(F.col("o_orderpriority") == JOA_PRIORITY)
        .select(F.col("o_orderkey").alias("pk"))
    )
    oc_a = (
        spark.table("orders")
        .where(F.col("o_orderpriority") == JOA_PRIORITY)
        .select(F.col("o_custkey").alias("pk"))
    )
    oc_b = (
        spark.table("customer")
        .where(F.col("c_mktsegment") == JOA_SEGMENT)
        .select(F.col("c_custkey").alias("pk"))
    )

    def est(a, b, name):
        fa = _key_freq(a, "fa").localCheckpoint(eager=False)
        fb = _key_freq(b, "fb").localCheckpoint(eager=False)
        ip = (
            _cms_sketch(fa, "fa", "ca")
            .join(F.broadcast(_cms_sketch(fb, "fb", "cb")), ["d", "bucket"])
            .groupBy("d")
            .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
        )
        e = ip.agg(F.min("dot").cast("long").alias("cms_n"))
        t = fa.join(fb, "pk").agg(
            F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
            .cast("long")
            .alias("true_n")
        )
        return e.crossJoin(t).select(
            F.lit(name).alias("first_join"), "cms_n", "true_n"
        )

    steps = est(lo_a, lo_b, "lineitem_orders").unionByName(
        est(oc_a, oc_b, "orders_customer")
    )
    best = steps.agg(F.min("cms_n").alias("m"))
    return steps.crossJoin(F.broadcast(best)).select(
        "first_join",
        "cms_n",
        "true_n",
        F.expr(
            "CAST(CASE WHEN true_n > 0 THEN cms_n * 1000000 div true_n "
            "ELSE NULL END AS BIGINT)"
        ).alias("ratio_ppm"),
        (F.col("cms_n") >= F.col("true_n")).alias("never_underestimates"),
        (F.col("cms_n") == F.col("m")).alias("chosen"),
    )


q_join_order_advisor.__doc__ = q_join_order_advisor.__doc__.format(
    D=JC_D, W=JC_W
)


# ------------------------------------------ AMS F2 / self-join size sketch

AMS_D = 7  # sign rows; estimate = exact median (4th order statistic)


def _ams_sign_rows() -> str:
    """(d, a, b) VALUES rows for the DuckDB mirror of the shared affine
    md5 sign family."""
    from .dedup import MINHASH_A, MINHASH_B

    return ", ".join(
        f"({d}, {MINHASH_A[d]}, {MINHASH_B[d]})" for d in range(AMS_D)
    )


def _ams_oracle() -> str:
    from .dedup import MINHASH_P

    return f"""
WITH b AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
                AS BIGINT) AS base
    FROM events
),
z AS (
    SELECT v.d,
           CAST(sum(2 * (((b.base * v.a + v.b) % {MINHASH_P}) % 2) - 1)
                AS BIGINT) AS z
    FROM b, (VALUES {_ams_sign_rows()}) v(d, a, b)
    GROUP BY 1
),
est AS (
    SELECT CAST(z * z AS BIGINT) AS ams_f2
    FROM z ORDER BY z * z, d LIMIT 1 OFFSET {AMS_D // 2}
),
truth AS (
    SELECT CAST(sum(c * c) AS BIGINT) AS true_f2,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
)
SELECT t.true_f2, t.n_keys, e.ams_f2,
       CAST(abs(e.ams_f2 - t.true_f2) * 1000000 // t.true_f2 AS BIGINT)
           AS err_ppm
FROM truth t CROSS JOIN est e
"""


@query("ams_f2_estimate", oracle=_ams_oracle())
def q_ams_f2_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) sketch: estimate the SELF-join size of
    events on user_id — sum over keys of c_k^2 — without grouping by
    key (Alon-Matias-Szegedy 1996, the other classic join-size
    estimator next to the CMS inner product of
    `join_cardinality_estimate`). Each of {D} sketch rows keeps one
    counter Z_d = sum over ROWS of s_d(key), where s_d is a +/-1 sign
    from the shared affine md5 family (parity of the hash) — E[Z_d^2] =
    F2 — and the estimate is the exact median (4th order statistic,
    (z^2, d)-lexicographic tiebreak) of the {D} squared counters. The
    exact F2 and the ppm error ride along as the audit.

    Scale shape: the sketch is ONE map-side-combinable aggregate of {D}
    conditional sums over the scan — no per-key state at all, strictly
    cheaper than the CMS row's {D}x4096 counter table and the shape
    that wins when only the aggregate moment (skew factor, self-join
    size, repeat-rate) is needed. The exact-truth branch (hash-agg +
    sum of squares) exists for the audit and would be omitted in
    production. All arithmetic exact bigints; the median-of-7 picks a
    genuinely computed counter, never an average."""
    from .dedup import MINHASH_A, MINHASH_B, MINHASH_P

    ev = read_events(spark, sf_dir).select(
        F.conv(
            F.substring(
                F.md5(F.col("user_id").cast("string").cast("binary")), 1, 7
            ),
            16,
            10,
        )
        .cast("long")
        .alias("base")
    )
    z = ev.agg(
        *[
            F.sum(
                2 * ((F.col("base") * MINHASH_A[d] + MINHASH_B[d])
                     % MINHASH_P % 2) - 1
            )
            .cast("long")
            .alias(f"z{d}")
            for d in range(AMS_D)
        ]
    )
    zz = z.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (F.col(f"z{d}") * F.col(f"z{d}"))
                        .cast("long")
                        .alias("z2"),
                    )
                    for d in range(AMS_D)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.z2")
    # exact median of the bounded 7-row table: the row with exactly
    # AMS_D//2 strict-or-tiebreak predecessors — a broadcast 7x7
    # self-join, no order-only window
    other = zz.select(F.col("d").alias("d2"), F.col("z2").alias("z22"))
    est = (
        zz.join(
            F.broadcast(other),
            (F.col("z22") < F.col("z2"))
            | ((F.col("z22") == F.col("z2")) & (F.col("d2") < F.col("d"))),
            "left",
        )
        .groupBy("d", "z2")
        .agg(F.count("d2").alias("n_before"))
        .where(F.col("n_before") == AMS_D // 2)
        .select(F.col("z2").alias("ams_f2"))
    )
    truth = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("long").alias("true_f2"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
    )
    return truth.crossJoin(F.broadcast(est)).select(
        "true_f2",
        "n_keys",
        "ams_f2",
        F.floor(
            F.abs(F.col("ams_f2") - F.col("true_f2"))
            * 1_000_000
            / F.col("true_f2")
        )
        .cast("long")
        .alias("err_ppm"),
    )


q_ams_f2_estimate.__doc__ = q_ams_f2_estimate.__doc__.format(D=AMS_D)


# ----------------------------- approximate query processing (sampled agg)

AQP_PCT = 10  # deterministic Bernoulli sampling rate, percent

# CI coverage compare, identical text both engines: Bernoulli-HT
# standard error se^2 = (1-p)/p^2 * sum(x^2) with p = 1/10 -> 90*sx2
# (x in whole dollars so the square-sum stays far inside int64 at any
# tested SF); z = 2 (~95%), diff converted cents -> dollars.
_AQP_COVER = (
    "CAST(abs(sum_est_c - sum_true_c) AS DOUBLE) / 100.0"
    " <= 2.0 * sqrt(90.0 * CAST(sx2_d AS DOUBLE))"
)

_AQP_ORACLE = f"""
WITH li AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS rev_c,
           CAST(round(l_extendedprice * (1 - l_discount)) AS BIGINT)
               AS rev_d,
           CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                     CAST(l_linenumber AS VARCHAR)), 1, 7))
                AS BIGINT) % 100 < {AQP_PCT} AS in_sample
    FROM lineitem
),
g AS (
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST(sum(rev_c) AS BIGINT) AS sum_true_c,
           CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sample,
           CAST(sum(CASE WHEN in_sample THEN rev_c ELSE 0 END) AS BIGINT)
               * {100 // AQP_PCT} AS sum_est_c,
           CAST(sum(CASE WHEN in_sample THEN rev_d * rev_d ELSE 0 END)
                AS BIGINT) AS sx2_d
    FROM li GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n_sample,
       n_sample * {100 // AQP_PCT} AS n_est, n_true,
       sum_est_c, sum_true_c,
       CAST(abs(sum_est_c - sum_true_c) * 1000000 // sum_true_c AS BIGINT)
           AS err_ppm,
       {_AQP_COVER} AS ci_covers
FROM g
"""


@query("aqp_revenue_estimate", oracle=_AQP_ORACLE)
def q_aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing: answer the pricing-summary revenue
    rollup from a {PCT}% deterministic Bernoulli sample with
    Horvitz-Thompson scale-up, next to the exact answer and a
    2-sigma CI coverage verdict (the BlinkDB/online-agg contract: an
    approximate answer is only useful WITH its error bar). The sample
    predicate is the md5 row filter of `sample_bernoulli` — pushdown
    composes, so at 100 TB the sampled plan scans {PCT}% of the rows
    and the estimate costs ~{PCT}% of the exact rollup; the exact
    branch here exists only as the audit.

    Exactness: sample sums/counts/square-sums are exact bigints
    (variance accumulates in whole DOLLARS so the square-sum stays
    ~6e15 at sf0.1, far inside int64); the HT scale-up is an integer
    multiply; the one floating step is the CI compare written as
    IDENTICAL text in both engines (sqrt/divide IEEE-correctly
    rounded). z = 2 keeps the bound rational. Scale shape: ONE scan,
    one hash-agg with conditional sums — the estimate, the truth, and
    the error bar in a single pass."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        "l_linestatus",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("rev_c"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("long")
        .alias("rev_d"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < AQP_PCT
        ).alias("in_sample"),
    )
    scale = 100 // AQP_PCT
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("rev_c").cast("long").alias("sum_true_c"),
        F.sum(F.col("in_sample").cast("long")).cast("long").alias("n_sample"),
        (
            F.sum(F.when(F.col("in_sample"), F.col("rev_c")).otherwise(0))
            .cast("long")
            * scale
        ).alias("sum_est_c"),
        F.sum(
            F.when(
                F.col("in_sample"), F.col("rev_d") * F.col("rev_d")
            ).otherwise(0)
        )
        .cast("long")
        .alias("sx2_d"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "n_sample",
        (F.col("n_sample") * scale).alias("n_est"),
        "n_true",
        "sum_est_c",
        "sum_true_c",
        F.expr(
            "CAST(abs(sum_est_c - sum_true_c) * 1000000"
            " div sum_true_c AS BIGINT)"
        ).alias("err_ppm"),
        F.expr(_AQP_COVER).alias("ci_covers"),
    )


q_aqp_revenue_estimate.__doc__ = q_aqp_revenue_estimate.__doc__.format(
    PCT=AQP_PCT
)
