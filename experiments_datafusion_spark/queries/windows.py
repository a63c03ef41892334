"""Window-function surface (SURVEY.md §2B rows: Window ranking / analytic /
aggregates+frames).

Every window ORDER BY includes a unique tiebreaker column so ranking output
is deterministic and cross-engine comparable. Frames are always pinned
explicitly (Spark's default frame for last/nth differs from the unbounded
frame users expect)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register


@register(
    "win_ranking",
    tags=("window",),
    oracle="""
SELECT
  l_returnflag,
  l_orderkey,
  l_linenumber,
  row_number()   OVER w AS rn,
  rank()         OVER w AS rnk,
  dense_rank()   OVER w AS drnk,
  round(percent_rank() OVER w, 6) AS prnk,
  ntile(4)       OVER w AS quartile,
  round(cume_dist() OVER w, 6)    AS cdist
FROM lineitem
WHERE l_orderkey < 2000
WINDOW w AS (
  PARTITION BY l_returnflag
  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
)
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: row_number/rank/dense_rank/percent_rank/ntile/
    cume_dist over a deterministic (tiebroken) order."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "win_lag_lead",
    tags=("window",),
    oracle="""
SELECT
  user_id,
  event_id,
  event_type,
  lag(event_type)        OVER w AS prev_type,
  lead(event_type)       OVER w AS next_type,
  lag(event_type, 2, 'none') OVER w AS prev2_type,
  round(value - lag(value, 1, 0.0) OVER w, 4) AS delta_value
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead with offsets and defaults (sessionized per user)."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 4).alias("delta_value"),
    )


@register(
    "win_rows_frame",
    tags=("window", "frame"),
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  round(sum(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
  round(avg(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)         AS moving_avg4,
  count(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)             AS neighbors
FROM orders
WHERE o_custkey < 50
""",
)
def win_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total, moving average, centered count."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    base = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(base.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(base.rowsBetween(-3, 0)), 4).alias("moving_avg4"),
        F.count(F.lit(1)).over(base.rowsBetween(-1, 1)).alias("neighbors"),
    )


@register(
    "win_range_frame",
    tags=("window", "frame"),
    oracle="""
SELECT
  o_orderkey,
  round(o_totalprice, 2) AS totalprice,
  count(*) OVER (
    ORDER BY o_totalprice
    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k,
  round(sum(o_totalprice) OVER (
    ORDER BY o_totalprice
    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING), 2) AS sum_band
FROM orders
WHERE o_orderkey < 3000
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames over a numeric ordering column (value-based windows).

    Scale note: an ORDER BY with no PARTITION BY is inherently a
    single-partition window in Spark — that single-task stage IS the
    operator's semantics here (one global value ordering), and the input is
    pre-filtered small. At 100 TB, express banded neighborhoods with a
    partitioned window or a range-band join (see ``join_range_bands``)
    instead of a global RANGE frame."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    w = Window.orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.count(F.lit(1)).over(w.rangeBetween(-1000, 0)).alias("n_within_1k"),
        F.round(F.sum("o_totalprice").over(w.rangeBetween(-1000, 1000)), 2).alias("sum_band"),
    )


@register(
    "win_first_last_nth",
    tags=("window",),
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  first_value(l_partkey) OVER w AS first_part,
  last_value(l_partkey)  OVER w AS last_part,
  nth_value(l_partkey, 2) OVER w AS second_part
FROM lineitem
WHERE l_orderkey < 1000
WINDOW w AS (
  PARTITION BY l_orderkey ORDER BY l_linenumber
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value with an explicit full-partition frame (Spark's
    default frame would make last_value = current row — pinned per
    SURVEY.md §7 determinism rule)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
        F.nth_value("l_partkey", 2).over(w).alias("second_part"),
    )


@register(
    "win_rolling_median",
    tags=("window", "frame", "percentile"),
    oracle="""
SELECT o_custkey, o_orderkey,
       median(cents) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med_cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 50
)
""",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over a sliding ROWS frame — the order-statistic
    window no running aggregate expresses.  Spark disallows median() with a
    window frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the Spark
    side CONSTRUCTS the order statistic: collect_list over the frame,
    array_sort, midpoint — while the oracle uses DuckDB's native windowed
    median(); two independent formulations, one answer.  Inputs are
    quantized to integer cents first, so the only arithmetic either engine
    performs is the even-count midpoint (x + y) / 2 of two exact integers —
    exactly representable, immune to accumulation order (both engines
    define median as the continuous 0.5-quantile).  Scale shape: one hash
    partition + in-partition sort (the standard window exchange); the
    collected frame is O(7) per row, bounded by the frame literal."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(-6, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.array_sort(F.collect_list(cents).over(w)).alias("_a"),
        )
        .withColumn("_n", F.size("_a"))
        .withColumn(
            "med_cents",
            F.expr(
                "CASE WHEN _n % 2 = 1"
                "  THEN CAST(element_at(_a, CAST((_n + 1) div 2 AS INT)) AS DOUBLE)"
                "  ELSE (element_at(_a, CAST(_n div 2 AS INT)) + element_at(_a, CAST(_n div 2 + 1 AS INT))) / 2.0"
                " END"
            ),
        )
        .drop("_a", "_n")
    )


# ---- gaps-and-islands: runs of equal adjacent values ------------------------


@register(
    "win_gap_islands",
    tags=("window", "timeseries", "pattern"),
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS isl
  FROM ordered
)
SELECT user_id, CAST(isl AS BIGINT) AS island, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS island_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS island_end,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_s
FROM islands
GROUP BY user_id, isl, event_type
""",
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-typed events per
    user (the value-change sessionization pattern — distinct from
    win_sessionize's time-gap cut), reported as one row per island with its
    span and size.  Implemented with the lag-flag + running-sum island id
    rather than the two-row_number-difference trick, because BOTH windows
    then share one partitioning (user_id) and one ordering (ts, event_id):
    Catalyst plans a single exchange + a single sort, where the rn-diff
    formulation would shuffle twice (user_id vs (user_id, event_type)).
    Island ids restart per user; duration is exact integer seconds.
    Scale: one hash shuffle on user_id, sequential scan per partition —
    the same shape as any per-key window; no joins, no collect."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    # first row per user: lag NULL -> brk=1 matches the oracle's IS DISTINCT
    # FROM; running sum then starts islands at 1
    run = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    isl = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("isl", run)
    )
    dur = (F.unix_micros(F.max("ts").cast("timestamp"))
           - F.unix_micros(F.min("ts").cast("timestamp")))
    return isl.groupBy("user_id", "isl", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("island_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("island_end"),
        ((dur - dur % 1_000_000) / 1_000_000).cast("long").alias("duration_s"),
    ).select(
        "user_id", F.col("isl").cast("long").alias("island"), "event_type",
        "n_events", "island_start", "island_end", "duration_s",
    )
