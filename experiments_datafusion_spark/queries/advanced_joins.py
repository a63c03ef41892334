"""As-of and skew-handling joins (SURVEY.md §2B "Range / as-of / interval
join" — the flagged custom-operator row) with full oracles: DuckDB has a
native ASOF JOIN to check our union+window formulation against, and the
salted join must produce byte-identical results to the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import joins as J
from experiments_datafusion_spark.queries import register


@register(
    "join_asof",
    tags=("join", "asof"),
    oracle="""
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
clicks    AS (SELECT * FROM events WHERE event_type = 'click')
SELECT
  p.event_id,
  p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  c.event_id                          AS click_id,
  round(c.value, 2)                   AS click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the user's most recent
    prior click. Spark side is the union+window formulation (one shuffle,
    partitioned sort — operators/joins.py); oracle is DuckDB's native
    ASOF JOIN, so two independent formulations must agree."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    out = J.asof_join(
        purchases, clicks, on="ts", by=["user_id"], right_cols=["event_id", "value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("right_event_id").alias("click_id"),
        F.round("right_value", 2).alias("click_value"),
    )


@register(
    "join_salted",
    tags=("join", "skew"),
    oracle="""
SELECT l_orderkey, l_partkey, p_name, round(l_extendedprice, 2) AS price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size > 40
""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted (skew-resistant) join: salt lineitem's key G=8 ways, explode
    part 8x, join on (key, salt). Must be row-identical to the plain join —
    the oracle IS the plain join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_size") > 40)
    out = J.salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"),
        part.select("p_partkey", "p_name"),
        key="p_partkey",
        salt_buckets=8,
    )
    return out.select(
        "l_orderkey",
        F.col("p_partkey").alias("l_partkey"),
        "p_name",
        F.round("l_extendedprice", 2).alias("price"),
    )


@register(
    "join_range_bands",
    tags=("join", "range", "interval"),
    oracle="""
WITH bands AS (
  SELECT 0 AS band, 0.0 AS lo, 1000.0 AS hi UNION ALL
  SELECT 1, 1000.0, 5000.0 UNION ALL
  SELECT 2, 5000.0, 20000.0 UNION ALL
  SELECT 3, 20000.0, 60000.0 UNION ALL
  SELECT 4, 60000.0, 1e12
)
SELECT b.band, count(*) AS n, round(sum(l.l_extendedprice), 2) AS total
FROM lineitem l JOIN bands b
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
""",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: assign each fact row to the price band whose
    [lo, hi) interval contains it, then aggregate per band.  The bands side
    is tiny and explicitly broadcast, so the range predicate runs as a
    broadcast nested-loop over 5 rows — the scalable plan for
    points-in-intervals when the interval table is dimension-sized (for
    interval-vs-interval at scale, see join_asof's union+window shape)."""
    bands = spark.createDataFrame(
        [(0, 0.0, 1000.0), (1, 1000.0, 5000.0), (2, 5000.0, 20000.0),
         (3, 20000.0, 60000.0), (4, 60000.0, 1e12)],
        "band int, lo double, hi double",
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )
