"""Round-4 window fillers: the modern Spark-4 surface (VARIANT semi-
structured type, dynamic two-pass pivot) plus two aggregate shapes DuckDB
users reach for (weighted median, calendar arithmetic) — each with a
DuckDB oracle per the registry conventions."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register


@register(
    "scalar_variant",
    tags=("scalar", "json", "variant"),
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT)     AS v_k,
       CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS v_k2,
       CAST(json_extract(props, '$.missing') AS BIGINT) IS NOT NULL AS has_missing
FROM events
WHERE user_id < 20
""",
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured type: parse_json into an open
    variant value, then typed-path extraction with variant_get — the
    shredded-JSON storage model (the engine keeps a binary variant and
    prunes paths, instead of string-re-parsing per access like the
    get_json_object legacy path in scalar_struct_json)."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("v_k"),
        (F.try_variant_get(v, "$.k", "bigint") * 2).alias("v_k2"),
        F.try_variant_get(v, "$.missing", "bigint").isNotNull().alias("has_missing"),
    )


@register(
    "scalar_dates2",
    tags=("scalar", "datetime"),
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')        AS plus3m,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')   AS month_end,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')       AS week_start,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT)                  AS dow
FROM orders
WHERE o_orderkey % 7 = 0
""",
)
def scalar_dates2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: add_months (month-end clamped in both
    engines), last_day, Monday-based week truncation, day difference, and
    day-of-week (Spark's 1=Sunday convention; the oracle shifts DuckDB's
    0=Sunday to match)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("int").alias("days_since"),
        F.dayofweek(d).cast("bigint").alias("dow"),
    )


# the five TPC-H priorities are fixture-stable; the Spark side DISCOVERS
# them (two-pass dynamic pivot), the oracle pins the expected set
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _pivot_oracle() -> str:
    cols = ",\n  ".join(
        f"CAST(count(*) FILTER (o_orderpriority = '{p}') AS BIGINT) AS \"p{i + 1}\""
        for i, p in enumerate(sorted(_PRIORITIES))
    )
    return f"""
SELECT o_orderstatus,
  {cols}
FROM orders
GROUP BY o_orderstatus
"""


@register("pivot_dynamic", tags=("pivot",), oracle=_pivot_oracle())
def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC two-pass pivot: pass 1 collects the distinct pivot values
    (a tiny distinct aggregate — the only driver-side data), pass 2 pivots
    with the explicit value list so Spark skips its own discovery job and
    the output column order is deterministic.  The oracle pins the
    expected fixture values; a value drift would surface as a schema
    mismatch, which is the point of auditing dynamic pivots."""
    o = table(spark, sf_dir, "orders")
    values = sorted(
        r["o_orderpriority"]
        for r in o.select("o_orderpriority").distinct().collect()
    )
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", values)
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("bigint").alias(f"p{i + 1}")
            for i, v in enumerate(values)
        ],
    )
    return renamed


@register(
    "agg_weighted_median",
    tags=("agg", "window"),
    oracle="""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag ORDER BY l_extendedprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       min(l_extendedprice) AS weighted_median,
       CAST(min(tw) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower): smallest price whose cumulative quantity
    weight reaches half the group total — the estimator a quality-weighted
    curation cut actually needs (plain median ignores weights).  Weights
    are integral quantities summed as BIGINTs, so the crossing test
    2*cw >= tw is exact; price ties share a value, so within-tie
    cumulative order cannot change the selected price.  One window pass +
    one aggregate; the selected value is a SELECTION, never arithmetic."""
    li = table(spark, sf_dir, "lineitem")
    part = Window.partitionBy("l_returnflag")
    cw = (
        F.sum(F.col("l_quantity").cast("bigint"))
        .over(part.orderBy("l_extendedprice").rowsBetween(Window.unboundedPreceding, 0))
    )
    tw = F.sum(F.col("l_quantity").cast("bigint")).over(part)
    cum = li.select(
        "l_returnflag", "l_extendedprice", cw.alias("cw"), tw.alias("tw")
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "grouping_id_flags",
    tags=("agg", "grouping"),
    oracle="""
SELECT coalesce(l_returnflag, '(all)')                      AS rf,
       coalesce(l_linestatus, '(all)')                      AS ls,
       CAST(grouping(l_returnflag) * 2
            + grouping(l_linestatus) AS BIGINT)             AS gid,
       CAST(count(*) AS BIGINT)                             AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                                                            AS price_units
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def grouping_id_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING flags: the gid column disambiguates a real NULL
    group key from a rollup super-aggregate row — the part of grouping
    sets every reporting layer needs and coalesced labels alone can't
    provide.  gid is composed from per-column grouping() bits so both
    engines agree on bit order by construction."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("bigint")
        .alias("price_units"),
    ).select(
        F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
        F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
        "gid",
        "n",
        "price_units",
    )


@register(
    "group_collated",
    tags=("agg", "string", "collation"),
    oracle="""
WITH mixed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lower(lang) END AS m
  FROM documents
)
SELECT lower(m) AS lang_ci, CAST(count(*) AS BIGINT) AS n
FROM mixed
GROUP BY lower(m)
""",
)
def group_collated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 string collations): a mixed-case
    column grouped under UTF8_LCASE — the engine treats 'EN' and 'en' as
    one group natively, no lower() rewrite in the grouping key.  The
    rendered label is lowercased for the oracle, which replays the
    semantics with an explicit lower() (DuckDB has no collation-typed
    grouping)."""
    d = table(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.lower("lang"))
        .alias("m")
    )
    return (
        mixed.groupBy(F.collate("m", "UTF8_LCASE").alias("mc"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("mc").cast("string")).alias("lang_ci"), "n")
    )
