"""Relational core: projection, filter, every join type, set ops, distinct,
sort, limit/offset (SURVEY.md §2B rows: Projection..Set ops).

Each query is the minimal-but-real exercise of one operator, shaped so the
DuckDB oracle is exactly expressible. Join keys come from the star schema;
dimension sides are broadcast where a real deployment would broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register


@register(
    "proj_expr",
    tags=("projection",),
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice * (1 - l_discount), 4)       AS net_price,
  CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class,
  CAST(l_quantity AS BIGINT)                          AS qty_int,
  l_returnflag || '/' || l_linestatus                 AS flag_status
FROM lineitem
WHERE l_orderkey < 100
""",
)
def proj_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection: arithmetic, CASE WHEN, cast, concat, alias."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@register(
    "filter_predicates",
    tags=("filter",),
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice BETWEEN 1000 AND 50000
  AND o_orderstatus IN ('F', 'O')
  AND o_orderpriority LIKE '%URGENT%'
  AND o_custkey IS NOT NULL
""",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface: BETWEEN / IN / LIKE / IS NOT NULL, all pushed to the
    parquet scan (PushedFilters in the plan)."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


def _cust_nation(spark: SparkSession, sf_dir: str):
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return cust, nation


@register(
    "join_inner",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (broadcast: nation is tiny)."""
    cust, nation = _cust_nation(spark, sf_dir)
    return cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@register(
    "join_left",
    tags=("join",),
    oracle="""
SELECT o_orderkey, o_orderstatus, l_linenumber, round(l_quantity, 2) AS quantity
FROM orders LEFT JOIN lineitem
  ON o_orderkey = l_orderkey AND l_linenumber = 1 AND l_quantity > 45
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a compound on-condition (nulls on the probe
    side survive)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_linenumber == 1) & (li.l_quantity > 45)
    return o.join(li, cond, "left").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", F.round("l_quantity", 2).alias("quantity")
    )


@register(
    "join_right",
    tags=("join",),
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_full",
    tags=("join",),
    oracle="""
WITH bignat AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10)
SELECT n_name, s_suppkey, s_name
FROM bignat FULL JOIN supplier ON n_nationkey = s_nationkey
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — unmatched rows from both sides survive."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").where(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name"
    )
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full").select(
        "n_name", "s_suppkey", "s_name"
    )


@register(
    "join_semi",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (the IN/EXISTS rewrite target)."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT IN over a non-null key)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    tags=("join",),
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (5 x 25)."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "join_theta",
    tags=("join", "range"),
    oracle="""
SELECT p_partkey, p_name, s_suppkey
FROM part JOIN supplier
  ON p_retailprice BETWEEN s_acctbal / 10 AND s_acctbal / 10 + 50
WHERE p_partkey < 200
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join -> BroadcastNestedLoopJoin; the small
    side is broadcast so the loop never shuffles the big side."""
    part = table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    supp = table(spark, sf_dir, "supplier")
    cond = (part.p_retailprice >= supp.s_acctbal / 10) & (
        part.p_retailprice <= supp.s_acctbal / 10 + 50
    )
    return part.join(F.broadcast(supp), cond).select("p_partkey", "p_name", "s_suppkey")


@register(
    "setop_union_all",
    tags=("setop",),
    oracle="""
SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_custkey < 50
UNION ALL
SELECT o_orderkey AS key, o_orderstatus AS name FROM orders WHERE o_orderkey < 50
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) via unionByName."""
    a = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("key"), F.col("c_name").alias("name"))
    )
    b = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 50)
        .select(F.col("o_orderkey").alias("key"), F.col("o_orderstatus").alias("name"))
    )
    return a.unionByName(b)


@register(
    "setop_intersect",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics)."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@register(
    "setop_except",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): subtract() is EXCEPT DISTINCT semantics."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.subtract(b)


@register(
    "distinct_rows",
    tags=("distinct",),
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
""",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (hash aggregate w/o agg functions)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "dropdup_subset",
    tags=("distinct",),
    oracle="""
SELECT c_mktsegment, min(c_custkey) AS first_custkey
FROM customer GROUP BY c_mktsegment
""",
)
def dropdup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicate on a key subset, keeping a deterministic representative
    (min custkey) — dropDuplicates' keep-any made oracle-checkable."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.min("c_custkey").alias("first_custkey"))
    )


@register(
    "sort_multicol",
    tags=("sort",),
    oracle="""
SELECT o_orderstatus, o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_orderstatus ASC NULLS FIRST,
         o_totalprice DESC NULLS FIRST,
         o_orderkey ASC NULLS FIRST
""",
)
def sort_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ORDER BY with explicit null placement, pinned per
    SURVEY.md §7 hard-part (e): always explicit, never default.
    The reference's core op (sort_batch, /root/reference/src/lib.rs:23-74)."""
    o = table(spark, sf_dir, "orders")
    return o.orderBy(
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_totalprice").desc_nulls_first(),
        F.col("o_orderkey").asc_nulls_first(),
    ).select(
        "o_orderstatus", "o_orderpriority", "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "topk",
    tags=("sort", "topk"),
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT planned as TakeOrderedAndProject (no global
    sort — per-partition heaps then a k-merge on the driver)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


@register(
    "limit_offset",
    tags=("sort", "offset"),
    oracle="""
SELECT c_custkey, c_name FROM customer
ORDER BY c_custkey
LIMIT 10 OFFSET 20
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET via DataFrame offset+limit (Spark 3.4+ native)."""
    return (
        table(spark, sf_dir, "customer")
        .orderBy("c_custkey")
        .offset(20)
        .limit(10)
        .select("c_custkey", "c_name")
    )


@register(
    "gather_by_index",
    tags=("sort", "take"),
    oracle="""
SELECT rn, o_orderkey, o_orderstatus FROM (
  SELECT o_orderkey, o_orderstatus,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
) WHERE rn % 100 = 1
""",
)
def gather_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Take/gather-by-index (reference: Arrow `take`,
    /root/reference/src/lib.rs:56-73): Spark has no positional gather, so
    attach a global index over a deterministic order and filter on position.
    The index is the two-pass bucketed form (operators/index.py) — every
    stage parallel, unlike a no-partition Window.orderBy which funnels the
    whole table through one task."""
    from experiments_datafusion_spark.operators.index import with_global_index

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        with_global_index(o, "o_orderkey", "rn")
        .where(F.col("rn") % 100 == 1)
        .select("rn", "o_orderkey", "o_orderstatus")
    )


@register(
    "setop_union_distinct",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): union + distinct."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


@register(
    "setop_intersect_all",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of multiplicities)."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


@register(
    "setop_except_all",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicity subtraction)."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.exceptAll(b)


@register(
    "unnest_explode",
    tags=("array", "udtf"),
    oracle="""
SELECT vec_id, ord AS pos, round(CAST(component AS DOUBLE), 5) AS component
FROM (
  SELECT vec_id, unnest(embedding) AS component,
         generate_subscripts(embedding, 1) AS ord
  FROM embeddings
  WHERE vec_id < 20
)
""",
)
def unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST with ordinality (posexplode) — the table-function surface."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "comp")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.round(F.col("comp").cast("double"), 5).alias("component"),
    )


@register(
    "scalar_decimal",
    tags=("scalar", "decimal"),
    oracle="""
SELECT
  o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR)              AS price_dec,
  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS VARCHAR)          AS price_x2,
  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER () AS VARCHAR) AS total_dec
FROM orders
WHERE o_orderkey < 200
""",
)
def scalar_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType: exact fixed-point cast, arithmetic, and aggregation
    (rendered to strings — decimal wire formats differ across engines).
    The grand total attaches as a 1-row broadcast join rather than an
    unpartitioned window, so no stage funnels the table into one task."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    total = o.agg(F.sum(dec).cast("string").alias("total_dec"))
    return o.select(
        "o_orderkey",
        dec.cast("string").alias("price_dec"),
        (dec * 2).cast("string").alias("price_x2"),
    ).crossJoin(F.broadcast(total))


@register(
    "pivot_status",
    tags=("agg", "pivot"),
    oracle="""
SELECT
  o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p,
  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS rev_f,
  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS rev_o,
  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS rev_p
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: wide conditional aggregation.  The pivot values are given
    explicitly — with an implicit value list Spark must first run a
    distinct scan to discover them (an extra job at scale)."""
    o = table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    # Spark names multi-agg pivot columns "<value>_<agg alias>"
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F_cnt"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O_cnt"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P_cnt"), F.lit(0)).alias("cnt_p"),
        F.coalesce(F.col("F_rev"), F.lit(0.0)).alias("rev_f"),
        F.coalesce(F.col("O_rev"), F.lit(0.0)).alias("rev_o"),
        F.coalesce(F.col("P_rev"), F.lit(0.0)).alias("rev_p"),
    )


@register(
    "unpivot_melt",
    tags=("pivot",),
    oracle="""
SELECT c_custkey, metric, round(val, 2) AS val
FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric,
         CAST(c_nationkey AS DOUBLE) AS val FROM customer
)
WHERE c_custkey < 200
""",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide -> long.  DataFrame.unpivot is a zero-shuffle
    narrow transform (each row expands locally); the oracle spells it as
    UNION ALL, the relational-algebra equivalent."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    long = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
    return long.select("c_custkey", "metric", F.round("val", 2).alias("val"))


@register("table_sample", tags=("sample",))
def table_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE: seeded Bernoulli sample pushed into the scan (rows-only
    check — sampling RNG is engine-specific, so no cross-engine oracle;
    tests assert determinism for a fixed seed and approximate fraction)."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
