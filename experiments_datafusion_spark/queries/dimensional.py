"""Dimensional-warehouse operators (round 4): SCD Type-2 builds, snapshot
CDC diffs, exact-decimal money aggregation, deterministic mode/listagg, a
running-distinct window, and the skyline (Pareto-frontier) operator.

These extend SURVEY.md §2B/§2C the same way the curation pipeline did: the
reference's DataFusion dependency surface exposes the raw relational
pieces (windows, joins, aggregates); a user running a warehouse on it
composes exactly these shapes.  Each is expressed as the Spark plan you
would ship at 100 TB (single window pass / one shuffle join / decimal
Tungsten aggregate) with a DuckDB oracle replaying the semantics.

Determinism recipes follow queries/__init__.py conventions: identical
aliases both sides, timestamps rendered as strings, money passed through
raw (selection, not arithmetic) or carried in exact decimal/integer units.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register


@register(
    "scd2_snapshot",
    tags=("dimensional", "window", "pipeline"),
    oracle="""
SELECT
  o_custkey                                                   AS custkey,
  CAST(row_number() OVER w AS BIGINT)                         AS version,
  o_orderstatus                                               AS status,
  o_orderpriority                                             AS priority,
  o_totalprice                                                AS price,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')                  AS valid_from,
  coalesce(strftime(lead(o_orderdate) OVER w,
                    '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
            THEN 1 ELSE 0 END AS BIGINT)                      AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: treat orders as a per-customer change
    log and emit versioned rows with [valid_from, valid_to) ranges and an
    is_current flag — the standard warehouse pattern for history-keeping
    dimensions.  ONE window pass (partitioned by the dimension key), no
    joins; at 100 TB this is a single hash-partition + in-partition sort,
    the same shape whatever the history depth."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("bigint").alias("is_current"),
    )


_CDC_SPLIT = "1995-06-01"


@register(
    "cdc_changelog",
    tags=("dimensional", "join", "pipeline"),
    oracle=f"""
WITH old AS (
  SELECT o_custkey AS k, o_orderstatus AS status, o_orderpriority AS priority
  FROM orders
  WHERE o_orderdate < TIMESTAMP '{_CDC_SPLIT}'
  QUALIFY row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
),
new AS (
  SELECT o_custkey AS k, o_orderstatus AS status, o_orderpriority AS priority
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CDC_SPLIT}'
  QUALIFY row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
)
SELECT
  coalesce(old.k, new.k) AS custkey,
  CASE WHEN old.k IS NULL THEN 'I'
       WHEN new.k IS NULL THEN 'D'
       ELSE 'U' END      AS change,
  old.status             AS old_status,
  new.status             AS new_status,
  old.priority           AS old_priority,
  new.priority           AS new_priority
FROM old FULL OUTER JOIN new ON old.k = new.k
WHERE old.k IS NULL OR new.k IS NULL
   OR old.status <> new.status OR old.priority <> new.priority
""",
)
def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: the customer's latest order
    state before vs after a cutover date, full-outer-joined on the key and
    classified INSERT / UPDATE / DELETE (unchanged rows are dropped).
    This is the batch-CDC pattern for sources without a changelog — at
    100 TB both snapshots hash-partition on the key and the diff is one
    co-partitioned join; nothing is collected."""
    o = table(spark, sf_dir, "orders")

    def latest(pred) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
        return (
            o.where(pred)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col("o_custkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        )

    split = F.lit(_CDC_SPLIT).cast("timestamp")
    old = latest(F.col("o_orderdate") < split)
    new = latest(F.col("o_orderdate") >= split)
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    changed = (
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.status") != F.col("n.status"))
        | (F.col("o.priority") != F.col("n.priority"))
    )
    return j.where(changed).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("custkey"),
        F.when(F.col("o.k").isNull(), "I")
        .when(F.col("n.k").isNull(), "D")
        .otherwise("U")
        .alias("change"),
        F.col("o.status").alias("old_status"),
        F.col("n.status").alias("new_status"),
        F.col("o.priority").alias("old_priority"),
        F.col("n.priority").alias("new_priority"),
    )


@register(
    "agg_decimal_exact",
    tags=("agg", "decimal"),
    oracle="""
SELECT
  l_returnflag,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS sum_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS sum_revenue,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in EXACT decimal: per-row doubles are cast to
    DECIMAL(18,4) (2dp money values sit far from any 4dp cast boundary),
    products and sums then run in exact decimal arithmetic — Tungsten's
    decimal aggregate path — and the totals are RENDERED AS DECIMAL
    STRINGS, never converted back to double (the sf0.1 sweep caught the
    engines' int128->double conversions disagreeing by one ulp at 1e10
    magnitude; strings of an exact value cannot).  The alternative to
    exact.py's integer-unit recipe when the engine's decimal type is
    preferred over hand-rolled units."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    onemd = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("sum_price"),
        F.sum(price * onemd).cast("string").alias("sum_revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_mode_listagg",
    tags=("agg",),
    oracle="""
WITH counts AS (
  SELECT source, lang, count(*) AS cnt
  FROM documents GROUP BY source, lang
),
m AS (
  SELECT source, lang AS mode_lang, cnt AS mode_n
  FROM counts
  QUALIFY row_number() OVER (PARTITION BY source
                             ORDER BY cnt DESC, lang DESC) = 1
)
SELECT
  m.source,
  m.mode_lang,
  CAST(m.mode_n AS BIGINT) AS mode_n,
  (SELECT string_agg(DISTINCT d.lang, ',' ORDER BY d.lang)
   FROM documents d WHERE d.source = m.source) AS langs
FROM m
""",
)
def agg_mode_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value; ties to the MAX value so
    both engines agree) plus an order-insensitive LISTAGG rendered as a
    sorted comma join — the two order-sensitive aggregates that need an
    explicit determinism contract in any engine.  Two keyed aggregates,
    map-side combinable, no collects."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    mode = counts.groupBy("source").agg(
        F.max(F.struct(F.col("cnt"), F.col("lang"))).alias("m")
    )
    langs = d.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs")
    )
    return (
        mode.join(langs, "source")
        .select(
            "source",
            F.col("m.lang").alias("mode_lang"),
            F.col("m.cnt").cast("bigint").alias("mode_n"),
            "langs",
        )
    )


@register(
    "win_running_distinct",
    tags=("window",),
    oracle="""
SELECT
  user_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
  event_id,
  CAST(count(DISTINCT event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_seen
FROM events
WHERE user_id < 40
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user over event time — the canonical
    'how many distinct behaviours so far' window.  Spark has no DISTINCT
    window aggregate, so the plan keeps a running collect_set and takes
    its size — set growth is bounded by the distinct-type cardinality
    (tiny), so state stays O(types) per row at any scale."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_seen"),
    )


@register(
    "skyline_pareto",
    tags=("analytics", "window"),
    oracle="""
WITH g AS (
  SELECT p_retailprice AS price, max(p_size) AS g_max
  FROM part GROUP BY p_retailprice
),
fr AS (
  SELECT price, g_max,
         max(g_max) OVER (ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cheaper_max
  FROM g
)
SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
FROM part p
JOIN fr ON fr.price = p.p_retailprice
WHERE p.p_size = fr.g_max
  AND (fr.cheaper_max IS NULL OR p.p_size > fr.cheaper_max)
""",
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator: parts not dominated on
    (minimize price, maximize size) — p is dominated iff a part exists
    with price <= p's and size >= p's, strict somewhere.

    Distributed two-phase shape (the textbook answer to skyline's global
    ordering): phase 1 computes a LOCAL skyline inside each hash bucket —
    a dominator in the bucket proves dominance, so pruning is sound and
    independent per bucket; random-partition 2-D skylines leave O(log n)
    survivors per bucket.  Phase 2 runs the exact pass over the tiny
    survivor union in one ordered window.  Each pass is per-price max +
    strictly-cheaper running max; survivors attain their price-group max
    AND strictly beat every cheaper group."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    )

    def pass_(df: DataFrame, bucketed: bool) -> DataFrame:
        keys = ["b"] if bucketed else []
        g = df.groupBy(*keys, "price").agg(F.max("size").alias("g_max"))
        w = (
            Window.partitionBy(*keys)
            .orderBy("price")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        fr = g.select(*keys, "price", "g_max", F.max("g_max").over(w).alias("cheaper_max"))
        fr = fr if bucketed else F.broadcast(fr)
        return (
            df.join(fr, keys + ["price"])
            .where(
                (F.col("size") == F.col("g_max"))
                & (F.col("cheaper_max").isNull() | (F.col("size") > F.col("cheaper_max")))
            )
            .select("p_partkey", "price", "size")
        )

    local = pass_(p.withColumn("b", F.pmod(F.xxhash64("p_partkey"), F.lit(16))), True)
    return pass_(local, False)


@register(
    "abc_pareto_class",
    tags=("warehouse", "window", "aggregate"),
    oracle="""
WITH p AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS tot FROM p),
c AS (
  SELECT l_partkey, rev_cents,
         sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM p
)
SELECT CASE WHEN cum * 10 <= t.tot * 7 THEN 'A'
            WHEN cum * 10 <= t.tot * 9 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT)       AS n_parts,
       CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
       CAST(sum(rev_cents) * 10000 // t.tot AS BIGINT) AS share_bp
FROM c CROSS JOIN t
GROUP BY 1, t.tot
ORDER BY abc_class
""",
)
def abc_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    80/20 analysis: parts are ranked by exact integer-cents revenue, the
    running share assigns class A (first 70% of revenue), B (to 90%), C
    (tail), with deterministic (revenue DESC, partkey) tie order.  Class
    boundaries compare cum*10 against tot*7 / tot*9 — pure int64, no
    percentage floats.

    Shape at 100 TB: one map-side-combined groupBy(partkey) collapses the
    lineitem scan; the running sum runs over the |parts| reduced relation
    (the drift_ks documented trade — range-partition the ranked parts and
    offset per partition when |parts| outgrows one), then a 3-row
    aggregate."""
    li = table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    t = p.agg(F.sum("rev_cents").cast("long").alias("tot"))
    w = Window.orderBy(F.desc("rev_cents"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = p.select("l_partkey", "rev_cents", F.sum("rev_cents").over(w).alias("cum"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.when(F.col("cum") * 10 <= F.col("tot") * 7, "A")
            .when(F.col("cum") * 10 <= F.col("tot") * 9, "B")
            .otherwise("C")
            .alias("abc_class"),
            "rev_cents",
            "tot",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
            F.expr("sum(rev_cents) * 10000 div any_value(tot)")
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("abc_class")
    )


@register(
    "cohort_ltv",
    tags=("warehouse", "window", "aggregate"),
    oracle="""
WITH f AS (
  SELECT o_custkey,
         min(date_trunc('month', o_orderdate)) AS cohort_m
  FROM orders GROUP BY o_custkey
)
SELECT strftime(f.cohort_m, '%Y-%m-%d') AS cohort_month,
       CAST((CAST(date_part('year', o.o_orderdate) AS BIGINT)
             - date_part('year', f.cohort_m)) * 12
            + CAST(date_part('month', o.o_orderdate) AS BIGINT)
            - date_part('month', f.cohort_m) AS BIGINT) AS months_since,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
ORDER BY cohort_month, months_since
""",
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix — the subscription/commerce staple:
    customers grouped by FIRST-order month, revenue tracked by integer
    months-since-cohort (year*12+month arithmetic, no date subtraction
    floats), revenue as exact integer cents.  ev_retention's orders-table
    sibling with money attached.

    Shape at 100 TB: one groupBy(custkey) for first-order month, a
    hash join back on custkey (both sides partition on the key), then a
    map-side-combined groupBy on the (cohort, offset) matrix — at most
    |months|^2 result rows."""
    o = table(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_m")
    )
    j = o.join(f, "o_custkey")
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_m")) * 12
        + F.month("o_orderdate")
        - F.month("cohort_m")
    ).cast("long")
    return (
        j.groupBy(
            F.date_format("cohort_m", "yyyy-MM-dd").alias("cohort_month"),
            months_since.alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("cohort_month", "months_since")
    )


@register(
    "join_null_safe",
    tags=("join",),
    oracle="""
WITH a AS (
  SELECT c_custkey, nullif(c_nationkey % 5, 3) AS grp, c_acctbal
  FROM customer WHERE c_custkey % 2 = 0 AND c_custkey <= 400
),
b AS (
  SELECT c_custkey, nullif(c_nationkey % 5, 3) AS grp
  FROM customer WHERE c_custkey % 2 = 1 AND c_custkey <= 400
)
SELECT a.grp, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CAST(round(a.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY a.grp
ORDER BY a.grp NULLS FIRST
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    semantics plain '=' silently breaks — NULL keys match EACH OTHER
    instead of vanishing.  Spark plans eqNullSafe as a regular hash join
    (null hashes to a bucket like any value); the oracle is DuckDB's
    IS NOT DISTINCT FROM.  Keys are made sparse-null via nullif so the
    null bucket is genuinely exercised, and the two sides split by
    custkey PARITY (capped at 400) so both are non-empty at every test
    scale.

    Scale note: the null bucket is a single hash key — a hot key if nulls
    dominate; the join_salted recipe applies to it like any other skewed
    key."""
    c = table(spark, sf_dir, "customer")
    grp = F.nullif(F.col("c_nationkey") % 5, F.lit(3))
    a = c.where((F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") <= 400)).select(
        grp.alias("grp"), "c_acctbal"
    )
    b = c.where((F.col("c_custkey") % 2 == 1) & (F.col("c_custkey") <= 400)).select(
        grp.alias("grp_b")
    )
    return (
        a.join(b, a["grp"].eqNullSafe(b["grp_b"]))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        )
        .orderBy(F.asc_nulls_first("grp"))
    )
