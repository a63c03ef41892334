"""Round-5 operators: Spark 4 pipe-syntax SQL, the temporal (point-in-time)
SCD2 join, deterministic weighted sampling, char-entropy text quality,
day-of-week/hour seasonality profiling, and URL-canonicalization dedup.

Same contract as every other module: each key is the Spark plan you would
ship at 100 TB (single window pass / equi+range join / one grouped scan)
with a DuckDB oracle replaying the semantics exactly — float transcendental
terms are evaluated as SINGLE identical IEEE expressions on exact integer
inputs and quantized to integer units BEFORE any cross-row accumulation
(the exact.py discipline), so no rounding boundary exists anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import materialize_then_rmtree, spread, table
from experiments_datafusion_spark.queries import register


# ---- Spark 4 SQL pipe syntax ------------------------------------------------


@register(
    "sql_pipe_syntax",
    tags=("sql", "frontend", "modern"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_units
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
GROUP BY o_orderstatus, o_orderpriority
HAVING count(*) >= 5
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|> operators, SPARK-49555): the same
    filter -> aggregate -> filter chain a DataFrame expresses, written as
    a linear pipeline in the TEXT frontend.  Each |> stage lowers to the
    ordinary Catalyst operators — the plan is identical to the
    nested-SELECT form, so every pushdown/codegen property carries over;
    the oracle is that nested form in classic ANSI SQL."""
    from experiments_datafusion_spark.io import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
FROM orders
|> WHERE o_orderdate >= TIMESTAMP '1994-01-01'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS price_units
   GROUP BY o_orderstatus, o_orderpriority
|> WHERE n >= 5
|> SELECT o_orderstatus, o_orderpriority, n, price_units
""")


# ---- temporal (point-in-time) join against an SCD2 dimension ---------------


@register(
    "join_temporal_scd2",
    tags=("join", "dimensional", "timeseries"),
    oracle="""
WITH dim AS (
  SELECT o_custkey AS custkey,
         CAST(row_number() OVER w AS BIGINT) AS version,
         o_orderstatus AS status,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
fact AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS custkey, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT f.l_orderkey, f.l_linenumber,
       f.custkey,
       strftime(f.l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
       d.version AS dim_version,
       d.status  AS status_at_ship
FROM fact f JOIN dim d
  ON f.custkey = d.custkey
 AND f.l_shipdate >= d.valid_from
 AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
""",
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each shipped line item picks up the
    customer-dimension VERSION that was valid when it shipped — the
    consumption side of scd2_snapshot, and the standard way a warehouse
    avoids leaking future dimension state into historical facts.

    Shape at 100 TB: the dimension build is one window pass; the temporal
    join is an EQUI-join on the dimension key with the validity range as a
    residual join condition — Spark plans a shuffle join partitioned by
    custkey, each key's versions and facts co-located, so the range check
    is a local filter, never a cross-key explosion.  Ship dates are always
    >= the customer's first version start (a line item ships after its
    own order begins), so the join is total over the facts: exactly one
    version matches each fact row (validity windows partition the
    timeline)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    fact = (
        table(spark, sf_dir, "lineitem")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_custkey").alias("custkey"),
            "l_shipdate",
        )
    )
    cond = (
        (fact["custkey"] == dim["custkey"])
        & (fact["l_shipdate"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["l_shipdate"] < dim["valid_to"]))
    )
    return fact.join(dim, cond).select(
        fact["l_orderkey"],
        fact["l_linenumber"],
        fact["custkey"],
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_ts"),
        dim["version"].alias("dim_version"),
        dim["status"].alias("status_at_ship"),
    )


# ---- deterministic weighted sampling (Efraimidis-Spirakis) ------------------

_WS_K = 100  # sample size
_WS_UMOD = 1_000_000  # u granularity (hash -> (0, 1] rational)


@register(
    "sample_weighted",
    tags=("sampling", "pipeline", "llm"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ws'), 1, 15))
             AS BIGINT) % {_WS_UMOD} + 1) / {_WS_UMOD + 1}.0) / n_chars AS es_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT {_WS_K}
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
    each doc draws u in (0,1] and ranks by u^(1/w) — equivalently by
    ln(u)/w, monotone-identical and better conditioned — keeping the
    top K.  The textbook one-pass distributed weighted sampler: no
    sequential scan, no rejection loop, reshard-stable.

    Exactness recipe: u is a RATIONAL from the portable md5 hash
    ((h % 1e6 + 1) / (1e6+1)), so ln(u)/w is a single IEEE expression on
    exact integer inputs — bit-identical across engines, no cross-row
    float accumulation; the top-K is a rank SELECTION (TakeOrderedAndProject)
    with doc_id tiebreak.  RNG-free: the sample is a pure function of doc
    identity, so reruns and backfills pick the same rows (the property
    curation pipelines need for reproducible mixes)."""
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ws"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h % _WS_UMOD + 1) / float(_WS_UMOD + 1)
    es_key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            es_key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_WS_K)
        .select("doc_id", "source", "weight")
    )


# ---- char-entropy text quality ----------------------------------------------

_ENT_UNIT = 1_000_000_000  # nano-nat quantization of per-char entropy terms


@register(
    "text_entropy",
    tags=("llm", "text", "quality"),
    oracle=f"""
WITH chars AS (
  SELECT doc_id, substr(text, p.i, 1) AS ch, len(text) AS n
  FROM documents, UNNEST(generate_series(1, len(text))) AS p(i)
  WHERE len(text) > 0
),
freq AS (
  SELECT doc_id, ch, n, count(*) AS c
  FROM chars GROUP BY doc_id, ch, n
),
terms AS (
  SELECT doc_id, n,
         CAST(floor((c * 1.0 / n) * ln(c * 1.0 / n) * {_ENT_UNIT}) AS BIGINT)
           AS t
  FROM freq
)
SELECT doc_id,
       CAST(count(*) AS BIGINT)          AS n_distinct_chars,
       CAST(-sum(t) AS BIGINT)           AS entropy_nano_nats
FROM terms
GROUP BY doc_id
""",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap statistical
    quality gate that catches mojibake, base64 blobs, and
    single-character spam (entropy near 0) without any language model.

    Exactness recipe: each per-char term p*ln(p) is ONE IEEE expression on
    the exact rational c/n (both int64-derived), floor-quantized to
    integer nano-nats BEFORE the per-doc sum — integer addition is
    associative, so the only float op is replayed bit-identically per
    term and no accumulation-order divergence can exist.  Shape: explode
    to (doc, char) -> one map-side-combined groupBy — the same dataflow
    as token counting; ~n_chars rows, embarrassingly parallel."""
    # spread() (round 13): one-file fixture scan -> the char explode ran
    # as a single task (A/B at sf0.1: 0.71 s -> 0.49 s, identical rows).
    docs = spread(table(spark, sf_dir, "documents").where(F.length("text") > 0))
    # split(text, '') is the LINEAR char explode (one array build per row);
    # the transform(sequence, substr(i,1)) formulation re-scans the string
    # per position — O(len^2) per doc, measured 9.2x slower at sf0.1
    # (5.38 s -> 0.58 s).  Spark's split on the empty pattern yields
    # exactly the characters, no trailing empty element.
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "ch", "n").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") / F.col("n")
    t = F.floor(p * F.log(p) * _ENT_UNIT).cast("long")
    return freq.select("doc_id", t.alias("t")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_chars"),
        (-F.sum("t")).cast("bigint").alias("entropy_nano_nats"),
    )


# ---- day-of-week x hour seasonality profile ---------------------------------


@register(
    "ts_seasonality",
    tags=("timeseries", "events", "stats"),
    oracle="""
WITH cell AS (
  SELECT dayofweek(ts) + 1 AS dow,   -- DuckDB 0=Sunday; Spark 1=Sunday
         hour(ts) AS hod,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT)
           AS v_milli
  FROM events
  GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS tn, CAST(count(*) AS BIGINT) AS ncells FROM cell)
SELECT dow, hod, n, v_milli,
       CAST(n * 10000 * ncells // tn AS BIGINT) AS load_bp
FROM cell CROSS JOIN tot
""",
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: event count and value mass per (day-of-week,
    hour-of-day) cell, plus each cell's load as basis points of the
    uniform expectation (10000 = exactly average) — the profile behind
    capacity planning and "is this weekend dip normal" monitoring.

    Engine-convention shift documented in-line: Spark dayofweek is 1-7
    Sunday=1; DuckDB's is 0-6 Sunday=0, so the oracle adds 1.  Shape:
    ONE map-side-combined groupBy over the events scan (<=168 cells per
    task), then a 1-row broadcast of the totals — exactly two jobs at
    any scale; all arithmetic integer (milli-value units, basis points
    via integer floor division)."""
    e = table(spark, sf_dir, "events")
    cell = e.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).cast("bigint").alias("v_milli"),
    )
    tot = cell.agg(
        F.sum("n").alias("tn"), F.count(F.lit(1)).cast("bigint").alias("ncells")
    )
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        "v_milli",
        F.floor(F.col("n") * 10000 * F.col("ncells") / F.col("tn"))
        .cast("bigint")
        .alias("load_bp"),
    )


# ---- URL-canonicalization dedup ---------------------------------------------


@register(
    "dedup_url_canonical",
    tags=("llm", "dedup", "pipeline"),
    oracle="""
WITH urls AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
         || 'News.Example.com/page/' || CAST(doc_id // 4 AS VARCHAR)
         || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
                  THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
         || (CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '#.*$', ''),
               '\\?utm_[^#]*$', ''),
             '^http://', 'https://'),
           '^https://www\\.', 'https://') AS c0
  FROM urls
),
canon2 AS (
  SELECT doc_id, regexp_replace(c0, '/+$', '') AS curl FROM canon
)
SELECT curl,
       CAST(count(*) AS BIGINT)  AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM canon2
GROUP BY curl
HAVING count(*) > 1
""",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the FIRST dedup pass of every web
    crawl pipeline (cheaper than any content hash: it never reads the
    body): lowercase, scheme-normalize http->https, strip www., strip
    tracking params (utm_*), strip fragments and trailing slashes, then
    group identical canonical URLs.  URL variants are synthesized
    deterministically from doc_id (scheme/www/slash/utm/fragment flags on
    a shared page id), so both engines replay identical inputs.

    Shape: pure per-row regexp projection + one groupBy on the canonical
    string (high-cardinality key, no skew) — the exact-dedup dataflow;
    at 100 TB the groupBy key would be xxhash64(curl) (the hash knob)."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("News.Example.com/page/"),
        F.floor(F.col("doc_id") / 4).cast("long").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("?utm_source=feed&utm_campaign=x")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    c = F.lower(url)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"\?utm_[^#]*$", "")
    c = F.regexp_replace(c, r"^http://", "https://")
    c = F.regexp_replace(c, r"^https://www\.", "https://")
    c = F.regexp_replace(c, r"/+$", "")
    return (
        docs.select("doc_id", c.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
        )
        .where(F.col("n_variants") > 1)
    )


# ---- declarative SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN) --------------


@register(
    "sql_udf_declarative",
    tags=("sql", "frontend", "udf", "modern"),
    oracle="""
SELECT l_returnflag,
       CASE WHEN l_orderkey % 5 = 0 THEN 'z' ELSE 'nz' END AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                AS BIGINT)) AS BIGINT) AS revenue_units
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag, CASE WHEN l_orderkey % 5 = 0 THEN 'z' ELSE 'nz' END
""",
)
def sql_udf_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDFs (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN
    <expr>`, SPARK-46246): scalar functions defined IN SQL, inlined by
    Catalyst at resolution — unlike Python UDFs they cost nothing (the
    plan is identical to writing the expression inline; whole-stage
    codegen, pushdown and constant folding all apply).  This is the
    100 TB-preferred way to share business logic: the oracle simply
    inlines the same expressions, which is literally what Spark does."""
    from experiments_datafusion_spark.io import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * (1 - d) * 100, 0) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION key_bucket(x BIGINT) "
        "RETURNS STRING RETURN CASE WHEN x % 5 = 0 THEN 'z' ELSE 'nz' END"
    )
    return spark.sql("""
SELECT l_returnflag,
       key_bucket(l_orderkey) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(disc_rev(l_extendedprice, l_discount)) AS BIGINT)
         AS revenue_units
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag, key_bucket(l_orderkey)
""")


# ---- error-safe (try_*) arithmetic ------------------------------------------


@register(
    "scalar_try_arith",
    tags=("scalar", "modern"),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)
                 // (o_orderkey % 7) END                    AS units_per,
       TRY_CAST(o_orderpriority AS BIGINT)                  AS prio_num,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)    AS prio_digit,
       CASE WHEN o_custkey = 0 THEN NULL
            ELSE CAST(o_orderkey AS DOUBLE) / o_custkey END AS key_ratio
FROM orders
WHERE o_orderkey <= 2000
""",
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (ANSI-mode surface): try_divide / try_cast
    return NULL where strict ANSI evaluation would raise (division by
    zero, malformed casts) — the contract that lets a 100 TB pipeline
    keep ANSI mode ON (catching real bugs) without one dirty row killing
    a 10-hour job.  The oracle replays each try_* as its explicit
    CASE/TRY_CAST guard — the exact semantics Spark documents for the
    functions.  'N-URGENT'-style strings exercise the failed-cast path;
    o_orderkey % 7 exercises a genuinely-null divisor."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.round(F.col("o_totalprice") * 100, 0).cast("long"),
            F.col("o_orderkey") % 7,
        ).cast("long").alias("units_per"),
        F.try_to_number("o_orderpriority", F.lit("999")).cast("bigint").alias("prio_num"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("prio_digit"),
        F.try_divide(F.col("o_orderkey").cast("double"), F.col("o_custkey")).alias(
            "key_ratio"
        ),
    )


# ---- XML source round-trip --------------------------------------------------


@register(
    "source_xml_roundtrip",
    tags=("io", "sources", "modern"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)       AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(o_custkey) AS BIGINT)  AS cust_sum
FROM orders
GROUP BY o_orderstatus
""",
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink (built into Spark 4, SPARK-44751 — the spark-xml
    connector merged upstream): write the orders keys out as XML rows,
    read them back with an EXPLICIT schema (production rule: never pay
    the double-scan of XML inference), and aggregate the round-tripped
    copy.  The oracle aggregates the original parquet, so the XML
    round-trip itself — serialization, parsing, schema application — is
    what the differential check verifies, the compact_small_files
    pattern applied to a new format."""
    import tempfile

    from experiments_datafusion_spark import io as eio

    tmp = tempfile.mkdtemp(prefix="xml_rt_")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    eio.write_xml(src, f"{tmp}/orders_xml", row_tag="order")
    back = eio.read_xml(
        spark,
        f"{tmp}/orders_xml",
        row_tag="order",
        schema="o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING",
    )
    out = back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum("o_custkey").cast("bigint").alias("cust_sum"),
    )
    return materialize_then_rmtree(out, tmp)


# ---- as-of join with tolerance ----------------------------------------------

_ASOF_TOL_S = 1800  # 30-minute max staleness


@register(
    "join_asof_tolerance",
    tags=("join", "asof", "timeseries"),
    oracle=f"""
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
clicks    AS (SELECT * FROM events WHERE event_type = 'click')
SELECT
  p.event_id,
  p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  CASE WHEN date_diff('second', c.ts, p.ts) <= {_ASOF_TOL_S}
       THEN c.event_id END            AS click_id,
  CASE WHEN date_diff('second', c.ts, p.ts) <= {_ASOF_TOL_S}
       THEN round(c.value, 2) END     AS click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a TOLERANCE (pandas merge_asof's
    ``tolerance``): the most recent prior click still counts only within
    30 minutes — stale context is worse than none in feature pipelines
    (a day-old click must not 'explain' a purchase).  Same union+window
    single-shuffle formulation as join_asof; the tolerance is a post-match
    null-out, so the plan shape is unchanged.  Oracle: DuckDB's native
    ASOF LEFT JOIN with the same gap guard — two independent formulations
    again."""
    from experiments_datafusion_spark.operators import joins as J

    ev = table(spark, sf_dir, "events")
    out = J.asof_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        on="ts",
        by=["user_id"],
        right_cols=["event_id", "value"],
        tolerance_seconds=_ASOF_TOL_S,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("right_event_id").alias("click_id"),
        F.round("right_value", 2).alias("click_value"),
    )


# ---- Holt linear (double) exponential smoothing -----------------------------

_HOLT_AN, _HOLT_AD = 3, 10  # alpha = 3/10 (level)
_HOLT_BN, _HOLT_BD = 1, 10  # beta  = 1/10 (trend)


@register(
    "ts_holt_linear",
    tags=("timeseries", "stateful", "udf", "forecast"),
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_u,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, l, b) AS (
  SELECT user_id, rn, v_u, CAST(0 AS BIGINT) FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         ({_HOLT_AN} * e.v_u + ({_HOLT_AD} - {_HOLT_AN}) * (w.l + w.b)) // {_HOLT_AD},
         ({_HOLT_BN} * (({_HOLT_AN} * e.v_u + ({_HOLT_AD} - {_HOLT_AN}) * (w.l + w.b)) // {_HOLT_AD} - w.l)
          + ({_HOLT_BD} - {_HOLT_BN}) * w.b) // {_HOLT_BD}
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS rn,
       CAST(l AS BIGINT) AS level_u,
       CAST(b AS BIGINT) AS trend_u,
       CAST(l + b AS BIGINT) AS forecast_u
FROM walk
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double) exponential smoothing per user — the
    level+trend COUPLED recurrence behind one-step-ahead forecasting:
    l_t = a*x_t + (1-a)(l+b), b_t = B*(l_t - l) + (1-B)*b.  Like ev_ewma
    this is a per-key sequential recurrence no window frame expresses;
    unlike ev_ewma the state is a 2-vector, the transformWithState
    named-multi-state shape.

    Exactness: integer micro-units, rational a=3/10 B=1/10, and
    TRUNCATING division on both sides (DuckDB's // truncates toward zero
    while Python's floors — the trend term goes negative, where the two
    differ by 1; operators/similarity._pq_tdiv sign-matching applied
    here).  Shape: one shuffle (groupBy user), O(1) state per key,
    parallel across keys."""
    import pandas as pd

    events = table(spark, sf_dir, "events")

    def tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    def walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        v = np.floor(pdf["value"].to_numpy() * 1_000_000).astype("int64")
        n = len(v)
        ls = np.empty(n, dtype="int64")
        bs = np.empty(n, dtype="int64")
        l = b = 0
        for i, x in enumerate(v):
            x = int(x)
            if i == 0:
                l, b = x, 0
            else:
                ln = tdiv(_HOLT_AN * x + (_HOLT_AD - _HOLT_AN) * (l + b), _HOLT_AD)
                b = tdiv(_HOLT_BN * (ln - l) + (_HOLT_BD - _HOLT_BN) * b, _HOLT_BD)
                l = ln
            ls[i], bs[i] = l, b
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "rn": np.arange(1, n + 1, dtype="int64"),
                "level_u": ls,
                "trend_u": bs,
                "forecast_u": ls + bs,
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            walk, schema="user_id long, rn long, level_u long, trend_u long, forecast_u long"
        )
    )


# ---- CEP with a Kleene quantifier (view+ click purchase) --------------------


@register(
    "ev_cep_kleene",
    tags=("events", "window", "cep"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER w AS rn,
         lag(event_type)     OVER w AS prev_type,
         lead(event_type, 1) OVER w AS next1_type,
         lead(event_type, 2) OVER w AS next2_type,
         lead(event_id, 2)   OVER w AS next2_id,
         lead(ts, 2)         OVER w AS next2_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *,
         sum(CASE WHEN event_type = 'view'
                   AND coalesce(prev_type, '') <> 'view'
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY rn) AS run_id
  FROM seq WHERE event_type = 'view'
),
run_ends AS (
  -- last view of each maximal view-run, carrying the two lookaheads
  SELECT user_id, run_id, next1_type, next2_type, next2_id, next2_ts, ts AS last_view_ts
  FROM runs WHERE coalesce(next1_type, '') <> 'view'
),
run_sizes AS (
  SELECT user_id, run_id,
         CAST(count(*) AS BIGINT) AS n_views,
         min(ts) AS first_view_ts
  FROM runs GROUP BY user_id, run_id
)
SELECT s.user_id,
       s.n_views,
       strftime(s.first_view_ts, '%Y-%m-%d %H:%M:%S') AS first_view_ts,
       e.next2_id AS purchase_id,
       CAST(date_diff('second', s.first_view_ts, e.next2_ts) AS BIGINT)
         AS secs_to_purchase
FROM run_sizes s JOIN run_ends e USING (user_id, run_id)
WHERE e.next1_type = 'click' AND e.next2_type = 'purchase'
  AND date_diff('second', s.first_view_ts, e.next2_ts) <= 86400
""",
)
def ev_cep_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern with a KLEENE quantifier — MATCH_RECOGNIZE
    `PATTERN (V+ C P)` semantics: one-or-more strictly-consecutive views,
    then a click, then a purchase, all per user within 24 h of the first
    view.  ev_cep_pattern covers the fixed-length pattern; the V+
    quantifier needs runs of UNKNOWN length, which lowers to
    gaps-and-islands (run ids from a start-flag running sum) + two
    lookaheads carried from the run's LAST row — the standard way
    variable-length CEP compiles onto window algebra.

    Shape: two window passes over the same (user, time) sort (Spark fuses
    them into one exchange+sort) + one tiny per-run aggregate; never a
    self-join over the sequence."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next1_type"),
        F.lead("event_type", 2).over(w).alias("next2_type"),
        F.lead("event_id", 2).over(w).alias("next2_id"),
        F.lead("ts", 2).over(w).alias("next2_ts"),
    )
    wrun = Window.partitionBy("user_id").orderBy("rn")
    runs = seq.where(F.col("event_type") == "view").withColumn(
        "run_id",
        F.sum(
            F.when(
                F.coalesce(F.col("prev_type"), F.lit("")) != "view", 1
            ).otherwise(0)
        ).over(wrun),
    )
    run_ends = runs.where(F.coalesce(F.col("next1_type"), F.lit("")) != "view").select(
        "user_id", "run_id", "next1_type", "next2_type", "next2_id", "next2_ts"
    )
    run_sizes = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("n_views"), F.min("ts").alias("first_view_ts")
    )
    # unix_timestamp subtraction, not timestampdiff: DuckDB date_diff
    # counts second-BOUNDARY crossings; timestampdiff counts elapsed whole
    # seconds — they differ by 1 across sub-second offsets
    gap_s = F.unix_timestamp("next2_ts") - F.unix_timestamp("first_view_ts")
    return (
        run_sizes.join(run_ends, ["user_id", "run_id"])
        .where(
            (F.col("next1_type") == "click")
            & (F.col("next2_type") == "purchase")
            & (gap_s <= 86400)
        )
        .select(
            "user_id",
            "n_views",
            F.date_format("first_view_ts", "yyyy-MM-dd HH:mm:ss").alias("first_view_ts"),
            F.col("next2_id").alias("purchase_id"),
            gap_s.cast("bigint").alias("secs_to_purchase"),
        )
    )


# ---- iterative ML: logistic regression, hard-sigmoid, all-integer -----------

_LR_ITERS = 3
_LR_U = 1_000_000  # micro-unit grid for weights/probabilities
_LR_LR_DEN = 16  # learning rate 1/16

# Chained-CTE oracle: 3 unrolled gradient-descent iterations.  DuckDB's //
# and % truncate toward zero (sign of the dividend) — the Spark side
# mirrors that exactly with (a - a % b) / b, so every quantity is integer
# and bit-identical; there is NO transcendental anywhere (hard sigmoid).


def _lr_sig_sql(wv: str, wh: str, b: str) -> str:
    z = f"({wv} * f.v + {wh} * f.h + {b} * {_LR_U})"
    q = f"(({z} - {z} % {4 * _LR_U}) // {4 * _LR_U})"
    return f"least({_LR_U}, greatest(0, {_LR_U // 2} + {q}))"


def _lr_oracle() -> str:
    ctes = [
        f"""feat AS (
  SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
         CAST(hour(ts) AS BIGINT) AS h,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM events
),
w0 AS (SELECT CAST(0 AS BIGINT) AS wv, CAST(0 AS BIGINT) AS wh, CAST(0 AS BIGINT) AS b)"""
    ]
    for i in range(_LR_ITERS):
        sig = _lr_sig_sql("w.wv", "w.wh", "w.b")
        ctes.append(
            f"""g{i} AS (
  SELECT CAST(sum(({sig} - f.y * {_LR_U}) * f.v) AS BIGINT) AS gv,
         CAST(sum(({sig} - f.y * {_LR_U}) * f.h) AS BIGINT) AS gh,
         CAST(sum(({sig} - f.y * {_LR_U}) * {_LR_U}) AS BIGINT) AS gb,
         CAST(count(*) AS BIGINT) AS n
  FROM feat f CROSS JOIN w{i} w
),
w{i + 1} AS (
  SELECT CAST(w.wv - (g.gv // ({_LR_LR_DEN} * g.n)) // {_LR_U} AS BIGINT) AS wv,
         CAST(w.wh - (g.gh // ({_LR_LR_DEN} * g.n)) // {_LR_U} AS BIGINT) AS wh,
         CAST(w.b  - (g.gb // ({_LR_LR_DEN} * g.n)) // {_LR_U} AS BIGINT) AS b
  FROM w{i} w CROSS JOIN g{i} g
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS iter, wv, wh, b FROM w{i + 1}"
        for i in range(_LR_ITERS)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


@register(
    "ml_logreg_hardsig",
    tags=("ml", "iterative"),
    oracle=_lr_oracle(),
)
def ml_logreg_hardsig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch gradient-descent LOGISTIC REGRESSION (is this event a
    purchase?) on two integer features, with the HARD sigmoid
    clamp(1/2 + z/4, 0, 1) instead of 1/(1+e^-z) — the piecewise-rational
    variant that keeps EVERY quantity exact-integer end to end: gradients
    are int64 sums of per-row rational terms, weight updates are
    truncating integer divisions (mirroring DuckDB's //), so the
    chained-CTE oracle replays all 3 iterations bit-identically with no
    transcendental anywhere (the exp/ln libm-ulp risk the other iterative
    oracles engineer around never arises).

    Shape per iteration: ONE map-side-combined aggregate over the fact
    scan (3 gradient sums + count), a 1-row collect, an O(1) driver
    update, constants folded back into the next scan — the
    embedding_kmeans / graph_pagerank bounded-driver pattern; iterations
    scale as scans, never joins."""
    e = table(spark, sf_dir, "events")
    feat = e.select(
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
        F.hour("ts").cast("long").alias("h"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    ).localCheckpoint(eager=True)

    def tdiv(a: int, bb: int) -> int:
        return -((-a) // bb) if a < 0 else a // bb

    def trunc_div_col(a, bb: int):
        return ((a - a % F.lit(bb)) / F.lit(bb)).cast("long")

    wv = wh = b = 0
    out = []
    for i in range(_LR_ITERS):
        # literals cast to long: int32 lits would constant-fold b * 1e6
        # as 32-bit and overflow (ANSI ARITHMETIC_OVERFLOW)
        z = (
            F.lit(wv).cast("long") * F.col("v")
            + F.lit(wh).cast("long") * F.col("h")
            + F.lit(b).cast("long") * F.lit(_LR_U).cast("long")
        )
        sig = F.least(
            F.lit(_LR_U).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.lit(_LR_U // 2) + trunc_div_col(z, 4 * _LR_U),
            ),
        )
        err = sig - F.col("y") * _LR_U
        g = feat.agg(
            F.sum(err * F.col("v")).alias("gv"),
            F.sum(err * F.col("h")).alias("gh"),
            F.sum(err * F.lit(_LR_U).cast("long")).alias("gb"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = int(g["n"])
        wv -= tdiv(tdiv(int(g["gv"]), _LR_LR_DEN * n), _LR_U)
        wh -= tdiv(tdiv(int(g["gh"]), _LR_LR_DEN * n), _LR_U)
        b -= tdiv(tdiv(int(g["gb"]), _LR_LR_DEN * n), _LR_U)
        out.append((i + 1, wv, wh, b))
    return spark.createDataFrame(out, "iter long, wv long, wh long, b long")


# ---- Avro source round-trip (pure-Python codec, no jar) ----------------------


@register(
    "source_avro_roundtrip",
    tags=("io", "sources", "avro"),
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)        AS n,
       CAST(sum(o_orderkey) AS BIGINT)  AS key_sum,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                                        AS price_units
FROM orders
GROUP BY o_orderstatus
""",
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro scan/sink via the pure-Python container codec (format
    "pyavro") — closing the one environment-blocked format: the spark-avro
    jar can't be fetched here, but the Avro 1.11 container format itself
    is fully speakable from Python (avro_codec.py: zigzag varints,
    deflate blocks, sync markers).  Write orders as Avro (one deflate
    container per task), read it back through the distributed
    file-per-partition reader, aggregate; the oracle aggregates the
    ORIGINAL parquet, so encode + decode + schema mapping is exactly what
    the differential check verifies.  On a real cluster the JVM
    spark-avro connector is preferred (io.read_avro docstring); this is
    the dependency-free fallback, golden-bytes-pinned against the public
    spec in tests/test_avro.py."""
    import tempfile

    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    tmp = tempfile.mkdtemp(prefix="avro_rt_")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src.write.format("pyavro").mode("append").save(f"{tmp}/orders_avro")
    back = spark.read.format("pyavro").load(f"{tmp}/orders_avro")
    out = back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("bigint")
        .alias("price_units"),
    )
    return materialize_then_rmtree(out, tmp)


# ---- snapshot time travel (Delta/Iceberg AS OF dataflow) ---------------------

_TT_CUT = "1995-06-01"


@register(
    "table_time_travel",
    tags=("io", "maintenance", "dimensional"),
    oracle=f"""
WITH v0 AS (
  SELECT o_custkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c
  FROM orders
  WHERE o_orderdate < TIMESTAMP '{_TT_CUT}'
  QUALIFY row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
),
v1 AS (
  SELECT o_custkey AS k, o_orderstatus AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
)
SELECT version, status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(price_c) AS BIGINT) AS price_units
FROM (
  SELECT 0 AS version, * FROM v0
  UNION ALL
  SELECT 1 AS version, * FROM v1
)
GROUP BY version, status
""",
)
def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot TIME TRAVEL — the Delta/Iceberg `VERSION AS OF` dataflow
    rebuilt on immutable parquet snapshots: materialize version 0 (the
    latest per-customer state before a cutover), apply the post-cutover
    changelog with the merge_upsert full-outer dataflow into an immutable
    version-1 directory, then query BOTH versions AS OF their snapshot —
    which is all a lakehouse time-travel read is (the manifest pins which
    immutable files a version sees; copy-on-write keeps old versions
    valid).  The oracle recomputes each version's state straight from the
    raw orders, so snapshot isolation — v0 unchanged by the v1 merge —
    is exactly what the differential check verifies.  Snapshot plumbing
    lives in operators/table_format.py (SnapshotLog + merge_upsert) — the
    shared layer under the whole maintenance family since round 10."""
    import tempfile

    from pyspark.sql import Window as W

    from experiments_datafusion_spark.operators.table_format import (
        SnapshotLog,
        merge_upsert,
    )

    tmp = tempfile.mkdtemp(prefix="timetravel_")
    log = SnapshotLog(tmp)
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )

    def latest(df):
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                F.col("o_custkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_c"),
            )
        )

    # snapshot v0: pre-cutover state, written immutably
    log.commit(latest(orders.where(F.col("o_orderdate") < _TT_CUT)), note="v0")
    # changelog: latest post-cutover state per key; merge into v1
    # (copy-on-write: v0's files are never touched)
    changes = latest(orders.where(F.col("o_orderdate") >= _TT_CUT))
    log.commit(merge_upsert(log.read(spark, 0), changes, key="k"), note="merge")
    # AS OF reads: each version resolves to its manifest-pinned file list
    out = (
        log.read_as_of(spark, (0, 1))
        .groupBy("version", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price_c").cast("bigint").alias("price_units"),
        )
    )
    return materialize_then_rmtree(out, tmp)


# ---- geo: haversine k-nearest-neighbors --------------------------------------

_GEO_K = 3
_GEO_NQ = 8


@register(
    "geo_haversine_knn",
    tags=("geo", "join", "similarity"),
    oracle=f"""
WITH pts AS (
  SELECT DISTINCT user_id AS uid,
    -60 + (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#lat'), 1, 15))
           AS BIGINT) % 12000) / 100.0 AS lat,
    -180 + (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#lon'), 1, 15))
           AS BIGINT) % 36000) / 100.0 AS lon
  FROM events
),
q AS (SELECT * FROM pts WHERE uid < {_GEO_NQ}),
d AS (
  SELECT q.uid AS query_id, p.uid AS neighbor_id,
         2 * 6371000.0 * asin(sqrt(
           pow(sin(radians(p.lat - q.lat) / 2), 2)
           + cos(radians(q.lat)) * cos(radians(p.lat))
             * pow(sin(radians(p.lon - q.lon) / 2), 2)
         )) AS dist_m
  FROM q CROSS JOIN pts p
  WHERE p.uid <> q.uid
)
SELECT query_id, neighbor_id,
       CAST(rank AS BIGINT) AS rank,
       CAST(floor(dist_m) AS BIGINT) AS dist_m
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist_m, neighbor_id) AS rank
  FROM d
) WHERE rank <= {_GEO_K}
""",
)
def geo_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine k-nearest-neighbors: each of {_GEO_NQ} query users finds
    its 3 geographically closest users — the geo retrieval twin of
    sim_topk_bruteforce (broadcast queries x partitioned points, windowed
    rank), on hash-synthesized coordinates so both engines see identical
    rationals.  The haversine chain (radians/sin/cos/asin/sqrt) is ONE
    identical IEEE expression per pair used only for rank SELECTION and a
    floor-to-meters report — the single-expression-transcendental recipe;
    ranks tie-break on neighbor id.  Scale path: the grid-bucketed
    candidate generator (join_spatial_grid) replaces the cross join at
    corpus scale; this key is the exactness baseline it verifies against."""
    ev = table(spark, sf_dir, "events")

    def h(col, salt):
        return F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("long")

    pts = ev.select("user_id").distinct().select(
        F.col("user_id").alias("uid"),
        (-60 + (h(F.col("user_id"), "#lat") % 12000) / 100.0).alias("lat"),
        (-180 + (h(F.col("user_id"), "#lon") % 36000) / 100.0).alias("lon"),
    )
    q = pts.where(F.col("uid") < _GEO_NQ).select(
        F.col("uid").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    dlat = F.radians(F.col("lat") - F.col("qlat")) / 2
    dlon = F.radians(F.col("lon") - F.col("qlon")) / 2
    dist = (
        2
        * 6371000.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2)
                + F.cos(F.radians("qlat"))
                * F.cos(F.radians("lat"))
                * F.pow(F.sin(dlon), 2)
            )
        )
    )
    scored = (
        pts.crossJoin(F.broadcast(q))
        .where(F.col("uid") != F.col("query_id"))
        .select("query_id", F.col("uid").alias("neighbor_id"), dist.alias("dist_m"))
    )
    w = Window.partitionBy("query_id").orderBy("dist_m", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _GEO_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor("dist_m").cast("bigint").alias("dist_m"),
        )
    )
