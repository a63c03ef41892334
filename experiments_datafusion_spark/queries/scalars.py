"""Scalar expression surface (SURVEY.md §2B rows: Scalar string / math /
date-time / conditional / array / struct / casts).

Whole-stage-codegen territory: every expression here is a built-in Catalyst
expression (JVM-side, vectorizable) — no Python UDFs. Oracle caveats found by
probing DuckDB 1.0: no initcap; float round needs a double cast first;
double->int casts round in DuckDB but truncate in Spark (avoided)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register


@register(
    "scalar_string",
    tags=("scalar",),
    oracle="""
SELECT
  p_partkey,
  upper(p_name)                          AS up_name,
  lower(p_brand)                         AS low_brand,
  substr(p_name, 1, 8)                   AS name8,
  length(p_name)                         AS name_len,
  lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_pad,
  rpad(p_brand, 12, '.')                 AS brand_pad,
  replace(p_type, ' ', '_')              AS type_us,
  split_part(p_type, ' ', 1)             AS type_head,
  strpos(p_name, 'a')                    AS first_a,
  repeat(left(p_brand, 2), 2)            AS brand2x2,
  reverse(p_brand)                       AS brand_rev,
  ascii(p_name)                          AS first_char,
  trim('  ' || p_brand || '  ')          AS trimmed,
  md5(p_name)                            AS name_md5,
  sha256(p_name)                         AS name_sha
FROM part
WHERE p_partkey < 500
""",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (DataFusion 19 string kernels -> Spark
    built-ins; reference pulls the `hex` crate, Cargo.toml:12 — hashing/hex
    covered by md5/sha2)."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.instr("p_name", "a").alias("first_a"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand2x2"),
        F.reverse("p_brand").alias("brand_rev"),
        F.ascii("p_name").alias("first_char"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha"),
    )


@register(
    "scalar_regexp",
    tags=("scalar", "regexp"),
    oracle="""
SELECT
  o_orderkey,
  regexp_extract(o_orderpriority, '([0-9]+)', 1)          AS prio_num,
  regexp_replace(o_orderpriority, '[^A-Z]', '', 'g')      AS prio_alpha,
  regexp_matches(o_orderpriority, 'URGENT|HIGH')          AS is_hot
FROM orders
WHERE o_orderkey < 1000
""",
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extract/replace/match (patterns kept to the common subset of
    Java regex and RE2)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1).alias("prio_num"),
        F.regexp_replace("o_orderpriority", "[^A-Z]", "").alias("prio_alpha"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_hot"),
    )


@register(
    "scalar_math",
    tags=("scalar",),
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(abs(l_discount - 0.05), 6)             AS abs_d,
  CAST(ceil(l_quantity / 7) AS BIGINT)          AS ceil_q,
  CAST(floor(l_quantity / 7) AS BIGINT)         AS floor_q,
  round(exp(l_discount), 6)                     AS exp_d,
  round(ln(l_extendedprice), 6)                 AS ln_p,
  round(log10(l_extendedprice), 6)              AS log10_p,
  round(log2(l_quantity + 1), 6)                AS log2_q,
  round(power(l_discount, 2), 6)                AS disc_sq,
  round(sqrt(l_extendedprice), 6)               AS sqrt_p,
  round(sin(l_discount) + cos(l_discount), 6)   AS trig,
  CAST(sign(l_discount - 0.05) AS DOUBLE)       AS sign_d,
  mod(CAST(l_quantity AS BIGINT), 5)            AS qmod5,
  greatest(l_quantity, l_discount * 100)        AS gq,
  least(l_quantity, l_discount * 100)           AS lq
FROM lineitem
WHERE l_orderkey < 500
""",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).alias("floor_q"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("log2_q"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
        F.round(F.sin("l_discount") + F.cos("l_discount"), 6).alias("trig"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_d"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qmod5"),
        F.greatest("l_quantity", F.col("l_discount") * 100).alias("gq"),
        F.least("l_quantity", F.col("l_discount") * 100).alias("lq"),
    )


@register(
    "scalar_datetime",
    tags=("scalar", "datetime"),
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate)                                    AS yr,
  month(o_orderdate)                                   AS mon,
  day(o_orderdate)                                     AS dom,
  quarter(o_orderdate)                                 AS qtr,
  dayofyear(o_orderdate)                               AS doy,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')          AS month_start,
  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S')    AS due_date,
  strftime(last_day(o_orderdate), '%Y-%m-%d')                     AS eom,
  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)  AS days_since_95,
  CAST(epoch(o_orderdate) AS BIGINT)                              AS epoch_s
FROM orders
WHERE o_orderkey < 1000
""",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: extract parts, date_trunc, interval arithmetic,
    datediff, epoch (session tz pinned UTC so renderings agree)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd HH:mm:ss"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("eom"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_95"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "scalar_conditional",
    tags=("scalar",),
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CASE
    WHEN l_quantity < 10 THEN 'low'
    WHEN l_quantity < 30 THEN 'mid'
    ELSE 'high'
  END                                            AS qty_band,
  coalesce(nullif(l_returnflag, 'N'), 'kept')    AS flag_or_kept,
  nullif(l_linestatus, 'O')                      AS status_nulled,
  ifnull(nullif(l_linestatus, 'O'), '?')         AS status_filled,
  CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE NULL END IS NULL AS no_big_disc
FROM lineitem
WHERE l_orderkey < 500
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / nvl + null predicates."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("kept")).alias("flag_or_kept"),
        F.nullif("l_linestatus", F.lit("O")).alias("status_nulled"),
        F.nvl(F.nullif("l_linestatus", F.lit("O")), F.lit("?")).alias("status_filled"),
        F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
        .otherwise(F.lit(None))
        .isNull()
        .alias("no_big_disc"),
    )


@register(
    "scalar_array",
    tags=("scalar", "array"),
    oracle="""
SELECT
  vec_id,
  len(embedding)                                                       AS dim,
  round(CAST(embedding[1] AS DOUBLE), 4)                               AS e1,
  round(CAST(list_max(embedding) AS DOUBLE), 4)                        AS emax,
  len(list_filter(embedding, x -> x > 0))                              AS n_pos,
  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS esum,
  array_to_string(list_transform(embedding[1:3],
                  x -> CAST(round(CAST(x AS DOUBLE), 3) + 0.0 AS VARCHAR)), ',') AS head3
FROM embeddings
WHERE vec_id < 100
""",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface incl. higher-order functions (transform/filter/
    aggregate) over the embeddings table — the primitives the similarity
    ops build on."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("emax"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + dbl(x)), 4).alias(
            "esum"
        ),
        # "+ 0.0" collapses IEEE negative zero so string rendering agrees
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: (F.round(dbl(x), 3) + F.lit(0.0)).cast("string"),
            ),
        ).alias("head3"),
    )


@register(
    "scalar_struct_json",
    tags=("scalar", "json"),
    oracle="""
SELECT
  event_id,
  CAST(props->>'$.k' AS INT)     AS k,
  CAST(props->>'$.k' AS INT) * 2 AS k2,
  event_type || ':' || CAST(user_id AS VARCHAR) AS tagged
FROM events
WHERE event_id < 500
""",
)
def scalar_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (from_json into a struct, then field access) — the
    events.props column per FIXTURES.md §A."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("p").getField("k").alias("k"),
        (F.col("p").getField("k") * 2).alias("k2"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("tagged"),
    )


@register(
    "scalar_casts",
    tags=("scalar", "cast"),
    oracle="""
SELECT
  o_orderkey,
  CAST(o_orderkey AS VARCHAR)                 AS key_str,
  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
  CAST(floor(o_totalprice) AS BIGINT)         AS price_floor_int,
  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
  TRY_CAST(o_orderstatus AS INT)              AS bad_int,
  TRY_CAST('123' AS INT)                      AS good_int,
  CAST(o_orderkey % 2 = 0 AS VARCHAR)         AS even_str
FROM orders
WHERE o_orderkey < 1000
""",
)
def scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST matrix (double->int goes through floor: DuckDB CAST
    rounds while Spark truncates, so the raw form is deliberately absent)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor_int"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.col("o_orderstatus").try_cast("int").alias("bad_int"),
        F.lit("123").try_cast("int").alias("good_int"),
        (F.col("o_orderkey") % 2 == 0).cast("string").alias("even_str"),
    )


@register(
    "scalar_string2",
    tags=("scalar",),
    oracle="""
SELECT
  p_partkey,
  left(p_name, 4)                                   AS name_l4,
  right(p_name, 3)                                  AS name_r3,
  chr(65 + p_size % 26)                             AS size_chr,
  hex(p_brand)                                      AS brand_hex,
  translate(p_type, 'AEO', 'aeo')                   AS type_tr,
  ltrim('xx' || p_brand, 'x')                       AS brand_ltrim,
  rtrim(p_brand || 'zz', 'z')                       AS brand_rtrim,
  starts_with(p_name, 'small')                      AS is_small,
  ends_with(p_name, 'bolt')                         AS is_bolt,
  levenshtein(p_brand, 'Brand#1')                   AS brand_dist,
  CAST(octet_length(CAST(p_name AS BLOB)) AS INT)   AS name_octets,
  initcap_sp                                        AS name_title
FROM (
  SELECT *,
         concat(upper(substr(p_name, 1, 1)), substr(p_name, 2)) AS initcap_sp
  FROM part
)
WHERE p_partkey < 500
""",
)
def scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string slab: left/right, chr, hex, translate, char-class
    trims, prefix/suffix predicates, edit distance, octet_length.
    (DuckDB 1.0 lacks initcap, so title-casing is spelled out the same
    way in both engines.)"""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("name_l4"),
        F.expr("right(p_name, 3)").alias("name_r3"),
        F.expr("char(65 + p_size % 26)").alias("size_chr"),
        F.hex(F.col("p_brand")).alias("brand_hex"),
        F.translate(F.col("p_type"), "AEO", "aeo").alias("type_tr"),
        F.expr("trim(LEADING 'x' FROM concat('xx', p_brand))").alias("brand_ltrim"),
        F.expr("trim(TRAILING 'z' FROM concat(p_brand, 'zz'))").alias("brand_rtrim"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").endswith("bolt").alias("is_bolt"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("brand_dist"),
        F.octet_length("p_name").alias("name_octets"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substr(p_name, 2)")
        ).alias("name_title"),
    )


@register(
    "scalar_math2",
    tags=("scalar",),
    oracle="""
SELECT
  p_partkey,
  round(atan2(CAST(p_size AS DOUBLE), 10.0), 6)          AS sz_atan2,
  round(tan(p_retailprice / 1000.0), 6)                  AS pr_tan,
  round(asin((p_size % 10) / 10.0), 6)                   AS sz_asin,
  round(acos((p_size % 10) / 10.0), 6)                   AS sz_acos,
  round(degrees(p_retailprice / 1000.0), 6)              AS pr_deg,
  round(radians(CAST(p_size AS DOUBLE)), 6)              AS sz_rad,
  round(cbrt(p_retailprice), 6)                          AS pr_cbrt,
  CAST(factorial(p_size % 10) AS BIGINT)                 AS sz_fact,
  round(p_retailprice, -1) + 0.0                         AS pr_round_neg,
  round(atan(p_retailprice / 500.0), 6)                  AS pr_atan
FROM part
WHERE p_partkey < 500
""",
)
def scalar_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second math slab: inverse trig, atan2, angle conversion, cube root,
    factorial, negative-digit rounding.  `+ 0.0` normalizes IEEE -0.0 the
    same way in both engines."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    sz = F.col("p_size")
    pr = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.atan2(sz.cast("double"), F.lit(10.0)), 6).alias("sz_atan2"),
        F.round(F.tan(pr / 1000.0), 6).alias("pr_tan"),
        F.round(F.asin((sz % 10) / 10.0), 6).alias("sz_asin"),
        F.round(F.acos((sz % 10) / 10.0), 6).alias("sz_acos"),
        F.round(F.degrees(pr / 1000.0), 6).alias("pr_deg"),
        F.round(F.radians(sz.cast("double")), 6).alias("sz_rad"),
        F.round(F.cbrt(pr), 6).alias("pr_cbrt"),
        F.factorial(sz % 10).alias("sz_fact"),
        (F.round(pr, -1) + 0.0).alias("pr_round_neg"),
        F.round(F.atan(pr / 500.0), 6).alias("pr_atan"),
    )


@register(
    "scalar_map",
    tags=("scalar", "map"),
    oracle="""
SELECT o_orderkey,
       m['status'][1] AS status_v,
       m['prio'][1]   AS prio_v,
       CAST(cardinality(m) AS INT) AS n_entries,
       array_to_string(map_keys(m), ',')   AS keys_csv,
       array_to_string(map_values(m), '|') AS vals_csv,
       list_contains(map_keys(m), 'cust') AS has_cust,
       CAST(cardinality(map_concat(m, MAP {'src': 'merge'})) AS INT) AS n_merged
FROM (
  SELECT o_orderkey,
         MAP {'status': o_orderstatus, 'prio': o_orderpriority,
              'cust': CAST(o_custkey AS VARCHAR)} AS m
  FROM orders WHERE o_orderkey < 2000
)
""",
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: construction (create_map), extraction (element_at),
    cardinality, key/value projection, membership, and map_concat — the
    data-model tier the array/struct slabs don't touch.  Map literals keep
    insertion order in BOTH engines, so the flattened key/value CSVs
    compare deterministically."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
        F.lit("cust"), F.col("o_custkey").cast("string"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("src"), F.lit("merge")))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.element_at(m, "prio").alias("prio_v"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), "|").alias("vals_csv"),
        F.map_contains_key(m, "cust").alias("has_cust"),
        F.size(merged).alias("n_merged"),
    )
