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


# --- Bloom-filter semi-join prefilter (round 4) -----------------------------

_BLOOM_K = 3  # hash functions
_BLOOM_BITS_PER_KEY = 16  # sizing target: m ~ 16n -> fp ~ 0.5% at k=3
_BLOOM_MIN_MBITS = 1 << 14
_BLOOM_MAX_MBITS = 1 << 20  # 16k-long literal cap; past this, use the
                            # engine's native runtime bloom join instead


def _bloom_pos(key, i: int, mbits: int):
    """Bit position i for a join key: xxhash64 with the hash index as seed
    column.  NOT the portable md5 recipe — the oracle checks the JOIN
    RESULT (the prefilter is semantically invisible), so the hash never
    needs cross-engine replay and can use the fast native path (A/B at
    sf0.1: md5 positions cost 4.3s/query, xxhash64 0.5s)."""
    return F.pmod(F.xxhash64(key, F.lit(i)), F.lit(mbits))


def _bloom_build(build_keys, key_col: str) -> tuple[list[int], int]:
    """ONE Spark job builds the whole filter: collect the distinct bit
    positions at the MAXIMUM bitmap size (bounded by 2^20, never by build
    rows), size m from the position count (n_pos ~ k * n_keys), and fold
    positions mod m — consistent with hashing at m directly because every
    candidate m divides the maximum (p mod 2^20 mod m == p mod m for
    power-of-two m).  Returns (signed word list, mbits)."""
    pos_rows = (
        build_keys.select(
            F.explode(
                F.array(
                    *[
                        _bloom_pos(F.col(key_col), i, _BLOOM_MAX_MBITS)
                        for i in range(_BLOOM_K)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    n_keys_est = max(1, len(pos_rows) // _BLOOM_K)
    mbits = bloom_mbits(n_keys_est)
    words = [0] * (mbits // 64)
    for r in pos_rows:
        p = int(r["p"]) % mbits
        words[p // 64] |= 1 << (p % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words], mbits


def bloom_filter_probe(probe, probe_key: str, signed: list[int], mbits: int):
    """Probe-side membership test: 3 native hashes + 3 bit probes per row.
    Two measured pitfalls shape this code (A/B at sf0.1, 600k probe rows):
      * the bitmap rides in as a 1-ROW BROADCAST RELATION, not a literal —
        F.lit(an 8192-long list) pays ~4s of py4j marshalling PER PLAN
        BUILD, and F.array(8192 lits) additionally constructs the array
        per row; the broadcast relation costs neither (it is the
        ALLOW_SCALAR_BROADCAST pattern every corpus-stat key uses);
      * the bit test is (shiftright(word, p % 64) & 1) — NOT F.bit_get,
        whose column-position form drops out of codegen (6.1s vs 0.96s)."""
    spark = probe.sparkSession
    bm_df = spark.createDataFrame([(signed,)], "_bm array<bigint>")
    out = probe.crossJoin(F.broadcast(bm_df))
    cond = None
    for i in range(_BLOOM_K):
        out = out.withColumn(f"_p{i}", _bloom_pos(F.col(probe_key), i, mbits))
        out = out.withColumn(
            f"_w{i}",
            F.element_at("_bm", (F.floor(F.col(f"_p{i}") / 64) + 1).cast("int")),
        )
        hit = F.expr(f"(shiftright(_w{i}, CAST(_p{i} % 64 AS INT)) & 1) = 1")
        cond = hit if cond is None else (cond & hit)
    drop = (
        ["_bm"]
        + [f"_p{i}" for i in range(_BLOOM_K)]
        + [f"_w{i}" for i in range(_BLOOM_K)]
    )
    return out.where(cond).drop(*drop)


def bloom_mbits(n_keys: int) -> int:
    m = _BLOOM_MIN_MBITS
    while m < n_keys * _BLOOM_BITS_PER_KEY and m < _BLOOM_MAX_MBITS:
        m <<= 1
    return m


@register(
    "join_bloom_prefilter",
    tags=("join", "bloom", "scale"),
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join with an EXPLICIT Bloom-filter prefilter on the probe side
    — the canonical 100 TB shuffle-reduction pattern (runtime row-level
    filtering): size a Bloom filter from the (filtered) build side's key
    cardinality (16 bits/key, fp ~ 0.5% at k=3), broadcast it as a
    constant bitmap Literal, drop probe rows that cannot match BEFORE the
    join shuffle, then run the exact join.  Bloom filters have no false
    negatives, so the result is byte-identical to the plain join — which
    is exactly what the oracle checks (the oracle is the UNfiltered join:
    the prefilter must be semantically invisible).

    Scale: the bitmap is sized from a cheap distinct-count of build keys
    and the build-side scan aggregates DISTINCT BIT POSITIONS (bounded by
    m, never by build rows) before the driver sees anything; the probe
    test is 3 native xxhash64 + 3 bit probes per row inside whole-stage
    codegen.  At sf0.1 the filter passes ~11% of 600k probe rows
    (test-asserted) — the join shuffle moves ~9x less data.  Past the
    2^20-bit literal cap, switch to Spark's own JVM-side rewrite
    (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
    the explicit, oracle-checkable form of it."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    build = orders.where(F.col("o_orderpriority") == "1-URGENT")

    signed, mbits = _bloom_build(build, "o_orderkey")
    filtered = bloom_filter_probe(li, "l_orderkey", signed, mbits)

    return (
        filtered.join(build, filtered["l_orderkey"] == build["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("price_cents"),
        )
    )


# ---- grid-bucketed spatial radius join --------------------------------------

_GEO_CELL = 2000  # grid cell edge, milli-degrees == the query radius
_GEO_R2 = _GEO_CELL * _GEO_CELL  # squared radius (integer milli-deg^2)
_SQL_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "join_spatial_grid",
    tags=("join", "spatial"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         {_SQL_H64.format(x="'lat:' || CAST(c_custkey AS VARCHAR)")} % 180000 AS lat_u,
         {_SQL_H64.format(x="'lon:' || CAST(c_custkey AS VARCHAR)")} % 360000 AS lon_u
  FROM customer
),
pairs AS (
  SELECT a.c_custkey AS custkey,
         (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
         + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS d2
  FROM pts a JOIN pts b
    ON a.c_custkey <> b.c_custkey
   AND (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
       + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) <= {_GEO_R2}
)
SELECT custkey, CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(min(d2) AS BIGINT) AS min_d2
FROM pairs GROUP BY custkey
""",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join via GRID BUCKETING — the standard
    distributed spatial-join layout (geohash / S2-cell partitioning):
    every point lands in one radius-sized grid cell; a point's neighbors
    within r can only live in the 3x3 cell neighborhood, so candidates are
    generated by exploding each probe point into 9 cells and hash-joining
    on the cell id, then verified with an EXACT integer squared-distance
    test.  Coordinates are deterministic integer milli-degrees derived
    from the portable md5 hash of the customer key (planar metric, no
    wrap-around — documented simplification), so every distance is exact
    integer math: zero cross-engine float risk.

    Scale: the join is hash-partitioned on cell id — candidate volume is
    (9 x density x cell area) per point, NEVER all pairs; the oracle's
    theta self-join is the semantic spec, the grid rewrite is the 100 TB
    plan (cell-partitioned parquet layout + AQE skew handling for dense
    cells).  Each true pair is found exactly once (the neighbor's own
    cell appears once among the probe's 9)."""
    from experiments_datafusion_spark.operators import text as T

    cust = table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    pts = cust.select(
        "c_custkey",
        (T.hash64(F.concat(F.lit("lat:"), key)) % 180000).alias("lat_u"),
        (T.hash64(F.concat(F.lit("lon:"), key)) % 360000).alias("lon_u"),
    )
    build = pts.select(
        F.col("c_custkey").alias("b_key"),
        F.col("lat_u").alias("b_lat"),
        F.col("lon_u").alias("b_lon"),
        (F.col("lat_u") - F.col("lat_u") % _GEO_CELL).alias("cl"),
        (F.col("lon_u") - F.col("lon_u") % _GEO_CELL).alias("cm"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = pts.select(
        "c_custkey",
        "lat_u",
        "lon_u",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("lat_u") - F.col("lat_u") % _GEO_CELL
                         + dx * _GEO_CELL).alias("cl"),
                        (F.col("lon_u") - F.col("lon_u") % _GEO_CELL
                         + dy * _GEO_CELL).alias("cm"),
                    )
                    for dx, dy in offs
                ]
            )
        ).alias("cell"),
    ).select("c_custkey", "lat_u", "lon_u", "cell.cl", "cell.cm")
    d2 = (F.col("lat_u") - F.col("b_lat")) * (F.col("lat_u") - F.col("b_lat")) + (
        F.col("lon_u") - F.col("b_lon")
    ) * (F.col("lon_u") - F.col("b_lon"))
    return (
        probe.join(build, ["cl", "cm"])
        .where((F.col("c_custkey") != F.col("b_key")) & (d2 <= _GEO_R2))
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.min(d2).cast("long").alias("min_d2"),
        )
    )
