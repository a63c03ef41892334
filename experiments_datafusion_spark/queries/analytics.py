"""Warehouse-analytics and canonicalization operators (round 2 widening of
the dependency surface, SURVEY.md §2B: DataFusion 19 ships arg_max/arg_min,
grouping sets, window group-limits and bitwise scalar ops — Cargo.toml:10;
the rest are north-star training-data-pipeline patterns).

Scale notes (100 TB):
  * `agg_argmax` / `dedup_keep_best` use max_by/min_by — a partial+final
    aggregate with map-side combine (sort-based, since the struct tiebreak
    key is ordered not hashed), NOT a per-group window sort; this is the
    canonical "pick one representative row per key" pattern that scales
    where `row_number() = 1` windows shuffle every row;
  * `topk_per_group` intentionally IS the window form — Spark >= 3.5 plans
    a map-side WindowGroupLimit (rank pushdown, SPARK-37099), so each
    partition forwards at most k rows per group to the shuffle;
  * `win_sessionize` is the lag+cumsum sessionization idiom: one shuffle on
    user_id, everything after is within-partition — the batch twin of the
    streaming session_window (queries/events.py ev_session);
  * `rollup_time_multi` computes hour- and day-grain rollups in ONE scan
    via grouping sets (hypertable-style continuous-aggregate shape);
  * `docs_ngram_freq` keeps bigram construction inside codegen'd
    higher-order functions; the final top-20 is a TakeOrderedAndProject,
    never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.llm_text import _SQL_NORM, _SQL_WORDS

_SQL_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

SESSION_GAP_US = 1_800_000_000  # 30 minutes, in microseconds (exact integer)


@register(
    "agg_argmax",
    tags=("aggregate",),
    oracle="""
WITH lg AS (
  SELECT source, doc_id AS longest_doc FROM documents
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id DESC) = 1
),
sm AS (
  SELECT source, doc_id AS shortest_doc FROM documents
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) = 1
),
ag AS (
  SELECT source, count(*) AS n_docs, max(n_chars) AS max_chars,
         min(n_chars) AS min_chars
  FROM documents GROUP BY source
)
SELECT ag.source, n_docs, longest_doc, max_chars, shortest_doc, min_chars
FROM ag JOIN lg USING (source) JOIN sm USING (source)
ORDER BY source
""",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min aggregates (DataFusion 19 `arg_max`/`arg_min` →
    Spark `max_by`/`min_by`): per source, the longest and shortest document.
    Ties broken deterministically by ordering on a (n_chars, doc_id) struct
    — struct comparison is lexicographic in both engines' semantics, so the
    oracle's two-key window ORDER BY replays it exactly. One partial+final
    hash aggregate; no window, no second scan."""
    docs = table(spark, sf_dir, "documents")
    tie = F.struct(F.col("n_chars"), F.col("doc_id"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max_by("doc_id", tie).alias("longest_doc"),
            F.max("n_chars").alias("max_chars"),
            F.min_by("doc_id", tie).alias("shortest_doc"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("source")
    )


@register(
    "topk_per_group",
    tags=("window", "topk"),
    oracle="""
SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
       round(o_totalprice, 2) AS price
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_orderpriority, rn
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 most expensive orders per priority class.
    Spark >= 3.5 rewrites the `row_number() <= k` filter into a map-side
    WindowGroupLimit (SPARK-37099), so each input partition contributes at
    most k rows per group to the shuffle — the plan survives a 100× scale-up
    even with few groups."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "rn",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "dedup_keep_best",
    tags=("dedup", "pipeline"),
    oracle=f"""
WITH keyed AS (
  SELECT {_SQL_H64.format(x=_SQL_NORM.format(c="text"))} AS content_key,
         doc_id, n_chars
  FROM documents
),
rep AS (
  SELECT content_key, doc_id AS rep_doc FROM keyed
  QUALIFY row_number() OVER (PARTITION BY content_key
                             ORDER BY n_chars DESC, doc_id ASC) = 1
),
ag AS (
  SELECT content_key, count(*) AS n_copies, max(n_chars) AS rep_chars
  FROM keyed GROUP BY content_key
)
SELECT content_key, rep_doc, n_copies, rep_chars
FROM ag JOIN rep USING (content_key)
ORDER BY content_key
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization: exact-dup groups (on the normalized-text 60-bit
    hash, same md5 recipe as operators/text.hash64) keep ONE representative
    — the longest document, ties to the smallest doc_id. Implemented as a
    single max_by aggregate over the content key (partial+final hash agg;
    no window, no self-join), i.e. the curation step that turns "find the
    duplicates" into "emit the deduplicated corpus"."""
    docs = table(spark, sf_dir, "documents")
    key = T.hash64(T.normalized(F.col("text"))).alias("content_key")
    # max of (n_chars, -doc_id) = longest doc, ties -> smallest doc_id
    best = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    return (
        docs.groupBy(key)
        .agg(
            F.max_by("doc_id", best).alias("rep_doc"),
            F.count(F.lit(1)).alias("n_copies"),
            F.max("n_chars").alias("rep_chars"),
        )
        .orderBy("content_key")
    )


@register(
    "rollup_time_multi",
    tags=("aggregate", "events"),
    oracle="""
WITH ev AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         value
  FROM events
)
SELECT day, hour, count(*) AS n, round(sum(value), 2) AS sum_value,
       CAST(grouping(hour) AS INT) AS is_day_total
FROM ev
GROUP BY GROUPING SETS ((day), (day, hour))
ORDER BY day, is_day_total, hour
""",
)
def rollup_time_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour- AND day-grain
    counts/sums of the events stream computed in ONE scan via grouping sets
    (the batch shape of a continuous aggregate). At 100 TB this halves the
    scan cost vs two jobs, and both grains share one shuffle."""
    ev = table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "value",
    )
    return (
        ev.groupingSets([["day"], ["day", "hour"]], "day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.grouping("hour").cast("int").alias("is_day_total"),
        )
        .orderBy("day", "is_day_total", "hour")
    )


@register(
    "scalar_bitwise",
    tags=("scalar",),
    oracle="""
SELECT o_orderkey AS k,
       o_orderkey & 255                 AS k_and,
       o_orderkey | 4096                AS k_or,
       xor(o_orderkey, 23130)           AS k_xor,
       o_orderkey << 3                  AS k_shl,
       o_orderkey >> 2                  AS k_shr,
       CAST(bit_count(o_orderkey) AS INT) AS k_bits,
       ~o_orderkey                      AS k_not
FROM orders
WHERE o_orderkey % 13 = 0
ORDER BY k
""",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (DataFusion 19 `&`/`|`/`#`/`<<`/`>>` →
    Spark column ops): and/or/xor/shifts/popcount/complement over order
    keys. Pure codegen'd expressions; the filter pushes to the scan."""
    orders = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        orders.where(k % 13 == 0)
        .select(
            k.alias("k"),
            k.bitwiseAND(F.lit(255)).alias("k_and"),
            k.bitwiseOR(F.lit(4096)).alias("k_or"),
            k.bitwiseXOR(F.lit(23130)).alias("k_xor"),
            F.shiftleft(k, 3).alias("k_shl"),
            F.shiftright(k, 2).alias("k_shr"),
            F.bit_count(k).alias("k_bits"),
            F.bitwise_not(k).alias("k_not"),
        )
        .orderBy("k")
    )


@register(
    "docs_ngram_freq",
    tags=("text", "pipeline"),
    oracle=rf"""
WITH w AS (SELECT {_SQL_WORDS.format(c="lower(text)")} AS w FROM documents),
bi AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM w
)
SELECT bigram, count(*) AS n
FROM bi GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def docs_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency (text analysis): top-20 word bigrams.
    Bigrams are built with transform(sequence(...)) — codegen'd, O(words)
    per doc, no Python — and the global top-20 plans as
    TakeOrderedAndProject (per-partition heads, never a full sort)."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(T.words(F.lower(F.col("text"))).alias("w"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "win_sessionize",
    tags=("window", "events"),
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       round(sum(value), 2) AS sum_value
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via lag + running sum: a session breaks after
    30 minutes of per-user silence. The twin of ev_session's session_window,
    in the form that backfills historical data at scale: ONE shuffle on
    user_id, then both windows and the final rollup stay within partitions.
    Gap comparison is in exact integer microseconds on both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # unix_micros needs TIMESTAMP_LTZ; parquet may deliver ts as NTZ — the
    # session tz is pinned to UTC, so the cast is value-preserving.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    is_new = F.when(
        prev.isNull() | ((us(F.col("ts")) - us(prev)) > SESSION_GAP_US), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_s", is_new)
        .withColumn("session_seq", F.sum("new_s").over(w))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "embedding_norm_stats",
    tags=("similarity", "pipeline"),
    oracle="""
WITH nm AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT label, count(*) AS n,
       round(avg(nrm), 3) AS avg_norm,
       round(min(nrm), 4) AS min_norm,
       round(max(nrm), 4) AS max_norm
FROM nm GROUP BY label ORDER BY label
""",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: per-label L2-norm distribution (catches
    un-normalized or degenerate vectors before they poison cosine
    similarity). The norm is a codegen'd higher-order aggregate over the
    float array — float→double widening and left-to-right summation match
    DuckDB's list_sum bit-for-bit."""
    emb = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 3).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


BIN_15M_US = 900_000_000  # 15 minutes in microseconds
BIN_90M_US = 5_400_000_000  # 90 minutes (non-divisor-of-hour stride)


@register(
    "scalar_datebin",
    tags=("scalar", "events"),
    oracle=f"""
-- floor-to-bin via positive mod: DuckDB's // truncates toward zero, which
-- would diverge from date_bin semantics for pre-1970 (negative-epoch) rows
SELECT strftime(make_timestamp(epoch_us(ts)
                - ((epoch_us(ts) % {BIN_15M_US}) + {BIN_15M_US}) % {BIN_15M_US}),
                '%Y-%m-%d %H:%M:%S') AS bin_15m,
       strftime(make_timestamp(epoch_us(ts)
                - ((epoch_us(ts) % {BIN_90M_US}) + {BIN_90M_US}) % {BIN_90M_US}),
                '%Y-%m-%d %H:%M:%S') AS bin_90m,
       count(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def scalar_datebin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFusion 19 `date_bin` parity (Cargo.toml:10): arbitrary-stride
    timestamp binning (15m and a non-divisor 90m stride) as exact integer
    epoch-microsecond floor division — identical arithmetic in both
    engines, so bins agree bit-for-bit where date_trunc can't express the
    stride. Pure codegen'd expressions over one scan."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    def bin_to(stride_us: int):
        # exact integer floor division (`div` floors like DuckDB's `//` for
        # the pmod-adjusted value) — double division truncates toward zero
        # and diverges from the oracle on pre-1970 (negative-epoch) inputs
        return F.timestamp_micros(us - F.pmod(us, F.lit(stride_us)))
    return (
        ev.groupBy(
            F.date_format(bin_to(BIN_15M_US), "yyyy-MM-dd HH:mm:ss").alias("bin_15m"),
            F.date_format(bin_to(BIN_90M_US), "yyyy-MM-dd HH:mm:ss").alias("bin_90m"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_15m", "bin_90m")
    )


@register(
    "scalar_url",
    tags=("scalar", "pipeline"),
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           || '?lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https://([^/?#]+)', 1)      AS host,
       regexp_extract(url, 'https://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1)               AS query,
       regexp_extract(url, '[?&]lang=([^&]*)', 1)       AS lang_param,
       regexp_extract(url, 'https://[^.]*\\.([^/?#]+)', 1) AS domain
FROM u
ORDER BY doc_id
""",
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (Spark `parse_url`, a scalar DataFusion 19 lacks but web
    curation pipelines need for domain-level dedup/mixing): host, path,
    query string, one query param, and the registrable-domain suffix, over
    deterministically synthesized per-doc URLs. The oracle replays with
    regexp_extract; parse_url stays JVM-side."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract("url", r"https://[^.]*\.([^/?#]+)", 1).alias("domain"),
    ).orderBy("doc_id")


@register(
    "udf_map_in_arrow",
    tags=("udf",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS disc_price
FROM lineitem
WHERE l_quantity >= 45
ORDER BY l_orderkey, l_linenumber
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (the zero-copy UDF tier below mapInPandas: raw pyarrow
    RecordBatches, no pandas conversion): numpy-vectorized discounted
    price. Arrow batches stream through Python per partition — no collect,
    no per-row Python. The filter is applied BEFORE the Python boundary so
    the scan prunes and only surviving rows pay the Arrow hop."""
    import pyarrow as pa

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )

    def compute(batches):
        for batch in batches:
            import numpy as np

            ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            # half-AWAY rounding (SQL round semantics; np.round is
            # half-even and disagrees with the oracle on exact .xx5)
            disc = np.floor(ep * (1 - dc) * 100.0 + 0.5) / 100.0
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey").cast(pa.int64()),
                    # int32 in the parquet footer; the declared schema says
                    # long, and Spark trusts the declaration blindly
                    batch.column("l_linenumber").cast(pa.int64()),
                    pa.array(disc),
                ],
                names=["l_orderkey", "l_linenumber", "disc_price"],
            )

    out_schema = "l_orderkey long, l_linenumber long, disc_price double"
    return li.mapInArrow(compute, out_schema).orderBy("l_orderkey", "l_linenumber")


# Dialect-shared SQL (runs verbatim through BOTH spark.sql and DuckDB —
# the string itself is the oracle, like queries/sqlfrontend.py)
_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.price
FROM (SELECT DISTINCT o_custkey AS c_custkey FROM orders) c,
LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS price
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey
  LIMIT 2
) o
ORDER BY c.c_custkey, o.o_orderkey
"""


@register("sql_lateral_topk", tags=("sql", "subquery", "topk"), oracle=_LATERAL_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL-frontend path): each customer's 2
    most recent orders, deterministically tiebroken. Catalyst decorrelates
    the lateral into a per-key window — the text-SQL twin of
    topk_per_group's DSL form; the same SQL string runs verbatim on both
    engines."""
    from experiments_datafusion_spark.io import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_LATERAL_SQL)


_RANGE_TIME_SQL = """
SELECT event_id, user_id,
       count(*) OVER w AS n_last_hour,
       round(sum(value) OVER w, 2) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@register("win_range_time", tags=("window", "events"), oracle=_RANGE_TIME_SQL)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the rolling 1-hour event count
    and value sum ending at each event (the trailing-window metric shape).
    RANGE frames make timestamp PEERS share a frame, so results are
    deterministic under ts ties — no tiebreak column needed; one shuffle on
    user_id. Same SQL text runs on both engines."""
    from experiments_datafusion_spark.io import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RANGE_TIME_SQL)


_UNIGRAM_SQL = rf"""
WITH w AS (
  SELECT doc_id, unnest({_SQL_WORDS.format(c="lower(text)")}) AS term
  FROM documents
),
freq AS (SELECT term, count(*) AS n FROM w GROUP BY term),
tot AS (SELECT sum(n) AS t FROM freq),
sc AS (
  SELECT w.doc_id, count(*) AS n_tokens,
         avg(ln(freq.n * 1.0 / tot.t)) AS lp
  FROM w JOIN freq USING (term) CROSS JOIN tot
  GROUP BY w.doc_id
)
SELECT doc_id, n_tokens, round(lp, 4) AS avg_logprob
FROM sc ORDER BY doc_id
"""


@register("text_unigram_logprob", tags=("text", "pipeline"), oracle=_UNIGRAM_SQL)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (the KenLM-filter stand-in a pure-SQL
    pipeline can self-host): train a unigram LM on the corpus in one
    aggregate, then score each document by its mean word log-likelihood —
    gibberish and boilerplate surface as outliers. Plan shape at 100 TB:
    one explode + one groupBy builds the LM, the corpus-total is a 1-row
    broadcast cross join, and the score join shuffles on the word key
    (AQE's skew handling splits the stopword-heavy partitions)."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(T.words(F.lower(F.col("text")))).alias("term")
    )
    freq = w.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("t"))
    lp = F.ln(F.col("n") * 1.0 / F.col("t"))
    return (
        w.join(freq, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "scalar_binary_b64",
    tags=("scalar",),
    oracle="""
SELECT s_suppkey,
       base64(encode(s_name))                   AS name_b64,
       hex(encode(substr(s_name, 1, 4)))        AS name_hex,
       printf('%08d', s_suppkey)                AS key_padded,
       octet_length(encode(s_name))             AS name_bytes
FROM supplier
ORDER BY s_suppkey
""",
)
def scalar_binary_b64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding scalars (DataFusion 19 to_hex/encode surface +
    the hex crate the reference itself pulls, Cargo.toml:12): base64 and
    hex of UTF-8 bytes, printf-style zero padding, byte length. All
    codegen'd; the oracle mirrors with encode()/printf."""
    sup = table(spark, sf_dir, "supplier")
    name_bin = F.encode(F.col("s_name"), "UTF-8")
    return sup.select(
        "s_suppkey",
        F.base64(name_bin).alias("name_b64"),
        F.upper(F.hex(F.encode(F.substring("s_name", 1, 4), "UTF-8"))).alias("name_hex"),
        F.format_string("%08d", "s_suppkey").alias("key_padded"),
        F.octet_length(name_bin).alias("name_bytes"),
    ).orderBy("s_suppkey")


# ---- RFM customer segmentation ----------------------------------------------


@register(
    "rfm_segmentation",
    tags=("analytics", "window", "segmentation"),
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS t_ref FROM orders),
base AS (
  SELECT o_custkey AS custkey,
         CAST(date_diff('day', max(o_orderdate), any_value(t_ref)) AS BIGINT) AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_c
  FROM orders CROSS JOIN mx
  GROUP BY o_custkey
),
scored AS (
  SELECT *,
         ntile(4) OVER (ORDER BY recency_d ASC,  custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary_c DESC, custkey) AS m_score
  FROM base
)
SELECT custkey, recency_d, frequency, monetary_c,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
            WHEN r_score = 1 THEN 'recent'
            WHEN f_score = 1 THEN 'loyal'
            WHEN r_score = 4 AND f_score = 4 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic composite: per customer,
    Recency (days from last order to the corpus reference date),
    Frequency (order count) and Monetary (exact integer cents, the
    half-up floor recipe), each cut into quartiles with ntile(4) over a
    TOTAL order (metric, custkey — deterministic ties), then labeled.
    Quartile 1 is always the "best" end (most recent / most frequent /
    highest spend).

    Shape: one orders aggregate keyed by customer, the 1-row reference
    date as a broadcast cross join, then three single-partition window
    passes over the ~|customers| row table.  The single-partition ntile
    is the documented trade at this output size; a 100 TB run swaps it
    for the percentile-cut + broadcast-thresholds recipe
    (quality_gate_percentile) which scores without a global sort."""
    o = table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("t_ref"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.any_value("t_ref"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_d"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("monetary_c"),
        )
    )
    r_w = Window.orderBy(F.asc("recency_d"), "custkey")
    f_w = Window.orderBy(F.desc("frequency"), "custkey")
    m_w = Window.orderBy(F.desc("monetary_c"), "custkey")
    scored = base.select(
        "*",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
        .when(F.col("r_score") == 1, "recent")
        .when(F.col("f_score") == 1, "loyal")
        .when((F.col("r_score") == 4) & (F.col("f_score") == 4), "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "custkey", "recency_d", "frequency", "monetary_c",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )
