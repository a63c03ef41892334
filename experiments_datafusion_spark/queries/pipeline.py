"""Training-data curation operators — the day-to-day ops of a 100 TB
LLM-data pipeline that sit *around* dedup/similarity: deterministic
train/val/test splitting, stratified sampling, PII redaction, token
budgeting, corpus shape diagnostics (length histograms, heavy hitters,
vocabulary), per-group anomaly flagging, fuzzy (edit-distance) near-dup,
and embedding quantization.

Everything is JVM-side Column expressions (no Python UDFs) and every
operator has a DuckDB oracle built from the *same* constants (regexes,
hash recipe, thresholds), so the driver's value-hash gate can replay each
one bit-for-bit.

Scale notes (100 TB):
  * splits/samples are pushed-down scan filters keyed on the portable
    md5 hash (operators/text.py:hash64) — no shuffle, reproducible across
    engines/clusters, so eval sets never silently shift;
  * histograms/heavy-hitters are partial+final hash aggregations over
    low-cardinality keys; totals are 1-row broadcasts, never collects;
  * the fuzzy-dedup candidate join is bucketed (lang × length band), the
    same bounded-quadratic family as the LSH band joins — never all-pairs;
  * quantization is a pure element-wise map (wholestage codegen), the
    standard prelude to shipping int8 vectors to an ANN index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators.text import hash64, normalized, words
from experiments_datafusion_spark.queries import register

# same recipe as operators/text.py:hash64, inlined for oracle SQL
_SQL_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

# PII patterns — kept to RE2-and-Java-compatible syntax so Spark and DuckDB
# compile the identical automaton (no lookarounds, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


# --------------------------------------------------------------------------
# splits & samples
# --------------------------------------------------------------------------

@register(
    "split_train_test",
    tags=("pipeline", "sample"),
    oracle=f"""
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation' ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (SELECT {_SQL_H64.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS b, n_chars
      FROM documents)
GROUP BY 1
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test assignment by hash
    bucket of the document key. Because the bucket is a pure function of
    doc_id (portable md5 recipe), the split is identical on any engine,
    cluster size, or run — the property an eval set must have. At scale
    this is a scan-side filter/projection: zero shuffles before the final
    3-group rollup."""
    docs = table(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "sample_stratified",
    tags=("pipeline", "sample"),
    oracle=f"""
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN {_SQL_H64.format(x="CAST(doc_id AS VARCHAR)")} % 10 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(sum(CASE WHEN {_SQL_H64.format(x="CAST(doc_id AS VARCHAR)")} % 10 = 0
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS ratio
FROM documents
GROUP BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ~10% deterministic sample audit: per language stratum,
    how many documents the hash sampler keeps. One conditional aggregation
    — the sampler itself never shuffles, and the per-stratum ratio is the
    quantity a curation run monitors (is any stratum starved?)."""
    docs = table(spark, sf_dir, "documents")
    keep = (hash64(F.col("doc_id").cast("string")) % 10 == 0).cast("long")
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_sampled"),
            F.round(F.sum("keep") / F.count(F.lit(1)), 4).alias("ratio"),
        )
    )


# --------------------------------------------------------------------------
# PII redaction & token budgeting
# --------------------------------------------------------------------------

@register(
    "text_pii_redact",
    tags=("pipeline", "text"),
    oracle=f"""
WITH pii AS (
  SELECT doc_id,
         text || ' Contact: user' || doc_id || '@example.com from 10.'
              || (doc_id % 200) || '.' || (doc_id % 250) || '.7' AS t
  FROM documents
),
red1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g') AS t1
  FROM pii
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       right(regexp_replace(t1, '{IPV4_RE}', '[IP]', 'g'), 48) AS tail
FROM red1
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub emails then IPv4 addresses, reporting per-doc
    redaction counts and the redacted tail. The corpus is synthetic, so a
    deterministic PII suffix (derived from doc_id identically in both
    engines) is appended first — the op is then genuinely exercised on
    every row. Pure regexp Column expressions: at 100 TB this is an
    embarrassingly parallel map with no shuffle at all."""
    docs = table(spark, sf_dir, "documents")
    pii = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7"),
    )
    red1 = docs.select(
        "doc_id",
        F.regexp_count(pii, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_replace(pii, EMAIL_RE, "[EMAIL]").alias("t1"),
    )
    return red1.select(
        "doc_id",
        "n_emails",
        F.regexp_count(F.col("t1"), F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.right(F.regexp_replace(F.col("t1"), IPV4_RE, "[IP]"), F.lit(48)).alias("tail"),
    )


@register(
    "text_token_budget",
    tags=("pipeline", "text"),
    oracle=r"""
WITH per_src AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS tok_total,
         round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))), 2)
           AS tok_avg
  FROM documents GROUP BY source
)
SELECT source, n_docs, tok_total, tok_avg,
       CAST(sum(tok_total) OVER (ORDER BY source) AS BIGINT) AS cum_tokens
FROM per_src
""",
)
def text_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting per source: BPE-ish pre-token counts (the regex
    tokenizer from operators/text.py) aggregated per corpus source, plus a
    running cumulative token budget in source order — the number a data
    mix is planned against. The window runs over the already-aggregated
    per-source rows (a handful), so the unpartitioned ordering is on the
    tiny post-agg side, never the raw table."""
    from experiments_datafusion_spark.operators.text import bpe_token_count

    docs = spread(table(spark, sf_dir, "documents"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_token_count(F.col("text")).cast("long")).alias("tok_total"),
        F.round(F.avg(bpe_token_count(F.col("text"))), 2).alias("tok_avg"),
    )
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    return per_src.select(
        "source", "n_docs", "tok_total", "tok_avg",
        F.sum("tok_total").over(w).alias("cum_tokens"),
    )


# --------------------------------------------------------------------------
# corpus shape diagnostics
# --------------------------------------------------------------------------

@register(
    "docs_length_histogram",
    tags=("pipeline", "diagnostics"),
    oracle="""
WITH b AS (
  SELECT least(CAST(floor(n_chars / 100.0) AS BIGINT), 19) AS bin FROM documents
),
h AS (SELECT bin, count(*) AS n_docs FROM b GROUP BY bin),
t AS (SELECT count(*) AS n_total FROM documents)
SELECT bin, n_docs, round(n_docs * 1.0 / n_total, 4) AS pct
FROM h CROSS JOIN t
""",
)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram: fixed-width 100-char bins (clamped at
    2000+) with each bin's share of the corpus. Fixed bounds — not
    min/max-derived — so the histogram is comparable across corpus
    snapshots. The grand total joins in as a 1-row broadcast, not a
    window over a single partition."""
    docs = table(spark, sf_dir, "documents")
    bin_col = F.least(F.floor(F.col("n_chars") / 100.0), F.lit(19)).cast("long")
    hist = docs.groupBy(bin_col.alias("bin")).agg(F.count(F.lit(1)).alias("n_docs"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "bin", "n_docs", F.round(F.col("n_docs") / F.col("n_total"), 4).alias("pct")
    )


@register(
    "docs_heavy_hitters",
    tags=("pipeline", "diagnostics"),
    oracle="""
WITH g AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
t AS (SELECT count(*) AS n_total FROM documents)
SELECT lang, source, n, round(n * 1.0 / n_total, 6) AS share
FROM g CROSS JOIN t
ORDER BY n DESC, lang, source
LIMIT 10
""",
)
def docs_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnostic: the top (lang, source) strata by document
    count with corpus share — the skew report consulted before choosing
    partition keys. Deterministic tiebreak (lang, source) so the top-10
    boundary is stable for the oracle."""
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        g.crossJoin(F.broadcast(total))
        .select("lang", "source", "n", F.round(F.col("n") / F.col("n_total"), 6).alias("share"))
        .orderBy(F.col("n").desc(), "lang", "source")
        .limit(10)
    )


@register(
    "text_top_words",
    tags=("pipeline", "text"),
    oracle=r"""
SELECT term, count(*) AS n
FROM (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS term
  FROM documents
)
WHERE length(term) >= 4
GROUP BY term
ORDER BY n DESC, term
LIMIT 20
""",
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-20 whitespace terms (len >= 4) corpus-wide —
    the first cut of a tokenizer-training vocabulary scan. Explode + hash
    aggregate + TakeOrderedAndProject; the term key is high-cardinality so
    the aggregation parallelizes evenly."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(words(F.lower(F.col("text")))).alias("term"))
    return (
        toks.where(F.length("term") >= 4)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# anomaly flagging & fuzzy dedup
# --------------------------------------------------------------------------

@register(
    "anomaly_zscore",
    tags=("pipeline", "events"),
    oracle="""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_type,
         CASE WHEN s.sd > 0 THEN (e.value - s.mu) / s.sd END AS z
  FROM events e JOIN stats s USING (event_type)
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       round(max(abs(z)) + 0.0, 4) AS max_abs_z
FROM z GROUP BY event_type
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags over event values: compute each
    event_type's mean/stddev (tiny aggregate, broadcast back), flag
    |z| > 2.5, report counts and the worst offender. The stats side is a
    1-row-per-type broadcast join — the full table is scanned exactly
    once and never shuffled on a high-cardinality key."""
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.when(F.col("sd") > 0, (F.col("value") - F.col("mu")) / F.col("sd")).alias("z"),
    )
    return z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.abs("z") > 2.5, 1).otherwise(0)).cast("long").alias("n_anomalies"),
        F.round(F.max(F.abs("z")) + 0.0, 4).alias("max_abs_z"),
    )


@register(
    "dedup_fuzzy_levenshtein",
    tags=("pipeline", "dedup"),
    oracle="""
WITH norm AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 200.0) AS BIGINT) AS bkt,
         substr(trim(regexp_replace(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g'),
                                    '\\s+', ' ', 'g')), 1, 60) AS pfx
  FROM documents
)
SELECT a.doc_id AS x, b.doc_id AS y,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM norm a JOIN norm b
  ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 5
""",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance on the normalized 60-char
    prefix, candidate-bucketed by (lang, 200-char length band) — the
    bounded-quadratic candidate-join family (like the LSH band joins):
    per-bucket pair counts stay small, never corpus-wide all-pairs.
    Catches typo-level duplicates that shingle Jaccard under-weights on
    short texts. The band heuristic can miss a pair straddling a length
    boundary — standard recall trade, documented."""
    docs = table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 200.0).cast("long").alias("bkt"),
        F.substring(normalized(F.col("text")), 1, 60).alias("pfx"),
    )
    a, b = norm.alias("a"), norm.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.levenshtein(F.col("a.pfx"), F.col("b.pfx")) <= 5)
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# embedding quantization
# --------------------------------------------------------------------------

@register(
    "embedding_quantize",
    tags=("pipeline", "similarity"),
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) AS mx
  FROM e
)
SELECT vec_id,
       round(sqrt(list_sum(list_transform(emb, x -> x * x))), 4) AS l2,
       array_to_string(
         list_transform(emb[1:8],
                        x -> CAST(round(x * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0 END))
                                  AS BIGINT)), ',') AS q8
FROM s
""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings (scale = 127/max|x| per
    vector) plus the L2 norm — the standard prep for shipping vectors to a
    compact ANN index at 100 TB (4x smaller, SIMD-friendly). Pure
    element-wise higher-order functions, fully codegen'd, zero shuffle;
    only the first 8 quantized lanes are rendered for the oracle hash."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(e, F.abs))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    q8 = F.transform(
        F.slice(e, 1, 8), lambda x: F.round(x * scale).cast("long").cast("string")
    )
    return emb.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2"),
        F.concat_ws(",", q8).alias("q8"),
    )


# --------------------------------------------------------------------------
# repetition filtering, incremental dedup, source mixing, sharding
# --------------------------------------------------------------------------

_SQL_WORDS = "list_filter(string_split_regex({c}, '\\s+'), x -> x <> '')"


@register(
    "text_repetition",
    tags=("pipeline", "text", "quality"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_SQL_WORDS.format(c="text")} AS ws FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w WHERE len(ws) > 0),
wstat AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_words,
         CAST(max(cnt) AS BIGINT) AS top_cnt,
         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_words
  FROM (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2)
  GROUP BY 1
),
gr AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
),
gstat AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams
  FROM (SELECT doc_id, gram, count(*) AS cnt FROM gr GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.doc_id,
       s.n_words,
       round(CAST(s.top_cnt AS DOUBLE) / s.n_words, 4) AS top_word_frac,
       round(CAST(s.dup_words AS DOUBLE) / s.n_words, 4) AS dup_word_frac,
       round(CASE WHEN coalesce(g.n_grams, 0) > 0
                  THEN CAST(coalesce(g.dup_grams, 0) AS DOUBLE) / g.n_grams
                  ELSE 0.0 END, 4) AS dup_gram_frac,
       CASE WHEN round(CAST(s.top_cnt AS DOUBLE) / s.n_words, 4) <= 0.2
             AND round(CASE WHEN coalesce(g.n_grams, 0) > 0
                            THEN CAST(coalesce(g.dup_grams, 0) AS DOUBLE) / g.n_grams
                            ELSE 0.0 END, 4) <= 0.2
            THEN 1 ELSE 0 END AS keep
FROM wstat s LEFT JOIN gstat g ON s.doc_id = g.doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher/C4 family of rules,
    adapted to word granularity since the corpus has no line structure):
    per document, the fraction of words taken by the single most frequent
    word, the fraction of word occurrences that are repeats, and the
    fraction of 2-gram occurrences that are repeats; `keep` applies the
    classic <=0.2 thresholds on top-word and duplicate-2-gram fractions.

    Scale shape: explode -> partial+final hash aggregation keyed
    (doc_id, token), then a per-doc rollup — the canonical distributed
    word-count; both joins are co-partitioned on doc_id. All fractions are
    ratios of exact integers, so Spark and DuckDB produce bit-identical
    doubles."""
    docs = spread(table(spark, sf_dir, "documents"))
    w = words(F.col("text"))
    base = docs.select("doc_id", w.alias("ws")).where(F.size("ws") > 0)

    wstat = (
        base.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_words"),
        )
    )

    m = F.size("ws") - 1
    grams = F.zip_with(
        F.slice("ws", 1, m), F.slice("ws", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    gstat = (
        base.where(F.size("ws") >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_grams"),
        )
    )

    top_frac = F.round(F.col("top_cnt").cast("double") / F.col("n_words"), 4)
    dup_word_frac = F.round(F.col("dup_words").cast("double") / F.col("n_words"), 4)
    dup_gram_frac = F.round(
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.coalesce(F.col("dup_grams"), F.lit(0)).cast("double") / F.col("n_grams"),
        ).otherwise(0.0),
        4,
    )
    return (
        wstat.join(gstat, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            top_frac.alias("top_word_frac"),
            dup_word_frac.alias("dup_word_frac"),
            dup_gram_frac.alias("dup_gram_frac"),
            F.when((top_frac <= 0.2) & (dup_gram_frac <= 0.2), 1)
            .otherwise(0)
            .alias("keep"),
        )
    )


@register(
    "dedup_incremental",
    tags=("pipeline", "dedup"),
    oracle=f"""
WITH f AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g'),
                                 '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
seen AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 = 0),
batch AS (
  SELECT * FROM f
  WHERE doc_id % 5 <> 0
    AND NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = f.fp)
)
SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source, fp
FROM batch GROUP BY fp
""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-shard) exact dedup — THE shape a 100 TB ingest
    actually runs: a new batch of documents is deduplicated against the
    fingerprints of the already-ingested corpus (here: docs with
    doc_id % 5 = 0 play the historical corpus, the rest the new batch).

    Plan: fingerprint = md5(normalized text) on both sides (scan-side map),
    LEFT ANTI shuffle join batch-vs-seen on the fingerprint, then a
    min-struct groupBy keeps one representative per surviving fingerprint
    (no window sort). At scale the seen-set is far too big to broadcast —
    the hash-partitioned anti join is exactly what survives 1000
    executors, and the fingerprint store can be bucketed on fp so
    subsequent ingests co-locate for free."""
    docs = spread(table(spark, sf_dir, "documents"))
    f = docs.select(
        "doc_id", "source", F.md5(normalized(F.col("text"))).alias("fp")
    )
    seen = f.where(F.col("doc_id") % 5 == 0).select("fp")
    batch = f.where(F.col("doc_id") % 5 != 0)
    new = batch.join(seen, "fp", "left_anti")
    return (
        new.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "source")).alias("m"))
        .select(F.col("m.doc_id").alias("doc_id"), F.col("m.source").alias("source"), "fp")
    )


@register(
    "mix_temperature",
    tags=("pipeline", "sample"),
    oracle=f"""
WITH per_src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT round(sum(sqrt(n_docs)), 6) AS z, CAST(sum(n_docs) AS BIGINT) AS n_total FROM per_src),
r AS (
  SELECT source, n_docs,
         CAST(round(least(1.0, (sqrt(n_docs) / z) * (0.5 * n_total) / n_docs) * 10000, 0)
              AS BIGINT) AS bp_rate
  FROM per_src CROSS JOIN tot
)
SELECT r.source, r.n_docs, r.bp_rate,
       CAST(sum(CASE WHEN {_SQL_H64.format(x="'mix:' || CAST(d.doc_id AS VARCHAR)")} % 10000
                       < r.bp_rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents d JOIN r ON d.source = r.source
GROUP BY r.source, r.n_docs, r.bp_rate
""",
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LM sampling rule:
    weight each source by n^alpha with alpha = 0.5, normalize, aim at a 50%
    corpus budget). Emits, per source, the basis-point sampling rate the
    schedule implies and how many documents the deterministic hash sampler
    keeps at that rate — reproducible on any engine or cluster because the
    keep-decision is integer arithmetic on the portable md5 hash.

    The per-source weight table is a few rows: it cross-joins the 1-row
    total as a broadcast and joins back to documents as a broadcast — the
    only shuffle in the plan is the final per-source aggregation. The
    double-valued rate collapses to integer basis points in BOTH engines
    (same rounding), so the comparison never rides on float ulps."""
    docs = spread(table(spark, sf_dir, "documents"))
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(
        F.round(F.sum(F.sqrt(F.col("n_docs"))), 6).alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.sqrt(F.col("n_docs")) / F.col("z"))
        * (0.5 * F.col("n_total"))
        / F.col("n_docs"),
    )
    r = per_src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", F.round(rate * 10000, 0).cast("long").alias("bp_rate")
    )
    h = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 10000
    return (
        docs.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "bp_rate")
        .agg(F.sum(F.when(h < F.col("bp_rate"), 1).otherwise(0)).alias("n_sampled"))
    )


@register(
    "shard_assign",
    tags=("pipeline", "diagnostics"),
    oracle=f"""
WITH s AS (
  SELECT {_SQL_H64.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard,
         text
  FROM documents
),
per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
              AS BIGINT) AS tok_total
  FROM s GROUP BY shard
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per)
SELECT shard, n_docs, tok_total,
       round(n_docs * 16.0 / n_total, 4) AS balance
FROM per CROSS JOIN tot
""",
)
def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output sharding audit: hash-assign every document to one of 16
    output shards (pure function of doc_id — stable across runs and
    engines) and report per-shard document counts, token totals, and the
    balance factor (1.0 = perfectly even). This is the load-balance check
    run before writing N bucketed output files at 100 TB: a balance far
    from 1.0 means stragglers in the write stage. One partial+final
    aggregation on a 16-value key; the grand total re-enters as a 1-row
    broadcast."""
    from experiments_datafusion_spark.operators.text import bpe_token_count

    docs = spread(table(spark, sf_dir, "documents"))
    shard = hash64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 16
    per = docs.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_token_count(F.col("text")).cast("long")).alias("tok_total"),
    )
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "tok_total",
        F.round(F.col("n_docs") * 16.0 / F.col("n_total"), 4).alias("balance"),
    )


# llm_text loads before this module in _MODULES, so this import never
# perturbs registration order; its _sql_lang_id mirrors operators/text.py.
from experiments_datafusion_spark.queries.llm_text import _sql_lang_id


@register(
    "lang_confusion",
    tags=("pipeline", "text", "diagnostics"),
    oracle=f"""
SELECT lang, {_sql_lang_id()} AS pred_lang, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
""",
)
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix: cross-tabulates the
    corpus's `lang` metadata column against the stopword-voting language ID
    (operators/text.py:lang_id). The matrix is the first diagnostic a
    curation run checks when a language filter misbehaves — mislabeled
    metadata shows up as off-diagonal mass. One hash aggregation over a
    tiny (lang x pred) key space; the classifier itself is a codegen'd
    Column expression evaluated scan-side."""
    from experiments_datafusion_spark.operators import text as T

    docs = spread(table(spark, sf_dir, "documents"))
    return (
        docs.select(F.col("lang"), T.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
