"""Text-analysis queries over the documents table, oracle-checked: the
DuckDB SQL is GENERATED from the same constants (stopword lists, regexes,
hash recipe) the Spark expressions use, so both engines compute the same
deterministic function."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.queries import register

# SQL fragments mirroring operators/text.py (shared constants)
_SQL_WORDS = "list_filter(string_split_regex({c}, '\\s+'), w -> w <> '')"
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^A-Za-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_SQL_HASH64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _sql_stop_ratio(lang: str, c: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    w = _SQL_WORDS.format(c=c)
    return (
        f"CASE WHEN len({w}) > 0 THEN "
        f"CAST(len(list_filter({w}, x -> lower(x) IN ({lst}))) AS DOUBLE) / len({w}) "
        f"ELSE 0.0 END"
    )


def sql_quality(c: str = "text") -> str:
    """DuckDB replica of operators/text.py:quality_score (same constants,
    same rounding) — shared by text_quality and the hygiene quality gate."""
    punct = (
        f"(CAST(length({c}) - length(regexp_replace({c}, '{T.PUNCT}', '', 'g')) AS DOUBLE)"
        f" / length({c}))"
    )
    digit = (
        f"(CAST(length({c}) - length(regexp_replace({c}, '{T.DIGIT}', '', 'g')) AS DOUBLE)"
        f" / length({c}))"
    )
    w = _SQL_WORDS.format(c=c)
    stop = _sql_stop_ratio("en", c)
    return (
        f"round(0.4 * least(len({w}) / 100.0, 1.0)"
        f" + 0.4 * least({stop} * 5.0, 1.0)"
        f" + 0.2 * (1.0 - least({punct} * 5.0 + {digit} * 2.0, 1.0)), 6)"
    )


@register(
    "text_stats",
    tags=("llm", "text"),
    oracle=f"""
SELECT
  doc_id,
  len({_SQL_WORDS.format(c='text')})                          AS n_tokens,
  len(regexp_extract_all(text, '{T.BPE_TOKEN}'))              AS n_bpe_tokens,
  length(text)                                                AS n_chars_actual,
  n_chars                                                     AS n_chars_meta,
  round(CASE WHEN len({_SQL_WORDS.format(c='text')}) > 0 THEN
    CAST(list_sum(list_transform({_SQL_WORDS.format(c='text')}, x -> length(x))) AS DOUBLE)
      / len({_SQL_WORDS.format(c='text')}) ELSE 0.0 END, 6)   AS avg_word_len
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), char counts, average
    word length — all codegen'd Column expressions."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        T.char_count(F.col("text")).cast("bigint").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_meta"),
        F.round(T.avg_word_len(F.col("text")), 6).alias("avg_word_len"),
    )


@register(
    "text_quality",
    tags=("llm", "text"),
    oracle=f"""
SELECT
  doc_id,
  round(CAST(length(text) - length(regexp_replace(text, '{T.PUNCT}', '', 'g')) AS DOUBLE)
        / length(text), 6)                                    AS punct_ratio,
  round(CAST(length(text) - length(regexp_replace(text, '{T.DIGIT}', '', 'g')) AS DOUBLE)
        / length(text), 6)                                    AS digit_ratio,
  round({_sql_stop_ratio('en')}, 6)                           AS stop_ratio_en,
  round(0.4 * least(len({_SQL_WORDS.format(c='text')}) / 100.0, 1.0)
      + 0.4 * least({_sql_stop_ratio('en')} * 5.0, 1.0)
      + 0.2 * (1.0 - least(
          (CAST(length(text) - length(regexp_replace(text, '{T.PUNCT}', '', 'g')) AS DOUBLE)
            / length(text)) * 5.0
        + (CAST(length(text) - length(regexp_replace(text, '{T.DIGIT}', '', 'g')) AS DOUBLE)
            / length(text)) * 2.0, 1.0)), 6)                  AS quality
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation/digit/stopword ratios + composite score.

    spread() (round 13): the one-file fixture scan otherwise runs this
    regexp-heavy projection as a single task (A/B at sf0.1: 1.09 s ->
    0.86 s, outputs identical); same device as the other documents
    pipelines, no-op-cost at real scale where the scan is already wide."""
    d = spread(table(spark, sf_dir, "documents"))
    t = F.col("text")
    return d.select(
        "doc_id",
        F.round(T.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(T.digit_ratio(t), 6).alias("digit_ratio"),
        F.round(T.stopword_ratio(t, "en"), 6).alias("stop_ratio_en"),
        T.quality_score(t).alias("quality"),
    )


def _sql_lang_id() -> str:
    score_exprs = {lang: _sql_stop_ratio(lang) for lang in T.LANG_ORDER}
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    expr = "'und'"
    for lang in reversed(T.LANG_ORDER):
        s = score_exprs[lang]
        expr = f"CASE WHEN {s} > 0 AND {s} = {best} THEN '{lang}' ELSE {expr} END"
    return expr


@register(
    "text_langid",
    tags=("llm", "text"),
    oracle=f"""
SELECT
  doc_id,
  {_sql_lang_id()}                         AS pred_lang,
  round({_sql_stop_ratio('en')}, 6)        AS score_en,
  round({_sql_stop_ratio('de')}, 6)        AS score_de
FROM documents
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by function-word voting with deterministic tie-break
    ('und' when nothing matches)."""
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.lang_id(t).alias("pred_lang"),
        F.round(T.stopword_ratio(t, "en"), 6).alias("score_en"),
        F.round(T.stopword_ratio(t, "de"), 6).alias("score_de"),
    )


@register(
    "text_fingerprint",
    tags=("llm", "text"),
    oracle=f"""
SELECT
  doc_id,
  md5({_SQL_NORM.format(c='text')}) AS fp_md5,
  list_min(list_transform(
    list_distinct(list_transform(
      generate_series(1, greatest(len({_SQL_WORDS.format(c='text')}) - 2, 0)),
      i -> array_to_string(({_SQL_WORDS.format(c='text')})[i:i+2], ' '))),
    s -> {_SQL_HASH64.format(x='s')}))  AS fp_rolling
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text + rolling min-shingle
    hash (1-function MinHash) — both portable bit-for-bit to the oracle."""
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.fingerprint_md5(t).alias("fp_md5"),
        T.rolling_fingerprint(t).alias("fp_rolling"),
    )
