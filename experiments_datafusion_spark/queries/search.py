"""Retrieval-layer operators on top of the text suite: reciprocal-rank
fusion of multiple BM25 rankings (the standard way multi-query retrieval —
query rewrites, hybrid lexical+dense — combines ranked lists into one), and
frequent token-pair co-occurrence mining (association mining over the
document corpus, the market-basket shape).

Both are integer-exact end to end: RRF contributions are 1e6 div (k + rank)
integer divisions over deterministic (score desc, doc_id) rankings, and the
co-occurrence support/lift columns are pure counts and integer divisions —
nothing for cross-engine float accumulation to diverge on.

Scale notes are per-operator; the common theme is top-k via
TakeOrderedAndProject (never a global sort), broadcast of provably-small
sides only (query-term df rows, 1-row corpus stats), and a document-frequency
cap bounding the co-occurrence join fan-out.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.llm_extras import (
    _BM25_BASE_CTES,
    _BM25_K1,
    _BM25_B,
    _BM25_TERMS,
    _bm25_scored_ctes,
)

_RRF_K = 60  # the conventional RRF damping constant
_RRF_TOPN = 50  # fuse the top-50 of each ranking
_RRF_SCALE = 1_000_000  # contributions in integer micro-units
# second query variant: physical-operator vocabulary, disjoint from
# _BM25_TERMS' modelling vocabulary — two genuinely different lexical angles
_TERMS_B = ("join", "hash", "scan", "filter")

_PAIR_MIN_DF = 5  # drop ultra-rare terms (noise)
# df-cap: drop terms present in > 80% of docs (stop-word shaped; also THE
# scale knob — bounds every posting list and the per-doc pair fan-out)
_PAIR_MAX_DF_PCT = 80
_PAIR_MIN_SUPPORT_PCT = 60  # report pairs co-occurring in >= 60% of docs


def _ranked_sql(sfx: str) -> str:
    return f"""rank{sfx} AS (
  SELECT doc_id, rnk FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score_u DESC, doc_id) AS rnk
    FROM per_doc{sfx})
  WHERE rnk <= {_RRF_TOPN}
)"""


@register(
    "search_rrf_fusion",
    tags=("llm", "text", "search"),
    oracle=f"""
WITH {_BM25_BASE_CTES},
{_bm25_scored_ctes(_BM25_TERMS, "_a")},
{_bm25_scored_ctes(_TERMS_B, "_b")},
{_ranked_sql("_a")},
{_ranked_sql("_b")}
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CAST(coalesce({_RRF_SCALE} // ({_RRF_K} + a.rnk), 0)
            + coalesce({_RRF_SCALE} // ({_RRF_K} + b.rnk), 0) AS BIGINT) AS rrf_u,
       CAST((CASE WHEN a.rnk IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN b.rnk IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_lists
FROM rank_a a FULL JOIN rank_b b ON a.doc_id = b.doc_id
""",
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher RRF, k=60) of two
    BM25 rankings of the corpus — one per query-term set (a modelling
    vocabulary and a physical-operator vocabulary), the standard recipe for
    fusing multi-query / hybrid retrieval.  Each list contributes
    1e6 div (60 + rank) integer micro-units; docs in both lists sum.

    Shape — ONE pass over the token explode for BOTH rankings: because the
    two vocabularies are disjoint and a term's document frequency does not
    depend on which list it belongs to, per-doc length AND every query
    term's tf come out of a single doc_id-keyed conditional aggregation
    (map-side combined — the tokenize explode never shuffles), and that
    ~n_docs-row table feeds corpus stats, dfs and scoring.  The earlier
    two-pass form (shared subtree, one orderBy+limit per list, full-outer
    fusion join) re-ran the explode per ranking — same-window A/B at
    sf0.1: 2.5 s two-pass vs 2.1 s single-pass, and one fewer
    corpus-sized shuffle (the tf aggregate now rides the dl one).
    Ranking is a window over the per-list
    scored docs (rows = docs matching >= 1 term, not the corpus), and the
    fusion join collapses to a doc_id-keyed pivot over the two rank rows.
    Per-term scores are floor-quantized to integer micro-units before any
    cross-row sum, so nothing can diverge from the two-pass oracle."""
    docs = table(spark, sf_dir, "documents")
    all_terms = list(_BM25_TERMS) + list(_TERMS_B)
    lists = ["a"] * len(_BM25_TERMS) + ["b"] * len(_TERMS_B)
    toks = spread(docs).select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("term")
    )
    # one doc-keyed pass: dl + tf of each query term (conditional agg)
    wide = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(all_terms)
        ],
    ).localCheckpoint(eager=True)  # ~n_docs rows; 3 consumers below
    corpus = wide.agg(F.sum("dl").alias("total_dl"), F.count(F.lit(1)).alias("n_docs"))
    long = wide.select(
        "doc_id",
        "dl",
        F.posexplode(F.array(*[F.col(f"tf_{i}") for i in range(len(all_terms))])).alias(
            "ti", "tf"
        ),
    ).where(F.col("tf") > 0)
    dfreq = long.groupBy("ti").agg(F.count(F.lit(1)).alias("df"))
    lst_map = spark.createDataFrame(
        [(i, lists[i]) for i in range(len(all_terms))], "ti int, lst string"
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    s = (
        idf
        * (F.col("tf") * (_BM25_K1 + 1))
        / (F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl))
    )
    per = (
        long.join(F.broadcast(dfreq), "ti")
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(lst_map), "ti")
        .select("lst", "doc_id", F.floor(s * 1_000_000).cast("long").alias("s_u"))
        .groupBy("lst", "doc_id")
        .agg(F.sum("s_u").alias("score_u"))
    )
    w = Window.partitionBy("lst").orderBy(F.desc("score_u"), "doc_id")
    rnk = per.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= _RRF_TOPN)
    fused = rnk.groupBy("doc_id").agg(
        F.max(F.when(F.col("lst") == "a", F.col("rnk"))).alias("rnk_a"),
        F.max(F.when(F.col("lst") == "b", F.col("rnk"))).alias("rnk_b"),
    )
    contrib_a = F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rnk_a)")
    contrib_b = F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rnk_b)")
    return fused.select(
        "doc_id",
        (F.coalesce(contrib_a, F.lit(0)) + F.coalesce(contrib_b, F.lit(0)))
        .cast("long")
        .alias("rrf_u"),
        (
            F.col("rnk_a").isNotNull().cast("int")
            + F.col("rnk_b").isNotNull().cast("int")
        )
        .cast("long")
        .alias("n_lists"),
    )


@register(
    "freq_token_pairs",
    tags=("llm", "text", "analytics"),
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS term
  FROM documents
),
stats AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
d AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
kept AS (
  SELECT t.doc_id, t.term, d.df
  FROM toks t JOIN d USING (term) CROSS JOIN stats s
  WHERE d.df >= {_PAIR_MIN_DF} AND d.df * 100 <= s.n_docs * {_PAIR_MAX_DF_PCT}
),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         any_value(a.df) AS df_a, any_value(b.df) AS df_b,
         count(*) AS support
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT term_a, term_b,
       CAST(support AS BIGINT) AS support,
       CAST(support * 1000 // s.n_docs AS BIGINT) AS support_milli,
       CAST(support * s.n_docs * 1000000 // (df_a * df_b) AS BIGINT) AS lift_micro
FROM pairs CROSS JOIN stats s
WHERE support * 100 >= s.n_docs * {_PAIR_MIN_SUPPORT_PCT}
""",
)
def freq_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent token-pair co-occurrence mining (the A-priori first pass /
    market-basket shape): distinct (doc, term) pairs, document-frequency
    cap, per-document pair expansion via a doc-keyed self-join, then
    support counting with relative-threshold filtering plus integer lift
    (support * n_docs / (df_a * df_b), micro-units).

    Scale: the df-cap is the load-bearing knob — dropping terms in > 80% of
    docs (stop-word shaped) bounds both posting-list length and the O(k^2)
    per-doc pair fan-out of the self-join, exactly the hot-shingle cap the
    jaccard posting-list join documents.  The pair join itself is
    hash-partitioned on doc_id (co-located, no broadcast of the big side);
    only the 1-row n_docs stats relation broadcasts.  Document frequency is
    a window count over partitionBy(term) on the distinct (doc, term) rows
    (round 13) — this removed the vocab-sized dfreq broadcast the old form
    built, at the cost of shuffling the posting list by the Zipfian term
    key BEFORE the df-cap applies: a stop-word term's full posting list
    lands in one WindowExec group (bounded by n_docs rows of (doc_id, term)
    — distinct per doc — and spills rather than OOMs, but serially).  The
    r14 skew probe (OPTIMIZATION_r14.md: one synthetic term in every doc)
    measures that trade directly; a two-level (term, salt) pre-aggregate +
    term-keyed join is the §2.3 escape hatch if a real corpus ever makes
    the window group the wall.  All thresholds are relative to corpus
    size, so the same constants hold at any scale factor."""
    docs = table(spark, sf_dir, "documents")
    # three consumers (corpus stats, df table, the kept posting list) would
    # each re-scan and re-explode the corpus; materialize the distinct
    # (doc, term) relation once
    toks = spread(docs).select(
        "doc_id", F.explode(F.array_distinct(T.words(F.col("text")))).alias("term")
    ).localCheckpoint(eager=True)
    stats = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    # Document frequency as a window COUNT over hash(term) (round 13): on
    # the distinct (doc, term) posting rows, count(*) over (partition by
    # term) IS df — replaces the dfreq aggregate + broadcast join-back
    # (which at 100 TB built a vocab-sized broadcast).  Interleaved A/B at
    # sf0.1, 5 rounds: join form 0.96-1.09 s, window form 0.87-1.02 s;
    # rows identical.
    kept = (
        toks.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .where(
            (F.col("df") >= _PAIR_MIN_DF)
            & (F.col("df") * 100 <= F.col("n_docs") * _PAIR_MAX_DF_PCT)
        )
        .select("doc_id", "term", "df")
    )
    a = kept.select(
        F.col("doc_id"), F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    b = kept.select(
        F.col("doc_id"), F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.any_value("df_a").alias("df_a"),
            F.any_value("df_b").alias("df_b"),
            F.count(F.lit(1)).alias("support"),
        )
    )
    n_docs = F.col("n_docs")
    return (
        pairs.crossJoin(F.broadcast(stats))
        .where(F.col("support") * 100 >= n_docs * _PAIR_MIN_SUPPORT_PCT)
        .select(
            "term_a",
            "term_b",
            F.col("support").cast("long").alias("support"),
            F.expr("(support * 1000) div n_docs").cast("long").alias("support_milli"),
            F.expr("(support * n_docs * 1000000) div (df_a * df_b)")
            .cast("long")
            .alias("lift_micro"),
        )
    )
