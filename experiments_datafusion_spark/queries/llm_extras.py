"""Second-wave LLM-pipeline operators: dedup cluster assignment (connected
components over the near-dup pair graph — the step that turns pairwise
similarity into keep/drop decisions) and TF-IDF term scoring.

The clustering oracle is a DuckDB RECURSIVE CTE over the same
shingle/jaccard constants as the Spark pipeline, so the iterative
distributed algorithm is checked against an independent fixed-point
formulation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators import dedup as D
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.operators.graph import connected_components
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.llm_dedup import _SQL_SHINGLE_CTE


@register(
    "dedup_clusters",
    tags=("llm", "dedup", "graph"),
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
pairs AS (SELECT x, y FROM jac WHERE jaccard_raw >= 0.5),
edges AS (SELECT x AS src, y AS dst FROM pairs UNION SELECT y, x FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, min(lbl) AS cluster FROM walk GROUP BY node
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment: connected components over the exact-Jaccard
    near-dup graph (threshold 0.5); cluster id = min doc_id in the
    component (the canonical keeper).  Spark runs iterative min-label
    propagation; the oracle reaches the same fixed point via a recursive
    CTE — two independent algorithms, one answer."""
    pairs = D.jaccard_pairs(table(spark, sf_dir, "documents"), 0.5).select("x", "y")
    return connected_components(pairs)


@register(
    "text_tfidf",
    tags=("llm", "text"),
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, round(score, 4) AS tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))).
    All JVM-side: explode -> two hash aggregations -> broadcast of the
    one-row corpus count -> per-doc window.  The df table is term-keyed
    (high cardinality, no skew) and the final window partitions by doc."""
    docs = table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("score", 4).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- substring-level exact-duplication detection (round 3) -----------------
#
# The word-shingle ops above catch document-level near-dups; training
# corpora ALSO need passage-level exact-dup detection (boilerplate headers,
# license blocks, templated spans — the Lee et al. "Deduplicating Training
# Data" substring regime).  Full suffix arrays don't fit the relational
# model, so the standard scalable approximation: stride-aligned fixed-width
# character windows, hashed, posting-list-joined.  Stride 16 over width 32
# guarantees any duplicated region >= 47 chars yields at least one aligned
# common window in both copies ONLY when copies are stride-aligned; the
# documented recall trade (halve the stride to raise recall) — exact full
# duplicates always match at every window.

SPAN_W = 32
SPAN_STRIDE = 16


@register(
    "text_dup_spans",
    tags=("llm", "dedup", "text"),
    oracle=f"""
WITH spans0 AS (
  SELECT DISTINCT doc_id, substring(text, p, {SPAN_W}) AS span
  FROM documents,
       unnest(generate_series(1, len(text) - {SPAN_W - 1}, {SPAN_STRIDE})) AS t(p)
  WHERE len(text) >= {SPAN_W}
),
spans AS (
  SELECT doc_id, CAST(('0x' || substr(md5(span), 1, 15)) AS BIGINT) AS s
  FROM spans0
),
posting AS (SELECT s, count(DISTINCT doc_id) AS nd FROM spans GROUP BY s),
per_doc AS (
  SELECT sp.doc_id,
         count(*) AS n_spans,
         CAST(sum(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM spans sp JOIN posting p USING (s)
  GROUP BY sp.doc_id
)
SELECT doc_id, n_spans, n_dup,
       round(n_dup * 1.0 / n_spans, 4) AS dup_frac
FROM per_doc WHERE n_dup > 0
""",
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction: stride-16 char-32 windows,
    portable-hashed, counted against a corpus-wide posting list.  Shape at
    100 TB: explode -> two hash aggregations -> one posting-list equi-join
    keyed by a 60-bit hash (high cardinality, no skew) — the same dataflow
    as the n-gram Jaccard join, never all-pairs."""
    docs = spread(table(spark, sf_dir, "documents"))
    text = F.col("text")
    positions = F.sequence(
        F.lit(1), F.length(text) - F.lit(SPAN_W - 1), F.lit(SPAN_STRIDE)
    )
    # explode the POSITIONS, not an array of substrings: substr/md5 then
    # run whole-stage-codegen'd per row, instead of interpreted inside a
    # higher-order transform() (measured 4.0s -> ~1s at sf0.1)
    spans = (
        docs.where(F.length(text) >= SPAN_W)
        .select("doc_id", "text", F.explode(positions).alias("p"))
        .select("doc_id", T.hash64(text.substr(F.col("p"), F.lit(SPAN_W))).alias("s"))
        .distinct()
    )
    posting = spans.groupBy("s").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        spans.join(posting, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per_doc.where(F.col("n_dup") > 0).select(
        "doc_id",
        "n_spans",
        "n_dup",
        F.round(F.col("n_dup") / F.col("n_spans"), 4).alias("dup_frac"),
    )
