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
