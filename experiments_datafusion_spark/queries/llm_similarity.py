"""Similarity-search queries over the embeddings table. The brute-force
top-k is oracle-checked (double math, sequential accumulation, deterministic
tiebreaks); the LSH and IVF variants are the scale paths, validated by
recall tests against brute force (tests/test_llm_ops.py) and rows-only
checks in the driver."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import similarity as S
from experiments_datafusion_spark.queries import register

K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors


def _corpus_and_queries(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return emb, emb.where(F.col("vec_id") < N_QUERIES)


@register(
    "sim_topk_bruteforce",
    tags=("llm", "similarity"),
    oracle=f"""
WITH norms AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.embedding, c.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm) AS cos_raw
  FROM norms q JOIN norms c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
    row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= {K}
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 8 query vectors against the full corpus —
    broadcast queries x partitioned corpus, windowed rank."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_bruteforce(corpus, queries, K)


@register("sim_topk_lsh", tags=("llm", "similarity", "ann"))
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via 16-plane sign-LSH with 1-bit multiprobe. Rows-only for
    the driver; recall vs brute force asserted in tests."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_lsh(corpus, queries, K)


@register("sim_topk_ivf", tags=("llm", "similarity", "ann"))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF (10-cluster codebook, nprobe=3). Rows-only for the
    driver; recall asserted in tests."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_ivf(corpus, queries, K, nprobe=3)


@register(
    "sim_label_centroids",
    tags=("llm", "similarity"),
    oracle="""
SELECT label AS cluster,
  round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
  round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1,
  round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c2,
  count(*) AS n_members
FROM embeddings
GROUP BY label
""",
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook construction (first 3 centroid dims exposed for the oracle;
    full 64-dim codebook is what IVF uses)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.groupBy(F.col("label").alias("cluster")).agg(
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("c0"),
        F.round(F.avg(F.element_at("embedding", 2).cast("double")), 6).alias("c1"),
        F.round(F.avg(F.element_at("embedding", 3).cast("double")), 6).alias("c2"),
        F.count(F.lit(1)).alias("n_members"),
    )
