"""Iterative ML primitives over embedding columns — the algorithms an ANN/
IVF index actually trains with (SURVEY.md §2C Graph/analytics row's twin:
dedup_clusters iterates a graph; this iterates a geometry).

embedding_kmeans is Lloyd's algorithm, k=8, 2 centroid updates + final
assignment, expressed Spark-first:
  * assignment = a literal argmin expression over the (tiny, collected)
    codebook — the ONLY driver-side data movement is k x 64 floats per
    iteration, the documented codebook exception (operators/similarity.py
    topk_ivf does the same);
  * centroid update = one partial+final avg aggregate per dimension —
    a single shuffle per iteration, no all-pairs work;
  * at 100 TB the shape is unchanged: broadcast codebook, scan-side
    argmin, per-cluster avg; iterations are sequential jobs exactly like
    production k-means on Spark.

Cross-engine determinism: squared-L2 distances are rounded to 6dp BEFORE
the argmin (ties then break on the lower cluster id), and updated centroids
are rounded to 6dp per dimension — Spark's partial/final avg and DuckDB's
sequential avg differ in accumulation order, and quantizing both sides
keeps every assignment identical (same trick as _nearest_clusters,
operators/similarity.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register

K = 8
ITERS = 2  # centroid updates; assignments run ITERS + 1 times
DIM = 64


def _sql_sqdist(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({vec}, {cent}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        f"* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def _kmeans_oracle() -> str:
    """Unrolled Lloyd iterations as chained CTEs (same rounding recipe as
    the Spark side)."""
    ctes = [
        f"""emb AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cent
  FROM embeddings ORDER BY vec_id LIMIT {K}
)"""
    ]
    for it in range(ITERS + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT e.vec_id, c.cluster
  FROM emb e CROSS JOIN c{it} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY round({_sql_sqdist("e.embedding", "c.cent")}, 6) ASC, c.cluster ASC
  ) = 1
)"""
        )
        if it < ITERS:
            ctes.append(
                f"""d{it} AS (
  SELECT a.cluster, t.i, round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS v
  FROM a{it} a JOIN emb e USING (vec_id), UNNEST(range(1, {DIM + 1})) AS t(i)
  GROUP BY a.cluster, t.i
),
c{it + 1} AS (SELECT cluster, list(v ORDER BY i) AS cent FROM d{it} GROUP BY cluster)"""
            )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT cluster, count(*) AS n_members
FROM a{ITERS}
GROUP BY cluster
ORDER BY cluster
"""


def _argmin_cluster(vec, codebook: list[tuple[int, list[float]]]):
    """Nearest-centroid id by 6dp-rounded squared L2, ties to the lower
    cluster id (matches the oracle's ORDER BY dist, cluster)."""
    pairs = []
    for cid, cent in codebook:
        arr = F.array(*[F.lit(x) for x in cent])
        diff = F.zip_with(vec, arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c))
        d = F.round(F.aggregate(diff, F.lit(0.0), lambda a, x: a + x), 6)
        pairs.append(F.struct(d.alias("d"), F.lit(cid).alias("cluster")))
    best = F.array_min(F.array(*pairs))
    return best.getField("cluster")


@register("embedding_kmeans", tags=("ml", "similarity", "pipeline"), oracle=_kmeans_oracle())
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus (k=8, deterministic init
    from the 8 smallest vec_ids, 2 centroid updates + final assignment);
    reports final cluster sizes. The DuckDB oracle replays the identical
    unrolled iterations as chained CTEs — a differential test of an
    ITERATIVE algorithm, not just one dataflow."""
    emb = table(spark, sf_dir, "embeddings")

    init_rows = (
        emb.orderBy("vec_id")
        .limit(K)
        .select(F.transform("embedding", lambda x: F.round(x.cast("double"), 6)).alias("cent"))
        .collect()
    )
    codebook = [(i, [float(x) for x in r["cent"]]) for i, r in enumerate(init_rows)]

    for _ in range(ITERS):
        assigned = emb.select(
            "vec_id",
            "embedding",
            _argmin_cluster(F.col("embedding"), codebook).alias("cluster"),
        )
        dim_means = [
            F.round(F.avg(F.element_at("embedding", i + 1).cast("double")), 6).alias(f"c{i}")
            for i in range(DIM)
        ]
        rows = assigned.groupBy("cluster").agg(*dim_means).collect()
        codebook = [
            (int(r["cluster"]), [float(r[f"c{i}"]) for i in range(DIM)]) for r in rows
        ]
        codebook.sort()

    final = emb.select(
        _argmin_cluster(F.col("embedding"), codebook).alias("cluster")
    )
    return (
        final.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )
