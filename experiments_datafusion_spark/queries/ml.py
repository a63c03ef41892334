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

Cross-engine determinism (hardened round 4, closing the r2/r3 ADVICE item):
the loop contains NO round(double) anywhere, so there is no half-boundary
for accumulation-order noise to straddle — flips are impossible by
construction, not just improbable:
  * centroids live on the binary grid 2^-20: per-row units are
    floor(x * 2^20) (the product is EXACT — power-of-two scaling — and
    floor has no tie semantics), summed as integers, divided by the
    cluster count with truncating integer division ON THE DRIVER (Python
    bigints; the codebook is collected anyway), and re-materialized as
    q / 2^20 — an exactly-representable double;
  * assignment argmin compares floor(d * 2^14) as integers (d itself is
    bit-identical in both engines: float32 inputs, exact-double centroids,
    and F.aggregate / list_sum both fold left — proven by the brute-force
    oracle's hash match), ties to the lower cluster id.
A hypothesis property test (tests/test_exact.py) pins the
truncating-division replicas used on both sides."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.llm_dedup import _SQL_SHINGLE_CTE

K = 8
ITERS = 2  # centroid updates; assignments run ITERS + 1 times
DIM = 64
CUNIT = 1 << 20  # centroid binary grid (2^-20 ~ 1e-6 resolution)
DUNIT = 1 << 14  # argmin distance grid (2^-14 ~ 6e-5 resolution)


def _sql_sqdist(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({vec}, {cent}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        f"* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def _kmeans_oracle() -> str:
    """Unrolled Lloyd iterations as chained CTEs — the identical
    integer-grid recipe as the Spark side (see module docstring)."""
    ctes = [
        f"""emb AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {CUNIT}) AS BIGINT) / {CUNIT}.0
         ) AS cent
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
    ORDER BY CAST(floor({_sql_sqdist("e.embedding", "c.cent")} * {DUNIT}) AS BIGINT) ASC,
             c.cluster ASC
  ) = 1
)"""
        )
        if it < ITERS:
            ctes.append(
                f"""d{it} AS (
  SELECT a.cluster, t.i,
         CAST(sum(CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * {CUNIT}) AS BIGINT)) AS BIGINT) AS s_u,
         count(*) AS cnt
  FROM a{it} a JOIN emb e USING (vec_id), UNNEST(range(1, {DIM + 1})) AS t(i)
  GROUP BY a.cluster, t.i
),
c{it + 1} AS (
  SELECT cluster,
         list((CASE WHEN s_u >= 0 THEN s_u // cnt
                    ELSE -((-s_u) // cnt) END) / {CUNIT}.0 ORDER BY i) AS cent
  FROM d{it} GROUP BY cluster)"""
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
    """Nearest-centroid id by floor(d * 2^14)-quantized squared L2, ties
    to the lower cluster id (matches the oracle's ORDER BY).  floor of a
    bit-identical double has NO tie semantics to diverge on — unlike the
    round(d, 4) it replaced (see module docstring)."""
    pairs = []
    for cid, cent in codebook:
        arr = F.array(*[F.lit(x) for x in cent])
        diff = F.zip_with(vec, arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c))
        d = F.floor(F.aggregate(diff, F.lit(0.0), lambda a, x: a + x) * DUNIT).cast("long")
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

    import math

    init_rows = (
        emb.orderBy("vec_id").limit(K).select("embedding").collect()
    )
    codebook = [
        (i, [math.floor(float(x) * CUNIT) / CUNIT for x in r["embedding"]])
        for i, r in enumerate(init_rows)
    ]

    for _ in range(ITERS):
        assigned = emb.select(
            "vec_id",
            "embedding",
            _argmin_cluster(F.col("embedding"), codebook).alias("cluster"),
        )
        dim_sums = [
            F.sum(
                F.floor(F.element_at("embedding", i + 1).cast("double") * CUNIT)
                .cast("long")
            ).alias(f"s{i}")
            for i in range(DIM)
        ]
        rows = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("cnt"), *dim_sums).collect()
        # truncating integer division on Python bigints — exact at any
        # magnitude, and sign-matched to the oracle's CASE // formula
        def tdiv(s: int, n: int) -> int:
            return -((-s) // n) if s < 0 else s // n

        codebook = [
            (
                int(r["cluster"]),
                [tdiv(int(r[f"s{i}"]), int(r["cnt"])) / CUNIT for i in range(DIM)],
            )
            for r in rows
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


@register(
    "dedup_near_canonical",
    tags=("dedup", "graph", "pipeline"),
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
prs AS (SELECT x, y FROM jac WHERE jaccard_raw >= 0.5),
edges AS (SELECT x AS src, y AS dst FROM prs UNION SELECT y, x FROM prs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
cc AS (SELECT node AS doc_id, min(lbl) AS cluster FROM walk GROUP BY node),
membered AS (
  SELECT d.doc_id, d.n_chars, coalesce(cc.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN cc USING (doc_id)
),
kept AS (
  SELECT cluster, doc_id AS kept_doc FROM membered
  QUALIFY row_number() OVER (PARTITION BY cluster
                             ORDER BY n_chars DESC, doc_id ASC) = 1
)
SELECT m.cluster, k.kept_doc, count(*) AS cluster_size
FROM membered m JOIN kept k USING (cluster)
GROUP BY m.cluster, k.kept_doc
ORDER BY m.cluster
""",
)
def dedup_near_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup curation chain as ONE operator: exact-Jaccard
    pairs (threshold 0.5) -> connected components -> keep the LONGEST doc
    per cluster (ties to the smallest doc_id), singletons keep themselves.
    Emits the deduplicated corpus as (cluster, kept_doc, cluster_size).
    Composition of the bucketed posting-list join (no all-pairs), iterative
    min-label propagation, and a max_by aggregate — every stage shuffles on
    a key, nothing funnels."""
    from experiments_datafusion_spark.operators import dedup as D
    from experiments_datafusion_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, 0.5).select("x", "y")
    cc = connected_components(pairs)  # (doc_id, cluster = min id in component)
    membered = (
        docs.select("doc_id", "n_chars")
        .join(cc, "doc_id", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("doc_id")))
    )
    best = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    return (
        membered.groupBy("cluster")
        .agg(
            F.max_by("doc_id", best).alias("kept_doc"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .orderBy("cluster")
    )


# --- power-iteration PCA (round 4) ------------------------------------------

PCA_ITERS = 3
PCA_U = 1 << 20  # binary grid for the quantized vector/matrix products


def _pca_oracle() -> str:
    """Unrolled power iterations as chained CTEs — every cross-row
    reduction is an integer sum of per-row floor-quantized terms, so the
    oracle replays the Spark iteration exactly (integer addition is
    associative; there is no accumulation-order anywhere)."""
    U = PCA_U
    ctes = [
        f"y0 AS (SELECT list_transform(generate_series(1, {DIM}), i -> 0.015625) AS y)"
    ]
    for t in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""s{t} AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(list_zip(embedding, (SELECT y FROM y{t - 1})),
           p -> CAST(floor(CAST(p[1] AS DOUBLE) * p[2] * {U}) AS BIGINT))) AS s_u
  FROM embeddings
),
z{t} AS (
  SELECT t.j,
         CAST(sum(CAST(floor(CAST(embedding[t.j] AS DOUBLE)
                             * (s_u / {U}.0) * {U}) AS BIGINT)) AS BIGINT) AS z_u
  FROM s{t}, UNNEST(range(1, {DIM + 1})) AS t(j)
  GROUP BY t.j
),
sc{t} AS (SELECT max(abs(z_u)) AS scale FROM z{t}),
y{t} AS (
  SELECT list((CASE WHEN z_u >= 0 THEN (z_u * {U}) // scale
                    ELSE -(((-z_u) * {U}) // scale) END) / {U}.0
              ORDER BY j) AS y
  FROM z{t} CROSS JOIN sc{t}
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT t.j AS dim,
       CAST(CASE WHEN z_u >= 0 THEN (z_u * {U}) // scale
                 ELSE -(((-z_u) * {U}) // scale) END AS BIGINT) AS y_u
FROM z{PCA_ITERS} t CROSS JOIN sc{PCA_ITERS}
ORDER BY dim
"""


@register("embedding_pca_power", tags=("ml", "iterative"), oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER ITERATION
    (3 steps of y <- X^T X y, renormalized to max |component| = 1), the
    building block behind spectral embeddings / PCA whitening a curation
    stack runs before clustering.

    Same exactness construction as embedding_kmeans/graph_pagerank: both
    matrix products are integer sums of per-row floor(term * 2^20) values
    (floor of identical doubles; integer addition is associative), and the
    renormalization is an integer truncating division by the max |sum| —
    so every iteration is EXACT in both engines at any parallelism.
    Integer budget: |z_u * 2^20| <= rows * maxabs(x)^2 * DIM * 2^40 —
    ~5e16 here; a 1e9-row corpus would drop the grid to 2^12 (the same
    knob, coarser — convergence only needs ~3 significant digits).

    Scale shape per iteration: one broadcast-literal projection for s, one
    all-to-one 64-column integer aggregate (map-side combined), one 64-row
    collect — the codebook-size exception, like k-means."""
    emb = table(spark, sf_dir, "embeddings")
    y = [1.0 / 64.0] * DIM  # 0.015625: exactly representable
    z_u = None
    for _ in range(PCA_ITERS):
        ylit = F.array(*[F.lit(v) for v in y])
        terms = F.zip_with(
            "embedding",
            ylit,
            lambda x, yy: F.floor(x.cast("double") * yy * PCA_U).cast("long"),
        )
        s_u = F.aggregate(terms, F.lit(0).cast("long"), lambda a, b: a + b)
        with_s = emb.select(
            "embedding", (s_u.cast("double") / PCA_U).alias("s")
        )
        sums = [
            F.sum(
                F.floor(
                    F.element_at("embedding", j + 1).cast("double") * F.col("s") * PCA_U
                ).cast("long")
            ).alias(f"z{j}")
            for j in range(DIM)
        ]
        row = with_s.agg(*sums).collect()[0]
        z_u = [int(row[f"z{j}"]) for j in range(DIM)]
        scale = max(abs(v) for v in z_u)

        def tdiv(a: int, b: int) -> int:
            return -((-a) // b) if a < 0 else a // b

        yu = [tdiv(v * PCA_U, scale) for v in z_u]
        y = [u / PCA_U for u in yu]
    out = [(j + 1, int(tdiv(v * PCA_U, scale))) for j, v in enumerate(z_u)]
    return spark.createDataFrame(out, "dim bigint, y_u bigint").orderBy("dim")
