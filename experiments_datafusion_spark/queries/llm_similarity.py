"""Similarity-search queries over the embeddings table. ALL three tiers are
oracle-checked — brute force directly, and the LSH / IVF scale paths via
DuckDB SQL *generated from the same constants* (hyperplanes, probe masks,
codebook recipe), so the driver replays the full ANN pipelines bit-for-bit
(the llm_dedup.py pattern). Recall vs brute force is additionally asserted
in tests/test_llm_ops.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import similarity as S
from experiments_datafusion_spark.queries import register

K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors
LSH_QUERY_PLANES = 4  # planes used by the top-k LSH query (matches topk_lsh default)
IVF_NPROBE = 3


def _corpus_and_queries(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return emb, emb.where(F.col("vec_id") < N_QUERIES)


# -- oracle SQL builders: DuckDB replicas of the plan, from the SAME constants


def _sql_dot(a: str, b: str) -> str:
    """Sequential-fold double dot product — matches operators/similarity.dot
    (list_sum and F.aggregate both fold left, verified by the brute-force
    oracle's hash match)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def _sql_plane_lit(plane: list[float]) -> str:
    # repr() emits the shortest round-tripping decimal; DuckDB parses it to
    # the identical IEEE double that F.lit ships to the JVM.
    return "[" + ", ".join(repr(w) for w in plane) + "]"


def _sql_lsh_bucket(n_planes: int) -> str:
    """Replica of operators/similarity.lsh_bucket: bit j = sign(v . plane_j)."""
    bits = [
        f"CASE WHEN {_sql_dot('embedding', _sql_plane_lit(plane))} > 0"
        f" THEN {1 << j} ELSE 0 END"
        for j, plane in enumerate(S.LSH_PLANES[:n_planes])
    ]
    return "(" + " + ".join(bits) + ")"


def _lsh_oracle() -> str:
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << j})" for j in range(LSH_QUERY_PLANES)]
    )
    return f"""
WITH norms AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
    {_sql_lsh_bucket(LSH_QUERY_PLANES)} AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
         unnest([{probes}]) AS probe
  FROM norms WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
    {_sql_dot('q.q_emb', 'c.embedding')} / (q.q_nrm * c.nrm) AS cos_raw
  FROM probes q JOIN norms c ON c.bucket = q.probe AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
    row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= {K}
"""


def _ivf_oracle() -> str:
    cent = ", ".join(
        f"avg(CAST(embedding[{i + 1}] AS DOUBLE))" for i in range(S.EMB_DIM)
    )
    return f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
cent AS (
  SELECT label AS cluster, [{cent}] AS centroid
  FROM embeddings GROUP BY label
),
qc AS (
  SELECT q.vec_id AS query_id, q.embedding AS q_emb, q.nrm AS q_nrm, cent.cluster,
    round({_sql_dot('q.embedding', 'cent.centroid')}
          / (q.nrm * sqrt(list_sum(list_transform(cent.centroid, x -> x * x)))), 6) AS cos_r
  FROM norms q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
),
sel AS (
  SELECT query_id, q_emb, q_nrm, cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, cluster DESC) AS cr
    FROM qc
  ) WHERE cr <= {IVF_NPROBE}
),
scored AS (
  SELECT s.query_id, c.vec_id AS neighbor_id,
    {_sql_dot('s.q_emb', 'c.embedding')} / (s.q_nrm * c.nrm) AS cos_raw
  FROM sel s JOIN norms c ON c.label = s.cluster AND c.vec_id <> s.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
    row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= {K}
"""


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


@register("sim_topk_lsh", tags=("llm", "similarity", "ann"), oracle=_lsh_oracle())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via 4-plane sign-LSH with 1-bit multiprobe. Fully
    oracle-checked: the DuckDB SQL is generated from the same hyperplane
    constants, so bucket assignment, probing, and candidate ranking replay
    identically. Recall vs brute force additionally asserted in tests."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_lsh(corpus, queries, K, n_planes=LSH_QUERY_PLANES)


@register("sim_topk_ivf", tags=("llm", "similarity", "ann"), oracle=_ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF (per-label codebook, nprobe=3). Fully
    oracle-checked: the oracle rebuilds the codebook with the same per-label
    mean recipe and replays cluster selection (6dp-quantized cosine, same
    tiebreak) and in-cluster ranking. Recall asserted in tests."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_ivf(corpus, queries, K, nprobe=IVF_NPROBE)


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


# --- product quantization tier (round 3) -----------------------------------


def _pq_ctes() -> str:
    """Shared CTE block rebuilding the PQ pipeline from the SAME constants:
    codebook from the first PQ_K corpus vectors (6dp), encode by (4dp
    sqdist, k) argmin, query ADC tables in integer micro-units — the sums
    are exact integer arithmetic in both engines."""
    m, sd, kc, sc = S.PQ_M, S.PQ_SUBDIM, S.PQ_K, S.PQ_SCALE
    sqd = (
        "list_sum(list_transform(list_zip(e.embedding[cb.m*{sd}+1 : cb.m*{sd}+{sd}], cb.cent), "
        "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"
    ).format(sd=sd)
    return f"""cb AS (
  SELECT t.m, CAST(e.vec_id AS INT) AS k,
         list_transform(e.embedding[t.m*{sd}+1 : t.m*{sd}+{sd}],
                        x -> round(CAST(x AS DOUBLE), 6)) AS cent
  FROM embeddings e, unnest(generate_series(0, {m - 1})) AS t(m)
  WHERE e.vec_id < {kc}
),
enc AS (
  SELECT e.vec_id, cb.m, cb.k, round({sqd}, 4) AS d4
  FROM embeddings e JOIN cb ON TRUE
),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d4, k) AS rn
    FROM enc) WHERE rn = 1
),
qtab AS (
  SELECT e.vec_id AS query_id, cb.m, cb.k AS code,
         CAST(round({sqd} * {sc}, 0) AS BIGINT) AS d_int
  FROM embeddings e JOIN cb ON TRUE
  WHERE e.vec_id < {N_QUERIES}
)"""


def _pq_oracle() -> str:
    sc = S.PQ_SCALE
    return f"""
WITH {_pq_ctes()},
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, sum(q.d_int) AS s
  FROM codes c JOIN qtab q ON q.m = c.m AND q.code = c.code
  WHERE c.vec_id <> q.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(s / {sc}.0, 6) AS adc_dist
FROM ranked WHERE rank <= {K}
"""


@register("sim_topk_pq", tags=("llm", "similarity", "ann"), oracle=_pq_oracle())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via product quantization (8 subspaces x 16 centroids,
    asymmetric-distance scan over 4-byte codes).  Fully oracle-checked:
    the DuckDB SQL rebuilds the codebook from the same first-16-vectors
    recipe and replays encode + integer ADC bit-for-bit.  Recall vs brute
    force asserted in tests/test_llm_ops.py."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_pq(corpus, queries, K)


# --- IVF-PQ composite tier (round 3) ---------------------------------------


def _ivfpq_oracle() -> str:
    """Coarse cluster selection (the _ivf_oracle recipe: per-label mean
    centroids, 6dp-quantized cosine, ties to the higher cluster) composed
    with the PQ CTEs: the ADC scan only sees codes whose cluster is among
    the query's nprobe selections."""
    sc = S.PQ_SCALE
    cent = ", ".join(
        f"avg(CAST(embedding[{i + 1}] AS DOUBLE))" for i in range(S.EMB_DIM)
    )
    return f"""
WITH {_pq_ctes()},
norms AS (
  SELECT vec_id, label, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
cent AS (
  SELECT label AS cluster, [{cent}] AS centroid
  FROM embeddings GROUP BY label
),
qc AS (
  SELECT q.vec_id AS query_id, cent.cluster,
    round({_sql_dot('q.embedding', 'cent.centroid')}
          / (q.nrm * sqrt(list_sum(list_transform(cent.centroid, x -> x * x)))), 6) AS cos_r
  FROM norms q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
),
sel AS (
  SELECT query_id, cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, cluster DESC) AS cr
    FROM qc
  ) WHERE cr <= {IVF_NPROBE}
),
codesc AS (
  SELECT c.vec_id, c.m, c.code, e.label AS cluster
  FROM codes c JOIN embeddings e USING (vec_id)
),
scored AS (
  SELECT s2.query_id, c.vec_id AS neighbor_id, sum(q.d_int) AS s
  FROM codesc c
  JOIN sel s2 ON s2.cluster = c.cluster
  JOIN qtab q ON q.query_id = s2.query_id AND q.m = c.m AND q.code = c.code
  WHERE c.vec_id <> s2.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(s / {sc}.0, 6) AS adc_dist
FROM ranked WHERE rank <= {K}
"""


@register("sim_topk_ivfpq", tags=("llm", "similarity", "ann"), oracle=_ivfpq_oracle())
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF-PQ — coarse cluster pruning over 4-byte PQ codes,
    the layout a 100 TB vector corpus ships (cluster-partitioned parquet of
    codes; partition pruning + compressed-domain scan).  Fully
    oracle-checked: cluster selection replays the IVF recipe, distances the
    integer-exact ADC recipe."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_ivfpq(corpus, queries, K, nprobe=IVF_NPROBE)


# --- trained-PQ tier (round 4: r3 VERDICT stretch #8) -----------------------


def _pq_trained_ctes() -> str:
    """Unrolled per-subspace Lloyd iterations as chained CTEs — the
    identical integer-grid recipe as operators/similarity.pq_train_codebook
    (2^-20 centroid grid, floor(d * 2^14) argmin, CASE // truncating
    division), with the subspace id as a plain column so only ITERATIONS
    unroll, not subspaces."""
    m, sd, kc, sc = S.PQ_M, S.PQ_SUBDIM, S.PQ_K, S.PQ_SCALE
    cu, du, it = S.PQ_CUNIT, S.PQ_DUNIT, S.PQ_ITERS
    sqd = (
        "list_sum(list_transform(list_zip(s.subvec, c.cent), "
        "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"
    )
    ctes = [f"""sub AS (
  SELECT e.vec_id, t.m, e.embedding[t.m*{sd}+1 : t.m*{sd}+{sd}] AS subvec
  FROM embeddings e, unnest(generate_series(0, {m - 1})) AS t(m)
),
trainsub AS (
  SELECT * FROM sub WHERE vec_id < {S.PQ_TRAIN_CAP}
),
cb0 AS (
  SELECT m, CAST(vec_id AS INT) AS k,
         list_transform(subvec,
           x -> CAST(floor(CAST(x AS DOUBLE) * {cu}) AS BIGINT) / {cu}.0) AS cent
  FROM trainsub WHERE vec_id < {kc}
)"""]
    for i in range(it):
        ctes.append(f"""a{i} AS (
  SELECT s.vec_id, s.m, c.k, s.subvec
  FROM trainsub s JOIN cb{i} c ON c.m = s.m
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
    ORDER BY CAST(floor({sqd} * {du}) AS BIGINT) ASC, c.k ASC) = 1
),
d{i} AS (
  SELECT a.m, a.k, t.i,
         CAST(sum(CAST(floor(CAST(a.subvec[t.i] AS DOUBLE) * {cu}) AS BIGINT)) AS BIGINT) AS s_u,
         count(*) AS cnt
  FROM a{i} a, unnest(range(1, {sd + 1})) AS t(i)
  GROUP BY a.m, a.k, t.i
),
cb{i + 1} AS (
  SELECT m, k,
         list((CASE WHEN s_u >= 0 THEN s_u // cnt
                    ELSE -((-s_u) // cnt) END) / {cu}.0 ORDER BY i) AS cent
  FROM d{i} GROUP BY m, k
)""")
    fin = f"cb{it}"
    ctes.append(f"""codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT s.vec_id, s.m, c.k,
           row_number() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY CAST(floor({sqd} * {du}) AS BIGINT) ASC, c.k ASC) AS rn
    FROM sub s JOIN {fin} c ON c.m = s.m) WHERE rn = 1
),
qtab AS (
  SELECT s.vec_id AS query_id, c.m, c.k AS code,
         CAST(floor({sqd} * {sc}) AS BIGINT) AS d_int
  FROM sub s JOIN {fin} c ON c.m = s.m
  WHERE s.vec_id < {N_QUERIES}
)""")
    return ",\n".join(ctes)


def _pq_trained_oracle() -> str:
    sc = S.PQ_SCALE
    return f"""
WITH {_pq_trained_ctes()},
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, sum(q.d_int) AS s
  FROM codes c JOIN qtab q ON q.m = c.m AND q.code = c.code
  WHERE c.vec_id <> q.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(s / {sc}.0, 6) AS adc_dist
FROM ranked WHERE rank <= {K}
"""


@register(
    "sim_topk_pq_trained", tags=("llm", "similarity", "ann"), oracle=_pq_trained_oracle()
)
def sim_topk_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via a TRAINED product quantizer: per-subspace Lloyd
    k-means (2 integer-grid iterations, the ml.py embedding_kmeans
    hardening) refines the seed codebook before encode + integer ADC —
    the production-faithful ANN tier (r3 VERDICT stretch #8).  The oracle
    replays codebook TRAINING, encode and the ADC scan as one chained-CTE
    program: a differential test of an iterative learned-index build, not
    just one dataflow.  Recall vs brute force asserted >= the untrained
    tier in tests/test_llm_ops.py."""
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    return S.topk_pq_trained(corpus, queries, K)
