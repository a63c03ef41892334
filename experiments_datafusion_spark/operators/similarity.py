"""Similarity search over embedding columns (array<float>) — north-star
extension (SURVEY.md §2B last row).

Three tiers, same result contract (query_id, neighbor_id, cosine):
  * brute-force cosine top-k — the exactness baseline; all math in double
    with sequential accumulation so a DuckDB oracle matches bit-for-bit;
  * sign-random-projection LSH — bucketed candidate join; sub-linear
    candidate sets at scale, recall measured against brute force in tests;
  * IVF — coarse quantizer (per-label centroids as the trained codebook),
    nprobe-cluster search; the classic billion-scale ANN layout.

Scale notes: query side is always broadcast (q << corpus); the corpus scan
stays partitioned; no driver-side collect of vectors anywhere except the
tiny centroid codebook.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

EMB_DIM = 64
N_PLANES = 16  # LSH hyperplanes -> 16-bit bucket ids
_rng = random.Random(7)
# deterministic hyperplanes, generated once (would be shipped as a small
# broadcast artifact in production)
LSH_PLANES: list[list[float]] = [
    [_rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)] for _ in range(N_PLANES)
]


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (zip_with + aggregate) —
    same accumulation order as the oracle's list_sum(list_transform(...))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dotd(a: Column, b: Column) -> Column:
    """dot() for arrays ALREADY cast to double (see _with_norm).  Identical
    IEEE result — casting each element once per vector then multiplying is
    the same double as casting per pair — but ~30% cheaper in pair joins:
    higher-order functions evaluate interpreted (not codegen), so dropping
    2 cast nodes per element per pair is a real constant-factor win on the
    O(candidates) verify loops (measured 3.55s -> 2.50s on
    dedup_embedding_lsh at sf0.1)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Replace `vec` with its double-cast form and attach its L2 norm —
    one cast pass per VECTOR here buys cast-free dotd() per PAIR later."""
    d = df.withColumn(vec, _as_double(F.col(vec)))
    return d.withColumn("nrm", F.sqrt(dotd(F.col(vec), F.col(vec))))


def cosine_pairs(df: DataFrame, threshold: float, id_col: str = "vec_id") -> DataFrame:
    """All-pairs cosine >= threshold (exact; quadratic by design — the
    baseline the LSH variants are validated against)."""
    n = _with_norm(df)
    a, b = n.alias("a"), n.alias("b")
    cos = dotd(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .where(cos >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("x"),
            F.col(f"b.{id_col}").alias("y"),
            F.round(cos, 4).alias("cosine"),
        )
    )


def topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k neighbors per query vector: broadcast the (small) query
    set against the partitioned corpus, rank per query with a deterministic
    tiebreak on neighbor id.

    Round 14: one spark.sql() program over views of the norm-attached
    sides (same tree, one analysis pass).  The SQL higher-order functions
    are the literal dialect twins of dotd()/_with_norm() — aggregate /
    zip_with with the identical lambdas, so the sequential double
    accumulation is bit-for-bit the same."""
    spark = corpus.sparkSession
    _with_norm(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col("embedding").alias("c_emb"), "nrm"
    ).createOrReplaceTempView("bf_corpus_v")
    _with_norm(queries).select(
        F.col(id_col).alias("query_id"), F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    ).createOrReplaceTempView("bf_queries_v")
    dot = ("aggregate(zip_with(q_emb, c_emb, (x, y) -> x * y),"
           " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    return spark.sql(f"""
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(cos_raw, 4) AS cosine
FROM (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM (
    SELECT /*+ BROADCAST(q) */ q.query_id, c.neighbor_id,
           {dot} / (q.q_nrm * c.nrm) AS cos_raw
    FROM bf_corpus_v c CROSS JOIN bf_queries_v q
    WHERE q.query_id != c.neighbor_id
  )
)
WHERE rank <= {k}
""")


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    pool: int,
    lam: float = 0.7,
    id_col: str = "vec_id",
) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein 1998 —
    the diversity-aware top-k every RAG retrieval stack runs after its
    ANN stage): retrieve a candidate ``pool`` per query (exact cosine
    here — the recall baseline; IVF/LSH feed the pool at corpus scale),
    then greedily select k docs maximizing

        lam * sim(q, d)  -  (1 - lam) * max_{s in selected} sim(d, s)

    i.e. each pick trades query relevance against redundancy with what's
    already selected.  Dataflow: the pool retrieval is the usual
    broadcast-queries-vs-partitioned-corpus rank; the pairwise penalty
    matrix is pool^2 rows PER QUERY (co-keyed on query_id — never an
    all-corpus pair join); the greedy loop is k chained small joins over
    those checkpointed pools, each iteration one anti-join + one
    max-aggregate + one windowed argmax.  Cost after retrieval is
    O(queries * pool^2), INDEPENDENT of corpus size — the property that
    lets the re-rank run as a per-query postprocess at 100 TB.  All
    similarities are quantized to 6dp before any argmax (ties broken by
    doc id), so selection is engine-stable and the DuckDB oracle replays
    the greedy walk exactly."""
    c = _with_norm(corpus).select(
        F.col(id_col).alias("doc_id"), F.col("embedding").alias("c_emb"), "nrm"
    )
    q = _with_norm(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    simq = F.round(
        dotd(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("simq").desc(), F.col("doc_id"))
    cand_full = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id", simq.alias("simq"), "c_emb", "nrm")
        .withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= pool)
    )
    a, b = cand_full.alias("a"), cand_full.alias("b")
    s = F.round(
        dotd(F.col("a.c_emb"), F.col("b.c_emb")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    # pool^2 rows per query; computed ONCE, reused by every greedy step
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            s.alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    cand = cand_full.select("query_id", "doc_id", "simq").localCheckpoint(eager=True)
    w1 = Window.partitionBy("query_id").orderBy(F.col("simq").desc(), F.col("doc_id"))
    selected = (
        cand.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("query_id", "doc_id", "simq", F.lit(1).cast("bigint").alias("rank"))
    )
    for i in range(2, k + 1):
        pen = (
            pairs.join(
                selected.select("query_id", F.col("doc_id").alias("d2")),
                ["query_id", "d2"],
            )
            .groupBy("query_id", F.col("d1").alias("doc_id"))
            .agg(F.max("s").alias("maxs"))
        )
        rem = cand.join(selected.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        score = F.round(
            # round the penalty coefficient exactly as the oracle spells it
            # (ADVICE r11: F.lit(1 - 0.7) is 0.30000000000000004 while the
            # SQL literal is 0.3 — a 4e-17 drift that can flip the 6dp
            # score quantization at a half boundary)
            F.lit(lam) * F.col("simq")
            - F.lit(round(1 - lam, 10)) * F.coalesce(F.col("maxs"), F.lit(0.0)),
            6,
        )
        wi = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
        pick = (
            rem.join(pen, ["query_id", "doc_id"], "left_outer")
            .select("query_id", "doc_id", "simq", score.alias("score"))
            .withColumn("rn", F.row_number().over(wi))
            .where(F.col("rn") == 1)
            .select(
                "query_id", "doc_id", "simq", F.lit(i).cast("bigint").alias("rank")
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select("query_id", "rank", "doc_id", "simq")


def _proj(vec: Column, plane: list[float]) -> Column:
    """v . plane as an UNROLLED left-associated sum chain — bit-identical to
    the sequential HOF/list_sum accumulation (same order), but flat
    expressions stay inside whole-stage codegen while higher-order functions
    evaluate interpreted (bucketing alone cost 0.55 s at sf0.1 as HOFs)."""
    expr = F.lit(0.0)
    for i, w in enumerate(plane):
        expr = expr + F.element_at(vec, i + 1).cast("double") * F.lit(w)
    return expr


def lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-random-projection bucket id: bit j = sign(v . plane_j).
    n_planes tunes bucket count to corpus size: ~log2(corpus/target_bucket)
    planes; 16 at billion scale, 4 for the 500-2000-vector test corpus
    (uniformly random vectors are the ANN worst case — bucket collision
    probability for a true neighbor falls with every plane)."""
    bucket = F.lit(0)
    for j, plane in enumerate(LSH_PLANES[:n_planes]):
        proj = _proj(vec, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_table_buckets(vec: Column, planes_per_table: int, n_tables: int) -> Column:
    """Array of bucket ids, one per LSH table (OR-construction): table j
    uses its own disjoint plane slice LSH_PLANES[j*m:(j+1)*m].  AND within a
    table (all m bits must match) controls precision; OR across tables
    controls recall — the standard (m, L) LSH trade (MMDS ch.3)."""
    m = planes_per_table
    assert m * n_tables <= len(LSH_PLANES), "not enough precomputed planes"
    buckets = []
    for j in range(n_tables):
        bucket = F.lit(0)
        for i, plane in enumerate(LSH_PLANES[j * m : (j + 1) * m]):
            proj = _proj(vec, plane)
            bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        buckets.append(bucket)
    return F.array(*buckets)


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float,
    planes_per_table: int = 2,
    n_tables: int = 6,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs via LSH buckets + exact in-bucket verify —
    the scale path (the quadratic `cosine_pairs` is the recall oracle in
    tests).  Candidates come from a bucket self-join per table (posexplode,
    one pass), verified with exact cosine only for candidate pairs.

    (m=2, L=6) reaches recall 1.0 on the uniformly-random test embeddings
    (measured; random vectors are the ANN worst case).  At billion scale the
    knobs shift toward m≈16 so buckets stay small; the plan shape — shuffle
    on (table, bucket), verify ∝ in-bucket pairs — is unchanged.

    Round-3 rework (VERDICT r2 "what's wrong" #1) — the whole op is a
    two-stage Arrow pipeline:
      1. bucket assignment: one numpy matmul (n x dim @ dim x m*L) per Arrow
         batch in mapInPandas, emitting (vec_id, emb, tbl, bucket) rows.
         Measured alternatives at sf0.1: interpreted HOF projections 0.55 s;
         a 768-node unrolled codegen expression 2.0 s (expression-tree
         pathology); this matmul is sub-millisecond.
      2. in-bucket verify: each (table, bucket) group ships its vectors ONCE
         into applyInPandas and verifies with a single BLAS gram-matrix
         multiply.  The old candidate self-JOIN shipped both vectors per
         candidate pair through an interpreted HOF dot (2.46 s; a pandas_udf
         over joined pairs was WORSE, 5.4 s — ~10^6 x 2 x 64 floats of Arrow
         transfer dominates).  Data movement is O(corpus x tables x dim),
         never O(candidate pairs x dim).
    Matching pairs (tiny after thresholding) dedupe across tables with one
    distinct.  At scale, bucket size is capped by the (m, L) choice, so each
    group's matmul stays small while buckets parallelize across executors.

    Numeric note: matmul accumulation order differs from the oracle's
    sequential list_sum by ~1 ulp.  The emitted cosine is rounded to 4dp
    (absorbs it); a sign flip in bucketing would need |v . plane| < ~1e-12
    (P ~ 1e-13 per projection, none on any fixture — differential tests at
    all three SFs prove the replayed-banding oracle still matches)."""
    m, L = planes_per_table, n_tables
    assert m * L <= len(LSH_PLANES), "not enough precomputed planes"
    planes = [list(p) for p in LSH_PLANES[: m * L]]

    def _assign_buckets(batches):
        import numpy as np
        import pandas as pd

        P = np.array(planes, dtype=np.float64)  # (m*L, dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["emb"].to_numpy()).astype(np.float64, copy=False)
            bits = (M @ P.T) > 0  # (n, m*L)
            weights = 1 << np.arange(m)
            buckets = np.stack(
                [bits[:, j * m : (j + 1) * m] @ weights for j in range(L)], axis=1
            )  # (n, L)
            out = pdf.loc[np.repeat(pdf.index, L)].reset_index(drop=True)
            out["tbl"] = np.tile(np.arange(L, dtype=np.int32), len(pdf))
            out["bucket"] = buckets.reshape(-1).astype(np.int32)
            yield out

    tables = df.select(
        F.col(id_col).alias("vec_id"), F.col("embedding").alias("emb")
    ).mapInPandas(
        _assign_buckets, "vec_id bigint, emb array<float>, tbl int, bucket int"
    )

    def _verify_bucket(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"x": [], "y": [], "cosine": []}).astype(
                {"x": "int64", "y": "int64", "cosine": "float64"}
            )
        M = np.vstack(pdf["emb"].to_numpy()).astype(np.float64, copy=False)
        nrm = np.sqrt(np.einsum("ij,ij->i", M, M))
        cos = (M @ M.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        c = cos[iu, ju]
        keep = c >= threshold
        xi, yi = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "x": np.minimum(xi, yi),
                "y": np.maximum(xi, yi),
                "cosine": np.round(c[keep], 4),
            }
        )

    pairs = tables.groupBy("tbl", "bucket").applyInPandas(
        _verify_bucket, "x bigint, y bigint, cosine double"
    )
    # identical pair from different tables -> bit-identical cosine (same
    # deterministic numpy computation on the same rows), so distinct on all
    # three columns is exact
    return pairs.select("x", "y", "cosine").distinct()


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k: join query and corpus on the LSH bucket (plus 1-bit
    multiprobe neighbors of the query bucket for recall), then exact-rank
    only the candidates. Candidate set is ~corpus/2^16 per probe at scale."""
    c = _with_norm(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "nrm",
        lsh_bucket(F.col("embedding"), n_planes).alias("bucket"),
    )
    q = _with_norm(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        lsh_bucket(F.col("embedding"), n_planes).alias("qb"),
    )
    # multiprobe: exact bucket + each 1-bit flip
    probes = F.array(F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
    q = q.withColumn("probe", F.explode(probes))
    cos = dotd(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("nrm"))
    scored = (
        c.join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_raw", 4).alias("cosine"),
        )
    )


def ivf_centroids(corpus: DataFrame, label_col: str = "label") -> DataFrame:
    """Coarse codebook: per-label mean vector (the 'trained' quantizer —
    deterministic here; k-means offline in production). Tiny: one row per
    cluster, always broadcast."""
    dim_means = [
        F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"c{i}")
        for i in range(EMB_DIM)
    ]
    agg = corpus.groupBy(F.col(label_col).alias("cluster")).agg(*dim_means)
    return agg.select(
        "cluster", F.array(*[F.col(f"c{i}") for i in range(EMB_DIM)]).alias("centroid")
    )


def _nearest_clusters(vec: Column, centroids: list[tuple[int, list[float]]], nprobe: int):
    """Literal argmin over the (tiny) codebook — returns array of the
    nprobe nearest cluster ids by cosine.  The query-to-centroid cosine is
    rounded to 6dp BEFORE ranking: the DuckDB oracle recomputes centroids
    with its own avg() (different accumulation order -> last-bit drift), and
    quantizing both sides keeps the selected cluster set identical.  Ties
    break on the higher cluster id in both engines (array_sort asc then
    reverse == ORDER BY cos DESC, cluster DESC)."""
    import math

    def cos_to(c):
        arr = F.array(*[F.lit(x) for x in c])
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return F.round(
            F.aggregate(
                F.zip_with(vec, arr, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / (F.sqrt(F.aggregate(F.zip_with(vec, vec, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda a, x: a + x)) * F.lit(cn)),
            6,
        )

    pairs = F.array(
        *[F.struct(cos_to(c).alias("cos"), F.lit(cid).alias("cluster")) for cid, c in centroids]
    )
    best = F.slice(F.reverse(F.array_sort(pairs)), 1, nprobe)
    return F.transform(best, lambda s: s.getField("cluster"))


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 3,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF search: corpus pre-assigned to its cluster (the label); each
    query searches only its nprobe nearest clusters. The inverted-file
    layout at scale = corpus parquet partitioned by cluster id -> partition
    pruning does the candidate cut for free."""
    codebook = [
        (int(r["cluster"]), [float(x) for x in r["centroid"]])
        for r in ivf_centroids(corpus, label_col).collect()
    ]
    c = _with_norm(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "nrm",
        F.col(label_col).alias("cluster"),
    )
    q = _with_norm(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.explode(_nearest_clusters(F.col("embedding"), codebook, nprobe)).alias("cluster"),
    )
    cos = dotd(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("nrm"))
    scored = (
        c.join(F.broadcast(q), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_raw", 4).alias("cosine"),
        )
    )


# --- product quantization (round 3) ----------------------------------------

PQ_M = 8  # subspaces
PQ_SUBDIM = EMB_DIM // PQ_M  # dims per subspace
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_SCALE = 1_000_000  # micro-unit quantization: integer ADC sums are exact


def _pq_sqdist(sub: Column, cent: Column) -> Column:
    """Squared L2 between an 8-dim float subvector and a double centroid,
    written as an EXPLICIT left-associated sum — same accumulation order as
    the oracle's sequential list_sum fold, but whole-stage-codegen'd (no
    interpreted higher-order functions in the encode loop, the
    dedup_embedding_lsh lesson from VERDICT r2)."""
    terms = [
        (F.element_at(sub, j + 1).cast("double") - F.element_at(cent, j + 1)) ** 2
        for j in range(PQ_SUBDIM)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _pq_sqdist_sql(sub: str, cent: str) -> str:
    """SQL fragment replica of _pq_sqdist: same left-associated 8-term sum,
    same power(x, 2) (Column.__pow__ lowers to the same Pow expression),
    same single-side DOUBLE cast, element_at 1-based in both APIs."""
    terms = [
        f"power(CAST(element_at({sub}, {j + 1}) AS DOUBLE)"
        f" - element_at({cent}, {j + 1}), 2)"
        for j in range(PQ_SUBDIM)
    ]
    return " + ".join(terms)


def _pq_encode_agg_seed() -> str:
    """Seed-tier argmin distance: round(d, 4) — pq_encode's contract."""
    return f"round({_pq_sqdist_sql('s.subvec', 'cb.cent')}, 4)"


def _pq_encode_agg_floor() -> str:
    """Trained-tier argmin distance: floor(d * 2^14) as BIGINT —
    _pq_floor_argmin's tie-free integer grid."""
    return (
        f"CAST(floor(({_pq_sqdist_sql('s.subvec', 'cb.cent')})"
        f" * {PQ_DUNIT}) AS BIGINT)"
    )


def _pq_scan_sql(id_col: str, k: int, d_expr: str) -> str:
    """One-analysis-pass SQL for subspace split -> argmin encode -> ADC
    broadcast join -> integer sum -> windowed top-k, over the
    pq_corpus_v / pq_cb_v / pq_qtab_v temp views (round 14 — replaces the
    per-op DataFrame chain; expression-identical, proven row-identical)."""
    slices = ", ".join(
        f"slice(embedding, {m * PQ_SUBDIM + 1}, {PQ_SUBDIM})" for m in range(PQ_M)
    )
    return f"""
WITH sub AS (
  SELECT {id_col} AS vid, posexplode(array({slices})) AS (m, subvec)
  FROM pq_corpus_v
),
codes AS (
  SELECT vid, m, mn.k AS code FROM (
    SELECT /*+ BROADCAST(cb) */ s.vid, s.m,
           min(named_struct('d', {d_expr}, 'k', cb.k)) AS mn
    FROM sub s JOIN pq_cb_v cb ON s.m = cb.m
    GROUP BY s.vid, s.m)
),
scored AS (
  SELECT /*+ BROADCAST(q) */ q.query_id, c.vid AS neighbor_id, sum(q.d_int) AS s
  FROM codes c JOIN pq_qtab_v q ON c.m = q.m AND c.code = q.code
  WHERE c.vid != q.query_id
  GROUP BY q.query_id, c.vid
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(s / {PQ_SCALE}, 6) AS adc_dist
FROM (SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s ASC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def _pq_subspaces(df: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """(id, embedding) -> (out_id, m, subvec): one row per subspace."""
    slices = F.array(
        *[F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)]
    )
    return df.select(
        F.col(id_col).alias(out_id), F.posexplode(slices).alias("m", "subvec")
    )


def pq_codebook(corpus: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Deterministic, oracle-replayable codebook: centroid (m, k) is
    subspace m of the vector with id k (k < PQ_K), components rounded to
    6dp doubles.  Production would refine these with the embedding_kmeans
    Lloyd loop (queries/ml.py) — the init is kept closed-form here so the
    DuckDB oracle can rebuild it from the same parquet."""
    seeds = _pq_subspaces(corpus.where(F.col(id_col) < PQ_K), id_col, "k")
    return seeds.select(
        "m",
        F.col("k").cast("int").alias("k"),
        F.transform("subvec", lambda x: F.round(x.cast("double"), 6)).alias("cent"),
    )


def _round_half_up(x: float, dp: int) -> float:
    """Driver-side bit-exact replica of Spark's ``F.round(double, dp)``:
    Spark routes doubles through BigDecimal.valueOf (Double.toString —
    the SHORTEST decimal representation) then setScale(dp, HALF_UP);
    Python's repr(float) is the same shortest representation, so
    Decimal(repr(x)) + ROUND_HALF_UP reproduces it exactly.  Asserted
    bit-for-bit against the Spark path in tests/test_llm_ops.py."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _pq_local_setup(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id"
) -> tuple[list[tuple], list[tuple]]:
    """ONE tiny collect each for the PQ_K seed vectors and the query side
    (both are the documented broadcast-small exceptions, like topk_ivf's
    coarse centroids), then the codebook AND every query's 128-entry ADC
    distance table are computed driver-side in pure Python — bit-exact
    replicas of the F.round/left-associated-sum semantics, asserted
    against the Spark expressions in tests/test_llm_ops.py.  This folds
    what used to be four setup jobs (codebook collect + re-scan of the
    query embeddings + two broadcast-exchange builds over non-local
    subtrees) into two sub-second local collects: the r3 VERDICT perf ask
    for sim_topk_pq.  Returns (codebook_rows, qtab_rows)."""
    both = (
        corpus.where(F.col(id_col) < PQ_K)
        .select(F.lit(0).alias("side"), F.col(id_col).alias("k"), "embedding")
        .unionByName(
            queries.select(F.lit(1).alias("side"), F.col(id_col).alias("k"), "embedding")
        )
        .collect()  # one narrow union job instead of two collects
    )
    seed_rows = [r for r in both if r["side"] == 0]
    q_rows = [r for r in both if r["side"] == 1]
    codebook: list[tuple] = []
    cent: dict[tuple[int, int], list[float]] = {}
    for r in seed_rows:
        k = int(r["k"])
        emb = [float(x) for x in r["embedding"]]
        for m in range(PQ_M):
            c = [_round_half_up(v, 6) for v in emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]]
            cent[(m, k)] = c
            codebook.append((m, k, c))
    qtab: list[tuple] = []
    for r in q_rows:
        qid = int(r["k"])
        emb = [float(x) for x in r["embedding"]]
        for m in range(PQ_M):
            sub = emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            for k in range(PQ_K):
                c = cent[(m, k)]
                # left-associated accumulation — same order as _pq_sqdist
                # (Spark codegen) and the oracle's sequential list_sum fold
                d = (sub[0] - c[0]) ** 2
                for j in range(1, PQ_SUBDIM):
                    d = d + (sub[j] - c[j]) ** 2
                qtab.append((qid, m, k, int(_round_half_up(d * PQ_SCALE, 0))))
    return codebook, qtab


def _pq_local_dfs(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """_pq_local_setup materialized as two LOCAL relations: broadcasting
    them costs no scan jobs (the exchange reads driver-local rows)."""
    cb_rows, qtab_rows = _pq_local_setup(corpus, queries, id_col)
    spark = corpus.sparkSession
    codebook = spark.createDataFrame(cb_rows, "m int, k int, cent array<double>")
    qtab = spark.createDataFrame(
        qtab_rows, "query_id bigint, m int, code int, d_int bigint"
    )
    return codebook, qtab


def pq_encode(corpus: DataFrame, codebook: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Corpus -> 4-bit-per-subspace codes: broadcast the 128-row codebook,
    equi-join on the subspace id, argmin by (4dp distance, k) via a
    lexicographic struct-min aggregate (deterministic ties, one shuffle
    keyed by (vector, subspace))."""
    sub = _pq_subspaces(corpus, id_col, "vid")
    d = _pq_sqdist(F.col("subvec"), F.col("cent"))
    return (
        sub.join(F.broadcast(codebook), "m")
        .groupBy("vid", "m")
        .agg(
            F.min(F.struct(F.round(d, 4).alias("d"), F.col("k").alias("k"))).alias("mn")
        )
        .select("vid", "m", F.col("mn.k").alias("code"))
    )


def topk_pq(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """ANN top-k by asymmetric-distance (ADC) product quantization: the
    corpus is scanned as 8x4-bit codes; each query precomputes a 128-entry
    distance table; the scan is a broadcast hash join on (subspace, code)
    followed by an integer sum — never touches raw corpus vectors.

    Determinism: table entries are quantized to integer micro-units
    (round(d * 1e6)), so the 8-term ADC sum is EXACT integer arithmetic —
    no cross-engine accumulation-order risk at all (stronger than the
    rounding recipe the other ANN tiers need).

    Scale shape: codes are 4 bytes/vector (16x compression of a 64-dim
    float vector); encode is one broadcast join + one keyed aggregate; the
    ADC scan is linear in |corpus| x |queries| over compressed codes with
    a 128-distinct-key hash join — the standard IVF-less PQ layout (pair
    with topk_ivf's cluster pruning for IVF-PQ at 100 TB).  Setup is ONE
    driver-local collect (seeds + query panel in a single union job); the
    codebook and ADC tables are computed driver-side (_pq_local_setup) and
    broadcast as local relations, so no Spark-side setup subtrees remain.
    NOTE an A/B finding (BENCH_NOTES.md round 4): embedding the codebook /
    ADC tables as literal expressions instead of broadcast relations is
    7-10x SLOWER and can OOM the driver — 4k-node literal trees break
    whole-stage codegen (janino's quadratic local-variable maps) and pay
    Catalyst re-optimization per run.  Broadcast-join the small side; do
    not literal-fuse it.

    Round 14: encode + ADC scan + rank are ONE spark.sql() program over
    the corpus / codebook / ADC-table views instead of ~10 chained
    DataFrame ops — construction paid a py4j round trip plus an eager
    re-analysis of the growing tree per op (~0.5 s of pure driver time at
    sf0.1 for this key, the r13 'eager per-op analysis' floor item); one
    SQL string analyzes the identical tree once.  The expressions are
    1:1 replicas (power == **, element_at is 1-based in both, struct-min
    argmin field order (d, k) unchanged), proven row-identical."""
    cb_rows, qtab_rows = _pq_local_setup(corpus, queries, id_col)
    spark = corpus.sparkSession
    spark.createDataFrame(
        cb_rows, "m int, k int, cent array<double>"
    ).createOrReplaceTempView("pq_cb_v")
    spark.createDataFrame(
        qtab_rows, "query_id bigint, m int, code int, d_int bigint"
    ).createOrReplaceTempView("pq_qtab_v")
    corpus.createOrReplaceTempView("pq_corpus_v")
    return spark.sql(_pq_scan_sql(id_col, k, _pq_encode_agg_seed()))


def topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 3,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF-PQ: coarse cluster pruning (topk_ivf's inverted-file layout)
    composed with the compressed-domain ADC scan (topk_pq) — the layout a
    100 TB vector corpus actually ships: parquet partitioned by coarse
    cluster (partition pruning cuts the scan to nprobe/nlist of the data),
    each partition holding 4-byte PQ codes instead of raw vectors.  The
    probe side broadcasts |queries| x nprobe x 128 table rows; the scan is
    an equi-join on (cluster, subspace, code) + exact integer ADC sums."""
    codebook, qtab = _pq_local_dfs(corpus, queries, id_col)
    codes = pq_encode(corpus, codebook, id_col).join(
        corpus.select(F.col(id_col).alias("vid"), F.col(label_col).alias("cluster")),
        "vid",
    )
    coarse = [
        (int(r["cluster"]), [float(x) for x in r["centroid"]])
        for r in ivf_centroids(corpus, label_col).collect()
    ]
    qsel = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            _nearest_clusters(F.col("embedding"), coarse, nprobe)
        ).alias("cluster"),
    )
    qfull = qsel.join(qtab, "query_id")
    scored = (
        codes.join(F.broadcast(qfull), ["cluster", "m", "code"])
        .where(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", F.col("vid").alias("neighbor_id"))
        .agg(F.sum("d_int").alias("s"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("s") / PQ_SCALE, 6).alias("adc_dist"),
        )
    )

# --- trained product quantization (round 4): Lloyd-refined codebooks --------
#
# The closed-form seed codebook above is oracle-convenient; production PQ
# TRAINS per-subspace codebooks with k-means.  This tier runs the
# integer-grid Lloyd recipe proven in queries/ml.py (embedding_kmeans) once
# per subspace — all 8 subspaces advance together in ONE DataFrame pass per
# iteration, since the subspace id is just another grouping key — and the
# DuckDB oracle replays the identical unrolled iterations as chained CTEs.

PQ_ITERS = 2  # Lloyd refinements of the seed codebook (matches ml.py ITERS)
PQ_CUNIT = 1 << 20  # centroid binary grid (2^-20): floor products are exact
PQ_DUNIT = 1 << 14  # argmin distance grid: floor has no tie semantics
# Training-sample cap: codebooks train on the deterministic prefix
# vec_id < PQ_TRAIN_CAP (FAISS practice: PQ trains on a bounded sample, not
# the corpus — faiss clustering warns above ~256k points per centroid set).
# At the test scale factors the corpus is < 2k rows so the cap covers
# everything (the DuckDB oracle replays the same WHERE); at 100 TB it is the
# knob that keeps the driver-side trainer bounded while encode + ADC stay
# fully distributed.
PQ_TRAIN_CAP = 1 << 15


def _pq_floor_argmin(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vid, m, subvec) x broadcast codebook -> (vid, m, code, subvec):
    nearest-centroid id by floor(d * 2^14)-quantized squared L2, ties to
    the lower k — the tie-free integer grid of the kmeans recipe (unlike
    pq_encode's round(d, 4), which keeps the seed tier's historical
    contract)."""
    d = _pq_sqdist(F.col("subvec"), F.col("cent"))
    di = F.floor(d * PQ_DUNIT).cast("long")
    return (
        sub.join(F.broadcast(codebook), "m")
        .groupBy("vid", "m")
        .agg(
            F.min(F.struct(di.alias("d"), F.col("k").alias("k"))).alias("mn"),
            F.any_value("subvec").alias("subvec"),  # constant per (vid, m)
        )
        .select("vid", "m", F.col("mn.k").alias("code"), "subvec")
    )


def _pq_tdiv(s: int, n: int) -> int:
    """Truncating integer division on Python bigints, sign-matched to the
    oracle's CASE // formula (and to ml.py's tdiv)."""
    return -((-s) // n) if s < 0 else s // n


def pq_train_codebook(
    corpus: DataFrame, id_col: str = "vec_id", iters: int = PQ_ITERS
) -> list[tuple[int, int, list[float]]]:
    """Per-subspace Lloyd k-means (K=PQ_K, deterministic init from the
    PQ_K smallest ids, `iters` centroid updates) on the 2^-20 integer
    grid: per-row units are floor(x * 2^20) (exact — power-of-two
    scaling), summed as integers on the executors, divided by the member
    count with truncating division ON THE DRIVER, re-materialized as
    q / 2^20 — an exactly-representable double.  No round(double)
    anywhere, so cross-engine assignment flips are impossible by
    construction (the ml.py hardening).  The only driver-side data is the
    128-row codebook per iteration — the documented codebook exception.
    Returns [(m, k, cent)] sorted by (m, k); clusters that lose all
    members drop out (identically in the oracle's GROUP BY)."""
    import math

    spark = corpus.sparkSession
    seed_rows = corpus.where(F.col(id_col) < PQ_K).select(id_col, "embedding").collect()
    cb: list[tuple[int, int, list[float]]] = []
    for r in seed_rows:
        emb = [float(x) for x in r["embedding"]]
        k = int(r[id_col])
        for m in range(PQ_M):
            cb.append(
                (m, k, [math.floor(v * PQ_CUNIT) / PQ_CUNIT
                        for v in emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]])
            )
    cb.sort()
    sub = _pq_subspaces(corpus, id_col, "vid")
    for _ in range(iters):
        cb_df = spark.createDataFrame(cb, "m int, k int, cent array<double>")
        assigned = _pq_floor_argmin(sub, cb_df)
        dim_sums = [
            F.sum(
                F.floor(F.element_at("subvec", i + 1).cast("double") * PQ_CUNIT)
                .cast("long")
            ).alias(f"s{i}")
            for i in range(PQ_SUBDIM)
        ]
        rows = (
            assigned.groupBy("m", "code")
            .agg(F.count(F.lit(1)).alias("cnt"), *dim_sums)
            .collect()
        )
        cb = sorted(
            (
                int(r["m"]),
                int(r["code"]),
                [_pq_tdiv(int(r[f"s{i}"]), int(r["cnt"])) / PQ_CUNIT
                 for i in range(PQ_SUBDIM)],
            )
            for r in rows
        )
    return cb


def pq_train_codebook_local(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    iters: int = PQ_ITERS,
    train_cap: int = PQ_TRAIN_CAP,
) -> tuple[list[tuple[int, int, list[float]]], list]:
    """The FAISS-shaped trainer: ONE narrow union collect fetches the
    bounded training prefix (vec_id < train_cap) AND the query panel, then
    runs the per-subspace integer-grid Lloyd loop driver-side in numpy —
    bit-for-bit the same math as the distributed pq_train_codebook
    (asserted equal in tests/test_llm_ops.py):

    - distances accumulate per-dimension LEFT-ASSOCIATED (`d = d + term`
      one dim at a time over the whole matrix — elementwise IEEE adds in
      the same order as _pq_sqdist's codegen fold and the oracle's
      sequential list_sum);
    - argmin on floor(d * 2^14) with np.argmin's first-min = lowest k;
    - centroid updates sum floor(x * 2^20) as exact int64 and divide with
      the sign-matched truncating division.

    Replaces `iters` driver-sequenced Spark jobs (broadcast join +
    keyed aggregate + collect per iteration — the pagerank scheduling-floor
    shape, ~1 s/iteration of overhead at sf0.1 for ~5 ms of math) with one
    sub-second collect.  Production note: this is how PQ is actually
    trained at 100 TB too — on a bounded sample, never the corpus; only
    encode and the ADC scan are corpus-sized, and those stay distributed.
    Returns (codebook, query_rows) with codebook sorted by (m, k)."""
    import numpy as np

    both = (
        corpus.where(F.col(id_col) < train_cap)
        .select(F.lit(0).alias("side"), F.col(id_col).alias("k"), "embedding")
        .unionByName(
            queries.select(F.lit(1).alias("side"), F.col(id_col).alias("k"), "embedding")
        )
        .collect()
    )
    train_rows = [r for r in both if r["side"] == 0]
    q_rows = [r for r in both if r["side"] == 1]
    train_rows.sort(key=lambda r: int(r["k"]))
    # (n, PQ_M, PQ_SUBDIM) float64 — float->double widening is exact
    X = np.array(
        [[float(x) for x in r["embedding"]] for r in train_rows], dtype=np.float64
    ).reshape(len(train_rows), PQ_M, PQ_SUBDIM)
    U = np.floor(X * PQ_CUNIT).astype(np.int64)  # 2^20 scaling: exact
    # seed: centroid (m, k) = subspace m of vector with id k, floor-gridded
    ids = np.array([int(r["k"]) for r in train_rows])
    seed_idx = np.nonzero(ids < PQ_K)[0]
    cents = {
        m: [(int(ids[i]), np.floor(X[i, m] * PQ_CUNIT) / PQ_CUNIT) for i in seed_idx]
        for m in range(PQ_M)
    }
    for _ in range(iters):
        new_cents: dict[int, list[tuple[int, np.ndarray]]] = {}
        for m in range(PQ_M):
            ks = [k for k, _ in cents[m]]  # ascending: argmin first-min = low k
            C = np.stack([c for _, c in cents[m]])  # (nk, SUBDIM)
            d = (X[:, m, None, 0] - C[None, :, 0]) ** 2
            for j in range(1, PQ_SUBDIM):
                d = d + (X[:, m, None, j] - C[None, :, j]) ** 2
            assign = np.argmin(np.floor(d * PQ_DUNIT), axis=1)  # (n,)
            out = []
            for ki, k in enumerate(ks):
                members = assign == ki
                cnt = int(members.sum())
                if cnt == 0:
                    continue  # empty clusters drop out (oracle GROUP BY)
                s = U[members, m, :].sum(axis=0)  # exact int64
                out.append(
                    (k, np.array([_pq_tdiv(int(v), cnt) for v in s]) / PQ_CUNIT)
                )
            new_cents[m] = out
        cents = new_cents
    cb = sorted(
        (m, k, [float(v) for v in c]) for m in range(PQ_M) for k, c in cents[m]
    )
    return cb, q_rows


def topk_pq_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    iters: int = PQ_ITERS,
) -> DataFrame:
    """ANN top-k by ADC over a TRAINED product quantizer — the
    production-faithful upgrade of topk_pq (r3 VERDICT stretch #8): train
    with the FAISS-shaped bounded-sample local trainer
    (pq_train_codebook_local — one collect, numpy Lloyd, bit-identical to
    the distributed pq_train_codebook kept for unbounded corpora), encode
    on the same floor-grid argmin, then the identical broadcast equi-join
    ADC scan with floor(d * 1e6) integer distance tables (floor, not
    round — no tie semantics anywhere in this tier).  Scale shape: setup
    is ONE narrow collect bounded by PQ_TRAIN_CAP; encode + scan stay
    corpus-sized and fully distributed, never touching raw vectors."""
    import math

    cb, q_rows = pq_train_codebook_local(corpus, queries, id_col, iters)
    qtab_rows: list[tuple] = []
    for r in q_rows:
        qid = int(r["k"])
        emb = [float(x) for x in r["embedding"]]
        for m, kk, c in cb:
            sub = emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            # left-associated accumulation — same order as _pq_sqdist
            # (Spark codegen) and the oracle's sequential list_sum fold
            d = (sub[0] - c[0]) ** 2
            for j in range(1, PQ_SUBDIM):
                d = d + (sub[j] - c[j]) ** 2
            qtab_rows.append((qid, m, kk, math.floor(d * PQ_SCALE)))
    # Round 14: same one-analysis-pass SQL scan as topk_pq (identical
    # dataflow; only the argmin grid differs — floor(d * 2^14), no round).
    # The dropped any_value(subvec) of _pq_floor_argmin was dead here (the
    # old .select pruned it); grouped rows are unchanged.
    spark = corpus.sparkSession
    spark.createDataFrame(
        cb, "m int, k int, cent array<double>"
    ).createOrReplaceTempView("pq_cb_v")
    spark.createDataFrame(
        qtab_rows, "query_id bigint, m int, code int, d_int bigint"
    ).createOrReplaceTempView("pq_qtab_v")
    corpus.createOrReplaceTempView("pq_corpus_v")
    return spark.sql(_pq_scan_sql(id_col, k, _pq_encode_agg_floor()))
