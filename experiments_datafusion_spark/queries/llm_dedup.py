"""Deduplication queries over the documents table. The MinHash-LSH oracle is
GENERATED from the same constants as the Spark pipeline (operators/dedup.py)
so DuckDB replays banding + verification bit-for-bit — the LSH output itself
is differential-tested. SimHash's banded candidate join is checked against a
brute-force Hamming oracle (banding completeness by pigeonhole)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import dedup as D
from experiments_datafusion_spark.queries import register

# ---- shared SQL fragments (mirror operators/text.py + dedup.py) -----------

_WORDS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"
_SHINGLES = (
    f"list_distinct(list_transform(generate_series(1, len({_WORDS}) - 2), "
    f"i -> array_to_string(({_WORDS})[i:i+2], ' ')))"
)
_SQL_SHINGLE_CTE = f"""
sh_str AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS s0 FROM documents
),
sh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(s0), 1, 15)) AS BIGINT) AS s FROM sh_str
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  -- raw (unrounded) jaccard: thresholds below filter on THIS value, exactly
  -- like the Spark side (operators/dedup.py filters raw, rounds for output);
  -- rounding before filtering would flip pairs in [t - 5e-5, t).
  SELECT x, y, c * 1.0 / (sa.n_sh + sb.n_sh - c) AS jaccard_raw
  FROM common
  JOIN sizes sa ON x = sa.doc_id
  JOIN sizes sb ON y = sb.doc_id
)
"""


@register(
    "dedup_exact",
    tags=("llm", "dedup"),
    oracle="""
SELECT text, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic representative (min doc_id) — the
    oracle-checkable form of dropDuplicates(['text'])."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "dedup_exact_normalized",
    tags=("llm", "dedup"),
    oracle="""
SELECT
  trim(regexp_replace(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g'),
       '\\s+', ' ', 'g')) AS norm_text,
  min(doc_id) AS keeper,
  count(*)    AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the normalized text form (case/punct/ws-insensitive)."""
    from experiments_datafusion_spark.operators import text as T

    d = table(spark, sf_dir, "documents")
    return d.groupBy(T.normalized(F.col("text")).alias("norm_text")).agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "dedup_jaccard",
    tags=("llm", "dedup"),
    oracle=f"""
WITH {_SQL_SHINGLE_CTE}
SELECT x, y, round(jaccard_raw, 4) AS jaccard FROM jac WHERE jaccard_raw >= 0.5
""",
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join at threshold 0.5 (posting-list
    self-join; no quadratic scan)."""
    return D.jaccard_pairs(table(spark, sf_dir, "documents"), 0.5)


# max_df=5 bites on the synthetic corpus (max shingle df at sf0.01 is 7),
# so the driver exercises the capped path for real, not the no-op branch.
_JACCARD_MAX_DF = 5

_SQL_CAPPED_SHINGLE_CTE = f"""
sh_str AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS s0 FROM documents
),
sh_all AS (
  SELECT doc_id, CAST(('0x' || substr(md5(s0), 1, 15)) AS BIGINT) AS s FROM sh_str
),
hot AS (
  SELECT s FROM sh_all GROUP BY s HAVING count(*) > {_JACCARD_MAX_DF}
),
sh AS (SELECT * FROM sh_all WHERE s NOT IN (SELECT s FROM hot)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT x, y, c * 1.0 / (sa.n_sh + sb.n_sh - c) AS jaccard_raw
  FROM common
  JOIN sizes sa ON x = sa.doc_id
  JOIN sizes sb ON y = sb.doc_id
)
"""


@register(
    "dedup_jaccard_capped",
    tags=("llm", "dedup"),
    oracle=f"""
WITH {_SQL_CAPPED_SHINGLE_CTE}
SELECT x, y, round(jaccard_raw, 4) AS jaccard FROM jac WHERE jaccard_raw >= 0.5
""",
)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_jaccard with the document-frequency cap engaged (max_df=5):
    shingles present in >5 docs — boilerplate, the posting-list join's
    f^2/2 fan-out bomb — are dropped via a broadcast anti-join before the
    self-join, and Jaccard is computed exactly over the capped universe.
    The oracle replays the cap, so the scores (which MOVE when hot
    shingles drop out of intersections and sizes) are differential-tested,
    not just the survivor set.  This is the knob the 100 TB run of
    dedup_jaccard turns (operators/dedup.py:jaccard_pairs docstring)."""
    return D.jaccard_pairs(
        table(spark, sf_dir, "documents"), 0.5, max_df=_JACCARD_MAX_DF
    )


def minhash_bands_ctes() -> str:
    """hashed/sig/bands CTE text (requires the ``sh`` CTE in scope) — the
    portable minhash-band replay shared by _minhash_oracle and the
    round-10 streaming dedup key."""
    P, A, B = D.MINHASH_P, D.MINHASH_A, D.MINHASH_B
    mh_exprs = ",\n    ".join(
        f"min(({A[i]} * h + {B[i]}) % {P}) AS mh{i}" for i in range(D.NUM_HASHES)
    )
    band_selects = []
    for j in range(D.BANDS):
        cols = [f"mh{j * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)]
        concat = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {j} AS band, md5({concat}) AS bh FROM sig"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    return f"""
hashed AS (SELECT doc_id, s % {P} AS h FROM sh),
sig AS (
  SELECT doc_id,
    {mh_exprs}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {bands_sql}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_SQL_SHINGLE_CTE},
{minhash_bands_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT cand.x, cand.y, round(jac.jaccard_raw, 4) AS jaccard
FROM cand JOIN jac ON cand.x = jac.x AND cand.y = jac.y
WHERE jac.jaccard_raw >= 0.5
"""


@register("dedup_minhash_lsh", tags=("llm", "dedup"), oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (K=32) + LSH (8 bands x 4 rows) near-dup join, candidates
    verified with exact Jaccard >= 0.5. The DuckDB oracle replays the whole
    pipeline with identical hash constants."""
    return D.minhash_lsh_pairs(table(spark, sf_dir, "documents"), 0.5)


def _simhash_sql_fragment() -> tuple[str, str]:
    P_BITS = D.SIMHASH_BITS
    votes = ",\n    ".join(
        f"sum(2 * ((h >> {b}) & 1) - 1) AS s{b}" for b in range(P_BITS)
    )
    terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(P_BITS)
    )
    return votes, terms


@register(
    "dedup_simhash",
    tags=("llm", "dedup"),
    oracle=(
        lambda votes_terms: f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS}) AS w FROM documents
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM tok
),
votes AS (
  SELECT doc_id,
    {votes_terms[0]}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, {votes_terms[1]} AS simhash
FROM votes
"""
    )(_simhash_sql_fragment()),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (oracle replays the bit votes exactly)."""
    return D.simhash(table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    tags=("llm", "dedup"),
    oracle=(
        lambda votes_terms: f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS}) AS w FROM documents
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM tok
),
votes AS (
  SELECT doc_id,
    {votes_terms[0]}
  FROM hashed GROUP BY doc_id
),
sig AS (SELECT doc_id, {votes_terms[1]} AS simhash FROM votes)
SELECT a.doc_id AS x, b.doc_id AS y,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {D.SIMHASH_HAMMING_T}
"""
    )(_simhash_sql_fragment()),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole-complete banded
    join (4 bands x 12 bits); the oracle brute-forces all pairs — matching
    proves the banding loses nothing."""
    return D.simhash_pairs(table(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine",
    tags=("llm", "dedup", "similarity"),
    oracle="""
WITH norms AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS x, b.vec_id AS y,
  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 4) AS cosine
FROM norms a JOIN norms b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm) >= 0.45
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.45 (test data's max pair is
    ~0.51). Brute-force — kept as the exactness/recall BASELINE; the
    primary scale path is dedup_embedding_lsh below."""
    from experiments_datafusion_spark.operators.similarity import cosine_pairs

    return cosine_pairs(table(spark, sf_dir, "embeddings"), 0.45)


def _embedding_lsh_ctes(buckets_sql: str) -> str:
    """Shared CTE block: LSH tables -> candidate pairs -> norms."""
    return f"""buckets AS (
  {buckets_sql}
),
cand AS (
  SELECT DISTINCT a.vec_id AS x, b.vec_id AS y
  FROM buckets a
  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
norms AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
  FROM embeddings
)"""


def _embedding_lsh_oracle(planes_per_table: int = 2, n_tables: int = 6) -> str:
    """DuckDB replay of embedding_lsh_pairs with the SAME plane constants
    (operators/similarity.py:LSH_PLANES) — like the MinHash oracle, the LSH
    output itself is differential-tested, not just the verify step."""
    from experiments_datafusion_spark.operators.similarity import LSH_PLANES

    m = planes_per_table

    def dot_sql(plane: list[float]) -> str:
        arr = "[" + ", ".join(repr(w) for w in plane) + "]"
        return (
            f"list_sum(list_transform(list_zip(embedding, {arr}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    table_selects = []
    for j in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {dot_sql(LSH_PLANES[j * m + i])} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(m)
        )
        table_selects.append(
            f"SELECT vec_id, {j} AS tbl, ({bits}) AS bucket FROM embeddings"
        )
    buckets_sql = "\n  UNION ALL\n  ".join(table_selects)
    return f"""
WITH {_embedding_lsh_ctes(buckets_sql)}
SELECT x, y,
  round(list_sum(list_transform(list_zip(na.embedding, nb.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (na.nrm * nb.nrm), 4) AS cosine
FROM cand
JOIN norms na ON x = na.vec_id
JOIN norms nb ON y = nb.vec_id
WHERE list_sum(list_transform(list_zip(na.embedding, nb.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (na.nrm * nb.nrm) >= 0.45
"""


@register(
    "dedup_embedding_lsh",
    tags=("llm", "dedup", "similarity"),
    oracle=_embedding_lsh_oracle(),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via sign-random-projection LSH buckets +
    exact in-bucket cosine verify — the PRIMARY (scale-safe) embedding dedup
    path: candidates from bucket self-joins, verification proportional to
    candidates, never an all-pairs scan. The oracle replays the bucketing
    with identical plane constants."""
    from experiments_datafusion_spark.operators.similarity import embedding_lsh_pairs

    return embedding_lsh_pairs(table(spark, sf_dir, "embeddings"), 0.45)


def _semantic_canonical_oracle(planes_per_table: int = 2, n_tables: int = 6) -> str:
    """SemDeDup-style end-to-end replay: the dedup_embedding_lsh pair CTEs
    feed a recursive min-label fixed point (the dedup_clusters pattern),
    then one row per semantic cluster."""
    from experiments_datafusion_spark.operators.similarity import LSH_PLANES

    m = planes_per_table

    def dot_sql(plane: list[float]) -> str:
        arr = "[" + ", ".join(repr(w) for w in plane) + "]"
        return (
            f"list_sum(list_transform(list_zip(embedding, {arr}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    table_selects = []
    for j in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {dot_sql(LSH_PLANES[j * m + i])} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(m)
        )
        table_selects.append(
            f"SELECT vec_id, {j} AS tbl, ({bits}) AS bucket FROM embeddings"
        )
    buckets_sql = "\n  UNION ALL\n  ".join(table_selects)
    return f"""
WITH RECURSIVE {_embedding_lsh_ctes(buckets_sql)},
pairs AS (
  SELECT x, y FROM cand
  JOIN norms na ON x = na.vec_id
  JOIN norms nb ON y = nb.vec_id
  WHERE list_sum(list_transform(list_zip(na.embedding, nb.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (na.nrm * nb.nrm) >= 0.45
),
edges AS (SELECT x AS src, y AS dst FROM pairs UNION SELECT y, x FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node AS vec_id, min(lbl) AS cluster FROM walk GROUP BY node)
SELECT cluster AS canonical_id,
       count(*) AS n_members,
       count(*) - 1 AS n_dropped
FROM comp GROUP BY cluster
"""


@register(
    "dedup_semantic_canonical",
    tags=("llm", "dedup", "similarity", "graph"),
    oracle=_semantic_canonical_oracle(),
)
def dedup_semantic_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup, end to end: embedding LSH near-dup
    pairs -> connected components -> one canonical vector (the minimum
    vec_id) per semantic cluster, with member/drop counts.  Composes two
    driver-green stages (dedup_embedding_lsh pairs, the dedup_clusters
    min-label propagation), so the whole keep/drop decision — not just the
    pair evidence — is differential-tested against a recursive-CTE fixed
    point."""
    from experiments_datafusion_spark.operators.graph import connected_components
    from experiments_datafusion_spark.operators.similarity import embedding_lsh_pairs

    pairs = embedding_lsh_pairs(table(spark, sf_dir, "embeddings"), 0.45)
    comp = connected_components(pairs.select("x", "y")).withColumnRenamed(
        "doc_id", "vec_id"
    )
    return comp.groupBy(F.col("cluster").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )
