"""Seed-deterministic rebuilds of the reference's four sort-benchmark
workloads (FIXTURES.md §B; generation rules at /root/reference/src/data.rs).

Spark-first translation: `spark.range(n)` + seeded column expressions, all
JVM-side (xxhash64-of-id streams, hash-derived strings) — no driver-side
data generation, so a 100k-row batch and a 10B-row batch build the same way,
partitioned across the cluster, and the dataset is identical at ANY
parallelism (partition-invariant determinism, unlike F.rand's per-partition
seeding).

Reference semantics reproduced:
  * utf8_low  — uniform over 100 fixed strings "value0".."value99"
                (data.rs:211-224)
  * utf8_high — 20-char alphabetic, ~no duplicates (data.rs:227-241); here a
                deterministic surrogate: md5(id) hex -> digits remapped to
                letters g..p, first 20 chars
  * i64       — uniform in [0, row_count), ≈1/3 repeats (data.rs:199-203)
  * f64       — the i64 distribution cast to double (data.rs:206-208)
  * dict(i32,utf8) — utf8_low cardinality; dictionary encoding is physical,
                not logical, in Spark (SURVEY.md §1.2)
Each multi-column batch is pre-sorted ascending by all columns left-to-right
(data.rs:67/98/137/164) when ``presorted=True``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DATA_SEED = 42  # data.rs:193
SPLIT_SEED = 1337  # data.rs:247

CASES = ("utf8-tuple", "mixed-tuple", "dictionary-tuple", "mixed-dictionary-tuple")


# All value streams derive from (id, seed) via a hash, never F.rand:
# F.rand(seed) seeds PER PARTITION, so output would change with parallelism
# (SPARK_GRAFT_CPUS, cluster size). Hash-of-id matches the reference's
# one-fixed-dataset semantics (StdRng::seed_from_u64, data.rs:193) for any
# partitioning of spark.range(n).
#
# Two hash flavors, same distribution:
#   * fast (default): JVM xxhash64 — what bench.py sweeps (10M-row batches);
#   * portable: the md5-based 60-bit hash64 shared with the dedup/text ops,
#     replayable in DuckDB SQL (queries/sortbench.py generates the matching
#     generator CTE), which is what makes the sortbench registry entries
#     oracle-checkable end to end.


def _uniform(seed: int, card: int, portable: bool = False):
    """Uniform int in [0, card), a pure function of (id, seed)."""
    if portable:
        from experiments_datafusion_spark.operators.text import hash64

        return F.pmod(
            hash64(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}"))),
            F.lit(card),
        )
    return F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(card))


def _utf8_low(seed: int, portable: bool = False):
    return F.concat(
        F.lit("value"), _uniform(seed, 100, portable).cast("int").cast("string")
    )


def _utf8_high(seed: int):
    # alphabetic-only 20-char surrogate; salt with seed to decorrelate
    # columns. md5-based, so already portable to the DuckDB oracle.
    hexstr = F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}")))
    return F.translate(F.substring(hexstr, 1, 20), "0123456789", "ghijklmnop")


def _i64(seed: int, n: int, portable: bool = False):
    return _uniform(seed, n, portable).cast("long")


def _f64(seed: int, n: int, portable: bool = False):
    return _i64(seed, n, portable).cast("double")


def _finish(df: DataFrame, presorted: bool) -> DataFrame:
    if presorted:
        df = df.orderBy(*[F.col(c).asc_nulls_first() for c in df.columns])
    return df


def utf8_tuple(
    spark: SparkSession,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
):
    """Schema of data.rs:56-84: two low-cardinality + one high-cardinality
    string column."""
    df = spark.range(n).select(
        _utf8_low(seed, portable).alias("utf_low1"),
        _utf8_low(seed + 1, portable).alias("utf_low2"),
        _utf8_high(seed + 2).alias("utf_high"),
    )
    return _finish(df, presorted)


def mixed_tuple(
    spark: SparkSession,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
):
    """Schema of data.rs:87-116: f64, utf8_low x2, i64."""
    df = spark.range(n).select(
        _f64(seed, n, portable).alias("f64"),
        _utf8_low(seed + 1, portable).alias("utf_low1"),
        _utf8_low(seed + 2, portable).alias("utf_low2"),
        _i64(seed + 3, n, portable).alias("i64"),
    )
    return _finish(df, presorted)


def dictionary_tuple(
    spark: SparkSession,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
):
    """Schema of data.rs:129-152: three dict(i32,utf8) columns — modeled as
    low-cardinality strings (cardinality is the workload property, not the
    physical encoding)."""
    df = spark.range(n).select(
        _utf8_low(seed, portable).alias("a"),
        _utf8_low(seed + 1, portable).alias("b"),
        _utf8_low(seed + 2, portable).alias("c"),
    )
    return _finish(df, presorted)


def mixed_dictionary_tuple(
    spark: SparkSession,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
):
    """Schema of data.rs:155-182: dict x3 + i64."""
    df = spark.range(n).select(
        _utf8_low(seed, portable).alias("a"),
        _utf8_low(seed + 1, portable).alias("b"),
        _utf8_low(seed + 2, portable).alias("c"),
        _i64(seed + 3, n, portable).alias("d"),
    )
    return _finish(df, presorted)


def i64_single(
    spark: SparkSession,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
):
    """Single i64 column — the reference's bare i64 stream (data.rs:199-203)
    on its own.  NOT one of the four charted tuple cases; it exists because
    it is the shape where Spark's radix-vs-comparator sort strategy choice
    (SortExec canUseRadixSort: single fully-prefix-representable key)
    genuinely diverges, making it the probe case for the two-strategy
    bench sweep."""
    df = spark.range(n).select(_i64(seed, n, portable).alias("i64"))
    return _finish(df, presorted)


_BUILDERS = {
    "utf8-tuple": utf8_tuple,
    "mixed-tuple": mixed_tuple,
    "dictionary-tuple": dictionary_tuple,
    "mixed-dictionary-tuple": mixed_dictionary_tuple,
    "i64-single": i64_single,
}


def generate_batch(
    spark: SparkSession,
    case: str,
    n: int,
    seed: int = DATA_SEED,
    presorted: bool = False,
    portable: bool = False,
) -> DataFrame:
    """Case dispatch mirroring `Case::generate_batch` (data.rs:13-29)."""
    return _BUILDERS[case](spark, n, seed=seed, presorted=presorted, portable=portable)


# ---- synthetic documents (analytics decade sweep) ---------------------------

_SYNTH_VOCAB = 5000
_SYNTH_WORDS = 22
_SYNTH_HEADER = "license header for this synthetic corpus all rights reserved"


def synth_documents(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic corpus for bench.py's analytics decade sweep
    (n docs, ~150 chars each), shaped to exercise the dedup flagships'
    scale paths:

      * 10% of docs duplicate an earlier doc's body verbatim (content id =
        id % 0.9n), so the pair output grows LINEARLY with n — dup groups
        stay size ~2, never a quadratic blob;
      * 10% of docs open with a boilerplate header drawn from 997 variants
        — hot shingles whose posting lists grow with n (df ~ n/10^4 per
        variant, well past any df cap) and would feed an O(cluster^2)
        fan-out to an uncapped posting-list self-join; the variant count
        bounds each boilerplate cluster so the CAPPED operators (and
        LSH's candidate stage, which is inherently quadratic in cluster
        size) stay linear over the decade — mirroring real corpora, where
        boilerplate is hot but no single blob is a constant fraction of
        100 TB;
      * body words draw from a 5000-word vocabulary via xxhash64 of
        (content id, position) — JVM-side, no Python, no RNG, identical
        across partitionings and runs.
    """
    cid = F.col("id") % F.lit(max(1, int(n * 0.9)))
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(cid * F.lit(1_000_003) + F.lit(j)), F.lit(_SYNTH_VOCAB)),
        )
        for j in range(_SYNTH_WORDS)
    ]
    body = F.concat_ws(" ", *words)
    header = F.concat_ws(
        " ",
        F.lit(_SYNTH_HEADER),
        F.concat(F.lit("h"), F.pmod(cid, F.lit(997))),
    )
    text = F.when(
        F.pmod(cid, F.lit(10)) < 1, F.concat_ws(" ", header, body)
    ).otherwise(body)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))
