"""Sort invariants (SURVEY.md §5.3) — the reference's core operator:

1. output is a permutation of the input (count + per-column multiset hash);
2. output is non-decreasing under the lexicographic key (nulls-first asc);
3. seeded generators are deterministic across independent builds
   (the reference's fixed-seed reproducibility argument, data.rs:193);
4. split_batch: streams partition the input (disjoint + exhaustive).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from experiments_datafusion_spark import generators
from experiments_datafusion_spark.operators import sort as sort_ops
from experiments_datafusion_spark.operators import split as split_ops

N = 5_000


def _multiset_hash(df):
    """Order-insensitive content fingerprint: sum of per-row hashes."""
    return (
        df.select(F.xxhash64(*df.columns).alias("h"))
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )


@pytest.mark.parametrize("case", generators.CASES)
def test_sort_is_permutation(spark, case):
    batch = generators.generate_batch(spark, case, N)
    sorted_df = sort_ops.sort_batch(batch)
    assert _multiset_hash(batch) == _multiset_hash(sorted_df)


@pytest.mark.parametrize("case", generators.CASES)
def test_sort_nondecreasing(spark, case):
    batch = generators.generate_batch(spark, case, N)
    out = sort_ops.sort_batch(batch).collect()
    keys = [tuple((v is not None, v) for v in row) for row in out]  # nulls first
    assert keys == sorted(keys)


@pytest.mark.parametrize("case", generators.CASES)
def test_generator_deterministic(spark, case):
    a = generators.generate_batch(spark, case, N)
    b = generators.generate_batch(spark, case, N)
    assert _multiset_hash(a) == _multiset_hash(b)
    # and a different seed produces different data
    c = generators.generate_batch(spark, case, N, seed=7)
    assert _multiset_hash(a) != _multiset_hash(c)


def test_presorted_batches_sorted(spark):
    df = generators.generate_batch(spark, "mixed-tuple", 2_000, presorted=True)
    rows = [tuple(r) for r in df.collect()]
    assert rows == sorted(rows)


def test_split_partitions_input(spark):
    base = generators.generate_batch(spark, "dictionary-tuple", N)
    streams = split_ops.split_batch(base, 4)
    assert len(streams) == 4
    counts = [s.count() for s in streams]
    assert sum(counts) == N
    assert all(c > 0 for c in counts)
    # deterministic: same seed -> same assignment
    again = [s.count() for s in split_ops.split_batch(base, 4)]
    assert counts == again


def test_scatter_to_partitions(spark):
    base = generators.generate_batch(spark, "dictionary-tuple", N)
    scattered = split_ops.scatter_to_partitions(base, 4)
    assert scattered.rdd.getNumPartitions() == 4
    assert scattered.count() == N


def test_topk_matches_full_sort(spark):
    df = generators.generate_batch(spark, "mixed-tuple", N)
    full = sort_ops.sort_batch(df).limit(50).collect()
    topk = sort_ops.top_k(df, 50).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in topk]
