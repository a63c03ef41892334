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


def test_merge_sorted_runs_equals_direct_sort(spark):
    """The multi-batch merge regime (sortbench_merge): splitting into K
    sorted runs then merging must produce EXACTLY the direct full sort —
    same key sequence in order, same full-row multiset — and the merged
    output must be globally nondecreasing."""
    base = generators.generate_batch(spark, "mixed-tuple", N)
    assigned = split_ops.assign_streams(base, 8).withColumnRenamed("stream", "run")
    data_cols = base.columns
    exprs = sort_ops.make_sort_exprs(assigned, data_cols)
    runs = sort_ops.make_sorted_runs(assigned, 8, exprs, run_col="run")
    merged = sort_ops.merge_sorted_runs(runs, exprs)

    merged_keys = [tuple(r[c] for c in data_cols) for r in merged.collect()]
    direct_keys = [tuple(r) for r in sort_ops.sort_batch(base).collect()]
    assert merged_keys == direct_keys          # same total order, row for row
    assert merged_keys == sorted(merged_keys)  # globally nondecreasing
    # permutation: merge lost/duplicated nothing (run column dropped first)
    assert _multiset_hash(merged.select(*data_cols)) == _multiset_hash(base)


def test_segmented_runs_merge_equals_direct_sort(spark):
    """segments_per_run (the round-10 few-run scale fix): K=2 runs stored
    as 2*4 sorted segments must merge to EXACTLY the direct full sort, and
    each logical run's content must be preserved across its segments."""
    base = generators.generate_batch(spark, "mixed-tuple", N)
    assigned = split_ops.assign_streams(base, 2).withColumnRenamed("stream", "run")
    data_cols = base.columns
    exprs = sort_ops.make_sort_exprs(assigned, data_cols)
    seg_runs = sort_ops.make_sorted_runs(
        assigned, 2, exprs, run_col="run", segments_per_run=4
    )
    assert seg_runs.rdd.getNumPartitions() == 8
    # per-run content identical to the monolithic layout
    mono = sort_ops.make_sorted_runs(assigned, 2, exprs, run_col="run")
    for r in (0, 1):
        assert _multiset_hash(
            seg_runs.where(F.col("run") == r).select(*data_cols)
        ) == _multiset_hash(mono.where(F.col("run") == r).select(*data_cols))
    merged = sort_ops.merge_sorted_runs(seg_runs.drop("run"), exprs)
    merged_keys = [tuple(r[c] for c in data_cols) for r in merged.collect()]
    direct_keys = [tuple(r) for r in sort_ops.sort_batch(base).collect()]
    assert merged_keys == direct_keys


def test_resplit_sorted_runs_equivalence(spark):
    """The post-hoc A/B arm: resplit preserves the merge result exactly and
    every band is a sorted subsequence of its run."""
    base = generators.generate_batch(spark, "mixed-tuple", N)
    assigned = split_ops.assign_streams(base, 2).withColumnRenamed("stream", "run")
    data_cols = base.columns
    exprs = sort_ops.make_sort_exprs(assigned, data_cols)
    runs = sort_ops.make_sorted_runs(assigned, 2, exprs, run_col="run")
    resplit = sort_ops.resplit_sorted_runs(runs, 4, exprs, run_col="run")
    assert _multiset_hash(resplit.select(*data_cols)) == _multiset_hash(base)
    merged = sort_ops.merge_sorted_runs(resplit.drop("run"), exprs)
    baseline = sort_ops.merge_sorted_runs(runs.drop("run"), exprs)
    got = [tuple(r[c] for c in data_cols) for r in merged.collect()]
    want = [tuple(r[c] for c in data_cols) for r in baseline.collect()]
    assert got == want


def test_merge_sorted_runs_plan_shape(spark):
    """The merge itself must cost exactly ONE range exchange on top of the
    run scatter — no extra hash shuffles, no single-partition funnel."""
    from experiments_datafusion_spark.plans.audit import audit

    base = generators.generate_batch(spark, "mixed-tuple", 1_000)
    assigned = split_ops.assign_streams(base, 4).withColumnRenamed("stream", "run")
    exprs = sort_ops.make_sort_exprs(assigned, base.columns)
    merged = sort_ops.merge_sorted_runs(
        sort_ops.make_sorted_runs(assigned, 4, exprs, run_col="run"), exprs
    )
    p = audit(merged)
    assert p.n_range_shuffles == 1, p.text
    assert p.n_shuffles == 2, p.text  # scatter (hash on run) + merge (range)
