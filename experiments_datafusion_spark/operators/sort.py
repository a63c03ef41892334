"""Multi-column sort — the reference's core operator, Spark-first.

The reference implements two physical strategies for one logical op
(/root/reference/src/lib.rs:23-74): per-column dynamic comparators
(lexsort_to_indices) vs Arrow Row-format normalized keys + byte-wise sort.
Spark's SortExec already uses the row-format technique internally (Tungsten
UnsafeRow + sort-prefix radix sort, SPARK-7082), so user-level code declares
ONE sort and the engine picks the physical path — we deliberately do NOT
reimplement either strategy (SURVEY.md §4).

Null placement is always explicit: Arrow's SortOptions::default() is
ascending + nulls-first (lib.rs:84), and Spark's default differs for desc —
so every expression pins asc_nulls_first / desc_nulls_first.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def make_sort_exprs(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    ascending: bool = True,
    nulls_first: bool = True,
) -> list[Column]:
    """One sort expression per column, left-to-right — mirrors
    `make_sort_exprs` (lib.rs:78-87): sort by ALL columns, ascending,
    nulls first."""
    cols = list(columns) if columns is not None else list(df.columns)
    out = []
    for c in cols:
        col = F.col(c)
        if ascending:
            out.append(col.asc_nulls_first() if nulls_first else col.asc_nulls_last())
        else:
            out.append(col.desc_nulls_first() if nulls_first else col.desc_nulls_last())
    return out


def sort_batch(df: DataFrame, exprs: Sequence[Column] | None = None) -> DataFrame:
    """Global lexicographic sort (lib.rs:23-74 `sort_batch`). One API — the
    comparator-vs-row-encoding strategy flag has no analog because Spark's
    SortExec always uses the normalized-key path."""
    return df.orderBy(*(exprs if exprs is not None else make_sort_exprs(df)))


def sort_within_partitions(df: DataFrame, exprs: Sequence[Column] | None = None) -> DataFrame:
    """Per-partition sort without a global shuffle — the per-batch analog of
    the reference's single-batch sort; at scale this is the cheap option
    when downstream only needs within-partition order (e.g. merge joins,
    clustered writes)."""
    return df.sortWithinPartitions(*(exprs if exprs is not None else make_sort_exprs(df)))


def make_sorted_runs(
    df: DataFrame,
    num_runs: int,
    exprs: Sequence[Column] | None = None,
    run_col: str = "run",
) -> DataFrame:
    """Scatter rows into ``num_runs`` partition-resident runs (one run per
    partition via hash repartition on ``run_col``) and sort each run — the
    setup half of the reference's multi-batch regime (split_batch,
    data.rs:245-261, feeding the merge benchmark README.md:3-5).  The run
    column must already exist (operators/split.assign_streams*)."""
    sort_cols = [c for c in df.columns if c != run_col]
    return df.repartition(num_runs, F.col(run_col)).sortWithinPartitions(
        *(exprs if exprs is not None else make_sort_exprs(df, sort_cols))
    )


def merge_sorted_runs(runs: DataFrame, exprs: Sequence[Column] | None = None) -> DataFrame:
    """Globally merge pre-sorted runs into one total order — the
    SortPreservingMerge analog of the reference's multi-batch merge regime
    (README.md:3-5: the half of its finding where row-format encoding wins).

    Spark has no user-level merge-without-sort: a total order is always
    range-exchange + per-partition sort (`orderBy`).  The exchange
    re-interleaves the runs, so each reducer sees up to K sorted
    subsequences — input that the comparator strategy's TimSort
    (spark.sql.sort.enableRadixSort=false; Spark's comparator sort IS
    TimSort over record pointers) merges adaptively in ~O(n log K), while
    the radix path ignores pre-existing order entirely.  That strategy
    divergence on run-structured input is the Spark translation of the
    reference's single-batch-vs-merge asymmetry; bench.py's merge series
    measures it across N runs at 1M-10M rows."""
    return runs.orderBy(*(exprs if exprs is not None else make_sort_exprs(runs)))


def top_k(df: DataFrame, k: int, exprs: Sequence[Column] | None = None) -> DataFrame:
    """Sort + fetch: Spark plans TakeOrderedAndProject (per-partition heaps,
    no global sort) — the TopK operator DataFusion plans for
    ORDER BY + LIMIT."""
    return df.orderBy(*(exprs if exprs is not None else make_sort_exprs(df))).limit(k)
