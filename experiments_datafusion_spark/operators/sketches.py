"""Bounded-memory streaming summaries (north-star extension, SURVEY.md §2B
aggregate row): the Misra-Gries / SpaceSaving frequent-items sketch as a
TWO-PASS exact heavy-hitter operator.

Why two passes: a one-pass MG summary's counts depend on arrival order, so
its raw output can never be differential-tested (and at 100 TB, never
reproduced across reshuffles).  The classic fix (MMDS ch.4; Misra-Gries
'82) is candidates-then-recount:

  pass 1 — each PARTITION runs MG with k counters in a plain dict
           (bounded memory: k entries per task, independent of partition
           size).  Pigeonhole guarantee, per partition: any item with
           local frequency > n_p/k survives with a positive counter.
           Summing over partitions: any item with GLOBAL frequency >
           sum_p(n_p)/k = N/k exceeds n_p/k in at least one partition,
           so the UNION of per-partition candidate sets is a superset of
           every global heavy hitter — regardless of how rows were
           partitioned.
  pass 2 — exact count of ONLY the candidates (broadcast semi-join; the
           candidate set is <= k * num_partitions rows, tiny) and filter
           by the real threshold.

The output is therefore EXACT and partition-invariant — identical to the
full groupBy answer for items above threshold — while the per-task state
is k counters instead of a vocabulary-sized hash table.  That memory bound
is the 100 TB story: pass 1 replaces the vocabulary-wide shuffle with a
candidates-only one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _mg_partition(k: int, col: str):
    """Per-partition Misra-Gries pass: yields the surviving candidate items
    of each Arrow batch stream (one task = one partition = one dict)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros (amortized O(1)/item)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Pass 1: the distinct union of every partition's MG survivors — a
    guaranteed superset of all items with global frequency > N/k, at most
    k rows per task regardless of partition size."""
    return items.mapInPandas(_mg_partition(k, col), schema=f"{col} string").distinct()


def heavy_hitters_exact(
    items: DataFrame, col: str, k: int, min_count: int
) -> DataFrame:
    """Exact frequencies of all items with count >= min_count, computed via
    the two-pass MG scheme.  SOUND iff min_count > N/k (the pigeonhole
    bound); the caller picks k with that margin — assert it cheaply from
    the recount if needed.  Returns (col, n) exactly as the full groupBy
    would."""
    return (
        items.join(F.broadcast(mg_candidates(items, col, k)), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )
