"""Random N-way split / scatter — the reference's `split_batch`
(/root/reference/src/data.rs:245-282): assign each row a uniform-random
stream id, then materialize per-stream batches.

Spark-first: the assignment is a seeded column expression; "streams" are
either (a) actual partitions (repartition by the stream column — the
distributed analog, zero driver involvement) or (b) a list of filtered
DataFrames (the literal analog of Vec<Vec<RecordBatch>>).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from experiments_datafusion_spark.generators import SPLIT_SEED


def assign_streams(df: DataFrame, num_streams: int, seed: int = SPLIT_SEED) -> DataFrame:
    """Uniform stream assignment (data.rs:252-261) as a column.

    Seeded content-hash, not F.rand: rand seeds per partition, so the split
    would change with parallelism; xxhash64 over the row is uniform across
    streams AND identical at any partitioning / cluster size."""
    return df.withColumn(
        "stream",
        F.pmod(F.xxhash64(*df.columns, F.lit(seed)), F.lit(num_streams)).cast("int"),
    )


def assign_streams_hash(
    df: DataFrame, num_streams: int, key, seed: int = SPLIT_SEED
) -> DataFrame:
    """Portable stream assignment: md5-based 60-bit hash of a caller-supplied
    string key column (operators/text.hash64 recipe), so a DuckDB oracle can
    replay the exact split. Same uniformity and partition-invariance as
    `assign_streams`; use when the row has a natural string key and
    cross-engine replay matters more than hash throughput."""
    from experiments_datafusion_spark.operators.text import hash64

    return df.withColumn(
        "stream",
        F.pmod(hash64(F.concat(key, F.lit(f"#{seed}"))), F.lit(num_streams)).cast("int"),
    )


def split_batch(df: DataFrame, num_streams: int, seed: int = SPLIT_SEED) -> list[DataFrame]:
    """Literal split: one DataFrame per stream (take_columns filter per
    stream, data.rs:272-282). Each element filters the shared assigned
    frame — Catalyst collapses the filter into the scan."""
    assigned = assign_streams(df, num_streams, seed).cache()
    return [assigned.where(F.col("stream") == k).drop("stream") for k in range(num_streams)]


def scatter_to_partitions(df: DataFrame, num_streams: int, seed: int = SPLIT_SEED) -> DataFrame:
    """Distributed scatter: repartition by the stream id so each stream IS a
    partition — the form that scales (no per-stream jobs)."""
    return (
        assign_streams(df, num_streams, seed)
        .repartition(num_streams, "stream")
    )
