"""Global row indexing / positional gather without a single-task funnel.

The naive Spark spelling of "row_number over a global order" —
``Window.orderBy(key)`` with no partitionBy — range-shuffles the ENTIRE
table into ONE task (flagged as a scale-killer in round-1 VERDICT).  The
scale-safe shape is the classic two-pass zipWithIndex trick, expressed in
DataFrame ops so Catalyst keeps pushdown/pruning:

  1. pick ~balanced key-range bucket boundaries (approxQuantile — one cheap
     aggregate pass, boundaries become plan literals);
  2. count rows per bucket (one parallel agg pass; bucket count is tiny, so
     the collect is O(buckets), not O(rows));
  3. rank WITHIN each bucket (Window.partitionBy(bucket) — fully parallel)
     and add the bucket's cumulative offset.

Every pass is parallel; the only driver-side data is the boundary list and
the per-bucket counts.  Reference semantics: Arrow `take` / positional
gather (/root/reference/src/lib.rs:56-73).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _bucket_expr(key: str, bounds: list[float]) -> F.Column:
    """Range-bucket id as a literal CASE chain: bucket = #bounds <= key.
    Bounds are plan constants, so both passes agree bit-for-bit (unlike
    spark_partition_id after repartitionByRange, whose sampled boundaries
    aren't contractually stable across jobs)."""
    b = F.lit(0)
    for x in bounds:
        b = b + F.when(F.col(key) >= F.lit(x), 1).otherwise(0)
    return b


def with_global_index(
    df: DataFrame,
    key: str,
    index_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Attach 1-based ``index_col`` = rank of the row in the global order of
    unique ``key``.  Requires ``key`` to be numeric-orderable and unique
    (caller contract — matches SQL row_number over a unique key)."""
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = spark.sparkContext.defaultParallelism * 2
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # pass 1: boundaries (approximate is fine — they only balance buckets)
    bounds = df.stat.approxQuantile(key, probs, 0.01) if probs else []
    bounds = sorted(set(bounds))
    bucket = _bucket_expr(key, bounds)
    bucketed = df.withColumn("__bucket", bucket)
    # pass 2: exact per-bucket counts -> cumulative offsets (tiny collect)
    counts = {
        r["__bucket"]: r["cnt"]
        for r in bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for bid in range(len(bounds) + 1):
        offsets[bid] = acc
        acc += counts.get(bid, 0)
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__bucket")
    )
    # pass 3: parallel within-bucket rank + literal offset
    w = Window.partitionBy("__bucket").orderBy(key)
    return (
        bucketed.withColumn("__local", F.row_number().over(w))
        .withColumn(index_col, (offset_expr + F.col("__local")).cast("int"))
        .drop("__bucket", "__local")
    )
