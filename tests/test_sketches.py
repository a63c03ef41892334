"""Mergeable-sketch properties (SURVEY.md §5.4: oracle can't express
implementation-defined sketch bytes; assert the algebraic laws instead):
HLL union-of-parts == sketch-of-whole, and estimates within 5% of exact."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.queries import all_queries


def test_sketch_rollup_bounds(spark, sf_dir):
    rows = all_queries()["agg_sketch_rollup"].fn(spark, sf_dir).collect()
    assert rows
    for r in (x for x in rows if x["source"] != "__all__"):
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= 0.05 * r["exact_distinct"]


def test_union_of_parts_equals_sketch_of_whole(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    fp = T.hash64(T.normalized(F.col("text"))).alias("fp")
    parts = (
        docs.select("source", fp)
        .groupBy("source")
        .agg(F.hll_sketch_agg("fp").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    whole = (
        docs.select(fp)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("fp")).alias("est"))
        .collect()[0]["est"]
    )
    # DataSketches HLL union is NOT bit-lossless vs direct sketching (the
    # union target promotes sparse->dense differently), so assert the
    # estimates agree within 2% of each other and both within 5% of exact
    exact = docs.select(fp).distinct().count()
    assert abs(parts - whole) <= 0.02 * exact
    assert abs(whole - exact) <= 0.05 * exact
    assert abs(parts - exact) <= 0.05 * exact
