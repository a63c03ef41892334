"""Reference-local operator queries (SURVEY.md §2A): the four sort workloads,
the all-columns sort spec, and the random N-way split.

The generated workloads exist only Spark-side (cross-engine RNG parity is
impossible — FIXTURES.md oracle-parity rule), so these entries are rows-only
for the driver; their real correctness gates are the invariant tests in
tests/test_sort.py (permutation / ordering / determinism) plus the
parquet-backed sort queries in relational.py (sort_multicol, topk) which ARE
oracle-checked."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark import generators
from experiments_datafusion_spark.operators import sort as sort_ops
from experiments_datafusion_spark.operators import split as split_ops
from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register

_N = 10_000  # rows per generated workload batch at test scale


def _sorted_case(spark: SparkSession, case: str) -> DataFrame:
    batch = generators.generate_batch(spark, case, _N)
    return sort_ops.sort_batch(batch)


@register("sortbench_utf8_tuple", tags=("sortbench",))
def sortbench_utf8_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utf8-tuple workload (data.rs:56-84): all-columns asc-nulls-first sort."""
    return _sorted_case(spark, "utf8-tuple")


@register("sortbench_mixed_tuple", tags=("sortbench",))
def sortbench_mixed_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mixed-tuple workload (data.rs:87-116)."""
    return _sorted_case(spark, "mixed-tuple")


@register("sortbench_dictionary_tuple", tags=("sortbench",))
def sortbench_dictionary_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dictionary-tuple workload (data.rs:129-152)."""
    return _sorted_case(spark, "dictionary-tuple")


@register("sortbench_mixed_dictionary_tuple", tags=("sortbench",))
def sortbench_mixed_dictionary_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mixed-dictionary-tuple workload (data.rs:155-182)."""
    return _sorted_case(spark, "mixed-dictionary-tuple")


@register("split_streams", tags=("sortbench", "split"))
def split_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random 4-way split of lineitem (split_batch, data.rs:245-261):
    returns per-stream row counts; the union-preserves-rows invariant is
    tested in tests/test_sort.py."""
    li = table(spark, sf_dir, "lineitem")
    assigned = split_ops.assign_streams(li, 4)
    return assigned.groupBy("stream").agg(F.count(F.lit(1)).alias("n")).orderBy("stream")


@register(
    "sort_desc_nulls",
    tags=("sortbench", "sort"),
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer
ORDER BY c_acctbal DESC NULLS FIRST, c_custkey ASC NULLS FIRST
LIMIT 100
""",
)
def sort_desc_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descending sort with pinned nulls-first (the Arrow-vs-Spark desc
    default divergence called out in SURVEY.md §7e), oracle-checked."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return sort_ops.top_k(
        c, 100, [F.col("c_acctbal").desc_nulls_first(), F.col("c_custkey").asc_nulls_first()]
    )
