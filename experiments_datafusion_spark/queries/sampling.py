"""Deterministic sampling — the oracle-checkable complement to
``table_sample`` (queries/relational.py), whose engine RNG is inherently
engine-specific (CORRECTNESS_r01: the one ``no_oracle`` row).

Hash-based sampling (`hash64(key) % k = 0`, same md5 recipe both engines,
operators/text.py:hash64) is bit-for-bit reproducible across engines, scales
as a pushed-down scan filter, and is the idiom real data pipelines want:
the sample is stable across runs, clusters, AND engine versions, so
downstream eval sets never silently shift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators.text import hash64
from experiments_datafusion_spark.queries import register


@register(
    "table_sample_hash",
    tags=("sample",),
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE CAST(('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 15)) AS BIGINT) % 10 = 0
""",
)
def table_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: keep rows where hash64(primary key) % 10 = 0.
    Unlike TABLESAMPLE's engine RNG this is reproducible everywhere — the
    DuckDB oracle replays the exact same md5 recipe."""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"), F.lit("|"), F.col("l_linenumber").cast("string")
    )
    return li.where(hash64(key) % 10 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
