"""Physical-plan audits: prove the optimizations we rely on at scale
actually fire — predicate pushdown into the parquet scan, column pruning,
broadcast joins for dimensions, TakeOrderedAndProject for top-k, no Python
UDFs in JVM-only pipelines, partial aggregation before shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.plans.audit import audit
from experiments_datafusion_spark.queries import all_queries

Q = all_queries()


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    df = Q["tpch_q1"].fn(spark, sf_dir)
    p = audit(df)
    assert p.has_pushed_filters  # shipdate filter reaches the scan
    assert p.text.count("HashAggregate") >= 2  # partial + final
    assert not p.has_python_udf
    # codegen membership is only visible in the codegen explain mode under AQE
    from experiments_datafusion_spark.plans.audit import explain_str

    assert "WholeStageCodegen" in explain_str(df, "codegen")


def test_q1_column_pruning(spark, sf_dir):
    p = audit(Q["tpch_q1"].fn(spark, sf_dir))
    (cols,) = p.read_schema_columns()
    # 7 needed columns, not all 11 of lineitem
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q3_broadcasts_dimension(spark, sf_dir):
    p = audit(Q["tpch_q3"].fn(spark, sf_dir))
    assert p.has_broadcast_join
    assert p.has_pushed_filters


def test_q5_broadcasts_all_small_dims(spark, sf_dir):
    p = audit(Q["tpch_q5"].fn(spark, sf_dir))
    assert p.text.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_topk_is_take_ordered(spark, sf_dir):
    p = audit(Q["topk"].fn(spark, sf_dir))
    assert p.has("TakeOrderedAndProject")
    # top-k must NOT globally sort: no range-partitioned exchange
    assert "Exchange rangepartitioning" not in p.text


def test_semi_join_planned(spark, sf_dir):
    p = audit(Q["join_semi"].fn(spark, sf_dir))
    assert "LeftSemi" in p.text


def test_scalar_pipeline_is_jvm_only(spark, sf_dir):
    for name in ("scalar_string", "scalar_math", "text_quality", "text_langid"):
        p = audit(Q[name].fn(spark, sf_dir))
        assert not p.has_python_udf, f"{name} fell off the JVM path"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 10).select("o_orderkey")
    p = audit(df)
    assert p.has_pushed_filters
    (cols,) = p.read_schema_columns()
    assert cols == ["o_orderkey"]


def test_minhash_banding_single_pass(spark, sf_dir):
    """Banding reads the signature via ONE posexplode Generate, not a
    BANDS-way union (which would recompute the signature aggregation per
    band). Self-join sides still each carry the subtree pre-AQE; exchange
    reuse dedupes at runtime."""
    p = audit(Q["dedup_minhash_lsh"].fn(spark, sf_dir))
    from experiments_datafusion_spark.operators.dedup import BANDS

    assert p.text.count("Union") == 0
    # signature agg subtrees: at most one per self-join side, never per band
    n_sig_aggs = p.text.count("functions=[min(")
    assert n_sig_aggs <= 4, f"signature aggregation duplicated {n_sig_aggs}x"


def test_broadcast_in_similarity_topk(spark, sf_dir):
    p = audit(Q["sim_topk_bruteforce"].fn(spark, sf_dir))
    assert p.has_broadcast_join  # query side broadcast, corpus never shuffled
