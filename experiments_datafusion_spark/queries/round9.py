"""Round-9 operators: merge-on-read deletion vectors — the second half of
the lakehouse DELETE story (table_delete_compliance is the copy-on-write
half: rewrite affected files immediately).  Merge-on-read defers the
rewrite: deletes land as a tiny KEY SIDECAR (the Iceberg equality-delete /
Delta deletion-vector dataflow), every read applies base ⟕ anti-join
sidecar, and a later COMPACTION reconciles to the copy-on-write result.
At 100 TB this is how high-frequency deletes stay cheap — a delete writes
kilobytes, not a partition rewrite; the anti-join's build side is the
sidecar (broadcast-small by construction), making this the second
plan-asserted production shape for join_anti.

Same contract as every other module: the Spark plan you'd ship at 100 TB
with a DuckDB oracle replaying the semantics exactly; exact integers only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import materialize_then_rmtree, table
from experiments_datafusion_spark.queries import register

# deterministic delete cohort — distinct from table_delete_compliance's
# modulus so the two keys never accidentally verify each other
_MOR_MOD = 13


@register(
    "table_delete_mor",
    tags=("io", "maintenance", "join", "dimensional"),
    oracle=f"""
WITH logical AS (
  SELECT o_orderkey, o_custkey, o_orderstatus
  FROM orders WHERE o_custkey % {_MOR_MOD} != 0
),
audit AS (
  SELECT CAST(count(*) AS BIGINT)          AS n_rows,
         CAST(sum(o_orderkey) AS BIGINT)   AS key_sum,
         CAST(sum(o_custkey) AS BIGINT)    AS cust_sum
  FROM logical
)
SELECT 'mor' AS path, n_rows, key_sum, cust_sum FROM audit
UNION ALL
SELECT 'cow', n_rows, key_sum, cust_sum FROM audit
""",
)
def table_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE with deletion-vector sidecar + compaction.

    Dataflow: (1) materialize the base snapshot as immutable parquet;
    (2) the delete writes ONLY a key sidecar (the cohort's o_orderkey
    values — kilobytes, never a data rewrite); (3) the MoR read is
    base LEFT ANTI JOIN sidecar — Catalyst broadcasts the sidecar, so
    the production plan is a BroadcastHashJoin LeftAnti with zero
    shuffle of the base; (4) compaction applies the sidecar
    copy-on-write into a rewritten snapshot, after which reads drop the
    anti-join.  Both paths are read back and audited; the oracle
    computes the logical delete once from raw orders and expects the
    SAME audit row from each path, so the differential check proves
    MoR view == compacted CoW result == the logical delete.  The
    row-for-row (not just aggregate) equality and the broadcast-anti
    plan shape are pinned in tests/test_round9.py."""
    import tempfile

    root = tempfile.mkdtemp(prefix="mor_")
    base_src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    base_src.write.mode("overwrite").parquet(f"{root}/base")
    base = spark.read.parquet(f"{root}/base")

    # the delete: keys only — this is the whole write cost of a MoR delete
    base.where(F.col("o_custkey") % _MOR_MOD == 0).select("o_orderkey").write.mode(
        "overwrite"
    ).parquet(f"{root}/deletes")
    sidecar = spark.read.parquet(f"{root}/deletes")

    mor_view = base.join(F.broadcast(sidecar), "o_orderkey", "left_anti")

    # compaction: reconcile the sidecar copy-on-write; sidecar retires
    mor_view.write.mode("overwrite").parquet(f"{root}/compacted")
    cow = spark.read.parquet(f"{root}/compacted")

    def audit(df: DataFrame, path: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            F.sum("o_custkey").cast("bigint").alias("cust_sum"),
        ).select(F.lit(path).alias("path"), "n_rows", "key_sum", "cust_sum")

    out = audit(mor_view, "mor").unionByName(audit(cow, "cow"))
    return materialize_then_rmtree(out, root)


def mor_read(base: DataFrame, delete_keys: DataFrame, key: str) -> DataFrame:
    """The reusable MoR read: base minus the delete sidecar.  Broadcast by
    construction — a deletion sidecar is small relative to the base, and
    at 100 TB the alternative (shuffling the base for an SMJ anti) is
    exactly what merge-on-read exists to avoid."""
    return base.join(F.broadcast(delete_keys), key, "left_anti")


# ---- clustered-layout scan pruning ---------------------------------------------
#
# The data-layout half of file skipping: vanilla Spark parquet has no
# manifest, so FILE-level min/max skipping is a table-format feature
# (Delta/Iceberg) — what Spark itself gives is (a) directory-partition
# pruning and (b) ROW-GROUP pruning from parquet footer min/max stats,
# which only bites when the layout clusters the predicate column.  This
# key materializes exactly that claim: rewrite orders range-clustered on
# o_custkey (repartitionByRange -> every file covers a disjoint key range,
# the Z-order write path of layout_zorder specialized to one dimension),
# then run a selective custkey-band query over the clustered copy.  The
# oracle replays the band query on raw orders, so the rewrite+read is
# what's verified; the PRUNING evidence — the clustered scan's
# numOutputRows collapsing to the surviving row groups while the same
# predicate over an unclustered copy emits every row — is pinned via
# SparkPlan metrics in tests/test_round9.py (plans/audit.file_scan_metrics).

_PRUNE_FILES = 16
# band non-empty at EVERY scale (sf0.001's custkey domain is only 0-149)
_PRUNE_LO, _PRUNE_HI = 101, 140


@register(
    "scan_pruning_clustered",
    tags=("io", "layout", "maintenance"),
    oracle=f"""
SELECT CAST(count(*) AS BIGINT)           AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT)    AS key_sum,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                                          AS price_units
FROM orders
WHERE o_custkey BETWEEN {_PRUNE_LO} AND {_PRUNE_HI}
""",
)
def scan_pruning_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered rewrite + selective band read (docstring above)."""
    import tempfile

    root = tempfile.mkdtemp(prefix="prune_")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    orders.repartitionByRange(_PRUNE_FILES, "o_custkey").write.mode(
        "overwrite"
    ).parquet(f"{root}/clustered")
    band = spark.read.parquet(f"{root}/clustered").where(
        F.col("o_custkey").between(_PRUNE_LO, _PRUNE_HI)
    )
    out = band.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("bigint")
        .alias("price_units"),
    )
    return materialize_then_rmtree(out, root)
