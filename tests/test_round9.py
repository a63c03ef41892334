"""Round-9 operators: merge-on-read deletion vectors."""

from __future__ import annotations

import glob
import os
import tempfile

import pyspark.sql.functions as F

from experiments_datafusion_spark.queries import round9 as R9


def test_mor_view_equals_cow_row_for_row(spark, sf_dir):
    """The MoR read (base anti-join sidecar) must equal the compacted
    copy-on-write result ROW FOR ROW — the aggregate audit in the
    registry key is necessary but not sufficient, so the full-row
    equality is pinned here."""
    from experiments_datafusion_spark.io import table

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    sidecar = base.where(F.col("o_custkey") % R9._MOR_MOD == 0).select("o_orderkey")
    mor = R9.mor_read(base, sidecar, "o_orderkey")
    cow = base.where(F.col("o_custkey") % R9._MOR_MOD != 0)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    mor_rows = key(mor)
    assert mor_rows == key(cow)
    assert mor_rows, "vacuous: delete cohort removed everything"
    # the cohort is really gone
    assert all(r[1] % R9._MOR_MOD != 0 for r in mor_rows)


def test_mor_read_plans_broadcast_anti(spark, sf_dir):
    """The production shape: BroadcastHashJoin LeftAnti with the sidecar
    as build side — the base is never shuffled for the delete."""
    from experiments_datafusion_spark.io import table
    from experiments_datafusion_spark.plans.audit import audit

    base = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sidecar = base.where(F.col("o_custkey") % R9._MOR_MOD == 0).select("o_orderkey")
    p = audit(R9.mor_read(base, sidecar, "o_orderkey"))
    assert "BroadcastHashJoin" in p.text and "LeftAnti" in p.text, p.text
    assert p.n_shuffles == 0, p.text


def test_table_delete_mor_cleans_temp_tree(spark, sf_dir):
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "mor_*")))
    df = R9.table_delete_mor(spark, sf_dir)
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "mor_*")))
    assert not (after - before)
    rows = {r.path: (r.n_rows, r.key_sum, r.cust_sum) for r in df.collect()}
    assert rows["mor"] == rows["cow"]
    assert rows["mor"][0] > 0
