"""Round-10: snapshot-log layer semantics + change-data-feed invariants."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from experiments_datafusion_spark.operators.table_format import (
    SnapshotLog,
    changes_between,
    merge_upsert,
)
from experiments_datafusion_spark.queries import all_queries


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_log_commit_read_roundtrip(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))
    v = log.commit(df, note="first")
    assert v == 0
    back = log.read(spark, v)
    assert sorted(r.id for r in back.collect()) == list(range(100))
    assert log.versions() == [0]
    assert log.entry(0)["note"] == "first"


def test_snapshot_isolation_and_as_of(spark, tmp_path):
    """A later commit never touches an earlier version's files; AS OF reads
    resolve through the manifest, so each version returns its own rows."""
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(spark.range(10))
    files_v0 = {(fe.path, fe.size, os.path.getmtime(fe.path)) for fe in log.manifest(0)}
    log.commit(spark.range(20))
    assert {
        (fe.path, fe.size, os.path.getmtime(fe.path)) for fe in log.manifest(0)
    } == files_v0
    assert log.read(spark, 0).count() == 10
    assert log.read(spark, 1).count() == 20
    assert log.read(spark).count() == 20  # default = latest
    # manifests are disjoint: copy-on-write, never shared files
    assert not {f.path for f in log.manifest(0)} & {f.path for f in log.manifest(1)}


def test_vacuum_removes_only_dead_files(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(spark.range(10))
    log.commit(spark.range(20))
    dead = {fe.path for fe in log.manifest(0)}
    live = {fe.path for fe in log.manifest(1)}
    removed = set(log.vacuum(keep={1}))
    assert removed == dead
    assert all(os.path.exists(p) for p in live)
    assert log.read(spark, 1).count() == 20
    # the vacuumed version is gone for good
    with pytest.raises(Exception):
        log.read(spark, 0).count()


def test_read_as_of_schema_evolution(spark, tmp_path):
    """Snapshots written before ADD COLUMN surface the new column as NULL."""
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(spark.range(3).select(F.col("id").alias("k")))
    log.commit(
        spark.range(3).select(F.col("id").alias("k"), F.lit("new").alias("extra"))
    )
    allv = log.read_as_of(spark, (0, 1))
    got = {(r.version, r.extra) for r in allv.select("version", "extra").distinct().collect()}
    assert got == {(0, None), (1, "new")}


def test_compact_is_a_commit(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit(spark.range(1000).repartition(8))
    assert len(log.manifest(0)) == 8
    v1 = log.compact(spark, target_file_bytes=1 << 40)
    assert len(log.manifest(v1)) == 1
    # old version still readable until vacuumed (OPTIMIZE never destroys)
    assert log.read(spark, 0).count() == 1000
    assert log.read(spark, v1).count() == 1000


def test_merge_upsert_source_wins_and_evolves(spark):
    t = _df(spark, [(1, "a"), (2, "b")], "k long, v string")
    s = _df(spark, [(2, "B", 9), (3, "C", 7)], "k long, v string, extra long")
    got = {
        (r.k, r.v, r.extra)
        for r in merge_upsert(t, s, key="k").collect()
    }
    # source wins on collision; target-only rows carry NULL for the new col
    assert got == {(1, "a", None), (2, "B", 9), (3, "C", 7)}


def test_changes_between_classes(spark):
    v0 = _df(spark, [(1, "a"), (2, "b"), (3, None)], "k long, v string")
    v1 = _df(spark, [(2, "B"), (3, None), (4, "d")], "k long, v string")
    rows = changes_between(v0, v1, key="k", payload=["v"]).collect()
    got = {(r.k, r.v, r._change_type) for r in rows}
    # k=3 has a NULL payload on both sides -> unchanged (eqNullSafe), no row
    assert got == {
        (1, "a", "delete"),
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
        (4, "d", "insert"),
    }


def test_table_changes_all_classes_nonvacuous(spark, sf_dir):
    df = all_queries()["table_changes"].fn(spark, sf_dir)
    counts = {r._change_type: r.n for r in
              df.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"insert", "delete", "update_preimage", "update_postimage"}
    assert all(v > 0 for v in counts.values())
    # pre/post come in pairs — one retraction per application
    assert counts["update_preimage"] == counts["update_postimage"]
