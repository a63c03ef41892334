"""Round-11 operators: writer concurrency beyond blind appends — the
snapshot log's optimistic-concurrency path for REWRITE commits
(``commit_rewrite_checked``), demonstrated end-to-end as a DELETE racing a
late-arriving append, plus clustered compaction.

The reference repo (a single-process sort bench, lib.rs:23-87) has no
multi-writer story; the semantics here follow the PUBLIC Delta protocol's
conflict-detection rules (WriteSerializable): a blind append commutes with
a rewrite of disjoint files and is carried forward by the rebase; a
rewrite touching the same files aborts loudly.

Same contract as every module: the Spark plan you'd ship at 100 TB with a
DuckDB oracle replaying the semantics exactly; exact integers only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import materialize_then_rmtree, table
from experiments_datafusion_spark.operators.table_format import (
    SnapshotLog,
)
from experiments_datafusion_spark.queries import register

# user-id band for the clustering-compaction key — distinct from
# scan_pruning_zorder's 2..5 x-band so the two keys can't verify each other
_CC_LO, _CC_HI = 3, 9


@register(
    "table_compact_cluster",
    tags=("io", "maintenance", "layout"),
    oracle=f"""
SELECT CAST(count(*) AS BIGINT)        AS n_rows,
       CAST(sum(event_id) AS BIGINT)   AS id_sum,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                                       AS value_units
FROM events
WHERE user_id BETWEEN {_CC_LO} AND {_CC_HI}
""",
)
def table_compact_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING compaction (Delta OPTIMIZE ... ZORDER BY in its 1-D
    form): a round-robin-landed events table — every file's [lo, hi]
    spans the whole user_id domain, so manifest pruning keeps ALL files
    (asserted as the counterfactual) — is compacted with
    ``compact(sort_cols=["user_id"])``: files cut by range partition,
    sorted within, write-time stats recorded in the new manifest.  A
    user-band query then prunes the COMPACTED manifest driver-side
    (asserted: survivors < total) and scans only surviving files with
    the residual filter, oracled against the raw-events recompute.  The
    point at 100 TB: a compaction that round-robins silently REVOKES a
    table's file-skipping; OPTIMIZE takes the sort spec so small-file
    health and pruning health are the same maintenance pass."""
    import tempfile

    root = tempfile.mkdtemp(prefix="tcc_")
    log = SnapshotLog(root)
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    v0 = log.commit(
        ev.repartition(16), note="unclustered landing", stats_cols=["user_id"]
    )
    # counterfactual: the unclustered layout prunes NOTHING
    f0 = [f for f in log.entry(v0)["files"] if f["n_rows"] > 0]
    keep0 = [
        f
        for f in f0
        if f["stats"]["user_id"][1] >= _CC_LO and f["stats"]["user_id"][0] <= _CC_HI
    ]
    assert len(keep0) == len(f0), "unclustered layout unexpectedly prunable"

    # target ~8 clustered files at EVERY scale (sizing from the manifest,
    # as compact itself does)
    total = sum(f["size"] for f in log.entry(v0)["files"])
    v1 = log.compact(
        spark, target_file_bytes=max(8 * 1024, total // 8), sort_cols=["user_id"]
    )
    f1 = [f for f in log.entry(v1)["files"] if f["n_rows"] > 0]
    survivors = [
        f["path"]
        for f in f1
        if f["stats"]["user_id"][1] >= _CC_LO and f["stats"]["user_id"][0] <= _CC_HI
    ]
    assert 0 < len(survivors) < len(f1), (len(survivors), len(f1))
    band = log.read_files(spark, survivors).where(
        F.col("user_id").between(_CC_LO, _CC_HI)
    )
    out = band.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("bigint")
        .alias("value_units"),
    )
    return materialize_then_rmtree(out, root)


# cutover + delete band — distinct from every other maintenance key's
# constants (table_delete_pruned bands custkey 2..40 with no cut;
# table_time_travel cuts 1995-06-01; CDF cuts 1996-01-01) so no two keys
# can accidentally verify each other.
_CR_CUT = "1997-03-01"
_CR_LO, _CR_HI = 5, 47  # delete-cohort band — non-empty at sf0.001
_CR_FILES = 8


@register(
    "table_concurrent_rewrite",
    tags=("io", "maintenance", "layout"),
    oracle=f"""
SELECT CAST(3 AS BIGINT)                AS n_versions,
       CAST(count(*) AS BIGINT)         AS n_rows,
       CAST(sum(o_custkey) AS BIGINT)   AS cust_sum,
       CAST(sum(o_orderkey) AS BIGINT)  AS key_sum
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_CR_CUT}'
   OR o_custkey NOT BETWEEN {_CR_LO} AND {_CR_HI}
""",
)
def table_concurrent_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE racing a concurrent APPEND on one table — the multi-writer
    dataflow ``commit_rewrite_checked`` exists for.  The table holds
    pre-cut orders custkey-clustered into {_CR_FILES} files with
    write-time stats; a compliance DELETE of the custkey band derives its
    affected/kept file split from v0's manifest stats (O(affected) data
    rewritten, untouched files carried by reference), but BEFORE its
    publish lands, a late-arrival append (the post-cut orders) wins the
    version race — forced deterministically by interposing the append
    inside the rewrite's first publish attempt, so the CommitConflict →
    compatibility-check → rebase → retry path genuinely executes.  The
    rebase carries the appended files forward UNCHANGED: per Delta's
    WriteSerializable rule the append lands as if after the delete, so
    appended rows are NOT re-filtered by the delete predicate — which the
    oracle pins in SQL (post-cut rows survive even inside the band;
    pre-cut rows survive only outside it).  n_versions pins that BOTH
    commits landed (v0 + append + rebased rewrite).  At 100 TB this is
    continuous maintenance (DELETE/UPDATE/compaction) running against a
    table streaming writers append to, without stopping either side."""
    import tempfile

    root = tempfile.mkdtemp(prefix="tcr_")
    log = SnapshotLog(root)
    proj = ["o_orderkey", "o_custkey", "o_orderdate"]
    orders = table(spark, sf_dir, "orders").select(*proj)
    base = orders.where(F.col("o_orderdate") < _CR_CUT).repartitionByRange(
        _CR_FILES, "o_custkey"
    )
    log.commit(base, note="v0 pre-cut orders", stats_cols=["o_custkey"])

    # the DELETE derives its file split from v0's WRITE-TIME stats — the
    # manifest is the catalog; no data file is opened to plan the rewrite
    files = log.entry(0)["files"]
    affected = [
        f["path"]
        for f in files
        if f["n_rows"] > 0
        and f["stats"]["o_custkey"][1] >= _CR_LO
        and f["stats"]["o_custkey"][0] <= _CR_HI
    ]
    kept = [f["path"] for f in files if f["path"] not in set(affected)]
    rewritten = spark.read.parquet(*affected).where(
        ~F.col("o_custkey").between(_CR_LO, _CR_HI)
    )

    # interpose the racing append inside the rewrite's first publish
    # attempt: the append wins the version, the rewrite must rebase
    real_publish = log._publish
    state = {"interposed": False}

    def losing_first_publish(version: int, entry: dict) -> None:
        if not state["interposed"]:
            state["interposed"] = True
            SnapshotLog(root).commit_append_rebased(
                orders.where(F.col("o_orderdate") >= _CR_CUT),
                note="late-arrival append",
            )
        real_publish(version, entry)

    log._publish = losing_first_publish
    try:
        log.commit_rewrite_checked(
            rewritten,
            keep_files=kept,
            removed_files=affected,
            note=f"delete custkey in [{_CR_LO}, {_CR_HI}]",
        )
    finally:
        log._publish = real_publish
    assert state["interposed"]

    n_versions = len(log.versions())
    out = log.read(spark).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_custkey").cast("bigint").alias("cust_sum"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    ).select(
        F.lit(n_versions).cast("bigint").alias("n_versions"),
        "n_rows",
        "cust_sum",
        "key_sum",
    )
    return materialize_then_rmtree(out, root)
