"""One-off scale probes for the round-10 table-format layer at 10M rows.

Answers the four "does this hold a decade up?" questions the registry keys
demonstrate at sf scale, with wall-clock evidence on a quiet host:

  1. APPEND vs FULL-REWRITE commit: an O(batch) append of 100k rows into a
     10M-row table vs re-committing the whole table (the reason streaming
     ingest uses add-file commits).
  2. IVM consumer: folding 100k CDF change rows into a 1k-group
     materialized view (apply) vs re-aggregating the 10M-row table
     (recompute) — the O(changes)-vs-O(table) claim of
     table_changes_apply.
  3. BLOOM file skipping: per-file bloom build cost over 32 files of 10M
     rows, then a 3-key point lookup scanning only the admitted files vs
     scanning all 32 (the scan_pruning_bloom claim off-sf).
  4. STATS-ONLY aggregate: write-time stats overhead on the commit, then
     count/min/max answered from the manifest in ~0 s (the
     table_stats_only claim off-sf).

Prints ONE JSON line.  Usage: python tools/probe_table_format.py [rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    batch = rows // 100
    from experiments_datafusion_spark.operators.table_format import (
        SnapshotLog,
        changes_between,
    )
    from experiments_datafusion_spark.session import get_spark

    spark = get_spark("probe-table-format")
    out: dict = {"rows": rows, "batch": batch, "prelaunch_loadavg": list(os.getloadavg())}

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        return time.perf_counter() - t0, r

    base = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("g"),
        (F.col("id") * 37 % 100_000).alias("v"),
    )
    newrows = spark.range(rows, rows + batch).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("g"),
        (F.col("id") * 37 % 100_000).alias("v"),
    )

    # 1. append vs full rewrite
    root = tempfile.mkdtemp(prefix="probe_tf_")
    log = SnapshotLog(f"{root}/t")
    out["commit_base_s"], _ = timed(lambda: log.commit(base.repartition(32)))
    out["append_batch_s"], _ = timed(lambda: log.commit_append(newrows))
    out["full_rewrite_s"], _ = timed(
        lambda: log.commit(log.read(spark, 1).repartition(32))
    )

    # 2. IVM apply vs recompute (consumer cost only: CDF rows pre-materialized)
    v1 = log.read(spark, 1)
    view0 = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    view0.write.parquet(f"{root}/view0")
    changes_between(
        log.read(spark, 0), v1, key="k", payload=["g", "v"]
    ).write.parquet(f"{root}/cdf")
    cdf = spark.read.parquet(f"{root}/cdf")
    mv = spark.read.parquet(f"{root}/view0")

    def apply_deltas():
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            cdf.select("g", sign.alias("s"), "v")
            .groupBy("g")
            .agg(F.sum("s").alias("dn"), F.sum(F.col("s") * F.col("v")).alias("dv"))
        )
        return (
            mv.alias("v")
            .join(delta.alias("d"), "g", "full_outer")
            .select(
                F.coalesce(F.col("v.n"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0))
            )
            .agg(F.count(F.lit(1)))
            .collect()
        )

    out["ivm_apply_s"], _ = timed(apply_deltas)
    out["ivm_recompute_s"], _ = timed(
        lambda: v1.groupBy("g")
        .agg(F.count(F.lit(1)), F.sum("v"))
        .agg(F.count(F.lit(1)))
        .collect()
    )

    # 3. bloom build + pruned point lookup vs full scan
    from experiments_datafusion_spark.operators.table_format import (
        bloom_probe_positions,
        bloom_prune,
        file_bloom,
    )

    probes = [7, rows // 2 + 1, rows - 3]
    # (a) the sf-scale default m: at rows/32 keys per file an 8192-bit bloom
    # SATURATES — every position set, prune keeps all files.  Conservative
    # (never wrong), but the skipping power is gone: bloom sizing must
    # track per-file key count (~10-12 bits/key), like real formats do.
    t0 = time.perf_counter()
    blooms_fixed = file_bloom(log.read(spark, 0), "k")
    out["bloom_fixed_build_s"] = time.perf_counter() - t0
    out["bloom_fixed_files_kept"] = len(
        bloom_prune(blooms_fixed, bloom_probe_positions(spark, probes))
    )
    # (b) sized bloom: m = 12 bits/key
    m_sized = max(8192, (rows // 32) * 12)
    t0 = time.perf_counter()
    blooms = file_bloom(log.read(spark, 0), "k", m=m_sized)
    out["bloom_sized_m"] = m_sized
    out["bloom_sized_build_s"] = time.perf_counter() - t0
    # (c) packed 64-bit-word representation at the same sized m — the
    # production storage shape; A/B of build cost + driver state vs the
    # positions-set collect
    from experiments_datafusion_spark.operators.table_format import (
        bloom_prune_packed,
        file_bloom_packed,
    )

    t0 = time.perf_counter()
    packed = file_bloom_packed(log.read(spark, 0), "k", m=m_sized)
    out["bloom_packed_build_s"] = time.perf_counter() - t0
    out["bloom_packed_words"] = sum(len(bm) for bm in packed.values())
    out["bloom_positions_total"] = sum(len(r.positions) for r in blooms)
    packed_kept = bloom_prune_packed(
        packed, bloom_probe_positions(spark, probes, m=m_sized)
    )
    survivors = bloom_prune(blooms, bloom_probe_positions(spark, probes, m=m_sized))
    assert sorted(packed_kept) == sorted(
        p[len("file:"):] if p.startswith("file:") else p for p in survivors
    ) or packed_kept == survivors, (packed_kept, survivors)
    out["bloom_files_kept"] = len(survivors)
    out["bloom_files_total"] = len(blooms)
    out["bloom_scan_pruned_s"], _ = timed(
        lambda: log.read_files(spark, survivors)
        .where(F.col("k").isin(probes))
        .collect()
    )
    out["bloom_scan_all_s"], _ = timed(
        lambda: log.read(spark, 0).where(F.col("k").isin(probes)).collect()
    )

    # 4. write-time stats overhead + stats-only answer
    log2 = SnapshotLog(f"{root}/t2")
    out["commit_with_stats_s"], _ = timed(
        lambda: log2.commit(base.repartition(32), stats_cols=["k"])
    )
    out["stats_only_s"], ans = timed(lambda: log2.stats_only_agg(0, "k"))
    assert ans == (rows, 0, rows - 1), ans

    # 5. (round 11) pruned DELETE racing concurrent appends: a
    # stats-pruned checked rewrite of ONE clustered file out of 32 while
    # 4 threads append — wall clock vs the same five commits sequential,
    # all five landing.  The claim: the rewrite pays O(affected file) data
    # + O(live files) log rebases, not O(table), and appenders are never
    # blocked (no lock — optimistic rebase on both sides).
    import threading

    log3 = SnapshotLog(f"{root}/t3")
    log3.commit(
        base.repartitionByRange(32, "k"), note="clustered", stats_cols=["k"]
    )
    files3 = log3.entry(0)["files"]
    lo, hi = 5, rows // 64  # a band inside the first file's range
    affected = [
        f["path"]
        for f in files3
        if f["n_rows"] > 0 and f["stats"]["k"][1] >= lo and f["stats"]["k"][0] <= hi
    ]
    kept = [f["path"] for f in files3 if f["path"] not in set(affected)]
    out["rewrite_affected_files"] = len(affected)
    out["rewrite_total_files"] = len(files3)
    appends = [
        spark.range(rows + (i + 1) * batch, rows + (i + 2) * batch).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).alias("g"),
            (F.col("id") * 37 % 100_000).alias("v"),
        )
        for i in range(4)
    ]
    errors: list = []

    def rewriter():
        try:
            SnapshotLog(f"{root}/t3").commit_rewrite_checked(
                spark.read.parquet(*affected).where(~F.col("k").between(lo, hi)),
                keep_files=kept,
                removed_files=affected,
                note="band delete",
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def appender(i):
        try:
            SnapshotLog(f"{root}/t3").commit_append_rebased(appends[i], note=f"a{i}")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    threads.append(threading.Thread(target=rewriter))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out["concurrent_delete_plus_4_appends_s"] = time.perf_counter() - t0
    assert not errors, errors
    assert log3.latest_version() == 5
    expect = rows - (hi - lo + 1) + 4 * batch
    n = log3.read(spark).count()
    assert n == expect, (n, expect)
    # sequential twin for the wall-clock comparison
    log4 = SnapshotLog(f"{root}/t4")
    log4.commit(
        base.repartitionByRange(32, "k"), note="clustered", stats_cols=["k"]
    )
    t0 = time.perf_counter()
    for i in range(4):
        log4.commit_append(appends[i], note=f"a{i}")
    files4 = log4.entry(0)["files"]
    aff4 = [
        f["path"]
        for f in files4
        if f["n_rows"] > 0 and f["stats"]["k"][1] >= lo and f["stats"]["k"][0] <= hi
    ]
    log4.commit_rewrite_checked(
        spark.read.parquet(*aff4).where(~F.col("k").between(lo, hi)),
        keep_files=[f["path"] for f in files4 if f["path"] not in set(aff4)],
        removed_files=aff4,
        note="band delete",
    )
    out["sequential_delete_plus_4_appends_s"] = time.perf_counter() - t0

    # 6. STREAMING-SINK throughput (round 12): the same rows ingested
    #    through the public writer API (executor Arrow-batch task files +
    #    one put-if-absent commit per micro-batch) vs the foreachBatch +
    #    append_once path it replaces — both 4 micro-batches, exactly-once
    #    either way; the sink's edge is zero user code, the question here
    #    is whether the writer-API plumbing costs throughput.
    from experiments_datafusion_spark.operators.table_format import append_once
    from experiments_datafusion_spark.sources.sortbench_source import (
        register_sources,
    )

    register_sources(spark)
    sink_rows = rows // 10
    src_dir = tempfile.mkdtemp(prefix="probe_sink_src_")
    spark.range(sink_rows).select(
        "id", (F.col("id") % 997).alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def drain_sink():
        troot = tempfile.mkdtemp(prefix="probe_sinkt_")
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.format("snaplog")
            .option("path", f"{troot}/t")
            .option("appId", "probe")
            .option("checkpointLocation", f"{troot}/chk")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        n = SnapshotLog(f"{troot}/t").read(spark).count()
        assert n == sink_rows, n
        return troot

    def drain_sink_fast():
        # round 13: the packaged JVM fast path — foreachBatch-shaped
        # write job + the sink's commit_append_files protocol
        from experiments_datafusion_spark.sources.snaplog_source import (
            snaplog_fast_sink,
        )

        troot = tempfile.mkdtemp(prefix="probe_fast_")
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.foreachBatch(snaplog_fast_sink(f"{troot}/t", "probe"))
            .option("checkpointLocation", f"{troot}/chk")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        n = SnapshotLog(f"{troot}/t").read(spark).count()
        assert n == sink_rows, n
        return troot

    def drain_foreachbatch():
        troot = tempfile.mkdtemp(prefix="probe_fbt_")
        log = SnapshotLog(f"{troot}/t")

        def ingest(batch_df, batch_id):
            append_once(log, batch_df, app_id="probe", txn_version=batch_id)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", f"{troot}/chk")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        n = log.read(spark).count()
        assert n == sink_rows, n
        return troot

    import shutil

    for name, fn in (
        ("sink_api", drain_sink),
        ("sink_fast", drain_sink_fast),
        ("foreachbatch", drain_foreachbatch),
    ):
        _warm = fn()  # one warm pass (codegen + stream machinery)
        shutil.rmtree(_warm, ignore_errors=True)
        t0 = time.perf_counter()
        troot = fn()
        dt = time.perf_counter() - t0
        shutil.rmtree(troot, ignore_errors=True)
        out[f"ingest_{name}_s"] = round(dt, 3)
        out[f"ingest_{name}_rows_per_s"] = int(sink_rows / dt)
    shutil.rmtree(src_dir, ignore_errors=True)

    # 7. PACED long-log drain (round 12): a 16-commit log (rows//10 total)
    #    drained under maxFilesPerTrigger=4 — the backfill shape the knob
    #    exists for.  Evidence: the whole history arrives in bounded
    #    4-file windows (per-batch row counts recorded) instead of one
    #    16-file mega-batch, at what throughput.
    paced_rows = rows // 10
    proot = tempfile.mkdtemp(prefix="probe_paced_")
    plog = SnapshotLog(f"{proot}/t")
    per = paced_rows // 16
    for i in range(16):
        plog.commit_append(
            spark.range(i * per, (i + 1) * per).select(
                "id", (F.col("id") % 997).alias("k")
            ).repartition(4),
            note=f"a{i}",
        )
    batch_rows: list = []

    def paced_sink(df, bid):
        batch_rows.append(df.count())

    t0 = time.perf_counter()
    q = (
        spark.readStream.format("snaplog")
        .option("path", f"{proot}/t")
        .option("maxFilesPerTrigger", "4")
        .load()
        .writeStream.foreachBatch(paced_sink)
        .option("checkpointLocation", f"{proot}/chk")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    while time.perf_counter() - t0 < 600 and sum(batch_rows) < paced_rows:
        time.sleep(0.2)
    q.stop()
    dt = time.perf_counter() - t0
    assert sum(batch_rows) == paced_rows, (sum(batch_rows), paced_rows)
    out["paced_drain_s"] = round(dt, 3)
    out["paced_drain_rows_per_s"] = int(paced_rows / dt)
    out["paced_drain_batches"] = len([b for b in batch_rows if b])
    out["paced_drain_max_batch_rows"] = max(batch_rows)
    shutil.rmtree(proot, ignore_errors=True)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
