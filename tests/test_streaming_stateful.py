"""Stateful streaming (applyInPandasWithState) + watermark late-data
semantics (SURVEY.md §7 slice 5 'streaming state + late data')."""

from __future__ import annotations

import shutil
import time

import pyspark.sql.functions as F
import pytest

from experiments_datafusion_spark.io import table as load_table
from experiments_datafusion_spark.streaming.stateful import running_user_totals


def _src(spark, d, sf_dir):
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = spark.readStream.schema(raw_schema).parquet(str(d))
    if dict(src.dtypes).get("ts") == "bigint":
        src = src.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return src


def test_stateful_running_totals_converges(spark, sf_dir, tmp_path):
    """Replaying the full events table through the stateful operator must
    converge to the batch groupBy answer (last update per user)."""
    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    out = running_user_totals(_src(spark, d, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sink_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["user_id"]: (r["events_seen"], r["value_sum"])
        for r in spark.table("sink_stateful").collect()
    }
    batch = {
        r["user_id"]: (r["events_seen"], r["value_sum"])
        for r in running_user_totals(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch


def test_watermark_drops_late_events(spark, sf_dir, tmp_path):
    """Two micro-batches: batch 1 advances the watermark far ahead; batch 2
    contains only events older than the watermark -> its rows must NOT
    create new windows in the aggregation output (append mode emits only
    finalized windows; the late window never appears)."""
    d = tmp_path / "late"
    d.mkdir()
    events = load_table(spark, sf_dir, "events").limit(0)  # schema only
    schema = events.schema

    recent = spark.createDataFrame(
        [(1, "2024-02-01 12:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-02-01 13:00:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    late = spark.createDataFrame(
        [(3, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    recent.write.mode("overwrite").parquet(str(d / "batch1"))

    src = spark.readStream.schema(recent.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(d / "batch1"))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("string").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sink_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # now append the late file and re-run from the same checkpointless source:
    # a fresh query over both files with maxFilesPerTrigger=1 processes them
    # as separate micro-batches in order
    late.write.mode("overwrite").parquet(str(d / "batch2"))
    merged = tmp_path / "merged"
    merged.mkdir()
    import os
    import time as _time

    now = _time.time()
    for i, sub in enumerate(["batch1", "batch2"]):
        for f in (d / sub).glob("*.parquet"):
            dst = merged / f"{i}_{f.name}"
            shutil.copy(f, dst)
            # FileStreamSource orders by (mtime, path); copies can land in
            # the same millisecond, which could admit both files into ONE
            # micro-batch (the late event then isn't late). Force strictly
            # increasing mtimes so batch order is deterministic.
            os.utime(dst, (now + i, now + i))
    src2 = spark.readStream.schema(recent.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(merged))
    agg2 = (
        src2.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("string").alias("ws"), "n")
    )
    q2 = (
        agg2.writeStream.format("memory")
        .queryName("sink_late2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    windows = {r["ws"] for r in spark.table("sink_late2").collect()}
    assert all(not w.startswith("2024-01-01") for w in windows), (
        f"late 2024-01-01 event created a window despite watermark: {windows}"
    )


def test_transform_with_state_converges_or_is_gated(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas twin: converges to the batch
    answer where the environment provides google.protobuf (the TWS state
    protocol dependency); without it the operator must raise its
    documented NotImplementedError, not crash mid-query."""
    from experiments_datafusion_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    d = tmp_path / "ev_tws"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    try:
        out = running_user_totals_tws(_src(spark, d, sf_dir))
    except NotImplementedError as e:
        assert "protobuf" in str(e)
        pytest.skip("transformWithStateInPandas gated: no google.protobuf")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("sink_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            r["user_id"]: (r["events_seen"], r["value_sum"])
            for r in spark.table("sink_tws").collect()
        }
    finally:
        # shared session fixture: don't leak RocksDB into later streaming tests
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    batch = {
        r["user_id"]: (r["events_seen"], r["value_sum"])
        for r in running_user_totals(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch


def test_streaming_ewma_matches_batch_key(spark, sf_dir, tmp_path):
    """The stateful streaming EWMA must reproduce the batch ev_ewma key
    row-for-row (same integer recurrence, state carried across the
    availableNow replay)."""
    from experiments_datafusion_spark.queries import all_queries
    from experiments_datafusion_spark.streaming.stateful import streaming_ewma

    d = tmp_path / "ewma"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    out = streaming_ewma(_src(spark, d, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sink_ewma")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["rn"]): r["ewma_u"]
        for r in spark.table("sink_ewma").collect()
    }
    batch = {
        (r["user_id"], r["rn"]): r["ewma_u"]
        for r in all_queries()["ev_ewma"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch

def test_streaming_rate_limit_matches_batch_key(spark, sf_dir, tmp_path):
    """The stateful streaming token bucket must reproduce the batch
    ev_rate_limit key row-for-row (same clamped integer recurrence, state
    carried across the availableNow replay)."""
    from experiments_datafusion_spark.queries import all_queries
    from experiments_datafusion_spark.streaming.stateful import streaming_rate_limit

    d = tmp_path / "rl"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    out = streaming_rate_limit(_src(spark, d, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sink_rl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["rn"]): (r["tokens_u"], r["accepted"])
        for r in spark.table("sink_rl").collect()
    }
    batch = {
        (r["user_id"], r["rn"]): (r["tokens_u"], r["accepted"])
        for r in all_queries()["ev_rate_limit"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_cusum_matches_batch_key(spark, sf_dir, tmp_path):
    """The stateful streaming CUSUM must reproduce the batch ev_cusum key
    row-for-row (same clamped integer recurrence, state carried across the
    availableNow replay)."""
    from experiments_datafusion_spark.queries import all_queries
    from experiments_datafusion_spark.streaming.stateful import streaming_cusum

    d = tmp_path / "cusum"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    out = streaming_cusum(_src(spark, d, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("sink_cusum")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["rn"]): (r["s_milli"], r["alarm"])
        for r in spark.table("sink_cusum").collect()
    }
    batch = {
        (r["user_id"], r["rn"]): (r["s_milli"], r["alarm"])
        for r in all_queries()["ev_cusum"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_holt_matches_batch_key(spark, sf_dir, tmp_path):
    """The stateful streaming Holt smoother must reproduce the batch
    ts_holt_linear key exactly — multi-micro-batch replay (3 files), so
    the 2-vector (level, trend) state genuinely CARRIES across batches."""
    from experiments_datafusion_spark.queries import all_queries
    from experiments_datafusion_spark.streaming.stateful import streaming_holt

    d = tmp_path / "holt"
    d.mkdir()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # 3 time-sliced files appended SEQUENTIALLY (distinct mod times) +
    # maxFilesPerTrigger=1 -> 3 micro-batches arriving in event-time order
    # per key (the operator's in-order-arrival contract; FileStreamSource
    # picks files up oldest-first)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    for i in range(3):
        sl = ev.where(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span) if i < 2 else F.lit(True))
        )
        sl.coalesce(1).write.mode("append").parquet(str(d))
        time.sleep(1.1)
    raw_schema = spark.read.parquet(str(d)).schema
    src = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    out = streaming_holt(src)
    q = (
        out.writeStream.format("memory")
        .queryName("sink_holt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["rn"]): (r["level_u"], r["trend_u"], r["forecast_u"])
        for r in spark.table("sink_holt").collect()
    }
    batch = {
        (r["user_id"], r["rn"]): (r["level_u"], r["trend_u"], r["forecast_u"])
        for r in all_queries()["ts_holt_linear"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch and len(batch) > 0
