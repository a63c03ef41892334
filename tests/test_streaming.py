"""Structured Streaming execution of the shared pipelines: replay the events
parquet through readStream (availableNow trigger) and check the result agrees
with the batch execution of the SAME pipeline function (SURVEY.md §7 slice 5).
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from experiments_datafusion_spark.io import table as load_table
from experiments_datafusion_spark.streaming import pipelines


@pytest.fixture(scope="module")
def events_stream_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _stream_source(spark, events_stream_dir, sf_dir):
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = spark.readStream.schema(raw_schema).parquet(events_stream_dir)
    if dict(src.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) read as long
        src = src.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return src


def _run_to_memory(out, name, mode):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _norm(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize(
    "fn,mode",
    [
        (lambda df: pipelines.tumbling_counts(df, "1 hour"), "complete"),
        (lambda df: pipelines.sliding_counts(df, "1 hour", "30 minutes"), "complete"),
        (lambda df: pipelines.sessionize(df, "10 minutes"), "complete"),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_matches_batch(spark, sf_dir, events_stream_dir, fn, mode, request):
    name = f"sink_{request.node.callspec.id}"
    out = fn(_stream_source(spark, events_stream_dir, sf_dir))
    _run_to_memory(out, name, mode)
    streamed = spark.table(name)
    batch = fn(load_table(spark, sf_dir, "events"))
    assert _norm(streamed) == _norm(batch)


def test_stream_dedup_runs(spark, sf_dir, events_stream_dir):
    out = pipelines.dedup_events(_stream_source(spark, events_stream_dir, sf_dir))
    _run_to_memory(out, "sink_dedup", "append")
    n_stream = spark.table("sink_dedup").count()
    n_batch = pipelines.dedup_events(load_table(spark, sf_dir, "events")).count()
    assert n_stream == n_batch


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-static join: the static profile side is a batch DataFrame
    broadcast into every micro-batch."""
    ev_batch = load_table(spark, sf_dir, "events")
    profile = (
        ev_batch.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum("value").alias("lifetime_value"),
            F.count(F.lit(1)).alias("n_past_events"),
        )
    )
    out = pipelines.enrich_with_profile(
        _stream_source(spark, events_stream_dir, sf_dir), profile
    )
    _run_to_memory(out, "sink_enrich", "append")
    assert _norm(spark.table("sink_enrich")) == _norm(
        pipelines.enrich_with_profile(ev_batch, profile)
    )


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join with watermarks on both sides; inner
    join results emit eagerly, availableNow drains the replay."""
    clicks_s = _stream_source(spark, events_stream_dir, sf_dir).where(
        F.col("event_type") == "click"
    )
    purch_s = _stream_source(spark, events_stream_dir, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    out = pipelines.attribute_purchases(clicks_s, purch_s, "1 hour")
    _run_to_memory(out, "sink_attr", "append")
    ev = load_table(spark, sf_dir, "events")
    batch = pipelines.attribute_purchases(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        "1 hour",
    )
    assert _norm(spark.table("sink_attr")) == _norm(batch)


def test_stream_upsert_totals_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch CDC upsert: split the events into 3 files so availableNow
    + maxFilesPerTrigger=1 produces 3 micro-batches, i.e. 3 incremental
    merges that must COMPOSE to the batch answer (a single-batch run would
    not exercise the merge path at all)."""
    src_dir = tmp_path / "ev_upsert_src"
    src_dir.mkdir()
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(3).write.mode("overwrite").parquet(str(src_dir))

    raw_schema = spark.read.parquet(str(src_dir)).schema
    src = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    target = str(tmp_path / "ev_upsert_target")
    q = pipelines.stream_upsert_totals(src, target)
    q.awaitTermination(180)

    merged = {
        r["user_id"]: (r["events_seen"], round(r["value_sum"], 2))
        for r in spark.read.parquet(target).collect()
    }
    batch = {
        r["user_id"]: (r["events_seen"], round(r["value_sum"], 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.sum("value").alias("value_sum"),
        )
        .collect()
    }
    assert merged == batch


def test_python_streaming_source_replays_batch_rows(spark, tmp_path):
    """The custom Python source also streams: offset-managed micro-batches
    ({"next_id": k} checkpoints) whose union equals the batch scan exactly —
    deterministic ranges are what make recovery replay exact."""
    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    opts = {"case": "mixed-tuple", "n": "250", "rows_per_batch": "60"}
    stream = spark.readStream.format("sortbench").options(**opts).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("sortbench_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = sorted(map(tuple, spark.table("sortbench_stream_sink").collect()))
    batch = sorted(
        map(
            tuple,
            spark.read.format("sortbench").options(**opts).load().collect(),
        )
    )
    assert streamed == batch
    assert len(streamed) == 250


def test_stream_stream_left_outer_join_watermark_contract(
    spark, sf_dir, events_stream_dir
):
    """Stream-stream LEFT OUTER interval join: matched rows emit eagerly
    and must equal the batch inner results; null-padded (unconverted)
    rows emit only once the watermark proves no match can arrive, so the
    drained replay yields the batch outer answer MINUS a tail bounded by
    horizon + watermark delay.  Pin all three halves of that contract."""
    clicks_s = _stream_source(spark, events_stream_dir, sf_dir).where(
        F.col("event_type") == "click"
    )
    purch_s = _stream_source(spark, events_stream_dir, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    out = pipelines.attribute_purchases(clicks_s, purch_s, "1 hour", how="left_outer")
    _run_to_memory(out, "sink_attr_outer", "append")
    streamed = _norm(spark.table("sink_attr_outer"))

    ev = load_table(spark, sf_dir, "events")
    clicks_b = ev.where(F.col("event_type") == "click")
    batch = _norm(
        pipelines.attribute_purchases(
            clicks_b,
            ev.where(F.col("event_type") == "purchase"),
            "1 hour",
            how="left_outer",
        )
    )
    assert set(streamed) <= set(batch)
    # matched rows (purchase_id non-null) are inner-join results: equal
    matched_s = [r for r in streamed if r[1] != "None"]
    matched_b = [r for r in batch if r[1] != "None"]
    assert matched_s == matched_b
    # every withheld row is a NULL-padded click inside the undecidable
    # tail: click_ts > max_ts - horizon - delay
    withheld = set(batch) - set(streamed)
    assert all(r[1] == "None" for r in withheld)
    if withheld:
        import datetime

        # the global watermark is the MINIMUM over both input streams'
        # (max event time - delay); eviction emits null-padded clicks with
        # click_ts + horizon < watermark, so the undecidable tail starts at
        # min(max_click_ts, max_purchase_ts) - horizon - delay
        wm_base = min(
            clicks_b.agg(F.max("ts")).collect()[0][0],
            ev.where(F.col("event_type") == "purchase")
            .agg(F.max("ts"))
            .collect()[0][0],
        )
        cutoff = wm_base - datetime.timedelta(hours=1, minutes=30)
        tail_ids = {
            str(r["event_id"])
            for r in clicks_b.where(F.col("ts") > cutoff).collect()
        }
        assert {r[0] for r in withheld} <= tail_ids


def test_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """Spark 4 dropDuplicatesWithinWatermark: streaming dedup whose state
    evicts on the watermark (plain dropDuplicates keeps ALL keys forever —
    the unbounded-state failure mode).  Replay the events twice (two
    copies of the file) so every event_id genuinely duplicates; the
    drained result must equal the batch distinct."""
    import shutil

    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    src = _stream_source(spark, str(d), sf_dir)
    # watermark needs TIMESTAMP (LTZ); the fixture reads as NTZ — session
    # tz is UTC so the cast is value-preserving (pipelines._ensure_ltz)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    out = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    _run_to_memory(out, "sink_ddww", "append")
    streamed = _norm(spark.table("sink_ddww"))
    batch = _norm(
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type"
        ).distinct()
    )
    assert streamed == batch
