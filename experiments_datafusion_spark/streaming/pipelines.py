"""Event-time pipelines, written once and applied to BOTH batch DataFrames
and Structured Streaming DataFrames (SURVEY.md §2B Streaming row: the
reference's dependency has stream-shaped execution only — Vec<RecordBatch>
streams mirrored at /root/reference/src/data.rs:245-261 — while real
event-time semantics (watermarks, session windows) come from Spark).

Batch callers get the oracle-checkable versions (queries/events.py);
streaming callers (tests/test_streaming.py) run the same functions behind
``readStream`` with ``withWatermark`` for state cleanup at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_watermark(df: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Late-data bound; on a stream this bounds window state size (critical
    at 100 TB — without it session/window state grows unboundedly).

    Spark only accepts TIMESTAMP_LTZ as an event-time column; parquet files
    whose timestamps carry isAdjustedToUTC=false arrive as TIMESTAMP_NTZ, so
    coerce first (session tz is pinned to UTC, making the cast
    value-preserving)."""
    if not df.isStreaming:
        return df
    return _ensure_ltz(df, "ts").withWatermark("ts", delay)


def _ensure_ltz(df: DataFrame, col: str) -> DataFrame:
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows: count + value sum per window x type."""
    return (
        with_watermark(events)
        .groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in duration/slide
    windows."""
    return (
        with_watermark(events)
        .groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sessionize(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence.
    Works identically on batch and streams (dynamic-gap session_window)."""
    return (
        with_watermark(events)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sess.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sess.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Exactly-once by event_id; on a stream, the watermark bounds the
    dedup state (dropDuplicatesWithinWatermark)."""
    if events.isStreaming:
        return (
            _ensure_ltz(events, "ts")
            .withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
    return events.dropDuplicates(["event_id"])


def enrich_with_profile(events: DataFrame, profile: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with a (static) per-user
    profile dimension.  The static side is broadcast — on a stream Spark
    re-plans it per micro-batch, so the enrichment never shuffles the
    stream side; this is the standard dimension-enrichment pattern at
    scale (profile tables are small relative to the event firehose)."""
    return (
        events.join(F.broadcast(profile), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.coalesce(F.col("lifetime_value"), F.lit(0.0)), 2).alias(
                "lifetime_value"
            ),
            F.coalesce(F.col("n_past_events"), F.lit(0)).alias("n_past_events"),
        )
    )


def attribute_purchases(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the clicks
    by the same user within [click_ts, click_ts + horizon].  On streams
    both sides carry watermarks, which (with the interval bound) let Spark
    evict join state — unbounded state is the classic stream-join failure
    mode at scale.  Inner join results emit eagerly; how="left_outer"
    additionally emits never-converted clicks with NULL purchase columns —
    on a stream those rows emit only once the watermark proves no match
    can still arrive (click_ts + horizon + watermark delay has passed),
    so a drained replay withholds the final tail
    (tests/test_streaming.py pins both halves of that contract)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = _ensure_ltz(c, "click_ts").withWatermark("click_ts", "30 minutes")
    if purchases.isStreaming:
        p = _ensure_ltz(p, "p_ts").withWatermark("p_ts", "30 minutes")
    joined = c.join(
        p,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    return joined.select(
        "click_id",
        "purchase_id",
        # left_outer: user_id comes from the (possibly null-padded) right
        # side; recover it from the left key so unconverted clicks keep it
        F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        F.round("purchase_value", 2).alias("purchase_value"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("click_ts")).alias(
            "secs_to_purchase"
        ),
    )


def stream_upsert_totals(
    events: DataFrame,
    target_path: str,
    integer_units: bool = False,
    num_buckets: int = 8,
) -> "object":
    """Streaming CDC-style MERGE: each micro-batch upserts per-user running
    totals into a parquet target via foreachBatch — the standard pattern
    for maintaining a serving table from a stream without a lakehouse
    format (Delta/Iceberg MERGE compiles to the same per-batch full-outer
    join on the copy-on-write path; queries/packing.py:merge_upsert is the
    batch twin of the join).

    The serving table is HASH-BUCKETED on the merge key
    (``bucket=pmod(xxhash64(user_id), num_buckets)`` directory partitions)
    and each micro-batch rewrites ONLY the buckets it touches (round 10;
    the r9 verdict's scale flag): the batch aggregate names its buckets,
    the current state is read bucket-PRUNED (a partition-column filter, so
    untouched buckets are never even scanned), the merge joins state and
    batch within those buckets, and the swap moves just the touched bucket
    directories — untouched buckets' files are never read, written, or
    moved (pinned byte-identical in tests/test_round10.py).  At 100 TB
    this is the difference between a per-batch whole-table rewrite and
    O(batch-cardinality) bucket rewrites; the per-bucket directory swap
    stands in for a manifest pointer flip.  Returns the StreamingQuery
    (caller awaits termination)."""
    import os
    import shutil

    spark = events.sparkSession
    # integer_units: accumulate exact integer cents instead of raw doubles —
    # the oracle-parity mode (float accumulation is batching-order-dependent;
    # integer adds are associative, so ANY micro-batch split composes to the
    # same state the one-shot batch aggregate produces)
    val = (
        F.round(F.col("value") * 100, 0).cast("long")
        if integer_units
        else F.col("value")
    )
    zero = F.lit(0).cast("long") if integer_units else F.lit(0.0)
    bucket_of = F.pmod(F.xxhash64(F.col("user_id")), F.lit(num_buckets)).cast("int")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.sum(val).alias("value_sum"),
        ).withColumn("bucket", bucket_of)
        # which buckets does this batch touch?  O(num_buckets) driver state.
        touched = sorted(r.bucket for r in agg.select("bucket").distinct().collect())
        have_state = os.path.isdir(target_path) and any(
            e.startswith("bucket=") for e in os.listdir(target_path)
        )
        if have_state:
            # bucket-pruned state read: the filter is on the partition
            # directory column, so untouched buckets are never scanned
            current = spark.read.parquet(target_path).where(
                F.col("bucket").isin([int(b) for b in touched])
            )
            t, s = current.alias("t"), agg.alias("s")
            merged = (
                t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full_outer")
                .select(
                    F.coalesce(F.col("t.user_id"), F.col("s.user_id")).alias("user_id"),
                    (
                        F.coalesce(F.col("t.events_seen"), F.lit(0))
                        + F.coalesce(F.col("s.events_seen"), F.lit(0))
                    ).alias("events_seen"),
                    (
                        F.coalesce(F.col("t.value_sum"), zero)
                        + F.coalesce(F.col("s.value_sum"), zero)
                    ).alias("value_sum"),
                    F.coalesce(F.col("t.bucket"), F.col("s.bucket"))
                    .cast("int")
                    .alias("bucket"),
                )
            )
        else:
            merged = agg
        # stage-then-swap, per bucket: the staging write materializes the
        # merge BEFORE any live file moves (never overwrite a path being
        # lazily read), then only the touched bucket dirs are swapped in —
        # at scale this swap is a manifest pointer flip
        staging = target_path + "_staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.partitionBy("bucket").mode("overwrite").parquet(staging)
        os.makedirs(target_path, exist_ok=True)
        for b in touched:
            src = os.path.join(staging, f"bucket={b}")
            dst = os.path.join(target_path, f"bucket={b}")
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.move(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

    return (
        _ensure_ltz(events, "ts")
        .writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_path + "_chk")
        .start()
    )


def stream_apply_changes(
    changes: DataFrame,
    view_path: str,
    group_col: str = "status",
    value_col: str = "price_c",
) -> "object":
    """STREAMING incremental view maintenance: consume a change-data-feed
    stream (rows shaped like operators/table_format.changes_between output)
    and keep a materialized grouped aggregate (count + value sum per
    ``group_col``) current via foreachBatch retract/apply — the streaming
    twin of queries/round10.table_changes_apply and the standard way a
    100 TB pipeline feeds a serving aggregate from a table's changelog
    without ever rescanning the table.

    Each batch aggregates its change rows into signed deltas (+1 for
    insert/update_postimage, -1 for delete/update_preimage), full-outer
    merges them into the current view, drops zero-count groups, and swaps
    the view atomically.  Correct under ANY micro-batch split of the feed:
    integer adds are associative, and dropping a group at n == 0 is safe
    because retracts carry exact preimages — n == 0 implies the group's
    applied-row multiset is empty, hence its value sum is 0 too, so
    absent-state == zero-state and a later re-insert rebuilds from 0
    (tests/test_round10.py pins stream == one-shot batch apply)."""
    import shutil

    spark = changes.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            batch_df.select(F.col(group_col), sign.alias("s"), F.col(value_col))
            .groupBy(group_col)
            .agg(
                F.sum("s").alias("dn"),
                F.sum(F.col("s") * F.col(value_col)).alias("dp"),
            )
        )
        try:
            current = spark.read.parquet(view_path)
            have_state = True
        except Exception:
            have_state = False
        if have_state:
            v, d = current.alias("v"), delta.alias("d")
            merged = v.join(
                d, F.col(f"v.{group_col}") == F.col(f"d.{group_col}"), "full_outer"
            ).select(
                F.coalesce(F.col(f"v.{group_col}"), F.col(f"d.{group_col}")).alias(
                    group_col
                ),
                (
                    F.coalesce(F.col("v.n"), F.lit(0))
                    + F.coalesce(F.col("d.dn"), F.lit(0))
                )
                .cast("bigint")
                .alias("n"),
                (
                    F.coalesce(F.col("v.price_units"), F.lit(0))
                    + F.coalesce(F.col("d.dp"), F.lit(0))
                )
                .cast("bigint")
                .alias("price_units"),
            )
        else:
            merged = delta.select(
                group_col,
                F.col("dn").cast("bigint").alias("n"),
                F.col("dp").cast("bigint").alias("price_units"),
            )
        merged = merged.where(F.col("n") != 0)
        nxt = view_path + "_next"
        merged.write.mode("overwrite").parquet(nxt)
        shutil.rmtree(view_path, ignore_errors=True)
        shutil.move(nxt, view_path)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", view_path + "_chk")
        .start()
    )
