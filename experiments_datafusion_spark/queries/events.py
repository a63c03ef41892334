"""Event-table queries: tumbling/sliding/session windows, stream dedup —
batch execution of the shared pipelines in streaming/pipelines.py, each with
a pure-SQL oracle (time_bucket / gaps-and-islands)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.streaming import pipelines


@register(
    "ev_tumbling",
    tags=("events", "window"),
    oracle="""
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*)             AS n,
  round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def ev_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (same code path as the streaming
    pipeline)."""
    return pipelines.tumbling_counts(table(spark, sf_dir, "events"), "1 hour")


@register(
    "ev_sliding",
    tags=("events", "window"),
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w, event_type
  FROM events
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n
FROM assigned
GROUP BY 1, 2
""",
)
def ev_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows: every event falls into two windows; the
    oracle materializes the two window starts explicitly."""
    return pipelines.sliding_counts(table(spark, sf_dir, "events"), "1 hour", "30 minutes")


@register(
    "ev_session",
    tags=("events", "window", "session"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '10 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM ordered
)
SELECT
  user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S')                        AS session_start,
  strftime(max(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
  count(*)                                                       AS n_events,
  round(sum(value), 2)                                           AS session_value
FROM islands
GROUP BY user_id, sess_id
""",
)
def ev_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user. Spark: session_window;
    oracle: classic gaps-and-islands (lag -> break flag -> running sum ->
    group). Session end = last event + gap, matching Spark's definition."""
    return pipelines.sessionize(table(spark, sf_dir, "events"), "10 minutes")


@register(
    "ev_dedup",
    tags=("events", "dedup"),
    oracle="""
SELECT count(*) AS n_unique FROM (SELECT DISTINCT event_id FROM events)
""",
)
def ev_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event dedup by id (streaming twin: dropDuplicatesWithinWatermark)."""
    deduped = pipelines.dedup_events(table(spark, sf_dir, "events"))
    return deduped.agg(F.count(F.lit(1)).alias("n_unique"))


@register(
    "ev_daily_stats",
    tags=("events", "json"),
    oracle="""
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  count(*)                                    AS n,
  round(avg(CAST(props->>'$.k' AS INT)), 4)   AS avg_k,
  count(DISTINCT user_id)                     AS uniq_users
FROM events
GROUP BY 1, 2
""",
)
def ev_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup with JSON prop extraction and distinct users."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@register(
    "ev_enrich_join",
    tags=("events", "join"),
    oracle="""
SELECT
  e.event_id,
  e.user_id,
  e.event_type,
  round(coalesce(p.lifetime_value, 0.0), 2) AS lifetime_value,
  coalesce(p.n_past_events, 0)              AS n_past_events
FROM events e
LEFT JOIN (
  SELECT user_id,
         sum(value) AS lifetime_value,
         count(*)   AS n_past_events
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
) p USING (user_id)
""",
)
def ev_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch twin: the profile is the
    per-user purchase history derived from the same table; on a stream the
    identical pipeline broadcasts this static profile into each
    micro-batch (tests/test_streaming.py)."""
    ev = table(spark, sf_dir, "events")
    profile = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum("value").alias("lifetime_value"),
            F.count(F.lit(1)).alias("n_past_events"),
        )
    )
    return pipelines.enrich_with_profile(ev, profile)


@register(
    "ev_funnel",
    tags=("events", "funnel"),
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY 1
)
SELECT (SELECT count(*) FROM v) AS viewed,
       (SELECT count(*) FROM c) AS then_clicked,
       (SELECT count(*) FROM p) AS then_purchased
""",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase.  Each stage is a per-user aggregate joined to the
    previous stage's anchor time — three hash aggs on user_id (same
    partitioning reused across stages, no extra shuffles at scale)."""
    ev = table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        v.agg(F.count(F.lit(1)).alias("viewed")),
        c.agg(F.count(F.lit(1)).alias("then_clicked")),
        p.agg(F.count(F.lit(1)).alias("then_purchased")),
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@register(
    "ev_retention",
    tags=("events", "retention"),
    oracle="""
WITH active AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
)
SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour,
       count(DISTINCT a.user_id) AS active,
       count(DISTINCT b.user_id) AS retained
FROM active a
LEFT JOIN active b ON b.user_id = a.user_id AND b.h = a.h + INTERVAL '1 hour'
GROUP BY a.h
""",
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour retention: of the users active in hour h, how many
    are also active in h+1.  Self-join of the distinct (hour, user) set on
    (user, adjacent hour) — both sides share the same shuffle key."""
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    nxt = active.select(
        (F.col("h") - F.expr("interval 1 hour")).alias("h"),
        F.col("user_id").alias("r_user"),
    )
    return (
        active.join(
            nxt, (active.user_id == nxt.r_user) & (active.h == nxt.h), "left"
        )
        .groupBy(active.h)
        .agg(
            F.countDistinct("user_id").alias("active"),
            F.countDistinct("r_user").alias("retained"),
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "active",
            "retained",
        )
    )


@register(
    "ev_gapfill",
    tags=("events", "window", "gapfill"),
    oracle="""
WITH bounds AS (
  SELECT date_trunc('minute', min(ts)) AS mn, date_trunc('minute', max(ts)) AS mx
  FROM events
),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL '1 minute')) AS m FROM bounds
),
per_min AS (
  SELECT date_trunc('minute', ts) AS m, count(*) AS n, round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1
)
SELECT strftime(s.m, '%Y-%m-%d %H:%M:%S') AS minute,
       coalesce(p.n, 0)          AS n,
       coalesce(p.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN per_min p USING (m)
""",
)
def ev_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup with gap fill: per-minute counts over a dense
    time spine (minutes with no events appear with n=0) — the time-series
    idiom continuous-aggregate stores ship natively. Spine = sequence()
    between the table's min/max minute; both sides of the final join are
    post-aggregation (one row per minute), so the plan stays tiny no matter
    how large the raw event table is."""
    ev = table(spark, sf_dir, "events")
    per_min = ev.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    spine = (
        ev.agg(
            F.date_trunc("minute", F.min("ts")).alias("mn"),
            F.date_trunc("minute", F.max("ts")).alias("mx"),
        )
        .select(F.explode(F.sequence("mn", "mx", F.expr("interval 1 minute"))).alias("m"))
    )
    return spine.join(per_min, "m", "left").select(
        F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("minute"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@register(
    "ev_attribution",
    tags=("events", "join"),
    oracle="""
SELECT
  c.event_id AS click_id,
  p.event_id AS purchase_id,
  p.user_id,
  round(p.value, 2) AS purchase_value,
  date_diff('second', c.ts, p.ts) AS secs_to_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch twin: purchases attributed to
    same-user clicks within 1 hour.  Streaming execution adds watermarks
    on both sides so join state is evictable (tests/test_streaming.py)."""
    ev = table(spark, sf_dir, "events")
    return pipelines.attribute_purchases(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        "1 hour",
    )


@register(
    "ev_attribution_outer",
    tags=("events", "join", "streaming"),
    oracle="""
SELECT
  c.event_id AS click_id,
  p.event_id AS purchase_id,
  coalesce(p.user_id, c.user_id) AS user_id,
  round(p.value, 2) AS purchase_value,
  date_diff('second', c.ts, p.ts) AS secs_to_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def ev_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, batch twin: the
    unconverted-clicks report — every click row survives, null-padded
    when no same-user purchase lands within the hour.  The outer side is
    what makes this a genuinely STATEFUL streaming shape: a null-padded
    row can only emit once the watermark proves no matching purchase can
    still arrive (click_ts + horizon + delay), so streamed output is the
    batch answer minus exactly the undecidable tail —
    tests/test_streaming.py pins matched-rows equality, null-tail
    subsetting, and that every withheld row sits inside the watermark
    horizon."""
    ev = table(spark, sf_dir, "events")
    return pipelines.attribute_purchases(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        "1 hour",
        how="left_outer",
    )


@register(
    "ev_interpolate",
    tags=("events", "window", "gapfill"),
    oracle="""
-- linear interpolation over per-series gaps (the hypertable interpolate()
-- idiom): dense minute spine per event_type, carried prev/next observations
-- via IGNORE NULLS window frames, one fused arithmetic expression written
-- identically in both engines (single-op IEEE steps; inputs pre-rounded).
WITH obs AS (
  SELECT event_type,
         date_diff('minute', TIMESTAMP '1970-01-01 00:00:00',
                   date_trunc('minute', ts)) // 10 AS m,
         round(sum(value), 2) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(m) AS mn, max(m) AS mx FROM obs GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(mn, mx)) AS m FROM bounds
),
j AS (SELECT s.event_type, s.m, o.v FROM spine s LEFT JOIN obs o USING (event_type, m)),
w AS (
  SELECT event_type, m, v,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY m
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY m
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY m
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY m
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
  FROM j
),
ints AS (
  -- exact fixed-point interpolation: v is already 2dp, so centi-units are
  -- integers; (num*2e4 + den*100) // (2*den*100) is EXACT half-up 4dp of
  -- num/(den*100) — float round() disagrees across engines at half-ulp
  -- boundaries, integer division cannot
  SELECT event_type, m, v,
         CAST(round(pv * 100, 0) AS BIGINT) AS pvc,
         CAST(round(nv * 100, 0) AS BIGINT) AS nvc,
         pv, nv, pm, nm
  FROM w
)
SELECT event_type,
       strftime(TIMESTAMP '1970-01-01 00:00:00' + to_minutes(m * 10), '%Y-%m-%d %H:%M:%S') AS bucket,
       (v IS NOT NULL) AS observed,
       CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           ((pvc * (nm - m) + nvc * (m - pm)) * 20000 + (nm - pm) * 100)
             // (2 * (nm - pm) * 100) / 10000.0
         ELSE round(coalesce(pv, nv), 4)
       END AS value_interp
FROM ints
""",
)
def ev_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-10-minute series with LINEAR interpolation between the
    surrounding observations (ev_gapfill's zero-fill upgraded to the
    hypertable interpolate() idiom).  Shape at scale: both window passes
    partition by the series key and the spine join is post-aggregation —
    one row per (series, minute) regardless of raw event volume."""
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(
        (F.unix_timestamp(F.date_trunc("minute", "ts")) / 60) / 10
    ).cast("long")
    obs = ev.groupBy("event_type", bucket.alias("m")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    spine = obs.groupBy("event_type").agg(
        F.min("m").alias("mn"), F.max("m").alias("mx")
    ).select("event_type", F.explode(F.sequence("mn", "mx")).alias("m"))
    j = spine.join(obs, ["event_type", "m"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v, m = F.col("v"), F.col("m")
    carried = j.select(
        "event_type",
        "m",
        "v",
        F.last(v, ignorenulls=True).over(w_prev).alias("pv"),
        F.last(F.when(v.isNotNull(), m), ignorenulls=True).over(w_prev).alias("pm"),
        F.first(v, ignorenulls=True).over(w_next).alias("nv"),
        F.first(F.when(v.isNotNull(), m), ignorenulls=True).over(w_next).alias("nm"),
    )
    ints = carried.withColumns(
        {
            "pvc": F.round(F.col("pv") * 100, 0).cast("long"),
            "nvc": F.round(F.col("nv") * 100, 0).cast("long"),
        }
    )
    # exact fixed-point half-up (the WAV/PNG recipe): long arithmetic only,
    # so both engines divide the same integers — no float-round boundaries
    val4 = F.expr(
        "((pvc * (nm - m) + nvc * (m - pm)) * 20000 + (nm - pm) * 100)"
        " div (2 * (nm - pm) * 100)"
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), val4 / F.lit(10000.0)
        )
        .otherwise(F.round(F.coalesce("pv", "nv"), 4))
    )
    return ints.select(
        "event_type",
        F.date_format(F.timestamp_seconds(m * 600), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        v.isNotNull().alias("observed"),
        interp.alias("value_interp"),
    )


@register(
    "ev_cep_pattern",
    tags=("events", "window", "cep"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2)         OVER w AS ts2,
         lead(event_id, 2)   OVER w AS eid2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       event_id                            AS start_event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S')   AS start_ts,
       eid2                                AS end_event_id,
       (epoch_us(ts2) - epoch_us(ts)) // 1000000 AS span_s
FROM seq
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND epoch_us(ts2) - epoch_us(ts) <= 86400000000
""",
)
def ev_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match — the MATCH_RECOGNIZE shape:
    find every STRICTLY CONSECUTIVE view -> click -> purchase run per user
    completing within 24 hours.  Expressed as one window pass with
    lead() lookaheads (pattern length is static, so no NFA state is
    needed); at 100 TB this is a single hash-partition + in-partition
    sort, the streaming twin being transformWithState.  All span math in
    integer microseconds."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
        F.lead("event_id", 2).over(w).alias("eid2"),
    )
    span_us = us("ts2") - us("ts")
    return (
        seq.where(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
            & (span_us <= 86_400_000_000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.col("eid2").alias("end_event_id"),
            ((span_us - span_us % 1_000_000) / 1_000_000).cast("long").alias("span_s"),
        )
    )
