"""Time-series operators (round 4): overlapping-interval merge (coverage),
OHLC resampling, and the nearest-direction as-of join.

All three are classic hypertable/market-data shapes the reference's
DataFusion surface gets asked for; each is one-or-two window passes or an
as-of composition — no per-row subqueries, no collects — with DuckDB
oracles (including DuckDB's native ASOF in both directions checking our
union+window formulation).

Determinism: every duration is integer microseconds (epoch_us both
sides); open/high/low/close are SELECTIONS of raw doubles (min/max/
first/last), never arithmetic, so they pass through bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import joins as J
from experiments_datafusion_spark.queries import register


def _us(col: str):
    """Integer epoch microseconds; the parquet ts is TIMESTAMP_NTZ and the
    session tz is UTC, so the cast is the identity DuckDB's epoch_us uses."""
    return F.unix_micros(F.col(col).cast("timestamp"))


@register(
    "interval_coverage",
    tags=("timeseries", "window"),
    oracle="""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + (60 + event_id % 540) * 1000000 AS e_us,
         event_id
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s_us > max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, min(s_us) AS lo, max(e_us) AS hi
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT)                  AS n_islands,
       CAST(sum(hi - lo) // 1000000 AS BIGINT)   AS covered_s
FROM merged
GROUP BY user_id
""",
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge + total coverage per user (each event
    opens a deterministic 1-10 minute interval).  The gaps-and-islands
    pattern: an interval starts a new island iff its start exceeds the
    running max end of everything before it; islands then reduce to
    [min start, max end].  Two window passes + two keyed aggregates, all
    integer-microsecond arithmetic — one shuffle on user_id, unchanged at
    any scale."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        _us("ts").alias("s_us"),
        (_us("ts") + (60 + F.col("event_id") % 540) * 1_000_000).alias("e_us"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max = F.max("e_us").over(wprev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s_us") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(wrun))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s_us").alias("lo"), F.max("e_us").alias("hi")
    )
    total = F.sum(F.col("hi") - F.col("lo"))
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        ((total - total % 1_000_000) / 1_000_000).cast("long").alias("covered_s"),
    )


@register(
    "resample_ohlc",
    tags=("timeseries", "agg"),
    oracle="""
SELECT
  event_type,
  strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
  first(value ORDER BY ts, event_id) AS open,
  max(value)                         AS high,
  min(value)                         AS low,
  last(value ORDER BY ts, event_id)  AS close,
  CAST(count(*) AS BIGINT)           AS n
FROM events
GROUP BY 1, 2
""",
)
def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling to 15-minute bars per event_type — the market-
    data resample every hypertable ships.  open/close are first/last by
    (ts, event_id); high/low are max/min.  All four are SELECTIONS of raw
    doubles (no float arithmetic), so no rounding recipe is needed.  One
    window pass for the edge ranks + one keyed aggregate."""
    ev = table(spark, sf_dir, "events").withColumn(
        "bucket", F.window("ts", "15 minutes")["start"]
    )
    part = Window.partitionBy("event_type", "bucket")
    ra = F.row_number().over(part.orderBy("ts", "event_id"))
    rd = F.row_number().over(part.orderBy(F.desc("ts"), F.desc("event_id")))
    marked = ev.select(
        "event_type", "bucket", "value", ra.alias("ra"), rd.alias("rd")
    )
    return marked.groupBy(
        "event_type", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket")
    ).agg(
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_asof_nearest",
    tags=("join", "asof", "timeseries"),
    oracle="""
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
clicks    AS (SELECT * FROM events WHERE event_type = 'click'),
b AS (
  SELECT p.event_id, p.user_id, p.ts, c.event_id AS bid, c.ts AS bts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
),
f AS (
  SELECT p.event_id, c.event_id AS fid, c.ts AS fts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts <= c.ts
)
SELECT
  b.event_id,
  b.user_id,
  strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
  CASE WHEN bid IS NULL THEN fid
       WHEN fid IS NULL THEN bid
       WHEN epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts)
       THEN bid ELSE fid END AS click_id,
  CASE WHEN bid IS NULL AND fid IS NULL THEN NULL
       WHEN bid IS NULL THEN 'F'
       WHEN fid IS NULL THEN 'B'
       WHEN epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts)
       THEN 'B' ELSE 'F' END AS direction,
  CASE WHEN bid IS NULL AND fid IS NULL THEN NULL
       WHEN bid IS NULL THEN (epoch_us(fts) - epoch_us(b.ts)) // 1000000
       WHEN fid IS NULL THEN (epoch_us(b.ts) - epoch_us(bts)) // 1000000
       WHEN epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts)
       THEN (epoch_us(b.ts) - epoch_us(bts)) // 1000000
       ELSE (epoch_us(fts) - epoch_us(b.ts)) // 1000000 END AS delta_s
FROM b JOIN f USING (event_id)
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each purchase pairs with the closest
    click in either direction (ties to the backward match — pandas
    merge_asof direction='nearest' semantics).  Composed from two runs of
    the union+window as-of operator — the forward pass simply negates the
    time key, so one operator serves both directions; both passes are
    checked against DuckDB's NATIVE ASOF in the matching direction.  Two
    shuffles on user_id + one equi-join on the (unique) left key."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")

    b = J.asof_join(
        purchases, clicks, on="ts", by=["user_id"], right_cols=["event_id", "ts"]
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("right_event_id").alias("bid"),
        F.col("right_ts").alias("bts"),
    )
    neg = lambda df: df.withColumn("tskey", -_us("ts"))  # noqa: E731
    f = J.asof_join(
        neg(purchases), neg(clicks), on="tskey", by=["user_id"], right_cols=["event_id", "ts"]
    ).select(
        "event_id",
        F.col("right_event_id").alias("fid"),
        F.col("right_ts").alias("fts"),
    )
    j = b.join(f, "event_id")
    db = _us("ts") - _us("bts")
    df_ = _us("fts") - _us("ts")
    back_wins = db <= df_
    dsec = lambda d: ((d - d % 1_000_000) / 1_000_000).cast("long")  # noqa: E731
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(F.col("bid").isNull(), F.col("fid"))
        .when(F.col("fid").isNull(), F.col("bid"))
        .when(back_wins, F.col("bid"))
        .otherwise(F.col("fid"))
        .alias("click_id"),
        F.when(F.col("bid").isNull() & F.col("fid").isNull(), F.lit(None).cast("string"))
        .when(F.col("bid").isNull(), "F")
        .when(F.col("fid").isNull(), "B")
        .when(back_wins, "B")
        .otherwise("F")
        .alias("direction"),
        F.when(F.col("bid").isNull() & F.col("fid").isNull(), F.lit(None).cast("long"))
        .when(F.col("bid").isNull(), dsec(df_))
        .when(F.col("fid").isNull(), dsec(db))
        .when(back_wins, dsec(db))
        .otherwise(dsec(df_))
        .alias("delta_s"),
    )


# ---- integer-exact EWMA: per-key linear recurrence via applyInPandas ----

_EWMA_NUM = 3  # alpha = 0.3 as the rational 3/10 — recurrence stays integer
_EWMA_DEN = 10


@register(
    "ev_ewma",
    tags=("timeseries", "stateful", "udf"),
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_u,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, s) AS (
  SELECT user_id, rn, v_u FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         ({_EWMA_NUM} * e.v_u + ({_EWMA_DEN} - {_EWMA_NUM}) * w.s) // {_EWMA_DEN}
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, CAST(s AS BIGINT) AS ewma_u FROM walk
""",
)
def ev_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over the event stream
    — the canonical per-key LINEAR RECURRENCE (s_t = a*x_t + (1-a)*s_{t-1})
    that no built-in window frame expresses exactly.  Run entirely in
    integer micro-units with a rational alpha (3/10) and floor division, so
    the Spark recurrence and the DuckDB recursive-CTE fixed point are
    bit-identical — the float formulation would accumulate ulp drift
    differently in each engine.

    Shape: groupBy(user_id).applyInPandas — ONE shuffle to co-locate each
    key, then a sequential walk inside the Arrow batch.  This is the
    batch twin of the transformWithState streaming shape: parallelism is
    across keys (millions at 100 TB), state is O(1) per key, and no
    driver-side anything.  The quadratic alternative (window with pow()
    weights) is both float-divergent and O(n^2) per key; the recurrence is
    O(n)."""
    events = table(spark, sf_dir, "events")

    # Round 13: repartition + sortWithinPartitions + mapInPandas instead of
    # groupBy().applyInPandas — the same ONE co-locating shuffle, but the
    # Python side walks each PARTITION'S Arrow batches (one pandas frame
    # per batch) with explicit key-boundary resets, instead of paying the
    # per-GROUP pandas-frame overhead ~n_users times.  Interleaved A/B at
    # sf0.1, 5 rounds: applyInPandas 1.20-1.59 s, this form 0.88-1.21 s;
    # rows identical.  The recurrence state (user, acc, rn) is carried
    # ACROSS batches, so a key spanning an Arrow-batch boundary (or a
    # partition larger than arrow.maxRecordsPerBatch) is walked correctly —
    # batches of one partition arrive in order.  Same scale story:
    # parallelism across keys, O(1) state per key, nothing on the driver.
    def walk_part(batches):
        import numpy as np
        import pandas as pd

        prev = None
        acc = 0
        r = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Null-key guard (r13 advisor): a null user_id becomes NaN in
            # the pandas conversion and NaN != NaN would reset the state
            # EVERY row — silently diverging from both the old
            # applyInPandas semantics (nulls formed one group) and the
            # oracle.  The fixture has no null users; fail loudly if a
            # future fixture/schema change introduces one.
            if pdf["user_id"].isna().any():
                raise ValueError("ev_ewma: null user_id reached the walk")
            u = pdf["user_id"].to_numpy()
            v = np.floor(pdf["value"].to_numpy() * 1_000_000).astype("int64")
            s = np.empty_like(v)
            rn = np.empty_like(v)
            for i in range(len(v)):
                if prev is None or u[i] != prev:
                    prev = u[i]
                    r = 0
                x = int(v[i])
                acc = (
                    x
                    if r == 0
                    else (_EWMA_NUM * x + (_EWMA_DEN - _EWMA_NUM) * acc) // _EWMA_DEN
                )
                r += 1
                s[i] = acc
                rn[i] = r
            yield pd.DataFrame({"user_id": u, "rn": rn, "ewma_u": s})

    return (
        events.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(walk_part, schema="user_id long, rn long, ewma_u long")
    )


# ---- interval x interval overlap join (bucketed; oracle = theta join) ------

_OVL_G_US = 600 * 1_000_000  # 10-minute co-location buckets


@register(
    "join_interval_overlap",
    tags=("timeseries", "join", "interval"),
    oracle="""
WITH a AS (
  SELECT user_id, event_id AS a_id, epoch_us(ts) AS s,
         epoch_us(ts) + (60 + event_id % 540) * 1000000 AS e
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT user_id, event_id AS b_id, epoch_us(ts) AS s,
         epoch_us(ts) + (30 + event_id % 300) * 1000000 AS e
  FROM events WHERE event_type = 'click'
)
SELECT a.user_id, a_id, b_id,
       CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (meetings x outages shape — distinct
    from join_range_bands' point-in-interval): purchase-session intervals
    against click-attention intervals per user, reporting exact integer-µs
    overlap.  The Spark side runs the SCALABLE formulation — explode each
    interval into 10-minute co-location buckets (interval length is bounded
    by 10 min here, so <= 2 buckets each), equi-join on (user, bucket),
    dedup the pair, then apply the exact overlap predicate — while the
    oracle is the direct theta join, so the differential proves the
    bucketed rewrite semantically invisible (the join_salted pattern).
    At 100 TB the equi-join shuffles on (user, bucket) — co-located,
    bounded fan-out — where the theta join would be a per-user cross
    product."""
    ev = table(spark, sf_dir, "events")

    def intervals(kind: str, base: int, mod: int, id_alias: str) -> DataFrame:
        e = ev.where(F.col("event_type") == kind)
        s = _us("ts")
        return e.select(
            "user_id",
            F.col("event_id").alias(id_alias),
            s.alias(f"{id_alias}_s"),
            (s + (F.lit(base) + F.col("event_id") % mod) * 1_000_000).alias(
                f"{id_alias}_e"
            ),
        )

    a = intervals("purchase", 60, 540, "a_id")
    b = intervals("click", 30, 300, "b_id")

    def bucketed(df: DataFrame, id_alias: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{id_alias}_s") / _OVL_G_US),
                    F.floor(F.col(f"{id_alias}_e") / _OVL_G_US),
                )
            ).alias("bucket"),
        )

    # equi-join on (user, bucket): expressed via the join condition so both
    # sides keep their own column names
    ab = bucketed(a, "a_id").alias("A").join(
        bucketed(b, "b_id").alias("B"),
        (F.col("A.user_id") == F.col("B.user_id"))
        & (F.col("A.bucket") == F.col("B.bucket")),
    )
    return (
        ab.where(
            (F.col("A.a_id_s") < F.col("B.b_id_e"))
            & (F.col("B.b_id_s") < F.col("A.a_id_e"))
        )
        .select(
            F.col("A.user_id").alias("user_id"),
            "a_id",
            "b_id",
            (
                F.least(F.col("A.a_id_e"), F.col("B.b_id_e"))
                - F.greatest(F.col("A.a_id_s"), F.col("B.b_id_s"))
            )
            .cast("long")
            .alias("overlap_us"),
        )
        .distinct()
    )


# ---- per-key token-bucket rate limiting (clamped recurrence) ---------------

_RL_CAP = 3_000_000  # bucket capacity: 3 tokens, in micro-tokens
_RL_COST = 1_000_000  # one token per event
_RL_DIV = 54000  # refill = dt_us // 54000 == 1 token per 15 h in micro-tokens
# (15 h > the fixture's median 7.3 h inter-event gap, so the bucket DRAINS
# under sustained traffic and both branches of the clamp are exercised)


@register(
    "ev_rate_limit",
    tags=("timeseries", "stateful", "udf"),
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, ts_us, tok, acc) AS (
  SELECT user_id, rn, ts_us,
         CASE WHEN {_RL_CAP} >= {_RL_COST} THEN {_RL_CAP} - {_RL_COST}
              ELSE {_RL_CAP} END,
         CAST({_RL_CAP} >= {_RL_COST} AS BIGINT)
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.ts_us,
         CASE WHEN least({_RL_CAP}, w.tok + (e.ts_us - w.ts_us) // {_RL_DIV}) >= {_RL_COST}
              THEN least({_RL_CAP}, w.tok + (e.ts_us - w.ts_us) // {_RL_DIV}) - {_RL_COST}
              ELSE least({_RL_CAP}, w.tok + (e.ts_us - w.ts_us) // {_RL_DIV}) END,
         CAST(least({_RL_CAP}, w.tok + (e.ts_us - w.ts_us) // {_RL_DIV}) >= {_RL_COST} AS BIGINT)
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS rn,
       CAST(tok AS BIGINT) AS tokens_u, CAST(acc AS BIGINT) AS accepted
FROM walk
""",
)
def ev_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user token-bucket rate limiting over the event stream — the
    CLAMPED recurrence (tokens = min(CAP, tokens + refill(dt)) - cost if
    affordable) that, unlike ev_ewma's linear form, is not expressible
    even as a prefix product: the min() clamp forces a sequential walk.
    Bucket: 3-token capacity, 1 token per 15 h refill, 1 token per event;
    each event reports its post-decision balance and accept/reject.

    All integer micro-tokens: refill is dt_us // _RL_DIV (= // 54000,
    exact integer
    division on nonnegative gaps), so the Spark walk and the DuckDB
    recursive-CTE fixed point are bit-identical — the float formulation
    would diverge on accumulated refills.

    Shape: ONE shuffle to co-locate each user (groupBy.applyInPandas),
    sequential walk inside the Arrow batch — O(1) state per key, keys
    parallelize to millions at 100 TB; the streaming twin is the
    applyInPandasWithState shape of streaming/stateful.py."""
    import pandas as pd

    events = table(spark, sf_dir, "events")

    def walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        n = len(ts_us)
        tok_out = np.empty(n, dtype="int64")
        acc_out = np.empty(n, dtype="int64")
        tok = _RL_CAP
        prev = None
        for i in range(n):
            if prev is not None:
                tok = min(_RL_CAP, tok + (int(ts_us[i]) - prev) // _RL_DIV)
            prev = int(ts_us[i])
            if tok >= _RL_COST:
                tok -= _RL_COST
                acc_out[i] = 1
            else:
                acc_out[i] = 0
            tok_out[i] = tok
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "rn": np.arange(1, n + 1, dtype="int64"),
                "tokens_u": tok_out,
                "accepted": acc_out,
            }
        )

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandas(walk, schema="user_id long, rn long, tokens_u long, accepted long")
    )


@register(
    "period_over_period",
    tags=("timeseries", "window", "warehouse"),
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT month, n_orders, revenue_cents,
       lag(revenue_cents) OVER (ORDER BY month) AS prev_cents,
       CASE WHEN lag(revenue_cents) OVER (ORDER BY month) > 0 THEN
         CAST((revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 10000
              // (lag(revenue_cents) OVER (ORDER BY month)) AS BIGINT)
       END AS delta_bp
FROM m
ORDER BY month
""",
)
def period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the warehouse KPI staple: monthly
    revenue as an EXACT integer-cents sum (per-row round(price*100) is a
    single identical double op in both engines; the sum is associative
    int64 addition — the exact.py recipe), previous month via lag(), and
    growth in truncated integer basis points (delta * 10000 div prev) —
    no float division to diverge.  First month emits NULL delta in both
    engines.

    Shape at 100 TB: one map-side-combined groupBy(month) collapses the
    orders scan to |months| rows; the lag window runs on that tiny
    relation (single partition by construction — the reduction IS the
    spine, same documented trade as drift_ks)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy("month")
    return (
        m.select(
            "month",
            "n_orders",
            "revenue_cents",
            F.lag("revenue_cents").over(w).alias("prev_cents"),
        )
        .select(
            "month",
            "n_orders",
            "revenue_cents",
            "prev_cents",
            F.when(
                F.col("prev_cents") > 0,
                F.expr("(revenue_cents - prev_cents) * 10000 div prev_cents"),
            )
            .cast("long")
            .alias("delta_bp"),
        )
        .orderBy("month")
    )
