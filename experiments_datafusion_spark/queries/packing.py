"""Round-3 pipeline additions: training-sequence packing and MERGE-style
upsert maintenance — two staples of a production pretraining data flow that
round 2's curation suite (queries/pipeline.py) didn't yet cover.

pack_sequences is the classic "fill 2048-token context windows" step: docs
are sharded, ordered, and greedily packed into fixed-budget bins.  Packing
is inherently sequential WITHIN a shard (bin boundaries depend on every
prior doc), so the right Spark shape is embarrassing parallelism ACROSS
shards with a tiny sequential loop per shard (applyInPandas) — exactly how
production packers run; the DuckDB oracle replays the greedy walk as a
recursive CTE, differential-testing a sequential algorithm end to end.

merge_upsert is MERGE INTO semantics (update matched / insert unmatched /
keep the rest) expressed as a single full-outer join + row-status case —
the lakehouse maintenance op Spark-without-Delta users hand-roll.  One
shuffle on the merge key; at 100 TB both sides hash-partition on the key
and the plan is a plain shuffle join (broadcast if the change-batch is
small, which AQE decides).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark import exact as _X
from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators.text import bpe_token_count, hash64
from experiments_datafusion_spark.queries import register

SEQ_BUDGET = 512  # tokens per packed training sequence
N_SHARDS = 8

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# shard assignment must replay in SQL: portable md5 hash64 of the doc id
_SHARD_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#pack'), 1, 15)) AS BIGINT)"
    f" % {N_SHARDS}"
)


@register(
    "pack_sequences",
    tags=("pipeline", "packing", "text"),
    oracle=rf"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         {_SHARD_SQL} AS shard,
         len(regexp_extract_all(text, '{_BPE_RE}')) AS tok
  FROM documents
),
o AS (
  SELECT doc_id, shard, tok,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM d
),
walk(shard, rn, bin, fill) AS (
  SELECT shard, rn, 0, tok FROM o WHERE rn = 1
  UNION ALL
  SELECT nxt.shard, nxt.rn,
         CASE WHEN w.fill + nxt.tok <= {SEQ_BUDGET} THEN w.bin ELSE w.bin + 1 END,
         CASE WHEN w.fill + nxt.tok <= {SEQ_BUDGET} THEN w.fill + nxt.tok ELSE nxt.tok END
  FROM walk w JOIN o nxt ON nxt.shard = w.shard AND nxt.rn = w.rn + 1
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(bin AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(max(fill) AS BIGINT) AS seq_tokens,
       -- exact integer half-up: tokens = 16 mod 32 puts tokens/{SEQ_BUDGET}
       -- on an exact 4dp half-boundary where float round() splits engines
       CAST((max(fill) * 20000 + {SEQ_BUDGET}) // (2 * {SEQ_BUDGET}) AS DOUBLE)
         / 10000 AS fill_ratio
FROM walk
GROUP BY shard, bin
ORDER BY shard, seq_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: shard docs by portable hash, order by
    doc_id within shard, pack into {SEQ_BUDGET}-token bins (a doc that
    doesn't fit starts the next bin; an oversized doc gets its own bin).
    Reports per-sequence doc count, token fill, and fill ratio.

    Packing is sequential per shard by definition, so the loop lives in
    applyInPandas over shards — shards are the parallelism unit, which is
    how this runs at 100 TB (thousands of shards, each a few MB of doc
    metadata; payload text never moves, only (doc_id, tok)).  The oracle
    replays the identical greedy walk as a recursive CTE."""
    docs = spread(table(spark, sf_dir, "documents"))
    metered = docs.select(
        "doc_id",
        F.pmod(
            hash64(F.concat(F.col("doc_id").cast("string"), F.lit("#pack"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        bpe_token_count(F.col("text")).cast("long").alias("tok"),
    )

    def _pack(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        toks = pdf["tok"].to_numpy()
        bins = np.empty(len(toks), dtype=np.int64)
        fills = np.empty(len(toks), dtype=np.int64)
        b, fill = 0, 0
        for i, t in enumerate(toks):
            if i > 0 and fill + t > SEQ_BUDGET:
                b += 1
                fill = 0
            fill += int(t)
            bins[i] = b
            fills[i] = fill
        out = pd.DataFrame(
            {"shard": pdf["shard"].to_numpy(), "seq_id": bins, "tok": toks, "fill": fills}
        )
        g = out.groupby("seq_id", as_index=False).agg(
            n_docs=("tok", "size"), seq_tokens=("fill", "max")
        )
        g["shard"] = pdf["shard"].iloc[0]
        # exact integer half-up (see oracle comment): float .round(4) uses
        # half-even and splits from DuckDB on exact half-boundaries
        g["fill_ratio"] = (
            (g["seq_tokens"] * 20_000 + SEQ_BUDGET) // (2 * SEQ_BUDGET)
        ) / 10_000.0
        return g[["shard", "seq_id", "n_docs", "seq_tokens", "fill_ratio"]]

    return (
        metered.groupBy("shard")
        .applyInPandas(
            _pack,
            "shard bigint, seq_id bigint, n_docs bigint, seq_tokens bigint, "
            "fill_ratio double",
        )
        .orderBy("shard", "seq_id")
    )


@register(
    "merge_upsert",
    tags=("pipeline", "maintenance"),
    oracle="""
-- all money math in exact integer units (see exact.py: round(sum(double))
-- hit a 2dp half-boundary at sf0.1): spend summed in 1e-4 units, half-up
-- to integer cents, balance update composed in 1e-7 units
WITH src AS (
  SELECT o_custkey AS custkey,
         count(*) AS n_orders,
         (sum(CAST(round(o_totalprice * 10000, 0) AS BIGINT)) * 2 + 100) // 200
           AS spend_c
  FROM orders GROUP BY o_custkey
),
changes AS (  -- updates for existing keys + synthetic inserts for new keys
  SELECT custkey, n_orders, spend_c FROM src
  UNION ALL
  SELECT custkey + 10000000, n_orders, spend_c FROM src WHERE n_orders >= 20
),
m AS (
  SELECT t.c_custkey, s.custkey, s.n_orders,
         coalesce(CAST(round(t.c_acctbal * 100, 0) AS BIGINT), 0) * 100000
           + coalesce(s.spend_c, 0) * 100 AS u7
  FROM customer t FULL OUTER JOIN changes s ON t.c_custkey = s.custkey
)
SELECT coalesce(c_custkey, custkey) AS custkey,
       CASE WHEN c_custkey IS NULL THEN 'inserted'
            WHEN custkey IS NULL THEN 'kept'
            ELSE 'updated' END AS status,
       (CASE WHEN u7 >= 0 THEN (u7 * 2 + 100000) // 200000
             ELSE -(((-u7) * 2 + 100000) // 200000) END) / 100.0 AS acctbal_new,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
FROM m
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: target customers,
    change-batch derived from orders (per-key rollup = updates; keys
    shifted by 1e7 for heavy buyers = inserts).  WHEN MATCHED -> update
    balance, WHEN NOT MATCHED BY TARGET -> insert, WHEN NOT MATCHED BY
    SOURCE -> keep.  One full-outer shuffle join on the merge key + a
    status case — the exact dataflow Delta/Iceberg MERGE compiles to for
    the copy-on-write path."""
    cust = table(spark, sf_dir, "customer")
    src = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_X.to_units(F.col("o_totalprice"), 4)).alias("spend_u"),
        )
        # half-up to integer cents while still in exact integer arithmetic
        .select(
            "custkey",
            "n_orders",
            F.floor((F.col("spend_u") * 2 + 100) / 200).cast("long").alias("spend_c"),
        )
    )
    changes = src.unionAll(
        src.where(F.col("n_orders") >= 20).select(
            (F.col("custkey") + 10_000_000).alias("custkey"), "n_orders", "spend_c"
        )
    )
    t, s = cust.alias("t"), changes.alias("s")
    merged = t.join(s, F.col("t.c_custkey") == F.col("s.custkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("t.c_custkey"), F.col("s.custkey")).alias("custkey"),
        F.when(F.col("t.c_custkey").isNull(), F.lit("inserted"))
        .when(F.col("s.custkey").isNull(), F.lit("kept"))
        .otherwise(F.lit("updated"))
        .alias("status"),
        _X.exact_round(
            F.coalesce(_X.to_units(F.col("t.c_acctbal"), 2), F.lit(0)) * 100000
            + F.coalesce(F.col("s.spend_c"), F.lit(0)) * 100,
            7,
            2,
        ).alias("acctbal_new"),
        F.coalesce(F.col("s.n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


# --- Z-order layout (round 3) ----------------------------------------------
#
# The data-layout half of table maintenance: multi-dimensional clustering
# for scan pruning (the Delta OPTIMIZE ZORDER BY / Iceberg sort-order
# idiom).  Interleaving the bits of two scan dimensions gives every
# contiguous z-range a tight bounding rectangle in BOTH dimensions, so
# min/max footer stats prune files for EITHER predicate — the property the
# test below asserts exactly (64x64 tiles at this bucket width).  At
# 100 TB: compute z, repartitionByRange(z), write — each output file then
# covers one tile.  All integer bit math, so the oracle is exact.

Z_BITS = 16  # bits per dimension
Z_BUCKET_SHIFT = 12  # drop 6 bits/dim -> 64x64 tiles


def zorder_value(x, y):
    """Interleave the low Z_BITS of x (odd positions) and y (even)."""
    z = F.lit(0).cast("long")
    for j in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, j).bitwiseAND(F.lit(1)), 2 * j + 1)
            + F.shiftleft(F.shiftright(y, j).bitwiseAND(F.lit(1)), 2 * j)
        )
    return z


def _sql_zvalue(x: str, y: str) -> str:
    terms = []
    for j in range(Z_BITS):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j + 1})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j})")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder",
    tags=("layout", "maintenance"),
    oracle=f"""
WITH dims AS (
  SELECT user_id AS x,
         CAST(date_part('hour', ts) * 60 + date_part('minute', ts) AS BIGINT) AS y
  FROM events
),
z AS (SELECT x, y, {_sql_zvalue('x', 'y')} >> {Z_BUCKET_SHIFT} AS zbucket FROM dims)
SELECT zbucket, count(*) AS n,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM z GROUP BY zbucket
""",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over (user_id, minute-of-day): per-tile
    row counts and min/max extents — the footer stats a z-ordered rewrite
    would give every file.  The plan is one scan + one hash aggregate; the
    production rewrite inserts repartitionByRange(zvalue) before the
    write, which adds exactly one range shuffle."""
    ev = table(spark, sf_dir, "events")
    x = F.col("user_id")
    y = (F.hour("ts") * 60 + F.minute("ts")).cast("long")
    z = ev.select(
        x.alias("x"),
        y.alias("y"),
        F.shiftright(zorder_value(x, y), Z_BUCKET_SHIFT).alias("zbucket"),
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
