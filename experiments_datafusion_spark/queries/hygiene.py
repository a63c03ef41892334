"""Eval-set hygiene and corpus-mixing operators — the governance layer of a
training-data pipeline: benchmark contamination detection (train docs that
contain eval n-grams), leakage-safe splitting (near-dup clusters never
straddle train/test), percentile quality gating, and weighted per-source
mixing toward a target data mix.

Every op reuses the shared portable primitives (operators/text.py hash64 and
shingles, operators/dedup.py posting lists, operators/graph.py connected
components) so the DuckDB oracles replay the full pipelines bit-for-bit.

Scale notes (100 TB):
  * contamination joins TRAIN postings against EVAL postings on the hashed
    shingle — the eval side is a benchmark set (tiny by construction), so
    the join is effectively a semi-broadcast lookup; never all-pairs;
  * the leakage-safe split reuses the exact-Jaccard pair graph + iterative
    min-label propagation; the split key is the CLUSTER id, so near-dup
    docs move between splits as one unit (the property that kills
    train/test contamination at the source);
  * the quality gate computes ONE exact percentile (partial+final agg) and
    attaches it as a 1-row broadcast — no global window, no collect;
  * mixing is a pure scan-side filter on a hash of (doc, source) —
    deterministic across engines and cluster sizes, zero shuffles before
    the per-source rollup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import dedup as D
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.operators.graph import connected_components
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.llm_dedup import _SQL_SHINGLE_CTE
from experiments_datafusion_spark.queries.llm_text import sql_quality

_SQL_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

# Contamination: flag a train doc when it shares >= this fraction of an eval
# doc's shingles (containment of the EVAL doc, the asymmetric metric used
# for benchmark-contamination checks — Jaccard would under-flag long train
# docs that embed a whole short benchmark item).
CONTAIN_T = 0.3


@register(
    "contamination_ngram",
    tags=("hygiene", "dedup"),
    oracle=f"""
WITH {_SQL_SHINGLE_CTE},
esel AS (
  SELECT doc_id FROM documents
  WHERE {_SQL_H64.format(x="CAST(doc_id AS VARCHAR)")} % 20 = 0
),
esh AS (SELECT sh.doc_id, s FROM sh JOIN esel USING (doc_id)),
tsh AS (SELECT sh.doc_id, s FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM esel)),
ov AS (
  SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS common
  FROM tsh t JOIN esh e ON t.s = e.s
  GROUP BY 1, 2
),
flagged AS (
  SELECT eval_doc, common * 1.0 / sizes.n_sh AS containment
  FROM ov JOIN sizes ON eval_doc = sizes.doc_id
  WHERE common * 1.0 / sizes.n_sh >= {CONTAIN_T}
)
SELECT eval_doc, count(*) AS n_flagged_train,
       round(max(containment), 4) AS max_containment
FROM flagged GROUP BY eval_doc
""",
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: a deterministic ~5% hash sample plays
    the role of the eval benchmark; any TRAIN document containing >= 30% of
    an eval document's 3-gram shingles is flagged. Reports, per
    contaminated eval doc, how many train docs hit it and the worst
    containment. The join is posting-list vs posting-list on the 60-bit
    shingle hash with the (small) eval side broadcast — candidate work is
    proportional to true overlap, never |train| x |eval|."""
    docs = table(spark, sf_dir, "documents")
    sh = D.doc_shingles(docs).localCheckpoint(eager=True)
    eval_ids = docs.select("doc_id").where(
        T.hash64(F.col("doc_id").cast("string")) % 20 == 0
    )
    esh = sh.join(F.broadcast(eval_ids), "doc_id")
    tsh = sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    esizes = esh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ov = (
        tsh.alias("t")
        .join(esh.alias("e"), F.col("t.shingle") == F.col("e.shingle"))
        .groupBy(
            F.col("t.doc_id").alias("train_doc"),
            F.col("e.doc_id").alias("eval_doc"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    containment = F.col("common") / F.col("n_sh")
    return (
        ov.join(esizes.withColumnRenamed("doc_id", "eval_doc"), "eval_doc")
        .where(containment >= CONTAIN_T)
        .groupBy("eval_doc")
        .agg(
            F.count(F.lit(1)).alias("n_flagged_train"),
            F.round(F.max(containment), 4).alias("max_containment"),
        )
    )


@register(
    "split_leakage_safe",
    tags=("hygiene", "sample", "graph"),
    oracle=f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
pairs AS (SELECT x, y FROM jac WHERE jaccard_raw >= 0.5),
edges AS (SELECT x AS src, y AS dst FROM pairs UNION SELECT y, x FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
bucketed AS (
  SELECT cluster, {_SQL_H64.format(x="CAST(cluster AS VARCHAR)")} % 100 AS b
  FROM assigned
)
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation' ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
FROM bucketed GROUP BY 1
""",
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation/test split: hash-bucket by near-dup
    CLUSTER id (connected components over the exact-Jaccard >= 0.5 pair
    graph; singletons are their own cluster), so near-duplicate documents
    land on the same side of every split by construction — the defense
    against eval contamination that plain per-doc splitting cannot give.
    Same 80/10/10 hash recipe as ``split_train_test``; the oracle reaches
    the same components via a recursive CTE."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, 0.5).select("x", "y")
    cc = connected_components(pairs)
    assigned = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"))
    )
    bucket = T.hash64(F.col("cluster").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return (
        assigned.select(split.alias("split"), "cluster")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster").alias("n_clusters"),
        )
    )


@register(
    "quality_gate_percentile",
    tags=("hygiene", "text"),
    oracle=f"""
WITH q AS (SELECT doc_id, lang, {sql_quality()} AS q FROM documents),
c AS (SELECT quantile_cont(q, 0.75) AS cutoff FROM q)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN q >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(sum(CASE WHEN q >= cutoff THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS pct_pass,
       round(max(cutoff), 6) AS cutoff
FROM q CROSS JOIN c
GROUP BY lang
""",
)
def quality_gate_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile quality gate: keep documents scoring at or above the
    corpus-wide p75 of the composite quality heuristic, reported per
    language (which strata does a global gate starve?). The cutoff is ONE
    exact interpolated percentile (Spark ``percentile`` == DuckDB
    ``quantile_cont``) computed by a partial+final aggregation and attached
    as a 1-row broadcast — never a global window or a driver collect."""
    docs = table(spark, sf_dir, "documents")
    q = docs.select("lang", T.quality_score(F.col("text")).alias("q"))
    cut = q.agg(F.percentile(F.col("q"), F.lit(0.75)).alias("cutoff"))
    return (
        q.crossJoin(F.broadcast(cut))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("q") >= F.col("cutoff")).cast("long")).alias("n_pass"),
            F.round(
                F.sum((F.col("q") >= F.col("cutoff")).cast("long")) / F.count(F.lit(1)), 4
            ).alias("pct_pass"),
            F.round(F.max("cutoff"), 6).alias("cutoff"),
        )
    )


@register(
    "mix_weighted_sources",
    tags=("hygiene", "sample"),
    oracle=f"""
WITH m AS (
  SELECT source,
         (1 + CAST(substr(source, 4) AS BIGINT) % 4) / 4.0 AS target_rate,
         CASE WHEN {_SQL_H64.format(x="CAST(doc_id AS VARCHAR) || ':' || source")} % 1000
                   < ((1 + CAST(substr(source, 4) AS BIGINT) % 4) / 4.0) * 1000
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source,
       count(*) AS n_total,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       round(target_rate, 2) AS target_rate,
       round(sum(keep) * 1.0 / count(*), 4) AS actual_rate
FROM m GROUP BY source, target_rate
""",
)
def mix_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixing: each source gets a target sampling rate (here a
    deterministic 0.25/0.5/0.75/1.0 schedule keyed on the source id — in
    production this is the data-mix table) and docs are kept by hash of
    (doc_id, source) against that rate. Reports target vs achieved rate per
    source — the drift monitor for a mix plan. Pure scan-side filter: the
    keep decision is reproducible on any engine or cluster size, and the
    only shuffle is the final per-source rollup."""
    docs = table(spark, sf_dir, "documents")
    src_num = F.substring(F.col("source"), 4, 8).cast("long")
    target_rate = (1 + src_num % 4) / 4.0
    keep = (
        T.hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source")))
        % 1000
        < target_rate * 1000
    ).cast("long")
    return (
        docs.select("source", target_rate.alias("target_rate"), keep.alias("keep"))
        .groupBy("source", "target_rate")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_kept"),
            F.round(F.sum("keep") / F.count(F.lit(1)), 4).alias("actual_rate"),
        )
        .select(
            "source", "n_total", "n_kept",
            F.round("target_rate", 2).alias("target_rate"), "actual_rate",
        )
    )


@register(
    "dq_expectations",
    tags=("hygiene", "quality", "audit"),
    oracle="""
WITH a AS (
  SELECT count(*) AS n,
    sum(CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS v1,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
              OR o_orderdate > TIMESTAMP '1998-12-31 23:59:59'
              OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS v2,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v3,
    count(*) - count(DISTINCT o_orderkey) AS v4,
    sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
              OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS v5
  FROM orders
)
SELECT 'totalprice_positive' AS rule, CAST(n AS BIGINT) AS n_checked,
       CAST(v1 AS BIGINT) AS n_violations, CAST(v1 = 0 AS BIGINT) AS pass FROM a
UNION ALL SELECT 'orderdate_in_range', CAST(n AS BIGINT), CAST(v2 AS BIGINT), CAST(v2 = 0 AS BIGINT) FROM a
UNION ALL SELECT 'custkey_not_null', CAST(n AS BIGINT), CAST(v3 AS BIGINT), CAST(v3 = 0 AS BIGINT) FROM a
UNION ALL SELECT 'orderkey_unique', CAST(n AS BIGINT), CAST(v4 AS BIGINT), CAST(v4 = 0 AS BIGINT) FROM a
UNION ALL SELECT 'status_in_domain', CAST(n AS BIGINT), CAST(v5 AS BIGINT), CAST(v5 = 0 AS BIGINT) FROM a
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ / Great Expectations
    shape): a rule set — positivity, domain membership, null checks, date
    range, key uniqueness — evaluated in ONE scan as conditional aggregates
    (uniqueness rides the same aggregate as count - count(DISTINCT key)),
    then unpivoted to a (rule, n_checked, n_violations, pass) report.
    Scale: one partial+final aggregate over the table no matter how many
    rules; adding a rule adds a column, not a pass.  The 5-row unpivot is
    driver-trivial."""
    o = table(spark, sf_dir, "orders")
    viol = [
        ("totalprice_positive",
         F.sum(F.when(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1).otherwise(0))),
        ("orderdate_in_range",
         F.sum(F.when(
             F.col("o_orderdate").isNull()
             | (F.col("o_orderdate") < F.lit("1992-01-01 00:00:00").cast("timestamp"))
             | (F.col("o_orderdate") > F.lit("1998-12-31 23:59:59").cast("timestamp")),
             1).otherwise(0))),
        ("custkey_not_null",
         F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))),
        ("orderkey_unique",
         F.count(F.lit(1)) - F.count_distinct("o_orderkey")),
        ("status_in_domain",
         F.sum(F.when(
             F.col("o_orderstatus").isNull()
             | ~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0))),
    ]
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[c.cast("long").alias(f"v{i}") for i, (_, c) in enumerate(viol)],
    )
    stack_args = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(viol))
    return agg.selectExpr(
        f"stack({len(viol)}, {stack_args}) AS (rule, n_violations)", "n"
    ).select(
        "rule",
        F.col("n").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).cast("long").alias("pass"),
    )


# ---- one-pass column profiling (the Deequ "analyzer" shape) ----------------

# (column, null-check expr suffix, min/max renderer) per orders column.  The
# renderers are chosen for cross-engine determinism: integers/strings render
# natively, money renders as half-up integer cents (floor(x*100 + 0.5) — one
# IEEE multiply + floor, identical in both engines), timestamps render as
# "yyyy-MM-dd HH:mm:ss".


@register(
    "profile_columns",
    tags=("hygiene", "quality", "audit"),
    oracle="""
WITH a AS (
  SELECT count(*) AS n,
    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn0,
    count(DISTINCT o_orderkey) AS nd0,
    CAST(min(o_orderkey) AS VARCHAR) AS mn0, CAST(max(o_orderkey) AS VARCHAR) AS mx0,
    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn1,
    count(DISTINCT o_custkey) AS nd1,
    CAST(min(o_custkey) AS VARCHAR) AS mn1, CAST(max(o_custkey) AS VARCHAR) AS mx1,
    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn2,
    count(DISTINCT o_orderstatus) AS nd2,
    min(o_orderstatus) AS mn2, max(o_orderstatus) AS mx2,
    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn3,
    count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS nd3,
    CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS mn3,
    CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS VARCHAR) AS mx3,
    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn4,
    count(DISTINCT o_orderdate) AS nd4,
    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn4,
    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx4,
    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn5,
    count(DISTINCT o_orderpriority) AS nd5,
    min(o_orderpriority) AS mn5, max(o_orderpriority) AS mx5
  FROM orders
)
SELECT 'o_orderkey' AS col_name, CAST(n AS BIGINT) AS n_rows,
       CAST(nn0 AS BIGINT) AS n_nulls, CAST(nd0 AS BIGINT) AS n_distinct,
       mn0 AS min_s, mx0 AS max_s FROM a
UNION ALL SELECT 'o_custkey', CAST(n AS BIGINT), CAST(nn1 AS BIGINT), CAST(nd1 AS BIGINT), mn1, mx1 FROM a
UNION ALL SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(nn2 AS BIGINT), CAST(nd2 AS BIGINT), mn2, mx2 FROM a
UNION ALL SELECT 'o_totalprice_cents', CAST(n AS BIGINT), CAST(nn3 AS BIGINT), CAST(nd3 AS BIGINT), mn3, mx3 FROM a
UNION ALL SELECT 'o_orderdate', CAST(n AS BIGINT), CAST(nn4 AS BIGINT), CAST(nd4 AS BIGINT), mn4, mx4 FROM a
UNION ALL SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(nn5 AS BIGINT), CAST(nd5 AS BIGINT), mn5, mx5 FROM a
""",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the Deequ/Great Expectations "analyzer"
    report): for every column of `orders` — null count, exact distinct
    count, min and max rendered portably (money as half-up integer cents,
    timestamps as yyyy-MM-dd HH:mm:ss) — emitted as one (col_name, n_rows,
    n_nulls, n_distinct, min_s, max_s) row per column.

    Shape: ALL profiles ride ONE partial+final aggregate over the table
    (adding a column adds agg expressions, not a pass); Spark plans the
    multi-count-distinct via a single expand + two-stage aggregate.  The
    6-row unpivot is driver-trivial.  This is the audit every ingest step
    of a 100 TB pipeline runs before accepting a drop."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    fmt_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    profs = [
        ("o_orderkey", F.col("o_orderkey"),
         lambda c: F.min(c).cast("string"), lambda c: F.max(c).cast("string")),
        ("o_custkey", F.col("o_custkey"),
         lambda c: F.min(c).cast("string"), lambda c: F.max(c).cast("string")),
        ("o_orderstatus", F.col("o_orderstatus"), F.min, F.max),
        ("o_totalprice_cents", cents,
         lambda c: F.min(c).cast("string"), lambda c: F.max(c).cast("string")),
        ("o_orderdate", F.col("o_orderdate"),
         lambda c: fmt_ts(F.min(c)), lambda c: fmt_ts(F.max(c))),
        ("o_orderpriority", F.col("o_orderpriority"), F.min, F.max),
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (_, col, mn, mx) in enumerate(profs):
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"nn{i}"),
            F.count_distinct(col).alias(f"nd{i}"),
            mn(col).alias(f"mn{i}"),
            mx(col).alias(f"mx{i}"),
        ]
    agg = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', nn{i}, nd{i}, mn{i}, mx{i}" for i, (name, *_) in enumerate(profs)
    )
    return agg.selectExpr(
        f"stack({len(profs)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_s, max_s)",
        "n",
    ).select(
        "col_name",
        F.col("n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_s",
        "max_s",
    )
