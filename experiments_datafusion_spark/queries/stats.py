"""Distribution-drift and statistical-monitoring operators (round 4).

The data-quality layer a 100 TB training pipeline runs BESIDE the curation
ops: did this week's crawl shift against last week's (PSI, KS,
chi-square)?  does one source's token distribution diverge from the corpus
(KL)?  what transitions do users actually make (Markov)?  which tokens
imply which (association rules)?  which values are robust outliers (MAD)?

Reference parity: these extend the same DataFusion aggregate/window
surface the reference pulls in (Cargo.toml:10) the way its users extend
it — everything here is expressible as grouped aggregates + window
functions, no UDFs anywhere.

Determinism strategy (see exact.py and the repo's oracle recipes):
- counts and totals are int64 end-to-end; ratios are emitted as integer
  milli/micro-units via truncating `div` — zero float risk (KS, Markov,
  association rules, expected counts).
- where a statistic is intrinsically real-valued (PSI, chi-square, KL),
  every input double is either a raw column value or an int64 < 2^53 cast
  losslessly, and both engines evaluate the SAME IEEE expression tree, so
  per-row/per-cell results are bit-identical; only KL sums such terms
  across rows, and absorbs the engine fold-order difference with the same
  round(, 4) that text_unigram_logprob has proven at three scales.
- discrete medians (MAD) select the element at row (n+1)//2 ordered
  ascending — verified equal to DuckDB's quantile_disc(x, 0.5) — so the
  statistic is a SELECTION of a raw double, never arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from experiments_datafusion_spark.io import spread, table
from experiments_datafusion_spark.operators import sketches as SK
from experiments_datafusion_spark.operators import text as T
from experiments_datafusion_spark.queries import register
from experiments_datafusion_spark.queries.search import (
    _PAIR_MAX_DF_PCT,
    _PAIR_MIN_DF,
    _PAIR_MIN_SUPPORT_PCT,
)

_PSI_BINS = 10
_MAD_K = 3  # outlier threshold: dev > 3 * MAD


def _us(col: str):
    """Integer epoch microseconds (parquet ts is NTZ, session tz UTC)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# period split shared by PSI and chi-square: first half of the observed
# time range is the reference window, second half is the current window —
# integer-microsecond midpoint, no float time math
_SQL_PERIOD_CTES = """
tr AS (SELECT min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
       FROM events),
pe AS (
  SELECT e.*, CASE WHEN epoch_us(e.ts) < tr.min_us + (tr.max_us - tr.min_us) // 2
                   THEN 0 ELSE 1 END AS period
  FROM events e CROSS JOIN tr
)"""


@register(
    "drift_psi",
    tags=("stats", "drift", "events"),
    oracle=f"""
WITH {_SQL_PERIOD_CTES},
vr AS (SELECT min(value) AS min_v, max(value) AS max_v FROM events),
binned AS (
  SELECT period,
         CASE WHEN vr.max_v = vr.min_v THEN 0
              ELSE least(CAST(floor((value - vr.min_v) * {_PSI_BINS}.0
                               / (vr.max_v - vr.min_v)) AS BIGINT),
                         {_PSI_BINS - 1}) END AS bin
  FROM pe CROSS JOIN vr
),
spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin),
cnt AS (
  SELECT s.bin,
         CAST(coalesce(sum(CASE WHEN b.period = 0 THEN 1 END), 0) AS BIGINT) AS n_ref,
         CAST(coalesce(sum(CASE WHEN b.period = 1 THEN 1 END), 0) AS BIGINT) AS n_cur
  FROM spine s LEFT JOIN binned b ON s.bin = b.bin
  GROUP BY s.bin
),
tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM cnt)
SELECT bin, n_ref, n_cur,
       round(((n_ref + 1.0) / (t_ref + {_PSI_BINS}.0)
              - (n_cur + 1.0) / (t_cur + {_PSI_BINS}.0))
             * ln(((n_ref + 1.0) / (t_ref + {_PSI_BINS}.0))
                  / ((n_cur + 1.0) / (t_cur + {_PSI_BINS}.0))), 6) AS psi_bin
FROM cnt CROSS JOIN tot
ORDER BY bin
""",
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream: equal-width decile bins over the GLOBAL value range,
    Laplace-smoothed shares (+1 per bin, so empty bins never divide by
    zero), per-bin contribution (p_ref - p_cur) * ln(p_ref / p_cur).
    The credit-scoring / model-monitoring drift metric (>0.25 total =
    population shift).

    Shape at 100 TB: two 1-row scalar broadcasts (time range, value
    range), ONE map-side-combined groupBy(period, bin) over the events
    scan — 2x10 partial rows per task — then a 10-row spine join.  The
    per-bin PSI term is pure IEEE arithmetic on int64-derived doubles:
    both engines evaluate the identical expression tree, so even the ln
    is bit-for-bit; no cross-row float accumulation anywhere."""
    e = table(spark, sf_dir, "events")
    tr = e.agg(
        F.min(_us("ts")).alias("min_us"),
        F.max(_us("ts")).alias("max_us"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    binned = (
        e.crossJoin(F.broadcast(tr))
        .select(
            F.when(
                _us("ts") < F.expr("min_us + (max_us - min_us) div 2"), 0
            )
            .otherwise(1)
            .alias("period"),
            # degenerate-range guard: all-equal values put every row in
            # bin 0 (the oracle carries the same CASE) — without it both
            # engines divide by zero and NaN/Inf floor-cast semantics
            # differ between Spark and DuckDB
            F.when(F.col("max_v") == F.col("min_v"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("min_v"))
                        * float(_PSI_BINS)
                        / (F.col("max_v") - F.col("min_v"))
                    ).cast("long"),
                    F.lit(_PSI_BINS - 1).cast("long"),
                )
            ).alias("bin"),
        )
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    cnt = (
        spine.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == 0, 1)), F.lit(0)
            ).cast("long").alias("n_ref"),
            F.coalesce(
                F.sum(F.when(F.col("period") == 1, 1)), F.lit(0)
            ).cast("long").alias("n_cur"),
        )
    )
    tot = cnt.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + float(_PSI_BINS))
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + float(_PSI_BINS))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round((p_ref - p_cur) * F.ln(p_ref / p_cur), 6).alias("psi_bin"),
        )
        .orderBy("bin")
    )


@register(
    "drift_ks",
    tags=("stats", "drift", "events"),
    oracle="""
WITH v AS (
  SELECT value,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM events GROUP BY value
),
c AS (
  SELECT value,
         sum(c_a) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_a,
         sum(c_b) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_b
  FROM v
),
t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b
      FROM v)
SELECT t.n_a, t.n_b,
       CAST(max(abs(cum_a * t.n_b - cum_b * t.n_a)) AS BIGINT) AS ks_num,
       CAST(t.n_a * t.n_b AS BIGINT) AS ks_den,
       CAST(max(abs(cum_a * t.n_b - cum_b * t.n_a)) * 1000
            // (t.n_a * t.n_b) AS BIGINT) AS ks_milli
FROM c CROSS JOIN t
GROUP BY t.n_a, t.n_b
""",
)
def drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of 'click' events and everything else: group by distinct
    value, running cumulative counts, D = max |ECDF_a - ECDF_b| carried as
    the INTEGER cross product |cum_a*n_b - cum_b*n_a| over the common
    denominator n_a*n_b — the whole statistic is int64-exact, reported in
    truncated milli-units.

    Shape: one map-side-combined groupBy(value) collapses the scan to
    |distinct values| rows; the single-partition running-sum window over
    that reduced relation is the documented small-output trade (same as
    rfm_segmentation's ntile) — the 100 TB variant pre-bins values to a
    fixed grid first (drift_psi's binning), making the window spine
    constant-width, or computes per-partition cumulative offsets in a
    second pass."""
    e = table(spark, sf_dir, "events")
    is_a = F.col("event_type") == "click"
    v = e.groupBy("value").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("c_b"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = v.select(
        "value",
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    )
    t = v.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    d = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("n_a", "n_b")
        .agg(F.max(d).cast("long").alias("ks_num"))
        .select(
            "n_a",
            "n_b",
            "ks_num",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("ks_den"),
            F.expr("ks_num * 1000 div (n_a * n_b)").cast("long").alias("ks_milli"),
        )
    )


@register(
    "drift_chi2",
    tags=("stats", "drift", "events"),
    oracle=f"""
WITH {_SQL_PERIOD_CTES},
o AS (
  SELECT event_type, period, CAST(count(*) AS BIGINT) AS obs
  FROM pe GROUP BY event_type, period
),
m AS (
  SELECT event_type, period, obs,
         sum(obs) OVER (PARTITION BY event_type) AS rt,
         sum(obs) OVER (PARTITION BY period)     AS ct,
         sum(obs) OVER ()                        AS n
  FROM o
)
SELECT event_type, period, obs,
       CAST(rt * ct * 1000000 // n AS BIGINT) AS exp_micro,
       round(
         (CAST(obs * n - rt * ct AS DOUBLE) * CAST(obs * n - rt * ct AS DOUBLE))
         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) * CAST(n AS DOUBLE)),
         6) AS chi2_cell
FROM m
ORDER BY event_type, period
""",
)
def drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity cells for the event_type x period(half)
    contingency table: observed counts, expected counts as exact integer
    micro-units (row_total * col_total * 1e6 div N), and the per-cell
    contribution (obs - exp)^2 / exp computed entirely from int64-derived
    doubles — the numerator is the EXACT integer obs*N - rt*ct (< 2^53)
    cast losslessly, so both engines square and divide identical doubles;
    no cross-row accumulation, every output cell independently exact.

    Shape: one groupBy over the scan to a |types| x 2 relation; the three
    marginal sums are windows over those ~10 rows (trivially small by
    construction — the contingency table IS the reduction)."""
    e = table(spark, sf_dir, "events")
    tr = e.agg(F.min(_us("ts")).alias("min_us"), F.max(_us("ts")).alias("max_us"))
    pe = e.crossJoin(F.broadcast(tr)).select(
        "event_type",
        F.when(_us("ts") < F.expr("min_us + (max_us - min_us) div 2"), 0)
        .otherwise(1)
        .alias("period"),
    )
    o = pe.groupBy("event_type", "period").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    m = o.select(
        "*",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("obs").over(Window.partitionBy("period")).alias("ct"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    dev = (F.col("obs") * F.col("n") - F.col("rt") * F.col("ct")).cast("double")
    den = (
        F.col("rt").cast("double") * F.col("ct").cast("double") * F.col("n").cast("double")
    )
    return m.select(
        "event_type",
        "period",
        "obs",
        F.expr("rt * ct * 1000000 div n").cast("long").alias("exp_micro"),
        F.round(dev * dev / den, 6).alias("chi2_cell"),
    ).orderBy("event_type", "period")


@register(
    "ev_markov_chain",
    tags=("stats", "events", "window"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT from_type, to_type, n,
       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_milli
FROM tr
ORDER BY from_type, to_type
""",
)
def ev_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag() pairs each event with its predecessor (deterministic (ts,
    event_id) ordering), transition counts, and row-normalized
    probabilities in truncated integer milli-units — the user-behavior /
    next-event-prediction shape.

    Shape at 100 TB: ONE shuffle on user_id for the lag window (sequences
    are per-user local), then a map-side-combined groupBy collapsing to
    the |types|^2 transition matrix; the normalizing row-sum is a window
    over those ~25 rows."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    tr = seq.groupBy(
        F.col("prev_type").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    row = Window.partitionBy("from_type")
    return tr.withColumn("total_from", F.sum("n").over(row)).select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000 div total_from").cast("long").alias("p_milli"),
    ).orderBy("from_type", "to_type")


@register(
    "assoc_rules",
    tags=("llm", "text", "analytics", "stats"),
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS term
  FROM documents
),
stats AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
d AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
kept AS (
  SELECT t.doc_id, t.term, d.df
  FROM toks t JOIN d USING (term) CROSS JOIN stats s
  WHERE d.df >= {_PAIR_MIN_DF} AND d.df * 100 <= s.n_docs * {_PAIR_MAX_DF_PCT}
),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         any_value(a.df) AS df_a, any_value(b.df) AS df_b,
         count(*) AS support
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT term_a, term_b,
       CAST(support AS BIGINT)                      AS support,
       CAST(support * 1000 // df_a AS BIGINT)       AS conf_a2b_milli,
       CAST(support * 1000 // df_b AS BIGINT)       AS conf_b2a_milli,
       CAST(support * s.n_docs * 1000000 // (df_a * df_b) AS BIGINT)
                                                    AS lift_micro
FROM pairs CROSS JOIN stats s
WHERE support * 100 >= s.n_docs * {_PAIR_MIN_SUPPORT_PCT}
ORDER BY term_a, term_b
""",
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule generation over the frequent token pairs (the
    A-priori second step on top of freq_token_pairs' first pass): for each
    supported pair, DIRECTIONAL confidence conf(a=>b) = support/df_a and
    conf(b=>a) = support/df_b in truncated milli-units, plus symmetric
    lift — all integer divisions of exact counts.

    Shape: identical to freq_token_pairs (same df-cap bounding the
    doc-keyed self-join fan-out; only the capped vocab df table and 1-row
    corpus stats broadcast); the rule metrics add zero extra passes —
    they're projections of columns the pair aggregate already carries."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(F.array_distinct(T.words(F.col("text")))).alias("term"),
        )
        .localCheckpoint(eager=True)
    )
    stats = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        toks.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .where(
            (F.col("df") >= _PAIR_MIN_DF)
            & (F.col("df") * 100 <= F.col("n_docs") * _PAIR_MAX_DF_PCT)
        )
        .select("doc_id", "term", "df")
    )
    a = kept.select("doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = kept.select("doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.any_value("df_a").alias("df_a"),
            F.any_value("df_b").alias("df_b"),
            F.count(F.lit(1)).cast("long").alias("support"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .where(F.col("support") * 100 >= F.col("n_docs") * _PAIR_MIN_SUPPORT_PCT)
        .select(
            "term_a",
            "term_b",
            "support",
            F.expr("support * 1000 div df_a").cast("long").alias("conf_a2b_milli"),
            F.expr("support * 1000 div df_b").cast("long").alias("conf_b2a_milli"),
            F.expr("support * n_docs * 1000000 div (df_a * df_b)")
            .cast("long")
            .alias("lift_micro"),
        )
        .orderBy("term_a", "term_b")
    )


@register(
    "anomaly_mad",
    tags=("stats", "events", "window"),
    oracle=f"""
WITH m AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, abs(e.value - m.med) AS dev, m.med, m.n
  FROM events e JOIN m USING (event_type)
),
md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY event_type)
SELECT d.event_type,
       any_value(d.n)   AS n,
       any_value(d.med) AS med,
       any_value(md.mad) AS mad,
       CAST(sum(CASE WHEN d.dev > {_MAD_K} * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via Median Absolute
    Deviation: discrete median (the element at row (n+1)//2 ordered
    ascending — equal by construction to DuckDB's quantile_disc, verified
    for odd/even/tied inputs), MAD = discrete median of |value - median|,
    outliers = deviations beyond 3*MAD.  Unlike the z-score twin
    (anomaly_zscore), medians don't move when the outliers themselves get
    bigger — the robust-statistics point.

    Determinism: both medians are SELECTIONS of raw doubles (duplicate
    values make the selected value invariant to tie order); |v - med| and
    the 3*MAD comparison are single identical IEEE expressions.

    Shape: two window passes partitioned by event_type (rank to select
    the median element) with tiny per-type median relations broadcast
    back — counts and flags aggregate map-side.  Per-type partitions carry
    the full type's rows; the 100 TB variant swaps the exact rank-select
    for a fixed-grid histogram median (drift_psi's binning) when a single
    type outgrows a partition."""
    e = table(spark, sf_dir, "events").select("event_type", "value")
    wv = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "*",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = (
        ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("value").alias("med"), F.col("n"))
    )
    d = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "med",
        "n",
    )
    wd = Window.partitionBy("event_type").orderBy("dev")
    mad = (
        d.select("*", F.row_number().over(wd).alias("rn"))
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad"))
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n").alias("n"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > _MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_HH_K = 1024  # MG counters per task; sound for thresholds above N/1024
# heavy hitter = bigram with count * 750 > corpus tokens; 750 < k keeps the
# pigeonhole soundness margin AND lands inside the synthetic corpus's
# near-uniform count range at every test scale (non-empty output at
# sf0.001/0.01/0.1 — an empty result would make the hash check vacuous)
_HH_DIV = 750


@register(
    "heavy_hitters_sketch",
    tags=("stats", "sketch", "llm", "text"),
    oracle=f"""
WITH w AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
bi AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
    AS term
  FROM w
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM bi)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM bi CROSS JOIN tot
GROUP BY term, tot.n_tok
HAVING count(*) * {_HH_DIV} > tot.n_tok
ORDER BY n DESC, term
""",
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram heavy hitters via the TWO-PASS Misra-Gries sketch
    (operators/sketches.py): pass 1 runs k=1024 MG counters per task —
    bounded memory, a guaranteed candidate SUPERSET of anything above
    N/1024 by the per-partition pigeonhole argument — pass 2 exactly
    recounts only the candidates (broadcast semi-join) and keeps bigrams
    above N/_HH_DIV (= N/750).  Because 1/750 > 1/1024, the output is
    provably EXACT —
    identical to the full groupBy — which is why a hash oracle can check a
    sketch: the oracle computes the plain exact answer.

    Shape at 100 TB: pass 1 shuffles NOTHING (mapInPandas is
    partition-local, k rows of state per task); only the tiny candidate
    set and their recount shuffle.  The full-vocabulary groupBy the oracle
    runs is exactly what this operator avoids."""
    docs = table(spark, sf_dir, "documents")
    d = spread(docs).select(T.words(F.lower(F.col("text"))).alias("w"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"),
    ).otherwise(F.array().cast("array<string>"))
    items = d.select(F.explode(bigrams).alias("term"))
    tot = items.agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    counts = (
        items.join(F.broadcast(SK.mg_candidates(items, "term", _HH_K)), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .where(F.col("n") * _HH_DIV > F.col("n_tok"))
        .select("term", "n")
        .orderBy(F.desc("n"), F.asc("term"))
    )


@register(
    "ts_autocorr",
    tags=("stats", "timeseries", "events", "window"),
    oracle="""
WITH p AS (
  SELECT event_type,
         CAST(floor(value * 1000) AS BIGINT) AS y,
         lag(CAST(floor(value * 1000) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS x
  FROM events
),
s AS (
  SELECT event_type,
         CAST(count(*)   AS BIGINT) AS n,
         CAST(sum(x)     AS BIGINT) AS sx,
         CAST(sum(y)     AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM p WHERE x IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS autocorr
FROM s
WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
  AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
ORDER BY event_type
""",
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of value per event_type (the time-series
    seasonality/momentum diagnostic): lag() pairs each value with its
    predecessor in (ts, event_id) order, then Pearson r over the pairs.

    Determinism: values quantize per-row to integer milli-units (floor of
    an identical double — single-op deterministic), the SIX moment sums
    are associative int64 additions (y <= 5.6e5 -> x*y <= 3.2e11; 2e7
    pairs of headroom per type before 2^63 — beyond that drop to
    centi-units or Spark decimal(38) partials), and the closing Pearson
    formula is ONE identical IEEE expression on losslessly-cast int64s —
    the drift_chi2 trick, so no round(sum(double)) anywhere.  Zero-
    variance groups are excluded in both engines (NaN has no portable
    hash).

    Shape at 100 TB: one shuffle on event_type for the lag window (the
    per-type sequence is the partition), map-side-combined moment sums
    collapse each partition to one row."""
    e = table(spark, sf_dir, "events")
    y = F.floor(F.col("value") * 1000).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = e.select(
        "event_type", y.alias("y"), F.lag(y).over(w).alias("x")
    ).where(F.col("x").isNotNull())
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = F.col("n").cast("double")
    num = d * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    varx = d * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vary = d * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    # the guard compares the DOUBLE variance expressions (identical IEEE in
    # both engines), not n*sxx vs sx*sx — those int64 products overflow
    return (
        s.where((varx > 0) & (vary > 0))
        .select(
            "event_type",
            "n",
            F.round(num / F.sqrt(varx * vary), 6).alias("autocorr"),
        )
        .orderBy("event_type")
    )


@register(
    "kl_source_divergence",
    tags=("stats", "llm", "text"),
    oracle="""
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS term
  FROM documents
),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
       FROM w GROUP BY source, term),
ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
g  AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_g FROM st GROUP BY term),
tt AS (SELECT CAST(sum(c_st) AS BIGINT) AS t FROM st)
SELECT st.source,
       any_value(ns.n_s)                 AS n_tokens,
       CAST(count(*) AS BIGINT)          AS n_terms,
       round(sum((CAST(st.c_st AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
                 * ln(CAST(st.c_st * tt.t AS DOUBLE)
                      / CAST(ns.n_s * g.c_g AS DOUBLE))), 4) AS kl
FROM st JOIN ns USING (source) JOIN g USING (term) CROSS JOIN tt
GROUP BY st.source
ORDER BY st.source
""",
)
def kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the corpus
    distribution, KL(source || corpus) = sum_t p_s(t) * ln(p_s(t)/p_g(t))
    — the source-skew monitor a mixing pipeline reads before setting
    weights (mix_weighted_sources' diagnostic sibling).

    Determinism: every ratio is a quotient of EXACT int64 products cast
    losslessly to double (c_st * T < 2^53), so each term is bit-identical
    across engines; only the final per-source sum crosses rows, and
    round(, 4) absorbs the partial-vs-sequential fold difference exactly
    as text_unigram_logprob does (green at three scales).

    Shape at 100 TB: explode + map-side-combined groupBy(source, term) is
    the only corpus-sized pass; n_s is a |sources|-row broadcast, the
    global term distribution joins hash-on-term against the per-source
    one, and T is a 1-row broadcast."""
    docs = table(spark, sf_dir, "documents")
    w = spread(docs).select(
        "source", F.explode(T.words(F.col("text"))).alias("term")
    )
    st = w.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c_st")
    )
    ns = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    g = st.groupBy("term").agg(F.sum("c_st").cast("long").alias("c_g"))
    tt = st.agg(F.sum("c_st").cast("long").alias("t"))
    term = (F.col("c_st").cast("double") / F.col("n_s").cast("double")) * F.ln(
        (F.col("c_st") * F.col("t")).cast("double")
        / (F.col("n_s") * F.col("c_g")).cast("double")
    )
    return (
        st.join(F.broadcast(ns), "source")
        .join(g, "term")
        .crossJoin(F.broadcast(tt))
        .groupBy("source")
        .agg(
            F.any_value("n_s").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(F.sum(term), 4).alias("kl"),
        )
        .orderBy("source")
    )


@register(
    "winsorize_stats",
    tags=("stats", "events", "window"),
    oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*)     OVER (PARTITION BY event_type)                AS n
  FROM events
),
lo AS (SELECT event_type, value AS lo
       FROM r WHERE rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))),
hi AS (SELECT event_type, value AS hi
       FROM r WHERE rn = CAST(ceil(0.95 * n) AS BIGINT))
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       any_value(lo.lo)         AS p05,
       any_value(hi.hi)         AS p95,
       CAST(sum(CAST(floor(least(greatest(e.value, lo.lo), hi.hi) * 1000)
                     AS BIGINT)) AS BIGINT)          AS sum_milli,
       CAST(sum(CAST(floor(least(greatest(e.value, lo.lo), hi.hi) * 1000)
                     AS BIGINT)) // count(*) AS BIGINT) AS mean_milli
FROM events e JOIN lo USING (event_type) JOIN hi USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type statistics: clamp value into [p05, p95] — the
    standard outlier-robust preprocessing before scaling/training — and
    report the clamped sum/mean.  The cutoffs are rank SELECTIONS of raw
    doubles (rn == ceil(q*n), tie-invariant: equal values give the same
    selected VALUE whatever the tie order), the clamp is least/greatest
    on identical doubles, and the sum is associative int64 milli-units —
    the anomaly_mad determinism recipe end to end; mean is truncating
    integer division.

    Shape at 100 TB: one shuffle on event_type for the rank window, tiny
    per-type cutoff relations broadcast back, clamped sums aggregate
    map-side (same trade as anomaly_mad; histogram-median swap applies
    if one type outgrows a partition)."""
    e = table(spark, sf_dir, "events").select("event_type", "value")
    wv = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "*",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    lo = ranked.where(
        F.col("rn") == F.greatest(F.lit(1), F.ceil(0.05 * F.col("n")))
    ).select("event_type", F.col("value").alias("lo"))
    hi = ranked.where(F.col("rn") == F.ceil(0.95 * F.col("n"))).select(
        "event_type", F.col("value").alias("hi")
    )
    clamped = (
        e.join(F.broadcast(lo), "event_type")
        .join(F.broadcast(hi), "event_type")
        .select(
            "event_type",
            "lo",
            "hi",
            F.floor(
                F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
                * 1000
            )
            .cast("long")
            .alias("v_milli"),
        )
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.any_value("lo").alias("p05"),
            F.any_value("hi").alias("p95"),
            F.sum("v_milli").cast("long").alias("sum_milli"),
        )
        .select(
            "event_type",
            "n",
            "p05",
            "p95",
            "sum_milli",
            F.expr("sum_milli div n").cast("long").alias("mean_milli"),
        )
        .orderBy("event_type")
    )


@register(
    "histogram_equidepth",
    tags=("stats", "profile", "events", "window"),
    oracle="""
WITH v AS (
  SELECT value, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY value
),
cu AS (
  SELECT value, c,
         sum(c) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM v
),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM v)
SELECT CAST(1 + ((cum - c) * 10) // t.n AS BIGINT) AS bucket,
       CAST(sum(c) AS BIGINT)  AS n_rows,
       CAST(count(*) AS BIGINT) AS n_distinct,
       min(value) AS lo,
       max(value) AS hi
FROM cu CROSS JOIN t
GROUP BY 1
ORDER BY bucket
""",
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of value — the optimizer/profiler
    statistic equal-WIDTH bins (docs_length_histogram, drift_psi) can't
    substitute for on skewed data: each distinct value lands in bucket
    1 + (rows_before * 10) div N, so buckets hold ~N/10 rows except where
    a single heavy value straddles (it stays whole — deterministic, and
    exactly the real histogram-builder behavior).  All integer: counts,
    cumulative sums, and the bucket index; lo/hi are raw-value selections.

    Shape at 100 TB: one map-side-combined groupBy(value) collapses the
    scan to |distinct| rows; the running sum over that reduced relation is
    the drift_ks documented trade (pre-bin to a fixed grid when |distinct|
    itself outgrows a partition), then a 10-row aggregate."""
    e = table(spark, sf_dir, "events")
    v = e.groupBy("value").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cu = v.select("value", "c", F.sum("c").over(w).alias("cum"))
    t = v.agg(F.sum("c").cast("long").alias("n"))
    return (
        cu.crossJoin(F.broadcast(t))
        .select(
            "value",
            "c",
            (F.lit(1) + F.expr("((cum - c) * 10) div n")).cast("long").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


_BOLL_W = 20  # Bollinger window: current row + 19 preceding


@register(
    "ts_bollinger",
    tags=("stats", "timeseries", "events", "window"),
    oracle=f"""
WITH q AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT event_type, event_id, v,
         CAST(count(*) OVER fr AS BIGINT)   AS n_w,
         CAST(sum(v)   OVER fr AS BIGINT)   AS s,
         CAST(sum(v*v) OVER fr AS BIGINT)   AS ss
  FROM q
  WINDOW fr AS (PARTITION BY event_type ORDER BY event_id
                ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, v AS v_milli, n_w,
       round((CAST(s AS DOUBLE)
              + 2 * sqrt(CAST(n_w * ss - s * s AS DOUBLE) / CAST(n_w AS DOUBLE)))
             / CAST(n_w AS DOUBLE), 4) AS upper_milli,
       round((CAST(s AS DOUBLE)
              - 2 * sqrt(CAST(n_w * ss - s * s AS DOUBLE) / CAST(n_w AS DOUBLE)))
             / CAST(n_w AS DOUBLE), 4) AS lower_milli,
       CAST(CAST(v AS DOUBLE) * CAST(n_w AS DOUBLE)
            > CAST(s AS DOUBLE)
              + 2 * sqrt(CAST(n_w * ss - s * s AS DOUBLE) / CAST(n_w AS DOUBLE))
              * CAST(n_w AS DOUBLE) AS BIGINT) AS breakout_hi
FROM w
""",
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (rolling mean +/- 2 sigma over a 20-row frame) per
    event type, with a breakout flag — the mean-reversion monitoring
    staple.  The rolling count/sum/sum-of-squares are EXACT int64 frame
    aggregates of milli-quantized values (v <= 5.6e5, v^2 * 20 <= 6.3e15 —
    int64-safe); the band formula and the breakout comparison are single
    identical IEEE expressions on losslessly-cast integers, and the
    breakout compare is cross-multiplied (v * n > s + 2*sqrt(var/n)*n) so
    no engine-specific division order exists.  round(,4) is cosmetic on
    already-identical doubles.

    Shape at 100 TB: one shuffle on event_type; the ROWS frame is a
    constant-width sliding aggregate — O(1) state per row in the window
    operator, no second pass."""
    e = table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    q = e.select("event_type", "event_id", v.alias("v"))
    fr = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-(_BOLL_W - 1), 0)
    )
    w = q.select(
        "event_type",
        "event_id",
        "v",
        F.count(F.lit(1)).over(fr).cast("long").alias("n_w"),
        F.sum("v").over(fr).cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).over(fr).cast("long").alias("ss"),
    )
    n_d = F.col("n_w").cast("double")
    s_d = F.col("s").cast("double")
    sd2 = 2 * F.sqrt((F.col("n_w") * F.col("ss") - F.col("s") * F.col("s")).cast("double") / n_d)
    return w.select(
        "event_type",
        "event_id",
        F.col("v").alias("v_milli"),
        "n_w",
        F.round((s_d + sd2) / n_d, 4).alias("upper_milli"),
        F.round((s_d - sd2) / n_d, 4).alias("lower_milli"),
        (F.col("v").cast("double") * n_d > s_d + sd2 * n_d)
        .cast("long")
        .alias("breakout_hi"),
    )


# CUSUM constants: K (allowance/reference) just above the corpus value mean
# (~50.0 -> 50000 milli) so the statistic hugs zero under in-control data;
# H is the decision interval.  Integer milli-units end to end.
_CUSUM_K = 60_000
_CUSUM_H = 400_000


@register(
    "ev_cusum",
    tags=("stats", "events", "stateful", "udf"),
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, s, alarm) AS (
  SELECT user_id, rn,
         CASE WHEN greatest(0, x - {_CUSUM_K}) >= {_CUSUM_H} THEN 0
              ELSE greatest(0, x - {_CUSUM_K}) END,
         CAST(greatest(0, x - {_CUSUM_K}) >= {_CUSUM_H} AS BIGINT)
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         CASE WHEN greatest(0, w.s + e.x - {_CUSUM_K}) >= {_CUSUM_H} THEN 0
              ELSE greatest(0, w.s + e.x - {_CUSUM_K}) END,
         CAST(greatest(0, w.s + e.x - {_CUSUM_K}) >= {_CUSUM_H} AS BIGINT)
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, CAST(s AS BIGINT) AS s_milli,
       CAST(alarm AS BIGINT) AS alarm
FROM walk
""",
)
def ev_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM change-point detection (Page 1954): the
    clamped recurrence s = max(0, s_prev + x - K), alarm + reset when s
    crosses H — the sequential-analysis sibling of ev_rate_limit's token
    bucket, and like it NOT expressible as any window frame or prefix
    product (the max(0, .) clamp forces the walk).  Integer milli-units
    end to end, so the applyInPandas walk and the DuckDB recursive-CTE
    fixed point agree bit-for-bit.

    Shape at 100 TB: ONE shuffle to co-locate each user, O(1) state per
    key in the Arrow walk; keys parallelize to millions.  The streaming
    twin is the applyInPandasWithState shape of streaming/stateful.py."""
    import numpy as np
    import pandas as pd

    events = table(spark, sf_dir, "events")

    def walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        x = np.floor(pdf["value"].to_numpy() * 1000).astype("int64")
        n = len(x)
        s_out = np.empty(n, dtype="int64")
        a_out = np.empty(n, dtype="int64")
        s = 0
        for i in range(n):
            s = max(0, s + int(x[i]) - _CUSUM_K)
            if s >= _CUSUM_H:
                a_out[i] = 1
                s = 0
            else:
                a_out[i] = 0
            s_out[i] = s
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "rn": np.arange(1, n + 1, dtype="int64"),
                "s_milli": s_out,
                "alarm": a_out,
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(walk, schema="user_id long, rn long, s_milli long, alarm long")
    )


@register(
    "ev_top_paths",
    tags=("stats", "events", "window"),
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
  SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path,
         CAST(count(*) AS BIGINT) AS n
  FROM s WHERE p2 IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM t)
SELECT path, n, CAST(n * 10000 // tot.total AS BIGINT) AS share_bp
FROM t CROSS JOIN tot
ORDER BY n DESC, path
LIMIT 20
""",
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 event paths across user journeys (the Sankey /
    user-flow mining behind funnel design): two lag()s build each
    consecutive trigram, counts aggregate map-side, shares in integer
    basis points.  ev_markov_chain generalized from pairs to paths.

    Shape at 100 TB: ONE shuffle on user_id for the lag window, a
    map-side-combined groupBy collapsing to |types|^3 <= tiny, and the
    top-20 plans as TakeOrderedAndProject — per-partition heads, no full
    sort."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    t = s.groupBy(
        F.concat_ws(" > ", "p2", "p1", "event_type").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.agg(F.sum("n").cast("long").alias("total"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select("path", "n", F.expr("n * 10000 div total").cast("long").alias("share_bp"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


@register(
    "ev_user_lifecycle",
    tags=("stats", "events", "window", "warehouse"),
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
l AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
  FROM d
),
c AS (
  SELECT strftime(day, '%Y-%m-%d') AS day,
         CASE WHEN prev_day IS NULL THEN 'new'
              WHEN date_diff('day', prev_day, day) = 1 THEN 'active'
              ELSE 'resurrected' END AS lifecycle
  FROM l
)
SELECT day, lifecycle, CAST(count(*) AS BIGINT) AS n_users
FROM c
GROUP BY day, lifecycle
ORDER BY day, lifecycle
""",
)
def ev_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the new/active/resurrected daily ledger): each
    user-day is classified by the gap to that user's PREVIOUS active day —
    first-ever day = new, consecutive = active, gap > 1 day =
    resurrected — then counted per day.  ev_retention's cohort matrix
    tells you who comes back; this tells you what today's actives are
    made of.  All integer date arithmetic (datediff of DATE-truncated
    days), no float anywhere.

    Shape at 100 TB: distinct user-days is one map-side-combined
    aggregate, the lag window shuffles once on user_id (tiny rows — two
    columns), and the final ledger is |days| x 3."""
    e = table(spark, sf_dir, "events")
    d = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    l = d.select("user_id", "day", F.lag("day").over(w).alias("prev_day"))
    c = l.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.datediff(F.col("day"), F.col("prev_day")) == 1, "active")
        .otherwise("resurrected")
        .alias("lifecycle"),
    )
    return (
        c.groupBy("day", "lifecycle")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("day", "lifecycle")
    )


@register(
    "ev_dau_wau_mau",
    tags=("stats", "events", "warehouse"),
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
x AS (
  SELECT d.user_id, CAST(d.day + o.off * INTERVAL 1 DAY AS DATE) AS target,
         o.off
  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS off) o
)
SELECT strftime(target, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN off < 7 THEN user_id END) AS BIGINT) AS wau,
       CAST(count(DISTINCT user_id) AS BIGINT)                            AS mau
FROM x
GROUP BY target
HAVING count(DISTINCT CASE WHEN off = 0 THEN user_id END) >= 1
ORDER BY day
""",
)
def ev_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU/WAU/MAU trio — rolling 1/7/30-day distinct active users per
    day, THE product growth metric: each distinct user-day contributes to
    the 30 target days it stays inside the window of, and one conditional
    multi-distinct aggregate (the agg_multi_distinct Expand path) counts
    all three horizons in a single pass.  Reported for days with activity
    (dau >= 1), matching the oracle's HAVING.

    Shape at 100 TB: the corpus-sized work is ONE distinct over
    (user, day) — everything after runs on |users| x |days| x 30 tiny
    rows.  This explode-to-window formulation is the exact-COUNT-DISTINCT
    answer; the sketch answer (mergeable HLL per day, union over the
    window) is agg_sketch_rollup's shape."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    x = d.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("off"),
        "day",
    ).select(
        "user_id", "off", F.date_add(F.col("day"), F.col("off")).alias("target")
    )
    return (
        x.groupBy("target")
        .agg(
            F.count_distinct(
                F.when(F.col("off") == 0, F.col("user_id"))
            ).cast("long").alias("dau"),
            F.count_distinct(
                F.when(F.col("off") < 7, F.col("user_id"))
            ).cast("long").alias("wau"),
            F.count_distinct("user_id").cast("long").alias("mau"),
        )
        .where(F.col("dau") >= 1)
        .select(
            F.date_format("target", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
        )
        .orderBy("day")
    )


@register(
    "stats_mann_whitney",
    tags=("stats", "drift", "events"),
    oracle=f"""
WITH {_SQL_PERIOD_CTES},
ranked AS (
  SELECT event_type, period,
         -- tie-averaged rank in DOUBLED units: 2*r_min + (ties-1) is an
         -- exact integer even when the average rank is a .5
         2 * rank() OVER (PARTITION BY event_type ORDER BY value)
           + count(*) OVER (PARTITION BY event_type, value) - 1 AS r2
  FROM pe
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE period = 0) AS BIGINT) AS n1,
       CAST(count(*) FILTER (WHERE period = 1) AS BIGINT) AS n2,
       CAST(sum(CASE WHEN period = 0 THEN r2 ELSE 0 END)
            - count(*) FILTER (WHERE period = 0)
              * (count(*) FILTER (WHERE period = 0) + 1) AS BIGINT) AS u1_2x
FROM ranked
GROUP BY event_type
""",
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the first and second
    half of the stream, per event type — the NONPARAMETRIC drift test the
    parametric suite (PSI/KS/chi2) lacks: sensitive to location shifts
    with no distributional assumption, and, being rank-based, EXACTLY
    integer end-to-end.  Tie handling is the textbook average rank,
    carried in doubled units (2*r_min + ties - 1) so .5 averages stay
    integers; U1 = R1 - n1(n1+1)/2 is reported as u1_2x = 2*R1 - n1(n1+1).

    Shape at 100 TB: one window rank over (event_type, value) — a single
    exchange+sort — then one grouped aggregate; no float anywhere."""
    e = table(spark, sf_dir, "events")
    tr = e.agg(F.min(_us("ts")).alias("min_us"), F.max(_us("ts")).alias("max_us"))
    pe = e.crossJoin(F.broadcast(tr)).select(
        "event_type",
        "value",
        F.when(_us("ts") < F.expr("min_us + (max_us - min_us) div 2"), 0)
        .otherwise(1)
        .alias("period"),
    )
    wr = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type", "value")
    ranked = pe.select(
        "event_type",
        "period",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
    )
    n1 = F.count(F.when(F.col("period") == 0, 1))
    return ranked.groupBy("event_type").agg(
        n1.cast("bigint").alias("n1"),
        F.count(F.when(F.col("period") == 1, 1)).cast("bigint").alias("n2"),
        (
            F.sum(F.when(F.col("period") == 0, F.col("r2")).otherwise(0))
            - n1 * (n1 + 1)
        ).cast("bigint").alias("u1_2x"),
    )


@register(
    "stats_welch_t",
    tags=("stats", "drift", "events"),
    oracle=f"""
WITH {_SQL_PERIOD_CTES},
q AS (
  SELECT event_type, period,
         CAST(round(value * 1000, 0) AS BIGINT) AS v_m
  FROM pe
),
m AS (
  SELECT event_type,
         CAST(count(*) FILTER (WHERE period = 0) AS BIGINT) AS n1,
         CAST(count(*) FILTER (WHERE period = 1) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN period = 0 THEN v_m ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN period = 1 THEN v_m ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN period = 0 THEN v_m * v_m ELSE 0 END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN period = 1 THEN v_m * v_m ELSE 0 END) AS BIGINT) AS q2
  FROM q GROUP BY event_type
)
SELECT event_type, n1, n2,
       round(
         (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / sqrt(
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1
             + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2
           ), 6) AS t_stat
FROM m
""",
)
def stats_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic between the first and second
    half of the stream, per event type — the parametric partner of
    stats_mann_whitney.  Exactness: values milli-quantized to int64, ALL
    cross-row accumulation is integer moment sums (count/sum/sum-of-
    squares); the statistic itself is ONE identical IEEE expression on
    those sums (int64->double conversion is deterministic round-to-
    nearest in both engines), with round(,6) absorbing nothing but the
    final rendering — the ts_autocorr recipe.  Shape: one map-side-
    combined grouped aggregate over the events scan."""
    e = table(spark, sf_dir, "events")
    tr = e.agg(F.min(_us("ts")).alias("min_us"), F.max(_us("ts")).alias("max_us"))
    q = e.crossJoin(F.broadcast(tr)).select(
        "event_type",
        F.when(_us("ts") < F.expr("min_us + (max_us - min_us) div 2"), 0)
        .otherwise(1)
        .alias("period"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("v_m"),
    )
    agg = q.groupBy("event_type").agg(
        F.count(F.when(F.col("period") == 0, 1)).cast("bigint").alias("n1"),
        F.count(F.when(F.col("period") == 1, 1)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("period") == 0, F.col("v_m")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("period") == 1, F.col("v_m")).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(F.col("period") == 0, F.col("v_m") * F.col("v_m")).otherwise(0)).cast("bigint").alias("q1"),
        F.sum(F.when(F.col("period") == 1, F.col("v_m") * F.col("v_m")).otherwise(0)).cast("bigint").alias("q2"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    n1, n2 = F.col("n1"), F.col("n2")
    t = (s1d / n1 - s2d / n2) / F.sqrt(
        (q1d - s1d * F.col("s1") / n1) / (n1 - 1) / n1
        + (q2d - s2d * F.col("s2") / n2) / (n2 - 1) / n2
    )
    return agg.select("event_type", "n1", "n2", F.round(t, 6).alias("t_stat"))
