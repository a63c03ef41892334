"""Semantic invariants for the search/retrieval suite (RRF fusion, token
co-occurrence) and the integer EWMA recurrence.  The driver differential is
the primary gate; these assert the properties a hash match alone would not
explain: RRF contribution bounds and fusion dominance, co-occurrence
support/lift algebra, and the EWMA convex-combination envelope."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark import queries as Q

ALL = None


def q(name):
    global ALL
    if ALL is None:
        ALL = Q.all_queries()
    return ALL[name].fn


def test_rrf_contribution_bounds_and_dominance(spark, sf_dir):
    df = q("search_rrf_fusion")(spark, sf_dir).cache()
    rows = df.collect()
    assert 0 < len(rows) <= 100  # two top-50 lists, full-outer fused
    single_max = 1_000_000 // 61  # rank 1 in exactly one list
    both_min = 2 * (1_000_000 // (60 + 50))  # rank 50 in both lists
    assert both_min > single_max  # any doc in BOTH lists beats any single
    for r in rows:
        assert r.n_lists in (1, 2)
        if r.n_lists == 1:
            assert 1_000_000 // 110 <= r.rrf_u <= single_max
        else:
            assert both_min <= r.rrf_u <= 2 * single_max
    # every doc in both lists must outscore every single-list doc
    worst_both = min((r.rrf_u for r in rows if r.n_lists == 2), default=None)
    best_single = max((r.rrf_u for r in rows if r.n_lists == 1), default=0)
    if worst_both is not None:
        assert worst_both > best_single
    df.unpersist()


def test_freq_token_pairs_support_and_lift_algebra(spark, sf_dir):
    df = q("freq_token_pairs")(spark, sf_dir).cache()
    n_docs = (
        Q.all_queries()["freq_token_pairs"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .count()
    )
    assert df.count() > 0
    assert df.where(F.col("term_a") >= F.col("term_b")).count() == 0  # canonical order
    assert df.where(F.col("support") > n_docs).count() == 0
    assert df.where(F.col("support") * 100 < n_docs * 60).count() == 0  # threshold kept
    # support(a,b) <= min(df_a, df_b) implies lift <= n_docs/max(df) * 1e6;
    # all reported pairs co-occur, so lift strictly positive
    assert df.where(F.col("lift_micro") <= 0).count() == 0
    df.unpersist()


def test_ewma_envelope_and_row_conservation(spark, sf_dir):
    ewma = q("ev_ewma")(spark, sf_dir).cache()
    ev = ewma.sparkSession.read.parquet(f"{sf_dir}/events.parquet")
    assert ewma.count() == ev.count()  # one output row per event
    # rn is 1..n(user) dense: max(rn) == count per user
    bad_rn = (
        ewma.groupBy("user_id")
        .agg(F.max("rn").alias("mx"), F.count(F.lit(1)).alias("n"))
        .where(F.col("mx") != F.col("n"))
        .count()
    )
    assert bad_rn == 0
    # convex combination with floor: per-user envelope min(v_u) <= s <= max(v_u)
    env = ev.groupBy("user_id").agg(
        F.min(F.floor(F.col("value") * 1_000_000)).alias("lo"),
        F.max(F.floor(F.col("value") * 1_000_000)).alias("hi"),
    )
    out = (
        ewma.join(env, "user_id")
        .where((F.col("ewma_u") < F.col("lo")) | (F.col("ewma_u") > F.col("hi")))
        .count()
    )
    assert out == 0
    ewma.unpersist()


def test_ewma_state_survives_arrow_batch_boundaries(spark, sf_dir):
    """The round-13 mapInPandas walk carries (user, acc, rn) ACROSS Arrow
    batches; with a tiny maxRecordsPerBatch every partition splits into
    many batches and any per-batch state reset would corrupt rn/ewma for
    keys spanning a boundary.  Compare against the default-batch run."""
    key = "ev_ewma"
    base = q(key)(spark, sf_dir).toPandas().sort_values(["user_id", "rn"])
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        tiny = q(key)(spark, sf_dir).toPandas().sort_values(["user_id", "rn"])
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base.reset_index(drop=True).equals(tiny.reset_index(drop=True))
