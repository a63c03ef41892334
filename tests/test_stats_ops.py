"""Semantic invariants for the drift/statistics tier (PSI, KS, chi-square,
Markov chain, association rules, MAD, KL).  The driver differential is the
primary gate; these assert the mathematical properties a hash match alone
would not explain: non-negativity of the divergences, conservation of
counts, the discrete-median selection property, and probability bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark import queries as Q

ALL = None


def q(name):
    global ALL
    if ALL is None:
        ALL = Q.all_queries()
    return ALL[name].fn


def _events_count(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_psi_bins_conserve_and_are_nonnegative(spark, sf_dir):
    """All 10 bins present, per-period counts sum to the event total, and
    every contribution (p_a - p_b) * ln(p_a / p_b) >= 0 (both factors
    always share a sign)."""
    rows = q("drift_psi")(spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(10))
    n = _events_count(spark, sf_dir)
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == n
    assert all(r["psi_bin"] >= 0.0 for r in rows)


def test_ks_statistic_bounds(spark, sf_dir):
    """0 <= D <= 1 as the integer fraction ks_num/ks_den; milli-units are
    the truncated division; sample sizes partition the events."""
    r = q("drift_ks")(spark, sf_dir).collect()[0]
    assert 0 <= r["ks_num"] <= r["ks_den"] == r["n_a"] * r["n_b"]
    assert r["ks_milli"] == r["ks_num"] * 1000 // r["ks_den"]
    assert r["n_a"] + r["n_b"] == _events_count(spark, sf_dir)


def test_chi2_cells_conserve_marginals(spark, sf_dir):
    """Observed counts sum to N; each cell contribution is >= 0; expected
    micro-counts recompute from the marginals the cell itself implies."""
    rows = q("drift_chi2")(spark, sf_dir).collect()
    n = _events_count(spark, sf_dir)
    assert sum(r["obs"] for r in rows) == n
    assert all(r["chi2_cell"] >= 0.0 for r in rows)
    rt = {}
    ct = {}
    for r in rows:
        rt[r["event_type"]] = rt.get(r["event_type"], 0) + r["obs"]
        ct[r["period"]] = ct.get(r["period"], 0) + r["obs"]
    for r in rows:
        assert r["exp_micro"] == rt[r["event_type"]] * ct[r["period"]] * 10**6 // n


def test_markov_rows_are_probabilities(spark, sf_dir):
    """Transition counts conserve (one transition per non-first event of
    each user) and each row of the matrix is a probability distribution in
    truncated milli-units."""
    rows = q("ev_markov_chain")(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    from collections import defaultdict

    per_from = defaultdict(int)
    for r in rows:
        per_from[r["from_type"]] += r["n"]
        assert 0 <= r["p_milli"] <= 1000
    for r in rows:
        assert r["p_milli"] == r["n"] * 1000 // per_from[r["from_type"]]


def test_assoc_rules_extend_freq_pairs(spark, sf_dir):
    """Rule generation reports exactly the supported pairs the first-pass
    miner reports, with confidences in [0, 1000] milli and the weaker
    direction never exceeding the stronger (df_a <= df_b by discovery
    order is not guaranteed, but max(conf) >= lift-consistency holds:
    conf_a2b = lift * df_b / n_docs within truncation)."""
    rules = {(r["term_a"], r["term_b"]): r for r in q("assoc_rules")(spark, sf_dir).collect()}
    pairs = {(r["term_a"], r["term_b"]) for r in q("freq_token_pairs")(spark, sf_dir).collect()}
    assert set(rules) == pairs
    for r in rules.values():
        assert 0 < r["conf_a2b_milli"] <= 1000
        assert 0 < r["conf_b2a_milli"] <= 1000
        assert r["lift_micro"] > 0
        assert r["support"] > 0


def test_mad_medians_are_selections(spark, sf_dir):
    """The discrete median is an ELEMENT of the column (never interpolated)
    and the MAD an element of the deviation multiset; outliers are a strict
    minority under the 3*MAD rule."""
    rows = q("anomaly_mad")(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_type = {
        t: [r["value"] for r in ev.where(F.col("event_type") == t).collect()]
        for t in [r["event_type"] for r in rows]
    }
    for r in rows:
        vals = by_type[r["event_type"]]
        assert r["n"] == len(vals)
        assert r["med"] in vals
        assert r["mad"] in {abs(v - r["med"]) for v in vals}
        assert sorted(vals)[(len(vals) + 1) // 2 - 1] == r["med"]
        assert 0 <= r["n_outliers"] < r["n"] / 2


def test_kl_nonnegative_per_source(spark, sf_dir):
    """Gibbs' inequality: KL(source || corpus) >= 0 (up to the 4dp
    rounding) for every source, and term/token counts nest."""
    rows = q("kl_source_divergence")(spark, sf_dir).collect()
    assert rows, "expected at least one source"
    for r in rows:
        assert r["kl"] >= -0.0001
        assert 1 <= r["n_terms"] <= r["n_tokens"]


# ---- Misra-Gries two-pass heavy hitters (operators/sketches.py) ----------


def _zipf_items(spark, n_parts):
    """Adversarial fixture: one dominant item, a mid tier, and a long tail
    sized to force decrement churn at small k."""
    rows = (
        [("hot",)] * 300
        + [(f"mid{i}",) for i in range(6) for _ in range(40)]
        + [(f"tail{i}",) for i in range(400)]
    )
    return spark.createDataFrame(rows, ["term"]).repartition(n_parts)


def test_mg_candidates_superset_and_bounded(spark):
    """With k=8 (<< 406 distinct items, so decrements fire constantly):
    every item with global freq > N/k must appear in the candidate union,
    and each partition contributes at most k survivors."""
    from experiments_datafusion_spark.operators import sketches as SK

    for n_parts in (1, 7):
        items = _zipf_items(spark, n_parts)
        n = items.count()
        k = 8
        cand = {r["term"] for r in SK.mg_candidates(items, "term", k).collect()}
        assert len(cand) <= k * n_parts
        exact = {
            r["term"]
            for r in items.groupBy("term").count().where(F.col("count") > n / k).collect()
        }
        assert exact <= cand, f"missed heavy hitters: {exact - cand}"


def test_mg_two_pass_equals_exact_groupby(spark):
    """heavy_hitters_exact with min_count > N/k returns EXACTLY the full
    groupBy answer, independent of partitioning — the property that makes
    the sketch hash-oracle-able."""
    from experiments_datafusion_spark.operators import sketches as SK

    for n_parts in (1, 3, 7):
        items = _zipf_items(spark, n_parts)
        n = items.count()
        k, min_count = 8, n // 8 + 1
        got = {
            (r["term"], r["n"])
            for r in SK.heavy_hitters_exact(items, "term", k, min_count).collect()
        }
        want = {
            (r["term"], r["n"])
            for r in items.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .where(F.col("n") >= min_count)
            .collect()
        }
        assert got == want
