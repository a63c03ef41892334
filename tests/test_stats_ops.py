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
