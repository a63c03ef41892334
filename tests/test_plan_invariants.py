"""Registry-WIDE physical-plan invariants: not one hand-picked query, but
every registered operator is machine-checked for the two classic
scale-killers — quadratic join shapes and row-wise Python in the hot path.
Exceptions are an explicit allowlist of documented baselines."""

from __future__ import annotations

import pytest

from experiments_datafusion_spark.plans.audit import audit
from experiments_datafusion_spark.queries import all_queries

# Quadratic-by-design baselines (each has a scale-path twin + recall tests).
# Round-3 minimality audit dropped two stale entries the new test below
# caught: dedup_fuzzy_levenshtein (its (lang, band) bucket keys give it an
# equi-join component -> SortMergeJoin, bounded-quadratic only WITHIN a
# bucket, which the plan scan can't see and doesn't flag) and join_asof
# (plans as a broadcast HASH join on the equi key with the range condition
# as a post-filter — never an NLJ).
ALLOW_QUADRATIC = {
    "dedup_embedding_cosine",  # brute-force recall oracle (LSH twin is primary)
    "sim_topk_bruteforce",     # exactness baseline (LSH/IVF twins)
    "geo_haversine_knn",       # exactness baseline (join_spatial_grid twin)
    # geo_knn_grid needs NO entry since round 7: the brute fallback branch
    # is only BUILT when the per-query proof fails to certify some query
    # (driver-side emptiness probe, queries/round6.py) — on every fixture
    # density the proof certifies all queries, so the plan carries only the
    # grid hash join and the minimality test below would flag a stale
    # entry.  If a future density triggers the fallback, re-add it here
    # with that density documented.
    "join_theta",              # non-equi join IS a nested-loop shape
    "join_cross",              # CROSS JOIN is the operator itself
    "join_range_bands",        # points-in-intervals via broadcast bands
}

# BroadcastNestedLoopJoin of a ONE-ROW (or tiny) aggregate — the "attach a
# scalar threshold / grand total to every row" idiom. O(n) with a 1-row
# build side, scale-correct; still named explicitly so any NEW nested-loop
# shape fails review until justified here.
ALLOW_SCALAR_BROADCAST = {
    "ts_seasonality",            # 1-row (total, n_cells) for load basis points
    "assoc_rules",               # 1-row n_docs stats for relative thresholds
    "docs_heavy_hitters",        # corpus-total row for frequency cutoff
    "drift_chi2",                # 1-row time-range scalars for the period split
    "drift_ks",                  # 1-row sample-size totals for the D statistic
    "drift_psi",                 # 1-row time/value-range scalars for binning
    "docs_tfidf_cosine",         # 1-row n_docs stats for the df cap (was
                                 # hidden behind the r13 localCheckpoint's
                                 # lineage truncation; the r14 single-SQL
                                 # form exposes the whole plan)
    "stats_mann_whitney",        # 1-row time-range scalars for the period split
    "stats_welch_t",             # 1-row time-range scalars for the period split
    "kl_source_divergence",      # 1-row corpus token total for p_g
    "docs_length_histogram",     # total-docs row for bucket shares
    "ev_funnel",                 # step-1 cohort size as 1-row denominator
    "freq_token_pairs",          # 1-row n_docs stats for relative thresholds
    "heavy_hitters_sketch",      # 1-row corpus-token total for the threshold
    "histogram_equidepth",       # 1-row row-count total for the bucket index
    "abc_pareto_class",          # 1-row revenue total for the class bounds
    "ev_top_paths",              # 1-row trigram total for the share_bp
    "join_bloom_prefilter",      # 1-row bitmap relation (the bloom filter)
    "graph_triangles",           # three 1-row summary aggregates stitched
    "mix_temperature",           # corpus token total for temperature rates
    "quality_gate_percentile",   # p75 cutoff as 1-row broadcast
    "rfm_segmentation",          # 1-row corpus reference date for recency
    "scalar_decimal",            # grand-total broadcast (round-1 fix)
    "search_rrf_fusion",         # 1-row corpus stats inside both BM25 passes
    "shard_assign",              # corpus total for shard-balance shares
    "text_bm25",                 # 1-row corpus stats (avgdl, N) for Okapi
    "text_tfidf",                # corpus doc count for idf
    "text_unigram_logprob",      # corpus token total for unigram probs
    "tpch_q11_important_parts",  # value-threshold scalar broadcast
    "tpch_q22_opportunity",      # avg-balance scalar broadcast
}

# ROW-WISE Python (BatchEvalPython) in the plan is the operator's purpose
# here — vectorized Arrow paths (ArrowEvalPython / MapInPandas /
# FlatMapGroupsInPandas / MapInArrow) are the sanctioned fast tier and are
# never flagged, so they need no entry.  (Round-3 tightening, VERDICT r2
# item 7: the list previously also carried vectorized/clean queries like
# text_pii_redact; the minimality test below now machine-enforces that
# every entry's plan actually exhibits the exception it claims.)
ALLOW_PYTHON = {
    "udf_python_rowwise",  # the documented anti-pattern exhibit (25-row dim)
    "udf_python_udtf",     # UDTFs only exist as BatchEvalPythonUDTF
}

_QUERIES = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, _ in _QUERIES])
def test_no_scale_killers_in_plan(spark, sf_dir, name):
    q = dict(_QUERIES)[name]
    p = audit(q.fn(spark, sf_dir))
    if name not in ALLOW_QUADRATIC:
        assert "CartesianProduct" not in p.text, f"{name}: cartesian product"
        if name not in ALLOW_SCALAR_BROADCAST:
            assert "BroadcastNestedLoopJoin" not in p.text, f"{name}: NLJ shape"
    if name not in ALLOW_PYTHON:
        assert "BatchEvalPython" not in p.text, f"{name}: row-wise Python"
    # NOTE: no blanket SinglePartition assertion — a 1-row FINAL aggregate
    # over partial aggregates legitimately plans one; the genuinely
    # dangerous full-data no-partition windows have dedicated tests
    # (gather_by_index, win_sessionize) in test_plans.py.


@pytest.mark.parametrize(
    "name", sorted(ALLOW_QUADRATIC | ALLOW_SCALAR_BROADCAST | ALLOW_PYTHON)
)
def test_allowlists_are_minimal(spark, sf_dir, name):
    """An allowlist entry whose plan is actually clean is a stale exception
    that would silently excuse a FUTURE scale-killer in that query — so each
    entry must exhibit the exception it claims, or be removed."""
    q = dict(_QUERIES)[name]
    p = audit(q.fn(spark, sf_dir))
    if name in ALLOW_QUADRATIC:
        assert "CartesianProduct" in p.text or "BroadcastNestedLoopJoin" in p.text, (
            f"{name}: allowlisted as quadratic but plan is clean — drop the entry"
        )
    if name in ALLOW_SCALAR_BROADCAST:
        assert "BroadcastNestedLoopJoin" in p.text, (
            f"{name}: allowlisted as scalar-broadcast NLJ but plan is clean — drop the entry"
        )
    if name in ALLOW_PYTHON:
        assert "BatchEvalPython" in p.text, (
            f"{name}: allowlisted as row-wise Python but plan is clean — drop the entry"
        )
