"""Operator/query registry — the single source of truth.

Every operator claimed in SURVEY.md §2 gets a named entry here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where ANSI SQL can
express it) an equivalent DuckDB oracle query. ``__spark_entry__.py``,
``tests/``, and ``bench.py`` all read this registry, so an operator is
"done" exactly when it appears here and its differential test is green.

Conventions (driver contract — see /root/repo/__spark_entry__.py docstring):
  * every computed column is aliased IDENTICALLY in Spark and SQL;
  * float aggregates are rounded in BOTH engines (double accumulation order
    differs across engines; rounding makes the value-hash stable).  When a
    rounded SUM can land on a decimal half-boundary (money totals), use the
    exact integer-unit recipe in experiments_datafusion_spark/exact.py
    instead — plain round(sum(double), d) diverged at sf0.1 twice;
  * timestamps in output are rendered to 'yyyy-MM-dd HH:mm:ss' strings in
    BOTH engines (session tz = UTC);
  * arrays/structs in output are flattened or joined to strings.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# Modules are imported in this order; final registry order is decided by
# _PRIORITY below (driver verification priority), so module order itself no
# longer matters for the driver window.
_MODULES = (
    "aggregates",
    "windows",
    "scalars",
    "sqlfrontend",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "sampling",
    "udfs",
    "events",
    "sortbench",
    "multimodal",
    "llm_extras",
    "extras",
    "advanced_joins",
    "tpch",
    "relational",
    "pipeline",
    "hygiene",
    "analytics",
    "ml",
    "packing",  # round 3: sequence packing + merge upsert (behind the window)
    "graphalg",  # round 3: pagerank + triangles (behind the window)
    "dimensional",  # round 4: SCD2/CDC/decimal/mode/skyline
    "timeseries",  # round 4: interval merge, OHLC resample, nearest as-of
    "modern",  # round 4: VARIANT, dynamic pivot, weighted median, dates
    "search",  # round 4/5: RRF rank fusion, token-pair co-occurrence mining
    "stats",  # round 4/5: PSI/KS/chi2 drift, Markov chain, rules, MAD, KL
)

# The driver's CORRECTNESS pass covers a prefix window of the registry
# (50 queries per round).  Rounds 1-2 verified tpch/relational (r1,
# CORRECTNESS_r01.json 49/50) and aggregates/windows/scalars/sqlfrontend/
# llm_*/sampling/udf-pandas (r2, CORRECTNESS_r02.json 50/50).  Round 3
# verified events, the curation pipeline, hygiene, ml, the sortbench
# workloads, multimodal, llm_extras and the top analytics keys (r3,
# CORRECTNESS_r03.json 50/50).  Round 4 rotates in the final 29 keys
# that have never had a driver verdict (per the r3 VERDICT plan), the
# newly-registered compact_small_files, and the new round-4 operators,
# reaching full lifetime driver coverage.  Keys listed here surface FIRST
# (in this order) in queries()/oracle_sql(); everything else follows in
# registration order.
_PRIORITY = (
    # never-driver-verified backlog — the r3 VERDICT's ask #1 (29)
    "scalar_map", "dedup_semantic_canonical", "sim_topk_pq",
    "sim_topk_ivfpq", "udf_python_rowwise", "udf_python_udtf",
    "ev_interpolate", "sort_desc_nulls", "source_python_ds",
    "mm_frame_sample", "mm_png_features", "text_dup_spans",
    "agg_corr_regr", "join_bucketed", "agg_approx", "agg_sketch_rollup",
    "join_salted", "join_range_bands", "scalar_bitwise", "docs_ngram_freq",
    "scalar_url", "udf_map_in_arrow", "text_unigram_logprob",
    "scalar_binary_b64", "pack_sequences", "merge_upsert", "layout_zorder",
    "graph_pagerank", "graph_triangles",
    # newly registered this round — VERDICT ask #3 (1)
    "compact_small_files",
    # new round-4 operators (dimensional / time-series / curation)
    "scd2_snapshot", "cdc_changelog", "agg_decimal_exact",
    "agg_mode_listagg", "win_running_distinct", "skyline_pareto",
    "interval_coverage", "resample_ohlc", "join_asof_nearest",
    "docs_winnowing", "mix_epochs_fractional", "docs_ngram_novelty",
    "ev_cep_pattern", "text_bm25", "docs_paragraph_dedup",
    "embedding_pca_power",
    "scalar_variant", "scalar_dates2", "pivot_dynamic",
    "agg_weighted_median",
)

# Round-5 window plan: after CORRECTNESS_r04 lands, every key except those
# registered after the round-4 window filled will have a lifetime driver
# verdict.  The post-window backlog (all green at all three scales via
# tools/drive_entry.py): mm_bmp_features, grouping_id_flags,
# group_collated, sql_parameterized, the search/recurrence trio
# search_rrf_fusion / freq_token_pairs / ev_ewma, sim_topk_pq_trained,
# join_bloom_prefilter, win_rolling_median, text_containment,
# sql_recursive_spine, sql_scripting_block, dq_expectations,
# join_interval_overlap, the continuation batch profile_columns /
# win_gap_islands / join_spatial_grid / ev_rate_limit /
# agg_activity_bitmap / udf_cogroup / docs_tfidf_cosine,
# rfm_segmentation, graph_bfs, the statistical-monitoring tier
# drift_psi / drift_ks / drift_chi2 / ev_markov_chain / assoc_rules /
# anomaly_mad / kl_source_divergence, and the late batch
# dedup_jaccard_capped / ts_autocorr / period_over_period /
# heavy_hitters_sketch / agg_multi_distinct /
# winsorize_stats / mm_thumbnail / histogram_equidepth / ev_cusum /
# ts_bollinger / abc_pareto_class / cohort_ltv / ev_top_paths /
# ev_user_lifecycle / join_null_safe / ev_dau_wau_mau — 47 keys.
# Lead the round-5 window with those, then rotate in whatever round 5
# adds.


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    for mod in _MODULES:
        importlib.import_module(f"experiments_datafusion_spark.queries.{mod}")


def all_queries() -> dict[str, Query]:
    _load_all()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
