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
    "round5",  # round 5: pipe SQL, temporal SCD2 join, weighted sample, entropy
)

# The driver's CORRECTNESS pass covers a prefix window of the registry
# (50 queries per round).  Rounds 1-2 verified tpch/relational (r1,
# CORRECTNESS_r01.json 49/50) and aggregates/windows/scalars/sqlfrontend/
# llm_*/sampling/udf-pandas (r2, CORRECTNESS_r02.json 50/50).  Round 3
# verified events, the curation pipeline, hygiene, ml, the sortbench
# workloads, multimodal, llm_extras and the top analytics keys (r3,
# CORRECTNESS_r03.json 50/50).  Round 4 verified the 29-key backlog, the
# round-4 dimensional/time-series/curation operators and the sketch pair
# (r4, CORRECTNESS_r04.json 48 full + 2 rows-only by design).  Round 5
# rotates in the 47 keys that registered after the round-4 window filled
# (every one already green at all three scales via tools/drive_entry.py
# and independently re-verified by the round-4 judge) — after this window
# lands, every registry key has a lifetime DRIVER verdict.  Keys listed
# here surface FIRST (in this order) in queries()/oracle_sql(); everything
# else follows in registration order.
_PRIORITY = (
    # statistical-monitoring tier (7)
    "drift_psi", "drift_ks", "drift_chi2", "ev_markov_chain",
    "assoc_rules", "anomaly_mad", "kl_source_divergence",
    # continuation batch (7)
    "profile_columns", "win_gap_islands", "join_spatial_grid",
    "ev_rate_limit", "agg_activity_bitmap", "udf_cogroup",
    "docs_tfidf_cosine",
    # retrieval / recurrence trio (3)
    "search_rrf_fusion", "freq_token_pairs", "ev_ewma",
    # similarity / join hardening (2)
    "sim_topk_pq_trained", "join_bloom_prefilter",
    # modern SQL surface (5)
    "sql_parameterized", "sql_recursive_spine", "sql_scripting_block",
    "grouping_id_flags", "group_collated",
    # window / text / dq (4)
    "win_rolling_median", "text_containment", "dq_expectations",
    "join_interval_overlap",
    # multimodal (2)
    "mm_bmp_features", "mm_thumbnail",
    # graph / segmentation (2)
    "graph_bfs", "rfm_segmentation",
    # late round-4 batch (15)
    "dedup_jaccard_capped", "ts_autocorr", "period_over_period",
    "heavy_hitters_sketch", "agg_multi_distinct", "winsorize_stats",
    "histogram_equidepth", "ev_cusum", "ts_bollinger",
    "abc_pareto_class", "cohort_ltv", "ev_top_paths",
    "ev_user_lifecycle", "join_null_safe", "ev_dau_wau_mau",
    # round-5 additions: exactly 3 ride at the window tail (window holds
    # 50 and the backlog above is 47); the rest are verified locally and
    # rotate into the round-6 window
    "docs_winnowing_fast", "sql_pipe_syntax", "join_temporal_scd2",
)

# Round-6 window plan: lead with the round-5 keys that registered after
# the 3 window riders above (all green at sf0.01 via tools/drive_entry.py
# on registration): sample_weighted, text_entropy, ts_seasonality,
# dedup_url_canonical, ev_attribution_outer, sql_udf_declarative,
# scalar_try_arith, source_xml_roundtrip, join_asof_tolerance,
# ts_holt_linear, ev_cep_kleene, ml_logreg_hardsig, source_avro_roundtrip,
# mm_jpeg_features, mm_avi_features, table_time_travel, geo_haversine_knn,
# stats_mann_whitney, stats_welch_t — then backfill with anything round 6
# registers.


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
