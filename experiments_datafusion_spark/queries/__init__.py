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
    "round6",  # round 6: grid-routed geo kNN, fast-hash twins, RLE8 AVI, time travel v2
    "round7",  # round 7: BPE train/apply, vacuum, RTBF delete, phash/audio dedup
    "round9",  # round 9: merge-on-read deletion vectors
    "round10",  # round 10: snapshot-log layer + change data feed
    "round11",  # round 11: conflict-checked concurrent rewrites
    "round12",  # round 12: batch snaplog source, paced streaming, zorder compact
    "round13",  # round 13: CDF over rewrites, schema-tracked evolved streaming
)

# The driver's CORRECTNESS pass covers a prefix window of the registry
# (50 queries per round).  Lifetime ledger: r1 tpch/relational (49/50);
# r2 aggregates/windows/scalars/sqlfrontend/llm_*/sampling/udf-pandas
# (50/50); r3 events/pipeline/hygiene/ml/sortbench/multimodal/llm_extras/
# analytics (50/50); r4 the 29-key backlog + dimensional/time-series/
# curation/sketches (48 full + 2 rows-only by design); r5 the 47-key
# post-r4 backlog + 3 round-5 riders (49 full + 1 rows-only by design);
# r6 the 19 judge-only round-5 keys + geo_knn_grid — with which ALL
# pre-round-7 keys have a lifetime driver verdict.
#
# FRESHNESS POLICY (from round 7 on, VERDICT r6 ask #8): with lifetime
# coverage complete, each round's window = this round's NEW/CHANGED keys
# first, then the LEAST-RECENTLY-verified keys (oldest driver round first,
# ties alphabetical, computed from the CORRECTNESS_r*.json ledger) — so
# driver coverage stays warm instead of frozen at old snapshots.
# Keys listed here surface FIRST (in this order) in queries()/
# oracle_sql(); everything else follows in registration order.
_PRIORITY = (
    # round-13 NEW keys (table_cdf_rewrite = reader-API CDF over a
    # rewrite-bearing range via the bounded diff fallback;
    # table_stream_tracking = schemaTracking id-mapped evolved streaming;
    # table_sql_access = pure-SQL registration incl. the history view;
    # table_compact_incremental = liquid-clustering-style O(new data)
    # OPTIMIZE; mm_mjpeg_features = MJPEG-in-AVI intra-frame DCT decode),
    # then the keys whose paths CHANGED this round (verbatim file-dict
    # carry in append/rewrite commits; CDF planner rework + endingVersion
    # schema; sink appId derivation; compact cluster tagging; staged-
    # skipping timestampAsOf), then the LRV fill (tools/lrv_window.py:
    # oldest driver round first, ties alphabetical — the r4/r5 tail).
    "table_cdf_rewrite",  # new
    "table_sql_changes",  # new (late round-13: pure-SQL change feed)
    "table_stream_tracking",  # new
    "table_sql_access",  # new
    "table_compact_incremental",  # new
    "mm_mjpeg_features",  # new
    "table_batch_cdf",  # new
    "table_log_batch_evolved",  # new
    "table_log_batch_source",  # new
    "table_log_stream_sink",  # new
    "table_stream_ingest",  # new
    "table_changes_incremental",  # new
    "table_compact_zorder",  # new
    "table_compact_cluster",  # new
    "compact_small_files",  # new
    "table_wap_publish",  # new
    "mm_png_features",  # r4
    "pack_sequences",  # r4
    "pivot_dynamic",  # r4
    "resample_ohlc",  # r4
    "scalar_binary_b64",  # r4
    "scalar_bitwise",  # r4
    "scalar_dates2",  # r4
    "scalar_url",  # r4
    "scalar_variant",  # r4
    "scd2_snapshot",  # r4
    "sim_topk_ivfpq",  # r4
    "sim_topk_pq",  # r4
    "skyline_pareto",  # r4
    "sort_desc_nulls",  # r4
    "source_python_ds",  # r4
    "text_bm25",  # r4
    "text_dup_spans",  # r4
    "text_unigram_logprob",  # r4
    "udf_map_in_arrow",  # r4
    "udf_python_rowwise",  # r4
    "udf_python_udtf",  # r4
    "win_running_distinct",  # r4
    "abc_pareto_class",  # r5
    "anomaly_mad",  # r5
    "assoc_rules",  # r5
    "cohort_ltv",  # r5
    "dedup_jaccard_capped",  # r5
    "docs_tfidf_cosine",  # r5
    "dq_expectations",  # r5
    "drift_chi2",  # r5
    "drift_ks",  # r5
    "drift_psi",  # r5
    "ev_cusum",  # r5
    "ev_dau_wau_mau",  # r5
    # (ev_ewma was next in LRV order; trimmed as table_sql_changes took
    # the last slot — it rotates in next round per the freshness policy)
)


# Keys deliberately registered WITHOUT a DuckDB oracle (the driver runs the
# weaker rows-only check on them).  Every oracle=None registration MUST be
# listed here — tests/test_smoke.py asserts registry-unoracled == this set,
# so accidentally dropping an oracle fails loudly while driver-window
# rotation can never go stale (hardcoded per-round window pins broke twice:
# r2 and r6).  Each entry carries a property/bound test in lieu of the
# oracle; see its docstring for which.
ROWS_ONLY_BY_DESIGN = frozenset(
    {
        "agg_approx",  # sketch outputs: bound tests in tests/test_sketches.py
        "agg_sketch_rollup",  # ditto (mergeable-sketch rollup)
        "table_sample",  # seeded Bernoulli: determinism+bounds in test_smoke
        # docs_winnowing_fast GRADUATED in round 7: its xxhash64 values are
        # now replayed bit-exactly in DuckDB (oracle_xxhash.py), so the one
        # key whose output exposes production-hash values is fully oracled.
    }
)


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
