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
    # round-12 NEW keys (table_log_batch_source = spark.read.format(
    # "snaplog") with versionAsOf + column pruning; table_log_stream_paced
    # = maxFilesPerTrigger admission control with pinned batch boundaries;
    # table_stream_skipchanges = kind-aware change-commit streaming over a
    # MoR log; table_merge_evolve = schema-evolving MERGE INTO;
    # table_compact_zorder = OPTIMIZE ZORDER BY compaction with 2-D
    # pruning asserted; table_log_stream_sink = writeStream.format(
    # "snaplog"), the exactly-once streaming sink through the public
    # DataSource writer API)
    "table_log_batch_source", "table_log_stream_paced",
    "table_stream_skipchanges", "table_merge_evolve", "table_compact_zorder",
    "table_log_stream_sink", "table_batch_cdf", "table_log_batch_evolved",
    # CHANGED keys re-verified fresh: append_once now publishes its txn
    # record atomically inside the commit entry (table_stream_ingest,
    # dedup_stream_minhash); the snaplog source was reworked (one-pass
    # _LogView planning, pacing cursor, kind-aware policies) under
    # table_log_stream_source / table_log_stream_ivm;
    # changes_incremental skips staged WAP versions
    # (table_changes_incremental); merge_into gained evolve_schema
    # (table_merge_into); table_concurrent_rewrite moved off the
    # _publish monkey-patch onto the on_publish_attempt hook;
    # compact() gained zorder_cols next to sort_cols
    # (table_compact_cluster, compact_small_files); sim_mmr_rerank's
    # penalty coefficient now rounds identically in both engines; every
    # commit kind carries the SetTransaction map forward
    # (table_wap_publish, table_schema_evolution, table_restore)
    "table_stream_ingest", "dedup_stream_minhash",
    "table_log_stream_source", "table_log_stream_ivm",
    "table_changes_incremental", "table_merge_into",
    "table_concurrent_rewrite", "table_compact_cluster",
    "compact_small_files", "sim_mmr_rerank", "table_wap_publish",
    "table_schema_evolution", "table_restore",
    # the least-recently-verified fill (tools/lrv_window.py output from
    # the CORRECTNESS ledger: oldest driver round first, ties
    # alphabetical — the r3 tail the r11 rotation trimmed, then the
    # r4 head)
    "topk_per_group", "win_range_time", "win_sessionize",
    "agg_approx", "agg_corr_regr", "agg_decimal_exact",
    "agg_mode_listagg", "agg_sketch_rollup", "agg_weighted_median",
    "cdc_changelog", "dedup_semantic_canonical", "docs_ngram_freq",
    "docs_ngram_novelty", "docs_paragraph_dedup", "docs_winnowing",
    "embedding_pca_power", "ev_cep_pattern", "ev_interpolate",
    "graph_pagerank", "graph_triangles", "interval_coverage",
    "join_asof_nearest", "join_bucketed", "join_range_bands",
    "join_salted", "layout_zorder", "merge_upsert",
    "mix_epochs_fractional", "mm_frame_sample",
    # (mm_png_features/pack_sequences/pivot_dynamic were next in LRV
    # order; trimmed as the sink / batch-CDF / evolved-read keys took the
    # last slots — they rotate in next round per the freshness policy)
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
