"""Operator/query registry — the single source of truth.

Every operator claimed in SURVEY.md §2 gets a named entry here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where ANSI SQL can
express it) an equivalent DuckDB oracle query. ``__spark_entry__.py``,
``tests/``, and ``bench.py`` all read this registry, so an operator is
"done" exactly when it appears here and its differential test is green.

Conventions (driver contract — see /root/repo/__spark_entry__.py docstring):
  * every computed column is aliased IDENTICALLY in Spark and SQL;
  * float aggregates are rounded in BOTH engines (double accumulation order
    differs across engines; rounding makes the value-hash stable);
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

# Registration order = driver verification priority.  The driver's
# CORRECTNESS pass covers a prefix window of the registry (50 queries in
# round 1), so modules whose operators still lack a driver verdict register
# FIRST; tpch/relational went through the round-1 window (49/50 green,
# CORRECTNESS_r01.json) and keep that evidence while yielding their slots.
_MODULES = (
    "aggregates",      # 10  — unverified in r01
    "windows",         # 5   — unverified in r01
    "scalars",         # 10  — unverified in r01
    "sqlfrontend",     # 6   — unverified in r01
    "llm_dedup",       # unverified in r01
    "llm_similarity",  # unverified in r01
    "llm_text",        # unverified in r01
    "sampling",        # table_sample_hash (new; VERDICT item 3)
    "udfs",            # unverified in r01
    "events",          # unverified in r01
    "sortbench",       # unverified in r01 (rows-only by design)
    "multimodal",      # unverified in r01
    "llm_extras",      # new in r2 (dedup_clusters, text_tfidf)
    "extras",          # new in r2 (agg_corr_regr, join_bucketed)
    "advanced_joins",  # join_asof r01-green; join_salted unverified
    "tpch",            # r01-green (22/22)
    "relational",      # r01-green (27/27 incl. flagship shapes)
    "pipeline",        # new in r2 (curation ops) — appended so the r02
                       # 50-query window above is not displaced
    "hygiene",         # new in r2 (contamination, leakage-safe split,
                       # quality gate, weighted mixing) — appended likewise
    "analytics",       # new in r2 (argmax/topk-per-group/keep-best/
                       # grouping-sets rollup/bitwise/bigrams/sessionize/
                       # embedding norms) — appended likewise
    "ml",              # new in r2 (iterative k-means, differential oracle)
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
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
