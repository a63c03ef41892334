"""Benchmark driver: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "suite_time", "value": <sum of per-query median times>, "unit": "sec",
   "queries": {"tpch_q1": sec, ...}, "headline_windows": {...}, "sf": 0.1}

The headline set runs as WINDOWS (default 3) interleaved exclusive windows —
each window times every Spark query once and every DuckDB oracle once on the
same parquet — and "queries"/"duck_queries"/"ratio_median" are per-query
MEDIANS across windows (protocol rationale in BENCH_NOTES.md: two r5 windows
measured 1.30x and 1.67x on identical plans; the gate is 2x).

Also reproduces the reference's own benchmark (runall.sh:1-8 sweep shape —
multi-column sort of the four workload schemas) at 100k rows, timed the same
way (BASELINE.md protocol: steady-state means after warm-up; execution is
forced with a noop sink so nothing is collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from experiments_datafusion_spark import generators  # noqa: E402
from experiments_datafusion_spark.operators import sort as sort_ops  # noqa: E402
from experiments_datafusion_spark.queries import all_queries  # noqa: E402
from experiments_datafusion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 2 warmups: the first run of a query additionally pays Janino whole-stage
# codegen compilation (tens of seconds for wide generated aggregates);
# steady-state is what we measure, matching BASELINE.md's protocol.
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
WARMUP = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "2"))
# Round-6 protocol hardening: the headline suite runs as N interleaved
# exclusive windows (Spark pass then DuckDB pass, repeated), and every
# reported number is the per-query MEDIAN across windows.  Two same-round
# single windows in r5 measured 1.30x and 1.67x on identical plans — host
# drift exceeded the round-over-round signal, and the gate is 2x, so
# single-window point estimates are no longer adequate.  Interleaving puts
# both engines inside each drift regime; the median drops one bad window.
WINDOWS = int(os.environ.get("SPARK_GRAFT_BENCH_WINDOWS", "3"))
# Charts re-rendered on every bench run kept re-dirtying the committed
# img/*.svg tree (three rounds running).  Render only on explicit opt-in.
RENDER_CHARTS = os.environ.get("BENCH_CHARTS", "0") == "1"

# Representative coverage: scan/filter/agg, joins, sort/topk, windows,
# grouping, event-time, dedup (exact + LSH + jaccard), similarity, text.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "sort_multicol",
    "topk",
    "agg_stats",
    "grouping_cube",
    "win_ranking",
    "ev_tumbling",
    "ev_session",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "sim_topk_bruteforce",
    "sim_topk_pq",  # round 3: compressed-domain ANN scan
    "text_quality",
    "text_dup_spans",  # round 3: substring-level dedup posting list
    "graph_pagerank",  # round 3: iterative graph analytics
    "docs_winnowing",  # round 4: winnowing fingerprint posting list
    "scd2_snapshot",  # round 4: SCD2 dimension build (one window pass)
    "interval_coverage",  # round 4: gaps-and-islands interval merge
    "search_rrf_fusion",  # round 4: two BM25 passes + rank fusion
    "freq_token_pairs",  # round 4: df-capped co-occurrence self-join
    "ev_ewma",  # round 4: per-key integer recurrence (applyInPandas)
    "sim_topk_pq_trained",  # round 4: Lloyd-trained PQ (train + encode + ADC)
    "docs_tfidf_cosine",  # round 4 cont.: sparse-cosine inverted-index join
    # round-5 flagships (r4-comparable subset = the 29 entries above)
    "join_temporal_scd2",  # round 5: point-in-time SCD2 join (fact x versions)
    "docs_winnowing_fast",  # round 5: winnowing on the xxhash64 knob side
    "text_entropy",  # round 5: char-entropy explode + grouped aggregate
    # round-7 hash-knob A/B pairs: each *_fast twin measured beside its md5
    # key under the same interleaved-window protocol (the knob's cost is a
    # first-class bench number, not a one-off note)
    "text_dup_spans_fast",
    "docs_ngram_novelty",
    "docs_ngram_novelty_fast",
    "text_containment",
    "text_containment_fast",
    # round-7 flagships
    "text_bpe_apply",  # BPE train + corpus tokenization (dictionary join)
    "mm_phash_pairs",  # real decode -> dHash -> banded Hamming near-dups
    # round-9 flagship
    "sortbench_merge",  # multi-batch sorted-run merge (reference README.md:3-5)
]
# Deliberately NOT in HEADLINE (same rule that keeps every other table_*
# maintenance key out): table_changes / table_changes_apply spend their
# timed section building the two fixture snapshots (parquet COMMITS) that
# their DuckDB oracle replays as pure arithmetic over raw orders — a
# measured 41x "ratio" on the apply key that compares I/O against no-I/O,
# not operator against operator.  The CDF dataflows' perf story is the
# merge/aggregate plan shape (plan-audited), not a cross-engine ratio.

# Keys whose DuckDB oracle is an EMULATION rather than a native-engine
# query (docs_winnowing_fast replays xxhash64 as 128-bit SQL arithmetic —
# a correctness device, not a fair perf baseline).  Their Spark time is
# still measured and reported; their oracle is simply not timed, so the
# engine-vs-oracle ratio never gains from an artificially slow
# denominator.
BENCH_ORACLE_EXCLUDE = {"docs_winnowing_fast"}

# The round-4 headline composition — a FIXED anchor subtotal recorded in
# every BENCH_r*.json so gate drift is attributable across rounds without
# archaeology (VERDICT r6 ask #6): new flagships change the full-suite
# total, but this subtotal compares like-for-like forever.
R4_COMPARABLE = tuple(HEADLINE[:29])
# An anchor key that is also oracle-excluded would never be timed in DuckDB
# and `_totals` would KeyError the whole bench (VERDICT r7 defect #2); the
# literal anchor composition is additionally pinned in tests/test_smoke.py
# so reordering HEADLINE's first 29 entries can't silently change it.
# ValueError, not assert: the guard must survive `python -O` (advisor r8) —
# stripped asserts would leave only _totals' defensive filter, which shrinks
# the anchor silently instead of failing loudly.
if set(BENCH_ORACLE_EXCLUDE) & set(R4_COMPARABLE):
    raise ValueError("oracle-excluded keys may not enter the fixed r4 anchor")

REF_SORT_ROWS = 100_000  # reference sweep endpoint (runall.sh:2 END=100000)

# Reference sweep reproduction (runall.sh:1-8 runs START=250..END=100000;
# main.rs:36-71 emits a DataPoint per batch size; lib.rs:94-160 charts them).
# A geometric subset keeps the per-round bench fast; the sweep extends past
# the reference's 100k endpoint because Spark's ~0.15s job-scheduling floor
# flattens everything below ~1M rows — the linear scaling shape the
# reference charts show only becomes visible in the 1M-10M regime here
# (which is also the regime a 100 TB deployment actually runs per task).
SWEEP_SIZES = (250, 1_000, 4_000, 16_000, 50_000, 100_000, 1_000_000, 10_000_000)
# One decade further (the 100x-scale proof point): single timed run, radix
# series only — at ~1 min/case steady-state precision isn't the question,
# linear-vs-superlinear shape and not-spilling is.
SWEEP_XL = 100_000_000
# dev knob: cap sweep size for fast harness validation (never set by the
# driver; full sweep is the default)
_SWEEP_CAP = int(os.environ.get("SPARK_GRAFT_SWEEP_CAP", str(SWEEP_XL)))
SWEEP_SIZES = tuple(n for n in SWEEP_SIZES if n <= _SWEEP_CAP)

# Spark's two sort strategies, the faithful analog of the reference's
# comparator-vs-row-encoding comparison (lib.rs:23-52, README.md:7-20):
# enableRadixSort=true sorts 8-byte binary prefixes with radix passes
# (row-encoding-flavored), =false runs the comparator path.  Spark only
# engages radix for single-column sorts with fully-prefix-representable keys
# (SortExec's canUseRadixSort), so the four multi-column reference cases
# honestly coincide — which is itself the Spark answer to the reference's
# question (the planner, not the user, picks the strategy).  The extra
# "i64-single" case IS radix-eligible and shows the genuine divergence.
SORT_STRATEGIES = (("radix", "true"), ("comparator", "false"))
RADIX_PROBE_CASE = "i64-single"

# Multi-batch sorted-run MERGE series (round 9; reference README.md:3-5 —
# the half of its finding where row-format encoding wins, fed by
# split_batch data.rs:245-261): K pre-sorted pinned runs merged into one
# total order (merge_sorted_runs = range exchange + per-partition sort),
# timed under both strategies, against the direct sort of the SAME pinned
# rows.  The Spark-shaped question: the range exchange interleaves up to
# K sorted subsequences per reducer, which the comparator path's TimSort
# merges adaptively while radix ignores order — so the strategy gap on
# run-structured input is the translation of the reference's
# single-batch-vs-merge asymmetry.
MERGE_SWEEP_RUNS = (2, 8, 32)
MERGE_SWEEP_SIZES = tuple(n for n in (1_000_000, 10_000_000) if n <= _SWEEP_CAP)
# Two cases: the reference's mixed-tuple workload (multi-column — Spark
# plans the comparator path regardless of the radix flag, so its two
# series honestly coincide there) and the radix-eligible i64-single probe,
# where the strategy divergence on run-structured input is measurable.
MERGE_SWEEP_CASES = ("mixed-tuple", RADIX_PROBE_CASE)

# Analytics decade sweep (round-5): the three CPU-bound dedup/fingerprint
# flagships over generated corpora spanning a decade+ of document counts
# (30k -> 1M docs; the fixture tops out at 5k).  The linear-scaling claim
# the 100 TB story rests on is exactly what this exhibits: every candidate
# generator is bucketed (df-capped postings, LSH bands, per-row winnowing),
# so runtime should grow ~linearly in n with no knee.  Winnowing runs the
# PRODUCTION hash (xxhash64 — the fast side of the knob); the md5-parity
# twin is A/B'd at one size so the knob's cost stays measured.
ANALYTICS_SWEEP_SIZES = (30_000, 100_000, 300_000, 1_000_000)
_ANALYTICS_CAP = int(
    os.environ.get("SPARK_GRAFT_ANALYTICS_CAP", str(ANALYTICS_SWEEP_SIZES[-1]))
)
ANALYTICS_AB_SIZE = 300_000  # hash-knob A/B point


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _host_load() -> tuple[float, int, int]:
    """(loadavg_1min, busy_jiffies, total_jiffies) from /proc — per-window
    host-load telemetry (VERDICT r7 ask #5): a drift window (the r7
    mid-round 2.59x run) becomes attributable to load in the artifact
    itself instead of by narrative."""
    try:
        load = float(open("/proc/loadavg").read().split()[0])
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return load, sum(vals) - idle, sum(vals)
    except (OSError, ValueError, IndexError):
        return -1.0, 0, 0


def _duck_connect():
    """DuckDB connection with the oracle views over the same parquet."""
    import duckdb

    from experiments_datafusion_spark.io import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 32}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def run_headline_windows(spark, registry) -> tuple[dict, dict]:
    """N interleaved exclusive windows over the headline set.

    Each window times every Spark query once (noop sink) then every DuckDB
    oracle once (fetchall), so host drift within the round hits both
    engines symmetrically.  One untimed warmup pass precedes window 1
    (Janino codegen / duckdb plan cache).  Returns (results, record) where
    results[name] = median Spark seconds (feeds the suite total and
    round-over-round comparison) and record carries the full per-window
    times + median ratios for BENCH_r{N}.json.
    """
    con = _duck_connect()
    oracled = [
        n
        for n in HEADLINE
        if registry[n].oracle is not None and n not in BENCH_ORACLE_EXCLUDE
    ]
    # warmup: codegen for Spark, plan/IO cache for duckdb
    for name in HEADLINE:
        force(registry[name].fn(spark, SF_DIR))
    for name in oracled:
        con.execute(registry[name].oracle).fetchall()
    # raw (unrounded) perf_counter deltas drive every ratio; the windows
    # record rounds for display only.  Guard rationale (round-6 advisor):
    # a sub-50us oracle used to round to 0.0000, get filtered from the
    # per-window ratio list, and _median([]) killed the whole bench run.
    raw: list[dict[str, dict[str, float]]] = []
    windows: list[dict[str, dict[str, float]]] = []
    loadavg_per_window: list[float] = []
    cpu_busy_frac_per_window: list[float] = []
    for w in range(WINDOWS):
        load0, busy0, total0 = _host_load()
        spark_t: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            force(registry[name].fn(spark, SF_DIR))
            spark_t[name] = time.perf_counter() - t0
        duck_t: dict[str, float] = {}
        for name in oracled:
            t0 = time.perf_counter()
            con.execute(registry[name].oracle).fetchall()
            duck_t[name] = time.perf_counter() - t0
        load1, busy1, total1 = _host_load()
        # loadavg at the window boundary (1-min EWMA, so the END sample
        # reflects the window's regime) + the window's own busy fraction
        # from /proc/stat jiffy deltas (32 CPUs busy with our work alone
        # reads ~suite-parallelism/ncpu; anything materially above the
        # other windows means a co-tenant was competing).
        loadavg_per_window.append(round(max(load0, load1), 2))
        # a failed /proc read on EITHER end must record a loud sentinel, not
        # a plausible-looking 0.0/negative fraction (advisor r8): total==0
        # marks that end's _host_load as failed.
        if total0 == 0 or total1 == 0:
            cpu_busy_frac_per_window.append(-1.0)
        else:
            cpu_busy_frac_per_window.append(
                round((busy1 - busy0) / max(total1 - total0, 1), 4)
            )
        raw.append({"spark": spark_t, "duck": duck_t})
        windows.append(
            {
                "spark": {n: round(v, 4) for n, v in spark_t.items()},
                "duck": {n: round(v, 4) for n, v in duck_t.items()},
            }
        )
        print(
            f"[bench] window {w + 1}/{WINDOWS}: spark={round(sum(spark_t.values()), 2)}s"
            f" duck={round(sum(duck_t.values()), 2)}s",
            file=sys.stderr,
            flush=True,
        )
    con.close()
    results = {
        name: round(_median([w["spark"][name] for w in raw]), 4)
        for name in HEADLINE
    }
    duck_median = {
        name: round(_median([w["duck"][name] for w in raw]), 4)
        for name in oracled
    }
    ratio_median = {}
    for name in oracled:
        ratios = [
            w["spark"][name] / w["duck"][name] for w in raw if w["duck"][name] > 0
        ]
        ratio_median[name] = round(_median(ratios), 3) if ratios else None

    def _totals(keys: list[str]) -> list[float]:
        # defensively drop keys without a timed oracle (BENCH_ORACLE_EXCLUDE
        # members are never in w["duck"]; the module-level assert makes this
        # unreachable for the r4 anchor, but a future caller shouldn't be
        # one KeyError away from killing the whole bench)
        keys = [n for n in keys if n in raw[0]["duck"]]
        return [
            round(
                sum(w["spark"][n] for n in keys)
                / max(sum(w["duck"][n] for n in keys), 1e-9),
                3,
            )
            for w in raw
        ]

    per_window_totals = _totals(oracled)
    r4_oracled = [n for n in R4_COMPARABLE if registry[n].oracle is not None]
    r4_totals = _totals(r4_oracled)
    record = {
        "protocol": f"median-of-{WINDOWS} interleaved exclusive windows",
        "windows": windows,
        "duck_queries": duck_median,
        "ratio_median": ratio_median,
        "ratio_total_per_window": per_window_totals,
        "ratio_total_median": round(_median(per_window_totals), 3),
        # host-load telemetry per window (VERDICT r7 ask #5)
        "loadavg_per_window": loadavg_per_window,
        "cpu_busy_frac_per_window": cpu_busy_frac_per_window,
        # the fixed round-4 anchor: like-for-like across every round
        "r4_comparable_keys": len(r4_oracled),
        "ratio_total_r4_per_window": r4_totals,
        "ratio_total_r4_median": round(_median(r4_totals), 3),
    }
    for name in HEADLINE:
        r = ratio_median.get(name)
        print(
            f"[bench] {name}: spark={results[name]}s"
            + (f" duck={duck_median[name]}s ratio={r}" if r is not None else " (no oracle timing)"),
            file=sys.stderr,
            flush=True,
        )
    return results, record


def time_df(build, iters: int = ITERS, warmup: int = WARMUP) -> float:
    for _ in range(warmup):
        force(build())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(build())
        times.append(time.perf_counter() - t0)
    # min, not mean: the steady-state capability of the plan.  This host is
    # shared (the orchestrating driver runs its own sweeps), and a transient
    # CPU-contention spike inflating one iteration shouldn't read as a
    # regression of the engine.
    return min(times)


LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "4.0"))
LOAD_WAITS = int(os.environ.get("SPARK_GRAFT_LOAD_WAITS", "5"))
LOAD_WAIT_SEC = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "45"))


def _await_quiet_host() -> tuple[list[float], int, bool]:
    """Refuse-and-retry on a busy host (round 12, VERDICT r11 wrong #2 /
    next #6a): the r11 driver window launched onto prelaunch loadavg
    7.2–7.8 and posted a 2.106x anchor on UNCHANGED plans — host noise
    encoded as an engine ratio.  Sample loadavg BEFORE the JVM exists (so
    the sample cannot include self-load); while the 1-min load exceeds
    LOAD_GATE, wait LOAD_WAIT_SEC and resample, up to LOAD_WAITS times.
    If the host never quiets, RUN ANYWAY — a bench that refuses to
    produce a number is worse than a flagged one — but stamp
    load_contaminated=true in the JSON so the ratios are machine-readably
    suspect.  Returns (final prelaunch loadavg, waits used, contaminated)."""
    waits = 0
    while True:
        try:
            load = [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return [-1.0, -1.0, -1.0], waits, False
        if load[0] <= LOAD_GATE or waits >= LOAD_WAITS:
            return load, waits, load[0] > LOAD_GATE
        waits += 1
        print(
            f"[bench] host busy (loadavg {load[0]} > gate {LOAD_GATE}); "
            f"wait {waits}/{LOAD_WAITS} for {LOAD_WAIT_SEC}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(LOAD_WAIT_SEC)


def main() -> None:
    # pre-launch host-load sample, taken BEFORE the Spark JVM spins up: the
    # in-run loadavg fields cannot discriminate self-load from co-tenant
    # load (r9 verdict #1 — three rounds of prose attribution); this one
    # can, because at sample time the bench has produced no load of its
    # own.  A loaded prelaunch_loadavg means the ratios in this file were
    # taken on a contaminated host — machine-readable this time.  Round 12
    # adds the refuse-and-retry gate: wait for the host to quiet, and if
    # it never does, stamp the run as contaminated.
    prelaunch, load_waits, load_contaminated = _await_quiet_host()
    spark = get_spark("edfs-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    # NOTE: no clearCache between queries — unpersisting another query's
    # lazy localCheckpoint blocks mid-flight raced the executor accumulators
    # (SparkException noise in BENCH_r01); the ContextCleaner reclaims
    # unreferenced blocks on its own.
    results, headline_record = run_headline_windows(spark, registry)

    # reference-parity sort bench: the four workload cases + the radix probe
    # case, swept over batch size like runall.sh, one series per sort
    # strategy (the reference's two-strategy chart shape, lib.rs:23-52);
    # the radix-series 100k endpoint doubles as the headline number.
    sweep: dict[str, dict[str, list[dict[str, float]]]] = {}
    refsort_points: dict[str, int] = {}
    for case in (*generators.CASES, RADIX_PROBE_CASE):
        def build(case=case, n=REF_SORT_ROWS):
            return sort_ops.sort_batch(generators.generate_batch(spark, case, n))

        case_series: dict[str, list[dict[str, float]]] = {}
        for strategy, conf in SORT_STRATEGIES:
            spark.conf.set("spark.sql.sort.enableRadixSort", conf)
            sizes = SWEEP_SIZES + (
                (SWEEP_XL,) if strategy == "radix" and SWEEP_XL <= _SWEEP_CAP else ()
            )
            series = []
            for n in sizes:
                # the headline 100k radix point gets the full ITERS/WARMUP
                # protocol — it feeds the suite total and round-over-round
                # comparison, and a 2-iteration min is too exposed to one
                # noisy run on this shared host (0.55s -> 1.66s flukes);
                # the XL decade is a single run (~1 min/case: shape, not
                # steady-state, is the question there)
                if n == REF_SORT_ROWS and strategy == "radix":
                    sec = round(time_df(lambda: build(n=n)), 4)
                elif n == SWEEP_XL:
                    sec = round(time_df(lambda: build(n=n), iters=1, warmup=0), 4)
                else:
                    sec = round(time_df(lambda: build(n=n), iters=2, warmup=1), 4)
                series.append({"n": n, "sec": sec})
            case_series[strategy] = series
            print(f"[bench] refsort {case} [{strategy}]: {series}", file=sys.stderr, flush=True)
        spark.conf.set("spark.sql.sort.enableRadixSort", "true")
        sweep[case] = case_series
        # headline stays the radix-series 100k point — the reference's own
        # endpoint (runall.sh END=100000), which BASELINE.md compares at.
        # On a capped dev run (SPARK_GRAFT_SWEEP_CAP < 100k) the point is
        # absent; the key is then SUFFIXED with the substituted row count
        # so a capped timing can never be read as the full-run number in a
        # round-over-round comparison (round-6 advisor finding), and
        # refsort_points records the n behind every headline key.
        ck = f"refsort_{case.replace('-', '_')}"
        point = next(
            (p for p in case_series["radix"] if p["n"] == REF_SORT_ROWS), None
        )
        if point is None:
            point = case_series["radix"][-1]
            ck = f"{ck}_at_{point['n']}"
        results[ck] = point["sec"]
        refsort_points[ck] = point["n"]

    # multi-batch merge series: pin the rows once per size (so the timed
    # section is ONLY the merge / the direct sort, not generation), then
    # for each run count K: scatter+sort the runs (untimed), pin them, and
    # time the global merge under both strategies.  The direct-sort
    # baseline of the same pinned rows anchors each size.
    from experiments_datafusion_spark.operators import split as split_ops

    merge_sweep: dict[str, dict] = {}
    for case in MERGE_SWEEP_CASES:
        for n in MERGE_SWEEP_SIZES:
            base = generators.generate_batch(spark, case, n).persist()
            base.count()  # pin
            exprs = sort_ops.make_sort_exprs(base)
            entry: dict = {"direct": {}, "runs": {}}
            for strategy, conf in SORT_STRATEGIES:
                spark.conf.set("spark.sql.sort.enableRadixSort", conf)
                entry["direct"][strategy] = round(
                    time_df(lambda: sort_ops.sort_batch(base, exprs), iters=2, warmup=1),
                    4,
                )
            for k in MERGE_SWEEP_RUNS:
                assigned = split_ops.assign_streams(base, k).withColumnRenamed(
                    "stream", "run"
                )
                runs = (
                    sort_ops.make_sorted_runs(assigned, k, exprs, run_col="run")
                    .drop("run")
                    .persist()
                )
                runs.count()  # pin the sorted runs; scatter+sort stays untimed
                per_k = {}
                for strategy, conf in SORT_STRATEGIES:
                    spark.conf.set("spark.sql.sort.enableRadixSort", conf)
                    per_k[strategy] = round(
                        time_df(
                            lambda: sort_ops.merge_sorted_runs(runs, exprs),
                            iters=2,
                            warmup=1,
                        ),
                        4,
                    )
                entry["runs"][str(k)] = per_k
                runs.unpersist()
                # round-10 few-run fix: the same K logical runs materialized
                # as K x (32/K) sorted SEGMENTS (make_sorted_runs
                # segments_per_run) — the layout that keeps every
                # post-materialization stage full-width.  Timed under the
                # default strategy only (the strategies tie on multi-column
                # input; the segment layout, not the sort algorithm, is the
                # variable under test).
                if k < 32:
                    spark.conf.set("spark.sql.sort.enableRadixSort", "true")
                    seg_runs = (
                        sort_ops.make_sorted_runs(
                            assigned,
                            k,
                            exprs,
                            run_col="run",
                            segments_per_run=32 // k,
                        )
                        .drop("run")
                        .persist()
                    )
                    seg_runs.count()
                    entry["runs"][str(k)]["segmented"] = round(
                        time_df(
                            lambda: sort_ops.merge_sorted_runs(seg_runs, exprs),
                            iters=2,
                            warmup=1,
                        ),
                        4,
                    )
                    seg_runs.unpersist()
            base.unpersist()
            spark.conf.set("spark.sql.sort.enableRadixSort", "true")
            merge_sweep[f"{case}@{n}"] = entry
            print(
                f"[bench] merge sweep {case}@{n}: {entry}", file=sys.stderr, flush=True
            )

    # analytics decade sweep: generated corpora, noop sink, single timed
    # run per point (shape, not steady-state, is the question; the first
    # point pays codegen via one warmup)
    from experiments_datafusion_spark.operators import dedup as dedup_ops
    from experiments_datafusion_spark.operators import text as text_ops
    from experiments_datafusion_spark.queries import llm_extras

    from experiments_datafusion_spark.queries import round9 as r9_ops

    analytics_cases = {
        "dedup_jaccard_capped": lambda docs: dedup_ops.jaccard_pairs(
            docs, 0.5, max_df=5
        ),
        "dedup_minhash_lsh": lambda docs: dedup_ops.minhash_lsh_pairs(docs, 0.5),
        "docs_winnowing_fast": lambda docs: llm_extras._winnowing_agg(
            llm_extras.winnowing_fps_df(docs, text_ops.fast_hash64)
        ),
        # round 9: CDC chunk dedup on the production hash — per-doc
        # chunking is a projection, the dedup one groupBy + one join, so
        # the curve should stay ~linear like the other bucketed passes
        "dedup_cdc_chunks_fast": lambda docs: r9_ops.cdc_chunk_stats_df(
            docs, text_ops.fast_hash64
        ),
    }
    analytics_sweep: dict[str, list[dict[str, float]]] = {}
    for name, build_op in analytics_cases.items():
        series = []
        for idx, n in enumerate(s for s in ANALYTICS_SWEEP_SIZES if s <= _ANALYTICS_CAP):
            def build(n=n, build_op=build_op):
                return build_op(generators.synth_documents(spark, n))

            sec = round(time_df(build, iters=1, warmup=1 if idx == 0 else 0), 4)
            series.append({"n": n, "sec": sec})
        analytics_sweep[name] = series
        print(f"[bench] analytics {name}: {series}", file=sys.stderr, flush=True)
    if ANALYTICS_AB_SIZE <= _ANALYTICS_CAP:
        ab = {}
        for hname, hfn in (("md5", text_ops.hash64), ("xxhash64", text_ops.fast_hash64)):
            def build(hfn=hfn):
                return llm_extras._winnowing_agg(
                    llm_extras.winnowing_fps_df(
                        generators.synth_documents(spark, ANALYTICS_AB_SIZE), hfn
                    )
                )

            ab[hname] = round(time_df(build, iters=1, warmup=1), 4)
        analytics_sweep["winnowing_hash_ab"] = [
            {"n": ANALYTICS_AB_SIZE, "hash": k, "sec": v} for k, v in ab.items()
        ]
        print(f"[bench] winnowing hash A/B @{ANALYTICS_AB_SIZE}: {ab}", file=sys.stderr, flush=True)

    try:
        if not RENDER_CHARTS:
            raise RuntimeError("chart rendering disabled (set BENCH_CHARTS=1)")
        from experiments_datafusion_spark.charts import render_multi_line_chart

        render_multi_line_chart(
            {
                name: [(p["n"], p["sec"]) for p in series]
                for name, series in analytics_sweep.items()
                if name != "winnowing_hash_ab"
            },
            title="analytics flagships — runtime vs corpus size",
            xlabel="documents (generated corpus)",
            ylabel="seconds (single run)",
            out_path=REPO / "img" / "analytics_decade.svg",
        )
        for case, case_series in sweep.items():
            render_multi_line_chart(
                {
                    strategy: [(p["n"], p["sec"]) for p in series]
                    for strategy, series in case_series.items()
                },
                title=f"sort runtime vs batch size — {case}",
                xlabel="rows per batch",
                ylabel="seconds (min, steady-state)",
                out_path=REPO / "img" / f"refsort_{case.replace('-', '_')}.svg",
            )
    except Exception as exc:  # charts are artifacts, never bench failures
        print(f"[bench] chart render skipped: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    print(
        json.dumps(
            {
                "metric": "suite_time",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "refsort_points": refsort_points,
                "refsort_sweep": sweep,
                "merge_sweep": merge_sweep,
                "analytics_sweep": analytics_sweep,
                "headline_windows": headline_record,
                "prelaunch_loadavg": prelaunch,  # [1m, 5m, 15m] before JVM start
                "load_gate": LOAD_GATE,
                "load_waits_used": load_waits,
                "load_contaminated": load_contaminated,
                "sf": sf_val,
                "iters": ITERS,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
            }
        )
    )


if __name__ == "__main__":
    main()
