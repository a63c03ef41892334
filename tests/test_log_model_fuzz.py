"""Model-based STATE-MACHINE fuzZing of the snapshot log (rounds 11-12):
a seeded random walk over the commit surface — append, rebased append,
checked band-delete rewrite, compaction (round-robin AND clustered),
RESTORE, log checkpointing, TIMESTAMP AS OF, and (round 12, VERDICT r11
next #8) write-audit-publish (stage + publish AND stage + abandon +
recovery), shallow CLONE, and retention VACUUM — with a plain-Python
MODEL of the expected table contents at every version.  After every
operation the real log's read must equal the model, AS OF reads must
equal the model's history, and changes_between must equal the model's
set diff.  A second walk covers the merge-on-read surface (delete
sidecars + compaction-reconcile) against a live-set model through
``mor_current_view``.

This is the table-format analog of tools/fuzz_differential.py: the
hand-written keys each pin one dataflow; the walk probes the COMPOSITION
space (restore after compaction, publish after restore, vacuum through a
checkpoint, ...) that no single key enumerates.  Seeded, so a failure
reproduces exactly.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from experiments_datafusion_spark.operators.table_format import (
    SnapshotLog,
    changes_between,
    clone_shallow,
    commit_staged,
    mor_current_view,
    publish_staged,
)


def _read_ids(log: SnapshotLog, spark, version=None) -> list[int]:
    return sorted(r.id for r in log.read(spark, version).collect())


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id bigint")


def _restore(log: SnapshotLog, version: int) -> int:
    """RESTORE as a forward metadata commit (queries/round10.restore_version
    without the module import cycle)."""
    e = log.entry(version)
    new_v = log.latest_version() + 1
    entry = {
        "version": new_v,
        "note": f"restore v{version}",
        "kind": "data",
        "schema": e.get("schema"),
        "files": [dict(f) for f in e["files"]],
    }
    log._publish(new_v, entry)
    return new_v


@pytest.mark.parametrize("seed", [20261101, 20261102, 20261103])
def test_log_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    log = SnapshotLog(str(tmp_path / f"t{seed}"))
    next_id = 0

    def fresh_ids(k):
        nonlocal next_id
        ids = list(range(next_id, next_id + k))
        next_id += k
        return ids

    # model: expected sorted id list per version; clock: synthetic ts per
    # version (stamped after each commit so TIMESTAMP AS OF is testable)
    cur = fresh_ids(rng.randint(5, 20))
    v = log.commit(_df(spark, cur), note="v0")
    log.stamp_ts(v, 0.0)
    model = {0: sorted(cur)}

    cloned = False
    for step in range(1, 27):
        op = rng.choices(
            ["append", "append_rebased", "delete", "compact",
             "compact_sorted", "restore", "checkpoint", "wap_publish",
             "wap_abandon", "vacuum_retain", "clone"],
            weights=[24, 12, 16, 8, 8, 8, 4, 8, 5, 4, 3],
        )[0]
        if op == "checkpoint":
            log.checkpoint()  # pure metadata: nothing changes, no version
            assert _read_ids(log, spark) == model[log.latest_version()]
            continue
        if op == "clone":
            # shallow clone: zero data copied, immediate divergence —
            # one-shot assertions against the source model, then the walk
            # forgets the clone (a later source vacuum may legitimately
            # strand it; that caveat is pinned in test_round10)
            if cloned:
                continue
            cloned = True
            dst = clone_shallow(log, str(tmp_path / f"c{seed}-{step}"))
            assert _read_ids(dst, spark) == sorted(cur), f"seed={seed} clone"
            extra = fresh_ids(3)
            dst.commit_append(_df(spark, extra), note="clone diverges")
            assert _read_ids(dst, spark) == sorted(cur + extra)
            assert _read_ids(log, spark) == sorted(cur)  # source untouched
            continue
        if op == "vacuum_retain":
            # retention vacuum by the synthetic clock: versions stamped
            # ts=v, so since_ts=floor keeps [floor, latest]; swept
            # versions leave the probe set (their files may or may not
            # survive via sharing — the model only promises KEPT history)
            if len(model) < 3:
                continue
            floor_v = rng.choice(sorted(model)[1:-1])
            log.vacuum_retain(float(floor_v))
            latest = log.latest_version()
            for v in [v for v in model if v < floor_v and v != latest]:
                del model[v]
            assert _read_ids(log, spark) == model[latest], f"seed={seed} vacuum"
            continue
        if op == "wap_publish":
            ids = fresh_ids(rng.randint(1, 10))
            sv = commit_staged(log, _df(spark, ids), note=f"staged {step}")
            log.stamp_ts(sv, float(sv))
            # the staged snapshot is AS-OF-readable but NOT the consumer
            # head: the published read must not move yet
            assert _read_ids(log, spark, sv) == sorted(ids)
            assert _read_ids(log, spark, max(model)) == model[max(model)]
            v = publish_staged(log, sv)
            cur = sorted(cur + ids)
            log.stamp_ts(v, float(v))
            model[v] = sorted(cur)
            assert _read_ids(log, spark) == model[v], f"seed={seed} publish"
            continue
        if op == "wap_abandon":
            ids = fresh_ids(rng.randint(1, 10))
            sv = commit_staged(log, _df(spark, ids), note=f"abandoned {step}")
            log.stamp_ts(sv, float(sv))
            # a staged tip REFUSES appends/rewrites — pinned here, then
            # recovered by restoring the pre-stage state (the abandon
            # path: audit failed, never published)
            with pytest.raises(ValueError, match="staged"):
                log.commit_append(_df(spark, [999_999]), note="must refuse")
            v = _restore(log, max(model))
            log.stamp_ts(v, float(v))
            model[v] = sorted(cur)
            assert _read_ids(log, spark) == model[v], f"seed={seed} abandon"
            continue
        if op == "append":
            ids = fresh_ids(rng.randint(1, 15))
            cur = sorted(cur + ids)
            v = log.commit_append(_df(spark, ids), note=f"append {step}")
        elif op == "append_rebased":
            ids = fresh_ids(rng.randint(1, 15))
            cur = sorted(cur + ids)
            v = log.commit_append_rebased(_df(spark, ids), note=f"appendr {step}")
        elif op == "delete":
            if not cur:
                continue
            lo = rng.choice(cur)
            hi = lo + rng.randint(0, max(cur) - lo)
            # checked rewrite: affected = files whose [min,max] hits the band
            # (one distributed stats pass), keep = the rest — the pruned
            # DELETE shape under a random band
            from experiments_datafusion_spark.operators.table_format import (
                file_stats,
            )

            stats = file_stats(log.read(spark), "id")
            affected = [
                r.file_path for r in stats if r.hi >= lo and r.lo <= hi
            ]
            kept = [r.file_path for r in stats if not (r.hi >= lo and r.lo <= hi)]
            if not affected:
                continue
            df_new = log.read_files(spark, affected).where(
                ~F.col("id").between(lo, hi)
            )
            v = log.commit_rewrite_checked(
                df_new, keep_files=kept, removed_files=affected,
                note=f"delete [{lo},{hi}]",
            )
            cur = [i for i in cur if not (lo <= i <= hi)]
        elif op == "compact":
            v = log.compact(spark, target_file_bytes=16 * 1024)
        elif op == "compact_sorted":
            v = log.compact(spark, target_file_bytes=16 * 1024, sort_cols=["id"])
        else:  # restore
            target = rng.choice(sorted(model))
            v = _restore(log, target)
            cur = list(model[target])
        log.stamp_ts(v, float(v))
        model[v] = sorted(cur)
        assert _read_ids(log, spark) == model[v], f"seed={seed} step={step} op={op}"

    # history: every recorded version still reads as the model says
    probe_versions = rng.sample(sorted(model), min(6, len(model)))
    for pv in probe_versions:
        assert _read_ids(log, spark, pv) == model[pv], f"seed={seed} as-of v{pv}"
        # TIMESTAMP AS OF the synthetic clock resolves to the same state
        assert log.version_as_of_ts(float(pv) + 0.5) >= pv

    # CDF consistency: changes_between two random versions == the model diff
    a, b = sorted(rng.sample(sorted(model), 2))
    feed = changes_between(
        log.read(spark, a), log.read(spark, b), key="id", payload=[]
    )
    got = {(r.id, r._change_type) for r in feed.collect()}
    sa, sb = set(model[a]), set(model[b])
    want = {(i, "insert") for i in sb - sa} | {(i, "delete") for i in sa - sb}
    assert got == want, f"seed={seed} cdf v{a}->v{b}"


@pytest.mark.parametrize("seed", [20261111, 20261112])
def test_evolving_log_random_walk_matches_model(spark, tmp_path, seed):
    """The schema-evolution twin: random walks over {append, RENAME, ADD,
    DROP, WIDEN} with a column-ID model — rows live as {col_id: value}
    dicts, so the model is inherently rename-proof and the walk checks
    exactly what the id mapping must guarantee: every historical file
    generation resolves to the live schema (added columns NULL for
    pre-evolution rows, widened columns cast, dropped columns invisible,
    renames free)."""
    from experiments_datafusion_spark.operators.table_format import EvolvingLog

    rng = random.Random(seed)
    log = EvolvingLog(str(tmp_path / f"e{seed}"))
    next_val = 0
    next_id = 3
    next_name = 0

    def vals(k):
        nonlocal next_val
        out = list(range(next_val, next_val + k))
        next_val += k
        return out

    live = [(1, "a", "bigint"), (2, "b", "int")]
    rows = []  # model: list of {col_id: int}

    def append(n):
        nonlocal rows
        new = [dict() for _ in range(n)]
        for cid, _name, _t in live:
            for r, v in zip(new, vals(n)):
                r[cid] = v
        rows = rows + new
        ddl = ", ".join(f"{name} {t}" for _i, name, t in live)
        data = [tuple(r[cid] for cid, _n, _t in live) for r in new]
        return log.append_columns(spark.createDataFrame(data, ddl))

    # v0: full commit under the id-carrying schema
    first = [dict() for _ in range(rng.randint(3, 8))]
    for cid, _name, _t in live:
        for r, v in zip(first, vals(len(first))):
            r[cid] = v
    rows = first
    ddl = ", ".join(f"{name} {t}" for _i, name, t in live)
    log.commit_columns(
        spark.createDataFrame([tuple(r[c] for c, _n, _t in live) for r in rows], ddl),
        live,
    )

    def check(step, op):
        got = log.read_evolved(spark)
        names = [name for _i, name, _t in live]
        assert sorted(got.columns) == sorted(names), (step, op)
        got_rows = sorted(
            tuple(r[name] for name in sorted(names)) for r in got.collect()
        )
        want = sorted(
            tuple(r.get(cid) for cid, name, _t in sorted(live, key=lambda c: c[1]))
            for r in rows
        )
        assert got_rows == want, f"seed={seed} step={step} op={op}"

    check(0, "init")
    for step in range(1, 15):
        op = rng.choices(
            ["append", "rename", "add", "drop", "widen", "checkpoint"],
            weights=[40, 15, 15, 10, 15, 5],
        )[0]
        if op == "checkpoint":
            # consolidating the log must be invisible to the id mapping:
            # read_evolved resolves schema generations through entries the
            # checkpoint now serves from one file
            log.checkpoint()
        elif op == "append":
            append(rng.randint(1, 6))
        elif op == "rename":
            i = rng.randrange(len(live))
            cid, _old, t = live[i]
            live[i] = (cid, f"c{next_name}", t)
            next_name += 1
            log.evolve(live, note=f"rename {step}")
        elif op == "add":
            live = live + [(next_id, f"c{next_name}", "bigint")]
            next_id += 1
            next_name += 1
            log.evolve(live, note=f"add {step}")
        elif op == "drop":
            if len(live) < 2:
                continue
            live = live[: (i := rng.randrange(len(live)))] + live[i + 1 :]
            log.evolve(live, note=f"drop {step}")
        else:  # widen
            ints = [j for j, (_c, _n, t) in enumerate(live) if t == "int"]
            if not ints:
                continue
            j = rng.choice(ints)
            cid, name, _t = live[j]
            live[j] = (cid, name, "bigint")
            log.evolve(live, note=f"widen {step}")
        check(step, op)


@pytest.mark.parametrize("seed", [20261201, 20261202])
def test_mor_log_random_walk_matches_model(spark, tmp_path, seed):
    """The merge-on-read twin (round 12): random walks over {delete
    sidecar, compaction-reconcile, checkpoint} against a live-id-set
    model through the mor_current_view state machine — the composition
    (sidecar after reconcile after sidecar...) the single round-9 keys
    don't enumerate.  After a reconcile the view must be the PLAIN
    compacted scan (no sidecars newer than the base), and every sidecar
    layered on top must subtract exactly its keys."""
    rng = random.Random(seed)
    log = SnapshotLog(str(tmp_path / f"m{seed}"))
    ids = list(range(rng.randint(12, 30)))
    log.commit(_df(spark, ids), note="base", kind="base")
    live = set(ids)

    def check(step, op):
        got = sorted(r.id for r in mor_current_view(log, spark, "id").collect())
        assert got == sorted(live), f"seed={seed} step={step} op={op}"

    check(0, "base")
    for step in range(1, 13):
        op = rng.choices(
            ["sidecar", "reconcile", "checkpoint"], weights=[55, 30, 15]
        )[0]
        if op == "sidecar":
            if not live:
                continue
            kill = rng.sample(sorted(live), rng.randint(1, max(1, len(live) // 3)))
            log.commit(_df(spark, kill), note=f"del {step}", kind="delete-sidecar")
            live -= set(kill)
        elif op == "reconcile":
            view = mor_current_view(log, spark, "id")
            log.commit(view, note=f"reconcile {step}", kind="compacted")
        else:
            log.checkpoint()
        check(step, op)
