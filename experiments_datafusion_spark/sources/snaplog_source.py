"""The snapshot-log table as a first-class Spark STREAMING SOURCE — the
Delta `spark.readStream.format("delta")` shape re-expressed over
operators/table_format.SnapshotLog through the public Spark 4 Python
DataSource streaming API.

Offsets are LOG VERSIONS: `{"next_version": v}` means versions < v are
committed downstream.  Each micro-batch covers the versions the log gained
since the last offset; its input partitions are the NEW data files those
versions added (appends add files; a full commit's files are all new), so

  * the reader never re-emits carried-forward files — consumers see each
    appended row exactly once (the incremental contract);
  * `partitions()` is driver-side O(new files) catalog work, while the
    actual parquet reads happen ON EXECUTORS, one task per new file —
    this is the distributed `DataSourceStreamReader`, not the
    driver-side simple reader;
  * `read()` yields `pyarrow.RecordBatch`es (round 11; the per-row tuple
    path survives only as the measured-negative `arrow=false` arm), so
    rows flow parquet -> Arrow -> Spark without ever materializing as
    Python objects — the vectorized contract the rest of the engine
    keeps;
  * `readBetweenOffsets` replay is trivially exact: the same version
    range always names the same immutable files (snapshots never mutate),
    which is the bit-identical replay contract exactly-once recovery
    needs from a source.

Log-entry KIND awareness (round 11, ADVICE r10):

  * `kind='staged'` versions (write-audit-publish) are INVISIBLE to the
    stream, exactly as they are to `head_published` batch readers — each
    consumer-visible version diffs against the previous PUBLISHED
    version, so the later `publish_staged` commit emits exactly the
    audited batch's files, never the whole republished base;
  * a version that REMOVES files relative to its published parent
    (compaction, DELETE, rewrite) fails the stream loudly unless
    `.option("ignoreChanges", "true")` opts in — the Delta readStream
    contract: silently re-emitting compacted rows as fresh inserts is
    never what a consumer meant.  With the option, only the version's
    genuinely-new files are emitted (rewritten rows may re-emit — the
    same documented caveat as Delta's ignoreChanges).

Options (Spark lowercases DataSource option keys):

  * `path`     (required) — the log root;
  * `columns`  — comma-separated projection; the pruning reaches the
    executor-side parquet reads (`iter_batches(columns=...)`), so a
    wide-row table streams only the bytes the consumer asked for;
  * `ignorechanges` — admit rewrite commits (see above);
  * `startingversion` — where a NEW subscription begins (Delta's
    startingVersion): a version number, or `latest` to emit only commits
    made after the stream starts; checkpointed restarts resume from the
    checkpoint as always;
  * `arrow`    — default true; `false` keeps the legacy row-tuple path
    (kept ONLY as the A/B arm the BENCH_NOTES measurement quotes).

Scale note: per-batch admission control (the maxFilesPerTrigger idiom)
belongs in `latestOffset` — pace how far the offset advances — NEVER in
`partitions()`: truncating the partition list after the offset range is
fixed would silently drop the truncated files' rows (the offset still
commits as covering them).  An earlier draft had exactly that bug behind
a dead option, and the knob was removed rather than shipped wrong.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _log(root: str):
    from experiments_datafusion_spark.operators.table_format import SnapshotLog

    return SnapshotLog(root)


def _versions(root: str) -> list[int]:
    """Committed versions — resolved through SnapshotLog so a CHECKPOINTED
    log (tail entries consolidated into checkpoint-*.json) reads
    identically: a raw tail-only listing would make the first version
    after a checkpoint look parentless and re-emit its carried files."""
    if not os.path.isdir(os.path.join(root, "_log")):
        return []
    return _log(root).versions()


def _entry(root: str, version: int) -> dict:
    return _log(root).entry(version)


def _published_versions(root: str) -> list[int]:
    """Consumer-visible versions: staged (write-audit-publish) snapshots
    are skipped, exactly as `head_published` skips them for batch
    readers."""
    return [
        v for v in _versions(root) if _entry(root, v).get("kind") != "staged"
    ]


def _version_delta(root: str, version: int) -> tuple[list[str], list[str]]:
    """(added, removed) files of `version` relative to the previous
    PUBLISHED version (order-stable)."""
    cur = [f["path"] for f in _entry(root, version)["files"]]
    published = _published_versions(root)
    older = [v for v in published if v < version]
    if not older:
        return cur, []
    prev = {f["path"] for f in _entry(root, older[-1])["files"]}
    added = [p for p in cur if p not in prev]
    removed = sorted(prev - set(cur))
    return added, removed


class _FilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class _SnapLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("snaplog source needs .option('path', <log root>)")
        cols = (options.get("columns") or "").strip()
        self.columns = [c.strip() for c in cols.split(",") if c.strip()] or None
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.arrow = str(options.get("arrow", "true")).lower() != "false"
        # Delta's startingVersion: where a NEW subscription begins.  A
        # number = emit that version onward; "latest" = only commits made
        # AFTER the stream starts.  Checkpointed restarts ignore this —
        # Spark hands partitions() the committed offset, exactly as the
        # real option behaves.
        self.starting = str(options.get("startingversion", "0")).lower()

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            vs = _versions(self.root)
            return {"next_version": (vs[-1] + 1) if vs else 0}
        return {"next_version": int(self.starting)}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        return {"next_version": (vs[-1] + 1) if vs else 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out: list[InputPartition] = []
        for v in _published_versions(self.root):
            if not int(start["next_version"]) <= v < int(end["next_version"]):
                continue
            added, removed = _version_delta(self.root, v)
            if removed and not self.ignore_changes:
                kind = _entry(self.root, v).get("kind", "data")
                raise ValueError(
                    f"snaplog stream: version {v} (kind={kind!r}) removed "
                    f"{len(removed)} file(s) — a rewrite/compaction in the "
                    "middle of a stream re-emits rows; set .option("
                    "'ignoreChanges', 'true') to admit it (new files only, "
                    "rewritten rows may re-emit)"
                )
            for p in added:
                out.append(_FilePartition(p, v))
        return out

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        v = partition.version
        if self.arrow:
            pf = pq.ParquetFile(partition.path)
            for batch in pf.iter_batches(columns=self.columns):
                yield batch.append_column(
                    "_commit_version",
                    pa.array([v] * batch.num_rows, type=pa.int64()),
                )
            return
        # legacy row-tuple path — the measured-negative A/B arm only
        tbl = pq.read_table(partition.path, columns=self.columns)
        cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        for i in range(tbl.num_rows):
            yield tuple(c[i] for c in cols) + (v,)

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; nothing to release before `end`


class SnapshotLogDataSource(DataSource):
    """`spark.readStream.format("snaplog").option("path", root)` — emits
    every appended row exactly once, stamped with `_commit_version`, the
    CDF-lite streaming read of the table format."""

    @classmethod
    def name(cls) -> str:
        return "snaplog"

    def schema(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("snaplog source needs .option('path', <log root>)")
        vs = _published_versions(root)
        if not vs:
            raise ValueError(f"no published versions under {root}")
        cols = _entry(root, vs[-1])["schema"]
        want = (self.options.get("columns") or "").strip()
        if want:
            keep = [c.strip() for c in want.split(",") if c.strip()]
            by_name = {name: (name, typ) for name, typ, _n in cols}
            missing = [c for c in keep if c not in by_name]
            if missing:
                raise ValueError(
                    f"snaplog source: columns {missing} not in table schema "
                    f"{[name for name, _t, _n in cols]}"
                )
            cols = [(name, by_name[name][1], True) for name in keep]
        ddl = ", ".join(f"{name} {typ}" for name, typ, _n in cols)
        return ddl + ", _commit_version bigint"

    def streamReader(self, schema) -> _SnapLogStreamReader:
        return _SnapLogStreamReader(dict(self.options))
