"""A Spark 4 Python DataSource that generates the reference's sort-bench
workloads (data.rs:56-182 schemas) natively: `spark.read.format("sortbench")
.option("case", ...).option("n", ...)`.

Parity contract: rows are IDENTICAL to generators.generate_batch(...,
portable=True) — every value stream is the same pure function of (id, seed)
(the md5-based 60-bit hash64, generators.py:50-66), so the source is
differential-testable three ways: against the JVM expression generator,
against the DuckDB md5 replay (queries/sortbench.py CTEs), and row-for-row
deterministic under ANY partitioning (each InputPartition owns an id range;
no per-partition RNG anywhere).

Scale shape: partitions() splits the id range, so a 1000-executor cluster
generates in parallel with zero coordination — the Python cousin of
spark.range(n) + column expressions."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

DATA_SEED = 42  # generators.py DATA_SEED (data.rs:193)

SCHEMAS = {
    "utf8-tuple": "utf_low1 string, utf_low2 string, utf_high string",
    "mixed-tuple": "f64 double, utf_low1 string, utf_low2 string, i64 bigint",
    "dictionary-tuple": "a string, b string, c string",
    "mixed-dictionary-tuple": "a string, b string, c string, d bigint",
}

_TR = str.maketrans("0123456789", "ghijklmnop")


def _hash64(s: str) -> int:
    """operators/text.py:hash64 in pure Python: first 15 md5 hex digits."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _uniform(i: int, seed: int, card: int) -> int:
    return _hash64(f"{i}#{seed}") % card


def _utf8_low(i: int, seed: int) -> str:
    return f"value{_uniform(i, seed, 100)}"


def _utf8_high(i: int, seed: int) -> str:
    return hashlib.md5(f"{i}#{seed}".encode()).hexdigest()[:20].translate(_TR)


def _row(case: str, i: int, seed: int, n: int):
    if case == "utf8-tuple":
        return (_utf8_low(i, seed), _utf8_low(i, seed + 1), _utf8_high(i, seed + 2))
    if case == "mixed-tuple":
        return (
            float(_uniform(i, seed, n)),
            _utf8_low(i, seed + 1),
            _utf8_low(i, seed + 2),
            _uniform(i, seed + 3, n),
        )
    if case == "dictionary-tuple":
        return (_utf8_low(i, seed), _utf8_low(i, seed + 1), _utf8_low(i, seed + 2))
    if case == "mixed-dictionary-tuple":
        return (
            _utf8_low(i, seed),
            _utf8_low(i, seed + 1),
            _utf8_low(i, seed + 2),
            _uniform(i, seed + 3, n),
        )
    raise ValueError(f"unknown case: {case}")


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SortbenchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.case = options.get("case", "mixed-tuple")
        if self.case not in SCHEMAS:
            raise ValueError(f"unknown case: {self.case} (want one of {sorted(SCHEMAS)})")
        self.n = int(options.get("n", "1000"))
        self.seed = int(options.get("seed", str(DATA_SEED)))
        self.num_partitions = int(options.get("partitions", "8"))

    def partitions(self):
        step = max(1, math.ceil(self.n / self.num_partitions))
        return [
            _IdRange(start, min(start + step, self.n))
            for start in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield _row(self.case, i, self.seed, self.n)


class SortbenchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sortbench"

    def schema(self) -> str:
        case = self.options.get("case", "mixed-tuple")
        if case not in SCHEMAS:
            # schema resolution runs before any reader is built, so this is
            # the spot where an unknown case must fail descriptively (the
            # reader's own check was unreachable — round-3 ADVICE)
            raise ValueError(
                f"unknown sortbench case {case!r}; valid: {sorted(SCHEMAS)}"
            )
        return SCHEMAS[case]

    def reader(self, schema) -> _SortbenchReader:
        return _SortbenchReader(dict(self.options))

    def simpleStreamReader(self, schema) -> "_SortbenchStreamReader":
        return _SortbenchStreamReader(dict(self.options))


def register_sources(spark) -> None:
    """Idempotent registration of all custom Python sources.

    No environment checks happen here: registering a source must never
    fail for a session that won't use it (round-6 advisor finding — a UTC
    guard for pyavro used to live here and blocked sortbench/checksum
    registration on non-UTC sessions).  The guard itself is retired: the
    Python DataSource timestamp channel is timezone-independent by
    convention and pyavro's mapping matches it (see the invariant note in
    avro_source.py)."""
    from experiments_datafusion_spark.sources.avro_source import PyAvroDataSource
    from experiments_datafusion_spark.sources.snaplog_source import (
        SnapshotLogDataSource,
    )

    spark.dataSource.register(SortbenchDataSource)
    spark.dataSource.register(ChecksumDataSource)
    spark.dataSource.register(PyAvroDataSource)
    spark.dataSource.register(SnapshotLogDataSource)


# --- checksum sink: the WRITER half of the API (commit protocol demo) ------


class _ChecksumCommit(WriterCommitMessage):
    def __init__(self, rows: int, checksum: int):
        self.rows = rows
        self.checksum = checksum


class _ChecksumWriter(DataSourceWriter):
    """Per-task: fold every row into (count, order-insensitive checksum);
    driver-side commit() writes ONE manifest only if every task committed —
    the standard two-phase sink contract (task outputs are speculative
    until the driver commit, exactly how FileFormatWriter commits jobs)."""

    def __init__(self, options: dict):
        self.path = options.get("path") or options.get("manifest")
        if not self.path:
            raise ValueError("checksum sink needs .option('path', <manifest.json>)")

    def write(self, rows) -> "_ChecksumCommit":
        n, acc = 0, 0
        for row in rows:
            n += 1
            # XOR of row hashes: associative+commutative, so the total is
            # independent of partitioning and row order
            acc ^= _hash64(repr(tuple(row)))
        return _ChecksumCommit(n, acc)

    def commit(self, messages) -> None:
        import json
        import os

        total = sum(m.rows for m in messages)
        acc = 0
        for m in messages:
            acc ^= m.checksum
        # write-temp + atomic rename: a concurrent reader never sees a
        # partial manifest, and abort() can clean up WITHOUT being able to
        # destroy a manifest a PREVIOUS successful job committed (the
        # round-3 ADVICE two-phase-commit hole)
        tmp = self._tmp_path()
        with open(tmp, "w") as f:
            json.dump(
                {"rows": total, "checksum": acc, "tasks": len(messages)}, f
            )
        os.replace(tmp, self.path)

    def abort(self, messages) -> None:
        import os

        # remove only this job's temp artifact — never the committed file
        try:
            os.remove(self._tmp_path())
        except FileNotFoundError:
            pass

    def _tmp_path(self) -> str:
        return self.path + ".inprogress"


class ChecksumDataSource(DataSource):
    """`df.write.format("checksum").option("path", p).save()` — an audit
    sink: no data leaves the cluster, the driver commits one manifest with
    the corpus row count and an order/partitioning-invariant checksum.
    The writer-side twin of the sortbench reader for API parity."""

    @classmethod
    def name(cls) -> str:
        return "checksum"

    def writer(self, schema, overwrite: bool) -> _ChecksumWriter:
        return _ChecksumWriter(dict(self.options))


# --- streaming reader: micro-batched generation with replayable offsets ----


class _SortbenchStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch source: offset = {"next_id": k} — rows
    [k, k+rows_per_batch) of the SAME deterministic id->row function the
    batch reader uses, so any (start, end) range replays bit-identically
    (readBetweenOffsets), which is exactly the contract exactly-once
    recovery needs from a source."""

    def __init__(self, options: dict):
        self.case = options.get("case", "mixed-tuple")
        self.n = int(options.get("n", "1000"))
        self.seed = int(options.get("seed", str(DATA_SEED)))
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict):
        lo = int(start["next_id"])
        hi = min(lo + self.rows_per_batch, self.n)
        return self._rows(lo, hi), {"next_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next_id"]), int(end["next_id"]))

    def _rows(self, lo: int, hi: int):
        return iter(
            [_row(self.case, i, self.seed, self.n) for i in range(lo, hi)]
        )

    def commit(self, end: dict) -> None:
        pass  # stateless source: nothing to clean up before `end`
