"""Spark 4 Python DataSource for Avro container files (format "pyavro") —
the offline closure of the one environment-blocked scan format (io.py's
read_avro: the spark-avro JVM jar cannot be fetched here).  Built on the
pure-Python codec in experiments_datafusion_spark/avro_codec.py.

  spark.read.format("pyavro").load(dir_or_file)        # schema from header
  df.write.format("pyavro").mode(...).save(dir)        # one file per task

Scale shape: the reader emits one InputPartition per *.avro file (the same
file-parallelism the JVM reader starts from; Avro's sync markers would
allow intra-file block splits — documented, not needed at these sizes), so
a 1000-executor cluster decodes 1000 files concurrently with zero
coordination.  The writer encodes each task's rows into its own container
file (task outputs land under temporary names and are renamed into place
per-task; the job-level manifest-commit pattern lives in the checksum sink
next door).  On a real cluster with network access PREFER the JVM
spark-avro connector (vectorized, codec-complete); this source is the
dependency-free fallback and the test vehicle for the format.

Type mapping (both directions): long<->bigint, int<->int, double<->double,
float<->float, boolean<->boolean, string<->string, bytes<->binary, and the
long logicalType timestamp-micros <-> TimestampType (microseconds, UTC).
Readers surface every field nullable (Spark convention); writers emit
["null", T] unions.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_AVRO_TO_DDL = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}


# TIMESTAMP TIMEZONE INVARIANT (settled round 7, retiring the round-5
# session-UTC guard and its round-6 placement finding): Spark 4's Python
# DataSource channel exchanges TimestampType as naive datetimes in a FIXED
# UTC-micros convention, independent of BOTH spark.sql.session.timeZone and
# the OS/process timezone — verified empirically against parquet as ground
# truth for every combination (session UTC/NY x process TZ UTC/NY): the
# stored instant always equals parquet's and session-tz rendering shifts
# identically for both formats.  The codec's mapping (writer:
# naive.replace(tzinfo=utc) -> micros; reader: the exact inverse) matches
# that convention, so NO timezone guard is needed anywhere: non-UTC
# sessions read and write pyavro timestamps correctly.
# tests/test_avro.py::test_non_utc_session_timestamp_parity pins the
# session-tz half of the claim.


def _list_avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith((".", "_"))
    )


def _ddl_from_avro(schema: dict) -> str:
    from experiments_datafusion_spark.avro_codec import _field_type

    cols = []
    for f in schema["fields"]:
        _, typ = _field_type(f["type"])
        t = f["type"]
        logical = None
        if isinstance(t, dict):
            logical = t.get("logicalType")
        elif isinstance(t, list):
            for x in t:
                if isinstance(x, dict):
                    logical = x.get("logicalType")
        ddl = "timestamp" if logical == "timestamp-micros" else _AVRO_TO_DDL[typ]
        cols.append(f"{f['name']} {ddl}")
    return ", ".join(cols)


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _PyAvroReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro reader needs .load(<dir-or-file>)")

    def partitions(self):
        files = _list_avro_files(self.path)
        if not files:
            raise ValueError(f"no *.avro files under {self.path}")
        return [_AvroFilePartition(p) for p in files]

    def read(self, partition: _AvroFilePartition):
        import datetime

        from experiments_datafusion_spark.avro_codec import (
            _field_type,
            read_container,
            read_schema,
        )

        schema = read_schema(partition.path)
        ts_idx = set()
        for i, f in enumerate(schema["fields"]):
            t = f["type"]
            entries = t if isinstance(t, list) else [t]
            for x in entries:
                if isinstance(x, dict) and x.get("logicalType") == "timestamp-micros":
                    ts_idx.add(i)
        _ = _field_type  # imported for parity with writer-side checks
        for row in read_container(partition.path):
            if ts_idx:
                row = tuple(
                    datetime.datetime.fromtimestamp(
                        v / 1_000_000, tz=datetime.timezone.utc
                    ).replace(tzinfo=None)
                    if i in ts_idx and v is not None
                    else v
                    for i, v in enumerate(row)
                )
            yield row


class _AvroCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class _PyAvroWriter(DataSourceWriter):
    def __init__(self, options: dict, spark_schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro writer needs .save(<dir>)")
        self.overwrite = overwrite
        self.avro_schema = _avro_schema_from_spark(spark_schema)
        self.ts_fields = [
            i
            for i, f in enumerate(spark_schema.fields)
            if f.dataType.typeName() in ("timestamp", "timestamp_ntz")
        ]

    def write(self, rows) -> _AvroCommit:
        import uuid

        from pyspark import TaskContext

        from experiments_datafusion_spark.avro_codec import write_container

        os.makedirs(self.path, exist_ok=True)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.avro"
        tmp = os.path.join(self.path, "." + name + ".inprogress")
        final = os.path.join(self.path, name)

        def gen():
            import datetime

            for row in rows:
                t = tuple(row)
                if self.ts_fields:
                    t = tuple(
                        int(
                            v.replace(tzinfo=datetime.timezone.utc).timestamp()
                            * 1_000_000
                        )
                        if i in self.ts_fields and v is not None
                        else v
                        for i, v in enumerate(t)
                    )
                yield t

        n = write_container(tmp, self.avro_schema, gen(), codec="deflate")
        os.replace(tmp, final)  # task-level atomic publish
        return _AvroCommit(final, n)

    def commit(self, messages) -> None:
        # Task outputs are already atomically in place (os.replace above).
        # Overwrite semantics are finalized here on the driver: any
        # pre-existing *.avro not produced by THIS job is removed, so
        # mode('overwrite') cannot silently union old and new data
        # (round-5 advisor finding: the flag was stored but never acted on).
        if self.overwrite:
            keep = {
                os.path.basename(m.path) for m in messages or [] if m is not None
            }
            for name in os.listdir(self.path):
                if name.endswith(".avro") and name not in keep:
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None:
                try:
                    os.remove(m.path)
                except FileNotFoundError:
                    pass


_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "binary": "bytes",
}


def _avro_schema_from_spark(spark_schema) -> dict:
    fields = []
    for f in spark_schema.fields:
        tn = f.dataType.typeName()
        if tn in ("timestamp", "timestamp_ntz"):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif tn in _SPARK_TO_AVRO:
            base = _SPARK_TO_AVRO[tn]
        else:
            raise NotImplementedError(f"pyavro writer: unsupported type {tn}")
        fields.append({"name": f.name, "type": ["null", base]})
    return {"type": "record", "name": "row", "fields": fields}


class PyAvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> str:
        from experiments_datafusion_spark.avro_codec import read_schema

        files = _list_avro_files(self.options.get("path", ""))
        if not files:
            raise ValueError("pyavro: no *.avro files to infer a schema from")
        return _ddl_from_avro(read_schema(files[0]))

    def reader(self, schema) -> _PyAvroReader:
        return _PyAvroReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> _PyAvroWriter:
        return _PyAvroWriter(dict(self.options), schema, overwrite)
