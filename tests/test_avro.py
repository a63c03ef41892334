"""Pure-Python Avro codec + "pyavro" DataSource (the round-5 closure of the
environment-blocked Avro scan).  No independent Avro implementation exists
in this container (no fastavro/avro packages, DuckDB's avro extension can't
download), so spec compliance is pinned two ways: a GOLDEN-BYTES test whose
expected bytes are derived segment-by-segment from the public Avro 1.11
container spec, and hypothesis round-trips over the supported type lattice.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from experiments_datafusion_spark import avro_codec as A

SCHEMA_1LONG = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}


def test_golden_bytes_match_spec(tmp_path):
    """One-row, one-long-field, null-codec container, every byte accounted
    for against the Avro 1.11 spec:

      4f626a01                              magic "Obj" 0x01
      04                                    metadata map count = 2 (zigzag)
      16 "avro.schema"                      key len 11 (zigzag 22=0x16)
      8401 <66 bytes JSON>                  value len 66 (zigzag 132=0x84 0x01)
      14 "avro.codec" 08 "null"             key len 10, value len 4
      00                                    map terminator
      000102...0f                           16-byte sync marker
      02 02 02                              block: count=1, size=1, zigzag(1)
      000102...0f                           trailing sync
    """
    p = str(tmp_path / "g.avro")
    A.write_container(p, SCHEMA_1LONG, [(1,)], codec="null")
    got = open(p, "rb").read()
    sj = json.dumps(SCHEMA_1LONG, separators=(",", ":")).encode()
    assert len(sj) == 66
    expected = (
        b"Obj\x01"
        + b"\x04"
        + b"\x16" + b"avro.schema" + b"\x84\x01" + sj
        + b"\x14" + b"avro.codec" + b"\x08" + b"null"
        + b"\x00"
        + bytes(range(16))
        + b"\x02\x02\x02"
        + bytes(range(16))
    )
    assert got == expected


def test_zigzag_spec_vectors():
    """The spec's published zigzag examples: 0->0, -1->1, 1->2, -2->3,
    2->4... and varint continuation for 64 (0x80 0x01)."""
    assert A._enc_long(0) == b"\x00"
    assert A._enc_long(-1) == b"\x01"
    assert A._enc_long(1) == b"\x02"
    assert A._enc_long(-2) == b"\x03"
    assert A._enc_long(2) == b"\x04"
    assert A._enc_long(64) == b"\x80\x01"
    assert A._enc_long(-64) == b"\x7f"


ROW = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False, width=64),
    st.booleans(),
    st.one_of(st.none(), st.binary(max_size=20)),
)
SCHEMA_FULL = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
    ],
}


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(ROW, max_size=30), codec=st.sampled_from(["null", "deflate"]))
def test_roundtrip_hypothesis(rows, codec, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("avro") / "h.avro")
    n = A.write_container(p, SCHEMA_FULL, rows, codec=codec, rows_per_block=7)
    assert n == len(rows)
    assert list(A.read_container(p)) == rows
    assert A.read_schema(p) == SCHEMA_FULL


def test_nan_roundtrip(tmp_path):
    import math

    p = str(tmp_path / "n.avro")
    A.write_container(p, SCHEMA_FULL, [(0, None, float("nan"), False, None)])
    (row,) = A.read_container(p)
    assert math.isnan(row[2])


def test_null_in_non_nullable_field_rejected(tmp_path):
    with pytest.raises(ValueError, match="non-nullable"):
        A.write_container(
            str(tmp_path / "x.avro"), SCHEMA_1LONG, [(None,)], codec="null"
        )


def test_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "c.avro")
    A.write_container(p, SCHEMA_1LONG, [(1,)], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip a trailing-sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync"):
        list(A.read_container(p))


# ---- DataSource integration ---------------------------------------------------


def test_pyavro_roundtrip_partition_invariant(spark, sf_dir, tmp_path):
    """Write the same table 1-way and 7-way; reads must agree exactly (the
    writer is per-task, the reader per-file — partitioning must be
    invisible), and timestamps must survive the micros mapping."""
    import pyspark.sql.functions as F

    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    for nparts, name in ((1, "one"), (7, "seven")):
        orders.repartition(nparts).write.format("pyavro").mode("append").save(
            str(tmp_path / name)
        )
    read1 = spark.read.format("pyavro").load(str(tmp_path / "one"))
    read7 = spark.read.format("pyavro").load(str(tmp_path / "seven"))
    import os

    assert len(os.listdir(tmp_path / "seven")) == 7

    def norm(df):
        return sorted(
            tuple(str(v) for v in r)
            for r in df.withColumn(
                "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            ).collect()
        )

    batch = norm(orders)
    assert norm(read1) == batch
    assert norm(read7) == batch


def test_pyavro_overwrite_removes_stale_files(spark, tmp_path):
    """mode('overwrite') must not union with pre-existing part files: the
    round-5 advisor found the flag was stored but never honored.  Write 5
    rows 3-way, overwrite with 2 rows 1-way: exactly the 2 rows remain and
    the stale part-*.avro files are gone."""
    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    dst = str(tmp_path / "ow")
    spark.range(5).repartition(3).write.format("pyavro").mode("append").save(dst)
    import os

    assert len([f for f in os.listdir(dst) if f.endswith(".avro")]) == 3
    spark.range(100, 102).coalesce(1).write.format("pyavro").mode(
        "overwrite"
    ).save(dst)
    assert len([f for f in os.listdir(dst) if f.endswith(".avro")]) == 1
    got = sorted(r[0] for r in spark.read.format("pyavro").load(dst).collect())
    assert got == [100, 101]


def test_non_utc_session_timestamp_parity(spark, tmp_path):
    """Round-7 invariant pin (retires the round-5 session-UTC guard and
    its round-6 placement finding): the Python DataSource timestamp
    channel is session-timezone-independent, so a pyavro write under a
    non-UTC session stores the SAME instant parquet does — rendered
    identically in the writing session and again after switching back to
    UTC.  Registration and timestamp-free use never depended on the
    timezone either."""
    import pyspark.sql.functions as F

    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)

    def render(df):
        return [
            r.s
            for r in df.select(
                F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("s")
            ).orderBy("s").collect()
        ]

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        register_sources(spark)  # registration never fails on timezone
        # '12:00' parses as NY-local here -> instant 17:00 UTC
        ts = spark.sql("SELECT CAST('1970-01-01 12:00:00' AS TIMESTAMP) AS t")
        ts.write.format("pyavro").mode("overwrite").save(str(tmp_path / "a"))
        ts.write.mode("overwrite").parquet(str(tmp_path / "p"))
        in_ny = render(spark.read.format("pyavro").load(str(tmp_path / "a")))
        assert in_ny == render(spark.read.parquet(str(tmp_path / "p")))
        assert in_ny == ["1970-01-01 12:00:00"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    in_utc = render(spark.read.format("pyavro").load(str(tmp_path / "a")))
    assert in_utc == render(spark.read.parquet(str(tmp_path / "p")))
    assert in_utc == ["1970-01-01 17:00:00"]  # same instant, UTC rendering
