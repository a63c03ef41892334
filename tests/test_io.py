"""Source/sink coverage (SURVEY.md §2B Scans/Sinks rows): parquet/CSV/JSON
round-trips preserve data; partitioned writes produce prunable layouts;
bucketed tables let equi-joins skip the shuffle entirely."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark import io
from experiments_datafusion_spark.plans.audit import audit


def _rows(df, key):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = io.table(spark, sf_dir, "nation")
    io.write_parquet(src, str(tmp_path / "nation_pq"))
    back = io.read_parquet(spark, str(tmp_path / "nation_pq"))
    assert _rows(back, "n_nationkey") == _rows(src, "n_nationkey")


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = io.table(spark, sf_dir, "region")
    io.write_csv(src, str(tmp_path / "region_csv"))
    back = io.read_csv(spark, str(tmp_path / "region_csv"), schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back, "r_regionkey") == _rows(src, "r_regionkey")


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = io.table(spark, sf_dir, "supplier")
    io.write_json(src, str(tmp_path / "supp_json"))
    back = io.read_json(spark, str(tmp_path / "supp_json"), schema=src.schema)
    assert _rows(back, "s_suppkey") == _rows(src, "s_suppkey")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column must
    prune directories (PartitionFilters), not scan everything."""
    src = io.table(spark, sf_dir, "customer")
    io.write_parquet(src, str(tmp_path / "cust_part"), partition_by=["c_mktsegment"])
    back = io.read_parquet(spark, str(tmp_path / "cust_part")).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    p = audit(back)
    assert "PartitionFilters: [" in p.text
    assert "isnotnull(c_mktsegment" in p.text or "c_mktsegment" in p.text.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    expected = src.where(F.col("c_mktsegment") == "BUILDING").count()
    assert back.count() == expected


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate join keys at write time — the join plan
    must contain NO shuffle exchanges (the 100 TB co-located join path)."""
    orders = io.table(spark, sf_dir, "orders")
    lineitem = io.table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    ob = spark.table("orders_bucketed")
    lb = spark.table("lineitem_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_linenumber"
        )
        p = audit(joined)
        assert p.n_shuffles == 0, f"bucketed join still shuffles:\n{p.text[:800]}"
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_noop_sink_runs(spark, sf_dir):
    io.write_noop(io.table(spark, sf_dir, "region"))


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = io.table(spark, sf_dir, "customer")
    io.write_orc(src, str(tmp_path / "cust_orc"))
    back = io.read_orc(spark, str(tmp_path / "cust_orc"))
    assert _rows(back, "c_custkey") == _rows(src, "c_custkey")


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    src = io.table(spark, sf_dir, "orders")
    io.write_orc(src, str(tmp_path / "orders_orc"))
    df = io.read_orc(spark, str(tmp_path / "orders_orc")).where(
        F.col("o_orderkey") < 100
    ).select("o_orderkey")
    p = audit(df)
    assert p.has_pushed_filters


def test_text_source_reads_lines(spark, tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text("alpha\nbeta\ngamma\n")
    df = io.read_text(spark, str(f))
    assert df.columns == ["value"]
    assert df.count() == 3


def test_avro_roundtrip_via_python_fallback(spark, sf_dir, tmp_path):
    """io.read_avro: the JVM connector is absent here, so the call routes
    to the pure-Python pyavro DataSource — and must round-trip exactly
    (round 5 closed the former NotImplementedError gate)."""
    orders = io.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    io.write_avro(orders, str(tmp_path / "av"))
    back = io.read_avro(spark, str(tmp_path / "av"))
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b and len(a) > 0


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Dynamic partition pruning (the 100 TB fact-dim pattern): a filter on
    the DIMENSION side must prune FACT partitions at runtime via a reused
    broadcast subquery — the fact scan carries a dynamicpruning expression
    instead of reading every partition."""
    orders = io.table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    io.write_parquet(orders, str(tmp_path / "orders_by_year"), partition_by=["o_year"])
    fact = io.read_parquet(spark, str(tmp_path / "orders_by_year"))
    dim = (
        spark.range(1992, 1999)
        .select(F.col("id").cast("int").alias("o_year"))
        .where(F.col("id") % 7 == 0)  # non-foldable dim filter -> DPP, not static
    )
    joined = fact.join(dim, "o_year")
    p = audit(joined)
    assert "dynamicpruning" in p.text.lower()
    expected = orders.where(F.year("o_orderdate") % 7 == 0).count()
    assert joined.count() == expected


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from pathlib import Path

    from experiments_datafusion_spark.io import compact_parquet

    src = tmp_path / "fragmented"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(64).write.mode("overwrite").parquet(str(src))
    n_before = len(list(Path(src).rglob("*.parquet")))
    assert n_before >= 64

    dst = tmp_path / "compacted"
    compact_parquet(spark, str(src), str(dst), target_file_bytes=8 * 1024 * 1024)
    n_after = len(list(Path(dst).rglob("*.parquet")))
    assert n_after < n_before / 4
    # row-preserving
    assert spark.read.parquet(str(dst)).count() == li.count()


def test_python_datasource_matches_jvm_generator(spark):
    """sources/sortbench_source.py must emit EXACTLY the rows of
    generators.generate_batch(..., portable=True) for every case — the
    same (id, seed) hash streams through two independent implementations
    (pure-Python hashlib vs JVM md5 expressions)."""
    from experiments_datafusion_spark import generators
    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    for case in generators.CASES:
        ds = (
            spark.read.format("sortbench")
            .option("case", case)
            .option("n", "300")
            .option("partitions", "5")
            .load()
            .collect()
        )
        jvm = generators.generate_batch(spark, case, 300, portable=True).collect()
        assert sorted(map(tuple, ds)) == sorted(map(tuple, jvm)), case


def test_python_datasource_partition_invariant(spark):
    """Output is a pure function of (case, n, seed): re-reading with a
    different partition count yields the identical multiset (each
    InputPartition owns an id range; no per-partition state)."""
    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)

    def rows(parts):
        return sorted(
            map(
                tuple,
                spark.read.format("sortbench")
                .option("case", "utf8-tuple")
                .option("n", "257")
                .option("partitions", str(parts))
                .load()
                .collect(),
            )
        )

    assert rows(1) == rows(7) == rows(32)


def test_checksum_sink_commit_protocol(spark, sf_dir, tmp_path):
    """The writer half of the Python DataSource API: per-task
    (count, xor-checksum) commit messages, one driver-side manifest.
    The checksum is order- and partitioning-invariant, so rewriting the
    same data at a different parallelism commits the identical manifest."""
    import json

    from experiments_datafusion_spark.io import table
    from experiments_datafusion_spark.sources import register_sources

    register_sources(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    p1, p2 = tmp_path / "m1.json", tmp_path / "m2.json"
    docs.repartition(3).write.format("checksum").mode("overwrite").option(
        "path", str(p1)
    ).save()
    docs.repartition(11).write.format("checksum").mode("overwrite").option(
        "path", str(p2)
    ).save()
    m1, m2 = json.loads(p1.read_text()), json.loads(p2.read_text())
    assert m1["rows"] == docs.count()
    assert (m1["rows"], m1["checksum"]) == (m2["rows"], m2["checksum"])
    assert m1["tasks"] == 3 and m2["tasks"] == 11


def test_csv_malformed_modes(spark, tmp_path):
    """CSV corruption contract — the ingestion reality at 100 TB: PERMISSIVE
    keeps bad rows (nulls + _corrupt_record), DROPMALFORMED silently drops
    them, FAILFAST raises.  All three modes against the same dirty file."""
    import pytest as _pytest

    p = tmp_path / "dirty.csv"
    p.write_text("1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\nbroken\n")
    schema = "id INT, name STRING, score DOUBLE, _corrupt_record STRING"

    perm = spark.read.schema(schema).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).csv(str(p)).cache()
    assert perm.count() == 4
    bad = perm.where(F.col("_corrupt_record").isNotNull()).collect()
    assert {r["_corrupt_record"] for r in bad} == {"2,beta,not_a_number", "broken"}
    perm.unpersist()

    dropped = spark.read.schema("id INT, name STRING, score DOUBLE").option(
        "mode", "DROPMALFORMED"
    ).csv(str(p))
    assert [r["id"] for r in dropped.collect()] == [1, 3]

    with _pytest.raises(Exception):
        spark.read.schema("id INT, name STRING, score DOUBLE").option(
            "mode", "FAILFAST"
        ).csv(str(p)).collect()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution via mergeSchema: old files lack a column added
    later; the merged read surfaces it as NULL for old rows — the additive
    evolution contract a long-lived 100 TB table depends on."""
    old = spark.range(3).select(F.col("id"), F.lit("old").alias("tag"))
    new = spark.range(3, 6).select(
        F.col("id"), F.lit("new").alias("tag"), (F.col("id") * 10).alias("score")
    )
    old.write.mode("overwrite").parquet(str(tmp_path / "t" / "p=1"))
    new.write.mode("overwrite").parquet(str(tmp_path / "t" / "p=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "tag", "score", "p"}
    rows = {r["id"]: (r["tag"], r["score"]) for r in merged.collect()}
    assert rows[0] == ("old", None) and rows[5] == ("new", 50)


def test_schema_memo_matches_inference(spark, sf_dir):
    """The round-14 catalog-style schema memo must be invisible: the
    memoized read path returns the SAME schema the footer inference
    returns (metadata only — the scan itself always reads the parquet)."""
    path = f"{sf_dir}/documents.parquet"
    io._SCHEMA_MEMO.pop(path, None)
    first = io.table(spark, sf_dir, "documents")  # real inference, memoizes
    assert path in io._SCHEMA_MEMO
    second = io.table(spark, sf_dir, "documents")  # memo path
    assert second.schema == first.schema == spark.read.parquet(path).schema
    assert second.count() == first.count()


def test_schema_memo_events_ts_fixup_survives(spark, sf_dir):
    """events.ts takes the conditional nanos->micros fixup branch in
    table() (whenever the footer yields bigint under nanosAsLong); the
    memoized read must land in the SAME branch as the inferring read —
    identical dtype and identical min/max values, whichever branch the
    fixture's physical type selects."""
    path = f"{sf_dir}/events.parquet"
    io._SCHEMA_MEMO.pop(path, None)
    first = io.table(spark, sf_dir, "events")
    second = io.table(spark, sf_dir, "events")
    assert dict(first.dtypes)["ts"] == dict(second.dtypes)["ts"]
    a = first.agg(F.min("ts"), F.max("ts")).collect()[0]
    b = second.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert a == b
