"""Invariants for the sequence-packing operator beyond its differential
oracle: conservation (every doc packed exactly once), budget respect
(multi-doc bins never overflow), and per-shard bin contiguity."""

from __future__ import annotations

from collections import defaultdict

from experiments_datafusion_spark.queries import all_queries


def test_pack_sequences_invariants(spark, sf_dir):
    from experiments_datafusion_spark.queries.packing import SEQ_BUDGET

    rows = all_queries()["pack_sequences"].fn(spark, sf_dir).collect()
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        if r["n_docs"] > 1:
            # only a single oversized doc may exceed the budget, alone in its bin
            assert r["seq_tokens"] <= SEQ_BUDGET, r
        assert r["fill_ratio"] > 0

    per_shard = defaultdict(list)
    for r in rows:
        per_shard[r["shard"]].append(r["seq_id"])
    for shard, ids in per_shard.items():
        assert sorted(ids) == list(range(len(ids))), f"shard {shard} bins not contiguous"


def test_zorder_tiles_bound_both_dimensions(spark, sf_dir):
    """The point of z-ordering: every 64x64 tile's min/max extent is tight
    in BOTH dimensions simultaneously (single-column sort only bounds one),
    so footer stats prune scans for either predicate."""
    from experiments_datafusion_spark.queries.packing import layout_zorder

    rows = layout_zorder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["x_max"] - r["x_min"] <= 63
        assert r["y_max"] - r["y_min"] <= 63
