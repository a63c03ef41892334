"""Round-7 operators: BPE merge-rule equivalence + vacuum file semantics."""

from __future__ import annotations

import os

import pytest

from experiments_datafusion_spark.queries import round7 as R7


def _ref_bpe(words: dict[str, int], rounds: int):
    """Independent pure-Python reference BPE: per round, count adjacent
    pairs weighted by word freq, argmax (count desc, pair asc), then the
    textbook greedy LEFT-TO-RIGHT scan merge."""
    symbols = {w: list(w) for w in words}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + words[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, syms in symbols.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges, symbols


def test_bpe_window_rule_equals_greedy_scan(spark):
    """The even-offset-within-run window rule must merge EXACTLY the
    positions the textbook greedy left-to-right scan merges — including
    the adversarial overlap cases (runs of the argmax pair's repeated
    symbol: 'aaaa' -> [aa, aa], 'aaa' -> [aa, a])."""
    corpus = {
        "aaaa": 50, "aaa": 40, "aab": 30, "abab": 20, "baaab": 10,
        "aaaaa": 5, "xy": 3, "a": 2,
    }
    rows = [(w, n) for w, n in corpus.items()]
    wf = spark.createDataFrame(rows, "w string, freq long")
    import pyspark.sql.functions as F

    sym = wf.select(
        "w",
        "freq",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring("w", i, F.lit(1)),
            )
        ).alias("p0", "sym"),
    ).select("w", "freq", (F.col("p0") + 1).alias("pos"), "sym")

    ref_merges, ref_symbols = _ref_bpe(corpus, 3)
    for a, b, cnt in ref_merges:
        cand = R7._bpe_rank_candidates(sym)
        assert cand[0] == (a, b, cnt)
        sym = R7._bpe_apply_batch(sym, [cand[0]])  # batch of 1 == sequential
    got = {}
    for r in sym.orderBy("w", "pos").collect():
        got.setdefault(r.w, []).append(r.sym)
    assert got == ref_symbols


def test_bpe_select_batch_blocking_rule():
    """Blocking rule: accepted iff symbol-disjoint from EVERY higher-ranked
    candidate (not just accepted ones), first `need` accepted win."""
    cand = [
        ("t", "h", 100),  # rank 1: accepted
        ("h", "e", 90),   # shares 'h' with rank 1: blocked
        ("e", "r", 80),   # shares 'e' with rank 2 (even though 2 was blocked): blocked
        ("a", "n", 70),   # disjoint from ALL above: accepted
        ("i", "n", 60),   # shares 'n' with rank 4: blocked
        ("o", "u", 50),   # accepted (3rd)
        ("x", "y", 40),   # would be 4th, but need=3
    ]
    sel = R7._bpe_select_batch(cand, 3)
    assert sel == [("t", "h", 100), ("a", "n", 70), ("o", "u", 50)]
    assert R7._bpe_select_batch(cand, 2) == [("t", "h", 100), ("a", "n", 70)]
    assert R7._bpe_select_batch([], 3) == []


def test_bpe_batched_apply_equals_sequential(spark):
    """A symbol-disjoint batch applied in ONE window pass must produce the
    same symbol table as applying its pairs one at a time (the disjointness
    argument in the round7 module comment)."""
    import pyspark.sql.functions as F

    corpus = {"than": 30, "anthem": 20, "aaaa": 10, "outht": 5, "xyxy": 4}
    rows = [(w, n) for w, n in corpus.items()]
    wf = spark.createDataFrame(rows, "w string, freq long")

    def explode(df):
        return df.select(
            "w",
            "freq",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substring("w", i, F.lit(1)),
                )
            ).alias("p0", "sym"),
        ).select("w", "freq", (F.col("p0") + 1).alias("pos"), "sym")

    batch = [("t", "h", 0), ("a", "n", 0), ("x", "y", 0)]
    batched = R7._bpe_apply_batch(explode(wf), batch)
    seq = explode(wf)
    for p in batch:
        seq = R7._bpe_apply_batch(seq, [p])
    key = lambda df: [(r.w, r.pos, r.sym) for r in df.orderBy("w", "pos").collect()]
    assert key(batched) == key(seq)


def test_bpe_degenerate_corpus_matches_oracle(spark, tmp_path):
    """A corpus with no adjacent pairs (every word one char) must train
    ZERO merges gracefully — no IndexError (VERDICT r8 defect #4) — and
    the Spark output must still equal the DuckDB oracle's (vocab-only
    rows, ranks starting at 1) on the same parquet."""
    import duckdb
    import pandas as pd

    p = tmp_path / "documents.parquet"
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b a", "b c", "a c c"]}
    ).to_parquet(p)
    out = R7.text_bpe_train(spark, str(tmp_path)).toPandas()
    assert list(out["rank"]) and out["right"].isna().all()  # vocab rows only
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    from experiments_datafusion_spark.queries import all_queries

    oracle = all_queries()["text_bpe_train"].oracle
    odf = con.execute(oracle).df()
    s = out.sort_values("rank").reset_index(drop=True)
    o = odf.sort_values("rank").reset_index(drop=True)
    assert list(s["rank"]) == list(o["rank"])
    assert list(s["left"]) == list(o["left"])
    assert list(s["cnt"]) == list(o["cnt"])


def test_vacuum_removes_only_dead_files(spark, tmp_path):
    import pyspark.sql.functions as F

    root = str(tmp_path / "tbl")
    spark.range(10).select(F.col("id").alias("v")).repartition(2).write.parquet(
        f"{root}/v0"
    )
    spark.range(20).select((F.col("id") * 2).alias("v")).repartition(2).write.parquet(
        f"{root}/v1"
    )
    live = {
        os.path.join(f"{root}/v1", f)
        for f in os.listdir(f"{root}/v1")
        if f.endswith(".parquet")
    }
    removed = R7.vacuum_unreferenced(root, live)
    assert removed and all("/v0/" in p for p in removed)
    # live version intact, dead version unreadable
    assert spark.read.parquet(f"{root}/v1").count() == 20
    leftover = [
        f for f in os.listdir(f"{root}/v0") if f.endswith(".parquet")
    ]
    assert leftover == []
    with pytest.raises(Exception):
        spark.read.parquet(f"{root}/v0").collect()


def test_table_vacuum_key_runs(spark, sf_dir):
    out = {r.status: (r.n, r.price_units) for r in R7.table_vacuum(spark, sf_dir).collect()}
    assert out and all(n > 0 for n, _ in out.values())


def test_phash_pairs_beyond_checksum(spark):
    """The perceptual tier's reason to exist: within-family pairs have
    DIFFERENT byte checksums (brightness-shifted pixels) yet small Hamming
    distance; the key's pairs are overwhelmingly same-family; and the
    banding found pairs the checksum dedup cannot."""
    import pyspark.sql.functions as F

    from experiments_datafusion_spark.io import table

    sf = "/root/testdata/sf0.01"
    pairs = R7.mm_phash_pairs(spark, sf).collect()
    assert pairs
    fam = R7._PH_FAMILIES
    same_family = [r for r in pairs if r.x % fam == r.y % fam]
    assert len(same_family) / len(pairs) > 0.95
    # checksums differ within a family whenever the brightness shift does
    media = R7.attach_phash_png_media(table(spark, sf, "documents"))
    sums = {
        r.media_id: r.c
        for r in media.select("media_id", F.md5(F.col("payload").cast("string")).alias("c")).collect()
    }
    shifted = [
        (r.x, r.y) for r in same_family if r.x % 7 != r.y % 7
    ]
    assert shifted, "fixture produced no shifted same-family pairs (vacuous)"
    assert all(sums[x] != sums[y] for x, y in shifted)


def test_wav_fingerprint_pairs_beyond_checksum(spark):
    """Audio twin of the phash claim: same-family pairs dominate, and
    their byte checksums differ whenever the DC offset does."""
    import pyspark.sql.functions as F

    from experiments_datafusion_spark.io import table

    sf = "/root/testdata/sf0.01"
    pairs = R7.mm_wav_fingerprint_pairs(spark, sf).collect()
    assert pairs
    fam = R7._AF_FAMILIES
    same = [r for r in pairs if r.x % fam == r.y % fam]
    assert len(same) / len(pairs) > 0.9
    media = R7.attach_fingerprint_wav_media(table(spark, sf, "documents"))
    sums = {
        r.media_id: r.c
        for r in media.select(
            "media_id", F.md5(F.col("payload").cast("string")).alias("c")
        ).collect()
    }
    shifted = [(r.x, r.y) for r in same if r.x % 7 != r.y % 7]
    assert shifted, "fixture produced no DC-shifted same-family pairs (vacuous)"
    assert all(sums[x] != sums[y] for x, y in shifted)


# ---- snapshot temp-tree cleanup (VERDICT r7 defect #1 / r8 defect #1) --------

_SNAPSHOT_KEYS = {
    # registry key -> (module attr, mkdtemp prefix it must clean up)
    "table_vacuum": ("round7", "table_vacuum", "vacuum_"),
    "table_delete_compliance": ("round7", "table_delete_compliance", "rtbf_"),
    "table_time_travel_multi": ("round6", "table_time_travel_multi", "timetravel_multi_"),
    "source_xml_roundtrip": ("round5", "source_xml_roundtrip", "xml_rt_"),
    "source_avro_roundtrip": ("round5", "source_avro_roundtrip", "avro_rt_"),
    "table_time_travel": ("round5", "table_time_travel", "timetravel_"),
    "compact_small_files": ("extras", "compact_small_files", "compact_sf_"),
    # round-10 snapshot-log keys
    "table_changes": ("round10", "table_changes", "cdf_"),
    "table_changes_apply": ("round10", "table_changes_apply", "cdfapply_"),
    "table_changes_stream": ("round10", "table_changes_stream", "cdfstream_"),
    "scan_pruning_zorder": ("round10", "scan_pruning_zorder", "zprune_"),
}


@pytest.mark.parametrize("key", sorted(_SNAPSHOT_KEYS))
def test_snapshot_keys_remove_their_temp_trees(spark, sf_dir, key):
    """Every mkdtemp-backed snapshot/roundtrip key must leave NO temp tree
    behind once its DataFrame is built (materialize_then_rmtree eagerly
    pins the tiny audit aggregate, then rmtree's the snapshot root) — the
    bench re-runs these every window, so a leak compounds ~a dozen
    orphaned trees per run.  `timetravel_multi_` is checked before
    `timetravel_` would false-positive on it via prefix overlap because
    the glob is exact-prefix on the mkdtemp basename, which embeds a
    random suffix directly after the prefix — both prefixes are asserted
    independently here anyway."""
    import glob
    import importlib
    import tempfile

    mod_name, fn_name, prefix = _SNAPSHOT_KEYS[key]
    mod = importlib.import_module(f"experiments_datafusion_spark.queries.{mod_name}")
    tmp_root = tempfile.gettempdir()
    before = set(glob.glob(os.path.join(tmp_root, f"{prefix}*")))
    df = getattr(mod, fn_name)(spark, sf_dir)
    after = set(glob.glob(os.path.join(tmp_root, f"{prefix}*")))
    leaked = after - before
    assert not leaked, f"{key} leaked temp trees: {sorted(leaked)}"
    # the result must still be fully readable after the tree is gone
    rows = df.collect()
    assert rows, f"{key}: empty result after snapshot cleanup"
