"""Semantic invariants for the round-4 operator suites (dimensional,
time-series, curation).  The driver differential is the primary gate;
these assert the properties a hash match alone would not explain: SCD
range contiguity, skyline dominance, interval-coverage bounds, as-of
nearest optimality vs a brute-force rescan, and PCA normalization."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark import queries as Q

ALL = None


def q(name):
    global ALL
    if ALL is None:
        ALL = Q.all_queries()
    return ALL[name].fn


def test_scd2_versions_contiguous_and_ranges_ordered(spark, sf_dir):
    df = q("scd2_snapshot")(spark, sf_dir)
    bad = (
        df.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("version").alias("vmax"),
            F.sum(F.col("is_current")).alias("n_current"),
            # equal from/to is legal (two changes on one date); > is not
            F.max(F.when(F.col("valid_from") > F.col("valid_to"), 1).otherwise(0)).alias(
                "inverted"
            ),
        )
        .where(
            (F.col("n") != F.col("vmax"))
            | (F.col("n_current") != 1)
            | (F.col("inverted") == 1)
        )
        .count()
    )
    assert bad == 0  # versions 1..n, exactly one current, from < to


def test_cdc_classification_matches_set_algebra(spark, sf_dir):
    df = q("cdc_changelog")(spark, sf_dir).cache()
    # I rows have no old state, D rows no new state, U rows differ somewhere
    assert df.where((F.col("change") == "I") & F.col("old_status").isNotNull()).count() == 0
    assert df.where((F.col("change") == "D") & F.col("new_status").isNotNull()).count() == 0
    u_same = df.where(
        (F.col("change") == "U")
        & (F.col("old_status") == F.col("new_status"))
        & (F.col("old_priority") == F.col("new_priority"))
    ).count()
    assert u_same == 0
    df.unpersist()


def test_skyline_no_point_dominated(spark, sf_dir):
    sky = {
        (r["price"], r["size"])
        for r in q("skyline_pareto")(spark, sf_dir).collect()
    }
    pts = [
        (r["p_retailprice"], r["p_size"])
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p, qq):
        return qq[0] <= p[0] and qq[1] >= p[1] and qq != p

    for s in sky:  # nothing in the skyline is dominated (brute force)
        assert not any(dominated(s, o) for o in pts)
    # and everything off the skyline is dominated by something
    off = [p for p in pts if p not in sky]
    for p in off:
        assert any(dominated(p, o) for o in pts)


def test_interval_coverage_bounds(spark, sf_dir):
    from experiments_datafusion_spark.io import table as _table

    cov = q("interval_coverage")(spark, sf_dir)
    ev = _table(spark, sf_dir, "events")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(sec) - F.min(sec)) + 600).alias("span_ub_s"),
    )
    j = cov.join(per_user, "user_id")
    # coverage is at least one interval (>= 60s) and at most the full span
    bad = j.where(
        (F.col("covered_s") < 60)
        | (F.col("covered_s") > F.col("span_ub_s"))
        | (F.col("n_islands") > F.col("n_events"))
    ).count()
    assert bad == 0


def test_asof_nearest_is_optimal_bruteforce(spark, sf_dir):
    out = q("join_asof_nearest")(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    clicks: dict[int, list[tuple[int, int]]] = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(
                (int(r["ts"].timestamp() * 1_000_000), r["event_id"])
            )
    p_ts = {
        r["event_id"]: int(r["ts"].timestamp() * 1_000_000)
        for r in ev
        if r["event_type"] == "purchase"
    }
    for o in out:
        cand = clicks.get(o["user_id"], [])
        if o["click_id"] is None:
            assert not cand
            continue
        # recompute the true nearest distance in whole seconds
        best_us = min(abs(c[0] - p_ts[o["event_id"]]) for c in cand)
        assert o["delta_s"] == best_us // 1_000_000


def test_pca_output_is_normalized_and_stable(spark, sf_dir):
    rows = q("embedding_pca_power")(spark, sf_dir).collect()
    assert len(rows) == 64
    ymax = max(abs(r["y_u"]) for r in rows)
    assert ymax == 1 << 20  # renormalized: max |component| is exactly 1.0
    again = q("embedding_pca_power")(spark, sf_dir).collect()
    assert [r["y_u"] for r in rows] == [r["y_u"] for r in again]


def test_winnowing_deterministic_and_guarantee(spark, sf_dir):
    a = {
        (r["doc_id"], r["n_fp"], r["fp_xor"])
        for r in q("docs_winnowing")(spark, sf_dir).collect()
    }
    b = {
        (r["doc_id"], r["n_fp"], r["fp_xor"])
        for r in q("docs_winnowing")(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0
    # winnowing's density guarantee: ~2/(w+1) of windows fingerprint, so a
    # doc of n chars yields >= (n - k - w + 2) / (w * something) ... assert
    # the loose lower bound n_fp >= 1 and upper bound n_fp <= n_windows
    lens = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    for doc_id, n_fp, _ in a:
        n_windows = lens[doc_id] - 8 - 4 + 2  # positions with a full window
        assert 1 <= n_fp <= n_windows


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = q("text_bm25")(spark, sf_dir).collect()
    assert rows, "query terms must hit the corpus"
    scores = [r["score_u"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bloom_prefilter_prunes_and_is_sound(spark, sf_dir):
    """The Bloom prefilter must (a) actually prune probe rows hard — the
    sizing rule keeps false positives ~0.5%, so the pass-set tracks the
    true match rate — and (b) never drop a true match (no false
    negatives)."""
    import experiments_datafusion_spark.queries.advanced_joins as AJ
    from experiments_datafusion_spark.io import table as load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.where(F.col("o_orderpriority") == "1-URGENT")
    signed, mbits = AJ._bloom_build(build, "o_orderkey")
    passed = AJ.bloom_filter_probe(li, "l_orderkey", signed, mbits)

    n_total, n_passed = li.count(), passed.count()
    true_matches = li.join(build, li["l_orderkey"] == build["o_orderkey"], "left_semi")
    n_true = true_matches.count()
    # no false negatives: every true match passes
    missed = true_matches.join(
        passed.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).count()
    assert missed == 0
    assert n_true <= n_passed  # pass-set is a superset of matches
    # and it prunes: false-positive overhead under 5% of the non-matches
    assert (n_passed - n_true) <= 0.05 * (n_total - n_true)
