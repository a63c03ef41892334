"""Semantic invariants for the round-4 continuation operators (column
profiling, gaps-and-islands, grid spatial join, token-bucket rate limit,
bitmap activity aggregation, cogrouped map, sparse TF-IDF cosine).  The
driver differential is the primary gate; these assert the properties a
hash match alone would not explain: conservation laws, symmetry, bucket
invariants and threshold algebra."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark import queries as Q

ALL = None


def q(name):
    global ALL
    if ALL is None:
        ALL = Q.all_queries()
    return ALL[name].fn


def test_profile_columns_conservation(spark, sf_dir):
    """Every profiled column reports the same row count; null + distinct
    are each bounded by it; min_s <= max_s under the column's own
    rendering order for the string columns."""
    rows = {r["col_name"]: r for r in q("profile_columns")(spark, sf_dir).collect()}
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice_cents", "o_orderdate", "o_orderpriority",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        assert r["n_distinct"] <= n - r["n_nulls"]
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderstatus"]["min_s"] <= rows["o_orderstatus"]["max_s"]


def test_gap_islands_partition_events_exactly(spark, sf_dir):
    """Islands tile each user's event sequence: island sizes sum to the
    user's event count, ids are dense from 1, and adjacent islands always
    change event_type (maximality)."""
    isl = q("win_gap_islands")(spark, sf_dir).cache()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = {r["user_id"]: r["n"] for r in
                ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["user_id"]: r["s"] for r in
           isl.groupBy("user_id").agg(F.sum("n_events").alias("s")).collect()}
    assert got == per_user
    # dense island ids + no two adjacent islands share a type
    import collections

    by_user = collections.defaultdict(list)
    for r in isl.collect():
        by_user[r["user_id"]].append((r["island"], r["event_type"]))
    for _, islands in by_user.items():
        islands.sort()
        assert [i for i, _ in islands] == list(range(1, len(islands) + 1))
        for (_, t1), (_, t2) in zip(islands, islands[1:]):
            assert t1 != t2, "adjacent islands with the same type are not maximal"
    isl.unpersist()


def test_spatial_grid_matches_bruteforce_and_is_symmetric(spark, sf_dir):
    """The grid-bucketed join must equal the brute-force O(n^2) answer
    (completeness of the 3x3 neighborhood), and the underlying pair
    relation is symmetric, so sum(n_neighbors) is even."""
    res = {r["custkey"]: (r["n_neighbors"], r["min_d2"])
           for r in q("join_spatial_grid")(spark, sf_dir).collect()}
    from experiments_datafusion_spark.operators import text as T

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    key = F.col("c_custkey").cast("string")
    pts = cust.select(
        "c_custkey",
        (T.hash64(F.concat(F.lit("lat:"), key)) % 180000).alias("lat_u"),
        (T.hash64(F.concat(F.lit("lon:"), key)) % 360000).alias("lon_u"),
    ).collect()
    import collections

    brute = collections.defaultdict(lambda: [0, None])
    pl = [(int(r["c_custkey"]), int(r["lat_u"]), int(r["lon_u"])) for r in pts]
    for i, (ka, la, lo) in enumerate(pl):
        for kb, lb, lob in pl:
            if ka == kb:
                continue
            d2 = (la - lb) ** 2 + (lo - lob) ** 2
            if d2 <= 2000 * 2000:
                brute[ka][0] += 1
                brute[ka][1] = d2 if brute[ka][1] is None else min(brute[ka][1], d2)
    assert res == {k: (n, m) for k, (n, m) in brute.items()}
    assert sum(n for n, _ in res.values()) % 2 == 0  # symmetric pair relation


def test_rate_limit_conservation_and_bounds(spark, sf_dir):
    """One output row per event; balances stay in [0, CAP]; a rejection
    only ever happens with a sub-cost balance; per-user accepted count is
    at least 1 (the first event always passes with a full bucket)."""
    from experiments_datafusion_spark.queries.timeseries import _RL_CAP, _RL_COST

    rl = q("ev_rate_limit")(spark, sf_dir).cache()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert rl.count() == ev.count()
    assert rl.where((F.col("tokens_u") < 0) | (F.col("tokens_u") > _RL_CAP)).count() == 0
    # rejected rows keep balance < COST (they were not refilled past it)
    assert rl.where((F.col("accepted") == 0) & (F.col("tokens_u") >= _RL_COST)).count() == 0
    firsts = rl.where(F.col("rn") == 1)
    assert firsts.where(F.col("accepted") != 1).count() == 0
    rl.unpersist()


def test_activity_bitmap_algebra(spark, sf_dir):
    """bit_count(mask) must equal the exact distinct-day count per user,
    and the weekend slice is a subset of the active days."""
    bm = {r["user_id"]: r for r in q("agg_activity_bitmap")(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = {
        r["user_id"]: r["d"]
        for r in ev.groupBy("user_id")
        .agg(F.count_distinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert {u: r["n_active_days"] for u, r in bm.items()} == days
    for r in bm.values():
        assert 0 <= r["n_weekend_days"] <= r["n_active_days"]
        assert r["activity_mask"] > 0
        assert r["activity_mask"] < (1 << 30)  # 30-day fixture range


def test_cogroup_counts_conserve(spark, sf_dir):
    """n_purchases / n_clicks across the cogroup output must sum to the
    corpus totals, and conversions never exceed purchases."""
    cg = q("udf_cogroup")(spark, sf_dir).cache()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tot = {r["event_type"]: r["n"] for r in
           ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    agg = cg.agg(
        F.sum("n_purchases").alias("p"), F.sum("n_clicks").alias("c")
    ).collect()[0]
    assert agg["p"] == tot.get("purchase", 0)
    assert agg["c"] == tot.get("click", 0)
    assert cg.where(F.col("n_converted") > F.col("n_purchases")).count() == 0
    cg.unpersist()


def test_tfidf_cosine_threshold_and_bounds(spark, sf_dir):
    """Reported cosine is in (0, 1 + eps) and respects the 0.5 threshold;
    the exact-integer predicate and the reported rounded value agree."""
    rows = q("docs_tfidf_cosine")(spark, sf_dir).collect()
    assert rows, "fixture corpus has near-dup clusters; expected pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["num"] > 0
        # 6dp rounding can sit a hair above the exact threshold boundary
        assert 0.5 - 1e-6 <= r["cos_r"] <= 1.0 + 1e-6
