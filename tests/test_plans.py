"""Physical-plan audits: prove the optimizations we rely on at scale
actually fire — predicate pushdown into the parquet scan, column pruning,
broadcast joins for dimensions, TakeOrderedAndProject for top-k, no Python
UDFs in JVM-only pipelines, partial aggregation before shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.plans.audit import audit
from experiments_datafusion_spark.queries import all_queries

Q = all_queries()


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    df = Q["tpch_q1"].fn(spark, sf_dir)
    p = audit(df)
    assert p.has_pushed_filters  # shipdate filter reaches the scan
    assert p.text.count("HashAggregate") >= 2  # partial + final
    assert not p.has_python_udf
    # codegen membership is only visible in the codegen explain mode under AQE
    from experiments_datafusion_spark.plans.audit import explain_str

    assert "WholeStageCodegen" in explain_str(df, "codegen")


def test_q1_column_pruning(spark, sf_dir):
    p = audit(Q["tpch_q1"].fn(spark, sf_dir))
    (cols,) = p.read_schema_columns()
    # 7 needed columns, not all 11 of lineitem
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q3_broadcasts_dimension(spark, sf_dir):
    p = audit(Q["tpch_q3"].fn(spark, sf_dir))
    assert p.has_broadcast_join
    assert p.has_pushed_filters


def test_q5_broadcasts_all_small_dims(spark, sf_dir):
    p = audit(Q["tpch_q5"].fn(spark, sf_dir))
    assert p.text.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_topk_is_take_ordered(spark, sf_dir):
    p = audit(Q["topk"].fn(spark, sf_dir))
    assert p.has("TakeOrderedAndProject")
    # top-k must NOT globally sort: no range-partitioned exchange
    assert p.n_range_shuffles == 0


def test_semi_join_planned(spark, sf_dir):
    p = audit(Q["join_semi"].fn(spark, sf_dir))
    assert "LeftSemi" in p.text


def test_gather_by_index_no_single_partition_funnel(spark, sf_dir):
    """Regression (round-1 VERDICT scale-killer): the global index must come
    from the parallel two-pass bucket scheme, never a no-partition window
    that funnels the whole table through one task."""
    p = audit(Q["gather_by_index"].fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in p.text
    # the within-bucket rank shuffles on the bucket key (parallel)
    assert p.n_shuffles >= 1


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Co-located bucketed join: both sides pre-bucketed on the join key ->
    the sort-merge join must read buckets directly, with no shuffle."""
    p = audit(Q["join_bucketed"].fn(spark, sf_dir))
    assert "SortMergeJoin" in p.text
    assert p.n_shuffles == 0


def test_embedding_lsh_no_cartesian(spark, sf_dir):
    """The primary embedding-dedup path must be a bucket equi-join, never a
    cross/theta product like the brute-force baseline."""
    p = audit(Q["dedup_embedding_lsh"].fn(spark, sf_dir))
    assert "Cartesian" not in p.text
    assert "BroadcastNestedLoopJoin" not in p.text


def test_scalar_pipeline_is_jvm_only(spark, sf_dir):
    for name in ("scalar_string", "scalar_math", "text_quality", "text_langid"):
        p = audit(Q[name].fn(spark, sf_dir))
        assert not p.has_python_udf, f"{name} fell off the JVM path"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 10).select("o_orderkey")
    p = audit(df)
    assert p.has_pushed_filters
    (cols,) = p.read_schema_columns()
    assert cols == ["o_orderkey"]


def test_minhash_banding_single_pass(spark, sf_dir):
    """Banding reads the signature via ONE posexplode Generate, not a
    BANDS-way union (which would recompute the signature aggregation per
    band). Self-join sides still each carry the subtree pre-AQE; exchange
    reuse dedupes at runtime."""
    p = audit(Q["dedup_minhash_lsh"].fn(spark, sf_dir))
    from experiments_datafusion_spark.operators.dedup import BANDS

    assert p.text.count("Union") == 0
    # signature agg subtrees: at most one per self-join side, never per band
    n_sig_aggs = p.text.count("functions=[min(")
    assert n_sig_aggs <= 4, f"signature aggregation duplicated {n_sig_aggs}x"


def test_broadcast_in_similarity_topk(spark, sf_dir):
    p = audit(Q["sim_topk_bruteforce"].fn(spark, sf_dir))
    assert p.has_broadcast_join  # query side broadcast, corpus never shuffled


def test_q8_dims_broadcast_no_cartesian(spark, sf_dir):
    """Q8's 7-way join: every dimension joins as broadcast-hash at this SF,
    the orderdate filter reaches the orders scan, and nothing degenerates
    to a cartesian/nested-loop product."""
    p = audit(Q["tpch_q8_mktshare"].fn(spark, sf_dir))
    assert p.has_broadcast_join
    assert p.has_pushed_filters
    assert "Cartesian" not in p.text
    assert not p.has_python_udf


def test_q9_like_filter_prunes_part_before_join(spark, sf_dir):
    p = audit(Q["tpch_q9_profit"].fn(spark, sf_dir))
    # contains-LIKE is pushed to the part scan (shows as StringContains)
    assert "StringContains" in p.text
    assert "Cartesian" not in p.text


def test_q11_scalar_threshold_is_broadcast_not_collect(spark, sf_dir):
    """The HAVING threshold joins as a broadcast nested-loop of a 1-row
    aggregate — proving no collect()/driver round-trip in the plan."""
    p = audit(Q["tpch_q11_important_parts"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p.text


def test_q13_outer_join_condition_not_post_filter(spark, sf_dir):
    """The o_orderpriority predicate must live INSIDE the left-outer join
    (as join condition or pushed to the orders side), never as a filter
    above it — a post-join filter would drop null-extended customers."""
    p = audit(Q["tpch_q13_custdist"].fn(spark, sf_dir))
    assert p.has("LeftOuter")
    # two aggregation levels, each planned partial+final
    assert p.text.count("HashAggregate") >= 4


def test_q16_anti_join_and_distinct_agg(spark, sf_dir):
    p = audit(Q["tpch_q16_supplier_cnt"].fn(spark, sf_dir))
    assert "LeftAnti" in p.text
    assert not p.has_python_udf


def test_q21_semi_and_anti_self_joins_are_hash(spark, sf_dir):
    """EXISTS/NOT EXISTS self-joins keep their orderkey equi-key: they must
    plan as hash (or sort-merge) joins with a residual condition, never
    nested-loop over lineitem x lineitem."""
    p = audit(Q["tpch_q21_waiting"].fn(spark, sf_dir))
    assert "LeftSemi" in p.text
    assert "LeftAnti" in p.text
    assert "BroadcastNestedLoopJoin" not in p.text
    assert "Cartesian" not in p.text


def test_formatted_mode_shuffle_counter_sees_exchanges(spark, sf_dir):
    """Regression: formatted explain splits 'Exchange' and its partitioning
    across lines; n_shuffles must still count them (q13 has two agg
    shuffles at minimum when the customer join isn't broadcast)."""
    p = audit(Q["tpch_q13_custdist"].fn(spark, sf_dir))
    assert p.n_shuffles >= 2


def test_split_train_test_prunes_and_partial_aggs(spark, sf_dir):
    """The split is a pure scan-side map: only (doc_id, n_chars) read, one
    partial+final aggregation, no Python anywhere."""
    p = audit(Q["split_train_test"].fn(spark, sf_dir))
    (cols,) = p.read_schema_columns()
    assert set(cols) == {"doc_id", "n_chars"}
    assert p.text.count("HashAggregate") >= 2
    assert not p.has_python_udf


def test_histogram_total_is_broadcast_not_window(spark, sf_dir):
    """The corpus total joins in as a 1-row broadcast — never a global
    window funneling rows through one task."""
    for name in ("docs_length_histogram", "docs_heavy_hitters"):
        p = audit(Q[name].fn(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in p.text, name
        assert "Window" not in p.text, name


def test_anomaly_zscore_stats_broadcast(spark, sf_dir):
    """Per-type stats come back via broadcast-hash join: the events table
    is scanned, never shuffled on event_type for the z-score pass."""
    p = audit(Q["anomaly_zscore"].fn(spark, sf_dir))
    assert p.has_broadcast_join
    assert not p.has_python_udf


def test_fuzzy_levenshtein_is_bucketed_equi_join(spark, sf_dir):
    """Candidate generation must be an equi-join on (lang, length band) —
    bounded-quadratic per bucket — never an all-pairs product."""
    p = audit(Q["dedup_fuzzy_levenshtein"].fn(spark, sf_dir))
    assert "Cartesian" not in p.text
    assert "BroadcastNestedLoopJoin" not in p.text


def test_embedding_quantize_zero_shuffle(spark, sf_dir):
    """Quantization is element-wise: the plan is scan -> project, with no
    exchange and no Python UDF (higher-order functions stay JVM-side)."""
    p = audit(Q["embedding_quantize"].fn(spark, sf_dir))
    assert p.n_shuffles == 0
    assert not p.has_python_udf


def test_pii_redact_is_streaming_map(spark, sf_dir):
    """Redaction never shuffles and reads only the two needed columns."""
    p = audit(Q["text_pii_redact"].fn(spark, sf_dir))
    assert p.n_shuffles == 0
    assert not p.has_python_udf
    (cols,) = p.read_schema_columns()
    assert set(cols) == {"doc_id", "text"}


def test_quality_gate_cutoff_is_broadcast(spark, sf_dir):
    """The p75 cutoff attaches as a 1-row broadcast — no global window, no
    Python, and the scan reads only (lang, text)."""
    p = audit(Q["quality_gate_percentile"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p.text
    assert "Window" not in p.text
    assert not p.has_python_udf
    for cols in p.read_schema_columns():  # one scan per pass (score + cutoff)
        assert set(cols) <= {"lang", "text"}


def test_contamination_join_is_equi_on_shingle(spark, sf_dir):
    """Train-vs-eval overlap must be a shuffled equi-join on the hashed
    shingle (posting lists), never a cartesian of the two doc sets."""
    p = audit(Q["contamination_ngram"].fn(spark, sf_dir))
    assert "Cartesian" not in p.text
    assert not p.has_python_udf


def test_mix_weighted_single_rollup_shuffle(spark, sf_dir):
    """The keep decision is scan-side; the only exchange is the final
    per-source aggregation (partial+final)."""
    p = audit(Q["mix_weighted_sources"].fn(spark, sf_dir))
    assert p.n_shuffles == 1
    assert p.text.count("HashAggregate") >= 2
    assert not p.has_python_udf


def test_run_with_metrics_observes_inline(spark, sf_dir):
    """EXPLAIN ANALYZE analog: runtime row/sum counters ride the main pass
    via Observation, and the captured post-run plan is the AQE-final one."""
    from experiments_datafusion_spark.plans.metrics import run_with_metrics

    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 25)
    agg = li.groupBy("l_returnflag").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    got, plan_text = run_with_metrics(
        agg, {"groups": F.count(F.lit(1)), "qty": F.round(F.sum("q"), 2)}
    )
    assert got["groups"] == agg.count() > 0
    assert got["qty"] > 0
    # AQE only wraps plans containing exchanges; after execution the
    # captured text must be the finalized adaptive plan
    assert "AdaptiveSparkPlan" in plan_text
    assert "isFinalPlan=true" in plan_text

def test_text_repetition_is_distributed_wordcount(spark, sf_dir):
    """Repetition metrics are explode -> keyed hash aggregations (the
    canonical word-count shape) — no cartesian, no Python, and only the
    (doc_id, text) columns are ever read."""
    p = audit(Q["text_repetition"].fn(spark, sf_dir))
    assert "Cartesian" not in p.text
    assert not p.has_python_udf
    assert p.text.count("HashAggregate") >= 4  # partial+final x (words, grams)
    for cols in p.read_schema_columns():
        assert set(cols) == {"doc_id", "text"}


def test_dedup_incremental_is_anti_join(spark, sf_dir):
    """Batch-vs-seen must plan as a LEFT ANTI equi-join on the fingerprint
    plus a min-struct rollup — no window sort, no cartesian, no Python."""
    p = audit(Q["dedup_incremental"].fn(spark, sf_dir))
    assert "LeftAnti" in p.text
    assert "Cartesian" not in p.text
    assert "Window" not in p.text
    assert not p.has_python_udf


def test_mix_temperature_rates_broadcast(spark, sf_dir):
    """The per-source rate table reaches the corpus as a broadcast join;
    the only wide stages are the per-source aggregations."""
    p = audit(Q["mix_temperature"].fn(spark, sf_dir))
    assert p.has_broadcast_join
    assert "Window" not in p.text
    assert not p.has_python_udf


def test_shard_assign_total_is_broadcast(spark, sf_dir):
    """Shard audit = one keyed aggregation; the grand total re-enters as a
    1-row broadcast, never a global window."""
    p = audit(Q["shard_assign"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p.text
    assert "Window" not in p.text
    assert p.text.count("HashAggregate") >= 2
    assert not p.has_python_udf


def test_lang_confusion_single_shuffle(spark, sf_dir):
    """The classifier runs scan-side; the only exchanges are spread()'s
    scan repartition and the final (lang, pred) rollup, and only
    (lang, text) are read."""
    p = audit(Q["lang_confusion"].fn(spark, sf_dir))
    assert p.n_shuffles <= 2
    assert p.text.count("HashAggregate") >= 2
    assert not p.has_python_udf
    (cols,) = p.read_schema_columns()
    assert set(cols) == {"lang", "text"}


def test_topk_per_group_pushes_window_group_limit(spark, sf_dir):
    """Per-group top-k must plan a map-side WindowGroupLimit (rank pushdown,
    SPARK-37099): each partition forwards at most k rows per group to the
    shuffle instead of every row."""
    p = audit(Q["topk_per_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in p.text
    assert not p.has_python_udf


def test_argmax_is_partial_final_aggregate(spark, sf_dir):
    """max_by/min_by ops must be partial+final aggregates (map-side combine
    before the shuffle), not row_number() windows shuffling every row."""
    for name in ("agg_argmax", "dedup_keep_best"):
        p = audit(Q[name].fn(spark, sf_dir))
        assert "Window" not in p.text
        # struct-ordered max_by plans sort-based: two SortAggregates around
        # one hash-partitioned exchange = partial then final
        assert p.text.count("Aggregate") >= 2
        assert not p.has_python_udf


def test_ngram_freq_is_take_ordered(spark, sf_dir):
    """Global bigram top-20 must plan TakeOrderedAndProject (per-partition
    heads), never a full global sort, and stay Python-free."""
    p = audit(Q["docs_ngram_freq"].fn(spark, sf_dir))
    assert p.has("TakeOrderedAndProject")
    assert not p.has_python_udf


def test_sessionize_single_user_shuffle(spark, sf_dir):
    """Lag+cumsum sessionization: no single-partition funnel; the lag and
    running-sum windows and the final rollup share the user_id shuffle."""
    p = audit(Q["win_sessionize"].fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in p.text


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime semi-join reduction: a selective dim filter must inject a
    bloom_filter_agg subquery whose might_contain() prunes the fact scan
    BEFORE the shuffle — the Catalyst runtime filter that cuts shuffled
    fact bytes at 100 TB. Thresholds are production-tuned (10GB scan
    floor), so the test lowers the floor and disables broadcast to expose
    the shuffle-join path at test scale."""
    import pyspark.sql.functions as F

    from experiments_datafusion_spark.io import table as load

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        p = audit(j)
        assert "might_contain" in p.text
        assert "bloom_filter_agg" in p.text
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pq_scan_is_broadcast_hash_joined(spark, sf_dir):
    """sim_topk_pq's two joins (codebook onto subspaces, query ADC tables
    onto codes) must both be broadcast HASH joins — the corpus side is
    never shuffled for a join, and nothing plans as a nested loop.  Both
    small sides are driver-LOCAL relations (one setup collect; see
    topk_pq's docstring for why literal-fusing them instead is an
    anti-pattern), so no setup scan subtrees appear either."""
    p = audit(Q["sim_topk_pq"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p.text
    assert "BroadcastNestedLoopJoin" not in p.text
    assert "CartesianProduct" not in p.text
    # formatted explain lists every node twice (tree + details): one
    # corpus scan == 2 occurrences; any setup scan subtree would add more
    assert p.text.count("Scan parquet") <= 2


def test_zorder_is_single_aggregate_pass(spark, sf_dir):
    """layout_zorder = scan -> partial agg -> one shuffle -> final agg.
    More than one shuffle would mean the bit-interleave expression fell
    out of the aggregate pushdown."""
    p = audit(Q["layout_zorder"].fn(spark, sf_dir))
    assert p.n_shuffles == 1
    assert "HashAggregate" in p.text


def test_dup_spans_has_no_python_and_two_agg_shuffles(spark, sf_dir):
    """text_dup_spans is pure JVM (codegen'd substr/md5 after exploding
    positions): no Python evaluators; shuffles only for distinct, the
    posting-list aggregate, the join, and the per-doc aggregate."""
    p = audit(Q["text_dup_spans"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in p.text
    assert "ArrowEvalPython" not in p.text
    assert "Generate" in p.text  # the posexplode of window positions


def test_bollinger_single_exchange_constant_frame(spark, sf_dir):
    """ts_bollinger: ONE hash exchange (the event_type window shuffle) and
    no SinglePartition funnel — the constant-width ROWS frame runs inside
    the per-type partition."""
    p = audit(Q["ts_bollinger"].fn(spark, sf_dir))
    assert p.n_shuffles == 1
    assert "SinglePartition" not in p.text
    assert not p.has_python_udf


def test_heavy_hitters_candidates_are_broadcast(spark, sf_dir):
    """heavy_hitters_sketch: the MG candidate set joins back as a
    BROADCAST semi-join (pass 2 never shuffles the corpus on term), and
    the only Python in the plan is the Arrow-batched MG pass."""
    p = audit(Q["heavy_hitters_sketch"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p.text and "LeftSemi" in p.text
    assert "MapInPandas" in p.text
    assert "CartesianProduct" not in p.text


def test_cohort_ltv_no_single_partition_funnel(spark, sf_dir):
    """cohort_ltv: first-order month + join back + matrix aggregate — all
    hash exchanges, nothing funnels to one partition."""
    p = audit(Q["cohort_ltv"].fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in p.text
    assert not p.has_python_udf


def test_top_paths_take_ordered(spark, sf_dir):
    """ev_top_paths: the global top-20 plans as TakeOrderedAndProject
    (per-partition heads), never a full sort."""
    p = audit(Q["ev_top_paths"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p.text


def test_observe_metrics_match_aggregate(spark, sf_dir):
    """df.observe(): accumulator-style plan metrics collected DURING the
    main job — the zero-extra-pass way to audit row counts / sums in a
    100 TB pipeline (a separate .agg() would re-scan).  Values must equal
    the standalone aggregate."""
    from pyspark.sql import Observation

    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 30)
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("units"),
    )
    observed.write.format("noop").mode("overwrite").save()
    want = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("units"),
    ).collect()[0]
    got = obs.get
    assert got["n"] == want["n"] and got["units"] == want["units"]


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the runtime answer to hot keys at 100 TB:
    a reducer partition past threshold x factor*median is split into
    mapper-range slices, each joined against the (replicated) other side.
    Build a 90%-one-key join, force SMJ, and assert the final adaptive
    plan carries the skewed AQEShuffleRead."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(2_000_000).select(
            F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 2_000_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
