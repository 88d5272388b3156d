"""Physical-plan locks for the round-3 operator additions — same
contract as test_plans.py: the 100 TB posture (broadcast where small,
equi-join where keyed, map-side where row-local) must be visible in the
plan, so a regression fails here before it fails at scale."""

from __future__ import annotations

from .test_plans import plan_of


def test_temporal_dim_join_is_equi(spark, sf_dir):
    """x13's interval predicate must ride an equi join on user_id —
    never a nested-loop/cartesian pair blowup."""
    plan = plan_of("x13_temporal_dim_join", spark, sf_dir)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan
    assert "Join" in plan  # hash or sort-merge equi join on user_id


def test_cdc_diff_no_cartesian(spark, sf_dir):
    plan = plan_of("x12_cdc_snapshot_diff", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan


def test_zscore_stats_broadcast(spark, sf_dir):
    """dq2's per-group stats table must broadcast back to the fact —
    the fact side must not shuffle for the join."""
    plan = plan_of("dq2_zscore_outliers", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_group_array_sorted_bounded_state(spark, sf_dir):
    """ch_group_array_sorted must keep per-partition window state
    bounded at k rows per group (WindowGroupLimit pushed below the
    exchange), never collect-then-slice."""
    plan = plan_of("ch_group_array_sorted", spark, sf_dir)
    assert "WindowGroupLimit" in plan


def test_qualify_window_group_limit(spark, sf_dir):
    plan = plan_of("sq6_qualify", spark, sf_dir)
    assert "WindowGroupLimit" in plan


def test_top_paths_bounded_prefix(spark, sf_dir):
    plan = plan_of("ch_top_paths", spark, sf_dir)
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_bigram_pmi_no_cartesian_fact_join(spark, sf_dir):
    """l44's dictionary joins may broadcast or shuffle, but nothing in
    the plan may degrade to a row-pair cartesian (the 1-row totals
    join is a broadcast nested loop over ONE row — allowed)."""
    plan = plan_of("l44_bigram_pmi", spark, sf_dir)
    assert "CartesianProduct" not in plan


def test_edit_distance_map_side(spark, sf_dir):
    """f13 is pure row-local work: the plan must contain no exchange
    at all — it rides the scan."""
    plan = plan_of("f13_edit_distance", spark, sf_dir)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_sequence_next_node_no_cartesian(spark, sf_dir):
    plan = plan_of("ch_sequence_next_node", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temperature_mixture_broadcast_rates(spark, sf_dir):
    """l46's rate table join must broadcast (it is O(sources) rows);
    the documents side must not shuffle before the filter."""
    plan = plan_of("l46_temperature_mixture", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned by day joined to a filtered dim must
    plan a dynamicpruning subquery on the partition column — at scale
    this is what keeps a dim-filtered star join from scanning every
    fact partition."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    )
    dest = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(dest)
    fact = spark.read.parquet(dest)
    dim = ev.select("day").distinct().filter(
        F.col("day").between("2024-01-10", "2024-01-11")
    )
    joined = fact.join(dim, "day")
    plan = joined._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower()


def test_existence_flags_single_fact_scan(spark, sf_dir):
    """j17 must scan lineitem ONCE (flag aggregation), not once per
    EXISTS — the whole point of the rewrite."""
    plan = plan_of("j17_existence_flags", spark, sf_dir)
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_session_islands_single_exchange(spark, sf_dir):
    """w12's two window passes share one user_id exchange — Spark must
    not re-shuffle between the lag flag and the running sum."""
    plan = plan_of("w12_session_islands", spark, sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_lttb_distributes_per_series(spark, sf_dir):
    """LTTB runs as grouped-map Pandas over event_type — the plan must
    show the Arrow-batched python exec, not a collect."""
    plan = plan_of("ch_lttb_downsample", spark, sf_dir)
    assert "FlatMapGroupsInPandas" in plan or "MapGroups" in plan


def test_geo_bucket_join_is_equi(spark, sf_dir):
    """j18's ε-distance join must ride the (cx, cy) cell EQUI join —
    the whole point of grid bucketing is that the distance predicate
    never becomes a cartesian/nested-loop pair blowup."""
    plan = plan_of("j18_geo_bucket_join", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_containment_no_cartesian(spark, sf_dir):
    """l71's candidate generation is an inverted-index equi join on
    prefix shingles; nothing may degrade to all-pairs."""
    plan = plan_of("l71_shingle_containment", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_iterations_broadcast(spark, sf_dir):
    """g2's per-iteration joins run over the O(types²) edge matrix —
    each must broadcast (iteration cost independent of the fact
    table), with the single fact-sized window pass building edges."""
    plan = plan_of("g2_pagerank", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_session_running_total_single_hash_exchange(spark, sf_dir):
    """w14 layers three window specs (lag, session numbering, running
    sum) whose partition keys all prefix on user_id — the plan must
    reuse ONE hash exchange for all of them (the final ORDER BY's
    range exchange is presentation, not data movement for compute)."""
    import re

    plan = plan_of("w14_session_running_total", spark, sf_dir)
    # formatted mode lists each Exchange's partitioning on an
    # Arguments: line; window shuffles are hashpartitioning (the final
    # ORDER BY's is rangepartitioning)
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """At real scale a selective dim-filtered fact⋈fact SMJ gets a
    runtime Bloom semi-filter on the probe side (Spark 4's
    runtime.bloomFilter, on by default) — PERF.md leans on this for
    the q3/q10 at-scale story, so lock that the engine's plans are
    eligible: with broadcast off and the scan-size gate lowered (local
    fixtures are far under the 10 GB production threshold), the
    optimizer must inject might_contain on l_orderkey."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    tweaked = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower() or "bloomfilter" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_nested_schema_pruning(spark, sf_dir):
    """s12's scan must read ONLY the touched struct leaves: ReadSchema
    carries meta.n_bytes and meta.source but neither the binary blob
    column nor meta.format."""
    plan = plan_of("s12_nested_pruning", spark, sf_dir)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "n_bytes" in read_schema and "source" in read_schema
    assert "blob" not in read_schema
    assert "format" not in read_schema


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """The AQE alternative to z2's manual salting: with skew-join
    enabled (Spark default) a hot-key SMJ must re-plan as
    SortMergeJoin(skew=true) with an AQEShuffleRead-skewed exchange —
    the runtime split that keeps one hot reducer from serializing the
    stage at scale. Thresholds are lowered to make local fixture sizes
    eligible; production keeps the 256 MB defaults."""
    from pyspark.sql import functions as F

    tweaked = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.sum("v"), F.sum("w"))
        j.collect()  # AQE re-plans at runtime — inspect the FINAL plan
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "skew=true" in plan
        assert "aqeshuffleread skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_leakage_split_no_cartesian(spark, sf_dir):
    """l84's near-dup guard must stay inverted-index shaped: no
    cartesian/NLJ anywhere in the split+quarantine plan."""
    plan = plan_of("l84_leakage_free_split", spark, sf_dir)
    assert "CartesianProduct" not in plan


def test_basket_lift_broadcast_items(spark, sf_dir):
    """q24's item/pair statistics tables are O(parts) — they must
    broadcast onto the pair relation, never shuffle it."""
    plan = plan_of("q24_basket_lift", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_plan_warnings_advisor(spark, sf_dir):
    """plan_warnings flags the canonical anti-patterns and stays quiet
    on a clean star join."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table
    from mkpipe_extractor_clickhouse_spark.plans import plan_warnings

    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # cartesian: cross join with no condition
    warns = plan_warnings(n.crossJoin(r))
    # tiny sides broadcast → NLJ; with broadcast off it is a cartesian.
    # Either way the advisor must flag the pair blowup.
    assert any("cartesian" in w or "nested-loop" in w for w in warns)
    # row-at-a-time Python UDF
    from pyspark.sql.functions import udf

    slow = udf(lambda s: (s or "").upper())
    warns2 = plan_warnings(n.select(slow("n_name").alias("u")))
    assert any("Python UDF" in w for w in warns2)
    # single-partition window
    from pyspark.sql import Window

    w = Window.orderBy("n_nationkey")
    warns3 = plan_warnings(n.select(F.sum("n_regionkey").over(w).alias("c")))
    assert any("single-partition" in w_ for w_ in warns3)
    # clean broadcast star join → no warnings
    clean = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).groupBy(
        "r_name"
    ).count()
    assert plan_warnings(clean) == []


def test_phrase_search_index_join_shape(spark, sf_dir):
    """l91: the adjacency check must be an equi-join on (doc_id, pos)
    keys — never a cartesian/BNLJ — and the per-term posting filters
    must reach below the join (each side scans one term's postings)."""
    plan = plan_of("l91_phrase_search", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_block_equijoin(spark, sf_dir):
    """l2e: pigeonhole candidates come from an equi-join on
    (block_idx, block_value); the popcount verify must not force a
    cartesian fallback."""
    plan = plan_of("l2e_simhash_pairs", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_topk_batch_single_window_exchange(spark, sf_dir):
    """t12 batch form: exactly one hash exchange (the event_type
    window) — the final presentation sort ranges over <= 5*|types|
    rows, not the fact table."""
    plan = plan_of("t12_stream_topk", spark, sf_dir)
    assert plan.count("hashpartitioning(event_type") == 1


def test_polygon_join_blocked_broadcast(spark, sf_dir):
    """j20's candidate generation must be a BROADCAST equi-join on the
    grid cells — the point side streams with no shuffle; a regression
    to all-pairs (nested loop over polygons) fails here before it
    fails at 100 TB."""
    plan = plan_of("j20_polygon_containment_join", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_interval_overlap_join_blocked(spark, sf_dir):
    """j21's pair generation must be an equi-join on the hour bucket
    (bucket-replication blocking) — never a nested-loop over the
    interval theta predicate."""
    plan = plan_of("j21_interval_overlap_join", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_matryoshka_cuts_are_take_ordered(spark, sf_dir):
    """l94's full-corpus shortlist and exact-top-k cuts must compile to
    TakeOrderedAndProject — a global row_number window here would
    single-partition the whole dots relation at scale."""
    plan = plan_of("l94_matryoshka_rerank", spark, sf_dir)
    assert "TakeOrderedAndProject" in plan
