"""IncrementalRollup (sources/rollup.py): state merging, boundary
exactly-once, no-new-data ticks, and snapshot crash recovery."""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from mkpipe_extractor_clickhouse_spark.catalog import load_table
from mkpipe_extractor_clickhouse_spark.sources.rollup import IncrementalRollup


def _full_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return {
        (r["event_type"], str(r["day"])): (r["n"], r["mn"], r["mx"])
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count("*").alias("n"), F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    }


def _view(rollup, spark):
    return {
        (r["event_type"], str(r["day"])): (r["n_events"], r["min_ts"], r["max_ts"])
        for r in rollup.result(spark).collect()
    }


def test_ticks_converge_to_full_recompute(spark, sf_dir, tmp_path):
    rollup = IncrementalRollup(sf_dir, str(tmp_path))
    for cutoff in ["2024-01-10", "2024-01-20", None]:
        sf = (
            F.col("ts") < F.lit(cutoff).cast("timestamp_ntz")
            if cutoff
            else None
        )
        assert rollup.tick(spark, source_filter=sf)
    assert _view(rollup, spark) == _full_recompute(spark, sf_dir)


def test_boundary_redelivery_is_excluded(spark, sf_dir, tmp_path):
    """Re-running a tick with no new source data must be a no-op: the
    >= boundary re-read is fully absorbed by the carried boundary ids
    (an additive state would double-count it)."""
    rollup = IncrementalRollup(sf_dir, str(tmp_path))
    cut = F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")
    assert rollup.tick(spark, source_filter=cut)
    before = _view(rollup, spark)

    state = json.loads(rollup.store.get("events"))
    assert state["boundary_ids"], "committed state must carry boundary ids"

    assert rollup.tick(spark, source_filter=cut) is False  # nothing new
    assert _view(rollup, spark) == before


def test_snapshot_crash_recovery(spark, sf_dir, tmp_path):
    """A crash between moving the snapshot aside and swapping the new
    one in leaves only ``.old`` — the next tick must restore it."""
    rollup = IncrementalRollup(sf_dir, str(tmp_path))
    cut = F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz")
    assert rollup.tick(spark, source_filter=cut)
    before = _view(rollup, spark)

    os.replace(rollup.path, rollup.path + ".old")  # simulated crash point
    assert rollup.tick(spark) is True  # recovers, then applies the rest
    after = _view(rollup, spark)
    assert after == _full_recompute(spark, sf_dir)
    assert set(before) <= set(after)


def test_tick_reads_only_the_new_window(spark, sf_dir, tmp_path):
    """The tick-2 source read must carry the watermark predicate (the
    whole point: O(delta), not O(history))."""
    rollup = IncrementalRollup(sf_dir, str(tmp_path))
    assert rollup.tick(
        spark,
        source_filter=F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz"),
    )
    state = json.loads(rollup.store.get("events"))
    lp = state["last_point"]

    ev = load_table(spark, sf_dir, "events")
    window = ev.filter(F.col("ts") >= F.lit(lp).cast("timestamp_ntz"))
    # The physical scan of the delta is bounded by the boundary filter:
    # every row it reads satisfies ts >= last_point.
    n_window = window.count()
    n_all = ev.count()
    assert n_window < n_all


def test_uniq_merge_rollup_mergeable_and_accurate(spark, sf_dir):
    """The HLL-state rollup (ch_uniq_merge_rollup) must satisfy the
    AggregatingMergeTree contract: merging daily partial states gives
    EXACTLY the same estimate as sketching the month directly (same
    deterministic sketch algorithm), and the estimate tracks the exact
    distinct count within HLL's error envelope."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table
    from mkpipe_extractor_clickhouse_spark.operators.ch_aggregates import (
        ch_uniq_merge_rollup,
    )

    merged = {
        r.event_type: r.uniq_users_est
        for r in ch_uniq_merge_rollup(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert merged == direct  # state-merge == direct sketch, exactly
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) / exact[et] < 0.05  # lgK=12 → ~1.6% rse
