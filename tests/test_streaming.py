"""Batch↔stream parity (SURVEY §5.3): replay events through Structured
Streaming with Trigger.AvailableNow and assert the final stateful
result equals the batch computation — the implicit invariant of the
reference's incremental loop (reference __init__.py:71-115)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.catalog import load_table
from mkpipe_extractor_clickhouse_spark.streaming import runtime


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_stage")
    return runtime.stage_event_chunks(spark, sf_dir, str(d), n_chunks=5)


def test_tumbling_stream_matches_batch(spark, sf_dir, staged, tmp_path):
    stream = runtime.read_event_stream(spark, staged)
    agg = runtime.tumbling_counts(stream)
    runtime.run_available_now(
        agg, "tumbling_out", "complete", str(tmp_path / "ckpt")
    )
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
        .collect()
    )
    want = {(r.ws, r.event_type): r.n for r in batch}
    assert got == want


def test_stream_dedup_subset_of_batch(spark, sf_dir, staged, tmp_path):
    stream = runtime.read_event_stream(spark, staged)
    dedup = runtime.keyed_dedup(stream)
    runtime.run_available_now(dedup, "dedup_out", "append", str(tmp_path / "ckpt"))
    out = spark.sql("SELECT user_id, event_type FROM dedup_out").collect()
    keys = [(r.user_id, r.event_type) for r in out]
    batch_keys = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    # within-watermark dedup: every batch key appears, possibly more
    # than once across far-apart watermark epochs — but never within one
    assert set(keys) == batch_keys


def test_foreachbatch_incremental_sink(spark, sf_dir, staged, tmp_path):
    stream = runtime.read_event_stream(spark, staged)
    dest = str(tmp_path / "dest")
    os.makedirs(dest, exist_ok=True)
    runtime.incremental_sink(spark, stream, dest, str(tmp_path / "ckpt"))
    got = spark.read.parquet(os.path.join(dest, "events.parquet"))
    full = load_table(spark, sf_dir, "events")
    assert got.count() == full.count()
    assert got.select(F.max("event_id")).first()[0] == full.select(
        F.max("event_id")
    ).first()[0]
    # state committed to the shared watermark store
    from mkpipe_extractor_clickhouse_spark.sources.state import WatermarkStore

    wm = WatermarkStore(os.path.join(dest, "state.json")).get("events")
    assert wm is not None
    assert str(full.agg(F.max("ts")).first()[0]) == wm


def test_stateful_user_profiles_matches_batch(spark, sf_dir, staged, tmp_path):
    """applyInPandasWithState profile accumulated over 5 micro-batches
    must equal the batch aggregation (last emitted row per user)."""
    from mkpipe_extractor_clickhouse_spark.streaming.stateful import user_profiles

    stream = runtime.read_event_stream(spark, staged)
    prof = user_profiles(stream)
    runtime.run_available_now(prof, "profiles_out", "update", str(tmp_path / "ckpt"))
    # update mode appends a row per touched user per batch → keep the
    # final row per user (max n_events)
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value, last_event_id FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM profiles_out
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value, r.last_event_id) for r in out}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000.0)
            .cast("double")
            .alias("tv"),
            F.max("event_id").alias("last"),
        )
        .collect()
    )
    want = {r.user_id: (r.n, r.tv, r.last) for r in batch}
    assert got == want


def test_sliding_stream_matches_batch(spark, sf_dir, staged, tmp_path):
    stream = runtime.read_event_stream(spark, staged)
    agg = runtime.sliding_counts(stream)
    runtime.run_available_now(agg, "sliding_out", "complete", str(tmp_path / "ckpt"))
    got = {
        (r.window_start, r.n) for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
        .collect()
    )
    assert got == {(r.ws, r.n) for r in batch}


def test_session_stream_matches_batch(spark, sf_dir, staged, tmp_path):
    stream = runtime.read_event_stream(spark, staged)
    agg = runtime.session_counts(stream)
    runtime.run_available_now(agg, "session_out", "complete", str(tmp_path / "ckpt"))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "n_events",
        )
        .collect()
    )
    assert got == {(r.user_id, r.ss, r.se, r.n_events) for r in batch}


def test_late_data_dropped_in_append_mode(spark, tmp_path):
    """T6: a row arriving below the advanced watermark is excluded from
    its (already finalized) window in append mode — the streaming
    analogue of the reference losing rows below last_point
    (reference __init__.py:88-91), made explicit and bounded."""
    import os

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    rows1 = [(i, f"2024-01-01 10:{i:02d}:00", 1, "click", 1.0, "{}") for i in range(5)]
    rows2 = [(100, "2024-01-01 23:00:00", 1, "click", 1.0, "{}")]  # advances watermark
    # watermark propagation lags one batch: the advance from rows2 is
    # effective for filtering only in the batch after rows2b
    rows2b = [(101, "2024-01-01 23:30:00", 1, "click", 1.0, "{}")]
    rows3 = [(200, "2024-01-01 10:30:00", 1, "click", 1.0, "{}")]  # late by ~12h
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_s", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    for i, rows in enumerate([rows1, rows2, rows2b, rows3]):
        (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
            .drop("ts_s")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(stage, f"chunk_{i:03d}"))
        )
    stream = runtime.read_event_stream(spark, stage)
    agg = runtime.tumbling_counts(stream, watermark="1 hour")
    runtime.run_available_now(agg, "late_out", "append", str(tmp_path / "ckpt"))
    out = {
        (str(r.window_start), r.n)
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the 10:00 window was finalized with 5 rows when the watermark
    # passed 22:00; the late event_id=200 row must NOT appear as a 6th
    assert ("2024-01-01 10:00:00", 5) in out
    assert ("2024-01-01 10:00:00", 6) not in out


def test_transform_with_state_matches_batch(spark, sf_dir, staged, tmp_path):
    """Spark 4 transformWithState API: same per-user profile as the
    applyInPandasWithState operator, RocksDB-backed typed state.

    The transformWithState driver worker imports google.protobuf;
    skipped where protobuf is unusable (this container ships a broken
    install and adding packages is out of scope)."""
    pytest.importorskip("google.protobuf.descriptor")
    from mkpipe_extractor_clickhouse_spark.streaming import stateful

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", stateful.ROCKSDB_PROVIDER
    )
    try:
        stream = runtime.read_event_stream(spark, staged)
        prof = stateful.user_profiles_tws(stream)
        runtime.run_available_now(prof, "tws_out", "update", str(tmp_path / "ckpt"))
        out = spark.sql(
            """
            SELECT user_id, n_events, total_value, last_event_id FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM tws_out
            ) WHERE rn = 1
            """
        ).collect()
        got = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_event_id) for r in out}
        batch = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                (F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000.0)
                .cast("double")
                .alias("tv"),
                F.max("event_id").alias("last"),
            )
            .collect()
        )
        want = {r.user_id: (r.n, round(r.tv, 6), r.last) for r in batch}
        assert got == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            # get(key, None) returns None on an untouched session — the
            # conf must be UNSET or it leaks into every later test
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_foreachbatch_checkpoint_recovery_idempotent(spark, sf_dir, staged, tmp_path):
    """Re-running the incremental sink against the SAME checkpoint with
    no new files must not duplicate rows — the crash-recovery contract
    of foreachBatch + idempotent append (SURVEY §3.5 'state commit
    atomic with the append')."""
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(dest, exist_ok=True)
    for _ in range(2):  # second run = restart from checkpoint
        stream = runtime.read_event_stream(spark, staged)
        runtime.incremental_sink(spark, stream, dest, ckpt)
    got = spark.read.parquet(os.path.join(dest, "events.parquet"))
    full = load_table(spark, sf_dir, "events")
    assert got.count() == full.count()
    assert got.select("event_id").distinct().count() == full.count()


def test_stream_static_join_matches_batch(spark, sf_dir, staged, tmp_path):
    """Stream-static dimension enrichment must converge to the batch
    join result (complete output mode over AvailableNow replay)."""
    stream = runtime.read_event_stream(spark, staged)
    enriched = runtime.enriched_stream(spark, stream, sf_dir)
    runtime.run_available_now(
        enriched, "enriched_out", "complete", str(tmp_path / "ckpt")
    )
    got = {
        (r.event_type, r.c_mktsegment): r.n
        for r in spark.sql("SELECT * FROM enriched_out").collect()
    }
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(c, ev.user_id == c.c_custkey, "left")
        .groupBy("event_type", "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == {(r.event_type, r.c_mktsegment): r.n for r in batch}


def test_transform_with_state_plan_validates_without_protobuf(spark, staged):
    """Analysis-level validation of the transformWithState operator —
    runs everywhere, including containers whose protobuf (needed only
    by the *execution* worker) is unusable: the query must resolve,
    stay streaming, carry the declared output schema, and plan the
    TransformWithState node."""
    from mkpipe_extractor_clickhouse_spark.streaming import stateful

    stream = runtime.read_event_stream(spark, staged)
    prof = stateful.user_profiles_tws(stream)
    assert prof.isStreaming
    assert prof.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,"
        "total_value:double,last_event_id:bigint>"
    )
    logical = prof._jdf.queryExecution().logical().toString()
    assert "TransformWithStateInPySpark" in logical


def test_interval_join_stream_matches_batch(spark, sf_dir, staged, tmp_path):
    """Stream-stream interval join (purchase←view attribution) must
    emit exactly the batch join's pairs. The staged replay is
    ts-ordered, so a 1-hour watermark never evicts a view that a later
    purchase inside the 30-minute lookback still needs."""
    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    stream = runtime.read_event_stream(spark, staged)
    joined = runtime.purchase_view_attribution(stream)
    runtime.run_available_now(
        joined, "attribution_out", "append", str(tmp_path / "ckpt")
    )
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM attribution_out").collect()
    }
    batch = all_specs()["t9_interval_join"].builder(spark, sf_dir).collect()
    want = {(r.purchase_id, r.view_id) for r in batch}
    assert got == want
    assert len(want) > 0


def test_streaming_rollup_matches_batch(spark, sf_dir, staged, tmp_path):
    """The stream-maintained rollup must converge to the one-shot batch
    GROUP BY, and a re-delivered micro-batch must merge zero times."""
    stream = runtime.read_event_stream(spark, staged)
    dest = str(tmp_path / "rollup_dest")
    os.makedirs(dest, exist_ok=True)
    rollup = runtime.rollup_sink(spark, stream, dest, str(tmp_path / "ckpt"))

    got = {
        (r.event_type, str(r.day)): (r.n_events, r.min_ts, r.max_ts)
        for r in rollup.result(spark).collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"), F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    )
    want = {(r.event_type, str(r.day)): (r.n, r.mn, r.mx) for r in batch}
    assert got == want

    # foreachBatch re-delivery: replaying the last committed batch_id is
    # a no-op (idempotent merge).
    last = int(rollup.store.get("events__last_batch"))
    some_rows = load_table(spark, sf_dir, "events").limit(10)
    assert rollup.merge_batch(spark, some_rows, last) is False
    after = {
        (r.event_type, str(r.day)): (r.n_events, r.min_ts, r.max_ts)
        for r in rollup.result(spark).collect()
    }
    assert after == got


def test_outer_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream LEFT OUTER interval join: all purchases emit,
    null-extended when unattributed — equal to the batch left join.

    Stages its own chunks plus terminal flush records past the last
    real event: the outer join holds unmatched purchases in state until
    the watermark passes purchase_ts + lookback, so without the flush
    the final hour's unmatched purchases would still be pending when
    AvailableNow terminates. Each flush batch carries one sentinel
    purchase AND one sentinel view (non-joining negative user ids):
    the event-type filters are pushed into each branch's file scan, so
    a record must pass BOTH filters for both branches' watermark
    operators — the query watermark is their min — to advance."""
    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    stage = runtime.stage_event_chunks(
        spark, sf_dir, str(tmp_path / "stage"), n_chunks=5
    )
    chunk = spark.read.parquet(os.path.join(stage, "chunk_001"))
    mx = (
        load_table(spark, sf_dir, "events").agg(F.max("ts").alias("m"))
        .first()["m"]
    )
    # Two flush batches: the first advances the watermark past every
    # purchase's lookback, the second gives the join a batch in which
    # that watermark is already current so remaining pending state is
    # evicted (watermark updates take effect in the batch AFTER the one
    # that observed the event time).
    for i, hours in ((998, 3), (999, 4)):
        flush = spark.createDataFrame(
            [
                (-1, mx, -1, "purchase", 0.0, "{}"),
                (-2, mx, -2, "view", 0.0, "{}"),
            ],
            schema=chunk.schema,
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {hours} HOURS"))
        flush.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage, f"chunk_{i}")
        )

    stream = runtime.read_event_stream(spark, stage)
    out = runtime.purchase_view_attribution_outer(stream)
    runtime.run_available_now(
        out, "attr_outer_out", "append", str(tmp_path / "ckpt")
    )
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql(
            "SELECT * FROM attr_outer_out WHERE user_id >= 0"
        ).collect()
    }
    batch = all_specs()["t11_stream_stream_outer"].builder(spark, sf_dir)
    want = {(r.purchase_id, r.view_id) for r in batch.collect()}
    assert got == want
    # the outer join must actually produce null-extended purchases
    assert any(v is None for (_, v) in want)


def test_stream_topk_matches_batch(spark, sf_dir, staged, tmp_path):
    """applyInPandasWithState top-k leaderboard over 5 micro-batches
    must converge to the batch window top-k (t12). Update mode emits
    the key's full current leaderboard each touched batch; each rank's
    (value desc, event_id asc) tuple only IMPROVES as state absorbs
    rows, so the final leaderboard is the per-(key, rank) best tuple
    across emissions."""
    from mkpipe_extractor_clickhouse_spark.registry import _REGISTRY, _load_modules
    from mkpipe_extractor_clickhouse_spark.streaming.stateful import stream_topk

    stream = runtime.read_event_stream(spark, staged)
    topk = stream_topk(stream)
    runtime.run_available_now(topk, "topk_out", "update", str(tmp_path / "ckpt"))

    best: dict[tuple, tuple] = {}
    for r in spark.table("topk_out").collect():
        k = (r.event_type, r.rank)
        t = (-r.value, r.event_id)
        if k not in best or t < best[k]:
            best[k] = t

    _load_modules()
    want = {
        (r.event_type, r.rank): (-r.value, r.event_id)
        for r in _REGISTRY["t12_stream_topk"].builder(spark, sf_dir).collect()
    }
    assert best == want


def test_session_eviction_append_matches_t14(spark, sf_dir, staged, tmp_path):
    """t14_evicted_sessions runtime parity: the APPEND-mode output of
    the streaming session pipeline equals the batch derivation
    row-for-row.  Append emits a session once the watermark passes its
    window end (= last event + gap), so with watermark delay 30 min a
    session surfaces iff last_event ≤ max_ts − 1 h — exactly t14's
    closed-session predicate; window ends map back by the gap."""
    import datetime

    from mkpipe_extractor_clickhouse_spark.streaming.batch_equiv import (
        t14_evicted_sessions,
    )

    stream = runtime.read_event_stream(spark, staged)
    agg = runtime.session_counts(stream, gap="30 minutes", watermark="30 minutes")
    runtime.run_available_now(
        agg, "sess_evict_out", "append", str(tmp_path / "ckpt")
    )
    gap = datetime.timedelta(minutes=30)
    got = {
        (r.user_id, r.session_start, r.session_end - gap, r.n_events)
        for r in spark.sql("SELECT * FROM sess_evict_out").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in t14_evicted_sessions(spark, sf_dir).collect()
    }
    assert got == want
    # eviction is real: some sessions stay open past the horizon
    total = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window(F.col("ts").cast("timestamp"), "30 minutes"), "user_id")
        .count()
        .count()
    )
    assert len(want) < total


def test_multisource_min_watermark_governs(spark, tmp_path):
    """T17: two unioned streams, each with its own watermark — the
    query's global watermark is the MIN across sources (default
    multipleWatermarkPolicy), so windows the fast source has long
    passed stay open while the slow source lags.  Source A advances
    to 23:00, source B only to 12:30; with a 1-hour delay the global
    watermark is 11:30, so exactly the 10:00 window (end 11:00) is
    final — A's own watermark alone would have finalized everything
    up to 22:00."""
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_s", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def stage(dirname, batches):
        d = str(tmp_path / dirname)
        os.makedirs(d, exist_ok=True)
        for i, rows in enumerate(batches):
            (
                spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
                .drop("ts_s")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(d, f"chunk_{i:03d}"))
            )
        return d

    a_rows1 = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "click", 1.0, "{}")
        for i in range(4)
    ]
    a_rows2 = [
        (50, "2024-01-01 12:10:00", 1, "view", 1.0, "{}"),
        (51, "2024-01-01 23:00:00", 1, "click", 1.0, "{}"),
    ]
    b_rows1 = [(100, "2024-01-01 10:05:00", 2, "purchase", 1.0, "{}")]
    b_rows2 = [(101, "2024-01-01 12:30:00", 2, "signup", 1.0, "{}")]
    # trailing chunks so the advanced watermark gets one more batch to
    # flush finalized windows (propagation lags a batch)
    a_rows3 = [(52, "2024-01-01 23:10:00", 1, "click", 1.0, "{}")]
    b_rows3 = [(102, "2024-01-01 12:31:00", 2, "error", 1.0, "{}")]

    stage_a = stage("src_a", [a_rows1, a_rows2, a_rows3])
    stage_b = stage("src_b", [b_rows1, b_rows2, b_rows3])
    sa = runtime.read_event_stream(spark, stage_a)
    sb = runtime.read_event_stream(spark, stage_b)
    agg = runtime.multisource_tumbling(sa, sb, watermark="1 hour")
    runtime.run_available_now(
        agg, "t17_out", "append", str(tmp_path / "ckpt")
    )
    got = {
        str(r.window_start): (r.n_a, r.n_b, r.n)
        for r in spark.sql("SELECT * FROM t17_out").collect()
    }
    # 10:00 window: closed under the GLOBAL (min) watermark 11:30/11:31
    assert got.get("2024-01-01 10:00:00") == (4, 1, 5)
    # 12:00 window: A's watermark (22:00+) passed it long ago, but B's
    # (11:30) has not — min policy keeps it OPEN, nothing emitted
    assert "2024-01-01 12:00:00" not in got
    assert "2024-01-01 23:00:00" not in got
    assert set(got) == {"2024-01-01 10:00:00"}


def test_t13_two_phase_fold_equals_sequential_fold(spark, sf_dir):
    """The registered t13 two-phase fold (vectorized mapInPandas
    partial + native exact integer merge) must be bit-identical to the
    sequential per-group _fold_profile the stateful operators run —
    same _quantize_scaled kernel, associative int merge."""
    from mkpipe_extractor_clickhouse_spark.registry import all_specs
    from mkpipe_extractor_clickhouse_spark.streaming.stateful import (
        PROFILE_SCHEMA,
        _emit_profile,
        _fold_profile,
    )

    got = {
        r.user_id: (r.n_events, r.total_value, r.last_event_id)
        for r in all_specs()["t13_stateful_profile"].builder(spark, sf_dir).collect()
    }

    def seq_profile(pdf):
        uid = int(pdf["user_id"].iloc[0])
        return _emit_profile((uid,), _fold_profile((0, 0, -1), [pdf]))

    ref = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("long").alias("user_id"), "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(seq_profile, PROFILE_SCHEMA)
        .collect()
    )
    want = {r.user_id: (r.n_events, r.total_value, r.last_event_id) for r in ref}
    assert got == want
