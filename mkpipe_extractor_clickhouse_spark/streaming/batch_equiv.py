"""Streaming operator family, batch-equivalent declared queries
(SURVEY §2.9 T1-T6).

The reference's incremental loop is a hand-rolled micro-batch stream
(watermark column + monotonic last_point + append, reference
``mkpipe_extractor_clickhouse/__init__.py:71-115``). The engine's
streaming operators are Structured Streaming (streaming/runtime.py,
verified by batch↔stream parity in tests/test_streaming.py); the
queries declared here are the *batch* semantics of the same operators,
oracle-checked against DuckDB — per SURVEY §5.3's two-tier strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators._determinism import DAVG, DSUM, _Q, _quantize, dsum
from ..registry import register


@register(
    "t2_tumbling_window",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {DSUM.format(x='value')} AS total_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
    tags=("T2",),
    bench=True,
)
def t2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via F.window — identical
    grouping to date_trunc('hour') since windows align to the epoch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "t3_sliding_window",
    oracle=f"""
    -- epoch arithmetic stays in naive TIMESTAMP space (TO_TIMESTAMP
    -- would route through TIMESTAMPTZ and shift by the host TZ)
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + CAST(FLOOR(EPOCH(ts) / 900) * 900 - k * 900 AS BIGINT)
               * INTERVAL 1 SECOND
             AS window_start,
           COUNT(*) AS n,
           {DSUM.format(x='value')} AS total_value
    FROM events CROSS JOIN range(0, 4) t(k)
    GROUP BY 1
    """,
    tags=("T3",),
)
def t3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide): every event lands in
    4 overlapping windows. The oracle reproduces Spark's epoch-aligned
    window-start arithmetic explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"), "n", "total_value"
        )
    )


@register(
    "t4_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {DSUM.format(x='value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("T4",),
)
def t4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-min gap) via F.session_window. The oracle is
    the classic lag+cumsum sessionization — by construction the session
    end is last-event + gap, matching Spark's session_window.end."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "t5_dedup_keys",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id,
           COUNT(*) AS n_dupes
    FROM events
    GROUP BY user_id, event_type
    """,
    tags=("T5",),
)
def t5_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, batch form: one surviving row per (user_id,
    event_type) with deterministic survivor choice (min event_id) —
    the semantics dropDuplicatesWithinWatermark provides in streams
    (stream↔batch parity in tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dupes")
    )


@register(
    "t6_late_data_filter",
    oracle="""
    SELECT COUNT(*) AS n_on_time, MAX(ts) AS max_ts
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    """,
    tags=("T1", "T6"),
)
def t6_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics in batch form: rows older than
    (max event time − delay) are the ones a 7-day watermark would
    drop. The reference silently loses rows below last_point
    (__init__.py:88-91); a watermark makes the same trade explicit."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.join(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .agg(F.count("*").alias("n_on_time"), F.max("ts").alias("max_ts"))
    )


@register(
    "t8_session_metrics",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id,
             DATE_DIFF('second', MIN(ts), MAX(ts)) AS dur_s,
             COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT COUNT(*) AS n_sessions,
           ROUND(MEDIAN(CAST(dur_s AS DOUBLE)), 6) AS median_dur_s,
           ROUND(QUANTILE_CONT(CAST(dur_s AS DOUBLE), 0.9), 6) AS p90_dur_s,
           {DAVG.format(x='CAST(n_events AS DOUBLE)')} AS avg_events_per_session,
           MAX(n_events) AS max_events
    FROM sessions
    """,
    tags=("T4", "A9"),
)
def t8_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition query: sessionize (T4) then aggregate session
    duration/size distributions (A9) — the engagement-metrics rollup a
    product pipeline derives from the session operator."""
    from ..operators._determinism import davg

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            # timestampdiff on NTZ operands — TZ-free, unlike a
            # unix_timestamp round-trip through the session timezone
            F.expr("timestampdiff(SECOND, s_start, s_end)")
            .cast("double")
            .alias("dur_s"),
            "n_events",
        )
    )
    return sessions.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.median("dur_s"), 6).alias("median_dur_s"),
        F.round(F.percentile("dur_s", F.lit(0.9)), 6).alias("p90_dur_s"),
        davg(F.col("n_events").cast("double")).alias("avg_events_per_session"),
        F.max("n_events").alias("max_events"),
    )


@register(
    "t9_interval_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.ts AS purchase_ts,
           v.ts AS view_ts,
           p.value AS purchase_value
    FROM events p
    JOIN events v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
      AND v.event_type = 'view'
    """,
    tags=("T9", "J9"),
)
def t9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the stream-stream attribution join
    (streaming/runtime.py purchase_view_attribution): purchases matched
    to same-user views within the preceding 30 minutes. The batch plan
    is a hash join on user_id with the time range as a join residual —
    one shuffle, no pair blowup beyond the lookback window."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "user_id", "purchase_id", "view_id", "purchase_ts", "view_ts",
            "purchase_value",
        )
    )


@register(
    "t11_stream_stream_outer",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.ts AS purchase_ts,
           v.ts AS view_ts,
           p.value AS purchase_value
    FROM events p
    LEFT JOIN events v
      ON p.user_id = v.user_id
     AND v.event_type = 'view'
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    """,
    tags=("T9", "J3", "EXT"),
)
def t11_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the stream-stream LEFT OUTER interval join
    (streaming/runtime.py purchase_view_attribution_outer, runtime
    parity in tests/test_streaming.py): every purchase row survives,
    null-extended when no same-user view precedes it within 30 minutes
    — the unattributed-conversion report. Same single hash shuffle on
    user_id as the inner form; the outer side adds no state beyond it
    in batch, and watermark-bounded state in the stream."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (
                F.col("view_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
            ),
            "left_outer",
        )
        .select(
            "user_id", "purchase_id", "view_id", "purchase_ts", "view_ts",
            "purchase_value",
        )
    )


@register(
    "t10_stream_static_enrich",
    oracle="""
    SELECT e.event_type, c.c_mktsegment,
           COUNT(*) AS n,
           COUNT(c.c_custkey) AS n_matched
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("T1", "J2", "J3", "EXT"),
)
def t10_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the stream-static dimension enrichment
    (streaming/runtime.py enriched_stream, parity-tested in
    tests/test_streaming.py::test_stream_static_join_matches_batch):
    each event left-joined to the customer dimension and counted per
    (event_type, segment).  In the streaming form Spark re-resolves the
    static side every micro-batch — the streaming analogue of a
    broadcast dim join, zero state; the batch plan here is exactly that
    broadcast join, so the declared query and the stream converge on
    the same result by construction."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey, "left")
        .groupBy("event_type", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.count("c_custkey").alias("n_matched"),
        )
    )


@register(
    "t12_stream_topk",
    oracle=f"""
    WITH q AS (
      SELECT event_type, event_id, {_Q.format(x='value')} AS vq
      FROM events
    ),
    r AS (
      SELECT event_type, event_id, vq,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY vq DESC, event_id
             ) AS rank
      FROM q
    )
    SELECT event_type, event_id,
           CAST(vq / 1000000.0 AS DOUBLE) AS value, rank
    FROM r WHERE rank <= 5
    ORDER BY event_type, rank
    """,
    tags=("T5", "W8", "EXT", "streaming"),
)
def t12_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the streaming per-key top-k leaderboard
    (streaming/stateful.py stream_topk — applyInPandasWithState with
    O(k) state per key; runtime parity in tests/test_streaming.py):
    the 5 highest-value events per type, value quantized at 1e-6
    exactly as the stream state keeps it, ties broken on event_id.
    The stream emits this same relation incrementally with bounded
    state — the leaderboard a complete-mode agg would re-sort from
    scratch each trigger."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type", "event_id", _quantize("value").alias("vq")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("vq").desc(), F.col("event_id")
    )
    return (
        q.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "event_type",
            "event_id",
            (F.col("vq") / 1_000_000.0).cast("double").alias("value"),
            "rank",
        )
        .orderBy("event_type", "rank")
    )


@register(
    "t13_stateful_profile",
    oracle=f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           COUNT(*) AS n_events,
           {DSUM.format(x='value')} AS total_value,
           MAX(event_id) AS last_event_id
    FROM events
    GROUP BY user_id
    """,
    tags=("T5", "D4", "EXT", "streaming"),
)
def t13_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the applyInPandasWithState per-user profile
    (streaming/stateful.py user_profiles — runtime parity in
    tests/test_streaming.py), executed through the SAME per-row
    quantization kernel (stateful._quantize_scaled: value × 1e6,
    half-away-from-zero to int64), so the driver hash-checks the
    stateful operator's arithmetic — not a lookalike re-derivation.

    Two-phase fold, the at-scale shape of the state merge itself:
    phase 1 runs the kernel vectorized in mapInArrow over the scan
    partitions as read (no pre-shuffle, one Python call per Arrow
    batch, zero-copy column views — r12: the pandas groupby partial
    was the remaining Python premium, 16.5× vs the plain-GROUP-BY
    oracle at 100 M events; argsort+reduceat over the raw Arrow
    buffers does the same exact int64 partial with no pandas frame,
    no per-group dispatch) and emits one partial state row per user
    per partition; phase 2 merges partials with native exact integer
    sum/max — the
    same associative merge the state store applies across
    micro-batches, so the result is bit-identical to the sequential
    per-group fold (asserted in tests/test_streaming.py).  The
    earlier per-group applyInPandas form shuffled every event row to
    Python and paid one Python call per user (~|users| tiny groups):
    121 s at 100 M events / 10 M users vs native merge of
    |users per partition| partials.

    Overflow bound (ADVICE r11): the pandas partials and the native
    F.sum merge both accumulate scaled_sum in int64 and wrap silently,
    while the sequential _fold_profile uses unbounded Python ints —
    exact equivalence therefore requires Σ|value| per user
    < 2^63/1e6 ≈ 9.2e12 (fixture max ≈ 1e9).  The partial fold
    asserts a headroomed per-partial bound so a corpus approaching
    the wrap fails loudly instead of diverging."""
    from pyspark.sql import types as T

    from .stateful import _quantize_scaled

    partial_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("scaled_sum", T.LongType()),
            T.StructField("last_event_id", T.LongType()),
        ]
    )

    def partial_fold(batches):
        import numpy as np
        import pyarrow as pa

        def reduce_by_user(uid, n, ssum, last):
            """Exact int64 (user → Σn, Σssum, max last): one stable
            sort + reduceat — order-free, no per-group dispatch."""
            order = np.argsort(uid, kind="stable")
            su = uid[order]
            starts = np.flatnonzero(
                np.concatenate(([True], su[1:] != su[:-1]))
            )
            return (
                su[starts],
                np.add.reduceat(n[order], starts),
                np.add.reduceat(ssum[order], starts),
                np.maximum.reduceat(last[order], starts),
            )

        parts = []  # per-batch partials: O(users per batch), not rows
        for rb in batches:
            if rb.num_rows == 0:
                continue
            uid = rb.column(0).to_numpy(zero_copy_only=False)
            eid = rb.column(1).to_numpy(zero_copy_only=False)
            q = _quantize_scaled(rb.column(2).to_numpy(zero_copy_only=False))
            parts.append(
                reduce_by_user(uid, np.ones_like(uid), q, eid)
            )
        if parts:
            uid, n, ssum, last = (
                np.concatenate([p[i] for p in parts]) for i in range(4)
            )
            uid, n, ssum, last = reduce_by_user(uid, n, ssum, last)
            # Cheap wrap guard: leave the downstream native F.sum
            # ~2^10 partials of headroom before int64 overflow.
            assert int(np.abs(ssum).max()) < (1 << 53), (
                "t13 partial scaled_sum near int64 range; the numpy/"
                "native int64 fold would wrap while the sequential "
                "Python-int fold does not (see docstring bound)"
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(uid, type=pa.int64()),
                    pa.array(n, type=pa.int64()),
                    pa.array(ssum, type=pa.int64()),
                    pa.array(last, type=pa.int64()),
                ],
                ["user_id", "n", "scaled_sum", "last_event_id"],
            )

    ev = load_table(spark, sf_dir, "events")
    partials = ev.select(
        F.col("user_id").cast("long").alias("user_id"), "event_id", "value"
    ).mapInArrow(partial_fold, partial_schema)
    return (
        partials.groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("scaled_sum").alias("scaled_sum"),
            F.max("last_event_id").alias("last_event_id"),
        )
        .select(
            "user_id",
            "n_events",
            (F.col("scaled_sum") / 1_000_000.0).alias("total_value"),
            "last_event_id",
        )
    )


@register(
    "t14_evicted_sessions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess_id
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, sess_id,
             MIN(ts) AS session_start,
             MAX(ts) AS session_end,
             COUNT(*) AS n_events
      FROM tagged GROUP BY user_id, sess_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, session_start,
           session_end, n_events
    FROM sessions
    WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    ORDER BY user_id, session_start
    """,
    tags=("T4", "T6", "EXT", "streaming"),
)
def t14_evicted_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization WITH STATE EVICTION, batch semantics: 30-minute
    gap sessions per user, emitting only sessions the 1-hour horizon
    has CLOSED (session_end ≤ max event time − 1 hour).  This is the
    append-mode output of the streaming session_window pipeline
    (streaming/runtime.py session_counts) under the equivalence
    session_window.end = session_end + gap: append emits once the
    watermark passes the window end, so with watermark delay w a
    session surfaces when last_event ≤ max_ts − w − gap — the runtime
    parity test (tests/test_streaming.py) drives the stream with
    w = 30 min and maps window ends back by the gap, matching this
    relation row-for-row.

    Shapes: one window pass per user partition (gap-islands via
    lag + running sum — no self-join), one grouped agg, and the
    watermark cutoff broadcast as a 1-row cross join.  Streaming-state
    cost is |open sessions|, batch cost is one shuffle on user_id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    tagged = ev.withColumn(
        "new_sess",
        F.when(
            prev.isNull()
            | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = tagged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
    cutoff = load_table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("cutoff")
    )
    return (
        sessions.join(F.broadcast(cutoff))
        .filter(F.col("session_end") <= F.col("cutoff"))
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "t15_exactly_once_sink",
    oracle="SELECT *, TRUE AS replay_skipped FROM events",
    tags=("T7", "S8", "EXT", "streaming", "manifest"),
)
def t15_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED exactly-once streaming delivery: the staged event log
    streams through a real availableNow query into the manifest sink
    (sources/manifest.py ManifestStreamSink — foreachBatch commits the
    batch_id inside the same atomic manifest publish as the data),
    then the builder SIMULATES the failure mode the contract exists
    for: re-delivering an already-committed batch, as Structured
    Streaming does after a crash between sink write and checkpoint
    commit. The sink must refuse it (batch_id <= last committed) with
    zero new versions, and the final snapshot must equal the full
    source byte-for-byte — both pinned by the oracle hash via the
    replay_skipped constant column. This is the streaming capstone on
    x8's batch-incremental manifest lifecycle."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..sources.manifest import ManifestStreamSink
    from . import runtime

    workdir = tempfile.mkdtemp(prefix="t15_eos_")
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    staged = runtime.stage_event_chunks(
        spark, sf_dir, os.path.join(workdir, "staged"), n_chunks=4
    )
    stream = runtime.read_event_stream(spark, staged)
    sink = ManifestStreamSink(os.path.join(workdir, "table"))
    sink.run_available_now(stream, os.path.join(workdir, "ckpt"))

    last = sink.last_batch_id()
    versions_before = sink.table.versions()
    redelivered = spark.read.parquet(os.path.join(staged, "chunk_004"))
    accepted = sink.handle(redelivered, last)  # retry of committed batch
    if accepted or sink.table.versions() != versions_before:
        raise RuntimeError(
            "exactly-once violated: re-delivered batch "
            f"{last} was accepted (versions {versions_before} -> "
            f"{sink.table.versions()})"
        )
    out = sink.table.read(spark)
    return out.withColumn("replay_skipped", F.lit(True))


@register(
    "t16_checkpoint_resume",
    oracle="SELECT *, TRUE AS resumed_incrementally FROM events",
    tags=("T7", "EXT", "streaming"),
)
def t16_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED checkpoint recovery across a stream RESTART — the other
    half of exactly-once that t15 doesn't cover: the source side. The
    events log stages as 4 arrival chunks; a first availableNow run
    sees only chunks 1-2 and drains them through foreachBatch into a
    plain parquet sink; chunks 3-4 then arrive and a SECOND stream
    starts against the SAME checkpoint — Structured Streaming's file
    source must resume from its commit log and process ONLY the two
    new files (asserted exactly: second-run row count == chunks 3+4,
    batch ids strictly continue the first run's). The final table must
    equal the full source with no row duplicated or dropped — pinned
    by the oracle hash, not just counts. This is the crash/redeploy
    cycle every incremental pipeline lives through; the batch-side
    twin is x1's watermark replay."""
    import atexit
    import os
    import shutil
    import tempfile

    from . import runtime

    workdir = tempfile.mkdtemp(prefix="t16_resume_")
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    full = runtime.stage_event_chunks(
        spark, sf_dir, os.path.join(workdir, "all"), n_chunks=4
    )
    staged = os.path.join(workdir, "staged")
    os.makedirs(staged)
    for i in (1, 2):
        shutil.copytree(
            os.path.join(full, f"chunk_{i:03d}"),
            os.path.join(staged, f"chunk_{i:03d}"),
        )
    data_dir = os.path.join(workdir, "data")
    ckpt = os.path.join(workdir, "ckpt")
    processed: list[tuple[str, int, int]] = []

    def run(tag: str) -> None:
        stream = runtime.read_event_stream(spark, staged)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            processed.append((tag, batch_id, batch_df.count()))
            batch_df.write.mode("append").parquet(data_dir)

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("first")
    first_rows = sum(c for t, _, c in processed if t == "first")
    first_max_batch = max(b for t, b, _ in processed if t == "first")
    for i in (3, 4):
        shutil.copytree(
            os.path.join(full, f"chunk_{i:03d}"),
            os.path.join(staged, f"chunk_{i:03d}"),
        )
    run("second")
    second = [(b, c) for t, b, c in processed if t == "second"]
    late_rows = sum(
        spark.read.parquet(os.path.join(full, f"chunk_{i:03d}")).count()
        for i in (3, 4)
    )
    total = load_table(spark, sf_dir, "events").count()
    if sum(c for _, c in second) != late_rows:
        raise RuntimeError(
            f"resume reprocessed data: second run saw "
            f"{sum(c for _, c in second)} rows, expected {late_rows} "
            f"(first run: {first_rows})"
        )
    if second and min(b for b, _ in second) <= first_max_batch:
        raise RuntimeError(
            f"batch ids did not continue across restart: {processed}"
        )
    out = spark.read.parquet(data_dir)
    if out.count() != total:
        raise RuntimeError(
            f"final table has {out.count()} rows, source has {total}"
        )
    return out.withColumn("resumed_incrementally", F.lit(True))


@register(
    "t17_multisource_watermark",
    oracle="""
    WITH bounds AS (
      SELECT LEAST(
               MAX(CASE WHEN event_type IN ('click', 'view')
                        THEN ts END),
               MAX(CASE WHEN event_type NOT IN ('click', 'view')
                        THEN ts END)
             ) - INTERVAL 1 HOUR AS wm
      FROM events
    )
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           CAST(SUM(CASE WHEN event_type IN ('click', 'view')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN event_type NOT IN ('click', 'view')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           COUNT(*) AS n
    FROM events, bounds
    WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= bounds.wm
    GROUP BY DATE_TRUNC('hour', ts)
    """,
    tags=("T1", "T2", "T6", "EXT", "streaming"),
)
def t17_multisource_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two independently-watermarked sources, batch
    semantics: the click/view feed (source a) and the
    purchase/signup/error feed (source b) land in one tumbling-hour
    table, and a window is FINAL only when the global watermark —
    ``min(max_ts_a, max_ts_b) − delay``, Structured Streaming's
    multipleWatermarkPolicy=min — has passed its end.  The slowest
    source governs: windows one source has long passed stay open
    while the other source lags, which is exactly what the append
    stream emits (runtime.multisource_tumbling; executed parity in
    tests/test_streaming.py::test_multisource_min_watermark_governs).
    Shapes: one scan computes both per-source maxima (conditional
    agg, single row, broadcast); the row-level cutoff filter runs
    scan-side after the broadcast join, so only rows of closed
    windows reach the aggregate exchange."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.col("event_type").isin("click", "view")
    bounds = ev.agg(
        (
            F.least(
                F.max(F.when(is_a, F.col("ts"))),
                F.max(F.when(~is_a, F.col("ts"))),
            )
            - F.expr("INTERVAL 1 HOUR")
        ).alias("wm")
    )
    hour = F.date_trunc("hour", "ts")
    return (
        ev.join(F.broadcast(bounds))
        .filter(hour + F.expr("INTERVAL 1 HOUR") <= F.col("wm"))
        .groupBy(hour.alias("window_start"))
        .agg(
            F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
            F.count("*").alias("n"),
        )
    )
