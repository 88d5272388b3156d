"""Structured Streaming runtime (SURVEY §2.9 T1-T7).

The reference's incremental loop is a micro-batch stream in disguise;
here it is the real thing: a file-source replay of the events table in
event-time order, watermarked windowed aggregations, stateful dedup,
and a foreachBatch sink that reuses the batch loader + watermark store
from sources/extract.py — so batch and streaming share one persistence
path, and `Trigger.AvailableNow` turns any stream into a catch-up batch
run (the T7 parity harness).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.extract import ParquetLoader, TableConfig
from ..sources.state import WatermarkStore


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_chunks: int = 5
) -> str:
    """Materialize events as n_chunks ts-ordered parquet files — the
    replayable "arrival log" a file stream consumes in order."""
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    # Global ntile is a single-task window — fine for staging test
    # fixtures; a production arrival log would already be chunked.
    ev = ev.withColumn("chunk", F.ntile(n_chunks).over(Window.orderBy("ts", "event_id")))
    os.makedirs(stage_dir, exist_ok=True)
    for i in range(1, n_chunks + 1):
        (
            ev.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"chunk_{i:03d}"))
        )
    return stage_dir


def read_event_stream(spark: SparkSession, stage_dir: str) -> DataFrame:
    """File-source stream over the staged chunks, one file per
    micro-batch — schema fixed (ts already timestamp_ntz in staging)."""
    schema = spark.read.parquet(os.path.join(stage_dir, "chunk_001")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage_dir, "chunk_*"))
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str, checkpoint: str
) -> None:
    """Drain the stream into an in-memory table `query_name` with
    Trigger.AvailableNow — processes everything currently staged, then
    stops (the engine's catch-up/backfill execution mode)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T1+T2: watermarked tumbling-window aggregation.

    Event-time columns must be TIMESTAMP (LTZ) for watermarks —
    Spark rejects TIMESTAMP_NTZ event time — so the NTZ column is cast
    at the boundary and the window start cast back (session TZ is UTC,
    so the round-trip is the identity)."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
    )


def keyed_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T5: stateful dedup on (user_id, event_type) with bounded state
    via dropDuplicatesWithinWatermark (same LTZ boundary cast)."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )


def incremental_sink(
    spark: SparkSession,
    stream: DataFrame,
    dest_dir: str,
    checkpoint: str,
    table_name: str = "events",
) -> None:
    """T7: foreachBatch sink sharing the batch loader + watermark store
    — every micro-batch is an idempotent append plus a state commit,
    i.e. the reference's extract→load→commit tick, stream-driven."""
    table = TableConfig(name=table_name, dedup_keys=("event_id",))
    loader = ParquetLoader(dest_dir)
    store = WatermarkStore(os.path.join(dest_dir, "state.json"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.extract import ExtractResult

        loader.load(spark, table, ExtractResult(batch_df, "append"))
        row = batch_df.agg(F.max("ts").alias("mx")).first()
        if row and row["mx"] is not None:
            prev = store.get(table_name)
            if prev is None or str(row["mx"]) > prev:
                store.set(table_name, str(row["mx"]))

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sliding_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T3: watermarked sliding-window aggregation (1 h window, 15 min
    slide — each event lands in 4 overlapping windows)."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"), "n"
        )
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """T4: session windows (gap-based) over the stream.  In append
    mode a session row is emitted — and leaves the state store — once
    the watermark passes its window end (last event + gap): verified
    boundary-exactly against the batch derivation in
    tests/test_streaming.py."""
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def enriched_stream(
    spark: SparkSession, stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension (events.user_id → customer.c_custkey). The static side is
    re-resolved per micro-batch by Spark — the streaming analogue of a
    broadcast dimension join, no state required."""
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    return (
        stream.join(customers, stream.user_id == customers.c_custkey, "left")
        .groupBy("event_type", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


def purchase_view_attribution(
    stream: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T9: stream-stream interval join — each purchase joined to the
    same user's views in the preceding ``lookback`` window.

    Both sides are watermarked filters over one arrival stream; the
    join condition carries the event-time range, so Spark bounds the
    buffered state to watermark + lookback on each side and evicts
    behind it. At scale this is the canonical attribution join: state
    per key is O(events in the lookback window), shuffle is hash on
    user_id, and no side is ever fully materialized. (Same LTZ
    boundary cast as tumbling_counts — watermarks reject NTZ.)"""
    ltz = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = (
        ltz.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        ltz.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    joined = purchases.join(
        views,
        (F.col("p_user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "inner",
    )
    return joined.select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "view_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        "purchase_value",
    )


def purchase_view_attribution_outer(
    stream: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T11: stream-stream LEFT OUTER interval join — every purchase
    emits, attributed to same-user views in the preceding ``lookback``
    window, or with NULL view columns once the watermark proves no
    view can still arrive.

    The outer side makes state eviction *observable*: an unmatched
    purchase is held in state and emitted null-extended only when the
    join watermark passes purchase_ts + lookback. Caveat discovered
    empirically and locked by the runtime test: the watermark is
    declared once on the base arrival stream, but the self-join plans
    each side as its OWN scan with the event-type filter pushed into
    it, and each side's watermark operator only sees rows passing that
    scan — the query watermark is the min of the two. Draining a
    bounded replay therefore needs flush records that pass BOTH type
    filters (one sentinel purchase + one sentinel view on non-joining
    keys); see tests/test_streaming.py. State per key stays O(lookback
    window); shuffle is hash on user_id."""
    ltz = stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)
    purchases = ltz.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    views = ltz.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = purchases.join(
        views,
        (F.col("p_user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "left_outer",
    )
    return joined.select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "view_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        "purchase_value",
    )


def rollup_sink(
    spark: SparkSession,
    stream: DataFrame,
    dest_dir: str,
    checkpoint: str,
):
    """Stream-maintained aggregate view: every micro-batch's mergeable
    states fold into the rollup destination (sources/rollup.py) — the
    streaming face of the AggregatingMergeTree pattern. The stream
    checkpoint guarantees per-batch delivery; the rollup's batch_id
    high-water mark makes foreachBatch re-delivery idempotent, so the
    view is exactly-once end-to-end without rescanning history."""
    from ..sources.rollup import IncrementalRollup

    rollup = IncrementalRollup(sf_dir="", dest_dir=dest_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        rollup.merge_batch(spark, batch_df, batch_id)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rollup


def multisource_tumbling(
    stream_a: DataFrame,
    stream_b: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """T1+T2 over a UNION of independently-watermarked sources — the
    multi-stream ingestion shape (two topics / two landing zones
    feeding one table).  Each leg declares its own event-time
    watermark BEFORE the union; Structured Streaming then advances the
    query's global watermark with the MINIMUM across legs (default
    ``spark.sql.streaming.multipleWatermarkPolicy=min``), so a window
    finalizes only when the SLOWEST source has passed it — the
    property that makes the union safe against one lagging source
    silently losing its late rows.  Per-source counts ride along so
    the governance is observable in the output."""
    def leg(s: DataFrame, tag: str) -> DataFrame:
        # same LTZ boundary cast as tumbling_counts: watermarks reject
        # TIMESTAMP_NTZ event time; session TZ is UTC so it's identity
        return (
            s.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .withColumn("src", F.lit(tag))
        )

    return (
        leg(stream_a, "a")
        .unionByName(leg(stream_b, "b"))
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.sum(F.when(F.col("src") == "a", 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("src") == "b", 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n_a",
            "n_b",
            "n",
        )
    )
