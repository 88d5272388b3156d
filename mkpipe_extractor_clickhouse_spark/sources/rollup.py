"""Incremental aggregate-view maintenance — the ClickHouse
AggregatingMergeTree / incremental materialized-view pattern (the
reference's source engine maintains pre-aggregated rollups this way;
its extractor surface at ``mkpipe_extractor_clickhouse/__init__.py:86-91``
delivers the per-tick deltas such a view consumes).

Each tick aggregates ONLY the new window of the fact table into
mergeable partial states, then merges those states into the rollup
destination:

    states(delta) ⊎ states(destination)  ==  states(full history)

so the fact history is never rescanned — per tick the cost is
O(delta) + O(rollup), and the rollup is bounded by key cardinality,
not row count. That is what makes a 100 TB events stream maintainable:
the full-recompute GROUP BY (this operator's oracle) would rescan
everything on every refresh.

States kept per key: row count, micro-unit long sum (exact and
order-independent per operators/_determinism.py), min/max timestamp —
all associative+commutative, so any merge order converges.

Exactly-once at the watermark boundary: the extract contract re-reads
``ts >= last_point`` (reference ``__init__.py:88-91``), which an
additive state would double-count. Row-level appends absorb this with
a key anti-join against the destination (sources/extract.py), but a
rollup destination has no row keys — instead the committed state
carries the ids of the handful of rows AT the boundary timestamp, and
the next tick's read excludes exactly those. The carried set is the
rows tied at max(ts) — typically one — never a fraction of history.

Crash safety: the destination swap keeps the previous snapshot as
``.old`` until the new one is in place, and the watermark commits only
after the swap, so a crash at any point either replays the same window
(idempotent: the boundary-id exclusion set is part of the same commit)
or recovers the prior snapshot on the next tick. On a transactional
table format (Delta/Iceberg) the swap and the state commit collapse
into one MERGE commit — this class is the seam where that lands.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators._determinism import SCALE, _quantize
from .state import WatermarkStore


class IncrementalRollup:
    """Maintain an aggregate view of one fact table incrementally.

    ``key_exprs`` maps output key-column names to Spark SQL expressions
    over the fact table (e.g. ``{"day": "CAST(date_trunc('day', ts) AS
    DATE)"}``) — the GROUP BY of the maintained view.
    """

    def __init__(
        self,
        sf_dir: str,
        dest_dir: str,
        *,
        table: str = "events",
        id_col: str = "event_id",
        ts_col: str = "ts",
        value_col: str = "value",
        key_exprs: dict[str, str] | None = None,
    ):
        self.sf_dir = sf_dir
        self.dest_dir = dest_dir
        self.table = table
        self.id_col = id_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.key_exprs = key_exprs or {
            "event_type": "event_type",
            "day": f"CAST(date_trunc('day', {ts_col}) AS DATE)",
        }
        self.store = WatermarkStore(os.path.join(dest_dir, "rollup_state.json"))

    # -- destination snapshot -------------------------------------------------

    @property
    def path(self) -> str:
        return os.path.join(self.dest_dir, f"{self.table}_rollup.parquet")

    def _recover(self) -> None:
        old = self.path + ".old"
        if not os.path.exists(self.path) and os.path.exists(old):
            os.replace(old, self.path)

    def _swap_in(self, staged: str) -> None:
        old = self.path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(self.path):
            os.replace(self.path, old)
        os.replace(staged, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    # -- state ----------------------------------------------------------------

    def _state(self) -> dict | None:
        raw = self.store.get(self.table)
        return json.loads(raw) if raw else None

    # -- the tick -------------------------------------------------------------

    def _states(self, delta: DataFrame) -> DataFrame:
        keys = [
            F.expr(expr).alias(name) for name, expr in self.key_exprs.items()
        ]
        return delta.groupBy(*keys).agg(
            F.count("*").alias("n"),
            F.sum(_quantize(self.value_col)).alias("sum_q"),
            F.min(self.ts_col).alias("min_ts"),
            F.max(self.ts_col).alias("max_ts"),
        )

    def _merge(self, existing: DataFrame, delta_states: DataFrame) -> DataFrame:
        return (
            existing.unionByName(delta_states)
            .groupBy(*self.key_exprs)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_q").alias("sum_q"),
                F.min("min_ts").alias("min_ts"),
                F.max("max_ts").alias("max_ts"),
            )
        )

    def tick(self, spark: SparkSession, source_filter=None) -> bool:
        """One refresh: aggregate the new window, merge states, swap the
        snapshot, commit the watermark. Returns False on no-new-data."""
        self._recover()
        state = self._state()
        df = load_table(spark, self.sf_dir, self.table)
        if source_filter is not None:
            df = df.filter(source_filter)
        if state is not None:
            boundary = F.lit(state["last_point"]).cast("timestamp_ntz")
            df = df.filter(F.col(self.ts_col) >= boundary)
            if state["boundary_ids"]:
                df = df.filter(
                    ~(
                        (F.col(self.ts_col) == boundary)
                        & F.col(self.id_col).isin(state["boundary_ids"])
                    )
                )
        df = df.persist()
        try:
            if df.isEmpty():
                return False

            delta_states = self._states(df)
            staged = self.path + ".staged"
            if os.path.exists(self.path):
                merged = self._merge(
                    spark.read.parquet(self.path), delta_states
                )
            else:
                merged = delta_states
            merged.write.mode("overwrite").parquet(staged)

            # New boundary: max(ts) of the delta plus the ids tied at it
            # (bounded by duplicates-at-one-timestamp, not history size).
            new_lp = df.agg(F.max(self.ts_col).alias("m")).first()["m"]
            ids = [
                r[0]
                for r in df.filter(F.col(self.ts_col) == F.lit(new_lp))
                .select(self.id_col)
                .collect()
            ]
            self._swap_in(staged)
            self.store.set(
                self.table,
                json.dumps({"last_point": str(new_lp), "boundary_ids": ids}),
            )
            return True
        finally:
            df.unpersist()

    def merge_batch(
        self, spark: SparkSession, batch_df: DataFrame, batch_id: int
    ) -> bool:
        """Streaming-side maintenance (foreachBatch): merge one
        micro-batch's states into the rollup. The stream source already
        delivers each row exactly once per batch_id; what this must
        survive is foreachBatch RE-delivery after a failure — the
        committed batch_id high-water mark makes the merge idempotent
        (a replayed batch is skipped, a new one merges exactly once)."""
        self._recover()
        key = f"{self.table}__last_batch"
        prev = self.store.get(key)
        if prev is not None and batch_id <= int(prev):
            return False
        if not batch_df.isEmpty():
            delta_states = self._states(batch_df)
            staged = self.path + ".staged"
            if os.path.exists(self.path):
                merged = self._merge(spark.read.parquet(self.path), delta_states)
            else:
                merged = delta_states
            merged.write.mode("overwrite").parquet(staged)
            self._swap_in(staged)
        self.store.set(key, str(batch_id))
        return True

    # -- user-facing view -----------------------------------------------------

    def result(self, spark: SparkSession) -> DataFrame:
        """The maintained view with final (not partial) values."""
        self._recover()
        snap = spark.read.parquet(self.path)
        return snap.select(
            *self.key_exprs,
            F.col("n").alias("n_events"),
            (F.col("sum_q") / float(SCALE)).cast("double").alias("sum_value"),
            "min_ts",
            "max_ts",
        )
