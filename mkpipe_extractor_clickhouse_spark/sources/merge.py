"""Partition-scoped copy-on-write MERGE (upsert-by-key) on plain parquet.

The reference's loader contract stops at overwrite/append
(reference ``mkpipe_extractor_clickhouse/__init__.py:85-93``); real
incremental pipelines also need UPDATE semantics — a re-extracted row
must replace its previous version, not sit next to it. On a lakehouse
table this is ``MERGE INTO``; on plain parquet the pre-lakehouse
standard is what Hive's dynamic INSERT OVERWRITE does: rewrite only the
partitions the batch touches and swap their directories in.

Scale posture (the part that must survive 100 TB):
  * the destination is Hive-partitioned on ``partition_col``; a merge
    tick reads and rewrites ONLY the partitions present in the incoming
    batch — cost is O(affected partitions), never O(history);
  * the only ``collect()`` is the distinct partition-value list of the
    batch (metadata-scale: bounded by the tick's time span, not rows);
  * the rewrite shuffles nothing extra: anti-join of old rows against
    batch keys (broadcast when the batch key set is small), union,
    one partitioned write;
  * the directory swap is a filesystem rename per affected partition —
    metadata-only on HDFS/local (object stores pay a copy; there you
    would point this seam at a real lakehouse MERGE instead, see
    ROADMAP §1).

Crash safety: the staging write completes before any swap; a crash
mid-swap leaves some partitions new and some old, and re-running the
same merge tick converges (merge is idempotent by key), mirroring the
append loader's write-then-commit-watermark story.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import ExtractResult, TableConfig


class MergeParquetLoader:
    """Upsert-by-key loader over a Hive-partitioned parquet destination.

    ``table.dedup_keys`` are the merge keys. ``version_col`` (usually
    the iterate column) resolves multiple versions of one key *within a
    batch*: the row with the highest (version, remaining columns) wins —
    the struct-max comparison is a total order, so the survivor is
    deterministic even on version ties. Without a ``version_col`` the
    batch must carry unique keys (enforced loudly)."""

    def __init__(
        self, dest_dir: str, partition_col: str, version_col: str | None = None
    ):
        self.dest_dir = dest_dir
        self.partition_col = partition_col
        self.version_col = version_col

    def path(self, table: TableConfig) -> str:
        return os.path.join(self.dest_dir, f"{table.target_name}.parquet")

    # -- batch-side preparation ------------------------------------------

    def _latest_per_key(self, df: DataFrame, keys: list[str]) -> DataFrame:
        """Collapse the batch to one row per merge key."""
        if self.version_col is None:
            # No version column: duplicate keys in one batch are a
            # pipeline bug, not a tie to break silently.
            dupes = df.groupBy(*keys).count().filter(F.col("count") > 1)
            if dupes.limit(1).count() > 0:
                raise ValueError(
                    f"merge batch carries duplicate keys {keys} and no "
                    "version_col to resolve them"
                )
            return df
        others = [c for c in df.columns if c not in keys and c != self.version_col]
        packed = df.groupBy(*keys).agg(
            F.max(F.struct(self.version_col, *others)).alias("_winner")
        )
        return packed.select(
            *keys,
            F.col(f"_winner.{self.version_col}").alias(self.version_col),
            *[F.col(f"_winner.{c}").alias(c) for c in others],
        ).select(*df.columns)

    # -- merge ------------------------------------------------------------

    def load(
        self, spark: SparkSession, table: TableConfig, result: ExtractResult
    ) -> None:
        if result.df is None:
            return  # no_new_data
        if not table.dedup_keys:
            raise ValueError("MergeParquetLoader requires table.dedup_keys")
        pcol = self.partition_col
        df = result.df
        if pcol not in df.columns:
            raise ValueError(f"batch is missing partition column {pcol!r}")
        keys = list(table.dedup_keys)
        path = self.path(table)

        if result.write_mode == "overwrite" or not os.path.exists(path):
            batch = self._latest_per_key(df, keys)
            batch.write.mode("overwrite").partitionBy(pcol).parquet(path)
            return

        batch = self._latest_per_key(df, keys)
        # Metadata-scale collect: the partitions this tick touches.
        affected = [r[0] for r in batch.select(pcol).distinct().collect()]
        if any(v is None for v in affected):
            raise ValueError(f"merge partition column {pcol!r} contains NULLs")

        # Old rows of the affected partitions whose key is NOT being
        # replaced. The partition filter prunes directories; the batch
        # key set is one tick's worth of rows, so Catalyst/AQE broadcast
        # it as the anti-join build side.
        old = spark.read.parquet(path).filter(F.col(pcol).isin(affected))
        keep = old.join(batch.select(*keys).distinct(), on=keys, how="left_anti")
        merged = keep.select(*batch.columns).unionByName(batch)

        # Stage next to the destination (same filesystem → rename, not
        # copy), then swap each affected partition directory in.
        staging = os.path.join(
            self.dest_dir, f".staging_{table.target_name}_{uuid.uuid4().hex[:8]}"
        )
        try:
            merged.write.mode("overwrite").partitionBy(pcol).parquet(staging)
            for v in affected:
                sub = f"{pcol}={v}"
                src, tgt = os.path.join(staging, sub), os.path.join(path, sub)
                if os.path.exists(tgt):
                    shutil.rmtree(tgt)
                os.replace(src, tgt)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
