"""Extractor-parity core: the reference's replication semantics, Spark-first.

Reproduces the full decision tree of the reference ``extract()``
(reference ``mkpipe_extractor_clickhouse/__init__.py:56-134``):

  * full replication → overwrite, no filter (``:116-123``)
  * incremental + static bounds → append, half-open range (``:72-85``)
  * incremental + last_point → append, ``col >= last_point`` (``:86-91``)
  * incremental initial → overwrite, trivial filter (``:92-94``)
  * custom query with ``{query_filter}`` splice (``:96-99, 118-120``)
  * empty-source probe: empty+initial → empty df/overwrite; empty+append
    → df=None "no new data" (``:103-108``)
  * watermark = stringified max(iterate_column) (``:110-115``)

Differences (deliberate fixes, SURVEY §4 caveats — *behavior* preserved,
costs removed):
  * predicates are typed Column expressions pushed into the parquet/JDBC
    scan by Catalyst, not interpolated SQL strings;
  * the watermark ``max(iterate_column)`` is an ``observe()`` metric
    computed by the write's own tasks — the reference re-executes the
    source query for the probe and again for the watermark
    (``:103, :112``), i.e. up to three scans per tick where this runs
    one full scan plus a take(1) probe;
  * the loader dedups the ``>=`` boundary re-read on append via a
    key-based anti-join, making incremental runs idempotent (the
    reference leaves boundary duplicates to the destination); the
    existing-keys read is bounded to the extraction window, so the
    anti-join build side stays O(boundary) at any destination size.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..catalog import SCHEMAS, load_table, register_views
from .filter_spec import FilterSpec, splice_query_filter
from .state import WatermarkStore

WriteMode = Literal["overwrite", "append"]

logger = logging.getLogger(__name__)


@dataclass
class TableConfig:
    """Mirror of the reference's table config surface
    (reference README.md:100-117)."""

    name: str
    target_name: str | None = None
    replication_method: Literal["full", "incremental"] = "full"
    iterate_column: str | None = None
    iterate_column_type: Literal["int", "datetime"] = "int"
    filter_lower_bound: object | None = None
    filter_upper_bound: object | None = None
    custom_query: str | None = None
    custom_query_file: str | None = None
    # "clickhouse" translates the custom query's ClickHouse dialect to
    # Spark SQL (sources/ch_dialect.py) before execution — the porting
    # path for queries written against the reference's passthrough.
    custom_query_dialect: Literal["spark", "clickhouse"] = "spark"
    write_partitions: int | None = None
    # Per-TABLE parallel-read slicing (reference README "All Table
    # Parameters": partitions_column / partitions_count are table-level,
    # not connection-level). Remote extractors read these first and fall
    # back to connection defaults, then to iterate_column.
    partitions_column: str | None = None
    partitions_count: int | None = None
    partition_columns: tuple[str, ...] = ()  # destination partitionBy
    dedup_keys: tuple[str, ...] = ()  # idempotent-append keys
    # columns whose per-batch min/max land in manifest zone maps (the
    # ManifestLoader destination only; plain parquet loaders ignore it)
    stats_columns: tuple[str, ...] = ()
    tags: tuple[str, ...] = ()  # selective execution (reference README.md:116)
    pass_on_error: bool = False

    def __post_init__(self) -> None:
        if self.target_name is None:
            self.target_name = self.name


@dataclass
class ExtractResult:
    """Handoff contract to the loader (reference __init__.py:132-134):
    df=None means "no new data, skip the write".

    ``window`` is the extraction predicate the batch satisfies; the
    loader uses it to bound the idempotent-append anti-join to the
    watermark boundary instead of scanning every historical key.

    ``observation`` carries the watermark aggregate as an
    ``df.observe()`` metric riding the batch's FIRST action (normally
    the loader's write): the reference pays a dedicated
    ``max(iterate_column)`` scan per tick (__init__.py:112) — at a
    100 TB source that is a second full read — whereas the observed
    max is computed by the same tasks that write the data, for free.
    Call :meth:`resolve_last_point` after the batch is materialized."""

    df: DataFrame | None
    write_mode: WriteMode
    last_point_value: str | None = None
    window: FilterSpec | None = None
    observation: Observation | None = None
    iterate_column: str | None = None  # for the guarded-probe fallback

    def resolve_last_point(self) -> str | None:
        """Stringified watermark (reference __init__.py:113-115).

        Zero-cost when an action already ran on ``df`` (the observation
        captured the max during it). For extract-only callers that
        never materialized the batch, this triggers the one dedicated
        scan the reference always pays — detected via the JVM
        observation's non-blocking probe, so it never deadlocks waiting
        for an action that will not come."""
        if self.last_point_value is not None or self.observation is None:
            return self.last_point_value
        try:
            # Non-blocking probe via the JVM observation. getRowOrEmpty
            # is private[sql] Scala — present in the pinned Spark 4.1.2
            # but not public API, so guard it: a pyspark upgrade or a
            # Connect session must degrade to the dedicated max() scan
            # the reference always pays (__init__.py:112), not crash.
            jo = self.observation._jo
            pending = jo is not None and not jo.getRowOrEmpty().isDefined()
        except Exception:
            if self.df is None or self.iterate_column is None:
                return None
            from pyspark.sql import functions as F

            row = self.df.agg(
                F.max(self.iterate_column).alias("max_val")
            ).first()
            val = row["max_val"] if row else None
            self.last_point_value = str(val) if val is not None else None
            return self.last_point_value
        if pending and self.df is not None:
            self.df.count()
        val = self.observation.get["max_val"]
        self.last_point_value = str(val) if val is not None else None
        return self.last_point_value


def plan_window(
    table: TableConfig, last_point: str | None
) -> tuple[FilterSpec | None, WriteMode]:
    """The pure extraction decision tree (reference __init__.py:56-94),
    shared by the fixture extractor and the JDBC plugin surface
    (plugin.py): returns the window predicate (None = full replication)
    and the write mode.

      * incremental + static bounds → append, half-open range
      * incremental + last_point   → append, ``col >= last_point``
      * incremental initial        → overwrite, trivial filter
      * full                       → overwrite, no filter
    """
    if table.replication_method == "incremental" and table.iterate_column:
        has_static_bounds = (
            table.filter_lower_bound is not None
            or table.filter_upper_bound is not None
        )
        if has_static_bounds:
            return (
                FilterSpec(
                    column=table.iterate_column,
                    column_type=table.iterate_column_type,
                    lower=table.filter_lower_bound,
                    upper=table.filter_upper_bound,
                ),
                "append",
            )
        if last_point:
            return (
                FilterSpec(
                    column=table.iterate_column,
                    column_type=table.iterate_column_type,
                    last_point=last_point,
                ),
                "append",
            )
        return FilterSpec(column=table.iterate_column), "overwrite"
    return None, "overwrite"


class ParquetExtractor:
    """The engine's native extractor over the fixture catalog.

    ``source_filter`` lets tests simulate "data arriving over time" by
    constraining what the source can see (FIXTURES.md incremental
    protocol).
    """

    def __init__(self, sf_dir: str, sql_dir: str | None = None):
        self.sf_dir = sf_dir
        self.sql_dir = sql_dir

    def _resolve_custom_query(self, table: TableConfig) -> str | None:
        # reference __init__.py:45-54
        sql = None
        if table.custom_query:
            sql = table.custom_query
        elif table.custom_query_file:
            base = self.sql_dir or os.path.join(os.getcwd(), "sql")
            with open(os.path.join(base, table.custom_query_file)) as f:
                sql = f.read()
        if sql is not None and table.custom_query_dialect == "clickhouse":
            from .ch_dialect import translate

            # dedup_keys + iterate_column double as the ReplacingMergeTree
            # (key, version) contract, letting `FROM t FINAL` translate.
            sql = translate(
                sql,
                final_dedup_keys=table.dedup_keys,
                final_order_col=table.iterate_column,
            )
        return sql

    def _read_source(
        self,
        spark: SparkSession,
        table: TableConfig,
        spec: FilterSpec | None,
        custom_query: str | None,
        source_filter=None,
    ) -> DataFrame:
        """``source_filter`` constrains what the SOURCE can see (the
        FIXTURES.md arrival-simulation protocol) — for custom queries it
        is applied to the source table's view *before* the user SQL
        runs, since the query result need not carry the filter column."""
        if custom_query is not None:
            # S3: the user's SQL runs *natively in Spark* over registered
            # views — this is the reference's ClickHouse-passthrough path
            # (__init__.py:96-101) turned into real query execution.
            # Register only the tables the query text mentions (plus the
            # source table) — not the whole catalog on every tick.
            import re

            # Spark SQL resolves identifiers case-insensitively, so the
            # mention scan must too ('FROM Orders' still needs the view).
            mentioned = [
                t
                for t in SCHEMAS
                if t == table.name
                or re.search(rf"\b{t}\b", custom_query, re.IGNORECASE)
            ]
            register_views(spark, self.sf_dir, mentioned)
            if source_filter is not None:
                load_table(spark, self.sf_dir, table.name).filter(
                    source_filter
                ).createOrReplaceTempView(table.name)
            spliced = splice_query_filter(custom_query, spec)
            try:
                return spark.sql(spliced)
            except AnalysisException:
                # Quoted/exotic identifiers can defeat the mention scan;
                # register the whole catalog (cheap, lazy metadata) and
                # retry before surfacing a resolution error.
                register_views(
                    spark, self.sf_dir, [t for t in SCHEMAS if t not in mentioned]
                )
                return spark.sql(spliced)
        df = load_table(spark, self.sf_dir, table.name)
        if spec is not None and not spec.is_trivial:
            df = df.filter(spec.to_column())
        if source_filter is not None:
            df = df.filter(source_filter)
        return df

    def extract(
        self,
        table: TableConfig,
        spark: SparkSession,
        last_point: str | None = None,
        source_filter=None,
    ) -> ExtractResult:
        # structured-dict log records, reference __init__.py:59-65
        logger.info(
            {
                "table": table.target_name,
                "status": "extracting",
                "replication_method": table.replication_method,
            }
        )
        custom_query = self._resolve_custom_query(table)
        spec, write_mode = plan_window(table, last_point)

        if spec is not None:
            df = self._read_source(spark, table, spec, custom_query, source_filter)

            # Empty probe on the un-observed lineage: take(1) touches
            # minimal input, and must NOT be the observation's first
            # action (the observed metric would then cover one partial
            # scan instead of the whole batch).
            if df.isEmpty():
                if write_mode == "overwrite":
                    # reference __init__.py:105
                    logger.info(
                        {"table": table.target_name, "status": "empty_source_initial_load"}
                    )
                    return ExtractResult(df=df, write_mode=write_mode, window=spec)
                logger.info({"table": table.target_name, "status": "no_new_data"})
                return ExtractResult(df=None, write_mode=write_mode, window=spec)

            # reference __init__.py:125-131
            logger.info(
                {
                    "table": table.target_name,
                    "status": "extracted",
                    "write_mode": write_mode,
                }
            )
            if table.iterate_column in df.columns:
                # Watermark rides the write as an observed metric — no
                # second source scan (see ExtractResult.observation).
                obs = Observation()
                df = df.observe(
                    obs, F.max(table.iterate_column).alias("max_val")
                )
                return ExtractResult(
                    df,
                    write_mode,
                    window=spec,
                    observation=obs,
                    iterate_column=table.iterate_column,
                )
            # The reference aggregates max(iterate_column) over the query
            # *result* (__init__.py:112) and therefore breaks when a
            # custom query doesn't project the iterate column; here we
            # fall back to the filtered base table in that case. The
            # fallback must see the SAME source constraint as the
            # extraction, or the watermark would advance past rows the
            # source never delivered and silently skip them forever.
            wm_df = self._read_source(spark, table, spec, None, source_filter)
            row = wm_df.agg(F.max(table.iterate_column).alias("max_val")).first()
            last_point_value = (
                str(row["max_val"]) if row and row["max_val"] is not None else None
            )
            return ExtractResult(df, write_mode, last_point_value, window=spec)

        # full replication (reference __init__.py:116-123): no filter
        # spec — a custom query gets the trivial WHERE 1=1 splice.
        df = self._read_source(spark, table, None, custom_query, source_filter)
        return ExtractResult(df, "overwrite", None)


def apply_write_partitions(df: DataFrame, n: int) -> DataFrame:
    """Output-file-count control (reference README.md:114).

    ``coalesce`` when shrinking — it merges partitions without a
    shuffle, matching the reference's semantics and cost; ``repartition``
    only when scaling UP, where a shuffle is unavoidable because
    coalesce cannot split partitions."""
    current = df.rdd.getNumPartitions()
    if n <= current:
        return df.coalesce(n)
    return df.repartition(n)


class ParquetLoader:
    """Destination side of the reference's ExtractResult contract:
    overwrite/append parquet writes (reference delegates this to the
    MkPipe loader; write modes at __init__.py:85-93, 116-117)."""

    def __init__(self, dest_dir: str):
        self.dest_dir = dest_dir

    def path(self, table: TableConfig) -> str:
        return os.path.join(self.dest_dir, f"{table.target_name}.parquet")

    def read(self, spark: SparkSession, table: TableConfig) -> DataFrame:
        """Destination read that survives schema evolution: appended
        batches may carry columns earlier batches lack (a source ALTER
        TABLE mid-stream — the reference passes whatever schema the
        connector returns, __init__.py:26-43). A plain parquet read
        adopts one footer's schema and silently drops the others'
        extra columns; ``mergeSchema`` unions footers instead, so new
        columns appear null-filled on pre-evolution rows. Footer
        merging is a driver-side metadata operation (one footer per
        file, not a data scan), so this stays cheap even on large
        destinations."""
        return spark.read.option("mergeSchema", "true").parquet(self.path(table))

    def existing_keys(
        self, spark: SparkSession, table: TableConfig, window: FilterSpec | None
    ) -> DataFrame:
        """Destination keys that could collide with the incoming batch.

        Idempotent-append dedup absorbs the ``>=`` boundary re-read
        (SURVEY §4.2).  Duplicates can only exist where the destination
        overlaps the extraction window — previous ticks wrote rows with
        iterate_column <= last_point, the batch carries >= last_point —
        so the read is bounded to the window predicate: the anti-join
        build side is O(boundary), not O(history), and the filter prunes
        whole directories when the destination is partitioned by the
        iterate column (``partition_columns``) and row groups otherwise
        (parquet min/max pushdown)."""
        existing = spark.read.parquet(self.path(table))
        if (
            window is not None
            and not window.is_trivial
            and window.column in existing.columns
        ):
            existing = existing.filter(window.to_column())
        return existing.select(*table.dedup_keys)

    def load(self, spark: SparkSession, table: TableConfig, result: ExtractResult) -> None:
        if result.df is None:
            return  # no_new_data (__init__.py:107-108)
        df = result.df
        path = self.path(table)
        if result.write_mode == "append" and table.dedup_keys and os.path.exists(path):
            existing = self.existing_keys(spark, table, result.window)
            df = df.join(existing, on=list(table.dedup_keys), how="left_anti")
        if table.write_partitions:
            df = apply_write_partitions(df, table.write_partitions)
        writer = df.write.mode(result.write_mode)
        if table.partition_columns:
            # Hive-style destination layout: boundary-bounded dedup reads
            # and downstream range queries prune whole directories.
            writer = writer.partitionBy(*table.partition_columns)
        writer.parquet(path)


@dataclass
class IncrementalRunner:
    """extract → load → commit-state loop (one MkPipe "pipeline" tick).

    State commit happens after a successful write, and appends are
    idempotent via dedup_keys, so a crash between write and commit
    re-extracts the same window without duplicating rows.
    """

    extractor: ParquetExtractor
    loader: ParquetLoader
    store: WatermarkStore

    def run_once(
        self, spark: SparkSession, table: TableConfig, source_filter=None
    ) -> ExtractResult:
        last_point = self.store.get(table.target_name)
        result = self.extractor.extract(
            table, spark, last_point=last_point, source_filter=source_filter
        )
        self.loader.load(spark, table, result)
        # The write above was the observation's action — resolving the
        # watermark here reads the captured metric, no extra scan.
        last_point = result.resolve_last_point()
        if last_point is not None:
            self.store.set(table.target_name, last_point)
        return result
