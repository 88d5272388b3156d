"""Extractor lifecycle tests: every branch of the reference decision
tree (reference __init__.py:56-134) — full, incremental-initial,
incremental-advance, static bounds, empty probe, no-new-data, custom
query file — plus loader write modes S7/S8 and idempotent append."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.catalog import load_table
from mkpipe_extractor_clickhouse_spark.sources.extract import (
    IncrementalRunner,
    ParquetExtractor,
    ParquetLoader,
    TableConfig,
)
from mkpipe_extractor_clickhouse_spark.sources.state import WatermarkStore


@pytest.fixture
def runner(tmp_path, sf_dir):
    return IncrementalRunner(
        extractor=ParquetExtractor(sf_dir),
        loader=ParquetLoader(str(tmp_path)),
        store=WatermarkStore(str(tmp_path / "state.json")),
    )


def test_full_replication_overwrite(spark, sf_dir, runner, tmp_path):
    table = TableConfig(name="nation", replication_method="full")
    res = runner.run_once(spark, table)
    assert res.write_mode == "overwrite"
    assert res.last_point_value is None
    assert spark.read.parquet(str(tmp_path / "nation.parquet")).count() == 25
    # run twice: overwrite stays exact, not doubled
    runner.run_once(spark, table)
    assert spark.read.parquet(str(tmp_path / "nation.parquet")).count() == 25


def test_incremental_initial_then_advance(spark, sf_dir, runner):
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        dedup_keys=("event_id",),
    )
    full_count = load_table(spark, sf_dir, "events").count()
    # initial: no state → overwrite + trivial filter (__init__.py:92-94)
    res1 = runner.run_once(spark, table, source_filter=F.col("event_id") < 500)
    assert res1.write_mode == "overwrite"
    assert res1.last_point_value == "499"
    # advance: state → append with >= (__init__.py:86-91)
    res2 = runner.run_once(spark, table)
    assert res2.write_mode == "append"
    assert res2.last_point_value == str(full_count - 1)
    dest = spark.read.parquet(runner.loader.path(table))
    assert dest.count() == full_count  # boundary row deduped
    # no new data: empty probe returns df=None (__init__.py:107-108)
    res3 = runner.extractor.extract(
        table, spark, last_point=str(full_count + 100)
    )
    assert res3.df is None
    assert res3.write_mode == "append"


def test_incremental_initial_empty_source(spark, sf_dir, runner):
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
    )
    res = runner.extractor.extract(
        table, spark, source_filter=F.lit(False)
    )
    # empty + initial load → empty df with overwrite (__init__.py:104-106)
    assert res.df is not None
    assert res.df.count() == 0
    assert res.write_mode == "overwrite"


def test_static_bounds_append(spark, sf_dir, runner):
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        filter_lower_bound=100,
        filter_upper_bound=200,
    )
    res = runner.extractor.extract(table, spark)
    assert res.write_mode == "append"
    ids = [r.event_id for r in res.df.select("event_id").collect()]
    assert min(ids) == 100 and max(ids) == 199  # half-open [100, 200)


def test_write_partitions_coalesce_no_shuffle(spark, sf_dir):
    """Shrinking the output file count must not insert a shuffle
    (coalesce semantics, reference README.md:114); growing it must."""
    from mkpipe_extractor_clickhouse_spark.sources.extract import (
        apply_write_partitions,
    )

    df = spark.range(0, 1000, 1, 8).toDF("n")
    shrunk = apply_write_partitions(df, 2)
    plan = _plan(shrunk)
    assert shrunk.rdd.getNumPartitions() == 2
    assert "Coalesce" in plan and "Exchange" not in plan
    grown = apply_write_partitions(df, 16)
    assert grown.rdd.getNumPartitions() == 16
    assert "Exchange" in _plan(grown)


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_append_dedup_bounded_to_window(spark, sf_dir, runner):
    """The idempotent-append anti-join must read only boundary keys from
    the destination, not the full history (VERDICT r1 scale fix)."""
    from mkpipe_extractor_clickhouse_spark.sources.filter_spec import FilterSpec

    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        dedup_keys=("event_id",),
    )
    runner.run_once(spark, table, source_filter=F.col("event_id") < 300)
    runner.run_once(spark, table, source_filter=F.col("event_id") < 600)
    # Destination now holds 600 rows; a boundary-bounded keys read for
    # the next window (>= 599) must see exactly the 1 boundary row.
    window = FilterSpec(column="event_id", column_type="int", last_point="599")
    existing = runner.loader.existing_keys(spark, table, window)
    assert existing.count() == 1
    # and the bound reaches the parquet scan, not a post-scan filter only
    plan = _plan(existing)
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "event_id" in pushed and "GreaterThanOrEqual" in pushed
    # idempotency is preserved end-to-end with the bounded read
    res = runner.run_once(spark, table)
    assert res.write_mode == "append"
    dest = spark.read.parquet(runner.loader.path(table))
    n_source = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert dest.count() == n_source
    assert dest.select("event_id").distinct().count() == n_source


def test_partitioned_destination_prunes_boundary_read(spark, sf_dir, runner):
    """With partition_columns on the iterate column, the bounded
    existing-keys read prunes whole partition directories."""
    table = TableConfig(
        name="events",
        target_name="events_part",
        replication_method="incremental",
        iterate_column="user_id",
        iterate_column_type="int",
        partition_columns=("user_id",),
        dedup_keys=("event_id",),
    )
    runner.run_once(spark, table, source_filter=F.col("user_id") < 8)
    res = runner.run_once(spark, table)
    assert res.write_mode == "append"
    dest = spark.read.parquet(runner.loader.path(table))
    n_source = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert dest.count() == n_source
    assert dest.select("event_id").distinct().count() == n_source
    # hive-style layout written
    assert os.path.isdir(os.path.join(runner.loader.path(table), "user_id=0"))
    # the boundary read turns the window predicate into a PartitionFilter
    from mkpipe_extractor_clickhouse_spark.sources.filter_spec import FilterSpec

    window = FilterSpec(column="user_id", column_type="int", last_point="14")
    plan = _plan(runner.loader.existing_keys(spark, table, window))
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "user_id" in pf and ">= 14" in pf


def test_custom_query_file(spark, sf_dir, tmp_path):
    sql_dir = tmp_path / "sql"
    sql_dir.mkdir()
    (sql_dir / "q.sql").write_text(
        "SELECT user_id, COUNT(*) AS n FROM events {query_filter} GROUP BY user_id"
    )
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        custom_query_file="q.sql",
    )
    ex = ParquetExtractor(sf_dir, sql_dir=str(sql_dir))
    res = ex.extract(table, spark, last_point="900")
    assert res.df is not None
    assert set(res.df.columns) == {"user_id", "n"}


def test_write_partitions(spark, sf_dir, runner, tmp_path):
    table = TableConfig(name="events", write_partitions=2)
    runner.run_once(spark, table)
    files = [
        f
        for f in os.listdir(tmp_path / "events.parquet")
        if f.endswith(".parquet")
    ]
    assert len(files) == 2  # coalesce(write_partitions), reference README.md:114


def test_custom_query_watermark_respects_source_filter(spark, sf_dir, runner):
    """The watermark fallback for custom queries that don't project the
    iterate column must not advance past what the source delivered —
    otherwise later arrivals below the premature watermark are lost."""
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        custom_query=(
            "SELECT user_id, COUNT(*) AS n FROM events {query_filter} "
            "GROUP BY user_id"
        ),
    )
    res = runner.extractor.extract(
        table, spark, source_filter=F.col("event_id") < 500
    )
    assert res.last_point_value == "499"  # not the full table's max


def test_custom_query_case_insensitive_view_registration(spark, sf_dir):
    """'FROM Orders' must resolve even though the catalog name is
    lowercase (Spark identifiers are case-insensitive)."""
    spark.catalog.dropTempView("orders")
    ex = ParquetExtractor(sf_dir)
    table = TableConfig(name="events", custom_query="SELECT COUNT(*) AS n FROM Orders")
    res = ex.extract(table, spark)
    assert res.df.collect()[0]["n"] > 0


def test_watermark_store_concurrent_commits(tmp_path):
    """Two writers sharing one state file must not lose each other's
    committed watermarks (fcntl-locked read-modify-write)."""
    import threading

    from mkpipe_extractor_clickhouse_spark.sources.state import WatermarkStore

    store = WatermarkStore(str(tmp_path / "state.json"))

    def commit(prefix: str):
        s = WatermarkStore(store.path)  # own fd per writer
        for i in range(50):
            s.set(f"{prefix}_{i}", str(i))

    threads = [threading.Thread(target=commit, args=(p,)) for p in ("a", "b", "c")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    state = store._read()
    assert len(state) == 150


def test_schema_evolution_append_preserves_new_column(spark, sf_dir, runner):
    """A column added to the source mid-stream must survive the append
    and be readable from the destination (null-filled on pre-evolution
    rows) — the reference ships whatever schema the connector returns,
    so destination reads must merge footers, not adopt one."""
    table = TableConfig(
        name="events",
        target_name="events_evolve",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        dedup_keys=("event_id",),
    )
    runner.run_once(spark, table, source_filter=F.col("event_id") < 500)
    # source evolves: later batches carry an extra column
    evolved = F.col("event_id") >= 500

    orig_extract = runner.extractor.extract

    def extract_evolved(tbl, sp, last_point=None, source_filter=None):
        res = orig_extract(tbl, sp, last_point=last_point, source_filter=source_filter)
        if res.df is not None:
            res.df = res.df.filter(evolved).withColumn(
                "ingest_tag", F.lit("v2")
            )
        return res

    runner.extractor.extract = extract_evolved
    try:
        res = runner.run_once(spark, table)
    finally:
        runner.extractor.extract = orig_extract
    assert res.write_mode == "append"
    dest = runner.loader.read(spark, table)
    n_source = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert "ingest_tag" in dest.columns
    assert dest.count() == n_source
    # pre-evolution rows are null-tagged, post-evolution rows tagged v2
    assert dest.filter(F.col("ingest_tag").isNull()).count() == 500
    assert dest.filter(F.col("ingest_tag") == "v2").count() == n_source - 500
    # a plain read would have been footer-lottery; the helper is stable
    assert set(dest.columns) >= {"event_id", "ingest_tag"}


def test_watermark_observation_rides_the_write(spark, sf_dir, runner):
    """The watermark must be captured by the load's own action: after
    run_once the observation is already resolved (no extra scan), and
    an extract-only caller still gets the value via the explicit
    fallback scan in resolve_last_point()."""
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
        dedup_keys=("event_id",),
    )
    res = runner.run_once(spark, table)
    assert res.observation is not None
    # resolved during run_once: the JVM observation already holds a row
    assert res.observation._jo.getRowOrEmpty().isDefined()
    assert res.last_point_value is not None

    # extract-only path: no action has run; resolve pays one scan
    res2 = runner.extractor.extract(
        table, spark, last_point="-1", source_filter=F.col("event_id") < 100
    )
    assert res2.last_point_value is None  # lazy until resolved
    assert not res2.observation._jo.getRowOrEmpty().isDefined()
    assert res2.resolve_last_point() == "99"


def test_resolve_last_point_survives_private_api_loss(spark, sf_dir):
    """The observation probe rides a private[sql] JVM method; if a Spark
    upgrade removes it, resolve_last_point must degrade to the dedicated
    max(iterate_column) scan — never crash watermark resolution."""
    ex = ParquetExtractor(sf_dir)
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        iterate_column_type="int",
    )
    res = ex.extract(table, spark)
    assert res.observation is not None

    class _Broken:
        @property
        def _jo(self):
            raise AttributeError("getRowOrEmpty is gone in this Spark")

        @property
        def get(self):
            raise AttributeError("unreachable")

    n = res.df.count()  # materialize; fallback then re-aggregates
    res.observation = _Broken()
    lp = res.resolve_last_point()
    assert lp == str(n - 1)  # event_id is 0..n-1 in the fixtures


def test_events_ts_unit_cache_invalidated_on_regeneration(tmp_path):
    """Fixtures are regenerated in place between rounds with differing
    ts encodings; the footer-probe cache must key on file identity
    (mtime/size), not directory name, or a long-lived process reads the
    stale unit — the 1970-dates corruption mode."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mkpipe_extractor_clickhouse_spark import catalog

    path = str(tmp_path / "events.parquet")
    t_us = pa.table({"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us"))})
    pq.write_table(t_us, path)
    assert catalog._events_ts_unit(str(tmp_path)) == "us"

    t_ns = pa.table({"ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))})
    pq.write_table(t_ns, path)
    # ensure a distinct mtime even on coarse-granularity filesystems
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert catalog._events_ts_unit(str(tmp_path)) == "ns"


def test_catalog_ts_unit_probe_and_cache_invalidation(spark, tmp_path):
    """events.ts has shipped as TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    across fixture regenerations (SKILL.md gotcha). The catalog must
    (a) read BOTH encodings to real 2024 timestamps — a wrong unit
    shows up as ~1970 dates — and (b) re-probe when the file is
    REGENERATED IN PLACE (the unit cache keys on file identity, not
    path)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    d = tmp_path / "fixtures"
    d.mkdir()
    ts_val = datetime.datetime(2024, 1, 15, 12, 0, 0)

    def write_events(unit: str) -> None:
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([ts_val, ts_val], pa.timestamp(unit)),
                "user_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(['{"k": 1}', '{"k": 2}']),
            }
        )
        pq.write_table(t, d / "events.parquet")

    write_events("us")
    got = load_table(spark, str(d), "events").select("ts").first()[0]
    assert got.year == 2024, got

    # regeneration IN PLACE with the other encoding — the probe must
    # not serve a stale cached unit (ADVICE: cache keyed by identity)
    write_events("ns")
    got2 = load_table(spark, str(d), "events").select("ts").first()[0]
    assert got2.year == 2024, got2
