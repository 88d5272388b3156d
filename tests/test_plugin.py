"""Packaging/plugin surface: the entry point declared in pyproject.toml
must resolve to a real class with the reference's registration contract
(variant='clickhouse', reference setup.py:10-14 + __init__.py:17), and
plan_extract must synthesize the same pushdown shapes the reference
interpolates (reference __init__.py:66-99)."""

from __future__ import annotations

import tomllib
from importlib import import_module
from pathlib import Path

import pytest

from mkpipe_extractor_clickhouse_spark.plugin import ClickhouseSparkExtractor
from mkpipe_extractor_clickhouse_spark.sources.extract import TableConfig

REPO = Path(__file__).resolve().parent.parent

CONFIG = {"host": "ch.example", "database": "warehouse", "port": 9999, "fetchsize": 5000}


def test_entry_point_declared_and_resolvable():
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    eps = meta["project"]["entry-points"]["mkpipe.extractors"]
    target = eps["clickhouse"]  # same group/name as the reference
    mod_name, _, attr = target.partition(":")
    cls = getattr(import_module(mod_name), attr)
    assert cls is ClickhouseSparkExtractor
    assert cls.variant == "clickhouse"


def test_console_script_resolvable():
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    target = meta["project"]["scripts"]["mkpipe-extractor-clickhouse-spark"]
    mod_name, _, attr = target.partition(":")
    assert callable(getattr(import_module(mod_name), attr))


def test_plan_extract_incremental_pushdown(spark):
    ex = ClickhouseSparkExtractor(CONFIG)
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="ts",
        iterate_column_type="datetime",
    )
    plan = ex.plan_extract(spark, table, last_point="2024-01-02 00:00:00")
    assert plan.write_mode == "append"
    assert plan.sql == (
        "SELECT * FROM warehouse.events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'"
    )
    assert ex.source.fetchsize == 5000
    assert ex.source.url() == "jdbc:clickhouse://ch.example:9999/warehouse"


def test_plan_extract_full_partitioned(spark):
    ex = ClickhouseSparkExtractor(CONFIG)
    table = TableConfig(name="events")
    plan = ex.plan_extract(
        spark,
        table,
        partitions_column="event_id",
        partitions_count=4,
        lower_bound=0,
        upper_bound=1000,
    )
    assert plan.write_mode == "overwrite"
    assert plan.sql is None and plan.window is None


def test_plan_extract_custom_query_splice(spark):
    ex = ClickhouseSparkExtractor(CONFIG)
    table = TableConfig(
        name="events",
        replication_method="incremental",
        iterate_column="event_id",
        custom_query="SELECT event_id, value FROM events {query_filter}",
    )
    plan = ex.plan_extract(spark, table, last_point="42")
    assert plan.sql == "SELECT event_id, value FROM events WHERE event_id >= 42"


def test_plan_extract_initial_overwrite(spark):
    ex = ClickhouseSparkExtractor(CONFIG)
    table = TableConfig(
        name="events", replication_method="incremental", iterate_column="event_id"
    )
    plan = ex.plan_extract(spark, table, last_point=None)
    assert plan.write_mode == "overwrite"
    assert plan.sql is None  # trivial window → plain table read
