"""MergeParquetLoader: partition-scoped copy-on-write upsert
(sources/merge.py) — replacement semantics, partition-touch accounting,
idempotency, and deterministic within-batch version resolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.catalog import load_table
from mkpipe_extractor_clickhouse_spark.sources.extract import (
    ExtractResult,
    TableConfig,
)
from mkpipe_extractor_clickhouse_spark.sources.merge import MergeParquetLoader


@pytest.fixture()
def orders_by_year(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )


def _files_by_partition(dest: str) -> dict[str, frozenset[str]]:
    out = {}
    for d in os.listdir(dest):
        if d.startswith("o_year="):
            p = os.path.join(dest, d)
            out[d] = frozenset(
                f"{f}:{os.path.getmtime(os.path.join(p, f))}"
                for f in os.listdir(p)
            )
    return out


def test_merge_replaces_only_affected_partitions(
    spark, tmp_path, orders_by_year
):
    table = TableConfig(name="orders", dedup_keys=("o_orderkey",))
    loader = MergeParquetLoader(str(tmp_path), partition_col="o_year")
    loader.load(
        spark, table, ExtractResult(df=orders_by_year, write_mode="overwrite")
    )
    dest = loader.path(table)
    before = _files_by_partition(dest)

    updates = orders_by_year.filter(F.col("o_year") == 1998).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    loader.load(spark, table, ExtractResult(df=updates, write_mode="append"))
    after = _files_by_partition(dest)

    # Only the 1998 directory changed — every other partition's files
    # (names AND mtimes) are bit-for-bit untouched.
    assert before["o_year=1998"] != after["o_year=1998"]
    for d in before:
        if d != "o_year=1998":
            assert before[d] == after[d], f"{d} was rewritten"

    merged = spark.read.parquet(dest)
    assert merged.count() == orders_by_year.count()
    n_changed = merged.join(
        orders_by_year.select("o_orderkey", "o_totalprice"), "o_orderkey"
    ).filter(
        merged.o_totalprice != orders_by_year.o_totalprice
    ).count()
    assert n_changed == updates.count() > 0


def test_merge_is_idempotent(spark, tmp_path, orders_by_year):
    table = TableConfig(name="orders", dedup_keys=("o_orderkey",))
    loader = MergeParquetLoader(str(tmp_path), partition_col="o_year")
    loader.load(
        spark, table, ExtractResult(df=orders_by_year, write_mode="overwrite")
    )
    updates = orders_by_year.filter(F.col("o_year") == 1997).withColumn(
        "o_orderstatus", F.lit("X")
    )
    for _ in range(2):  # crash-replay: same tick applied twice
        loader.load(spark, table, ExtractResult(df=updates, write_mode="append"))
    merged = spark.read.parquet(loader.path(table))
    assert merged.count() == orders_by_year.count()
    assert merged.filter(F.col("o_orderstatus") == "X").count() == updates.count()


def test_within_batch_version_resolution_deterministic(spark, tmp_path):
    table = TableConfig(name="kv", dedup_keys=("k",))
    loader = MergeParquetLoader(
        str(tmp_path), partition_col="p", version_col="v"
    )
    base = spark.createDataFrame(
        [(1, 1, 10, "old"), (2, 1, 10, "old")], "k int, p int, v int, payload string"
    )
    loader.load(spark, table, ExtractResult(df=base, write_mode="overwrite"))
    # key 1 arrives twice in one batch: v=30 beats v=20; on a version
    # TIE the struct-max falls through to the payload — 'zz' beats 'aa'.
    batch = spark.createDataFrame(
        [(1, 1, 20, "mid"), (1, 1, 30, "new"), (2, 1, 40, "aa"), (2, 1, 40, "zz")],
        "k int, p int, v int, payload string",
    )
    loader.load(spark, table, ExtractResult(df=batch, write_mode="append"))
    got = {
        r.k: (r.v, r.payload)
        for r in spark.read.parquet(loader.path(table)).collect()
    }
    assert got == {1: (30, "new"), 2: (40, "zz")}


def test_duplicate_keys_without_version_col_raise(spark, tmp_path):
    table = TableConfig(name="kv", dedup_keys=("k",))
    loader = MergeParquetLoader(str(tmp_path), partition_col="p")
    df = spark.createDataFrame([(1, 1, "a"), (1, 1, "b")], "k int, p int, s string")
    with pytest.raises(ValueError, match="duplicate keys"):
        loader.load(spark, table, ExtractResult(df=df, write_mode="overwrite"))
