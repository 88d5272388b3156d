"""Scan/source operators (SURVEY §2.1 S1-S10).

S1/S2 are the reference's two read shapes — whole table vs pushdown
query (reference ``mkpipe_extractor_clickhouse/__init__.py:35-43``);
here the "pushdown" engine is Spark itself (spark.sql over views).
S5's range-partitioned parallel read is declared rows-only: partition
layout is invisible to values by design. Sinks (S7/S8/S10) are
exercised in tests/test_extract.py and by x1_incremental_replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..registry import register


@register(
    "s1_full_scan",
    oracle="SELECT * FROM lineitem",
    tags=("S1",),
    bench=True,
)
def s1_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (reference __init__.py:42,122): every column,
    every row — the `replication_method: full` read."""
    return load_table(spark, sf_dir, "lineitem")


@register(
    "s2_query_pushdown",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice > 1000 AND o_orderstatus = 'F'
    """,
    tags=("S2", "P1"),
)
def s2_query_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-shaped read (reference __init__.py:39-40): arbitrary user
    SQL executed by the engine — Catalyst pushes the filter and prunes
    columns down to the parquet scan."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_totalprice > 1000 AND o_orderstatus = 'F'
        """
    )


@register(
    "s5_partitioned_parallel_read",
    oracle=None,  # partition layout is value-invisible → rows-only
    tags=("S5",),
)
def s5_partitioned_parallel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned parallel read (reference README.md:85-89): the
    fixtures analogue of JDBC partitionColumn/numPartitions is
    repartitionByRange on the partitions column. Returns per-slice row
    counts — the balance check a DBA would run on the reference."""
    ev = load_table(spark, sf_dir, "events").repartitionByRange(8, F.col("event_id"))
    return (
        ev.groupBy(F.spark_partition_id().alias("slice_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("slice_id")
    )
