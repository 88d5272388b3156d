"""Hive-style partition pruning (SURVEY §4 'partition pruning' row):
a date-partitioned lake layout must let a day filter skip whole
directories — at 100 TB this is the difference between scanning one
day and scanning three years."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.catalog import load_table
from mkpipe_extractor_clickhouse_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    return out


def test_day_filter_prunes_partitions(spark, sf_dir, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("day") == "2024-01-15")
    plan = formatted_plan(df)
    # the day predicate must appear as a PartitionFilter on the scan,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "day" in pf
    n = df.count()
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").cast("date") == F.lit("2024-01-15").cast("date"))
        .count()
    )
    assert n == want


def test_partition_column_scan_reads_no_data_files_for_count(
    spark, partitioned_events
):
    """Counting rows per day touches parquet footers/partition dirs but
    the ReadSchema for a day-only projection is empty — column pruning
    down to zero data columns."""
    df = spark.read.parquet(partitioned_events).select("day").distinct()
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "struct<>" in read_schema
