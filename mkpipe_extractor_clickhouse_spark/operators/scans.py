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


N_SLICES = 8


@register(
    "s5_partitioned_parallel_read",
    oracle=f"""
    WITH b AS (
      SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM events
    )
    SELECT ((event_id - lo) * {N_SLICES}) // (hi - lo + 1) AS slice_id,
           COUNT(*) AS n_rows,
           MIN(event_id) AS min_id,
           MAX(event_id) AS max_id
    FROM events CROSS JOIN b
    GROUP BY 1
    """,
    tags=("S5",),
)
def s5_partitioned_parallel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned parallel read (reference README.md:85-89):
    the deterministic stride slicing a JDBC partitioned read performs —
    partition i covers [lo + i·stride, lo + (i+1)·stride) over the
    partition column's observed bounds, exactly how Spark's JDBC source
    turns partitionColumn/lowerBound/upperBound/numPartitions into
    per-task WHERE clauses (sources/jdbc.py builds the real thing).
    Emits per-slice row counts and id bounds — the slice-balance check
    a DBA runs against the reference — and, because the slice function
    is pure arithmetic on values, the whole layout is verified by the
    SQL oracle (hash-match), not just row counts."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    bounds = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    sliced = ev.join(F.broadcast(bounds)).select(
        "event_id",
        ((F.col("event_id") - F.col("lo")) * N_SLICES)
        .cast("long")
        .alias("scaled"),
        (F.col("hi") - F.col("lo") + 1).alias("width"),
    )
    return (
        sliced.select(
            F.expr("scaled div width").alias("slice_id"), "event_id"
        )
        .groupBy("slice_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


@register(
    "s11_format_roundtrip",
    oracle="""
    SELECT fmt,
           COUNT(*) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids,
           CAST(SUM(CAST(TRUNC(value * 1000000
                  + (CASE WHEN value >= 0 THEN 0.5 ELSE -0.5 END))
                AS BIGINT)) AS BIGINT) AS value_checksum,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts
    FROM events
    CROSS JOIN (SELECT UNNEST(['csv', 'json', 'orc']) AS fmt)
    GROUP BY fmt
    """,
    tags=("S1", "S7", "EXT"),
)
def s11_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format coverage beyond parquet/JDBC: events written to
    and read back from CSV, JSON, and ORC with explicit schemas, then
    checksummed per format.  The oracle computes the same checksums
    straight from the parquet source, so a hash-match proves each
    format's round-trip is LOSSLESS — including timestamp_ntz at
    microsecond precision, which requires pinning timestampNTZFormat
    for the text formats (the default truncates).  Explicit read
    schemas keep inference out of the contract, exactly like
    catalog.load_table."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..catalog import SCHEMAS
    from ._determinism import _quantize

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampNTZType())
            if f.name == "ts"
            else f
            for f in SCHEMAS["events"].fields
        ]
    )
    workdir = tempfile.mkdtemp(prefix="s11_fmt_")
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    ntz = {"timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}
    out = None
    for fmt in ("csv", "json", "orc"):
        opts = dict(ntz, header="true") if fmt == "csv" else ntz
        path = os.path.join(workdir, fmt)
        getattr(ev.write.options(**opts), fmt)(path)
        back = getattr(spark.read.schema(schema).options(**opts), fmt)(path)
        agg = back.agg(
            F.count("*").alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_ids"),
            F.sum(_quantize("value")).cast("long").alias("value_checksum"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        ).select(F.lit(fmt).alias("fmt"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out
