"""Fixture catalog: explicit schemas + loaders + temp-view registration.

The reference's data model is "named table in a remote columnar store →
Spark DataFrame" (reference ``mkpipe_extractor_clickhouse/__init__.py:35-43``);
here the columnar store is parquet at ``/root/testdata/sf*/`` and every
table is loaded with an EXPLICIT schema so behavior never depends on the
caller's session configuration (schema inference, NTZ inference, ...).

Timestamps are ``timestamp_ntz`` throughout: the fixture parquet stores
naive (isAdjustedToUTC=false) timestamps, and NTZ keeps every downstream
date function independent of the session timezone — which matters because
the DuckDB oracle sees naive timestamps too.

``events.ts`` has shipped in two physical encodings across fixture
generations: INT64(TIMESTAMP(NANOS,false)) — which Spark's parquet reader
rejects unless read as a raw long via
``spark.sql.legacy.parquet.nanosAsLong=true`` — and plain
TIMESTAMP(MICROS,false). ``load_table`` probes the parquet footer once per
``sf_dir`` (driver-side metadata read, no data scan) and branches: nanos
are read as longs and rebuilt into NTZ with integer arithmetic only
(exact, TZ-free; DuckDB truncates the same nanos to micros, so the two
engines agree bit-for-bit), micros are read directly as NTZ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_ntz = T.TimestampNTZType()

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", _ntz),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", _ntz),
        ]
    ),
    # ts: LongType is a placeholder — load_table() swaps it for the
    # encoding the file actually uses (raw nanos long → converted, or
    # TIMESTAMP(MICROS) → read directly as NTZ).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (file path, mtime_ns, size) → events.ts parquet time unit ("ns"/"us").
# Keyed by the probed file's identity, NOT just sf_dir: fixtures are
# regenerated in place between driver rounds with differing ts encodings
# (the very situation this probe exists for), so a dir-keyed cache in a
# long-lived process would read events with a stale unit — the ~1000×
# / 1970-date corruption mode. A footer read is cheap; the cache only
# dedups repeated probes of an *unchanged* file.
_TS_UNIT_CACHE: dict[tuple[str, int, int], str] = {}


def _events_ts_unit(sf_dir: str) -> str:
    """Probe the events parquet footer for ts's physical time unit.

    Driver-side metadata read only (no row groups touched). Fixture
    generations differ: some store INT64(TIMESTAMP(NANOS,false)), some
    TIMESTAMP(MICROS,false); the loader must handle both.
    """
    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        part = next(
            p for p in sorted(os.listdir(path)) if p.endswith(".parquet")
        )
        path = os.path.join(path, part)
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    unit = _TS_UNIT_CACHE.get(key)
    if unit is None:
        import pyarrow.parquet as pq

        unit = pq.read_schema(path).field("ts").type.unit
        _TS_UNIT_CACHE[key] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its explicit schema.

    Explicit schemas keep the scan's ReadSchema exact and make column
    pruning/pushdown predictable; conversion of nanos-encoded events.ts
    stays integer arithmetic (``div``), so it is exact and ANSI-safe.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name != "events":
        return spark.read.schema(SCHEMAS[name]).parquet(
            table_path(sf_dir, name)
        )

    schema = SCHEMAS["events"]
    if _events_ts_unit(sf_dir) == "ns":
        # Dynamic conf; required for the INT64(TIMESTAMP(NANOS)) column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(schema).parquet(table_path(sf_dir, name))
        return df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    schema = T.StructType(
        [
            T.StructField("ts", _ntz) if f.name == "ts" else f
            for f in schema.fields
        ]
    )
    return spark.read.schema(schema).parquet(table_path(sf_dir, name))


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register fixture tables as temp views (for the spark.sql path)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
