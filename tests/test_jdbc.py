"""Reader-construction parity for remote sources (no live server in
this environment — construction is pure option plumbing, reference
``mkpipe_extractor_clickhouse/__init__.py:26-43``)."""

from __future__ import annotations

from mkpipe_extractor_clickhouse_spark.sources.jdbc import (
    ClickHouseNativeSource,
    ConnectionConfig,
    JdbcSource,
)


def _options(reader) -> dict:
    # NB: Spark stores reader options in a case-insensitive map → keys lowercased.
    # DataFrameReader internal options map (py4j) — inspect via the
    # JVM's CaseInsensitiveMap.
    jmap = reader._jreader.extraOptions() if hasattr(reader._jreader, "extraOptions") else None
    if jmap is None:
        return {}
    it = jmap.iterator()
    out = {}
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2()
    return out


def test_connection_defaults():
    c = ConnectionConfig(host="ch1", database="analytics")
    assert c.port == 8123  # reference __init__.py:21
    assert c.user == "default"  # reference __init__.py:22
    assert c.password == ""


def test_jdbc_url_and_options(spark):
    src = JdbcSource(ConnectionConfig(host="ch1", database="db"), fetchsize=50_000)
    assert src.url() == "jdbc:clickhouse://ch1:8123/db"
    r = src.reader(spark, "events")
    opts = _options(r)
    assert opts.get("dbtable") == "db.events"
    assert opts.get("fetchsize") == "50000"


def test_jdbc_query_read(spark):
    src = JdbcSource(ConnectionConfig(host="ch1", database="db"))
    r = src.reader(spark, "SELECT * FROM events WHERE 1=1", is_query=True)
    opts = _options(r)
    assert opts.get("query") == "SELECT * FROM events WHERE 1=1"
    assert opts.get("fetchsize") == "100000"  # reference default README.md:111


def test_jdbc_partitioned_table_read(spark):
    src = JdbcSource(ConnectionConfig(host="ch1", database="db"))
    r = src.reader(
        spark,
        "events",
        partitions_column="event_id",
        partitions_count=8,
        lower_bound=0,
        upper_bound=100000,
    )
    opts = _options(r)
    assert opts.get("dbtable") == "db.events"
    assert opts.get("partitioncolumn") == "event_id"
    assert opts.get("numpartitions") == "8"
    assert opts.get("lowerbound") == "0"
    assert opts.get("upperbound") == "100000"


def test_jdbc_query_plus_partitioning_rejected(spark):
    """Spark's JDBC source forbids query+partitionColumn; the reader
    fails fast with a hint instead of erroring at load()."""
    import pytest

    src = JdbcSource(ConnectionConfig(host="ch1", database="db"))
    with pytest.raises(ValueError, match="dbtable"):
        src.reader(
            spark,
            "SELECT 1",
            is_query=True,
            partitions_column="id",
            lower_bound=0,
            upper_bound=10,
        )


def test_clickhouse_native_options(spark):
    src = ClickHouseNativeSource(
        ConnectionConfig(host="ch1", database="db", user="u", password="p")
    )
    r = src.reader(spark, "events")
    opts = _options(r)
    assert opts.get("host") == "ch1"
    assert opts.get("table") == "db.events"  # reference __init__.py:42
    r2 = src.reader(spark, "SELECT 1", is_query=True)
    assert _options(r2).get("query") == "SELECT 1"
