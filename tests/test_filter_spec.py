"""Property tests for the filter-spec builder (SURVEY §5.4): for random
bounds/types, the typed Column predicate and the rendered SQL clause
must both reproduce the reference's semantics — lower-inclusive /
upper-exclusive (reference __init__.py:76-83), ``>=`` watermark
(__init__.py:89-91), typed literal rendering."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from mkpipe_extractor_clickhouse_spark.sources.filter_spec import (
    FilterSpec,
    splice_query_filter,
)

ints = st.integers(min_value=-(10**6), max_value=10**6)
dts = st.datetimes(
    min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 1, 1)
).map(lambda d: d.replace(microsecond=0))


def eval_int(spec: FilterSpec, x: int) -> bool:
    """Pure-python reference semantics."""
    if spec.lower is not None or spec.upper is not None:
        ok = True
        if spec.lower is not None:
            ok = ok and x >= int(spec.lower)
        if spec.upper is not None:
            ok = ok and x < int(spec.upper)
        return ok
    if spec.last_point is not None:
        return x >= int(spec.last_point)
    return True


@settings(max_examples=200, deadline=None)
@given(lo=st.none() | ints, hi=st.none() | ints, x=ints)
def test_int_bounds_semantics_sql(lo, hi, x):
    spec = FilterSpec(column="c", column_type="int", lower=lo, upper=hi)
    sql = spec.to_sql()
    if lo is None and hi is None:
        assert sql == "WHERE 1=1"
    else:
        assert ("c >= " + str(lo) in sql) == (lo is not None)
        assert ("c < " + str(hi) in sql) == (hi is not None)
        assert "'" not in sql  # int literals unquoted (__init__.py:75-76)
    # SQL text agrees with pure-python evaluation
    import duckdb

    got = duckdb.sql(f"SELECT 1 FROM (SELECT {x} AS c) t {sql}").fetchall()
    assert bool(got) == eval_int(spec, x)


@settings(max_examples=100, deadline=None)
@given(lp=ints, x=ints)
def test_int_watermark_ge(lp, x):
    spec = FilterSpec(column="c", column_type="int", last_point=lp)
    assert f"c >= {lp}" in spec.to_sql()
    import duckdb

    got = duckdb.sql(f"SELECT 1 FROM (SELECT {x} AS c) t {spec.to_sql()}").fetchall()
    assert bool(got) == (x >= lp)  # >= not > : boundary row re-extracted


@settings(max_examples=50, deadline=None)
@given(lp=dts, x=dts)
def test_datetime_watermark(lp, x):
    spec = FilterSpec(column="c", column_type="datetime", last_point=str(lp))
    sql = spec.to_sql("ansi")
    assert "TIMESTAMP '" in sql  # datetime literals quoted (__init__.py:78)
    assert "TIMESTAMP_NTZ" in spec.to_sql("spark")  # TZ-free on the engine side
    import duckdb

    got = duckdb.sql(
        f"SELECT 1 FROM (SELECT TIMESTAMP '{x}' AS c) t {sql}"
    ).fetchall()
    assert bool(got) == (x >= lp)


def test_splice():
    spec = FilterSpec(column="ts", column_type="datetime", last_point="2024-01-15 00:00:00")
    q = "SELECT * FROM t {query_filter} ORDER BY 1"
    assert (
        splice_query_filter(q, spec)
        == "SELECT * FROM t WHERE ts >= TIMESTAMP_NTZ '2024-01-15 00:00:00' ORDER BY 1"
    )
    assert splice_query_filter(q, None) == "SELECT * FROM t WHERE 1=1 ORDER BY 1"


def test_spec_column_matches_sql_on_spark(spark, sf_dir):
    """Column-expression path ≡ SQL path on a real table."""
    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    for spec in [
        FilterSpec(column="event_id", column_type="int", lower=100, upper=700),
        FilterSpec(column="event_id", column_type="int", last_point=500),
        FilterSpec(column="ts", column_type="datetime", last_point="2024-01-15 00:00:00"),
        FilterSpec(
            column="ts",
            column_type="datetime",
            lower="2024-01-10 00:00:00",
            upper="2024-01-20 00:00:00",
        ),
        FilterSpec(column="event_id"),
    ]:
        ev.createOrReplaceTempView("events")
        n_col = ev.filter(spec.to_column()).count()
        n_sql = spark.sql(f"SELECT * FROM events {spec.to_sql()}").count()
        assert n_col == n_sql
