"""Differential-oracle parity: run every registered QuerySpec on Spark
and its DuckDB oracle SQL, compare like the driver does (SURVEY §5).

Queries without oracle SQL get a rows-only smoke (runs, stable schema,
deterministic across two executions)."""

from __future__ import annotations

import pytest

from mkpipe_extractor_clickhouse_spark.registry import all_specs

from ._compare import compare_results

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, oracle, sf_dir):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)
    assert len(spark_cols) == len(set(spark_cols)), f"duplicate column names: {spark_cols}"

    if spec.oracle is None:
        # rows-only: re-run and require deterministic output shape
        df2 = spec.builder(spark, sf_dir)
        assert list(df2.columns) == spark_cols
        assert len([tuple(r) for r in df2.collect()]) == len(spark_rows)
        return

    res = oracle.sql(spec.oracle)
    oracle_cols = list(res.columns)
    oracle_rows = res.fetchall()
    compare_results(spark_cols, spark_rows, oracle_cols, oracle_rows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == len(set(df.columns))


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
