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


# Representative strict sample: Arrow-materialized, bit- and
# type-sensitive comparison against the NORMALIZED oracle — the exact
# surface the round driver hashes (full-registry strict runs live in
# scripts/driver_sim.py --strict; this keeps CI pressure on the
# mechanism itself).  Includes all nine r3-flagged queries.
STRICT_SAMPLE = [
    "ch_kendall_tau",
    "ch_ks_test",
    "g1_markov_stationary",
    "g2_pagerank",
    "ts6_cusum_alarms",
    "dq3_histogram_drift",
    "m5_histogram_neardup",
    "l52_bigram_lm_score",
    "x14_clickhouse_dialect_query",
    "q1_pricing_summary",
    "q10_returned_items",
    "a9_percentiles",
    "w5_running_total",
    "l2_jaccard_neardup",
    "l9_label_centroids",
    "l91_phrase_search",
    "t12_stream_topk",
    "dq10_referential_integrity",
    "x33_zorder_pruned_read",
    "f16_geohash",
]


@pytest.mark.parametrize("name", STRICT_SAMPLE)
def test_query_parity_strict(name, spark, oracle, sf_dir):
    from mkpipe_extractor_clickhouse_spark.registry import _normalized_oracle

    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    tab = df.toArrow()
    scols = list(tab.column_names)
    srows = (
        list(zip(*[c.to_pylist() for c in tab.columns]))
        if tab.num_columns
        else []
    )
    otab = oracle.sql(_normalized_oracle(name, spec.oracle)).fetch_arrow_table()
    ocols = list(otab.column_names)
    orows = (
        list(zip(*[c.to_pylist() for c in otab.columns]))
        if otab.num_columns
        else []
    )
    compare_results(scols, srows, ocols, orows, strict=True)
