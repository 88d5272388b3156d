"""Projection / predicate operators (SURVEY §2.2 P1-P6).

P2-P5 are built through the typed FilterSpec (sources/filter_spec.py)
so the declared queries exercise the same predicate builder the
extractor uses — semantics from reference
``mkpipe_extractor_clickhouse/__init__.py:73-94``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..sources.filter_spec import FilterSpec


@register(
    "p1_projection",
    oracle="SELECT event_id, user_id, event_type, ts FROM events",
    tags=("P1",),
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection (reference README.md:63 custom-query shape) —
    ReadSchema on the scan carries only these four columns."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )


@register(
    "p2_trivial_predicate",
    oracle="SELECT COUNT(*) AS n FROM events WHERE 1=1",
    tags=("P2",),
)
def p2_trivial_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE 1=1 (reference __init__.py:94,119): the initial-load /
    full-run trivial filter, via FilterSpec's trivial shape."""
    spec = FilterSpec(column="event_id")
    ev = load_table(spark, sf_dir, "events").filter(spec.to_column())
    return ev.agg(F.count("*").alias("n"))


@register(
    "p3_watermark_datetime",
    oracle="SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'",
    tags=("P3", "P5"),
)
def p3_watermark_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime watermark predicate (reference __init__.py:90-91):
    quoted→typed literal, ``>=`` for boundary re-read parity."""
    spec = FilterSpec(column="ts", column_type="datetime", last_point="2024-01-15 00:00:00")
    return load_table(spark, sf_dir, "events").filter(spec.to_column())


@register(
    "p4_range_predicate",
    oracle="""
    SELECT * FROM events
    WHERE event_id >= 1000 AND event_id < 4000
    """,
    tags=("P4", "P5"),
)
def p4_range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open static range (reference __init__.py:73-84): lower
    inclusive, upper exclusive, int literals unquoted."""
    spec = FilterSpec(column="event_id", column_type="int", lower=1000, upper=4000)
    return load_table(spark, sf_dir, "events").filter(spec.to_column())


@register(
    "p6_compound_predicate",
    oracle="""
    SELECT event_id, event_type, value, props FROM events
    WHERE (event_type IN ('click', 'view') AND value BETWEEN 10 AND 90)
       OR (event_type = 'error' AND NOT props LIKE '%"k": 1%')
    """,
    tags=("P6",),
)
def p6_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT/IN/BETWEEN/LIKE compound — the boolean surface users
    push through custom_query (reference README.md:57-66)."""
    ev = load_table(spark, sf_dir, "events")
    cond = (
        F.col("event_type").isin("click", "view")
        & F.col("value").between(10, 90)
    ) | ((F.col("event_type") == "error") & ~F.col("props").like('%"k": 1%'))
    return ev.filter(cond).select("event_id", "event_type", "value", "props")
