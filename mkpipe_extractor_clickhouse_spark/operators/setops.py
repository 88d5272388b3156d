"""Set operations (SURVEY §2.7 U1-U4) — UNION [ALL] / INTERSECT /
EXCEPT over compatible relations, by-name resolution on the Spark side
(unionByName avoids silent positional mismatches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import DSUM, dsum


def _typed(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("event_id", "user_id", "value")
    )


@register(
    "u1_union_all",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, value FROM events WHERE event_type = 'view'
    """,
    tags=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no dedup shuffle."""
    return _typed(spark, sf_dir, "click").unionByName(_typed(spark, sf_dir, "view"))


@register(
    "u2_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
    tags=("U2",),
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — dedup via hash aggregation on the union."""
    return (
        _typed(spark, sf_dir, "click")
        .select("user_id")
        .unionByName(_typed(spark, sf_dir, "view").select("user_id"))
        .distinct()
    )


@register(
    "u3_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("U3",),
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — planned as a left-semi join on all cols."""
    return (
        _typed(spark, sf_dir, "purchase")
        .select("user_id")
        .intersect(_typed(spark, sf_dir, "error").select("user_id"))
    )


@register(
    "u4_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U4",),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — planned as a left-anti join."""
    return (
        _typed(spark, sf_dir, "view")
        .select("user_id")
        .subtract(_typed(spark, sf_dir, "purchase").select("user_id"))
    )


@register(
    "u5_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {DSUM.format(x='l_quantity')} AS sum_qty,
             {DSUM.format(x='l_discount')} AS sum_disc,
             {DSUM.format(x='l_tax')} AS sum_tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_tax', sum_tax FROM wide
    """,
    tags=("U1", "A6", "unpivot"),
)
def u5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-flag aggregates → long (flag, measure,
    value) — the inverse of pv1_pivot, via the native unpivot operator
    (no join, one generate per row)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_discount").alias("sum_disc"),
        dsum("l_tax").alias("sum_tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_disc", "sum_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "u6_union_by_name",
    oracle="""
    SELECT o_orderkey AS id, o_totalprice AS amount,
           o_orderpriority AS priority, NULL AS l_returnflag
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey AS id, l_extendedprice AS amount,
           NULL AS priority, l_returnflag
    FROM lineitem WHERE l_orderkey % 100 = 0 AND l_linenumber = 1
    """,
    tags=("U1", "EXT", "schema-evolution"),
)
def u6_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — ``unionByName(allowMissingColumns)``:
    two relations sharing only part of their schema combine by COLUMN
    NAME with absent columns null-filled (the old-snapshot/new-snapshot
    shape after an ALTER TABLE, and the only safe union for evolving
    pipelines — positional UNION silently mis-aligns). The oracle
    states the equivalent explicit NULL padding."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") % 100 == 0) & (F.col("l_linenumber") == 1))
        .select(
            F.col("l_orderkey").alias("id"),
            F.col("l_extendedprice").alias("amount"),
            "l_returnflag",
        )
    )
    return o.unionByName(li, allowMissingColumns=True)


@register(
    "u7_intersect_except_all",
    oracle="""
    WITH a AS (
      SELECT event_type, user_id FROM events WHERE value > 100
    ),
    b AS (
      SELECT event_type, user_id FROM events WHERE event_id % 2 = 0
    ),
    i AS (SELECT *, 'intersect_all' AS op FROM (
            SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
    e AS (SELECT *, 'except_all' AS op FROM (
            SELECT * FROM a EXCEPT ALL SELECT * FROM b))
    SELECT * FROM i UNION ALL SELECT * FROM e
    """,
    tags=("U3", "U4", "EXT"),
)
def u7_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INTERSECT ALL`` / ``EXCEPT ALL`` — the bag-semantics set
    operations (U3/U4 are the DISTINCT forms): multiplicities are
    min(m, n) and max(m − n, 0) respectively, which is what row-level
    audit diffs need (a dropped DUPLICATE must count). Spark's
    intersectAll/exceptAll plan as a single aggregate-on-count
    exchange per side — no pairwise anything."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 100).select("event_type", "user_id")
    b = ev.filter(F.col("event_id") % 2 == 0).select("event_type", "user_id")
    i = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    e = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    return i.unionByName(e)
