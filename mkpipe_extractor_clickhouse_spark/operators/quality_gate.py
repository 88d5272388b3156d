"""Data-quality constraint validation — the dbt-test/Deequ-style gate a
pipeline runs on every extracted batch before it reaches training or a
destination table (the reference delegates this to whatever runs after
the extractor; here it is a first-class declared operator).

One linear pass per fact table computes every row-local rule as a
conditional aggregate (no per-rule scans), and the one cross-table rule
(referential integrity) is a single anti-join semi-count. The report is
rows of (rule, n_violations) — a shape monitoring systems ingest
directly. At scale: rule evaluation is map-side codegen riding the
scan; only O(rules) rows ever shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "dq1_constraint_report",
    oracle="""
    WITH li AS (
      SELECT
        COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS dup_pk,
        SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
        SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
          AS bad_discount,
        SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_shipdate,
        SUM(CASE WHEN l_quantity <> TRUNC(l_quantity) THEN 1 ELSE 0 END)
          AS frac_quantity
      FROM lineitem
    ),
    orphan AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'duplicate_pk' AS rule, CAST(dup_pk AS BIGINT) AS n_violations FROM li
    UNION ALL
    SELECT 'nonpositive_price', CAST(nonpos_price AS BIGINT) FROM li
    UNION ALL
    SELECT 'discount_out_of_range', CAST(bad_discount AS BIGINT) FROM li
    UNION ALL
    SELECT 'null_shipdate', CAST(null_shipdate AS BIGINT) FROM li
    UNION ALL
    SELECT 'fractional_quantity', CAST(frac_quantity AS BIGINT) FROM li
    UNION ALL
    SELECT 'orphan_lineitem', CAST(n AS BIGINT) FROM orphan
    """,
    tags=("A7", "J6", "EXT"),
)
def dq1_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation report over lineitem: primary-key
    uniqueness, value ranges, null checks, integrality, and referential
    integrity against orders.  All row-local rules fold into ONE
    conditional aggregate over a single scan; the referential rule is
    one anti-join count (left_anti on the orderkey, the J6 shape).  The
    fixture data is clean, so the report proves zeros — the same query
    on a dirty batch localizes the failure by rule name."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    one = li.agg(
        (
            F.count("*")
            - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("duplicate_pk"),
        F.sum((F.col("l_extendedprice") <= 0).cast("long")).alias(
            "nonpositive_price"
        ),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("discount_out_of_range"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_shipdate"),
        F.sum(
            (F.col("l_quantity") != F.floor("l_quantity").cast("double")).cast(
                "long"
            )
        ).alias("fractional_quantity"),
    )
    rules = one.unpivot(
        [], list(one.columns), "rule", "n_violations"
    )
    orphans = (
        li.select("l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("orphan_lineitem").alias("rule"), "n_violations")
    )
    return rules.unionByName(orphans)
