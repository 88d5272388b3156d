"""Plan inspection & tuning helpers (SURVEY §4).

The engine adds no custom Catalyst rules — Catalyst/AQE already provide
pushdown, pruning, join selection, codegen, and skew handling (see the
SURVEY §4 table mapping each reference technique to its Spark
equivalent). What this module provides is *observability*: formatted
plan dumps and predicates over them, used by tests/test_plans.py to
lock in the plan shapes that matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The .explain("formatted") text, returned instead of printed."""
    spark = df.sparkSession
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_tree(df: DataFrame) -> str:
    """Just the operator tree (first block) of the formatted plan."""
    return formatted_plan(df).split("\n\n")[0]


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters list of the first scan, '' if none."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan:
        return ""
    return plan.split("PushedFilters")[1].split("\n")[0].lstrip(": ")


def has_node(df: DataFrame, node: str) -> bool:
    return node in plan_tree(df)


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count in the compiled plan tree (before AQE reuse)."""
    return plan_tree(df).count("Exchange")
