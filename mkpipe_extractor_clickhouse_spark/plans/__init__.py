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


def plan_warnings(df: DataFrame) -> list[str]:
    """Static scale-anti-pattern advisor: inspect a DataFrame's
    compiled plan and flag the shapes that work at test scale and
    fall over at 100 TB. Each warning names the pattern and the
    fix the operator library already implements — the same checklist
    the plan-lock tests enforce on the registry, exposed to users as
    a callable. Heuristic and read-only: it never changes the plan."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    warnings: list[str] = []
    if "CartesianProduct" in tree:
        warnings.append(
            "cartesian-product: a join with no usable equi-condition "
            "multiplies partitions; add an equality key (grid-bucket "
            "range/distance predicates like j18, or pre-dedup with a "
            "key like x13)"
        )
    if "BroadcastNestedLoopJoin" in tree:
        warnings.append(
            "broadcast-nested-loop: non-equi join probes every row "
            "pair; acceptable only against a tiny (≲1-row) side — "
            "otherwise re-key it (see j9/j18 bucketing)"
        )
    if "BatchEvalPython" in tree:
        warnings.append(
            "row-at-a-time Python UDF: per-row serialization dominates "
            "at scale; use built-in expressions or an Arrow-batched "
            "pandas UDF (functions/udf.py d2)"
        )
    # a window/sort whose partitioning is a single partition (the
    # formatted mode lists it on an Arguments: detail line)
    if "SinglePartition" in plan:
        warnings.append(
            "single-partition exchange: an unpartitioned window/sort "
            "serializes the whole relation through one task; restrict "
            "it to a pre-aggregated (small) relation, or use the "
            "two-pass range-partitioned construction (o1/a26 notes)"
        )
    scans = plan.count("Scan parquet")
    if scans and "PushedFilters: []" in plan and "Filter" in tree:
        warnings.append(
            "unpushed filter: a Filter sits above a scan with no "
            "pushed predicates — check for casts/UDFs wrapping the "
            "filtered column (P-family notes in filter_spec.py)"
        )
    return warnings
