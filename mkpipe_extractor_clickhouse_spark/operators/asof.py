"""As-of join (SURVEY §2.3 J10) — a first-class operator Spark SQL lacks.

Semantics: for each left row, attach the payload of the *latest* right
row with ``right.ts <= left.ts`` within the same ``by`` key (ties: the
right row at exactly left.ts matches). Left rows with no prior right row
keep nulls — i.e. an ASOF LEFT JOIN, matching DuckDB's operator, which
serves as the oracle.

Scale design: the naive formulation (equi-join on ``by`` + range filter
+ row_number) materializes |L_k|×|R_k| pairs per key before pruning —
quadratic in skewed keys. This implementation is the union-sort trick:
tag both sides, union, and take a running ``last(right_payload,
ignorenulls=True)`` over a single (by, ts) sort — one shuffle, linear
work, no pair blowup. At 100 TB that is the difference between a plan
that finishes and one that doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """ASOF LEFT JOIN ``left`` with ``right`` on time column ``on``,
    partitioned by ``by``. Right payload columns come back suffixed
    (the ``on`` column too, as ``{on}{suffix}``)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in by_cols and c != on
        ]
    payload_out = {c: f"{c}{suffix}" for c in right_payload}
    ts_out = f"{on}{suffix}"

    # The whole right payload travels as ONE nullable struct so the
    # running last() always takes every field (including the matched
    # timestamp) from the SAME right row — filling per-column would
    # resurrect older non-null values when the latest right row carries
    # a NULL payload field, disagreeing with ASOF JOIN semantics.
    left_cols = [c for c in left.columns]
    payload_struct = F.struct(
        F.col(on).alias("__ts"), *[F.col(c).alias(c) for c in right_payload]
    )
    l = left.select(
        *left_cols,
        F.lit(1).alias("__is_left"),
        F.lit(None)
        .cast(
            right.select(payload_struct.alias("__p")).schema["__p"].dataType
        )
        .alias("__p"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by_cols],
        *by_cols,
        F.lit(0).alias("__is_left"),
        payload_struct.alias("__p"),
    ).withColumn(on, F.col("__p.__ts"))

    u = l.unionByName(r)
    # Right rows sort before left rows at equal ts (__is_left 0 < 1), so
    # a right row at exactly left.ts is visible to that left row.
    # final __p key: deterministic winner among right rows that share
    # an exact (by, ts) — struct comparison picks the max payload (the
    # oracle is arbitrary there, but our output must not flap between
    # shuffles)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc(), F.col("__p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c != "__p"],
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *left_cols,
            *[F.col(f"__p.{c}").alias(payload_out[c]) for c in right_payload],
            F.col("__p.__ts").alias(ts_out),
        )
    )
