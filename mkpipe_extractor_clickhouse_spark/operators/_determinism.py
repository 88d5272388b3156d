"""Deterministic float aggregation helpers.

The driver's correctness gate hashes values order-insensitively, but a
``sum`` over doubles is order-*dependent* in the low bits — a Spark
partial/final aggregation and a DuckDB single-threaded sum will disagree
in the last ulp. SURVEY §5.5 flags this as one of the genuinely hard
parity problems.

Fix: route every double aggregation through a decimal cast. A double →
decimal(.,6) cast can never hit a rounding tie (no IEEE double is exactly
representable with a terminating decimal expansion ending in 5 at the 7th
place — that would require a factor 5**7 in the denominator), so both
engines produce the identical decimal; decimal addition is exact and
order-independent; and the final cast back to double is
nearest-double-of-an-exact-decimal, identical in both engines. Result:
bit-identical doubles regardless of row order, partitioning, or the
oracle's hashing scheme.

Spark side: ``dsum(col)``/``davg(col)``. DuckDB side: the matching SQL
fragments ``DSUM``/``DAVG`` (format with ``.format(x=...)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double.

    sum(decimal)/count — both engines divide the identical exact decimal
    (as double) by the identical count with IEEE semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


# DuckDB fragments with identical semantics. Use: DSUM.format(x="l_quantity")
DSUM = "CAST(SUM(CAST(({x}) AS DECIMAL(28,6))) AS DOUBLE)"
DAVG = (
    "CAST(CAST(SUM(CAST(({x}) AS DECIMAL(28,6))) AS DOUBLE)"
    " / COUNT({x}) AS DOUBLE)"
)
