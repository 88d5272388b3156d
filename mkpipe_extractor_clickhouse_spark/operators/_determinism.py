"""Deterministic float aggregation helpers.

The driver's correctness gate hashes values order-insensitively, but a
``sum`` over doubles is order-*dependent* in the low bits — a Spark
partial/final aggregation and a DuckDB single-threaded sum will
disagree in the last ulp. SURVEY §5.5 flags this as one of the
genuinely hard parity problems.

Fix: quantize each addend to a 64-bit integer at 1e-6 resolution
(``round(x * 1e6)`` → long), sum exactly in longs (order-independent),
divide back to double. Cross-engine identical because every step is
deterministic and equal in both engines: the double multiply is IEEE,
both engines round ties half-away-from-zero (verified: Spark
BigDecimal HALF_UP ≡ DuckDB std::round), long addition is exact, and
the final long/1e6 division is one IEEE op.

Why not decimals? ``sum(cast(x as decimal(28,6)))`` is equally exact
but ~3× slower in Spark's hash aggregate (128-bit buffers); the scaled
long stays on the primitive-long codegen path (measured: 0.65s vs
1.73s for TPC-H-Q1-style aggs at sf0.1). ``dsum_decimal`` remains for
data whose magnitude could overflow the scaled long
(|Σx| > ~9.2e12 per group at 1e-6 resolution — ANSI mode turns an
overflow into an error, never a silent wrap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000
DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _quantize(col: Column | str) -> Column:
    """round-half-away-from-zero(x·10⁶) as a long, via trunc(y ± 0.5).

    Spark's ``round()`` allocates a BigDecimal per row; this branch is
    pure primitive codegen (2.4× faster end-to-end on TPC-H-Q1-style
    aggs) and engine-identical: the IEEE add of ±0.5 and the
    truncation-toward-zero (Spark double→long cast ≡ DuckDB TRUNC)
    produce the same long in both engines for every double — including
    exact .5 ties, which +0.5 carries away from zero just like
    HALF_UP."""
    y = _c(col) * SCALE
    return (y + F.when(y >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double
    (1e-6 quantization)."""
    return (F.sum(_quantize(col)) / float(SCALE)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double."""
    c = _c(col)
    return ((F.sum(_quantize(c)) / float(SCALE)) / F.count(c)).cast("double")


def dsum_decimal(col: Column | str) -> Column:
    """Exact-decimal variant for magnitudes beyond the scaled-long
    range; same cross-engine determinism, ~3× slower."""
    return F.sum(_c(col).cast(DEC)).cast("double")


SCALE9 = 1_000_000_000


def _quantize9(col: Column | str) -> Column:
    """Nano-resolution (1e-9) variant of ``_quantize`` for unit-scale
    data (embedding dims, probabilities) where 1e-6 would keep only ~4
    significant digits.  |Σx| per group must stay under ~9.2e9 (long
    overflow) AND under ~9e6 if the sum is later converted to double
    exactly — both trivially true for unit-scale vectors.

    Why not ``cast(x as decimal(p,s))``?  Spark converts double→decimal
    through the shortest string repr (BigDecimal.valueOf) while DuckDB
    scales in binary — the two ROUND DIFFERENTLY by 1 unit in the last
    decimal place for ~half of all doubles, so decimal-cast sums drift
    by O(√n·10⁻ˢ) between engines (observed: 2e-14 on l9 centroids,
    caught by driver_sim --strict).  The quantize path rounds the SAME
    IEEE double product in both engines, so every addend is identical
    by construction."""
    y = _c(col) * SCALE9
    return (y + F.when(y >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")


def davg9(col: Column | str) -> Column:
    """Order-independent, engine-identical mean of unit-scale doubles
    at 1e-9 resolution, returned as double."""
    c = _c(col)
    return (F.sum(_quantize9(c)).cast("double") / (F.count(c) * F.lit(float(SCALE9)))).cast(
        "double"
    )


# DuckDB fragments with identical semantics (TRUNC because DuckDB's
# double→int CAST rounds, unlike Spark's truncating cast).
# Use: DSUM.format(x="l_quantity")
_Q = (
    "CAST(TRUNC(({x}) * 1000000"
    " + (CASE WHEN ({x}) >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT)"
)
DSUM = f"CAST(SUM({_Q}) / 1000000.0 AS DOUBLE)"
DAVG = f"CAST(SUM({_Q}) / 1000000.0 / COUNT({{x}}) AS DOUBLE)"

_Q9 = (
    "CAST(TRUNC(({x}) * 1000000000"
    " + (CASE WHEN ({x}) >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT)"
)
DAVG9 = (
    f"CAST(CAST(SUM({_Q9}) AS DOUBLE)"
    " / (COUNT({x}) * 1000000000.0) AS DOUBLE)"
)

# Spark-SQL-dialect fragment (for spark.sql(...) query text): Spark's
# double→BIGINT CAST truncates toward zero, so no TRUNC() needed (and
# Spark's trunc() is the date function).
_QS = (
    "CAST((({x}) * 1000000"
    " + (CASE WHEN ({x}) >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT)"
)
SPARK_DSUM = f"CAST(SUM({_QS}) / 1000000.0 AS DOUBLE)"
