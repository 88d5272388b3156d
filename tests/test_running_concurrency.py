"""runningConcurrency tie semantics: equal-time starts are mutually
concurrent, an interval ending exactly at t does not overlap a start
at t (half-open), and empty intervals never count themselves."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _concurrency(spark, rows):
    """rows: (user, event, s, e) integer timeline; returns {event: conc}
    via the exact operator shape (boundary timeline + RANGE frame)."""
    iv = spark.createDataFrame(rows, ["user_id", "event_id", "s", "e"])
    tl = iv.select(
        "user_id", "event_id", F.col("s").alias("t"), F.lit(1).alias("k")
    ).unionByName(
        iv.select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.col("e").alias("t"),
            F.lit(-1).alias("k"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tl.withColumn("conc", F.sum("k").over(w))
        .filter(F.col("k") == 1)
        .collect()
    )
    return {r.event_id: r.conc for r in out}


def test_half_open_and_tie_semantics(spark):
    rows = [
        (1, 10, 0, 100),   # baseline
        (1, 11, 50, 150),  # overlaps 10
        (1, 12, 100, 200), # starts exactly when 10 ends -> no overlap
        (1, 13, 100, 200), # equal-time twin of 12 -> mutual
        (1, 14, 300, 300), # empty interval -> counts nothing, not itself
        (2, 20, 0, 10),    # other user: isolated
    ]
    got = _concurrency(spark, rows)
    brute = {}
    for u, ev, s, _ in rows:
        brute[ev] = sum(
            1 for u2, _, s2, e2 in rows if u2 == u and s2 <= s < e2
        )
    assert got == brute
    # twins see each other and 11 (still open), but NOT 10 (ends at 100)
    assert got[12] == 3 and got[13] == 3
    assert got[14] == 0  # empty interval
