"""Distinct-user activity curves — the rolling/cumulative uniq metrics
a ClickHouse behavioral deployment reads off its events table (the
reference's source engine; uniq-over-sliding-window and
first-seen-cohort queries are the standard companions to the funnel /
retention family in operators/funnel.py).

Exact distinct counts interact badly with windows: Spark (like ANSI
SQL) forbids DISTINCT aggregates over window frames, and the naive
day×day range join explodes quadratically on the day dimension and
skews on hot days. Both operators below restate the computation so
only hash aggregations remain:

* rolling: each (user, day) pair *contributes* to the 7 trailing
  report days → explode 7 rows per pair → one distinct-agg by day.
  Linear in pairs (×7), shuffle keyed on the report day.
* cumulative: a user counts once, at their first-seen day → per-user
  min(day), then a running sum over the tiny per-day series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TRAIL_DAYS = 7


@register(
    "a18_rolling_distinct_users",
    oracle=f"""
    WITH pd AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM pd)
    SELECT d.day, COUNT(DISTINCT p.user_id) AS rolling_users
    FROM days d
    JOIN pd p ON p.day BETWEEN d.day - {TRAIL_DAYS - 1} AND d.day
    GROUP BY d.day
    """,
    tags=("A3", "W7", "EXT"),
)
def a18_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per observed day (ClickHouse
    ``uniq`` over a sliding date window). The day×day range join the
    oracle runs is replaced by a contribution explode: every (user, day)
    pair emits the ≤7 report days it participates in, then one
    distinct-aggregation per report day. Report days are the observed
    days only (broadcast-joined), so trailing windows past the end of
    data are not invented."""
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        )
        .distinct()
    )
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add("day", TRAIL_DAYS - 1), F.expr("interval 1 day")
            )
        ).alias("report_day"),
        "user_id",
    )
    return (
        contrib.join(
            F.broadcast(days), contrib.report_day == days.day, "inner"
        )
        .groupBy(F.col("day"))
        .agg(F.count_distinct("user_id").alias("rolling_users"))
    )


@register(
    "a19_cumulative_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      FROM events GROUP BY user_id
    ),
    new_per_day AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    ),
    days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    )
    SELECT d.day,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                OVER (ORDER BY d.day) AS BIGINT) AS cumulative_users
    FROM days d LEFT JOIN new_per_day n USING (day)
    """,
    tags=("A3", "W5", "EXT"),
)
def a19_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day (the new-user growth curve).
    A user counts exactly once — at min(day) — so the distinct-over-
    growing-prefix becomes per-user min + per-day counts + a running
    sum over the per-day series (tiny: one row per day). The heavy
    aggregation shuffles on user_id once; the window runs on the
    day-level series, not the events."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
    )
    new_per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    days = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("day")).distinct()
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(new_per_day, "day", "left")
        .select(
            "day", F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users")
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w).cast("long"))
    )
