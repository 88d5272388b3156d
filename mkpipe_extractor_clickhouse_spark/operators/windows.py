"""Window-function operators (SURVEY §2.5 W1-W8).

All REF-surface (ClickHouse window SQL through the reference's
custom_query passthrough). Every window here is partitioned — a
partition-less window is a single-task bottleneck at scale, so the
catalog never declares one. Running sums over doubles go through the
decimal cast (see operators/_determinism.py) because both engines'
window-sum implementations (sliding accumulation vs segment tree)
associate additions differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import DEC, _Q, _quantize

_WDEC = f"CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER {{frame}} AS DOUBLE)"


@register(
    "w1_ranks",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("W1",),
)
def w1_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per customer, deterministic via the
    unique orderkey tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "w2_distribution",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("W2",),
)
def w2_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist per priority class."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "w3_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(ts) OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           LAG(value, 2) OVER w AS value_2back
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W3",),
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead along each user's event timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.lag("value", 2).over(w).alias("value_2back"),
    )


@register(
    "w4_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("W4",),
)
def w4_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user over the full-partition frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@register(
    "w5_running_total",
    oracle=f"""
    SELECT event_id, user_id,
           {_WDEC.format(frame='(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_value
    FROM events
    """,
    tags=("W5",),
)
def w5_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user (ROWS unbounded-preceding frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


@register(
    "w6_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                / COUNT(value) OVER w AS DOUBLE) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("W6",),
)
def w6_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average (bounded ROWS frame), decimal-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count("value").over(w)
        )
        .cast("double")
        .alias("moving_avg"),
    )


@register(
    "w7_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_in_range
    FROM events
    """,
    tags=("W7",),
)
def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering key: events whose event_id is
    within 100 of the current row's, per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rangeBetween(-100, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_in_range")
    )


@register(
    "w8_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    tags=("W8",),
)
def w8_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via rank-filter — the scalable per-group top-k
    (each partition keeps k rows; no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "w9_moving_median",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(TRUNC(value * 1000000
                    + (CASE WHEN value >= 0 THEN 0.5 ELSE -0.5 END))
                  AS BIGINT)) AS BIGINT) AS revq
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           CAST(revq / 1000000.0 AS DOUBLE) AS revenue,
           CAST(MEDIAN(revq) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             / 1000000.0 AS DOUBLE) AS moving_median
    FROM daily
    """,
    tags=("W6", "A9", "EXT"),
)
def w9_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day moving MEDIAN of the daily value series per event
    type — the robust-location sibling of w6's moving average
    (ClickHouse ``medianExact`` used as a window aggregate, which ANSI
    allows and ClickHouse users write routinely; Spark has NO
    percentile window function).  Restatement: collect the ≤7-element
    frame into an array, sort, index the middle — per-row cost is
    O(frame log frame) on a frame bounded by the window spec, so the
    operator scales exactly like any other bounded-frame window.  The
    daily series is pre-aggregated (shuffle 1), the window partitions
    by event_type (shuffle 2, tiny day-level relation).  Median inputs
    are quantized longs; the even-count midpoint average is one IEEE
    add + halving in both engines — exact parity."""
    ev = load_table(spark, sf_dir, "events")
    from ._determinism import _quantize

    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.sum(_quantize("value")).alias("revq"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("revq").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return daily.select(
        "event_type",
        "day",
        (F.col("revq") / 1_000_000.0).cast("double").alias("revenue"),
        (((mid_lo + mid_hi) / 2.0) / 1_000_000.0)
        .cast("double")
        .alias("moving_median"),
    )


@register(
    "w10_locf_fill",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS reading
      FROM events
    )
    SELECT user_id, event_id, reading,
           LAST_VALUE(reading IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM r
    """,
    tags=("W4", "EXT"),
)
def w10_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS / last-observation-carried-forward gap fill — the
    sensor-reading idiom (ClickHouse users reach for
    ``last_value(...) IGNORE NULLS`` or ``anyLast``): sparse readings
    (here: value only on purchase events) forward-filled along each
    user's timeline. ``F.last(ignorenulls=True)`` over an ordered
    per-user frame — one hash exchange on user_id, linear scan, O(1)
    window state. Values pass through untouched (no arithmetic), so
    parity is exact without quantization; event_id breaks ts ties for
    a total order."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("reading"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return r.select(
        "user_id",
        "event_id",
        "reading",
        F.last("reading", ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "w11_nth_value",
    oracle="""
    SELECT user_id, event_id,
           NTH_VALUE(value, 2) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_value,
           NTH_VALUE(event_type, 3) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_type
    FROM events
    """,
    tags=("W4", "EXT"),
)
def w11_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` — the k-th row of an ordered frame (each user's
    second reading / third event type), completing the W4 first/last
    family. Full-partition frame + total order (ts, event_id) makes
    the answer constant per partition and deterministic; values pass
    through unchanged, so parity needs no quantization."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.nth_value("event_type", 3).over(w).alias("third_type"),
    )


@register(
    "w12_session_islands",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, event_id,
           SUM(new_session) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS session_no
    FROM flagged
    """,
    tags=("W3", "W5", "T4", "EXT"),
)
def w12_session_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization — the window-function form of
    T4's session_window: a boundary flag where the gap to the previous
    event exceeds 30 minutes, then a running sum numbers each user's
    sessions 1..k. Unlike session_window (which emits per-session
    aggregates), this keeps EVERY event row tagged with its session
    ordinal — the shape attribution joins need. Two window passes over
    one user_id exchange; boundary flags are exact integer/interval
    comparisons, so parity is trivial."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = (
        prev.isNull()
        | ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTE"))
    ).cast("long")
    flagged = ev.select(
        "user_id", "event_id", "ts", new_session.alias("new_session")
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(run).alias("session_no"),
    )


@register(
    "w13_wow_change",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({{q}}) AS revq
      FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day,
           CAST(revq / 1000000.0 AS DOUBLE) AS revenue,
           CAST(LAG(revq, 7) OVER (PARTITION BY event_type ORDER BY day)
                / 1000000.0 AS DOUBLE) AS revenue_prev_week,
           ROUND((CAST(revq AS DOUBLE)
                  - CAST(LAG(revq, 7) OVER (PARTITION BY event_type
                                            ORDER BY day) AS DOUBLE))
                 / CAST(LAG(revq, 7) OVER (PARTITION BY event_type
                                           ORDER BY day) AS DOUBLE)
                 * 100, 6) AS pct_change_wow
    FROM daily
    """.format(q="CAST(TRUNC(value * 1000000 + (CASE WHEN value >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT)"),
    tags=("W3", "EXT", "timeseries"),
)
def w13_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change — daily revenue per stream
    against the same weekday last week (lag 7 over the daily series),
    the seasonality-aware trend KPI (day-over-day confuses weekends
    with regressions). Daily sums are quantized longs; the percent
    change is one mirrored IEEE chain over two exact longs, rounded
    once. Window over the O(days) rollup, not the fact table."""
    from ._determinism import _quantize

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("revq", 7).over(w)
    return daily.select(
        "event_type",
        "day",
        (F.col("revq") / 1_000_000.0).cast("double").alias("revenue"),
        (prev / 1_000_000.0).cast("double").alias("revenue_prev_week"),
        F.round(
            (F.col("revq").cast("double") - prev.cast("double"))
            / prev.cast("double")
            * 100,
            6,
        ).alias("pct_change_wow"),
    )


SESSION_GAP_MIN = 30


@register(
    "w14_session_running_total",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             {_Q.format(x='value')} AS vq,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, vq,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, event_id,
           CAST(SUM(vq) OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) / 1000000.0
                AS DOUBLE) AS session_running_total
    FROM sess
    WHERE user_id <= 200
    ORDER BY user_id, session_id, event_id
    """,
    tags=("W5", "W3", "T4", "EXT"),
)
def w14_session_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total that RESETS at session boundaries — the
    reset-on-condition cumulative every engagement dashboard wants
    ('value accumulated so far this session'). Composition of two
    window idioms over ONE (user) shuffle: gaps-and-islands session
    numbering (w12's cumulative new-session flag) and a running sum
    partitioned by the derived (user, session) key. Spark reuses the
    exchange across the three window specs because all partition keys
    prefix on user_id. Quantized longs under the running sum keep
    every prefix exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 200)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(order)
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        _quantize("value").alias("vq"),
        F.when(
            gap.isNull()
            | (
                F.col("ts")
                > gap + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(order)
    )
    run = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    return sess.select(
        "user_id",
        "session_id",
        "event_id",
        (F.sum("vq").over(run) / 1_000_000.0)
        .cast("double")
        .alias("session_running_total"),
    ).orderBy("user_id", "session_id", "event_id")


@register(
    "w15_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_of_type
      FROM events
    )
    SELECT user_id, event_id,
           SUM(first_of_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
             AS distinct_types_so_far
    FROM flagged
    WHERE user_id <= 100
    ORDER BY user_id, event_id
    """,
    tags=("W5", "W1", "A3", "EXT"),
)
def w15_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT …) OVER a cumulative window — which Spark (and
    most engines) refuse directly — via the first-occurrence-flag
    idiom: a row contributes iff it is the first (user, type)
    appearance, and a plain running SUM of the flags IS the running
    distinct count. Exact, integer-only, and two window specs that
    both hash-partition on user_id (the (user, type) spec is a
    refinement, so the exchange is shared). The same flag trick gives
    windowed distinct sums (flag·x) and distinct-within-frame variants
    at any scale — state is one bit per row, never a per-row set."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 100)
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    run_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(first_w) == 1, 1)
        .otherwise(0)
        .alias("first_of_type"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_of_type").over(run_w).alias("distinct_types_so_far"),
    ).orderBy("user_id", "event_id")


@register(
    "w16_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    grouped AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len,
             MIN(d) AS streak_start
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           MIN(CASE WHEN len = mx THEN streak_start END) AS streak_start
    FROM (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS mx FROM streaks)
    GROUP BY user_id
    HAVING MAX(len) >= 7
    ORDER BY user_id
    """,
    tags=("W1", "W5", "A2", "EXT"),
)
def w16_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (with the
    earliest day it started) — the engagement metric behind every
    'N-day streak' badge, and the cleanest instance of the
    date-minus-row_number gaps-and-islands trick: consecutive days
    share (day − rank), so streaks fall out of ONE window pass and a
    group-by — no self-joins, no recursion (w12 is the same idiom on
    event-time gaps). All date/integer arithmetic, reported for users
    with a 7-day-or-longer streak."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("d").alias("streak_start")
    )
    mx = streaks.withColumn(
        "mx", F.max("len").over(Window.partitionBy("user_id"))
    )
    return (
        mx.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.min(
                F.when(F.col("len") == F.col("mx"), F.col("streak_start"))
            ).alias("streak_start"),
        )
        .filter(F.col("longest_streak") >= 7)
        .orderBy("user_id")
    )
