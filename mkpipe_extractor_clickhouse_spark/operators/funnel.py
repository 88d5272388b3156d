"""ClickHouse-signature behavioral analytics operators: windowFunnel
and retention equivalents (REF-surface — these are the queries
ClickHouse users most characteristically push through the reference's
custom_query passthrough, reference README.md:57-66).

Both are expressed as staged conditional aggregations — no UDFs, no
per-user collect — so they scale as ordinary grouped aggs: the funnel
is k sequential min-over-condition joins on the user key (k = number
of steps, a constant), retention is one pass of boolean aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .asof import asof_join

FUNNEL_STEPS = ["signup", "click", "purchase"]
FUNNEL_WINDOW_DAYS = 7


@register(
    "ch_window_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CAST(1 + CAST(s2.user_id IS NOT NULL AS INTEGER)
                  + CAST(s3.user_id IS NOT NULL AS INTEGER) AS BIGINT)
             AS funnel_level,
           s1.t1 AS step1_ts, s2.t2 AS step2_ts, s3.t3 AS step3_ts
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    tags=("EXT", "funnel", "A7", "J3"),
)
def ch_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel: deepest strictly-ordered step chain
    signup → click → purchase within 7 days of the user's FIRST
    signup. (This anchors on min(signup) — the common product-analytics
    "first touch" convention; ClickHouse's windowFunnel slides the
    anchor over every step-1 event, which ch_window_funnel_sliding
    implements.) Staged min-over-condition aggregation — each stage is
    one broadcastable per-user relation, so the plan is k hash joins on
    user_id, not a sequence scan."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS")
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            )
            .cast("long")
            .alias("funnel_level"),
            F.col("t1").alias("step1_ts"),
            F.col("t2").alias("step2_ts"),
            F.col("t3").alias("step3_ts"),
        )
    )


@register(
    "ch_retention",
    oracle="""
    SELECT user_id,
           CAST(BOOL_OR(ts < TIMESTAMP '2024-01-08 00:00:00') AS BIGINT) AS week1,
           CAST(BOOL_OR(ts < TIMESTAMP '2024-01-08 00:00:00')
                AND BOOL_OR(ts >= TIMESTAMP '2024-01-08 00:00:00'
                            AND ts < TIMESTAMP '2024-01-15 00:00:00') AS BIGINT) AS week2,
           CAST(BOOL_OR(ts < TIMESTAMP '2024-01-08 00:00:00')
                AND BOOL_OR(ts >= TIMESTAMP '2024-01-15 00:00:00'
                            AND ts < TIMESTAMP '2024-01-22 00:00:00') AS BIGINT) AS week3
    FROM events
    GROUP BY user_id
    """,
    tags=("EXT", "retention", "A7"),
)
def ch_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention() analogue: per user, was-active-in-week-1 and
    returned-in-week-N flags (ClickHouse semantics: later conditions
    count only if the first holds). One pass of boolean aggregates."""
    ev = load_table(spark, sf_dir, "events")
    w1 = F.bool_or(F.col("ts") < F.lit("2024-01-08").cast("timestamp_ntz"))
    w2 = F.bool_or(
        (F.col("ts") >= F.lit("2024-01-08").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz"))
    )
    w3 = F.bool_or(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-22").cast("timestamp_ntz"))
    )
    return ev.groupBy("user_id").agg(
        w1.cast("long").alias("week1"),
        (w1 & w2).cast("long").alias("week2"),
        (w1 & w3).cast("long").alias("week3"),
    )


@register(
    "f10_try_and_buckets",
    oracle="""
    SELECT event_id,
           TRY_CAST(props AS BIGINT) AS props_as_int,
           TRY_CAST(SUBSTRING(props, 7, 2) AS BIGINT) AS k_digits,
           CAST(value / NULLIF(CAST(event_id % 3 AS DOUBLE), 0) AS DOUBLE)
             AS safe_div,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 100 THEN 11
                     ELSE FLOOR(value / 10) + 1 END AS BIGINT) AS value_decile
    FROM events
    """,
    tags=("F8", "F3", "F4"),
)
def f10_try_and_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant casts/division + histogram bucketing: try_cast
    yields NULL instead of an ANSI error on malformed input (props is a
    JSON string → always NULL as BIGINT; its digit slice parses);
    try_divide ≡ x / NULLIF(y, 0); width_bucket (no DuckDB 1.0
    equivalent — the oracle spells out the same PostgreSQL bucket
    arithmetic) = ClickHouse histogram bucket assignment."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("props").try_cast("long").alias("props_as_int"),
        F.substring("props", 7, 2).try_cast("long").alias("k_digits"),
        F.try_divide(F.col("value"), (F.col("event_id") % 3).cast("double")).alias(
            "safe_div"
        ),
        F.width_bucket(F.col("value"), F.lit(0), F.lit(100), F.lit(10))
        .cast("long")
        .alias("value_decile"),
    )


@register(
    "ch_window_funnel_sliding",
    oracle=f"""
    -- sliding anchor: a step-2 event is reachable iff ANY step-1 event
    -- precedes it within the window — equivalently iff the LATEST prior
    -- step-1 does (as-of join); step 3 cascades off the latest
    -- reachable step-2 (its anchor deadline is monotone in ts).
    -- MATERIALIZED: stops DuckDB pushing the window filter into the
    -- ASOF join (it would bind as a second inequality and error).
    WITH s1 AS (
      SELECT user_id, ts FROM events WHERE event_type = '{FUNNEL_STEPS[0]}'
    ),
    s2raw AS MATERIALIZED (
      SELECT e.user_id, e.ts, a.ts AS anchor
      FROM (SELECT user_id, ts FROM events
            WHERE event_type = '{FUNNEL_STEPS[1]}') e
      ASOF JOIN s1 a ON e.user_id = a.user_id AND e.ts > a.ts
    ),
    s2 AS (
      SELECT * FROM s2raw WHERE ts <= anchor + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
    ),
    s3raw AS MATERIALIZED (
      SELECT e.user_id, e.ts, b.anchor
      FROM (SELECT user_id, ts FROM events
            WHERE event_type = '{FUNNEL_STEPS[2]}') e
      ASOF JOIN s2 b ON e.user_id = b.user_id AND e.ts > b.ts
    ),
    s3 AS (
      SELECT user_id, ts FROM s3raw
      WHERE ts <= anchor + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
    ),
    levels AS (
      SELECT user_id, 1 AS lv FROM s1
      UNION ALL SELECT user_id, 2 FROM s2
      UNION ALL SELECT user_id, 3 FROM s3
    )
    SELECT user_id, CAST(MAX(lv) AS BIGINT) AS funnel_level
    FROM levels GROUP BY user_id
    """,
    tags=("EXT", "funnel", "J10"),
)
def ch_window_funnel_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-faithful windowFunnel (strict-increase mode): the
    window anchor slides over EVERY step-1 event, so a chain may start
    at any signup, not just the first. Reduction to two cascaded as-of
    joins: a step-2 event is reachable iff its latest prior step-1 lies
    within the window (any in-window anchor implies the latest prior
    one is), and because that anchor is monotone in event time, step 3
    only needs the latest reachable step-2 before it. Each cascade is
    one asof_join — linear work, same scale shape as J10."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS")

    def step(name: str) -> DataFrame:
        return ev.filter(F.col("event_type") == name).select("user_id", "ts")

    s1 = step(FUNNEL_STEPS[0])
    # asof matches ts_right <= ts; strict increase needs ts_right < ts,
    # so shift the probe side back by one microsecond for the lookup.
    eps = F.expr("INTERVAL 1 MICROSECOND")
    s2_probe = step(FUNNEL_STEPS[1]).withColumn("probe_ts", F.col("ts") - eps)
    s2 = (
        asof_join(
            s2_probe.select("user_id", F.col("probe_ts").alias("ts"), F.col("ts").alias("real_ts")),
            s1,
            on="ts",
            by="user_id",
            right_payload=[],
        )
        .filter(F.col("real_ts") <= F.col("ts_right") + win)
        .select("user_id", F.col("real_ts").alias("ts"), F.col("ts_right").alias("anchor"))
    )
    s3_probe = step(FUNNEL_STEPS[2]).withColumn("probe_ts", F.col("ts") - eps)
    s3 = (
        asof_join(
            s3_probe.select("user_id", F.col("probe_ts").alias("ts"), F.col("ts").alias("real_ts")),
            s2.select("user_id", "ts", "anchor"),
            on="ts",
            by="user_id",
            right_payload=["anchor"],
        )
        .filter(F.col("real_ts") <= F.col("anchor_right") + win)
        .select("user_id")
    )
    levels = (
        s1.select("user_id", F.lit(1).alias("lv"))
        .unionByName(s2.select("user_id", F.lit(2).alias("lv")))
        .unionByName(s3.select("user_id", F.lit(3).alias("lv")))
    )
    return levels.groupBy("user_id").agg(F.max("lv").cast("long").alias("funnel_level"))


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_days: int = FUNNEL_WINDOW_DAYS,
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Generalized k-step sliding-anchor windowFunnel (strict-increase
    mode): returns (by, funnel_level) with the deepest chain completed
    within ``window_days`` of its own step-1 anchor. The 3-step
    declared query is this with steps=FUNNEL_STEPS; each additional
    step folds one more as-of cascade — linear work per step."""
    win = F.expr(f"INTERVAL {window_days} DAYS")
    eps = F.expr("INTERVAL 1 MICROSECOND")

    def step(name: str) -> DataFrame:
        return events.filter(F.col(type_col) == name).select(by, ts_col)

    reached = step(steps[0]).withColumn("anchor", F.col(ts_col))
    levels = reached.select(by, F.lit(1).alias("lv"))
    for i, name in enumerate(steps[1:], start=2):
        probe = step(name).select(
            by,
            (F.col(ts_col) - eps).alias(ts_col),
            F.col(ts_col).alias("real_ts"),
        )
        reached = (
            asof_join(probe, reached.select(by, ts_col, "anchor"),
                      on=ts_col, by=by, right_payload=["anchor"])
            .filter(F.col("real_ts") <= F.col("anchor_right") + win)
            .select(
                by,
                F.col("real_ts").alias(ts_col),
                F.col("anchor_right").alias("anchor"),
            )
        )
        levels = levels.unionByName(reached.select(by, F.lit(i).alias("lv")))
    return levels.groupBy(by).agg(F.max("lv").cast("long").alias("funnel_level"))


@register(
    "ch_sequence_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             STRING_AGG(SUBSTRING(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(regexp_matches(s, 'v.*c.*p') AS BIGINT)
             AS has_view_click_purchase,
           CAST(regexp_matches(s, 's.*p') AS BIGINT) AS has_signup_purchase,
           n_events
    FROM seq
    """,
    tags=("EXT", "funnel", "A8", "F1"),
)
def ch_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch``-style ordered-pattern detection:
    per user, does the event-time-ordered stream contain the
    subsequence view→click→purchase (and signup→…→purchase)?

    Each user's stream collapses to one char per event (the event
    types' distinct initials) in (ts, event_id) order, and the pattern
    is a regex over that string — one grouped aggregation, one regex
    per user, no joins. The per-user string is bounded by that user's
    event count (the same per-key bound as any sessionization), so the
    operator scales as an ordinary hash agg at 100 TB."""
    seq = _event_initial_seq(spark, sf_dir)
    return seq.select(
        "user_id",
        F.col("s").rlike("v.*c.*p").cast("long").alias("has_view_click_purchase"),
        F.col("s").rlike("s.*p").cast("long").alias("has_signup_purchase"),
        "n_events",
    )


def _event_initial_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the event-time-ordered stream collapsed to one char per
    event (the event types' distinct initials) plus the event count.
    Shared by ch_sequence_match / ch_sequence_count — one grouped
    aggregation whose state is bounded by the per-user event count."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: F.substring(x["event_type"], 1, 1),
            ),
        ).alias("s"),
        F.count("*").alias("n_events"),
    )


@register(
    "ch_sequence_count",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             STRING_AGG(SUBSTRING(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(LEN(regexp_extract_all(s, 'v[^p]*p')) AS BIGINT)
             AS view_to_purchase_chains,
           CAST(LEN(regexp_extract_all(s, 'c[^p]*p')) AS BIGINT)
             AS click_to_purchase_chains
    FROM seq
    """,
    tags=("EXT", "funnel", "A8", "F1"),
)
def ch_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount``-style non-overlapping chain counting:
    per user, how many disjoint view→…→purchase chains occur in event
    order? The left-to-right scan semantics ('match the next purchase
    after each unconsumed view, then continue past it') is exactly
    leftmost non-overlapping regex matching of ``v[^p]*p`` over the
    collapsed event-initial string — both engines' regex runtimes
    implement the same POSIX leftmost rule, so counts agree. Same
    single-hash-agg plan as ch_sequence_match."""
    seq = _event_initial_seq(spark, sf_dir)
    return seq.select(
        "user_id",
        F.size(F.regexp_extract_all("s", F.lit("v[^p]*p"), F.lit(0)))
        .cast("long")
        .alias("view_to_purchase_chains"),
        F.size(F.regexp_extract_all("s", F.lit("c[^p]*p"), F.lit(0)))
        .cast("long")
        .alias("click_to_purchase_chains"),
    )


@register(
    "ch_cohort_matrix",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT f.cohort_week,
           CAST((a.week - f.cohort_week) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT f.user_id) AS active_users
    FROM first_seen f
    JOIN activity a USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
    tags=("A2", "A3", "J1", "EXT"),
)
def ch_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics
    rollup: users bucketed by first-seen week (cohort), counted in
    every later week they return, keyed by (cohort_week, week_offset).
    Two aggregations over one events scan plus a user-keyed self-join;
    the join is on user_id (co-partitioned with both groupings, AQE
    picks shuffle-hash), never on time — at 100 TB the matrix is
    O(weeks²) rows from O(rows) input, the standard cohort plan."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    activity = ev.select("user_id", week.alias("week")).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "ch_funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT s1.user_id, MIN(e.ts) AS t2
      FROM s1 JOIN events e ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY s1.user_id
    ),
    s3 AS (
      SELECT s2.user_id
      FROM s2 JOIN events e ON e.user_id = s2.user_id
      JOIN s1 ON s1.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY s2.user_id
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 
      n1 AS reached_step1, n2 AS reached_step2, n3 AS reached_step3,
      CAST(n2 * 1000000 // n1 AS BIGINT) AS conv_1_to_2_ppm,
      CAST(n3 * 1000000 // GREATEST(n2, 1) AS BIGINT) AS conv_2_to_3_ppm,
      CAST(n3 * 1000000 // n1 AS BIGINT) AS conv_overall_ppm
    FROM c
    """,
    tags=("A7", "EXT", "funnel"),
)
def ch_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion-rate report — the one-row summary a product
    dashboard renders from windowFunnel levels: users reaching each
    step of signup → click → purchase (7-day window, first-touch
    anchor, same staged min-over-condition chain as ch_window_funnel)
    and the step-to-step conversion rates in exact integer
    parts-per-million (floor division, no float ratios to disagree
    on). Each stage is a per-user broadcastable relation; the final
    counts collapse to one row."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr("INTERVAL 7 DAY")
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(F.broadcast(s1), "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(F.broadcast(s2), "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .select("user_id")
        .distinct()
    )
    c = (
        s1.agg(F.count("*").alias("n1"))
        .join(s2.agg(F.count("*").alias("n2")))
        .join(s3.agg(F.count("*").alias("n3")))
    )
    return c.select(
        F.col("n1").alias("reached_step1"),
        F.col("n2").alias("reached_step2"),
        F.col("n3").alias("reached_step3"),
        F.expr("n2 * 1000000 DIV n1").alias("conv_1_to_2_ppm"),
        F.expr("n3 * 1000000 DIV greatest(n2, 1)").alias("conv_2_to_3_ppm"),
        F.expr("n3 * 1000000 DIV n1").alias("conv_overall_ppm"),
    )


@register(
    "ch_window_funnel_strict",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type, 1) OVER w AS ty1,
             LEAD(event_type, 2) OVER w AS ty2,
             LEAD(ts, 1) OVER w AS ts1,
             LEAD(ts, 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    anchors AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
      FROM seq WHERE event_type = '{FUNNEL_STEPS[0]}'
    )
    SELECT user_id,
           CAST(CASE WHEN ty1 = '{FUNNEL_STEPS[1]}'
                      AND ts1 <= ts + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
                     THEN CASE WHEN ty2 = '{FUNNEL_STEPS[2]}'
                                AND ts2 <= ts + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
                               THEN 3 ELSE 2 END
                     ELSE 1 END AS BIGINT) AS funnel_level
    FROM anchors WHERE rn = 1 ORDER BY user_id
    """,
    tags=("EXT", "funnel", "A7", "W3"),
)
def ch_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(w)('strict_order')(…)`` — the funnel
    mode where NO other event may interleave: after the anchor signup,
    the chain advances only if the IMMEDIATELY next events for that
    user are click then purchase (within the window), so any stray
    view/error between steps breaks the chain at that level. One
    lead() window per user (the shared sequence-shuffle shape of
    ch_sequence_match), then a row-local CASE — no joins at all, in
    contrast to the staged-join relaxed funnel (ch_window_funnel).
    Anchored first-touch like the rest of the family."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("ty1"),
        F.lead("event_type", 2).over(w).alias("ty2"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    anchors = (
        seq.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    deadline = F.col("ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS")
    level = (
        F.when(
            (F.col("ty1") == FUNNEL_STEPS[1]) & (F.col("ts1") <= deadline),
            F.when(
                (F.col("ty2") == FUNNEL_STEPS[2])
                & (F.col("ts2") <= deadline),
                3,
            ).otherwise(2),
        )
        .otherwise(1)
        .cast("bigint")
    )
    return anchors.select(
        "user_id", level.alias("funnel_level")
    ).orderBy("user_id")


SEQ_T_SECONDS = 3600  # (?t<=3600) between matched steps


@register(
    "ch_sequence_match_timed",
    oracle=f"""
    WITH p1 AS (
      SELECT user_id, ts, event_id, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER w
               AS next_p_ts,
             MIN(CASE WHEN event_type = 'click' THEN ts END) OVER w
               AS next_c_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    p2 AS (
      SELECT user_id, ts, event_type, next_c_ts,
             MIN(CASE WHEN event_type = 'click'
                       AND next_p_ts <= ts + INTERVAL {SEQ_T_SECONDS} SECOND
                      THEN ts END) OVER w AS next_good_c_ts
      FROM p1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           CAST(MAX(CASE WHEN event_type = 'view'
                          AND next_c_ts <= ts + INTERVAL {SEQ_T_SECONDS} SECOND
                         THEN 1 ELSE 0 END) AS BIGINT) AS timed_vc,
           CAST(MAX(CASE WHEN event_type = 'view'
                          AND next_good_c_ts
                              <= ts + INTERVAL {SEQ_T_SECONDS} SECOND
                         THEN 1 ELSE 0 END) AS BIGINT) AS timed_vcp
    FROM p2 GROUP BY user_id ORDER BY user_id
    """,
    tags=("EXT", "funnel", "W3", "A7"),
)
def ch_sequence_match_timed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=w)(?2)…')`` — the TIMED
    pattern variant: view→click (and view→click→purchase) where each
    consecutive matched pair is ≤ w apart, other events free to
    interleave. Existence over per-step windows is NOT greedy-safe
    from the left (a later click can open a later purchase deadline),
    so the construction layers right-to-left: pass 1 marks each click
    'good' iff SOME purchase follows within w (greedy IS safe for the
    last step); pass 2 asks each view for the earliest good click in
    ITS window. Two window passes over one (user) shuffle, then a
    hash agg — no joins, no per-user quadratic work. Timestamp
    comparisons only, so exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    bound = F.expr(f"INTERVAL {SEQ_T_SECONDS} SECONDS")
    p1 = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w).alias("next_p_ts"),
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w).alias("next_c_ts"),
    )
    p2 = p1.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "next_c_ts",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("next_p_ts") <= F.col("ts") + bound),
                F.col("ts"),
            )
        ).over(w).alias("next_good_c_ts"),
    )
    is_view = F.col("event_type") == "view"
    return (
        p2.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    is_view & (F.col("next_c_ts") <= F.col("ts") + bound), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("timed_vc"),
            F.max(
                F.when(
                    is_view
                    & (F.col("next_good_c_ts") <= F.col("ts") + bound),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("timed_vcp"),
        )
        .orderBy("user_id")
    )


@register(
    "ch_funnel_time_to_convert",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    ),
    deltas AS (
      SELECT s1.user_id,
             date_diff('microsecond', s1.t1, s2.t2) // 1000000 AS d12,
             date_diff('microsecond', s2.t2, s3.t3) // 1000000 AS d23
      FROM s1
      JOIN s2 ON s1.user_id = s2.user_id
      LEFT JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT COUNT(*) AS converted_1_2,
           COUNT(d23) AS converted_2_3,
           ROUND(MEDIAN(d12), 6) AS median_secs_1_2,
           ROUND(QUANTILE_CONT(d12, 0.90), 6) AS p90_secs_1_2,
           ROUND(MEDIAN(d23), 6) AS median_secs_2_3,
           ROUND(QUANTILE_CONT(d23, 0.90), 6) AS p90_secs_2_3
    FROM deltas
    """,
    tags=("EXT", "funnel", "A9"),
)
def ch_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution over the ch_window_funnel chain:
    median and p90 seconds between consecutive completed steps — the
    'how long does the funnel take', not just 'how many finish', that
    prioritizes which step to shorten. Reuses the staged min-over-
    condition joins (each stage broadcastable per-user relations);
    deltas are exact integer seconds, percentiles interpolate the same
    two order statistics in both engines (the a9 contract). Output is
    one summary row."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS")
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    deltas = (
        s1.join(s2, "user_id")
        .join(s3, "user_id", "left")
        .select(
            # exact micros floored to whole seconds — engines disagree
            # on sub-second 'second' diffs (boundary-crossing vs elapsed)
            F.expr("timestampdiff(MICROSECOND, t1, t2) DIV 1000000").alias(
                "d12"
            ),
            F.expr("timestampdiff(MICROSECOND, t2, t3) DIV 1000000").alias(
                "d23"
            ),
        )
    )
    return deltas.agg(
        F.count("*").alias("converted_1_2"),
        F.count("d23").alias("converted_2_3"),
        F.round(F.median("d12"), 6).alias("median_secs_1_2"),
        F.round(F.percentile("d12", F.lit(0.90)), 6).alias("p90_secs_1_2"),
        F.round(F.median("d23"), 6).alias("median_secs_2_3"),
        F.round(F.percentile("d23", F.lit(0.90)), 6).alias("p90_secs_2_3"),
    )
