"""ClickHouse SQL-surface parity: ``LIMIT n BY``, ``SAMPLE``,
``topKWeighted``, ``groupArrayMovingSum`` and ``WITH FILL ...
INTERPOLATE`` (reference ecosystem: ClickHouse is the source engine —
``/root/reference/mkpipe_extractor_clickhouse/__init__.py:26-43`` — so
queries users run against it routinely lean on these clauses, none of
which exist verbatim in ANSI SQL or the Spark DataFrame API).

Spark-first restatements, all JVM-codegen, each with the shuffle story
stated up front:

* LIMIT n BY expr  → row_number window over the BY key: exactly one
  hash exchange on the key, no global sort, no driver materialization.
* SAMPLE 1/8      → ClickHouse samples by a *hash of the sampling key*
  so the subset is deterministic and consistent across nodes; we use a
  Knuth multiplicative hash in plain BIGINT arithmetic (identical in
  Spark and DuckDB — no engine-private hash), so the filter runs
  map-side during the scan stage and the estimate scale-up is exact
  integer math.
* topKWeighted    → exact form at bounded cardinality: partial-agg the
  (group, item) weights map-side, one shuffle, then a per-group
  row_number.  (The sketch form for unbounded item cardinality is
  a15/a16's territory; this is the weighted exact variant.)
* groupArrayMovingSum → one hash exchange on the group key serves BOTH
  the ordered moving-sum window and the final per-group array collect —
  Spark keeps the child partitioning, so the plan has a single shuffle.
* WITH FILL INTERPOLATE → the day spine is generated from a 1-row
  min/max aggregate (sequence + explode), never enumerated driver-side;
  the carry-forward interpolation is last_value(ignorenulls) over the
  spine, whose size is bounded by the date range, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import _Q, DSUM, _quantize, dsum

# Knuth multiplicative hash on the sampling key: h(k) = (k·A) mod 2^32.
# Both engines evaluate it in 64-bit integer arithmetic (k ≤ ~3.4e9
# keeps k·A inside BIGINT), so the sampled subset is bit-identical.
_KNUTH_A = 2654435761
_HASH_MOD = 1 << 32
_SAMPLE_DENOM = 8  # SAMPLE 1/8


@register(
    "ch_limit_by",
    oracle="""
    SELECT user_id, ts, event_type, value, rn
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 2
    """,
    tags=("W8", "EXT"),
)
def ch_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ts LIMIT 2 BY user_id`` — the first 2
    events of every user.  Spark restatement: row_number over a
    (user_id | ts, event_id) window + filter; one hash exchange on
    user_id, per-partition sort, no global sort.  event_id breaks ts
    ties so the kept rows are deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("event_id")
    )


@register(
    "ch_sample_key",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS sampled_rows,
           COUNT(*) * {_SAMPLE_DENOM} AS est_rows,
           {DSUM.format(x='value')} AS sampled_value,
           CAST(SUM({_Q.format(x='value')}) * {_SAMPLE_DENOM}
                / 1000000.0 AS DOUBLE) AS est_value
    FROM events
    WHERE ((user_id * {_KNUTH_A}) % {_HASH_MOD}) * {_SAMPLE_DENOM}
          < {_HASH_MOD}
    GROUP BY event_type
    """,
    tags=("P2", "A2", "EXT"),
)
def ch_sample_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE 1/8`` with ``SAMPLE BY intHash32(user_id)``
    semantics: keep the keys whose hash lands in the first 1/8 of the
    hash space, so the sample is deterministic, consistent for a given
    user across queries (all-or-nothing per user — what makes SAMPLE
    usable for funnels), and needs no stored random column.  The hash
    filter is plain integer arithmetic evaluated map-side in the scan
    stage; only sampled rows reach the aggregate's exchange.  Estimates
    scale by the exact sampling factor in integer math."""
    ev = load_table(spark, sf_dir, "events")
    h = F.pmod(F.col("user_id") * F.lit(_KNUTH_A), F.lit(_HASH_MOD))
    return (
        ev.filter(h * _SAMPLE_DENOM < _HASH_MOD)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("sampled_rows"),
            (F.count("*") * _SAMPLE_DENOM).alias("est_rows"),
            (F.sum(_quantize("value")) / 1_000_000.0)
            .cast("double")
            .alias("sampled_value"),
            (F.sum(_quantize("value")) * _SAMPLE_DENOM / 1_000_000.0)
            .cast("double")
            .alias("est_value"),
        )
    )


@register(
    "ch_topk_weighted",
    oracle=f"""
    SELECT event_type, user_id, weight, rk
    FROM (
      SELECT event_type, user_id,
             {DSUM.format(x='value')} AS weight,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY SUM({_Q.format(x='value')}) DESC, user_id) AS rk
      FROM events
      GROUP BY event_type, user_id
    ) WHERE rk <= 3
    """,
    tags=("A15", "W8", "EXT"),
)
def ch_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(3)(user_id, value)`` per event type —
    the heaviest users by *summed weight*, not by row count (a15 is the
    frequency form).  Exact two-stage plan: map-side partial sums →
    one exchange on (event_type, user_id) → per-group row_number over
    the already tiny (groups × users) relation.  Ordering compares the
    quantized long sums, so rank ties are impossible to produce by
    float noise; user_id breaks genuine ties."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        F.sum(_quantize("value")).alias("wq")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("wq"), "user_id")
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            "user_id",
            (F.col("wq") / 1_000_000.0).cast("double").alias("weight"),
            "rk",
        )
    )


@register(
    "ch_moving_sum_array",
    oracle=f"""
    SELECT user_id,
           STRING_AGG(CAST(CAST(msq AS BIGINT) AS VARCHAR),
                      ',' ORDER BY ts, event_id) AS moving_sums
    FROM (
      SELECT user_id, ts, event_id,
             SUM({_Q.format(x='value')}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS msq
      FROM events
    ) GROUP BY user_id
    """,
    tags=("A8", "W6", "EXT"),
)
def ch_moving_sum_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(3)(value)`` per user: the
    per-user sequence of trailing-3 moving sums in event order.  The
    moving-sum window and the final collect group on the SAME key, so
    Spark reuses one hash exchange on user_id for both — a single
    shuffle end-to-end (locked in tests/test_plans.py).  Addends are
    quantized longs, so every element is exact in both engines; order
    is forced by sorting (ts, event_id, msq) structs, never left to
    collect order.  The sequence is emitted as a comma-joined string
    of the quantized longs (value×1e6), NOT an array column: the round
    driver canonicalizes results through a pandas multi-key sort,
    which cannot factorize list cells (round-7 harness crash on this
    query — ``TypeError: unhashable type: 'list'``); longs render
    identically as text in both engines, so the string is still a
    bit-exact, order-sensitive encoding of the full array."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.sum(_quantize("value")).over(w).alias("msq"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "msq"))
                    ),
                    lambda s: s["msq"].cast("string"),
                ),
                ",",
            ).alias("moving_sums")
        )
    )


@register(
    "ch_with_fill_interpolate",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS dd,
             COUNT(*) AS n,
             {DSUM.format(x='o_totalprice')} AS rev
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
      GROUP BY 1
    ),
    spine AS (
      SELECT CAST(UNNEST(generate_series(
               (SELECT MIN(dd) FROM daily),
               (SELECT MAX(dd) FROM daily),
               INTERVAL 1 DAY)) AS DATE) AS dd
    )
    SELECT s.dd AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
           d.rev AS revenue,
           LAST_VALUE(d.rev IGNORE NULLS) OVER (
             ORDER BY s.dd
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS revenue_filled
    FROM spine s LEFT JOIN daily d USING (dd)
    """,
    tags=("A2", "W4", "EXT"),
)
def ch_with_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY day WITH FILL ... INTERPOLATE (revenue AS
    revenue)``: densify a gappy daily series to every calendar day and
    carry the last observed value forward across the filled gaps
    (ch_with_fill is the zero-fill sibling).  The spine derives from a
    1-row min/max aggregate via sequence+explode — generated
    distributed, bounded by the date range, never by the fact table.
    The carry-forward is last_value(ignorenulls) over the day-ordered
    spine; the single-partition window is safe *by construction*
    because its input is the spine, not the facts."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("dd")
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(_quantize("o_totalprice")) / 1_000_000.0)
            .cast("double")
            .alias("rev"),
        )
    )
    spine = (
        daily.agg(F.min("dd").alias("lo"), F.max("dd").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("dd"))
    )
    w = Window.orderBy("dd").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "dd", "left")
        .select(
            F.col("dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
            F.col("rev").alias("revenue"),
            F.last("rev", ignorenulls=True).over(w).alias("revenue_filled"),
        )
    )


@register(
    "ch_returning_users",
    oracle="""
    WITH pd AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    seq AS (
      SELECT user_id, day,
             LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      FROM pd
    )
    SELECT day, COUNT(*) AS returning_users
    FROM seq
    WHERE prev_day = day - 1
    GROUP BY day
    """,
    tags=("A3", "W3", "EXT"),
)
def ch_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day returning users — ClickHouse's
    ``groupBitmapAnd``/retention idiom: |active(d) ∩ active(d-1)| for
    every day.  The bitmap intersection (or the day×day self-join a
    naive SQL writes) is restated as a per-user lag: a user "returns"
    on day d iff their previous active day is d-1, so one (user, day)
    distinct pass + one lag window + one per-day count answers every
    day at once.  Shuffles: distinct on (user, day), window on user,
    final tiny day-level agg — all linear, no self-join, no bitmap
    state."""
    ev = load_table(spark, sf_dir, "events")
    pd_ = (
        ev.select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        pd_.withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev_day") == F.date_sub("day", 1))
        .groupBy("day")
        .agg(F.count("*").alias("returning_users"))
    )


@register(
    "ch_moving_avg_array",
    oracle=f"""
    SELECT user_id,
           STRING_AGG(CAST((CAST(msq AS BIGINT) * 6) // cnt AS VARCHAR),
                      ',' ORDER BY ts, event_id) AS moving_avgs
    FROM (
      SELECT user_id, ts, event_id,
             SUM({_Q.format(x='value')}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS msq,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt
      FROM events
    ) GROUP BY user_id
    """,
    tags=("A8", "W6", "EXT"),
)
def ch_moving_avg_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg(3)(value)`` — the moving-AVG
    companion of ch_moving_sum_array: per user, the 3-row trailing
    mean at every event, in the event order ClickHouse returns.
    Numerator is the quantized moving sum (exact long), denominator
    the same frame's COUNT (1-3 at the edges, like ClickHouse's
    partial windows).  Each mean is emitted as the EXACT scaled long
    ``msq*6/cnt`` — 6 is divisible by every frame size 1/2/3, so the
    division is integer-exact and both engines render the identical
    text — comma-joined into one string per user instead of an array
    column (the round driver's pandas canonical sort cannot factorize
    list cells; see ch_moving_sum_array).  One hash exchange serves
    the two frame windows AND the final collect — single-shuffle
    plan."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    rows = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(_quantize("value")).over(w).alias("msq"),
        F.count("*").over(w).alias("cnt"),
    )
    elem = F.expr("(msq * 6L) DIV cnt")
    return rows.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", elem.alias("v"))
                    )
                ),
                lambda s: s["v"].cast("string"),
            ),
            ",",
        ).alias("moving_avgs")
    )


@register(
    "ch_with_totals",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {DSUM.format(x='value')} AS sum_value,
           CASE WHEN event_type IS NULL THEN 1 ELSE 0 END AS is_totals
    FROM events
    GROUP BY ROLLUP (event_type)
    """,
    tags=("A6", "EXT"),
)
def ch_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``GROUP BY … WITH TOTALS`` — the grouped rows plus
    ONE grand-total row in the same result (dashboards render it as
    the footer). ANSI restatement: ROLLUP over a single key emits
    exactly the group rows + the NULL-keyed total, one aggregation
    pass with partial aggregates for both levels — no second scan, no
    union. The is_totals flag mirrors how ClickHouse clients separate
    the totals block."""
    ev = load_table(spark, sf_dir, "events")
    return ev.rollup("event_type").agg(
        F.count("*").alias("n"),
        dsum("value").alias("sum_value"),
        F.when(F.col("event_type").isNull(), 1).otherwise(0).alias("is_totals"),
    )


@register(
    "ch_resample_combinator",
    oracle=f"""
    SELECT event_type,
           CAST(100 + 200 * ((event_id % 1000 - 100) // 200) AS BIGINT)
             AS bucket_lo,
           COUNT(*) AS n,
           {DSUM.format(x='value')} AS sum_value
    FROM events
    WHERE event_id % 1000 >= 100 AND event_id % 1000 < 900
    GROUP BY event_type, bucket_lo
    """,
    tags=("A2", "EXT", "dialect"),
)
def ch_resample_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-Resample`` combinator —
    ``sumResample(100, 900, 200)(value, event_id % 1000)`` with a
    parallel ``countResample``: aggregates are computed independently
    for fixed-width subintervals of a resampling key, and key values
    outside ``[start, end)`` are EXCLUDED (the combinator's contract,
    public ClickHouse docs).  ClickHouse returns one array per group
    with an element per subinterval; restated relationally as one row
    per (group, bucket) — the x36 arrayJoin precedent, and the shape a
    driver-side pandas sort can actually canonicalize.  The plan is a
    single hash aggregate on (event_type, bucket): the bucket id is a
    scan-side integer expression, the out-of-range filter pushes into
    the parquet scan, and value sums are quantized longs — exact in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("event_id") % 1000
    return (
        ev.filter((key >= 100) & (key < 900))
        .groupBy(
            "event_type",
            (100 + 200 * ((key - 100).cast("long") / 200).cast("long"))
            .cast("long")
            .alias("bucket_lo"),
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )
