"""ClickHouse analytic-function parity: ``maxIntersections``,
``deltaSum`` and ``histogram`` (reference ecosystem: ClickHouse is the
source engine — ``/root/reference/mkpipe_extractor_clickhouse/
__init__.py:26-43`` — so users port queries written against its
analytics library; these are the interval/counter/distribution
workhorses that have no direct ANSI equivalent).

Spark-first restatements, all on the JVM codegen path:

* maxIntersections(start, end) is a sweep line: every interval emits a
  (+1 at start, -1 at end) event, a running sum over the ordered events
  is the live-interval count, and its max is the answer.  We partition
  the sweep by day (the intervals are per-day by construction), so each
  day's sweep is an independent window partition — no single-partition
  global sort, scales with the day dimension.
* deltaSum is a per-key ordered fold: lag() the previous value, keep
  positive increments, sum.  The shuffle is one hash partition by key;
  values are quantized to micro-unit longs *before* differencing so
  the fold is exact integer arithmetic in both engines.
* histogram(B) over observed [min, max] uses the same integer slice
  arithmetic as the range-partitioned read (operators/scans.py s5):
  bucket = ((vq - lo)·B) div (hi - lo + 1) on micro-unit longs —
  branchless, exact, and identical in Spark and DuckDB.  The bounds
  aggregate is a 1-row broadcast, the bucketing runs map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._cache import ephemeral_cache
from ._determinism import _Q, DSUM, _quantize, dsum

HIST_BINS = 20


@register(
    "ch_max_intersections",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY 1, 2
    ),
    pts AS (
      SELECT day, s AS ts, 1 AS delta FROM iv
      UNION ALL
      SELECT day, e AS ts, -1 AS delta FROM iv
    ),
    run AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC)
               AS live
      FROM pts
    )
    SELECT day, MAX(live) AS max_concurrent
    FROM run GROUP BY day ORDER BY day
    """,
    tags=("W5", "A2", "EXT"),
)
def ch_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections(start, end)`` per day: the peak
    number of simultaneously-active user sessions, where a session is a
    user's [first event, last event] span within the day.  Sweep line:
    +1/-1 boundary events, running sum, max.  Ties sort starts before
    ends (delta DESC) so touching intervals count as intersecting —
    ClickHouse's closed-interval semantics.  The default RANGE window
    frame includes order-by peers in both engines, so rows with equal
    (ts, delta) see identical running sums — deterministic."""
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "ts",
        )
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    pts = iv.select(
        "day", F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("day", F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    )
    sweep = Window.partitionBy("day").orderBy(
        F.col("ts").asc(), F.col("delta").desc()
    )
    return (
        pts.withColumn("live", F.sum("delta").over(sweep))
        .groupBy("day")
        .agg(F.max("live").alias("max_concurrent"))
    )


@register(
    "ch_delta_sum",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, {_Q.format(x='value')} AS vq,
             LAG({_Q.format(x='value')}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS pvq
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN pvq IS NOT NULL AND vq > pvq
                         THEN vq - pvq ELSE 0 END) / 1000000.0 AS DOUBLE)
             AS delta_sum,
           COUNT(*) AS n_events
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
    tags=("W3", "A2", "EXT"),
)
def ch_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum(value)`` per user: the sum of positive
    increments between consecutive readings in time order — the
    counter-reset-tolerant rate primitive (a monotonic counter that
    resets contributes only its upward movement).  One hash shuffle on
    user_id; the ordered fold is a lag window inside the partition.
    Values quantize to micro-unit longs before differencing
    (operators/_determinism.py), so increment arithmetic is exact
    integer math and order-stable across engines; (ts, event_id) breaks
    timestamp ties identically on both sides."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        _quantize("value").alias("vq"),
    ).withColumn("pvq", F.lag("vq").over(w))
    inc = F.when(
        F.col("pvq").isNotNull() & (F.col("vq") > F.col("pvq")),
        F.col("vq") - F.col("pvq"),
    ).otherwise(F.lit(0))
    return (
        seq.groupBy("user_id")
        .agg(
            (F.sum(inc) / 1_000_000.0).cast("double").alias("delta_sum"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "ch_histogram",
    oracle=f"""
    WITH q AS (SELECT {_Q.format(x='value')} AS vq FROM events),
    b AS (SELECT MIN(vq) AS lo, MAX(vq) AS hi FROM q)
    SELECT ((vq - lo) * {HIST_BINS}) // (hi - lo + 1) AS bucket_id,
           COUNT(*) AS n_rows,
           CAST(MIN(vq) / 1000000.0 AS DOUBLE) AS min_val,
           CAST(MAX(vq) / 1000000.0 AS DOUBLE) AS max_val
    FROM q CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
    tags=("A2", "F3", "EXT"),
)
def ch_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``histogram(B)(value)``, pinned to equal-width bins
    over the observed [min, max] (ClickHouse's adaptive bin placement is
    an execution heuristic; equal-width is the deterministic contract a
    cross-engine result can hold).  Two passes: a 1-row bounds
    aggregate (broadcast), then a map-side integer bucketing — the same
    exact slice arithmetic as the range-partitioned read (s5,
    operators/scans.py), on micro-unit longs so bucket edges can never
    straddle a float rounding difference between engines."""
    ev = load_table(spark, sf_dir, "events").select(
        _quantize("value").alias("vq")
    )
    bounds = ev.agg(F.min("vq").alias("lo"), F.max("vq").alias("hi"))
    return (
        ev.join(F.broadcast(bounds))
        .select(
            F.expr(f"(vq - lo) * {HIST_BINS} div (hi - lo + 1)").alias(
                "bucket_id"
            ),
            "vq",
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_rows"),
            (F.min("vq") / 1_000_000.0).cast("double").alias("min_val"),
            (F.max("vq") / 1_000_000.0).cast("double").alias("max_val"),
        )
    )


@register(
    "ch_dict_get",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           {DSUM.format(x='c.c_acctbal')} AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    tags=("J2", "F6", "EXT"),
)
def ch_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet('nations', 'n_name', c_nationkey)``: the
    dictionary is a bounded reference table resident on every node, and
    the lookup is an *expression*, not a join.  Spark-first equivalent:
    collect the 25-row dictionary once on the driver (bounded by the
    dictionary contract — ClickHouse dictionaries are RAM-resident by
    definition), inline it as a map literal, and resolve with
    element_at inside the scan stage — the plan has NO join node at
    all, the lookup rides whole-stage codegen map-side, and the
    aggregate shuffles already-resolved names.  The oracle is the join
    the dictionary replaces."""
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .collect()
    }
    entries = []
    for k in sorted(nation):
        entries.extend([F.lit(k), F.lit(nation[k])])
    dict_map = F.create_map(*entries)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.element_at(dict_map, F.col("c_nationkey")).alias("nation"),
            "c_acctbal",
        )
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "ch_replacing_final",
    oracle="""
    SELECT user_id, event_type, value AS last_value, ts AS last_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("W1", "A11", "EXT"),
)
def ch_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ReplacingMergeTree ... FINAL``: collapse each
    (user_id, event_type) key to its latest version — the read-time
    dedup a mutable-upsert table presents.  The merge-tree's background
    collapse becomes one window rank per key ordered by the version
    column (ts, with event_id as the deterministic tiebreaker — FINAL
    keeps the last-inserted part, our contract pins that to the larger
    event_id).  One hash shuffle on the key; at 100 TB this is the
    standard changelog-compaction plan and pairs with the MERGE loader
    (sources/extract.py x5) for the write side."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@register(
    "ch_quantile_weighted",
    oracle=f"""
    WITH w AS (
      SELECT event_type, event_id, {_Q.format(x='value')} AS vq,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS wt
      FROM events
    ),
    c AS (
      SELECT event_type, vq, wt,
             SUM(wt) OVER (PARTITION BY event_type
                           ORDER BY vq, event_id) AS cw,
             SUM(wt) OVER (PARTITION BY event_type) AS tw
      FROM w
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN cw * 2 >= tw THEN vq END) / 1000000.0
                AS DOUBLE) AS weighted_median,
           MAX(tw) AS total_weight
    FROM c GROUP BY event_type
    """,
    tags=("A9", "W5", "F7", "EXT"),
)
def ch_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5)(value, weight)`` per
    event type, with the weight pulled from the JSON props payload.
    The 100 TB form of an exact weighted quantile is NOT sort-and-walk
    on the driver — it is a cumulative-weight window inside each key
    partition: order by value, running-sum the weights, and the answer
    is the smallest value whose cumulative weight reaches half the
    total (the lower weighted median, deterministic with event_id as
    the unique tiebreaker).  One hash shuffle on event_type; values
    quantized to micro-longs so the boundary comparison is integer-
    exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        "event_type",
        "event_id",
        _quantize("value").alias("vq"),
        F.get_json_object("props", "$.k").cast("long").alias("wt"),
    )
    cum = Window.partitionBy("event_type").orderBy("vq", "event_id")
    tot = Window.partitionBy("event_type")
    c = w.select(
        "event_type",
        "vq",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return c.groupBy("event_type").agg(
        (
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("vq")))
            / 1_000_000.0
        )
        .cast("double")
        .alias("weighted_median"),
        F.max("tw").alias("total_weight"),
    )


@register(
    "ch_collapsing_final",
    oracle=f"""
    SELECT user_id,
           SUM(sign) AS net_rows,
           CAST(SUM({_Q.format(x='value')} * sign) / 1000000.0 AS DOUBLE)
             AS net_value
    FROM (
      SELECT user_id, value,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM events
    )
    GROUP BY user_id
    HAVING SUM(sign) > 0
    """,
    tags=("A2", "A5", "EXT"),
)
def ch_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``CollapsingMergeTree(sign)`` query-time collapse —
    the documented idiom for reading an insert/cancel changelog:
    ``SELECT key, sum(value * sign) ... GROUP BY key HAVING
    sum(sign) > 0`` (cancel rows carry sign=-1 and annihilate their
    insert). Here the changelog is modeled on events (even event_id →
    insert, odd → cancel). The background-merge collapse becomes one
    hash aggregation — partial map-side sums of (sign, value·sign),
    one exchange of per-key states, HAVING as a post-agg filter; at
    100 TB this is the changelog-netting plan (quantized addends keep
    the double sum order-independent, _determinism.py)."""
    ev = load_table(spark, sf_dir, "events")
    sign = F.when(F.col("event_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        ev.select("user_id", "value", sign.alias("sign"))
        .groupBy("user_id")
        .agg(
            F.sum("sign").alias("net_rows"),
            (F.sum(_quantize("value") * F.col("sign")) / 1_000_000.0)
            .cast("double")
            .alias("net_value"),
        )
        .filter(F.col("net_rows") > 0)
    )


@register(
    "ch_sequence_next_node",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(ROW(ts, event_id)) AS fk
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT COALESCE(o.next_type, 'none') AS next_type,
           COUNT(*) AS n_users
    FROM ordered o
    JOIN firsts f
      ON o.user_id = f.user_id
     AND ROW(o.ts, o.event_id) = f.fk
    GROUP BY COALESCE(o.next_type, 'none')
    """,
    tags=("W3", "EXT", "funnel"),
)
def ch_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward','first_match')`` — what
    happens AFTER each user's first 'click': the distribution of the
    immediately-following event type ('none' when the click closed the
    session). One per-user window (lead over ts,event_id — total order)
    plus a per-user min-struct aggregate to locate the first click;
    the two meet on the user_id partitioning already in place, then
    collapse to O(event types) rows. The path-analysis primitive
    behind 'next page' reports, join-free at fact scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    firsts = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fk"))
    )
    j = ordered.join(
        firsts,
        (ordered.user_id == firsts.user_id)
        & (F.struct(ordered.ts, ordered.event_id) == firsts.fk),
    )
    return j.groupBy(
        F.coalesce("next_type", F.lit("none")).alias("next_type")
    ).agg(F.count("*").alias("n_users"))


PATH_LEN = 3
PATH_TOP = 10


@register(
    "ch_top_paths",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT {PATH_TOP}
    """,
    tags=("W8", "A8", "EXT", "funnel"),
)
def ch_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys — each user's first 3 events concatenated into
    a path string, ranked by popularity (the ClickHouse path-analysis
    idiom built from groupArray + arrayStringConcat over a LIMIT BY
    prefix). Per-user prefix via row_number ≤ 3 (bounded window state,
    the W8 shape), ordered concatenation via the sorted-struct
    collect, then a path-count aggregation and a total-order top-10
    (count desc, path) — deterministic end to end, one exchange on
    user_id plus one on path."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(PATH_TOP)
    )


@register(
    "ch_audience_overlap",
    oracle="""
    WITH s AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS users_both
    FROM s a JOIN s b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
    tags=("A3", "F5", "EXT", "retention"),
)
def ch_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix — for every pair of event types, how
    many users did BOTH (the ClickHouse groupBitmapAnd / retention
    idiom). The oracle states it as the textbook fact self-join; the
    engine never self-joins: each user's distinct-type set collapses
    in one aggregation, the (a,b) pairs expand from that tiny sorted
    array with nested array transforms (≤ types² per user, types ≈ 5),
    and a second count aggregation finishes. At 100 TB the fact is
    scanned ONCE and nothing ever pairs at row granularity — the
    self-join the oracle pays would shuffle the fact twice."""
    ev = load_table(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    n = F.size("ts")
    pairs = F.flatten(
        F.transform(
            "ts",
            lambda x, i: F.transform(
                F.slice("ts", i + 2, n - i - 1),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("users_both"))
    )


MARKOV_ITERS = 3


@register(
    "g1_markov_stationary",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT cur, nxt, COUNT(*) AS c FROM ordered
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    p AS (
      SELECT cur, nxt,
             (c * 1000000) // SUM(c) OVER (PARTITION BY cur) AS p_ppm
      FROM trans
    ),
    types AS (SELECT DISTINCT cur AS t FROM trans),
    r0 AS (
      SELECT t, 1000000 // (SELECT COUNT(*) FROM types) AS r FROM types
    ),
    r1 AS (
      SELECT p.nxt AS t, SUM(r0.r * p.p_ppm) // 1000000 AS r
      FROM r0 JOIN p ON p.cur = r0.t GROUP BY p.nxt
    ),
    r2 AS (
      SELECT p.nxt AS t, SUM(r1.r * p.p_ppm) // 1000000 AS r
      FROM r1 JOIN p ON p.cur = r1.t GROUP BY p.nxt
    ),
    r3 AS (
      SELECT p.nxt AS t, SUM(r2.r * p.p_ppm) // 1000000 AS r
      FROM r2 JOIN p ON p.cur = r2.t GROUP BY p.nxt
    )
    SELECT t AS event_type, r AS stationary_ppm FROM r3
    """,
    tags=("W3", "EXT", "graph"),
)
def g1_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain analysis of user journeys: the event-type
    transition matrix (from consecutive per-user events) powered
    through 3 iterations from a uniform start — the power-iteration
    core of PageRank, landing on the near-stationary visit
    distribution. EVERYTHING is integer: transition probabilities in
    floor-ppm, rank mass in ppm, each iteration Σ r·p // 1e6 — so the
    result is bit-identical across engines with no quantization slack.
    Shapes: one window pass for transitions, then 3 joins over the
    O(types²) matrix — iteration cost is independent of the fact
    table; the same unrolled-iteration pattern runs PageRank on any
    edge list (l18's CC machinery is the unbounded-iteration
    variant)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        ordered.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("c"))
    )
    p = trans.select(
        "cur",
        "nxt",
        F.expr(
            "(c * 1000000) DIV sum(c) OVER (PARTITION BY cur)"
        ).alias("p_ppm"),
    )
    types = trans.select(F.col("cur").alias("t")).distinct()
    k = types.count()  # O(types) driver-side scalar, like ch_dict_get
    r = types.select("t", F.lit(1_000_000 // k).alias("r"))
    for _ in range(MARKOV_ITERS):
        r = (
            r.join(F.broadcast(p), r.t == p.cur)
            .groupBy(F.col("nxt").alias("t2"))
            .agg(F.expr("sum(r * p_ppm) DIV 1000000").alias("r"))
            .withColumnRenamed("t2", "t")
        )
    return r.select(F.col("t").alias("event_type"), F.col("r").alias("stationary_ppm"))


INTERP_MIN_VALUE = 180.0  # high-value events → sparse (type, day) grid


@register(
    "ts1_linear_interpolate",
    oracle=f"""
    WITH actual AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM({_Q.format(x='value')}) AS yq
      FROM events WHERE value >= {INTERP_MIN_VALUE}
      GROUP BY event_type, d
    ),
    span AS (
      SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
      FROM actual GROUP BY event_type
    ),
    grid AS (
      SELECT s.event_type, CAST(UNNEST(generate_series(s.mn, s.mx)) AS BIGINT) AS d
      FROM span s
    ),
    joined AS (
      SELECT g.event_type, g.d, a.yq FROM grid g
      LEFT JOIN actual a ON a.event_type = g.event_type AND a.d = g.d
    ),
    bounds AS (
      SELECT event_type, d, yq,
        LAST_VALUE(yq IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
        LAST_VALUE(CASE WHEN yq IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d0,
        FIRST_VALUE(yq IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1,
        FIRST_VALUE(CASE WHEN yq IS NOT NULL THEN d END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY d
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d1
      FROM joined
    )
    SELECT event_type, d AS day_index,
           ROUND(CASE
             WHEN yq IS NOT NULL THEN CAST(yq AS DOUBLE) / 1000000.0
             ELSE (CAST(y0 AS DOUBLE)
                   + CAST(y1 - y0 AS DOUBLE) * CAST(d - d0 AS DOUBLE)
                     / CAST(d1 - d0 AS DOUBLE)) / 1000000.0
           END, 6) AS value_interp,
           (yq IS NULL) AS interpolated
    FROM bounds
    """,
    tags=("W4", "W7", "EXT", "timeseries"),
)
def ts1_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation — the
    companion to ch_with_fill_interpolate's carry-forward: missing
    days on the daily grid get y0 + (y1−y0)·(d−d0)/(d1−d0) between
    the surrounding known points. Determinism: daily sums are
    quantized longs, day indexes are ints, so the lerp is ONE
    mirrored IEEE chain over exact integers (no float divisions of
    floats). The spine generates from each group's min/max day
    aggregate (never driver-side); the four IGNORE NULLS windows are
    two linear passes per group. Interior gaps only by construction
    (spine spans known points), so d1/d0 are never NULL at a gap."""
    ev = load_table(spark, sf_dir, "events")
    actual = (
        ev.filter(F.col("value") >= INTERP_MIN_VALUE)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(F.sum(_quantize("value")).alias("yq"))
    )
    span = actual.groupBy("event_type").agg(
        F.min("d").alias("mn"), F.max("d").alias("mx")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("mn", "mx")).alias("d"),
    ).select("event_type", F.col("d").cast("long").alias("d"))
    joined = grid.join(actual, ["event_type", "d"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_d = F.when(F.col("yq").isNotNull(), F.col("d"))
    b = joined.select(
        "event_type",
        "d",
        "yq",
        F.last("yq", ignorenulls=True).over(back).alias("y0"),
        F.last(known_d, ignorenulls=True).over(back).alias("d0"),
        F.first("yq", ignorenulls=True).over(fwd).alias("y1"),
        F.first(known_d, ignorenulls=True).over(fwd).alias("d1"),
    )
    lerp = (
        F.col("y0").cast("double")
        + (F.col("y1") - F.col("y0")).cast("double")
        * (F.col("d") - F.col("d0")).cast("double")
        / (F.col("d1") - F.col("d0")).cast("double")
    ) / 1_000_000.0
    return b.select(
        "event_type",
        F.col("d").alias("day_index"),
        F.round(
            F.when(
                F.col("yq").isNotNull(),
                F.col("yq").cast("double") / 1_000_000.0,
            ).otherwise(lerp),
            6,
        ).alias("value_interp"),
        F.col("yq").isNull().alias("interpolated"),
    )


LTTB_BUCKETS = 20


@register(
    "ch_lttb_downsample",
    # ORACLE-CHECKED as of round 4 (was rows-only "not SQL-expressible"):
    # the sequential selection IS expressible as a DuckDB RECURSIVE CTE —
    # one step per bucket, the argmax-area pick via a correlated
    # ORDER-BY/LIMIT-1 subquery, centroids from exact integer sums (the
    # kernel was aligned to the same arithmetic).  The hash-match pins
    # the full sequential algorithm, not just its invariants.
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT event_type,
             date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
               AS x,
             {{q}} AS y,
             event_id,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY date_diff('microsecond',
                                  TIMESTAMP '1970-01-01 00:00:00', ts),
                        event_id
             ) - 1 AS idx,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    series AS (SELECT DISTINCT event_type, n FROM pts),
    -- np.linspace(1, n-1, k-1) truncated to int64; endpoint forced
    edge AS (
      SELECT s.event_type, i,
             CAST(TRUNC(CASE WHEN i = {{k}} - 2 THEN CAST(n - 1 AS DOUBLE)
                  ELSE CAST(i AS DOUBLE)
                       * ((CAST(n AS DOUBLE) - 2.0) / ({{k}} - 2.0)) + 1.0
                  END) AS BIGINT) AS e
      FROM series s, (SELECT unnest(range(0, {{k}} - 1)) AS i)
      WHERE s.n > {{k}}
    ),
    bucket AS (
      SELECT b.event_type, b.b, lo.e AS lo, hi.e AS hi,
             hi.e AS nlo,
             COALESCE(n2.e, s.n) AS nhi
      FROM (SELECT event_type, unnest(range(0, {{k}} - 2)) AS b
            FROM series WHERE n > {{k}}) b
      JOIN series s ON s.event_type = b.event_type
      JOIN edge lo ON lo.event_type = b.event_type AND lo.i = b.b
      JOIN edge hi ON hi.event_type = b.event_type AND hi.i = b.b + 1
      LEFT JOIN edge n2 ON n2.event_type = b.event_type AND n2.i = b.b + 2
    ),
    cent AS (
      SELECT bk.event_type, bk.b, bk.lo, bk.hi,
             CAST(SUM(p.x) AS DOUBLE) / (bk.nhi - bk.nlo) AS cx,
             CAST(SUM(p.y) AS DOUBLE) / (bk.nhi - bk.nlo) AS cy
      FROM bucket bk
      JOIN pts p ON p.event_type = bk.event_type
                AND p.idx >= bk.nlo AND p.idx < bk.nhi
      GROUP BY bk.event_type, bk.b, bk.lo, bk.hi, bk.nhi, bk.nlo
    ),
    sel AS (
      SELECT event_type, -1 AS b, CAST(0 AS BIGINT) AS cur
      FROM series WHERE n > {{k}}
      UNION ALL
      SELECT s.event_type, s.b + 1,
             COALESCE((
               SELECT p.idx
               FROM cent c
               JOIN pts p ON p.event_type = c.event_type
                         AND p.idx >= c.lo AND p.idx < c.hi
               JOIN pts prev ON prev.event_type = c.event_type
                            AND prev.idx = s.cur
               WHERE c.event_type = s.event_type AND c.b = s.b + 1
               ORDER BY ABS(
                 (CAST(prev.x AS DOUBLE) - c.cx)
                   * (CAST(p.y AS DOUBLE) - CAST(prev.y AS DOUBLE))
                 - (CAST(prev.x AS DOUBLE) - CAST(p.x AS DOUBLE))
                   * (c.cy - CAST(prev.y AS DOUBLE))
               ) DESC, p.idx
               LIMIT 1
             ), s.cur) AS cur
      FROM sel s WHERE s.b + 1 <= {{k}} - 3
    ),
    keep AS (
      SELECT event_type, cur AS idx FROM sel
      UNION
      SELECT event_type, n - 1 FROM series WHERE n > {{k}}
      UNION
      SELECT event_type, idx FROM pts WHERE n <= {{k}}
    )
    SELECT p.event_type, p.x,
           CAST(p.y / 1000000.0 AS DOUBLE) AS value, p.event_id
    FROM keep kp JOIN pts p
      ON p.event_type = kp.event_type AND p.idx = kp.idx
    """.format(q=_Q.format(x="value"), k=20),
    tags=("A11", "EXT", "timeseries"),
)
def ch_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(20)(ts, value)`` — the
    LTTB downsampling algorithm (Steinarsson 2013): keep the first and
    last points, split the rest into buckets, and from each bucket
    keep the point forming the largest triangle with the PREVIOUSLY
    selected point and the next bucket's centroid — the downsample
    that preserves visual shape (spikes survive; averaging would
    flatten them). The selection is inherently sequential per series,
    so it runs as an applyInPandas kernel per event_type — series are
    independent, so the shape distributes across groups exactly like
    D4; within a series the cost is one linear pass. Deterministic:
    ties break to the earliest point, input order is fixed by
    (ts, event_id)."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        # NTZ-pure epoch micros (session-timezone-independent, unlike
        # unix_micros(cast)); elapsed == boundary count at µs grain
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("x"),
        _quantize("value").alias("y"),
        "event_id",
    )

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["x", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        k = LTTB_BUCKETS
        if n <= k:
            keep = pdf
        else:
            import numpy as np

            xi = pdf["x"].to_numpy(dtype="int64")
            yi = pdf["y"].to_numpy(dtype="int64")
            xs = xi.astype("float64")
            ys = yi.astype("float64")
            # bucket boundaries over the interior points [1, n-1)
            edges = np.linspace(1, n - 1, k - 1).astype("int64")
            chosen = [0]
            for b in range(k - 2):
                lo, hi = edges[b], edges[b + 1]
                if hi <= lo:
                    continue
                nlo, nhi = edges[b + 1], (
                    edges[b + 2] if b + 2 < len(edges) else n
                )
                # centroids from EXACT integer sums, one float division
                # — engine-replicable (the SQL oracle mirrors SUM/cnt);
                # np.mean's pairwise float summation is not
                if nhi > nlo:
                    cx = int(xi[nlo:nhi].sum()) / (nhi - nlo)
                    cy = int(yi[nlo:nhi].sum()) / (nhi - nlo)
                else:
                    cx, cy = xs[-1], ys[-1]
                ax, ay = xs[chosen[-1]], ys[chosen[-1]]
                area = np.abs(
                    (ax - cx) * (ys[lo:hi] - ay) - (ax - xs[lo:hi]) * (cy - ay)
                )
                chosen.append(lo + int(area.argmax()))
            chosen.append(n - 1)
            keep = pdf.iloc[chosen]
        out = keep[["event_type", "x", "y", "event_id"]].copy()
        return out

    schema = "event_type string, x long, y long, event_id long"
    return (
        pts.groupBy("event_type")
        .applyInPandas(lttb, schema=schema)
        .select(
            "event_type",
            "x",
            (F.col("y") / 1_000_000.0).cast("double").alias("value"),
            "event_id",
        )
    )


@register(
    "ts2_weekday_profile",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    dow AS (
      SELECT event_type,
             -- DuckDB dayofweek is 0-based (Sun=0); Spark's is Sun=1
             CAST(dayofweek(day) AS BIGINT) + 1 AS dow,
             SUM(revq) AS dow_revq,
             SUM(SUM(revq)) OVER (PARTITION BY event_type) AS total_revq
      FROM daily GROUP BY event_type, dayofweek(day)
    )
    SELECT event_type, dow,
           CAST(dow_revq / 1000000.0 AS DOUBLE) AS dow_revenue,
           dow_revq * 1000000 // total_revq AS share_ppm
    FROM dow
    """,
    tags=("A2", "F2", "EXT", "timeseries"),
)
def ts2_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile — each stream's revenue mass by day
    of week, with the share of the week in exact floor-ppm: the
    baseline w13's week-over-week comparison implicitly assumes, made
    explicit (a flat profile says WoW and DoD are interchangeable; a
    spiky one says only WoW is honest). Two rollup aggregations over
    quantized longs; shares divide exact integers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    dow = daily.groupBy(
        "event_type", F.dayofweek("day").cast("long").alias("dow")
    ).agg(F.sum("revq").alias("dow_revq"))
    dow = dow.withColumn(
        "total_revq",
        F.sum("dow_revq").over(Window.partitionBy("event_type")),
    )
    return dow.select(
        "event_type",
        "dow",
        (F.col("dow_revq") / 1_000_000.0).cast("double").alias("dow_revenue"),
        F.expr("dow_revq * 1000000 DIV total_revq").alias("share_ppm"),
    )


PAGERANK_ITERS = 3
PAGERANK_DAMP_PCT = 85  # d = 0.85, held as an exact integer percent


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration in pure integer arithmetic
    (shared by the DuckDB oracle below)."""
    return f"""
    {out} AS (
      SELECT ty.t,
             (1000000 - {PAGERANK_DAMP_PCT} * 10000)
               // (SELECT COUNT(*) FROM types)
             + ({PAGERANK_DAMP_PCT}
                * (COALESCE(SUM({prev}.r * p.p_ppm), 0) // 1000000)) // 100 AS r
      FROM types ty
      LEFT JOIN p ON p.nxt = ty.t
      LEFT JOIN {prev} ON {prev}.t = p.cur
      GROUP BY ty.t
    )"""


@register(
    "g2_pagerank",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT cur, nxt, COUNT(*) AS c FROM ordered
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    p AS (
      SELECT cur, nxt,
             (c * 1000000) // SUM(c) OVER (PARTITION BY cur) AS p_ppm
      FROM trans
    ),
    types AS (
      SELECT DISTINCT t FROM (
        SELECT cur AS t FROM trans UNION SELECT nxt FROM trans
      )
    ),
    r0 AS (
      SELECT t, 1000000 // (SELECT COUNT(*) FROM types) AS r FROM types
    ),
    {_pagerank_iter_sql('r0', 'r1')},
    {_pagerank_iter_sql('r1', 'r2')},
    {_pagerank_iter_sql('r2', 'r3')}
    SELECT t AS event_type, r AS pagerank_ppm
    FROM r3 ORDER BY pagerank_ppm DESC, event_type
    """,
    tags=("W3", "EXT", "graph"),
)
def g2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d = 0.85) over the event-type transition graph
    — g1's power iteration plus the teleport term, the full algorithm
    behind source-importance scoring on web/link graphs. EVERYTHING is
    integer: edge probabilities in floor-ppm, rank mass in ppm, each
    iteration ``(1−d)·1e6 // N + d·(Σ r·p // 1e6) // 100`` with d held
    as an integer percent — bit-identical across engines, no
    quantization slack. Nodes are the UNION of sources and sinks, and
    the left join keeps in-edge-free nodes alive on the teleport mass
    (the two cases plain power iteration drops). Shapes: one window
    pass builds edges; each iteration is one broadcast join over the
    O(types²) matrix, so iteration cost is independent of the fact
    table — on a billion-edge graph the same loop runs with the edge
    list left partitioned by cur and localCheckpoint() lineage
    truncation every few rounds (the l18 CC posture)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        ordered.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("c"))
    )
    p = trans.select(
        "cur",
        "nxt",
        F.expr("(c * 1000000) DIV sum(c) OVER (PARTITION BY cur)").alias(
            "p_ppm"
        ),
    )
    types = (
        trans.select(F.col("cur").alias("t"))
        .union(trans.select("nxt"))
        .distinct()
    )
    n_types = types.count()  # O(types) driver-side scalar, like g1
    teleport = (1_000_000 - PAGERANK_DAMP_PCT * 10_000) // n_types
    r = types.select("t", F.lit(1_000_000 // n_types).alias("r"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            r.join(F.broadcast(p), r.t == p.cur)
            .groupBy(F.col("nxt").alias("t2"))
            .agg(F.expr("sum(r * p_ppm) DIV 1000000").alias("c"))
        )
        r = types.join(
            F.broadcast(contrib), types.t == contrib.t2, "left"
        ).select(
            "t",
            (
                F.lit(teleport)
                + F.expr(
                    f"({PAGERANK_DAMP_PCT} * coalesce(c, 0)) DIV 100"
                )
            ).alias("r"),
        )
    return r.select(
        F.col("t").alias("event_type"), F.col("r").alias("pagerank_ppm")
    ).orderBy(F.desc("pagerank_ppm"), "event_type")


@register(
    "ch_attribution_last_touch",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS purchases,
           CAST(SUM({_Q.format(x='value')}) / 1000000.0 AS DOUBLE)
             AS revenue
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("A7", "W4", "EXT", "funnel"),
)
def ch_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value credits
    the user's most recent preceding non-purchase event type (the
    'channel'); purchases with no prior touch credit 'direct'. The
    IGNORE-NULLS last_value over the per-user ordered frame is the
    same LOCF machinery as w10, scoped to [start, current): one user
    shuffle, one window pass, then a tiny channel rollup on quantized
    longs — exact and order-independent. The other attribution models
    (first-touch = FIRST_VALUE, linear = split by a range-frame touch
    count) swap the frame expression, not the plan shape."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").alias("purchases"),
            (F.sum(_quantize("value")) / 1_000_000.0)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("channel")
    )


ATTR_LOOKBACK_DAYS = 7


@register(
    "ch_attribution_linear",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, ts AS tp, event_id AS pid,
             {_Q.format(x='value')} AS vq
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts AS tt, event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ),
    joined AS (
      SELECT p.pid, p.vq, t.channel
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.tt < p.tp
       AND t.tt >= p.tp - INTERVAL {ATTR_LOOKBACK_DAYS} DAY
    ),
    per AS (
      SELECT pid, vq, channel, COUNT(*) AS k,
             SUM(COUNT(*)) OVER (PARTITION BY pid) AS n
      FROM joined GROUP BY pid, vq, channel
    )
    SELECT channel,
           CAST(SUM(vq * k // n) / 1000000.0 AS DOUBLE)
             AS attributed_revenue,
           SUM(k) AS touches
    FROM per GROUP BY channel ORDER BY channel
    """,
    tags=("A7", "J9", "EXT", "funnel"),
)
def ch_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) attribution with a 7-day lookback: each
    purchase's value divides evenly across every touch in its window,
    aggregated to channel revenue. The interval join is per-user
    bounded (the j9/x13 posture — equi on user_id, range on ts; never
    cartesian), and the split uses exact integer floor shares
    ``vq·k DIV n`` so both engines lose the identical sub-ppm
    remainder — deterministic where a float division would drift.
    Compare with ch_attribution_last_touch: same question, window
    machinery vs interval-join machinery."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("tp"),
        F.col("event_id").alias("pid"),
        _quantize("value").alias("vq"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("tt"), F.col("event_type").alias("channel")
    )
    joined = p.join(
        t,
        (p.user_id == t.user_id)
        & (t.tt < p.tp)
        & (t.tt >= p.tp - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS")),
    ).select("pid", "vq", "channel")
    per = (
        joined.groupBy("pid", "vq", "channel")
        .agg(F.count("*").alias("k"))
        .withColumn("n", F.sum("k").over(Window.partitionBy("pid")))
    )
    return (
        per.groupBy("channel")
        .agg(
            (F.sum(F.expr("vq * k DIV n")) / 1_000_000.0)
            .cast("double")
            .alias("attributed_revenue"),
            F.sum("k").alias("touches"),
        )
        .orderBy("channel")
    )


SPARKBAR_BUCKETS = 8
_SPARKBAR_GLYPHS = "▁▂▃▄▅▆▇█"


@register(
    "ch_sparkbar",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    bucketed AS (
      SELECT event_type,
             (d * {SPARKBAR_BUCKETS}) // 31 AS bucket,
             SUM(revq) AS bq
      FROM daily GROUP BY 1, 2
    ),
    scaled AS (
      SELECT event_type, bucket, bq,
             MAX(bq) OVER (PARTITION BY event_type) AS mx
      FROM bucketed
    ),
    glyphs AS (
      SELECT event_type, bucket,
             -- height 1..8: ceil(8·bq/mx) in pure integer arithmetic
             ((bq * {len(_SPARKBAR_GLYPHS)} + mx - 1) // mx) AS h
      FROM scaled
    )
    SELECT event_type,
           STRING_AGG(SUBSTRING('{_SPARKBAR_GLYPHS}', CAST(h AS INT), 1),
                      '' ORDER BY bucket) AS bar
    FROM glyphs GROUP BY event_type ORDER BY event_type
    """,
    tags=("A2", "F1", "EXT", "timeseries"),
)
def ch_sparkbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sparkbar(buckets)(x, y)`` — the inline unicode
    bar chart per group (▁▂▅█…), rendered with PURE integer
    arithmetic: day-of-month buckets by floor division, bar heights by
    integer ceiling against the group max, glyph lookup by substring
    index — so the STRING output is bit-identical across engines (no
    float anywhere). Data path is two hash aggs + one small window;
    the string assembly touches O(groups × buckets) rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("d"),
    ).agg(F.sum(_quantize("value")).alias("revq"))
    bucketed = daily.groupBy(
        "event_type",
        F.expr(f"(d * {SPARKBAR_BUCKETS}) DIV 31").alias("bucket"),
    ).agg(F.sum("revq").alias("bq"))
    scaled = bucketed.withColumn(
        "mx", F.max("bq").over(Window.partitionBy("event_type"))
    )
    glyphs = scaled.select(
        "event_type",
        "bucket",
        F.expr(
            f"(bq * {len(_SPARKBAR_GLYPHS)} + mx - 1) DIV mx"
        ).alias("h"),
    )
    return (
        glyphs.groupBy("event_type")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "h"))
                    ),
                    lambda s: F.substring(
                        F.lit(_SPARKBAR_GLYPHS), s["h"].cast("int"), 1
                    ),
                ),
            ).alias("bar")
        )
        .orderBy("event_type")
    )


COPURCHASE_TOP_PARTS = 8
COPURCHASE_TOP_PAIRS = 20


@register(
    "g3_copurchase_pairs",
    oracle=f"""
    WITH vol AS (
      SELECT l_suppkey, l_partkey, SUM({_Q.format(x='l_quantity')}) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    top_parts AS (
      SELECT * FROM (
        SELECT l_suppkey, l_partkey, q,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY q DESC, l_partkey) AS rn
        FROM vol
      ) WHERE rn <= {COPURCHASE_TOP_PARTS}
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_suppliers,
             SUM(a.q + b.q) AS wq
      FROM top_parts a JOIN top_parts b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_suppliers,
           CAST(wq / 1000000.0 AS DOUBLE) AS weight
    FROM pairs
    ORDER BY n_suppliers DESC, weight DESC, part_a, part_b
    LIMIT {COPURCHASE_TOP_PAIRS}
    """,
    tags=("W8", "J1", "EXT", "graph"),
)
def g3_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite co-occurrence projection — the co-purchase graph
    construction behind 'frequently supplied together': project the
    supplier–part bipartite graph onto part–part edges weighted by
    shared suppliers. The quadratic hazard (a supplier with 10⁵ parts
    creates 10¹⁰ pairs) is bounded BEFORE pairing by a deterministic
    per-supplier top-m cut (volume desc, key tiebreak — Spark plans it
    as WindowGroupLimit, so even the cut never materializes full
    lists); pair counts then cost O(suppliers · m²). Quantized-long
    weights, total ordering on the output cut — exact. The same
    prune-then-pair shape builds co-click/co-view graphs from user
    histories at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_quantize("l_quantity")).alias("q")
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("q").desc(), "l_partkey"
    )
    top_parts = (
        vol.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= COPURCHASE_TOP_PARTS)
        .drop("rn")
    )
    a = top_parts.alias("a")
    b = top_parts.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("a.q") + F.col("b.q")).alias("wq"),
        )
    )
    return (
        pairs.select(
            "part_a",
            "part_b",
            "n_suppliers",
            (F.col("wq") / 1_000_000.0).cast("double").alias("weight"),
        )
        .orderBy(
            F.col("n_suppliers").desc(),
            F.col("weight").desc(),
            "part_a",
            "part_b",
        )
        .limit(COPURCHASE_TOP_PAIRS)
    )


@register(
    "g4_triangle_count",
    oracle=f"""
    WITH vol AS (
      SELECT l_suppkey, l_partkey, SUM({_Q.format(x='l_quantity')}) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    top_parts AS (
      SELECT * FROM (
        SELECT l_suppkey, l_partkey, q,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY q DESC, l_partkey) AS rn
        FROM vol
      ) WHERE rn <= {COPURCHASE_TOP_PARTS}
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM top_parts a JOIN top_parts b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT COUNT(*) AS triangles,
           COUNT(DISTINCT a) AS apex_parts,
           (SELECT COUNT(*) FROM edges) AS edges
    FROM tri
    """,
    tags=("J1", "EXT", "graph"),
)
def g4_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase projection (g3's graph)
    — the clustering-coefficient numerator and the canonical
    'graph analytics as joins' demonstration: orient every edge
    low→high, then count paths a→b→c that close with an a→c edge
    (each triangle counted exactly once under the orientation). Two
    equi-joins over the edge list — the MapReduce triangle-counting
    shape (Suri & Vassilvitskii's partition-friendly formulation),
    where edge orientation by degree is the classic skew guard at
    real scale. Edge list is bounded by g3's per-supplier top-m cut;
    everything is integer."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_quantize("l_quantity")).alias("q")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.col("q").desc(), "l_partkey")
    top_parts = (
        vol.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= COPURCHASE_TOP_PARTS)
        .drop("rn")
    )
    a = top_parts.alias("a")
    b = top_parts.alias("b")
    # ephemeral_cache: the triangle join references the edge list three
    # times (e1/e2/e3) plus the edges.count() scalar — without it the
    # agg + window + supplier self-join + distinct subtree re-executes
    # per reference (r12, measured with the g-family batch: computing
    # the edge relations once cut the nine g* queries 20.7 → 9.8 s
    # steady at sf0.1, bit-identical results).
    edges = ephemeral_cache(
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(F.col("e1.u").alias("a"))
    )
    n_edges = edges.count()  # metadata-scale scalar, like g1/g2
    return tri.agg(
        F.count("*").alias("triangles"),
        F.countDistinct("a").alias("apex_parts"),
        F.lit(n_edges).cast("long").alias("edges"),
    )


LIFT_MIN_SUPPORT = 3  # baskets containing the pair


@register(
    "q24_basket_lift",
    oracle=f"""
    WITH vol AS (
      SELECT l_suppkey, l_partkey, SUM({_Q.format(x='l_quantity')}) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    top_parts AS (
      SELECT * FROM (
        SELECT l_suppkey, l_partkey, q,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY q DESC, l_partkey) AS rn
        FROM vol
      ) WHERE rn <= {COPURCHASE_TOP_PARTS}
    ),
    n_baskets AS (SELECT COUNT(DISTINCT l_suppkey) AS nb FROM top_parts),
    item AS (
      SELECT l_partkey, COUNT(*) AS n_item FROM top_parts GROUP BY 1
    ),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_pair
      FROM top_parts a JOIN top_parts b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.n_pair,
           ROUND(CAST(p.n_pair AS DOUBLE) / ia.n_item, 6) AS confidence_ab,
           ROUND(CAST(p.n_pair AS DOUBLE) * nb.nb
                 / (ia.n_item * ib.n_item), 6) AS lift
    FROM pair p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey
    CROSS JOIN n_baskets nb
    WHERE p.n_pair >= {LIFT_MIN_SUPPORT}
    ORDER BY lift DESC, p.part_a, p.part_b
    LIMIT 50
    """,
    tags=("A2", "J1", "EXT", "graph"),
)
def q24_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association scoring — support, confidence and
    LIFT for co-supplied part pairs (supplier = basket): the Apriori
    scoring layer that turns g3's raw co-occurrence counts into 'is
    this pairing MORE common than chance'. lift = P(A,B)/(P(A)·P(B))
    assembles from exact integer counts in one IEEE tree, rounded;
    the item and basket tables broadcast. Bounded by the same
    per-basket top-m cut as g3, so the pair stage never amplifies
    with basket size; a min-support gate prunes noise pairs before
    ranking — exactly how frequent-itemset mining controls output at
    retail scale."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_quantize("l_quantity")).alias("q")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.col("q").desc(), "l_partkey")
    # pinned (r12): consumed by the nb scalar, the item margins, and
    # both pair-join sides — the lineitem agg + window cut re-executed
    # per consumer (4 lineitem scans in the plan audit)
    top_parts = ephemeral_cache(
        vol.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= COPURCHASE_TOP_PARTS)
        .drop("rn")
    )
    nb = top_parts.select("l_suppkey").distinct().count()
    item = top_parts.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a = top_parts.alias("a")
    b = top_parts.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= LIFT_MIN_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(
                F.col("n_pair").cast("double") / F.col("n_a"), 6
            ).alias("confidence_ab"),
            F.round(
                F.col("n_pair").cast("double")
                * nb
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "g5_clustering_coefficient",
    oracle=f"""
    WITH vol AS (
      SELECT l_suppkey, l_partkey, SUM({_Q.format(x='l_quantity')}) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    top_parts AS (
      SELECT * FROM (
        SELECT l_suppkey, l_partkey, q,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY q DESC, l_partkey) AS rn
        FROM vol
      ) WHERE rn <= {COPURCHASE_TOP_PARTS}
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM top_parts a JOIN top_parts b
        ON a.l_suppkey = b.l_suppkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    tri AS (
      -- triangles per node: count closed wedges centered anywhere,
      -- attributed to EVERY corner via the undirected adjacency
      SELECT w.node, COUNT(*) AS t2
      FROM (SELECT a.u AS node, a.v AS x, b.v AS y
            FROM und a JOIN und b ON a.u = b.u AND a.v < b.v) w
      JOIN edges e
        ON e.u = LEAST(w.x, w.y) AND e.v = GREATEST(w.x, w.y)
      GROUP BY w.node
    )
    SELECT d.node, d.d AS degree,
           COALESCE(t.t2, 0) AS triangles,
           ROUND(COALESCE(t.t2, 0) * 2.0 / (d.d * (d.d - 1)), 6)
             AS clustering_coeff
    FROM deg d LEFT JOIN tri t ON d.node = t.node
    WHERE d.d >= 2
    ORDER BY clustering_coeff DESC, d.node
    LIMIT 50
    """,
    tags=("J1", "EXT", "graph"),
)
def g5_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — g4's triangle count
    normalized per vertex: of the deg·(deg−1)/2 possible links among
    a part's co-purchase neighbors, what fraction exist? (The
    'how cliquish is this product's neighborhood' score behind
    community seeds and anomaly flags.) Wedges come from one
    adjacency self-join, closed by an edge-list join — both
    equi-keyed; the final ratio is one IEEE division of exact
    integers. Same bounded edge list as g3/g4."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_quantize("l_quantity")).alias("q")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.col("q").desc(), "l_partkey")
    top_parts = (
        vol.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= COPURCHASE_TOP_PARTS)
        .drop("rn")
    )
    a = top_parts.alias("a")
    b = top_parts.alias("b")
    # ephemeral_cache: referenced ~5x (both union sides of `und`, both
    # wedge sides, and the closing join) — same recompute hazard and
    # measurement as g4's note.
    edges = ephemeral_cache(
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    und = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    wa = und.alias("wa")
    wb = und.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.u") == F.col("wb.u")) & (F.col("wa.v") < F.col("wb.v")),
    ).select(
        F.col("wa.u").alias("node"),
        F.col("wa.v").alias("x"),
        F.col("wb.v").alias("y"),
    )
    tri = (
        wedges.join(
            edges,
            (edges.u == F.least("x", "y")) & (edges.v == F.greatest("x", "y")),
        )
        .groupBy("node")
        .agg(F.count("*").alias("t2"))
    )
    return (
        deg.join(tri, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce("t2", F.lit(0)).alias("triangles"),
            F.round(
                F.coalesce("t2", F.lit(0)) * 2.0 / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy(F.col("clustering_coeff").desc(), "node")
        .limit(50)
    )


@register(
    "ch_growth_accounting",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    flagged AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             MIN(wk) OVER (PARTITION BY user_id) AS first_wk
      FROM weekly
    ),
    classified AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM flagged
    ),
    churn AS (
      SELECT wk + INTERVAL 7 DAY AS wk, 'churned' AS status
      FROM flagged f
      WHERE NOT EXISTS (
        SELECT 1 FROM weekly w
        WHERE w.user_id = f.user_id AND w.wk = f.wk + INTERVAL 7 DAY)
        AND f.wk + INTERVAL 7 DAY <= (SELECT MAX(wk) FROM weekly)
    )
    SELECT CAST(wk AS DATE) AS wk, status, COUNT(*) AS users
    FROM (SELECT wk, status FROM classified
          UNION ALL SELECT CAST(wk AS DATE), status FROM churn)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("A3", "W3", "EXT", "retention"),
)
def ch_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the weekly active-user ledger every growth
    team lives by: each week's actives split into NEW (first week
    ever), RETAINED (also active last week), RESURRECTED (returning
    after a gap), plus CHURNED (active last week, absent this week,
    booked against the week they missed). The identity
    new + retained + resurrected − churned = ΔWAU makes the four
    series an exact decomposition of growth. One per-user weekly
    window pass (lag + first week), an anti-existence check for
    churn (per-user bounded), pure date/integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    flagged = weekly.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.min("wk").over(Window.partitionBy("user_id")).alias("first_wk"),
    )
    classified = flagged.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.date_sub(F.col("wk"), 7), "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    max_wk = weekly.agg(F.max("wk").alias("mx"))
    nxt = flagged.select(
        "user_id", F.date_add("wk", 7).alias("wk")
    )
    churn = (
        nxt.join(weekly, ["user_id", "wk"], "left_anti")
        .join(F.broadcast(max_wk))
        .filter(F.col("wk") <= F.col("mx"))
        .select("wk", F.lit("churned").alias("status"))
    )
    return (
        classified.unionAll(churn)
        .groupBy("wk", "status")
        .agg(F.count("*").alias("users"))
        .orderBy("wk", "status")
    )


@register(
    "ch_retention_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.d0, CAST(date_trunc('day', e.ts) AS DATE))
               AS age_days
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    cohort AS (SELECT COUNT(*) AS n0 FROM firsts)
    SELECT age_days,
           COUNT(*) AS active_users,
           COUNT(*) * 1000000 // c.n0 AS retention_ppm
    FROM activity CROSS JOIN cohort c
    WHERE age_days <= 14
    GROUP BY age_days, c.n0 ORDER BY age_days
    """,
    tags=("A3", "J1", "EXT", "retention"),
)
def ch_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-N retention curve — fraction of the full cohort active
    exactly N days after their own first day (0 ≤ N ≤ 14): the
    product-health chart every 'retention' conversation is actually
    about (ch_retention gives fixed checkpoint flags; ch_cohort_matrix
    slices by signup week; this is the aggregate curve). Per-user
    first-day anchor join, distinct (user, age) de-dup, integer
    floor-ppm rates against the cohort size. Two hash aggs + one
    broadcastable anchor join."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d0")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.col("d0")
            ).alias("age_days"),
        )
        .distinct()
    )
    n0 = firsts.count()  # cohort-size scalar, like g1's type count
    return (
        activity.filter(F.col("age_days") <= 14)
        .groupBy("age_days")
        .agg(
            F.count("*").alias("active_users"),
            F.expr(f"COUNT(*) * 1000000 DIV {n0}").alias("retention_ppm"),
        )
        .orderBy("age_days")
    )
