"""ClickHouse aggregate-function parity beyond the ANSI set: ``sumMap``
and ``uniqUpTo`` (reference ecosystem: ClickHouse is the source engine —
``/root/reference/mkpipe_extractor_clickhouse/__init__.py:26-43`` — so
users port queries written against its aggregate library).

Both stay on the JVM aggregate path:

* sumMap is two-level hash aggregation — per-(group, key) partial sums
  first (map-side combine collapses the fact table before the shuffle),
  then a per-group reassembly of the handful of (key, sum) rows into the
  sorted parallel arrays ClickHouse returns.  No per-row map objects
  survive the first aggregate, so state size is bounded by the key
  cardinality, not the row count — the 100 TB shape.
* uniqUpTo(N) caps an exact distinct count at N+1.  Spark's distinct
  aggregation already does a partial dedup per partition before the
  shuffle; the LEAST cap is applied at the end (semantically identical —
  ClickHouse's bounded-state optimization is an execution detail its
  results contract hides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import _Q, _quantize

UNIQ_CAP = 50


@register(
    "ch_summap",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type AS k, SUM({_Q.format(x='value')}) AS vq
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           STRING_AGG(k, ',' ORDER BY k) AS sum_map_keys,
           STRING_AGG(CAST(vq AS VARCHAR), ',' ORDER BY k) AS sum_map_vals_micro
    FROM per GROUP BY user_id
    """,
    tags=("A2", "F6", "EXT"),
)
def ch_summap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap(map(event_type, value))`` per user: merge map
    states by summing values key-wise, return the sorted key array plus
    the parallel sums array (micro-unit longs so the doubles are
    order-independent and hash-exact; arrays CSV-joined per the repo's
    a8 convention for hashable output)."""
    ev = load_table(spark, sf_dir, "events")
    # The map column a ClickHouse user would pass to sumMap; exploding
    # it back to entries is the distributed merge strategy.
    entries = ev.select(
        "user_id", F.explode(F.create_map("event_type", "value")).alias("k", "v")
    )
    per_key = entries.groupBy("user_id", "k").agg(
        F.sum(_quantize("v")).alias("vq")
    )
    merged = per_key.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("k", "vq"))).alias("e")
    )
    return merged.select(
        "user_id",
        F.array_join(F.transform("e", lambda s: s["k"]), ",").alias("sum_map_keys"),
        F.array_join(
            F.transform("e", lambda s: s["vq"].cast("string")), ","
        ).alias("sum_map_vals_micro"),
    )


@register(
    "ch_uniq_up_to",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           LEAST(COUNT(DISTINCT user_id), {UNIQ_CAP + 1}) AS uniq_users_upto
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
    tags=("A3", "A4", "EXT"),
)
def ch_uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(50)(user_id)`` per (event_type, day): the
    exact distinct count while it is ≤ 50, else 51 — the "did this
    slice exceed the threshold" primitive behind alerting rollups."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.least(F.countDistinct("user_id"), F.lit(UNIQ_CAP + 1))
        .cast("long")
        .alias("uniq_users_upto")
    )


from ._determinism import DSUM, dsum  # noqa: E402

SPARSE_MIN_VALUE = 180.0  # high-value events → sparse (type, day) grid


@register(
    "ch_with_fill",
    oracle=f"""
    WITH actual AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             {DSUM.format(x='value')} AS sum_value
      FROM events WHERE value >= {SPARSE_MIN_VALUE}
      GROUP BY event_type, date_trunc('day', ts)
    ),
    span AS (
      SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
      FROM actual GROUP BY event_type
    ),
    grid AS (
      SELECT s.event_type,
             CAST(UNNEST(generate_series(s.mn, s.mx, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span s
    )
    SELECT g.event_type, g.day,
           COALESCE(a.sum_value, 0.0) AS sum_value,
           a.sum_value IS NULL AS was_filled
    FROM grid g LEFT JOIN actual a USING (event_type, day)
    """,
    tags=("F2", "W7", "EXT"),
)
def ch_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY day WITH FILL`` parity: densify a sparse
    per-(event_type, day) series — every calendar day between each
    type's first and last observation appears, gaps carrying 0 and a
    fill marker. The grid is generated from the per-type [min, max]
    span (one tiny aggregate + a sequence explode over days), so the
    fill cost is O(calendar span), independent of event volume."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value") >= SPARSE_MIN_VALUE
    )
    actual = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(dsum("value").alias("sum_value"))
    grid = (
        actual.groupBy("event_type")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return grid.join(actual, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        F.col("sum_value").isNull().alias("was_filled"),
    )


@register(
    "ch_uniq_merge_rollup",
    oracle=None,  # HLL estimate (approximate by contract) → rows-only;
    # mergeability + accuracy invariants asserted in tests/test_rollup.py
    tags=("A4", "A2", "EXT"),
)
def ch_uniq_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqState`` / ``uniqMerge`` parity — the
    AggregatingMergeTree pattern for distinct counts: per-(type, day)
    HLL sketches are the stored partial states, and coarser rollups
    (here per event_type) come from UNIONING states, never from
    rescanning facts. Spark-native via the Datasketches functions
    (hll_sketch_agg → binary state, hll_union_agg → merge,
    hll_sketch_estimate → read): the exact mergeable-aggregate
    discipline x6's sum/count rollup uses, extended to the one
    aggregate that is NOT trivially mergeable. At 100 TB the daily
    sketch table is O(days·types·sketch_size) and a month's distinct
    count is a ~30-row union — fact history untouched."""
    ev = load_table(spark, sf_dir, "events")
    daily_states = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("uniq_state"))
    return (
        daily_states.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("uniq_state"))
            .cast("long")
            .alias("uniq_users_est"),
            F.count("*").alias("n_daily_states"),
        )
        .orderBy("event_type")
    )


# ---- A/B statistical aggregates (welchTTest / mannWhitneyUTest) ------

TTEST_A, TTEST_B = "click", "purchase"


@register(
    "ch_welch_ttest",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q.format(x='value')} AS vq FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(vq) AS sq,
             SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ssq
      FROM q GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(sq AS DOUBLE) / 1000000.0 / n AS mean,
             (CAST(ssq AS DOUBLE) / 1000000000000.0
              - (CAST(sq AS DOUBLE) / 1000000.0)
                * (CAST(sq AS DOUBLE) / 1000000.0) / n) / (n - 1) AS var
      FROM s
    )
    SELECT ROUND((a.mean - b.mean)
                 / SQRT(a.var / a.n + b.var / b.n), 6) AS t_stat,
           a.n AS n_a, b.n AS n_b,
           ROUND(a.mean - b.mean, 6) AS mean_diff
    FROM (SELECT * FROM m WHERE event_type = '{TTEST_A}') a
    CROSS JOIN (SELECT * FROM m WHERE event_type = '{TTEST_B}') b
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest(value, group)`` — the unequal-variance
    two-sample t statistic behind A/B readouts. Exactness discipline:
    per-group (n, Σq, Σq²) accumulate as integers (q = 1e-6-quantized
    value; Σq² in decimal(38,0) — a long would overflow at ~2e3 rows
    of 1e8-scale squares), and the final mean/variance/t chain is the
    SAME IEEE expression tree in both engines over those exact
    integers, so the rounded t is bit-reproducible. One partial→final
    aggregation, two group rows joined — O(1) output from O(rows)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(TTEST_A, TTEST_B)
    )
    q = ev.select("event_type", _quantize("value").alias("vq"))
    s = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vq").alias("sq"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).alias("ssq"),
    )
    mean = F.col("sq").cast("double") / 1_000_000.0 / F.col("n")
    var = (
        F.col("ssq").cast("double") / 1_000_000_000_000.0
        - (F.col("sq").cast("double") / 1_000_000.0)
        * (F.col("sq").cast("double") / 1_000_000.0)
        / F.col("n")
    ) / (F.col("n") - 1)
    m = s.select("event_type", "n", mean.alias("mean"), var.alias("var"))
    a = m.filter(F.col("event_type") == TTEST_A).alias("a")
    b = m.filter(F.col("event_type") == TTEST_B).alias("b")
    return a.join(b).select(
        F.round(
            (F.col("a.mean") - F.col("b.mean"))
            / F.sqrt(F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")),
            6,
        ).alias("t_stat"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mean") - F.col("b.mean"), 6).alias("mean_diff"),
    )


@register(
    "ch_mannwhitney_u",
    oracle=f"""
    WITH q AS (
      SELECT event_id, event_type, {_Q.format(x='value')} AS vq FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    r AS (
      SELECT event_type,
             -- average rank over value ties = mean of the tied ranks:
             -- dyadic (.5 steps), exact in doubles
             CAST(RANK() OVER (ORDER BY vq) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY vq) AS DOUBLE) - 1) / 2
               AS arank
      FROM q
    )
    SELECT SUM(CASE WHEN event_type = '{TTEST_A}' THEN arank END) AS rank_sum_a,
           SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) AS n_a,
           SUM(CASE WHEN event_type = '{TTEST_B}' THEN 1 ELSE 0 END) AS n_b,
           SUM(CASE WHEN event_type = '{TTEST_A}' THEN arank END)
             - SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END)
               * (SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) + 1)
               / 2.0 AS u_a
    FROM r
    """,
    tags=("A9", "W1", "EXT", "abtest"),
)
def ch_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest(value, group)`` core — the
    rank-sum U statistic (nonparametric A/B test). Ranks are midranks
    over the quantized values (RANK + (ties-1)/2 — the textbook
    average-rank formula), which are dyadic rationals, so every sum is
    exact in doubles and the hash oracle is stable. One global sort
    (RANK over vq) — the same single-sort cost ClickHouse pays; at
    100 TB use the histogram-based rank approximation instead."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(TTEST_A, TTEST_B)
    )
    from pyspark.sql import Window

    q = ev.select("event_id", "event_type", _quantize("value").alias("vq"))
    arank = (
        F.rank().over(Window.orderBy("vq")).cast("double")
        + (F.count("*").over(Window.partitionBy("vq")).cast("double") - 1) / 2
    )
    r = q.select("event_type", arank.alias("arank"))
    is_a = (F.col("event_type") == TTEST_A).cast("long")
    agg = r.agg(
        F.sum(F.when(F.col("event_type") == TTEST_A, F.col("arank"))).alias(
            "rank_sum_a"
        ),
        F.sum(is_a).alias("n_a"),
        F.sum(1 - is_a).alias("n_b"),
    )
    return agg.select(
        "rank_sum_a",
        "n_a",
        "n_b",
        (
            F.col("rank_sum_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
        ).alias("u_a"),
    )


HIST_BUCKET = 0.01  # histogram resolution for the mergeable quantile


@register(
    "a15_histogram_quantile",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(value / {HIST_BUCKET}) AS BIGINT) AS bucket,
             COUNT(*) AS c
      FROM events GROUP BY event_type, bucket
    ),
    cum AS (
      SELECT event_type, bucket, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type,
           ROUND(MIN(CASE WHEN cc * 2 >= n THEN bucket END)
                 * {HIST_BUCKET}, 6) AS p50_est,
           ROUND(MIN(CASE WHEN cc * 20 >= n * 19 THEN bucket END)
                 * {HIST_BUCKET}, 6) AS p95_est,
           MAX(n) AS n
    FROM cum GROUP BY event_type
    """,
    tags=("A9", "A4", "EXT"),
)
def a15_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile — the 100 TB scale path this
    repo's exact medians (a9/w9) and rank stats (ch_mannwhitney_u)
    point at: bucket values into a fixed-width integer histogram (one
    hash aggregation, mergeable across partitions/days exactly like
    x6's rollup states), then read any percentile from the cumulative
    counts at ±bucket-width accuracy. Unlike percentile_approx's
    sketch, the result is implementation-independent — the same
    bucketing in any engine yields the same answer, so this op
    hash-matches its oracle instead of settling for rows-only.
    Histogram size is O(value_range / width), independent of rows."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / HIST_BUCKET).cast("long").alias("bucket"),
    ).agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = b.select(
        "event_type",
        "bucket",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.round(
            F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("bucket")))
            * HIST_BUCKET,
            6,
        ).alias("p50_est"),
        F.round(
            F.min(F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("bucket")))
            * HIST_BUCKET,
            6,
        ).alias("p95_est"),
        F.max("n").alias("n"),
    )


@register(
    "ch_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT event_type AS a,
             CAST(dayofweek(ts) AS BIGINT) AS b,
             COUNT(*) AS n_ij
      FROM events GROUP BY a, b
    ),
    m AS (
      SELECT a, b, n_ij,
             SUM(n_ij) OVER (PARTITION BY a) AS n_i,
             SUM(n_ij) OVER (PARTITION BY b) AS n_j,
             SUM(n_ij) OVER () AS n
      FROM obs
    ),
    cells AS (
      SELECT n, a, b,
             (CAST(n_ij AS DOUBLE)
              - CAST(n_i AS DOUBLE) * CAST(n_j AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_ij AS DOUBLE)
                - CAST(n_i AS DOUBLE) * CAST(n_j AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n_i AS DOUBLE) * CAST(n_j AS DOUBLE) / CAST(n AS DOUBLE))
               AS addend
      FROM m
    ),
    chi AS (
      -- per-cell addends are bit-identical across engines (same IEEE
      -- chain over exact integers); quantize them before summing so
      -- the total is accumulation-order-independent too (dsum rule)
      SELECT MAX(n) AS n,
             COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c,
             CAST(SUM(CAST(TRUNC(addend * 1000000
                    + (CASE WHEN addend >= 0 THEN 0.5 ELSE -0.5 END))
                  AS BIGINT)) / 1000000.0 AS DOUBLE) AS chi2
      FROM cells
    )
    SELECT ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v,
           n, r, c
    FROM chi
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV(a, b)`` — the χ²-based association
    strength between two categorical columns (here event_type ×
    day-of-week). The contingency table is exact integers (one hash
    aggregation over O(rows), then windows over the O(r·c)-row table);
    the χ²/V chain is the same IEEE expression tree in both engines
    over those integers, so the rounded result is bit-reproducible —
    the same discipline as ch_welch_ttest. Cells-only marginals mean
    the χ² sum skips zero-count cells, which contribute exactly
    n_i·n_j/n; the SQL and Spark sides skip identically, so parity
    holds (the full-table χ² would differ — documented limitation,
    matching how both sides compute here)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    obs = ev.groupBy(
        F.col("event_type").alias("a"),
        F.dayofweek("ts").cast("long").alias("b"),
    ).agg(F.count("*").alias("n_ij"))
    m = obs.select(
        "a",
        "b",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy("a")).alias("n_i"),
        F.sum("n_ij").over(Window.partitionBy("b")).alias("n_j"),
        F.sum("n_ij").over(Window.partitionBy()).alias("n"),
    )
    e = (
        F.col("n_i").cast("double")
        * F.col("n_j").cast("double")
        / F.col("n").cast("double")
    )
    d = F.col("n_ij").cast("double") - e
    # quantize per-cell addends before the sum (dsum rule): the chi2
    # total must not depend on accumulation order
    chi = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        (F.sum(_quantize(d * d / e)) / 1_000_000.0)
        .cast("double")
        .alias("chi2"),
    )
    return chi.select(
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
        "n",
        "r",
        "c",
    )


@register(
    "ch_entropy",
    oracle="""
    WITH c AS (
      SELECT event_type, COUNT(*) AS k, SUM(COUNT(*)) OVER () AS n
      FROM events GROUP BY event_type
    )
    SELECT CAST(SUM(CAST(TRUNC(
             -(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
               * LN(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / LN(2)
               * 1000000
             + 0.5) AS BIGINT)) / 1000000.0 AS DOUBLE) AS entropy_bits,
           MAX(n) AS n
    FROM c
    """,
    tags=("A3", "EXT", "abtest"),
)
def ch_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy(event_type)`` — Shannon entropy (bits) of a
    column's value distribution, the screening statistic for skew and
    information content. Category counts are exact integers from one
    hash aggregation; each -p·log2(p) addend is a mirrored IEEE chain
    over those integers (addends always ≥ 0, so a bare +0.5 quantizes
    correctly) and quantized before the category sum, making the total
    accumulation-order independent. O(categories) state — scales as a
    plain group-count."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    c = ev.groupBy("event_type").agg(F.count("*").alias("k"))
    c = c.select(
        "k", F.sum("k").over(Window.partitionBy()).alias("n")
    )
    p = F.col("k").cast("double") / F.col("n").cast("double")
    addend = -p * F.log(p) / F.log(F.lit(2.0))
    return c.agg(
        (F.sum(_quantize(addend)) / 1_000_000.0)
        .cast("double")
        .alias("entropy_bits"),
        F.max("n").alias("n"),
    )


@register(
    "ch_sum_foreach",
    oracle="""
    WITH vals AS (
      SELECT label, i, CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                 * 1000000000) AS BIGINT) AS xq
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    sums AS (
      SELECT label, i, SUM(xq) AS s, COUNT(*) AS n
      FROM vals GROUP BY label, i
    )
    SELECT label,
           MAX(n) AS n_vecs,
           STRING_AGG(CAST(s AS VARCHAR), ',' ORDER BY i) AS sums_e9
    FROM sums GROUP BY label ORDER BY label
    """,
    tags=("A2", "EXT", "combinator", "ForEach"),
)
def ch_sum_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's ``-ForEach`` combinator (``sumForEach(arr)``):
    element-wise aggregation over an array column — per label, the
    64-dim element-wise sum of the embedding vectors (how ClickHouse
    users average vectors server-side). Values quantize to e9 longs
    BEFORE summing so the per-position totals are exact integers in
    any aggregation order; the result array CSV-joins per the repo's
    hashable-output convention. Scale shape: posexplode multiplies
    rows by the (fixed, small) dimensionality and the single shuffle
    key is (label, i) — 64× more keys than a plain label grouping,
    which at 100 TB is a FEATURE (finer partial-agg parallelism, no
    hot label key); reassembly aggregates 64 rows per label. The
    dialect raises a guided error for -ForEach pointing here (an
    aggregate returning arrays has no safe string rewrite)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i0", "x"
        ),
    ).selectExpr(
        "label",
        "i0 + 1 AS i",
        "CAST(FLOOR(x * 1000000000) AS BIGINT) AS xq",
    )
    sums = vals.groupBy("label", "i").agg(
        F.sum("xq").alias("s"), F.count("*").alias("n")
    )
    assembled = sums.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))),
                lambda e: e["s"].cast("string"),
            ),
            ",",
        ).alias("sums_e9"),
    )
    return assembled.orderBy("label")
