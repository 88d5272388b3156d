"""ClickHouse statistical-aggregate parity, continued: the classical
test statistics and weighted/decayed aggregates a ClickHouse analytics
user reaches for next after welchTTest / mannWhitneyUTest / cramersV
(reference ecosystem: ClickHouse is the source engine —
``/root/reference/mkpipe_extractor_clickhouse/__init__.py:26-43`` — so
queries written against its aggregate library must keep working here).

Determinism discipline (SURVEY §5.5, operators/_determinism.py): every
float total is a sum of per-row/per-cell addends that are (a) computed
by an identical IEEE expression tree over exact integers in both
engines and (b) quantized to 1e-6 longs *before* the sum, so the total
is accumulation-order independent; divisions/ROUNDs happen once, at the
end, over those exact totals. Rank/ECDF statistics stay in pure integer
arithmetic until a single final division.

Scale notes per operator are inline; none of these materialize more
than O(groups) or O(distinct-values) state past the first hash
aggregation, so they all ride Spark's partial→final aggregate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import _Q, _quantize

TTEST_A, TTEST_B = "click", "purchase"


@register(
    "ch_student_ttest",
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
                * (CAST(sq AS DOUBLE) / 1000000.0) / n) AS css
      FROM s
    )
    SELECT ROUND((a.mean - b.mean)
                 / SQRT(((a.css + b.css) / (a.n + b.n - 2))
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS t_stat,
           a.n AS n_a, b.n AS n_b,
           ROUND(a.mean - b.mean, 6) AS mean_diff
    FROM (SELECT * FROM m WHERE event_type = '{TTEST_A}') a
    CROSS JOIN (SELECT * FROM m WHERE event_type = '{TTEST_B}') b
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest(value, group)`` — the equal-variance
    two-sample t statistic (pooled variance). Same integer-moment
    discipline as ch_welch_ttest: per-group (n, Σq, Σq²) are exact
    integers from one partial→final aggregation, and the pooled
    mean/variance/t chain is the identical IEEE tree in both engines,
    so the rounded t is bit-reproducible. O(1) output from O(rows)."""
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
    # centered sum of squares (n·var without the 1/(n-1)); pooled below
    css = F.col("ssq").cast("double") / 1_000_000_000_000.0 - (
        F.col("sq").cast("double") / 1_000_000.0
    ) * (F.col("sq").cast("double") / 1_000_000.0) / F.col("n")
    m = s.select("event_type", "n", mean.alias("mean"), css.alias("css"))
    a = m.filter(F.col("event_type") == TTEST_A).alias("a")
    b = m.filter(F.col("event_type") == TTEST_B).alias("b")
    pooled = ((F.col("a.css") + F.col("b.css")) / (F.col("a.n") + F.col("b.n") - 2)) * (
        1.0 / F.col("a.n") + 1.0 / F.col("b.n")
    )
    return a.join(b).select(
        F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(pooled), 6).alias(
            "t_stat"
        ),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mean") - F.col("b.mean"), 6).alias("mean_diff"),
    )


@register(
    "ch_ks_test",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q.format(x='value')} AS vq FROM events
      WHERE event_type IN ('{TTEST_A}', '{TTEST_B}')
    ),
    per AS (
      SELECT vq,
             SUM(CASE WHEN event_type = '{TTEST_A}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = '{TTEST_B}' THEN 1 ELSE 0 END) AS cb
      FROM q GROUP BY vq
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY vq) AS cum_a,
             SUM(cb) OVER (ORDER BY vq) AS cum_b,
             SUM(ca) OVER () AS n_a,
             SUM(cb) OVER () AS n_b
      FROM per
    )
    SELECT MAX(ABS(cum_a * n_b - cum_b * n_a)) AS d_num,
           MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           ROUND(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
                 / (MAX(n_a) * MAX(n_b)), 6) AS d_stat
    FROM cum
    """,
    tags=("A9", "EXT", "abtest"),
)
def ch_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest(value, group)`` core — the
    two-sample KS D statistic: max ECDF gap between the A and B value
    distributions. Pure integer arithmetic end-to-end — per-distinct-
    value counts, cumulative counts, and the cross-multiplied gap
    |cumA·nB − cumB·nA| are all exact longs; the single final division
    by nA·nB is the only float op, so the rounded D is bit-identical
    across engines. One hash agg over O(rows) then one sort over
    O(distinct values) — the same single-sort cost as the rank stats;
    at 100 TB swap the exact ECDF for the a15 histogram buckets."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(TTEST_A, TTEST_B)
    )
    q = ev.select("event_type", _quantize("value").alias("vq"))
    per = q.groupBy("vq").agg(
        F.count_if(F.col("event_type") == TTEST_A).alias("ca"),
        F.count_if(F.col("event_type") == TTEST_B).alias("cb"),
    )
    w = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    gap = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return cum.agg(
        F.max(gap).alias("d_num"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(
            F.max(gap).cast("double") / (F.max("n_a") * F.max("n_b")), 6
        ).alias("d_stat"),
    )


@register(
    "ch_contingency",
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
      SELECT MAX(n) AS n,
             COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c,
             CAST(SUM(CAST(TRUNC(addend * 1000000
                    + (CASE WHEN addend >= 0 THEN 0.5 ELSE -0.5 END))
                  AS BIGINT)) / 1000000.0 AS DOUBLE) AS chi2
      FROM cells
    )
    SELECT ROUND(SQRT(chi2 / (chi2 + n)), 6) AS contingency_coeff,
           ROUND(SQRT(chi2 / (n * SQRT(CAST((r - 1) * (c - 1) AS DOUBLE)))), 6)
             AS tschuprow_t,
           n, r, c
    FROM chi
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``contingency(a, b)`` and ``tschuprowT(a, b)`` — the
    two remaining χ²-family association coefficients next to cramersV
    (C = √(χ²/(χ²+n)); T = √(χ²/(n·√((r−1)(c−1))))). Shares the exact
    integer contingency table + quantized-addend χ² discipline with
    ch_cramers_v (same zero-cell caveat, mirrored identically in both
    engines). O(r·c) state after one hash aggregation."""
    ev = load_table(spark, sf_dir, "events")
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
    chi = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
        (F.sum(_quantize(d * d / e)) / 1_000_000.0).cast("double").alias("chi2"),
    )
    return chi.select(
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 6).alias(
            "contingency_coeff"
        ),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.sqrt(((F.col("r") - 1) * (F.col("c") - 1)).cast("double"))
                )
            ),
            6,
        ).alias("tschuprow_t"),
        "n",
        "r",
        "c",
    )


@register(
    "ch_theils_u",
    oracle="""
    WITH obs AS (
      SELECT event_type AS a,
             CAST(dayofweek(ts) AS BIGINT) AS b,
             COUNT(*) AS c_ab
      FROM events GROUP BY a, b
    ),
    tot AS (SELECT SUM(c_ab) AS n FROM obs),
    ha AS (
      SELECT CAST(SUM(CAST(TRUNC(
               -(CAST(k AS DOUBLE) / n) * LN(CAST(k AS DOUBLE) / n) / LN(2)
               * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS DOUBLE) AS h
      FROM (SELECT a, SUM(c_ab) AS k FROM obs GROUP BY a), tot
    ),
    hb AS (
      SELECT CAST(SUM(CAST(TRUNC(
               -(CAST(k AS DOUBLE) / n) * LN(CAST(k AS DOUBLE) / n) / LN(2)
               * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS DOUBLE) AS h
      FROM (SELECT b, SUM(c_ab) AS k FROM obs GROUP BY b), tot
    ),
    hab AS (
      SELECT CAST(SUM(CAST(TRUNC(
               -(CAST(c_ab AS DOUBLE) / n) * LN(CAST(c_ab AS DOUBLE) / n)
               / LN(2) * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS DOUBLE) AS h
      FROM obs, tot
    )
    SELECT ROUND((ha.h + hb.h - hab.h) / ha.h, 6) AS theils_u,
           ROUND(ha.h, 6) AS h_a, ROUND(hb.h, 6) AS h_b,
           ROUND(hab.h, 6) AS h_ab
    FROM ha, hb, hab
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``theilsU(a, b)`` — the asymmetric uncertainty
    coefficient U(a|b) = (H(a) + H(b) − H(a,b)) / H(a): how much of
    event_type's entropy the day-of-week explains. All three entropies
    follow the ch_entropy discipline (exact integer counts from ONE
    hash aggregation over rows; −p·ln(p)/ln2 addends mirrored and
    quantized before each sum), so the rounded U is bit-reproducible.
    Everything after the first aggregation is O(r·c)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("a"),
        F.dayofweek("ts").cast("long").alias("b"),
    ).agg(F.count("*").alias("c_ab"))

    def entropy(df: DataFrame, k: str) -> DataFrame:
        # Σ over rows of −(k/n)·log2(k/n), quantized per addend.
        d = df.select(
            F.col(k).alias("k"),
            F.sum(k).over(Window.partitionBy()).alias("n"),
        )
        p = F.col("k").cast("double") / F.col("n").cast("double")
        addend = -p * F.log(p) / F.log(F.lit(2.0))
        return d.agg(
            (F.sum(_quantize(addend)) / 1_000_000.0).cast("double").alias("h")
        )

    ha = entropy(
        obs.groupBy("a").agg(F.sum("c_ab").alias("k")), "k"
    ).withColumnRenamed("h", "ha")
    hb = entropy(
        obs.groupBy("b").agg(F.sum("c_ab").alias("k")), "k"
    ).withColumnRenamed("h", "hb")
    hab = entropy(obs, "c_ab").withColumnRenamed("h", "hab")
    return (
        ha.join(hb)
        .join(hab)
        .select(
            F.round(
                (F.col("ha") + F.col("hb") - F.col("hab")) / F.col("ha"), 6
            ).alias("theils_u"),
            F.round("ha", 6).alias("h_a"),
            F.round("hb", 6).alias("h_b"),
            F.round("hab", 6).alias("h_ab"),
        )
    )


@register(
    "ch_avg_weighted",
    oracle=f"""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST({_Q.format(x='l_extendedprice')} AS DECIMAL(38,0))
                          * {_Q.format(x='l_quantity')}) AS DOUBLE)
                 / CAST(SUM({_Q.format(x='l_quantity')}) AS DOUBLE)
                 / 1000000.0, 6) AS avg_price_weighted,
           SUM({_Q.format(x='l_quantity')}) AS total_weight_micro,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A2", "EXT"),
)
def ch_avg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgWeighted(l_extendedprice, l_quantity)`` per
    return flag — the weighted mean. Numerator Σ(price_q·qty_q)
    accumulates in decimal(38,0) (a long would overflow: per-row
    products reach ~5e12 micro² and sum over millions of rows);
    denominator Σqty_q stays a long. One partial→final hash
    aggregation; the only float ops are the two final divisions, so
    the rounded result is order-independent and engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = _quantize("l_extendedprice")
    wq = _quantize("l_quantity")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(pq.cast("decimal(38,0)") * wq).alias("num"),
        F.sum(wq).alias("den"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double") / 1_000_000.0,
            6,
        ).alias("avg_price_weighted"),
        F.col("den").alias("total_weight_micro"),
        "n",
    )


@register(
    "ch_bounding_ratio",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             epoch_us(ts) AS x,
             {_Q.format(x='value')} AS y
      FROM events
    ),
    m AS (
      SELECT event_type, x, y,
             MIN(x) OVER (PARTITION BY event_type) AS mnx,
             MAX(x) OVER (PARTITION BY event_type) AS mxx
      FROM q
    )
    SELECT event_type,
           MIN(CASE WHEN x = mnx THEN y END) AS y_first_micro,
           MIN(CASE WHEN x = mxx THEN y END) AS y_last_micro,
           MAX(mxx) - MAX(mnx) AS span_us,
           ROUND((CAST(MIN(CASE WHEN x = mxx THEN y END) AS DOUBLE)
                  - CAST(MIN(CASE WHEN x = mnx THEN y END) AS DOUBLE))
                 / CAST(MAX(mxx) - MAX(mnx) AS DOUBLE) * 1000000.0, 9)
             AS slope_per_sec_micro
    FROM m GROUP BY event_type
    """,
    tags=("A11", "EXT"),
)
def ch_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio(ts, value)`` per event_type — the
    slope between the chronologically first and last points,
    (y_last − y_first)/(x_last − x_first). ClickHouse's argMin/argMax
    pick arbitrary rows on x ties; here ties break to the MINIMUM y on
    both ends (mirrored in both engines) so the result is total-order
    deterministic. Single pass: min/max-x via struct-ordered aggregates
    (min(struct(x,y)) is lexicographic → min x, tie min y; the max end
    negates y to keep the min-y tie-break), integer micros throughout,
    one final division. The SQL mirror states the same value via
    windows."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        # ts is TIMESTAMP_NTZ; the cast goes through the session tz,
        # which is UTC both here and in the driver's default session
        # (container tz), matching DuckDB's naive-as-UTC epoch_us.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("x"),
        _quantize("value").alias("y"),
    )
    agg = q.groupBy("event_type").agg(
        F.min(F.struct("x", "y")).alias("lo"),
        F.max(F.struct(F.col("x"), (-F.col("y")).alias("ny"))).alias("hi"),
    )
    y0 = F.col("lo.y")
    y1 = -F.col("hi.ny")
    span = F.col("hi.x") - F.col("lo.x")
    return agg.select(
        "event_type",
        y0.alias("y_first_micro"),
        y1.alias("y_last_micro"),
        span.alias("span_us"),
        F.round(
            (y1.cast("double") - y0.cast("double")) / span.cast("double") * 1_000_000.0,
            9,
        ).alias("slope_per_sec_micro"),
    )


DECAY_REF = "2000-01-01"  # after every event ts in the fixtures
DECAY_CUTOFF = 40  # 2^-40 · value·1e6 < 1 micro for any fixture value


@register(
    "ch_exp_decay_sum",
    oracle=f"""
    WITH k AS (
      SELECT event_type, value,
             LEAST(GREATEST(date_diff('day', CAST(ts AS DATE),
                                      DATE '{DECAY_REF}'), 0), 62) AS lag_days
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN lag_days < {DECAY_CUTOFF} THEN
             {_Q.format(x='value / CAST((1::BIGINT << lag_days) AS DOUBLE)')}
             ELSE 0 END) / 1000000.0 AS DOUBLE) AS decayed_sum,
           COUNT(*) AS n
    FROM k GROUP BY event_type
    """,
    tags=("A2", "F2", "EXT"),
)
def ch_exp_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum`` with a one-day
    half-life, evaluated at a fixed reference date: Σ value·2^(−lag)
    where lag = whole days to the reference. 2^(−lag) is computed as
    division by a shifted long (1<<lag) — EXACT in IEEE doubles, no
    libm pow whose last ulp could differ across engines — and each
    decayed addend is quantized before the sum (dsum rule). Lags ≥ 40
    days contribute < 1e-6 of any fixture value and are zeroed
    identically on both sides. Plain partial→final hash aggregate —
    the mergeable-decay shape ClickHouse uses for time-weighted
    rollups, O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    lag = F.least(
        F.greatest(
            F.datediff(F.lit(DECAY_REF).cast("date"), F.col("ts").cast("date")),
            F.lit(0),
        ),
        F.lit(62),
    )
    k = ev.select("event_type", "value", lag.alias("lag_days"))
    addend = F.when(
        F.col("lag_days") < DECAY_CUTOFF,
        _quantize(
            F.col("value")
            / F.expr("shiftleft(cast(1 as bigint), lag_days)").cast("double")
        ),
    ).otherwise(F.lit(0).cast("long"))
    return k.groupBy("event_type").agg(
        (F.sum(addend) / 1_000_000.0).cast("double").alias("decayed_sum"),
        F.count("*").alias("n"),
    )


@register(
    "ch_minmax_map",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type AS k,
             MIN({_Q.format(x='value')}) AS mn,
             MAX({_Q.format(x='value')}) AS mx
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           STRING_AGG(k, ',' ORDER BY k) AS map_keys,
           STRING_AGG(CAST(mn AS VARCHAR), ',' ORDER BY k) AS min_vals_micro,
           STRING_AGG(CAST(mx AS VARCHAR), ',' ORDER BY k) AS max_vals_micro
    FROM per GROUP BY user_id
    """,
    tags=("A2", "F6", "EXT"),
)
def ch_minmax_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap`` — key-wise min/max merge of
    map states, the companion to ch_summap. Identical two-level
    aggregation shape: per-(user, key) extrema collapse map-side
    before the shuffle, then a per-user reassembly into sorted
    parallel arrays (CSV-joined per the a8 hashable-output
    convention). Quantized longs — exact. State bounded by key
    cardinality, not rows."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", F.col("event_type").alias("k")).agg(
        F.min(_quantize("value")).alias("mn"),
        F.max(_quantize("value")).alias("mx"),
    )
    merged = per.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("k", "mn", "mx"))).alias("e")
    )
    return merged.select(
        "user_id",
        F.array_join(F.transform("e", lambda s: s["k"]), ",").alias("map_keys"),
        F.array_join(
            F.transform("e", lambda s: s["mn"].cast("string")), ","
        ).alias("min_vals_micro"),
        F.array_join(
            F.transform("e", lambda s: s["mx"].cast("string")), ","
        ).alias("max_vals_micro"),
    )


GAS_K = 10


@register(
    "ch_group_array_sorted",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, {_Q.format(x='value')} AS vq,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY {_Q.format(x='value')}, event_id) AS rn
      FROM events
    )
    SELECT event_type,
           STRING_AGG(CAST(vq AS VARCHAR), ',' ORDER BY rn) AS smallest_micro
    FROM ranked WHERE rn <= {GAS_K}
    GROUP BY event_type
    """,
    tags=("A8", "W8", "EXT"),
)
def ch_group_array_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArraySorted(10)(value)`` per event_type — the
    10 smallest values as a sorted array (CSV-joined). Implemented as
    bounded per-group top-k (W8 window + row_number ≤ k), NOT an
    unbounded collect_list-then-slice: per-partition state never
    exceeds k rows per group, which is the 100 TB-safe shape
    ClickHouse's own bounded heap uses. event_id breaks value ties so
    the kept set is total-order deterministic."""
    ev = load_table(spark, sf_dir, "events")
    ranked = ev.select(
        "event_type", _quantize("value").alias("vq"), "event_id"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("vq", "event_id")
        ),
    )
    return (
        ranked.filter(F.col("rn") <= GAS_K)
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "vq"))),
                    lambda s: s["vq"].cast("string"),
                ),
                ",",
            ).alias("smallest_micro")
        )
    )


QUANTS = (25, 50, 75, 95)  # percent levels, integers → exact thresholds


@register(
    "ch_quantiles_disc",
    oracle=f"""
    WITH per AS (
      SELECT event_type, {_Q.format(x='value')} AS vq, COUNT(*) AS c
      FROM events GROUP BY event_type, vq
    ),
    cum AS (
      SELECT event_type, vq,
             SUM(c) OVER (PARTITION BY event_type ORDER BY vq) AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM per
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN cc * 100 >= 25 * n THEN vq END) / 1000000.0
                AS DOUBLE) AS p25,
           CAST(MIN(CASE WHEN cc * 100 >= 50 * n THEN vq END) / 1000000.0
                AS DOUBLE) AS p50,
           CAST(MIN(CASE WHEN cc * 100 >= 75 * n THEN vq END) / 1000000.0
                AS DOUBLE) AS p75,
           CAST(MIN(CASE WHEN cc * 100 >= 95 * n THEN vq END) / 1000000.0
                AS DOUBLE) AS p95,
           MAX(n) AS n
    FROM cum GROUP BY event_type
    """,
    tags=("A9", "EXT"),
)
def ch_quantiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantilesExact(0.25,0.5,0.75,0.95)(value)`` —
    multiple exact type-1 (discrete) quantiles in one pass: the
    smallest value whose cumulative count reaches ⌈p·n⌉. The
    comparison is pure integer (cc·100 ≥ p·n, p an integer percent),
    so no float threshold can straddle engines. One hash agg over
    O(rows) collapses to distinct values; the window + final agg run
    over O(distinct) — same mergeable shape as a15, but exact."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", _quantize("value").alias("vq")).agg(
        F.count("*").alias("c")
    )
    cum = per.select(
        "event_type",
        "vq",
        F.sum("c")
        .over(
            Window.partitionBy("event_type")
            .orderBy("vq")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    exprs = [
        (
            F.min(F.when(F.col("cc") * 100 >= p * F.col("n"), F.col("vq")))
            / 1_000_000.0
        )
        .cast("double")
        .alias(f"p{p}")
        for p in QUANTS
    ]
    return cum.groupBy("event_type").agg(*exprs, F.max("n").alias("n"))


@register(
    "ch_interval_length_sum",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + {_Q.format(x='value')} AS e
      FROM events
    ),
    w AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_e
      FROM iv
    )
    SELECT user_id,
           SUM(GREATEST(e - GREATEST(s, COALESCE(prev_e, s)), 0))
             AS covered_us,
           COUNT(*) AS n_intervals
    FROM w GROUP BY user_id
    """,
    tags=("W5", "EXT"),
)
def ch_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)`` per user — total
    length of the UNION of [ts, ts + value seconds) intervals,
    overlaps counted once. Classic sweep: order intervals by start,
    track the running max end, and each row contributes only the part
    past both its own start and everything already covered. The
    contribution sum is order-independent under start ties, and all
    arithmetic is integer microseconds (value·1e6 = the quantized
    long), so the result is exact. One window per user — state is a
    single long per partition, linear scan."""
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id", s.alias("s"), (s + _quantize("value")).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wd = iv.withColumn("prev_e", F.max("e").over(w))
    contrib = F.greatest(
        F.col("e") - F.greatest(F.col("s"), F.coalesce(F.col("prev_e"), F.col("s"))),
        F.lit(0).cast("long"),
    )
    return wd.groupBy("user_id").agg(
        F.sum(contrib).alias("covered_us"), F.count("*").alias("n_intervals")
    )


@register(
    "ch_corr_matrix",
    oracle=f"""
    WITH q AS (
      SELECT {_Q.format(x='l_quantity')} AS x,
             {_Q.format(x='l_extendedprice')} AS y,
             {_Q.format(x='l_discount')} AS z
      FROM lineitem
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
             SUM(CAST(z AS DECIMAL(38,0)) * z) AS szz,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) * z) AS sxz,
             SUM(CAST(y AS DECIMAL(38,0)) * z) AS syz
      FROM q
    )
    SELECT n,
      ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        AS corr_qty_price,
      ROUND((n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
        AS corr_qty_disc,
      ROUND((n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        / SQRT((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             * (n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6)
        AS corr_price_disc
    FROM m
    """,
    tags=("A10", "EXT"),
)
def ch_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``corrMatrix(x, y, z)`` — all pairwise Pearson
    correlations of three measures in ONE pass: accumulate the 9
    cross-moments (Σx, Σx², Σxy, …) as exact integers/decimals in a
    single partial→final hash aggregate, then evaluate each corr from
    the closed form over exact totals (identical IEEE chain both
    engines, rounded once). Contrast with calling corr() three times:
    one scan instead of three, O(1) state."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        _quantize("l_quantity").alias("x"),
        _quantize("l_extendedprice").alias("y"),
        _quantize("l_discount").alias("z"),
    )
    d38 = "decimal(38,0)"
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("z").cast(d38) * F.col("z")).alias("szz"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("z")).alias("sxz"),
        F.sum(F.col("y").cast(d38) * F.col("z")).alias("syz"),
    )

    def corr(sab: str, sa: str, sb: str, saa: str, sbb: str):
        n = F.col("n")
        num = n * F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")
        den = F.sqrt(
            (n * F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(sa).cast("double"))
            * (n * F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(sb).cast("double"))
        )
        return F.round(num / den, 6)

    return m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("corr_qty_price"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("corr_qty_disc"),
        corr("syz", "sy", "sz", "syy", "szz").alias("corr_price_disc"),
    )


@register(
    "ch_exp_decay_avg",
    oracle=f"""
    WITH k AS (
      SELECT event_type, value,
             LEAST(GREATEST(date_diff('day', CAST(ts AS DATE),
                                      DATE '{DECAY_REF}'), 0), 62) AS lag_days
      FROM events
    ),
    s AS (
      SELECT event_type,
             SUM(CASE WHEN lag_days < {DECAY_CUTOFF} THEN
               {_Q.format(x='value / CAST((1::BIGINT << lag_days) AS DOUBLE)')}
               ELSE 0 END) AS dsum_micro,
             SUM(CASE WHEN lag_days < {DECAY_CUTOFF} THEN
               {_Q.format(x='1.0 / CAST((1::BIGINT << lag_days) AS DOUBLE)')}
               ELSE 0 END) AS dcount_micro
      FROM k GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CAST(dsum_micro AS DOUBLE)
                 / CAST(dcount_micro AS DOUBLE), 6) AS decayed_avg,
           dsum_micro, dcount_micro
    FROM s
    """,
    tags=("A2", "F2", "EXT"),
)
def ch_exp_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg`` — the time-weighted
    mean: decayed sum over decayed count, both accumulated with the
    ch_exp_decay_sum discipline (2^-lag as an exact shifted-long
    division, addends quantized, lags >= 40 days zeroed identically).
    The ratio of two exact micro-unit longs is a single mirrored IEEE
    division — bit-reproducible. Same one-pass mergeable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    lag = F.least(
        F.greatest(
            F.datediff(F.lit(DECAY_REF).cast("date"), F.col("ts").cast("date")),
            F.lit(0),
        ),
        F.lit(62),
    )
    k = ev.select("event_type", "value", lag.alias("lag_days"))
    pow2 = F.expr("shiftleft(cast(1 as bigint), lag_days)").cast("double")
    live = F.col("lag_days") < DECAY_CUTOFF
    zero = F.lit(0).cast("long")
    s = k.groupBy("event_type").agg(
        F.sum(
            F.when(live, _quantize(F.col("value") / pow2)).otherwise(zero)
        ).alias("dsum_micro"),
        F.sum(
            F.when(live, _quantize(F.lit(1.0) / pow2)).otherwise(zero)
        ).alias("dcount_micro"),
    )
    return s.select(
        "event_type",
        F.round(
            F.col("dsum_micro").cast("double") / F.col("dcount_micro").cast("double"),
            6,
        ).alias("decayed_avg"),
        "dsum_micro",
        "dcount_micro",
    )


# milli-resolution quantizer for the 3rd/4th-moment sums: at 1e-6 the
# 4th powers of ~2e8-scale longs would overflow decimal(38,0); at 1e-3
# the sums stay < 1e27 for any realistic group size.
_Q3 = (
    "CAST(TRUNC(({x}) * 1000"
    " + (CASE WHEN ({x}) >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT)"
)


@register(
    "ch_skew_kurt",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q3.format(x='value')} AS v FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(v) AS s1,
             SUM(CAST(v AS DECIMAL(38,0)) * v) AS s2,
             SUM(CAST(v AS DECIMAL(38,0)) * v * v) AS s3,
             SUM(CAST(v AS DECIMAL(38,0)) * v * v * v) AS s4
      FROM q GROUP BY event_type
    ),
    c AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM m
    ),
    k AS (
      SELECT event_type, n, mu,
             r2 - mu * mu AS m2,
             r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
             r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
               AS m4
      FROM c
    )
    SELECT event_type, n,
           ROUND(m3 / POW(SQRT(m2), 3), 6) AS skew_pop,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurt_excess
    FROM k
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` — population skewness and
    excess kurtosis per group, from one pass of exact integer raw
    moments (Σv, Σv², Σv³, Σv⁴ in decimal(38,0) over milli-quantized
    values — the coarser 1e-3 grid keeps 4th-power sums inside
    decimal range). The central-moment conversion and the final
    normalizations are the identical IEEE chain in both engines over
    those exact integers, so the rounded statistics are
    bit-reproducible. Spark's own skewness()/kurtosis() builtins use
    streaming float updates whose low bits differ from DuckDB's — the
    moment-sum restatement is what makes this oracle-checkable.
    POW(x, 3) on a nonneg base is exact-mirrored too (both engines
    delegate to libm pow over identical doubles; the cube could also
    be written x*x*x — kept as POW to match ClickHouse's formula).
    One partial→final hash aggregate, O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    y = F.col("value") * 1000
    v = (y + F.when(y >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")
    q = ev.select("event_type", v.alias("v"))
    d38 = "decimal(38,0)"
    m = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v").cast(d38) * F.col("v")).alias("s2"),
        F.sum(F.col("v").cast(d38) * F.col("v") * F.col("v")).alias("s3"),
        F.sum(
            F.col("v").cast(d38) * F.col("v") * F.col("v") * F.col("v")
        ).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    c = m.select("event_type", "n", mu.alias("mu"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
    mu, r2, r3, r4 = F.col("mu"), F.col("r2"), F.col("r3"), F.col("r4")
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    return c.select(
        "event_type",
        "n",
        F.round(m3 / F.pow(F.sqrt(m2), 3), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurt_excess"),
    )


@register(
    "ch_simple_linreg",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             {_Q.format(x='value')} AS y
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM q GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 1000000.0, 6) AS slope_per_day,
           ROUND((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * CAST(sx AS DOUBLE))
                 / n / 1000000.0, 6) AS intercept
    FROM m
    """,
    tags=("A10", "EXT"),
)
def ch_simple_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` — per-group
    least-squares slope and intercept of value against the day index
    (trend-per-day, the drift detector behind metric monitoring).
    Integer moments (x = whole days from a fixed epoch, y = quantized
    micros; Σx², Σxy in decimal) from ONE partial→final aggregate;
    the closed-form slope/intercept chain is the identical IEEE tree
    in both engines over those exact integers. O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
        _quantize("value").alias("y"),
    )
    d38 = "decimal(38,0)"
    m = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        "n",
        F.round(slope / 1_000_000.0, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n / 1_000_000.0, 6).alias("intercept"),
    )


@register(
    "ch_covar",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag,
             {_Q.format(x='l_quantity')} AS x,
             {_Q.format(x='l_extendedprice')} AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((CAST(sxy AS DOUBLE) / 1000000000000.0
                  - (CAST(sx AS DOUBLE) / 1000000.0)
                    * (CAST(sy AS DOUBLE) / 1000000.0) / n) / n, 6)
             AS covar_pop,
           ROUND((CAST(sxy AS DOUBLE) / 1000000000000.0
                  - (CAST(sx AS DOUBLE) / 1000000.0)
                    * (CAST(sy AS DOUBLE) / 1000000.0) / n) / (n - 1), 6)
             AS covar_samp
    FROM m
    """,
    tags=("A10", "EXT"),
)
def ch_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``covarPop`` / ``covarSamp`` per group from exact integer
    moments — same discipline as ch_corr_matrix (Spark's builtin
    covar_pop streams float updates whose low bits differ from
    DuckDB's; the moment-sum restatement is what hash-matches)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        _quantize("l_quantity").alias("x"),
        _quantize("l_extendedprice").alias("y"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    css = F.col("sxy").cast("double") / 1_000_000_000_000.0 - (
        F.col("sx").cast("double") / 1_000_000.0
    ) * (F.col("sy").cast("double") / 1_000_000.0) / n
    return m.select(
        "l_returnflag",
        "n",
        F.round(css / n, 6).alias("covar_pop"),
        F.round(css / (n - 1), 6).alias("covar_samp"),
    )


@register(
    "ch_majority",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (PARTITION BY user_id) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           MAX(CASE WHEN cnt * 2 > n THEN event_type END) AS majority_type,
           MAX(n) AS n_events
    FROM c GROUP BY user_id
    """,
    tags=("A2", "A11", "EXT"),
)
def ch_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``anyHeavy`` made exact: the strict-majority element
    per user (the value occurring in > half the rows), NULL when none
    exists. anyHeavy's Boyer-Moore sketch returns SOME frequent value
    with no guarantee — useless under a differential oracle — so this
    is the deterministic contract a user actually wants from it: at
    most one value can hold a strict majority, so the aggregation is
    well-defined without tie-break rules. Two mergeable hash
    aggregates, O(types) state."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    c = c.select(
        "user_id",
        "event_type",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("user_id")).alias("n"),
    )
    return c.groupBy("user_id").agg(
        F.max(
            F.when(F.col("cnt") * 2 > F.col("n"), F.col("event_type"))
        ).alias("majority_type"),
        F.max("n").alias("n_events"),
    )


@register(
    "ch_group_bit_ops",
    oracle="""
    SELECT event_type,
           BIT_AND(event_id) AS band,
           BIT_OR(event_id) AS bor,
           BIT_XOR(event_id) AS bxor,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("A2", "F3", "EXT"),
)
def ch_group_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd`` / ``groupBitOr`` / ``groupBitXor`` —
    bitwise-accumulating aggregates (flag-mask intersection/union and
    parity fingerprints over ID sets). Pure integer lattice operations:
    commutative, associative, exact — nothing to quantize. Spark has
    bit_and/bit_or/bit_xor builtins; one partial→final hash aggregate,
    O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").alias("band"),
        F.bit_or("event_id").alias("bor"),
        F.bit_xor("event_id").alias("bxor"),
        F.count("*").alias("n"),
    )


PZ_A, PZ_B = "click", "view"
PZ_THRESHOLD = 150.0  # "conversion" = a high-value event


@register(
    "ch_proportions_ztest",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CASE WHEN value > {PZ_THRESHOLD} THEN 1 ELSE 0 END) AS x
      FROM events WHERE event_type IN ('{PZ_A}', '{PZ_B}')
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        (SELECT x FROM s WHERE event_type = '{PZ_A}') AS xa,
        (SELECT n FROM s WHERE event_type = '{PZ_A}') AS na,
        (SELECT x FROM s WHERE event_type = '{PZ_B}') AS xb,
        (SELECT n FROM s WHERE event_type = '{PZ_B}') AS nb
    )
    SELECT xa, na, xb, nb,
           ROUND((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                 / SQRT((CAST(xa + xb AS DOUBLE) / (na + nb))
                        * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 6) AS z_stat,
           ROUND(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb, 6)
             AS rate_diff
    FROM ab
    """,
    tags=("A10", "EXT", "abtest"),
)
def ch_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``proportionsZTest`` — the two-proportion pooled
    z statistic (conversion-rate A/B readout: do click events convert
    to high-value outcomes more often than view events?). Successes
    and trials are exact integers from one conditional aggregate; the
    pooled-rate z chain is a single mirrored IEEE tree over them,
    rounded once. Completes the A/B family next to welch/student/
    mannwhitney/ks. O(1) output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(PZ_A, PZ_B)
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("value") > PZ_THRESHOLD).alias("x"),
    )
    a = s.filter(F.col("event_type") == PZ_A).select(
        F.col("x").alias("xa"), F.col("n").alias("na")
    )
    b = s.filter(F.col("event_type") == PZ_B).select(
        F.col("x").alias("xb"), F.col("n").alias("nb")
    )
    ab = a.join(b)
    pa = F.col("xa").cast("double") / F.col("na")
    pb = F.col("xb").cast("double") / F.col("nb")
    pp = (F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb"))
    return ab.select(
        "xa",
        "na",
        "xb",
        "nb",
        F.round(
            (pa - pb)
            / F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
            6,
        ).alias("z_stat"),
        F.round(pa - pb, 6).alias("rate_diff"),
    )


@register(
    "ch_mad",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q.format(x='value')} AS vq FROM events
    ),
    med AS (
      SELECT event_type, vq,
             SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY vq) AS cc,
             SUM(COUNT(*)) OVER (PARTITION BY event_type) AS n
      FROM q GROUP BY event_type, vq
    ),
    m1 AS (
      SELECT event_type, MIN(CASE WHEN cc * 2 >= n THEN vq END) AS med_q
      FROM med GROUP BY event_type
    ),
    dev AS (
      SELECT q.event_type, ABS(q.vq - m1.med_q) AS dq
      FROM q JOIN m1 ON q.event_type = m1.event_type
    ),
    dcum AS (
      SELECT event_type, dq,
             SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY dq) AS cc,
             SUM(COUNT(*)) OVER (PARTITION BY event_type) AS n
      FROM dev GROUP BY event_type, dq
    )
    SELECT d.event_type,
           CAST(MAX(m1.med_q) / 1000000.0 AS DOUBLE) AS median,
           CAST(MIN(CASE WHEN cc * 2 >= n THEN dq END) / 1000000.0 AS DOUBLE)
             AS mad,
           MAX(n) AS n
    FROM dcum d JOIN m1 ON d.event_type = m1.event_type
    GROUP BY d.event_type
    """,
    tags=("A9", "A10", "EXT"),
)
def ch_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust scale estimate behind
    outlier fences that survive the outliers themselves (dq2's 3σ
    rule breaks down when σ is inflated; MAD does not). Two exact
    type-1 median passes (the integer cum-count formulation of
    ch_quantiles_disc): the value median, then the median of
    |value − median| — every step integer micros, so the result is
    exact and engine-identical. Each pass is a distinct-value
    aggregation + window; the deviation join broadcasts the O(groups)
    median table."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select("event_type", _quantize("value").alias("vq"))

    def median_of(df: DataFrame, col: str) -> DataFrame:
        per = df.groupBy("event_type", col).agg(F.count("*").alias("c"))
        cum = per.select(
            "event_type",
            col,
            F.sum("c")
            .over(
                Window.partitionBy("event_type")
                .orderBy(col)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cc"),
            F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.min(
                F.when(F.col("cc") * 2 >= F.col("n"), F.col(col))
            ).alias(f"med_{col}"),
            F.max("n").alias("n"),
        )

    m1 = median_of(q, "vq").withColumnRenamed("med_vq", "med_q")
    dev = q.join(F.broadcast(m1.select("event_type", "med_q")), "event_type").select(
        "event_type", F.abs(F.col("vq") - F.col("med_q")).alias("dq")
    )
    m2 = median_of(dev, "dq").withColumnRenamed("med_dq", "mad_q")
    return (
        m1.select("event_type", "med_q")
        .join(m2, "event_type")
        .select(
            "event_type",
            (F.col("med_q") / 1_000_000.0).cast("double").alias("median"),
            (F.col("mad_q") / 1_000_000.0).cast("double").alias("mad"),
            "n",
        )
    )


@register(
    "ch_argmax_if",
    oracle="""
    SELECT event_type,
           MAX(CASE WHEN value > 150 THEN {'ts': ts, 'eid': event_id} END)
             .eid AS peak_event_id,
           MAX(CASE WHEN value > 150 THEN {'ts': ts, 'eid': event_id} END)
             .ts AS peak_ts,
           COUNT(CASE WHEN value > 150 THEN 1 END) AS n_qualifying
    FROM events GROUP BY event_type
    """,
    tags=("A11", "A7", "EXT"),
)
def ch_argmax_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMaxIf(event_id, ts, cond)`` — the -If
    combinator applied to argMax: per group, the id of the LATEST
    event satisfying a condition (NULL when none does). One
    conditional struct-max — rows failing the condition contribute
    NULL, which max() skips identically in both engines, and the
    (ts, event_id) struct ordering makes ties deterministic. Single
    partial→final aggregate, no join, no filter pass."""
    ev = load_table(spark, sf_dir, "events")
    qual = F.when(
        F.col("value") > 150,
        F.struct(F.col("ts"), F.col("event_id").alias("eid")),
    )
    m = F.max(qual)
    return ev.groupBy("event_type").agg(
        m["eid"].alias("peak_event_id"),
        m["ts"].alias("peak_ts"),
        F.count(F.when(F.col("value") > 150, 1)).alias("n_qualifying"),
    )


@register(
    "ch_running_concurrency",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + GREATEST({_Q.format(x='value')}, 0) AS e
      FROM events
    ),
    tl AS (
      SELECT user_id, event_id, s AS t, 1 AS k FROM iv
      UNION ALL
      SELECT user_id, NULL AS event_id, e AS t, -1 AS k FROM iv
    ),
    c AS (
      SELECT user_id, event_id, t, k,
             SUM(k) OVER (PARTITION BY user_id ORDER BY t
                          RANGE BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS conc
      FROM tl
    )
    SELECT user_id, event_id, t AS start_us,
           CAST(conc AS BIGINT) AS concurrency
    FROM c WHERE k = 1
    """,
    tags=("W7", "EXT", "timeseries"),
)
def ch_running_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``runningConcurrency(start, end)`` per user: for each
    event's half-open interval [ts, ts + value seconds·1e6 µs), how
    many of the user's intervals are active at its start — i.e.
    #{i : s_i ≤ s_j < e_i}, the current interval included. Same sweep
    family as ch_interval_length_sum, but the +1/−1 boundary timeline
    is materialized and prefix-summed with a RANGE frame, which makes
    the tie semantics DETERMINISTIC by construction instead of
    order-dependent: all boundaries at the same microsecond are frame
    peers, so equal-time starts see each other (mutually concurrent)
    and an interval ending exactly at s_j is already subtracted
    (half-open). ClickHouse itself documents events must arrive start-
    ordered — the RANGE frame removes even that requirement. One
    shuffle on user_id, linear window state (one running long); at
    100 TB the timeline is 2 rows per event and the sweep never leaves
    the user partition."""
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + F.greatest(_quantize("value"), F.lit(0).cast("long"))).alias("e"),
    )
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
    return (
        tl.withColumn("conc", F.sum("k").over(w))
        .filter(F.col("k") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("t").alias("start_us"),
            F.col("conc").cast("long").alias("concurrency"),
        )
    )
