"""ClickHouse aggregate parity, third installment: rank statistics,
timestamp-ordered delta aggregation, and a two-window distribution-
drift report (reference ecosystem: ClickHouse is the source engine —
``/root/reference/mkpipe_extractor_clickhouse/__init__.py:26-43`` — so
analytics written against ``rankCorr`` / ``deltaSumTimestamp`` must
keep working here).

Determinism discipline (SURVEY §5.5, operators/_determinism.py): rank
statistics stay in pure integer arithmetic (doubled average ranks so
midranks of even tie-groups remain integral) until one final IEEE
expression; delta sums ride quantized longs; the chi-square drift
terms are quantized per-bucket BEFORE the sum so the total is
accumulation-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import _Q, _quantize


@register(
    "ch_rank_corr",
    oracle="""
    WITH r AS (
      SELECT
        2 * RANK() OVER (ORDER BY l_quantity)
          + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS rx,
        2 * RANK() OVER (ORDER BY l_extendedprice)
          + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
      FROM lineitem
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy,
             SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
             SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS syy
      FROM r
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS spearman_rho
    FROM s
    """,
    tags=("A10", "EXT", "stats"),
)
def ch_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr(x, y)`` — Spearman's rank correlation
    with standard midrank tie handling, exactly. The midrank of a tie
    group is RANK + (ties-1)/2; doubling it (2·RANK + ties − 1) keeps
    every rank integral, so all five moments are exact integers
    (DECIMAL(38,0) for the squares — Σr² overflows int64 past ~3M
    rows) and the single final IEEE expression is bit-identical across
    engines. Doubling both rank vectors leaves Pearson-on-ranks
    invariant (correlation is scale-free). Scale (r12): the doubled
    midrank has the closed form 2·cntLess + cntEq + 1 = 2·cumcount −
    cnt + 1, so instead of ranking every ROW through an unpartitioned
    window (single-partition sort of the whole fact table, twice —
    the pre-r12 shape, 1.39 s at sf0.1), rank only the DISTINCT
    values: a distributed per-value count, a prefix sum over distinct
    values (the one remaining serial step, O(distinct) not O(rows)),
    and a broadcast join back to the rows — every row-scale stage
    stays partial→final.  The oracle keeps the per-row window SQL;
    the algebra above proves value equality and the strict hash
    compare enforces it."""
    li = load_table(spark, sf_dir, "lineitem")

    def _midranks(col: str, alias: str) -> DataFrame:
        per = li.groupBy(col).agg(F.count("*").alias("c"))
        cum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return per.select(
            col,
            (2 * F.sum("c").over(cum) - F.col("c") + 1).alias(alias),
        )

    r = (
        li.select("l_quantity", "l_extendedprice")
        .join(F.broadcast(_midranks("l_quantity", "rx")), "l_quantity")
        .join(
            F.broadcast(_midranks("l_extendedprice", "ry")),
            "l_extendedprice",
        )
        .select("rx", "ry")
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    rho = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return s.select(F.col("n"), F.round(rho, 6).alias("spearman_rho"))


@register(
    "ch_delta_sum_ts",
    oracle=f"""
    WITH q AS (
      SELECT event_type, ts, event_id,
             {_Q.format(x='value')} AS vq
      FROM events
    ),
    d AS (
      SELECT event_type,
             vq - LAG(vq) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS dq
      FROM q
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END) / 1000000.0
                AS DOUBLE) AS delta_sum
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    tags=("A2", "W3", "EXT", "timeseries"),
)
def ch_delta_sum_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSumTimestamp(value, ts)`` — the sum of
    positive value deltas taken in timestamp order per series (the
    counter-increase primitive behind rate dashboards; ch_delta_sum is
    the unordered-state variant). Order is made total with the
    event_id tiebreak so the lag is deterministic; values ride
    quantized longs so the positive-delta sum is exact. One window
    shuffle on the series key, then partial→final agg — O(rows)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        (_quantize("value") - F.lag(_quantize("value")).over(w)).alias("dq"),
    )
    return (
        d.groupBy("event_type")
        .agg(
            (
                F.sum(F.when(F.col("dq") > 0, F.col("dq")).otherwise(0))
                / 1_000_000.0
            )
            .cast("double")
            .alias("delta_sum")
        )
        .orderBy("event_type")
    )


DRIFT_SPLIT = "2024-01-16 00:00:00"
DRIFT_BUCKET_WIDTH = 50.0


@register(
    "dq3_histogram_drift",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(value / {DRIFT_BUCKET_WIDTH}) AS INT) AS bucket,
             CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END AS half
      FROM events
    ),
    c AS (
      SELECT event_type, bucket,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
      FROM b GROUP BY event_type, bucket
    ),
    t AS (
      SELECT event_type, bucket, ca, cb,
             SUM(ca) OVER (PARTITION BY event_type) AS na,
             SUM(cb) OVER (PARTITION BY event_type) AS nb
      FROM c
    ),
    term AS (
      SELECT event_type,
             ABS(ca * 1000000 // na - cb * 1000000 // nb) AS tvd_term_ppm,
             {_Q.format(
                 x="(ca - CAST(ca + cb AS DOUBLE) * na / (na + nb))"
                   " * (ca - CAST(ca + cb AS DOUBLE) * na / (na + nb))"
                   " / (CAST(ca + cb AS DOUBLE) * na / (na + nb))"
                   " + (cb - CAST(ca + cb AS DOUBLE) * nb / (na + nb))"
                   " * (cb - CAST(ca + cb AS DOUBLE) * nb / (na + nb))"
                   " / (CAST(ca + cb AS DOUBLE) * nb / (na + nb))"
             )} AS chi_q
      FROM t
    )
    SELECT event_type,
           SUM(tvd_term_ppm) // 2 AS tvd_ppm,
           ROUND(SUM(chi_q) / 1000000.0, 6) AS chi2
    FROM term GROUP BY event_type ORDER BY event_type
    """,
    tags=("A7", "A10", "EXT", "quality"),
)
def dq3_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two time windows — the
    data-quality check a pipeline runs before trusting a new
    extraction tick: per series, the value histogram of the first half
    of the month vs the second, scored by total-variation distance
    (pure integer ppm) and the two-sample chi-square homogeneity
    statistic. Each chi² bucket term is an identical IEEE tree over
    exact integer counts, quantized to 1e-6 longs BEFORE the sum
    (operators/_determinism.py), so both scores are bit-stable across
    engines and partitionings. Counts come from one partial→final agg
    over (series, bucket, half); everything downstream is O(series ×
    buckets). The drift gate composes with dq5's freshness report."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.floor(F.col("value") / DRIFT_BUCKET_WIDTH).cast("int").alias("bucket"),
        F.when(
            F.col("ts") < F.lit(DRIFT_SPLIT).cast("timestamp_ntz"), 0
        )
        .otherwise(1)
        .alias("half"),
    )
    c = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
    )
    w = Window.partitionBy("event_type")
    t = c.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("na"),
        F.sum("cb").over(w).alias("nb"),
    )
    ntot = (F.col("na") + F.col("nb")).cast("double")
    ea = (F.col("ca") + F.col("cb")).cast("double") * F.col("na") / ntot
    eb = (F.col("ca") + F.col("cb")).cast("double") * F.col("nb") / ntot
    chi_term = (F.col("ca") - ea) * (F.col("ca") - ea) / ea + (
        F.col("cb") - eb
    ) * (F.col("cb") - eb) / eb
    term = t.select(
        "event_type",
        F.abs(
            F.expr("ca * 1000000 DIV na") - F.expr("cb * 1000000 DIV nb")
        ).alias("tvd_term_ppm"),
        _quantize(chi_term).alias("chi_q"),
    )
    return (
        term.groupBy("event_type")
        .agg(
            F.expr("SUM(tvd_term_ppm) DIV 2").alias("tvd_ppm"),
            F.round(F.sum("chi_q") / 1_000_000.0, 6).alias("chi2"),
        )
        .orderBy("event_type")
    )


@register(
    "ts3_counter_rate",
    oracle=f"""
    WITH q AS (
      SELECT event_type, ts, event_id,
             {_Q.format(x='value')} AS vq
      FROM events
    ),
    d AS (
      SELECT event_type, ts,
             vq - LAG(vq) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS dq
      FROM q
    )
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END) / 1000000.0
                AS DOUBLE) AS increase,
           ROUND(CAST(SUM(CASE WHEN dq > 0 THEN dq ELSE 0 END) AS DOUBLE)
                 / 1000000.0 / 3600.0, 6) AS per_sec_rate
    FROM d GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("W3", "A2", "EXT", "timeseries"),
)
def ts3_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style ``increase()``/``rate()`` per series per hour: the
    positive-delta mass of each series attributed to the hour of the
    LATER sample (so a delta spanning an hour boundary lands exactly
    once — Prometheus's attribution rule), divided by the window
    length for the per-second rate. The monitoring idiom behind every
    counter dashboard; ch_delta_sum_ts is its unbucketed total. Same
    determinism story: quantized-long deltas, one final IEEE division
    chain. One window shuffle on the series key, then partial→final
    agg on (series, hour)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        "ts",
        (_quantize("value") - F.lag(_quantize("value")).over(w)).alias("dq"),
    )
    pos = F.sum(F.when(F.col("dq") > 0, F.col("dq")).otherwise(0))
    return (
        d.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            (pos / 1_000_000.0).cast("double").alias("increase"),
            F.round(
                pos.cast("double") / 1_000_000.0 / 3600.0, 6
            ).alias("per_sec_rate"),
        )
        .orderBy("event_type", "hour")
    )


# microdegree grid: coordinates quantized to 1e-6 deg integers, offset
# to nonnegative so floor/trunc division agree across engines
_GEO_LON_U = (
    "CAST(ROUND((((value) - 180.0 * FLOOR((value) / 180.0) - 90.0) * 2.0)"
    " * 1000000) AS BIGINT) + 180000000"
)
_GEO_LAT_U = (
    "CAST(ROUND(((((value) * 7.0 - 180.0 * FLOOR((value) * 7.0 / 180.0)))"
    " - 90.0) * 1000000) AS BIGINT) + 90000000"
)
GEO_EPS_U = 2_000_000  # ε = 2° in microdegrees; cell edge = ε


@register(
    "j18_geo_bucket_join",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             {_GEO_LON_U} AS lon_u,
             {_GEO_LAT_U} AS lat_u
      FROM events
    ),
    a AS (SELECT * FROM pts WHERE event_id <= 1000),
    b AS (SELECT * FROM pts WHERE event_id > 1000 AND event_id <= 2000)
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
           + (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u) AS dist2_u
    FROM a JOIN b
      ON (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
         + (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
         <= CAST({GEO_EPS_U} AS BIGINT) * {GEO_EPS_U}
    ORDER BY id_a, id_b
    """,
    tags=("J9", "EXT", "geo"),
)
def j18_geo_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-distance spatial join via grid bucketing — the scale shape
    for 'find all point pairs within ε': snap each point to an
    ε-sized cell, replicate the probe side onto its 3×3 neighbor
    cells, EQUI-join on the cell id, then keep pairs passing the exact
    distance test. Any qualifying pair differs by < ε per axis, so it
    lands in one of the neighbor cells — the equi-join is lossless,
    and the plan is a hash join keyed on cells (never a cross join,
    the posture the naive theta-join oracle cannot scale past).
    Geometry is EXACT integers end-to-end: microdegree coordinates
    (offset nonnegative so floor/trunc division agree), integer
    squared distances, integer ε² threshold. At planetary scale the
    same plan runs with geohash-prefix cells (f16) and AQE handling
    the coastal-city cell skew."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.expr(_GEO_LON_U).alias("lon_u"),
        F.expr(_GEO_LAT_U).alias("lat_u"),
    )
    cell = lambda c: (F.col(c) / GEO_EPS_U).cast("bigint")  # noqa: E731
    a = (
        pts.filter(F.col("event_id") <= 1000)
        .withColumn("cx0", cell("lon_u"))
        .withColumn("cy0", cell("lat_u"))
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col("event_id").alias("id_a"),
            F.col("lon_u").alias("lon_a"),
            F.col("lat_u").alias("lat_a"),
            (F.col("cx0") + F.col("dx")).alias("cx"),
            (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    b = (
        pts.filter((F.col("event_id") > 1000) & (F.col("event_id") <= 2000))
        .select(
            F.col("event_id").alias("id_b"),
            F.col("lon_u").alias("lon_b"),
            F.col("lat_u").alias("lat_b"),
            cell("lon_u").alias("cx"),
            cell("lat_u").alias("cy"),
        )
    )
    d2 = (F.col("lon_a") - F.col("lon_b")) * (
        F.col("lon_a") - F.col("lon_b")
    ) + (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(d2 <= F.lit(GEO_EPS_U * GEO_EPS_U))
        .select("id_a", "id_b", d2.alias("dist2_u"))
        .orderBy("id_a", "id_b")
    )


KENDALL_PRICE_BUCKET = 5000.0


@register(
    "ch_kendall_tau",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(l_quantity AS INT) AS x,
             CAST(FLOOR(l_extendedprice / {KENDALL_PRICE_BUCKET}) AS INT) AS y,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    conc AS (
      SELECT
        SUM(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END) AS cc,
        SUM(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END) AS dd
      FROM cells a JOIN cells b ON b.x > a.x
    ),
    ties AS (
      SELECT SUM(c) AS n,
             SUM(c * (c - 1) / 2) AS tie_pairs,
             (SELECT SUM(sx * (sx - 1) / 2) FROM (
                SELECT SUM(c) AS sx FROM cells GROUP BY x)) AS n1,
             (SELECT SUM(sy * (sy - 1) / 2) FROM (
                SELECT SUM(c) AS sy FROM cells GROUP BY y)) AS n2
      FROM cells
    )
    SELECT t.n,
           ROUND((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
                 / SQRT((CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - t.n1)
                        * (CAST(t.n AS DOUBLE) * (t.n - 1) / 2 - t.n2)),
                 6) AS kendall_tau_b
    FROM conc, ties t
    """,
    tags=("A10", "EXT", "stats"),
)
def ch_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation, EXACT, over discretized axes —
    ClickHouse's kendallTau surface for grouped/bucketed data. The
    O(n²) pair count collapses onto the contingency table: concordant
    mass C = Σ n_ij·n_kl over cell pairs with k>i, l>j (ditto
    discordant), and the tie corrections n1/n2 come from the
    marginals — so the fact table is touched ONCE (one partial→final
    agg to cells) and the pair arithmetic runs over O(cells²) ≈ 10⁶
    tiny rows regardless of corpus size. All masses are exact int64
    (C ≤ n²/2 — fine to ~4G rows); one final IEEE tree, rounded.
    The cells self-join is a broadcast theta join over the cell
    relation — never touches row-level data."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("int").alias("x"),
        F.floor(F.col("l_extendedprice") / KENDALL_PRICE_BUCKET)
        .cast("int")
        .alias("y"),
    ).agg(F.count("*").alias("c"))
    a = cells.alias("a")
    b = cells.alias("b")
    conc = a.join(F.broadcast(b), F.col("b.x") > F.col("a.x")).agg(
        F.sum(
            F.when(
                F.col("b.y") > F.col("a.y"), F.col("a.c") * F.col("b.c")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("cc"),
        F.sum(
            F.when(
                F.col("b.y") < F.col("a.y"), F.col("a.c") * F.col("b.c")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("dd"),
    )
    n_total = cells.agg(F.sum("c").alias("n"))
    n1 = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("sx"))
        .agg(F.sum(F.expr("sx * (sx - 1) / 2")).alias("n1"))
    )
    n2 = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("sy"))
        .agg(F.sum(F.expr("sy * (sy - 1) / 2")).alias("n2"))
    )
    j = conc.join(n_total).join(n1).join(n2)
    half_pairs = F.col("n").cast("double") * (F.col("n") - 1) / 2
    tau = (F.col("cc").cast("double") - F.col("dd").cast("double")) / F.sqrt(
        (half_pairs - F.col("n1")) * (half_pairs - F.col("n2"))
    )
    return j.select(F.col("n"), F.round(tau, 6).alias("kendall_tau_b"))


@register(
    "dq4_key_uniqueness",
    oracle="""
    SELECT * FROM (
      SELECT 'orders' AS tbl, COUNT(*) AS rows_total,
             COUNT(DISTINCT o_orderkey) AS distinct_keys,
             (COUNT(*) - COUNT(DISTINCT o_orderkey)) * 1000000
               // COUNT(*) AS dup_ppm
      FROM orders
      UNION ALL
      SELECT 'lineitem', COUNT(*),
             COUNT(DISTINCT l_orderkey * 16 + l_linenumber),
             (COUNT(*) - COUNT(DISTINCT l_orderkey * 16 + l_linenumber))
               * 1000000 // COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey),
             (COUNT(*) - COUNT(DISTINCT c_custkey)) * 1000000 // COUNT(*)
      FROM customer
      UNION ALL
      SELECT 'events', COUNT(*), COUNT(DISTINCT event_id),
             (COUNT(*) - COUNT(DISTINCT event_id)) * 1000000 // COUNT(*)
      FROM events
    ) ORDER BY tbl
    """,
    tags=("A3", "EXT", "dq"),
)
def dq4_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the catalog — rows vs
    distinct keys and the duplicate rate in floor-ppm, per table (the
    composite lineitem key packs into one integer: linenumber < 16).
    This is the first check an ingest tick runs before trusting a
    source export, and the one that catches the double-delivery bugs
    idempotent-append dedup (S8) exists to absorb. Each branch is one
    partial→final count-distinct aggregation; the union is of 4
    single-row results. Pure integer output."""
    def one(tbl: str, key_expr: str):
        t = load_table(spark, sf_dir, tbl)
        return t.agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").alias("rows_total"),
            F.expr(f"COUNT(DISTINCT {key_expr})").alias("distinct_keys"),
            F.expr(
                f"(COUNT(*) - COUNT(DISTINCT {key_expr})) * 1000000"
                " DIV COUNT(*)"
            ).alias("dup_ppm"),
        )

    return (
        one("orders", "o_orderkey")
        .unionAll(one("lineitem", "l_orderkey * 16 + l_linenumber"))
        .unionAll(one("customer", "c_custkey"))
        .unionAll(one("events", "event_id"))
        .orderBy("tbl")
    )


BOLLINGER_WINDOW = 7  # trailing days
BOLLINGER_K = 2  # band half-width in sigmas


@register(
    "ts4_bollinger_bands",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, day,
             CAST(revq AS DOUBLE) / 1000000.0 AS revenue,
             SUM(revq) OVER w AS s,
             SUM(CAST(revq AS DECIMAL(38,0)) * revq) OVER w AS ssq,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {BOLLINGER_WINDOW - 1} PRECEDING
                        AND CURRENT ROW)
    )
    SELECT event_type, day, revenue,
           ROUND(CAST(s AS DOUBLE) / 1000000.0 / n, 6) AS sma,
           ROUND(CAST(s AS DOUBLE) / 1000000.0 / n
                 + {BOLLINGER_K} * SQRT(GREATEST(
                     CAST(ssq AS DOUBLE) / 1000000000000.0 / n
                     - (CAST(s AS DOUBLE) / 1000000.0 / n)
                       * (CAST(s AS DOUBLE) / 1000000.0 / n), 0.0)), 6)
             AS upper_band,
           ROUND(CAST(s AS DOUBLE) / 1000000.0 / n
                 - {BOLLINGER_K} * SQRT(GREATEST(
                     CAST(ssq AS DOUBLE) / 1000000000000.0 / n
                     - (CAST(s AS DOUBLE) / 1000000.0 / n)
                       * (CAST(s AS DOUBLE) / 1000000.0 / n), 0.0)), 6)
             AS lower_band
    FROM win ORDER BY event_type, day
    """,
    tags=("W6", "A10", "EXT", "timeseries"),
)
def ts4_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per series: trailing 7-day simple moving average
    with ±2σ volatility bands — the monitoring overlay for 'is today
    anomalous relative to its own recent regime' (the windowed sibling
    of dq2's global z-score gate). Exact windowed moments: daily
    revenue quantized to longs, Σx as long and Σx² as DECIMAL(38,0)
    (squares of ~1e10 q-units overflow int64) accumulated INSIDE the
    frame, with one final IEEE mean/variance/sqrt tree per row rounded
    at 6 — bit-stable across engines and partitionings. One shuffle on
    the series key; the frame is ROWS-based so state is O(window)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(BOLLINGER_WINDOW - 1), 0)
    )
    win = daily.select(
        "event_type",
        "day",
        (F.col("revq").cast("double") / 1_000_000.0).alias("revenue"),
        F.sum("revq").over(w).alias("s"),
        F.sum(F.col("revq").cast("decimal(38,0)") * F.col("revq"))
        .over(w)
        .alias("ssq"),
        F.count("*").over(w).alias("n"),
    )
    mean = F.col("s").cast("double") / 1_000_000.0 / F.col("n")
    ex2 = F.col("ssq").cast("double") / 1_000_000_000_000.0 / F.col("n")
    sigma = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
    return win.select(
        "event_type",
        "day",
        "revenue",
        F.round(mean, 6).alias("sma"),
        F.round(mean + BOLLINGER_K * sigma, 6).alias("upper_band"),
        F.round(mean - BOLLINGER_K * sigma, 6).alias("lower_band"),
    ).orderBy("event_type", "day")


@register(
    "ts5_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, day, revq,
             SUM(revq) OVER w AS s, COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    full7 AS (
      SELECT event_type, day, revq, s,
             7 * revq - s AS det7q,
             CAST(dayofweek(day) AS BIGINT) + 1 AS dow
      FROM win WHERE n = 7
    ),
    seas AS (
      SELECT event_type, dow,
             SUM(det7q) // COUNT(*) AS s7q
      FROM full7 GROUP BY 1, 2
    )
    SELECT f.event_type, f.day,
           CAST(f.revq / 1000000.0 AS DOUBLE) AS revenue,
           ROUND(CAST(f.s AS DOUBLE) / 7.0 / 1000000.0, 6) AS trend,
           ROUND(CAST(se.s7q AS DOUBLE) / 7.0 / 1000000.0, 6) AS seasonal,
           ROUND(CAST(f.det7q - se.s7q AS DOUBLE) / 7.0 / 1000000.0, 6)
             AS residual
    FROM full7 f JOIN seas se
      ON f.event_type = se.event_type AND f.dow = se.dow
    ORDER BY f.event_type, f.day
    """,
    tags=("W6", "A2", "EXT", "timeseries"),
)
def ts5_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition (trend + weekly seasonal +
    residual, the moving-average construction behind STL's first
    pass): trend is the CENTERED 7-day MA, the seasonal index is the
    per-weekday mean of the detrended series, and the residual is what
    remains. EXACT throughout: with full frames 7·x − Σ is an integer
    detrended value, the weekday mean floors to an integer (DIV), and
    each output is ONE division of exact integers rounded at 6 — no
    accumulated float drift anywhere. Edge days (incomplete frames)
    are excluded, as in the textbook construction. One series shuffle
    shared by the window; the seasonal join is O(series × 7) and
    broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "event_type",
        "day",
        "revq",
        F.sum("revq").over(w).alias("s"),
        F.count("*").over(w).alias("n"),
    )
    full7 = win.filter(F.col("n") == 7).select(
        "event_type",
        "day",
        "revq",
        "s",
        (7 * F.col("revq") - F.col("s")).alias("det7q"),
        F.dayofweek("day").cast("bigint").alias("dow"),
    )
    seas = full7.groupBy("event_type", "dow").agg(
        F.expr("SUM(det7q) DIV COUNT(*)").alias("s7q")
    )
    j = full7.join(F.broadcast(seas), ["event_type", "dow"])
    return j.select(
        "event_type",
        "day",
        (F.col("revq") / 1_000_000.0).cast("double").alias("revenue"),
        F.round(F.col("s").cast("double") / 7.0 / 1_000_000.0, 6).alias(
            "trend"
        ),
        F.round(
            F.col("s7q").cast("double") / 7.0 / 1_000_000.0, 6
        ).alias("seasonal"),
        F.round(
            (F.col("det7q") - F.col("s7q")).cast("double")
            / 7.0
            / 1_000_000.0,
            6,
        ).alias("residual"),
    ).orderBy("event_type", "day")


CUSUM_K_PPM = 250_000  # slack: 0.25 of the series' daily mean
CUSUM_H_MULT = 3  # alarm threshold: 3 × daily mean


@register(
    "ts6_cusum_alarms",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, day, revq,
             SUM(revq) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM daily
    ),
    dev AS (
      -- deviation above mean+slack, scaled by nd to stay integral:
      -- nd·x − Σ − k·Σ/1e6 (k in ppm of the mean ⇒ k·tot/1e6 integral floor)
      SELECT event_type, day,
             nd * revq - tot - (tot * {CUSUM_K_PPM}) // 1000000 AS dq,
             tot, nd
      FROM base
    ),
    pref0 AS (
      SELECT event_type, day, tot, nd,
             SUM(dq) OVER (PARTITION BY event_type ORDER BY day) AS p
      FROM dev
    ),
    pref AS (
      SELECT event_type, day, tot, nd, p,
             MIN(p) OVER (PARTITION BY event_type ORDER BY day) AS minp
      FROM pref0
    )
    SELECT event_type, day,
           (p - LEAST(minp, 0)) AS cusum_ndq,
           CASE WHEN p - LEAST(minp, 0) > {CUSUM_H_MULT} * tot
                THEN 1 ELSE 0 END AS alarm
    FROM pref ORDER BY event_type, day
    """,
    tags=("W5", "EXT", "timeseries", "quality"),
)
def ts6_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) per series —
    sustained-upward-shift alarms that a point z-score (dq2) and
    volatility bands (ts4) both miss. The textbook recursion
    S_t = max(0, S_{t−1} + x_t − μ − k) looks inherently sequential,
    but has the closed form S_t = P_t − min(0, min_{j≤t} P_j) with
    P the plain running sum of deviations — so it is two stacked
    window passes (running sum, running min), no recursion, no UDF.
    All integer: deviations scale by the day count (nd·x − Σ) to
    avoid the mean's division, and the slack/threshold are ppm
    multiples of the series total. Alarm when the statistic exceeds
    3× the series' daily-mean mass. One series-key shuffle end to
    end."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    per = Window.partitionBy("event_type")
    base = daily.select(
        "event_type",
        "day",
        "revq",
        F.sum("revq").over(per).alias("tot"),
        F.count("*").over(per).alias("nd"),
    )
    dev = base.select(
        "event_type",
        "day",
        "tot",
        "nd",
        (
            F.col("nd") * F.col("revq")
            - F.col("tot")
            - F.expr(f"(tot * {CUSUM_K_PPM}) DIV 1000000")
        ).alias("dq"),
    )
    ordered = Window.partitionBy("event_type").orderBy("day")
    pref = dev.select(
        "event_type",
        "day",
        "tot",
        F.sum("dq").over(ordered).alias("p"),
    ).withColumn("minp", F.min("p").over(ordered))
    cusum = F.col("p") - F.least(F.col("minp"), F.lit(0))
    return pref.select(
        "event_type",
        "day",
        cusum.alias("cusum_ndq"),
        F.when(cusum > CUSUM_H_MULT * F.col("tot"), 1)
        .otherwise(0)
        .alias("alarm"),
    ).orderBy("event_type", "day")


@register(
    "ch_anova",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q.format(x='value')} AS vq FROM events
    ),
    g AS (
      SELECT event_type, COUNT(*) AS n, SUM(vq) AS s,
             SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS ssq
      FROM q GROUP BY event_type
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(s) AS st, COUNT(*) AS k,
             -- between-group sum of squares term Σ sᵢ²/nᵢ (exact per
             -- group: one division each, quantized before the sum)
             SUM({_Q.format(
                 x="(CAST(s AS DOUBLE) / 1000000.0)"
                   " * (CAST(s AS DOUBLE) / 1000000.0) / n"
             )}) AS bq,
             SUM(ssq) AS ssqt
      FROM g
    )
    SELECT k, nt,
           ROUND(((CAST(bq AS DOUBLE) / 1000000.0
                   - (CAST(st AS DOUBLE) / 1000000.0)
                     * (CAST(st AS DOUBLE) / 1000000.0) / nt) / (k - 1))
                 / ((CAST(ssqt AS DOUBLE) / 1000000000000.0
                     - CAST(bq AS DOUBLE) / 1000000.0) / (nt - k)),
                 6) AS f_stat
    FROM tot
    """,
    tags=("A10", "EXT", "abtest", "stats"),
)
def ch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic across event-type groups — the k-group
    generalization of studentTTest ('do ANY of these segments differ
    in mean'), ClickHouse's ``analysisOfVariance``. Integer-moment
    discipline: per-group (n, Σq, Σq²) are exact from one
    partial→final agg; each group's s²/n term is ONE IEEE tree
    quantized before the cross-group sum (the dsum rule — k addends,
    order-independent); the final F assembles between/within mean
    squares in one expression, rounded. O(groups) state."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select("event_type", _quantize("value").alias("vq"))
    g = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vq").alias("s"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).alias("ssq"),
    )
    s_d = F.col("s").cast("double") / 1_000_000.0
    term = s_d * s_d / F.col("n")
    tot = g.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count("*").alias("k"),
        F.sum(_quantize(term)).alias("bq"),
        F.sum("ssq").alias("ssqt"),
    )
    b = F.col("bq").cast("double") / 1_000_000.0
    st_d = F.col("st").cast("double") / 1_000_000.0
    between = (b - st_d * st_d / F.col("nt")) / (F.col("k") - 1)
    within = (
        F.col("ssqt").cast("double") / 1_000_000_000_000.0 - b
    ) / (F.col("nt") - F.col("k"))
    return tot.select(
        F.col("k"), F.col("nt"), F.round(between / within, 6).alias("f_stat")
    )


@register(
    "a26_histogram_median",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_Q.format(x='value')} AS vq FROM events
    ),
    h AS (
      SELECT event_type, vq, COUNT(*) AS c FROM q GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, vq, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum_c,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    mids AS (
      SELECT event_type,
             MIN(CASE WHEN cum_c >= (n + 1) // 2 THEN vq END) AS lo,
             MIN(CASE WHEN cum_c >= n // 2 + 1 THEN vq END) AS hi,
             MIN(n) AS n
      FROM cum GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((CAST(lo AS DOUBLE) + hi) / 2.0 / 1000000.0, 6) AS median
    FROM mids ORDER BY event_type
    """,
    tags=("A9", "A2", "EXT"),
)
def a26_histogram_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median per group WITHOUT sorting the rows — the
    value-histogram construction that scales where sort-based
    percentile cannot: quantized values hash-aggregate to (value,
    count) [state = distinct values, not rows], a cumulative count
    over the (small) histogram locates the two middle order
    statistics, and their midpoint is the even-n median. At 100 TB
    the fact table is touched by ONE partial→final agg; only the
    histogram — thousands of rows — enters the window. Matches
    DuckDB's MEDIAN (lower/upper midpoint interpolation) exactly
    because everything up to the final halving is integer."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select("event_type", _quantize("value").alias("vq")).groupBy(
        "event_type", "vq"
    ).agg(F.count("*").alias("c"))
    cum = h.select(
        "event_type",
        "vq",
        F.sum("c")
        .over(Window.partitionBy("event_type").orderBy("vq"))
        .alias("cum_c"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    mids = cum.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("cum_c") >= F.expr("(n + 1) DIV 2"), F.col("vq")
            )
        ).alias("lo"),
        F.min(
            F.when(F.col("cum_c") >= F.expr("n DIV 2 + 1"), F.col("vq"))
        ).alias("hi"),
        F.min("n").alias("n"),
    )
    return mids.select(
        "event_type",
        "n",
        F.round(
            (F.col("lo").cast("double") + F.col("hi")) / 2.0 / 1_000_000.0, 6
        ).alias("median"),
    ).orderBy("event_type")


ACF_MAX_LAG = 3


@register(
    "ts7_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, day, revq,
             SUM(revq) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM daily
    ),
    dev AS (
      -- integer detrending: nd·x − Σ (the ts5/ts6 trick — no mean
      -- division until the final ratio)
      SELECT event_type, day, nd * revq - tot AS d
      FROM base
    ),
    lagged AS (
      SELECT event_type, d,
             LAG(d, 1) OVER w AS d1,
             LAG(d, 2) OVER w AS d2,
             LAG(d, 3) OVER w AS d3
      FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    moments AS (
      SELECT event_type,
             SUM(CAST(d AS DECIMAL(38,0)) * d) AS s0,
             SUM(CASE WHEN d1 IS NOT NULL
                      THEN CAST(d AS DECIMAL(38,0)) * d1 END) AS s1,
             SUM(CASE WHEN d2 IS NOT NULL
                      THEN CAST(d AS DECIMAL(38,0)) * d2 END) AS s2,
             SUM(CASE WHEN d3 IS NOT NULL
                      THEN CAST(d AS DECIMAL(38,0)) * d3 END) AS s3
      FROM lagged GROUP BY event_type
    )
    SELECT event_type,
           ROUND(CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS acf_1,
           ROUND(CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS acf_2,
           ROUND(CAST(s3 AS DOUBLE) / CAST(s0 AS DOUBLE), 6) AS acf_3
    FROM moments ORDER BY event_type
    """,
    tags=("W3", "A10", "EXT", "timeseries"),
)
def ts7_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1–3 per daily series — the
    diagnostic that says whether yesterday predicts today (and whether
    ts5's weekly seasonal is real before fitting it). EXACT to the
    rounding: deviations use the nd·x − Σ integer detrending (shared
    with ts5/ts6), lagged cross-products accumulate in DECIMAL(38,0)
    (deviation products overflow int64), and each ACF value is one
    final division of exact decimals. One series shuffle: the window
    lags and the moment aggregation ride the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    per = Window.partitionBy("event_type")
    dev = daily.select(
        "event_type",
        "day",
        (
            F.count("*").over(per) * F.col("revq")
            - F.sum("revq").over(per)
        ).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = dev.select(
        "event_type",
        "d",
        *[F.lag("d", k).over(w).alias(f"d{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    moments = lagged.groupBy("event_type").agg(
        F.sum(dec("d") * F.col("d")).alias("s0"),
        *[
            F.sum(
                F.when(
                    F.col(f"d{k}").isNotNull(), dec("d") * F.col(f"d{k}")
                )
            ).alias(f"s{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    return moments.select(
        "event_type",
        *[
            F.round(
                F.col(f"s{k}").cast("double") / F.col("s0").cast("double"), 6
            ).alias(f"acf_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    ).orderBy("event_type")


@register(
    "dq6_functional_dependency",
    oracle="""
    SELECT * FROM (
      SELECT 'orders: o_orderkey -> o_custkey' AS dependency,
             COUNT(*) AS determinant_values,
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS violations
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS n_dep
            FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'lineitem: l_orderkey -> o_custkey (via join)',
             COUNT(*),
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
      FROM (SELECT l.l_orderkey, COUNT(DISTINCT o.o_custkey) AS n_dep
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY l.l_orderkey)
      UNION ALL
      SELECT 'nation: n_nationkey -> n_regionkey',
             COUNT(*),
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
      FROM (SELECT n_nationkey, COUNT(DISTINCT n_regionkey) AS n_dep
            FROM nation GROUP BY n_nationkey)
      UNION ALL
      SELECT 'events: user_id -> event_type (expected to FAIL)',
             COUNT(*),
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
      FROM (SELECT user_id, COUNT(DISTINCT event_type) AS n_dep
            FROM events GROUP BY user_id)
    ) ORDER BY dependency
    """,
    tags=("A3", "EXT", "dq"),
)
def dq6_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — does A determine B in the data
    (the schema assumption every join and dedup silently relies on)?
    For each declared dependency: distinct determinant values and how
    many map to MORE than one dependent value (violations). Includes a
    deliberately-false dependency as the negative control, so a report
    of all-zeros is provably not vacuous. Each check is one
    count-distinct aggregation (partial→final), unioned — the dqX
    family's relational-integrity layer alongside dq1's constraints
    and dq4's key uniqueness."""
    def check(label: str, grouped: DataFrame) -> DataFrame:
        return grouped.agg(
            F.lit(label).alias("dependency"),
            F.count("*").alias("determinant_values"),
            F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)).alias(
                "violations"
            ),
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    ev = load_table(spark, sf_dir, "events")
    c1 = check(
        "orders: o_orderkey -> o_custkey",
        o.groupBy("o_orderkey").agg(
            F.countDistinct("o_custkey").alias("n_dep")
        ),
    )
    c2 = check(
        "lineitem: l_orderkey -> o_custkey (via join)",
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.countDistinct("o_custkey").alias("n_dep")),
    )
    c3 = check(
        "nation: n_nationkey -> n_regionkey",
        n.groupBy("n_nationkey").agg(
            F.countDistinct("n_regionkey").alias("n_dep")
        ),
    )
    c4 = check(
        "events: user_id -> event_type (expected to FAIL)",
        ev.groupBy("user_id").agg(
            F.countDistinct("event_type").alias("n_dep")
        ),
    )
    return c1.unionAll(c2).unionAll(c3).unionAll(c4).orderBy("dependency")


@register(
    "dq7_json_conformance",
    oracle="""
    SELECT event_type,
           COUNT(*) AS rows_total,
           SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS valid_json,
           SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)
             AS has_int_k,
           SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) BETWEEN 0 AND 99 THEN 1 ELSE 0 END)
             AS k_in_range,
           SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                         AS BIGINT) BETWEEN 0 AND 99 THEN 0 ELSE 1 END)
             * 1000000 // COUNT(*) AS violation_ppm
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("F7", "A3", "EXT", "dq"),
)
def dq7_json_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema conformance — the contract check for a
    JSON payload column: per series, how many props rows parse as
    JSON, carry an integer `k`, and keep it in the documented [0, 100)
    range, with the violation rate in floor-ppm (the dq-family's
    answer to 'the producer changed the payload shape'). Row-local
    JSON probes (get_json_object + try_cast — no UDF) ride the scan;
    one partial→final aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    valid = F.expr(
        "get_json_object(props, '$') IS NOT NULL"
    )  # parses as JSON
    in_range = k.isNotNull() & (k >= 0) & (k <= 99)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("rows_total"),
            F.sum(F.when(valid, 1).otherwise(0)).alias("valid_json"),
            F.sum(F.when(k.isNotNull(), 1).otherwise(0)).alias("has_int_k"),
            F.sum(F.when(in_range, 1).otherwise(0)).alias("k_in_range"),
            F.expr(
                "SUM(CASE WHEN try_cast(get_json_object(props, '$.k') AS BIGINT)"
                " BETWEEN 0 AND 99 THEN 0 ELSE 1 END) * 1000000 DIV COUNT(*)"
            ).alias("violation_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "ts8_max_drawdown",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             SUM(revq) OVER w AS p
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    dd AS (
      SELECT event_type, day, p,
             MAX(p) OVER (PARTITION BY event_type ORDER BY day) - p AS ddq
      FROM cum
    )
    SELECT event_type,
           CAST(MAX(ddq) / 1000000.0 AS DOUBLE) AS max_drawdown,
           MIN(CASE WHEN ddq = mx THEN day END) AS trough_day
    FROM (SELECT *, MAX(ddq) OVER (PARTITION BY event_type) AS mx FROM dd)
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("W5", "EXT", "timeseries"),
)
def ts8_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series — the peak-to-trough loss measure
    (finance's risk staple, equally useful for 'how far below its
    best day has this metric sunk'): drawdown_t = runningMax(P)_t −
    P_t over the cumulative series, its max is the answer — the same
    prefix-statistic closed form as ts6's CUSUM (two stacked window
    passes, no recursion), all integer until one final division.
    Reports the trough day (earliest on ties) alongside the depth."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_quantize("value")).alias("revq"))
    ordered = Window.partitionBy("event_type").orderBy("day")
    cum = daily.select(
        "event_type", "day", F.sum("revq").over(ordered).alias("p")
    )
    dd = cum.select(
        "event_type",
        "day",
        (F.max("p").over(ordered) - F.col("p")).alias("ddq"),
    ).withColumn("mx", F.max("ddq").over(Window.partitionBy("event_type")))
    return (
        dd.groupBy("event_type")
        .agg(
            (F.max("ddq") / 1_000_000.0).cast("double").alias("max_drawdown"),
            F.min(
                F.when(F.col("ddq") == F.col("mx"), F.col("day"))
            ).alias("trough_day"),
        )
        .orderBy("event_type")
    )


@register(
    "ts9_hour_of_week_heatmap",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) + 1 AS dow,
             CAST(hour(ts) AS BIGINT) AS hod,
             COUNT(*) AS n,
             SUM({_Q.format(x='value')}) AS revq
      FROM events GROUP BY 1, 2
    )
    SELECT dow, hod, n,
           CAST(revq / 1000000.0 AS DOUBLE) AS revenue,
           n * 1000000 // SUM(n) OVER () AS load_ppm
    FROM cells ORDER BY dow, hod
    """,
    tags=("A2", "F2", "EXT", "timeseries"),
)
def ts9_hour_of_week_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7×24 hour-of-week load heatmap — the ops-dashboard matrix
    behind capacity planning and alert-threshold schedules (ts2's
    weekday profile refined to the hour grain): event count, quantized
    revenue and each cell's share of total load in floor-ppm. One
    hash aggregation to 168 cells; the share window runs over those
    168 rows only. Day numbering matches ts2 (Spark Sunday-1 ==
    DuckDB dayofweek+1)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count("*").alias("n"), F.sum(_quantize("value")).alias("revq")
    )
    return cells.select(
        "dow",
        "hod",
        "n",
        (F.col("revq") / 1_000_000.0).cast("double").alias("revenue"),
        F.expr(
            "n * 1000000 DIV SUM(n) OVER ()"
        ).alias("load_ppm"),
    ).orderBy("dow", "hod")


# Benford expected first-digit proportions log10(1 + 1/d), precomputed
# so no libm log executes at query time (cross-engine libm differs)
_BENFORD_P = [
    0.301029996, 0.176091259, 0.124938737, 0.096910013, 0.079181246,
    0.066946790, 0.057991947, 0.051152522, 0.045757491,
]
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P, start=1)
) + " END"


@register(
    "dq8_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice >= 1
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM digits),
    terms AS (
      SELECT d.digit, d.n,
             CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END AS expected_p,
             d.n * 1000000 // t.t AS observed_ppm,
             CAST(TRUNC(((d.n - (CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t) * (d.n - (CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t) / ((CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t)) * 1000000 + (CASE WHEN ((d.n - (CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t) * (d.n - (CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t) / ((CASE d.digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.06694679 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 WHEN 9 THEN 0.045757491 END) * t.t)) >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT) AS chi_q
      FROM digits d CROSS JOIN tot t
    )
    SELECT digit, n, observed_ppm,
           CAST(FLOOR(expected_p * 1000000) AS BIGINT) AS benford_ppm,
           ROUND(SUM(chi_q) OVER () / 1000000.0, 6) AS chi2_total
    FROM terms ORDER BY digit
    """,
    tags=("A10", "F1", "EXT", "dq"),
)
def dq8_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the forensic screen for
    fabricated or truncated numeric data: observed leading-digit
    frequencies of order totals against log10(1+1/d), with the
    chi-square fit statistic. The Benford proportions are PRECOMPUTED
    literals (no runtime libm log — engine math libraries differ in
    the last ulp); the leading digit comes from FLOOR-then-string
    (both engines' double→int casts disagree on rounding, floor
    first); chi² terms quantize before the sum (dsum rule). One hash
    agg to 9 rows."""
    o = load_table(spark, sf_dir, "orders")
    digits = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("t"))
    expected_p = F.expr(_BENFORD_CASE)
    terms = digits.join(F.broadcast(tot)).select(
        "digit",
        "n",
        expected_p.alias("expected_p"),
        F.expr("n * 1000000 DIV t").alias("observed_ppm"),
        _quantize(
            (F.col("n") - expected_p * F.col("t"))
            * (F.col("n") - expected_p * F.col("t"))
            / (expected_p * F.col("t"))
        ).alias("chi_q"),
    )
    return terms.select(
        "digit",
        "n",
        "observed_ppm",
        F.floor(F.col("expected_p") * 1_000_000).cast("bigint").alias("benford_ppm"),
        F.round(
            F.sum("chi_q").over(Window.partitionBy()) / 1_000_000.0, 6
        ).alias("chi2_total"),
    ).orderBy("digit")


@register(
    "ts10_ohlc_candles",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id, {_Q.format(x='value')} AS vq
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, vq,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM q
    )
    SELECT event_type, day,
           CAST(MIN(CASE WHEN rn_a = 1 THEN vq END) / 1000000.0 AS DOUBLE)
             AS open,
           CAST(MAX(vq) / 1000000.0 AS DOUBLE) AS high,
           CAST(MIN(vq) / 1000000.0 AS DOUBLE) AS low,
           CAST(MIN(CASE WHEN rn_z = 1 THEN vq END) / 1000000.0 AS DOUBLE)
             AS close,
           COUNT(*) AS n
    FROM ranked GROUP BY event_type, day ORDER BY event_type, day
    """,
    tags=("A11", "A2", "EXT", "timeseries"),
)
def ts10_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle rollup per series per day — open (first value in
    time order), high, low, close (last value): the canonical
    time-series downsample for charts and retention-tiered storage
    (ClickHouse users build exactly this as an
    AggregatingMergeTree with argMin/argMax states). Open/close are
    argMin/argMax over the (ts, event_id) total order — min_by/max_by
    on a packed struct, no window needed in Spark — and all values
    ride quantized longs. One partial→final aggregation; at 100 TB
    this IS the rollup x6 maintains incrementally."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.struct("ts", "event_id").alias("ord"),
        _quantize("value").alias("vq"),
    )
    return (
        q.groupBy("event_type", "day")
        .agg(
            (F.min_by("vq", "ord") / 1_000_000.0)
            .cast("double")
            .alias("open"),
            (F.max("vq") / 1_000_000.0).cast("double").alias("high"),
            (F.min("vq") / 1_000_000.0).cast("double").alias("low"),
            (F.max_by("vq", "ord") / 1_000_000.0)
            .cast("double")
            .alias("close"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type", "day")
    )


OTHERS_K = 10


@register(
    "a27_topk_with_others",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, SUM({_Q.format(x='l_extendedprice')}) AS rq,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rq DESC, l_partkey) AS rnk
      FROM rev
    )
    SELECT CASE WHEN rnk <= {OTHERS_K}
                THEN CAST(l_partkey AS VARCHAR) ELSE 'OTHER' END AS part,
           SUM(n) AS lines,
           CAST(SUM(rq) / 1000000.0 AS DOUBLE) AS revenue,
           MIN(rnk) AS rank_order
    FROM ranked
    GROUP BY 1 ORDER BY rank_order
    """,
    tags=("O3", "A2", "EXT"),
)
def a27_topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with an OTHERS bucket — the dashboard staple plain top-k
    silently gets wrong: the leaderboard keeps the top 10 parts BY
    revenue while everything else rolls into one 'OTHER' row, so the
    total still reconciles to the whole table (no silently dropped
    mass). Deterministic cut (revenue desc, key tiebreak); the rank
    window runs over the PART-LEVEL rollup, not the fact table; the
    relabel+regroup is O(parts). Quantized-long revenue throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(_quantize("l_extendedprice")).alias("rq"),
        F.count("*").alias("n"),
    )
    ranked = rev.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("rq").desc(), "l_partkey")),
    )
    return (
        ranked.groupBy(
            F.when(
                F.col("rnk") <= OTHERS_K, F.col("l_partkey").cast("string")
            )
            .otherwise("OTHER")
            .alias("part")
        )
        .agg(
            F.sum("n").alias("lines"),
            (F.sum("rq") / 1_000_000.0).cast("double").alias("revenue"),
            F.min("rnk").alias("rank_order"),
        )
        .orderBy("rank_order")
    )


ROLLCORR_WINDOW = 7
ROLLCORR_A, ROLLCORR_B = "click", "purchase"


@register(
    "ts11_rolling_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = '{ROLLCORR_A}'
                      THEN {_Q.format(x='value')} ELSE 0 END) AS aq,
             SUM(CASE WHEN event_type = '{ROLLCORR_B}'
                      THEN {_Q.format(x='value')} ELSE 0 END) AS bq
      FROM events WHERE event_type IN ('{ROLLCORR_A}', '{ROLLCORR_B}')
      GROUP BY 1
    ),
    win AS (
      SELECT day,
             COUNT(*) OVER w AS n,
             SUM(aq) OVER w AS sa, SUM(bq) OVER w AS sb,
             SUM(CAST(aq AS DECIMAL(38,0)) * bq) OVER w AS sab,
             SUM(CAST(aq AS DECIMAL(38,0)) * aq) OVER w AS saa,
             SUM(CAST(bq AS DECIMAL(38,0)) * bq) OVER w AS sbb
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN {ROLLCORR_WINDOW - 1}
                   PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
                 6) AS rolling_corr
    FROM win WHERE n = {ROLLCORR_WINDOW} ORDER BY day
    """,
    tags=("A10", "W6", "EXT", "timeseries"),
)
def ts11_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between two series (click vs
    purchase daily revenue) — the metric-coupling monitor ('did these
    decouple this week') and pair-trading staple. Windowed integer
    moments (DECIMAL(38,0) cross-products — q-unit products overflow
    int64) with ONE IEEE correlation tree per row, rounded; rows with
    incomplete frames are excluded (the textbook construction). The
    pivot-to-columns trick turns the two series into one row per day,
    so a single ROWS frame carries all five moments — no self-join."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(ROLLCORR_A, ROLLCORR_B)
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == ROLLCORR_A, _quantize("value")
            ).otherwise(F.lit(0))
        ).alias("aq"),
        F.sum(
            F.when(
                F.col("event_type") == ROLLCORR_B, _quantize("value")
            ).otherwise(F.lit(0))
        ).alias("bq"),
    )
    w = Window.orderBy("day").rowsBetween(-(ROLLCORR_WINDOW - 1), 0)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    win = daily.select(
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("aq").over(w).alias("sa"),
        F.sum("bq").over(w).alias("sb"),
        F.sum(dec("aq") * F.col("bq")).over(w).alias("sab"),
        F.sum(dec("aq") * F.col("aq")).over(w).alias("saa"),
        F.sum(dec("bq") * F.col("bq")).over(w).alias("sbb"),
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    sab = F.col("sab").cast("double")
    saa, sbb = F.col("saa").cast("double"), F.col("sbb").cast("double")
    corr = (n * sab - sa * sb) / F.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    return (
        win.filter(F.col("n") == ROLLCORR_WINDOW)
        .select("day", F.round(corr, 6).alias("rolling_corr"))
        .orderBy("day")
    )


@register(
    "ch_exact_distinct_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT w.wk, SUM(d.dau) AS sum_dau, MIN(w.wau) AS wau,
           SUM(d.dau) * 1000000 // MIN(w.wau) AS stickiness_ppm
    FROM daily d JOIN weekly w ON d.wk = w.wk
    GROUP BY w.wk ORDER BY w.wk
    """,
    tags=("A3", "A2", "EXT", "retention"),
)
def ch_exact_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-count rollup day→week via mergeable SET state —
    the uniqExactState/uniqExactMerge idiom (ch_uniq_merge_rollup is
    the approximate-HLL sibling): per-day user SETS merge to the week
    by union, so WAU comes from day-level state without rescanning the
    fact table, and Σdau/wau is the stickiness ratio (DAU/WAU in its
    weekly form). Spark side: collect_set per day, flatten+distinct
    per week — state is O(distinct users/day), the exact-rollup trade
    the HLL variant exists to avoid at whale scale; both belong in the
    library because reconciliation needs the exact one."""
    ev = load_table(spark, sf_dir, "events")
    daily_sets = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("wk"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.collect_set("user_id").alias("users"))
    return (
        daily_sets.groupBy("wk")
        .agg(
            F.sum(F.size("users")).alias("sum_dau"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("users")))
            ).alias("wau"),
        )
        .select(
            "wk",
            "sum_dau",
            F.col("wau").cast("long").alias("wau"),
            F.expr("sum_dau * 1000000 DIV wau").alias("stickiness_ppm"),
        )
        .orderBy("wk")
    )


@register(
    "dq9_volume_reconciliation",
    oracle="""
    WITH om AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr, COUNT(*) AS orders_n
      FROM orders GROUP BY 1
    ),
    lm AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
             COUNT(*) AS lines_n,
             COUNT(DISTINCT l.l_orderkey) AS orders_with_lines
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT om.yr, om.orders_n, lm.lines_n,
           lm.lines_n * 1000 // om.orders_n AS lines_per_order_milli,
           om.orders_n - lm.orders_with_lines AS childless_orders
    FROM om JOIN lm ON om.yr = lm.yr
    ORDER BY om.yr
    """,
    tags=("A3", "J1", "EXT", "dq"),
)
def dq9_volume_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table volume reconciliation by year — the trend-framed
    integrity dashboard (dq1 checks point constraints; this watches
    RATIOS drift): orders vs order lines, lines-per-order in exact
    milli-units, and childless orders (headers with no lines — the
    partial-delivery smell that absolute counts hide until it is
    large). Two hash rollups joined on the year — at 100 TB this runs
    per extraction tick against the destination to prove a load
    neither dropped nor duplicated a side of the relationship."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    om = o.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.count("*").alias("orders_n")
    )
    lm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count("*").alias("lines_n"),
            F.countDistinct("l_orderkey").alias("orders_with_lines"),
        )
    )
    return (
        om.join(lm, "yr")
        .select(
            "yr",
            "orders_n",
            "lines_n",
            F.expr("lines_n * 1000 DIV orders_n").alias(
                "lines_per_order_milli"
            ),
            (F.col("orders_n") - F.col("orders_with_lines")).alias(
                "childless_orders"
            ),
        )
        .orderBy("yr")
    )


@register(
    "ch_retention_dialect",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS users,
           CAST(SUM(r1) AS BIGINT) AS viewed,
           CAST(SUM(LEAST(r1, c2)) AS BIGINT) AS viewed_clicked,
           CAST(SUM(LEAST(r1, c3)) AS BIGINT) AS viewed_purchased
    FROM per_user
    """,
    tags=("A7", "EXT", "dialect", "retention"),
)
def ch_retention_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's ``retention(cond1, …, condN)`` aggregate — the
    cohort-analysis staple — running UNCHANGED through the dialect
    (round 5b): per user, r[1] = cond1 held on some event and
    r[i>1] = cond1 AND condi, then the classic outer SUM over users.
    The rewrite renders max-CASE flag aggregates, so the whole thing
    is two hash aggregations (user grouping, then one global row) —
    partial-aggregated map-side, no join, the exact shape a 100 TB
    event table wants. Subscripts use element_at (ClickHouse arrays
    are 1-based; Spark ``[]`` is 0-based — element_at is the portable
    1-based spelling). The oracle is independent ANSI max-CASE."""
    from ..sources.extract import ParquetExtractor, TableConfig

    table = TableConfig(
        name="events",
        custom_query=(
            "SELECT count(*) AS users, "
            "sum(element_at(r, 1)) AS viewed, "
            "sum(element_at(r, 2)) AS viewed_clicked, "
            "sum(element_at(r, 3)) AS viewed_purchased "
            "FROM (SELECT user_id, "
            "retention(event_type = 'view', event_type = 'click', "
            "event_type = 'purchase') AS r "
            "FROM events GROUP BY user_id)"
        ),
        custom_query_dialect="clickhouse",
    )
    return ParquetExtractor(sf_dir).extract(table, spark).df


@register(
    "ts12_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope_d
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY slope_d, xi, xj) AS rn,
             COUNT(*) OVER () AS np
      FROM pairs
    ),
    med AS (
      SELECT slope_d, yj - yi AS slope_num, xj - xi AS slope_den, np
      FROM ranked WHERE rn = (np + 1) // 2
    ),
    resid AS (
      SELECT d.x, d.y - m.slope_d * d.x AS r, m.slope_d,
             m.slope_num, m.slope_den, m.np
      FROM daily d CROSS JOIN med m
    ),
    rranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY r, x) AS rn,
             COUNT(*) OVER () AS n
      FROM resid
    )
    SELECT n AS n_points, np AS n_pairs,
           slope_num, slope_den,
           CAST(FLOOR(slope_d * 1000000) AS BIGINT) AS slope_ppm,
           CAST(FLOOR(r * 1000) AS BIGINT) AS intercept_milli
    FROM rranked WHERE rn = (n + 1) // 2
    """,
    tags=("A10", "EXT", "robust", "trend"),
)
def ts12_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator (Sen, JASA 1968) over the daily
    event-volume series — the median of all pairwise slopes, the
    regression a monitoring system wants because one bad day cannot
    move it (unlike the least-squares fit). Determinism: the LOWER
    median is selected discretely over a total order (slope double —
    one IEEE division of identical integers per pair — then pair id),
    never interpolated; the chosen slope is also reported as its exact
    num/den integer pair, and the intercept is the discrete median of
    residuals under that slope. Scale: pairwise slopes are O(days²) of
    the AGGREGATED series — the self-join runs on one row per day
    (~365/year), never on raw events; the raw scan is one count-by-day
    partial aggregate."""
    daily = load_table(spark, sf_dir, "events").selectExpr(
        "unix_date(CAST(ts AS DATE)) AS x"
    ).groupBy("x").agg(F.count("*").alias("y")).selectExpr(
        "CAST(x AS BIGINT) AS x", "y"
    )
    a = daily.selectExpr("x AS xi", "y AS yi")
    b = daily.selectExpr("x AS xj", "y AS yj")
    pairs = a.join(b, F.col("xj") > F.col("xi")).selectExpr(
        "xi", "yi", "xj", "yj",
        "CAST(yj - yi AS DOUBLE) / (xj - xi) AS slope_d",
    )
    from pyspark.sql import Window

    ranked = pairs.withColumn(
        "rn", F.row_number().over(Window.orderBy("slope_d", "xi", "xj"))
    ).withColumn("np", F.count("*").over(Window.partitionBy()))
    med = ranked.filter(
        F.expr("rn = (np + 1) DIV 2")
    ).selectExpr(
        "slope_d", "yj - yi AS slope_num", "xj - xi AS slope_den", "np"
    )
    resid = daily.crossJoin(F.broadcast(med)).selectExpr(
        "x",
        "y - slope_d * x AS r",
        "slope_d",
        "slope_num",
        "slope_den",
        "np",
    )
    rranked = resid.withColumn(
        "rn", F.row_number().over(Window.orderBy("r", "x"))
    ).withColumn("n", F.count("*").over(Window.partitionBy()))
    return rranked.filter(F.expr("rn = (n + 1) DIV 2")).selectExpr(
        "n AS n_points",
        "np AS n_pairs",
        "slope_num",
        "slope_den",
        "CAST(FLOOR(slope_d * 1000000) AS BIGINT) AS slope_ppm",
        "CAST(FLOOR(r * 1000) AS BIGINT) AS intercept_milli",
    )


J21_BUCKET = 3600  # seconds; durations cap at 2 h → ≤ 3 buckets/interval
J21_MAX_ID = 20000


@register(
    "j21_interval_overlap_join",
    oracle=f"""
    WITH iv AS (
      SELECT event_id AS id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               + 60 * (1 + event_id % 120) AS e
      FROM events WHERE event_id <= {J21_MAX_ID}
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS ov_s,
             GREATEST(a.s, b.s) // {J21_BUCKET} AS day_bucket
      FROM iv a JOIN iv b
        ON a.id < b.id AND a.s < b.e AND b.s < a.e
    )
    SELECT day_bucket // 24 AS day,
           COUNT(*) AS n_pairs,
           SUM(ov_s) AS overlap_s_sum,
           SUM(id_a + id_b) AS id_checksum
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
    tags=("J9", "EXT", "interval", "spatial-join"),
)
def j21_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP-PAIR join — find every pair of time intervals
    that intersect (meeting-room conflicts, session collisions, trade
    matching) — as a bucket-replicated EQUI-join: each interval lands
    in every hour bucket it spans (≤3 here — durations are bounded,
    the precondition any interval blocking needs), candidates join on
    the bucket, and a pair is emitted ONLY in the canonical bucket
    floor(max(starts)/W) — the standard dedup-free trick, because the
    later start lies in exactly one bucket and any overlapping pair
    shares that bucket (overlap means max(start) < min(end), both
    intervals alive there). The oracle is the brute theta-join, so the
    hash-match proves the blocking lossless AND duplicate-free. Per
    day: pair count, total overlap seconds, id checksum. At 100 TB the
    shuffle key is the hour bucket — time-local pairs never leave
    their bucket's partition (AQE handles rush-hour skew). Measured
    at scale (SCALEUP.json `spatial`, id cap lifted): Spark beats
    DuckDB's identical blocked formulation 2-3x at 1-10M events."""
    iv = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") <= J21_MAX_ID
    ).selectExpr(
        "event_id AS id",
        "unix_timestamp(CAST(ts AS TIMESTAMP)) AS s",
        "unix_timestamp(CAST(ts AS TIMESTAMP)) + 60 * (1 + event_id % 120)"
        " AS e",
    )
    a = iv.selectExpr(
        "id AS id_a",
        "s AS s_a",
        "e AS e_a",
        f"explode(sequence(s DIV {J21_BUCKET}, (e - 1) DIV {J21_BUCKET}))"
        " AS bucket",
    )
    b = iv.selectExpr(
        "id AS id_b",
        "s AS s_b",
        "e AS e_b",
        f"explode(sequence(s DIV {J21_BUCKET}, (e - 1) DIV {J21_BUCKET}))"
        " AS bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            F.expr(
                "id_a < id_b AND s_a < e_b AND s_b < e_a "
                f"AND GREATEST(s_a, s_b) DIV {J21_BUCKET} = bucket"
            )
        )
        .selectExpr(
            "LEAST(e_a, e_b) - GREATEST(s_a, s_b) AS ov_s",
            f"bucket DIV 24 AS day",
            "id_a + id_b AS ids",
        )
    )
    return (
        pairs.groupBy("day")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("ov_s").alias("overlap_s_sum"),
            F.sum("ids").alias("id_checksum"),
        )
        .orderBy("day")
    )


K_ANON = 8  # groups smaller than this are re-identification risks


@register(
    "dq10_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT MIN(cnt) AS k_anonymity,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN cnt < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risk_groups,
           CAST(SUM(CASE WHEN cnt < {K_ANON} THEN cnt ELSE 0 END) AS BIGINT)
             AS n_risk_rows,
           CAST((CAST(SUM(CASE WHEN cnt < {K_ANON} THEN cnt ELSE 0 END)
                      AS BIGINT) * 1000000
                 // CAST(SUM(cnt) AS BIGINT)) / 10000.0 AS DOUBLE)
             AS risk_pct
    FROM g
    """,
    tags=("A2", "A3", "EXT", "dq", "privacy"),
)
def dq10_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier projection — the
    privacy gate a dataset passes before release/training: every
    (nationkey, mktsegment) equivalence class smaller than K_ANON rows
    is a re-identification risk.  One hash aggregate to the class
    relation, one ungrouped aggregate over O(classes) rows; the risk
    percentage stays in integer arithmetic (ppm div) until the final
    literal division, so the report is engine-exact.  At 100 TB the
    class relation is the only shuffle and it is bounded by the QI
    domain, not the row count."""
    g = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    risk_rows = F.sum(
        F.when(F.col("cnt") < K_ANON, F.col("cnt")).otherwise(F.lit(0))
    )
    return g.agg(
        F.min("cnt").alias("k_anonymity"),
        F.count("*").alias("n_groups"),
        F.sum(
            F.when(F.col("cnt") < K_ANON, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_risk_groups"),
        risk_rows.alias("n_risk_rows"),
        (
            F.expr(
                f"sum(CASE WHEN cnt < {K_ANON} THEN cnt ELSE 0 END) "
                f"* 1000000 div sum(cnt)"
            )
            / 10_000.0
        )
        .cast("double")
        .alias("risk_pct"),
    )


WINSOR_LO, WINSOR_HI = 10, 90  # percent bounds (integer → exact)


@register(
    "a28_winsorized_mean",
    oracle=f"""
    WITH per AS (
      SELECT l_returnflag, {_Q.format(x='l_extendedprice')} AS vq,
             COUNT(*) AS c
      FROM lineitem GROUP BY l_returnflag, vq
    ),
    cum AS (
      SELECT l_returnflag, vq, c,
             SUM(c) OVER (PARTITION BY l_returnflag ORDER BY vq) AS cc,
             SUM(c) OVER (PARTITION BY l_returnflag) AS n
      FROM per
    ),
    thr AS (
      SELECT l_returnflag,
             MIN(CASE WHEN cc * 100 >= {WINSOR_LO} * n THEN vq END) AS loq,
             MIN(CASE WHEN cc * 100 >= {WINSOR_HI} * n THEN vq END) AS hiq,
             MAX(n) AS n
      FROM cum GROUP BY l_returnflag
    )
    SELECT per.l_returnflag,
           CAST(thr.loq / 1000000.0 AS DOUBLE) AS p{WINSOR_LO},
           CAST(thr.hiq / 1000000.0 AS DOUBLE) AS p{WINSOR_HI},
           CAST(CAST(SUM(LEAST(GREATEST(per.vq, thr.loq), thr.hiq) * per.c)
                     AS BIGINT) / 1000000.0 / MAX(thr.n) AS DOUBLE)
             AS winsorized_mean,
           CAST(MAX(thr.n) AS BIGINT) AS n
    FROM per JOIN thr USING (l_returnflag)
    GROUP BY per.l_returnflag, thr.loq, thr.hiq
    ORDER BY per.l_returnflag
    """,
    tags=("A9", "A10", "EXT", "robust"),
)
def a28_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (robust location estimate): clamp values to the
    exact type-1 [p10, p90] quantiles, then average.  Same mergeable
    shape as ch_quantiles_disc — one hash agg collapses rows to
    distinct quantized values, the window + threshold agg run over
    O(distinct) — then the clamped sum re-uses the SAME distinct
    relation (no second pass over raw rows).  All clamping and
    summation is scaled-long integer; the only floats are two final
    literal divisions (|Σ clamped| ≈ n·price·1e6 — fits int64 through
    ~sf10 per flag; beyond that swap in dsum_decimal per
    _determinism.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        "l_returnflag", _quantize("l_extendedprice").alias("vq")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy("vq")
    cum = per.select(
        "l_returnflag",
        "vq",
        "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cc"),
        F.sum("c").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    thr = cum.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cc") * 100 >= WINSOR_LO * F.col("n"), F.col("vq"))
        ).alias("loq"),
        F.min(
            F.when(F.col("cc") * 100 >= WINSOR_HI * F.col("n"), F.col("vq"))
        ).alias("hiq"),
        F.max("n").alias("n"),
    )
    return (
        per.join(F.broadcast(thr), "l_returnflag")
        .groupBy("l_returnflag", "loq", "hiq")
        .agg(
            (
                F.sum(
                    F.least(F.greatest(F.col("vq"), F.col("loq")), F.col("hiq"))
                    * F.col("c")
                )
                / 1_000_000.0
                / F.max("n")
            )
            .cast("double")
            .alias("winsorized_mean"),
            F.max("n").alias("n"),
        )
        .select(
            "l_returnflag",
            (F.col("loq") / 1_000_000.0).cast("double").alias(f"p{WINSOR_LO}"),
            (F.col("hiq") / 1_000_000.0).cast("double").alias(f"p{WINSOR_HI}"),
            "winsorized_mean",
            "n",
        )
        .orderBy("l_returnflag")
    )


@register(
    "ch_combinators_matrix",
    oracle=f"""
    SELECT event_type,
           COUNT(*) FILTER (WHERE value > 100) AS count_if,
           CAST(SUM({_Q.format(x='value')})
                FILTER (WHERE value > 100) AS BIGINT) AS sum_if_q,
           COUNT(DISTINCT CASE WHEN value > 100 THEN user_id END)
             AS uniq_exact_if,
           CAST(SUM({_Q.format(x='value')}) FILTER (WHERE value > 400)
                AS BIGINT) AS sum_if_rare_or_null,
           MAX(CASE WHEN value > 400 THEN user_id END)
             AS max_if_rare_or_null
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("A2", "A3", "A7", "EXT", "dialect"),
)
def ch_combinators_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's aggregate COMBINATOR system in one relation:
    ``countIf`` / ``sumIf`` (the -If combinator on any aggregate),
    ``uniqExactIf`` (stacked -ExactIf), and the -OrNull combinator's
    contract — an aggregate whose filtered input is EMPTY yields NULL,
    not 0 (exercised by the value > 400 tail, empty for some groups).
    Spark-first restatement: -If is a CASE/FILTER inside the agg (one
    pass, no second scan), -OrNull falls out of Spark's native
    null-on-empty SUM/MAX semantics; sums ride quantized longs so the
    conditional totals hash across engines."""
    ev = load_table(spark, sf_dir, "events")
    hot = F.col("value") > 100
    rare = F.col("value") > 400
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(hot, F.lit(1))).alias("count_if"),
            F.sum(F.when(hot, _quantize("value"))).alias("sum_if_q"),
            F.countDistinct(
                F.when(hot, F.col("user_id"))
            ).alias("uniq_exact_if"),
            F.sum(F.when(rare, _quantize("value"))).alias(
                "sum_if_rare_or_null"
            ),
            F.max(F.when(rare, F.col("user_id"))).alias(
                "max_if_rare_or_null"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "dq11_rater_agreement",
    oracle="""
    WITH rated AS (
      SELECT n_chars >= 250 AS a,
             LEN(STRING_SPLIT(text, ' ')) >= 45 AS b
      FROM documents
    ),
    cells AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
      FROM rated
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11,
           CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01,
           CAST(n00 AS BIGINT) AS n00,
           CAST(1000000 * (n11 + n00) // n AS BIGINT) AS po_ppm,
           CAST(((n11 + n10) * (n11 + n01)
                 + (n01 + n00) * (n10 + n00)) * 1000000 // (n * n)
                AS BIGINT) AS pe_ppm,
           CAST(CASE WHEN n * n = (n11 + n10) * (n11 + n01)
                                  + (n01 + n00) * (n10 + n00) THEN 1000000
                WHEN n * (n11 + n00) >= (n11 + n10) * (n11 + n01)
                                        + (n01 + n00) * (n10 + n00)
                THEN 1000000 * (n * (n11 + n00)
                                - ((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00)))
                     // (n * n - ((n11 + n10) * (n11 + n01)
                                  + (n01 + n00) * (n10 + n00)))
                ELSE -(1000000 * (((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00))
                                  - n * (n11 + n00))
                       // (n * n - ((n11 + n10) * (n11 + n01)
                                    + (n01 + n00) * (n10 + n00))))
                END AS BIGINT) AS kappa_ppm
    FROM cells
    """,
    tags=("A7", "EXT", "dq"),
)
def dq11_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement (Cohen's kappa) between two deterministic
    document-quality gates — the audit a labeling/curation pipeline
    runs before trusting a cheap heuristic rater against a reference
    rater.  Rater A passes docs with ≥250 chars, rater B docs with ≥45
    whitespace tokens; kappa = (p_o − p_e)/(1 − p_e) is computed
    ENTIRELY in scaled-long integer arithmetic from the 2×2 confusion
    counts (sign-magnitude division so floor/// and trunc/DIV agree),
    so both engines emit the identical ppm values — no float anywhere.
    Plan: one map-side conditional-count aggregate over the scan — a
    single-row exchange regardless of corpus size.  Long arithmetic
    holds to n ≈ 3e6 rows (10⁶·n² < 2⁶³); beyond that the same
    expression runs in decimal(38,0) — noted rather than silently
    widened, since the fixture never approaches it."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= 250).alias("a"),
        (F.size(F.split("text", " ")) >= 45).alias("b"),
    )
    cells = d.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0)).alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0)).alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n00"),
    )
    pe_num = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr("1000000L * (n11 + n00) DIV n").alias("po_ppm"),
        F.expr(f"{pe_num} * 1000000L DIV (n * n)").alias("pe_ppm"),
        F.expr(
            f"CASE WHEN n * n = {pe_num} THEN 1000000L"
            f" WHEN n * (n11 + n00) >= {pe_num}"
            f" THEN 1000000L * (n * (n11 + n00) - {pe_num})"
            f"      DIV (n * n - {pe_num})"
            f" ELSE -(1000000L * ({pe_num} - n * (n11 + n00))"
            f"        DIV (n * n - {pe_num}))"
            f" END"
        ).alias("kappa_ppm"),
    )


@register(
    "dq12_sequence_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_type, event_id,
             LAG(event_id) OVER (
               PARTITION BY event_type ORDER BY event_id) AS prev_id
      FROM events
    ),
    gaps AS (
      SELECT event_type, event_id - prev_id - 1 AS gap
      FROM seq WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    )
    SELECT e.event_type,
           COUNT(*) AS n_ids,
           CAST(MIN(e.event_id) AS BIGINT) AS min_id,
           CAST(MAX(e.event_id) AS BIGINT) AS max_id,
           CAST(COALESCE(g.n_gaps, 0) AS BIGINT) AS n_gaps,
           CAST(COALESCE(g.missing_total, 0) AS BIGINT) AS missing_total,
           CAST(COALESCE(g.max_gap, 0) AS BIGINT) AS max_gap
    FROM events e
    LEFT JOIN (
      SELECT event_type, COUNT(*) AS n_gaps,
             SUM(gap) AS missing_total, MAX(gap) AS max_gap
      FROM gaps GROUP BY event_type
    ) g USING (event_type)
    GROUP BY e.event_type, g.n_gaps, g.missing_total, g.max_gap
    """,
    tags=("W3", "EXT", "dq"),
)
def dq12_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit of a keyed export feed: for each
    event_type's id stream, how many gaps, how many ids missing in
    total, and the largest hole — the reconciliation a consumer runs
    against a producer's monotonically-assigned ids before trusting a
    feed.  SCALE-FIRST restatement of the naive global LAG: ids
    partition into 10k-wide buckets, so every within-bucket gap is
    found by a window sorted INSIDE its (type, bucket) partition —
    thousands of small parallel sorts, never one global order-by —
    and cross-bucket holes fall out of a second lag over the tiny
    per-bucket min/max relation (|buckets| ≈ n/10⁴ rows), which also
    catches WHOLLY-MISSING buckets since consecutive bucket summaries
    are adjacent in the lag.  Both gap families merge in one final
    per-type aggregate; everything is exact integer arithmetic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id"
    )
    b = (F.col("event_id") / 10_000).cast("long").alias("b")
    rows = ev.select("event_type", "event_id", b)
    w_in = Window.partitionBy("event_type", "b").orderBy("event_id")
    in_gaps = (
        rows.withColumn("prev_id", F.lag("event_id").over(w_in))
        .filter(
            F.col("prev_id").isNotNull()
            & (F.col("event_id") - F.col("prev_id") > 1)
        )
        .select(
            "event_type",
            (F.col("event_id") - F.col("prev_id") - 1).alias("gap"),
        )
    )
    bounds = rows.groupBy("event_type", "b").agg(
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
        F.count("*").alias("n"),
    )
    w_b = Window.partitionBy("event_type").orderBy("b")
    cross_gaps = (
        bounds.withColumn("prev_hi", F.lag("hi").over(w_b))
        .filter(
            F.col("prev_hi").isNotNull()
            & (F.col("lo") - F.col("prev_hi") > 1)
        )
        .select(
            "event_type",
            (F.col("lo") - F.col("prev_hi") - 1).alias("gap"),
        )
    )
    gap_stats = (
        in_gaps.unionByName(cross_gaps)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap").alias("missing_total"),
            F.max("gap").alias("max_gap"),
        )
    )
    totals = bounds.groupBy("event_type").agg(
        F.sum("n").alias("n_ids"),
        F.min("lo").alias("min_id"),
        F.max("hi").alias("max_id"),
    )
    return (
        totals.join(gap_stats, "event_type", "left")
        .select(
            "event_type",
            "n_ids",
            "min_id",
            "max_id",
            F.coalesce("n_gaps", F.lit(0)).cast("long").alias("n_gaps"),
            F.coalesce("missing_total", F.lit(0))
            .cast("long")
            .alias("missing_total"),
            F.coalesce("max_gap", F.lit(0)).cast("long").alias("max_gap"),
        )
    )

