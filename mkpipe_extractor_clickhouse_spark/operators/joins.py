"""Join operators (SURVEY §2.3 J1-J11).

All REF-surface: users push these through the reference's
``custom_query`` passthrough (reference README.md:57-66) and ClickHouse
executes them; here Catalyst plans them. Physical-strategy posture for
100 TB:
  * dimension tables (region/nation/customer/supplier/part) are
    broadcast explicitly — no shuffle of the fact side;
  * fact-fact joins shuffle on the join key and rely on AQE for skew
    splitting;
  * the as-of join avoids per-key pair blowup entirely (see asof.py);
  * non-equi joins keep one side broadcast-small so the physical plan
    is BroadcastNestedLoopJoin, never a cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import DSUM, dsum
from .asof import asof_join


@register(
    "j1_inner_equi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderstatus, o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    tags=("J1",),
    bench=True,
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact inner equi join on the order key (shuffle join; AQE
    picks shuffled-hash or sort-merge at runtime)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus", "o_totalprice"
    )


@register(
    "j2_broadcast_dims",
    oracle=f"""
    SELECT r_name, n_name, {DSUM.format(x='c_acctbal')} AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("J2",),
)
def j2_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-dimension joins with explicit broadcast() — zero shuffle of
    the probe side; the dims ship to every executor once."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum("c_acctbal").alias("total_acctbal"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "j3_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           COALESCE(MAX(o_totalprice), 0.0) AS max_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("J3",),
)
def j3_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers with zero orders survive with null
    order columns (count(col) skips them)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_price"),
        )
    )


@register(
    "j4_full_outer",
    oracle="""
    SELECT u.user_id AS event_user, c.c_custkey AS cust_key,
           COALESCE(u.n_events, 0) AS n_events
    FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) u
    FULL OUTER JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 200) c
      ON u.user_id = c.c_custkey
    """,
    tags=("J4",),
)
def j4_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: unmatched rows from both sides survive."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey")
    )
    return ev.join(c, ev.user_id == c.c_custkey, "full").select(
        F.col("user_id").alias("event_user"),
        F.col("c_custkey").alias("cust_key"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )


@register(
    "j5_left_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 4000)
    """,
    tags=("J5",),
)
def j5_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi join — no row multiplication, probe side
    streams through once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "j6_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("J6",),
)
def j6_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j7_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("J7",),
)
def j7_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever dimension×dimension sized; the
    physical plan is a broadcast nested loop, not a shuffle cartesian."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "j8_theta_join",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_richer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    """,
    tags=("J8",),
)
def j8_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + non-equi residual (``>`` on balances) —
    mirrors the reference's half-open comparison logic applied across
    tables (reference __init__.py:76-83). The supplier side is
    broadcast-small, so no shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(s),
            (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer_customers"))
    )


@register(
    "j9_range_join",
    oracle=f"""
    SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_prior_clicks,
           {DSUM.format(x='c.value')} AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    tags=("J9",),
)
def j9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: clicks in the hour before each
    purchase, per user. Equi key (user) bounds the pair space; the
    range residual prunes within key."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    joined = p.join(
        c,
        (p.p_user == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts < p.p_ts),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("c_id").alias("n_prior_clicks"),
        dsum("c_value").alias("click_value"),
    )


@register(
    "j10_asof_join",
    oracle="""
    SELECT p.event_id, p.ts, c.ts AS ts_right, c.value AS value_right
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      -- pre-dedup to one row per (user_id, ts): DuckDB's ASOF picks an
      -- arbitrary tied row, our operator the max payload — collapsing
      -- ties to MAX(value) in BOTH engines makes the comparison exact
      -- even if a fixture ever carries duplicate click timestamps
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("J10",),
)
def j10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user —
    via the union-sort operator (asof.py), validated against DuckDB's
    native ASOF JOIN. Both engines collapse exact (user_id, ts) ties to
    the max value first, so the tied-row choice is deterministic on each
    side of the comparison."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(p, c, on="ts", by="user_id", right_payload=["value"])
    return out.select("event_id", "ts", "ts_right", "value_right")


@register(
    "j11_multiway_star",
    oracle=f"""
    SELECT n_name,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = (SELECT MIN(r_name) FROM region)
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("J11",),
    bench=True,
)
def j11_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star chain, SEMIJOIN-REDUCED (LIP / sideways
    information passing): instead of shuffling the fact table into a
    fact-fact join, the dimension chain reduces FIRST —
    region→nation→customer (broadcasts) cut customer to 1/|regions|,
    that cuts date-filtered orders to ~6%, and the resulting
    (o_orderkey, n_name) key set broadcasts into the lineitem scan, so
    THE FACT TABLE NEVER SHUFFLES: one pass over lineitem, probe, and
    a 6-group aggregate.  Round-5 scale-up bench: 4.15 s → 1.28 s at
    60 M lineitem rows (the fact-fact SMJ plan's exchange+sort was 70%
    of the query).

    Scale note: the broadcast side is the REDUCED key set (~6% of
    orders), not a raw table.  When even the reduced set exceeds the
    broadcast budget (at the ~100 TB extreme), drop the explicit
    broadcast and the identical dims-first plan degrades to ONE
    fact shuffle — still strictly better than joining before
    reducing.

    Round-6 refinement (interleaved min-of-5 at 60 M rows, 1.90 →
    1.56 s): the broadcast payload and the fact-side aggregate carry
    the INT nation key, not the name string — smaller hash relation,
    narrower agg rows — and the 6-row result broadcast-joins the
    names back at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    first_region = r.agg(F.min("r_name").alias("m"))
    r1 = r.join(F.broadcast(first_region), r.r_name == F.col("m")).select(
        "r_regionkey"
    )
    cust_n = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r1), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("n_nationkey").alias("nk"), "n_name")
    )
    names = cust_n.select("nk", "n_name").distinct()
    ordkeys = o.join(
        F.broadcast(cust_n.select("c_custkey", "nk")),
        o.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "nk")
    return (
        li.join(F.broadcast(ordkeys), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nk")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .join(F.broadcast(names), "nk")
        .select("n_name", "revenue")
    )


@register(
    "j12_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT event_id,
             CASE WHEN value < 50 THEN NULL
                  ELSE CAST(TRUNC(value) AS BIGINT) // 50 END AS bucket
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT CASE WHEN value < 50 THEN NULL
                  ELSE CAST(TRUNC(value) AS BIGINT) // 50 END AS bucket,
             COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT a.event_id, a.bucket, b.n_purchases
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    """,
    tags=("J1", "EXT"),
)
def j12_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): the
    NULL-bucket rows MATCH each other instead of silently dropping —
    the semantics dimension-key joins need when "unknown" is itself a
    category. Spark's eqNullSafe keeps this a hash-joinable equality
    (EqualNullSafe is an equi-join key, not a residual), so the plan
    is a plain broadcast/shuffle hash join — no null-handling
    nested-loop degradation. Bucket derivation truncates on both
    sides identically (double→long cast ≡ DuckDB //)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.when(F.col("value") < 50, F.lit(None).cast("long")).otherwise(
        (F.col("value").cast("bigint") / 50).cast("bigint")
    )
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", bucket.alias("bucket")
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_purchases"))
    )
    return a.join(b, a.bucket.eqNullSafe(b.bucket)).select(
        "event_id", a.bucket.alias("bucket"), "n_purchases"
    )


@register(
    "j17_existence_flags",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority,
           COALESCE(l.has_return, 0) AS has_returned_item,
           COALESCE(l.has_high_qty, 0) AS has_high_qty_line,
           COALESCE(l.n_lines, 0) AS n_lines
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_return,
             MAX(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS has_high_qty,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
    tags=("J5", "J6", "A7", "EXT"),
)
def j17_existence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as projection columns — every order tagged with boolean
    facts about its lines (any returned item? any bulk line?). Writing
    the two EXISTS subqueries naively costs two semi joins; the
    scalable restatement aggregates the fact ONCE into per-key flag
    maxima and left-joins that single relation — one lineitem scan and
    one join however many flags you add (the conditional-aggregate A7
    combinator fused with the J5/J6 semi/anti shapes)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flags = li.groupBy("l_orderkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_return"),
        F.max((F.col("l_quantity") > 45).cast("int")).alias("has_high_qty"),
        F.count("*").alias("n_lines"),
    )
    j = o.join(flags, o.o_orderkey == flags.l_orderkey, "left")
    return j.select(
        "o_orderkey",
        "o_orderpriority",
        F.coalesce("has_return", F.lit(0)).alias("has_returned_item"),
        F.coalesce("has_high_qty", F.lit(0)).alias("has_high_qty_line"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
    )
