"""Composite analytical queries — TPC-H-shaped pipelines combining
joins + filters + aggregation + top-k, the workloads users actually
push through the reference's custom_query surface. These are the
headline bench queries beyond Q1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import DAVG, DSUM, _quantize, davg, dsum


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("J11", "A2", "O3"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: segment filter → star join → revenue per order →
    top-10.  The dimension chain still reduces first (BUILDING
    customers broadcast into date-filtered orders), but the reduced
    set joins the fact by SHUFFLED HASH, not broadcast: the qualifying
    set is ~1/5 of ALL orders (the date filter passes almost
    everything), so at the 60 M-row scale point it is a ~3 M-row,
    string-carrying relation — a single-threaded ~100 MB broadcast
    build every run.  Shuffling instead moves only (l_orderkey,
    quantized addend) from the shipdate-filtered fact side (~14% of
    lines) and hash-builds per partition in parallel: measured
    interleaved min-of-5 at 60 M rows, 2.31 s → 1.56 s vs the
    broadcast plan (and it also wins at sf0.1: 0.44 → 0.41 s —
    SPARK's per-partition SHJ build beats one big driver-side build
    even when the build side would fit).  No Sort on either side;
    revenue aggregates on the join output and top-10 is
    TakeOrderedAndProject.

    Scale note: this is the contrast case to j11 — semijoin reduction
    only pays off as a BROADCAST when the reduced set is genuinely
    small (j11's region∩date cut is ~2%); at ~20% reduction the
    shuffle is the right physical strategy at every scale we can
    measure, exactly the call a cost-based planner makes on the
    reduced-side estimate."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    qualifying = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.select(
            "l_orderkey",
            _quantize(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("q"),
        )
        .join(
            qualifying.hint("shuffle_hash"),
            F.col("l_orderkey") == qualifying.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("q") / 1_000_000.0).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("J11", "A2", "O3"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: lost-revenue ranking of customers who returned
    items — returnflag filter pushed to the lineitem scan, dims
    broadcast, one shuffle for the fact join + one for the agg.

    Round-5 shape (scale-up bench, 3.02 s → 2.20 s at 60 M rows):
    the one unavoidable fact-fact exchange (orders carries no filter
    here, so no semijoin reduction applies) is a SHUFFLED HASH join —
    sorting 15 M rows a side bought nothing — carrying only
    (l_orderkey, quantized addend) against (o_orderkey, o_custkey);
    revenue then aggregates per o_custkey BEFORE the name dimensions
    broadcast in, so the big aggregation never carries strings.  The
    returnflag filter leaves ~1 line/order, so the old per-order
    pre-aggregate shrank nothing and is gone.  Exactness is unchanged
    under the dsum discipline: per-line quantized longs sum exactly
    in any grouping order.

    Scale note: the SHJ build side is orders/num_partitions per task —
    bounded by partition count, the standard cluster trade; AQE's skew
    split still applies to it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    addends = li.select(
        "l_orderkey",
        _quantize(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "q"
        ),
    )
    per_cust = (
        addends.join(
            o.hint("shuffle_hash").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("q").alias("rqs"))
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rqs") / 1_000_000.0).cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS high_qty_lines,
           COUNT(*) FILTER (WHERE l_quantity < 25) AS low_qty_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    tags=("J1", "A7"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: conditional counts per priority over a
    date-bounded join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("l_quantity") >= 25).alias("high_qty_lines"),
            F.count_if(F.col("l_quantity") < 25).alias("low_qty_lines"),
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("J11", "A2", "O1"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: revenue by nation where the supplier and the
    customer share a nation inside one region. Six-table star: region →
    nation → supplier chain folds into one broadcast build side;
    lineitem⋈orders is the only fact-fact shuffle; the
    customer⋈supplier nation-equality rides the same broadcast. At
    100 TB the plan is scan-heavy with exactly one shuffle on
    orderkey + one on the 25-row nation agg."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {DSUM.format(x='l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("P6", "A1"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure filtered scan-and-sum — every predicate
    (date range, discount band, quantity cap) pushes to the parquet
    scan, the projection prunes to three columns, and the aggregate is
    a two-phase partial/final with no grouping. The canonical
    'pushdown showcase' query: at 100 TB it reads only row groups whose
    min/max stats survive the predicates."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.04, 0.06))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT ROUND(
             100.0
             * {DSUM.format(x="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {DSUM.format(x='l_extendedprice * (1 - l_discount)')},
           6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("J2", "A7", "F3"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promo revenue share over a month window. part
    is the broadcast build side (hash join, no shuffle of lineitem);
    both sums quantize per-addend so the ratio of two exact longs is
    engine-identical before the final 6dp round."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias(
                "_promo"
            ),
            dsum(rev).alias("_total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6).alias(
                "promo_pct"
            )
        )
    )


@register(
    "q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {DSUM.format(x='l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum_qty > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("J11", "A5", "O3"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: customers behind the largest-quantity orders.
    The heavy step is one shuffle of lineitem on l_orderkey for the
    HAVING aggregate; the surviving order keys are a tiny fraction, so
    the join back to orders flips to broadcast under AQE at any scale
    where the filter is selective (locked only to a top-k plan, not a
    join strategy, so AQE stays free to choose)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J5", "SQ3", "A3"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (correlated EXISTS → count per priority), adapted
    to this schema: the fixture has no l_commitdate/l_receiptdate, so
    'late' is proxied by a returned line (l_returnflag = 'R'). The
    EXISTS compiles to a LEFT SEMI hash join on l_orderkey — at scale
    the quarter filter prunes orders at the scan and the semi join
    shuffles only (orderkey) pairs, never duplicating orders rows on
    multi-line matches."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J3", "A2", "A3"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13: distribution of orders-per-customer, keeping
    zero-order customers via the outer join (COUNT(o_orderkey) skips
    the null-extended rows). Two shuffles — custkey for the per-customer
    count, then the tiny c_count regroup; at 100 TB the first agg is
    partial/final on the join output so only (custkey, count) pairs
    move in stage two."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size BETWEEN 1 AND 15
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    tags=("J6", "SQ2", "A3"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (supplier diversity per part class, excluding a
    complained-about supplier set), adapted: the fixture has no
    partsupp, so lineitem is the part↔supplier bridge. The NOT IN
    compiles to a LEFT ANTI join against a 6-row broadcast (s_suppkey
    is non-null, so anti ≡ NOT IN here); part is broadcast; the only
    shuffle is the distinct-suppkey aggregate. 100 TB note: COUNT
    DISTINCT expands to a two-phase partial-distinct, so the dedup
    happens map-side before the (brand,type) exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").between(1, 15)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"))
    )


@register(
    "q22_dormant_accounts",
    oracle=f"""
    WITH threshold AS (
      SELECT {DAVG.format(x='c_acctbal')} AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {DSUM.format(x='c_acctbal')} AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("SQ1", "J6", "A2"),
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (rich customers with no recent demand), adapted:
    no phone column, so the grouping is mktsegment and 'no orders at
    all' (empty on this fixture) becomes 'no orders in the last year'.
    The scalar-average threshold is one broadcast row; the NOT EXISTS
    is a LEFT ANTI join against orders pre-filtered to the recency
    window — at 100 TB that filter prunes orders partitions before the
    anti join, and the anti side ships only o_custkey. The average is
    quantized (davg) so the > threshold comparison is engine-exact on
    boundary rows."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
