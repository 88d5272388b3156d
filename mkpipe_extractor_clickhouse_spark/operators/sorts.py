"""Sort / limit / top-k operators (SURVEY §2.6 O1-O3; O4 lives with the
similarity operators as l4_distributed_topk).

Determinism note: the driver's value-hash is order-insensitive, but a
LIMIT changes *which* rows survive — so every limit here is under a
total order (unique-key tiebreak), per SURVEY §5.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "o1_global_sort",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
    tags=("O1",),
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (ORDER BY passthrough surface). Spark plans a
    range-partitioned exchange + per-partition sort — the only scalable
    total order."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )


@register(
    "o2_limit",
    oracle="""
    SELECT event_id, event_type, value FROM events
    ORDER BY event_id LIMIT 5
    """,
    tags=("O2",),
)
def o2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT under a unique total order — the engine
    analogue of the reference's take(1) probe (reference
    __init__.py:103), which is the degenerate k=1 case."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "event_type", "value").orderBy("event_id").limit(5)
    )


@register(
    "o3_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("O3",),
    bench=True,
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT k — Spark plans TakeOrderedAndProject:
    per-partition heaps of k, then a driver-side merge of k×partitions
    rows, never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


PAGE_SIZE = 50
PAGE_NO = 3  # zero-based


@register(
    "o5_pagination",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT {PAGE_SIZE} OFFSET {PAGE_NO * PAGE_SIZE}
    """,
    tags=("O1", "O2", "EXT"),
)
def o5_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination — page 4 of the order book by price.
    Total order (price desc, key) makes every page deterministic.
    Spark's offset() + limit() compile to a single
    TakeOrderedAndProject of offset+limit rows (top-200 here), never a
    global sort — the right shape as long as page_no stays shallow;
    deep pagination should switch to keyset (WHERE (price, key) <
    last_seen) which is the same top-k plan at any depth."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(PAGE_NO * PAGE_SIZE)
        .limit(PAGE_SIZE)
    )


# keyset cursor: the LAST row of o5's page (price desc, key asc order)
KEYSET_AFTER_PRICE = 400000.0
KEYSET_AFTER_KEY = 0
KEYSET_PAGE = 50


@register(
    "o6_keyset_pagination",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice < {KEYSET_AFTER_PRICE}
       OR (o_totalprice = {KEYSET_AFTER_PRICE}
           AND o_orderkey > {KEYSET_AFTER_KEY})
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT {KEYSET_PAGE}
    """,
    tags=("O1", "O2", "P4", "EXT"),
)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the next page AFTER a cursor row,
    expressed as a predicate on the total order instead of an OFFSET:
    ``(price, key) > cursor`` in (price desc, key asc) order. Unlike
    o5's offset (which materializes offset+limit rows however deep the
    page), the seek predicate PUSHES INTO THE SCAN (row-group pruning
    on o_totalprice) and the plan stays a top-k of page-size rows at
    ANY depth — the difference between O(page) and O(page·depth) on
    page one-million. The row-tuple comparison decomposes into the
    OR form both engines index the same way."""
    o = load_table(spark, sf_dir, "orders")
    after = (F.col("o_totalprice") < KEYSET_AFTER_PRICE) | (
        (F.col("o_totalprice") == KEYSET_AFTER_PRICE)
        & (F.col("o_orderkey") > KEYSET_AFTER_KEY)
    )
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(after)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(KEYSET_PAGE)
    )


TIES_K = 3


@register(
    "o7_topn_with_ties",
    oracle=f"""
    SELECT l_returnflag, l_quantity, n_lines FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n_lines,
             RANK() OVER (PARTITION BY l_returnflag
                          ORDER BY COUNT(*) DESC) AS rnk
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rnk <= {TIES_K}
    ORDER BY l_returnflag, n_lines DESC, l_quantity
    """,
    tags=("W8", "O3", "EXT"),
)
def o7_topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N WITH TIES — the RANK()-gated variant of w8's
    row_number top-k: every quantity whose line count ties into the
    top 3 survives, so the result is value-complete (no arbitrary
    tie-victim) at the cost of a variable group size — the FETCH FIRST
    n ROWS WITH TIES semantics ANSI added and dashboards quietly
    assume. Same WindowGroupLimit-eligible plan shape as w8; the
    output is totally ordered for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n_lines")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n_lines").desc())
    return (
        counts.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= TIES_K)
        .select("l_returnflag", "l_quantity", "n_lines")
        .orderBy("l_returnflag", F.col("n_lines").desc(), "l_quantity")
    )
