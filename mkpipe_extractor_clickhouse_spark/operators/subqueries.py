"""Subquery & pivot surface — the remaining ClickHouse-SQL passthrough
shapes users ship through the reference's custom_query
(reference README.md:57-66): scalar subqueries, IN / NOT IN, correlated
EXISTS, derived tables, CTEs, and PIVOT. Executed through spark.sql
over the registered views (the S2 path), so Catalyst's subquery
rewrites (RewriteCorrelatedScalarSubquery, decorrelation to joins) are
exercised end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..operators._determinism import _QS, DSUM, SPARK_DSUM, dsum
from ..registry import register


_SQ1_DAVG_DUCK = (
    "SELECT CAST(SUM(CAST(TRUNC(o_totalprice * 1000000"
    " + (CASE WHEN o_totalprice >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT))"
    " / 1000000.0 / COUNT(*) AS DOUBLE) FROM orders"
)
_SQ1_DAVG_SPARK = (
    "SELECT CAST(SUM(CAST((o_totalprice * 1000000"
    " + (CASE WHEN o_totalprice >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT))"
    " / 1000000.0 / COUNT(*) AS DOUBLE) FROM orders"
)


@register(
    "sq1_scalar_subquery",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - ({_SQ1_DAVG_DUCK}), 4) AS delta_from_mean
    FROM orders
    WHERE o_totalprice > ({_SQ1_DAVG_DUCK}) * 1.5
    """,
    tags=("S2", "subquery"),
)
def sq1_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in both projection and predicate —
    planned as a broadcast of the 1-row aggregate, evaluated once. The
    mean is quantized (per the repo determinism rule) so the predicate
    boundary cannot flap between engines' partial-agg orders."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - ({_SQ1_DAVG_SPARK}), 4) AS delta_from_mean
        FROM orders
        WHERE o_totalprice > ({_SQ1_DAVG_SPARK}) * 1.5
        """
    )


@register(
    "sq2_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 0
    )
    AND c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 5000
    )
    """,
    tags=("S2", "subquery"),
)
def sq2_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries → semi/anti joins after decorrelation.
    (o_custkey is non-null in the fixtures, so NOT IN's three-valued
    null semantics — identical in both engines — don't void the result.)"""
    register_views(spark, sf_dir, ["customer", "nation", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 0
        )
        AND c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 5000
        )
        """
    )


@register(
    "sq3_correlated_exists",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    """,
    tags=("S2", "subquery"),
)
def sq3_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi
    join on the correlation key."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        """
    )


@register(
    "sq4_cte_derived",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {DSUM.format(x='o_totalprice')} AS spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {DSUM.format(x='spend')} AS segment_spend,
           MAX(n_orders) AS max_orders
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("S2", "subquery"),
)
def sq4_cte_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + derived-table aggregation reused downstream — the
    two-level agg shape (per-customer then per-segment)."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        WITH per_cust AS (
          SELECT o_custkey,
                 {ds_price} AS spend,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               {ds_spend} AS segment_spend,
               MAX(n_orders) AS max_orders
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """.format(
            ds_price=SPARK_DSUM.format(x="o_totalprice"),
            ds_spend=SPARK_DSUM.format(x="spend"),
        )
    )


@register(
    "pv1_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {DSUM.format(x="CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {DSUM.format(x="CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A6", "pivot"),
)
def pv1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (ClickHouse sumIf-matrix shape) with an explicit value
    list — no extra pass to discover pivot values, one aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@register(
    "sq5_lateral_topn",
    oracle="""
    SELECT c_custkey, c_mktsegment, t.o_orderkey AS top_orderkey,
           t.o_totalprice AS top_price
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) t
    WHERE c_acctbal > 9000
    """,
    tags=("SQ", "W8", "EXT"),
)
def sq5_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — "each
    customer's priciest order", the shape ANSI users write instead of a
    window-rank filter.  Declared through Spark SQL so Catalyst's
    subquery decorrelation rewrites the per-row subquery into a set
    plan (rank inside a partitioned window + equi-join) — the lateral
    is NEVER executed once per outer row; the physical plan is the same
    scalable shape as w8, which is exactly the point of letting the
    optimizer own the rewrite."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, t.o_orderkey AS top_orderkey,
               t.o_totalprice AS top_price
        FROM customer,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        WHERE c_acctbal > 9000
        """
    )


@register(
    "sq6_qualify",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
    tags=("SQ", "W8", "EXT"),
)
def sq6_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``QUALIFY`` — filter on a window function without a subquery
    (DuckDB/Snowflake/BigQuery syntax; the oracle uses the literal
    QUALIFY clause). Spark has no QUALIFY keyword; the desugared form
    IS the implementation: window + filter, which Catalyst compiles to
    the same WindowGroupLimit plan as sq5's LATERAL top-n — per-group
    limits are pushed below the exchange, so each partition keeps at
    most k rows per group before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


PV2_FLAGS = ("A", "N", "R")


@register(
    "pv2_multi_agg_pivot",
    oracle=f"""
    SELECT l_linestatus,
           {DSUM.format(x="CASE WHEN l_returnflag = 'A' THEN l_quantity END")}
             AS A_qty,
           COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A_n,
           {DSUM.format(x="CASE WHEN l_returnflag = 'N' THEN l_quantity END")}
             AS N_qty,
           COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N_n,
           {DSUM.format(x="CASE WHEN l_returnflag = 'R' THEN l_quantity END")}
             AS R_qty,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R_n
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("A6", "A7", "EXT", "pivot"),
)
def pv2_multi_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate PIVOT — sum AND count per pivoted return flag
    in one pass (`.pivot(col, values).agg(sum, count)`), the
    crosstab-with-margins shape. Pivot values are declared explicitly
    (the distinct-scan shortcut is nondeterministic column order and
    a second job); Spark compiles this to a single hash aggregate
    with conditional columns — exactly the oracle's FILTER form, so
    one scan and map-side partial aggregation regardless of flag
    count. Quantized sums per the dsum rule."""
    from ..operators._determinism import _quantize

    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", list(PV2_FLAGS))
        .agg(
            (F.sum(_quantize("l_quantity")) / 1_000_000.0)
            .cast("double")
            .alias("qty"),
            F.count(F.lit(1)).alias("n"),  # count(*) is invalid inside Pivot
        )
    )
    cols = [F.col("l_linestatus")]
    for flag in PV2_FLAGS:
        cols.append(F.col(f"{flag}_qty"))
        cols.append(F.col(f"{flag}_n"))
    return pivoted.select(*cols)


@register(
    "sq7_correlated_scalar",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS order_count,
           (SELECT MAX(o.o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'F') AS max_finished_price
    FROM customer c
    WHERE c.c_custkey <= 300
    ORDER BY c.c_custkey
    """,
    tags=("SQ", "S2", "EXT", "subquery"),
)
def sq7_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subqueries in the projection — per-customer
    aggregates written as inline subqueries (the ORM-generated shape
    users paste in): Catalyst DECORRELATES both into left outer
    aggregate joins, so the plan is two hash joins over one orders
    scan each, never a per-row re-execution (the plan a naive engine
    would run N times). COUNT's empty-group-is-0 vs MAX's
    empty-group-is-NULL semantics both survive decorrelation — the
    subtlety this query pins."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS order_count,
               (SELECT MAX(o.o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F') AS max_finished_price
        FROM customer c
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey
        """
    )


@register(
    "sq8_pipe_syntax",
    oracle=f"""
    SELECT cohort, n, sum_value
    FROM (
      SELECT user_id % 100 AS cohort,
             COUNT(*) AS n,
             {DSUM.format(x='value')} AS sum_value
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY user_id % 100
    )
    WHERE n >= 20
    """,
    tags=("SQ", "EXT", "dialect"),
)
def sq8_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL *pipe syntax* (``|>``) — the linear query form
    (FROM → WHERE → EXTEND → AGGREGATE → WHERE) that reads in
    execution order instead of inside-out nesting; ClickHouse users
    coming from chained subqueries map onto it directly.  Semantically
    identical to the nested ANSI form the oracle runs: pipe operators
    desugar to the same logical plan, so Catalyst still pushes the
    event_type filter into the scan and plans ONE hash aggregate on
    the cohort key — pipes change the authoring surface, never the
    physical plan.  Sum is quantized-long (SPARK_DSUM ≡ DSUM), exact
    in both engines."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        f"""
        FROM events
        |> WHERE event_type IN ('click', 'purchase')
        |> EXTEND user_id % 100 AS cohort
        |> AGGREGATE COUNT(*) AS n,
                     {SPARK_DSUM.format(x='value')} AS sum_value
           GROUP BY cohort
        |> WHERE n >= 20
        """
    )


@register(
    "sq9_recursive_cte",
    oracle=f"""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS node, 0 AS depth, c_acctbal
      FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, chain.depth + 1, c.c_acctbal
      FROM customer c JOIN chain ON c.c_custkey // 2 = chain.node
      WHERE c.c_custkey > 1
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           COUNT(*) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_key,
           CAST(MAX(node) AS BIGINT) AS max_key,
           {DSUM.format(x='c_acctbal')} AS level_acctbal
    FROM chain
    GROUP BY depth
    """,
    tags=("SQ", "EXT", "dialect"),
)
def sq9_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``WITH RECURSIVE`` — a true iterative-fixpoint query in
    pure SQL: customers form an implicit referral tree (each key's
    parent is ``key DIV 2``), and the recursion walks every level from
    the root, aggregating headcount and balances per depth — the org
    chart / bill-of-materials shape a non-recursive engine needs
    application-side loops for (g7's unrolled BFS is exactly that
    restatement; this is the engine-native form).  Recursion depth is
    ⌈log₂(max key)⌉ (~14-17 at fixture scales), and each iteration is
    ONE equi-join of the customer relation against the previous
    frontier — the same bounded-iteration shape as the g-family, now
    planned by Catalyst's UnionLoop.  Balance sums are quantized longs
    (DuckDB runs the identical recursive SQL), so every level's
    aggregate is bit-exact across engines."""
    register_views(spark, sf_dir, ["customer"])
    q = _QS.format(x="c_acctbal")
    return spark.sql(
        f"""
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS node, 0 AS depth, c_acctbal
          FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, chain.depth + 1, c.c_acctbal
          FROM customer c JOIN chain ON c.c_custkey DIV 2 = chain.node
          WHERE c.c_custkey > 1
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               COUNT(*) AS n_nodes,
               CAST(MIN(node) AS BIGINT) AS min_key,
               CAST(MAX(node) AS BIGINT) AS max_key,
               CAST(SUM({q}) / 1000000.0 AS DOUBLE) AS level_acctbal
        FROM chain
        GROUP BY depth
        """
    )


@register(
    "sq10_lateral_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    ORDER BY c.c_custkey, t.o_orderkey
    """,
    tags=("SQ", "J1", "W8", "EXT", "dialect"),
)
def sq10_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table — 'top 2 orders per customer'
    written as a per-row subquery, the form ClickHouse users reach for
    via ARRAY JOIN over grouped arrays and Postgres users via LATERAL.
    Spark DECORRELATES it (SPARK-35551): the per-customer ORDER BY ..
    LIMIT 2 compiles to a rank-limited window (WindowGroupLimit cuts
    to 2 rows per key BELOW the exchange) joined back to the outer
    relation — never a per-row re-execution, so a 100 TB fact side
    shuffles once on the join key.  Both engines agree because LATERAL
    has ANSI semantics: the subquery sees exactly one outer row's
    bindings (customers with no orders drop, inner-join semantics).

    The identical SQL text runs in both engines — this query checks
    the PARSER surface as much as the semantics."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )
