"""One-off plan experiments for q3/j11 at the 60 M-row scale point.

Variants are timed INTERLEAVED (A,B,C,A,B,C,...) with min-of-5 per the
host-noise protocol — single runs / best-of-3 blocks have shown 2-3x
transient stalls that poison block-ordered comparisons.

Usage: python scripts/exp_q3_j11.py [x100_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.operators._determinism import (  # noqa: E402
    _quantize,
    dsum,
)
from mkpipe_extractor_clickhouse_spark.registry import all_specs  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else str(Path(REPO) / ".scaleup/x100")


def q3_keyonly(spark, sf_dir):
    """Semijoin via a KEY-ONLY broadcast (LongHashedRelation), per-order
    pre-agg, then a small shuffle join re-attaches orderdate/priority."""
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
    keys = qualifying.select(F.col("o_orderkey").alias("k"))
    per_order = (
        li.join(F.broadcast(keys), li.l_orderkey == F.col("k"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                _quantize(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rq")
        )
    )
    return (
        per_order.join(
            qualifying, F.col("l_orderkey") == qualifying.o_orderkey
        )
        .select(
            "l_orderkey",
            (F.col("rq") / 1_000_000.0).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q3_shuffle(spark, sf_dir):
    """No broadcast at all: SHJ between filtered lineitem and the
    reduced orders set."""
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


def j11_keyonly(spark, sf_dir):
    """Key-only semijoin broadcast into the fact scan; per-order
    pre-agg; n_name re-attached by a small shuffle join."""
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
        .select("c_custkey", "n_name")
    )
    ordkeys = o.join(
        F.broadcast(cust_n), o.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "n_name")
    keys = ordkeys.select(F.col("o_orderkey").alias("k"))
    per_order = (
        li.join(F.broadcast(keys), li.l_orderkey == F.col("k"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                _quantize(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rq")
        )
    )
    return (
        per_order.join(ordkeys, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg((F.sum("rq") / 1_000_000.0).cast("double").alias("revenue"))
    )


def main():
    spark = get_spark(
        app_name="exp_q3_j11",
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.locality.wait": "0ms",
            "spark.sql.parquet.columnarReaderBatchSize": "16384",
        },
    )
    specs = all_specs()
    variants = {
        "q3_current": lambda: specs["q3_shipping_priority"].builder(spark, SF),
        "q3_keyonly": lambda: q3_keyonly(spark, SF),
        "q3_shuffle": lambda: q3_shuffle(spark, SF),
        "j11_current": lambda: specs["j11_multiway_star"].builder(spark, SF),
        "j11_keyonly": lambda: j11_keyonly(spark, SF),
    }
    # correctness cross-check first (tiny results)
    ref_q3 = [tuple(r) for r in variants["q3_current"]().collect()]
    ref_j11 = sorted(
        tuple(r) for r in variants["j11_current"]().collect()
    )
    for name in ("q3_keyonly", "q3_shuffle"):
        got = [tuple(r) for r in variants[name]().collect()]
        print(name, "values_match:", got == ref_q3)
    got = sorted(tuple(r) for r in variants["j11_keyonly"]().collect())
    print("j11_keyonly values_match:", got == ref_j11)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, mk in variants.items():  # warm
        mk().write.format("noop").mode("overwrite").save()
    for _ in range(5):
        for k, mk in variants.items():
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
