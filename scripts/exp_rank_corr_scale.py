"""A/B ch_rank_corr's two shapes at 600 k (sf0.1) and 12 M rows
(rep-20 replication): the pre-r12 per-row unpartitioned rank windows
(4 chained single-partition sorts of every row) vs the closed-form
midrank over per-value counts (serial step O(distinct), row-scale
stages partial→final).  Equality-checked at both points.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402


def moments(r: DataFrame) -> DataFrame:
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    rho = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return s.select(F.col("n"), F.round(rho, 6).alias("spearman_rho"))


def old_shape(li: DataFrame) -> DataFrame:
    rx = (
        2 * F.rank().over(Window.orderBy("l_quantity"))
        + F.count("*").over(Window.partitionBy("l_quantity"))
        - 1
    )
    ry = (
        2 * F.rank().over(Window.orderBy("l_extendedprice"))
        + F.count("*").over(Window.partitionBy("l_extendedprice"))
        - 1
    )
    return moments(li.select(rx.alias("rx"), ry.alias("ry")))


def new_shape(li: DataFrame) -> DataFrame:
    def midranks(col: str, alias: str) -> DataFrame:
        per = li.groupBy(col).agg(F.count("*").alias("c"))
        cum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return per.select(
            col, (2 * F.sum("c").over(cum) - F.col("c") + 1).alias(alias)
        )

    r = (
        li.select("l_quantity", "l_extendedprice")
        .join(F.broadcast(midranks("l_quantity", "rx")), "l_quantity")
        .join(F.broadcast(midranks("l_extendedprice", "ry")), "l_extendedprice")
        .select("rx", "ry")
    )
    return moments(r)


def steady(df, reps=3):
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> int:
    spark = get_spark(
        app_name="exp_rank_corr_scale",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    li01 = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    rep = 20
    big = (
        li01.crossJoin(
            F.broadcast(spark.range(rep).select(F.col("id").alias("__rep")))
        )
        # jitter prices per replica so the distinct count scales the way
        # a larger SF's would (unique doubles), quantity stays 1..50
        .select(
            "l_quantity",
            (F.col("l_extendedprice") + F.col("__rep") / 1000.0).alias(
                "l_extendedprice"
            ),
        )
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="rank_corr_scale_")
    big.repartition(32).write.mode("overwrite").parquet(f"{d}/li.parquet")
    big = spark.read.parquet(f"{d}/li.parquet")

    for label, li in (("600k (sf0.1)", li01), (f"{600_000*rep/1e6:.0f}M", big)):
        a = old_shape(li)
        b = new_shape(li)
        eq = [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
        ta, tb = steady(a), steady(b)
        print(
            f"{label}: old(windows)={ta:.2f}s new(midrank)={tb:.2f}s "
            f"equal={eq}",
            flush=True,
        )
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
