"""Attribute the r12 sweep tail (guide §1.1): time each constituent
subtree of the remaining >1.3 s queries separately, steady min-of-3
noop runs, so the optimization targets the stage that actually costs
— not the plan's most complicated-looking node.

ch_tukey_outliers : percentile aggregate vs fence scan
l119_ngram_coverage: explode+distinct per split vs the join+agg
a9_percentiles    : per-column buffer cost (pre/post single-buffer)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.registry import all_specs  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402


def steady(df, reps: int = 3) -> float:
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_tail_attrib")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # --- ch_tukey_outliers decomposition --------------------------------
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.selectExpr(
        "l_orderkey",
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c",
    )
    q = cents.agg(F.expr("percentile(c, array(0.25, 0.75))").alias("qq"))
    print(f"tukey: percentile agg alone      {steady(q):.3f}s")
    print(f"tukey: cents scan alone          {steady(cents):.3f}s")
    per = cents.groupBy("c").agg(F.count("*").alias("cnt"))
    qw = per.agg(F.expr("percentile(c, array(0.25, 0.75), cnt)").alias("qq"))
    print(f"tukey: collapse+weighted pctl    {steady(qw):.3f}s")
    full = specs["ch_tukey_outliers"].builder(spark, sf_dir)
    print(f"tukey: full query                {steady(full):.3f}s")

    # --- l119 decomposition ---------------------------------------------
    from mkpipe_extractor_clickhouse_spark.operators import llm_corpus2 as lc

    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * lc.SPLIT_HASH) % lc.M32 % 1000
    split = d.withColumn(
        "split", F.when(bucket < 900, "train").otherwise("val")
    )
    p = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(p) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(p, i), F.element_at(p, i + 1)
        ),
    )
    bi = split.select(
        "source",
        "split",
        F.explode(
            F.when(F.size(p) >= 2, grams).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("bg"),
    )
    train_bg = bi.filter(F.col("split") == "train").select("bg").distinct()
    val_bg = (
        bi.filter(F.col("split") == "val").select("source", "bg").distinct()
    )
    print(f"l119: train explode+distinct     {steady(train_bg):.3f}s")
    print(f"l119: val explode+distinct       {steady(val_bg):.3f}s")
    full = specs["l119_ngram_coverage"].builder(spark, sf_dir)
    print(f"l119: full query                 {steady(full):.3f}s")

    # --- a9 (post-change: 2 buffers) --------------------------------------
    full = specs["a9_percentiles"].builder(spark, sf_dir)
    print(f"a9: full query (current code)    {steady(full):.3f}s")

    # --- ch_rank_corr (post-change) ---------------------------------------
    full = specs["ch_rank_corr"].builder(spark, sf_dir)
    print(f"rank_corr: full (current code)   {steady(full):.3f}s")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
