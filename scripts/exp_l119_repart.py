"""l119's wall is the TRAIN-side explode+distinct running on the
fixture's single-row-group scan task (2.57 s of the 2.29 s full query
— attribution in exp_tail_attrib).  A/B: pre-explode repartition of
the 5 k-doc split relation (shuffles ~5 MB of text once, parallelizes
the ~1.5 M-bigram explode+concat 32 ways) vs current.  The
exp_shingles_repart refutation (repartition LOSES end-to-end) was for
the PPJoin family whose downstream re-runs the widened stage; l119's
explode feeds a DISTINCT (its own shuffle boundary), so the answer
can differ — measure, don't assume."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.operators import llm_corpus2 as lc  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, repart: bool):
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * lc.SPLIT_HASH) % lc.M32 % 1000
    split = d.withColumn(
        "split", F.when(bucket < 900, "train").otherwise("val")
    )
    if repart:
        split = split.repartition(spark.sparkContext.defaultParallelism)
    p = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(p) - 1),
        lambda i: F.concat_ws(" ", F.element_at(p, i), F.element_at(p, i + 1)),
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
    train_bg = (
        bi.filter(F.col("split") == "train").select("bg").distinct()
        .withColumn("seen", F.lit(1))
    )
    val_bg = bi.filter(F.col("split") == "val").select("source", "bg").distinct()
    return (
        val_bg.join(train_bg, "bg", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_val_bigrams"),
            F.count("seen").alias("covered_bigrams"),
            F.expr("count(seen) * 1000000 div count(*)").alias("coverage_ppm"),
        )
        .orderBy("source")
    )


def steady(df, reps=3):
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_l119_repart")
    spark.sparkContext.setLogLevel("ERROR")
    a = build(spark, sf_dir, False)
    b = build(spark, sf_dir, True)
    eq = sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    print(f"current={steady(a):.2f}s repartitioned={steady(b):.2f}s equal={eq}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
