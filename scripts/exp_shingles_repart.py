"""Experiment (guide §2.5 input skew / §3.3 explode-late): the shingle
explode runs on ONE task (single-row-group fixture). Repartition the
pre-explode text relation by doc_id so the 200x explode + per-doc dedup
parallelizes; hash(doc_id) also satisfies the (doc_id, token) distinct
without a second exchange."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (  # noqa: E402
    NGRAM_T,
    _shingles,
    ppjoin_pairs,
)
from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402
from scripts.exp_ppjoin_onepass import ppjoin_pairs_onepass  # noqa: E402


def shingles_repart(docs: DataFrame, p: int) -> DataFrame:
    t = F.split("text", " ")
    idx = F.when(
        F.size(t) >= 3, F.sequence(F.lit(1), F.size(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.repartition(p, "doc_id")
        .select("doc_id", F.explode(idx).alias("i"), t.alias("t"))
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("t", F.col("i")),
                F.element_at("t", F.col("i") + 1),
                F.element_at("t", F.col("i") + 2),
            ).alias("token"),
        )
        .distinct()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_shingles_repart")
    spark.sparkContext.setLogLevel("ERROR")
    p = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents")

    cur = _shingles(d)
    new = shingles_repart(d, p)
    a = {tuple(r) for r in cur.collect()}
    b = {tuple(r) for r in new.collect()}
    print(f"shingle equal={a == b} n={len(a)}")
    print("new shingles plan (exchanges):")
    for line in new._jdf.queryExecution().executedPlan().toString().split("\n"):
        if "Exchange" in line or "HashAggregate" in line:
            print("  ", line.strip()[:110])

    variants = {
        "sh_current": cur,
        "sh_repart": new,
        "l23_current": ppjoin_pairs(_shingles(d), NGRAM_T),
        "l23_repart_cur_ppjoin": ppjoin_pairs(shingles_repart(d, p), NGRAM_T),
        "l23_repart_onepass": ppjoin_pairs_onepass(shingles_repart(d, p), NGRAM_T),
    }
    r1 = {tuple(r) for r in variants["l23_current"].collect()}
    r3 = {tuple(r) for r in variants["l23_repart_onepass"].collect()}
    print(f"l23 equal={r1 == r3} n={len(r1)}")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for df in variants.values():
        noop(df)
    times = {k: [] for k in variants}
    for _ in range(5):
        for name, df in variants.items():
            t0 = time.perf_counter(); noop(df); times[name].append(time.perf_counter() - t0)
    for name in variants:
        print(f"{name}: min={min(times[name]):.3f} all={[round(x,3) for x in times[name]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
