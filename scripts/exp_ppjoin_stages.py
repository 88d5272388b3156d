"""Attribute l23's wall to pipeline stages (guide §1): time successive
prefixes of the PPJoin pipeline with the noop sink, interleaved."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (  # noqa: E402
    NGRAM_T,
    _int_tokens,
    _shingles,
)
from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402
from scripts.exp_ppjoin_onepass import ppjoin_pairs_onepass  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_ppjoin_stages")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")

    def build():
        sh = _shingles(d)
        toki = _int_tokens(sh)
        per_doc = (
            toki.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("df", "tid"))).alias("dt"))
            .select(
                "doc_id",
                F.transform("dt", lambda x: x["tid"]).alias("toks"),
                F.size("dt").alias("n"),
            )
        )
        plen = F.col("n") - F.ceil(F.lit(NGRAM_T) * F.col("n")) + 1
        prefix = per_doc.select(
            "doc_id", "n",
            F.posexplode(F.slice("toks", F.lit(1), plen.cast("int"))).alias("pos", "tid"),
        ).select("doc_id", "tid", (F.col("pos") + 1).alias("rank"), "n")
        na, nb = F.col("a.n"), F.col("b.n")
        pa, pb = F.col("a.rank"), F.col("b.rank")
        min_overlap = F.ceil(F.lit(NGRAM_T) / (1.0 + NGRAM_T) * (na + nb))
        ubound = F.least(pa, pb) + F.least(na - pa, nb - pb)
        cand = (
            prefix.alias("a").join(prefix.alias("b"), on="tid")
            .filter(
                (F.col("a.doc_id") < F.col("b.doc_id"))
                & (na >= F.ceil(F.lit(NGRAM_T) * nb))
                & (nb >= F.ceil(F.lit(NGRAM_T) * na))
                & (ubound >= min_overlap)
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("m"))
            .select("doc_a", "doc_b")
        )
        full = ppjoin_pairs_onepass(_shingles(d), NGRAM_T)
        return {
            "1_shingles": sh,
            "2_int_tokens": toki,
            "3_per_doc": per_doc,
            "4_prefix": prefix,
            "5_cand": cand,
            "6_full": full,
        }

    stages = build()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, df in stages.items():
        noop(df)  # warm
    times = {k: [] for k in stages}
    for _ in range(5):
        for name, df in stages.items():
            t0 = time.perf_counter(); noop(df); times[name].append(time.perf_counter() - t0)
    for name in stages:
        print(f"{name}: min={min(times[name]):.3f} all={[round(x,3) for x in times[name]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
