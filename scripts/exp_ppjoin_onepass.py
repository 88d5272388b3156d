"""Experiment (guide §1, §2.4): fuse the PPJoin general path's three
doc_id-keyed passes (sizes groupBy, rank window, verify collect_set)
into ONE grouped pass whose df-sorted struct array yields size, prefix
ranks (posexplode of the array head) and the verify token array.

Candidate vs current, same session, interleaved min-of-N on the noop
sink, with a full result-equality check first.

Usage: python scripts/exp_ppjoin_onepass.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (  # noqa: E402
    NGRAM_T,
    _int_tokens,
    _shingles,
    ppjoin_pairs,
)
from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402


def ppjoin_pairs_onepass(tok: DataFrame, threshold: float) -> DataFrame:
    """Candidate: one grouped pass replaces sizes + window + verify-sets."""
    toki = _int_tokens(tok)
    per_doc = (
        toki.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tid"))).alias("dt"))
        .select(
            "doc_id",
            F.transform("dt", lambda x: x["tid"]).alias("toks"),
            F.size("dt").alias("n"),
        )
    )
    plen = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    prefix = per_doc.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("toks", F.lit(1), plen.cast("int"))).alias(
            "pos", "tid"
        ),
    ).select("doc_id", "tid", (F.col("pos") + 1).alias("rank"), "n")

    na, nb = F.col("a.n"), F.col("b.n")
    pa, pb = F.col("a.rank"), F.col("b.rank")
    min_overlap = F.ceil(F.lit(threshold) / (1.0 + threshold) * (na + nb))
    ubound = F.least(pa, pb) + F.least(na - pa, nb - pb)
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="tid")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (na >= F.ceil(F.lit(threshold) * nb))
            & (nb >= F.ceil(F.lit(threshold) * na))
            & (ubound >= min_overlap)
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").alias("m"),
            F.max(pa).alias("pamax"),
            F.max(pb).alias("pbmax"),
            F.max(na).alias("gna"),
            F.max(nb).alias("gnb"),
        )
        .filter(
            F.col("m")
            + F.least(
                F.col("gna") - F.col("pamax"), F.col("gnb") - F.col("pbmax")
            )
            >= F.ceil(
                F.lit(threshold)
                / (1.0 + threshold)
                * (F.col("gna") + F.col("gnb"))
            )
        )
        .select("doc_a", "doc_b")
    )
    verified = (
        cand.join(
            per_doc.select(
                F.col("doc_id").alias("doc_a"),
                F.col("toks").alias("toks_a"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            per_doc.select(
                F.col("doc_id").alias("doc_b"),
                F.col("toks").alias("toks_b"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("overlap", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.col("overlap")
            * F.lit(1.0)
            / (F.col("na") + F.col("nb") - F.col("overlap")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="exp_ppjoin_onepass")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, args.sf_dir, "documents")
    sh = _shingles(d)

    cur = ppjoin_pairs(sh, NGRAM_T).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )
    new = ppjoin_pairs_onepass(sh, NGRAM_T).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )

    # equality first
    a = {tuple(r) for r in cur.collect()}
    b = {tuple(r) for r in new.collect()}
    print(f"rows cur={len(a)} new={len(b)} equal={a == b}")
    if a != b:
        print("MISMATCH sample:", list(a - b)[:3], list(b - a)[:3])
        return 1

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(cur)
    noop(new)
    cs, ns = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter(); noop(cur); cs.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(new); ns.append(time.perf_counter() - t0)
    print(f"current : min={min(cs):.3f} all={[round(x,3) for x in cs]}")
    print(f"one-pass: min={min(ns):.3f} all={[round(x,3) for x in ns]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
