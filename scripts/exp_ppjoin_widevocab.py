"""VERDICT r11 #7: where does the PPJoin mask-array tier genuinely
stop paying?  The tier currently caps at vocab 1024; above it the
general candidate+verify path runs, which measured 92 s at 160 k
docs / vocab 992 before the tier existed.  This experiment builds
SALTED dedup corpora at vocab ~2k and ~4k (reps 64 / 128 of the sf0.1
documents fixture — token-disjoint replicas, so the true pair set is
exactly rep × the per-replica base) and times l2's word-token PPJoin
under BOTH dispatches, pair-count-checked against the rep-linearity
invariant.

Usage: python scripts/exp_ppjoin_widevocab.py [rep ...]  (default 64 128)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.operators import llm_dedup  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402

# per-replica invariant base: l2 pair count of one un-salted replica
# at sf0.1 / threshold 0.9 (the registered l2 threshold)
L2_THRESHOLD = 0.9


def tokens_of(docs):
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()


def main() -> int:
    reps = [int(x) for x in sys.argv[1:]] or [64, 128]
    spark = get_spark(
        app_name="exp_ppjoin_widevocab",
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, str(REPO / "scripts"))
    from bench_scaleup import build_dedup_point  # noqa: E402

    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    base_pairs = llm_dedup.ppjoin_pairs(
        tokens_of(base), L2_THRESHOLD
    ).count()
    print(f"base (rep 1): pairs={base_pairs}")

    results = []
    orig_cap = llm_dedup.PPJOIN_MASK_MAX_VOCAB
    for rep in reps:
        d = build_dedup_point(spark, rep)
        docs = spark.read.parquet(str(d / "documents.parquet"))
        tok = tokens_of(docs)
        vocab = tok.select("token").distinct().count()
        want = rep * base_pairs
        row = {"rep": rep, "docs": docs.count(), "vocab": vocab,
               "expected_pairs": want}
        for label, cap in (("mask_tier", 1 << 20), ("general", 0)):
            llm_dedup.PPJOIN_MASK_MAX_VOCAB = cap
            try:
                t0 = time.perf_counter()
                got = llm_dedup.ppjoin_pairs(tok, L2_THRESHOLD).count()
                sec = round(time.perf_counter() - t0, 1)
                row[label] = {"sec": sec, "pairs": got,
                              "pairs_ok": got == want}
                print(f"rep {rep} vocab {vocab} {label}: {sec}s "
                      f"pairs={got} ok={got == want}", flush=True)
            finally:
                llm_dedup.PPJOIN_MASK_MAX_VOCAB = orig_cap
            spark.catalog.clearCache()
        results.append(row)
    print(json.dumps(results, indent=1))
    Path("/tmp/exp_ppjoin_widevocab.json").write_text(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
