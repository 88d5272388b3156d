"""Experiment: ephemeral_cache the (doc_id, tid, df) integer-token
relation that every PPJoin variant re-derives per consumer (the
documents scan + tokenize/shingle + dict join re-executes 5-24x per
query, plan audit r12). A/B per query, same session, equality-checked.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from mkpipe_extractor_clickhouse_spark.operators import llm_dedup  # noqa: E402
from mkpipe_extractor_clickhouse_spark.operators._cache import (  # noqa: E402
    ephemeral_cache,
)
from mkpipe_extractor_clickhouse_spark.registry import all_specs  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402

QUERIES = [
    "l2_jaccard_neardup",
    "l23_ngram_jaccard",
    "l71_shingle_containment",
    "l81_dedup_threshold_sweep",
    "l84_leakage_free_split",
    "l22_curation_pipeline",
    "l90_curation_waterfall",
    "x7_incremental_neardup",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="exp_toki_cache")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    orig = llm_dedup._int_tokens
    before = {q: specs[q].builder(spark, sf_dir) for q in QUERIES}
    llm_dedup._int_tokens = lambda tok: ephemeral_cache(orig(tok))
    try:
        after = {q: specs[q].builder(spark, sf_dir) for q in QUERIES}
    finally:
        llm_dedup._int_tokens = orig

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for q in QUERIES:
        a = {tuple(r) for r in before[q].collect()}
        b = {tuple(r) for r in after[q].collect()}
        print(f"{q}: equal={a == b} n={len(a)}")
        if a != b:
            return 1

    for q in QUERIES:
        noop(before[q]); noop(after[q])
    tb = {q: [] for q in QUERIES}
    ta = {q: [] for q in QUERIES}
    for _ in range(reps):
        for q in QUERIES:
            t0 = time.perf_counter(); noop(before[q]); tb[q].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); noop(after[q]); ta[q].append(time.perf_counter() - t0)
    tot_b = tot_a = 0.0
    for q in QUERIES:
        mb, ma = min(tb[q]), min(ta[q])
        tot_b += mb; tot_a += ma
        print(
            f"{q}: before min={mb:.3f} med={statistics.median(tb[q]):.3f} | "
            f"after min={ma:.3f} med={statistics.median(ta[q]):.3f}"
        )
    print(f"TOTAL min: before={tot_b:.3f} after={tot_a:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
