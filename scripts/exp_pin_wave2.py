"""A/B wave 2 of the pin-the-reused-relation fixes (er3 st, l37 capped,
l21b assigned, l2b sig) against the PREVIOUS code via git stash — this
script only times the CURRENT working tree; run it once before stashing
and once after to compare. Equality is checked against reference rows
captured from the current build (use --save/--check)."""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

QUERIES = [
    "er3_fs_weights",
    "l37_source_overlap",
    "l21b_ivfpq_topk",
    "l2b_minhash_lsh",
    "l2_jaccard_neardup",
    "l23_ngram_jaccard",
    "l81_dedup_threshold_sweep",
    "l84_leakage_free_split",
]


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--rows-out", default=None, help="save result rows JSON")
    ap.add_argument("--rows-check", default=None, help="compare vs saved rows")
    ap.add_argument("--label", default="run")
    args = ap.parse_args()

    from mkpipe_extractor_clickhouse_spark.registry import all_specs
    from mkpipe_extractor_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="exp_pin_wave2")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    dfs = {q: specs[q].builder(spark, args.sf_dir) for q in QUERIES}

    if args.rows_out or args.rows_check:
        rows = {
            q: sorted(sorted(map(repr, r)) for r in
                      ([list(t) for t in df.collect()],))[0]
            for q, df in dfs.items()
        }
        if args.rows_out:
            Path(args.rows_out).write_text(json.dumps(rows))
            print("rows saved")
        if args.rows_check:
            ref = json.loads(Path(args.rows_check).read_text())
            for q in QUERIES:
                ok = sorted(ref[q]) == sorted(rows[q])
                print(f"{q}: rows_equal={ok} n={len(rows[q])}")
                if not ok:
                    return 1

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for df in dfs.values():
        noop(df)
    times = {q: [] for q in QUERIES}
    for _ in range(args.reps):
        for q, df in dfs.items():
            t0 = time.perf_counter(); noop(df); times[q].append(time.perf_counter() - t0)
    tot = 0.0
    for q in QUERIES:
        m = min(times[q]); tot += m
        print(f"{args.label} {q}: min={m:.3f} med={statistics.median(times[q]):.3f}")
    print(f"{args.label} TOTAL min={tot:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
