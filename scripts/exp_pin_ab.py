"""One-shot A/B of the r12 relation pins (eager localCheckpoint) vs
no-pin, under the HONEST timed region (rebuild + execute per rep).

Motivation: the pin waves were originally scored with the pre-r12
steady protocol (re-execution of a built DataFrame), which excludes
build-time checkpoint compute — so their commit-message numbers
overstate the win, and for single-pass consumers the pin could even be
a one-shot LOSS (checkpoint write + lost exchange reuse). This script
settles it per query: run once with pins live, once with
SPARK_GRAFT_NO_PIN=1 (correctness pins marked required=True stay live
in both arms), same protocol, same session shape.

Usage:
    python scripts/exp_pin_ab.py [--sf-dir DIR] [names...]
    # orchestrates BOTH arms as subprocesses and prints the table

    SPARK_GRAFT_NO_PIN=1 python scripts/exp_pin_ab.py --arm ...
    # (internal) one arm
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# every registered query whose builder (transitively) hits a
# non-required ephemeral_cache site, grouped by pin family
DEFAULT_QUERIES = [
    # PPJoin joined-relation pin (_int_tokens second pin)
    "l2_jaccard_neardup", "l23_ngram_jaccard", "l81_dedup_threshold_sweep",
    "l84_leakage_free_split", "l71_shingle_containment", "l22_curation_pipeline",
    "l90_curation_waterfall", "l111_dedup_transitivity_audit",
    # graph edge pin
    "g4_triangle_count", "g7_bfs_hops", "g9_modularity", "g10_pagerank",
    "g11_random_walks",
    # minhash/simhash family pins
    "l2b_minhash_lsh", "l2b_portable", "l58_minhash_portable",
    "l2e_portable", "l2e_simhash_pairs", "l112_minhash_estimator_error",
    "l75_source_minhash_overlap",
    # single-relation pins
    "er1_fuzzy_entity_clusters", "l37_source_overlap", "l70_shingle_novelty",
    "l113_novelty_decay", "l29_dup_span_detect", "q24_basket_lift",
    "a25_kmv_overlap", "er3_fs_weights", "l21b_ivfpq_topk",
    "l107_power_iteration", "l119_ngram_coverage", "l109_doremi_mixture",
]


def run_arm(sf_dir: str, names: list[str]) -> dict[str, float]:
    from mkpipe_extractor_clickhouse_spark.registry import all_specs
    from mkpipe_extractor_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="exp_pin_ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out: dict[str, float] = {}
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = specs[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        out[name] = round(min(reps), 3)
        print(f"{out[name]:8.3f}s  {name}", flush=True)
        spark.catalog.clearCache()
    return out


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--arm", action="store_true")
    ap.add_argument("--out", default="/tmp/exp_pin_ab.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES

    if args.arm:
        res = run_arm(args.sf_dir, names)
        print("ARM_RESULT " + json.dumps(res))
        return 0

    results = {}
    for label, env_val in (("pinned", None), ("nopin", "1")):
        env = dict(os.environ)
        if env_val:
            env["SPARK_GRAFT_NO_PIN"] = env_val
        else:
            env.pop("SPARK_GRAFT_NO_PIN", None)
        p = subprocess.run(
            [sys.executable, __file__, "--arm", "--sf-dir", args.sf_dir,
             *names],
            env=env, capture_output=True, text=True, check=False,
        )
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("ARM_RESULT ")]
        if not line:
            print(p.stdout[-3000:], p.stderr[-3000:])
            return 1
        results[label] = json.loads(line[-1][len("ARM_RESULT "):])
        print(f"== arm {label}: total "
              f"{sum(results[label].values()):.1f}s", flush=True)
    table = {
        n: {"pinned": results["pinned"][n], "nopin": results["nopin"][n],
            "delta": round(results["pinned"][n] - results["nopin"][n], 3)}
        for n in names if n in results["pinned"] and n in results["nopin"]
    }
    payload = {"sf_dir": args.sf_dir, "protocol":
               "min-of-2 one-shot (rebuild+execute) per arm, warmup "
               "discarded; arms are separate processes; required "
               "(correctness) pins live in both arms", "queries": table}
    Path(args.out).write_text(json.dumps(payload, indent=1))
    for n, r in sorted(table.items(), key=lambda kv: kv[1]["delta"]):
        print(f"{r['pinned']:7.2f} pinned {r['nopin']:7.2f} nopin "
              f"{r['delta']:+7.2f}  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
