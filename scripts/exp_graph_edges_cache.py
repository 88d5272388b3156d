"""Experiment (guide §5 caching: reuse > recompute): the iterative
graph queries reference the _copurchase_edges subtree (agg + window +
supplier self-join + distinct) once per consumer — nodes, deg, and
every unrolled iteration — so the subtree re-executes ~5x per run.
ephemeral_cache (the repo's leak-free localCheckpoint) computes it
once. A/B per query, same session, alternating reps, equality-checked.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from mkpipe_extractor_clickhouse_spark.operators import community  # noqa: E402
from mkpipe_extractor_clickhouse_spark.operators._cache import (  # noqa: E402
    ephemeral_cache,
)
from mkpipe_extractor_clickhouse_spark.registry import all_specs  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402

QUERIES = [
    "g4_triangle_count",
    "g5_clustering_coefficient",
    "g6_label_propagation",
    "g7_bfs_hops",
    "g8_link_prediction",
    "g9_modularity",
    "g10_pagerank",
    "g11_random_walks",
    "g12_khop_closeness",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="exp_graph_edges_cache")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    orig = community._copurchase_edges
    before = {}
    for q in QUERIES:
        if q in specs:
            before[q] = specs[q].builder(spark, sf_dir)

    community._copurchase_edges = lambda s, d: ephemeral_cache(orig(s, d))
    try:
        after = {q: specs[q].builder(spark, sf_dir) for q in before}
    finally:
        community._copurchase_edges = orig

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for q in before:
        a = {tuple(r) for r in before[q].collect()}
        b = {tuple(r) for r in after[q].collect()}
        print(f"{q}: equal={a == b} n={len(a)}")
        if a != b:
            return 1

    for q in before:
        noop(before[q]); noop(after[q])
    tb = {q: [] for q in before}
    ta = {q: [] for q in before}
    for _ in range(reps):
        for q in before:
            t0 = time.perf_counter(); noop(before[q]); tb[q].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); noop(after[q]); ta[q].append(time.perf_counter() - t0)
    tot_b = tot_a = 0.0
    for q in before:
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
