"""Label propagation (g6): algorithmic parity with a Python reference
on a known-structure graph, plus the broadcast plan lock."""

from __future__ import annotations

from collections import Counter

from mkpipe_extractor_clickhouse_spark.operators.community import (
    LPA_ITERS,
    label_propagation,
)

from .test_plans import plan_of


def _reference_lpa(edges: set[tuple[int, int]], iters: int) -> dict[int, int]:
    nodes = sorted({u for u, _ in edges})
    nbrs = {u: [v for x, v in edges if x == u] for u in nodes}
    lab = {u: u for u in nodes}
    for _ in range(iters):
        new = {}
        for u in nodes:
            c = Counter(lab[v] for v in nbrs[u])
            best = max(c.values())
            new[u] = min(l for l, n in c.items() if n == best)
        lab = new
    return lab


def _barbell() -> set[tuple[int, int]]:
    """Two 4-cliques bridged by a single edge — LPA must find the two
    dense blocks even though CC sees one component."""
    cliq1, cliq2 = [1, 2, 3, 4], [5, 6, 7, 8]
    e = set()
    for grp in (cliq1, cliq2):
        e |= {(a, b) for a in grp for b in grp if a != b}
    e |= {(4, 5), (5, 4)}
    return e


def test_lpa_matches_reference_on_barbell(spark):
    edges = _barbell()
    df = spark.createDataFrame(sorted(edges), ["u", "v"])
    got = {r.v: r.lab for r in label_propagation(df, LPA_ITERS).collect()}
    assert got == _reference_lpa(edges, LPA_ITERS)
    # and the structure is actually detected: exactly two communities
    assert len(set(got.values())) == 2


def test_g6_plan_broadcasts_labels(spark, sf_dir):
    plan = plan_of("g6_label_propagation", spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bfs_matches_reference(spark):
    from mkpipe_extractor_clickhouse_spark.operators.community import (
        bfs_distances,
    )

    # chain 1-2-3-4-5-6 plus a shortcut 1-4: min-dist must use it
    und = {(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 4)}
    edges = sorted(und | {(b, a) for a, b in und})
    df = spark.createDataFrame(edges, ["u", "v"])
    seeds = spark.createDataFrame([(1,)], ["v"])
    got = {r.v: r.d for r in bfs_distances(df, seeds, hops=3).collect()}
    # hand-checked: 1:0, 2:1, 4:1, 3:2, 5:2, 6:3
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3}


def test_g7_plan_no_cartesian(spark, sf_dir):
    plan = plan_of("g7_bfs_hops", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_g8_plan_topk_and_no_cartesian(spark, sf_dir):
    plan = plan_of("g8_link_prediction", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # deterministic top-k cut
