"""Fuzzy edit-distance join (j19): blocking completeness + plan lock.

The q-gram count filter must be COMPLETE — every true pair (edit
distance ≤ t) must survive blocking — or the operator silently drops
matches at scale where no oracle will catch it. The brute-force check
here runs on a crafted vocabulary that exercises the boundary cases:
substitutions, insertions, deletions, edits at either end, and edits
that cross token boundaries (space deletion merging two words).
"""

from __future__ import annotations

import itertools

import pytest

from mkpipe_extractor_clickhouse_spark.operators.fuzzy_join import (
    qgram_fuzzy_pairs,
)

from .test_plans import plan_of


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


VOCAB = [
    "cold anvil",
    "old anvil",       # 1 deletion at the start
    "cold anvils",     # 1 insertion at the end
    "coldanvil",       # space deletion (crosses the token boundary)
    "gold anvil",      # substitution
    "bold hammer",
    "old hammer",
    "small gizmo",
    "small gizmos",
    "smallgizmo",
    "entirely other",
]


def test_blocking_is_complete(spark):
    names = spark.createDataFrame([(n,) for n in VOCAB], ["name"])
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in qgram_fuzzy_pairs(names, "name").collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(set(VOCAB)), 2):
        d = _lev(a, b)
        if 1 <= d <= 2:
            want.add((a, b, d))
    assert got == want
    assert want, "fixture must exercise at least one true pair"


def test_spark_levenshtein_matches_reference(spark):
    """Spark's levenshtein must be the classic unit-cost DP the oracle
    (DuckDB) also implements — pin a few asymmetric cases."""
    import pyspark.sql.functions as F

    cases = [(a, b) for a in VOCAB for b in VOCAB]
    df = spark.createDataFrame(cases, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    for r in df.collect():
        assert r.d == _lev(r.a, r.b), (r.a, r.b)


def test_j19_plan_has_no_cartesian(spark, sf_dir):
    """Candidate generation must be the gram equi-join — an all-pairs
    fallback (cartesian / broadcast nested loop) is the exact failure
    mode the operator exists to avoid."""
    plan = plan_of("j19_fuzzy_edit_join", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_er1_plan_no_cartesian(spark, sf_dir):
    """The entity-cluster pipeline (blocked pairs + CC + count joins)
    must stay cartesian-free end to end."""
    plan = plan_of("er1_fuzzy_entity_clusters", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_j19c_fastss_plan_no_cartesian(spark, sf_dir):
    """FastSS deletion-neighborhood blocking must also stay an
    equi-join end to end — the variant-key join is the whole point."""
    plan = plan_of("j19c_fastss_pairs", spark, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_fastss_agrees_with_edjoin(spark):
    """Three complete blocking schemes, one truth: FastSS must produce
    exactly the q-gram count-filter pair set on the mutation corpus."""
    import random

    from mkpipe_extractor_clickhouse_spark.operators.fuzzy_join import (
        _edjoin_verify,
        _short_pairs,
    )

    rng = random.Random(7)
    alpha = "abcdef "
    vocab = sorted({
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    } - {""})
    names = spark.createDataFrame([(n,) for n in vocab], ["name"])
    fastss = {
        (r.name_a, r.name_b, r.dist)
        for r in _edjoin_verify(_short_pairs(names, 2), 2).collect()
    }
    qgram = {
        (r.name_a, r.name_b, r.dist)
        for r in qgram_fuzzy_pairs(names, "name").collect()
    }
    assert fastss == qgram
    assert len(fastss) > 10, "fixture must be pair-rich"


def test_edjoin_blocking_is_complete(spark):
    """Ed-Join prefix filter must agree with brute force on a mutation-
    rich corpus: random single/double edits of base strings (the true-
    pair generator), plus sub-q-length strings that only the sentinel
    padding keeps visible to gram blocking."""
    import random

    from mkpipe_extractor_clickhouse_spark.operators.fuzzy_join import (
        edjoin_fuzzy_pairs,
    )

    rng = random.Random(42)
    alpha = "abcdefgh "
    bases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(5, 14)))
        for _ in range(40)
    ]

    def mutate(s: str) -> str:
        ops = rng.randint(1, 2)
        for _ in range(ops):
            i = rng.randrange(max(len(s), 1))
            kind = rng.choice("sid")
            if kind == "s" and s:
                s = s[:i] + rng.choice(alpha) + s[i + 1 :]
            elif kind == "i":
                s = s[:i] + rng.choice(alpha) + s[i:]
            elif s:
                s = s[:i] + s[i + 1 :]
        return s

    vocab = sorted(
        {b for b in bases}
        | {mutate(b) for b in bases for _ in range(2)}
        | {"ab", "ac", "a", "abc"}
    )
    vocab = [v for v in vocab if v]
    names = spark.createDataFrame([(n,) for n in vocab], ["name"])
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in edjoin_fuzzy_pairs(names, "name").collect()
    }
    want = set()
    for a, b in itertools.combinations(vocab, 2):
        d = _lev(a, b)
        if 1 <= d <= 2:
            want.add((a, b, d))
    missed = want - got
    extra = got - want
    assert not missed, f"prefix filter dropped true pairs: {sorted(missed)[:5]}"
    assert not extra, f"false positives past verify: {sorted(extra)[:5]}"
    assert len(want) > 40, "fixture must be pair-rich"


def test_short_strings_sharing_zero_grams(spark):
    """Strings below the gram-count bound's minimum length can be within
    t edits while sharing ZERO q-grams ('ab'/'cd' at q=2, t=2: both
    grams differ) — the equi-join alone would never generate the pair.
    Both blocking schemes must route such pairs through the all-pairs
    short branch and still agree exactly with brute force."""
    from mkpipe_extractor_clickhouse_spark.operators.fuzzy_join import (
        edjoin_fuzzy_pairs,
    )

    vocab = ["ab", "cd", "ef", "abcd", "abce", "x", "xy", "wxyz", "klmno"]
    names = spark.createDataFrame([(n,) for n in vocab], ["name"])
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(vocab), 2)
        if 1 <= _lev(a, b) <= 2
    }
    assert ("ab", "cd", 2) in want, "fixture must hit the zero-share case"
    for fn in (qgram_fuzzy_pairs, edjoin_fuzzy_pairs):
        rows = fn(names, "name").collect()
        got = [(r.name_a, r.name_b, r.dist) for r in rows]
        assert len(got) == len(set(got)), f"{fn.__name__} emitted duplicates"
        assert set(got) == want, f"{fn.__name__}: {set(got) ^ want}"


def test_blocking_quality_bounds(spark, sf_dir):
    """er2: both Christen metrics are valid ppm; candidates can't
    exceed all-pairs; hits can't exceed truth."""
    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    r = (
        all_specs()["er2_blocking_quality"]
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert 0 <= r.pairs_completeness_ppm <= 1_000_000
    assert 0 <= r.reduction_ratio_ppm <= 1_000_000
    assert r.n_candidates <= r.n_names * (r.n_names - 1) // 2
