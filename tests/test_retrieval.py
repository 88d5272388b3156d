"""Invariant tests for the hybrid-retrieval operators (llm_retrieval):
parity with the oracle is covered by test_parity; these pin the
*semantics* — fusion monotonicity for RRF, the diversity trade-off for
MMR — so a refactor can't silently keep hash-parity with a wrong
oracle."""

from __future__ import annotations

from mkpipe_extractor_clickhouse_spark.operators.llm_retrieval import (
    MMR_K,
    RRF_K,
    l97_rrf_hybrid,
    l98_mmr_diverse_topk,
)
from mkpipe_extractor_clickhouse_spark.operators.llm_similarity import (
    TOP_K,
    l3_topk_cosine,
)


def test_rrf_fusion_invariants(spark, sf_dir):
    rows = l97_rrf_hybrid(spark, sf_dir).collect()
    assert len(rows) == RRF_K
    assert [r.fused_rank for r in rows] == list(range(1, RRF_K + 1))
    # fused score strictly follows the integer rank arithmetic
    C = 60
    S = 10**12
    for r in rows:
        want = (S // (C + r.lex_rank) if r.lex_rank else 0) + (
            S // (C + r.dense_rank) if r.dense_rank else 0
        )
        assert abs(r.rrf_score - want / S) < 1e-15
    # a doc present in BOTH lists must outrank a doc whose single rank
    # is no better than both of the dual doc's ranks
    both = [r for r in rows if r.lex_rank and r.dense_rank]
    single = [r for r in rows if (r.lex_rank is None) != (r.dense_rank is None)]
    for b in both:
        worst_b = max(b.lex_rank, b.dense_rank)
        for s in single:
            srank = s.lex_rank or s.dense_rank
            if srank >= worst_b:
                assert b.rrf_score > s.rrf_score


def test_mmr_diversifies_vs_pure_topk(spark, sf_dir):
    sel = l98_mmr_diverse_topk(spark, sf_dir).collect()
    assert len(sel) == MMR_K
    assert [r.sel_rank for r in sel] == list(range(1, MMR_K + 1))
    # relevance of pick 1 is the pool max; later picks trade relevance
    # for diversity, so relevance is NOT required monotone — but every
    # pick must come from the top-20 relevance pool
    rels = [r.relevance for r in sel]
    assert rels[0] == max(rels)
    # the diversified set differs from the pure top-k head (the corpus
    # has near-duplicate clusters near the query, so MMR must swap at
    # least one redundant neighbor out)
    pure = [r.vec_id for r in l3_topk_cosine(spark, sf_dir).collect()][:MMR_K]
    assert {r.vec_id for r in sel} != set(pure)
    assert TOP_K >= MMR_K

def test_mmr_degenerate_pool_of_one(spark, tmp_path):
    """ADVICE r11: a pool with exactly ONE candidate has zero a≠b
    edges; the node rows unioned into the greedy payload must still
    yield that single pick with sel_rank 1 (the oracle's sel1 CTE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = pa.table(
        {
            "vec_id": pa.array([0, 7], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0, 0.0], [0.5, 0.5, 0.0]],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    rows = l98_mmr_diverse_topk(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].sel_rank == 1 and rows[0].vec_id == 7
