"""Hybrid retrieval and diversity re-ranking over the documents +
embeddings tables — the two fusion stages a RAG / training-data
curation pipeline runs AFTER its per-modality retrievers:

* l97: reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09 — the
  standard hybrid-search combiner in Elasticsearch/OpenSearch/Vespa)
  of a lexical BM25 ranking and a dense cosine ranking.  Each side is
  a bounded top-N (WindowGroupLimit / TakeOrderedAndProject — never a
  full-corpus sort), and the fusion is ONE full-outer join of two
  ≤N-row relations, so the fused stage costs nothing at any corpus
  size; all rank→score arithmetic is integer (1e12 div (C+rank)), so
  the fused ordering is bit-identical across engines.
* l98: maximal-marginal-relevance (MMR, Carbonell & Goldstein
  SIGIR'98) diversity selection: greedily pick k items maximizing
  λ·relevance − (1−λ)·max-similarity-to-already-picked.  The greedy
  recursion is inherently sequential in k, but its INPUT is bounded:
  relevance comes from the distributed top-P cosine (the corpus-sized
  work), and the pairwise similarity matrix is a P×P broadcast
  self-join of that pool.  Both tiny relations persist() so the
  k unrolled selection steps (each an orderBy(…).limit(1) over ≤P
  rows) never re-touch the corpus — the same bounded-pool contract a
  production reranker runs under.  Scores are scaled longs
  (10·MMR = 7·rel_q − 3·maxsim_q with λ = 0.7), so every pick and
  tie-break is exact integer arithmetic in both engines.

Reference parity: the reference (mkpipe extractor, __init__.py) ships
rows to warehouses that feed retrieval stacks; these operators are the
engine-side restatement of that downstream consumer's hybrid ranker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import _Q, DSUM, _quantize
from .llm_similarity import QUERY_VEC_ID, _dot, _norm, _vectors, cosine_to_query
from .llm_text import BM25_B, BM25_K1, _tokens

# -- l97 constants ---------------------------------------------------
RRF_QTEXT = "vector join stream table"  # lexical query (corpus vocab)
FUSE_N = 20  # per-retriever candidate depth
RRF_C = 60  # the canonical RRF damping constant
RRF_SCALE = 1_000_000_000_000  # 1e12: integer rank→score arithmetic
RRF_K = 10  # fused results returned

_BM25_ONE_QUERY_SQL = f"""
    qtok AS (
      SELECT DISTINCT UNNEST(STRING_SPLIT('{RRF_QTEXT}', ' ')) AS token
    ),
    tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM doclen) AS avgdl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN (SELECT token FROM qtok)
      GROUP BY doc_id, token
    ),
    dfq AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM tok WHERE token IN (SELECT token FROM qtok) GROUP BY token
    ),
    bm AS (
      SELECT tf.doc_id,
             {DSUM.format(x=f'''LN(1 + (stats.n_docs - dfq.df + 0.5)
               / (dfq.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * doclen.dl / stats.avgdl))''')} AS bm25
      FROM tf
      JOIN dfq USING (token)
      JOIN doclen USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id, rnk AS lex_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM bm
      ) WHERE rnk <= {FUSE_N}
    )
"""

_DENSE_RANK_SQL = f"""
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    q AS (SELECT i, x AS qx FROM v WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT v.vec_id,
             SUM(v.x * q.qx) AS dot,
             SQRT(SUM(v.x * v.x)) AS nv,
             SQRT(SUM(q.qx * q.qx)) AS nq
      FROM v JOIN q USING (i)
      GROUP BY v.vec_id
    ),
    cos AS (
      SELECT vec_id, ROUND(dot / (nv * nq), 6) AS cosine
      FROM dots WHERE vec_id <> {QUERY_VEC_ID}
    ),
    dense AS (
      SELECT vec_id AS doc_id, rnk AS dense_rank FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rnk
        FROM cos
      ) WHERE rnk <= {FUSE_N}
    )
"""


@register(
    "l97_rrf_hybrid",
    oracle=f"""
    WITH {_BM25_ONE_QUERY_SQL},
    {_DENSE_RANK_SQL},
    fused AS (
      SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
             lex.lex_rank, dense.dense_rank,
             COALESCE({RRF_SCALE} // ({RRF_C} + lex.lex_rank), 0)
             + COALESCE({RRF_SCALE} // ({RRF_C} + dense.dense_rank), 0)
               AS rrf_q
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_q DESC, doc_id) AS BIGINT)
             AS fused_rank,
           doc_id, lex_rank, dense_rank,
           CAST(rrf_q / {RRF_SCALE}.0 AS DOUBLE) AS rrf_score
    FROM fused
    ORDER BY rrf_q DESC, doc_id LIMIT {RRF_K}
    """,
    tags=("EXT", "L6", "L3", "W8", "retrieval", "hybrid"),
)
def l97_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-N and cosine top-N fused by reciprocal
    rank (score = Σ 1/(C+rank), C=60).  Plan shape: the lexical side is
    l92's posting-list join + WindowGroupLimit; the dense side is l3's
    broadcast-query cosine + TakeOrderedAndProject; each produces ≤N
    rows, so the FULL OUTER fusion join and the final fused sort are
    constant-size regardless of corpus scale.  Rank contributions are
    exact integers (1e12 div (C+rank)) — the fused order can't drift
    between engines the way a float 1/(60+r) sum could in the last ulp
    (doc_id==vec_id by fixture construction)."""
    d = load_table(spark, sf_dir, "documents")
    # lexical: BM25 for the one query text, bounded to FUSE_N
    tok = _tokens(d).select("doc_id", "token")
    doclen = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    qterms = sorted(set(RRF_QTEXT.split(" ")))
    hit = tok.filter(F.col("token").isin(*qterms))
    tf = hit.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = hit.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    stats = d.agg(F.count("*").cast("double").alias("n_docs")).join(
        doclen.agg((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    addend = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    bm = (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.sum(_quantize(addend)) / 1_000_000.0).cast("double").alias("bm25"))
    )
    # top-N FIRST via orderBy().limit() (TakeOrderedAndProject — a
    # distributed partial top-k, never a one-partition global window
    # over the corpus); the row_number window then ranks ≤N rows.
    lex = (
        bm.orderBy(F.desc("bm25"), "doc_id")
        .limit(FUSE_N)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "lex_rank")
    )
    # dense: cosine to the query vector, bounded to FUSE_N
    dense = (
        cosine_to_query(spark, sf_dir)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(FUSE_N)
        .withColumn(
            "dense_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), "vec_id"))
            .cast("long"),
        )
        .select(F.col("vec_id").alias("doc_id"), "dense_rank")
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_C} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_C} + dense_rank)"), F.lit(0)
            )
        ).alias("rrf_q"),
    )
    w = Window.orderBy(F.desc("rrf_q"), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= RRF_K)
        .select(
            "fused_rank",
            "doc_id",
            "lex_rank",
            "dense_rank",
            (F.col("rrf_q") / float(RRF_SCALE)).cast("double").alias("rrf_score"),
        )
        .orderBy("fused_rank")
    )


# -- l98 constants ---------------------------------------------------
MMR_POOL = 20  # relevance pool depth (the distributed stage's output)
MMR_K = 5  # diversified picks
# λ = 0.7 → 10·score = 7·rel_q − 3·maxsim_q, exact in scaled longs.
MMR_LAMBDA_NUM, MMR_DIV_NUM = 7, 3

_MMR_POOL_SQL = f"""
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range(1, 65) t(i)
    ),
    q AS (SELECT i, x AS qx FROM v WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT v.vec_id,
             SUM(v.x * q.qx) AS dot,
             SQRT(SUM(v.x * v.x)) AS nv,
             SQRT(SUM(q.qx * q.qx)) AS nq
      FROM v JOIN q USING (i)
      GROUP BY v.vec_id
    ),
    pool AS (
      SELECT vec_id,
             {_Q.format(x='dot / (nv * nq)')} AS rel_q
      FROM dots WHERE vec_id <> {QUERY_VEC_ID}
      ORDER BY rel_q DESC, vec_id LIMIT {MMR_POOL}
    ),
    pv AS (
      SELECT v.vec_id, v.i, v.x FROM v JOIN pool USING (vec_id)
    ),
    sims AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             {_Q.format(
                 x='SUM(a.x * b.x) / '
                 '(SQRT(SUM(a.x * a.x)) * SQRT(SUM(b.x * b.x)))'
             )} AS sim_q
      FROM pv a JOIN pv b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
"""


def _mmr_step_sql(step: int) -> str:
    """CTE pair for greedy step ``step`` (2-based): score every
    unpicked pool row as 7·rel_q − 3·max(sim to picked), pick the max
    (vec_id tie-break)."""
    prev = f"sel{step - 1}"
    return f"""
    cand{step} AS (
      SELECT p.vec_id, p.rel_q,
             {MMR_LAMBDA_NUM} * p.rel_q
             - {MMR_DIV_NUM} * (
                 SELECT MAX(s.sim_q) FROM sims s
                 WHERE s.a = p.vec_id
                   AND s.b IN (SELECT vec_id FROM {prev})
               ) AS score_q
      FROM pool p
      WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
    ),
    pick{step} AS (
      SELECT {step} AS sel_rank, vec_id, rel_q FROM cand{step}
      ORDER BY score_q DESC, vec_id LIMIT 1
    ),
    sel{step} AS (SELECT * FROM sel{step - 1} UNION ALL
                  SELECT * FROM pick{step})
    """


_MMR_STEPS_SQL = ",".join(_mmr_step_sql(s) for s in range(2, MMR_K + 1))


@register(
    "l98_mmr_diverse_topk",
    oracle=f"""
    WITH {_MMR_POOL_SQL},
    sel1 AS (
      SELECT 1 AS sel_rank, vec_id, rel_q FROM pool
      ORDER BY rel_q DESC, vec_id LIMIT 1
    ),
    {_MMR_STEPS_SQL}
    SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id,
           CAST(rel_q / 1000000.0 AS DOUBLE) AS relevance
    FROM sel{MMR_K} ORDER BY sel_rank
    """,
    tags=("EXT", "L3", "L4", "retrieval", "diversity"),
)
def l98_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank: from the top-{MMR_POOL} cosine pool, pick
    {MMR_K} items greedily maximizing λ·relevance − (1−λ)·max-sim-to-
    picked (λ=0.7).  The corpus-sized work is exactly the l3/l4 top-k
    (distributed, bounded output); the greedy selection then runs over
    a BOUNDED payload — the P·(P−1) ordered pool pairs with their
    quantized cosines and the a-side relevance, plus one node row per
    pool member — inside ONE
    single-group applyInPandas task.  Pool NODES ship as explicit
    rows (null b/sim_q) alongside the pair edges, so a degenerate
    pool of one candidate — which has zero a≠b edges — still yields
    its single pick exactly like the oracle's sel1 CTE (ADVICE r11).
    r11: this replaces k unrolled
    orderBy().limit(1) DataFrame steps whose lineage re-derived every
    previous pick per step — O(k²) tiny jobs whose scheduling overhead
    dominated (7–14 s in-sweep vs ~0.5 s now) — and drops the two
    session-lifetime persist() leaks. All scoring is scaled-long
    integer (10·MMR = 7·rel_q − 3·maxsim_q) in plain Python ints, so
    picks and tie-breaks are engine-exact against the unrolled-CTE
    DuckDB oracle."""
    vecs = _vectors(spark, sf_dir)
    rel = cosine_to_query(spark, sf_dir).select(
        "vec_id", _quantize("cosine").alias("rel_q")
    )
    pool = rel.orderBy(F.desc("rel_q"), "vec_id").limit(MMR_POOL)
    pv = vecs.join(F.broadcast(pool), "vec_id").select(
        "vec_id", "rel_q", "v"
    )
    a = pv.select(
        F.col("vec_id").alias("a"),
        F.col("rel_q").alias("rel_a"),
        F.col("v").alias("va"),
    )
    b = pv.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    nodes = pv.select(
        F.col("vec_id").alias("a"),
        F.col("rel_q").alias("rel_a"),
        F.lit(None).cast("long").alias("b"),
        F.lit(None).cast("long").alias("sim_q"),
        F.lit(0).alias("g"),
    )
    edges = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"))
        .select(
            "a",
            "rel_a",
            "b",
            _quantize(
                _dot("va", "vb") / (_norm("va") * _norm("vb"))
            ).alias("sim_q"),
            F.lit(0).alias("g"),
        )
        .unionByName(nodes)
    )

    def greedy(pdf):
        import pandas as pd

        relq: dict[int, int] = {}
        sim: dict[tuple[int, int], int] = {}
        for r in pdf.itertuples(index=False):
            va = int(r.a)
            relq[va] = int(r.rel_a)
            if pd.isna(r.b):  # node row: registers the candidate only
                continue
            sim[(va, int(r.b))] = int(r.sim_q)
        remaining = sorted(relq, key=lambda v: (-relq[v], v))
        picked = [remaining.pop(0)] if remaining else []
        while remaining and len(picked) < MMR_K:
            nxt = min(
                remaining,
                key=lambda v: (
                    -(
                        MMR_LAMBDA_NUM * relq[v]
                        - MMR_DIV_NUM * max(sim[(v, p)] for p in picked)
                    ),
                    v,
                ),
            )
            remaining.remove(nxt)
            picked.append(nxt)
        return pd.DataFrame(
            {
                "sel_rank": range(1, len(picked) + 1),
                "vec_id": picked,
                "relevance": [relq[v] / 1_000_000.0 for v in picked],
            }
        )

    return (
        edges.groupBy("g")
        .applyInPandas(greedy, "sel_rank long, vec_id long, relevance double")
        .orderBy("sel_rank")
    )
