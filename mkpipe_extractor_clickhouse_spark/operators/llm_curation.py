"""Training-data curation operators: document chunking, corpus
sampling, stratified sampling, text normalization — the remaining
preprocessing stages a pretraining pipeline runs between raw corpus
and tokenizer (alongside dedup/quality/similarity in the sibling
modules).

All chunking/normalization stays in array built-ins (sequence/slice/
array_join) — row-local, no shuffle, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

CHUNK_TOKENS = 16
CHUNK_STRIDE = 8  # 50% overlap


@register(
    "l15_doc_chunking",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
             LEN(STRING_SPLIT(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           ARRAY_TO_STRING(toks[start : LEAST(start + {CHUNK_TOKENS} - 1, n)], ' ')
             AS chunk_text,
           CAST(LEAST(start + {CHUNK_TOKENS} - 1, n) - start + 1 AS BIGINT)
             AS chunk_len
    FROM tok CROSS JOIN LATERAL (
      SELECT UNNEST(RANGE(1, n + 1, {CHUNK_STRIDE})) AS start
    ) s
    WHERE start = 1 OR start + {CHUNK_TOKENS} - 1 <= n + {CHUNK_STRIDE} - 1
    """,
    tags=("EXT", "chunking"),
)
def l15_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (16-token chunks, stride 8 —
    50% overlap), the context-window prep step for LLM training.
    Pure array ops: sequence of starts → slice → join."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    chunks = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk_end = F.least(F.col("start") + CHUNK_TOKENS - 1, F.col("n"))
    return (
        chunks.filter(
            (F.col("start") == 1)
            | (F.col("start") + CHUNK_TOKENS - 1 <= F.col("n") + CHUNK_STRIDE - 1)
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("toks", F.col("start"), chunk_end - F.col("start") + 1), " "
            ).alias("chunk_text"),
            (chunk_end - F.col("start") + 1).cast("long").alias("chunk_len"),
        )
    )


@register(
    "l16_stratified_sample",
    oracle=None,  # sampling is seed/partitioning-dependent → rows-only;
    # per-stratum proportions asserted in tests/test_llm.py
    tags=("EXT", "sampling"),
)
def l16_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling (sampleBy): downsample the dominant
    language, keep the tail — the data-mixing step of corpus curation.
    Returns per-language kept-counts (the mixing report)."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 1.0, "de": 1.0, "fr": 1.0, "zh": 1.0}
    sampled = d.sampleBy("lang", fractions, seed=42)
    return (
        sampled.groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "l17_text_normalize",
    oracle="""
    SELECT doc_id,
           ARRAY_TO_STRING(
             LIST_FILTER(STRING_SPLIT(LOWER(TRIM(text)), ' '),
                         t -> NOT t IN ('the', 'a') AND t <> ''),
             ' ') AS normalized,
           CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(TRIM(text)), ' '),
                                t -> NOT t IN ('the', 'a') AND t <> '')) AS BIGINT)
             AS n_kept_tokens
    FROM documents
    """,
    tags=("EXT", "normalize"),
)
def l17_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization: lowercase, trim, drop stopwords/empties —
    row-local filter-transform over the token array."""
    d = load_table(spark, sf_dir, "documents")
    kept = F.filter(
        F.split(F.lower(F.trim("text")), " "),
        lambda t: ~t.isin("the", "a") & (t != ""),
    )
    return d.select(
        "doc_id",
        F.array_join(kept, " ").alias("normalized"),
        F.size(kept).cast("long").alias("n_kept_tokens"),
    )


@register(
    "a14_approx_percentile",
    oracle=None,  # sketch-based → rows-only (exact a9 is the oracle twin)
    tags=("A9", "A4"),
)
def a14_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (ClickHouse quantileTDigest analogue):
    percentile_approx's mergeable sketch — the 100 TB path where exact
    percentiles would need a full sort; accuracy vs a9 asserted in
    tests/test_llm.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("p90_approx"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
    )
