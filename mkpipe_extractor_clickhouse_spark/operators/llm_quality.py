"""Repetition-based document quality filtering — the Gopher rules
(Rae et al. 2021, "Scaling Language Models", §A1.1: drop documents
dominated by repeated n-grams) adapted to the fixtures' token streams.

Per document: bigram duplication fraction (1 − distinct/total), top
bigram frequency fraction, mean word length, alphabetic-token fraction,
and the keep/drop gate. The per-doc n-gram frequency table is built
with explode → (doc, gram) hash aggregation — the shuffle key is the
(doc_id, gram) pair, so the plan is a single map-side-combined
aggregation that scales with corpus size and never materializes a
per-doc map in driver memory. Row-local metrics (word length, charset)
stay in array built-ins inside the scan's codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._cache import ephemeral_cache

# Thresholds: the fixtures' word-soup corpus has bigram dup fractions of
# 0–0.17 (median ~0.03); these split it near the median, mirroring how
# Gopher's 0.2-ish thresholds split web text.
DUP_FRAC_MAX = 0.05
TOP_FRAC_MAX = 0.06


@register(
    "l28_gopher_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
      FROM tok CROSS JOIN LATERAL (
        SELECT UNNEST(RANGE(1, LEN(toks))) AS i
      ) s
    ),
    cnt AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
    ),
    rep AS (
      SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS n_distinct,
             MAX(c) AS top_cnt
      FROM cnt GROUP BY doc_id
    ),
    rowm AS (
      SELECT doc_id,
             CAST(LEN(toks) AS BIGINT) AS n_tokens,
             ROUND(LIST_SUM(LIST_TRANSFORM(toks, t -> LEN(t))) * 1.0
                   / LEN(toks), 6) AS mean_word_len,
             ROUND(LEN(LIST_FILTER(toks, t -> regexp_matches(t, '^[a-z]+$')))
                   * 1.0 / LEN(toks), 6) AS alpha_frac
      FROM tok
    )
    SELECT r.doc_id, r.n_tokens, r.mean_word_len, r.alpha_frac,
           CAST(rep.n_bigrams AS BIGINT) AS n_bigrams,
           ROUND(1.0 - rep.n_distinct * 1.0 / rep.n_bigrams, 6) AS dup_bigram_frac,
           ROUND(rep.top_cnt * 1.0 / rep.n_bigrams, 6) AS top_bigram_frac,
           CAST(1.0 - rep.n_distinct * 1.0 / rep.n_bigrams <= {DUP_FRAC_MAX}
                AND rep.top_cnt * 1.0 / rep.n_bigrams <= {TOP_FRAC_MAX}
                AS BOOLEAN) AS keep
    FROM rowm r JOIN rep USING (doc_id)
    """,
    tags=("EXT", "quality", "L7"),
)
def l28_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: documents whose bigram stream is
    dominated by duplicates (dup fraction > 0.05 or one bigram > 6% of
    the stream) are marked for drop. Every fixture doc has ≥ 2 tokens,
    so the bigram stream is never empty (asserted by the inner join
    against the per-doc bigram counts)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    # Row-local metrics: computed inside the scan stage, no shuffle.
    rowm = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ) * F.lit(1.0) / F.size(toks),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
            * F.lit(1.0)
            / F.size(toks),
            6,
        ).alias("alpha_frac"),
    )

    bigrams = rowm.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            )
        ).alias("gram"),
    )
    rep = (
        bigrams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_cnt"),
        )
    )

    dup_frac = F.lit(1.0) - F.col("n_distinct") * F.lit(1.0) / F.col("n_bigrams")
    top_frac = F.col("top_cnt") * F.lit(1.0) / F.col("n_bigrams")
    return (
        rowm.drop("toks")
        .join(rep, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "mean_word_len",
            "alpha_frac",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(dup_frac, 6).alias("dup_bigram_frac"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
            ((dup_frac <= DUP_FRAC_MAX) & (top_frac <= TOP_FRAC_MAX)).alias(
                "keep"
            ),
        )
    )


# ExactSubstr-style duplicated-span detection (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better": remove
# substrings shared verbatim across documents). The suffix-array form
# is replaced by fixed-length n-gram anchors — every shared substring of
# length >= SPAN_N tokens is covered by at least one shared SPAN_N-gram,
# so per-doc coverage is exact at n-gram granularity.
SPAN_N = 6


@register(
    "l29_dup_span_detect",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, i AS start,
             ARRAY_TO_STRING(toks[i : i + {SPAN_N - 1}], ' ') AS gram
      FROM tok CROSS JOIN LATERAL (
        SELECT UNNEST(RANGE(1, LEN(toks) - {SPAN_N} + 2)) AS i
      ) s
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
    ),
    hits AS (
      SELECT doc_id, start FROM g WHERE gram IN (SELECT gram FROM dup)
    ),
    cov0 AS (
      SELECT doc_id,
             LEAST({SPAN_N}, COALESCE(
               LEAD(start) OVER (PARTITION BY doc_id ORDER BY start) - start,
               {SPAN_N})) AS c
      FROM hits
    ),
    cov AS (
      SELECT doc_id, COUNT(*) AS n_dup_grams, SUM(c) AS dup_tokens
      FROM cov0 GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           ROUND(COALESCE(cov.dup_tokens, 0) * 1.0
                 / LEN(STRING_SPLIT(d.text, ' ')), 6) AS dup_token_frac
    FROM documents d LEFT JOIN cov USING (doc_id)
    """,
    tags=("EXT", "dedup", "L2"),
)
def l29_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span coverage: for every document, the
    number of tokens lying inside a 6-gram that appears verbatim in at
    least one OTHER document — the per-doc signal ExactSubstr dedup cuts
    on. Plan: explode positional 6-grams, one hash aggregation finds
    cross-doc grams, a semi-join marks hit positions, and a per-doc
    window merges overlapping spans into exact union coverage (intervals
    are equal-length, so union length is Σ min(N, next_start − start)).
    Every stage shuffles on (gram) or (doc_id) hash keys — no pairwise
    doc comparison anywhere, so cost is linear in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    # pinned (r12): the cross-doc dictionary (groupBy gram) and the
    # semi-join probe both consume the FULL positional-gram relation —
    # the slice/array_join explode re-executed twice before
    grams = ephemeral_cache(base.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n") >= SPAN_N,
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - SPAN_N + 1),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.array_join(
                            F.slice("toks", i, SPAN_N), " "
                        ).alias("gram"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:int,gram:string>>"))
        ).alias("g"),
    ).select("doc_id", F.col("g.start").alias("start"), F.col("g.gram").alias("gram")))

    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi")

    w = Window.partitionBy("doc_id").orderBy("start")
    cov = (
        hits.withColumn(
            "c",
            F.least(
                F.lit(SPAN_N),
                F.coalesce(
                    F.lead("start").over(w) - F.col("start"), F.lit(SPAN_N)
                ),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_grams"),
            F.sum("c").alias("dup_tokens"),
        )
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) * F.lit(1.0) / F.col("n"), 6
            ).alias("dup_token_frac"),
        )
    )


from .llm_text import _STOP_IN, EN_STOPWORDS  # noqa: E402


@register(
    "l59_gopher_gate",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tok,
             LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0
               / LEN(STRING_SPLIT(text, ' ')) AS ttr,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                             t -> t IN ({_STOP_IN}))) * 1.0
               / LEN(STRING_SPLIT(text, ' ')) AS stop_ratio,
             CAST(n_chars AS DOUBLE)
               / LEN(STRING_SPLIT(text, ' ')) AS mean_word_len
      FROM documents
    )
    SELECT doc_id,
           CONCAT_WS(',',
             CASE WHEN n_tok < 10 THEN 'too_short' END,
             CASE WHEN n_tok > 500 THEN 'too_long' END,
             CASE WHEN ttr <= 0.2 THEN 'repetitive' END,
             CASE WHEN stop_ratio < 0.01 THEN 'no_function_words' END,
             CASE WHEN mean_word_len < 2 OR mean_word_len > 12
                  THEN 'weird_word_len' END
           ) AS fail_reasons,
           CAST(n_tok >= 10 AND n_tok <= 500 AND ttr > 0.2
                AND stop_ratio >= 0.01
                AND mean_word_len >= 2 AND mean_word_len <= 12
             AS BIGINT) AS keep
    FROM m
    """,
    tags=("L7", "EXT", "quality", "pipeline"),
)
def l59_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined Gopher-rules quality GATE — every document gets a
    keep/drop verdict AND the list of failed rules (length bounds,
    type-token repetition, function-word floor, mean-word-length
    band), the audit artifact a curation pipeline stores next to the
    filtered corpus (l11/l28 report the raw metrics; this is the
    decision layer). All row-local array arithmetic on exact integer
    counts — the float ratios compare through identical IEEE chains —
    and CONCAT_WS drops the NULL (passing) rules identically in both
    engines, so the reason strings hash-match. Rides the scan, no
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
        * F.lit(1.0)
        / n_tok
    )
    mwl = F.col("n_chars").cast("double") / n_tok
    keep = (
        (n_tok >= 10)
        & (n_tok <= 500)
        & (ttr > 0.2)
        & (stop_ratio >= 0.01)
        & (mwl >= 2)
        & (mwl <= 12)
    )
    return d.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.when(n_tok < 10, "too_short"),
            F.when(n_tok > 500, "too_long"),
            F.when(ttr <= 0.2, "repetitive"),
            F.when(stop_ratio < 0.01, "no_function_words"),
            F.when((mwl < 2) | (mwl > 12), "weird_word_len"),
        ).alias("fail_reasons"),
        keep.cast("long").alias("keep"),
    )


@register(
    "l68_source_quality_matrix",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             LEN(STRING_SPLIT(text, ' ')) AS n_tok,
             LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0
               / LEN(STRING_SPLIT(text, ' ')) AS ttr,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                             t -> t IN ({_STOP_IN}))) * 1.0
               / LEN(STRING_SPLIT(text, ' ')) AS stop_ratio,
             CAST(n_chars AS DOUBLE)
               / LEN(STRING_SPLIT(text, ' ')) AS mean_word_len
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN n_tok >= 10 AND n_tok <= 500 AND ttr > 0.2
                         AND stop_ratio >= 0.01
                         AND mean_word_len >= 2 AND mean_word_len <= 12
                    THEN 1 ELSE 0 END) AS kept,
           SUM(CASE WHEN n_tok < 10 THEN 1 ELSE 0 END) AS fail_too_short,
           SUM(CASE WHEN ttr <= 0.2 THEN 1 ELSE 0 END) AS fail_repetitive,
           SUM(CASE WHEN stop_ratio < 0.01 THEN 1 ELSE 0 END)
             AS fail_no_function_words
    FROM m GROUP BY source
    """,
    tags=("L7", "EXT", "quality", "dq"),
)
def l68_source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate attribution — the l59 verdicts rolled up per
    SOURCE with per-rule failure counts: which crawl is costing
    coverage and WHY, the report that drives per-source threshold
    tuning and the l46 mixture weights. Same row-local rule
    expressions as l59 (mirrored IEEE ratio comparisons), one
    aggregation, O(sources) output."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tok
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
        * F.lit(1.0)
        / n_tok
    )
    mwl = F.col("n_chars").cast("double") / n_tok
    keep = (
        (n_tok >= 10)
        & (n_tok <= 500)
        & (ttr > 0.2)
        & (stop_ratio >= 0.01)
        & (mwl >= 2)
        & (mwl <= 12)
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(keep.cast("long")).alias("kept"),
        F.sum((n_tok < 10).cast("long")).alias("fail_too_short"),
        F.sum((ttr <= 0.2).cast("long")).alias("fail_repetitive"),
        F.sum((stop_ratio < 0.01).cast("long")).alias(
            "fail_no_function_words"
        ),
    )
