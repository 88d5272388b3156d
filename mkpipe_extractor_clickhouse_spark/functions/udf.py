"""UDF / UDAF / UDTF surface (SURVEY §2.10 D1-D4).

The reference defines no UDFs — its custom logic is SQL strings
(reference ``mkpipe_extractor_clickhouse/__init__.py:96-99``) — and
this engine keeps that philosophy: built-ins first (they stay inside
whole-stage codegen). These operators exist to *expose the surface*
and to document its cost model:

  D1 row-at-a-time Python UDF — escape hatch only (per-row Py4J-free
     but pickled batches; ~10-100× slower than built-ins);
  D2 pandas_udf — Arrow-vectorized, the sanctioned Python fast path;
  D3 mapInPandas/mapInArrow — exercised by l4_distributed_topk and
     m1_multimodal_features;
  D4 applyInPandas — grouped-map "UDAF" (one output row per group).

D2/D4 produce deterministic numerics (quantized like _determinism),
so they carry full oracles — proving the Python path agrees with the
SQL engine bit-for-bit, not just "runs".
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register


@register(
    "d1_scalar_udf",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 25 THEN 'cold'
                WHEN value < 75 THEN 'warm' ELSE 'hot' END AS band_udf
    FROM events
    """,
    tags=("D1",),
)
def d1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept off hot paths —
    identical logic is expressible as F.when, see f4_conditional_null)."""

    # no type hints on purpose: pyspark tries (and fails) to infer the
    # eval type from them when returnType is also given, warning noisily
    @F.udf(returnType=T.StringType())
    def band(v):
        if v < 25:
            return "cold"
        if v < 75:
            return "warm"
        return "hot"

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", band("value").alias("band_udf"))


@register(
    "d2_pandas_udf",
    oracle="""
    SELECT event_id,
           CAST(ROUND(SQRT(value) * 100) AS BIGINT) AS scaled_sqrt
    FROM events
    """,
    tags=("D2",),
)
def d2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (Series→Series): NumPy sqrt is
    IEEE-identical to the engines' sqrt, and the result is quantized
    to an integer — so even the Python path hash-matches the oracle."""
    import numpy as np

    @F.pandas_udf(T.LongType())
    def scaled_sqrt(v: pd.Series) -> pd.Series:
        # half-away-from-zero to match SQL ROUND (np.round is banker's)
        y = np.sqrt(v.to_numpy()) * 100
        out = np.trunc(y + np.copysign(0.5, y))
        return pd.Series(out.astype("int64"))

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", scaled_sqrt("value").alias("scaled_sqrt"))


@register(
    "d4_grouped_map_udaf",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(TRUNC(value * 1000000
                 + (CASE WHEN value >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT))
                / 1000000.0 AS DOUBLE) AS total_value,
           MAX(event_id) AS last_event
    FROM events
    GROUP BY user_id
    """,
    tags=("D4",),
)
def d4_grouped_map_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: one output row per group,
    computed in pandas with the same 1e-6 quantization discipline as
    the JVM aggregates (exact integer sums → order-independent).

    The explicit repartition(defaultParallelism, user_id) pins the
    Python stage's parallelism (VERDICT r11): a grouped-map stage is
    PYTHON-CALL-bound (one call per group), but AQE sizes reduce
    partitions by BYTES — at sf0.1 it coalesced the ~2 MB shuffle to
    ONE partition and serialized all 1500 group calls on one core
    (3.9 s; 0.93 s once pinned, measured steady noop-sink).  AQE never
    coalesces a user-specified repartition with explicit N, and the
    hash-on-key repartition satisfies the applyInPandas clustering
    requirement, so no second exchange appears.  Same rule a 1000-
    executor cluster needs: partition grouped-map stages by group
    count, not bytes.  (The at-scale alternative when per-group state
    merges associatively — no full-group materialization at all — is
    t13's two-phase mapInArrow partial + native merge,
    streaming/batch_equiv.py.)"""
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_event", T.LongType()),
        ]
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        y = pdf["value"].to_numpy() * 1_000_000
        # same half-away-from-zero quantization as _determinism
        scaled = np.trunc(y + np.copysign(0.5, y)).astype("int64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "total_value": [scaled.sum() / 1_000_000.0],
                "last_event": [pdf["event_id"].max()],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
        .groupBy("user_id")
        .applyInPandas(agg, schema)
    )


@register(
    "d3_python_udtf",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(text, ' ')) AS token,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, token,
           CAST(LENGTH(token) AS BIGINT) AS token_len
    FROM tok
    """,
    tags=("D3",),
)
def d3_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 @udtf): one input row fans out to
    one row per token with position — the table-function surface
    (ClickHouse arrayJoin / LATERAL shape). Deterministic pure fan-out,
    so it carries a full oracle despite being a Python table function.
    (Row-at-a-time; the Arrow-batched fan-out alternative is
    mapInPandas — see l4/m1.)"""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: bigint, token: string, token_len: bigint")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_head")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token, t.token_len
        FROM docs_head, LATERAL tokenize_udtf(text) t
        """
    )
