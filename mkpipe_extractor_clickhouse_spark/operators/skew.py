"""Skew-mitigation operators (SURVEY §4 "spill/shuffle" row; the 100 TB
design point where one hot key would otherwise pin a single reducer).

Two layers of defense:
  1. AQE skew-join splitting is enabled session-wide (session.py) —
     Spark re-plans oversized partitions at runtime with no code change.
  2. For *aggregations* with hot keys, ``salted_agg`` implements the
     classic two-phase salt: pre-aggregate on (key, salt) across
     ``n_salts`` shards, then combine the partials — every decomposable
     aggregate (sum/count/min/max) distributes over the salt, so the
     result is exactly the direct aggregation (the oracle proves it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ._determinism import DSUM, _quantize


def salted_agg(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase salted sum/count per ``key`` over events-shaped input
    (columns: key, value): phase 1 aggregates (key, salt) — spreading a
    hot key over n_salts reducers — phase 2 combines shard partials.
    The quantized long sums make the combine exact."""
    # pmod, not %: Spark's % keeps the dividend's sign, which would
    # silently double the shard count to 2*n_salts-1.
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    phase1 = salted.groupBy(key, "salt").agg(
        F.sum(_quantize("value")).alias("p_sum"),
        F.count("*").alias("p_n"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    return phase1.groupBy(key).agg(
        (F.sum("p_sum") / 1_000_000.0).cast("double").alias("total_value"),
        F.sum("p_n").alias("n"),
        F.min("p_min").alias("min_value"),
        F.max("p_max").alias("max_value"),
    )


@register(
    "z1_salted_agg",
    oracle=f"""
    SELECT event_type,
           {DSUM.format(x='value')} AS total_value,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=("A2", "skew"),
)
def z1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation on a low-cardinality key (event_type: 5
    values — exactly the shape that creates reducer hot spots). Must
    equal the direct aggregation bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return salted_agg(ev, "event_type")


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Salted equi-join for a skewed fact key against a small-ish dim
    that is still too big (or too mid-sized) to broadcast outright:
    the fact side gets a deterministic per-row salt, the dim side is
    replicated across all ``n_salts`` shards (explode of a constant
    array), and the join key becomes (key, salt) — a hot fact key now
    lands on n_salts reducers instead of one. Row-for-row identical to
    the plain join; the oracle proves it.

    At 100 TB this is the manual fallback when AQE skew splitting can't
    help (e.g. the skew is in the *build* of a shuffled hash join, or a
    deliberate co-partitioning must be preserved). Replication cost is
    n_salts × |dim|, which is why dim is the replicated side."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    # Pin the shuffle regime: salting exists for joins that CANNOT
    # broadcast — letting the optimizer auto-broadcast the ×n_salts
    # replica defeats the point and builds an n_salts-times-larger
    # broadcast (measured 315 MiB at sf0.1; the build failed outright
    # under a long-session heap). The hint keeps the (key, _salt)
    # shuffled distribution the whole pattern is about.
    #
    # MERGE, not SHUFFLE_HASH (r11): both hints equally forbid the
    # broadcast, but a shuffled-hash join builds its per-task hash map
    # in memory and CANNOT SPILL — the r11 sf0.1 canary run under the
    # driver's default-config 1g session died with "not enough memory
    # to build hash map" exactly there, and at 100 TB a pinned SHJ is
    # the same landmine whenever build-side-per-partition outgrows an
    # executor. Sort-merge spills both sides gracefully; the salt
    # still spreads hot keys across n_salts sort streams, which is the
    # point of the pattern. (SHJ's no-sort edge over SMJ is real when
    # memory is plentiful — a cluster that KNOWS its build fits can
    # re-hint; the registered pattern defaults to the one that cannot
    # OOM.)
    return (
        salted_fact.join(replicated_dim.hint("merge"), [key, "_salt"])
        .drop("_salt")
    )


@register(
    "z2_salted_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {DSUM.format(x='l_extendedprice')} AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("J1", "A2", "skew"),
)
def z2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (lineitem⋈orders on orderkey) followed by a
    salted-safe aggregation — the end-to-end pattern for a join whose
    key histogram has hot entries. Must equal the plain join + group-by
    bit-for-bit (quantized sums make the combine exact)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        (F.sum(_quantize("l_extendedprice")) / 1_000_000.0)
        .cast("double")
        .alias("total_price"),
    )


Z4_KNUTH = 2654435761  # 2^32/phi — the repo's portable-hash constant
Z4_LANES = 1024
Z4_KEEP = 64  # 64/1024 = 1/16 keep rate → ×16 scale-up


@register(
    "z4_sampled_aggregate",
    oracle=f"""
    WITH base AS (
      SELECT l_returnflag AS flag, l_orderkey,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             ((l_orderkey * {Z4_KNUTH}) % 4294967296) % {Z4_LANES}
               AS lane
      FROM lineitem
    ),
    ex AS (
      SELECT flag, COUNT(*) AS n_exact, SUM(cents) AS sum_exact
      FROM base GROUP BY flag
    ),
    sm AS (
      SELECT flag,
             COUNT(*) * ({Z4_LANES} // {Z4_KEEP}) AS n_est,
             SUM(cents) * ({Z4_LANES} // {Z4_KEEP}) AS sum_est
      FROM base WHERE lane < {Z4_KEEP} GROUP BY flag
    )
    SELECT ex.flag, n_exact, n_est,
           ABS(n_est - n_exact) * 1000000 // n_exact AS n_err_ppm,
           sum_exact, sum_est,
           ABS(sum_est - sum_exact) * 1000000 // sum_exact AS sum_err_ppm
    FROM ex JOIN sm USING (flag) ORDER BY flag
    """,
    tags=("A2", "EXT", "sampling", "approximate"),
)
def z4_sampled_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregation over a DETERMINISTIC key sample with the
    error self-audited in-query — the BlinkDB/sampled-warehouse pattern
    (AQP): keep the 1/16 of ORDER KEYS whose Knuth-hash lane falls
    under the keep rate (cluster sampling by the correlation unit, not
    per row — per-row sampling underestimates order-level variance),
    scale estimates ×16, and report the exact-vs-estimate error in ppm
    per group. Everything is a pure function of the data (no RNG, no
    partition dependence — the property that makes an AQP layer
    RESUMABLE and oracle-checkable). At 100 TB only the sampled branch
    runs (a pushed-down filter making the scan 16× cheaper) and the
    exact branch is the offline audit this query performs inline; the
    measured ppm error IS the number an AQP gate thresholds before
    trusting the sample."""
    base = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS flag",
        "l_orderkey",
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents",
        f"((l_orderkey * {Z4_KNUTH}) % 4294967296) % {Z4_LANES} AS lane",
    )
    scale = Z4_LANES // Z4_KEEP
    ex = base.groupBy("flag").agg(
        F.count("*").alias("n_exact"), F.sum("cents").alias("sum_exact")
    )
    sm = (
        base.filter(F.col("lane") < Z4_KEEP)
        .groupBy("flag")
        .agg(
            (F.count("*") * scale).alias("n_est"),
            (F.sum("cents") * scale).alias("sum_est"),
        )
    )
    return (
        ex.join(sm, "flag")
        .selectExpr(
            "flag",
            "n_exact",
            "n_est",
            "ABS(n_est - n_exact) * 1000000 DIV n_exact AS n_err_ppm",
            "sum_exact",
            "sum_est",
            "ABS(sum_est - sum_exact) * 1000000 DIV sum_exact"
            " AS sum_err_ppm",
        )
        .orderBy("flag")
    )
