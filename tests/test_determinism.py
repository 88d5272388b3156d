"""Adversarial cross-engine tests for the quantization primitive that
every double aggregation rests on (operators/_determinism.py): for a
battery of hostile doubles — exact .5 ties at the 7th decimal,
negatives, zeros, denormals, large magnitudes, long random tails — the
Spark expression and the DuckDB fragment must produce the identical
64-bit integer, row by row."""

from __future__ import annotations

import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.operators._determinism import _quantize


def _edge_values() -> list[float]:
    rng = random.Random(42)
    vals = [
        0.0,
        -0.0,
        1.0,
        -1.0,
        2.5,
        -2.5,
        # exact ties at the quantization boundary (x * 1e6 = n + 0.5):
        # representable because the mantissa fits — e.g. 1.5/1e6 is not
        # exact, but n+0.5 scaled values constructed in binary are
        0.5 / 1_000_000,
        1.5 / 1_000_000,
        -0.5 / 1_000_000,
        # values whose double expansion straddles rounding digits
        0.1,
        0.3,
        1 / 3,
        2 / 3,
        # magnitudes around the exactness cliff of the scaled long
        1e3 + 1e-7,
        -1e3 - 1e-7,
        123456.789012,
        1e9,
        -1e9,
        # tiny / denormal
        5e-324,
        -5e-324,
        1e-300,
    ]
    vals += [rng.uniform(-1e5, 1e5) for _ in range(5000)]
    vals += [rng.uniform(-1, 1) for _ in range(5000)]
    # random bit patterns (finite only)
    for _ in range(2000):
        bits = rng.getrandbits(64)
        (x,) = struct.unpack("<d", struct.pack("<Q", bits))
        if x == x and abs(x) < 9e12:  # finite, inside scaled-long range
            vals.append(x)
    return vals


def test_quantize_identical_across_engines(spark):
    vals = _edge_values()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "x"])
    got_spark = {
        r.i: r.q for r in df.select("i", _quantize("x").alias("q")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    got_duck = dict(
        con.sql(
            "SELECT i, CAST(TRUNC(x * 1000000"
            " + (CASE WHEN x >= 0 THEN 0.5 ELSE -0.5 END)) AS BIGINT) FROM t"
        ).fetchall()
    )
    mismatches = [
        (i, vals[i], got_spark[i], got_duck[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"


def test_quantized_sum_order_independent(spark):
    """The quantized sum must not depend on partitioning/order."""
    vals = _edge_values()[:2000]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    s1 = df.repartition(1).agg(F.sum(_quantize("x"))).first()[0]
    s32 = df.repartition(32).agg(F.sum(_quantize("x"))).first()[0]
    srev = (
        spark.createDataFrame([(v,) for v in reversed(vals)], ["x"])
        .agg(F.sum(_quantize("x")))
        .first()[0]
    )
    assert s1 == s32 == srev


def test_geohash_matches_bisection_reference():
    """f16's integer interleave must equal the canonical geohash
    bisection algorithm (Niemeyer) bit-for-bit: quantizing each axis to
    20 bits and interleaving MSB-first IS the 40-step bisection."""

    def ref_geohash(lat, lon, precision=8):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bit = ch = 0
        even, out = True, []
        while len(out) < precision:
            rng = lon_r if even else lat_r
            val = lon if even else lat
            mid = (rng[0] + rng[1]) / 2
            if val >= mid:
                ch = (ch << 1) | 1
                rng[0] = mid
            else:
                ch = ch << 1
                rng[1] = mid
            even = not even
            bit += 1
            if bit == 5:
                out.append(b32[ch])
                bit = ch = 0
        return "".join(out)

    def integer_geohash(lat, lon):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        li = min(int((lon + 180.0) / 360.0 * (1 << 20)), (1 << 20) - 1)
        la = min(int((lat + 90.0) / 180.0 * (1 << 20)), (1 << 20) - 1)
        v = 0
        for i in range(20):
            v |= ((li >> (19 - i)) & 1) << (39 - 2 * i)
            v |= ((la >> (19 - i)) & 1) << (38 - 2 * i)
        return "".join(b32[(v >> (35 - 5 * j)) & 31] for j in range(8))

    import random

    rnd = random.Random(7)
    for _ in range(500):
        lat, lon = rnd.uniform(-90, 90), rnd.uniform(-180, 180)
        assert ref_geohash(lat, lon) == integer_geohash(lat, lon)


def test_partitioning_independence_sampled(spark, sf_dir, oracle):
    """Results must not depend on spark.sql.shuffle.partitions — the
    clearest determinism failure mode at scale (a different reducer
    count reorders float accumulation). A deterministic sample of
    oracle-checked queries runs under 32 and again under 7 shuffle
    partitions; rows must be IDENTICAL (not just hash-equal)."""
    import hashlib

    from mkpipe_extractor_clickhouse_spark.registry import all_specs

    specs = all_specs()
    names = sorted(
        n
        for n in specs
        if specs[n].oracle is not None
        # skip the filesystem-roundtrip/manifest builders (slow side
        # effects) — shuffle behavior is exercised by the pure queries
        and not n.startswith("x")
    )
    sampled = [
        n
        for n in names
        if int(hashlib.md5(n.encode()).hexdigest(), 16) % 11 == 0
    ]
    assert len(sampled) >= 15, sampled
    def rows_of(name):
        # None-safe total order (rows may carry NULLs in any column)
        return sorted(
            (tuple(r) for r in specs[name].builder(spark, sf_dir).collect()),
            key=lambda t: tuple((v is None, str(v)) for v in t),
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in sampled:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = rows_of(name)
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = rows_of(name)
            assert a == b, f"{name}: rows differ across partition counts"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_pow_tree_bit_identical_across_engines(spark):
    """The binary-exponentiation multiplication trees behind l103's
    S-curve and l107's power iteration must produce BIT-identical
    doubles in Spark and DuckDB for every exponent used — unlike
    native pow(), which is only ~1-ulp correct and may disagree."""
    from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import (
        _pow_tree,
        _scurve_pq_sql,
        LSH_TUNE_CONFIGS,
    )

    rng = random.Random(7)
    xs = [rng.random() for _ in range(200)] + [0.0, 1.0, 0.5, 1 / 3]
    con = duckdb.connect()
    sdf = spark.createDataFrame([(x,) for x in xs], ["x"])
    for n in sorted({r for _, r in LSH_TUNE_CONFIGS}
                    | {b for b, _ in LSH_TUNE_CONFIGS}):
        expr = _pow_tree("x", n)
        got_spark = [
            struct.pack("<d", r[0])
            for r in sdf.select(F.expr(expr)).collect()
        ]
        got_duck = [
            struct.pack("<d", v)
            for (v,) in con.execute(
                f"SELECT {expr} FROM (SELECT UNNEST(?) AS x)", [xs]
            ).fetchall()
        ]
        assert got_spark == got_duck, f"pow tree n={n} diverged"
    # the full quantized S-curve, m in 0..16, every (b, r) config
    mdf = spark.createDataFrame([(m,) for m in range(17)], ["m"])
    for b, r in LSH_TUNE_CONFIGS:
        pq = _scurve_pq_sql(r, b)
        got_spark = [x[0] for x in mdf.select(F.expr(pq)).collect()]
        got_duck = [
            v
            for (v,) in con.execute(
                f"SELECT {pq} FROM (SELECT UNNEST(range(0, 17)) AS m)"
            ).fetchall()
        ]
        assert got_spark == got_duck, f"s-curve (b={b}, r={r}) diverged"


def test_trunc_div_sign_routing_across_engines(spark):
    """l107's sign-routed integer division must equal Python's
    truncate-toward-zero semantics in BOTH engines. Spark `div` and
    DuckDB integer `//` both truncate toward zero (-7 // 2 = -3 in
    DuckDB — it does not floor), so the CASE routing is redundant by
    engine semantics; this battery pins the composite expression
    either way so a future engine/version change is caught here."""
    from mkpipe_extractor_clickhouse_spark.operators.llm_similarity import (
        _pi_tdiv,
    )

    rng = random.Random(11)
    cases = [
        (rng.randint(-10**15, 10**15), rng.randint(1, 10**9))
        for _ in range(200)
    ] + [(7, 2), (-7, 2), (0, 5), (-1, 10**9)]
    want = [a // b if a >= 0 else -((-a) // b) for a, b in cases]
    sdf = spark.createDataFrame(cases, ["a", "b"])
    got_spark = [
        r[0]
        for r in sdf.select(
            F.expr(_pi_tdiv("a", "b").format(div="div"))
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        v
        for (v,) in con.execute(
            f"SELECT {_pi_tdiv('a', 'b').format(div='//')} FROM "
            "(SELECT UNNEST(?) AS a, UNNEST(?) AS b)",
            [[a for a, _ in cases], [b for _, b in cases]],
        ).fetchall()
    ]
    assert got_spark == want == got_duck
