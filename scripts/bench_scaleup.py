"""Scale-up benchmark: the Spark/DuckDB crossover, measured.

PERF.md's scaling argument (Spark wall grows 1.1x while DuckDB grows
17x from 6 k -> 6 M rows) stopped at a single-table scan+agg.  This
script extends it to the headline SHUFFLE queries (q1, q3, q10, j11 —
grouped agg, fact-fact join + top-k, star join) at replicated scales up
to ~60 M lineitem rows (~sf10-equivalent row volume), the largest
dataset the sandbox comfortably materializes, and records both engines'
steady-state wall-clock at every point.

Dataset construction (FK-consistent replication, no synthesis):
  each scale point x{R} is R offset copies of the driver's sf0.1
  fixtures.  Copy r adds r * (max_key + 1) to o_orderkey/l_orderkey and
  o_custkey/c_custkey, so every FK edge lands inside its own replica —
  join fan-outs, group cardinalities per key, and selectivities are
  preserved exactly while table row counts scale by R.  Dimension
  tables (nation, region) keep their real-world size: scaling them
  would break the star-schema shape that makes broadcast joins the
  right plan.  Files are written 32-way so both engines can
  parallelize scans (the pristine fixtures ship ONE row group).

Methodology per point, identical for both engines: warm run, then
INTERLEAVED min-of-5 — each rep times Spark-plain, Spark-bucketed and
DuckDB back-to-back so multi-minute host-contention episodes inflate
all variants equally and cancel in the ratios (sequential windows
measured the host, not the engines: two r6 runs disagreed 4-8x on the
same point). Spark executes to the noop sink, DuckDB materializes to
Arrow (no per-row Python transfer on either side).  Output:
SCALEUP.json, which bench.py embeds in BENCH_FULL.json under
"scaleup" (clearly labeled precomputed — regenerating ~2.5 GB of
parquet inside the driver's bench window would be rude).

Usage: python scripts/bench_scaleup.py [--reps 5,20,50,100] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mkpipe_extractor_clickhouse_spark.catalog import load_table  # noqa: E402
from mkpipe_extractor_clickhouse_spark.registry import all_specs  # noqa: E402
from mkpipe_extractor_clickhouse_spark.session import get_spark  # noqa: E402

def _settle(sec: float = 5.0) -> None:
    """Flush dirty pages and let writeback drain before a timing
    window: materializing a scale point writes gigabytes, and timing
    the first query while the kernel is still writing back measures
    I/O contention, not the engine (the r6 x100 q3 artifact — 2.27 s
    under writeback vs 1.31 s interleaved-clean)."""
    os.sync()
    time.sleep(sec)


QUERIES = ("q1_pricing_summary", "q3_shipping_priority",
           "q10_returned_items", "j11_multiway_star")
TABLES = ("lineitem", "orders", "customer", "nation", "region")
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_ROOT = Path(REPO) / ".scaleup"


def _measured_on() -> dict:
    """Provenance stamp for every merged SCALEUP section (VERDICT r10
    item 1): the git SHA the numbers were measured on plus a timestamp,
    so prose tables citing the artifact can never drift silently — a
    section whose stamp predates the commit it ships in is stale by
    inspection, and tests can compare stamps mechanically."""
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip())
    except (OSError, subprocess.CalledProcessError):
        sha, dirty = "unknown", False
    return {
        "git_sha": sha + ("-dirty" if dirty else ""),
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def build_point(spark, rep: int) -> Path:
    """Materialize R FK-consistent offset copies of the sf0.1 tables."""
    out = DATA_ROOT / f"x{rep}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)

    o = load_table(spark, BASE_SF, "orders")
    c = load_table(spark, BASE_SF, "customer")
    ok_stride = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck_stride = c.agg(F.max("c_custkey")).collect()[0][0] + 1

    def replicate(name: str, offsets: dict[str, int], nfiles: int):
        df = load_table(spark, BASE_SF, name)
        reps = spark.range(rep).select(F.col("id").cast("int").alias("__rep"))
        df = df.crossJoin(F.broadcast(reps))
        cols = []
        for f in df.schema.fields:
            if f.name == "__rep":
                continue
            if f.name in offsets:
                cols.append(
                    (F.col(f.name) + F.col("__rep") * F.lit(offsets[f.name]))
                    .cast(f.dataType).alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        (df.select(cols).repartition(nfiles)
           .write.mode("overwrite").parquet(str(out / f"{name}.parquet")))

    replicate("lineitem", {"l_orderkey": ok_stride}, 32)
    replicate("orders", {"o_orderkey": ok_stride, "o_custkey": ck_stride}, 16)
    replicate("customer", {"c_custkey": ck_stride}, 8)
    for dim in ("nation", "region"):
        load_table(spark, BASE_SF, dim).coalesce(1) \
            .write.mode("overwrite").parquet(str(out / f"{dim}.parquet"))
    (out / "_DONE").touch()
    return out


BUCKETS = 32
BUCKETED_QUERIES = ("q3_shipping_priority", "q10_returned_items",
                    "j11_multiway_star")


def build_bucketed_tables(spark, sf_dir: str) -> float:
    """Materialize lineitem/orders BUCKETED by order key (x38's
    zero-Exchange machinery applied to the scale fixtures): the
    layout investment a lakehouse makes once so every fact-fact
    orderkey join afterwards runs co-located, bucket i against
    bucket i, with no exchange. repartition on the key first so each
    task owns exactly one bucket (same murmur3 hash mod n) — 32 files,
    not 32×32. Returns the build wall (reported, never folded into
    query time — DuckDB gets no equivalent prepass, which is the
    honest asymmetry: the bucketed layout is amortized across every
    future query, the point of owning storage layout)."""
    t0 = time.perf_counter()
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    for tbl in ("li_bx", "o_bx"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if wh:  # orphaned location from a previous session's catalog
            shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    (load_table(spark, sf_dir, "lineitem")
        .repartition(BUCKETS, F.col("l_orderkey"))
        .write.bucketBy(BUCKETS, "l_orderkey")
        .mode("overwrite").saveAsTable("li_bx"))
    (load_table(spark, sf_dir, "orders")
        .repartition(BUCKETS, F.col("o_orderkey"))
        .write.bucketBy(BUCKETS, "o_orderkey")
        .mode("overwrite").saveAsTable("o_bx"))
    return round(time.perf_counter() - t0, 1)


def _bucketed_builder(name: str):
    """The q3/q10/j11 logic verbatim (operators/analytics.py,
    operators/joins.py) with the fact tables read from the bucketed
    catalog tables instead of raw parquet — the ONLY change is where
    lineitem/orders come from, so result equality vs the plain
    builders (asserted at the proof point) pins the rewrite."""
    from mkpipe_extractor_clickhouse_spark.operators._determinism import (
        _quantize, dsum,
    )

    def q3(spark, sf_dir):
        c = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = spark.table("o_bx").filter(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
        )
        li = spark.table("li_bx").filter(
            F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
        )
        # broadcast join preserves the streamed side's bucket
        # distribution, so qualifying is still hashed on o_orderkey
        qualifying = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        return (
            li.select(
                "l_orderkey",
                _quantize(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("q"),
            )
            .join(
                qualifying.hint("shuffle_hash"),
                F.col("l_orderkey") == qualifying.o_orderkey,
            )
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg((F.sum("q") / 1_000_000.0).cast("double").alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )

    def q10(spark, sf_dir):
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        o = spark.table("o_bx")
        li = spark.table("li_bx").filter(F.col("l_returnflag") == "R")
        addends = li.select(
            "l_orderkey",
            _quantize(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("q"),
        )
        per_cust = (
            addends.join(
                o.hint("shuffle_hash").select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_custkey")
            .agg(F.sum("q").alias("rqs"))
        )
        return (
            per_cust.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select(
                "c_custkey", "c_name", "n_name",
                (F.col("rqs") / 1_000_000.0).cast("double").alias("revenue"),
            )
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20)
        )

    def j11(spark, sf_dir):
        li = spark.table("li_bx")
        o = spark.table("o_bx").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        r = load_table(spark, sf_dir, "region")
        first_region = r.agg(F.min("r_name").alias("m"))
        r1 = r.join(F.broadcast(first_region), r.r_name == F.col("m")).select(
            "r_regionkey"
        )
        cust_n = (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r1), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey", F.col("n_nationkey").alias("nk"), "n_name")
        )
        names = cust_n.select("nk", "n_name").distinct()
        # bucketed contrast to the broadcast plan: ordkeys keeps
        # orders' o_orderkey bucketing through the broadcast dim
        # joins, so the fact join is co-located — no broadcast BUILD
        # of the ~6% key set and no fact exchange either; the probe
        # payload and the aggregate carry the INT nation key (names
        # broadcast-join back onto the 6-row result — measured 25%
        # faster than string-keyed at 60 M, interleaved min-of-5)
        ordkeys = o.join(
            F.broadcast(cust_n.select("c_custkey", "nk")),
            o.o_custkey == F.col("c_custkey"),
        ).select("o_orderkey", "nk")
        return (
            li.join(
                ordkeys.hint("shuffle_hash"),
                li.l_orderkey == F.col("o_orderkey"),
            )
            .groupBy("nk")
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue")
            )
            .join(F.broadcast(names), "nk")
            .select("n_name", "revenue")
        )

    return {"q3_shipping_priority": q3, "q10_returned_items": q10,
            "j11_multiway_star": j11}[name]


def verify_bucketed(spark, sf_dir: str) -> dict[str, bool]:
    """Bucketed variants must return exactly the plain builders' rows
    (identical quantized arithmetic ⇒ identical bits regardless of
    partitioning)."""
    specs = all_specs()
    ok = {}
    for name in BUCKETED_QUERIES:
        plain = sorted(
            tuple(r) for r in specs[name].builder(spark, sf_dir).collect()
        )
        buck = sorted(
            tuple(r)
            for r in _bucketed_builder(name)(spark, sf_dir).collect()
        )
        ok[name] = plain == buck
    return ok


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_point_interleaved(
    spark, sf_dir: str, n_reps: int = 5
) -> tuple[dict, dict, dict]:
    """INTERLEAVED min-of-N across Spark-plain, Spark-bucketed, and
    DuckDB: each rep times every (query, variant) back-to-back, so a
    multi-minute host-contention episode inflates all three equally
    and cancels in the ratios. Two r6 sequential-window runs disagreed
    4-8× on the same query at the same point (one hit a clean window,
    one a contended one) — sequential engine windows measure the host,
    interleaved reps measure the engines. Returns (spark_plain,
    spark_bucketed, duckdb) per-query min walls."""
    import duckdb

    specs = all_specs()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    plain = {n: specs[n].builder(spark, sf_dir) for n in QUERIES}
    buck = {
        n: _bucketed_builder(n)(spark, sf_dir) for n in BUCKETED_QUERIES
    }
    for df in (*plain.values(), *buck.values()):  # warm: codegen, cache
        _noop(df)
    for n in QUERIES:
        con.sql(specs[n].oracle).arrow()
    S: dict[str, list] = {n: [] for n in QUERIES}
    B: dict[str, list] = {n: [] for n in BUCKETED_QUERIES}
    D: dict[str, list] = {n: [] for n in QUERIES}
    for r in range(n_reps):
        # rotate slot order per rep (see time_llm: fixed order gives a
        # query the same heavy predecessor every rep)
        order = QUERIES[r % len(QUERIES):] + QUERIES[:r % len(QUERIES)]
        for n in order:
            t0 = time.perf_counter()
            _noop(plain[n])
            S[n].append(time.perf_counter() - t0)
            if n in buck:
                t0 = time.perf_counter()
                _noop(buck[n])
                B[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(specs[n].oracle).arrow()
            D[n].append(time.perf_counter() - t0)
    con.close()
    r3 = lambda d: {n: round(min(v), 3) for n, v in d.items()}  # noqa: E731
    return r3(S), r3(B), r3(D)


# l4b_shard_scan_topk was RETIRED from the measured suite in r9: the
# r7 refutation stands (pyarrow list<float> decode costs more than the
# JVM bridge it avoids — 11.87x at 9.6M vs l4's 5.29x); it stays
# registered and strict-matched as documentation of the trade-off.
# l4c_packed_topk replaces it: same shard-scan scheduling, but over a
# one-time PACKED layout (plain-encoded binary f32 + precomputed f64
# norms) whose decode is a memcpy, scored by an exact two-phase
# f32-screen / f64-refine kernel.  Its one-time pack cost is reported
# as pack_sec (the vector-index analogue of bucket_gen_sec).
LLM_QUERIES = ("l1_exact_dedup", "l5_wordcount", "l12_token_count",
               "l3_topk_cosine", "l4_distributed_topk",
               "l4c_packed_topk")


def build_llm_point(spark, rep: int) -> Path:
    """R offset copies of documents + embeddings.  Text/vectors are
    UNCHANGED — exact-dup groups scale by R (the realistic shape for a
    re-crawled corpus) and duplicate vectors tie-break on vec_id."""
    out = DATA_ROOT / f"llm_x{rep}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    for name, key, nfiles in (("documents", "doc_id", 32),
                              ("embeddings", "vec_id", 32)):
        df = load_table(spark, BASE_SF, name)
        stride = df.agg(F.max(key)).collect()[0][0] + 1
        reps_df = spark.range(rep).select(
            F.col("id").cast("long").alias("__rep")
        )
        cols = [
            (F.col(f.name) + F.col("__rep") * F.lit(stride))
            .cast(f.dataType).alias(f.name)
            if f.name == key else F.col(f.name)
            for f in df.schema.fields
        ]
        (df.crossJoin(F.broadcast(reps_df)).select(cols)
           .repartition(nfiles)
           .write.mode("overwrite").parquet(str(out / f"{name}.parquet")))
    (out / "_DONE").touch()
    return out


# DuckDB's BEST formulation for top-k cosine (native list kernel) — the
# registry's declared oracle explodes per-element rows for exactness,
# which would strawman DuckDB at the bench scale.
L3_DUCK_NATIVE = """
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)), 6)
         AS cosine
FROM embeddings WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id LIMIT 10
"""


def time_llm(spark, sf_dir: str, prove: bool = False) -> tuple[dict, dict, dict]:
    """Interleaved min-of-5 Spark-vs-DuckDB per LLM kernel (the same
    host-noise-cancelling protocol as time_point_interleaved)."""
    import duckdb

    from mkpipe_extractor_clickhouse_spark.operators.llm_similarity import (
        TOP_K,
        _packed_cache_dir,
        _packed_layout_for,
        _packed_layout_if_warm,
        cosine_to_query,
    )

    specs = all_specs()
    checks: dict[str, bool] = {}
    dfs = {}
    # ROUND 10: the REGISTERED l3/l4 dispatch to the packed two-phase
    # kernel whenever the layout is warm (VERDICT r9 item 2), so this
    # harness (a) builds the layout FIRST — timed, reported as
    # pack_sec, the one-time vector-index cost analogous to
    # bucket_gen_sec; pack_cached flags a layout reused from a prior
    # harness run so a ~0 s pack is never mistaken for free — and
    # (b) measures the registered builders themselves: the scale
    # numbers are what a user of the query registry actually gets.
    pre_built = os.path.exists(
        os.path.join(_packed_cache_dir(sf_dir), "_PACKED_DONE")
    )
    t0 = time.perf_counter()
    _packed_layout_for(spark, sf_dir)
    checks["pack_sec"] = round(time.perf_counter() - t0, 1)
    checks["pack_cached"] = pre_built
    # The registered l3 only DISPATCHES to the packed kernel when the
    # corpus clears the _PACKED_MIN_BYTES size gate (llm_similarity.py);
    # below it l3 is the scalar fold, and aliasing l4/l4c to it would
    # time the fold three times while pack_sec reports a layout nothing
    # uses, and the prove check would compare fold vs fold (ADVICE r10).
    packed_active = _packed_layout_if_warm(sf_dir) is not None
    checks["packed_dispatch_active"] = packed_active
    for name in LLM_QUERIES:
        if (
            packed_active
            and name in ("l4_distributed_topk", "l4c_packed_topk")
            and "l3_topk_cosine" in dfs
        ):
            # warm AND above the size gate, all three registered queries
            # resolve to the SAME packed kernel; time one instance across
            # the three slots (slot-asymmetry note in SCALEUP.json)
            dfs[name] = dfs["l3_topk_cosine"]
        else:
            dfs[name] = specs[name].builder(spark, sf_dir)
    if prove and packed_active:
        # equality chain at the smallest point: the declarative
        # higher-order-fold formulation (l3's cold baseline, still
        # driver-hash-checked at sf0.01) == the packed kernel rows.
        fold = sorted(
            tuple(r)
            for r in cosine_to_query(spark, sf_dir)
            .select("vec_id", F.round("cosine", 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("vec_id"))
            .limit(TOP_K)
            .collect()
        )
        kern = sorted(tuple(r) for r in dfs["l3_topk_cosine"].collect())
        checks["l3_fold_eq_packed"] = fold == kern
    elif prove:
        # below the size gate l3 IS the fold — the check would be
        # fold-vs-fold and prove nothing; record the skip explicitly
        checks["l3_fold_eq_packed"] = "skipped_below_size_gate"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    duck_sql = {
        name: (
            L3_DUCK_NATIVE
            if name
            in (
                "l3_topk_cosine",
                "l4_distributed_topk",
                "l4c_packed_topk",
            )
            else specs[name].oracle
        )
        for name in LLM_QUERIES
    }
    for name in LLM_QUERIES:  # warm both engines
        _noop(dfs[name])
        con.sql(duck_sql[name]).arrow()
    S: dict[str, list] = {n: [] for n in LLM_QUERIES}
    D: dict[str, list] = {n: [] for n in LLM_QUERIES}
    # ROTATE the query order each rep: a fixed order gives every slot
    # the same predecessor, and a heavy predecessor (duck's l12 burst)
    # systematically poisons the next measurement — observed as the
    # same DataFrame timing 2.3x apart in two different slots.
    for r in range(7):
        order = LLM_QUERIES[r % len(LLM_QUERIES):] + LLM_QUERIES[:r % len(LLM_QUERIES)]
        for name in order:
            t0 = time.perf_counter()
            _noop(dfs[name])
            S[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(duck_sql[name]).arrow()
            D[name].append(time.perf_counter() - t0)
    con.close()
    sp = {n: round(min(v), 3) for n, v in S.items()}
    du = {n: round(min(v), 3) for n, v in D.items()}
    return sp, du, checks


def build_fuzzy_point(spark, n: int) -> Path:
    """A deterministic n-name corpus for the fuzzy-join scale section:
    ~80% independent 2-3-word names, ~20% single/double-edit mutations
    of earlier names (the true-pair generator), exact-distinct, seeded
    — regenerating a point reproduces it byte-for-byte."""
    import random

    out = DATA_ROOT / f"fuzzy_n{n}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(20260814)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def word() -> str:
        return "".join(
            rng.choice(alpha) for _ in range(rng.randint(3, 8))
        )

    def mutate(s: str) -> str:
        for _ in range(rng.randint(1, 2)):
            i = rng.randrange(max(len(s), 1))
            kind = rng.choice("sid")
            if kind == "s" and s:
                s = s[:i] + rng.choice(alpha) + s[i + 1 :]
            elif kind == "i":
                s = s[:i] + rng.choice(alpha) + s[i:]
            elif s:
                s = s[:i] + s[i + 1 :]
        return s

    names: list[str] = []
    seen: set[str] = set()
    while len(names) < n:
        if names and rng.random() < 0.2:
            cand = mutate(rng.choice(names))
        else:
            cand = " ".join(word() for _ in range(rng.randint(2, 3)))
        if cand and cand not in seen:
            seen.add(cand)
            names.append(cand)
    (spark.createDataFrame([(x,) for x in names], ["name"])
        .repartition(32)
        .write.mode("overwrite").parquet(str(out / "names.parquet")))
    (out / "_DONE").touch()
    return out


# Ed-Join (prefix-filtered q-gram blocking, q=3 t=2) in DuckDB SQL —
# the SAME algorithm the Spark side runs, so the ratio compares
# engines, not algorithms. {names} is the parquet glob.
FUZZY_DUCK_BLOCKED = """
WITH g AS (
  SELECT name, length(name) AS len, pos,
         substring(chr(1) || chr(1) || name || chr(1) || chr(1),
                   pos, 3) AS gram
  FROM (SELECT name, length(name) AS len,
               unnest(range(1, length(name) + 3)) AS pos
        FROM read_parquet('{names}'))
),
fr AS (SELECT gram, COUNT(*) AS freq FROM g GROUP BY 1),
pre AS (
  SELECT name, len, gram FROM (
    SELECT g.name, g.len, g.gram,
           ROW_NUMBER() OVER (PARTITION BY g.name
                              ORDER BY fr.freq, g.gram, g.pos) AS rn
    FROM g JOIN fr USING (gram)
  ) WHERE rn <= 7
),
cand AS (
  SELECT DISTINCT a.name AS name_a, a.len AS la,
                  b.name AS name_b, b.len AS lb
  FROM pre a JOIN pre b ON a.gram = b.gram AND a.name < b.name
  WHERE abs(a.len - b.len) <= 2
),
-- completeness branch (same as the Spark side's _short_pairs): two
-- strings BOTH shorter than q*(t-1)+2 can be within t edits while
-- sharing ZERO padded grams ('i v'/'v r'), so the gram join alone is
-- incomplete for them; the sub-bound domain is tiny, all-pairs it
shorts AS (
  SELECT name, length(name) AS len FROM read_parquet('{names}')
  WHERE length(name) < 5
),
allcand AS (
  SELECT name_a, name_b FROM cand
  UNION
  SELECT a.name, b.name FROM shorts a JOIN shorts b
  ON a.name < b.name AND abs(a.len - b.len) <= 2
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM allcand
WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 2
"""

FUZZY_DUCK_ALLPAIRS = """
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM read_parquet('{names}') a JOIN read_parquet('{names}') b
  ON a.name < b.name
WHERE abs(length(a.name) - length(b.name)) <= 2
  AND levenshtein(a.name, b.name) BETWEEN 1 AND 2
"""


def time_fuzzy(spark, point_dir: str, n: int, prove: bool) -> dict:
    """One fuzzy scale point: Spark Ed-Join vs the identical DuckDB
    formulation (best-of-3 steady each); at the proof point also the
    all-pairs oracle + three-way pair-set equality."""
    import duckdb

    from mkpipe_extractor_clickhouse_spark.operators.fuzzy_join import (
        edjoin_candidates,
        edjoin_fuzzy_pairs,
    )

    glob = f"{point_dir}/names.parquet/*.parquet"
    names = spark.read.parquet(f"{point_dir}/names.parquet")
    pairs = edjoin_fuzzy_pairs(names, "name")
    # Profiling split (r5 verdict ask): candidate generation alone vs
    # the full pipeline — verify share = spark_sec − cand_sec (the
    # verify is JVM-codegen levenshtein, no UDF; if cand_sec dominates,
    # the optimization target is the gram/prefix machinery, not the
    # edit distance). All three measurements INTERLEAVED min-of-3 with
    # DuckDB so host-contention episodes cancel in the ratio.
    cand = edjoin_candidates(names, "name")
    con = duckdb.connect()
    blocked = FUZZY_DUCK_BLOCKED.format(names=glob)
    _noop(pairs)
    _noop(cand)
    con.sql(blocked).arrow()
    rs, rc, rd = [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _noop(pairs)
        rs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _noop(cand)
        rc.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.sql(blocked).arrow()
        rd.append(time.perf_counter() - t0)
    pt: dict = {"n_names": n, "spark_sec": round(min(rs), 3)}
    pt["cand_sec"] = round(min(rc), 3)
    pt["n_candidates"] = cand.count()
    pt["duckdb_blocked_sec"] = round(min(rd), 3)
    pt["ratio"] = round(pt["spark_sec"] / pt["duckdb_blocked_sec"], 2)

    spark_pairs = {
        (r.name_a, r.name_b, r.dist) for r in pairs.collect()
    }
    pt["n_pairs"] = len(spark_pairs)
    duck_pairs = {
        (a, b, d) for a, b, d in con.sql(blocked).fetchall()
    }
    pt["spark_eq_duckdb"] = spark_pairs == duck_pairs
    if prove:
        t0 = time.perf_counter()
        oracle = {
            (a, b, d)
            for a, b, d in con.sql(
                FUZZY_DUCK_ALLPAIRS.format(names=glob)
            ).fetchall()
        }
        pt["duckdb_allpairs_sec"] = round(time.perf_counter() - t0, 3)
        pt["blocked_eq_allpairs"] = spark_pairs == oracle
    con.close()
    return pt


def verify_values(spark, sf_dir: str) -> dict[str, bool]:
    """Value-consistency at scale: collect each headline query's (tiny)
    result from BOTH engines and compare after canonical rounding.
    The sf0.01 strict gate can't see scale-dependent failure modes —
    the one this guards is quantized-long aggregate overflow (the dsum
    bound is |Σx| ≲ 9.2e12 per group; a 60 M-row group sits at ~4e17
    on this data, within range but two orders closer than the driver's
    fixtures ever get)."""
    import duckdb

    specs = all_specs()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )

    def canon(cols, rows):
        out = []
        for r in rows:
            out.append(tuple(
                round(v, 6) if isinstance(v, float) else v for v in r
            ))
        return sorted(out, key=repr)

    ok = {}
    for name in QUERIES:
        sdf = specs[name].builder(spark, sf_dir)
        s = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.sql(specs[name].oracle)
        o = canon(list(res.columns), res.fetchall())
        ok[name] = s == o
    con.close()
    return ok


SPATIAL_QUERIES = ("j20_polygon_containment_join", "j21_interval_overlap_join")


def build_spatial_point(spark, rep: int) -> Path:
    """R offset copies of events for the spatial-join section: event_id
    strides so the congruence-derived (px, py) points differ per
    replica (uniform stays uniform), and ts shifts by 31 days per
    replica so INTERVAL DENSITY stays constant — overlap-pair output
    scales linearly with R instead of quadratically, the realistic
    shape for a longer event history. nation (the polygon source) keeps
    its real-world size."""
    out = DATA_ROOT / f"sp{rep}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    ev = load_table(spark, BASE_SF, "events")
    stride = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = spark.range(rep).select(F.col("id").cast("int").alias("__rep"))
    df = ev.crossJoin(F.broadcast(reps))
    cols = [
        (F.col("event_id") + F.col("__rep") * F.lit(stride))
        .cast("long").alias("event_id"),
        F.expr("ts + make_interval(0, 0, 0, __rep * 31, 0, 0, 0)")
        .cast(dict(df.dtypes)["ts"]).alias("ts"),
        *[c for c in ("user_id", "event_type", "value", "props")],
    ]
    (df.select(cols).repartition(32)
       .write.mode("overwrite").parquet(str(out / "events.parquet")))
    load_table(spark, BASE_SF, "nation").coalesce(1) \
        .write.mode("overwrite").parquet(str(out / "nation.parquet"))
    (out / "_DONE").touch()
    return out


def time_spatial(spark, sf_dir: str, prove: bool) -> dict:
    """One spatial scale point: Spark's blocked j20/j21 vs DuckDB. j20's
    DuckDB side is the all-pairs oracle (linear in points — the polygon
    set is fixed); j21's DuckDB side runs the IDENTICAL bucket-blocked
    formulation (the theta-join oracle is quadratic in candidates and
    stops being runnable at these scales — the fuzzy-section
    precedent). The j21 id cap lifts for the scale run (module constant
    read at call time; the DuckDB text patches the same bound)."""
    import duckdb

    from mkpipe_extractor_clickhouse_spark.operators import (
        ch_aggregates3 as _a3,
    )

    specs = all_specs()
    old_cap = _a3.J21_MAX_ID
    _a3.J21_MAX_ID = 1 << 60
    try:
        sp = {}
        for name in SPATIAL_QUERIES:
            df = specs[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            sp[name] = round(min(runs), 3)

        con = duckdb.connect()
        for t in ("events", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
            )
        j20_sql = specs["j20_polygon_containment_join"].oracle
        bucket, cap = _a3.J21_BUCKET, 1 << 60
        j21_blocked = f"""
        WITH iv AS (
          SELECT event_id AS id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   + 60 * (1 + event_id % 120) AS e
          FROM events WHERE event_id <= {cap}
        ),
        repl AS (
          SELECT id, s, e, r.b AS bucket
          FROM iv, LATERAL (
            SELECT unnest(range(s // {bucket}, (e - 1) // {bucket} + 1))
          ) r(b)
        ),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS ov_s,
                 a.bucket AS day_bucket
          FROM repl a JOIN repl b USING (bucket)
          WHERE a.id < b.id AND a.s < b.e AND b.s < a.e
            AND GREATEST(a.s, b.s) // {bucket} = a.bucket
        )
        SELECT day_bucket // 24 AS day,
               COUNT(*) AS n_pairs,
               SUM(ov_s) AS overlap_s_sum,
               SUM(id_a + id_b) AS id_checksum
        FROM pairs GROUP BY 1 ORDER BY 1
        """
        du = {}
        for name, sql in (
            ("j20_polygon_containment_join", j20_sql),
            ("j21_interval_overlap_join", j21_blocked),
        ):
            con.sql(sql).arrow()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(sql).arrow()
                runs.append(time.perf_counter() - t0)
            du[name] = round(min(runs), 3)

        checks = {}
        if prove:
            for name, sql in (
                ("j20_polygon_containment_join", j20_sql),
                ("j21_interval_overlap_join", j21_blocked),
            ):
                srows = sorted(
                    tuple(r) for r in
                    specs[name].builder(spark, sf_dir).collect()
                )
                drows = sorted(tuple(r) for r in con.sql(sql).fetchall())
                checks[name] = srows == drows
        con.close()
        st, dt = round(sum(sp.values()), 3), round(sum(du.values()), 3)
        pt = {
            "spark": sp, "duckdb": du,
            "spark_total": st, "duckdb_total": dt,
            "ratio": round(st / dt, 2) if dt else None,
        }
        if checks:
            pt["spark_eq_duckdb"] = checks
        return pt
    finally:
        _a3.J21_MAX_ID = old_cap


STREAMING_QUERIES = ("t2_tumbling_window", "t4_session_window",
                     "t13_stateful_profile")

_CKSUM_P = 2147483647  # mod for overflow-proof checksums (both engines
# use C-style % with the dividend's sign, so negatives agree too)


def build_streaming_point(spark, rep: int) -> Path:
    """R offset copies of events for the streaming section: ts shifts
    31 days per replica (events-per-hour stays constant — the window
    COUNT grows, the realistic shape of a longer stream history),
    user_id strides per replica (distinct users per replica, so
    per-user session structure and state size per key are preserved
    while the keyspace grows — the dimension streaming state actually
    scales in), event_id strides for uniqueness."""
    out = DATA_ROOT / f"st{rep}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    ev = load_table(spark, BASE_SF, "events")
    estride = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ustride = ev.agg(F.max("user_id")).collect()[0][0] + 1
    reps = spark.range(rep).select(F.col("id").cast("int").alias("__rep"))
    df = ev.crossJoin(F.broadcast(reps))
    cols = [
        (F.col("event_id") + F.col("__rep") * F.lit(estride))
        .cast("long").alias("event_id"),
        F.expr("ts + make_interval(0, 0, 0, __rep * 31, 0, 0, 0)")
        .cast(dict(df.dtypes)["ts"]).alias("ts"),
        (F.col("user_id") + F.col("__rep") * F.lit(ustride))
        .cast("long").alias("user_id"),
        F.col("event_type"), F.col("value"), F.col("props"),
    ]
    (df.select(cols).repartition(32)
       .write.mode("overwrite").parquet(str(out / "events.parquet")))
    (out / "_DONE").touch()
    return out


def _stream_checksum_spark(df) -> dict:
    """Order-insensitive per-column checksum of a result DataFrame:
    count(*), plus per column by type — mod-P sums for integers (t4's
    session_start micros × 100 M rows overflows int64 unmodded),
    round(x*1e6) mod-P sums for the quantized doubles, epoch-micros
    mod-P sums for timestamps, distinct counts for strings. Any value
    discrepancy perturbs a sum with overwhelming probability; both
    engines compute the identical formula (_stream_checksum_duck)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, dt in df.dtypes:
        if dt in ("bigint", "int", "smallint", "tinyint"):
            aggs.append(F.sum(F.col(name) % _CKSUM_P).alias(f"s_{name}"))
        elif dt == "double":
            aggs.append(
                F.sum(F.round(F.col(name) * 1e6).cast("long") % _CKSUM_P)
                .alias(f"s_{name}")
            )
        elif dt.startswith("timestamp"):
            aggs.append(
                F.sum(F.unix_micros(F.col(name).cast("timestamp")) % _CKSUM_P)
                .alias(f"s_{name}")
            )
        elif dt == "string":
            aggs.append(F.countDistinct(name).alias(f"s_{name}"))
    row = df.agg(*aggs).first()
    return {k: int(v) for k, v in row.asDict().items()}


def _stream_checksum_duck(con, sql: str, dtypes: list) -> dict:
    parts = ["COUNT(*) AS n_rows"]
    for name, dt in dtypes:
        if dt in ("bigint", "int", "smallint", "tinyint"):
            parts.append(f"SUM({name} % {_CKSUM_P}) AS s_{name}")
        elif dt == "double":
            parts.append(
                f"SUM(CAST(ROUND({name} * 1e6) AS BIGINT) % {_CKSUM_P}) "
                f"AS s_{name}"
            )
        elif dt.startswith("timestamp"):
            parts.append(
                f"SUM(epoch_us(CAST({name} AS TIMESTAMP)) % {_CKSUM_P}) "
                f"AS s_{name}"
            )
        elif dt == "string":
            parts.append(f"COUNT(DISTINCT {name}) AS s_{name}")
    res = con.sql(f"SELECT {', '.join(parts)} FROM ({sql})")
    row = res.fetchone()
    return {c: int(v) for c, v in zip(res.columns, row)}


def time_streaming(spark, sf_dir: str, prove: bool, n_reps: int = 5) -> dict:
    """One streaming scale point: the T-family batch-equivalents
    (tumbling window agg, session windows, the applyInPandas stateful
    profile kernel) Spark vs the registered DuckDB oracles, interleaved
    min-of-N (the relational protocol — host noise cancels in ratios).
    values_match at EVERY point is the engine-vs-engine per-column
    checksum compare (collecting t4's ~rep-scaled session rows from
    both engines would dominate the harness at 100 M events); at the
    smallest point `prove` additionally does the full sorted-row
    compare, the same exactness bar as the sf0.01 driver gate."""
    import duckdb

    specs = all_specs()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    dfs = {n: specs[n].builder(spark, sf_dir) for n in STREAMING_QUERIES}
    for n in STREAMING_QUERIES:  # warm both engines
        _noop(dfs[n])
        con.sql(specs[n].oracle).arrow()
    S: dict[str, list] = {n: [] for n in STREAMING_QUERIES}
    D: dict[str, list] = {n: [] for n in STREAMING_QUERIES}
    for r in range(n_reps):
        order = (list(STREAMING_QUERIES[r % len(STREAMING_QUERIES):])
                 + list(STREAMING_QUERIES[:r % len(STREAMING_QUERIES)]))
        for n in order:
            t0 = time.perf_counter()
            _noop(dfs[n])
            S[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(specs[n].oracle).arrow()
            D[n].append(time.perf_counter() - t0)
    sp = {n: round(min(v), 3) for n, v in S.items()}
    du = {n: round(min(v), 3) for n, v in D.items()}

    checks: dict = {}
    values_match = {}
    for n in STREAMING_QUERIES:
        s_ck = _stream_checksum_spark(dfs[n])
        d_ck = _stream_checksum_duck(con, specs[n].oracle, dfs[n].dtypes)
        values_match[n] = s_ck == d_ck
    checks["values_match"] = values_match
    if prove:
        eq = {}
        for n in STREAMING_QUERIES:
            srows = sorted(
                (tuple(round(v, 6) if isinstance(v, float) else v for v in r)
                 for r in dfs[n].collect()),
                key=repr,
            )
            drows = sorted(
                (tuple(round(v, 6) if isinstance(v, float) else v for v in r)
                 for r in con.sql(specs[n].oracle).fetchall()),
                key=repr,
            )
            eq[n] = srows == drows
        checks["spark_eq_duckdb"] = eq
    con.close()

    # The incremental-replay loop end-to-end (the reference's own
    # lifecycle, __init__.py:71-115): 4 chunked extract→load→commit
    # runs over the point's events with quartile cutoffs, then the
    # idempotency check (destination rows == source rows after
    # boundary dedup). Throughput, not a DuckDB ratio — it's a
    # pipeline (scan + full parquet rewrite + state commits), not a
    # query.
    import tempfile

    from mkpipe_extractor_clickhouse_spark.sources.extract import (
        IncrementalRunner,
        ParquetExtractor,
        ParquetLoader,
        TableConfig,
    )
    from mkpipe_extractor_clickhouse_spark.sources.state import WatermarkStore

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cuts = [lo + (hi - lo) * q for q in (0.25, 0.5, 0.75)] + [None]
    workdir = tempfile.mkdtemp(prefix="st_x1_")
    try:
        table = TableConfig(
            name="events",
            replication_method="incremental",
            iterate_column="ts",
            iterate_column_type="datetime",
            dedup_keys=("event_id",),
        )
        runner = IncrementalRunner(
            extractor=ParquetExtractor(sf_dir),
            loader=ParquetLoader(workdir),
            store=WatermarkStore(os.path.join(workdir, "state.json")),
        )
        t0 = time.perf_counter()
        for cutoff in cuts:
            source_filter = (
                F.col("ts") < F.lit(cutoff).cast("timestamp_ntz")
                if cutoff is not None
                else None
            )
            runner.run_once(spark, table, source_filter=source_filter)
        loop_sec = round(time.perf_counter() - t0, 3)
        dest_rows = spark.read.parquet(
            os.path.join(workdir, "events.parquet")
        ).count()
        src_rows = ev.count()
        checks["x1_loop_sec"] = loop_sec
        checks["x1_rows_per_sec"] = int(src_rows / loop_sec) if loop_sec else None
        checks["x1_dest_eq_source_rows"] = dest_rows == src_rows
        # Steady-state tick: one more run with the watermark already at
        # max(ts) — the nightly no-new-data cost of the reference's loop
        # at this corpus size.  Extract window is ts >= watermark (the
        # boundary re-read), so the scan should be row-group-pruned by
        # the pushed ts predicate: tick cost must track the BOUNDARY
        # rows + min/max footer stats, not the corpus.
        t0 = time.perf_counter()
        tick = runner.run_once(spark, table)
        checks["x1_tick_sec"] = round(time.perf_counter() - t0, 3)
        checks["x1_tick_rows"] = int(tick.df.count()) if tick.df is not None else 0
        checks["x1_tick_idempotent"] = (
            spark.read.parquet(os.path.join(workdir, "events.parquet")).count()
            == src_rows
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    st, dt = round(sum(sp.values()), 3), round(sum(du.values()), 3)
    pt = {
        "spark": sp, "duckdb": du,
        "spark_total": st, "duckdb_total": dt,
        "ratio": round(st / dt, 2) if dt else None,
    }
    pt.update(checks)
    return pt


DEDUP_QUERIES = (
    "l1_exact_dedup",        # linear output — noop-timed, DuckDB ratio
    "l2_jaccard_neardup",    # exact PPJoin pairs — count-timed
    "l2b_minhash_lsh",       # xxhash64 LSH pairs — count-timed, Spark-only
    "l2c_simhash",           # per-doc fingerprints — noop-timed, Spark-only
    "l58_minhash_portable",  # portable LSH pairs — count-timed, DuckDB ratio
)
# queries whose per-replica output is EXACTLY invariant under the salted
# replication (Jaccard/md5-of-text depend only on within-replica token
# structure, which the salt preserves bijectively); l2b/l58 are excluded
# because their hash families see the salted tokens as a fresh random
# draw per replica, so their per-replica candidate counts legitimately
# vary (the LSH trade-off re-sampled, not an error)
DEDUP_LINEAR = ("l1_exact_dedup", "l2_jaccard_neardup", "l2c_simhash")


def build_dedup_point(spark, rep: int) -> Path:
    """R SALTED copies of documents: doc_id strides per replica and
    every token gets a replica prefix ("the" → "r7_the"), making
    replicas token-DISJOINT.  Within-replica dup/near-dup structure is
    preserved exactly (set Jaccard is invariant under bijective token
    renaming; distinct-text counts are preserved because the salt map
    is injective on texts) while cross-replica near-dup pairs are
    impossible.  The result is a corpus that GROWS at CONSTANT dup
    rate — the realistic crawl shape — with exact per-point
    invariants: l1 group count, l2's verified pair count and l2c's
    fingerprint count must each equal rep × their per-replica base.
    The llm_x points are the complementary shape (text replicated
    UNCHANGED → dup-group SIZE scales, corpus diversity doesn't);
    both are real re-crawl regimes, but this one keeps pair output
    linear in corpus size so the harness measures kernel compute, not
    the sink."""
    out = DATA_ROOT / f"dedup_x{rep}"
    if (out / "_DONE").exists():
        return out
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    d = load_table(spark, BASE_SF, "documents")
    stride = d.agg(F.max("doc_id")).collect()[0][0] + 1
    reps_df = spark.range(rep).select(F.col("id").cast("long").alias("__rep"))
    salt = F.concat(F.lit("r"), F.col("__rep").cast("string"), F.lit("_"))
    salted = F.array_join(
        F.transform(F.split("text", " "), lambda t: F.concat(salt, t)), " "
    )
    (
        d.crossJoin(F.broadcast(reps_df))
        .select(
            (F.col("doc_id") + F.col("__rep") * F.lit(stride))
            .cast("long").alias("doc_id"),
            salted.alias("text"),
            F.col("lang"), F.col("source"),
            F.length(salted).cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite").parquet(str(out / "documents.parquet"))
    )
    (out / "_DONE").touch()
    return out


def time_dedup(spark, sf_dir: str, rep: int, prove: bool) -> dict:
    """One dedup scale point: the registered dedup kernels, interleaved
    min-of-3 (the relational protocol — host noise cancels in ratios).
    Pair-producing queries are timed to .count() — the count drives the
    full candidate+verify compute (pairs ARE the output, so a sink
    would only add serialization) and doubles as the linearity
    invariant.  DuckDB runs the two engine-portable formulations (l1's
    hash agg, l58's md5 LSH — the registered oracles verbatim) with
    per-column checksum equality asserted at EVERY point; at the
    smallest point `prove` additionally checksums l2's exact PPJoin
    pairs against the naive all-shared-tokens DuckDB oracle (quadratic
    in per-token document frequency — affordable only at the proof
    point).  NOTE the fixture's ~31-token vocabulary makes per-replica
    pair density (~965 k verified pairs / 5 k docs at jaccard ≥ 0.9)
    several orders denser than a real crawl — pair volume here carries
    the load of a vastly larger realistic corpus."""
    import duckdb

    specs = all_specs()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    dfs = {n: specs[n].builder(spark, sf_dir) for n in DEDUP_QUERIES}
    COUNTED = ("l2_jaccard_neardup", "l2b_minhash_lsh", "l58_minhash_portable")
    DUCKED = ("l1_exact_dedup", "l58_minhash_portable")

    def run_spark(n) -> int | None:
        if n in COUNTED:
            return dfs[n].count()
        _noop(dfs[n])
        return None

    counts: dict[str, int] = {}
    for n in DEDUP_QUERIES:  # warm both engines
        c = run_spark(n)
        if c is not None:
            counts[n] = c
    for n in DUCKED:
        con.sql(specs[n].oracle).arrow()
    S: dict[str, list] = {n: [] for n in DEDUP_QUERIES}
    D: dict[str, list] = {n: [] for n in DUCKED}
    for _ in range(3):
        for n in DEDUP_QUERIES:
            t0 = time.perf_counter()
            run_spark(n)
            S[n].append(time.perf_counter() - t0)
            if n in DUCKED:
                t0 = time.perf_counter()
                con.sql(specs[n].oracle).arrow()
                D[n].append(time.perf_counter() - t0)
    sp = {n: round(min(v), 3) for n, v in S.items()}
    du = {n: round(min(v), 3) for n, v in D.items()}

    counts["l1_exact_dedup"] = dfs["l1_exact_dedup"].count()
    counts["l2c_simhash"] = dfs["l2c_simhash"].count()
    checks: dict = {}
    values_match = {}
    for n in DUCKED:
        s_ck = _stream_checksum_spark(dfs[n])
        d_ck = _stream_checksum_duck(con, specs[n].oracle, dfs[n].dtypes)
        values_match[n] = s_ck == d_ck
    if prove:
        n = "l2_jaccard_neardup"
        t0 = time.perf_counter()
        s_ck = _stream_checksum_spark(dfs[n])
        d_ck = _stream_checksum_duck(con, specs[n].oracle, dfs[n].dtypes)
        values_match[n] = s_ck == d_ck
        checks["l2_naive_oracle_prove_sec"] = round(
            time.perf_counter() - t0, 1
        )
    checks["values_match"] = values_match
    con.close()

    st = round(sum(sp.values()), 3)
    dt = round(sum(du[n] for n in DUCKED), 3)
    pt = {
        "rep": rep,
        "spark": sp, "duckdb": du,
        "counts": counts,
        "per_replica": {
            n: round(counts[n] / rep, 2) for n in counts
        },
        "spark_total": st,
        "duckdb_portable_total": dt,
        "ratio_portable": round(
            (sp["l1_exact_dedup"] + sp["l58_minhash_portable"]) / dt, 2
        ) if dt else None,
    }
    pt.update(checks)
    return pt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default="5,20,50,100")
    ap.add_argument("--llm-reps", default="",
                    help="documents/embeddings replication factors, e.g."
                         " 100,1000; appends an 'llm' section")
    ap.add_argument("--fuzzy-ns", default="",
                    help="fuzzy-join corpus sizes, e.g. 5000,50000; "
                         "appends a 'fuzzy' section (all-pairs proof "
                         "runs at the smallest point)")
    ap.add_argument("--spatial-reps", default="",
                    help="events replication factors for the spatial "
                         "joins (j20/j21), e.g. 10,100; appends a "
                         "'spatial' section (Spark-vs-DuckDB equality "
                         "proof runs at the smallest point)")
    ap.add_argument("--streaming-reps", default="",
                    help="events replication factors for the T-family "
                         "batch-equivalents (t2/t4/t13) + the x1 "
                         "incremental-replay loop, e.g. 100,1000; "
                         "appends a 'streaming' section (full sorted-"
                         "row equality proof at the smallest point, "
                         "checksum values_match at every point)")
    ap.add_argument("--dedup-reps", default="",
                    help="documents SALTED replication factors for the "
                         "dedup kernels (l1/l2/l2b/l2c/l58), e.g. "
                         "4,16,64; appends a 'dedup' section (naive-"
                         "oracle pair proof at the smallest point, "
                         "portable-oracle checksums + linearity "
                         "invariants at every point)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated parquet between points")
    args = ap.parse_args()
    reps = [int(r) for r in args.reps.split(",") if r]
    # A section-specific run (--llm-reps/--fuzzy-ns/--spatial-reps/
    # --dedup-reps/--streaming-reps) must NOT silently also run the
    # relational ladder and overwrite its section (pre-r11 this
    # required remembering --reps "" — forgetting it clobbered
    # SCALEUP.json's relational points with a default-ladder rerun and
    # skipped the requested section's merge, since every merge guard
    # tests `not reps`).  The relational default now applies only when
    # no section was requested.
    section_args = (args.llm_reps or args.fuzzy_ns or args.spatial_reps
                    or args.dedup_reps or args.streaming_reps)
    if args.reps == ap.get_default("reps") and section_args:
        reps = []

    spark = get_spark(
        app_name="mkpipe_spark_scaleup",
        extra_conf={
            # local-mode driver == executor: size the single JVM for the
            # 60 M-row point (a cluster sizes per-executor instead).
            "spark.driver.memory": "48g",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.locality.wait": "0ms",
            "spark.sql.parquet.columnarReaderBatchSize": "16384",
            # at 60M rows the 16m fixture split target would make ~70
            # scan tasks/file set; fine, AQE coalesces downstream.
            # Wider Arrow batches for the mapInArrow similarity kernel:
            # one BLAS matvec per 64k rows instead of per 10k — the
            # per-batch fixed cost (ffi + reshape) amortizes 6×.
            "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        },
    )

    dedup_reps = sorted(int(x) for x in args.dedup_reps.split(",") if x)
    dedup_points = []
    for i, rep in enumerate(dedup_reps):
        t0 = time.perf_counter()
        d = build_dedup_point(spark, rep)
        gen_sec = round(time.perf_counter() - t0, 1)
        _settle()
        nd = spark.read.parquet(str(d / "documents.parquet")).count()
        pt = time_dedup(spark, str(d), rep, prove=(i == 0))
        pt.update({"documents": nd, "gen_sec": gen_sec})
        dedup_points.append(pt)
        print(json.dumps(pt))
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
    if dedup_points:
        # cross-point linearity: the salt-invariant queries must emit
        # EXACTLY rep × the same per-replica output at every point
        linear_exact = {
            q: len({pt["per_replica"][q] for pt in dedup_points}) == 1
            for q in DEDUP_LINEAR
        }
        try:
            payload = json.loads((Path(REPO) / "SCALEUP.json").read_text())
        except (OSError, ValueError):
            payload = {}
        payload["dedup"] = {
            "note": (
                "dedup kernels on SALTED replication of documents: "
                "every token gets a replica prefix, so replicas are "
                "token-disjoint — corpus GROWS at constant dup rate "
                "(the crawl shape; the llm section's unchanged-text "
                "replication is the complementary re-crawl shape "
                "where dup-group SIZE grows). Pair queries timed to "
                ".count() — pairs ARE the output, the count drives "
                "the full candidate+verify compute. linear_exact: "
                "per-replica output count identical at every point "
                "for the salt-invariant queries (Jaccard/md5 depend "
                "only on within-replica structure); l2b/l58 "
                "legitimately vary per replica (their hash families "
                "see salted tokens as a fresh random draw). DuckDB "
                "runs the registered engine-portable oracles (l1 "
                "hash agg, l58 md5 LSH) with checksum equality "
                "values_match at EVERY point; the smallest point "
                "additionally proves l2's PPJoin pair set against "
                "the naive all-shared-tokens oracle (quadratic in "
                "per-token doc frequency — proof-point-only). The "
                "fixture's ~31-token vocabulary makes per-replica "
                "pair density (~965k pairs / 5k docs at j>=0.9) "
                "orders denser than a real crawl, so pair volume "
                "here carries the load of a much larger realistic "
                "corpus."
            ),
            "queries": list(DEDUP_QUERIES),
            "points": dedup_points,
            "linear_exact": linear_exact,
            "measured_on": _measured_on(),
        }
        (Path(REPO) / "SCALEUP.json").write_text(
            json.dumps(payload, indent=1) + "\n"
        )
        print("merged dedup section into SCALEUP.json")
        if not reps and not args.llm_reps and not args.fuzzy_ns \
                and not args.spatial_reps and not args.streaming_reps:
            spark.stop()
            if not args.keep:
                shutil.rmtree(DATA_ROOT, ignore_errors=True)
            return

    streaming_reps = sorted(int(x) for x in args.streaming_reps.split(",") if x)
    streaming_points = []
    for i, rep in enumerate(streaming_reps):
        t0 = time.perf_counter()
        d = build_streaming_point(spark, rep)
        gen_sec = round(time.perf_counter() - t0, 1)
        _settle()
        nev = spark.read.parquet(str(d / "events.parquet")).count()
        pt = time_streaming(spark, str(d), prove=(i == 0))
        pt.update({"rep": rep, "events": nev, "gen_sec": gen_sec})
        streaming_points.append(pt)
        print(json.dumps(pt))
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
    if streaming_points and not reps and not args.llm_reps \
            and not args.fuzzy_ns and not args.spatial_reps:
        try:
            payload = json.loads((Path(REPO) / "SCALEUP.json").read_text())
        except (OSError, ValueError):
            payload = {}
        payload["streaming"] = {
            "note": (
                "T-family batch-equivalents (t2 tumbling-window agg, t4 "
                "session windows, t13 applyInPandas stateful profile — "
                "the reference's incremental heart, __init__.py:71-115) "
                "on offset-replicated events: ts shifts 31 d/replica "
                "(constant events-per-hour, window count grows), "
                "user_id strides per replica (keyspace grows, per-key "
                "state constant — the dimension streaming state scales "
                "in). Interleaved min-of-5 vs the registered DuckDB "
                "oracles. values_match at EVERY point = per-column "
                "mod-P checksum equality engine-vs-engine (full "
                "sorted-row compare additionally proves the smallest "
                "point: spark_eq_duckdb). x1_* = the 4-chunk "
                "incremental extract→load→commit replay loop end-to-"
                "end with quartile cutoffs (a pipeline, so throughput "
                "not a DuckDB ratio) with the idempotency assert "
                "dest_rows == source_rows."
            ),
            "queries": list(STREAMING_QUERIES),
            "points": streaming_points,
            "measured_on": _measured_on(),
        }
        (Path(REPO) / "SCALEUP.json").write_text(
            json.dumps(payload, indent=1) + "\n"
        )
        print("merged streaming section into SCALEUP.json")
        spark.stop()
        if not args.keep:
            shutil.rmtree(DATA_ROOT, ignore_errors=True)
        return

    spatial_reps = sorted(int(x) for x in args.spatial_reps.split(",") if x)
    spatial_points = []
    for i, rep in enumerate(spatial_reps):
        t0 = time.perf_counter()
        d = build_spatial_point(spark, rep)
        gen_sec = round(time.perf_counter() - t0, 1)
        _settle()
        nev = spark.read.parquet(str(d / "events.parquet")).count()
        pt = time_spatial(spark, str(d), prove=(i == 0))
        pt.update({"rep": rep, "events": nev, "gen_sec": gen_sec})
        spatial_points.append(pt)
        print(json.dumps(pt))
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
    if spatial_points and not reps and not args.llm_reps and not args.fuzzy_ns:
        try:
            payload = json.loads((Path(REPO) / "SCALEUP.json").read_text())
        except (OSError, ValueError):
            payload = {}
        payload["spatial"] = {
            "note": (
                "grid-blocked spatial joins on offset-replicated events "
                "(ts shifts 31 d/replica so interval density is "
                "constant; polygon dims stay real-world size). j20's "
                "DuckDB side is the all-pairs oracle (linear — fixed "
                "polygon set); j21's DuckDB side runs the IDENTICAL "
                "bucket-blocked algorithm (the theta oracle is "
                "unrunnable at scale). spark_eq_duckdb at the smallest "
                "point proves result equality; the j21 id cap lifts "
                "for the scale run."
            ),
            "queries": list(SPATIAL_QUERIES),
            "points": spatial_points,
            "measured_on": _measured_on(),
        }
        (Path(REPO) / "SCALEUP.json").write_text(
            json.dumps(payload, indent=1) + "\n"
        )
        print("merged spatial section into SCALEUP.json")
        spark.stop()
        if not args.keep:
            shutil.rmtree(DATA_ROOT, ignore_errors=True)
        return

    fuzzy_points = []
    fuzzy_ns = sorted(int(x) for x in args.fuzzy_ns.split(",") if x)
    for n in fuzzy_ns:
        t0 = time.perf_counter()
        d = build_fuzzy_point(spark, n)
        gen_sec = round(time.perf_counter() - t0, 1)
        _settle()
        # the O(n^2) oracle is affordable up to ~200k names (244 s);
        # above that only the blocked-vs-blocked engine comparison runs
        pt = time_fuzzy(spark, str(d), n, prove=(n <= 200_000))
        pt["gen_sec"] = gen_sec
        fuzzy_points.append(pt)
        print(json.dumps(pt))
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
    fuzzy_section = None
    if fuzzy_points:
        fuzzy_section = {
            "note": (
                "Ed-Join fuzzy edit-distance self-join (q=3, t=2, "
                "rarest-gram prefix q*t+1) on seeded synthetic name "
                "corpora with ~20% mutated twins; Spark vs the same "
                "blocked ALGORITHM in DuckDB SQL — engine vs engine. "
                "One physical divergence, each engine's measured-"
                "faster choice: Spark verifies multi-gram duplicate "
                "candidates with the banded thresholded levenshtein "
                "and dedups the small true-pair output (12.9 to 5.7 s "
                "at 200k vs dedup-first); DuckDB keeps dedup-first "
                "(2.0 s either way). cand_sec/n_candidates profile "
                "the split (candidates incl. duplicates). blocked_eq_allpairs at the "
                "smallest point proves the blocking complete against "
                "the O(n^2) oracle; spark_eq_duckdb proves pair-set "
                "equality at every point."
            ),
            "points": fuzzy_points,
            "measured_on": _measured_on(),
        }
    if fuzzy_section and not reps and not args.llm_reps:
        try:
            payload = json.loads((Path(REPO) / "SCALEUP.json").read_text())
        except (OSError, ValueError):
            payload = {}
        payload["fuzzy"] = fuzzy_section
        (Path(REPO) / "SCALEUP.json").write_text(
            json.dumps(payload, indent=1) + "\n"
        )
        print("merged fuzzy section into SCALEUP.json")
        spark.stop()
        if not args.keep:
            shutil.rmtree(DATA_ROOT, ignore_errors=True)
        return

    llm_points = []
    llm_rep_list = [int(r) for r in args.llm_reps.split(",") if r]
    for i, rep in enumerate(llm_rep_list):
        t0 = time.perf_counter()
        d = build_llm_point(spark, rep)
        gen_sec = round(time.perf_counter() - t0, 1)
        ndocs = spark.read.parquet(str(d / "documents.parquet")).count()
        nvecs = spark.read.parquet(str(d / "embeddings.parquet")).count()
        _settle()
        sp, du, checks = time_llm(spark, str(d), prove=(i == 0))
        st, dt = round(sum(sp.values()), 3), round(sum(du.values()), 3)
        pt = {
            "rep": rep, "documents": ndocs, "vectors": nvecs,
            "gen_sec": gen_sec, "spark": sp, "duckdb": du,
            "spark_total": st, "duckdb_total": dt,
            "ratio": round(st / dt, 2) if dt else None,
        }
        if checks:
            pt.update(checks)
        llm_points.append(pt)
        print(json.dumps(pt))
        if not args.keep:
            # the point's packed layout lives in the /tmp fingerprint
            # cache — GBs per large point; drop it with the point
            # (fingerprint needs the files' stat, so resolve it BEFORE
            # removing the point dir)
            from mkpipe_extractor_clickhouse_spark.operators.llm_similarity import (  # noqa: E501
                _packed_cache_dir,
            )

            pack_cache = _packed_cache_dir(str(d))
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(pack_cache, ignore_errors=True)
    if llm_points and not reps:
        # --llm-reps-only invocation: merge into the existing artifact
        try:
            payload = json.loads((Path(REPO) / "SCALEUP.json").read_text())
        except (OSError, ValueError):
            payload = {}
        payload["llm"] = {
            "note": (
                "LLM-pipeline kernels on offset-replicated documents/"
                "embeddings (text and vectors unchanged; exact-dup "
                "groups scale by R). l3's DuckDB side uses the native "
                "list_cosine_similarity kernel, not the row-exploded "
                "oracle, to avoid strawmanning DuckDB. ROUND 10: the "
                "REGISTERED l3/l4 builders dispatch to the packed "
                "two-phase kernel whenever the layout is warm, so this "
                "harness builds the layout FIRST (pack_sec, the "
                "vector-index analogue of bucket_gen_sec; pack_cached "
                "flags reuse) and measures the registered builders "
                "themselves — the numbers are what registry users get. "
                "l3_fold_eq_packed at the smallest point asserts the "
                "declarative fold and the packed kernel produce "
                "identical rows. l3/l4/l4c time ONE shared kernel "
                "instance in adjacent slots: later slots are the warm "
                "steady state; the first slot carries Python-worker/"
                "page re-warm after the preceding queries. "
                "Historical r6 decomposition of the retired "
                "list<float> bridge path: "
                "JVM row→Arrow serialization itself, measured by "
                "decomposition at 2.4M×64: JVM scan alone 0.16 s, "
                "scan+bridge passthrough 0.72 s, +NumPy math 0.91 s, "
                "vs DuckDB's in-engine SIMD kernel 0.136 s — a native "
                "vector primitive Spark lacks; per-core throughput "
                "(~3 M vec/s/node) parallelizes embarrassingly on a "
                "cluster. ROUND 9: l4c_packed_topk removes BOTH "
                "previously-measured floors by owning the layout — a "
                "one-time pack (pack_sec, the vector-index analogue of "
                "bucket_gen_sec) stores vectors as plain-encoded "
                "256-byte binary + exact float64 norms, so the page "
                "decode is a memcpy; scoring is an exact two-phase "
                "f32-GEMM screen / f64 refine (l4c_eq_kernel asserts "
                "row equality with the l4 kernel at the smallest "
                "point). l4b (r7's bridge-free pyarrow shard scan over "
                "the ORIGINAL list<float> layout) stays registered and "
                "strict-matched but is RETIRED from these totals — its "
                "refutation stands: pyarrow's dictionary-encoded "
                "list<float> page decode costs more than the bridge it "
                "avoids (0.88 vs 0.51 s at 0.8M; 5.6 vs 2.5 s at "
                "9.6M, r7 measurement)."
            ),
            "queries": list(LLM_QUERIES),
            "points": llm_points,
            "measured_on": _measured_on(),
        }
        (Path(REPO) / "SCALEUP.json").write_text(
            json.dumps(payload, indent=1) + "\n"
        )
        print("merged llm section into SCALEUP.json")
        spark.stop()
        if not args.keep:
            shutil.rmtree(DATA_ROOT, ignore_errors=True)
        return

    points = []
    for rep in reps:
        t0 = time.perf_counter()
        d = build_point(spark, rep)
        gen_sec = round(time.perf_counter() - t0, 1)
        nrows = spark.read.parquet(str(d / "lineitem.parquet")).count()
        # Bucketed co-located layout (the round-6 ask): same queries,
        # fact tables bucketed by order key so the fact join runs with
        # zero exchange. Built BEFORE the timing window so both layouts
        # are measured interleaved; spark_bucketed_total substitutes
        # the bucketed q3/q10/j11 walls into the headline set (q1 is
        # scan+agg, no join — unchanged).
        bucket_gen_sec = build_bucketed_tables(spark, str(d))
        _settle()
        s, sb, k = time_point_interleaved(spark, str(d))
        st, kt = round(sum(s.values()), 3), round(sum(k.values()), 3)
        pt = {
            "rep": rep,
            "lineitem_rows": nrows,
            "gen_sec": gen_sec,
            "spark": s,
            "duckdb": k,
            "spark_total": st,
            "duckdb_total": kt,
            "ratio": round(st / kt, 2) if kt else None,
            "bucket_gen_sec": bucket_gen_sec,
            "spark_bucketed": sb,
        }
        sbt = round(sum(sb.values())
                    + sum(v for q, v in s.items()
                          if q not in BUCKETED_QUERIES), 3)
        pt["spark_bucketed_total"] = sbt
        pt["ratio_bucketed"] = round(sbt / kt, 2) if kt else None
        if rep == reps[-1]:
            # value-consistency proof at the LARGEST point (overflow &
            # scale-dependent bugs live here, not at the driver's sf)
            pt["values_match"] = verify_values(spark, str(d))
            pt["bucketed_matches_plain"] = verify_bucketed(spark, str(d))
        for tbl in ("li_bx", "o_bx"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        points.append(pt)
        print(json.dumps(pt))
        if not args.keep and rep != reps[-1]:
            shutil.rmtree(d, ignore_errors=True)

    try:  # keep an existing llm section across shuffle-query refreshes
        prev = json.loads((Path(REPO) / "SCALEUP.json").read_text())
    except (OSError, ValueError):
        prev = {}
    payload = {
        "note": (
            "headline shuffle queries (q1 grouped agg, q3/q10 fact-fact "
            "join + top-k, j11 star join) on FK-consistent offset "
            "replication of sf0.1; INTERLEAVED min-of-5 steady wall "
            "(each rep runs Spark-plain, Spark-bucketed, DuckDB "
            "back-to-back — host noise cancels in ratios), Spark noop "
            "sink vs DuckDB Arrow materialization, same host, 32-way "
            "parquet layout for both engines; values_match at the "
            "largest point = per-query Spark-vs-DuckDB result equality "
            "(rounded 1e-6) at the largest point. spark_bucketed = the same "
            "q3/q10/j11 with lineitem/orders bucketed by order key "
            "(32 buckets, murmur3) so the fact join is co-located and "
            "exchange-free; the one-time layout cost is bucket_gen_sec "
            "and bucketed_matches_plain asserts bit-identical results "
            "at the largest point. DuckDB keeps its best layout (plain "
            "32-way parquet; it has no co-located-join equivalent to "
            "amortize)."
        ),
        "base_sf_dir": BASE_SF,
        "queries": list(QUERIES),
        "points": points,
        "generated_by": "scripts/bench_scaleup.py",
        "measured_on": _measured_on(),
        **({"llm": prev["llm"]} if "llm" in prev else {}),
        **({"spatial": prev["spatial"]} if "spatial" in prev else {}),
        **({"streaming": prev["streaming"]} if "streaming" in prev else {}),
        **({"dedup": prev["dedup"]} if "dedup" in prev else {}),
        **(
            {"fuzzy": fuzzy_section}
            if fuzzy_section
            else ({"fuzzy": prev["fuzzy"]} if "fuzzy" in prev else {})
        ),
    }
    (Path(REPO) / "SCALEUP.json").write_text(json.dumps(payload, indent=1) + "\n")
    print("wrote SCALEUP.json")
    spark.stop()
    if not args.keep:
        shutil.rmtree(DATA_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
