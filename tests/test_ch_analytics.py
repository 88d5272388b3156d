"""Unit invariants for the ClickHouse analytic-parity operators
(operators/ch_analytics.py) and the SemDeDup delete-list — properties
the DuckDB hash-match can't state directly: bucket-range totality,
sweep-line bounds, counter-fold non-negativity, and the quantized
cosine agreeing with NumPy's float64 dot to within the quantization
step."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from mkpipe_extractor_clickhouse_spark.operators.ch_analytics import HIST_BINS
from mkpipe_extractor_clickhouse_spark.operators.llm_dedup import SEMDEDUP_T
from mkpipe_extractor_clickhouse_spark.registry import all_specs

SPECS = all_specs()


def _run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir).collect()


def test_histogram_buckets_total_and_bounded(spark, sf_dir):
    rows = _run("ch_histogram", spark, sf_dir)
    n_events = SPECS["s5_partitioned_parallel_read"].builder(spark, sf_dir)
    total_events = sum(r.n_rows for r in n_events.collect())
    assert sum(r.n_rows for r in rows) == total_events
    for r in rows:
        assert 0 <= r.bucket_id < HIST_BINS
        assert r.min_val <= r.max_val
    # buckets tile the range: sorted by id, value intervals never overlap
    by_id = sorted(rows, key=lambda r: r.bucket_id)
    for a, b in zip(by_id, by_id[1:]):
        assert a.max_val <= b.min_val


def test_max_intersections_bounds(spark, sf_dir):
    rows = _run("ch_max_intersections", spark, sf_dir)
    assert rows, "no days produced"
    for r in rows:
        # at least one interval is live at its own start; never more
        # than the number of users that day can be live at once
        assert r.max_concurrent >= 1


def test_delta_sum_nonnegative_and_zero_for_singletons(spark, sf_dir):
    rows = _run("ch_delta_sum", spark, sf_dir)
    for r in rows:
        assert r.delta_sum >= 0.0
        if r.n_events == 1:
            assert r.delta_sum == 0.0


def test_replacing_final_one_row_per_key(spark, sf_dir):
    rows = _run("ch_replacing_final", spark, sf_dir)
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))


def test_dict_get_matches_join_cardinality(spark, sf_dir):
    rows = _run("ch_dict_get", spark, sf_dir)
    customers = pq.read_table(f"{sf_dir}/customer.parquet").num_rows
    assert sum(r.n_customers for r in rows) == customers
    assert all(r.nation is not None for r in rows)


def test_semdedup_cosines_match_numpy(spark, sf_dir):
    """The quantized-long dot product used by l32 must agree with a
    float64 NumPy reference to within the 1e-12 quantization step
    (×64 addends), and every reported pair must truly clear the
    threshold."""
    rows = _run("l32_semdedup", spark, sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        i: np.asarray(v, dtype=np.float64)
        for i, v in zip(t["vec_id"], t["embedding"])
    }
    labels = dict(zip(t["vec_id"], t["label"]))
    for r in rows:
        assert r.max_cosine >= SEMDEDUP_T - 1e-9
        v = vecs[r.vec_id]
        best = max(
            float(v @ u / (np.linalg.norm(v) * np.linalg.norm(u)))
            for i, u in vecs.items()
            if i < r.vec_id and labels[i] == labels[r.vec_id]
        )
        assert best == pytest.approx(r.max_cosine, abs=5e-6)


def test_global_shuffle_is_permutation(spark, sf_dir):
    rows = _run("l33_global_shuffle", spark, sf_dir)
    docs = pq.read_table(f"{sf_dir}/documents.parquet").num_rows
    assert len(rows) == docs
    assert len({r.doc_id for r in rows}) == docs
    # positions within each shard are 1..n_shard contiguous
    shards: dict[int, list[int]] = {}
    for r in rows:
        shards.setdefault(r.shard_id, []).append(r.pos)
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_sample_key_all_or_nothing_per_user(spark, sf_dir):
    """ch_sample_key's contract: sampling is by user-hash, so a user is
    either fully in or fully out — re-deriving the sampled user set and
    summing their full event counts must reproduce sampled_rows."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table
    from mkpipe_extractor_clickhouse_spark.operators.ch_sql_features import (
        _HASH_MOD,
        _KNUTH_A,
        _SAMPLE_DENOM,
    )

    got = {
        r.event_type: r.sampled_rows
        for r in SPECS["ch_sample_key"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    h = F.pmod(F.col("user_id") * F.lit(_KNUTH_A), F.lit(_HASH_MOD))
    sampled_users = {
        r.user_id
        for r in ev.select("user_id")
        .distinct()
        .filter(h * _SAMPLE_DENOM < _HASH_MOD)
        .collect()
    }
    want = {
        r.event_type: r.n
        for r in ev.filter(F.col("user_id").isin(list(sampled_users)))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) > 0


def test_with_fill_interpolate_densifies_and_carries(spark, sf_dir):
    """Every calendar day in [min, max] appears exactly once; filled
    rows have NULL revenue but a non-null carried value equal to the
    previous observed revenue."""
    rows = sorted(
        SPECS["ch_with_fill_interpolate"].builder(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    days = [r.day for r in rows]
    assert len(days) == (days[-1] - days[0]).days + 1
    assert len(set(days)) == len(days)
    carried = None
    for r in rows:
        if r.revenue is not None:
            carried = r.revenue
            assert r.revenue_filled == r.revenue
        else:
            assert r.n_orders == 0
            assert r.revenue_filled == carried
    assert any(r.revenue is None for r in rows)


def test_returning_users_bounded_by_actives(spark, sf_dir):
    """returning(d) ≤ distinct actives on d and on d-1."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table

    ret = {
        r.day: r.returning_users
        for r in SPECS["ch_returning_users"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    act = {
        r.day: r.n
        for r in ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    import datetime

    assert len(ret) > 0
    for day, n in ret.items():
        assert n <= act[day]
        assert n <= act[day - datetime.timedelta(days=1)]


def test_histogram_quantile_within_bucket_of_exact(spark, sf_dir):
    """a15's histogram p50/p95 must land within one bucket width of the
    exact percentiles — the accuracy contract of the mergeable path."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table
    from mkpipe_extractor_clickhouse_spark.operators.ch_aggregates import (
        HIST_BUCKET,
        a15_histogram_quantile,
    )

    import math

    est = {
        r.event_type: (r.p50_est, r.p95_est)
        for r in a15_histogram_quantile(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    # type-1 (non-interpolated) quantile: the smallest observed value
    # with cdf >= p — the order statistic the histogram brackets.
    # (Interpolated `percentile` can land mid-gap between data points,
    # which no histogram of the DATA should be expected to hit.)
    by_type = {
        r.event_type: sorted(v for v in r.vals)
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    for et, (p50e, p95e) in est.items():
        vals = by_type[et]
        q1_50 = vals[math.ceil(0.5 * len(vals)) - 1]
        q1_95 = vals[math.ceil(0.95 * len(vals)) - 1]
        assert abs(p50e - q1_50) <= HIST_BUCKET
        assert abs(p95e - q1_95) <= HIST_BUCKET


def test_lttb_invariants(spark, sf_dir):
    """LTTB: per series exactly min(n, k) points, both endpoints kept,
    every kept point is a real input point, deterministic rerun."""
    from pyspark.sql import functions as F

    from mkpipe_extractor_clickhouse_spark.catalog import load_table
    from mkpipe_extractor_clickhouse_spark.operators.ch_analytics import (
        LTTB_BUCKETS,
        ch_lttb_downsample,
    )

    out = ch_lttb_downsample(spark, sf_dir)
    rows = out.collect()
    ev = load_table(spark, sf_dir, "events")
    per_series = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, pts in by_type.items():
        assert len(pts) == min(per_series[t], LTTB_BUCKETS)
        xs = sorted(p.x for p in pts)
        # endpoints survive
        bounds = (
            ev.filter(F.col("event_type") == t)
            .agg(
                F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mn"),
                F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mx"),
            )
            .first()
        )
        assert xs[0] == bounds.mn and xs[-1] == bounds.mx
    # kept points are genuine input rows (event_id join-back)
    kept_ids = {r.event_id for r in rows}
    all_ids = {r.event_id for r in ev.select("event_id").collect()}
    assert kept_ids <= all_ids
    # deterministic rerun
    again = {tuple(r) for r in ch_lttb_downsample(spark, sf_dir).collect()}
    assert {tuple(r) for r in rows} == again
