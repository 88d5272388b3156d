"""Direct unit tests for the as-of join operator, including the
null-payload case the window-fill formulation gets wrong if payload
columns are filled independently (all matched fields must come from
the same right row — ASOF JOIN semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mkpipe_extractor_clickhouse_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_null_payload_not_resurrected(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T03:00:00"), "L1")], ["k", "ts", "lpay"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), 5.0),
            (1, _ts("2024-01-01T02:00:00"), None),  # latest prior: NULL payload
        ],
        ["k", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = asof_join(left, right, on="ts", by="k").collect()
    assert len(out) == 1
    row = out[0]
    # match is the 02:00 row — its NULL payload must NOT be replaced by
    # the 01:00 row's 5.0
    assert row.ts_right == _ts("2024-01-01T02:00:00")
    assert row.value_right is None


def test_asof_basics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:30:00")),  # before any right row
            (1, _ts("2024-01-01T01:00:00")),  # exact tie with right ts
            (2, _ts("2024-01-01T05:00:00")),  # other key
        ],
        ["k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), 10.0),
            (2, _ts("2024-01-01T04:00:00"), 20.0),
            (2, _ts("2024-01-01T06:00:00"), 30.0),
        ],
        ["k", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rows = {
        (r.k, r.ts): (r.ts_right, r.value_right)
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert rows[(1, _ts("2024-01-01T00:30:00"))] == (None, None)  # no prior
    assert rows[(1, _ts("2024-01-01T01:00:00"))] == (
        _ts("2024-01-01T01:00:00"),
        10.0,
    )  # ties match
    assert rows[(2, _ts("2024-01-01T05:00:00"))] == (
        _ts("2024-01-01T04:00:00"),
        20.0,
    )  # latest at-or-before, not the later row


def test_asof_duplicate_right_ts_deterministic(spark):
    """Two right rows sharing an exact (key, ts): the operator must pick
    the max-payload row deterministically (struct-max tie-break), the
    same collapse j10's oracle applies via MAX(value) GROUP BY — so the
    engine/oracle comparison stays exact if fixtures ever carry ties."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T02:00:00"))], ["k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), 7.0),
            (1, _ts("2024-01-01T01:00:00"), 3.0),  # exact (k, ts) duplicate
            (1, _ts("2024-01-01T01:00:00"), 5.0),
        ],
        ["k", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    for _ in range(3):  # stable across repeated plans/shuffles
        out = asof_join(left, right, on="ts", by="k").collect()
        assert len(out) == 1
        assert out[0].ts_right == _ts("2024-01-01T01:00:00")
        assert out[0].value_right == 7.0
