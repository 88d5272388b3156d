"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 / north-star "custom stateful operators").

Operator: per-user running profile — event count, quantized value sum,
and last-seen timestamp — maintained as explicit GroupState across
micro-batches, emitting the updated profile row for every user touched
in a batch. This is the streaming form of d4_grouped_map_udaf; the
parity test replays the event chunks with Trigger.AvailableNow and
asserts the final state equals the batch aggregation.

At scale: state is partitioned by the grouping key across the state
store (RocksDB in production), one profile row per user — size bounded
by |users|, not |events|.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("scaled_sum", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def _quantize_scaled(values) -> "np.ndarray":
    """The per-row arithmetic of the profile state: value × 1e6,
    half-away-from-zero to int64 (np.round is banker's, so trunc +
    copysign; matches operators/_determinism).  One definition shared
    by the sequential fold below and the batch two-phase fold in
    batch_equiv.t13, so every execution path runs identical
    quantization."""
    import numpy as np

    y = values * 1_000_000
    return np.trunc(y + np.copysign(0.5, y)).astype("int64")


def _fold_profile(
    acc: tuple[int, int, int], pdfs: Iterable[pd.DataFrame]
) -> tuple[int, int, int]:
    """Shared accumulation for both stateful APIs — one definition of
    the quantized arithmetic keeps the two operators in lockstep."""
    n, scaled_sum, last_id = acc
    for pdf in pdfs:
        n += len(pdf)
        scaled_sum += int(_quantize_scaled(pdf["value"].to_numpy()).sum())
        last_id = max(last_id, int(pdf["event_id"].max()))
    return n, scaled_sum, last_id


def _emit_profile(key: tuple[Any, ...], acc: tuple[int, int, int]) -> pd.DataFrame:
    n, scaled_sum, last_id = acc
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [scaled_sum / 1_000_000.0],
            "last_event_id": [last_id],
        }
    )


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    acc = tuple(state.get) if state.exists else (0, 0, -1)
    acc = _fold_profile(acc, pdfs)
    state.update(acc)
    yield _emit_profile(key, acc)


def user_profiles(stream: DataFrame) -> DataFrame:
    """Apply the stateful profile operator to an events stream."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---- transformWithState (Spark 4 arbitrary-state API) ----------------
# The successor to applyInPandasWithState: explicit typed state handles
# (ValueState/ListState/MapState), timers, and TTL support, backed by
# the RocksDB state store provider.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserProfileProcessor(StatefulProcessor):
    """Same per-user running profile as _update_profile, on the new
    API: one ValueState row per user (n, scaled_sum, last_event_id)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
        acc = tuple(self._state.get()) if self._state.exists() else (0, 0, -1)
        acc = _fold_profile(acc, rows)
        self._state.update(acc)
        yield _emit_profile(key, acc)

    def close(self) -> None:
        pass


def user_profiles_tws(stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas form of user_profiles — requires
    spark.sql.streaming.stateStore.providerClass=ROCKSDB_PROVIDER."""
    return (
        stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserProfileProcessor(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---- streaming top-k (bounded per-key state) --------------------------

TOPK_K = 5

TOPK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("rank", T.LongType()),
    ]
)

# state: parallel arrays of the current top-k (value quantized to 1e-6
# longs — the determinism convention — so merge order never shifts ties)
_TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vq", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def _update_topk(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge the batch's rows into the kept top-k and emit the full
    current top-k for the key.  State is O(k) per key regardless of
    stream length — the property that makes per-key leaderboards safe
    on an unbounded stream (a windowed agg would grow with
    cardinality, a sort would need the whole history)."""
    import numpy as np

    if state.exists:
        vq, ids = list(state.get[0]), list(state.get[1])
    else:
        vq, ids = [], []
    for pdf in pdfs:
        y = pdf["value"].to_numpy() * 1_000_000
        q = np.trunc(y + np.copysign(0.5, y)).astype("int64")
        vq.extend(int(x) for x in q)
        ids.extend(int(x) for x in pdf["event_id"].to_numpy())
    order = sorted(range(len(vq)), key=lambda i: (-vq[i], ids[i]))[:TOPK_K]
    vq = [vq[i] for i in order]
    ids = [ids[i] for i in order]
    state.update((vq, ids))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(ids),
            "event_id": ids,
            "value": [x / 1_000_000.0 for x in vq],
            "rank": list(range(1, len(ids) + 1)),
        }
    )


def stream_topk(stream: DataFrame) -> DataFrame:
    """Streaming per-key top-k leaderboard via applyInPandasWithState —
    the custom stateful operator Structured Streaming lacks natively
    (rank() over a stream is unsupported; a complete-mode agg re-sorts
    everything).  Emits the updated top-k per touched key each
    micro-batch; the final emission per key equals the batch
    w8/t12-style window top-k (parity test in tests/test_streaming.py)."""
    return (
        stream.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_topk,
            outputStructType=TOPK_OUT_SCHEMA,
            stateStructType=_TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
