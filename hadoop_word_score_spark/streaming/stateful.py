"""Custom stateful streaming operator (SURVEY §2.9/§2.11): running per-user
aggregates via ``applyInPandasWithState``.

This is the escape hatch for stream semantics the built-in windowed
aggregations can't express — arbitrary per-key state evolved batch-by-batch.
State lives in Spark's checkpointed state store (RocksDB-backed on a real
cluster); a processing-time timeout evicts idle keys so state stays bounded
on unbounded streams — the 100 TB requirement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _make_update_fn(evict_idle: bool):
    def update_user_totals(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's rows for one user into running totals.

        Emits the updated totals once per (user, batch) — an append-mode
        running counter. Idle users time out and their state is dropped.
        """
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if evict_idle:
            state.setTimeoutDuration(3600 * 1000)  # drop after 1h idle
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return update_user_totals


def running_user_totals(events: DataFrame, evict_idle: bool = False) -> DataFrame:
    """Per-user running (count, sum) over an event stream.

    Grouping keys hash-partition the stream once; state is co-partitioned
    with the keys, so each micro-batch shuffles only its own rows.

    ``evict_idle=True`` enables processing-time state eviction for
    continuous production streams (unbounded key spaces). It stays off for
    ``Trigger.AvailableNow`` drains: the timeout bookkeeping forces extra
    empty micro-batches that the available-now planner waits on
    indefinitely (observed hang on Spark 4.1 local mode).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(evict_idle),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
