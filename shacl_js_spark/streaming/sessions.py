"""Custom stateful streaming operator: per-user sessionization with
`applyInPandasWithState` — the arbitrary-stateful-processing shape Structured
Streaming reserves for semantics that watermarked windows can't express
(session gap timeout, running per-session aggregates, emit-on-close).

State per user: (session_start_ms, last_ts_ms, n_events, total_value).
An event more than `gap` after the previous one closes the current session
(emitting a row) and opens a new one; a processing-time timeout closes idle
sessions.  The same gap rule as events_sessions' batch window query — the
batch twin (`sessionize_batch`) is asserted equal in tests, which is the
correctness anchor for the stateful path.

Scale: state is hash-partitioned by user_id across executors; each
micro-batch touches only the users present in it + timed-out state rows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_ms", LongType()),
    StructField("session_end_ms", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("session_start_ms", LongType()),
    StructField("last_ts_ms", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

GAP_MS = 1_800_000  # 30 min, same rule as the events_sessions batch query


def _make_sessionizer(gap_ms: int, with_timeout: bool):
    """State function closing over the gap (serialized to executors via
    cloudpickle) — the gap_ms parameter must actually take effect, not the
    module constant.  with_timeout mirrors the timeoutConf: registering a
    timeout in NoTimeout mode raises, but in timeout mode a registration
    failure must PROPAGATE (swallowing it silently disables idle-session
    closing — data loss)."""

    def _sessionize_user(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s0, last, n, tot = state.get
                closed.append((user_id, s0, last, n, tot))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_ms")
            cur = state.get if state.exists else None
            for ts, val in zip(rows["ts_ms"], rows["value"]):
                ts, val = int(ts), float(val)
                if cur is None:
                    cur = (ts, ts, 1, val)
                elif ts - cur[1] > gap_ms:
                    closed.append((user_id, *cur))
                    cur = (ts, ts, 1, val)
                else:
                    cur = (cur[0], ts, cur[2] + 1, cur[3] + val)
            if cur is not None:
                state.update(cur)
                if with_timeout:
                    state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    return _sessionize_user


def sessionize_stream(
    events: DataFrame, gap_ms: int = GAP_MS, timeout: str | None = None
) -> DataFrame:
    """events stream -> closed-session rows via per-user arbitrary state.

    timeout: GroupStateTimeout.ProcessingTimeTimeout closes idle sessions
    on a wall-clock timer — the LIVE-stream mode, but it keeps scheduling
    micro-batches, so an availableNow file replay never terminates; use the
    default NoTimeout for finite replays (open sessions simply stay in
    state, matching the closed-sessions-only contract)."""
    prepped = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        (F.unix_timestamp(F.col("ts").cast("timestamp")) * 1000).alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
    )
    conf = timeout or GroupStateTimeout.NoTimeout
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_ms, with_timeout=conf != GroupStateTimeout.NoTimeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


def sessionize_batch(events: DataFrame, gap_ms: int = GAP_MS) -> DataFrame:
    """Batch twin of the stateful operator (lag-window gap rule) — the
    correctness anchor: identical closed sessions modulo the final
    still-open session per user, which only the stream's timeout closes."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_ms")
    prepped = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        (F.unix_timestamp(F.col("ts").cast("timestamp")) * 1000).alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
    )
    marked = prepped.withColumn("prev", F.lag("ts_ms").over(w)).withColumn(
        "new_sess",
        F.when(F.col("prev").isNull() | (F.col("ts_ms") - F.col("prev") > gap_ms), 1)
        .otherwise(0),
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("sess_id")
