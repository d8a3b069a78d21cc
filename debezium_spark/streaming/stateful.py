"""Custom stateful streaming operator: event sessionization.

The reference's streaming sources keep per-key state machines (schema
history, incremental-snapshot windows, transaction boundaries) inside the
connector loop; the Spark-native equivalent for *user-defined* per-key
state is ``applyInPandasWithState`` (Arrow-batched, event-time timeouts,
watermark-driven eviction). This module implements session windows over an
event stream both ways:

- ``sessionize_batch``: pure Catalyst (lag → gap flag → running session id
  → aggregate) — the deterministic batch semantics, used as the oracle;
- ``sessionize_stream``: the Structured Streaming operator with per-key
  state {session_start, last_ts, n, sum_cents}, closing a session when a
  new event arrives more than ``gap_ms`` after the last, or when the
  event-time watermark passes ``last_ts + gap_ms`` (timeout). Emits only
  CLOSED sessions (append mode), exactly once per session.

Scale shape: state is per key, partitioned by the groupBy shuffle; Arrow
batches carry each key group; the watermark bounds state size (idle keys
evict on timeout) — the standard unbounded-stream sessionization layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_ms", LongType(), False),
        StructField("session_end_ms", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_cents", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), True),
        StructField("last_ms", LongType(), True),
        StructField("n", LongType(), True),
        StructField("cents", LongType(), True),
    ]
)


def sessionize_batch(events: DataFrame, gap_ms: int) -> DataFrame:
    """Batch session windows: per user, events closer than ``gap_ms`` chain
    into one session. lag → boundary flag → running count = session id →
    one aggregate. (Window per key is fine here: sessions only make sense
    ordered per key, and the partial aggregate does the heavy lifting.)"""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    newsess = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    sess = events.withColumn("_new", newsess).withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "_sid")
        .agg(
            F.min("ts_ms").alias("session_start_ms"),
            F.max("ts_ms").alias("session_end_ms"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .drop("_sid")
        .select("user_id", "session_start_ms", "session_end_ms", "n_events", "sum_cents")
    )


def _session_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Per-key state machine. Input rows are one key's events for this
    micro-batch; state holds the open session."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, cents = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "session_start_ms": start, "session_end_ms": last,
              "n_events": n, "sum_cents": cents}]
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_ms", "event_id"])
    if state.exists:
        start, last, n, cents = state.get
    else:
        start = last = None
        n = cents = 0
    closed = []
    gap_ms = int(rows["gap_ms"].iloc[0])
    for r in rows.itertuples():
        t, c = int(r.ts_ms), int(r.cents)
        if last is not None and t - last > gap_ms:
            closed.append((start, last, n, cents))
            start, last, n, cents = t, t, 1, c
        else:
            if start is None:
                start = t
            last = max(last or t, t)
            n += 1
            cents += c
    state.update((start, last, n, cents))
    # evict when the watermark passes the session's gap horizon
    state.setTimeoutTimestamp(last + gap_ms)
    if closed:
        yield pd.DataFrame(
            [{"user_id": user_id, "session_start_ms": s, "session_end_ms": e,
              "n_events": nn, "sum_cents": cc} for (s, e, nn, cc) in closed]
        )


def sessionize_stream(
    events_stream: DataFrame, gap_ms: int, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Streaming session windows. ``events_stream`` needs columns
    (event_id, user_id, ts timestamp, cents long); emits one row per CLOSED
    session. Sessions close either when a later event proves the gap or
    when the watermark passes last_ts + gap (event-time timeout)."""
    prepared = (
        events_stream.withWatermark("ts", watermark_delay)
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            "cents",
            F.lit(gap_ms).alias("gap_ms"),
            F.col("ts"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
