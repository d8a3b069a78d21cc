"""Custom stateful streaming operator: event sessionization.

The reference's streaming sources keep per-key state machines (schema
history, incremental-snapshot windows, transaction boundaries) inside the
connector loop; the Spark-native equivalent for *user-defined* per-key
state is ``applyInPandasWithState`` (Arrow-batched, event-time timeouts,
watermark-driven eviction). This module implements session windows over an
event stream both ways:

- ``sessionize_batch``: pure Catalyst (lag → gap flag → running session id
  → aggregate) — the deterministic batch semantics, used as the oracle;
- ``sessionize_stream``: the Structured Streaming operator. Per-key state
  holds every not-yet-confirmed session; a session emits only when the
  event-time watermark passes ``last_ts + gap_ms`` (event-time timeout) —
  at that point no admissible event can still attach, so the stream equals
  the batch semantics even for out-of-order arrivals within the watermark
  delay (a late event may lower a pending session's start, merge pending
  sessions, or open an earlier one). Append mode, exactly once per session.

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
    ArrayType,
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
        StructField("starts", ArrayType(LongType()), True),
        StructField("lasts", ArrayType(LongType()), True),
        StructField("ns", ArrayType(LongType()), True),
        StructField("cents", ArrayType(LongType()), True),
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


def _make_session_fn(gap_ms: int):
    """Factory: the per-key state machine, closing over the gap.

    State holds EVERY session not yet confirmed closed — a session only
    emits once the event-time watermark passes ``last + gap`` (no event at
    or after the watermark can attach to it: attachment needs
    ``t <= last + gap < watermark <= t``). Holding sessions until the
    watermark — instead of closing eagerly when a later event shows a gap —
    is what makes the stream equal the batch semantics under out-of-order
    arrival within the watermark delay: a late event may lower a pending
    session's start, merge two pending sessions, or open an earlier one."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            starts, lasts, ns, cents = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns, cents)]
        else:
            sessions = []

        if not state.hasTimedOut:
            chunks = [c for c in pdfs if len(c)]
            if chunks:
                rows = pd.concat(chunks, ignore_index=True).sort_values(
                    ["ts_ms", "event_id"]
                )
                for r in rows.itertuples():
                    t, c = int(r.ts_ms), int(r.cents)
                    hit = [s for s in sessions
                           if s[0] - gap_ms <= t <= s[1] + gap_ms]
                    rest = [s for s in sessions
                            if not (s[0] - gap_ms <= t <= s[1] + gap_ms)]
                    merged = [
                        min([t] + [s[0] for s in hit]),
                        max([t] + [s[1] for s in hit]),
                        1 + sum(s[2] for s in hit),
                        c + sum(s[3] for s in hit),
                    ]
                    sessions = rest + [merged]

        wm = state.getCurrentWatermarkMs()
        closed = sorted(s for s in sessions if s[1] + gap_ms < wm)
        open_ = [s for s in sessions if s[1] + gap_ms >= wm]
        if open_:
            state.update((
                [s[0] for s in open_], [s[1] for s in open_],
                [s[2] for s in open_], [s[3] for s in open_],
            ))
            # must be strictly beyond the watermark; min horizon of the
            # surviving sessions is >= wm by construction
            state.setTimeoutTimestamp(min(s[1] + gap_ms for s in open_) + 1)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                [{"user_id": user_id, "session_start_ms": s0, "session_end_ms": s1,
                  "n_events": n, "sum_cents": cc} for (s0, s1, n, cc) in closed]
            )

    return fn


def sessionize_stream(
    events_stream: DataFrame, gap_ms: int, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Streaming session windows. ``events_stream`` needs columns
    (event_id, user_id, ts timestamp, cents long); emits one row per CLOSED
    session, exactly once, identical to ``sessionize_batch`` for any
    arrival order within the watermark delay (later-than-watermark events
    are dropped by Spark's watermark, as in any event-time operator).
    A session closes only when the watermark passes last_ts + gap
    (event-time timeout) — never merely because a later event showed a
    gap, since a late event could still fill it."""
    prepared = (
        events_stream.withWatermark("ts", watermark_delay)
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            "cents",
            F.col("ts"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
