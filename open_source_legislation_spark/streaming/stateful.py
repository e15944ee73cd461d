"""Custom stateful streaming operator — ``applyInPandasWithState``.

Streaming sessionization by inactivity gap: the streaming twin of the batch
``window_session`` contract query (queries.py), and the shape any custom
stateful operator takes in this engine (north-rule §2.11: arbitrary state
the built-in windowed aggs can't express).

Semantics (same as the batch query): per ``user_id``, events more than
``gap_seconds`` apart start a new session; a session row is
``(user_id, session_start, session_end, n_events, session_value)``.

State design for 10^12 events: one OPEN session per key (4 scalars — never
a buffer of events), updated per micro-batch; sessions CLOSED by an
observed later event emit immediately; the trailing open session emits on
event-time timeout once the watermark passes ``last_ts + gap``. State is
therefore O(#active users), bounded by the watermark, and lives in the
stream checkpoint (RocksDB on a real cluster) — a killed stream resumes
exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# open-session carry: start/last as epoch micros (int64 — timestamps in
# state structs round-trip as plain longs), count, value sum
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """``events`` is a STREAMING frame with (user_id, ts, value, ...).

    Returns the streaming session frame (append mode). Each key's state is
    the single open session; closed sessions flush per batch, the last one
    flushes via event-time timeout.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        def emit(start_us: int, last_us: int, n: int, vsum: float) -> None:
            out.append(
                (
                    user_id,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(last_us, unit="us"),
                    int(n),
                    float(vsum),
                )
            )

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is final
            if state.exists:
                emit(*state.get)
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts", kind="mergesort")
            # pandas datetime64[ns] → epoch nanos; carry state in micros
            ts_us = rows["ts"].astype("int64").to_numpy() // 1_000
            vals = rows["value"].astype("float64").to_numpy()

            if state.exists:
                start_us, last_us, n, vsum = state.get
            else:
                start_us, last_us, n, vsum = None, None, 0, 0.0

            for t_us, v in zip(ts_us, vals):
                if start_us is None:
                    start_us, last_us, n, vsum = int(t_us), int(t_us), 1, float(v)
                elif t_us - last_us > gap_us:
                    emit(start_us, last_us, n, vsum)  # closed by the gap
                    start_us, last_us, n, vsum = int(t_us), int(t_us), 1, float(v)
                else:
                    last_us, n, vsum = int(t_us), n + 1, vsum + float(v)

            state.update((start_us, last_us, n, vsum))
            # flush the trailing session once event time passes last + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "session_value",
            ],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
