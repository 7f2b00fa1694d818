"""Stateful streaming sessionization (applyInPandasWithState).

The streaming twin of ``driver_queries.q_events_sessionize``: events
arrive on an unbounded stream, state keeps at most ONE open session per
user (three longs), and a session row is emitted the moment an event
lands more than ``gap_s`` after the open session's last event.  This is
the custom-stateful-operator shape the reference pipeline needs for
telemetry at ingest time — per-key state lives in Spark's state store
(RocksDB/HDFS-backed on a cluster), so the operator scales with
executors and survives restarts via the checkpoint, while the per-call
Python work is one vectorized pandas pass over the micro-batch's rows
for that key.

Ordering contract: rows are processed in (ts_s, event_id) order WITHIN
each micro-batch; across micro-batches the stream is assumed per-user
time-ordered (true of the append-only ingest logs this models).  An
event with ``event_id < 0`` is a FLUSH SENTINEL: it closes and emits the
user's open session without starting a new one — the deterministic
stand-in for a timeout-based close (processing-time timeouts cannot be
asserted bit-exactly in tests; production would pair this with
``GroupStateTimeout.ProcessingTimeTimeout`` and the same `_close` path).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from frankensearch_spark.streaming._shim import NoState as _NoState
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("n_events", LongType()),
    ]
)

# (open_start_s, open_last_s, open_n)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_s, last_s, n = state.get
    else:
        start_s = last_s = n = None
    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_s", "event_id"])
        for ts, eid in zip(pdf["ts_s"].to_numpy(), pdf["event_id"].to_numpy()):
            if eid < 0:  # flush sentinel
                if start_s is not None:
                    closed.append((user_id, int(start_s), int(last_s), int(n)))
                    start_s = last_s = n = None
                continue
            if start_s is None:
                start_s, last_s, n = int(ts), int(ts), 1
            elif int(ts) - last_s > gap_s:
                closed.append((user_id, int(start_s), int(last_s), int(n)))
                start_s, last_s, n = int(ts), int(ts), 1
            else:
                last_s, n = int(ts), n + 1
    if start_s is None:
        state.remove()
    else:
        state.update((int(start_s), int(last_s), int(n)))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "start_s", "end_s", "n_events"]
        )


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800
) -> DataFrame:
    """events (streaming or batch DF with user_id/event_id/ts) ->
    stream of CLOSED sessions (user_id, start_s, end_s, n_events).

    One hash exchange on user_id (the state-store partitioning); the
    per-key call is a single pandas pass, so a skewed power-user costs
    one task, not a shuffle straggler.

    CLOSED sessions only, in batch mode too: each user's final
    still-open session is held back (in streaming it lives in the state
    store awaiting the gap/timeout).  Batch callers who need every
    session must append a flush sentinel row (event_id < 0, ts past the
    gap) per user — or use ``driver_queries.q_events_sessionize``, the
    all-sessions batch oracle.  Rows with null/unparseable ts or null
    user_id are dropped before sessionization."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_timestamp(F.col("ts")).alias("ts_s"),
    ).filter(
        # one null/unparseable ts (unix_timestamp -> null -> pandas NaN)
        # would make int(ts) in the stateful body raise and kill the
        # whole streaming query; drop bad event times before the state
        # store, keys stay intact
        F.col("ts_s").isNotNull() & F.col("user_id").isNotNull()
    )

    if not prepared.isStreaming:
        # batch twin: applyInPandasWithState is streaming-only (Spark
        # 4.1 raises), and in batch each key is exactly ONE group call
        # with empty initial state — the same body runs under a
        # state-less shim, so batch and streaming share one session law
        def batch_fn(key, pdf):
            outs = list(_sessionize_group(key, iter([pdf]), _NoState(), gap_s))
            return (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    columns=["user_id", "start_s", "end_s", "n_events"]
                )
            )

        return prepared.groupBy("user_id").applyInPandas(
            batch_fn, SESSION_OUTPUT_SCHEMA
        )

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_s)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

