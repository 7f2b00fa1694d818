"""Stateful streaming latest-per-key compaction (applyInPandasWithState).

The streaming twin of ``driver_queries.q_latest_event_per_user`` — the
CDC/upsert-resolution shape: an unbounded event stream keyed by
user_id, state holds each key's current latest record under the total
order (ts_us, event_id) plus a running event count, and every
micro-batch that touches a key emits that key's refreshed snapshot row.
The emission stream is a CHANGELOG: downstream consumers keep the last
row per key (exactly what a compacting sink like a key-value store or
an upsert table does), and the pinned law is that the LAST emitted row
per key equals the batch query's output no matter how the stream was
sliced into micro-batches.

Per-key state is three longs + a short string in Spark's state store
(RocksDB/HDFS-backed on a cluster), so the operator scales with
executors and survives restarts via the checkpoint; the per-call Python
work is one vectorized pandas pass over the batch's rows for that key.

Reference analogue: the engine's own durable tombstone/upsert
resolution keeps exactly one live revision per external key
(lifecycle.upsert_documents); this operator is the same law applied to
an event stream at ingest time.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from frankensearch_spark.streaming._shim import NoState as _NoState
from frankensearch_spark.streaming._shim import epoch_micros
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

COMPACT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
        StructField("n_events", LongType()),
    ]
)

# (latest ts_us, latest event_id, latest event_type, running count)
COMPACT_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _compact_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.exists:
        best_ts, best_id, best_type, n = state.get
        best_ts, best_id, n = int(best_ts), int(best_id), int(n)
    else:
        best_ts = best_id = None
        best_type = None
        n = 0
    seen = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        seen += len(pdf)
        # batch-local max under the (ts_us, event_id) total order — one
        # vectorized lexsort, no per-row Python
        top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        cand = (int(top["ts_us"]), int(top["event_id"]))
        if best_ts is None or cand > (best_ts, best_id):
            best_ts, best_id = cand
            tv = top["event_type"]
            # preserve NULL: str(None/NaN) would emit the literal
            # string 'None', diverging from the batch oracle's NULL
            # last_type when a null-typed event wins the total order
            best_type = None if pd.isna(tv) else str(tv)
    if seen == 0:
        return
    n += seen
    state.update((best_ts, best_id, best_type, n))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_event_id": [best_id],
            "last_type": [best_type],
            "n_events": [n],
        }
    )


def latest_per_key_stream(events: DataFrame) -> DataFrame:
    """events (streaming or batch DF with user_id/event_id/event_type/ts)
    -> changelog of per-user latest-record snapshots
    (user_id, last_event_id, last_type, n_events).

    One hash exchange on user_id (the state-store partitioning).  The
    last emitted row per key equals
    ``driver_queries.q_latest_event_per_user`` over the same rows —
    pinned across micro-batch slicings in test_streaming_compaction.
    Rows with null user_id or unparseable ts are dropped (a null would
    poison the key's state math, not just its own row)."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
        epoch_micros("ts").alias("ts_us"),
    ).filter(F.col("ts_us").isNotNull() & F.col("user_id").isNotNull())

    if not prepared.isStreaming:
        # batch twin: same body under a state-less shim (one group call
        # per key, empty initial state) — batch and streaming share one
        # compaction law
        def batch_fn(key, pdf):
            outs = list(_compact_group(key, iter([pdf]), _NoState()))
            return (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    columns=[
                        "user_id", "last_event_id", "last_type", "n_events",
                    ]
                )
            )

        return prepared.groupBy("user_id").applyInPandas(
            batch_fn, COMPACT_OUTPUT_SCHEMA
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        _compact_group,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

