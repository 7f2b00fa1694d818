"""Stateful streaming funnel progress (applyInPandasWithState).

The streaming twin of ``driver_queries.q_funnel_conversion``'s per-user
core: an unbounded event stream keyed by user_id, state holds the
FIRST-occurrence epoch-micros of each ordered funnel stage
(signup -> view -> click -> purchase) plus a running event count, and
every micro-batch that touches a user emits that user's refreshed
funnel snapshot — the ordered-reach flags recomputed from the merged
stage minima under EXACTLY the batch law (a stage is reached iff it
occurred and its first occurrence is at/after every earlier stage's
first occurrence; an unseen earlier stage fails the comparison, the
same null semantics the batch query's ``t_s >= t_p`` conjunction has).

The emission stream is a CHANGELOG: keep the last row per user and
aggregate the four flags, and the per-stage user counts equal the
batch funnel no matter how the stream was sliced into micro-batches —
pinned in test_streaming_funnel across a 3-slice arrival order.

Per-key state is five longs in Spark's state store (RocksDB/HDFS-backed
on a cluster), so the operator scales with executors and survives
restarts via the checkpoint; per-call Python work is one vectorized
pandas groupby-min over the batch's rows for that key.

Reference analogue: the events funnel is a driver-contract operator
(driver_queries.py q_funnel_conversion); this is the same law applied
incrementally at ingest time, the product-analytics "live funnel"
shape.
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
    BooleanType,
    LongType,
    StructField,
    StructType,
)

STAGES = ("signup", "view", "click", "purchase")

# "stage not yet observed" sentinel: +huge so batch-local mins fold in
# with a plain min(), and the ordered-reach comparison t_s >= t_p is
# automatically False whenever an EARLIER stage is unseen (t_p = +huge)
# — bit-for-bit the batch query's null-comparison semantics.  Real
# epoch-micros are far below this for any representable timestamp.
UNSEEN = 1 << 62

FUNNEL_OUTPUT_SCHEMA = StructType(
    [StructField("user_id", LongType())]
    + [StructField(f"r_{s}", BooleanType()) for s in STAGES]
    + [StructField("n_seen", LongType())]
)

# (first ts_us per stage x4, running event count)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField(f"t_{s}", LongType()) for s in STAGES]
    + [StructField("n", LongType())]
)


def _funnel_group(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.exists:
        got = state.get
        mins = [int(v) for v in got[:4]]
        n = int(got[4])
    else:
        mins = [UNSEEN] * 4
        n = 0
    seen = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        seen += len(pdf)
        # batch-local first occurrence per stage — one vectorized
        # groupby-min, no per-row Python
        g = pdf.groupby("event_type")["ts_us"].min()
        for i, s in enumerate(STAGES):
            if s in g.index:
                v = int(g[s])
                if v < mins[i]:
                    mins[i] = v
    if seen == 0:
        return
    n += seen
    state.update((mins[0], mins[1], mins[2], mins[3], n))
    reached = []
    for i in range(len(STAGES)):
        r = mins[i] != UNSEEN
        for j in range(i):
            # unseen earlier stage = +huge => comparison False, the
            # batch query's null semantics
            r = r and (mins[i] >= mins[j])
        reached.append(bool(r))
    out = {"user_id": [user_id]}
    for s, r in zip(STAGES, reached):
        out[f"r_{s}"] = [r]
    out["n_seen"] = [n]
    yield pd.DataFrame(out)


def funnel_progress_stream(events: DataFrame) -> DataFrame:
    """events (streaming or batch DF with user_id/event_type/ts) ->
    changelog of per-user funnel snapshots
    (user_id, r_signup, r_view, r_click, r_purchase, n_seen).

    One hash exchange on user_id (the state-store partitioning).
    Aggregating the LAST emission per user reproduces
    ``q_funnel_conversion``'s per-stage user counts over the same rows
    — pinned across micro-batch slicings in test_streaming_funnel.
    Only funnel-stage events enter the state (others are inert for the
    funnel law but would still bump a naive count — filtered so n_seen
    is the user's funnel-event count); rows with null user_id or
    unparseable ts drop."""
    prepared = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").cast("string").alias("event_type"),
            epoch_micros("ts").alias("ts_us"),
        )
        .filter(F.col("event_type").isin(list(STAGES)))
        .filter(F.col("ts_us").isNotNull() & F.col("user_id").isNotNull())
    )

    if not prepared.isStreaming:
        # batch twin: same body under a state-less shim (one group call
        # per key, empty initial state) — batch and streaming share one
        # funnel law
        def batch_fn(key, pdf):
            outs = list(_funnel_group(key, iter([pdf]), _NoState()))
            return (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    columns=["user_id"]
                    + [f"r_{s}" for s in STAGES]
                    + ["n_seen"]
                )
            )

        return prepared.groupBy("user_id").applyInPandas(
            batch_fn, FUNNEL_OUTPUT_SCHEMA
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_group,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

