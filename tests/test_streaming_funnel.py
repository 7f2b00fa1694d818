"""Streaming funnel progress: aggregating the changelog's final row per
user must reproduce the batch funnel's per-stage user counts
(driver_queries.q_funnel_conversion) no matter how the stream was
sliced into micro-batches."""

from __future__ import annotations

import os
import tempfile

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from frankensearch_spark.session import get_spark

    return get_spark(
        "test-streaming-funnel", master="local[4]", shuffle_partitions=4
    )


def _batch_expected(spark):
    from frankensearch_spark.driver_queries import q_funnel_conversion

    return {
        r.stage: int(r.n_users)
        for r in q_funnel_conversion(spark, SF).collect()
    }


def _counts_from_final(rows):
    from frankensearch_spark.streaming.funnel import STAGES

    final: dict[int, tuple] = {}
    for r in rows:
        cur = final.get(int(r.user_id))
        if cur is None or int(r.n_seen) > cur[-1]:
            final[int(r.user_id)] = tuple(
                bool(r[f"r_{s}"]) for s in STAGES
            ) + (int(r.n_seen),)
    return {
        s: sum(1 for v in final.values() if v[i])
        for i, s in enumerate(STAGES)
    }


def test_streaming_funnel_matches_batch(spark):
    from frankensearch_spark.streaming.funnel import funnel_progress_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    pdf = events.selectExpr(
        "user_id", "event_type", "ts", "unix_timestamp(ts) as ts_s"
    ).toPandas()

    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    # three global time slices — arrival roughly follows event time, so
    # a user's funnel progress SPANS micro-batches (early stages land in
    # earlier batches) and the state merge is genuinely exercised
    cuts = pdf["ts_s"].quantile([0.33, 0.66]).to_numpy()
    slices = [
        pdf[pdf.ts_s <= cuts[0]],
        pdf[(pdf.ts_s > cuts[0]) & (pdf.ts_s <= cuts[1])],
        pdf[pdf.ts_s > cuts[1]],
    ]
    cols = ["user_id", "event_type", "ts"]
    for i, sl in enumerate(slices):
        spark.createDataFrame(sl[cols]).coalesce(1).write.parquet(
            os.path.join(indir, f"slice={i}")
        )

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp_ntz"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        funnel_progress_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from funnel_out").collect()
    assert _counts_from_final(rows) == _batch_expected(spark)
    # state exercised across micro-batches, not one mega-batch
    assert len(q.recentProgress) >= 3
    # a multi-batch user emitted MORE than one changelog row
    assert len(rows) > len({int(r.user_id) for r in rows})


def test_funnel_batch_shim_matches_oracle(spark):
    from frankensearch_spark.streaming.funnel import funnel_progress_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    rows = funnel_progress_stream(events).collect()
    assert _counts_from_final(rows) == _batch_expected(spark)


def test_funnel_out_of_order_arrival(spark):
    """Stage events arriving OUT of stage order across micro-batches
    still converge to the batch law: the state stores first-occurrence
    minima, so a later batch delivering an EARLIER signup must flip a
    previously-unreached view flag on the next touch of that user."""
    import pandas as pd

    from frankensearch_spark.streaming.funnel import (
        STAGES,
        funnel_progress_stream,
    )

    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    # batch 0: user 1 views at t=200 — no signup yet, so r_view is
    #          False too (the batch law's t_view >= t_signup comparison
    #          is null/False when signup is unseen)
    # batch 1: user 1's signup arrives LATE with t=100 (< view) plus a
    #          click at t=300 -> now signup(100) <= view(200) <= click
    b0 = pd.DataFrame(
        {"user_id": [1], "event_type": ["view"],
         "ts": [pd.Timestamp("2026-01-01 00:03:20")]}
    )
    b1 = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["signup", "click"],
         "ts": [pd.Timestamp("2026-01-01 00:01:40"),
                pd.Timestamp("2026-01-01 00:05:00")]}
    )
    for i, b in enumerate([b0, b1]):
        spark.createDataFrame(b).coalesce(1).write.parquet(
            os.path.join(indir, f"slice={i}")
        )
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp_ntz"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        funnel_progress_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_ooo")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("select * from funnel_ooo").collect(),
        key=lambda r: int(r.n_seen),
    )
    assert len(rows) == 2
    first = tuple(bool(rows[0][f"r_{s}"]) for s in STAGES)
    last = tuple(bool(rows[1][f"r_{s}"]) for s in STAGES)
    assert first == (False, False, False, False)  # view w/o signup
    assert last == (True, True, True, False)      # late signup repairs it
