"""Streaming sessionization parity: applyInPandasWithState vs batch.

The events table is split into time-ordered slices, streamed one file
per micro-batch (state must survive across batches), closed by per-user
flush sentinels in the final slice, and the emitted session set must
equal the batch gap-split computed directly in pandas."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
GAP_S = 1800


def _expected_sessions(ev: pd.DataFrame) -> set:
    out = set()
    for uid, g in ev.sort_values(["ts_s", "event_id"]).groupby("user_id"):
        ts = g["ts_s"].to_numpy()
        splits = np.flatnonzero(np.diff(ts) > GAP_S) + 1
        for chunk in np.split(ts, splits):
            out.add((int(uid), int(chunk[0]), int(chunk[-1]), len(chunk)))
    return out


def test_streaming_sessionize_matches_batch(spark):
    from frankensearch_spark.streaming.sessions import sessionize_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    pdf = events.selectExpr(
        "user_id", "event_id", "unix_timestamp(ts) as ts_s", "ts"
    ).toPandas()

    # three global time slices — per-user order is preserved across files
    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    cuts = pdf["ts_s"].quantile([0.33, 0.66]).to_numpy()
    slices = [
        pdf[pdf.ts_s <= cuts[0]],
        pdf[(pdf.ts_s > cuts[0]) & (pdf.ts_s <= cuts[1])],
        pdf[pdf.ts_s > cuts[1]],
    ]
    for i, sl in enumerate(slices):
        spark.createDataFrame(sl[["user_id", "event_id", "ts"]]).coalesce(
            1
        ).write.parquet(os.path.join(indir, f"slice={i}"))
    # final slice: flush sentinels (event_id=-1) close every open session
    sentinel = pd.DataFrame(
        {
            "user_id": pdf["user_id"].unique(),
            "event_id": -1,
            # strictly after every real event: at an equal ts the
            # sentinel's event_id=-1 would sort FIRST in the batch shim
            "ts": pdf["ts"].max() + pd.Timedelta(hours=1),
        }
    )
    spark.createDataFrame(sentinel).coalesce(1).write.parquet(
        os.path.join(indir, "slice=9")
    )

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        sessionize_stream(stream, gap_s=GAP_S)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.start_s, r.end_s, r.n_events)
        for r in spark.sql("select * from sessions_out").collect()
    }
    assert got == _expected_sessions(pdf)
    # state exercised across micro-batches, not one mega-batch
    assert len(q.recentProgress) >= 4

    # batch shim over the same rows (sentinels appended) — same sessions
    batch_in = spark.createDataFrame(
        pd.concat([pdf[["user_id", "event_id", "ts"]], sentinel])
    )
    got_batch = {
        (r.user_id, r.start_s, r.end_s, r.n_events)
        for r in sessionize_stream(batch_in, gap_s=GAP_S).collect()
    }
    assert got_batch == _expected_sessions(pdf)


def test_sessionize_stream_batch_mode(spark):
    """The same operator body runs on a plain batch DataFrame through
    the state-less applyInPandas shim — one group call per key, empty
    initial state, identical session law."""
    import pyspark.sql.functions as F

    from frankensearch_spark.streaming.sessions import sessionize_stream

    rows = [
        (0, "2024-01-01 00:00:00", 7),
        (1, "2024-01-01 00:10:00", 7),
        (2, "2024-01-01 01:00:00", 7),  # > 1800s after event 1 -> split
        (-1, "2024-01-01 02:00:00", 7),  # sentinel closes the tail
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r.user_id, r.start_s, r.end_s, r.n_events)
        for r in sessionize_stream(df, gap_s=GAP_S).collect()
    }
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert got == {
        (7, base, base + 600, 2),
        (7, base + 3600, base + 3600, 1),
    }
