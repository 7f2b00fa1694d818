"""Streaming latest-per-key compaction: the changelog's final row per
key must equal the batch oracle (driver_queries.q_latest_event_per_user)
no matter how the stream was sliced into micro-batches."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from frankensearch_spark.session import get_spark

    return get_spark(
        "test-streaming-compaction", master="local[4]", shuffle_partitions=4
    )


def _batch_expected(spark):
    from frankensearch_spark.driver_queries import q_latest_event_per_user

    return {
        int(r.user_id): (int(r.last_event_id), r.last_type, int(r.n_events))
        for r in q_latest_event_per_user(spark, SF).collect()
    }


def test_streaming_compaction_matches_batch(spark):
    from frankensearch_spark.streaming.compaction import latest_per_key_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    pdf = events.selectExpr(
        "user_id", "event_id", "event_type", "ts",
        "unix_timestamp(ts) as ts_s",
    ).toPandas()

    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    # three global time slices — arrival roughly follows event time, the
    # CDC shape; per-key changes span multiple micro-batches
    cuts = pdf["ts_s"].quantile([0.33, 0.66]).to_numpy()
    slices = [
        pdf[pdf.ts_s <= cuts[0]],
        pdf[(pdf.ts_s > cuts[0]) & (pdf.ts_s <= cuts[1])],
        pdf[pdf.ts_s > cuts[1]],
    ]
    cols = ["user_id", "event_id", "event_type", "ts"]
    for i, sl in enumerate(slices):
        spark.createDataFrame(sl[cols]).coalesce(1).write.parquet(
            os.path.join(indir, f"slice={i}")
        )

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, "
            "ts timestamp_ntz"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        latest_per_key_stream(stream)
        .writeStream.format("memory")
        .queryName("compact_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from compact_out").collect()
    # changelog law: keep the LAST emission per key — the memory sink
    # appends in emission order, and n_events grows monotonically per
    # key, so the max-n_events row IS the final snapshot
    final: dict[int, tuple] = {}
    for r in rows:
        cur = final.get(int(r.user_id))
        if cur is None or int(r.n_events) > cur[2]:
            final[int(r.user_id)] = (
                int(r.last_event_id), r.last_type, int(r.n_events),
            )
    assert final == _batch_expected(spark)
    # state exercised across micro-batches, not one mega-batch
    assert len(q.recentProgress) >= 3
    # a multi-batch key emitted MORE than one changelog row
    assert len(rows) > len(final)


def test_compaction_batch_shim_matches_oracle(spark):
    from frankensearch_spark.streaming.compaction import latest_per_key_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        int(r.user_id): (int(r.last_event_id), r.last_type, int(r.n_events))
        for r in latest_per_key_stream(events).collect()
    }
    assert got == _batch_expected(spark)
