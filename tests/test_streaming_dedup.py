"""Streaming exact dedup: first-arrival-wins within the watermark
horizon, bounded state via eviction, and the documented re-emit-after-
eviction tradeoff.

Slices arrive as separate micro-batches (maxFilesPerTrigger=1) with a
1 h watermark.  The crafted timeline pins all three laws:

* a duplicate landing while the original's state lives is DROPPED;
* a duplicate landing after the watermark evicted the original's state
  RE-EMITS (dedup is exact only within the horizon — that is what keeps
  state bounded at 100-TB ingest rates);
* distinct content always emits exactly once per horizon.
"""

import os
import tempfile

import pandas as pd


def _slice(spark, indir: str, name: str, rows: list[tuple[int, str, str]]):
    pdf = pd.DataFrame(rows, columns=["docid", "ts", "content"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    d = os.path.join(indir, name)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)
    # pin strictly increasing mtimes so the file source orders slices
    idx = int(name.split("=")[1])
    t = 1_700_000_000 + idx * 60
    for root, _dirs, files in os.walk(d):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


def test_dedup_stream_watermark_laws(spark):
    from frankensearch_spark.streaming.dedup import dedup_stream

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        _run_dedup_case(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def _run_dedup_case(spark):
    from frankensearch_spark.streaming.dedup import dedup_stream

    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    D = "2024-01-01 "
    # originals: X and Y at 00:00/00:10 (1 h watermark delay)
    _slice(spark, indir, "slice=0", [
        (1, D + "00:00:00", "content X"),
        (2, D + "00:10:00", "content Y"),
    ])
    # duplicate of X while its state lives (wm so far: -1h) -> DROPPED
    _slice(spark, indir, "slice=1", [(3, D + "00:30:00", "content X")])
    # fresh content at 03:00 advances the watermark to 02:00, which
    # passes X's expiry (00:00 + 1 h) -> X's state evicts.  Watermark
    # propagation is batch-delayed and state removal runs at END of the
    # batch that sees the advanced watermark, so the eviction lands at
    # the end of slice=3's batch — one spacer batch before the retry.
    _slice(spark, indir, "slice=2", [(4, D + "03:00:00", "content Z")])
    _slice(spark, indir, "slice=3", [(6, D + "03:05:00", "content W")])
    # duplicate of X AFTER eviction: re-emits (the documented horizon
    # bound; a global-state dedup would grow without bound instead)
    _slice(spark, indir, "slice=4", [(5, D + "03:10:00", "content X")])

    stream = (
        spark.readStream.schema("docid long, ts timestamp_ntz, content string")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select docid from dedup_out").collect()
    assert sorted(r.docid for r in rows) == [1, 2, 4, 5, 6]
    assert len(q.recentProgress) >= 5


def test_dedup_batch_twin_is_deterministic(spark):
    """Batch twin keeps the (ts, docid)-minimal arrival per content —
    ties on ts fall to the lower docid, unlike plain dropDuplicates."""
    from frankensearch_spark.streaming.dedup import dedup_batch

    pdf = pd.DataFrame(
        {
            "docid": [10, 3, 7, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:00",
                 "2024-01-01 00:05:00", "2024-01-01 01:00:00"]
            ),
            "content": ["same", "same", "same", "other"],
        }
    )
    got = dedup_batch(spark.createDataFrame(pdf)).collect()
    assert sorted(r.docid for r in got) == [3, 5]
