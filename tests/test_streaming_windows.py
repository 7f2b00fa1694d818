"""Watermarked streaming windowed aggregation: exactly-once append
emission of finalized windows, and the late-data drop rule.

Slices arrive as separate micro-batches (maxFilesPerTrigger=1); the
watermark is 2 h, windows are 1 h tumbling.  The crafted timeline pins
BOTH semantics the batch twin cannot show:

* a window emits exactly once, only after the watermark passes its end;
* a straggler arriving after its window's state was EVICTED is dropped
  (Spark's late filter is best-effort while state lives — a row landing
  in the same batch as the eviction still aggregates; the guarantee
  starts once the watermark evicted the window, and that is what append
  mode's exactly-once emission needs).
"""

import os
import tempfile

import pandas as pd


def _slice(spark, indir: str, name: str, rows: list[tuple[str, str, float]]):
    pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    d = os.path.join(indir, name)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)
    # the file source processes oldest-mtime first; sub-second writes tie
    # and would arrive in arbitrary order — pin strictly increasing mtimes
    idx = int(name.split("=")[1])
    t = 1_700_000_000 + idx * 60
    for root, _dirs, files in os.walk(d):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


def test_windowed_stream_watermark_and_late_drop(spark):
    from frankensearch_spark.streaming.windows import windowed_counts_stream

    # streaming watermarks require LTZ event time -> the operator casts
    # through the session zone; pin UTC as a cluster deployment would
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        _run_watermark_case(spark, windowed_counts_stream)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def _run_watermark_case(spark, windowed_counts_stream):
    workdir = tempfile.mkdtemp()
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    D = "2024-01-01 "
    # w0 = [00:00, 01:00), w1 = [01:00, 02:00), w3, w6 ...
    _slice(spark, indir, "slice=0", [
        (D + "00:05:00", "click", 1.0),
        (D + "00:20:00", "click", 2.0),
        (D + "01:10:00", "click", 3.0),
    ])
    # end-of-batch watermark: 03:30 - 2h = 01:30
    _slice(spark, indir, "slice=1", [(D + "03:30:00", "click", 4.0)])
    # this batch starts with wm=01:30 > w0's end -> w0 EVICTED AND
    # EMITTED here (n=2, without any straggler); end-of-batch wm 04:30
    _slice(spark, indir, "slice=2", [(D + "06:30:00", "click", 6.0)])
    # the 00:40 straggler arrives AFTER w0's state was evicted: Spark's
    # late-drop is best-effort while state lives, but once the window is
    # gone the row MUST be discarded (no duplicate w0 append row)
    _slice(spark, indir, "slice=3", [(D + "00:40:00", "click", 5.0)])
    # watermark -> 08:00: w6 finalizes; the 10:00 window never emits
    _slice(spark, indir, "slice=4", [(D + "10:00:00", "click", 7.0)])

    stream = (
        spark.readStream.schema("ts timestamp_ntz, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir + "/slice=*")
    )
    q = (
        windowed_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.hour_epoch, r.event_type, r.n_events, r.sum_value_r, r.avg_value_r)
        for r in spark.sql("select * from win_out").collect()
    }
    h = 3600
    base = 1704067200  # 2024-01-01 00:00:00 epoch (NTZ read as UTC)
    assert got == {
        # ONE w0 row, n=2: the 00:40/5.0 straggler arrived after w0's
        # state was evicted and was dropped (a kept straggler would have
        # appended a duplicate (base, click, 1, 5.0, 5.0) row)
        (base + 0 * h, "click", 2, 3.0, 1.5),
        (base + 1 * h, "click", 1, 3.0, 3.0),
        (base + 3 * h, "click", 1, 4.0, 4.0),
        (base + 6 * h, "click", 1, 6.0, 6.0),
    }
    # state really crossed micro-batches
    assert len(q.recentProgress) >= 5


def test_windowed_stream_batch_twin(spark):
    """The same operator body on a batch DataFrame reduces to the
    q_events_windowed expression shape (no watermark dropping)."""
    from frankensearch_spark.streaming.windows import windowed_counts_stream

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05:00", "2024-01-01 00:50:00",
                 "2024-01-01 02:10:00"]
            ),
            "event_type": ["view", "view", "click"],
            "value": [1.0, 3.0, 10.0],
        }
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = {
            (r.hour_epoch, r.event_type, r.n_events, r.sum_value_r,
             r.avg_value_r)
            for r in windowed_counts_stream(
                spark.createDataFrame(pdf)
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    base = 1704067200
    assert got == {
        (base, "view", 2, 4.0, 2.0),
        (base + 2 * 3600, "click", 1, 10.0, 10.0),
    }
