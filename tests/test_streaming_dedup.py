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


# ── LSH near-dup candidate stream ───────────────────────────────────────


def _agg_buckets(spark, rows):
    """Ground-truth buckets via the BATCH pipeline's aggregate shape
    (explode -> distinct -> groupBy min -> sorted band md5)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(rows, "docid long, content string")
    toks = F.filter(
        F.split(F.lower(F.col("content")), "[^0-9a-z]+"), lambda x: x != F.lit("")
    )
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = docs.select("docid", F.explode(shingles).alias("shingle")).distinct()
    seeds = spark.range(12).select(F.col("id").cast("int").alias("seed"))
    sig = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("docid", "seed")
        .agg(
            F.min(
                F.md5(F.concat_ws("#", F.col("shingle"), F.col("seed").cast("string")))
            ).alias("minhash")
        )
    )
    bucket = (
        sig.withColumn("band", (F.col("seed") / 3).cast("int"))
        .groupBy("docid", "band")
        .agg(
            F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias(
                "bucket"
            )
        )
    )
    return {(r.docid, r.band, r.bucket) for r in bucket.collect()}


ROWS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon zeta"),          # exact dup of 1
    (3, "beta gamma delta epsilon zeta eta theta iota"), # overlapping
    (4, "one two"),                                      # <3 tokens: no buckets
    (5, "совершенно unrelated words here okay fine"),
]


def test_rowwise_buckets_equal_aggregate_pipeline(spark):
    """The stream-safe per-row projection produces EXACTLY the batch
    pipeline's (docid, band, bucket) set — including the no-shingle doc
    emitting nothing."""
    from frankensearch_spark.streaming.dedup import lsh_band_buckets_rowwise

    docs = spark.createDataFrame(ROWS, "docid long, content string")
    got = {
        (r.docid, r.band, r.bucket)
        for r in lsh_band_buckets_rowwise(docs).collect()
    }
    assert got == _agg_buckets(spark, ROWS)
    assert not any(d == 4 for d, _b, _k in got)          # short doc dropped
    assert len({(b, k) for d, b, k in got if d in (1, 2)}) == 4  # dup shares all


def test_near_dup_candidate_stream_first_seen_buckets(spark):
    from frankensearch_spark.streaming.dedup import (
        lsh_band_buckets_rowwise,
        near_dup_candidates_stream,
    )

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        workdir = tempfile.mkdtemp()
        indir = os.path.join(workdir, "in")
        os.makedirs(indir)
        D = "2024-01-01 "
        _slice(spark, indir, "slice=0", [(1, D + "00:00:00", ROWS[0][1])])
        _slice(spark, indir, "slice=1", [
            (2, D + "00:10:00", ROWS[1][1]),   # exact dup: 0 new buckets
            (3, D + "00:20:00", ROWS[2][1]),   # overlap: only ITS new buckets
        ])
        _slice(spark, indir, "slice=2", [(4, D + "00:30:00", ROWS[3][1])])

        stream = (
            spark.readStream.schema("docid long, ts timestamp_ntz, content string")
            .option("maxFilesPerTrigger", "1")
            .parquet(indir + "/slice=*")
        )
        q = (
            near_dup_candidates_stream(stream, watermark="1 hour")
            .writeStream.format("memory")
            .queryName("lsh_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.docid, r.band, r.bucket)
            for r in spark.sql("select * from lsh_out").collect()
        }
        # expected: doc1's 4 buckets, plus only doc3's buckets NOT shared
        # with doc1; doc2 (exact dup) and doc4 (no shingles) emit nothing
        b = {
            d: {(r.band, r.bucket)
                for r in lsh_band_buckets_rowwise(
                    spark.createDataFrame([(d, c)], "docid long, content string")
                ).collect()}
            for d, c in [(1, ROWS[0][1]), (3, ROWS[2][1])]
        }
        exp = {(1, band, k) for band, k in b[1]} | {
            (3, band, k) for band, k in b[3] - b[1]
        }
        assert got == exp
        assert not any(d == 2 for d, *_ in got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
