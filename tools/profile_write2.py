"""Decompose build_blocks' stage A (exchange+sort+encode) further.

Times, in one session over the same persisted postings:
  v_scan    : cache scan + derived key cols, no shuffle
  v_exch    : repartitionByRange (sample job + exchange), agg sink
  v_sortconv: + partition sort + Arrow conversion (noop python consumer)
  v_full    : + the blockify encode kernel (default arrow batch size)
  v_full_big: same with arrow.maxRecordsPerBatch raised to 262144

Usage: python tools/profile_write2.py [--docs 2000000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    corpus_path = args.corpus or f"/tmp/fsx_bench_corpus_{args.docs}.parquet"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.operators.merge import (
        DEFAULT_BUCKET_SHIFT,
        DEFAULT_TERM_PARTITIONS,
        _blockify_arrow,
        BLOCKS_SCHEMA,
    )
    from frankensearch_spark.sources.corpus import CORPUS_KEY

    corpus = spark.read.parquet(corpus_path)

    def wf(batches):
        import numpy  # noqa: F401
        for rb in batches:
            yield rb

    spark.range(0, args.cpus * 4, 1, args.cpus * 4).mapInArrow(
        wf, "id long"
    ).count()

    t0 = time.perf_counter()
    b = build_index(corpus, CORPUS_KEY, docid_mode="lease", tokenizer="arrow")
    b.postings.count()
    t_build = time.perf_counter() - t0
    out = {"cpus": args.cpus, "docs": args.docs, "build_secs": round(t_build, 2)}

    n_shuffle = max(args.cpus * 4, 16)
    src = (
        b.postings_full.select("term", "docid", "tf", "doclen", "positions")
        .withColumn("bucket", F.shiftright(F.col("docid"), DEFAULT_BUCKET_SHIFT))
        .withColumn(
            "tpart",
            (F.crc32(F.col("term").cast("binary")) % DEFAULT_TERM_PARTITIONS).cast("int"),
        )
        .withColumn("thash", F.xxhash64(F.col("term")))
    )

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    timed("v_scan", lambda: src.count())
    exch = src.repartitionByRange(
        n_shuffle, "tpart", "thash", "term", "bucket", "docid"
    )
    timed("v_exch", lambda: exch.count())

    arranged = exch.sortWithinPartitions(
        "tpart", "thash", "term", "bucket", "docid"
    ).drop("thash")

    def noop(batches):
        import pyarrow as pa
        n = 0
        for rb in batches:
            n += rb.num_rows
        yield pa.RecordBatch.from_arrays(
            [pa.array([n], type=pa.int64())], names=["n"]
        )

    timed("v_sortconv", lambda: arranged.mapInArrow(noop, "n long").count())
    timed(
        "v_full",
        lambda: arranged.mapInArrow(
            lambda it: _blockify_arrow(it, DEFAULT_BUCKET_SHIFT), BLOCKS_SCHEMA
        ).count(),
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
    timed(
        "v_full_big",
        lambda: arranged.mapInArrow(
            lambda it: _blockify_arrow(it, DEFAULT_BUCKET_SHIFT), BLOCKS_SCHEMA
        ).count(),
    )
    timed("v_sortconv_big", lambda: arranged.mapInArrow(noop, "n long").count())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
