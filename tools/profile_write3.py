"""Split stage A's 70s: JVM sort vs Arrow conversion/IPC to Python.

  w_exch  : exchange only, noop sink (no sort, no python)
  w_sort  : exchange + sortWithinPartitions, noop sink (JVM sort, no python)
  w_sort1 : same sort but keyed (thash, term, bucket, docid) — drops the
            64-value tpart prefix column that defeats radix/prefix sort
  w_sort2 : single synthetic long prefix skey = tpart<<58 | thash>>>6,
            then term, docid (prefix-discriminating first column)

Usage: python tools/profile_write3.py [--docs 2000000] [--cpus 8]
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
    args = ap.parse_args()

    corpus_path = f"/tmp/fsx_bench_corpus_{args.docs}.parquet"
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

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)

    exch = src.repartitionByRange(
        n_shuffle, "tpart", "thash", "term", "bucket", "docid"
    )
    timed("w_exch", exch)
    timed(
        "w_sort",
        exch.sortWithinPartitions("tpart", "thash", "term", "bucket", "docid"),
    )
    timed("w_sort1", exch.sortWithinPartitions("thash", "term", "docid"))
    skeyed = exch.withColumn(
        "skey",
        F.shiftleft(F.col("tpart").cast("long"), 58)
        .bitwiseOR(F.shiftrightunsigned(F.col("thash"), 6)),
    )
    timed("w_sort2", skeyed.sortWithinPartitions("skey", "term", "docid"))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
