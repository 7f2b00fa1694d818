"""Decompose the durable-write phase (build_blocks + parquet) into stages.

The scaling record shows write_secs = 1.6-1.9x build_secs at every
parallelism level — this script answers WHERE those seconds go:

  stage A: repartitionByRange sample + exchange + sort + blockify encode
           (blocks.persist().count())
  stage B: zstd parquet write of the ALREADY-persisted block rows
  stage C (reference): the production single-pass write (no persist),
           i.e. what write_index actually pays

Usage: python tools/profile_write.py [--docs 2000000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--variants", nargs="*",
                    default=["staged", "production"])
    args = ap.parse_args()

    corpus_path = args.corpus or f"/tmp/fsx_bench_corpus_{args.docs}.parquet"
    from pyspark.sql import SparkSession

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
        build_blocks,
    )
    from frankensearch_spark.sources.corpus import CORPUS_KEY

    corpus = spark.read.parquet(corpus_path)

    # warm python workers
    def wf(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        for rb in batches:
            yield rb

    spark.range(0, args.cpus * 4, 1, args.cpus * 4).mapInArrow(
        wf, "id long"
    ).count()

    t0 = time.perf_counter()
    b = build_index(corpus, CORPUS_KEY, docid_mode="lease", tokenizer="arrow")
    b.postings.count()
    b.docmeta.count()
    b.termstats.count()
    t_build = time.perf_counter() - t0
    out = {"cpus": args.cpus, "docs": args.docs, "build_secs": round(t_build, 2)}

    full = b.postings_full

    if "staged" in args.variants:
        blocks = build_blocks(
            full, DEFAULT_BUCKET_SHIFT, DEFAULT_TERM_PARTITIONS,
            positions=b.positions,
        )
        blocks = blocks.persist()
        t0 = time.perf_counter()
        n_blocks = blocks.count()
        out["stageA_exchange_sort_encode_secs"] = round(
            time.perf_counter() - t0, 2
        )
        out["n_blocks"] = n_blocks
        dest = f"/tmp/fsx_profile_blocks_{args.cpus}"
        shutil.rmtree(dest, ignore_errors=True)
        t0 = time.perf_counter()
        blocks.write.mode("overwrite").option("compression", "zstd").parquet(
            dest
        )
        out["stageB_parquet_write_secs"] = round(time.perf_counter() - t0, 2)
        out["index_bytes"] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(dest) for f in fs
        )
        blocks.unpersist()
        shutil.rmtree(dest, ignore_errors=True)

    if "production" in args.variants:
        blocks2 = build_blocks(
            full, DEFAULT_BUCKET_SHIFT, DEFAULT_TERM_PARTITIONS,
            positions=b.positions,
        )
        dest = f"/tmp/fsx_profile_blocks_prod_{args.cpus}"
        shutil.rmtree(dest, ignore_errors=True)
        t0 = time.perf_counter()
        blocks2.write.mode("overwrite").option("compression", "zstd").parquet(
            dest
        )
        out["stageC_production_write_secs"] = round(
            time.perf_counter() - t0, 2
        )
        shutil.rmtree(dest, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
