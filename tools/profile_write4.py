"""Config experiments on the kernel-sort write path.

  variant A: defaults (lz4 shuffle compress, 32 shuffle parts)
  variant B: spark.shuffle.compress=false (shuffle lives on /dev/shm —
             compression may cost more CPU than the ramdisk saves)
  variant C: lz4 + spill compress off + larger shuffle file buffer

Each variant is a separate spark-submit-free session? No — shuffle
configs are cluster-wide at session start, so run ONE variant per
invocation: python tools/profile_write4.py --cpus 8 --variant B
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

VARIANTS = {
    "A": {},
    "B": {"spark.shuffle.compress": "false",
          "spark.shuffle.spill.compress": "false"},
    "C": {"spark.io.compression.codec": "zstd"},
    "D": {"spark.shuffle.file.buffer": "256k",
          "spark.shuffle.unsafe.file.output.buffer": "1m"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--variant", default="A", choices=sorted(VARIANTS))
    args = ap.parse_args()

    corpus_path = f"/tmp/fsx_bench_corpus_{args.docs}.parquet"
    from pyspark.sql import SparkSession

    bld = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
    )
    for k, v in VARIANTS[args.variant].items():
        bld = bld.config(k, v)
    spark = bld.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.plans.manifest import write_index
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
    b.docmeta.count()
    b.termstats.count()
    t_build = time.perf_counter() - t0

    dest = f"/tmp/fsx_profile_w4_{args.cpus}"
    shutil.rmtree(dest, ignore_errors=True)
    t0 = time.perf_counter()
    write_index(b, dest, n_groups=1, source=corpus_path)
    t_write = time.perf_counter() - t0
    shutil.rmtree(dest, ignore_errors=True)
    print(json.dumps({
        "variant": args.variant, "cpus": args.cpus,
        "build_secs": round(t_build, 2), "write_secs": round(t_write, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
