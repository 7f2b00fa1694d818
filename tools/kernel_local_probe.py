"""Driver-local replay of the bucket kernel for one query: collects the
candidate block rows (metadata + compressed payloads) and runs the exact
score_one kernel per bucket in-process, timing decode+score WITHOUT any
Spark exchange/scheduling — isolates Python-kernel cost from job ceremony.

Usage: python tools/kernel_local_probe.py [index_path] [query]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsx_idx_2m"
    query = sys.argv[2] if len(sys.argv) > 2 else (
        "term00042 term00100 term00500 term01000 term02000"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from frankensearch_spark.operators.serving_exec import (
        ast_to_queryspec_fields,
    )
    from frankensearch_spark.operators.wand import (
        _prepare,
        _score_buckets_kernel,
        _wand_fields,
    )
    from frankensearch_spark.plans.manifest import read_index
    from frankensearch_spark.query_ast import ENGINE_SCHEMA, parse_lenient
    from frankensearch_spark.session import get_spark

    spark = get_spark(
        "fsx-kernel-local", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    srv = read_index(spark, idx_path)
    srv.blocks = srv.blocks.persist()
    srv.stats()
    srv.preload_termstats()

    ast = parse_lenient(query, ENGINE_SCHEMA).query
    spec, term_fields = ast_to_queryspec_fields(ast)
    prep = _prepare(srv, spec, term_fields)
    weights, tf_caches, avgdls, cand, stats, tf_order = prep
    fidx, primary = _wand_fields(srv)
    shift = primary.bucket_shift

    t0 = time.perf_counter()
    pdf_all = cand.toPandas()
    t_collect = time.perf_counter() - t0

    score_one, _ = _score_buckets_kernel(
        spec, weights, tf_caches, 10, shift, tf_order, avgdls=avgdls
    )
    groups = list(pdf_all.groupby("bucket", sort=False))
    t0 = time.perf_counter()
    outs = [score_one(g) for _b, g in groups]
    t_kernel = time.perf_counter() - t0
    merged = pd.concat(outs) if outs else pd.DataFrame()
    print(json.dumps({
        "query": query,
        "block_rows": int(len(pdf_all)),
        "buckets": len(groups),
        "payload_mb": round(
            float(
                sum(
                    pdf_all[c].map(len).sum()
                    for c in ("doc_bytes", "tf_bytes", "norm_bytes")
                    if c in pdf_all
                )
            ) / 1e6, 1),
        "collect_s": round(t_collect, 3),
        "kernel_all_buckets_s": round(t_kernel, 3),
        "hits": int(len(merged)),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
