"""Benchmark driver: index-build throughput + top-k BM25 query latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     FSX_BENCH_DOCS (synthetic-corpus size; default scales with sf).

The build-throughput arm uses the deterministic synthetic corpus (the
driver's ``documents`` table is only 5k rows at sf0.1 — too small to
measure a build); the query arm serves the frozen query classes over the
built index through the rank-exact f32 path.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = {
    "q_identifier": "snake_case_identifier",
    "q_short_fn": "fn",
    "q_short_term": "term00042",
    "q_natural": "term00001 term00007 generated record",
    "q_natural5": "term00042 term00100 term00500 term01000 term02000",
    "q_miss": "missingkeywordalpha",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_docs = int(os.environ.get("FSX_BENCH_DOCS", str(int(200_000 * sf_num))))
    n_docs = max(n_docs, 2000)

    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.operators.query import QuerySpec, topk
    from frankensearch_spark.session import get_spark
    from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df

    spark = get_spark("fsx-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synthetic_corpus_df(spark, n_docs, partitions=cpus).persist()
    corpus.count()  # materialize input outside the timed window

    t0 = time.perf_counter()
    idx = build_index(corpus, CORPUS_KEY, docid_mode="lease")
    # force full materialization of every index table
    idx.postings.count()
    idx.docmeta.count()
    idx.termstats.count()
    idx.stats()
    build_secs = time.perf_counter() - t0
    docs_per_sec = n_docs / build_secs

    queries: dict[str, float] = {}
    lat: list[float] = []
    for name, text in BENCH_QUERIES.items():
        spec = QuerySpec.from_text(text)
        topk(idx, spec, k=10).collect()  # warm (plan compile)
        t0 = time.perf_counter()
        topk(idx, spec, k=10).collect()
        secs = time.perf_counter() - t0
        queries[name] = round(secs, 4)
        lat.append(secs)

    p50 = statistics.median(lat)
    out = {
        "metric": "bm25_topk_p50_latency",
        "value": round(p50, 4),
        "unit": "sec",
        "queries": queries,
        "sf": sf_num,
        "build_docs": n_docs,
        "build_secs": round(build_secs, 3),
        "build_docs_per_sec": round(docs_per_sec, 1),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
