"""Benchmark driver: index-build throughput + top-k BM25 query latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     FSX_BENCH_DOCS (synthetic-corpus size; default scales with sf).

The build arm measures the full durable pipeline (corpus parquet ->
tokenize -> posting aggregation -> compressed global term partitions ->
manifest write) over the deterministic synthetic corpus, Python workers
pre-warmed (steady-state, like the reference's 30-run medians).  The
query arm serves the frozen query classes through the rank-exact f32
path; a concurrent arm pushes a 24-query stream through 8 threads (one
FAIR pool each) for the serving-throughput numbers (serving_qps_*).
If tools/scaling_bench.py has produced BENCH_SCALING.json, its N-vs-4N
results ride along.
"""

from __future__ import annotations

import json
import os
import shutil
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

# per-class arm (QG-6 shape): the frozen query set incl. boolean/phrase
# classes, served through the full-grammar AST path
from frankensearch_spark.corpus import FROZEN_QUERIES  # noqa: E402


def _corpus_parquet(n_docs: int) -> str:
    """Synthesize-once corpus parquet (pyarrow, no JVM)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from frankensearch_spark.corpus import make_corpus

    path = f"/tmp/fsx_bench_corpus_{n_docs}.parquet"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    rows = make_corpus(n_docs)
    os.makedirs(path, exist_ok=True)
    names = ["repo", "path", "commit", "lang", "content"]
    n_files = 64
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        if not part:
            break
        cols = list(zip(*part))
        pq.write_table(
            pa.table({n: list(c) for n, c in zip(names, cols)}),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("")
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_docs = int(os.environ.get("FSX_BENCH_DOCS", str(int(500_000 * sf_num))))
    n_docs = max(n_docs, 5000)

    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.operators.query import QuerySpec, topk
    from frankensearch_spark.plans.manifest import write_index
    from frankensearch_spark.session import get_spark
    from frankensearch_spark.sources.corpus import CORPUS_KEY

    corpus_path = _corpus_parquet(n_docs)

    spark = get_spark(
        "fsx-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # FAIR scheduling for the concurrent-serving arm: each query
        # thread runs in its own pool, so short queries interleave
        # instead of queueing FIFO behind one another
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm every Python worker before the clock starts
    def wf(batches):
        import numpy as np  # noqa: F401
        import pandas as pd  # noqa: F401
        import pyarrow as pa  # noqa: F401
        for rb in batches:
            yield rb

    spark.range(0, cpus * 4, 1, cpus * 4).mapInArrow(wf, "id long").count()

    corpus = spark.read.parquet(corpus_path)
    idx_out = "/tmp/fsx_bench_index"
    shutil.rmtree(idx_out, ignore_errors=True)

    # steady-state methodology (the reference's QG numbers are 30-run
    # MEDIANS): the very first build in a fresh JVM pays one-time
    # codegen/JIT/page-cache warm-up — measured 2.5x slower than the
    # steady state at 500k docs — and whichever arm runs first absorbs
    # it, which is an ordering bias, not a tokenizer difference.  So:
    # one throwaway cold build (reported as build_cold_secs), then every
    # timed arm runs warm; the headline is a median of 3.
    t0 = time.perf_counter()
    idx = build_index(corpus, CORPUS_KEY, docid_mode="lease", tokenizer="arrow")
    idx.postings.count()
    idx.docmeta.count()
    idx.termstats.count()
    idx.stats()
    build_cold_secs = time.perf_counter() - t0

    def _timed_build(tokenizer: str) -> float:
        t0 = time.perf_counter()
        b = build_index(
            corpus, CORPUS_KEY, docid_mode="lease", tokenizer=tokenizer
        )
        b.postings.count()
        b.docmeta.count()
        b.termstats.count()
        b.stats()
        secs = time.perf_counter() - t0
        b.postings.unpersist()
        return secs

    t0 = time.perf_counter()
    write_index(idx, idx_out, n_groups=1, source=corpus_path)
    write_secs = time.perf_counter() - t0

    # QG-7 analogue: on-disk index bytes per document (compressed blocks
    # + positions sidecar + docmeta/termstats/fieldstats + manifest)
    index_bytes = 0
    for root, _dirs, files in os.walk(idx_out):
        for f in files:
            index_bytes += os.path.getsize(os.path.join(root, f))
    corpus_bytes = sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path)
    )

    # long-lived serving mode: stats + full (term -> df) dictionary are
    # process-resident, so each query is exactly ONE Spark job
    t0 = time.perf_counter()
    idx.preload_termstats()
    warm_secs = time.perf_counter() - t0

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

    # serving arm: the same queries answered from the DURABLE compressed
    # index (decode-and-score + WAND routing), long-lived process
    from frankensearch_spark.operators.serving_exec import serving_search_bits
    from frankensearch_spark.plans.manifest import read_index

    srv = read_index(spark, idx_out)
    srv.blocks = srv.blocks.persist()
    srv.stats()
    srv.preload_termstats()
    srv.preload_bucket_coverage()  # WAND routing sees per-term coverage
    serving_lat: list[float] = []
    for name, text in BENCH_QUERIES.items():
        serving_search_bits(srv, text, k=10)  # warm (plan + block cache)
        t0 = time.perf_counter()
        serving_search_bits(srv, text, k=10)
        serving_lat.append(time.perf_counter() - t0)
    serving_p50 = statistics.median(serving_lat)

    # concurrent-serving throughput arm: a long-lived serving process
    # answering a stream of independent queries.  Single-query p50 is
    # floored by Spark's per-job scheduling constant; CONCURRENT queries
    # overlap those constants (and their I/O waits), so queries/sec —
    # not latency — is the serving-scale metric.  Each thread gets its
    # own FAIR pool (undeclared pools are created on first use, weight
    # 1), giving round-robin task scheduling across in-flight queries.
    import concurrent.futures as cf
    import threading

    q_stream = [t for t in BENCH_QUERIES.values() for _ in range(4)]

    def one_query(text: str) -> float:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", threading.current_thread().name
        )
        t0 = time.perf_counter()
        serving_search_bits(srv, text, k=10)
        return time.perf_counter() - t0

    n_workers = 8
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(n_workers) as ex:
        list(ex.map(one_query, q_stream))
    qps_fair = len(q_stream) / (time.perf_counter() - t0)
    qps_seq = len(serving_lat) / sum(serving_lat)

    # per-class p50 over the frozen query set (AST path: booleans,
    # phrases, globs all supported); classes come from the Q2 classifier
    # (query_class.rs heuristics), not hand labels
    from frankensearch_spark.operators.astexec import topk_ast
    from frankensearch_spark.query_class import perf_class

    by_class: dict[str, list[float]] = {}
    for _qid, text in sorted(FROZEN_QUERIES.items()):
        cls = perf_class(text)
        topk_ast(idx, text, k=10).collect()  # warm (plan + caches)
        t0 = time.perf_counter()
        topk_ast(idx, text, k=10).collect()
        by_class.setdefault(cls, []).append(time.perf_counter() - t0)
    class_p50 = {
        cls: round(statistics.median(v), 4) for cls, v in by_class.items()
    }

    # steady-state build arms LAST: the repeated cached builds churn the
    # JVM heap, and running them before the latency arms measurably
    # degrades per-query times (GC pressure) — order is part of the
    # methodology.
    build_secs = statistics.median(_timed_build("arrow") for _ in range(3))

    # comparative arms, each timed warm: the pure-JVM codegen tokenizer
    # and the Arrow-C++ vectorized tokenizer (both posting-equality
    # tested vs the contract path on ASCII corpora)
    build_sql_secs = _timed_build("sql")
    build_vec_secs = _timed_build("vector")

    p50 = statistics.median(lat)
    out = {
        "metric": "bm25_topk_p50_latency",
        "value": round(p50, 4),
        "unit": "sec",
        "queries": queries,
        "sf": sf_num,
        "build_docs": n_docs,
        "build_secs": round(build_secs, 3),
        "build_docs_per_sec": round(n_docs / build_secs, 1),
        "build_cold_secs": round(build_cold_secs, 3),
        "build_sql_tokenizer_secs": round(build_sql_secs, 3),
        "build_sql_tokenizer_docs_per_sec": round(n_docs / build_sql_secs, 1),
        "build_vector_tokenizer_secs": round(build_vec_secs, 3),
        "build_vector_tokenizer_docs_per_sec": round(n_docs / build_vec_secs, 1),
        "durable_write_secs": round(write_secs, 3),
        "durable_docs_per_sec": round(n_docs / (build_secs + write_secs), 1),
        "index_bytes_per_doc": round(index_bytes / n_docs, 1),
        "index_to_corpus_ratio": round(index_bytes / max(corpus_bytes, 1), 3),
        "class_p50": class_p50,
        "serving_index_p50": round(serving_p50, 4),
        "serving_qps_sequential": round(qps_seq, 2),
        "serving_qps_concurrent8": round(qps_fair, 2),
        "serving_mode": "warm",  # preloaded termstats (long-lived process)
        "warm_termstats_secs": round(warm_secs, 3),
        "cpus": cpus,
    }
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            out["scaling"] = json.load(fh)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
