"""Round-4 2M serving probe over a SAVED durable index.

Reuses an already-committed durable index (default /tmp/fsx_idx_2m) so
the serving arms measure serving, not the rebuild: warm per-class p50
(incl. the mega-term phrase class the round-3 verdict tracked),
sequential vs 8-thread FAIR vs batched throughput over the frozen query
mix, and the batch/concurrent ratio the round-3 verdict's task #2 gates
on (2M batch q/s >= 2x concurrent8 on the same host/session).

Usage: python tools/serving_probe_2m.py [index_path]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = {
    "q_identifier": "snake_case_identifier",
    "q_short_fn": "fn",
    "q_short_term": "term00042",
    "q_natural": "term00001 term00007 generated record",
    "q_natural5": "term00042 term00100 term00500 term01000 term02000",
    "q_miss": "missingkeywordalpha",
}
PHRASE_QUERIES = {
    "q_phrase_mega": '"fn term00042"',
    "q_phrase_natural": '"term00001 term00007"',
}


def main() -> None:
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsx_idx_2m"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from frankensearch_spark.operators.batchexec import search_batch_collect
    from frankensearch_spark.operators.serving_exec import (
        serving_search_bits,
    )
    from frankensearch_spark.plans.manifest import read_index
    from frankensearch_spark.session import get_spark

    try:
        from tools.host_probe import run as host_probe
    except ImportError:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools")
        )
        from host_probe import run as host_probe

    probe = host_probe()

    spark = get_spark(
        "fsx-serving-probe-2m",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def wf(batches):
        for rb in batches:
            yield rb

    spark.range(0, cpus * 4, 1, cpus * 4).mapInArrow(wf, "id long").count()

    srv = read_index(spark, idx_path)
    srv.blocks = srv.blocks.persist()
    srv.stats()
    srv.preload_termstats()
    srv.preload_bucket_coverage()

    lat: dict[str, float] = {}
    for name, text in {**BENCH_QUERIES, **PHRASE_QUERIES}.items():
        serving_search_bits(srv, text, k=10)  # warm
        t0 = time.perf_counter()
        serving_search_bits(srv, text, k=10)
        lat[name] = round(time.perf_counter() - t0, 4)

    import concurrent.futures as cf
    import threading

    q_stream = [t for t in BENCH_QUERIES.values() for _ in range(4)]

    seq_lat = [lat[n] for n in BENCH_QUERIES]

    def one_query(text: str) -> float:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", threading.current_thread().name
        )
        t0 = time.perf_counter()
        serving_search_bits(srv, text, k=10)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(8) as ex:
        list(ex.map(one_query, q_stream))
    qps_fair = len(q_stream) / (time.perf_counter() - t0)

    search_batch_collect(srv, list(BENCH_QUERIES.values()), k=10)  # warm
    t0 = time.perf_counter()
    search_batch_collect(srv, q_stream, k=10)
    qps_batch = len(q_stream) / (time.perf_counter() - t0)

    out = {
        "index": idx_path,
        "n_docs": srv.stats()[0],
        "cpus": cpus,
        "host_probe": probe,
        "warm_latency": lat,
        "serving_p50": round(statistics.median(seq_lat), 4),
        "serving_qps_sequential": round(len(seq_lat) / sum(seq_lat), 2),
        "serving_qps_concurrent8": round(qps_fair, 2),
        "serving_qps_batch": round(qps_batch, 2),
        "batch_over_concurrent": round(qps_batch / qps_fair, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
