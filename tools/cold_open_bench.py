"""Cold-open latency: the QG-9 analogue (round-5 verdict task 6).

The reference gates Quill's open() at <=50 ms by lazy-loading every
section (manifest read only; mmap sections fault in on first touch,
quill-perf-gates.toml QG-9).  The Spark analogue over a saved durable
index measures, in a FRESH process (run this tool cold — it builds its
own SparkSession):

* ``session_up_secs``      — SparkSession + JVM + Python-worker warmup
                             (platform constant, not engine)
* ``load_secs``            — FrankensearchSpark.load(): manifest +
                             parquet footers only (lazy DataFrames)
* ``first_query_secs``     — first search_docids over the cold index
                             (pays scan + page-cache faults)
* ``preload_secs``         — preload_termstats + preload_bucket_coverage
                             (long-lived serving amortization)
* ``warm_query_secs``      — the steady-state p50 afterwards

Usage: python tools/cold_open_bench.py [index_path]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsx_idx_2m"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"))
    from host_probe import run as host_probe

    probe = host_probe()

    from frankensearch_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark(
        "fsx-cold-open", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    def wf(batches):
        yield from batches
    spark.range(0, cpus * 4, 1, cpus * 4).mapInArrow(wf, "id long").count()
    session_up = time.perf_counter() - t0

    from frankensearch_spark.engine import FrankensearchSpark

    t0 = time.perf_counter()
    eng = FrankensearchSpark.load(spark, idx_path)
    load_secs = time.perf_counter() - t0

    t0 = time.perf_counter()
    first = eng.search_docids("term00042", limit=10)
    first_query = time.perf_counter() - t0
    assert first

    t0 = time.perf_counter()
    eng.warm()
    preload_secs = time.perf_counter() - t0

    warm = []
    for q in ("fn", "term00100", "term00042 term00100",
              "generated record", "term00500"):
        t0 = time.perf_counter()
        eng.search_docids(q, limit=10)
        warm.append(time.perf_counter() - t0)

    out = {
        "index": idx_path,
        "cpus": cpus,
        "host_probe": probe,
        "session_up_secs": round(session_up, 2),
        "load_secs": round(load_secs, 3),
        "first_query_secs": round(first_query, 3),
        "cold_open_secs": round(load_secs + first_query, 3),
        "preload_secs": round(preload_secs, 2),
        "warm_query_secs": round(statistics.median(warm), 3),
    }
    sidecar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_COLDOPEN.json",
    )
    with open(sidecar, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
