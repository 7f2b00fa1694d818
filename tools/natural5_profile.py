"""Stage-level timing decomposition of the multi-term serving path.

Round-5 task #1 (VERDICT.md): natural5 at 2M runs 2.5-3.2 s warm vs
0.8-0.9 s single-term — before attempting MaxScore term elimination
(argus.rs:29,4463-4485), measure WHERE the time goes: _prepare, the
coverage gate, the exhaustive run_topk job, and the same query through
the batch bucket lane as a batch of one.

Usage: python tools/natural5_profile.py [index_path]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    "natural3": "term00001 term00007 generated record",
    "natural5": "term00042 term00100 term00500 term01000 term02000",
    "single": "term00042",
}


def t(fn, n=3):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 3)


def main() -> None:
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsx_idx_2m"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from frankensearch_spark.operators.batchexec import search_batch_collect
    from frankensearch_spark.operators.serving_exec import (
        ast_to_queryspec_fields,
        serving_search_bits,
    )
    from frankensearch_spark.operators.wand import (
        _coverage_gap,
        _prepare,
        _wand_fields,
        wand_topk,
    )
    from frankensearch_spark.plans.manifest import read_index
    from frankensearch_spark.query_ast import ENGINE_SCHEMA, parse_lenient
    from frankensearch_spark.session import get_spark

    spark = get_spark(
        "fsx-natural5-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
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

    for name, q in QUERIES.items():
        ast = parse_lenient(q, ENGINE_SCHEMA).query
        spec, term_fields = ast_to_queryspec_fields(ast)
        # warm everything once
        serving_search_bits(srv, q, 10)

        prep_s = t(lambda: _prepare(srv, spec, term_fields))
        prep = _prepare(srv, spec, term_fields)
        weights, tf_caches, avgdls, cand, stats, tf_order = prep
        fidx, primary = _wand_fields(srv)
        gap = _coverage_gap(fidx, spec, tf_order)
        gap_s = t(lambda: _coverage_gap(fidx, spec, tf_order))
        wand_s = t(lambda: wand_topk(srv, spec, 10, term_fields=term_fields))
        batch_s = t(lambda: search_batch_collect(srv, [ast], 10))
        serve_s = t(lambda: serving_search_bits(srv, q, 10))
        # how much data crosses the exchange on the exhaustive path
        agg = cand.groupBy().agg(
            {"n": "sum", "*": "count"}
        ).collect()[0]
        print(json.dumps({
            "query": name,
            "coverage_gap": None if gap is None else round(gap, 4),
            "block_rows": int(agg["count(1)"]),
            "postings": int(agg["sum(n)"] or 0),
            "prepare_s": prep_s,
            "gap_s": gap_s,
            "wand_topk_s": wand_s,
            "batch_of_one_s": batch_s,
            "serving_bits_s": serve_s,
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
