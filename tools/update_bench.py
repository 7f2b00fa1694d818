"""Update-path bench: the QG-3/QG-5 analogues (round-5 verdict task 5).

Reference contract (quill-perf-gates.toml:73-86): sustained upsert rate
>= 5k updates/s in 5k-doc batches over a warm index, and compaction at
20% tombstone density >= 5x faster than the oracle force-merge shape
(a full rebuild of the survivors).

Spark analogue over a SAVED durable index (default /tmp/fsx_idx_2m):

* ``decode_to_built_secs`` — the one-time serving->built decode pass a
  loaded engine pays before its first lifecycle op (lifecycle.
  serving_to_built; the reference mmaps builder state for free).
* ``upsert`` — K replacement batches of 5k docs each (same natural keys,
  new content — make_corpus keys are deterministic per docid, so a
  different seed is a pure replace batch).  Per batch the clock stops
  only when the update is VISIBLE: a search over the updated engine
  returns a docid from the fresh lease block.  Batches chain (each
  upserts the previous result) like a real update stream.
* ``compact`` — delete to 20% tombstone density, fold with
  compact(force=True), materialize survivors; compared against the
  oracle force-merge (full rebuild of the surviving corpus at the same
  parallelism).

Usage: python tools/update_bench.py [index_path] [n_batches]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fsx_idx_2m"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batch_docs = 5_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from frankensearch_spark.corpus import make_corpus
    from frankensearch_spark.engine import FrankensearchSpark
    from frankensearch_spark.operators.build import build_index
    from frankensearch_spark.session import get_spark
    from frankensearch_spark.sources.corpus import CORPUS_SCHEMA

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"))
    from host_probe import run as host_probe

    probe = host_probe()
    spark = get_spark(
        "fsx-update-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Python-worker warmup (CLAUDE.md: cold-start ~10 s at 32 workers)
    def wf(batches):
        yield from batches
    spark.range(0, cpus * 4, 1, cpus * 4).mapInArrow(wf, "id long").count()

    out: dict = {"index": idx_path, "cpus": cpus, "host_probe": probe,
                 "batch_docs": batch_docs, "n_batches": n_batches}

    eng = FrankensearchSpark.load(spark, idx_path)
    if not eng.key_cols:
        # scaling-bench-era indexes predate key_cols in the manifest;
        # docmeta carries the natural key columns either way
        eng = FrankensearchSpark(
            eng.index, ["repo", "path", "commit"], eng.corpus, eng.schema
        )
    n_docs = eng.index.stats()[0]
    out["n_docs"] = n_docs

    # one-time decode pass (loaded engines only; builder-resident
    # engines skip it) — forced here so the upsert arm measures upserts
    t0 = time.perf_counter()
    built_eng = FrankensearchSpark(
        eng._as_built(), eng.key_cols, eng.corpus, eng.schema
    )
    built_eng.index.postings.persist().count()
    built_eng.index.docmeta.persist().count()
    out["decode_to_built_secs"] = round(time.perf_counter() - t0, 2)
    print(f"progress: decode done {out}", file=sys.stderr)

    # ---- upsert arm: chained 5k replace batches, visibility-stopped
    batch_secs = []
    cur = built_eng
    for b in range(n_batches):
        rows = make_corpus(batch_docs, seed=1000 + b)
        delta = spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
        hwm = cur.index.docmeta.agg(F.max("docid")).collect()[0][0]
        probe_term = f"term{(b + 3) * 11:05d}"
        t0 = time.perf_counter()
        cur = cur.upsert(delta)
        # visibility witnesses stop the clock: the replace batch's fresh
        # lease docids are all above the pre-upsert high-watermark, and
        # a search over the updated engine serves
        n_new = cur.index.docmeta.where(F.col("docid") > hwm).count()
        hits = cur.search_docids(probe_term, limit=5)
        dt = time.perf_counter() - t0
        assert n_new == batch_docs, (n_new, batch_docs)
        assert hits, probe_term
        batch_secs.append(round(dt, 3))
    out["upsert_batch_secs"] = batch_secs
    out["upsert_docs_per_sec"] = round(
        batch_docs * n_batches / sum(batch_secs), 1
    )
    print(f"progress: upsert done {out}", file=sys.stderr)

    # ---- bulk-upsert arm: one 100k replace batch — separates the
    # per-batch Spark job constants (the 5k-batch latency floor) from
    # sustainable update THROUGHPUT
    bulk_docs = 100_000
    rows = make_corpus(bulk_docs, seed=9000)
    delta = spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
    hwm = built_eng.index.docmeta.agg(F.max("docid")).collect()[0][0]
    t0 = time.perf_counter()
    bulk = built_eng.upsert(delta)
    n_new = bulk.index.docmeta.where(F.col("docid") > hwm).count()
    hits = bulk.search_docids("term00042", limit=5)
    dt = time.perf_counter() - t0
    assert n_new == bulk_docs and hits
    out["bulk_upsert_secs"] = round(dt, 2)
    out["bulk_upsert_docs_per_sec"] = round(bulk_docs / dt, 1)
    print(f"progress: bulk upsert done {out}", file=sys.stderr)

    # ---- compaction arm at 20% tombstone density (docids are sparse
    # lease-based — sample every 5th LIVE docid, not a dense range)
    dead = built_eng.index.docmeta.where(
        F.col("docid") % 5 == 0
    ).select("docid")
    deleted = built_eng.delete_documents(dead)
    t0 = time.perf_counter()
    compacted = deleted.compact(force=True)
    compacted.index.postings.count()
    compacted.index.docmeta.count()
    out["compact_secs"] = round(time.perf_counter() - t0, 2)
    out["compact_survivors"] = compacted.index.stats()[0]

    # oracle force-merge SHAPE comparator: a full rebuild of an
    # equal-sized (80%) corpus of the same generator shape at the same
    # parallelism — what the reference's force-merge gate compares
    # compaction against.  Read from the bench corpus parquet (no
    # driver-side materialization); a deterministic key-hash filter
    # keeps ~80% of rows.
    corpus_pq = f"/tmp/fsx_bench_corpus_{n_docs}.parquet"
    if os.path.exists(corpus_pq):
        full_df = spark.read.parquet(corpus_pq)
    else:
        full_df = spark.createDataFrame(
            make_corpus(n_docs), schema=CORPUS_SCHEMA
        )
    surv_pq = "/tmp/fsx_update_bench_survivors.parquet"
    full_df.where(
        F.crc32(F.concat_ws("|", "repo", "path", "commit")) % 5 != 0
    ).write.mode("overwrite").parquet(surv_pq)
    surv_df = spark.read.parquet(surv_pq)
    out["force_merge_docs"] = surv_df.count()
    print(f"progress: compact done {out}", file=sys.stderr)
    t0 = time.perf_counter()
    rebuilt = build_index(
        surv_df, ["repo", "path", "commit"], "content"
    )
    rebuilt.postings.count()
    rebuilt.docmeta.count()
    out["force_merge_rebuild_secs"] = round(time.perf_counter() - t0, 2)
    out["compact_speedup_vs_rebuild"] = round(
        out["force_merge_rebuild_secs"] / max(out["compact_secs"], 1e-9), 2
    )

    sidecar = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_UPDATE.json",
    )
    with open(sidecar, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
