"""Generate PLANS.md: the physical plans of the engine's hot paths, with
the properties each plan must exhibit (scan pruning, exchange count,
whole-stage codegen spans, no driver-side materialization).

Usage: python tools/explain_audit.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = buf.getvalue()
    # keep the operator tree + the interesting node details, drop the
    # (very long) column-by-column sections for readability
    return out


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from frankensearch_spark.operators.astexec import topk_ast
    from frankensearch_spark.operators.build import (
        build_index,
        build_postings_fused,
    )
    from frankensearch_spark.plans.manifest import read_index, write_index
    from frankensearch_spark.session import get_spark
    from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthetic_corpus_df(spark, 2000, partitions=4)

    sections: list[tuple[str, str, str]] = []

    # 1. fused tokenize+aggregate
    from frankensearch_spark.operators.build import assign_docids

    with_docid = assign_docids(corpus, CORPUS_KEY, mode="lease",
                               assert_unique=False)
    fused = build_postings_fused(with_docid)
    sections.append((
        "Fused tokenize → aggregate (build_postings_fused)",
        "ONE MapInArrow over the docid-assigned corpus — zero shuffles: "
        "per-document tf/positions aggregation never leaves its partition "
        "(the shard-local columnar accumulation of scribe.rs:2285). The "
        "only exchanges in the plan belong to the docid map join "
        "(broadcast) and the lease range partition on skinny keys.",
        fmt(fused),
    ))

    # 1b. grouped durable fast path with FUSED lease assignment (round 3)
    from frankensearch_spark.operators.build import (
        assign_docids_fused_spans,
        build_postings_grouped,
    )

    spans = assign_docids_fused_spans(corpus, CORPUS_KEY, 4)
    grouped_frame = build_postings_grouped(spans, "content", False, True)
    sections.append((
        "Grouped build with fused lease assignment "
        "(assign_docids_fused_spans → build_postings_grouped)",
        "The durable fast path's WHOLE pre-write plan: ONE range exchange "
        "of the corpus by external key both co-locates and orders each "
        "lease's rows (sampling pass + exchange), docids materialize as "
        "lease·2^33 + rank inside the same mapInArrow pass that "
        "tokenizes, and the grouped (batch, term) array rows come out of "
        "that pass directly.  Compare section 1: the separate skinny "
        "ordering aggregation, the window sort, the (key→docid) "
        "broadcast map and the second content exchange are all gone — "
        "at 2M docs that removed ~180 MB of broadcast state and a full "
        "extra pass over the corpus.",
        fmt(grouped_frame),
    ))

    # 2. exhaustive query path
    idx = build_index(corpus, CORPUS_KEY)
    idx.postings.count()
    q = topk_ast(idx, "fn import term00000", k=10)
    sections.append((
        "Exhaustive BM25 top-k (topk_ast)",
        "term-filtered scan of the CACHED postings (InMemoryTableScan, "
        "column-pruned) → ONE pivot exchange on near-unique (docid) keys "
        "→ numpy f32 kernel in a single MapInPandas → TakeOrderedAndProject "
        "(per-partition top-k + driver merge = the reference's collector "
        "fold, E9/E11). No other exchange; no driver-side loop.",
        fmt(q),
    ))

    # 3. durable index scan pruning
    tmp = tempfile.mkdtemp(prefix="fsx_plan_idx_")
    try:
        write_index(idx, tmp, n_groups=1)
        srv = read_index(spark, tmp)
        cand = srv.blocks.filter(
            (F.col("tpart") == 3) & (F.col("term") == "fn")
        )
        sections.append((
            "Durable block scan with term/tpart pruning",
            "query-time term → tpart predicates reach the parquet scan as "
            "PushedFilters; files/row-groups outside the term partition "
            "never read (TERMDICT block-first-key analogue). The pos_bytes "
            "positions sidecar is absent from ReadSchema unless the query "
            "is a phrase — column pruning keeps bag-of-words scans narrow.",
            fmt(cand.select("term", "bucket", "n", "max_tf_code")),
        ))

        # 4. WAND bounds aggregation (phase A)
        meta = cand.groupBy("bucket", "term").agg(
            F.max("max_tf_code").alias("mtc"),
            F.min("min_fieldnorm_id").alias("mfn"),
            F.sum("n").alias("n_postings"),
        )
        sections.append((
            "WAND phase A: distributed per-bucket bounds",
            "block METADATA only (no posting decode): partial aggregation "
            "map-side, one exchange on (bucket, term); the per-bucket "
            "conservative bound then runs as a grouped pandas kernel and "
            "only the top seed_scan_cap bound rows ever reach the driver "
            "(TakeOrderedAndProject).",
            fmt(meta),
        ))

        # 4b. single-clause shuffle-free fast path (round 3): the ONLY
        # exchange in the whole plan is the final TakeOrderedAndProject
        from frankensearch_spark.contract import (
            compute_avgdl,
            compute_tf_cache,
            term_weight,
        )
        from frankensearch_spark.operators.merge import term_partition
        from frankensearch_spark.operators.wand import (
            _single_term_stream_plan,
        )

        dc, tt = srv.stats()
        one = srv.blocks.filter(
            (F.col("tpart") == term_partition("fn", srv.n_term_partitions))
            & (F.col("term") == "fn")
        )
        fast = _single_term_stream_plan(
            one,
            term_weight(srv.df_of_terms(["fn"]).get("fn", 1), dc),
            compute_tf_cache(compute_avgdl(tt, dc)),
            srv.bucket_shift,
            10,
        )
        sections.append((
            "Single-clause fast path (mega-term/short-keyword serving)",
            "one scored clause means one posting per matching doc — no "
            "cross-block accumulation exists, so the bucket exchange the "
            "general kernel needs is pure overhead here.  Blocks decode "
            "and score inside their scan partitions (MapInPandas over the "
            "tpart/term-pruned block scan), each partition emits a local "
            "top-k, and the only exchange in the plan is the final "
            "TakeOrderedAndProject merge.  2M-doc warm p50: fn "
            "1.77 -> 1.21 s, term00042 1.50 -> 0.58 s.",
            fmt(fast),
        ))

        # 4c. batched serving over the DURABLE index: the bucket lane
        from frankensearch_spark.operators.batchexec import topk_ast_batch

        srv_batch = topk_ast_batch(
            srv,
            ["term00001 AND term00002", '"term00001 term00002"',
             "term00003 -term00004"],
            k=10,
        )
        sections.append((
            "Batched top-k over the durable index (bucket lane, 3 queries)",
            "Candidate blocks for the UNION of batch terms cross ONE "
            "docid-colocating exchange STILL COMPRESSED (no posting-row "
            "shuffle, no (docid × union-terms) pivot); each bucket task "
            "decodes each block once, builds dense span-local FieldViews "
            "and evaluates every query's AST in the shared kernel under "
            "per-query support masks; phrase terms read the pos_bytes "
            "sidecar per bucket, non-phrase blocks never scan it "
            "(ReadSchema).  Per-bucket local top-k per query, then the "
            "tiny per-qid window cut.  Measured 5.6× the concurrent-FAIR "
            "throughput at 2M docs (BENCH.md §3 round 4).",
            fmt(srv_batch),
        ))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # 5. near-dup pipeline: shingling stays narrow/codegen, exchanges are
    # the small signature aggregates + bucket self-join
    from frankensearch_spark.driver_queries import _near_dup_pairs_df

    nd = _near_dup_pairs_df(spark, "/root/testdata/sf0.001")
    sections.append((
        "Near-dup pipeline (shingle-LSH candidates + verify)",
        "3-shingling is a single whole-stage-codegen projection "
        "(transform over the split token array — no self-join, no Python); "
        "the exchanges are the per-(docid, seed) minhash aggregate, the "
        "band-bucket aggregate, and the bucket self-join that emits only "
        "same-bucket candidate pairs.  The exact-Jaccard verify join "
        "touches LSH survivors only — the plan never builds an all-pairs "
        "product, which is the property that survives 100 TB.",
        fmt(nd),
    ))
    nd.unpersist() if hasattr(nd, "unpersist") else None

    # 6. as-of join: one exchange on user_id, then a window pass
    from frankensearch_spark.driver_queries import q_events_asof_join

    sections.append((
        "As-of join over events (purchase -> latest prior view)",
        "Spark-native ASOF formulation: union both event sides, ONE "
        "exchange on user_id, one Sort + Window carrying "
        "last(view, ignoreNulls) forward.  No range self-join, no "
        "per-row Python; per-user work is O(n log n) in its partition.",
        fmt(q_events_asof_join(spark, "/root/testdata/sf0.001")),
    ))

    # 6b. batched serving: one job for a whole query batch
    from frankensearch_spark.operators.batchexec import topk_ast_batch

    batch_df = topk_ast_batch(
        idx, ["fn import", "term00001 AND term00002", '"term00001 term00002"'],
        k=10,
    )
    sections.append((
        "Batched top-k (3 queries, one job)",
        "The batch shares ONE term-filtered postings scan (union of all "
        "batch terms — partition pruning intact), ONE pivot exchange per "
        "field, and ONE MapInPandas kernel pass that evaluates every "
        "query's AST with a per-query support mask; partitions emit "
        "per-query local top-k, so the only batch-added exchange is the "
        "(batch × k × partitions)-row window for the global cut.  Batch "
        "size multiplies pivot ROWS, never plan STAGES — the per-job "
        "scheduling constant is paid once per batch (measured 8.7× the "
        "concurrent-FAIR throughput at 20k docs, BENCH.md §3).",
        fmt(batch_df),
    ))

    # 7. curation tail: boilerplate detector + latest-per-key compaction
    from frankensearch_spark.driver_queries import (
        q_boilerplate_ngrams,
        q_latest_event_per_user,
    )

    sections.append((
        "Boilerplate 5-gram detector (corpus-wide)",
        "ONE column-pruned scan (ReadSchema = text only) → Generate over "
        "the aliased token array (the tokenizer evaluates ONCE per row — "
        "passing the raw split() expression instead measured 7 inlined "
        "copies) → map-side partial count → one exchange on the gram key "
        "→ TakeOrderedAndProject for the deterministic top-200 cut.  "
        "Per-doc grams dedupe inside the projection, so the aggregate "
        "never needs count(DISTINCT docid).",
        fmt(q_boilerplate_ngrams(spark, "/root/testdata/sf0.001")),
    ))
    sections.append((
        "Latest-record-per-key compaction (latest_event_per_user)",
        "max_by over a (ts_us, event_id) struct ordering key is "
        "partial-aggregable: map-side partial_max_by, ONE exchange on "
        "user_id, final merge — no per-user window sort, which is the "
        "formulation that beats row_number() when keys are many and "
        "rows-per-key few (the CDC snapshot shape).",
        fmt(q_latest_event_per_user(spark, "/root/testdata/sf0.001")),
    ))

    # 8. round-4 curation tail: packing, dup spans, mix weights
    from frankensearch_spark.driver_queries import (
        q_dup_span_marks,
        q_pack_offsets,
        q_source_mix_weights,
    )

    sections.append((
        "Sequence packing offsets (pack_offsets)",
        "A SEGMENTED prefix sum, not a global window: per-segment token "
        "totals aggregate map-side to ~n_segments rows, the segment "
        "bases prefix-sum over that tiny frame (the only unpartitioned "
        "window — over segment COUNT rows, not document rows) and "
        "broadcast-join back, then the within-segment cumsum windows "
        "partition BY SEGMENT.  A naive SUM() OVER (ORDER BY docid) "
        "would route every document through one partition; this plan's "
        "per-document window is hash-partitioned on segid.",
        fmt(q_pack_offsets(spark, "/root/testdata/sf0.001")),
    ))
    sections.append((
        "ExactSubstr-style duplicated-span marks (dup_span_marks)",
        "Window starts flow through ONE distinct + ONE map-side-partial "
        "hash agg on the gram key, join BACK on the same key (no "
        "broadcast of the corpus side — the dup-gram list is the small "
        "side but correctness doesn't depend on it), then the "
        "gaps-and-islands merge windows partition by docid.  Nothing "
        "corpus-scale crosses an unpartitioned boundary.",
        fmt(q_dup_span_marks(spark, "/root/testdata/sf0.001")),
    ))
    from frankensearch_spark.driver_queries import (
        q_funnel_conversion,
        q_quality_filter_verdict,
    )

    sections.append((
        "Ordered funnel conversion (funnel_conversion)",
        "ONE map-side-combinable conditional-min agg per user (no "
        "window, no self-join, no per-user sort) computes each stage's "
        "first epoch-micros; the stage summary is a second agg over the "
        "per-user frame.  The only exchange on corpus-scale data is the "
        "user_id hash partition of the first agg.",
        fmt(q_funnel_conversion(spark, "/root/testdata/sf0.001")),
    ))
    sections.append((
        "Composed quality gate (quality_filter_verdict)",
        "One codegen projection per document — the tokenizer evaluates "
        "once behind an alias, the token-count / mean-token-length / "
        "dup-3-gram signals and the verdict CASE all fuse into the same "
        "WholeStageCodegen span; no joins, no aggregation, no shuffle "
        "beyond the scan.",
        fmt(q_quality_filter_verdict(spark, "/root/testdata/sf0.001")),
    ))
    sections.append((
        "Temperature mix weights (source_mix_weights)",
        "One map-side-combinable agg to ~n_sources rows, then a 1-row "
        "total broadcast back (BroadcastNestedLoopJoin over one row) — "
        "the corpus is scanned exactly once, ReadSchema prunes to "
        "(source, text).",
        fmt(q_source_mix_weights(spark, "/root/testdata/sf0.001")),
    ))

    out = ["# PLANS — physical-plan audit of the hot paths",
           "",
           "Generated by `python tools/explain_audit.py` "
           "(local[4], 2k-doc corpus; plan SHAPE is scale-independent).",
           ""]
    for title, claim, plan in sections:
        out += [f"## {title}", "", claim, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
