"""Document lifecycle: delete (tombstones), upsert, compaction (SURVEY.md
S2/M3 — quill/index.rs:9104-9270 delete/upsert, keeper.rs:4219-4253
tombstone-folding compaction).

Reference semantics carried over exactly:

* A delete never rewrites postings — it adds the docid to a TOMBSTONE set;
  queries exclude tombstoned docs from RESULTS, but snapshot statistics
  (``df``, ``N``, ``total_tokens``) keep counting them until compaction
  (grimoire.rs:68-71, argus.rs:1327-1344 — scores of surviving docs do
  NOT change when a neighbour is deleted).
* Upsert = index the new revision under a fresh docid + tombstone every
  older docid with the same external key (new internal docid + tombstone,
  COMPREHENSIVE_PLAN.md:274-276).  Docids are never reused; the new ids
  are leased above the current high-watermark (keeper.rs:1567-1610).
* Compaction folds tombstones: drop dead rows from postings/docmeta,
  recompute stats, PRESERVE surviving docids (gaps are fine,
  keeper.rs:4219-4253).  After compaction scores MAY change (df/N drop) —
  same as the reference.

Spark shapes: the tombstone set is a DataFrame of docids (anti-joined at
query time — cheap broadcast at sane tombstone counts); compaction is an
anti-join rewrite job.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.operators.build import (
    BuiltIndex,
    MultiFieldIndex,
    build_fieldstats,
    build_index,
    build_termstats,
)

TOMBSTONE_COMPACT_THRESHOLD = 0.20  # config.rs:29


def _tombstone_df(index, docids) -> DataFrame:
    df = getattr(index, "postings", None)
    if df is None:  # ServingIndex carries blocks, not postings
        df = index.blocks
    spark = df.sparkSession
    if isinstance(docids, DataFrame):
        return docids.select(F.col(docids.columns[0]).cast("long").alias("docid"))
    return spark.createDataFrame(
        [(int(d),) for d in docids], "docid long"
    )


def delete_documents(index, docids):
    """Tombstone documents by docid; returns a new searchable handle.

    Stats tables are passed through untouched — the reference's
    "df/N include tombstoned docs until compaction" rule.  Multi-field
    indexes tombstone on the PRIMARY field (the one query-time anti-join
    source shared by every field)."""
    from frankensearch_spark.operators.wand import (
        ServingIndex,
        ServingMultiIndex,
    )

    if isinstance(index, MultiFieldIndex):
        fields = dict(index.fields)
        fields[index.primary_name] = delete_documents(index.primary, docids)
        # field_cols must survive: upsert ends in delete_documents, and
        # the NEXT upsert needs the field->source-column map
        return MultiFieldIndex(
            fields, index.primary_name,
            field_cols=getattr(index, "field_cols", None),
        )
    if isinstance(index, ServingMultiIndex):
        fields = dict(index.fields)
        fields[index.primary_name] = delete_documents(index.primary, docids)
        return dataclasses.replace(index, fields=fields)
    if isinstance(index, ServingIndex):
        ts = _tombstone_df(index, docids)
        if index.tombstones is not None:
            ts = index.tombstones.unionByName(ts).distinct()
        # replace() keeps every other field — including the warm()
        # planning state (_term_df_cache, _bucket_cov): tombstones don't
        # change term stats or bucket coverage, only result filtering
        return dataclasses.replace(index, tombstones=ts)
    ts = _tombstone_df(index, docids)
    if index.tombstones is not None:
        ts = index.tombstones.unionByName(ts).distinct()
    # replace() keeps every other field incl. the preload_termstats()
    # warm planning cache — tombstones only change result filtering
    return dataclasses.replace(index, tombstones=ts)


def delete_by_key(index: BuiltIndex, key_predicate) -> BuiltIndex:
    """Tombstone by external key predicate over docmeta (delete_documents
    by id, index.rs:9254)."""
    ids = index.docmeta.filter(key_predicate).select("docid")
    return delete_documents(index, ids)


def _shift_union(old: BuiltIndex, delta: BuiltIndex, shift: int,
                 tombstones) -> BuiltIndex:
    """Union ``delta`` into ``old`` with the delta's docids shifted above
    the high-watermark; per-field stats recomputed over the union."""
    shifted_postings = delta.postings.withColumn(
        "docid", F.col("docid") + F.lit(shift)
    )
    shifted_docmeta = delta.docmeta.withColumn(
        "docid", F.col("docid") + F.lit(shift)
    )
    if (delta.positions is None) != (old.positions is None):
        # silently dropping one side's positions would leave a PARTIAL
        # positions table: phrase queries then silently miss the docs of
        # the positionless side — fail loudly instead
        missing = "delta" if delta.positions is None else "existing index"
        raise ValueError(
            "positions present on only one side of the upsert (the "
            f"{missing} lacks them); rebuild/upsert with matching "
            "with_positions"
        )
    shifted_positions = (
        delta.positions.withColumn("docid", F.col("docid") + F.lit(shift))
        if delta.positions is not None
        else None
    )
    # every build path (fused arrow, vector, auto, SQL) emits positions
    # as per-posting LEB128 binary — one wire format, no normalization;
    # only durable segments sealed by pre-unification writers still carry
    # array<int> (handled at load in streaming/incremental.py)
    old_positions = old.positions
    postings = old.postings.unionByName(shifted_postings)
    docmeta = old.docmeta.unionByName(
        shifted_docmeta.select(*old.docmeta.columns)
    )
    positions = (
        old_positions.unionByName(shifted_positions)
        if shifted_positions is not None
        else old_positions
    )
    return BuiltIndex(
        postings=postings,
        docmeta=docmeta,
        termstats=build_termstats(postings),
        fieldstats=build_fieldstats(docmeta),
        positions=positions,
        tombstones=tombstones,
    )


def serving_to_built(index):
    """Reconstruct builder form from a durable serving index: ONE
    distributed decode pass over the whole block store (no driver
    materialization), doclen re-joined from docmeta (fieldnorm
    quantization is idempotent, so re-derived ids equal the stored
    ones bit-for-bit).  This is what lets a LOADED engine run
    upsert/compact with full reference semantics (index.rs:9104-9270
    over a committed snapshot).

    Cost note: linear in index size — fine for compaction-sized jobs;
    for high-rate appends at very large corpora prefer streamed
    mini-segments (streaming.incremental), which never decode the base."""
    from frankensearch_spark.operators.wand import (
        ServingIndex,
        ServingMultiIndex,
    )

    if isinstance(index, ServingMultiIndex):
        return MultiFieldIndex(
            {n: serving_to_built(f) for n, f in index.fields.items()},
            index.primary_name,
            field_cols=index.field_cols,
        )
    assert isinstance(index, ServingIndex)
    from frankensearch_spark.operators.serving_exec import blocks_to_postings

    decoded = blocks_to_postings(
        index, None, with_positions=index.has_positions
    )
    doclens = index.docmeta.select("docid", "doclen")
    post = decoded.drop("fieldnorm_id").join(doclens, "docid")
    if index.has_positions:
        postings_full = post.select("docid", "term", "tf", "positions", "doclen")
        postings = postings_full.drop("positions")
        positions = postings_full.select("docid", "term", "positions")
    else:
        postings_full = None
        postings = post.select("docid", "term", "tf", "doclen")
        positions = None
    return BuiltIndex(
        postings=postings,
        docmeta=index.docmeta,
        termstats=index.termstats,
        fieldstats=index.fieldstats,
        positions=positions,
        tombstones=index.tombstones,
        postings_full=postings_full,
    )


def upsert_documents(
    index,
    new_corpus: DataFrame,
    key_cols: list[str],
    content_col: str = "content",
    **build_kw,
):
    """Replace-by-external-key: index new revisions under fresh docids,
    tombstone every existing docid sharing the key.

    The fresh docids lease a block above the current high-watermark —
    never reused, monotone (Q1 docid discipline).  Multi-field indexes
    upsert every field from the same delta corpus (requires the
    ``field_cols`` mapping the index was built with)."""
    hwm_row = index.docmeta.agg(F.max("docid").alias("m")).collect()[0]
    hwm = int(hwm_row["m"]) if hwm_row["m"] is not None else -1
    shift = hwm + 1

    old_ids = index.docmeta.join(
        new_corpus.select(*key_cols).distinct(), key_cols, "inner"
    ).select("docid")

    if isinstance(index, MultiFieldIndex):
        if not getattr(index, "field_cols", None):
            raise ValueError(
                "multi-field upsert needs the index's field_cols mapping "
                "(build via build_multifield_index)"
            )
        from frankensearch_spark.operators.build import build_multifield_index

        delta = build_multifield_index(
            new_corpus, key_cols, index.field_cols,
            primary=index.primary_name, **build_kw,
        )
        fields = {
            name: _shift_union(
                index.fields[name], delta.fields[name], shift,
                index.fields[name].tombstones,
            )
            for name in index.fields
        }
        merged = MultiFieldIndex(
            fields, index.primary_name, field_cols=index.field_cols
        )
        return delete_documents(merged, old_ids)

    delta = build_index(new_corpus, key_cols, content_col, **build_kw)
    merged = _shift_union(index, delta, shift, index.tombstones)
    return delete_documents(merged, old_ids)


def tombstone_density(index: BuiltIndex) -> float:
    if index.tombstones is None:
        return 0.0
    n_docs, _ = index.stats()
    if n_docs == 0:
        return 0.0
    return index.tombstones.count() / n_docs


def compact(index, force: bool = False, cache: bool = True):
    """Fold tombstones: rewrite without dead docs, preserving surviving
    docids; stats recomputed from survivors (keeper.rs:4219-4253).

    No-op below the 20% density threshold unless ``force``.  Multi-field
    indexes fold the (primary-held) tombstone set into EVERY field."""
    if index.tombstones is None:
        return index
    if not force and tombstone_density(index) <= TOMBSTONE_COMPACT_THRESHOLD:
        return index
    if isinstance(index, MultiFieldIndex):
        ts = index.tombstones
        fields = {}
        for name, sub in index.fields.items():
            with_ts = BuiltIndex(
                postings=sub.postings,
                docmeta=sub.docmeta,
                termstats=sub.termstats,
                fieldstats=sub.fieldstats,
                positions=sub.positions,
                tombstones=ts,
            )
            fields[name] = compact(with_ts, force=True, cache=cache)
        return MultiFieldIndex(
            fields, index.primary_name,
            field_cols=getattr(index, "field_cols", None),
        )
    ts = index.tombstones
    postings = index.postings.join(ts, "docid", "left_anti")
    docmeta = index.docmeta.join(ts, "docid", "left_anti")
    positions = (
        index.positions.join(ts, "docid", "left_anti")
        if index.positions is not None
        else None
    )
    if cache:
        # the SUPERSEDED index's persisted frames are deliberately left
        # alone: engines are immutable and the caller may still hold
        # (and query) the pre-compact engine.  Spark persists at
        # MEMORY_AND_DISK, so abandoned generations are LRU-evicted
        # under pressure rather than leaking unboundedly; a long-lived
        # process that compacts in a loop and wants the memory back NOW
        # can `old_engine.index.postings.unpersist()` once it drops its
        # last reference.
        postings = postings.persist()
        docmeta = docmeta.persist()
    return BuiltIndex(
        postings=postings,
        docmeta=docmeta,
        termstats=build_termstats(postings),
        fieldstats=build_fieldstats(docmeta),
        positions=positions,
        tombstones=None,
    )
