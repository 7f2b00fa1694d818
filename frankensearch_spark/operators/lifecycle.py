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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.operators.build import (
    BuiltIndex,
    build_fieldstats,
    build_index,
    build_termstats,
)

TOMBSTONE_COMPACT_THRESHOLD = 0.20  # config.rs:29


def _tombstone_df(index: BuiltIndex, docids) -> DataFrame:
    spark = index.postings.sparkSession
    if isinstance(docids, DataFrame):
        return docids.select(F.col(docids.columns[0]).cast("long").alias("docid"))
    return spark.createDataFrame(
        [(int(d),) for d in docids], "docid long"
    )


def delete_documents(index: BuiltIndex, docids) -> BuiltIndex:
    """Tombstone documents by docid; returns a new searchable handle.

    Stats tables are passed through untouched — the reference's
    "df/N include tombstoned docs until compaction" rule."""
    ts = _tombstone_df(index, docids)
    if index.tombstones is not None:
        ts = index.tombstones.unionByName(ts).distinct()
    return BuiltIndex(
        postings=index.postings,
        docmeta=index.docmeta,
        termstats=index.termstats,
        fieldstats=index.fieldstats,
        positions=index.positions,
        tombstones=ts,
        _cached_stats=index._cached_stats,
    )


def delete_by_key(index: BuiltIndex, key_predicate) -> BuiltIndex:
    """Tombstone by external key predicate over docmeta (delete_documents
    by id, index.rs:9254)."""
    ids = index.docmeta.filter(key_predicate).select("docid")
    return delete_documents(index, ids)


def upsert_documents(
    index: BuiltIndex,
    new_corpus: DataFrame,
    key_cols: list[str],
    content_col: str = "content",
    **build_kw,
) -> BuiltIndex:
    """Replace-by-external-key: index new revisions under fresh docids,
    tombstone every existing docid sharing the key.

    The fresh docids lease a block above the current high-watermark —
    never reused, monotone (Q1 docid discipline)."""
    hwm_row = index.docmeta.agg(F.max("docid").alias("m")).collect()[0]
    hwm = int(hwm_row["m"]) if hwm_row["m"] is not None else -1

    old_ids = index.docmeta.join(
        new_corpus.select(*key_cols).distinct(), key_cols, "inner"
    ).select("docid")

    delta = build_index(new_corpus, key_cols, content_col, **build_kw)
    # shift the delta's docids above the high-watermark
    shift = hwm + 1
    shifted_postings = delta.postings.withColumn(
        "docid", F.col("docid") + F.lit(shift)
    )
    shifted_docmeta = delta.docmeta.withColumn(
        "docid", F.col("docid") + F.lit(shift)
    )
    shifted_positions = (
        delta.positions.withColumn("docid", F.col("docid") + F.lit(shift))
        if delta.positions is not None and index.positions is not None
        else None
    )

    postings = index.postings.unionByName(shifted_postings)
    docmeta = index.docmeta.unionByName(
        shifted_docmeta.select(*index.docmeta.columns)
    )
    positions = (
        index.positions.unionByName(shifted_positions)
        if shifted_positions is not None
        else index.positions
    )
    merged = BuiltIndex(
        postings=postings,
        docmeta=docmeta,
        termstats=build_termstats(postings),
        fieldstats=build_fieldstats(docmeta),
        positions=positions,
        tombstones=index.tombstones,
    )
    return delete_documents(merged, old_ids)


def tombstone_density(index: BuiltIndex) -> float:
    if index.tombstones is None:
        return 0.0
    n_docs, _ = index.stats()
    if n_docs == 0:
        return 0.0
    return index.tombstones.count() / n_docs


def compact(index: BuiltIndex, force: bool = False, cache: bool = True) -> BuiltIndex:
    """Fold tombstones: rewrite without dead docs, preserving surviving
    docids; stats recomputed from survivors (keeper.rs:4219-4253).

    No-op below the 20% density threshold unless ``force``."""
    if index.tombstones is None:
        return index
    if not force and tombstone_density(index) <= TOMBSTONE_COMPACT_THRESHOLD:
        return index
    ts = index.tombstones
    postings = index.postings.join(ts, "docid", "left_anti")
    docmeta = index.docmeta.join(ts, "docid", "left_anti")
    positions = (
        index.positions.join(ts, "docid", "left_anti")
        if index.positions is not None
        else None
    )
    if cache:
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
