"""Sort-merge reduce into compressed global term partitions (SURVEY.md M1-M2,
B4-B7) — the north-rule's "per-partition sorted posting lists with delta +
variable-byte compression, sort-merge reduced into global term partitions
with explicit salting for skewed terms".

Layout: one row per posting **block** of up to 128 postings
(POSTINGS_PER_BLOCK, quiver.rs:395-430):

    term        string   — the indexed term
    bucket      long     — docid >> bucket_shift (deterministic salt: the
                           'fn'/'import' mega-terms split across buckets,
                           so no task ever sees a whole skewed posting list)
    first_doc   long     — absolute docid of the block's first posting
    n           int      — postings in the block (<= 128)
    doc_bytes   binary   — LEB128(delta(docid offsets within bucket))
    tf_bytes    binary   — LEB128(term frequencies)
    norm_bytes  binary   — one fieldnorm id byte per posting (DOCLEN is
                           denormalized into the block: queries never join
                           a docid-side table — the reference reads DOCLEN
                           via segment-local mmap for free; a distributed
                           join is NOT free, this is the Spark-native move)
    max_tf_code tinyint-ish int — saturating block-max code (contract)
    min_fieldnorm_id int — block min fieldnorm id
    tpart       int      — stable hash(term) % n_term_partitions: the disk
                           partition column, enabling partition pruning at
                           query time (grimoire block-first-key analogue)

Because ``bucket`` is a prefix of docid order, concatenating a term's
blocks in (bucket, first_doc) order reproduces the docid-sorted global
posting list — the reference's concat-merge theorem Q1
(keeper.rs:4166-4206) carried over: merge is concatenation, never decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frankensearch_spark.contract import POSTINGS_PER_BLOCK
from frankensearch_spark.functions.vbyte import delta_encode, vbyte_encode

DEFAULT_BUCKET_SHIFT = 13  # 8,192 docids per bucket
DEFAULT_TERM_PARTITIONS = 64

BLOCKS_SCHEMA = (
    "term string, bucket long, first_doc long, n int, "
    "doc_bytes binary, tf_bytes binary, norm_bytes binary, "
    "max_tf_code int, min_fieldnorm_id int"
)


def term_partition(term: str, n_parts: int = DEFAULT_TERM_PARTITIONS) -> int:
    """Stable engine-independent term partition (md5-based)."""
    return int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:4], "big") % n_parts


def _blockify_partition(pdfs, bucket_shift: int):
    """mapInPandas kernel over partitions pre-sorted by (term, bucket, docid).

    Group boundaries are run-length detected; each (term, bucket) run is
    chunked into 128-posting blocks and encoded with numpy — one Python
    call per *partition*, not per group.
    """
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        terms = pdf["term"].to_numpy(dtype=object)
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        fids = pdf["fieldnorm_id"].to_numpy(dtype=np.int64)
        buckets = docids >> bucket_shift

        change = np.empty(len(pdf), dtype=bool)
        change[0] = True
        change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
        g_starts = np.nonzero(change)[0]
        g_ends = np.append(g_starts[1:], len(pdf))

        out: dict[str, list] = {k: [] for k in (
            "term", "bucket", "first_doc", "n", "doc_bytes", "tf_bytes",
            "norm_bytes", "max_tf_code", "min_fieldnorm_id",
        )}
        for gs, ge in zip(g_starts, g_ends):
            term = terms[gs]
            bucket = int(buckets[gs])
            base = bucket << bucket_shift
            for bs in range(gs, ge, POSTINGS_PER_BLOCK):
                be = min(bs + POSTINGS_PER_BLOCK, ge)
                d = docids[bs:be]
                t = tfs[bs:be]
                f = fids[bs:be]
                offs = (d - base).astype(np.uint32)
                out["term"].append(term)
                out["bucket"].append(bucket)
                out["first_doc"].append(int(d[0]))
                out["n"].append(be - bs)
                out["doc_bytes"].append(vbyte_encode(delta_encode(offs)))
                out["tf_bytes"].append(vbyte_encode(t.astype(np.uint32)))
                out["norm_bytes"].append(f.astype(np.uint8).tobytes())
                out["max_tf_code"].append(int(min(t.max(), 255)))
                out["min_fieldnorm_id"].append(int(f.min()))
        yield pd.DataFrame(out)


def build_blocks(
    postings: DataFrame,
    bucket_shift: int = DEFAULT_BUCKET_SHIFT,
    n_term_partitions: int = DEFAULT_TERM_PARTITIONS,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """postings -> compressed block table.

    One wide exchange: repartition by (term, bucket) — the docid-bucket
    component is the explicit skew salt — then a partition-local sort and
    a single vectorized blockify pass.
    """
    n_shuffle = shuffle_partitions or postings.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    src = postings.select("term", "docid", "tf", "fieldnorm_id").withColumn(
        "bucket", F.shiftright(F.col("docid"), bucket_shift)
    )
    arranged = src.repartition(int(n_shuffle), "term", "bucket").sortWithinPartitions(
        "term", "bucket", "docid"
    )
    blocks = arranged.mapInPandas(
        lambda it: _blockify_partition(it, bucket_shift), BLOCKS_SCHEMA
    )

    @F.pandas_udf("int")
    def tpart_udf(terms: pd.Series) -> pd.Series:
        import hashlib as _h

        return terms.map(
            lambda t: int.from_bytes(_h.md5(t.encode("utf-8")).digest()[:4], "big")
            % n_term_partitions
        ).astype("int32")

    return blocks.withColumn("tpart", tpart_udf(F.col("term")))


def decode_blocks_pdf(pdf: pd.DataFrame, bucket_shift: int = DEFAULT_BUCKET_SHIFT):
    """Decode a pandas frame of block rows back to posting arrays.

    Returns (docids int64, tfs uint32, fieldnorm_ids uint8, row_index int64)
    where row_index maps each posting back to its source block row.
    """
    from frankensearch_spark.functions.vbyte import delta_decode, vbyte_decode

    all_docs, all_tfs, all_fids, all_rows = [], [], [], []
    for i in range(len(pdf)):
        base = int(pdf["bucket"].iat[i]) << bucket_shift
        n = int(pdf["n"].iat[i])
        offs = delta_decode(vbyte_decode(pdf["doc_bytes"].iat[i], n))
        all_docs.append(base + offs.astype(np.int64))
        all_tfs.append(vbyte_decode(pdf["tf_bytes"].iat[i], n))
        all_fids.append(np.frombuffer(pdf["norm_bytes"].iat[i], dtype=np.uint8))
        all_rows.append(np.full(n, i, dtype=np.int64))
    if not all_docs:
        z = np.array([], dtype=np.int64)
        return z, z.astype(np.uint32), z.astype(np.uint8), z
    return (
        np.concatenate(all_docs),
        np.concatenate(all_tfs),
        np.concatenate(all_fids),
        np.concatenate(all_rows),
    )
