"""Kernel-sort write path parity (operators/merge.build_blocks presort modes).

The default durable-write path ("kernel") range-partitions raw postings on
ONE composed 8-byte key and numpy-lexsorts inside the blockify kernel; the
"jvm" path is the original sortWithinPartitions shape.  Block BOUNDARIES may
differ (range splits land elsewhere), but the decoded posting streams per
(term, bucket) — docids, tfs, fieldnorm ids, positions — and the tpart
assignment must be identical.
"""

import numpy as np
import pytest

from frankensearch_spark.operators.build import build_index
from frankensearch_spark.operators.merge import build_blocks, decode_blocks_pdf
from frankensearch_spark.sources.corpus import CORPUS_KEY, synthetic_corpus_df


@pytest.fixture(scope="module")
def built(spark):
    corpus = synthetic_corpus_df(spark, 3000)
    b = build_index(corpus, CORPUS_KEY, docid_mode="lease", tokenizer="arrow")
    b.postings.count()
    return b


def _decoded(b, presort):
    blocks = build_blocks(
        b.postings_full, positions=b.positions, presort=presort
    )
    pdf = blocks.toPandas()
    out = {}
    for (t, bk), grp in pdf.groupby(["term", "bucket"], sort=True):
        grp = grp.sort_values("first_doc")
        docs, tfs, fids, _rows, pos = decode_blocks_pdf(
            grp, with_positions=True
        )
        out[(t, bk)] = (
            docs.tolist(),
            tfs.tolist(),
            fids.tolist(),
            [None if p is None else list(p) for p in pos],
        )
    tparts = dict(zip(pdf.term, pdf.tpart))
    return out, tparts


def test_kernel_presort_matches_jvm_sort(built):
    a, ta = _decoded(built, "kernel")
    b, tb = _decoded(built, "jvm")
    assert set(a) == set(b)
    mismatches = [k for k in a if a[k] != b[k]]
    assert mismatches == []
    assert ta == tb  # crc32 tpart computed in-kernel == JVM F.crc32


def test_kernel_presort_no_positions(built):
    blocks = build_blocks(built.postings, presort="kernel").toPandas()
    assert blocks.pos_bytes.isna().all()
    # decoded tf totals must equal the postings tf sum
    total = 0
    for (_t, _bk), grp in blocks.groupby(["term", "bucket"], sort=True):
        _d, tfs, _f, _r = decode_blocks_pdf(grp.sort_values("first_doc"))
        total += int(np.sum(tfs))
    expected = built.postings.groupBy().sum("tf").collect()[0][0]
    assert total == expected
