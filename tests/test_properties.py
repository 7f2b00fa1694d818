"""Property-based robustness (hypothesis): codec roundtrips, the lenient
parser's never-error guarantee, chunker coverage invariants, and
analyzer/oracle consistency on arbitrary input."""

from __future__ import annotations

import numpy as np
import pandas as pd

from frankensearch_spark.contract import POSTINGS_PER_BLOCK, fieldnorm_to_id
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_spark.analyze import analyze_default, tokenize_fast
from frankensearch_spark.functions.vbyte import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
    vbyte_encode_segmented,
)
from frankensearch_spark.query_ast import ENGINE_SCHEMA, parse_lenient
from frankensearch_spark.sources.chunking import chunk_text


@given(st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint32)
    assert np.array_equal(vbyte_decode(vbyte_encode(arr), len(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF), min_size=1, max_size=300),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_vbyte_segmented_matches_per_segment(values, data):
    arr = np.asarray(values, dtype=np.uint32)
    n_segs = data.draw(st.integers(min_value=1, max_value=min(8, len(arr))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(arr) - 1),
                max_size=n_segs - 1,
                unique=True,
            )
        )
    ) if len(arr) > 1 else []
    starts = np.asarray([0] + cuts, dtype=np.int64)
    segs = vbyte_encode_segmented(arr, starts)
    bounds = list(starts) + [len(arr)]
    for i, seg in enumerate(segs):
        assert seg == vbyte_encode(arr[bounds[i] : bounds[i + 1]])


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_on_sorted(values):
    arr = np.unique(np.asarray(values, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_lenient_parser_never_raises(text):
    p = parse_lenient(text, ENGINE_SCHEMA)
    assert p.query is not None


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_cass_parser_never_raises(text):
    from frankensearch_spark.cass import parse_cass

    p = parse_cass(text)
    assert p.query is not None


@given(st.text(max_size=2000), st.integers(min_value=1, max_value=200),
       st.integers(min_value=0, max_value=250))
@settings(max_examples=150, deadline=None)
def test_chunker_invariants(text, max_chars, overlap):
    chunks = chunk_text(text, max_chars, overlap)
    raw = text.encode("utf-8")
    if not text:
        assert chunks == []
        return
    assert chunks
    assert chunks[0].byte_start == 0
    assert chunks[-1].byte_end == len(raw)
    for c in chunks:
        # byte ranges decode cleanly and reproduce the chunk text
        assert raw[c.byte_start : c.byte_end].decode("utf-8") == c.text
    for a, b in zip(chunks, chunks[1:]):
        assert b.byte_start > a.byte_start  # forward progress
        assert b.byte_start <= a.byte_end  # no gaps


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_fast_tokenizer_matches_reference_terms(text):
    fast = tokenize_fast(text)
    ref = [(t.text, t.position) for t in analyze_default(text)]
    # daylight only permitted for exotic Other_Alphabetic scalars; on the
    # hypothesis default alphabet mismatches would surface immediately
    if all(ch.isascii() for ch in text):
        assert fast == ref


def _blockify_partition(pdfs, bucket_shift: int):
    """Differential ORACLE for the production mapInArrow blockify kernel
    (operators/merge.py:_blockify_arrow) — an independently written
    pandas implementation of the same block contract.  Lives in the test
    module: its only job is pinning byte-identity.

    Fully vectorized: group/block boundaries via run-length detection,
    delta + LEB128 encoding in ONE numpy pass for the whole partition
    (``vbyte_encode_segmented``), block aggregates via ``np.*.reduceat``.
    Per-block Python cost is a bytes slice — nothing else.
    """
    from frankensearch_spark.functions.vbyte import vbyte_encode_segmented

    for pdf in pdfs:
        n_rows = len(pdf)
        if n_rows == 0:
            continue
        has_pos = "positions" in pdf.columns
        terms = pdf["term"].to_numpy(dtype=object)
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        tparts = pdf["tpart"].to_numpy(dtype=np.int64)
        fids = fieldnorm_to_id(pdf["doclen"].to_numpy(dtype=np.int64)).astype(
            np.uint8
        )
        buckets = docids >> bucket_shift

        change = np.empty(n_rows, dtype=bool)
        change[0] = True
        change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
        g_starts = np.nonzero(change)[0]
        g_sizes = np.diff(np.append(g_starts, n_rows))
        # index of each row within its (term, bucket) group
        idx_in_group = np.arange(n_rows, dtype=np.int64) - np.repeat(
            g_starts, g_sizes
        )
        # block boundary: group start or every POSTINGS_PER_BLOCK rows
        b_start_mask = (idx_in_group % POSTINGS_PER_BLOCK) == 0
        b_starts = np.nonzero(b_start_mask)[0]
        b_sizes = np.diff(np.append(b_starts, n_rows))

        # docid offsets within bucket, delta-coded with block-absolute first
        offs = (docids - (buckets << bucket_shift)).astype(np.uint64)
        deltas = np.empty(n_rows, dtype=np.uint64)
        deltas[0] = offs[0]
        deltas[1:] = offs[1:] - offs[:-1]
        deltas[b_starts] = offs[b_starts]

        doc_bytes = vbyte_encode_segmented(deltas, b_starts)
        tf_bytes = vbyte_encode_segmented(tfs.astype(np.uint64), b_starts)
        norm_raw = fids.tobytes()
        norm_bounds = np.append(b_starts, n_rows)
        norm_bytes = [
            norm_raw[norm_bounds[i] : norm_bounds[i + 1]]
            for i in range(b_starts.size)
        ]
        max_tf = np.minimum(np.maximum.reduceat(tfs, b_starts), 255)
        min_fn = np.minimum.reduceat(fids, b_starts)

        pos_cells = (
            pdf["positions"].to_numpy(dtype=object) if has_pos else None
        )
        if has_pos and all(c is None for c in pos_cells):
            has_pos = False  # positions column present but never filled
        if has_pos:
            # POSITIONS section analogue (quiver.rs:3456-3530, section
            # kind 3 of segment.rs:44-66): flat absolute u32 positions
            # aligned by posting freq, vbyte-packed per block.  Decode
            # splits by the block's tf stream, so no extra offsets ride
            # along.  One vectorized encode for the whole partition.
            flat = np.concatenate(
                [
                    np.asarray(c, dtype=np.int64)
                    if c is not None
                    else np.empty(0, dtype=np.int64)
                    for c in pos_cells
                ]
            )
            per_row = np.fromiter(
                (0 if c is None else len(c) for c in pos_cells),
                dtype=np.int64,
                count=n_rows,
            )
            if not np.array_equal(per_row, tfs):
                raise ValueError("positions misaligned with tf")
            pos_offsets = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(per_row[:-1], out=pos_offsets[1:])
            pos_bytes = vbyte_encode_segmented(
                flat.astype(np.uint64), pos_offsets[b_starts]
            )
        else:
            pos_bytes = [None] * b_starts.size

        yield pd.DataFrame(
            {
                "term": terms[b_starts],
                "bucket": buckets[b_starts],
                "first_doc": docids[b_starts],
                "n": b_sizes.astype(np.int32),
                "doc_bytes": doc_bytes,
                "tf_bytes": tf_bytes,
                "norm_bytes": norm_bytes,
                "max_tf_code": max_tf.astype(np.int32),
                "min_fieldnorm_id": min_fn.astype(np.int32),
                "tpart": tparts[b_starts].astype(np.int32),
                "pos_bytes": pos_bytes,
                "codec": np.zeros(b_starts.size, dtype=np.int32),
            }
        )


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_blockify_positions_roundtrip(data):
    """POSITIONS sidecar round-trip: blockify -> decode reproduces every
    posting's position array (tf-stream alignment, quiver.rs:3456)."""
    import pandas as pd

    from frankensearch_spark.operators.merge import decode_blocks_pdf

    shift = 5  # tiny buckets so multi-bucket terms happen
    terms = data.draw(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma"]),
            min_size=1, max_size=3, unique=True,
        )
    )
    rows = []
    for t in sorted(terms):
        docids = sorted(
            data.draw(
                st.sets(st.integers(min_value=0, max_value=400),
                        min_size=1, max_size=150)
            )
        )
        for d in docids:
            tf = data.draw(st.integers(min_value=1, max_value=4))
            pos = sorted(
                data.draw(
                    st.sets(st.integers(min_value=0, max_value=2000),
                            min_size=tf, max_size=tf)
                )
            )
            rows.append((t, d, tf, 40, 0, np.asarray(pos, dtype=np.int32)))
    rows.sort(key=lambda r: (r[0], r[1] >> shift, r[1]))
    pdf = pd.DataFrame(
        rows, columns=["term", "docid", "tf", "doclen", "tpart", "positions"]
    )
    blocks = pd.concat(list(_blockify_partition([pdf], shift)))
    # the production mapInArrow kernel must emit byte-identical blocks
    import pyarrow as pa

    from frankensearch_spark.operators.merge import _blockify_arrow

    rb = pa.RecordBatch.from_pandas(pdf, preserve_index=False)
    arrow_blocks = pa.Table.from_batches(
        list(_blockify_arrow([rb], shift))
    ).to_pandas()
    assert list(arrow_blocks.columns) == list(blocks.columns)
    a = arrow_blocks.reset_index(drop=True)
    b = blocks.reset_index(drop=True)
    assert len(a) == len(b)
    for c in blocks.columns:
        assert a[c].tolist() == b[c].tolist(), c
    # pre-encoded vbyte positions input (the fused build's default
    # pos_format) must emit byte-identical blocks: concatenation of
    # per-posting LEB128 buffers == one segmented encode of the flat
    # stream (per-value codec law)
    from frankensearch_spark.functions.vbyte import vbyte_encode

    pdf_vb = pdf.copy()
    pdf_vb["positions"] = [
        vbyte_encode(np.asarray(p, dtype=np.uint64))
        for p in pdf["positions"]
    ]
    rb_vb = pa.RecordBatch.from_pandas(pdf_vb, preserve_index=False)
    vb = pa.Table.from_batches(
        list(_blockify_arrow([rb_vb], shift))
    ).to_pandas().reset_index(drop=True)
    for c in blocks.columns:
        assert vb[c].tolist() == b[c].tolist(), c
    docids, tfs, fids, ridx, posarr = decode_blocks_pdf(
        blocks, shift, with_positions=True
    )
    got = sorted(
        (blocks["term"].to_numpy()[ridx[i]], int(docids[i]),
         tuple(int(x) for x in posarr[i]))
        for i in range(len(docids))
    )
    exp = sorted((r[0], r[1], tuple(int(x) for x in r[5])) for r in rows)
    assert got == exp
    # FrameOfReference codec arm: full blocks bitpack, tails stay vint;
    # decode must reproduce the identical posting stream (docid, tf,
    # fieldnorm, positions) — the codec changes bytes, never semantics
    for_blocks = pa.Table.from_batches(
        list(_blockify_arrow([rb], shift, "for"))
    ).to_pandas().reset_index(drop=True)
    from frankensearch_spark.functions.bitpack import CODEC_FOR, CODEC_VINT

    is_full = for_blocks["n"].to_numpy() == 128
    assert (
        for_blocks["codec"].to_numpy()
        == np.where(is_full, CODEC_FOR, CODEC_VINT)
    ).all()
    d2, t2, f2, r2, p2 = decode_blocks_pdf(
        for_blocks, shift, with_positions=True
    )
    d1, t1, f1, r1 = decode_blocks_pdf(blocks, shift)
    key1 = sorted(zip(blocks["term"].to_numpy()[r1], d1, t1, f1))
    key2 = sorted(zip(for_blocks["term"].to_numpy()[r2], d2, t2, f2))
    assert key1 == key2
    got_for = sorted(
        (for_blocks["term"].to_numpy()[r2[i]], int(d2[i]),
         tuple(int(x) for x in p2[i]))
        for i in range(len(d2))
    )
    assert got_for == exp
