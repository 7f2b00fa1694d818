"""FrameOfReference bitpacked block codec (reference's primary posting
codec, quiver.rs:395-430 kind FrameOfReference; freq sub-encodings
FREQ_ALL_ONE / FREQ_BITPACKED at quiver.rs:892-920).

A FULL block (exactly POSTINGS_PER_BLOCK postings) stores its docid
stream as ``[width:u8][n-1 GAPS bitpacked LSB-first at width bits]`` —
true frame-of-reference: the absolute first in-bucket offset is NOT in
the packed stream (it is recoverable from the block row's
``(first_doc, bucket)`` columns), so ``width`` is the minimal bit width
of the largest GAP, never of the ~13-bit absolute offset.  The tf
stream is ``b"\\x00"`` when every tf == 1
(FREQ_ALL_ONE — by far the common case for natural text) else
``[width:u8][bitpacked]``.  Partial tail blocks keep the canonical
LEB128 vint codec, exactly the reference's Vint tail-block rule.

Everything here is pure numpy — encode vectorizes across all blocks
sharing a width (``np.packbits(bitorder="little")``), decode unpacks
one block in one shot.  No Python-per-value loops.
"""

from __future__ import annotations

import numpy as np

CODEC_VINT = 0
CODEC_FOR = 1
CODEC_BITMAP = 2  # quiver.rs:395-430 kind Bitmap: dense 512-bit window

FREQ_ALL_ONE = 0  # leading tf_bytes flag byte

BITMAP_SPAN = 512  # docid window a bitmap block covers (64 bytes)


def _bitlen_vec(vals: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (uint64), floor 1 — six
    vectorized halving passes, no float log2 edge cases."""
    a = np.ascontiguousarray(vals, dtype=np.uint64).copy()
    r = np.zeros(a.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = a >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        a[m] >>= np.uint64(s)
    r += (a > 0).astype(np.int64)
    return np.maximum(r, 1)


def bitunpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Unpack ``n`` LSB-first ``width``-bit values -> uint64[n]."""
    need = n * width
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=need, bitorder="little"
    )
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) << shifts).sum(
        axis=1, dtype=np.uint64
    )


def for_encode_rows(mat: np.ndarray) -> list[bytes]:
    """Encode a (k, block_len) uint64 matrix of value streams, one FOR
    buffer per row: ``[width:u8][bitpacked row]``.

    Rows are grouped by their minimal width so each distinct width packs
    in ONE vectorized call — at most 64 groups regardless of k."""
    k, n = mat.shape
    out: list[bytes | None] = [None] * k
    if k == 0:
        return []
    widths = _bitlen_vec(mat.max(axis=1))
    for w in np.unique(widths):
        rows = np.nonzero(widths == w)[0]
        sub = mat[rows]  # (r, n)
        shifts = np.arange(w, dtype=np.uint64)
        bits = ((sub[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(
            bits.reshape(rows.size, n * int(w)), axis=1, bitorder="little"
        )
        wb = bytes([int(w)])
        for i, r in enumerate(rows):
            out[r] = wb + packed[i].tobytes()
    return out  # type: ignore[return-value]


def for_decode_doc(buf: bytes, n: int) -> np.ndarray:
    """Decode a FOR-packed stream of ``n`` values -> uint64[n].  For the
    doc stream the caller passes n-1 (gaps only) and prepends the
    absolute first offset from the block row's columns."""
    width = buf[0]
    if width == 0 or width > 64:
        raise ValueError(f"invalid FOR width {width}")
    return bitunpack(buf[1:], n, width)


def bitmap_encode_rows(offs: np.ndarray) -> list[bytes]:
    """Encode a (k, block_len) uint64 matrix of ABSOLUTE in-bucket
    offsets as fixed 64-byte dense bitmaps (the reference's third block
    kind, quiver.rs:395-430 Bitmap): bit i set <=> offset
    ``first + i`` present.  The first offset itself is recoverable from
    the block row's (first_doc, bucket) columns — same
    frame-of-reference rule as the FOR codec — so bit 0 is always set.
    Caller guarantees every row's span (off[-1] - off[0]) < BITMAP_SPAN.
    """
    k, n = offs.shape
    if k == 0:
        return []
    rel = (offs - offs[:, :1]).astype(np.int64)
    if rel.max() >= BITMAP_SPAN:
        raise ValueError("bitmap row span exceeds BITMAP_SPAN")
    if rel.min() < 0:
        # an unsorted row would WRAP via numpy negative indexing into
        # the top of the bitmap and round-trip with a matching popcount
        # — wrong docids, no error; fail loudly like the span guard
        raise ValueError("bitmap row offsets must be ascending")
    bits = np.zeros((k, BITMAP_SPAN), dtype=np.uint8)
    bits[np.repeat(np.arange(k), n), rel.ravel()] = 1
    packed = np.packbits(bits, axis=1, bitorder="little")
    return [packed[i].tobytes() for i in range(k)]


def bitmap_decode_doc(buf: bytes, n: int) -> np.ndarray:
    """Decode a 512-bit bitmap -> uint64[n] offsets RELATIVE to the
    block's first offset (caller adds it back, like for_decode_doc)."""
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), bitorder="little"
    )
    idx = np.nonzero(bits)[0]
    if idx.size != n:
        raise ValueError(f"bitmap popcount {idx.size} != block n {n}")
    return idx.astype(np.uint64)


def for_encode_tf_rows(mat: np.ndarray) -> list[bytes]:
    """Encode a (k, block_len) uint64 tf matrix: FREQ_ALL_ONE flag byte
    when a row is all ones, else a FOR buffer."""
    k = mat.shape[0]
    if k == 0:
        return []
    all_one = (mat == 1).all(axis=1)
    out: list[bytes] = [b""] * k
    ones = np.nonzero(all_one)[0]
    for r in ones:
        out[r] = bytes([FREQ_ALL_ONE])
    rest = np.nonzero(~all_one)[0]
    if rest.size:
        enc = for_encode_rows(mat[rest])
        for i, r in enumerate(rest):
            out[r] = enc[i]
    return out


def for_decode_tf(buf: bytes, n: int) -> np.ndarray:
    """Decode a FOR tf stream -> uint32[n]."""
    if buf[0] == FREQ_ALL_ONE:
        return np.ones(n, dtype=np.uint32)
    return for_decode_doc(buf, n).astype(np.uint32)
