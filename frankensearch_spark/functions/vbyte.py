"""Vectorized LEB128 (variable-byte) codec for uint32 arrays.

The reference's Vint posting codec is canonical u32 LEB128
(``crates/frankensearch-quill/src/quiver.rs:395-430`` constants; parse /
canonical-width validation 1040-1380).  This module re-expresses it in
numpy: encode/decode whole arrays with no per-element Python.

Format: little-endian base-128, 7 bits per byte, high bit = continuation
(more bytes follow).  Canonical: no over-long encodings are produced;
decode validates total consumption.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.uint64)


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint32 array to canonical LEB128 bytes (the one-segment
    form of :func:`vbyte_encode_chunks` — ONE encode kernel)."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    data, _bounds = vbyte_encode_chunks(arr, np.array([0], dtype=np.int64))
    return data.tobytes()


def vbyte_encode_chunks(
    values: np.ndarray, seg_starts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized segmented encode in BUFFER form: ``(data uint8[],
    byte_bounds int64[n_seg+1])`` — segment *i*'s bytes are
    ``data[bounds[i]:bounds[i+1]]``.  This is the zero-materialization
    twin of :func:`vbyte_encode_segmented`: feed ``bounds``/``data``
    straight into ``pa.Array.from_buffers(pa.binary(), ...)`` so a
    200M-posting batch never allocates 200M Python bytes objects."""
    arr = np.asarray(values, dtype=np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if arr.size == 0:
        return (
            np.empty(0, dtype=np.uint8),
            np.zeros(seg_starts.size + 1, dtype=np.int64),
        )
    if int(arr.max()) > 0xFFFFFFFF:
        # the canonical codec is u32: a larger value (an upstream
        # docid/position overflow, or a negative wrapped by the uint64
        # cast) would silently TRUNCATE to its low 35 bits and decode
        # as a different number — fail the build loudly instead
        raise ValueError(
            "vbyte encode input exceeds u32 range "
            f"(max value {int(arr.max())})"
        )
    nbytes = np.ones(arr.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += arr >= t
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    byte_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    val_rep = np.repeat(arr, nbytes)
    groups = (val_rep >> (7 * byte_idx.astype(np.uint64))) & np.uint64(0x7F)
    out[:] = groups.astype(np.uint8)
    is_last = byte_idx == np.repeat(nbytes - 1, nbytes)
    out[~is_last] |= 0x80
    # seg_starts may reference one-past-the-end (trailing empty segments)
    starts_ext = np.append(starts, total)
    bounds = np.append(starts_ext[seg_starts], total)
    return out, bounds


def vbyte_encode_segmented(values: np.ndarray, seg_starts: np.ndarray) -> list[bytes]:
    """Encode one big uint32 array, sliced back into per-segment buffers.

    ``seg_starts``: value indices where each segment begins (ascending,
    first element 0).  One vectorized encode for ALL segments — the
    per-segment cost is a bytes slice, not a numpy kernel launch.  Output
    is byte-identical to ``vbyte_encode`` applied per segment.
    """
    out, bounds = vbyte_encode_chunks(values, seg_starts)
    if out.size == 0 and np.asarray(values).size == 0:
        return [b""] * np.asarray(seg_starts).size
    raw = out.tobytes()
    n = len(bounds) - 1
    return [raw[bounds[i] : bounds[i + 1]] for i in range(n)]


def vbyte_decode(buf: bytes, expected_count: int | None = None) -> np.ndarray:
    """Decode canonical LEB128 bytes to a uint32 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.array([], dtype=np.uint32)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        raise ValueError("truncated vbyte stream")
    last_idx = np.nonzero(is_last)[0]
    starts = np.empty(last_idx.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = last_idx[:-1] + 1
    lengths = last_idx - starts + 1
    if np.any(lengths > 5):
        raise ValueError("over-long vbyte value (non-canonical)")
    # canonical minimal width (quiver.rs:1040-1380): a multi-byte value
    # whose final (most-significant) byte is 0 is an over-long encoding
    # of a smaller value, e.g. b"\x80\x00" for 0
    if np.any((lengths > 1) & (b[last_idx] == 0)):
        raise ValueError("non-minimal vbyte encoding (trailing zero byte)")
    offs = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    groups = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * offs.astype(np.uint64))
    values = np.add.reduceat(groups, starts)
    if np.any(values > 0xFFFFFFFF):
        raise ValueError("vbyte value exceeds u32")
    out = values.astype(np.uint32)
    if expected_count is not None and out.size != expected_count:
        raise ValueError(f"expected {expected_count} values, got {out.size}")
    return out


def vbyte_decode_concat(
    cells: list[bytes],
) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY per-cell LEB128 buffers in ONE vectorized pass.

    Returns ``(flat_values uint32, per_cell_counts int64)`` —
    equivalent to ``vbyte_decode`` applied cell-by-cell and
    concatenated, but with a single numpy kernel launch for the whole
    batch (the phrase kernel's per-candidate position cells).  Empty
    cells contribute zero values."""
    n = len(cells)
    counts = np.zeros(n, dtype=np.int64)
    if n == 0:
        return np.array([], dtype=np.uint32), counts
    lens = np.fromiter((len(c) for c in cells), dtype=np.int64, count=n)
    nonempty = np.nonzero(lens)[0]
    if nonempty.size == 0:
        return np.array([], dtype=np.uint32), counts
    buf = b"".join(cells)
    values = vbyte_decode(buf)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # per-cell value count = terminator bytes within the cell's range
    counts[nonempty] = np.add.reduceat(is_last, starts[nonempty])
    # a cell boundary inside a multi-byte value would decode plausibly
    # but corrupt neighbours: every cell must END on a terminator
    cell_ends = starts[nonempty] + lens[nonempty] - 1
    if not np.all(is_last[cell_ends]):
        raise ValueError("vbyte cell boundary splits a value")
    return values, counts


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing u32/u64 array -> [first, gaps...] (gap >= 1)."""
    arr = np.asarray(sorted_vals, dtype=np.uint64)
    if arr.size == 0:
        return arr.astype(np.uint32)
    out = np.empty(arr.size, dtype=np.uint64)
    out[0] = arr[0]
    out[1:] = arr[1:] - arr[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    arr = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(arr, dtype=np.uint64)
