"""Pinned BM25 scoring contract (Tantivy 0.26.1 semantics).

This module is the numerical heart of the engine: every score-bearing
operation is float32 in the exact operation order of the pinned oracle.
Re-expressed from public Tantivy 0.26.1 semantics; parity targets in the
reference are ``crates/frankensearch-quill/src/contract.rs`` (fieldnorm
table :19-276, idf :376-380, tf cache :388-402, block-max codes :306-326)
and the scoring cases of ``tests/fixtures/quill_language_contract.json``.

Rules (contract.rs:1-12 and scoring case ``score-bm25-constants-operation-order``):

    k1 = 1.2, b = 0.75
    idf(n, N)       = ln(1 + (N - n + 0.5) / (n + 0.5))        # f32 ops
    norm(|d|, avgdl)= k1 * (1 - b + b * |d| / avgdl)           # |d| decoded from fieldnorm id
    weight          = idf * (1 + k1) * boost
    score           = weight * f / (f + norm)
    avgdl           = total_tokens / doc_count                 # raw f32 division

No reassociation, no ``log1p``, no FMA.  All helpers below use numpy
float32 so the emitted bit patterns match a strict f32 evaluation.
"""

from __future__ import annotations

import numpy as np

BM25_K1 = np.float32(1.2)
BM25_B = np.float32(0.75)

MAX_TERM_BYTES = 65_530  # grimoire.rs:22 — global token admission ceiling

POSTINGS_PER_BLOCK = 128  # quiver.rs:395-430 — block granularity for block-max


def _build_field_norms_table() -> np.ndarray:
    """The 256-entry Tantivy fieldnorm quantization table.

    Exact lengths 0..=40, then octaves of 8 buckets with doubling step
    (public Tantivy 0.26.1 ``src/fieldnorm/code.rs``).  Landmarks pinned by
    tests: [41]=42, [64]=152, [128]=32792, [255]=2_013_265_944,
    sum=24_696_067_732 (contract.rs:407-431).
    """
    table = list(range(41))
    step = 2
    val = 40
    while len(table) < 256:
        for _ in range(8):
            val += step
            table.append(val)
            if len(table) == 256:
                break
        step *= 2
    return np.asarray(table, dtype=np.uint32)


FIELD_NORMS_TABLE = _build_field_norms_table()


def id_to_fieldnorm(fieldnorm_id):
    """Decode fieldnorm id (0..255) to quantized document length."""
    return FIELD_NORMS_TABLE[np.asarray(fieldnorm_id, dtype=np.int64)]


def fieldnorm_to_id(doclen) -> np.ndarray:
    """Encode document length(s), rounding down to the bucket (contract.rs:291-295).

    Vectorized: ``searchsorted(side='right') - 1`` floors exactly like the
    reference's ``binary_search().unwrap_or_else(|i| i - 1)``.
    """
    arr = np.asarray(doclen, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE.astype(np.uint64), arr, side="right") - 1
    return ids.astype(np.uint8)


def idf(doc_freq, doc_count) -> np.ndarray:
    """Tantivy-compatible BM25 idf, strict f32 op order (contract.rs:376-380).

    ``ratio = ((N - n) as f32 + 0.5) / (n as f32 + 0.5); ln(1 + ratio)``.
    """
    n = np.asarray(doc_freq, dtype=np.uint64)
    big_n = np.uint64(doc_count)
    if np.any(n > big_n):
        raise ValueError(f"doc_freq > doc_count: {n} > {big_n}")
    half = np.float32(0.5)
    one = np.float32(1.0)
    ratio = ((big_n - n).astype(np.float32) + half) / (n.astype(np.float32) + half)
    return np.log(one + ratio, dtype=np.float32)


def cached_tf_component(fieldnorm, average_fieldnorm) -> np.ndarray:
    """One tf-cache entry: ``k1 * (1 - b + b * |d| / avgdl)`` (contract.rs:388-390)."""
    fn = np.asarray(fieldnorm).astype(np.float32)
    avg = np.float32(average_fieldnorm)
    one = np.float32(1.0)
    return BM25_K1 * (one - BM25_B + BM25_B * fn / avg)


def compute_tf_cache(average_fieldnorm) -> np.ndarray:
    """256 tf-cache entries for one field+snapshot (contract.rs:394-402)."""
    return cached_tf_component(FIELD_NORMS_TABLE, average_fieldnorm)


def compute_avgdl(total_tokens: int, doc_count: int) -> np.float32:
    """Raw f32 division — never an average of decoded buckets (contract.rs:1-8)."""
    if doc_count == 0:
        return np.float32(0.0)
    return np.float32(np.float32(total_tokens) / np.float32(doc_count))


def term_weight(doc_freq, doc_count, boost=1.0) -> np.ndarray:
    """``idf * (1 + k1) * boost`` (argus.rs:1521-1523)."""
    one_plus_k1 = np.float32(1.0) + BM25_K1
    return (idf(doc_freq, doc_count) * one_plus_k1 * np.float32(boost)).astype(
        np.float32
    )


def term_score(weight, term_freq, fieldnorm_id, tf_cache) -> np.ndarray:
    """``weight * f / (f + tf_cache[fieldnorm_id])`` (argus.rs:1602-1626).

    All arguments may be arrays; returns float32 scores.
    """
    f = np.asarray(term_freq).astype(np.float32)
    norm = np.asarray(tf_cache, dtype=np.float32)[
        np.asarray(fieldnorm_id, dtype=np.int64)
    ]
    return (np.asarray(weight, dtype=np.float32) * f / (f + norm)).astype(np.float32)


# --- Block-max metadata codes (contract.rs:306-326) -------------------------


def block_max_frequency_to_code(max_frequency) -> np.ndarray:
    """Saturating one-byte code: 0..=254 exact, >=255 -> 255 (sentinel)."""
    arr = np.asarray(max_frequency, dtype=np.uint32)
    return np.minimum(arr, 255).astype(np.uint8)


def block_max_frequency_from_code(code) -> np.ndarray:
    """Decode; code 255 is the unbounded sentinel u32::MAX."""
    arr = np.asarray(code, dtype=np.uint32)
    return np.where(arr == 255, np.uint32(0xFFFFFFFF), arr).astype(np.uint32)


def block_max_score(max_frequency_code, min_fieldnorm_id, avgdl, weight) -> np.ndarray:
    """Conservative block score upper bound (contract.rs:335-367).

    ``weight * f_max / (f_max + norm(min_fieldnorm, avgdl))`` — decoding can
    never under-estimate, so pruning with this bound is rank-safe.
    Codes of 0 (impossible for a real block) yield bound 0.
    """
    f = block_max_frequency_from_code(max_frequency_code).astype(np.float32)
    norm = cached_tf_component(id_to_fieldnorm(min_fieldnorm_id), avgdl)
    with np.errstate(invalid="ignore"):
        factor = f / (f + norm)
    factor = np.where(np.asarray(max_frequency_code) == 0, np.float32(0.0), factor)
    return (np.float32(weight) * factor).astype(np.float32)


def conservative_bound_sum(bounds: np.ndarray) -> np.float32:
    """FP-envelope sum covering any f32 addition order (argus.rs:3918-3973).

    Sum in f64, inflate by ``n * eps`` of the magnitude, round outward to f32
    with nextafter so the result upper-bounds every possible f32 summation
    order of the inputs.
    """
    b = np.asarray(bounds, dtype=np.float64)
    if b.size == 0:
        return np.float32(0.0)
    total = float(b.sum())
    eps = float(np.finfo(np.float32).eps)
    inflated = total + abs(total) * eps * b.size
    out = np.float32(inflated)
    if float(out) < inflated:
        out = np.nextafter(out, np.float32(np.inf), dtype=np.float32)
    return np.float32(out)


def score_total_order_key(scores: np.ndarray, docids: np.ndarray):
    """Sort permutation for the pinned result total order.

    Score f32 ``total_cmp`` descending, then global docid ascending
    (index.rs:8022-8040).  For non-negative finite scores the IEEE bit
    pattern as unsigned int orders identically to total_cmp.
    """
    s = np.asarray(scores, dtype=np.float32)
    bits = s.view(np.uint32).astype(np.int64)
    # total_cmp: flip sign-magnitude to two's complement ordering
    neg = (bits >> 31) == 1
    key = np.where(neg, ~bits & 0xFFFFFFFF, bits | 0x80000000)
    return np.lexsort((np.asarray(docids), -key))
