"""LEB128 codec property tests (reference Vint codec semantics)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_spark.functions.vbyte import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF), max_size=500))
@settings(max_examples=200, deadline=None)
def test_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint32)
    assert np.array_equal(vbyte_decode(vbyte_encode(arr), len(vals)), arr)


def test_known_encodings():
    # canonical LEB128: 0 -> 00, 127 -> 7f, 128 -> 80 01, 300 -> ac 02
    assert vbyte_encode(np.array([0], np.uint32)) == b"\x00"
    assert vbyte_encode(np.array([127], np.uint32)) == b"\x7f"
    assert vbyte_encode(np.array([128], np.uint32)) == b"\x80\x01"
    assert vbyte_encode(np.array([300], np.uint32)) == b"\xac\x02"
    assert vbyte_encode(np.array([0xFFFFFFFF], np.uint32)) == b"\xff\xff\xff\xff\x0f"


def test_decode_rejects_truncation_and_overlong():
    import pytest

    with pytest.raises(ValueError):
        vbyte_decode(b"\x80")  # dangling continuation
    with pytest.raises(ValueError):
        vbyte_decode(b"\x80\x80\x80\x80\x80\x01")  # 6-byte value
    with pytest.raises(ValueError):
        vbyte_decode(b"\x00\x00", expected_count=1)
    # canonical-width rule (quiver.rs:1040-1380): non-minimal encodings
    # (final byte 0 in a multi-byte value) are corrupt, not value 0
    with pytest.raises(ValueError):
        vbyte_decode(b"\x80\x00")  # over-long encoding of 0
    with pytest.raises(ValueError):
        vbyte_decode(b"\xff\x00")  # over-long encoding of 127
    # a legitimate multi-byte value still decodes
    assert vbyte_decode(b"\x80\x01")[0] == 128


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
    )
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_sorted(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_empty():
    assert vbyte_encode(np.array([], np.uint32)) == b""
    assert vbyte_decode(b"").size == 0


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**32 - 1),
                 min_size=0, max_size=20),
        min_size=0, max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_decode_concat_equals_per_cell(cells_vals):
    """vbyte_decode_concat == per-cell vbyte_decode, incl. empty cells."""
    from frankensearch_spark.functions.vbyte import vbyte_decode_concat

    cells = [vbyte_encode(np.asarray(v, dtype=np.uint64)) for v in cells_vals]
    flat, counts = vbyte_decode_concat(cells)
    assert counts.tolist() == [len(v) for v in cells_vals]
    exp = [x for v in cells_vals for x in v]
    assert flat.tolist() == exp


def test_decode_concat_rejects_split_value():
    from frankensearch_spark.functions.vbyte import vbyte_decode_concat

    import pytest

    buf = vbyte_encode(np.array([300], np.uint64))  # 2-byte value
    with pytest.raises(ValueError):
        vbyte_decode_concat([buf[:1], buf[1:]])


def test_encode_rejects_values_above_u32():
    """The canonical codec is u32: a larger input (upstream overflow, or
    a negative wrapped by the uint64 cast) previously TRUNCATED to its
    low bits and decoded as a different number with no error."""
    import numpy as np
    import pytest

    from frankensearch_spark.functions.vbyte import vbyte_encode

    with pytest.raises(ValueError, match="u32"):
        vbyte_encode(np.array([2**35 + 2**30], dtype=np.uint64))
    with pytest.raises(ValueError, match="u32"):
        vbyte_encode(np.array([-1]))  # wraps to 2**64-1 under the cast
