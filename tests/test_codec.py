import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from information_retrieval_images_ray.functions.codec import (
    decode_doc_gaps,
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_doc_gaps,
    encode_varbyte,
)


def test_varbyte_roundtrip_known():
    for vals in [[], [0], [1], [127], [128], [16383], [16384], [2**63], [2**64 - 1],
                 [0, 0, 0], [5, 128, 300, 2**40, 7]]:
        a = np.array(vals, dtype=np.uint64)
        assert list(decode_varbyte(encode_varbyte(a), len(vals))) == vals


def test_varbyte_sizes():
    assert len(encode_varbyte(np.array([127], dtype=np.uint64))) == 1
    assert len(encode_varbyte(np.array([128], dtype=np.uint64))) == 2
    assert len(encode_varbyte(np.array([2**64 - 1], dtype=np.uint64))) == 10


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varbyte_roundtrip_property(vals):
    a = np.array(vals, dtype=np.uint64)
    out = decode_varbyte(encode_varbyte(a), len(vals))
    assert np.array_equal(out, a)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**48), max_size=200))
def test_doc_gaps_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    out = decode_doc_gaps(encode_doc_gaps(a), len(a))
    assert np.array_equal(out, a)


def test_delta_roundtrip_long():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 2**40, size=100_000).astype(np.uint64))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)
    assert np.array_equal(decode_doc_gaps(encode_doc_gaps(ids)), ids)


def test_count_mismatch_raises():
    buf = encode_varbyte(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        decode_varbyte(buf, 2)
