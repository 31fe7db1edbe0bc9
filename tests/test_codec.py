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


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=2**31))
def test_vectorized_bucket_encode_matches_per_term(seed):
    """The one-pass vectorized bucket encoder must be byte-identical,
    column for column, to the per-term encode_posting reference path
    (same property the salting-equivalence test checks end-to-end)."""
    import pandas as pd

    from information_retrieval_images_ray.functions.bm25 import BM25Params
    from information_retrieval_images_ray.stages.postings import (
        make_encode_bucket,
        make_encode_final,
    )

    rng = np.random.default_rng(seed)
    nterms = int(rng.integers(1, 12))
    rows = []
    for t in range(nterms):
        df = int(rng.integers(1, 400))
        ids = np.unique(rng.integers(0, 5000, size=df).astype(np.uint64))
        for d in ids:
            rows.append(
                {
                    "term": f"t{t:03d}",
                    "doc_id": int(d),
                    "tf": int(rng.integers(1, 50)),
                    "dl": int(rng.integers(1, 500)),
                    "shard": 0,
                }
            )
    g = pd.DataFrame(rows).sample(frac=1.0, random_state=1).reset_index(drop=True)
    params = BM25Params()
    avgdl = 120.0
    bucket = make_encode_bucket(avgdl, params, 16)(g).to_pandas()
    ref_rows = []
    for _, sub in g.groupby("term", sort=True):
        ref_rows.append(make_encode_final(avgdl, params, 16)(sub).to_pandas())
    ref = pd.concat(ref_rows).reset_index(drop=True)
    bucket = bucket.sort_values("term").reset_index(drop=True)
    assert list(bucket["term"]) == list(ref["term"])
    for col in ("df_local", "docs", "tfs", "max_partial"):
        assert list(bucket[col]) == list(ref[col]), col
    for col in ("block_last_doc", "block_doc_off", "block_tf_off", "block_max_partial"):
        for x, y in zip(bucket[col], ref[col]):
            assert np.array_equal(np.asarray(x), np.asarray(y)), col
