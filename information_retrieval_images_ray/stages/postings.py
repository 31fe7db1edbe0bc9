"""Posting-list encoding stages (used inside groupby().map_groups).

Final segment row layout per (shard, term):

- ``df_local``        postings count within the doc-shard
- ``docs``            binary — per-block varbyte streams; each block's
                      first value is the ABSOLUTE doc_id, the rest are
                      gaps (delta restarts per block so WAND can decode
                      a block without touching its predecessors)
- ``tfs``             binary — per-block varbyte streams of tf
- ``block_last_doc``  list<uint64> — last doc_id of each block (the skip
                      pointer table)
- ``block_doc_off`` / ``block_tf_off``  list<uint32> byte offsets of
                      each block within the blobs (one extra trailing
                      entry = total length)
- ``block_max_partial`` list<float32> — max over the block of
                      tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl)), rounded UP to
                      float32 so it is always an upper bound (block-max
                      WAND safety); multiplied by idf at query time
- ``max_partial``     float32 term-level upper bound

Salted sub-postings (hot terms) are an intermediate form: plain
delta+varbyte blobs of (docs, tfs, dls) with no block structure; the
merge stage decodes, concatenates (salt groups hold disjoint doc sets),
re-sorts and produces the final blocked form — byte-identical to an
unsalted encode (tests/test_build_query.py::test_salting_equivalence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.bm25 import BM25Params
from ..functions.codec import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_varbyte,
)

BLOCK_SIZE = 128


def _f32_upper(x: np.ndarray) -> np.ndarray:
    """float64 -> float32 rounded toward +inf (safe upper bounds)."""
    f = x.astype(np.float32)
    low = f.astype(np.float64) < x
    f[low] = np.nextafter(f[low], np.float32(np.inf))
    return f


def encode_posting(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    params: BM25Params = BM25Params(),
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one term's postings (ascending doc_ids) into a segment row."""
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order].astype(np.uint64)
    tfs = tfs[order].astype(np.uint64)
    dls = dls[order].astype(np.float64)
    n = len(doc_ids)
    k1, b = params.k1, params.b
    partial = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))

    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    block_last: list[int] = []
    block_max: list[np.float64] = []
    doc_off = [0]
    tf_off = [0]
    for s in range(0, n, block_size):
        e = min(n, s + block_size)
        ids = doc_ids[s:e]
        doc_chunks.append(encode_varbyte(delta_encode(ids)))
        tf_chunks.append(encode_varbyte(tfs[s:e]))
        block_last.append(int(ids[-1]))
        block_max.append(partial[s:e].max())
        doc_off.append(doc_off[-1] + len(doc_chunks[-1]))
        tf_off.append(tf_off[-1] + len(tf_chunks[-1]))
    bmax = _f32_upper(np.array(block_max, dtype=np.float64))
    return {
        "df_local": np.uint32(n),
        "docs": b"".join(doc_chunks),
        "tfs": b"".join(tf_chunks),
        "block_last_doc": np.array(block_last, dtype=np.uint64),
        "block_doc_off": np.array(doc_off, dtype=np.uint32),
        "block_tf_off": np.array(tf_off, dtype=np.uint32),
        "block_max_partial": bmax,
        "max_partial": np.float32(bmax.max() if len(bmax) else 0.0),
    }


def decode_posting_blocks(docs: bytes, df: int, block_doc_off: np.ndarray,
                          block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Decode the full doc_id list from per-block delta streams."""
    vals = decode_varbyte(docs, df)
    out = np.empty(df, dtype=np.uint64)
    for i in range(len(block_doc_off) - 1):
        s = i * block_size
        e = min(df, s + block_size)
        out[s:e] = np.cumsum(vals[s:e], dtype=np.uint64)
    return out


# ---- groupby callables ------------------------------------------------------

def make_encode_final(avgdl: float, params: BM25Params, block_size: int = BLOCK_SIZE):
    """map_groups fn for UNSALTED (term) groups -> final segment row."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        row = encode_posting(
            g["doc_id"].to_numpy(np.uint64),
            g["tf"].to_numpy(np.uint64),
            g["dl"].to_numpy(np.uint64),
            avgdl, params, block_size,
        )
        return pd.DataFrame([{"term": g["term"].iloc[0], "shard": np.int32(g["shard"].iloc[0]), **row}])

    return fn


def encode_sub(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn for SALTED (term, salt) groups -> sub-posting row."""
    order = np.argsort(g["doc_id"].to_numpy(np.uint64), kind="stable")
    ids = g["doc_id"].to_numpy(np.uint64)[order]
    tfs = g["tf"].to_numpy(np.uint64)[order]
    dls = g["dl"].to_numpy(np.uint64)[order]
    return pd.DataFrame(
        [
            {
                "term": g["term"].iloc[0],
                "shard": np.int32(g["shard"].iloc[0]),
                "n": np.uint32(len(ids)),
                "docs_sub": encode_varbyte(delta_encode(ids)),
                "tfs_sub": encode_varbyte(tfs),
                "dls_sub": encode_varbyte(dls),
            }
        ]
    )


def make_merge_salted(avgdl: float, params: BM25Params, block_size: int = BLOCK_SIZE):
    """map_groups fn merging a term's salted sub-postings -> final row."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate(
            [delta_decode(decode_varbyte(buf, int(n)))
             for buf, n in zip(g["docs_sub"], g["n"])]
        )
        tfs = np.concatenate(
            [decode_varbyte(buf, int(n)) for buf, n in zip(g["tfs_sub"], g["n"])]
        )
        dls = np.concatenate(
            [decode_varbyte(buf, int(n)) for buf, n in zip(g["dls_sub"], g["n"])]
        )
        row = encode_posting(ids, tfs, dls, avgdl, params, block_size)
        return pd.DataFrame([{"term": g["term"].iloc[0], "shard": np.int32(g["shard"].iloc[0]), **row}])

    return fn
