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
- ``block_doc_off`` / ``block_tf_off``  list<uint64> byte offsets of
                      each block within the blobs (one extra trailing
                      entry = total length; uint64 because a hot term's
                      per-shard blob can exceed 4 GiB at the 10^12-doc
                      design point)
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
import pyarrow as pa

from ..functions.bm25 import BM25Params
from ..functions.codec import (
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_varbyte,
    encode_varbyte_with_lengths,
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
        "block_doc_off": np.array(doc_off, dtype=np.uint64),
        "block_tf_off": np.array(tf_off, dtype=np.uint64),
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

# Explicit Arrow schema for final segment rows: plain list columns, so
# every written Parquet file has an identical, portable schema (letting
# Ray infer from pandas ndarray cells yields per-block tensor extension
# types whose flavor depends on whether the arrays in that block happen
# to share a shape — non-concatenable across files).
SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df_local", pa.uint32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("block_last_doc", pa.list_(pa.uint64())),
        ("block_doc_off", pa.list_(pa.uint64())),
        ("block_tf_off", pa.list_(pa.uint64())),
        ("block_max_partial", pa.list_(pa.float32())),
        ("max_partial", pa.float32()),
    ]
)

SUB_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("n", pa.uint32()),
        ("docs_sub", pa.binary()),
        ("tfs_sub", pa.binary()),
        ("dls_sub", pa.binary()),
    ]
)


def _segment_table(term: str, shard: int, row: dict) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "term": [term],
            "shard": [shard],
            "df_local": [int(row["df_local"])],
            "docs": [row["docs"]],
            "tfs": [row["tfs"]],
            "block_last_doc": [row["block_last_doc"].tolist()],
            "block_doc_off": [row["block_doc_off"].tolist()],
            "block_tf_off": [row["block_tf_off"].tolist()],
            "block_max_partial": [row["block_max_partial"].tolist()],
            "max_partial": [float(row["max_partial"])],
        },
        schema=SEGMENT_SCHEMA,
    )


def make_encode_final(avgdl: float, params: BM25Params, block_size: int = BLOCK_SIZE):
    """map_groups fn for UNSALTED (term) groups -> final segment row."""

    def fn(g: pd.DataFrame) -> pa.Table:
        row = encode_posting(
            g["doc_id"].to_numpy(np.uint64),
            g["tf"].to_numpy(np.uint64),
            g["dl"].to_numpy(np.uint64),
            avgdl, params, block_size,
        )
        return _segment_table(g["term"].iloc[0], int(g["shard"].iloc[0]), row)

    return fn


def make_encode_bucket(avgdl: float, params: BM25Params, block_size: int = BLOCK_SIZE):
    """map_groups fn for a (shard, bucket) group holding MANY terms —
    the WHOLE bucket is encoded in one vectorized pass.

    Bucketing amortizes Ray's per-group dispatch over ~vocab/num_buckets
    terms; vectorizing amortizes numpy-call overhead the same way: the
    bucket's full posting stream is lex-sorted by (term, doc_id) once,
    the delta/restart gap stream is computed with ONE np.where (a
    restart — absolute doc_id — at every term start and every
    block_size-th posting within a term, exactly the per-block format
    ``encode_posting`` emits), and ONE varbyte pass encodes all terms'
    docs (and one more all tfs). Block skip tables and score bounds
    fall out of reduceat/searchsorted over the restart positions. This
    replaces ~40 numpy calls PER TERM with ~30 per BUCKET; output is
    byte-identical to the per-term ``make_encode_final`` path (same
    tests cover both, plus a property test in tests/test_codec.py).
    """
    def fn(g: pd.DataFrame) -> pa.Table:
        shard = int(g["shard"].iloc[0])
        terms = g["term"].to_numpy()
        # lexsort: doc_id secondary (stable), term primary
        order = np.argsort(g["doc_id"].to_numpy(np.uint64), kind="stable")
        order = order[np.argsort(terms[order], kind="stable")]
        return encode_terms_stream(
            terms[order],
            g["doc_id"].to_numpy(np.uint64)[order],
            g["tf"].to_numpy(np.uint64)[order],
            g["dl"].to_numpy(np.uint64)[order].astype(np.float64),
            shard, avgdl, params, block_size,
        )

    return fn


def encode_terms_stream(
    terms: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    shard: int,
    avgdl: float,
    params: BM25Params,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Vectorized core: a posting stream ALREADY lex-sorted by
    (term, doc_id) -> one SEGMENT_SCHEMA row per term. Shared by the
    cold bucket encoder and the salted merge."""
    k1, b = params.k1, params.b
    n = len(terms)
    uniq, term_starts = np.unique(terms, return_index=True)
    tbounds = np.append(term_starts, n)
    df = np.diff(tbounds)

    # restart positions: first posting of every block of every term
    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(term_starts, df)
    is_restart = (pos_in_term % block_size) == 0
    prev = np.empty_like(doc_ids)
    prev[0] = 0
    prev[1:] = doc_ids[:-1]
    gaps = np.where(is_restart, doc_ids, doc_ids - prev)

    doc_bytes, doc_nbytes = encode_varbyte_with_lengths(gaps)
    tf_bytes, tf_nbytes = encode_varbyte_with_lengths(tfs)
    doc_cum = np.concatenate(([0], np.cumsum(doc_nbytes)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_nbytes)))

    # per-block skip metadata
    block_start = np.flatnonzero(is_restart)
    block_end = np.append(block_start[1:], n) - 1
    block_last = doc_ids[block_end]
    tfs_f = tfs.astype(np.float64)
    partial = tfs_f * (k1 + 1.0) / (tfs_f + k1 * (1.0 - b + b * dls / avgdl))
    bmax = _f32_upper(np.maximum.reduceat(partial, block_start))
    # term -> its block range
    tb_start = np.searchsorted(block_start, term_starts)
    tb_bounds = np.append(tb_start, len(block_start))
    nblocks = np.diff(tb_bounds)
    max_partial = np.maximum.reduceat(bmax, tb_start)

    # offset lists: per-term block byte offsets + trailing total
    def off_lists(cum: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        within = cum[block_start] - np.repeat(cum[tbounds[:-1]], nblocks)
        totals = cum[tbounds[1:]] - cum[tbounds[:-1]]
        L = nblocks + 1
        list_offs = np.concatenate(([0], np.cumsum(L)))
        vals = np.empty(list_offs[-1], dtype=np.uint64)
        trailing = list_offs[1:] - 1
        mask = np.ones(len(vals), dtype=bool)
        mask[trailing] = False
        vals[mask] = within.astype(np.uint64)
        vals[trailing] = totals.astype(np.uint64)
        return vals, list_offs

    doc_off_vals, off_offs = off_lists(doc_cum)
    tf_off_vals, _ = off_lists(tf_cum)

    blist_offs = tb_bounds.astype(np.int64)
    docs_col = [
        doc_bytes[doc_cum[tbounds[i]]: doc_cum[tbounds[i + 1]]]
        for i in range(len(uniq))
    ]
    tfs_col = [
        tf_bytes[tf_cum[tbounds[i]]: tf_cum[tbounds[i + 1]]]
        for i in range(len(uniq))
    ]
    return pa.Table.from_arrays(
        [
            pa.array(uniq, pa.string()),
            pa.array(np.full(len(uniq), shard, np.int32), pa.int32()),
            pa.array(df.astype(np.uint32), pa.uint32()),
            pa.array(docs_col, pa.binary()),
            pa.array(tfs_col, pa.binary()),
            pa.ListArray.from_arrays(
                pa.array(blist_offs, pa.int32()),
                pa.array(block_last, pa.uint64()),
            ),
            pa.ListArray.from_arrays(
                pa.array(off_offs, pa.int32()),
                pa.array(doc_off_vals, pa.uint64()),
            ),
            pa.ListArray.from_arrays(
                pa.array(off_offs, pa.int32()),
                pa.array(tf_off_vals, pa.uint64()),
            ),
            pa.ListArray.from_arrays(
                pa.array(blist_offs, pa.int32()),
                pa.array(bmax, pa.float32()),
            ),
            pa.array(max_partial, pa.float32()),
        ],
        schema=SEGMENT_SCHEMA,
    )


def encode_sub(g: pd.DataFrame) -> pa.Table:
    """map_groups fn for SALTED (shard, bucket, salt) groups — MANY
    terms per group (coarse salt groups amortize Ray's per-group
    dispatch the same way the cold bucket encode does; the fine
    per-(term, salt) grouping dispatched thousands of single-row
    python calls). Emits one sub-posting row per term: whole-term
    delta+varbyte streams, no block structure (intermediate form
    only)."""
    terms = g["term"].to_numpy()
    order = np.argsort(g["doc_id"].to_numpy(np.uint64), kind="stable")
    order = order[np.argsort(terms[order], kind="stable")]
    terms = terms[order]
    ids = g["doc_id"].to_numpy(np.uint64)[order]
    tfs = g["tf"].to_numpy(np.uint64)[order]
    dls = g["dl"].to_numpy(np.uint64)[order]
    shard = int(g["shard"].iloc[0])
    n = len(terms)
    uniq, term_starts = np.unique(terms, return_index=True)
    tbounds = np.append(term_starts, n)
    # delta with restart at every term start, in ONE vectorized pass
    is_start = np.zeros(n, dtype=bool)
    is_start[term_starts] = True
    prev = np.empty_like(ids)
    prev[0] = 0
    prev[1:] = ids[:-1]
    gaps = np.where(is_start, ids, ids - prev)
    doc_bytes, doc_nb = encode_varbyte_with_lengths(gaps)
    tf_bytes, tf_nb = encode_varbyte_with_lengths(tfs)
    dl_bytes, dl_nb = encode_varbyte_with_lengths(dls)
    cums = [np.concatenate(([0], np.cumsum(x))) for x in (doc_nb, tf_nb, dl_nb)]
    cols = []
    for blob, cum in zip((doc_bytes, tf_bytes, dl_bytes), cums):
        cols.append(
            [blob[cum[tbounds[i]]: cum[tbounds[i + 1]]] for i in range(len(uniq))]
        )
    bucket = int(g["bucket"].iloc[0])
    return pa.Table.from_arrays(
        [
            pa.array(uniq, pa.string()),
            pa.array(np.full(len(uniq), shard, np.int32), pa.int32()),
            pa.array(np.full(len(uniq), bucket, np.int32), pa.int32()),
            pa.array(np.diff(tbounds).astype(np.uint32), pa.uint32()),
            pa.array(cols[0], pa.binary()),
            pa.array(cols[1], pa.binary()),
            pa.array(cols[2], pa.binary()),
        ],
        schema=SUB_SCHEMA,
    )


def make_merge_salted(avgdl: float, params: BM25Params, block_size: int = BLOCK_SIZE):
    """map_groups fn merging a (shard, bucket) group's salted
    sub-postings (several terms x salt_factor sub rows) into final
    segment rows via the shared vectorized core — byte-identical to an
    unsalted encode of the same postings (tested)."""

    def fn(g: pd.DataFrame) -> pa.Table:
        counts = g["n"].to_numpy(np.int64)
        terms_rep = np.repeat(g["term"].to_numpy(), counts)
        ids = np.concatenate(
            [delta_decode(decode_varbyte(buf, int(n)))
             for buf, n in zip(g["docs_sub"], counts)]
        )
        tfs = np.concatenate(
            [decode_varbyte(buf, int(n)) for buf, n in zip(g["tfs_sub"], counts)]
        )
        dls = np.concatenate(
            [decode_varbyte(buf, int(n)) for buf, n in zip(g["dls_sub"], counts)]
        )
        order = np.argsort(ids, kind="stable")
        order = order[np.argsort(terms_rep[order], kind="stable")]
        return encode_terms_stream(
            terms_rep[order], ids[order], tfs[order],
            dls[order].astype(np.float64),
            int(g["shard"].iloc[0]), avgdl, params, block_size,
        )

    return fn
