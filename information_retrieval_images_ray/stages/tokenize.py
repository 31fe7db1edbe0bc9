"""Tokenize + content-hash stage (the engine's featurizer).

This is the Ray-Data analogue of the reference's stateful featurization
stages (model clients constructed once, then a cheap per-item call —
/root/reference/gemini_api.py:9-19, vector_db.py:12-31): a callable
CLASS whose ``__init__`` compiles the tokenizer once per actor and whose
``__call__`` transforms one zero-copy Arrow batch.

Input batch:  (doc_id: uint64, content: string, + passthrough metadata)
Output batch: doc_id, content_sha256 (binary, the per-row end-to-end
invariant — reference identity hash pattern, db.py:120-122), doc_len,
terms (list<string>, unique per doc), tfs (list<uint32>), + passthrough.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow as pa

from ..functions.tokenizer import get_tokenizer

PASSTHROUGH = ("repo", "path", "commit", "lang")


class TokenizeStage:
    def __init__(self, tokenizer: str = "code"):
        self._tok = get_tokenizer(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["content"].to_pylist()
        tok = self._tok
        shas: list[bytes] = []
        doc_lens: list[int] = []
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        for text in texts:
            text = text or ""
            shas.append(hashlib.sha256(text.encode("utf-8")).digest())
            toks = tok(text)
            doc_lens.append(len(toks))
            c = Counter(toks)
            terms_col.append(list(c.keys()))
            tfs_col.append(list(c.values()))
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "doc_id": batch["doc_id"].cast(pa.uint64()),
            "content_sha256": pa.array(shas, pa.binary(32)),
            "doc_len": pa.array(doc_lens, pa.uint32()),
            "terms": pa.array(terms_col, pa.large_list(pa.string())),
            "tfs": pa.array(tfs_col, pa.large_list(pa.uint32())),
        }
        for name in PASSTHROUGH:
            if name in batch.column_names:
                cols[name] = batch[name]
        return pa.table(cols)


def explode_postings(shard_of):
    """Returns a map_batches fn exploding docterms rows into
    one row per (term, doc) with tf + dl + doc-shard, fully via Arrow
    list flattening + numpy repeat (no per-row python in the hot path
    beyond the list value buffers Arrow already holds).
    """
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        terms = batch["terms"].combine_chunks()
        tfs = batch["tfs"].combine_chunks()
        lens = terms.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), lens)
        dls = np.repeat(batch["doc_len"].to_numpy(zero_copy_only=False), lens)
        # NB: the term column is deliberately a PLAIN string array.
        # Dictionary-encoding it (tempting — a term repeats once per
        # posting) makes Ray's sort exchange unify dictionaries on
        # every block concat, which measured ~10x SLOWER than moving
        # the raw strings (1.6M-doc corpus: segment exchange 26s ->
        # 260s). Plain strings + zstd'd parquet at rest is the right
        # trade.
        flat_terms = terms.flatten()
        flat_tfs = tfs.flatten()
        return pa.table(
            {
                "term": flat_terms,
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "tf": flat_tfs.cast(pa.uint32()),
                "dl": pa.array(dls, pa.uint32()),
                "shard": pa.array(shard_of(doc_ids), pa.int32()),
            }
        )

    return fn
