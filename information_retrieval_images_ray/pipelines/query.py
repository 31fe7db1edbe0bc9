"""BM25 top-k query path.

The Ray-native re-expression of the reference's query lifecycle
(/root/reference/server.py:128-177: embed the query -> ANN top-k ->
hydrate metadata -> ranked output). Differences by design:

- the "model" is the frozen tokenizer (same config the index was built
  with, recorded in manifest/stats — reference records its prompt per
  row the same way, db.py:124-127);
- the index state (term dictionary, posting segments, doc_len arrays)
  is loaded ONCE per scorer — the reference builds its Milvus/SQLite
  clients per request (server.py:135-146), which SURVEY.md flags; our
  ``QueryScorer`` is a callable class so ``map_batches(QueryScorer,
  concurrency=N)`` gives an actor pool holding the index;
- two scoring algorithms over the same compressed segments:
  ``taat`` — exhaustive term-at-a-time numpy scoring (the oracle-shaped
  fast path), and ``bmw`` — block-max WAND with skip pointers
  (Ding & Suel, SIGIR 2011), rank-identical to taat by construction
  (full scores are summed in the same sorted-term float64 order).

Scale notes: shards here are doc_id ranges; every shard scores
independently and k-way merges, so a cluster serves queries with one
actor pool per shard subset and a tiny driver-side merge (k per shard).
A single actor loads only the shards it owns; at 10^12 docs the
dictionary read becomes a pushdown read of the query's terms only.
"""

from __future__ import annotations

import glob
import heapq
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.bm25 import BM25Params, idf as idf_fn, rank_topk
from ..functions.codec import decode_varbyte
from ..functions.tokenizer import get_tokenizer


class _ShardIndex:
    """One doc-range shard: lazy term -> posting-row access.

    The segment table stays columnar (Arrow buffers; list columns held
    as flat numpy values + offsets, zero-copy). Per-term row dicts are
    materialized only for terms a query actually touches — at web
    scale a query hits a handful of terms out of a vocab of millions,
    so eager per-term dict building is both O(vocab) startup time and
    O(vocab) python-object heap.
    """

    def __init__(self, seg_dir: str, lo: int, hi: int):
        self.lo, self.hi = lo, hi
        self._idx: dict[str, int] = {}
        files = sorted(glob.glob(os.path.join(seg_dir, "*.parquet")))
        if not files:
            self.n_terms = 0
            self.df_local_sum = 0
            return
        t = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        self._idx = {term: i for i, term in enumerate(t["term"].to_pylist())}
        self._df_local = t["df_local"].to_numpy(zero_copy_only=False).astype(np.int64)
        self._docs = t["docs"].combine_chunks()
        self._tfs = t["tfs"].combine_chunks()
        self._lists = {}
        for name, dtype in (
            ("block_last_doc", np.uint64),
            ("block_doc_off", np.int64),
            ("block_tf_off", np.int64),
            ("block_max_partial", np.float64),
        ):
            col = t[name].combine_chunks()
            self._lists[name] = (
                col.values.to_numpy(zero_copy_only=False).astype(dtype),
                col.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
            )
        self._max_partial = t["max_partial"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        self.n_terms = len(self._idx)
        self.df_local_sum = int(self._df_local.sum())

    def get(self, term: str) -> dict | None:
        i = self._idx.get(term)
        if i is None:
            return None
        row = {
            "df_local": int(self._df_local[i]),
            "docs": self._docs[i].as_py(),
            "tfs": self._tfs[i].as_py(),
            "max_partial": float(self._max_partial[i]),
        }
        for name, (flat, offs) in self._lists.items():
            row[name] = flat[offs[i]: offs[i + 1]]
        return row


class IndexReader:
    """Loads a built index directory; provides search().

    State loaded once (the actor-pool __init__ pattern, reference
    analogue vector_db.py:12-31).
    """

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.params = BM25Params(self.stats["k1"], self.stats["b"])
        self.block_size = self.stats["block_size"]
        self.tokenize = get_tokenizer(self.stats["tokenizer"])
        self.n_docs = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]
        bounds = self.stats["shard_bounds"]
        self.num_shards = self.stats["num_shards"]

        # global df dictionary (vocab-sized; pushdown-per-term at scale)
        tdir = os.path.join(index_dir, "termstats")
        tstats = pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(f"{tdir}/*.parquet"))]
        )
        self.df = dict(zip(tstats["term"].to_pylist(), tstats["df"].to_pylist()))

        # doc_len array, dense over the doc_id span
        span = self.stats["doc_id_span"]
        self.doc_len = np.zeros(span, dtype=np.float64)
        self.sha = {}
        for f in sorted(
            glob.glob(os.path.join(index_dir, "docmeta", "**", "*.parquet"), recursive=True)
        ):
            t = pq.read_table(f, columns=["doc_id", "doc_len"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.doc_len[ids] = t["doc_len"].to_numpy(zero_copy_only=False)

        from .build import segment_shard_dir

        self.shards = [
            _ShardIndex(segment_shard_dir(index_dir, s), bounds[s], bounds[s + 1])
            for s in range(self.num_shards)
        ]

    # -- helpers --------------------------------------------------------------
    def _decode_full(self, row: dict) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) fully decoded for one term in one shard."""
        df = int(row["df_local"])
        ids = decode_varbyte(row["docs"], df)
        bs = self.block_size
        out = np.empty(df, dtype=np.uint64)
        for i in range(len(row["block_doc_off"]) - 1):
            s = i * bs
            e = min(df, s + bs)
            out[s:e] = np.cumsum(ids[s:e], dtype=np.uint64)
        tfs = decode_varbyte(row["tfs"], df)
        return out, tfs

    def _query_terms(self, query: str) -> list[str]:
        return sorted(set(self.tokenize(query)))

    # -- exhaustive TAAT ------------------------------------------------------
    def search_taat(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = self._query_terms(query)
        acc: dict[int, np.ndarray] = {}  # shard -> local score array
        k1, b = self.params.k1, self.params.b
        for t in terms:
            df = self.df.get(t)
            if not df:
                continue
            w = idf_fn(self.n_docs, df)
            for s, sh in enumerate(self.shards):
                row = sh.get(t)
                if row is None:
                    continue
                ids, tfs = self._decode_full(row)
                dl = self.doc_len[ids.astype(np.int64)]
                tfs_f = tfs.astype(np.float64)
                part = tfs_f * (k1 + 1.0) / (tfs_f + k1 * (1.0 - b + b * dl / self.avgdl))
                a = acc.get(s)
                if a is None:
                    a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                    acc[s] = a
                a[ids.astype(np.int64) - sh.lo] += w * part
        all_ids, all_scores = [], []
        for s, a in acc.items():
            nz = np.flatnonzero(a)
            all_ids.append(nz + self.shards[s].lo)
            all_scores.append(a[nz])
        if not all_ids:
            return []
        return rank_topk(np.concatenate(all_ids), np.concatenate(all_scores), k)

    # -- block-max WAND (vectorized block-at-a-time variant) ------------------
    def search_bmw(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Block-max top-k (Ding & Suel BMW, windowed variant): the doc
        space is swept in windows ending at the nearest block boundary
        (skip pointer) among the live terms; a window whose summed
        block-max upper bound cannot beat the heap threshold is skipped
        WITHOUT decoding any postings; a surviving window is decoded and
        scored fully-vectorized (numpy over <= block_size postings per
        term), accumulating each doc's terms in sorted-term float64
        order — bit-identical to search_taat, hence rank-identical to
        the brute-force oracle."""
        terms = self._query_terms(query)
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        for sh in self.shards:
            self._bmw_shard(sh, terms, k, heap)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))[:k]
        return [(-negid, score) for score, negid in out]

    def _bmw_shard(self, sh: _ShardIndex, terms: list[str], k: int,
                   heap: list[tuple[float, int]]) -> None:
        cursors = [
            _BlockCursor(t, idf_fn(self.n_docs, self.df[t]), row, self.block_size)
            for t in terms
            if self.df.get(t) and (row := sh.get(t)) is not None
        ]  # `terms` is sorted -> cursors stay in sorted-term order
        if not cursors:
            return
        k1, b = self.params.k1, self.params.b
        avgdl = self.avgdl
        doc_len = self.doc_len

        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                return
            theta = heap[0][0] if len(heap) >= k else -np.inf
            if sum(c.max_score for c in live) <= theta:
                return  # no remaining doc in this shard can beat theta
            window_end = min(c.cur_block_last() for c in live)
            ub = sum(c.cur_block_max() for c in live)
            if ub <= theta:
                # skip: nothing in (floor, window_end] can make top-k
                for c in live:
                    c.skip_to(window_end)
                continue
            # score the window: decode each live term's slice, then
            # accumulate per-doc in sorted-term order (== TAAT order)
            slices = []
            for c in live:
                ids, tfs = c.take_upto(window_end)
                if len(ids):
                    slices.append((c.weight, ids, tfs))
            if slices:
                all_ids = (
                    slices[0][1]
                    if len(slices) == 1
                    else np.unique(np.concatenate([s[1] for s in slices]))
                )
                scores = np.zeros(len(all_ids), dtype=np.float64)
                for w, ids, tfs in slices:
                    idx = np.searchsorted(all_ids, ids)
                    tfs_f = tfs.astype(np.float64)
                    dl = doc_len[ids.astype(np.int64)]
                    scores[idx] += w * (
                        tfs_f * (k1 + 1.0)
                        / (tfs_f + k1 * (1.0 - b + b * dl / avgdl))
                    )
                if len(heap) >= k:  # vectorized pre-filter vs current theta
                    sel = scores > heap[0][0]
                    all_ids, scores = all_ids[sel], scores[sel]
                for doc, score in zip(all_ids, scores):
                    entry = (float(score), -int(doc))
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)


class _BlockCursor:
    """Block-granular posting cursor: lazy per-block decode, skip
    pointers (block_last_doc), per-block score upper bounds."""

    __slots__ = ("term", "weight", "row", "nblocks", "bi", "pos",
                 "ids", "tfs", "floor", "exhausted", "max_score")

    def __init__(self, term: str, weight: float, row: dict, block_size: int):
        self.term = term
        self.weight = weight
        self.row = row
        self.nblocks = len(row["block_last_doc"])
        self.bi = 0
        self.ids = None  # decoded current block (lazy)
        self.tfs = None
        self.pos = 0
        self.floor = -1  # docs <= floor are pruned/consumed
        self.exhausted = self.nblocks == 0
        self.max_score = weight * row["max_partial"]

    def cur_block_last(self) -> int:
        return int(self.row["block_last_doc"][self.bi])

    def cur_block_max(self) -> float:
        return self.weight * float(self.row["block_max_partial"][self.bi])

    def _advance_block(self) -> None:
        self.bi += 1
        self.ids = None
        self.tfs = None
        self.pos = 0
        if self.bi >= self.nblocks:
            self.exhausted = True

    def skip_to(self, boundary: int) -> None:
        """Prune all docs <= boundary (no decode needed)."""
        self.floor = max(self.floor, boundary)
        while not self.exhausted and self.cur_block_last() <= self.floor:
            self._advance_block()

    def _decode(self) -> None:
        row = self.row
        bi = self.bi
        doc_off = row["block_doc_off"]
        tf_off = row["block_tf_off"]
        gaps = decode_varbyte(row["docs"][int(doc_off[bi]): int(doc_off[bi + 1])])
        self.ids = np.cumsum(gaps, dtype=np.uint64)
        self.tfs = decode_varbyte(row["tfs"][int(tf_off[bi]): int(tf_off[bi + 1])])
        self.pos = 0

    def take_upto(self, boundary: int) -> tuple[np.ndarray, np.ndarray]:
        """Consume and return (ids, tfs) with floor < doc <= boundary
        from the current block; advances past the block if drained."""
        if self.exhausted:
            return _EMPTY_U64, _EMPTY_U64
        if self.ids is None:
            self._decode()
        start = self.pos
        if self.floor >= 0 and start < len(self.ids):
            start = max(
                start,
                int(np.searchsorted(self.ids, np.uint64(self.floor), side="right")),
            )
        end = int(np.searchsorted(self.ids, np.uint64(boundary), side="right"))
        out = (self.ids[start:end], self.tfs[start:end])
        self.pos = end
        if end >= len(self.ids):
            self._advance_block()
        return out


_EMPTY_U64 = np.empty(0, dtype=np.uint64)


class QueryScorer:
    """Actor-pool callable: batch of (qid, query) -> top-k rows.

    Usage: ``queries_ds.map_batches(QueryScorer,
    fn_constructor_kwargs={"index_dir": ..., "k": 10},
    batch_format="pandas", concurrency=N)``.
    """

    def __init__(self, index_dir: str, k: int = 10, algo: str = "taat"):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.algo = algo

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        search = (
            self.reader.search_bmw if self.algo == "bmw" else self.reader.search_taat
        )
        out = {"qid": [], "rank": [], "doc_id": [], "score": []}
        for qid, query in zip(batch["qid"], batch["query"]):
            for rank, (doc, score) in enumerate(search(query, self.k), start=1):
                out["qid"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(doc)
                out["score"].append(score)
        return pd.DataFrame(out)


def hydrate_hits(hits_df: pd.DataFrame, index_dir: str) -> pd.DataFrame:
    """Join top-k hits with document metadata (the reference's
    per-hit SQLite lookup, server.py:165 + db.py:393-397, re-expressed
    as one vectorized join against docmeta — k is tiny, so the hits
    side is broadcast)."""
    files = sorted(
        glob.glob(os.path.join(index_dir, "docmeta", "**", "*.parquet"), recursive=True)
    )
    meta = pa.concat_tables(
        [pq.read_table(f) for f in files]
    ).to_pandas()
    meta["content_sha256"] = meta["content_sha256"].map(
        lambda b: bytes(b).hex() if b is not None else None
    )
    return hits_df.merge(meta, on="doc_id", how="left")
