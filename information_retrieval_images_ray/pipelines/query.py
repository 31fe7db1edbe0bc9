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

    # -- block-max WAND -------------------------------------------------------
    def search_bmw(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = self._query_terms(query)
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        for sh in self.shards:
            self._bmw_shard(sh, terms, k, heap)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))[:k]
        return [(-negid, score) for score, negid in out]

    def _bmw_shard(self, sh: _ShardIndex, terms: list[str], k: int,
                   heap: list[tuple[float, int]]) -> None:
        cursors = []
        for t in terms:
            df = self.df.get(t)
            row = sh.get(t)
            if not df or row is None:
                continue
            w = idf_fn(self.n_docs, df)
            cursors.append(_Cursor(t, w, row, self.block_size))
        if not cursors:
            return
        k1, b = self.params.k1, self.params.b

        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                return
            live.sort(key=lambda c: c.cur_doc)
            theta = heap[0][0] if len(heap) >= k else -np.inf
            # pivot: first prefix whose summed term upper bounds beat theta
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.max_score
                if acc > theta:
                    pivot = i
                    break
            if pivot == -1:
                return  # no doc can beat theta in this shard
            pivot_doc = live[pivot].cur_doc
            # block-max refinement
            ub = 0.0
            for c in live[: pivot + 1]:
                ub += c.block_max_score(pivot_doc)
            if ub <= theta:
                # safe skip: jump past the smallest block boundary
                boundary = min(c.block_last(pivot_doc) for c in live[: pivot + 1])
                target = max(boundary + 1, pivot_doc + 1)
                # advance the cursor with the largest term bound (fewest
                # postings moved is also fine; largest bound shrinks ub most)
                live[0].next_geq(target)
                continue
            if live[0].cur_doc == pivot_doc:
                # all cursors up to pivot aligned -> full score, in
                # sorted-term float64 order for TAAT bit-parity
                aligned = [c for c in live if c.cur_doc == pivot_doc]
                aligned.sort(key=lambda c: c.term)
                score = 0.0
                dl = self.doc_len[pivot_doc]
                for c in aligned:
                    tf = float(c.cur_tf())
                    score += c.weight * (
                        tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                    )
                for c in aligned:
                    c.advance()
                entry = (score, -int(pivot_doc))
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
            else:
                live[0].next_geq(pivot_doc)


class _Cursor:
    """Posting cursor with lazy per-block decode + skip pointers."""

    __slots__ = ("term", "weight", "row", "bs", "nblocks", "bi", "pos",
                 "ids", "tfs", "exhausted", "max_score")

    def __init__(self, term: str, weight: float, row: dict, block_size: int):
        self.term = term
        self.weight = weight
        self.row = row
        self.bs = block_size
        self.nblocks = len(row["block_last_doc"])
        self.bi = -1
        self.exhausted = False
        self.max_score = weight * row["max_partial"]
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.nblocks:
            self.exhausted = True
            self.ids = None
            return
        self.bi = bi
        row = self.row
        doc_off = row["block_doc_off"]
        tf_off = row["block_tf_off"]
        gaps = decode_varbyte(row["docs"][doc_off[bi]: doc_off[bi + 1]])
        self.ids = np.cumsum(gaps, dtype=np.uint64)
        self.tfs = decode_varbyte(row["tfs"][tf_off[bi]: tf_off[bi + 1]])
        self.pos = 0

    @property
    def cur_doc(self) -> int:
        if self.exhausted:
            return 1 << 62
        return int(self.ids[self.pos])

    def cur_tf(self) -> int:
        return int(self.tfs[self.pos])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ids):
            self._load_block(self.bi + 1)

    def next_geq(self, target: int) -> None:
        if self.exhausted:
            return
        last = self.row["block_last_doc"]
        if last[self.bi] < target:
            nbi = int(np.searchsorted(last, np.uint64(target), side="left"))
            self._load_block(nbi)
            if self.exhausted:
                return
        self.pos = int(np.searchsorted(self.ids, np.uint64(target), side="left"))
        if self.pos >= len(self.ids):  # defensive; block_last guarantees not
            self._load_block(self.bi + 1)

    def block_last(self, _doc: int) -> int:
        """Last doc_id of the current block (skip boundary)."""
        if self.exhausted:
            return 1 << 62
        return int(self.row["block_last_doc"][self.bi])

    def block_max_score(self, doc: int) -> float:
        """Upper-bound score of this term for docs <= its block covering
        ``doc`` (cursor is positioned at the first doc >= previous
        targets; the block containing candidates for ``doc`` is the
        current block when cur_doc >= doc... conservative: use the block
        that would contain ``doc``)."""
        if self.exhausted:
            return 0.0
        last = self.row["block_last_doc"]
        bi = self.bi
        if last[bi] < doc:
            bi = int(np.searchsorted(last, np.uint64(doc), side="left"))
            if bi >= self.nblocks:
                return 0.0
        return self.weight * float(self.row["block_max_partial"][bi])


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
