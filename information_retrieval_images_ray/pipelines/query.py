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


def _levenshtein_leq(a: str, b: str, cap: int) -> bool:
    """True iff levenshtein(a, b) <= cap. Banded DP: only the diagonal
    band of width 2*cap+1 is computed and a row whose band minimum
    already exceeds ``cap`` exits early — O(min(len)*cap), not
    O(len(a)*len(b)). Matches DuckDB's ``levenshtein`` (unit-cost
    insert/delete/substitute; transposition counts as 2)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - cap)
        hi = min(lb, i + cap)
        cur = [i] + [cap + 1] * lb
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if min(cur[max(0, i - cap): hi + 1]) > cap:
            return False
        prev = cur
    return prev[lb] <= cap


def parse_boosted_query(query: str, tokenize) -> dict[str, float]:
    """Parse Lucene ``term^boost`` clause syntax into per-term boost
    multipliers: whitespace-split clauses, each with an optional
    trailing ``^float`` (default 1.0); the clause text then runs
    through the index tokenizer (a clause may normalize to several
    terms, each inheriting the clause boost). A term repeated across
    clauses SUMS its boosts — the OR-of-clauses contract (two clauses
    for the same term add their contributions, so ``fast^2 fast``
    scores exactly like ``fast^3``). A ``^`` with a non-numeric tail
    is literal clause text (the tokenizer strips it)."""
    boosts: dict[str, float] = {}
    for clause in query.split():
        head, sep, tail = clause.rpartition("^")
        boost, text = 1.0, clause
        if sep:
            try:
                boost = float(tail)
                text = head
            except ValueError:
                pass
        for t in tokenize(text):
            boosts[t] = boosts.get(t, 0.0) + boost
    return boosts


def _sample_doc_freqs(index_dir: str, ids: list[int]) -> dict[str, int]:
    """Foreground doc frequencies for significant-terms: how many of
    the sample docs contain each term, from ONE doc_id-pruned read of
    the docterms checkpoint. Shared by the serial reader and the
    sharded router (which samples via per-actor ascending prefixes)."""
    import pyarrow.dataset as pads

    if not ids:
        return {}
    dt_dir = os.path.join(index_dir, "docterms")
    tbl = pads.dataset(dt_dir, format="parquet").to_table(
        columns=["doc_id", "terms"],
        filter=pads.field("doc_id").isin(sorted(set(int(d) for d in ids))),
    )
    fg: dict[str, int] = {}
    for terms in tbl["terms"].to_pylist():
        for t in set(terms):
            fg[t] = fg.get(t, 0) + 1
    return fg


def _score_significant(
    fg: dict[str, int], dfs: dict[str, int], n_sample: int, n_docs: int,
    cand: list[str], k: int,
) -> list[dict]:
    """Add-one log-odds of foreground vs corpus doc rate — identical
    float ops serial and sharded (and mirrored in the SQL oracle):
    ln((fg+1)/(ns-fg+1)) - ln((df+1)/(N-df+1)), integer-valued doubles
    divided once, the bit-exactness the distinctive-terms oracle
    already relies on. Top-k by (lor desc, term asc)."""
    rows = []
    for t in cand:
        f, d = fg[t], int(dfs.get(t, 0))
        lor = float(
            np.log((f + 1.0) / (n_sample - f + 1.0))
            - np.log((d + 1.0) / (n_docs - d + 1.0))
        )
        rows.append({"term": t, "fg_df": f, "df": d, "lor": lor})
    rows.sort(key=lambda r: (-r["lor"], r["term"]))
    return rows[:k]


def decode_all_blocks(row: dict, block_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a term's full (doc_ids, tfs) in O(1) numpy passes.

    The doc stream is delta-encoded with a restart at every block (the
    first value of each block is an absolute doc_id), so a single
    cumsum over the whole gap stream over-counts every element of block
    b by the gap total of all earlier blocks — which is exactly
    ``cumsum[block_start - 1]``. That error is constant within each
    block, so one vectorized subtraction fixes all blocks at once (no
    per-block python loop; ~100x fewer numpy calls than per-block
    decode on long postings)."""
    df = int(row["df_local"])
    gaps = decode_varbyte(row["docs"], df)
    raw = np.cumsum(gaps, dtype=np.uint64)
    n = len(raw)
    if n > block_size:
        starts = np.arange(block_size, n, block_size)
        corr_vals = raw[starts - 1]
        lens = np.diff(np.append(starts, n))
        corr = np.concatenate(
            [np.zeros(block_size, dtype=np.uint64), np.repeat(corr_vals, lens)]
        )
        ids = raw - corr
    else:
        ids = raw
    tfs = decode_varbyte(row["tfs"], df)
    return ids, tfs


class _ShardIndex:
    """One doc-range shard: lazy term -> posting-row access.

    The segment table stays columnar (Arrow buffers; list columns held
    as flat numpy values + offsets, zero-copy). Per-term row dicts are
    materialized only for terms a query actually touches — at web
    scale a query hits a handful of terms out of a vocab of millions,
    so eager per-term dict building is both O(vocab) startup time and
    O(vocab) python-object heap.
    """

    def __init__(self, seg_dir: str, lo: int, hi: int, bound_scale: float = 1.0,
                 cache_bytes: int = 0):
        """``bound_scale`` >= 1 rescales the stored block-max tables:
        after a delta extend raises global avgdl, bounds encoded with
        the older (smaller) avgdl are no longer upper bounds of the
        live BM25 partial (which is monotone increasing in avgdl);
        multiplying by avgdl_now/encode_avgdl restores admissibility
        (the ratio partial_new/partial_old is < avgdl_new/avgdl_old
        for every (tf, dl)). Scores themselves always use live stats —
        only pruning is affected, and only by slack."""
        import pyarrow.compute as pc

        from collections import OrderedDict

        self.lo, self.hi = lo, hi
        # LRU of per-term decoded BM25 partials, keyed by row index:
        # (doc_ids int64, tf_partial float64) — everything score-side
        # except the per-query idf weight, which just scales it. Zipf
        # query workloads hit the same hot terms constantly; decoding
        # a 1M-posting stopword list (varbyte + cumsum + gather) per
        # query was the large-corpus latency floor. Budget-bounded
        # (``cache_bytes`` total per shard), evicts least-recent.
        self._part_cache: "OrderedDict[int, tuple[np.ndarray, np.ndarray]]" = (
            OrderedDict()
        )
        self._cache_budget = int(cache_bytes)
        self._cache_used = 0
        scale = max(1.0, float(bound_scale))
        files = sorted(glob.glob(os.path.join(seg_dir, "*.parquet")))
        if not files:
            self.n_terms = 0
            self.df_local_sum = 0
            self._terms = None
            return
        t = pa.concat_tables([pq.read_table(f) for f in files])
        # sort rows by term ONCE (C-speed); lookups are then O(log V)
        # binary searches touching ~17 strings — no vocab-sized python
        # dict is ever built, so reader/actor startup is O(bytes read)
        t = t.take(pc.sort_indices(t["term"])).combine_chunks()
        self._terms = t["term"].combine_chunks()
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
            vals = col.values.to_numpy(zero_copy_only=False).astype(dtype)
            if name == "block_max_partial" and scale != 1.0:
                vals = vals * scale
            self._lists[name] = (
                vals,
                col.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
            )
        self._max_partial = t["max_partial"].to_numpy(zero_copy_only=False).astype(
            np.float64
        ) * scale
        self.n_terms = len(self._terms)
        self.df_local_sum = int(self._df_local.sum())

    def rev_terms(self):
        """Reversed-term dictionary (terms codepoint-reversed, then
        C-sorted), built lazily on the FIRST leading-``*`` wildcard
        and cached for the shard's lifetime — suffix queries become
        one contiguous prefix range on this array (the standard
        reversed-dictionary trick; Lucene's ReverseStringFilter
        sidecar field). Vectorized arrow build (utf8_reverse +
        sort_indices), O(vocab) memory like the forward dictionary,
        paid only by workloads that actually issue ``*tail``
        patterns."""
        rev = getattr(self, "_rev_terms", None)
        if rev is None and self._terms is not None:
            import pyarrow.compute as pc

            flipped = pc.utf8_reverse(self._terms)
            rev = pc.take(flipped, pc.sort_indices(flipped))
            if isinstance(rev, pa.ChunkedArray):
                rev = rev.combine_chunks()
            self._rev_terms = rev
        return rev

    def find(self, term: str) -> int | None:
        """Binary search the sorted term column; row index or None."""
        arr = self._terms
        if arr is None:
            return None
        lo, hi = 0, len(arr)
        while lo < hi:
            mid = (lo + hi) // 2
            v = arr[mid].as_py()
            if v < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(arr) and arr[lo].as_py() == term:
            return lo
        return None

    def df_local_at(self, i: int) -> int:
        return int(self._df_local[i])

    def row(self, i: int) -> dict:
        out = {
            "df_local": int(self._df_local[i]),
            "docs": self._docs[i].as_py(),
            "tfs": self._tfs[i].as_py(),
            "max_partial": float(self._max_partial[i]),
        }
        for name, (flat, offs) in self._lists.items():
            out[name] = flat[offs[i]: offs[i + 1]]
        return out

    def get(self, term: str) -> dict | None:
        i = self.find(term)
        return None if i is None else self.row(i)

    def partial(
        self, i: int, block_size: int, doc_len: np.ndarray,
        k1: float, b: float, avgdl: float,
    ) -> tuple[np.ndarray | None, np.ndarray]:
        """BM25 tf-partial for row ``i`` — decoded+computed once and
        LRU-cached within the budget. The partial depends only on
        index-constant state (tf, dl, avgdl, k1, b); a query's
        contribution is ``idf_weight * partial``.

        Returns ``(doc_ids int64, partial)`` sparse form, or
        ``(None, dense partial over the shard span)`` for stopword-like
        terms (df >= half the span): the dense form replaces the
        accumulator's 1-per-posting scatter-add with one SIMD array add
        AND is smaller (span*8 < df*16 bytes). Non-matching docs hold
        0.0, which is never a valid BM25 partial (tf>=1 => partial>0),
        so they can't leak into results."""
        hit = self._part_cache.get(i)
        if hit is not None:
            self._part_cache.move_to_end(i)
            return hit
        ids_u, tfs = decode_all_blocks(self.row(i), block_size)
        ids = ids_u.astype(np.int64)
        tfs_f = tfs.astype(np.float64)
        dl = doc_len[ids]
        part = tfs_f * (k1 + 1.0) / (tfs_f + k1 * (1.0 - b + b * dl / avgdl))
        span = self.hi - self.lo
        if 2 * len(ids) >= span:
            dense = np.zeros(span, dtype=np.float64)
            dense[ids - self.lo] = part
            entry = (None, dense)
            nbytes = dense.nbytes
        else:
            entry = (ids, part)
            nbytes = ids.nbytes + part.nbytes
        if nbytes <= self._cache_budget:
            while self._cache_used + nbytes > self._cache_budget and self._part_cache:
                _, (old_ids, old_part) = self._part_cache.popitem(last=False)
                self._cache_used -= old_part.nbytes + (
                    old_ids.nbytes if old_ids is not None else 0
                )
            self._part_cache[i] = entry
            self._cache_used += nbytes
        return entry


class IndexReader:
    """Loads a built index directory; provides search().

    State loaded once (the actor-pool __init__ pattern, reference
    analogue vector_db.py:12-31).
    """

    def __init__(self, index_dir: str, shards: list[int] | None = None,
                 cache_bytes: int = 256 << 20):
        """``shards=None`` loads the whole index; a list of shard ids
        loads only those (the sharded-serving mode: each actor of a
        pool owns a disjoint subset — global df is then resolved by a
        per-query df exchange, see pipelines/serving.py).

        ``cache_bytes`` bounds the reader-wide decoded-partial LRU
        (split evenly across owned shards; 0 disables) — hot terms'
        postings decode once, repeat queries reuse them."""
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.params = BM25Params(self.stats["k1"], self.stats["b"])
        self.block_size = self.stats["block_size"]
        self.tokenize = get_tokenizer(self.stats["tokenizer"])
        self.n_docs = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]
        # df/doc-span ratio above which a term is "dense" (stopword-
        # like); an all-dense query routes to the exhaustive scan
        self.dense_query_cutoff = 0.1
        bounds = self.stats["shard_bounds"]
        self.num_shards = self.stats["num_shards"]
        self.owned = list(range(self.num_shards)) if shards is None else sorted(shards)

        # NB: no global df table is loaded — exact global df(term) is
        # the sum of per-shard df_local over this reader's shards (the
        # shards partition the doc space), so startup cost stays
        # O(index bytes), not O(vocab) python objects.

        # doc_len array, dense over the doc_id span but filled only for
        # owned shards (docmeta is hive-partitioned by shard)
        span = self.stats["doc_id_span"]
        self.doc_len = np.zeros(span, dtype=np.float64)
        meta_files: list[str] = []
        for s in self.owned:
            meta_files.extend(
                sorted(glob.glob(os.path.join(index_dir, "docmeta", f"shard={s}", "*.parquet")))
            )
        if not meta_files and shards is None:  # non-partitioned legacy layout
            meta_files = sorted(
                glob.glob(os.path.join(index_dir, "docmeta", "**", "*.parquet"), recursive=True)
            )
        for f in meta_files:
            t = pq.read_table(f, columns=["doc_id", "doc_len"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.doc_len[ids] = t["doc_len"].to_numpy(zero_copy_only=False)
        # kept for lazy metadata-filter masks (meta_mask); building one
        # is a column-pruned docmeta read, done only when a filtered
        # search is actually issued, then cached per (col, value)
        self._meta_files = meta_files
        self._mask_cache: dict[tuple[str, str], np.ndarray] = {}
        self._codes_cache: dict[str, tuple[np.ndarray, list[str]]] = {}

        # tombstoned docs (pipelines/maintenance.delete_docs) are
        # excluded from every top-k; stats stay stale until compaction
        from .maintenance import load_tombstones

        self.tombstones = load_tombstones(index_dir)

        from .build import segment_shard_dir

        # per-shard block-max rescale for delta-extended indexes (see
        # _ShardIndex.__init__); fresh builds have encode_avgdl ==
        # avgdl everywhere -> scale 1.0
        enc = self.stats.get("encode_avgdl", {})

        def _scale(s: int) -> float:
            v = float(enc.get(str(s), self.avgdl))
            return self.avgdl / v if v > 0 else 1.0  # avgdl 0 = empty corpus

        owned_set = set(self.owned)
        per_shard_cache = int(cache_bytes) // max(1, len(self.owned))
        self.shards = [
            _ShardIndex(
                segment_shard_dir(index_dir, s), bounds[s], bounds[s + 1],
                bound_scale=_scale(s), cache_bytes=per_shard_cache,
            )
            if s in owned_set
            else None
            for s in range(self.num_shards)
        ]

    # -- helpers --------------------------------------------------------------
    def _decode_full(self, row: dict) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) fully decoded for one term in one shard."""
        return decode_all_blocks(row, self.block_size)

    def _query_terms(self, query: str) -> list[str]:
        return sorted(set(self.tokenize(query)))

    def df_locals(self, terms: list[str]) -> dict[str, int]:
        """term -> sum of df_local over THIS reader's owned shards (the
        df-exchange half of sharded serving)."""
        out = {}
        for t in terms:
            df = 0
            for sh in self.shards:
                if sh is None:
                    continue
                i = sh.find(t)
                if i is not None:
                    df += sh.df_local_at(i)
            if df:
                out[t] = df
        return out

    def meta_mask(self, col: str, value: str) -> np.ndarray:
        """Dense bool mask over the doc-id span: docmeta[col] == value,
        filled for OWNED shards only (a sharded reader filters exactly
        the docs it scores, so the service's scatter-gather stays
        correct). One column-pruned docmeta read per (col, value) per
        reader, cached; nothing vocab- or corpus-text-sized loads."""
        import pyarrow.compute as pc

        key = (col, value)
        m = self._mask_cache.get(key)
        if m is None:
            m = np.zeros(len(self.doc_len), dtype=bool)
            for f in self._meta_files:
                t = pq.read_table(f, columns=["doc_id", col])
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                eq = pc.fill_null(pc.equal(t[col], pa.scalar(value)), False)
                m[ids] = eq.to_numpy(zero_copy_only=False)
            self._mask_cache[key] = m
        return m

    def meta_codes(self, col: str) -> tuple[np.ndarray, list[str]]:
        """Dense int32 code array over the doc-id span for
        ``docmeta[col]`` (owned shards; -1 = unowned or null) plus the
        code→value list (sorted unique values of OWNED docs — a sharded
        router merges per-actor counts by the value STRING, so
        dictionaries never need to agree across actors). One
        column-pruned docmeta read per col per reader, cached — the
        facet analogue of ``meta_mask``."""
        cached = self._codes_cache.get(col)
        if cached is not None:
            return cached
        ids_all, vals_all = [], []
        for f in self._meta_files:
            t = pq.read_table(f, columns=["doc_id", col])
            ids_all.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
            vals_all.append(t[col].to_numpy(zero_copy_only=False))
        codes = np.full(len(self.doc_len), -1, dtype=np.int32)
        if ids_all:
            ids = np.concatenate(ids_all)
            vals = np.concatenate(vals_all)
            ok = np.array([v is not None for v in vals], dtype=bool)
            values = sorted({str(v) for v in vals[ok]})
            lut = {v: i for i, v in enumerate(values)}
            codes[ids[ok]] = np.array(
                [lut[str(v)] for v in vals[ok]], dtype=np.int32)
        else:
            values = []
        self._codes_cache[col] = (codes, values)
        return codes, values

    def match_ids(self, query: str, doc_filter=None) -> np.ndarray:
        """Sorted doc ids (owned shards) containing AT LEAST ONE query
        term — the OR match set underneath ``search_taat`` before the
        top-k cut, and the population facet counts aggregate over.
        Presence only (``partial > 0`` ⇔ tf > 0, including the dense
        stopword form), no score arithmetic; tombstones and the
        optional metadata filter excluded exactly as in ranked
        search."""
        mask = self._resolve_filter(doc_filter)
        uniq = sorted(set(self.tokenize(query)))
        hit: dict[int, np.ndarray] = {}
        k1, b = self.params.k1, self.params.b
        for t, w, locs in self._term_infos(uniq):
            for s, i in locs:
                sh = self.shards[s]
                ids, part = sh.partial(i, self.block_size, self.doc_len,
                                       k1, b, self.avgdl)
                h = hit.get(s)
                if h is None:
                    h = np.zeros(sh.hi - sh.lo, dtype=bool)
                    hit[s] = h
                if ids is None:  # dense stopword form: tf>0 <=> part>0
                    h |= part > 0
                else:
                    h[ids - sh.lo] = True
        if not hit:
            return np.empty(0, np.int64)
        out = np.concatenate([
            (np.flatnonzero(h) + self.shards[s].lo).astype(np.int64)
            for s, h in hit.items()
        ])
        if mask is not None:
            out = out[mask[out]]
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            out = out[~is_tombstoned(self.tombstones, out)]
        return np.sort(out)

    def facet_counts(
        self, query: str, facet_cols: list[str], doc_filter=None,
    ) -> dict[str, dict[str, int]]:
        """Facet counts over the FULL match set (every doc containing
        ≥1 query term — not just the top-k page): for each requested
        docmeta column, {value: n_matching_docs}. The Lucene faceting
        shape: the ranked page answers "what are the best hits", the
        facets answer "how does the whole result set distribute".
        Vectorized: one match-mask pass + one ``bincount`` per column
        over the cached code array; additive across shard subsets, so
        the sharded service sums per-actor partial dicts."""
        ids = self.match_ids(query, doc_filter)
        out: dict[str, dict[str, int]] = {}
        for col in facet_cols:
            codes, values = self.meta_codes(col)
            c = codes[ids]
            c = c[c >= 0]
            cnt = np.bincount(c, minlength=len(values))
            out[col] = {v: int(n) for v, n in zip(values, cnt) if n}
        return out

    def length_facets(
        self, query: str, edges: list[int], doc_filter=None,
    ) -> list[dict]:
        """Numeric range-facet counts (the Elasticsearch range /
        histogram aggregation shape) of the FULL OR match set over the
        per-doc token length: bucket i covers ``[edges[i],
        edges[i+1])`` with the last bucket open-ended; ``edges`` must
        be ascending and start low enough to cover every matched doc
        (0 always works — a matched doc has >= 1 token). Presence
        only, no idf — so the sharded service needs no df exchange and
        per-actor partials over owned docs SUM exactly at the router.
        Returns only non-empty buckets, ascending by ``lo``."""
        ids = self.match_ids(query, doc_filter)
        if not len(ids):
            return []
        e = np.asarray(edges, dtype=np.float64)
        idx = np.searchsorted(e, self.doc_len[ids], side="right") - 1
        cnt = np.bincount(idx[idx >= 0], minlength=len(edges))
        return [
            {"lo": int(edges[i]), "n": int(n)}
            for i, n in enumerate(cnt) if n
        ]

    def _full_or_scores(
        self, query: str, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full OR-of-terms (ids, scores) over OWNED shards — the
        entire match set, no top-k cut, with accumulators identical to
        ``search_taat`` (same partials, same sorted-term float64 add
        order, so every score is bitwise equal to the ranked path).
        Tombstones and the optional metadata filter excluded exactly
        as in ranked search; ``weights`` overrides idf (sharded
        serving's global-df exchange). Shared by field collapsing and
        cursor paging."""
        mask = self._resolve_filter(doc_filter)
        terms = self._query_terms(query)
        acc: dict[int, np.ndarray] = {}
        k1, b = self.params.k1, self.params.b
        for t, w, locs in self._term_infos(terms, weights):
            for s, i in locs:
                sh = self.shards[s]
                ids, part = sh.partial(i, self.block_size, self.doc_len,
                                       k1, b, self.avgdl)
                a = acc.get(s)
                if a is None:
                    a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                    acc[s] = a
                if ids is None:  # dense stopword-term form
                    a += w * part
                else:
                    a[ids - sh.lo] += w * part
        all_ids, all_scores = [], []
        for s, a in acc.items():
            nz = np.flatnonzero(a)
            all_ids.append((nz + self.shards[s].lo).astype(np.int64))
            all_scores.append(a[nz])
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        if mask is not None:
            keep = mask[ids]
            ids, scores = ids[keep], scores[keep]
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            live = ~is_tombstoned(self.tombstones, ids)
            ids, scores = ids[live], scores[live]
        return ids, scores

    def search_after(
        self, query: str, k: int = 10,
        after: tuple[float, int] | None = None, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Cursor paging (the Elasticsearch ``search_after`` shape):
        the top-``k`` hits STRICTLY AFTER the ``(score, doc_id)``
        cursor in the engine-wide (score desc, doc_id asc) total
        order — the deep-paging form that never recomputes skipped
        ranks (offset paging fetches offset+k and slices; a cursor
        walk fetches k per page no matter how deep). Scores are
        bitwise equal to ranked search (same accumulators), so the
        cursor taken from any page's last hit continues exactly where
        that page ended. ``after=None`` is page one (== top-k)."""
        ids, scores = self._full_or_scores(query, doc_filter, weights)
        if not len(ids):
            return []
        if after is not None:
            s0, d0 = float(after[0]), int(after[1])
            keep = (scores < s0) | ((scores == s0) & (ids > d0))
            ids, scores = ids[keep], scores[keep]
        if not len(ids):
            return []
        if k < len(ids):
            # partial-select: keep everything at or above the k-th
            # largest score (ties at the boundary INCLUDED, so the
            # doc_id tie-break below stays exact), then sort that
            # small survivor set instead of the whole match set
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            keep = scores >= kth
            ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def collapse_leaders(
        self, query: str, field: str, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[dict]:
        """Per-group best hit (field collapsing, the Elasticsearch
        ``collapse`` / Lucene grouping shape) over OWNED shards: full
        OR-of-terms scores (identical accumulators to ``search_taat``
        — same partials, same sorted-term add order, so leader scores
        are bitwise equal to ranked search), then per distinct
        ``docmeta[field]`` value the (score desc, doc_id asc) leader
        plus the group's FULL match-set size. No k cut here — group
        cardinality is field cardinality, so the sharded router can
        max-merge leaders and sum counts exactly (a doc lives wholly
        in one shard). Docs with a null field value belong to no group
        (they still rank in plain search). ``weights`` overrides idf
        (sharded serving's global-df exchange)."""
        ids, scores = self._full_or_scores(query, doc_filter, weights)
        if not len(ids):
            return []
        codes, values = self.meta_codes(field)
        g = codes[ids]
        grouped = g >= 0
        ids, scores, g = ids[grouped], scores[grouped], g[grouped]
        if not len(ids):
            return []
        order = np.lexsort((ids, -scores))  # score desc, doc_id asc
        uniq, first = np.unique(g[order], return_index=True)
        counts = np.bincount(g, minlength=len(values))
        return [
            {"value": values[int(c)], "doc_id": int(ids[order[f]]),
             "score": float(scores[order[f]]), "n": int(counts[int(c)])}
            for c, f in zip(uniq.tolist(), first.tolist())
        ]

    def search_collapse(
        self, query: str, field: str, k: int = 10, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[dict]:
        """Field-collapsed top-k: rank each group's leader by the
        engine-wide (score desc, doc_id asc) tie-break and keep the
        best ``k`` GROUPS. Each row carries the collapse value and the
        group's full match-set size (the "show one result per source,
        with how many more it hides" surface)."""
        leaders = self.collapse_leaders(query, field, doc_filter, weights)
        leaders.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return [
            {"rank": rank, **r}
            for rank, r in enumerate(leaders[:k], start=1)
        ]

    def mlt_select_terms(
        self, doc_tokens: list[str], max_terms: int = 8,
        df_override: dict[str, int] | None = None,
    ) -> list[str]:
        """The Lucene MoreLikeThis term-selection step: from a source
        doc's token stream, keep the ``max_terms`` most interesting
        terms by tf·idf (tf in the SOURCE doc, idf from the index),
        ties broken term-ascending (deterministic). ``df_override``
        supplies exact global df in sharded serving (the router's df
        exchange); otherwise this reader's own global df is used."""
        from collections import Counter

        tf = Counter(doc_tokens)
        dfs = df_override if df_override is not None else self.df_locals(sorted(tf))
        scored = [
            (t, tf[t] * idf_fn(self.n_docs, d))
            for t, d in dfs.items() if d
        ]
        scored.sort(key=lambda e: (-e[1], e[0]))
        return [t for t, _ in scored[:max_terms]]

    def more_like_this(
        self, doc_tokens: list[str], exclude_doc: int | None = None,
        k: int = 10, max_terms: int = 8, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Similar-document retrieval (Lucene MoreLikeThis): select the
        source doc's ``max_terms`` highest-tf·idf terms, OR-score them
        with per-term idf (``search_or_terms``), drop the source doc
        itself, return top-k. The source's TOKENS are the input — the
        caller owns text access (corpus read or positions sidecar), the
        reader never touches stored text."""
        sel = self.mlt_select_terms(doc_tokens, max_terms)
        if not sel:
            return []
        hits = self.search_or_terms(sel, k + 1, doc_filter=doc_filter,
                                    weights=weights)
        hits = [(d, s) for d, s in hits if d != exclude_doc]
        return hits[:k]

    def explain(
        self, query: str, doc_ids, weights: dict[str, float] | None = None,
        df_override: dict[str, int] | None = None,
    ) -> list[dict]:
        """Lucene-style scoring explanation: for each requested doc and
        each query term the doc contains, the BM25 components —
        ``tf`` (term frequency in the doc), ``df`` (exact global
        document frequency), ``idf``, ``dl`` (doc length), the
        length-normalized tf ``partial``, and ``contribution =
        idf * partial``. A doc's contributions sum to exactly its
        ``search_taat`` score (same float64 adds in the same
        term-ascending order), so explain is an audit of the ranked
        page, not a second scorer. Tombstoned docs are skipped (they
        can never appear on a ranked page). Rows come back
        (doc_id asc, term asc); an explanation is per-query-rare, so
        the full posting decode per term reuses the shard row access
        the scorer itself uses.

        Sharded serving passes ``weights`` (global idf from the
        router's df exchange) and ``df_override`` (the summed global
        df) — a shard-subset reader's own df is shard-local."""
        targets = np.asarray(
            sorted({int(d) for d in doc_ids}), dtype=np.int64)
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            targets = targets[~is_tombstoned(self.tombstones, targets)]
        if not len(targets):
            return []
        uniq = sorted(set(self.tokenize(query)))
        k1, b = self.params.k1, self.params.b
        rows: list[dict] = []
        for t, w, locs in self._term_infos(uniq, weights):
            df_global = (
                df_override[t] if df_override is not None and t in df_override
                else sum(self.shards[s].df_local_at(i) for s, i in locs)
            )
            for s, i in locs:
                sh = self.shards[s]
                in_span = targets[(targets >= sh.lo) & (targets < sh.hi)]
                if not len(in_span):
                    continue
                ids_u, tfs = decode_all_blocks(sh.row(i), self.block_size)
                ids = ids_u.astype(np.int64)
                pos = np.searchsorted(ids, in_span)
                pos_c = np.minimum(pos, max(len(ids) - 1, 0))
                hit = (pos < len(ids)) & (ids[pos_c] == in_span)
                for d, p in zip(in_span[hit], pos_c[hit]):
                    tf = float(tfs[p])
                    dl = float(self.doc_len[d])
                    part = tf * (k1 + 1.0) / (
                        tf + k1 * (1.0 - b + b * dl / self.avgdl))
                    rows.append({
                        "doc_id": int(d), "term": t, "tf": int(tfs[p]),
                        "df": int(df_global), "idf": w, "dl": int(dl),
                        "partial": part, "contribution": w * part,
                    })
        rows.sort(key=lambda r: (r["doc_id"], r["term"]))
        return rows

    def term_vectors(self, doc_ids: list[int]) -> list[dict]:
        """Per-doc term vectors (the Elasticsearch ``_termvectors``
        shape): each requested doc's (term, tf) pairs from the index's
        own ``docterms`` checkpoint — ONE doc_id-pruned parquet read
        (predicate pushdown, only the row groups holding the ids are
        touched), never the corpus text — joined with each term's
        exact global df. Tombstoned docs return no rows. Output rows
        {"doc_id", "term", "tf", "df"} sorted (doc_id, term)."""
        import pyarrow.dataset as pads

        ids = sorted({int(d) for d in doc_ids})
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            alive = ~is_tombstoned(
                self.tombstones, np.asarray(ids, dtype=np.int64))
            ids = [d for d, a in zip(ids, alive.tolist()) if a]
        if not ids:
            return []
        dt_dir = os.path.join(self.index_dir, "docterms")
        if not os.path.isdir(dt_dir):
            raise FileNotFoundError(
                f"term_vectors needs the docterms checkpoint at {dt_dir} "
                "(present on any build_index output)")
        tbl = pads.dataset(dt_dir, format="parquet").to_table(
            columns=["doc_id", "terms", "tfs"],
            filter=pads.field("doc_id").isin(ids),
        )
        per_doc: dict[int, dict[str, int]] = {}
        all_terms: set[str] = set()
        for d, terms, tfs in zip(tbl["doc_id"].to_pylist(),
                                 tbl["terms"].to_pylist(),
                                 tbl["tfs"].to_pylist()):
            m = per_doc.setdefault(int(d), {})
            for t, f in zip(terms, tfs):
                m[t] = m.get(t, 0) + int(f)
                all_terms.add(t)
        dfs = self.df_locals(sorted(all_terms))
        out = []
        for d in sorted(per_doc):
            m = per_doc[d]
            for t in sorted(m):
                out.append({"doc_id": d, "term": t, "tf": m[t],
                            "df": int(dfs.get(t, 0))})
        return out

    def significant_terms(
        self, query: str, k: int = 10, sample_n: int = 50, doc_filter=None,
    ) -> list[dict]:
        """Significant-terms aggregation (the Elasticsearch shape):
        terms unusually frequent in the query's match set relative to
        the whole corpus — "what is this result set ABOUT". Foreground
        = the first ``sample_n`` matched doc ids ascending (the
        deterministic sample a SQL oracle can mirror), read with one
        doc_id-pruned docterms fetch; per candidate term the add-one
        log-odds of its foreground doc rate vs its corpus doc rate,
        query terms themselves excluded (they are significant by
        construction, like MLT's anchor exclusion). Top-``k`` by
        (lor desc, term asc). Rows: {"term", "fg_df", "df", "lor"}."""
        ids = self.match_ids(query, doc_filter)[:sample_n].tolist()
        exclude = set(self.tokenize(query))
        fg = _sample_doc_freqs(self.index_dir, ids)
        cand = sorted(t for t in fg if t not in exclude)
        dfs = self.df_locals(cand)
        return _score_significant(fg, dfs, len(ids), self.n_docs, cand, k)

    def search_prf(
        self, query: str, k: int = 10, fb_docs: int = 5, fb_terms: int = 8,
        beta: float = 0.5, doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Pseudo-relevance-feedback retrieval (Rocchio-style query
        expansion, public IR knowledge — Rocchio 1971, RM3 family):

        1. Score the original query, take the top ``fb_docs`` hits as
           the (pseudo-)relevant set.
        2. Pull the feedback docs' term frequencies from the index's
           own ``docterms`` checkpoint — a doc_id-pruned parquet read
           (predicate pushdown; only the row groups holding the
           feedback ids are touched), never the corpus text.
        3. Select the ``fb_terms`` expansion terms by
           ``(sum of tf over feedback docs) * idf``, original query
           terms excluded, ties broken term-ascending (the
           deterministic MLT cut).
        4. Re-score with OR-of-terms: original terms at full idf
           weight, expansion terms at ``beta * idf`` — identical
           accumulators to ``search_taat``.

        Feedback docs stay eligible for the final page (standard PRF).
        Returns [] when the base query matches nothing."""
        base = self.search_taat(query, fb_docs, doc_filter=doc_filter)
        if not base:
            return []
        fb_ids = sorted(int(d) for d, _ in base)

        import pyarrow.dataset as pads

        dt_dir = os.path.join(self.index_dir, "docterms")
        if not os.path.isdir(dt_dir):
            raise FileNotFoundError(
                f"search_prf needs the docterms checkpoint at {dt_dir} "
                "(present on any build_index output)")
        tbl = pads.dataset(dt_dir, format="parquet").to_table(
            columns=["doc_id", "terms", "tfs"],
            filter=pads.field("doc_id").isin(fb_ids),
        )
        rel_tf: dict[str, int] = {}
        for terms, tfs in zip(tbl["terms"].to_pylist(), tbl["tfs"].to_pylist()):
            for t, f in zip(terms, tfs):
                rel_tf[t] = rel_tf.get(t, 0) + int(f)

        orig = sorted(set(self.tokenize(query)))
        orig_set = set(orig)
        cand = [t for t in rel_tf if t not in orig_set]
        dfs = self.df_locals(sorted(cand))
        scored = [
            (t, rel_tf[t] * idf_fn(self.n_docs, d))
            for t, d in dfs.items() if d
        ]
        scored.sort(key=lambda e: (-e[1], e[0]))
        expansion = [t for t, _ in scored[:fb_terms]]

        orig_dfs = self.df_locals(orig)
        w = {t: idf_fn(self.n_docs, d) for t, d in orig_dfs.items()}
        exp_dfs = self.df_locals(expansion)
        w.update({t: beta * idf_fn(self.n_docs, d)
                  for t, d in exp_dfs.items()})
        return self.search_or_terms(
            orig + expansion, k, doc_filter=doc_filter, weights=w)

    def _resolve_filter(self, doc_filter) -> np.ndarray | None:
        """None | precomputed bool mask | ("col", "value") tuple."""
        if doc_filter is None or isinstance(doc_filter, np.ndarray):
            return doc_filter
        col, value = doc_filter
        return self.meta_mask(col, value)

    def _term_infos(
        self, terms: list[str], weights: dict[str, float] | None = None
    ) -> list[tuple[str, float, list[tuple[int, int]]]]:
        """Per term: (term, idf weight, [(shard_idx, row_idx), ...]).
        Global df = sum of per-shard df_local (exact; shards partition
        the doc space). One binary-search probe per (term, shard).
        ``weights`` overrides idf (sharded serving: the router computes
        global idf from the pooled df exchange)."""
        infos = []
        for t in terms:
            locs = []
            df = 0
            for s, sh in enumerate(self.shards):
                if sh is None:
                    continue
                i = sh.find(t)
                if i is not None:
                    locs.append((s, i))
                    df += sh.df_local_at(i)
            if weights is not None:
                w = weights.get(t)
                if w is not None and locs:
                    infos.append((t, w, locs))
            elif df:
                infos.append((t, idf_fn(self.n_docs, df), locs))
        return infos

    # -- exhaustive TAAT ------------------------------------------------------
    def search_taat(
        self, query: str, k: int = 10, weights: dict[str, float] | None = None,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """``doc_filter``: optional search-time metadata restriction —
        ("col", "value") against docmeta, or a precomputed bool mask
        over the doc-id span. Corpus stats (idf, avgdl) stay GLOBAL;
        only result membership is restricted (tombstone semantics)."""
        mask = self._resolve_filter(doc_filter)
        terms = self._query_terms(query)
        acc: dict[int, np.ndarray] = {}  # shard -> local score array
        k1, b = self.params.k1, self.params.b
        for t, w, locs in self._term_infos(terms, weights):
            for s, i in locs:
                sh = self.shards[s]
                ids, part = sh.partial(i, self.block_size, self.doc_len,
                                       k1, b, self.avgdl)
                a = acc.get(s)
                if a is None:
                    a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                    acc[s] = a
                if ids is None:  # dense stopword-term form: one SIMD add
                    a += w * part
                else:
                    a[ids - sh.lo] += w * part
        all_ids, all_scores = [], []
        for s, a in acc.items():
            nz = np.flatnonzero(a)
            all_ids.append(nz + self.shards[s].lo)
            all_scores.append(a[nz])
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        if mask is not None:
            keep = mask[ids.astype(np.int64)]
            ids, scores = ids[keep], scores[keep]
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            live = ~is_tombstoned(self.tombstones, ids.astype(np.int64))
            ids, scores = ids[live], scores[live]
        return rank_topk(ids, scores, k)

    def conjunctive_scores(
        self, terms: list[str], doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Docs containing EVERY term in ``terms`` (AND semantics),
        with their full BM25 scores — the candidate stage of phrase
        search. Same TAAT accumulators as ``search_taat`` plus a
        per-shard presence counter; returns (doc_ids, scores) sorted
        by doc_id. A term absent from the index empties the
        conjunction. Scores are bitwise-identical to ``search_taat``'s
        for the same terms (same partials, same add order). ``weights``
        overrides idf per term (sharded serving's global-df exchange);
        a subset reader given weights still empties the conjunction on
        terms absent from ITS shards — correct per shard, since a doc
        lives wholly in one shard."""
        mask = self._resolve_filter(doc_filter)
        uniq = sorted(set(terms))
        infos = self._term_infos(uniq, weights)
        if len(infos) < len(uniq):  # some term has df == 0
            return np.empty(0, np.int64), np.empty(0, np.float64)
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, np.ndarray] = {}
        k1, b = self.params.k1, self.params.b
        for t, w, locs in infos:
            for s, i in locs:
                sh = self.shards[s]
                ids, part = sh.partial(i, self.block_size, self.doc_len,
                                       k1, b, self.avgdl)
                a = acc.get(s)
                if a is None:
                    a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                    c = np.zeros(sh.hi - sh.lo, dtype=np.int32)
                    acc[s], cnt[s] = a, c
                else:
                    c = cnt[s]
                if ids is None:  # dense stopword form: tf>0 <=> part>0
                    a += w * part
                    c += (part > 0).astype(np.int32)
                else:
                    a[ids - sh.lo] += w * part
                    c[ids - sh.lo] += 1
        all_ids, all_scores = [], []
        need = len(infos)
        for s, a in acc.items():
            hit = np.flatnonzero(cnt[s] == need)
            all_ids.append((hit + self.shards[s].lo).astype(np.int64))
            all_scores.append(a[hit])
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        if mask is not None:
            keep = mask[ids]
            ids, scores = ids[keep], scores[keep]
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            live = ~is_tombstoned(self.tombstones, ids)
            ids, scores = ids[live], scores[live]
        order = np.argsort(ids)
        return ids[order], scores[order]

    # -- boolean / dictionary-expansion queries --------------------------------
    def _mask_and_rank(
        self, ids: np.ndarray, scores: np.ndarray, mask: np.ndarray | None, k: int,
    ) -> list[tuple[int, float]]:
        """Shared tail of the set-producing searches: metadata mask,
        tombstone filter, deterministic (score desc, doc_id asc) top-k."""
        if mask is not None:
            keep = mask[ids.astype(np.int64)]
            ids, scores = ids[keep], scores[keep]
        if len(self.tombstones):
            from .maintenance import is_tombstoned

            live = ~is_tombstoned(self.tombstones, ids.astype(np.int64))
            ids, scores = ids[live], scores[live]
        return rank_topk(ids, scores, k)

    def search_or_terms(
        self, terms: list[str], k: int = 10, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """OR-of-terms BM25 top-k over an EXPLICIT term list (already
        normalized — no tokenization). The scoring tail of the
        dictionary-expansion queries (prefix/fuzzy): every term scores
        with its own idf, docs rank by the sum over their matching
        terms. Identical accumulators to ``search_taat`` (sorted-term
        float64 add order). ``weights`` overrides idf per term (sharded
        serving's global-df exchange, as in search_taat)."""
        mask = self._resolve_filter(doc_filter)
        uniq = sorted(set(terms))
        acc: dict[int, np.ndarray] = {}
        k1, b = self.params.k1, self.params.b
        for t, w, locs in self._term_infos(uniq, weights):
            for s, i in locs:
                sh = self.shards[s]
                ids, part = sh.partial(i, self.block_size, self.doc_len,
                                       k1, b, self.avgdl)
                a = acc.get(s)
                if a is None:
                    a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                    acc[s] = a
                if ids is None:
                    a += w * part
                else:
                    a[ids - sh.lo] += w * part
        all_ids, all_scores = [], []
        for s, a in acc.items():
            nz = np.flatnonzero(a)
            all_ids.append((nz + self.shards[s].lo).astype(np.int64))
            all_scores.append(a[nz])
        if not all_ids:
            return []
        return self._mask_and_rank(
            np.concatenate(all_ids), np.concatenate(all_scores), mask, k,
        )

    def search_boolean(
        self, must: str = "", should: str = "", must_not: str = "",
        k: int = 10, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Boolean-clause retrieval (the Lucene BooleanQuery shape over
        this index): a doc is a candidate iff it contains EVERY must
        term and NO must_not term; with no must terms, any doc matching
        at least one should term. Candidates are ranked by the BM25 sum
        over the DISTINCT (must ∪ should) terms they contain — must_not
        only excludes, never scores. One pass over the involved terms'
        partials: a score accumulator plus a must-presence counter plus
        an exclusion flag per shard, all O(shard span) dense arrays —
        no per-doc python, no sets of doc ids.

        ``weights`` overrides idf for the SCORE terms (sharded serving:
        the router's df exchange supplies exact global idf); presence /
        exclusion are df-independent and stay local — a doc lives in
        exactly one shard, so per-reader must/not checks compose
        exactly under scatter-gather."""
        mask = self._resolve_filter(doc_filter)
        must_t = sorted(set(self.tokenize(must)))
        score_t = sorted(set(self.tokenize(must)) | set(self.tokenize(should)))
        not_t = sorted(set(self.tokenize(must_not)))
        if not score_t:
            return []
        infos_must = self._term_infos(must_t)
        if len(infos_must) < len(must_t):  # a must term has df == 0
            return []
        k1, b = self.params.k1, self.params.b

        def _accumulate(term_list, update, w_override=None):
            for t, w, locs in self._term_infos(term_list, w_override):
                for s, i in locs:
                    sh = self.shards[s]
                    ids, part = sh.partial(i, self.block_size, self.doc_len,
                                           k1, b, self.avgdl)
                    update(s, sh, ids, part, w)

        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, np.ndarray] = {}
        exc: dict[int, np.ndarray] = {}

        def upd_score(s, sh, ids, part, w):
            a = acc.get(s)
            if a is None:
                a = np.zeros(sh.hi - sh.lo, dtype=np.float64)
                acc[s] = a
            if ids is None:
                a += w * part
            else:
                a[ids - sh.lo] += w * part

        def upd_count(s, sh, ids, part, w):
            c = cnt.get(s)
            if c is None:
                c = np.zeros(sh.hi - sh.lo, dtype=np.int32)
                cnt[s] = c
            if ids is None:
                c += (part > 0).astype(np.int32)
            else:
                c[ids - sh.lo] += 1

        def upd_excl(s, sh, ids, part, w):
            e = exc.get(s)
            if e is None:
                e = np.zeros(sh.hi - sh.lo, dtype=bool)
                exc[s] = e
            if ids is None:
                e |= part > 0
            else:
                e[ids - sh.lo] = True

        _accumulate(score_t, upd_score, weights)
        if must_t:
            _accumulate(must_t, upd_count)
        if not_t:
            _accumulate(not_t, upd_excl)

        n_must = len(must_t)
        all_ids, all_scores = [], []
        for s, a in acc.items():
            if must_t:
                c = cnt.get(s)
                if c is None:
                    continue
                sel = c == n_must
            else:
                sel = a > 0
            e = exc.get(s)
            if e is not None:
                sel = sel & ~e
            nz = np.flatnonzero(sel)
            all_ids.append((nz + self.shards[s].lo).astype(np.int64))
            all_scores.append(a[nz])
        if not all_ids:
            return []
        return self._mask_and_rank(
            np.concatenate(all_ids), np.concatenate(all_scores), mask, k,
        )

    def expand_prefix(self, prefix: str, max_expansions: int = 64) -> list[str]:
        """Dictionary terms starting with ``prefix``: per shard, one
        binary search on the C-sorted term column finds the range start,
        then a contiguous forward scan collects matches (prefix matches
        ARE contiguous under lexicographic order). Union across owned
        shards, sorted ascending, capped at the lexicographically first
        ``max_expansions`` — a deterministic cap (Lucene's
        max_expansions contract), mirrored by the oracle's
        ``ORDER BY term LIMIT n``. Cost: O(log V + matches) per shard —
        never a vocabulary scan."""
        out: set[str] = set()
        for sh in self.shards:
            if sh is None or sh._terms is None:
                continue
            arr = sh._terms
            lo, hi = 0, len(arr)
            while lo < hi:  # leftmost term >= prefix
                mid = (lo + hi) // 2
                if arr[mid].as_py() < prefix:
                    lo = mid + 1
                else:
                    hi = mid
            j = lo
            while j < len(arr):
                v = arr[j].as_py()
                if not v.startswith(prefix):
                    break
                out.add(v)
                j += 1
        return sorted(out)[:max_expansions]

    def search_prefix(
        self, prefix: str, k: int = 10, max_expansions: int = 64, doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Prefix (leading-wildcard ``pre*``) retrieval: expand against
        the term dictionary, then OR-score the expansions — each
        expanded term contributes with its own idf (rare completions
        outrank stopword-ish ones)."""
        toks = self.tokenize(prefix)
        if not toks:
            return []
        terms = self.expand_prefix(toks[0], max_expansions)
        return self.search_or_terms(terms, k, doc_filter) if terms else []

    def expand_wildcard(
        self, pattern: str, max_expansions: int = 64,
    ) -> list[str]:
        """Dictionary terms matching a ``*``-wildcard pattern (the
        Lucene WildcardQuery shape: ``foo*``, ``*bar``, ``fo*ar``,
        ``*mid*``). The literal prefix before the first ``*`` prunes to
        one contiguous dictionary range (binary search, as in
        expand_prefix); the full pattern is then checked with one
        compiled anchored regex. A leading ``*`` with a literal TAIL
        (``*bar``, ``*mi*ar``) prunes the same way against the
        per-shard REVERSED-term dictionary (built lazily, see
        ``_ShardIndex.rev_terms``) — the suffix becomes a contiguous
        prefix range on reversed terms, so neither anchored variant
        ever scans the vocabulary. Only the doubly-open ``*mid*``
        shape remains a scan (exact; the production answer for infix
        at web scale is a term n-gram index, out of scope here).
        Sorted + capped like expand_prefix (mirrored by the oracle's
        ORDER BY/LIMIT)."""
        import re as _re

        pattern = pattern.lower()
        pfx = pattern.split("*", 1)[0]
        sfx = pattern.rsplit("*", 1)[-1] if "*" in pattern else ""
        rx = _re.compile(
            ".*".join(_re.escape(p) for p in pattern.split("*")) + r"\Z")
        out: set[str] = set()
        for sh in self.shards:
            if sh is None or sh._terms is None:
                continue
            if pfx:
                arr = sh._terms
                probe, flip = pfx, False
            elif sfx:
                arr = sh.rev_terms()
                probe, flip = sfx[::-1], True
            else:
                arr = sh._terms
                probe, flip = "", False
            if probe:
                lo, hi = 0, len(arr)
                while lo < hi:
                    mid = (lo + hi) // 2
                    if arr[mid].as_py() < probe:
                        lo = mid + 1
                    else:
                        hi = mid
                j = lo
                while j < len(arr):
                    v = arr[j].as_py()
                    if not v.startswith(probe):
                        break
                    w = v[::-1] if flip else v
                    if rx.match(w):
                        out.add(w)
                    j += 1
            else:
                for j in range(len(arr)):
                    v = arr[j].as_py()
                    if rx.match(v):
                        out.add(v)
        return sorted(out)[:max_expansions]

    def search_wildcard(
        self, pattern: str, k: int = 10, max_expansions: int = 64,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Wildcard retrieval: expand the pattern against the term
        dictionary, OR-score the expansions with per-term idf (same
        scoring tail as prefix/fuzzy). The pattern is lowercased, NOT
        tokenized (the tokenizer would split on ``*``)."""
        terms = self.expand_wildcard(pattern, max_expansions)
        return self.search_or_terms(terms, k, doc_filter) if terms else []

    def expand_regex(self, pattern: str, max_expansions: int = 64) -> list[str]:
        """Dictionary terms fully matching a regular expression (the
        Lucene RegexpQuery shape). The pattern's LITERAL PREFIX — the
        chars before its first regex metacharacter, dropping the last
        one when a quantifier follows it (``so*rt`` pins only ``s``:
        the ``o`` is optional) — prunes the probe to one contiguous
        dictionary range exactly as in ``expand_prefix``; a pattern
        with no literal prefix (class or alternation head, e.g.
        ``[sb]ort``) degrades to a dictionary scan (exact; the
        production answer at web scale is the same term n-gram index
        that doubly-open wildcard infix needs). Anchored full-match
        semantics (``re.fullmatch``), sorted + capped like
        ``expand_prefix`` (mirrored by the oracle's ORDER BY/LIMIT)."""
        import re as _re

        pattern = pattern.lower()
        rx = _re.compile(pattern)
        meta = set(".^$*+?()[]{}|\\")
        lit: list[str] = []
        for ch in pattern:
            if ch in meta:
                break
            lit.append(ch)
        if len(lit) < len(pattern) and pattern[len(lit)] in "*+?{" and lit:
            lit.pop()  # quantifier binds the previous atom
        pfx = "".join(lit)
        out: set[str] = set()
        for sh in self.shards:
            if sh is None or sh._terms is None:
                continue
            arr = sh._terms
            if pfx:
                lo, hi = 0, len(arr)
                while lo < hi:
                    mid = (lo + hi) // 2
                    if arr[mid].as_py() < pfx:
                        lo = mid + 1
                    else:
                        hi = mid
                j = lo
                while j < len(arr):
                    v = arr[j].as_py()
                    if not v.startswith(pfx):
                        break
                    if rx.fullmatch(v):
                        out.add(v)
                    j += 1
            else:
                for j in range(len(arr)):
                    v = arr[j].as_py()
                    if rx.fullmatch(v):
                        out.add(v)
        return sorted(out)[:max_expansions]

    def search_regex(
        self, pattern: str, k: int = 10, max_expansions: int = 64,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Regex retrieval: expand the pattern against the term
        dictionary (anchored full match), OR-score the expansions with
        per-term idf — the same scoring tail as prefix/wildcard/fuzzy.
        The pattern is lowercased, NOT tokenized (the tokenizer would
        strip regex metacharacters)."""
        terms = self.expand_regex(pattern, max_expansions)
        return self.search_or_terms(terms, k, doc_filter) if terms else []

    def search_boosted(
        self, query: str, k: int = 10, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Query-time term boosting (Lucene ``term^2.5`` clause
        syntax, see ``parse_boosted_query``): each term scores with
        boost·idf through the weighted OR path, so an all-1.0 query
        reproduces ``search_taat`` bitwise (float multiply by 1.0 is
        exact) and a boosted out-of-vocabulary term contributes
        nothing. ``weights`` overrides the BASE idf per term (sharded
        serving's global-df exchange); boosts multiply on top."""
        boosts = parse_boosted_query(query, self.tokenize)
        if not boosts:
            return []
        terms = sorted(boosts)
        if weights is None:
            weights = {t: w for t, w, _ in self._term_infos(terms)}
        w = {t: boosts[t] * weights[t] for t in terms if t in weights}
        return self.search_or_terms(sorted(w), k, doc_filter, weights=w) \
            if w else []

    def expand_fuzzy(
        self, word: str, max_edits: int = 1, prefix_len: int = 1,
        max_expansions: int = 64,
    ) -> list[str]:
        """Dictionary terms within ``max_edits`` Levenshtein edits of
        ``word`` whose first ``prefix_len`` chars match (the standard
        FuzzyQuery prefix_length pruning — candidates live in ONE
        contiguous dictionary range, found by the prefix binary search;
        ``prefix_len=0`` degrades to a full dictionary scan and is for
        small vocabularies only). Within the range, a cheap
        |len| <= max_edits prefilter runs before the banded edit-distance
        check. Sorted + capped like ``expand_prefix``."""
        out: set[str] = set()
        wl = len(word)
        pfx = word[:prefix_len]
        for sh in self.shards:
            if sh is None or sh._terms is None:
                continue
            arr = sh._terms
            if prefix_len > 0:
                lo, hi = 0, len(arr)
                while lo < hi:
                    mid = (lo + hi) // 2
                    if arr[mid].as_py() < pfx:
                        lo = mid + 1
                    else:
                        hi = mid
                j = lo
                while j < len(arr):
                    v = arr[j].as_py()
                    if not v.startswith(pfx):
                        break
                    if v not in out and abs(len(v) - wl) <= max_edits \
                            and _levenshtein_leq(v, word, max_edits):
                        out.add(v)
                    j += 1
            else:
                for j in range(len(arr)):
                    v = arr[j].as_py()
                    if v not in out and abs(len(v) - wl) <= max_edits \
                            and _levenshtein_leq(v, word, max_edits):
                        out.add(v)
        return sorted(out)[:max_expansions]

    def search_fuzzy(
        self, word: str, k: int = 10, max_edits: int = 1, prefix_len: int = 1,
        max_expansions: int = 64, doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Fuzzy (edit-distance) retrieval: expand ``word`` against the
        dictionary within ``max_edits`` Levenshtein edits (first
        ``prefix_len`` chars pinned), then OR-score the expansions with
        per-term idf — an exact vocabulary term ranks its own postings
        first because rarer variants carry higher idf, the
        tolerant-retrieval behaviour misspelled queries need."""
        toks = self.tokenize(word)
        if not toks:
            return []
        terms = self.expand_fuzzy(toks[0], max_edits, prefix_len, max_expansions)
        return self.search_or_terms(terms, k, doc_filter) if terms else []

    def search_page(
        self, query: str, k: int = 10, offset: int = 0, algo: str = "bmw",
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        """Deterministic deep paging: ranks offset+1..offset+k of the
        (score desc, doc_id asc) total order — fetch top-(offset+k)
        and slice, the standard exact form (the total order makes a
        page stable across calls; cursor/search_after is the same slice
        keyed by the last (score, doc_id) seen)."""
        hits = getattr(self, f"search_{algo}")(
            query, k + offset, doc_filter=doc_filter)
        return hits[offset : offset + k]

    def search_synonym(
        self, query: str, k: int = 10, doc_filter=None,
        weights: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Query-time synonym expansion (frozen ``flagship.SYNONYMS``
        map, one hop — expansions never chain): widen the tokenized
        query with each term's synonyms, OR-score the set with
        per-term idf. Out-of-vocabulary expansions have no postings
        and contribute nothing — the SynonymGraphFilter-at-query-time
        contract."""
        from .flagship import SYNONYMS

        toks = self.tokenize(query)
        if not toks:
            return []
        terms = sorted(set(toks) | {s for t in toks for s in SYNONYMS.get(t, ())})
        return self.search_or_terms(terms, k, doc_filter, weights=weights)

    # -- block-max WAND (vectorized block-at-a-time variant) ------------------
    def search_bmw(
        self, query: str, k: int = 10, weights: dict[str, float] | None = None,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
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
        infos = self._term_infos(terms, weights)
        if len(infos) <= 1:
            # single-term: no WAND pruning exists (one cursor), and on
            # flat tf distributions block-max skipping degenerates to a
            # per-block python loop — the canonical fast path is one
            # vectorized exhaustive scan (bitwise-identical scores)
            return self.search_taat(query, k, weights, doc_filter=doc_filter)
        # dense-query dispatch: when EVERY term is stopword-like (df
        # over this reader's shards >= dense_query_cutoff of its doc
        # span), nearly every doc matches every term, block-max tables
        # are flat, and no window's upper bound ever drops below the
        # heap threshold — BMW then pays its per-window bookkeeping on
        # top of a full decode. The vectorized exhaustive scan wins
        # (and is bitwise rank/score-identical by construction; with
        # one selective term present, WAND's skipping stays worth it).
        owned_docs = sum(sh.hi - sh.lo for sh in self.shards if sh is not None)
        cutoff = self.dense_query_cutoff * max(1, owned_docs)
        if all(
            sum(self.shards[s].df_local_at(i) for s, i in locs) >= cutoff
            for _, _, locs in infos
        ):
            return self.search_taat(query, k, weights, doc_filter=doc_filter)
        # masking only WITHHOLDS docs from the heap: window upper
        # bounds stay valid (they over-estimate the filtered subset),
        # so pruning remains admissible — just less tight (theta grows
        # from filtered survivors only). Scores of survivors are
        # accumulated identically, hence still bitwise == search_taat.
        mask = self._resolve_filter(doc_filter)
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        for s, sh in enumerate(self.shards):
            if sh is None:
                continue
            cursors = [
                _BlockCursor(t, w, sh.row(i), self.block_size)
                for (t, w, locs) in infos
                for (ss, i) in locs
                if ss == s
            ]  # infos follow sorted `terms` -> cursors stay term-sorted
            self._bmw_shard(sh, cursors, k, heap, mask)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))[:k]
        return [(-negid, score) for score, negid in out]

    def _bmw_shard(self, sh: _ShardIndex, cursors: list["_BlockCursor"], k: int,
                   heap: list[tuple[float, int]],
                   mask: np.ndarray | None = None) -> None:
        if not cursors:
            return
        k1, b = self.params.k1, self.params.b
        avgdl = self.avgdl
        doc_len = self.doc_len

        stride = 1  # adaptive window width in blocks of the min cursor:
        # doubles while windows keep being scored (pruning ineffective ->
        # amortize the python loop), resets to 1 after a skip (pruning
        # effective -> keep block-granular skipping)
        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                return
            theta = heap[0][0] if len(heap) >= k else -np.inf
            if sum(c.max_score for c in live) <= theta:
                return  # no remaining doc in this shard can beat theta
            cmin = min(live, key=lambda c: c.cur_block_last())
            j = min(cmin.bi + stride - 1, cmin.nblocks - 1)
            window_end = int(cmin.block_last[j])
            ub = sum(c.window_max(window_end) for c in live)
            if ub <= theta:
                # skip: nothing in (floor, window_end] can make top-k
                for c in live:
                    c.skip_to(window_end)
                stride = 1
                continue
            stride = min(stride * 2, 64)
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
                if mask is not None:  # filtered-out docs never enter the heap
                    keepm = mask[all_ids.astype(np.int64)]
                    all_ids, scores = all_ids[keepm], scores[keepm]
                if len(self.tombstones):  # deleted docs never enter the heap
                    from .maintenance import is_tombstoned

                    live = ~is_tombstoned(
                        self.tombstones, all_ids.astype(np.int64)
                    )
                    all_ids, scores = all_ids[live], scores[live]
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
    """Posting cursor over one term's blocks: skip pointers + per-block
    score bounds come from the block metadata (no decode needed to
    skip); the posting payload is bulk-decoded lazily in one vectorized
    pass on first contact (decode_all_blocks), after which window
    slices are searchsorted views."""

    __slots__ = ("term", "weight", "row", "block_last", "bmax", "nblocks",
                 "bi", "floor", "pos", "ids", "tfs", "bs", "max_score")

    def __init__(self, term: str, weight: float, row: dict, block_size: int):
        self.term = term
        self.weight = weight
        self.row = row
        self.bs = block_size
        self.block_last = np.asarray(row["block_last_doc"], dtype=np.uint64)
        self.bmax = np.asarray(row["block_max_partial"], dtype=np.float64)
        self.nblocks = len(self.block_last)
        self.bi = 0  # first block whose last doc exceeds `floor`
        self.floor = -1  # docs <= floor are pruned/consumed
        self.pos = 0  # decoded-array position (valid once decoded)
        self.ids = None
        self.tfs = None
        self.max_score = weight * row["max_partial"]

    @property
    def exhausted(self) -> bool:
        return self.bi >= self.nblocks

    def cur_block_last(self) -> int:
        return int(self.block_last[self.bi])

    def cur_block_max(self) -> float:
        return self.weight * float(self.bmax[self.bi])

    def window_max(self, window_end: int) -> float:
        """Upper bound of this term's partial over docs in
        (floor, window_end] — max block_max over the touched blocks
        (conservatively includes the current block even when it only
        partially overlaps)."""
        if self.exhausted:
            return 0.0
        bl = self.block_last
        bi = self.bi
        if bl[bi] >= window_end:
            return self.weight * float(self.bmax[bi])
        j = int(np.searchsorted(bl, np.uint64(window_end), side="left"))
        j = min(j, self.nblocks - 1)
        return self.weight * float(self.bmax[bi: j + 1].max())

    def skip_to(self, boundary: int) -> None:
        """Prune all docs <= boundary — block-metadata only, O(log nb),
        the payload of fully-skipped cursors is never decoded."""
        if boundary > self.floor:
            self.floor = boundary
            if self.ids is not None:
                self.pos = max(
                    self.pos,
                    int(np.searchsorted(self.ids, np.uint64(boundary), side="right")),
                )
            if not self.exhausted and self.block_last[self.bi] <= boundary:
                self.bi = int(
                    np.searchsorted(self.block_last, np.uint64(boundary), side="right")
                )

    def take_upto(self, boundary: int) -> tuple[np.ndarray, np.ndarray]:
        """Consume and return (ids, tfs) views with floor < doc <=
        boundary."""
        if self.exhausted:
            return _EMPTY_U64, _EMPTY_U64
        if self.ids is None:
            self.ids, self.tfs = decode_all_blocks(self.row, self.bs)
            self.pos = int(
                np.searchsorted(self.ids, np.uint64(max(self.floor, 0)), side="right")
            ) if self.floor >= 0 else 0
        start = self.pos
        end = int(np.searchsorted(self.ids, np.uint64(boundary), side="right"))
        out = (self.ids[start:end], self.tfs[start:end])
        self.pos = end
        self.skip_to(boundary)
        return out


_EMPTY_U64 = np.empty(0, dtype=np.uint64)


class QueryScorer:
    """Actor-pool callable: batch of (qid, query) -> top-k rows.

    Usage: ``queries_ds.map_batches(QueryScorer,
    fn_constructor_kwargs={"index_dir": ..., "k": 10},
    batch_format="pandas", concurrency=N)``.

    ``reader_ref`` (an ``ray.ObjectRef`` of an already-loaded
    ``IndexReader``, from ``ray.put(IndexReader(index_dir))``; the
    caller must keep the ref alive until the pool finishes) makes
    pool startup O(1)
    per actor instead of each actor re-reading + re-decompressing the
    whole index from parquet: the driver (or any one task) loads once,
    ``ray.put``s it, and every actor gets zero-copy plasma-backed
    views of the numpy/Arrow state — one physical copy per NODE, which
    is exactly the cluster-scale layout (each node's object store
    holds the index once, all its scorer actors share it).
    """

    def __init__(
        self,
        index_dir: str | None = None,
        k: int = 10,
        algo: str = "taat",
        reader_ref=None,
        doc_filter=None,
        fb_docs: int = 5,
        fb_terms: int = 8,
        beta: float = 0.5,
    ):
        if reader_ref is not None:
            import ray as _ray

            self.reader = _ray.get(reader_ref)
        else:
            self.reader = IndexReader(index_dir)
        self.k = k
        self.algo = algo
        self.fb_docs, self.fb_terms, self.beta = fb_docs, fb_terms, beta
        # resolve ("col", value) -> mask ONCE per actor, not per batch
        # (the plasma-shared reader's mask cache is per-actor local)
        self.doc_filter = (
            self.reader._resolve_filter(doc_filter) if doc_filter is not None else None
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.algo == "prf":
            def search(query, k, doc_filter=None):
                return self.reader.search_prf(
                    query, k, fb_docs=self.fb_docs, fb_terms=self.fb_terms,
                    beta=self.beta, doc_filter=doc_filter)
        else:
            search = (
                self.reader.search_bmw if self.algo == "bmw"
                else self.reader.search_taat
            )
        out = {"qid": [], "rank": [], "doc_id": [], "score": []}
        for qid, query in zip(batch["qid"], batch["query"]):
            for rank, (doc, score) in enumerate(
                search(query, self.k, doc_filter=self.doc_filter), start=1
            ):
                out["qid"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(doc)
                out["score"].append(score)
        # explicit dtypes: an all-empty batch must emit the SAME schema
        # as a non-empty one (pandas infers float64 for empty lists,
        # which makes Ray warn about mixed block schemas downstream)
        return pd.DataFrame(
            {
                "qid": pd.Series(out["qid"], dtype="int64"),
                "rank": pd.Series(out["rank"], dtype="int64"),
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "score": pd.Series(out["score"], dtype="float64"),
            }
        )


def hydrate_hits(hits_df: pd.DataFrame, index_dir: str) -> pd.DataFrame:
    """Join top-k hits with document metadata (the reference's
    per-hit SQLite lookup, server.py:165 + db.py:393-397, re-expressed
    as ONE pushdown semi-join against docmeta).

    The tiny hit doc_id set drives the read, pruning twice:

    1. **partition prune** — docmeta is hive-partitioned by shard; only
       the hit doc_ids' shard directories are even opened (shard =
       searchsorted(shard_bounds, doc_id)), so at 10^12 docs a 10-hit
       hydration touches k directories, not the whole table;
    2. **row-group prune** — within those files a
       ``field("doc_id").isin(hit_ids)`` predicate is pushed to the
       parquet reader, which skips row groups whose min/max statistics
       exclude every hit.

    Nothing docmeta-sized ever reaches the driver
    (tests/test_build_query.py::test_hydration_reads_only_hit_shards
    proves non-hit shards are never read)."""
    import pyarrow.dataset as pads

    docmeta_dir = os.path.join(index_dir, "docmeta")
    ids = np.unique(hits_df["doc_id"].to_numpy()).astype(np.int64) if len(hits_df) else np.empty(0, np.int64)

    stats_path = os.path.join(index_dir, "stats.json")
    files: list[str] = []
    if os.path.exists(stats_path) and len(ids):
        from .build import make_shard_of

        with open(stats_path) as f:
            bounds = json.load(f)["shard_bounds"]
        hit_shards = np.unique(make_shard_of(bounds)(ids))
        for s in hit_shards:
            files.extend(
                sorted(glob.glob(os.path.join(docmeta_dir, f"shard={int(s)}", "*.parquet")))
            )
    if not files:  # legacy non-partitioned layout, or schema-only (0 hits)
        files = sorted(
            glob.glob(os.path.join(docmeta_dir, "**", "*.parquet"), recursive=True)
        )
        if not files:
            return hits_df
        if not len(ids):  # 0 hits: one row-group-pruned read just for schema
            files = files[:1]

    tbl = pads.dataset(files, format="parquet").to_table(
        filter=pads.field("doc_id").isin(ids)
    )
    meta = tbl.to_pandas()
    meta["content_sha256"] = meta["content_sha256"].map(
        lambda b: bytes(b).hex() if b is not None else None
    )
    return hits_df.merge(meta, on="doc_id", how="left")
