"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich
et al. 2016) — the vocabulary-learning step of a training-data
pipeline, run the scale-correct way:

- **Stage 1 (distributed, the only corpus pass):** fold the token
  stream into a (word, count) table — per-batch ``Counter`` combiners,
  one ``groupby(word).sum`` exchange. The table is bounded by the WORD
  VOCABULARY, not the corpus: at 100 TB the corpus has ~10^13 token
  occurrences but ~10^7-10^8 distinct words, so everything after this
  aggregate runs over a table ~10^5× smaller than the input. This is
  the same shape HuggingFace ``tokenizers`` trains from (word counts,
  not raw text).
- **Stage 2 (merge loop over the aggregated table):** classic BPE —
  count adjacent symbol pairs weighted by word frequency, merge the
  most frequent pair (ties: lexicographically smallest pair, so the
  learned vocabulary is deterministic), repeat. Runs on the driver
  over the bounded table with an incremental pair-count update (only
  words containing the merged pair are re-counted). At 10^9+ distinct
  words this loop would move to keyed distributed rounds (one
  pair-count combiner pass per merge) — that seam is the per-word
  independence of the re-count, noted here by design.

Merges operate on IN-WORD adjacent pairs only (no word-end marker — a
standard variant; tokens never merge across word boundaries because
stage 1 already split words). ``bpe_pair_counts`` — the loop's first
iteration — is the SQL-oracled surface (``q_bpe_pair_counts``): pure
integer counts, mirrored by an unnest-positions self-substring in
DuckDB.

Reference provenance: the reference tokenizes captions with a
pretrained HF tokenizer (/root/reference/embeddings.py:12-31); here
the tokenizer itself is learned from the corpus, which is what a
from-scratch 100-TB training-data pipeline must do.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .analysis import _tok_fn


def word_counts(
    ds: ray.data.Dataset, tokenizer: str = "simple"
) -> ray.data.Dataset:
    """(word, n) occurrence counts — per-batch Counter combiner, one
    groupby sum. The ONLY stage that sees the full corpus."""
    tok = _tok_fn(tokenizer)

    def fn(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(tok(text or ""))
        keys = sorted(c)
        return pa.table({
            "word": pa.array(keys, pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        })

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def bpe_pair_counts(
    ds: ray.data.Dataset, tokenizer: str = "simple"
) -> ray.data.Dataset:
    """Adjacent character-pair counts weighted by occurrence — the
    first iteration of the BPE merge loop, computed fully distributed
    (per-batch pair Counter, one groupby sum) and integer-exact for
    the SQL oracle."""
    tok = _tok_fn(tokenizer)

    def fn(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            for w in tok(text or ""):
                for i in range(len(w) - 1):
                    c[w[i : i + 2]] += 1
        keys = sorted(c)
        return pa.table({
            "pair": pa.array(keys, pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        })

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
    )


def _pair_counter(syms: dict[str, list[str]], wc: dict[str, int]) -> Counter:
    c: Counter = Counter()
    for w, s in syms.items():
        n = wc[w]
        for a, b in zip(s, s[1:]):
            c[(a, b)] += n
    return c


def learn_bpe(
    ds: ray.data.Dataset, num_merges: int, tokenizer: str = "simple"
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Deterministic:
    ties in pair frequency break to the lexicographically smallest
    (left, right) pair. Returns merges in learned order."""
    wc_df = word_counts(ds, tokenizer).to_pandas()
    wc = {str(w): int(n) for w, n in zip(wc_df["word"], wc_df["n"])}
    syms = {w: list(w) for w in wc}
    pairs = _pair_counter(syms, wc)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        # incremental update: only words containing the pair change
        for w, s in syms.items():
            if len(s) < 2:
                continue
            out, i, changed = [], 0, False
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(s[i])
                    i += 1
            if changed:
                n = wc[w]
                for a, b in zip(s, s[1:]):
                    pairs[(a, b)] -= n
                    if pairs[(a, b)] <= 0:
                        del pairs[(a, b)]
                for a, b in zip(out, out[1:]):
                    pairs[(a, b)] += n
                syms[w] = out
    return merges


def encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in learned-rank order (the standard
    greedy BPE encode)."""
    s = list(w)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(s, s[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


class BPEEncoder:
    """Actor-pool encode stage: the merge table (tiny) ships once per
    actor in ``__init__``; ``__call__`` encodes each doc and emits its
    BPE token count next to its char-token count. Per-word results are
    memoized across the actor's batches (the vocabulary is Zipfian, so
    the cache hit rate approaches 1)."""

    def __init__(self, merges: list[tuple[str, str]], tokenizer: str = "simple"):
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._tok = _tok_fn(tokenizer)
        self._cache: dict[str, int] = {}

    def _n_pieces(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = len(encode_word(w, self._ranks))
            self._cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bpe, n_char = [], []
        for text in batch["text"].to_pylist():
            words = self._tok(text or "")
            n_bpe.append(sum(self._n_pieces(w) for w in words))
            n_char.append(sum(len(w) for w in words))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_pieces": pa.array(n_bpe, pa.int64()),
            "n_chars": pa.array(n_char, pa.int64()),
        })


def encode_pipeline(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    tokenizer: str = "simple",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Per-doc BPE piece counts with the learned merges — the
    compression-ratio surface (n_bpe_pieces / n_chars falls as merges
    grow)."""
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={"merges": merges, "tokenizer": tokenizer},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
