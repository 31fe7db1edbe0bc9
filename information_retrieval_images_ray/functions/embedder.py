"""Deterministic text embedding: hashed-n-gram feature hashing with a
signed projection — the dependency-free, public-knowledge analogue of
the reference's learned query/document embedder (reference embeds query
TEXT at search time, server.py:135-140 -> embeddings.py:12-31; here the
same text-in -> unit-vector-out contract runs without any model).

Method (all classic, published techniques):
- features = word unigrams + character trigrams of the lowercased text
  (char n-grams give typo/morphology robustness, word units carry
  topical signal — the fastText recipe, Bojanowski et al. 2017).
- feature hashing ("the hashing trick", Weinberger et al., ICML 2009):
  each feature f maps to bucket ``h(f) mod dim`` with sign
  ``(-1)^bit(h(f))`` — the signed hash makes collisions cancel in
  expectation instead of biasing counts.
- L2-normalize, so dot product == cosine and the vectors drop straight
  into the engine's IVF / brute-force cosine machinery.

Hashes are md5-based (functions.hashing.md5_u64): stable across
processes, machines and Python versions — the same text embeds to the
same vector on every node of the cluster, which is the property that
lets the SERVER embed query text and match an index built by a
distributed pipeline.
"""

from __future__ import annotations

import numpy as np

from .hashing import md5_u64


class HashedNgramEmbedder:
    """Stateless-after-init text embedder. ``dim`` must match the
    vector index it is used against; ``seed`` namespaces the hash so
    two embedders with different seeds are incompatible by design."""

    def __init__(self, dim: int = 64, seed: int = 0, char_n: int = 3):
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.dim = int(dim)
        self.seed = int(seed)
        self.char_n = int(char_n)

    def _features(self, text: str) -> list[str]:
        t = " ".join((text or "").lower().split())
        feats = [f"w\x00{w}" for w in t.split()]
        n = self.char_n
        if len(t) >= n:
            feats.extend(f"c\x00{t[i:i + n]}" for i in range(len(t) - n + 1))
        return feats

    def embed(self, texts) -> np.ndarray:
        """(n_texts, dim) float64, each row L2-normalized (zero vector
        for empty/whitespace text)."""
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            feats = self._features(text)
            if not feats:
                continue
            hs = np.fromiter(
                (md5_u64(f"{self.seed}\x00{f}") for f in feats),
                dtype=np.uint64, count=len(feats),
            )
            idx = (hs % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((hs >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
            np.add.at(out[i], idx, sign)
            nrm = float(np.linalg.norm(out[i]))
            if nrm > 0:
                out[i] /= nrm
        return out

    def config(self) -> dict:
        return {"kind": "hashed_ngram", "dim": self.dim,
                "seed": self.seed, "char_n": self.char_n}
