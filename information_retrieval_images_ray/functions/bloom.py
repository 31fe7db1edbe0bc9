"""Deterministic Bloom filter over uint64 keys (numpy-vectorized).

The scale path for membership sets that outgrow a plain broadcast
array: the dedup keep-set filter in ``pipelines/build.py`` switches to
this once the survivor-id set passes ``dedup_broadcast_max``. Standard
double hashing (Kirsch & Mitzenmacher 2006): k probe positions
``(h1 + i*h2) mod m`` from two splitmix64-style mixes of the key — no
salted python ``hash()``, so filters are process-independent and the
same build is reproducible across runs/workers.

Semantics: NO false negatives (every added key tests positive), false
positives at ~``fp_rate``. For the dedup keep-set a false positive
KEEPS a duplicate document (never drops a survivor) — the conservative
failure mode; the expected leak is ``fp_rate * n_non_survivors`` and is
logged + recorded in the manifest, never silent.
"""

from __future__ import annotations

import math

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (wraps mod 2^64)."""
    with np.errstate(over="ignore"):
        x = x + _C1
        x = (x ^ (x >> np.uint64(30))) * _C2
        x = (x ^ (x >> np.uint64(27))) * _C3
        return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Bit-array Bloom filter sized for ``n_items`` at ``fp_rate``."""

    def __init__(self, n_items: int, fp_rate: float = 1e-4):
        n = max(1, int(n_items))
        ln2 = math.log(2.0)
        self.m = max(64, int(math.ceil(-n * math.log(fp_rate) / (ln2 * ln2))))
        self.k = max(1, round(self.m / n * ln2))
        self.n_items = n
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray, i: int) -> np.ndarray:
        h1 = _mix(keys.astype(np.uint64))
        h2 = _mix(keys.astype(np.uint64) ^ _C1) | np.uint64(1)  # odd stride
        with np.errstate(over="ignore"):
            return ((h1 + np.uint64(i) * h2) % np.uint64(self.m)).astype(np.uint64)

    def add_many(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        for i in range(self.k):
            pos = self._positions(keys, i)
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool array (no false negatives)."""
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            pos = self._positions(keys, i)
            byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            out &= (byte & bit) != 0
        return out

    def expected_fp(self) -> float:
        """Analytic false-positive probability at the sized load."""
        return (1.0 - math.exp(-self.k * self.n_items / self.m)) ** self.k
