"""Count-min sketch: register exactness, merge associativity across
partitionings, and the overestimate guarantee."""

from collections import Counter

import pytest
import ray.data

from information_retrieval_images_ray.functions.hashing import md5_u64
from information_retrieval_images_ray.functions.tokenizer import tokenize_simple
from information_retrieval_images_ray.pipelines.sketches import (
    CMS_CANDIDATES,
    cms_heavy_hitters,
    cms_registers,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the fox and the box and the fox again",
    "merge sort scan merge sort scan merge",
    "",  # empty doc contributes nothing
    "zebra-free zone with window window key",
]


def _brute_regs(texts, depth, width):
    regs: Counter = Counter()
    for t in texts:
        for term, n in Counter(tokenize_simple(t)).items():
            for r in range(depth):
                regs[(r, md5_u64(f"{r}:{term}") % width)] += n
    return dict(regs)


def _ds(texts, parallelism):
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=parallelism,
    )


@pytest.mark.parametrize("parallelism", [1, 3])
def test_registers_exact_and_partition_invariant(parallelism):
    """Merged registers equal the single-pass brute-force table no
    matter how the stream is partitioned (sum-merge associativity)."""
    depth, width = 4, 32
    out = cms_registers(_ds(TEXTS, parallelism), depth, width).to_pandas()
    got = {
        (int(r), int(b)): int(v)
        for r, b, v in zip(out["row"], out["bucket"], out["reg"])
    }
    assert got == _brute_regs(TEXTS, depth, width)


def test_heavy_hitters_overestimate_and_truth():
    df = cms_heavy_hitters(_ds(TEXTS, 2), depth=4, width=64)
    assert list(df.columns) == ["term", "est_count", "exact_count"]
    assert list(df["term"]) == sorted(CMS_CANDIDATES)
    tokens = [t for x in TEXTS for t in tokenize_simple(x)]
    truth = Counter(tokens)
    by_term = {r["term"]: r for _, r in df.iterrows()}
    for t in CMS_CANDIDATES:
        assert by_term[t]["exact_count"] == truth.get(t, 0), t
        # the CMS guarantee: never an underestimate
        assert by_term[t]["est_count"] >= by_term[t]["exact_count"], t
    # a wide sketch over a tiny vocabulary is collision-free: exact
    wide = cms_heavy_hitters(_ds(TEXTS, 2), depth=4, width=4096)
    assert (wide["est_count"] == wide["exact_count"]).all()


def test_small_width_forces_overestimate():
    """Cramming a many-term stream into width=2 must inflate at least
    one estimate above truth — proves est is reading collision mass,
    not a hidden exact count."""
    texts = [" ".join(f"t{i}" for i in range(40))] * 3
    df = cms_heavy_hitters(_ds(texts, 1), terms=["t0", "t1"], depth=2, width=2)
    assert (df["est_count"] > df["exact_count"]).any()
