"""BloomFilter unit semantics (no Ray needed): zero false negatives,
false-positive rate near the sized target, deterministic bits."""

import numpy as np

from information_retrieval_images_ray.functions.bloom import BloomFilter


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    members = np.unique(members)
    bf = BloomFilter(len(members), fp_rate=1e-3)
    bf.add_many(members)
    assert bf.contains(members).all()  # Bloom guarantee: no FN
    probe = rng.integers(0, 2**63, size=100_000, dtype=np.uint64)
    probe = probe[~np.isin(probe, members)]
    fp = bf.contains(probe).mean()
    assert fp <= 5e-3, fp  # sized for 1e-3; allow slack
    assert abs(bf.expected_fp() - 1e-3) / 1e-3 < 1.0  # analytic estimate sane


def test_deterministic_across_instances():
    keys = np.arange(1, 5_000, dtype=np.uint64) * np.uint64(2654435761)
    a = BloomFilter(len(keys), 1e-4)
    b = BloomFilter(len(keys), 1e-4)
    a.add_many(keys)
    b.add_many(keys[::-1].copy())  # order-independent
    assert np.array_equal(a.bits, b.bits)
    probe = np.arange(10**6, 10**6 + 1000, dtype=np.uint64)
    assert np.array_equal(a.contains(probe), b.contains(probe))


def test_empty_and_single():
    bf = BloomFilter(1, 1e-4)
    bf.add_many(np.array([42], dtype=np.uint64))
    assert bf.contains(np.array([42], dtype=np.uint64)).all()
    assert bf.contains(np.array([], dtype=np.uint64)).shape == (0,)
