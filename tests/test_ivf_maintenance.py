"""Persisted-IVF maintenance lifecycle: extend / delete / compact —
the vector-side mirror of the text index's build/extend/delete/compact
(tests/test_delta.py, tests/test_maintenance.py). Exhaustive probing
(nprobe == nlist) makes brute force the exact oracle throughout."""

import os
import shutil

import numpy as np
import pytest
import ray.data

from information_retrieval_images_ray.pipelines.similarity import (
    IVFIndexReader,
    build_ivf_index,
    compact_ivf_index,
    delete_ivf_vectors,
    extend_ivf_index,
    knn_bruteforce,
)


@pytest.fixture(scope="module")
def emb_rows():
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(6):
        center = rng.normal(size=12)
        center /= np.linalg.norm(center)
        for _ in range(30):
            v = center + 0.3 * rng.normal(size=12)
            rows.append(
                {"vec_id": vid, "embedding": v.astype(np.float32).tolist(), "label": c}
            )
            vid += 1
    return rows


def _ds(rows):
    return ray.data.from_items(rows)


def _brute(rows, q, k):
    m = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = m @ qn
    ids = np.array([r["vec_id"] for r in rows])
    order = np.lexsort((ids, -sims))[:k]
    return [int(ids[i]) for i in order]


def _queries(rows, picks=(0, 40, 100)):
    return np.stack([np.asarray(rows[i]["embedding"], np.float64) for i in picks])


def test_extend_matches_fresh_union(tmp_path, emb_rows):
    base = [r for r in emb_rows if r["vec_id"] % 4 != 0]
    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(base), idx, nlist=6)
    # the delta overlaps the base — only genuinely-new ids may land
    meta = extend_ivf_index(_ds(emb_rows), idx)
    n_new = sum(1 for r in emb_rows if r["vec_id"] % 4 == 0)
    assert meta["added"] == n_new
    assert meta["epochs"] == ["vectors", "vectors_ep1"]

    q = _queries(emb_rows)
    reader = IVFIndexReader(idx, num_actors=3)
    got = reader.search(q, k=10, nprobe=6)
    reader.close()
    for qi in range(3):
        want = _brute(emb_rows, q[qi], 10)
        assert list(got[got["qid"] == qi].sort_values("rank")["vec_id"]) == want


def test_extend_idempotent_and_empty(tmp_path, emb_rows):
    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows[:100]), idx, nlist=6)
    m1 = extend_ivf_index(_ds(emb_rows), idx)
    assert m1["added"] == len(emb_rows) - 100
    # re-extending the identical delta is a no-op: nothing added, no
    # new epoch dir, search results unchanged
    q = _queries(emb_rows)
    r = IVFIndexReader(idx, num_actors=2)
    before = r.search(q, k=10, nprobe=6)
    r.close()
    m2 = extend_ivf_index(_ds(emb_rows), idx)
    assert m2["added"] == 0 and m2["epochs"] == m1["epochs"]
    r = IVFIndexReader(idx, num_actors=2)
    after = r.search(q, k=10, nprobe=6)
    r.close()
    assert after.equals(before)


def test_extend_crash_orphan_reclaimed(tmp_path, emb_rows):
    """Crash window: epoch dir renamed in but ivf.json not yet swapped.
    The retry must reclaim the orphan instead of double-counting it."""
    import json

    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows[:100]), idx, nlist=6)
    pre = json.load(open(os.path.join(idx, "ivf.json")))
    extend_ivf_index(_ds(emb_rows), idx)
    # simulate the crash by reverting the meta: vectors_ep1 is now an
    # orphan the next extend must replace, not append next to
    with open(os.path.join(idx, "ivf.json"), "w") as f:
        json.dump(pre, f)
    meta = extend_ivf_index(_ds(emb_rows), idx)
    assert meta["added"] == len(emb_rows) - 100
    assert meta["epochs"] == ["vectors", "vectors_ep1"]
    q = _queries(emb_rows)
    reader = IVFIndexReader(idx, num_actors=2)
    got = reader.search(q, k=10, nprobe=6)
    reader.close()
    assert got.groupby("qid")["vec_id"].nunique().eq(10).all()  # no dups
    for qi in range(3):
        assert list(got[got["qid"] == qi].sort_values("rank")["vec_id"]) == _brute(
            emb_rows, q[qi], 10
        )


def test_delete_tombstones(tmp_path, emb_rows):
    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows), idx, nlist=6)
    dead = [r["vec_id"] for r in emb_rows if r["vec_id"] % 7 == 0]
    meta = delete_ivf_vectors(idx, dead)
    assert meta["n_tombstones"] == len(dead)
    # idempotent: re-deleting the same ids changes nothing
    assert delete_ivf_vectors(idx, dead)["n_tombstones"] == len(dead)

    survivors = [r for r in emb_rows if r["vec_id"] % 7 != 0]
    q = _queries(emb_rows)
    reader = IVFIndexReader(idx, num_actors=3)
    got = reader.search(q, k=10, nprobe=6)
    reader.close()
    assert not (set(got["vec_id"]) & set(dead))
    for qi in range(3):
        want = _brute(survivors, q[qi], 10)
        assert list(got[got["qid"] == qi].sort_values("rank")["vec_id"]) == want
    # the filtered-ANN metadata path must see the same tombstone mask
    reader = IVFIndexReader(idx, num_actors=2)
    flt = reader.search(q, k=10, nprobe=6, filter_col="label", filter_value=0)
    reader.close()
    lbl0 = [r for r in survivors if r["label"] == 0]
    for qi in range(3):
        want = _brute(lbl0, q[qi], 10)
        assert list(flt[flt["qid"] == qi].sort_values("rank")["vec_id"]) == want


def test_compact_preserves_results(tmp_path, emb_rows):
    """Full lifecycle: build → extend → delete → compact. Compaction
    (refit=False) must be invisible to searches — including to a
    reader ATTACHED BEFORE the compact (old epoch dirs persist as the
    live-reader grace window) — collapse the epoch list, physically
    drop tombstoned rows, and clear the tombstones; the grace dirs are
    reclaimed by the NEXT compact."""
    import glob

    import pyarrow.parquet as pq

    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows[:120]), idx, nlist=6)
    extend_ivf_index(_ds(emb_rows), idx)
    dead = [r["vec_id"] for r in emb_rows if r["vec_id"] % 9 == 0]
    delete_ivf_vectors(idx, dead)

    q = _queries(emb_rows)
    live_reader = IVFIndexReader(idx, num_actors=2)  # attached pre-compact
    before = live_reader.search(q, k=10, nprobe=6)

    meta = compact_ivf_index(idx)
    assert meta["epochs"] == ["vectors_g1"] and meta["n_tombstones"] == 0
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))
    # grace window: the pre-compact reader's dirs are still on disk,
    # and lazy loads on it still return full, identical results
    assert os.path.exists(os.path.join(idx, "vectors"))
    during = live_reader.search(q, k=10, nprobe=6)
    assert during.equals(before)
    live_reader.close()

    reader = IVFIndexReader(idx, num_actors=2)
    after = reader.search(q, k=10, nprobe=6)
    reader.close()
    assert after.equals(before)

    # tombstoned rows are physically gone from the compacted parquet
    stored = set()
    for f in glob.glob(os.path.join(idx, "vectors_g1", "**", "*.parquet"), recursive=True):
        stored.update(pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist())
    assert not (stored & set(dead))
    assert len(stored) == len(emb_rows) - len(dead)

    # a post-compact extend is generation-qualified, never colliding
    # with the grace dirs
    extra = [{"vec_id": 10_000 + i,
              "embedding": emb_rows[i]["embedding"], "label": 9}
             for i in range(5)]
    # the delta must exclude the compacted-away ids: they are no
    # longer indexed, so re-sending them would (correctly) re-add them
    survivors_rows = [r for r in emb_rows if r["vec_id"] % 9 != 0]
    m2 = extend_ivf_index(_ds(survivors_rows + extra), idx)
    assert m2["added"] == 5
    assert m2["epochs"] == ["vectors_g1", "vectors_g1_ep1"]
    assert os.path.exists(os.path.join(idx, "vectors_ep1"))  # grace, intact

    # the NEXT compact reclaims everything unreferenced
    m3 = compact_ivf_index(idx)
    assert m3["epochs"] == ["vectors_g2"]
    # pre-compact-1 dirs are gone (reclaimed at compact-2 start);
    # compact-1-era dirs remain as THIS compact's grace window
    assert not os.path.exists(os.path.join(idx, "vectors"))
    assert not os.path.exists(os.path.join(idx, "vectors_ep1"))
    assert os.path.exists(os.path.join(idx, "vectors_g2"))


def test_compact_refit(tmp_path, emb_rows):
    """refit=True re-trains the quantizer on the survivors; with every
    cluster probed the results still exactly equal brute force."""
    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows[:120]), idx, nlist=6)
    extend_ivf_index(_ds(emb_rows), idx)
    dead = [r["vec_id"] for r in emb_rows if r["vec_id"] % 9 == 0]
    delete_ivf_vectors(idx, dead)
    meta = compact_ivf_index(idx, refit=True)
    assert meta["centroids"] == "centroids_g1.npy"

    survivors = [r for r in emb_rows if r["vec_id"] % 9 != 0]
    q = _queries(emb_rows)
    reader = IVFIndexReader(idx, num_actors=2)
    got = reader.search(q, k=10, nprobe=meta["nlist"])
    reader.close()
    for qi in range(3):
        assert list(got[got["qid"] == qi].sort_values("rank")["vec_id"]) == _brute(
            survivors, q[qi], 10
        )


def test_probe_pruning_across_epochs(tmp_path, emb_rows):
    """The destructive read-spy, multi-epoch edition: non-probed
    cluster dirs are deleted in EVERY epoch before the first search —
    success proves extend didn't break lazy probe pruning."""
    from information_retrieval_images_ray.pipelines.similarity import _normalize

    idx = str(tmp_path / "ivf")
    build_ivf_index(_ds(emb_rows[:120]), idx, nlist=6)
    extend_ivf_index(_ds(emb_rows), idx)
    cent = np.load(os.path.join(idx, "centroids.npy"))
    q = _normalize(_queries(emb_rows, picks=(0, 40)))
    probes = set(np.argsort(-(q @ cent.T), axis=1)[:, :2].flatten().tolist())
    non_probed = [c for c in range(len(cent)) if c not in probes]
    assert non_probed, "test needs at least one non-probed cluster"
    for ep in ("vectors", "vectors_ep1"):
        for c in non_probed:
            d = os.path.join(idx, ep, f"cluster={c}")
            if os.path.exists(d):
                shutil.rmtree(d)
    reader = IVFIndexReader(idx, num_actors=3)
    got = reader.search(q, k=10, nprobe=2)
    reader.close()
    assert len(got) == 20
