"""Similarity search over an embedding column (list<float>).

The Ray-native re-expression of the reference's vector path (Milvus
IVF_FLAT + top-k search, /root/reference/vector_db.py:33-42,93-103):

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put``; every batch does one numpy
  matmul against it and emits its LOCAL top-k partials; the driver
  merges k*num_batches tiny rows. No shuffle of the embedding table.
- ``ivf_knn`` — the scale path, mirroring the reference's IVF_FLAT
  nlist/nprobe design: deterministic k-means coarse quantizer (fit on
  a broadcast sample), cluster assignment as a batch map, search visits
  only ``nprobe`` nearest centroids' rows. Recall vs brute force is
  asserted in pytest (the reference's overlap@k eval,
  post_test_score.py:34-79, is exactly this check).
- ``embedding_near_dups`` — near-dup pairs by cosine >= threshold,
  blocked by a coarse cluster (or provided label) so the pairwise
  gram matrix stays per-group.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .analysis import e6


def _batch_mat(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns
    (qid, rank, vec_id, sim_e6) with (sim desc, vec_id asc) tie-break."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(q)

    class PartialTopK:
        def __init__(self):
            self.q = ray.get(q_ref)  # broadcast once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_mat(batch))
            sims = m @ self.q.T  # (n, nq)
            out_q, out_id, out_sim = [], [], []
            kk = min(k, len(ids))
            for qi in range(self.q.shape[0]):
                s = sims[:, qi]
                idx = np.lexsort((ids, -s))[:kk]
                out_q.extend([qi] * len(idx))
                out_id.extend(ids[idx])
                out_sim.extend(s[idx])
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "sim": pa.array(out_sim, pa.float64()),
                }
            )

    partials = ds.map_batches(
        PartialTopK, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    return _merge_partials(partials, range(q.shape[0]), k)


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) ANN


def fit_centroids(
    ds: ray.data.Dataset, nlist: int = 16, iters: int = 10, sample_n: int = 2048,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic k-means on a seeded sample (driver-side numpy —
    the sample is tiny; at scale this is the standard 'train the coarse
    quantizer on a sample' step). The sample fraction is a REAL uniform
    fraction of the dataset (not a prefix), so centroids are unbiased
    even when the corpus is clustered/ordered on disk."""
    n = ds.count()
    frac = min(1.0, 1.25 * sample_n / max(1, n))  # slight oversample, then limit
    sample = ds.random_sample(frac, seed=1).limit(sample_n).to_pandas()
    if sample.empty:  # tiny corpora where the sample came up empty
        sample = ds.limit(sample_n).to_pandas()
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    )
    rng = np.random.default_rng(7)
    cent = m[rng.choice(len(m), size=min(nlist, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_assign(ds: ray.data.Dataset, centroids: np.ndarray) -> ray.data.Dataset:
    cent_ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_mat(batch))
            cl = np.argmax(m @ self.cent.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl, pa.int32()))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4))


def ivf_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> pd.DataFrame:
    """ANN top-k visiting only nprobe clusters per query (reference
    IVF_FLAT nlist=1024 nprobe=10 shape, vector_db.py:33-42)."""
    cent = fit_centroids(ds, nlist)
    assigned = ivf_assign(ds, cent)
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted_clusters = set(probes.flatten().tolist())

    flt = assigned.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b["cluster"], value_set=pa.array(sorted(wanted_clusters), pa.int32()))
        ),
        batch_format="pyarrow",
    )
    # distributed probed scoring: each batch emits per-query LOCAL
    # top-k over its rows in the query's probe clusters; the driver
    # merges nq x k x num_batches tiny partials (never the probed
    # rows themselves — those stay in the workers)
    broadcast = ray.put((q, probes))

    class ProbedTopK:
        def __init__(self):
            self.q, self.probes = ray.get(broadcast)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_mat(batch))
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(cl, self.probes[qi])
                if not mask.any():
                    continue
                s = m[mask] @ self.q[qi]
                sub_ids = ids[mask]
                idx = np.lexsort((sub_ids, -s))[: min(k, int(mask.sum()))]
                out_q.extend([qi] * len(idx))
                out_id.extend(sub_ids[idx])
                out_sim.extend(s[idx])
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "sim": pa.array(out_sim, pa.float64()),
                }
            )

    partials = flt.map_batches(
        ProbedTopK, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    return _merge_partials(partials, range(q.shape[0]), k)


def _merge_partials(partials: pd.DataFrame, qids, k: int) -> pd.DataFrame:
    """Vectorized k-way merge of per-batch (qid, vec_id, sim) partials
    — k x num_batches tiny rows, driver-side by design."""
    frames = []
    for qi in qids:
        g = partials[partials["qid"] == qi]
        if g.empty:
            continue
        ids = g["vec_id"].to_numpy(np.int64)
        sims = g["sim"].to_numpy(np.float64)
        idx = np.lexsort((ids, -sims))[: min(k, len(ids))]
        frames.append(pd.DataFrame({
            "qid": np.full(len(idx), qi, np.int64),
            "rank": np.arange(1, len(idx) + 1, dtype=np.int64),
            "vec_id": ids[idx],
            "sim_e6": e6(sims[idx]).astype(np.int64),
        }))
    if not frames:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ["qid", "rank", "vec_id", "sim_e6"]}
        )
    return pd.concat(frames, ignore_index=True)


def embedding_near_dups(
    ds: ray.data.Dataset, threshold: float = 0.95, block_col: str | None = "label"
) -> pd.DataFrame:
    """Pairs with cosine >= threshold, blocked by ``block_col`` so the
    pairwise computation is a per-group gram matrix. ``block_col=None``
    is the no-labels scale path: a coarse IVF quantizer is fit on a
    sample and each vector's cluster id becomes the block (candidate
    recall is then approximate at cluster boundaries — the standard
    ANN-blocked near-dup trade; raise nlist for tighter blocks)."""
    if block_col is None:
        cent = fit_centroids(ds, nlist=16)
        ds = ivf_assign(ds, cent)
        block_col = "cluster"

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize(np.stack([np.asarray(v, np.float64) for v in g["embedding"].iloc[order]]))
        sims = m @ m.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[a][keep],
                "doc_b": ids[b][keep],
                "sim_e6": e6(sims[a, b][keep]),
            }
        )

    out = ds.groupby(block_col).map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "sim_e6": pd.Series(dtype="int64")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True).astype("int64")


# ---------------------------------------------------------------------------
# persisted IVF index (the reference's Milvus collection analogue:
# create once, then serve searches against the stored structure —
# vector_db.py:21-42 creates the collection + IVF_FLAT index and
# load()s it; searches hit the persisted index, not a refit).


def build_ivf_index(
    ds: ray.data.Dataset, index_dir: str, nlist: int = 16, id_col: str = "vec_id",
) -> dict:
    """Persist an IVF index: centroids (small npy) + the embedding
    table partitioned by cluster id (hive `cluster=` dirs, so a probe
    reads ONLY its clusters' files — the vector-side mirror of the
    text index's shard pruning). Idempotent via the ivf.json marker,
    and CRASH-SAFE: everything is built in a sibling ``.build`` dir
    and renamed into place atomically — a killed or concurrent build
    can never leave marker-less partial cluster files that a rebuild's
    write_parquet would append duplicate vectors next to."""
    import json as _json
    import shutil as _shutil

    meta_path = os.path.join(index_dir, "ivf.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return _json.load(f)
    build_dir = index_dir.rstrip("/") + ".build"
    if os.path.exists(build_dir):  # leftover from a crashed build
        _shutil.rmtree(build_dir)
    os.makedirs(build_dir)
    cent = fit_centroids(ds, nlist, id_col=id_col)
    np.save(os.path.join(build_dir, "centroids.npy"), cent)
    assigned = ivf_assign(ds, cent)
    assigned.write_parquet(
        os.path.join(build_dir, "vectors"), partition_cols=["cluster"]
    )
    meta = {"nlist": int(len(cent)), "dim": int(cent.shape[1])}
    with open(os.path.join(build_dir, "ivf.json"), "w") as f:
        _json.dump(meta, f)
    if os.path.exists(index_dir):  # marker-less partial from an old crash
        _shutil.rmtree(index_dir)
    os.rename(build_dir, index_dir)
    return meta


@ray.remote
class IVFClusterActor:
    """Owns a disjoint subset of IVF clusters (the ShardQueryActor
    shape, serving.py:40-67). Cluster parquet is read LAZILY on first
    probe and cached as normalized numpy — non-probed clusters are
    never read, repeated queries never re-read parquet (both asserted
    destructively in tests/test_similarity.py by deleting the files)."""

    def __init__(self, index_dir: str, cluster_ids: list[int]):
        self.index_dir = index_dir
        self.owned = set(int(c) for c in cluster_ids)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # metadata columns for filtered ANN, cached per (cluster, col)
        # in the same row order as _cache[c] (same sorted file walk)
        self._col_cache: dict[tuple[int, str], np.ndarray] = {}

    def _cluster_files(self, c: int) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(os.path.join(
            self.index_dir, "vectors", f"cluster={c}", "*.parquet")))

    def _col(self, c: int, col: str) -> np.ndarray:
        key = (c, col)
        if key not in self._col_cache:
            import pyarrow.parquet as _pq

            parts = [
                _pq.read_table(f, columns=[col])[col].to_numpy(zero_copy_only=False)
                for f in self._cluster_files(c)
            ]
            self._col_cache[key] = (
                np.concatenate(parts) if parts else np.empty(0)
            )
        return self._col_cache[key]

    def _cluster(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        if c not in self._cache:
            import pyarrow.parquet as _pq

            ids_l, mats = [], []
            for f in self._cluster_files(c):
                t = _pq.read_table(f, columns=["vec_id", "embedding"])
                ids_l.append(t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64))
                mats.append(_normalize(_batch_mat(t)))
            if ids_l:
                self._cache[c] = (np.concatenate(ids_l), np.vstack(mats))
            else:
                self._cache[c] = (np.empty(0, np.int64), np.empty((0, 1)))
        return self._cache[c]

    def search(
        self, q: np.ndarray, probes: np.ndarray, k: int,
        filter_col: str | None = None, filter_value=None,
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """Per-query LOCAL top-k over owned ∩ probed clusters:
        [(qid, ids, sims), ...] — at most k rows per query leave the
        actor, never the cluster vectors themselves. ``filter_col``
        restricts candidates to rows whose metadata column equals
        ``filter_value`` BEFORE the matmul (pre-filtered ANN: the
        filtered-out vectors don't even get scored)."""
        out = []
        for qi in range(q.shape[0]):
            mine = [int(c) for c in probes[qi] if int(c) in self.owned]
            ids_l, sims_l = [], []
            for c in mine:
                ids, m = self._cluster(c)
                if len(ids) and filter_col is not None:
                    keep = self._col(c, filter_col) == filter_value
                    ids, m = ids[keep], m[keep]
                if len(ids):
                    ids_l.append(ids)
                    sims_l.append(m @ q[qi])
            if not ids_l:
                continue
            ids = np.concatenate(ids_l)
            sims = np.concatenate(sims_l)
            idx = np.lexsort((ids, -sims))[: min(k, len(ids))]
            out.append((qi, ids[idx], sims[idx]))
        return out

    def ready(self) -> bool:
        return True


class IVFIndexReader:
    """Serves ANN searches against a persisted IVF index through a
    pool of cluster-partitioned actors: centroids live on the router
    (tiny — probe selection only); each actor owns nlist/N clusters and
    caches their vectors across queries. Scoring is scatter-gather —
    the router merges nq x k x N tiny partials, it never touches
    cluster parquet itself (the round-2 driver-loop form re-read GBs of
    probed clusters per query)."""

    def __init__(self, index_dir: str, num_actors: int = 2):
        self.index_dir = index_dir
        self.cent = np.load(os.path.join(index_dir, "centroids.npy"))
        nlist = len(self.cent)
        num_actors = max(1, min(num_actors, nlist))
        assign: list[list[int]] = [[] for _ in range(num_actors)]
        for c in range(nlist):
            assign[c % num_actors].append(c)
        self.actors = [
            IVFClusterActor.remote(index_dir, cluster_ids) for cluster_ids in assign
        ]
        ray.get([a.ready.remote() for a in self.actors])

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4,
               filter_col: str | None = None, filter_value=None) -> pd.DataFrame:
        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        probes = np.argsort(-(q @ self.cent.T), axis=1)[:, :nprobe]
        parts = ray.get([
            a.search.remote(q, probes, k, filter_col, filter_value)
            for a in self.actors
        ])
        rows = []
        for qi in range(q.shape[0]):
            ids_l = [ids for part in parts for (pq_, ids, _) in part if pq_ == qi]
            sims_l = [sims for part in parts for (pq_, _, sims) in part if pq_ == qi]
            if not ids_l:
                continue
            ids = np.concatenate(ids_l)
            sims = np.concatenate(sims_l)
            idx = np.lexsort((ids, -sims))[: min(k, len(ids))]
            rows.append(pd.DataFrame({
                "qid": np.full(len(idx), qi, np.int64),
                "rank": np.arange(1, len(idx) + 1, dtype=np.int64),
                "vec_id": ids[idx],
                "sim_e6": e6(sims[idx]),
            }))
        if not rows:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ["qid", "rank", "vec_id", "sim_e6"]}
            )
        return pd.concat(rows, ignore_index=True).astype("int64")

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
