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


class TextEmbedStage:
    """Actor-pool stage: text -> deterministic hashed-n-gram embedding
    (functions.embedder). The embedder is built once per actor in
    __init__; __call__ embeds the batch. Closes the reference's
    text-embedding loop (embeddings.py:12-31) without any model dep —
    the same embedder instance on the serving side embeds QUERY text
    into the identical space (serving_http /knn, /hybrid)."""

    def __init__(self, dim: int = 64, seed: int = 0,
                 text_col: str = "text", id_col: str = "doc_id"):
        from ..functions.embedder import HashedNgramEmbedder

        self.embedder = HashedNgramEmbedder(dim=dim, seed=seed)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = self.embedder.embed(batch[self.text_col].to_pylist())
        return pa.table(
            {
                "vec_id": batch[self.id_col],
                "embedding": pa.array(
                    list(mat), pa.list_(pa.float64(), self.embedder.dim)
                ),
            }
        )


def embed_text_pipeline(
    ds: ray.data.Dataset, dim: int = 64, seed: int = 0,
    text_col: str = "text", id_col: str = "doc_id", batch_size: int = 256,
) -> ray.data.Dataset:
    """(vec_id, embedding) from a text table — feeds straight into
    build_ivf_index / knn_bruteforce. Deterministic across runs and
    nodes (md5-based feature hashing)."""
    return ds.map_batches(
        TextEmbedStage,
        fn_constructor_kwargs={
            "dim": dim, "seed": seed, "text_col": text_col, "id_col": id_col,
        },
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8),
    )


def text_embed_components(
    ds: ray.data.Dataset, dim: int = 16, seed: int = 0,
    text_col: str = "text", id_col: str = "doc_id", batch_size: int = 256,
) -> ray.data.Dataset:
    """Exploded embedding surface: one (doc_id, bucket, weight_e6) row
    per NONZERO component of each doc's hashed-n-gram embedding — the
    form that makes the embedder itself oracle-checkable (DuckDB
    mirrors the full method bit-for-bit: chr(0)-joined feature strings
    through md5, bucket ``h % dim``, sign ``h >> 63``, integer signed
    sums, one double sqrt + divide — the established
    sum-ints-then-divide-once exactness pattern). Streaming: the same
    actor-pool stage shape as ``embed_text_pipeline``; the explode is
    a vectorized nonzero scan, so output is bounded by
    ``n_docs x dim`` thin rows regardless of text size."""

    class ComponentStage:
        def __init__(self):
            from ..functions.embedder import HashedNgramEmbedder

            self.embedder = HashedNgramEmbedder(dim=dim, seed=seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = self.embedder.embed(batch[text_col].to_pylist())
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            rows_idx, buckets = np.nonzero(mat)
            return pa.table(
                {
                    "doc_id": pa.array(ids[rows_idx], pa.int64()),
                    "bucket": pa.array(buckets.astype(np.int64)),
                    "weight_e6": pa.array(e6(mat[rows_idx, buckets])),
                }
            )

    return ds.map_batches(
        ComponentStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 8),
    )


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
#
# Index layout (maintenance-aware, mirroring the text index's
# build/extend/delete/compact lifecycle in pipelines/build.py +
# pipelines/maintenance.py):
#
#   index_dir/
#     ivf.json            {"nlist","dim","epochs":[...],"n_tombstones":N}
#     centroids.npy       coarse quantizer (fixed across extends)
#     vectors/            epoch 0, hive cluster= partitioned parquet
#     vectors_ep1/ ...    appended epochs (extend_ivf_index)
#     tombstones.parquet  deleted vec_ids (delete_ivf_vectors)
#
# Every mutation is crash-safe: data dirs are built in a sibling
# ``.build`` dir and os.rename'd into place; ivf.json is rewritten
# via tmp + os.replace LAST, so a crash at any point leaves either
# the old meta (orphan data dirs are ignored and reclaimed by the
# next mutation) or the new meta over complete data — never a
# half-written epoch that a reader or retry would double-count.
# Mutations assume ONE writer at a time (the CLI / driver contract,
# same as the text index's manifest); readers attach a consistent
# snapshot (meta read once at init) and are swapped, not mutated.


def _read_ivf_meta(index_dir: str) -> dict:
    import json as _json

    with open(os.path.join(index_dir, "ivf.json")) as f:
        meta = _json.load(f)
    meta.setdefault("epochs", ["vectors"])  # pre-maintenance indexes
    meta.setdefault("n_tombstones", 0)
    return meta


def _write_ivf_meta(index_dir: str, meta: dict) -> None:
    import json as _json

    tmp = os.path.join(index_dir, "ivf.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "ivf.json"))


def _tombstone_ids(index_dir: str) -> np.ndarray:
    path = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(path):
        return np.empty(0, np.int64)
    import pyarrow.parquet as _pq

    return _pq.read_table(path)["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def _write_clusters_direct(assigned: ray.data.Dataset, vectors_dir: str) -> int:
    """Write hive ``cluster=K/part-0.parquet`` files straight out of the
    groupby's reduce tasks — one file per cluster, written WHILE the
    exchange drains (no separate full-dataset write pass after a global
    sort). The ``cluster`` column lives in the dir name only, matching
    the hive layout every reader/extend schema check expects. Returns
    the number of rows written."""
    import pyarrow.parquet as _pq

    os.makedirs(vectors_dir, exist_ok=True)

    def write_group(g: pa.Table) -> pa.Table:
        cl = int(g["cluster"][0].as_py())
        cdir = os.path.join(vectors_dir, f"cluster={cl}")
        os.makedirs(cdir, exist_ok=True)
        out = os.path.join(cdir, "part-0.parquet")
        tmp = out + ".tmp"
        _pq.write_table(g.drop_columns(["cluster"]), tmp)
        os.replace(tmp, out)  # retry-safe: same cluster -> same path
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    counts = (
        assigned.groupby("cluster")
        .map_groups(write_group, batch_format="pyarrow")
        .sum("n")
    )
    return int(counts or 0)


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
    import shutil as _shutil

    meta_path = os.path.join(index_dir, "ivf.json")
    if os.path.exists(meta_path):
        return _read_ivf_meta(index_dir)
    build_dir = index_dir.rstrip("/") + ".build"
    if os.path.exists(build_dir):  # leftover from a crashed build
        _shutil.rmtree(build_dir)
    os.makedirs(build_dir)
    cent = fit_centroids(ds, nlist, id_col=id_col)
    np.save(os.path.join(build_dir, "centroids.npy"), cent)
    # co-locate by cluster, then write EACH cluster's file directly
    # from its reduce task (groupby().map_groups) instead of a global
    # sort followed by a separate hive-write pass: the write overlaps
    # the exchange (a cluster flushes to disk the moment its group
    # materializes, while other groups are still shuffling), and the
    # layout is exactly one file per cluster — the co-location that
    # fixed the 65k-tiny-files / 23x cold-read regression, kept.
    # Deterministic path + atomic replace make a retried reduce task
    # rewrite its own file, never append beside it. Assumes one
    # cluster's vectors fit a task heap (same bound the sorted hive
    # write already imposed per output block).
    _write_clusters_direct(ivf_assign(ds, cent), os.path.join(build_dir, "vectors"))
    meta = {
        "nlist": int(len(cent)), "dim": int(cent.shape[1]),
        "epochs": ["vectors"], "n_tombstones": 0, "gen": 0,
        "centroids": "centroids.npy",
    }
    _write_ivf_meta(build_dir, meta)
    if os.path.exists(index_dir):  # marker-less partial from an old crash
        _shutil.rmtree(index_dir)
    os.rename(build_dir, index_dir)
    return meta


def extend_ivf_index(
    ds_new: ray.data.Dataset, index_dir: str, id_col: str = "vec_id",
) -> dict:
    """Incrementally add vectors to a persisted IVF index WITHOUT a
    rebuild — the vector-side analogue of the text index's pending-work
    ``extend`` (build.py extend_index): anti-join the delta against the
    already-indexed ids, assign the genuinely-new vectors to the
    EXISTING centroids (the standard IVF grow path — the coarse
    quantizer is fixed; ``compact_ivf_index(refit=True)`` re-trains it
    when the distribution has drifted), and land them as a new epoch
    dir. Idempotent: re-extending the same delta adds 0 rows and writes
    nothing.

    Scale shape: the delta is the small (pending-work) side — its id
    column is collected and broadcast; the INDEXED side is only ever
    scanned column-pruned (``vec_id`` alone) with an ``is_in`` filter,
    so at most |delta| collision ids reach the driver and the stored
    vectors never move. For deltas too large to hold as a driver id
    set, the text side's tagged-union distributed anti-join is the
    documented seam (build.py extend_index uses it for content keys).

    Crash-safe: the epoch parquet is written to ``.build`` and renamed
    in, then ivf.json is swapped via os.replace. A crash between the
    two leaves an orphan dir that is ignored (not in ``epochs``) and
    reclaimed by the next extend."""
    import pyarrow.compute as pc
    import shutil as _shutil

    import glob as _glob
    import pyarrow.parquet as _pq

    meta = _read_ivf_meta(index_dir)
    cent = np.load(os.path.join(index_dir, meta.get("centroids", "centroids.npy")))

    # fail at the mutation, not at a later filtered search: an epoch
    # missing a metadata column would make IVFClusterActor._col raise
    # mid-query long after the extend that caused it
    ref_files = _glob.glob(
        os.path.join(index_dir, meta["epochs"][0], "**", "*.parquet"),
        recursive=True,
    )
    if ref_files:
        ref_names = set(_pq.read_schema(ref_files[0]).names)
        new_names = set(ds_new.schema().names)
        if new_names != ref_names:
            raise ValueError(
                f"extend delta schema {sorted(new_names)} != indexed schema "
                f"{sorted(ref_names)} — every epoch must carry the same "
                "columns (filtered ANN reads metadata from all of them)"
            )

    delta_ids = set(
        int(i)
        for b in ds_new.select_columns([id_col]).iter_batches(batch_format="pyarrow")
        for i in b[id_col].to_pylist()
    )
    if not delta_ids:
        return {**meta, "added": 0}

    probe = pa.array(sorted(delta_ids), pa.int64())
    existing: set[int] = set()
    for ep in meta["epochs"]:
        hits = (
            ray.data.read_parquet(
                os.path.join(index_dir, ep), columns=[id_col]
            )
            .map_batches(
                lambda b: b.filter(pc.is_in(b[id_col].cast(pa.int64()), value_set=probe)),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        # an all-filtered (zero-collision) scan loses its schema
        if id_col in hits.columns:
            existing.update(int(i) for i in hits[id_col])
    new_ids = delta_ids - existing
    if not new_ids:
        return {**meta, "added": 0}

    keep = pa.array(sorted(new_ids), pa.int64())
    fresh = ds_new.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col].cast(pa.int64()), value_set=keep)),
        batch_format="pyarrow",
    )
    # post-compact extends are generation-qualified so they can never
    # collide with a pre-compact epoch dir lingering in the compact's
    # live-reader grace window — rmtree below must only ever reclaim
    # THIS extend's own crashed attempt (same meta -> same name)
    gen = int(meta.get("gen", 0))
    n_ep = len(meta["epochs"])
    epoch = f"vectors_ep{n_ep}" if gen == 0 else f"vectors_g{gen}_ep{n_ep}"
    build_dir = os.path.join(index_dir, epoch + ".build")
    final_dir = os.path.join(index_dir, epoch)
    for d in (build_dir, final_dir):  # orphans from a crashed extend
        if os.path.exists(d):
            _shutil.rmtree(d)
    ivf_assign(fresh, cent).sort("cluster").write_parquet(
        build_dir, partition_cols=["cluster"]
    )
    os.rename(build_dir, final_dir)
    meta["epochs"] = meta["epochs"] + [epoch]
    _write_ivf_meta(index_dir, meta)
    return {**meta, "added": len(new_ids)}


def delete_ivf_vectors(index_dir: str, vec_ids) -> dict:
    """Tombstone vectors in a persisted IVF index (the text side's
    delete_docs analogue, pipelines/maintenance.py): ids land in a
    single tombstones.parquet that readers load once per actor and
    apply while caching clusters — the stored vectors are untouched
    until ``compact_ivf_index`` rewrites them out. Idempotent (set
    union). The tombstone set is one int64 column — fine to hundreds
    of millions of ids; beyond that it becomes a per-epoch parquet dir
    consulted per cluster (documented seam)."""
    import pyarrow.parquet as _pq

    meta = _read_ivf_meta(index_dir)
    merged = np.union1d(
        _tombstone_ids(index_dir), np.asarray(sorted(set(int(i) for i in vec_ids)), np.int64)
    )
    tmp = os.path.join(index_dir, "tombstones.parquet.tmp")
    _pq.write_table(pa.table({"vec_id": pa.array(merged, pa.int64())}), tmp)
    os.replace(tmp, os.path.join(index_dir, "tombstones.parquet"))
    meta["n_tombstones"] = int(len(merged))
    _write_ivf_meta(index_dir, meta)
    return meta


def compact_ivf_index(index_dir: str, refit: bool = False, nlist: int | None = None) -> dict:
    """Rewrite a persisted IVF index in place: fold every epoch into
    one fresh generation dir, drop tombstoned rows for good, and clear
    the tombstone file — the text side's ``compact_index`` analogue.
    With ``refit=False`` the centroids (and therefore every search
    result) are IDENTICAL before and after — compaction is pure storage
    hygiene; ``refit=True`` re-trains the coarse quantizer on the
    surviving vectors (use after heavy extends drifted the
    distribution). Cluster assignment is recomputed from the centroids
    (deterministic argmax — cheaper and type-safer than trusting the
    hive partition column round-trip).

    Crash-safe by generation naming + publish-last: the compacted data
    lands in ``vectors_g{N}`` (never colliding with a live dir) and
    the meta swap via os.replace is the single commit point. Old epoch
    dirs are NOT deleted after the publish: an ``IVFClusterActor``
    pool attached before the compact loads clusters LAZILY from its
    meta-snapshot's dirs, so deleting them would make a live reader
    silently return partial results. They linger as unreferenced
    orphans (one compact cycle of grace — maintenance is expected to
    be followed by a reader/pool swap, as serving does) and are
    reclaimed at the START of the next compact. Only the tombstone
    file is removed post-publish, which is always safe: attached
    readers copied it into actor memory at init."""
    import pyarrow.compute as pc
    import shutil as _shutil

    import glob as _glob

    meta = _read_ivf_meta(index_dir)
    gen = int(meta.get("gen", 0)) + 1

    # reclaim orphans from PRIOR compacts/crashes: anything not
    # referenced by the current meta is at least one generation stale
    cent_live = meta.get("centroids", "centroids.npy")
    for entry in os.listdir(index_dir):
        p = os.path.join(index_dir, entry)
        if (os.path.isdir(p) and entry.startswith("vectors")
                and entry not in meta["epochs"]):
            _shutil.rmtree(p)
        elif (not os.path.isdir(p) and entry.startswith("centroids")
                and entry != cent_live):
            os.remove(p)

    tomb = _tombstone_ids(index_dir)
    # explicit file list: read_parquet doesn't expand a LIST of dirs,
    # and the hive `cluster` partition column is recomputed anyway
    files = [
        f
        for ep in meta["epochs"]
        for f in sorted(_glob.glob(
            os.path.join(index_dir, ep, "**", "*.parquet"), recursive=True))
    ]
    ds = ray.data.read_parquet(files)
    if "cluster" in ds.schema().names:
        ds = ds.drop_columns(["cluster"])
    if len(tomb):
        dead = ray.put(pa.array(tomb, pa.int64()))

        def drop_dead(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.invert(pc.is_in(b["vec_id"].cast(pa.int64()), value_set=ray.get(dead)))
            )

        ds = ds.map_batches(drop_dead, batch_format="pyarrow")

    cent_file = meta.get("centroids", "centroids.npy")
    if refit:
        cent = fit_centroids(ds, nlist or meta["nlist"])
        cent_file = f"centroids_g{gen}.npy"
        np.save(os.path.join(index_dir, cent_file), cent)
    else:
        cent = np.load(os.path.join(index_dir, cent_file))

    out_name = f"vectors_g{gen}"
    build_dir = os.path.join(index_dir, out_name + ".build")
    for d in (build_dir, os.path.join(index_dir, out_name)):
        if os.path.exists(d):  # orphan from a crashed compact
            _shutil.rmtree(d)
    ivf_assign(ds, cent).sort("cluster").write_parquet(
        build_dir, partition_cols=["cluster"]
    )
    os.rename(build_dir, os.path.join(index_dir, out_name))

    new_meta = {
        "nlist": int(len(cent)), "dim": int(cent.shape[1]),
        "epochs": [out_name], "n_tombstones": 0, "gen": gen,
        "centroids": cent_file,
    }
    _write_ivf_meta(index_dir, new_meta)  # the commit point

    # post-publish: drop ONLY the tombstone file (attached readers
    # cached it; the compacted data no longer contains those rows).
    # Old epoch dirs stay on disk as the live-reader grace window and
    # are reclaimed at the start of the next compact.
    for entry in os.listdir(index_dir):
        if entry.startswith("tombstones.parquet"):
            os.remove(os.path.join(index_dir, entry))
    return new_meta


@ray.remote
class IVFClusterActor:
    """Owns a disjoint subset of IVF clusters (the ShardQueryActor
    shape, serving.py:40-67). Cluster parquet is read LAZILY on first
    probe and cached as normalized numpy — non-probed clusters are
    never read, repeated queries never re-read parquet (both asserted
    destructively in tests/test_similarity.py by deleting the files)."""

    def __init__(self, index_dir: str, cluster_ids: list[int],
                 epochs: list[str] | None = None, tomb_ref=None):
        self.index_dir = index_dir
        self.owned = set(int(c) for c in cluster_ids)
        self.epochs = list(epochs) if epochs else ["vectors"]
        # tombstoned vec_ids (delete_ivf_vectors): the reader ray.puts
        # the array once and passes the ref, which Ray dereferences to
        # a zero-copy view on arrival; applied while caching so the hot
        # search path never re-filters
        self.tomb = tomb_ref
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # live-row mask per cluster IN FILE ORDER, so metadata columns
        # read later align with the tombstone-filtered _cache rows
        self._mask: dict[int, np.ndarray] = {}
        # metadata columns for filtered ANN, cached per (cluster, col)
        # in the same row order as _cache[c] (same sorted file walk)
        self._col_cache: dict[tuple[int, str], np.ndarray] = {}

    def _cluster_files(self, c: int) -> list[str]:
        import glob as _glob

        return [
            f
            for ep in self.epochs
            for f in sorted(_glob.glob(os.path.join(
                self.index_dir, ep, f"cluster={c}", "*.parquet")))
        ]

    def _col(self, c: int, col: str) -> np.ndarray:
        key = (c, col)
        if key not in self._col_cache:
            import pyarrow.parquet as _pq

            self._cluster(c)  # ensure the live-row mask exists
            parts = [
                _pq.read_table(f, columns=[col])[col].to_numpy(zero_copy_only=False)
                for f in self._cluster_files(c)
            ]
            vals = np.concatenate(parts) if parts else np.empty(0)
            self._col_cache[key] = vals[self._mask[c]] if len(vals) else vals
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
                ids, m = np.concatenate(ids_l), np.vstack(mats)
            else:
                ids, m = np.empty(0, np.int64), np.empty((0, 1))
            keep = (
                ~np.isin(ids, self.tomb)
                if self.tomb is not None and len(ids)
                else np.ones(len(ids), dtype=bool)
            )
            self._mask[c] = keep
            self._cache[c] = (ids[keep], m[keep] if len(ids) else m)
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
        self.meta = _read_ivf_meta(index_dir)
        self.cent = np.load(
            os.path.join(index_dir, self.meta.get("centroids", "centroids.npy"))
        )
        tomb = _tombstone_ids(index_dir)
        tomb_ref = ray.put(tomb) if len(tomb) else None
        nlist = len(self.cent)
        num_actors = max(1, min(num_actors, nlist))
        assign: list[list[int]] = [[] for _ in range(num_actors)]
        for c in range(nlist):
            assign[c % num_actors].append(c)
        self.actors = [
            IVFClusterActor.remote(
                index_dir, cluster_ids, self.meta["epochs"], tomb_ref
            )
            for cluster_ids in assign
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
