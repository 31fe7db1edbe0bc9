"""Multimodal (binary payload) pipeline plumbing.

The reference's core data is images on disk, md5-hashed and pushed
through stateful model stages (/root/reference/db.py:106-134,
gemini_api.py:29-87). Here the Ray-side plumbing is real and tested —
opaque ``binary`` payload column + typed metadata, actor-pool decode /
feature / resize stages with small batches for wide rows — while the
actual codec work is STUBBED deterministically (no image/audio libs in
this container):

- ``decode="fake"`` (default): deterministic pseudo-decode, metadata
  derived from payload bytes only — reproducible, oracle-able.
- ``decode="real"``: raises NotImplementedError with instructions —
  the marked seam where PIL/ffmpeg would plug in.

Batch-size note: payloads at real scale are MBs; callers should pass
``batch_size`` small (e.g. 32) and rely on Arrow binary buffers staying
zero-copy in the object store.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def make_binary_corpus(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Derive an opaque binary corpus from a text table (deterministic
    stand-in for reading image files: payload = utf-8 bytes)."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "kind": pa.array(["blob"] * batch.num_rows, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode: payload binary -> (md5, n_bytes, width,
    height, channels). Fake mode derives dimensions deterministically
    from the payload length (SQL-parity: width = n%97+16 etc.)."""

    def __init__(self, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        if decode == "real":
            raise NotImplementedError(
                "real image decode requires PIL/libvips, not present in this "
                "environment; plug the codec in here (payload bytes -> HxWxC array)"
            )
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        md5s = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        n = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload_md5": pa.array(md5s, pa.string()),
                "n_bytes": pa.array(n, pa.int64()),
                "width": pa.array(n % 97 + 16, pa.int64()),
                "height": pa.array(n // 97 % 97 + 16, pa.int64()),
                "channels": pa.array(np.full(len(n), 3, dtype=np.int64), pa.int64()),
                "payload": batch["payload"],
            }
        )


class FeatureStage:
    """Actor-pool feature extraction stub: 8-dim deterministic feature
    from payload byte histogram moments (the seam where a vision model
    forward pass would run; batched, state in __init__)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            b = np.frombuffer(p or b"\x00", dtype=np.uint8).astype(np.float64)
            chunks = np.array_split(b, self.dim)
            feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "feature": pa.array(feats, pa.list_(pa.float64(), self.dim)),
            }
        )


def decode_pipeline(
    ds: ray.data.Dataset, decode: str = "fake", batch_size: int = 32
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def feature_pipeline(ds: ray.data.Dataset, batch_size: int = 32) -> ray.data.Dataset:
    return ds.map_batches(
        FeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
