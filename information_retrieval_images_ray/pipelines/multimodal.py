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
    if len(b) >= 54 and b[:2] == b"BM":
        w = struct.unpack("<i", b[18:22])[0]
        h = abs(struct.unpack("<i", b[22:26])[0])
        bpp = struct.unpack("<H", b[28:30])[0]
        return "bmp", w, h, {8: 1, 24: 3, 32: 4}.get(bpp, -1)
    if len(b) >= 2 and b[:1] == b"P" and b[1:2] in b"2356":
        hdr = _parse_pnm_header(b)
        if hdr is not None:
            magic, w, h, _, _ = hdr
            return ("ppm" if magic in (b"P3", b"P6") else "pgm"), w, h, (
                3 if magic in (b"P3", b"P6") else 1
            )
    return None


def _parse_pnm_header(b: bytes) -> tuple[bytes, int, int, int, int] | None:
    """(magic, width, height, maxval, data_offset) for P2/P3/P5/P6 PNM
    bytes; None when malformed. Handles '#' comments and arbitrary
    whitespace per the netpbm spec."""
    magic = b[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        return None
    vals: list[int] = []
    i = 2
    n = len(b)
    while len(vals) < 3 and i < n:
        c = b[i:i + 1]
        if c == b"#":  # comment to end of line
            while i < n and b[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and b[j:j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3 or i >= n or not b[i:i + 1].isspace():
        return None
    return magic, vals[0], vals[1], vals[2], i + 1


def decode_bmp_pixels(b: bytes) -> np.ndarray:
    """Pure-numpy pixel decode of an uncompressed (BI_RGB) BMP — 8-bit
    paletted, 24-bit BGR or 32-bit BGRA — to an (H, W, C) uint8 array
    in RGB channel order (the dependency-free half of the reference's
    Image.open, caption_generator.py:10-17). Raises ValueError on
    compressed or exotic variants (PIL's seam)."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", b[10:14])[0]
    dib = struct.unpack("<I", b[14:18])[0]
    if dib < 40:
        raise ValueError(f"unsupported DIB header size {dib}")
    w = struct.unpack("<i", b[18:22])[0]
    h_raw = struct.unpack("<i", b[22:26])[0]
    bpp = struct.unpack("<H", b[28:30])[0]
    comp = struct.unpack("<I", b[30:34])[0]
    if comp != 0:
        raise ValueError(f"compressed BMP (method {comp}) needs PIL")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bpp {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bad dimensions")
    h = abs(h_raw)
    bottom_up = h_raw > 0
    row = (w * bpp // 8 + 3) // 4 * 4
    if data_off + row * h > len(b):
        raise ValueError("truncated pixel data")
    raw = np.frombuffer(b, np.uint8, count=row * h, offset=data_off)
    raw = raw.reshape(h, row)
    if bottom_up:
        raw = raw[::-1]
    if bpp == 8:
        n_colors = struct.unpack("<I", b[46:50])[0] or 256
        pal_off = 14 + dib
        pal = np.frombuffer(b, np.uint8, count=n_colors * 4, offset=pal_off)
        pal = pal.reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        return np.ascontiguousarray(pal[raw[:, :w]])
    c = bpp // 8
    px = raw[:, : w * c].reshape(h, w, c)
    order = [2, 1, 0] if c == 3 else [2, 1, 0, 3]  # BGR(A) -> RGB(A)
    return np.ascontiguousarray(px[:, :, order])


def decode_pnm_pixels(b: bytes) -> np.ndarray:
    """Pure-numpy pixel decode of binary PPM/PGM (P5/P6, maxval<=255)
    and their ASCII forms (P2/P3) to (H, W, C) uint8."""
    hdr = _parse_pnm_header(b)
    if hdr is None:
        raise ValueError("not a PNM")
    magic, w, h, maxval, off = hdr
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"16-bit PNM (maxval {maxval}) needs PIL")
    c = 3 if magic in (b"P3", b"P6") else 1
    need = w * h * c
    if magic in (b"P5", b"P6"):
        if off + need > len(b):
            raise ValueError("truncated pixel data")
        px = np.frombuffer(b, np.uint8, count=need, offset=off)
    else:  # ASCII samples
        toks = b[off:].split()
        if len(toks) < need:
            raise ValueError("truncated pixel data")
        px = np.array([int(t) for t in toks[:need]], np.uint8)
    return px.reshape(h, w, c)


def encode_bmp(px: np.ndarray) -> bytes:
    """Deterministic 24-bit BI_RGB BMP encoder (test fixtures and
    round-trip proofs; (H, W, 3) uint8 RGB in)."""
    px = np.asarray(px, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("need (H, W, 3) RGB")
    h, w, _ = px.shape
    row = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row), np.uint8)
    body[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


def encode_ppm(px: np.ndarray) -> bytes:
    """Deterministic binary P6/P5 PNM encoder ((H, W, 3) or (H, W, 1)
    / (H, W) uint8 in)."""
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError("need 1 or 3 channels")
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_pixels(b: bytes, pil=None) -> np.ndarray:
    """Dispatch pixel decode: pure numpy for the uncompressed formats
    (BMP, PPM/PGM), PIL (when provided) for compressed ones. Raises
    ValueError when undecodable with what's available."""
    if len(b) >= 2 and b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if len(b) >= 2 and b[:1] == b"P" and b[1:2] in b"2356":
        return decode_pnm_pixels(b)
    if pil is not None:  # pragma: no cover - PIL absent in this container
        import io

        arr = np.asarray(pil.open(io.BytesIO(b)).convert("RGB"), np.uint8)
        return arr
    raise ValueError("compressed format needs PIL (not installed)")


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


def make_image_corpus(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Derive a REAL-image binary corpus from a text table: each doc's
    utf-8 bytes become the pixel row of a 1 x n grayscale binary PGM
    (empty text -> a single zero pixel). Every payload is a genuine,
    pixel-decodable image whose statistics are exactly expressible over
    the source text in SQL — the oracle-checkable real-decode path."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch[text_col].to_pylist():
            b = (t or "").encode("utf-8") or b"\x00"
            payloads.append(
                encode_ppm(np.frombuffer(b, np.uint8).reshape(1, len(b)))
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "kind": pa.array(["image"] * batch.num_rows, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode: payload binary -> (md5, n_bytes, width,
    height, channels).

    - ``decode="fake"`` (default): dimensions derived deterministically
      from the payload length (SQL-parity: width = n%97+16 etc.) — the
      oracle-checkable mode for opaque synthetic payloads.
    - ``decode="real"``: REAL header decode — PNG/JPEG/GIF/BMP/PNM
      dimensions + channel count parsed from the bytes (stdlib struct,
      ``parse_image_header``); non-image payloads get format 'unknown'
      and -1 dimensions. Pixel decode runs pure-numpy for uncompressed
      formats (BMP, PPM/PGM — ``decode_pixels``) emitting
      ``pix_mean_e6``; compressed formats go through PIL (probed once
      per actor in __init__) and, absent it, surface the reason in
      ``decode_error`` with pix_mean_e6 = -1 — never fabricated pixels.
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
            means, errs = [], []
            for p in payloads:
                p = p or b""
                parsed = parse_image_header(p)
                if parsed is None:
                    fmt.append("unknown")
                    ws.append(-1)
                    hs.append(-1)
                    cs.append(-1)
                    means.append(-1)
                    errs.append("unrecognized container")
                    continue
                f, w, h, c = parsed
                fmt.append(f)
                ws.append(int(w))
                hs.append(int(h))
                cs.append(int(c))
                try:
                    px = decode_pixels(p, pil=self.pixels)
                    means.append(int(np.floor(px.mean() * 1e6 + 0.5)))
                    errs.append("")
                except (ValueError, OSError) as e:
                    # real header, pixels out of reach (compressed format
                    # without PIL / malformed body) — surfaced, never faked
                    means.append(-1)
                    errs.append(str(e))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "payload_md5": pa.array(md5s, pa.string()),
                    "n_bytes": pa.array(n, pa.int64()),
                    "format": pa.array(fmt, pa.string()),
                    "width": pa.array(ws, pa.int64()),
                    "height": pa.array(hs, pa.int64()),
                    "channels": pa.array(cs, pa.int64()),
                    "pix_mean_e6": pa.array(means, pa.int64()),
                    "decode_error": pa.array(errs, pa.string()),
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


class PixelFeatureStage:
    """Actor-pool REAL-pixel featurizer: decode the payload (pure numpy
    for BMP/PPM/PGM, PIL for compressed when installed) and emit a
    deterministic grid-pooled feature — the image split into a
    ``grid`` x ``grid`` lattice, per-cell per-RGB-channel mean — the
    classic color-layout descriptor, and the dependency-free stand-in
    for the reference's learned visual features (gemini_api.py:67-87).
    Undecodable payloads emit a null feature + decode_error so the
    pipeline keeps streaming at scale instead of dying on one bad blob.
    """

    def __init__(self, grid: int = 2):
        self.grid = int(grid)
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image

            self.pixels = Image
        except ImportError:
            self.pixels = None

    def _pool(self, px: np.ndarray) -> list[float]:
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        px = px[:, :, :3].astype(np.float64)
        g = self.grid
        h, w = px.shape[:2]
        ys = np.linspace(0, h, g + 1).astype(np.int64)
        xs = np.linspace(0, w, g + 1).astype(np.int64)
        out = []
        for i in range(g):
            for j in range(g):
                cell = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                          xs[j]:max(xs[j + 1], xs[j] + 1)]
                out.extend(float(cell[:, :, c].mean()) for c in range(3))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, errs = [], []
        for p in batch["payload"].to_pylist():
            try:
                feats.append(self._pool(decode_pixels(p or b"", pil=self.pixels)))
                errs.append("")
            except (ValueError, OSError) as e:
                feats.append([])  # empty, not null: fixed-arity consumers
                errs.append(str(e))  # filter on decode_error == ""
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pixel_feature": pa.array(feats, pa.list_(pa.float64())),
                "decode_error": pa.array(errs, pa.string()),
            }
        )


def pixel_feature_pipeline(
    ds: ray.data.Dataset, grid: int = 2, batch_size: int = 32
) -> ray.data.Dataset:
    """Real-pixel grid-pooled features as an actor-pool stage (small
    batches — wide binary rows in, a fixed 3*grid^2-dim vector out)."""
    return ds.map_batches(
        PixelFeatureStage, fn_constructor_kwargs={"grid": grid},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4),
    )


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
