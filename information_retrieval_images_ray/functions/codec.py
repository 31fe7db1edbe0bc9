"""Vectorized delta + varbyte integer codecs for posting lists.

The reference serializes its per-document float vectors with
``np.ndarray.tobytes()`` / ``np.frombuffer`` (/root/reference/db.py:196-197,
db.py:220-221). Our per-document payload is a posting list, so the
analogous codec is the classic information-retrieval one: ascending
doc_ids are delta-gapped then varbyte (LEB128-with-terminator) encoded;
term frequencies are varbyte encoded directly.

Layout: each value is 1..10 bytes, 7 payload bits per byte, low-order
groups first; the FINAL byte of a value has its high bit set. This is
the textbook v-byte scheme (Manning/Raghavan/Schütze IIR §5.3).

Both directions are numpy-vectorized: encode loops over byte *positions*
(<= 10 iterations regardless of list length), never over values.
"""

from __future__ import annotations

import numpy as np

_MAX_VARBYTE_LEN = 10  # ceil(64 / 7)


def encode_varbyte_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array to a varbyte stream, also returning the
    per-value byte counts (int64) — callers that slice the stream into
    sub-blobs (the vectorized bucket encoder) derive their offsets
    from these without re-scanning for terminator bits."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # end offset of each value's byte group
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    shifted = v.copy()
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        pos = starts[sel] + k
        byte = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        last = (nbytes[sel] == k + 1)
        byte[last] |= np.uint8(0x80)
        out[pos] = byte
        shifted[sel] >>= np.uint64(7)
    return out.tobytes(), nbytes


def encode_varbyte(values: np.ndarray) -> bytes:
    """Encode a uint64 array to a varbyte stream."""
    return encode_varbyte_with_lengths(values)[0]


def decode_varbyte(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream back to a uint64 array.

    ``count`` (when known, e.g. stored df) lets callers assert stream
    integrity; decoding itself derives value boundaries from terminator
    bits.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        # an empty buffer is only a valid stream when 0 values are
        # expected — a truncated-to-empty blob with count > 0 must
        # raise, not silently decode to nothing
        if count not in (None, 0):
            raise ValueError(f"varbyte stream has 0 values, expected {count}")
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b & 0x80)
    n = ends.size
    if count is not None and n != count:
        raise ValueError(f"varbyte stream has {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    if int(lens.max()) > _MAX_VARBYTE_LEN:
        raise ValueError("corrupt varbyte stream: value longer than 10 bytes")
    out = np.zeros(n, dtype=np.uint64)
    for k in range(int(lens.max())):
        sel = lens > k
        out[sel] |= (b[starts[sel] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Ascending uint64 ids -> [first, gap, gap, ...] (uint64)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_doc_gaps(doc_ids: np.ndarray) -> bytes:
    """Ascending doc_ids -> delta + varbyte bytes."""
    return encode_varbyte(delta_encode(doc_ids))


def decode_doc_gaps(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    return delta_decode(decode_varbyte(buf, count))
