"""Count-min sketch: mergeable heavy-hitter counting over the token
stream.

The second mergeable-sketch operator next to the HyperLogLog in
``analysis.py`` (distinct-count): CMS answers "how often does term t
occur?" with a fixed ``depth × width`` integer register table whose
cells only ever ADD — so per-batch partial sketches combine by plain
summation (union of sketches == sketch of union), the exact shape a
10^12-file corpus needs: the full term stream never leaves the map
task, the exchange moves at most depth·width rows per batch, and the
point estimate ``min_r reg[r][h_r(t)]`` is a guaranteed OVERestimate
(Cormode & Muthukrishnan 2005).

Register construction is integer-exact, so the DuckDB oracle mirrors
it bit-for-bit: the row-salted bucket hash is the md5-hex-prefix u64
(``functions.hashing.md5_u64`` — ``CAST(concat('0x', substr(md5(r ||
':' || term), 1, 16)) AS UBIGINT)`` in SQL) taken modulo the width,
and registers are sums of per-term occurrence counts.

Reference provenance: the reference keeps exact per-term counts in a
single SQLite table (/root/reference/db.py) — viable at thousands of
images, not at 10^12 files; the sketch is the bounded-memory
distributed replacement.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import md5_u64
from .analysis import _tok_fn

CMS_DEPTH = 4
CMS_WIDTH = 512

# Frozen heavy-hitter candidate battery (shared with the SQL VALUES
# list): frequent corpus terms, a mid-frequency one, and an absent one
# (whose estimate is pure collision mass — still >= its exact 0).
CMS_CANDIDATES = [
    "scan", "sort", "merge", "join", "window", "key", "the", "zebra",
]


def cms_registers(
    ds: ray.data.Dataset,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    tokenizer: str = "simple",
) -> ray.data.Dataset:
    """The sketch itself: every batch folds its token OCCURRENCE
    counts into a local depth×width register table (a combiner — one
    Counter pass per doc, ``depth`` salted hashes per DISTINCT term),
    emits only its non-zero (row, bucket, reg) cells, and one tiny
    ``groupby([row, bucket]).sum`` merges the partials. Registers are
    pure integers, so the oracle is exact. Missing cells mean
    register 0."""
    tok = _tok_fn(tokenizer)

    def fn(batch: pa.Table) -> pa.Table:
        regs: dict[tuple[int, int], int] = {}
        for text in batch["text"].to_pylist():
            for term, n in Counter(tok(text or "")).items():
                for r in range(depth):
                    key = (r, md5_u64(f"{r}:{term}") % width)
                    regs[key] = regs.get(key, 0) + n
        keys = sorted(regs)
        return pa.table({
            "row": pa.array([k[0] for k in keys], pa.int64()),
            "bucket": pa.array([k[1] for k in keys], pa.int64()),
            "reg": pa.array([regs[k] for k in keys], pa.int64()),
        })

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("reg", alias_name="reg"))
    )


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    terms: list[str] = CMS_CANDIDATES,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    tokenizer: str = "simple",
) -> pd.DataFrame:
    """Point estimates vs truth for the frozen candidate battery:
    ``est = min_r reg[r][h_r(t)]`` from the merged sketch (the CMS
    overestimate guarantee: est >= exact, equality when no collision
    lands in any of the term's ``depth`` cells) next to the exact
    occurrence count from a second combiner aggregate over the same
    stream. Columns: term, est_count, exact_count."""
    tok = _tok_fn(tokenizer)
    reg_df = cms_registers(ds, depth, width, tokenizer).to_pandas()
    regs = {
        (int(r), int(b)): int(v)
        for r, b, v in zip(reg_df["row"], reg_df["bucket"], reg_df["reg"])
    }

    cand = frozenset(terms)

    def count_fn(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            for t in tok(text or ""):
                if t in cand:
                    c[t] += 1
        keys = sorted(c)
        return pa.table({
            "term": pa.array(keys, pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        })

    exact_df = (
        ds.map_batches(count_fn, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    exact = dict(zip(exact_df["term"], exact_df["n"]))
    rows = []
    for t in sorted(terms):
        est = min(
            regs.get((r, md5_u64(f"{r}:{t}") % width), 0)
            for r in range(depth)
        )
        rows.append({
            "term": t,
            "est_count": int(est),
            "exact_count": int(exact.get(t, 0)),
        })
    return pd.DataFrame(rows, columns=["term", "est_count", "exact_count"])
