"""Checkpoint manifest with per-partition lineage records.

The reference achieves restartable builds with key-presence idempotency
checks (skip a row if its md5/path is already in the store —
/root/reference/db.py:114-116, db.py:157-161, embedding_utils.py:17-21,
and the NOT-IN anti-join at db.py:324-339). We lift the same semantics
to *partition* granularity: the build records one entry per completed
phase/shard with the input fingerprint, config hash, row counts and
output files; a restarted build skips entries whose fingerprint+config
still match and recomputes the rest. Writes are atomic
(write-temp + os.replace) so a kill can never leave a torn manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


def config_hash(cfg: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


def fingerprint_file(path: str) -> str:
    """Stat-only fingerprint of ONE input file: (abspath, size, mtime).

    mtime + full path make same-size in-place edits and path moves
    detectable; content is deliberately NOT hashed — the per-row
    content_sha256 invariant already guards data integrity downstream,
    and at 100 TB a stat (object-store LIST) is cheap where a content
    read is not.
    """
    st = os.stat(path)
    return hashlib.sha256(
        json.dumps([os.path.abspath(path), st.st_size, st.st_mtime_ns]).encode()
    ).hexdigest()[:16]


def fingerprint_files(paths: list[str]) -> str:
    """Fingerprint of an input file SET: sorted per-file fingerprints
    hashed together."""
    items = sorted(fingerprint_file(p) for p in paths)
    return hashlib.sha256(json.dumps(items).encode()).hexdigest()[:16]


@dataclass
class Manifest:
    path: str
    data: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, index_dir: str, config: dict[str, Any]) -> "Manifest":
        path = os.path.join(index_dir, "manifest.json")
        m = cls(path=path)
        chash = config_hash(config)
        if os.path.exists(path):
            with open(path) as f:
                m.data = json.load(f)
            if m.data.get("config_hash") != chash:
                # config changed -> stale checkpoints are unusable
                m.data = {}
        if not m.data:
            m.data = {
                "config": config,
                "config_hash": chash,
                "entries": {},
                "created_unix": time.time(),
            }
            m.save()
        return m

    def save(self) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- per-partition lineage ------------------------------------------------
    def is_done(self, key: str, input_fingerprint: str | None = None) -> bool:
        e = self.data["entries"].get(key)
        if e is None or e.get("status") != "done":
            return False
        if input_fingerprint is not None and e.get("input_fingerprint") != input_fingerprint:
            return False
        return True

    def mark_done(self, key: str, *, input_fingerprint: str = "", **metrics: Any) -> None:
        self.data["entries"][key] = {
            "status": "done",
            "input_fingerprint": input_fingerprint,
            "finished_unix": time.time(),
            **metrics,
        }
        self.save()

    def invalidate(self, key: str) -> None:
        self.data["entries"].pop(key, None)
        self.save()

    def metrics(self) -> dict[str, Any]:
        return {k: {kk: vv for kk, vv in v.items() if kk != "status"}
                for k, v in self.data["entries"].items()}
