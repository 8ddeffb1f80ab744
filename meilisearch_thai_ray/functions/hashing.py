"""Deterministic 64-bit hashing (no PYTHONHASHSEED dependence).

Used for: doc_id assignment from url (stable across runs, machines and
parallelism levels — required for rank-identity), term -> shard routing, and
content hashes for dedup. FNV-1a 64 in pure int arithmetic, plus a
numpy-vectorized batch variant for hot paths.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def fnv1a64(data: bytes | str) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def fnv1a64_batch(strings) -> np.ndarray:
    """Vectorized-ish FNV-1a64 over an iterable of strings -> uint64 array.

    Per-string python loop over bytes is the portable fallback; for typical url
    lengths (~40 bytes) this is fast enough inside a map_batches stage. Kept as
    one function so a faster kernel can swap in without touching callers.
    """
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = fnv1a64(s)
    return out


def doc_id_from_url(url: str) -> int:
    """Stable doc_id (uint63 — keep the sign bit clear so the id survives
    int64 round-trips through Arrow/pandas/DuckDB unchanged)."""
    return fnv1a64(url) >> 1


def doc_ids_from_urls(urls) -> np.ndarray:
    return np.right_shift(fnv1a64_batch(urls), np.uint64(1))


def term_shard(term: str, num_shards: int) -> int:
    return fnv1a64(term) % num_shards
