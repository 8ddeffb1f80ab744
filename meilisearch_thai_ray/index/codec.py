"""Delta + varint (LEB128) posting-list codec with per-block max-score metadata.

Layout per (term, salt) segment:
  docs_bin: varint(delta(doc_ids))     -- doc_ids strictly increasing
  tfs_bin:  varint(tf - 1)             -- tf >= 1
  dls_bin:  varint(dl)                 -- per-posting document length
  block_last: int64[ceil(n/B)]         -- last doc_id per block (skip pointers)
  block_max:  float64[ceil(n/B)]       -- max idf-independent partial score per
                                          block: tfn = tf(k1+1)/(tf+k1(1-b+b·dl/avgdl)).
                                          idf multiplies at query time, so
                                          encoding needs only avgdl (one global
                                          scalar barrier), not per-term df.

Both encode and decode are numpy-vectorized (no per-posting Python loop): the
varint inner loop runs over BYTE POSITIONS (<=10 iterations), not values.
"""

from __future__ import annotations

import numpy as np

from ..config import BM25_B, BM25_K1, POSTING_BLOCK

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    starts = np.cumsum(nbytes) - nbytes
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(data: bytes, count: int) -> np.ndarray:
    """LEB128 bytes -> uint64 array of `count` values."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)
    assert ends.size == count, f"varint stream has {ends.size} values, expected {count}"
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(count, dtype=np.uint64)
    maxb = int((ends - starts).max()) + 1
    for k in range(maxb):
        pos = starts + k
        mask = pos <= ends
        out[mask] |= (b[pos[mask]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def tfn_scores(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
               k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """idf-independent BM25 partial score, float64, same operation order as
    kernel.bm25.bm25_term_score so engine and oracle sums are bit-identical."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_positions(positions: list, tfs: np.ndarray) -> bytes:
    """Per-posting ascending position lists -> one varint stream.

    Deltas are taken WITHIN each posting's list (first value absolute);
    posting boundaries need no markers because tf == len(positions) is
    already stored. Vectorized: one flat array, per-posting-start values
    restored by subtracting the previous element only off-boundary."""
    if not positions:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.uint64) for p in positions])
    counts = tfs.astype(np.int64)
    starts = np.cumsum(counts) - counts
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    deltas[starts] = flat[starts]  # absolute at each posting start
    return varint_encode(deltas)


def decode_positions(pos_bin: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat positions uint64, per-posting start offsets int64).

    posting i's positions = flat[offsets[i] : offsets[i] + tfs[i]]."""
    counts = tfs.astype(np.int64)
    total = int(counts.sum())
    deltas = varint_decode(pos_bin, total)
    cs = np.cumsum(deltas, dtype=np.uint64)
    starts = np.cumsum(counts) - counts
    # undo the global cumsum at posting boundaries: subtract the running
    # total accumulated BEFORE each posting
    prior = np.zeros(counts.size, dtype=np.uint64)
    prior[1:] = cs[starts[1:] - 1]
    flat = cs - np.repeat(prior, counts)
    return flat, starts


def encode_segment(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                   avgdl: float, k1: float = BM25_K1, b: float = BM25_B,
                   block: int = POSTING_BLOCK) -> dict:
    """Encode one (term, salt) posting segment. doc_ids must be sorted ascending."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    n = doc_ids.size
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    tfn = tfn_scores(tfs, dls, avgdl, k1, b)
    nblocks = (n + block - 1) // block
    block_last = np.empty(nblocks, dtype=np.int64)
    block_max = np.empty(nblocks, dtype=np.float64)
    for i in range(nblocks):
        lo, hi = i * block, min((i + 1) * block, n)
        block_last[i] = doc_ids[hi - 1]
        block_max[i] = tfn[lo:hi].max()
    return {
        "n_docs": n,
        "cf": int(tfs.sum()),
        "docs_bin": varint_encode(deltas),
        "tfs_bin": varint_encode(tfs - np.uint64(1)),
        "dls_bin": varint_encode(dls),
        "block_last": block_last,
        "block_max": block_max,
    }


def decode_segment(docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes,
                   n_docs: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids uint64 ascending, tfs uint64, dls uint64)."""
    deltas = varint_decode(docs_bin, n_docs)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs = varint_decode(tfs_bin, n_docs) + np.uint64(1)
    dls = varint_decode(dls_bin, n_docs)
    return doc_ids, tfs, dls
