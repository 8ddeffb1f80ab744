"""Deduplication operators for large-scale training-data pipelines.

All are expressed Ray-Data-first:

  * exact dedup: content-hash column (vectorized map_batches) ->
    groupby(content_hash) aggregate min(doc_id)/count — hash-partition + per-
    group first (reference analog D2/D3: result_ranker.py:425-485 MD5 content
    hash; at dataset scale the O(n^2) SequenceMatcher clustering is replaced by
    hash/LSH families below).
  * MinHash + LSH near-dup: shingle -> minhash signature per doc (numpy,
    one matrix op per batch) -> explode to (band_id, band_hash) rows ->
    groupby(band) -> candidate pairs per bucket -> exact Jaccard verify.
  * SimHash near-dup: 64-bit simhash per doc; bucket by rotation bands.
  * n-gram Jaccard verify: exact pairwise verification of candidate pairs.

Partitioning assumption: the band groupby is the only shuffle; bucket sizes
are bounded because identical band hashes imply near-identical docs (salt-free
by construction — a pathological bucket means the corpus IS mostly duplicates,
in which case candidates are capped per bucket and the cap is logged).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


_SHINGLE_MOD = np.uint64(2147483647)  # 2^31-1: keeps 257*acc+255 < 2^64


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the byte k-gram shingle set (polynomial base-257 mod 2^31-1).

    Vectorized: the loop runs over the kk window positions (<=10), not the
    bytes — each iteration is one numpy pass over all shingles."""
    data = text.encode("utf-8", "ignore")
    if not data:
        return np.array([0], dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    kk = min(k * 2, len(b))  # ~k chars for ascii, fewer for multibyte
    win = np.lib.stride_tricks.sliding_window_view(b, kk)
    acc = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(kk):
        acc = (acc * np.uint64(257) + win[:, j]) % _SHINGLE_MOD
    return np.unique(acc)


def hash_bytes(data: bytes) -> int:
    from ..functions.hashing import fnv1a64

    return fnv1a64(data)


class MinHasher:
    """Stateful actor stage: doc -> num_perm minhash values -> band rows.

    __init__ draws the permutation parameters ONCE (seeded); __call__ emits
    (doc_id, band, band_hash) rows ready for the LSH groupby."""

    def __init__(self, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                 seed: int = 7):
        # 8 rows/band targets Jaccard ~0.8 dedup: P(band collision) = J^8,
        # so J=0.95 dups collide with ~99.98% overall recall while J=0.5
        # background similarity (common in small-vocab corpora) collides <3%
        # — 4 rows/band drowned real corpora in candidates
        rng = np.random.default_rng(seed)
        # coefficients bounded by the 31-bit shingle modulus: a*sh + b stays
        # < 2^62 + 2^31, so the uint64 product NEVER wraps before the mod
        # (a wider draw silently overflowed and broke min-wise independence)
        self.a = rng.integers(1, int(_SHINGLE_MOD), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_SHINGLE_MOD), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (num_perm, n_shingles) affine permutations mod Mersenne prime
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        from ..functions.hashing import fnv1a64

        out = np.empty(self.bands, dtype=np.uint64)
        for bi in range(self.bands):
            seg = sig[bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
            out[bi] = fnv1a64(seg.tobytes())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, t in zip(doc_ids, texts):
            bh = self.band_hashes(self.signature(t))
            out_doc.extend([d] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(int(x) for x in bh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(np.array(out_hash, dtype=np.uint64).astype(np.int64)),
            }
        )


def lsh_candidate_pairs(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """map_groups body for groupby(band, band_hash): emit candidate pairs
    (a < b). Buckets larger than max_bucket are capped (pairs of the first
    max_bucket members) — the cap is recorded in the output."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    capped = len(ids) > max_bucket
    ids = ids[:max_bucket]
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
            "capped": pa.array([capped] * len(a_out), pa.bool_()),
        }
    )


class JaccardVerify:
    """Actor-pool verify stage: batches of candidate (a, b) pairs -> verified
    (a, b, jaccard >= threshold) rows.

    Each task fetches ONLY its batch's candidate doc texts via a filtered
    parquet read (semi-join via the batch's id set — candidates are a tiny
    fraction of the corpus), computes each unique doc's shingle set once, and
    keeps a per-actor LRU-ish shingle cache across batches (a near-dup doc
    appears in many pairs). Nothing corpus-sized ever reaches the driver:
    only verified near-dup pairs leave each task."""

    def __init__(self, docs_path: str, threshold: float = 0.6,
                 shingle_k: int = 5, cache_cap: int = 200_000):
        self.docs_path = docs_path
        self.threshold = threshold
        self.k = shingle_k
        self.cache_cap = cache_cap
        self._shingles: dict[int, frozenset] = {}

    def _shingle_sets(self, doc_ids: list[int]) -> dict[int, frozenset]:
        # evict BEFORE deciding what to fetch — clearing after would drop
        # already-cached entries the CURRENT batch still needs, silently
        # losing those pairs as "doc vanished" (same rule as
        # SearchProxy._doc_texts)
        if len(self._shingles) > self.cache_cap:
            self._shingles.clear()
        missing = [d for d in doc_ids if d not in self._shingles]
        if missing:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            t = pads.dataset(self.docs_path).to_table(
                columns=["doc_id", "text"],
                filter=pc.field("doc_id").isin(missing),
            )
            for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                self._shingles[d] = frozenset(_shingle_hashes(txt, self.k).tolist())
        return {d: self._shingles[d] for d in doc_ids if d in self._shingles}

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        sets = self._shingle_sets(sorted({*a_ids, *b_ids}))
        out_a, out_b, out_j = [], [], []
        for a, b in zip(a_ids, b_ids):
            sa, sb = sets.get(a), sets.get(b)
            if sa is None or sb is None:
                continue  # doc vanished from the table between stages
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 1.0
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(np.asarray(out_j, dtype=np.float64),
                                    pa.float64()),
            }
        )


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class SimHasher:
    """64-bit SimHash over token unigrams; near-dups share most bits.

    Emits (doc_id, simhash, band0..band3) — 16-bit bands for bucketing.

    Fully vectorized: unique tokens across the batch are hashed ONCE with the
    column-wise FNV kernel (fnv1a64_batch), then per-doc bit sums accumulate
    via one bincount per bit position — no per-token python loop. Output is
    bit-identical to the scalar per-token form (asserted in tests)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_batch

        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(texts)
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        flat = [tok for toks in tok_lists for tok in toks]
        sims = np.zeros(n, dtype=np.uint64)
        if flat:
            hs_all = fnv1a64_batch(flat)  # (T,) column-wise FNV kernel
            # per-doc majority vote per bit: tokens of one doc are contiguous
            # in flat order, so a 1D reduceat per bit position replaces the
            # per-token python loop (measured 3x total over the scalar form)
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
            acc_pos = np.empty((n, 64), dtype=np.int64)
            for b in range(64):
                bit = ((hs_all >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                acc_pos[:, b] = 2 * np.add.reduceat(bit, offsets) - counts
            shifts = np.arange(64, dtype=np.uint64)
            sims = (
                (acc_pos > 0).astype(np.uint64) << shifts[None, :]
            ).sum(axis=1, dtype=np.uint64)
        cols = {"doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(sims.astype(np.int64))}
        for bi in range(4):
            band = ((sims >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int32)
            cols[f"band{bi}"] = pa.array(band)
        return pa.table(cols)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
