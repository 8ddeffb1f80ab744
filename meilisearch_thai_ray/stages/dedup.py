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

# bump when signature/band semantics change — keys persisted sketch-index
# caches (a stale mh_index would silently pair against incompatible bands)
MINHASH_VERSION = 3

# (num_perm, bands) presets — the LSH S-curve midpoint is ~(1/bands)^(1/r)
# with r = num_perm // bands rows per band:
#   strict: r=8 -> midpoint ~0.77, near-vertical at J~0.9. Low false-candidate
#           rate even on small-vocab corpora (background J~0.5 collides <3%);
#           misses J~0.85 near-dups (measured recall curve in test_dedup).
#   near:   r=4 -> midpoint ~0.50. Recalls the J>=0.8 near-dups LLM curation
#           targets (>=0.9 recall at J=0.85, pytest-measured) at the cost of
#           more candidates on self-similar corpora — pair it with a higher
#           verify threshold / max_verify budget there.
# Band configs are part of a persisted sketch index's identity: band hashes
# from different presets never match, so an index dir must be keyed by the
# preset (see dedup_pipelines.write_minhash_index).
BAND_PRESETS: dict[str, tuple[int, int]] = {
    "strict": (64, 8),
    "near": (64, 16),
}


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


# splitmix64 finalizer constants (public domain, Steele et al. / Vigna)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_S30, _S27, _S31 = np.uint64(30), np.uint64(27), np.uint64(31)


def _splitmix_permute(x: np.ndarray, gamma: np.uint64) -> np.ndarray:
    """Pseudorandom BIJECTION of [0, 2^64) — the per-permutation hash of
    the MinHash family. Add-gamma (mod 2^64), xorshift, and multiply-by-odd
    are each bijective, so distinct shingles never collide within one
    permutation and the min over a doc's shingle set is a true MinHash of a
    (pseudo)random universe permutation. 10 wrap-free uint64 numpy ops —
    ~1.6x cheaper than the previous (a*x+b) mod 2^61-1 family, whose wide
    product needed a split multiply + three fold/reduce steps."""
    z = x + gamma          # uint64 wraparound is the intended mod-2^64 add
    z = z ^ (z >> _S30)
    z = z * _MIX1
    z = z ^ (z >> _S27)
    z = z * _MIX2
    return z ^ (z >> _S31)


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
        # one random 64-bit gamma per permutation; _splitmix_permute(x,
        # gamma) is a bijection of the universe, so each permutation's
        # argmin is a uniform-ish choice over the doc's shingle set. (An
        # earlier affine family with coefficients bounded by the 31-bit
        # shingle modulus was piecewise monotone — its argmin was one of
        # just TWO shingles, and small-vocab corpora collided on entire
        # signatures: 1.7% of J~0.016 pairs matched >= 8/64 values.)
        self.gammas = rng.integers(0, 1 << 64, size=num_perm,
                                   dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        return np.array([
            _splitmix_permute(sh, self.gammas[p]).min()
            for p in range(self.num_perm)], dtype=np.uint64)

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) signatures in ONE numpy pass per permutation
        over the batch's concatenated shingles — bit-identical to per-doc
        signature() (asserted in tests)."""
        n = len(texts)
        sh_list = [_shingle_hashes(t, self.k) for t in texts]
        lens = np.fromiter((s.size for s in sh_list), dtype=np.int64, count=n)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        flat = np.concatenate(sh_list)  # every doc has >= 1 shingle hash
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        # preallocated work buffers + out= everywhere: the naive form
        # allocates a temporary per op and first-touch page faults dominate
        # the whole stage on this box (measured 2.1 s cold vs 0.4 s with
        # reuse for a 400-doc batch). The op sequence mirrors
        # _splitmix_permute exactly (bit-identity asserted in tests).
        x = np.empty(flat.size, dtype=np.uint64)
        t = np.empty(flat.size, dtype=np.uint64)
        for p in range(self.num_perm):
            np.add(flat, self.gammas[p], out=x)      # z = x + gamma
            np.right_shift(x, _S30, out=t)
            np.bitwise_xor(x, t, out=x)              # z ^= z >> 30
            np.multiply(x, _MIX1, out=x)
            np.right_shift(x, _S27, out=t)
            np.bitwise_xor(x, t, out=x)              # z ^= z >> 27
            np.multiply(x, _MIX2, out=x)
            np.right_shift(x, _S31, out=t)
            np.bitwise_xor(x, t, out=x)              # z ^= z >> 31
            sig[:, p] = np.minimum.reduceat(x, offs)
        return sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        from ..functions.hashing import fnv1a64

        out = np.empty(self.bands, dtype=np.uint64)
        for bi in range(self.bands):
            seg = sig[bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
            out[bi] = fnv1a64(seg.tobytes())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_batch

        doc_ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        texts = batch["text"].to_pylist()
        n = len(texts)
        sig = self.signatures_batch(texts)
        # band hash = FNV over the band's raw signature bytes, exactly like
        # band_hashes() — fnv1a64_batch is bit-identical to the scalar loop
        segs: list[bytes] = []
        for bi in range(self.bands):
            block = np.ascontiguousarray(
                sig[:, bi * self.rows_per_band:(bi + 1) * self.rows_per_band])
            segs.extend(block[i].tobytes() for i in range(n))
        bh = fnv1a64_batch(segs).reshape(self.bands, n)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                         n)),
                "band_hash": pa.array(bh.T.reshape(-1).astype(np.int64)),
            }
        )


def lsh_candidate_pairs(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """map_groups body for groupby(band, band_hash): emit candidate pairs
    (a < b). Buckets larger than max_bucket are capped (pairs of the first
    max_bucket members) — the cap is recorded in the output.

    Kept as the semantic oracle for the sorted-block fast path below
    (block_candidate_pairs + boundary merge), which replaces the per-bucket
    map_groups dispatch: Ray pays a Python call + table build per GROUP, and
    LSH produces nearly one group per band row, so map_groups cost scaled
    with the corpus, not with the (rare) multi-member buckets."""
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


def _bucket_segments(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of the contiguous (band, band_hash) runs in a block of
    the globally (band, band_hash)-SORTED band-row stream."""
    band = batch["band"].to_numpy(zero_copy_only=False)
    h = batch["band_hash"].to_numpy(zero_copy_only=False)
    if band.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero((band[1:] != band[:-1]) | (h[1:] != h[:-1])) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    ends = np.concatenate([change, [band.size]]).astype(np.int64)
    return starts, ends


def _ids_to_pairs(ids: np.ndarray, max_bucket: int) -> tuple:
    """Sorted-unique member ids -> (a, b) arrays of the bucket's candidate
    pairs, capped to the first max_bucket members (lsh_candidate_pairs
    semantics, vectorized)."""
    capped = ids.size > max_bucket
    if capped:
        print(
            f"[lsh_candidate_pairs] bucket of {ids.size} docs capped to "
            f"{max_bucket} (corpus is mostly duplicates at this band width)"
        )
        ids = ids[:max_bucket]
    iu, ju = np.triu_indices(ids.size, k=1)
    return ids[iu], ids[ju]


def block_candidate_pairs(batch: pa.Table, max_bucket: int = 200) -> pa.Table:
    """Per-BLOCK candidate pairs over the (band, band_hash)-sorted band-row
    stream (batch == one sorted block). The block's first and last runs may
    continue in neighboring blocks, so they are SKIPPED here and handled by
    the boundary pass (block_boundary_members + pairs_from_members) — every
    bucket is owned by exactly one of the two passes, so no pair is emitted
    twice and none is lost. Only multi-member interior runs do any work:
    this is why it replaces groupby.map_groups (see lsh_candidate_pairs)."""
    starts, ends = _bucket_segments(batch)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if starts.size <= 2:  # 0-2 runs: everything is a boundary run
        return empty
    ids_all = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_a, out_b = [], []
    for s, e in zip(starts[1:-1], ends[1:-1]):
        if e - s < 2:
            continue
        a, b = _ids_to_pairs(np.unique(ids_all[s:e]), max_bucket)
        out_a.append(a)
        out_b.append(b)
    if not out_a:
        return empty
    return pa.table({
        "a": pa.array(np.concatenate(out_a), pa.int64()),
        "b": pa.array(np.concatenate(out_b), pa.int64()),
    })


def block_boundary_members(batch: pa.Table) -> pa.Table:
    """The first and last (band, band_hash) runs of a sorted block — the
    runs block_candidate_pairs skips. At most 2 buckets' members per block
    leave the task; the driver merges the pieces by key and pairs them
    (pairs_from_members). A degenerate corpus whose one bucket spans many
    blocks concentrates here — exactly the corpus where the max_bucket cap
    fires anyway."""
    starts, ends = _bucket_segments(batch)
    if starts.size == 0:
        return pa.table({"band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    take = np.concatenate([
        np.arange(starts[0], ends[0]),
        np.arange(starts[-1], ends[-1]) if starts.size > 1
        else np.empty(0, np.int64),
    ])
    return batch.select(["band", "band_hash", "doc_id"]).take(
        pa.array(take.astype(np.int64)))


def pairs_from_members(members: pa.Table, max_bucket: int = 200) -> pa.Table:
    """Driver-side pairing of the boundary buckets: group (band, band_hash,
    doc_id) member rows by key, emit each bucket's capped pairs. Input is
    <= 2 buckets per block by construction — tiny."""
    if members.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    band = members["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = members["band_hash"].to_numpy(zero_copy_only=False)
    ids = members["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h, band))
    band, h, ids = band[order], h[order], ids[order]
    change = np.flatnonzero((band[1:] != band[:-1]) | (h[1:] != h[:-1])) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [band.size]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        a, b = _ids_to_pairs(np.unique(ids[s:e]), max_bucket)
        out_a.append(a)
        out_b.append(b)
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    return pa.table({
        "a": pa.array(np.concatenate(out_a), pa.int64()),
        "b": pa.array(np.concatenate(out_b), pa.int64()),
    })


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
        # pyarrow.dataset() accepts a directory as a SINGLE path but not
        # inside a LIST (list elements must be files) — expand directories
        # (e.g. a Ray write_parquet output dir) once per actor
        if isinstance(docs_path, (list, tuple)):
            from ..sources.documents import expand_parquet_paths

            docs_path = expand_parquet_paths(list(docs_path))
        self.docs_path = docs_path
        self.threshold = threshold
        self.k = shingle_k
        self.cache_cap = cache_cap
        # per-doc SORTED-unique shingle-hash arrays (what _shingle_hashes
        # returns): set algebra becomes searchsorted membership counting
        self._shingles: dict[int, np.ndarray] = {}

    def _shingle_arrays(self, doc_ids: list[int]) -> dict[int, np.ndarray]:
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

            # range conjunction: parquet row groups prune on doc_id min/max
            # stats, so a batch whose ids span a narrow window (the verify
            # stage sorts candidates into id-space cells for exactly this —
            # dedup_pipelines._cluster_for_verify) reads only that window's
            # row groups instead of stats-scanning the whole docs table
            t = pads.dataset(self.docs_path).to_table(
                columns=["doc_id", "text"],
                filter=(pc.field("doc_id") >= min(missing))
                & (pc.field("doc_id") <= max(missing))
                & pc.field("doc_id").isin(missing),
            )
            for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                self._shingles[d] = _shingle_hashes(txt, self.k)
        return {d: self._shingles[d] for d in doc_ids if d in self._shingles}

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_arr = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_arr = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        arrs = self._shingle_arrays(sorted({*a_arr.tolist(), *b_arr.tolist()}))
        # drop pairs whose doc vanished from the table between stages
        ok = np.fromiter(((a in arrs and b in arrs)
                          for a, b in zip(a_arr.tolist(), b_arr.tolist())),
                         dtype=bool, count=a_arr.size)
        a_arr, b_arr = a_arr[ok], b_arr[ok]
        if a_arr.size == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        # group pairs by `a`: ONE searchsorted over the concatenated partner
        # arrays per group replaces a python set-intersection per pair
        order = np.argsort(a_arr, kind="stable")
        a_s, b_s = a_arr[order], b_arr[order]
        g_starts = np.concatenate(
            [[0], np.flatnonzero(a_s[1:] != a_s[:-1]) + 1, [a_s.size]])
        inter = np.empty(a_s.size, dtype=np.int64)
        len_b = np.empty(a_s.size, dtype=np.int64)
        len_a = np.empty(a_s.size, dtype=np.int64)
        for gi in range(g_starts.size - 1):
            s, e = int(g_starts[gi]), int(g_starts[gi + 1])
            sa = arrs[int(a_s[s])]
            parts = [arrs[int(x)] for x in b_s[s:e]]
            lens = np.fromiter((p.size for p in parts), dtype=np.int64,
                               count=e - s)
            flat = np.concatenate(parts) if parts else np.empty(0, np.uint64)
            if sa.size and flat.size:
                pos = np.searchsorted(sa, flat)
                hit = (pos < sa.size) & (sa[np.minimum(pos, sa.size - 1)]
                                         == flat)
            else:
                hit = np.zeros(flat.size, dtype=bool)
            cs = np.concatenate([[0], np.cumsum(hit)])
            bounds = np.concatenate([[0], np.cumsum(lens)])
            inter[s:e] = cs[bounds[1:]] - cs[bounds[:-1]]
            len_b[s:e] = lens
            len_a[s:e] = sa.size
        union = len_a + len_b - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        # threshold the UNROUNDED value, round only what survives — the
        # original per-pair semantics (round(j, 6) after the >= check)
        keep = jac >= self.threshold
        return pa.table(
            {
                "a": pa.array(a_s[keep], pa.int64()),
                "b": pa.array(b_s[keep], pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
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
