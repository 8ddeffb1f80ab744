"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — one numpy matmul per batch against a
broadcast query matrix (queries shipped once via ray.put / constructor args,
never per batch), per-batch partial top-k, tiny driver-side merge. This is the
scale path for "score everything" jobs: N docs stream through, only
batch-local top-k rows leave each task.

Scale variant: LSH-bucketed search — random-hyperplane signatures assign each
vector to a bucket; queries probe only matching buckets (stages emit bucket ids
so the expensive matmul runs on a fraction of the data). Recall is approximate;
the brute-force path is the correctness oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if arr.num_chunks == 1:
        flat = arr.chunk(0)
    else:
        flat = arr.combine_chunks()
    values = np.asarray(flat.values, dtype=np.float64)
    n = len(flat)
    return values.reshape(n, -1)


class BruteForceCosineTopK:
    """Per-batch partial top-k by cosine similarity to one query vector.

    Emits at most k rows per batch; final exact top-k = sort of the concatenated
    partials (tiny). Similarity is float64, rounded to `round_to` decimals for
    oracle parity (ties then break by vec_id)."""

    def __init__(self, query_vec, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_to: int = 6):
        q = np.asarray(query_vec, dtype=np.float64)
        self.q = q / np.linalg.norm(q)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ self.q) / norms
        sims = np.round(sims, self.round_to)
        ids = np.asarray(batch[self.id_col].to_numpy(zero_copy_only=False))
        k = min(self.k, sims.size)
        if k < sims.size:
            kth = np.partition(sims, sims.size - k)[sims.size - k]
            sel = np.flatnonzero(sims >= kth)
        else:
            sel = np.arange(sims.size)
        return pa.table(
            {
                "vec_id": pa.array(ids[sel].astype(np.int64)),
                "sim": pa.array(sims[sel].astype(np.float64)),
            }
        )


def adc_shortlist_floor(n_probed: int, k: int = 10) -> int:
    """Minimum safe refine-shortlist size for the residual IVF+PQ query:
    max(10*k, 2% of the probed code count).

    Derived from the MEASURED recall-vs-shortlist curve at 1M vectors
    (scripts/scale_proof_ann.py ANN_SHORTLISTS sweep, BASELINE.md): strict
    recall@10 is 0/10 up to ~0.6% of probed codes and 10/10 from ~1.3%,
    because ADC error (std ~0.05 on residual d2) dwarfs the true-sim gap
    inside a tight cluster — the true neighbors' ADC ranks spread across
    the ~N/nlist near-tie set, which grows LINEARLY with corpus size. A
    constant shortlist therefore silently degrades as the corpus grows;
    2% of probed holds ~1.5x margin over the measured knee while keeping
    the refine read O(probed/50). Diagnosed NOT to be codebook collapse
    (256/256 codes used per subspace, ~7.8 bits entropy)."""
    return int(max(10 * k, -(-n_probed * 2 // 100)))


def merge_topk(partials: pa.Table, k: int = 10) -> pa.Table:
    """Driver-side exact merge of per-batch partials: (-sim, vec_id) order."""
    ids = partials["vec_id"].to_numpy(zero_copy_only=False)
    sims = partials["sim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order].astype(np.int64)),
            "sim": pa.array(sims[order].astype(np.float64)),
        }
    )


def kmeans_fit(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample (deterministic seed).
    Returns (k, dim) float64 centroids — the broadcast small side of IVF."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(sample, dtype=np.float64)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


# splitmix64 finalizer (public domain; same constants as stages/dedup.py)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: np.ndarray) -> np.ndarray:
    z = z ^ (z >> np.uint64(30))
    z = z * _MIX1
    z = z ^ (z >> np.uint64(27))
    z = z * _MIX2
    return z ^ (z >> np.uint64(31))


def _row_keys(mat: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit key per vector from its float64 bits — a
    column-vectorized splitmix fold (no id column needed, independent of
    block layout/order). Drives the corpus-wide hash sample below."""
    bits = np.ascontiguousarray(mat, dtype=np.float64).view(np.uint64)
    # per-column salts as an ARRAY op (numpy scalar uint64 overflow warns;
    # array arithmetic wraps silently, which is the intended mod-2^64)
    salts = np.arange(1, bits.shape[1] + 1, dtype=np.uint64) * _GAMMA
    acc = np.zeros(bits.shape[0], dtype=np.uint64)
    for j in range(bits.shape[1]):
        acc ^= _mix64(bits[:, j] + salts[j])
    return _mix64(acc)


def hash_sample_matrix(ds, n: int, vec_col: str = "embedding") -> np.ndarray:
    """Deterministic corpus-WIDE sample of n vectors: the n rows with the
    smallest hash keys. One streaming pass — each batch emits its <= n
    smallest-key rows, the driver merges the tiny partials. Unlike
    `ds.limit(n)` (head blocks only), the sample is uniform over the whole
    corpus regardless of input order/partitioning: a lang- or time-sorted
    100-TB corpus yields head blocks from ONE slice, which degenerates
    k-means init (asserted in tests)."""
    import ray

    def _partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        keys = _row_keys(mat)
        m = min(n, keys.size)
        sel = (np.argpartition(keys, m - 1)[:m]
               if m < keys.size else np.arange(keys.size))
        return pa.table({
            "key": pa.array(keys[sel].astype(np.uint64)),
            "v": pa.array([mat[i].tolist() for i in sel],
                          pa.list_(pa.float64())),
        })

    parts = [t for t in ray.get(
        ds.map_batches(_partial, batch_format="pyarrow",
                       batch_size=4096).to_arrow_refs()) if t.num_rows]
    if not parts:
        return np.empty((0, 0), dtype=np.float64)
    t = pa.concat_tables(parts)
    keys = t["key"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")[:n]
    col = t["v"].combine_chunks()
    dim = len(col[0]) if len(col) else 0
    flat = np.asarray(col.values, dtype=np.float64).reshape(-1, dim)
    return flat[order]


def kmeans_fit_distributed(ds, k: int, iters: int = 10,
                           vec_col: str = "embedding",
                           init: np.ndarray | None = None,
                           seed: int = 13) -> np.ndarray:
    """Distributed Lloyd's k-means over a full Dataset — the scale-correct
    IVF trainer. Each iteration is ONE streaming pass: every batch emits a
    single partial row (per-centroid vector sums + member counts, k x dim
    floats), the driver merges the tiny partials and broadcasts the updated
    centroids into the next pass's task closures. The corpus never leaves
    the workers; driver traffic is O(k * dim * batches) per iteration.

    Same update rule as kmeans_fit (empty clusters keep their centroid), so
    the two agree to float-summation order on identical input+init
    (asserted in tests)."""
    if init is None:
        # deterministic CORPUS-WIDE hash sample (not head blocks: the first
        # blocks of a sorted/partitioned corpus are a biased slice and make
        # init degenerate — see hash_sample_matrix)
        sample = hash_sample_matrix(ds, max(k * 8, 256), vec_col)
        rng = np.random.default_rng(seed)
        k = min(k, len(sample))
        centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    else:
        centroids = np.asarray(init, dtype=np.float64).copy()
        k = len(centroids)
    dim = centroids.shape[1]

    def _partials(batch: pa.Table, cents: np.ndarray) -> pa.Table:
        mat = _batch_matrix(batch, vec_col)
        d2 = ((mat ** 2).sum(axis=1)[:, None] - 2.0 * (mat @ cents.T)
              + (cents ** 2).sum(axis=1)[None, :])
        assign = d2.argmin(axis=1)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        return pa.table({
            "sums": pa.array([sums.tobytes()], pa.binary()),
            "counts": pa.array([counts.tobytes()], pa.binary()),
        })

    import functools

    for _ in range(iters):
        rows = ds.map_batches(
            functools.partial(_partials, cents=centroids),
            batch_format="pyarrow", batch_size=4096,
        ).take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.float64)
        for r in rows:
            sums += np.frombuffer(r["sums"], dtype=np.float64).reshape(k, dim)
            counts += np.frombuffer(r["counts"], dtype=np.float64)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


class IvfAssign:
    """IVF list assignment: vec -> nearest centroid id (stateful stage; the
    centroid matrix ships once per actor/worker via constructor args)."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        d2 = (
            (mat ** 2).sum(axis=1)[:, None]
            - 2.0 * (mat @ self.centroids.T)
            + (self.centroids ** 2).sum(axis=1)[None, :]
        )
        lists = d2.argmin(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


def ivf_search(listed_table: pa.Table, centroids: np.ndarray, query_vec,
               k: int = 10, nprobe: int = 4, round_to: int = 6) -> pa.Table:
    """Probe only the nprobe nearest IVF lists — the ANN scale path (recall is
    approximate; BruteForceCosineTopK is the exact oracle)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cd = ((np.asarray(centroids) - q[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(cd)[:nprobe].tolist())
    mask = np.isin(
        np.asarray(listed_table["ivf_list"].to_numpy(zero_copy_only=False)),
        list(probe),
    )
    sub = listed_table.filter(pa.array(mask))
    if sub.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    mat = _batch_matrix(sub, "embedding")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ qn) / norms, round_to)
    ids = np.asarray(sub["vec_id"].to_numpy(zero_copy_only=False))
    order = np.lexsort((ids, -sims))[:k]
    return pa.table({"vec_id": pa.array(ids[order].astype(np.int64)),
                     "sim": pa.array(sims[order].astype(np.float64))})


class IvfProbeTopK:
    """Distributed IVF probe stage: per batch, keep only rows whose ivf_list
    is among the query's nprobe nearest lists, then emit the batch-local
    cosine top-k of the survivors. Centroids + query ship once per actor via
    constructor args; ≤ k rows leave each task; the driver merge is tiny.

    nprobe == nlist probes everything — exact (equals BruteForceCosineTopK,
    SQL-oracle-verified); smaller nprobe trades recall for a proportional cut
    of the matmul work (the ANN scale path)."""

    def __init__(self, centroids: np.ndarray, query_vec, k: int = 10,
                 nprobe: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_to: int = 6):
        q = np.asarray(query_vec, dtype=np.float64)
        self.qn = q / np.linalg.norm(q)
        cd = ((np.asarray(centroids, dtype=np.float64) - q[None, :]) ** 2).sum(axis=1)
        self.probe = np.sort(np.argsort(cd)[:nprobe]).astype(np.int32)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = np.asarray(batch["ivf_list"].to_numpy(zero_copy_only=False))
        mask = np.isin(lists, self.probe)
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if not mask.any():
            return empty
        sub = batch.filter(pa.array(mask))
        mat = _batch_matrix(sub, self.vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ self.qn) / norms, self.round_to)
        ids = np.asarray(sub[self.id_col].to_numpy(zero_copy_only=False))
        k = min(self.k, sims.size)
        if k < sims.size:
            kth = np.partition(sims, sims.size - k)[sims.size - k]
            sel = np.flatnonzero(sims >= kth)
        else:
            sel = np.arange(sims.size)
        return pa.table({"vec_id": pa.array(ids[sel].astype(np.int64)),
                         "sim": pa.array(sims[sel].astype(np.float64))})


class LshBucketAssign:
    """Random-hyperplane LSH: vec -> nbits-bit bucket id (seeded planes built
    once per actor). Query-time: probe buckets within `probe_hamming` bits."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 11,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.nbits = nbits
        self.vec_col = vec_col

    def bucket_of(self, vec: np.ndarray) -> int:
        bits = (np.asarray(vec, dtype=np.float64) @ self.planes) > 0
        return int((bits.astype(np.uint64) << np.arange(self.nbits, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        bits = (mat @ self.planes) > 0
        buckets = (bits.astype(np.uint64) << np.arange(self.nbits, dtype=np.uint64)).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets.astype(np.int32)))


# ----------------------------------------------- product quantization (PQ)

def pq_train(ds, m: int = 8, codes: int = 256, iters: int = 10,
             sample_n: int = 4096, vec_col: str = "embedding",
             seed: int = 13) -> list[np.ndarray]:
    """Train PQ codebooks (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): split the (L2-normalized) embedding space
    into m subspaces and k-means each one to `codes` centroids. Trains on
    the corpus-WIDE hash sample (same rationale as IVF init: head blocks of
    a sorted corpus degenerate), so driver cost is O(sample_n * dim) —
    independent of corpus size. Returns one (codes, sub_dim) array per
    subspace (sub_dims may differ by 1 when m doesn't divide dim)."""
    sample = hash_sample_matrix(ds, sample_n, vec_col)
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0] = 1.0
    sample = sample / norms[:, None]
    return [kmeans_fit(sub, codes, iters=iters, seed=seed + i)
            for i, sub in enumerate(np.array_split(sample, m, axis=1))]


class PqEncode:
    """Encode vectors to m uint8 codes (m bytes/vector: a 100-TB float32
    corpus compresses ~dim*4/m-fold; at dim=64, m=8 that is 32x). Vectors
    are L2-normalized first so ADC's L2 distances are monotone in cosine
    (||a-b||^2 = 2 - 2cos on the unit sphere). Stateful stage: codebooks
    ship once per actor/worker via constructor args."""

    def __init__(self, codebooks: list[np.ndarray],
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.codebooks = [np.asarray(c, dtype=np.float64) for c in codebooks]
        self.id_col = id_col
        self.vec_col = vec_col
        self.splits = np.cumsum([c.shape[1] for c in self.codebooks])[:-1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        out = np.empty((mat.shape[0], len(self.codebooks)), dtype=np.uint8)
        for i, (sub, cb) in enumerate(
                zip(np.split(mat, self.splits, axis=1), self.codebooks)):
            d2 = ((sub ** 2).sum(axis=1)[:, None] - 2.0 * (sub @ cb.T)
                  + (cb ** 2).sum(axis=1)[None, :])
            out[:, i] = d2.argmin(axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch[self.id_col].cast(pa.int64()),
            "pq_code": pa.array(list(out.tobytes()[i * out.shape[1]:
                                                   (i + 1) * out.shape[1]]
                                     for i in range(out.shape[0])),
                                pa.binary()),
        })


class PqAdcTopK:
    """Asymmetric-distance top-k over PQ codes: the query builds an
    (m x codes) distance table ONCE; each batch's approximate distance is m
    table lookups + a sum — no float vectors are ever read back. Emits <= k
    partial rows per batch; merge with merge_topk on (approximate) sim =
    1 - d2/2 (exact cosine identity on the unit sphere, approximate through
    the codebook)."""

    def __init__(self, codebooks: list[np.ndarray], query_vec,
                 k: int = 10, round_to: int = 6):
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        splits = np.cumsum([c.shape[1] for c in codebooks])[:-1]
        self.tables = np.stack([
            ((sub[None, :] - np.asarray(cb)) ** 2).sum(axis=1)
            for sub, cb in zip(np.split(q, splits), codebooks)
        ])  # (m, codes)
        self.k = k
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        codes = np.frombuffer(
            b"".join(batch["pq_code"].to_pylist()), dtype=np.uint8
        ).reshape(batch.num_rows, -1)
        d2 = self.tables[np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
        sims = np.round(1.0 - d2 / 2.0, self.round_to)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        k = min(self.k, sims.size)
        kth = (np.partition(sims, sims.size - k)[sims.size - k]
               if k < sims.size else -np.inf)
        sel = np.flatnonzero(sims >= kth)
        return pa.table({
            "vec_id": pa.array(ids[sel].astype(np.int64)),
            "sim": pa.array(sims[sel].astype(np.float64)),
        })


# ------------------------------------------------ residual IVF+PQ (faiss-style)

def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def pq_train_residual(ds, centroids: np.ndarray, m: int = 8,
                      codes: int = 256, iters: int = 10,
                      sample_n: int = 4096, vec_col: str = "embedding",
                      seed: int = 13) -> list[np.ndarray]:
    """Codebooks over IVF RESIDUALS (Jégou et al. 2011 §IV-A, the faiss
    IVFPQ composition): each sample vector normalizes, assigns to its
    nearest centroid, and the PQ quantizes v - c — residual magnitudes are
    a fraction of vector magnitudes, so the same m bytes spend their
    resolution on the part the coarse quantizer could not explain."""
    cents = np.asarray(centroids, dtype=np.float64)
    sample = _normalize_rows(hash_sample_matrix(ds, sample_n, vec_col))
    d2 = ((sample ** 2).sum(axis=1)[:, None] - 2.0 * (sample @ cents.T)
          + (cents ** 2).sum(axis=1)[None, :])
    resid = sample - cents[d2.argmin(axis=1)]
    return [kmeans_fit(sub, codes, iters=iters, seed=seed + i)
            for i, sub in enumerate(np.array_split(resid, m, axis=1))]


class IvfPqResidualEncode:
    """(vec_id, embedding) -> (vec_id, pq_code, ivf_list), residual form:
    normalize, coarse-assign, PQ-encode v - centroid[list]. Stateful stage;
    codebooks + centroids ship once per actor via constructor args."""

    def __init__(self, codebooks: list[np.ndarray], centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.codebooks = [np.asarray(c, dtype=np.float64) for c in codebooks]
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.id_col = id_col
        self.vec_col = vec_col
        self.splits = np.cumsum([c.shape[1] for c in self.codebooks])[:-1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize_rows(_batch_matrix(batch, self.vec_col))
        cents = self.centroids
        d2 = ((mat ** 2).sum(axis=1)[:, None] - 2.0 * (mat @ cents.T)
              + (cents ** 2).sum(axis=1)[None, :])
        lists = d2.argmin(axis=1)
        resid = mat - cents[lists]
        out = np.empty((mat.shape[0], len(self.codebooks)), dtype=np.uint8)
        for i, (sub, cb) in enumerate(
                zip(np.split(resid, self.splits, axis=1), self.codebooks)):
            sd2 = ((sub ** 2).sum(axis=1)[:, None] - 2.0 * (sub @ cb.T)
                   + (cb ** 2).sum(axis=1)[None, :])
            out[:, i] = sd2.argmin(axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": batch[self.id_col].cast(pa.int64()),
            "pq_code": pa.array(
                list(out.tobytes()[i * out.shape[1]:(i + 1) * out.shape[1]]
                     for i in range(out.shape[0])), pa.binary()),
            "ivf_list": pa.array(lists.astype(np.int32)),
        })


class IvfPqResidualTopK:
    """ADC over residual codes: the query builds ONE (m x codes) lookup
    table PER PROBED LIST from (q - centroid[list]) — approximate
    ||q - v||^2 = sum_j LUT_list[j, code_j] — then each batch groups its
    rows by list (np sort) and sums table lookups. Emits <= k rows/batch;
    sim = 1 - d2/2 (cosine identity on the unit sphere, approximate
    through the codebooks)."""

    def __init__(self, codebooks: list[np.ndarray], centroids: np.ndarray,
                 query_vec, probe_lists: list[int], k: int = 10,
                 round_to: int = 6):
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        cents = np.asarray(centroids, dtype=np.float64)
        splits = np.cumsum([c.shape[1] for c in codebooks])[:-1]
        self.tables = {}
        for li in probe_lists:
            rq = q - cents[li]
            self.tables[int(li)] = np.stack([
                ((sub[None, :] - np.asarray(cb)) ** 2).sum(axis=1)
                for sub, cb in zip(np.split(rq, splits), codebooks)
            ])  # (m, codes)
        self.k = k
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        codes = np.frombuffer(
            b"".join(batch["pq_code"].to_pylist()), dtype=np.uint8
        ).reshape(batch.num_rows, -1)
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
        d2 = np.empty(batch.num_rows, dtype=np.float64)
        cols = np.arange(codes.shape[1])[None, :]
        for li in np.unique(lists):
            rows = np.flatnonzero(lists == li)
            tab = self.tables[int(li)]
            d2[rows] = tab[cols, codes[rows]].sum(axis=1)
        sims = np.round(1.0 - d2 / 2.0, self.round_to)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        k = min(self.k, sims.size)
        kth = (np.partition(sims, sims.size - k)[sims.size - k]
               if k < sims.size else -np.inf)
        sel = np.flatnonzero(sims >= kth)
        return pa.table({
            "vec_id": pa.array(ids[sel].astype(np.int64)),
            "sim": pa.array(sims[sel].astype(np.float64)),
        })
