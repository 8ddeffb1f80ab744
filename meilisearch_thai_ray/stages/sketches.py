"""Mergeable sketches for corpus-scale statistics.

Three classic one-pass, mergeable summaries — the aggregation shapes that
stay cheap at 100 TB because every worker emits a tiny fixed-size partial
and the merge is associative (no shuffle of raw values ever happens):

- HyperLogLog (Flajolet et al. 2007): approximate COUNT DISTINCT in
  m = 2^p bytes with ~1.04/sqrt(m) relative error. Partial = the register
  array; merge = elementwise max.
- Misra-Gries (1982) / frequent items: every item with true frequency
  > n/k is guaranteed to be in the k-counter summary, and counts are
  under-estimated by at most n/k. Partial = the counter dict; merge =
  counter addition + decrement (Berinde et al. 2010 preserves the bound).
  Used as pass 1 of the EXACT two-pass heavy-hitters pipeline
  (pipelines/corpus_stats.py): the sketch only proposes candidates, a
  second broadcast-filtered counting pass makes the output exact.
- Bounded-domain histogram: for integer columns with a bounded value range
  (lengths, counts, small measures) a dense bincount partial gives EXACT
  distributions — and therefore exact quantiles — with one tiny merge.

Reference analog: the reference keeps corpus statistics (document counts,
language distribution, processing metrics) as in-memory singletons
(src/tokenizer/query_processor.py cache stats, src/api/ health metrics);
here they are distributed aggregates over the corpus itself.

All kernels are integer-domain vectorized; note this VM's pathologies
(large int64->float64 astype is ~1 us/element — see CLAUDE.md), so bit
lengths use an integer binary search, never a float log2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ------------------------------------------------------------ hashing kernel

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform 64-bit mix of an int array.
    (Steele et al. 2014 — the standard avalanche used to hash integer keys;
    numpy uint64 arithmetic wraps mod 2^64 like the C original.)"""
    z = x.astype(np.uint64, copy=True)
    z += _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0): integer binary search —
    6 compares, no float conversion (exact for all 64 bits, and avoids this
    box's slow int->float astype)."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = x >= (np.uint64(1) << s)
        out[big] += shift
        x[big] >>= s
    out[x > 0] += 1
    return out


# ------------------------------------------------------------- HyperLogLog

# alpha_m bias constant for m >= 128 (Flajolet et al. 2007, Fig. 3)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    """Dense HLL over 64-bit hashed keys. p register-index bits, m = 2^p
    uint8 registers; estimate error ~1.04/sqrt(m) (0.8% at p=14)."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def update_ints(self, ids: np.ndarray) -> "HyperLogLog":
        """Absorb a batch of integer keys (vectorized, no per-row loop)."""
        if ids.size == 0:
            return self
        h = splitmix64(np.asarray(ids))
        q = 64 - self.p
        idx = (h >> np.uint64(q)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(q)) - np.uint64(1))
        # rho = leading-zero count of the q-bit suffix + 1
        rho = (q - bit_length_u64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        # registers are uint8 (tiny array): float conversion here is cheap
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:  # small-range: linear counting on empty registers
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * float(np.log(m / zeros))
        return float(raw)


# ------------------------------------------------------------- Misra-Gries

def mg_shrink(items: np.ndarray, counts: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """The Misra-Gries decrement step on (unique item, count) arrays: keep
    at most k items by subtracting the (k+1)-th largest count from all and
    dropping non-positives. Returns (items, counts, err) where err is the
    subtracted threshold — each surviving count is undercounted by exactly
    err, each dropped item's true batch count was <= err. Shared by the
    MisraGries summary class and the vectorized _MgPass pipeline stage."""
    if items.size <= k:
        return items, counts, 0
    thresh = int(np.partition(counts, -k - 1)[-k - 1])
    keep = counts > thresh
    return items[keep], counts[keep] - thresh, thresh

class MisraGries:
    """k-counter frequent-items summary over string items.

    Invariants (summary S over a stream of n items):
      * est(x) <= true(x) <= est(x) + err where err <= n/k
      * every x with true(x) > n/k is present in S
    Merge of two summaries (counter-add then keep top-k, subtracting the
    (k+1)-th count) preserves err <= n_total/k (Berinde et al. 2010)."""

    def __init__(self, k: int = 1024):
        self.k = k
        self.counts: dict[str, int] = {}
        self.n = 0  # stream length absorbed (for the error bound)

    def update_batch(self, items: np.ndarray, counts: np.ndarray) -> None:
        """Absorb pre-aggregated (unique item, count) pairs — callers
        np.unique their batch first so this touches each DISTINCT item once."""
        c = self.counts
        for it, ct in zip(items.tolist(), counts.tolist()):
            c[it] = c.get(it, 0) + ct
        self.n += int(counts.sum())
        if len(c) > 2 * self.k:  # amortized shrink
            self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        items = np.array(list(self.counts.keys()), dtype=object)
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        items, vals, _ = mg_shrink(items, vals, self.k)
        self.counts = dict(zip(items.tolist(), vals.tolist()))

    def merge(self, other: "MisraGries") -> "MisraGries":
        for it, ct in other.counts.items():
            self.counts[it] = self.counts.get(it, 0) + ct
        self.n += other.n
        self._shrink()
        return self

    def error_bound(self) -> int:
        """Counts are exact within +[0, bound]; every item with true count
        > bound is guaranteed present."""
        return -(-self.n // self.k)  # ceil(n / k)

    def candidates(self, min_count: int) -> list[str]:
        """Every item whose TRUE count could be >= min_count (no false
        negatives by the summary invariant)."""
        bound = self.error_bound()
        return [it for it, ct in self.counts.items()
                if ct + bound >= min_count]


# ------------------------------------------- bounded-domain exact histogram

def bincount_partial(values: np.ndarray, domain: int) -> np.ndarray:
    """Dense exact histogram partial for a bounded non-negative int column.
    Values >= domain are clipped into the top bucket (callers size `domain`
    from known schema bounds; the clip is reported by the caller)."""
    v = np.clip(values, 0, domain - 1)
    return np.bincount(v, minlength=domain)


def quantile_disc_sparse(values: np.ndarray, counts: np.ndarray,
                         qs: list[float]) -> list[int]:
    """Discrete quantiles over a SPARSE (sorted unique value, count)
    histogram — DuckDB quantile_disc semantics: the element at zero-based
    rank ceil(q * n) - 1 of the sorted column, clamped to 0. The ONE
    definition of the rank rule (dense-histogram and pipeline callers both
    route here)."""
    n = int(counts.sum())
    if n == 0:
        return [0 for _ in qs]
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        rank = max(0, int(np.ceil(q * n)) - 1)
        out.append(int(values[np.searchsorted(cum, rank + 1, side="left")]))
    return out


def quantile_disc_from_hist(hist: np.ndarray, qs: list[float]) -> list[int]:
    """quantile_disc over a dense histogram indexed by value."""
    return quantile_disc_sparse(np.arange(hist.size), np.asarray(hist), qs)


def quantile_cont_sparse(values: np.ndarray, counts: np.ndarray,
                         qs: list[float]) -> list[float]:
    """CONTINUOUS (interpolated) quantiles over a sparse (sorted unique
    value, count) histogram — DuckDB quantile_cont / numpy 'linear'
    semantics: h = q * (n - 1); linear interpolation between the elements
    at ranks floor(h) and ceil(h) of the sorted column."""
    n = int(counts.sum())
    if n == 0:
        return [float("nan") for _ in qs]
    cum = np.cumsum(counts)

    def at(rank: int) -> float:
        return float(values[np.searchsorted(cum, rank + 1, side="left")])

    out = []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        hi = int(np.ceil(h))
        vlo = at(lo)
        out.append(vlo if hi == lo else vlo + (h - lo) * (at(hi) - vlo))
    return out


class BloomFilter:
    """Fixed-size Bloom filter over integer keys (double hashing from one
    splitmix64 pass — Kirsch & Mitzenmacher 2006: idx_i = h1 + i*h2).

    The broadcast-membership primitive: when a semi-join's "small" side is
    too big to ship as an exact set, ship this fixed-KB bitmap instead,
    filter the big side per batch (false positives only, never negatives),
    and confirm the survivors exactly. Partials from different tasks merge
    by bitwise OR, so the build is a per-batch map + tiny reduce."""

    def __init__(self, m_bits: int = 1 << 14, k: int = 4,
                 bits: np.ndarray | None = None):
        assert m_bits % 64 == 0
        self.m_bits = m_bits
        self.k = k
        self.bits = (np.zeros(m_bits // 64, dtype=np.uint64)
                     if bits is None else bits)

    def _indexes(self, ids: np.ndarray):
        h1 = splitmix64(np.asarray(ids))
        h2 = splitmix64(np.asarray(ids).astype(np.uint64)
                        ^ np.uint64(0x9E3779B97F4A7C15))
        m = np.uint64(self.m_bits)
        for i in range(self.k):
            yield ((h1 + np.uint64(i) * h2) % m)

    def add_ints(self, ids: np.ndarray) -> "BloomFilter":
        for idx in self._indexes(ids):
            np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return self

    def test_ints(self, ids: np.ndarray) -> np.ndarray:
        ok = np.ones(len(ids), dtype=bool)
        for idx in self._indexes(ids):
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return ok

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.k == other.k
        self.bits |= other.bits
        return self


# ----------------------------------------------------- KLL quantile sketch

class KLL:
    """KLL streaming quantile sketch (Karnin, Lang & Liberty 2016,
    "Optimal Quantile Approximation in Streams") over float64 values.

    The mergeable companion to the two histogram quantile paths:
    a10_quantiles_exact needs bounded distinct values and
    a10b_quantiles_approx needs a known (min, max) to fix its grid; KLL
    needs NEITHER — O(k log(n/k)) memory, additive rank error ~O(1/k)
    whp, and partials merge associatively, so it is the 100-TB shape for
    continuous unbounded columns: per-batch partial sketches -> one tiny
    groupby merge, constant bytes per (batch, group) on the wire.

    Level h holds items of weight 2**h. A compaction sorts a level, keeps
    the odd- or even-indexed half (coin per compaction), and promotes it —
    each compaction perturbs any rank by at most the level weight. The
    coin stream is a deterministic splitmix64 counter seeded by `seed`, so
    a fixed insertion order reproduces bit-identical sketches (resume /
    pytest determinism); error bounds hold for ANY coin stream."""

    C = 2.0 / 3.0  # capacity decay per level below the top

    def __init__(self, k: int = 200, seed: int = 0):
        assert k >= 8
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._coin_ctr = np.uint64(seed)

    def _coin(self) -> int:
        # explicit mod-2^64 wraparound (numpy warns on uint64 overflow)
        self._coin_ctr = np.uint64(
            (int(self._coin_ctr) + 0x9E3779B97F4A7C15) % (1 << 64))
        return int(splitmix64(self._coin_ctr[None])[0] & np.uint64(1))

    def _cap(self, h: int) -> int:
        # geometric decay from the TOP level; floor of 2 keeps low levels
        return max(int(np.ceil(self.k * self.C ** (len(self.levels) - 1 - h))),
                   2)

    def update_many(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        for h, items in enumerate(other.levels):
            while len(self.levels) <= h:
                self.levels.append(np.empty(0, np.float64))
            self.levels[h] = np.concatenate([self.levels[h], items])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        while True:
            for h, items in enumerate(self.levels):
                if items.size > self._cap(h):
                    srt = np.sort(items)
                    keep = srt[self._coin()::2]
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], keep])
                    self.levels[h] = np.empty(0, np.float64)
                    break
            else:
                return

    def quantiles(self, qs: list[float]) -> list[float]:
        """quantile_disc semantics on the weighted sample: the item whose
        cumulative weight first reaches ceil(q*n) (rank error ~O(n/k))."""
        if self.n == 0:
            return [float("nan") for _ in qs]
        vals = np.concatenate(self.levels)
        wts = np.concatenate([
            np.full(items.size, 1 << h, np.int64)
            for h, items in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            out.append(float(vals[np.searchsorted(cum, rank, side="left")]))
        return out

    # --- wire format: ship through an Arrow binary column ---

    def serialize(self) -> bytes:
        lens = np.array([items.size for items in self.levels], np.int64)
        head = np.array([self.k, self.n, int(self._coin_ctr), lens.size],
                        np.uint64)
        return b"".join([head.tobytes(), lens.tobytes()]
                        + [items.tobytes() for items in self.levels])

    @classmethod
    def deserialize(cls, buf: bytes) -> "KLL":
        head = np.frombuffer(buf[:32], np.uint64)
        k, n, ctr, nlev = (int(head[0]), int(head[1]), head[2], int(head[3]))
        sk = cls(k=k)
        sk.n = n
        sk._coin_ctr = np.uint64(ctr)
        lens = np.frombuffer(buf[32:32 + 8 * nlev], np.int64)
        off = 32 + 8 * nlev
        sk.levels = []
        for ln in lens:
            sk.levels.append(
                np.frombuffer(buf[off:off + 8 * ln], np.float64).copy())
            off += 8 * int(ln)
        return sk


class KMV:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002; set-
    operation estimates per Beyer et al., SIGMOD 2007): keep the k smallest
    DISTINCT 64-bit hashes of the keys seen. Fixed <= 8k bytes, mergeable
    (k smallest of the union — associative/commutative/idempotent), and —
    unlike HLL — supports intersection-size estimation: within the union
    sketch's k-sample, the fraction of hashes present in both sides is an
    unbiased Jaccard estimate, scaled by the union's distinct estimate.

    Relative error ~ 1/sqrt(k-2) for distinct counts; intersection error
    additionally scales with 1/J (rare-overlap pairs need larger k)."""

    def __init__(self, k: int = 1024, values: np.ndarray | None = None):
        self.k = k
        self.values = (np.empty(0, np.uint64) if values is None
                       else values)  # sorted ascending, distinct

    def update_ints(self, ids: np.ndarray) -> "KMV":
        h = splitmix64(ids.astype(np.uint64, copy=False))
        self.values = np.unique(np.concatenate([self.values, h]))[:self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        self.values = np.unique(
            np.concatenate([self.values, other.values]))[:self.k]
        return self

    def estimate(self) -> float:
        if self.values.size < self.k:
            return float(self.values.size)  # exact below k distinct
        kth = float(self.values[-1]) + 1.0
        return (self.k - 1) * (2.0 ** 64) / kth

    @staticmethod
    def intersection(a: "KMV", b: "KMV") -> float:
        """Estimated |A ∩ B| from two same-k sketches."""
        u = KMV(a.k, a.values.copy()).merge(b)
        samp = u.values  # the union's k-minimum sample
        if samp.size == 0:
            return 0.0
        in_a = np.isin(samp, a.values, assume_unique=True)
        in_b = np.isin(samp, b.values, assume_unique=True)
        jacc = float((in_a & in_b).sum()) / samp.size
        return jacc * u.estimate()

    def serialize(self) -> bytes:
        return self.values.tobytes()

    @classmethod
    def deserialize(cls, buf: bytes, k: int = 1024) -> "KMV":
        return cls(k, np.frombuffer(buf, np.uint64).copy())
