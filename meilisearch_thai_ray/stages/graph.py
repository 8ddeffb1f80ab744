"""Distributed connected components over an edge Dataset.

Alternating large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — a public MapReduce algorithm): each half-
round is ONE `groupby(node).map_groups` shuffle whose group body is a tiny
vectorized numpy kernel; the edge set converges to a star forest in O(log n)
rounds, after which every node points at its component's minimum id.

Why this shape at 100 TB: there is no driver-side union-find — the edge set
never leaves the cluster, each round moves each edge exactly once through the
groupby exchange, and per-group work is O(degree). Large-star is the skew
valve from the paper: a high-degree hub u only re-points its LARGER
neighbours, so mass concentrates on small labels without any single group
re-emitting the whole component. Convergence is detected by a 64-bit
order-insensitive fingerprint (count + mixed-hash sum) — one cheap aggregate
pass per round, no driver materialization of edges.

The dedup pipelines use this to turn verified near-dup PAIRS into duplicate
CLUSTERS (keep min-id per component), mirroring the cluster-canonical dedup
step of published web-corpus curation pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized 64-bit mixing for fingerprints."""
    z = x.astype(np.uint64, copy=True)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _edge_fingerprint_batch(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = _mix64(u * np.uint64(0x100000001B3) + _mix64(v))
    return pa.table({
        "cnt": pa.array([len(u)], pa.int64()),
        "hsum": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64()),
    })


def _fingerprint(edges: ray.data.Dataset) -> tuple[int, int]:
    parts = edges.map_batches(
        _edge_fingerprint_batch, batch_format="pyarrow"
    ).take_all()  # one tiny row per block
    cnt = sum(p["cnt"] for p in parts)
    hsum = sum(p["hsum"] for p in parts) & 0xFFFFFFFFFFFFFFFF
    return cnt, hsum


def _both_orientations(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    return pa.table({
        "u": pa.array(np.concatenate([u, v]), pa.int64()),
        "v": pa.array(np.concatenate([v, u]), pa.int64()),
    })


def _orient_max_first(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    return pa.table({
        "u": pa.array(np.maximum(u, v), pa.int64()),
        "v": pa.array(np.minimum(u, v), pa.int64()),
    })


_EMPTY_EDGES = pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})


def _large_star(group: pa.Table) -> pa.Table:
    """Γ(u) from both orientations; connect every neighbour > u to
    m = min(Γ(u) ∪ {u}). Semantic oracle for the sorted-scan fast path
    (_star_scan mode="large") — kept for tests."""
    u = int(group["u"][0].as_py())
    nb = np.unique(group["v"].to_numpy(zero_copy_only=False))
    m = min(int(nb[0]), u)
    bigger = nb[nb > u]
    if bigger.size == 0:
        return _EMPTY_EDGES
    return pa.table({
        "u": pa.array(bigger, pa.int64()),
        "v": pa.array(np.full(bigger.size, m, dtype=np.int64)),
    })


def _small_star(group: pa.Table) -> pa.Table:
    """Neighbours all < u (max-first orientation): connect N ∪ {u} \\ {m}
    to m = min(N). Semantic oracle for _star_scan mode="small"."""
    u = int(group["u"][0].as_py())
    nb = np.unique(group["v"].to_numpy(zero_copy_only=False))
    m = int(nb[0])
    rest = np.concatenate([nb[1:], [u]])
    return pa.table({
        "u": pa.array(rest, pa.int64()),
        "v": pa.array(np.full(rest.size, m, dtype=np.int64)),
    })


# --- sorted-scan star rounds -------------------------------------------
# groupby(u).map_groups paid one Python dispatch per NODE per half-round
# (nodes are corpus-sized for a dup graph). The same exchange as ONE
# sort(u, v) gives each block contiguous (u, v) runs: per-run min(v) is
# the run's FIRST v (sorted), duplicate (u, v) rows are adjacent, and a
# run spanning blocks is resolved by a driver chain over per-block
# boundary profiles. Edge rows are NOT unique (different groups emit the
# same edge), so blocks can't be identified by content tags — instead
# the passes run as explicit per-block tasks over the materialized sort
# output's ORDERED block refs, with each block's carry passed directly.


@ray.remote
def _star_bounds(tab: pa.Table):
    """Per-block boundary profile for the star-scan chain (tiny)."""
    u = tab["u"].to_numpy(zero_copy_only=False)
    if u.size == 0:
        return None
    v = tab["v"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate(
        [[True], u[1:] != u[:-1]]))
    return {
        "first_u": int(u[0]), "last_u": int(u[-1]),
        "last_v": int(v[-1]),
        "last_run_first_v": int(v[starts[-1]]),
        "n_runs": int(starts.size),
    }


@ray.remote
def _star_scan(tab: pa.Table, carry, mode: str) -> pa.Table:
    """One (u, v)-sorted block -> its star-round output edges.

    carry = (prev_u, prev_v, first_v_cont): the previous block's last row
    (for cross-boundary duplicate drop) and, when the block's first run
    continues an earlier block, that run's GLOBAL first v (its min).
    Emission is bit-equivalent to _large_star/_small_star over the full
    groups: per kept (deduped) row of a run with minimum m —
      large: emit (v, min(m, u)) for rows with v > u
      small: emit (u, m) at the run's global start (where v == m),
             (v, m) for every other kept row."""
    u = tab["u"].to_numpy(zero_copy_only=False)
    if u.size == 0:
        return _EMPTY_EDGES
    v = tab["v"].to_numpy(zero_copy_only=False)
    prev_u, prev_v, first_v_cont = carry
    new_run = np.concatenate([[True], u[1:] != u[:-1]])
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    continues = prev_u is not None and int(u[0]) == prev_u
    # per-run global minimum (sorted by v: first occurrence is the min)
    run_min = v[starts].astype(np.int64)
    if continues and first_v_cont is not None:
        run_min = run_min.copy()
        run_min[0] = first_v_cont
    # duplicate (u, v) drop — duplicates are adjacent under the sort
    keep = np.concatenate(
        [[not (continues and prev_v == int(v[0]))],
         (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
    m_row = run_min[run_id]
    if mode == "large":
        m_row = np.minimum(m_row, u)
        sel = keep & (v > u)
        return pa.table({
            "u": pa.array(v[sel].astype(np.int64)),
            "v": pa.array(m_row[sel], pa.int64()),
        })
    # small star: the run's global start is its min row (v == m)
    gstart = new_run.copy()
    if continues:
        gstart[0] = False
    out_u = np.where(gstart, u, v)[keep]
    return pa.table({
        "u": pa.array(out_u.astype(np.int64)),
        "v": pa.array(m_row[keep], pa.int64()),
    })


def _star_round(edges: ray.data.Dataset, mode: str) -> ray.data.Dataset:
    """ONE sort(u, v) + per-block scan tasks = one large- or small-star
    half-round, no per-node dispatch."""
    sorted_e = edges.sort(["u", "v"]).materialize()
    refs = sorted_e.to_arrow_refs()  # in dataset (= sort) order
    bounds = ray.get([_star_bounds.remote(r) for r in refs])
    carries = []
    prev_u = prev_v = None
    open_first_v = None
    cur_u = None
    for b in bounds:
        if b is None:
            carries.append((None, None, None))
            continue
        continues = cur_u is not None and b["first_u"] == cur_u
        carries.append((prev_u, prev_v,
                        open_first_v if continues else None))
        if not (b["n_runs"] == 1 and continues):
            open_first_v = b["last_run_first_v"]
        cur_u = b["last_u"]
        prev_u, prev_v = b["last_u"], b["last_v"]
    out = [_star_scan.remote(r, c, mode)
           for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out)


def connected_components(edges: ray.data.Dataset,
                         max_rounds: int = 30) -> ray.data.Dataset:
    """Edge Dataset (u:int64, v:int64, u != v) -> (doc_id, component) with
    component = the minimum node id in each node's connected component.
    Only nodes that appear in an edge are emitted (singletons are the
    caller's complement set).

    Each round = large-star then small-star, one sort(u, v) exchange each
    (the same all-to-all a groupby pays) scanned per block with NO
    per-node dispatch (_star_round), materialized between rounds
    (iterative algorithms must checkpoint or the lazy plan re-executes
    from scratch every round). Stops when the edge-set fingerprint is
    stable across a round (or at max_rounds — O(log n) is the proven
    bound, 30 covers any conceivable corpus)."""
    edges = edges.materialize()
    prev = _fingerprint(edges)
    if prev[0] == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
        }))
    for _ in range(max_rounds):
        large = _star_round(
            edges.map_batches(_both_orientations, batch_format="pyarrow"),
            "large")
        edges = _star_round(
            large.map_batches(_orient_max_first, batch_format="pyarrow"),
            "small").materialize()
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur

    def _emit(batch: pa.Table) -> pa.Table:
        # star edges (node, root); roots themselves appear as (x, root) rows'
        # v values — add (root, root) per distinct root seen in this batch
        # (cross-batch duplicates collapsed by the groupby below)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        roots = np.unique(v)
        return pa.table({
            "doc_id": pa.array(np.concatenate([u, roots]), pa.int64()),
            "component": pa.array(np.concatenate([v, roots]), pa.int64()),
        })

    return (
        edges.map_batches(_emit, batch_format="pyarrow")
        .groupby("doc_id")
        .min("component")
        .map_batches(
            lambda b: b.rename_columns(["doc_id", "component"]),
            batch_format="pyarrow",
        )
    )


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Single-machine oracle for tests: node -> component min id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


# --------------------------------------------------------------- PageRank

def _pr_union_schema(n, key, side_val, dst, w):
    return pa.table({
        "key": pa.array(key, pa.int64()),
        "side": pa.array(np.full(n, side_val, np.int8)),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(w, pa.float64()),
    })


def _pr_contrib(k, side, dst, w, skip_edge: bool,
                divide_strength: bool = True):
    """Per-run PageRank contributions over arrays sorted by src `k`: each
    run holds one rank row (side=1, w=rank) and that src's out-edges
    (side=0, dst, w=weight). Emits (dst, rank * w / strength) combined
    by dst within the call. Out-strength is computed INSIDE the run, so
    no normalization pre-pass (and no separate strength join) is needed."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    if k.size == 0:
        return empty
    new = np.r_[True, k[1:] != k[:-1]]
    rid = np.cumsum(new) - 1
    nruns = rid[-1] + 1
    dim = side == 1
    rank = np.zeros(nruns, np.float64)
    rank[rid[dim]] = w[dim]
    strength = np.ones(nruns, np.float64)
    if divide_strength:
        strength = np.zeros(nruns, np.float64)
        np.add.at(strength, rid[~dim], w[~dim])
    keep = (~dim) & (rank[rid] != 0) & (strength[rid] > 0)
    if skip_edge:
        keep &= (rid != 0) & (rid != nruns - 1)
    if not keep.any():
        return empty
    c = w[keep] * rank[rid[keep]] / strength[rid[keep]]
    u, inv = np.unique(dst[keep], return_inverse=True)
    return u, np.bincount(inv, weights=c)



# per-block scan output kinds (the `kind` column) for the score-push
# exchange shared by pagerank and HITS:
#   0 = interior contribution (cdst, cval) — complete, stays distributed
#   1 = pending contribution from a block-straddling src run:
#       cval = per-dst sum(w) WITHIN this block, NOT yet scaled by the
#       run's score(/strength) (unknown locally) — stays distributed and
#       is scaled later by a broadcast factor map
#   2 = profile of a straddling run: s_part = its sum(w) in this block,
#       rval = the score if the score row landed here (else NaN) —
#       TWO CONSTANT-SIZE rows per block max, the only driver carry.
# This keeps the carry O(1) per block even for a hub src whose edge run
# spans many blocks (shipping the raw run would put the hub's whole
# adjacency on the driver).
_EMPTY_SCAN = pa.table({
    "kind": pa.array([], pa.int8()),
    "src": pa.array([], pa.int64()),
    "cdst": pa.array([], pa.int64()),
    "cval": pa.array([], pa.float64()),
    "s_part": pa.array([], pa.float64()),
    "rval": pa.array([], pa.float64())})


def _push_block_scan(batch: pa.Table, divide_strength: bool) -> pa.Table:
    if batch.num_rows == 0:
        return _EMPTY_SCAN
    k = batch["key"].to_numpy(zero_copy_only=False)
    side = batch["side"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    u, c = _pr_contrib(k, side, dst, w, skip_edge=True,
                       divide_strength=divide_strength)
    parts = [pa.table({
        "kind": pa.array(np.zeros(u.size, np.int8)),
        "src": pa.array(np.zeros(u.size, np.int64)),
        "cdst": pa.array(u, pa.int64()),
        "cval": pa.array(c, pa.float64()),
        "s_part": pa.array(np.zeros(u.size, np.float64)),
        "rval": pa.array(np.zeros(u.size, np.float64))})]
    new = np.r_[True, k[1:] != k[:-1]]
    rid = np.cumsum(new) - 1
    for r_sel in ({0, rid[-1]} if rid[-1] else {0}):
        sel = rid == r_sel
        src_key = int(k[np.flatnonzero(sel)[0]])
        fact = sel & (side == 0)
        dims = sel & (side == 1)
        rv = float(w[np.flatnonzero(dims)[0]]) if dims.any() else float("nan")
        ud, cd = (np.empty(0, np.int64), np.empty(0, np.float64))
        if fact.any():
            ud, inv = np.unique(dst[fact], return_inverse=True)
            cd = np.bincount(inv, weights=w[fact])
        parts.append(pa.table({
            "kind": pa.array(np.ones(ud.size, np.int8)),
            "src": pa.array(np.full(ud.size, src_key, np.int64)),
            "cdst": pa.array(ud, pa.int64()),
            "cval": pa.array(cd, pa.float64()),
            "s_part": pa.array(np.zeros(ud.size, np.float64)),
            "rval": pa.array(np.zeros(ud.size, np.float64))}))
        parts.append(pa.table({
            "kind": pa.array(np.array([2], np.int8)),
            "src": pa.array(np.array([src_key], np.int64)),
            "cdst": pa.array(np.zeros(1, np.int64)),
            "cval": pa.array(np.zeros(1, np.float64)),
            "s_part": pa.array(
                np.array([float(w[fact].sum())], np.float64)),
            "rval": pa.array(np.array([rv], np.float64))}))
    return pa.concat_tables(parts)


def push_scores(scores: "ray.data.Dataset", facts: "ray.data.Dataset",
                divide_strength: bool = True):
    """One score-push exchange: (score rows UNION edge rows) sorted by
    key + per-block combined contributions + ONE groupby(dst). Returns a
    Dataset with columns (cdst, "sum(cval)"). divide_strength=True pushes
    score * w / sum(w) (the PageRank random-surfer split); False pushes
    score * w (the HITS linear operator). Skew-safe per the kind-column
    contract above.

    Kept as the SEMANTIC ORACLE for the sort-once path below (re-sorts
    rank UNION edges every call — iterative callers should build a
    SortedFacts once and use push_scores_presorted instead; equality of
    the two paths is pytest-asserted)."""
    import functools

    seg = (scores.union(facts).sort("key")
           .map_batches(functools.partial(_push_block_scan,
                                          divide_strength=divide_strength),
                        batch_format="pyarrow",
                        batch_size=None).materialize())
    return _push_postprocess(seg, divide_strength)


def _push_postprocess(seg: "ray.data.Dataset", divide_strength: bool):
    """Scan-output segments -> (cdst, sum(cval)) contributions: collect the
    constant-size straddle profiles on the driver, broadcast the factor
    map, scale pending rows distributed, ONE groupby(dst)."""
    # profiles: <= 2 constant-size rows per block — the only driver pull
    prof = pa.concat_tables(
        [b for b in seg.filter(expr="kind == 2")
         .iter_batches(batch_format="pyarrow")] or [_EMPTY_SCAN])
    factor: dict[int, float] = {}
    s_tot: dict[int, float] = {}
    r_of: dict[int, float] = {}
    for srck, sp, rv in zip(prof["src"].to_pylist(),
                            prof["s_part"].to_pylist(),
                            prof["rval"].to_pylist()):
        s_tot[srck] = s_tot.get(srck, 0.0) + sp
        if rv == rv:  # not NaN: the block holding the score row
            r_of[srck] = rv
    for srck, s in s_tot.items():
        if divide_strength:
            factor[srck] = (r_of.get(srck, 0.0) / s) if s > 0 else 0.0
        else:
            factor[srck] = r_of.get(srck, 0.0)
    fkeys = np.array(sorted(factor), np.int64)
    fvals = np.array([factor[int(x)] for x in fkeys], np.float64)
    factor_ref = ray.put((fkeys, fvals))

    def scale_pending(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(factor_ref)
        srcv = batch["src"].to_numpy(zero_copy_only=False)
        if keys.size:
            pos = np.minimum(np.searchsorted(keys, srcv), keys.size - 1)
            f = np.where(keys[pos] == srcv, vals[pos], 0.0)
        else:
            f = np.zeros(len(srcv), np.float64)
        return pa.table({
            "cdst": batch["cdst"],
            "cval": pa.array(batch["cval"].to_numpy(
                zero_copy_only=False) * f, pa.float64())})

    contrib = seg.filter(expr="kind == 0").select_columns(
        ["cdst", "cval"]).union(
        seg.filter(expr="kind == 1").map_batches(
            scale_pending, batch_format="pyarrow", batch_size=65536))
    from .runs import sum_by_int_key

    return sum_by_int_key(contrib, "cdst", "cval")


# --- sort-once iterative exchange ---------------------------------------
# The edge set of an iterative graph algorithm is STATIC: re-sorting
# (scores UNION edges) every iteration (push_scores) pays the full
# O(N + E) all-to-all each round for data that never changes. Instead the
# fact rows sort ONCE into SortedFacts — ordered block refs plus driver
# half-open key ranges — and each iteration merges only the O(nodes)
# score rows into their owning fact block inside a per-block task (local
# argsort, no exchange). The per-block scan functions and the kind-0/1/2
# constant-carry contract are IDENTICAL to the sorted-union path, because
# the scans never needed pre-scan carries: block-straddling runs resolve
# post-hoc via profile rows either way. Equality with push_scores is
# pytest-asserted.


@ray.remote
def _block_minmax(tab: pa.Table, col: str):
    v = tab[col].to_numpy(zero_copy_only=False)
    if v.size == 0:
        return None
    return (int(v.min()), int(v.max()))


class SortedFacts:
    """Union-schema fact rows sorted by key ONCE, pinned as ordered block
    refs with driver-side half-open ownership ranges.

    Block i OWNS keys [first_key_i, next strictly-greater first_key_j);
    block 0's range opens at -inf, the last distinct range closes at +inf,
    and a continuation block (same first key as its predecessor — a hub
    run spanning blocks) owns nothing. Every int64 key therefore has
    exactly ONE owner block, so a score row lands in exactly one merge
    task; if its run's facts straddle into neighbour blocks, the scan's
    profile/pending mechanism reassembles it — same contract as the
    sorted-union path."""

    def __init__(self, facts: "ray.data.Dataset"):
        sorted_f = facts.sort("key").materialize()
        refs = sorted_f.to_arrow_refs()  # in dataset (= sort) order
        mm = ray.get([_block_minmax.remote(r, "key") for r in refs])
        self.refs = [r for r, m in zip(refs, mm) if m is not None]
        firsts = [m[0] for m in mm if m is not None]
        self.ranges: list = []  # (lo | None=-inf, hi | None=+inf, empty)
        for i in range(len(self.refs)):
            if i > 0 and firsts[i] == firsts[i - 1]:
                self.ranges.append((0, 0, True))  # continuation block
                continue
            lo = None if i == 0 else firsts[i]
            hi = next((f for f in firsts[i + 1:] if f > firsts[i]), None)
            self.ranges.append((lo, hi, False))


@ray.remote
def _merge_scan(fact_tab: pa.Table, score_refs: list, lo, hi,
                scan_fn, scan_kwargs: dict) -> pa.Table:
    """One owner block's iteration work: select the score rows this block
    owns ([lo, hi), sentinel None = unbounded), merge them into the
    pre-sorted fact block by LOCAL argsort, run the per-block scan."""
    tabs = ray.get(list(score_refs)) if score_refs else []
    parts = []
    for t in tabs:
        k = t["key"].to_numpy(zero_copy_only=False)
        m = np.ones(k.size, bool)
        if lo is not None:
            m &= k >= lo
        if hi is not None:
            m &= k < hi
        if m.any():
            parts.append(t.filter(pa.array(m)))
    if not parts:
        merged = fact_tab
    else:
        merged = pa.concat_tables(
            [fact_tab] + parts).combine_chunks()
        keys = merged["key"].to_numpy(zero_copy_only=False)
        merged = merged.take(pa.array(np.argsort(keys, kind="stable")))
    return scan_fn(merged, **scan_kwargs)


def _presorted_seg(scores: "ray.data.Dataset", sf: SortedFacts,
                   scan_fn, scan_kwargs: dict) -> "ray.data.Dataset":
    """scores (union schema) + SortedFacts -> scan-output segment Dataset,
    with NO sort exchange: score blocks are range-pruned against each
    owner block's [lo, hi) and fetched only by overlapping merge tasks."""
    scores = scores.materialize()
    srefs = scores.to_arrow_refs()
    smm = ray.get([_block_minmax.remote(r, "key") for r in srefs])
    live = [(r, m) for r, m in zip(srefs, smm) if m is not None]
    scan_refs = []
    for fref, (lo, hi, empty) in zip(sf.refs, sf.ranges):
        if empty:
            overlap, slo, shi = [], 0, 0
        else:
            overlap = [r for r, (mn, mx) in live
                       if (hi is None or mn < hi)
                       and (lo is None or mx >= lo)]
            slo, shi = lo, hi
        scan_refs.append(_merge_scan.remote(
            fref, overlap, slo, shi, scan_fn, scan_kwargs))
    return ray.data.from_arrow_refs(scan_refs)


_EMPTY_CONTRIB = pa.table({"cdst": pa.array([], pa.int64()),
                           "sum(cval)": pa.array([], pa.float64())})


def push_scores_presorted(scores: "ray.data.Dataset", sf: SortedFacts,
                          divide_strength: bool = True):
    """push_scores over a SortedFacts edge layout: per iteration only the
    O(nodes) score rows move (block-ref metadata + targeted fetches); the
    O(edges) fact rows never re-sort. Output == push_scores (asserted)."""
    if not sf.refs:
        return ray.data.from_arrow(_EMPTY_CONTRIB)
    seg = _presorted_seg(scores, sf, _push_block_scan,
                         {"divide_strength": divide_strength})
    return _push_postprocess(seg.materialize(), divide_strength)


def _fact_rows_ds(edges: "ray.data.Dataset", key_col: str = "src",
                  other_col: str = "dst"):
    """Edges -> materialized union-schema fact rows keyed by key_col."""
    def _rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch[key_col].to_numpy(zero_copy_only=False), 0,
            batch[other_col].to_numpy(zero_copy_only=False),
            batch["w"].to_numpy(zero_copy_only=False))

    return edges.map_batches(_rows, batch_format="pyarrow",
                             batch_size=65536).materialize()


def _sorted_fact_rows(edges: "ray.data.Dataset", key_col: str = "src",
                      other_col: str = "dst") -> SortedFacts:
    """Edges -> SortedFacts (one sort, reused every iteration)."""
    def _rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch[key_col].to_numpy(zero_copy_only=False), 0,
            batch[other_col].to_numpy(zero_copy_only=False),
            batch["w"].to_numpy(zero_copy_only=False))

    return SortedFacts(edges.map_batches(_rows, batch_format="pyarrow",
                                         batch_size=65536))


def pagerank(edges: ray.data.Dataset, n_iter: int = 5,
             damping: float = 0.85) -> ray.data.Dataset:
    """Distributed PageRank over a DIRECTED edge Dataset (src:int64,
    dst:int64, w:float64, weights strictly positive) — for undirected
    graphs the caller emits both orientations, which also guarantees
    every node has out-degree >= 1 (no dangling-mass term).

    Scale shape (the canonical iterative-shuffle pattern): per-node rank
    state is NEVER broadcast — the edge set sorts ONCE into SortedFacts,
    then each iteration is one rank-row merge into the pre-sorted fact
    blocks (per-block tasks, no edge exchange) + ONE groupby(dst) of
    per-block combined contributions. Interior src runs resolve locally
    (out-strength computed inside the run). Block-straddling runs — a hub
    node's adjacency can span MANY blocks — resolve skew-safely: each
    block emits a CONSTANT-SIZE profile (its Σw share of the run + the
    rank if the rank row landed there) as the only driver carry, plus
    per-dst pending partials that STAY distributed and are scaled by a
    broadcast (src -> rank/strength) factor map of O(blocks) entries.
    Ranks materialize per iteration (O(nodes) rows, distributed) so
    lineage stays flat.

    Node set = src UNION dst (a zero-in-degree node receives no
    contributions yet must KEEP its teleport mass each iteration — its
    base-rank row is unioned back in via an anti-id filter, r3 advice); a
    dangling node (no out-edges) contributes nothing (its mass leaks —
    the simplified-PageRank convention, matched by the test oracle). The
    edge set sorts ONCE (SortedFacts); iterations move only rank rows."""

    # consumed twice (node scan + fact sort): pin the caller's edge-build
    # plan once or each consumption re-executes it from the source reads
    edges = edges.materialize()

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "one": pa.array(np.ones(u.size, np.float64))})

    nodes = (edges.map_batches(node_partial, batch_format="pyarrow",
                               batch_size=65536)
             .groupby("node").sum("one").materialize())
    n_nodes = nodes.count()
    r0 = 1.0 / n_nodes

    def init_rank(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch["node"].to_numpy(zero_copy_only=False),
            1, np.zeros(n, np.int64), np.full(n, r0))

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow",
                              batch_size=65536).materialize()

    sfacts = _sorted_fact_rows(edges)

    base = (1.0 - damping) / n_nodes

    def init_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch["node"].to_numpy(zero_copy_only=False),
            1, np.zeros(n, np.int64), np.full(n, base))

    # constant across iterations: every node's teleport-only rank row
    base_rows = nodes.map_batches(init_base, batch_format="pyarrow",
                                  batch_size=65536).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        r = base + damping * batch["sum(cval)"].to_numpy(
            zero_copy_only=False)
        return _pr_union_schema(
            n, batch["cdst"].to_numpy(zero_copy_only=False),
            1, np.zeros(n, np.int64), r)

    from .runs import anti_id_filter

    # the receiving set is CONSTANT across iterations (ranks are always
    # >= base > 0 and weights are positive, so exactly the distinct dst
    # nodes receive a contribution row every round) — compute the
    # complementary teleport-only rows ONCE, not per iteration
    def dst_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(u.astype(np.int64))})

    receiving = edges.map_batches(dst_partial, batch_format="pyarrow",
                                  batch_size=65536)
    missing_base = anti_id_filter(base_rows, receiving,
                                  id_col="key").materialize()

    for _ in range(n_iter):
        ranks = (push_scores_presorted(ranks, sfacts, divide_strength=True)
                 .map_batches(finish, batch_format="pyarrow",
                              batch_size=65536)
                 .union(missing_base).materialize())

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["key"],
            "rank": batch["w"],
        })

    return ranks.map_batches(emit, batch_format="pyarrow",
                             batch_size=65536)


def _l2_normalized_scores(sums_ds, eps: float = 1e-300):
    """(cdst, sum(cval)) -> L2-normalized score rows in the union schema.
    One scalar aggregate (sum of squares) + one scaling pass."""
    from ray.data.aggregate import Sum

    # consumed twice (norm + scaling): pin the groupby output or the lazy
    # plan re-runs the whole contribution exchange for the second pass
    sums_ds = sums_ds.materialize()

    def sq(batch: pa.Table) -> pa.Table:
        v = batch["sum(cval)"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([float(np.dot(v, v))], pa.float64())})

    tot = (sums_ds.map_batches(sq, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("s", alias_name="t"))["t"]) or 0.0
    norm = float(np.sqrt(tot)) or eps

    def fin(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch["cdst"].to_numpy(zero_copy_only=False), 1,
            np.zeros(n, np.int64),
            batch["sum(cval)"].to_numpy(zero_copy_only=False) / norm)

    return sums_ds.map_batches(fin, batch_format="pyarrow",
                               batch_size=65536).materialize()


def hits(edges: ray.data.Dataset, n_iter: int = 5) -> ray.data.Dataset:
    """Distributed HITS (Kleinberg 1999) over a DIRECTED weighted edge
    Dataset (src, dst, w): hubs point, authorities receive —
    a = A^T h then h = A a, each L2-normalized, for n_iter rounds.

    Scale shape: two score-push exchanges per iteration (the same
    skew-safe contract as pagerank, without the strength division — HITS
    is the raw linear operator) over forward and reverse fact rows each
    sorted ONCE (SortedFacts — iterations move only the O(nodes) score
    rows, never the edge set); normalization is one scalar aggregate.
    Returns (node, hub, authority) with 0.0 for roles a node never
    plays."""
    # consumed three times (two fact sorts + node scan): pin the edge
    # build once
    edges = edges.materialize()
    facts_fwd = _sorted_fact_rows(edges, "src", "dst")
    facts_rev = _sorted_fact_rows(edges, "dst", "src")

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "one": pa.array(np.ones(u.size, np.float64))})

    nodes = (edges.map_batches(node_partial, batch_format="pyarrow",
                               batch_size=65536)
             .groupby("node").sum("one").materialize())

    def init_h(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _pr_union_schema(
            n, batch["node"].to_numpy(zero_copy_only=False), 1,
            np.zeros(n, np.int64), np.ones(n, np.float64))

    h = nodes.map_batches(init_h, batch_format="pyarrow",
                          batch_size=65536).materialize()
    a = None
    for _ in range(n_iter):
        a = _l2_normalized_scores(
            push_scores_presorted(h, facts_fwd, divide_strength=False))
        h = _l2_normalized_scores(
            push_scores_presorted(a, facts_rev, divide_strength=False))

    def h_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["key"].cast(pa.int64()),
            "hub_p": batch["w"],
            "auth_p": pa.array(np.zeros(batch.num_rows, np.float64))})

    def a_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["key"].cast(pa.int64()),
            "hub_p": pa.array(np.zeros(batch.num_rows, np.float64)),
            "auth_p": batch["w"]})

    both = (h.map_batches(h_rows, batch_format="pyarrow",
                          batch_size=65536)
            .union(a.map_batches(a_rows, batch_format="pyarrow",
                                 batch_size=65536))
            .groupby("node").sum(["hub_p", "auth_p"]))

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "hub": batch["sum(hub_p)"],
            "authority": batch["sum(auth_p)"],
        })

    return both.map_batches(emit, batch_format="pyarrow",
                            batch_size=65536)


def _lpa_votes_scan(batch: pa.Table) -> pa.Table:
    """Sorted (label rows UNION edge rows) block -> per-(dst, src-label)
    weight votes. Interior runs resolve locally; straddling runs emit
    label-less pending votes (filled by a broadcast src->label map) plus
    one constant-size profile row per block edge — the pagerank carry
    contract with a label payload instead of a rank."""
    empty = pa.table({
        "kind": pa.array([], pa.int8()),
        "src": pa.array([], pa.int64()),
        "vdst": pa.array([], pa.int64()),
        "vlabel": pa.array([], pa.int64()),
        "vw": pa.array([], pa.float64())})
    if batch.num_rows == 0:
        return empty
    k = batch["key"].to_numpy(zero_copy_only=False)
    side = batch["side"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    new = np.r_[True, k[1:] != k[:-1]]
    rid = np.cumsum(new) - 1
    nruns = rid[-1] + 1
    dim = side == 1
    lab = np.full(nruns, -1, np.int64)
    lab[rid[dim]] = w[dim].astype(np.int64)
    interior = (rid != 0) & (rid != nruns - 1)
    keep = (~dim) & (lab[rid] >= 0) & interior
    parts = []
    if keep.any():
        # combine per (dst, label) within the block
        pair = np.stack([dst[keep], lab[rid[keep]]], axis=1)
        u, inv = np.unique(pair, axis=0, return_inverse=True)
        votes = np.bincount(inv, weights=w[keep])
        parts.append(pa.table({
            "kind": pa.array(np.zeros(len(u), np.int8)),
            "src": pa.array(np.zeros(len(u), np.int64)),
            "vdst": pa.array(u[:, 0], pa.int64()),
            "vlabel": pa.array(u[:, 1], pa.int64()),
            "vw": pa.array(votes, pa.float64())}))
    for r_sel in ({0, rid[-1]} if rid[-1] else {0}):
        sel = rid == r_sel
        src_key = int(k[np.flatnonzero(sel)[0]])
        fact = sel & (side == 0)
        dims = sel & (side == 1)
        lv = int(w[np.flatnonzero(dims)[0]]) if dims.any() else -1
        if fact.any():
            ud, inv = np.unique(dst[fact], return_inverse=True)
            cd = np.bincount(inv, weights=w[fact])
            parts.append(pa.table({
                "kind": pa.array(np.ones(ud.size, np.int8)),
                "src": pa.array(np.full(ud.size, src_key, np.int64)),
                "vdst": pa.array(ud, pa.int64()),
                "vlabel": pa.array(np.full(ud.size, -1, np.int64)),
                "vw": pa.array(cd, pa.float64())}))
        parts.append(pa.table({
            "kind": pa.array(np.array([2], np.int8)),
            "src": pa.array(np.array([src_key], np.int64)),
            "vdst": pa.array(np.zeros(1, np.int64)),
            "vlabel": pa.array(np.array([lv], np.int64)),
            "vw": pa.array(np.zeros(1, np.float64))}))
    return pa.concat_tables(parts) if parts else empty


def _lpa_argmax(t: pa.Table, skip_edge: bool) -> pa.Table:
    """Sorted-by-dst vote rows -> winner label per dst run
    (max weight, ties to the smallest label)."""
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
    d = t["vdst"].to_numpy(zero_copy_only=False)
    if d.size == 0:
        return empty
    lb = t["vlabel"].to_numpy(zero_copy_only=False)
    w = t["sum(vw)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lb, -w, d))
    dd = d[order]
    first = np.r_[True, dd[1:] != dd[:-1]]
    win = order[first]
    if skip_edge:
        new = np.r_[True, d[1:] != d[:-1]]
        rid = np.cumsum(new) - 1
        wr = rid[win]
        win = win[(wr != 0) & (wr != rid[-1])]
    return pa.table({"node": pa.array(d[win].astype(np.int64)),
                     "label": pa.array(lb[win].astype(np.int64))})


def label_propagation(edges: ray.data.Dataset,
                      n_iter: int = 5) -> ray.data.Dataset:
    """Deterministic SYNCHRONOUS label propagation (Raghavan et al. 2007,
    made deterministic: every node simultaneously adopts the neighbor
    label with the max incident weight, ties to the SMALLEST label;
    labels init to node ids). Callers with undirected graphs emit both
    edge orientations. Fixed iteration count — communities of a weighted
    graph in O(n_iter) rounds, no RNG.

    Scale shape: the edge set sorts ONCE (SortedFacts); per iteration one
    label-row merge into the pre-sorted fact blocks (per-block tasks,
    pagerank-style constant carry: pending votes stay distributed, labels
    re-enter via a broadcast O(blocks)-entry map), ONE groupby(dst, label)
    vote sum, and ONE sort(dst) argmax run-scan with <= 2 edge runs per
    block merged on the driver."""

    def node_rows(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "one": pa.array(np.ones(u.size, np.float64))})

    edges = edges.materialize()  # consumed twice: node scan + fact sort
    nodes = (edges.map_batches(node_rows, batch_format="pyarrow",
                               batch_size=65536)
             .groupby("node").sum("one").materialize())

    def init_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nd = batch["node"].to_numpy(zero_copy_only=False)
        return _pr_union_schema(n, nd, 1, np.zeros(n, np.int64),
                                nd.astype(np.float64))

    labels = nodes.map_batches(init_labels, batch_format="pyarrow",
                               batch_size=65536).materialize()
    sfacts = _sorted_fact_rows(edges)

    for _ in range(n_iter):
        seg = _presorted_seg(labels, sfacts,
                             _lpa_votes_scan, {}).materialize()
        prof = pa.concat_tables(
            [b for b in seg.filter(expr="kind == 2")
             .iter_batches(batch_format="pyarrow")] or
            [pa.table({"src": pa.array([], pa.int64()),
                       "vlabel": pa.array([], pa.int64())})])
        lab_of: dict[int, int] = {}
        for srck, lv in zip(prof["src"].to_pylist(),
                            prof["vlabel"].to_pylist()):
            if lv >= 0:
                lab_of[srck] = lv
        lkeys = np.array(sorted(lab_of), np.int64)
        lvals = np.array([lab_of[int(x)] for x in lkeys], np.int64)
        lref = ray.put((lkeys, lvals))

        def fill_pending(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(lref)
            srcv = batch["src"].to_numpy(zero_copy_only=False)
            if keys.size:
                pos = np.minimum(np.searchsorted(keys, srcv),
                                 keys.size - 1)
                lab = np.where(keys[pos] == srcv, vals[pos], -1)
            else:
                lab = np.full(len(srcv), -1, np.int64)
            out = pa.table({
                "vdst": batch["vdst"],
                "vlabel": pa.array(lab.astype(np.int64)),
                "vw": batch["vw"]})
            return out.filter(pa.array(lab >= 0))

        votes = (seg.filter(expr="kind == 0")
                 .select_columns(["vdst", "vlabel", "vw"])
                 .union(seg.filter(expr="kind == 1").map_batches(
                     fill_pending, batch_format="pyarrow",
                     batch_size=65536)))
        # ONE sort fuses the (vdst, vlabel) vote combine INTO the argmax
        # scan (equal pairs are adjacent under the sort, reduceat combines
        # them locally) — replaces the former groupby + second sort
        seg2 = (votes.sort(["vdst", "vlabel"])
                .map_batches(_lpa_seg2_fused, batch_format="pyarrow",
                             batch_size=None)
                .materialize())
        done = [seg2.filter(expr="partial == False")
                .select_columns(["node", "label"])]
        raws = [b for b in seg2.filter(expr="partial == True")
                .iter_batches(batch_format="pyarrow")]
        new_parts = []
        if raws:
            # boundary vdst runs: same (vdst, vlabel) may arrive from two
            # adjacent blocks — combine before the argmax
            bt = pa.concat_tables(raws)
            d = bt["vdst"].to_numpy(zero_copy_only=False)
            lb = bt["vlabel"].to_numpy(zero_copy_only=False)
            w = bt["sum(vw)"].to_numpy(zero_copy_only=False)
            order = np.lexsort((lb, d))
            d, lb, w = d[order], lb[order], w[order]
            newp = np.r_[True, (d[1:] != d[:-1]) | (lb[1:] != lb[:-1])]
            st = np.flatnonzero(newp)
            ct = pa.table({
                "vdst": pa.array(d[st].astype(np.int64)),
                "vlabel": pa.array(lb[st].astype(np.int64)),
                "sum(vw)": pa.array(np.add.reduceat(w, st))})
            new_parts.append(_lpa_argmax(ct, skip_edge=False))
        winner_tables = done
        if new_parts:
            winner_tables.append(ray.data.from_arrow(new_parts[0]))
        winners = winner_tables[0]
        for extra in winner_tables[1:]:
            winners = winners.union(extra)
        winners = winners.materialize()
        # nodes with no incoming votes keep their current label
        from .runs import anti_id_filter

        def lab_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return _pr_union_schema(
                n, batch["node"].to_numpy(zero_copy_only=False), 1,
                np.zeros(n, np.int64),
                batch["label"].to_numpy(zero_copy_only=False)
                .astype(np.float64))

        kept = anti_id_filter(labels, winners.map_batches(
            lambda b: pa.table({"key": b["node"]}),
            batch_format="pyarrow"), id_col="key")
        labels = (winners.map_batches(lab_rows, batch_format="pyarrow",
                                      batch_size=65536)
                  .union(kept).materialize())

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["key"],
            "label": batch["w"].cast(pa.int64()),
        })

    return labels.map_batches(emit, batch_format="pyarrow",
                              batch_size=65536)


def _lpa_seg2_fused(b: pa.Table) -> pa.Table:
    """Raw (vdst, vlabel, vw) vote rows sorted by (vdst, vlabel) -> the
    per-(vdst, vlabel) combine (adjacent under the sort: one reduceat)
    feeding the same argmax scan — the vote-sum groupby fused into the
    argmax sort, saving one exchange per LPA round."""
    if b.num_rows == 0:
        return _lpa_seg2(b.append_column(
            "sum(vw)", pa.array([], pa.float64())).drop_columns(["vw"]))
    d = b["vdst"].to_numpy(zero_copy_only=False)
    lb = b["vlabel"].to_numpy(zero_copy_only=False)
    w = b["vw"].to_numpy(zero_copy_only=False)
    newp = np.r_[True, (d[1:] != d[:-1]) | (lb[1:] != lb[:-1])]
    st = np.flatnonzero(newp)
    return _lpa_seg2(pa.table({
        "vdst": pa.array(d[st].astype(np.int64)),
        "vlabel": pa.array(lb[st].astype(np.int64)),
        "sum(vw)": pa.array(np.add.reduceat(w, st))}))


def _lpa_seg2(b: pa.Table) -> pa.Table:
    """Per-block argmax over sorted (vdst, vlabel) vote rows: interior
    winners + raw edge-run rows (<= 2 dst runs per block)."""
    empty = pa.table({
        "partial": pa.array([], pa.bool_()),
        "node": pa.array([], pa.int64()),
        "label": pa.array([], pa.int64()),
        "vdst": pa.array([], pa.int64()),
        "vlabel": pa.array([], pa.int64()),
        "sum(vw)": pa.array([], pa.float64())})
    if b.num_rows == 0:
        return empty
    inter = _lpa_argmax(b, skip_edge=True)
    d = b["vdst"].to_numpy(zero_copy_only=False)
    new = np.r_[True, d[1:] != d[:-1]]
    rid = np.cumsum(new) - 1
    raw = b.filter(pa.array((rid == 0) | (rid == rid[-1])))
    it = pa.table({
        "partial": pa.array(np.zeros(inter.num_rows, bool)),
        "node": inter["node"],
        "label": inter["label"],
        "vdst": pa.array(np.zeros(inter.num_rows, np.int64)),
        "vlabel": pa.array(np.zeros(inter.num_rows, np.int64)),
        "sum(vw)": pa.array(np.zeros(inter.num_rows, np.float64))})
    rt = pa.table({
        "partial": pa.array(np.ones(raw.num_rows, bool)),
        "node": pa.array(np.zeros(raw.num_rows, np.int64)),
        "label": pa.array(np.zeros(raw.num_rows, np.int64)),
        "vdst": raw["vdst"],
        "vlabel": raw["vlabel"],
        "sum(vw)": raw["sum(vw)"]})
    return pa.concat_tables([it, rt])
