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
    m = min(Γ(u) ∪ {u})."""
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
    to m = min(N)."""
    u = int(group["u"][0].as_py())
    nb = np.unique(group["v"].to_numpy(zero_copy_only=False))
    m = int(nb[0])
    rest = np.concatenate([nb[1:], [u]])
    return pa.table({
        "u": pa.array(rest, pa.int64()),
        "v": pa.array(np.full(rest.size, m, dtype=np.int64)),
    })


def connected_components(edges: ray.data.Dataset,
                         max_rounds: int = 30) -> ray.data.Dataset:
    """Edge Dataset (u:int64, v:int64, u != v) -> (doc_id, component) with
    component = the minimum node id in each node's connected component.
    Only nodes that appear in an edge are emitted (singletons are the
    caller's complement set).

    Each round = large-star then small-star, one groupby shuffle each,
    materialized between rounds (iterative algorithms must checkpoint or the
    lazy plan re-executes from scratch every round). Stops when the edge-set
    fingerprint is stable across a round (or at max_rounds — O(log n) is the
    proven bound, 30 covers any conceivable corpus)."""
    edges = edges.materialize()
    prev = _fingerprint(edges)
    if prev[0] == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
        }))
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(_both_orientations, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star, batch_format="pyarrow")
            .map_batches(_orient_max_first, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_small_star, batch_format="pyarrow")
            .materialize()
        )
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
