"""Sorted-run utilities: per-key runs over a sorted Dataset, without the
groupby().map_groups() per-group Python dispatch.

After ds.sort(order_cols), rows with equal key_cols are contiguous, so
any "one winner per key" or "per-key reduction" operator becomes a
vectorized first-of-run / run-length scan per block — the only cross-
block state is one boundary row per block, merged on the driver (O(blocks)
rows) and broadcast back. This is the same exchange a groupby would pay
(Ray's groupby is sort-based), minus one Python call + table build PER
GROUP — which scales with distinct keys (unique texts, users, grams:
corpus-sized), not with blocks.

Used by: curate.py exact dedup (first doc per content hash),
corpus_stats.py j8 (newest event per user), dedup_pipelines.py d10/d11
(which add their own per-run reductions on the same pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _col_np(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if pa.types.is_timestamp(c.type):
        c = c.cast(pa.timestamp("us")).cast(pa.int64())
    return c.to_numpy(zero_copy_only=False)


def new_run_mask(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Boolean mask: row i starts a new key run within this block."""
    n = batch.num_rows
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask
    mask[0] = True
    for col in key_cols:
        v = _col_np(batch, col)
        if v.dtype == object:
            mask[1:] |= v[1:] != v[:-1]
        else:
            mask[1:] |= v[1:] != v[:-1]
    return mask


def _row_tuple(batch: pa.Table, cols: list[str], idx: int) -> tuple:
    out = []
    for col in cols:
        v = batch[col][idx].as_py()
        if hasattr(v, "timestamp"):  # datetime -> int us (hashable, stable)
            v = int(v.timestamp() * 1_000_000)
        out.append(v)
    return tuple(out)


def keep_first_per_run(sorted_ds, key_cols: list[str],
                       order_cols: list[str],
                       descending: list[bool] | None = None,
                       concurrency=(1, 8)):
    """-> Dataset with exactly the FIRST row of every key run kept.

    sorted_ds must be MATERIALIZED and sorted by order_cols (with the
    given descending flags); order_cols must start with key_cols and be
    row-unique (the uniqueness makes each block's first row a stable
    block tag across the two passes). The survivor per key is the run's
    first row in that order — min/max/newest semantics are chosen by the
    caller's sort direction."""
    descending = descending or [False] * len(order_cols)

    def _bounds(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"tag": pa.array([], pa.string()),
                             "last": pa.array([], pa.string())})
        first = _row_tuple(batch, order_cols, 0)
        last_key = _row_tuple(batch, key_cols, -1)
        return pa.table({"tag": pa.array([repr(first)], pa.string()),
                         "last": pa.array([repr(last_key)], pa.string())})

    btab = pa.concat_tables(ray.get(
        sorted_ds.map_batches(_bounds, batch_format="pyarrow",
                              batch_size=None).to_arrow_refs()))
    import ast

    rows = [(ast.literal_eval(t), t, l) for t, l in
            zip(btab["tag"].to_pylist(), btab["last"].to_pylist())]
    # block order = order of their first rows under the sort
    signs = [-1 if d else 1 for d in descending]

    def _ordkey(tup):
        return tuple(s * v if isinstance(v, (int, float)) else v
                     for s, v in zip(signs, tup))

    # string columns with descending sort would need reverse lexicographic
    # keys; none of the current callers sorts strings descending
    assert all(not d or not isinstance(r[0][i], str)
               for r in rows for i, d in enumerate(descending)), \
        "descending string keys unsupported"
    rows.sort(key=lambda r: _ordkey(r[0]))
    prev: dict[str, str] = {}
    last = ""  # repr() output is never empty: first block's run survives
    for _, tag, lastkey in rows:
        prev[tag] = last
        last = lastkey
    prev_ref = ray.put(prev)

    class _Keep:
        def __init__(self, prev_ref):
            self.prev = ray.get(prev_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            keep = new_run_mask(batch, key_cols)
            tag = repr(_row_tuple(batch, order_cols, 0))
            keep[0] = repr(_row_tuple(batch, key_cols, 0)) != self.prev[tag]
            return batch.filter(pa.array(keep))

    return sorted_ds.map_batches(
        _Keep, fn_constructor_kwargs={"prev_ref": prev_ref},
        batch_format="pyarrow", batch_size=None, concurrency=concurrency)
