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

The broadcast state is tiny (O(blocks) entries), so the scan stages are
plain TASK functions — no actor pool to spin up; each worker process
ray.get()s the state once via the module-level memo (`fetch`).

Used by: curate.py exact dedup (first doc per content hash),
corpus_stats.py j8 (newest event per user), dedup_pipelines.py d10/d11
(which add their own per-run reductions on the same pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MEMO: dict[str, object] = {}
_MEMO_CAP = 8  # a stage uses ONE broadcast object; don't pin old ones


def fetch(ref: "ray.ObjectRef") -> object:
    """ray.get(ref) once per worker process (plasma hit + deserialization
    are paid once, not per batch) — lets broadcast state ride in plain
    task functions instead of forcing an actor pool. Bounded: long-lived
    workers running many pipelines must not pin every broadcast object
    (and its plasma buffer) forever."""
    key = ref.hex()
    if key not in _MEMO:
        if len(_MEMO) >= _MEMO_CAP:
            _MEMO.clear()
        _MEMO[key] = ray.get(ref)
    return _MEMO[key]


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
        mask[1:] |= v[1:] != v[:-1]
    return mask


def _row_tuple(batch: pa.Table, cols: list[str], idx: int) -> tuple:
    out = []
    for col in cols:
        c = batch[col]
        if pa.types.is_timestamp(c.type):
            # tz-safe epoch-us via arrow casts — naive datetime.timestamp()
            # is local-timezone dependent (non-monotonic across DST) and
            # float-truncates, which would disagree with the sort order
            i = idx if idx >= 0 else batch.num_rows + idx
            out.append(c.slice(i, 1).cast(pa.timestamp("us"))
                       .cast(pa.int64())[0].as_py())
        else:
            out.append(c[idx].as_py())
    return tuple(out)


def _keep_scan(batch: pa.Table, *, prev_ref, key_cols, order_cols,
               invert) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    prev = fetch(prev_ref)
    keep = new_run_mask(batch, key_cols)
    tag = repr(_row_tuple(batch, order_cols, 0))
    keep[0] = repr(_row_tuple(batch, key_cols, 0)) != prev[tag]
    if invert:
        keep = ~keep
    return batch.filter(pa.array(keep))


def keep_first_per_run(sorted_ds, key_cols: list[str],
                       order_cols: list[str],
                       descending: list[bool] | None = None,
                       invert: bool = False):
    """-> Dataset with exactly the FIRST row of every key run kept
    (invert=True keeps everything EXCEPT run firsts — the "losers" of a
    dedup, i.e. rows whose key already appeared earlier in the order).

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
    if "tag" not in btab.column_names:
        # every block was a SCHEMALESS empty (an upstream filter dropped
        # the whole corpus): there are no runs — pass the (empty) blocks
        # through instead of crashing on the missing bounds columns
        btab = pa.table({"tag": pa.array([], pa.string()),
                         "last": pa.array([], pa.string())})
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

    return sorted_ds.map_batches(
        _keep_scan,
        fn_kwargs={"prev_ref": prev_ref, "key_cols": key_cols,
                   "order_cols": order_cols, "invert": invert},
        batch_format="pyarrow", batch_size=None)


def anti_id_filter(ds, loser_ds, id_col: str = "doc_id",
                   max_broadcast: int = 5_000_000,
                   tmp_dir: str | None = None):
    """Drop every row of `ds` whose `id_col` appears in `loser_ds` (a
    Dataset holding the ids to remove) — the anti-semi-join that applies a
    dedup verdict WITHOUT shuffling the payload: text/binary columns stay
    in their blocks; only membership information moves.

    Two physical forms, picked by loser count:
      - broadcast (<= max_broadcast ids): one sorted int64 array via
        ray.put (8 B/id: 5M ids = 40 MB), per-batch searchsorted probe.
      - side-parquet (the 100-TB path, loser sets too big for worker
        heaps): losers sorted by id and written to parquet with small row
        groups; each payload block RANGE-reads only the loser slice
        covering its own [min_id, max_id] (row-group stats pruning), so
        per-task memory is O(overlap), never O(losers).
    """
    import os
    import tempfile

    loser_ds = loser_ds.materialize()  # consumed twice: count + collect
    n = loser_ds.count()
    if n == 0:
        return ds

    if n <= max_broadcast:
        ids = np.sort(np.concatenate([
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            for t in ray.get(loser_ds.to_arrow_refs()) if t.num_rows
        ]))
        ref = ray.put(ids)

        def _drop(batch: pa.Table, *, ref) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            losers = fetch(ref)
            v = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(losers, v)
            pos[pos == losers.size] = 0
            hit = losers[pos] == v
            return batch.filter(pa.array(~hit))

        return ds.map_batches(_drop, fn_kwargs={"ref": ref},
                              batch_format="pyarrow", batch_size=8192)

    path = tmp_dir or tempfile.mkdtemp(prefix="anti_ids_", dir="/tmp")
    (loser_ds.sort(id_col)
     .write_parquet(path, row_group_size=64 * 1024))
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))

    def _drop_file(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import pyarrow.dataset as pads

        v = batch[id_col].to_numpy(zero_copy_only=False)
        lo, hi = int(v.min()), int(v.max())
        tab = pads.dataset(files).to_table(
            columns=[id_col],
            filter=(pads.field(id_col) >= lo) & (pads.field(id_col) <= hi))
        losers = np.sort(
            tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        if losers.size == 0:
            return batch
        pos = np.searchsorted(losers, v)
        pos[pos == losers.size] = 0
        hit = losers[pos] == v
        return batch.filter(pa.array(~hit))

    return ds.map_batches(_drop_file, batch_format="pyarrow",
                          batch_size=8192)


def semi_id_filter(ds, keep_ds, id_col: str = "doc_id",
                   max_broadcast: int = 5_000_000,
                   tmp_dir: str | None = None):
    """KEEP only the rows of `ds` whose `id_col` appears in `keep_ds` — the
    semi-join twin of anti_id_filter, with the same two physical forms
    (broadcast sorted-array probe <= max_broadcast keys; sorted side-parquet
    with per-block [min, max] range reads above). The sideways-information-
    passing pushdown for joins: pre-filtering the big probe side by the
    filtered dim side's keys means the co-partition exchange that follows
    only moves QUALIFYING rows."""
    import os
    import tempfile

    keep_ds = keep_ds.materialize()  # consumed twice: count + collect
    n = keep_ds.count()
    if n == 0:  # nothing qualifies: typed-empty blocks, schema preserved
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")

    if n <= max_broadcast:
        ids = np.sort(np.concatenate([
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            for t in ray.get(keep_ds.to_arrow_refs()) if t.num_rows
        ]))
        ref = ray.put(ids)

        def _keep(batch: pa.Table, *, ref) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            keys = fetch(ref)
            v = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, v)
            pos[pos == keys.size] = 0
            return batch.filter(pa.array(keys[pos] == v))

        return ds.map_batches(_keep, fn_kwargs={"ref": ref},
                              batch_format="pyarrow", batch_size=8192)

    path = tmp_dir or tempfile.mkdtemp(prefix="semi_ids_", dir="/tmp")
    (keep_ds.sort(id_col)
     .write_parquet(path, row_group_size=64 * 1024))
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))

    def _keep_file(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import pyarrow.dataset as pads

        v = batch[id_col].to_numpy(zero_copy_only=False)
        lo, hi = int(v.min()), int(v.max())
        tab = pads.dataset(files).to_table(
            columns=[id_col],
            filter=(pads.field(id_col) >= lo) & (pads.field(id_col) <= hi))
        keys = np.sort(
            tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        if keys.size == 0:
            return batch.slice(0, 0)
        pos = np.searchsorted(keys, v)
        pos[pos == keys.size] = 0
        return batch.filter(pa.array(keys[pos] == v))

    return ds.map_batches(_keep_file, batch_format="pyarrow",
                          batch_size=8192)


_NO_KEY = object()


def merge_run_reductions(rows: list[dict], combine):
    """Chain per-block boundary profiles into FULL cross-block reductions
    of each block's first and last key runs, under any associative
    `combine` (sum for run lengths, min for per-run minima, or for
    any-flags...). A key's run may span MANY blocks.

    rows: one mapping per block, in GLOBAL sort order, with keys
      tag        stable block identity (any hashable)
      first_key / last_key   the block's first / last run's key value
      first_val / last_val   the block-local reduction of those runs
      n_runs     number of key runs in the block
    -> {tag: (first_run_total, last_run_total)}  (equal when n_runs == 1).
    """
    first_total: dict = {}
    last_total: dict = {}
    open_key, open_acc = _NO_KEY, None
    members: list[tuple] = []

    def close():
        for tag, kind in members:
            if kind in ("first", "whole"):
                first_total[tag] = open_acc
            if kind in ("last", "whole"):
                last_total[tag] = open_acc

    for e in rows:
        if open_key is not _NO_KEY and e["first_key"] == open_key:
            open_acc = combine(open_acc, e["first_val"])
            if e["n_runs"] == 1:
                members.append((e["tag"], "whole"))
                continue
            members.append((e["tag"], "first"))
            close()
        else:
            if open_key is not _NO_KEY:
                close()
            if e["n_runs"] == 1:
                open_key, open_acc = e["first_key"], e["first_val"]
                members = [(e["tag"], "whole")]
                continue
            first_total[e["tag"]] = e["first_val"]
        open_key, open_acc = e["last_key"], e["last_val"]
        members = [(e["tag"], "last")]
    if open_key is not _NO_KEY:
        close()
    return {t: (first_total[t], last_total[t]) for t in first_total}


def sum_by_int_key(ds, key_col: str, val_col: str,
                   out_col: str | None = None):
    """`ds.groupby(key_col).sum(val_col)` for an int64-ish key as ONE
    sort + vectorized per-block run sums (np.add.reduceat) — measured ~5x
    faster than the Aggregate operator on this box for 100k-1M-row
    combines (BASELINE.md round 4). Interior runs complete inside their
    block; only each block's FIRST and LAST runs (the only runs that can
    straddle) collect on the driver — O(blocks) rows — where same-key
    partials merge and re-enter as one tiny block. Sum dtype follows the
    value column (int64 stays exact — the money-sum convention).

    Output columns: (key_col, out_col or f"sum({val_col})")."""
    out_col = out_col or f"sum({val_col})"

    def _scan(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.from_numpy_dtype(v.dtype)),
                "partial": pa.array([], pa.bool_())})
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(v, starts)
        n_runs = starts.size
        partial = np.zeros(n_runs, bool)
        partial[0] = partial[-1] = True
        return pa.table({
            key_col: pa.array(k[starts].astype(np.int64)),
            out_col: pa.array(sums),
            "partial": pa.array(partial)})

    seg = (ds.sort(key_col)
           .map_batches(_scan, batch_format="pyarrow", batch_size=None)
           .materialize())
    done = seg.filter(expr="partial == False").select_columns(
        [key_col, out_col])
    raws = [b for b in seg.filter(expr="partial == True")
            .iter_batches(batch_format="pyarrow")]
    if not raws:
        return done
    bt = pa.concat_tables(raws)
    k = bt[key_col].to_numpy(zero_copy_only=False)
    v = bt[out_col].to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    k, v = k[order], v[order]
    new = np.r_[True, k[1:] != k[:-1]]
    starts = np.flatnonzero(new)
    merged = ray.data.from_arrow(pa.table({
        key_col: pa.array(k[starts].astype(np.int64)),
        out_col: pa.array(np.add.reduceat(v, starts))}))
    return done.union(merged)
