"""Window / rank / vector-aggregate operators (SQL-verified).

Four operator classes the engine lacked, each built on the repo's
sorted-block two-pass pattern (sort once, derive per-block boundary
partials, broadcast the tiny carry/offset map, finalize per block — the
same shape as q3_shipping's boundary merge) or on mergeable partials:

  a15_running_total   per-key cumulative SUM over time — the distributed
                      window prefix-scan. ONE corpus sort; the only
                      driver-side state is one boundary row per block.
  k13_ntile           global rank + NTILE bucketing — sort + per-block
                      row counts -> prefix offsets -> vectorized rank.
  a14_embed_centroids per-label mean embedding — vector aggregate via
                      per-batch (label, count, sum-vector) partials.
  a16_grouped_corr    Pearson correlation per group — algebraic
                      second-moment partials (n, Σx, Σy, Σx², Σy², Σxy),
                      shift-stabilized so the naive combine stays exact
                      to well past 6 dp.

Scale notes (100 TB): the sort is the one all-to-all exchange in a15/k13
and is unavoidable for rank/window semantics; boundary state is O(blocks),
offsets broadcast once via ray.put. Centroid/corr partials are O(groups)
per block and never shuffle the raw rows. Reference analog: the reference
keeps no windowed analytics (metrics singletons only,
src/meilisearch_integration/document_processor.py ProcessingMetrics);
these lift the same bookkeeping to corpus scale.

Float/SQL parity: block-local np.cumsum + carry differs from DuckDB's
sequential window accumulation only in association order (error ~1e-10 at
1e5-row blocks); both sides round to 6 dp. corr() is shift-invariant, so
both x and y are pre-shifted by fixed constants to kill the n·Σxy − ΣxΣy
cancellation before the 6-dp round.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

from ..functions.resources import pool_cap
from ..sources.documents import read_parquet_clean

SQL: dict[str, str] = {}


def _events(sf_dir: str, columns: list[str]):
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=columns)


def _docs(sf_dir: str, columns: list[str]):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


# ------------------------------------------------------------- a15 running


def _run_scan(users: np.ndarray, values: np.ndarray):
    """Vectorized per-run prefix sums over a (user-sorted) block.

    -> (running, run_starts, run_totals): running[i] is the cumulative sum
    of values within i's user-run; run_starts indexes each run's first row.
    """
    n = users.size
    cs = np.cumsum(values)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = users[1:] != users[:-1]
    run_id = np.cumsum(new_run) - 1
    run_starts = np.nonzero(new_run)[0]
    base = np.where(run_starts > 0, cs[run_starts - 1], 0.0)
    running = cs - base[run_id]
    run_ends = np.concatenate([run_starts[1:] - 1, [n - 1]])
    run_totals = cs[run_ends] - base
    return running, run_starts, run_totals


def _boundary_scan(batch: pa.Table) -> pa.Table:
    """One row per sorted block: the block's ordering key (its first row's
    full sort key), its first event_id (the block's identity tag for pass
    2), and the first/last user runs' local totals — everything the driver
    needs to compute cross-block carries."""
    users = batch["user_id"].to_numpy(zero_copy_only=False)
    if users.size == 0:
        return pa.table({
            "bkey": pa.array([], pa.int64()),
            "ord_user": pa.array([], pa.int64()),
            "ord_ts": pa.array([], pa.int64()),
            "ord_event": pa.array([], pa.int64()),
            "first_user": pa.array([], pa.int64()),
            "first_total": pa.array([], pa.float64()),
            "last_user": pa.array([], pa.int64()),
            "last_total": pa.array([], pa.float64()),
        })
    values = batch["value"].to_numpy(zero_copy_only=False)
    events = batch["event_id"].to_numpy(zero_copy_only=False)
    ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    _, starts, totals = _run_scan(users, values)
    return pa.table({
        "bkey": pa.array([int(events[0])], pa.int64()),
        "ord_user": pa.array([int(users[0])], pa.int64()),
        "ord_ts": pa.array([int(ts[0])], pa.int64()),
        "ord_event": pa.array([int(events[0])], pa.int64()),
        "first_user": pa.array([int(users[starts[0]])], pa.int64()),
        "first_total": pa.array([float(totals[0])], pa.float64()),
        "last_user": pa.array([int(users[starts[-1]])], pa.int64()),
        "last_total": pa.array([float(totals[-1])], pa.float64()),
    })


def _carries_from_boundaries(btab: pa.Table) -> dict[int, tuple[int, float]]:
    """Sequential pass over the (tiny) per-block boundary rows in global
    sort order -> {block tag: (user, carry)}. Only a block's FIRST user run
    can continue a previous block's run (rows are user-sorted), so the
    driver state is one (user, total) pair."""
    import pandas as pd

    df = btab.to_pandas().sort_values(["ord_user", "ord_ts", "ord_event"])
    carries: dict[int, tuple[int, float]] = {}
    acc_user, acc_total = None, 0.0
    for row in df.itertuples(index=False):
        carry = acc_total if acc_user == row.first_user else 0.0
        carries[int(row.bkey)] = (int(row.first_user), carry)
        acc_user = int(row.last_user)
        acc_total = float(row.last_total) + \
            (carry if row.last_user == row.first_user else 0.0)
    return carries


class _CarryScan:
    """Pass 2: per-block local prefix sums + the broadcast carry for the
    block's first user. Blocks are identified by their first event_id —
    stable because both passes map over the SAME materialized sorted
    blocks (batch_size=None = one batch per block)."""

    def __init__(self, carries_ref):
        self.carries = ray.get(carries_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        if users.size == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "running_value": pa.array([], pa.float64()),
            })
        values = batch["value"].to_numpy(zero_copy_only=False)
        events = batch["event_id"].to_numpy(zero_copy_only=False)
        running, _, _ = _run_scan(users, values)
        carry_user, carry = self.carries[int(events[0])]
        if carry != 0.0:
            running = np.where(users == carry_user, running + carry, running)
        return pa.table({
            "user_id": pa.array(users.astype(np.int64)),
            "event_id": pa.array(events.astype(np.int64)),
            "running_value": pa.array(np.round(running, 6), pa.float64()),
        })


def running_total(sf_dir: str):
    """A15: per-user running SUM(value) in (ts, event_id) order — the
    distributed window prefix-scan. One sort; per-block boundary rows give
    the driver O(blocks) state; the carry map is broadcast once."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"]) \
        .sort(["user_id", "ts", "event_id"]).materialize()
    btab = pa.concat_tables(ray.get(
        ds.map_batches(_boundary_scan, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    carries_ref = ray.put(_carries_from_boundaries(btab))
    return ds.map_batches(
        _CarryScan, fn_constructor_kwargs={"carries_ref": carries_ref},
        batch_format="pyarrow", batch_size=None, concurrency=(1, pool_cap(8)))


SQL["a15_running_total"] = """
SELECT user_id, event_id,
       round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value
FROM events
"""


# ------------------------------------------------------------- a17 lag


class _LagScan:
    """Pass 2 of the LAG operator: in-block gaps are a shifted diff within
    user runs; only the block's FIRST row can have its predecessor in the
    previous block — the broadcast map carries that one (user, ts) pair
    per block. First event of a user -> -1 (COALESCE'd on both sides so
    the column stays non-null int64)."""

    def __init__(self, prev_ref):
        self.prev = ray.get(prev_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        if users.size == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            })
        events = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        gap = np.full(users.size, -1, dtype=np.int64)
        same = users[1:] == users[:-1]
        gap[1:][same] = (ts[1:] - ts[:-1])[same]
        prev_user, prev_ts = self.prev[int(events[0])]
        if prev_user == int(users[0]):
            gap[0] = ts[0] - prev_ts
        return pa.table({
            "user_id": pa.array(users.astype(np.int64)),
            "event_id": pa.array(events.astype(np.int64)),
            "gap_us": pa.array(gap),
        })


def _last_row_scan(batch: pa.Table) -> pa.Table:
    """One row per block: ordering key + the block's last (user, ts)."""
    users = batch["user_id"].to_numpy(zero_copy_only=False)
    if users.size == 0:
        return pa.table({
            "bkey": pa.array([], pa.int64()),
            "ord_user": pa.array([], pa.int64()),
            "ord_ts": pa.array([], pa.int64()),
            "ord_event": pa.array([], pa.int64()),
            "last_user": pa.array([], pa.int64()),
            "last_ts": pa.array([], pa.int64()),
        })
    events = batch["event_id"].to_numpy(zero_copy_only=False)
    ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    return pa.table({
        "bkey": pa.array([int(events[0])], pa.int64()),
        "ord_user": pa.array([int(users[0])], pa.int64()),
        "ord_ts": pa.array([int(ts[0])], pa.int64()),
        "ord_event": pa.array([int(events[0])], pa.int64()),
        "last_user": pa.array([int(users[-1])], pa.int64()),
        "last_ts": pa.array([int(ts[-1])], pa.int64()),
    })


def event_gaps(sf_dir: str):
    """A17: LAG — microseconds since the user's previous event. Same
    sorted-block two-pass as a15, but the carry is one (user, ts) pair
    per block (the previous block's last row)."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id"]) \
        .sort(["user_id", "ts", "event_id"]).materialize()
    btab = pa.concat_tables(ray.get(
        ds.map_batches(_last_row_scan, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    import pandas as pd

    df = btab.to_pandas().sort_values(["ord_user", "ord_ts", "ord_event"])
    prev: dict[int, tuple[int, int]] = {}
    last_user, last_ts = -1, -1  # no block precedes the first
    for row in df.itertuples(index=False):
        prev[int(row.bkey)] = (last_user, last_ts)
        last_user, last_ts = int(row.last_user), int(row.last_ts)
    prev_ref = ray.put(prev)
    return ds.map_batches(
        _LagScan, fn_constructor_kwargs={"prev_ref": prev_ref},
        batch_format="pyarrow", batch_size=None, concurrency=(1, pool_cap(8)))


SQL["a17_event_gaps"] = """
SELECT user_id, event_id,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


# ------------------------------------------------------ a7 sessionization


SESSION_GAP_US = 30 * 60 * 1_000_000  # SQL oracle: INTERVAL 30 MINUTE


def _session_mask(users: np.ndarray, ts: np.ndarray,
                  gap_us: int) -> np.ndarray:
    """Row i starts a new session within this block: new user run, or
    in-run inter-event gap exceeding gap_us."""
    n = users.size
    mask = np.empty(n, dtype=bool)
    mask[0] = True
    mask[1:] = (users[1:] != users[:-1]) | (ts[1:] - ts[:-1] > gap_us)
    return mask


def _session_frags(batch: pa.Table, *, carry_ref, gap_us) -> pa.Table:
    """Pass 2: one row per LOCAL session (fragment) with its partial
    aggregate and GLOBAL session number. A fragment continuing the
    previous block's open session shares its (user, session_no) key, so
    the downstream tiny groupby merges them; O(sessions + blocks)
    fragment rows total, never events."""
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "total_value": pa.array([], pa.float64()),
        "start_us": pa.array([], pa.int64()),
        "end_us": pa.array([], pa.int64()),
    })
    if batch.num_rows == 0:
        return empty
    from ..stages.runs import fetch

    users = batch["user_id"].to_numpy(zero_copy_only=False)
    events = batch["event_id"].to_numpy(zero_copy_only=False)
    values = batch["value"].to_numpy(zero_copy_only=False)
    ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    base, continues = fetch(carry_ref)[int(events[0])]
    mask = _session_mask(users, ts, gap_us)
    sid = np.cumsum(mask) - 1
    starts = np.nonzero(mask)[0]
    ends = np.concatenate([starts[1:] - 1, [users.size - 1]])
    s_user = users[starts]
    # local per-user session rank (sessions are contiguous per user)
    user_new = np.empty(starts.size, dtype=bool)
    user_new[0] = True
    user_new[1:] = s_user[1:] != s_user[:-1]
    ustart = np.nonzero(user_new)[0]
    uid = np.cumsum(user_new) - 1
    local_k = np.arange(starts.size) - ustart[uid] + 1
    sess_no = np.where(s_user == users[0],
                       base + local_k - (1 if continues else 0),
                       local_k)
    cs = np.concatenate([[0.0], np.cumsum(values)])
    return pa.table({
        "user_id": pa.array(s_user.astype(np.int64)),
        "session_id": pa.array(sess_no.astype(np.int64)),
        "n_events": pa.array((ends - starts + 1).astype(np.int64)),
        "total_value": pa.array(cs[ends + 1] - cs[starts], pa.float64()),
        "start_us": pa.array(ts[starts].astype(np.int64)),
        "end_us": pa.array(ts[ends].astype(np.int64)),
    })


def _session_bounds(batch: pa.Table, *, gap_us) -> pa.Table:
    """Pass 1: per-block boundary profile for the session-number chain."""
    users = batch["user_id"].to_numpy(zero_copy_only=False)
    if users.size == 0:
        return pa.table({
            "bkey": pa.array([], pa.int64()),
            "ord_user": pa.array([], pa.int64()),
            "ord_ts": pa.array([], pa.int64()),
            "ord_event": pa.array([], pa.int64()),
            "first_user": pa.array([], pa.int64()),
            "first_ts": pa.array([], pa.int64()),
            "last_user": pa.array([], pa.int64()),
            "last_ts": pa.array([], pa.int64()),
            "n_sess_last_user": pa.array([], pa.int64()),
        })
    events = batch["event_id"].to_numpy(zero_copy_only=False)
    ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    mask = _session_mask(users, ts, gap_us)
    starts = np.nonzero(mask)[0]
    n_last = int(np.sum(users[starts] == users[-1]))
    return pa.table({
        "bkey": pa.array([int(events[0])], pa.int64()),
        "ord_user": pa.array([int(users[0])], pa.int64()),
        "ord_ts": pa.array([int(ts[0])], pa.int64()),
        "ord_event": pa.array([int(events[0])], pa.int64()),
        "first_user": pa.array([int(users[0])], pa.int64()),
        "first_ts": pa.array([int(ts[0])], pa.int64()),
        "last_user": pa.array([int(users[-1])], pa.int64()),
        "last_ts": pa.array([int(ts[-1])], pa.int64()),
        "n_sess_last_user": pa.array([n_last], pa.int64()),
    })


def sessionize(sf_dir: str, gap_us: int = SESSION_GAP_US):
    """A7: gap-based sessionization — the streaming session-window
    operator (§2.9) as a batch pipeline. ONE sort(user, ts, event); each
    block emits per-local-session fragment aggregates with GLOBAL session
    numbers (the cross-block chain — open-session merge + per-user
    numbering offsets — is O(blocks) driver state, broadcast once); a
    tiny groupby over fragments merges sessions that span blocks. Events
    never leave their sorted block a second time.

    Replaces the original groupby(user_id).map_groups form: same output
    (SQL["a7_sessionize"], simple_text.py), but no per-user Python
    dispatch and no hot-user task bound — a user with a billion events
    costs its share of sorted blocks, not one task's memory."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"]) \
        .sort(["user_id", "ts", "event_id"]).materialize()
    btab = pa.concat_tables(ray.get(
        ds.map_batches(_session_bounds, fn_kwargs={"gap_us": gap_us},
                       batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    df = btab.to_pandas().sort_values(["ord_user", "ord_ts", "ord_event"])
    carry: dict[int, tuple[int, bool]] = {}
    cur_user, cur_last_ts, cur_count = -1, -(1 << 62), 0
    for row in df.itertuples(index=False):
        continues = (int(row.first_user) == cur_user
                     and int(row.first_ts) - cur_last_ts <= gap_us)
        base = cur_count if int(row.first_user) == cur_user else 0
        carry[int(row.bkey)] = (base, continues)
        if int(row.last_user) == int(row.first_user):
            cur_count = base + int(row.n_sess_last_user) - int(continues)
        else:
            cur_count = int(row.n_sess_last_user)
        cur_user, cur_last_ts = int(row.last_user), int(row.last_ts)
    carry_ref = ray.put(carry)
    frags = ds.map_batches(
        _session_frags, fn_kwargs={"carry_ref": carry_ref,
                                   "gap_us": gap_us},
        batch_format="pyarrow", batch_size=None)

    from ray.data.aggregate import Max, Min, Sum

    def _finalize(batch: pa.Table) -> pa.Table:
        # timestamps must leave as timestamp[us] (SQL oracle parity)
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "session_id": batch["session_id"].cast(pa.int64()),
            "session_start": batch["min(start_us)"].cast(pa.int64())
            .cast(pa.timestamp("us")),
            "session_end": batch["max(end_us)"].cast(pa.int64())
            .cast(pa.timestamp("us")),
            "n_events": batch["sum(n_events)"].cast(pa.int64()),
            "total_value": pa.array(
                np.round(batch["sum(total_value)"]
                         .to_numpy(zero_copy_only=False), 6), pa.float64()),
        })

    return (frags.groupby(["user_id", "session_id"])
            .aggregate(Sum("n_events"), Sum("total_value"),
                       Min("start_us"), Max("end_us"))
            .map_batches(_finalize, batch_format="pyarrow"))


# ------------------------------------------------------------- k13 ntile


NTILE_TILES = 4


def ntile_bucket(rank0: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE: first (n % tiles) buckets get ceil(n/tiles) rows.
    rank0 is the 0-based global rank; returns 1-based bucket ids."""
    q, r = divmod(n, tiles)
    big = r * (q + 1)
    small = np.maximum(q, 1)  # avoid /0 when n < tiles (unused ranks then)
    return np.where(
        rank0 < big,
        rank0 // (q + 1),
        r + (rank0 - big) // small,
    ).astype(np.int64) + 1


def _block_keys(batch: pa.Table) -> pa.Table:
    return pa.table({
        "first_chars": pa.array(
            [int(batch["n_chars"][0].as_py())] if batch.num_rows else [],
            pa.int64()),
        "first_doc": pa.array(
            [int(batch["doc_id"][0].as_py())] if batch.num_rows else [],
            pa.int64()),
        "n_rows": pa.array([batch.num_rows] if batch.num_rows else [],
                           pa.int64()),
    })


class _NtilePartial:
    """Pass 2: global rank = broadcast block offset + arange, NTILE bucket,
    then a per-block per-bucket partial (count/min/max) — only O(tiles)
    rows leave each block."""

    def __init__(self, offsets_ref, total: int, tiles: int):
        self.offsets = ray.get(offsets_ref)
        self.total, self.tiles = total, tiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "quartile": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "min_chars": pa.array([], pa.int64()),
            "max_chars": pa.array([], pa.int64()),
        })
        n = batch.num_rows
        if n == 0:
            return empty
        chars = batch["n_chars"].to_numpy(zero_copy_only=False)
        key = (int(chars[0]), int(batch["doc_id"][0].as_py()))
        rank0 = self.offsets[key] + np.arange(n, dtype=np.int64)
        tile = ntile_bucket(rank0, self.total, self.tiles)
        uniq, inv = np.unique(tile, return_inverse=True)
        counts = np.bincount(inv)
        mins = np.full(uniq.size, np.iinfo(np.int64).max)
        maxs = np.full(uniq.size, np.iinfo(np.int64).min)
        np.minimum.at(mins, inv, chars)
        np.maximum.at(maxs, inv, chars)
        return pa.table({
            "quartile": pa.array(uniq, pa.int64()),
            "n_docs": pa.array(counts.astype(np.int64)),
            "min_chars": pa.array(mins, pa.int64()),
            "max_chars": pa.array(maxs, pa.int64()),
        })


def ntile_doc_buckets(sf_dir: str, tiles: int = NTILE_TILES):
    """K13: NTILE(tiles) over documents by (n_chars, doc_id) — global rank
    via sort + per-block counts -> prefix offsets (broadcast once), then a
    per-bucket aggregate. The driver sees O(blocks) counts and
    O(blocks*tiles) partials, never rows."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"]) \
        .sort(["n_chars", "doc_id"]).materialize()
    keys = pa.concat_tables(ray.get(
        ds.map_batches(_block_keys, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    import pandas as pd

    kdf = keys.to_pandas().sort_values(["first_chars", "first_doc"])
    offs = np.concatenate([[0], np.cumsum(kdf["n_rows"].to_numpy())[:-1]])
    total = int(kdf["n_rows"].sum())
    offsets = {(int(c), int(d)): int(o) for c, d, o in
               zip(kdf["first_chars"], kdf["first_doc"], offs)}
    offsets_ref = ray.put(offsets)
    partials = pa.concat_tables(ray.get(
        ds.map_batches(
            _NtilePartial,
            fn_constructor_kwargs={"offsets_ref": offsets_ref,
                                   "total": total, "tiles": tiles},
            batch_format="pyarrow", batch_size=None, concurrency=(1, pool_cap(8)),
        ).to_arrow_refs()))
    pdf = partials.to_pandas()
    out = pdf.groupby("quartile", as_index=False).agg(
        n_docs=("n_docs", "sum"), min_chars=("min_chars", "min"),
        max_chars=("max_chars", "max")).sort_values("quartile")
    return pa.table({
        "quartile": pa.array(out["quartile"].to_numpy(), pa.int64()),
        "n_docs": pa.array(out["n_docs"].to_numpy(), pa.int64()),
        "min_chars": pa.array(out["min_chars"].to_numpy(), pa.int64()),
        "max_chars": pa.array(out["max_chars"].to_numpy(), pa.int64()),
    })


SQL["k13_ntile"] = f"""
SELECT quartile, CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM (SELECT n_chars, NTILE({NTILE_TILES}) OVER (ORDER BY n_chars, doc_id)
             AS quartile
      FROM documents)
GROUP BY quartile
"""


# ------------------------------------------------------- a14 centroids


def _centroid_partial(batch: pa.Table) -> pa.Table:
    """(label, n_part, sums list<double>) — one row per label per batch."""
    empty = pa.table({
        "label": pa.array([], pa.int64()),
        "n_part": pa.array([], pa.int64()),
        "sums": pa.array([], pa.list_(pa.float64())),
    })
    if batch.num_rows == 0:
        return empty
    from ..functions.vectors import list_matrix

    labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_matrix(batch["embedding"])
    uniq, inv = np.unique(labels, return_inverse=True)
    dim = mat.shape[1]
    sums = np.zeros((uniq.size, dim), dtype=np.float64)
    np.add.at(sums, inv, mat)
    counts = np.bincount(inv).astype(np.int64)
    return pa.table({
        "label": pa.array(uniq),
        "n_part": pa.array(counts),
        "sums": pa.array(list(sums), pa.list_(pa.float64())),
    })


def embed_centroids(sf_dir: str):
    """A14: per-label mean embedding (the vector aggregate every embedding
    pipeline needs — e.g. IVF coarse centroids, per-source drift checks).
    Per-batch partial sums; only O(labels) rows per block leave the tasks;
    driver combines O(labels*blocks) partials and explodes to
    (label, dim, mean_val) rows for the SQL hash."""
    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["label", "embedding"])
    partials = pa.concat_tables(ray.get(
        ds.map_batches(_centroid_partial, batch_format="pyarrow",
                       batch_size=4096).to_arrow_refs()))
    from ..functions.vectors import list_matrix

    labels = partials["label"].to_numpy(zero_copy_only=False)
    counts = partials["n_part"].to_numpy(zero_copy_only=False)
    mat = list_matrix(partials["sums"])
    dim = mat.shape[1]
    uniq, inv = np.unique(labels, return_inverse=True)
    sums = np.zeros((uniq.size, dim), dtype=np.float64)
    np.add.at(sums, inv, mat)
    n = np.bincount(inv, weights=counts.astype(np.float64))
    means = np.round(sums / n[:, None], 6)
    k = uniq.size
    return pa.table({
        "label": pa.array(np.repeat(uniq, dim), pa.int64()),
        "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
        "mean_val": pa.array(means.reshape(-1), pa.float64()),
    })


SQL["a14_embed_centroids"] = """
SELECT CAST(label AS BIGINT) AS label, dim,
       round(avg(CAST(e AS DOUBLE)), 6) AS mean_val
FROM (SELECT label, unnest(embedding) AS e,
             unnest(range(len(embedding))) AS dim
      FROM embeddings)
GROUP BY label, dim
"""


# ------------------------------------------------------- a16 grouped corr


# corr() is shift-invariant; shifting x/y toward their rough magnitudes
# before accumulating kills the n*Σxy - Σx*Σy cancellation (raw price sums
# push the cross products past 2^53, where the naive combine loses the
# low bits the 6-dp round needs)
CORR_X_SHIFT = 25.0       # l_quantity is ~uniform(1, 50)
CORR_Y_SHIFT = 30_000.0   # l_extendedprice's rough center


def _corr_partial(batch: pa.Table) -> pa.Table:
    flags = batch["l_returnflag"].to_numpy(zero_copy_only=False)
    x = batch["l_quantity"].to_numpy(zero_copy_only=False) - CORR_X_SHIFT
    y = batch["l_extendedprice"].to_numpy(zero_copy_only=False) - CORR_Y_SHIFT
    uniq, inv = np.unique(flags, return_inverse=True)
    def gsum(v):
        return np.bincount(inv, weights=v, minlength=uniq.size)
    return pa.table({
        "flag": pa.array(uniq, pa.string()),
        "n": pa.array(np.bincount(inv, minlength=uniq.size).astype(np.int64)),
        "sx": pa.array(gsum(x), pa.float64()),
        "sy": pa.array(gsum(y), pa.float64()),
        "sxx": pa.array(gsum(x * x), pa.float64()),
        "syy": pa.array(gsum(y * y), pa.float64()),
        "sxy": pa.array(gsum(x * y), pa.float64()),
    })


def grouped_corr(sf_dir: str):
    """A16: Pearson corr(l_quantity, l_extendedprice) per returnflag via
    mergeable second-moment partials — the one-pass algebraic aggregate
    shape (no row ever leaves its block; O(groups) rows per block)."""
    import pandas as pd

    ds = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    partials = pa.concat_tables(ray.get(
        ds.map_batches(_corr_partial, batch_format="pyarrow",
                       batch_size=65536).to_arrow_refs()))
    df = partials.to_pandas().groupby("flag", as_index=False).sum()
    n = df["n"].to_numpy(dtype=np.float64)
    sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
    sxx, syy, sxy = df["sxx"].to_numpy(), df["syy"].to_numpy(), \
        df["sxy"].to_numpy()
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    denom = np.sqrt(varx * vary)
    corr = np.where(denom > 0, cov / np.where(denom == 0, 1.0, denom), 0.0)
    order = np.argsort(df["flag"].to_numpy())
    return pa.table({
        "l_returnflag": pa.array(df["flag"].to_numpy()[order], pa.string()),
        "corr_qty_price": pa.array(np.round(corr[order], 6), pa.float64()),
        "n": pa.array(df["n"].to_numpy()[order].astype(np.int64)),
    })


SQL["a16_grouped_corr"] = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
"""


# ------------------------------------------------ a19 embedding covariance


def _embed_mat(batch: pa.Table) -> np.ndarray:
    from ..functions.vectors import list_matrix

    return list_matrix(batch["embedding"])


def _embed_mean_cov(sf_dir: str):
    """Streaming (mean, sample covariance, n) of the embedding corpus —
    two passes of mergeable partials, no row ever shuffled: pass 1
    (n, sum-vector) -> broadcast means; pass 2 centered outer products
    summed per batch (np.einsum), partials are fixed d x d float64
    blocks. Centering before accumulation keeps the combine exact to
    well past 6 dp (same rationale as a16's shift). Shared by
    embed_covariance (a19) and embed_pca (a19b)."""
    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["embedding"])

    def _sum_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.list_(pa.float64()))})
        if batch.num_rows == 0:
            return empty
        mat = _embed_mat(batch)
        return pa.table({
            "n": pa.array([mat.shape[0]], pa.int64()),
            "s": pa.array([mat.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
        })

    p1 = pa.concat_tables(ray.get(
        ds.map_batches(_sum_partial, batch_format="pyarrow",
                       batch_size=4096).to_arrow_refs()))
    n = int(sum(p1["n"].to_pylist()))
    mean = np.sum([np.asarray(x) for x in p1["s"].to_pylist()],
                  axis=0) / n
    mean_ref = ray.put(mean)

    def _outer_partial(batch: pa.Table, *, mean_ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"outer": pa.array([], pa.list_(pa.float64()))})
        from ..stages.runs import fetch

        mat = _embed_mat(batch) - fetch(mean_ref)
        outer = np.einsum("ni,nj->ij", mat, mat)
        return pa.table({"outer": pa.array([outer.reshape(-1).tolist()],
                                           pa.list_(pa.float64()))})

    p2 = pa.concat_tables(ray.get(
        ds.map_batches(_outer_partial, fn_kwargs={"mean_ref": mean_ref},
                       batch_format="pyarrow",
                       batch_size=4096).to_arrow_refs()))
    d = mean.size
    cov = np.sum([np.asarray(x) for x in p2["outer"].to_pylist()],
                 axis=0).reshape(d, d) / (n - 1)
    return mean, cov, n


def embed_covariance(sf_dir: str):
    """A19: the d x d sample covariance of the embedding columns as
    (dim_i, dim_j, cov) upper-triangle rows — see _embed_mean_cov for
    the distributed shape."""
    mean, cov, _ = _embed_mean_cov(sf_dir)
    iu, ju = np.triu_indices(mean.size)
    return pa.table({
        "dim_i": pa.array(iu.astype(np.int64)),
        "dim_j": pa.array(ju.astype(np.int64)),
        "cov": pa.array(np.round(cov[iu, ju], 6), pa.float64()),
    })


def embed_pca(sf_dir: str, k: int = 4):
    """A19b (rows-only): distributed PCA projection — eigh over the
    streaming covariance (driver-side: d x d is tiny), top-k components
    broadcast, every embedding batch projected (x - mean) @ W^T in one
    vectorized pass. Component signs are fixed (largest-|coordinate|
    positive) so output is deterministic; components are returned
    ordered by explained variance."""
    mean, cov, _ = _embed_mean_cov(sf_dir)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T                   # (k, d)
    flip = np.sign(comp[np.arange(k), np.argmax(np.abs(comp), axis=1)])
    comp = comp * flip[:, None]
    state_ref = ray.put((mean, comp))

    def _project(batch: pa.Table, *, state_ref) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "pc": pa.array([], pa.list_(pa.float64()))})
        if batch.num_rows == 0:
            return empty
        from ..functions.vectors import list_matrix
        from ..stages.runs import fetch

        mean, comp = fetch(state_ref)
        proj = (list_matrix(batch["embedding"]) - mean) @ comp.T
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "pc": pa.array(np.round(proj, 6).tolist(),
                           pa.list_(pa.float64())),
        })

    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    return ds.map_batches(_project, fn_kwargs={"state_ref": state_ref},
                          batch_format="pyarrow", batch_size=4096)


SQL["a19_embed_cov"] = """
WITH u AS (
  SELECT vec_id, unnest(embedding) AS e,
         unnest(range(len(embedding))) AS dim
  FROM embeddings
)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       round(covar_samp(CAST(a.e AS DOUBLE), CAST(b.e AS DOUBLE)), 6) AS cov
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""


# ------------------------------- funnel analysis (ordered subsequence)

FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def _funnel_transitions(codes: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                        n_steps: int) -> np.ndarray:
    """For each fragment [lo[i], hi[i]) of the step-code array, the funnel
    TRANSITION MAP t[i, s] = state reached by the end of the fragment when
    entering at state s. Fully vectorized: for each (entry s, step k >= s)
    one searchsorted over step k's occurrence positions advances every
    fragment simultaneously — no per-fragment Python loop. Transition maps
    compose associatively, so cross-block user fragments chain exactly."""
    nf = lo.size
    pos = [np.flatnonzero(codes == k) for k in range(n_steps)]
    t = np.empty((nf, n_steps + 1), np.int8)
    for s in range(n_steps + 1):
        cur = lo.astype(np.int64)   # next index each fragment may consume
        state = np.full(nf, s, np.int8)
        for k in range(s, n_steps):
            p = pos[k]
            if p.size == 0:
                break  # step k absent from this block: the ordered chain
                # cannot advance past it for any fragment entering at s
            j = np.searchsorted(p, cur)
            hit = (j < p.size) & (np.where(j < p.size, p[np.minimum(
                j, max(p.size - 1, 0))], np.iinfo(np.int64).max) < hi)
            state = np.where(hit, k + 1, state).astype(np.int8)
            # fragments that missed step k stop advancing (subsequence is
            # ordered); freeze them by pushing cur past hi
            cur = np.where(hit, p[np.minimum(j, max(p.size - 1, 0))] + 1,
                           np.iinfo(np.int64).max)
        t[:, s] = state
    return t


def funnel_stages(sf_dir: str,
                  steps: tuple = FUNNEL_STEPS) -> pa.Table:
    """A21 -> (stage, n_users): how far each user got through the ordered
    funnel (events must appear as a TIME-ORDERED SUBSEQUENCE; unrelated
    events in between are fine), histogrammed over users.

    Distributed shape: ONE sort by (user_id, ts, event_id), then per-block
    vectorized transition maps. A user fully inside a block contributes
    its stage to that block's 5-int histogram partial; only the first/last
    user run of each block ships its (n_steps+1)-byte map to the driver,
    where maps compose associatively in block order (function composition
    of monotone automaton maps — the same O(blocks) carry contract as a15/
    a17)."""
    step_of = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]) \
        .sort(["user_id", "ts", "event_id"]).materialize()

    def block_maps(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "ord_ts": pa.array([], pa.int64()),
                "ord_ev": pa.array([], pa.int64()),
                "tmap": pa.array([], pa.list_(pa.int8())),
                "hist": pa.array([], pa.list_(pa.int64()))})
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        tsi = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        evid = batch["event_id"].to_numpy(zero_copy_only=False)
        ev = batch["event_type"].to_pylist()
        codes = np.fromiter((step_of.get(e, -1) for e in ev), np.int8,
                            count=len(ev))
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        ends = np.r_[starts[1:], users.size]
        t = _funnel_transitions(codes, starts, ends, n_steps)
        edge = np.zeros(starts.size, bool)
        edge[0] = True
        edge[-1] = True
        hist = np.bincount(t[~edge, 0], minlength=n_steps + 1)
        rows_u = users[starts[edge]]
        ne = int(edge.sum())  # edge-fragment rows, then ONE histogram row
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(ne, np.int8), [1]].astype(
                np.int8)),
            "user_id": pa.array(np.r_[rows_u, [0]].astype(np.int64)),
            # fragment order within a user = its first row's GLOBAL sort
            # key (ts, event_id) — correct even if blocks arrive out of
            # order on the driver
            "ord_ts": pa.array(np.r_[tsi[starts[edge]], [0]].astype(
                np.int64)),
            "ord_ev": pa.array(np.r_[evid[starts[edge]], [0]].astype(
                np.int64)),
            "tmap": pa.array([r.tolist() for r in t[edge]] + [[]],
                             pa.list_(pa.int8())),
            "hist": pa.array([[]] * ne + [hist.tolist()],
                             pa.list_(pa.int64())),
        })

    parts = [b for b in ds.map_batches(
        block_maps, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow")]
    total = np.zeros(n_steps + 1, np.int64)
    frags: list[tuple[int, int, int, np.ndarray]] = []
    for b in parts:
        kinds = b["kind"].to_numpy(zero_copy_only=False)
        for i in range(b.num_rows):
            if kinds[i] == 1:
                h = np.asarray(b["hist"][i].as_py(), np.int64)
                if h.size:
                    total += h
            else:
                frags.append((int(b["user_id"][i].as_py()),
                              int(b["ord_ts"][i].as_py()),
                              int(b["ord_ev"][i].as_py()),
                              np.asarray(b["tmap"][i].as_py(), np.int8)))
    frags.sort(key=lambda x: x[:3])
    i = 0
    while i < len(frags):
        j = i
        state = 0
        while j < len(frags) and frags[j][0] == frags[i][0]:
            state = int(frags[j][3][state])
            j += 1
        total[state] += 1
        i = j
    return pa.table({
        "stage": pa.array(np.arange(n_steps + 1, dtype=np.int64)),
        "n_users": pa.array(total, pa.int64()),
    })


def _funnel_like(steps: tuple) -> str:
    return "%" + "%".join(f"|{s}|" for s in steps) + "%"


SQL["a21_funnel_stages"] = f"""
WITH s AS (
  SELECT user_id,
         '|' || string_agg(event_type, '||' ORDER BY ts, event_id) || '|'
           AS seq
  FROM events GROUP BY user_id
), st AS (
  SELECT user_id,
         CASE
           WHEN seq LIKE '{_funnel_like(FUNNEL_STEPS)}' THEN 4
           WHEN seq LIKE '{_funnel_like(FUNNEL_STEPS[:3])}' THEN 3
           WHEN seq LIKE '{_funnel_like(FUNNEL_STEPS[:2])}' THEN 2
           WHEN seq LIKE '{_funnel_like(FUNNEL_STEPS[:1])}' THEN 1
           ELSE 0
         END AS stage
  FROM s
)
SELECT CAST(g.stage AS BIGINT) AS stage,
       CAST(count(st.user_id) AS BIGINT) AS n_users
FROM range(0, 5) g(stage) LEFT JOIN st ON st.stage = g.stage
GROUP BY g.stage
ORDER BY g.stage
"""


# ---------------------------------------------- a25 percent_rank (ties)

def _pr_block_key(types, vals, eids) -> tuple:
    """Stable block identity = the first row's (type, value BITS, id).
    The value rides as its exact float64 bit pattern (int) so pass-1 and
    pass-2 keys match bit-for-bit with no float-equality or repr/parse
    round trip (r3 advice: the old repr()/ast.literal_eval tag raised on
    nan/inf and NaN broke dict-key equality)."""
    return (str(types[0]),
            int(np.float64(vals[0]).view(np.int64)), int(eids[0]))


def _pr_profile(batch: pa.Table) -> pa.Table:
    """Per-block profile for the percent_rank driver walk: ordered
    (type, count) segments, the block's first/last (type, value), and the
    block-relative row index where the last tie run starts. O(types in
    block) rows per block. Block identity travels as THREE TYPED columns
    (first_type, first_value, first_eid), never a repr string.

    Finite-value guard: tie runs are detected by value equality and the
    oracle's ORDER BY has no deterministic NaN tie semantics — a NaN/inf
    value is a loud error here, not a silent rank divergence."""
    empty = pa.schema([("seg_type", pa.string()),
                       ("seg_n", pa.int64()), ("first_type", pa.string()),
                       ("first_value", pa.float64()),
                       ("first_eid", pa.int64()),
                       ("last_type", pa.string()),
                       ("last_value", pa.float64()),
                       ("last_run_start", pa.int64()),
                       ("seg_idx", pa.int64())])
    if batch.num_rows == 0:
        return empty.empty_table()
    types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    vals = batch["value"].to_numpy(zero_copy_only=False)
    eids = batch["event_id"].to_numpy(zero_copy_only=False)
    if not np.isfinite(vals).all():
        raise ValueError(
            "percent_rank_events requires finite values: NaN/inf have no "
            "deterministic tie-run semantics vs the SQL window oracle")
    new_t = np.r_[True, types[1:] != types[:-1]]
    seg_starts = np.flatnonzero(new_t)
    seg_lens = np.diff(np.r_[seg_starts, types.size])
    new_run = np.r_[True, (types[1:] != types[:-1]) | (vals[1:] != vals[:-1])]
    last_run_start = int(np.flatnonzero(new_run)[-1])
    n = seg_starts.size
    return pa.table({
        "seg_type": pa.array([types[i] for i in seg_starts], pa.string()),
        "seg_n": pa.array(seg_lens.astype(np.int64)),
        "first_type": pa.array([str(types[0])] * n, pa.string()),
        "first_value": pa.array([float(vals[0])] * n, pa.float64()),
        "first_eid": pa.array([int(eids[0])] * n, pa.int64()),
        "last_type": pa.array([str(types[-1])] * n, pa.string()),
        "last_value": pa.array([float(vals[-1])] * n, pa.float64()),
        "last_run_start": pa.array([last_run_start] * n, pa.int64()),
        "seg_idx": pa.array(np.arange(n, dtype=np.int64)),
    })


class _PrEmit:
    """Pass 2: per-row percent_rank from broadcast per-block state
    (per-type base offsets, tie-carry rank for a first run continuing an
    earlier block, per-type totals)."""

    def __init__(self, state_ref, totals_ref):
        self.state = ray.get(state_ref) if isinstance(
            state_ref, ray.ObjectRef) else state_ref
        self.totals = ray.get(totals_ref) if isinstance(
            totals_ref, ray.ObjectRef) else totals_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string()),
                          "pr": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        vals = batch["value"].to_numpy(zero_copy_only=False)
        eids = batch["event_id"].to_numpy(zero_copy_only=False)
        bases, carry = self.state[_pr_block_key(types, vals, eids)]
        # global per-type position of each row
        new_t = np.r_[True, types[1:] != types[:-1]]
        seg_starts = np.flatnonzero(new_t)
        pos = np.empty(types.size, np.int64)
        for si in seg_starts:
            t = types[si]
            end = si
            while end < types.size and types[end] == t:
                end += 1
            pos[si:end] = bases[t] + np.arange(end - si)
        # rank = global position of the first row of the row's tie run
        new_run = np.r_[True,
                        (types[1:] != types[:-1]) | (vals[1:] != vals[:-1])]
        rid = np.cumsum(new_run) - 1
        run_start_pos = pos[np.flatnonzero(new_run)]
        rank = run_start_pos[rid].astype(np.float64)
        if carry is not None:
            rank[rid == 0] = carry
        denom = np.array([max(self.totals[t] - 1, 1) for t in types],
                         np.float64)
        pr = np.where(
            np.array([self.totals[t] for t in types]) > 1,
            rank / denom, 0.0)
        return pa.table({
            "event_id": pa.array(eids.astype(np.int64)),
            "event_type": pa.array(types.tolist(), pa.string()),
            "pr": pa.array(np.round(pr, 6), pa.float64()),
        })


def percent_rank_events(sf_dir: str):
    """A25: percent_rank() per event_type ordered by value — the
    tie-correct global-rank window (rank = MIN rank of the tie run, so a
    run straddling blocks must inherit the run's global start).

    Scale shape: ONE sort(type, value, event_id); pass 1 collects
    O(types-in-block) profile rows per block; the driver walks blocks in
    sort order maintaining per-type running offsets and the current tie
    run's global start (O(blocks) work, never rows); pass 2 emits ranks
    per row with the broadcast state. Rows never visit the driver."""
    ds = (_events(sf_dir, ["event_id", "event_type", "value"])
          .sort(["event_type", "value", "event_id"]).materialize())
    prof = pa.concat_tables(ray.get(
        ds.map_batches(_pr_profile, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs()))
    blocks: dict = {}
    for r in prof.to_pylist():
        key = (r["first_type"],
               int(np.float64(r["first_value"]).view(np.int64)),
               int(r["first_eid"]))
        b = blocks.setdefault(key, {
            # driver walk order == the dataset's sort keys
            "first": (r["first_type"], r["first_value"], r["first_eid"]),
            "key": key, "segs": {},
            "first_type": r["first_type"], "first_value": r["first_value"],
            "last_type": r["last_type"], "last_value": r["last_value"],
            "last_run_start": r["last_run_start"]})
        b["segs"][r["seg_idx"]] = (r["seg_type"], r["seg_n"])
    ordered = sorted(blocks.values(), key=lambda b: b["first"])

    pos_in_type: dict[str, int] = {}
    totals: dict[str, int] = {}
    cur_tie = None          # (type, value) of the open tie run
    cur_tie_start = 0       # its global per-type start position
    state: dict[str, tuple] = {}
    for b in ordered:
        segs = [b["segs"][i] for i in sorted(b["segs"])]
        bases = {}
        for t, n_seg in segs:
            bases.setdefault(t, pos_in_type.get(t, 0))
        continuing = (cur_tie is not None
                      and cur_tie == (b["first_type"], b["first_value"]))
        carry = cur_tie_start if continuing else None
        # advance the open tie run: where does this block's LAST run start?
        last_base = pos_in_type.get(b["last_type"], 0)
        # rows of the last type BEFORE this block within the block:
        rows_before_last_type = sum(
            n_seg for t, n_seg in segs[:-1]) if len(segs) > 1 else 0
        if b["last_run_start"] == 0 and continuing:
            pass  # whole block continues the open run: start unchanged
        else:
            # block-relative last_run_start indexes ALL block rows; runs
            # break at type changes, so the last run lies inside the last
            # type's segment — convert to that type's per-type position
            cur_tie_start = (last_base + b["last_run_start"]
                             - rows_before_last_type)
        cur_tie = (b["last_type"], b["last_value"])
        for t, n_seg in segs:
            pos_in_type[t] = pos_in_type.get(t, 0) + n_seg
            totals[t] = totals.get(t, 0) + n_seg
        state[b["key"]] = (bases, carry)

    state_ref, totals_ref = ray.put(state), ray.put(totals)
    return ds.map_batches(
        _PrEmit, fn_constructor_kwargs={"state_ref": state_ref,
                                        "totals_ref": totals_ref},
        batch_format="pyarrow", batch_size=None,
        concurrency=(1, pool_cap(8)))


SQL["a25_percent_rank"] = """
SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value), 6) AS pr
FROM events
"""
