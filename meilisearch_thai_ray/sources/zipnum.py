"""ZipNum sharded CDX + cluster index (the Common Crawl / pywb
"zipnum cluster" layout — e.g. CC's cc-index `cluster.idx`).

At archive scale the CDX itself outgrows memory (Common Crawl's is
~200-300 GB of sorted lines per snapshot), so readers never load it:
the sorted CDX is cut into fixed-count line blocks, each block gzipped
as its own member ("zipnum"), and a SECOND-level index — one summary
line per block: (first urlkey, part file, offset, length) — is the only
thing a query node holds. A lookup binary-searches the summary (tiny,
~1/lines_per_block of the CDX), then does ONE ranged read + one-block
gunzip + a bounded linear scan. Two levels collapse a 300 GB index to a
~100 MB in-memory table and one IO per query.

Ray shape: the sorted CDX Dataset's blocks are globally range-ordered
(post-sort), so each map task packs ITS rows into zipnum members and
writes one part file — no extra exchange; summary rows are O(blocks of
lines_per_block) and sort on the driver (the same O(parts) contract as
the index manifest). Part files are content-named and atomically
replaced: a re-run overwrites with identical bytes (resumable).

Line format: CDXJ — `urlkey warc_ts {sorted-key json}` — deterministic
bytes for a given row, so the layout is reproducible end to end.
"""

from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa

_CDX_FIELDS = ("url", "digest", "offset", "length", "filename",
               "record_type", "payload_len")


def _cdxj_line(row: dict) -> bytes:
    body = {k: row[k] for k in _CDX_FIELDS if k in row}
    return (f"{row['urlkey']} {row['warc_ts']} "
            f"{json.dumps(body, sort_keys=True, ensure_ascii=False)}\n"
            ).encode("utf-8")


def _parse_cdxj(line: bytes) -> dict:
    key, ts, rest = line.decode("utf-8").rstrip("\n").split(" ", 2)
    row = json.loads(rest)
    row["urlkey"] = key
    row["warc_ts"] = ts
    return row


def zipnum_write(cdx_ds, out_dir: str, lines_per_block: int = 3000,
                 prefix: str = "cdx") -> pa.Table:
    """Sorted CDX Dataset -> zipnum part files + cluster summary table
    (first_key, first_ts, filename, offset, length, n_lines), sorted by
    (first_key, first_ts). The summary IS the in-memory index; persist it
    wherever the deployment keeps manifests (it is a plain Arrow table).

    lines_per_block trades summary size against per-lookup scan cost;
    Common Crawl ships 3000. Each part file holds one input block's
    members, so part sizes follow the sort's range partitioning."""
    from ..functions.hashing import fnv1a64

    os.makedirs(out_dir, exist_ok=True)

    def _pack(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "first_key": pa.array([], pa.string()),
            "first_ts": pa.array([], pa.string()),
            "filename": pa.array([], pa.string()),
            "offset": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        rows = batch.to_pylist()
        members, meta = [], []
        for i in range(0, len(rows), lines_per_block):
            chunk = rows[i:i + lines_per_block]
            blob = gzip.compress(b"".join(_cdxj_line(r) for r in chunk),
                                 mtime=0)
            members.append(blob)
            meta.append((chunk[0]["urlkey"], chunk[0]["warc_ts"],
                         len(blob), len(chunk)))
        name = (f"{prefix}-{fnv1a64(rows[0]['urlkey']):016x}"
                f"-{len(rows)}.gz")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for blob in members:
                f.write(blob)
        os.replace(tmp, path)
        offs, off = [], 0
        for _, _, ln, _ in meta:
            offs.append(off)
            off += ln
        return pa.table({
            "first_key": pa.array([m[0] for m in meta], pa.string()),
            "first_ts": pa.array([m[1] for m in meta], pa.string()),
            "filename": pa.array([name] * len(meta), pa.string()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array([m[2] for m in meta], pa.int64()),
            "n_lines": pa.array([m[3] for m in meta], pa.int64()),
        })

    parts = cdx_ds.map_batches(_pack, batch_format="pyarrow",
                               batch_size=None).take_all()
    summary = pa.Table.from_pylist(parts) if parts else pa.table({
        "first_key": pa.array([], pa.string()),
        "first_ts": pa.array([], pa.string()),
        "filename": pa.array([], pa.string()),
        "offset": pa.array([], pa.int64()),
        "length": pa.array([], pa.int64()),
        "n_lines": pa.array([], pa.int64())})
    import pyarrow.compute as pc

    order = pc.sort_indices(summary, sort_keys=[("first_key", "ascending"),
                                                ("first_ts", "ascending")])
    return summary.take(order)


def zipnum_lookup(summary: pa.Table, out_dir: str, urlkey: str) -> list[dict]:
    """All CDX rows for one urlkey: binary search the summary, ranged-read
    the candidate zipnum block(s), scan <= lines_per_block lines each.
    A key's rows can span consecutive blocks; scanning continues while a
    following block's first_key is <= the key."""
    import bisect

    keys = summary["first_key"].to_pylist()
    if not keys:
        return []
    # leftmost block that can hold the key: the block BEFORE the first
    # block whose first_key >= urlkey (its tail can reach the key), then
    # scan forward while first_key <= urlkey — duplicate first_keys mean
    # a hot key's rows can span many consecutive blocks
    i = max(0, bisect.bisect_left(keys, urlkey) - 1)
    out: list[dict] = []
    while i < len(keys):
        if keys[i] > urlkey:
            break
        fn = summary["filename"][i].as_py()
        off = summary["offset"][i].as_py()
        ln = summary["length"][i].as_py()
        with open(os.path.join(out_dir, fn), "rb") as f:
            f.seek(off)
            blob = f.read(ln)
        for line in gzip.decompress(blob).splitlines(keepends=True):
            row = _parse_cdxj(line)
            if row["urlkey"] == urlkey:
                out.append(row)
            elif row["urlkey"] > urlkey:
                return out  # sorted: nothing after can match
        i += 1
    return out


def merge_cdx(cdx_datasets: list) -> "object":
    """Multi-crawl CDX: union the per-crawl indexes and re-sort by
    (urlkey, warc_ts) — ONE wide op over rows that are ~0.1% of archive
    bytes (the CDX merge is how Common Crawl's index absorbs a new
    snapshot; the zipnum layout is then rebuilt from the merged order).
    Captures of one url across crawls become adjacent, newest last."""
    ds = cdx_datasets[0]
    if len(cdx_datasets) > 1:
        ds = ds.union(*cdx_datasets[1:])
    return ds.sort(["urlkey", "warc_ts"])


def zipnum_lookup_latest(summary: pa.Table, out_dir: str,
                         urlkey: str) -> dict | None:
    """Wayback-style consumer: the NEWEST capture of a url — max warc_ts,
    ties broken toward a `response` record over a `revisit` (both carry
    the same payload by the digest contract, but the response resolves
    without a second hop)."""
    rows = zipnum_lookup(summary, out_dir, urlkey)
    if not rows:
        return None
    return max(rows, key=lambda r: (r["warc_ts"],
                                    r.get("record_type") == "response"))
