"""Sequence packing: assign every document a span in the concatenated token
stream and emit its overlap with fixed-length training windows.

The core LLM-training-data op: docs (in doc_id order, one separator token
appended per doc — the EOS a real pretokenizer inserts) are concatenated
into one global token stream, which is cut into seq_len-token windows;
each output row says how many of doc d's tokens land in window c
(`tok_in_chunk`) and where the window's copy starts (`start_in_chunk`).

Distributed shape (no driver-side iteration, ONE shuffle):

  pass 1  map_batches: per-doc BPE-ish token counts + bucket = doc_id //
          bucket_size  -> materialized counts table (3 int columns — the
          only thing that flows twice; text is read once).
  pass 2  per-batch partial per-bucket sums -> tiny driver cumsum over
          buckets -> (bucket, base_offset) arrays broadcast via ray.put.
  pass 3  groupby(bucket).map_groups: sort the bucket's docs by doc_id,
          intra-bucket cumsum + broadcast base = exact global offsets,
          vectorized np.repeat expansion into chunk-overlap rows.

Scale: bucket_size bounds both the group size (pass 3) and the driver-side
cumsum (n_docs / bucket_size entries — pick bucket_size ~ sqrt(n) and the
base table stays tiny at any corpus size; a 10^12-doc corpus with
bucket_size 2^20 has a 1e6-entry base table). Buckets are contiguous
doc_id ranges, so the single groupby shuffle is skew-free by construction.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sources.documents import read_parquet_clean
from .simple_text import BPE_ISH_PATTERN

SQL: dict[str, str] = {}

SEP_TOKENS = 1  # per-doc separator (EOS) included in every doc's span
SEQ_LEN = 512   # window length; interpolated into BOTH oracle SQL strings

_BPE_RE = None


def _bucket_bases(counts: ray.data.Dataset):
    """Per-bucket base offsets from the counts table: per-batch partial
    sums -> tiny driver cumsum -> (sorted buckets, bases) in plasma.
    Returns None when the corpus is empty. Shared by P1 and P2 so their
    offsets agree by construction."""
    partials = counts.map_batches(
        _bucket_partials, batch_format="pyarrow").take_all()
    if not partials:
        return None
    pb = np.array([p["bucket"] for p in partials], dtype=np.int64)
    pt = np.array([p["total"] for p in partials], dtype=np.int64)
    buckets_sorted = np.unique(pb)
    totals = np.zeros(buckets_sorted.size, dtype=np.int64)
    np.add.at(totals, np.searchsorted(buckets_sorted, pb), pt)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    return ray.put((buckets_sorted, bases))


def _counts_batch(batch: pa.Table, bucket_size: int) -> pa.Table:
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(BPE_ISH_PATTERN)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.fromiter(
        (len(_BPE_RE.findall(t)) for t in batch["text"].to_pylist()),
        dtype=np.int64, count=len(ids),
    ) + SEP_TOKENS
    return pa.table({
        "doc_id": pa.array(ids),
        "n": pa.array(n),
        "bucket": pa.array(ids // bucket_size),
    })


def _bucket_partials(batch: pa.Table) -> pa.Table:
    b = batch["bucket"].to_numpy(zero_copy_only=False)
    n = batch["n"].to_numpy(zero_copy_only=False)
    ub, inv = np.unique(b, return_inverse=True)
    tot = np.zeros(ub.size, dtype=np.int64)
    np.add.at(tot, inv, n)
    return pa.table({"bucket": pa.array(ub), "total": pa.array(tot)})


def _emit_chunks(group: pa.Table, bases_ref, seq_len: int) -> pa.Table:
    buckets_sorted, bases = ray.get(bases_ref)  # plasma-cached per worker
    b = int(group["bucket"][0].as_py())
    base = int(bases[np.searchsorted(buckets_sorted, b)])
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    n = group["n"].to_numpy(zero_copy_only=False)
    o = np.argsort(ids)
    ids, n = ids[o], n[o]
    end = np.cumsum(n) + base
    start = end - n
    first = start // seq_len
    last = (end - 1) // seq_len
    cnt = last - first + 1
    total = int(cnt.sum())
    doc_rep = np.repeat(ids, cnt)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    chunk = np.repeat(first, cnt) + offs
    lo = np.maximum(np.repeat(start, cnt), chunk * seq_len)
    hi = np.minimum(np.repeat(end, cnt), (chunk + 1) * seq_len)
    return pa.table({
        "doc_id": pa.array(doc_rep, pa.int64()),
        "chunk_id": pa.array(chunk, pa.int64()),
        "tok_in_chunk": pa.array(hi - lo, pa.int64()),
        "start_in_chunk": pa.array(lo - chunk * seq_len, pa.int64()),
    })


def pack_sequences(sf_dir: str, seq_len: int = SEQ_LEN,
                   bucket_size: int = 4096) -> ray.data.Dataset:
    """P1 -> (doc_id, chunk_id, tok_in_chunk, start_in_chunk), one row per
    (document, window) overlap. See module docstring for the plan shape."""
    counts = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        functools.partial(_counts_batch, bucket_size=bucket_size),
        batch_format="pyarrow", batch_size=4096,
    ).materialize()  # 3 int columns; read text exactly once

    bases_ref = _bucket_bases(counts)
    if bases_ref is None:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "tok_in_chunk": pa.array([], pa.int64()),
            "start_in_chunk": pa.array([], pa.int64()),
        }))

    return counts.groupby("bucket").map_groups(
        functools.partial(_emit_chunks, bases_ref=bases_ref,
                          seq_len=seq_len),
        batch_format="pyarrow",
    )


SQL["p1_pack_sequences"] = f"""
WITH tc AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
         + {SEP_TOKENS} AS n
  FROM documents
),
sp AS (
  SELECT doc_id, n,
         COALESCE(SUM(n) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM tc
),
x AS (
  SELECT doc_id, CAST(s AS BIGINT) AS s, CAST(s + n AS BIGINT) AS e,
         CAST(s // {SEQ_LEN} AS BIGINT) AS first_c,
         CAST((s + n - 1) // {SEQ_LEN} AS BIGINT) AS last_c
  FROM sp
),
u AS (
  SELECT doc_id, s, e,
         unnest(range(first_c, last_c + 1)) AS chunk_id
  FROM x
)
SELECT doc_id, chunk_id,
       CAST(least(e, (chunk_id + 1) * {SEQ_LEN})
            - greatest(s, chunk_id * {SEQ_LEN}) AS BIGINT) AS tok_in_chunk,
       CAST(greatest(s, chunk_id * {SEQ_LEN})
            - chunk_id * {SEQ_LEN} AS BIGINT) AS start_in_chunk
FROM u
"""


# --------------------------------------------- P2: materialized token stream

def _tok_batch(batch: pa.Table, bucket_size: int) -> pa.Table:
    """Per-doc token LISTS (+ trailing separator) with the same regex and
    doc order as the P1 counts pass — the payload side of the pack."""
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(BPE_ISH_PATTERN)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = [_BPE_RE.findall(t) + [""] for t in batch["text"].to_pylist()]
    return pa.table({
        "doc_id": pa.array(ids),
        "bucket": pa.array(ids // bucket_size),
        "toks": pa.array(toks, pa.list_(pa.string())),
    })


def _md5_hash32(tokens: np.ndarray) -> np.ndarray:
    """('0x' || md5(tok)[:8])::BIGINT — the oracle's hash, md5'd once per
    DISTINCT token (vocab-sized work, not stream-sized)."""
    from ..functions.hashing import md5_prefix_int_of_strings

    uniq, inv = np.unique(tokens, return_inverse=True)
    return md5_prefix_int_of_strings(uniq.tolist())[inv]


def _emit_tokens(group: pa.Table, bases_ref, seq_len: int) -> pa.Table:
    buckets_sorted, bases = ray.get(bases_ref)
    b = int(group["bucket"][0].as_py())
    base = int(bases[np.searchsorted(buckets_sorted, b)])
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    toks_col = group["toks"].combine_chunks() if isinstance(
        group["toks"], pa.ChunkedArray) else group["toks"]
    toks_py = toks_col.to_pylist()
    toks_py = [toks_py[i] for i in order]
    n = np.array([len(t) for t in toks_py], dtype=np.int64)
    end = np.cumsum(n) + base
    start = end - n
    total = int(n.sum())
    if total == 0:
        return pa.table({"chunk_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "tok_hash": pa.array([], pa.int64())})
    flat = np.array([t for ts in toks_py for t in ts], dtype=object)
    intra = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
    gpos = np.repeat(start, n) + intra
    return pa.table({
        "chunk_id": pa.array(gpos // seq_len, pa.int64()),
        "pos": pa.array(gpos % seq_len, pa.int64()),
        "tok_hash": pa.array(_md5_hash32(flat), pa.int64()),
    })


def pack_tokens(sf_dir: str, seq_len: int = SEQ_LEN,
                bucket_size: int = 4096) -> ray.data.Dataset:
    """P2 -> (chunk_id, pos, tok_hash): the materialized training stream —
    every token's placement in its fixed-length window, as scalar rows the
    oracle can rebuild cell-by-cell. Consistent with P1 by construction
    (same regex, same separator, same doc_id order, same offsets).

    Scale shape: the text is read twice (once for the tiny counts/bases
    pass — 3 int columns — and once for the payload pass); the payload
    moves through exactly ONE skew-free groupby(bucket) — the unavoidable
    shuffle of packing — and token hashing is per-distinct-token, not
    per-occurrence. Nothing list-typed is ever materialized outside the
    shuffle."""
    counts = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        functools.partial(_counts_batch, bucket_size=bucket_size),
        batch_format="pyarrow", batch_size=4096,
    )
    bases_ref = _bucket_bases(counts)
    if bases_ref is None:
        return ray.data.from_arrow(pa.table({
            "chunk_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "tok_hash": pa.array([], pa.int64())}))

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        functools.partial(_tok_batch, bucket_size=bucket_size),
        batch_format="pyarrow", batch_size=2048,
    ).groupby("bucket").map_groups(
        functools.partial(_emit_tokens, bases_ref=bases_ref,
                          seq_len=seq_len),
        batch_format="pyarrow",
    )


SQL["p2_pack_tokens"] = f"""
WITH tc AS (
  SELECT doc_id,
         list_append(regexp_extract_all(text, '{BPE_ISH_PATTERN}'), '')
             AS toks
  FROM documents
),
sp AS (
  SELECT doc_id, toks,
         COALESCE(SUM(len(toks)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM tc
),
u AS (
  SELECT s, unnest(toks) AS tok,
         unnest(range(0, len(toks))) AS i
  FROM sp
)
SELECT CAST((s + i) // {SEQ_LEN} AS BIGINT) AS chunk_id,
       CAST((s + i) % {SEQ_LEN} AS BIGINT) AS pos,
       CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS tok_hash
FROM u
"""
