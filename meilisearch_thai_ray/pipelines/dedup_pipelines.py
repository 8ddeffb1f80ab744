"""Near-duplicate detection pipelines (rows-only oracle: not SQL-expressible).

minhash_pairs: documents -> MinHash band rows (actor pool) -> groupby(band,
band_hash) -> candidate pairs -> cross-band pair dedup -> DISTRIBUTED exact
n-gram Jaccard verification (map_batches actor pool; each task fetches only
its batch's texts via a filtered read and caches shingle sets per actor).
The driver only sees verified near-dup pairs.

simhash_sigs: per-doc 64-bit SimHash + 16-bit bands for bucketing.

embedding_neardup_pairs: random-hyperplane LSH bucket groupby -> capped
within-bucket exact cosine verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.resources import block_count, pool_cap
from ..sources.documents import read_parquet_clean
from ..stages.dedup import (
    BAND_PRESETS,
    JaccardVerify,
    MinHasher,
    SimHasher,
    block_boundary_members,
    block_candidate_pairs,
    pairs_from_members,
)


def _documents(sf_dir: str):
    import os

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _consecutive_dedup(batch: pa.Table) -> pa.Table:
    """Drop rows equal to their in-batch predecessor on (a, b). Applied to
    the (a, b)-sorted candidate stream, where duplicates are adjacent: this
    removes all duplicates except the (rare) ones straddling a block
    boundary — those are verified twice (idempotent) and collapsed by the
    final tiny dedup of the verified output."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    if a.size == 0:
        return batch
    keep = np.empty(a.size, dtype=bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return batch.filter(pa.array(keep))


def minhash_pairs(sf_dir: str, threshold: float = 0.6,
                  max_verify: int = 100_000, preset: str = "strict"):
    """-> (a, b, jaccard) verified near-dup pairs over the documents table
    (see minhash_pairs_ds for the pipeline shape)."""
    import os

    return minhash_pairs_ds(
        _documents(sf_dir), os.path.join(sf_dir, "documents.parquet"),
        threshold=threshold, max_verify=max_verify, preset=preset)


def minhash_pairs_ds(ds, docs_path: str, threshold: float = 0.6,
                     max_verify: int = 100_000, preset: str = "strict"):
    """-> (a, b, jaccard) verified near-dup pairs, sorted by (a, b), over
    any (doc_id, text) Dataset; docs_path must serve the same doc_ids for
    the verify stage's filtered text reads (curate.py stages its survivor
    set to parquet for exactly this — at 100 TB that intermediate lives on
    shared storage anyway).

    Fully distributed — the driver only ever sees VERIFIED near-dup pairs
    (tiny by definition):

      band rows (MinHasher actor pool)
        -> ONE sort by (band, band_hash)      [the only corpus-sized shuffle]
        -> per-block vectorized bucket pairs  [interior runs; first/last run
           + tiny boundary-bucket merge        of each block pairs on the
                                               driver — <= 2 buckets/block]
        -> ONE sort by (a, b) + per-batch consecutive dedup
                                              [cross-band pair dedup: a
                                               colliding pair appears in up
                                               to `bands` buckets]
        -> map_batches(JaccardVerify)         [per-task filtered text read +
                                               per-actor shingle cache]
        -> tiny final dedup of the verified set

    Both sort-then-scan stages replace groupby shuffles that paid a Python
    map_groups call per GROUP: LSH makes nearly one bucket per band row, so
    the bucket groupby's dispatch cost scaled with the corpus (measured 3x
    the whole pipeline at sf0.1) while only multi-member buckets do work.
    After the sort, buckets are contiguous, so a per-block vectorized run
    scan finds the multi-member ones at numpy speed; the pair dedup is the
    same trick on (a, b). The at-most-(blocks-1) duplicates straddling pair
    blocks are verified twice (JaccardVerify is pure, shingles cached) and
    collapsed in the final driver-side dedup of the tiny verified output.

    max_verify bounds the exact-verification stage; when the candidate rows
    exceed it the drop is REPORTED (never silent) and the first max_verify
    candidate rows in (a, b) order are verified — a corpus that floods LSH
    at 8 rows/band is mostly duplicates and wants a higher band threshold.

    `preset` picks the LSH operating point (stages/dedup.BAND_PRESETS):
    'strict' (8 rows/band, S-curve midpoint ~0.77) recalls J>=0.9 dups with
    few false candidates; 'near' (4 rows/band, midpoint ~0.5) recalls the
    J~0.85 near-dups LLM curation targets (recall curve pytest-measured)."""
    num_perm, bands = BAND_PRESETS[preset]
    band_rows = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        concurrency=(1, pool_cap(8)),
    )
    cand = _band_candidates(band_rows)
    return _verify_pairs(cand, docs_path, threshold, max_verify)


def _band_candidates(band_rows) -> "ray.data.Dataset":
    """(band, band_hash, doc_id) rows -> deduped candidate (a, b) Dataset,
    sorted by (a, b). See minhash_pairs_ds for the stage-by-stage story."""
    # sorted band rows are reused by the interior-pair pass and the (tiny)
    # boundary-member pass — materialize once
    sorted_rows = band_rows.sort(["band", "band_hash"]).materialize()
    interior = sorted_rows.map_batches(
        block_candidate_pairs, batch_format="pyarrow", batch_size=None)
    member_tables = ray.get(
        sorted_rows.map_batches(block_boundary_members,
                                batch_format="pyarrow", batch_size=None)
        .to_arrow_refs())  # <= 2 buckets per block: tiny by construction
    boundary_pairs = pairs_from_members(
        pa.concat_tables(member_tables) if member_tables
        else pa.table({"band": pa.array([], pa.int32()),
                       "band_hash": pa.array([], pa.int64()),
                       "doc_id": pa.array([], pa.int64())}))
    return (
        interior.union(ray.data.from_arrow(boundary_pairs))
        .sort(["a", "b"])
        .map_batches(_consecutive_dedup, batch_format="pyarrow")
        .materialize()
    )


_VERIFY_BATCH = 2048


def _cluster_for_verify(cand, n_cand: int):
    """Sort candidate pairs so each verify batch covers a NARROW doc_id
    window on BOTH sides: a-axis super-cells of width span/C (C chosen so
    one batch spans ~one cell), b sorted within a cell. Each
    JaccardVerify batch's filtered parquet read then prunes to ~2/C of the
    docs table's row groups (via the min/max range conjunction in
    JaccardVerify._shingle_arrays) instead of stats-scanning all of it.
    Pure ordering — the pair SET is unchanged (output is re-sorted by the
    driver), and tiny candidate sets skip the extra exchange."""
    if n_cand <= _VERIFY_BATCH * 2:
        return cand
    import math

    lo = hi = None
    for t in ray.get(cand.to_arrow_refs()):  # cand is materialized + small
        if t.num_rows == 0:
            continue
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        tlo, thi = int(a.min()), int(b.max())
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if lo is None or hi <= lo:
        return cand
    n_cells = max(2, math.isqrt(n_cand // _VERIFY_BATCH))
    width = max(1, (hi - lo + 1) // n_cells)

    def _add_cell(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array(((a - lo) // width).astype(np.int64)))

    return cand.map_batches(_add_cell, batch_format="pyarrow") \
        .sort(["cell", "b", "a"])


def _verify_pairs(cand, docs_path, threshold: float,
                  max_verify: int) -> pa.Table:
    """Candidate (a, b) Dataset -> verified (a, b, jaccard) table via the
    distributed JaccardVerify actor pool. docs_path may be one path or a
    list of paths (pyarrow.dataset accepts both) — the incremental pipeline
    passes [corpus, new_crawl]."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    # candidate pairs are SMALL by construction (per-bucket caps bound
    # them), so materializing here is cheap — and without it the count()
    # below would execute the whole sketch+candidate pipeline once and the
    # verify map would re-execute it from scratch (measured: ~2x the
    # pipeline wall time at sf0.1)
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty
    if n_cand > max_verify:
        print(
            f"[minhash_pairs] candidate set {n_cand} exceeds max_verify="
            f"{max_verify}; verifying the first {max_verify} by (a, b) (raise "
            "bands/rows per band for a self-similar corpus)"
        )
        # the dedup stage's OUTPUT block order is not guaranteed (Ray does
        # not preserve order across map tasks), so the deterministic
        # "first max_verify by (a, b)" contract needs a re-sort — paid only
        # in this degenerate over-cap path
        cand = cand.sort(["a", "b"]).limit(max_verify)
    cand = _cluster_for_verify(cand, n_cand)
    verified = cand.map_batches(
        JaccardVerify,
        fn_constructor_kwargs={"docs_path": docs_path, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, pool_cap(8)),
    )
    rows = verified.take_all()  # verified near-dups only: tiny
    if not rows:
        return empty
    t = pa.Table.from_pylist(rows)
    order = np.lexsort((t["b"].to_numpy(), t["a"].to_numpy()))
    t = t.take(pa.array(order)).select(["a", "b", "jaccard"])
    return _consecutive_dedup(t)  # collapse boundary-straddle re-verifies


def simhash_sigs(sf_dir: str):
    """-> (doc_id, simhash, band0..band3) per document."""
    return _documents(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=2
    )


PLANT_ID_BASE = 1_000_000_000  # planted near-dup vec_ids live above this
PLANT_EVERY = 97  # one planted near-dup per 97 source vectors


def _plant_near_dups(batch: pa.Table) -> pa.Table:
    """Deterministic planted-near-dup fixture: for every vec_id divisible by
    PLANT_EVERY, append a copy with vec_id + PLANT_ID_BASE and the SAME
    embedding (cosine 1.0). The driver's synthetic embeddings have no natural
    near-dups, so without planting the operator's output is always empty —
    the planted rows make `d2_embed_neardup` a self-demonstrating fixture
    (every output pair with b >= PLANT_ID_BASE is planted)."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(ids % PLANT_EVERY == 0)
    if sel.size == 0:
        return batch
    clone = batch.take(pa.array(sel))
    clone = clone.set_column(
        clone.schema.get_field_index("vec_id"),
        "vec_id",
        pa.array(ids[sel] + PLANT_ID_BASE, pa.int64()),
    )
    return pa.concat_tables([batch, clone])


def bucket_cosine_pairs(group: pa.Table, threshold: float,
                        max_bucket: int = 500) -> pa.Table:
    """map_groups body for the LSH-bucket groupby: exact cosine over one
    bucket's vectors, emitting (a, b, cos >= threshold) pairs with a < b by
    vec_id order. Buckets larger than max_bucket are CAPPED to the first
    max_bucket members by vec_id and the cap is recorded in the output
    (`capped` column) — a degenerate bucket (mass-identical embeddings or
    nbits too small) would otherwise produce n^2/2 pairs in one task."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "capped": pa.array([], pa.bool_())})
    ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
    if ids.size < 2:
        return empty
    order = np.argsort(ids)
    capped = ids.size > max_bucket
    if capped:
        print(
            f"[embedding_neardup] bucket of {ids.size} vectors capped to "
            f"{max_bucket} (raise nbits for finer buckets)"
        )
        order = order[:max_bucket]
    mat = np.asarray(group["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(ids.size, -1)[order]
    ids = ids[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    iu, ju = np.triu_indices(ids.size, k=1)
    hit = sims[iu, ju] >= threshold
    if not hit.any():
        return empty
    iu, ju = iu[hit], ju[hit]
    return pa.table({
        "a": pa.array(ids[iu], pa.int64()),
        "b": pa.array(ids[ju], pa.int64()),
        "cos": pa.array(np.round(sims[iu, ju], 6), pa.float64()),
        "capped": pa.array(np.full(iu.size, capped), pa.bool_()),
    })


def _bucket_runs(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of contiguous bucket runs in a bucket-sorted block."""
    b = batch["bucket"].to_numpy(zero_copy_only=False)
    if b.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(b[1:] != b[:-1]) + 1
    return (np.concatenate([[0], change]).astype(np.int64),
            np.concatenate([change, [b.size]]).astype(np.int64))


def _block_cosine_pairs(batch: pa.Table, *, threshold,
                        max_bucket) -> pa.Table:
    """Per-BLOCK exact cosine over the bucket-sorted vector stream's
    INTERIOR runs (first/last may continue in neighboring blocks and are
    owned by the boundary pass — same split as the MinHash band path's
    block_candidate_pairs). Only multi-member runs do any work; singleton
    buckets (the vast majority) cost one mask entry, not a Python call."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "capped": pa.array([], pa.bool_())})
    starts, ends = _bucket_runs(batch)
    if starts.size <= 2:
        return empty
    out = [empty]
    for s, e in zip(starts[1:-1], ends[1:-1]):
        if e - s >= 2:
            out.append(bucket_cosine_pairs(
                batch.slice(s, e - s), threshold, max_bucket))
    return pa.concat_tables(out)


def _block_boundary_vecs(batch: pa.Table) -> pa.Table:
    """The first and last bucket runs of a sorted block — members (with
    embeddings) of the <= 2 buckets the interior pass skipped."""
    starts, ends = _bucket_runs(batch)
    if starts.size == 0:
        return batch.select(["bucket", "vec_id", "embedding"])
    take = np.concatenate([
        np.arange(starts[0], ends[0]),
        np.arange(starts[-1], ends[-1]) if starts.size > 1
        else np.empty(0, np.int64),
    ])
    return batch.select(["bucket", "vec_id", "embedding"]).take(
        pa.array(take.astype(np.int64)))


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.9,
                            nbits: int = 10, plant: bool = False):
    """Embedding-cosine near-dup: random-hyperplane LSH buckets (one pass)
    -> capped within-bucket exact cosine verification -> (a, b, cos) pairs.

    ONE sort(bucket, vec_id) is the only exchange; interior bucket runs
    are verified vectorized per block, the <= 2 boundary runs per block
    merge on the driver (bucket_cosine_pairs is the shared kernel for
    both passes). This replaces a groupby(bucket).map_groups that paid a
    Python dispatch per BUCKET — nearly one per vector at sane nbits.
    Per-bucket work stays bounded by max_bucket (capped buckets are
    reported, never silent). plant defaults to FALSE — the production
    operator must never fabricate pairs; the driver's d2_embed_neardup
    entry opts in explicitly (see _plant_near_dups) because its synthetic
    embeddings have no natural near-dups to find."""
    import os

    import pyarrow.dataset as pads

    from ..stages.ann import LshBucketAssign

    path = os.path.join(sf_dir, "embeddings.parquet")
    dim = len(pads.dataset(path).head(1, columns=["embedding"])["embedding"][0])
    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])
    if plant:
        ds = ds.map_batches(_plant_near_dups, batch_format="pyarrow",
                            batch_size=4096)
    bucketed = ds.map_batches(
        LshBucketAssign,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=2,
    ).sort(["bucket", "vec_id"]).materialize()
    interior = bucketed.map_batches(
        _block_cosine_pairs, fn_kwargs={"threshold": threshold,
                                        "max_bucket": 500},
        batch_format="pyarrow", batch_size=None)
    boundary_members = pa.concat_tables(ray.get(
        bucketed.map_batches(_block_boundary_vecs, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs()))
    boundary = _boundary_cosine_pairs(boundary_members, threshold)
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "capped": pa.array([], pa.bool_())})
    tables = [x for x in ray.get(interior.to_arrow_refs()) if x.num_rows]
    if boundary.num_rows:
        tables.append(boundary)
    if not tables:
        return empty
    t = pa.concat_tables(tables)  # verified pairs only: tiny
    order = np.lexsort((t["b"].to_numpy(), t["a"].to_numpy()))
    return t.take(pa.array(order))


def _boundary_cosine_pairs(members: pa.Table, threshold: float) -> pa.Table:
    """Driver-side verification of the boundary buckets (<= 2 per block
    by construction — tiny): group member rows by bucket, run the shared
    bucket_cosine_pairs kernel per bucket."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "capped": pa.array([], pa.bool_())})
    if members.num_rows == 0:
        return empty
    b = members["bucket"].to_numpy(zero_copy_only=False)
    ids = members["vec_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, b))
    members = members.take(pa.array(order))
    starts, ends = _bucket_runs(members)
    out = [empty]
    for s, e in zip(starts, ends):
        if e - s >= 2:
            out.append(bucket_cosine_pairs(members.slice(s, e - s),
                                           threshold))
    return pa.concat_tables(out)


def lang_id(sf_dir: str):
    from ..stages.text_stats import LangId

    return _documents(sf_dir).map_batches(
        LangId, batch_format="pyarrow", batch_size=1024, concurrency=2
    )


# ---------------- exact blocked all-pairs similarity joins ----------------
# SQL-verified counterparts of the sketch pipelines above (see
# stages/similarity_join.py for the operator and its scale contract).

SQL: dict[str, str] = {}


def _collect_pairs(pairs_ds, empty_cols: dict, spill_dir: str) -> pa.Table:
    """Verified pairs only — a provably tiny set — merged and sorted on the
    driver for deterministic output. The block spill is a single-use
    intermediate (unlike the bench corpus cache): always removed, or
    repeated runs would fill /tmp with a full spilled corpus per call."""
    import shutil

    try:
        tables = [x for x in ray.get(pairs_ds.to_arrow_refs()) if x.num_rows]
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)
    if not tables:
        return pa.table(empty_cols)
    t = pa.concat_tables(tables)
    order = np.lexsort((t["b"].to_numpy(), t["a"].to_numpy()))
    return t.take(pa.array(order))


def _auto_blocks(path: str, target_rows: int = 750) -> int:
    """Block count from parquet metadata (no data read): a bounded block
    size bounds each task's memory and the pair-matrix allocation; the
    ceiling follows the cluster size (functions/resources.block_count)."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    return block_count(n, target_rows)


def jaccard_pairs_ds(ds, threshold: float = 0.5, n: int = 3,
                     n_blocks: int = 4):
    """EXACT word-n-gram Jaccard pairs (a, b, jac >= threshold) over any
    (doc_id, text) Dataset — the blocked all-pairs join from
    stages/similarity_join.py, reusable as a stage inside larger pipelines
    (e.g. curate.py runs it over the quality+dedup survivor set)."""
    import tempfile

    from ..stages.similarity_join import (
        BlockPairJaccard,
        ShinglePrep,
        block_pair_items,
    )

    tmp = tempfile.mkdtemp(prefix="simjoin_jac_", dir="/tmp")
    ds.map_batches(
        ShinglePrep,
        fn_constructor_kwargs={"n": n, "n_blocks": n_blocks},
        batch_format="pyarrow", batch_size=4096, concurrency=2,
    ).write_parquet(tmp, partition_cols=["block"])
    items = block_pair_items(n_blocks)
    pairs = ray.data.from_items(items).map_batches(
        BlockPairJaccard,
        fn_constructor_kwargs={"blocks_dir": tmp, "threshold": threshold},
        batch_format="pyarrow", batch_size=1,
        # autoscaling pool: grows to the task count without reserving CPUs
        # a small test session doesn't have; cap follows the cluster
        concurrency=(1, min(pool_cap(12), len(items))),
    )
    return _collect_pairs(pairs, {
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "jac": pa.array([], pa.float64()),
    }, tmp)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        n: int = 3, n_blocks: int | None = None):
    """D3: EXACT word-n-gram Jaccard near-dup pairs over documents —
    (a, b, jac) for every pair with similarity >= threshold. No sketching,
    no recall loss: this is the exact oracle the MinHash-LSH pipeline
    approximates (subset relation asserted in tests)."""
    import os

    if n_blocks is None:
        n_blocks = _auto_blocks(os.path.join(sf_dir, "documents.parquet"))
    return jaccard_pairs_ds(_documents(sf_dir), threshold=threshold, n=n,
                            n_blocks=n_blocks)


from ..stages.similarity_join import WS_REGEX as _WS

# Shared shingle + pair subquery (word-3-gram Jaccard >= 0.5) — used verbatim
# by both the pair query and the connected-components oracle below.
_SHINGLE_CTE = rf"""w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{_WS}'), x -> x <> '') AS ws
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM w
)"""

_PAIR_BODY = """
SELECT a.doc_id AS a, b.doc_id AS b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jac
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
"""

SQL["d3_ngram_jaccard_pairs"] = f"WITH {_SHINGLE_CTE}{_PAIR_BODY}"


def connected_dups(sf_dir: str, threshold: float = 0.5, n: int = 3):
    """D8: near-dup CLUSTERS — exact word-n-gram Jaccard pairs become edges,
    distributed small-star/large-star connected components labels every
    involved doc with its cluster's minimum doc_id. This is the cluster-
    canonical form real curation pipelines apply (keep one doc per component,
    not per pair — pairwise drops over-delete on chains A~B~C where A!~C)."""
    from ..stages.graph import connected_components

    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold, n=n)
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    edges = ray.data.from_arrow(
        pairs.select(["a", "b"]).rename_columns(["u", "v"]))
    out = connected_components(edges).to_arrow_refs()
    t = pa.concat_tables(ray.get(out))  # <= one row per involved doc: tiny here
    order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))


SQL["d8_connected_dups"] = f"""
WITH RECURSIVE {_SHINGLE_CTE},
pairs AS ({_PAIR_BODY}),
e AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
walk(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT e.u, w2.comp FROM e JOIN walk w2 ON e.v = w2.u
)
SELECT u AS doc_id, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY u
"""


class _EmbedPrep:
    """(vec_id, embedding) -> (doc_id, v list<float64>, block)."""

    def __init__(self, n_blocks: int):
        self.n_blocks = n_blocks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array(
                [], pa.list_(pa.float64()))
        return pa.table({
            "doc_id": pa.array(ids),
            "v": col.cast(pa.list_(pa.float64())),
            "block": pa.array((ids % self.n_blocks).astype(np.int32)),
        })


def embed_cosine_pairs(sf_dir: str, threshold: float = 0.42,
                       n_blocks: int | None = None):
    """D3: EXACT embedding-cosine pairs >= threshold — the zero-recall-loss
    counterpart of embedding_neardup_pairs (whose LSH buckets can miss
    pairs). Threshold compares the 6-dp-rounded cosine, same as the oracle."""
    import os
    import tempfile

    from ..stages.similarity_join import BlockPairCosine, block_pair_items

    if n_blocks is None:
        n_blocks = _auto_blocks(os.path.join(sf_dir, "embeddings.parquet"),
                                target_rows=4096)
    tmp = tempfile.mkdtemp(prefix="simjoin_cos_", dir="/tmp")
    read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).map_batches(
        _EmbedPrep, fn_constructor_kwargs={"n_blocks": n_blocks},
        batch_format="pyarrow", batch_size=4096, concurrency=2,
    ).write_parquet(tmp, partition_cols=["block"])
    items = block_pair_items(n_blocks)
    pairs = ray.data.from_items(items).map_batches(
        BlockPairCosine,
        fn_constructor_kwargs={"blocks_dir": tmp, "threshold": threshold},
        batch_format="pyarrow", batch_size=1,
        concurrency=(1, min(pool_cap(12), len(items))),
    )
    return _collect_pairs(pairs, {
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "cos": pa.array([], pa.float64()),
    }, tmp)


def knn_graph(sf_dir: str, k: int = 10, n_blocks: int | None = None):
    """D15: exact k-NN graph over the embedding table (each vector's top-k
    cosine neighbors) — the input graph for SemDeDup-style semantic dedup,
    graph-based curation, and kNN-classifier label propagation.

    Scale shape: blocked matmul — vectors spill once to P hive blocks;
    P^2 tasks each emit block i's PARTIAL top-k vs block j (k rows per
    query row per task, per-actor block cache), so no task ever holds the
    n x n matrix. The global merge is ONE sort by (vec_id, cos desc,
    neighbor) + per-block rank run-scan; rows per vec are bounded by
    P*k, edge runs by 2*P*k per block, and the result STAYS a Dataset
    (n*k rows scale with the corpus). Inherently O(n^2/P^2)-per-task like
    the exact similarity join — the corpus-scale recall-lossy swap is the
    IVF/LSH ANN family."""
    import os
    import shutil
    import tempfile

    from ..stages.similarity_join import KnnBlockPair, knn_pair_items

    if n_blocks is None:
        n_blocks = _auto_blocks(os.path.join(sf_dir, "embeddings.parquet"),
                                target_rows=4096)
    tmp = tempfile.mkdtemp(prefix="knn_graph_", dir="/tmp")
    try:
        read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        ).map_batches(
            _EmbedPrep, fn_constructor_kwargs={"n_blocks": n_blocks},
            batch_format="pyarrow", batch_size=4096, concurrency=2,
        ).write_parquet(tmp, partition_cols=["block"])
        items = knn_pair_items(n_blocks)
        cand = ray.data.from_items(items).map_batches(
            KnnBlockPair,
            fn_constructor_kwargs={"blocks_dir": tmp, "k": k},
            batch_format="pyarrow", batch_size=1,
            concurrency=(1, min(pool_cap(12), len(items))),
        )

        def block_rank(batch: pa.Table) -> pa.Table:
            empty = pa.table({
                "partial": pa.array([], pa.bool_()),
                "vec_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int32())})
            if batch.num_rows == 0:
                return empty
            v = batch["vec_id"].to_numpy(zero_copy_only=False)
            new = np.r_[True, v[1:] != v[:-1]]
            rid = np.cumsum(new) - 1
            pos = np.arange(v.size) - np.flatnonzero(new)[rid]
            edge = (rid == 0) | (rid == rid[-1])
            keep = ~edge & (pos < k)
            kept = batch.filter(pa.array(keep))
            inter = pa.table({
                "partial": pa.array(np.zeros(kept.num_rows, bool)),
                "vec_id": kept["vec_id"],
                "neighbor_id": kept["neighbor_id"],
                "cos": kept["cos"],
                "rank": pa.array((pos[keep] + 1).astype(np.int32))})
            raw = batch.filter(pa.array(edge & (pos < k)))
            rawt = pa.table({
                "partial": pa.array(np.ones(raw.num_rows, bool)),
                "vec_id": raw["vec_id"],
                "neighbor_id": raw["neighbor_id"],
                "cos": raw["cos"],
                "rank": pa.array(np.zeros(raw.num_rows, np.int32))})
            return pa.concat_tables([inter, rawt])

        seg = (cand.sort(["vec_id", "cos", "neighbor_id"],
                         descending=[False, True, False])
               .map_batches(block_rank, batch_format="pyarrow",
                            batch_size=None).materialize())
        parts = [seg.filter(expr="partial == False")
                 .select_columns(["vec_id", "rank", "neighbor_id", "cos"])]
        raws = [b for b in seg.filter(expr="partial == True")
                .iter_batches(batch_format="pyarrow")]
        if raws:  # <= 2 runs x P*k rows per block: bounded driver merge
            bt = pa.concat_tables(raws)
            v = bt["vec_id"].to_numpy(zero_copy_only=False)
            nb = bt["neighbor_id"].to_numpy(zero_copy_only=False)
            c = bt["cos"].to_numpy(zero_copy_only=False)
            order = np.lexsort((nb, -c, v))
            v = v[order]
            new = np.r_[True, v[1:] != v[:-1]]
            rid = np.cumsum(new) - 1
            pos = np.arange(v.size) - np.flatnonzero(new)[rid]
            sel = pos < k
            parts.append(ray.data.from_arrow(pa.table({
                "vec_id": pa.array(v[sel]),
                "rank": pa.array((pos[sel] + 1).astype(np.int32)),
                "neighbor_id": pa.array(nb[order][sel]),
                "cos": pa.array(c[order][sel], pa.float64()),
            })))
        out = parts[0]
        for extra in parts[1:]:
            out = out.union(extra)

        def round_cos(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("cos"), "cos",
                pa.array(np.round(batch["cos"].to_numpy(
                    zero_copy_only=False), 6), pa.float64()))

        return out.map_batches(round_cos, batch_format="pyarrow",
                               batch_size=65536).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def knn_communities(sf_dir: str, k: int = 10, n_iter: int = 5,
                    n_blocks: int | None = None):
    """D16: semantic communities over the embedding k-NN graph —
    deterministic label propagation (stages/graph.py) on the knn_graph
    edges (cosine weights, negative similarities dropped, both
    orientations). The graph-clustering sibling of SemDeDup's k-means:
    no centroid count to choose, communities follow graph density.

    Scale shape: knn_graph stays a Dataset; LPA is 3 exchanges per round
    with the pagerank-style constant carry. Approximate by iteration
    count only — numpy-parity of the LPA kernel is pytest-asserted."""
    from ..stages.graph import label_propagation

    knn = knn_graph(sf_dir, k=k, n_blocks=n_blocks)

    def to_edges(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False)
        nb = batch["neighbor_id"].to_numpy(zero_copy_only=False)
        c = batch["cos"].to_numpy(zero_copy_only=False)
        keep = c > 0
        v, nb, c = v[keep], nb[keep], c[keep]
        return pa.table({
            "src": pa.array(np.concatenate([v, nb]).astype(np.int64)),
            "dst": pa.array(np.concatenate([nb, v]).astype(np.int64)),
            "w": pa.array(np.concatenate([c, c]), pa.float64()),
        })

    edges = knn.map_batches(to_edges, batch_format="pyarrow",
                            batch_size=65536)
    out = label_propagation(edges, n_iter=n_iter)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch["node"],
                         "community": batch["label"]})

    return out.map_batches(rename, batch_format="pyarrow",
                           batch_size=65536)


SQL["d3_cosine_pairs_exact"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.42
"""


# ----------------------------------------- cross-snapshot (incremental) dedup

def cross_snapshot_dup_ds(old_ds: ray.data.Dataset,
                          new_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact-content dedup of a NEW snapshot against an EXISTING corpus —
    the incremental-crawl ingest op (only docs unseen in prior snapshots
    enter the index). Both sides are hashed per batch down to (doc_id,
    content-hash, side) rows, so the ONE sort(hash) exchange carries 3
    small columns, never text; no side is broadcast (both are corpus-sized
    at 100 TB). Emits (doc_id, dup_of): each new doc whose exact text
    exists in the old snapshot, with the smallest matching old doc_id."""
    import hashlib

    def _hash_side(side: int):
        def f(batch: pa.Table) -> pa.Table:
            h = [hashlib.md5(t.encode()).hexdigest()
                 for t in batch["text"].to_pylist()]
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "h": pa.array(h, pa.string()),
                "side": pa.array(np.full(len(h), side, dtype=np.int8)),
            })
        return f

    # One sort(h, side, doc_id) replaces groupby(h).map_groups (one Python
    # dispatch per unique text). Within an h-run, old rows sort before new
    # rows and doc_ids ascend, so a run's old-minimum is its FIRST row when
    # that row is old-side; runs spanning blocks are resolved by a forward
    # prefix-min carry over the per-block boundary rows (O(blocks) driver
    # state, broadcast once) — the new rows' matching old doc can only live
    # in the same or an EARLIER block.
    _INF = 1 << 62

    def _bounds(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "tag": pa.array([], pa.string()),
            "first_h": pa.array([], pa.string()),
            "last_h": pa.array([], pa.string()),
            "first_old_min": pa.array([], pa.int64()),
            "last_old_min": pa.array([], pa.int64()),
            "n_runs": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        from ..stages.runs import new_run_mask

        mask = new_run_mask(batch, ["h"])
        starts = np.nonzero(mask)[0]
        side = batch["side"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)

        def run_old_min(s):
            return int(ids[s]) if side[s] == 0 else _INF

        tag = repr((batch["h"][0].as_py(), int(side[0]), int(ids[0])))
        return pa.table({
            "tag": pa.array([tag], pa.string()),
            "first_h": pa.array([batch["h"][0].as_py()], pa.string()),
            "last_h": pa.array([batch["h"][-1].as_py()], pa.string()),
            "first_old_min": pa.array([run_old_min(starts[0])], pa.int64()),
            "last_old_min": pa.array([run_old_min(starts[-1])], pa.int64()),
            "n_runs": pa.array([int(starts.size)], pa.int64()),
        })

    def _carries(btab: pa.Table) -> dict[str, int]:
        import ast

        rows = sorted(btab.to_pylist(),
                      key=lambda r: ast.literal_eval(r["tag"]))
        carry: dict[str, int] = {}
        acc_h, acc_min = None, _INF
        for e in rows:
            cont = e["first_h"] == acc_h
            carry[e["tag"]] = acc_min if cont else _INF
            if e["n_runs"] == 1 and cont:
                acc_min = min(acc_min, e["last_old_min"])
            else:
                acc_h, acc_min = e["last_h"], e["last_old_min"]
        return carry

    def _emit_dups(batch: pa.Table, *, carry_ref) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "dup_of": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        from ..stages.runs import fetch, new_run_mask

        carry = fetch(carry_ref)
        mask = new_run_mask(batch, ["h"])
        run_id = np.cumsum(mask) - 1
        starts = np.nonzero(mask)[0]
        side = batch["side"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        old_min = np.where(side[starts] == 0, ids[starts], _INF)
        tag = repr((batch["h"][0].as_py(), int(side[0]), int(ids[0])))
        old_min[0] = min(old_min[0], carry[tag])
        dup_of = old_min[run_id]
        keep = (side == 1) & (dup_of < _INF)
        return pa.table({
            "doc_id": pa.array(ids[keep].astype(np.int64)),
            "dup_of": pa.array(dup_of[keep].astype(np.int64)),
        })

    u = (old_ds.map_batches(_hash_side(0), batch_format="pyarrow",
                            batch_size=2048)
         .union(new_ds.map_batches(_hash_side(1), batch_format="pyarrow",
                                   batch_size=2048)))
    sorted_u = u.sort(["h", "side", "doc_id"]).materialize()
    btab = pa.concat_tables(ray.get(
        sorted_u.map_batches(_bounds, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs()))
    carry_ref = ray.put(_carries(btab))
    return sorted_u.map_batches(
        _emit_dups, fn_kwargs={"carry_ref": carry_ref},
        batch_format="pyarrow", batch_size=None)


RECRAWL_MOD = 3          # every 3rd page reappears in the new snapshot
RECRAWL_ID_BASE = 1_000_000_000  # re-crawled pages get fresh doc_ids


def cross_snapshot_dedup(sf_dir: str) -> ray.data.Dataset:
    """D10 driver entry: old snapshot = the documents table; new snapshot
    = a deterministic re-crawl (every RECRAWL_MOD-th page refetched with a
    NEW doc_id and unchanged content — the dominant real case between CC
    snapshots). The op maps every re-crawled page back to its original."""

    def _recrawl(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % RECRAWL_MOD == 0
        out = batch.filter(pa.array(keep))
        new_ids = out["doc_id"].to_numpy(
            zero_copy_only=False) + RECRAWL_ID_BASE
        return out.set_column(out.schema.get_field_index("doc_id"),
                              "doc_id", pa.array(new_ids, pa.int64()))

    old_ds = _documents(sf_dir)
    new_ds = _documents(sf_dir).map_batches(
        _recrawl, batch_format="pyarrow", batch_size=4096)
    return cross_snapshot_dup_ds(old_ds, new_ds)


SQL["d10_cross_snapshot_dedup"] = f"""
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
new AS (SELECT doc_id + {RECRAWL_ID_BASE} AS doc_id, md5(text) AS h
        FROM documents WHERE doc_id % {RECRAWL_MOD} = 0),
o AS (SELECT h, min(doc_id) AS dup_of FROM old GROUP BY h)
SELECT n.doc_id, o.dup_of FROM new n JOIN o USING (h)
"""


# ---------------------- incremental NEAR-dup vs a persisted MinHash index

def write_minhash_index(ds: ray.data.Dataset, out_dir: str,
                        preset: str = "strict") -> None:
    """Persist the corpus's MinHash-LSH band rows (band, band_hash, doc_id)
    as parquet — the sketch index an incremental crawl dedups against. At
    100 TB this is built ONCE (it is a by-product of the corpus's own
    near-dup pass) and only the new crawl is ever sketched again; the index
    is ~bands x 20 bytes per doc, ~0.1% of the text it summarizes.

    The band `preset` is part of the index's IDENTITY (band hashes from
    different presets never match) — key out_dir by it, and sketch every
    later crawl against the index with the SAME preset."""
    num_perm, bands = BAND_PRESETS[preset]
    ds.map_batches(MinHasher, batch_format="pyarrow", batch_size=1024,
                   fn_constructor_kwargs={"num_perm": num_perm,
                                          "bands": bands},
                   concurrency=(1, pool_cap(8))).write_parquet(out_dir)


def incremental_minhash_pairs(new_ds: ray.data.Dataset, index_dir: str,
                              docs_paths, new_id_min: int | None = None,
                              threshold: float = 0.6,
                              max_verify: int = 100_000,
                              preset: str = "strict",
                              new_ids: "np.ndarray | None" = None
                              ) -> pa.Table:
    """Near-dup pairs (a, b, jaccard) of a NEW crawl against an existing
    corpus via its persisted sketch index: only the new side is sketched,
    the corpus contributes pre-computed band rows read straight from
    parquet. Candidate generation is the shared _band_candidates sort-scan
    over the UNION of index rows and new band rows; (old, old) pairs are
    excluded by ONE of two contracts, so surviving pairs are exactly
    (corpus, new) and (new, new):
      new_id_min — every new doc_id >= new_id_min > every corpus doc_id
                   (the d10 re-crawl convention; cheapest filter), or
      new_ids    — an explicit sorted id set of the new crawl (the crawl-
                   refresh path, where url-hash doc_ids carry no ordering;
                   broadcast once, searchsorted probe per batch).
    Verification reads texts from docs_paths (list: [corpus_parquet,
    new_crawl_parquet])."""
    if (new_id_min is None) == (new_ids is None):
        raise ValueError("pass exactly one of new_id_min / new_ids")
    num_perm, bands = BAND_PRESETS[preset]  # must match the index's preset
    corpus_bands = ray.data.read_parquet(index_dir)
    new_bands = new_ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        concurrency=(1, pool_cap(8)))
    cand = _band_candidates(corpus_bands.union(new_bands))

    if new_id_min is not None:
        def _touching_new(batch: pa.Table) -> pa.Table:
            b = batch["b"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(b >= new_id_min))
    else:
        ids_ref = ray.put(np.sort(np.asarray(new_ids, dtype=np.int64)))

        def _touching_new(batch: pa.Table) -> pa.Table:
            from ..stages.runs import fetch

            ids = fetch(ids_ref)
            hit = np.zeros(batch.num_rows, bool)
            for col in ("a", "b"):
                v = batch[col].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ids, v)
                pos[pos == ids.size] = 0
                hit |= ids[pos] == v
            return batch.filter(pa.array(hit))

    cand = cand.map_batches(_touching_new, batch_format="pyarrow")
    return _verify_pairs(cand, docs_paths, threshold, max_verify)


NEARCRAWL_MOD = 40  # every 40th page re-crawled with a small edit
NEARCRAWL_FRESH_OFFSET = 17  # every 40th+17 page is brand-new content


def incremental_minhash(sf_dir: str, threshold: float = 0.6) -> pa.Table:
    """D13 driver entry. Corpus = the documents table; its sketch index is
    built once and cached under /tmp keyed by the input's content identity.
    New crawl = a deterministic mix of near-dup re-crawls (every
    {NEARCRAWL_MOD}-th page, re-fetched with a trailing edit and a fresh
    doc_id) and genuinely new pages (md5-chain gibberish — no shared
    shingles). Expected output: one (orig, orig + RECRAWL_ID_BASE) pair per
    re-crawl, none for the fresh pages. Rows-only oracle (LSH is not
    SQL-expressible); pair-set correctness is pytest-verified against both
    the plant and the from-scratch minhash_pairs_ds of the union."""
    import hashlib
    import os

    from .simple_text import input_fingerprint

    docs_path = os.path.join(sf_dir, "documents.parquet")
    fp = input_fingerprint(docs_path)
    from ..stages.dedup import MINHASH_VERSION

    idx_dir = f"/tmp/meili_ray_cache/mh_index_v{MINHASH_VERSION}_{fp}"
    if not os.path.isdir(idx_dir) or not os.listdir(idx_dir):
        write_minhash_index(_documents(sf_dir), idx_dir)

    def _new_crawl(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_ids, out_txt = [], []
        for i, t in zip(ids, texts):
            if i % NEARCRAWL_MOD == 0:  # re-crawl with a small edit
                out_ids.append(int(i) + RECRAWL_ID_BASE)
                out_txt.append(t + " [retrieved later; minor update]")
            elif i % NEARCRAWL_MOD == NEARCRAWL_FRESH_OFFSET:  # new page
                out_ids.append(int(i) + RECRAWL_ID_BASE)
                out_txt.append(" ".join(
                    hashlib.md5(f"{i}:{j}".encode()).hexdigest()
                    for j in range(30)))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_txt, pa.string())})

    new_path = f"/tmp/meili_ray_cache/mh_newcrawl_{fp}"
    new_ds = _documents(sf_dir).map_batches(
        _new_crawl, batch_format="pyarrow", batch_size=4096)
    if not os.path.isdir(new_path) or not os.listdir(new_path):
        new_ds.write_parquet(new_path)  # verify stage reads texts from here
    return incremental_minhash_pairs(
        ray.data.read_parquet(new_path), idx_dir, [docs_path, new_path],
        new_id_min=RECRAWL_ID_BASE, threshold=threshold)


# ------------------------------------ exact duplicated-passage detection

GRAM_LEN = 50  # codepoints; the ExactSubstr-style passage unit


def dup_grams(sf_dir: str, gram_len: int = GRAM_LEN) -> ray.data.Dataset:
    """D11 -> (doc_id, n_dup_grams): for every document, how many of its
    character {gram_len}-grams occur >= 2 times ANYWHERE in the corpus
    (including elsewhere in the same document) — the exact
    duplicated-passage signal of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2021), whose spans a curation
    pipeline cuts out of the training text.

    Distributed shape: every-offset grams are emitted per batch
    (vectorized slicing), duplicate groups are found by ONE sort(gram)
    + per-block run-length scan with a driver-merged cross-block run
    chain (stages/runs.py pattern) — the Ray-Data-native equivalent of
    the per-shard suffix-array merge, with identical output and NO
    per-unique-gram Python dispatch — and the per-doc counts come from
    a combiner + one small groupby(doc_id). The gram exchange
    (~gram_len bytes x corpus positions) IS the inherent cost of the
    exact op; at 100 TB swap the gram string for its 8-byte md5 prefix as
    the shuffle key (identical grouping up to md5 collision) and keep
    only group sizes, which this pipeline's output depends on."""

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_ids, out_grams, out_offs = [], [], []
        for d, t in zip(ids.tolist(), texts):
            n = len(t) - gram_len + 1
            if n <= 0:
                continue
            out_ids.extend([d] * n)
            out_grams.extend(t[i:i + gram_len] for i in range(n))
            out_offs.extend(range(n))
        # (gram, doc_id, off) is row-unique: the sorted blocks' first rows
        # are stable block tags for the run-total merge below
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "gram": pa.array(out_grams, pa.string()),
                         "off": pa.array(out_offs, pa.int64())})

    def _run_bounds(batch: pa.Table) -> pa.Table:
        """One row per sorted block: tag + first/last gram-run profile."""
        if batch.num_rows == 0:
            return pa.table({
                "tag": pa.array([], pa.string()),
                "first_gram": pa.array([], pa.string()),
                "first_len": pa.array([], pa.int64()),
                "last_gram": pa.array([], pa.string()),
                "last_len": pa.array([], pa.int64()),
                "n_runs": pa.array([], pa.int64()),
            })
        from ..stages.runs import new_run_mask

        mask = new_run_mask(batch, ["gram"])
        starts = np.nonzero(mask)[0]
        n = batch.num_rows
        tag = repr((batch["gram"][0].as_py(),
                    int(batch["doc_id"][0].as_py()),
                    int(batch["off"][0].as_py())))
        return pa.table({
            "tag": pa.array([tag], pa.string()),
            "first_gram": pa.array([batch["gram"][0].as_py()], pa.string()),
            "first_len": pa.array(
                [int(starts[1]) if starts.size > 1 else n], pa.int64()),
            "last_gram": pa.array([batch["gram"][-1].as_py()], pa.string()),
            "last_len": pa.array([n - int(starts[-1])], pa.int64()),
            "n_runs": pa.array([int(starts.size)], pa.int64()),
        })

    def _merge_run_totals(btab: pa.Table) -> dict[str, tuple[int, int]]:
        """Chain first/last runs across block boundaries (a gram's run can
        span MANY blocks) -> {tag: (first-run total, last-run total)} via
        the shared associative-reduction merge (stages/runs.py)."""
        import ast
        import operator

        from ..stages.runs import merge_run_reductions

        rows = sorted(btab.to_pylist(),
                      key=lambda r: ast.literal_eval(r["tag"]))
        return merge_run_reductions(
            [{"tag": e["tag"], "first_key": e["first_gram"],
              "last_key": e["last_gram"], "first_val": e["first_len"],
              "last_val": e["last_len"], "n_runs": e["n_runs"]}
             for e in rows], operator.add)

    def _keep_dup_runs(batch: pa.Table, *, totals_ref) -> pa.Table:
        """Vectorized per-block filter: keep rows whose gram occurs >= 2
        times corpus-wide. Interior run lengths are local; the first and
        last runs use the broadcast cross-block totals. Replaces a
        groupby(gram).map_groups that paid one Python dispatch PER UNIQUE
        GRAM (~one per corpus position)."""
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        from ..stages.runs import fetch, new_run_mask

        totals = fetch(totals_ref)
        mask = new_run_mask(batch, ["gram"])
        run_id = np.cumsum(mask) - 1
        lens = np.bincount(run_id)
        tag = repr((batch["gram"][0].as_py(),
                    int(batch["doc_id"][0].as_py()),
                    int(batch["off"][0].as_py())))
        first_total, last_total = totals[tag]
        lens[0] = first_total
        lens[-1] = last_total
        keep = lens[run_id] >= 2
        return pa.table({"doc_id": batch["doc_id"].filter(
            pa.array(keep)).cast(pa.int64())})

    def _partial_counts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_dup_grams": batch["sum(cnt)"].cast(pa.int64()),
        })

    sorted_grams = (
        _documents(sf_dir)
        .map_batches(_grams, batch_format="pyarrow", batch_size=1024)
        .sort(["gram", "doc_id", "off"])
        .materialize()
    )
    btab = pa.concat_tables(ray.get(
        sorted_grams.map_batches(_run_bounds, batch_format="pyarrow",
                                 batch_size=None).to_arrow_refs()))
    totals_ref = ray.put(_merge_run_totals(btab))
    return (
        sorted_grams.map_batches(
            _keep_dup_runs, fn_kwargs={"totals_ref": totals_ref},
            batch_format="pyarrow", batch_size=None)
        .map_batches(_partial_counts, batch_format="pyarrow",
                     batch_size=65536)
        .groupby("doc_id").sum("cnt")
        .map_batches(_rename, batch_format="pyarrow")
    )


SQL["d11_dup_grams"] = f"""
WITH s AS (
  SELECT doc_id, substr(text, i, {GRAM_LEN}) AS gram
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - {GRAM_LEN - 1}, 0)
                            + 1)) AS i
        FROM documents)
),
c AS (SELECT gram, count(*) AS cnt FROM s GROUP BY gram)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
FROM s JOIN c USING (gram) WHERE c.cnt >= 2
GROUP BY s.doc_id
"""


def absorb_minhash_index(index_dir: str, new_ds: ray.data.Dataset,
                         accept_ids: "np.ndarray | None" = None,
                         preset: str = "strict") -> None:
    """Fold an accepted crawl INTO the persisted band index: sketch the
    new docs (optionally restricted to the accepted survivor ids) and
    append their band rows as new parquet files — the next crawl then
    dedups against corpus + accepted without ever re-sketching either.
    Ray's writer generates unique filenames, so the append is safe and
    atomic per file; the index needs no rewrite. `preset` must match the
    index's (band hashes from different presets never match)."""
    num_perm, n_bands = BAND_PRESETS[preset]
    bands = new_ds.map_batches(MinHasher, batch_format="pyarrow",
                               batch_size=1024,
                               fn_constructor_kwargs={"num_perm": num_perm,
                                                      "bands": n_bands},
                               concurrency=(1, pool_cap(8)))
    if accept_ids is not None:
        ids_ref = ray.put(np.sort(np.asarray(accept_ids, dtype=np.int64)))

        def _keep(batch: pa.Table, *, ids_ref) -> pa.Table:
            from ..stages.runs import fetch

            ids = fetch(ids_ref)
            v = batch["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, v)
            pos[pos == ids.size] = 0
            return batch.filter(pa.array(ids[pos] == v))

        bands = bands.map_batches(_keep, fn_kwargs={"ids_ref": ids_ref},
                                  batch_format="pyarrow")
    bands.write_parquet(index_dir)


@ray.remote
def _prune_index_file(path: str, drop_sorted: np.ndarray) -> int:
    """Rewrite one index file without the dropped doc_ids (atomic tmp +
    rename); files with no hits are left byte-untouched. Returns rows
    removed."""
    import os

    import pyarrow.parquet as pq

    tab = pq.read_table(path)
    v = tab["doc_id"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(drop_sorted, v)
    pos[pos == drop_sorted.size] = 0
    hit = drop_sorted[pos] == v
    n = int(hit.sum())
    if n == 0:
        return 0
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(tab.filter(pa.array(~hit)), tmp)
    os.replace(tmp, path)
    return n


def prune_minhash_index(index_dir: str, drop_ids) -> int:
    """Tombstone compaction for the band index: distribute one task per
    index file, each rewriting only if it holds dropped ids (deleted or
    superseded docs must stop generating candidates). Returns total band
    rows removed."""
    import os

    files = sorted(os.path.join(index_dir, f)
                   for f in os.listdir(index_dir) if f.endswith(".parquet"))
    drop = np.sort(np.asarray(list(drop_ids), dtype=np.int64))
    if drop.size == 0 or not files:
        return 0
    return int(sum(ray.get([_prune_index_file.remote(f, drop)
                            for f in files])))


# ------------------------------------------------ SemDeDup (d14)

def semdedup(sf_dir: str, k: int = 16, threshold: float = 0.95,
             iters: int = 4, max_cluster: int = 4096, plant: bool = False):
    """D14 — semantic dedup (Abbas et al. 2023, "SemDeDup", arXiv:2303.09540):
    k-means-cluster the embedding space, then drop near-duplicates WITHIN
    each cluster by exact cosine, keeping the lowest vec_id of every
    qualifying pair (the same loser rule as the d7 near-dup stage). Returns
    the KEPT rows as (vec_id, cluster).

    Scale shape: clustering is the distributed Lloyd trainer (one streaming
    pass per iteration, O(k*dim*blocks) driver traffic); assignment is a
    per-batch matmul against broadcast centroids; the within-cluster
    pairwise verification reuses the LSH near-dup machinery — ONE
    sort(bucket, vec_id) exchange, vectorized interior-run scans, <= 2
    boundary runs per block merged on the driver. k is the knob that bounds
    per-cluster O(m^2 d) work: choose k ~ n/target_cluster_size (the paper
    uses ~1 cluster per 10-50k points); clusters over `max_cluster` are
    capped LOUDLY by the shared kernel. Verdicts are applied by
    anti_id_filter, so embeddings never ride a second shuffle."""
    import os

    from ..stages.ann import _batch_matrix, kmeans_fit_distributed
    from ..stages.runs import anti_id_filter

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])
    if plant:
        ds = ds.map_batches(_plant_near_dups, batch_format="pyarrow",
                            batch_size=4096)
    centroids = kmeans_fit_distributed(ds, k=k, iters=iters)
    cref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        mat = _batch_matrix(batch, "embedding")
        d2 = ((mat ** 2).sum(axis=1)[:, None] - 2.0 * (mat @ cents.T)
              + (cents ** 2).sum(axis=1)[None, :])
        return batch.append_column(
            "bucket", pa.array(d2.argmin(axis=1).astype(np.int64)))

    clustered = (ds.map_batches(_assign, batch_format="pyarrow",
                                batch_size=4096)
                 .sort(["bucket", "vec_id"]).materialize())
    interior = clustered.map_batches(
        _block_cosine_pairs,
        fn_kwargs={"threshold": threshold, "max_bucket": max_cluster},
        batch_format="pyarrow", batch_size=None)
    boundary_members = pa.concat_tables(ray.get(
        clustered.map_batches(_block_boundary_vecs, batch_format="pyarrow",
                              batch_size=None).to_arrow_refs()))
    boundary = _boundary_cosine_pairs(boundary_members, threshold)
    tables = [x for x in ray.get(interior.to_arrow_refs()) if x.num_rows]
    if boundary.num_rows:
        tables.append(boundary)
    if not tables:
        return clustered.select_columns(["vec_id", "bucket"]).rename_columns(
            {"bucket": "cluster"})
    pairs = pa.concat_tables(tables)
    # loser rule: any vector cosine-similar to a LOWER vec_id is dropped
    # (pairs are emitted a < b, so the losers are exactly the b side)
    losers = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.unique(pairs["b"].to_numpy(
            zero_copy_only=False)), pa.int64())}))
    kept = anti_id_filter(
        clustered.select_columns(["vec_id", "bucket"]), losers,
        id_col="vec_id")
    return kept.rename_columns({"bucket": "cluster"})
