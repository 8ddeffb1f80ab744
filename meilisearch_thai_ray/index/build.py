"""Distributed index build: pages parquet -> docs parquet -> sharded inverted index.

Ray-Data-first topology (SURVEY.md §3.1 'Ray shape'):

  phase "docs":   read_parquet(pages, columns=[url, html, lang])
                    -> map_batches(extract_tokenize_fn tasks)    [html dropped here]
                    -> write_parquet(<out>/docs)
  phase "stats":  read docs(token_count) -> count + sum -> meta.json (N, avgdl)
                    [the one true barrier: block-max metadata needs avgdl]
  phase "shards": read docs(doc_id, terms, token_count)
                    -> map_batches(PostingsFlat)                 [partial agg + salt]
                    -> groupby("part").map_groups(encode)        [the shuffle]
                    -> atomic per-part parquet + manifest lineage row

Each phase is skipped on resume when its `.done` marker exists; part files are
written tmp->rename so resumes never trust torn output (state/manifest.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import EngineConfig
from ..kernel.extract import EXTRACTOR_VERSION
from ..sources.pages import read_pages
from ..state.manifest import BuildManifest, atomic_write_parquet

SEGMENT_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("salt", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("n_docs", pa.int64()),
        ("docs_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_max", pa.list_(pa.float64())),
        # store_positions=True: varint delta stream of per-occurrence token
        # positions (posting boundaries implied by tf); empty otherwise
        ("pos_bin", pa.binary()),
    ]
)


def _encode_part(group: pa.Table, *, out_dir: str, avgdl: float, k1: float,
                 b: float, block: int, num_salts: int) -> pa.Table:
    """Encode every term segment of one salted partition and write it atomically.

    Returns one summary row (the dataset result is build metrics, tiny)."""
    t0 = time.time()
    part = int(group["part"][0].as_py())
    shard, salt = divmod(part, num_salts)
    shard_dir = os.path.join(out_dir, "shards", f"shard={shard:05d}")
    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, f"salt-{salt:04d}.parquet")

    summary = {
        "part": [part], "shard": [shard], "salt": [salt],
        "n_terms": [0], "n_postings": [0], "bytes": [0], "wall_s": [0.0],
        "skipped": [False],
    }
    if os.path.exists(path):  # idempotent resume: atomic file => complete
        summary["skipped"] = [True]
        return pa.table(summary)

    n_terms, n_postings, total_bytes = _encode_group_to_file(
        group, path, shard=shard, salt=salt, avgdl=avgdl, k1=k1, b=b, block=block
    )
    summary.update(
        n_terms=[n_terms], n_postings=[n_postings], bytes=[total_bytes],
        wall_s=[time.time() - t0],
    )
    return pa.table(summary)


def _encode_group_to_file(group: pa.Table, path: str, *, shard: int, salt: int,
                          avgdl: float, k1: float, b: float,
                          block: int) -> tuple[int, int, int]:
    """Sort one partition's postings by (term, doc_id), encode every term
    segment, write the shard file atomically. -> (n_terms, n_postings, bytes)."""
    from .codec import encode_positions, encode_segment

    import polars as pl

    has_pos = "positions" in group.column_names
    cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if has_pos else [])
    df = pl.from_arrow(group.select(cols)).sort(["term", "doc_id"])
    terms = np.asarray(df["term"].to_list(), dtype=object)
    doc_ids = df["doc_id"].to_numpy().astype(np.uint64)
    tfs = df["tf"].to_numpy().astype(np.uint64)
    dls = df["dl"].to_numpy().astype(np.uint64)
    pos_lists = df["positions"].to_list() if has_pos else None

    n = len(terms)
    bounds = np.flatnonzero(terms[1:] != terms[:-1]) + 1 if n > 1 else np.empty(0, np.int64)
    starts = np.concatenate(([0], bounds)).astype(np.int64)
    ends = np.concatenate((bounds, [n])).astype(np.int64)

    rows: dict[str, list] = {k.name: [] for k in SEGMENT_SCHEMA}
    total_bytes = 0
    for s, e in zip(starts, ends):
        seg = encode_segment(doc_ids[s:e], tfs[s:e], dls[s:e], avgdl, k1, b, block)
        pos_bin = (
            encode_positions(pos_lists[s:e], tfs[s:e]) if has_pos else b""
        )
        rows["shard"].append(shard)
        rows["salt"].append(salt)
        rows["term"].append(terms[s])
        rows["df"].append(seg["n_docs"])
        rows["cf"].append(seg["cf"])
        rows["n_docs"].append(seg["n_docs"])
        rows["docs_bin"].append(seg["docs_bin"])
        rows["tfs_bin"].append(seg["tfs_bin"])
        rows["dls_bin"].append(seg["dls_bin"])
        rows["block_last"].append(seg["block_last"])
        rows["block_max"].append(seg["block_max"])
        rows["pos_bin"].append(pos_bin)
        total_bytes += (len(seg["docs_bin"]) + len(seg["tfs_bin"])
                        + len(seg["dls_bin"]) + len(pos_bin))

    out = pa.table({k: rows[k] for k in rows}, schema=SEGMENT_SCHEMA)
    atomic_write_parquet(out, path)
    return len(starts), n, total_bytes


def _save_stage_stats(ds, out_dir: str, phase: str) -> None:
    """Persist ds.stats() (per-operator wall/cpu/memory breakdown) next to the
    manifest — the observability trail for tuning batch sizes and concurrency."""
    try:
        text = ds.stats()
    except Exception:
        return
    d = os.path.join(out_dir, "_manifest")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"stats_{phase}.txt"), "w") as f:
        f.write(text)


def build_docs(pages_path: str, out_dir: str, config: EngineConfig, *,
               batch_size: int = 256, concurrency=None) -> str:
    """Phase 'docs'. Returns the docs parquet directory.

    Stateless tasks with a per-worker-process tokenizer cache (measured 3x
    faster than an actor pool here — see ExtractTokenize.cached).

    batch_size sizes TASKS, not just UDF batches (map_batches coalesces blocks
    up to batch_size into one task): at ~2.5 ms tokenize per 2 KB doc, 256 docs
    ≈ 0.6 s per task — small enough that every CPU stays fed, large enough
    that task overhead stays <10%."""
    import functools

    docs_dir = os.path.join(out_dir, "docs")
    manifest = BuildManifest(out_dir)
    if manifest.phase_done("docs"):
        return docs_dir
    t0 = time.time()
    if os.path.isdir(docs_dir):  # discard a crashed run's partial files:
        for f in os.listdir(docs_dir):  # re-running write_parquet would
            os.remove(os.path.join(docs_dir, f))  # duplicate every doc row
    from ..stages.extract_tokenize import extract_tokenize_fn

    ds = read_pages(pages_path)
    docs = ds.map_batches(
        functools.partial(extract_tokenize_fn, config=config),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    docs.write_parquet(docs_dir)
    os.makedirs(docs_dir, exist_ok=True)  # zero-row corpus: sink writes nothing
    _save_stage_stats(docs, out_dir, "docs")
    manifest.record_partition(
        "docs",
        {
            "partition": "all",
            "input": pages_path,
            "dictionary_hash": config.dictionary_hash(),
            "extractor_version": EXTRACTOR_VERSION,
            "wall_s": time.time() - t0,
        },
    )
    manifest.mark_phase_done("docs")
    return docs_dir


def compute_stats(docs_dir: str, out_dir: str, config: EngineConfig) -> dict:
    """Phase 'stats': N, avgdl -> meta.json (the global barrier, tiny aggregate)."""
    meta_path = os.path.join(out_dir, "meta.json")
    manifest = BuildManifest(out_dir)
    if manifest.phase_done("stats"):
        with open(meta_path) as f:
            return json.load(f)
    has_files = any(f.endswith(".parquet") for f in os.listdir(docs_dir))
    if not has_files:
        n_docs, sum_dl = 0, 0
    else:
        import pyarrow.dataset as pads

        dset = pads.dataset(docs_dir)
        # failed (dead-letter) rows never count toward N/avgdl — they carry
        # no postings either, so BM25 stats stay consistent with the shards
        flt = (
            pc.field("status") != "failed"
            if "status" in dset.schema.names
            else None
        )
        total_bytes = sum(os.path.getsize(f) for f in dset.files)
        if total_bytes < 4 << 30:
            # small docs table: one driver-side streaming column scan beats a
            # whole Ray job's fixed latency (row count comes from file metadata)
            n_docs, sum_dl = 0, 0
            if flt is None:
                for frag in dset.get_fragments():
                    n_docs += frag.count_rows()
            else:
                n_docs = dset.count_rows(filter=flt)
            for batch in dset.to_batches(columns=["token_count"], filter=flt):
                sum_dl += pc.sum(batch.column(0)).as_py() or 0
        else:
            from ray.data.aggregate import Count, Sum

            ds = ray.data.read_parquet(
                docs_dir, columns=["token_count"], filter=flt
            )
            agg = ds.aggregate(Count(alias_name="n"), Sum("token_count", alias_name="s"))
            n_docs = int(agg["n"])
            sum_dl = int(agg["s"] or 0)
    meta = {
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "k1": config.k1,
        "b": config.b,
        "posting_block": config.posting_block,
        "num_shards": config.num_shards,
        "num_salts": getattr(config, "num_salts", 1),
        "store_positions": getattr(config, "store_positions", False),
        "dictionary_hash": config.dictionary_hash(),
        "extractor_version": EXTRACTOR_VERSION,
        # Meilisearch tokenizer settings persist with the index (settings
        # sink): SearchEngine restores them so queries tokenize the way the
        # corpus was indexed (settings_manager.py:117-118)
        "separator_tokens": list(config.separator_tokens),
        "non_separator_tokens": list(config.non_separator_tokens),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    manifest.mark_phase_done("stats")
    return meta


def _spill_postings_batch(batch: pa.Table, spill_dir: str) -> pa.Table:
    """Map-side partitioned spill: write this batch's rows into per-part files.

    The explicit external-shuffle alternative to Ray's sort-based groupby
    (north_rule: 'partitioning / shuffle handled explicitly'): map tasks
    append part-local parquet files; reduce tasks each read one part's files.
    No global sort — both sides embarrassingly parallel; (term, doc_id) keys
    are globally unique so the reduce-side sort makes output bytes identical
    to the sort-shuffle path (asserted in tests).

    Retry-idempotent: file names are a content hash of the batch's doc_ids, so
    a re-executed map task atomically overwrites its own files instead of
    appending duplicates (same scheme as the fused build's docs side-writes)."""
    import hashlib

    import polars as pl

    df = pl.from_arrow(batch)
    # order-insensitive batch identity: the SORTED doc set (each doc lives in
    # exactly one batch; intra-batch row order is not stable across retries)
    digest = hashlib.md5(
        np.unique(batch["doc_id"].to_numpy(zero_copy_only=False)).tobytes()
    ).hexdigest()[:16]
    for key, sub in df.partition_by("part", as_dict=True).items():
        part = int(key[0] if isinstance(key, tuple) else key)
        d = os.path.join(spill_dir, f"part={part:05d}")
        os.makedirs(d, exist_ok=True)
        atomic_write_parquet(
            sub.drop("part").to_arrow(),
            os.path.join(d, f"batch-{digest}.parquet"),
        )
    return pa.table({"rows": [len(df)]})


@ray.remote
def _encode_spilled_part(spill_dir: str, part: int, out_dir: str, avgdl: float,
                         k1: float, b: float, block: int, num_salts: int) -> dict:
    import pyarrow.dataset as pads

    t0 = time.time()
    shard, salt = divmod(part, num_salts)
    shard_dir = os.path.join(out_dir, "shards", f"shard={shard:05d}")
    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, f"salt-{salt:04d}.parquet")
    row = {"partition": part, "shard": shard, "salt": salt, "n_terms": 0,
           "n_postings": 0, "bytes": 0, "wall_s": 0.0, "skipped": False}
    if os.path.exists(path):
        row["skipped"] = True
        return row
    group = pads.dataset(os.path.join(spill_dir, f"part={part:05d}")).to_table()
    n_terms, n_postings, total_bytes = _encode_group_to_file(
        group, path, shard=shard, salt=salt, avgdl=avgdl, k1=k1, b=b, block=block
    )
    row.update(n_terms=n_terms, n_postings=n_postings, bytes=total_bytes,
               wall_s=time.time() - t0)
    return row


def shards_layout(out_dir: str) -> dict | None:
    """The (num_shards, num_salts, dictionary_hash) layout the shards phase
    was/is being built with — recorded BEFORE any salt file is written so a
    resume can detect a layout change."""
    p = os.path.join(out_dir, "_manifest", "shards_layout.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _guard_shards_layout(out_dir: str, config: EngineConfig,
                         num_salts: int) -> None:
    """Validate/record the shards-phase layout. A crashed build resumed with
    a different num_shards/num_salts would reuse stale salt-NNNN.parquet
    files whose (shard, salt) derivation differs — silently duplicating or
    dropping postings. Mismatched partial output is discarded; a COMPLETED
    phase with a different layout raises (the caller must pick a fresh
    out_dir or match the original layout)."""
    layout = {
        "num_shards": config.num_shards,
        "num_salts": num_salts,
        "dictionary_hash": config.dictionary_hash(),
        # everything baked into the salt files' BYTES belongs here — a resume
        # with a flipped store_positions (or different BM25/block constants)
        # must not trust stale parts whose encoded content differs
        "store_positions": getattr(config, "store_positions", False),
        "k1": config.k1,
        "b": config.b,
        "posting_block": config.posting_block,
    }
    existing = shards_layout(out_dir)
    manifest = BuildManifest(out_dir)
    # keys absent from an older guard version's file are tolerated (legacy
    # layouts recorded fewer fields); any PRESENT key must match
    if existing is not None and all(
        existing.get(k, v) == v for k, v in layout.items()
    ):
        if existing != layout:  # legacy file: record the fuller layout
            existing = None
        else:
            return
    if existing is not None:
        if manifest.phase_done("shards"):
            raise ValueError(
                f"index at {out_dir} was built with layout {existing}; "
                f"requested {layout} — rebuild into a fresh directory"
            )
        import shutil

        shutil.rmtree(os.path.join(out_dir, "shards"), ignore_errors=True)
        jl = os.path.join(out_dir, "_manifest", "shards.jsonl")
        if os.path.exists(jl):
            os.remove(jl)
    p = os.path.join(out_dir, "_manifest", "shards_layout.json")
    tmp = p + ".tmp"
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(layout, f)
    os.replace(tmp, p)


def build_shards(docs_dir: str, out_dir: str, config: EngineConfig, meta: dict, *,
                 num_salts: int = 1, batch_size: int = 4096,
                 shuffle: str = "auto") -> list[dict]:
    """Phase 'shards': the posting shuffle + encode.

    shuffle="sort": Ray-native groupby(part).map_groups — the exchange
    rides the object store. shuffle="spill": explicit map-side-partitioned
    external shuffle through the filesystem (_spill_postings_batch) — the
    shared-FS path for clusters where one node's object store cannot hold
    the exchange. Outputs are byte-identical either way (asserted in
    tests), so the "auto" default picks by MEASURED crossover (BASELINE.md
    r5, 200k docs with the consolidated read below): spill wins at every
    parallelism level once reads are consolidated — 23.9 s vs sort's
    26.8 s at 2 CPUs, 6.9 s vs 9.5 s at 8 — because the sort path
    carries ~2.5x the serial sample/plan cost. Sort remains right for
    SMALL corpora, where 64 spill part-dirs of tiny files cost more than
    one in-store groupby — auto switches on docs size (64 MiB disk).

    The docs read consolidates into ~3 blocks per CPU (override_num_blocks):
    the docs phase writes O(tasks) files, and re-reading each as its own
    1000-row task spent more wall on scheduling than on work (measured 11.2 s
    operator time for 1.75 s of remote work at 200k docs)."""
    manifest = BuildManifest(out_dir)
    if manifest.phase_done("shards"):
        _guard_shards_layout(out_dir, config, num_salts)  # raises on mismatch
        return manifest.partitions("shards")
    _guard_shards_layout(out_dir, config, num_salts)
    if meta["n_docs"] == 0:  # zero-row corpus: nothing to shuffle
        os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
        manifest.mark_phase_done("shards", {"wall_s": 0.0})
        return []
    t0 = time.time()
    import functools

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_files = sum(1 for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    disk_b = sum(os.path.getsize(os.path.join(docs_dir, f))
                 for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    if shuffle == "auto":
        shuffle = "spill" if disk_b > (64 << 20) else "sort"
    store_pos = getattr(config, "store_positions", False)
    cols = ["doc_id", "terms", "token_count"] + (
        ["term_positions"] if store_pos else []
    )
    # ~3 blocks/CPU for balance, but never above ~32 MiB decoded per block
    # (decoded postings run ~4x the parquet bytes) or below one block per
    # file-pair — the hint only coalesces, large corpora stay block-capped
    blocks = max(ncpu * 3, int(disk_b * 4 // (32 << 20)) + 1)
    docs = ray.data.read_parquet(docs_dir, columns=cols,
                                 override_num_blocks=min(max(blocks, 1),
                                                         max(n_files, 1) * 4))
    from ..stages.postings import postings_flat_fn

    postings = docs.map_batches(
        functools.partial(
            postings_flat_fn, num_shards=config.num_shards,
            num_salts=num_salts, positions=store_pos,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if shuffle == "spill":
        import shutil as _shutil

        spill_dir = os.path.join(out_dir, "_spill")
        _shutil.rmtree(spill_dir, ignore_errors=True)  # transient, rebuilt on resume
        os.makedirs(spill_dir, exist_ok=True)
        postings.map_batches(
            functools.partial(_spill_postings_batch, spill_dir=spill_dir),
            batch_format="pyarrow",
        ).materialize()
        parts = sorted(
            int(d.split("=")[1]) for d in os.listdir(spill_dir) if d.startswith("part=")
        )
        rows = ray.get([
            _encode_spilled_part.remote(
                spill_dir, p, out_dir, meta["avgdl"], config.k1, config.b,
                config.posting_block, num_salts,
            )
            for p in parts
        ])
        _shutil.rmtree(spill_dir, ignore_errors=True)
        for row in rows:
            manifest.record_partition("shards", row)
        manifest.mark_phase_done("shards", {"wall_s": time.time() - t0,
                                            "shuffle": "spill"})
        return manifest.partitions("shards")

    encode = functools.partial(
        _encode_part,
        out_dir=out_dir,
        avgdl=meta["avgdl"],
        k1=config.k1,
        b=config.b,
        block=config.posting_block,
        num_salts=num_salts,
    )
    summary_ds = postings.groupby("part").map_groups(encode, batch_format="pyarrow")
    summaries = summary_ds.take_all()
    _save_stage_stats(summary_ds, out_dir, "shards")
    for row in summaries:
        manifest.record_partition(
            "shards",
            {
                "partition": int(row["part"]),
                "shard": int(row["shard"]),
                "salt": int(row["salt"]),
                "n_terms": int(row["n_terms"]),
                "n_postings": int(row["n_postings"]),
                "bytes": int(row["bytes"]),
                "wall_s": float(row["wall_s"]),
                "skipped": bool(row["skipped"]),
            },
        )
    manifest.mark_phase_done("shards", {"wall_s": time.time() - t0,
                                        "shuffle": "sort"})
    return manifest.partitions("shards")


@ray.remote
class StatsAccumulator:
    """Running (n_docs, sum_dl) totals, fed by the fused extract stage.

    The groupby shuffle is a barrier: every upstream map task completes before
    any map_groups task runs, so totals read inside encode are final.
    Contributions carry an idempotency key (batch content hash) so a retried
    task never double-counts."""

    def __init__(self):
        self.n = 0
        self.sum_dl = 0
        self._seen: set[str] = set()

    def add(self, key: str, n: int, sum_dl: int) -> None:
        if key in self._seen:
            return
        self._seen.add(key)
        self.n += n
        self.sum_dl += sum_dl

    def totals(self) -> tuple[int, int]:
        return self.n, self.sum_dl


def _fused_extract_postings(batch: pa.Table, *, config: EngineConfig,
                            docs_dir: str, num_salts: int, stats_actor) -> pa.Table:
    """Fused stage: extract+tokenize -> (a) atomic side-write of the docs rows,
    (b) stats increment, (c) flat posting rows out.

    Retry-idempotent: the docs file name is a content hash of the batch's urls,
    so a re-executed task atomically overwrites its own file, never duplicates.
    """
    import hashlib

    from ..stages.extract_tokenize import extract_tokenize_fn
    from ..stages.postings import postings_flat_fn

    docs = extract_tokenize_fn(batch, config=config)
    urls_digest = hashlib.md5("\n".join(batch["url"].to_pylist()).encode()).hexdigest()[:16]
    atomic_write_parquet(docs, os.path.join(docs_dir, f"docs-{urls_digest}.parquet"))
    # dead-letter rows are excluded from N (phased-build parity: compute_stats
    # filters status != "failed"); their token_count is 0 so sum_dl is safe
    n = docs.num_rows - int(
        pc.sum(pc.equal(docs["status"], "failed").cast(pa.int64())).as_py() or 0
    )
    sum_dl = int(pc.sum(docs["token_count"]).as_py() or 0)
    # AWAIT the actor ack: the groupby barrier only guarantees map TASKS have
    # finished — a fire-and-forget add could still be in flight when the first
    # encode task reads totals, baking a partial avgdl into block_max
    ray.get(stats_actor.add.remote(urls_digest, n, sum_dl))
    return postings_flat_fn(
        docs, num_shards=config.num_shards, num_salts=num_salts,
        positions=getattr(config, "store_positions", False),
    )


_FUSED_AVGDL_CACHE: dict = {}


def _encode_part_lazy_stats(group: pa.Table, *, out_dir: str, stats_actor,
                            k1: float, b: float, block: int,
                            num_salts: int) -> pa.Table:
    """Encode callback for the fused build: avgdl is fetched from the stats
    actor on first use (final by barrier, see StatsAccumulator) and cached per
    worker process, keyed by the actor's globally-unique id (id() of the
    handle object could recycle across builds in a reused worker)."""
    key = stats_actor._actor_id.hex()
    avgdl = _FUSED_AVGDL_CACHE.get(key)
    if avgdl is None:
        n, sum_dl = ray.get(stats_actor.totals.remote())
        avgdl = (sum_dl / n) if n else 0.0
        _FUSED_AVGDL_CACHE[key] = avgdl
    return _encode_part(group, out_dir=out_dir, avgdl=avgdl, k1=k1, b=b,
                        block=block, num_salts=num_salts)


def build_index_fused(pages_path: str, out_dir: str,
                      config: EngineConfig | None = None, *,
                      num_salts: int = 1, batch_size: int = 256) -> dict:
    """Single-job build: pages -> fused extract/postings -> groupby -> shards.

    Same outputs as the phased build (shard bytes identical, docs row set
    identical — file layout differs) with two Ray jobs fewer and no
    docs-parquet round trip: the throughput/scaling path. Resume granularity
    is coarser (a crash mid-job redoes the whole job; completed shard files
    are still skipped)."""
    import functools

    config = config or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    manifest = BuildManifest(out_dir)
    meta_path = os.path.join(out_dir, "meta.json")
    if manifest.phase_done("shards"):
        _guard_shards_layout(out_dir, config, num_salts)  # raises on mismatch
        build_term_dict(out_dir)  # phase-guarded: heals a crash-after-shards
        with open(meta_path) as f:
            return json.load(f)
    _guard_shards_layout(out_dir, config, num_salts)
    t0 = time.time()
    docs_dir = os.path.join(out_dir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    for f in os.listdir(docs_dir):  # a crashed fused run leaves partial files
        os.remove(os.path.join(docs_dir, f))
    stats_actor = StatsAccumulator.remote()

    pages = read_pages(pages_path)
    postings = pages.map_batches(
        functools.partial(
            _fused_extract_postings, config=config, docs_dir=docs_dir,
            num_salts=num_salts, stats_actor=stats_actor,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    encode = functools.partial(
        _encode_part_lazy_stats, out_dir=out_dir, stats_actor=stats_actor,
        k1=config.k1, b=config.b, block=config.posting_block, num_salts=num_salts,
    )
    summaries = postings.groupby("part").map_groups(
        encode, batch_format="pyarrow"
    ).take_all()

    n_docs, sum_dl = ray.get(stats_actor.totals.remote())
    meta = {
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "k1": config.k1,
        "b": config.b,
        "posting_block": config.posting_block,
        "num_shards": config.num_shards,
        "num_salts": num_salts,
        "store_positions": getattr(config, "store_positions", False),
        "dictionary_hash": config.dictionary_hash(),
        "extractor_version": EXTRACTOR_VERSION,
        "separator_tokens": list(config.separator_tokens),
        "non_separator_tokens": list(config.non_separator_tokens),
        "build_mode": "fused",
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    for row in summaries:
        manifest.record_partition(
            "shards",
            {"partition": int(row["part"]), "shard": int(row["shard"]),
             "salt": int(row["salt"]), "n_terms": int(row["n_terms"]),
             "n_postings": int(row["n_postings"]), "bytes": int(row["bytes"]),
             "wall_s": float(row["wall_s"]), "skipped": bool(row["skipped"])},
        )
    manifest.mark_phase_done("docs", {"mode": "fused"})
    manifest.mark_phase_done("stats", {"mode": "fused"})
    manifest.mark_phase_done("shards", {"wall_s": time.time() - t0, "mode": "fused"})
    build_term_dict(out_dir)
    return meta


def build_term_dict(out_dir: str) -> str:
    """Phase 'dict': globally SORTED (term, df, cf) dictionary parquet.

    The scale path for prefix expansion / suggestions: terms are hash-sharded
    in the posting files, so a prefix scan would otherwise load every shard's
    term table; a sorted dictionary with small row groups turns it into a
    stats-pruned range read (only row groups whose [min, max] straddles the
    prefix are touched). Dictionary size is O(vocabulary) — tiny next to the
    postings — so a driver-side streaming scan suffices below 4 GiB and the
    Ray groupby/sort path covers anything bigger."""
    import pyarrow.dataset as pads

    manifest = BuildManifest(out_dir)
    d = os.path.join(out_dir, "termdict")
    if manifest.phase_done("dict"):
        return d
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(d):  # discard a crashed run's partial files
        os.remove(os.path.join(d, f))
    shards_dir = os.path.join(out_dir, "shards")
    files = []
    if os.path.isdir(shards_dir):
        for root, _dirs, fs in os.walk(shards_dir):
            files.extend(os.path.join(root, f) for f in fs
                         if f.endswith(".parquet"))
    t0 = time.time()
    if not files:
        atomic_write_parquet(
            pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "cf": pa.array([], pa.int64())}),
            os.path.join(d, "termdict-00000.parquet"),
        )
    else:
        total_bytes = sum(os.path.getsize(f) for f in files)
        if total_bytes < 4 << 30:
            import polars as pl

            t = pads.dataset(files).to_table(columns=["term", "df", "cf"])
            out = (
                pl.from_arrow(t)
                .group_by("term")  # salted segments of one term sum up
                .agg(pl.col("df").sum(), pl.col("cf").sum())
                .sort("term")
                .to_arrow()
            )
            atomic_write_parquet(
                out, os.path.join(d, "termdict-00000.parquet"),
                row_group_size=8192,
            )
        else:
            from ray.data.aggregate import Sum

            ds = ray.data.read_parquet(files, columns=["term", "df", "cf"])
            agg = ds.groupby("term").aggregate(
                Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
            )
            agg.sort("term").write_parquet(d, row_group_size=8192)
    manifest.mark_phase_done("dict", {"wall_s": time.time() - t0})
    return d


def _typo_neighborhood_rows(batch: pa.Table) -> pa.Table:
    """(term, df) rows -> (variant, term, df) SymSpell deletion-neighborhood
    rows at the MAXIMUM query budget (2 deletions for EVERY term,
    kernel/typo.py MAX_TYPOS): any request-time minWordSizeForTypos
    setting yields a query budget b <= 2, and the SymSpell property
    (dl(q, t) <= b => a shared variant within b deletions of each) then
    holds against this index for ALL thresholds, not just the defaults —
    so custom typoTolerance settings keep the pruned-range-read path
    (VERDICT r4 item #6). Cost vs the old per-length budget: only terms
    shorter than TWO_TYPO_MIN_LEN-2 gain variants (short words, few
    deletions each) — measured ~1.2x rows on the fixture dictionary."""
    from ..kernel.typo import MAX_TYPOS, deletion_variants

    vs: list = []
    ts: list = []
    dfs: list = []
    for t, df in zip(batch["term"].to_pylist(), batch["df"].to_pylist()):
        for v in deletion_variants(t, MAX_TYPOS):
            vs.append(v)
            ts.append(t)
            dfs.append(int(df))
    return pa.table({"variant": pa.array(vs, pa.string()),
                     "term": pa.array(ts, pa.string()),
                     "df": pa.array(dfs, pa.int64())})


def build_typo_index(out_dir: str) -> str:
    """Phase 'typodict' (OPT-IN, after 'dict'): the SymSpell deletion
    neighborhood of the term dictionary as a globally variant-SORTED parquet
    with small row groups, so typo expansion becomes a stats-pruned range
    read (the same trick the sorted termdict plays for prefixes) instead of
    a driver-side vocabulary scan. Opt-in because serving falls back to the
    in-memory prefilter transparently (SearchEngine.expand_typo) and small
    indexes don't need the ~O(vocab x len^2) rows. Driver polars path below
    512 MiB of dictionary, Ray map_batches + sort above."""
    import pyarrow.dataset as pads

    manifest = BuildManifest(out_dir)
    d = os.path.join(out_dir, "typodict")
    if manifest.phase_done("typodict"):
        return d
    td = build_term_dict(out_dir)  # no-op when the dict phase is done
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(d):  # discard a crashed run's partial files
        os.remove(os.path.join(d, f))
    t0 = time.time()
    files = [os.path.join(td, f) for f in os.listdir(td)
             if f.endswith(".parquet")]
    if sum(os.path.getsize(f) for f in files) < 512 << 20:
        import polars as pl

        rows = _typo_neighborhood_rows(
            pads.dataset(files).to_table(columns=["term", "df"]))
        out = pl.from_arrow(rows).sort(["variant", "term"]).to_arrow()
        atomic_write_parquet(
            out.cast(rows.schema), os.path.join(d, "typodict-00000.parquet"),
            row_group_size=8192,
        )
    else:
        ds = ray.data.read_parquet(files, columns=["term", "df"])
        ds.map_batches(_typo_neighborhood_rows, batch_format="pyarrow",
                       batch_size=4096).sort(["variant", "term"]).write_parquet(
            d, row_group_size=8192)
    # budget marker: engines only use this dict for NON-default
    # typoTolerance thresholds when it was built at the max budget
    manifest.mark_phase_done("typodict", {"wall_s": time.time() - t0,
                                          "budget": "max"})
    return d


def build_index(pages_path: str, out_dir: str, config: EngineConfig | None = None, *,
                num_salts: int = 1, batch_size: int = 256) -> dict:
    """Full build (all phases, resumable). Returns meta dict."""
    config = config or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    docs_dir = build_docs(pages_path, out_dir, config, batch_size=batch_size)
    meta = compute_stats(docs_dir, out_dir, config)
    meta["num_salts"] = num_salts
    build_shards(docs_dir, out_dir, config, meta, num_salts=num_salts)
    build_term_dict(out_dir)
    # persist the actual salt count used (query reader needs it)
    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path) as f:
        m = json.load(f)
    if m.get("num_salts") != num_salts:
        m["num_salts"] = num_salts
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, meta_path)
    return m
