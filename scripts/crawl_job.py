"""Crawl-snapshot job driver — the `ray job submit` entrypoint for the
continuous-crawl loop (one snapshot in, one served generation + updated
archive indexes out). Companion to build_job.py (the cold build).

Usage (local sandbox):
    python scripts/crawl_job.py --archive /data/crawl-007 \
        --index /shared/index --mh-index /shared/mh --work /tmp/work \
        --cdx-out /shared/cdx/crawl-007

On a real cluster:
    ray job submit --working-dir . -- python scripts/crawl_job.py \
        --archive s3://bucket/crawl-007 --index /shared/index ...

Stages (all existing, audited pipeline pieces):
  1. refresh_index_from_archive — WARC stream -> canonical-url dedup ->
     optional robots gate -> extract once -> near-dup vs the PERSISTED
     MinHash band index -> delta index generation (resumable), band rows
     absorbed so the NEXT snapshot dedups against this one.
  2. (--cdx-out) CDX + ZipNum over the input archive, so the snapshot is
     randomly accessible the moment it is served.
  3. (--revisit-out + --prior-archive) re-archive the snapshot THROUGH the
     revisit sink: pages whose payload digest matches the prior crawl
     store as header-only revisit records (the archive-size lever).
     mode=auto shards the prior digest map by url_h above the documented
     row threshold so no writer ever holds the whole map.

This script OWNS its Ray session (guarded init); library code never
calls ray.init. Prints ONE JSON metrics line on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", required=True,
                    help="WARC archive file or directory (the snapshot)")
    ap.add_argument("--index", required=True,
                    help="served index dir (generations live beside it)")
    ap.add_argument("--mh-index", required=True,
                    help="persisted MinHash band index dir")
    ap.add_argument("--work", required=True, help="scratch dir")
    ap.add_argument("--cdx-out", default=None,
                    help="also build CDX + ZipNum over the archive here")
    ap.add_argument("--robots-json", default=None,
                    help="json file: host -> robots.txt text (politeness "
                         "gate before extraction spend)")
    ap.add_argument("--robots-agent", default="graftbot")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    ap.add_argument("--preset", default="strict",
                    choices=["strict", "near"], help="MinHash band preset")
    ap.add_argument("--zipnum-lines", type=int, default=3000)
    ap.add_argument("--revisit-out", default=None,
                    help="also re-archive the snapshot's pages THROUGH the "
                         "revisit sink (payload-digest dedup vs the prior "
                         "crawl) into this dir")
    ap.add_argument("--prior-archive", default=None,
                    help="the PRIOR crawl's WARC dir; its CDX digest map "
                         "drives --revisit-out dedup")
    ap.add_argument("--revisit-mode", default="auto",
                    choices=["auto", "broadcast", "sharded"],
                    help="prior-map residency: auto picks sharded above "
                         "the documented row threshold (fleet default)")
    ap.add_argument("--revisit-shards", type=int, default=None,
                    help="override url_h shard count in sharded mode")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from meilisearch_thai_ray.pipelines.crawl_refresh import (
        refresh_index_from_archive)

    robots_map = None
    if args.robots_json:
        with open(args.robots_json, encoding="utf-8") as f:
            robots_map = json.load(f)

    t0 = time.perf_counter()
    metrics = refresh_index_from_archive(
        args.index, args.archive, args.mh_index, args.work,
        robots_map=robots_map, robots_agent=args.robots_agent,
        threshold=args.threshold, preset=args.preset)
    refresh_s = time.perf_counter() - t0

    out = {"archive": args.archive, "refresh_s": round(refresh_s, 2)}
    out.update({k: v for k, v in metrics.items()
                if isinstance(v, (int, float, str))})

    if args.cdx_out:
        from meilisearch_thai_ray.sources.warc import cdx_index_warc_dir
        from meilisearch_thai_ray.sources.zipnum import zipnum_write

        t0 = time.perf_counter()
        arch_dir = (args.archive if os.path.isdir(args.archive)
                    else os.path.dirname(args.archive))
        cdx = cdx_index_warc_dir(arch_dir)
        summary = zipnum_write(cdx, args.cdx_out,
                               lines_per_block=args.zipnum_lines)
        from meilisearch_thai_ray.state.manifest import atomic_write_parquet

        atomic_write_parquet(summary,
                             os.path.join(args.cdx_out, "cluster.parquet"))
        out["cdx_s"] = round(time.perf_counter() - t0, 2)
        out["cdx_blocks"] = summary.num_rows

    if args.revisit_out:
        from meilisearch_thai_ray.sources.warc import (
            cdx_index_warc_dir, read_warc_pages, write_warc_pages_revisit)

        t0 = time.perf_counter()
        prior_cdx = (cdx_index_warc_dir(args.prior_archive)
                     if args.prior_archive else None)
        pages = read_warc_pages(args.archive)
        man = write_warc_pages_revisit(
            pages, args.revisit_out, prior_cdx, mode=args.revisit_mode,
            num_shards=args.revisit_shards,
            shard_work_dir=os.path.join(args.work, "prior_shards"))
        out["revisit_s"] = round(time.perf_counter() - t0, 2)
        out["revisit_records"] = sum(m["n_revisit"] for m in man)
        out["response_records"] = sum(m["n_response"] for m in man)
        out["revisit_bytes"] = sum(m["n_bytes"] for m in man)

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
