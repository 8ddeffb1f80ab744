"""Crawl-cycle scale proof: archive -> CDX -> ZipNum -> revisit re-crawl
at N pages (default 200,000 — the canonical scaling corpus, ~0.6 GB of
HTML), 32 CPUs, fresh session.

Evidence the sf0.1 demos cannot give: what the web-archive half of the
engine costs at real volume — archive write throughput, CDX build over
multi-hundred-file archives, the two-level index's summary:rows ratio,
random-access latency through ZipNum, and the storage a revisit re-crawl
actually saves when ~90% of pages are unchanged (the Common Crawl / IA
regime).

The corpus is the deterministic bench corpus (cached); the change rule is
url-hash arithmetic (no RNG). Prints ONE JSON line.

Usage:
    CRAWL_PAGES=200000 python scripts/scale_proof_crawl.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("CRAWL_PAGES", "200000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WORK = f"/tmp/meili_ray_bench/crawl_cycle_{N_PAGES}"


def _dir_mb(path: str) -> float:
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _d, fs in os.walk(path) for f in fs) / 2 ** 20


def main() -> None:
    import numpy as np  # noqa: F401
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
    from meilisearch_thai_ray.functions.hashing import fnv1a64
    from meilisearch_thai_ray.sources.warc import (cdx_index_warc_dir,
                                                   read_warc_record_at,
                                                   write_warc_pages,
                                                   write_warc_pages_revisit)
    from meilisearch_thai_ray.sources.zipnum import (zipnum_lookup,
                                                     zipnum_write)

    # the canonical bench corpus layout (cached across runs)
    pages_dir = f"/tmp/meili_ray_bench/pages_{N_PAGES}_L20-50"
    write_pages_parquet(pages_dir, N_PAGES, rows_per_file=2000,
                        lines_range=(20, 50), parallel=True)
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    out: dict = {"metric": f"crawl_cycle_{N_PAGES}_pages", "unit": "sec",
                 "num_cpus": NUM_CPUS}

    # ---- crawl 1: archive write
    dir_a = os.path.join(WORK, "crawl1")
    t0 = time.perf_counter()
    man_a = write_warc_pages(pages, dir_a)
    t_archive = time.perf_counter() - t0
    bytes_a = sum(m["n_bytes"] for m in man_a)
    out["archive_write_sec"] = round(t_archive, 3)
    out["archive_pages_per_sec"] = round(N_PAGES / t_archive, 1)
    out["archive_mb"] = round(bytes_a / 2 ** 20, 1)
    out["archive_files"] = len(man_a)

    # ---- CDX + ZipNum over crawl 1
    t0 = time.perf_counter()
    cdx_a = cdx_index_warc_dir(dir_a).materialize()
    t_cdx = time.perf_counter() - t0
    out["cdx_build_sec"] = round(t_cdx, 3)
    zn_dir = os.path.join(WORK, "zipnum")
    t0 = time.perf_counter()
    summary = zipnum_write(cdx_a, zn_dir, lines_per_block=3000)
    t_zn = time.perf_counter() - t0
    out["zipnum_build_sec"] = round(t_zn, 3)
    out["zipnum_blocks"] = summary.num_rows
    out["zipnum_summary_to_rows_ratio"] = round(
        summary.num_rows / N_PAGES, 6)

    # ---- random access through the two-level index (100 probes)
    urls = [r["url"] for r in cdx_a.take(5000)][::50][:100]
    from meilisearch_thai_ray.kernel.cdx import surt

    t0 = time.perf_counter()
    n_found = 0
    for u in urls:
        rows = zipnum_lookup(summary, zn_dir, surt(u))
        for r in rows:
            ru, body = read_warc_record_at(
                os.path.join(dir_a, r["filename"]), r["offset"],
                r["length"])
            n_found += int(ru == u and len(body) > 0)
    t_probe = time.perf_counter() - t0
    assert n_found == len(urls), (n_found, len(urls))
    out["zipnum_probe_ms_avg"] = round(1000 * t_probe / len(urls), 2)

    # ---- WAT companion build over crawl 1 (one streaming task per
    # archive: parse every response record with the index's link/title
    # kernels, write the metadata sibling) + read-back row count
    from meilisearch_thai_ray.sources.wat import build_wat, read_wat_pages

    wat_dir = os.path.join(WORK, "wat")
    t0 = time.perf_counter()
    man_w = build_wat(dir_a, wat_dir)
    t_wat = time.perf_counter() - t0
    n_wat = sum(m["n_records"] for m in man_w)
    assert n_wat == N_PAGES, (n_wat, N_PAGES)
    out["wat_build_sec"] = round(t_wat, 3)
    out["wat_pages_per_sec"] = round(N_PAGES / t_wat, 1)
    out["wat_mb"] = round(sum(m["n_bytes"] for m in man_w) / 2 ** 20, 1)
    t0 = time.perf_counter()
    n_rows = read_wat_pages(wat_dir).count()
    out["wat_read_sec"] = round(time.perf_counter() - t0, 3)
    assert n_rows == N_PAGES

    # ---- crawl 2: ~10% of pages change (url-hash rule), revisit sink
    def mutate(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        new = [h + b"<!-- rev2 -->" if fnv1a64(u) % 10 == 0 else h
               for u, h in zip(urls, htmls)]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(new, pa.binary())})

    pages2 = pages.map_batches(mutate, batch_format="pyarrow",
                               batch_size=1024)
    dir_b = os.path.join(WORK, "crawl2")
    t0 = time.perf_counter()
    man_b = write_warc_pages_revisit(pages2, dir_b, cdx_a)
    t_rev = time.perf_counter() - t0
    n_resp = sum(m["n_response"] for m in man_b)
    n_rev = sum(m["n_revisit"] for m in man_b)
    bytes_b = sum(m["n_bytes"] for m in man_b)
    assert n_resp + n_rev == N_PAGES
    out["recrawl_write_sec"] = round(t_rev, 3)
    out["recrawl_pages_per_sec"] = round(N_PAGES / t_rev, 1)
    out["recrawl_changed_fraction"] = round(n_resp / N_PAGES, 4)
    out["recrawl_mb"] = round(bytes_b / 2 ** 20, 1)
    out["recrawl_bytes_vs_full"] = round(bytes_b / bytes_a, 4)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
