"""Spill-mode proof under a CONSTRAINED object store (VERDICT r4 item #7).

The 1M-doc build reports zero spill because the box is large; this proof
forces the regime the explicit spill shuffle exists for — an object store
too small to hold the posting exchange — and shows the build still
completes with BYTE-IDENTICAL shard files to an unconstrained reference
build of the same corpus.

Two fresh Ray sessions (subprocesses):
  1. reference: default object store, shuffle="spill"
  2. constrained: object_store_memory = OBJ_STORE_MB (default 256 MiB —
     ~4x smaller than the ~1 GiB decoded posting exchange at 200k docs),
     shuffle="spill"
Then sha256 every shards/**.parquet in both and compare the full maps.

Usage:
    SPILL_DOCS=200000 OBJ_STORE_MB=256 python scripts/scale_proof_spill.py
Prints ONE JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SPILL_DOCS", "200000"))
OBJ_MB = int(os.environ.get("OBJ_STORE_MB", "256"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
LINES = (20, 50)
PAGES_DIR = f"/tmp/meili_ray_bench/pages_{N_DOCS}_L{LINES[0]}-{LINES[1]}"

_CHILD = r"""
import json, os, shutil, sys, time
import ray
out, pages, obj_mb, ncpu = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
kw = {}
if obj_mb:
    kw["object_store_memory"] = obj_mb << 20
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR", **kw)
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.index.build import (build_docs, compute_stats,
                                              build_shards, build_term_dict)
cfg = EngineConfig(num_shards=32)
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
docs_dir = build_docs(pages, out, cfg, batch_size=512)
meta = compute_stats(docs_dir, out, cfg)
meta["num_salts"] = 2
build_shards(docs_dir, out, cfg, meta, num_salts=2, shuffle="spill")
build_term_dict(out)
print(json.dumps({"wall_s": round(time.perf_counter() - t0, 2)}))
ray.shutdown()
"""


def _shard_hashes(out: str) -> dict[str, str]:
    hashes = {}
    root = os.path.join(out, "shards")
    for r, _d, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                with open(p, "rb") as fh:
                    hashes[os.path.relpath(p, root)] = hashlib.sha256(
                        fh.read()).hexdigest()
    return hashes


def main() -> None:
    from meilisearch_thai_ray.fixtures.pages import write_pages_parquet

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    write_pages_parquet(PAGES_DIR, N_DOCS, rows_per_file=2000,
                        lines_range=LINES, parallel=True)
    ray.shutdown()

    def run(out: str, obj_mb: int) -> dict:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, out, PAGES_DIR, str(obj_mb),
             str(NUM_CPUS)],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
            raise SystemExit(r.returncode)
        return json.loads(r.stdout.strip().splitlines()[-1])

    t0 = time.perf_counter()
    ref = run("/tmp/meili_ray_bench/spillproof_ref", 0)
    con = run("/tmp/meili_ray_bench/spillproof_con", OBJ_MB)
    h_ref = _shard_hashes("/tmp/meili_ray_bench/spillproof_ref")
    h_con = _shard_hashes("/tmp/meili_ray_bench/spillproof_con")
    identical = h_ref == h_con and len(h_ref) > 0
    print(json.dumps({
        "metric": f"spill_constrained_build_{N_DOCS}_docs",
        "value": con["wall_s"], "unit": "sec",
        "object_store_mb": OBJ_MB,
        "reference_wall_s": ref["wall_s"],
        "constrained_wall_s": con["wall_s"],
        "n_shard_files": len(h_ref),
        "shards_byte_identical": identical,
        "total_wall_s": round(time.perf_counter() - t0, 2),
        "num_cpus": NUM_CPUS,
    }))
    if not identical:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
