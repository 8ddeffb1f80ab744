"""Web link-graph queries: planted-link pages -> kernel extraction ->
host edges / anchor aggregation / host PageRank / doc authority prior.

The reference has no link analysis (its pages arrive as pre-extracted
title/content — src/tokenizer/*); a web-scale engine needs the hyperlink
family, so this module plants a DETERMINISTIC, integer-arithmetic link
structure into rendered HTML (no RNG — every target derives from doc_id
with *, +, % only) and verifies the full round trip against DuckDB: the
SQL oracle recomputes the planted structure arithmetically, so a hash
match proves render -> kernel extraction -> host aggregation is exact.

Planted-link rules (shared verbatim by the SQL strings below):
  page url    https://site{doc_id % 101}.example.th/p/{doc_id:08d}
  out-degree  k = 2 + (doc_id * 7919) % 5              (2..6 links)
  target      t_j = (doc_id * 1000003 + j * 524287) % 100000, j in [0,k)
  dst host    site{t % 11} if j odd else site{t % 101}  (odd j skews
              mass onto hosts 0..10 -> differentiated PageRank)
  link path   /l/{t:08d}  (disjoint from /p/ -> a planted link can never
              be a self-URL, so the kernel's self-link drop is inert here
              and the SQL needs no equality carve-out)
  anchor      w{t % 997}
  href form   j%3==0 absolute+#fragment, j%3==1 absolute,
              j%3==2 scheme-relative (//host/path)
Each page also carries a mailto: link, an href-less <a name=...>, and a
commented-out <a> — all dropped by kernel/links.py rules, all absent
from the SQL, so the decoys are part of what the hash verifies.

Scale shapes: link planting + extraction are per-page map_batches (HTML
work is inherently per-doc); host edges and anchor counts combine per
batch before ONE bounded groupby (hosts and anchors are categorical —
the shuffle moves count rows, never HTML); PageRank runs on the
sort-once exchange (stages/graph.py) at host cardinality.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.documents import read_parquet_clean
from ..stages.link_graph import (host_edges, host_pagerank, pages_to_links)

N_HOSTS = 101  # page hosts site0..site100; odd-j links target site0..10


def _planted_links(doc_id: int) -> list[tuple[int, int, int]]:
    """[(j, t, dst_host_idx)] for one page — the ONE rule set (module
    docstring); the SQL oracles restate it arithmetically."""
    k = 2 + (doc_id * 7919) % 5
    out = []
    for j in range(k):
        t = (doc_id * 1000003 + j * 524287) % 100000
        dst = t % 11 if j % 2 == 1 else t % N_HOSTS
        out.append((j, t, dst))
    return out


def _page_html(doc_id: int, title: str) -> bytes:
    parts = [f"<html><head><title>{_html.escape(title)}</title></head>",
             "<body><!-- <a href=\"https://decoy.example.th/x\">spam</a> -->",
             f"<h1>{_html.escape(title)}</h1><p class=\"links\">"]
    for j, t, dst in _planted_links(doc_id):
        if j % 3 == 0:
            href = f"https://site{dst}.example.th/l/{t:08d}#sec{j}"
        elif j % 3 == 1:
            href = f"https://site{dst}.example.th/l/{t:08d}"
        else:
            href = f"//site{dst}.example.th/l/{t:08d}"
        parts.append(f"<a href=\"{href}\">w{t % 997}</a> ")
    parts.append("<a href=\"mailto:ops@example.th\">mail</a>"
                 "<a name=\"top\">anchorless</a></p></body></html>")
    return "".join(parts).encode("utf-8")


def _docs_to_linked_pages(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    return pa.table({
        "url": pa.array(
            [f"https://site{d % N_HOSTS}.example.th/p/{d:08d}"
             for d in ids], pa.string()),
        "html": pa.array([_page_html(d, f"doc {d}") for d in ids],
                         pa.binary()),
        "doc_id": batch["doc_id"],
    })


def _linked_pages(sf_dir: str) -> ray.data.Dataset:
    import os

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(_docs_to_linked_pages, batch_format="pyarrow",
                  batch_size=1024)


def _links(sf_dir: str) -> ray.data.Dataset:
    return _linked_pages(sf_dir).map_batches(
        pages_to_links, batch_format="pyarrow", batch_size=256)


def host_edges_query(sf_dir: str) -> ray.data.Dataset:
    """W1 — weighted host-level link graph from planted-link pages
    (render -> kernel extraction -> combiner partials -> ONE bounded
    groupby). SQL-verified: the oracle regenerates the planted edges
    arithmetically from the documents view."""
    return host_edges(_links(sf_dir))


def anchor_host_terms(sf_dir: str) -> ray.data.Dataset:
    """W2 — anchor-text aggregation per destination host: (dst_host,
    anchor, cnt) — the signal web search folds into the target page's
    searchable fields (anchor text describes the TARGET). Combiner
    partials + ONE bounded groupby; anchors never ride a shuffle as part
    of HTML."""
    from ..stages.url_filter import url_host

    def partial(batch: pa.Table) -> pa.Table:
        hosts = np.array([url_host(u) for u in batch["dst_url"].to_pylist()],
                         dtype=object)
        anchors = np.array(batch["anchor"].to_pylist(), dtype=object)
        if not hosts.size:
            return pa.table({"dst_host": pa.array([], pa.string()),
                             "anchor": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        # a hostname cannot contain a space -> the joined key is an
        # unambiguous (host, anchor) encoding; return_index points back
        # at the original columns, so anchors are never re-parsed
        pair = np.array([h + " " + a for h, a in zip(hosts, anchors)])
        u, idx, c = np.unique(pair, return_index=True, return_counts=True)
        return pa.table({
            "dst_host": pa.array(hosts[idx], pa.string()),
            "anchor": pa.array(anchors[idx], pa.string()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
        })

    return (_links(sf_dir)
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["dst_host", "anchor"]).sum("cnt")
            .map_batches(lambda b: pa.table({
                "dst_host": b["dst_host"], "anchor": b["anchor"],
                "cnt": b["sum(cnt)"]}), batch_format="pyarrow"))


def doc_authority(sf_dir: str) -> ray.data.Dataset:
    """W3 — in-link authority prior joined back onto documents: each
    doc carries its host's total in-link weight (the non-iterative
    authority signal; g3 is the PageRank refinement). The host->weight
    map is host-cardinality and broadcast ONCE (ray.put), never
    re-shipped per batch."""
    import ray as _ray

    from ray.data.aggregate import Sum

    in_w = (host_edges_query(sf_dir)
            .groupby("dst_host").aggregate(Sum("w", alias_name="in_w")))
    wmap_ref = _ray.put({r["dst_host"]: int(r["in_w"])
                         for r in in_w.take_all()})

    def attach(batch: pa.Table) -> pa.Table:
        wmap = _ray.get(wmap_ref)
        ids = batch["doc_id"].to_pylist()
        hosts = [f"site{d % N_HOSTS}.example.th" for d in ids]
        return pa.table({
            "doc_id": batch["doc_id"],
            "host": pa.array(hosts, pa.string()),
            "in_w": pa.array([wmap.get(h, 0) for h in hosts], pa.int64()),
        })

    import os

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(attach, batch_format="pyarrow", batch_size=65536)


def host_pagerank_query(sf_dir: str, n_iter: int = 5,
                        damping: float = 0.85) -> ray.data.Dataset:
    """G3 — PageRank over the planted host link graph (rows-only:
    iterative, not SQL-expressible; numpy power-iteration parity is
    pytest-asserted in test_link_graph.py). Hosts 0..10 absorb the odd-j
    link mass, so the rank separates rather than collapsing to 1/n."""
    return host_pagerank(host_edges_query(sf_dir), n_iter=n_iter,
                         damping=damping)


REPUTATION_BLOCK_NUM = 3  # blocked iff pass_rate < 3/10
_REP_LANE = 1 << 32


def host_reputation(sf_dir: str) -> pa.Table:
    """W9 — host-level reputation from document quality (the
    RefinedWeb-style aggregation that turns per-doc filters into a host
    blocklist consumable by `stages/url_filter.HostRules`): per host,
    doc count, Gopher-pass count (the ONE shared rule impl,
    corpus_stats.gopher_with_verdict), pass rate, and a blocked verdict
    decided in INTEGER arithmetic (n_pass * 10 < 3 * n_docs) so Ray and
    SQL agree exactly.

    Scale shape: per-batch combiner packs (n_pass, n_docs) per host into
    disjoint int64 lanes (both counts << 2^31 per partial — carry-free,
    the q20 convention) so BOTH sums ride ONE sum_by_int_key combine at
    host cardinality; text never leaves its scan task."""
    import os

    import polars as pl

    from ..stages.runs import sum_by_int_key
    from .corpus_stats import gopher_with_verdict

    def partial(batch: pa.Table) -> pa.Table:
        df = gopher_with_verdict(pl.from_arrow(batch))
        ids = df["doc_id"].to_numpy()
        passes = df["passes_gopher"].to_numpy().astype(np.int64)
        host = (ids % N_HOSTS).astype(np.int64)
        u, inv = np.unique(host, return_inverse=True)
        packed = passes * _REP_LANE + 1
        return pa.table({
            "host_idx": pa.array(u, pa.int64()),
            "packed": pa.array(np.bincount(
                inv, weights=packed).astype(np.int64), pa.int64()),
        })

    combined = sum_by_int_key(
        read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        "host_idx", "packed", out_col="packed_sum").take_all()
    combined.sort(key=lambda r: r["host_idx"])
    hosts, nd, npass, rate, blocked = [], [], [], [], []
    for r in combined:
        p, n = divmod(int(r["packed_sum"]), _REP_LANE)
        hosts.append(f"site{int(r['host_idx'])}.example.th")
        nd.append(n)
        npass.append(p)
        rate.append(round(p / n, 6))
        blocked.append(p * 10 < REPUTATION_BLOCK_NUM * n)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_pass": pa.array(npass, pa.int64()),
        "pass_rate": pa.array(rate, pa.float64()),
        "blocked": pa.array(blocked, pa.bool_()),
    })


def main_content(sf_dir: str) -> ray.data.Dataset:
    """W8 — boilerplate removal round trip: each document's text renders
    into a REALISTICALLY noisy page (head+title, <header> chrome with
    the h1, a <nav> link list, the body as one <p> per line, a pure-link
    "related" div, an <aside> link farm, a <footer>) and
    kernel/boilerplate.py must recover EXACTLY the planted body — the
    SQL oracle is simply `SELECT doc_id, text FROM documents`, so the
    hash match proves chrome removal + link-density filtering drop ALL
    the junk and NONE of the prose.

    Scale shape: render and extract are stateless per-batch maps (HTML
    work is per-doc); nothing shuffles."""
    import os

    from ..kernel.boilerplate import extract_main_text

    def render_and_extract(batch: pa.Table) -> pa.Table:
        out = []
        for d, text in zip(batch["doc_id"].to_pylist(),
                           batch["text"].to_pylist()):
            body = "".join(f"<p>{_html.escape(ln)}</p>"
                           for ln in text.split("\n"))
            nav = "".join(f'<a href="/s/{i}">sec {i}</a>'
                          for i in range(1 + d % 4))
            farm = "".join(f'<a href="/l/{(d + i) % 97}">w{(d + i) % 97}'
                           f'</a>' for i in range(3))
            page = (f"<html><head><title>doc {d}</title>"
                    f'<style>p {{margin:0}}</style></head>'
                    f"<body><header><h1>doc {d}</h1><nav>{nav}</nav>"
                    f"</header><!-- chrome ends -->"
                    f"<article>{body}</article>"
                    f'<div class="related">{farm}</div>'
                    f"<aside>{farm}</aside>"
                    f"<footer><a href=\"/about\">about</a> · "
                    f"<a href=\"/tos\">terms</a></footer></body></html>")
            out.append(extract_main_text(page.encode("utf-8")))
        return pa.table({
            "doc_id": batch["doc_id"],
            "main_text": pa.array(out, pa.string()),
        })

    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    ).map_batches(render_and_extract, batch_format="pyarrow",
                  batch_size=1024)


ANCHOR_CAP = 16  # first N distinct anchors per target (hot-page bound)


def _enrich_page_html(d: int, n_docs: int) -> bytes:
    """Page d's HTML whose links point at REAL pages of the same corpus:
    j < 1 + (d*13)%3 links, target (d*53 + j*17 + 1) % n_docs, anchor
    a{(d*11)%499} (describes the SOURCE — anchor text is the linker's
    words about the target). A link that resolves to d itself is the
    kernel's self-link case (dropped; the SQL excludes tgt = src)."""
    parts = [f"<html><head><title>d{d}</title></head><body>"]
    k = 1 + (d * 13) % 3
    for j in range(k):
        tgt = (d * 53 + j * 17 + 1) % n_docs
        href = f"https://site{tgt % N_HOSTS}.example.th/p/{tgt:08d}"
        parts.append(f'<a href="{href}">a{(d * 11) % 499}</a> ')
    parts.append('<a href="mailto:x@example.th">m</a></body></html>')
    return "".join(parts).encode("utf-8")


def anchor_enrich(sf_dir: str, cap: int = ANCHOR_CAP) -> pa.Table:
    """W7 — anchor-text enrichment join: aggregate what OTHER pages say
    about each page (first `cap` distinct in-link anchors, sorted) onto
    the target's doc_id — the field web search indexes alongside the
    page's own text (BM25F's anchor stream). Planted arithmetic links to
    REAL pages keep it SQL-verifiable end to end (render -> kernel
    extraction -> keys-only aggregation).

    Scale shape: anchors ride as (tgt:int64, anchor) KEY rows — never
    attached to HTML; ONE sort by (tgt, anchor) makes duplicates
    adjacent (dedup inline) and runs contiguous; interior runs resolve
    with Arrow's C++ grouped list-join per block; only each block's
    first/last runs (<= 2*cap rows per block after capping) merge on the
    driver — the a22_event_paths contract. Per-target state is bounded
    by `cap`, so a hot page (huge in-degree) cannot blow up a task."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows

    def render(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array(
                [f"https://site{d % N_HOSTS}.example.th/p/{d:08d}"
                 for d in ids], pa.string()),
            "html": pa.array([_enrich_page_html(d, n_docs) for d in ids],
                             pa.binary()),
        })

    def pairs(batch: pa.Table) -> pa.Table:
        tgt = [int(u[-8:]) for u in batch["dst_url"].to_pylist()]
        return pa.table({
            "tgt": pa.array(tgt, pa.int64()),
            "anchor": batch["anchor"],
        })

    def finish(t: pa.Table) -> pa.Table:
        g = (t.group_by("tgt", use_threads=False)
             .aggregate([("anchor", "list"), ("anchor", "count")]))
        return pa.table({
            "doc_id": g["tgt"].cast(pa.int64()),
            "anchors": pc.binary_join(
                g["anchor_list"].cast(pa.list_(pa.string())), " "),
            "n_anchors": g["anchor_count"].cast(pa.int64())})

    def block_agg(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "tgt": pa.array([], pa.int64()),
            "anchor": pa.array([], pa.string()),
            "anchors": pa.array([], pa.string()),
            "n_anchors": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        t = batch["tgt"].to_numpy(zero_copy_only=False)
        a = np.array(batch["anchor"].to_pylist(), dtype=object)
        keep = np.r_[True, (t[1:] != t[:-1]) | (a[1:] != a[:-1])]
        batch = batch.filter(pa.array(keep))
        t = t[keep]
        new = np.r_[True, t[1:] != t[:-1]]
        rid = np.cumsum(new) - 1
        pos = np.arange(t.size) - np.flatnonzero(new)[rid]
        edge = (rid == 0) | (rid == rid[-1])
        capped = pos < cap
        fin = finish(batch.filter(pa.array(~edge & capped)))
        n = fin.num_rows
        inter = pa.table({
            "partial": pa.array(np.zeros(n, bool)),
            "tgt": fin["doc_id"],
            "anchor": pa.array([""] * n, pa.string()),
            "anchors": fin["anchors"],
            "n_anchors": fin["n_anchors"]})
        raw = batch.filter(pa.array(edge & capped))
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "tgt": raw["tgt"],
            "anchor": raw["anchor"],
            "anchors": pa.array([""] * raw.num_rows, pa.string()),
            "n_anchors": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    links = (read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(render, batch_format="pyarrow", batch_size=1024)
        .map_batches(pages_to_links, batch_format="pyarrow", batch_size=256)
        .map_batches(pairs, batch_format="pyarrow", batch_size=65536))
    seg = (links.sort(["tgt", "anchor"])
           .map_batches(block_agg, batch_format="pyarrow", batch_size=None))
    done: list[pa.Table] = []
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        if it.num_rows:
            done.append(it.select(["tgt", "anchors", "n_anchors"])
                        .rename_columns(["doc_id", "anchors", "n_anchors"]))
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(bb.select(["tgt", "anchor"]))
    if bound:  # <= 2*cap rows per block: bounded driver merge
        bt = pa.concat_tables(bound)
        t = bt["tgt"].to_numpy(zero_copy_only=False)
        a = np.array(bt["anchor"].to_pylist(), dtype=object)
        order = np.lexsort((a, t))
        t, a = t[order], a[order]
        keep = np.r_[True, (t[1:] != t[:-1]) | (a[1:] != a[:-1])]
        t, a = t[keep], a[keep]
        new = np.r_[True, t[1:] != t[:-1]]
        rid = np.cumsum(new) - 1
        pos = np.arange(t.size) - np.flatnonzero(new)[rid]
        m = pos < cap
        done.append(finish(pa.table({
            "tgt": pa.array(t[m], pa.int64()),
            "anchor": pa.array(a[m], pa.string())})))
    out = pa.concat_tables(done) if done else pa.table({
        "doc_id": pa.array([], pa.int64()),
        "anchors": pa.array([], pa.string()),
        "n_anchors": pa.array([], pa.int64())})
    order = np.argsort(out["doc_id"].to_numpy(zero_copy_only=False),
                       kind="stable")
    return out.take(pa.array(order))


FRONTIER_PER_HOST = 3  # binds at the test scales (~5 docs/host)


def crawl_frontier(sf_dir: str, per_host: int = FRONTIER_PER_HOST
                   ) -> pa.Table:
    """W6 — politeness-aware crawl-frontier schedule: cap each host at
    `per_host` candidates (top priority), then interleave hosts
    round-robin by within-host rank so no host is fetched twice before
    every host's next-best candidate (the standard frontier shape —
    per-host queues drained breadth-first).

    Scale shape: a per-batch vectorized partial top-B per host (lexsort
    + run-position scan keeps <= B rows per host PER BATCH — the only
    rows that can survive the final cut) -> ONE groupby(host) over
    host-cardinality-bounded survivors -> the interleave runs on the
    driver over <= hosts x B rows. Priority is planted arithmetically
    ((doc_id * 31) % 100) so the schedule is SQL-expressible as two
    window functions."""
    import os

    def partial_topb(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        host = ids % N_HOSTS
        prio = (ids * 31) % 100
        order = np.lexsort((ids, -prio, host))
        h = host[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        pos = np.arange(h.size) - np.repeat(starts, np.diff(
            np.concatenate((starts, [h.size]))))
        keep = order[pos < per_host]
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "host_idx": pa.array(host[keep], pa.int64()),
            "priority": pa.array(prio[keep], pa.int64()),
        })

    def final_topb(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        prio = group["priority"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -prio))[:per_host]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "host_idx": group["host_idx"].take(pa.array(order)),
            "priority": pa.array(prio[order], pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
        })

    rows = (read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(partial_topb, batch_format="pyarrow",
                     batch_size=65536)
        .groupby("host_idx")
        .map_groups(final_topb, batch_format="pyarrow")
        .take_all())
    rows.sort(key=lambda r: (r["rank"], -r["priority"], r["doc_id"]))
    return pa.table({
        "fetch_pos": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "host": pa.array([f"site{r['host_idx']}.example.th" for r in rows],
                         pa.string()),
        "priority": pa.array([r["priority"] for r in rows], pa.int64()),
        "rank": pa.array([r["rank"] for r in rows], pa.int64()),
    })


def frontier_timed_schedule(sf_dir: str, per_host: int = FRONTIER_PER_HOST
                            ) -> pa.Table:
    """W10 — Crawl-delay-aware frontier schedule: each host advertises a
    per-request delay (planted arithmetically: (host_idx % 4) + 1 seconds,
    the robots.txt Crawl-delay convention), and a host's i-th candidate is
    fetched at i * delay. Unlike w6's round-robin interleave (uniform
    politeness), the timed schedule lets fast hosts drain ahead of slow
    ones while never violating any single host's spacing — the shape real
    fetch schedulers (Heritrix politeness queues) run.

    Same scale shape as crawl_frontier: per-batch vectorized partial top-B
    per host -> ONE host-bounded groupby -> <= hosts x B rows sort on the
    driver. fetch_at is integer seconds (rank * delay) so the schedule is
    integer-exact and SQL-expressible as one window function."""
    import os

    def partial_topb(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        host = ids % N_HOSTS
        prio = (ids * 31) % 100
        order = np.lexsort((ids, -prio, host))
        h = host[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        pos = np.arange(h.size) - np.repeat(starts, np.diff(
            np.concatenate((starts, [h.size]))))
        keep = order[pos < per_host]
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "host_idx": pa.array(host[keep], pa.int64()),
            "priority": pa.array(prio[keep], pa.int64()),
        })

    def final_schedule(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        prio = group["priority"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -prio))[:per_host]
        delay = int(ids[0] % N_HOSTS % 4) + 1
        ranks = np.arange(order.size, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "host_idx": group["host_idx"].take(pa.array(order)),
            "priority": pa.array(prio[order], pa.int64()),
            "fetch_at": pa.array(ranks * delay, pa.int64()),
        })

    rows = (read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(partial_topb, batch_format="pyarrow",
                     batch_size=65536)
        .groupby("host_idx")
        .map_groups(final_schedule, batch_format="pyarrow")
        .take_all())
    rows.sort(key=lambda r: (r["fetch_at"], r["host_idx"], r["doc_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "host_idx": pa.array([r["host_idx"] for r in rows], pa.int64()),
        "priority": pa.array([r["priority"] for r in rows], pa.int64()),
        "fetch_at": pa.array([r["fetch_at"] for r in rows], pa.int64()),
    })


SITEMAP_MAX_URLS = 50_000  # sitemaps.org protocol cap per file


def sitemap_urls(sf_dir: str,
                 max_per_file: int = SITEMAP_MAX_URLS) -> ray.data.Dataset:
    """W5 — distributed sitemap render -> parse round trip: each host's
    page list renders as REAL sitemaps.org XML (lastmod and priority
    planted arithmetically from doc_id), then kernel/sitemap.py parses
    the XML back to (url, lastmod, priority) rows; the SQL oracle
    regenerates the same rows arithmetically, so a hash match proves the
    render -> parse cycle is lossless.

    Scale shape: ONE groupby(host) whose groups are bounded BY PROTOCOL —
    a sitemap file caps at `max_per_file` urls (50k per the spec), so an
    oversized host renders SHARDED urlset files plus a <sitemapindex>
    naming them, and the parse stage follows the index to its children
    (tests exercise this with max_per_file=3); parsing is a stateless
    per-batch flat map."""
    import datetime
    import os

    from ..kernel.sitemap import parse_sitemap, render_sitemap

    epoch = datetime.date(1995, 1, 1)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "host_idx": pa.array([d % N_HOSTS for d in ids], pa.int64()),
            "doc_id": batch["doc_id"],
        })

    def render_group(group: pa.Table) -> pa.Table:
        """One host -> its sitemap FILE SET: a single urlset when it
        fits, else sharded urlsets + the sitemapindex that names them
        (all files ride one row each; the host's file count is
        ceil(n/max_per_file) + 1, bounded by protocol)."""
        h = group["host_idx"][0].as_py()
        ids = sorted(group["doc_id"].to_pylist())
        entries = [
            (f"https://site{h}.example.th/p/{d:08d}",
             (epoch + datetime.timedelta(days=d % 1000)).isoformat(),
             (d % 10 + 1) / 10.0)
            for d in ids]
        if len(entries) <= max_per_file:
            files = {f"https://site{h}.example.th/sitemap.xml":
                     render_sitemap(entries)}
        else:
            files = {}
            locs = []
            for s, lo in enumerate(range(0, len(entries), max_per_file)):
                loc = f"https://site{h}.example.th/sitemap-{s}.xml"
                files[loc] = render_sitemap(entries[lo:lo + max_per_file])
                locs.append(loc)
            files[f"https://site{h}.example.th/sitemap.xml"] = (
                '<?xml version="1.0" encoding="UTF-8"?><sitemapindex>'
                + "".join(f"<sitemap><loc>{loc}</loc></sitemap>"
                          for loc in locs) + "</sitemapindex>")
        return pa.table({
            "loc": pa.array(list(files), pa.string()),
            "xml": pa.array(list(files.values()), pa.string()),
        })

    def parse_batch(batch: pa.Table) -> pa.Table:
        """Parse urlset files; an index file contributes nothing itself —
        its children arrive as their own rows (same file set), so
        following the index is a membership check, not a fetch."""
        urls, mods, prios = [], [], []
        for xml in batch["xml"].to_pylist():
            kind, rows = parse_sitemap(xml)
            if kind == "index":
                continue
            for loc, lastmod, prio in rows:
                urls.append(loc)
                mods.append(lastmod)
                prios.append(prio)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "priority": pa.array(prios, pa.float64()),
        })

    return (read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(keyed, batch_format="pyarrow", batch_size=65536)
        .groupby("host_idx")
        .map_groups(render_group, batch_format="pyarrow")
        .map_batches(parse_batch, batch_format="pyarrow", batch_size=32))


ROBOTS_AGENT = "graftbot"


def _planted_robots(h: int) -> str:
    """robots.txt text for host index h — four arithmetic rule families
    chosen to exercise every REP decision path (agent-group precedence,
    longest-match, Allow-wins-ties, * and $ wildcards), plus decoys
    (comments, an otherbot group, Crawl-delay/Sitemap directives) the
    parser must ignore. The SQL oracle restates the resulting
    ALLOW/DENY decision for /p/ paths as a CASE over the same
    arithmetic (module docstring rules; decision table in the w4 SQL)."""
    parts = ["# planted robots for site%d\n" % h,
             "User-agent: otherbot\nDisallow: /\n\n",
             "Sitemap: https://site%d.example.th/sitemap.xml\n" % h]
    if h % 5 == 2:
        parts.append(f"User-agent: {ROBOTS_AGENT}\nAllow: /\n\n")
    if h % 3 == 0:
        parts.append("User-agent: *\nDisallow: /p/\nCrawl-delay: 2\n\n")
    if h % 4 == 1:
        parts.append("User-agent: *\nDisallow: /\nAllow: /p/\n\n")
    if h % 7 == 3:
        parts.append("User-agent: *\nDisallow: /p/*4$\n\n")
    # extra sitemap shards for w14 discovery (h % 3 of them, mixed-case key
    # + a commented decoy) — appended AFTER every group so they cannot
    # perturb the UA-run grouping the w4 decision table verifies
    parts.append("# sitemap: https://decoy.example.th/no.xml\n")
    for i in range(1, h % 3 + 1):
        parts.append(
            f"sitemap: https://site{h}.example.th/sitemap{i}.xml.gz\n")
    return "".join(parts)


def robots_filter(sf_dir: str) -> ray.data.Dataset:
    """W4 — robots-gated page set: planted per-host robots.txt rendered
    as REAL text, parsed by kernel/robots.py (RFC 9309 longest-match
    semantics), applied by the broadcast `RobotsGate` stage; the SQL
    oracle recomputes the planted decisions arithmetically, so a hash
    match verifies the render -> parse -> decide round trip.

    Scale shape: the robots map is host-cardinality (broadcast ONCE,
    parsed once per worker in RobotsGate.__init__); the page scan is a
    streaming filter — no shuffle at all."""
    import ray as _ray

    from ..stages.url_filter import RobotsGate, url_host

    robots_ref = _ray.put({f"site{h}.example.th": _planted_robots(h)
                           for h in range(N_HOSTS)})

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "host": pa.array([url_host(u)
                              for u in batch["url"].to_pylist()],
                             pa.string()),
        })

    import os

    def urls_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array(
                [f"https://site{d % N_HOSTS}.example.th/p/{d:08d}"
                 for d in ids], pa.string()),
            "doc_id": batch["doc_id"],
        })

    return (read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
            .map_batches(urls_only, batch_format="pyarrow",
                         batch_size=65536)
            .map_batches(RobotsGate, batch_format="pyarrow",
                         batch_size=4096,
                         fn_constructor_args=(robots_ref, ROBOTS_AGENT),
                         concurrency=4)
            .map_batches(emit, batch_format="pyarrow", batch_size=65536))


# The shared planted-link CTE: j unrolled via range(6) with the same
# out-degree gate; every arithmetic term mirrors _planted_links verbatim.
_LINKS_CTE = """
WITH l AS (
  SELECT d.doc_id,
         r.j,
         (d.doc_id * 1000003 + r.j * 524287) % 100000 AS t
  FROM documents d, range(0, 6) r(j)
  WHERE r.j < 2 + (d.doc_id * 7919) % 5
), e AS (
  SELECT 'site' || (doc_id % 101) || '.example.th' AS src_host,
         'site' || (CASE WHEN j % 2 = 1 THEN t % 11
                         ELSE t % 101 END) || '.example.th' AS dst_host,
         'w' || (t % 997) AS anchor
  FROM l
)
"""

SQL: dict[str, str] = {
    "w1_host_edges": _LINKS_CTE + """
SELECT src_host, dst_host, count(*) AS w
FROM e WHERE src_host <> dst_host
GROUP BY src_host, dst_host
ORDER BY src_host, dst_host
""",
    "w2_anchor_host_terms": _LINKS_CTE + """
SELECT dst_host, anchor, count(*) AS cnt
FROM e GROUP BY dst_host, anchor
ORDER BY dst_host, anchor
""",
    "w8_main_content": """
SELECT doc_id, text AS main_text FROM documents ORDER BY doc_id
""",
    "w7_anchor_enrich": f"""
WITH l AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 53 + r.j * 17 + 1) %
             (SELECT count(*) FROM documents) AS tgt
  FROM documents d, range(0, 3) r(j)
  WHERE r.j < 1 + (d.doc_id * 13) % 3
), e AS (
  SELECT DISTINCT tgt, 'a' || ((src * 11) % 499) AS anchor
  FROM l WHERE tgt <> src
), c AS (
  SELECT tgt, anchor,
         row_number() OVER (PARTITION BY tgt ORDER BY anchor) AS rn
  FROM e
)
SELECT CAST(tgt AS BIGINT) AS doc_id,
       string_agg(anchor, ' ' ORDER BY anchor) AS anchors,
       CAST(count(*) AS BIGINT) AS n_anchors
FROM c WHERE rn <= {ANCHOR_CAP}
GROUP BY tgt ORDER BY doc_id
""",
    "w6_crawl_frontier": f"""
WITH c AS (
  SELECT doc_id,
         'site' || (doc_id % 101) || '.example.th' AS host,
         (doc_id * 31) % 100 AS priority
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY host
                               ORDER BY priority DESC, doc_id) AS rank
  FROM c
)
SELECT CAST(row_number() OVER (ORDER BY rank, priority DESC, doc_id)
            AS BIGINT) AS fetch_pos,
       doc_id, host, CAST(priority AS BIGINT) AS priority,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {FRONTIER_PER_HOST}
ORDER BY fetch_pos
""",
    "w5_sitemap_urls": """
SELECT 'https://site' || (doc_id % 101) || '.example.th/p/' ||
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
       strftime(CAST(DATE '1995-01-01' + (doc_id % 1000) * INTERVAL 1 DAY
                     AS DATE), '%Y-%m-%d') AS lastmod,
       (doc_id % 10 + 1) / 10.0 AS priority
FROM documents
ORDER BY url
""",
    # the REP decision table for /p/ paths under _planted_robots, in
    # kernel precedence order: agent-specific group wins outright; then
    # the longest star rule ('/p/*4$', len 7) -> deny; then Allow '/p/'
    # (len 3, ties-and-beats Disallow '/p/' and beats Disallow '/');
    # then Disallow '/p/'; default allow
    "w4_robots_filter": """
SELECT doc_id,
       'site' || (doc_id % 101) || '.example.th' AS host
FROM documents
WHERE CASE WHEN (doc_id % 101) % 5 = 2 THEN TRUE
           WHEN (doc_id % 101) % 7 = 3 AND doc_id % 10 = 4 THEN FALSE
           WHEN (doc_id % 101) % 4 = 1 THEN TRUE
           WHEN (doc_id % 101) % 3 = 0 THEN FALSE
           ELSE TRUE END
ORDER BY doc_id
""",
    "w3_doc_authority": _LINKS_CTE + """
SELECT d.doc_id,
       'site' || (d.doc_id % 101) || '.example.th' AS host,
       coalesce(iw.in_w, 0) AS in_w
FROM documents d
LEFT JOIN (SELECT dst_host, count(*) AS in_w
           FROM e WHERE src_host <> dst_host
           GROUP BY dst_host) iw
  ON iw.dst_host = 'site' || (d.doc_id % 101) || '.example.th'
ORDER BY d.doc_id
""",
}


# w9 composes the m26 Gopher SQL as a subquery (the m30 convention) so the
# label rule lives in exactly ONE SQL string too.
from .corpus_stats import SQL as _STATS_SQL  # noqa: E402

SQL["w9_host_reputation"] = f"""
SELECT 'site' || (doc_id % 101) || '.example.th' AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN passes_gopher THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass,
       round(sum(CASE WHEN passes_gopher THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS pass_rate,
       (sum(CASE WHEN passes_gopher THEN 1 ELSE 0 END) * 10
        < {REPUTATION_BLOCK_NUM} * count(*)) AS blocked
FROM ({_STATS_SQL["m26_gopher_rules"]})
GROUP BY doc_id % 101
ORDER BY host
"""


SQL["w10_frontier_timed"] = f"""
WITH ranked AS (
  SELECT doc_id, doc_id % {N_HOSTS} AS host_idx,
         (doc_id * 31) % 100 AS priority,
         row_number() OVER (PARTITION BY doc_id % {N_HOSTS}
                            ORDER BY (doc_id * 31) % 100 DESC, doc_id) - 1
           AS r
  FROM documents
)
SELECT doc_id, host_idx, priority,
       CAST(r * ((host_idx % 4) + 1) AS BIGINT) AS fetch_at
FROM ranked WHERE r < {FRONTIER_PER_HOST}
"""


# ---------------------------------------------------------------------------
# W11 — change-rate-aware recrawl priority (Cho & Garcia-Molina, ACM TOIT
# 2003, "Estimating Frequency of Change": the incomplete-change-observation
# estimator lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) over n observed
# intervals with X detected changes). A continuous crawl cannot afford to
# re-fetch everything; it re-fetches by EXPECTED STALENESS, estimated from
# the digest history the CDX index already stores (sources/warc.py). The
# reference has no crawler at all — this is the scheduling half a web-scale
# deployment needs on top of w6/w10's politeness ordering.
#
# Planted capture history (k = 4 snapshots, restated by the SQL oracle):
#   changed(doc, s)  s in 1..3:  (doc_id * P_s) % 7 < 3, P = (2, 3, 5)
#     (the multipliers are NOT congruent mod 7, so X spans 0..3: d%7==2
#      never changes, d%7==0 changes every interval — a degenerate rule
#      like (d*13+s)%3==0 fires exactly once for EVERY doc)
#   digest_h(doc, s) = doc_id * 1000003 + #changes fired up to s
#   age(doc)         = doc_id % 5 + 1    (crawls since last fetch)
#
# Scale shape: each snapshot is generated as its OWN stream (a real archive
# stores one CDX per crawl — rows for the same url live in different files,
# so comparing consecutive digests genuinely requires an exchange). The
# lag() is expressed as a SHIFTED-KEY pair combine: every history row
# enters twice, as (doc*4 + s, +digest) and (doc*4 + s + 1, -digest); after
# ONE sum_by_int_key, a pair key's sum is zero iff the page did not change
# across that interval. Change counts then ride a second (3-rows-per-doc)
# sum_by_int_key. Nothing wide ever carries text; both combines move
# O(docs * k) int64 rows.

RECRAWL_SNAPSHOTS = 4  # k: snapshots 0..3 -> n = k-1 observed intervals
RECRAWL_MULT = {1: 2, 2: 3, 3: 5}  # per-interval change-rule multipliers


def _history_digests(ids: np.ndarray, s: int) -> np.ndarray:
    """Planted digest_h for snapshot s (vectorized; the ONE rule set)."""
    cc = np.zeros(ids.size, dtype=np.int64)
    for i in range(1, s + 1):
        cc += ((ids * RECRAWL_MULT[i]) % 7 < 3).astype(np.int64)
    return ids * 1000003 + cc


def _doc_change_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_changes) over the planted k-snapshot history: per-pair
    digest diff rows -> ONE keyed sum detects changes -> ONE keyed sum
    counts them per doc. Shared by w11 (per-doc Poisson priority) and
    w15 (per-host staleness rollup)."""
    import os

    from ..stages.runs import sum_by_int_key

    k = RECRAWL_SNAPSHOTS
    path = os.path.join(sf_dir, "documents.parquet")

    def snapshot_rows(s: int):
        def _emit(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            dig = _history_digests(ids, s)
            keys, vals = [], []
            if s >= 1:            # this snapshot as the CURRENT side
                keys.append(ids * k + s)
                vals.append(dig)
            if s + 1 <= k - 1:    # this snapshot as the PREVIOUS side
                keys.append(ids * k + s + 1)
                vals.append(-dig)
            return pa.table({
                "pair_key": pa.array(np.concatenate(keys), pa.int64()),
                "sdig": pa.array(np.concatenate(vals), pa.int64()),
            })
        return read_parquet_clean(path, columns=["doc_id"]).map_batches(
            _emit, batch_format="pyarrow", batch_size=65536)

    streams = [snapshot_rows(s) for s in range(k)]
    hist = streams[0].union(*streams[1:])
    diff = sum_by_int_key(hist, "pair_key", "sdig", out_col="ddig")

    def _changed(batch: pa.Table) -> pa.Table:
        pk = batch["pair_key"].to_numpy(zero_copy_only=False)
        dd = batch["ddig"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(pk // k, pa.int64()),
            "changed": pa.array((dd != 0).astype(np.int64)),
        })

    return sum_by_int_key(
        diff.map_batches(_changed, batch_format="pyarrow",
                         batch_size=65536),
        "doc_id", "changed", out_col="n_changes")


def recrawl_priority(sf_dir: str) -> ray.data.Dataset:
    """W11 -> (doc_id, n_changes, lambda_hat, p_stale), ordered by doc_id.

    p_stale = 1 - exp(-lambda_hat * age) is the Poisson probability the
    page changed since its last fetch — the recrawl priority that feeds
    the w10 frontier. Floats rounded 6 dp on both sides; the SQL mirrors
    the float expression term for term."""
    k = RECRAWL_SNAPSHOTS
    n_changes = _doc_change_counts(sf_dir)

    def _score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        x = batch["n_changes"].to_numpy(zero_copy_only=False)
        n = float(k - 1)
        lam = -np.log((n - x + 0.5) / (n + 0.5))
        age = (ids % 5 + 1).astype(np.float64)
        p_stale = 1.0 - np.exp(-lam * age)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_changes": pa.array(x.astype(np.int64)),
            "lambda_hat": pa.array(np.round(lam, 6), pa.float64()),
            "p_stale": pa.array(np.round(p_stale, 6), pa.float64()),
        })

    return (n_changes.map_batches(_score, batch_format="pyarrow",
                                  batch_size=65536)
            .sort("doc_id"))


SQL["w11_recrawl_priority"] = """
WITH ch AS (
  SELECT doc_id,
         CAST((CASE WHEN (doc_id * 2) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 3) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 5) % 7 < 3 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_changes
  FROM documents
)
SELECT doc_id, n_changes,
       round(-ln((3.0 - n_changes + 0.5) / (3.0 + 0.5)), 6) AS lambda_hat,
       round(1.0 - exp(-(-ln((3.0 - n_changes + 0.5) / (3.0 + 0.5)))
                       * (doc_id % 5 + 1)), 6) AS p_stale
FROM ch
ORDER BY doc_id
"""


def host_staleness(sf_dir: str) -> ray.data.Dataset:
    """W15 -> (host_id, n_docs, n_changes, stale_rate), ordered by host_id.

    The per-HOST staleness rollup the continuous-crawl scheduler consumes
    (hosts that churn get recrawled often; static hosts back off) — the
    same shape the 1M-page proof derives from two real CDX generations
    (scripts/scale_proof_crawl.py frontier stage: per-host change rates,
    changed-url count reconciling exactly with the revisit manifest).
    Here the change history is w11's planted k-snapshot digest rule and
    host_id = doc_id % 101 (the fixture host fan-out), so DuckDB can
    regenerate it arithmetically and hash-verify.

    Shape: w11's per-doc change counts (shared _doc_change_counts — two
    keyed sums) -> (n_changes, 1) packed into disjoint int64 lanes ->
    ONE more keyed sum over <= 101 host keys -> vectorized rate. Counts
    are bounded by k-1 per doc, so the high lane never carries."""
    from ..stages.runs import sum_by_int_key

    k = RECRAWL_SNAPSHOTS
    n_changes = _doc_change_counts(sf_dir)

    def _lanes(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ch = batch["n_changes"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host_id": pa.array((ids % 101).astype(np.int64)),
            "v": pa.array((ch.astype(np.int64) << 32) + 1),
        })

    agg = sum_by_int_key(
        n_changes.map_batches(_lanes, batch_format="pyarrow",
                              batch_size=65536),
        "host_id", "v", out_col="packed")

    def _rate(batch: pa.Table) -> pa.Table:
        packed = batch["packed"].to_numpy(zero_copy_only=False)
        docs = (packed & 0xFFFFFFFF).astype(np.int64)
        changes = (packed >> 32).astype(np.int64)
        return pa.table({
            "host_id": batch["host_id"],
            "n_docs": pa.array(docs),
            "n_changes": pa.array(changes),
            "stale_rate": pa.array(
                np.round(changes / ((k - 1.0) * docs), 6), pa.float64()),
        })

    return (agg.map_batches(_rate, batch_format="pyarrow",
                            batch_size=65536)
            .sort("host_id"))


SQL["w15_host_staleness"] = """
WITH ch AS (
  SELECT doc_id,
         CAST((CASE WHEN (doc_id * 2) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 3) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 5) % 7 < 3 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_changes
  FROM documents
)
SELECT doc_id % 101 AS host_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_changes) AS BIGINT) AS n_changes,
       round(SUM(n_changes) / (3.0 * COUNT(*)), 6) AS stale_rate
FROM ch
GROUP BY doc_id % 101
ORDER BY host_id
"""


def frontier_refresh_schedule(sf_dir: str,
                              per_host: int = FRONTIER_PER_HOST) -> pa.Table:
    """W12 — staleness-driven refresh frontier: the composition the crawl
    loop actually runs. w11's p_stale (Cho & Garcia-Molina expected
    staleness) is the priority; w10's Crawl-delay politeness is the
    spacing — so the scheduler re-fetches the pages most likely to have
    changed, fastest hosts draining first, no host's delay violated.

    Honest composition: the priorities come from the REAL w11 pipeline
    output (the shifted-key digest exchange), not from restating the
    planted rule inline; the schedule half then reuses w10's shape —
    per-batch vectorized partial top-B per host -> ONE host-bounded
    groupby -> <= hosts x B rows on the driver."""

    pr = recrawl_priority(sf_dir)  # (doc_id, n_changes, lambda_hat, p_stale)

    def partial_topb(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        p = batch["p_stale"].to_numpy(zero_copy_only=False)
        host = ids % N_HOSTS
        order = np.lexsort((ids, -p, host))
        h = host[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        pos = np.arange(h.size) - np.repeat(starts, np.diff(
            np.concatenate((starts, [h.size]))))
        keep = order[pos < per_host]
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "host_idx": pa.array(host[keep], pa.int64()),
            "p_stale": pa.array(p[keep], pa.float64()),
        })

    def final_schedule(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["p_stale"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -p))[:per_host]
        delay = int(ids[0] % N_HOSTS % 4) + 1
        ranks = np.arange(order.size, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "host_idx": group["host_idx"].take(pa.array(order)),
            "p_stale": pa.array(p[order], pa.float64()),
            "fetch_at": pa.array(ranks * delay, pa.int64()),
        })

    rows = (pr.select_columns(["doc_id", "p_stale"])
            .map_batches(partial_topb, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("host_idx")
            .map_groups(final_schedule, batch_format="pyarrow")
            .take_all())
    rows.sort(key=lambda r: (r["fetch_at"], r["host_idx"], r["doc_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "host_idx": pa.array([r["host_idx"] for r in rows], pa.int64()),
        "p_stale": pa.array([r["p_stale"] for r in rows], pa.float64()),
        "fetch_at": pa.array([r["fetch_at"] for r in rows], pa.int64()),
    })


SQL["w12_frontier_refresh"] = f"""
WITH ch AS (
  SELECT doc_id,
         CAST((CASE WHEN (doc_id * 2) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 3) % 7 < 3 THEN 1 ELSE 0 END)
            + (CASE WHEN (doc_id * 5) % 7 < 3 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_changes
  FROM documents
),
pr AS (
  SELECT doc_id,
         round(1.0 - exp(-(-ln((3.0 - n_changes + 0.5) / (3.0 + 0.5)))
                         * (doc_id % 5 + 1)), 6) AS p_stale
  FROM ch
),
ranked AS (
  SELECT doc_id, doc_id % {N_HOSTS} AS host_idx, p_stale,
         row_number() OVER (PARTITION BY doc_id % {N_HOSTS}
                            ORDER BY p_stale DESC, doc_id) - 1 AS r
  FROM pr
)
SELECT doc_id, host_idx, p_stale,
       CAST(r * ((host_idx % 4) + 1) AS BIGINT) AS fetch_at
FROM ranked WHERE r < {FRONTIER_PER_HOST}
"""


# ------------------------------------------------- W13: WAT companion build

def wat_metadata(sf_dir: str) -> pa.Table:
    """W13 — the WAT companion archive, end to end: planted linked pages ->
    WARC export -> distributed WAT build (one streaming task per archive,
    the SAME link/title kernels the index uses) -> WAT read-back -> one
    metadata row per page. The SQL oracle regenerates title / link count /
    first normalized link ARITHMETICALLY from the planted rule set, so a
    hash match proves render -> archive -> WAT JSON -> parse is exact —
    including the kernel's decoy drops (mailto, href-less, commented) and
    fragment normalization riding through the JSON round trip.

    The WARC export caches per input fingerprint (the s10 pattern); the
    WAT build — the operator under test — always re-runs."""
    import hashlib
    import os

    from ..sources.warc import write_warc_pages
    from ..sources.wat import build_wat, read_wat_pages
    from .crawl_refresh import _CACHE_ROOT
    from .simple_text import input_fingerprint, read_parquet_clean

    doc_path = os.path.join(sf_dir, "documents.parquet")
    fp = hashlib.md5(
        (input_fingerprint(doc_path) + "watdemo-v1").encode()
    ).hexdigest()[:10]
    warc_dir = os.path.join(_CACHE_ROOT, f"wat_warc_{fp}")
    if not os.path.isdir(warc_dir) or not any(
            f.endswith(".warc.gz") for f in os.listdir(warc_dir)):
        write_warc_pages(_linked_pages(sf_dir), warc_dir, prefix="watdemo")
    wat_dir = os.path.join(_CACHE_ROOT, f"wat_out_{fp}")
    build_wat(warc_dir, wat_dir)

    def to_meta(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        ids = [int(u.rsplit("/", 1)[1]) for u in urls]
        links = batch["links"].to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": batch["title"],
            "n_links": pa.array([len(x) for x in links], pa.int64()),
            "first_link": pa.array([x[0] if x else "" for x in links],
                                   pa.string()),
        })

    return pa.Table.from_pylist(
        read_wat_pages(wat_dir)
        .map_batches(to_meta, batch_format="pyarrow")
        .take_all()).sort_by("doc_id")


SQL["w13_wat_metadata"] = """
SELECT doc_id,
       'doc ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(2 + (doc_id * 7919) % 5 AS BIGINT) AS n_links,
       'https://site' || CAST((doc_id * 1000003) % 100000 % 101 AS VARCHAR)
         || '.example.th/l/'
         || lpad(CAST((doc_id * 1000003) % 100000 AS VARCHAR), 8, '0')
         AS first_link
FROM documents ORDER BY doc_id
"""


# --------------------------------------- W14: sitemap discovery from robots

def sitemap_discovery(sf_dir: str) -> pa.Table:
    """W14 — the sitemaps-protocol discovery mechanism: each host's
    robots.txt names its sitemap shards via `Sitemap:` directives
    (kernel/robots.robots_sitemaps), the step BEFORE w5's urlset parse in
    a real crawl bootstrap. Planted rule: host h lists sitemap.xml plus
    h%3 extra `sitemap{i}.xml.gz` shards (mixed-case keys + a commented
    decoy the kernel must ignore).

    Scale shape: the host set derives from the corpus with per-batch
    unique partials (bounded by N_HOSTS rows per batch) and a driver
    union; robots parsing fans out over the host-cardinality dataset —
    control-plane-sized by definition (one robots.txt per HOST)."""
    import os

    from ..kernel.robots import robots_sitemaps
    from .simple_text import read_parquet_clean

    def hpart(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"h": np.unique(ids % N_HOSTS).astype(np.int64)})

    parts = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(hpart, batch_format="pyarrow", batch_size=65536).take_all()
    hosts = sorted({int(r["h"]) for r in parts})

    def discover(batch: pa.Table) -> pa.Table:
        hs, poss, urls = [], [], []
        for h in batch["host_idx"].to_pylist():
            for i, u in enumerate(robots_sitemaps(_planted_robots(h))):
                hs.append(h)
                poss.append(i)
                urls.append(u)
        return pa.table({"host_idx": pa.array(hs, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "sitemap_url": pa.array(urls, pa.string())})

    rows = ray.data.from_items(
        [{"host_idx": h} for h in hosts]
    ).map_batches(discover, batch_format="pyarrow").take_all()
    t = pa.Table.from_pylist(rows) if rows else pa.table(
        {"host_idx": pa.array([], pa.int64()),
         "pos": pa.array([], pa.int64()),
         "sitemap_url": pa.array([], pa.string())})
    return t.sort_by([("host_idx", "ascending"), ("pos", "ascending")])


SQL["w14_sitemap_discovery"] = f"""
WITH hosts AS (SELECT DISTINCT doc_id % {N_HOSTS} AS h FROM documents),
maps AS (SELECT h, unnest(range(0, h % 3 + 1)) AS pos FROM hosts)
SELECT h AS host_idx, CAST(pos AS BIGINT) AS pos,
       CASE WHEN pos = 0
            THEN 'https://site' || CAST(h AS VARCHAR)
                 || '.example.th/sitemap.xml'
            ELSE 'https://site' || CAST(h AS VARCHAR)
                 || '.example.th/sitemap' || CAST(pos AS VARCHAR)
                 || '.xml.gz' END AS sitemap_url
FROM maps ORDER BY host_idx, pos
"""
