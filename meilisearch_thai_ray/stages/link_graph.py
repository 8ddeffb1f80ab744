"""Web link-graph stages: page -> outgoing links, host-edge aggregation,
host PageRank with string hosts.

The quality-prior family a web-scale engine derives from crawl archives:
extract <a href> links per page (kernel/links.py — the one extraction
rule set, shared with the pytest oracle), aggregate to a weighted
host-level graph, and run PageRank over it so each host carries a
link-authority prior the curation pipeline can join onto documents.

Scale shapes:
  - link extraction is per-page (HTML parsing is inherently per-doc,
    same class as the extract stage); everything downstream is keys-only
    — anchor text and html never ride an exchange past the first stage.
  - host edges combine per batch (np.unique partials) before ONE
    host-pair-bounded groupby; host-pair cardinality is orders below
    link cardinality, so the shuffle moves the small table.
  - PageRank runs on int64 fnv1a63 host hashes (the repo's documented
    probabilistic id convention, functions/hashing.py) via
    stages/graph.pagerank (sort-once SortedFacts exchange); the
    hash -> host name resolution joins the DISTINCT host table against
    the rank rows — both are host-cardinality, never link-cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import fnv1a64_batch
from ..kernel.links import extract_links
from .url_filter import url_host


def pages_to_links(batch: pa.Table) -> pa.Table:
    """(url, html) page rows -> (src_url, dst_url, anchor) link rows in
    document order (kernel extraction rules; duplicates preserved)."""
    srcs: list[str] = []
    dsts: list[str] = []
    anchors: list[str] = []
    for url, html in zip(batch["url"].to_pylist(),
                         batch["html"].to_pylist()):
        for dst, anchor in extract_links(html, url):
            srcs.append(url)
            dsts.append(dst)
            anchors.append(anchor)
    return pa.table({
        "src_url": pa.array(srcs, pa.string()),
        "dst_url": pa.array(dsts, pa.string()),
        "anchor": pa.array(anchors, pa.string()),
    })


def _host_edge_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: link rows -> (src_host, dst_host, w) partial
    counts, self-host loops dropped."""
    sh = np.array([url_host(u) for u in batch["src_url"].to_pylist()],
                  dtype=object)
    dh = np.array([url_host(u) for u in batch["dst_url"].to_pylist()],
                  dtype=object)
    keep = (sh != dh) & (sh != "") & (dh != "")
    sh, dh = sh[keep], dh[keep]
    if not sh.size:
        return pa.table({"src_host": pa.array([], pa.string()),
                         "dst_host": pa.array([], pa.string()),
                         "w": pa.array([], pa.int64())})
    # hostnames cannot contain a space, so the joined key is unambiguous;
    # return_index points back at the originals — no string splitting
    pair = np.char.add(np.char.add(sh.astype(str), " "), dh.astype(str))
    u, idx, c = np.unique(pair, return_index=True, return_counts=True)
    return pa.table({
        "src_host": pa.array(sh[idx], pa.string()),
        "dst_host": pa.array(dh[idx], pa.string()),
        "w": pa.array(c.astype(np.int64), pa.int64()),
    })


def host_edges(links: ray.data.Dataset) -> ray.data.Dataset:
    """Link rows -> weighted host-level edge Dataset (src_host, dst_host,
    w:int64), self-host loops dropped. Combiner partials + ONE
    host-pair-bounded groupby."""
    return (links.map_batches(_host_edge_partial, batch_format="pyarrow",
                              batch_size=65536)
            .groupby(["src_host", "dst_host"]).sum("w")
            .map_batches(lambda b: pa.table({
                "src_host": b["src_host"], "dst_host": b["dst_host"],
                "w": b["sum(w)"]}), batch_format="pyarrow"))


def host_pagerank(edges: ray.data.Dataset, n_iter: int = 5,
                  damping: float = 0.85) -> ray.data.Dataset:
    """Weighted host-edge Dataset -> (host, rank) via the sort-once
    distributed PageRank over fnv1a63 host hashes. The hash -> name
    resolution broadcasts the DISTINCT host map (host-cardinality; the
    64-bit-collision convention of doc_ids_from_urls applies — at
    planetary host counts swap the broadcast for a sort join on host_h,
    both sides are already host-cardinality)."""
    from .graph import pagerank

    def to_int_edges(batch: pa.Table) -> pa.Table:
        s = batch["src_host"].to_numpy(zero_copy_only=False)
        d = batch["dst_host"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(fnv1a64_batch(s) >> np.uint64(1), pa.int64()),
            "dst": pa.array(fnv1a64_batch(d) >> np.uint64(1), pa.int64()),
            "w": pa.array(batch["w"].to_numpy(
                zero_copy_only=False).astype(np.float64), pa.float64()),
        })

    edges = edges.materialize()  # consumed twice: int edges + host map
    int_edges = edges.map_batches(to_int_edges, batch_format="pyarrow",
                                  batch_size=65536)

    def host_partial(batch: pa.Table) -> pa.Table:
        h = np.unique(np.concatenate([
            batch["src_host"].to_numpy(zero_copy_only=False),
            batch["dst_host"].to_numpy(zero_copy_only=False)]))
        return pa.table({"host": pa.array(h, pa.string()),
                         "host_h": pa.array(
                             fnv1a64_batch(h) >> np.uint64(1), pa.int64())})

    # dedup via max() — host_h is a pure function of host, so every row in
    # a group carries the same value (an aggregate beats per-group
    # map_groups calls at host cardinality)
    hosts = (edges.map_batches(host_partial, batch_format="pyarrow",
                               batch_size=65536)
             .groupby("host").max("host_h"))
    hmap_ref = ray.put({int(r["max(host_h)"]): r["host"]
                        for r in hosts.take_all()})

    def resolve(batch: pa.Table) -> pa.Table:
        hmap = ray.get(hmap_ref)
        nodes = batch["node"].to_pylist()
        return pa.table({
            "host": pa.array([hmap[n] for n in nodes], pa.string()),
            "rank": pa.array(np.round(batch["rank"].to_numpy(
                zero_copy_only=False), 6), pa.float64()),
        })

    return pagerank(int_edges, n_iter=n_iter, damping=damping).map_batches(
        resolve, batch_format="pyarrow", batch_size=65536)
