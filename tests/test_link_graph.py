"""Link-graph family: kernel <a href> extraction rules (kernel/links.py),
host-edge aggregation and host PageRank (stages/link_graph.py), and the
planted-link pipeline round trip (pipelines/web_graph.py)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray
import ray.data

from meilisearch_thai_ray.kernel.links import extract_links
from meilisearch_thai_ray.pipelines.web_graph import (
    _docs_to_linked_pages, _page_html, _planted_links, N_HOSTS)
from meilisearch_thai_ray.stages.link_graph import (
    host_edges, host_pagerank, pages_to_links)
from meilisearch_thai_ray.stages.url_filter import url_host

U = "https://www.example.th/a/b"


# ------------------------------------------------ kernel extraction rules

def test_basic_absolute_and_relative():
    html = ('<a href="https://x.th/p">One</a>'
            '<a href="/root">Two</a>'
            '<a href="sib">Three</a>')
    assert extract_links(html, U) == [
        ("https://x.th/p", "One"),
        ("https://www.example.th/root", "Two"),
        ("https://www.example.th/a/sib", "Three"),
    ]


def test_scheme_relative_fragment_and_duplicates():
    html = ('<a href="//y.th/q#frag">A</a>'
            '<a href="//y.th/q">A</a>')  # defrag makes them duplicates
    assert extract_links(html, U) == [
        ("https://y.th/q", "A"), ("https://y.th/q", "A")]


def test_non_http_schemes_and_hrefless_drop():
    html = ('<a href="mailto:x@y.th">m</a>'
            '<a href="javascript:void(0)">j</a>'
            '<a href="data:text/plain,hi">d</a>'
            '<a name="top">anchor only</a>'
            '<a href="ftp://f.th/x">f</a>')
    assert extract_links(html, U) == []


def test_self_link_dropped_fragment_insensitive():
    html = (f'<a href="{U}">self</a>'
            f'<a href="{U}#sec">self frag</a>'
            f'<a href="{U}/deeper">not self</a>')
    assert extract_links(html, U) == [(U + "/deeper", "not self")]


def test_base_href_overrides_resolution():
    html = ('<head><base href="https://cdn.example.th/root/"></head>'
            '<a href="x">X</a>')
    assert extract_links(html, U) == [("https://cdn.example.th/root/x", "X")]


def test_comments_excluded_and_attr_gt_tolerated():
    html = ('<!-- <a href="https://spam.th/x">spam</a> -->'
            '<a title="a > b" href="https://ok.th/y">Y</a>')
    assert extract_links(html, U) == [("https://ok.th/y", "Y")]


def test_anchor_normalization_nested_tags_entities_ws():
    html = ('<a href="https://z.th/p"> <b>Bold</b>\n &amp; <i>spaced</i>  '
            'text </a>')
    assert extract_links(html, U) == [
        ("https://z.th/p", "Bold & spaced text")]


def test_quote_styles_and_case_insensitive_tag():
    html = ("<A HREF='https://q.th/s'>sq</A>"
            "<a href=https://q.th/u>uq</a>")
    assert extract_links(html, U) == [
        ("https://q.th/s", "sq"), ("https://q.th/u", "uq")]


def test_bytes_input_and_document_order():
    html = ('<a href="https://b.th/2">two</a>'
            '<a href="https://a.th/1">one</a>').encode()
    assert [u for u, _ in extract_links(html, U)] == [
        "https://b.th/2", "https://a.th/1"]


# ------------------------------------- stage parity vs a python oracle

def _linked_pages_table(n: int) -> pa.Table:
    return _docs_to_linked_pages(
        pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}))


def _oracle_host_edges(pages: pa.Table) -> Counter:
    c: Counter = Counter()
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        sh = url_host(url)
        for dst, _ in extract_links(html, url):
            dh = url_host(dst)
            if sh != dh and sh and dh:
                c[(sh, dh)] += 1
    return c


def test_host_edges_matches_python_oracle(ray_session):
    pages = _linked_pages_table(120)
    links = ray.data.from_arrow(pages).map_batches(
        pages_to_links, batch_format="pyarrow", batch_size=17)
    got = {(r["src_host"], r["dst_host"]): r["w"]
           for r in host_edges(links).take_all()}
    assert got == dict(_oracle_host_edges(pages))


def test_planted_links_round_trip_exact():
    pages = _linked_pages_table(60)
    for url, html, d in zip(pages["url"].to_pylist(),
                            pages["html"].to_pylist(),
                            pages["doc_id"].to_pylist()):
        exp = [(f"https://site{dst}.example.th/l/{t:08d}", f"w{t % 997}")
               for _, t, dst in _planted_links(d)]
        assert extract_links(html, url) == exp


def test_planted_out_degree_range():
    for d in range(200):
        k = len(_planted_links(d))
        assert 2 <= k <= 6


# ------------------------------------------- host pagerank numpy parity

def _np_pagerank(edges: dict, n_iter: int = 5, damping: float = 0.85):
    hosts = sorted({h for e in edges for h in e})
    hidx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for (s, d), w in edges.items():
        W[hidx[s], hidx[d]] += w
    strength = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = np.zeros(n)
        nz = strength > 0
        contrib += (W[nz] * (r[nz] / strength[nz])[:, None]).sum(axis=0)
        r = base + damping * contrib
    return {h: round(float(r[hidx[h]]), 6) for h in hosts}


def test_host_pagerank_numpy_parity(ray_session):
    pages = _linked_pages_table(150)
    links = ray.data.from_arrow(pages).map_batches(
        pages_to_links, batch_format="pyarrow", batch_size=32)
    edges_ds = host_edges(links)
    edges = {(r["src_host"], r["dst_host"]): r["w"]
             for r in edges_ds.take_all()}
    got = {r["host"]: r["rank"]
           for r in host_pagerank(edges_ds, n_iter=5).take_all()}
    exp = _np_pagerank(edges, n_iter=5)
    assert got.keys() == exp.keys()
    for h in exp:
        assert abs(got[h] - exp[h]) <= 1e-9, h


def test_host_pagerank_dangling_and_source_nodes(ray_session):
    # c is dangling (mass leaks); a has zero in-degree (keeps teleport base)
    t = pa.table({"src_host": pa.array(["a.th", "b.th"], pa.string()),
                  "dst_host": pa.array(["b.th", "c.th"], pa.string()),
                  "w": pa.array([1, 2], pa.int64())})
    edges_ds = ray.data.from_arrow(t)
    got = {r["host"]: r["rank"]
           for r in host_pagerank(edges_ds, n_iter=3).take_all()}
    exp = _np_pagerank({("a.th", "b.th"): 1, ("b.th", "c.th"): 2}, n_iter=3)
    assert got == exp
    assert got["a.th"] == round((1 - 0.85) / 3, 6)


def test_host_skew_separates_rank(ray_session):
    # odd-j planted links target hosts 0..10 -> their mean rank must
    # clearly exceed the tail's (the fixture is useful, not degenerate)
    pages = _linked_pages_table(300)
    links = ray.data.from_arrow(pages).map_batches(
        pages_to_links, batch_format="pyarrow", batch_size=64)
    ranks = {r["host"]: r["rank"]
             for r in host_pagerank(host_edges(links)).take_all()}
    hot = [ranks[f"site{i}.example.th"] for i in range(11)]
    cold = [v for h, v in ranks.items()
            if int(h[4:h.index(".")]) >= 11]
    assert min(hot) > max(cold)
    assert len(ranks) == N_HOSTS
