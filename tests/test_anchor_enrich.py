"""W7 anchor enrichment: aggregation parity vs a python oracle, cap
semantics, and the end-to-end payoff — an anchor-only term finds the
TARGET page through the real index."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.search import SearchEngine
from meilisearch_thai_ray.kernel.links import extract_links
from meilisearch_thai_ray.pipelines import web_graph as wg

SF = "/root/testdata/sf0.001"


def test_anchor_enrich_matches_python_oracle(ray_session):
    n = pq.ParquetFile(os.path.join(SF, "documents.parquet")
                       ).metadata.num_rows
    per_tgt: dict[int, set[str]] = {}
    for d in range(n):
        url = f"https://site{d % wg.N_HOSTS}.example.th/p/{d:08d}"
        for dst, anchor in extract_links(wg._enrich_page_html(d, n), url):
            per_tgt.setdefault(int(dst[-8:]), set()).add(anchor)
    got = wg.anchor_enrich(SF).to_pandas().set_index("doc_id")
    assert set(got.index) == set(per_tgt)
    for tgt, anchors in per_tgt.items():
        exp = sorted(anchors)[:wg.ANCHOR_CAP]
        assert got.loc[tgt, "anchors"] == " ".join(exp)
        assert got.loc[tgt, "n_anchors"] == len(exp)


def test_anchor_cap_binds(ray_session):
    got = wg.anchor_enrich(SF, cap=1).to_pandas()
    assert (got["n_anchors"] == 1).all()


def test_anchor_only_term_becomes_searchable(ray_session, tmp_path):
    """Three pages; page 0 never contains 'zebrasearch' in its own text,
    but pages 1 and 2 link to it with that anchor. After enrichment the
    term must retrieve page 0 (and only page 0)."""
    urls = [f"https://site{i}.example.th/p/{i:08d}" for i in range(5)]
    htmls = [b"<html><body><p>plain target page about nothing"
             b"</p></body></html>"] + [
        (f'<html><body><p>linker number {i} talks a lot about other '
         f'things</p><a href="{urls[0]}">zebrasearch</a></body></html>'
         ).encode() for i in range(1, 5)]
    # enrichment join: anchors keyed by target url, appended to the
    # target's indexed text (the BM25F anchor-stream-as-concat form)
    anchors: dict[str, list[str]] = {}
    for u, h in zip(urls, htmls):
        for dst, anchor in extract_links(h, u):
            anchors.setdefault(dst, []).append(anchor)
    import numpy as np

    enriched = [h[:-14] + f"<p>{' '.join(sorted(anchors.get(u, [])))}</p>"
                .encode() + b"</body></html>"
                for u, h in zip(urls, htmls)]
    n = len(urls)
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.zeros(n, "datetime64[us]")),
        "html": pa.array(enriched, pa.binary()),
        "text": pa.array([""] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    pq.write_table(pages, os.path.join(pages_dir, "p0.parquet"))
    out = str(tmp_path / "index")
    build_index(pages_dir, out, EngineConfig(num_shards=1), num_salts=1)
    eng = SearchEngine(out)
    hits = eng.search("zebrasearch", k=5)
    assert hits, "anchor-only term must hit after enrichment"
    from meilisearch_thai_ray.functions.hashing import doc_id_from_url

    got_ids = [d for d, _ in hits]
    assert doc_id_from_url(urls[0]) in got_ids
    # four accumulated anchor occurrences outrank each linker's single
    # visible anchor-text occurrence
    assert got_ids[0] == doc_id_from_url(urls[0])


def test_enrich_self_link_excluded(ray_session):
    # a planted target equal to its source is the kernel self-link case:
    # it must not appear among the target's anchors
    n = pq.ParquetFile(os.path.join(SF, "documents.parquet")
                       ).metadata.num_rows
    selfs = [d for d in range(n)
             if any((d * 53 + j * 17 + 1) % n == d
                    for j in range(1 + (d * 13) % 3))]
    if not selfs:
        pytest.skip("no planted self-links at this corpus size")
    got = wg.anchor_enrich(SF).to_pandas().set_index("doc_id")
    for d in selfs:
        own = f"a{(d * 11) % 499}"
        if d in got.index:
            assert own not in got.loc[d, "anchors"].split()


def test_anchor_enrich_tiny_blocks_boundary_merge(ray_session):
    """8 KiB sort blocks force most target runs to straddle block
    boundaries — the edge-run driver merge must still produce exactly
    the python-oracle aggregation."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = wg.anchor_enrich(SF).to_pandas()
    finally:
        ctx.target_max_block_size = saved
    ref = wg.anchor_enrich(SF).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        ref.sort_values("doc_id").reset_index(drop=True))
