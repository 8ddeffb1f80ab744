"""Sitemap XML parsing (kernel/sitemap.py) and the crawl-frontier
schedule (pipelines/web_graph.py w5/w6)."""

from __future__ import annotations

import math

import pyarrow as pa

from meilisearch_thai_ray.kernel.sitemap import parse_sitemap, render_sitemap
from meilisearch_thai_ray.pipelines import web_graph as wg

SF = "/root/testdata/sf0.001"


def test_urlset_round_trip():
    entries = [("https://a.th/p?x=1&y=2", "1999-02-03", 0.5),
               ("https://a.th/q", "", float("nan")),
               ("https://a.th/r", "2001-12-31", 1.0)]
    kind, got = parse_sitemap(render_sitemap(entries))
    assert kind == "urlset"
    assert [(u, m) for u, m, _ in got] == [(u, m) for u, m, _ in entries]
    assert got[0][2] == 0.5 and math.isnan(got[1][2]) and got[2][2] == 1.0


def test_entities_cdata_and_missing_loc():
    xml = ("""<urlset><url><loc>https://a.th/p?a=1&amp;b=2</loc></url>
    <url><loc><![CDATA[https://a.th/raw?c=1&d=2]]></loc></url>
    <url><lastmod>2000-01-01</lastmod></url>
    <url><loc>  https://a.th/ws  </loc><priority>bogus</priority></url>
    </urlset>""")
    kind, rows = parse_sitemap(xml)
    assert kind == "urlset"
    assert [r[0] for r in rows] == ["https://a.th/p?a=1&b=2",
                                    "https://a.th/raw?c=1&d=2",
                                    "https://a.th/ws"]
    assert math.isnan(rows[2][2])


def test_sitemapindex():
    xml = ("""<sitemapindex xmlns="http://x">
    <sitemap><loc>https://a.th/s1.xml</loc><lastmod>2001-01-01</lastmod></sitemap>
    <sitemap><loc>https://a.th/s2.xml</loc></sitemap></sitemapindex>""")
    kind, rows = parse_sitemap(xml.encode())
    assert kind == "index"
    assert [r[0] for r in rows] == ["https://a.th/s1.xml",
                                    "https://a.th/s2.xml"]


def test_frontier_politeness_invariants(ray_session):
    out = wg.crawl_frontier(SF).to_pandas()
    # per-host cap holds
    assert out.groupby("host").size().max() <= wg.FRONTIER_PER_HOST
    # within a host, ranks are 1..n with strictly falling (priority, -doc)
    for _, g in out.groupby("host"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        keys = list(zip(-g["priority"], g["doc_id"]))
        assert keys == sorted(keys)
    # round-robin: every rank-1 fetch precedes every rank-3 fetch of
    # hosts that have 3 candidates... globally ranks are non-decreasing
    assert list(out.sort_values("fetch_pos")["rank"]) == \
        sorted(out["rank"].tolist())


def test_frontier_matches_python_oracle(ray_session):
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    per_host: dict[int, list[tuple[int, int]]] = {}
    for d in ids:
        per_host.setdefault(d % wg.N_HOSTS, []).append(((d * 31) % 100, d))
    sched = []
    for h, cands in per_host.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (p, d) in enumerate(cands[:wg.FRONTIER_PER_HOST], 1):
            sched.append((rank, -p, d, h))
    sched.sort()
    got = wg.crawl_frontier(SF).to_pandas().sort_values("fetch_pos")
    assert list(got["doc_id"]) == [d for _, _, d, _ in sched]
    assert list(got["rank"]) == [r for r, _, _, _ in sched]


def test_host_reputation_matches_python_oracle(ray_session):
    import polars as pl
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.pipelines.corpus_stats import (
        gopher_with_verdict)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    df = gopher_with_verdict(pl.from_arrow(docs))
    per_host: dict[int, list[int]] = {}
    for d, p in zip(df["doc_id"], df["passes_gopher"]):
        per_host.setdefault(int(d) % wg.N_HOSTS, []).append(int(p))
    got = wg.host_reputation(SF).to_pandas().set_index("host")
    assert len(got) == len(per_host)
    for h, ps in per_host.items():
        row = got.loc[f"site{h}.example.th"]
        assert row["n_docs"] == len(ps) and row["n_pass"] == sum(ps)
        assert row["blocked"] == (sum(ps) * 10
                                  < wg.REPUTATION_BLOCK_NUM * len(ps))


def test_sitemap_sharding_round_trip(ray_session):
    """max_per_file=3 forces every host into sharded urlsets + a
    sitemapindex; the parsed row set must be identical to the unsharded
    render."""
    flat = wg.sitemap_urls(SF).to_pandas().sort_values("url")
    sharded = wg.sitemap_urls(SF, max_per_file=3).to_pandas(
    ).sort_values("url")
    assert flat.reset_index(drop=True).equals(
        sharded.reset_index(drop=True))


def test_frontier_timed_schedule_politeness_invariants(ray_session):
    """W10: per-host spacing == the host's planted Crawl-delay, schedule
    globally sorted by fetch_at, per-host order still priority-first."""
    from meilisearch_thai_ray.pipelines.web_graph import (
        frontier_timed_schedule)

    t = frontier_timed_schedule("/root/testdata/sf0.001").to_pandas()
    assert list(t["fetch_at"]) == sorted(t["fetch_at"])
    for host, g in t.groupby("host_idx"):
        delay = int(host % 4) + 1
        fts = sorted(g["fetch_at"])
        assert fts == [i * delay for i in range(len(g))]
        # within a host, earlier fetch = higher priority (doc_id breaks ties)
        byft = g.sort_values("fetch_at")
        pr = list(byft["priority"])
        ids = list(byft["doc_id"])
        assert all((pr[i] > pr[i+1]) or (pr[i] == pr[i+1] and
                                         ids[i] < ids[i+1])
                   for i in range(len(pr) - 1))


# ---- w11 recrawl priority (Cho & Garcia-Molina change-rate estimator) ----

def _w11_python_oracle(doc_ids):
    """Naive restatement of the planted history + estimator."""
    import math

    rows = []
    for d in doc_ids:
        x = sum(1 for p in (2, 3, 5) if (d * p) % 7 < 3)
        lam = -math.log((3 - x + 0.5) / 3.5)
        age = d % 5 + 1
        rows.append((d, x, round(lam, 6),
                     round(1.0 - math.exp(-lam * age), 6)))
    return rows


def test_recrawl_priority_matches_python_oracle(ray_session):
    import pyarrow.parquet as pq

    got = wg.recrawl_priority(SF).take_all()
    ids = sorted(pq.read_table(SF + "/documents.parquet",
                               columns=["doc_id"])["doc_id"].to_pylist())
    want = _w11_python_oracle(ids)
    assert [(r["doc_id"], r["n_changes"], r["lambda_hat"], r["p_stale"])
            for r in got] == want


def test_recrawl_priority_change_count_is_from_digests(ray_session):
    """The change count must come from actual digest comparisons through
    the shifted-key exchange: a doc whose rule never fires has
    lambda_hat = -ln(3.5/3.5) = 0 and p_stale = 0 at any age."""
    rows = {r["doc_id"]: r for r in wg.recrawl_priority(SF).take_all()}
    zero = [d for d in rows
            if all((d * p) % 7 >= 3 for p in (2, 3, 5))]
    assert zero, "planted corpus should contain never-changing docs"
    for d in zero[:5]:
        assert rows[d]["n_changes"] == 0
        assert rows[d]["lambda_hat"] == 0.0
        assert rows[d]["p_stale"] == 0.0
    hot = [d for d in rows
           if all((d * p) % 7 < 3 for p in (2, 3, 5))]
    for d in hot[:5]:
        assert rows[d]["n_changes"] == 3
        assert rows[d]["p_stale"] > 0.8


def test_host_staleness_matches_python_oracle(ray_session):
    """W15 per-host rollup: counts and rates equal a plain python group-by
    of the w11 per-doc change counts; covers all 101 fixture hosts."""
    import pyarrow.parquet as pq

    got = wg.host_staleness(SF).take_all()
    ids = pq.read_table(SF + "/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    by_host: dict[int, list[int]] = {}
    for d in ids:
        x = sum(1 for p in (2, 3, 5) if (d * p) % 7 < 3)
        by_host.setdefault(d % 101, []).append(x)
    want = [(h, len(xs), sum(xs), round(sum(xs) / (3.0 * len(xs)), 6))
            for h, xs in sorted(by_host.items())]
    assert [(r["host_id"], r["n_docs"], r["n_changes"], r["stale_rate"])
            for r in got] == want
    assert len(got) == 101


def test_frontier_refresh_schedule_invariants(ray_session):
    """w12 = w11 priority x w10 politeness: per-host spacing equals the
    host's Crawl-delay, and within a host higher p_stale fetches first."""
    t = wg.frontier_refresh_schedule(SF)
    hosts = t["host_idx"].to_pylist()
    fetch = t["fetch_at"].to_pylist()
    stale = t["p_stale"].to_pylist()
    ids = t["doc_id"].to_pylist()
    per_host: dict[int, list] = {}
    for h, f, p, d in zip(hosts, fetch, stale, ids):
        per_host.setdefault(h, []).append((f, p, d))
    assert len(per_host) > 50
    for h, rows in per_host.items():
        rows.sort()
        delay = h % 4 + 1
        assert [f for f, _, _ in rows] == [
            i * delay for i in range(len(rows))]  # exact spacing
        # priority order: p_stale non-increasing, doc_id breaks ties
        ps = [(-p, d) for _, p, d in rows]
        assert ps == sorted(ps)
    # global order is (fetch_at, host, doc)
    key = list(zip(fetch, hosts, ids))
    assert key == sorted(key)
