"""URL canonicalization / host filtering / canonical-URL dedup."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.parametrize("raw,canon", [
    ("HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x/", "https://example.com:8443/x"),
    ("https://example.com/x/?gclid=123", "https://example.com/x"),
    ("https://example.com/x?a=1&a=0", "https://example.com/x?a=0&a=1"),
    ("https://example.com", "https://example.com/"),
    ("not a url at all", "not a url at all"),  # unparseable: identity
])
def test_canonical_url_cases(raw, canon):
    from meilisearch_thai_ray.stages.url_filter import canonical_url

    assert canonical_url(raw) == canon


def test_host_rules_block_suffix_allow():
    from meilisearch_thai_ray.stages.url_filter import HostRules

    r = HostRules(block_hosts=["bad.example"],
                  block_suffixes=["spam.net"],
                  allow_hosts=["good.spam.net"])
    assert r.blocked("bad.example")
    assert not r.blocked("sub.bad.example")  # exact host only
    assert r.blocked("spam.net")
    assert r.blocked("deep.sub.spam.net")
    assert not r.blocked("good.spam.net")  # allowlist overrides
    assert not r.blocked("example.org")


def test_dedup_canonical_urls_across_blocks(ray_session):
    """Tracking-param aliases of the same page collapse to ONE winner (the
    lexicographically smallest original url) under tiny sort blocks, and
    blocked-host rows never reach the output."""
    import ray.data

    from meilisearch_thai_ray.stages.url_filter import (HostRules,
                                                        dedup_canonical_urls)

    urls, htmls = [], []
    for i in range(120):
        base = f"https://site{i % 40}.example/page/{i // 40}"
        urls += [base + "?utm_source=tw", base + "?utm_source=fb&b=1&a=1",
                 base + "?a=1&b=1&fbclid=zzz"]
        htmls += [f"<p>doc {i} v{j}</p>".encode() for j in range(3)]
    urls.append("https://blocked.bad/x")
    htmls.append(b"<p>never</p>")
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })).repartition(8)

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        out = dedup_canonical_urls(
            pages, HostRules(block_hosts=["blocked.bad"])).to_pandas()
    finally:
        ctx.target_max_block_size = saved

    # 40 sites x 3 distinct pages = 120 canonical groups, two alias sets
    # per group collapse; the plain (a=1&b=1) alias differs canonically
    # from the bare one, so groups are (base) and (base?a=1&b=1)
    assert (out["host"].str.startswith("site")).all()
    assert len(out) == len(set(out["canon_url"]))
    # winner is the lexicographically smallest original url of its group
    for canon, grp in out.groupby("canon_url"):
        candidates = [u for u in urls
                      if u.startswith(canon.split("?")[0])]
        assert grp["url"].iloc[0] == min(
            u for u in candidates
            if __import__(
                "meilisearch_thai_ray.stages.url_filter",
                fromlist=["canonical_url"]).canonical_url(u) == canon)
    assert not (out["url"] == "https://blocked.bad/x").any()
