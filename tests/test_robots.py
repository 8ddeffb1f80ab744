"""RFC 9309 parser/matcher (kernel/robots.py) and the RobotsGate stage."""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from meilisearch_thai_ray.kernel.robots import parse_robots
from meilisearch_thai_ray.pipelines.web_graph import (
    ROBOTS_AGENT, _planted_robots)
from meilisearch_thai_ray.stages.url_filter import RobotsGate

BOT = "graftbot"


def test_no_groups_allows_everything():
    r = parse_robots("# nothing here\nSitemap: https://x/s.xml\n", BOT)
    assert r.allowed("/anything")


def test_star_group_basic_disallow():
    r = parse_robots("User-agent: *\nDisallow: /private/\n", BOT)
    assert not r.allowed("/private/x")
    assert r.allowed("/public/x")
    assert r.allowed("/privat")  # prefix, not substring


def test_specific_agent_group_overrides_star():
    txt = ("User-agent: *\nDisallow: /\n\n"
           "User-agent: GraftBot\nDisallow: /tmp/\n")  # case-insensitive
    r = parse_robots(txt, BOT)
    assert r.allowed("/anything")
    assert not r.allowed("/tmp/x")
    other = parse_robots(txt, "someone-else")
    assert not other.allowed("/anything")


def test_longest_match_wins():
    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
    r = parse_robots(txt, BOT)
    assert not r.allowed("/a/x")
    assert r.allowed("/a/b/x")


def test_allow_wins_length_ties():
    txt = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    r = parse_robots(txt, BOT)
    assert r.allowed("/p/x")


def test_wildcard_and_end_anchor():
    txt = "User-agent: *\nDisallow: /p/*4$\n"
    r = parse_robots(txt, BOT)
    assert not r.allowed("/p/00000004")
    assert r.allowed("/p/00000040")  # '4' not at end
    assert r.allowed("/p/00000005")


def test_empty_disallow_matches_nothing():
    r = parse_robots("User-agent: *\nDisallow:\n", BOT)
    assert r.allowed("/x")


def test_shared_agent_run_and_comments():
    txt = ("User-agent: otherbot\nUser-agent: *\n"
           "Disallow: /x/ # trailing comment\n")
    r = parse_robots(txt, BOT)
    assert not r.allowed("/x/1")
    assert r.allowed("/y/1")


def test_unknown_directive_ends_agent_run():
    # Crawl-delay between UA line and a later UA line starts a NEW group
    txt = ("User-agent: *\nCrawl-delay: 2\nDisallow: /a/\n\n"
           "User-agent: graftbot\nDisallow: /b/\n")
    r = parse_robots(txt, BOT)
    assert r.allowed("/a/1")  # specific group wins; /a/ was a star rule
    assert not r.allowed("/b/1")


def test_robots_gate_stage_matches_kernel(ray_session):
    hosts = [f"site{h}.example.th" for h in range(20)]
    robots = {h: _planted_robots(i) for i, h in enumerate(hosts)}
    urls = [f"https://site{h}.example.th/p/{d:08d}"
            for h in range(20) for d in (3, 4, 14, 25)]
    pages = pa.table({"url": pa.array(urls, pa.string())})
    got = (ray.data.from_arrow(pages)
           .map_batches(RobotsGate, batch_format="pyarrow", batch_size=16,
                        fn_constructor_args=(ray.put(robots), ROBOTS_AGENT),
                        concurrency=2)
           .take_all())
    got_urls = sorted(r["url"] for r in got)
    exp = sorted(
        u for u in urls
        if parse_robots(robots[u.split("/")[2]], ROBOTS_AGENT).allowed(
            "/" + u.split("/", 3)[3]))
    assert got_urls == exp
    assert 0 < len(got_urls) < len(urls)


def test_robots_sitemaps_directive():
    """Sitemap: discovery — agent-independent, order kept, dupes dropped,
    comments/empty values ignored, case-insensitive key."""
    from meilisearch_thai_ray.kernel.robots import robots_sitemaps

    text = (
        "# Sitemap: https://decoy.ex/commented.xml\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "SITEMAP: https://a.ex/sitemap1.xml.gz\n"
        "Sitemap:\n"
        "sitemap: https://a.ex/sitemap2.xml\n"
        "Sitemap: https://a.ex/sitemap1.xml.gz\n"
        "User-agent: otherbot\n"
        "Sitemap: https://a.ex/sitemap3.xml  # trailing comment\n"
    )
    assert robots_sitemaps(text) == [
        "https://a.ex/sitemap1.xml.gz",
        "https://a.ex/sitemap2.xml",
        "https://a.ex/sitemap3.xml",
    ]
    assert robots_sitemaps(b"") == []
