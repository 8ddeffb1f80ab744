"""Sitemap XML parsing (sitemaps.org protocol) — the crawl-discovery
counterpart to kernel/robots.py. Regex-based like the other kernels
(extract.py's idiom: tolerant of attribute noise, entity-decoding,
whitespace-trimming), pure and versioned; the distributed render->parse
round trip is SQL-verified in pipelines/web_graph.py (w5).

Supported: <urlset> documents -> (loc, lastmod, priority) entries in
document order (lastmod/priority optional, empty string / NaN when
absent); <sitemapindex> documents -> child sitemap locs. CDATA inside
<loc> is unwrapped; entities are decoded; surrounding whitespace is
trimmed (the protocol requires entity-escaped URLs).
"""

from __future__ import annotations

import html as _html
import re

SITEMAP_VERSION = "1"

_URL_RE = re.compile(r"<url\b[^>]*>(.*?)</url\s*>", re.S | re.I)
_SM_RE = re.compile(r"<sitemap\b[^>]*>(.*?)</sitemap\s*>", re.S | re.I)
_LOC_RE = re.compile(r"<loc\b[^>]*>(.*?)</loc\s*>", re.S | re.I)
_LASTMOD_RE = re.compile(r"<lastmod\b[^>]*>(.*?)</lastmod\s*>", re.S | re.I)
_PRIO_RE = re.compile(r"<priority\b[^>]*>(.*?)</priority\s*>", re.S | re.I)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_INDEX_RE = re.compile(r"<sitemapindex\b", re.I)


def _text(m: re.Match | None) -> str:
    if m is None:
        return ""
    s = m.group(1)
    cm = _CDATA_RE.search(s)
    if cm:
        return cm.group(1).strip()
    return _html.unescape(s).strip()


def parse_sitemap(xml: bytes | str) -> tuple[str, list[tuple[str, str, float]]]:
    """-> (kind, entries): kind 'index' with (child_loc, '', nan) rows, or
    kind 'urlset' with (loc, lastmod, priority) rows in document order;
    entries without a <loc> are dropped, priority parses leniently
    (non-numeric -> nan)."""
    if isinstance(xml, bytes):
        xml = xml.decode("utf-8", errors="replace")
    if _INDEX_RE.search(xml):
        out = []
        for m in _SM_RE.finditer(xml):
            loc = _text(_LOC_RE.search(m.group(1)))
            if loc:
                out.append((loc, "", float("nan")))
        return "index", out
    out = []
    for m in _URL_RE.finditer(xml):
        body = m.group(1)
        loc = _text(_LOC_RE.search(body))
        if not loc:
            continue
        lastmod = _text(_LASTMOD_RE.search(body))
        ptxt = _text(_PRIO_RE.search(body))
        try:
            prio = float(ptxt) if ptxt else float("nan")
        except ValueError:
            prio = float("nan")
        out.append((loc, lastmod, prio))
    return "urlset", out


def render_sitemap(entries: list[tuple[str, str, float]]) -> str:
    """Inverse of parse_sitemap for urlset documents (used by the planted
    round-trip pipeline and tests): entries = (loc, lastmod, priority),
    empty lastmod / nan priority omit the element."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n'
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for loc, lastmod, prio in entries:
        parts.append("<url><loc>" + _html.escape(loc) + "</loc>")
        if lastmod:
            parts.append(f"<lastmod>{lastmod}</lastmod>")
        if prio == prio:  # not nan
            parts.append(f"<priority>{prio:.1f}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "".join(parts)
