"""Deterministic HTML -> outgoing-link extraction (the link-graph kernel).

Same regex idiom and whitespace rules as kernel/extract.py (the tag-body
pattern tolerates '>' inside quoted attribute values); pure and
versioned so the distributed stage and the pytest oracle call the ONE
function. The reference has no link extractor (its inputs are plain
title/content fields — extract.py module docstring); this kernel serves
the web-scale graph family (host graph, PageRank prior, anchor-text
aggregation) the engine adds beyond the reference.

Rules (fixed, versioned by LINKS_VERSION):
  1. links come from <a ... href=...>anchor</a> pairs outside comments;
     a <base href> (first one, if any) overrides the page url as the
     resolution base;
  2. hrefs resolve with urllib.parse.urljoin against the base; only
     http/https results survive (mailto:, javascript:, data: drop);
     fragments are stripped; self-links (resolved == page url after
     fragment strip) drop;
  3. anchor text: nested tags removed in place, entities decoded,
     whitespace collapsed to single spaces, stripped (inline-context
     normalization — newlines become spaces);
  4. output order is document order; duplicates are preserved (the
     aggregation stage decides weighting).
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urldefrag, urljoin

from .extract import _COMMENT_RE, _SPACE_RE, _TAG_BODY, _TAG_RE

LINKS_VERSION = "1"

_A_RE = re.compile(rf"<a\b({_TAG_BODY})>(.*?)</a\s*>", re.S | re.I)
_BASE_RE = re.compile(rf"<base\b({_TAG_BODY})>", re.I)
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.I)


def _href_of(tag_body: str) -> str | None:
    m = _HREF_RE.search(tag_body)
    if not m:
        return None
    return next(g for g in m.groups() if g is not None)


def _norm_anchor(inner: str) -> str:
    s = _TAG_RE.sub("", inner)
    s = _html.unescape(s)
    return _SPACE_RE.sub(" ", s.replace("\n", " ")).strip()


def extract_links(html_bytes: bytes | str,
                  page_url: str) -> list[tuple[str, str]]:
    """[(absolute_url, anchor_text), ...] in document order. Pure,
    deterministic; see module docstring for the rule set."""
    if isinstance(html_bytes, bytes):
        raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _COMMENT_RE.sub("", raw)
    base = page_url
    bm = _BASE_RE.search(s)
    if bm:
        bh = _href_of(bm.group(1))
        if bh:
            base = urljoin(page_url, bh)
    out: list[tuple[str, str]] = []
    page_nofrag = urldefrag(page_url)[0]
    for m in _A_RE.finditer(s):
        href = _href_of(m.group(1))
        if not href:
            continue
        absu = urldefrag(urljoin(base, href))[0]
        if not absu.startswith(("http://", "https://")):
            continue
        if absu == page_nofrag:
            continue
        out.append((absu, _norm_anchor(m.group(2))))
    return out
