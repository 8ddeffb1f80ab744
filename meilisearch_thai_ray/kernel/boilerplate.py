"""Main-content extraction (boilerplate removal) — the link-density
block heuristic of Kohlschuetter et al. (WSDM 2010, "Boilerplate
Detection using Shallow Text Features") / Arc90 readability, as used by
every web training-data pipeline (CCNet, RefinedWeb, FineWeb) between
raw HTML and quality filtering.

Separate from kernel/extract.py on purpose: html_to_text is FROZEN
(EXTRACTOR_VERSION keys the index caches and byte-identity goldens);
this opt-in kernel feeds the curation path, not the index.

Rules (fixed, versioned by BOILERPLATE_VERSION):
  1. <head>, <script>/<style>, comments, and the semantic chrome
     containers <nav>/<header>/<footer>/<aside> are removed wholesale;
  2. the remainder splits into text blocks at block-level tag
     boundaries (extract.py's tag inventory);
  3. per block: text = inline tags stripped, entities decoded,
     whitespace collapsed/stripped; link_chars = the combined anchor
     text length (<a> runs);
  4. keep a block iff it has text AND its link density
     (link_chars / text_chars) is <= max_link_density — navigation,
     footers and link farms are mostly anchor text, body prose is not;
  5. output = kept block texts joined with '\\n', in document order.
"""

from __future__ import annotations

import html as _html
import re

from .extract import (_BLOCK_RE, _COMMENT_RE, _SCRIPT_RE, _SPACE_RE,
                      _TAG_BODY, _TAG_RE)

BOILERPLATE_VERSION = "1"

_HEAD_RE = re.compile(rf"<head\b{_TAG_BODY}>.*?</head\s*>", re.S | re.I)
_CHROME_RE = re.compile(
    rf"<(nav|header|footer|aside)\b{_TAG_BODY}>.*?</\1\s*>", re.S | re.I)
_A_TEXT_RE = re.compile(rf"<a\b{_TAG_BODY}>(.*?)</a\s*>", re.S | re.I)


def _block_text(seg: str) -> str:
    s = _TAG_RE.sub("", seg)
    s = _html.unescape(s)
    return _SPACE_RE.sub(" ", s.replace("\n", " ")).strip()


def extract_main_text(html_bytes: bytes | str,
                      max_link_density: float = 0.5) -> str:
    """Kept-block text joined with newlines (module docstring rules).
    Pure and deterministic; the distributed stage and the pytest/SQL
    oracles call this ONE function."""
    if isinstance(html_bytes, bytes):
        raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _COMMENT_RE.sub("", raw)
    s = _SCRIPT_RE.sub(" ", s)
    s = _HEAD_RE.sub(" ", s)
    # nested same-name chrome containers are rare; repeat until stable so
    # <footer><footer>..</footer></footer> can't leak its inner half
    prev = None
    while prev != s:
        prev = s
        s = _CHROME_RE.sub(" ", s)
    kept: list[str] = []
    for seg in _BLOCK_RE.split(s):
        text = _block_text(seg)
        if not text:
            continue
        link_chars = sum(len(_block_text(m.group(1)))
                         for m in _A_TEXT_RE.finditer(seg))
        if link_chars <= max_link_density * len(text):
            kept.append(text)
    return "\n".join(kept)
