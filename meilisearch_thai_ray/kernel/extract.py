"""Deterministic HTML -> text extraction (the byte-identity oracle).

The reference has no HTML extractor (verified: no html-stripping code under
/root/reference/src; its inputs are already-plain title/content fields joined as
f"{title} {content}" at document_processor.py:193). The north rule's
"byte-identical extracted text per url" invariant therefore binds the Ray
pipeline to THIS kernel function: both the distributed stage and the pytest
oracle call `html_to_text`, and the test asserts the distributed output is
byte-identical per url across parallelism levels and resume boundaries.

Rules (fixed, versioned by EXTRACTOR_VERSION):
  1. drop <script>/<style>/<!-- --> content entirely;
  2. block-level tags (p, div, br, h1-h6, li, tr, table, title, head, body,
     html, ul, ol, section, article, header, footer) break lines; inline tags
     (a, b, i, em, strong, span, code, u, small) are removed in place;
  3. entities decoded with html.unescape AFTER tag removal;
  4. whitespace: runs of spaces/tabs collapse to one space; lines stripped;
     empty lines dropped; lines joined with '\n'; result stripped.
  5. NO unicode normalization ever (U+200B and Thai combining marks must
     survive untouched).
"""

from __future__ import annotations

import html as _html
import re

EXTRACTOR_VERSION = "5"  # v5: title_tc column (attribute ranking rule)
# v4: term_positions column (positional postings)
# v3: per-doc status/error columns (dead-letter rows)
# v2: tags with '>' inside quoted attribute values

_BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|tr|td|th|table|title|head|body|html|ul|ol"
    "|section|article|header|footer|blockquote|pre"
)
# tag body: unquoted chars interleaved with quoted attribute values — a '>'
# inside quotes (href="a>b") must not terminate the tag
_TAG_BODY = r"""[^>"']*(?:"[^"]*"[^>"']*|'[^']*'[^>"']*)*"""
_SCRIPT_RE = re.compile(rf"<(script|style)\b{_TAG_BODY}>.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(rf"</?(?:{_BLOCK_TAGS})\b{_TAG_BODY}>", re.I)
_TAG_RE = re.compile(rf"<{_TAG_BODY}>")
_SPACE_RE = re.compile(r"[ \t\r\f\v]+")


_TITLE_RE = re.compile(rf"<title\b{_TAG_BODY}>(.*?)</title\s*>", re.S | re.I)


def html_title(html_bytes: bytes | str) -> str:
    """Extract the document's <title> field, normalized with the SAME
    whitespace rules as html_to_text — so for ordinary HTML (where the
    title block renders first) the extracted text string STARTS WITH this
    value, which is what lets the attribute ranking rule locate the title
    field as a token-position prefix without changing the index format.
    Empty string when the document has no title.

    Separate function on purpose: html_to_text's output is the per-url
    byte-identity invariant vs the reference extractor and must not
    change. Reference analog: documents carry an explicit title field
    joined as f"{title} {content}" (document_processor.py:193); the
    attribute rule ranks title matches first (settings_manager.py:74-89
    searchableAttributes order)."""
    if isinstance(html_bytes, bytes):
        raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    m = _TITLE_RE.search(_COMMENT_RE.sub("", raw))
    if not m:
        return ""
    s = _TAG_RE.sub("", m.group(1))
    s = _html.unescape(s)
    return _SPACE_RE.sub(" ", s.replace("\n", " ")).strip()


def html_to_text(html_bytes: bytes | str) -> str:
    """Extract plain text from an HTML document. Deterministic, pure."""
    if isinstance(html_bytes, bytes):
        raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _SCRIPT_RE.sub("", raw)
    s = _COMMENT_RE.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _SPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
