"""CDX web-archive index kernels: SURT url keys and payload digests.

The CDX index is the random-access companion of a WARC archive (the Common
Crawl / Internet Archive convention): one row per record with the byte
offset + compressed length of its gzip member, keyed by the SURT-canonical
url, so a reader can fetch one page from a multi-GB archive with a single
ranged read — no sequential scan.

Pure functions (no Ray): the distributed stage in sources/warc.py imports
these, and tests assert round-trip identity against them.

Reference corpus shape only — the reference engine never sees archives
(its inputs arrive pre-extracted over HTTP); this is the crawl-side
capability a web-scale corpus needs in front of it.
"""

from __future__ import annotations

import base64
import hashlib
from urllib.parse import urlsplit

CDX_VERSION = "1"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) url key.

    `https://www.Example.com:443/A/b?z=1&a=2` -> `com,example)/a/b?a=2&z=1`:
    scheme dropped, host lowercased + leading `www.` stripped + components
    reversed comma-joined, default port dropped, path lowercased, query
    params sorted. Matches the conventions CDX(J) readers expect; exotic
    escaping edge cases intentionally out of scope (documented boundary)."""
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split("."))) if host else ""
    port = parts.port
    if port is not None and str(port) != _DEFAULT_PORTS.get(parts.scheme, ""):
        key += f":{port}"
    path = parts.path.lower() or "/"
    key += ")" + path
    if parts.query:
        key += "?" + "&".join(sorted(parts.query.lower().split("&")))
    return key


def cdx_digest(payload: bytes) -> str:
    """Record payload digest: SHA-1, base32 (the classic CDX `digest`
    column convention, e.g. `sha1:3I42H3S6...`)."""
    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()).decode("ascii")
