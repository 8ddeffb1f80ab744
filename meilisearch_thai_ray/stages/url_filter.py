"""URL canonicalization, host filtering, and canonical-URL dedup for the
pages path — the crawl-side curation stage that runs between a WARC/WET
read and the index build (every production web pipeline drops blocklisted
hosts and collapses tracking-parameter aliases before spending extract
cycles on them).

Reference analog: none (the reference ingests pre-cleaned JSON documents);
this extends the engine at the crawl boundary the same way sources/warc.py
does. All parsing is stdlib urllib; no network, no robots fetching — the
blocklist/allowlist is caller-provided policy.

Scale shape: canonicalization is a stateless per-batch map (pure string
work); host rules broadcast once (ray.put) as a frozenset + sorted suffix
tuple; canonical-URL dedup is keys-only — ONE sort over (canon_hash,
canon_url, url) and a keep-first run-scan, the html payload never rides
the exchange (winner urls re-filter the pages at the read, the
anti/semi-filter idiom used everywhere else in this repo).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

import ray

# Tracking parameters stripped during canonicalization (the common
# cross-site set; matching is exact on the lower-cased key).
TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref", "ref_src",
    "igshid", "_ga", "yclid",
})

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonical_url(url: str) -> str:
    """Deterministic canonical form: lower-case scheme/host, default port
    dropped, fragment dropped, tracking params dropped, remaining query
    keys sorted, duplicate slashes in the path collapsed, trailing slash
    normalized off non-root paths. Unparseable urls return unchanged."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    if host.startswith("www."):
        host = host[4:]
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if k.lower() not in TRACKING_PARAMS]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def url_host(url: str) -> str:
    try:
        h = urlsplit(url).hostname
        return h.lower() if h else ""
    except ValueError:
        return ""


class HostRules:
    """Blocklist policy: exact hosts and/or domain suffixes (a suffix
    'spam.example' blocks 'spam.example' and every subdomain). Allowlist
    entries override blocks at equal or deeper specificity."""

    def __init__(self, block_hosts=(), block_suffixes=(), allow_hosts=()):
        self.block_hosts = frozenset(h.lower() for h in block_hosts)
        self.block_suffixes = tuple(
            s.lower().lstrip(".") for s in block_suffixes)
        self.allow_hosts = frozenset(h.lower() for h in allow_hosts)

    def blocked(self, host: str) -> bool:
        if host in self.allow_hosts:
            return False
        if host in self.block_hosts:
            return True
        return any(host == s or host.endswith("." + s)
                   for s in self.block_suffixes)


class UrlCleaner:
    """map_batches stage: pages (url, ...) -> same rows + canon_url, host;
    rows on blocked hosts are dropped. Rules ride a ray.put broadcast."""

    def __init__(self, rules_ref):
        self.rules = (ray.get(rules_ref)
                      if isinstance(rules_ref, ray.ObjectRef) else rules_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fnv1a64_batch

        urls = batch["url"].to_pylist()
        canon = [canonical_url(u) for u in urls]
        hosts = [url_host(u) for u in urls]
        keep = np.array([not self.rules.blocked(h) for h in hosts],
                        bool) if urls else np.zeros(0, bool)
        out = batch.append_column("canon_url", pa.array(canon, pa.string()))
        out = out.append_column("host", pa.array(hosts, pa.string()))
        # int64 join key for the keys-only dedup exchange (the repo's
        # url -> id convention, doc_ids_from_urls, top bit cleared)
        out = out.append_column("url_h", pa.array(
            np.right_shift(fnv1a64_batch(urls), np.uint64(1))
            .astype(np.int64)))
        return out.filter(pa.array(keep))


def dedup_canonical_urls(pages, rules: HostRules | None = None):
    """Canonical-URL dedup over a pages Dataset: clean + canonicalize,
    then keep ONE page per canonical url (winner = lexicographically
    smallest original url — deterministic across runs and block layouts).

    The exchange is keys-only: (canon_url, url) rows sort once and a
    keep-first run-scan picks winners; the html column never shuffles —
    winners re-select their full rows via the broadcast/side-parquet
    semi-filter idiom (stages/runs.py).

    Collision contract (probabilistic, shared engine-wide): the winner
    re-selection keys on url_h = the 63-bit FNV-1a url hash — the SAME
    `doc_ids_from_urls` convention that keys every document in the index,
    so a colliding url pair is already one doc_id everywhere downstream;
    this stage adds no new collision class. P(any collision) ~ n^2/2^64
    (~3e-7 at a 10^9-url crawl). A collision here keeps a loser row
    (false keep, removed later by content-hash dedup), never drops a
    winner."""
    from .runs import keep_first_per_run, semi_id_filter

    rules_ref = ray.put(rules or HostRules())
    cleaned = pages.map_batches(
        UrlCleaner, fn_constructor_args=(rules_ref,),
        batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4)).materialize()

    def keys_only(batch: pa.Table) -> pa.Table:
        return batch.select(["canon_url", "url", "url_h"])

    keys = cleaned.map_batches(keys_only, batch_format="pyarrow",
                               batch_size=65536)
    winners = keep_first_per_run(
        keys.sort(["canon_url", "url"]).materialize(),
        key_cols=["canon_url"], order_cols=["canon_url", "url"])

    def id_col(batch: pa.Table) -> pa.Table:
        return pa.table({"url_h": batch["url_h"]})

    return semi_id_filter(
        cleaned, winners.map_batches(id_col, batch_format="pyarrow"),
        id_col="url_h")


class RobotsGate:
    """map_batches stage: drop page rows whose path the host's robots.txt
    disallows for `agent` (kernel/robots.py, RFC 9309 longest-match
    semantics). The host -> robots.txt text map is host-cardinality and
    rides ONE ray.put broadcast; each actor/worker process parses and
    compiles the rules ONCE in __init__ — batches only pay a dict lookup
    plus compiled-regex matches. Hosts absent from the map are allowed
    (the fetch-failed convention RFC 9309 §2.3.1.4 prescribes for 4xx)."""

    def __init__(self, robots_ref, agent: str):
        from ..kernel.robots import parse_robots

        robots = (ray.get(robots_ref)
                  if isinstance(robots_ref, ray.ObjectRef) else robots_ref)
        self.rules = {h: parse_robots(t, agent) for h, t in robots.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        keep = np.zeros(len(urls), bool)
        for i, u in enumerate(urls):
            r = self.rules.get(url_host(u))
            keep[i] = r is None or r.allowed(urlsplit(u).path or "/")
        return batch.filter(pa.array(keep))
