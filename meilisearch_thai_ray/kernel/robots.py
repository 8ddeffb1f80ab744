"""Robots Exclusion Protocol parser/matcher (RFC 9309 subset) — the
crawl-politeness gate a web-scale ingest needs in front of extraction.
The reference has no crawler (its inputs are pre-fetched pages), so this
kernel follows the public spec directly; pure and versioned like the
other kernels (the distributed stage and the pytest oracle call the ONE
implementation).

Rules implemented (RFC 9309 §2):
  - groups: consecutive `User-agent:` lines share the following
    `Allow:`/`Disallow:` rules; a crawler uses the union of the groups
    whose product token matches its own (case-insensitive, exact token),
    else the union of `*` groups, else everything is allowed;
  - matching: rules are path prefixes with `*` (any chars) and a final
    `$` (end anchor); the MOST SPECIFIC rule wins (longest pattern
    length in octets), `Allow` winning length ties;
  - an empty `Disallow:` value matches nothing (allow all);
  - `#` starts a comment; unknown directives are ignored.
"""

from __future__ import annotations

import re

ROBOTS_VERSION = "1"


def _rule_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile(rx + (r"\Z" if anchored else ""))


class RobotsRules:
    """Compiled allow/disallow rule set for ONE crawler token. Decisions
    are deterministic: longest-pattern-wins, Allow beats Disallow on
    ties, no matching rule = allowed."""

    __slots__ = ("_rules",)

    def __init__(self, rules: list[tuple[bool, str]]):
        # sort once: longer pattern first, Allow before Disallow on ties
        # -> the FIRST match is the verdict
        self._rules = [(allow, len(pat), _rule_regex(pat))
                       for allow, pat in sorted(
                           rules, key=lambda r: (-len(r[1]), not r[0]))]

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        for allow, _, rx in self._rules:
            if rx.match(path):
                return allow
        return True


_ALLOW_ALL = RobotsRules([])


def parse_robots(text: bytes | str, agent: str) -> RobotsRules:
    """robots.txt -> RobotsRules for `agent` (product token). Groups whose
    token equals agent (case-insensitive) take precedence over `*`
    groups; with neither present everything is allowed."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    agent = agent.lower()
    mine: list[tuple[bool, str]] = []
    star: list[tuple[bool, str]] = []
    current: list[list[tuple[bool, str]]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                current = []
                in_agent_run = True
            tok = val.lower()
            if tok == agent:
                current.append(mine)
            elif tok == "*":
                current.append(star)
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if not val:
                continue  # empty Disallow/Allow matches nothing
            for bucket in current:
                bucket.append((key == "allow", val))
        else:
            in_agent_run = False  # crawl-delay / sitemap end the UA run
    if mine:
        return RobotsRules(mine)
    if star:
        return RobotsRules(star)
    return _ALLOW_ALL


def robots_sitemaps(text: bytes | str) -> list[str]:
    """`Sitemap:` directives of a robots.txt — the sitemaps-protocol
    discovery mechanism (sitemaps.org: the directive is independent of any
    user-agent group and may appear anywhere in the file). Order preserved,
    duplicates dropped, empty values skipped; comments stripped with the
    same rule as the rule parser. Values are returned as written (the spec
    requires absolute URLs; a lenient consumer may resolve relative ones
    against the fetch URL — that policy belongs to the caller)."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if val and val not in seen:
            seen.add(val)
            out.append(val)
    return out
