"""Meilisearch filter-expression language -> AST (pure python, no Ray).

The reference builds Meilisearch filter STRINGS from its dict DSL
(search_executor.py:766-843) and lets Meilisearch parse them; this engine
replaces Meilisearch, so the parser lives here. Grammar is the documented
Meilisearch filter syntax (the subset meaningful over parquet metadata
columns):

    expr      := or
    or        := and ("OR" and)*                (AND binds tighter than OR)
    and       := unary ("AND" unary)*
    unary     := "NOT" unary | "(" expr ")" | condition
    condition := attr ("=" | "!=" | ">" | ">=" | "<" | "<=") value
               | attr "IN" "[" value ("," value)* "]"
               | attr value "TO" value           (inclusive range)
               | attr "EXISTS" | attr "NOT" "EXISTS"
               | attr "IS" "NULL" | attr "IS" "NOT" "NULL"

Values: single/double-quoted strings, bare words, or numbers (ints stay
ints). Keywords are case-insensitive; attribute and value case is preserved.

The AST is a plain tuple tree — ("and"|"or", a, b), ("not", a),
("cmp", attr, op, value), ("in", attr, [values]), ("range", attr, lo, hi),
("exists", attr, bool) — rendered by stages/filter_dsl.py to a pyarrow
dataset expression (pushdown) and to an ANSI-SQL WHERE clause (oracle
parity), so one parse drives both sides of the correctness gate.
"""

from __future__ import annotations

import re

FILTER_LANG_VERSION = "1"

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<op>!=|>=|<=|=|>|<|\(|\)|\[|\]|,)
    | (?P<word>[^\s()\[\],'"=!<>]+)
    )""", re.VERBOSE)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "TO", "EXISTS", "IS", "NULL"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"bad filter syntax at: {s[pos:pos+20]!r}")
            break
        pos = m.end()
        if m.group("str") is not None:
            raw = m.group("str")
            body = raw[1:-1]
            out.append(("value", re.sub(r"\\(.)", r"\1", body)))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            w = m.group("word")
            if w.upper() in _KEYWORDS:
                out.append(("kw", w.upper()))
            else:
                out.append(("word", w))
    return out


def _coerce(word: str):
    try:
        return int(word)
    except ValueError:
        try:
            return float(word)
        except ValueError:
            return word


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None):
        k, v = self.take()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.or_()
        if self.peek() != (None, None):
            raise ValueError(f"trailing tokens: {self.peek()[1]!r}")
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("kw", "OR"):
            self.take()
            node = ("or", node, self.and_())
        return node

    def and_(self):
        node = self.unary()
        while self.peek() == ("kw", "AND"):
            self.take()
            node = ("and", node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("kw", "NOT"):
            self.take()
            return ("not", self.unary())
        if self.peek() == ("op", "("):
            self.take()
            node = self.or_()
            self.expect("op", ")")
            return node
        return self.condition()

    def _value(self):
        k, v = self.take()
        if k == "value":
            return v
        if k == "word":
            return _coerce(v)
        raise ValueError(f"expected a value, got {v!r}")

    def condition(self):
        k, attr = self.take()
        if k not in ("word", "value"):
            raise ValueError(f"expected an attribute, got {attr!r}")
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", ">", ">=", "<", "<="):
            self.take()
            return ("cmp", attr, v, self._value())
        if (k, v) == ("kw", "IN"):
            self.take()
            self.expect("op", "[")
            vals = [self._value()]
            while self.peek() == ("op", ","):
                self.take()
                vals.append(self._value())
            self.expect("op", "]")
            return ("in", attr, vals)
        if (k, v) == ("kw", "EXISTS"):
            self.take()
            return ("exists", attr, True)
        if (k, v) == ("kw", "NOT"):
            self.take()
            self.expect("kw", "EXISTS")
            return ("exists", attr, False)
        if (k, v) == ("kw", "IS"):
            self.take()
            k2, v2 = self.take()
            if (k2, v2) == ("kw", "NULL"):
                return ("exists", attr, False)
            if (k2, v2) == ("kw", "NOT"):
                self.expect("kw", "NULL")
                return ("exists", attr, True)
            raise ValueError(f"expected NULL after IS, got {v2!r}")
        # range: attr lo TO hi
        lo = self._value()
        self.expect("kw", "TO")
        hi = self._value()
        return ("range", attr, lo, hi)


def parse_filter(s: str):
    """Meilisearch filter string -> AST tuple tree (see module docstring)."""
    toks = _tokenize(s)
    if not toks:
        raise ValueError("empty filter")
    return _Parser(toks).parse()
