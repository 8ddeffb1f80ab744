"""Dictionary trie + newmm-style longest-matching Thai segmentation.

Built from scratch (pythainlp is not available here and the north rule forbids
porting). Semantics modeled on the reference's use of a dictionary tokenizer
built once from `thai_words() | custom_dict` (thai_segmenter.py:66-76):

  * longest dictionary match wins at each position (greedy maximal matching —
    deterministic, single pass, O(text * max_word_len));
  * consecutive characters with no dictionary match are grouped into one
    "unknown" run token (newmm groups unknown Thai spans the same way);
  * whitespace runs are preserved as tokens (keep_whitespace=True,
    thai_segmenter.py:111-115);
  * non-Thai runs (latin / digit / punct) are emitted as per-class run tokens.

The trie is plain nested dicts with a terminal marker — built once per actor in
__init__ and shared across batches.
"""

from __future__ import annotations

from .charclass import is_thai_char

_END = "\x00"  # terminal marker key inside trie nodes


class Trie:
    __slots__ = ("root", "max_len", "size")

    def __init__(self, words: list[str] | set[str] = ()):  # type: ignore[assignment]
        self.root: dict = {}
        self.max_len = 0
        self.size = 0
        for w in words:
            self.add(w)

    def add(self, word: str) -> None:
        if not word:
            return
        node = self.root
        for ch in word:
            node = node.setdefault(ch, {})
        if _END not in node:
            node[_END] = True
            self.size += 1
            if len(word) > self.max_len:
                self.max_len = len(word)

    def __contains__(self, word: str) -> bool:
        node = self.root
        for ch in word:
            node = node.get(ch)
            if node is None:
                return False
        return _END in node

    def longest_prefix(self, text: str, start: int) -> int:
        """Length of the longest dictionary word starting at text[start]; 0 if none."""
        node = self.root
        best = 0
        i = start
        n = len(text)
        while i < n:
            node = node.get(text[i])
            if node is None:
                break
            i += 1
            if _END in node:
                best = i - start
        return best


# Thai dependent vowels / tone marks / thanthakhat — a DICTIONARY MATCH must
# never leave one of these stranded at the next token start (TCC safety;
# pythainlp's newmm guarantees the same via Thai Character Cluster rules).
# Ranges: mai han-akat U+0E31, sara am..sara uee U+0E33-0E3A (plus phinthu),
# tone marks + thanthakhat etc. U+0E47-0E4E. Malformed input that BEGINS with
# orphan marks (no base consonant anywhere before them) groups them into their
# own unknown-run token — garbage-in, lossless-garbage-out.
_COMBINING = frozenset(
    chr(c) for c in [0x0E31, *range(0x0E33, 0x0E3B), *range(0x0E47, 0x0E4F)]
)


def is_combining_mark(c: str) -> bool:
    return c in _COMBINING


def _char_class(c: str) -> int:
    """0=thai 1=space 2=alpha 3=digit 4=other — run classes for non-dictionary spans."""
    if is_thai_char(c):
        return 0
    if c.isspace():
        return 1
    if c.isalpha():
        return 2
    if c.isdigit():
        return 3
    return 4


def segment(text: str, trie: Trie, keep_whitespace: bool = True) -> list[str]:
    """Segment `text` into tokens by greedy longest dictionary matching.

    Thai spans: longest trie match at each position; unmatched Thai chars are
    accumulated into one unknown-run token (flushed when a match or class change
    occurs). Non-Thai spans: grouped into maximal same-class runs (alpha, digit,
    other); whitespace runs kept iff keep_whitespace.
    """
    tokens: list[str] = []
    n = len(text)
    i = 0
    unk_start = -1  # start of current unknown-Thai run, -1 if none

    def flush_unknown(end: int) -> None:
        nonlocal unk_start
        if unk_start >= 0:
            tokens.append(text[unk_start:end])
            unk_start = -1

    while i < n:
        c = text[i]
        if is_thai_char(c):
            m = trie.longest_prefix(text, i)
            # TCC safety: a match whose NEXT char is a combining mark would
            # strand that mark at a token start — reject and treat the span as
            # part of the unknown run instead
            if m > 0 and i + m < n and text[i + m] in _COMBINING:
                m = 0
            if m > 0:
                flush_unknown(i)
                tokens.append(text[i : i + m])
                i += m
            else:
                if unk_start < 0:
                    unk_start = i
                i += 1
        else:
            flush_unknown(i)
            cls = _char_class(c)
            j = i + 1
            while j < n and not is_thai_char(text[j]) and _char_class(text[j]) == cls:
                j += 1
            run = text[i:j]
            if cls != 1 or keep_whitespace:
                tokens.append(run)
            i = j
    flush_unknown(n)
    return tokens
