"""Engine configuration: dictionary, stop words, separators, BM25 constants.

Semantics sourced from the reference (values only, not code):
  - stop words: /root/reference/src/meilisearch_integration/settings_manager.py:65-69
    (this is the list that actually reaches the index; the slightly different list in
    token_processor.py:426-431 never does).
  - separators: settings_manager.py:30-36 (U+200B zero-width space family).
  - non-separator marks: settings_manager.py:39-56.
  - thresholds: doc "is Thai" ratio > 0.5 (thai_segmenter.py:306-312), query > 0.3
    (src/tokenizer/query_processor.py:502-507).
  - known long words never split: token_processor.py:380-387.
  - BM25 constants k1=1.2, b=0.75 per BASELINE.json north_star.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

DATA_DIR = Path(__file__).parent / "data"

THAI_WORD_SEPARATOR = "​"  # zero-width space
THAI_COMPOUND_SEPARATOR = "​​"

# settings_manager.py:65-69 — the index-side stop-word list (note ที่ appears twice there;
# we keep a set).
THAI_STOP_WORDS = frozenset(
    [
        "และ", "หรือ", "แต่", "เพราะ", "ถ้า", "เมื่อ", "ที่", "ซึ่ง",
        "ใน", "บน", "จาก", "ไป", "มา", "ได้", "เป็น", "คือ",
        "มี", "ไม่", "ไม่ใช่", "ก็", "จึง", "เลย", "แล้ว", "อยู่",
    ]
)

# token_processor.py:380-387 — common long words that must never be compound-split.
KNOWN_LONG_WORDS = frozenset(
    [
        "สวัสดีครับ", "สวัสดีค่ะ", "ขอบคุณครับ", "ขอบคุณค่ะ",
        "ประเทศไทย", "กรุงเทพมหานคร", "มหาวิทยาลัย",
    ]
)

THAI_DOC_RATIO = 0.5    # thai_segmenter.py:306-312
THAI_QUERY_RATIO = 0.3  # query_processor.py:502-507

BM25_K1 = 1.2
BM25_B = 0.75
POSTING_BLOCK = 128  # docs per block for block-max metadata


def load_compound_dict(path: str | Path | None = None) -> list[str]:
    """Flatten the {category: [words]} compound dictionary (shape of the reference's
    data/dictionaries/thai_compounds.json; loader semantics of factory.py:22-65:
    flatten, strip, dedup, keep order)."""
    p = Path(path) if path else DATA_DIR / "thai_compounds.json"
    raw = json.loads(p.read_text(encoding="utf-8"))
    seen: set[str] = set()
    out: list[str] = []
    for words in raw.values():
        for w in words:
            w = w.strip()
            if w and w not in seen:
                seen.add(w)
                out.append(w)
    return out


def load_base_words(path: str | Path | None = None) -> list[str]:
    """Base Thai vocabulary (stand-in for pythainlp's thai_words(), which is not
    available in this environment — thai_segmenter.py:72 unions it with the custom
    dictionary)."""
    p = Path(path) if path else DATA_DIR / "thai_base_words.txt"
    return [w for w in p.read_text(encoding="utf-8").splitlines() if w.strip()]


@dataclass(frozen=True)
class EngineConfig:
    """Immutable build/query configuration; broadcast into actors by value."""

    compound_dict_path: str = str(DATA_DIR / "thai_compounds.json")
    base_words_path: str = str(DATA_DIR / "thai_base_words.txt")
    k1: float = BM25_K1
    b: float = BM25_B
    posting_block: int = POSTING_BLOCK
    num_shards: int = 32          # index shard count (hash(term) % num_shards)
    remove_stop_words: bool = True
    lowercase_latin: bool = True
    index_compound_parts: bool = True  # index compound sub-tokens (partial-compound search)
    # store per-occurrence token positions in the posting shards (enables true
    # token-adjacency phrase search, Meilisearch-style, at ~1 varint byte per
    # occurrence; off by default — the substring-verify phrase fallback needs
    # only the docs table)
    store_positions: bool = False
    stop_words: frozenset[str] = THAI_STOP_WORDS
    # Meilisearch tokenizer settings (settings_manager.py:30-46,117-118):
    # separator_tokens = EXTRA strings that split tokens (whitespace, U+200B
    # and punctuation already separate by default — the reference's default
    # list is a no-op here, the setting exists for user additions like "|");
    # non_separator_tokens = strings that must NOT separate: a listed token
    # glues its immediate word neighbours ("e-mail", "#hashtag", "c++").
    # Defaults empty == byte-identical default tokenization (no version bump).
    separator_tokens: tuple[str, ...] = ()
    non_separator_tokens: tuple[str, ...] = ()

    def dictionary_words(self) -> tuple[list[str], list[str]]:
        """(base_words, custom_compound_words)."""
        return load_base_words(self.base_words_path), load_compound_dict(
            self.compound_dict_path
        )

    def dictionary_hash(self) -> str:
        """Content hash of the full dictionary, recorded in build lineage."""
        base, custom = self.dictionary_words()
        h = hashlib.sha256()
        for w in base:
            h.update(w.encode("utf-8") + b"\n")
        h.update(b"--custom--\n")
        for w in custom:
            h.update(w.encode("utf-8") + b"\n")
        if self.separator_tokens or self.non_separator_tokens:
            # tokenizer settings change index-term semantics, so they key the
            # same caches the dictionary does; conditional so default-config
            # hashes (and existing lineage records) are unchanged
            h.update(repr((sorted(self.separator_tokens),
                           sorted(self.non_separator_tokens))).encode())
        return h.hexdigest()[:16]
