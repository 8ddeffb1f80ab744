"""ST6: dictionary hot reload — swap the query-side dictionary without a
service restart.

Reference semantics (values/behavior only, no code):
  * /root/reference/src/search_proxy/config/hot_reload.py:24-211 — a watchdog
    Observer per config directory fires on file modification, debounced 1 s,
    reloads the custom dictionary and notifies registered callbacks.
  * /root/reference/src/search_proxy/services/factory.py:19-29,114-118 — the
    loaded dictionary is cached at CLASS level so every service instance in
    the process shares one copy, and a reload swaps that shared copy.

Ray re-expression: there is no single process to hang an inotify Observer off
— query analysis runs wherever the proxy lives (driver, a serving actor, or a
`map_batches` actor pool), and each Ray worker is its own process. The
equivalent primitive is a CONTENT-HASH poller that every consumer can
revalidate cheaply and idempotently:

  * `DictionaryWatcher.poll()` re-hashes the dictionary files (a few KB) and
    bumps a monotonic version + fires callbacks when the bytes actually
    changed. Safe to call per search request; rewriting identical content is
    a no-op (content compare subsumes the reference's mtime debounce).
  * `DictionaryWatcher.start(interval)` runs poll() on a daemon thread — the
    direct Observer analog for long-lived serving actors.
  * `cached_tokenizer(config)` is the class-level cache: one
    `DocumentTokenizer` per (config, dictionary-content) key shared by every
    proxy/actor in the process; a file edit changes the key, so stale and
    fresh tokenizers never mix.

The INDEX keeps the dictionary hash it was built with in its lineage
(`meta.json`); after a reload, `index.maintenance.needs_reindex()` reports
the staleness exactly as the reference logs "dictionary changed, reindex
recommended" — queries re-analyze with the new dictionary immediately, index
terms catch up at the next build.
"""

from __future__ import annotations

import hashlib
import threading
from pathlib import Path
from typing import Callable

from ..config import EngineConfig

__all__ = ["DictionaryWatcher", "cached_tokenizer", "tokenizer_cache_key"]


def _content_hash(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in paths:
        try:
            h.update(Path(p).read_bytes())
        except OSError:
            h.update(b"<missing>")
        h.update(b"\x00")
    return h.hexdigest()


class DictionaryWatcher:
    """Content-hash poller over an EngineConfig's dictionary files.

    poll() is the synchronous form (call it at any request boundary);
    start()/stop() run it on a daemon thread like the reference's Observer.
    Callbacks receive the new version int; callback errors are isolated the
    way the reference isolates them (logged, other callbacks still run).
    """

    def __init__(self, config: EngineConfig):
        self.config = config
        self._paths = [config.base_words_path, config.compound_dict_path]
        self._lock = threading.Lock()
        self._hash = _content_hash(self._paths)
        self._version = 0
        self._callbacks: list[Callable[[int], None]] = []
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    @property
    def version(self) -> int:
        return self._version

    @property
    def dictionary_hash(self) -> str:
        return self._hash

    def register(self, callback: Callable[[int], None]) -> None:
        self._callbacks.append(callback)

    def poll(self) -> bool:
        """Re-hash the watched files; True iff the content changed."""
        h = _content_hash(self._paths)
        with self._lock:
            if h == self._hash:
                return False
            self._hash = h
            self._version += 1
            version = self._version
            callbacks = list(self._callbacks)
        for cb in callbacks:
            try:
                cb(version)
            except Exception:  # noqa: BLE001 — one bad callback must not
                pass           # block the others (hot_reload.py:178-183)
        return True

    # ----- Observer analog for long-lived serving actors -----

    def start(self, interval: float = 1.0) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def _run() -> None:
            while not self._stop.wait(interval):
                self.poll()

        self._thread = threading.Thread(
            target=_run, name="dictionary-watcher", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join()
        self._thread = None


# ----- class-level tokenizer cache (factory.py:19-29 semantics) -----

_TOKENIZER_CACHE: dict[tuple, "object"] = {}
_CACHE_LOCK = threading.Lock()


def tokenizer_cache_key(config: EngineConfig) -> tuple:
    """(semantic config fields, dictionary CONTENT hash) — an edited file
    changes the key, an identical rewrite doesn't."""
    return (
        config.remove_stop_words,
        config.lowercase_latin,
        config.index_compound_parts,
        tuple(sorted(config.stop_words)),
        tuple(sorted(config.separator_tokens)),
        tuple(sorted(config.non_separator_tokens)),
        _content_hash([config.base_words_path, config.compound_dict_path]),
    )


def cached_tokenizer(config: EngineConfig):
    """Process-wide shared DocumentTokenizer for this config + dictionary
    content. Every SearchProxy (and any actor) in the process reuses one trie
    until the dictionary bytes change."""
    from ..kernel.tokenize import DocumentTokenizer

    key = tokenizer_cache_key(config)
    with _CACHE_LOCK:
        tok = _TOKENIZER_CACHE.get(key)
        if tok is None:
            if len(_TOKENIZER_CACHE) > 8:  # old dictionary generations
                _TOKENIZER_CACHE.clear()
            tok = DocumentTokenizer(config)
            _TOKENIZER_CACHE[key] = tok
    return tok
