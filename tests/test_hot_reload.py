"""ST6 dictionary hot reload (reference hot_reload.py:24-211 +
factory.py:19-29,114-118 semantics): content-hash watcher, class-level
tokenizer cache, proxy swap, needs_reindex staleness. Pure-python — no Ray."""

import json
import os
import time

from meilisearch_thai_ray.config import DATA_DIR, EngineConfig
from meilisearch_thai_ray.pipelines.search_proxy import SearchProxy
from meilisearch_thai_ray.state.hot_reload import (
    DictionaryWatcher,
    cached_tokenizer,
    tokenizer_cache_key,
)

WAKAME = "สาหร่ายวากาเมะ"


def _write_dict(path: str, drop: str | None = None) -> None:
    raw = json.loads((DATA_DIR / "thai_compounds.json").read_text("utf-8"))
    if drop:
        raw = {k: [w for w in v if w != drop] for k, v in raw.items()}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(raw, f, ensure_ascii=False)


def _tmp_config(tmp_path, drop: str | None = None) -> EngineConfig:
    p = str(tmp_path / "compounds.json")
    _write_dict(p, drop=drop)
    return EngineConfig(compound_dict_path=p)


def test_watcher_content_hash_semantics(tmp_path):
    cfg = _tmp_config(tmp_path, drop=WAKAME)
    w = DictionaryWatcher(cfg)
    fired: list[int] = []
    w.register(fired.append)

    assert not w.poll() and w.version == 0  # nothing changed yet
    # identical rewrite (fresh mtime, same bytes) is a no-op — the content
    # compare subsumes the reference's 1 s mtime debounce
    _write_dict(cfg.compound_dict_path, drop=WAKAME)
    assert not w.poll() and w.version == 0 and fired == []

    _write_dict(cfg.compound_dict_path)  # real change: wakame restored
    assert w.poll() and w.version == 1 and fired == [1]
    assert not w.poll()  # idempotent after the bump


def test_watcher_callback_errors_isolated(tmp_path):
    cfg = _tmp_config(tmp_path, drop=WAKAME)
    w = DictionaryWatcher(cfg)
    seen: list[int] = []
    w.register(lambda v: (_ for _ in ()).throw(RuntimeError("boom")))
    w.register(seen.append)
    _write_dict(cfg.compound_dict_path)
    assert w.poll() and seen == [1]  # second callback still ran


def test_proxy_hot_reload_swaps_segmentation(tmp_path):
    cfg = _tmp_config(tmp_path, drop=WAKAME)
    proxy = SearchProxy(engine=None, config=cfg)
    proxy.enable_hot_reload()  # synchronous form: poll at request boundary
    assert proxy.tokenizer.tokenize(WAKAME) == ["สาหร่าย", "วากาเมะ"]

    _write_dict(cfg.compound_dict_path)  # admin adds the compound
    # next request boundary revalidates + swaps — no restart, no new proxy
    assert proxy.tokenizer.tokenize(WAKAME) == [WAKAME]


def test_class_level_cache_shared_until_content_changes(tmp_path):
    cfg = _tmp_config(tmp_path, drop=WAKAME)
    t1 = cached_tokenizer(cfg)
    t2 = cached_tokenizer(EngineConfig(compound_dict_path=cfg.compound_dict_path))
    assert t1 is t2  # factory.py:19-29 — one trie per process per content
    key_before = tokenizer_cache_key(cfg)
    _write_dict(cfg.compound_dict_path)
    assert tokenizer_cache_key(cfg) != key_before
    assert cached_tokenizer(cfg) is not t1


def test_needs_reindex_after_reload(tmp_path):
    from meilisearch_thai_ray.index.maintenance import needs_reindex
    from meilisearch_thai_ray.kernel.extract import EXTRACTOR_VERSION

    cfg = _tmp_config(tmp_path, drop=WAKAME)
    idx = tmp_path / "index"
    idx.mkdir()
    (idx / "meta.json").write_text(json.dumps({
        "dictionary_hash": cfg.dictionary_hash(),
        "extractor_version": EXTRACTOR_VERSION,
    }))
    assert not needs_reindex(str(idx), cfg)
    _write_dict(cfg.compound_dict_path)  # dictionary drifted from the index
    assert needs_reindex(str(idx), cfg)


def test_watcher_daemon_thread(tmp_path):
    cfg = _tmp_config(tmp_path, drop=WAKAME)
    proxy = SearchProxy(engine=None, config=cfg)
    w = proxy.enable_hot_reload(poll_interval=0.05)
    try:
        _write_dict(cfg.compound_dict_path)
        deadline = time.time() + 5.0
        while w.version == 0 and time.time() < deadline:
            time.sleep(0.02)
        assert w.version >= 1
        assert proxy.tokenizer.tokenize(WAKAME) == [WAKAME]
    finally:
        w.stop()
    assert w._thread is None  # stop() joins cleanly
