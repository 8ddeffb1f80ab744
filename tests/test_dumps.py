"""Dumps: portable export/import (documents + settings + tombstones;
shards re-derived on import) vs snapshot's bit-copy."""

import json
import os

import pytest

from meilisearch_thai_ray.config import EngineConfig
import pyarrow.parquet as pq

from meilisearch_thai_ray.fixtures.pages import (generate_pages,
                                                 write_pages_parquet)
from meilisearch_thai_ray.index.admin import IndexAdmin
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.dumps import create_dump, import_dump
from meilisearch_thai_ray.index.incremental import GenerationalEngine
from meilisearch_thai_ray.index.search import SearchEngine

CFG = EngineConfig(num_shards=4)


@pytest.fixture(scope="module")
def dumped(ray_session, tmp_path_factory):
    """Two registered indexes — one plain, one with tuned tokenizer
    settings, a delta generation AND a tombstone — dumped once."""
    root = tmp_path_factory.mktemp("dumps")
    pages_a = str(root / "pages_a")
    write_pages_parquet(pages_a, 80, rows_per_file=40)
    idx_a = str(root / "idx_a")
    build_index(pages_a, idx_a, CFG, num_salts=1, batch_size=64)

    tuned_cfg = EngineConfig(num_shards=4, non_separator_tokens=("-",))
    pages_b = str(root / "pages_b")
    write_pages_parquet(pages_b, 60, rows_per_file=30)
    idx_b = str(root / "idx_b")
    build_index(pages_b, idx_b, tuned_cfg, num_salts=1, batch_size=64)

    adm = IndexAdmin(str(root / "registry.json"))
    adm.wait_for_task(adm.create_index("alpha", idx_a))
    adm.wait_for_task(adm.create_index("beta", idx_b))

    # mutate alpha: one delta generation + one tombstone
    pages_a2 = str(root / "pages_a2")
    os.makedirs(pages_a2)
    pq.write_table(generate_pages(20, start=80),
                   os.path.join(pages_a2, "pages2.parquet"))
    adm.wait_for_task(adm.add_documents("alpha", pages_a2))
    eng = GenerationalEngine(idx_a)
    victim = eng.search("data", k=1)[0][0]
    adm.wait_for_task(adm.delete_documents("alpha", [victim]))

    dump_dir = str(root / "dump")
    create_dump(str(root / "registry.json"), dump_dir, ledger=adm.ledger)
    return root, adm, dump_dir, idx_a, idx_b, victim


def test_dump_then_import_serves_identical_results(dumped, tmp_path):
    root, adm, dump_dir, idx_a, idx_b, victim = dumped
    out = import_dump(dump_dir, str(tmp_path / "restored"),
                      str(tmp_path / "registry.json"))
    assert set(out) == {"alpha", "beta"}

    # exactness oracle: compact() — the SAME consolidation semantics
    # (newest wins, tombstones purged, stats made physically true again)
    from meilisearch_thai_ray.index.incremental import compact

    compact(idx_a, str(tmp_path / "compacted"))
    cmp_eng = SearchEngine(str(tmp_path / "compacted"))
    gen_eng = GenerationalEngine(idx_a)   # rank identity (scores use the
    rest = SearchEngine(out["alpha"])     # pre-compaction stale stats)
    for q in ("data", "search engine", "สาหร่าย"):
        r = [(d, round(sc, 6)) for d, sc in rest.search(q, k=10)]
        c = [(d, round(sc, 6)) for d, sc in cmp_eng.search(q, k=10)]
        assert r == c
        assert [d for d, _ in gen_eng.search(q, k=10)] == [d for d, _ in r]

    # the tombstoned doc is gone for good in the rebuilt docs table
    import pyarrow.dataset as pads

    ids = pads.dataset(os.path.join(out["alpha"], "docs")).to_table(
        columns=["doc_id"])["doc_id"].to_pylist()
    assert victim not in ids


def test_dump_preserves_tokenizer_settings(dumped, tmp_path):
    root, adm, dump_dir, idx_a, idx_b, victim = dumped
    out = import_dump(dump_dir, str(tmp_path / "r2"))
    meta = json.load(open(os.path.join(out["beta"], "meta.json")))
    assert meta["non_separator_tokens"] == ["-"]
    # and the restored engine applies them at query time
    orig = SearchEngine(idx_b)
    rest = SearchEngine(out["beta"])
    for q in ("data", "e-mail"):
        assert ([d for d, _ in orig.search(q, k=10)]
                == [d for d, _ in rest.search(q, k=10)])


def test_dump_records_task_and_refuses_overwrite(dumped):
    root, adm, dump_dir, *_ = dumped
    rec = adm.tasks(types=["dumpCreation"])[0]
    assert rec["status"] == "succeeded"
    assert rec["details"]["indexes"] == 2
    with pytest.raises(FileExistsError):
        create_dump(str(root / "registry.json"), dump_dir)


def test_import_rejects_newer_dump_version(dumped, tmp_path):
    root, adm, dump_dir, *_ = dumped
    meta_path = os.path.join(dump_dir, "metadata.json")
    meta = json.load(open(meta_path))
    bad = dict(meta, dumpVersion=999)
    bad_dir = str(tmp_path / "bad_dump")
    os.makedirs(bad_dir)
    json.dump(bad, open(os.path.join(bad_dir, "metadata.json"), "w"))
    with pytest.raises(ValueError, match="newer"):
        import_dump(bad_dir, str(tmp_path / "x"))
