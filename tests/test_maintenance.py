"""Reindex (S4) + tombstone deletes (S5) tests."""

import os

import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.maintenance import (
    delete_by_url,
    delete_docs,
    load_tombstones,
    needs_reindex,
    reindex,
)
from meilisearch_thai_ray.index.search import SearchEngine

CFG = EngineConfig(num_shards=4)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("maint")
    pages = str(root / "pages")
    out = str(root / "index")
    write_pages_parquet(pages, 150, rows_per_file=75)
    build_index(pages, out, CFG, num_salts=1, batch_size=64)
    return str(root), out


def test_needs_reindex_false_when_unchanged(built):
    _, out = built
    assert not needs_reindex(out, CFG)
    assert reindex(out, out + "_noop", CFG) is None


def test_delete_then_search_excludes(built):
    _, out = built
    eng = SearchEngine(out)
    hits = eng.search("อาหาร", k=5)
    assert hits
    victim = hits[0][0]
    assert delete_docs(out, [victim]) == 1
    assert delete_docs(out, [victim]) == 0  # idempotent
    eng2 = SearchEngine(out)  # fresh engine sees tombstones
    for mode in ("exhaustive", "wand"):
        ids = [d for d, _ in eng2.score_topk(eng2.query_terms("อาหาร"), 10, mode=mode)]
        assert victim not in ids
        assert ids  # other docs still served


def test_delete_by_url(built):
    _, out = built
    import pyarrow.dataset as pads

    docs = pads.dataset(os.path.join(out, "docs")).to_table(columns=["doc_id", "url"])
    url = docs["url"][0].as_py()
    did = docs["doc_id"][0].as_py()
    before = len(load_tombstones(out))
    delete_by_url(out, [url])
    after = load_tombstones(out)
    assert did in after and len(after) >= before


def test_reindex_drops_tombstones(built):
    root, out = built
    dead = sorted(load_tombstones(out))
    assert dead
    out2 = os.path.join(root, "index_reindexed")
    meta = reindex(out, out2, CFG, force=True)
    assert meta is not None
    eng = SearchEngine(out2)
    assert not load_tombstones(out2)
    # dropped docs are physically absent from the new index
    import pyarrow.dataset as pads

    new_ids = set(
        pads.dataset(os.path.join(out2, "docs")).to_table(columns=["doc_id"])
        ["doc_id"].to_pylist()
    )
    assert not (set(dead) & new_ids)
    # stats reflect the smaller corpus
    assert meta["n_docs"] == len(new_ids)
    assert eng.search("อาหาร", k=3)

def test_tombstone_files_content_named(built):
    """Tombstone files are named by the content hash of their id set, so
    concurrent delete calls can never collide on a directory-count ordinal
    and silently overwrite each other."""
    _, out = built
    d = os.path.join(out, "tombstones")
    before = set(os.listdir(d)) if os.path.isdir(d) else set()
    delete_docs(out, [987654321])
    delete_docs(out, [987654322])
    after = set(os.listdir(d))
    new = after - before
    assert len(new) == 2  # distinct names for distinct id sets
    assert {987654321, 987654322} <= load_tombstones(out)
    # re-deleting already-tombstoned ids is a no-op (no new file)
    assert delete_docs(out, [987654321]) == 0
    assert set(os.listdir(d)) == after


def test_snapshot_restore_bit_identical_search(built, tmp_path):
    """snapshot -> restore -> a SearchEngine over the restored dir returns
    bit-identical results; tampering with a snapshot file makes verify and
    restore fail loudly (no half-restore)."""
    from meilisearch_thai_ray.index.maintenance import (
        restore_snapshot, snapshot, verify_snapshot)

    _, out = built
    snap = str(tmp_path / "snap")
    manifest = snapshot(out, snap)
    assert len(manifest["files"]) > 3
    verify_snapshot(snap)

    restored = str(tmp_path / "restored")
    restore_snapshot(snap, restored)
    q = ["สาหร่าย"]
    orig = SearchEngine(out).score_topk(q, k=10)
    got = SearchEngine(restored).score_topk(q, k=10)
    assert got == orig  # bit-identical scores and ranks

    # duplicate snapshots refuse to overwrite
    with pytest.raises(FileExistsError):
        snapshot(out, snap)

    # corrupt one data file: verify + restore must fail, nothing written
    victim = next(os.path.join(snap, rel) for rel in manifest["files"]
                  if rel != "snapshot_manifest.json")
    with open(victim, "r+b") as f:
        f.seek(0)
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError):
        verify_snapshot(snap)
    broken = str(tmp_path / "broken")
    with pytest.raises(ValueError):
        restore_snapshot(snap, broken)
    assert not os.path.exists(broken)
