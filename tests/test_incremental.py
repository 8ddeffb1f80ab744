"""Incremental adds (delta generations, newest-wins shadowing): the oracle is
BIT-IDENTITY with a full rebuild of the merged corpus."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.incremental import (
    GenerationalEngine,
    add_documents,
)
from meilisearch_thai_ray.index.search import SearchEngine

CFG = EngineConfig(num_shards=4, store_positions=True)

V0 = ["wakame", "seaweed", "salad", "ramen", "noodle", "broth", "spicy",
      "mild", "ginger", "sesame"]


def _mk_pages(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table({
            "url": pa.array([u for u, _t in rows], pa.string()),
            "html": pa.array([f"<p>{t}</p>".encode() for _u, t in rows],
                             pa.binary()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }),
        os.path.join(path, "p.parquet"),
    )


def _corpus_a():
    import random

    rng = random.Random(42)
    rows = []
    for i in range(14):
        words = [V0[rng.randrange(len(V0))] for _ in range(25)]
        rows.append((f"https://inc.ex/{i}", " ".join(words) + " สาหร่ายวากาเมะ"))
    return rows


def _corpus_b():
    import random

    rng = random.Random(43)
    rows = []
    for i in range(5):  # brand-new docs
        words = [V0[rng.randrange(len(V0))] for _ in range(30)]
        rows.append((f"https://inc.ex/new{i}", " ".join(words)))
    # updates: urls 0..2 re-ingested with CHANGED text
    for i in range(3):
        words = [V0[rng.randrange(len(V0))] for _ in range(18)]
        rows.append((f"https://inc.ex/{i}", "updated " + " ".join(words)))
    return rows


def _merged(a, b):
    by_url = {u: t for u, t in a}
    by_url.update({u: t for u, t in b})
    return sorted(by_url.items())


QUERIES = [["wakame"], ["ramen", "broth"], ["updated"], ["spicy", "mild", "ginger"],
           ["sesame", "noodle", "salad"], ["wakame", "wakame", "broth"]]


@pytest.fixture(scope="module")
def incr(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    a, b = _corpus_a(), _corpus_b()
    _mk_pages(str(root / "pagesA"), a)
    _mk_pages(str(root / "pagesB"), b)
    _mk_pages(str(root / "pagesM"), _merged(a, b))
    base = str(root / "base")
    build_index(str(root / "pagesA"), base, CFG, num_salts=2, batch_size=64)
    add_documents(base, str(root / "pagesB"))
    ref = str(root / "ref")
    build_index(str(root / "pagesM"), ref, CFG, num_salts=2, batch_size=64)
    return root, base, ref, a, b


def test_incremental_stats_equal_rebuild(incr):
    _root, base, ref, _a, _b = incr
    ge = GenerationalEngine(base)
    re = SearchEngine(ref)
    assert ge.n_docs == re.n_docs
    assert ge.avgdl == re.avgdl  # exact, not approximate


def test_incremental_scores_bit_identical_to_rebuild(incr):
    _root, base, ref, _a, _b = incr
    ge = GenerationalEngine(base)
    re = SearchEngine(ref)
    for terms in QUERIES:
        for t in set(terms):
            assert ge.df(t) == re.df(t), t
        a = ge.score_topk(terms, k=20, mode="exhaustive")
        b = re.score_topk(terms, k=20, mode="exhaustive")
        assert a == b, terms  # ids AND float64 scores identical
        assert ge.score_topk(terms, k=20, mode="maxscore") == b, terms


def test_incremental_newest_wins(incr):
    """The updated doc scores from its NEW text only."""
    _root, base, _ref, _a, _b = incr
    from meilisearch_thai_ray.functions.hashing import doc_id_from_url

    ge = GenerationalEngine(base)
    updated = {doc_id_from_url(f"https://inc.ex/{i}") for i in range(3)}
    hits = {d for d, _ in ge.score_topk(["updated"], k=20)}
    assert hits == updated  # only re-ingested docs contain "updated"


def test_incremental_phrase_across_generations(incr):
    _root, base, _ref, a, _b = incr
    ge = GenerationalEngine(base)
    assert ge.has_positions
    # a phrase from an ORIGINAL (non-updated) base doc still matches
    url, text = a[5]
    words = text.split()[:2]
    from meilisearch_thai_ray.functions.hashing import doc_id_from_url

    hits = {d for d, _ in ge.phrase_topk(" ".join(words), k=30)}
    assert doc_id_from_url(url) in hits


def test_incremental_second_generation_and_rebuild_identity(incr, tmp_path):
    """A second delta updating a FIRST-delta doc shadows across generations;
    identity with a rebuild of the 3-way merge still holds."""
    root, base, _ref, a, b = incr
    import shutil

    base2 = str(tmp_path / "base2")
    shutil.copytree(base, base2)
    c = [("https://inc.ex/new0", "thirdwave " + "broth " * 10),
         ("https://inc.ex/7", "thirdwave " + "salad " * 12)]
    _mk_pages(str(tmp_path / "pagesC"), c)
    add_documents(base2, str(tmp_path / "pagesC"))
    _mk_pages(str(tmp_path / "pagesM3"), _merged(_merged(a, b), c))
    ref3 = str(tmp_path / "ref3")
    build_index(str(tmp_path / "pagesM3"), ref3, CFG, num_salts=2, batch_size=64)
    ge = GenerationalEngine(base2)
    re = SearchEngine(ref3)
    assert ge.n_docs == re.n_docs and ge.avgdl == re.avgdl
    for terms in QUERIES + [["thirdwave"]]:
        assert ge.score_topk(terms, 20) == re.score_topk(terms, 20), terms


def test_incremental_dictionary_guard(incr, tmp_path):
    _root, base, _ref, _a, _b = incr
    import json

    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    meta_p = os.path.join(clone, "meta.json")
    with open(meta_p) as f:
        m = json.load(f)
    m["dictionary_hash"] = "deadbeef"
    with open(meta_p, "w") as f:
        json.dump(m, f)
    _mk_pages(str(tmp_path / "pg"), [("https://x/1", "hello")])
    with pytest.raises(ValueError, match="reindex"):
        add_documents(clone, str(tmp_path / "pg"))


def test_incremental_resume_incomplete_generation(incr, tmp_path):
    """A crashed add (no `complete` marker) is resumed, not duplicated."""
    _root, base, _ref, _a, _b = incr
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    gen = os.path.join(clone, "deltas", "gen-0000")
    os.remove(os.path.join(gen, "complete"))
    # the engine must ignore the incomplete generation entirely
    ge = GenerationalEngine(clone)
    assert len(ge.generations) == 1
    # resume completes the SAME generation (no gen-0001 appears)
    _mk_pages(str(tmp_path / "pagesB2"), _corpus_b())
    out = add_documents(clone, str(tmp_path / "pagesB2"))
    assert out.endswith("gen-0000")
    assert sorted(os.listdir(os.path.join(clone, "deltas"))) == ["gen-0000"]
    assert GenerationalEngine(clone).n_docs == GenerationalEngine(base).n_docs


def test_incremental_delete_applies_across_generations(incr, tmp_path):
    _root, base, _ref, _a, b = incr
    import shutil

    from meilisearch_thai_ray.functions.hashing import doc_id_from_url
    from meilisearch_thai_ray.index.maintenance import delete_docs

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    victim = doc_id_from_url("https://inc.ex/new0")  # lives in the delta
    delete_docs(clone, [victim])
    ge = GenerationalEngine(clone)
    for terms in QUERIES:
        assert victim not in {d for d, _ in ge.score_topk(terms, k=50)}


def test_resume_refuses_different_pages_source(incr, tmp_path):
    """A crashed add of corpus A must not be 'resumed' with corpus B — the
    completed phase markers would skip B's extraction entirely and the
    generation would silently contain A."""
    _root, base, _ref, _a, _b = incr
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    gen = os.path.join(clone, "deltas", "gen-0000")
    os.remove(os.path.join(gen, "complete"))
    _mk_pages(str(tmp_path / "other"),
              [("https://x/other", "entirely different corpus")])
    with pytest.raises(ValueError, match="different pages source"):
        add_documents(clone, str(tmp_path / "other"))
    # the ORIGINAL source still resumes fine
    _mk_pages(str(tmp_path / "pagesB3"), _corpus_b())
    out = add_documents(clone, str(tmp_path / "pagesB3"))
    assert out.endswith("gen-0000")


def test_resume_refuses_live_lock(incr, tmp_path):
    """An incomplete generation locked by a LIVE process is never co-built."""
    _root, base, _ref, _a, _b = incr
    import shutil

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    gen = os.path.join(clone, "deltas", "gen-0000")
    os.remove(os.path.join(gen, "complete"))
    with open(os.path.join(gen, "lock"), "w") as f:
        f.write("1")  # pid 1 is always alive
    _mk_pages(str(tmp_path / "pagesB4"), _corpus_b())
    with pytest.raises(RuntimeError, match="live"):
        add_documents(clone, str(tmp_path / "pagesB4"))
    # a stale lock (dead pid) is taken over and the add completes
    import subprocess

    dead = subprocess.Popen(["true"])
    dead.wait()
    with open(os.path.join(gen, "lock"), "w") as f:
        f.write(str(dead.pid))
    out = add_documents(clone, str(tmp_path / "pagesB4"))
    assert out.endswith("gen-0000")
    assert not os.path.exists(os.path.join(gen, "lock"))


def test_compact_bit_identical_to_generational(incr, tmp_path):
    """compact() folds base+deltas into one index that serves exactly like
    the generational view — and exactly like a rebuild of the merge."""
    _root, base, ref, _a, _b = incr
    from meilisearch_thai_ray.index.incremental import compact

    out = str(tmp_path / "compacted")
    meta = compact(base, out)
    ge = GenerationalEngine(base)
    ce = SearchEngine(out)
    assert not os.path.isdir(os.path.join(out, "deltas"))
    assert meta["n_docs"] == ge.n_docs and ce.avgdl == ge.avgdl
    for key in ("dictionary_hash", "extractor_version"):
        assert meta[key] == ge.meta[key]
    for terms in QUERIES:
        for t in set(terms):
            assert ce.df(t) == ge.df(t), t
        assert ce.score_topk(terms, 20) == ge.score_topk(terms, 20), terms
    # positions survive compaction: phrase search still works
    assert ce.phrase_topk("updated", k=5)
    # prefix dictionary was rebuilt (sorted termdict, not shard fallback)
    assert os.path.isdir(os.path.join(out, "termdict"))
    assert ce.expand_prefix("wa")


def test_compact_idempotent_resume(incr, tmp_path):
    """Re-running compact on a completed output is a no-op (phases skip)."""
    _root, base, _ref, _a, _b = incr
    from meilisearch_thai_ray.index.incremental import compact

    out = str(tmp_path / "cmp")
    m1 = compact(base, out)

    def _bytes(d):
        out_b = {}
        for root, _dirs, fs in os.walk(os.path.join(d, "shards")):
            for f in fs:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out_b[os.path.relpath(p, d)] = fh.read()
        return out_b

    before = _bytes(out)
    m2 = compact(base, out)
    assert m1 == m2
    assert _bytes(out) == before


def test_compact_drops_tombstones_everywhere(incr, tmp_path):
    """Tombstoned docs (base AND delta residents) are physically gone after
    compaction, and the result is bit-identical to a rebuild of the merged
    corpus minus the deleted urls."""
    root, base, _ref, a, b = incr
    import shutil

    from meilisearch_thai_ray.functions.hashing import doc_id_from_url
    from meilisearch_thai_ray.index.incremental import compact
    from meilisearch_thai_ray.index.maintenance import delete_docs

    clone = str(tmp_path / "clone")
    shutil.copytree(base, clone)
    gone_urls = ["https://inc.ex/5", "https://inc.ex/new0"]  # base + delta
    delete_docs(clone, [doc_id_from_url(u) for u in gone_urls])
    out = str(tmp_path / "cmp")
    compact(clone, out)
    merged = [(u, t) for u, t in _merged(a, b) if u not in gone_urls]
    _mk_pages(str(tmp_path / "pagesMD"), merged)
    ref2 = str(tmp_path / "ref2")
    build_index(str(tmp_path / "pagesMD"), ref2, CFG, num_salts=2,
                batch_size=64)
    ce, re = SearchEngine(out), SearchEngine(ref2)
    assert ce.n_docs == re.n_docs and ce.avgdl == re.avgdl
    gone_ids = {doc_id_from_url(u) for u in gone_urls}
    for terms in QUERIES:
        hits = ce.score_topk(terms, 50)
        assert hits == re.score_topk(terms, 50), terms
        assert not gone_ids & {d for d, _ in hits}
