"""End-to-end continuous-crawl ingestion (pipelines/crawl_refresh.py):
WARC archive -> url dedup -> extract -> near-dup vs the persisted corpus
sketch -> delta generation, with the sketch state advancing per crawl."""

import gzip
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.functions.hashing import doc_id_from_url
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.incremental import GenerationalEngine
from meilisearch_thai_ray.pipelines.crawl_refresh import (
    init_corpus_sketch, refresh_index_from_archive)

CFG = EngineConfig(num_shards=4, store_positions=True)

VOCAB = ["wakame", "seaweed", "salad", "ramen", "noodle", "broth",
         "spicy", "mild", "ginger", "sesame", "tofu", "miso"]


def _text(seed: int, n: int = 40) -> str:
    rng = random.Random(seed)
    return " ".join(VOCAB[rng.randrange(len(VOCAB))] for _ in range(n))


def _warc(records) -> bytes:
    out = []
    for url, text in records:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + f"<p>{text}</p>".encode())
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"Content-Length: {len(body)}\r\n").encode()
        out.append(head + b"\r\n" + body + b"\r\n\r\n")
    return b"".join(out)


@pytest.fixture(scope="module")
def base(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawlref")
    pages = root / "pages"
    pages.mkdir()
    corpus = [(f"https://c.ex/base{i}", _text(100 + i)) for i in range(4)]
    pq.write_table(
        pa.table({
            "url": pa.array([u for u, _ in corpus], pa.string()),
            "html": pa.array([f"<p>{t}</p>".encode() for _, t in corpus],
                             pa.binary()),
            "lang": pa.array(["en"] * len(corpus), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    idx = str(root / "index")
    build_index(str(pages), idx, CFG, num_salts=2, batch_size=64)
    mh = str(root / "mh_index")
    init_corpus_sketch(idx, mh)
    return root, idx, mh, corpus


def test_refresh_dedups_and_serves_new_docs(base):
    root, idx, mh, corpus = base
    new_text = _text(999) + " plutonium"  # unique searchable marker
    recs = [
        # url alias pair: same content, tracking param -> ONE survives
        ("https://c.ex/new0", _text(500)),
        ("https://c.ex/new0?utm_source=feed", _text(500)),
        # exact copy of a corpus doc under a fresh url -> near-dup drop
        ("https://c.ex/copy_of_base0", corpus[0][1]),
        # near-dup of a corpus doc (one changed word) -> drop
        ("https://c.ex/near_base1", corpus[1][1] + " tweak"),
        # genuinely new page -> accepted and searchable
        ("https://c.ex/fresh", new_text),
    ]
    arch = root / "crawl1"
    arch.mkdir()
    (arch / "c1.warc.gz").write_bytes(gzip.compress(_warc(recs)))

    m = refresh_index_from_archive(
        idx, str(arch), mh, str(root / "work1"), threshold=0.8)
    assert m["pages_after_url_dedup"] == 4   # alias collapsed
    assert m["docs_extracted"] == 4
    assert m["near_dup_dropped"] == 2        # exact copy + near-dup
    assert m["accepted"] == 2                # new0 + fresh
    assert m["generation"] is not None

    ge = GenerationalEngine(idx)
    assert ge.n_docs == 6                    # 4 base + 2 accepted
    hits = ge.score_topk(["plutonium"], k=5)
    assert hits and hits[0][0] == doc_id_from_url("https://c.ex/fresh")


def test_second_crawl_dedups_against_absorbed_state(base):
    root, idx, mh, corpus = base
    # near-dup of CRAWL-1's fresh doc -> only droppable if the absorb
    # advanced the sketch state; plus one brand-new doc
    recs = [
        ("https://c.ex/fresh_recrawl", _text(999) + " plutonium again"),
        ("https://c.ex/fresh2", _text(1234) + " xenonflare"),
    ]
    arch = root / "crawl2"
    arch.mkdir()
    (arch / "c2.warc.gz").write_bytes(gzip.compress(_warc(recs)))

    m = refresh_index_from_archive(
        idx, str(arch), mh, str(root / "work2"), threshold=0.8)
    assert m["near_dup_dropped"] == 1
    assert m["accepted"] == 1

    ge = GenerationalEngine(idx)
    assert ge.n_docs == 7
    hits = ge.score_topk(["xenonflare"], k=5)
    assert hits and hits[0][0] == doc_id_from_url("https://c.ex/fresh2")
    # the dropped re-crawl is NOT in the index
    assert not any(
        d == doc_id_from_url("https://c.ex/fresh_recrawl")
        for d, _ in ge.score_topk(["plutonium"], k=10))


def test_robots_gate_in_composite(base, tmp_path):
    """A robots.txt that disallows one host's section drops its pages
    BEFORE extraction; allowed hosts flow through untouched."""
    root, idx, mh, corpus = base
    recs = [
        ("https://blocked.ex/p/one", _text(700)),
        ("https://blocked.ex/p/two", _text(701)),
        ("https://open.ex/p/three", _text(702) + " dysprosium"),
    ]
    arch = tmp_path / "crawl_rb"
    arch.mkdir()
    (arch / "c.warc.gz").write_bytes(gzip.compress(_warc(recs)))

    robots = {"blocked.ex": "User-agent: *\nDisallow: /p/\n",
              "open.ex": "User-agent: *\nDisallow: /private/\n"}
    m = refresh_index_from_archive(
        idx, str(arch), mh, str(tmp_path / "work_rb"),
        robots_map=robots, threshold=0.8)
    assert m["pages_after_url_dedup"] == 1   # only open.ex survives
    assert m["accepted"] == 1
    ge = GenerationalEngine(idx)
    hits = ge.score_topk(["dysprosium"], k=5)
    assert hits and hits[0][0] == doc_id_from_url("https://open.ex/p/three")


def test_crawl_job_cli_end_to_end(base, tmp_path):
    """scripts/crawl_job.py — the ray-job-submit entrypoint — runs one
    snapshot through refresh + CDX/zipnum in its OWN Ray session
    (subprocess) and prints one JSON metrics line."""
    import json as _json
    import subprocess
    import sys as _sys

    root, idx, mh, corpus = base
    # fresh copies: the job mutates index generations + sketch state
    import shutil as _sh

    idx2 = str(tmp_path / "index")
    mh2 = str(tmp_path / "mh")
    _sh.copytree(idx, idx2)
    _sh.copytree(mh, mh2)

    arch = tmp_path / "snap"
    arch.mkdir()
    recs = [("https://c.ex/jobnew", _text(777) + " xenon"),
            ("https://c.ex/copy_of_base0", corpus[0][1])]
    with gzip.open(arch / "c.warc.gz", "wb") as f:
        f.write(_warc(recs))

    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    proc = subprocess.run(
        [_sys.executable, "scripts/crawl_job.py",
         "--archive", str(arch), "--index", idx2, "--mh-index", mh2,
         "--work", str(tmp_path / "work"),
         "--cdx-out", str(tmp_path / "cdx")],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    m = _json.loads(line)
    assert m["accepted"] == 1 and m["near_dup_dropped"] >= 1
    assert m["cdx_blocks"] >= 1
    assert os.path.exists(tmp_path / "cdx" / "cluster.parquet")
    # the accepted page is searchable in the served generation
    eng = GenerationalEngine(idx2)
    assert eng.search("xenon", k=3)
