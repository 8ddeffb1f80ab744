"""Distributed query serving (per-shard actors) == local engine, exactly."""

import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
from meilisearch_thai_ray.fixtures.queries import QUERY_FIXTURES
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.search import SearchEngine
from meilisearch_thai_ray.index.serving import ShardedSearchService
from meilisearch_thai_ray.kernel import DocumentTokenizer

CFG = EngineConfig(num_shards=8)


@pytest.fixture(scope="module")
def service(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    pages = str(root / "pages")
    out = str(root / "index")
    write_pages_parquet(pages, 250, rows_per_file=125)
    build_index(pages, out, CFG, num_salts=2, batch_size=64)
    svc = ShardedSearchService(out, num_servers=3)
    yield SearchEngine(out), svc
    svc.shutdown()


def test_sharded_equals_local(service):
    local, svc = service
    tok = DocumentTokenizer(CFG)
    checked = 0
    for q in QUERY_FIXTURES:
        terms = tok.index_terms(tok.tokenize(q["query"]))
        a = local.score_topk(terms, 10, mode="exhaustive")
        b = svc.score_topk(terms, 10)
        assert a == b, q["qid"]
        checked += bool(a)
    assert checked >= 20


def test_sharded_empty_query(service):
    _, svc = service
    assert svc.score_topk([]) == []
    assert svc.score_topk(["nonexistentzz"]) == []

def test_shard_server_rejects_misrouted_term(service):
    """Ownership is enforced: sending a term to the wrong server raises
    instead of silently serving it (and bloating that actor's memory)."""
    import ray

    local, svc = service
    tok = DocumentTokenizer(CFG)
    # find a term and a server that does NOT own it
    for q in QUERY_FIXTURES:
        terms = tok.index_terms(tok.tokenize(q["query"]))
        if not terms:
            continue
        term = terms[0]
        owner = svc._server_for(term)
        wrong = (owner + 1) % len(svc.servers)
        if wrong == owner:
            continue
        with pytest.raises(ray.exceptions.RayTaskError):
            ray.get(svc.servers[wrong].term_postings.remote([term]))
        return
    pytest.skip("no multi-server fixture term found")


def test_service_warm_covers_owned_ranges(service):
    _, svc = service
    assert svc.warm() > 0

def test_doc_partitioned_equals_local(service):
    """Doc-partitioned (salt-group) serving returns exactly the local
    engine's top-k: ids AND float-identical scores."""
    from meilisearch_thai_ray.index.serving import DocPartitionedSearchService

    local, _svc = service
    svc = DocPartitionedSearchService(local.index_dir, num_servers=2)
    try:
        assert svc.warm() > 0
        tok = DocumentTokenizer(CFG)
        checked = 0
        for q in QUERY_FIXTURES:
            terms = tok.index_terms(tok.tokenize(q["query"]))
            a = local.score_topk(terms, 10, mode="exhaustive")
            b = svc.score_topk(terms, 10)
            assert a == b, q["qid"]
            checked += bool(a)
        assert checked >= 20
        assert svc.score_topk([]) == []
        assert svc.score_topk(["nonexistentzz"]) == []
    finally:
        svc.shutdown()
