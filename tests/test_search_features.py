"""Meilisearch request-surface features (round 4, session 4):
attributesToSearchOn, rankingScoreThreshold, showRankingScore,
showRankingScoreDetails.

Reference exposes plain Meilisearch search (search_proxy/models/requests.py);
these are the engine-level request parameters of that surface. Field
membership comes from the positional index + the v5 title_tc boundary —
document text is never read."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.functions.hashing import doc_id_from_url
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.search import SearchEngine
from meilisearch_thai_ray.pipelines.search_proxy import (SearchOptions,
                                                         SearchProxy)


def _page(title: str, body: str) -> bytes:
    # no <h1> echo: the title text must appear ONLY in the title field so
    # the attribute membership of each occurrence is unambiguous
    return (f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p></body></html>").encode()


DOCS = [
    # 'salmon' in the TITLE only
    ("salmon special menu", "today the kitchen offers seasonal dishes"),
    # 'salmon' in the BODY only
    ("boring page title", "salmon dishes salmon plates salmon bowls"),
    # exactness pair for the details test
    ("phrase doc", "a red fox dinner was served"),
    ("scrambled doc", "a fox red dinner was served"),
]
URLS = [f"https://feat.ex/{i}" for i in range(len(DOCS))]


@pytest.fixture(scope="module")
def feat_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("featidx")
    pages = root / "pages"
    pages.mkdir()
    pq.write_table(
        pa.table({
            "url": pa.array(URLS, pa.string()),
            "html": pa.array([_page(t, b) for t, b in DOCS], pa.binary()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    out = str(root / "index")
    build_index(str(pages), out,
                EngineConfig(num_shards=4, store_positions=True),
                num_salts=2, batch_size=64)
    return out


def _proxy(out: str) -> SearchProxy:
    return SearchProxy(SearchEngine(out), docs_path=f"{out}/docs")


def test_attributes_to_search_on_title_only(feat_index):
    proxy = _proxy(feat_index)
    title_doc = doc_id_from_url(URLS[0])
    body_doc = doc_id_from_url(URLS[1])

    both = [h["doc_id"] for h in proxy.search("salmon", k=10)]
    assert title_doc in both and body_doc in both

    title_only = [h["doc_id"] for h in proxy.search(
        "salmon",
        options=SearchOptions(limit=10, attributes_to_search_on=["title"]))]
    assert title_doc in title_only
    assert body_doc not in title_only

    content_only = [h["doc_id"] for h in proxy.search(
        "salmon",
        options=SearchOptions(limit=10, attributes_to_search_on=["content"]))]
    assert body_doc in content_only
    assert title_doc not in content_only


def test_attributes_to_search_on_full_set_is_noop(feat_index):
    proxy = _proxy(feat_index)
    a = [h["doc_id"] for h in proxy.search("salmon", k=10)]
    b = [h["doc_id"] for h in proxy.search(
        "salmon", options=SearchOptions(
            limit=10, attributes_to_search_on=["title", "content"]))]
    assert a == b


def test_attributes_to_search_on_validation(feat_index):
    with pytest.raises(ValueError, match="attributes_to_search_on"):
        SearchOptions(attributes_to_search_on=["headline"])
    with pytest.raises(ValueError, match="attributes_to_search_on"):
        SearchOptions(attributes_to_search_on=[])
    # requires the docs table (title_tc boundary)
    proxy = SearchProxy(SearchEngine(feat_index))  # no docs_path
    with pytest.raises(ValueError, match="docs_path"):
        proxy.search("salmon", options=SearchOptions(
            attributes_to_search_on=["title"]))


def test_ranking_score_threshold(feat_index):
    proxy = _proxy(feat_index)
    # "red fox" separates: the phrase doc gets the exact-substring boost
    # (capped at 1.0), the scrambled doc does not
    hits = proxy.search("red fox", options=SearchOptions(
        limit=10, show_ranking_score=True))
    assert len(hits) >= 2
    scores = [h["_rankingScore"] for h in hits]
    assert scores == [h["score"] for h in hits]
    assert scores[0] > scores[-1]
    # cut strictly between the best and the worst hit
    thr = (scores[0] + scores[-1]) / 2
    kept = proxy.search("red fox", options=SearchOptions(
        limit=10, ranking_score_threshold=thr))
    assert kept
    assert all(h["score"] >= thr for h in kept)
    assert len(kept) < len(hits)
    with pytest.raises(ValueError, match="ranking_score_threshold"):
        SearchOptions(ranking_score_threshold=1.5)


def test_show_ranking_score_details(feat_index):
    proxy = _proxy(feat_index)
    phrase_doc = doc_id_from_url(URLS[2])
    scram_doc = doc_id_from_url(URLS[3])
    hits = proxy.search("red fox", options=SearchOptions(
        limit=10, ranking_rules=True, show_ranking_score_details=True))
    det = {h["doc_id"]: h["_rankingScoreDetails"] for h in hits}
    assert det[phrase_doc]["exactness"]["bucket"] == "exactPhrase"
    assert det[scram_doc]["exactness"]["bucket"] == "allWordsExact"
    for d in (phrase_doc, scram_doc):
        assert det[d]["words"] == {"matchedWords": 2, "maxMatchedWords": 2}
        assert det[d]["typo"]["typoCount"] == 0
    # details are the chain's sort key — no rules chain, no details
    with pytest.raises(ValueError, match="ranking_rules"):
        SearchOptions(show_ranking_score_details=True)
    plain = proxy.search("red fox", options=SearchOptions(limit=10))
    assert all("_rankingScoreDetails" not in h and "_rankingScore" not in h
               for h in plain)


def test_show_matches_position(feat_index):
    proxy = _proxy(feat_index)
    body_doc = doc_id_from_url(URLS[1])
    hits = proxy.search("salmon", options=SearchOptions(
        limit=10, show_matches_position=True))
    by_id = {h["doc_id"]: h for h in hits}
    mp = by_id[body_doc]["_matchesPosition"]["text"]
    assert len(mp) == 3  # 'salmon' occurs 3x in the body doc
    # spans point at the actual term occurrences
    import pyarrow.dataset as pads
    text = {r["doc_id"]: r["text"] for r in pads.dataset(
        f"{feat_index}/docs").to_table(
            columns=["doc_id", "text"]).to_pylist()}[body_doc]
    for s in mp:
        assert text[s["start"]:s["start"] + s["length"]].lower() == "salmon"
    # requires the docs table
    bare = SearchProxy(SearchEngine(feat_index))
    with pytest.raises(ValueError, match="docs_path"):
        bare.search("salmon", options=SearchOptions(
            show_matches_position=True))


def test_positive_quoted_phrase_constraint(feat_index):
    """Meilisearch phrase syntax: `"red fox"` keeps only docs where the
    phrase occurs as consecutive tokens; words still score normally."""
    proxy = _proxy(feat_index)
    phrase_doc = doc_id_from_url(URLS[2])
    scram_doc = doc_id_from_url(URLS[3])

    plain = {h["doc_id"] for h in proxy.search("red fox", k=10)}
    assert {phrase_doc, scram_doc} <= plain  # both match unquoted

    quoted = [h["doc_id"] for h in proxy.search('"red fox" dinner', k=10)]
    assert phrase_doc in quoted
    assert scram_doc not in quoted  # has the words, not the phrase

    # a phrase nothing contains -> empty, not a fallback
    assert proxy.search('"fox red dinner was framed"', k=10) == []
