"""Query-proxy layer tests (M12-M16 + D2 semantics, reference constants)."""

import pytest

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.fixtures.pages import write_pages_parquet
from meilisearch_thai_ray.index.build import build_index
from meilisearch_thai_ray.index.search import SearchEngine
from meilisearch_thai_ray.pipelines.search_proxy import (
    COMPOUND_SPLIT,
    MIXED_LANGUAGE,
    ORIGINAL,
    TOKENIZED,
    SearchProxy,
)


@pytest.fixture(scope="module")
def proxy(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("proxy")
    pages = str(root / "pages")
    out = str(root / "index")
    write_pages_parquet(pages, 200, rows_per_file=100)
    build_index(pages, out, EngineConfig(num_shards=4), num_salts=1, batch_size=64)
    return SearchProxy(SearchEngine(out))


def test_analyze_query_ratios(proxy):
    a = proxy.analyze_query("Machine Learning ไทย")
    assert a["mixed_content"] and a["english_content_detected"] and a["thai_content_detected"]
    assert a["primary_language"] == "english"  # more latin chars than thai
    a2 = proxy.analyze_query("ปัญญาประดิษฐ์")
    assert a2["primary_language"] == "thai" and a2["thai_content_ratio"] == 1.0


def test_variants_thai_query(proxy):
    vs = proxy.generate_variants("สาหร่ายวากาเมะอร่อย")
    types = [v.variant_type for v in vs]
    assert ORIGINAL in types and TOKENIZED in types
    assert len(vs) <= 5
    tok = next(v for v in vs if v.variant_type == TOKENIZED)
    orig = next(v for v in vs if v.variant_type == ORIGINAL)
    assert tok.weight > orig.weight  # Thai query boosts tokenized over original
    assert "สาหร่ายวากาเมะ" in tok.terms
    # compound split variant splits the dictionary compound into parts
    cs = [v for v in vs if v.variant_type == COMPOUND_SPLIT]
    if cs:
        assert "สาหร่ายวากาเมะ" not in cs[0].terms
        assert "วากาเมะ" in cs[0].terms or "สาหร่าย" in cs[0].terms


def test_variants_english_query(proxy):
    vs = proxy.generate_variants("machine learning")
    orig = next(v for v in vs if v.variant_type == ORIGINAL)
    assert orig.weight > 0.8  # english original gets the 1.2x boost
    assert orig.terms == ["machine", "learning"]


def test_variants_mixed_query(proxy):
    vs = proxy.generate_variants("Startup ไทยเทคโนโลยี")
    types = {v.variant_type for v in vs}
    assert MIXED_LANGUAGE in types
    mx = next(v for v in vs if v.variant_type == MIXED_LANGUAGE)
    assert mx.terms[0] != "startup"  # thai-first arrangement
    # a trivially-mixed query where all variants coincide dedups down
    vs2 = proxy.generate_variants("Startup ไทย")
    texts = [v.query_text.lower() for v in vs2]
    assert len(texts) == len(set(texts))


def test_variants_dedup_and_cap(proxy):
    vs = proxy.generate_variants("machine")
    texts = [v.query_text.lower() for v in vs]
    assert len(texts) == len(set(texts))
    assert all(0.1 <= v.weight <= 1.0 for v in vs)


def test_search_returns_ranked_hits(proxy):
    hits = proxy.search("สาหร่ายวากาเมะ", k=5)
    assert hits, "wakame docs exist in the fixture corpus"
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(h["score"] >= 0.1 for h in hits)
    assert len({h["doc_id"] for h in hits}) == len(hits)  # deduped
    assert hits[0]["score"] <= 1.0


def test_search_empty_and_unknown(proxy):
    assert proxy.search("zzzqqq") == []
    assert proxy.search("") == []


def test_confidence_bounds(proxy):
    toks = proxy.tokenizer.tokenize("กินข้าวอร่อยมาก")
    c = proxy.tokenization_confidence("กินข้าวอร่อยมาก", toks)
    assert 0.0 < c <= 1.0
    assert proxy.tokenization_confidence("x", []) == 0.0


def test_deterministic(proxy):
    a = proxy.search("อาหารญี่ปุ่น", k=10)
    b = proxy.search("อาหารญี่ปุ่น", k=10)
    assert a == b


def test_synonym_expansion(proxy):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchProxy

    p = SearchProxy(proxy.engine, synonyms={"วากาเมะ": ["สาหร่ายวากาเมะ"]})
    assert p.expand_synonyms(["วากาเมะ"]) == ["วากาเมะ", "สาหร่ายวากาเมะ"]
    # symmetric closure: the alias maps back to the canonical
    assert p.expand_synonyms(["สาหร่ายวากาเมะ"]) == ["สาหร่ายวากาเมะ", "วากาเมะ"]
    base = {h["doc_id"] for h in proxy.search("วากาเมะ", k=20)}
    expanded = {h["doc_id"] for h in p.search("วากาเมะ", k=20)}
    assert base <= expanded or expanded  # synonym variant can only widen recall


def test_exact_match_boost_with_docs_path(proxy, tmp_path_factory):
    """With docs_path configured, docs containing the literal query get the
    2.0x exact-match boost (result_ranker boost_exact_matches)."""
    import os

    from meilisearch_thai_ray.pipelines.search_proxy import SearchProxy

    index_dir = os.path.dirname(proxy.engine.index_dir + "/")  # same index
    docs_path = os.path.join(proxy.engine.index_dir, "docs")
    p = SearchProxy(proxy.engine, docs_path=docs_path)
    hits = p.search("สาหร่ายวากาเมะ", k=10)
    assert hits
    # at least the top hit contains the literal query in its text
    texts = p._doc_texts([hits[0]["doc_id"]])
    assert "สาหร่ายวากาเมะ" in texts[hits[0]["doc_id"]]
    # determinism with text fetching on
    assert hits == p.search("สาหร่ายวากาเมะ", k=10)


def test_phrase_search(proxy):
    """Quoted-phrase semantics: AND candidates verified by literal substring."""
    import os

    from meilisearch_thai_ray.pipelines.search_proxy import SearchProxy

    docs_path = os.path.join(proxy.engine.index_dir, "docs")
    p = SearchProxy(proxy.engine, docs_path=docs_path)
    # a golden sentence embedded verbatim in the fixture corpus
    hits = p.search_phrase("สาหร่ายวากาเมะเป็นอาหารทะเล", k=5)
    assert hits
    texts = p._doc_texts([hits[0][0]])
    assert "สาหร่ายวากาเมะเป็นอาหารทะเล" in texts[hits[0][0]]
    # scrambled word order has the same terms but must NOT match as a phrase
    scrambled = p.search_phrase("อาหารทะเลเป็นสาหร่ายวากาเมะ", k=5)
    assert all(
        "อาหารทะเลเป็นสาหร่ายวากาเมะ" in p._doc_texts([d])[d] for d, _ in scrambled
    )
    with pytest.raises(ValueError):
        proxy.search_phrase("x")  # no docs_path configured

# ---------------- ranking registry + A/B + content clustering ----------------

@pytest.fixture(scope="module")
def neardup_index(ray_session, tmp_path_factory):
    """Corpus with two near-identical docs (SequenceMatcher ratio >= 0.85)
    matching a unique term, plus filler docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("neardup")
    pages = root / "pages"
    pages.mkdir()
    base = ("wakameclone seaweed salad with sesame dressing is a delicious "
            "healthy appetizer enjoyed across coastal regions ")
    texts = [base * 3, (base * 3).replace("sesame", "ginger", 1)]
    for i in range(10):
        texts.append(f"filler document {i} about completely unrelated topic "
                     f"number {i} with unique words fill{i}a fill{i}b " * 3)
    urls = [f"https://nd.ex/{i}" for i in range(len(texts))]
    pq.write_table(
        pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([f"<p>{t}</p>".encode() for t in texts], pa.binary()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    out = str(root / "index")
    from meilisearch_thai_ray.index.build import build_index

    build_index(str(pages), out, EngineConfig(num_shards=4), num_salts=1,
                batch_size=64)
    import os

    return SearchEngine(out), os.path.join(out, "docs")


def test_content_similarity_clustering_drops_near_dup(neardup_index):
    eng, docs_path = neardup_index
    clustered = SearchProxy(eng, docs_path=docs_path)
    hits = clustered.search("wakameclone", k=10)
    assert len([h for h in hits]) == 1, hits  # near-dup collapsed
    # id-only paths keep both
    raw = SearchProxy(eng, docs_path=docs_path,
                      enable_content_similarity_dedup=False)
    assert len(raw.search("wakameclone", k=10)) == 2
    optimized = SearchProxy(eng, docs_path=docs_path,
                            algorithm="optimized_score")
    assert len(optimized.search("wakameclone", k=10)) == 2


def test_all_ranking_algorithms_run(neardup_index):
    eng, docs_path = neardup_index
    from meilisearch_thai_ray.pipelines.search_proxy import RANKING_ALGORITHMS

    for algo in RANKING_ALGORITHMS:
        p = SearchProxy(eng, docs_path=docs_path, algorithm=algo)
        hits = p.search("wakameclone seaweed", k=5)
        assert hits, algo
        assert all(h["algorithm"] == algo for h in hits)
        scores = [h["score"] for h in hits]
        assert scores == sorted(scores, reverse=True), algo
        assert hits == p.search("wakameclone seaweed", k=5), f"{algo} nondeterministic"
    with pytest.raises(ValueError):
        SearchProxy(eng, algorithm="nope")


def test_ab_assignment_deterministic_and_split(neardup_index):
    eng, docs_path = neardup_index
    p = SearchProxy(eng, docs_path=docs_path)
    assert p.select_algorithm("q", "s1") == "weighted_score"  # A/B off
    p.configure_ab_test("simple_score", 0.5)
    seen = {p.select_algorithm("query", f"session-{i}") for i in range(40)}
    assert seen == {"weighted_score", "simple_score"}  # both arms assigned
    for i in range(40):  # assignment is stable per (session, query)
        sid = f"session-{i}"
        assert p.select_algorithm("query", sid) == p.select_algorithm("query", sid)
    # results honor the assigned algorithm
    algos = {p.search("wakameclone", k=3, session_id=f"s{i}")[0]["algorithm"]
             for i in range(30)}
    assert algos == {"weighted_score", "simple_score"}
    with pytest.raises(ValueError):
        p.configure_ab_test("simple_score", 1.5)
    with pytest.raises(ValueError):
        p.configure_ab_test("bogus", 0.5)


def test_phrase_search_grows_past_initial_candidate_cap(ray_session, tmp_path):
    """A true phrase hit BM25-ranked below the initial candidate cap is still
    found (the pool grows until k verified or candidates exhausted)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.index.build import build_index

    pages = tmp_path / "pages"
    pages.mkdir()
    texts = [("alphaz q betaz r " * 12) for _ in range(130)]  # AND matches, no phrase
    texts.append("the needle alphaz betaz appears exactly once here")
    urls = [f"https://ph.ex/{i}" for i in range(len(texts))]
    pq.write_table(
        pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([f"<p>{t}</p>".encode() for t in texts], pa.binary()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    out = str(tmp_path / "index")
    build_index(str(pages), out, EngineConfig(num_shards=4), num_salts=1,
                batch_size=64)
    eng = SearchEngine(out)
    p = SearchProxy(eng, docs_path=os.path.join(out, "docs"))
    hits = p.search_phrase("alphaz betaz", k=5)
    assert len(hits) == 1  # found despite ranking 131st in the AND candidates
    texts_found = p._doc_texts([hits[0][0]])
    assert "alphaz betaz" in texts_found[hits[0][0]]

# ---------------- per-request SearchOptions ----------------

def test_search_options_limit_offset_pagination(neardup_index):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    eng, docs_path = neardup_index
    p = SearchProxy(eng, docs_path=docs_path,
                    enable_content_similarity_dedup=False)
    full = p.search("wakameclone seaweed", options=SearchOptions(limit=10))
    page2 = p.search("wakameclone seaweed",
                     options=SearchOptions(limit=1, offset=1))
    assert len(page2) == 1
    assert page2[0]["doc_id"] == full[1]["doc_id"]
    assert page2[0]["score"] == full[1]["score"]


def test_search_options_filters(neardup_index):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    eng, docs_path = neardup_index
    p = SearchProxy(eng, docs_path=docs_path)
    hits = p.search("wakameclone", options=SearchOptions(filters={"lang": "en"}))
    assert hits  # corpus is lang=en
    none = p.search("wakameclone", options=SearchOptions(filters={"lang": "th"}))
    assert none == []


def test_search_options_highlight_crop(neardup_index):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    eng, docs_path = neardup_index
    p = SearchProxy(eng, docs_path=docs_path)
    hits = p.search("wakameclone",
                    options=SearchOptions(highlight=True, crop_length=60,
                                          crop_marker="…"))
    assert hits and "highlight" in hits[0]
    h = hits[0]["highlight"]
    assert "<em>wakameclone</em>" in h
    assert len(h) <= 60 + 2 * len("…") + len("<em></em>") * 8


def test_search_options_boost_and_strategy_override(neardup_index):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    eng, docs_path = neardup_index
    p = SearchProxy(eng, docs_path=docs_path,
                    enable_content_similarity_dedup=False)
    base = p.search("wakameclone", options=SearchOptions(limit=5))
    boosted = p.search("wakameclone",
                       options=SearchOptions(limit=5, boost_exact_matches=0.5))
    assert [h["doc_id"] for h in base] == [h["doc_id"] for h in boosted]
    assert boosted[0]["score"] != base[0]["score"]  # boost override applied
    # matching_strategy="any" can only widen the hit set vs "all"
    any_hits = p.search("wakameclone nonexistentzzz",
                        options=SearchOptions(limit=10, matching_strategy="frequency"))
    all_hits = p.search("wakameclone nonexistentzzz",
                        options=SearchOptions(limit=10, matching_strategy="all"))
    assert len(any_hits) >= len(all_hits)


def test_search_options_validation():
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    with pytest.raises(ValueError):
        SearchOptions(limit=0)
    with pytest.raises(ValueError):
        SearchOptions(limit=101)
    with pytest.raises(ValueError):
        SearchOptions(offset=-1)
    with pytest.raises(ValueError):
        SearchOptions(crop_length=5)
    with pytest.raises(ValueError):
        SearchOptions(boost_exact_matches=9.0)
    with pytest.raises(ValueError):
        SearchOptions(max_query_variants=0)


def test_search_options_variant_controls(proxy):
    from meilisearch_thai_ray.pipelines.search_proxy import SearchOptions

    # max_query_variants=1 keeps only the top-weight variant
    hits = proxy.search("สาหร่ายวากาเมะ",
                        options=SearchOptions(limit=5, max_query_variants=1))
    assert len({h["variant_type"] for h in hits}) <= 1
    # enable_compound_search=False never emits compound_split hits
    hits2 = proxy.search("สาหร่ายวากาเมะ",
                         options=SearchOptions(limit=10,
                                               enable_compound_search=False))
    assert all(h["variant_type"] != "compound_split" for h in hits2)


def test_sort_parameter_orders_and_paginates(proxy):
    """Meilisearch `sort` criterion (requests.py:15): results reorder by
    the sortable field with relevancy as tie-break, pagination applies
    AFTER the sort, and doc_id sorting needs no docs_path."""
    import os

    from meilisearch_thai_ray.pipelines.search_proxy import (
        SearchOptions, SearchProxy)

    docs_path = os.path.join(proxy.engine.index_dir, "docs")
    p = SearchProxy(proxy.engine, docs_path=docs_path)
    q = "สาหร่ายวากาเมะ"
    plain = p.search(q, k=10)
    assert len(plain) >= 3

    asc = p.search(q, options=SearchOptions(limit=10,
                                            sort=["token_count:asc"]))
    desc = p.search(q, options=SearchOptions(limit=10,
                                             sort=["token_count:desc"]))
    assert {h["doc_id"] for h in asc} == {h["doc_id"] for h in plain}
    fields = p._doc_fields([h["doc_id"] for h in asc], ["token_count"])
    tc_asc = [fields[h["doc_id"]]["token_count"] for h in asc]
    assert tc_asc == sorted(tc_asc)
    tc_desc = [p._doc_fields([h["doc_id"]], ["token_count"])
               [h["doc_id"]]["token_count"] for h in desc]
    assert tc_desc == sorted(tc_desc, reverse=True)

    # pagination slices the SORTED order
    page2 = p.search(q, options=SearchOptions(
        limit=2, offset=2, sort=["token_count:asc"]))
    assert [h["doc_id"] for h in page2] == [h["doc_id"] for h in asc[2:4]]

    # doc_id sorting works without docs_path
    ids = p.search(q, options=SearchOptions(limit=10, sort=["doc_id:desc"]))
    got = [h["doc_id"] for h in ids]
    assert got == sorted(got, reverse=True)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        SearchOptions(sort=["token_count:sideways"])
    with _pytest.raises(ValueError):
        SearchOptions(sort=["text:asc"])  # not a sortable field
    bare = SearchProxy(proxy.engine)  # no docs_path
    with _pytest.raises(ValueError):
        bare.search(q, options=SearchOptions(sort=["token_count:asc"]))


def test_search_with_info_tokenization_block(proxy):
    """include_tokenization_info analog: hits identical to search(), plus
    the reference TokenizationInfo fields (responses.py:61-73)."""
    q = "สาหร่ายวากาเมะ"
    out = proxy.search_with_info(q, k=5)
    assert out["hits"] == proxy.search(q, k=5)
    info = out["tokenization_info"]
    assert set(info) == {
        "tokenization_engine", "tokenization_time_ms", "tokens",
        "fallback_engines_used", "tokenization_confidence",
        "original_text_length", "token_count", "average_token_length"}
    assert info["original_text_length"] == len(q)
    assert info["token_count"] == len(info["tokens"]) > 0
    assert 0.0 <= info["tokenization_confidence"] <= 1.0
    assert info["average_token_length"] > 0


def test_distinct_attribute_one_hit_per_value(proxy):
    """Meilisearch distinct attribute: at most one hit per field value,
    the best-ranked survives; validation rejects non-sortable fields and
    metadata distinct without docs_path."""
    import os

    from meilisearch_thai_ray.pipelines.search_proxy import (
        SearchOptions, SearchProxy)

    docs_path = os.path.join(proxy.engine.index_dir, "docs")
    p = SearchProxy(proxy.engine, docs_path=docs_path)
    q = "สาหร่ายวากาเมะ"
    plain = p.search(q, k=20)
    langs = p._doc_fields([h["doc_id"] for h in plain], ["lang"])
    out = p.search(q, options=SearchOptions(limit=20, distinct="lang"))
    got_langs = [langs.get(h["doc_id"], {}).get("lang") for h in out]
    assert len(got_langs) == len(set(got_langs))  # one per value
    # the survivor per lang is the best-ranked one from the plain run
    first_per_lang = {}
    for h in plain:
        lv = langs.get(h["doc_id"], {}).get("lang")
        first_per_lang.setdefault(lv, h["doc_id"])
    assert [h["doc_id"] for h in out] == \
        [first_per_lang[lv] for lv in got_langs]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        SearchOptions(distinct="text")
    bare = SearchProxy(proxy.engine)
    with _pytest.raises(ValueError):
        bare.search(q, options=SearchOptions(distinct="lang"))


# ------------------------------------------------ federated multi-search

@pytest.fixture(scope="module")
def federation(ray_session, tmp_path_factory):
    """Two disjoint corpora (different seeds -> different doc sets) behind
    one FederatedSearch registry."""
    from meilisearch_thai_ray.pipelines.search_proxy import FederatedSearch

    root = tmp_path_factory.mktemp("fed")
    proxies = {}
    for uid, seed in [("idx_a", 1), ("idx_b", 2)]:
        pages = str(root / f"pages_{uid}")
        out = str(root / f"index_{uid}")
        write_pages_parquet(pages, 120, seed=seed, rows_per_file=60)
        build_index(pages, out, EngineConfig(num_shards=2), num_salts=1,
                    batch_size=64)
        proxies[uid] = SearchProxy(SearchEngine(out))
    return FederatedSearch(proxies), proxies


def _fed_query(proxies):
    """A term present in both member indexes (the fixture corpora share the
    Thai vocabulary), picked deterministically."""
    return "สาหร่าย"


def test_federated_merges_both_indexes(federation):
    fed, proxies = federation
    q = _fed_query(proxies)
    hits = fed.search(q, limit=20)
    uids = {h["_federation"]["indexUid"] for h in hits}
    assert uids == {"idx_a", "idx_b"}
    # globally ordered by weightedRankingScore desc
    ws = [h["_federation"]["weightedRankingScore"] for h in hits]
    assert ws == sorted(ws, reverse=True)
    # each index's top hit normalizes to ranking score 1.0 at weight 1
    per_uid_best = {}
    for h in hits:
        u = h["_federation"]["indexUid"]
        per_uid_best.setdefault(u, h["_federation"]["weightedRankingScore"])
    assert all(v == 1.0 for v in per_uid_best.values())


def test_federated_weight_zero_excludes_and_weight_scales(federation):
    fed, proxies = federation
    q = _fed_query(proxies)
    only_b = fed.search(q, limit=20, weights={"idx_a": 0.0})
    assert {h["_federation"]["indexUid"] for h in only_b} == {"idx_b"}
    # down-weighting idx_b pushes every idx_b hit below every idx_a hit
    # whose normalized score exceeds the weight
    skew = fed.search(q, limit=40, weights={"idx_b": 1e-6})
    first_b = next(i for i, h in enumerate(skew)
                   if h["_federation"]["indexUid"] == "idx_b")
    assert all(h["_federation"]["indexUid"] == "idx_a"
               for h in skew[:first_b])


def test_federated_single_index_matches_plain_search(federation):
    fed, proxies = federation
    q = _fed_query(proxies)
    plain = proxies["idx_a"].search(q, k=10)
    via_fed = fed.multi_search([{"indexUid": "idx_a", "q": q}], limit=10)
    assert [h["doc_id"] for h in via_fed] == [h["doc_id"] for h in plain]
    with pytest.raises(KeyError):
        fed.multi_search([{"indexUid": "nope", "q": q}])


def test_federated_rrf_fusion(federation):
    """fusion='rrf': (a) same index registered twice -> every doc combines
    with score 2/(k+rank) in plain-search order; (b) over the disjoint
    two-corpus federation every hit keeps exactly one contributing rank
    and the list is ordered by descending rrfScore."""
    from meilisearch_thai_ray.pipelines.search_proxy import FederatedSearch

    fed, proxies = federation
    q = _fed_query(proxies)

    twin = FederatedSearch({"a": proxies["idx_a"], "b": proxies["idx_a"]})
    plain = proxies["idx_a"].search(q, k=10)
    rrf = twin.search(q, limit=10, fusion="rrf")
    assert [h["doc_id"] for h in rrf] == [h["doc_id"] for h in plain]
    for i, h in enumerate(rrf):
        rank = i + 1
        assert h["_federation"]["ranks"] == {"a": rank, "b": rank}
        assert abs(h["_federation"]["rrfScore"] - 2.0 / (60 + rank)) < 1e-9

    mixed = fed.search(q, limit=20, fusion="rrf")
    assert mixed, "shared Thai vocabulary must match in both corpora"
    scores = [h["_federation"]["rrfScore"] for h in mixed]
    assert scores == sorted(scores, reverse=True)
    # the fixture corpora share urls (same url scheme), so some doc_ids
    # appear in BOTH indexes and must combine: score == sum of the
    # per-index reciprocal ranks, payload from the best-ranked source
    assert any(len(h["_federation"]["ranks"]) == 2 for h in mixed)
    for h in mixed:
        ranks = h["_federation"]["ranks"]
        assert set(ranks) <= {"idx_a", "idx_b"}
        expect = sum(1.0 / (60 + r) for r in ranks.values())
        assert abs(h["_federation"]["rrfScore"] - expect) < 1e-9
        assert h["_federation"]["indexUid"] == min(
            ranks, key=lambda u: (ranks[u], u))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        fed.multi_search([{"indexUid": "idx_a", "q": q}], fusion="nope")


# ---------------- negative keywords (-word / -"phrase") ----------------

def test_split_negative_terms_parser():
    from meilisearch_thai_ray.pipelines.search_proxy import (
        split_negative_terms,
    )

    # plain word and quoted phrase
    assert split_negative_terms('alpha -bravo') == ('alpha', ['bravo'], [])
    assert split_negative_terms('alpha -"bravo charlie"') == \
        ('alpha', [], ['bravo charlie'])
    # leading negative, multiple negatives, whitespace renormalized
    assert split_negative_terms('-x alpha -y beta') == \
        ('alpha beta', ['x', 'y'], [])
    # hyphen INSIDE a word is literal; bare/trailing hyphen is literal
    assert split_negative_terms('well-known term') == \
        ('well-known term', [], [])
    assert split_negative_terms('a - b') == ('a - b', [], [])
    assert split_negative_terms('trailing -') == ('trailing -', [], [])
    # only-negative query -> empty positive remainder
    assert split_negative_terms('-bravo') == ('', ['bravo'], [])


@pytest.fixture(scope="module")
def neg_index(ray_session, tmp_path_factory):
    """Three-doc English corpus with a positional index (phrase negatives)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("negkw")
    pages = root / "pages"
    pages.mkdir()
    texts = [
        "alpha bravo charlie staple words",      # doc 0
        "alpha delta echo staple words",         # doc 1
        "alpha charlie bravo staple words",      # doc 2 (scrambled phrase)
    ]
    urls = [f"https://neg.ex/{i}" for i in range(len(texts))]
    pq.write_table(
        pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([f"<p>{t}</p>".encode() for t in texts],
                             pa.binary()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    out = str(root / "index")
    from meilisearch_thai_ray.index.build import build_index

    build_index(str(pages), out,
                EngineConfig(num_shards=2, store_positions=True),
                num_salts=1, batch_size=64)
    eng = SearchEngine(out)
    by_url = {}
    import pyarrow.dataset as pads
    t = pads.dataset(os.path.join(out, "docs")).to_table(
        columns=["doc_id", "url"])
    for d, u in zip(t["doc_id"].to_pylist(), t["url"].to_pylist()):
        by_url[u] = int(d)
    ids = [by_url[u] for u in urls]  # fixture order -> engine doc_ids
    return SearchProxy(eng, docs_path=os.path.join(out, "docs")), ids


def test_negative_word_excludes_docs(neg_index):
    p, ids = neg_index
    base = {h["doc_id"] for h in p.search("alpha", k=10)}
    assert set(ids) <= base
    hits = {h["doc_id"] for h in p.search("alpha -bravo", k=10)}
    assert ids[1] in hits
    assert ids[0] not in hits and ids[2] not in hits
    # the negative keyword itself never leaks into exact-match boosting:
    # results are a subset of the positive-only search
    assert hits <= base


def test_negative_phrase_is_adjacency_scoped(neg_index):
    p, ids = neg_index
    hits = {h["doc_id"] for h in p.search('alpha -"bravo charlie"', k=10)}
    # doc0 has the adjacent phrase -> excluded; doc2 has both words scrambled
    # -> kept (a word-level negative would have dropped it too)
    assert ids[0] not in hits
    assert ids[1] in hits and ids[2] in hits


def test_only_negative_query_is_placeholder_minus_excluded(neg_index):
    p, ids = neg_index
    hits = [h["doc_id"] for h in p.search("-bravo", k=10)]
    assert hits == sorted(set(ids) - {ids[0], ids[2]})
    assert all(h == sorted(hits)[i] for i, h in enumerate(hits))
    # placeholder hits carry the placeholder variant marker
    full = p.search("-zzznotaword", k=10)
    assert [h["doc_id"] for h in full] == sorted(ids)
    assert all(h["variant_type"] == "placeholder" for h in full)
