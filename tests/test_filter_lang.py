"""Meilisearch filter-expression language: parser, pushdown, SQL parity.

One parse drives both renderers (pyarrow expression + SQL WHERE), so the
m17b oracle verifies the whole chain; these tests pin the grammar corners."""

import pyarrow as pa
import pytest

from meilisearch_thai_ray.kernel.filter_lang import parse_filter
from meilisearch_thai_ray.stages.filter_dsl import (compile_filter_str,
                                                    filter_str_to_sql)


def test_precedence_and_binds_tighter_than_or():
    ast = parse_filter("a = 1 OR b = 2 AND c = 3")
    assert ast == ("or", ("cmp", "a", "=", 1),
                   ("and", ("cmp", "b", "=", 2), ("cmp", "c", "=", 3)))


def test_parens_override_precedence():
    ast = parse_filter("(a = 1 OR b = 2) AND c = 3")
    assert ast[0] == "and" and ast[1][0] == "or"


def test_values_quoted_bare_numeric():
    assert parse_filter("lang = 'fr'") == ("cmp", "lang", "=", "fr")
    assert parse_filter('lang = "de"') == ("cmp", "lang", "=", "de")
    assert parse_filter("lang = en") == ("cmp", "lang", "=", "en")
    assert parse_filter("n = 3") == ("cmp", "n", "=", 3)
    assert parse_filter("x = 1.5") == ("cmp", "x", "=", 1.5)
    # escaped quote inside a quoted value
    assert parse_filter(r"t = 'it\'s'") == ("cmp", "t", "=", "it's")


def test_in_to_exists_not():
    assert parse_filter("s IN [a, 'b c', 3]") == ("in", "s", ["a", "b c", 3])
    assert parse_filter("n 1 TO 10") == ("range", "n", 1, 10)
    assert parse_filter("f EXISTS") == ("exists", "f", True)
    assert parse_filter("f NOT EXISTS") == ("exists", "f", False)
    assert parse_filter("f IS NULL") == ("exists", "f", False)
    assert parse_filter("f IS NOT NULL") == ("exists", "f", True)
    assert parse_filter("NOT a = 1") == ("not", ("cmp", "a", "=", 1))


def test_parse_errors():
    for bad in ["", "a =", "a = 1 OR", "(a = 1", "a IN [1", "a 1 TO",
                "AND a = 1"]:
        with pytest.raises(ValueError):
            parse_filter(bad)


def test_expression_filters_a_table_like_sql():
    import duckdb

    t = pa.table({
        "lang": ["en", "fr", "de", "en", None],
        "n": [100, 400, 500, 900, 400],
        "src": ["a", "b", "c", "a", "b"],
    })
    s = "(lang = en OR lang = 'fr') AND n 300 TO 900 AND NOT src IN [c]"
    import pyarrow.dataset as pads

    got = pads.dataset(t).to_table(filter=compile_filter_str(s))
    want = duckdb.arrow(t).filter(filter_str_to_sql(s)).arrow()
    assert got.sort_by("n").equals(want.sort_by("n").cast(got.schema))


def test_null_semantics_match_sql():
    import duckdb
    import pyarrow.dataset as pads

    t = pa.table({"lang": ["en", None, "fr"], "n": [1, 2, 3]})
    for s in ["lang EXISTS", "lang NOT EXISTS", "lang IS NULL",
              "lang IS NOT NULL"]:
        got = pads.dataset(t).to_table(filter=compile_filter_str(s))
        want = duckdb.arrow(t).filter(filter_str_to_sql(s)).arrow()
        assert got.equals(want.cast(got.schema)), s


def test_proxy_accepts_filter_strings(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.config import EngineConfig
    from meilisearch_thai_ray.functions.hashing import doc_id_from_url
    from meilisearch_thai_ray.index.build import build_index
    from meilisearch_thai_ray.index.search import SearchEngine
    from meilisearch_thai_ray.pipelines.search_proxy import (SearchOptions,
                                                             SearchProxy)

    pages = tmp_path / "pages"
    pages.mkdir()
    urls = [f"https://flt.ex/{i}" for i in range(3)]
    langs = ["en", "fr", "de"]
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        # genuinely different bodies: near-identical texts would trip the
        # proxy's D3 content-similarity dedup (ratio >= 0.85) and hide a hit
        "html": pa.array([
            b"<p>salmon grilled over charcoal with lemon butter sauce</p>",
            b"<p>salmon tartare, capers, shallots and a rye crisp on ice</p>",
            b"<p>salmon poached in dashi broth beside pickled daikon</p>",
        ], pa.binary()),
        "lang": pa.array(langs, pa.string()),
    }), str(pages / "p.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(pages), out, EngineConfig(num_shards=2), num_salts=1,
                batch_size=64)
    proxy = SearchProxy(SearchEngine(out), docs_path=f"{out}/docs")
    hits = proxy.search("salmon", options=SearchOptions(
        limit=10, filters="lang = en OR lang = 'fr'"))
    got = {h["doc_id"] for h in hits}
    assert got == {doc_id_from_url(u) for u, l in zip(urls, langs)
                   if l in ("en", "fr")}


def test_browse_documents_pagination_partitions(ray_session):
    """m31: consecutive pages are disjoint, ordered, and concatenate to
    the ascending prefix of the filtered id space."""
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.pipelines.simple_text import (BROWSE_FILTER,
                                                            browse_documents)
    from meilisearch_thai_ray.stages.filter_dsl import compile_filter_str

    sf = "/root/testdata/sf0.001"
    pages = [browse_documents(sf, BROWSE_FILTER, limit=20, offset=o)
             ["doc_id"].to_pylist() for o in (0, 20, 40)]
    got = [d for p in pages for d in p]
    assert got == sorted(got) and len(set(got)) == len(got)

    import pyarrow.dataset as pads
    flat = pads.dataset(sf + "/documents.parquet").to_table(
        columns=["doc_id"], filter=compile_filter_str(BROWSE_FILTER))
    want = sorted(flat["doc_id"].to_pylist())[:len(got)]
    assert got == want
