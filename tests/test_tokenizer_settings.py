"""Meilisearch separatorTokens / nonSeparatorTokens settings
(reference settings_manager.py:30-46,117-118,130-136).

Default config (both empty) must stay byte-identical to tokenizer version
"3"; the settings change index-term semantics only when set, and then they
key the dictionary hash (cache invalidation)."""

from meilisearch_thai_ray.config import EngineConfig
from meilisearch_thai_ray.kernel.tokenize import DocumentTokenizer

import pytest


@pytest.fixture(scope="module")
def default_tok():
    return DocumentTokenizer()


def test_default_tokenization_unchanged(default_tok):
    # frozen expectation for version "3" default semantics — guards the
    # "defaults are a no-op" contract of the new settings code paths
    assert default_tok.tokenize("e-mail me at a@b.com #tag c++") == [
        "e", "-", "mail", "me", "at", "a", "@", "b", ".", "com",
        "#", "tag", "c", "++"]


def test_non_separator_merges_interior():
    tok = DocumentTokenizer(EngineConfig(non_separator_tokens=("-",)))
    assert tok.tokenize("e-mail me") == ["e-mail", "me"]
    # whitespace still separates: listed token with gaps stays alone and is
    # dropped from index terms (no alphanumeric content)
    toks = tok.tokenize("x - y")
    assert toks == ["x", "-", "y"]
    assert tok.index_terms(toks) == ["x", "y"]


def test_non_separator_leading_and_run_forms():
    tok = DocumentTokenizer(
        EngineConfig(non_separator_tokens=("#", "+", "@", ".")))
    toks = tok.tokenize("#hashtag c++ a@b.com")
    assert toks == ["#hashtag", "c++", "a@b.com"]
    # punct-dominant merges like "c++" stay searchable
    assert tok.index_terms(toks) == ["#hashtag", "c++", "a@b.com"]


def test_separator_token_splits():
    tok = DocumentTokenizer(EngineConfig(separator_tokens=("|", "::")))
    assert tok.tokenize("alpha|beta gamma::delta") == [
        "alpha", "beta", "gamma", "delta"]


def test_separator_applies_after_thai_runs():
    tok = DocumentTokenizer(EngineConfig(separator_tokens=("|",)))
    toks = tok.tokenize("สาหร่ายวากาเมะ|data")
    assert "data" in toks and "สาหร่ายวากาเมะ" in toks
    assert not any("|" in t for t in toks)


def test_thai_segmentation_identical_under_settings():
    text = "สาหร่ายวากาเมะเป็นอาหารทะเล hello world"
    base = DocumentTokenizer().tokenize(text)
    tuned = DocumentTokenizer(EngineConfig(
        separator_tokens=("|",), non_separator_tokens=("-",)))
    assert tuned.tokenize(text) == base


def test_overlapping_settings_rejected():
    with pytest.raises(ValueError):
        DocumentTokenizer(EngineConfig(
            separator_tokens=("-",), non_separator_tokens=("-",)))


def test_settings_key_dictionary_hash():
    default = EngineConfig().dictionary_hash()
    tuned = EngineConfig(non_separator_tokens=("-",)).dictionary_hash()
    tuned2 = EngineConfig(separator_tokens=("|",)).dictionary_hash()
    assert default != tuned and default != tuned2 and tuned != tuned2


def test_analyze_counts_follow_settings():
    cfg = EngineConfig(non_separator_tokens=("-",))
    row = DocumentTokenizer(cfg).analyze("e-mail me")
    assert row["tokens"] == ["e-mail", "me"]
    assert row["token_count"] == 2


# ------------------------- end-to-end: settings persist with the index

import pyarrow as pa
import pyarrow.parquet as pq


def _page(body: str) -> bytes:
    return (f"<html><head><title>t</title></head>"
            f"<body><p>{body}</p></body></html>").encode()


@pytest.fixture(scope="module")
def nonsep_index(ray_session, tmp_path_factory):
    from meilisearch_thai_ray.index.build import build_index

    root = tmp_path_factory.mktemp("nonsepidx")
    pages = root / "pages"
    pages.mkdir()
    bodies = ["contact via e-mail today",
              "plain mail arrives by post",
              "the c++ compiler warns"]
    pq.write_table(
        pa.table({
            "url": pa.array([f"https://ns.ex/{i}" for i in range(len(bodies))],
                            pa.string()),
            "html": pa.array([_page(b) for b in bodies], pa.binary()),
            "lang": pa.array(["en"] * len(bodies), pa.string()),
        }),
        str(pages / "p.parquet"),
    )
    out = str(root / "index")
    build_index(str(pages), out,
                EngineConfig(num_shards=4,
                             non_separator_tokens=("-", "+")),
                batch_size=64)
    return out


def test_settings_persist_and_apply_at_query_time(nonsep_index):
    """Index built with non_separator_tokens -> a fresh SearchEngine (no
    config passed) restores them from meta.json, so 'e-mail' and 'c++' are
    single searchable terms and 'e-mail' does NOT match the plain-mail doc."""
    import json
    import os

    from meilisearch_thai_ray.index.search import SearchEngine

    meta = json.load(open(os.path.join(nonsep_index, "meta.json")))
    assert meta["non_separator_tokens"] == ["-", "+"]

    eng = SearchEngine(nonsep_index)
    hits = eng.search("e-mail", k=10)
    assert len(hits) == 1          # only the e-mail doc; not plain "mail"
    assert eng.search("c++", k=10)
