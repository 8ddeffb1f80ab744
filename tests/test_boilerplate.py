"""Main-content extraction kernel (kernel/boilerplate.py)."""

from __future__ import annotations

from meilisearch_thai_ray.kernel.boilerplate import extract_main_text


def test_chrome_containers_dropped():
    html = ("<html><head><title>T</title></head><body>"
            "<header><h1>T</h1></header>"
            "<nav><a href='/a'>A</a><a href='/b'>B</a></nav>"
            "<p>real body prose that should stay</p>"
            "<aside>sidebar junk</aside>"
            "<footer>footer junk</footer></body></html>")
    assert extract_main_text(html) == "real body prose that should stay"


def test_link_density_drops_farms_keeps_prose_with_links():
    html = ("<div><a href='/1'>x1</a><a href='/2'>x2</a></div>"
            "<p>a paragraph of prose that happens to mention "
            "<a href='/d'>one link</a> in passing among many words</p>")
    out = extract_main_text(html)
    assert "x1" not in out
    assert "one link" in out and out.startswith("a paragraph")


def test_density_threshold_boundary():
    # text 'ab cd' (5 chars), anchor 'ab' (2) -> density 0.4 <= 0.5: kept
    assert extract_main_text("<p><a href='/x'>ab</a> cd</p>") == "ab cd"
    # anchors 'abc'+'de' (5) of 'abc de' (6) -> 0.83 > 0.5: dropped
    assert extract_main_text(
        "<p><a href='/x'>abc</a> <a href='/y'>de</a></p>") == ""


def test_nested_chrome_and_comments():
    html = ("<body><footer>outer<footer>inner</footer></footer>"
            "<!-- <p>commented out</p> -->"
            "<p>kept paragraph</p></body>")
    assert extract_main_text(html) == "kept paragraph"


def test_entities_scripts_and_blocks():
    html = ("<script>var x = '<p>junk</p>';</script>"
            "<p>fish &amp; chips</p><div>second block</div>")
    assert extract_main_text(html.encode()) == "fish & chips\nsecond block"


def test_document_order_preserved():
    html = "<p>one</p><table><tr><td>two</td></tr></table><p>three</p>"
    assert extract_main_text(html) == "one\ntwo\nthree"
