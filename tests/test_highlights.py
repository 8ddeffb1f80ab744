"""Highlight extraction/merge tests (M19/M20 semantics)."""

from meilisearch_thai_ray.stages.highlights import (
    Span,
    extract_spans,
    highlight_text,
    merge_spans,
)


def test_exact_spans_thai():
    text = "สาหร่ายวากาเมะเป็นอาหารทะเล"
    spans = extract_spans(text, ["สาหร่ายวากาเมะ", "อาหารทะเล"])
    assert [(s.start, s.end) for s in spans] == [(0, 14), (18, 27)]
    assert all(s.kind == "exact" for s in spans)


def test_compound_part_spans():
    text = "ผมชอบวากาเมะมาก"
    spans = extract_spans(text, ["สาหร่ายวากาเมะ"],
                          {"สาหร่ายวากาเมะ": ["สาหร่าย", "วากาเมะ"]})
    assert any(s.kind == "compound_part" and s.term == "วากาเมะ" for s in spans)


def test_fuzzy_confidence_threshold():
    # token "computer" contained in query term "computers": 8/9 ≈ 0.89 -> fuzzy
    spans = extract_spans("a computer here", ["computers"])
    assert any(s.kind == "fuzzy" and abs(s.confidence - 8 / 9) < 1e-9 for s in spans)
    # term substring of token is covered by the exact scan instead
    spans2 = extract_spans("a computer here", ["comput"])
    assert any(s.kind == "exact" for s in spans2)
    # "ab" too short for fuzzy; "xy" not present
    assert extract_spans("abcdefgh", ["xy"]) == []


def test_overlap_merge_keeps_higher_confidence():
    spans = [Span(0, 5, "a", "fuzzy", 0.7), Span(3, 10, "b", "exact", 1.0)]
    merged = merge_spans(spans)
    assert len(merged) == 1 and merged[0].kind == "exact"


def test_highlight_markup():
    text = "hello world"
    spans = extract_spans(text, ["world"])
    assert highlight_text(text, spans) == "hello <em>world</em>"


def test_repeated_term_all_occurrences():
    spans = extract_spans("cat dog cat", ["cat"])
    assert [(s.start, s.end) for s in spans] == [(0, 3), (8, 11)]
