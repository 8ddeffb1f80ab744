"""K11b — faceting settings: sortFacetValuesBy + maxValuesPerFacet."""

import pytest

from meilisearch_thai_ray.pipelines.simple_text import (
    facet_counts,
    facet_distribution_sorted,
)

SF = "/root/testdata/sf0.001"


def test_count_order_and_truncation(ray_session):
    t = facet_distribution_sorted(SF, sort_by="count", max_values=3)
    per = {}
    for r in t.to_pylist():
        per.setdefault(r["facet"], []).append(r)
    full = {}
    for r in facet_counts(SF).take_all():
        full.setdefault(r["facet"], []).append(r)
    assert 3 < len(full["source"])  # truncation really binds on source
    for facet, rows in per.items():
        assert len(rows) <= 3
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # descending counts, ties alphabetical — vs the full aggregate
        want = sorted(full[facet], key=lambda r: (-r["cnt"], r["value"]))[:3]
        assert [(r["value"], r["cnt"]) for r in rows] == [
            (r["value"], r["cnt"]) for r in want]


def test_alpha_order(ray_session):
    t = facet_distribution_sorted(SF, sort_by="alpha", max_values=100)
    vals = [r["value"] for r in t.to_pylist() if r["facet"] == "source"]
    assert vals == sorted(vals) and len(vals) >= 3


def test_invalid_sort_rejected(ray_session):
    with pytest.raises(ValueError):
        facet_distribution_sorted(SF, sort_by="size")
