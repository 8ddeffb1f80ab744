"""K26 — Meilisearch GET /indexes/:idx/similar (vector similar-documents).

Naive python oracle over the full corpus vs the distributed pipeline:
filter pushdown -> keys-only semi-filter -> partial-top-k cosine scan.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.pipelines.simple_text import similar_docs

SF = "/root/testdata/sf0.001"


def _naive(target_id, allowed, limit, offset, threshold):
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.asarray(emb["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(len(ids), -1)
    q = mat[list(ids).index(target_id)]
    q = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round(mat @ q / norms, 6)
    rows = [(int(i), float(s)) for i, s in zip(ids, sims)
            if i != target_id and i in allowed and s >= threshold]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[offset:offset + limit]


def _allowed(filter_fn):
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return {int(d) for d, l, n in zip(
        docs["doc_id"].to_pylist(), docs["lang"].to_pylist(),
        docs["n_chars"].to_pylist()) if filter_fn(l, n)}


def test_similar_docs_matches_naive_oracle(ray_session):
    got = similar_docs(SF)
    allowed = _allowed(lambda l, n: l in ("en", "fr") and n >= 150)
    want = _naive(7, allowed, 10, 2, 0.15)
    assert list(zip(got["doc_id"].to_pylist(),
                    got["sim"].to_pylist())) == want
    assert 7 not in got["doc_id"].to_pylist()  # target always excluded


def test_similar_docs_threshold_binds(ray_session):
    """A high rankingScoreThreshold must shrink the page below the limit —
    and every surviving sim must clear it (the partials-then-filter
    exactness argument in the docstring)."""
    got = similar_docs(SF, threshold=0.28, offset=0, limit=10)
    sims = got["sim"].to_pylist()
    assert 0 < len(sims) < 10
    assert all(s >= 0.28 for s in sims)
    allowed = _allowed(lambda l, n: l in ("en", "fr") and n >= 150)
    assert list(zip(got["doc_id"].to_pylist(), sims)) == _naive(
        7, allowed, 10, 0, 0.28)


def test_similar_docs_offset_pages_consecutively(ray_session):
    a = similar_docs(SF, offset=0, limit=5)
    b = similar_docs(SF, offset=5, limit=5)
    full = similar_docs(SF, offset=0, limit=10)
    assert (a["doc_id"].to_pylist() + b["doc_id"].to_pylist()
            == full["doc_id"].to_pylist())


def test_similar_docs_filter_change_applies(ray_session):
    got = similar_docs(SF, filter_str="lang = zh", threshold=-1.0,
                       offset=0, limit=10)
    allowed = _allowed(lambda l, n: l == "zh")
    if not allowed:
        pytest.skip("no zh docs at this sf")
    want = _naive(7, allowed, 10, 0, -1.0)
    assert list(zip(got["doc_id"].to_pylist(),
                    got["sim"].to_pylist())) == want
