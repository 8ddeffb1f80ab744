"""Hybrid search (k23): BM25 keyword + embedding cosine mix.

Meilisearch's `hybrid: {semanticRatio}` request parameter
(reference exposes plain Meilisearch search; hybrid is the engine feature the
ranked-mix contract models). Verified three ways: the SQL oracle hash at
sf0.01 (check_oracle), a naive in-memory python oracle here at sf0.001 over
four weight mixes (including both pure extremes), and the integer-exactness
property (ppm components make the mix independent of block layout)."""

import math

import numpy as np
import pyarrow.parquet as pq

from meilisearch_thai_ray.pipelines.simple_text import (
    BM25_QUERY,
    HYBRID_K,
    HYBRID_QV_ID,
    hybrid_topk,
)

SF = "/root/testdata/sf0.001"


def _naive_hybrid(sf_dir: str, w_sem: int, w_kw: int, k: int = HYBRID_K):
    docs = pq.read_table(sf_dir + "/documents.parquet",
                         columns=["doc_id", "text"])
    emb = pq.read_table(sf_dir + "/embeddings.parquet",
                        columns=["vec_id", "embedding"])

    # keyword side: whitespace BM25 (k1=1.2, b=0.75), normalized to ppm
    toks = [t.split(" ") for t in docs["text"].to_pylist()]
    ids = docs["doc_id"].to_pylist()
    n = len(ids)
    avgdl = sum(len(t) for t in toks) / n
    kw_ppm: dict[int, int] = {}
    if w_kw:
        scores: dict[int, float] = {}
        for term in sorted(set(BM25_QUERY)):
            df = sum(term in t for t in toks)
            if not df:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, t in zip(ids, toks):
                tf = t.count(term)
                if tf:
                    dl = len(t)
                    scores[d] = scores.get(d, 0.0) + idf * (
                        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        m = max(scores.values())
        kw_ppm = {d: int(np.round(s / m * 1e6)) for d, s in scores.items()}

    # semantic side: cosine to the vec_id=HYBRID_QV_ID embedding, ppm
    mat = np.asarray(emb["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(emb.num_rows, -1)
    vids = np.asarray(emb["vec_id"].to_pylist())
    q = mat[np.flatnonzero(vids == HYBRID_QV_ID)[0]]
    q = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sem_ppm = np.round(((mat @ q) / norms + 1.0) / 2.0 * 1e6).astype(np.int64)

    mix = {int(v): w_sem * int(s) for v, s in zip(vids, sem_ppm)}
    for d, p in kw_ppm.items():
        mix[d] = mix.get(d, 0) + w_kw * p
    top = sorted(mix.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return top


def test_hybrid_matches_naive_oracle_across_weight_mixes(ray_session):
    # (1,1) = semanticRatio 0.5; (3,1) = 0.75; and both pure extremes
    for w_sem, w_kw in [(1, 1), (3, 1), (1, 0), (0, 1)]:
        got = hybrid_topk(SF, w_sem=w_sem, w_kw=w_kw)
        want = _naive_hybrid(SF, w_sem, w_kw)
        got_rows = list(zip(got["doc_id"].to_pylist(),
                            got["hybrid_ppm"].to_pylist()))
        assert got_rows == want, f"weights ({w_sem},{w_kw})"


def test_hybrid_pure_semantic_is_cosine_ranking(ray_session):
    """w_kw=0 must reproduce the ann_cosine ranking (sem ppm ordering)."""
    got = hybrid_topk(SF, w_sem=1, w_kw=0, k=10)
    want = _naive_hybrid(SF, 1, 0, k=10)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    # the query vector's own row is the perfect match
    assert got["doc_id"][0].as_py() == HYBRID_QV_ID
    assert got["hybrid_ppm"][0].as_py() == 1_000_000


def test_hybrid_scores_are_integer_exact(ray_session):
    got = hybrid_topk(SF)
    assert got["hybrid_ppm"].type == "int64"
    assert got["rank"].to_pylist() == list(range(1, got.num_rows + 1))


def test_percolate_matches_python_sets(ray_session):
    """Percolation (s9): all/any strategies agree with naive set logic."""
    from meilisearch_thai_ray.pipelines.simple_text import (
        PERCOLATE_QUERIES, percolate)

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])
    toksets = {d: set(t.split(" ")) for d, t in
               zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
    want = set()
    for qid, terms, strat in PERCOLATE_QUERIES:
        for d, ts in toksets.items():
            hit = (all(t in ts for t in terms) if strat == "all"
                   else any(t in ts for t in terms))
            if hit:
                want.add((d, qid))
    got_t = percolate(SF).to_pandas()
    got = set(zip(got_t["doc_id"], got_t["query_id"]))
    assert got == want and len(want) > 0


def test_prefix_topk_matches_naive_oracle(ray_session):
    """K25 search-as-you-type: last-word prefix expansion with per-doc MAX
    over the completion group == naive python BM25."""
    from meilisearch_thai_ray.pipelines.simple_text import (PREFIX_QUERY,
                                                            prefix_topk)

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])
    toks = [t.split(" ") for t in docs["text"].to_pylist()]
    ids = docs["doc_id"].to_pylist()
    n = len(ids)
    avgdl = sum(len(t) for t in toks) / n

    def bm25(tf, dl, df):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))

    head, pref = PREFIX_QUERY[:-1], PREFIX_QUERY[-1]
    vocab = sorted({t for ts in toks for t in ts})
    df = {v: sum(v in ts for ts in toks) for v in vocab}
    exps = sorted((v for v in vocab if v.startswith(pref)),
                  key=lambda v: (-df[v], v))[:10]
    assert len(exps) >= 2  # the corpus must exercise multi-completion max
    scores = {}
    for d, ts in zip(ids, toks):
        s = 0.0
        for h in head:
            if h in ts:
                s += bm25(ts.count(h), len(ts), df[h])
        grp = [bm25(ts.count(e), len(ts), df[e]) for e in exps if e in ts]
        if grp:
            s += max(grp)
        if s > 0:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = prefix_topk(SF)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    assert got["score"].to_pylist() == [round(s, 6) for _, s in want]


def test_residual_ivfpq_halves_distortion_on_clustered_corpus():
    """Residual PQ's structural advantage on clustered data: quantizing
    v - centroid instead of v roughly HALVES reconstruction distortion at
    the same code budget (measured ratio ~0.50 here; asserted < 0.7), and
    both stage classes retrieve planted near-duplicates end to end. Pure
    numpy through the stage classes — no Ray needed."""
    import pyarrow as pa

    from meilisearch_thai_ray.stages.ann import (IvfPqResidualEncode,
                                                 IvfPqResidualTopK, PqAdcTopK,
                                                 PqEncode, kmeans_fit)

    rng = np.random.default_rng(7)
    n_clusters, per, dim, m = 16, 125, 32, 8
    centers = rng.normal(size=(n_clusters, dim)) * 4.0
    q = centers[3] + rng.normal(size=dim) * 0.3
    base = np.concatenate([
        c + rng.normal(size=(per, dim)) * 0.3 for c in centers])
    dups = q + rng.normal(size=(10, dim)) * 0.05  # planted true top-10
    vecs = np.concatenate([base, dups])
    ids = np.arange(len(vecs))
    norms = np.linalg.norm(vecs, axis=1)
    nv = vecs / norms[:, None]
    cents = kmeans_fit(nv, n_clusters)
    d2 = ((nv ** 2).sum(1)[:, None] - 2 * (nv @ cents.T)
          + (cents ** 2).sum(1)[None, :])
    resid = nv - cents[d2.argmin(1)]

    def mse(space):
        err = np.zeros(len(vecs))
        for sub in np.array_split(space, m, axis=1):
            cb = kmeans_fit(sub, 256)
            sd = ((sub ** 2).sum(1)[:, None] - 2 * (sub @ cb.T)
                  + (cb ** 2).sum(1)[None, :])
            err += ((sub - cb[sd.argmin(1)]) ** 2).sum(1)
        return err.mean()

    flat_mse, res_mse = mse(nv), mse(resid)
    assert res_mse < 0.7 * flat_mse, (flat_mse, res_mse)

    # and the distributed stage classes retrieve the planted dups end to end
    batch = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float64))),
    })
    qn = q / np.linalg.norm(q)
    exact = set(ids[np.argsort(-(vecs @ qn) / norms)][:10].tolist())
    assert exact == set(range(len(base), len(vecs)))
    flat_books = [kmeans_fit(sub, 256)
                  for sub in np.array_split(nv, m, axis=1)]
    res_books = [kmeans_fit(sub, 256)
                 for sub in np.array_split(resid, m, axis=1)]
    flat_out = PqAdcTopK(flat_books, q, k=10)(PqEncode(flat_books)(batch))
    res_out = IvfPqResidualTopK(res_books, cents, q,
                                list(range(n_clusters)), k=10)(
        IvfPqResidualEncode(res_books, cents)(batch))

    def recall(t):
        order = np.lexsort((t["vec_id"].to_numpy(zero_copy_only=False),
                            -t["sim"].to_numpy(zero_copy_only=False)))[:10]
        top = set(t["vec_id"].to_numpy(zero_copy_only=False)[order].tolist())
        return len(top & exact) / 10

    assert recall(res_out) == 1.0
    assert recall(flat_out) == 1.0


def test_residual_ivfpq_pipeline_recall_floor(ray_session):
    """The sf-dir pipeline end to end: full probe recall floor on the
    driver's embeddings table."""
    import pyarrow.parquet as pq2

    from meilisearch_thai_ray.pipelines.simple_text import ann_ivfpq_res_topk

    emb = pq2.read_table(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mat = np.asarray(emb["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(emb.num_rows, -1)
    vids = np.asarray(emb["vec_id"].to_pylist())
    q = mat[np.flatnonzero(vids == 0)[0]]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    exact = set(vids[np.argsort(-(mat @ qn) / norms)][:10].tolist())
    out = ann_ivfpq_res_topk(SF, nprobe=16)  # full probe
    got = set(out["vec_id"].to_pylist())
    assert len(got & exact) / 10 >= 0.4
    assert 0 in got  # the query vector itself must surface


def test_residual_ivfpq_refine_reaches_exact_topk(ray_session):
    """refine (the faiss-RFlat re-rank): ADC shortlist + ONE pruned float
    read must reproduce the exact brute-force top-10 at full probe."""
    import pyarrow.parquet as pq2

    from meilisearch_thai_ray.pipelines.simple_text import ann_ivfpq_res_topk

    emb = pq2.read_table(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mat = np.asarray(emb["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(emb.num_rows, -1)
    vids = np.asarray(emb["vec_id"].to_pylist())
    q = mat[np.flatnonzero(vids == 0)[0]]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ qn) / norms, 6)
    order = np.lexsort((vids, -sims))[:10]
    exact_ids = vids[order].tolist()

    out = ann_ivfpq_res_topk(SF, nprobe=16, refine=100)  # full probe
    assert out["vec_id"].to_pylist() == exact_ids
    assert out["sim"].to_pylist() == [round(float(s), 6)
                                      for s in sims[order]]


def test_adc_shortlist_floor_rule():
    """The auto refine floor tracks the MEASURED recall knee: strict
    recall@10 at 1M vectors transitioned between 800 (~0.6% of ~125k
    probed codes, 0/10) and 1600 (~1.3%, 10/10) — the floor must clear
    the knee with margin at every scale, and never drop below 10*k."""
    from meilisearch_thai_ray.stages.ann import adc_shortlist_floor

    assert adc_shortlist_floor(0) == 100          # small-corpus floor
    assert adc_shortlist_floor(1000) == 100
    assert adc_shortlist_floor(125_000) == 2500   # 1M, nprobe/nlist=1/8
    assert adc_shortlist_floor(125_000) > 1600    # clears the measured knee
    # linear in probed count: 10x corpus -> 10x floor (the property the
    # old fixed-1000 default lacked, which WAS the r4 cliff)
    assert adc_shortlist_floor(1_250_000) == 10 * adc_shortlist_floor(125_000)
    assert adc_shortlist_floor(50, k=3) == 30


def test_residual_ivfpq_refine_auto(ray_session):
    """refine='auto' picks the floor from the stored per-list sizes; at
    driver-gate scale the floor covers every probed code, so the result
    must equal the exact brute-force top-10 (plumbing + formula check)."""
    import pyarrow.parquet as pq2

    from meilisearch_thai_ray.pipelines.simple_text import ann_ivfpq_res_topk

    emb = pq2.read_table(SF + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mat = np.asarray(emb["embedding"].combine_chunks().values,
                     dtype=np.float64).reshape(emb.num_rows, -1)
    vids = np.asarray(emb["vec_id"].to_pylist())
    q = mat[np.flatnonzero(vids == 0)[0]]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ qn) / norms, 6)
    order = np.lexsort((vids, -sims))[:10]

    out = ann_ivfpq_res_topk(SF, nprobe=16, refine="auto")  # full probe
    assert out["vec_id"].to_pylist() == vids[order].tolist()
