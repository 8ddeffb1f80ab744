"""Distributed connected components (stages/graph.py) and the
cluster-canonical curate mode that builds on it."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from meilisearch_thai_ray.stages.graph import connected_components, union_find


def _cc_dict(edges_table: pa.Table) -> dict[int, int]:
    out = connected_components(ray.data.from_arrow(edges_table))
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    return dict(zip(t["doc_id"].to_pylist(), t["component"].to_pylist()))


def test_cc_matches_union_find_random_graph(ray_session):
    rng = np.random.RandomState(7)
    pairs = []
    for base in (0, 500, 1000):  # three 101-node chains
        pairs += [(base + i, base + i + 1) for i in range(100)]
    for i in range(1500, 1520):  # one 20-node clique
        for j in range(i + 1, 1520):
            pairs.append((i, j))
    extra = rng.randint(0, 2000, size=(300, 2))
    pairs += [(int(a), int(b)) for a, b in extra if a != b]

    t = pa.table({"u": pa.array([a for a, _ in pairs], pa.int64()),
                  "v": pa.array([b for _, b in pairs], pa.int64())})
    got, exp = _cc_dict(t), union_find(pairs)
    assert got == exp


def test_cc_empty_and_single_edge(ray_session):
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    assert _cc_dict(empty) == {}
    one = pa.table({"u": pa.array([9], pa.int64()),
                    "v": pa.array([3], pa.int64())})
    assert _cc_dict(one) == {3: 3, 9: 3}


def test_cc_duplicate_and_reversed_edges(ray_session):
    # the operator must tolerate multi-edges and both orientations
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (10, 11)]
    t = pa.table({"u": pa.array([a for a, _ in pairs], pa.int64()),
                  "v": pa.array([b for _, b in pairs], pa.int64())})
    assert _cc_dict(t) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_dups_sf0001(ray_session):
    from meilisearch_thai_ray.pipelines.dedup_pipelines import (
        connected_dups,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"
    pairs = ngram_jaccard_pairs(sf)
    got = connected_dups(sf)
    exp = union_find(list(zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())))
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["component"].to_pylist())) == exp


def test_curate_modes_chain_semantics(ray_session, tmp_path):
    """Chain-shaped near-dup graph where the two drop rules differ: docs
    A < B < C with A~B, B~C (and a node whose only edges point UP survives
    pairwise-b but not cluster-canonical)."""
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.pipelines.curate import curated_docs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon ")
    # A and B share a 0.6+ jaccard; B and C share one; A vs C below threshold
    a = base + "one two three four five six seven eight nine ten"
    b = base + "one two three four five eleven twelve thirteen fourteen fifteen"
    c = base + "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    uniq = ("completely different text about something else entirely with "
            "enough words to pass the minimum word count quality gate here "
            "now ok fine truly distinct tokens everywhere avocado zebra")
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["en"] * 4),
        "n_chars": pa.array([len(x) for x in (a, b, c, uniq)], pa.int64()),
        "text": pa.array([a, b, c, uniq]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    pw = sorted(curated_docs(str(tmp_path)).to_pandas()["doc_id"])
    cc = sorted(curated_docs(str(tmp_path),
                             mode="cluster_canonical").to_pandas()["doc_id"])
    # chain {1,2,3} is one component: canonical keeps only doc 1
    assert cc == [1, 4]
    # pairwise-b drops 2 (pair 1-2) and 3 (pair 2-3) here too; canonical
    # output must always be a subset of pairwise output
    assert set(cc) <= set(pw)
    with pytest.raises(ValueError):
        curated_docs(str(tmp_path), mode="nope")


def test_curate_minhash_mode_matches_exact_on_planted_dups(ray_session,
                                                           tmp_path):
    """near_dup="minhash" (the 100-TB swap of the exact pair join) drops the
    same planted near-duplicates as the exact mode and keeps distinct docs."""
    import pyarrow.parquet as pq

    from meilisearch_thai_ray.pipelines.curate import curated_docs

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon ") * 3
    near = words.replace("omicron", "OMICRON", 1)
    uniq = ("completely different text about something else entirely with "
            "enough words to pass the minimum word count quality gate here "
            "now ok fine truly distinct tokens everywhere avocado zebra")
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en"] * 3),
        "n_chars": pa.array([len(x) for x in (words, near, uniq)], pa.int64()),
        "text": pa.array([words, near, uniq]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    exact = sorted(curated_docs(str(tmp_path)).to_pandas()["doc_id"])
    mh = sorted(curated_docs(str(tmp_path),
                             near_dup="minhash").to_pandas()["doc_id"])
    assert exact == mh == [1, 3]
    with pytest.raises(ValueError):
        curated_docs(str(tmp_path), near_dup="nope")

    # near_dup="auto" (the default): exact at driver-gate sizes, minhash
    # above EXACT_NEAR_DUP_MAX_DOCS survivors — same curated set either way
    from meilisearch_thai_ray.pipelines import curate as C

    saved = C.EXACT_NEAR_DUP_MAX_DOCS
    try:
        C.EXACT_NEAR_DUP_MAX_DOCS = 1  # force the minhash branch
        auto_mh = sorted(
            curated_docs(str(tmp_path)).to_pandas()["doc_id"])
    finally:
        C.EXACT_NEAR_DUP_MAX_DOCS = saved
    assert auto_mh == exact


def test_star_scan_matches_group_oracle(ray_session):
    """_star_round (sort + per-block scan) emits the SAME edge multiset
    as the per-group _large_star/_small_star oracles, on a random
    multigraph with duplicate edges and runs spanning blocks."""
    import collections

    import ray.data

    from meilisearch_thai_ray.stages.graph import (
        _both_orientations, _large_star, _orient_max_first, _small_star,
        _star_round)

    rng = np.random.default_rng(7)
    tabs = []
    for blk in range(8):
        u = rng.integers(0, 40, size=60)
        v = rng.integers(0, 40, size=60)
        ok = u != v
        tabs.append(pa.table({"u": pa.array(u[ok], pa.int64()),
                              "v": pa.array(v[ok], pa.int64())}))
    edges = ray.data.from_arrow(tabs)

    def group_oracle(tab: pa.Table, star) -> collections.Counter:
        u = tab["u"].to_numpy(zero_copy_only=False)
        out = collections.Counter()
        for uu in np.unique(u):
            g = tab.filter(pa.array(u == uu))
            o = star(g)
            out.update(zip(o["u"].to_pylist(), o["v"].to_pylist()))
        return out

    both = pa.concat_tables(
        [_both_orientations(t) for t in tabs])
    got_large = _star_round(
        edges.map_batches(_both_orientations, batch_format="pyarrow"),
        "large").to_pandas()
    assert collections.Counter(zip(got_large["u"], got_large["v"])) == \
        group_oracle(both, _large_star)

    oriented = _orient_max_first(both)
    got_small = _star_round(
        ray.data.from_arrow(both).map_batches(
            _orient_max_first, batch_format="pyarrow"),
        "small").to_pandas()
    assert collections.Counter(zip(got_small["u"], got_small["v"])) == \
        group_oracle(oriented, _small_star)


def _np_pagerank(edges, n_iter=5, d=0.85):
    """Reference power iteration with the same update rule."""
    import numpy as np

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    out_s = np.zeros(n)
    for s, t, w in edges:
        out_s[idx[s]] += w
    for _ in range(n_iter):
        c = np.zeros(n)
        for s, t, w in edges:
            c[idx[t]] += r[idx[s]] * w / out_s[idx[s]]
        r = (1 - d) / n + d * c
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_power_iteration(ray_session):
    """Distributed PageRank == numpy power iteration on a weighted digraph
    with a hub, a chain, and asymmetric weights (every node has out-edges)."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import pagerank

    edges = [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0), (3, 1, 1.0),
             (3, 4, 1.0), (4, 5, 1.0), (5, 1, 3.0), (2, 4, 0.5),
             (4, 1, 1.0), (5, 4, 1.0)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, n_iter=5).take_all()}
    exp = _np_pagerank(edges)
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9, n
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_boundary_merge_under_tiny_blocks(ray_session):
    """A 60-node ring + hub graph under 2 KiB sort blocks: most src runs
    straddle block boundaries, so contributions flow through the raw-edge
    driver merge — ranks must still match power iteration."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import pagerank

    edges = []
    for i in range(60):
        edges.append((i, (i + 1) % 60, 1.0))   # ring
        edges.append((i, 999, 0.5))            # everyone links the hub
    edges += [(999, j, 1.0) for j in range(0, 60, 7)]  # hub links back
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = {r["node"]: r["rank"]
               for r in pagerank(ds, n_iter=4).take_all()}
    finally:
        ctx.target_max_block_size = saved
    exp = _np_pagerank(edges, n_iter=4)
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9, n


def test_purchase_pagerank_pipeline_matches_oracle(ray_session):
    """End-to-end pipeline at sf0.001 == power iteration over the exact
    DuckDB-derived (customer, supplier, lineitem-count) edge list."""
    import duckdb

    from meilisearch_thai_ray.pipelines.olap2 import (_PR_SUPP_BASE,
                                                      purchase_pagerank)

    out = purchase_pagerank("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    pairs = con.execute("""
        SELECT o_custkey, l_suppkey, count(*) AS w
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2""").fetchall()
    edges = []
    for c, s, w in pairs:
        edges.append((int(c), int(s) + _PR_SUPP_BASE, float(w)))
        edges.append((int(s) + _PR_SUPP_BASE, int(c), float(w)))
    exp = _np_pagerank(edges)
    got = {}
    for _, r in out.iterrows():
        node = (int(r["key"]) + _PR_SUPP_BASE
                if r["node_type"] == "supplier" else int(r["key"]))
        got[node] = r["rank"]
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9


def test_pagerank_hub_skew_constant_carries(ray_session):
    """A 3000-edge hub under 2 KiB sort blocks: the hub's src run spans
    MANY blocks, so correctness depends on the constant-size profile
    carries (per-block Σw + rank location) and the distributed pending
    rows — the hub's adjacency must never ship to the driver as raw rows.
    Ranks must match power iteration exactly."""
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import pagerank

    hub = 7
    edges = []
    for j in range(3000):
        leaf = 1000 + j
        edges.append((hub, leaf, 1.0 + (j % 5)))   # hub fans out, weighted
        edges.append((leaf, hub, 1.0))             # leaves point back
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = {r["node"]: r["rank"] for r in pagerank(ds, n_iter=3).take_all()}
    finally:
        ctx.target_max_block_size = saved
    exp = _np_pagerank(edges, n_iter=3)
    assert set(got) == set(exp)
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9


def _np_hits(edges, n_iter=5):
    import numpy as np

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t, w in edges:
        A[idx[s], idx[t]] += w
    h = np.ones(n)
    for _ in range(n_iter):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0
    return ({nodes[i]: h[i] for i in range(n)},
            {nodes[i]: a[i] for i in range(n)})


def test_hits_matches_power_iteration(ray_session):
    """Distributed HITS == numpy on a weighted digraph with pure sources
    (hub-only), pure sinks (authority-only), and a hub whose adjacency
    straddles 2 KiB blocks."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import hits

    edges = [(1, 10, 2.0), (1, 11, 1.0), (2, 10, 1.0), (2, 12, 3.0),
             (3, 11, 1.0), (10, 12, 0.5)]  # 1,2,3 sources; 12 pure sink
    edges += [(7, 1000 + j, 1.0) for j in range(800)]  # straddling hub
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits(ds, n_iter=4).take_all()}
    finally:
        ctx.target_max_block_size = saved
    eh, ea = _np_hits(edges, n_iter=4)
    assert set(got) == set(eh)
    for nd in eh:
        assert abs(got[nd][0] - eh[nd]) < 1e-9, ("hub", nd)
        assert abs(got[nd][1] - ea[nd]) < 1e-9, ("auth", nd)
    # role sanity: pure sources have 0 authority, the pure sink 0 hub
    assert got[3][1] == 0.0 and got[12][0] == 0.0


def test_purchase_hits_pipeline_matches_oracle(ray_session):
    """End-to-end HITS at sf0.001 == numpy over the DuckDB-derived
    directed customer->supplier edge list."""
    import duckdb

    from meilisearch_thai_ray.pipelines.olap2 import (_PR_SUPP_BASE,
                                                      purchase_hits)

    out = purchase_hits("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    pairs = con.execute("""
        SELECT o_custkey, l_suppkey, count(*) AS w
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2""").fetchall()
    edges = [(int(c), int(s) + _PR_SUPP_BASE, float(w))
             for c, s, w in pairs]
    eh, ea = _np_hits(edges)
    got = {}
    for _, r in out.iterrows():
        node = (int(r["key"]) + _PR_SUPP_BASE
                if r["node_type"] == "supplier" else int(r["key"]))
        got[node] = (r["hub"], r["authority"])
    assert set(got) == set(eh)
    for nd in eh:
        assert abs(got[nd][0] - eh[nd]) < 1e-9
        assert abs(got[nd][1] - ea[nd]) < 1e-9


def _np_lpa(edges, n_iter=5):
    """Synchronous deterministic LPA oracle: max incident weight,
    ties to the smallest label; no-vote nodes keep their label."""
    import numpy as np

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    lab = {n: n for n in nodes}
    for _ in range(n_iter):
        votes = {}
        for s, t, w in edges:
            votes.setdefault(t, {}).setdefault(lab[s], 0.0)
            votes[t][lab[s]] += w
        new = dict(lab)
        for t, vv in votes.items():
            best = max(vv.items(), key=lambda kv: (kv[1], -kv[0]))
            new[t] = best[0]
        lab = new
    return lab


def test_label_propagation_two_communities(ray_session):
    """Two dense 12-node cliques joined by one weak bridge, under 2 KiB
    blocks: after 5 synchronous rounds the distributed labels equal the
    numpy oracle exactly (and form exactly two communities)."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import label_propagation

    edges = []
    for base in (0, 100):
        for i in range(12):
            for j in range(i + 1, 12):
                edges.append((base + i, base + j, 1.0))
                edges.append((base + j, base + i, 1.0))
    edges += [(11, 100, 0.1), (100, 11, 0.1)]  # weak bridge
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = {r["node"]: r["label"]
               for r in label_propagation(ds, n_iter=5).take_all()}
    finally:
        ctx.target_max_block_size = saved
    exp = _np_lpa(edges, n_iter=5)
    assert got == exp
    comms = {}
    for n, l in got.items():
        comms.setdefault(l, set()).add(n)
    assert len(comms) == 2
    assert {frozenset(c) for c in comms.values()} == {
        frozenset(range(12)), frozenset(range(100, 112))}


def test_label_propagation_isolated_and_skew(ray_session):
    """A 500-leaf hub (straddling runs + pending votes) and a
    no-incoming-vote source node (must keep its own label): exact numpy
    parity after 3 rounds."""
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import label_propagation

    edges = [(5, 1000 + j, 1.0) for j in range(500)]       # hub fan-out
    edges += [(1000 + j, 5, 1.0) for j in range(500)]
    edges.append((9999, 5, 0.01))  # source with no in-edges
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = {r["node"]: r["label"]
               for r in label_propagation(ds, n_iter=3).take_all()}
    finally:
        ctx.target_max_block_size = saved
    exp = _np_lpa(edges, n_iter=3)
    assert got == exp
    assert got[9999] == 9999  # kept its own label (never receives votes)


def test_push_presorted_equals_sorted_union_oracle(ray_session):
    """The sort-once exchange (SortedFacts + push_scores_presorted) must
    reproduce push_scores (the sorted-union semantic oracle) exactly, in
    BOTH strength modes, on a deterministic random graph with hubs, under
    tiny blocks (forcing straddling runs, continuation blocks, and
    score-only runs for keys with no out-edges)."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import (
        SortedFacts, _fact_rows_ds, _pr_union_schema, push_scores,
        push_scores_presorted)

    rng = np.random.RandomState(7)
    n_nodes, n_edges = 120, 900
    src = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    src[:300] = 3  # hub whose run spans many 2 KiB blocks
    w = (rng.rand(n_edges) * 4 + 0.5).round(3)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "w": pa.array(w, pa.float64())}))
    # scores for every node PLUS keys with no out-edges at all
    keys = np.arange(-3, n_nodes + 5, dtype=np.int64)
    scores_tab = _pr_union_schema(
        keys.size, keys, 1, np.zeros(keys.size, np.int64),
        (np.abs(np.sin(keys.astype(np.float64))) + 0.01))
    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        scores = ray.data.from_arrow(scores_tab)
        facts = _fact_rows_ds(edges)
        sf = SortedFacts(_fact_rows_ds(edges))
        for divide in (True, False):
            exp = {r["cdst"]: r["sum(cval)"]
                   for r in push_scores(scores, facts,
                                        divide_strength=divide).take_all()}
            got = {r["cdst"]: r["sum(cval)"]
                   for r in push_scores_presorted(
                       scores, sf, divide_strength=divide).take_all()}
            assert set(got) == set(exp)
            for k in exp:
                assert abs(got[k] - exp[k]) < 1e-9, (divide, k)
    finally:
        ctx.target_max_block_size = saved


def _np_pagerank_general(edges, nodes, n_iter=5, d=0.85):
    """Power iteration over a GENERAL digraph: zero-in-degree nodes keep
    their teleport mass; dangling nodes contribute nothing (leaky
    simplified-PageRank convention, matching stages.graph.pagerank)."""
    import numpy as np

    nodes = sorted(nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    out_s = np.zeros(n)
    for s, t, w in edges:
        out_s[idx[s]] += w
    for _ in range(n_iter):
        c = np.zeros(n)
        for s, t, w in edges:
            if out_s[idx[s]] > 0:
                c[idx[t]] += r[idx[s]] * w / out_s[idx[s]]
        r = (1 - d) / n + d * c
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_general_digraph_keeps_teleport_mass(ray_session):
    """r3 advice: on a general DIRECTED graph (no both-orientations
    precondition) a zero-in-degree source must keep its teleport mass
    every iteration instead of vanishing after round 1, and a dangling
    sink (no out-edges) must appear in the output with base+damped rank.
    Exact numpy parity over src UNION dst."""
    import pyarrow as pa

    import ray.data
    from meilisearch_thai_ray.stages.graph import pagerank

    edges = [
        (1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0),   # cycle
        (10, 2, 1.0),                             # 10: zero in-degree
        (11, 12, 1.0),                            # 12: dangling sink
        (2, 12, 0.5),
    ]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "w": pa.array([e[2] for e in edges], pa.float64()),
    }))
    got = {r["node"]: r["rank"] for r in pagerank(ds, n_iter=5).take_all()}
    nodes = {e[0] for e in edges} | {e[1] for e in edges}
    exp = _np_pagerank_general(edges, nodes, n_iter=5)
    assert set(got) == nodes
    for n in exp:
        assert abs(got[n] - exp[n]) < 1e-9, n
    # the zero-in-degree sources held their teleport floor, every round
    base = (1 - 0.85) / len(nodes)
    assert abs(got[10] - base) < 1e-12
    assert abs(got[11] - base) < 1e-12
