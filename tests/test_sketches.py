"""Sketch kernels (stages/sketches.py) and the corpus-stats pipelines built
on them: HLL error bound + merge associativity, Misra-Gries no-false-negative
guarantee (shrink path exercised), exact two-pass heavy hitters vs a Counter,
quantile_disc parity, HLL-vs-exact pipeline bound."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisearch_thai_ray.stages.sketches import (
    HyperLogLog,
    MisraGries,
    bincount_partial,
    bit_length_u64,
    quantile_disc_from_hist,
    splitmix64,
)


def test_bit_length_u64_matches_python():
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        np.array([0, 1, 2, 3, 255, 2**31, 2**63, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, 1000).astype(np.uint64),
    ])
    got = bit_length_u64(xs)
    want = np.array([int(x).bit_length() for x in xs.tolist()])
    assert np.array_equal(got, want)


def test_splitmix64_is_uniformish_and_deterministic():
    ids = np.arange(100_000, dtype=np.int64)
    h1, h2 = splitmix64(ids), splitmix64(ids)
    assert np.array_equal(h1, h2)
    # top byte should be close to uniform over 256 buckets
    counts = np.bincount((h1 >> np.uint64(56)).astype(np.int64),
                         minlength=256)
    assert counts.min() > 200 and counts.max() < 600


@pytest.mark.parametrize("true_n", [50, 5000, 200_000])
def test_hll_error_bound_and_merge(true_n):
    ids = np.random.default_rng(42).choice(10**12, true_n, replace=False)
    whole = HyperLogLog(14).update_ints(ids)
    est = whole.estimate()
    # p=14 => sigma ~0.8%; assert a generous 4-sigma envelope
    assert abs(est - true_n) / true_n < 0.04
    parts = [HyperLogLog(14).update_ints(c) for c in np.array_split(ids, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert np.array_equal(merged.registers, whole.registers)


def test_misra_gries_guarantee_with_shrink():
    rng = np.random.default_rng(7)
    heavy = np.repeat(np.arange(10), 5000)          # 10 items x 5000
    tail = rng.integers(1000, 200_000, 150_000)      # long tail
    stream = np.concatenate([heavy, tail]).astype(str)
    rng.shuffle(stream)
    mg = MisraGries(k=64)
    for chunk in np.array_split(stream, 11):
        part = MisraGries(k=64)
        u, c = np.unique(chunk, return_counts=True)
        part.update_batch(u, c)
        mg.merge(part)
    assert len(mg.counts) <= 2 * 64  # bounded state
    true = collections.Counter(stream.tolist())
    bound = mg.error_bound()
    # guarantee 1: every item with true count > bound is present
    for item, cnt in true.items():
        if cnt > bound:
            assert item in mg.counts, item
    # guarantee 2: estimates never overcount and undercount <= bound
    for item, est in mg.counts.items():
        assert est <= true[item] <= est + bound
    # candidates(min_count) has no false negatives
    cands = set(mg.candidates(4000))
    assert {i for i, c in true.items() if c >= 4000} <= cands


def test_quantile_disc_matches_duckdb_on_random_data():
    import duckdb

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, 10_000)
    qs = [0.1, 0.5, 0.9, 0.99]
    want = duckdb.sql(
        f"SELECT quantile_disc(v, {qs}) FROM (SELECT unnest(?) v)",
        params=[vals.tolist()],
    ).fetchone()[0]
    hist = bincount_partial(vals, 512)
    got = quantile_disc_from_hist(hist, qs)
    assert list(want) == got


def _write_events(d, n_users=3000, n_rows=20_000):
    rng = np.random.default_rng(11)
    users = rng.integers(0, n_users, n_rows)
    types = np.array(["view", "click", "buy"])[rng.integers(0, 3, n_rows)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
            "ts": pa.array([0] * n_rows, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(np.zeros(n_rows), pa.float64()),
            "props": pa.array(["{}"] * n_rows, pa.string()),
        }),
        str(d / "events.parquet"),
    )


def test_hll_pipeline_within_bound_of_exact(ray_session, tmp_path):
    from meilisearch_thai_ray.pipelines.corpus_stats import (
        distinct_users,
        hll_distinct_users,
    )

    _write_events(tmp_path)
    exact = {r["event_type"]: r["n_users"]
             for r in distinct_users(str(tmp_path)).take_all()}
    approx = {r["event_type"]: r["approx_users"]
              for r in hll_distinct_users(str(tmp_path)).take_all()}
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.04, (et, n, approx[et])


def test_heavy_hitters_exact_vs_counter_with_tiny_k(ray_session, tmp_path):
    """k small enough that the MG shrink path actually runs; the two-pass
    output must still be EXACTLY the >= ceil(n/denom) set with exact
    counts (sketch only proposes candidates, never decides)."""
    import re

    from meilisearch_thai_ray.pipelines.corpus_stats import heavy_hitter_words

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i:04d}" for i in range(400)])
    weights = np.concatenate([np.full(8, 60.0), np.ones(392)])
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, 40, p=weights)) for _ in range(300)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 300, pa.string()),
            "source": pa.array(["t"] * 300, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = heavy_hitter_words(str(tmp_path), denom=50, k=64).to_pandas()
    words = [w for t in texts for w in re.findall(r"[^ \t\n\f\r]+", t)]
    true = collections.Counter(words)
    n = len(words)
    want = sorted((w, c) for w, c in true.items() if 50 * c >= n)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_stratified_sample_deterministic(ray_session):
    from meilisearch_thai_ray.pipelines.corpus_stats import (
        STRAT_N,
        stratified_sample,
    )

    a = stratified_sample("/root/testdata/sf0.001").to_pandas()
    b = stratified_sample("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)
    assert (a.groupby("lang").size() <= STRAT_N).all()


def test_repetition_stats_null_not_nan_on_empty_text(ray_session, tmp_path):
    """Zero-word docs must yield NULL (like the SQL oracle's x/0), never
    NaN — the gate hashes them differently."""
    import duckdb

    from meilisearch_thai_ray.pipelines.corpus_stats import (
        SQL,
        repetition_stats,
    )

    texts = ["   ", "", "aa bb aa"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    ours = repetition_stats(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = con.execute(SQL["m8b_repetition"]).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(ours[sorted(ours.columns)],
                                  theirs[sorted(theirs.columns)],
                                  check_dtype=False)
    assert ours["dup_word_frac"].isna()[:2].all()
    assert not np.isnan(ours["dup_word_frac"][2])


def test_curate_pipeline_stages_all_active(ray_session, tmp_path):
    """Planted corpus where each curation stage must fire: a too-short doc
    (quality), an exact duplicate (dedup keeps the lower id), and a pair of
    near-identical long docs (near-dup drops the higher id). Verified
    against the SQL oracle AND by explicit membership."""
    import duckdb
    import pandas as pd

    from meilisearch_thai_ray.pipelines.curate import SQL, curated_docs

    base = " ".join(f"tok{i:03d}" for i in range(40))
    texts = {
        1: base,                                   # survives
        2: "short doc",                            # quality-dropped (<20 w)
        3: base,                                   # exact dup of 1 -> drop
        4: base + " tail999",                      # near-dup of 1 -> drop
        5: " ".join(f"other{i:03d}" for i in range(40)),  # survives
        6: ("rep " * 40).strip(),                  # dup_word_frac too high
    }
    ids = sorted(texts)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids], pa.string()),
            "lang": pa.array(["en", "en", "en", "th", "th", "en"],
                             pa.string()),
            "source": pa.array(["t"] * 6, pa.string()),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    ours = curated_docs(str(tmp_path), n_blocks=2).to_pandas()
    assert sorted(ours["doc_id"]) == [1, 5]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = con.execute(SQL["d7_curate"]).fetchdf()
    pd.testing.assert_frame_equal(
        ours.sort_values("doc_id").reset_index(drop=True)[sorted(ours.columns)],
        theirs.sort_values("doc_id").reset_index(drop=True)[sorted(theirs.columns)],
        check_dtype=False)


def test_curate_to_parquet_partitioned_and_complete(ray_session, tmp_path):
    import pyarrow.dataset as pads

    from meilisearch_thai_ray.pipelines.curate import (
        curate_to_parquet,
        curated_docs,
    )

    out = str(tmp_path / "curated")
    res = curate_to_parquet("/root/testdata/sf0.001", out)
    want = curated_docs("/root/testdata/sf0.001").to_pandas()
    assert res["rows"] == len(want)
    got = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    import os

    assert any(p.startswith("lang=") for p in os.listdir(out))


def test_distributed_kmeans_matches_local_on_same_init(ray_session):
    """Same data + same init: distributed Lloyd's (per-batch partial sums)
    must agree with the in-memory reference to float-summation order, and
    inertia must be monotonically non-increasing across iterations."""
    import ray.data

    from meilisearch_thai_ray.stages.ann import (
        kmeans_fit,
        kmeans_fit_distributed,
    )

    rng = np.random.default_rng(21)
    data = np.concatenate([
        rng.normal(loc=c, scale=0.3, size=(200, 8))
        for c in (-3.0, 0.0, 3.0, 6.0)
    ])
    init = data[rng.choice(len(data), size=4, replace=False)].copy()
    local = init.copy()
    for _ in range(5):  # reference Lloyd's, same update rule
        d2 = ((data[:, None, :] - local[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(4):
            m = data[a == c]
            if len(m):
                local[c] = m.mean(axis=0)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(data)]
    )
    dist = kmeans_fit_distributed(ds, k=4, iters=5, init=init)
    assert np.allclose(dist, local, atol=1e-9)

    def inertia(cents):
        d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    prev = np.inf
    for it in (1, 2, 4):
        cur = inertia(kmeans_fit_distributed(ds, k=4, iters=it, init=init))
        assert cur <= prev + 1e-9
        prev = cur
    # sanity: the seeded-sample path (init=None) also runs
    c0 = kmeans_fit_distributed(ds, k=4, iters=1)
    assert c0.shape == (4, 8)
    # both trainers exist for a reason: kmeans_fit is the sample fallback
    assert kmeans_fit(data[:64], k=4).shape == (4, 8)


def test_bloom_no_false_negatives_and_merge():
    import numpy as np

    from meilisearch_thai_ray.stages.sketches import BloomFilter

    ids = np.arange(0, 5000, 7, dtype=np.int64)
    a = BloomFilter().add_ints(ids[: len(ids) // 2])
    b = BloomFilter().add_ints(ids[len(ids) // 2:])
    m = a.merge(b)
    assert m.test_ints(ids).all()  # no false negatives, incl. after merge
    # FP rate sane at this load factor (~715 keys in 16384 bits, k=4)
    probe = np.arange(1, 300000, 13, dtype=np.int64)
    probe = probe[~np.isin(probe, ids)]
    fp = m.test_ints(probe).mean()
    assert fp < 0.05


def test_bloom_semi_join_exact_despite_tiny_bloom(ray_session):
    """A 64-bit bloom saturates (every probe passes) — the confirm join
    must still produce the exact answer."""
    import duckdb

    from meilisearch_thai_ray.pipelines.corpus_stats import bloom_semi_join

    sf = "/root/testdata/sf0.001"
    got = bloom_semi_join(sf, m_bits=64).to_pandas()
    exp = duckdb.sql(f"""
        WITH e AS (SELECT * FROM read_parquet('{sf}/events.parquet')),
        vip AS (SELECT user_id FROM e WHERE event_type='purchase'
                GROUP BY user_id HAVING count(*) >= 15)
        SELECT e.event_id, e.user_id, e.event_type
        FROM e JOIN vip USING (user_id)""").fetchdf()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert got.equals(exp[got.columns.tolist()])


def test_quantiles_approx_within_one_bin(ray_session):
    """Approximate continuous quantiles land within one bin width of the
    true rank element, per event_type."""
    import numpy as np
    import pandas as pd

    from meilisearch_thai_ray.pipelines.corpus_stats import (
        APPROX_Q_BINS, quantiles_approx)

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    lo, hi = df["value"].min(), df["value"].max()
    width = (hi - lo) / APPROX_Q_BINS
    out = quantiles_approx(sf).to_pandas().set_index("event_type")
    assert len(out) == df["event_type"].nunique()
    for et, g in df.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        for col, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            true = v[max(0, int(np.ceil(q * v.size)) - 1)]
            assert abs(out.loc[et, col] - true) <= width + 1e-9


def test_kll_rank_error_bound_and_merge_and_roundtrip():
    """KLL(k=200): additive rank error well under 3/k on a heavy-tailed
    stream, both streamed and as a 16-way merge of partials; serialization
    roundtrips bit-identically."""
    from meilisearch_thai_ray.stages.sketches import KLL

    rng = np.random.default_rng(7)
    v = rng.lognormal(0.0, 2.0, 120_000)
    sv = np.sort(v)
    eps = 3.0 / 200  # theory: ~O(1/k) whp; 3/k is a loose determinstic gate

    streamed = KLL(k=200)
    for chunk in np.array_split(v, 23):
        streamed.update_many(chunk)
    parts = [KLL(k=200, seed=i).update_many(c)
             for i, c in enumerate(np.array_split(v, 16))]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)

    for sk in (streamed, merged):
        assert sk.n == v.size
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = sk.quantiles([q])[0]
            rank = np.searchsorted(sv, est) / v.size
            assert abs(rank - q) <= eps, (q, rank)
        # memory stays O(k log(n/k)), far below n
        assert sum(x.size for x in sk.levels) < 10 * 200

    rt = KLL.deserialize(merged.serialize())
    assert rt.n == merged.n
    assert rt.quantiles([0.1, 0.5, 0.9]) == merged.quantiles([0.1, 0.5, 0.9])
    # deterministic coin stream: same inserts -> bit-identical sketch
    again = KLL(k=200)
    for chunk in np.array_split(v, 23):
        again.update_many(chunk)
    assert again.serialize() == streamed.serialize()


def test_quantiles_kll_pipeline_within_bound(ray_session):
    """Distributed KLL quantiles land within the sketch's rank-error bound
    of the true rank element, per event_type."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.corpus_stats import quantiles_kll

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    out = quantiles_kll(sf).to_pandas().set_index("event_type")
    assert len(out) == df["event_type"].nunique()
    for et, g in df.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        for col, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            est = out.loc[et, col]
            rank = np.searchsorted(v, est) / v.size
            assert abs(rank - q) <= 3.0 / 200 + 1.0 / v.size, (et, col)


def test_quantile_cont_sparse_matches_numpy_and_duckdb():
    """Interpolated quantiles over the sparse histogram == numpy 'linear'
    == DuckDB quantile_cont, including single-element and heavy-tie data."""
    import duckdb

    rng = np.random.default_rng(23)
    from meilisearch_thai_ray.stages.sketches import quantile_cont_sparse

    for data in [rng.integers(0, 50, size=997),
                 np.array([7]), np.array([3, 3, 3, 3]),
                 rng.integers(0, 3, size=100)]:
        uniq, cnt = np.unique(data, return_counts=True)
        qs = [0.5, 0.9, 0.99, 0.0, 1.0]
        ours = quantile_cont_sparse(uniq, cnt.astype(np.int64), qs)
        nump = [float(np.quantile(data, q, method="linear")) for q in qs]
        assert np.allclose(ours, nump), (ours, nump)
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?::BIGINT[]) AS v",
                    [data.tolist()])
        duck = [con.execute(
            f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
            for q in qs]
        assert np.allclose(ours, duck), (ours, duck)


def test_kmv_estimates_and_merge_identity():
    """KMV distinct estimate within 5/sqrt(k) of truth; merge of split
    streams == one-shot sketch (k-smallest-of-union is order-insensitive);
    below-k cardinalities are exact; intersection estimate within 10% at
    J=1/3 with k=4096."""
    import numpy as np

    from meilisearch_thai_ray.stages.sketches import KMV

    k = 4096
    a = KMV(k).update_ints(np.arange(0, 10000))
    assert abs(a.estimate() - 10000) / 10000 < 5 / np.sqrt(k)

    s1 = KMV(k).update_ints(np.arange(0, 6000))
    s2 = KMV(k).update_ints(np.arange(4000, 10000))  # overlapping halves
    merged = s1.merge(s2)
    assert np.array_equal(merged.values, a.values)

    small = KMV(k).update_ints(np.arange(137))
    assert small.estimate() == 137.0

    b = KMV(k).update_ints(np.arange(5000, 15000))
    est = KMV.intersection(a, b)
    assert abs(est - 5000) / 5000 < 0.10

    far = KMV(k).update_ints(np.arange(10 ** 6, 10 ** 6 + 10000))
    assert KMV.intersection(a, far) < 0.02 * 10000

    rt = KMV.deserialize(a.serialize(), k)
    assert np.array_equal(rt.values, a.values)


def test_kmv_overlap_pipeline_within_bound_of_exact(ray_session):
    """Pipeline estimates vs DuckDB's exact pairwise distinct-user
    intersections at sf0.001: every pair within max(12%, a floor of 8
    users) — the documented k=4096 operating band."""
    import duckdb

    from meilisearch_thai_ray.pipelines.corpus_stats import kmv_user_overlap

    out = kmv_user_overlap("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    exact = {}
    for _, r in out.iterrows():
        n = con.execute(
            "SELECT count(*) FROM "
            "(SELECT DISTINCT user_id FROM events WHERE event_type = ? "
            " INTERSECT "
            " SELECT DISTINCT user_id FROM events WHERE event_type = ?)",
            [r["type_a"], r["type_b"]]).fetchone()[0]
        exact[(r["type_a"], r["type_b"])] = n
    assert len(out) == 10  # C(5,2) pairs
    for _, r in out.iterrows():
        truth = exact[(r["type_a"], r["type_b"])]
        assert abs(r["approx_shared_users"] - truth) <= max(8, 0.12 * truth)
