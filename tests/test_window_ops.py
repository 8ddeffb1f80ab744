"""Window / rank / vector-aggregate operators (pipelines/window_ops.py).

The driver-gate SQL parity at sf0.01 covers the happy path; these tests
force the paths small data can miss: user runs spanning MULTIPLE sorted
blocks (the carry chain), non-divisible NTILE remainders, and partial
merging across batch boundaries.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------- pure kernels


def test_run_scan_per_run_prefix_sums():
    from meilisearch_thai_ray.pipelines.window_ops import _run_scan

    users = np.array([1, 1, 1, 2, 3, 3], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 10.0, 5.0, 7.0])
    running, starts, totals = _run_scan(users, vals)
    assert np.allclose(running, [1.0, 3.0, 6.0, 10.0, 5.0, 12.0])
    assert starts.tolist() == [0, 3, 4]
    assert np.allclose(totals, [6.0, 10.0, 12.0])


@pytest.mark.parametrize("n,tiles", [(500, 4), (10, 3), (7, 4), (3, 5),
                                     (1, 4), (100, 7)])
def test_ntile_bucket_matches_duckdb(n, tiles):
    import duckdb

    from meilisearch_thai_ray.pipelines.window_ops import ntile_bucket

    ours = ntile_bucket(np.arange(n, dtype=np.int64), n, tiles)
    con = duckdb.connect()
    theirs = con.execute(
        f"SELECT NTILE({tiles}) OVER (ORDER BY i) FROM range({n}) t(i)"
    ).fetchnumpy()
    key = list(theirs.keys())[0]
    assert ours.tolist() == theirs[key].tolist()


# ------------------------------------------------- distributed pipelines


def _write_events(tmp_path, users, n_files=6, rows_per_file=40, seed=3):
    """Events parquet split over n_files so the sort yields multiple
    blocks; user ids are drawn so every user spans many files (forcing
    cross-block carry chains, including a user covering >= 3 blocks)."""
    rng = np.random.default_rng(seed)
    d = os.path.join(tmp_path, "eventsdir")
    os.makedirs(d, exist_ok=True)
    eid = 0
    frames = []
    for f in range(n_files):
        n = rows_per_file
        u = rng.choice(users, size=n)
        ts = rng.integers(1_700_000_000_000_000, 1_700_100_000_000_000,
                          size=n)
        val = np.round(rng.uniform(-5, 50, size=n), 2)
        t = pa.table({
            "event_id": pa.array(np.arange(eid, eid + n), pa.int64()),
            "user_id": pa.array(u.astype(np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_type": pa.array(["e"] * n, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
        frames.append(t)
        eid += n
    pq.write_table(pa.concat_tables(frames),
                   os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_running_total_cross_block_carry(ray_session, tmp_path):
    """With only 2 distinct users over 240 rows in 6 input files, every
    sorted block boundary cuts through a user run — the broadcast carry
    path does real work on every block after the first."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.window_ops import running_total

    sf = _write_events(tmp_path, users=np.array([7, 9]))
    out = running_total(sf).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = pq.read_table(os.path.join(sf, "events.parquet")).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["running_value"] = df.groupby("user_id")["value"].cumsum().round(6)
    exp = df[["user_id", "event_id", "running_value"]] \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["user_id", "event_id", "running_value"]], exp)


def test_running_total_many_users(ray_session, tmp_path):
    import pandas as pd

    from meilisearch_thai_ray.pipelines.window_ops import running_total

    sf = _write_events(tmp_path, users=np.arange(1, 30), seed=11)
    out = running_total(sf).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = pq.read_table(os.path.join(sf, "events.parquet")).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["running_value"] = df.groupby("user_id")["value"].cumsum().round(6)
    exp = df[["user_id", "event_id", "running_value"]] \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["user_id", "event_id", "running_value"]], exp)


def test_event_gaps_cross_block_lag(ray_session, tmp_path):
    """Two users over 6 files: most sorted-block first rows have their
    LAG predecessor in the previous block."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.window_ops import event_gaps

    sf = _write_events(tmp_path, users=np.array([7, 9]), seed=21)
    out = event_gaps(sf).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = pq.read_table(os.path.join(sf, "events.parquet")).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    tsus = df["ts"].astype("int64")
    gap = tsus - tsus.shift(1)
    gap[df["user_id"] != df["user_id"].shift(1)] = -1
    df["gap_us"] = gap.astype("int64")
    exp = df[["user_id", "event_id", "gap_us"]].sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["user_id", "event_id", "gap_us"]],
                                  exp)


def test_ntile_pipeline_non_divisible(ray_session, tmp_path):
    """503 docs / 4 tiles: remainder 3 — the first three buckets get 126
    rows, the last 125, exactly like SQL NTILE."""
    from meilisearch_thai_ray.pipelines.window_ops import ntile_doc_buckets

    rng = np.random.default_rng(5)
    n = 503
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array(rng.integers(10, 500, size=n), pa.int64()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = ntile_doc_buckets(str(tmp_path)).to_pandas()
    assert out["quartile"].tolist() == [1, 2, 3, 4]
    assert out["n_docs"].tolist() == [126, 126, 126, 125]
    # buckets partition the sorted order: max of tile k <= min of tile k+1
    assert (out["max_chars"].to_numpy()[:-1]
            <= out["min_chars"].to_numpy()[1:]).all()


def test_embed_centroids_partial_merge(ray_session, tmp_path):
    """Centroids from partials merged across batches == numpy per-label
    means of the full matrix."""
    from meilisearch_thai_ray.pipelines.window_ops import embed_centroids

    rng = np.random.default_rng(9)
    n, dim = 300, 8
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row for row in mat.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    out = embed_centroids(str(tmp_path)).to_pandas()
    assert len(out) == 4 * dim
    for lab in range(4):
        exp = np.round(mat[labels == lab].astype(np.float64).mean(axis=0), 6)
        got = out[out["label"] == lab].sort_values("dim")["mean_val"] \
            .to_numpy()
        assert np.allclose(got, exp, atol=1e-9)


def test_curate_exact_dedup_cross_block_runs(ray_session, tmp_path):
    """Exact dedup keeps min doc_id per identical text even when a hash
    run spans sorted-block boundaries: 3 distinct texts x 40 copies each
    over 8 input files means every block boundary cuts a hash run."""
    from meilisearch_thai_ray.pipelines.curate import curated_docs

    texts = [f"unique words {' '.join(f'w{i}{j}' for j in range(30))}"
             for i in range(3)]
    d = os.path.join(tmp_path, "docs")
    rows = []
    for copy in range(40):
        for i, t in enumerate(texts):
            rows.append((copy * 3 + i, t))
    for f in range(8):
        chunk = rows[f * 15:(f + 1) * 15]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
            "text": pa.array([r[1] for r in chunk], pa.string()),
            "lang": pa.array(["en"] * len(chunk), pa.string()),
            "source": pa.array(["s"] * len(chunk), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in chunk], pa.int64()),
        })
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
    # documents.parquet as a directory works via read_parquet_clean
    import shutil

    shutil.move(d, os.path.join(tmp_path, "documents.parquet"))
    out = curated_docs(str(tmp_path)).to_pandas()
    # near-dup stage then drops 2 of the 3 distinct texts? no — texts are
    # fully distinct (Jaccard 0 between them): exactly the 3 min ids stay
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2]


def test_grouped_corr_matches_numpy(ray_session, tmp_path):
    from meilisearch_thai_ray.pipelines.window_ops import grouped_corr

    rng = np.random.default_rng(4)
    n = 5000
    flags = rng.choice(["A", "N", "R"], size=n)
    x = rng.uniform(1, 50, size=n)
    y = 30_000.0 + 500.0 * x + rng.normal(0, 5_000, size=n)  # correlated
    t = pa.table({
        "l_orderkey": pa.array(np.arange(n), pa.int64()),
        "l_returnflag": pa.array(flags, pa.string()),
        "l_quantity": pa.array(x, pa.float64()),
        "l_extendedprice": pa.array(y, pa.float64()),
    })
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    out = grouped_corr(str(tmp_path)).to_pandas()
    for flag in ["A", "N", "R"]:
        m = flags == flag
        exp = np.corrcoef(x[m], y[m])[0, 1]
        got = float(
            out[out["l_returnflag"] == flag]["corr_qty_price"].iloc[0])
        assert abs(got - exp) < 1e-6
        assert got > 0.5  # the planted correlation is strong


def test_anti_id_filter_broadcast_and_sidefile_paths(ray_session):
    """Both physical forms of the payload-in-place anti filter drop the
    same rows: broadcast sorted-array probe and the side-parquet
    range-read path (forced with max_broadcast=0)."""
    import ray.data

    from meilisearch_thai_ray.stages.runs import anti_id_filter

    tabs = [pa.table({
        "doc_id": pa.array(list(range(b * 50, b * 50 + 50)), pa.int64()),
        "text": pa.array([f"t{b}-{i}" for i in range(50)], pa.string()),
    }) for b in range(4)]
    ds = ray.data.from_arrow(tabs)
    loser_ids = [3, 7, 49, 50, 120, 199]  # spans blocks, hits both edges
    losers = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(loser_ids, pa.int64())}))
    expect = sorted(set(range(200)) - set(loser_ids))

    broad = anti_id_filter(ds, losers).to_pandas()
    assert sorted(broad["doc_id"].tolist()) == expect

    side = anti_id_filter(ds, losers, max_broadcast=0).to_pandas()
    assert sorted(side["doc_id"].tolist()) == expect
    # payload survived intact alongside the ids
    assert set(broad.columns) == {"doc_id", "text"}

    # empty loser set is the identity
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64())}))
    assert anti_id_filter(ds, empty).count() == 200


def test_sessionize_cross_block_numbering_and_merge(ray_session, tmp_path):
    """Two users over 6 files: session fragments span sorted blocks and
    the per-user session NUMBERING must chain across every boundary.
    Expected result computed per user with plain numpy."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.window_ops import (
        SESSION_GAP_US, sessionize)

    sf = _write_events(tmp_path, users=np.array([7, 9]), seed=33)
    out = sessionize(sf).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    df = pq.read_table(os.path.join(sf, "events.parquet")).to_pandas()
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        val = g["value"].to_numpy()
        new = np.ones(ts.size, dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], ts.size)
        for k, (s, e) in enumerate(zip(starts, ends), start=1):
            rows.append((uid, k, ts[s], ts[e - 1], e - s,
                         round(float(val[s:e].sum()), 6)))
    exp = pd.DataFrame(rows, columns=[
        "user_id", "session_id", "start_us", "end_us", "n_events",
        "total_value"]).sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)
    assert len(out) == len(exp)
    assert out["session_id"].tolist() == exp["session_id"].tolist()
    assert out["n_events"].tolist() == exp["n_events"].tolist()
    assert out["session_start"].astype("int64").tolist() == \
        exp["start_us"].tolist()
    assert out["session_end"].astype("int64").tolist() == \
        exp["end_us"].tolist()
    assert np.allclose(out["total_value"], exp["total_value"], atol=1e-6)
    # sessions really do span blocks: more sessions than blocks per user
    assert (out.groupby("user_id")["session_id"].max() > 6).all()


def test_asof_join_cross_block_click_carry(ray_session, tmp_path):
    """Two users' purchase/click streams over 6 files: many purchases'
    latest click lives in an EARLIER sorted block — the carry chain must
    hand it over (including through click-free blocks of the same user)."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.simple_text import asof_join

    rng = np.random.default_rng(13)
    d = os.path.join(tmp_path, "eventsdir")
    os.makedirs(d, exist_ok=True)
    eid = 0
    for f in range(6):
        n = 40
        u = rng.choice([7, 9], size=n)
        ts = rng.integers(1_700_000_000_000_000, 1_700_100_000_000_000,
                          size=n)
        # sparse clicks so several blocks of a user have none
        et = np.where(rng.uniform(size=n) < 0.15, "click", "purchase")
        t = pa.table({
            "event_id": pa.array(np.arange(eid, eid + n), pa.int64()),
            "user_id": pa.array(u.astype(np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.round(rng.uniform(0, 9, n), 2),
                              pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
        eid += n
    import shutil

    shutil.move(d, os.path.join(tmp_path, "events.parquet"))
    out = asof_join(str(tmp_path)).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = pq.read_table(os.path.join(tmp_path, "events.parquet")).to_pandas()
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        clicks = g[g["event_type"] == "click"]
        for _, p in g[g["event_type"] == "purchase"].iterrows():
            c = clicks[clicks["ts"] <= p["ts"]]
            if len(c):
                c = c.iloc[-1]
                rows.append((p["event_id"], uid, p["ts"], c["event_id"],
                             c["ts"], c["value"]))
    exp = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts", "click_event_id", "click_ts",
        "click_value"]).sort_values("event_id").reset_index(drop=True)
    exp = exp.astype({"event_id": "int64", "user_id": "int64",
                      "click_event_id": "int64",
                      "ts": "datetime64[us]", "click_ts": "datetime64[us]"})
    pd.testing.assert_frame_equal(out, exp)


def test_range_join_cross_block_halo(ray_session, tmp_path):
    """Dense two-user error/click stream over 6 files with a ts span that
    makes most 5-minute bands cross sorted-block boundaries — the halo
    carry must supply earlier blocks' clicks."""
    import pandas as pd

    from meilisearch_thai_ray.pipelines.simple_text import (
        _RANGE_WIN_US, range_join)

    rng = np.random.default_rng(17)
    d = os.path.join(tmp_path, "eventsdir")
    os.makedirs(d, exist_ok=True)
    base = 1_700_000_000_000_000
    eid = 0
    for f in range(6):
        n = 40
        u = rng.choice([7, 9], size=n)
        # whole stream inside ~40 minutes: bands overlap heavily
        ts = base + rng.integers(0, 40 * 60 * 1_000_000, size=n)
        et = np.where(rng.uniform(size=n) < 0.5, "click", "error")
        t = pa.table({
            "event_id": pa.array(np.arange(eid, eid + n), pa.int64()),
            "user_id": pa.array(u.astype(np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.zeros(n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
        eid += n
    import shutil

    shutil.move(d, os.path.join(tmp_path, "events.parquet"))
    out = range_join(str(tmp_path)).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    df = pq.read_table(os.path.join(tmp_path, "events.parquet")).to_pandas()
    rows = []
    for _, e in df[df["event_type"] == "error"].iterrows():
        ets = int(pd.Timestamp(e["ts"]).value // 1000)  # ns -> us
        c = df[(df["event_type"] == "click")
               & (df["user_id"] == e["user_id"])]
        cts = c["ts"].apply(lambda x: int(pd.Timestamp(x).value // 1000))
        nn = int(((cts >= ets - _RANGE_WIN_US) & (cts <= ets)).sum())
        rows.append((int(e["event_id"]), int(e["user_id"]), nn))
    exp = pd.DataFrame(rows, columns=["event_id", "user_id", "n_clicks"]) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"n_clicks": "int64"}), exp)
    assert (exp["n_clicks"] > 0).mean() > 0.5  # bands really are dense


def test_embed_pca_matches_numpy(ray_session, tmp_path):
    """Distributed PCA == numpy PCA on the materialized matrix: same
    components (up to the deterministic sign rule), projections match,
    explained variance ordered descending."""
    from meilisearch_thai_ray.pipelines.window_ops import embed_pca

    rng = np.random.default_rng(31)
    n, d, k = 400, 8, 3
    # anisotropic data so components are well separated
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    mat = (rng.normal(size=(n, d)) * scales).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }), os.path.join(tmp_path, "embeddings.parquet"))
    out = embed_pca(str(tmp_path), k=k).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    got = np.array(out["pc"].tolist())

    x = mat.astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T
    flip = np.sign(comp[np.arange(k), np.argmax(np.abs(comp), axis=1)])
    comp = comp * flip[:, None]
    exp = (x - mean) @ comp.T
    assert np.allclose(got, np.round(exp, 6), atol=2e-6)
    # top components capture the planted anisotropy: variance descending
    var = got.var(axis=0)
    assert var[0] > var[1] > var[2]


def test_percent_rank_tie_runs_across_blocks(ray_session, tmp_path):
    """Heavy planted ties (few distinct values, thousands of rows) under
    2 KiB sort blocks: most tie runs straddle blocks, so ranks flow
    through the driver's tie-carry walk — every row must match DuckDB's
    percent_rank exactly (MIN rank of the tie run)."""
    import duckdb
    import pandas as pd

    import ray.data
    from meilisearch_thai_ray.pipelines.window_ops import (
        SQL, percent_rank_events)

    rng = np.random.default_rng(3)
    n = 4000
    types = rng.choice(["alpha", "beta", "gamma"], n)
    vals = rng.choice([1.0, 2.0, 2.5, 7.0], n)  # 4 values -> massive ties
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * n,
                       pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n),
    }), str(d / "events.parquet"))

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 2 * 1024
    try:
        got = percent_rank_events(str(d)).to_pandas()
    finally:
        ctx.target_max_block_size = saved
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    exp = con.execute(SQL["a25_percent_rank"]).fetchdf()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["event_id", "event_type", "pr"]],
                                  exp[["event_id", "event_type", "pr"]],
                                  check_dtype=False)
