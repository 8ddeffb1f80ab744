"""Training-data-prep operators: decontamination, LM scoring, global
shuffle, BPE training."""

import collections
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_planted(ray_session, tmp_path):
    """A doc embedding the eval snippet of ANOTHER doc is flagged with the
    right distinct-snippet count; clean docs are absent."""
    from meilisearch_thai_ray.pipelines.training_data import (
        DECON_LEN, DECON_MIN_CHARS, DECON_OFF, decontaminate, eval_snippets)

    donor = "x" * DECON_OFF + "SNIPPET-" * (DECON_LEN // 8) + "y" * 200
    assert len(donor) >= DECON_MIN_CHARS
    snip = donor[DECON_OFF:DECON_OFF + DECON_LEN]
    texts = [donor]  # doc_id 0 -> donor (0 % DECON_MOD == 0)
    texts += [f"clean document number {i} " * 10 for i in range(1, 4)]
    texts.append("prefix " + snip + " suffix")  # doc_id 4: contaminated
    d = _write_docs(tmp_path, texts)

    assert eval_snippets(d) == [snip]
    out = decontaminate(d).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 4]
    assert out["n_snips"].tolist() == [1, 1]


def test_lm_score_matches_naive(ray_session):
    """Distributed bounded-vocab LM score == naive in-memory computation."""
    from meilisearch_thai_ray.pipelines.corpus_stats import _WORD_RE
    from meilisearch_thai_ray.pipelines.training_data import (
        LM_MIN_COUNT, lm_score)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    rx = re.compile(_WORD_RE)
    counts = collections.Counter()
    toks = {}
    for r in docs.itertuples():
        toks[int(r.doc_id)] = rx.findall(r.text)
        counts.update(toks[int(r.doc_id)])
    n = sum(counts.values())
    kept = {w: c for w, c in counts.items() if c >= LM_MIN_COUNT}
    oov = n - sum(kept.values())
    expect = {}
    for d, ws in toks.items():
        if not ws:
            continue
        lp = [np.log(kept.get(w, oov) / n) for w in ws]
        expect[d] = (len(ws), round(float(np.mean(lp)), 6))

    out = lm_score(SF).to_pandas()
    got = {int(r.doc_id): (int(r.n_tokens), float(r.avg_logprob))
           for r in out.itertuples()}
    assert got.keys() == expect.keys()
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert got[d][1] == pytest.approx(expect[d][1], abs=2e-6)


def test_global_shuffle_is_permutation_and_deterministic(ray_session):
    from meilisearch_thai_ray.pipelines.training_data import global_shuffle

    a = global_shuffle(SF).to_pandas().sort_values("doc_id")
    b = global_shuffle(SF).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id"]))
    assert len(a) == n_docs
    for shard, grp in a.groupby("shard"):
        assert sorted(grp["pos"].tolist()) == list(range(len(grp)))


def test_bpe_known_merges(ray_session, tmp_path):
    """Handcrafted corpus with an unambiguous first merge sequence."""
    from meilisearch_thai_ray.pipelines.training_data import bpe_merges

    d = _write_docs(tmp_path, ["aaab aaab aaab ccd", "aaab ccd zz"])
    out = bpe_merges(d, n_merges=3).to_pandas()
    # 'aa' appears 2x per 'aaab' (overlap counts once per adjacent pair:
    # a-a, a-a, a-b -> pair ('a','a') count 2 per word occurrence) = 8
    assert out.iloc[0][["left", "right"]].tolist() == ["a", "a"]
    assert out.iloc[0]["cnt"] == 8
    # ('aa','a') and ('a','b') tie at 4 -> lexicographic tie-break picks
    # ('a','b'); then [aa, ab] leaves ('aa','ab') at 4
    assert out.iloc[1][["left", "right"]].tolist() == ["a", "b"]
    assert out.iloc[1]["cnt"] == 4
    assert out.iloc[2][["left", "right"]].tolist() == ["aa", "ab"]
    assert out.iloc[2]["cnt"] == 4


def test_bpe_distributed_counts_match_local(ray_session):
    """The distributed word-count pass feeding BPE == an in-memory Counter
    (so the whole trainer is reference-parity by composition)."""
    from meilisearch_thai_ray.pipelines.corpus_stats import _WORD_RE
    from meilisearch_thai_ray.pipelines.training_data import (
        corpus_word_counts)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    rx = re.compile(_WORD_RE)
    counts = collections.Counter()
    for t in docs["text"]:
        counts.update(rx.findall(t))
    assert corpus_word_counts(SF) == dict(counts)


def _write_docs_full(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_budget_select_boundary_ties(ray_session, tmp_path):
    """Docs with EQUAL n_chars straddling the budget boundary: selection
    must match the naive (n_chars DESC, doc_id ASC) cumulative rule."""
    from meilisearch_thai_ray.pipelines.training_data import (
        BUDGET_DIV, budget_select)

    # five 100-char docs + five 10-char docs; budget = 550 // 4 = 137
    # -> one 100-char doc fits fully, the second would overflow
    rows = [(i, "x" * 100, "en", "a") for i in range(5)]
    rows += [(10 + i, "y" * 10, "en", "a") for i in range(5)]
    d = _write_docs_full(tmp_path, rows)

    df = pd.read_parquet(f"{d}/documents.parquet")
    df = df.sort_values(["n_chars", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    budget = df["n_chars"].sum() // BUDGET_DIV
    expect = set(df[df["n_chars"].cumsum() <= budget]["doc_id"])

    got = set(budget_select(d).to_pandas()["doc_id"])
    assert got == expect == {0}


def test_budget_select_matches_naive_on_sf(ray_session):
    from meilisearch_thai_ray.pipelines.training_data import (
        BUDGET_DIV, budget_select)

    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    df = df.sort_values(["n_chars", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    budget = df["n_chars"].sum() // BUDGET_DIV
    expect = set(df[df["n_chars"].cumsum() <= budget]["doc_id"])
    got = set(budget_select(SF).to_pandas()["doc_id"])
    assert got == expect and len(got) > 0


def test_source_balance_skewed(ray_session, tmp_path):
    """900-vs-100 source skew: the big source is down-sampled to ~the small
    one; the small source keeps everything (rate == 1)."""
    import hashlib as hl

    from meilisearch_thai_ray.pipelines.training_data import source_balance

    rows = [(i, f"doc {i}", "en", "big") for i in range(900)]
    rows += [(900 + i, f"doc {900 + i}", "en", "small") for i in range(100)]
    d = _write_docs_full(tmp_path, rows)

    out = source_balance(d).to_pandas()
    kept = out.groupby("source").size()
    assert kept["small"] == 100
    # deterministic expectation from the same md5 rule
    exp_big = sum(
        1 for i in range(900)
        if int(hl.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        < 100 / 900)
    assert kept.get("big", 0) == exp_big
    assert 50 <= exp_big <= 200  # ~100 expected, loose sanity band


def test_export_training_corpus_resumable(ray_session, tmp_path):
    """Export writes one pos-ordered file per shard matching global_shuffle;
    a re-run skips finished shards; a deleted shard is rebuilt
    byte-identically."""
    import os

    from meilisearch_thai_ray.pipelines.training_data import (
        export_training_corpus, global_shuffle)

    out = str(tmp_path / "corpus")
    m1 = export_training_corpus(SF, out)
    order = global_shuffle(SF).to_pandas()
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id"]))
    assert m1["rows"] == n_docs
    assert not any(s["skipped"] for s in m1["shards"])

    # every shard file is pos-sorted and matches global_shuffle's placement
    for s in m1["shards"]:
        f = os.path.join(out, f"shard-{s['shard']:05d}.parquet")
        df = pd.read_parquet(f)
        assert df["pos"].tolist() == list(range(len(df)))
        exp = order[order["shard"] == s["shard"]].sort_values("pos")
        assert df["doc_id"].tolist() == exp["doc_id"].tolist()

    # resume: everything skipped
    m2 = export_training_corpus(SF, out)
    assert all(s["skipped"] for s in m2["shards"])

    # crash recovery: deleted shard rebuilt byte-identically
    victim = os.path.join(out, "shard-00003.parquet")
    before = open(victim, "rb").read()
    os.remove(victim)
    m3 = export_training_corpus(SF, out)
    assert sum(not s["skipped"] for s in m3["shards"]) == 1
    assert open(victim, "rb").read() == before


def test_cross_snapshot_dedup_planted(ray_session, tmp_path):
    """Genuinely distinct snapshots: only content present in BOTH maps new
    -> min old doc_id; unseen new docs are absent."""
    import ray.data

    from meilisearch_thai_ray.pipelines.dedup_pipelines import (
        cross_snapshot_dup_ds)

    old = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 7], pa.int64()),
        "text": pa.array(["shared A", "shared A", "old only", "shared B"],
                         pa.string()),
    }))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101, 102], pa.int64()),
        "text": pa.array(["shared A", "brand new", "shared B"], pa.string()),
    }))
    out = cross_snapshot_dup_ds(old, new).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [100, 102]
    assert out["dup_of"].tolist() == [1, 7]  # min old id for "shared A"


def test_cross_snapshot_dedup_runs_span_blocks(ray_session):
    """A hash run spanning MANY sorted blocks: 2 distinct texts x 60 copies
    per side over 12 input blocks — the forward prefix-min carry must hand
    every new copy the global min old id even when the old minimum lives
    blocks earlier."""
    import ray.data

    from meilisearch_thai_ray.pipelines.dedup_pipelines import (
        cross_snapshot_dup_ds)

    texts = ["alpha content " * 3, "beta content " * 3]
    old_tabs, new_tabs = [], []
    for blk in range(6):
        ids = [blk * 20 + i for i in range(10)]
        old_tabs.append(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i % 2] for i in ids], pa.string()),
        }))
        nids = [1000 + blk * 20 + i for i in range(10)]
        new_tabs.append(pa.table({
            "doc_id": pa.array(nids, pa.int64()),
            "text": pa.array([texts[i % 2] for i in nids], pa.string()),
        }))
    old = ray.data.from_arrow(old_tabs)
    new = ray.data.from_arrow(new_tabs)
    out = cross_snapshot_dup_ds(old, new).to_pandas()
    assert len(out) == 60  # every new doc is a dup of an old one
    # min old id per text: text[0] on even ids -> 0; text[1] on odd -> 1
    for _, row in out.iterrows():
        assert row["dup_of"] == int(row["doc_id"]) % 2


def test_dup_grams_planted(ray_session, tmp_path):
    """A 50-gram shared by two docs (and a self-repeating doc) is counted
    exactly; unique docs are absent."""
    from meilisearch_thai_ray.pipelines.dedup_pipelines import dup_grams

    shared = "S" * 50
    texts = [
        "A" * 49,                    # too short: no grams
        "prefix " + shared + " x",   # doc 1: shares `shared` with doc 2
        shared,                      # doc 2: exactly one gram
        "R" * 51,                    # doc 3: self-repeating ('R'*50 twice)
        # doc 4: long and APERIODIC (a repeated phrase would self-dup)
        " ".join(f"word{i}" for i in range(40)),
    ]
    d = _write_docs(tmp_path, texts)
    out = dup_grams(d).to_pandas().set_index("doc_id")["n_dup_grams"]
    assert out.get(1) == 1 and out.get(2) == 1
    assert out.get(3) == 2  # both offsets of the same gram count
    assert 0 not in out.index and 4 not in out.index


def test_line_dedup_removes_cross_doc_boilerplate(ray_session, tmp_path):
    """A line shared by >= min_docs docs is stripped from every doc (order
    preserved); rarer shared lines and unique lines survive; untouched docs
    reconstruct byte-identically."""
    from meilisearch_thai_ray.pipelines.training_data import line_dedup

    boiler = "SHARE THIS ARTICLE"
    rare = "rare shared line"
    texts = [f"body {i}\n{boiler}\nmore {i}" for i in range(5)]
    texts += [f"solo {i}\n{rare}" for i in range(2)]       # rare: 2 < 3
    texts += ["untouched\n\nwith empty line"]
    sf = _write_docs(tmp_path, texts)
    out = (line_dedup(sf, min_docs=3).to_pandas()
           .set_index("doc_id").sort_index())
    for i in range(5):
        assert out.loc[i, "clean_text"] == f"body {i}\nmore {i}"
        assert out.loc[i, "n_lines"] == 3
        assert out.loc[i, "n_removed"] == 1
    for i in (5, 6):
        assert out.loc[i, "clean_text"] == texts[i]
        assert out.loc[i, "n_removed"] == 0
    assert out.loc[7, "clean_text"] == texts[7]
    assert out.loc[7, "n_lines"] == 3  # empty line counted, never removed


def test_line_dedup_oracle_parity_planted(ray_session):
    """Planted-boilerplate pipeline == DuckDB oracle, cell for cell."""
    import duckdb

    from meilisearch_thai_ray.pipelines.training_data import SQL, line_dedup

    got = (line_dedup(SF, plant=True).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    exp = (con.sql(SQL["d12_line_dedup"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])
    assert (got["n_removed"] > 0).any()  # the plant actually fired


def test_export_sorted_manifest_pruning_and_reuse(ray_session, tmp_path):
    """Global-order export: manifest ranges partition the key space in
    file order; range reads open ONLY overlapping files; a complete
    manifest makes the re-run a no-op."""
    import json
    import os

    import ray.data

    from meilisearch_thai_ray.pipelines.training_data import (
        export_sorted, read_sorted_range)

    rng = np.random.default_rng(29)
    tabs = [pa.table({
        "doc_id": pa.array(np.arange(b * 100, b * 100 + 100), pa.int64()),
        "n_chars": pa.array(rng.integers(0, 10_000, 100), pa.int64()),
    }) for b in range(6)]
    ds = ray.data.from_arrow(tabs)
    out = str(tmp_path / "sorted")
    man = export_sorted(ds, out, key="n_chars",
                        order_cols=["n_chars", "doc_id"])
    assert man["rows"] == 600
    assert len(man["files"]) > 1  # multiple blocks -> pruning is real
    # files cover the key space in nondecreasing, non-overlapping order
    for a, b in zip(man["files"], man["files"][1:]):
        assert a["min"] <= a["max"] <= b["min"] <= b["max"]

    lo, hi = 2000, 3000
    tab, n_read = read_sorted_range(out, lo, hi)
    vals = tab["n_chars"].to_numpy(zero_copy_only=False)
    assert ((vals >= lo) & (vals <= hi)).all()
    full = pa.concat_tables(tabs)
    fv = full["n_chars"].to_numpy(zero_copy_only=False)
    assert len(tab) == int(((fv >= lo) & (fv <= hi)).sum())
    overlap = [p for p in man["files"] if p["min"] <= hi and p["max"] >= lo]
    assert n_read == len(overlap) < len(man["files"])  # pruning happened

    # complete manifest -> re-run returns it untouched (no rebuild)
    mtimes = {p["file"]: os.path.getmtime(os.path.join(out, p["file"]))
              for p in man["files"]}
    man2 = export_sorted(ds, out, key="n_chars",
                         order_cols=["n_chars", "doc_id"])
    assert man2 == man
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m
    # a partial export (manifest missing) is rebuilt from scratch
    os.remove(os.path.join(out, "manifest.json"))
    man3 = export_sorted(ds, out, key="n_chars",
                         order_cols=["n_chars", "doc_id"])
    assert man3["rows"] == 600


def test_minhash_index_absorb_and_prune(ray_session, tmp_path):
    """Incremental index lifecycle: absorb an accepted crawl (next crawl
    dedups against corpus+accepted with pair-set identity to a
    from-scratch sketch), then prune tombstoned docs (their band rows
    stop generating candidates; untouched files are not rewritten)."""
    import os

    import ray.data

    from meilisearch_thai_ray.pipelines.dedup_pipelines import (
        _band_candidates, absorb_minhash_index, prune_minhash_index,
        write_minhash_index)
    from meilisearch_thai_ray.stages.dedup import MinHasher

    def docs_tab(ids, texts):
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    base_texts = [f"corpus doc {i} " + "shared words " * 8 + f"tail{i}"
                  for i in range(40)]
    corpus = docs_tab(list(range(40)), base_texts)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(ray.data.from_arrow(corpus), idx)

    # crawl: 10 accepted new docs (ids >= 1000), 5 rejected (not absorbed)
    new_ids = [1000 + i for i in range(15)]
    new_texts = [base_texts[i % 40] + " edited" if i < 5
                 else f"fresh page {i} " + "novel content " * 6
                 for i in range(15)]
    crawl = docs_tab(new_ids, new_texts)
    accepted = np.array(new_ids[:10], dtype=np.int64)
    absorb_minhash_index(idx, ray.data.from_arrow(crawl),
                         accept_ids=accepted)

    got = _band_candidates(ray.data.read_parquet(idx)).to_pandas()
    combined = pa.concat_tables([corpus, crawl.slice(0, 10)])
    exp = _band_candidates(
        ray.data.from_arrow(combined).map_batches(
            MinHasher, batch_format="pyarrow", batch_size=1024,
            concurrency=(1, 2))).to_pandas()
    assert set(zip(got["a"], got["b"])) == set(zip(exp["a"], exp["b"]))
    # rejected docs never entered the index
    assert not ((got["a"] >= 1010) | (got["b"] >= 1010)).any()

    # prune two corpus docs: their rows vanish, candidates stop
    files_before = {f: os.path.getmtime(os.path.join(idx, f))
                    for f in os.listdir(idx) if f.endswith(".parquet")}
    removed = prune_minhash_index(idx, [0, 1])
    assert removed > 0
    left = ray.data.read_parquet(idx).to_pandas()
    assert not left["doc_id"].isin([0, 1]).any()
    after = _band_candidates(ray.data.read_parquet(idx)).to_pandas()
    assert not ((after["a"].isin([0, 1])) | (after["b"].isin([0, 1]))).any()
    # files without dropped ids were left byte-untouched
    untouched = [f for f in files_before
                 if os.path.getmtime(os.path.join(idx, f))
                 == files_before[f]]
    assert untouched  # at least the absorbed-crawl files


def test_zorder_export_prunes_both_dimensions(ray_session, tmp_path):
    """Z-order layout under tiny blocks: (a) a two-sided rectangle read
    returns exactly DuckDB's rows while opening a strict subset of files;
    (b) on a VALUE-only band the z-order layout prunes files while the
    user-sorted single-key layout must open every file (value is its
    trailing, unclustered column); (c) re-export is a manifest no-op."""
    import duckdb
    import ray.data

    from meilisearch_thai_ray.pipelines.training_data import (
        export_sorted, export_zorder, read_sorted_range, read_zorder_box)
    from meilisearch_thai_ray.sources.documents import read_parquet_clean

    src = "/root/testdata/sf0.001/events.parquet"
    ds = read_parquet_clean(src, columns=["event_id", "user_id", "value"])
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    # n_files pins the layout deterministically (the sort's own block
    # count varies with session state)
    man = export_zorder(ds, zdir, ["user_id", "value"], n_files=10)
    export_sorted(
        read_parquet_clean(src, columns=["event_id", "user_id",
                                         "value"]).repartition(10),
        sdir, "user_id")
    n_files = len(man["files"])
    assert n_files >= 6, "fixture must span multiple files"
    assert man["rows"] == 1000

    box = {"user_id": (3, 9), "value": (20.0, 60.0)}
    tab, nz = read_zorder_box(zdir, box)
    exp = duckdb.sql(
        f"SELECT event_id, user_id, value FROM read_parquet('{src}') "
        f"WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 20 AND 60 "
        f"ORDER BY event_id").fetchall()
    got = sorted(zip(tab["event_id"].to_pylist(),
                     tab["user_id"].to_pylist(),
                     tab["value"].to_pylist()))
    assert got == [tuple(r) for r in exp]
    assert 0 < nz < n_files  # the rectangle pruned whole files

    # value-only band: z-order prunes, user-sorted layout cannot
    vband = {"value": (0.0, 30.0), "user_id": (0, 10 ** 9)}
    _, nz_v = read_zorder_box(zdir, vband)
    _, ns_v = read_sorted_range(sdir, 0, 10 ** 9)
    assert nz_v < n_files
    assert ns_v == len(
        [p for p in export_sorted(None, sdir, "user_id")["files"]])

    man2 = export_zorder(None, zdir, ["user_id", "value"])  # no-op resume
    assert man2 == man


def test_nb_quality_matches_naive(ray_session):
    """Distributed NB train+score == naive in-memory computation (same
    gopher labels, same bounded vocab + OOV pooling, same smoothing)."""
    import polars as pl

    from meilisearch_thai_ray.pipelines.corpus_stats import (
        _WORD_RE, gopher_with_verdict)
    from meilisearch_thai_ray.pipelines.training_data import (
        NB_MIN_COUNT, nb_quality)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    lab = dict(zip(
        docs["doc_id"],
        gopher_with_verdict(pl.from_pandas(docs))["passes_gopher"],
    ))
    rx = re.compile(_WORD_RE)
    cp, cf = collections.Counter(), collections.Counter()
    toks = {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        toks[d] = rx.findall(r.text)
        (cp if lab[d] else cf).update(toks[d])
    n_pass, n_fail = sum(cp.values()), sum(cf.values())
    vocab = {w for w in (cp | cf)
             if cp.get(w, 0) + cf.get(w, 0) >= NB_MIN_COUNT}
    v = len(vocab) + 1
    o_pass = n_pass - sum(cp[w] for w in vocab if w in cp)
    o_fail = n_fail - sum(cf[w] for w in vocab if w in cf)
    d_pass = sum(lab.values())
    d_fail = len(lab) - d_pass
    prior = np.log(d_pass + 1.0) - np.log(d_fail + 1.0)
    per_tok = np.log(n_fail + v) - np.log(n_pass + v)
    expect = {}
    for d, ws in toks.items():
        if not ws:
            continue
        s = sum(
            np.log((cp.get(w, 0) if w in vocab else o_pass) + 1.0)
            - np.log((cf.get(w, 0) if w in vocab else o_fail) + 1.0)
            for w in ws)
        expect[d] = (len(ws), round(float(s + len(ws) * per_tok + prior), 6))

    out = nb_quality(SF).to_pandas()
    got = {int(r.doc_id): (int(r.n_tokens), float(r.log_odds), bool(r.nb_pass))
           for r in out.itertuples()}
    assert got.keys() == expect.keys()
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert got[d][1] == pytest.approx(expect[d][1], abs=2e-6)
        assert got[d][2] == (got[d][1] > 0)


def test_nb_quality_learns_separable_labels(ray_session, tmp_path):
    """On a corpus whose gopher verdict correlates with vocabulary, the
    trained model reproduces the labels from token evidence alone."""
    from meilisearch_thai_ray.pipelines.corpus_stats import (
        gopher_with_verdict)
    from meilisearch_thai_ray.pipelines.training_data import nb_quality

    stops = "the and of to be that have with"          # 8 stop words
    good = [f"{stops} alpha beta gamma delta data value quality " * 5
            + f"signal{i % 3}" for i in range(12)]     # ~54 words, passes
    bad = [f"zz{i % 3} spamjunk noise blob" * 4 for i in range(12)]
    sf = _write_docs(tmp_path, good + bad)

    import polars as pl
    lab = gopher_with_verdict(
        pl.from_pandas(pd.read_parquet(f"{sf}/documents.parquet",
                                       columns=["doc_id", "text"]))
    )["passes_gopher"].to_list()
    assert sum(lab[:12]) == 12 and sum(lab[12:]) == 0  # planted split holds

    out = nb_quality(sf).to_pandas().sort_values("doc_id")
    assert list(out["nb_pass"]) == lab                 # perfect imitation
    # graded score: every good doc strictly above every bad doc
    assert out["log_odds"][:12].min() > out["log_odds"][12:].max()
