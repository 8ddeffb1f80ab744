"""Corpus-scale statistics pipelines (training-data-engine operators).

Every operator here is built on a MERGEABLE PARTIAL: each batch emits a
tiny summary (unique pairs, a sketch, a compressed histogram, a partial
top-N), partials move through at most one small shuffle, and the raw
corpus never converges anywhere. That is the only aggregation shape that
survives 100 TB.

Reference analog: the reference tracks corpus/processing statistics as
in-process metric singletons (src/meilisearch_integration/document_processor.py
ProcessingMetrics, src/tokenizer/query_processor.py cache stats); here the
same questions are answered by distributed aggregates over the corpus.

SQL-verified here (driver gate, DuckDB hash parity):
  a9_distinct_users    exact COUNT DISTINCT per group via per-batch dedup
  k6_heavy_hitters     EXACT heavy hitters via Misra-Gries pass + exact
                       recount pass (never shuffles the full vocabulary)
  a10_quantiles_exact  exact quantile_disc via compressed-histogram merge
  m8b_repetition       Gopher-style repetition/quality signals per doc
  m21_pii_scan         PII pattern counts + redacted-text digest per doc
  k7_stratified_sample deterministic fixed-size per-group hash sample
  j8_latest_event      distributed argmax (newest row per key — the
                       newest-capture-wins Common-Crawl ingestion shape)
  a11_bigram_pmi       collocations: combiner bigram counts + targeted
                       unigram recount; integer-threshold selection
Rows-only (approximate by design; error bound asserted in pytest):
  a9_hll_distinct      HyperLogLog distinct per group (fixed 16 KiB state)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sources.documents import read_parquet_clean
from ..functions.hashing import md5_hex_of_ints, md5_prefix_int_of_strings
from ..stages.sketches import KMV, HyperLogLog, mg_shrink
from ..stages.similarity_join import WS_REGEX

SQL: dict[str, str] = {}

_EVENT_COLS = ["event_type", "user_id"]


def _events(sf_dir: str, columns: list[str]):
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=columns)


def _docs(sf_dir: str, columns: list[str]):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


# ------------------------------------------------- exact distinct per group

def _unique_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (event_type, user_id) -> distinct pairs only.
    This is what shrinks the shuffle: the exchange moves at most
    (batches x distinct-per-batch) rows, not the raw event stream."""
    import polars as pl

    return pl.from_arrow(batch).unique(subset=_EVENT_COLS).to_arrow()


def _count_distinct_group(group: pa.Table) -> pa.Table:
    users = group["user_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "event_type": pa.array([group["event_type"][0].as_py()]),
        "n_users": pa.array([int(np.unique(users).size)], pa.int64()),
    })


def distinct_users(sf_dir: str):
    """A9: exact distinct users per event_type. Shape: per-batch local
    dedup (combiner) -> one groupby(event_type) -> per-group np.unique.
    Group state is bounded by the TRUE distinct count — for unbounded key
    cardinality use hll_distinct_users (fixed 16 KiB per group)."""
    ds = _events(sf_dir, _EVENT_COLS)
    return (
        ds.map_batches(_unique_pairs, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .map_groups(_count_distinct_group, batch_format="pyarrow")
    )


SQL["a9_distinct_users"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# -------------------------------------------------- HLL distinct per group

_HLL_P = 14


class _HllPartial:
    """Per-batch HLL partials: (event_type, registers binary). 16 KiB per
    (batch, group) — constant regardless of cardinality."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        types, regs = [], []
        for (et,), g in df.group_by("event_type"):
            h = HyperLogLog(_HLL_P)
            h.update_ints(g["user_id"].to_numpy())
            types.append(et)
            regs.append(h.registers.tobytes())
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "registers": pa.array(regs, pa.binary()),
        })


def _hll_merge_group(group: pa.Table) -> pa.Table:
    h = HyperLogLog(_HLL_P)
    for buf in group["registers"].to_pylist():
        h.merge(HyperLogLog(_HLL_P, np.frombuffer(buf, dtype=np.uint8).copy()))
    return pa.table({
        "event_type": pa.array([group["event_type"][0].as_py()]),
        "approx_users": pa.array([int(round(h.estimate()))], pa.int64()),
    })


def hll_distinct_users(sf_dir: str):
    """A9b: approximate distinct users per event_type via HyperLogLog
    (p=14, ~0.8% relative error — bound asserted in pytest vs the exact
    operator). The 100-TB path: every partial is a fixed 16 KiB register
    array and the merge is an elementwise max."""
    ds = _events(sf_dir, _EVENT_COLS)
    return (
        ds.map_batches(_HllPartial, batch_format="pyarrow",
                       batch_size=32768, concurrency=(1, 4))
        .groupby("event_type")
        .map_groups(_hll_merge_group, batch_format="pyarrow")
    )


# ----------------------------------- KMV distinct-intersection per pair

_KMV_K = 4096


class _KmvPartial:
    """Per-batch KMV partials: (event_type, k-minimum hash values binary).
    Fixed <= 32 KiB per (batch, group) regardless of cardinality."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        types, vals = [], []
        for (et,), g in df.group_by("event_type"):
            sk = KMV(_KMV_K).update_ints(g["user_id"].to_numpy())
            types.append(et)
            vals.append(sk.serialize())
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "kmv": pa.array(vals, pa.binary()),
        })


def _kmv_merge_group(group: pa.Table) -> pa.Table:
    sk = KMV(_KMV_K)
    for buf in group["kmv"].to_pylist():
        sk.merge(KMV.deserialize(buf, _KMV_K))
    return pa.table({
        "event_type": pa.array([group["event_type"][0].as_py()]),
        "kmv": pa.array([sk.serialize()], pa.binary()),
    })


def kmv_user_overlap(sf_dir: str) -> pa.Table:
    """A9c: estimated DISTINCT-USER OVERLAP between every pair of event
    types via K-minimum-values sketches (k=4096, ~1.6% relative error on
    distincts; pairwise |A ∩ B| from the union sketch's k-sample — the set-
    operation estimate HLL cannot provide).

    The 100-TB path: per-batch partials are fixed 32 KiB sorted hash
    arrays, merges are k-smallest-of-union (associative, idempotent), the
    exchange is one bounded groupby(event_type), and the driver touches
    only n_types sketches for the n_types^2/2 pairwise estimates — exact
    pairwise distinct-intersection would instead need a user-level
    self-join per pair."""
    ds = _events(sf_dir, _EVENT_COLS)
    merged = (
        ds.map_batches(_KmvPartial, batch_format="pyarrow",
                       batch_size=32768, concurrency=(1, 4))
        .groupby("event_type")
        .map_groups(_kmv_merge_group, batch_format="pyarrow")
    ).take_all()  # one row per event type (bounded)
    sks = {r["event_type"]: KMV.deserialize(r["kmv"], _KMV_K)
           for r in merged}
    names = sorted(sks)
    ta, tb, est = [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ta.append(a)
            tb.append(b)
            est.append(int(round(KMV.intersection(sks[a], sks[b]))))
    return pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "approx_shared_users": pa.array(est, pa.int64()),
    })


# ------------------------------------------- exact two-pass heavy hitters

HH_DENOM = 200  # heavy hitter = word with count >= ceil(total/200) (0.5%)
_MG_K = 1024

_WORD_RE = f"[^{WS_REGEX[1:-2]}]+"  # complement of the shared ws class


def _batch_words(batch: pa.Table):
    import polars as pl

    s = pl.from_arrow(batch)["text"].str.extract_all(_WORD_RE).explode()
    return s.drop_nulls().to_numpy()


def _count_allowed_words(batch: pa.Table, allowed_sorted: np.ndarray,
                         col: str = "word") -> pa.Table:
    """Exact per-batch counts restricted to a broadcast candidate set —
    the pass-2 kernel shared by heavy_hitter_words and bigram_pmi.
    `allowed_sorted` is a pre-sorted array built ONCE by the caller (a
    per-batch set->list->isin would redo that work every batch)."""
    words = _batch_words(batch)
    if words.size == 0 or allowed_sorted.size == 0:
        return pa.table({col: pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    u, c = np.unique(words, return_counts=True)
    idx = np.minimum(np.searchsorted(allowed_sorted, u),
                     allowed_sorted.size - 1)
    keep = allowed_sorted[idx] == u
    return pa.table({col: pa.array(u[keep], pa.string()),
                     "cnt": pa.array(c[keep], pa.int64())})


class _MgPass:
    """Pass 1: per-batch Misra-Gries partial. Emits <= k (word, cnt) rows
    plus one marker row (word='' — impossible as a real word since the
    splitter drops empties) carrying the batch's total word count and the
    shrink error; the union of partials preserves the MG guarantee:
    true(w) <= sum cnt(w) + sum err."""

    def __init__(self, k: int = _MG_K):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = _batch_words(batch)
        n = int(words.size)
        if n == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u, c = np.unique(words, return_counts=True)
        u, c, err = mg_shrink(u, c, self.k)
        return pa.table({
            "word": pa.array(np.concatenate([u, [""]]), pa.string()),
            "cnt": pa.array(np.concatenate([c, [err]]), pa.int64()),
            "n": pa.array([0] * u.size + [n], pa.int64()),
        })


def heavy_hitter_words(sf_dir: str, denom: int = HH_DENOM, k: int = _MG_K):
    """K6: EXACT heavy-hitter words — every word with count >= ceil(N/denom)
    with its exact count — WITHOUT ever shuffling the full vocabulary.

    Pass 1 (sketch): per-batch Misra-Gries partials (<= k rows/batch) ->
    one groupby(word).sum over sketch rows -> candidate set C with NO false
    negatives (MG invariant: true(w) <= est(w) + total_err; requires
    k > denom, checked). Pass 2 (exact): candidates broadcast in the task
    closure; each batch counts ONLY candidate words exactly; one tiny
    groupby(word).sum -> exact counts -> threshold filter. Total exchanged
    data is O(k) rows per batch regardless of vocabulary size."""
    if k <= denom:
        raise ValueError(f"MG capacity k={k} must exceed denom={denom} "
                         "for the no-false-negative guarantee")
    ds = _docs(sf_dir, ["text"])
    part = (
        ds.map_batches(_MgPass, fn_constructor_kwargs={"k": k},
                       batch_format="pyarrow", batch_size=4096,
                       concurrency=(1, 4))
        .groupby("word").sum(["cnt", "n"])
    )
    rows = part.take_all()  # <= union of per-batch top-k: bounded, tiny
    total_n = total_err = 0
    est: dict[str, int] = {}
    for r in rows:
        if r["word"] == "":
            total_n += int(r["sum(n)"])
            total_err += int(r["sum(cnt)"])
        else:
            est[r["word"]] = int(r["sum(cnt)"])
    empty = pa.table({"word": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if total_n == 0:
        return empty
    min_count = -(-total_n // denom)  # ceil
    cand = np.sort(np.array(
        [w for w, c in est.items() if c + total_err >= min_count],
        dtype=object))
    if cand.size == 0:
        return empty

    exact = (
        ds.map_batches(lambda b: _count_allowed_words(b, cand),
                       batch_format="pyarrow", batch_size=4096)
        .groupby("word").sum("cnt")
    )
    out = [(r["word"], int(r["sum(cnt)"])) for r in exact.take_all()
           if denom * int(r["sum(cnt)"]) >= total_n]
    out.sort()
    return pa.table({
        "word": pa.array([w for w, _ in out], pa.string()),
        "cnt": pa.array([c for _, c in out], pa.int64()),
    })


SQL["k6_heavy_hitters"] = f"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                x -> x <> '')) AS word
  FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w
GROUP BY word
HAVING {HH_DENOM} * count(*) >= (SELECT count(*) FROM w)
"""


# ----------------------------------- grouped heavy hitters (per language)


def _batch_words_by_lang(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    import polars as pl

    df = (pl.from_arrow(batch)
          .select("lang", pl.col("text").str.extract_all(_WORD_RE).alias("w"))
          .explode("w").drop_nulls("w"))
    return df["lang"].to_numpy(), df["w"].to_numpy()


class _MgLangPass:
    """Pass 1 of the GROUPED heavy-hitter sketch: an independent Misra-Gries
    partial per language within each batch. The group key stays a column on
    every sketch row, so merging is the same groupby-sum as the ungrouped
    form and the per-lang MG invariant holds independently per key. One
    marker row (word='') per lang carries that lang's batch word total and
    shrink error."""

    def __init__(self, k: int = _MG_K):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, words = _batch_words_by_lang(batch)
        out_lang: list = []
        out_word: list = []
        out_cnt: list = []
        out_n: list = []
        for lang in np.unique(langs):
            w = words[langs == lang]
            u, c = np.unique(w, return_counts=True)
            u, c, err = mg_shrink(u, c, self.k)
            out_lang.extend([lang] * (u.size + 1))
            out_word.extend(list(u) + [""])
            out_cnt.extend(list(map(int, c)) + [int(err)])
            out_n.extend([0] * u.size + [int(w.size)])
        return pa.table({
            "lang": pa.array(out_lang, pa.string()),
            "word": pa.array(out_word, pa.string()),
            "cnt": pa.array(out_cnt, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        })


def heavy_hitter_words_by_lang(sf_dir: str, denom: int = HH_DENOM,
                               k: int = _MG_K):
    """K6b: EXACT heavy hitters PER GROUP — every (lang, word) with count
    >= ceil(N_lang / denom) and its exact count — without shuffling any
    group's vocabulary. Same two-pass shape as heavy_hitter_words with the
    group key carried through both passes: per-(batch, lang) Misra-Gries
    partials -> one groupby(lang, word).sum over sketch rows (no false
    negatives per lang while k > denom) -> per-lang candidate sets broadcast
    in the task closure -> exact recount of candidates only -> per-lang
    threshold. Exchanged data stays O(k) rows per batch per lang; group-size
    skew costs nothing because no group's raw words ever converge."""
    if k <= denom:
        raise ValueError(f"MG capacity k={k} must exceed denom={denom} "
                         "for the no-false-negative guarantee")
    ds = _docs(sf_dir, ["text", "lang"])
    part = (
        ds.map_batches(_MgLangPass, fn_constructor_kwargs={"k": k},
                       batch_format="pyarrow", batch_size=4096,
                       concurrency=(1, 4))
        .groupby(["lang", "word"]).sum(["cnt", "n"])
    )
    rows = part.take_all()  # <= union of per-(batch,lang) top-k: bounded
    tot_n: dict[str, int] = {}
    tot_err: dict[str, int] = {}
    est: dict[tuple[str, str], int] = {}
    for r in rows:
        if r["word"] == "":
            tot_n[r["lang"]] = int(r["sum(n)"])
            tot_err[r["lang"]] = int(r["sum(cnt)"])
        else:
            est[(r["lang"], r["word"])] = int(r["sum(cnt)"])
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "word": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    cand_by_lang: dict[str, np.ndarray] = {}
    for (lang, word), c in est.items():
        n = tot_n.get(lang, 0)
        if n and c + tot_err.get(lang, 0) >= -(-n // denom):
            cand_by_lang.setdefault(lang, []).append(word)  # type: ignore
    if not cand_by_lang:
        return empty
    cand_by_lang = {lang: np.sort(np.array(ws, dtype=object))
                    for lang, ws in cand_by_lang.items()}

    def _recount(batch: pa.Table) -> pa.Table:
        langs, words = _batch_words_by_lang(batch)
        tl: list = []
        tw: list = []
        tc: list = []
        for lang in np.unique(langs):
            allowed = cand_by_lang.get(lang)
            if allowed is None:
                continue
            w = words[langs == lang]
            u, c = np.unique(w, return_counts=True)
            idx = np.minimum(np.searchsorted(allowed, u), allowed.size - 1)
            keep = allowed[idx] == u
            tl.extend([lang] * int(keep.sum()))
            tw.extend(list(u[keep]))
            tc.extend(list(map(int, c[keep])))
        return pa.table({"lang": pa.array(tl, pa.string()),
                         "word": pa.array(tw, pa.string()),
                         "cnt": pa.array(tc, pa.int64())})

    exact = (
        ds.map_batches(_recount, batch_format="pyarrow", batch_size=4096)
        .groupby(["lang", "word"]).sum("cnt")
    )
    out = [(r["lang"], r["word"], int(r["sum(cnt)"]))
           for r in exact.take_all()
           if denom * int(r["sum(cnt)"]) >= tot_n[r["lang"]]]
    out.sort()
    return pa.table({
        "lang": pa.array([x[0] for x in out], pa.string()),
        "word": pa.array([x[1] for x in out], pa.string()),
        "cnt": pa.array([x[2] for x in out], pa.int64()),
    })


SQL["k6b_heavy_hitters_by_lang"] = f"""
WITH w AS (
  SELECT lang, unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                x -> x <> '')) AS word
  FROM documents
),
tot AS (SELECT lang, count(*) AS n FROM w GROUP BY lang)
SELECT w.lang AS lang, word, CAST(count(*) AS BIGINT) AS cnt
FROM w JOIN tot ON w.lang = tot.lang
GROUP BY w.lang, word, tot.n
HAVING {HH_DENOM} * count(*) >= tot.n
"""


# ------------------------------- Shannon entropy of source mix per lang

def source_entropy(sf_dir: str) -> pa.Table:
    """A24: Shannon entropy (nats) of each language's source distribution —
    the mix-diversity signal data-balancing recipes monitor (a collapsed
    entropy means one source dominates a language's corpus).

    Scale shape: per-batch (lang, source) count combiner -> ONE bounded
    groupby (rows = langs x sources, both categorical) -> driver computes
    -sum(p ln p) per lang over the tiny result. Matches DuckDB at 6 dp
    (documented float-rounding convention)."""

    def counts(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["lang", "source"], use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["lang", "source", "cnt"]))

    rows = (_docs(sf_dir, ["lang", "source"])
            .map_batches(counts, batch_format="pyarrow", batch_size=65536)
            .groupby(["lang", "source"]).sum("cnt")).take_all()
    per_lang: dict[str, list[int]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(int(r["sum(cnt)"]))
    langs = sorted(per_lang)
    ents = []
    for lg in langs:
        c = np.array(per_lang[lg], np.float64)
        p_arr = c / c.sum()
        ents.append(round(float(-(p_arr * np.log(p_arr)).sum()), 6))
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "entropy": pa.array(ents, pa.float64()),
    })


SQL["a24_source_entropy"] = """
SELECT lang, round(-sum(p * ln(p)), 6) AS entropy
FROM (SELECT lang,
             count(*) * 1.0 /
             sum(count(*)) OVER (PARTITION BY lang) AS p
      FROM documents GROUP BY lang, source)
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------- OLAP rollup (one-pass cube)

_ROLLUP_ALL = "*"  # rolled-up marker; never a real lang/source value


def rollup_counts(sf_dir: str):
    """A12: ROLLUP aggregate — doc counts + char totals at THREE
    granularities (lang x source, lang, grand total) in ONE pass: each
    batch emits partials for every level (output bounded by group
    cardinality x 3, independent of batch rows), then one tiny
    groupby(lang, source) merges them. The standard OLAP rollup shape
    without scanning the corpus once per level or shuffling raw rows."""
    ds = _docs(sf_dir, ["lang", "source", "n_chars"])
    cols = ["lang", "source", "n_docs", "total_chars"]
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "source": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "total_chars": pa.array([], pa.int64())})

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return empty
        df = pl.from_arrow(batch)
        aggs = [pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_chars").sum().cast(pl.Int64).alias("total_chars")]
        lvl2 = df.group_by(["lang", "source"]).agg(aggs)
        lvl1 = df.group_by("lang").agg(aggs).with_columns(
            pl.lit(_ROLLUP_ALL).alias("source"))
        lvl0 = df.select(aggs).with_columns(
            pl.lit(_ROLLUP_ALL).alias("lang"),
            pl.lit(_ROLLUP_ALL).alias("source"))
        out = pl.concat([lvl2.select(cols), lvl1.select(cols),
                         lvl0.select(cols)]).to_arrow()
        return out.cast(empty.schema)

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"].cast(pa.string()),
            "source": t["source"].cast(pa.string()),
            "n_docs": t["sum(n_docs)"].cast(pa.int64()),
            "total_chars": t["sum(total_chars)"].cast(pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["lang", "source"]).sum(["n_docs", "total_chars"])
        .map_batches(_finish, batch_format="pyarrow")
    )


SQL["a12_rollup_counts"] = f"""
SELECT COALESCE(lang, '{_ROLLUP_ALL}') AS lang,
       COALESCE(source, '{_ROLLUP_ALL}') AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP(lang, source)
"""


# ------------------------------------- exact quantiles via histogram merge

_QUANTS = [0.5, 0.9, 0.99]


def _hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch compressed histogram: (lang, v, cnt) rows — one row per
    DISTINCT value per lang, the run-length-compressed partial that makes
    exact distributed quantiles an O(distinct-values) problem."""
    import polars as pl

    df = pl.from_arrow(batch)
    agg = df.group_by(["lang", "n_chars"]).len()
    return pa.table({
        "lang": agg["lang"].to_arrow(),
        "v": agg["n_chars"].to_arrow().cast(pa.int64()),
        "cnt": agg["len"].to_arrow().cast(pa.int64()),
    })


def _quantiles_group(group: pa.Table) -> pa.Table:
    v = group["v"].to_numpy(zero_copy_only=False)
    cnt = group["cnt"].to_numpy(zero_copy_only=False)
    # collapse duplicate values from different partials; memory stays
    # O(distinct values) — never a dense array over the value RANGE, which
    # one pathological outlier value would blow up
    uniq, inv = np.unique(v, return_inverse=True)
    merged = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(merged, inv, cnt)
    from ..stages.sketches import quantile_disc_sparse

    p50, p90, p99 = quantile_disc_sparse(uniq, merged, list(_QUANTS))
    return pa.table({
        "lang": pa.array([group["lang"][0].as_py()]),
        "p50": pa.array([p50], pa.int64()),
        "p90": pa.array([p90], pa.int64()),
        "p99": pa.array([p99], pa.int64()),
    })


def quantiles_exact(sf_dir: str):
    """A10: EXACT discrete quantiles of n_chars per language — per-batch
    compressed histogram partials, one tiny groupby(lang) over
    (lang, value, count) rows, never a global sort of the column."""
    ds = _docs(sf_dir, ["lang", "n_chars"])
    return (
        ds.map_batches(_hist_partial, batch_format="pyarrow",
                       batch_size=16384)
        .groupby("lang")
        .map_groups(_quantiles_group, batch_format="pyarrow")
    )


SQL["a10_quantiles_exact"] = """
SELECT lang,
       quantile_disc(n_chars, 0.5)  AS p50,
       quantile_disc(n_chars, 0.9)  AS p90,
       quantile_disc(n_chars, 0.99) AS p99
FROM documents GROUP BY lang
"""


# ---------------------------------------- repetition / quality (Gopher-ish)

def repetition_stats(sf_dir: str):
    """M8b: Gopher-style repetition signals per document — word count,
    distinct word count, duplicate-word fraction, mean word length. Pure
    vectorized per-batch map (polars string kernels), zero shuffle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _stats(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).with_columns(
            ws=pl.col("text").str.extract_all(_WORD_RE)
        ).with_columns(
            word_count=pl.col("ws").list.len().cast(pl.Int64),
            distinct_word_count=pl.col("ws").list.n_unique().cast(pl.Int64),
            nonws=(pl.col("text").str.len_chars()
                   - pl.col("text").str.count_matches(
                       f"[{WS_REGEX[1:-2]}]")).cast(pl.Float64),
        ).with_columns(
            # NULL (not NaN) when word_count == 0 — the SQL oracle's x/0
            # is NULL and the gate hashes NaN and NULL differently
            dup_word_frac=pl.when(pl.col("word_count") > 0)
            .then((1.0 - pl.col("distinct_word_count")
                   / pl.col("word_count")).round(6)),
            mean_word_len=pl.when(pl.col("word_count") > 0)
            .then((pl.col("nonws") / pl.col("word_count")).round(6)),
        )
        return df.select(["doc_id", "word_count", "distinct_word_count",
                          "dup_word_frac", "mean_word_len"]).to_arrow()

    return ds.map_batches(_stats, batch_format="pyarrow", batch_size=8192)


SQL["m8b_repetition"] = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws,
         length(regexp_replace(text, '{WS_REGEX}', '', 'g')) AS nonws
  FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS word_count,
       CAST(len(list_distinct(ws)) AS BIGINT) AS distinct_word_count,
       round(1 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE), 6)
           AS dup_word_frac,
       round(nonws / CAST(len(ws) AS DOUBLE), 6) AS mean_word_len
FROM w
"""


# ------------------------------------------------------------- PII scanning

# RE2-compatible patterns, shared verbatim with the oracle (no \s, no
# lookaround — identical semantics in Rust regex, RE2 and Python re)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}[- ][0-9]{2,4}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"


def pii_scan(sf_dir: str):
    """M21: PII pattern scan per document — email/phone match counts plus
    the md5 digest of the redacted text (digest, not the text itself, so
    the result stays tiny and the redaction is still hash-verifiable).
    Vectorized count/replace kernels; md5 is per-row C hashing."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _scan(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).with_columns(
            n_emails=pl.col("text").str.count_matches(EMAIL_RE)
            .cast(pl.Int64),
            n_phones=pl.col("text").str.count_matches(PHONE_RE)
            .cast(pl.Int64),
            red=pl.col("text")
            .str.replace_all(EMAIL_RE, "[EMAIL]")
            .str.replace_all(PHONE_RE, "[PHONE]"),
        )
        digests = [hashlib.md5(t.encode()).hexdigest()
                   for t in df["red"].to_list()]
        return df.select(["doc_id", "n_emails", "n_phones"]).with_columns(
            redacted_md5=pl.Series(digests)).to_arrow()

    return ds.map_batches(_scan, batch_format="pyarrow", batch_size=8192)


SQL["m21_pii_scan"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
           AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
FROM documents
"""


# ------------------------------------------------- stratified hash sample

STRAT_N = 20  # sample size per group


def _strat_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep only each lang's N smallest (md5, doc_id)
    keys — bounded output, so the merge input is N x langs x batches."""
    import polars as pl

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    h = md5_hex_of_ints(ids)
    df = pl.from_arrow(batch).with_columns(h=pl.Series(h))
    return (df.sort(["h", "doc_id"]).group_by("lang", maintain_order=True)
            .head(STRAT_N).to_arrow())


def stratified_sample(sf_dir: str):
    """K7: deterministic fixed-size per-language sample — the N smallest
    md5(doc_id) keys per lang. Reproducible across runs/engines (same
    sample on resume), uniform within each stratum, and shuffle-free:
    per-batch partial top-N per group + one tiny driver merge."""
    import polars as pl

    ds = _docs(sf_dir, ["doc_id", "lang"])
    partials = ds.map_batches(_strat_partial, batch_format="pyarrow",
                              batch_size=8192)
    merged = pl.from_arrow(pa.Table.from_pylist(partials.take_all()))
    out = (merged.sort(["h", "doc_id"])
           .group_by("lang", maintain_order=True).head(STRAT_N)
           .select(["doc_id", "lang"]).sort(["lang", "doc_id"]))
    return out.to_arrow()


SQL["k7_stratified_sample"] = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rn
  FROM documents
) WHERE rn <= {STRAT_N}
"""


# ------------------------------------------- newest-wins per key (argmax)

_EV_FULL = ["event_id", "ts", "user_id", "event_type", "value"]


def _latest_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep only each user's newest row — the exchange
    then moves <= users x batches rows, never the raw event stream. This is
    the Common-Crawl ingestion shape (newest capture per URL wins),
    exercised here on (user_id, ts)."""
    import polars as pl

    df = pl.from_arrow(batch)
    return (df.sort(["user_id", "ts", "event_id"],
                    descending=[False, True, True])
            .group_by("user_id", maintain_order=True).head(1).to_arrow())


def latest_event_per_user(sf_dir: str):
    """J8: distributed argmax — each user's newest event (ties broken by
    event_id), via per-batch partial argmax + ONE sort of the shrunken
    partials + first-of-run scan (stages/runs.py — no per-user Python
    dispatch; the winner per user is its run's first row under the
    newest-first order). The newest-wins-by-key dedup every snapshot
    ingestion needs."""
    from ..stages.runs import keep_first_per_run

    ds = _events(sf_dir, _EV_FULL)
    shrunk = ds.map_batches(_latest_partial, batch_format="pyarrow",
                            batch_size=16384)
    sorted_ds = shrunk.sort(["user_id", "ts", "event_id"],
                            descending=[False, True, True]).materialize()
    return keep_first_per_run(
        sorted_ds, ["user_id"], ["user_id", "ts", "event_id"],
        [False, True, True]).select_columns(_EV_FULL)


SQL["j8_latest_event"] = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ------------------------------------------------- bigram PMI collocations

PMI_MIN_COUNT = 5


class _BigramPass:
    """Pass 1 partials: per-batch bigram counts (vectorized polars
    explode/shift — adjacent words within a doc) plus a marker row
    (bigram='', impossible since words are non-empty) carrying the batch's
    unigram and bigram totals."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).with_columns(
            ws=pl.col("text").str.extract_all(_WORD_RE))
        e = df.select(pl.col("doc_id"), pl.col("ws")).explode("ws")
        nu = int(e["ws"].drop_nulls().len())
        e = e.with_columns(nxt=pl.col("ws").shift(-1),
                           nd=pl.col("doc_id").shift(-1))
        bg = (e.filter((pl.col("doc_id") == pl.col("nd"))
                       & pl.col("ws").is_not_null())
              .select(bigram=pl.col("ws") + " " + pl.col("nxt")))
        counts = bg.group_by("bigram").len()
        return pa.table({
            "bigram": pa.array(counts["bigram"].to_list() + [""],
                               pa.string()),
            "cnt": pa.array(counts["len"].to_list() + [0], pa.int64()),
            "nu": pa.array([0] * counts.height + [nu], pa.int64()),
            "nb": pa.array([0] * counts.height + [bg.height], pa.int64()),
        })


def bigram_pmi(sf_dir: str, min_count: int = PMI_MIN_COUNT):
    """A11: pointwise mutual information of adjacent word pairs — the
    collocation signal. Selection is by INTEGER count threshold (never by a
    float PMI cut, so the kept set is float-robust); PMI is a reported
    column rounded to 6 dp.

    Scale shape: bigram counts via per-batch combiner + one groupby (the
    exchange carries distinct-bigrams-per-batch rows); the unigram counts
    needed for PMI are only those appearing in surviving bigrams, counted
    in a second broadcast-filtered pass — the full vocabulary is never
    joined."""
    import math

    ds = _docs(sf_dir, ["doc_id", "text"])
    part = (
        ds.map_batches(_BigramPass, batch_format="pyarrow", batch_size=4096,
                       concurrency=(1, 4))
        .groupby("bigram").sum(["cnt", "nu", "nb"])
    )
    n_uni = n_bi = 0
    kept: list[tuple[str, int]] = []
    for r in part.take_all():
        if r["bigram"] == "":
            n_uni += int(r["sum(nu)"])
            n_bi += int(r["sum(nb)"])
        elif int(r["sum(cnt)"]) >= min_count:
            kept.append((r["bigram"], int(r["sum(cnt)"])))
    empty = pa.table({"bigram": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64()),
                      "pmi": pa.array([], pa.float64())})
    if not kept or n_uni == 0 or n_bi == 0:
        return empty
    needed = np.sort(np.array(
        sorted({w for bg, _ in kept for w in bg.split(" ")}), dtype=object))

    uni = {r["word"]: int(r["sum(cnt)"])
           for r in ds.map_batches(
               lambda b: _count_allowed_words(b, needed),
               batch_format="pyarrow", batch_size=4096)
           .groupby("word").sum("cnt").take_all()}
    kept.sort()
    pmi = [round(math.log((c / n_bi)
                          / ((uni[b.split(" ")[0]] / n_uni)
                             * (uni[b.split(" ")[1]] / n_uni))), 6)
           for b, c in kept]
    return pa.table({
        "bigram": pa.array([b for b, _ in kept], pa.string()),
        "cnt": pa.array([c for _, c in kept], pa.int64()),
        "pmi": pa.array(pmi, pa.float64()),
    })


SQL["a11_bigram_pmi"] = f"""
WITH w AS (
  SELECT list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws
  FROM documents
),
uni AS (SELECT unnest(ws) AS wd FROM w),
bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                     i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM w),
nu AS (SELECT count(*) n FROM uni), nb AS (SELECT count(*) n FROM bg),
uc AS (SELECT wd, count(*) c FROM uni GROUP BY wd),
bc AS (SELECT bigram, count(*) c FROM bg GROUP BY bigram
       HAVING count(*) >= {PMI_MIN_COUNT})
SELECT bc.bigram, CAST(bc.c AS BIGINT) AS cnt,
       round(ln((bc.c / CAST(nb.n AS DOUBLE))
                / ((u1.c / CAST(nu.n AS DOUBLE))
                   * (u2.c / CAST(nu.n AS DOUBLE)))), 6) AS pmi
FROM bc, nu, nb
JOIN uc u1 ON u1.wd = string_split(bc.bigram, ' ')[1]
JOIN uc u2 ON u2.wd = string_split(bc.bigram, ' ')[2]
"""


# ------------------------------------- hashed TF-IDF document embeddings

TFIDF_DIM = 64  # hashing-trick bucket count


def _md5_bucket(terms: np.ndarray, dim: int) -> np.ndarray:
    return md5_prefix_int_of_strings(terms.tolist()) % dim


def tfidf_embed(sf_dir: str, dim: int = TFIDF_DIM):
    """M22: hashing-trick TF-IDF document vectors as SPARSE
    (doc_id, bucket, val) rows — the classic featurizer bridging the text
    tables to the vector operators (ANN / cosine near-dup take these as
    input). bucket = md5(term) mod dim (md5 so the oracle computes the
    identical bucket); val = sum over the bucket's terms of
    tf * ln((N+1)/(df+1)), rounded to 6 dp.

    Scale shape: df comes from the a6-style combiner + one groupby; the
    (term -> df) map is broadcast into the embed stage's closure (documents
    here have a bounded vocabulary; for an unbounded vocabulary swap the
    broadcast for a hash-partitioned term join — noted, not needed at this
    corpus shape). The embed pass itself is per-batch local: explode ->
    hash -> two-level np.add.at, no shuffle."""
    import math

    from .simple_text import term_df

    n_docs = _docs(sf_dir, ["doc_id"]).count()
    df_map = {r["term"]: int(r["df"]) for r in term_df(sf_dir).take_all()}
    idf = {t: math.log((n_docs + 1) / (d + 1)) for t, d in df_map.items()}

    def _embed(batch: pa.Table) -> pa.Table:
        import polars as pl

        e = (pl.from_arrow(batch)
             .with_columns(term=pl.col("text").str.split(" "))
             .select(["doc_id", "term"]).explode("term")
             .group_by(["doc_id", "term"]).len())
        terms = e["term"].to_numpy()
        doc_ids = e["doc_id"].to_numpy()
        tfs = e["len"].to_numpy()
        buckets = _md5_bucket(terms, dim)
        idfs = np.fromiter((idf.get(t, 0.0) for t in terms.tolist()),
                           dtype=np.float64, count=terms.size)
        # accumulate per (doc, bucket): doc ids are batch-local -> compact
        uniq_docs, doc_ix = np.unique(doc_ids, return_inverse=True)
        flat = np.zeros(uniq_docs.size * dim, dtype=np.float64)
        np.add.at(flat, doc_ix * dim + buckets, tfs * idfs)
        nz = np.flatnonzero(flat)
        return pa.table({
            "doc_id": pa.array(uniq_docs[nz // dim], pa.int64()),
            "bucket": pa.array(nz % dim, pa.int64()),
            "val": pa.array(np.round(flat[nz], 6), pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _embed, batch_format="pyarrow", batch_size=4096)


SQL["m22_tfidf_embed"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT tf.doc_id,
       CAST(('0x' || substr(md5(tf.term), 1, 8)) AS BIGINT) % {TFIDF_DIM}
           AS bucket,
       round(sum(tf.tf * ln((n.n + 1) / CAST(df.df + 1 AS DOUBLE))), 6)
           AS val
FROM tf JOIN df USING (term), n
GROUP BY tf.doc_id, bucket
HAVING sum(tf.tf * ln((n.n + 1) / CAST(df.df + 1 AS DOUBLE))) <> 0
"""


# ------------------------------------- bloom-filter semi-join (j10)

VIP_MIN_PURCHASES = 15  # integer threshold: float-robust VIP selection
BLOOM_M_BITS = 1 << 14  # 2 KiB broadcast regardless of key-set size
BLOOM_K = 4


def bloom_semi_join(sf_dir: str, min_purchases: int = VIP_MIN_PURCHASES,
                    m_bits: int = BLOOM_M_BITS) -> ray.data.Dataset:
    """J10 -> (event_id, user_id, event_type): all events of "VIP" users
    (>= min_purchases purchase events) — a semi-join whose small side is
    UNBOUNDED at corpus scale, done the 100-TB way:

      1. VIP set via per-batch partial counts + one tiny groupby.
      2. A fixed-size Bloom bitmap of the VIP ids is built as per-batch
         partials and OR-merged (the only thing the driver ever holds is
         2 KiB of bits — never the id set).
      3. The events table is prefiltered per batch against the broadcast
         bitmap: false positives possible, negatives impossible, so the
         big side entering the confirm shuffle shrinks to ~the true match
         set regardless of how big the VIP set grows.
      4. ONE groupby(user_id) over (survivors + VIP marker rows) confirms
         exactly — output has zero false positives.
    """
    from ..stages.sketches import BloomFilter

    events = _events(sf_dir, ["event_id", "user_id", "event_type"])

    def _purchase_counts(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["event_type"], "purchase")
        u = batch.filter(keep)["user_id"].to_numpy(zero_copy_only=False)
        uu, cc = np.unique(u, return_counts=True)
        return pa.table({"user_id": pa.array(uu, pa.int64()),
                         "cnt": pa.array(cc, pa.int64())})

    vip = (events.map_batches(_purchase_counts, batch_format="pyarrow",
                              batch_size=8192)
           .groupby("user_id").sum("cnt"))

    def _vip_rows(batch: pa.Table) -> pa.Table:
        keep = batch["sum(cnt)"].to_numpy(
            zero_copy_only=False) >= min_purchases
        ids = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"user_id": pa.array(ids, pa.int64())})

    vip_ids = vip.map_batches(_vip_rows, batch_format="pyarrow",
                              batch_size=8192).materialize()

    def _bloom_partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, BLOOM_K)
        bf.add_ints(batch["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([bf.bits.tobytes()],
                                          pa.binary())})

    merged = BloomFilter(m_bits, BLOOM_K)
    for r in vip_ids.map_batches(_bloom_partial, batch_format="pyarrow",
                                 batch_size=65536).take_all():
        merged.merge(BloomFilter(
            m_bits, BLOOM_K, np.frombuffer(r["bits"], dtype=np.uint64)))
    bloom_ref = ray.put((merged.m_bits, merged.k, merged.bits))

    def _prefilter(batch: pa.Table) -> pa.Table:
        mb, k, bits = ray.get(bloom_ref)
        bf = BloomFilter(mb, k, bits)
        keep = bf.test_ints(batch["user_id"].to_numpy(zero_copy_only=False))
        out = batch.filter(pa.array(keep))
        return pa.table({
            "event_id": out["event_id"].cast(pa.int64()),
            "user_id": out["user_id"].cast(pa.int64()),
            "event_type": out["event_type"],
            "is_marker": pa.array(np.zeros(out.num_rows, dtype=bool)),
        })

    def _markers(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "event_id": pa.array(np.full(n, -1), pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": pa.array([""] * n, pa.string()),
            "is_marker": pa.array(np.ones(n, dtype=bool)),
        })

    # exact confirm without per-user dispatch: ONE sort(user, event) over
    # survivors + marker rows (markers sort first in a user run: event_id
    # -1); a user's rows are kept iff their run contains a marker — a
    # per-run ANY reduction, chained across block boundaries by the
    # shared merge (stages/runs.py). A bloom false positive's run has no
    # marker and is dropped, so output has zero false positives.
    _CONFIRM_EMPTY = {
        "tag": pa.array([], pa.string()),
        "first_key": pa.array([], pa.int64()),
        "last_key": pa.array([], pa.int64()),
        "first_val": pa.array([], pa.bool_()),
        "last_val": pa.array([], pa.bool_()),
        "n_runs": pa.array([], pa.int64()),
    }

    def _confirm_bounds(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_CONFIRM_EMPTY)
        from ..stages.runs import new_run_mask

        mask = new_run_mask(batch, ["user_id"])
        starts = np.nonzero(mask)[0]
        m = batch["is_marker"].to_numpy(zero_copy_only=False)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        first_end = int(starts[1]) if starts.size > 1 else batch.num_rows
        tag = repr((int(users[0]),
                    int(batch["event_id"][0].as_py())))
        return pa.table({
            "tag": pa.array([tag], pa.string()),
            "first_key": pa.array([int(users[0])], pa.int64()),
            "last_key": pa.array([int(users[-1])], pa.int64()),
            "first_val": pa.array([bool(m[:first_end].any())], pa.bool_()),
            "last_val": pa.array([bool(m[starts[-1]:].any())], pa.bool_()),
            "n_runs": pa.array([int(starts.size)], pa.int64()),
        })

    def _confirm_scan(batch: pa.Table, *, totals_ref) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        from ..stages.runs import fetch, new_run_mask

        totals = fetch(totals_ref)
        mask = new_run_mask(batch, ["user_id"])
        run_id = np.cumsum(mask) - 1
        m = batch["is_marker"].to_numpy(zero_copy_only=False)
        has = np.bincount(run_id, weights=m.astype(np.float64)) > 0
        tag = repr((int(batch["user_id"][0].as_py()),
                    int(batch["event_id"][0].as_py())))
        first_t, last_t = totals[tag]
        has[0] = first_t
        has[-1] = last_t
        keep = has[run_id] & ~m
        return batch.filter(pa.array(keep)) \
            .drop_columns(["is_marker"])

    survivors = events.map_batches(_prefilter, batch_format="pyarrow",
                                   batch_size=8192)
    marks = vip_ids.map_batches(_markers, batch_format="pyarrow",
                                batch_size=8192)
    sorted_u = survivors.union(marks) \
        .sort(["user_id", "event_id"]).materialize()
    btab = pa.concat_tables(ray.get(
        sorted_u.map_batches(_confirm_bounds, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs()))
    import ast
    import operator

    from ..stages.runs import merge_run_reductions

    totals_ref = ray.put(merge_run_reductions(
        sorted(btab.to_pylist(), key=lambda r: ast.literal_eval(r["tag"])),
        operator.or_))
    return sorted_u.map_batches(
        _confirm_scan, fn_kwargs={"totals_ref": totals_ref},
        batch_format="pyarrow", batch_size=None)


SQL["j10_bloom_semi_join"] = f"""
WITH vip AS (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING count(*) >= {VIP_MIN_PURCHASES}
)
SELECT e.event_id, e.user_id, e.event_type
FROM events e JOIN vip USING (user_id)
"""


# -------------------------- approximate quantiles (continuous domain)

APPROX_Q_BINS = 4096  # fixed state: error <= (max-min)/4096 per group


def quantiles_approx(sf_dir: str, nbins: int = APPROX_Q_BINS):
    """A10b -> (event_type, p50, p90, p99) of events.value, APPROXIMATE:
    the continuous-domain companion to a10_quantiles_exact (whose
    compressed histogram is exact only because n_chars has bounded
    distinct values). One (min, max) aggregate fixes the bin grid, then
    every partial is a fixed nbins x int64 vector and the merge is
    elementwise add — deterministic, resume-idempotent, error bounded by
    one bin width ((max-min)/nbins), asserted in pytest. The 100-TB shape:
    constant-size state per (batch, group), no value ever shuffled."""
    ds = _events(sf_dir, ["event_type", "value"])
    lo = ds.min("value")
    hi = ds.max("value")
    if lo is None or hi is None or hi <= lo:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "p50": pa.array([], pa.float64()),
                         "p90": pa.array([], pa.float64()),
                         "p99": pa.array([], pa.float64())})
    width = (hi - lo) / nbins

    def _hist_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        types, bufs = [], []
        for (et,), g in df.group_by("event_type"):
            v = g["value"].to_numpy()
            bins = np.minimum(((v - lo) / width).astype(np.int64), nbins - 1)
            h = np.bincount(bins, minlength=nbins).astype(np.int64)
            types.append(et)
            bufs.append(h.tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "hist": pa.array(bufs, pa.binary())})

    def _merge_group(group: pa.Table) -> pa.Table:
        from ..stages.sketches import quantile_disc_sparse

        h = np.zeros(nbins, dtype=np.int64)
        for buf in group["hist"].to_pylist():
            h += np.frombuffer(buf, dtype=np.int64)
        idx = np.flatnonzero(h)
        qs = quantile_disc_sparse(idx, h[idx], list(_QUANTS))
        # report the bin's LEFT edge: within one bin width of the true value
        p50, p90, p99 = (round(lo + q * width, 6) for q in qs)
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()]),
            "p50": pa.array([p50], pa.float64()),
            "p90": pa.array([p90], pa.float64()),
            "p99": pa.array([p99], pa.float64()),
        })

    return (ds.map_batches(_hist_partial, batch_format="pyarrow",
                           batch_size=32768)
            .groupby("event_type")
            .map_groups(_merge_group, batch_format="pyarrow"))


def quantiles_kll(sf_dir: str, k: int = 200):
    """A10c -> (event_type, p50, p90, p99) of events.value via KLL sketches
    (Karnin-Lang-Liberty 2016) — the third quantile path, for continuous
    UNBOUNDED columns: a10's compressed histogram needs bounded distinct
    values and a10b's fixed grid needs a (min, max) pre-pass; KLL needs
    neither and its partials are ~2 KB regardless of n. Per-batch partial
    sketches per group -> ONE groupby(event_type) merge. Rank error ~O(1/k)
    whp (pytest-asserted against exact numpy quantiles); rows-only in the
    driver gate (approximate => no SQL hash oracle)."""
    from ..stages.sketches import KLL

    ds = _events(sf_dir, ["event_type", "value"])

    def _kll_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        types, bufs = [], []
        for (et,), g in df.group_by("event_type"):
            types.append(et)
            bufs.append(KLL(k=k).update_many(g["value"].to_numpy())
                        .serialize())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "sketch": pa.array(bufs, pa.binary())})

    def _merge_group(group: pa.Table) -> pa.Table:
        merged = KLL(k=k)
        for buf in group["sketch"].to_pylist():
            merged.merge(KLL.deserialize(buf))
        p50, p90, p99 = merged.quantiles([0.5, 0.9, 0.99])
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()]),
            "p50": pa.array([round(p50, 6)], pa.float64()),
            "p90": pa.array([round(p90, 6)], pa.float64()),
            "p99": pa.array([round(p99, 6)], pa.float64()),
        })

    return (ds.map_batches(_kll_partial, batch_format="pyarrow",
                           batch_size=32768)
            .groupby("event_type")
            .map_groups(_merge_group, batch_format="pyarrow"))


# --------------------------------------------------- k14 pivot (long->wide)

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_daily_events(sf_dir: str):
    """K14: PIVOT — the long (ts, event_type) stream reshaped to one WIDE
    row per day with a count column per event type (the reshape every
    monitoring/report sink wants). Each batch emits already-wide partial
    rows (np.add.at over a day x type count grid — bounded by distinct
    days x types, never row count), then ONE tiny groupby(day) sums the
    columns. Unknown event types fail loudly rather than silently
    vanishing from the wide schema."""
    ds = _events(sf_dir, ["ts", "event_type"])
    type_idx = {t: i for i, t in enumerate(PIVOT_TYPES)}
    day_us = 24 * 3600 * 1_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        cols = {f"n_{t}": pa.array([], pa.int64()) for t in PIVOT_TYPES}
        if batch.num_rows == 0:
            return pa.table({"day_us": pa.array([], pa.int64()), **cols})
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        days = (ts // day_us) * day_us
        types = batch["event_type"].to_pylist()
        unknown = set(types) - set(PIVOT_TYPES)
        if unknown:
            raise ValueError(f"unpivoted event types: {sorted(unknown)}")
        ti = np.fromiter((type_idx[t] for t in types), dtype=np.int64,
                         count=len(types))
        uday, dinv = np.unique(days, return_inverse=True)
        grid = np.zeros((uday.size, len(PIVOT_TYPES)), dtype=np.int64)
        np.add.at(grid, (dinv, ti), 1)
        return pa.table({
            "day_us": pa.array(uday.astype(np.int64)),
            **{f"n_{t}": pa.array(grid[:, i], pa.int64())
               for t, i in type_idx.items()},
        })

    def _finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch["day_us"].cast(pa.int64())
            .cast(pa.timestamp("us")),
            **{f"n_{t}": batch[f"sum(n_{t})"].cast(pa.int64())
               for t in PIVOT_TYPES},
        })

    from ray.data.aggregate import Sum

    return (ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=32768)
            .groupby("day_us")
            .aggregate(*[Sum(f"n_{t}") for t in PIVOT_TYPES])
            .map_batches(_finalize, batch_format="pyarrow"))


SQL["k14_pivot_daily"] = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
           AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY day
"""


# -------------------------------------- a10d continuous quantiles per lang


def _quantiles_cont_group(group: pa.Table) -> pa.Table:
    v = group["v"].to_numpy(zero_copy_only=False)
    cnt = group["cnt"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(v, return_inverse=True)
    merged = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(merged, inv, cnt)
    from ..stages.sketches import quantile_cont_sparse

    p50, p90, p99 = quantile_cont_sparse(uniq, merged, list(_QUANTS))
    return pa.table({
        "lang": pa.array([group["lang"][0].as_py()]),
        "p50": pa.array([round(p50, 6)], pa.float64()),
        "p90": pa.array([round(p90, 6)], pa.float64()),
        "p99": pa.array([round(p99, 6)], pa.float64()),
    })


def quantiles_cont(sf_dir: str):
    """A10d: EXACT interpolated (continuous) quantiles of n_chars per
    language — same compressed-histogram partials as a10 (one tiny
    groupby(lang) over (lang, value, count) rows, never a global sort);
    the finalize interpolates DuckDB quantile_cont semantics."""
    ds = _docs(sf_dir, ["lang", "n_chars"])
    return (
        ds.map_batches(_hist_partial, batch_format="pyarrow",
                       batch_size=16384)
        .groupby("lang")
        .map_groups(_quantiles_cont_group, batch_format="pyarrow")
    )


SQL["a10d_quantiles_cont"] = """
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 6)  AS p50,
       round(quantile_cont(n_chars, 0.9), 6)  AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents GROUP BY lang
"""


# ------------------------------------------- Gopher quality rules (m26)

# Rae et al. 2021 (Gopher, §A1.1) document-quality heuristics, adapted to
# the columns this corpus has. All rules are INTEGER comparisons (ratios
# expressed multiplicatively), so the distributed result is bit-identical
# to the SQL oracle with no float rounding anywhere.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3   # 3 <= nonws/words <= 10
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLET_RE = r"^[-*•]"
_ELLIPSIS_RE = r"\.\.\.$"
_ALPHA_RE = r"[A-Za-z]"


def gopher_rules(sf_dir: str):
    """M26: Gopher-style quality gate per document — the repetition family's
    (m8b) sibling for FILTERING rather than scoring. Pure per-batch
    vectorized map (polars list kernels), zero shuffle; the verdict column
    is what `curate`-style pipelines consume as their quality stage.

    Rules (all integer arithmetic): word count in [50, 100k]; mean word
    length in [3, 10] chars; fewer than 10% symbol words (# / ...); under
    90% bullet lines and under 30% ellipsis lines; over 80% of words
    containing an ASCII letter; at least 2 English stop-word hits."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _rules(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = gopher_with_verdict(pl.from_arrow(batch))
        return df.select([
            "doc_id", "word_count", "symbol_cnt", "n_lines", "bullet_lines",
            "ellipsis_lines", "alpha_words", "stop_hits", "passes_gopher",
        ]).to_arrow()

    return ds.map_batches(_rules, batch_format="pyarrow", batch_size=8192)


def gopher_with_verdict(df):
    """Append the Gopher rule stats + `passes_gopher` verdict to any polars
    frame with a `text` column — shared by m26 (scoring surface) and the
    curate pipeline's quality="gopher" gate so both speak the ONE rule
    set."""
    import polars as pl

    stops = list(GOPHER_STOP_WORDS)
    return df.with_columns(
        ws=pl.col("text").str.extract_all(_WORD_RE),
        lines=pl.col("text").str.split("\n"),
        nonws=(pl.col("text").str.len_chars()
               - pl.col("text").str.count_matches(
                   f"[{WS_REGEX[1:-2]}]")).cast(pl.Int64),
        symbol_cnt=(pl.col("text").str.count_matches("#", literal=True)
                    + pl.col("text").str.count_matches(r"\.\.\."))
        .cast(pl.Int64),
    ).with_columns(
        word_count=pl.col("ws").list.len().cast(pl.Int64),
        n_lines=pl.col("lines").list.len().cast(pl.Int64),
        bullet_lines=pl.col("lines").list.eval(
            pl.element().str.contains(_BULLET_RE)).list.sum()
        .cast(pl.Int64),
        ellipsis_lines=pl.col("lines").list.eval(
            pl.element().str.contains(_ELLIPSIS_RE)).list.sum()
        .cast(pl.Int64),
        alpha_words=pl.col("ws").list.eval(
            pl.element().str.contains(_ALPHA_RE)).list.sum()
        .cast(pl.Int64),
        stop_hits=pl.col("ws").list.eval(
            pl.element().str.to_lowercase().is_in(stops)).list.sum()
        .cast(pl.Int64),
    ).with_columns(
        passes_gopher=(
            (pl.col("word_count") >= GOPHER_MIN_WORDS)
            & (pl.col("word_count") <= GOPHER_MAX_WORDS)
            & (pl.col("nonws")
               >= GOPHER_MIN_MEAN_WORD_LEN * pl.col("word_count"))
            & (pl.col("nonws")
               <= GOPHER_MAX_MEAN_WORD_LEN * pl.col("word_count"))
            & (pl.col("symbol_cnt") * 10 < pl.col("word_count"))
            & (pl.col("bullet_lines") * 10 < 9 * pl.col("n_lines"))
            & (pl.col("ellipsis_lines") * 10 < 3 * pl.col("n_lines"))
            & (pl.col("alpha_words") * 5 > 4 * pl.col("word_count"))
            & (pl.col("stop_hits") >= 2)
        ),
    )


_GOPHER_STOPS_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOP_WORDS)

SQL["m26_gopher_rules"] = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws,
         string_split(text, chr(10)) AS lines,
         length(regexp_replace(text, '{WS_REGEX}', '', 'g')) AS nonws,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS symbol_cnt
  FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS word_count,
         CAST(symbol_cnt AS BIGINT) AS symbol_cnt,
         nonws,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
              x -> regexp_matches(x, '{_BULLET_RE}'))) AS BIGINT)
             AS bullet_lines,
         CAST(len(list_filter(lines,
              x -> regexp_matches(x, '{_ELLIPSIS_RE}'))) AS BIGINT)
             AS ellipsis_lines,
         CAST(len(list_filter(ws,
              x -> regexp_matches(x, '{_ALPHA_RE}'))) AS BIGINT)
             AS alpha_words,
         CAST(len(list_filter(ws,
              x -> list_contains([{_GOPHER_STOPS_SQL}], lower(x))))
              AS BIGINT) AS stop_hits
  FROM w
)
SELECT doc_id, word_count, symbol_cnt, n_lines, bullet_lines,
       ellipsis_lines, alpha_words, stop_hits,
       (word_count >= {GOPHER_MIN_WORDS}
        AND word_count <= {GOPHER_MAX_WORDS}
        AND nonws >= {GOPHER_MIN_MEAN_WORD_LEN} * word_count
        AND nonws <= {GOPHER_MAX_MEAN_WORD_LEN} * word_count
        AND symbol_cnt * 10 < word_count
        AND bullet_lines * 10 < 9 * n_lines
        AND ellipsis_lines * 10 < 3 * n_lines
        AND alpha_words * 5 > 4 * word_count
        AND stop_hits >= 2) AS passes_gopher
FROM c
"""
