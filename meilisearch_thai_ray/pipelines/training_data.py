"""Training-data-preparation operators (the webtext-curation family).

These are the ops a pretraining data pipeline runs AFTER cleaning/dedup
(pipelines/curate.py) and BEFORE the trainer reads the corpus:

  d9_decontaminate   benchmark decontamination — flag every document that
                     contains any snippet from a (broadcast) eval set
  m23_lm_score       unigram-LM log-probability quality score per doc
                     (bounded vocab + aggregate-OOV mass, the fixed-vocab
                     LM-filter shape used by CCNet-style pipelines)
  k8_global_shuffle  deterministic global shuffle: every doc gets a
                     (shard, pos) in a reproducible random order — the
                     training-data ordering op
  m24_bpe_merges     BPE tokenizer training: distributed word-frequency
                     pass, merge loop over the bounded word table

Scale shapes (the part that must survive 100 TB):
  - decontamination broadcasts the SMALL side (the eval set — KBs-to-MBs
    in practice) via ray.put and runs ONE Aho-Corasick prefilter pass
    (`polars str.contains_any`) per batch; per-snippet counting happens
    only on the (rare) contaminated rows.
  - the LM vocabulary is bounded by an integer count threshold; everything
    below it is ONE aggregate OOV probability, so the broadcast table is
    capped regardless of corpus size and no token-level join/shuffle ever
    happens (score pass is per-batch local).
  - global shuffle's only exchange is ONE groupby(shard); shard count is
    chosen by the caller so a shard fits a worker, and md5 keys make the
    ordering reproducible and resume-idempotent (no RNG state).
  - BPE trains on the word-frequency SUMMARY (combiner + one groupby —
    the corpus never converges), which is vocabulary-sized, not
    corpus-sized; the merge loop runs on that bounded table (the same
    design as HF tokenizers / SentencePiece, which train single-node from
    word counts at any corpus scale).

Reference analog: the reference has no training-data exporter — these extend
the engine the way SURVEY.md §2 extensions (ANN, dedup) do. Tokenization
here is the shared whitespace-word convention (similarity_join.WS_REGEX),
NOT the Thai segmenter: the oracle must reproduce it in SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.resources import pool_cap

from ..sources.documents import read_parquet_clean
from ..stages.similarity_join import WS_REGEX
from .corpus_stats import _WORD_RE

SQL: dict[str, str] = {}


def _docs(sf_dir: str, columns: list[str]):
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=columns)


# ------------------------------------------------ benchmark decontamination

DECON_MOD = 50       # every 50th doc donates one eval snippet
DECON_OFF = 40       # snippet = text[DECON_OFF : DECON_OFF + DECON_LEN]
DECON_LEN = 64
DECON_MIN_CHARS = 160


def eval_snippets(sf_dir: str) -> list[str]:
    """The deterministic stand-in for an external eval set: one 64-char
    snippet from every 50th sufficiently-long document, deduplicated and
    sorted. (In production this list comes from the benchmark suite and is
    small; it is the broadcast side by construction.)"""
    def _pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        hit = batch.filter(pa.array(
            (ids % DECON_MOD == 0) & (nch >= DECON_MIN_CHARS)))
        # slice worker-side: only the 64-char snippets travel to the driver
        snips = [t[DECON_OFF:DECON_OFF + DECON_LEN]
                 for t in hit["text"].to_pylist()]
        return pa.table({"snip": pa.array(snips, pa.string())})

    rows = (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(_pick, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    return sorted({r["snip"] for r in rows})


class _DeconScan:
    """Per-batch contamination scan. One automaton pass (contains_any)
    prefilters; per-snippet literal counting runs only on matched rows."""

    def __init__(self, snips_ref):
        import polars as pl

        self._pl = pl
        snips = ray.get(snips_ref) if isinstance(
            snips_ref, ray.ObjectRef) else snips_ref
        self.snips = snips
        self._count_exprs = [
            pl.col("text").str.contains(s, literal=True).cast(pl.Int64)
            for s in snips
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = self._pl
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_snips": pa.array([], pa.int64())})
        if not self.snips:
            return empty
        df = pl.from_arrow(batch)
        hit = df.filter(pl.col("text").str.contains_any(self.snips))
        if hit.height == 0:
            return empty
        out = hit.select(
            pl.col("doc_id"),
            pl.sum_horizontal(self._count_exprs).alias("n_snips"),
        )
        return out.to_arrow().cast(pa.schema([("doc_id", pa.int64()),
                                              ("n_snips", pa.int64())]))


def decontaminate(sf_dir: str) -> ray.data.Dataset:
    """D9 -> (doc_id, n_snips): every document containing >= 1 eval-set
    snippet, with the number of distinct snippets it contains. Donor docs
    flag themselves (they contain their own substring) — the caller drops
    or keeps them; the operator reports all contamination."""
    snips_ref = ray.put(eval_snippets(sf_dir))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _DeconScan, fn_constructor_args=(snips_ref,),
        batch_format="pyarrow", batch_size=2048, concurrency=(1, pool_cap(8)),
    )


SQL["d9_decontaminate"] = f"""
WITH ev AS (
  SELECT DISTINCT substr(text, {DECON_OFF + 1}, {DECON_LEN}) AS snip
  FROM documents
  WHERE doc_id % {DECON_MOD} = 0 AND n_chars >= {DECON_MIN_CHARS}
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_snips
FROM documents d JOIN ev ON contains(d.text, ev.snip)
GROUP BY d.doc_id
"""


# ------------------------------------------------- unigram LM quality score

LM_MIN_COUNT = 5  # integer vocab threshold (float-robust selection)


def _word_count_partial(batch: pa.Table) -> pa.Table:
    import polars as pl

    s = (pl.from_arrow(batch)["text"].str.extract_all(_WORD_RE)
         .explode().drop_nulls())
    if s.len() == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    u, c = np.unique(s.to_numpy(), return_counts=True)
    return pa.table({"word": pa.array(u, pa.string()),
                     "cnt": pa.array(c, pa.int64())})


def _lm_vocab(sf_dir: str, min_count: int):
    """Distributed unigram counts (combiner + one groupby), then the
    bounded model: words with cnt >= min_count keep their own probability;
    the rest collapse into one aggregate OOV mass. The min_count filter
    runs DISTRIBUTED, so the driver only ever receives the kept vocabulary
    (<= n_total/min_count entries by pigeonhole) — the unbounded singleton
    tail never converges anywhere."""
    vocab_ds = (
        _docs(sf_dir, ["text"])
        .map_batches(_word_count_partial, batch_format="pyarrow",
                     batch_size=4096)
        .groupby("word").sum("cnt")
        .materialize()  # consumed twice: total + kept filter
    )
    n_total = int(vocab_ds.sum("sum(cnt)") or 0)

    def _keep(batch: pa.Table) -> pa.Table:
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= min_count))

    kept = [(r["word"], int(r["sum(cnt)"]))
            for r in vocab_ds.map_batches(
                _keep, batch_format="pyarrow").take_all()]
    kept.sort()
    vocab = np.array([w for w, _ in kept], dtype=object)
    counts = np.array([c for _, c in kept], dtype=np.int64)
    oov_total = n_total - int(counts.sum())
    return vocab, counts, oov_total, n_total


class _LmScore:
    """Per-batch local scorer: explode -> sorted-vocab searchsorted lookup
    -> per-doc mean log-probability. No shuffle; model via ray.put."""

    def __init__(self, model_ref):
        self.vocab, self.counts, self.oov_total, self.n_total = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef)
            else model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        e = (pl.from_arrow(batch)
             .with_columns(wd=pl.col("text").str.extract_all(_WORD_RE))
             .select(["doc_id", "wd"]).explode("wd")
             .filter(pl.col("wd").is_not_null()))
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "avg_logprob": pa.array([], pa.float64())})
        if e.height == 0:
            return empty
        words = e["wd"].to_numpy()
        doc_ids = e["doc_id"].to_numpy()
        if self.vocab.size:
            idx = np.searchsorted(self.vocab, words)
            idx_c = np.minimum(idx, self.vocab.size - 1)
            match = self.vocab[idx_c] == words
            cnt = np.where(match, self.counts[idx_c], self.oov_total)
        else:
            cnt = np.full(words.size, self.oov_total, dtype=np.int64)
        logp = np.log(cnt / float(self.n_total))
        uniq, inv = np.unique(doc_ids, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(sums, inv, logp)
        n_tok = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(uniq.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "avg_logprob": pa.array(np.round(sums / n_tok, 6), pa.float64()),
        })


def lm_score(sf_dir: str, min_count: int = LM_MIN_COUNT) -> ray.data.Dataset:
    """M23 -> (doc_id, n_tokens, avg_logprob): mean unigram log-probability
    per document under the corpus's own bounded-vocab LM — low scores mark
    gibberish / rare-token soup, the CCNet-style quality filter signal.
    Docs with zero words emit no row (matches the SQL join)."""
    model_ref = ray.put(_lm_vocab(sf_dir, min_count))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _LmScore, fn_constructor_args=(model_ref,),
        batch_format="pyarrow", batch_size=2048, concurrency=(1, pool_cap(8)),
    )


SQL["m23_lm_score"] = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                            x -> x <> '')) AS wd
  FROM documents
),
uc AS (SELECT wd, count(*) AS c FROM w GROUP BY wd),
n AS (SELECT count(*) AS n FROM w),
kept AS (SELECT wd, c FROM uc WHERE c >= {LM_MIN_COUNT}),
oov AS (SELECT n.n - COALESCE((SELECT sum(c) FROM kept), 0) AS o FROM n)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(COALESCE(kept.c, oov.o) / CAST(n.n AS DOUBLE))), 6)
           AS avg_logprob
FROM w LEFT JOIN kept ON w.wd = kept.wd, n, oov
GROUP BY w.doc_id
"""


# ------------------------------------------------ deterministic global shuffle

SHUFFLE_SHARDS = 16


def _append_shuffle_keys(batch: pa.Table, n_shards: int) -> pa.Table:
    """Append (shard, key) to ANY doc_id-carrying batch: key = md5 hex of
    the decimal doc_id (the oracle-shared convention), shard = first-8-hex
    int mod n_shards. The ONE definition of the shuffle's key scheme —
    global_shuffle and export_training_corpus both call it, so exported
    files and the (doc_id, shard, pos) table agree by construction."""
    from ..functions.hashing import md5_hex_of_ints, md5_prefix_int

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    keys = md5_hex_of_ints(ids)
    shard = md5_prefix_int(keys) % n_shards
    return (batch.append_column("shard", pa.array(shard, pa.int64()))
            .append_column("key", pa.array(keys, pa.string())))


def _positions_for_keys(group: pa.Table):
    """(order, pos) of a shard group's md5 keys — keys are unique per
    doc_id, so the order is total."""
    keys = np.asarray(group["key"].to_pylist(), dtype=object)
    order = np.argsort(keys)
    pos = np.empty(keys.size, dtype=np.int64)
    pos[order] = np.arange(keys.size, dtype=np.int64)
    return order, pos


def _rank_group(group: pa.Table) -> pa.Table:
    _, pos = _positions_for_keys(group)
    return pa.table({
        "doc_id": group["doc_id"].cast(pa.int64()),
        "shard": group["shard"].cast(pa.int64()),
        "pos": pa.array(pos),
    })


def global_shuffle(sf_dir: str) -> ray.data.Dataset:
    """K8 -> (doc_id, shard, pos): a reproducible random total order for
    training — shard = md5 bucket, pos = rank of the md5 key within the
    shard. ONE groupby(shard) exchange; md5 keys are uniform so shards are
    balanced by construction, and re-running any subset of tasks yields
    identical placement (resume-idempotent, no RNG state). A trainer reads
    shard files in pos order; at 100 TB pick SHUFFLE_SHARDS so one shard
    fits a worker."""
    import functools

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(functools.partial(_append_shuffle_keys,
                                       n_shards=SHUFFLE_SHARDS),
                     batch_format="pyarrow", batch_size=8192)
        .groupby("shard")
        .map_groups(_rank_group, batch_format="pyarrow")
    )


SQL["k8_global_shuffle"] = f"""
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
                PARTITION BY CAST(('0x' || substr(md5(CAST(doc_id AS
                    VARCHAR)), 1, 8)) AS BIGINT) % {SHUFFLE_SHARDS}
                ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
            AS BIGINT) AS pos
FROM documents
"""


# ------------------------------------------------------ BPE tokenizer training

BPE_N_MERGES = 40
BPE_MAX_WORDS = 50_000  # bounded word table; drop-count is logged, not silent


def bpe_reference_merges(word_counts: dict[str, int],
                         n_merges: int) -> list[tuple[str, str, int]]:
    """Oracle kernel: textbook BPE over a word-frequency dict. Each word is
    a symbol sequence (initially its codepoints); per round, count adjacent
    symbol pairs weighted by word frequency, merge the most frequent pair
    (ties: lexicographically smallest (left, right)), repeat. Returns
    [(left, right, pair_count), ...] in merge order. The distributed
    pipeline must match this byte-for-byte."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_counts.items() if len(w) >= 2]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((left, right, cnt))
        joined = left + right
        new_seqs = []
        for sym, c in seqs:
            i, out = 0, []
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            if len(out) >= 2:
                new_seqs.append((out, c))
        seqs = new_seqs
    return merges


def corpus_word_counts(sf_dir: str,
                       max_words: int = BPE_MAX_WORDS) -> dict[str, int]:
    """The distributed half of BPE training: corpus -> word-frequency table
    via per-batch combiner + ONE groupby (the corpus never converges; the
    exchange carries distinct-words-per-batch rows). The max_words cap
    (most frequent first, ties lexicographic) is applied as a per-batch
    partial top-N BEFORE anything reaches the driver, so the driver merge
    input is <= max_words per block, never the full vocabulary; the cap is
    reported, never silent."""
    vocab_ds = (
        _docs(sf_dir, ["text"])
        .map_batches(_word_count_partial, batch_format="pyarrow",
                     batch_size=4096)
        .groupby("word").sum("cnt")
        .materialize()  # consumed twice: distinct count + partial top-N
    )
    n_distinct = vocab_ds.count()

    def _partial_top(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (pl.from_arrow(batch)
                .sort(["sum(cnt)", "word"], descending=[True, False])
                .head(max_words).to_arrow())

    rows = vocab_ds.map_batches(_partial_top, batch_format="pyarrow",
                                batch_size=65536).take_all()
    items = sorted(((r["word"], int(r["sum(cnt)"])) for r in rows),
                   key=lambda kv: (-kv[1], kv[0]))
    if n_distinct > max_words:
        print(f"[bpe] word table capped: {n_distinct} -> {max_words} "
              f"({n_distinct - max_words} rare words dropped)")
        items = items[:max_words]
    return dict(items)


def bpe_merges(sf_dir: str, n_merges: int = BPE_N_MERGES) -> pa.Table:
    """M24 -> (rank, left, right, cnt): the learned BPE merge table.

    Scale shape: the only corpus-sized work is the word-count pass above;
    the merge loop runs over the bounded word table (vocabulary-sized —
    the same single-node-train-from-counts design as HF tokenizers and
    SentencePiece, valid at any corpus scale because the summary, not the
    corpus, is the training input)."""
    wc = corpus_word_counts(sf_dir)
    merges = bpe_reference_merges(wc, n_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "cnt": pa.array([m[2] for m in merges], pa.int64()),
    })


# ------------------------------------------- token-budget greedy selection

BUDGET_DIV = 4  # budget = total corpus chars // 4


def budget_select(sf_dir: str) -> ray.data.Dataset:
    """K9 -> (doc_id, lang, n_chars): greedily keep the longest documents
    (ties: smallest doc_id) until the running total reaches the char
    budget — the "take the best docs until N tokens" selection every
    pretraining run does, WITHOUT a global sort.

    Distributed shape: pass 1 builds a per-VALUE histogram (distinct
    n_chars values; a bounded, tiny exchange — same trick as
    corpus_stats.quantiles_exact). The driver cumsums the histogram to
    find the threshold value v*, then resolves the boundary ties with one
    filtered read of ONLY the v*-valued rows. Pass 2 is a broadcast-filter
    map: keep n_chars > v*, or n_chars == v* and doc_id <= boundary. The
    corpus is never sorted and never converges anywhere."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    rows = (ds.map_batches(_hist, batch_format="pyarrow", batch_size=8192)
            .groupby("v").sum("cnt").take_all())
    vals = sorted(((int(r["v"]), int(r["sum(cnt)"])) for r in rows),
                  reverse=True)
    total = sum(v * c for v, c in vals)
    budget = total // BUDGET_DIV

    cum = 0
    v_star, cum_before = None, 0
    for v, c in vals:
        if cum + v * c > budget:
            v_star, cum_before = v, cum
            break
        cum += v * c
    if v_star is None:  # budget covers everything
        return ds

    # boundary: v*-valued docs in doc_id order while cum <= budget
    n_fit = (budget - cum_before) // v_star
    boundary_id = -1
    if n_fit > 0:
        def _ties(batch: pa.Table) -> pa.Table:
            keep = batch["n_chars"].to_numpy(zero_copy_only=False) == v_star
            return batch.filter(pa.array(keep)).select(["doc_id"])

        tie_ids = np.sort(np.concatenate([
            b["doc_id"].to_numpy(zero_copy_only=False)
            for b in ds.map_batches(_ties, batch_format="pyarrow",
                                    batch_size=8192).iter_batches(
                                        batch_format="pyarrow")
        ] + [np.array([], dtype=np.int64)]))
        if tie_ids.size:
            boundary_id = int(tie_ids[:n_fit][-1]) if n_fit <= tie_ids.size \
                else int(tie_ids[-1])

    def _select(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (v > v_star) | ((v == v_star) & (ids <= boundary_id))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_select, batch_format="pyarrow", batch_size=8192)


SQL["k9_budget_select"] = f"""
WITH tot AS (SELECT sum(n_chars) // {BUDGET_DIV} AS b FROM documents),
c AS (
  SELECT doc_id, lang, n_chars,
         sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id) AS cum
  FROM documents
)
SELECT doc_id, lang, n_chars FROM c, tot WHERE c.cum <= tot.b
"""


# ------------------------------------------------- source-mix rebalancing

def source_balance(sf_dir: str) -> ray.data.Dataset:
    """K10 -> (doc_id, source): deterministic down-sample so every source
    contributes ~equally (the source-mix rebalance step of a pretraining
    recipe, with the smallest source as the target). keep iff
    md5-fraction(doc_id) < min_count / count(source) — a pure per-batch
    filter after one tiny count aggregate; no shuffle of the corpus, no
    RNG state, idempotent on resume."""
    counts = {r["source"]: int(r["count()"])
              for r in _docs(sf_dir, ["source"])
              .groupby("source").count().take_all()}
    if not counts:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string())}))
    m = min(counts.values())
    rates = {s: m / c for s, c in counts.items()}

    def _keep(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hex_of_ints, md5_prefix_int

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        srcs = batch["source"].to_pylist()
        frac = md5_prefix_int(md5_hex_of_ints(ids)).astype(
            np.float64) / 2**32
        rate = np.fromiter((rates[s] for s in srcs), dtype=np.float64,
                           count=ids.size)
        return batch.filter(pa.array(frac < rate))

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        _keep, batch_format="pyarrow", batch_size=8192)


SQL["k10_source_balance"] = """
WITH sc AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
m AS (SELECT min(c) AS m FROM sc)
SELECT d.doc_id, d.source
FROM documents d JOIN sc USING (source), m
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 < CAST(m.m AS DOUBLE) / sc.c
"""


# ---------------------------------------------- training-corpus export sink

def export_training_corpus(sf_dir: str, out_dir: str,
                           n_shards: int = SHUFFLE_SHARDS) -> dict:
    """Write the corpus in trainer-ready form: one parquet file per shuffle
    shard, rows in the deterministic md5 order (`global_shuffle` semantics),
    payload included. A trainer streams shard files in pos order and sees a
    reproducible random document order.

    Resumable by construction: each shard is written atomically (tmp +
    rename) and a finished shard file is skipped on re-run — a crashed
    export redoes only missing shards, and because the order is md5-keyed
    (no RNG state) the redo is byte-identical. ONE groupby(shard) exchange
    carries the payload; shards are md5-uniform so the shuffle is
    skew-free. Key scheme is `_append_shuffle_keys`, shared with
    global_shuffle, so shard files match its (doc_id, shard, pos) table.

    out_dir must be storage every worker sees (shared FS / fuse-mounted
    object store — the normal cluster arrangement): the exists-check and
    atomic rename run on whichever node owns the shard task, so with
    node-local disks the resume contract does not hold. Returns a manifest
    {"shards": [...], "rows": n}."""
    import functools

    os.makedirs(out_dir, exist_ok=True)

    def _write_shard(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = int(group["shard"][0].as_py())
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if os.path.exists(path):  # finished shard: resume skips it
            return pa.table({"shard": pa.array([shard], pa.int64()),
                             "rows": pa.array([group.num_rows], pa.int64()),
                             "skipped": pa.array([True])})
        order, pos = _positions_for_keys(group)
        out = (group.append_column("pos", pa.array(pos, pa.int64()))
               .drop_columns(["key", "shard"])
               .take(pa.array(order, pa.int64())))
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64()),
                         "skipped": pa.array([False])})

    manifest = (
        _docs(sf_dir, ["doc_id", "text", "lang", "source"])
        .map_batches(functools.partial(_append_shuffle_keys,
                                       n_shards=n_shards),
                     batch_format="pyarrow", batch_size=8192)
        .groupby("shard")
        .map_groups(_write_shard, batch_format="pyarrow")
        .take_all()
    )
    manifest.sort(key=lambda r: r["shard"])
    return {"shards": manifest,
            "rows": int(sum(r["rows"] for r in manifest))}


# --------------------------------------- cross-document boilerplate removal

LINE_DEDUP_MIN_DOCS = 5  # a non-empty line in >= 5 distinct docs is boiler

# Deterministic planted boilerplate: the driver's synthetic documents are
# single-line with zero cross-document shared lines, so without planting the
# operator's removal set is always empty. The plant is mirrored EXACTLY in
# the SQL oracle (same precedent as d2_embed_neardup / d10's re-crawl): a
# footer on every 7th doc, a header on every 13th, and a rare notice on
# every 250th — the last sits under the threshold at small scales and above
# it at large ones, exercising the threshold data-dependently.
PLANT_HEADER = "This website uses cookies to improve your experience."
PLANT_FOOTER = "Follow us on social media and subscribe to the newsletter."
PLANT_RARE = "Editors note: this piece was updated for clarity."


def _plant_boilerplate(batch: pa.Table) -> pa.Table:
    import polars as pl

    ids = pl.col("doc_id")
    prefix = (pl.when(ids % 13 == 0).then(pl.lit(PLANT_HEADER + "\n"))
              .otherwise(pl.lit("")))
    suffix1 = (pl.when(ids % 7 == 0).then(pl.lit("\n" + PLANT_FOOTER))
               .otherwise(pl.lit("")))
    suffix2 = (pl.when(ids % 250 == 3).then(pl.lit("\n" + PLANT_RARE))
               .otherwise(pl.lit("")))
    return (pl.from_arrow(batch)
            .with_columns(text=prefix + pl.col("text") + suffix1 + suffix2)
            .to_arrow())


def _line_doc_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (line, nd) where nd = number of DISTINCT docs in
    this batch containing the non-empty line. A doc lives entirely in one
    batch, so summing nd across batches gives the corpus-wide distinct-doc
    count with one small groupby (never a per-occurrence shuffle)."""
    import polars as pl

    out = (pl.from_arrow(batch)
           .select("doc_id", line=pl.col("text").str.split("\n"))
           .explode("line")
           .filter(pl.col("line") != "")
           .unique(["doc_id", "line"])
           .group_by("line").len("nd"))
    return out.to_arrow().cast(pa.schema([("line", pa.string()),
                                          ("nd", pa.int64())]))


class _StripBoiler:
    """Per-batch boilerplate removal against the broadcast boiler-line set.
    Order-preserving: polars list.eval filter keeps surviving lines in
    place, so unaffected documents reconstruct byte-identically."""

    def __init__(self, boiler_ref):
        import polars as pl

        self._pl = pl
        self.boiler = (ray.get(boiler_ref)
                       if isinstance(boiler_ref, ray.ObjectRef)
                       else boiler_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = self._pl
        df = (pl.from_arrow(batch)
              .with_columns(lines=pl.col("text").str.split("\n"))
              .with_columns(n_lines=pl.col("lines").list.len()
                            .cast(pl.Int64)))
        if self.boiler:
            df = df.with_columns(kept=pl.col("lines").list.eval(
                pl.element().filter(~pl.element().is_in(self.boiler))))
        else:
            df = df.with_columns(kept=pl.col("lines"))
        df = df.with_columns(
            n_removed=(pl.col("n_lines")
                       - pl.col("kept").list.len().cast(pl.Int64)),
            clean_text=pl.col("kept").list.join("\n"),
        )
        return df.select(["doc_id", "n_lines", "n_removed",
                          "clean_text"]).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64()),
                       ("n_removed", pa.int64()), ("clean_text", pa.string())]))


def line_dedup_ds(ds: ray.data.Dataset,
                  min_docs: int = LINE_DEDUP_MIN_DOCS) -> ray.data.Dataset:
    """CCNet-style cross-document line dedup over any (doc_id, text)
    Dataset -> (doc_id, n_lines, n_removed, clean_text): every non-empty
    line occurring in >= min_docs DISTINCT documents (site chrome, cookie
    banners, share footers) is removed from every document.

    Two passes, one tiny exchange each:
      A. per-batch distinct (doc, line) -> (line, nd) combiner, then ONE
         groupby(line).sum — only (line, count) rows shuffle, never text;
      B. the boiler set (bounded above by total_lines / min_docs, MBs in
         practice) broadcasts via ray.put and each batch strips lines
         locally. At 100 TB, swap the exact broadcast for a Bloom filter
         of line hashes + exact confirm on hits (stages/sketches.BloomFilter
         is the j10 building block) if the boiler set outgrows workers.

    Reference analog: the reference dedups WITHIN a result set
    (result_ranker.py:635-712); this is the corpus-level curation form
    (CCNet / RefinedWeb paragraph dedup)."""
    def _keep_boiler(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch["sum(nd)"], min_docs)).select(["line"])

    counts = (ds.map_batches(_line_doc_counts, batch_format="pyarrow",
                             batch_size=4096)
              .groupby("line").sum("nd"))
    boiler_tables = ray.get(
        counts.map_batches(_keep_boiler, batch_format="pyarrow")
        .to_arrow_refs())
    boiler = sorted(set().union(*(
        t.column("line").to_pylist() for t in boiler_tables))) \
        if boiler_tables else []
    boiler_ref = ray.put(boiler)
    return ds.map_batches(
        _StripBoiler, fn_constructor_args=(boiler_ref,),
        batch_format="pyarrow", batch_size=2048, concurrency=(1, pool_cap(8)),
    )


def line_dedup(sf_dir: str, min_docs: int = LINE_DEDUP_MIN_DOCS,
               plant: bool = False) -> ray.data.Dataset:
    """D12 driver entry. plant defaults to FALSE — the production operator
    never fabricates boilerplate; the driver's d12_line_dedup entry opts in
    (see _plant_boilerplate) because the synthetic corpus has no natural
    cross-document lines to find."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    if plant:
        ds = ds.map_batches(_plant_boilerplate, batch_format="pyarrow",
                            batch_size=4096)
    return line_dedup_ds(ds, min_docs=min_docs)


SQL["d12_line_dedup"] = f"""
WITH p AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 13 = 0 THEN '{PLANT_HEADER}' || chr(10)
               ELSE '' END)
         || text
         || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{PLANT_FOOTER}'
                  ELSE '' END)
         || (CASE WHEN doc_id % 250 = 3 THEN chr(10) || '{PLANT_RARE}'
                  ELSE '' END) AS text
  FROM documents
),
l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS i
  FROM p
),
b AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM l WHERE line <> ''
    GROUP BY line)
  WHERE nd >= {LINE_DEDUP_MIN_DOCS}
),
k AS (SELECT doc_id, i, line FROM l WHERE line NOT IN (SELECT line FROM b)),
a AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY i) AS clean_text
      FROM k GROUP BY doc_id),
t AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM t LEFT JOIN a USING (doc_id)
"""


# ------------------------------- k15 sorted export + range-served reads


@ray.remote
def _write_sorted_part(tab: pa.Table, path: str, key: str) -> dict:
    import pyarrow.parquet as pq

    if key not in tab.column_names:  # schemaless empty sort block
        return {"file": os.path.basename(path), "min": None, "max": None,
                "rows": 0}
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)
    v = tab[key].to_numpy(zero_copy_only=False)
    return {"file": os.path.basename(path),
            "min": int(v[0]) if len(v) else None,
            "max": int(v[-1]) if len(v) else None,
            "rows": tab.num_rows}


def export_sorted(ds: ray.data.Dataset, out_dir: str, key: str,
                  order_cols: list[str] | None = None) -> dict:
    """GLOBAL-ORDER export: sort by `order_cols` (default [key]) and write
    one parquet file per sorted block plus a manifest of per-file
    [min(key), max(key)] ranges — the layout that makes downstream range
    reads prune whole files (read_sorted_range) and gives anti_id_filter's
    side-parquet path a formal sink.

    Complement of export_training_corpus: hash shards are DETERMINISTIC
    across runs, so that sink resumes per shard; sorted-block boundaries
    are not (Ray picks them), so THIS sink is atomic at whole-export
    granularity — a complete manifest means done (re-run = no-op), no
    manifest means rebuild. Callers needing finer resume pre-partition by
    key range and export each partition."""
    import json

    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    import shutil as _sh

    _sh.rmtree(out_dir, ignore_errors=True)  # partial export: rebuild
    os.makedirs(out_dir, exist_ok=True)
    sorted_ds = ds.sort(order_cols or [key]).materialize()
    refs = sorted_ds.to_arrow_refs()  # dataset (= sort) order
    parts = ray.get([
        _write_sorted_part.remote(
            r, os.path.join(out_dir, f"part-{i:05d}.parquet"), key)
        for i, r in enumerate(refs)])
    parts = [p for p in parts if p["rows"]]
    man = {"key": key, "files": parts,
           "rows": int(sum(p["rows"] for p in parts))}
    tmp = manifest_path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, manifest_path)
    return man


def read_sorted_range(out_dir: str, lo: int, hi: int,
                      columns: list[str] | None = None):
    """Range read over an export_sorted layout: the manifest prunes to the
    files whose [min, max] overlaps [lo, hi]; only those are opened (plus
    a row filter for the edges). Returns (arrow table, n_files_read)."""
    import json

    import pyarrow.dataset as pads

    with open(os.path.join(out_dir, "manifest.json")) as f:
        man = json.load(f)
    key = man["key"]
    hit = [p["file"] for p in man["files"]
           if p["min"] is not None and p["min"] <= hi and p["max"] >= lo]
    if not hit:
        return None, 0
    import pyarrow.compute as _pc

    tab = pads.dataset(
        [os.path.join(out_dir, f) for f in hit]).to_table(
        columns=columns,
        filter=(_pc.field(key) >= lo) & (_pc.field(key) <= hi))
    return tab, len(hit)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread each of 16 bits of `x` (uint32 in [0, 65535]) to the even
    bit positions of a uint32 (the standard Morton magic-number dilation)."""
    x = x.astype(np.uint32)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def _u16_norm(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Min-max scale to the 16-bit grid (monotone, so per-column file
    min/max stats stay exact for pruning)."""
    if hi <= lo:
        return np.zeros(len(v), np.uint32)
    f = (v.astype(np.float64) - lo) / (hi - lo)
    return np.clip(np.floor(f * 65535.0), 0, 65535).astype(np.uint32)


@ray.remote
def _write_zorder_part(tab: pa.Table, path: str, cols: list) -> dict:
    import pyarrow.parquet as pq

    if "zkey" not in tab.column_names:  # schemaless empty sort block
        out = {"file": os.path.basename(path), "rows": 0}
        for c in cols:
            out[f"min_{c}"] = out[f"max_{c}"] = None
        return out
    tab = tab.drop_columns(["zkey"])
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)
    out = {"file": os.path.basename(path), "rows": tab.num_rows}
    for c in cols:
        v = tab[c].to_numpy(zero_copy_only=False)
        out[f"min_{c}"] = float(v.min()) if len(v) else None
        out[f"max_{c}"] = float(v.max()) if len(v) else None
    return out


def export_zorder(ds: ray.data.Dataset, out_dir: str,
                  cols: list[str], n_files: int | None = None) -> dict:
    """Z-ORDER export: interleave the bits of two min-max-normalized
    columns into a Morton key, sort by it, and write one parquet file per
    sorted block with per-file [min, max] stats for BOTH columns — the
    multi-dimensional data layout (Delta/Iceberg OPTIMIZE ZORDER) that
    lets a rectangle predicate prune files on EITHER column, where a
    single-key sort clusters only its leading column.

    Scale shape: one tiny (min, max) aggregate pass fixes the grid, one
    map_batches stamps keys, ONE sort is the only exchange; same
    whole-export atomic-manifest resume contract as export_sorted."""
    import json

    from ray.data.aggregate import Max, Min

    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    import shutil as _sh

    _sh.rmtree(out_dir, ignore_errors=True)  # partial export: rebuild
    os.makedirs(out_dir, exist_ok=True)
    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"lo_{c}"), Max(c, alias_name=f"hi_{c}")]
    stats = ds.aggregate(*aggs)
    bounds = [(float(stats[f"lo_{c}"]), float(stats[f"hi_{c}"]))
              for c in cols]

    def stamp(batch: pa.Table) -> pa.Table:
        a = _u16_norm(batch[cols[0]].to_numpy(zero_copy_only=False),
                      *bounds[0])
        b = _u16_norm(batch[cols[1]].to_numpy(zero_copy_only=False),
                      *bounds[1])
        z = (_spread16(a) << np.uint32(1)) | _spread16(b)
        return batch.append_column("zkey", pa.array(z, pa.uint32()))

    # batch_size=None: stamp per input block — a row-count batch size here
    # would COALESCE blocks and collapse the sort's output partitioning
    # (fewer, fatter exported files)
    sorted_ds = ds.map_batches(stamp, batch_format="pyarrow",
                               batch_size=None).sort("zkey")
    if n_files is not None:
        # order-preserving block split/merge: pins the exported file count
        # instead of inheriting the sort's block layout
        sorted_ds = sorted_ds.repartition(n_files)
    sorted_ds = sorted_ds.materialize()
    refs = sorted_ds.to_arrow_refs()
    parts = ray.get([
        _write_zorder_part.remote(
            r, os.path.join(out_dir, f"part-{i:05d}.parquet"), cols)
        for i, r in enumerate(refs)])
    parts = [p for p in parts if p["rows"]]
    man = {"cols": cols, "files": parts,
           "rows": int(sum(p["rows"] for p in parts))}
    tmp = manifest_path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, manifest_path)
    return man


def read_zorder_box(out_dir: str, box: dict,
                    columns: list[str] | None = None):
    """Rectangle read over an export_zorder layout: the manifest prunes to
    files whose per-column [min, max] stats intersect EVERY box side, then
    a residual row filter trims the edges. Returns (table, n_files_read)."""
    import json

    import pyarrow.dataset as pads

    with open(os.path.join(out_dir, "manifest.json")) as f:
        man = json.load(f)
    hit = []
    for p in man["files"]:
        ok = p["rows"] > 0
        for c, (lo, hi) in box.items():
            ok = ok and p[f"min_{c}"] <= hi and p[f"max_{c}"] >= lo
        if ok:
            hit.append(p["file"])
    if not hit:
        return None, 0
    import pyarrow.compute as _pc

    filt = None
    for c, (lo, hi) in box.items():
        this = (_pc.field(c) >= lo) & (_pc.field(c) <= hi)
        filt = this if filt is None else (filt & this)
    tab = pads.dataset(
        [os.path.join(out_dir, f) for f in hit]).to_table(
        columns=columns, filter=filt)
    return tab, len(hit)


K19_BOX = {"user_id": (3, 9), "value": (20.0, 60.0)}


def zorder_export_box(sf_dir: str):
    """K19: export events Z-ORDERED by (user_id, value) — cached per
    corpus under /tmp like the PQ code store — then serve a rectangle
    query by two-column manifest pruning + residual filter. The pruning
    advantage over a single-key layout is pytest-measured; THIS entry is
    the exactness gate (hash match vs the plain SQL rectangle scan)."""
    from .simple_text import input_fingerprint

    src = os.path.join(sf_dir, "events.parquet")
    out = os.path.join("/tmp/meili_ray_cache",
                       f"zorder_events_{input_fingerprint(src)}")
    ds = read_parquet_clean(
        src, columns=["event_id", "user_id", "value"])
    export_zorder(ds, out, ["user_id", "value"])
    tab, _ = read_zorder_box(out, K19_BOX,
                             columns=["event_id", "user_id", "value"])
    if tab is None:
        tab = pa.table({"event_id": pa.array([], pa.int64()),
                        "user_id": pa.array([], pa.int64()),
                        "value": pa.array([], pa.float64())})
    order = np.argsort(tab["event_id"].to_numpy(zero_copy_only=False),
                       kind="stable")
    return tab.take(pa.array(order))


SQL["k19_zorder_box"] = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, value
FROM events
WHERE user_id BETWEEN {K19_BOX["user_id"][0]} AND {K19_BOX["user_id"][1]}
  AND value BETWEEN {K19_BOX["value"][0]} AND {K19_BOX["value"][1]}
ORDER BY event_id
"""


K15_RANGE = (400, 900)  # n_chars band for the driver query


def sorted_export_range(sf_dir: str):
    """K15: export documents in GLOBAL (n_chars, doc_id) order with a
    key-range manifest, then serve a band query by manifest pruning —
    only the overlapping files are opened. Export is cached per input
    (manifest = done)."""
    from .simple_text import input_fingerprint

    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "lang", "n_chars"])
    # keyed by input IDENTITY (path + per-file mtime/size), not path alone:
    # a mutated documents table must never serve a stale export
    fp = input_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    out = f"/tmp/meili_ray_cache/sorted_docs_{fp}"
    export_sorted(ds, out, key="n_chars", order_cols=["n_chars", "doc_id"])
    tab, _ = read_sorted_range(out, *K15_RANGE,
                               columns=["doc_id", "lang", "n_chars"])
    if tab is None:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string()),
                         "n_chars": pa.array([], pa.int64())})
    import pyarrow.compute as _pc

    return tab.take(_pc.sort_indices(
        tab, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]))


SQL["k15_sorted_export"] = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars BETWEEN {K15_RANGE[0]} AND {K15_RANGE[1]}
ORDER BY n_chars, doc_id
"""


# --------------------------- DSIR importance weights (Xie et al. 2023)

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"


def _dsir_explode(batch: pa.Table):
    """(doc_id, lang, text) batch -> per-token (doc_index, bucket) arrays.
    Tokenization is text.split(' ') — bit-compatible with DuckDB
    string_split — and the bucket is the oracle-shared md5-prefix hash,
    computed once per DISTINCT token in the batch."""
    from ..functions.hashing import md5_prefix_int_of_strings

    texts = batch["text"].to_pylist()
    toks: list[str] = []
    doc_idx: list[int] = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        toks.extend(ws)
        doc_idx.extend([i] * len(ws))
    di = np.asarray(doc_idx, np.int64)
    u, inv = np.unique(np.asarray(toks, object), return_inverse=True)
    buckets = (md5_prefix_int_of_strings(list(u)) % DSIR_BUCKETS)[inv]
    return di, buckets


def _dsir_counts(sf_dir: str, target_lang: str):
    """ONE distributed pass -> per-bucket (target, raw) token counts. Each
    block's partial is at most DSIR_BUCKETS rows regardless of block size
    (the fixed-width combiner), so the exchange is O(blocks x 4096)."""
    def partial(batch: pa.Table) -> pa.Table:
        di, buckets = _dsir_explode(batch)
        is_t = np.asarray(
            pc.equal(batch["lang"], target_lang).to_numpy(
                zero_copy_only=False))[di]
        ct = np.bincount(buckets[is_t], minlength=DSIR_BUCKETS)
        cr = np.bincount(buckets[~is_t], minlength=DSIR_BUCKETS)
        nz = np.flatnonzero(ct | cr)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "ct": pa.array(ct[nz], pa.int64()),
                         "cr": pa.array(cr[nz], pa.int64())})

    from ray.data.aggregate import Sum

    rows = (_docs(sf_dir, ["doc_id", "lang", "text"])
            .map_batches(partial, batch_format="pyarrow", batch_size=2048)
            .groupby("bucket")
            .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
            .take_all())  # <= DSIR_BUCKETS rows
    ct = np.zeros(DSIR_BUCKETS, np.int64)
    cr = np.zeros(DSIR_BUCKETS, np.int64)
    for r in rows:
        ct[int(r["bucket"])] = int(r["ct"])
        cr[int(r["bucket"])] = int(r["cr"])
    return ct, cr


class _DsirScore:
    """Stateful scorer: the 32 KiB log-ratio table ships once per actor;
    each batch is one explode + one np.add.at scatter."""

    def __init__(self, lam_ref):
        self.lam = ray.get(lam_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "dsir_logw": pa.array([], pa.float64())})
        di, buckets = _dsir_explode(batch)
        w = np.zeros(batch.num_rows, np.float64)
        np.add.at(w, di, self.lam[buckets])
        n = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "n_tokens": pa.array(n),
                         "dsir_logw": pa.array(np.round(w, 6))})


def dsir_weights(sf_dir: str,
                 target_lang: str = DSIR_TARGET_LANG) -> ray.data.Dataset:
    """K17 — DSIR (Data Selection with Importance Resampling, Xie et al.
    2023, arXiv:2302.03169): per-document log importance weight under
    hashed-unigram bag-of-words LMs of a TARGET distribution (here: the
    corpus's `target_lang` slice) vs the RAW distribution (the rest).
    Downstream, `k9_budget_select`-style selection or Gumbel-top-k over
    `dsir_logw` resamples a target-like training subset.

    Scale shape: the feature space is FIXED at DSIR_BUCKETS hashed
    unigrams, so pass 1's exchange is a fixed-width combiner (<= 4096 rows
    per block) into one tiny groupby, the smoothed log-ratio table is a
    32 KiB ray.put broadcast, and pass 2 streams with a per-actor scatter —
    driver state and network cost are corpus-size-independent. Laplace
    (+1) smoothing keeps unseen buckets finite on both sides of the
    ratio."""
    ct, cr = _dsir_counts(sf_dir, target_lang)
    t, r = int(ct.sum()), int(cr.sum())
    lam = (np.log((ct + 1.0) / (t + float(DSIR_BUCKETS)))
           - np.log((cr + 1.0) / (r + float(DSIR_BUCKETS))))
    lam_ref = ray.put(lam)
    return _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        _DsirScore, fn_constructor_args=(lam_ref,),
        batch_format="pyarrow", batch_size=2048,
        concurrency=(1, pool_cap(8)))


SQL["k17_dsir_weights"] = f"""
WITH bk AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents)),
cnts AS (
  SELECT bucket,
         count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS ct,
         count(*) FILTER (WHERE lang <> '{DSIR_TARGET_LANG}') AS cr
  FROM bk GROUP BY bucket),
tot AS (SELECT sum(ct) AS t, sum(cr) AS r FROM cnts),
lam AS (SELECT bucket,
               ln((ct + 1.0) / (t + {DSIR_BUCKETS}.0))
             - ln((cr + 1.0) / (r + {DSIR_BUCKETS}.0)) AS l
        FROM cnts, tot)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(l.l), 6) AS dsir_logw
FROM bk b JOIN lam l USING (bucket)
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


# ---------------------- temperature-based source mixing (mC4 / XLM-R)

MIX_ALPHA = 0.5  # sampling temperature: p_i^alpha, alpha<1 flattens the mix


def temperature_mix(sf_dir: str, alpha: float = MIX_ALPHA
                    ) -> ray.data.Dataset:
    """K18 -> (doc_id, source): deterministic temperature-resampled corpus
    mix (Conneau et al. 2020 / mC4): source i's target share is
    q_i = c_i^alpha / sum_j c_j^alpha, so alpha < 1 down-samples dominant
    sources and flattens toward the tail. Keep fraction per source is
    min(1, N*q_i / c_i) — capped at 1 because a without-replacement filter
    cannot upsample (tail sources keep everything; their extra weight is
    applied at training time via k12-style weighted sampling).

    Scale shape: one tiny per-source count aggregate, rates broadcast in
    the task closure, then a pure per-batch md5-fraction filter — no
    shuffle, no RNG state, idempotent on resume (k10's machinery with a
    temperature-shaped target)."""
    counts = {r["source"]: int(r["count()"])
              for r in _docs(sf_dir, ["source"])
              .groupby("source").count().take_all()}
    if not counts:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string())}))
    n = sum(counts.values())
    z = sum(c ** alpha for c in sorted(counts.values()))
    # operation order mirrors the SQL expression exactly
    rates = {s: min(1.0, (n * (c ** alpha) / z) / c)
             for s, c in counts.items()}

    def _keep(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hex_of_ints, md5_prefix_int

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        srcs = batch["source"].to_pylist()
        frac = md5_prefix_int(md5_hex_of_ints(ids)).astype(
            np.float64) / 2**32
        rate = np.fromiter((rates[s] for s in srcs), dtype=np.float64,
                           count=ids.size)
        return batch.filter(pa.array(frac < rate))

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        _keep, batch_format="pyarrow", batch_size=8192)


SQL["k18_temperature_mix"] = f"""
WITH sc AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
tot AS (SELECT sum(c) AS n, sum(pow(c, {MIX_ALPHA})) AS z FROM sc)
SELECT d.doc_id, d.source
FROM documents d JOIN sc USING (source), tot
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0
      < least(1.0, (tot.n * pow(sc.c, {MIX_ALPHA}) / tot.z) / sc.c)
"""


# ------------------------- overlapping text chunking (embedding prep)

CHUNK_WORDS = 64   # window size in whitespace words
CHUNK_STRIDE = 48  # overlap = CHUNK_WORDS - CHUNK_STRIDE


def text_chunks(sf_dir: str, window: int = CHUNK_WORDS,
                stride: int = CHUNK_STRIDE) -> ray.data.Dataset:
    """M27 -> (doc_id, chunk_id, n_words, chunk): fixed-size overlapping
    word windows per document — the chunking step ahead of embedding /
    retrieval indexing (window tokens, window-stride overlap so no span is
    split across a boundary unseen). Chunk k covers words
    [k*stride, k*stride + window); k ranges over ceil(n_words / stride)
    windows so every word appears in >= 1 chunk.

    Scale shape: pure per-batch flat-map (polars int_ranges explode +
    list.slice), zero shuffle, output streams block by block; chunk
    identity is (doc_id, chunk_id) so a downstream embedding stage can
    resume per chunk. Tokenization is text.split(' ') — bit-compatible
    with the DuckDB oracle's string_split."""
    def _chunks(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(batch)
              .with_columns(ws=pl.col("text").str.split(" "))
              .with_columns(n=pl.col("ws").list.len().cast(pl.Int64))
              .with_columns(nk=(pl.col("n") + stride - 1) // stride)
              .with_columns(chunk_id=pl.int_ranges(0, pl.col("nk")))
              .explode("chunk_id")
              .with_columns(
                  sl=pl.col("ws").list.slice(
                      pl.col("chunk_id") * stride, window))
              .select(
                  pl.col("doc_id"),
                  pl.col("chunk_id").cast(pl.Int64),
                  pl.col("sl").list.len().cast(pl.Int64).alias("n_words"),
                  pl.col("sl").list.join(" ").alias("chunk")))
        return df.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("chunk_id", pa.int64()),
            ("n_words", pa.int64()), ("chunk", pa.string())]))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _chunks, batch_format="pyarrow", batch_size=2048)


SQL["m27_text_chunks"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), n AS (
  SELECT doc_id, ws, len(ws) AS n FROM t
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(len(list_slice(ws, k * {CHUNK_STRIDE} + 1,
                           k * {CHUNK_STRIDE} + {CHUNK_WORDS}))
            AS BIGINT) AS n_words,
       array_to_string(list_slice(ws, k * {CHUNK_STRIDE} + 1,
                                  k * {CHUNK_STRIDE} + {CHUNK_WORDS}),
                       ' ') AS chunk
FROM n, unnest(range(0, (n + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}))
     AS u(k)
ORDER BY doc_id, chunk_id
"""


# ---------------------------------- Naive-Bayes quality classifier (m30)

# The classifier-based quality filter webtext pipelines train on a cheap
# rule label and apply corpus-wide (the CCNet / GPT-3 "quality classifier"
# stage, there a fastText/LR model; here multinomial Naive Bayes, whose
# training IS a count aggregate and is therefore SQL-verifiable end to
# end). Labels come from the shared Gopher rule set (corpus_stats.
# gopher_with_verdict — the ONE implementation m26 and curate use), so
# the model learns to imitate the rules from token evidence alone; its
# log-odds is a graded quality score where the rules only gave a verdict.
NB_MIN_COUNT = 5  # kept-vocab bound, same convention as LM_MIN_COUNT

# sentinel word for per-batch doc-class counts: _WORD_RE tokens are
# non-empty, so "" can never collide with a real word
_NB_DOCROW = ""


def _nb_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: gopher-label the batch, explode words, emit
    (word, cp, cf) partial counts plus one sentinel row carrying the
    batch's (docs_pass, docs_fail). The downstream groupby is vocab-sized,
    never corpus-sized."""
    import polars as pl

    from .corpus_stats import gopher_with_verdict

    df = gopher_with_verdict(pl.from_arrow(batch))
    lab = df["passes_gopher"].to_numpy()
    e = (df.select(["ws", "passes_gopher"]).explode("ws")
         .filter(pl.col("ws").is_not_null()))
    words = e["ws"].to_numpy()
    wlab = e["passes_gopher"].to_numpy()
    u, inv = np.unique(words, return_inverse=True)
    cp = np.zeros(u.size, np.int64)
    cf = np.zeros(u.size, np.int64)
    np.add.at(cp, inv[wlab], 1)
    np.add.at(cf, inv[~wlab], 1)
    return pa.table({
        "word": pa.array(np.concatenate([u, [_NB_DOCROW]]), pa.string()),
        "cp": pa.array(np.concatenate(
            [cp, [int(lab.sum())]]), pa.int64()),
        "cf": pa.array(np.concatenate(
            [cf, [int((~lab).sum())]]), pa.int64()),
    })


def _nb_model(sf_dir: str, min_count: int):
    """Distributed (word, class) counts -> the bounded broadcast model:
    kept vocab (cp+cf >= min_count) with per-word log-odds deltas, one
    aggregate OOV pseudo-word per class for the tail (m23's bounded-vocab
    shape: the broadcast table is capped regardless of corpus size), the
    per-token length penalty and the add-1-smoothed class prior."""
    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(_nb_count_partial, batch_format="pyarrow",
                     batch_size=4096)
        .groupby("word").sum(["cp", "cf"])
        .materialize()  # consumed twice: totals + kept filter
    )
    n_pass = int(counts.sum("sum(cp)") or 0)
    n_fail = int(counts.sum("sum(cf)") or 0)

    def _keep(batch: pa.Table) -> pa.Table:
        cp = batch["sum(cp)"].to_numpy(zero_copy_only=False)
        cf = batch["sum(cf)"].to_numpy(zero_copy_only=False)
        w = batch["word"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(
            (cp + cf >= min_count) | (w == _NB_DOCROW)))

    kept = [(r["word"], int(r["sum(cp)"]), int(r["sum(cf)"]))
            for r in counts.map_batches(
                _keep, batch_format="pyarrow").take_all()]
    kept.sort()
    d_pass = d_fail = 0
    if kept and kept[0][0] == _NB_DOCROW:  # sentinel sorts first
        _, d_pass, d_fail = kept.pop(0)
    n_pass -= d_pass  # sentinel rows rode the same groupby
    n_fail -= d_fail
    vocab = np.array([w for w, _, _ in kept], dtype=object)
    cp = np.array([a for _, a, _ in kept], dtype=np.int64)
    cf = np.array([b for _, _, b in kept], dtype=np.int64)
    v = vocab.size + 1  # + the OOV pseudo-word
    o_pass = n_pass - int(cp.sum())
    o_fail = n_fail - int(cf.sum())
    delta = np.log(cp + 1.0) - np.log(cf + 1.0)
    oov_delta = float(np.log(o_pass + 1.0) - np.log(o_fail + 1.0))
    per_tok = float(np.log(n_fail + v) - np.log(n_pass + v))
    prior = float(np.log(d_pass + 1.0) - np.log(d_fail + 1.0))
    return vocab, delta, oov_delta, per_tok, prior


class _NbScore:
    """Per-batch local scorer: explode -> sorted-vocab searchsorted ->
    per-doc log-odds sum. No shuffle; model via ray.put."""

    def __init__(self, model_ref):
        (self.vocab, self.delta, self.oov_delta, self.per_tok,
         self.prior) = (ray.get(model_ref)
                        if isinstance(model_ref, ray.ObjectRef)
                        else model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        e = (pl.from_arrow(batch)
             .with_columns(wd=pl.col("text").str.extract_all(_WORD_RE))
             .select(["doc_id", "wd"]).explode("wd")
             .filter(pl.col("wd").is_not_null()))
        if e.height == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "log_odds": pa.array([], pa.float64()),
                             "nb_pass": pa.array([], pa.bool_())})
        words = e["wd"].to_numpy()
        doc_ids = e["doc_id"].to_numpy()
        if self.vocab.size:
            idx = np.searchsorted(self.vocab, words)
            idx_c = np.minimum(idx, self.vocab.size - 1)
            match = self.vocab[idx_c] == words
            d = np.where(match, self.delta[idx_c], self.oov_delta)
        else:
            d = np.full(words.size, self.oov_delta, dtype=np.float64)
        uniq, inv = np.unique(doc_ids, return_inverse=True)
        sums = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(sums, inv, d)
        n_tok = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        lo = np.round(sums + n_tok * self.per_tok + self.prior, 6)
        return pa.table({
            "doc_id": pa.array(uniq.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "log_odds": pa.array(lo, pa.float64()),
            # decided on the ROUNDED value so Ray and SQL agree exactly
            "nb_pass": pa.array(lo > 0.0),
        })


def nb_quality(sf_dir: str,
               min_count: int = NB_MIN_COUNT) -> ray.data.Dataset:
    """M30 -> (doc_id, n_tokens, log_odds, nb_pass): multinomial
    Naive-Bayes quality score per document, trained on the corpus's own
    Gopher verdicts. p(w|c) = (c(w,c)+1)/(N_c+V) over the kept vocab + one
    OOV pseudo-word per class; log_odds = sum_w [ln(c_p+1)-ln(c_f+1)]
    + n_d*(ln(N_f+V)-ln(N_p+V)) + ln((D_p+1)/(D_f+1)). Train is ONE
    vocab-sized groupby over per-batch combiner partials; score is a
    broadcast-model local pass (zero shuffle). Docs with zero words emit
    no row (matches the SQL join)."""
    model_ref = ray.put(_nb_model(sf_dir, min_count))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _NbScore, fn_constructor_args=(model_ref,),
        batch_format="pyarrow", batch_size=2048,
        concurrency=(1, pool_cap(8)),
    )


from .corpus_stats import SQL as _STATS_SQL  # noqa: E402 (m26 label CTE)

SQL["m30_nb_quality"] = f"""
WITH lab AS (
  SELECT doc_id, passes_gopher FROM ({_STATS_SQL["m26_gopher_rules"]})
), w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '{WS_REGEX}'),
                            x -> x <> '')) AS wd
  FROM documents
), lw AS (
  SELECT w.doc_id, wd, passes_gopher FROM w JOIN lab USING (doc_id)
), uc AS (
  SELECT wd,
         CAST(sum(CASE WHEN passes_gopher THEN 1 ELSE 0 END) AS BIGINT)
             AS cp,
         CAST(sum(CASE WHEN passes_gopher THEN 0 ELSE 1 END) AS BIGINT)
             AS cf
  FROM lw GROUP BY wd
), tot AS (
  SELECT sum(cp) AS npass, sum(cf) AS nfail FROM uc
), kept AS (
  SELECT wd, cp, cf FROM uc WHERE cp + cf >= {NB_MIN_COUNT}
), kv AS (
  SELECT count(*) + 1 AS v,
         COALESCE(sum(cp), 0) AS kpass,
         COALESCE(sum(cf), 0) AS kfail
  FROM kept
), oov AS (
  SELECT tot.npass - kv.kpass AS opass, tot.nfail - kv.kfail AS ofail
  FROM tot, kv
), dc AS (
  SELECT sum(CASE WHEN passes_gopher THEN 1 ELSE 0 END) AS dpass,
         sum(CASE WHEN passes_gopher THEN 0 ELSE 1 END) AS dfail
  FROM lab
)
SELECT lw.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(ln(COALESCE(kept.cp, oov.opass) + 1.0)
                 - ln(COALESCE(kept.cf, oov.ofail) + 1.0))
             + count(*) * (ln(tot.nfail + kv.v) - ln(tot.npass + kv.v))
             + ln(dc.dpass + 1.0) - ln(dc.dfail + 1.0), 6) AS log_odds,
       round(sum(ln(COALESCE(kept.cp, oov.opass) + 1.0)
                 - ln(COALESCE(kept.cf, oov.ofail) + 1.0))
             + count(*) * (ln(tot.nfail + kv.v) - ln(tot.npass + kv.v))
             + ln(dc.dpass + 1.0) - ln(dc.dfail + 1.0), 6) > 0.0
           AS nb_pass
FROM lw LEFT JOIN kept USING (wd), tot, kv, oov, dc
GROUP BY lw.doc_id, tot.npass, tot.nfail, kv.v, dc.dpass, dc.dfail
"""
