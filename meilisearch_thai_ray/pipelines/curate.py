"""End-to-end training-data curation pipeline.

The composite a 100-TB pretraining-corpus build actually runs, staged the
way each filter is cheapest:

  1. QUALITY  — per-batch vectorized repetition/length signals (zero
     shuffle): drop docs with < MIN_WORDS words or a duplicate-word
     fraction above MAX_DUP_FRAC (Gopher-style repetition gate).
  2. EXACT DEDUP — md5(text) hash-partitioned groupby; the lowest doc_id
     of each identical-text group survives. Uniform hash keys, no skew.
  3. NEAR-DUP — exact word-3-gram Jaccard pairs over the SURVIVORS
     (pipelines/dedup_pipelines.jaccard_pairs_ds, the blocked all-pairs
     join); any doc that is the HIGHER id of a pair >= JACCARD_THR is
     dropped. The rule "drop every b of a qualifying (a < b) pair" is
     order-free and deterministic (no clustering tie-breaks), and it is
     what the SQL oracle states. At 100 TB the pair stage swaps to the
     MinHash-LSH sketch (same drop rule over verified pairs) — the exact
     join here keeps the driver gate zero-recall-loss verifiable.
  4. OUTPUT — the curated (doc_id, lang, n_chars) set, or
     curate_to_parquet() for a resumable lang-partitioned parquet sink.

Reference analog: the reference's ingest applies per-document validation
and skips duplicates/failures before indexing
(src/meilisearch_integration/document_processor.py:25-57, 319-343); this
pipeline is that gate generalized to corpus curation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sources.documents import read_parquet_clean
from ..stages.similarity_join import WS_REGEX
from .dedup_pipelines import jaccard_pairs_ds

SQL: dict[str, str] = {}

MIN_WORDS = 20
MAX_DUP_FRAC = 0.7
JACCARD_THR = 0.6

# near_dup="auto" switch point: the exact blocked all-pairs join compares
# O(P(P+1)/2) block pairs — zero recall loss and FASTER than the sketch up
# to a few tens of thousands of docs (BASELINE.md round-2: 5k docs exact
# 8-10s vs minhash verify 14-18s on the self-similar bench corpus), but
# quadratic beyond. Above this many survivors, auto swaps to MinHash-LSH
# (linear sketch + one sort, same drop rule over verified pairs).
EXACT_NEAR_DUP_MAX_DOCS = 20_000

_WORD_RE = f"[^{WS_REGEX[1:-2]}]+"


def _quality_filter(batch: pa.Table) -> pa.Table:
    """Stage 1: vectorized repetition gate. The comparison is done on the
    UNROUNDED fraction, exactly like the SQL oracle's WHERE clause."""
    import polars as pl

    df = pl.from_arrow(batch).with_columns(
        ws=pl.col("text").str.extract_all(_WORD_RE)
    ).with_columns(
        wc=pl.col("ws").list.len().cast(pl.Int64),
        du=pl.col("ws").list.n_unique().cast(pl.Int64),
    )
    kept = df.filter(
        (pl.col("wc") >= MIN_WORDS)
        & (1.0 - pl.col("du") / pl.col("wc") <= MAX_DUP_FRAC)
    )
    return kept.select(["doc_id", "lang", "n_chars", "text"]).to_arrow()


def _gopher_gate(batch: pa.Table) -> pa.Table:
    """Stage-1 alternative: the m26 Gopher rule verdict as a FILTER — the
    exact same polars expression tree as the scoring surface
    (corpus_stats.gopher_with_verdict), so gate and report can never
    drift."""
    import polars as pl

    from .corpus_stats import gopher_with_verdict

    df = gopher_with_verdict(pl.from_arrow(batch))
    return (df.filter(pl.col("passes_gopher"))
            .select(["doc_id", "lang", "n_chars", "text"]).to_arrow())


def _hash_keys(batch: pa.Table) -> pa.Table:
    """(doc_id, h) only — the dedup exchange carries 40 B/row, never
    text. The verdict comes back as loser ids (stages/runs.py:
    anti_id_filter) and the payload is filtered IN PLACE."""
    import hashlib

    h = [hashlib.md5(t.encode()).hexdigest()
         for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                     "h": pa.array(h, pa.string())})


def curated_docs(sf_dir: str, n_blocks: int | None = None,
                 mode: str = "pairwise_b", near_dup: str = "auto",
                 quality: str = "simple"):
    """D7: the curated corpus — (doc_id, lang, n_chars) after the quality
    gate, exact dedup, and near-dup drop. See module docstring for the
    staging.

    mode="pairwise_b" drops the larger doc of every qualifying pair;
    mode="cluster_canonical" runs distributed connected components over the
    pair graph and keeps exactly the minimum doc_id per cluster (d7b).

    near_dup picks the pair stage — this is the 100-TB swap point, LIVE,
    not just documented:
      "auto" (default): scale-aware — "exact" while the survivor count is
                 <= EXACT_NEAR_DUP_MAX_DOCS (the driver-gate corpus sizes,
                 zero recall loss), "minhash" above it (the O(n^2) join
                 must never be the silent default at corpus scale; r3
                 verdict #6). The decision is logged.
      "exact":   blocked all-pairs word-3-gram Jaccard join (zero recall
                 loss, O(n^2/blocks) compare work — the driver-gate /
                 verification path; what SQL["d7_curate"] states).
      "minhash": MinHash-LSH candidates + distributed exact verify
                 (dedup_pipelines.minhash_pairs_ds) — linear sketch work +
                 one sort; the survivor set is staged to parquet so the
                 verify stage's filtered text reads have a source. Gram
                 domain is char-5-gram Jaccard (the sketch family's),
                 so the pair set approximates-from-below the exact mode's;
                 the planted-dup test asserts both modes drop the plants.

    quality picks the stage-1 gate (also a live swap point):
      "simple": the word-count + repetition-fraction gate (d7's oracle).
      "gopher": the full m26 Gopher rule set (corpus_stats.
                gopher_with_verdict — ONE shared implementation with the
                scoring surface; what SQL["d7d_curate_gopher"] states)."""
    import os

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars", "text"],
    )
    from ..stages.runs import anti_id_filter, keep_first_per_run

    gate = {"simple": _quality_filter,
            "gopher": _gopher_gate}[quality]
    filtered = ds.map_batches(gate, batch_format="pyarrow",
                              batch_size=4096).materialize()
    # exact dedup without moving text: ONE sort over (doc_id, h) rows,
    # losers = every non-first row of a hash run, payload filtered in
    # place by id membership (broadcast / side-parquet swap inside
    # anti_id_filter)
    keys = (filtered.map_batches(_hash_keys, batch_format="pyarrow",
                                 batch_size=4096)
            .sort(["h", "doc_id"]).materialize())
    losers = keep_first_per_run(keys, ["h"], ["h", "doc_id"],
                                invert=True).select_columns(["doc_id"])
    survivors = anti_id_filter(filtered, losers).materialize()
    # materialized: reused twice (pair join input + final filter)
    if near_dup == "auto":
        n_surv = survivors.count()
        near_dup = ("exact" if n_surv <= EXACT_NEAR_DUP_MAX_DOCS
                    else "minhash")
        import logging

        logging.getLogger(__name__).info(
            "curated_docs near_dup=auto: %d survivors -> %s "
            "(threshold %d)", n_surv, near_dup, EXACT_NEAR_DUP_MAX_DOCS)
    if near_dup == "minhash":
        import tempfile

        from .dedup_pipelines import minhash_pairs_ds

        tmp = tempfile.mkdtemp(prefix="curate_mh_", dir="/tmp")
        surv_txt = survivors.select_columns(["doc_id", "text"]).materialize()
        surv_txt.write_parquet(tmp)
        pairs = minhash_pairs_ds(surv_txt, tmp, threshold=JACCARD_THR)
    elif near_dup == "exact":
        if n_blocks is None:
            # same block sizing as _auto_blocks: ~750 rows/block balances
            # task granularity against per-actor block loads (BASELINE.md)
            n_blocks = int(max(4, min(32, -(-survivors.count() // 750))))
        pairs = jaccard_pairs_ds(
            survivors.select_columns(["doc_id", "text"]),
            threshold=JACCARD_THR, n=3, n_blocks=n_blocks,
        )
    else:
        raise ValueError(f"unknown near-dup stage: {near_dup!r}")
    # pairs are tiny by definition; a sorted array broadcast in the task
    # closure beats per-batch set conversion
    if pairs.num_rows == 0:
        drop = np.empty(0, dtype=np.int64)
    elif mode == "cluster_canonical":
        # distributed connected components over the pair graph: keep the
        # MINIMUM doc_id per near-dup cluster, drop every other member.
        # Stricter than pairwise-b (a member whose only edges point at
        # larger ids survives pairwise-b but not this) and exactly one
        # survivor per cluster — the canonical form of published
        # web-curation dedup stages.
        from ..stages.graph import connected_components

        edges = ray.data.from_arrow(
            pairs.select(["a", "b"]).rename_columns(["u", "v"]))
        cc = pa.concat_tables(
            ray.get(connected_components(edges).to_arrow_refs()))
        ids = cc["doc_id"].to_numpy(zero_copy_only=False)
        comp = cc["component"].to_numpy(zero_copy_only=False)
        drop = np.unique(ids[ids != comp])
    elif mode == "pairwise_b":
        drop = np.unique(pairs["b"].to_numpy(zero_copy_only=False))
    else:
        raise ValueError(f"unknown near-dup drop mode: {mode!r}")

    def _final(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, drop) if drop.size else \
            np.ones(ids.size, dtype=bool)
        return batch.filter(pa.array(keep)).select(
            ["doc_id", "lang", "n_chars"])

    return survivors.map_batches(_final, batch_format="pyarrow",
                                 batch_size=8192)


def curate_to_parquet(sf_dir: str, out_dir: str,
                      n_blocks: int | None = None) -> dict:
    """Write the curated set as lang-partitioned parquet (one directory
    per lang — the resumable layout: a re-run can skip finished
    partitions). Returns {"rows": n, "out_dir": out_dir}."""
    ds = curated_docs(sf_dir, n_blocks=n_blocks)
    ds = ds.materialize()
    ds.write_parquet(out_dir, partition_cols=["lang"])
    return {"rows": ds.count(), "out_dir": out_dir}


SQL["d7_curate"] = f"""
WITH q AS (
  SELECT doc_id, lang, n_chars, text,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws
  FROM documents
),
f AS (
  SELECT doc_id, lang, n_chars, text, ws FROM q
  WHERE len(ws) >= {MIN_WORDS}
    AND 1 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)
        <= {MAX_DUP_FRAC}
),
d AS (
  SELECT f.* FROM f
  JOIN (SELECT md5(text) AS h, min(doc_id) AS mid FROM f GROUP BY md5(text))
       m ON md5(f.text) = m.h AND f.doc_id = m.mid
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM d
),
p AS (
  SELECT b.doc_id AS b FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_THR}
)
SELECT doc_id, lang, n_chars FROM d
WHERE doc_id NOT IN (SELECT b FROM p)
"""


# d7b: identical staging, but the near-dup drop keeps exactly one doc (the
# minimum id) per connected component of the pair graph — the oracle walks
# the graph with a recursive CTE, the pipeline with stages/graph.py's
# distributed small-star/large-star.
SQL["d7b_curate_cc"] = f"""
WITH RECURSIVE q AS (
  SELECT doc_id, lang, n_chars, text,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws
  FROM documents
),
f AS (
  SELECT doc_id, lang, n_chars, text, ws FROM q
  WHERE len(ws) >= {MIN_WORDS}
    AND 1 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)
        <= {MAX_DUP_FRAC}
),
d AS (
  SELECT f.* FROM f
  JOIN (SELECT md5(text) AS h, min(doc_id) AS mid FROM f GROUP BY md5(text))
       m ON md5(f.text) = m.h AND f.doc_id = m.mid
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM d
),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_THR}
),
e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
walk(u, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT e.u, w2.comp FROM e JOIN walk w2 ON e.v = w2.u
),
cc AS (SELECT u AS doc_id, min(comp) AS component FROM walk GROUP BY u)
SELECT d.doc_id, d.lang, d.n_chars FROM d
LEFT JOIN cc ON d.doc_id = cc.doc_id
WHERE cc.doc_id IS NULL OR cc.component = cc.doc_id
"""


def _d7d_sql() -> str:
    """d7 with the stage-1 gate swapped for the m26 Gopher predicate —
    constants imported from corpus_stats so the two oracles share ONE rule
    set (deferred to call time to keep module imports acyclic)."""
    from .corpus_stats import (
        _ALPHA_RE,
        _BULLET_RE,
        _ELLIPSIS_RE,
        _GOPHER_STOPS_SQL,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )

    return f"""
WITH w AS (
  SELECT doc_id, lang, n_chars, text,
         list_filter(string_split_regex(text, '{WS_REGEX}'),
                     x -> x <> '') AS ws,
         string_split(text, chr(10)) AS lines,
         length(regexp_replace(text, '{WS_REGEX}', '', 'g')) AS nonws,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS symbol_cnt
  FROM documents
), c AS (
  SELECT doc_id, lang, n_chars, text, ws, nonws, symbol_cnt,
         CAST(len(ws) AS BIGINT) AS word_count,
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
), f AS (
  SELECT doc_id, lang, n_chars, text, ws FROM c
  WHERE word_count >= {GOPHER_MIN_WORDS}
    AND word_count <= {GOPHER_MAX_WORDS}
    AND nonws >= {GOPHER_MIN_MEAN_WORD_LEN} * word_count
    AND nonws <= {GOPHER_MAX_MEAN_WORD_LEN} * word_count
    AND symbol_cnt * 10 < word_count
    AND bullet_lines * 10 < 9 * n_lines
    AND ellipsis_lines * 10 < 3 * n_lines
    AND alpha_words * 5 > 4 * word_count
    AND stop_hits >= 2
), d AS (
  SELECT f.* FROM f
  JOIN (SELECT md5(text) AS h, min(doc_id) AS mid FROM f GROUP BY md5(text))
       m ON md5(f.text) = m.h AND f.doc_id = m.mid
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM d
), p AS (
  SELECT b.doc_id AS b FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_THR}
)
SELECT doc_id, lang, n_chars FROM d
WHERE doc_id NOT IN (SELECT b FROM p)
"""


SQL["d7d_curate_gopher"] = _d7d_sql()
