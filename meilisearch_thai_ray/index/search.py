"""Query engine: shard reader + BM25 top-k (exhaustive and block-max WAND).

Scoring is Lucene-style BM25 (k1=1.2, b=0.75; kernel/bm25.py). Guarantees:

  * rank identity with the single-node oracle: scores accumulate per document
    term-at-a-time in sorted-term order on BOTH sides (np.add.at adds in array
    order), and every float64 expression mirrors the kernel's operation order —
    scores are bit-identical, ties broken by (-score, doc_id);
  * block-max WAND (score_topk(mode="wand")) prunes with per-block
    idf-independent upper bounds (idf * block_max_tfn) and returns EXACTLY the
    exhaustive top-k (asserted in tests) — per-doc evaluation also sums in
    sorted-term order;
  * salted segments of one term are doc-disjoint (doc_id % num_salts), so
    total df = sum of segment dfs, and per-term posting traversal concatenates
    segments in salt order.

Reference query-side semantics (variants/boosts, search_proxy/services/*) are
layered on top in pipelines/search_proxy.py.
"""

from __future__ import annotations

import heapq
import json
import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..kernel.bm25 import idf as _idf
from ..kernel.tokenize import DocumentTokenizer
from .codec import decode_segment, tfn_scores


def _min_window_cost(plists: list[np.ndarray]) -> int:
    """Minimal token window covering one position from EVERY list, minus
    the list count (0 = an adjacent packing exists): sorted merge of
    (position, list_id) + the classic two-pointer covering-window scan."""
    nt = len(plists)
    allpos = np.concatenate(plists)
    tids = np.concatenate(
        [np.full(p.size, ti, np.int64) for ti, p in enumerate(plists)])
    order = np.argsort(allpos, kind="stable")
    allpos, tids = allpos[order], tids[order]
    need = nt
    count = np.zeros(nt, np.int64)
    best = np.iinfo(np.int64).max
    lo = 0
    for hi in range(allpos.size):
        if count[tids[hi]] == 0:
            need -= 1
        count[tids[hi]] += 1
        while need == 0:
            span = allpos[hi] - allpos[lo] + 1
            if span < best:
                best = int(span)
            count[tids[lo]] -= 1
            if count[tids[lo]] == 0:
                need += 1
            lo += 1
    return best - nt


class _Segment:
    __slots__ = ("doc_ids", "tfn", "block_last", "block_max", "n",
                 "tfs", "pos_bin", "pos_flat", "pos_offsets")

    def __init__(self, doc_ids, tfn, block_last, block_max, tfs=None,
                 pos_bin=b""):
        self.doc_ids = doc_ids
        self.tfn = tfn
        self.block_last = block_last
        self.block_max = block_max
        self.n = len(doc_ids)
        self.tfs = tfs
        self.pos_bin = pos_bin  # raw; decoded lazily on first phrase access
        self.pos_flat = None
        self.pos_offsets = None

    def positions_of(self, idx: int) -> np.ndarray | None:
        """Ascending occurrence positions of posting #idx (None if the index
        was built without store_positions)."""
        if self.pos_flat is None:
            if not self.pos_bin:  # pre-decoded (shadow-filtered) or absent
                return None
            from .codec import decode_positions

            self.pos_flat, self.pos_offsets = decode_positions(
                self.pos_bin, self.tfs
            )
        start = self.pos_offsets[idx]
        return self.pos_flat[start : start + int(self.tfs[idx])]


class SearchEngine:
    """Loads a built index directory; serves BM25 top-k.

    Per-shard lazy loading with an LRU-ish cache — at cluster scale one engine
    instance per index-server actor holds only the shards routed to it.
    """

    def __init__(self, index_dir: str, config: EngineConfig | None = None,
                 tokenizer: DocumentTokenizer | None = None,
                 shard_cache_cap: int = 64,
                 salts: set[int] | None = None,
                 avgdl_override: float | None = None,
                 n_docs_override: int | None = None,
                 shadow: "np.ndarray | None" = None):
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        # a ShardServer owning > cap shards must RAISE the cap, or warming
        # its range would evict the shards it just loaded
        self.shard_cache_cap = shard_cache_cap
        # salts != None restricts this engine to a doc partition (salt =
        # doc_id % num_salts): local df is then PARTIAL — scoring must use
        # score_topk_given_idf with globally-summed dfs
        self._salts = salts
        # generational serving (index/incremental.py): shadow = doc_ids
        # superseded by a NEWER generation (filtered out of every segment at
        # decode time), avgdl/n_docs overridden with the COMBINED corpus
        # stats (tfn is computed at load, so overriding avgdl rescales
        # exactly; block metadata is rebuilt from the decoded tfn)
        self._shadow = (
            np.asarray(shadow, dtype=np.uint64) if shadow is not None
            and len(shadow) else None
        )
        self.index_dir = index_dir
        self.k1 = self.meta["k1"]
        self.b = self.meta["b"]
        self.avgdl = (
            avgdl_override if avgdl_override is not None else self.meta["avgdl"]
        )
        self.n_docs = (
            n_docs_override if n_docs_override is not None else self.meta["n_docs"]
        )
        self._stats_overridden = avgdl_override is not None
        self.num_shards = self.meta["num_shards"]
        self.block = self.meta["posting_block"]
        self._shard_cache: dict[int, dict[str, list]] = {}
        self._seg_cache: dict[str, list] = {}  # decoded segments per term
        from .maintenance import load_tombstones

        self._dead: set[int] = load_tombstones(index_dir)
        self._dead_arr = (
            np.fromiter(self._dead, dtype=np.uint64) if self._dead else None
        )
        self._config = config or EngineConfig(
            num_shards=self.num_shards,
            # restore persisted tokenizer settings (settings sink): queries
            # must tokenize the way the corpus was indexed
            separator_tokens=tuple(self.meta.get("separator_tokens", ())),
            non_separator_tokens=tuple(
                self.meta.get("non_separator_tokens", ())),
        )
        self._tokenizer = tokenizer  # built lazily (trie cost)
        self._typo_vocab = None  # (terms, dfs, lens, first) built lazily
        self._typodict_ok: bool | None = None  # typodict phase marker cache
        self._typodict_budget: str = "none"  # "max" | "legacy" | "none"

    # ------------- loading -------------

    def _shard_tables(self, shard: int):
        d = os.path.join(self.index_dir, "shards", f"shard={shard:05d}")
        if not os.path.isdir(d):
            return []
        files = [f for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if self._salts is not None:
            # doc-partitioned serving: this engine owns only these salt files
            # (salt = doc_id % num_salts, so each salt is a doc partition)
            files = [
                f for f in files
                if int(f.split("-")[1].split(".")[0]) in self._salts
            ]
        return [os.path.join(d, f) for f in files]

    def _load_shard(self, shard: int) -> dict[str, list]:
        cached = self._shard_cache.get(shard)
        if cached is not None:
            return cached
        terms: dict[str, list] = {}
        for path in self._shard_tables(shard):
            t = pq.read_table(path)
            has_pos = "pos_bin" in t.column_names  # pre-positional layout
            names = ("term", "n_docs", "docs_bin", "tfs_bin", "dls_bin",
                     "block_last", "block_max")
            cols = {c: t[c].to_pylist() for c in names}
            pos = t["pos_bin"].to_pylist() if has_pos else [b""] * t.num_rows
            for i, term in enumerate(cols["term"]):
                terms.setdefault(term, []).append(
                    (cols["n_docs"][i], cols["docs_bin"][i], cols["tfs_bin"][i],
                     cols["dls_bin"][i], cols["block_last"][i],
                     cols["block_max"][i], pos[i])
                )
        if len(self._shard_cache) > self.shard_cache_cap:
            self._shard_cache.clear()
        self._shard_cache[shard] = terms
        return terms

    def segments(self, term: str) -> list[_Segment]:
        from ..functions.hashing import fnv1a64

        cached = self._seg_cache.get(term)
        if cached is not None:
            return cached
        shard = fnv1a64(term) % self.num_shards
        raw = self._load_shard(shard).get(term)
        if not raw:
            self._seg_cache[term] = []
            return []
        segs = []
        for n_docs, docs_bin, tfs_bin, dls_bin, block_last, block_max, pos_bin in raw:
            doc_ids, tfs, dls = decode_segment(docs_bin, tfs_bin, dls_bin, n_docs)
            keep = None
            if self._shadow is not None:
                keep = ~np.isin(doc_ids, self._shadow)
                if not keep.any():
                    continue
                if keep.all():
                    keep = None
            pos_flat = pos_offsets = None
            if keep is not None and pos_bin:
                # positions decode by tf offsets: filtering tfs would misalign
                # the varint stream, so decode BEFORE filtering, then slice
                from .codec import decode_positions

                flat, offs = decode_positions(pos_bin, tfs)
                kept_idx = np.flatnonzero(keep)
                parts = [flat[offs[i]:offs[i] + int(tfs[i])] for i in kept_idx]
                pos_flat = (np.concatenate(parts) if parts
                            else np.empty(0, np.uint64))
                kc = tfs[kept_idx].astype(np.int64)
                pos_offsets = np.cumsum(kc) - kc
                pos_bin = b""
            if keep is not None:
                doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
            tfn = tfn_scores(tfs, dls, self.avgdl, self.k1, self.b)
            if keep is not None or self._stats_overridden:
                # stored block metadata was computed with the build-time
                # avgdl over the unfiltered postings — rebuild it from the
                # decoded tfn so every upper bound stays valid
                n = doc_ids.size
                starts = np.arange(0, n, self.block)
                block_max_a = np.maximum.reduceat(tfn, starts)
                ends = np.minimum(starts + self.block, n) - 1
                block_last_a = doc_ids[ends].astype(np.int64)
            else:
                block_last_a = np.asarray(block_last, dtype=np.int64)
                block_max_a = np.asarray(block_max, dtype=np.float64)
            seg = _Segment(doc_ids, tfn, block_last_a, block_max_a,
                           tfs=tfs, pos_bin=pos_bin)
            if pos_flat is not None:
                seg.pos_flat, seg.pos_offsets = pos_flat, pos_offsets
            segs.append(seg)
        if len(self._seg_cache) > 100_000:
            self._seg_cache.clear()
        self._seg_cache[term] = segs
        return segs

    def df(self, term: str) -> int:
        return sum(s.n for s in self.segments(term))

    # ------------- query tokenization -------------

    @property
    def tokenizer(self) -> DocumentTokenizer:
        if self._tokenizer is None:
            self._tokenizer = DocumentTokenizer(self._config)
        return self._tokenizer

    def query_terms(self, query: str) -> list[str]:
        tok = self.tokenizer
        return tok.index_terms(tok.tokenize(query))

    # ------------- scoring -------------

    def score_topk(self, terms: list[str], k: int = 10,
                   mode: str = "auto", match: str = "any") -> list[tuple[int, float]]:
        """terms: raw query term list (duplicates = weights). -> [(doc_id, score)]
        sorted by (-score, doc_id).

        mode="auto": exhaustive for small candidate sets (vectorized numpy wins),
        block-max WAND when total postings are large enough that skipping pays.
        Both return identical results (asserted in tests).

        match: "any" (OR, default BM25) or "all" (docs must contain every query
        term — Meilisearch matchingStrategy="all", search_executor.py:731-753)."""
        weights = Counter(terms)
        ordered = sorted(weights)
        loaded = []
        total_postings = 0
        for term in ordered:
            segs = self.segments(term)
            if not segs:
                if match == "all":
                    return []  # a required term is absent from the corpus
                continue
            df = sum(s.n for s in segs)
            total_postings += df
            idf_t = _idf(self.n_docs, df)
            loaded.append((term, float(weights[term]), idf_t, segs))
        if not loaded:
            return []
        # require_all_terms travels as an explicit argument — instance state
        # here would let concurrent queries on a shared engine interleave and
        # apply the wrong AND/OR filtering to each other's results
        require_all = len(loaded) if match == "all" else None
        if match == "all":
            mode = "exhaustive"  # pruning modes use OR upper bounds; AND filters post-hoc
        elif mode == "auto":
            # MEASURED on this engine (BASELINE.md): the python-DAAT WAND
            # loop is 50-100x slower than the vectorized exhaustive path at
            # every corpus size tried — its crossover effectively never
            # happens. The scale path for huge posting lists is the
            # VECTORIZED MaxScore (batch candidate generation from essential
            # terms + gathered exact scoring), which degrades gracefully to
            # ~exhaustive cost when pruning doesn't apply.
            mode = (
                "maxscore"
                if total_postings > 100_000 and len(loaded) > 1
                else "exhaustive"
            )
        if mode == "wand":
            return self._score_wand(loaded, k)
        if mode == "maxscore":
            return self._score_maxscore(loaded, k)
        return self._score_exhaustive(loaded, k, require_all_terms=require_all)

    def score_topk_given_idf(self, weighted_terms: list[tuple[str, float, float]],
                             k: int = 10, match: str = "any"
                             ) -> list[tuple[int, float]]:
        """Exhaustive top-k with CALLER-SUPPLIED idf per term — the scoring
        primitive for doc-partitioned serving, where each actor holds only a
        doc partition and its local dfs are partial (the driver sums local
        dfs into global idfs first). weighted_terms must be sorted by term
        (float-identity depends on sorted-term accumulation order).
        match="all" keeps only docs containing EVERY queried term, like
        score_topk's matchingStrategy (a term absent from this partition
        entirely yields no "all" matches here)."""
        loaded = []
        for term, w, idf_t in weighted_terms:
            segs = self.segments(term)
            if segs:
                loaded.append((term, float(w), float(idf_t), segs))
        if not loaded or (match == "all"
                          and len(loaded) < len(weighted_terms)):
            return []
        return self._score_exhaustive(
            loaded, k,
            require_all_terms=len(loaded) if match == "all" else None)

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        """Per-term df within this engine's (possibly salt-restricted) data."""
        return {t: df for t in terms if (df := self.df(t)) > 0}

    def score_topk_prefix(self, terms: list[str], k: int = 10,
                          max_expansions: int = 10
                          ) -> list[tuple[int, float]]:
        """Search-as-you-type: the LAST term matches as a PREFIX
        (Meilisearch's implicit last-word prefix search while the user is
        still typing). Completions come from the sorted term dictionary,
        df-ranked and capped at max_expansions (ties break by term — the
        same deterministic cap the SQL oracle states). The expansion group
        scores as ONE pseudo-term: each doc takes the MAX BM25 contribution
        among its matching completions (no double counting when a doc
        completes the prefix two ways), each completion keeping its own
        idf; head terms score normally (OR semantics). Falls back to plain
        score_topk when no dictionary is built."""
        if not terms:
            return []
        *head, last = terms
        pref = self._termdict_prefix(last)
        if pref is None:
            return self.score_topk(terms, k=k)
        pref.sort()  # [(-df, term)] -> df desc, term asc
        exps = [t for _negdf, t in pref[:max_expansions]]
        weights = Counter(head)
        loaded = []
        for term in sorted(weights):
            segs = self.segments(term)
            if not segs:
                continue
            df = sum(s.n for s in segs)
            loaded.append((term, float(weights[term]),
                           _idf(self.n_docs, df), segs))
        # head sums (the exhaustive accumulation) ...
        head_ids = head_acc = None
        if loaded:
            id_chunks, contrib_chunks = [], []
            for _t, w, idf_t, segs in loaded:
                for seg in segs:
                    id_chunks.append(seg.doc_ids)
                    contrib_chunks.append(w * (idf_t * seg.tfn))
            all_ids = np.concatenate(id_chunks)
            all_contrib = np.concatenate(contrib_chunks)
            head_ids, inv = np.unique(all_ids, return_inverse=True)
            head_acc = np.zeros(head_ids.size, dtype=np.float64)
            np.add.at(head_acc, inv, all_contrib)
        # ... plus the per-doc MAX over the expansion group
        grp_ids = grp_max = None
        g_id_chunks, g_contrib_chunks = [], []
        for e in exps:
            segs = self.segments(e)
            if not segs:
                continue
            df = sum(s.n for s in segs)
            idf_t = _idf(self.n_docs, df)
            for seg in segs:
                g_id_chunks.append(seg.doc_ids)
                g_contrib_chunks.append(idf_t * seg.tfn)
        if g_id_chunks:
            g_ids = np.concatenate(g_id_chunks)
            g_contrib = np.concatenate(g_contrib_chunks)
            grp_ids, ginv = np.unique(g_ids, return_inverse=True)
            grp_max = np.full(grp_ids.size, -np.inf, dtype=np.float64)
            np.maximum.at(grp_max, ginv, g_contrib)
        if head_ids is None and grp_ids is None:
            return []
        if head_ids is None:
            uniq, acc = grp_ids, grp_max
        elif grp_ids is None:
            uniq, acc = head_ids, head_acc
        else:
            uniq = np.union1d(head_ids, grp_ids)
            acc = np.zeros(uniq.size, dtype=np.float64)
            acc[np.searchsorted(uniq, head_ids)] += head_acc
            acc[np.searchsorted(uniq, grp_ids)] += grp_max
        if self._dead_arr is not None:
            alive = ~np.isin(uniq, self._dead_arr)
            uniq, acc = uniq[alive], acc[alive]
        if uniq.size == 0:
            return []
        if uniq.size <= k:
            order = np.lexsort((uniq, -acc))
        else:
            kth = np.partition(acc, uniq.size - k)[uniq.size - k]
            sel = np.flatnonzero(acc >= kth)
            order = sel[np.lexsort((uniq[sel], -acc[sel]))]
        return [(int(uniq[i]), float(acc[i])) for i in order[:k]]

    def search_matching(self, query: str, k: int = 10,
                        strategy: str = "last",
                        backfill: bool = False) -> list[tuple[int, float]]:
        """Meilisearch matching strategies over our BM25:
        "all" — every term required; "any" — plain OR;
        "last" (Meilisearch default) — require all terms, then progressively
        drop terms from the END of the query until something matches;
        "frequency" (Meilisearch v1.5+) — require all terms, then drop the
        term with the HIGHEST document frequency first (the least
        informative word). Terms absent from the corpus can never satisfy
        the conjunction at any frequency, so they drop first; df ties drop
        the later query position.

        backfill=False (default) stops at the first non-empty conjunction
        (the repo's long-standing approximation, pinned by the oracle
        surface). backfill=True reproduces Meilisearch's full relaxation:
        keep dropping words and ACCUMULATE lower buckets until k hits —
        docs matching more words always rank above docs matching fewer
        (the "words" ranking rule), ties within a bucket by BM25."""
        terms = self.query_terms(query)
        if strategy == "any":
            return self.score_topk(terms, k=k)
        if strategy == "all":
            return self.score_topk(terms, k=k, match="all")

        def next_terms(ts: list[str]) -> list[str]:
            if strategy == "frequency":
                dfs = [self.df(t) for t in ts]
                drop = max(range(len(ts)),
                           key=lambda i: (dfs[i] == 0, dfs[i], i))
                return ts[:drop] + ts[drop + 1:]
            return ts[:-1]

        if not backfill:
            while terms:
                hits = self.score_topk(terms, k=k, match="all")
                if hits:
                    return hits
                terms = next_terms(terms)
            return []
        out: list[tuple[int, float]] = []
        taken: set[int] = set()
        while terms and len(out) < k:
            for d, s in self.score_topk(terms, k=k + len(taken),
                                        match="all"):
                if d not in taken:
                    taken.add(d)
                    out.append((d, s))
                    if len(out) >= k:
                        break
            terms = next_terms(terms)
        return out[:k]

    def _score_exhaustive(self, loaded, k: int, *,
                          require_all_terms: int | None = None
                          ) -> list[tuple[int, float]]:
        id_chunks, contrib_chunks = [], []
        for _term, w, idf_t, segs in loaded:
            for seg in segs:  # salt order; doc-disjoint within the term
                id_chunks.append(seg.doc_ids)
                contrib_chunks.append(w * (idf_t * seg.tfn))
        all_ids = np.concatenate(id_chunks)
        all_contrib = np.concatenate(contrib_chunks)
        # np.add.at accumulates in array order == sorted-term order per doc
        uniq, inv = np.unique(all_ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, all_contrib)
        if require_all_terms is not None:
            # matchingStrategy="all": keep only docs matched by EVERY query
            # term (per-term doc sets are salt-disjoint, so one contribution
            # chunk per term per doc => counting chunks counts terms)
            counts = np.zeros(uniq.size, dtype=np.int32)
            np.add.at(counts, inv, np.ones(all_ids.size, dtype=np.int32))
            keep = counts == require_all_terms
            uniq, acc = uniq[keep], acc[keep]
            if uniq.size == 0:
                return []
        if self._dead_arr is not None:  # tombstoned docs never surface
            alive = ~np.isin(uniq, self._dead_arr)
            uniq, acc = uniq[alive], acc[alive]
            if uniq.size == 0:
                return []
        if uniq.size <= k:
            order = np.lexsort((uniq, -acc))
        else:
            # exact selection under ties: keep every doc scoring >= kth value,
            # then order by (-score, doc_id)
            kth = np.partition(acc, uniq.size - k)[uniq.size - k]
            sel = np.flatnonzero(acc >= kth)
            order = sel[np.lexsort((uniq[sel], -acc[sel]))]
        return [(int(uniq[i]), float(acc[i])) for i in order[:k]]

    def _score_maxscore(self, loaded, k: int) -> list[tuple[int, float]]:
        """Vectorized MaxScore (Turtle & Flood) — the measured scale path.

        1. θ0: a valid LOWER bound on the final kth-best score, from exact
           partial scores over the rarest terms (any doc subset's partial
           scores lower-bound their final scores, so the kth best partial
           lower-bounds the final kth best).
        2. Essential split: sort terms by upper bound (w·idf·max tfn)
           ascending; the maximal prefix whose ub-sum ≤ θ0 is non-essential —
           a doc appearing ONLY in those terms can never reach the top k.
        3. Candidates = union of essential terms' postings; exact scores are
           gathered per term via searchsorted (accumulated in sorted-term
           order ⇒ bit-identical to the exhaustive path, asserted in tests).

        Everything is numpy batch ops — no per-document python loop (the
        block-max WAND DAAT loop measured 50-100x slower than exhaustive)."""
        dfs = np.array([sum(s.n for s in segs) for *_x, segs in loaded],
                       dtype=np.int64)
        ubs = np.array(
            [w * idf_t * max(float(s.block_max.max()) for s in segs if s.n)
             for _t, w, idf_t, segs in loaded],
            dtype=np.float64,
        )
        # --- θ0 from the cheapest covering subset of rare terms ---
        by_df = np.argsort(dfs, kind="stable")
        subset = []
        covered = 0
        for i in by_df:
            subset.append(int(i))
            covered += int(dfs[i])
            if covered >= k:
                break
        theta0 = 0.0
        sub_hits = self._score_exhaustive([loaded[i] for i in sorted(subset)], k)
        if len(sub_hits) >= k:
            theta0 = sub_hits[-1][1]
        # --- essential split by ascending ub ---
        by_ub = np.argsort(ubs, kind="stable")
        cum = 0.0
        non_essential: set[int] = set()
        for i in by_ub:
            # STRICT <: a doc at exactly θ0 may still enter top-k on the
            # doc_id tie-break, so it must never be pruned
            if cum + ubs[i] < theta0:
                cum += ubs[i]
                non_essential.add(int(i))
            else:
                break
        if not non_essential:
            # θ0 pruned nothing: the gather path would only add overhead —
            # degrade to the plain vectorized exhaustive scorer
            return self._score_exhaustive(loaded, k)
        essential = [i for i in range(len(loaded)) if i not in non_essential]
        cand = np.unique(np.concatenate(
            [s.doc_ids for i in essential for s in loaded[i][3]]
        ))
        if self._dead_arr is not None:
            cand = cand[~np.isin(cand, self._dead_arr)]
        if cand.size == 0:
            return []
        # --- exact scoring of candidates, sorted-term order ---
        acc = np.zeros(cand.size, dtype=np.float64)
        for _term, w, idf_t, segs in loaded:  # loaded is sorted-term order
            w_idf = w * idf_t
            for seg in segs:
                idx = np.searchsorted(seg.doc_ids, cand)
                idx_c = np.minimum(idx, seg.n - 1)
                hit = seg.doc_ids[idx_c] == cand
                acc[hit] += w_idf * seg.tfn[idx_c[hit]]
        if cand.size <= k:
            order = np.lexsort((cand, -acc))
        else:
            kth = np.partition(acc, cand.size - k)[cand.size - k]
            sel = np.flatnonzero(acc >= kth)
            order = sel[np.lexsort((cand[sel], -acc[sel]))]
        return [(int(cand[i]), float(acc[i])) for i in order[:k]]

    def _score_wand(self, loaded, k: int) -> list[tuple[int, float]]:
        """Block-max WAND (document-at-a-time with pivoting and block skips).

        Cursor list = one per (term, salt) segment, tagged with its term index
        so full evaluation sums contributions in sorted-term order (float
        identity with the exhaustive path). Pruning uses strict < so ties are
        never dropped; heap replacement respects the (-score, doc_id) order.
        """
        INF = np.uint64(0xFFFFFFFFFFFFFFFF)
        cursors = []  # [pos, seg, ub, w_idf, term_idx]
        for t_idx, (_term, w, idf_t, segs) in enumerate(loaded):
            w_idf = w * idf_t
            for seg in segs:
                if seg.n:
                    cursors.append([0, seg, w_idf * float(seg.block_max.max()),
                                    w_idf, t_idx])
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of k best

        def threshold():
            return heap[0][0] if len(heap) >= k else -1.0

        def cur_doc(c):
            return c[1].doc_ids[c[0]] if c[0] < c[1].n else INF

        while True:
            live = [c for c in cursors if c[0] < c[1].n]
            if not live:
                break
            live.sort(key=cur_doc)
            theta = threshold()
            # pivot: first position where cumulative UB can beat theta
            acc_ub = 0.0
            pivot_i = -1
            for i, c in enumerate(live):
                acc_ub += c[2]
                if acc_ub > theta or (acc_ub == theta and theta >= 0.0):
                    pivot_i = i
                    break
            if pivot_i < 0:
                break  # nothing can enter the heap
            pivot_doc = cur_doc(live[pivot_i])
            if cur_doc(live[0]) == pivot_doc:
                # refine with block maxima before full evaluation
                block_ub = 0.0
                hit = []
                for c in live:
                    if cur_doc(c) != pivot_doc:
                        break
                    seg = c[1]
                    bi = int(np.searchsorted(seg.block_last, np.int64(pivot_doc)))
                    block_ub += c[3] * float(seg.block_max[bi])
                    hit.append(c)
                alive = int(pivot_doc) not in self._dead
                if alive and (block_ub > theta or len(heap) < k or block_ub == theta):
                    hit.sort(key=lambda c: c[4])  # sorted-term order
                    score = 0.0
                    for c in hit:
                        score += c[3] * c[1].tfn[c[0]]
                    self._heap_push(heap, k, score, int(pivot_doc))
                for c in hit:
                    c[0] += 1
            else:
                # advance all cursors before pivot to >= pivot_doc (block skip)
                for c in live[:pivot_i]:
                    seg = c[1]
                    c[0] += int(np.searchsorted(seg.doc_ids[c[0]:], pivot_doc))
        out = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
        return [(doc, float(s)) for s, doc in out]

    @staticmethod
    def _heap_push(heap, k, score, doc_id):
        """Maintain k best by (-score, doc_id): min-heap on (score, -doc_id)."""
        item = (score, -doc_id)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    # ------------- positional phrase search -------------

    @property
    def has_positions(self) -> bool:
        return bool(self.meta.get("store_positions"))

    def _doc_positions(self, term: str, doc_id: int) -> np.ndarray | None:
        """Occurrence positions of `term` in `doc_id` (salt segments are
        doc-disjoint: at most one segment holds the doc)."""
        for seg in self.segments(term):
            i = int(np.searchsorted(seg.doc_ids, np.uint64(doc_id)))
            if i < seg.n and seg.doc_ids[i] == np.uint64(doc_id):
                return seg.positions_of(i)
        return None

    def phrase_topk(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """True token-adjacency phrase search over the positional index
        (Meilisearch-style quoted-phrase semantics): docs where the phrase's
        primary terms occur at CONSECUTIVE token positions, BM25-ranked.

        Needs store_positions=True at build time. Cost: one posting
        intersection (the AND set) + per-candidate position-list
        intersections — no document text is touched, unlike the
        substring-verify fallback in the proxy."""
        if not self.has_positions:
            raise ValueError(
                "index was built without store_positions=True; use the "
                "proxy's substring-verify phrase path instead"
            )
        seq = self.phrase_seq(phrase)
        if not seq:
            return []
        if len(seq) == 1:
            return self.score_topk(seq, k=k, match="all")
        matched = self.phrase_match_docs(seq)
        if not matched:
            return []
        # k covers every AND-matching doc (matched is a subset of them), so
        # this returns the full match="all" score map — same set the
        # original candidate-sized call produced
        scores = dict(
            self.score_topk(seq, k=1 << 62, match="all")
        )
        hits = sorted(
            ((d, scores[d]) for d in matched if d in scores),
            key=lambda x: (-x[1], x[0]),
        )
        return hits[:k]

    def phrase_seq(self, phrase: str) -> list[str]:
        """The phrase's primary term per token position (compound sub-terms
        share their token's position; the primary one defines adjacency)."""
        tok = self.tokenizer
        terms, tpos = tok.index_terms_with_positions(tok.tokenize(phrase))
        seq: list[str] = []
        seen_pos: set[int] = set()
        for t, p in zip(terms, tpos):
            if p not in seen_pos:
                seen_pos.add(p)
                seq.append(t)
        return seq

    def phrase_match_docs(self, seq: list[str]) -> list[int]:
        """Docs (within this engine's possibly salt-restricted partition)
        where `seq` occurs at consecutive token positions: posting-AND
        intersection + position verification. No scoring — the building
        block doc-partitioned serving fans out.

        Vectorized: per phrase slot j, every candidate doc's occurrence
        positions gather in ONE ragged-slice pass per segment (no per-doc
        Python loop — that loop measured 108 ms p50 per phrase query on
        1M docs and was the whole serving-load p95 tail, BASELINE.md r5),
        encoded as (candidate_rank << 21 | pos - j + 1) keys; the phrase
        matches exactly where the sorted key sets of ALL slots intersect.
        Ranks index the sorted candidate array (doc ids themselves are
        64-bit url hashes, too wide to pack). Positions up to 2^21-2 pack
        into the fast keys — far above any real document — and a corpus
        that DOES exceed it (a multi-million-token concatenation) falls
        back to the per-doc verification loop for that query instead of
        failing it (identical results, asserted in tests)."""
        uniq_terms = sorted(set(seq))
        doc_sets = []
        for t in uniq_terms:
            segs = self.segments(t)
            if not segs:
                return []
            doc_sets.append(np.concatenate([s.doc_ids for s in segs]))
        doc_sets.sort(key=len)  # intersect smallest-first
        cand = doc_sets[0]
        for ds_ in doc_sets[1:]:
            cand = cand[np.isin(cand, ds_)]
            if cand.size == 0:
                return []
        if len(seq) >= (1 << 21):
            return self._phrase_match_docs_perdoc(seq, cand)
        POS_BITS = 21
        cand_sorted = np.sort(cand)
        keys: np.ndarray | None = None
        for j, t in enumerate(seq):
            parts = []
            for seg in self.segments(t):
                idx = np.searchsorted(seg.doc_ids, cand)
                idx = np.minimum(idx, max(seg.n - 1, 0))
                hit = seg.doc_ids[idx] == cand
                if not hit.any():
                    continue
                hidx = idx[hit]
                if seg.positions_of(0) is None and seg.n:
                    return []  # built without positions (callers pre-check)
                starts = seg.pos_offsets[hidx].astype(np.int64)
                counts = seg.tfs[hidx].astype(np.int64)
                cum = np.concatenate(([0], np.cumsum(counts)))
                flat = (np.arange(cum[-1], dtype=np.int64)
                        - np.repeat(cum[:-1], counts)
                        + np.repeat(starts, counts))
                pos = seg.pos_flat[flat].astype(np.int64)
                if pos.size and int(pos.max()) >= (1 << POS_BITS) - 1:
                    # a candidate doc too long for the packed keys: verify
                    # per doc (rare; correctness over speed)
                    return self._phrase_match_docs_perdoc(seq, cand)
                ranks_rep = np.repeat(
                    np.searchsorted(cand_sorted,
                                    seg.doc_ids[hidx]).astype(np.int64),
                    counts)
                # slot j of a phrase cannot occur before token position j:
                # earlier occurrences have no valid alignment start, and a
                # negative shift would borrow into the rank field of the key
                ok = pos >= j
                parts.append(((ranks_rep[ok] << POS_BITS)
                              + (pos[ok] - j + 1)))
            if not parts:
                return []
            kj = np.concatenate(parts)
            kj.sort()
            keys = kj if keys is None else keys[
                np.isin(keys, kj, assume_unique=False)]
            if keys.size == 0:
                return []
        matched = cand_sorted[np.unique(keys >> POS_BITS)]
        return [int(d) for d in matched]

    def _phrase_match_docs_perdoc(self, seq: list[str],
                                  cand: np.ndarray) -> list[int]:
        """Per-candidate verification fallback (the pre-r5 loop): used
        when a candidate doc's positions exceed the packed-key range.
        Same results as the vectorized path, sorted by doc_id."""
        matched: list[int] = []
        for d in np.sort(cand).tolist():
            base: np.ndarray | None = None
            for j, t in enumerate(seq):
                pos = self._doc_positions(t, d)
                if pos is None:
                    base = None
                    break
                shifted = pos.astype(np.int64) - j
                base = (shifted if base is None
                        else np.intersect1d(base, shifted))
                if base.size == 0:
                    break
            if base is not None and base.size:
                matched.append(int(d))
        return matched

    def score_docs_given_idf(self, weighted_terms: list[tuple[str, float, float]],
                             doc_ids: list[int]) -> dict[int, float]:
        """BM25 scores for SPECIFIC docs with caller-supplied idfs —
        accumulation follows _score_exhaustive's exact chunk order
        (sorted terms outer, salt segments inner, contribution
        w * (idf * tfn)), so scores are bit-identical to the top-k paths."""
        if not doc_ids:
            return {}
        ids = np.asarray(sorted(doc_ids), np.int64)
        acc = np.zeros(ids.size, np.float64)
        for term, w, idf_t in weighted_terms:
            for seg in self.segments(term):
                pos = np.searchsorted(seg.doc_ids, ids)
                pos_c = np.minimum(pos, max(seg.n - 1, 0))
                hit = (pos < seg.n) & (seg.doc_ids[pos_c] == ids)
                if hit.any():
                    acc[hit] += float(w) * (float(idf_t)
                                            * seg.tfn[pos_c[hit]])
        return {int(d): float(s) for d, s in zip(ids, acc)}

    def proximity_topk(self, terms: list[str], k: int = 10,
                       pool: int | None = None
                       ) -> list[tuple[int, int, float]]:
        """Meilisearch 'proximity' ranking rule over the positional index:
        AND-matching docs bucketed by the MINIMAL token window covering one
        occurrence of every query term, BM25-ranked within buckets. Returns
        [(doc_id, proximity_cost, bm25)] where cost = min_window - n_terms
        (0 = some occurrence of every term packs into adjacent tokens);
        ties break by BM25 desc, doc_id asc.

        Cost: one posting intersection (score_topk pool) + a per-candidate
        sorted-merge sliding window over position lists — document text is
        never read. Needs store_positions=True (ranking_rules 'proximity'
        in Meilisearch is index-default; the reference delegates it to
        Meilisearch wholesale)."""
        if not self.has_positions:
            raise ValueError(
                "index was built without store_positions=True; proximity "
                "ranking needs positional postings")
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            return []
        cand = self.score_topk(uniq, k=pool or max(10 * k, 100),
                               match="all")
        if len(uniq) == 1:
            return [(d, 0, s) for d, s in cand[:k]]
        out: list[tuple[int, int, float]] = []
        for d, score in cand:
            nm, cost = self.proximity_cost(d, uniq)
            if nm == len(uniq):
                out.append((d, cost, score))
        out.sort(key=lambda x: (x[1], -x[2], x[0]))
        return out[:k]

    def proximity_cost(self, doc_id: int,
                       terms: list[str]) -> tuple[int, int]:
        """-> (n_matched_terms, proximity_cost) for one doc: the minimal
        token window covering one occurrence of every MATCHED term, minus
        the matched-term count (0 = adjacent packing). Docs matching fewer
        terms are ranked by Meilisearch's 'words' rule first — callers
        bucket by (-n_matched, cost). n_matched < 2 => cost 0."""
        plists = []
        for t in dict.fromkeys(terms):
            pos = self._doc_positions(t, doc_id)
            if pos is not None and pos.size:
                plists.append(pos.astype(np.int64))
        nm = len(plists)
        if nm < 2:
            return nm, 0
        return nm, _min_window_cost(plists)

    def _doc_meta(self, doc_ids: list[int]) -> dict[int, tuple[int, int]]:
        """{doc_id: (title_tc, token_count)} for a candidate set via one
        pruned read of the index's docs table (title_tc falls back to 0 on
        pre-v5 docs tables — every occurrence then counts as content)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        docs_dir = os.path.join(self.index_dir, "docs")
        if not os.path.isdir(docs_dir) or not doc_ids:
            return {}
        dset = pads.dataset(docs_dir)
        cols = ["doc_id", "token_count"]
        has_ttc = "title_tc" in dset.schema.names
        if has_ttc:
            cols.append("title_tc")
        t = dset.to_table(columns=cols,
                          filter=pc.field("doc_id").isin(doc_ids))
        ttc = (t["title_tc"].to_pylist() if has_ttc
               else [0] * t.num_rows)
        return {d: (int(b or 0), int(c or 0)) for d, b, c in
                zip(t["doc_id"].to_pylist(), ttc,
                    t["token_count"].to_pylist())}

    def bm25f_topk(self, terms: list[str], k: int = 10,
                   title_weight: float = 2.0,
                   pool: int | None = None) -> list[tuple[int, float]]:
        """Field-boosted BM25 (simplified BM25F, Robertson & Zaragoza 2009
        §7: the weighted term frequency tf' = tf_content + title_weight *
        tf_title fed through the standard saturation) — the SCORING form of
        the attribute ranking rule: a title occurrence counts title_weight
        times before saturation, so title matches win without hard bucket
        ordering. The field of an occurrence is one position compare
        against the doc's title_tc boundary (needs store_positions=True).

        Rerank shape: candidates come from the plain BM25 top-pool (the
        distributed/pruned path), the field-weighted score recomputes only
        for those k-scale candidates from positions + one pruned docs-table
        read — no second index pass. title_weight=1.0 reproduces
        score_topk's scores exactly (pytest-asserted identity)."""
        if not self.has_positions:
            raise ValueError(
                "index was built without store_positions=True; the field "
                "of an occurrence is a position compare")
        from collections import Counter

        weights = Counter(terms)
        cand = self.score_topk(terms, k=pool or max(10 * k, 100))
        if not cand:
            return []
        meta = self._doc_meta([d for d, _ in cand])
        loaded = []
        for t in sorted(weights):
            segs = self.segments(t)
            if not segs:
                continue
            df = sum(s.n for s in segs)
            loaded.append((t, float(weights[t]), _idf(self.n_docs, df)))
        out = []
        for d, _ in cand:
            boundary, dl = meta.get(d, (0, 0))
            knorm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            s = 0.0
            for t, w, idf_t in loaded:
                pos = self._doc_positions(t, d)
                if pos is None or not len(pos):
                    continue
                tf_title = int((np.asarray(pos) < boundary).sum())
                tfw = (len(pos) - tf_title) + title_weight * tf_title
                s += w * idf_t * tfw * (self.k1 + 1.0) / (tfw + knorm)
            out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def doc_term_positions(self, doc_id: int,
                           term: str) -> "np.ndarray | None":
        """Occurrence positions of `term` in `doc_id` (None when absent or
        the index stores no positions) — the probe the proxy's ranking
        rules chain (words/typo/attribute/exactness buckets) is built
        from. One segment searchsorted per call; segments are decode-
        cached, so a k-candidate rerank touches each term's postings
        once."""
        return self._doc_positions(term, doc_id)

    # ------------- prefix expansion -------------

    def warm(self) -> int:
        """Preload every shard's term table (server-startup warm-up; kills the
        first-query latency tail). Returns number of terms loaded."""
        total = 0
        for shard in range(self.num_shards):
            total += len(self._load_shard(shard))
        return total

    def suggest(self, prefix: str, limit: int = 10) -> list[str]:
        """Query suggestions: df-ranked terms completing `prefix`, capped at 10
        (reference K4, src/tokenizer/query_processor.py:175 `[:10]`)."""
        return self.expand_prefix(prefix, limit=min(limit, 10))

    def expand_prefix(self, prefix: str, limit: int = 10) -> list[str]:
        """Terms starting with `prefix`, by descending df then lexicographic
        (Meilisearch matches the LAST query word as a prefix; the proxy can add
        the expansions as extra terms).

        Scale path: the build writes a globally SORTED term dictionary
        (termdict/, 8k-row groups), so the prefix becomes a parquet range
        read — row groups whose [min, max] stats miss the prefix range are
        never touched. Falls back to the full hash-shard scan only for
        pre-dictionary indexes."""
        if not prefix:
            return []
        hits = self._prefix_hits(prefix)
        hits.sort()
        return [t for _, t in hits[:limit]]

    def _prefix_hits(self, prefix: str) -> list[tuple[int, str]]:
        """[(-df, term)] for every indexed term with this prefix — termdict
        range read when available, exhaustive shard scan otherwise (so
        callers merging several engines never silently lose a legacy
        pre-dictionary layout's vocabulary)."""
        hits = self._termdict_prefix(prefix)
        if hits is not None:
            return hits
        cands: list[tuple[int, str]] = []
        for shard in range(self.num_shards):
            for term, segs in self._load_shard(shard).items():
                if term.startswith(prefix):
                    cands.append((-sum(s[0] for s in segs), term))
        return cands

    def _termdict_prefix(self, prefix: str) -> list[tuple[int, str]] | None:
        """Range-read the sorted dictionary -> [(-df, term)]; None if absent.

        Gated on the manifest's 'dict' phase marker, not on file presence: a
        crashed dictionary write leaves files but no marker, and trusting a
        partial dictionary would silently truncate prefix expansion instead
        of falling back to the exhaustive shard scan."""
        from ..state.manifest import BuildManifest

        d = os.path.join(self.index_dir, "termdict")
        if not BuildManifest(self.index_dir).phase_done("dict"):
            return None
        if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)
        ):
            return None
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        # upper bound: bump the last char (standard prefix-range trick);
        # fall back to >=-only when the prefix ends at the max code point
        lo = prefix
        i = len(prefix) - 1
        while i >= 0 and ord(prefix[i]) >= 0x10FFFF:
            i -= 1
        flt = pc.field("term") >= lo
        if i >= 0:
            hi = prefix[:i] + chr(ord(prefix[i]) + 1)
            flt = flt & (pc.field("term") < hi)
        t = pads.dataset(d).to_table(columns=["term", "df"], filter=flt)
        return [
            (-int(df), term)
            for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist())
            if term.startswith(prefix)
        ]

    def search_prefix(self, query: str, k: int = 10, expansions: int = 5):
        """Search where the final token also matches as a prefix."""
        terms = self.query_terms(query)
        if terms:
            extra = [t for t in self.expand_prefix(terms[-1], expansions)
                     if t not in terms]
            terms = terms + extra
        return self.score_topk(terms, k=k)

    # ------------- typo tolerance -------------

    def _typo_vocabulary(self):
        """The whole term dictionary as vectorized-prefilter arrays
        (terms, dfs, codepoint lens, first chars), built once per engine.
        Vocabulary-sized — the same driver footprint as one shard scan; the
        100-TB path precomputes the SymSpell deletion-neighborhood over the
        sorted dictionary (the distributed bucketing in
        pipelines/simple_text.typo_expand) so expansion becomes a pruned
        range read instead of an in-memory prefilter."""
        if self._typo_vocab is None:
            hits = self._prefix_hits("")  # termdict read or full shard scan
            terms = np.array([t for _, t in hits], dtype=object)
            dfs = np.array([-d for d, _ in hits], dtype=np.int64)
            lens = np.array([len(t) for t in terms], dtype=np.int64)
            first = np.array([t[:1] for t in terms], dtype=object)
            self._typo_vocab = (terms, dfs, lens, first)
        return self._typo_vocab

    def _typodict_candidates(self, variants: list[str], *,
                             require_max_budget: bool = False):
        """(term, df) candidates whose SymSpell neighborhood intersects the
        query's deletion variants, via a stats-pruned read of the
        variant-SORTED typodict parquet (build_typo_index). None when the
        phase was never built (fall back to the in-memory prefilter). Gated
        on the manifest marker like termdict — a crashed typodict write
        must not silently truncate expansion.

        require_max_budget: the caller is expanding under NON-default
        minWordSizeForTypos; only a max-budget dict (every term's full
        2-deletion neighborhood, marker "budget": "max" in the phase done
        file) covers arbitrary thresholds — a legacy per-length-budget
        dict would silently miss short-word candidates, so return None
        (vocabulary fallback) instead."""
        from ..state.manifest import BuildManifest

        d = os.path.join(self.index_dir, "typodict")
        if self._typodict_ok is None:
            self._typodict_ok = (
                BuildManifest(self.index_dir).phase_done("typodict")
                and os.path.isdir(d)
                and any(f.endswith(".parquet") for f in os.listdir(d))
            )
            self._typodict_budget = "none"
            if self._typodict_ok:
                try:
                    with open(os.path.join(self.index_dir, "_manifest",
                                           "typodict.done")) as f:
                        self._typodict_budget = json.load(f).get(
                            "budget", "legacy")
                except (OSError, ValueError):
                    self._typodict_budget = "legacy"
        if not self._typodict_ok:
            return None
        if require_max_budget and self._typodict_budget != "max":
            return None
        import bisect

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # explicit row-group pruning on the variant-SORTED layout: a row
        # group matters only if its [min, max] variant range contains one
        # of the query's deletion variants (binary search per group). The
        # dataset-level isin filter alone decoded every row group — at a
        # 500k-term dictionary (16.9M neighborhood rows) that was ~1.8 s
        # per expansion vs ~ms with the pruned read (BASELINE.md r5).
        tables = []
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(d, fname))
            md = pf.metadata
            vi = pf.schema_arrow.get_field_index("variant")
            keep = []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(vi).statistics
                if st is None or not st.has_min_max:
                    keep.append(rg)
                    continue
                i = bisect.bisect_left(variants, st.min)
                if i < len(variants) and variants[i] <= st.max:
                    keep.append(rg)
            if keep:
                t = pf.read_row_groups(keep,
                                       columns=["variant", "term", "df"])
                tables.append(t.filter(
                    pc.field("variant").isin(variants)))
        out: dict[str, int] = {}
        for t in tables:
            for term, df in zip(t["term"].to_pylist(),
                                t["df"].to_pylist()):
                out[term] = int(df)
        return list(out.items())

    def expand_typo(self, term: str, limit: int = 5, *,
                    one_typo: int | None = None,
                    two_typos: int | None = None) -> list[str]:
        """Typo-tolerant term expansion under Meilisearch's PUBLIC rules
        (kernel/typo.py: 5-8 chars allow 1 typo, >=9 allow 2; adjacent swap
        = 1 typo; first-letter typo counts as 2 — the reference only passes
        `typo_tolerance` options through to Meilisearch,
        query_processor.py:671,693). Candidates come from the prebuilt
        SymSpell typodict when the index has one (a pruned range read —
        the 100-TB path), else from a vectorized in-memory prefilter
        (length band <= budget; first char must match when the budget is 1,
        since a first-letter typo alone costs 2). Either way every survivor
        is verified with exact Damerau-Levenshtein, so both paths return
        IDENTICAL expansions (asserted in tests). Ranked (fewest typos,
        highest df, term).

        one_typo / two_typos override Meilisearch's
        typoTolerance.minWordSizeForTypos per request. A typodict built at
        the MAX budget (build_typo_index marker "budget": "max" — every
        term's full 2-deletion neighborhood) serves ANY thresholds, since
        every query budget is <= 2 and the SymSpell shared-variant
        property then holds unconditionally; only a legacy
        per-length-budget dict forces custom thresholds onto the
        vocabulary-scan path (VERDICT r4 item #6 closed)."""
        from ..kernel.typo import (ONE_TYPO_MIN_LEN, TWO_TYPO_MIN_LEN,
                                   deletion_variants, typo_budget,
                                   typo_matches)

        o = ONE_TYPO_MIN_LEN if one_typo is None else one_typo
        tw = TWO_TYPO_MIN_LEN if two_typos is None else two_typos
        b = typo_budget(term, o, tw)
        if b == 0:
            return []
        custom = (o, tw) != (ONE_TYPO_MIN_LEN, TWO_TYPO_MIN_LEN)
        cands = self._typodict_candidates(
            sorted(deletion_variants(term, b)),
            require_max_budget=custom)
        if cands is None:
            terms, dfs, lens, first = self._typo_vocabulary()
            if not terms.size:
                return []
            keep = np.abs(lens - len(term)) <= b
            if b == 1:
                keep &= first == term[0]
            cands = [(t, int(df)) for t, df in zip(terms[keep], dfs[keep])]
        scored = []
        for t, df in cands:
            if t == term:
                continue
            ty = typo_matches(term, t, o, tw)
            if ty is not None:
                scored.append((ty, -int(df), t))
        scored.sort()
        return [t for _, _, t in scored[:limit]]

    def search_typo(self, query: str, k: int = 10, expansions: int = 3,
                    mode: str = "exhaustive"):
        """Search where every query word also matches its typo variants
        (Meilisearch typo tolerance). Expansions join the OR term set the
        same way prefix expansion does; documents matching the exact term
        still rank first because they score the original term too."""
        terms = self.query_terms(query)
        extra: list[str] = []
        for t in terms:
            extra.extend(x for x in self.expand_typo(t, expansions)
                         if x not in terms and x not in extra)
        return self.score_topk(terms + extra, k=k, mode=mode)

    # ------------- public search -------------

    def search(self, query: str, k: int = 10, mode: str = "exhaustive"):
        return self.score_topk(self.query_terms(query), k=k, mode=mode)
