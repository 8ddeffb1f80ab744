"""Single-node exhaustive BM25 oracle (k1=1.2, b=0.75).

The rank/score oracle for the distributed index: builds in-memory postings from
a list of (doc_id, terms) and scores queries exhaustively. The distributed
engine must reproduce top-k doc_ids AND scores (rank-identical; float64 scores
equal because both sides accumulate per-document scores term-at-a-time in
sorted-term order).

Scoring (Lucene-style BM25, the published formula):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
Deterministic tie-break: (-score, doc_id).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from ..config import BM25_B, BM25_K1


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: float, dl: float, avgdl: float, idf_t: float,
                    k1: float = BM25_K1, b: float = BM25_B) -> float:
    # parenthesized as idf * (tfn) so the float64 operation order is identical
    # to the engine's two-step idf * tfn computation (index/codec.py tfn_scores)
    # => oracle and distributed scores are bit-identical, not just approximately
    return idf_t * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, list[str]]],
                 k1: float = BM25_K1, b: float = BM25_B):
        """docs: [(doc_id, index_terms)]."""
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        for doc_id, terms in docs:
            self.dl[doc_id] = len(terms)
            for term, tf in Counter(terms).items():
                self.postings[term][doc_id] = tf
        self.n_docs = len(self.dl)
        total = sum(self.dl.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def score_query(self, terms: list[str]) -> dict[int, float]:
        """Accumulate scores term-at-a-time over unique terms in sorted order
        (the distributed engine uses the same order => identical float64 sums).
        Duplicate query terms contribute once per occurrence (weight = query tf)."""
        weights = Counter(terms)
        scores: dict[int, float] = defaultdict(float)
        for term in sorted(weights):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf_t = idf(self.n_docs, len(plist))
            w = weights[term]
            for doc_id, tf in plist.items():
                scores[doc_id] += w * bm25_term_score(
                    tf, self.dl[doc_id], self.avgdl, idf_t, self.k1, self.b
                )
        return dict(scores)

    def top_k(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        scores = self.score_query(terms)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def top_k_all(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """matchingStrategy='all' oracle: only docs containing EVERY unique
        query term; scores identical to top_k for the surviving docs."""
        uniq = sorted(set(terms))
        if not uniq:
            return []
        doc_sets = []
        for t in uniq:
            plist = self.postings.get(t)
            if not plist:
                return []
            doc_sets.append(set(plist))
        required = set.intersection(*doc_sets)
        scores = self.score_query(terms)
        hits = [(d, s) for d, s in scores.items() if d in required]
        return sorted(hits, key=lambda kv: (-kv[1], kv[0]))[:k]
