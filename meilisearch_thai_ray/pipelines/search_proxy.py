"""Reference query-proxy semantics on top of the BM25 engine (SURVEY §3.2).

Faithful re-implementation (exact constants) of the reference's query side:

  * query analysis M13 (query_processor.py:161-209): thai/english char ratios
    over non-space chars, >0.1 detection thresholds, primary_language;
  * tokenization confidence M15 (:339-394) — the processing-time factor is
    pinned to 1.0 for determinism (wall-clock must never change results);
  * variant generation M14 (:436-500): ORIGINAL (preserve_original) /
    TOKENIZED / COMPOUND_SPLIT / MIXED_LANGUAGE / FALLBACK, deduped by
    lowercased text, capped at max_query_variants=5 sorted by weight;
  * variant weighting M16 (:786-952): base weights {ORIGINAL .8, TOKENIZED 1.0,
    COMPOUND_SPLIT .9, FALLBACK .6, MIXED .85} x content/length/language/
    tokenization multipliers, clamped to [0.1, 1.0]; non-Thai original x1.2;
  * execution: per-variant BM25 top-k over OUR index (stand-in for the
    parallel Meilisearch searches, search_executor.py:55-176), scores
    normalized per variant (enable_score_normalization default True);
  * relevance scoring (result_ranker.py:295-399): base x variant_boost x
    thai_boost (1.5 when thai_ratio>0.5) x exact_match_boost (2.0) x
    compound boost (1.3) x confidence boost x exp(-0.1*position) decay,
    capped at 1.0;
  * D2 dedup by doc id with full tie-breaking (result_ranker.py:487-565):
    (-score, variant priority TOKENIZED>ORIGINAL>COMPOUND_SPLIT>FALLBACK,
    engine priority, position, -weight, -content_length);
  * final sort desc, min_score_threshold=0.1, top-k.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..config import EngineConfig
from ..kernel.charclass import is_thai_text

ORIGINAL = "original"
TOKENIZED = "tokenized"
COMPOUND_SPLIT = "compound_split"
FALLBACK = "fallback"
MIXED_LANGUAGE = "mixed_language"

BASE_WEIGHTS = {ORIGINAL: 0.8, TOKENIZED: 1.0, COMPOUND_SPLIT: 0.9,
                FALLBACK: 0.6, MIXED_LANGUAGE: 0.85}
VARIANT_PRIORITY = {TOKENIZED: 0, ORIGINAL: 1, COMPOUND_SPLIT: 2, FALLBACK: 3}
ENGINE_PRIORITY = {"newmm": 0, "attacut": 1, "deepcut": 2, "basic": 3}

BOOST_EXACT = 2.0        # settings.py:61
BOOST_THAI = 1.5         # settings.py:62
BOOST_COMPOUND = 1.3     # settings.py:63
DECAY_FACTOR = 0.1       # settings.py:64
MIN_SCORE_THRESHOLD = 0.1  # settings.py:65
MAX_RESULTS_PER_VARIANT = 100  # settings.py:66
# Meilisearch sortableAttributes analog: the non-text doc-metadata columns
# of the index's docs table (index/build.py DOCS_SCHEMA)
SORTABLE_FIELDS = frozenset({"doc_id", "url", "lang", "token_count"})
MAX_QUERY_VARIANTS = 5
TOKENIZATION_CONFIDENCE_FACTOR = 0.5  # result_ranker.py ExtendedRankingConfig

# result_ranker.py:26-32 RankingAlgorithm + ExtendedRankingConfig:69-71
RANKING_ALGORITHMS = ("weighted_score", "optimized_score", "simple_score",
                      "experimental_score")
SIMILARITY_THRESHOLD = 0.85            # result_ranker.py:70
MAX_SIMILARITY_COMPARISONS = 100       # result_ranker.py:71
EXPERIMENTAL_THAI_BOOST = 1.2          # result_ranker.py:1216


import re as _re_mod

# Meilisearch negative-keyword syntax (the engine the reference proxies to
# resolves `-word` / -"phrase" exclusions server-side; the reference forwards
# the raw q string — search_proxy_service.py request passthrough): a `-`
# at the start of the query or after whitespace, immediately followed by a
# word or a quoted phrase, excludes every document containing it. A hyphen
# inside a word (well-known) or followed by whitespace stays literal.
_NEG_RE = _re_mod.compile(r'(?:(?<=\s)|^)-(?:"([^"]+)"|([^\s"]+))')


def split_negative_terms(query: str) -> tuple[str, list[str], list[str]]:
    """-> (positive remainder, negative words, negative phrases)."""
    words: list[str] = []
    phrases: list[str] = []

    def _take(m: "_re_mod.Match[str]") -> str:
        if m.group(1) is not None:
            phrases.append(m.group(1))
        else:
            words.append(m.group(2))
        return ""

    positive = _NEG_RE.sub(_take, query)
    return _re_mod.sub(r"\s+", " ", positive).strip(), words, phrases


_PHRASE_RE = _re_mod.compile(r'"([^"]+)"')


def split_quoted_phrases(query: str) -> tuple[str, list[str]]:
    """Positive quoted phrases (Meilisearch phrase syntax: `"red fox"` must
    occur as consecutive tokens). -> (query with the quotes stripped but the
    WORDS kept — they still match and score — and the phrase constraints)."""
    phrases = [m.group(1).strip() for m in _PHRASE_RE.finditer(query)]
    stripped = _PHRASE_RE.sub(lambda m: m.group(1), query)
    return (_re_mod.sub(r"\s+", " ", stripped).strip(),
            [p for p in phrases if p])


@dataclass
class QueryVariant:
    query_text: str
    variant_type: str
    engine: str
    weight: float
    terms: list[str] = field(default_factory=list)


@dataclass
class SearchOptions:
    """Per-request options — the engine-relevant subset of the reference's
    SearchOptions (search_proxy/models/requests.py:9-48). Transport/service
    fields (search_timeout_ms, attributes_to_retrieve, index_name) stay out
    of a data engine. None = use the engine defaults."""

    limit: int = 20                      # requests.py:12 (ge=1, le=100)
    offset: int = 0                      # requests.py:13
    # dict = the reference's filter DSL; str = a Meilisearch filter-language
    # expression (kernel/filter_lang.py) — both evaluate over docs metadata
    filters: dict | str | None = None
    highlight: bool = False              # M19/M20 span markup on hits
    crop_length: int = 200               # requests.py:19 (ge=10, le=1000)
    crop_marker: str = "..."             # requests.py:20
    # Meilisearch matchingStrategy override for every variant:
    # "all" | "last" | "any" | "frequency" (v1.5 semantics: required words,
    # highest-df word dropped first when the conjunction is empty)
    matching_strategy: str | None = None
    enable_compound_search: bool = True  # requests.py:26
    boost_exact_matches: float | None = None  # requests.py:27
    boost_thai_matches: float | None = None   # requests.py:28
    max_query_variants: int | None = None     # requests.py:31 (ge=1, le=10)
    # None = reference behavior (typo matching only on fallback variants,
    # query_processor.py:671,693); True = every OR-matching variant expands
    # its terms via the engine's typo matching (Meilisearch's default-on
    # index setting); False = off everywhere
    typo_tolerance: bool | None = None
    # Meilisearch typoTolerance SETTINGS object (subset):
    #   {"minWordSizeForTypos": {"oneTypo": int, "twoTypos": int},
    #    "disableOnWords": [word, ...]}
    # minWordSizeForTypos tightens/loosens the length budgets per request
    # (custom thresholds take the verified vocabulary path — the typodict
    # is precomputed under the defaults); disableOnWords suppresses
    # expansion for exact listed words (Meilisearch semantics)
    typo_settings: dict | None = None
    # Meilisearch sort criteria (requests.py:15): ["field:asc"|"field:desc",
    # ...] over the sortable doc-metadata fields; relevancy rank breaks
    # ties, docs missing the field go last (Meilisearch sort semantics)
    sort: list[str] | None = None
    # Meilisearch distinct attribute: at most ONE hit per distinct value
    # of this doc-metadata field; the best-ranked survives
    distinct: str | None = None
    # Meilisearch 'proximity' ranking rule (index rankingRules; the
    # reference inherits it from Meilisearch): bucket hits by
    # (words-matched desc, minimal-token-window cost asc) computed from the
    # positional postings, proxy ranking breaking ties within a bucket.
    # Needs an index built with store_positions=True; ignored when a
    # per-request `sort` is set (explicit sort outranks proximity in the
    # rules chain)
    proximity_ranking: bool = False
    # FULL Meilisearch rules chain (settings_manager.py:140 order:
    # words -> typo -> proximity -> attribute -> sort -> exactness),
    # bucket-ordered from the positional index:
    #   words      more matched query words first
    #   typo       hits reached only via typo expansion rank below exact-
    #              term hits (1-typo below 0, 2 below 1; summed per word)
    #   proximity  minimal covering token window of the direct matches
    #   attribute  matches in the TITLE field (token positions < the doc's
    #              title_tc boundary) outrank content-only matches,
    #              per searchableAttributes order [title, content]
    #   exactness  exact in-order phrase occurrence first, then all-words-
    #              exact, then the rest
    # The proxy's boosted ranking is the final tie-break. Supersedes
    # proximity_ranking (a two-rule prefix of this chain); ignored when a
    # per-request `sort` is set (sort outranks the trailing rules here, as
    # the reference's chain places it, and Meilisearch applies it hard).
    # Needs store_positions=True; attribute needs docs_path with the v5
    # title_tc column (older docs tables rank everything as content).
    ranking_rules: bool = False
    # Meilisearch showRankingScore: every hit gains `_rankingScore`, the
    # proxy's normalized [0,1] relevancy score
    show_ranking_score: bool = False
    # Meilisearch showRankingScoreDetails: every hit gains
    # `_rankingScoreDetails` with the per-rule bucket values of the rules
    # chain (words/typo/proximity/attribute/exactness). Requires
    # ranking_rules=True — the details ARE the chain's sort key.
    show_ranking_score_details: bool = False
    # Meilisearch rankingScoreThreshold (0..1): hits whose normalized score
    # falls below it are dropped (tightens the engine's MIN_SCORE_THRESHOLD)
    ranking_score_threshold: float | None = None
    # Meilisearch showMatchesPosition: every hit gains `_matchesPosition`,
    # {"text": [{"start", "length"}, ...]} — merged exact match spans of the
    # query terms in the document text (character offsets). Needs docs_path.
    show_matches_position: bool = False
    # Meilisearch attributesToSearchOn, over searchableAttributes
    # [title, content]: a hit must have at least one direct query-term
    # occurrence inside an allowed field (token position vs the doc's
    # title_tc boundary). None = search every attribute. Needs an index
    # with store_positions=True and a docs_path with the v5 title_tc column.
    attributes_to_search_on: list[str] | None = None

    def __post_init__(self):
        if self.matching_strategy is not None and self.matching_strategy \
                not in ("all", "last", "any", "frequency"):
            raise ValueError(
                "matching_strategy must be one of "
                "'all', 'last', 'any', 'frequency'")
        if self.attributes_to_search_on is not None:
            bad = set(self.attributes_to_search_on) - {"title", "content"}
            if bad or not self.attributes_to_search_on:
                raise ValueError(
                    "attributes_to_search_on must be a non-empty subset of "
                    "['title', 'content']")
        if self.ranking_score_threshold is not None \
                and not 0.0 <= self.ranking_score_threshold <= 1.0:
            raise ValueError("ranking_score_threshold must be in [0, 1]")
        if self.show_ranking_score_details and not self.ranking_rules:
            raise ValueError(
                "show_ranking_score_details requires ranking_rules=True")
        if self.distinct is not None and self.distinct not in SORTABLE_FIELDS:
            raise ValueError(
                f"distinct must be one of {sorted(SORTABLE_FIELDS)}")
        if self.sort is not None:
            for c in self.sort:
                field, _, direction = c.partition(":")
                if direction not in ("asc", "desc") \
                        or field not in SORTABLE_FIELDS:
                    raise ValueError(
                        f"bad sort criterion {c!r}: expected "
                        f"'<field>:asc|desc' with field in "
                        f"{sorted(SORTABLE_FIELDS)}")
        if not 1 <= self.limit <= 100:
            raise ValueError("limit must be in [1, 100]")
        if self.offset < 0:
            raise ValueError("offset must be >= 0")
        if not 10 <= self.crop_length <= 1000:
            raise ValueError("crop_length must be in [10, 1000]")
        if self.typo_settings is not None:
            ts = self.typo_settings
            unknown = set(ts) - {"minWordSizeForTypos", "disableOnWords"}
            if unknown:
                raise ValueError(f"unknown typo_settings keys {unknown}")
            mws = ts.get("minWordSizeForTypos") or {}
            one = mws.get("oneTypo", 5)
            two = mws.get("twoTypos", 9)
            if not (1 <= one <= two <= 255):
                raise ValueError(
                    "minWordSizeForTypos needs 1 <= oneTypo <= twoTypos "
                    "<= 255")
        for name in ("boost_exact_matches", "boost_thai_matches"):
            v = getattr(self, name)
            if v is not None and not 0.1 <= v <= 5.0:
                raise ValueError(f"{name} must be in [0.1, 5.0]")
        if self.max_query_variants is not None and not 1 <= self.max_query_variants <= 10:
            raise ValueError("max_query_variants must be in [1, 10]")


class SearchProxy:
    """Query-side pipeline: analysis -> variants -> per-variant BM25 ->
    boost ranking -> dedup -> top-k."""

    def __init__(self, engine, docs_path: str | None = None,
                 config: EngineConfig | None = None,
                 synonyms: dict[str, list[str]] | None = None,
                 algorithm: str = "weighted_score",
                 enable_content_similarity_dedup: bool = True):
        self.engine = engine  # index.search.SearchEngine
        self.config = config or EngineConfig()
        # §2.10 extension surface: pluggable ranking algorithm registry
        # (result_ranker.py:26-32,127-132) + hash-based A/B assignment
        if algorithm not in RANKING_ALGORITHMS:
            raise ValueError(f"unknown algorithm {algorithm!r}; "
                             f"choose from {RANKING_ALGORITHMS}")
        self.algorithm = algorithm
        self.enable_content_similarity_dedup = enable_content_similarity_dedup
        self.ab_testing_enabled = False
        self.ab_test_algorithm: str | None = None
        self.ab_test_traffic_percentage = 0.0
        self.docs_path = docs_path  # optional docs parquet for exact-match/content
        # D5 synonym map (settings_manager.py:226-249 set-union semantics),
        # applied query-side like Meilisearch does: canonical -> variants,
        # symmetric closure built once
        self.synonyms: dict[str, set[str]] = {}
        for canon, alts in (synonyms or {}).items():
            group = {canon, *alts}
            for w in group:
                self.synonyms.setdefault(w, set()).update(group - {w})
        self._tok = None
        self._watcher = None  # ST6 hot reload, opt-in via enable_hot_reload()
        self._text_cache: dict[int, str] = {}

    def _doc_texts(self, doc_ids: list[int]) -> dict[int, str]:
        """Fetch doc texts for exact-match boosts / content tie-breaks via a
        targeted filtered parquet read (only when docs_path is configured);
        LRU-ish cached per proxy."""
        if not self.docs_path:
            return {}
        if len(self._text_cache) > 50_000:
            # evict BEFORE deciding what to fetch — clearing after would drop
            # already-cached entries the current request still needs
            self._text_cache.clear()
        missing = [d for d in doc_ids if d not in self._text_cache]
        if missing:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            t = pads.dataset(self.docs_path).to_table(
                columns=["doc_id", "text"],
                filter=pc.field("doc_id").isin(missing),
            )
            self._text_cache.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        return {d: self._text_cache[d] for d in doc_ids if d in self._text_cache}

    def negative_doc_ids(self, words: list[str],
                         phrases: list[str]) -> set[int]:
        """Doc ids containing ANY negative keyword / phrase.

        A negative word that tokenizes to one index term is a plain posting
        read (every doc in its posting list); multi-token words and quoted
        phrases use the phrase path (adjacency via positions when the index
        stores them, substring-verify via docs_path otherwise). At serving
        scale this is a per-shard posting traversal — the same cost class
        as one extra query term."""
        excl: set[int] = set()
        for w in words:
            seq = self.engine.phrase_seq(w) if hasattr(
                self.engine, "phrase_seq"
            ) else self.tokenizer.index_terms(self.tokenizer.tokenize(w))
            if not seq:
                continue
            if len(seq) == 1 and hasattr(self.engine, "segments"):
                for s in self.engine.segments(seq[0]):
                    excl.update(int(d) for d in s.doc_ids)
            else:
                excl.update(d for d, _ in self.search_phrase(w, k=1 << 62))
        for p in phrases:
            excl.update(d for d, _ in self.search_phrase(p, k=1 << 62))
        return excl

    def _placeholder_search(self, excluded: set[int], k: int,
                            offset: int) -> list[dict]:
        """Meilisearch placeholder search (empty q): documents in internal
        (doc_id) order. Used when a query is ONLY negative keywords; needs
        docs_path (the doc-id universe lives in the docs table)."""
        if not self.docs_path:
            return []
        import pyarrow.dataset as pads

        t = pads.dataset(self.docs_path).to_table(columns=["doc_id"])
        ids = sorted(int(d) for d in t["doc_id"].to_pylist()
                     if int(d) not in excluded)
        return [
            {"doc_id": d, "score": 0.0, "raw_score": 0.0,
             "variant_type": "placeholder", "engine": "none",
             "algorithm": "placeholder", "dedup_count": 0}
            for d in ids[offset:offset + k]
        ]

    def expand_synonyms(self, terms: list[str]) -> list[str]:
        """Append synonym terms after the originals (original terms keep their
        position so tie-breaks stay stable)."""
        if not self.synonyms:
            return terms
        out = list(terms)
        for t in terms:
            for alt in sorted(self.synonyms.get(t, ())):
                if alt not in out:
                    out.append(alt)
        return out

    @property
    def tokenizer(self):
        if self._watcher is not None:
            # ST6: revalidate the dictionary content hash at every request
            # boundary; a change drops the cached tokenizer so the next line
            # rebuilds (or re-shares) one keyed by the NEW content.
            self._watcher.poll()
        if self._tok is None:
            from ..state.hot_reload import cached_tokenizer

            self._tok = cached_tokenizer(self.config)
        return self._tok

    def enable_hot_reload(self, poll_interval: float | None = None):
        """ST6 (hot_reload.py:24-211 analog): watch the dictionary files and
        swap the tokenizer when their CONTENT changes. Synchronous form —
        every search revalidates a content hash (a few KB) — plus an optional
        daemon poll thread for long-lived serving actors. Returns the
        DictionaryWatcher so callers can register callbacks / stop it. The
        on-disk index keeps its build-time dictionary hash;
        `index.maintenance.needs_reindex()` reports the staleness."""
        from ..state.hot_reload import DictionaryWatcher

        if self._watcher is None:
            self._watcher = DictionaryWatcher(self.config)
            self._watcher.register(lambda _v: setattr(self, "_tok", None))
            if poll_interval is not None:
                self._watcher.start(poll_interval)
        return self._watcher

    # ---------------- M13: query analysis ----------------

    def analyze_query(self, query: str) -> dict:
        import re

        thai_chars = sum(1 for c in query if "฀" <= c <= "๿")
        english_matches = re.findall(r"[a-zA-Z]+", query)
        english_chars = sum(len(m) for m in english_matches)
        total = len(query.replace(" ", ""))
        thai_ratio = thai_chars / total if total else 0.0
        english_ratio = english_chars / total if total else 0.0
        thai_detected = thai_ratio > 0.1
        english_detected = english_ratio > 0.1
        if thai_ratio > english_ratio:
            primary = "thai"
        elif english_ratio > thai_ratio:
            primary = "english"
        else:
            primary = "mixed"
        return {
            "thai_content_ratio": thai_ratio,
            "english_content_ratio": english_ratio,
            "thai_content_detected": thai_detected,
            "english_content_detected": english_detected,
            "mixed_content": thai_detected and english_detected,
            "primary_language": primary,
            "total_length": len(query),
        }

    # ---------------- M15: tokenization confidence ----------------

    def tokenization_confidence(self, query: str, tokens: list[str]) -> float:
        if not tokens:
            return 0.0
        factors = []
        qlen = len(query.replace(" ", ""))
        if qlen > 0:
            tpc = len(tokens) / qlen
            if 0.1 <= tpc <= 0.5:
                factors.append(1.0)
            elif tpc < 0.1:
                factors.append(tpc / 0.1)
            else:
                factors.append(max(0.1, 1.0 - (tpc - 0.5) / 0.5))
        factors.append(1.0)  # processing-time factor pinned (determinism)
        thai_tokens = [t for t in tokens if is_thai_text(t)]
        if thai_tokens:
            avg = sum(len(t) for t in thai_tokens) / len(thai_tokens)
            if 2 <= avg <= 6:
                factors.append(1.0)
            elif avg < 2:
                factors.append(avg / 2)
            else:
                factors.append(max(0.3, 1.0 - (avg - 6) / 10))
        return sum(factors) / len(factors) if factors else 0.5

    # ---------------- M16: variant weighting ----------------

    def _variant_weight(self, vtype: str, analysis: dict, confidence: float = 1.0) -> float:
        base = BASE_WEIGHTS.get(vtype, 0.5)
        thai_ratio = analysis["thai_content_ratio"]
        english_ratio = analysis["english_content_ratio"]
        mixed = analysis["mixed_content"]

        content = 1.0
        if thai_ratio > 0.7:
            if vtype in (TOKENIZED, COMPOUND_SPLIT):
                content = 1.2
            elif vtype == ORIGINAL:
                content = 0.9
        elif english_ratio > 0.7:
            if vtype == ORIGINAL:
                content = 1.1
            elif vtype in (TOKENIZED, COMPOUND_SPLIT):
                content = 0.8
        elif mixed:
            if vtype == MIXED_LANGUAGE:
                content = 1.15
            elif vtype == ORIGINAL:
                content = 1.05

        qlen = analysis["total_length"]
        length = 1.0
        if qlen <= 5:
            if vtype == ORIGINAL:
                length = 1.1
            elif vtype == FALLBACK:
                length = 0.8
        elif qlen >= 50:
            if vtype in (TOKENIZED, COMPOUND_SPLIT):
                length = 1.1
            elif vtype == ORIGINAL:
                length = 0.95

        primary = analysis["primary_language"]
        lang = 1.0
        if primary == "thai" and thai_ratio > 0.8:
            if vtype in (TOKENIZED, COMPOUND_SPLIT):
                lang = 1.1
            elif vtype == FALLBACK:
                lang = 0.7
        elif primary == "english":
            if vtype == ORIGINAL:
                lang = 1.05
            elif vtype in (TOKENIZED, COMPOUND_SPLIT):
                lang = 0.9
        elif primary in ("mixed", "unknown"):
            if vtype == FALLBACK:
                lang = 1.1

        if vtype == ORIGINAL:
            tok_q = 1.0
        elif confidence >= 0.9:
            tok_q = 1.1
        elif confidence >= 0.7:
            tok_q = 1.0
        elif confidence >= 0.5:
            tok_q = 0.9
        else:
            tok_q = 0.8

        return max(0.1, min(1.0, base * content * length * lang * tok_q))

    # ---------------- M14: variant generation ----------------

    def generate_variants(self, query: str) -> list[QueryVariant]:
        return self._prepare(query)[3]

    def _prepare(self, query: str, max_variants: int | None = None,
                 enable_compound: bool = True):
        """One pass of normalize -> analyze -> tokenize -> confidence ->
        variants (the serving hot path runs the Thai trie exactly once)."""
        import re

        query = re.sub(r"\s+", " ", query).strip()  # M12 normalization
        analysis = self.analyze_query(query)
        tok = self.tokenizer
        variants: list[QueryVariant] = []
        seen: set[str] = set()

        def add(v: QueryVariant):
            key = v.query_text.strip().lower()
            if key and key not in seen:
                seen.add(key)
                variants.append(v)

        # original (preserve_original default True; non-Thai boost x1.2, cap 1.0)
        w = self._variant_weight(ORIGINAL, analysis)
        if not analysis["thai_content_detected"]:
            w = min(1.0, w * 1.2)
        add(QueryVariant(query, ORIGINAL, "none", w,
                         terms=[t.lower() for t in query.split(" ") if t]))

        tokens = tok.tokenize(query)
        confidence = self.tokenization_confidence(query, tokens)
        terms = tok.index_terms(tokens)
        if terms:
            add(QueryVariant(" ".join(terms), TOKENIZED, "newmm",
                             self._variant_weight(TOKENIZED, analysis, confidence),
                             terms=terms))
            # compound split: force-split dictionary compounds into parts
            split_terms: list[str] = []
            for t in terms:
                sub = tok.segmenter._alt_segment(t) if len(t) > 4 and is_thai_text(t) else [t]
                split_terms.extend(sub)
            if enable_compound and split_terms != terms:
                add(QueryVariant(" ".join(split_terms), COMPOUND_SPLIT, "newmm",
                                 self._variant_weight(COMPOUND_SPLIT, analysis, confidence),
                                 terms=split_terms))
        if analysis["mixed_content"] and terms:
            # mixed-language arrangement: Thai segments first, latin segments
            # case-preserved after (distinct text => survives variant dedup
            # whenever it differs from the plain tokenized form)
            thai_terms = [t for t in terms if is_thai_text(t, 0.3)]
            latin_raw = [t for t in tokens if t.strip() and not is_thai_text(t, 0.3)]
            mixed_terms = thai_terms + [t.lower() for t in latin_raw]
            add(QueryVariant(" ".join(thai_terms + latin_raw), MIXED_LANGUAGE, "newmm",
                             self._variant_weight(MIXED_LANGUAGE, analysis, confidence),
                             terms=mixed_terms))
        if not terms:
            fb = tok.segmenter.char_fallback(query)
            fb_terms = tok.index_terms(fb)
            if fb_terms:
                add(QueryVariant(" ".join(fb_terms), FALLBACK, "basic",
                                 self._variant_weight(FALLBACK, analysis, 0.4),
                                 terms=fb_terms))

        cap = max_variants if max_variants is not None else MAX_QUERY_VARIANTS
        if len(variants) > cap:
            variants.sort(key=lambda v: v.weight, reverse=True)
            variants = variants[:cap]
        return analysis, tokens, confidence, variants

    # ---------------- execution + ranking ----------------

    def configure_ab_test(self, test_algorithm: str, traffic_percentage: float,
                          enabled: bool = True) -> None:
        """A/B test config (result_ranker.py:862-895 semantics + validation)."""
        if not 0.0 <= traffic_percentage <= 1.0:
            raise ValueError("Traffic percentage must be between 0.0 and 1.0")
        if test_algorithm not in RANKING_ALGORITHMS:
            raise ValueError(
                f"Invalid test algorithm. Must be one of: {list(RANKING_ALGORITHMS)}"
            )
        self.ab_testing_enabled = enabled
        self.ab_test_algorithm = test_algorithm
        self.ab_test_traffic_percentage = traffic_percentage

    def select_algorithm(self, query: str, session_id: str | None = None) -> str:
        """Deterministic hash-based A/B assignment (result_ranker.py:714-766):
        md5(session_id + '_' + query) % 100 buckets, test algorithm below the
        traffic percentage, control otherwise."""
        if not self.ab_testing_enabled or not session_id:
            return self.algorithm
        import hashlib

        h = int(hashlib.md5(f"{session_id}_{query}".encode()).hexdigest(), 16)
        if (h % 100) / 100.0 < self.ab_test_traffic_percentage and \
                self.ab_test_algorithm:
            return self.ab_test_algorithm
        return self.algorithm

    def search(self, query: str, k: int = 10,
               session_id: str | None = None,
               options: SearchOptions | None = None) -> list[dict]:
        if options is not None:
            k = options.limit
        offset = options.offset if options else 0
        boost_exact = (options.boost_exact_matches
                       if options and options.boost_exact_matches is not None
                       else BOOST_EXACT)
        boost_thai = (options.boost_thai_matches
                      if options and options.boost_thai_matches is not None
                      else BOOST_THAI)
        neg_excluded: set[int] | None = None
        if "-" in query:
            positive, neg_w, neg_p = split_negative_terms(query)
            if neg_w or neg_p:
                neg_excluded = self.negative_doc_ids(neg_w, neg_p)
                query = positive
                if not query:
                    return self._placeholder_search(neg_excluded, k, offset)
        phrase_allowed: set[int] | None = None
        if '"' in query:
            # Meilisearch phrase syntax: every quoted phrase must occur as
            # consecutive tokens; its words still match and score normally
            stripped, pos_phrases = split_quoted_phrases(query)
            if pos_phrases:
                query = stripped
                for p in pos_phrases:
                    s = {d for d, _ in self.search_phrase(p, k=1 << 62)}
                    phrase_allowed = (s if phrase_allowed is None
                                      else phrase_allowed & s)
                    if not phrase_allowed:
                        return []
        analysis, _tokens, confidence, variants = self._prepare(
            query,
            max_variants=options.max_query_variants if options else None,
            enable_compound=options.enable_compound_search if options else True,
        )

        # per-variant matchingStrategy (search_executor.py:731-753):
        # original -> "all", tokenized/compound_split -> "last",
        # fallback/mixed -> most flexible ("any"); a per-request
        # matching_strategy ("all"|"last"|"any"|"frequency") overrides all
        # variants — "frequency" gets true Meilisearch v1.5 semantics below
        strategies = {ORIGINAL: "all", TOKENIZED: "last", COMPOUND_SPLIT: "last"}
        if options and options.matching_strategy:
            strategies = {v.variant_type: options.matching_strategy
                          for v in variants}

        candidates: list[tuple] = []  # (hit_dict, score, variant, position)
        for variant in variants:
            terms = self.expand_synonyms(variant.terms)
            strat = strategies.get(variant.variant_type, "any")
            if strat == "all":
                hits = self.engine.score_topk(terms, k=MAX_RESULTS_PER_VARIANT,
                                              match="all")
            elif strat == "last":
                tt = list(terms)
                hits = []
                while tt:
                    hits = self.engine.score_topk(tt, k=MAX_RESULTS_PER_VARIANT,
                                                  match="all")
                    if hits:
                        break
                    tt = tt[:-1]
            elif strat == "frequency":
                # Meilisearch matchingStrategy="frequency" (v1.5+): every
                # word is required — matching through its typo derivations
                # when typo matching applies — and when the conjunction is
                # empty the word with the HIGHEST document frequency drops
                # first (the least informative one), unlike "last"'s
                # positional drop. A word whose derivation group matches no
                # document can never satisfy the conjunction at any
                # frequency, so it drops first; df ties drop the later
                # position. Scoring is OR BM25 over the surviving words'
                # groups restricted to the conjunction set (cost bounded by
                # the groups' postings, same class as the phrase path).
                use_typo = (options.typo_tolerance if options is not None
                            and options.typo_tolerance is not None
                            else variant.variant_type == FALLBACK)
                expand = getattr(self.engine, "expand_typo", None)
                ts = (options.typo_settings or {}) if options else {}
                mws = ts.get("minWordSizeForTypos") or {}
                disabled = set(ts.get("disableOnWords") or ())
                groups: dict[str, list[str]] = {}
                for t in terms:
                    g = [t]
                    if use_typo and expand is not None and t not in disabled:
                        g += [x for x in expand(t, 3,
                                                one_typo=mws.get("oneTypo"),
                                                two_typos=mws.get("twoTypos"))
                              if x not in g]
                    groups.setdefault(t, g)
                order = list(dict.fromkeys(terms))
                hits = []
                # Fast path: with no typo expansions every group is its own
                # word, so the conjunction IS match="all" over the words —
                # identical result set and OR-BM25 scores, without
                # materializing each word's full postings as a Python set.
                # The per-word doc sets are only needed to pick which word
                # to drop, i.e. only when the conjunction comes back empty.
                if all(len(groups[t]) == 1 for t in order):
                    hits = self.engine.score_topk(
                        order, k=MAX_RESULTS_PER_VARIANT, match="all")
                if not hits:
                    word_docs = {
                        t: {d for d, _ in self.engine.score_topk(g, k=1 << 62)}
                        for t, g in groups.items()}
                while not hits and order:
                    allowed = set(word_docs[order[0]])
                    for t in order[1:]:
                        allowed &= word_docs[t]
                    if allowed:
                        # dedupe: two words sharing a typo derivation must
                        # not double-weight it in score_topk's Counter
                        flat = list(dict.fromkeys(
                            x for t in order for x in groups[t]))
                        hits = [(d, s) for d, s in
                                self.engine.score_topk(flat, k=1 << 62)
                                if d in allowed][:MAX_RESULTS_PER_VARIANT]
                        break
                    # Meilisearch ranks removal by the word's RESOLVED match
                    # set (typo derivations included), not raw-term df —
                    # len(word_docs) is that set's size and is already built
                    drop = max(range(len(order)),
                               key=lambda i: (not word_docs[order[i]],
                                              len(word_docs[order[i]]), i))
                    order.pop(drop)
            else:
                # typo matching joins expansions to the OR term set (AND
                # strategies are exempt: requiring a typo'd variant would
                # tighten, not loosen, the match). Default scope mirrors the
                # reference: fallback variants only (query_processor.py:
                # 671,693); typo_tolerance=True widens it to every variant
                # (Meilisearch's default-on index setting).
                use_typo = (options.typo_tolerance if options is not None
                            and options.typo_tolerance is not None
                            else variant.variant_type == FALLBACK)
                expand = getattr(self.engine, "expand_typo", None)
                if use_typo and expand is not None:
                    ts = (options.typo_settings or {}) if options else {}
                    mws = ts.get("minWordSizeForTypos") or {}
                    disabled = set(ts.get("disableOnWords") or ())
                    extra = [x for t in terms if t not in disabled
                             for x in expand(t, 3,
                                             one_typo=mws.get("oneTypo"),
                                             two_typos=mws.get("twoTypos"))
                             if x not in terms]
                    terms = list(terms) + list(dict.fromkeys(extra))
                hits = self.engine.score_topk(terms, k=MAX_RESULTS_PER_VARIANT)
            if not hits:
                continue
            # exact-match boost needs doc text (result_ranker.py:346-349):
            # fetched only for this variant's hits, only when docs_path is set
            texts = self._doc_texts([d for d, _ in hits])
            qlower = query.strip().lower()
            max_score = hits[0][1] or 1.0  # normalize per variant -> base in [0,1]
            for pos, (doc_id, raw) in enumerate(hits):
                base = raw / max_score
                score = base
                score *= variant.weight * 1.0  # variant boost (weight_factor=1.0)
                if analysis["thai_content_ratio"] > 0.5:
                    score *= boost_thai
                text = texts.get(doc_id)
                if text is not None and qlower and qlower in text.lower():
                    score *= boost_exact
                if variant.variant_type == COMPOUND_SPLIT:
                    score *= BOOST_COMPOUND
                if confidence > 0.8:
                    score *= 1.0 + (confidence - 0.8) * TOKENIZATION_CONFIDENCE_FACTOR
                if pos > 0:
                    score *= math.exp(-DECAY_FACTOR * pos)
                score = min(score, 1.0)
                candidates.append(
                    ({"doc_id": doc_id, "raw_score": raw,
                      "content_length": len(text) if text is not None else 0},
                     score, variant, pos)
                )

        algorithm = self.select_algorithm(query, session_id)
        ranked, n_unique = self._RANKERS[algorithm](self, candidates, analysis)
        sort_crit = options.sort if options else None
        if sort_crit and any(not c.startswith("doc_id:") for c in sort_crit) \
                and not self.docs_path:
            raise ValueError("sort over metadata fields requires docs_path")
        distinct = options.distinct if options else None
        if distinct and distinct != "doc_id" and not self.docs_path:
            raise ValueError("distinct over metadata fields requires "
                             "docs_path")
        attrs_on = (set(options.attributes_to_search_on)
                    if options and options.attributes_to_search_on else None)
        if attrs_on == {"title", "content"}:
            attrs_on = None  # every searchable attribute = no restriction
        if attrs_on is not None:
            if not getattr(self.engine, "has_positions", False):
                raise ValueError("attributes_to_search_on requires an index "
                                 "built with store_positions=True")
            if not self.docs_path:
                raise ValueError("attributes_to_search_on requires docs_path "
                                 "(the title_tc field boundary)")
        dvals: dict = {}
        seen_dvals: set = set()
        if distinct and distinct != "doc_id":
            dvals = self._doc_fields(
                [c[0]["doc_id"] for c in ranked], [distinct])
        # with sort, pagination applies AFTER the criteria ordering: keep
        # every passing hit (bounded by the per-variant candidate caps)
        rules_rank = bool(options and options.ranking_rules
                          and not sort_crit
                          and getattr(self.engine, "has_positions", False))
        prox_rank = not rules_rank and bool(
            options and options.proximity_ranking
            and not sort_crit
            and getattr(self.engine, "has_positions", False))
        target = ((1 << 62) if (sort_crit or prox_rank or rules_rank)
                  else offset + k)
        allowed = None
        if options and options.filters:
            allowed = self._filter_allowed(
                [c[0]["doc_id"] for c in ranked], options.filters
            )
        attr_ok: dict[int, bool] = {}
        if attrs_on is not None and ranked:
            # one pruned title_tc read for the whole candidate set, then a
            # per-doc position probe: a hit survives iff some direct query
            # term occurs inside an allowed field (title = positions before
            # the doc's title_tc boundary, content = at or after it)
            qterms_attr = list(dict.fromkeys(self.engine.phrase_seq(query)))
            cand_ids = [c[0]["doc_id"] for c in ranked]
            ttc_attr = {
                d: int(v.get("title_tc") or 0)
                for d, v in self._doc_fields(cand_ids, ["title_tc"]).items()
            }
            for d in cand_ids:
                boundary = ttc_attr.get(d, 0)
                ok = False
                for t in qterms_attr:
                    pos = self.engine.doc_term_positions(d, t)
                    if pos is None or not len(pos):
                        continue
                    in_title = int(pos.min()) < boundary
                    in_content = int(pos.max()) >= boundary
                    if ("title" in attrs_on and in_title) or (
                            "content" in attrs_on and in_content):
                        ok = True
                        break
                attr_ok[d] = ok
        min_score = MIN_SCORE_THRESHOLD
        if options and options.ranking_score_threshold is not None:
            min_score = max(min_score, options.ranking_score_threshold)
        out = []
        accepted_texts: list[str] = []
        comparisons = 0
        cluster = (
            algorithm == "weighted_score"
            and self.enable_content_similarity_dedup
            and self.docs_path is not None
        )
        if cluster and ranked:
            # prefetch texts for the head of the ranking in one filtered read
            self._doc_texts([c[0]["doc_id"] for c in ranked[: 5 * target]])
        for hit, score, variant, pos in ranked:
            if score < min_score:
                continue
            if allowed is not None and hit["doc_id"] not in allowed:
                continue
            if neg_excluded is not None and hit["doc_id"] in neg_excluded:
                continue
            if phrase_allowed is not None \
                    and hit["doc_id"] not in phrase_allowed:
                continue
            if attrs_on is not None and not attr_ok.get(hit["doc_id"]):
                continue
            if distinct and distinct != "doc_id":
                dv = dvals.get(hit["doc_id"], {}).get(distinct)
                if dv in seen_dvals:
                    continue
                seen_dvals.add(dv)
            if cluster:
                # D3 within-result-set clustering (result_ranker.py:635-712):
                # a hit near-identical (SequenceMatcher >= 0.85) to an
                # already-accepted higher-ranked hit is dropped; comparisons
                # are capped (max_similarity_comparisons)
                from difflib import SequenceMatcher

                text = self._doc_texts([hit["doc_id"]]).get(
                    hit["doc_id"], ""
                )[:500]
                dup = False
                if text:
                    for at in accepted_texts:
                        if comparisons >= MAX_SIMILARITY_COMPARISONS:
                            break
                        comparisons += 1
                        if SequenceMatcher(None, text, at).ratio() >= \
                                SIMILARITY_THRESHOLD:
                            dup = True
                            break
                if dup:
                    continue
                accepted_texts.append(text)
            out.append(
                {
                    "doc_id": hit["doc_id"],
                    "score": score,
                    "raw_score": hit["raw_score"],
                    "variant_type": variant.variant_type,
                    "engine": variant.engine,
                    "algorithm": algorithm,
                    "dedup_count": len(candidates) - n_unique,
                }
            )
            if len(out) >= target:
                break
        if sort_crit:
            out = self._apply_sort(out, sort_crit)[offset:offset + k]
        elif rules_rank:
            out = self._rules_chain_order(
                query, out,
                want_details=bool(options
                                  and options.show_ranking_score_details),
            )[offset:offset + k]
        elif prox_rank:
            # Meilisearch rules chain: words (matched-term count) then
            # proximity (min covering window), proxy ranking as tie-break
            qterms = self.tokenizer.index_terms(self.tokenizer.tokenize(query))
            key = {}
            for i, h in enumerate(out):
                nm, cost = self.engine.proximity_cost(h["doc_id"], qterms)
                key[h["doc_id"]] = (-nm, cost, i)
            out.sort(key=lambda h: key[h["doc_id"]])
            out = out[offset:offset + k]
        else:
            out = out[offset:]
        if options and options.highlight and self.docs_path:
            qterms = self.tokenizer.index_terms(self.tokenizer.tokenize(query))
            texts = self._doc_texts([h["doc_id"] for h in out])
            for h in out:
                h["highlight"] = self._highlight_snippet(
                    texts.get(h["doc_id"], ""), qterms,
                    options.crop_length, options.crop_marker,
                )
        if options and options.show_matches_position:
            if not self.docs_path:
                raise ValueError("show_matches_position requires docs_path")
            from ..stages.highlights import extract_spans, merge_spans

            qterms = self.tokenizer.index_terms(self.tokenizer.tokenize(query))
            texts = self._doc_texts([h["doc_id"] for h in out])
            for h in out:
                spans = merge_spans([
                    s for s in extract_spans(texts.get(h["doc_id"], ""),
                                             qterms)
                    if s.kind == "exact"])
                h["_matchesPosition"] = {"text": [
                    {"start": s.start, "length": s.end - s.start}
                    for s in spans]}
        if options and options.show_ranking_score:
            for h in out:
                h["_rankingScore"] = h["score"]
        return out

    def search_with_info(self, query: str, k: int = 10,
                         session_id: str | None = None,
                         options: "SearchOptions | None" = None) -> dict:
        """SearchRequest.include_tokenization_info=True analog: hits plus
        the reference's TokenizationInfo block (responses.py:61-73) —
        engine, timing, tokens, fallback engines, confidence, and token
        shape stats. The info derives from its own _prepare pass (the
        same kernel search() runs), so the numbers describe exactly what
        the search used."""
        import time as _time

        t0 = _time.perf_counter()
        analysis, tokens, confidence, variants = self._prepare(
            query,
            max_variants=options.max_query_variants if options else None,
            enable_compound=options.enable_compound_search
            if options else True,
        )
        tok_ms = (_time.perf_counter() - t0) * 1000.0
        hits = self.search(query, k=k, session_id=session_id,
                           options=options)
        primary = next((v.engine for v in variants
                        if v.variant_type == TOKENIZED), "none")
        fallbacks = sorted({v.engine for v in variants
                            if v.variant_type == FALLBACK})
        return {
            "hits": hits,
            "tokenization_info": {
                "tokenization_engine": primary,
                "tokenization_time_ms": round(tok_ms, 3),
                "tokens": list(tokens),
                "fallback_engines_used": fallbacks,
                "tokenization_confidence": confidence,
                "original_text_length": len(query),
                "token_count": len(tokens),
                "average_token_length": round(
                    sum(len(t) for t in tokens) / len(tokens), 6)
                if tokens else 0.0,
            },
        }

    def _rules_chain_order(self, query: str, hits: list[dict],
                           want_details: bool = False) -> list[dict]:
        """Order hits by the Meilisearch ranking-rules chain (reference
        settings_manager.py:140: words, typo, proximity, attribute,
        exactness), each rule a bucket inside the previous one; the
        incoming (proxy-boosted) order is the final tie-break.

        All buckets derive from the positional index — document text is
        never read: per-word direct/typo presence via doc_term_positions,
        proximity via the min covering window of the direct matches,
        attribute (searchableAttributes order [title, content],
        settings_manager.py:81-86) via the per-doc title_tc token-prefix
        boundary, exactness via in-order adjacent occurrence of the
        query's primary-term sequence."""
        from ..kernel.typo import typo_matches

        eng = self.engine
        seq = eng.phrase_seq(query)
        uniq = list(dict.fromkeys(seq))
        if not uniq or not hits:
            return hits
        ttc: dict[int, int] = {}
        if self.docs_path:
            try:
                fields = self._doc_fields([h["doc_id"] for h in hits],
                                          ["title_tc"])
                ttc = {d: int(v.get("title_tc") or 0)
                       for d, v in fields.items()}
            except Exception:  # pre-v5 docs table: no title boundary
                ttc = {}
        expand = getattr(eng, "expand_typo", None)
        exp_cache: dict[str, list[tuple[str, int]]] = {}
        keyed = []
        for i, h in enumerate(hits):
            d = h["doc_id"]
            boundary = ttc.get(d, 0)
            words = typo = attr = 0
            direct: list[str] = []
            for t in uniq:
                pos = eng.doc_term_positions(d, t)
                if pos is not None and len(pos):
                    words += 1
                    direct.append(t)
                    attr += 0 if int(pos.min()) < boundary else 1
                    continue
                if expand is None:
                    continue
                if t not in exp_cache:
                    cands = []
                    for x in expand(t, 8):
                        nt = typo_matches(t, x)
                        if nt:
                            cands.append((x, nt))
                    exp_cache[t] = cands
                best = None
                best_min = 0
                for x, nt in exp_cache[t]:
                    px = eng.doc_term_positions(d, x)
                    if px is not None and len(px) and (
                            best is None or nt < best):
                        best, best_min = nt, int(px.min())
                if best is not None:
                    words += 1
                    typo += best
                    attr += 0 if best_min < boundary else 1
            if len(direct) >= 2:
                _, pcost = eng.proximity_cost(d, direct)
            else:
                pcost = 0
            exact = 2
            if len(direct) == len(uniq):
                exact = 1
                if len(seq) == 1 or self._adjacent_in_order(d, seq):
                    exact = 0
            if want_details:
                # Meilisearch showRankingScoreDetails: the chain's per-rule
                # bucket values, in rule order (these ARE the sort key)
                h["_rankingScoreDetails"] = {
                    "words": {"matchedWords": words,
                              "maxMatchedWords": len(uniq)},
                    "typo": {"typoCount": typo},
                    "proximity": {"windowCost": pcost},
                    "attribute": {"contentOnlyMatches": attr},
                    "exactness": {"bucket": ("exactPhrase", "allWordsExact",
                                             "noExactMatch")[exact]},
                }
            keyed.append(((-words, typo, pcost, attr, exact, i), h))
        keyed.sort(key=lambda kh: kh[0])
        return [h for _, h in keyed]

    def _adjacent_in_order(self, doc_id: int, seq: list[str]) -> bool:
        """True when the primary-term sequence occurs at consecutive token
        positions, in order (the exactness rule's phrase bucket)."""
        shifted: set[int] | None = None
        for i, t in enumerate(seq):
            pos = self.engine.doc_term_positions(doc_id, t)
            if pos is None or not len(pos):
                return False
            s = {int(p) - i for p in pos}
            shifted = s if shifted is None else (shifted & s)
            if not shifted:
                return False
        return True

    def _doc_fields(self, doc_ids: list[int],
                    fields: list[str]) -> dict[int, dict]:
        """Sortable-field values for a candidate id set via one pruned
        parquet read (never a corpus scan)."""
        want = [f for f in dict.fromkeys(fields) if f != "doc_id"]
        if not want or not self.docs_path or not doc_ids:
            return {d: {} for d in doc_ids}
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(self.docs_path).to_table(
            columns=["doc_id"] + want,
            filter=pc.field("doc_id").isin(doc_ids))
        rows = t.to_pylist()
        return {r["doc_id"]: {f: r[f] for f in want} for r in rows}

    def _apply_sort(self, hits: list[dict],
                    criteria: list[str]) -> list[dict]:
        """Meilisearch `sort` semantics: order by the criteria sequence,
        relevancy rank (the incoming order) breaking ties — stable sorts
        applied in reverse criteria order; docs missing a field go last
        under either direction."""
        vals = self._doc_fields(
            [h["doc_id"] for h in hits],
            [c.partition(":")[0] for c in criteria])
        for crit in reversed(criteria):
            fieldname, _, direction = crit.partition(":")

            def val(h):
                if fieldname == "doc_id":
                    return h["doc_id"]
                return vals.get(h["doc_id"], {}).get(fieldname)

            present = [h for h in hits if val(h) is not None]
            present.sort(key=val, reverse=direction == "desc")
            hits = present + [h for h in hits if val(h) is None]
        return hits

    def _filter_allowed(self, doc_ids: list[int],
                        dsl: "dict | str") -> set[int]:
        """Per-request metadata filter (reference SearchOptions.filters):
        evaluate the filter — a dict-DSL object OR a Meilisearch filter
        STRING (kernel/filter_lang.py grammar) — against the docs table
        restricted to the candidate ids (one pruned read, never a corpus
        scan)."""
        if not self.docs_path or not doc_ids:
            return set()
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from ..stages.filter_dsl import compile_filter, compile_filter_str

        base = (compile_filter_str(dsl) if isinstance(dsl, str)
                else compile_filter(dsl))
        expr = base & pc.field("doc_id").isin(doc_ids)
        t = pads.dataset(self.docs_path).to_table(columns=["doc_id"], filter=expr)
        return set(t["doc_id"].to_pylist())

    def _highlight_snippet(self, text: str, terms: list[str],
                           crop_length: int, crop_marker: str) -> str:
        """M19/M20 highlight with cropping (result_enhancer semantics via
        stages/highlights; crop window centered on the first match)."""
        from ..stages.highlights import extract_spans, highlight_text

        if not text:
            return ""
        spans = extract_spans(text, terms,
                              self.tokenizer.compound_parts or None)
        if not spans:
            crop = text[:crop_length]
            return crop + (crop_marker if len(text) > crop_length else "")
        first = spans[0]
        lo = max(0, first.start - crop_length // 4)
        hi = min(len(text), lo + crop_length)
        kept = [s for s in spans if s.start >= lo and s.end <= hi]
        # re-base span offsets into the crop window
        from ..stages.highlights import Span

        rebased = [Span(s.start - lo, s.end - lo, s.term, s.kind, s.confidence)
                   for s in kept]
        snippet = highlight_text(text[lo:hi], rebased)
        pre = crop_marker if lo > 0 else ""
        post = crop_marker if hi < len(text) else ""
        return pre + snippet + post

    # ---------------- ranking-algorithm registry (§2.10 extension point) ----

    def _rank_weighted(self, candidates: list[tuple], analysis: dict):
        """weighted_score (result_ranker.py:1025-1072): id-dedup keeping the
        best per the full reference tie-break order; content-similarity
        clustering is applied downstream by search()."""
        best: dict[int, tuple] = {}
        for cand in candidates:
            doc_id = cand[0]["doc_id"]
            cur = best.get(doc_id)
            if cur is None or self._tie_key(cand) < self._tie_key(cur):
                best[doc_id] = cand
        return sorted(best.values(), key=self._tie_key), len(best)

    def _rank_optimized(self, candidates: list[tuple], analysis: dict):
        """optimized_score (result_ranker.py:1074-1133): id-only dedup with
        the reference's DISJUNCTIVE tie-break (should_replace at :1099-1110):
        higher score wins; on equal score, replace if EITHER the variant/
        engine/weight comparison prefers the challenger OR the variant types
        match and the challenger sat at a lower position. (Yes: with equal
        types, position can override engine/weight — faithfully mirrored,
        not an ordered hierarchy.) The production fast path."""
        best: dict[int, tuple] = {}
        for cand in candidates:
            _hit, score, variant, pos = cand
            doc_id = cand[0]["doc_id"]
            cur = best.get(doc_id)
            if cur is None:
                best[doc_id] = cand
                continue
            _chit, cscore, cvariant, cpos = cur
            replace = score > cscore or (
                score == cscore
                and (
                    self._variant_precedes(variant, cvariant)
                    or (variant.variant_type == cvariant.variant_type
                        and pos < cpos)
                )
            )
            if replace:
                best[doc_id] = cand
        ranked = sorted(
            best.values(), key=lambda c: (-c[1], c[0]["doc_id"])
        )
        return ranked, len(best)

    def _rank_simple(self, candidates: list[tuple], analysis: dict):
        """simple_score (result_ranker.py:1183-1205): keep the highest score
        per doc id, sort by score."""
        best: dict[int, tuple] = {}
        for cand in candidates:
            doc_id = cand[0]["doc_id"]
            cur = best.get(doc_id)
            if cur is None or cand[1] > cur[1]:
                best[doc_id] = cand
        ranked = sorted(
            best.values(), key=lambda c: (-c[1], c[0]["doc_id"])
        )
        return ranked, len(best)

    def _rank_experimental(self, candidates: list[tuple], analysis: dict):
        """experimental_score (result_ranker.py:1207-1258): extra x1.2 boost
        for Thai-dominant queries, then best-score-per-doc."""
        boost = (
            EXPERIMENTAL_THAI_BOOST
            if analysis["thai_content_ratio"] > 0.7 else 1.0
        )
        boosted = [
            (hit, score * boost, variant, pos)
            for hit, score, variant, pos in candidates
        ]
        return self._rank_simple(boosted, analysis)

    _RANKERS = {
        "weighted_score": _rank_weighted,
        "optimized_score": _rank_optimized,
        "simple_score": _rank_simple,
        "experimental_score": _rank_experimental,
    }

    @staticmethod
    def _variant_precedes(v1: QueryVariant, v2: QueryVariant) -> bool:
        """result_ranker.py:1135-1181 _compare_variants_for_tie_breaking."""
        p1 = VARIANT_PRIORITY.get(v1.variant_type, 4)
        p2 = VARIANT_PRIORITY.get(v2.variant_type, 4)
        if p1 != p2:
            return p1 < p2
        e1 = ENGINE_PRIORITY.get(v1.engine, 4)
        e2 = ENGINE_PRIORITY.get(v2.engine, 4)
        if e1 != e2:
            return e1 < e2
        return v1.weight > v2.weight

    def search_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Quoted-phrase search (the reference's quoted variant; Meilisearch
        resolves it with positional data).

        Positional index available (store_positions=True build): true
        token-adjacency matching via SearchEngine.phrase_topk — no document
        text is read. Otherwise: (1) candidates = docs matching ALL phrase
        terms (posting intersection), (2) literal substring verification
        against the stored doc text (requires docs_path; works for
        no-whitespace Thai phrases because the check is substring)."""
        if getattr(self.engine, "has_positions", False):
            import re as _re

            return self.engine.phrase_topk(
                _re.sub(r"\s+", " ", phrase).strip(), k=k
            )
        if not self.docs_path:
            raise ValueError("phrase search requires docs_path (doc text store)")
        import re

        phrase = re.sub(r"\s+", " ", phrase).strip()
        terms = self.tokenizer.index_terms(self.tokenizer.tokenize(phrase))
        if not terms:
            return []
        # over-fetch candidates, then GROW the pool until k hits verify or
        # the AND candidate set is exhausted — a fixed cap would silently
        # miss true phrase hits that BM25 ranks below it
        p = phrase.lower()
        cap = max(k * 10, 100)
        while True:
            cands = self.engine.score_topk(terms, k=cap, match="all")
            if not cands:
                return []
            texts = self._doc_texts([d for d, _ in cands])
            out = [(d, s) for d, s in cands if p in texts.get(d, "").lower()]
            if len(out) >= k or len(cands) < cap:
                return out[:k]  # enough hits, or every AND candidate checked
            cap *= 4

    @staticmethod
    def _tie_key(cand: tuple):
        hit, score, variant, pos = cand
        return (
            -score,
            VARIANT_PRIORITY.get(variant.variant_type, 4),
            ENGINE_PRIORITY.get(variant.engine, 4),
            pos,
            -variant.weight,
            -hit.get("content_length", 0),  # prefer comprehensive docs (:543)
            hit["doc_id"],  # final deterministic break
        )


class FederatedSearch:
    """Multi-index federation — the Ray-side analog of Meilisearch's
    `POST /multi-search` with a `federation` object, which the reference's
    per-request `index_name` routing (search_proxy_service.py:174,306)
    delegates to Meilisearch for.

    A registry of named `SearchProxy` indexes answers one query (or
    per-index queries) across several indexes at once; hits merge into one
    globally-ranked list. Following Meilisearch's federated semantics, each
    index's raw BM25 scores are normalized to a [0, 1] ranking score
    (score / the index's top score for this query — BM25 magnitudes are
    corpus-dependent, so raw scores are not comparable across indexes),
    multiplied by the per-index federation `weight`, and interleaved by
    descending weightedRankingScore with deterministic tie-breaks
    (weighted score desc, index uid asc, doc_id asc). `facetsByIndex`-style
    attribution survives in `_federation.indexUid` on every hit.

    Scale shape: each member index is itself a sharded/doc-partitioned
    engine (index/serving.py); federation only merges the k-bounded heads,
    so its cost is O(n_indexes x k) regardless of corpus size."""

    def __init__(self, indexes: dict[str, "SearchProxy"]):
        if not indexes:
            raise ValueError("federation needs at least one index")
        self.indexes = dict(indexes)

    def multi_search(self, queries: list[dict], limit: int = 20,
                     offset: int = 0, fusion: str = "weighted",
                     rrf_k: int = 60) -> list[dict]:
        """`queries`: one entry per (index, query) pair, Meilisearch shape:
        {"indexUid": str, "q": str, "weight": float = 1.0,
         "options": SearchOptions | None}. Returns the federated hit list:
        each hit carries `_federation = {"indexUid", "weightedRankingScore"}`
        plus the member proxy's own hit fields.

        fusion="rrf": Reciprocal Rank Fusion (Cormack et al., SIGIR 2009)
        — the hybrid-retrieval combiner for indexes over the SAME doc
        space (e.g. a BM25 index federated with an ANN index): hits with
        one doc_id COMBINE, score = sum_i weight_i / (rrf_k + rank_i);
        scoreless-rank fusion, so per-index score magnitudes drop out
        entirely. Payload comes from the best-ranked source; every
        contributing index's rank survives in `_federation.ranks`."""
        if fusion == "rrf":
            return self._multi_search_rrf(queries, limit, offset, rrf_k)
        if fusion != "weighted":
            raise ValueError(f"unknown fusion {fusion!r}")
        merged: list[tuple] = []
        for pos, q in enumerate(queries):
            uid = q["indexUid"]
            if uid not in self.indexes:
                raise KeyError(f"unknown index {uid!r}; registered: "
                               f"{sorted(self.indexes)}")
            weight = float(q.get("weight", 1.0))
            if weight == 0.0:
                continue  # weight 0 excludes the index, Meilisearch-style
            hits = self.indexes[uid].search(
                q["q"], k=limit + offset, options=q.get("options"))
            if not hits:
                continue
            top = max(h["score"] for h in hits)
            for h in hits:
                norm = (h["score"] / top) if top > 0 else 0.0
                wscore = round(norm * weight, 9)  # stable across fp noise
                merged.append((-wscore, uid, h["doc_id"], pos, h, wscore))
        merged.sort(key=lambda t: t[:4])
        out = []
        for _neg, uid, _doc, _pos, h, wscore in merged[offset:offset + limit]:
            hit = dict(h)
            hit["_federation"] = {"indexUid": uid,
                                  "weightedRankingScore": wscore}
            out.append(hit)
        return out

    def _multi_search_rrf(self, queries: list[dict], limit: int,
                          offset: int, rrf_k: int) -> list[dict]:
        agg: dict = {}
        for pos, q in enumerate(queries):
            uid = q["indexUid"]
            if uid not in self.indexes:
                raise KeyError(f"unknown index {uid!r}; registered: "
                               f"{sorted(self.indexes)}")
            weight = float(q.get("weight", 1.0))
            if weight == 0.0:
                continue
            hits = self.indexes[uid].search(
                q["q"], k=limit + offset, options=q.get("options"))
            for rank, h in enumerate(hits, start=1):
                rec = agg.setdefault(h["doc_id"], {
                    "score": 0.0, "ranks": {}, "best": None})
                rec["score"] += weight / (rrf_k + rank)
                rec["ranks"][uid] = rank
                cand = (rank, pos, uid, h)
                if rec["best"] is None or cand[:3] < rec["best"][:3]:
                    rec["best"] = cand
        ordered = sorted(agg.items(),
                         key=lambda kv: (-kv[1]["score"], kv[0]))
        out = []
        for doc_id, rec in ordered[offset:offset + limit]:
            hit = dict(rec["best"][3])
            hit["_federation"] = {
                "indexUid": rec["best"][2],
                "rrfScore": round(rec["score"], 9),
                "ranks": dict(sorted(rec["ranks"].items())),
            }
            out.append(hit)
        return out

    def search(self, query: str, limit: int = 20, offset: int = 0,
               weights: dict[str, float] | None = None,
               fusion: str = "weighted") -> list[dict]:
        """One query fanned out to EVERY registered index (the common
        federated case), with optional per-index weights."""
        weights = weights or {}
        qs = [{"indexUid": uid, "q": query,
               "weight": weights.get(uid, 1.0)}
              for uid in sorted(self.indexes)]
        return self.multi_search(qs, limit=limit, offset=offset,
                                 fusion=fusion)
