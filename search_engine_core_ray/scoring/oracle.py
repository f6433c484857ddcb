"""Naive full-scan BM25 oracle — the rank-identity reference.

A deliberately simple, loop-per-document implementation of the
reference's scoring pipeline, used ONLY in tests and conformance checks
against the distributed engine (SURVEY.md §7.3 step 6). It shares no
retrieval or scoring code with the engine: candidates come from per-doc
predicate evaluation, scores from scalar Python arithmetic.

Semantics reproduced (file:line under /root/reference):
- corpus stats: N; avgdl = mean bytes of content+title+description;
  df over the per-doc union of field terms
  (BM25Algorithm::updateCorpusStatistics, SearchScorer.cpp:225-255).
- per-term, per-field BM25: idf = log((N-df+0.5)/(df+0.5)) — may go
  negative, no floor; tf' = tf(k1+1)/(tf + k1(1-b+b*len_f/avgdl)) with
  len_f in BYTES; field score += idf*tf'*weight_f
  (calculateBM25Score, :257-274; scoreDocument, :129-223).
- keywords: +weight_keywords once per query term contained in the
  keyword list (:181-188).
- exact phrases: +exact_boost*weight_title if lowercased phrase is in
  lowercased title, +exact_boost*weight_content likewise for content
  (:194-202).
- totalScore = title+content+description+keyword + exact; multiplied by
  baseScore (content quality) when > 0 (:204-211).
- boosts: +1.2 for github.com/stackoverflow.com, +1.5 if any term is a
  CASE-SENSITIVE substring of the raw title; total *= (1+boost)
  (applyBoosts, :502-525).
- drop totalScore < min_score (0.01), min-max normalize to [0,1],
  sort descending, truncate to top-k (scoreResults/rankResults,
  :562-622). Ties are broken by ascending doc_id (the reference's
  unstable std::sort leaves tie order unspecified; both our engine and
  oracle canonicalize identically).

Frozen deviations (shared by engine AND oracle, so rank-identity tests
cannot catch them — documented instead, like the tie-order note):
- tf counting: the reference's countTermOccurrences scans for
  ``\\bterm\\b`` word-boundary regex hits on the RAW field text
  (SearchScorer.cpp:527-560); we count analyzer tokens. Divergence
  cases: underscore-adjacent occurrences ("foo_bar" — reference tf=0
  for "foo", ours tf>0 since '_' splits tokens) and terms that are
  prefixes of non-ASCII words ("naïve" — the reference's \\b matches
  before the non-ASCII byte so term "na" gets tf>0; our tokenizer never
  emits that match).
- keyword matching: the reference runs the same regex per keyword;
  kw == term equality (used here) agrees on its punctuation-free
  keyword set but not on keywords containing non-ASCII bytes.
"""

from __future__ import annotations

import math
import string
from dataclasses import dataclass, field

from collections import Counter

from ..functions.analyzers import analyze
from ..query.parser import And, Filter, Or, Term, parse_query
from ..query.plan import exact_phrases, normalize_filter_field, scoring_terms
from .config import AUTHORITY_DOMAINS, ScoringConfig

_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)


def _lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


@dataclass
class OracleDoc:
    doc_id: int
    url: str
    title: str
    content: str
    description: str
    keywords: list[str]
    domain: str
    quality: float  # baseScore
    lang: str = "en"
    category: str = ""  # SiteProfile.category (optional in the reference)
    # derived
    title_tf: dict = field(default_factory=dict)
    content_tf: dict = field(default_factory=dict)
    desc_tf: dict = field(default_factory=dict)
    term_union: set = field(default_factory=set)

    def finish(self, analyzer: str = "default") -> "OracleDoc":
        self.title_tf = dict(Counter(analyze(self.title, analyzer)))
        self.content_tf = dict(Counter(analyze(self.content, analyzer)))
        self.desc_tf = dict(Counter(analyze(self.description, analyzer)))
        self.term_union = (
            set(self.title_tf) | set(self.content_tf) | set(self.desc_tf)
        )
        return self


class BM25Oracle:
    """Full-scan scorer oracle; ``algorithm`` selects the reference's
    pluggable ScoringAlgorithm (SearchScorer.h:125-222):

    - "bm25"      BM25Algorithm (default engine algorithm)
    - "tfidf"     TFIDFAlgorithm — log(N/df) idf with df default 1;
                  tf = min(tf, max_tf) -> log(1+tf) -> / field BYTE length;
                  no keyword scoring; phrase boosts are unweighted
                  (title +boost, content +boost*0.5)
                  (SearchScorer.cpp:278-382)
    - "combined"  RedisSearchCombinedAlgorithm — BM25 then
                  total = baseScore*0.3 + total*0.7 when baseScore > 0
                  (SearchScorer.cpp:384-415)

    applyBoosts / min-score / normalization apply identically after any
    algorithm (SearchScorer::scoreResults, :562-601).
    """

    def __init__(
        self,
        docs: list[OracleDoc],
        config: ScoringConfig | None = None,
        update_corpus_stats: bool = True,
        algorithm: str = "bm25",
        analyzer: str = "default",
    ):
        """``update_corpus_stats=False`` reproduces the reference's
        never-updated BM25Algorithm defaults — N=1000, avgdl=100
        (SearchScorer.h:158-159) and df=0 for every term (the
        ``documentFrequencies_[term]`` operator[] default) — which is the
        state the reference's own scorer tests run in
        (tests/scoring/test_search_scorer.cpp never calls
        updateCorpusStatistics)."""
        self.config = config or ScoringConfig.create_default()
        self.algorithm = algorithm
        self.analyzer = analyzer
        self.docs = [d.finish(analyzer) for d in docs]
        self.df: dict[str, int] = {}
        if update_corpus_stats:
            self.total_docs = len(self.docs)
            total_len = 0.0
            self.df_tc: dict[str, int] = {}
            for d in self.docs:
                total_len += (
                    len(d.content.encode()) + len(d.title.encode()) + len(d.description.encode())
                )
                for t in d.term_union:
                    self.df[t] = self.df.get(t, 0) + 1
                # TFIDFAlgorithm counts df over title+content ONLY
                # (updateDocumentFrequencies, SearchScorer.cpp:358-375)
                for t in set(d.title_tf) | set(d.content_tf):
                    self.df_tc[t] = self.df_tc.get(t, 0) + 1
            self.avgdl = total_len / self.total_docs if self.total_docs else 100.0
        else:
            self.total_docs = 1000
            self.avgdl = 100.0
            self.df_tc = {}

    # ---- retrieval -----------------------------------------------------
    def _matches(self, doc: OracleDoc, node) -> bool:
        if isinstance(node, Term):
            toks = analyze(node.value, self.analyzer)
            if not toks:
                return False
            if not all(t in doc.term_union for t in toks):
                return False
            if node.exact:
                p = _lower(node.value)
                return (
                    p in _lower(doc.title)
                    or p in _lower(doc.content)
                    or p in _lower(doc.description)
                )
            return True
        if isinstance(node, Filter):
            fld = normalize_filter_field(node.field)
            if fld == "domain":
                return doc.domain == node.value
            if fld == "lang":
                return doc.lang == node.value
            if fld == "category":
                return doc.category == node.value
            if fld == "keywords":
                return node.value in doc.keywords
            return False
        if isinstance(node, And):
            return all(self._matches(doc, c) for c in node.children)
        if isinstance(node, Or):
            return any(self._matches(doc, c) for c in node.children)
        return False

    # ---- scoring -------------------------------------------------------
    def _bm25(self, tf: int, doc_len: int, df: int) -> float:
        if tf == 0 or self.total_docs == 0:
            return 0.0
        p = self.config.bm25_params
        idf = math.log((self.total_docs - df + 0.5) / (df + 0.5))
        norm_len = doc_len / self.avgdl
        tf_comp = (tf * (p.k1 + 1)) / (tf + p.k1 * (1 - p.b + p.b * norm_len))
        return idf * tf_comp

    def _tfidf_idf(self, term: str) -> float:
        if self.total_docs == 0:
            return 0.0
        # df over title+content only; default 1 when unseen
        df = self.df_tc.get(term) or 1
        return math.log(self.total_docs / df)

    def _tf_norm(self, tf: int, field_len: int) -> float:
        p = self.config.tf_params
        score = float(min(tf, p.max_term_frequency))
        if p.use_log_normalization:
            score = math.log(1.0 + score)
        if p.normalize_by_length and field_len > 0:
            score /= field_len
        return score

    def _score_doc_tfidf(self, doc: OracleDoc, terms: list[str], phrases: list[str]) -> float:
        w = self.config.field_weights
        title_score = content_score = desc_score = 0.0
        for term in terms:
            idf = self._tfidf_idf(term)
            tf_t = doc.title_tf.get(term, 0)
            if tf_t > 0:
                title_score += self._tf_norm(tf_t, len(doc.title.encode())) * idf * w.title
            tf_c = doc.content_tf.get(term, 0)
            if tf_c > 0:
                content_score += self._tf_norm(tf_c, len(doc.content.encode())) * idf * w.content
            if doc.description:
                tf_d = doc.desc_tf.get(term, 0)
                if tf_d > 0:
                    desc_score += self._tf_norm(tf_d, len(doc.description.encode())) * idf * w.description
        exact_score = 0.0
        for phrase in phrases:
            p = _lower(phrase)
            if p in _lower(doc.title):
                exact_score += self.config.boost_factors.exact_match_boost
            if p in _lower(doc.content):
                exact_score += self.config.boost_factors.exact_match_boost * 0.5
        total = title_score + content_score + desc_score + exact_score
        if doc.quality > 0:
            total *= doc.quality
        boost = 0.0
        if doc.domain in AUTHORITY_DOMAINS:
            boost += self.config.boost_factors.domain_authority_boost
        if any(term in doc.title for term in terms):
            boost += self.config.boost_factors.title_match_boost
        total *= 1.0 + boost
        return total

    def score_doc(self, doc: OracleDoc, terms: list[str], phrases: list[str]) -> float:
        if self.algorithm == "tfidf":
            return self._score_doc_tfidf(doc, terms, phrases)
        return self._score_doc_bm25(doc, terms, phrases, combined=self.algorithm == "combined")

    def _score_doc_bm25(
        self, doc: OracleDoc, terms: list[str], phrases: list[str], combined: bool = False
    ) -> float:
        w = self.config.field_weights
        title_score = content_score = desc_score = kw_score = 0.0
        for term in terms:
            df = self.df.get(term, 0)
            tf_t = doc.title_tf.get(term, 0)
            if tf_t > 0:
                title_score += self._bm25(tf_t, len(doc.title.encode()), df) * w.title
            tf_c = doc.content_tf.get(term, 0)
            if tf_c > 0:
                content_score += self._bm25(tf_c, len(doc.content.encode()), df) * w.content
            if doc.description:
                tf_d = doc.desc_tf.get(term, 0)
                if tf_d > 0:
                    desc_score += self._bm25(tf_d, len(doc.description.encode()), df) * w.description
            for kw in doc.keywords:
                # countTermOccurrences(keyword, term) > 0 on a single
                # punctuation-free keyword == exact equality
                if kw == term:
                    kw_score += 1.0 * w.keywords
                    break
        exact_score = 0.0
        for phrase in phrases:
            p = _lower(phrase)
            if p in _lower(doc.title):
                exact_score += self.config.boost_factors.exact_match_boost * w.title
            if p in _lower(doc.content):
                exact_score += self.config.boost_factors.exact_match_boost * w.content
        total = title_score + content_score + desc_score + kw_score + exact_score
        if doc.quality > 0:
            total *= doc.quality
        if combined and doc.quality > 0:
            # 30% Redis base score + 70% custom (SearchScorer.cpp:400-407)
            total = doc.quality * 0.3 + total * 0.7
        # applyBoosts
        boost = 0.0
        if doc.domain in AUTHORITY_DOMAINS:
            boost += self.config.boost_factors.domain_authority_boost
        if any(term in doc.title for term in terms):  # case-sensitive find
            boost += self.config.boost_factors.title_match_boost
        total *= 1.0 + boost
        return total

    # ---- SearchScorer::scoreResults / rankResults (no retrieval) -------
    def score_results(self, query: str) -> list[tuple[int, float]]:
        """Score EVERY doc against the query (the reference's
        scoreResults path, where Redis supplied the doc set), with
        min-score filter + normalization; unsorted."""
        ast = parse_query(query)
        terms = scoring_terms(ast, self.analyzer)
        phrases = exact_phrases(ast)
        scored = [(d.doc_id, self.score_doc(d, terms, phrases)) for d in self.docs]
        scored = [(i, s) for i, s in scored if s >= self.config.min_score]
        if scored and self.config.normalize_scores:
            vals = [s for _, s in scored]
            lo, hi = min(vals), max(vals)
            rng = hi - lo
            if rng > 0:
                scored = [(i, (s - lo) / rng) for i, s in scored]
        return scored

    def rank_results(self, query: str, top_k: int = 0) -> list[tuple[int, float]]:
        scored = self.score_results(query)
        scored.sort(key=lambda t: (-t[1], t[0]))
        if top_k and len(scored) > top_k:
            scored = scored[:top_k]
        return scored

    # ---- rank ----------------------------------------------------------
    def rank(self, query: str, top_k: int = 0) -> list[tuple[int, float]]:
        """-> [(doc_id, score)] sorted desc, normalized, top-k applied."""
        ast = parse_query(query)
        terms = scoring_terms(ast, self.analyzer)
        phrases = exact_phrases(ast)
        if not terms and not phrases:
            # pure-filter query: score = baseScore, unfiltered,
            # unnormalized (see SearchEngine.search for the rationale)
            scored = [
                (doc.doc_id, doc.quality)
                for doc in self.docs
                if self._matches(doc, ast)
            ]
            scored.sort(key=lambda t: (-t[1], t[0]))
            if top_k and len(scored) > top_k:
                scored = scored[:top_k]
            return scored
        scored: list[tuple[int, float]] = []
        for doc in self.docs:
            if not self._matches(doc, ast):
                continue
            s = self.score_doc(doc, terms, phrases)
            scored.append((doc.doc_id, s))
        scored = [(i, s) for i, s in scored if s >= self.config.min_score]
        # NOTE reference: remove_if(s < minScore) keeps s == minScore;
        # we mirror with >=.
        if scored and self.config.normalize_scores:
            vals = [s for _, s in scored]
            lo, hi = min(vals), max(vals)
            rng = hi - lo
            if rng > 0:
                scored = [(i, (s - lo) / rng) for i, s in scored]
        scored.sort(key=lambda t: (-t[1], t[0]))
        if top_k and len(scored) > top_k:
            scored = scored[:top_k]
        return scored
