"""Shared query semantics: AST -> scoring terms / phrases / match rules.

The reference splits query handling between RediSearch (retrieval:
FT.SEARCH on the serialized AST — src/storage/RedisSearchStorage.cpp:219-263)
and SearchScorer (scoring: extractQueryInfo over the raw string —
src/scoring/SearchScorer.cpp:475-500). Our engine fuses them; the frozen
semantics, mirrored by both the distributed engine and the full-scan
oracle (which implement them INDEPENDENTLY so conformance tests are
meaningful):

Retrieval (candidate set), per AST node:
- Term(exact=False, v): every token of extract_terms(v) occurs in the
  doc's title/content/description term union (the reference's df-union,
  SearchScorer.cpp:237-247). A term that yields no tokens matches nothing.
- Term(exact=True, phrase): all phrase tokens occur in the union AND the
  ASCII-lowercased phrase is a substring of lowercased title, content or
  description (containsExactPhrase semantics, SearchScorer.cpp:116-125,
  applied as retrieval gate).
- Filter(field, v): metadata equality on the RAW value (the reference
  lexer does not normalize filter values): field 'domain' (alias of
  site:) matches doc.domain; 'language'/'lang' matches doc.lang;
  'category' matches doc.category (@category:{v} TAG,
  RedisSearchStorage.cpp:235-238); 'keywords' matches docs whose
  keyword list contains v (@keywords:{v} TAG, :104, :152-160);
  anything else matches nothing.
- And: intersection of children; Or: union (QueryParser.cpp:270-286).

Scoring (on the candidate set):
- scoring terms = extract_terms of each Term node's value (exact and
  non-exact), in AST order, duplicates kept — mirroring
  extractQueryInfo's term list for operator-free queries. Filter
  fields/values never score (documented deviation from the reference's
  raw-string extraction, which would also score the literal words
  'site'/'and'; the reference only ever feeds operator-free strings to
  its scorer, so the behaviors agree on its query set).
- exact phrases = values of Term(exact=True) in order.
"""

from __future__ import annotations

from ..functions.analyzers import analyze
from .parser import And, Filter, Or, Term


def walk_terms(ast) -> list[Term]:
    out: list[Term] = []

    def rec(node):
        if isinstance(node, Term):
            out.append(node)
        elif isinstance(node, (And, Or)):
            for c in node.children:
                rec(c)

    rec(ast)
    return out


def scoring_terms(ast, analyzer: str = "default") -> list[str]:
    terms: list[str] = []
    for t in walk_terms(ast):
        terms.extend(analyze(t.value, analyzer))
    return terms


def exact_phrases(ast) -> list[str]:
    return [t.value for t in walk_terms(ast) if t.exact]


def normalize_filter_field(field: str) -> str:
    if field in ("language", "lang"):
        return "lang"
    return field
