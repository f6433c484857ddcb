"""Pure text-processing functions with semantics frozen from the reference.

Every function documents the reference location (file:line under
/root/reference) whose observable behavior it reproduces. These are the
*scalar* definitions; the vectorized per-batch versions used in hot Ray
stages live in ``stages/`` (polars/numpy kernels) and are conformance-
tested against these.
"""

from __future__ import annotations

import re
import string
from collections import Counter

# Tokenizer: maximal runs of ASCII alphanumerics, length >= 2.
# Reference: scoring_utils::extractTerms, src/scoring/SearchScorer.cpp:692-712
# (isalnum is ASCII-only there: bytes >= 0x80 act as separators, which is
# exactly what an ASCII character class gives us on a Python str).
_TERM_RE = re.compile(r"[A-Za-z0-9]{2,}")

# Whitespace token ("istream >> word") — C locale whitespace.
_WS_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")

# ASCII-only lowercase (reference uses ::tolower on bytes; multi-byte UTF-8
# sequences pass through unchanged).
_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

# ASCII punctuation set (C ispunct).
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)

# The ~40-word stoplist used by keyword extraction.
# Reference: src/storage/ContentStorage.cpp:47-66.
STOPWORDS_40 = frozenset(
    """the and for are but not you all can had her was one our out day get
    has him his how its may new now old see two who boy did she use man
    way""".split()
)


def extract_terms(text: str) -> list[str]:
    """Tokenize ``text`` into lowercase ASCII-alnum runs of length >= 2.

    Reference: src/scoring/SearchScorer.cpp:692-712 (extractTerms).
    """
    return [t.translate(_ASCII_LOWER) for t in _TERM_RE.findall(text)]


def term_frequencies(text: str) -> dict[str, int]:
    """Term -> count map for one text.

    Reference: src/scoring/SearchScorer.cpp:714-723.
    """
    return dict(Counter(extract_terms(text)))


def utf8_len(text: str) -> int:
    """Length in BYTES of the UTF-8 encoding — the reference measures
    ``std::string::length()`` which is bytes, and feeds it into BM25 doc
    length and content-quality (SearchScorer.cpp:148-160, 233-235;
    ContentStorage.cpp:200-205)."""
    return len(text.encode("utf-8"))


def count_words(text: str) -> int:
    """Whitespace-delimited token count.

    Reference: countWords, src/storage/ContentStorage.cpp:27-35.
    """
    return len(_WS_TOKEN_RE.findall(text))


def content_quality(text: str | None, success: bool = True) -> float:
    """min(1.0, utf8_len(text)/10000) when successful and non-empty, else 0.

    Reference: src/storage/ContentStorage.cpp:200-205.
    """
    if not success or not text:
        return 0.0
    return min(1.0, utf8_len(text) / 10000.0)


def extract_keywords(text: str, max_keywords: int = 10) -> list[str]:
    """Top-N keywords by frequency.

    Reference: extractKeywords, src/storage/ContentStorage.cpp:38-79:
    whitespace-split words, strip ASCII punctuation, ASCII-lowercase, keep
    words longer than 3 bytes that are not in the ~40-word stoplist, count,
    sort by frequency descending, take top N.

    The reference's std::sort is unstable so tie order among equal counts
    is unspecified there; we canonicalize ties by ascending word so output
    is deterministic (documented deviation, asserted in tests).
    """
    counts: Counter[str] = Counter()
    for raw in _WS_TOKEN_RE.findall(text):
        word = raw.translate(_PUNCT_TABLE).translate(_ASCII_LOWER)
        if len(word.encode("utf-8")) > 3 and word not in STOPWORDS_40:
            counts[word] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [w for w, _ in ranked[:max_keywords]]


def jaccard_similarity(terms1: list[str], terms2: list[str]) -> float:
    """Jaccard similarity of two term lists (as sets).

    Reference: scoring_utils::calculateJaccardSimilarity,
    src/scoring/SearchScorer.cpp:649-666.
    """
    if not terms1 or not terms2:
        return 0.0
    s1, s2 = set(terms1), set(terms2)
    return len(s1 & s2) / len(s1 | s2)


def searchable_content(title: str | None, meta_description: str | None, text: str | None) -> str:
    """Weighted flat document text: title twice, then description, then body.

    Reference: extractSearchableContent, src/storage/ContentStorage.cpp:210-230.
    Kept for parity; the engine indexes fields separately instead.
    """
    parts: list[str] = []
    if title:
        parts.append(title + " ")
        parts.append(title + " ")
    if meta_description:
        parts.append(meta_description + " ")
    if text:
        parts.append(text)
    return "".join(parts)
