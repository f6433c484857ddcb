"""Analyzer registry: tokenization + optional term transforms.

The reference has exactly one analyzer (scoring_utils::extractTerms —
ASCII-alnum runs, lowercased, len >= 2); that is the "default" here and
what every conformance fixture pins. The registry is the
language-aware hook SURVEY.md §7.3 step 2 calls for: an index built
with ``analyzer="en_stem"`` stems terms at BUILD and QUERY time (the
analyzer name is recorded in the manifest so the query side always
matches), letting "running" match documents containing "run".

"en_stem" is a deliberately small, deterministic suffix stripper (not
Porter): ies->y, sses->ss, drop trailing s (not ss), strip ing/ed on
long-enough stems. Each rule is a single anchored regex so the polars
(Rust-regex, no lookbehind) and Python paths apply IDENTICAL rewrites.
"""

from __future__ import annotations

import re

from .textproc import extract_terms

# (pattern, replacement) applied in order to each token — full-token
# anchored; identical semantics in Python re and polars replace_all.
_STEM_RULES: list[tuple[str, str]] = [
    (r"^([a-z0-9]{2,})ies$", r"\1y"),
    (r"^([a-z0-9]{2,})sses$", r"\1ss"),
    (r"^([a-z0-9]{2,}[^s])s$", r"\1"),
    (r"^([a-z0-9]{4,})ing$", r"\1"),
    (r"^([a-z0-9]{3,})ed$", r"\1"),
]
_STEM_COMPILED = [(re.compile(p), r.replace("\\1", "\\g<1>")) for p, r in _STEM_RULES]

ANALYZERS = ("default", "en_stem")


def stem_token(tok: str) -> str:
    # rules apply SEQUENTIALLY (each sees the previous rule's output) —
    # the exact same chain the vectorized polars path applies
    for rx, rep in _STEM_COMPILED:
        tok = rx.sub(rep, tok)
    return tok


def analyze(text: str, analyzer: str = "default") -> list[str]:
    toks = extract_terms(text)
    if analyzer == "default":
        return toks
    if analyzer == "en_stem":
        return [stem_token(t) for t in toks]
    raise ValueError(f"unknown analyzer {analyzer!r}")


def polars_term_expr(col_expr, analyzer: str = "default"):
    """Vectorized twin: token-column expression -> analyzed terms.
    MUST stay behavior-identical to ``analyze`` (conformance-tested)."""
    import polars as pl  # noqa: F401

    if analyzer == "default":
        return col_expr
    if analyzer == "en_stem":
        out = col_expr
        for pat, rep in _STEM_RULES:
            out = out.str.replace(pat, rep.replace("\\1", "${1}"))
        return out
    raise ValueError(f"unknown analyzer {analyzer!r}")
