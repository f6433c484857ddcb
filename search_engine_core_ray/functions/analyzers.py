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

"de_stem" is the same construction for German-style inflection (the
light suffix tier of the published German snowball stemmer: -en/-ern/
-er/-es/-em then -e/-n/-s), demonstrating a NON-English analyzer in
the registry.  Tokens are ASCII-alnum runs (reference tokenizer), so
umlauts have already split tokens upstream — the rules operate on the
ASCII material that survives, same as the reference would see.

Per-language dispatch: anywhere an analyzer is accepted, a MAPPING
{lang: analyzer_name, "*": fallback} may be used instead of a plain
name.  At BUILD time each document's ``lang`` column picks its
analyzer (vectorized when/then chain); at QUERY time the engine
resolves the mapping with its session's ``query_lang`` (falling back
to "*").  The mapping is manifest-recorded like a plain analyzer so
build and query sides always agree.
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

# German light suffix tier (snowball step-1 suffix classes), applied
# sequentially like the English rules: tagen->tag, kindern->kind,
# hundes->hund, blume->blum.  Min stem lengths (3 for the big-suffix
# tier, 4 for the single-letter tier) keep short function words (der,
# und, die, ein, von) intact.
_DE_STEM_RULES: list[tuple[str, str]] = [
    (r"^([a-z0-9]{3,})(?:ern|en|er|es|em)$", r"\1"),
    (r"^([a-z0-9]{4,})(?:e|n|s)$", r"\1"),
]

_RULES_BY_ANALYZER: dict[str, list[tuple[str, str]]] = {
    "en_stem": _STEM_RULES,
    "de_stem": _DE_STEM_RULES,
}
_COMPILED_BY_ANALYZER = {
    name: [(re.compile(p), r.replace("\\1", "\\g<1>")) for p, r in rules]
    for name, rules in _RULES_BY_ANALYZER.items()
}
_STEM_COMPILED = _COMPILED_BY_ANALYZER["en_stem"]

ANALYZERS = ("default", "en_stem", "de_stem")


def resolve_analyzer(spec, lang: str | None = None) -> str:
    """A plain analyzer name resolves to itself; a per-language mapping
    resolves via ``lang`` with the "*" entry (default "default") as the
    fallback.  The resolved name must be registered."""
    if isinstance(spec, str):
        name = spec
    else:
        name = spec.get(lang) or spec.get("*", "default")
    if name not in ANALYZERS:
        raise ValueError(f"unknown analyzer {name!r}")
    return name


def stem_token(tok: str, analyzer: str = "en_stem") -> str:
    # rules apply SEQUENTIALLY (each sees the previous rule's output) —
    # the exact same chain the vectorized polars path applies
    for rx, rep in _COMPILED_BY_ANALYZER[analyzer]:
        tok = rx.sub(rep, tok)
    return tok


def analyze(text: str, analyzer: str = "default") -> list[str]:
    toks = extract_terms(text)
    if analyzer == "default":
        return toks
    if analyzer in _RULES_BY_ANALYZER:
        return [stem_token(t, analyzer) for t in toks]
    raise ValueError(f"unknown analyzer {analyzer!r}")


def polars_term_expr(col_expr, analyzer: str = "default"):
    """Vectorized twin: token-column expression -> analyzed terms.
    MUST stay behavior-identical to ``analyze`` (conformance-tested)."""
    import polars as pl  # noqa: F401

    if analyzer == "default":
        return col_expr
    if analyzer in _RULES_BY_ANALYZER:
        out = col_expr
        for pat, rep in _RULES_BY_ANALYZER[analyzer]:
            out = out.str.replace(pat, rep.replace("\\1", "${1}"))
        return out
    raise ValueError(f"unknown analyzer {analyzer!r}")


def polars_term_expr_dispatch(col_expr, spec, lang_expr):
    """Vectorized per-language dispatch over a token column: each row's
    ``lang`` picks its analyzer from ``spec`` (mapping or plain name),
    falling back to the "*" entry.  One when/then branch per mapped
    language — vectorized end to end, no row loop."""
    import polars as pl

    if isinstance(spec, str):
        return polars_term_expr(col_expr, spec)
    fallback = resolve_analyzer(spec, None)
    out = polars_term_expr(col_expr, fallback)
    for lang in sorted(k for k in spec if k != "*"):
        out = (
            pl.when(lang_expr == lang)
            .then(polars_term_expr(col_expr, resolve_analyzer(spec, lang)))
            .otherwise(out)
        )
    return out
