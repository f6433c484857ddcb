"""Typo-tolerant term matching over the corpus lexicon.

The reference's query surface exposes prefix suggest
(include/search_engine/storage/RedisSearchStorage.h:100 ``suggest``);
the RediSearch backend it targets also ships ``%term%`` fuzzy matching.
This module re-expresses that capability Ray-Data-first: for each query
term, the top-k lexicon terms within edit distance <= ``max_dist``,
ranked by (distance asc, df desc, term asc) — distance first, then the
more common term wins, with the term itself as the deterministic tie.

100-TB shape: the probe side (a handful of query terms) is broadcast
into the kernel closure; the lexicon side is VOCABULARY-bounded, not
corpus-proportional, and streams through ``map_batches``.  Inside a
batch a vectorized length-band prefilter (|len(t) - len(q)| <= max_dist
is a necessary condition for distance <= max_dist) cuts the candidate
set before any DP runs; only survivors pay the per-candidate
capped-band DP.  The per-query fold is ``grouped_topk`` (bounded
groups = query terms), so no global sort ever happens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.shuffle import grouped_topk


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Unit-cost edit distance (insert/delete/substitute) — the same
    definition DuckDB's ``levenshtein()`` implements, verified by a
    randomized cross-check in tests.  With ``cap`` set, results at or
    below ``cap`` are exact; anything larger may be returned as any
    value > cap (the DP exits early) — callers only test ``<= cap``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, start=1):
            cur[j] = min(
                prev[j] + 1,          # delete from a
                cur[j - 1] + 1,       # insert into a
                prev[j - 1] + (ca != cb),  # substitute
            )
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[lb]


_CAND_SCHEMA = pa.schema(
    [
        ("query_term", pa.string()),
        ("term", pa.string()),
        ("dist", pa.int64()),
        ("df", pa.int64()),
    ]
)


def make_fuzzy_kernel(query_terms: tuple[str, ...] | list[str], max_dist: int = 2):
    """``map_batches`` kernel over (term, df) lexicon batches ->
    candidate rows (query_term, term, dist, df) with dist <= max_dist."""
    q_items = [(q, len(q)) for q in query_terms]

    def kernel(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.fromiter((len(t) for t in terms), np.int64, count=len(terms))
        oq: list[str] = []
        ot: list[str] = []
        od: list[int] = []
        odf: list[int] = []
        for q, ql in q_items:
            band = np.abs(lens - ql) <= max_dist
            for t, df in zip(terms[band], dfs[band]):
                d = levenshtein(q, t, cap=max_dist)
                if d <= max_dist:
                    oq.append(q)
                    ot.append(t)
                    od.append(d)
                    odf.append(int(df))
        return pa.table(
            {
                "query_term": pa.array(oq, pa.string()),
                "term": pa.array(ot, pa.string()),
                "dist": pa.array(od, pa.int64()),
                "df": pa.array(odf, pa.int64()),
            }
        )

    return kernel


def term_deletes(term: str, max_dist: int) -> set[str]:
    """All strings reachable from ``term`` by deleting up to
    ``max_dist`` characters (the term itself included) — the SymSpell
    deletion neighborhood (Garbe's symmetric-delete algorithm).
    Correctness note: lev(a, b) = s subs + i ins + d dels <= k implies
    the aligned common part is reachable from a by deleting s+d <= k
    chars and from b by deleting s+i <= k chars, so two terms within
    edit distance k ALWAYS share a deletion variant at depth k."""
    frontier = {term}
    out = {term}
    for _ in range(max_dist):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                v = t[:i] + t[i + 1 :]
                if v not in out:
                    nxt.add(v)
        out |= nxt
        frontier = nxt
    return out


def make_symspell_kernel(
    query_terms: tuple[str, ...] | list[str], max_dist: int = 2
):
    """``map_batches`` kernel over (term, df) lexicon batches using the
    SymSpell deletion index INSIDE the batch: explode each lexicon
    term's deletion neighborhood, hash-join it against the (tiny,
    closure-broadcast) query deletion table, verify survivors with the
    exact DP.  Per-batch cost is candidates-only — no per-(query, term)
    scan — which is the shape that matters when the query side is a
    dictionary of thousands of misspellings, not four probes."""
    import polars as pl

    qrows = [
        {"dkey": d, "query_term": q}
        for q in query_terms
        for d in term_deletes(q, max_dist)
    ]
    qdel = pl.DataFrame(qrows, schema={"dkey": pl.String, "query_term": pl.String})

    def kernel(batch: pa.Table) -> pa.Table:
        t = pl.from_arrow(batch)
        if t.height == 0:
            return pa.table(
                {"query_term": pa.array([], pa.string()),
                 "term": pa.array([], pa.string()),
                 "dist": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64())}
            )
        expl = (
            t.with_columns(
                pl.col("term")
                .map_elements(
                    lambda s: list(term_deletes(s, max_dist)),
                    return_dtype=pl.List(pl.String),
                )
                .alias("dkey")
            )
            .explode("dkey")
            .join(qdel, on="dkey")
            .unique(subset=["query_term", "term"])
        )
        oq, ot, od, odf = [], [], [], []
        for q, term, df in zip(
            expl["query_term"].to_list(), expl["term"].to_list(),
            expl["df"].to_list(),
        ):
            d = levenshtein(q, term, cap=max_dist)
            if d <= max_dist:
                oq.append(q)
                ot.append(term)
                od.append(d)
                odf.append(int(df))
        return pa.table(
            {"query_term": pa.array(oq, pa.string()),
             "term": pa.array(ot, pa.string()),
             "dist": pa.array(od, pa.int64()),
             "df": pa.array(odf, pa.int64())}
        )

    return kernel


def fuzzy_match_terms(
    lexicon,
    query_terms: tuple[str, ...] | list[str],
    max_dist: int = 2,
    k: int = 10,
    method: str = "symspell",
):
    """lexicon Dataset (term, df) -> top-k fuzzy matches per query term:
    (query_term, term, dist, df, rank), rank 1-based by
    (dist asc, df desc, term asc).

    ``method="scan"`` compares every in-band lexicon term against every
    query (fine for a handful of probes); ``method="symspell"``
    (default) goes through the deletion-neighborhood join, the path
    that scales with the candidate count instead of queries x vocab.
    Both produce identical rows (conformance-tested)."""
    import pyarrow.compute as pc

    kern = (
        make_symspell_kernel(query_terms, max_dist)
        if method == "symspell"
        else make_fuzzy_kernel(query_terms, max_dist)
    )
    cand = lexicon.map_batches(kern, batch_format="pyarrow")
    # grouped_topk tiebreaks are ascending-only: feed it -df
    cand = cand.map_batches(
        lambda b: b.append_column("neg_df", pc.negate(b.column("df"))),
        batch_format="pyarrow",
    )
    out = grouped_topk(
        cand,
        "query_term",
        "dist",
        k,
        descending=False,
        tiebreak_cols=["neg_df", "term"],
        emit_rank="rank",
    )
    return out.map_batches(
        lambda b: b.drop_columns(["neg_df"]), batch_format="pyarrow"
    )
