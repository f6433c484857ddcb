"""Ranking-quality evaluation: NDCG@k, MRR@k, recall@k.

The reference ships a scorer but no offline evaluation harness; a
search engine operated at corpus scale needs one (TREC-style graded
qrels -> per-query metrics).  This module computes the three standard
metrics in EXACT integer fixed-point so the Ray pipeline and the DuckDB
oracle are bit-identical:

- The rank discount 1/log2(rank+1) is pre-tabulated as integer
  micro-weights ``DCG_W[rank-1] = round(1e6 / log2(rank+1))`` — a
  module constant inlined into BOTH engines, so no libm call happens
  at query time in either (the catalog float discipline).
- gain(rel) = 2^rel - 1 (integer), DCG/IDCG are integer dot products,
  and NDCG is ONE division of exactly reconstructed integers.
- MRR@k = 1/first-relevant-rank and recall@k = hits/n_rel are likewise
  single integer divisions.

Scale shape (see the catalog entry): the per-(query, doc) relevance
grade is MAP-SIDE computable from the document text alone; the only
driver-side materializations are bounded by queries x k (the run) and
queries x grades (the IDCG histogram) — never by corpus size.
"""

from __future__ import annotations

import math

NDCG_K = 10
MAX_REL = 2  # graded qrels rule: rel = clamp(tf_total - 1, 0, MAX_REL)

# Integer micro-weights for ranks 1..NDCG_K; Python round() at build
# time, then pure-int arithmetic everywhere downstream.
DCG_W: tuple[int, ...] = tuple(
    round(10**6 / math.log2(i + 1)) for i in range(1, NDCG_K + 1)
)


def gain(rel: int) -> int:
    """2^rel - 1 — the standard graded-relevance gain."""
    return (1 << rel) - 1


def idcg_from_counts(grade_counts: dict[int, int], k: int = NDCG_K) -> int:
    """Integer IDCG@k from a {grade: n_docs} histogram: fill ranks
    1..k with the highest grades first (the multiset is all that
    matters — ties between equal grades don't change the sum)."""
    total = 0
    rank = 0
    for rel in sorted((g for g in grade_counts if g > 0), reverse=True):
        for _ in range(grade_counts[rel]):
            if rank >= k:
                return total
            total += gain(rel) * DCG_W[rank]
            rank += 1
    return total


def query_metrics(
    run: list[tuple[int, int]],
    grade_counts: dict[int, int],
    k: int = NDCG_K,
) -> dict[str, float | int]:
    """Metrics for ONE query.

    ``run``: [(rank, rel)] for the returned top-k, rank 1-based;
    ``grade_counts``: {rel_grade: n_docs} over ALL graded docs (the
    qrels side — grade 0 entries are ignored).

    Returns ndcg/mrr/recall as floats produced by one integer division
    each, plus the integer support counts.
    """
    dcg = sum(gain(rel) * DCG_W[rank - 1] for rank, rel in run if rank <= k)
    idcg = idcg_from_counts(grade_counts, k)
    first_rel = min((rank for rank, rel in run if rel > 0 and rank <= k), default=0)
    hits = sum(1 for rank, rel in run if rel > 0 and rank <= k)
    n_rel = sum(n for g, n in grade_counts.items() if g > 0)
    return {
        "ndcg": (dcg / idcg) if idcg > 0 else 0.0,
        "mrr": (1.0 / first_rel) if first_rel > 0 else 0.0,
        "recall": (hits / n_rel) if n_rel > 0 else 0.0,
        "n_rel": n_rel,
        "n_run": len([r for r, _ in run if r <= k]),
    }


def sql_dcg_weight_values() -> str:
    """The DCG_W table as a SQL VALUES list ``(rank, w)`` — the same
    integers the Python side uses, so neither engine touches libm."""
    return ", ".join(f"({i + 1}, {w})" for i, w in enumerate(DCG_W))
