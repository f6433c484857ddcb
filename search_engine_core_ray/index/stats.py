"""Corpus statistics for BM25.

Reference: BM25Algorithm::updateCorpusStatistics,
src/scoring/SearchScorer.cpp:225-255 —

- ``total_docs``   N = corpus size
- ``avgdl``        mean over docs of len(content)+len(title)+len(description)
                   in BYTES (std::string::length)
- document frequencies are NOT computed here: df per term equals the
  posting-list length by construction (a postings row exists iff the
  term occurs in the union of the three fields), so the segment build
  gets df for free inside the groupby(term) shuffle.

Computed as a streaming Ray aggregate (partial sums per block, tiny
final reduce) — never materializes the docs.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class CorpusStats:
    total_docs: int
    total_len: int
    avgdl: float

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "CorpusStats":
        return CorpusStats(
            total_docs=int(d["total_docs"]),
            total_len=int(d["total_len"]),
            avgdl=float(d["avgdl"]),
        )


def _partial(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    total = 0
    for col in ("len_content", "len_title", "len_desc"):
        total += pc.sum(batch.column(col)).as_py() or 0
    return pa.table({"n": pa.array([n], pa.int64()), "len": pa.array([total], pa.int64())})


def compute_corpus_stats(docs_ds) -> CorpusStats:
    """N and avgdl from a docs Dataset carrying len_* columns."""
    partials = docs_ds.select_columns(
        ["len_content", "len_title", "len_desc"]
    ).map_batches(_partial, batch_format="pyarrow")
    import pandas as pd

    pdf: pd.DataFrame = partials.to_pandas()  # one row per block — tiny
    n = int(pdf["n"].sum())
    total = int(pdf["len"].sum())
    # reference default: N=1000, avgdl=100 if never updated (SearchScorer.h:158-159)
    avgdl = (total / n) if n else 100.0
    return CorpusStats(total_docs=n, total_len=total, avgdl=avgdl)
