"""Mergeable heavy-hitters sketch (Misra-Gries / Space-Saving family).

"What are the top-k most frequent terms?" over a 100-TB corpus is the
canonical case where the exact answer (a full groupby(term) over a
multi-billion-key vocabulary) costs an all-to-all exchange, but a
bounded-memory MERGEABLE summary answers it with one narrow fold:

- Per input block: count terms exactly (vectorized polars groupby —
  a block's vocabulary is block-bounded), then COMPRESS to capacity
  ``m``: subtract the (m+1)-th largest count from every entry and keep
  the positive remainder.  This is the Misra-Gries summary of the
  block (Misra & Gries 1982; compress form per Agarwal et al. 2013,
  "Mergeable Summaries", PODS'12).
- Merge: concatenate summaries, sum counts per key, compress to ``m``
  again.  Mergeability theorem: after ANY merge tree the per-key
  undercount is at most N/(m+1), where N is the total stream weight —
  so every term with true count > N/(m+1) is guaranteed present, and
  reported counts are lower bounds within N/(m+1) of truth
  (property-tested in tests/test_sketches.py).

With ``m`` at or above the distinct-key count no subtraction ever
fires and the result is EXACT — the deterministic configuration the
catalog entry runs under its DuckDB oracle (same twin discipline as
ivf_ann_det).  At web scale you size m to the answer you need
(top-k with guarantee g means m ~ N/g), not to the vocabulary.

Fold shape: map-side summaries (one per block, <= m rows each) ->
one repartition fold -> final merge — the grouped_topk two-stage
pattern; nothing corpus-proportional ever concentrates.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .shuffle import _unlarge

_SUMMARY_SCHEMA = pa.schema([("term", pa.string()), ("cnt", pa.int64())])


def _compress(t: pl.DataFrame, m: int) -> pl.DataFrame:
    """Misra-Gries compress: cap a (term, cnt) summary at m entries by
    subtracting the (m+1)-th largest count from all and dropping
    non-positive remainders.  Exact no-op when len(t) <= m."""
    if t.height <= m:
        return t
    # (m+1)-th largest count (1-indexed): sort desc, take index m
    thresh = int(t["cnt"].sort(descending=True)[m])
    out = t.with_columns((pl.col("cnt") - thresh).alias("cnt")).filter(
        pl.col("cnt") > 0
    )
    return out


def mg_summary_kernel(m: int, text_col: str = "text", token_re: str | None = None):
    """map_batches kernel: document batch -> its Misra-Gries summary
    (term, cnt), <= m rows."""
    from .textstats import TOKEN_RE

    tre = token_re or TOKEN_RE

    def kernel(batch: pa.Table) -> pa.Table:
        t = pl.from_arrow(batch.select([text_col]))
        counts = (
            t.with_columns(
                pl.col(text_col).fill_null("").str.extract_all(tre).alias("tok")
            )
            .select("tok")
            .explode("tok")
            .drop_nulls("tok")
            .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
            .group_by("term")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return _unlarge(_compress(counts, m).to_arrow()).cast(_SUMMARY_SCHEMA)

    return kernel


def mg_merge_kernel(m: int):
    """map_batches kernel merging concatenated summaries: sum per key,
    compress to m."""

    def kernel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.cast(_SUMMARY_SCHEMA)
        t = (
            pl.from_arrow(batch)
            .group_by("term")
            .agg(pl.col("cnt").sum().alias("cnt"))
        )
        return _unlarge(_compress(t, m).to_arrow()).cast(_SUMMARY_SCHEMA)

    return kernel


def heavy_hitters(docs, m: int, k: int, text_col: str = "text", fanin: int = 16):
    """Top-k (term, cnt, rank) by the Misra-Gries fold at capacity m.

    Counts are exact when m >= distinct terms (the SQL-gated config,
    where the fold is also partition-independent), otherwise lower
    bounds within total_tokens/(m+1) whose exact values depend on the
    merge tree — the BOUND is partitioning-independent, the estimates
    are not (property-tested).  Rank order: (cnt desc, term asc).

    Fold is a two-level tree: block summaries merge ``fanin``-way
    first, so the final single-block merge sees <= fanin * m rows
    instead of blocks * m (the part that matters at 100 TB).
    """
    partials = docs.map_batches(
        mg_summary_kernel(m, text_col), batch_format="pyarrow"
    )
    merged = (
        partials.repartition(fanin)
        .map_batches(mg_merge_kernel(m), batch_format="pyarrow")
        .repartition(1)
        .map_batches(mg_merge_kernel(m), batch_format="pyarrow")
    )

    def topk(batch: pa.Table) -> pa.Table:
        t = (
            pl.from_arrow(batch)
            .sort(["cnt", "term"], descending=[True, False])
            .head(k)
            .with_columns(
                pl.int_range(1, pl.len() + 1, dtype=pl.Int64).alias("rank")
            )
        )
        return _unlarge(t.to_arrow()).cast(
            pa.schema(
                [("term", pa.string()), ("cnt", pa.int64()), ("rank", pa.int64())]
            )
        )

    return merged.map_batches(topk, batch_format="pyarrow")


def mg_reference_merge(streams: list[list[str]], m: int) -> dict[str, int]:
    """Pure-Python fold over token streams for the property tests:
    summary-per-stream then pairwise merge, mirroring the Dataset path."""
    summaries = []
    for s in streams:
        cnt: dict[str, int] = {}
        for tok in s:
            cnt[tok] = cnt.get(tok, 0) + 1
        summaries.append(_compress(pl.DataFrame(
            {"term": list(cnt), "cnt": list(cnt.values())},
            schema={"term": pl.String, "cnt": pl.Int64},
        ), m))
    acc = summaries[0]
    for s in summaries[1:]:
        acc = _compress(
            pl.concat([acc, s]).group_by("term").agg(pl.col("cnt").sum()), m
        )
    return dict(zip(acc["term"].to_list(), acc["cnt"].to_list()))
