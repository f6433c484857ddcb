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
        from .textstats import term_count_frame

        counts = term_count_frame(
            pl.from_arrow(batch.select([text_col])), text_col, token_re=tre
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


# --------------------------------------------------------------- Bloom

BLOOM_M_BITS = 1 << 16   # 64 Kbit filter for the fixture scale
BLOOM_K = 4              # Kirsch-Mitzenmacher double hashing


def bloom_positions(h: np.ndarray, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> np.ndarray:
    """uint64 hashes -> (n, k) int64 bit positions via double hashing
    pos_i = (h_lo32 + i * h_hi32) mod m — pure integer arithmetic,
    identical in DuckDB UBIGINT algebra (the SQL twin in the catalog)."""
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = (h >> np.uint64(32)).astype(np.int64)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def bloom_build(values: list[str], m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Benchmark strings -> Bloom bit array (np.bool_, m_bits long).
    Hash = md5_number_lower so the SQL oracle replays the exact bit
    set — including the filter's deterministic false positives."""
    from ..functions.hll import md5_lower64_array

    bits = np.zeros(m_bits, dtype=np.bool_)
    if values:
        pos = bloom_positions(md5_lower64_array(values), m_bits, k)
        bits[pos.ravel()] = True
    return bits


def bloom_contaminated(docs_ds, benchmark_texts: list[str], n: int = 3,
                       m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K):
    """Bloom-filter decontamination: per document, how many of its
    token n-gram windows the benchmark Bloom filter FLAGS (a superset
    of true containment: false positives at the classic
    (1 - e^(-k d / m))^k rate, deterministic given the bit set).

    This is the scale path of ``scrub.contamination_frac``: that
    operator broadcasts the exact benchmark window-hash SET (right for
    MB-scale benchmarks); when the "benchmark" side is itself huge —
    a whole eval-suite union, or another corpus — the Bloom filter
    caps the broadcast at m/8 bytes regardless of benchmark size, and
    membership stays O(k) per window.  Returns (doc_id, n_win,
    flagged_win, flagged_frac); map-only, filter broadcast once.

    The md5 window hash keeps the ENTIRE bit algebra DuckDB-replayable
    (the simhash twin discipline); a production deployment would swap
    the vectorized polars hash for the window hashing and keep
    everything else."""
    import ray

    import pyarrow as _pa

    from ..functions.hll import md5_lower64_array

    # benchmark windows -> bit array, built once on the driver
    bw = _ngram_windows_pl(
        pl.DataFrame({"doc_id": list(range(len(benchmark_texts))),
                      "text": pl.Series(benchmark_texts, dtype=pl.String)}),
        n,
    )
    bits = bloom_build(sorted(set(bw["w"].to_list())), m_bits, k)
    bits_ref = ray.put(bits)

    def score(batch: _pa.Table) -> _pa.Table:
        b = ray.get(bits_ref)
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        wins = _ngram_windows_pl(df, n)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        n_docs = len(df)
        rid = wins["rid"].to_numpy().astype(np.int64)
        n_win = np.bincount(rid, minlength=n_docs).astype(np.int64)
        if wins.height:
            # hash DISTINCT windows once, map back by inverse index
            wlist = wins["w"].to_list()
            uniq, inv = np.unique(np.asarray(wlist, dtype=object),
                                  return_inverse=True)
            pos = bloom_positions(md5_lower64_array(list(uniq)), m_bits, k)
            flagged_u = b[pos].all(axis=1)
            hit = flagged_u[inv].astype(np.int64)
        else:
            hit = np.zeros(0, dtype=np.int64)
        fl = np.zeros(n_docs, dtype=np.int64)
        np.add.at(fl, rid, hit)
        frac = np.where(n_win > 0, fl / np.maximum(n_win, 1), 0.0)
        return _pa.table(
            {"doc_id": _pa.array(ids, _pa.int64()),
             "n_win": _pa.array(n_win, _pa.int64()),
             "flagged_win": _pa.array(fl, _pa.int64()),
             "flagged_frac": _pa.array(frac, _pa.float64())}
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


def _ngram_windows_pl(df: pl.DataFrame, n: int) -> pl.DataFrame:
    """(doc rows with text) -> (rid, w) token n-gram window strings —
    the same window rule the contamination operators use
    (lowercase alnum>=2 tokens, space-joined)."""
    ex = (
        df.with_columns(
            tk=pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]{2,}")
        )
        .with_row_index("rid")
        .select("rid", "tk")
        .explode("tk")
        .filter(pl.col("tk").is_not_null())
    )
    return (
        ex.with_columns(
            w=pl.concat_str(
                [pl.col("tk").shift(-j).over("rid") for j in range(n)],
                separator=" ",
            )
        )
        .filter(pl.col("w").is_not_null())
        .select("rid", "w")
    )


# ----------------------------------------------------------- Count-Min

CM_DEPTH = 4        # rows (independent hash functions)
CM_WIDTH = 2048     # cells per row


def cm_positions(h: np.ndarray, width: int = CM_WIDTH, depth: int = CM_DEPTH) -> np.ndarray:
    """uint64 hashes -> (n, depth) int64 column positions, the same
    Kirsch-Mitzenmacher double hashing the Bloom filter uses."""
    return bloom_positions(h, m_bits=width, k=depth)


def cm_partial_kernel(width: int = CM_WIDTH, depth: int = CM_DEPTH,
                      text_col: str = "text"):
    """map_batches kernel: document batch -> its Count-Min cell partial
    (row, col, cnt) — at most depth*width rows however big the batch.
    Mergeable by plain cell-wise sum (the sketch is a linear map of the
    frequency vector)."""
    from ..functions.hll import md5_lower64_array
    from .textstats import term_count_frame

    def kernel(batch: pa.Table) -> pa.Table:
        counts = term_count_frame(pl.from_arrow(batch.select([text_col])), text_col)
        cells = np.zeros((depth, width), dtype=np.int64)
        if counts.height:
            pos = cm_positions(
                md5_lower64_array(counts["term"].to_list()), width, depth
            )
            c = counts["cnt"].to_numpy()
            for i in range(depth):
                np.add.at(cells[i], pos[:, i], c)
        rows, cols = np.nonzero(cells)
        return pa.table(
            {"row": pa.array(rows.astype(np.int64), pa.int64()),
             "col": pa.array(cols.astype(np.int64), pa.int64()),
             "cnt": pa.array(cells[rows, cols], pa.int64())}
        )

    return kernel


def cm_estimate(docs, probe_terms: list[str], width: int = CM_WIDTH,
                depth: int = CM_DEPTH, text_col: str = "text"):
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005)
    for ``probe_terms`` over the corpus token stream: (term, est)
    with est = min over rows of the term's cell — an OVERESTIMATE
    (never under), within eps*N w.h.p. for width = e/eps.

    Scale shape: cell partials are depth*width-bounded per block, the
    reduce is one bounded groupby(row, col), and the driver collect is
    the cell DOMAIN (depth*width rows) — never corpus-proportional.
    """
    from ray.data.aggregate import Sum

    from ..functions.hll import md5_lower64_array

    cells_rows = (
        docs.map_batches(cm_partial_kernel(width, depth, text_col),
                         batch_format="pyarrow")
        .groupby(["row", "col"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # <= depth*width rows: cell-domain-bounded
    )
    cells = np.zeros((depth, width), dtype=np.int64)
    for r in cells_rows:
        cells[r["row"], r["col"]] = r["cnt"]
    pos = cm_positions(md5_lower64_array(list(probe_terms)), width, depth)
    est = [int(min(cells[i, pos[j, i]] for i in range(depth)))
           for j in range(len(probe_terms))]
    return pa.table(
        {"term": pa.array(list(probe_terms), pa.string()),
         "est": pa.array(est, pa.int64())}
    )
