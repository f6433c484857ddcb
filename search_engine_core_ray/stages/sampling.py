"""Deterministic corpus sampling for training-data mixing.

Two operators a 100-TB training-data pipeline needs between dedup and
packing:

- ``stratified_sample``: keep each document with a per-stratum
  probability (e.g. downsample English to rebalance languages), decided
  by a pure hash of (doc_id, salt) — reproducible across runs, cluster
  sizes and resumes, unlike ``Dataset.random_sample``.  Map-only.
- ``mixture_plan``: the static DoReMi-style planning step — given
  integer target mixture weights per source and the observed per-source
  token counts, compute the largest achievable sample (no upsampling)
  hitting the target proportions, as exact integer arithmetic.  One
  bounded groupby (the source domain is small by construction).

Reference context: the reference engine has no training-data exporter
(its corpus lives in MongoDB, search-engine-core src/storage/); these
operators extend the repo's prepare_training_data family
(SURVEY.md §2 "beyond-reference training-data ops").

Both are SQL-oracled in pipelines/catalog.py: the keep/drop decision
and the plan arithmetic are integers end to end, so DuckDB replays them
bit-exactly (HUGEINT residues on the hash, integer division on the
plan).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .packing import KNUTH
from .textstats import WS_TOKEN_RE

_M32 = 1 << 32


def sample_threshold(rate_ppm: int) -> int:
    """Exact integer keep-threshold for a parts-per-million rate:
    a doc is kept iff knuth_hash(doc_id, salt) < threshold."""
    if not (0 <= rate_ppm <= 1_000_000):
        raise ValueError(f"rate_ppm must be in [0, 1e6], got {rate_ppm}")
    return rate_ppm * _M32 // 1_000_000


def stratified_sample(
    docs_ds,
    rates_ppm: dict[str, int],
    *,
    key: str = "lang",
    salt: int = 0,
    default_ppm: int = 1_000_000,
):
    """Deterministic per-stratum document sampling.

    ``rates_ppm`` maps stratum value -> keep rate in parts per million
    (1_000_000 = keep all); strata absent from the dict use
    ``default_ppm``.  The keep decision is
    ``knuth_hash(doc_id, salt) < rate_ppm * 2^32 // 10^6`` with the same
    ((id+salt) mod 2^32) * KNUTH mod 2^32 hash as epoch_shuffle — a
    different salt gives an independent sample, and the decision is a
    pure function of (doc_id, salt), so re-runs, resumes and different
    cluster sizes keep identical documents.

    Scale (100 TB): map-only — no exchange; the rate table is a tiny
    dict closed over by the batch kernel (sent once per task, bytes).
    """
    thresholds = {k: sample_threshold(v) for k, v in rates_ppm.items()}
    default_thr = sample_threshold(default_ppm)

    def kern(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # uint64 wrap + mod 2^32 = the exact non-negative residue for
        # ALL doc_id including negatives (same argument as the
        # epoch_shuffle kernel, stages/packing.py)
        h = (
            ((ids.astype(np.uint64) + np.uint64(salt)) % np.uint64(_M32))
            * np.uint64(KNUTH)
        ) % np.uint64(_M32)
        thr = (
            pl.from_arrow(batch.select([key]))
            .select(
                pl.col(key).replace_strict(
                    thresholds, default=default_thr, return_dtype=pl.UInt64
                )
            )[key]
            .to_numpy()
        )
        return batch.filter(pa.array(h < thr))

    return docs_ds.map_batches(kern, batch_format="pyarrow")


def mixture_plan(docs_ds, weights: dict[str, int], *, key: str = "source"):
    """Static mixture planning: per-source sampling rates that realize
    integer target proportions ``weights`` without upsampling.

    The binding source b minimizes tokens_s / weight_s (the one that
    runs out first); the plan takes ALL of b and scales every other
    source to ``sampled_tokens_s = weight_s * tokens_b // weight_b``.
    The rational argmin is made integer-exact by comparing
    ``tokens_s * (L // weight_s)`` where L = lcm(weights) — each factor
    divides L so the products are exact int64 (ties break on the
    source name).  Output: one row per configured source with
    n_docs, n_tokens, weight, sampled_tokens and rate_ppm
    (= sampled_tokens * 10^6 // n_tokens).

    Scale (100 TB): per-batch combine collapses each block to
    <= |sources| rows, the groupby key space IS the source domain
    (bounded — Ray groupby per the cardinality rule in
    stages/shuffle.py), and the plan itself is a driver computation
    over <= |sources| rows.  Token counting reuses the RE2-pinned
    whitespace class so the DuckDB oracle tokenizes identically.
    """
    import math

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of positive integers")
    lcm = math.lcm(*weights.values())
    mult = {s: lcm // w for s, w in weights.items()}

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = (
            df.filter(pl.col(key).is_in(list(weights)))
            .group_by(key)
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("text")
                .fill_null("")
                .str.count_matches(WS_TOKEN_RE)
                .cast(pl.Int64)
                .sum()
                .alias("n_tokens"),
            )
        )
        return out.to_arrow()

    import ray.data  # noqa: F401  (Dataset methods below)

    totals = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .sum(["n_docs", "n_tokens"])
        .take_all()  # <= |sources| rows: source-domain-bounded
    )
    rows = {
        r[key]: (int(r["sum(n_docs)"]), int(r["sum(n_tokens)"])) for r in totals
    }
    # binding source: exact rational argmin of tokens/weight
    b = min(weights, key=lambda s: (rows.get(s, (0, 0))[1] * mult[s], s))
    bt, bw = rows.get(b, (0, 0))[1], weights[b]
    out_rows = []
    for s in sorted(weights):
        n_docs, n_tok = rows.get(s, (0, 0))
        sampled = weights[s] * bt // bw
        out_rows.append(
            {
                key: s,
                "n_docs": n_docs,
                "n_tokens": n_tok,
                "weight": weights[s],
                "sampled_tokens": sampled,
                "rate_ppm": (sampled * 1_000_000 // n_tok) if n_tok else 0,
            }
        )
    return pa.Table.from_pylist(out_rows)
