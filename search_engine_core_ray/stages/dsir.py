"""DSIR importance log-weights (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv 2302.03169): score
every raw document by how much more likely its hashed-ngram profile is
under a TARGET distribution than under the raw-corpus distribution —
the statistic LLM data curation uses to resample a web crawl toward a
quality/domain target. Selection itself is then just a top-k by
(w_q, doc_id) — the topk_orders shape.

Features: unigrams + space-joined bigrams of the corpus token rule,
hashed with the DuckDB-replayable md5_number_lower (last 8 md5 digest
bytes, little-endian) into ``n_buckets`` buckets. Both bucket LMs are
Laplace-smoothed; the per-bucket log ratio
``ln((ct+1)/(Tt+B)) - ln((cr+1)/(Tr+B))`` is quantized to micro-nat
int64 (round_half_away — the idf_q/pmi discipline), so per-doc weights
are exact integer sums, bit-identical across engines.

Scale shape (100 TB): two corpus passes (the lm_familiarity pattern) —
pass 1 maps batches to per-bucket partial counts and reduces to a
B-row table (B is a CONSTANT, so the driver collect is value-domain
bounded); pass 2 re-maps batches against the broadcast B-row delta
table and emits (doc_id, w_q). No corpus-proportional state anywhere.
Token hashing caches md5 per DISTINCT gram within a batch (the
SQL-checkable simhash variant's documented trade; a production path
would swap in the vectorized polars hash at the cost of the oracle).

Docs whose text yields zero grams are absent from the output (no
evidence rows; the SQL oracle drops them identically).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .dedup import _md5_lower64
from .textstats import TOKEN_RE, round_half_away

LN_SCALE = 1_000_000
N_BUCKETS = 256


def _batch_grams(
    b: pa.Table, id_col: str, text_col: str, n_buckets: int,
    flag_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, buckets, flags) — one entry per gram INSTANCE
    (unigrams + bigrams); flags expand ``flag_col`` per instance
    (zeros when flag_col is None)."""
    cols = [id_col, text_col] + ([flag_col] if flag_col else [])
    df = (
        pl.from_arrow(b.select(cols))
        .with_columns(
            pl.col(text_col).fill_null("").str.to_lowercase()
            .str.extract_all(TOKEN_RE).alias("ts")
        )
    )
    flags_in = (
        df[flag_col].to_list() if flag_col else [0] * df.height
    )
    ids_out: list = []
    grams: list[str] = []
    flags_out: list = []
    for did, toks, fl in zip(df[id_col].to_list(), df["ts"].to_list(),
                             flags_in):
        f = 1 if fl else 0
        n = len(toks)
        grams.extend(toks)
        ids_out.extend([did] * n)
        flags_out.extend([f] * n)
        if n >= 2:
            bi = [f"{x} {y}" for x, y in zip(toks, toks[1:])]
            grams.extend(bi)
            ids_out.extend([did] * len(bi))
            flags_out.extend([f] * len(bi))
    if not grams:
        z = np.empty(0, np.int64)
        return z, z, z
    buckets = (_md5_lower64(grams) % np.uint64(n_buckets)).astype(np.int64)
    return (
        np.asarray(ids_out, dtype=np.int64),
        buckets,
        np.asarray(flags_out, dtype=np.int64),
    )


def dsir_logweights(
    docs_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
    n_buckets: int = N_BUCKETS,
):
    """Dataset (doc_id, w_q): micro-nat importance log-weight per doc
    with >= 1 gram. ``target_col`` is a boolean column marking the
    target subpopulation (prepared upstream)."""
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        _ids, buckets, is_t = _batch_grams(
            b, id_col, text_col, n_buckets, flag_col=target_col
        )
        cr = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        ct = np.bincount(buckets, weights=is_t, minlength=n_buckets).astype(
            np.int64
        )
        nz = np.flatnonzero(cr)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "cr": pa.array(cr[nz], pa.int64()),
                "ct": pa.array(ct[nz], pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("cr", alias_name="cr"), Sum("ct", alias_name="ct"))
        .take_all()  # <= n_buckets rows: value-domain-bounded collect
    )
    tr = sum(int(r["cr"]) for r in counts)
    tt = sum(int(r["ct"]) for r in counts)
    delta = np.zeros(n_buckets, dtype=np.int64)
    for r in counts:
        lr = np.log((int(r["ct"]) + 1.0) / (tt + n_buckets)) - np.log(
            (int(r["cr"]) + 1.0) / (tr + n_buckets)
        )
        delta[int(r["b"])] = int(round_half_away(np.float64(lr) * LN_SCALE, 0))

    import ray

    delta_ref = ray.put(delta)

    def score(b: pa.Table) -> pa.Table:
        ids, buckets, _f = _batch_grams(b, id_col, text_col, n_buckets)
        if len(ids) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "w_q": pa.array([], pa.int64())}
            )
        d = ray.get(delta_ref)
        w = d[buckets]
        df = pl.DataFrame({id_col: ids, "w": w}).group_by(id_col).agg(
            w_q=pl.col("w").sum()
        )
        return df.to_arrow().cast(
            pa.schema([(id_col, pa.int64()), ("w_q", pa.int64())])
        )

    # docs are row-atomic within a batch, so the per-batch group_by is
    # already one complete row per doc — no global reduce needed
    return docs_ds.map_batches(score, batch_format="pyarrow")


def dsir_select(weights_ds, *, frac_num: int = 1, frac_den: int = 5,
                id_col: str = "doc_id", bucket_shift: int = 16):
    """The RESAMPLING step of DSIR: keep the top ``frac_num/frac_den``
    of documents by importance weight, deterministic tiebreak on
    doc_id — i.e. the exact top-k selection ``k = ceil(frac * N)`` over
    (w_q DESC, doc_id ASC), computed WITHOUT a global sort.

    Two-phase distributed threshold selection (the classic top-k-at-
    scale shape):

    1. histogram the weights COARSELY — bucket ``w_q >> bucket_shift``
       (floor shift, negative-safe) — via map-side value counts + one
       sorted_agg reduce; the driver collect is bucket-domain bounded
       (weight range / 2^shift buckets, independent of corpus rows).
       Walk the histogram from the top to find the boundary bucket B:
       every doc in a higher bucket is selected outright (``a`` docs,
       all strictly above any bucket-B weight).
    2. only the boundary bucket — expected N / #occupied-buckets docs,
       NOT the corpus — is sorted exactly by (w_q DESC, doc_id ASC)
       and trimmed to the remaining ``k - a`` rows.

    Equal weights always share a bucket, so the doc_id tiebreak is
    confined to phase 2 by construction.  Returns (doc_id, w_q) of the
    selected docs, bit-identical to the SQL oracle's QUALIFY
    row_number() OVER (ORDER BY w_q DESC, doc_id) <= k.
    """
    from ray.data.aggregate import Sum

    n = weights_ds.count()
    if n == 0:
        return weights_ds
    k = (frac_num * n + frac_den - 1) // frac_den  # ceil, exact ints

    def hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"hb": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        hb = np.right_shift(b.column("w_q").to_numpy(), bucket_shift)
        vals, cnts = np.unique(hb, return_counts=True)
        return pa.table(
            {"hb": pa.array(vals, pa.int64()),
             "cnt": pa.array(cnts.astype(np.int64), pa.int64())}
        )

    rows = sorted(
        (
            weights_ds.map_batches(hist, batch_format="pyarrow")
            .groupby("hb")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()  # bucket-domain-bounded collect (see docstring)
        ),
        key=lambda r: -int(r["hb"]),
    )
    a = 0
    boundary = None
    for r in rows:
        if a + int(r["cnt"]) >= k:
            boundary = int(r["hb"])
            break
        a += int(r["cnt"])
    if boundary is None:  # k == n: everything survives
        return weights_ds

    lo = boundary << bucket_shift
    hi_cut = lo + (1 << bucket_shift)

    hi = weights_ds.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b.column("w_q"), hi_cut)),
        batch_format="pyarrow",
    )
    edge = (
        weights_ds.map_batches(
            lambda b: b.filter(
                pa.compute.and_(
                    pa.compute.greater_equal(b.column("w_q"), lo),
                    pa.compute.less(b.column("w_q"), hi_cut),
                )
            ),
            batch_format="pyarrow",
        )
        # the filter empties most blocks and map_batches strips an
        # empty table's schema (Ray 2.49) — merge them away before the
        # boundary sort sees schema-less blocks
        .repartition(2)
        .sort(["w_q", id_col], descending=[True, False])
        .limit(k - a)
    )
    return hi.union(edge)
