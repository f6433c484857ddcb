"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k as the exactness baseline — a
  numpy matmul per batch against a broadcast (ray.put) query matrix,
  partial top-k per batch, tiny final merge. The query side is shipped
  ONCE to the object store, never per batch.
- ``embedding_dupes``: all pairs with cosine >= threshold — block
  matmul of each batch against the broadcast corpus matrix (exact;
  at 100 TB swap the broadcast side for an IVF/LSH-bucketed variant:
  bucket by coarse quantizer id with groupby, search within buckets).
- ``lsh_bucket_ann``: the scale path — random-hyperplane LSH buckets
  (deterministic seeded planes), candidates searched within their
  bucket only; approximate, used when the corpus side no longer fits a
  broadcast.

Cosine = dot(a,b)/(|a||b|), matching the reference's
calculateCosineSimilarity (src/scoring/SearchScorer.cpp:668-690) and
DuckDB's list_cosine_similarity (the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def cosine_block(queries: np.ndarray, corpus: np.ndarray) -> np.ndarray:
    """(Q, d) x (N, d) -> (Q, N) cosine matrix; float64 throughout."""
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    cn = np.linalg.norm(corpus, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    cn[cn == 0] = 1.0
    return (queries @ corpus.T) / (qn * cn.T)


class BatchCosine:
    """map_batches stage: emit (query_id, vec_id, cos) for every
    (query, batch-row) pair. Query matrix read from the object store
    once per actor (__init__), zero per-batch reshipping."""

    def __init__(self, query_ref, query_ids):
        import ray

        self.q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.query_ids = np.asarray(query_ids, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch)
        ids = batch.column("vec_id").to_numpy()
        sims = cosine_block(self.q, m)  # (Q, B)
        Q, B = sims.shape
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.query_ids, B), pa.int64()),
                "vec_id": pa.array(np.tile(ids, Q), pa.int64()),
                "cos": pa.array(sims.reshape(-1), pa.float64()),
            }
        )


def ann_topk(embeddings_ds, query_ids: list[int], k: int = 10, round_digits: int | None = None):
    """Exact cosine top-k for each query vector -> Dataset
    (query_id, neighbor_id, rank, cos), self-matches excluded,
    ties broken by ascending neighbor id. With ``round_digits``, ordering
    uses the ROUNDED similarity (half away from zero) so rank order is
    reproducible across engines with different summation orders."""
    import ray
    import polars as pl

    qset = set(query_ids)
    qrows = embeddings_ds.filter(lambda r: r["vec_id"] in qset).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    qref = ray.put(qmat)

    sims = embeddings_ds.map_batches(
        BatchCosine,
        fn_constructor_kwargs={"query_ref": qref, "query_ids": qids},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
    )
    # partial top-k per batch would go here at scale; at bench scale the
    # (Q x N) sims table is small — one groupby finishes it.
    def topk(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        df = df.filter(pl.col("vec_id") != pl.col("query_id"))
        if round_digits is not None:
            from ..stages.textstats import round_half_away

            c = round_half_away(df["cos"].to_numpy(), round_digits)
            df = df.with_columns(cos=pl.Series("cos", c))
        df = df.sort(["cos", "vec_id"], descending=[True, False]).head(k)
        return pa.table(
            {
                "query_id": df["query_id"].to_arrow(),
                "neighbor_id": df["vec_id"].to_arrow(),
                "rank": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                "cos": df["cos"].to_arrow(),
            }
        )

    return sims.groupby("query_id").map_groups(topk, batch_format="pyarrow")


def embedding_dupes(embeddings_ds, threshold: float = 0.95):
    """Exact near-duplicate pairs by cosine -> Dataset(a, b, cos),
    a < b. Corpus matrix broadcast once; each batch matmuls against it."""
    import ray

    rows = embeddings_ds.select_columns(["vec_id", "embedding"])
    all_tab = rows.to_arrow_refs()
    mats, ids = [], []
    for ref in all_tab:
        t = ray.get(ref)
        mats.append(_to_matrix(t))
        ids.append(t.column("vec_id").to_numpy())
    corpus = np.vstack(mats)
    corpus_ids = np.concatenate(ids)
    order = np.argsort(corpus_ids)
    corpus, corpus_ids = corpus[order], corpus_ids[order]
    cref = ray.put((corpus, corpus_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        cm, cids = ray.get(cref)
        m = _to_matrix(batch)
        bids = batch.column("vec_id").to_numpy()
        sims = cosine_block(m, cm)
        a_out, b_out, c_out = [], [], []
        for i, aid in enumerate(bids):
            hits = np.flatnonzero((sims[i] >= threshold) & (cids > aid))
            a_out.extend([int(aid)] * len(hits))
            b_out.extend(cids[hits].tolist())
            c_out.extend(sims[i][hits].tolist())
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "cos": pa.array(c_out, pa.float64()),
            }
        )

    return rows.map_batches(pairs, batch_format="pyarrow", batch_size=1024)


_LSH_PLANES_SEED = 1234


def lsh_bucket_ann(embeddings_ds, query_ids: list[int], k: int = 10, n_planes: int = 12):
    """Approximate ANN: random-hyperplane signatures bucket the corpus
    (groupby shuffle); each query searches only its bucket. The scale
    path when the corpus can't be broadcast."""
    import ray
    import polars as pl

    dim = len(embeddings_ds.take(1)[0]["embedding"])
    planes = np.random.RandomState(_LSH_PLANES_SEED).randn(n_planes, dim)
    pref = ray.put(planes)

    def sign_bucket(batch: pa.Table) -> pa.Table:
        P = ray.get(pref)
        m = _to_matrix(batch)
        sig = (m @ P.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            bucket |= sig[:, i].astype(np.int64) << i
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    bucketed = embeddings_ds.map_batches(sign_bucket, batch_format="pyarrow")
    qset = set(query_ids)

    def bucket_topk(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy()
        local_q = [i for i, v in enumerate(ids) if v in qset]
        if not local_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        m = _to_matrix(group)
        sims = cosine_block(m[local_q], m)
        out_q, out_n, out_r, out_c = [], [], [], []
        for row, qi in enumerate(local_q):
            df = pl.DataFrame({"n": ids, "c": sims[row]}).filter(
                pl.col("n") != int(ids[qi])
            ).sort(["c", "n"], descending=[True, False]).head(k)
            out_q.extend([int(ids[qi])] * len(df))
            out_n.extend(df["n"].to_list())
            out_r.extend(range(1, len(df) + 1))
            out_c.extend(df["c"].to_list())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()), "neighbor_id": pa.array(out_n, pa.int64()),
             "rank": pa.array(out_r, pa.int64()), "cos": pa.array(out_c, pa.float64())}
        )

    return bucketed.groupby("bucket").map_groups(bucket_topk, batch_format="pyarrow")
