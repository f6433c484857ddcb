"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k as the exactness baseline — a
  numpy matmul per batch against a broadcast (ray.put) query matrix.
  Each batch emits only its PARTIAL top-k per query (Q x k rows, under
  the same total order as the final merge), so the shuffled sims
  dataset is O(Q * k * n_batches), never the full Q x N matrix; the
  final per-query groupby merge is tiny.
- ``embedding_dupes``: all pairs with cosine >= threshold — an exact
  block-nested-loop self-join: the corpus is split into bounded blocks
  held in the OBJECT STORE (never broadcast whole, never driver-side),
  and one task per block pair (i <= j) matmuls two blocks. Per-task
  memory = 2 blocks regardless of corpus size; at 100 TB the pair
  count is quadratic by problem definition, so the LSH-bucketed
  ``lsh_bucket_ann`` below is the approximate scale path.
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


def _collect_query_vectors(embeddings_ds, query_ids):
    """Fetch the Q query vectors with a vectorized columnar mask
    (``pc.is_in`` per Arrow batch) — no per-row Python predicate runs
    over the corpus, and only the Q matching rows ever leave the scan.
    Returns (qmat float64 (Q, d), qids sorted ascending)."""
    import pyarrow.compute as pc

    value_set = pa.array(sorted({int(q) for q in query_ids}), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("vec_id"), value_set=value_set))

    rows = (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: r["vec_id"])
    qmat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in rows]
    return qmat, qids


class BatchCosine:
    """map_batches stage: per batch, emit each query's PARTIAL top-k
    (query_id, vec_id, cos) rows under the final merge's total order
    (cos desc — rounded if the caller rounds — then vec_id asc).
    Self-matches are excluded here. Query matrix read from the object
    store once per actor (__init__), zero per-batch reshipping.

    Exactness: top-k of a union equals top-k of the union of
    per-partition top-k lists under any shared total order, so the
    final groupby sees a superset of the true top-k. With k=None every
    pair is emitted (the old exhaustive shape, for tests)."""

    def __init__(self, query_ref, query_ids, k=None, round_digits=None):
        import ray

        self.q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch)
        ids = batch.column("vec_id").to_numpy()
        sims = cosine_block(self.q, m)  # (Q, B)
        if self.round_digits is not None:
            from ..stages.textstats import round_half_away

            sims = round_half_away(sims, self.round_digits)
        out_q, out_v, out_c = [], [], []
        for row, qid in enumerate(self.query_ids.tolist()):
            keep = ids != qid
            cand_ids, cand = ids[keep], sims[row][keep]
            if self.k is not None and len(cand_ids) > self.k:
                # total order (-cos, vec_id): lexsort keys minor-first
                sel = np.lexsort((cand_ids, -cand))[: self.k]
                cand_ids, cand = cand_ids[sel], cand[sel]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_v.append(cand_ids)
            out_c.append(cand)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64), pa.int64()),
                "cos": pa.array(np.concatenate(out_c).astype(np.float64), pa.float64()),
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

    qmat, qids = _collect_query_vectors(embeddings_ds, query_ids)
    qref = ray.put(qmat)

    sims = embeddings_ds.map_batches(
        BatchCosine,
        fn_constructor_kwargs={
            "query_ref": qref,
            "query_ids": qids,
            "k": k,
            "round_digits": round_digits,
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 4),
    )
    # per-batch partial top-k above means this groupby only merges
    # O(Q * k * n_batches) rows — never the full Q x N sims matrix
    def topk(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
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


def embedding_dupes(embeddings_ds, threshold: float = 0.95, block_rows: int = 4096):
    """Exact near-duplicate pairs by cosine -> Dataset(a, b, cos), a < b.

    Block-nested-loop self-join: the corpus is materialized as bounded
    Arrow blocks IN THE OBJECT STORE (to_arrow_refs — the driver only
    holds refs), then one task per unordered block pair (i <= j) pulls
    exactly two blocks (zero-copy reads) and matmuls them. Per-task
    memory is 2 x block_rows x dim regardless of corpus size, tasks
    scale as M(M+1)/2 across the cluster, and nothing is ever broadcast
    whole. Exact by construction — every pair is examined exactly once
    (cross-block pairs in their one (i, j) task, within-block pairs in
    the strict-upper-triangle of (i, i)).

    At 100 TB exact all-pairs is inherently quadratic; use
    ``lsh_bucket_ann``-style bucketing when approximate recall is
    acceptable.
    """
    import ray
    import ray.data

    rows = embeddings_ds.select_columns(["vec_id", "embedding"])
    n = rows.count()
    m_blocks = max(1, -(-n // block_rows))
    block_refs = rows.repartition(m_blocks).to_arrow_refs()

    pair_idx = [
        {"i": i, "j": j}
        for i in range(len(block_refs))
        for j in range(i, len(block_refs))
    ]

    def block_pair(batch: pa.Table) -> pa.Table:
        a_out, b_out, c_out = [], [], []
        for i, j in zip(batch.column("i").to_pylist(), batch.column("j").to_pylist()):
            tx = ray.get(block_refs[i])
            ty = tx if j == i else ray.get(block_refs[j])
            mx, xids = _to_matrix(tx), tx.column("vec_id").to_numpy()
            my, yids = (mx, xids) if j == i else (
                _to_matrix(ty), ty.column("vec_id").to_numpy()
            )
            sims = cosine_block(mx, my)
            hit = sims >= threshold
            # a < b: orient every pair by id; i == j keeps the strict
            # upper triangle only so nothing is double-counted
            hit &= xids[:, None] < yids[None, :]
            if j != i:
                lo = sims.T >= threshold
                lo &= yids[:, None] < xids[None, :]
                r2, c2 = np.nonzero(lo)
                a_out.append(yids[r2])
                b_out.append(xids[c2])
                c_out.append(sims.T[lo])
            r, c = np.nonzero(hit)
            a_out.append(xids[r])
            b_out.append(yids[c])
            c_out.append(sims[hit])
        if not a_out:
            a_cat = np.empty(0, dtype=np.int64)
            b_cat, c_cat = a_cat, np.empty(0, dtype=np.float64)
        else:
            a_cat = np.concatenate(a_out).astype(np.int64)
            b_cat = np.concatenate(b_out).astype(np.int64)
            c_cat = np.concatenate(c_out).astype(np.float64)
        return pa.table(
            {
                "a": pa.array(a_cat, pa.int64()),
                "b": pa.array(b_cat, pa.int64()),
                "cos": pa.array(c_cat, pa.float64()),
            }
        )

    return ray.data.from_items(pair_idx).map_batches(
        block_pair, batch_format="pyarrow", batch_size=1
    )


_IVF_SEED = 9176


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 5) -> np.ndarray:
    """Deterministic seeded k-means (Lloyd, fixed iterations) — the
    coarse quantizer. Small sample only; runs on the driver."""
    rng = np.random.RandomState(_IVF_SEED)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[np.sort(idx)].astype(np.float64).copy()
    for _ in range(iters):
        sims = cosine_block(sample, cents)  # (S, C)
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        # empty clusters re-seed deterministically from the sample
        for c in np.flatnonzero(np.bincount(assign, minlength=len(cents)) == 0):
            cents[c] = sample[rng.randint(len(sample))]
    return cents


def ivf_ann(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    centroid_ids: list[int] | None = None,
    round_digits: int | None = None,
):
    """IVF-bucketed approximate nearest neighbours — the coarse-
    quantizer scale path: a seeded k-means over a bounded sample gives
    C centroids (broadcast once); every corpus vector is assigned to
    its nearest centroid inside map_batches; each query probes its
    ``n_probe`` nearest centroids. The all-to-all is ONE groupby on the
    centroid id whose groups are ~N/C vectors; per-group search is an
    exact cosine top-k, and a tiny per-query merge finishes.

    Probing every centroid (n_probe == n_centroids) makes this EXACT —
    equal to ``ann_topk`` — which the tests pin; smaller n_probe trades
    recall for touching only n_probe/C of the corpus per query.
    """
    import ray
    import ray.data
    import polars as pl

    if centroid_ids is not None:
        # deterministic assignment-only quantizer (centroids = the
        # given vectors, no k-means iterations) — the SQL-checkable
        # configuration, same trick as semdedup
        cents, got = _collect_query_vectors(embeddings_ds, centroid_ids)
        if list(got) != sorted({int(c) for c in centroid_ids}):
            raise ValueError(f"centroid ids {centroid_ids} not all present")
        n_centroids = len(cents)
    else:
        # bounded deterministic sample for the quantizer (first blocks)
        sample_rows = embeddings_ds.limit(sample_size).take_all()
        sample = np.asarray(
            [r["embedding"] for r in sample_rows], dtype=np.float64
        )
        cents = _kmeans(sample, n_centroids)
    cref = ray.put(cents)

    qmat, qids = _collect_query_vectors(embeddings_ds, query_ids)
    # per-query probe lists (n_probe nearest centroids)
    qsims = cosine_block(qmat, cents)
    # ties -> lowest centroid id (lexsort secondary key), matching the
    # ivf_ann_det SQL oracle's ORDER BY s DESC, cid and the assignment
    # argmax below; plain argsort(-qsims) is tie-order-unstable
    cidx = np.arange(qsims.shape[1])
    probes = np.stack(
        [np.lexsort((cidx, -row))[: min(n_probe, len(cents))] for row in qsims]
    )

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        m = _to_matrix(batch)
        a = cosine_block(m, C).argmax(axis=1)
        return pa.table(
            {
                "bucket": pa.array(a.astype(np.int64), pa.int64()),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
                "is_query": pa.array(np.zeros(len(a), dtype=bool)),
                "query_id": pa.array(np.full(len(a), -1, dtype=np.int64), pa.int64()),
            }
        )

    assigned = embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    sch = assigned.schema()
    arrow_schema = getattr(sch, "base_schema", sch)
    emb_type = arrow_schema.field("embedding").type
    qb, qv, qe, qq = [], [], [], []
    for row, qid in enumerate(qids):
        for c in probes[row]:
            qb.append(int(c))
            qv.append(int(qid))
            qe.append(qmat[row].tolist())
            qq.append(int(qid))
    query_rows = ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(qb, pa.int64()),
                "vec_id": pa.array(qv, pa.int64()),
                "embedding": pa.array(qe, emb_type),
                "is_query": pa.array([True] * len(qb)),
                "query_id": pa.array(qq, pa.int64()),
            }
        )
    )

    def bucket_topk(group: pa.Table) -> pa.Table:
        isq = group.column("is_query").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}
        )
        if not isq.any() or isq.all():
            return empty
        corpus_t = group.filter(pa.array(~isq))
        query_t = group.filter(pa.array(isq))
        cm = _to_matrix(corpus_t)
        cids = corpus_t.column("vec_id").to_numpy()
        qm = _to_matrix(query_t)
        qids_l = query_t.column("query_id").to_numpy()
        sims = cosine_block(qm, cm)
        if round_digits is not None:
            from ..stages.textstats import round_half_away

            sims = round_half_away(sims, round_digits)
        out_q, out_n, out_c = [], [], []
        for row, qid in enumerate(qids_l.tolist()):
            keep = cids != qid
            cand_ids, cand = cids[keep], sims[row][keep]
            if len(cand_ids) > k:
                sel = np.lexsort((cand_ids, -cand))[:k]
                cand_ids, cand = cand_ids[sel], cand[sel]
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_c.append(cand)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(
                    np.concatenate(out_n).astype(np.int64), pa.int64()
                ),
                "cos": pa.array(
                    np.concatenate(out_c).astype(np.float64), pa.float64()
                ),
            }
        )

    per_bucket = (
        assigned.union(query_rows)
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        df = df.sort(["cos", "neighbor_id"], descending=[True, False]).head(k)
        return pa.table(
            {
                "query_id": df["query_id"].to_arrow(),
                "neighbor_id": df["neighbor_id"].to_arrow(),
                "rank": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                "cos": df["cos"].to_arrow(),
            }
        )

    return per_bucket.groupby("query_id").map_groups(merge, batch_format="pyarrow")


_LSH_PLANES_SEED = 1234


def lsh_planes(n_planes: int, dim: int) -> np.ndarray:
    """The deterministic hyperplane matrix (seeded) — exposed so tests
    and the SQL oracle can re-derive it."""
    return np.random.RandomState(_LSH_PLANES_SEED).randn(n_planes, dim)


def lsh_bucket_ann(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 12,
    round_digits: int | None = None,
):
    """Approximate ANN: random-hyperplane signatures bucket the corpus
    (groupby shuffle); each query searches only its bucket. The scale
    path when the corpus can't be broadcast."""
    import ray
    import polars as pl

    dim = len(embeddings_ds.take(1)[0]["embedding"])
    planes = lsh_planes(n_planes, dim)
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
    qarr = np.asarray(sorted({int(q) for q in query_ids}), dtype=np.int64)

    def bucket_topk(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy()
        local_q = np.flatnonzero(np.isin(ids, qarr)).tolist()
        if not local_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        m = _to_matrix(group)
        sims = cosine_block(m[local_q], m)
        if round_digits is not None:
            from ..stages.textstats import round_half_away

            sims = round_half_away(sims, round_digits)
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


def semdedup(
    embeddings_ds,
    n_clusters: int | None = 8,
    threshold: float = 0.85,
    centroid_ids: list[int] | None = None,
    round_digits: int | None = 4,
    kmeans: bool = False,
    sample_size: int = 2048,
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster the embedding space, then inside each cluster
    drop every vector with ANY lower-id neighbor (kept or dropped) at
    cosine >= threshold — transitive suppression, not the kept-only
    greedy variant: in a chain a~b~c (a!~c) this drops both b and c.

    Deterministic, SQL-checkable configuration (default): the
    centroids are the embeddings of ``centroid_ids`` (default vec_id
    0..n_clusters-1) and assignment is a single max-cosine pass (ties
    -> lowest centroid index) — no k-means iterations, so DuckDB can
    replay the whole pipeline.  Production configuration
    (``kmeans=True``): centroids come from the same seeded Lloyd
    k-means ``ivf_ann`` uses (bounded driver-side sample, broadcast
    once), with ``n_clusters=None`` applying the paper's practical
    sqrt(N) sizing rule so clusters stay worker-sized as the corpus
    grows; the dedup rule is identical in both configurations.

    Keep rule (low-id-wins, transitive suppression): vector v is
    DROPPED iff some u<v in the same cluster has cos(u, v) >=
    threshold, regardless of whether u itself was kept.  Deterministic
    and order-free.  Cosines are rounded (``round_digits``,
    half-away-from-zero) before the threshold test so the decision is
    summation-order-independent and replayable by the SQL oracle's
    ``round(..., d)`` — numpy matmul and DuckDB ``list_sum`` disagree
    in the last ulp, which matters only for pairs within ~1e-15 of tau.

    Scale shape: centroid matrix broadcast once via ``ray.put``;
    assignment is one vectorized matmul per batch; the only shuffle is
    the groupby(cluster).  Per-group work is O(|cluster|^2) matmul —
    at web scale raise n_clusters so clusters stay worker-sized (the
    same contract ivf_ann documents for its buckets).

    Returns (vec_id, cluster_id, kept) with kept as int64 0/1.
    """
    import ray

    if kmeans:
        if n_clusters is None:  # sqrt(N) rule: clusters stay worker-sized
            n_clusters = max(1, int(np.sqrt(embeddings_ds.count())))
        sample_rows = embeddings_ds.limit(sample_size).take_all()
        sample = np.asarray(
            [r["embedding"] for r in sample_rows], dtype=np.float64
        )
        cmat = _kmeans(sample, n_clusters)
    else:
        cids = (
            list(centroid_ids) if centroid_ids is not None
            else list(range(n_clusters))
        )
        cmat, got = _collect_query_vectors(embeddings_ds, cids)
        if list(got) != sorted(cids):
            raise ValueError(
                f"centroid ids {sorted(cids)} not all present (got {got})"
            )
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cref = ray.put(cmat / cn)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        m = _to_matrix(batch)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        sims = (m / mn) @ C.T
        cl = np.argmax(sims, axis=1).astype(np.int64)  # ties -> lowest index
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "embedding": batch.column("embedding"),
                "cluster_id": pa.array(cl, pa.int64()),
            }
        )

    def mark(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("vec_id").to_numpy(), kind="stable")
        group = group.take(pa.array(order))
        ids = group.column("vec_id").to_numpy()
        m = _to_matrix(group)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        g = m / mn
        sims = g @ g.T
        if round_digits is not None:
            from ..stages.textstats import round_half_away

            sims = round_half_away(sims, round_digits)
        # strict upper triangle: sims[u, v] with u < v (vec_id asc)
        dup = (np.triu(sims, k=1) >= threshold).any(axis=0)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": group.column("cluster_id"),
                "kept": pa.array((~dup).astype(np.int64), pa.int64()),
            }
        )

    assigned = embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    return assigned.groupby("cluster_id").map_groups(mark, batch_format="pyarrow")


def gram_matrix(embeddings_ds, scale: int = 1_000_000):
    """Distributed Gram matrix G = X^T X over the embedding column
    (upper triangle i <= j), the second-moment statistic behind PCA /
    whitening / covariance of an embedding corpus.

    Exactness: each coordinate is quantized q = round_half_away(x *
    scale) to int64 fixed-point (the catalog-oracle discipline — float32
    -> float64 casts are exact, the quantized products and sums are
    integer-exact in both engines), and the reported ``gram`` is ONE
    division of the exactly-reconstructed integer sum by scale^2, so the
    double is bit-identical between Ray and the DuckDB oracle regardless
    of summation order.

    100-TB shape: each input block contributes ONE d*(d+1)/2-row int64
    partial (d=64 -> 2080 rows, ~50 KB) computed as a vectorized integer
    matmul inside map_batches; the reduce is a bounded-key groupby over
    d^2 keys, so exchange traffic is O(blocks * d^2) — independent of
    corpus row count — and no stage ever materializes the row dimension.
    int64 headroom: |q| <= scale * max|x|; at scale=1e6, max|x|~4 the
    per-row product is <= 1.6e13, overflowing int64 only past ~5e5 rows
    PER PARTIAL — far above any single block — while the cross-block sum
    is exact because the groupby sum is promoted (Arrow sum of int64
    overflow-checked; at web scale lower `scale` to 1e4 or reduce per
    the docholder note below).
    """
    from ..stages.textstats import round_half_away

    empty = pa.table(
        {
            "i": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64()),
            "g": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # schema-pinned empty (Acero/groupby hazard)
            return empty
        x = _to_matrix(batch)
        q = round_half_away(x * float(scale), 0).astype(np.int64)
        g = q.T @ q
        ii, jj = np.triu_indices(g.shape[0])
        return pa.table(
            {
                "i": pa.array(ii.astype(np.int64)),
                "j": pa.array(jj.astype(np.int64)),
                "g": pa.array(g[ii, jj]),
            }
        )

    parts = embeddings_ds.select_columns(["embedding"]).map_batches(
        partial, batch_format="pyarrow"
    )
    red = parts.groupby(["i", "j"]).sum("g")

    def finish(t: pa.Table) -> pa.Table:
        g = t.column("sum(g)").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "i": t.column("i"),
                "j": t.column("j"),
                "gram": pa.array(g / float(scale) ** 2, pa.float64()),
            }
        )

    return red.map_batches(finish, batch_format="pyarrow").sort(["i", "j"])


def embedding_dim_stats(embeddings_ds, scale: int = 1_000_000):
    """Per-dimension count / mean / population variance of the embedding
    corpus — the normalization statistics for whitening and feature
    scaling (companion to :func:`gram_matrix`).

    Exactness: coordinates are quantized to int64 fixed-point
    (``round_half_away(x * scale)``); each block emits one d-row partial
    (k, n, s, ss); the reduce is a bounded d-key groupby.  The final
    d-row table converts the exact rationals to doubles with ONE
    division each — mean = s / (n*scale), var = (n*ss - s^2) /
    (n^2 * scale^2) — computed in arbitrary-precision Python ints
    (s^2 exceeds int64 already at ~10k rows) and mirrored by the
    oracle in HUGEINT, so the doubles are bit-identical.

    100-TB shape: exchange is O(blocks * d); the final map touches d
    rows (a Python loop over DIMENSIONS, not rows).  int64 partial
    headroom: per-block ss <= rows * (scale*max|x|)^2 — at scale=1e6
    the corpus-wide int64 ss sum overflows past ~1e18/(4e12) ~ 250B
    rows; beyond that lower ``scale`` (1e4 buys 4 orders) or shard the
    reduce by row range.
    """
    from ..stages.textstats import round_half_away

    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "ss": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        x = _to_matrix(batch)
        q = round_half_away(x * float(scale), 0).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "k": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, q.shape[0], dtype=np.int64)),
                "s": pa.array(q.sum(axis=0, dtype=np.int64)),
                "ss": pa.array((q * q).sum(axis=0, dtype=np.int64)),
            }
        )

    red = (
        embeddings_ds.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum(["n", "s", "ss"])
    )

    def finish(t: pa.Table) -> pa.Table:
        ks = t.column("k").to_pylist()
        ns = t.column("sum(n)").to_pylist()
        ss_ = t.column("sum(s)").to_pylist()
        sss = t.column("sum(ss)").to_pylist()
        means, vars_ = [], []
        for n, s, ss in zip(ns, ss_, sss):  # O(d) rows — exact big-int math
            means.append(float(s) / float(n * scale))
            vars_.append(float(n * ss - s * s) / float(n * n * scale * scale))
        return pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "mean": pa.array(means, pa.float64()),
                "var_pop": pa.array(vars_, pa.float64()),
            }
        )

    return red.map_batches(finish, batch_format="pyarrow").sort("k")


# ======================================================================
# Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
# billion-scale embedding-compression path: a d-dim vector becomes m
# small codes (here 4 bytes for d=64), and search runs over per-query
# distance TABLES (m x ks lookups per candidate) instead of d-dim
# arithmetic.  At 100 TB this is what keeps the candidate sweep
# memory-resident: 64 float32 (256 B) -> m uint8 (4 B), a 64x
# compression, with the codebook broadcast once via ray.put.
#
# Engine/oracle identity: every subspace distance is quantized to an
# INT64 micro-unit grid (floor(d * 1e6 + 0.5) — DuckDB's
# round-half-away) at the one point where float summation order could
# differ between numpy and DuckDB's list_sum; everything downstream
# (argmin code assignment, ADC sums, ranking) is exact integer
# arithmetic, bit-identical across engines.  Same convention as the
# rounded-cosine ANN entries; reference parity: this generalizes
# RedisSearchStorage::search's vector scoring to the compressed-domain
# form the reference never needed at its single-node scale.
# ======================================================================

_PQ_SCALE = 1_000_000


def pq_codebook(embeddings_ds, centroid_ids, m: int) -> np.ndarray:
    """Deterministic assignment-only PQ codebook: centroid j of EVERY
    subspace is the j-th listed vector's subvector (the semdedup /
    ivf_ann_det trick — no k-means, so the SQL oracle can replay it).
    Returns (m, ks, d//m) float64."""
    cents, got = _collect_query_vectors(embeddings_ds, centroid_ids)
    if list(got) != sorted({int(c) for c in centroid_ids}):
        raise ValueError(f"centroid ids {centroid_ids} not all present")
    ks, dim = cents.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return cents.reshape(ks, m, sub).transpose(1, 0, 2).copy()


def _pq_dists_us(X: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, d) x (m, ks, d/m) -> (n, m, ks) int64 micro-unit squared-L2
    distances between each row's subvectors and every subspace
    centroid.  The float->int grid snap happens HERE, once."""
    n = X.shape[0]
    m, ks, sub = cb.shape
    Xs = X.reshape(n, m, sub)
    out = np.empty((n, m, ks), dtype=np.int64)
    for s in range(m):
        # (n, ks, sub) broadcast diff; sum over the subspace axis
        d = ((Xs[:, s, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s, :] = np.floor(d * _PQ_SCALE + 0.5).astype(np.int64)
    return out


def pq_encode(embeddings_ds, centroid_ids, m: int = 4):
    """embeddings -> (vec_id, code0..code{m-1}, distortion_us): each
    vector's per-subspace nearest-centroid codes (argmin of the
    micro-unit distance, ties -> lowest centroid id) plus the exact
    int64 total quantization distortion.  Map-only — the codebook is
    ray.put once and every batch encodes independently; NO shuffle, so
    it streams at any corpus size."""
    import ray

    cb = pq_codebook(embeddings_ds, centroid_ids, m)
    cref = ray.put(cb)

    def encode(batch: pa.Table) -> pa.Table:
        book = ray.get(cref)
        X = _to_matrix(batch)
        d = _pq_dists_us(X, book)
        codes = d.argmin(axis=2)  # first minimal index = lowest cid
        distortion = d.min(axis=2).sum(axis=1)
        cols = {"vec_id": batch.column("vec_id").cast(pa.int64())}
        for s in range(book.shape[0]):
            cols[f"code{s}"] = pa.array(codes[:, s].astype(np.int64), pa.int64())
        cols["distortion_us"] = pa.array(distortion.astype(np.int64), pa.int64())
        return pa.table(cols)

    return embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        encode, batch_format="pyarrow"
    )


def pq_ann(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    centroid_ids=None,
    m: int = 4,
):
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes an (m, ks) int64 distance table against the codebook;
    a candidate's distance is m table lookups summed exactly in int64.
    Per-batch partial top-k (bounded candidate spill: Q*k rows per
    batch) + one per-query merge — the same two-stage shape as
    ann_topk, but the batch kernel never touches d-dim floats after
    encoding.  Ascending distance, ties -> lowest neighbor id; the
    query's own row is excluded."""
    import ray

    if centroid_ids is None:
        centroid_ids = list(range(8))
    cb = pq_codebook(embeddings_ds, centroid_ids, m)
    qmat, qids = _collect_query_vectors(embeddings_ds, query_ids)
    qtables = _pq_dists_us(qmat, cb)  # (Q, m, ks)
    qarr = np.asarray(qids, dtype=np.int64)
    ref = ray.put((cb, qarr, qtables))

    def cand(batch: pa.Table) -> pa.Table:
        book, qa, qt = ray.get(ref)
        mm = book.shape[0]
        X = _to_matrix(batch)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _pq_dists_us(X, book).argmin(axis=2)  # (n, m)
        # adc[q, n] = sum_s qt[q, s, codes[n, s]] — exact int64
        adc = qt[:, 0, :][:, codes[:, 0]].copy()
        for s in range(1, mm):
            adc += qt[:, s, :][:, codes[:, s]]
        out_q, out_n, out_d = [], [], []
        for row, qid in enumerate(qa.tolist()):
            keep = vids != qid
            c_ids, c_d = vids[keep], adc[row][keep]
            if len(c_ids) > k:
                sel = np.lexsort((c_ids, c_d))[:k]
                c_ids, c_d = c_ids[sel], c_d[sel]
            out_q.append(np.full(len(c_ids), qid, dtype=np.int64))
            out_n.append(c_ids)
            out_d.append(c_d)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "adc_us": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    import polars as pl

    def merge(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(["adc_us", "neighbor_id"]).head(k)
        return pa.table(
            {
                "query_id": df["query_id"].to_arrow().cast(pa.int64()),
                "neighbor_id": df["neighbor_id"].to_arrow().cast(pa.int64()),
                "rnk": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                "adc_us": df["adc_us"].to_arrow().cast(pa.int64()),
            }
        )

    return (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(cand, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def ivf_pq_ann(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    centroid_ids=None,
    n_probe: int = 2,
    m: int = 4,
):
    """IVFADC (Jégou 2011 §IV): the composed billion-scale ANN recipe —
    an IVF coarse quantizer restricts each query to ``n_probe`` buckets
    and the scan inside a bucket is PQ asymmetric distance over codes,
    never raw vectors.  ONE deterministic centroid table plays both
    roles (bucket = nearest centroid by full-vector cosine, exactly
    ivf_ann_det's rule; PQ codebook = the same vectors' subvectors), so
    the SQL oracle reuses one CTE for both quantizers.

    Scale shape: the corpus map emits only (bucket, vec_id, codes) —
    a ~20-byte row regardless of d, which is the point: the groupby
    exchange and the per-bucket scans ship codes, not embeddings.
    Probing all buckets degrades exactly to :func:`pq_ann`'s ranking
    (pinned in tests); ADC sums are exact int64 as in pq_ann."""
    import ray

    if centroid_ids is None:
        centroid_ids = list(range(8))
    cents, got = _collect_query_vectors(embeddings_ds, centroid_ids)
    if list(got) != sorted({int(c) for c in centroid_ids}):
        raise ValueError(f"centroid ids {centroid_ids} not all present")
    ks, dim = cents.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    cb = cents.reshape(ks, m, dim // m).transpose(1, 0, 2).copy()

    qmat, qids = _collect_query_vectors(embeddings_ds, query_ids)
    qtables = _pq_dists_us(qmat, cb)  # (Q, m, ks)
    qsims = cosine_block(qmat, cents)
    cidx = np.arange(qsims.shape[1])
    # per-bucket probe map {bucket: [row indices into qids]} — ties ->
    # lowest centroid id, the ivf_ann_det ORDER BY s DESC, cid rule
    probes_of: dict[int, list[int]] = {}
    for row in range(len(qids)):
        for c in np.lexsort((cidx, -qsims[row]))[: min(n_probe, ks)]:
            probes_of.setdefault(int(c), []).append(row)
    qarr = np.asarray(qids, dtype=np.int64)
    ref = ray.put((cents, cb, qarr, qtables, probes_of))

    def assign_encode(batch: pa.Table) -> pa.Table:
        cs, book, _, _, _ = ray.get(ref)
        X = _to_matrix(batch)
        bucket = cosine_block(X, cs).argmax(axis=1)
        codes = _pq_dists_us(X, book).argmin(axis=2)
        cols = {
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            "vec_id": batch.column("vec_id").cast(pa.int64()),
        }
        for s in range(book.shape[0]):
            cols[f"code{s}"] = pa.array(codes[:, s].astype(np.int64), pa.int64())
        return pa.table(cols)

    def bucket_topk(group: pa.Table) -> pa.Table:
        _, book, qa, qt, pmap = ray.get(ref)
        mm = book.shape[0]
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "adc_us": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        bucket = int(group.column("bucket")[0].as_py())
        rows = pmap.get(bucket, [])
        if not rows:
            return empty
        vids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.stack(
            [group.column(f"code{s}").to_numpy(zero_copy_only=False) for s in range(mm)],
            axis=1,
        ).astype(np.int64)
        out_q, out_n, out_d = [], [], []
        for row in rows:
            qid = int(qa[row])
            adc = qt[row, 0, :][codes[:, 0]].copy()
            for s in range(1, mm):
                adc += qt[row, s, :][codes[:, s]]
            keep = vids != qid
            c_ids, c_d = vids[keep], adc[keep]
            if len(c_ids) > k:
                sel = np.lexsort((c_ids, c_d))[:k]
                c_ids, c_d = c_ids[sel], c_d[sel]
            out_q.append(np.full(len(c_ids), qid, dtype=np.int64))
            out_n.append(c_ids)
            out_d.append(c_d)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "adc_us": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    import polars as pl

    def merge(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(["adc_us", "neighbor_id"]).head(k)
        return pa.table(
            {
                "query_id": df["query_id"].to_arrow().cast(pa.int64()),
                "neighbor_id": df["neighbor_id"].to_arrow().cast(pa.int64()),
                "rnk": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                "adc_us": df["adc_us"].to_arrow().cast(pa.int64()),
            }
        )

    return (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign_encode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )


# ======================================================================
# Scalar quantization (SQ8) — the per-dimension affine codec (faiss
# SQuantizer8bit shape) that complements PQ's subspace codebooks: one
# byte per dimension, trained with only per-dim min/max.  Same
# micro-grid discipline as PQ: coordinates snap to int64 once
# (round_half_away * 1e6), then codes, reconstructions and ADC
# distances are pure integer arithmetic, bit-identical to the oracle.
# ======================================================================

_SQ_SCALE = 1_000_000


def sq8_train(embeddings_ds):
    """Per-dim (min, max) over the micro-quantized corpus — the whole
    SQ8 'codebook'.  One O(blocks*d) partial + a d-key bounded groupby;
    the d-row result is value-domain-bounded, so collecting it to
    broadcast is exactly the repo's gated-collect discipline.  Returns
    (mn, mx) int64 arrays of shape (d,)."""
    from ray.data.aggregate import Max, Min

    from ..stages.textstats import round_half_away

    empty = pa.table(
        {"dim": pa.array([], pa.int64()), "mn": pa.array([], pa.int64()),
         "mx": pa.array([], pa.int64())}
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        q = round_half_away(
            _to_matrix(b) * float(_SQ_SCALE), 0
        ).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mn": pa.array(q.min(axis=0)),
                "mx": pa.array(q.max(axis=0)),
            }
        )

    red = (
        embeddings_ds.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )
    rows = sorted(red.take_all(), key=lambda r: r["dim"])  # d rows, bounded
    mn = np.array([int(r["mn"]) for r in rows], dtype=np.int64)
    mx = np.array([int(r["mx"]) for r in rows], dtype=np.int64)
    return mn, mx


def _sq_codes(X: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """(n, d) floats -> (n, d) int64 codes in 0..255.  code =
    floor((q-mn)*255/(mx-mn) + 1/2) computed as the exact integer
    ((q-mn)*510 + (mx-mn)) // (2*(mx-mn)); constant dims code to 0."""
    from ..stages.textstats import round_half_away

    q = round_half_away(X * float(_SQ_SCALE), 0).astype(np.int64)
    rng = mx - mn
    safe = np.where(rng == 0, 1, rng)
    c = ((q - mn[None, :]) * 510 + safe[None, :]) // (2 * safe[None, :])
    c[:, rng == 0] = 0
    return c


def sq8_encode(embeddings_ds, mn: np.ndarray, mx: np.ndarray):
    """-> (vec_id, dim, code) one byte-sized code per (vector, dim).
    Map-only: (mn, mx) ride one ray.put; int64 headroom (q-mn)*510 <=
    510 * 2 * scale * max|x| ~ 1e9 — nowhere near the edge."""
    import ray

    ref = ray.put((mn, mx))

    def encode(b: pa.Table) -> pa.Table:
        m_n, m_x = ray.get(ref)
        X = _to_matrix(b)
        c = _sq_codes(X, m_n, m_x)
        n, d = c.shape
        vids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vids, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "code": pa.array(c.reshape(-1)),
            }
        )

    return embeddings_ds.select_columns(["vec_id", "embedding"]).map_batches(
        encode, batch_format="pyarrow"
    )


def sq8_ann(embeddings_ds, query_ids: list[int], k: int = 10):
    """Asymmetric top-k over SQ8 codes: the query stays on the exact
    micro grid, candidates are their reconstructions 255*mn +
    code*(mx-mn) (both in 255*micro units), and dist = sum_j (255*q_j -
    r_j)^2 is exact int64 (|term| <= (510*scale*max|x|)^2 ~ 8e16, d=64
    sum ~ 5e18 < 2^63; drop _SQ_SCALE a decade for wider value ranges).
    Same two-stage shape as pq_ann: per-batch partial top-k, one
    per-query merge.  Ascending distance, ties -> lowest neighbor id,
    self excluded."""
    import ray

    from ..stages.textstats import round_half_away

    mn, mx = sq8_train(embeddings_ds)
    # int64 headroom guard: worst per-dim |255*q - r| <= 255*(mx-mn)
    # plus the query's own offset; d * term^2 must stay under 2^63 or
    # numpy would WRAP silently (the oracle's HUGEINT would error
    # loudly instead — fail the same way here).
    d = len(mn)
    # tight: queries are corpus rows, so qs and r both lie in
    # [255*mn_j, 255*mx_j] and |qs - r| <= 255*(mx_j - mn_j)
    worst = 255 * int(np.max(mx - mn)) if d else 0
    if d * worst * worst >= 2**63:
        raise ValueError(
            f"sq8_ann int64 ADC overflow risk: d={d}, worst per-dim "
            f"term {worst}^2 — lower _SQ_SCALE (value range too wide)"
        )
    qmat, qids = _collect_query_vectors(embeddings_ds, query_ids)
    qgrid = round_half_away(qmat * float(_SQ_SCALE), 0).astype(np.int64)
    qs = 255 * qgrid  # (Q, d) in 255*micro units
    qarr = np.asarray(qids, dtype=np.int64)
    ref = ray.put((mn, mx, qarr, qs))

    def cand(b: pa.Table) -> pa.Table:
        m_n, m_x, qa, qq = ray.get(ref)
        X = _to_matrix(b)
        vids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        c = _sq_codes(X, m_n, m_x)
        r = 255 * m_n[None, :] + c * (m_x - m_n)[None, :]  # (n, d)
        out_q, out_n, out_d = [], [], []
        for row, qid in enumerate(qa.tolist()):
            diff = qq[row][None, :] - r
            dist = (diff * diff).sum(axis=1)
            keep = vids != qid
            c_ids, c_d = vids[keep], dist[keep]
            if len(c_ids) > k:
                sel = np.lexsort((c_ids, c_d))[:k]
                c_ids, c_d = c_ids[sel], c_d[sel]
            out_q.append(np.full(len(c_ids), qid, dtype=np.int64))
            out_n.append(c_ids)
            out_d.append(c_d)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "dist_us": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    import polars as pl

    def merge(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(["dist_us", "neighbor_id"]).head(k)
        return pa.table(
            {
                "query_id": df["query_id"].to_arrow().cast(pa.int64()),
                "neighbor_id": df["neighbor_id"].to_arrow().cast(pa.int64()),
                "rnk": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                "dist_us": df["dist_us"].to_arrow().cast(pa.int64()),
            }
        )

    return (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(cand, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )
