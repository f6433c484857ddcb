"""Deduplication operators for the training-data pipeline.

- exact:      content-hash (md5) -> groupby(hash) -> min doc_id survivor
- MinHash+LSH near-dup: word-shingles -> 64 minhashes -> 16 bands of 4
  -> groupby(band, band_hash) candidate buckets -> pairwise verify exact
  Jaccard -> (a, b, jaccard) pairs. The LSH groupby is the shuffle;
  buckets are tiny, verification is per-bucket vectorized.
- SimHash:    64-bit near-dup signature per doc (vectorized bitcount).
- n-gram Jaccard: exact Jaccard over 3-token shingles for candidate
  pairs (used by the verify step and exposed standalone).

All hashing is vectorized and deterministic across processes — token
hashes come from polars' seeded 64-bit hash (one Rust kernel call per
batch, stable for a given polars version), shingle/band combination is
numpy uint64 multiply-xor with seeded constants; no Python hash(), no
RNG at runtime (all constants come from a seeded generator at import
time). No per-token Python loops anywhere in the hot path.

Reference ties: the visited-set / upsert exact dedup
(src/crawler/URLFrontier.cpp:25-81, src/storage/ContentStorage.cpp:246-283)
has no near-dup analog in the reference; MinHash/SimHash are the
standard extensions for web-corpus pipelines (SURVEY.md §2.8 notes the
gap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import polars as pl

TOKEN_RE = r"[A-Za-z0-9]{2,}"

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = 4

# deterministic odd multipliers/addends for the 64 minhash permutations
_rng = np.random.RandomState(0xC0FFEE)
_MH_A = (_rng.randint(1, 1 << 31, size=N_PERM).astype(np.uint64) * 2 + 1)
_MH_B = _rng.randint(0, 1 << 31, size=N_PERM).astype(np.uint64)
_MH_MASK = np.uint64((1 << 61) - 1)


def text_md5(batch: pa.Table, col: str = "text") -> pa.Table:
    vals = batch.column(col).to_pylist()
    digests = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column("text_md5", pa.array(digests, pa.string()))


def exact_dedup(docs_ds, col: str = "text"):
    """-> (text_md5, doc_id) one row per distinct content, min doc_id.
    Group count == distinct contents (corpus-proportional), so the
    reduction runs through sorted_agg (range exchange + per-block
    vectorized group_by) rather than Ray's per-group-Python
    groupby().aggregate()."""
    from .shuffle import AUTO_THRESHOLD, sorted_agg

    hashed = docs_ds.map_batches(
        lambda b: text_md5(b, col).select(["text_md5", "doc_id"]),
        batch_format="pyarrow",
    )
    return sorted_agg(
        hashed, "text_md5", {"doc_id": ("min", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )


def incremental_dedup(new_docs, corpus_hashes, col: str = "text", **gate_kwargs):
    """Dedup a NEW shard against an EXISTING corpus — the production
    flow when a fresh crawl lands next to an already-deduped 100-TB
    corpus: the old corpus is never reshuffled, only its narrow
    content-hash index participates.

    Reference tie: this is the batch form of the upsert visited-set
    check (URLFrontier::hasBeenVisited, src/crawler/URLFrontier.cpp:25-81;
    ContentStorage update-or-insert, src/storage/ContentStorage.cpp:246-283)
    applied to content identity instead of URL identity.

    Steps:
      1. within-shard exact dedup — min-doc_id survivor per content
         hash (sorted_agg, corpus-proportional keys);
      2. anti-join the survivors' hashes against ``corpus_hashes``
         (a Dataset with a ``text_md5`` column — in production the
         PERSISTED hash index from the corpus' own exact_dedup run,
         not a rescan), threshold-gated broadcast vs distributed
         left_anti per functions/joins.py.

    Returns the surviving new-shard rows as (text_md5, doc_id).
    """
    from ..functions.joins import semi_or_anti_join

    within = exact_dedup(new_docs, col)
    return semi_or_anti_join(
        within, "text_md5", corpus_hashes, "text_md5", anti=True, **gate_kwargs
    )


# ---- shingles + minhash ------------------------------------------------

_TOKEN_HASH_SEED = 24862
# positional odd multipliers for combining token hashes into shingle
# hashes (order-sensitive: "a b c" != "c b a")
_SH_C = (_rng.randint(1, 1 << 62, size=8).astype(np.uint64) * 2 + 1)


def _token_hashes(
    texts: list[str], token_hash: str = "polars"
) -> list[np.ndarray]:
    """Per doc: uint64 hash per token, in order — ONE vectorized polars
    hash kernel call for the whole batch, no per-token Python.
    ``token_hash="md5"`` swaps in the DuckDB-reproducible
    md5_number_lower hash (distinct tokens hashed once) so the whole
    MinHash pipeline becomes SQL-checkable; verification scales only."""
    df = pl.DataFrame(
        {
            "i": pl.Series(np.arange(len(texts), dtype=np.int64)),
            "t": pl.Series([x or "" for x in texts], dtype=pl.String),
        }
    )
    ex = (
        df.with_columns(
            pl.col("t").str.to_lowercase().str.extract_all(TOKEN_RE).alias("tok")
        )
        .drop("t")
        .explode("tok", empty_as_null=True)
        .drop_nulls("tok")
    )
    if token_hash == "md5":
        # hash each DISTINCT token once, then a vectorized polars map —
        # no per-occurrence Python loop
        import hashlib

        lut = {
            t: int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            for t in ex["tok"].unique().to_list()
        }
        ex = ex.with_columns(
            pl.col("tok").replace_strict(lut, return_dtype=pl.UInt64).alias("h")
        )
    else:
        ex = ex.with_columns(pl.col("tok").hash(seed=_TOKEN_HASH_SEED).alias("h"))
    g = ex.group_by("i", maintain_order=True).agg(pl.col("h"))
    grouped = dict(zip(g["i"].to_list(), g["h"].to_list()))
    return [
        np.asarray(grouped.get(i, ()), dtype=np.uint64) for i in range(len(texts))
    ]


def _shingle_hashes(
    texts: list[str], k: int = 3, token_hash: str = "polars"
) -> list[np.ndarray]:
    """Per doc: sorted unique uint64 hashes of k-token shingles —
    sliding-window multiply-xor over the vectorized token hashes."""
    out = []
    for h in _token_hashes(texts, token_hash):
        n = len(h)
        if n == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        if n < k:
            # mirrors the old single-shingle-of-all-tokens behavior;
            # uint64 wraparound is the intended mod-2^64 arithmetic —
            # compute on 1-element arrays so numpy doesn't warn about
            # scalar overflow
            acc = np.zeros(1, dtype=np.uint64)
            for j in range(n):
                acc ^= h[j : j + 1] * _SH_C[j % len(_SH_C)]
            out.append(acc)
            continue
        m = n - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc ^= h[j : j + m] * _SH_C[j % len(_SH_C)]
        out.append(np.unique(acc))
    return out


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64 minhash values for one doc's shingle-hash set (vectorized)."""
    if len(sh) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_perm, n_shingles) permuted values, min over shingles
    v = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]) & _MH_MASK
    return v.min(axis=1)


# odd multipliers combining a band's minhash rows into one band hash
_BAND_C = (_rng.randint(1, 1 << 62, size=ROWS_PER_BAND).astype(np.uint64) * 2 + 1)


_SIG_SHINGLE_CHUNK = 1 << 20  # permuted-value buffer cap: 8 perms x 1M x 8B = 64 MB


def _batch_signatures(shs: list[np.ndarray]) -> np.ndarray:
    """(n_docs, N_PERM) minhash signatures with no per-doc Python in
    the signature math: docs' shingle hashes are concatenated in
    doc-boundary-aligned groups and each doc's min comes from
    ``minimum.reduceat``.  Two chunk axes bound the permuted-value
    buffer to <= 8 perms x _SIG_SHINGLE_CHUNK shingles (~64 MB)
    regardless of batch size or per-doc shingle counts."""
    n = len(shs)
    sigs = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = [i for i, s in enumerate(shs) if len(s)]
    if not nonempty:
        return sigs

    def run(group: list[int]) -> None:
        cat = np.concatenate([shs[i] for i in group])
        lens = np.array([len(shs[i]) for i in group], dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        rows = np.array(group, dtype=np.int64)
        for p0 in range(0, N_PERM, 8):
            p1 = min(p0 + 8, N_PERM)
            v = (cat[None, :] * _MH_A[p0:p1, None] + _MH_B[p0:p1, None]) & _MH_MASK
            sigs[rows, p0:p1] = np.minimum.reduceat(v, starts, axis=1).T

    group: list[int] = []
    acc = 0
    for i in nonempty:
        if group and acc + len(shs[i]) > _SIG_SHINGLE_CHUNK:
            run(group)
            group, acc = [], 0
        group.append(i)
        acc += len(shs[i])
    if group:
        run(group)
    return sigs


def minhash_bands(batch: pa.Table, k: int = 3, token_hash: str = "polars") -> pa.Table:
    """docs -> (band, band_hash, doc_id) rows for the LSH groupby —
    signatures stacked once, band hashes one vectorized multiply-xor."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    n = len(texts)
    if n == 0:
        return pa.table(
            {"band": pa.array([], pa.int32()), "band_hash": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64())}
        )
    sigs = _batch_signatures(_shingle_hashes(texts, k, token_hash))  # (n, N_PERM)
    chunks = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
    bh = np.zeros((n, N_BANDS), dtype=np.uint64)
    for j in range(ROWS_PER_BAND):
        bh ^= chunks[:, :, j] * _BAND_C[j]
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(N_BANDS, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, N_BANDS).astype(np.int64), pa.int64()),
        }
    )


def jaccard_pairs(texts_by_id: dict[int, str], pairs: list[tuple[int, int]], k: int = 3):
    """Exact shingle-Jaccard for candidate pairs -> [(a, b, jaccard)]."""
    cache: dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        v = cache.get(i)
        if v is None:
            v = _shingle_hashes([texts_by_id[i]], k)[0]
            cache[i] = v
        return v

    out = []
    for a, b in pairs:
        sa, sb = sh(a), sh(b)
        if len(sa) == 0 or len(sb) == 0:
            out.append((a, b, 0.0))
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        out.append((a, b, inter / union))
    return out


def doc_shingles(batch: pa.Table, k: int = 3, token_hash: str = "polars") -> pa.Table:
    """docs -> (doc_id, sh binary) sorted-unique shingle hashes, packed
    as little-endian uint64 bytes (Acero's hash join can carry binary
    payload columns but not list<uint64>)."""
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    sh = _shingle_hashes(texts, k, token_hash)
    return pa.table(
        {"doc_id": ids, "sh": pa.array([s.tobytes() for s in sh], pa.binary())}
    )


def minhash_near_dupes(
    docs_ds,
    threshold: float = 0.5,
    k: int = 3,
    num_partitions: int = 8,
    token_hash: str = "polars",
    attach_byte_limit: int = 64 * 1024 * 1024,
):
    """Full near-dup pipeline -> Dataset(a, b, jaccard) with jaccard >=
    threshold, deduplicated pairs, a < b.

    Fully distributed — nothing ever materializes on the driver:
    1. minhash + banding per doc (map_batches);
    2. groupby(band, band_hash) emits candidate pairs per LSH bucket;
    3. groupby(a, b) dedups pairs that collided in several bands;
    4. the shingle table is first SEMI-JOINED down to the docs that
       appear in any candidate pair (dup-volume-proportional, a small
       fraction of the corpus) — the full corpus' shingle payloads are
       never exchanged; the reduced table then attaches to the pairs
       via a gated broadcast (map-side, zero further exchanges) under
       ``attach_byte_limit``, or two hash joins against the reduced
       table above it — either way sized by dup volume, not corpus;
    5. one map_batches verifies exact Jaccard over whole batches
       (sorted-array intersect per pair — no per-pair map_groups call
       overhead).
    """
    import pyarrow.compute as _pc

    bands = docs_ds.map_batches(
        lambda b: minhash_bands(b, k, token_hash), batch_format="pyarrow"
    ).materialize()  # signatures feed BOTH sides of the self-join

    # intra-bucket candidate pairs via a SELF-JOIN on the band keys —
    # Acero's vectorized hash join replaces the old per-bucket Python
    # map_groups (corpus-proportional bucket count made that call
    # overhead the dominant cost of the whole operator)
    def _side(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "band": b.column("band"),
                    "band_hash": b.column("band_hash"),
                    name: b.column("doc_id"),
                }
            )

        return fn

    pairs_ds = (
        bands.map_batches(_side("a"), batch_format="pyarrow")
        .join(
            bands.map_batches(_side("b"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("band", "band_hash"),
        )
        # merge the join's schema-less empty partitions before any map
        .repartition(num_partitions)
        .map_batches(
            lambda b: b.filter(
                _pc.less(b.column("a"), b.column("b"))
            ).select(["a", "b"]),
            batch_format="pyarrow",
        )
    )

    from .shuffle import AUTO_THRESHOLD, sorted_distinct

    # distinct candidate pairs: pair count is dup-volume-proportional,
    # so the dedup runs through sorted_distinct (vectorized per-block
    # group_by) instead of a per-pair Python map_groups call.
    # materialize() pins the candidate pairs in the OBJECT STORE
    # (distributed blocks, not the driver) so the emptiness probe below
    # doesn't recompute the banding pipeline; an empty dataset has no
    # schema and would break the join's key-field resolution
    uniq = sorted_distinct(
        pairs_ds, ["a", "b"], auto_threshold=AUTO_THRESHOLD
    ).materialize()
    if uniq.count() == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        )

    # attach each pair's shingle sets.  The candidate-INVOLVED doc set
    # is dup-volume-proportional — a small fraction of the corpus — so
    # never exchange the whole shingle table through two hash joins
    # just to decorate the pairs (measured 15 s of the operator's 20 s
    # at sf0.1 for 257 pairs):
    #   1. semi-join the shingle table down to involved docs
    #      (broadcast is_in probe under BROADCAST_ROW_LIMIT ids — a
    #      pure streaming filter, zero exchanges — left_semi hash join
    #      above it);
    #   2. under the byte limit, broadcast the REDUCED shingle table
    #      and attach+verify map-side (zero further exchanges); above
    #      it, run the two pair-attach joins against the reduced table.
    from ..functions.joins import gated_lookup, semi_or_anti_join

    sh_ds = docs_ds.map_batches(
        lambda b: doc_shingles(b, k, token_hash), batch_format="pyarrow"
    )

    def pair_ids(b: pa.Table) -> pa.Table:
        both = pa.chunked_array(
            [b.column("a").combine_chunks(), b.column("b").combine_chunks()]
        )
        return pa.table({"doc_id": _pc.unique(both)})

    ids_ds = uniq.map_batches(pair_ids, batch_format="pyarrow")
    sh_needed = semi_or_anti_join(sh_ds, "doc_id", ids_ds, "doc_id")
    mode, side = gated_lookup(
        sh_needed, "doc_id", ["sh"], byte_limit=attach_byte_limit
    )

    def as_side(side_name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    side_name: batch.column("doc_id"),
                    f"sh_{side_name}": batch.column("sh"),
                }
            )

        return fn

    if mode == "broadcast":
        import ray as _ray

        def attach(b: pa.Table) -> pa.Table:
            lut = pl.from_arrow(_ray.get(side))
            return (
                pl.from_arrow(b)
                .join(
                    lut.rename({"doc_id": "a", "sh": "sh_a"}), on="a", how="left"
                )
                .join(
                    lut.rename({"doc_id": "b", "sh": "sh_b"}), on="b", how="left"
                )
                .to_arrow()
            )

        joined = uniq.map_batches(attach, batch_format="pyarrow")
    else:
        joined = uniq.join(
            sh_needed.map_batches(as_side("a"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("a",),
            # the first join emits SCHEMA-LESS blocks for empty hash
            # partitions; as the LEFT side of the second join they break
            # Acero key resolution ("no match for FieldRef.Name(b)") —
            # a partition-layout-dependent flake. Merge them away first.
        ).repartition(num_partitions).join(
            sh_needed.map_batches(as_side("b"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("b",),
        )

    def verify_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        sa_col = batch.column("sh_a").combine_chunks() if isinstance(
            batch.column("sh_a"), pa.ChunkedArray
        ) else batch.column("sh_a")
        sb_col = batch.column("sh_b").combine_chunks() if isinstance(
            batch.column("sh_b"), pa.ChunkedArray
        ) else batch.column("sh_b")
        jac = np.zeros(n, dtype=np.float64)
        for i in range(n):
            sa = np.frombuffer(sa_col[i].as_py() or b"", dtype=np.uint64)
            sb = np.frombuffer(sb_col[i].as_py() or b"", dtype=np.uint64)
            if len(sa) and len(sb):
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                jac[i] = inter / (len(sa) + len(sb) - inter)
        keep = jac >= threshold
        out = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    verified = joined.map_batches(verify_batch, batch_format="pyarrow")
    # Empty blocks lose their schema going through ANY map stage: Ray's
    # output block builder drops an empty table's schema even when the
    # UDF pins one explicitly (measured on 2.49 — an empty (k,a) table
    # returned from map_batches lands as a 0-column block, with Ray
    # logging a "new schema: ." warning). Schema-less blocks then break
    # later joins (Acero: "no match for key field") and sorts. So the
    # UDF-side fix is impossible; a repartition of the (small) verified
    # pair set is the working normalization for every consumer.
    return verified.repartition(num_partitions)


def incremental_minhash_dedup(
    shard_docs,
    corpus_bands,
    corpus_shingles,
    threshold: float = 0.5,
    k: int = 3,
    num_partitions: int = 8,
    token_hash: str = "polars",
    attach_byte_limit: int = 64 * 1024 * 1024,
    **gate_kwargs,
):
    """NEAR-dup form of :func:`incremental_dedup`: drop every doc of a
    NEW shard that has a verified near-twin (Jaccard >= threshold) in
    an EXISTING corpus, where the corpus participates only through its
    PRECOMPUTED MinHash index — ``corpus_bands`` (doc_id, band,
    band_hash) and ``corpus_shingles`` (doc_id, sh) as persisted by the
    corpus' own dedup run — never its texts.  Returns Dataset(doc_id)
    of shard survivors.

    Fully distributed, dup-volume-sized exchanges throughout:
      1. shard minhash+banding (map_batches);
      2. candidate (s, c) pairs via a shard-bands ⋈ corpus-bands hash
         join on (band, band_hash), distinct via sorted_distinct;
      3. shingle sets for INVOLVED docs only (semi-join reduction on
         both sides), attached map-side under ``attach_byte_limit``
         via a gated broadcast or by hash joins above it;
      4. vectorized exact-Jaccard verify; dropped = distinct s of
         verified pairs; survivors = shard ids anti-join dropped
         (threshold-gated, functions/joins.py).
    """
    import pyarrow.compute as _pc

    import ray.data

    from ..functions.joins import gated_lookup, semi_or_anti_join
    from .shuffle import AUTO_THRESHOLD, sorted_distinct

    shard_ids = shard_docs.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    shard_bands = shard_docs.map_batches(
        lambda b: minhash_bands(b, k, token_hash), batch_format="pyarrow"
    )

    def _side(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "band": b.column("band"),
                    "band_hash": b.column("band_hash"),
                    name: b.column("doc_id"),
                }
            )

        return fn

    pairs_ds = (
        shard_bands.map_batches(_side("s"), batch_format="pyarrow")
        .join(
            corpus_bands.map_batches(_side("c"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("band", "band_hash"),
        )
        .repartition(num_partitions)  # merge schema-less empty partitions
        .map_batches(lambda b: b.select(["s", "c"]), batch_format="pyarrow")
    )
    uniq = sorted_distinct(
        pairs_ds, ["s", "c"], auto_threshold=AUTO_THRESHOLD
    ).materialize()
    if uniq.count() == 0:
        return shard_ids

    # shingle sets for involved docs only (both sides semi-joined down)
    sh_shard = shard_docs.map_batches(
        lambda b: doc_shingles(b, k, token_hash), batch_format="pyarrow"
    )
    s_ids = uniq.map_batches(
        lambda b: pa.table({"doc_id": _pc.unique(b.column("s"))}),
        batch_format="pyarrow",
    )
    c_ids = uniq.map_batches(
        lambda b: pa.table({"doc_id": _pc.unique(b.column("c"))}),
        batch_format="pyarrow",
    )
    sh_needed = semi_or_anti_join(sh_shard, "doc_id", s_ids, "doc_id").union(
        semi_or_anti_join(corpus_shingles, "doc_id", c_ids, "doc_id")
    )
    mode, side = gated_lookup(
        sh_needed, "doc_id", ["sh"], byte_limit=attach_byte_limit
    )

    if mode == "broadcast":
        import ray as _ray

        def attach(b: pa.Table) -> pa.Table:
            lut = pl.from_arrow(_ray.get(side))
            return (
                pl.from_arrow(b)
                .join(lut.rename({"doc_id": "s", "sh": "sh_s"}), on="s", how="left")
                .join(lut.rename({"doc_id": "c", "sh": "sh_c"}), on="c", how="left")
                .to_arrow()
            )

        joined = uniq.map_batches(attach, batch_format="pyarrow")
    else:

        def as_side(side_name: str):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        side_name: batch.column("doc_id"),
                        f"sh_{side_name}": batch.column("sh"),
                    }
                )

            return fn

        joined = uniq.join(
            sh_needed.map_batches(as_side("s"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("s",),
        ).repartition(num_partitions).join(
            sh_needed.map_batches(as_side("c"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("c",),
        )

    def dropped_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        s_sh = batch.column("sh_s").combine_chunks()
        c_sh = batch.column("sh_c").combine_chunks()
        keep = np.zeros(n, dtype=bool)
        for i in range(n):
            sa = np.frombuffer(s_sh[i].as_py() or b"", dtype=np.uint64)
            sb = np.frombuffer(c_sh[i].as_py() or b"", dtype=np.uint64)
            if len(sa) and len(sb):
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                keep[i] = inter / (len(sa) + len(sb) - inter) >= threshold
        return pa.table(
            {"doc_id": batch.column("s").filter(pa.array(keep))}
        )

    dropped = joined.map_batches(dropped_batch, batch_format="pyarrow").repartition(
        num_partitions
    )
    return semi_or_anti_join(
        shard_ids, "doc_id", dropped, "doc_id", anti=True, **gate_kwargs
    )


def near_dup_survivors(
    docs_ds,
    threshold: float = 0.5,
    k: int = 3,
    num_partitions: int = 8,
    max_iters: int = 32,
):
    """Cluster-level near-dup dedup -> Dataset(doc_id) of SURVIVORS:
    one doc (the min doc_id) kept per connected component of the
    near-duplicate pair graph — what a training-data pipeline actually
    applies, where pair output alone would double-drop transitive
    chains (a~b, b~c keeps only a, even when a!~c directly).

    Fully distributed: MinHash+LSH pairs (``minhash_near_dupes``) give
    the edge list; components come from iterative MIN-LABEL PROPAGATION
    over Ray Data joins/groupbys — every doc starts labeled with its own
    id, each round every node takes the min of its label and its
    neighbors' labels (edges ⋈ labels -> messages, union, groupby-min),
    until a fixed point. Nothing materializes on the driver; the
    per-round convergence probe is an order-independent 64-bit digest
    of the label table. Rounds needed = component diameter (near-dup
    components are dense, so typically 1-3); ``max_iters`` bounds
    adversarial chains.
    """
    import ray.data

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    pairs = minhash_near_dupes(docs_ds, threshold, k, num_partitions).materialize()
    ids_ds = docs_ds.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    if pairs.count() == 0:
        return ids_ds

    def sym(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, bb]), pa.int64()),
                "v": pa.array(np.concatenate([bb, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    labels = ids_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("doc_id"), "label": b.column("doc_id")}
        ),
        batch_format="pyarrow",
    ).materialize()

    _C1, _C2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)

    def digest(ds) -> int:
        """Order-independent label-table digest (sum of per-row mixes,
        mod 2^64): equal digests across rounds == fixed point, without
        a full old-vs-new join per round. Per-block partial sums are
        computed WHERE THE BLOCKS LIVE and only one (lo, hi) int pair
        per block rides a distributed sum — the driver never streams
        the O(N) label table (each partial is split into 32-bit halves
        so the int64 aggregate can't overflow; the true mod-2^64 sum
        is reassembled from the half-sums)."""
        def part(b: pa.Table) -> pa.Table:
            n = b.column("node").to_numpy().astype(np.uint64)
            l = b.column("label").to_numpy().astype(np.uint64)
            mix = (n * _C1) ^ (l * _C2)
            s = int(mix.sum(dtype=np.uint64))
            return pa.table(
                {
                    "lo": pa.array([s & 0xFFFFFFFF], pa.int64()),
                    "hi": pa.array([s >> 32], pa.int64()),
                }
            )

        agg = ds.map_batches(part, batch_format="pyarrow").sum(["lo", "hi"])
        if agg is None:  # empty label table
            return 0
        return (int(agg["sum(lo)"]) + (int(agg["sum(hi)"]) << 32)) % (1 << 64)

    prev = digest(labels)
    converged = False
    for _ in range(max_iters):
        lab_u = labels.map_batches(
            lambda b: pa.table({"u": b.column("node"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        msgs = (
            edges.join(
                lab_u, join_type="inner", num_partitions=num_partitions, on=("u",)
            )
            # merge away the join's schema-less empty blocks BEFORE the
            # rename map: empty blocks bypass map UDFs and would enter
            # the union with the pre-rename (u, label) schema — a
            # partition-layout-dependent hazard that only bites under
            # load (observed as a rare wrong-survivor flake)
            .repartition(num_partitions)
            .map_batches(
                lambda b: pa.table(
                    {"node": b.column("v"), "label": b.column("label")}
                ),
                batch_format="pyarrow",
            )
        )
        # node count is corpus-proportional -> sorted_agg, not Ray's
        # per-group-Python groupby; the repartition still merges any
        # empty blocks before they land on the next round's join side
        labels = (
            sorted_agg(
                labels.union(msgs), "node", {"label": ("min", "label")},
                auto_threshold=AUTO_THRESHOLD,
            )
            .repartition(num_partitions)
            .materialize()
        )
        d = digest(labels)
        if d == prev:
            converged = True
            break
        prev = d
    if not converged:
        # exiting here would keep >1 survivor in any component whose
        # diameter exceeds max_iters — a silently-retained duplicate
        raise RuntimeError(
            f"near_dup_survivors: min-label propagation did not reach a "
            f"fixed point within max_iters={max_iters} (a near-dup "
            "component's diameter exceeds the bound); raise max_iters"
        )

    def survivors(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy()
        label = b.column("label").to_numpy()
        return pa.table({"doc_id": pa.array(node[label == node], pa.int64())})

    return labels.map_batches(survivors, batch_format="pyarrow")


# ---- simhash -----------------------------------------------------------

def _md5_lower64(tokens: list[str]) -> np.ndarray:
    """DuckDB-compatible 64-bit token hash (md5_number_lower: last 8
    md5 digest bytes, little-endian). Hashes DISTINCT tokens once and
    maps — used by the SQL-checkable simhash variant only; the
    production path keeps the vectorized polars hash."""
    import hashlib

    lut: dict[str, int] = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    for j, t in enumerate(tokens):
        h = lut.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            lut[t] = h
        out[j] = h
    return out


def simhash64(batch: pa.Table, token_hash: str = "polars") -> pa.Table:
    """64-bit SimHash over vectorized token hashes, weighted by tf —
    one bit-matrix accumulation for the WHOLE batch (np.add.at scatter
    by doc index), zero per-token Python on the default path.
    ``token_hash="md5"`` swaps in the DuckDB-reproducible
    md5_number_lower token hash so the FULL bit-voting pipeline is
    SQL-checkable (catalog entry simhash); same signature semantics,
    slower hash, intended for verification scales."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    texts = df["text"].to_list()
    n = len(texts)
    bits = np.arange(64, dtype=np.uint64)
    acc = np.zeros((n, 64), dtype=np.int64)
    ex = pl.DataFrame(
        {
            "i": pl.Series(np.arange(n, dtype=np.int64)),
            "t": pl.Series([x or "" for x in texts], dtype=pl.String),
        }
    ).with_columns(
        pl.col("t").str.to_lowercase().str.extract_all(TOKEN_RE).alias("tok")
    ).drop("t").explode("tok", empty_as_null=True).drop_nulls("tok")
    if len(ex):
        if token_hash == "md5":
            hs = _md5_lower64(ex["tok"].to_list())
        else:
            ex = ex.with_columns(pl.col("tok").hash(seed=_TOKEN_HASH_SEED).alias("h"))
            hs = ex["h"].to_numpy().astype(np.uint64)
        idx = ex["i"].to_numpy()
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        np.add.at(acc, idx, 2 * bitmat - 1)
    sig = (((acc > 0).astype(np.uint64)) << bits[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    # docs with no tokens keep the old empty-doc value 0 (acc all zero)
    return pa.table(
        {
            "doc_id": df["doc_id"].to_arrow(),
            "simhash": pa.array(sig.view(np.int64), pa.int64()),
        }
    )


def simhash_near_dupes(
    docs_ds,
    max_hamming: int = 3,
    token_hash: str = "polars",
    num_partitions: int = 8,
    **gate_kwargs,
):
    """SimHash near-dup PAIRS (Manku/Jain/Sarma, WWW'07): Dataset
    (a, b, hamming) for every pair whose 64-bit SimHash signatures
    differ in <= ``max_hamming`` bits, a < b.

    Candidate generation is the pigeonhole chunk trick: split the
    signature into ``max_hamming + 1`` bit chunks — any pair within the
    hamming budget must agree on at least one whole chunk — and
    self-join on (chunk_idx, chunk_value), exactly the LSH-banding
    exchange shape minhash_near_dupes uses.  Verification is one
    vectorized popcount over the xor of the attached signatures; the
    signature side of the attach is 16 bytes/doc, gated-broadcast
    under BROADCAST_ROW_LIMIT and a pair of hash joins above it.
    """
    from .imagedup import hamming_pairs

    sigs = docs_ds.map_batches(
        lambda b, _t=token_hash: simhash64(b, _t), batch_format="pyarrow"
    ).materialize()  # feeds both the chunk explode and the verify attach
    return hamming_pairs(
        sigs, "doc_id", "simhash", max_hamming,
        num_partitions=num_partitions, **gate_kwargs,
    )

# ---- duplicated-line removal (C4 / RefinedWeb boilerplate scrub) --------

_LINE_STRIP = " \t\r"


def _explode_lines(
    batch: pa.Table, col: str, extra_cols: tuple[str, ...] = ()
) -> pa.Table:
    """One doc batch -> (doc_id, [extras...], ln, line, key) rows,
    vectorized: polars split/explode with a per-doc line counter;
    ``key`` is the line stripped of spaces/tabs/CR (the dedup
    identity), ``line`` the original text that survives into the
    rebuilt doc; ``extra_cols`` (e.g. the domain) ride the explode
    unchanged."""
    data = {
        "doc_id": pl.from_arrow(batch.column("doc_id")),
        "t": pl.Series(
            [x or "" for x in batch.column(col).to_pylist()], dtype=pl.String
        ),
    }
    for c in extra_cols:
        data[c] = pl.from_arrow(batch.column(c))
    df = pl.DataFrame(data)
    df = (
        df.with_columns(pl.col("t").str.split("\n").alias("line"))
        .drop("t")
        .with_columns(
            pl.int_ranges(0, pl.col("line").list.len()).alias("ln")
        )
        .explode(["line", "ln"])
        .with_columns(pl.col("line").str.strip_chars(_LINE_STRIP).alias("key"))
    )
    t = df.to_arrow()
    # polars emits large_string; Acero refuses to join it against the
    # plain-string key column the groupby aggregate produces
    fields = [("doc_id", t.schema.field("doc_id").type)]
    fields += [
        (c, pa.string() if pa.types.is_large_string(t.schema.field(c).type)
         else t.schema.field(c).type)
        for c in extra_cols
    ]
    fields += [("line", pa.string()), ("ln", pa.int64()), ("key", pa.string())]
    return t.cast(pa.schema(fields))


def line_dedup(docs_ds, col: str = "text", num_partitions: int = 8):
    """C4/RefinedWeb-style duplicated-LINE removal -> Dataset(doc_id,
    text): a stripped non-empty line occurring in >= 2 DISTINCT
    documents is boilerplate (nav bars, cookie banners, footers) and
    every occurrence of it is removed from every document; remaining
    lines keep their order, and a fully-boilerplate doc survives with
    empty text (C4's three-sentence-span rule, Raffel et al. 2020
    §2.2; RefinedWeb line-wise filtering, Penedo et al. 2023 §3.2).

    Scale design (100 TB): lines explode to (key, doc_id, ln) rows; a
    key is duplicated iff its per-key Min(doc_id) != Max(doc_id) — two
    BUILT-IN vectorized aggregates, no per-group Python (a naive
    map_groups over line keys would pay a Python call per distinct
    line of the corpus). The dup keys hash-join back against the
    exploded lines to give the dup MARKS (doc_id, ln) — proportional
    to the boilerplate volume, not the corpus. Marks pack per doc
    (binary int64 — Acero rejects list payloads) and hash-JOIN against
    the docs, so the full text rides exactly one exchange and nothing
    funnels through the driver. The group key is the exact line string
    (collision-free); hashing it to 128 bits would shrink the
    exchanges further at scale.
    """
    import ray.data

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    lines = docs_ds.map_batches(
        lambda b: _explode_lines(b, col), batch_format="pyarrow"
    ).materialize()

    def nonblank(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.select(["key", "doc_id"]).filter(
            pc.not_equal(b.column("key"), "")
        )

    # distinct-line count is corpus-proportional -> sorted_agg
    spans = sorted_agg(
        lines.map_batches(nonblank, batch_format="pyarrow"),
        "key",
        {"dmin": ("min", "doc_id"), "dmax": ("max", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )

    def dup_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.not_equal(b.column("dmin"), b.column("dmax"))
        ).select(["key"])

    dup_keys = spans.map_batches(dup_only, batch_format="pyarrow").materialize()
    clean_cols = ["doc_id", col]
    if dup_keys.count() == 0:
        # nothing duplicated: identity projection (an empty join side
        # has no schema and breaks Acero key resolution)
        return docs_ds.map_batches(
            lambda b: b.select(clean_cols), batch_format="pyarrow"
        )
    marks = dup_keys.join(
        lines.map_batches(
            lambda b: b.select(["key", "doc_id", "ln"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("key",),
    ).map_batches(
        lambda b: b.select(["doc_id", "ln"]), batch_format="pyarrow"
        # merge away the join's schema-less empty hash-partition blocks
        # before they hit the groupby/sort below
    ).repartition(num_partitions).materialize()

    return _strip_marked_lines(docs_ds, marks, col, num_partitions)


def _strip_marked_lines(docs_ds, marks, col: str, num_partitions: int):
    """Shared rebuild tail of line_dedup / boilerplate_strip: given the
    drop MARKS Dataset(doc_id, ln), pack each doc's marks into one
    binary int64 row, left-join against the docs, and rebuild every
    text with the marked lines removed (order preserved; a fully
    marked doc survives with empty text)."""

    def pack_lns(group: pa.Table) -> pa.Table:
        lns = np.sort(group.column("ln").to_numpy().astype(np.int64))
        return pa.table(
            {
                "doc_id": group.column("doc_id").slice(0, 1),
                "drop_lns": pa.array([lns.tobytes()], pa.binary()),
            }
        )

    packed = (
        marks.groupby("doc_id")
        .map_groups(pack_lns, batch_format="pyarrow")
        # the groupby emits schema-less empty blocks; merged away they
        # can't break the join's key-field resolution
        .repartition(num_partitions)
    )

    joined = docs_ds.map_batches(
        lambda b: b.select(["doc_id", col]), batch_format="pyarrow"
    ).join(
        packed,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        drops = batch.column("drop_lns").to_pylist()
        out = []
        for t, d in zip(texts, drops):
            if d is None or len(d) == 0:
                # null text -> "" like the SQL twin's coalesce(agg.text, '')
                out.append(t if t is not None else "")
                continue
            drop = set(np.frombuffer(d, dtype=np.int64).tolist())
            ls = (t or "").split("\n")
            out.append("\n".join(l for i, l in enumerate(ls) if i not in drop))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                col: pa.array(out, pa.string()),
            }
        )

    # repartition: the join emits schema-less empty blocks for empty
    # hash partitions which would bypass downstream map UDFs
    return joined.map_batches(rebuild, batch_format="pyarrow").repartition(
        num_partitions
    )


def boilerplate_strip(
    docs_ds,
    *,
    domain_col: str = "domain",
    col: str = "text",
    num_frac: int = 1,
    den_frac: int = 2,
    num_partitions: int = 8,
):
    """DOMAIN-conditional boilerplate line removal -> Dataset(doc_id,
    text): a stripped non-empty line occurring in
    ``>= ceil(num_frac/den_frac * docs_in_domain)`` DISTINCT documents
    of the SAME domain is boilerplate FOR THAT DOMAIN (nav bars,
    cookie banners, copyright footers) and removed from that domain's
    docs only — the Onion / CleanEval rule (Pomikalek 2011) RefinedWeb
    applies per-site (Penedo 2023 §3.2), where the global >= 2-docs
    rule of :func:`line_dedup` would be far too aggressive (any quoted
    sentence shared by two pages anywhere dies) and a per-site
    frequency threshold is the published cut.

    Scale shape: lines explode once (map-only); the distinct
    (domain, key, doc_id) pass and the (domain, key) count both ride
    ``sorted_agg`` (corpus-proportional keys, no map_groups Python);
    domain sizes are a BOUNDED-domain groupby collected once and
    broadcast via ``ray.put``; boilerplate keys join back against the
    exploded lines (rows proportional to boilerplate volume); the
    rebuild is the shared one-exchange pack+join tail.  Threshold
    compare is pure integers: ``cnt * den >= num * n_domain`` ==
    ``cnt >= ceil(num/den * n_domain)``.
    """
    import ray

    from .shuffle import AUTO_THRESHOLD, sorted_agg, sorted_distinct

    lines = docs_ds.map_batches(
        lambda b: _explode_lines(b, col, extra_cols=(domain_col,)),
        batch_format="pyarrow",
    ).materialize()

    def nonblank(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.select([domain_col, "key", "doc_id"]).filter(
            pc.not_equal(b.column("key"), "")
        )

    trip = sorted_distinct(
        lines.map_batches(nonblank, batch_format="pyarrow"),
        [domain_col, "key", "doc_id"],
        auto_threshold=AUTO_THRESHOLD,
    )
    counts = sorted_agg(
        trip,
        [domain_col, "key"],
        {"cnt": ("count", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )

    # domain sizes: bounded-domain groupby -> tiny driver dict -> plasma
    sizes = {
        r[domain_col]: int(r["count()"])
        for r in docs_ds.groupby(domain_col).count().take_all()
    }
    sizes_ref = ray.put(sizes)

    def bp_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select([domain_col, "key"])
        sz = ray.get(sizes_ref)
        n = np.array(
            [sz.get(d, 0) for d in b.column(domain_col).to_pylist()], np.int64
        )
        cnt = b.column("cnt").to_numpy()
        return b.filter(pa.array(cnt * den_frac >= num_frac * n)).select(
            [domain_col, "key"]
        )

    # repartition: the threshold filter can empty whole blocks, and
    # map_batches strips an empty table's schema (measured, Ray 2.49 —
    # see the line_dedup/verify notes); merged away they can't break
    # the Acero key resolution of the marks join below
    bp_keys = (
        counts.map_batches(bp_only, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    if bp_keys.count() == 0:
        return docs_ds.map_batches(
            lambda b: b.select(["doc_id", col]), batch_format="pyarrow"
        )
    marks = (
        bp_keys.join(
            lines.map_batches(
                lambda b: b.select([domain_col, "key", "doc_id", "ln"]),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=(domain_col, "key"),
        )
        .map_batches(
            lambda b: b.select(["doc_id", "ln"]), batch_format="pyarrow"
        )
        .repartition(num_partitions)
        .materialize()
    )
    return _strip_marked_lines(docs_ds, marks, col, num_partitions)


# positional odd multipliers for combining token hashes into window keys
_DW_C = (_rng.randint(1, 1 << 62, size=32).astype(np.uint64) * 2 + 1)
_DW_TOKEN_SEED = 4099


_MASK63 = np.uint64((1 << 63) - 1)


def _roll_windows(ex, n: int):
    """THE shared n-token rolling-window key kernel — dup_ngram_stats
    (the signal) and remove_dup_spans (the action) must agree on what
    a 'window' is, so both call this. Input: the exploded polars frame
    (doc_id, tk) with one null-token row per token-less doc. Returns
    (doc_ids, wkey, pos) for every VALID window (stays inside one doc,
    no null token), pos = 0-based token index of the window's first
    token within its doc."""
    ids = ex["doc_id"].to_numpy()
    h = ex.with_columns(h=pl.col("tk").hash(seed=_DW_TOKEN_SEED))["h"].to_numpy()
    is_null = ex["tk"].is_null().to_numpy()
    m = len(h) - n + 1
    if m <= 0:
        z = np.empty(0, np.int64)
        return z, z, z
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        acc ^= h[j : j + m].astype(np.uint64) * _DW_C[j % len(_DW_C)]
    ok = ids[:m] == ids[n - 1 :]  # window stays inside one doc
    cs = np.concatenate(([0], np.cumsum(is_null.astype(np.int64))))
    ok &= (cs[n:] - cs[:-n]) == 0  # and contains no null-token row
    # 0-based in-doc position: running index minus the doc's first row
    first = np.zeros(len(ids), dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
    first[starts] = starts
    first = np.maximum.accumulate(first)
    pos = (np.arange(m, dtype=np.int64) - first[:m])[ok]
    wkey = (acc & _MASK63).view(np.int64)[ok]
    return ids[:m][ok].astype(np.int64), wkey, pos


def dup_ngram_stats(docs_ds, n: int = 8, num_partitions: int = 8):
    """Per-document duplicated-n-gram fraction (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr signal at n-gram granularity): the fraction of a doc's
    token n-gram windows whose window also occurs a second time
    ANYWHERE in the corpus (another doc or the same doc).  Returns
    Dataset(doc_id, n_win, dup_win, dup_frac).

    Scale design — JOIN-FREE and string-free: tokens get ONE vectorized
    polars hash per batch and windows combine n token hashes with a
    positional multiply-xor (the shingle kernel's trick), so no window
    string is ever materialized and the wide exchange carries
    (wkey, doc_id, cnt) = 24 bytes/row, map-side combined per
    (window, doc).  The trick that removes the dup-keys hash-join: a
    key whose corpus total is 1 has exactly ONE owning row, so
    aggregating Sum(cnt) + Min(doc_id) per wkey both counts the key
    and names its owner — per-doc UNIQUE-window counts come straight
    off the filtered aggregate, and dup_win = n_win - uniq_win.  The
    per-doc n_win rides along as a sentinel row (wkey = -doc_id-1,
    cnt = n_win) from the same explode pass.  Both aggregates run
    through stages.shuffle.sorted_agg (sort + per-block vectorized
    polars group_by + boundary merge) because their group counts are
    corpus-proportional — Ray's groupby().aggregate() pays Python
    per group and is ~50x slower at this cardinality.  Window-key
    collisions merge distinct windows (~p^2/2^63 for p windows):
    statistically irrelevant for the filter signal and absent at test
    scale; swap in the exact window string (line_dedup does) if
    byte-exactness at corpus scale ever matters.
    """
    import pyarrow.compute as pc

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    def explode_windows(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        ex = (
            df.with_columns(
                tk=pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]{2,}")
            )
            .select("doc_id", "tk")
            .explode("tk")  # a token-less doc keeps one null row
        )
        dids, wkey, _pos = _roll_windows(ex, n)
        if len(dids) == 0:
            win = pl.DataFrame(
                {
                    "doc_id": pl.Series([], dtype=pl.Int64),
                    "wkey": pl.Series([], dtype=pl.Int64),
                    "cnt": pl.Series([], dtype=pl.Int64),
                }
            )
        else:
            win = (
                pl.DataFrame({"doc_id": dids, "wkey": wkey})
                .group_by("doc_id", "wkey")
                .agg(cnt=pl.len().cast(pl.Int64))
                .with_columns(pl.col("doc_id").cast(pl.Int64))
            )
        # sentinel row per doc carries n_win (total window count)
        n_win = win.group_by("doc_id").agg(cnt=pl.col("cnt").sum().cast(pl.Int64))
        sentinels = (
            df.select("doc_id")
            .join(n_win, on="doc_id", how="left")
            .with_columns(
                wkey=(-pl.col("doc_id") - 1).cast(pl.Int64),
                cnt=pl.col("cnt").fill_null(0),
            )
        )
        return pl.concat(
            [win.select("doc_id", "wkey", "cnt"),
             sentinels.select("doc_id", "wkey", "cnt")]
        ).to_arrow()

    exploded = docs_ds.map_batches(
        explode_windows, batch_format="pyarrow"
    ).materialize()

    def n_side(b: pa.Table) -> pa.Table:
        s = b.filter(pc.less(b.column("wkey"), 0))
        return pa.table(
            {
                "doc_id": s.column("doc_id"),
                "n_win": s.column("cnt"),
                "uniq_win": pa.array(np.zeros(s.num_rows, np.int64), pa.int64()),
            }
        )

    real = exploded.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("wkey"), 0)),
        batch_format="pyarrow",
    )
    agg = sorted_agg(
        real, "wkey", {"total": ("sum", "cnt"), "owner": ("min", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )

    def uniq_side(b: pa.Table) -> pa.Table:
        s = b.filter(pc.equal(b.column("total"), 1))
        return pa.table(
            {
                "doc_id": s.column("owner"),
                "n_win": pa.array(np.zeros(s.num_rows, np.int64), pa.int64()),
                "uniq_win": pa.array(np.ones(s.num_rows, np.int64), pa.int64()),
            }
        )

    both = exploded.map_batches(n_side, batch_format="pyarrow").union(
        agg.map_batches(uniq_side, batch_format="pyarrow")
    )
    per_doc = sorted_agg(
        both, "doc_id", {"n_win": ("sum", "n_win"), "uniq_win": ("sum", "uniq_win")},
        auto_threshold=AUTO_THRESHOLD,
    )

    def finish(b: pa.Table) -> pa.Table:
        n_win = b.column("n_win").to_numpy().astype(np.int64)
        uniq = b.column("uniq_win").to_numpy().astype(np.int64)
        dup = n_win - uniq
        frac = np.where(n_win > 0, dup / np.maximum(n_win, 1), 0.0)
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_win": pa.array(n_win, pa.int64()),
                "dup_win": pa.array(dup, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def remove_dup_spans(docs_ds, n: int = 8, num_partitions: int = 8,
                     n_buckets: int = 32):
    """Cross-document duplicated-span REMOVAL (the action to
    dup_ngram_stats' signal; Lee et al. 2021 ExactSubstr at token
    granularity): every token covered by an n-token window that occurs
    anywhere else in the corpus is dropped — except in the window's
    OWNER doc (min doc_id), which keeps its occurrences, so exactly
    one copy of every duplicated span survives corpus-wide.  Returns
    Dataset(doc_id, clean_text, removed_tokens) where clean_text is
    the KEPT token stream joined by single spaces (token-level output,
    not byte spans — the byte-exact variant is the suffix-array
    approach; within-owner repeats are retained by the rule above).

    Scale shape: windows ride the exchange as (wkey 63-bit hash,
    doc_id, pos) = 24 B/row; one sorted_agg names each key's total and
    owner; dup keys (total >= 2) hash-join back to the position stream
    (this join is the price of needing POSITIONS — the fraction signal
    avoids it); the doc text then rides ONE bucketed exchange next to
    its removal positions (the line_dedup contract) into a vectorized
    per-bucket rebuild (explode tokens -> anti-join covered (doc, j)
    -> ordered string join).  Hash collisions merge distinct windows
    (~p^2/2^63): absent at test scale, documented in dup_ngram_stats.
    """
    import pyarrow.compute as pc

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    def explode_positions(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        ex = (
            df.with_columns(
                tk=pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]{2,}")
            )
            .select("doc_id", "tk")
            .explode("tk")
        )
        dids, wkey, pos = _roll_windows(ex, n)
        return pa.table(
            {
                "wkey": pa.array(wkey, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    windows = docs_ds.map_batches(
        explode_positions, batch_format="pyarrow"
    ).materialize()

    agg = sorted_agg(
        windows, "wkey",
        {"total": ("count", "wkey"), "owner": ("min", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )
    # materialize the SMALL intermediates so the shuffle groupby, the
    # Acero join and the bucketed rebuild run as sequential jobs — all
    # three chained lazily in one streaming job makes their actor
    # pools contend for the same slots (the two-actor-pool gotcha in
    # index/build.py) and multiplies wall time ~3x at low CPU counts
    dup = (
        agg.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("total"), 2)).select(
                ["wkey", "owner"]
            ),
            batch_format="pyarrow",
        )
        # merge schema-less empty blocks BEFORE the join — Acero errors
        # with "no match for FieldRef.Name(wkey)" on an empty block
        .repartition(num_partitions)
        .materialize()
    )
    if dup.count() == 0:
        # corpus with NO cross-doc duplicated windows (legitimate —
        # e.g. after an upstream near-dup drop): every dup block is a
        # schema-less empty, which Acero rejects as a join side, and
        # there is nothing to join anyway — removal set is empty
        import ray.data as _rd

        rem = _rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64())})
        )
    else:
        rem = (
            windows.join(dup, join_type="inner", num_partitions=num_partitions,
                         on=("wkey",))
            .repartition(num_partitions)  # merge schema-less empty partitions
            .map_batches(
                lambda b: (
                    b.filter(pc.not_equal(b.column("doc_id"), b.column("owner")))
                    .select(["doc_id", "pos"])
                    if b.num_rows
                    else pa.table({"doc_id": pa.array([], pa.int64()),
                                   "pos": pa.array([], pa.int64())})
                ),
                batch_format="pyarrow",
            )
        ).materialize()

    def _buckets(b: pa.Table) -> pa.Array:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array((np.abs(ids) % n_buckets).astype(np.int32), pa.int32())

    def tag_docs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "text": b.column("text").cast(pa.string()),
                "pos": pa.nulls(b.num_rows, pa.int64()),
                "_bucket": _buckets(b),
            }
        )

    def tag_rem(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "text": pa.nulls(b.num_rows, pa.string()),
                "pos": b.column("pos").cast(pa.int64()),
                "_bucket": _buckets(b),
            }
        )

    tagged = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        rem.map_batches(tag_rem, batch_format="pyarrow")
    )

    def rebuild(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        docs = df.filter(pl.col("text").is_not_null()).select("doc_id", "text")
        remf = df.filter(pl.col("text").is_null()).select("doc_id", "pos")
        toks = (
            docs.with_columns(
                tk=pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]{2,}")
            )
            .select("doc_id", "tk")
            .explode("tk")
            .drop_nulls("tk")
            .with_columns(j=pl.int_range(pl.len()).over("doc_id"))
        )
        covered = (
            remf.join(pl.DataFrame({"o": list(range(n))}), how="cross")
            .with_columns(j=pl.col("pos") + pl.col("o"))
            .select("doc_id", "j")
            .unique()
            .with_columns(cov=pl.lit(1))
        )
        marked = toks.join(covered, on=["doc_id", "j"], how="left")
        kept = (
            marked.filter(pl.col("cov").is_null())
            .sort(["doc_id", "j"])
            .group_by("doc_id", maintain_order=True)
            .agg(clean_text=pl.col("tk").str.join(" "))
        )
        removed = (
            marked.group_by("doc_id")
            .agg(removed_tokens=pl.col("cov").sum().fill_null(0).cast(pl.Int64))
        )
        out = (
            docs.select("doc_id")
            .join(kept, on="doc_id", how="left")
            .join(removed, on="doc_id", how="left")
            .with_columns(
                clean_text=pl.col("clean_text").fill_null(""),
                removed_tokens=pl.col("removed_tokens").fill_null(0),
            )
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string()),
                       ("removed_tokens", pa.int64())])
        )

    return tagged.groupby("_bucket").map_groups(rebuild, batch_format="pyarrow")


def winnow_overlap_pairs(
    docs_ds,
    min_shared: int = 2,
    max_fp_df: int = 10,
    num_partitions: int = 8,
):
    """Containment-style near-dup pairs from winnowing fingerprints
    (Schleimer et al. 2003 — the fourth near-dup family next to
    exact-hash, MinHash+LSH and SimHash): pairs of docs sharing >=
    ``min_shared`` distinct selected fingerprints, after dropping
    boilerplate fingerprints present in more than ``max_fp_df`` docs
    (the stop-fingerprint cap).  Catches PARTIAL overlap — a shared
    run of >= w+k-1 tokens guarantees a shared fingerprint — where
    whole-document Jaccard is too coarse.  Returns (a, b, shared).

    Scale shape (100 TB): winnowing is map-only; only the narrow
    (doc_id, fp) stream rides the exchanges (distinct + df via
    sorted_agg); the df cap bounds every fp bucket to <= max_fp_df
    docs so the fp self-join emits O(shared_fps * max_fp_df^2) pair
    rows — never quadratic in the corpus; the final (a, b) count is
    one more sorted_agg.  Nothing corpus-proportional on the driver.
    """
    import pyarrow.compute as _pc

    from ..functions.joins import semi_or_anti_join
    from .shuffle import AUTO_THRESHOLD, sorted_agg, sorted_distinct
    from .textstats import winnow_fingerprints

    fps = docs_ds.map_batches(winnow_fingerprints, batch_format="pyarrow")
    # distinct (doc_id, fp): repeated selection positions of one fp in
    # one doc count once — feeds the df pass AND both self-join sides
    dfp = sorted_distinct(
        fps.map_batches(
            lambda b: b.select(["doc_id", "fp"]), batch_format="pyarrow"
        ),
        ["doc_id", "fp"],
        auto_threshold=AUTO_THRESHOLD,
    ).materialize()
    fdf = sorted_agg(
        dfp, "fp", {"d": ("count", "doc_id")}, auto_threshold=AUTO_THRESHOLD
    )
    eligible = fdf.map_batches(
        lambda b: b.filter(
            _pc.and_(
                _pc.greater_equal(b.column("d"), 2),
                _pc.less_equal(b.column("d"), max_fp_df),
            )
        ).select(["fp"]),
        batch_format="pyarrow",
    )
    use = semi_or_anti_join(dfp, "fp", eligible, "fp").materialize()
    # a corpus with NO shared (non-boilerplate) fingerprints leaves
    # `use` empty — its schema-less blocks would crash the Acero
    # self-join below ("no match for key field"), so short-circuit
    # with a typed empty result (same probe minhash_near_dupes uses)
    if use.count() == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "shared": pa.array([], pa.int64()),
                }
            )
        )

    def _side(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"fp": b.column("fp"), name: b.column("doc_id")})

        return fn

    pairs = (
        use.map_batches(_side("a"), batch_format="pyarrow")
        .join(
            use.map_batches(_side("b"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("fp",),
        )
        # merge the join's empty partitions before any map (the block
        # builder strips empty map outputs' schemas — see verify tail)
        .repartition(num_partitions)
        .map_batches(
            lambda b: b.filter(_pc.less(b.column("a"), b.column("b"))).select(
                ["a", "b"]
            ),
            batch_format="pyarrow",
        )
    )
    counted = sorted_agg(
        pairs, ["a", "b"], {"shared": ("count", "a")},
        auto_threshold=AUTO_THRESHOLD,
    )
    out = counted.map_batches(
        lambda b: b.filter(_pc.greater_equal(b.column("shared"), min_shared)),
        batch_format="pyarrow",
    )
    return out.repartition(num_partitions)


def connected_components(
    pairs_ds,
    nodes_ds=None,
    *,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "doc_id",
    broadcast_limit: int | None = None,
    num_partitions: int = 8,
    max_rounds: int = 64,
):
    """Connected components of a (verified) near-dup pair graph ->
    Dataset(doc_id, component, kept): ``component`` is the MIN doc_id
    of the node's component (the canonical cluster id and its
    representative), ``kept`` is 1 iff the doc IS that representative —
    the cluster step between pairwise near-dup detection and corpus
    dedup (every published dedup recipe keeps one doc per component,
    not one per pair: pair-at-a-time dropping over-deletes chains
    a~b~c where a!~c).

    ``nodes_ds`` (optional, a ``node_col`` column) supplies the node
    universe: nodes in no pair become singleton components of
    themselves.

    Gate (the linkgraph tier pattern): a pair list under
    ``broadcast_limit`` rows solves on the driver with min-label
    union-find over collected arrays — the sanctioned gated-size shape
    (the PAIR graph is dup-volume-proportional, a small fraction of
    the corpus, NOT corpus-sized).  Above the limit the solve runs
    Dataset-resident hash-min label propagation:

        sym_edges ⋈ labels (hash join on v)      — neighbor labels
        sorted_agg by w (min)                    — best inbound label
        labels gated-left-join best              — next label vector
        changed = one filtered count             — fixpoint test

    converging in <= component diameter rounds; near-dup components
    are shallow in practice (clusters are small and dense), and an
    adversarially long chain is bounded by ``max_rounds`` (switch to
    path doubling — log-diameter rounds — if a corpus ever trips it).
    Both tiers produce identical labels (conformance-tested in
    tests/test_components.py)."""
    import ray
    import ray.data

    import pyarrow.compute as _pc

    from ..functions.joins import BROADCAST_ROW_LIMIT, gated_left_join
    from .shuffle import AUTO_THRESHOLD, sorted_agg

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    pairs = pairs_ds.materialize()
    n_pairs = pairs.count()

    def _label_table(ids: np.ndarray, comps: np.ndarray) -> pa.Table:
        return pa.table(
            {
                node_col: pa.array(ids, pa.int64()),
                "component": pa.array(comps, pa.int64()),
            }
        )

    if n_pairs == 0:
        labels_tbl = _label_table(
            np.array([], np.int64), np.array([], np.int64)
        )
        labels = ray.data.from_arrow(labels_tbl)
    elif n_pairs <= limit:
        # driver tier: min-label union-find (path-compressed; roots
        # keep the component's minimum id by construction of union)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        seen: set[int] = set()
        for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow"):
            for a, c in zip(
                b.column(a_col).to_pylist(), b.column(b_col).to_pylist()
            ):
                seen.add(int(a))
                seen.add(int(c))
                ra, rc = find(int(a)), find(int(c))
                if ra != rc:
                    lo, hi = (ra, rc) if ra < rc else (rc, ra)
                    parent[hi] = lo
        ids = np.array(sorted(seen), dtype=np.int64)
        comps = np.array([find(int(v)) for v in ids], dtype=np.int64)
        labels = ray.data.from_arrow(_label_table(ids, comps))
    else:
        # distributed tier: hash-min label propagation
        sym = pairs.map_batches(
            lambda b: pa.table(
                {
                    "v": pa.concat_arrays(
                        [
                            b.column(a_col).cast(pa.int64()).combine_chunks(),
                            b.column(b_col).cast(pa.int64()).combine_chunks(),
                        ]
                    ),
                    "w": pa.concat_arrays(
                        [
                            b.column(b_col).cast(pa.int64()).combine_chunks(),
                            b.column(a_col).cast(pa.int64()).combine_chunks(),
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        labels = sorted_agg(
            sym.map_batches(
                lambda b: pa.table({node_col: b.column("v")}),
                batch_format="pyarrow",
            ),
            node_col,
            {"component": ("min", node_col)},
            auto_threshold=AUTO_THRESHOLD,
        ).map_batches(  # initial label = own id
            lambda b: pa.table(
                {
                    node_col: b.column(node_col),
                    "component": b.column(node_col),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        for _ in range(max_rounds):
            nbr = (
                sym.join(
                    labels.map_batches(
                        lambda b: b.rename_columns(["v", "component"]),
                        batch_format="pyarrow",
                    ),
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("v",),
                )
                .repartition(num_partitions)
                .map_batches(
                    lambda b: pa.table(
                        {
                            node_col: b.column("w"),
                            "nlbl": b.column("component"),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            best = sorted_agg(
                nbr, node_col, {"nlbl": ("min", "nlbl")},
                auto_threshold=AUTO_THRESHOLD,
            )
            merged = gated_left_join(
                labels, node_col, best, node_col, ["nlbl"],
                num_partitions=num_partitions,
            ).map_batches(
                lambda b: pa.table(
                    {
                        node_col: b.column(node_col),
                        "component": _pc.min_element_wise(
                            b.column("component"),
                            _pc.fill_null(
                                _pc.cast(b.column("nlbl"), pa.int64()),
                                np.iinfo(np.int64).max,
                            ),
                        ),
                        "_old": b.column("component"),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
            changed = merged.map_batches(
                lambda b: b.filter(
                    _pc.not_equal(b.column("component"), b.column("_old"))
                ).select([node_col]),
                batch_format="pyarrow",
            ).count()
            labels = merged.map_batches(
                lambda b: b.select([node_col, "component"]),
                batch_format="pyarrow",
            ).materialize()
            if changed == 0:
                break

    if nodes_ds is None:
        out = labels
    elif n_pairs == 0:
        # empty pair graph: every node is its own singleton component
        # (an empty labels table would reach the join as a schema-less
        # block — the Acero/polars empty-right hazard)
        out = nodes_ds.map_batches(
            lambda b: pa.table(
                {
                    node_col: b.column(node_col).cast(pa.int64()),
                    "component": b.column(node_col).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    else:
        out = gated_left_join(
            nodes_ds.map_batches(
                lambda b: pa.table({node_col: b.column(node_col).cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            node_col,
            labels,
            node_col,
            ["component"],
            num_partitions=num_partitions,
        ).map_batches(  # singleton components label themselves
            lambda b: pa.table(
                {
                    node_col: b.column(node_col),
                    "component": _pc.coalesce(
                        _pc.cast(b.column("component"), pa.int64()),
                        b.column(node_col),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    return out.map_batches(
        lambda b: pa.table(
            {
                node_col: b.column(node_col),
                "component": b.column("component"),
                "kept": _pc.cast(
                    _pc.equal(b.column(node_col), b.column("component")),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def snapshot_delta(old_ds, new_ds, *, key: str = "doc_id", num_partitions: int = 8):
    """Re-crawl delta classification: two crawl snapshots (each a
    Dataset with ``key`` + ``text_md5``, the exact_dedup hash) ->
    (key, old_md5, new_md5, status) with status in
    added / removed / changed / unchanged — the incremental-ingest
    planning table (what to re-extract, re-index, tombstone) that
    drives ``add_pages`` / ``delete_document`` decisions after a fresh
    crawl.

    Scale shape: both inputs are already narrow (key + 32-char hash);
    the one exchange is a key-partitioned ``full_outer`` join, then a
    vectorized classify map.  The repartition merges the schema-less
    empty blocks Ray's joiner emits for empty partitions (the
    documented Ray 2.49 hazard — see the verify tail note below)."""
    o = old_ds.map_batches(
        lambda b: b.select([key, "text_md5"]).rename_columns([key, "old_md5"]),
        batch_format="pyarrow",
    )
    n = new_ds.map_batches(
        lambda b: b.select([key, "text_md5"]).rename_columns([key, "new_md5"]),
        batch_format="pyarrow",
    )
    joined = o.join(
        n, join_type="full_outer", num_partitions=num_partitions, on=(key,)
    ).repartition(num_partitions)

    def classify(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        df = df.with_columns(
            pl.when(pl.col("old_md5").is_null())
            .then(pl.lit("added"))
            .when(pl.col("new_md5").is_null())
            .then(pl.lit("removed"))
            .when(pl.col("old_md5") == pl.col("new_md5"))
            .then(pl.lit("unchanged"))
            .otherwise(pl.lit("changed"))
            .alias("status")
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    (key, pa.int64()),
                    ("old_md5", pa.string()),
                    ("new_md5", pa.string()),
                    ("status", pa.string()),
                ]
            )
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def cluster_keep_best(comps_ds, lens_ds, *, num_partitions: int = 8):
    """Quality-aware near-dup survivor selection: given the per-doc
    component labels (``connected_components`` output) and a per-doc
    ``len`` quality score, keep ONE doc per component — the LONGEST,
    doc_id tiebreak — instead of the min-id canonical doc.  This is
    the representative rule published pipelines actually apply
    (SlimPajama/RefinedWeb keep the longest duplicate, the highest-
    information copy), where min-id keeps an arbitrary one.

    Returns Dataset(doc_id, component, len, kept) — kept=1 on the
    representative.  Shape: two hash joins on corpus-proportional keys
    plus two ``sorted_agg`` reductions (component -> max len; ties ->
    min doc_id); no driver-side state, no map_groups Python.
    """
    import pyarrow.compute as pc

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    m = (
        comps_ds.map_batches(
            lambda b: b.select(["doc_id", "component"]),
            batch_format="pyarrow",
        )
        .join(lens_ds, join_type="inner", num_partitions=num_partitions,
              on=("doc_id",))
        .repartition(num_partitions)  # schema-stripped empty blocks
        .materialize()
    )
    cmax = sorted_agg(
        m.map_batches(
            lambda b: b.select(["component", "len"]), batch_format="pyarrow"
        ),
        "component",
        {"maxlen": ("max", "len")},
        auto_threshold=AUTO_THRESHOLD,
    )
    cands = (
        m.join(cmax, join_type="inner", num_partitions=num_partitions,
               on=("component",))
        .map_batches(
            lambda b: b.filter(
                pc.equal(b.column("len"), b.column("maxlen"))
            ).select(["component", "doc_id"]),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
    )
    reps = sorted_agg(
        cands, "component", {"rep": ("min", "doc_id")},
        auto_threshold=AUTO_THRESHOLD,
    )

    def mark(b: pa.Table) -> pa.Table:
        kept = pc.cast(
            pc.equal(b.column("doc_id"), b.column("rep")), pa.int64()
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "component": b.column("component"),
                "len": b.column("len"),
                "kept": kept,
            }
        )

    return (
        m.join(reps, join_type="inner", num_partitions=num_partitions,
               on=("component",))
        .repartition(num_partitions)
        .map_batches(mark, batch_format="pyarrow")
    )
