"""Segment encode / merge kernels and the segment reader.

Physical layout of the inverted index:

    index_dir/segments/shard=K/bucket=J.parquet    one row per term:
        term, df:int64,
        docs_enc    binary   delta+varbyte docID gaps (docID-sorted)
        tft_enc     binary   varbyte per-doc tf(title)
        tfc_enc     binary   varbyte per-doc tf(content)
        tfd_enc     binary   varbyte per-doc tf(description)
        blk_last    list<int64>  last docID per 128-doc block
        blk_max_tft list<int32>  block max tf(title)      } block-max
        blk_max_tfc list<int32>  block max tf(content)    } metadata for
        blk_max_tfd list<int32>  block max tf(description)} WAND pruning

Build = map-side combine + ONE shuffle of compressed runs:

1. ``EncodePostings`` (map_batches): each docs batch is exploded to
   (term, doc_id, tf_title, tf_content, tf_desc) with polars, lexsorted
   by (term, bucket, doc_id) in one numpy pass, and emitted as ONE row
   per (term, bucket) holding delta+varbyte-encoded sorted runs. This
   is the combiner: the shuffle moves ~vocabulary-sized compressed rows
   per batch instead of one row per posting (~20-100x less data).
2. ``groupby(shard, bucket)`` -> ``merge_bucket_runs``: each group
   k-way-merges its terms' per-batch sorted runs (vectorized lexsort
   over run-tagged values), computes df and block-max metadata, and
   re-encodes the final docID-sorted posting lists.

Skew handling (the "salted groupby + secondary merge" of the
north_rule): the shuffle key is (shard=hash(term), bucket=top bits of
doc_id). A Zipf-head term's postings are split over 2^bucket_bits
groups, each bounded by df/2^bits; because buckets are docID RANGES,
the merged per-bucket runs concatenate in global docID order at read
time — the cross-bucket merge is free. Raise bucket_bits (and
num_shards) with corpus size so every merge group fits a worker.

The per-field term definition is the reference tokenizer
(scoring_utils::extractTerms, src/scoring/SearchScorer.cpp:692-712);
df per term equals total posting count because a row exists iff the
term occurs in the title/content/description union — matching
updateCorpusStatistics (SearchScorer.cpp:225-255).

All kernels are whole-group vectorized: no Python loop over terms or
postings (only O(#byte-width) loops inside the codec).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .codec import (
    decode_postings,
    delta_encode_sorted,
    encode_group_sliced,
    encode_runs,
    varbyte_decode,
)

BLOCK_SIZE = 128

# doc ids are uniform 63-bit hashes; the range bucket is the top bits
DEFAULT_BUCKET_BITS = 2


def range_bucket(doc_ids: np.ndarray, bits: int) -> np.ndarray:
    return (doc_ids.astype(np.uint64) >> np.uint64(63 - bits)).astype(np.int64)


RUNS_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("term", pa.string()),
        ("n", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tft_enc", pa.binary()),
        ("tfc_enc", pa.binary()),
        ("tfd_enc", pa.binary()),
    ]
)

TERMS_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("bucket", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tft_enc", pa.binary()),
        ("tfc_enc", pa.binary()),
        ("tfd_enc", pa.binary()),
        ("blk_last", pa.list_(pa.int64())),
        ("blk_max_tft", pa.list_(pa.int32())),
        ("blk_max_tfc", pa.list_(pa.int32())),
        ("blk_max_tfd", pa.list_(pa.int32())),
    ]
)


def shard_of_term(term: str, num_shards: int) -> int:
    """Stable term -> shard assignment (crc32; process-independent)."""
    return zlib.crc32(term.encode("utf-8")) % num_shards


def _boundaries(keys_sorted: np.ndarray) -> np.ndarray:
    """Start index of each distinct run in a sorted key array."""
    if len(keys_sorted) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.concatenate(([True], keys_sorted[1:] != keys_sorted[:-1]))
    return np.flatnonzero(change)


def _term_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode a term column and rank codes in STRING-sorted
    order so integer sorts are deterministic (same output layout for any
    input row order) and cheap: only the vocabulary is compared as
    strings. Returns (ranked codes int64, vocab sorted asc, object)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    order = np.argsort(vocab)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return rank[codes], vocab[order]


class EncodePostings:
    """map_batches combiner: docs batch -> encoded per-(term, bucket)
    sorted runs (RUNS_SCHEMA). Holds the term->shard cache per actor/task."""

    def __init__(
        self,
        num_shards: int = 32,
        bucket_bits: int = DEFAULT_BUCKET_BITS,
        analyzer: str = "default",
    ):
        self.num_shards = num_shards
        self.bucket_bits = bucket_bits
        self.analyzer = analyzer
        self.n_buckets = 1 << bucket_bits
        self._shard_cache: dict[str, int] = {}

    def _shards_for(self, vocab: np.ndarray) -> np.ndarray:
        cache = self._shard_cache
        out = np.empty(len(vocab), dtype=np.int32)
        for i, t in enumerate(vocab):
            s = cache.get(t)
            if s is None:
                s = shard_of_term(t, self.num_shards)
                cache[t] = s
            out[i] = s
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.postings import explode_postings

        p = explode_postings(batch, analyzer=self.analyzer)
        if p.num_rows == 0:
            return RUNS_SCHEMA.empty_table()
        codes, vocab = _term_codes(p.column("term"))
        doc_ids = p.column("doc_id").to_numpy()
        tft = p.column("tf_title").to_numpy()
        tfc = p.column("tf_content").to_numpy()
        tfd = p.column("tf_desc").to_numpy()
        buckets = range_bucket(doc_ids, self.bucket_bits)

        key = codes * self.n_buckets + buckets
        order = np.lexsort((doc_ids, key))
        key_s = key[order]
        ids_s = doc_ids[order]
        starts = _boundaries(key_s)
        run_keys = key_s[starts]
        run_codes = run_keys // self.n_buckets
        run_buckets = (run_keys % self.n_buckets).astype(np.int32)
        counts = np.diff(np.concatenate((starts, [len(ids_s)])))

        gaps = delta_encode_sorted(ids_s)
        gaps[starts] = ids_s[starts].astype(np.uint64)
        docs_enc = encode_group_sliced(gaps, starts)
        tft_enc = encode_group_sliced(tft[order].astype(np.uint64), starts)
        tfc_enc = encode_group_sliced(tfc[order].astype(np.uint64), starts)
        tfd_enc = encode_group_sliced(tfd[order].astype(np.uint64), starts)

        shard_by_code = self._shards_for(vocab)
        return pa.table(
            {
                "shard": pa.array(shard_by_code[run_codes], pa.int32()),
                "bucket": pa.array(run_buckets, pa.int32()),
                "term": pa.array(vocab[run_codes].astype(object), pa.string()),
                "n": pa.array(counts, pa.int64()),
                "docs_enc": docs_enc,
                "tft_enc": tft_enc,
                "tfc_enc": tfc_enc,
                "tfd_enc": tfd_enc,
            },
            schema=RUNS_SCHEMA,
        )


def _decode_runs(blobs: list[bytes], counts: np.ndarray) -> np.ndarray:
    """Concatenated VByte streams decode in one pass (self-delimiting)."""
    joined = b"".join(blobs)
    vals = varbyte_decode(joined)
    assert len(vals) == int(counts.sum()), "corrupt posting run"
    return vals


def run_ids_from_gaps(gaps: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Reconstruct absolute doc ids for concatenated delta runs (first
    value of each run absolute) via one run-aware cumsum."""
    run_starts = np.concatenate(([0], np.cumsum(counts)))[:-1].astype(np.int64)
    cs = np.cumsum(gaps.astype(np.int64))
    base = np.zeros(len(run_starts), dtype=np.int64)
    nz = run_starts > 0
    base[nz] = cs[run_starts[nz] - 1]
    return cs - np.repeat(base, counts)


def merge_bucket_runs(
    group: pa.Table, block_size: int = BLOCK_SIZE, codec: str = "vbyte"
) -> pa.Table:
    """Kernel for one (shard, bucket) group of per-batch runs: k-way
    merge each term's sorted runs, compute df + block-max metadata,
    re-encode with ``codec`` ("vbyte" | "pfor"; the incoming runs are
    always VByte — see codec.py module docstring). Vectorized across
    the whole group via one lexsort."""
    if group.num_rows == 0:
        return TERMS_SCHEMA.empty_table()
    shard = group.column("shard")[0].as_py()
    bucket = group.column("bucket")[0].as_py()
    row_codes, vocab = _term_codes(group.column("term"))
    counts = group.column("n").to_numpy()
    gaps = _decode_runs(group.column("docs_enc").to_pylist(), counts)
    tft = _decode_runs(group.column("tft_enc").to_pylist(), counts)
    tfc = _decode_runs(group.column("tfc_enc").to_pylist(), counts)
    tfd = _decode_runs(group.column("tfd_enc").to_pylist(), counts)

    # reconstruct absolute doc ids per run (run-aware cumsum)
    ids = run_ids_from_gaps(gaps, counts)

    # k-way merge of each term's runs: lexsort by (term, doc_id)
    val_codes = np.repeat(row_codes, counts)
    order = np.lexsort((ids, val_codes))
    codes_s = val_codes[order]
    ids_s = ids[order]
    tft_s, tfc_s, tfd_s = tft[order], tfc[order], tfd[order]

    starts = _boundaries(codes_s)
    uniq_terms = vocab[codes_s[starts]]
    df = np.diff(np.concatenate((starts, [len(ids_s)]))).astype(np.int64)

    gaps2 = delta_encode_sorted(ids_s)
    gaps2[starts] = ids_s[starts].astype(np.uint64)
    docs_enc = encode_runs(gaps2, starts, codec)
    tft_enc = encode_runs(tft_s, starts, codec)
    tfc_enc = encode_runs(tfc_s, starts, codec)
    tfd_enc = encode_runs(tfd_s, starts, codec)

    # ---- block-max metadata --------------------------------------------
    nblk = (df + block_size - 1) // block_size
    blk_offsets = np.concatenate(([0], np.cumsum(nblk)))
    total_blocks = int(blk_offsets[-1])
    within = np.arange(total_blocks, dtype=np.int64) - np.repeat(
        blk_offsets[:-1], nblk
    )
    block_starts = np.repeat(starts, nblk) + within * block_size
    term_ends = np.repeat(starts + df, nblk)
    block_ends = np.minimum(block_starts + block_size, term_ends)

    blk_last = ids_s[block_ends - 1] if total_blocks else np.empty(0, np.int64)
    if total_blocks:
        blk_max_tft = np.maximum.reduceat(tft_s, block_starts)
        blk_max_tfc = np.maximum.reduceat(tfc_s, block_starts)
        blk_max_tfd = np.maximum.reduceat(tfd_s, block_starts)
    else:
        blk_max_tft = blk_max_tfc = blk_max_tfd = np.empty(0, np.uint64)

    offsets32 = pa.array(blk_offsets.astype(np.int64)).cast(pa.int32())
    blk_last_col = pa.ListArray.from_arrays(offsets32, pa.array(blk_last, pa.int64()))
    blk_tft_col = pa.ListArray.from_arrays(
        offsets32, pa.array(blk_max_tft.astype(np.int32), pa.int32())
    )
    blk_tfc_col = pa.ListArray.from_arrays(
        offsets32, pa.array(blk_max_tfc.astype(np.int32), pa.int32())
    )
    blk_tfd_col = pa.ListArray.from_arrays(
        offsets32, pa.array(blk_max_tfd.astype(np.int32), pa.int32())
    )

    n_terms = len(starts)
    return pa.table(
        {
            "shard": pa.array(np.full(n_terms, shard, dtype=np.int32)),
            "bucket": pa.array(np.full(n_terms, bucket, dtype=np.int32)),
            "term": pa.array(uniq_terms.astype(object), pa.string()),
            "df": pa.array(df, pa.int64()),
            "docs_enc": docs_enc,
            "tft_enc": tft_enc,
            "tfc_enc": tfc_enc,
            "tfd_enc": tfd_enc,
            "blk_last": blk_last_col,
            "blk_max_tft": blk_tft_col,
            "blk_max_tfc": blk_tfc_col,
            "blk_max_tfd": blk_tfd_col,
        },
        schema=TERMS_SCHEMA,
    )


class ShardReader:
    """In-memory reader for one term-shard's segment files.

    A term may have up to 2^bucket_bits rows (one per docID range
    bucket); buckets concatenate in bucket order to give the full
    docID-sorted posting list. One query actor opens the shards it
    serves in ``__init__`` — the SearchClient-pool pattern
    (src/search_core/SearchClient.cpp:12-51) with segment readers as
    the pooled state.
    """

    def __init__(self, parquet_paths: list[str], codec: str = "vbyte"):
        import pyarrow.parquet as pq

        self.codec = codec
        tables = [pq.read_table(p) for p in parquet_paths]
        t = pa.concat_tables(tables) if tables else TERMS_SCHEMA.empty_table()
        # order rows by (term, bucket) so each term's rows are contiguous
        # and bucket-ascending (docID ranges ascend with bucket)
        import pyarrow.compute as pc

        if t.num_rows:
            idx = pc.sort_indices(
                t, sort_keys=[("term", "ascending"), ("bucket", "ascending")]
            )
            t = t.take(idx)
        self.table = t
        self.term_rows: dict[str, list[int]] = {}
        for i, term in enumerate(t.column("term").to_pylist()):
            self.term_rows.setdefault(term, []).append(i)
        self._df = t.column("df").to_numpy() if t.num_rows else np.empty(0, np.int64)
        # rows are (term, bucket)-sorted, so insertion order == term
        # order: this list is ASCENDING — suggest() bisects it for
        # prefix ranges instead of scanning the whole dictionary
        self.terms_sorted: list[str] = list(self.term_rows.keys())

    def df(self, term: str) -> int:
        rows = self.term_rows.get(term)
        return int(self._df[rows].sum()) if rows else 0

    def postings(self, term: str):
        """-> (doc_ids int64, tf_title, tf_content, tf_desc) or None."""
        rows = self.term_rows.get(term)
        if not rows:
            return None
        t = self.table
        dec = self.codec
        ids_parts, tft_parts, tfc_parts, tfd_parts = [], [], [], []
        for row in rows:
            gaps = decode_postings(t.column("docs_enc")[row].as_py(), dec)
            ids_parts.append(np.cumsum(gaps.astype(np.int64)))
            tft_parts.append(decode_postings(t.column("tft_enc")[row].as_py(), dec).astype(np.int64))
            tfc_parts.append(decode_postings(t.column("tfc_enc")[row].as_py(), dec).astype(np.int64))
            tfd_parts.append(decode_postings(t.column("tfd_enc")[row].as_py(), dec).astype(np.int64))
        return (
            np.concatenate(ids_parts),
            np.concatenate(tft_parts),
            np.concatenate(tfc_parts),
            np.concatenate(tfd_parts),
        )

    def block_meta(self, term: str):
        rows = self.term_rows.get(term)
        if not rows:
            return None
        t = self.table
        last, mt, mc, md = [], [], [], []
        for row in rows:
            last.append(np.asarray(t.column("blk_last")[row].as_py(), dtype=np.int64))
            mt.append(np.asarray(t.column("blk_max_tft")[row].as_py(), dtype=np.int64))
            mc.append(np.asarray(t.column("blk_max_tfc")[row].as_py(), dtype=np.int64))
            md.append(np.asarray(t.column("blk_max_tfd")[row].as_py(), dtype=np.int64))
        return (
            np.concatenate(last),
            np.concatenate(mt),
            np.concatenate(mc),
            np.concatenate(md),
        )
