"""Segment encode / merge kernels and the segment reader.

Physical layout of the inverted index (all per term-shard):

    index_dir/segments/shard=K/*.parquet     one row per term:
        term, df:int64,
        docs_enc    binary   delta+varbyte docID gaps (docID-sorted)
        tft_enc     binary   varbyte per-doc tf(title)
        tfc_enc     binary   varbyte per-doc tf(content)
        tfd_enc     binary   varbyte per-doc tf(description)
        blk_last    list<int64>  last docID per 128-doc block
        blk_max_tft list<int32>  block max tf(title)      } block-max
        blk_max_tfc list<int32>  block max tf(content)    } metadata for
        blk_max_tfd list<int32>  block max tf(description)} WAND pruning

Build is two shuffles over the exploded postings:

1. ``groupby(shard, salt)`` -> ``encode_salted_runs``: lexsort the whole
   group by (term, doc_id) in ONE numpy pass, emit one row per
   (term, salt) holding an encoded docID-sorted run. The salt
   (doc_id % salt_mod) bounds every group at df/salt_mod even for
   Zipf-head terms — this is the explicit term-skew handling the
   north_rule names.
2. ``groupby(shard)`` -> ``merge_shard_runs``: decode all runs (VByte
   streams concatenate losslessly), merge each term's salted runs back
   into one docID-sorted posting list (vectorized k-way merge via
   lexsort over run-tagged values), compute df + block-max metadata,
   re-encode. df = run length because a postings row exists iff the
   term occurs in the doc's title/content/description union —
   matching updateCorpusStatistics (SearchScorer.cpp:237-247).

Both kernels are whole-group vectorized: no Python loop over terms or
postings (only O(#byte-width) loops inside the codec).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .codec import (
    delta_encode_sorted,
    encode_group_sliced,
    varbyte_decode,
)

BLOCK_SIZE = 128

TERMS_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
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

RUNS_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("n", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tft_enc", pa.binary()),
        ("tfc_enc", pa.binary()),
        ("tfd_enc", pa.binary()),
    ]
)


def shard_of_term(term: str, num_shards: int) -> int:
    """Stable term -> shard assignment (crc32; process-independent)."""
    return zlib.crc32(term.encode("utf-8")) % num_shards


def _term_boundaries(terms_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start index of each distinct run in a sorted array + the values."""
    if len(terms_sorted) == 0:
        return np.empty(0, dtype=np.int64), terms_sorted
    change = np.concatenate(([True], terms_sorted[1:] != terms_sorted[:-1]))
    starts = np.flatnonzero(change)
    return starts, terms_sorted[starts]


def _term_codes(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode a term column and rank codes in STRING-sorted
    order, so integer sorts below are deterministic (same final file
    layout for any input row order) and cheap: only the vocabulary —
    not every posting — is compared as strings.

    Returns (ranked_codes int64 per row, vocab sorted ascending, object).
    """
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(col.combine_chunks())
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    order = np.argsort(vocab)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return rank[codes], vocab[order]


def encode_salted_runs(group: pa.Table) -> pa.Table:
    """First-pass kernel for one (shard, salt) group of postings rows."""
    if group.num_rows == 0:
        return TERMS_SCHEMA.empty_table().select(RUNS_SCHEMA.names)
    shard = group.column("shard")[0].as_py()
    codes, vocab = _term_codes(group.column("term"))
    doc_ids = group.column("doc_id").to_numpy()
    tft = group.column("tf_title").to_numpy()
    tfc = group.column("tf_content").to_numpy()
    tfd = group.column("tf_desc").to_numpy()

    order = np.lexsort((doc_ids, codes))
    codes_s = codes[order]
    ids_s = doc_ids[order]
    starts, uniq_codes = _term_boundaries(codes_s)
    uniq_terms = vocab[uniq_codes]

    # run-aware delta encode: gaps within each term run, absolute firsts
    gaps = delta_encode_sorted(ids_s)
    gaps[starts] = ids_s[starts].astype(np.uint64)

    docs_enc = encode_group_sliced(gaps, starts)
    tft_enc = encode_group_sliced(tft[order].astype(np.uint64), starts)
    tfc_enc = encode_group_sliced(tfc[order].astype(np.uint64), starts)
    tfd_enc = encode_group_sliced(tfd[order].astype(np.uint64), starts)
    counts = np.diff(np.concatenate((starts, [len(ids_s)])))

    return pa.table(
        {
            "shard": pa.array(np.full(len(starts), shard, dtype=np.int32)),
            "term": pa.array(uniq_terms.astype(object), pa.string()),
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


def merge_shard_runs(group: pa.Table, block_size: int = BLOCK_SIZE) -> pa.Table:
    """Second-pass kernel for one shard group of salted runs."""
    if group.num_rows == 0:
        return TERMS_SCHEMA.empty_table()
    shard = group.column("shard")[0].as_py()
    row_codes, vocab = _term_codes(group.column("term"))
    counts = group.column("n").to_numpy()
    docs_blobs = group.column("docs_enc").to_pylist()
    tft_blobs = group.column("tft_enc").to_pylist()
    tfc_blobs = group.column("tfc_enc").to_pylist()
    tfd_blobs = group.column("tfd_enc").to_pylist()

    gaps = _decode_runs(docs_blobs, counts)
    tft = _decode_runs(tft_blobs, counts)
    tfc = _decode_runs(tfc_blobs, counts)
    tfd = _decode_runs(tfd_blobs, counts)

    # reconstruct absolute doc ids per run (run-aware cumsum)
    run_starts = np.concatenate(([0], np.cumsum(counts)))[:-1].astype(np.int64)
    cs = np.cumsum(gaps.astype(np.int64))
    base = np.zeros(len(run_starts), dtype=np.int64)
    nz = run_starts > 0
    base[nz] = cs[run_starts[nz] - 1]
    ids = cs - np.repeat(base, counts)

    # k-way merge of each term's salted runs: lexsort by (term, doc_id)
    val_codes = np.repeat(row_codes, counts)
    order = np.lexsort((ids, val_codes))
    codes_s = val_codes[order]
    ids_s = ids[order]
    tft_s, tfc_s, tfd_s = tft[order], tfc[order], tfd[order]

    starts, uniq_codes = _term_boundaries(codes_s)
    uniq_terms = vocab[uniq_codes]
    df = np.diff(np.concatenate((starts, [len(ids_s)]))).astype(np.int64)

    gaps2 = delta_encode_sorted(ids_s)
    gaps2[starts] = ids_s[starts].astype(np.uint64)
    docs_enc = encode_group_sliced(gaps2, starts)
    tft_enc = encode_group_sliced(tft_s, starts)
    tfc_enc = encode_group_sliced(tfc_s, starts)
    tfd_enc = encode_group_sliced(tfd_s, starts)

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

    blk_last = ids_s[block_ends - 1]
    blk_max_tft = np.maximum.reduceat(tft_s, block_starts) if total_blocks else np.empty(0, np.uint64)
    blk_max_tfc = np.maximum.reduceat(tfc_s, block_starts) if total_blocks else np.empty(0, np.uint64)
    blk_max_tfd = np.maximum.reduceat(tfd_s, block_starts) if total_blocks else np.empty(0, np.uint64)
    # reduceat with consecutive starts handles our contiguous blocks, but a
    # block that crosses a term boundary must not absorb the next term's
    # values — block_ends already clamp to term ends, and reduceat segments
    # run to the next start, which IS the next block/term start. Safe.

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

    return pa.table(
        {
            "shard": pa.array(np.full(len(starts), shard, dtype=np.int32)),
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

    Holds the term dictionary (term -> row) plus the encoded blobs;
    decodes a posting list on demand. One query actor opens the shards
    it serves in ``__init__`` — the SearchClient-pool pattern
    (src/search_core/SearchClient.cpp:12-51) with segment readers as the
    pooled state.
    """

    def __init__(self, parquet_paths: list[str]):
        import pyarrow.parquet as pq

        tables = [pq.read_table(p) for p in parquet_paths]
        t = pa.concat_tables(tables) if tables else TERMS_SCHEMA.empty_table()
        self.table = t
        self.term_row: dict[str, int] = {
            term: i for i, term in enumerate(t.column("term").to_pylist())
        }
        self._df = t.column("df").to_numpy() if t.num_rows else np.empty(0, np.int64)

    def df(self, term: str) -> int:
        row = self.term_row.get(term)
        return int(self._df[row]) if row is not None else 0

    def postings(self, term: str):
        """-> (doc_ids int64, tf_title, tf_content, tf_desc) or None."""
        row = self.term_row.get(term)
        if row is None:
            return None
        t = self.table
        gaps = varbyte_decode(t.column("docs_enc")[row].as_py())
        ids = np.cumsum(gaps.astype(np.int64))
        tft = varbyte_decode(t.column("tft_enc")[row].as_py()).astype(np.int64)
        tfc = varbyte_decode(t.column("tfc_enc")[row].as_py()).astype(np.int64)
        tfd = varbyte_decode(t.column("tfd_enc")[row].as_py()).astype(np.int64)
        return ids, tft, tfc, tfd

    def block_meta(self, term: str):
        row = self.term_row.get(term)
        if row is None:
            return None
        t = self.table
        return (
            np.asarray(t.column("blk_last")[row].as_py(), dtype=np.int64),
            np.asarray(t.column("blk_max_tft")[row].as_py(), dtype=np.int64),
            np.asarray(t.column("blk_max_tfc")[row].as_py(), dtype=np.int64),
            np.asarray(t.column("blk_max_tfd")[row].as_py(), dtype=np.int64),
        )
