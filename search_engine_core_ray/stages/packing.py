"""Sequence packing: tokenize -> concatenate with an EOS slot per doc
-> split the global token stream into fixed-length training sequences.

This is the canonical LLM-training layout step (GPT-style packing with
document straddling): documents are laid end-to-end in doc_id order,
each followed by one EOS token, and the stream is cut every ``seq_len``
tokens.  The output is the SPAN MAP — one row per (document, sequence)
overlap — which is what a loader needs to assemble sequences from the
original shards without ever materializing the token stream itself:

    (doc_id, seq_id, seq_off, doc_off, len)

    seq_id  : which training sequence the chunk lands in
    seq_off : offset of the chunk inside that sequence  [0, seq_len)
    doc_off : offset of the chunk inside the document's token stream
    len     : chunk length in tokens (>= 1)

Token counts use the BPE-ish budget counter (textstats.BPE_RE) so the
whole operator is SQL-checkable: DuckDB replays the regex count, the
running-sum offsets (a window function) and the straddle explosion
(unnest over the covered sequence range).

Distribution (the 100-TB story): only the NARROW (doc_id, n_tok)
stream — 16 bytes/doc — rides the exchange.  The global offsets are a
classic two-pass distributed prefix scan:

  1. sort the narrow table by doc_id and materialize (pins blocks);
  2. one whole-block map emits per-block partials (block min doc_id,
     block token sum) — ONE ROW PER BLOCK to the driver;
  3. the driver computes the exclusive block-prefix (a few thousand
     additions) and broadcasts it via ``ray.put``;
  4. a second whole-block map adds the within-block running sum to the
     block's base — every doc has its exact global offset without any
     further shuffle.

Document text never enters the pipeline (pruned at the read to
(doc_id, text) for counting only), and the span explosion is pure
vectorized numpy (repeat + arange), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .textstats import BPE_RE


def _count_tokens(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tok) with n_tok = BPE-ish tokens + 1
    (the EOS slot every document contributes to the stream)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text").fill_null("")
    )
    out = df.with_columns(
        n_tok=(pl.col("text").str.count_matches(BPE_RE) + 1).cast(pl.Int64)
    ).drop("text")
    return out.to_arrow()


def _block_partial(batch: pa.Table) -> pa.Table:
    """Whole-block map: one (block min doc_id, block token sum) row."""
    ids = batch.column("doc_id").to_numpy()
    n = batch.column("n_tok").to_numpy()
    if len(ids) == 0:
        return pa.table(
            {"first_doc": pa.array([], pa.int64()), "tok_sum": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "first_doc": pa.array([int(ids.min())], pa.int64()),
            "tok_sum": pa.array([int(n.sum())], pa.int64()),
        }
    )


def _make_add_offsets(base_ref):
    """Whole-block map over the SAME materialized sorted blocks: global
    start = broadcast block base (keyed by the block's min doc_id) +
    within-block exclusive running sum.  A plain task closure over the
    ray.put handle — the base dict is one int per block, so per-task
    ray.get is a local-store hit and no actor pool needs to spin up."""

    def add_offsets(batch: pa.Table) -> pa.Table:
        import ray

        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                }
            )
        base_map: dict[int, int] = ray.get(base_ref)
        ids = batch.column("doc_id").to_numpy()
        n = batch.column("n_tok").to_numpy()
        base = base_map[int(ids.min())]
        # blocks are doc_id-sorted (sorted dataset), so the exclusive
        # cumsum inside the block is the in-block token offset
        within = np.concatenate(([0], np.cumsum(n[:-1], dtype=np.int64)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(n, pa.int64()),
                "start": pa.array(base + within, pa.int64()),
            }
        )

    return add_offsets


def _make_explode_spans(seq_len: int):
    def explode_spans(batch: pa.Table) -> pa.Table:
        """(doc_id, n_tok, start) -> one row per covered sequence —
        vectorized repeat + arange, no per-row Python."""
        ids = batch.column("doc_id").to_numpy()
        n = batch.column("n_tok").to_numpy()
        start = batch.column("start").to_numpy()
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_off": pa.array([], pa.int64()),
                    "doc_off": pa.array([], pa.int64()),
                    "len": pa.array([], pa.int64()),
                }
            )
        first = start // seq_len
        last = (start + n - 1) // seq_len
        counts = (last - first + 1).astype(np.int64)
        total = int(counts.sum())
        doc_rep = np.repeat(ids, counts)
        start_rep = np.repeat(start, counts)
        n_rep = np.repeat(n, counts)
        # per-row arange: global arange minus each row's exclusive base
        excl = np.concatenate(([0], np.cumsum(counts[:-1])))
        seq = np.repeat(first, counts) + (np.arange(total) - np.repeat(excl, counts))
        cs = seq * seq_len
        chunk_start = np.maximum(start_rep, cs)
        chunk_end = np.minimum(start_rep + n_rep, cs + seq_len)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "seq_id": pa.array(seq, pa.int64()),
                "seq_off": pa.array(chunk_start - cs, pa.int64()),
                "doc_off": pa.array(chunk_start - start_rep, pa.int64()),
                "len": pa.array(chunk_end - chunk_start, pa.int64()),
            }
        )

    return explode_spans


def pack_sequences(docs_ds, seq_len: int = 512):
    """Span map for packing ``docs_ds`` (doc_id, text) into fixed
    ``seq_len`` training sequences in doc_id order.  Returns a Dataset
    of (doc_id, seq_id, seq_off, doc_off, len)."""
    import ray

    narrow = docs_ds.map_batches(_count_tokens, batch_format="pyarrow")
    srt = narrow.sort("doc_id").materialize()

    partials = srt.map_batches(
        _block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    partials.sort(key=lambda r: r["first_doc"])
    base: dict[int, int] = {}
    acc = 0
    for p in partials:
        base[int(p["first_doc"])] = acc
        acc += int(p["tok_sum"])
    base_ref = ray.put(base)

    offsets = srt.map_batches(
        _make_add_offsets(base_ref), batch_format="pyarrow", batch_size=None
    )
    return offsets.map_batches(_make_explode_spans(seq_len), batch_format="pyarrow")


def _make_chunk_batch(window: int, stride: int):
    """Per-batch kernel for chunk_windows: whitespace tokenize, explode
    the window starts, slice + space-join the token lists — all
    vectorized polars list ops, no per-row Python."""

    def chunk_batch(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        # RE2's exact \S class — the DuckDB oracle tokenizes with RE2
        # '\S+'; polars' Unicode \S+ would split differently on
        # non-ASCII whitespace (see textstats.WS_TOKEN_RE)
        df = df.with_columns(
            toks=pl.col("text").str.extract_all(r"[^ \t\n\r\f]+")
        ).with_columns(n_tok=pl.col("toks").list.len().cast(pl.Int64))
        # 1 + ceil((n_tok - window) / stride) windows, floored at one;
        # GREATEST keeps the numerator non-negative so DuckDB's
        # truncating // and polars' flooring // agree exactly.
        df = df.with_columns(
            n_chunks=pl.when(pl.col("n_tok") == 0)
            .then(pl.lit(0, dtype=pl.Int64))
            .otherwise(
                1
                + (
                    pl.max_horizontal(pl.col("n_tok"), pl.lit(window))
                    - window
                    + stride
                    - 1
                )
                // stride
            )
            .cast(pl.Int64)
        )
        df = (
            df.with_columns(
                chunk_id=pl.int_ranges(0, pl.col("n_chunks"), dtype=pl.Int64)
            )
            .explode("chunk_id")
            .filter(pl.col("chunk_id").is_not_null())
        )
        df = df.with_columns(
            tok_start=(pl.col("chunk_id") * stride).cast(pl.Int64)
        ).with_columns(
            tok_len=pl.min_horizontal(
                pl.lit(window, dtype=pl.Int64),
                pl.col("n_tok") - pl.col("tok_start"),
            )
        )
        df = df.with_columns(
            chunk_text=pl.col("toks")
            .list.slice(pl.col("tok_start"), pl.col("tok_len"))
            .list.join(" ")
        )
        out = df.select(
            ["doc_id", "chunk_id", "tok_start", "tok_len", "chunk_text"]
        ).to_arrow()
        # polars emits large_string; pin the plain-string schema so
        # downstream joins/unions never see mixed key types.
        return out.cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("chunk_id", pa.int64()),
                    ("tok_start", pa.int64()),
                    ("tok_len", pa.int64()),
                    ("chunk_text", pa.string()),
                ]
            )
        )

    return chunk_batch


def chunk_windows(docs_ds, window: int = 32, stride: int = 24):
    """Fixed-size token windows with overlap — the retrieval / long-
    context chunking layout (the sliding-window complement of
    pack_sequences: documents are never concatenated, each is split
    independently).

    Tokens are whitespace runs (``\\S+``).  Window starts are 0,
    stride, 2*stride, ...; emission stops at the first window that
    reaches the end of the document (start + window >= n_tok), so no
    trailing window is a strict subset of its predecessor — every doc
    with at least one token gets >= 1 chunk, and only the final chunk
    may be shorter than ``window``.  ``chunk_text`` is the space-joined
    token slice (canonical single-space whitespace), which makes the
    output independent of the source's whitespace runs and exactly
    replayable by a SQL oracle (list_slice + array_to_string).

    Returns (doc_id, chunk_id, tok_start, tok_len, chunk_text).

    Scale (100 TB): map-only — no shuffle, no driver traffic, no
    state; output is ~window/stride x the input text volume, streamed
    straight to the consumer/sink with backpressure.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    return docs_ds.map_batches(
        _make_chunk_batch(window, stride), batch_format="pyarrow"
    )


KNUTH = 2654435761  # Knuth multiplicative hash constant, mod 2^32


def _make_epoch_key(seed: int):
    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # the seed enters BEFORE the multiply: an additive post-hash
        # seed would shift every value equally mod 2^32 and preserve
        # the order (same permutation every epoch).  ((id+seed) mod
        # 2^32) * KNUTH < 2^64, so uint64 arithmetic is exact for ALL
        # doc_id INCLUDING negatives: .astype(uint64) wraps mod 2^64,
        # and 2^32 | 2^64 makes the subsequent % 2^32 equal the
        # mathematical non-negative residue of (id + seed).  The SQL
        # twin must therefore force the non-negative residue too —
        # DuckDB % keeps the dividend's sign — via ((x % m) + m) % m
        # (see the epoch_shuffle oracle in pipelines/catalog.py).
        h = (
            ((ids.astype(np.uint64) + np.uint64(seed)) % np.uint64(2**32))
            * np.uint64(KNUTH)
        ) % np.uint64(2**32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "hkey": pa.array(h.astype(np.int64), pa.int64()),
                "_g": pa.array(np.zeros(len(ids), dtype=np.int64), pa.int64()),
            }
        )

    return add_key


def epoch_shuffle(docs_ds, seed: int = 0):
    """Deterministic global training order for one epoch: every doc
    gets a pseudorandom but reproducible 1-based ``position`` —
    row_number under ORDER BY (knuth_hash(doc_id, seed), doc_id).

    This is the epoch-shuffle step of a training-data pipeline made
    restartable: the order is a pure function of (doc_id, seed), so a
    resumed loader, a different cluster size, or a re-run all produce
    the identical permutation — unlike ``random_shuffle``, which is
    neither reproducible across runs nor expressible to an oracle.
    New epoch = new seed.

    Scale (100 TB): only the NARROW (doc_id, hkey) stream rides the
    ONE sort exchange; the global numbering is the keyed_row_number
    prefix scan (O(blocks) driver rows).  Loaders join position back
    to payloads by doc_id, so document text never enters the shuffle.
    """
    from .shuffle import keyed_row_number

    keyed = docs_ds.map_batches(
        _make_epoch_key(seed), batch_format="pyarrow"
    )
    rn = keyed_row_number(keyed, "_g", ["hkey", "doc_id"], out_col="position")
    return rn.map_batches(
        lambda b: b.select(["doc_id", "position"]), batch_format="pyarrow"
    )
