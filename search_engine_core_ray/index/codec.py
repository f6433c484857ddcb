"""Posting-list compression: delta + VByte, PForDelta and Elias-Fano,
vectorized.

Classic VByte: each value is emitted little-endian in 7-bit groups; the
high bit of every byte except the last in a value is set (continuation).
Doc-id lists are sorted ascending and delta-encoded first (first value
absolute), which is why build keeps postings docID-sorted
(SURVEY.md §7.5 "Ordering").

PForDelta (NewPFD-style, Zukowski et al. 2006 / Yan et al. WWW'09
"Inverted Index Compression and Query Processing with Optimized
Document Ordering" — public algorithms): values are packed in blocks of
128 at a per-block bit width b chosen to minimize estimated bytes
(16·b packed + ~3 per exception); values wider than b store their low
b bits in the packed section and their overflow (position byte +
VByte high part) in per-block exception lists. Both directions are
numpy-vectorized with only O(bit-width) Python loops, matching the
VByte kernels. The on-disk segment codec is selected at build time
(``build_index(codec=...)``), recorded in the manifest, and applied
symmetrically by ``ShardReader``; the intermediate map-side runs
(RUNS_SCHEMA) always use VByte because the merge kernel exploits its
self-delimiting concatenated decode.

All kernels are numpy — no Python loop over values. ``encode_many`` /
``sliced`` helpers let a whole (shard) group of terms be encoded in ONE
numpy pass and then sliced zero-copy into per-term Arrow binary cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _nbytes_for(values: np.ndarray) -> np.ndarray:
    """Number of VByte bytes per value (1..10 for uint64)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    threshold = np.uint64(1 << 7)
    while True:
        mask = v >= threshold
        if not mask.any():
            break
        n[mask] += 1
        if int(threshold) << 7 > (1 << 63):
            # remaining values need the max width; bound the loop
            n[v >= np.uint64(1 << 63)] = 10
            break
        threshold = np.uint64(int(threshold) << 7)
    return n


def varbyte_encode(values: np.ndarray) -> bytes:
    buf, _ = varbyte_encode_with_offsets(values)
    return buf.tobytes()


def varbyte_encode_with_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode an array; returns (uint8 buffer, per-value end offsets)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nb = _nbytes_for(v)
    ends = np.cumsum(nb)
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    starts = ends - nb
    max_nb = int(nb.max())
    for k in range(max_nb):
        mask = nb > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1) > k
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out, ends


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a VByte stream back to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = b < 0x80
    # group id per byte: 0-based index of the value this byte belongs to
    gid = np.zeros(len(b), dtype=np.int64)
    np.cumsum(is_last[:-1], out=gid[1:])
    group_starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(len(b), dtype=np.int64) - group_starts[gid]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, group_starts)


def delta_encode_sorted(doc_ids: np.ndarray) -> np.ndarray:
    """Sorted ascending int64 ids -> uint64 gaps (first value absolute)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    out = np.empty(len(d), dtype=np.uint64)
    if len(d) == 0:
        return out
    out[0] = np.uint64(d[0])
    np.subtract(d[1:], d[:-1], out=out[1:], casting="unsafe")
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode_sorted -> int64 ids."""
    return np.cumsum(gaps.astype(np.int64, copy=False))


def encode_group_sliced(
    values: np.ndarray, boundaries: np.ndarray
) -> pa.BinaryArray:
    """Encode ``values`` (already laid out run-after-run) and return one
    Arrow binary cell per run, where runs are given by ``boundaries``
    (start indices, len = n_runs, first must be 0). Single numpy pass;
    the Arrow array is built zero-copy over the shared buffer.
    """
    buf, ends = varbyte_encode_with_offsets(values)
    n_runs = len(boundaries)
    if len(values) == 0:
        return pa.array([b""] * n_runs, pa.binary())
    if int(ends[-1]) >= (1 << 31):
        # pa.binary() uses int32 offsets; a single merge group this big
        # means the partitioning is undersized for the corpus
        raise ValueError(
            "encoded group exceeds 2 GiB — raise num_shards/bucket_bits "
            "so each (shard, bucket) merge group stays worker-sized"
        )
    # byte offset where each run starts: 0 for run 0, else end of prev value
    run_byte_starts = np.empty(n_runs + 1, dtype=np.int32)
    run_byte_starts[0] = 0
    b1 = np.asarray(boundaries[1:], dtype=np.int64)
    run_byte_starts[1:-1] = np.where(b1 == 0, 0, ends[b1 - 1])
    run_byte_starts[-1] = ends[-1]
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n_runs,
        [None, pa.py_buffer(run_byte_starts.tobytes()), pa.py_buffer(buf.tobytes())],
    )

# --------------------------------------------------------------------------
# PForDelta (NewPFD-style)
#
# Run layout (one posting list = one run, independent byte stream):
#   u32le  n                 value count (0 -> stream ends here)
#   u8     widths[nb]        per-block packed bit width, nb = ceil(n/128)
#   u8     nexc[nb]          per-block exception count
#   bytes  packed            16*widths[i] bytes per block (every block is
#                            padded to 128 values; decode trims to n)
#   u8     positions[sum(nexc)]   exception slot within its block
#   bytes  highs             VByte stream of (value >> width) per
#                            exception, block-major order (self-
#                            delimiting: no length field needed)
# --------------------------------------------------------------------------

PFOR_BLOCK = 128
_PACKED_BYTES_PER_BIT = PFOR_BLOCK // 8  # 16
# estimated bytes per exception: 1 position byte + ~2 VByte high bytes
_EXC_COST = 3

_BYTE_WIDTH = np.array(
    [0] + [int(x).bit_length() for x in range(1, 256)], dtype=np.uint8
)


def _bit_widths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length of uint64 values (0 for 0), vectorized via
    a highest-nonzero-byte scan + 256-entry table (no 64-pass loop)."""
    if len(v) == 0:
        return np.zeros(0, dtype=np.uint8)
    b = np.ascontiguousarray(v, dtype="<u8").view(np.uint8).reshape(-1, 8)
    nz = b != 0
    has = nz.any(axis=1)
    hb = 7 - np.argmax(nz[:, ::-1], axis=1)  # highest nonzero byte index
    top = b[np.arange(len(v)), hb]
    bw = (hb * 8 + _BYTE_WIDTH[top]).astype(np.uint8)
    bw[~has] = 0
    return bw


def pfor_encode_runs(values: np.ndarray, boundaries: np.ndarray) -> pa.BinaryArray:
    """PFor twin of ``encode_group_sliced``: encode run-after-run values
    into one buffer, one Arrow binary cell per run. Vectorized across
    ALL runs at once (blocks of every run are width-chosen, packed and
    laid out in numpy passes grouped by distinct bit width)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bounds = np.asarray(boundaries, dtype=np.int64)
    n_runs = len(bounds)
    if n_runs == 0:
        return pa.array([], pa.binary())
    n_per = np.diff(np.concatenate((bounds, [len(v)])))
    blocks_per = (n_per + PFOR_BLOCK - 1) // PFOR_BLOCK
    total_blocks = int(blocks_per.sum())
    blk_off = np.concatenate(([0], np.cumsum(blocks_per)))  # first block of run
    run_of_block = np.repeat(np.arange(n_runs), blocks_per)

    # scatter values into the zero-padded block grid
    P = np.zeros(total_blocks * PFOR_BLOCK, dtype=np.uint64)
    if len(v):
        pad_base = np.repeat(blk_off[:-1] * PFOR_BLOCK, n_per)
        local = np.arange(len(v), dtype=np.int64) - np.repeat(bounds, n_per)
        P[pad_base + local] = v

    bw = _bit_widths(P).astype(np.int64)
    blk_idx = np.arange(total_blocks * PFOR_BLOCK, dtype=np.int64) // PFOR_BLOCK

    # per-block width choice: minimize 16*b + 3*#values_wider_than_b
    counts = np.zeros((total_blocks, 65), dtype=np.int64)
    np.add.at(counts, (blk_idx, bw), 1)
    wider = PFOR_BLOCK - np.cumsum(counts, axis=1)  # [blk, b] = #(bw > b)
    cost = _PACKED_BYTES_PER_BIT * np.arange(65)[None, :] + wider * _EXC_COST
    W = np.argmin(cost, axis=1).astype(np.int64)  # per-block width

    Wv = np.repeat(W, PFOR_BLOCK)
    exc_mask = bw > Wv
    nexc = np.bincount(blk_idx[exc_mask], minlength=total_blocks).astype(np.int64)
    exc_flat = np.flatnonzero(exc_mask)
    exc_pos = (exc_flat % PFOR_BLOCK).astype(np.uint8)
    highs = P[exc_mask] >> Wv[exc_mask].astype(np.uint64)  # W<64 where exc
    hbuf, hends = varbyte_encode_with_offsets(highs)
    Hc = np.concatenate(([0], hends)).astype(np.int64)

    # pack low bits, grouped by distinct width
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    mask = np.where(
        Wv >= 64, full, (np.uint64(1) << Wv.astype(np.uint64)) - np.uint64(1)
    )
    low = (P & mask).reshape(total_blocks, PFOR_BLOCK)
    pk_bytes = _PACKED_BYTES_PER_BIT * W
    pk_off = np.concatenate(([0], np.cumsum(pk_bytes)))
    packed = np.zeros(int(pk_off[-1]), dtype=np.uint8)
    for b in np.unique(W):
        b = int(b)
        if b == 0:
            continue
        rows = np.flatnonzero(W == b)
        sub = rows_low = low[rows]
        bits = np.zeros((len(rows), PFOR_BLOCK * b), dtype=np.uint8)
        for j in range(b):
            bits[:, j::b] = ((rows_low >> np.uint64(j)) & np.uint64(1)).astype(np.uint8)
        pb = np.packbits(bits, axis=1, bitorder="little")  # (k, 16*b)
        tgt = pk_off[rows][:, None] + np.arange(_PACKED_BYTES_PER_BIT * b)[None, :]
        packed[tgt] = pb

    # per-run section sizes and final layout
    run_exc = np.bincount(run_of_block, weights=nexc, minlength=n_runs).astype(np.int64)
    run_pk = np.bincount(run_of_block, weights=pk_bytes, minlength=n_runs).astype(np.int64)
    ecum = np.concatenate(([0], np.cumsum(run_exc)))
    run_hb = Hc[ecum[1:]] - Hc[ecum[:-1]]
    run_bytes = 4 + 2 * blocks_per + run_pk + run_exc + run_hb
    run_starts = np.concatenate(([0], np.cumsum(run_bytes)))
    total = int(run_starts[-1])
    if total >= (1 << 31):
        raise ValueError(
            "encoded group exceeds 2 GiB — raise num_shards/bucket_bits "
            "so each (shard, bucket) merge group stays worker-sized"
        )
    out = np.zeros(total, dtype=np.uint8)

    # n (u32le) per run
    n4 = n_per.astype("<u4").view(np.uint8).reshape(n_runs, 4)
    out[run_starts[:-1][:, None] + np.arange(4)[None, :]] = n4
    # widths + nexc arrays
    within_b = np.arange(total_blocks, dtype=np.int64) - np.repeat(blk_off[:-1], blocks_per)
    w_base = run_starts[:-1] + 4
    out[np.repeat(w_base, blocks_per) + within_b] = W.astype(np.uint8)
    out[np.repeat(w_base + blocks_per, blocks_per) + within_b] = nexc.astype(np.uint8)
    # packed section (block-contiguous per run)
    pk_base = w_base + 2 * blocks_per  # per run
    pk_first = pk_off[blk_off[:-1].clip(max=total_blocks)]  # packed offset of run's 1st block
    blk_tgt_start = (
        np.repeat(pk_base, blocks_per) + pk_off[:-1] - np.repeat(pk_first, blocks_per)
    )
    total_pk = int(pk_off[-1])
    if total_pk:
        byte_blk = np.repeat(np.arange(total_blocks), pk_bytes)
        within_pk = np.arange(total_pk, dtype=np.int64) - np.repeat(pk_off[:-1], pk_bytes)
        out[blk_tgt_start[byte_blk] + within_pk] = packed
    # exception positions (block-major == run-major)
    pos_base = pk_base + run_pk
    tot_e = int(run_exc.sum())
    if tot_e:
        within_e = np.arange(tot_e, dtype=np.int64) - np.repeat(ecum[:-1], run_exc)
        out[np.repeat(pos_base, run_exc) + within_e] = exc_pos
        # highs (hbuf is already run-major contiguous)
        high_base = pos_base + run_exc
        tot_h = int(run_hb.sum())
        within_h = np.arange(tot_h, dtype=np.int64) - np.repeat(Hc[ecum[:-1]], run_hb)
        out[np.repeat(high_base, run_hb) + within_h] = hbuf

    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n_runs,
        [
            None,
            pa.py_buffer(run_starts.astype(np.int32).tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
    )


def pfor_encode(values: np.ndarray) -> bytes:
    """Encode one run (convenience / test twin of pfor_encode_runs)."""
    arr = pfor_encode_runs(np.asarray(values, dtype=np.uint64), np.zeros(1, np.int64))
    return arr[0].as_py()


def pfor_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode one PFor run back to uint64 values (vectorized; Python
    loops only over distinct bit widths and packed bit positions)."""
    b = (
        np.frombuffer(buf, dtype=np.uint8)
        if isinstance(buf, (bytes, bytearray, memoryview))
        else np.ascontiguousarray(buf, dtype=np.uint8)
    )
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    n = int(b[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nb = (n + PFOR_BLOCK - 1) // PFOR_BLOCK
    W = b[4 : 4 + nb].astype(np.int64)
    ne = b[4 + nb : 4 + 2 * nb].astype(np.int64)
    pk_off = 4 + 2 * nb + np.concatenate(([0], np.cumsum(_PACKED_BYTES_PER_BIT * W)))
    out = np.zeros(nb * PFOR_BLOCK, dtype=np.uint64)
    for w in np.unique(W):
        w = int(w)
        if w == 0:
            continue
        rows = np.flatnonzero(W == w)
        src = pk_off[:-1][rows][:, None] + np.arange(_PACKED_BYTES_PER_BIT * w)[None, :]
        bits = np.unpackbits(b[src], axis=1, bitorder="little")  # (k, 128*w)
        vals = np.zeros((len(rows), PFOR_BLOCK), dtype=np.uint64)
        for j in range(w):
            vals |= bits[:, j::w].astype(np.uint64) << np.uint64(j)
        tgt = (rows[:, None] * PFOR_BLOCK + np.arange(PFOR_BLOCK)[None, :]).ravel()
        out[tgt] = vals.ravel()
    pos_base = int(pk_off[-1])
    tot_e = int(ne.sum())
    if tot_e:
        pos = b[pos_base : pos_base + tot_e].astype(np.int64)
        highs = varbyte_decode(b[pos_base + tot_e :])
        assert len(highs) == tot_e, "corrupt PFor run (exception count)"
        eblk = np.repeat(np.arange(nb, dtype=np.int64), ne)
        out[eblk * PFOR_BLOCK + pos] |= highs << W[eblk].astype(np.uint64)
    return out[:n]


# --------------------------------------------------------------------------
# Elias-Fano (quasi-succinct indices, Vigna WSDM'13 — public algorithm)
#
# EF natively encodes a MONOTONE sequence; the segment value streams are
# non-negative deltas/frequencies, so each run is prefix-summed first
# (gaps -> doc ids; tfs -> running totals) and the monotone prefix sums
# are EF-coded. This makes "ef" a drop-in third codec with the same
# stream-in/stream-out contract as vbyte/pfor: encode gets the raw value
# stream, decode returns it. Requirement: sum(values) per run < 2^64
# (always true for doc-gap streams, whose sum is the max doc id, and for
# tf streams at any realistic corpus size); wrap is detected and raised.
#
# Run layout (one posting list = one run, independent byte stream):
#   u32le  n          value count (0 -> stream ends here)
#   u8     tag        0..63 = EF low-bit width l; 0xFF = VByte escape
#   -- tag <= 63 (Elias-Fano body) --
#   u64le  last       final prefix sum (upper-array extent)
#   bytes  upper      ceil((n + (last >> l)) / 8) bytes, little bit
#                     order: bit ((x_i >> l) + i) is set for prefix sum
#                     x_i (strictly increasing in i, so bits are unique)
#   bytes  lows       ceil(n*l / 8) bytes; value i's low l bits occupy
#                     bit positions [i*l, (i+1)*l), little bit order
#   -- tag == 0xFF (escape) --
#   bytes  vbyte      the n raw values, classic VByte
#
# With l = max(0, floor(log2(last / n))) the upper array is < 3n bits,
# giving the classic ~(2 + log2(U/n)) bits per element. The escape
# exists because the corpus doc-id space is hashed 63-bit keys: a
# Zipf-tail term with df 1-2 pays more for the 9-byte EF last+tag
# header than for its whole VByte stream, so each run takes whichever
# encoding is smaller (deterministic: EF wins ties) — the per-run twin
# of PFor's per-block width choice. Encode is vectorized across ALL
# runs at once (one global bit canvas + ONE np.packbits; Python loops
# only over the <=63 low-bit planes), decode over the <=63 bit planes
# of a single run — matching the vbyte/pfor kernel budget.
# --------------------------------------------------------------------------

_EF_HEADER = 13  # u32 n + u8 tag + u64 last
_EF_ESCAPE = 0xFF


def ef_encode_runs(values: np.ndarray, boundaries: np.ndarray) -> pa.BinaryArray:
    """Elias-Fano twin of ``encode_group_sliced``: encode run-after-run
    values into one buffer, one Arrow binary cell per run."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bounds = np.asarray(boundaries, dtype=np.int64)
    n_runs = len(bounds)
    if n_runs == 0:
        return pa.array([], pa.binary())
    n_per = np.diff(np.concatenate((bounds, [len(v)])))
    run_of_val = np.repeat(np.arange(n_runs, dtype=np.int64), n_per)
    local = np.arange(len(v), dtype=np.int64) - np.repeat(bounds, n_per)

    # per-run prefix sums via the global-cumsum-minus-offset trick
    # (uint64 arithmetic is mod 2^64, so per-run sums are exact as long
    # as they fit; an in-run wrap shows up as a decrease and is raised)
    cum = np.cumsum(v, dtype=np.uint64)
    if len(v):
        base = np.where(bounds > 0, cum[bounds - 1], np.uint64(0))
        cum = cum - np.repeat(base, n_per)
        interior = local > 0
        if np.any(cum[interior] < cum[np.flatnonzero(interior) - 1]):
            raise ValueError(
                "Elias-Fano run overflow: sum(values) in one run exceeds "
                "2^64 — use vbyte/pfor for streams with 64-bit-scale sums"
            )

    ends = np.concatenate((bounds[1:], [len(v)])) - 1  # last index per run
    if len(v):
        last = np.where(n_per > 0, cum[np.maximum(ends, 0)], np.uint64(0)).astype(np.uint64)
    else:
        last = np.zeros(n_runs, dtype=np.uint64)
    q = np.zeros(n_runs, dtype=np.uint64)
    np.floor_divide(last, n_per.astype(np.uint64), out=q, where=n_per > 0)
    lw = np.maximum(_bit_widths(q).astype(np.int64) - 1, 0)  # floor(log2 q), 0 if q<2

    upper_bits = n_per + (last >> lw.astype(np.uint64)).astype(np.int64)
    upper_bytes = np.where(n_per > 0, (upper_bits + 7) // 8, 0)
    low_bytes = np.where(n_per > 0, (n_per * lw + 7) // 8, 0)
    body_bytes = upper_bytes + low_bytes

    # per-run VByte cost of the RAW stream (escape candidate)
    vb_buf, vb_ends = varbyte_encode_with_offsets(v)
    vb_run_start = np.where(bounds > 0, vb_ends[np.maximum(bounds - 1, 0)], 0) if len(v) else np.zeros(n_runs, np.int64)
    vb_run_end = np.where(n_per > 0, vb_ends[np.maximum(ends, 0)], vb_run_start) if len(v) else vb_run_start
    vb_len = vb_run_end - vb_run_start
    use_ef = (_EF_HEADER + body_bytes) <= (5 + vb_len)  # ties -> EF
    run_bytes = np.where(
        n_per > 0, np.where(use_ef, _EF_HEADER + body_bytes, 5 + vb_len), 4
    )
    run_starts = np.concatenate(([0], np.cumsum(run_bytes)))
    total = int(run_starts[-1])
    if total >= (1 << 31):
        raise ValueError(
            "encoded group exceeds 2 GiB — raise num_shards/bucket_bits "
            "so each (shard, bucket) merge group stays worker-sized"
        )

    # one global bit canvas: [run0 upper | run0 lows | run1 upper | ...],
    # each run's body byte-aligned so packbits yields the final body bytes
    body_off = np.concatenate(([0], np.cumsum(body_bytes)))  # bytes
    total_body = int(body_off[-1])
    bits = np.zeros(total_body * 8, dtype=np.uint8)
    if len(v):
        lw_v = lw[run_of_val]
        up_start = body_off[:-1][run_of_val] * 8
        bits[up_start + (cum >> lw_v.astype(np.uint64)).astype(np.int64) + local] = 1
        lo_start = (body_off[:-1] + upper_bytes)[run_of_val] * 8 + local * lw_v
        for k in range(int(lw.max()) if n_runs else 0):
            m = lw_v > k
            if not m.any():
                continue
            bits[lo_start[m] + k] = ((cum[m] >> np.uint64(k)) & np.uint64(1)).astype(np.uint8)
    body = np.packbits(bits, bitorder="little") if total_body else np.empty(0, np.uint8)

    out = np.zeros(total, dtype=np.uint8)
    out[run_starts[:-1][:, None] + np.arange(4)[None, :]] = (
        n_per.astype("<u4").view(np.uint8).reshape(n_runs, 4)
    )
    ef_runs = (n_per > 0) & use_ef
    vb_runs = (n_per > 0) & ~use_ef
    out[run_starts[:-1][ef_runs] + 4] = lw[ef_runs].astype(np.uint8)
    out[run_starts[:-1][vb_runs] + 4] = _EF_ESCAPE
    out[(run_starts[:-1][ef_runs] + 5)[:, None] + np.arange(8)[None, :]] = (
        last[ef_runs].astype("<u8").view(np.uint8).reshape(-1, 8)
    )
    ef_body = body_bytes[ef_runs]
    if int(ef_body.sum()):
        tgt = np.repeat(run_starts[:-1][ef_runs] + _EF_HEADER, ef_body)
        src = np.repeat(body_off[:-1][ef_runs], ef_body)
        within = np.arange(int(ef_body.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(ef_body[:-1]))), ef_body
        )
        out[tgt + within] = body[src + within]
    vb_body = vb_len[vb_runs]
    if int(vb_body.sum()):
        tgt = np.repeat(run_starts[:-1][vb_runs] + 5, vb_body)
        src = np.repeat(vb_run_start[vb_runs], vb_body)
        within = np.arange(int(vb_body.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(vb_body[:-1]))), vb_body
        )
        out[tgt + within] = vb_buf[src + within]

    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n_runs,
        [
            None,
            pa.py_buffer(run_starts.astype(np.int32).tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
    )


def ef_encode(values: np.ndarray) -> bytes:
    """Encode one run (convenience / test twin of ef_encode_runs)."""
    arr = ef_encode_runs(np.asarray(values, dtype=np.uint64), np.zeros(1, np.int64))
    return arr[0].as_py()


def ef_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode one Elias-Fano run back to the original uint64 value
    stream (vectorized; Python loop only over the <=63 low-bit planes)."""
    b = (
        np.frombuffer(buf, dtype=np.uint8)
        if isinstance(buf, (bytes, bytearray, memoryview))
        else np.ascontiguousarray(buf, dtype=np.uint8)
    )
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    n = int(b[:4].view("<u4")[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lw = int(b[4])
    if lw == _EF_ESCAPE:
        out = varbyte_decode(b[5:])
        assert len(out) == n, "corrupt EF run (escape count)"
        return out
    last = int(b[5:13].view("<u8")[0])
    ub = n + (last >> lw)
    ubytes = (ub + 7) // 8
    pos = np.flatnonzero(
        np.unpackbits(b[_EF_HEADER : _EF_HEADER + ubytes], bitorder="little")[:ub]
    )
    assert len(pos) == n, "corrupt EF run (upper-array population)"
    x = (pos - np.arange(n)).astype(np.uint64) << np.uint64(lw)
    if lw:
        lbytes = (n * lw + 7) // 8
        lo = _EF_HEADER + ubytes
        lbits = np.unpackbits(b[lo : lo + lbytes], bitorder="little")
        for k in range(lw):
            x |= lbits[k::lw][:n].astype(np.uint64) << np.uint64(k)
    out = np.empty(n, dtype=np.uint64)
    out[0] = x[0]
    out[1:] = x[1:] - x[:-1]
    return out


POSTINGS_CODECS = ("vbyte", "pfor", "ef")


def encode_runs(
    values: np.ndarray, boundaries: np.ndarray, codec: str = "vbyte"
) -> pa.BinaryArray:
    """Codec dispatch for the segment writers (one cell per run)."""
    if codec == "vbyte":
        return encode_group_sliced(values, boundaries)
    if codec == "pfor":
        return pfor_encode_runs(values, boundaries)
    if codec == "ef":
        return ef_encode_runs(values, boundaries)
    raise ValueError(f"unknown postings codec {codec!r}; one of {POSTINGS_CODECS}")


def decode_postings(blob, codec: str = "vbyte") -> np.ndarray:
    """Codec dispatch for the segment readers (one run per cell)."""
    if codec == "vbyte":
        return varbyte_decode(blob)
    if codec == "pfor":
        return pfor_decode(blob)
    if codec == "ef":
        return ef_decode(blob)
    raise ValueError(f"unknown postings codec {codec!r}; one of {POSTINGS_CODECS}")
