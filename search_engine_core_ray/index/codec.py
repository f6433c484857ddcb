"""Posting-list compression: delta + variable-byte, fully vectorized.

Classic VByte: each value is emitted little-endian in 7-bit groups; the
high bit of every byte except the last in a value is set (continuation).
Doc-id lists are sorted ascending and delta-encoded first (first value
absolute), which is why build keeps postings docID-sorted
(SURVEY.md §7.5 "Ordering").

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
