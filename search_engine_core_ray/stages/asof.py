"""Distributed as-of join: each left row picks the LATEST right row of
the same key with right_ts <= left_ts (nulls when none exists).

Ray Data has no asof join; the classic composition is

    union both sides tagged -> ONE sort exchange by
    (key, ts, side[right first], tiebreak) -> per-block vectorized
    forward-fill -> O(blocks) carry chain across block boundaries.

The sort is the single all-to-all (unavoidable: asof is an
order-dependent join); everything after is embarrassingly parallel.
Cross-block state is ONE row per block — (last key of the block, that
key's last right payload) — folded on the driver exactly like
packing.py's distributed prefix scan, so a hot key spanning hundreds
of blocks costs hundreds of carry rows, not a shuffle. Ties on
(key, ts): right rows sort BEFORE left rows (<= semantics), and equal
right timestamps resolve by ``tiebreak`` ascending — the largest
tiebreak wins, which gives a deterministic answer on duplicate right
(key, ts) pairs (DuckDB's ASOF JOIN leaves that unspecified; the
catalog oracle pre-dedups with max_by to match).

100-TB notes: both inputs should be pruned to (key, ts, payload)
columns BEFORE calling (the sort moves every byte you pass); the
driver sees one partial row per block; the per-block kernel is
numpy-vectorized with zero per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_K, _TS, _SIDE, _TIE = "__asof_k", "__asof_ts", "__asof_side", "__asof_tie"


def _as_int64_ts(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Normalize any temporal column to int64 MICROSECONDS so the two
    sides sort in one unit (a date32 left vs timestamp[ms] right would
    otherwise compare days against milliseconds and silently mis-join);
    plain integer columns pass through as-is."""
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    if pa.types.is_date(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


def _from_int64_ts(col, out_type):
    """Inverse of _as_int64_ts for the left-ts output column."""
    if pa.types.is_timestamp(out_type) or pa.types.is_date(out_type):
        return col.cast(pa.timestamp("us")).cast(out_type)
    return col.cast(out_type)


def _tag_side(
    batch: pa.Table, key: str, ts: str, side: int, tiebreak: str | None,
    left_cols: list, right_cols: list,
) -> pa.Table:
    n = batch.num_rows
    cols = {
        _K: batch.column(key),
        _TS: _as_int64_ts(batch.column(ts)),
        _SIDE: pa.array(np.full(n, side, dtype=np.int8)),
        _TIE: (
            batch.column(tiebreak).cast(pa.int64())
            if side == 0 and tiebreak
            else pa.array(np.zeros(n, dtype=np.int64))
        ),
    }
    mine = {name for name, _ in (left_cols if side == 1 else right_cols)}
    # canonical column order on BOTH sides, so union() sees one schema
    for name, typ in list(left_cols) + list(right_cols):
        cols[name] = (
            batch.column(name).cast(typ) if name in mine else pa.nulls(n, typ)
        )
    return pa.table(cols)


def _block_partial(t: pa.Table, right_cols: list) -> dict | None:
    """(last key of block, last right payload FOR THAT KEY or None)."""
    if t.num_rows == 0:
        return None
    k = t.column(_K).to_numpy(zero_copy_only=False)
    side = t.column(_SIDE).to_numpy()
    last_key = k[-1]
    rights = np.flatnonzero((side == 0) & (k == last_key))
    payload = None
    if len(rights):
        row = int(rights[-1])
        payload = {name: t.column(name)[row].as_py() for name, _ in right_cols}
    return {"last_key": last_key, "payload": payload}


def _resolve_block(
    t: pa.Table, carry: tuple | None, key_out: str, key_type,
    left_cols: list, right_cols: list, left_ts_name: str, left_ts_type,
) -> pa.Table:
    """Per-block kernel: emit one output row per LEFT row with the
    joined right payload (in-block forward fill, else carry, else null).

    ``key_type`` comes from the caller, NOT from ``t.schema`` — a Ray
    sort can emit schema-less EMPTY blocks, which must still yield an
    empty table with the full output schema."""
    out_schema = pa.schema(
        [(key_out, key_type), (left_ts_name, left_ts_type)]
        + [(n, typ) for n, typ in left_cols]
        + [(n, typ) for n, typ in right_cols]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    k = t.column(_K).to_numpy(zero_copy_only=False)
    side = t.column(_SIDE).to_numpy()
    n = len(k)
    idx = np.arange(n, dtype=np.int64)
    r = np.where(side == 0, idx, -1)
    cm = np.maximum.accumulate(r)

    left_mask = side == 1
    lrows = idx[left_mask]
    cand = cm[left_mask]
    valid = cand >= 0
    cand_c = np.maximum(cand, 0)
    valid &= k[cand_c] == k[left_mask]

    cols: dict = {}
    lt = t.filter(pa.array(left_mask))
    cols[key_out] = lt.column(_K)
    ts_col = lt.column(_TS)
    cols[left_ts_name] = (
        _from_int64_ts(ts_col, left_ts_type)
        if not left_ts_type.equals(pa.int64())
        else ts_col
    )
    for name, _typ in left_cols:
        cols[name] = lt.column(name)

    take_idx = pa.array(
        np.where(valid, cand_c, 0).astype(np.int64), mask=~valid
    )  # masked -> null rows from Table.take
    carry_mask = None
    if carry is not None:
        carry_key, carry_payload = carry
        carry_mask = pa.array(~valid & (k[left_mask] == carry_key))
    for name, typ in right_cols:
        taken = t.column(name).take(take_idx)
        if carry_mask is not None and carry is not None and carry[1] is not None:
            taken = pc.if_else(
                carry_mask, pa.scalar(carry[1][name], typ), taken
            )
        cols[name] = taken.cast(typ)
    return pa.table(cols, schema=out_schema)


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
):
    """As-of join two Datasets; returns a Dataset with one row per left
    row: left's columns plus ``right_payload`` columns from the latest
    right row with equal ``key`` and right_ts <= left_ts (null if
    none). ``tiebreak`` (a right column, int-castable) breaks duplicate
    right (key, ts) pairs deterministically: the largest wins.

    ``right_payload`` names must be disjoint from the left side's
    columns (rename upstream, as intervals.py also requires) — the two
    sides share one output row.
    """
    import ray
    import ray.data

    overlap = set(right_payload) & ({key, left_ts} | set(left_ds.schema().names))
    if overlap:
        raise ValueError(
            f"right_payload collides with left columns: {sorted(overlap)}"
        )

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    key_type = l_schema.base_schema.field(key).type
    left_ts_type = l_schema.base_schema.field(left_ts).type
    left_cols = [
        (n, l_schema.base_schema.field(n).type)
        for n in l_schema.names
        if n not in (key, left_ts)
    ]
    right_cols = [
        (n, r_schema.base_schema.field(n).type)
        for n in right_payload
    ]

    tagged_l = left_ds.map_batches(
        lambda b: _tag_side(b, key, left_ts, 1, None, left_cols, right_cols),
        batch_format="pyarrow",
    )
    tagged_r = right_ds.map_batches(
        lambda b: _tag_side(b, key, right_ts, 0, tiebreak, left_cols, right_cols),
        batch_format="pyarrow",
    )
    srt = tagged_l.union(tagged_r).sort([_K, _TS, _SIDE, _TIE]).materialize()

    refs = srt.to_arrow_refs()
    part_task = ray.remote(_block_partial)
    partials = ray.get([part_task.remote(ref, right_cols) for ref in refs])

    # O(blocks) driver fold of the carry chain
    carries: list[tuple | None] = []
    state: tuple | None = None
    for p in partials:
        carries.append(state)
        if p is None:
            continue
        if p["payload"] is not None:
            state = (p["last_key"], p["payload"])
        elif state is not None and state[0] == p["last_key"]:
            pass  # key continues with no new right rows: carry flows
        else:
            state = None  # keys advanced past the carried key

    resolve = ray.remote(_resolve_block)
    out_refs = [
        resolve.remote(
            ref, carries[i], key, key_type, left_cols, right_cols,
            left_ts, left_ts_type,
        )
        for i, ref in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out_refs)
