"""Distributed range (interval/band) join: all (left, right) pairs of
the same key with right_ts in [left_ts - window, left_ts].

Ray Data has no non-equi join; the scale shape is BUCKET REPLICATION:
carve the time axis into fixed buckets of width == window, send each
left row to its ONE bucket, replicate each right row into the TWO
buckets its match window can straddle (floor(rts/W) and +1), equi-join
on (key, bucket) with the distributed hash join, then filter the exact
band predicate. Every matching pair meets in exactly one bucket (the
left row's), so no post-join dedup is needed — the replication factor
is a hard 2x of the right side, independent of data, and the only
all-to-all is the hash join itself.

100-TB notes: prune both sides to (key, ts, payload) BEFORE calling
(the join moves every byte you pass); replication is 2x the RIGHT side
— put the smaller table on the right. Output size is inherent to the
band predicate (a hot key with k left and m right rows in-window emits
k*m pairs); that is the operator's contract, not a skew accident.
Payload column names must be disjoint across sides (rename upstream);
``key`` must be the same column name on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B = "__iv_bucket"


def _ts_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Normalize temporal columns to int64 MICROSECONDS (a date32 side
    would otherwise bucket days against the other side's microseconds);
    plain integers pass through."""
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


def interval_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
    num_partitions: int = 8,
):
    """Inner band join; returns all left-row x right-row combinations
    with equal ``key`` and ``right_ts`` in ``[left_ts - window_us,
    left_ts]`` (bounds inclusive). Output carries every column of both
    sides (timestamps preserved in their original types)."""
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    w = int(window_us)

    def tag_left(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(left_ts)).to_numpy()
        return b.append_column(_B, pa.array(ts // w, pa.int64()))

    def tag_right(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(right_ts)).to_numpy()
        bkt = ts // w
        two = pa.concat_tables(
            [
                b.append_column(_B, pa.array(bkt, pa.int64())),
                b.append_column(_B, pa.array(bkt + 1, pa.int64())),
            ]
        )
        return two

    joined = (
        left_ds.map_batches(tag_left, batch_format="pyarrow")
        .join(
            right_ds.map_batches(tag_right, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=(key, _B),
        )
        # merge the join's schema-less empty partitions before any map
        .repartition(num_partitions)
    )

    def band_filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # join may emit schema-less empty blocks
            return b.drop_columns([_B]) if _B in b.column_names else b
        lt = _ts_us(b.column(left_ts)).to_numpy(zero_copy_only=False)
        rt = _ts_us(b.column(right_ts)).to_numpy(zero_copy_only=False)
        keep = (rt <= lt) & (rt >= lt - w)
        return b.filter(pa.array(keep)).drop_columns([_B])

    return joined.map_batches(band_filter, batch_format="pyarrow")
