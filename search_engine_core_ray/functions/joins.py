"""Threshold-gated broadcast vs distributed joins.

The reference's lookups are all hash-map probes against a small side
(SURVEY.md §2.5: term->df, domain->rules, visited-set anti-join), so
the broadcast shape — ``ray.put`` the key set once, probe inside
``map_batches`` — is the sanctioned default.  But "small by
definition" is only true at one scale: TPC-H customer/orders and the
dedup seen-sets grow with sf, and an unguarded ``to_pandas()`` of
them is a driver OOM at 100 TB.  Every helper here therefore COUNTS
the distinct key side first (a distributed aggregate, O(1) driver
rows) and only broadcasts under ``BROADCAST_ROW_LIMIT``; above it the
work routes to Ray's distributed hash join (``left_semi`` /
``left_anti`` / ``inner``) and nothing corpus-proportional ever lands
on the driver.

Both paths are value-identical (conformance-tested with a forced
limit=0 in tests/test_gated_joins.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ~16 MB of int64 keys: one object-store copy per node, read (not
# re-shipped) by every task.  Far under worker-heap size, far over
# every genuine dimension table.
BROADCAST_ROW_LIMIT = 2_000_000


def _distinct_keys(ds, col: str):
    """Materialized Dataset of the distinct values of ``col`` —
    distributed (sorted_distinct above AUTO_THRESHOLD rows), never a
    driver-side set()."""
    from ..stages.shuffle import AUTO_THRESHOLD, sorted_distinct

    narrowed = ds.map_batches(
        lambda b: b.select([col]), batch_format="pyarrow"
    )
    return sorted_distinct(narrowed, col, auto_threshold=AUTO_THRESHOLD).materialize()


def _collect_key_array(kd, col: str) -> pa.Array | None:
    """Pull an under-limit distinct-key Dataset to one Arrow array
    (sorted, for deterministic is_in probes); None when empty — an
    empty Dataset has no schema to type an empty array from."""
    chunks = [
        b.column(col)
        for b in kd.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not chunks:
        return None
    arr = pa.chunked_array(chunks).combine_chunks()
    return arr.take(pc.array_sort_indices(arr))


def semi_or_anti_join(
    left,
    on: str,
    keys,
    keys_on: str,
    *,
    anti: bool = False,
    num_partitions: int = 8,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
):
    """Rows of ``left`` whose ``on`` value IS (semi) / is NOT (anti)
    present in ``keys[keys_on]`` (``keys`` need not be distinct).

    Under ``broadcast_limit`` distinct keys: broadcast probe
    (``ray.put`` once + ``pc.is_in`` per batch).  Above: Ray
    ``left_semi`` / ``left_anti`` hash join, followed by a repartition
    that merges the join's schema-less empty partitions (the Acero
    key-resolution hazard stages/dedup.py documents).
    """
    import ray

    kd = _distinct_keys(keys, keys_on)
    if kd.count() <= broadcast_limit:
        ref = ray.put(_collect_key_array(kd, keys_on))

        def flt(b: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            if ks is None:  # empty key set: semi keeps nothing, anti all
                return b if anti else b.slice(0, 0)
            m = pc.is_in(b.column(on), value_set=ks)
            return b.filter(pc.invert(m) if anti else m)

        return left.map_batches(flt, batch_format="pyarrow")

    if keys_on != on:
        kd = kd.map_batches(
            lambda b, _k=keys_on, _o=on: b.rename_columns([_o]),
            batch_format="pyarrow",
        )
    joined = left.join(
        kd,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
    )
    return joined.repartition(num_partitions)


def gated_lookup(
    right,
    key: str,
    value_cols: list[str],
    *,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    byte_limit: int | None = None,
):
    """Prepare a small-side lookup for a map-side join: returns either
    ``("broadcast", ObjectRef[pa.Table])`` when the right side fits
    under ``broadcast_limit`` rows (and ``byte_limit`` bytes, when
    given — row counts are the wrong gate for wide binary payload
    columns), or ``("dataset", Dataset)`` when it must go through a
    distributed hash join.  Callers implement the two probe shapes
    (polars per-batch join vs ``Dataset.join``) — the helper just owns
    the counting discipline so no caller collects an unbounded table
    on the driver.
    """
    import ray

    right = right.materialize()
    fits = right.count() <= broadcast_limit
    if fits and byte_limit is not None:
        fits = (right.size_bytes() or 0) <= byte_limit
    if fits:
        tbl = pa.concat_tables(
            [
                b.select([key] + value_cols)
                for b in right.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows
            ]
        ) if right.count() else pa.table(
            {c: pa.array([]) for c in [key] + value_cols}
        )
        return "broadcast", ray.put(tbl.combine_chunks())
    return "dataset", right


def gated_left_join(
    left,
    on: str,
    right,
    right_on: str,
    value_cols: list[str],
    *,
    num_partitions: int = 8,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    byte_limit: int | None = None,
):
    """LEFT OUTER join ``left`` with ``right[[right_on] + value_cols]``
    under the same counting discipline as :func:`gated_lookup`: a right
    side under the limits is broadcast once (``ray.put``) and probed
    with a per-batch polars left join (zero exchanges); above them the
    work routes to Ray's distributed ``left_outer`` hash join, followed
    by the schema-merging repartition the other join helpers apply
    (Acero emits schema-less blocks for empty hash partitions).

    Missing right rows yield nulls in ``value_cols`` — callers fill.
    """
    import polars as pl

    import ray

    narrowed = right.map_batches(
        lambda b, _c=[right_on] + list(value_cols): b.select(_c),
        batch_format="pyarrow",
    )
    mode, side = gated_lookup(
        narrowed, right_on, list(value_cols),
        broadcast_limit=broadcast_limit, byte_limit=byte_limit,
    )
    if mode == "broadcast":

        def attach(b: pa.Table) -> pa.Table:
            from ..stages.shuffle import _unlarge

            lut = pl.from_arrow(ray.get(side))
            if right_on != on:
                lut = lut.rename({right_on: on})
            return _unlarge(pl.from_arrow(b).join(lut, on=on, how="left").to_arrow())

        return left.map_batches(attach, batch_format="pyarrow")

    if right_on == on:
        rds = side
    else:
        rds = side.map_batches(
            lambda b, _f=right_on, _t=on: b.rename_columns(
                [_t if c == _f else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    return left.join(
        rds, join_type="left_outer", num_partitions=num_partitions, on=(on,)
    ).repartition(num_partitions)
