"""High-cardinality aggregation primitive: sort-partitioned vectorized
group-aggregate.

Ray Data's ``groupby(key).aggregate(...)`` pays a Python-level
per-group combine in its reduce phase — measured ~5-7 s for ~200k
groups on this host where the underlying ``Dataset.sort`` alone takes
~0.1 s.  For operators whose group count is proportional to the corpus
(window keys, shingle hashes, content digests, line strings, candidate
pairs), that per-group cost IS the operator's wall time, so this module
provides the classic alternative:

  1. ``sort(keys)`` — one range exchange; blocks get disjoint key
     ranges with every key's rows contiguous (possibly straddling a
     block boundary);
  2. one whole-block map runs a VECTORIZED polars group_by per block —
     per-group cost is a Rust hash-table insert, not a Python call;
  3. rows whose key tuple equals the block's first or last sorted key
     might continue in a neighboring block, so their PARTIALS (<= 2
     keys per block) are merged in a driver-side pass — O(blocks)
     rows, never O(groups) — and unioned back with the interior rows.

Supported aggregates are the mergeable ones whose partial and final
forms coincide: sum, min, max, count (count partials merge by sum).
That covers the corpus-statistics shapes this repo needs; anything
fancier should pre-combine map-side and live with the small-group
``groupby``.  The cardinality rule (measured both ways in BASELINE.md):
BOUNDED key spaces (trigram vocab, a handful of segments) stay on
Ray's groupby; corpus-proportional key spaces come here.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

import numpy as np
import polars as pl
import pyarrow as pa

def _unlarge(t: pa.Table) -> pa.Table:
    """polars emits large_string/large_binary; Acero joins refuse to
    match them against the plain variants ("no match or multiple
    matches for key field") — normalize every column back."""
    fields = []
    changed = False
    for f in t.schema:
        if pa.types.is_large_string(f.type):
            fields.append(pa.field(f.name, pa.string()))
            changed = True
        elif pa.types.is_large_binary(f.type):
            fields.append(pa.field(f.name, pa.binary()))
            changed = True
        else:
            fields.append(f)
    return t.cast(pa.schema(fields)) if changed else t


# agg name -> (partial polars expr factory, merge polars expr factory)
_AGGS = {
    "sum": (lambda c: pl.col(c).sum(), lambda o: pl.col(o).sum()),
    "min": (lambda c: pl.col(c).min(), lambda o: pl.col(o).min()),
    "max": (lambda c: pl.col(c).max(), lambda o: pl.col(o).max()),
    "count": (lambda c: pl.len().cast(pl.Int64), lambda o: pl.col(o).sum()),
}


# below this many input rows Ray's groupby (one barrier, per-group
# Python) beats the sorted path's ~4 dataset launches; above it the
# per-group cost takes over (measured crossover ~50-100k on this host)
AUTO_THRESHOLD = 100_000


def sorted_agg(
    ds,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    auto_threshold: int | None = None,
):
    """``groupby(keys).aggregate(...)`` for group counts proportional to
    the data: returns a Dataset with one row per distinct key (tuple)
    and one column per ``aggs`` entry ``{out_name: (agg, col)}`` where
    agg is one of sum/min/max/count.

    With ``auto_threshold`` set, the input is materialized and counted:
    at or below the threshold the reduction runs on Ray's groupby
    (lower fixed cost — one barrier vs the sorted path's four dataset
    launches), above it on the sorted path (vectorized per group).
    Both paths produce identical rows (conformance-tested); the switch
    is purely a cost decision, so small-SF benchmarks don't pay the
    sorted path's fixed overhead while corpus-scale inputs never hit
    per-group Python.

    Example::

        sorted_agg(ds, "wkey", {"total": ("sum", "cnt"),
                                "owner": ("min", "doc_id")})
    """
    keys = [key] if isinstance(key, str) else list(key)
    for out, (agg, _c) in aggs.items():
        if agg not in _AGGS:
            raise ValueError(f"unsupported agg {agg!r} for {out!r}")

    if auto_threshold is not None:
        ds = ds.materialize()
        if ds.count() <= auto_threshold:
            from ray.data.aggregate import Count, Max, Min, Sum

            ray_aggs = []
            for out, (agg, col) in aggs.items():
                cls = {"sum": Sum, "min": Min, "max": Max}.get(agg)
                ray_aggs.append(
                    Count(alias_name=out) if cls is None
                    else cls(col, alias_name=out)
                )
            # repartition: Ray's sort-based aggregate emits schema-less
            # blocks for empty partitions (same hazard as below); the
            # output is <= threshold rows, so cap the block count — a
            # many-block tiny table taxes every downstream join/barrier
            return (
                ds.groupby(keys[0] if len(keys) == 1 else keys)
                .aggregate(*ray_aggs)
                .repartition(max(1, min(ds.num_blocks(), 16)))
            )

    partial_exprs = [
        _AGGS[agg][0](col).alias(out) for out, (agg, col) in aggs.items()
    ]
    merge_exprs = [
        _AGGS[agg][1](out).alias(out) for out, (agg, _c) in aggs.items()
    ]

    # no materialize: the sort output streams into its single consumer
    # (block_agg); only the PARTIALS — the groups-sized table consumed
    # twice (interior filter + edge take_all) — need pinning below
    srt = ds.sort(keys)

    def block_agg(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        for kc in keys:
            # Ray's sort usually dies on null keys already (TypeError in
            # sort_and_partition for string keys); when one sneaks
            # through, the boundary comparisons below would evaluate to
            # null and SILENTLY DROP every group in the block — fail
            # loudly instead
            if df[kc].null_count():
                raise ValueError(
                    f"sorted_agg: null values in key column {kc!r} are "
                    "not supported — filter or fill them upstream"
                )
        g = df.group_by(keys).agg(partial_exprs)
        if len(g) == 0:  # empty block: 0 rows, correct schema
            return _unlarge(g.with_columns(_boundary=pl.lit(True)).clear().to_arrow())
        gs = g.sort(keys)
        first, last = gs.head(1), gs.tail(1)
        is_first = reduce(and_, (pl.col(k) == first[k][0] for k in keys))
        is_last = reduce(and_, (pl.col(k) == last[k][0] for k in keys))
        return _unlarge(gs.with_columns(_boundary=is_first | is_last).to_arrow())

    partials = srt.map_batches(
        block_agg, batch_format="pyarrow", batch_size=None
    ).materialize()

    import pyarrow.compute as pc

    interior = partials.map_batches(
        lambda b: b.filter(pc.equal(b.column("_boundary"), False)).drop_columns(
            ["_boundary"]
        ),
        batch_format="pyarrow",
    )
    # <= 2 keys per block: O(blocks) rows through the driver, by design
    edge_rows = partials.map_batches(
        lambda b: b.filter(pc.equal(b.column("_boundary"), True)).drop_columns(
            ["_boundary"]
        ),
        batch_format="pyarrow",
    ).take_all()
    # Ray's sort emits SCHEMA-LESS blocks for empty range partitions;
    # those BYPASS every map UDF above and would surface in the output,
    # where they break Acero join key resolution on the consumer side
    # ("no match or multiple matches for key field").  A repartition
    # merges them away — a linear split/merge of the already-aggregated
    # (groups-sized) table, not a hash exchange.
    n_out = max(1, partials.num_blocks())
    if not edge_rows:
        return interior.repartition(n_out)
    import ray.data

    # build the edge table with the partials' EXPLICIT schema —
    # pl.from_dicts would re-infer dtypes (an Int32/UInt64 value column
    # or an all-null aggregate would mismatch the interior blocks on
    # union()); cast back after the merge for the same reason (polars
    # upcasts small-int sums)
    out_schema = pa.schema(
        [f for f in partials.schema().base_schema if f.name != "_boundary"]
    )
    edge_tbl = pa.Table.from_pylist(edge_rows, schema=out_schema)
    merged = _unlarge(
        pl.from_arrow(edge_tbl)
        .group_by(keys)
        .agg(merge_exprs)
        .select(out_schema.names)
        .to_arrow()
    ).cast(out_schema)
    edge_ds = ray.data.from_arrow(merged)
    return interior.union(edge_ds).repartition(n_out)


def sorted_distinct(ds, key: str | list[str], auto_threshold: int | None = None):
    """DISTINCT over corpus-proportional keys: one row per distinct key
    (tuple), dropping all other columns — same machinery as
    ``sorted_agg``, so per-group cost stays vectorized."""
    keys = [key] if isinstance(key, str) else list(key)
    out = sorted_agg(
        ds, keys, {"_n": ("count", keys[0])}, auto_threshold=auto_threshold
    )
    return out.map_batches(
        lambda b: b.drop_columns(["_n"]), batch_format="pyarrow"
    )


def grouped_topk(
    ds,
    group_cols: str | list[str],
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    emit_rank: str | None = None,
):
    """Per-group top-k WITHOUT a global sort: every batch keeps at most
    k rows per group (vectorized polars partial), partials fold down to
    one block, and a final identical pass cuts the exact answer.  Ties
    are broken by ``tiebreak_cols`` ascending (default: all remaining
    group-invariant determinism is the caller's job — pass an explicit
    unique tiebreak for engine-exact output).  ``emit_rank`` adds a
    1-based dense position column.

    Cardinality contract: the FOLD step concentrates <= groups * k rows
    into one block, so this primitive is for BOUNDED group counts
    (domains, languages, shards — the reference's per-domain shapes).
    A corpus-proportional group count should instead sort by
    (group, order) and boundary-merge like sorted_agg; no caller here
    needs that yet.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    ties = list(tiebreak_cols or [])
    by = [order_col] + ties
    desc = [descending] + [False] * len(ties)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return _unlarge(
            pl.from_arrow(b)
            .sort(by, descending=desc, maintain_order=True)
            .group_by(groups, maintain_order=True)
            .head(k)
            .to_arrow()
        )

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    folded = pruned.repartition(1).map_batches(partial, batch_format="pyarrow")
    if emit_rank is None:
        return folded

    def with_rank(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return _unlarge(
            pl.from_arrow(b)
            .sort(by, descending=desc, maintain_order=True)
            .with_columns(
                pl.col(order_col).cum_count().over(groups).cast(pl.Int64).alias(emit_rank)
            )
            .to_arrow()
        )

    return folded.map_batches(with_rank, batch_format="pyarrow")


def exact_int_quantiles(ds, col: str, pcts: list[int]):
    """Exact percentiles of an integer column, distributed: per-batch
    value-count combine (map-side), a ``sorted_agg`` reduce over the
    DISTINCT VALUE DOMAIN, then the rank selection on the domain-sized
    histogram.  Returns a Dataset of (pct int64, value int64).

    Percentile rule (mirrored by the SQL oracle's window cumsum):
    value(p) = min v such that cum_count(v) >= ceil(p * N / 100),
    with ceil done in exact integer arithmetic ((p*N + 99) // 100) —
    no float enters the computation at all, so the result is
    bit-exact by construction.

    100-TB shape: exchange rows per block = DISTINCT values in the
    block, never row count; the one driver-side collect is the merged
    histogram, bounded by the VALUE DOMAIN (for doc token lengths,
    max-tokens-per-doc distinct values — thousands — independent of
    corpus row count).  For unbounded/continuous domains bucket the
    value first; this primitive is for genuinely domain-bounded ints.
    """
    empty = pa.table(
        {"v": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        part = (
            pl.from_arrow(b.select([col]))
            .rename({col: "v"})
            .group_by("v")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return _unlarge(part.with_columns(pl.col("v").cast(pl.Int64)).to_arrow())

    merged = sorted_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        "v",
        {"cnt": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    )
    rows = merged.take_all()  # domain-bounded, by contract above
    rows.sort(key=lambda r: r["v"])
    vals = [r["v"] for r in rows]
    cum = []
    run = 0
    for r in rows:
        run += r["cnt"]
        cum.append(run)
    n = run
    import ray.data

    if n == 0:  # empty input: no percentile is defined
        return ray.data.from_arrow(
            pa.table(
                {"pct": pa.array([], pa.int64()), "value": pa.array([], pa.int64())}
            )
        )
    out_p, out_v = [], []
    for p in pcts:
        rank = (p * n + 99) // 100
        idx = next(i for i, c in enumerate(cum) if c >= rank)
        out_p.append(int(p))
        out_v.append(int(vals[idx]))
    return ray.data.from_arrow(
        pa.table(
            {"pct": pa.array(out_p, pa.int64()), "value": pa.array(out_v, pa.int64())}
        )
    )


def keyed_row_number(ds, key: str, order: list[str], out_col: str = "rn"):
    """Distributed ``row_number() OVER (PARTITION BY key ORDER BY
    order)`` for CORPUS-PROPORTIONAL key counts — the window primitive
    behind per-domain crawl scheduling, per-host sampling quotas, etc.

    ``order`` must make (key, *order) a TOTAL order (include a unique
    tiebreak column): ties that straddle a block boundary would
    otherwise be numbered by physical placement.

    Shape (the sequence_pack prefix-scan pattern, O(blocks) driver
    rows): sort by (key, *order) and materialize (pins block ranges);
    ONE whole-block pass emits per-block (first/last key, first/last
    key row counts) — two keys per block no matter how many rows;
    the driver walks blocks in sort order accumulating the running
    count of the boundary-straddling key (a key chained across many
    blocks accumulates, a key contained in one block needs no offset
    at all); a second whole-block pass over the SAME pinned blocks
    adds the broadcast base to the within-block vectorized cum_count.
    """
    import ray

    sort_cols = [key] + list(order)
    srt = ds.sort(sort_cols).materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        # first-row sort VALUES ride along TYPED (first_<col> columns):
        # the driver must order blocks and key the base map by the real
        # values — stringified keys would sort '10' before '2' for int
        # order columns and silently misnumber chained keys
        if b.num_rows == 0:
            cols = {f"first_{c}": b.column(c).slice(0, 0) for c in sort_cols}
            cols["last_key"] = b.column(key).slice(0, 0)
            cols["first_cnt"] = pa.array([], pa.int64())
            cols["last_cnt"] = pa.array([], pa.int64())
            return pa.table(cols)
        t = pl.from_arrow(b.select(sort_cols))
        fk = t[key][0]
        lk = t[key][-1]
        cols = {f"first_{c}": b.column(c).slice(0, 1) for c in sort_cols}
        cols["last_key"] = b.column(key).slice(b.num_rows - 1, 1)
        cols["first_cnt"] = pa.array([int((t[key] == fk).sum())], pa.int64())
        cols["last_cnt"] = pa.array([int((t[key] == lk).sum())], pa.int64())
        return pa.table(cols)

    # O(blocks) rows through the driver, by design
    metas = srt.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    metas.sort(key=lambda r: tuple(r[f"first_{c}"] for c in sort_cols))
    bases: dict[tuple, int] = {}
    running_key: object = object()  # sentinel: matches no real key
    running_cnt = 0
    for blk in metas:
        head = tuple(blk[f"first_{c}"] for c in sort_cols)
        first_key = blk[f"first_{key}"]
        base = running_cnt if first_key == running_key else 0
        if head in bases:
            raise ValueError(
                "keyed_row_number: duplicate block head sort key — "
                "`order` does not make (key, *order) a total order"
            )
        bases[head] = base
        if blk["last_key"] == first_key:
            running_key = first_key
            running_cnt = base + blk["first_cnt"]
        else:
            running_key = blk["last_key"]
            running_cnt = blk["last_cnt"]
    bases_ref = ray.put(bases)

    def add_rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        base_map = ray.get(bases_ref)
        head = tuple(b.column(c)[0].as_py() for c in sort_cols)
        base = base_map[head]  # KeyError = fail loudly
        t = pl.from_arrow(b)
        fk = t[key][0]
        t = t.with_columns(
            (
                pl.col(key).cum_count().over(key).cast(pl.Int64)
                + pl.when(pl.col(key) == fk).then(base).otherwise(0)
            ).alias(out_col)
        )
        return _unlarge(t.to_arrow())

    return srt.map_batches(add_rn, batch_format="pyarrow", batch_size=None)


def keyed_exact_int_quantiles(ds, key: str, col: str, pcts: list[int]):
    """Per-KEY exact integer percentiles — ``exact_int_quantiles``
    generalized over a corpus-proportional key column.  Returns a
    Dataset of (key, pct int64, value int64) with the same rank rule
    (value(p) = min v with cum_count >= ceil(p*n_key/100), pure-int
    ceil), so the DuckDB window-cumsum oracle is bit-exact.

    Shape: per-batch (key, v) partial histograms -> ONE sorted_agg over
    the composite (key, v) — exchange rows bounded by keys x distinct
    values, never raw row count; per-key totals ride the same exchange
    (summing the histogram per key); the selection runs inside
    groupby(key).map_groups where each group is VALUE-DOMAIN-bounded
    (the exact_int_quantiles contract, per key)."""
    import ray.data

    def hist(b: pa.Table) -> pa.Table:
        # key dtype is whatever the input carries (string, int, ...);
        # derive the empty-batch schema from the batch itself so blocks
        # never disagree
        if b.num_rows == 0:
            return pa.table(
                {key: b.column(key).slice(0, 0),
                 "v": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        part = (
            pl.from_arrow(b.select([key, col]))
            .rename({col: "v"})
            .group_by([key, "v"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return _unlarge(part.with_columns(pl.col("v").cast(pl.Int64)).to_arrow())

    merged = sorted_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        [key, "v"],
        {"cnt": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    )
    pcts_arr = sorted(int(p) for p in pcts)

    def select(g: pa.Table) -> pa.Table:
        t = pl.from_arrow(g).sort("v")
        v = t["v"].to_numpy()
        cnt = t["cnt"].to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out_p, out_v = [], []
        for p in pcts_arr:
            rank = (p * n + 99) // 100  # exact-int ceil(p*n/100)
            i = int(np.searchsorted(cum, rank))
            out_p.append(p)
            out_v.append(int(v[min(i, len(v) - 1)]))
        # key column keeps the INPUT dtype (take row 0, repeat)
        kcol = g.column(key).take(pa.array([0] * len(out_p), pa.int64()))
        return pa.table(
            {key: kcol,
             "pct": pa.array(out_p, pa.int64()),
             "value": pa.array(out_v, pa.int64())}
        )

    return merged.groupby(key).map_groups(select, batch_format="pyarrow")
