"""functions/joins.py conformance: the threshold-gated semi/anti join
and lookup must produce identical rows on BOTH paths — broadcast probe
(under BROADCAST_ROW_LIMIT distinct keys) and Ray's distributed
left_semi/left_anti/inner hash join (forced with broadcast_limit=0)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_core_ray.functions.joins import (
    BROADCAST_ROW_LIMIT,
    gated_lookup,
    semi_or_anti_join,
)


def _mk(ray, n_left=5_000, n_keys=400, seed=3):
    import ray.data

    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 1_000, n_left), pa.int64()),
            "v": pa.array(rng.integers(0, 10_000, n_left), pa.int64()),
        }
    )
    # keys with dupes, overlapping about half the left key space
    keys = pa.table(
        {"kk": pa.array(rng.integers(0, 500, n_keys), pa.int64())}
    )
    return (
        ray.data.from_arrow(left).repartition(6),
        ray.data.from_arrow(keys).repartition(3),
        left,
        keys,
    )


def _rows(ds_or_tbl):
    if isinstance(ds_or_tbl, pa.Table):
        df = ds_or_tbl.to_pandas()
    else:
        df = ds_or_tbl.to_pandas()
    return sorted(map(tuple, df[["k", "v"]].itertuples(index=False)))


@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_paths_identical(ray_session, anti):
    left_ds, keys_ds, left, keys = _mk(ray_session)
    kset = set(keys.column("kk").to_pylist())
    want = sorted(
        (k, v)
        for k, v in zip(
            left.column("k").to_pylist(), left.column("v").to_pylist()
        )
        if ((k not in kset) if anti else (k in kset))
    )

    bcast = semi_or_anti_join(left_ds, "k", keys_ds, "kk", anti=anti)
    assert _rows(bcast) == want

    joined = semi_or_anti_join(
        left_ds, "k", keys_ds, "kk", anti=anti, broadcast_limit=0
    )
    assert _rows(joined) == want


def test_semi_empty_key_set(ray_session):
    import ray.data

    left_ds, _, left, _ = _mk(ray_session)
    empty = ray.data.from_arrow(
        pa.table({"kk": pa.array([], pa.int64())})
    )
    out = semi_or_anti_join(left_ds, "k", empty, "kk")
    assert out.count() == 0
    out_anti = semi_or_anti_join(left_ds, "k", empty, "kk", anti=True)
    assert out_anti.count() == left.num_rows


def test_gated_lookup_modes(ray_session):
    import ray

    _, keys_ds, _, keys = _mk(ray_session)
    mode, side = gated_lookup(keys_ds, "kk", [])
    assert mode == "broadcast"
    tbl = ray.get(side)
    assert tbl.num_rows == keys.num_rows

    mode2, side2 = gated_lookup(keys_ds, "kk", [], broadcast_limit=0)
    assert mode2 == "dataset"
    assert side2.count() == keys.num_rows


def test_limit_is_scale_sane():
    # the gate exists to bound driver/worker heap: a few MB of int64
    assert 100_000 <= BROADCAST_ROW_LIMIT <= 50_000_000


def test_gated_lookup_string_keys_and_missing(ray_session):
    """String-keyed lookup side with missing left keys: the broadcast
    tier must leave misses joinable (null -> caller default), matching
    what mktsegment_revenue's UNKNOWN fill relies on."""
    import polars as pl
    import ray
    import ray.data

    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "b"], pa.string()),
                "v": pa.array(["x", "y"], pa.string()),
            }
        )
    )
    mode, side = gated_lookup(right, "k", ["v"])
    assert mode == "broadcast"
    dim = pl.from_arrow(ray.get(side))
    left = pl.DataFrame({"k": ["a", "c", "b"]})
    out = (
        left.join(dim, on="k", how="left")
        .with_columns(pl.col("v").fill_null("UNKNOWN"))
        .sort("k")
    )
    assert out["v"].to_list() == ["x", "y", "UNKNOWN"]
