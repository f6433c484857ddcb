"""sorted_agg (stages/shuffle.py) conformance: sort-partitioned
vectorized aggregation must equal a local polars groupby, including
when one key's rows straddle sorted block boundaries (forced by a
massively-hot key) and when aggregates mix sum/min/max/count."""

import numpy as np
import polars as pl
import pyarrow as pa
import pytest

from search_engine_core_ray.stages.shuffle import sorted_agg


def _check(ray, tbl: pa.Table, key: str, aggs: dict, n_blocks: int):
    import ray.data

    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    got = (
        sorted_agg(ds, key, aggs)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exprs = []
    for out, (agg, col) in aggs.items():
        e = {"sum": pl.col(col).sum(), "min": pl.col(col).min(),
             "max": pl.col(col).max(), "count": pl.len().cast(pl.Int64)}[agg]
        exprs.append(e.alias(out))
    want = (
        pl.from_arrow(tbl)
        .group_by(key)
        .agg(exprs)
        .sort(key)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert list(got.columns)[0] == key
    got = got[want.columns]
    assert got.equals(want.astype(got.dtypes.to_dict())), (
        f"\ngot:\n{got}\nwant:\n{want}"
    )


def test_sorted_agg_random_keys(ray_session):
    rng = np.random.default_rng(7)
    N = 20_000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 3_000, N), pa.int64()),
            "v": pa.array(rng.integers(-50, 50, N), pa.int64()),
            "d": pa.array(rng.integers(0, 100, N), pa.int64()),
        }
    )
    _check(
        ray_session, tbl, "k",
        {"total": ("sum", "v"), "owner": ("min", "d"),
         "hi": ("max", "v"), "rows": ("count", "v")},
        n_blocks=7,
    )


def test_sorted_agg_hot_key_straddles_blocks(ray_session):
    # one key holds 90% of rows -> guaranteed to span several sorted
    # blocks; its partials must merge exactly once
    rng = np.random.default_rng(8)
    N = 10_000
    k = np.where(rng.random(N) < 0.9, 42, rng.integers(0, 50, N))
    tbl = pa.table(
        {
            "k": pa.array(k, pa.int64()),
            "v": pa.array(np.ones(N, np.int64), pa.int64()),
        }
    )
    _check(
        ray_session, tbl, "k",
        {"total": ("sum", "v"), "rows": ("count", "v")}, n_blocks=9,
    )


def test_sorted_agg_single_key_and_tiny(ray_session):
    tbl = pa.table(
        {"k": pa.array([5, 5, 5], pa.int64()), "v": pa.array([1, 2, 3], pa.int64())}
    )
    _check(ray_session, tbl, "k", {"total": ("sum", "v")}, n_blocks=3)


def test_sorted_agg_rejects_unknown_agg(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        sorted_agg(ds, "k", {"o": ("median", "v")})


def test_sorted_agg_auto_paths_identical(ray_session):
    # auto_threshold above the row count -> Ray groupby path; below ->
    # sorted path. Both must emit identical rows.
    import ray.data

    rng = np.random.default_rng(11)
    N = 5_000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 800, N), pa.int64()),
            "v": pa.array(rng.integers(0, 9, N), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    aggs = {"total": ("sum", "v"), "rows": ("count", "v"), "lo": ("min", "v")}
    via_ray = (
        sorted_agg(ds, "k", aggs, auto_threshold=N + 1)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    via_sorted = (
        sorted_agg(ds, "k", aggs, auto_threshold=0)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(via_ray.columns) == list(via_sorted.columns)
    assert via_ray.equals(via_sorted.astype(via_ray.dtypes.to_dict()))


def test_sorted_agg_rejects_null_keys(ray_session):
    # nulls in a key column would make the boundary comparisons null
    # and silently drop whole groups — the primitive must fail loudly
    # (Ray's own sort machinery may raise first; either error is fine,
    # silence is not)
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, None, 2], pa.int64()),
                "v": pa.array([1, 1, 1], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception):
        sorted_agg(ds, "k", {"total": ("sum", "v")}).take_all()


def test_sorted_agg_property_random_tables(ray_session):
    # hypothesis sweep: arbitrary key/value distributions, both engines
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(1, 400),
        key_space=st.integers(1, 50),
        blocks=st.integers(1, 6),
        seed=st.integers(0, 2**16),
    )
    def check(n, key_space, blocks, seed):
        import ray.data

        rng = np.random.default_rng(seed)
        tbl = pa.table(
            {
                "k": pa.array(rng.integers(0, key_space, n), pa.int64()),
                "v": pa.array(rng.integers(-9, 9, n), pa.int64()),
            }
        )
        got = (
            sorted_agg(
                ray.data.from_arrow(tbl).repartition(blocks),
                "k",
                {"total": ("sum", "v"), "lo": ("min", "v"), "rows": ("count", "v")},
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        want = (
            pl.from_arrow(tbl)
            .group_by("k")
            .agg(
                pl.col("v").sum().alias("total"),
                pl.col("v").min().alias("lo"),
                pl.len().cast(pl.Int64).alias("rows"),
            )
            .sort("k").to_pandas().reset_index(drop=True)
        )
        got = got[want.columns]
        assert got.equals(want.astype(got.dtypes.to_dict()))

    check()


def test_grouped_topk_matches_local_oracle(ray_session):
    """grouped_topk over many small blocks (groups straddle every
    block) == a local polars window top-k, including the rank column
    and tiebreaks on equal order values."""
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import grouped_topk

    rng = np.random.RandomState(7)
    n = 5000
    tbl = pa.table(
        {
            "g": pa.array([f"g{i % 13}" for i in range(n)]),
            "v": pa.array(rng.randint(0, 40, n), pa.int64()),  # many ties
            "u": pa.array([f"u{rng.randint(0, 10**6):06d}-{i}" for i in range(n)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(23)
    got = (
        grouped_topk(ds, "g", "v", 4, tiebreak_cols=["u"], emit_rank="rk")
        .to_pandas()
        .sort_values(["g", "rk"], ignore_index=True)
    )
    exp = (
        pl.from_arrow(tbl)
        .sort(["v", "u"], descending=[True, False])
        .with_columns(pl.col("v").cum_count().over("g").cast(pl.Int64).alias("rk"))
        .filter(pl.col("rk") <= 4)
        .to_pandas()
        .sort_values(["g", "rk"], ignore_index=True)
    )
    assert got[["g", "v", "u", "rk"]].values.tolist() == exp[["g", "v", "u", "rk"]].values.tolist()


def test_exact_int_quantiles_matches_local_rule(ray_session):
    """exact_int_quantiles == the local min-v-with-cum>=ceil(pN/100)
    rule on random skewed ints, across many blocks."""
    import ray.data

    from search_engine_core_ray.stages.shuffle import exact_int_quantiles

    rng = np.random.default_rng(7)
    vals = rng.zipf(1.7, size=20_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(13)
    got = {
        r["pct"]: r["value"]
        for r in exact_int_quantiles(ds, "x", [1, 25, 50, 75, 95, 99, 100]).take_all()
    }
    s = np.sort(vals)
    n = len(s)
    for p, v in got.items():
        rank = (p * n + 99) // 100
        assert v == s[rank - 1], (p, v, s[rank - 1])
    assert got[100] == s[-1] and got[1] == s[(1 * n + 99) // 100 - 1]


def test_exact_int_quantiles_empty(ray_session):
    import ray.data

    from search_engine_core_ray.stages.shuffle import exact_int_quantiles

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert exact_int_quantiles(ds, "x", [50]).take_all() == []


# ------------------------------------------------------- keyed_row_number


def test_keyed_row_number_matches_window_oracle(ray_session):
    import random

    import polars as pl
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import keyed_row_number

    rng = random.Random(3)
    n = 5000
    t = pa.table(
        {"domain": [f"d{rng.randint(0, 6)}" for _ in range(n)],   # hot keys
         "url": [f"u{i:05d}" for i in rng.sample(range(100000), n)]}
    )
    out = keyed_row_number(
        ray.data.from_arrow(t).repartition(13), "domain", ["url"], "rn"
    ).to_pandas()
    ref = (
        pl.from_arrow(t)
        .sort(["domain", "url"])
        .with_columns(pl.col("url").cum_count().over("domain").cast(pl.Int64).alias("rn"))
        .to_pandas()
    )
    cols = ["domain", "url"]
    assert out.sort_values(cols, ignore_index=True).equals(
        ref.sort_values(cols, ignore_index=True)
    )


def test_keyed_row_number_single_key_chain(ray_session):
    # ONE key spanning every block: the driver chain accumulation is
    # the whole answer
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import keyed_row_number

    t = pa.table({"k": ["x"] * 1000, "o": [f"{i:04d}" for i in range(1000)]})
    out = keyed_row_number(
        ray.data.from_arrow(t).repartition(9), "k", ["o"], "rn"
    ).to_pandas().sort_values("o", ignore_index=True)
    assert out["rn"].tolist() == list(range(1, 1001))


def test_keyed_row_number_integer_order_column(ray_session):
    # regression: block metadata must order by TYPED values — a
    # stringified sort would place 10 before 2 and misnumber chains
    import polars as pl
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import keyed_row_number

    n = 3000
    t = pa.table(
        {"host": [f"h{i % 3}" for i in range(n)],
         "priority": list(range(n))}  # int order column spanning blocks
    )
    out = keyed_row_number(
        ray.data.from_arrow(t).repartition(11), "host", ["priority"], "rn"
    ).to_pandas()
    ref = (
        pl.from_arrow(t)
        .sort(["host", "priority"])
        .with_columns(
            pl.col("priority").cum_count().over("host").cast(pl.Int64).alias("rn")
        )
        .to_pandas()
    )
    cols = ["host", "priority"]
    assert out.sort_values(cols, ignore_index=True).equals(
        ref.sort_values(cols, ignore_index=True)
    )


def test_keyed_exact_int_quantiles_vs_polars(ray_session):
    import random

    import polars as pl
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import keyed_exact_int_quantiles

    rng = random.Random(8)
    n = 4000
    t = pa.table(
        {"k": [f"k{rng.randint(0, 5)}" for _ in range(n)],
         "v": [rng.randint(0, 300) for _ in range(n)]}
    )
    pcts = [25, 50, 75, 95, 99]
    out = keyed_exact_int_quantiles(
        ray.data.from_arrow(t).repartition(7), "k", "v", pcts
    ).to_pandas().set_index(["k", "pct"]).sort_index()
    df = pl.from_arrow(t)
    for (kv,), g in df.group_by(["k"]):
        vals = sorted(g["v"].to_list())
        nn = len(vals)
        for p in pcts:
            rank = (p * nn + 99) // 100
            want = vals[max(rank - 1, 0)]
            assert out.loc[(kv, p), "value"] == want, (kv, p)


def test_keyed_exact_int_quantiles_integer_key(ray_session):
    # the primitive must carry the key dtype through (not assume string)
    import random

    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.shuffle import keyed_exact_int_quantiles

    rng = random.Random(12)
    t = pa.table(
        {"kid": [rng.randint(0, 4) for _ in range(2000)],
         "v": [rng.randint(0, 99) for _ in range(2000)]}
    )
    out = keyed_exact_int_quantiles(
        ray.data.from_arrow(t).repartition(5), "kid", "v", [50]
    ).to_pandas()
    assert out["kid"].dtype.kind in "il" and len(out) == 5
    assert ((out["value"] >= 0) & (out["value"] <= 99)).all()
