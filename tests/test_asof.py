"""asof_join primitive: carry-chain across blocks, <= inclusivity,
tiebreak determinism, and the no-match null path — against a tiny
brute-force Python oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from search_engine_core_ray.stages.asof import asof_join


def _brute(left, right):
    """Oracle: latest right (ts <= lts); ties on ts -> largest tie."""
    out = []
    for lk, lts, lid in left:
        best = None
        for rk, rts, tie, pay in right:
            if rk == lk and rts <= lts:
                cand = (rts, tie, pay)
                if best is None or cand[:2] > best[:2]:
                    best = cand
        out.append((lid, best[2] if best else None))
    return dict(out)


def _run(left, right, n_blocks=7):
    lds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in left], pa.int64()),
                "ts": pa.array([r[1] for r in left], pa.int64()),
                "lid": pa.array([r[2] for r in left], pa.int64()),
            }
        )
    ).repartition(n_blocks)
    rds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in right], pa.int64()),
                "rts": pa.array([r[1] for r in right], pa.int64()),
                "tie": pa.array([r[2] for r in right], pa.int64()),
                "pay": pa.array([r[3] for r in right], pa.int64()),
            }
        )
    ).repartition(n_blocks)
    res = asof_join(
        lds, rds, key="k", left_ts="ts", right_ts="rts",
        right_payload=["pay", "tie"], tiebreak="tie",
    ).to_pandas()
    import pandas as pd

    got = {
        int(r.lid): (None if pd.isna(r.pay) else int(r.pay))
        for r in res.itertuples()
    }
    return got, res


def test_hot_key_straddles_blocks(ray_session):
    # one hot key whose single early right row must carry across many
    # sorted blocks of later left rows
    left = [(7, 100 + i, i) for i in range(200)] + [(7, 5, 900)]
    right = [(7, 10, 0, 42)]
    got, res = _run(left, right, n_blocks=11)
    want = _brute(left, right)
    assert got == want
    assert got[900] is None  # left ts=5 predates the only right row
    assert all(got[i] == 42 for i in range(200))


def test_interleaved_keys_and_nulls(ray_session):
    rng = np.random.default_rng(7)
    left = [
        (int(rng.integers(0, 6)), int(rng.integers(0, 50)), i)
        for i in range(300)
    ]
    right = [
        (int(rng.integers(0, 6)), int(rng.integers(0, 50)),
         int(rng.integers(0, 10)), 1000 + i)
        for i in range(40)
    ]
    # key 5 has no right rows at all -> all nulls for it
    right = [r for r in right if r[0] != 5]
    got, _ = _run(left, right, n_blocks=9)
    assert got == _brute(left, right)
    assert any(v is None for k, v in got.items())


def test_equal_ts_inclusive_and_tiebreak(ray_session):
    # right at EXACTLY the left ts must match (<= semantics), and among
    # duplicate (key, ts) right rows the largest tiebreak wins
    left = [(1, 10, 0), (1, 9, 1)]
    right = [(1, 10, 3, 333), (1, 10, 9, 999), (1, 10, 5, 555)]
    got, res = _run(left, right, n_blocks=3)
    assert got[0] == 999
    assert got[1] is None
    # the tie column of the winning row rides along
    row = res[res["lid"] == 0].iloc[0]
    assert int(row["tie"]) == 9


def test_mixed_temporal_units_normalize(ray_session):
    # left timestamp[us] vs right date32: the join must compare in ONE
    # unit (microseconds), not days-vs-us raw int64
    import datetime as dt

    lds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "ts": pa.array(
                    [dt.datetime(1995, 6, 1), dt.datetime(1994, 1, 1)],
                    pa.timestamp("us"),
                ),
                "lid": pa.array([0, 1], pa.int64()),
            }
        )
    )
    rds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "rts": pa.array([dt.date(1995, 1, 1)], pa.date32()),
                "pay": pa.array([7], pa.int64()),
            }
        )
    )
    res = asof_join(
        lds, rds, key="k", left_ts="ts", right_ts="rts",
        right_payload=["pay"],
    ).to_pandas()
    by = {int(r.lid): r.pay for r in res.itertuples()}
    assert by[0] == 7          # 1995-06-01 >= 1995-01-01
    assert by[1] != by[1] or by[1] is None or str(by[1]) == "nan"  # predates
    assert str(res[res.lid == 0]["ts"].dtype).startswith("datetime64")


def test_payload_collision_rejected(ray_session):
    lds = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()),
                  "ts": pa.array([1], pa.int64()),
                  "pay": pa.array([0], pa.int64())})
    )
    rds = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()),
                  "rts": pa.array([1], pa.int64()),
                  "pay": pa.array([9], pa.int64())})
    )
    with pytest.raises(ValueError, match="collides"):
        asof_join(lds, rds, key="k", left_ts="ts", right_ts="rts",
                  right_payload=["pay"])


def test_left_columns_and_ts_preserved(ray_session):
    left = [(2, 7, 11), (3, 8, 12)]
    right = [(2, 7, 0, 21)]
    _, res = _run(left, right, n_blocks=2)
    assert sorted(res.columns) == ["k", "lid", "pay", "tie", "ts"]
    assert set(map(int, res["ts"])) == {7, 8}
    assert len(res) == 2
