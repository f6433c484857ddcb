"""interval_join primitive: boundary inclusivity, bucket straddling,
no duplicate pairs from the 2x replication — vs a brute-force oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.intervals import interval_join


def _run(left, right, w, n_blocks=5):
    lds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in left], pa.int64()),
                "a_ts": pa.array([r[1] for r in left], pa.int64()),
                "a_id": pa.array([r[2] for r in left], pa.int64()),
            }
        )
    ).repartition(n_blocks)
    rds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in right], pa.int64()),
                "b_ts": pa.array([r[1] for r in right], pa.int64()),
                "b_id": pa.array([r[2] for r in right], pa.int64()),
            }
        )
    ).repartition(n_blocks)
    res = interval_join(
        lds, rds, key="k", left_ts="a_ts", right_ts="b_ts", window_us=w
    ).to_pandas()
    return sorted((int(r.a_id), int(r.b_id)) for r in res.itertuples())


def _brute(left, right, w):
    out = []
    for lk, lt, lid in left:
        for rk, rt, rid in right:
            if rk == lk and lt - w <= rt <= lt:
                out.append((lid, rid))
    return sorted(out)


def test_boundaries_inclusive(ray_session):
    w = 100
    left = [(1, 1000, 0)]
    right = [
        (1, 900, 1),   # exactly window apart -> match
        (1, 899, 2),   # one past -> no
        (1, 1000, 3),  # equal ts -> match
        (1, 1001, 4),  # future -> no
        (2, 950, 5),   # other key -> no
    ]
    assert _run(left, right, w) == [(0, 1), (0, 3)]


def test_bucket_straddle_no_dups(ray_session):
    # pairs whose left and right fall in different W-buckets must still
    # match, and the 2x replication must never emit a pair twice
    w = 100
    left = [(1, 105, 0), (1, 199, 1), (1, 200, 2)]
    right = [(1, 95, 10), (1, 100, 11), (1, 199, 12)]
    got = _run(left, right, w)
    assert got == _brute(left, right, w)
    assert len(got) == len(set(got))


def test_random_vs_brute(ray_session):
    rng = np.random.default_rng(13)
    left = [
        (int(rng.integers(0, 5)), int(rng.integers(0, 3000)), i)
        for i in range(150)
    ]
    right = [
        (int(rng.integers(0, 5)), int(rng.integers(0, 3000)), 1000 + i)
        for i in range(120)
    ]
    w = 250
    got = _run(left, right, w, n_blocks=7)
    assert got == _brute(left, right, w)
    assert len(got) > 0
