"""connected_components: min-label correctness, chains vs pairwise
dropping, singleton handling, and driver-vs-distributed tier identity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.stages.dedup import connected_components


def _pairs(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.int64()),
                "b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )


def _nodes(ids):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    )


def _run(edges, nodes=None, **kw):
    out = connected_components(
        _pairs(edges), _nodes(nodes) if nodes is not None else None, **kw
    ).to_pandas()
    return {
        int(r.doc_id): (int(r.component), int(r.kept))
        for r in out.itertuples()
    }


def test_chain_is_one_component(ray_session):
    # a~b~c with a!~c: ONE component, min id kept — pairwise dropping
    # would keep {1} too but mislabel 3's cluster if chains split
    got = _run([(1, 2), (2, 3)])
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0)}


def test_disjoint_components_and_singletons(ray_session):
    got = _run([(10, 20), (30, 40), (40, 50)], nodes=[10, 20, 30, 40, 50, 60])
    assert got == {
        10: (10, 1), 20: (10, 0),
        30: (30, 1), 40: (30, 0), 50: (30, 0),
        60: (60, 1),
    }


def test_no_pairs_all_singletons(ray_session):
    got = _run([], nodes=[7, 8, 9])
    assert got == {7: (7, 1), 8: (8, 1), 9: (9, 1)}


def test_tiers_identical(ray_session):
    """Driver union-find and distributed hash-min propagation label a
    random graph identically."""
    rng = np.random.RandomState(1234)
    n = 120
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, n, size=(150, 2))
        if a != b
    ]
    nodes = list(range(n))
    fast = _run(edges, nodes=nodes, broadcast_limit=10**6)
    dist = _run(edges, nodes=nodes, broadcast_limit=0)
    assert fast == dist


def test_long_chain_converges(ray_session):
    """A 30-node path graph needs ~diameter rounds in the distributed
    tier; the label still converges to the global min."""
    edges = [(i, i + 1) for i in range(29)]
    got = _run(edges, broadcast_limit=0, max_rounds=40)
    assert all(comp == 0 for comp, _ in got.values())
    assert got[0][1] == 1 and all(got[i][1] == 0 for i in range(1, 30))
