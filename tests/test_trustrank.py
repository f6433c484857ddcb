"""TrustRank: seed-restricted teleport semantics, tier identity, and
a float-reference track on a controlled graph — the same conformance
discipline as the PageRank tests (pure int64, bit-equal tiers)."""

import numpy as np
import pytest

from search_engine_core_ray.sources.pages import read_documents_as_linked_pages
from search_engine_core_ray.stages.linkgraph import _trustrank_local, trustrank

SF_DIR = "/root/testdata/sf0.001"


def _seed_urls():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    src_of = dict(zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()))
    return [f"https://{src_of[d]}.example.com/doc/{d}" for d in (0, 1, 2)]


def test_trustrank_paths_identical(ray_session):
    """Gated numpy solve vs Dataset-resident iteration: bit-equal."""
    seeds = _seed_urls()
    pages = read_documents_as_linked_pages(SF_DIR)
    small = trustrank(pages, seeds, iterations=3).take_all()
    big = trustrank(pages, seeds, iterations=3, broadcast_limit=0).take_all()
    key = lambda r: r["url"]
    small, big = sorted(small, key=key), sorted(big, key=key)
    assert len(small) == len(big)
    for a, b in zip(small, big):
        assert a["url"] == b["url"]
        assert a["rank_scaled"] == b["rank_scaled"]
        assert a["trustrank"] == b["trustrank"]


def test_trustrank_unreachable_nodes_score_zero():
    """Integer semantics make 'no path from any seed' EXACTLY zero —
    the property PageRank's uniform teleport can never give."""
    #  s -> a -> b;  x -> y is a separate component
    nodes = np.asarray(["a", "b", "s", "x", "y"], dtype=object)
    src = np.asarray(["s", "a", "x"], dtype=object)
    dst = np.asarray(["a", "b", "y"], dtype=object)
    t = _trustrank_local(
        nodes, src, dst, {"s"},
        iterations=10, scale=10**12, damp_num=85, damp_den=100,
    )
    got = dict(zip(t.column("url").to_pylist(), t.column("rank_scaled").to_pylist()))
    assert got["x"] == 0 and got["y"] == 0
    assert got["s"] > 0 and got["a"] > 0 and got["b"] > 0


def test_trustrank_equals_pagerank_when_all_nodes_seeded():
    """With S = all nodes the update degenerates to PageRank exactly."""
    from search_engine_core_ray.stages.linkgraph import _pagerank_local

    nodes = np.asarray(["a", "b", "c"], dtype=object)
    src = np.asarray(["a", "a", "b"], dtype=object)
    dst = np.asarray(["b", "c", "c"], dtype=object)
    kw = dict(iterations=12, scale=10**12, damp_num=85, damp_den=100)
    tr = _trustrank_local(nodes, src, dst, {"a", "b", "c"}, **kw)
    pr = _pagerank_local(nodes, src, dst, **kw)
    assert tr.column("rank_scaled").to_pylist() == pr.column("rank_scaled").to_pylist()


def test_trustrank_local_matches_float_reference():
    """Int64 fixed-point tracks the float biased-PageRank closely:
    seed s, chain s -> a -> b (b dangling back to the seed pool).
    Tolerance is 5e-5, looser than PageRank's 1e-6 — with a one-seed
    teleport most of each round's mass cycles through the dangling
    recycle path, so the per-division floor losses (each up to
    1/scale) compound instead of being damped by a uniform jump."""
    nodes = np.asarray(["a", "b", "s"], dtype=object)
    src = np.asarray(["s", "a"], dtype=object)
    dst = np.asarray(["a", "b"], dtype=object)
    t = _trustrank_local(
        nodes, src, dst, {"s"},
        iterations=60, scale=10**12, damp_num=85, damp_den=100,
    )
    got = dict(zip(t.column("url").to_pylist(), t.column("trustrank").to_pylist()))
    # float reference: teleport vector = e_s; dangling mass -> seeds
    r = np.array([0.0, 0.0, 1.0])  # a, b, s
    for _ in range(300):
        contrib = np.array([r[2], r[0], 0.0])  # s->a, a->b
        d = r[1]  # b dangling
        jump = np.array([0.0, 0.0, 0.15])
        r = jump + 0.85 * (contrib + np.array([0.0, 0.0, d]))
    for i, u in enumerate(["a", "b", "s"]):
        assert got[u] == pytest.approx(r[i], abs=5e-5)
    assert got["s"] > got["a"] > got["b"] > 0


def test_trustrank_mass_bounded(ray_session):
    pages = read_documents_as_linked_pages(SF_DIR)
    rows = trustrank(pages, _seed_urls(), iterations=10).take_all()
    total = sum(r["rank_scaled"] for r in rows)
    assert 0 < total <= 10**12
    assert all(r["rank_scaled"] >= 0 for r in rows)
    assert any(r["rank_scaled"] == 0 for r in rows)  # spam-demotion bite
