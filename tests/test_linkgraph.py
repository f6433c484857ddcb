"""Link-graph operator tests: fixture rule, degree invariants, and the
gated-vs-distributed PageRank path identity (the same conformance
discipline as tests/test_gated_joins.py — both paths must be
bit-identical because the arithmetic is pure int64)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_core_ray.sources.pages import (
    link_hrefs_for_doc,
    link_targets_for_doc,
    read_documents_as_linked_pages,
)
from search_engine_core_ray.stages.linkgraph import (
    _pagerank_local,
    link_stats,
    pagerank,
    pages_to_edges,
)

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 500


def test_fixture_rule_shapes():
    assert link_targets_for_doc(0, N_DOCS) == []      # 0 % 7 == 0: dangling
    assert link_targets_for_doc(7, N_DOCS) == []
    t1 = link_targets_for_doc(1, N_DOCS)
    assert len(t1) == 2 and all(0 <= t < N_DOCS and t != 1 for t in t1)
    # href shapes all normalize onto the canonical target url
    from search_engine_core_ray.functions.urls import normalize_link, normalize_url

    for d in (1, 2, 3, 4, 5):
        for href, canon in link_hrefs_for_doc(d, "src9", N_DOCS):
            url = f"https://src9.example.com/doc/{d}"
            assert normalize_url(normalize_link(href, url)) == canon


def test_edges_match_fixture_rule(ray_session):
    pages = read_documents_as_linked_pages(SF_DIR)
    got = sorted(
        (r["src_url"], r["dst_url"])
        for r in pages_to_edges(pages).take_all()
    )
    # src id -> source name is doc_id % 20 ('src{k}') in the testdata
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    src_of = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("source").to_pylist()))
    exp = sorted(
        (
            f"https://{src_of[i]}.example.com/doc/{i}",
            f"https://{src_of[i]}.example.com/doc/{t}",
        )
        for i in range(N_DOCS)
        for t in link_targets_for_doc(i, N_DOCS)
    )
    assert got == exp


def test_link_stats_invariants(ray_session):
    pages = read_documents_as_linked_pages(SF_DIR)
    rows = link_stats(pages).take_all()
    assert len(rows) == N_DOCS
    by_url = {r["url"]: r for r in rows}
    # dangling fixture docs have out_degree 0
    for i in (0, 7, 14):
        src = f"src{i % 20}"
        assert by_url[f"https://{src}.example.com/doc/{i}"]["out_degree"] == 0
    # total out-degree == edge count; in_degree sums to the subset of
    # edges whose target landed on a real page (same-domain targets)
    n_edges = sum(r["out_degree"] for r in rows)
    assert n_edges == sum(
        1 for i in range(N_DOCS) for _ in link_targets_for_doc(i, N_DOCS)
    )
    in_total = sum(r["in_degree"] for r in rows)
    page_urls = set(by_url)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"])
    src_of = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("source").to_pylist()))
    exp_in = sum(
        1
        for i in range(N_DOCS)
        for _href, canon in link_hrefs_for_doc(i, src_of[i], N_DOCS)
        if canon in page_urls  # link target is a real crawled page
    )
    # odd slots produce genuine intra-site in-links — must be nonzero
    assert exp_in > 0
    assert in_total == exp_in


def test_pagerank_paths_identical(ray_session):
    """Gated numpy solve vs Dataset-resident power iteration: bit-equal."""
    pages = read_documents_as_linked_pages(SF_DIR)
    small = pagerank(pages, iterations=3).take_all()
    big = pagerank(pages, iterations=3, broadcast_limit=0).take_all()
    key = lambda r: r["url"]
    small, big = sorted(small, key=key), sorted(big, key=key)
    assert len(small) == len(big)
    for a, b in zip(small, big):
        assert a["url"] == b["url"]
        assert a["rank_scaled"] == b["rank_scaled"]
        assert a["pagerank"] == b["pagerank"]


def test_pagerank_mass_and_positivity(ray_session):
    pages = read_documents_as_linked_pages(SF_DIR)
    rows = pagerank(pages, iterations=10).take_all()
    total = sum(r["rank_scaled"] for r in rows)
    # floor losses only: within |nodes| * (iterations+2) of full mass
    assert 0 < 10**12 - total < len(rows) * 12 * 4
    assert all(r["rank_scaled"] > 0 for r in rows)


def test_pagerank_local_matches_float_reference():
    """The int64 fixed-point solve tracks textbook float PageRank to
    ~1e-9 on a small closed graph with a dangling node."""
    #   0 -> 1, 0 -> 2, 1 -> 2, 2 dangling
    nodes = np.asarray(["a", "b", "c"], dtype=object)
    src = np.asarray(["a", "a", "b"], dtype=object)
    dst = np.asarray(["b", "c", "c"], dtype=object)
    t = _pagerank_local(
        nodes, src, dst, iterations=50, scale=10**12, damp_num=85, damp_den=100
    )
    got = dict(zip(t.column("url").to_pylist(), t.column("pagerank").to_pylist()))
    # float reference
    r = np.full(3, 1 / 3)
    od = np.array([2.0, 1.0, 0.0])
    for _ in range(200):
        contrib = np.zeros(3)
        contrib[1] += r[0] / 2
        contrib[2] += r[0] / 2 + r[1]
        d = r[2]
        r = 0.15 / 3 + 0.85 * (contrib + d / 3)
    for i, u in enumerate("abc"):
        assert got[u] == pytest.approx(r[i], abs=1e-6)
    assert got["c"] > got["b"] > got["a"]


def test_pagerank_local_properties_random_graphs():
    """Property test of the fixed-point core on random graphs (no Ray):
    vs a float power-iteration reference, plus exact invariants —
    positivity, the jump floor, and bounded floor-loss mass."""
    import numpy as np

    from search_engine_core_ray.stages.linkgraph import _pagerank_local

    rng = np.random.RandomState(1234)
    for trial in range(8):
        n = int(rng.randint(3, 40))
        n_edges = int(rng.randint(0, 4 * n))
        nodes = np.asarray([f"n{i:03d}" for i in range(n)], dtype=object)
        src_i = rng.randint(0, n, n_edges)
        dst_i = rng.randint(0, n, n_edges)
        keep = src_i != dst_i
        src_i, dst_i = src_i[keep], dst_i[keep]
        iters = 30
        t = _pagerank_local(
            nodes,
            nodes[src_i],
            nodes[dst_i],
            iterations=iters,
            scale=10**12,
            damp_num=85,
            damp_den=100,
        )
        got = np.asarray(t.column("pagerank").to_pylist())
        rs = np.asarray(t.column("rank_scaled").to_pylist())
        order = {u: i for i, u in enumerate(t.column("url").to_pylist())}
        # float reference with the same update rule
        od = np.bincount(src_i, minlength=n).astype(float)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = np.zeros(n)
            if len(src_i):
                np.add.at(contrib, dst_i, r[src_i] / od[src_i])
            d = r[od == 0].sum()
            r = 0.15 / n + 0.85 * (contrib + d / n)
        ref = np.asarray([r[int(u[1:])] for u in t.column("url").to_pylist()])
        # fixed-point tracks float to ~per-iteration floor loss
        assert np.max(np.abs(got - ref)) < iters * n * 1e-12 + 1e-9
        # invariants
        jump = (15 * 10**12) // (100 * n)
        assert (rs >= jump).all()
        total = int(rs.sum())
        assert 0 < 10**12 - total < (iters + 2) * (n + 2) * 4
        # node ids round-trip (every node present exactly once)
        assert len(order) == n


def test_hits_paths_identical(ray_session):
    """Gated numpy HITS vs Dataset-resident iteration: bit-equal."""
    from search_engine_core_ray.stages.linkgraph import hits

    pages = read_documents_as_linked_pages(SF_DIR)
    small = hits(pages, iterations=2).take_all()
    big = hits(pages, iterations=2, broadcast_limit=0).take_all()
    key = lambda r: r["url"]
    small, big = sorted(small, key=key), sorted(big, key=key)
    assert len(small) == len(big) > 0
    for a, b in zip(small, big):
        assert a["url"] == b["url"]
        assert a["auth_scaled"] == b["auth_scaled"]
        assert a["hub_scaled"] == b["hub_scaled"]
        assert a["authority"] == b["authority"]
        assert a["hub"] == b["hub"]


def test_hits_local_matches_float_reference():
    """Quotient-normalized int64 HITS tracks textbook L1-normalized
    float HITS on a small graph (both normalize to sum=1 at the end)."""
    from search_engine_core_ray.stages.linkgraph import _hits_local

    #  hub 'a' points at both others; 'c' is the strongest authority
    nodes = np.asarray(["a", "b", "c"], dtype=object)
    src = np.asarray(["a", "a", "b"], dtype=object)
    dst = np.asarray(["b", "c", "c"], dtype=object)
    t = _hits_local(nodes, src, dst, iterations=40, scale=10**12)
    auth = dict(zip(t.column("url").to_pylist(), t.column("authority").to_pylist()))
    hub = dict(zip(t.column("url").to_pylist(), t.column("hub").to_pylist()))

    a = np.full(3, 1 / 3)
    h = np.full(3, 1 / 3)
    si = np.array([0, 0, 1])
    di = np.array([1, 2, 2])
    for _ in range(200):
        ra = np.zeros(3)
        np.add.at(ra, di, h[si])
        a = ra / ra.sum()
        rh = np.zeros(3)
        np.add.at(rh, si, a[di])
        h = rh / rh.sum()
    for i, u in enumerate(["a", "b", "c"]):
        assert abs(auth[u] - a[i]) < 1e-6, (u, auth[u], a[i])
        assert abs(hub[u] - h[i]) < 1e-6, (u, hub[u], h[i])
    assert auth["c"] > auth["b"] > auth["a"] == 0.0
    assert hub["a"] > hub["b"] > hub["c"] == 0.0


def test_cocitation_count_variety(ray_session):
    """The cocitation entry's count statistic is informative: hub-hub
    pairs at ~N/7, small mixed counts, and singles all present."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["cocitation"](SF_DIR).to_pandas()
    counts = set(df["cocitations"])
    assert 1 in counts and 2 in counts and max(counts) > 50
    assert (df["x"] < df["y"]).all()  # canonical unordered pairs


def test_hits_local_properties_random_graphs():
    """Property test of the quotient-normalized HITS core on random
    graphs (no Ray): vs a float L1-normalized reference, plus the exact
    integer invariants the overflow analysis relies on — nonnegativity,
    vector sums bounded by 2*scale, and authority/hub each summing to
    exactly 1.0 when nonzero (one division of exact ints)."""
    import numpy as np

    from search_engine_core_ray.stages.linkgraph import _hits_local

    scale = 10**12
    rng = np.random.RandomState(4321)
    for trial in range(8):
        n = int(rng.randint(3, 40))
        n_edges = int(rng.randint(0, 4 * n))
        nodes = np.asarray([f"n{i:03d}" for i in range(n)], dtype=object)
        src_i = rng.randint(0, n, n_edges)
        dst_i = rng.randint(0, n, n_edges)
        keep = src_i != dst_i
        src_i, dst_i = src_i[keep], dst_i[keep]
        iters = 30
        t = _hits_local(
            nodes, nodes[src_i], nodes[dst_i], iterations=iters, scale=scale
        )
        a_s = np.asarray(t.column("auth_scaled").to_pylist())
        h_s = np.asarray(t.column("hub_scaled").to_pylist())
        auth = np.asarray(t.column("authority").to_pylist())
        hub = np.asarray(t.column("hub").to_pylist())
        # integer invariants (the int64-safety bound)
        assert (a_s >= 0).all() and (h_s >= 0).all()
        assert int(a_s.sum()) < 2 * scale and int(h_s.sum()) < 2 * scale
        if a_s.sum():
            assert abs(auth.sum() - 1.0) < 1e-9
        if h_s.sum():
            assert abs(hub.sum() - 1.0) < 1e-9
        if not len(src_i):
            assert (a_s == 0).all() and (h_s == 0).all()
            continue
        # float L1-normalized reference: SAME update order and SAME
        # iteration count (slow eigen-convergence on near-degenerate
        # random graphs means only the matched trajectory is comparable)
        a = np.full(n, 1.0 / n)
        h = np.full(n, 1.0 / n)
        idx = {u: i for i, u in enumerate(nodes)}
        for _ in range(iters):
            ra = np.zeros(n)
            np.add.at(ra, dst_i, h[src_i])
            a = ra / ra.sum() if ra.sum() else ra
            rh = np.zeros(n)
            np.add.at(rh, src_i, a[dst_i])
            h = rh / rh.sum() if rh.sum() else rh
        ref_a = np.asarray([a[idx[u]] for u in t.column("url").to_pylist()])
        ref_h = np.asarray([h[idx[u]] for u in t.column("url").to_pylist()])
        # per-step quantization is ~1/scale; 30 steps stay ~1e-9-ish
        assert np.max(np.abs(auth - ref_a)) < 1e-6, trial
        assert np.max(np.abs(hub - ref_h)) < 1e-6, trial


# ---------------------------------------------------------------- anchors


def test_anchor_extraction_alignment_and_edge_cases():
    from search_engine_core_ray.stages.extract import extract_page

    h = (
        '<html><body><p>hi</p>'
        '<a href="https://x.com/a">First <b>Link</b></a>'
        '<a href="https://x.com/b"></a>'      # empty anchor
        '<a>no href</a>'                       # no link row, no anchor row
        '<div><a href="https://x.com/c">unclosed'  # EOF inside <a>
    )
    r = extract_page(h, "https://x.com/", anchors=True)
    assert r["links"] == ["https://x.com/a", "https://x.com/b", "https://x.com/c"]
    assert r["anchor_texts"] == ["First Link", "", "unclosed"]

    # HTML5 "a inside a": the inner start tag closes the outer anchor
    r2 = extract_page(
        '<a href="https://x.com/1">one <a href="https://x.com/2">two</a></a>',
        anchors=True,
    )
    assert r2["links"] == ["https://x.com/1", "https://x.com/2"]
    assert r2["anchor_texts"] == ["one ", "two"]

    # an outer close that swallows the <a> finalizes it (text after the
    # div is NOT anchor text)
    r3 = extract_page('<div><a href="https://x.com/z">zed</div>after', anchors=True)
    assert r3["anchor_texts"] == ["zed"]

    # default path: schema unchanged (no anchor_texts key)
    assert "anchor_texts" not in extract_page(h, "https://x.com/")


def test_anchor_terms_non_vacuous(ray_session):
    """The fixture must exercise real aggregation: multi-term targets,
    cnt variety (several sources citing the same target), and the
    1-char-id token drop."""
    import polars as pl

    from search_engine_core_ray.stages.linkgraph import anchor_terms

    out = anchor_terms(read_documents_as_linked_pages(SF_DIR)).to_pandas()
    t = pl.from_pandas(out)
    assert (t["term"] == "doc").sum() > 100          # the shared anchor word
    per_dst = t.group_by("dst_url").len()
    assert per_dst["len"].max() == 2                 # 'doc' + the id token
    assert per_dst["len"].min() >= 1                 # id < 10 drops to 1 term
    assert t["cnt"].max() > 1                        # real aggregation happened
    # cnt variety: at sf0.001 in-degree is mostly 1, sometimes 2+ —
    # at least two distinct counts proves the reduction merged sources
    assert t.filter(pl.col("term") == "doc")["cnt"].n_unique() >= 2
    # 1-char ids never appear as terms
    assert not any(len(x) < 2 for x in t["term"].to_list())
