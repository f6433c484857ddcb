"""Link-graph operators: edge extraction, degree statistics, PageRank.

The reference crawler extracts every ``<a href>`` from each fetched
page (ContentParser::extractLinks, src/crawler/ContentParser.cpp:69-90,
169-186), normalizes it (ContentParser::normalizeUrl :209-243, then
URLFrontier::normalizeURL, src/crawler/URLFrontier.cpp:398-432) and
feeds it back into the frontier; the stored SiteProfile carries an
``inboundLinkCount`` backlink field
(include/search_engine/storage/SiteProfile.h:65).  This module is the
batch analogue of that loop over a static corpus:

- :func:`pages_to_edges` — pages(url, html) -> (src_url, dst_url)
  edge list, one row per extracted link, both endpoints in canonical
  (frontier-normalized) URL space.
- :func:`link_stats` — per PAGE out-degree / in-degree
  (= SiteProfile.inboundLinkCount).
- :func:`pagerank` — damped power iteration over the full node set
  (pages ∪ link targets).  Links to never-crawled URLs are first-class
  dangling nodes, exactly as a frontier sees them.

PageRank is computed in FIXED-POINT integer arithmetic: ranks are
int64 scaled by ``scale`` (default 10^12) and every step uses integer
floor division, so the result is bit-identical across engines (numpy,
Ray aggregate, DuckDB BIGINT) — no float summation-order hazard.  With
damping d = damp_num/damp_den and N nodes the update is

    r'[v] = ((damp_den-damp_num)*scale) // (damp_den*N)
            + (damp_num * (contrib[v] + D // N)) // damp_den
    contrib[v] = sum over edges (u,v) of  r[u] // out_degree[u]
    D          = sum of r[u] over dangling u  (out_degree 0)

All quantities stay positive, so floor == truncation in every engine;
the result is within one part in ~scale of float PageRank.

100-TB design: edges are a narrow exchange (two int64 ids after
hashing urls through ``doc_id_for_url``); the degree aggregations are
corpus-proportional-key reductions and run through ``sorted_agg``;
the iteration state (one int64 per node) lives in a Dataset, with each
step one hash join (edges ⋈ ranks, partitioned on src) + one sorted
aggregate (contributions per dst) + one gated left join back onto the
static node table.  Below ``broadcast_limit`` total graph rows the
whole solve runs vectorized on collected numpy arrays instead
(threshold-gated, same discipline as functions/joins.py — both paths
conformance-tested identical).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ..functions.joins import BROADCAST_ROW_LIMIT, gated_left_join
from ..functions.urls import normalize_url
from ..stages.extract import HtmlExtract
from ..stages.shuffle import AUTO_THRESHOLD, _unlarge, sorted_agg, sorted_distinct

PR_SCALE = 10**12


def _explode_links(batch: pa.Table) -> pa.Table:
    """(url, links list<string>) -> (src_url, dst_url) rows.

    Link hrefs were already resolved + sanitized at parse time
    (stages/extract.py); here each endpoint additionally gets the
    frontier canonicalization (lowercase, #fragment strip, trailing
    slash) so graph node identity matches doc identity.
    """
    t = pl.from_arrow(batch.select(["url", "links"]))
    t = t.filter(pl.col("links").list.len() > 0).explode("links")
    if t.height == 0:
        return pa.table(
            {"src_url": pa.array([], pa.string()), "dst_url": pa.array([], pa.string())}
        )
    src = [normalize_url(u) for u in t["url"].to_list()]
    dst = [normalize_url(u) for u in t["links"].to_list()]
    return pa.table(
        {"src_url": pa.array(src, pa.string()), "dst_url": pa.array(dst, pa.string())}
    )


def pages_to_edges(pages, *, extracted: bool = False):
    """pages(url, html) -> edge Dataset (src_url, dst_url), one row per
    link occurrence (multi-edges preserved — they carry rank weight and
    out-degree exactly as repeated anchors do).  ``extracted=True``
    skips the HTML parse when the input already has a ``links`` column.
    """
    ds = pages if extracted else pages.map_batches(
        HtmlExtract, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )
    return ds.map_batches(_explode_links, batch_format="pyarrow")


def link_stats(pages):
    """Per-page link-degree table: (url, out_degree, in_degree).

    out_degree counts every link the page emits (including links to
    never-crawled URLs); in_degree counts links from OTHER crawled
    pages whose canonical target equals this page's canonical url —
    the SiteProfile.inboundLinkCount semantics
    (include/search_engine/storage/SiteProfile.h:65).
    """
    # ONE HTML-extract pass; materialize only the NARROW (url, links)
    # projection (~1% of page bytes) so both consumers — the edge
    # explode and the out-degree map — read it without re-parsing.
    links_tbl = pages.map_batches(
        HtmlExtract, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    ).map_batches(
        lambda b: b.select(["url", "links"]), batch_format="pyarrow"
    ).materialize()
    edges = pages_to_edges(links_tbl, extracted=True).materialize()

    # out-degree is map-side exact: it is the row's own links length
    # (after normalization each href still yields exactly one edge row),
    # so no exchange is needed for it.
    def outd(b: pa.Table) -> pa.Table:
        urls = [normalize_url(u) for u in b.column("url").to_pylist()]
        n = pc.cast(pc.list_value_length(b.column("links")), pa.int64())
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "out_degree": pc.fill_null(n, 0)}
        )

    nodes = links_tbl.map_batches(outd, batch_format="pyarrow")
    ind = sorted_agg(
        edges,
        "dst_url",
        {"in_degree": ("count", "dst_url")},
        auto_threshold=AUTO_THRESHOLD,
    )
    joined = gated_left_join(nodes, "url", ind, "dst_url", ["in_degree"])
    return joined.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("in_degree"),
            "in_degree",
            pc.cast(pc.fill_null(b.column("in_degree"), 0), pa.int64()),
        ),
        batch_format="pyarrow",
    )


def graph_nodes(pages, edges):
    """Node universe: every crawled page url plus every link target
    (never-crawled targets become dangling nodes).  Distinct via the
    corpus-proportional-key primitive."""
    page_urls = pages.map_batches(
        lambda b: pa.table(
            {"url": pa.array(
                [normalize_url(u) for u in b.column("url").to_pylist()], pa.string()
            )}
        ),
        batch_format="pyarrow",
    )
    dsts = edges.map_batches(
        lambda b: b.select(["dst_url"]).rename_columns(["url"]),
        batch_format="pyarrow",
    )
    return sorted_distinct(
        page_urls.union(dsts), "url", auto_threshold=AUTO_THRESHOLD
    )


def _pagerank_local(
    node_urls: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    *,
    iterations: int,
    scale: int,
    damp_num: int,
    damp_den: int,
) -> pa.Table:
    """Vectorized in-memory solve (the gated small path).  Exact
    integer semantics as documented in the module docstring."""
    order = np.argsort(node_urls, kind="stable")
    nodes_sorted = node_urls[order]
    n = len(nodes_sorted)
    si = np.searchsorted(nodes_sorted, src)
    di = np.searchsorted(nodes_sorted, dst)
    od = np.bincount(si, minlength=n).astype(np.int64)
    dangling = od == 0
    jump = ((damp_den - damp_num) * scale) // (damp_den * n)
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.int64)
        if len(si):
            np.add.at(contrib, di, r[si] // od[si])
        d_mass = int(r[dangling].sum())
        r = jump + (damp_num * (contrib + d_mass // n)) // damp_den
    return pa.table(
        {
            "url": pa.array(nodes_sorted, pa.string()),
            "rank_scaled": pa.array(r, pa.int64()),
            "pagerank": pa.array(r.astype(np.float64) / float(scale), pa.float64()),
        }
    )


def pagerank(
    pages,
    *,
    iterations: int = 10,
    scale: int = PR_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    num_partitions: int = 8,
):
    """Damped PageRank over the corpus link graph; returns a Dataset
    (url, rank_scaled int64, pagerank double = rank_scaled/scale, an
    exact single integer division so both columns are engine-exact).

    Gate: when nodes+edges fit under ``broadcast_limit`` rows the
    power iteration runs vectorized on the driver over collected numpy
    arrays (graph solve of a gated-size graph — the same sanctioned
    shape as every gated broadcast in functions/joins.py); above it,
    each iteration is expressed distributedly:

        edges ⋈ ranks (hash join on src)        — contribution flow
        sorted_agg by dst (sum)                 — inbound mass
        nodes gated-left-join contributions     — next rank vector

    with the static per-node out-degree carried INSIDE the ranks
    Dataset so the dangling-mass scalar is one filtered aggregate, not
    an extra join.  Both paths are bit-identical (integer arithmetic;
    conformance-tested in tests/test_linkgraph.py).
    """
    edges = pages_to_edges(pages).materialize()
    nodes = graph_nodes(pages, edges).materialize()
    n_nodes = nodes.count()
    n_edges = edges.count()

    if n_nodes + n_edges <= broadcast_limit:
        node_urls = np.asarray(
            [u for b in nodes.iter_batches(batch_size=None, batch_format="pyarrow")
             for u in b.column("url").to_pylist()],
            dtype=object,
        )
        src_l: list = []
        dst_l: list = []
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
            src_l.extend(b.column("src_url").to_pylist())
            dst_l.extend(b.column("dst_url").to_pylist())
        import ray.data

        local = _pagerank_local(
            node_urls,
            np.asarray(src_l, dtype=object),
            np.asarray(dst_l, dtype=object),
            iterations=iterations,
            scale=scale,
            damp_num=damp_num,
            damp_den=damp_den,
        )
        return ray.data.from_arrow(local)

    return _pagerank_distributed(
        nodes, edges, n_nodes,
        iterations=iterations, scale=scale,
        damp_num=damp_num, damp_den=damp_den,
        num_partitions=num_partitions,
    )


def _pagerank_distributed(
    nodes,
    edges,
    n_nodes: int,
    *,
    iterations: int,
    scale: int,
    damp_num: int,
    damp_den: int,
    num_partitions: int,
):
    """Dataset-resident power iteration (the big path).  State per
    node: (url, od, r).  Narrowness note: a deployment at 10^11 nodes
    would first map url -> int64 via functions.urls.doc_id_for_url and
    run every exchange below in id space, joining urls back once at the
    end; at catalog scale the string keys keep the entry simpler and
    the semantics identical."""
    n = n_nodes
    jump = ((damp_den - damp_num) * scale) // (damp_den * n)

    outdeg = sorted_agg(
        edges.map_batches(
            lambda b: b.select(["src_url"]).rename_columns(["url"]),
            batch_format="pyarrow",
        ),
        "url",
        {"od": ("count", "url")},
        auto_threshold=AUTO_THRESHOLD,
    )
    state = gated_left_join(nodes, "url", outdeg, "url", ["od"]).map_batches(
        lambda b, _s=scale, _n=n: _unlarge(
            pa.table(
                {
                    "url": b.column("url"),
                    "od": pc.cast(pc.fill_null(b.column("od"), 0), pa.int64()),
                    "r": pa.array([_s // _n] * b.num_rows, pa.int64()),
                }
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        # dangling mass: one scalar aggregate over the state
        d_mass = state.map_batches(
            lambda b: b.filter(pc.equal(b.column("od"), 0)).select(["r"]),
            batch_format="pyarrow",
        ).sum("r") or 0
        # contribution flow: edges ⋈ state on src, emit (dst, r // od)
        flows = edges.join(
            state.map_batches(
                lambda b: b.rename_columns(
                    ["src_url" if c == "url" else c for c in b.column_names]
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src_url",),
        ).repartition(num_partitions).map_batches(
            lambda b: pa.table(
                {
                    "url": b.column("dst_url"),
                    "c": pc.cast(
                        pc.divide(b.column("r"), b.column("od")), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contrib = sorted_agg(
            flows, "url", {"c": ("sum", "c")}, auto_threshold=AUTO_THRESHOLD
        )
        share = d_mass // n
        state = gated_left_join(
            state.map_batches(
                lambda b: b.select(["url", "od"]), batch_format="pyarrow"
            ),
            "url",
            contrib,
            "url",
            ["c"],
        ).map_batches(
            lambda b, _j=jump, _sh=share, _dn=damp_num, _dd=damp_den: _unlarge(
                pa.table(
                    {
                        "url": b.column("url"),
                        "od": b.column("od"),
                        "r": pa.array(
                            _j
                            + (
                                _dn
                                * (
                                    pc.fill_null(b.column("c"), 0)
                                    .cast(pa.int64())
                                    .to_numpy(zero_copy_only=False)
                                    + _sh
                                )
                            )
                            // _dd,
                            pa.int64(),
                        ),
                    }
                )
            ),
            batch_format="pyarrow",
        ).materialize()

    return state.map_batches(
        lambda b, _s=scale: pa.table(
            {
                "url": b.column("url"),
                "rank_scaled": b.column("r"),
                "pagerank": pc.divide(
                    pc.cast(b.column("r"), pa.float64()), float(_s)
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ----------------------------------------------------------------------
# HITS (Kleinberg 1999): hubs & authorities — the second classic
# link-analysis signal next to PageRank.  Same fixed-point integer
# discipline: scores are int64 scaled by ``scale``; instead of the
# float L2 normalization the update renormalizes by QUOTIENT DIVISION
#     q = max(sum(raw) // scale, 1);  score = raw // q
# which keeps every vector sum in [0, 2*scale) forever (for sums S >=
# scale, S // q <= S / (S/scale - 1) -> ~scale; for S < 2*scale, q=1
# keeps S), is pure positive integer arithmetic (floor == truncation in
# every engine), and is therefore bit-replayable by the unrolled DuckDB
# oracle.  Max intermediate = sum over edges of a capped score
# <= max_out_degree * 2 * scale — int64-safe far past catalog scale
# (overflow needs max_degree * scale > 9e18, i.e. degree ~ 4.6M at the
# default 1e12 scale; lower ``scale`` for denser hubs).
# ----------------------------------------------------------------------

HITS_ITERATIONS = 8


def _hits_local(
    node_urls: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    *,
    iterations: int,
    scale: int,
) -> pa.Table:
    """Vectorized in-memory HITS (the gated small path)."""
    order = np.argsort(node_urls, kind="stable")
    nodes_sorted = node_urls[order]
    n = len(nodes_sorted)
    si = np.searchsorted(nodes_sorted, src)
    di = np.searchsorted(nodes_sorted, dst)
    a = np.full(n, scale // n, dtype=np.int64)
    h = np.full(n, scale // n, dtype=np.int64)
    for _ in range(iterations):
        ra = np.zeros(n, dtype=np.int64)
        if len(si):
            np.add.at(ra, di, h[si])
        qa = max(int(ra.sum()) // scale, 1)
        a = ra // qa
        rh = np.zeros(n, dtype=np.int64)
        if len(si):
            np.add.at(rh, si, a[di])
        qh = max(int(rh.sum()) // scale, 1)
        h = rh // qh
    sa, sh = int(a.sum()), int(h.sum())
    return pa.table(
        {
            "url": pa.array(nodes_sorted, pa.string()),
            "auth_scaled": pa.array(a, pa.int64()),
            "hub_scaled": pa.array(h, pa.int64()),
            "authority": pa.array(
                a.astype(np.float64) / float(sa) if sa else np.zeros(n),
                pa.float64(),
            ),
            "hub": pa.array(
                h.astype(np.float64) / float(sh) if sh else np.zeros(n),
                pa.float64(),
            ),
        }
    )


def hits(
    pages,
    *,
    iterations: int = HITS_ITERATIONS,
    scale: int = PR_SCALE,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    num_partitions: int = 8,
):
    """HITS hubs & authorities over the corpus link graph; returns a
    Dataset (url, auth_scaled, hub_scaled, authority, hub) where the
    doubles are ONE division of the exact final integer vector by its
    exact integer sum — engine-identical.

    Gate (same discipline as :func:`pagerank`): graphs under
    ``broadcast_limit`` total rows solve vectorized on collected numpy
    arrays; above it each half-iteration is one hash join (edges ⋈
    scores, partitioned on the flow endpoint) + one ``sorted_agg``
    (mass per node) + one gated left join onto the static node table,
    with the normalization quotient an O(1) driver scalar per half
    step.  Both paths are bit-identical (integer arithmetic;
    conformance-tested).
    """
    edges = pages_to_edges(pages).materialize()
    nodes = graph_nodes(pages, edges).materialize()
    n_nodes = nodes.count()
    n_edges = edges.count()

    if n_nodes + n_edges <= broadcast_limit:
        node_urls = np.asarray(
            [u for b in nodes.iter_batches(batch_size=None, batch_format="pyarrow")
             for u in b.column("url").to_pylist()],
            dtype=object,
        )
        src_l: list = []
        dst_l: list = []
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
            src_l.extend(b.column("src_url").to_pylist())
            dst_l.extend(b.column("dst_url").to_pylist())
        import ray.data

        return ray.data.from_arrow(
            _hits_local(
                node_urls,
                np.asarray(src_l, dtype=object),
                np.asarray(dst_l, dtype=object),
                iterations=iterations,
                scale=scale,
            )
        )

    return _hits_distributed(
        nodes, edges,
        iterations=iterations, scale=scale, num_partitions=num_partitions,
    )


def _hits_distributed(
    nodes,
    edges,
    *,
    iterations: int,
    scale: int,
    num_partitions: int,
):
    """Dataset-resident HITS iteration (the big path).  State: two
    (url, r) Datasets over the full node set.  Same id-space narrowing
    note as :func:`_pagerank_distributed`."""
    n = nodes.count()

    def init_scores(b: pa.Table) -> pa.Table:
        return _unlarge(
            pa.table(
                {
                    "url": b.column("url"),
                    "r": pa.array([scale // n] * b.num_rows, pa.int64()),
                }
            )
        )

    h_ds = nodes.map_batches(init_scores, batch_format="pyarrow").materialize()
    a_ds = h_ds

    def half_step(score_ds, flow_from: str, flow_to: str):
        """One HITS half-step: mass flows from ``flow_from`` endpoints
        (scored by score_ds) onto ``flow_to`` endpoints, then quotient
        renormalization."""
        renamed = score_ds.map_batches(
            lambda b, _f=flow_from: b.rename_columns(
                [_f if c == "url" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        flows = edges.join(
            renamed, join_type="inner",
            num_partitions=num_partitions, on=(flow_from,),
        ).repartition(num_partitions).map_batches(
            lambda b, _t=flow_to: pa.table(
                {"url": b.column(_t), "v": b.column("r")}
            ),
            batch_format="pyarrow",
        )
        raw = sorted_agg(
            flows, "url", {"v": ("sum", "v")}, auto_threshold=AUTO_THRESHOLD
        ).materialize()
        total = raw.sum("v") or 0
        q = max(int(total) // scale, 1)
        return gated_left_join(nodes, "url", raw, "url", ["v"]).map_batches(
            lambda b, _q=q: _unlarge(
                pa.table(
                    {
                        "url": b.column("url"),
                        "r": pa.array(
                            pc.fill_null(b.column("v"), 0)
                            .cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                            // _q,
                            pa.int64(),
                        ),
                    }
                )
            ),
            batch_format="pyarrow",
        ).materialize()

    for _ in range(iterations):
        a_ds = half_step(h_ds, "src_url", "dst_url")
        h_ds = half_step(a_ds, "dst_url", "src_url")

    sa = int(a_ds.sum("r") or 0)
    sh = int(h_ds.sum("r") or 0)
    hub = h_ds.map_batches(
        lambda b: b.rename_columns(
            ["hub_scaled" if c == "r" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    both = gated_left_join(
        a_ds.map_batches(
            lambda b: b.rename_columns(
                ["auth_scaled" if c == "r" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        ),
        "url",
        hub,
        "url",
        ["hub_scaled"],
    )

    def finish(b: pa.Table) -> pa.Table:
        a = b.column("auth_scaled").to_numpy(zero_copy_only=False).astype(np.int64)
        h = b.column("hub_scaled").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "url": b.column("url"),
                "auth_scaled": pa.array(a),
                "hub_scaled": pa.array(h),
                "authority": pa.array(
                    a.astype(np.float64) / float(sa) if sa else np.zeros(len(a)),
                    pa.float64(),
                ),
                "hub": pa.array(
                    h.astype(np.float64) / float(sh) if sh else np.zeros(len(h)),
                    pa.float64(),
                ),
            }
        )

    return both.map_batches(finish, batch_format="pyarrow")


def cocitation_counts(edges, *, min_count: int = 1, num_partitions: int = 8):
    """Co-citation strength (Small 1973): for every unordered target
    pair (x, y), the number of DISTINCT sources whose pages cite both —
    the classic related-pages signal that needs no text at all (its
    mirror on sources is bibliographic coupling; swap the join axis).

    Shape: edges are deduped to distinct (src, dst) via
    ``sorted_distinct`` (multi-edges must not double-count a citing
    page), then a src-partitioned distributed self-join emits each
    co-cited pair once per citing source, and ``sorted_agg`` counts per
    pair.  Exchange is bounded by sum_src out_degree^2 — the standard
    co-citation bound; cap per-source fan-out upstream if a corpus has
    super-hub pages (a 1M-out-degree page alone would contribute 10^12
    pairs; the reference crawler's per-page link cap bounds this at
    parse time).  Pure integer counts — no float anywhere.
    """
    ded = sorted_distinct(
        edges, ["src_url", "dst_url"], auto_threshold=AUTO_THRESHOLD
    ).materialize()
    right = ded.map_batches(
        lambda b: b.rename_columns(
            ["dst_b" if c == "dst_url" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    joined = ded.join(
        right, join_type="inner", num_partitions=num_partitions, on=("src_url",)
    ).repartition(num_partitions)

    def pair_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b.column("dst_url"), b.column("dst_b")))
        return pa.table({"x": t.column("dst_url"), "y": t.column("dst_b")})

    counts = sorted_agg(
        joined.map_batches(pair_rows, batch_format="pyarrow"),
        ["x", "y"],
        {"cocitations": ("count", "x")},
        auto_threshold=AUTO_THRESHOLD,
    )
    if min_count <= 1:
        return counts
    return counts.map_batches(
        lambda b, _m=min_count: b.filter(
            pc.greater_equal(b.column("cocitations"), _m)
        ),
        batch_format="pyarrow",
    )


def coupling_counts(edges, *, min_count: int = 1, num_partitions: int = 8):
    """Bibliographic coupling (Kessler 1963): for every unordered
    SOURCE pair, the number of distinct targets both cite — exactly
    co-citation on the transposed graph, so it reuses
    :func:`cocitation_counts` on swapped endpoints.  Exchange bound is
    the mirror: sum_dst in_degree^2 (cap super-authority fan-in
    upstream the same way)."""
    swapped = edges.map_batches(
        lambda b: pa.table(
            {"src_url": b.column("dst_url"), "dst_url": b.column("src_url")}
        ),
        batch_format="pyarrow",
    )
    out = cocitation_counts(
        swapped, min_count=min_count, num_partitions=num_partitions
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["couplings" if c == "cocitations" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def _anchor_pairs(batch: pa.Table) -> pa.Table:
    """(links, anchor_texts) page rows -> per-batch partial
    (dst_url, term, cnt): explode link/anchor pairs, canonicalize the
    target, tokenize each anchor (extractTerms rule: lowercase ASCII
    alnum runs >= 2 chars, SearchScorer.cpp:692-712) — all vectorized
    polars except the URL canonicalization, same as _explode_links."""
    from .textstats import TOKEN_RE

    t = pl.from_arrow(batch.select(["links", "anchor_texts"]))
    t = t.filter(pl.col("links").list.len() > 0).explode(
        ["links", "anchor_texts"]
    )
    empty = pa.table(
        {"dst_url": pa.array([], pa.string()), "term": pa.array([], pa.string()),
         "cnt": pa.array([], pa.int64())}
    )
    if t.height == 0:
        return empty
    dst = [normalize_url(u) for u in t["links"].to_list()]
    out = (
        t.with_columns(
            pl.Series("dst_url", dst, dtype=pl.String),
            pl.col("anchor_texts").fill_null("").str.extract_all(TOKEN_RE).alias("tok"),
        )
        .select(["dst_url", "tok"])
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
        .group_by(["dst_url", "term"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .select(["dst_url", "term", "cnt"])
    )
    if out.height == 0:
        return empty
    return _unlarge(out.to_arrow()).cast(empty.schema)


def anchor_terms(pages, *, auto_threshold: int | None = AUTO_THRESHOLD):
    """Anchor-text term aggregation: (dst_url, term, cnt) — how other
    pages DESCRIBE each link target, counted per canonical target URL.

    This is the classic anchor-text index signal (Brin & Page 1998 §2:
    anchor words are associated with the page the link points TO); the
    reference keeps only the per-page backlink count
    (SiteProfile.inboundLinkCount, SiteProfile.h:65) — this operator is
    its term-resolved generalization, feeding an anchor field the same
    way title/description feed fielded BM25.

    100-TB shape: the HTML parse is the same single-pass actor-pool
    stage every other page consumer uses; the exchange rows are partial
    (dst_url, term, cnt) counts — bounded by the edge count times the
    few terms an anchor carries, combined map-side before the
    corpus-proportional-key reduction through ``sorted_agg``.
    """
    ext = pages.map_batches(
        HtmlExtract,
        fn_constructor_kwargs={"anchors": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    ).map_batches(
        lambda b: b.select(["links", "anchor_texts"]), batch_format="pyarrow"
    )
    pairs = ext.map_batches(_anchor_pairs, batch_format="pyarrow")
    return sorted_agg(
        pairs,
        ["dst_url", "term"],
        {"cnt": ("sum", "cnt")},
        auto_threshold=auto_threshold,
    )


def hop_distance(
    edges_ds,
    seeds: list[int],
    nodes_ds=None,
    *,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "doc_id",
    max_hops: int = 6,
    broadcast_limit: int | None = None,
    num_partitions: int = 8,
):
    """Directed BFS hop distance from a seed set over the crawl link
    graph -> Dataset(doc_id, dist): the crawl-DEPTH statistic (how many
    link hops from the seed list reach each page — the frontier's
    ``depth`` field in any breadth-first crawler, and the classic
    crawl-quality prior: pages far from seeds are low-trust).  Seeds
    get dist 0; a node's dist is the length of the shortest directed
    path from any seed, capped at ``max_hops``; nodes unreached within
    the cap get dist -1 when ``nodes_ds`` supplies the node universe.

    Tiered like :func:`pagerank` / ``connected_components``: an edge
    list under ``broadcast_limit`` rows solves on the driver with a
    vectorized frontier sweep (the edge list is link-volume-sized);
    above it the solve is Dataset-resident bounded Bellman-Ford — per
    round one hash join (edges ⋈ current labels, partitioned on the
    source id) + one ``sorted_agg`` min per destination + one gated
    left join back, converging in <= max_hops rounds with an early-out
    fixpoint count.  Distances are small ints; both tiers are exact
    BFS and conformance-tested identical (tests/test_linkgraph.py).
    """
    import ray
    import ray.data

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    seed_arr = sorted({int(s) for s in seeds})
    edges = edges_ds.materialize()
    n_edges = edges.count()

    def _label_table(ids, dists) -> pa.Table:
        return pa.table(
            {
                node_col: pa.array(np.asarray(ids, np.int64), pa.int64()),
                "dist": pa.array(np.asarray(dists, np.int64), pa.int64()),
            }
        )

    if n_edges <= limit:
        # driver tier: frontier BFS over collected arrays
        src_l: list = []
        dst_l: list = []
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
            src_l.extend(b.column(a_col).to_pylist())
            dst_l.extend(b.column(b_col).to_pylist())
        src = np.asarray(src_l, dtype=np.int64)
        dst = np.asarray(dst_l, dtype=np.int64)
        dist: dict[int, int] = {s: 0 for s in seed_arr}
        # adjacency via argsort on src
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        frontier = list(seed_arr)
        for hop in range(1, max_hops + 1):
            nxt = []
            if not frontier:
                break
            fa = np.asarray(frontier, np.int64)
            lo = np.searchsorted(src_s, fa, side="left")
            hi = np.searchsorted(src_s, fa, side="right")
            for l, h in zip(lo.tolist(), hi.tolist()):
                for v in dst_s[l:h].tolist():
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        ids = sorted(dist)
        labels = ray.data.from_arrow(
            _label_table(ids, [dist[i] for i in ids])
        )
    else:
        # distributed tier: bounded Bellman-Ford rounds
        labels = ray.data.from_arrow(
            _label_table(seed_arr, [0] * len(seed_arr))
        ).materialize()
        big = np.iinfo(np.int64).max
        for _ in range(max_hops):
            nbr = (
                edges.join(
                    labels.map_batches(
                        lambda b: b.rename_columns([a_col, "dist"]),
                        batch_format="pyarrow",
                    ),
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=(a_col,),
                )
                .repartition(num_partitions)
                .map_batches(
                    lambda b: pa.table(
                        {
                            node_col: b.column(b_col).cast(pa.int64()),
                            "nd": pc.add(
                                b.column("dist").cast(pa.int64()), 1
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            best = sorted_agg(
                nbr, node_col, {"nd": ("min", "nd")},
                auto_threshold=AUTO_THRESHOLD,
            )
            merged = gated_left_join(
                labels, node_col, best, node_col, ["nd"],
                num_partitions=num_partitions,
            ).map_batches(
                lambda b: pa.table(
                    {
                        node_col: b.column(node_col),
                        "dist": pc.min_element_wise(
                            b.column("dist"),
                            pc.fill_null(pc.cast(b.column("nd"), pa.int64()), big),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            # newly-reached nodes (in best, not yet in labels) append
            fresh = gated_left_join(
                best, node_col, labels, node_col, ["dist"],
                num_partitions=num_partitions,
            ).map_batches(
                lambda b: pa.table(
                    {
                        node_col: b.filter(
                            pc.is_null(b.column("dist"))
                        ).column(node_col),
                        "dist": pc.cast(
                            b.filter(pc.is_null(b.column("dist"))).column("nd"),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            n_fresh = fresh.count()
            labels = merged.union(fresh).repartition(num_partitions).materialize()
            if n_fresh == 0:
                break

    if nodes_ds is None:
        return labels
    return gated_left_join(
        nodes_ds.select_columns([node_col]), node_col, labels, node_col, ["dist"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {
                node_col: b.column(node_col).cast(pa.int64()),
                "dist": pc.fill_null(pc.cast(b.column("dist"), pa.int64()), -1),
            }
        ),
        batch_format="pyarrow",
    )


def _trustrank_local(
    node_urls: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    seed_urls: set,
    *,
    iterations: int,
    scale: int,
    damp_num: int,
    damp_den: int,
) -> pa.Table:
    """Vectorized in-memory TrustRank solve — PageRank's integer
    fixed-point discipline with teleport and dangling mass restricted
    to the SEED set (uniform over |S|), per Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004 (biased PageRank form):

        r0[v]  = v in S ? scale // |S| : 0
        r'[v]  = (v in S ? ((dd-dn)*scale) // (dd*|S|) : 0)
                 + (dn * (contrib[v] + (v in S ? D // |S| : 0))) // dd

    All quantities positive ints; floor == truncation in every engine.
    With S = all nodes this is exactly PageRank's update."""
    order = np.argsort(node_urls, kind="stable")
    nodes_sorted = node_urls[order]
    n = len(nodes_sorted)
    sd = np.array([u in seed_urls for u in nodes_sorted], dtype=bool)
    ns = int(sd.sum())
    if ns == 0:
        raise ValueError("no seed url present in the node set")
    si = np.searchsorted(nodes_sorted, src)
    di = np.searchsorted(nodes_sorted, dst)
    od = np.bincount(si, minlength=n).astype(np.int64)
    dangling = od == 0
    jump = ((damp_den - damp_num) * scale) // (damp_den * ns)
    r = np.where(sd, scale // ns, 0).astype(np.int64)
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.int64)
        if len(si):
            np.add.at(contrib, di, r[si] // od[si])
        d_mass = int(r[dangling].sum())
        share = d_mass // ns
        r = sd * jump + (damp_num * (contrib + sd * share)) // damp_den
    return pa.table(
        {
            "url": pa.array(nodes_sorted, pa.string()),
            "rank_scaled": pa.array(r.astype(np.int64), pa.int64()),
            "trustrank": pa.array(
                r.astype(np.float64) / float(scale), pa.float64()
            ),
        }
    )


def trustrank(
    pages,
    seed_urls: list[str],
    *,
    iterations: int = 10,
    scale: int = PR_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
    num_partitions: int = 8,
):
    """TrustRank over the corpus link graph: trust mass starts at a
    hand-picked seed set and flows only along links, so pages far from
    trusted seeds score ~0 — the classic link-spam demotion signal
    (complementing :func:`hop_distance`'s hard depth cut with a damped
    continuous one).  Returns (url, rank_scaled int64, trustrank
    double = rank_scaled/scale, one exact division).

    Same two-tier gate as :func:`pagerank` — vectorized driver solve
    under ``broadcast_limit`` graph rows, else the Dataset-resident
    iteration (edges ⋈ ranks hash join + ``sorted_agg`` inbound mass +
    gated left join per round) with the seed flag carried INSIDE the
    state Dataset; tiers are bit-identical (integer arithmetic,
    conformance-tested in tests/test_trustrank.py)."""
    edges = pages_to_edges(pages).materialize()
    nodes = graph_nodes(pages, edges).materialize()
    n_nodes = nodes.count()
    n_edges = edges.count()
    seeds = set(seed_urls)

    if n_nodes + n_edges <= broadcast_limit:
        node_urls = np.asarray(
            [u for b in nodes.iter_batches(batch_size=None, batch_format="pyarrow")
             for u in b.column("url").to_pylist()],
            dtype=object,
        )
        src_l: list = []
        dst_l: list = []
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
            src_l.extend(b.column("src_url").to_pylist())
            dst_l.extend(b.column("dst_url").to_pylist())
        import ray.data

        return ray.data.from_arrow(
            _trustrank_local(
                node_urls,
                np.asarray(src_l, dtype=object),
                np.asarray(dst_l, dtype=object),
                seeds,
                iterations=iterations,
                scale=scale,
                damp_num=damp_num,
                damp_den=damp_den,
            )
        )

    return _trustrank_distributed(
        nodes, edges, seeds,
        iterations=iterations, scale=scale,
        damp_num=damp_num, damp_den=damp_den,
        num_partitions=num_partitions,
    )


def _trustrank_distributed(
    nodes,
    edges,
    seeds: set,
    *,
    iterations: int,
    scale: int,
    damp_num: int,
    damp_den: int,
    num_partitions: int,
):
    """Dataset-resident TrustRank iteration.  State per node:
    (url, od, sd, r) — the seed flag rides the state so each round is
    still one hash join + one sorted_agg + one gated left join; |S| is
    one filtered count up front and the dangling mass one filtered sum
    per round (exact scalars, same as PageRank's)."""
    import pyarrow.compute as _pc

    seed_arr = pa.array(sorted(seeds), pa.string())

    outdeg = sorted_agg(
        edges.map_batches(
            lambda b: b.select(["src_url"]).rename_columns(["url"]),
            batch_format="pyarrow",
        ),
        "url",
        {"od": ("count", "url")},
        auto_threshold=AUTO_THRESHOLD,
    )
    ns = nodes.map_batches(
        lambda b: b.filter(_pc.is_in(b.column("url"), value_set=seed_arr)),
        batch_format="pyarrow",
    ).count()
    if ns == 0:
        raise ValueError("no seed url present in the node set")
    jump = ((damp_den - damp_num) * scale) // (damp_den * ns)
    init = scale // ns

    state = gated_left_join(nodes, "url", outdeg, "url", ["od"]).map_batches(
        lambda b: _unlarge(
            pa.table(
                {
                    "url": b.column("url"),
                    "od": _pc.cast(_pc.fill_null(b.column("od"), 0), pa.int64()),
                    "sd": _pc.cast(
                        _pc.is_in(b.column("url"), value_set=seed_arr),
                        pa.int64(),
                    ),
                    "r": _pc.multiply(
                        _pc.cast(
                            _pc.is_in(b.column("url"), value_set=seed_arr),
                            pa.int64(),
                        ),
                        init,
                    ),
                }
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        d_mass = state.map_batches(
            lambda b: b.filter(_pc.equal(b.column("od"), 0)).select(["r"]),
            batch_format="pyarrow",
        ).sum("r") or 0
        flows = edges.join(
            state.map_batches(
                lambda b: b.select(["url", "od", "r"]).rename_columns(
                    ["src_url", "od", "r"]
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src_url",),
        ).repartition(num_partitions).map_batches(
            lambda b: pa.table(
                {
                    "url": b.column("dst_url"),
                    "c": _pc.cast(
                        _pc.divide(b.column("r"), b.column("od")), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contrib = sorted_agg(
            flows, "url", {"c": ("sum", "c")}, auto_threshold=AUTO_THRESHOLD
        )
        share = d_mass // ns
        state = gated_left_join(
            state.map_batches(
                lambda b: b.select(["url", "od", "sd"]), batch_format="pyarrow"
            ),
            "url",
            contrib,
            "url",
            ["c"],
        ).map_batches(
            lambda b, _j=jump, _sh=share, _dn=damp_num, _dd=damp_den: _unlarge(
                pa.table(
                    {
                        "url": b.column("url"),
                        "od": b.column("od"),
                        "sd": b.column("sd"),
                        "r": pa.array(
                            b.column("sd").to_numpy(zero_copy_only=False) * _j
                            + (
                                _dn
                                * (
                                    _pc.fill_null(b.column("c"), 0)
                                    .cast(pa.int64())
                                    .to_numpy(zero_copy_only=False)
                                    + b.column("sd").to_numpy(
                                        zero_copy_only=False
                                    )
                                    * _sh
                                )
                            )
                            // _dd,
                            pa.int64(),
                        ),
                    }
                )
            ),
            batch_format="pyarrow",
        ).materialize()

    return state.map_batches(
        lambda b, _s=scale: pa.table(
            {
                "url": b.column("url"),
                "rank_scaled": b.column("r"),
                "trustrank": _pc.divide(
                    _pc.cast(b.column("r"), pa.float64()), float(_s)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def resolve_chains(nodes, edges, *, max_rounds: int = 20):
    """Resolve a FUNCTIONAL graph (each node has at most one out-edge;
    acyclic by precondition — redirect maps, canonical-URL pointers,
    merged-doc forwarding stubs) to its terminal target by pointer
    doubling: after round k every pointer has skipped 2^k hops, so the
    longest chain L resolves in ceil(log2(L)) rounds — each round is
    ONE corpus-proportional hash self-join of the pointer table plus a
    scalar advanced-row count (the only thing the driver sees).  A
    per-node walk would need L sequential joins; at web scale redirect
    chains are short but the doubling bound is what makes the worst
    case safe.  Cycles would never resolve — the ``max_rounds`` guard
    raises rather than spinning (production: cut cycles upstream with
    the component labeler).

    ``nodes``: (src) every node; ``edges``: (src, dst) the redirects.
    Returns (src, final, hops) for every node — hops = 0 for nodes
    that do not redirect.
    """
    ptr = gated_left_join(
        nodes.map_batches(
            lambda b: pa.table({"src": pc.cast(b.column("src"), pa.int64())}),
            batch_format="pyarrow",
        ),
        "src",
        edges.map_batches(
            lambda b: pa.table(
                {"esrc": pc.cast(b.column("src"), pa.int64()),
                 "edst": pc.cast(b.column("dst"), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        "esrc", ["edst"],
    ).map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "cur": pc.coalesce(
                    pc.cast(b.column("edst"), pa.int64()), b.column("src")
                ),
                "hops": pc.cast(
                    pc.is_valid(b.column("edst")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        nxt = gated_left_join(
            ptr, "cur",
            ptr.map_batches(
                lambda b: pa.table(
                    {"psrc": b.column("src"), "pcur": b.column("cur"),
                     "phops": b.column("hops")}
                ),
                batch_format="pyarrow",
            ),
            "psrc", ["pcur", "phops"],
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "cur": pc.coalesce(
                        pc.cast(b.column("pcur"), pa.int64()), b.column("cur")
                    ),
                    "hops": pc.add(
                        b.column("hops"),
                        pc.coalesce(
                            pc.cast(b.column("phops"), pa.int64()),
                            pa.scalar(0, pa.int64()),
                        ),
                    ),
                    "adv": pc.cast(
                        pc.greater(
                            pc.coalesce(
                                pc.cast(b.column("phops"), pa.int64()),
                                pa.scalar(0, pa.int64()),
                            ),
                            pa.scalar(0, pa.int64()),
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        advanced = nxt.sum("adv") or 0
        # keep the adv column — the next round's join kernel and the
        # final return map both build explicit column lists, and a
        # drop_columns().materialize() would copy the whole
        # corpus-sized pointer table a second time per round
        ptr = nxt
        if advanced == 0:
            return ptr.map_batches(
                lambda b: pa.table(
                    {"src": b.column("src"), "final": b.column("cur"),
                     "hops": b.column("hops")}
                ),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        f"resolve_chains: not settled after {max_rounds} doubling rounds "
        "(cycle in the redirect graph, or a chain longer than "
        f"2^{max_rounds})"
    )
