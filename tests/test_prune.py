"""Static index pruning (index/prune.py): pure-kernel properties,
score preservation (single-term top-k identical to the full index),
the no-op-prune identity, codec round-trip through pruning, and the
shared-docstore manifest contract."""

import glob
import os

import numpy as np
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index, load_manifest
from search_engine_core_ray.index.prune import (
    fidelity_at_k,
    prune_index,
    prune_shard_table,
)
from search_engine_core_ray.index.segments import shard_of_term
from search_engine_core_ray.query.engine import SearchEngine

SINGLE_TERM_QUERIES = ["search", "data", "vector", "dup", "apple", "machine"]
MIXED_QUERIES = SINGLE_TERM_QUERIES + [
    "machine OR python", "table merge", '"the quick"', "prog*",
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("prune")
    pages = synth_pages_table(SynthConfig(n_docs=1500, seed=77))
    full_dir = str(d / "full")
    build_index(ray.data.from_arrow(pages), full_dir, lineage="p", num_shards=4)
    pruned_dir = str(d / "pruned")
    metrics = prune_index(full_dir, pruned_dir, max_postings=48)
    return {"full": full_dir, "pruned": pruned_dir, "metrics": metrics, "dir": d}


def test_prune_shrinks_postings_and_segments(idx):
    m = idx["metrics"]
    assert 0 < m["postings_after"] < m["postings_before"]

    def seg_bytes(d):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(d, "segments", "*", "*.parquet"))
        )

    assert seg_bytes(idx["pruned"]) < seg_bytes(idx["full"])


def test_pruned_manifest_shares_docstore(idx):
    m = load_manifest(idx["pruned"])
    assert m["docstore_dir"] == os.path.join(idx["full"], "docstore")
    assert m["pruned"]["max_postings"] == 48
    assert not os.path.isdir(os.path.join(idx["pruned"], "docstore"))
    # the engine actually loads the parent docstore
    e = SearchEngine(idx["pruned"])
    assert e.N == SearchEngine(idx["full"]).N


def test_per_term_cap_and_subset_and_df_preserved(idx):
    full = SearchEngine(idx["full"])
    pruned = SearchEngine(idx["pruned"])
    checked = 0
    for term in ["search", "data", "apple", "vector", "machine", "banana"]:
        s = shard_of_term(term, full.num_shards)
        fp = full._reader(s).postings(term)
        pp = pruned._reader(s).postings(term)
        if fp is None:
            assert pp is None
            continue
        fids = fp[0]
        if pp is None:
            assert len(fids) == 0
            continue
        pids = pp[0]
        assert len(pids) <= 48
        assert set(pids) <= set(fids)
        # ORIGINAL df preserved => surviving postings score identically
        assert pruned._reader(s).df(term) == full._reader(s).df(term)
        # tf alignment survived the re-encode
        fmap = {i: (a, b, c) for i, a, b, c in zip(*fp)}
        for i, a, b, c in zip(*pp):
            assert fmap[i] == (a, b, c)
        checked += 1
    assert checked >= 4


def test_single_term_topk_identical_to_full(idx):
    """Score preservation: for one-term queries every full top-10
    winner survives a 48-posting cut at this corpus shape, and its raw
    score is unchanged, so the pruned ranking equals the full one."""
    full = SearchEngine(idx["full"])
    pruned = SearchEngine(idx["pruned"])
    hits = 0
    for q in SINGLE_TERM_QUERIES:
        rf = [r["doc_id"] for r in full.search(q, limit=10)["results"]]
        rp = [r["doc_id"] for r in pruned.search(q, limit=10)["results"]]
        assert rf == rp, q
        hits += len(rf) > 0
    assert hits >= 3  # the comparison must not be vacuous


def test_noop_prune_is_identity(ray_session, idx):
    """max_postings >= every df leaves results (and fidelity) exactly
    intact — the degenerate-parameter pin."""
    noop_dir = str(idx["dir"] / "noop")
    prune_index(idx["full"], noop_dir, max_postings=10**9)
    full = SearchEngine(idx["full"])
    noop = SearchEngine(noop_dir)
    assert fidelity_at_k(full, noop, MIXED_QUERIES, 10) == 1.0
    for q in MIXED_QUERIES:
        rf = full.search(q, limit=15)
        rn = noop.search(q, limit=15)
        assert [r["doc_id"] for r in rf["results"]] == [
            r["doc_id"] for r in rn["results"]
        ], q
        assert rf["total"] == rn["total"], q


def test_fidelity_reasonable_and_improves_with_k(ray_session, idx):
    full = SearchEngine(idx["full"])
    tight = SearchEngine(idx["pruned"])  # k=48
    loose_dir = str(idx["dir"] / "loose")
    prune_index(idx["full"], loose_dir, max_postings=512)
    loose = SearchEngine(loose_dir)
    f_tight = fidelity_at_k(full, tight, MIXED_QUERIES, 10)
    f_loose = fidelity_at_k(full, loose, MIXED_QUERIES, 10)
    assert f_loose >= f_tight - 1e-9
    assert f_loose >= 0.8  # the honest quality bar at a ~gentle cut


def test_prune_pfor_index(ray_session, tmp_path):
    """Pruning decodes/re-encodes through the manifest codec."""
    pages = synth_pages_table(SynthConfig(n_docs=400, seed=9))
    full_dir = str(tmp_path / "full_pfor")
    build_index(
        ray.data.from_arrow(pages), full_dir, lineage="p", num_shards=2, codec="pfor"
    )
    pruned_dir = str(tmp_path / "pruned_pfor")
    prune_index(full_dir, pruned_dir, max_postings=32)
    e = SearchEngine(pruned_dir)
    assert e.manifest["codec"] == "pfor"
    full = SearchEngine(full_dir)
    for q in SINGLE_TERM_QUERIES:
        rf = [r["doc_id"] for r in full.search(q, limit=10)["results"]]
        rp = [r["doc_id"] for r in e.search(q, limit=10)["results"]]
        assert rf == rp, q


def test_prune_rejects_bad_k(ray_session, idx):
    with pytest.raises(ValueError):
        prune_index(idx["full"], str(idx["dir"] / "bad"), max_postings=0)


def test_prune_kernel_picks_top_impact(ray_session, idx):
    """The kernel's survivors for a head term are exactly the top-k by
    the documented impact, independently recomputed here from the full
    engine's internals."""
    full = SearchEngine(idx["full"])
    pruned = SearchEngine(idx["pruned"])
    term = max(
        SINGLE_TERM_QUERIES,
        key=lambda t: full._reader(shard_of_term(t, full.num_shards)).df(t),
    )
    s = shard_of_term(term, full.num_shards)
    fp = full._reader(s).postings(term)
    ids, tft, tfc, tfd = fp
    if len(ids) <= 48:
        pytest.skip("corpus too small to exercise the cut")
    pos = np.searchsorted(full.doc_ids, ids)
    fs = full._fscores(term)
    df = full._reader(s).df(term)
    idf = np.log((full.N - df + 0.5) / (df + 0.5))
    kw = np.zeros(len(ids))
    kw_ids = full.kw_postings.get(term)
    if kw_ids is not None and len(kw_ids):
        kw[np.isin(pos, kw_ids)] = full.config.field_weights.keywords
    q = full.quality[pos]
    impact = (
        (idf * fs + kw)
        * np.where(q > 0, q, 1.0)
        * (
            1.0
            + full.config.boost_factors.domain_authority_boost
            * full.is_authority[pos]
            + full.config.boost_factors.title_match_boost * (tft > 0)
        )
    )
    order = np.lexsort((ids, -impact))
    expect = set(ids[order[:48]].tolist())
    got = set(pruned._reader(s).postings(term)[0].tolist())
    assert got == expect
