"""Block-max pruning on a tf-SKEWED corpus.

The default synth corpus has near-uniform per-doc tf, so every chunk's
score bound clears the heap minimum and pruning cannot fire — that is
an information-theoretic property of flat score distributions, not a
bug (finding top-k among near-ties requires scoring ~everything).
``SynthConfig.tf_zipf_frac`` plants Pareto-tail topic bursts so block
bounds vary like a real web corpus. These tests pin that on such a
corpus the exact positions-space bounds (a) stay rank-identical to the
fidelity path, (b) actually skip chunks, and (c) are true upper bounds.
"""

import numpy as np
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine

QUERIES = [
    "search",
    "data",
    "machine",
    "index",
    "machine learning",
    "apple OR banana",
    "data OR machine OR python",
]


@pytest.fixture(scope="module")
def skew_engine(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("skew_idx"))
    pages = synth_pages_table(
        SynthConfig(n_docs=6000, seed=7, tf_zipf_frac=0.35)
    )
    build_index(
        ray.data.from_arrow(pages),
        index_dir,
        lineage="skew-6000-7",
        num_shards=8,
        bucket_bits=0,
    )
    return SearchEngine(index_dir)


def test_zipf_knob_changes_tf_distribution():
    base = synth_pages_table(SynthConfig(n_docs=300, seed=7))
    skew = synth_pages_table(SynthConfig(n_docs=300, seed=7, tf_zipf_frac=0.5))

    import re

    def has_burst(tbl):
        pat = re.compile(r"\b(\w+)( \1){9}\b")
        return any(pat.search(t) for t in tbl.column("text").to_pylist())

    assert has_burst(skew) and not has_burst(base)


def test_zipf_off_is_byte_identical_to_legacy_corpus():
    a = synth_pages_table(SynthConfig(n_docs=100, seed=3))
    b = synth_pages_table(SynthConfig(n_docs=100, seed=3, tf_zipf_frac=0.0))
    assert a.equals(b)


def test_rank_identity_on_skewed_corpus(skew_engine):
    eng = skew_engine
    for q in QUERIES:
        fid = eng.search(q, limit=10)["results"]
        fast = eng.search_topk_wand(q, k=10)
        assert [r["doc_id"] for r in fid] == [d for d, _ in fast], q


def test_pruning_fires_on_skewed_corpus(skew_engine):
    eng = skew_engine
    eng.prune_stats = {"chunks": 0, "pruned": 0, "pruned_cands": 0}
    for q in QUERIES:
        eng.search_topk_wand(q, k=10)
    assert eng.prune_stats["pruned_cands"] > 0, eng.prune_stats


def test_block_bounds_are_true_upper_bounds(skew_engine):
    """Per block: bound >= idf * fscore of every posting in the block
    (the quantity the chunk scorer compares against the heap min)."""
    eng = skew_engine
    for term in ("search", "data", "machine"):
        tb = eng._term_block_bounds([term])[0]
        if tb is None:
            continue
        blk_last, ub = tb[0], tb[1]
        p = eng._postings_pos(term)
        pos, df = p[0], p[4]
        idf = max(0.0, float(np.log((eng.N - df + 0.5) / (df + 0.5))))
        fs = eng._fscores(term)
        blk = np.searchsorted(blk_last, pos)
        assert (idf * fs <= ub[blk] + 1e-12).all()
