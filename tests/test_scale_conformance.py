"""Rank-identity at a larger scale: 1500-doc corpus, bucket_bits=3 —
stresses multi-bucket posting concatenation, cross-bucket block-max
metadata, and WAND pruning with deeper posting lists."""

import os

import pyarrow.parquet as pq
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_ds
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine
from search_engine_core_ray.scoring.oracle import BM25Oracle, OracleDoc

QUERIES = [
    "apple",
    "banana recipe",
    "apple OR banana OR cherry",
    '"machine learning"',
    "site:github.com apple",
    "language:fa",
    "mail setup",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("big_index"))
    pages = synth_pages_ds(SynthConfig(n_docs=1500, seed=101, n_domains=24), blocks=8)
    build_index(pages, index_dir, lineage="big", num_shards=8, bucket_bits=3)
    return index_dir


@pytest.fixture(scope="module")
def oracle(built):
    t = pq.read_table(os.path.join(built, "docstore"))
    docs = [
        OracleDoc(
            doc_id=r["doc_id"], url=r["norm_url"], title=r["title"] or "",
            content=r["text"] or "", description=r["meta_description"] or "",
            keywords=r["keywords"] or [], domain=r["domain"] or "",
            quality=r["quality"], lang=r["lang"] or "",
        )
        for r in t.to_pylist()
    ]
    return BM25Oracle(docs)


def test_multi_bucket_postings_sorted(built):
    eng = SearchEngine(built)
    for term in ["apple", "mail", "data", "the"]:
        p = eng._postings(term)
        if p is None:
            continue
        ids = p[0]
        assert (ids[1:] > ids[:-1]).all(), term  # strictly ascending across buckets


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_at_scale(built, oracle, query):
    engine = SearchEngine(built)
    got = engine.rank(query, top_k=10)
    exp = oracle.rank(query, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in exp], query
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9), (query, gd)


def test_wand_matches_at_scale(built):
    engine = SearchEngine(built)
    for query in ["apple", "banana recipe", "apple OR banana OR cherry", "mail setup"]:
        fid = engine.rank(query, top_k=10)
        fast = engine.search_topk_wand(query, k=10)
        assert [d for d, _ in fast] == [d for d, _ in fid], query
