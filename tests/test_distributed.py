"""Doc-partitioned distributed serving: every bucket actor holds only
its docID-range slice, yet results are identical to the whole-index
engine (global stats injected per query)."""

import numpy as np
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_ds
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.distributed import DistributedSearch
from search_engine_core_ray.query.engine import SearchEngine

QUERIES = [
    "apple",
    "banana recipe",
    "apple OR banana OR cherry",
    '"machine learning"',
    "site:github.com apple",
    "language:fa",
    "mail setup",
    "ApPlE",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("dist_index"))
    pages = synth_pages_ds(SynthConfig(n_docs=800, seed=202, n_domains=16), blocks=4)
    build_index(pages, index_dir, lineage="dist", num_shards=8, bucket_bits=2)
    return index_dir


@pytest.fixture(scope="module")
def dist(built):
    d = DistributedSearch(built)
    yield d
    d.shutdown()


def test_actors_are_partitioned(built, dist):
    """Each bucket actor holds a strict subset of the docstore."""
    import ray

    full = SearchEngine(built)
    sizes = []
    for a in dist.actors:
        # engine.N is global (manifest); measure the actor's local slice
        n_local = len(ray.get(a.hydrate.remote([], []))) or 0  # no-op probe
        sizes.append(n_local)
    # instead assert via local df sums: each actor's df <= global df
    dfs = ray.get([a.local_dfs.remote(["apple", "mail"]) for a in dist.actors])
    for term in ("apple", "mail"):
        total = sum(d[term] for d in dfs)
        p = full._postings(term)
        assert total == (p[4] if p else 0), term
        assert all(d[term] < total for d in dfs if total > 0)  # genuinely split


@pytest.mark.parametrize("query", QUERIES)
def test_distributed_matches_single_engine(built, dist, query):
    eng = SearchEngine(built)
    a = dist.search(query, limit=10)
    b = eng.search(query, limit=10)
    assert a["total"] == b["total"], query
    assert [r["doc_id"] for r in a["results"]] == [r["doc_id"] for r in b["results"]], query
    for ra, rb in zip(a["results"], b["results"]):
        assert ra["score"] == pytest.approx(rb["score"], abs=1e-12), query
        assert ra["url"] == rb["url"]


def test_distributed_pagination(built, dist):
    eng = SearchEngine(built)
    a = dist.search("apple OR banana OR cherry", limit=5, offset=5)
    b = eng.search("apple OR banana OR cherry", limit=5, offset=5)
    assert [r["doc_id"] for r in a["results"]] == [r["doc_id"] for r in b["results"]]


def test_distributed_topk_matches(built, dist):
    eng = SearchEngine(built)
    for q in ["apple", "banana recipe", "apple OR banana OR cherry"]:
        a = dist.topk(q, k=10)
        b = eng.search_topk_wand(q, k=10)
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (da, sa), (db, sb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-12)


def test_distributed_respects_tombstones(built, ray_session, tmp_path_factory):
    """Bucket actors load tombstones too: a domain deleted after build
    disappears from distributed results."""
    import shutil

    from search_engine_core_ray.index.delete import tombstone_domain

    # work on a copy so the module-scoped fixtures stay pristine
    copy_dir = str(tmp_path_factory.mktemp("dist_tomb"))
    shutil.copytree(built, copy_dir, dirs_exist_ok=True)
    n = tombstone_domain(copy_dir, "github.com")
    assert n > 0
    d = DistributedSearch(copy_dir)
    try:
        assert d.search("site:github.com")["total"] == 0
        for hit in d.search("apple OR banana", limit=50)["results"]:
            assert hit["domain"] != "github.com"
    finally:
        d.shutdown()


def test_distributed_topk_phrase_and_filter_queries(built, dist):
    """Regression: bucket-local normalized scores are incomparable —
    phrase/filter top-k must route through the global fidelity path."""
    eng = SearchEngine(built)
    for q in ['"machine learning"', "site:github.com apple", "language:fa"]:
        a = dist.topk(q, k=10)
        b = eng.search_topk_wand(q, k=10)
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (da, sa), (db, sb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-12), q


def test_bucket_mode_tfidf_requires_global_df_tc(built):
    # a direct bucket engine scoring tfidf WITHOUT the coordinator's
    # global title+content dfs must refuse rather than serve silently
    # wrong scores (bucket-local df_tc against global N)
    import pytest as _pytest

    eng = SearchEngine(built, bucket=0, algorithm="tfidf")
    with _pytest.raises(RuntimeError, match="df_tc_override"):
        eng.search("apple", limit=3)


@pytest.mark.parametrize("algorithm", ["tfidf", "combined"])
def test_distributed_non_bm25_matches_single_engine(built, algorithm):
    """The second statistics exchange (global df_tc for tfidf) makes
    doc-partitioned serving rank-identical for every algorithm."""
    eng = SearchEngine(built, algorithm=algorithm)
    dist = DistributedSearch(built, algorithm=algorithm)
    try:
        for q in QUERIES:
            got = dist.search(q, limit=10)
            exp = eng.search(q, limit=10)
            assert [r["doc_id"] for r in got["results"]] == [
                r["doc_id"] for r in exp["results"]
            ], (algorithm, q)
            for g, e in zip(got["results"], exp["results"]):
                assert g["score"] == pytest.approx(e["score"], abs=1e-9)
            assert got["total"] == exp["total"]
        # topk routes non-bm25 through the global fidelity path
        t = dist.topk("apple OR banana", k=5)
        f = eng.search("apple OR banana", limit=5)["results"]
        assert [d for d, _ in t] == [r["doc_id"] for r in f]
    finally:
        dist.shutdown()


def test_bucket_engine_prunes_docstore_read(built):
    """A bucket engine must open ONLY its hive partition's parquet
    files (docstore is written partitioned by the same docID-range key
    as the segments) and hold ~ N / 2^bits rows."""
    import os

    full = SearchEngine(built)
    n_total = len(full.doc_ids)
    all_files = set(full._docstore_files_read)
    seen = 0
    for j in range(4):  # bucket_bits=2
        eng = SearchEngine(built, bucket=j)
        assert eng._docstore_files_read, f"bucket {j} read no files"
        for f in eng._docstore_files_read:
            assert os.sep + f"bucket={j}" + os.sep in f, f
        assert set(eng._docstore_files_read) < all_files
        assert 0 < len(eng.doc_ids) < n_total
        seen += len(eng.doc_ids)
    assert seen == n_total


def test_actor_rss_probe(built, dist):
    """Every bucket actor reports a positive, plausible peak RSS —
    the per-actor memory number the bench's 16-bucket line records."""
    rss = dist.actor_rss_mb()
    assert len(rss) == dist.n_buckets
    assert all(10.0 < r < 16_384.0 for r in rss)


@pytest.mark.parametrize("per", [2, 4])
def test_grouped_actors_match_single_engine(built, per):
    """buckets_per_actor groups contiguous buckets into per-node
    serving daemons — results must be identical to both the pure
    1-bucket-per-actor shape and the whole-index engine (df sums,
    candidate disjointness and hydrate routing are all preserved)."""
    eng = SearchEngine(built)
    g = DistributedSearch(built, buckets_per_actor=per)
    try:
        assert len(g.actors) == max(1, 4 // per)  # bucket_bits=2 fixture
        for query in QUERIES:
            a = g.search(query, limit=10, highlight=True)
            b = eng.search(query, limit=10, highlight=True)
            assert a["total"] == b["total"], query
            assert [r["doc_id"] for r in a["results"]] == [
                r["doc_id"] for r in b["results"]
            ], query
            for ra, rb in zip(a["results"], b["results"]):
                assert ra["score"] == pytest.approx(rb["score"], abs=1e-12)
                assert ra["url"] == rb["url"]
                assert ra.get("highlights") == rb.get("highlights")
        for q in ["apple", "banana recipe", "apple OR banana OR cherry"]:
            ta = g.topk(q, k=10)
            tb = eng.search_topk_wand(q, k=10)
            assert [d for d, _ in ta] == [d for d, _ in tb], q
            for (da, sa), (db, sb) in zip(ta, tb):
                assert sa == pytest.approx(sb, abs=1e-12)
    finally:
        g.shutdown()


def test_grouped_actor_count_rounds_up(built):
    """5 buckets at per=4 would need 2 actors; the bucket_bits=2
    fixture has 4 buckets, so per=3 yields ceil(4/3)=2 actors with
    slices [0,1,2] and [3]."""
    g = DistributedSearch(built, buckets_per_actor=3)
    try:
        assert len(g.actors) == 2
        r = g.search("apple", limit=10)
        assert r["total"] == SearchEngine(built).search("apple", limit=10)["total"]
    finally:
        g.shutdown()
