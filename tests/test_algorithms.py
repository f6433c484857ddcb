"""TF-IDF and Combined scoring algorithms: reference-behavior unit tests
(ported from tests/scoring/test_search_scorer.cpp:130-200) plus
rank-identity of engine vs oracle for every algorithm."""

import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine
from search_engine_core_ray.scoring.oracle import BM25Oracle, OracleDoc


def fixture_docs():
    rows = [
        (1, "Introduction to Machine Learning",
         "Machine learning is a subset of artificial intelligence that focuses on algorithms.",
         "A comprehensive guide to ML", "example.com", 1.0),
        (2, "Python Programming Tutorial",
         "Python is a versatile programming language used for machine learning and data science.",
         "Learn Python from scratch", "github.com", 0.9),
        (3, "Deep Learning with Neural Networks",
         "Deep learning uses artificial neural networks to model complex patterns in data.",
         "Advanced ML techniques", "stackoverflow.com", 0.8),
        (4, "Data Science Fundamentals",
         "Data science combines statistics, programming, and domain knowledge.",
         "Essential data science concepts", "medium.com", 0.7),
    ]
    return [
        OracleDoc(doc_id=i, url=f"doc{i}", title=t, content=c, description=d,
                  keywords=[], domain=dom, quality=q)
        for i, t, c, d, dom, q in rows
    ]


def test_tfidf_learning_docs_positive():
    o = BM25Oracle(fixture_docs(), update_corpus_stats=False, algorithm="tfidf")
    scores = dict(o.score_results("learning"))
    assert scores.get(1, 0) > 0
    assert scores.get(3, 0) > 0


def test_tfidf_rare_term_scores():
    o = BM25Oracle(fixture_docs(), update_corpus_stats=False, algorithm="tfidf")
    neural = dict(o.score_results("neural"))
    assert neural.get(3, 0) > 0


def test_tfidf_idf_rarer_term_higher():
    # with real stats: df(neural)=1 < df(learning)=3 -> higher idf
    o = BM25Oracle(fixture_docs(), algorithm="tfidf")
    assert o._tfidf_idf("neural") > o._tfidf_idf("learning")


def test_tfidf_no_keyword_score():
    docs = [
        OracleDoc(doc_id=1, url="a", title="t", content="apple pie",
                  description="", keywords=["apple"], domain="x.com", quality=1.0),
        OracleDoc(doc_id=2, url="b", title="t", content="apple pie",
                  description="", keywords=[], domain="x.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False, algorithm="tfidf")
    from search_engine_core_ray.query.parser import parse_query
    from search_engine_core_ray.query.plan import exact_phrases, scoring_terms

    ast = parse_query("apple")
    s1 = o.score_doc(o.docs[0], scoring_terms(ast), exact_phrases(ast))
    s2 = o.score_doc(o.docs[1], scoring_terms(ast), exact_phrases(ast))
    assert s1 == s2  # keywords play no role in TFIDFAlgorithm


def test_combined_blend_30_70():
    docs = [
        OracleDoc(doc_id=1, url="a", title="t", content="apple", description="",
                  keywords=[], domain="x.com", quality=0.8),
    ]
    bm = BM25Oracle(docs, update_corpus_stats=False, algorithm="bm25")
    co = BM25Oracle(docs, update_corpus_stats=False, algorithm="combined")
    from search_engine_core_ray.query.parser import parse_query
    from search_engine_core_ray.query.plan import scoring_terms

    terms = scoring_terms(parse_query("apple"))
    raw_bm = bm.score_doc(bm.docs[0], terms, [])
    raw_co = co.score_doc(co.docs[0], terms, [])
    # boost factor (1+0) identical; blend applies before boosts
    assert raw_co == pytest.approx(0.8 * 0.3 + raw_bm * 0.7)


ALGOS = ["bm25", "tfidf", "combined"]
ALG_QUERIES = ["search", "machine learning", "apple OR banana", '"machine learning"',
               "site:github.com data", "language:fa search"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("alg_index"))
    pages = synth_pages_table(SynthConfig(n_docs=180, seed=77))
    build_index(ray.data.from_arrow(pages), index_dir, lineage="alg", num_shards=8)
    return index_dir


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("query", ALG_QUERIES)
def test_engine_oracle_rank_identical_all_algorithms(built, algo, query):
    import os

    import pyarrow.parquet as pq

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
    oracle = BM25Oracle(docs, algorithm=algo)
    engine = SearchEngine(built, algorithm=algo)
    got = engine.rank(query, top_k=10)
    exp = oracle.rank(query, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in exp], (algo, query)
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9), (algo, query, gd)


def test_wand_falls_back_for_non_bm25(built):
    """Regression: BM25-shaped block bounds must not prune tfidf /
    combined scoring — the pruned path falls back to fidelity."""
    for algo in ("tfidf", "combined"):
        eng = SearchEngine(built, algorithm=algo)
        for q in ["search", "machine learning", "apple OR banana"]:
            fid = eng.rank(q, top_k=10)
            fast = eng.search_topk_wand(q, k=10)
            assert [d for d, _ in fast] == [d for d, _ in fid], (algo, q)
