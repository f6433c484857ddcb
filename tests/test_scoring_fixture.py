"""BM25 conformance on the reference's 4-doc fixture (FIXTURES.md F5,
ported from tests/scoring/test_search_scorer.cpp:11-156, 158-353).

The reference scorer tests run WITHOUT corpus-stats updates, so the
oracle here uses update_corpus_stats=False (N=1000, avgdl=100, df=0),
matching BM25Algorithm's never-updated defaults.
"""

import pytest

from search_engine_core_ray.scoring.config import ScoringConfig
from search_engine_core_ray.scoring.oracle import BM25Oracle, OracleDoc


def fixture_docs():
    rows = [
        (1, "doc1", "Introduction to Machine Learning",
         "Machine learning is a subset of artificial intelligence that focuses on algorithms.",
         "A comprehensive guide to ML", "example.com", 1.0),
        (2, "doc2", "Python Programming Tutorial",
         "Python is a versatile programming language used for machine learning and data science.",
         "Learn Python from scratch", "github.com", 0.9),
        (3, "doc3", "Deep Learning with Neural Networks",
         "Deep learning uses artificial neural networks to model complex patterns in data.",
         "Advanced ML techniques", "stackoverflow.com", 0.8),
        (4, "doc4", "Data Science Fundamentals",
         "Data science combines statistics, programming, and domain knowledge.",
         "Essential data science concepts", "medium.com", 0.7),
    ]
    return [
        OracleDoc(doc_id=i, url=u, title=t, content=c, description=d,
                  keywords=[], domain=dom, quality=q)
        for i, u, t, c, d, dom, q in rows
    ]


@pytest.fixture(scope="module")
def oracle():
    return BM25Oracle(fixture_docs(), update_corpus_stats=False)


def test_default_config_values():
    c = ScoringConfig.create_default()
    assert c.field_weights.title == 5.0
    assert c.field_weights.content == 1.0
    assert c.field_weights.description == 3.0
    assert c.field_weights.keywords == 4.0
    assert c.boost_factors.exact_match_boost == 2.0
    assert c.boost_factors.title_match_boost == 1.5
    assert c.bm25_params.k1 == 1.2
    assert c.bm25_params.b == 0.75


def test_preset_configs():
    th = ScoringConfig.create_title_heavy()
    assert th.field_weights.title == 10.0
    assert th.field_weights.content == 0.5
    assert th.boost_factors.title_match_boost == 2.0
    ch = ScoringConfig.create_content_heavy()
    assert ch.field_weights.title == 3.0
    assert ch.field_weights.content == 2.0
    assert ch.tf_params.max_term_frequency == 20.0


def test_single_term_title_beats_content(oracle):
    scores = dict(oracle.score_results("machine"))
    # doc1 has "machine" in title (weight 5.0); doc2 only in content
    assert len(scores) >= 2
    assert scores[1] > scores[2]


def test_multi_term_doc1_first(oracle):
    ranked = oracle.rank_results("machine learning", top_k=2)
    assert len(ranked) >= 1
    assert ranked[0][0] == 1


def test_exact_phrase_boost(oracle):
    # phrase query boosts doc1 (phrase in both title-insensitive? content)
    with_phrase = dict(
        (i, s) for i, s in _raw_scores(oracle, '"machine learning"')
    )
    without = dict((i, s) for i, s in _raw_scores(oracle, "machine learning"))
    assert with_phrase[1] > without[1]


def _raw_scores(oracle, q):
    """Scores before normalization (for monotonic comparisons)."""
    from search_engine_core_ray.query.parser import parse_query
    from search_engine_core_ray.query.plan import exact_phrases, scoring_terms

    ast = parse_query(q)
    terms = scoring_terms(ast)
    phrases = exact_phrases(ast)
    return [(d.doc_id, oracle.score_doc(d, terms, phrases)) for d in oracle.docs]


def test_topk_size_and_descending(oracle):
    ranked = oracle.rank_results("learning", top_k=2)
    assert len(ranked) <= 2
    scores = [s for _, s in ranked]
    assert scores == sorted(scores, reverse=True)


def test_scores_normalized_01(oracle):
    for _, s in oracle.score_results("machine learning data"):
        assert 0.0 <= s <= 1.0


def test_domain_authority_boost():
    # identical docs except domain: github.com gets the 1.2 boost
    docs = [
        OracleDoc(doc_id=1, url="a", title="x", content="apple pie recipe",
                  description="", keywords=[], domain="github.com", quality=1.0),
        OracleDoc(doc_id=2, url="b", title="x", content="apple pie recipe",
                  description="", keywords=[], domain="example.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False)
    raw = dict(_raw_scores(o, "apple"))
    assert raw[1] == pytest.approx(raw[2] / 1.0 * 2.2 / 1.0)  # (1+1.2)/(1+0)
    assert raw[1] > raw[2]


def test_title_match_boost_case_sensitive():
    # applyBoosts uses raw-title substring: lowercase term vs capitalized
    # title does NOT get the boost (reference quirk frozen)
    docs = [
        OracleDoc(doc_id=1, url="a", title="apple pie", content="zz apple",
                  description="", keywords=[], domain="x.com", quality=1.0),
        OracleDoc(doc_id=2, url="b", title="Apple Pie", content="zz apple",
                  description="", keywords=[], domain="x.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False)
    raw = dict(_raw_scores(o, "apple"))
    assert raw[1] > raw[2]


def test_keyword_score():
    docs = [
        OracleDoc(doc_id=1, url="a", title="t", content="apple here",
                  description="", keywords=["apple"], domain="x.com", quality=1.0),
        OracleDoc(doc_id=2, url="b", title="t", content="apple here",
                  description="", keywords=[], domain="x.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False)
    raw = dict(_raw_scores(o, "apple"))
    assert raw[1] - raw[2] == pytest.approx(4.0)  # keywords weight


def test_base_score_multiplier():
    docs = [
        OracleDoc(doc_id=1, url="a", title="t", content="apple", description="",
                  keywords=[], domain="x.com", quality=0.5),
        OracleDoc(doc_id=2, url="b", title="t", content="apple", description="",
                  keywords=[], domain="x.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False)
    raw = dict(_raw_scores(o, "apple"))
    assert raw[1] == pytest.approx(raw[2] * 0.5)


def test_min_score_filter():
    docs = [
        OracleDoc(doc_id=1, url="a", title="t", content="nothing relevant",
                  description="", keywords=[], domain="x.com", quality=1.0),
    ]
    o = BM25Oracle(docs, update_corpus_stats=False)
    assert o.score_results("absent") == []


def test_negative_idf_with_real_stats():
    # df > N/2 makes idf negative — no floor (SearchScorer.cpp:266)
    docs = [
        OracleDoc(doc_id=i, url=str(i), title="", content="common word",
                  description="", keywords=[], domain="x.com", quality=1.0)
        for i in range(1, 4)
    ]
    o = BM25Oracle(docs, update_corpus_stats=True)
    raw = dict(_raw_scores(o, "common"))
    assert raw[1] < 0


def test_offset_boost_config_roundtrip():
    # config-surface parity with the reference's hot-reloadable Scorer
    # (src/search_core/Scorer.cpp:60-75): default 0.1, JSON override
    c = ScoringConfig.create_default()
    assert c.offset_boost == 0.1
    c2 = ScoringConfig.from_json('{"offset_boost": 0.25}')
    assert c2.offset_boost == 0.25
    import json as _json

    rt = ScoringConfig.from_json(c2.to_json())
    assert rt.offset_boost == 0.25
    assert _json.loads(c2.to_json())["offset_boost"] == 0.25
