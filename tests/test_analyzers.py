"""Analyzer hook: scalar/polars equivalence, stemming behavior, and
engine-vs-oracle rank identity for an en_stem-built index."""

import polars as pl
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.functions.analyzers import (
    ANALYZERS,
    analyze,
    polars_term_expr,
    stem_token,
)
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine
from search_engine_core_ray.scoring.oracle import BM25Oracle, OracleDoc


def test_default_analyzer_is_reference_tokenizer():
    assert analyze("Machine Learning is AWESOME!") == [
        "machine", "learning", "is", "awesome",
    ]


def test_stem_rules():
    assert stem_token("cities") == "city"
    assert stem_token("glasses") == "glass"
    assert stem_token("moves") == "move"
    assert stem_token("running") == "runn"  # toy stemmer, no doubling rule
    assert stem_token("indexed") == "index"
    assert stem_token("class") == "class"   # ss preserved
    assert stem_token("is") == "is"


def test_scalar_matches_polars_path():
    words = [
        "cities", "glasses", "moves", "running", "indexed", "class", "is",
        "learning", "queries", "parsed", "bosses", "seeds", "breeds", "data",
        "xs", "ss", "inging", "eding",
    ]
    for analyzer in ANALYZERS:
        scalar = [analyze(w, analyzer) for w in words]
        df = pl.DataFrame({"tok": words}).with_columns(
            polars_term_expr(pl.col("tok"), analyzer).alias("out")
        )
        vector = [[v] if v else [] for v in df["out"].to_list()]
        # scalar analyze() tokenizes first; these inputs are single tokens
        assert scalar == vector, analyzer


@pytest.fixture(scope="module")
def stem_built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("stem_index"))
    pages = synth_pages_table(SynthConfig(n_docs=160, seed=33))
    build_index(
        ray.data.from_arrow(pages), index_dir, lineage="stem",
        num_shards=4, analyzer="en_stem",
    )
    return index_dir


def test_manifest_records_analyzer(stem_built):
    eng = SearchEngine(stem_built)
    assert eng.manifest["analyzer"] == "en_stem"
    assert eng.text_analyzer == "en_stem"


def test_stemmed_terms_unify(stem_built):
    """'learning' and 'learnings'(hypothetical) queries hit the same
    postings because both stem identically at build and query time."""
    eng = SearchEngine(stem_built)
    # synth vocab contains 'learning'; stem = 'learn' + 'ing'? ->
    # 'learning' stems via rule 4 to 'learn'
    assert stem_token("learning") == "learn"
    a = [d for d, _ in eng.rank("learning", top_k=20)]
    b = [d for d, _ in eng.rank("learn", top_k=20)]
    assert a == b
    # the index holds only the stemmed form, with merged df
    assert eng._postings("learn") is not None
    assert eng._postings("learning") is None


def test_engine_oracle_rank_identical_with_stemming(stem_built):
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(stem_built, "docstore"))
    docs = [
        OracleDoc(
            doc_id=r["doc_id"], url=r["norm_url"], title=r["title"] or "",
            content=r["text"] or "", description=r["meta_description"] or "",
            keywords=r["keywords"] or [], domain=r["domain"] or "",
            quality=r["quality"], lang=r["lang"] or "",
        )
        for r in t.to_pylist()
    ]
    oracle = BM25Oracle(docs, analyzer="en_stem")
    engine = SearchEngine(stem_built)
    for q in ["learning", "machine learning", "apple OR banana", '"machine learning"',
              "queries", "site:github.com"]:
        got = engine.rank(q, top_k=10)
        exp = oracle.rank(q, top_k=10)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9), (q, gd)
