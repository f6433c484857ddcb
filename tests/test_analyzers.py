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


# ---------------------------------------------------------------------------
# de_stem + per-language analyzer dispatch (two analyzers, ONE manifest)
# ---------------------------------------------------------------------------

def test_de_stem_rules():
    assert stem_token("tagen", "de_stem") == "tag"
    assert stem_token("kindern", "de_stem") == "kind"
    assert stem_token("hundes", "de_stem") == "hund"
    assert stem_token("blume", "de_stem") == "blum"
    assert stem_token("der", "de_stem") == "der"     # stem too short
    assert stem_token("und", "de_stem") == "und"
    assert stem_token("kinder", "de_stem") == "kind"
    assert stem_token("spielen", "de_stem") == "spiel"
    # wrong-language input passes through: no German suffix matches
    assert stem_token("jumping", "de_stem") == "jumping"


def test_resolve_analyzer_mapping():
    from search_engine_core_ray.functions.analyzers import resolve_analyzer

    spec = {"en": "en_stem", "de": "de_stem", "*": "default"}
    assert resolve_analyzer(spec, "en") == "en_stem"
    assert resolve_analyzer(spec, "de") == "de_stem"
    assert resolve_analyzer(spec, "fa") == "default"
    assert resolve_analyzer(spec, None) == "default"
    assert resolve_analyzer("en_stem", "de") == "en_stem"
    with pytest.raises(ValueError):
        resolve_analyzer({"*": "nope"}, None)


def test_dispatch_expr_matches_scalar_per_lang():
    from search_engine_core_ray.functions.analyzers import (
        polars_term_expr_dispatch,
        resolve_analyzer,
    )

    spec = {"en": "en_stem", "de": "de_stem", "*": "default"}
    toks = ["jumping", "tagen", "cities", "kindern", "moves", "blume"]
    langs = ["en", "de", "en", "de", "fa", "de"]
    df = pl.DataFrame({"tok": toks, "lang": langs}).with_columns(
        polars_term_expr_dispatch(pl.col("tok"), spec, pl.col("lang")).alias("out")
    )
    for tok, lang, out in zip(toks, langs, df["out"].to_list()):
        assert [out] == analyze(tok, resolve_analyzer(spec, lang)), (tok, lang)


def _mixed_pages() -> "pa.Table":
    import pyarrow as pa
    from datetime import datetime, timezone

    rows = [
        # (url, lang, body) — bodies long enough that the fidelity
        # path's quality multiplier keeps scores above the reference's
        # 0.01 min-score floor
        ("https://en1.example.com/a", "en",
         "the quick brown fox jumped over the lazy fence and jumped again "
         "while the calm dog watched the whole scene from a sunny porch"),
        ("https://en2.example.com/b", "en",
         "children enjoy jumping on wooden tables and jumping over small "
         "chairs during long afternoons in the bright noisy school hall"),
        ("https://en3.example.com/c", "en",
         "nothing relevant appears in this plain document about quiet "
         "mornings coffee reading and slow walks through the old town"),
        ("https://de1.example.com/a", "de",
         "die kindern spielen an tagen mit vielen freunden im garten und "
         "die kindern lachen sehr laut waehrend die sonne ueber dem haus"),
        ("https://de2.example.com/b", "de",
         "ein kinder buch von gestern liegt auf dem tisch und das kinder "
         "zimmer wartet auf einen neuen leser mit viel geduld darin"),
        ("https://de3.example.com/c", "de",
         "voellig anderes thema heute denn wir sprechen ueber musik filme "
         "und lange reisen durch ferne laender mit guten freunden dabei"),
    ]
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "html": pa.array(
                [f"<html><head><title>t</title></head><body><p>{r[2]}</p></body></html>".encode()
                 for r in rows],
                pa.binary(),
            ),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "category": pa.array(["misc"] * len(rows), pa.string()),
        }
    )


@pytest.fixture(scope="module")
def multi_built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("multi_index"))
    build_index(
        ray.data.from_arrow(_mixed_pages()), index_dir, lineage="multi",
        num_shards=4,
        analyzer={"en": "en_stem", "de": "de_stem", "*": "default"},
    )
    return index_dir


def test_manifest_records_mapping(multi_built):
    eng = SearchEngine(multi_built)
    assert eng.manifest["analyzer"] == {
        "en": "en_stem", "de": "de_stem", "*": "default"
    }
    # no query_lang: the "*" fallback analyzer serves
    assert eng.text_analyzer == "default"


def test_per_lang_build_query_parity(multi_built):
    # EN docs were stemmed with en_stem: 'jumped' and 'jumping' both
    # indexed as 'jump'; an en-language session finds BOTH docs from
    # either inflection
    en = SearchEngine(multi_built, query_lang="en")
    assert en.text_analyzer == "en_stem"
    for q in ("jumped", "jumping", "jump"):
        urls = {r["url"] for r in en.search(q, limit=10)["results"]}
        assert urls == {
            "https://en1.example.com/a", "https://en2.example.com/b",
        }, q
    # DE docs were stemmed with de_stem: 'kindern' and 'kinder' both
    # indexed as 'kind'
    de = SearchEngine(multi_built, query_lang="de")
    assert de.text_analyzer == "de_stem"
    for q in ("kindern", "kinder"):
        urls = {r["url"] for r in de.search(q, limit=10)["results"]}
        assert urls == {
            "https://de1.example.com/a", "https://de2.example.com/b",
        }, q
    # cross-language session misses: de-analyzed 'jumping' -> 'jumpi',
    # a term no document produced
    assert de.search("jumping", limit=10)["total"] == 0


def test_dispatch_distributed_matches_engine(multi_built):
    from search_engine_core_ray.query.distributed import DistributedSearch

    en = SearchEngine(multi_built, query_lang="en")
    d = DistributedSearch(multi_built, query_lang="en")
    try:
        a = d.search("jumping", limit=10)
        b = en.search("jumping", limit=10)
        assert a["total"] == b["total"]
        assert [r["doc_id"] for r in a["results"]] == [
            r["doc_id"] for r in b["results"]
        ]
    finally:
        d.shutdown()
