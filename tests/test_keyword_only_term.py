"""A query term can have KEYWORD postings without TEXT postings:
extract_keywords strips punctuation ("e-mail" -> keyword "email")
while the tokenizer splits on non-alnum ("e-mail" -> token "mail").
The pruned top-k paths must keep such a term's binary w.keywords
bonus visible in every bound, or search_fast prunes docs the
fidelity path ranks (found by round-3 code review)."""

import numpy as np
import pytest

import ray.data
import pyarrow as pa

from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine


def _page(i: int, body: str) -> dict:
    return {
        "url": f"https://kw{i % 4}.example.com/doc/{i}",
        "warc_ts": np.datetime64("2026-01-01T00:00:00", "us").item(),
        "html": f"<html><head><title>doc {i}</title></head>"
        f"<body>{body}</body></html>".encode(),
        "text": "",
        "lang": "en",
        "category": "test",
    }


@pytest.fixture(scope="module")
def kw_engine(ray_session, tmp_path_factory):
    rows = []
    # 200 high-tf "mail" docs fill the heap with big scores first
    for i in range(200):
        rows.append(_page(i, "mail " * 40 + "filler words here"))
    # then 300 low-tf docs; every 10th repeats "e-mail": keyword
    # "email" (punctuation stripped, >3 bytes, frequent) but token
    # postings only get "mail" once per mention — low field score,
    # binary keyword bonus only
    for i in range(200, 500):
        if i % 10 == 0:
            rows.append(_page(i, "mail once and e-mail e-mail e-mail e-mail"))
        else:
            rows.append(_page(i, "mail once plus unrelated padding text"))
    # 1000 mail-free docs keep df("mail") < N/2 — otherwise the
    # reference's floorless BM25 idf goes negative and the min-score
    # filter empties every result set (vacuous identity)
    for i in range(500, 1500):
        rows.append(_page(i, "completely unrelated corpus padding words"))
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("warc_ts"),
        "warc_ts",
        tbl.column("warc_ts").cast(pa.timestamp("us")),
    )
    index_dir = str(tmp_path_factory.mktemp("kw_idx"))
    build_index(
        ray.data.from_arrow(tbl),
        index_dir,
        lineage="kwonly-1",
        num_shards=4,
        bucket_bits=0,
    )
    return SearchEngine(index_dir)


def test_keyword_only_term_has_visible_bounds(kw_engine):
    eng = kw_engine
    # "email" never appears as a token, only as an extracted keyword
    assert eng._postings_pos("email") is None or len(eng._postings_pos("email")[0]) == 0
    assert "email" in eng.kw_postings and len(eng.kw_postings["email"]) == 30
    (tb,) = eng._term_block_bounds(["email"])
    assert tb is not None, "keyword-only term must not vanish from the bounds"
    assert len(tb[1]) == 0 and tb[2] is not None and tb[3] is True
    assert eng._term_ub(tb) == pytest.approx(eng.config.field_weights.keywords)


@pytest.mark.parametrize(
    "query", ["mail OR email", "email OR mail", "filler OR email", "email"]
)
def test_fast_path_rank_identity_with_keyword_only_term(kw_engine, query):
    eng = kw_engine
    fid = eng.search(query, limit=10)
    fast = eng.search_fast(query, limit=10)
    assert [r["doc_id"] for r in fid["results"]] == [
        r["doc_id"] for r in fast["results"]
    ], query


def test_wand_rank_identity_with_keyword_only_term(kw_engine):
    eng = kw_engine
    fid = [r["doc_id"] for r in eng.search("mail OR email", limit=15)["results"]]
    wand = [d for d, _ in eng.search_topk_wand("mail OR email", 15)]
    assert fid == wand


def test_keyword_bonus_actually_lifts_kw_docs(kw_engine):
    """The e-mail docs outrank their same-text neighbours thanks to the
    keyword bonus — i.e. the scenario scores differently at all."""
    eng = kw_engine
    res = eng.search("mail OR email", limit=0)["results"]
    by_i = {int(r["url"].rsplit("/", 1)[1]): r["score"] for r in res}
    kw_doc = next(i for i in by_i if i % 10 == 0 and i >= 200)
    plain = next(i for i in by_i if i % 10 != 0 and i >= 200)
    assert by_i[kw_doc] > by_i[plain]
