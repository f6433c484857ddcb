"""JSONL pages source: exact round-trip (timestamps at µs, html bytes
via base64), gz handling, Ray Data read path, and index-build identity
vs the same corpus read from Arrow (the test_warc.py parity bar)."""

import pyarrow as pa
import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.sources.jsonl import (
    jsonl_bytes_to_pages,
    pages_to_jsonl_bytes,
    read_jsonl_pages,
    write_jsonl,
)


def _pages(n=40, seed=13):
    t = synth_pages_table(SynthConfig(n_docs=n, seed=seed))
    return t.select(["url", "warc_ts", "html", "text", "lang"])


def test_round_trip_exact_plain_and_gz():
    pages = _pages()
    for gz in (False, True):
        back = jsonl_bytes_to_pages(pages_to_jsonl_bytes(pages, compress=gz))
        # JSONL carries µs timestamps and base64 bytes -> EXACT equality
        assert back.equals(pages.cast(back.schema))


def test_read_jsonl_dataset(ray_session, tmp_path):
    pages = _pages(n=60)
    p1 = str(tmp_path / "a.jsonl")
    p2 = str(tmp_path / "b.jsonl.gz")
    write_jsonl(pages.slice(0, 30), p1)
    write_jsonl(pages.slice(30), p2)
    got = read_jsonl_pages([p1, p2], batch_rows=16).take_all()
    assert len(got) == pages.num_rows
    by_url = {r["url"]: (r["html"], r["text"]) for r in got}
    want = {
        u: (h, t)
        for u, h, t in zip(
            pages.column("url").to_pylist(),
            pages.column("html").to_pylist(),
            pages.column("text").to_pylist(),
        )
    }
    assert by_url == want


def test_build_index_from_jsonl_matches_arrow(ray_session, tmp_path):
    from search_engine_core_ray.index.build import build_index
    from search_engine_core_ray.query.engine import SearchEngine

    pages = _pages(n=120, seed=21)
    path = str(tmp_path / "corpus.jsonl.gz")
    write_jsonl(pages, path)

    d_arrow = str(tmp_path / "idx_arrow")
    d_jsonl = str(tmp_path / "idx_jsonl")
    build_index(ray.data.from_arrow(pages), d_arrow, lineage="j", num_shards=4)
    build_index(read_jsonl_pages([path]), d_jsonl, lineage="j", num_shards=4)

    e_a, e_j = SearchEngine(d_arrow), SearchEngine(d_jsonl)
    for q in ["search", "machine OR python", '"the quick"']:
        ra, rj = e_a.search(q, limit=20), e_j.search(q, limit=20)
        assert [x["doc_id"] for x in ra["results"]] == [
            x["doc_id"] for x in rj["results"]
        ], q
        assert ra["total"] == rj["total"]
