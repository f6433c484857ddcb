"""WARC source: framing, round-trip byte identity, Ray Data read path,
and an end-to-end index build over read_warc (search identical to the
same corpus read from Arrow). Mirrors Common Crawl's container format
(ISO 28500, public spec); the reference ingests via its crawler +
Mongo (src/crawler/), so the parity bar here is the input_hint pages
shape, not a reference code path."""

import gzip
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.sources.warc import (
    iter_warc_records,
    pages_to_warc_bytes,
    read_warc,
    warc_bytes_to_pages,
    write_warc,
)


def _pages(n=40, seed=13):
    t = synth_pages_table(SynthConfig(n_docs=n, seed=seed))
    return t.select(["url", "warc_ts", "html", "text", "lang"])


def test_round_trip_plain_and_gz():
    pages = _pages()
    for gz in (False, True):
        data = pages_to_warc_bytes(pages, gzip_per_record=gz)
        back = warc_bytes_to_pages(data)
        assert back.column("url").to_pylist() == pages.column("url").to_pylist()
        assert back.column("html").to_pylist() == pages.column("html").to_pylist()
        # warc timestamps are second-granular; compare at seconds
        a = np.asarray(back.column("warc_ts").cast(pa.int64())) // 1_000_000
        b = np.asarray(pages.column("warc_ts").cast(pa.int64())) // 1_000_000
        assert np.array_equal(a, b)


def test_gz_is_one_member_per_record():
    pages = _pages(n=5)  # synth adds re-crawl dup rows: count by num_rows
    data = pages_to_warc_bytes(pages, gzip_per_record=True)
    assert data.count(b"\x1f\x8b\x08") >= pages.num_rows  # 1 member/record
    one = gzip.GzipFile(fileobj=__import__("io").BytesIO(data)).read()
    assert one.count(b"WARC/1.0\r\n") == pages.num_rows  # reads all members


def test_non_response_records_skipped_and_raw_html_payload():
    rec = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
    ).encode() + b"info" + b"\r\n\r\n"
    raw = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://x/\r\n"
        "WARC-Date: 2024-05-06T07:08:09Z\r\n"
        "Content-Type: text/html\r\nContent-Length: 6\r\n\r\n"
    ).encode() + b"<p>hi</p>"[:6] + b"\r\n\r\n"
    t = warc_bytes_to_pages(rec + raw)
    assert t.num_rows == 1
    assert t.column("html")[0].as_py() == b"<p>hi<"
    assert t.column("url")[0].as_py() == "http://x/"


def test_malformed_records_raise():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError):
        list(iter_warc_records(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"))
    with pytest.raises(ValueError):
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))


def test_read_warc_dataset(ray_session, tmp_path):
    pages = _pages(n=60)
    # two files -> two read tasks; one gz, one plain
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc(pages.slice(0, 30), p1)
    write_warc(pages.slice(30), p2)
    ds = read_warc([p1, p2], batch_rows=16)
    got = ds.take_all()
    assert len(got) == pages.num_rows
    by_url = {r["url"]: r["html"] for r in got}
    want = dict(zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()))
    assert by_url == want


def test_build_index_from_warc_matches_arrow(ray_session, tmp_path):
    from search_engine_core_ray.index.build import build_index
    from search_engine_core_ray.query.engine import SearchEngine

    pages = synth_pages_table(SynthConfig(n_docs=120, seed=21)).select(
        ["url", "warc_ts", "html", "text", "lang"]
    )
    warc_path = str(tmp_path / "corpus.warc.gz")
    write_warc(pages, warc_path)

    d_arrow = str(tmp_path / "idx_arrow")
    d_warc = str(tmp_path / "idx_warc")
    build_index(ray.data.from_arrow(pages), d_arrow, lineage="w", num_shards=4)
    build_index(read_warc([warc_path]), d_warc, lineage="w", num_shards=4)

    e_a, e_w = SearchEngine(d_arrow), SearchEngine(d_warc)
    for q in ["search", "machine OR python", '"the quick"']:
        ra, rw = e_a.search(q, limit=20), e_w.search(q, limit=20)
        assert [x["doc_id"] for x in ra["results"]] == [
            x["doc_id"] for x in rw["results"]
        ], q
        assert ra["total"] == rw["total"]
