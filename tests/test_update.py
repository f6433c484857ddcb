"""Incremental ingest (index/update.add_pages): upserting a delta of
re-crawled + brand-new pages into an existing index must equal a
from-scratch build over the combined corpus."""

import glob
import os

import pyarrow.parquet as pq
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.index.update import add_pages
from search_engine_core_ray.query.engine import SearchEngine


@pytest.fixture(scope="module")
def gen0(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("gen0"))
    pages = synth_pages_table(SynthConfig(n_docs=150, seed=77))
    build_index(ray.data.from_arrow(pages), idx, lineage="g0", num_shards=4)
    return idx, pages


def _delta_pages(base_pages):
    """Re-crawl the first 10 urls with NEWER timestamps + fresh docs."""
    import datetime

    import pyarrow as pa

    rows = base_pages.to_pylist()[:10]
    urls = [r["url"] for r in rows]
    ts = [r["warc_ts"] + datetime.timedelta(days=30) for r in rows]
    html = [b"<html><head><title>Recrawl</title></head>"
            b"<body><p>fresh recrawled body</p></body></html>"] * 10
    text = ["Recrawl fresh recrawled body "] * 10
    lang = [r["lang"] for r in rows]
    cat = [r["category"] for r in rows]
    new = synth_pages_table(SynthConfig(n_docs=20, seed=991, n_domains=3))
    delta = pa.table(
        {
            "url": pa.array(urls + new.column("url").to_pylist(), pa.string()),
            "warc_ts": pa.array(ts + new.column("warc_ts").to_pylist(),
                                pa.timestamp("us")),
            "html": pa.array(html + new.column("html").to_pylist(), pa.binary()),
            "text": pa.array(text + new.column("text").to_pylist(), pa.string()),
            "lang": pa.array(lang + new.column("lang").to_pylist(), pa.string()),
            "category": pa.array(cat + new.column("category").to_pylist(),
                                 pa.string()),
        }
    )
    return delta


def test_add_pages_equals_fresh_build(gen0, ray_session, tmp_path_factory):
    idx0, base_pages = gen0
    delta = _delta_pages(base_pages)

    gen1 = str(tmp_path_factory.mktemp("gen1"))
    add_pages(idx0, ray.data.from_arrow(delta), gen1,
              lineage="g1", num_shards=4)

    # from-scratch build over the combined corpus
    import pyarrow as pa

    combined = pa.concat_tables(
        [base_pages.select(delta.column_names), delta]
    )
    fresh = str(tmp_path_factory.mktemp("fresh"))
    build_index(ray.data.from_arrow(combined), fresh,
                lineage="g1", num_shards=4)

    e_inc = SearchEngine(gen1)
    e_fresh = SearchEngine(fresh)
    # identical corpora: same docs, same stats
    assert set(e_inc.doc_ids.tolist()) == set(e_fresh.doc_ids.tolist())
    assert e_inc.N == e_fresh.N
    assert e_inc.avgdl == pytest.approx(e_fresh.avgdl, abs=1e-9)
    # byte-identical segment files (content-determined, docID-sorted)
    seg_inc = sorted(glob.glob(os.path.join(gen1, "segments", "**",
                                            "bucket=*.parquet"), recursive=True))
    seg_fresh = sorted(glob.glob(os.path.join(fresh, "segments", "**",
                                              "bucket=*.parquet"), recursive=True))
    assert [os.path.relpath(p, gen1) for p in seg_inc] == [
        os.path.relpath(p, fresh) for p in seg_fresh
    ]
    for a, b in zip(seg_inc, seg_fresh):
        assert open(a, "rb").read() == open(b, "rb").read(), a
    # rank-identical serving
    for q in ["apple", "recrawl", "machine learning", "apple OR banana"]:
        assert e_inc.rank(q, top_k=10) == e_fresh.rank(q, top_k=10), q


def test_add_pages_upserts_and_appends(gen0, ray_session, tmp_path_factory):
    idx0, base_pages = gen0
    delta = _delta_pages(base_pages)
    gen1 = str(tmp_path_factory.mktemp("gen1b"))
    r = add_pages(idx0, ray.data.from_arrow(delta), gen1,
                  lineage="g1b", num_shards=4)
    e0 = SearchEngine(idx0)
    e1 = SearchEngine(gen1)
    # re-crawled urls keep ONE row, now with the fresh content
    store = pq.read_table(os.path.join(gen1, "docstore"))
    by_url = dict(zip(store.column("norm_url").to_pylist(),
                      store.column("text").to_pylist()))
    from search_engine_core_ray.functions.urls import normalize_url

    for u in base_pages.column("url").to_pylist()[:10]:
        assert by_url[normalize_url(u)] == "Recrawl fresh recrawled body "
    # strictly more docs than gen0 (new urls appended)
    assert r.stats.total_docs > len(e0.doc_ids)
    assert len(e1.doc_ids) == r.stats.total_docs


def test_add_pages_respects_tombstones(gen0, ray_session, tmp_path_factory):
    from search_engine_core_ray.index.delete import tombstone_domain

    idx0, base_pages = gen0
    e0 = SearchEngine(idx0)
    victim = e0.domains[0]
    n = tombstone_domain(idx0, victim)
    assert n > 0
    delta = _delta_pages(base_pages)
    # drop delta rows of the victim domain so it must stay absent
    import pyarrow.compute as pc

    keep = pc.invert(pc.match_substring(delta.column("url"), victim))
    delta = delta.filter(keep)
    gen1 = str(tmp_path_factory.mktemp("gen1c"))
    add_pages(idx0, ray.data.from_arrow(delta), gen1,
              lineage="g1c", num_shards=4)
    e1 = SearchEngine(gen1)
    assert victim not in set(e1.domains.tolist())
    # clean up the shared fixture's tombstones for other tests
    os.remove(os.path.join(idx0, "tombstones.json"))
