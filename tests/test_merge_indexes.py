"""Generational segment merge (merge_indexes): no re-tokenization, yet
output segments content-identical to the docstore-rebuild path
(add_pages) over the same corpus — upserts, tombstones, resurrection,
mixed input codecs, parameter mismatch errors, and resume."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.index.delete import tombstone_url
from search_engine_core_ray.index.update import add_pages, merge_indexes
from search_engine_core_ray.query.engine import SearchEngine


def _bump_ts(t: pa.Table, us: int) -> pa.Table:
    ts = t.column("warc_ts").cast(pa.int64()).to_numpy() + us
    return t.set_column(
        t.column_names.index("warc_ts"), "warc_ts", pa.array(ts, pa.timestamp("us"))
    )


@pytest.fixture(scope="module")
def corpora():
    a = synth_pages_table(SynthConfig(n_docs=150, seed=41))
    b_all = synth_pages_table(SynthConfig(n_docs=150, seed=41))
    # generation B: re-crawl of docs 40..79 (same urls, later ts) plus
    # 30 brand-new pages from another seed
    recrawl = _bump_ts(b_all.slice(40, 40), 3_600_000_000)
    fresh = synth_pages_table(SynthConfig(n_docs=30, seed=99))
    # make fresh urls disjoint from A's
    urls = pa.array([u + "?v=2" for u in fresh.column("url").to_pylist()])
    fresh = fresh.set_column(fresh.column_names.index("url"), "url", urls)
    cols = ["url", "warc_ts", "html", "text", "lang"]
    if "category" in a.column_names:
        cols = cols + ["category"]
    b = pa.concat_tables([recrawl.select(cols), fresh.select(cols)])
    return a.select(cols), b


def _engine_results(index_dir, queries=("search", "machine OR python", "data")):
    e = SearchEngine(index_dir)
    out = {}
    for q in queries:
        r = e.search(q, limit=50)
        out[q] = ([(x["doc_id"], round(x["score"], 9)) for x in r["results"]],
                  r["total"])
    return out


def test_merge_equals_add_pages(ray_session, tmp_path, corpora):
    a, b = corpora
    d_a = str(tmp_path / "gen_a")
    d_b = str(tmp_path / "gen_b")
    d_merge = str(tmp_path / "merged")
    d_rebuild = str(tmp_path / "rebuilt")
    build_index(ray.data.from_arrow(a), d_a, lineage="a", num_shards=4)
    build_index(ray.data.from_arrow(b), d_b, lineage="b", num_shards=4)

    merge_indexes([d_a, d_b], d_merge)
    add_pages(d_a, ray.data.from_arrow(b), d_rebuild, num_shards=4, lineage="r")

    # same corpus stats (N, total_len) ...
    em, er = SearchEngine(d_merge), SearchEngine(d_rebuild)
    assert em.N == er.N and em.manifest["stats"] == er.manifest["stats"]
    # ... and identical search results (ranks AND scores)
    assert _engine_results(d_merge) == _engine_results(d_rebuild)
    # segment files are content-identical (content-determined layout)
    for p in sorted(
        glob.glob(os.path.join(d_rebuild, "segments", "*", "*.parquet"))
    ):
        rel = os.path.relpath(p, d_rebuild)
        tm = pq.read_table(os.path.join(d_merge, rel))
        tr = pq.read_table(p)
        assert tm.equals(tr), rel


def test_merge_respects_tombstones_and_resurrection(ray_session, tmp_path, corpora):
    a, b = corpora
    d_a = str(tmp_path / "gen_a")
    d_b = str(tmp_path / "gen_b")
    build_index(ray.data.from_arrow(a), d_a, lineage="a", num_shards=4)
    build_index(ray.data.from_arrow(b), d_b, lineage="b", num_shards=4)

    # tombstone one A-only url and one url that B re-crawls (resurrects)
    gone_url = a.column("url")[0].as_py()
    resurrect_url = b.column("url")[0].as_py()
    assert tombstone_url(d_a, gone_url) == 1
    assert tombstone_url(d_a, resurrect_url) == 1

    d_merge = str(tmp_path / "merged_tomb")
    merge_indexes([d_a, d_b], d_merge)

    docs = pq.read_table(os.path.join(d_merge, "docstore"), columns=["url"])
    urls = set(docs.column("url").to_pylist())
    assert gone_url not in urls
    assert resurrect_url in urls
    # postings contain no tombstoned doc: the engine never returns it
    from search_engine_core_ray.functions.urls import doc_id_for_url, normalize_url

    gone_id = doc_id_for_url(normalize_url(gone_url))
    e = SearchEngine(d_merge)
    r = e.search("search OR data OR machine", limit=0)
    assert gone_id not in [x["doc_id"] for x in r["results"]]


def test_merge_mixed_codecs_to_pfor(ray_session, tmp_path, corpora):
    a, b = corpora
    d_a = str(tmp_path / "a_vb")
    d_b = str(tmp_path / "b_pf")
    build_index(ray.data.from_arrow(a), d_a, lineage="a", num_shards=4)
    build_index(
        ray.data.from_arrow(b), d_b, lineage="b", num_shards=4, codec="pfor"
    )
    d_m = str(tmp_path / "m")
    res = merge_indexes([d_a, d_b], d_m)  # defaults to newest codec: pfor
    assert res.metrics["codec"] == "pfor"
    d_ref = str(tmp_path / "ref")
    add_pages(d_a, ray.data.from_arrow(b), d_ref, num_shards=4, lineage="r")
    assert _engine_results(d_m) == _engine_results(d_ref)


def test_merge_rejects_mismatched_layout(ray_session, tmp_path, corpora):
    a, b = corpora
    d_a = str(tmp_path / "a4")
    d_b = str(tmp_path / "b8")
    build_index(ray.data.from_arrow(a), d_a, lineage="a", num_shards=4)
    build_index(ray.data.from_arrow(b), d_b, lineage="b", num_shards=8)
    with pytest.raises(ValueError, match="num_shards"):
        merge_indexes([d_a, d_b], str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes([d_a], str(tmp_path / "nope2"))


def test_merge_resume_skips_committed_segments(ray_session, tmp_path, corpora):
    a, b = corpora
    d_a = str(tmp_path / "ga")
    d_b = str(tmp_path / "gb")
    d_m = str(tmp_path / "gm")
    build_index(ray.data.from_arrow(a), d_a, lineage="a", num_shards=2)
    build_index(ray.data.from_arrow(b), d_b, lineage="b", num_shards=2)
    merge_indexes([d_a, d_b], d_m)
    seg = sorted(glob.glob(os.path.join(d_m, "segments", "*", "*.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in seg}
    merge_indexes([d_a, d_b], d_m)  # second run: full resume
    for p in seg:
        assert os.path.getmtime(p) == mtimes[p]
