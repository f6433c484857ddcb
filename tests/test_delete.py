"""Domain deletion: tombstones hide docs immediately; compaction
rewrites the index without them (RedisSearchStorage.cpp:594-648 analog)."""

import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.index.delete import (
    compact_index,
    load_tombstones,
    tombstone_domain,
)
from search_engine_core_ray.query.engine import SearchEngine


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("del_index"))
    pages = synth_pages_table(SynthConfig(n_docs=150, seed=21))
    build_index(ray.data.from_arrow(pages), index_dir, lineage="del", num_shards=4)
    return index_dir


def test_tombstone_hides_domain(built):
    eng0 = SearchEngine(built)
    dom_hits = eng0.search("site:github.com")["total"]
    assert dom_hits > 0
    n = tombstone_domain(built, "github.com")
    assert n >= dom_hits
    eng = SearchEngine(built)  # reload picks up tombstones
    assert eng.search("site:github.com")["total"] == 0
    # tombstoned docs vanish from term queries too
    for q in ["search", "data OR machine"]:
        for hit in eng.search(q, limit=50)["results"]:
            assert hit["domain"] != "github.com"
    # idempotent / cumulative
    tombstone_domain(built, "github.com")
    assert len(load_tombstones(built)["domains"]) == 1


def test_compaction_rewrites_without_tombstones(built, tmp_path_factory):
    new_dir = str(tmp_path_factory.mktemp("compacted"))
    compact_index(built, new_dir, lineage="compacted", num_shards=4)
    eng = SearchEngine(new_dir)
    assert len(eng.tombstones) == 0
    assert eng.search("site:github.com")["total"] == 0
    assert ("github.com" not in set(eng.domains.tolist()))
    # stats reflect the smaller corpus
    old = SearchEngine(built)
    assert eng.N == old.N - len(set(old.tombstones.tolist()))
    # surviving docs still searchable (pure-filter query: quality-ranked;
    # common terms would be IDF-negative on this tiny head-skewed corpus)
    assert eng.search("language:en")["total"] > 0


def test_compact_pre_category_docstore(ray_session, tmp_path_factory):
    """Docstores written before the category column existed must still
    compact (column list intersected with the actual schema)."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
    from search_engine_core_ray.index.build import build_index
    from search_engine_core_ray.index.delete import compact_index, tombstone_domain
    from search_engine_core_ray.query.engine import SearchEngine

    src = str(tmp_path_factory.mktemp("old_idx"))
    dst = str(tmp_path_factory.mktemp("compacted_idx"))
    pages = synth_pages_table(SynthConfig(n_docs=120, seed=31))
    build_index(ray.data.from_arrow(pages), src, lineage="old", num_shards=4)
    # simulate the pre-category layout: strip the column from every file
    for f in _glob.glob(os.path.join(src, "docstore", "**", "*.parquet"),
                        recursive=True):
        t = _pq.read_table(f)
        _pq.write_table(t.drop_columns(["category"]), f)
    dom = SearchEngine(src).domains[0]
    n = tombstone_domain(src, dom)
    assert n > 0
    compact_index(src, dst, lineage="compacted", num_shards=4)
    eng = SearchEngine(dst)
    assert dom not in set(eng.domains)
    assert len(eng.doc_ids) > 0


def test_tombstone_single_url(ray_session, tmp_path_factory):
    """deleteDocument(url) parity (RedisSearchStorage.h:91): one URL
    tombstoned -> absent from search; compaction drops it physically;
    the rest of its domain keeps serving."""
    from search_engine_core_ray.index.delete import tombstone_url

    src = str(tmp_path_factory.mktemp("url_del_idx"))
    dst = str(tmp_path_factory.mktemp("url_del_compacted"))
    pages = synth_pages_table(SynthConfig(n_docs=120, seed=47))
    build_index(ray.data.from_arrow(pages), src, lineage="urldel", num_shards=4)

    eng0 = SearchEngine(src)
    # pick a domain with >= 2 docs so the domain keeps serving after
    from collections import Counter

    dom, cnt = Counter(eng0.domains.tolist()).most_common(1)[0]
    assert cnt >= 2
    pos = next(i for i, d in enumerate(eng0.domains.tolist()) if d == dom)
    victim_url = eng0.urls[pos]
    victim_id = int(eng0.doc_ids[pos])

    # the raw (pre-normalization) URL resolves through normalize_url too
    assert tombstone_url(src, victim_url) == 1
    assert tombstone_url(src, "http://nowhere.invalid/none") == 0

    eng = SearchEngine(src)  # reload picks up tombstones
    assert victim_id in set(eng.tombstones.tolist())
    hits = eng.search(f"site:{dom}", limit=100)
    assert all(r["doc_id"] != victim_id for r in hits["results"])
    assert hits["total"] == cnt - 1  # domain minus the one url
    # domain-level tombstones untouched
    assert load_tombstones(src)["domains"] == []

    # idempotent: deleting again re-marks the same doc, no growth
    tombstone_url(src, victim_url)
    assert len(load_tombstones(src)["doc_ids"]) == 1

    compact_index(src, dst, lineage="urldel2", num_shards=4)
    eng2 = SearchEngine(dst)
    assert victim_id not in set(eng2.doc_ids.tolist())
    assert eng2.N == eng0.N - 1
    assert eng2.search(f"site:{dom}", limit=100)["total"] == cnt - 1
