"""Query actor pool (SearchClient-pool parity, incl. the concurrency
shape of TestExactSearchE2E.cpp:191-230) and the CLI surface."""

import json
import subprocess
import sys

import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.engine import SearchEngine
from search_engine_core_ray.query.pool import QueryPool


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("pool_index"))
    pages = synth_pages_table(SynthConfig(n_docs=120, seed=5))
    build_index(ray.data.from_arrow(pages), index_dir, lineage="pool", num_shards=4)
    return index_dir


def test_pool_matches_single_engine(built):
    pool = QueryPool(built, size=3)
    try:
        eng = SearchEngine(built)
        for q in ["machine OR python", "site:github.com", '"machine learning"']:
            a = pool.search(q, limit=5)
            b = eng.search(q, limit=5)
            assert [r["doc_id"] for r in a["results"]] == [
                r["doc_id"] for r in b["results"]
            ]
            assert a["total"] == b["total"]
    finally:
        pool.shutdown()


def test_pool_concurrent_batch(built):
    pool = QueryPool(built, size=3)
    try:
        queries = ["machine", "python", "apple OR banana", "data", "language:fa"] * 6
        results = pool.search_many(queries, limit=5)
        assert len(results) == len(queries)
        # same query -> same answer regardless of which actor served it
        eng = SearchEngine(built)
        for q, r in zip(queries, results):
            expect = eng.search(q, limit=5)
            assert r["total"] == expect["total"]
    finally:
        pool.shutdown()


def test_cli_build_and_search(built, tmp_path):
    # build from the documents table, then query — fresh subprocesses
    idx = str(tmp_path / "cli_idx")
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_core_ray", "--num-cpus", "2",
         "build", "--from-documents", "/root/testdata/sf0.001", "--index", idx,
         "--num-shards", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["docs"] == 500

    res = subprocess.run(
        [sys.executable, "-m", "search_engine_core_ray", "search",
         "--index", idx, "dup OR vector", "--limit", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    payload = json.loads(res.stdout)
    assert payload["total"] > 0
    assert len(payload["results"]) <= 3

    bad = subprocess.run(
        [sys.executable, "-m", "search_engine_core_ray", "search",
         "--index", idx, '"unclosed'],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert bad.returncode == 2


def test_pool_autoscaling(built, ray_session):
    from search_engine_core_ray.query.pool import QueryPool

    pool = QueryPool(built, size=2, max_size=6, scale_batch=10)
    try:
        assert len(pool.actors) == 2
        # small batch: no scaling
        pool.search_many(["apple"] * 5)
        assert len(pool.actors) == 2
        # big batch: grows toward ceil(80/10)=8, capped at max_size=6
        out = pool.search_many(["apple", "banana"] * 40)
        assert len(pool.actors) == 6
        assert len(out) == 80
        # results identical to a single engine
        from search_engine_core_ray.query.engine import SearchEngine

        eng = SearchEngine(built)
        exp = eng.search("apple", limit=10)
        assert out[0]["total"] == exp["total"]
        assert [r["doc_id"] for r in out[0]["results"]] == [
            r["doc_id"] for r in exp["results"]
        ]
    finally:
        pool.shutdown()


def test_search_simple_always_highlights(built):
    from search_engine_core_ray.query.api import search_simple
    from search_engine_core_ray.query.engine import SearchEngine

    eng = SearchEngine(built)
    out = search_simple(eng, "apple", limit=5)
    assert out == eng.search("apple", limit=5, offset=0, highlight=True)
    for r in out["results"]:
        assert "highlights" in r


def test_pool_scale_batch_guard(built, ray_session):
    from search_engine_core_ray.query.pool import QueryPool

    pool = QueryPool(built, size=1, max_size=2, scale_batch=0)
    try:
        out = pool.search_many(["apple", "apple"])  # must not divide by zero
        assert len(out) == 2
    finally:
        pool.shutdown()


def test_cli_catalog_entry(ray_session, tmp_path, capsys):
    from search_engine_core_ray.__main__ import main

    assert main(["catalog", "word_counts",
                 "--sf-dir", "/root/testdata/sf0.001", "--head", "3"]) == 0
    out = capsys.readouterr().out
    assert "n_words" in out
    assert main(["catalog", "definitely_not_an_entry"]) == 2
    # --out writes parquet
    d = str(tmp_path / "cat_out")
    assert main(["catalog", "ann_recall",
                 "--sf-dir", "/root/testdata/sf0.001", "--out", d]) == 0
    import pyarrow.parquet as pq

    assert pq.read_table(d).num_rows == 5


def test_cli_export_training_v2(ray_session, tmp_path, capsys):
    import json as _json

    from search_engine_core_ray.__main__ import main

    d = str(tmp_path / "exp_v2")
    assert main(["export-training", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", d, "--recipe", "v2", "--buckets", "2"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_written"] > 0 and res["written"] == [0, 1]
