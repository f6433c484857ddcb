"""Search API facade parity (ported from
tests/webserver/SearchEndpointTest.cpp:44-230): validation bounds,
response shape, pagination echo, empty-result 200 shape."""

import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.query.api import ApiError, search_api
from search_engine_core_ray.query.engine import SearchEngine


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("api_index"))
    pages = synth_pages_table(SynthConfig(n_docs=120, seed=8))
    build_index(ray.data.from_arrow(pages), index_dir, lineage="api", num_shards=4)
    return SearchEngine(index_dir)


def test_missing_q_is_400(engine):
    for bad in (None, "", "   "):
        with pytest.raises(ApiError) as e:
            search_api(engine, bad)
        assert e.value.status == 400


def test_page_and_limit_bounds(engine):
    for page, limit in [(0, 10), (1001, 10), (1, 0), (1, 101), (-5, 10)]:
        with pytest.raises(ApiError) as e:
            search_api(engine, "machine", page=page, limit=limit)
        assert e.value.status == 400
    with pytest.raises(ApiError):
        search_api(engine, "machine", page="x", limit=10)


def test_response_shape_and_pagination_echo(engine):
    out = search_api(engine, "machine OR python", page=2, limit=3)
    assert set(out) == {"meta", "results"}
    assert out["meta"]["page"] == 2
    assert out["meta"]["pageSize"] == 3
    assert len(out["results"]) <= 3
    for r in out["results"]:
        assert set(r) == {"url", "title", "snippet", "score"}
    # page 2 continues where page 1 ends
    p1 = search_api(engine, "machine OR python", page=1, limit=3)
    all6 = search_api(engine, "machine OR python", page=1, limit=6)
    assert [r["url"] for r in p1["results"]] + [r["url"] for r in out["results"]] == [
        r["url"] for r in all6["results"]
    ]


def test_no_hits_is_200_empty(engine):
    out = search_api(engine, "zzznonexistentterm")
    assert out == {"meta": {"total": 0, "page": 1, "pageSize": 10}, "results": []}


def test_bad_query_is_400(engine):
    with pytest.raises(ApiError) as e:
        search_api(engine, '"unclosed')
    assert e.value.status == 400
