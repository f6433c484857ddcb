"""Search API facade: the reference's HTTP response contract without
the HTTP server.

Reproduces SearchController::search validation + response shape
(src/controllers/SearchController.cpp:324-400, 968-1050 and
tests/webserver/SearchEndpointTest.cpp):

- ``q`` required and non-blank -> ApiError(400)
- ``page`` in [1, 1000], ``limit`` in [1, 100] -> ApiError(400)
- offset = (page - 1) * limit
- response: {"meta": {"total", "page", "pageSize"}, "results":
  [{"url", "title", "snippet", "score"}]}
- empty index / no hits -> 200-shaped empty result, not an error

Works over any engine exposing ``search(query, limit, offset)`` — the
single-node SearchEngine, the QueryPool, or DistributedSearch.
"""

from __future__ import annotations

from .parser import ParseError

MAX_PAGE = 1000
MAX_LIMIT = 100


class ApiError(ValueError):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def search_simple(engine, q: str, limit: int = 10) -> dict:
    """searchSimple parity (RedisSearchStorage.cpp:365-372): highlight
    is ALWAYS on; returns the engine result shape with tagged
    title/snippet + highlights maps."""
    return engine.search(q, limit=limit, offset=0, highlight=True)


def search_api(
    engine,
    q: str | None,
    page: int = 1,
    limit: int = 10,
    fast: bool = False,
    highlight: bool = False,
) -> dict:
    if q is None or not str(q).strip():
        raise ApiError(400, "missing or empty query parameter 'q'")
    try:
        page = int(page)
        limit = int(limit)
    except (TypeError, ValueError):
        raise ApiError(400, "page and limit must be integers")
    if not (1 <= page <= MAX_PAGE):
        raise ApiError(400, f"page must be between 1 and {MAX_PAGE}")
    if not (1 <= limit <= MAX_LIMIT):
        raise ApiError(400, f"limit must be between 1 and {MAX_LIMIT}")
    offset = (page - 1) * limit
    try:
        if fast and hasattr(engine, "search_fast"):
            # pruned top-k serving: same ranked ids, raw scores, and
            # meta.total counts the RETRIEVAL set (pre min-score
            # filter) — the fidelity path's total is post-filter, so
            # pagination keyed on total may differ when fast toggles
            # (see SearchEngine.search_fast docstring)
            out = engine.search_fast(q, limit=limit, offset=offset,
                                     highlight=highlight)
        else:
            out = engine.search(q, limit=limit, offset=offset,
                                highlight=highlight)
    except ParseError as e:
        raise ApiError(400, f"invalid query: {e}")
    return {
        "meta": {"total": out["total"], "page": page, "pageSize": limit},
        "results": [
            {"url": r["url"], "title": r["title"], "snippet": r["snippet"],
             "score": r["score"]}
            for r in out["results"]
        ],
    }
