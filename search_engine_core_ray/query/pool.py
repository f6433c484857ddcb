"""Query actor pool — the reference's SearchClient connection pool
(src/search_core/SearchClient.cpp:12-51) re-expressed as Ray actors:
N persistent actors each holding an opened SearchEngine (segment
readers + docstore arrays loaded once in __init__), dispatched
round-robin with an atomic cursor. ``search_many`` scatters a query
batch across the pool — the engine-side analog of the reference's
10-thread concurrency test (TestExactSearchE2E.cpp:191-230).
"""

from __future__ import annotations

import itertools

import ray


@ray.remote
class _EngineActor:
    def __init__(self, index_dir: str, engine_kwargs: dict):
        from .engine import SearchEngine

        self.engine = SearchEngine(index_dir, preload_shards=True, **engine_kwargs)

    def search(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        return self.engine.search(
            query, limit=limit, offset=offset, highlight=highlight
        )

    def search_fast(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        return self.engine.search_fast(
            query, limit=limit, offset=offset, highlight=highlight
        )

    def search_topk(self, query: str, k: int = 10):
        return self.engine.search_topk_wand(query, k=k)


class QueryPool:
    """Round-robin pool of query actors over one index.

    ``fast=True`` routes ``search``/``search_many`` through the
    engine's pruned top-k serving path (``SearchEngine.search_fast``)
    — same ranked ids, raw scores, p99 without full-candidate scoring
    on head-term queries."""

    def __init__(self, index_dir: str, size: int = 4, fast: bool = False, **engine_kwargs):
        self.actors = [
            _EngineActor.remote(index_dir, engine_kwargs) for _ in range(size)
        ]
        self._rr = itertools.cycle(range(size))
        self.fast = fast

    def search(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        actor = self.actors[next(self._rr)]
        m = actor.search_fast if self.fast else actor.search
        return ray.get(
            m.remote(query, limit=limit, offset=offset, highlight=highlight)
        )

    def search_many(self, queries: list[str], limit: int = 10) -> list[dict]:
        """Scatter a batch across the pool; preserves input order."""
        refs = [
            (
                self.actors[next(self._rr)].search_fast
                if self.fast
                else self.actors[next(self._rr)].search
            ).remote(q, limit=limit)
            for q in queries
        ]
        return ray.get(refs)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
