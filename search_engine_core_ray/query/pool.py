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
    on head-term queries.

    ``max_size > size`` enables autoscaling: ``search_many`` grows the
    pool toward one actor per ``scale_batch`` queued queries (each new
    actor opens the index in __init__ — the connection-pool warmup),
    and the pool never shrinks below ``size``. Scaling is demand-driven
    and monotone within a pool lifetime — the simple policy that fits
    a replicated read-only index."""

    def __init__(
        self,
        index_dir: str,
        size: int = 4,
        fast: bool = False,
        max_size: int | None = None,
        scale_batch: int = 32,
        **engine_kwargs,
    ):
        self.index_dir = index_dir
        self.engine_kwargs = engine_kwargs
        self.max_size = max(max_size or size, size)
        self.scale_batch = max(1, scale_batch)
        self.actors = [
            _EngineActor.remote(index_dir, engine_kwargs) for _ in range(size)
        ]
        self._rr = itertools.cycle(range(size))
        self.fast = fast

    def _scale_to(self, n: int) -> None:
        n = min(n, self.max_size)
        while len(self.actors) < n:
            self.actors.append(
                _EngineActor.remote(self.index_dir, self.engine_kwargs)
            )
        self._rr = itertools.cycle(range(len(self.actors)))

    def search(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        actor = self.actors[next(self._rr)]
        m = actor.search_fast if self.fast else actor.search
        return ray.get(
            m.remote(query, limit=limit, offset=offset, highlight=highlight)
        )

    def search_many(self, queries: list[str], limit: int = 10) -> list[dict]:
        """Scatter a batch across the pool; preserves input order.
        Autoscales first when the batch justifies more actors."""
        if self.max_size > len(self.actors):
            self._scale_to(-(-len(queries) // self.scale_batch))
        refs = []
        for q in queries:
            actor = self.actors[next(self._rr)]
            m = actor.search_fast if self.fast else actor.search
            refs.append(m.remote(q, limit=limit))
        return ray.get(refs)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
