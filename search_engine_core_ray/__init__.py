"""search_engine_core_ray — a Ray-Data-native inverted-index build + BM25
query engine with the data-plane capabilities of the reference C++ web
search engine (mudassaralichouhan/search-engine-core).

Built Ray-Data-first: every stage is a ``Dataset`` transform
(``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, one ``groupby(term)`` shuffle for posting-list construction).
Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests' conftest fixture, bench.py, or the driver).

Layout
------
- ``functions/``  pure scalar/text functions (tokenizer, URL normalize,
  keywords) with semantics frozen from the reference (file:line cited in
  each docstring).
- ``stages/``     ``map_batches`` stage callables (HTML extract, postings
  explode, dedup, text-analysis, multimodal stubs).
- ``corpus/``     deterministic synthetic page-corpus generator.
- ``sources/``    readers that adapt the driver's parquet tables into the
  ``pages`` schema (url, warc_ts, html, text, lang).
- ``index/``      codec (delta+varbyte), corpus stats, segment build/merge,
  manifest/checkpoint handling.
- ``query/``      query parser (AST), physical planner, BM25 top-k engine.
- ``scoring/``    scoring config + the naive full-scan oracle used for
  rank-identity conformance tests.
- ``pipelines/``  end-to-end pipelines and the queries() catalog.
"""

import os as _os

# polars spawns an all-cores thread pool PER Ray worker by default —
# 32 tasks x 32 threads oversubscribes the node and destroys scaling.
# Pin it before any polars import; Ray does the same for OMP_NUM_THREADS.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.2.0"
