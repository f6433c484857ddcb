"""Driver contract for the Ray-Data search engine rebuild.

- ``entry()``      — flagship pipeline (full index build + fixture query
  set) on sf0.001; Ray is already initialised by the caller.
- ``queries()``    — the operator catalog (SURVEY.md §2 + training-data
  extensions), one callable per implemented operator, each taking
  ``sf_dir``.
- ``oracle_sql()`` — matching DuckDB SQL per SQL-expressible entry
  (identical column names; floats disciplined for hash-compare — see
  search_engine_core_ray/pipelines/catalog.py).

Nothing here (or in the library) calls ray.init()/ray.shutdown(); the
caller owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the inverted index from sf0.001 documents (wrapped
    as Common-Crawl-style pages), run the fixture query set, return the
    ranked results table."""
    from search_engine_core_ray.pipelines.catalog import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from search_engine_core_ray.pipelines.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from search_engine_core_ray.pipelines.catalog import ORACLE_SQL

    return dict(ORACLE_SQL)
