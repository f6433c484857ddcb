"""Fuzzy term matching: DP-vs-DuckDB levenshtein identity, cap
semantics, and ranking non-vacuity of the catalog entry."""

import random

import duckdb
import polars as pl
import pytest

from search_engine_core_ray.functions.fuzzy import levenshtein

SF_DIR = "/root/testdata/sf0.001"


def test_levenshtein_matches_duckdb_on_random_strings():
    rng = random.Random(421)
    con = duckdb.connect()
    alpha = "abcde"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8))),
        )
        for _ in range(300)
    ]
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_cap_early_exit_semantics():
    # values <= cap are EXACT; values above cap just need to stay above
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("kitten", "sitting", cap=2) > 2
    assert levenshtein("kitten", "sitting", cap=3) == 3
    assert levenshtein("abc", "abd", cap=2) == 1
    assert levenshtein("", "abcd", cap=2) > 2
    assert levenshtein("same", "same", cap=0) == 0


def test_fuzzy_term_match_ranking_non_vacuous(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = pl.from_pandas(QUERIES["fuzzy_term_match"](SF_DIR).to_pandas())
    # all three distance tiers appear (exact, 1-typo, 2-typo)
    assert set(out["dist"].unique().to_list()) == {0, 1, 2}
    # within each query, rank order == (dist asc, df desc, term asc)
    for (_, g) in out.group_by("query_term"):
        g = g.sort("rank")
        keys = list(zip(g["dist"].to_list(), [-d for d in g["df"].to_list()],
                        g["term"].to_list()))
        assert keys == sorted(keys)
    # the tag widening gives a query with a FULL top-10 (ties broken)
    assert out.group_by("query_term").len()["len"].max() == 10
