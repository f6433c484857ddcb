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


def test_symspell_deletion_property():
    # two terms within edit distance k share a depth-k deletion variant
    from search_engine_core_ray.functions.fuzzy import levenshtein, term_deletes

    rng = random.Random(99)
    alpha = "abcd"
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        k = levenshtein(a, b)
        if k <= 2:
            assert term_deletes(a, k) & term_deletes(b, k), (a, b, k)


def test_scan_and_symspell_paths_identical(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.functions.fuzzy import fuzzy_match_terms

    rng = random.Random(17)
    vocab = list({f"w{rng.randint(0, 400):03d}" for _ in range(300)}) + [
        "sort", "sword", "short", "snort", "tag7", "tag77",
    ]
    lex = pa.table(
        {"term": vocab,
         "df": [rng.randint(1, 500) for _ in vocab]}
    )
    queries = ("sort", "tag7", "wq12", "w0x1")
    outs = []
    for method in ("scan", "symspell"):
        ds = ray.data.from_arrow(lex).repartition(4)
        out = fuzzy_match_terms(ds, queries, max_dist=2, k=10, method=method)
        outs.append(
            out.to_pandas().sort_values(
                ["query_term", "rank"], ignore_index=True
            )
        )
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 4  # non-vacuous: real matches found
