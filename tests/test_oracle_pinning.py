"""Kernel<->oracle pinning regressions (round-4 ADVICE.md):

- whitespace tokenization is pinned to RE2's exact ASCII \\S class on
  the polars side, so kernels and DuckDB oracles agree on corpora
  containing non-ASCII whitespace (U+00A0, U+2009) and \\v;
- epoch_shuffle's Knuth hash matches the SQL twin for NEGATIVE doc_id
  (numpy wraps mod 2^64; DuckDB % keeps the dividend's sign — the
  oracle forces the non-negative residue);
- JSONL timestamp codec is integer-exact past the float53 limit and
  accepts 'Z' / '+00:00' / naive / fraction-less ISO strings.

All direct kernel-vs-DuckDB checks — no Ray session needed.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

# text with NBSP, thin space, vertical tab, plus plain ASCII
NASTY_TEXTS = [
    "plain ascii words here",
    "nb sp and thin space tokens",
    "vertical\x0btab run",
    "",
    None,
    "   only exotic ws mixed in",
    "tab\tsep and\nnewline\fformfeed\rcr",
]


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(NASTY_TEXTS)), pa.int64()),
            "text": pa.array(NASTY_TEXTS, pa.string()),
        }
    )


def _sorted(t: pa.Table, keys):
    import pandas as pd  # noqa: F401

    return (
        t.to_pandas().sort_values(keys).reset_index(drop=True)
    )


def test_chunk_windows_kernel_matches_re2_oracle_on_exotic_ws():
    from search_engine_core_ray.stages.packing import _make_chunk_batch

    docs = _docs_table()
    w, s = 4, 3
    got = _make_chunk_batch(w, s)(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        rf"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '\S+') AS toks,
                 len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tok
          FROM documents),
        c AS (
          SELECT doc_id, toks, n_tok,
                 unnest(range(0, CASE WHEN n_tok = 0 THEN 0
                      ELSE 1 + (GREATEST(n_tok, {w}) - {w} + {s} - 1) // {s} END)) AS chunk_id
          FROM t)
        SELECT doc_id, chunk_id::BIGINT AS chunk_id,
               (chunk_id * {s})::BIGINT AS tok_start,
               LEAST({w}, n_tok - chunk_id * {s})::BIGINT AS tok_len,
               array_to_string(
                 list_slice(toks, chunk_id * {s} + 1,
                            chunk_id * {s} + LEAST({w}, n_tok - chunk_id * {s})),
                 ' ') AS chunk_text
        FROM c
        """
    ).arrow()
    a = _sorted(got, ["doc_id", "chunk_id"])
    b = _sorted(want, ["doc_id", "chunk_id"])
    assert a.equals(b), f"kernel vs RE2 oracle diverged:\n{a}\n{b}"
    # non-vacuity: the exotic-whitespace docs must actually tokenize
    assert (a["doc_id"] == 1).any() and (a["doc_id"] == 5).any()


def test_textstats_kernels_match_re2_oracle_on_exotic_ws():
    from search_engine_core_ray.stages import textstats as ts

    docs = _docs_table()
    # word_counts / token_counts / quality_metrics all ride WS_TOKEN_RE
    con = duckdb.connect()
    con.register("documents", docs)
    got = ts.word_counts(docs)
    want = con.execute(
        r"SELECT doc_id, len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_words "
        "FROM documents"
    ).arrow()
    assert _sorted(got, ["doc_id"]).equals(_sorted(want, ["doc_id"]))

    got = ts.token_counts(docs)
    want = con.execute(
        r"""
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS ws_tokens,
               len(regexp_extract_all(coalesce(text, ''),
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+'))::BIGINT AS bpe_tokens
        FROM documents
        """
    ).arrow()
    a, b = _sorted(got, ["doc_id"]), _sorted(want, ["doc_id"])
    assert a.equals(b), f"token_counts diverged:\n{a}\n{b}"
    # the NBSP doc must disagree with a Unicode-\S tokenization
    # (4 RE2 tokens vs 6 Unicode tokens) — guards against regressing
    # WS_TOKEN_RE back to '\S+'
    import re

    uni = len(re.findall(r"\S+", NASTY_TEXTS[1]))
    re2 = int(a.loc[a["doc_id"] == 1, "ws_tokens"].iloc[0])
    assert re2 != uni and re2 == 4

    got = ts.quality_metrics(docs)
    want = con.execute(
        r"""
        WITH m0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        m AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
                 length(text)::BIGINT AS n_chars,
                 length(regexp_replace(text, '\s', '', 'g'))::BIGINT AS nonspace,
                 len(regexp_extract_all(lower(text), '\b(the|and|of|is|in|to|a)\b'))::BIGINT AS stop_hits
          FROM m0)
        SELECT doc_id, n_words, n_chars, stop_hits,
               CAST(nonspace AS DOUBLE) / GREATEST(n_words, 1) AS mean_word_len,
               CAST(stop_hits AS DOUBLE) / GREATEST(n_words, 1) AS stop_ratio,
               CAST(LEAST(n_words, 100) AS DOUBLE) / 100.0
                 * (1.0 - CAST(stop_hits AS DOUBLE) / GREATEST(n_words, 1)) AS score
        FROM m
        """
    ).arrow()
    a, b = _sorted(got, ["doc_id"]), _sorted(want, ["doc_id"])
    assert a.equals(b), f"quality_metrics diverged:\n{a}\n{b}"


def test_epoch_hash_matches_sql_for_negative_doc_ids():
    from search_engine_core_ray.stages.packing import _make_epoch_key

    seed = 17
    ids = np.array(
        [-(2**62), -4294967296, -97, -1, 0, 1, 42, 2**31, 2**62], dtype=np.int64
    )
    batch = pa.table({"doc_id": pa.array(ids, pa.int64())})
    got = _make_epoch_key(seed)(batch).column("hkey").to_pylist()
    con = duckdb.connect()
    con.register("d", batch)
    want = con.execute(
        f"""
        SELECT ((CAST(doc_id AS HUGEINT) + {seed})
                 % 4294967296 + 4294967296) % 4294967296
                * 2654435761 % 4294967296 AS h
        FROM d
        """
    ).fetchall()
    want = [int(r[0]) for r in want]
    assert got == want
    # non-vacuity: a sign-naive oracle (DuckDB % alone) must differ
    naive = con.execute(
        f"""
        SELECT (CAST(doc_id AS HUGEINT) + {seed})
                % 4294967296 * 2654435761 % 4294967296 AS h
        FROM d
        """
    ).fetchall()
    assert [int(r[0]) for r in naive] != want


def test_jsonl_timestamp_codec_integer_exact_and_lenient():
    from search_engine_core_ray.sources.jsonl import _iso_to_us, _ts_to_iso

    # past the float53 limit: int(dt.timestamp() * 1e6) is off by 1 here
    for ts_us in [0, 1, 1_700_000_000_123_456, 9_007_199_254_740_993,
                  16_725_225_600_123_457]:
        assert _iso_to_us(_ts_to_iso(ts_us)) == ts_us
    # lenient inputs: offset form, naive, fraction-less, 'Z'
    assert _iso_to_us("2024-01-02T03:04:05.000006+00:00") == _iso_to_us(
        "2024-01-02T03:04:05.000006Z"
    )
    assert _iso_to_us("2024-01-02T03:04:05Z") == _iso_to_us(
        "2024-01-02T03:04:05.000000Z"
    )
    assert _iso_to_us("2024-01-02T03:04:05") == _iso_to_us(
        "2024-01-02T03:04:05Z"
    )
    # non-UTC offset converts
    assert _iso_to_us("2024-01-02T04:04:05+01:00") == _iso_to_us(
        "2024-01-02T03:04:05Z"
    )
