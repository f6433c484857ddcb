"""Driver-style correctness self-check: run every catalog entry at
sf0.001 and compare row-count + schema + order-insensitive values
against its DuckDB oracle — the same comparison the driver performs at
sf0.01 (CORRECTNESS_r{N}.json)."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = __import__("os").environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (x == y) or (
                    x is not None and y is not None
                    and not (math.isnan(x) or math.isnan(y))
                    and x == pytest.approx(y, abs=1e-12, rel=1e-12)
                )
                assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_catalog_vs_duckdb(ray_session, con, name):
    qs = entrymod.queries()
    ray_df = _to_pandas(qs[name](SF_DIR))
    sql_df = con.execute(entrymod.oracle_sql()[name]).df()
    _compare(ray_df, sql_df, name)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_entries_run(ray_session, name):
    ray_df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert ray_df is not None
    assert len(ray_df.columns) > 0


def test_entry_smoke(ray_session):
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"query", "rnk", "doc_id", "url", "score"}


# golden-file oracles for the two entries whose decode step cannot be
# expressed in DuckDB (binary PNG/WAV/Y4M payloads): the expected
# feature tables were generated once from the seeded media table and
# committed; the diff below is the same rows+schema+values gate the
# SQL entries get.
GOLDEN_KEYS = {
    "media_features": ["media_id"],
    "media_frame_samples": ["media_id", "frame_idx"],
    # golden = INDEPENDENT brute-force all-pairs hamming reference;
    # the banding machinery is lossless <= max_hamming, so exact
    "image_near_dupes": ["a", "b"],
    "audio_near_dupes": ["a", "b"],
}


@pytest.mark.parametrize("name", sorted(GOLDEN_KEYS))
def test_media_entries_match_goldens(ray_session, name):
    import os

    import numpy as np
    import pyarrow.parquet as pq

    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", f"{name}.parquet"
    )
    want = pq.read_table(golden_path).to_pandas()
    got = _to_pandas(entrymod.queries()[name](SF_DIR))
    got = got[sorted(got.columns)].sort_values(
        by=GOLDEN_KEYS[name]
    ).reset_index(drop=True)
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for col in want.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        for i, (x, y) in enumerate(zip(gv, wv)):
            if isinstance(x, (list, np.ndarray)):
                assert np.allclose(
                    np.asarray(x, np.float64), np.asarray(y, np.float64),
                    rtol=0, atol=1e-6,
                ), f"{name}.{col}[{i}]"
            elif isinstance(x, float):
                assert x == pytest.approx(y, abs=1e-9), f"{name}.{col}[{i}]"
            else:
                assert x == y, f"{name}.{col}[{i}]"
