"""Resumable partitioned sink: per-bucket commit markers, resume-skip,
and byte-level equivalence of an interrupted+resumed export vs an
uninterrupted one."""

import os
import shutil

import duckdb
import pyarrow as pa
import pytest

from search_engine_core_ray.state.sink import (
    committed_buckets,
    write_resumable_partitions,
)

NB = 8


def _make_ds():
    import numpy as np
    import ray.data

    rng = np.random.RandomState(11)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(rng.randint(0, 1000, n), pa.int64()),
            "bucket": pa.array(np.arange(n) % NB, pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(7), t


def _read_back(out_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT k, v, bucket FROM read_parquet('{out_dir}/bucket=*/*.parquet', "
        "hive_partitioning=true) ORDER BY k"
    ).df()


def test_full_write_then_skip(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    ds, t = _make_ds()
    m1 = write_resumable_partitions(ds, out, "bucket", "v1", range(NB))
    assert sorted(m1["written"]) == list(range(NB)) and m1["skipped"] == []
    assert m1["rows_written"] == 4000
    assert committed_buckets(out, "v1", range(NB)) == set(range(NB))

    # rerun: everything skipped, nothing recomputed
    ds2, _ = _make_ds()
    m2 = write_resumable_partitions(ds2, out, "bucket", "v1", range(NB))
    assert m2 == {"written": [], "skipped": list(range(NB)), "rows_written": 0}

    df = _read_back(out)
    assert len(df) == 4000
    assert df["k"].tolist() == list(range(4000))


def test_interrupted_resume_is_identical(ray_session, tmp_path):
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "resumed")
    ds, _ = _make_ds()
    write_resumable_partitions(ds, out_a, "bucket", "v1", range(NB))

    ds2, _ = _make_ds()
    write_resumable_partitions(ds2, out_b, "bucket", "v1", range(NB))
    # simulate a crash that lost buckets 2 and 5 mid-commit
    for k in (2, 5):
        shutil.rmtree(os.path.join(out_b, f"bucket={k}"))
        os.remove(os.path.join(out_b, f"_PART_{k}.json"))

    ds3, _ = _make_ds()
    m = write_resumable_partitions(ds3, out_b, "bucket", "v1", range(NB))
    assert sorted(m["written"]) == [2, 5]
    assert sorted(m["skipped"]) == [0, 1, 3, 4, 6, 7]
    assert m["rows_written"] == 1000  # only the missing buckets' rows

    a, b = _read_back(out_a), _read_back(out_b)
    assert a.equals(b)


def test_lineage_change_rewrites(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    ds, _ = _make_ds()
    write_resumable_partitions(ds, out, "bucket", "v1", range(NB))
    ds2, _ = _make_ds()
    m = write_resumable_partitions(ds2, out, "bucket", "v2", range(NB))
    assert sorted(m["written"]) == list(range(NB))  # all invalidated
    assert len(_read_back(out)) == 4000


def test_cli_export_training(ray_session, tmp_path):
    """The export-training CLI surface end to end, incl. resume-skip
    (fresh subprocesses — the CLI owns its own Ray session)."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "train")
    cmd = [sys.executable, "-m", "search_engine_core_ray", "--num-cpus", "4",
           "export-training", "--sf-dir", "/root/testdata/sf0.001",
           "--out", out, "--buckets", "4", "--lineage", "t1"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert sorted(m1["written"]) == [0, 1, 2, 3] and m1["rows_written"] > 0

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/bucket=*/*.parquet', "
        "hive_partitioning=true)"
    ).fetchone()[0]
    assert n == m1["rows_written"]
    # same rows the flagship computes in-process
    exp = len(
        __import__("__ray_entry__").queries()["prepare_training_data"](
            "/root/testdata/sf0.001"
        ).to_pandas()
    )
    assert n == exp

    # rerun: all four buckets skipped, nothing rewritten
    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["written"] == [] and m2["skipped"] == [0, 1, 2, 3]
