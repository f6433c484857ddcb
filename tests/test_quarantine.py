"""Poison-pill quarantine wrapper (stages/quarantine.py): poisoned rows
are isolated by bisection and recorded; healthy rows flow on; a fully
poisoned kernel still fails loudly.

Kernels are defined INSIDE each test so cloudpickle serializes them by
value — a module-level kernel would pickle by reference to this test
module, which Ray workers cannot import (actor restart loop)."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from search_engine_core_ray.stages.quarantine import make_quarantined


def _pages(n=64):
    return pa.table(
        {
            "url": pa.array([f"https://x.test/{i}" for i in range(n)], pa.string()),
            "val": pa.array(list(range(n)), pa.int64()),
        }
    )


def _make_poisoned_kernel():
    def kernel(batch: pa.Table) -> pa.Table:
        vals = batch.column("val").to_numpy()
        if (vals % 17 == 3).any():  # rows 3, 20, 37, 54 are poison
            raise ValueError(f"poison at {vals[vals % 17 == 3][0]}")
        return pa.table(
            {"url": batch.column("url"), "doubled": pa.array(vals * 2, pa.int64())}
        )

    return kernel


def test_quarantine_isolates_poison_rows(ray_session, tmp_path):
    qdir = str(tmp_path / "quar")
    ds = ray.data.from_arrow(_pages(64)).repartition(4)
    wrapped = make_quarantined(_make_poisoned_kernel(), qdir, stage_name="double")
    out = ds.map_batches(
        wrapped, batch_format="pyarrow", concurrency=2
    ).to_pandas()

    poisoned = {3, 20, 37, 54}
    assert set(out["doubled"]) == {2 * v for v in range(64) if v not in poisoned}
    assert len(out) == 60

    qfiles = glob.glob(os.path.join(qdir, "*.parquet"))
    assert qfiles
    q = pa.concat_tables([pq.read_table(f) for f in qfiles]).to_pandas()
    got_keys = {int(k.rsplit("/", 1)[1]) for k in q["key"]}
    assert got_keys == poisoned
    assert (q["stage"] == "double").all()
    assert q["error"].str.contains("ValueError").all()


def test_quarantine_class_kernel(ray_session, tmp_path):
    """A stateful kernel CLASS is constructed inside the wrapper actor
    (once per actor) and quarantines the same rows."""
    inner = _make_poisoned_kernel()

    class Stateful:
        def __init__(self):
            self.calls = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            self.calls += 1
            return inner(batch)

    qdir = str(tmp_path / "quar2")
    ds = ray.data.from_arrow(_pages(32)).repartition(2)
    wrapped = make_quarantined(Stateful, qdir)
    out = ds.map_batches(
        wrapped, batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    assert len(out) == 30  # 3 and 20 quarantined


def test_quarantine_systemic_failure_raises(ray_session, tmp_path):
    def always_fails(batch: pa.Table) -> pa.Table:
        raise RuntimeError("kernel is broken for every row")

    qdir = str(tmp_path / "quar3")
    ds = ray.data.from_arrow(_pages(8))
    wrapped = make_quarantined(always_fails, qdir, stage_name="broken")
    with pytest.raises(Exception, match="entire batch failed|broken"):
        ds.map_batches(
            wrapped, batch_format="pyarrow", concurrency=1
        ).materialize()


def test_quarantine_zero_overhead_path_identity(ray_session, tmp_path):
    """A healthy kernel produces byte-identical output through the
    wrapper, and writes no quarantine files."""

    def healthy(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "doubled": pa.array(
                    batch.column("val").to_numpy() * 2, pa.int64()
                ),
            }
        )

    qdir = str(tmp_path / "quar4")
    ds = ray.data.from_arrow(_pages(32)).repartition(2)
    a = ds.map_batches(healthy, batch_format="pyarrow").to_pandas()
    b = ds.map_batches(
        make_quarantined(healthy, qdir), batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert a.sort_values("url", ignore_index=True).equals(
        b.sort_values("url", ignore_index=True)
    )
    assert not glob.glob(os.path.join(qdir, "*.parquet"))
