"""FIXTURES.md F8 hard version: SIGKILL a build process mid-run after
at least one committed stage, restart it, and require the final index
to be byte-identical to an uninterrupted build."""

import glob
import os
import signal
import subprocess
import sys
import time

BUILD_SNIPPET = """
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data
from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
pages = ray.data.from_arrow(synth_pages_table(SynthConfig(n_docs=120, seed=55)))
build_index(pages, sys.argv[1], lineage="kill-test", num_shards=4)
ray.shutdown()
print("BUILD_DONE")
"""


def _segments(d):
    return sorted(glob.glob(os.path.join(d, "segments", "**", "bucket=*.parquet")))


def _run_build(index_dir, kill_after_marker=None, timeout=240):
    proc = subprocess.Popen(
        [sys.executable, "-c", BUILD_SNIPPET, index_dir],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    if kill_after_marker is None:
        out, _ = proc.communicate(timeout=timeout)
        assert "BUILD_DONE" in out
        return True
    marker = os.path.join(index_dir, kill_after_marker)
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if os.path.exists(marker):
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait(timeout=60)
            return False  # killed mid-build
        if proc.poll() is not None:
            # finished before we could kill it — acceptable, still a build
            return True
        time.sleep(0.05)
    proc.kill()
    raise TimeoutError("build never reached the marker")


def test_sigkill_after_docstore_then_resume(tmp_path):
    ref_dir = str(tmp_path / "ref")
    kill_dir = str(tmp_path / "killed")

    _run_build(ref_dir)  # uninterrupted reference build
    finished = _run_build(kill_dir, kill_after_marker="_STAGE_docstore.json")
    if not finished:
        # must be mid-build: docstore committed, segments incomplete or absent
        assert os.path.exists(os.path.join(kill_dir, "_STAGE_docstore.json"))
    _run_build(kill_dir)  # restart — skips committed stages, finishes the rest

    ref_segs = _segments(ref_dir)
    new_segs = _segments(kill_dir)
    assert [os.path.relpath(p, ref_dir) for p in ref_segs] == [
        os.path.relpath(p, kill_dir) for p in new_segs
    ]
    for a, b in zip(ref_segs, new_segs):
        assert open(a, "rb").read() == open(b, "rb").read(), os.path.relpath(a, ref_dir)
    # identical manifests modulo timing fields
    import json

    ma = json.load(open(os.path.join(ref_dir, "manifest.json")))
    mb = json.load(open(os.path.join(kill_dir, "manifest.json")))
    for k in ("num_shards", "bucket_bits", "stats", "shards", "analyzer"):
        assert ma[k] == mb[k], k
