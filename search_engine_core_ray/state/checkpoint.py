"""Checkpoint / resume primitives: atomic manifests with lineage.

The reference survives restarts by mirroring frontier state to Mongo and
rehydrating pending tasks (src/crawler/URLFrontier.cpp:73-162,
src/crawler/Crawler.cpp:61-80). The batch-build analog is
stage-granular checkpointing: each pipeline stage (docstore, stats,
segments) commits an atomic ``_STAGE_<name>.json`` marker carrying the
input lineage token and metrics; a restarted build skips stages whose
marker matches the current lineage, and deterministic doc_ids/ordering
make the skipped+rebuilt result byte-identical to an uninterrupted run
(FIXTURES.md F8). Per-shard segment metrics live in the manifest
(north_rule: "lineage and metrics per segment").

Atomicity = write to a temp file in the same directory, fsync, rename.
"""

from __future__ import annotations

import json
import os


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def stage_marker_path(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, f"_STAGE_{stage}.json")


def stage_done(index_dir: str, stage: str, lineage: str) -> dict | None:
    """Return the stage's committed payload if it matches ``lineage``."""
    payload = read_json(stage_marker_path(index_dir, stage))
    if payload is not None and payload.get("lineage") == lineage:
        return payload
    return None


def mark_stage(index_dir: str, stage: str, lineage: str, **metrics) -> None:
    atomic_write_json(
        stage_marker_path(index_dir, stage), {"lineage": lineage, **metrics}
    )
