"""Resumable partitioned parquet sink.

A 100-TB export cannot be one giant write: the job WILL be preempted,
and restarting from zero wastes every finished byte.  This sink gives
Dataset output the same stage-marker discipline the index build uses
(state/checkpoint.py, FIXTURES.md F8), at PARTITION granularity:

- the caller names an int64 bucket column (hash of the natural key,
  or an existing shard id) with a KNOWN bucket universe;
- one streaming job writes only the not-yet-committed buckets, hive-
  partitioned, into a lineage-scoped staging area;
- each finished bucket directory is renamed into place (atomic on one
  filesystem; on an object store this is a per-partition manifest
  flip) and commits a ``_PART_<k>.json`` marker carrying the lineage;
- a rerun skips committed buckets entirely at the WRITE: their rows
  are filtered out of the stream before any byte is rewritten.  How
  much COMPUTE the resume re-runs depends on where the bucket column
  is born: derived at the source (input shard id, key-range bucket —
  the index build's shape) the filter prunes the whole pipeline;
  derived from the output (export-training's seq_id buckets) the
  upstream transform re-runs and only the write is saved.  Pick
  source-derived buckets when resume compute matters.

Deterministic pipelines (everything in this repo) make the
skipped+rewritten result byte-identical to an uninterrupted run;
a lineage change invalidates every marker and rewrites cleanly.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from .checkpoint import atomic_write_json, read_json


def _marker(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"_PART_{bucket}.json")


def committed_buckets(out_dir: str, lineage: str, buckets) -> set[int]:
    """Buckets whose marker exists AND carries the current lineage."""
    done = set()
    for k in buckets:
        m = read_json(_marker(out_dir, int(k)))
        if m is not None and m.get("lineage") == lineage:
            done.add(int(k))
    return done


def write_resumable_partitions(
    ds,
    out_dir: str,
    bucket_col: str,
    lineage: str,
    buckets,
) -> dict:
    """Write ``ds`` hive-partitioned by ``bucket_col`` with per-bucket
    atomic commit + resume-skip.  ``buckets`` is the full expected
    bucket universe (ints).  Returns a metrics dict
    ``{written: [...], skipped: [...], rows_written: n}``.
    """
    buckets = sorted(int(k) for k in buckets)
    os.makedirs(out_dir, exist_ok=True)
    done = committed_buckets(out_dir, lineage, buckets)
    todo = [k for k in buckets if k not in done]
    if not todo:
        return {"written": [], "skipped": buckets, "rows_written": 0}

    # filter BEFORE compute: committed buckets never re-run the pipeline
    todo_arr = pa.array(todo, pa.int64())

    def keep_todo(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.is_in(pc.cast(b.column(bucket_col), pa.int64()), value_set=todo_arr)
        )

    staging = os.path.join(out_dir, f"_staging_{lineage}")
    shutil.rmtree(staging, ignore_errors=True)
    remaining = ds.map_batches(keep_todo, batch_format="pyarrow")
    remaining.write_parquet(staging, partition_cols=[bucket_col])

    written, rows = [], 0
    for k in todo:
        src = os.path.join(staging, f"{bucket_col}={k}")
        dst = os.path.join(out_dir, f"{bucket_col}={k}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            rows += _parquet_rows(src)
            os.rename(src, dst)  # atomic partition flip
        else:
            os.makedirs(dst, exist_ok=True)  # legitimately empty bucket
        atomic_write_json(_marker(out_dir, k), {"lineage": lineage, "bucket": k})
        written.append(k)
    shutil.rmtree(staging, ignore_errors=True)
    return {"written": written, "skipped": sorted(done), "rows_written": rows}


def _parquet_rows(part_dir: str) -> int:
    """Row count from parquet footers only — no data read, no recompute."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(part_dir):
        if name.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(part_dir, name)).num_rows
    return total
