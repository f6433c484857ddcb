"""End-to-end index build pipeline (Ray-Data-first).

    pages(url, warc_ts, html, text?, lang)
      -> HtmlExtract          map_batches actor pool   (html -> title/meta/text/links)
      -> ProfileDocs          map_batches              (norm_url, doc_id, domain,
                                                        keywords, quality, lens)
      -> lww_dedup            bucketed groupby shuffle (one row per URL, LWW)
      -> docstore             write_parquet            (forward index)
      -> corpus stats         streaming aggregate      (N, avgdl)
      -> EncodePostings       map_batches COMBINER     (explode + per-batch
                                                        encoded sorted runs per
                                                        (term, docID-range bucket))
      -> groupby(shard,bucket) THE shuffle             (moves only compressed runs)
      -> merge_bucket_runs    k-way merge + block-max -> per-(shard,bucket)
                                                        atomic segment commit
      -> manifest             lineage + metrics per segment

Scale notes (100 TB / multi-node):
- the only full-data shuffle is the dedup groupby (keyed by a uniform
  url-hash bucket); the postings shuffle moves per-batch COMPRESSED
  runs (map-side combine), ~20-100x smaller than raw posting rows.
- skew: the shuffle key is (hash(term) shard, docID-range bucket) — a
  Zipf-head term splits across 2^bucket_bits bounded groups whose
  merged runs concatenate in docID order at read time (free secondary
  merge). Raise num_shards x bucket_bits with corpus size so each merge
  group fits a worker.
- postings rows never materialize on the driver; segment files are
  written inside the merge tasks (atomic tmp+rename per (shard,bucket)).
- every stage streams: no take_all/to_pandas on the big path.

Reference analog for the whole flow: Crawler::processURL ->
ContentStorage::storeCrawlResult -> RedisSearchStorage::indexDocument
(src/crawler/Crawler.cpp:515-728, src/storage/ContentStorage.cpp:232-316,
src/storage/RedisSearchStorage.cpp:127-172), re-expressed as batch
dataflow instead of record-at-a-time upserts.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..scoring.config import ScoringConfig
from ..stages.extract import HtmlExtract
from ..stages.profile import ProfileDocs, lww_dedup
from ..state.checkpoint import atomic_write_json, mark_stage, read_json, stage_done
from .segments import DEFAULT_BUCKET_BITS, EncodePostings, merge_bucket_runs
from .stats import CorpusStats, compute_corpus_stats

DOCSTORE_COLUMNS = [
    "doc_id",
    "norm_url",
    "url",
    "domain",
    "title",
    "meta_description",
    "text",
    "keywords",
    "lang",
    "category",
    "quality",
    "word_count",
    "len_title",
    "len_content",
    "len_desc",
    "warc_ts",
]


def effective_lineage(
    lineage: str,
    num_shards: int = 32,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    analyzer: str = "default",
) -> str:
    """Stage markers must invalidate when BUILD PARAMETERS change, not
    only when the input does — otherwise a re-run with different
    sharding/analyzer silently reuses segments laid out the old way."""
    return f"{lineage}|shards={num_shards}|bits={bucket_bits}|analyzer={analyzer}"


def write_docstore(docs_ds, docstore_dir: str, bucket_bits: int):
    """Write the forward index partitioned by docID-range bucket
    (hive dirs ``bucket=J/``) — the SAME key the segment files use, so
    a doc-partitioned serving actor (query/distributed.py) prunes its
    docstore read to one partition instead of scanning the whole
    forward index. Resumable output: one directory per key range."""
    from .segments import range_bucket

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.append_column(
            "bucket", pa.array(range_bucket(ids, bucket_bits), pa.int64())
        )

    out = docs_ds.map_batches(add_bucket, batch_format="pyarrow")
    out.write_parquet(docstore_dir, partition_cols=["bucket"])
    return out  # executed dataset, for ds.stats() observability


@dataclass
class BuildResult:
    index_dir: str
    stats: CorpusStats
    num_shards: int
    bucket_bits: int
    n_segments: int
    metrics: dict


def _commit_segment(group: pa.Table, segments_dir: str, lineage: str = "") -> pa.Table:
    """Merge one (shard, bucket) group's runs and commit its segment
    file atomically (tmp + rename) with a sidecar meta json carrying
    the partition's lineage + metrics (north_rule: per-partition
    lineage and metrics per segment)."""
    merged = merge_bucket_runs(group)
    empty = pa.table(
        {"shard": pa.array([], pa.int32()), "bucket": pa.array([], pa.int32()),
         "terms": pa.array([], pa.int64()), "postings": pa.array([], pa.int64()),
         "bytes": pa.array([], pa.int64())}
    )
    if merged.num_rows == 0:
        return empty
    shard = merged.column("shard")[0].as_py()
    bucket = merged.column("bucket")[0].as_py()
    shard_dir = os.path.join(segments_dir, f"shard={shard:05d}")
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(shard_dir, f"bucket={bucket:03d}.parquet")
    pq.write_table(merged.drop_columns(["shard"]), tmp, compression="zstd")
    # durability matches state/checkpoint.atomic_write_json: fsync the
    # data, rename, fsync the directory — a power failure can't leave a
    # 'segments' marker referencing a truncated segment file
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.rename(tmp, final)
    dfd = os.open(shard_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    n_postings = int(pc.sum(merged.column("df")).as_py() or 0)
    size = os.path.getsize(final)
    atomic_write_json(
        os.path.join(shard_dir, f"bucket={bucket:03d}.meta.json"),
        {"shard": shard, "bucket": bucket, "terms": merged.num_rows,
         "postings": n_postings, "bytes": size, "lineage": lineage},
    )
    return pa.table(
        {
            "shard": pa.array([shard], pa.int32()),
            "bucket": pa.array([bucket], pa.int32()),
            "terms": pa.array([merged.num_rows], pa.int64()),
            "postings": pa.array([n_postings], pa.int64()),
            "bytes": pa.array([size], pa.int64()),
        }
    )


def build_index(
    pages_ds,
    index_dir: str,
    *,
    config: ScoringConfig | None = None,
    num_shards: int = 32,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    analyzer: str = "default",
    lineage: str = "",
    extract_concurrency: int | tuple | None = None,
    batch_size: int = 256,
) -> BuildResult:
    """Build the full index under ``index_dir``; resumable per stage."""
    import ray.data  # noqa: F401  (Dataset ops)

    config = config or ScoringConfig.create_default()
    lineage = effective_lineage(lineage, num_shards, bucket_bits, analyzer)
    os.makedirs(index_dir, exist_ok=True)
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    t0 = time.monotonic()

    # ---- stage 1: extract + profile + dedup -> docstore ----------------
    docstore_marker = stage_done(index_dir, "docstore", lineage)
    if docstore_marker is None:
        # Extraction holds no per-actor state (one parser per page), so it
        # runs as elastic stateless TASKS by default — measured ~1.6x
        # faster than an actor pool and it can never starve the read/write
        # operators of CPUs. Pass extract_concurrency to opt into an actor
        # pool (e.g. when a future analyzer loads per-actor models; use an
        # autoscaling (1, N) pool, never a fixed pool == num_cpus, which
        # deadlocks the streaming executor).
        if extract_concurrency is None:
            extracted = pages_ds.map_batches(
                HtmlExtract(), batch_format="pyarrow", batch_size=batch_size
            )
        else:
            extracted = pages_ds.map_batches(
                HtmlExtract,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=extract_concurrency,
            )
        profiled = extracted.map_batches(
            ProfileDocs(), batch_format="pyarrow", batch_size=batch_size
        )
        # prune to the docstore columns BEFORE the dedup shuffle — the
        # raw html bytes must never ride through the all-to-all exchange
        profiled = profiled.select_columns(DOCSTORE_COLUMNS)
        docs = lww_dedup(profiled)
        import shutil

        if os.path.exists(docstore_dir):
            shutil.rmtree(docstore_dir)
        written = write_docstore(docs, docstore_dir, bucket_bits)
        mark_stage(
            index_dir, "docstore", lineage,
            seconds=time.monotonic() - t0,
            ray_stats=_stats_excerpt(written),
        )


    # ---- stage 2: corpus statistics ------------------------------------
    t1 = time.monotonic()
    stats_marker = stage_done(index_dir, "stats", lineage)
    if stats_marker is not None:
        stats = CorpusStats.from_dict(stats_marker["stats"])
    else:
        stats = compute_corpus_stats(
            _read_docstore(docstore_dir, ["len_content", "len_title", "len_desc"])
        )
        mark_stage(
            index_dir, "stats", lineage,
            stats=stats.to_dict(), seconds=time.monotonic() - t1,
        )

    # ---- stage 3: postings combine + shuffle -> segments ---------------
    t2 = time.monotonic()
    seg_marker = stage_done(index_dir, "segments", lineage)
    if seg_marker is None:
        import shutil

        if os.path.exists(segments_dir):
            shutil.rmtree(segments_dir)
        runs_src = _read_docstore(
            docstore_dir, ["doc_id", "title", "text", "meta_description"]
        )
        runs = runs_src.map_batches(
            EncodePostings(
                num_shards=num_shards, bucket_bits=bucket_bits, analyzer=analyzer
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        seg_ds = runs.groupby(["shard", "bucket"]).map_groups(
            lambda g: _commit_segment(g, segments_dir, lineage),
            batch_format="pyarrow",
        )
        seg_metrics = seg_ds.to_pandas()  # one row per (shard, bucket) — tiny
        shards_meta: dict[int, dict] = {}
        for _, r in seg_metrics.iterrows():
            m = shards_meta.setdefault(
                int(r["shard"]), {"terms": 0, "postings": 0, "bytes": 0, "buckets": 0}
            )
            m["terms"] += int(r["terms"])
            m["postings"] += int(r["postings"])
            m["bytes"] += int(r["bytes"])
            m["buckets"] += 1
        mark_stage(
            index_dir, "segments", lineage,
            shards=shards_meta, seconds=time.monotonic() - t2,
            ray_stats=_stats_excerpt(seg_ds),
        )
    else:
        shards_meta = {int(k): v for k, v in seg_marker["shards"].items()}

    manifest = {
        "version": 1,
        "lineage": lineage,
        "num_shards": num_shards,
        "bucket_bits": bucket_bits,
        "analyzer": analyzer,
        "stats": stats.to_dict(),
        "config": json.loads(config.to_json()),
        "shards": {str(k): v for k, v in sorted(shards_meta.items())},
        "build_seconds": time.monotonic() - t0,
    }
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return BuildResult(
        index_dir=index_dir,
        stats=stats,
        num_shards=num_shards,
        bucket_bits=bucket_bits,
        n_segments=len(shards_meta),
        metrics=manifest,
    )


def _stats_excerpt(ds, limit: int = 4000) -> str:
    """Per-operator wall/cpu/memory breakdown for the stage marker —
    the ds.stats() observability surface, persisted with the checkpoint
    so post-hoc tuning can read where time went."""
    try:
        return ds.stats()[:limit]
    except Exception:
        return ""


def _read_docstore(docstore_dir: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(docstore_dir, columns=columns)


def load_manifest(index_dir: str) -> dict:
    m = read_json(os.path.join(index_dir, "manifest.json"))
    if m is None:
        raise FileNotFoundError(f"no manifest.json under {index_dir}")
    return m
