"""End-to-end index build pipeline (Ray-Data-first).

    pages(url, warc_ts, html, text?, lang)
      -> HtmlExtract          map_batches actor pool   (html -> title/meta/text/links)
      -> ProfileDocs          map_batches              (norm_url, doc_id, domain,
                                                        keywords, quality, lens)
      -> lww_dedup            bucketed groupby shuffle (one row per URL, LWW)
      -> docstore             write_parquet            (forward index)
      -> corpus stats         streaming aggregate      (N, avgdl)
      -> TokenizeFields       map_batches actor pool   (postings explode + shard/salt)
      -> groupby(shard,salt)  THE shuffle              (encode_salted_runs)
      -> groupby(shard)       small shuffle of runs    (merge_shard_runs ->
                                                        per-shard atomic segment commit)
      -> manifest             lineage + per-segment metrics

Scale notes (100 TB / multi-node):
- the only full-data shuffles are the dedup groupby (keyed by url hash
  bucket) and groupby(shard, salt) over exploded postings; both keys are
  uniform by construction (crc32 buckets; salted terms).
- postings rows never materialize on the driver; segment files are
  written inside the merge tasks (atomic tmp+rename per shard).
- num_shards scales with corpus size (rule of thumb: postings bytes /
  shard <= a worker's heap / 4); salt_mod bounds Zipf-head groups.
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
from ..stages.postings import TokenizeFields
from ..stages.profile import ProfileDocs, lww_dedup
from ..state.checkpoint import atomic_write_json, mark_stage, read_json, stage_done
from .segments import encode_salted_runs, merge_shard_runs
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
    "quality",
    "word_count",
    "len_title",
    "len_content",
    "len_desc",
    "warc_ts",
]


@dataclass
class BuildResult:
    index_dir: str
    stats: CorpusStats
    num_shards: int
    salt_mod: int
    n_segments: int
    metrics: dict


def _commit_shard(group: pa.Table, segments_dir: str) -> pa.Table:
    """Merge one shard's salted runs and commit its segment atomically."""
    merged = merge_shard_runs(group)
    if merged.num_rows == 0:
        return pa.table(
            {"shard": pa.array([], pa.int32()), "terms": pa.array([], pa.int64()),
             "postings": pa.array([], pa.int64()), "bytes": pa.array([], pa.int64())}
        )
    shard = merged.column("shard")[0].as_py()
    shard_dir = os.path.join(segments_dir, f"shard={shard:05d}")
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(shard_dir, "terms.parquet")
    pq.write_table(merged.drop_columns(["shard"]), tmp, compression="zstd")
    os.rename(tmp, final)
    n_postings = int(pc.sum(merged.column("df")).as_py() or 0)
    size = os.path.getsize(final)
    meta = {
        "shard": shard,
        "terms": merged.num_rows,
        "postings": n_postings,
        "bytes": size,
    }
    atomic_write_json(os.path.join(shard_dir, "meta.json"), meta)
    return pa.table(
        {
            "shard": pa.array([shard], pa.int32()),
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
    salt_mod: int = 4,
    lineage: str = "",
    extract_concurrency: int | tuple | None = None,
    batch_size: int = 256,
) -> BuildResult:
    """Build the full index under ``index_dir``; resumable per stage."""
    import ray.data  # noqa: F401  (Dataset ops)

    config = config or ScoringConfig.create_default()
    os.makedirs(index_dir, exist_ok=True)
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    t0 = time.monotonic()

    # ---- stage 1: extract + profile + dedup -> docstore ----------------
    if extract_concurrency is None:
        import ray

        # autoscaling pool: min 1 actor so the pool can never reserve
        # every CPU and starve the read/write task operators (a fixed
        # pool of size == num_cpus deadlocks the streaming executor).
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        extract_concurrency = (1, max(2, n_cpus - 1))
    docstore_marker = stage_done(index_dir, "docstore", lineage)
    if docstore_marker is None:
        extracted = pages_ds.map_batches(
            HtmlExtract,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=extract_concurrency,
        )
        profiled = extracted.map_batches(
            ProfileDocs(), batch_format="pyarrow", batch_size=batch_size
        )
        docs = lww_dedup(profiled).select_columns(DOCSTORE_COLUMNS)
        import shutil

        if os.path.exists(docstore_dir):
            shutil.rmtree(docstore_dir)
        docs.write_parquet(docstore_dir)
        mark_stage(index_dir, "docstore", lineage, seconds=time.monotonic() - t0)

    docs_ds = _read_docstore(docstore_dir)

    # ---- stage 2: corpus statistics ------------------------------------
    t1 = time.monotonic()
    stats_marker = stage_done(index_dir, "stats", lineage)
    if stats_marker is not None:
        stats = CorpusStats.from_dict(stats_marker["stats"])
    else:
        stats = compute_corpus_stats(docs_ds)
        mark_stage(
            index_dir, "stats", lineage,
            stats=stats.to_dict(), seconds=time.monotonic() - t1,
        )

    # ---- stage 3: postings shuffle -> segments -------------------------
    t2 = time.monotonic()
    seg_marker = stage_done(index_dir, "segments", lineage)
    if seg_marker is None:
        import shutil

        if os.path.exists(segments_dir):
            shutil.rmtree(segments_dir)
        postings = docs_ds.select_columns(
            ["doc_id", "title", "text", "meta_description"]
        ).map_batches(
            TokenizeFields(num_shards=num_shards, salt_mod=salt_mod),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        runs = postings.groupby(["shard", "salt"]).map_groups(
            encode_salted_runs, batch_format="pyarrow"
        )
        seg_metrics = (
            runs.groupby("shard")
            .map_groups(
                lambda g: _commit_shard(g, segments_dir), batch_format="pyarrow"
            )
            .to_pandas()  # one row per shard — tiny
        )
        shards_meta = {
            int(r["shard"]): {
                "terms": int(r["terms"]),
                "postings": int(r["postings"]),
                "bytes": int(r["bytes"]),
            }
            for _, r in seg_metrics.iterrows()
        }
        mark_stage(
            index_dir, "segments", lineage,
            shards=shards_meta, seconds=time.monotonic() - t2,
        )
    else:
        shards_meta = {int(k): v for k, v in seg_marker["shards"].items()}

    manifest = {
        "version": 1,
        "lineage": lineage,
        "num_shards": num_shards,
        "salt_mod": salt_mod,
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
        salt_mod=salt_mod,
        n_segments=len(shards_meta),
        metrics=manifest,
    )


def _read_docstore(docstore_dir: str):
    import ray.data

    return ray.data.read_parquet(docstore_dir)


def load_manifest(index_dir: str) -> dict:
    m = read_json(os.path.join(index_dir, "manifest.json"))
    if m is None:
        raise FileNotFoundError(f"no manifest.json under {index_dir}")
    return m
