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
    analyzer: str | dict = "default",
    codec: str = "vbyte",
) -> str:
    """Stage markers must invalidate when BUILD PARAMETERS change, not
    only when the input does — otherwise a re-run with different
    sharding/analyzer silently reuses segments laid out the old way.
    The codec suffix is appended only when non-default so pre-existing
    vbyte stage markers stay valid across upgrades."""
    if not isinstance(analyzer, str):  # per-language mapping: canonical form
        import json as _json

        analyzer = _json.dumps(analyzer, sort_keys=True, separators=(",", ":"))
    s = f"{lineage}|shards={num_shards}|bits={bucket_bits}|analyzer={analyzer}"
    if codec != "vbyte":
        s += f"|codec={codec}"
    return s


class WriteDocstorePass:
    """Pass-through map stage that writes its batch to the partitioned
    docstore as a SIDE EFFECT and emits only the columns the postings
    encoder needs — this is what fuses stage 1 (docstore) and stage 3
    (segments) into ONE streaming pipeline with no barrier and no disk
    re-read between them.

    Idempotent under Ray task retries: file and stats-partial names are
    derived from the batch's (min doc_id, num_rows), so a re-executed
    task overwrites its own output instead of duplicating rows.
    A stats partial json (n rows, summed byte lengths) rides along so
    corpus statistics cost no extra pass (summed by the driver after
    the pipeline — see collect_stats_partials)."""

    # lang rides along for per-language analyzer dispatch (a tiny
    # dictionary-encodable column; explode_postings ignores it when the
    # analyzer is a plain name)
    PASS_COLUMNS = ["doc_id", "title", "text", "meta_description", "lang"]

    def __init__(self, docstore_dir: str, bucket_bits: int, partials_dir: str):
        self.docstore_dir = docstore_dir
        self.bucket_bits = bucket_bits
        # partials live OUTSIDE the docstore dir so plain parquet
        # directory readers (pq.read_table) never trip over json files
        self.partials_dir = partials_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .segments import range_bucket

        if batch.num_rows == 0:
            return batch.select(self.PASS_COLUMNS)
        ids = batch.column("doc_id").to_numpy()
        buckets = range_bucket(ids, self.bucket_bits)
        tag = f"{int(ids.min())}-{batch.num_rows}"
        for j in sorted(set(buckets.tolist())):
            part = batch.filter(pa.array(buckets == j))
            d = os.path.join(self.docstore_dir, f"bucket={j}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".tmp-{tag}.parquet")
            pq.write_table(part, tmp, compression="zstd")
            os.rename(tmp, os.path.join(d, f"part-{tag}.parquet"))
        total_len = 0
        for col in ("len_content", "len_title", "len_desc"):
            total_len += pc.sum(batch.column(col)).as_py() or 0
        pdir = self.partials_dir
        os.makedirs(pdir, exist_ok=True)
        atomic_write_json(
            os.path.join(pdir, f"{tag}.json"),
            {"n": batch.num_rows, "len": int(total_len)},
        )
        return batch.select(self.PASS_COLUMNS)


def collect_stats_partials(partials_dir: str):
    """Sum the WriteDocstorePass stats partials -> CorpusStats."""
    import glob as _glob
    import json as _json

    n = total = 0
    for p in _glob.glob(os.path.join(partials_dir, "*.json")):
        d = _json.loads(open(p).read())
        n += d["n"]
        total += d["len"]
    avgdl = (total / n) if n else 100.0
    from .stats import CorpusStats

    return CorpusStats(total_docs=n, total_len=total, avgdl=avgdl)


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


def _commit_segment(
    group: pa.Table, segments_dir: str, lineage: str = "", codec: str = "vbyte"
) -> pa.Table:
    """Merge one (shard, bucket) group's runs and commit its segment
    file atomically (tmp + rename) with a sidecar meta json carrying
    the partition's lineage + metrics (north_rule: per-partition
    lineage and metrics per segment)."""
    empty = pa.table(
        {"shard": pa.array([], pa.int32()), "bucket": pa.array([], pa.int32()),
         "terms": pa.array([], pa.int64()), "postings": pa.array([], pa.int64()),
         "bytes": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    shard = group.column("shard")[0].as_py()
    bucket = group.column("bucket")[0].as_py()
    shard_dir = os.path.join(segments_dir, f"shard={shard:05d}")
    # per-partition resume BEFORE paying the merge: a committed segment
    # with MATCHING lineage is final (tmp+rename atomic + fsync) — skip
    # straight to its recorded metrics, so a retried/re-run merge pass
    # only merges and writes what a previous attempt didn't finish
    final = os.path.join(shard_dir, f"bucket={bucket:03d}.parquet")
    meta_path = os.path.join(shard_dir, f"bucket={bucket:03d}.meta.json")
    prev = read_json(meta_path)
    if prev is not None and prev.get("lineage") == lineage and os.path.exists(final):
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "bucket": pa.array([bucket], pa.int32()),
                "terms": pa.array([int(prev["terms"])], pa.int64()),
                "postings": pa.array([int(prev["postings"])], pa.int64()),
                "bytes": pa.array([int(prev["bytes"])], pa.int64()),
            }
        )
    merged = merge_bucket_runs(group, codec=codec)
    if merged.num_rows == 0:
        return empty
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, f".tmp-{uuid.uuid4().hex}.parquet")
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


def _split_runs_block(table: pa.Table, num_shards: int, n_buckets: int):
    """Plain-task split: one materialized runs block -> one (possibly
    empty) slice per (shard, bucket) group, zero-copy."""
    import numpy as np

    n_groups = num_shards * n_buckets
    if table.num_rows == 0:
        empty = table.slice(0, 0)
        return [empty] * n_groups
    key = (
        table.column("shard").to_numpy().astype(np.int64) * n_buckets
        + table.column("bucket").to_numpy().astype(np.int64)
    )
    # a key outside [0, n_groups) would silently fall past the last
    # searchsorted bound and vanish from the index — fail loudly instead
    if key.min() < 0 or key.max() >= n_groups:
        raise ValueError(
            f"run row with (shard,bucket) outside the exchange's "
            f"{num_shards}x{n_buckets} grid (key range "
            f"[{key.min()}, {key.max()}]) — num_shards/bucket_bits "
            "mismatch between EncodePostings and the segment commit"
        )
    order = np.argsort(key, kind="stable")
    t = table.take(pa.array(order))
    ks = key[order]
    out = []
    lo = 0
    bounds = np.searchsorted(ks, np.arange(n_groups + 1))
    for g in range(n_groups):
        lo, hi = int(bounds[g]), int(bounds[g + 1])
        out.append(t.slice(lo, hi - lo))
    return out


def _reduce_commit_group(
    segments_dir: str, lineage: str, codec: str, *parts: pa.Table
) -> dict:
    """Plain-task reduce: one (shard, bucket) group's run slices from
    every split task -> merged + committed segment; returns the
    per-partition metrics row as a dict."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return {}
    group = pa.concat_tables(tables)
    m = _commit_segment(group, segments_dir, lineage, codec)
    if m.num_rows == 0:
        return {}
    return {
        "shard": m.column("shard")[0].as_py(),
        "bucket": m.column("bucket")[0].as_py(),
        "terms": m.column("terms")[0].as_py(),
        "postings": m.column("postings")[0].as_py(),
        "bytes": m.column("bytes")[0].as_py(),
    }


def _shuffle_commit_segments(
    runs_mat, segments_dir: str, lineage: str, num_shards: int, bucket_bits: int,
    codec: str = "vbyte",
) -> dict[int, dict]:
    """Hand-rolled (shard, bucket) exchange over the MATERIALIZED runs:
    one plain split task per block (zero-copy per-group slices into the
    object store), one plain reduce task per group (concat + k-way
    merge + atomic commit). Replaces Ray Data's sort-based groupby for
    this bounded-cardinality key — the sort barrier alone cost ~4.6 s
    of the 32-CPU build tail, all of it avoidable when there are only
    num_shards * 2^bucket_bits groups.

    Object-store ref count scales as blocks x groups; both sides are
    configuration-bounded (the runs were repartitioned to ~num_cpus
    blocks, groups = num_shards * 2^bucket_bits). The Ray Data groupby
    twin remains on the resume path — same ``_commit_segment`` kernel,
    byte-identical segments either way (asserted in tests)."""
    import ray

    n_buckets = 1 << bucket_bits
    n_groups = num_shards * n_buckets
    block_refs = runs_mat.to_arrow_refs()
    split = ray.remote(num_returns=n_groups)(_split_runs_block)
    reduce_ = ray.remote(_reduce_commit_group)
    split_out = [split.remote(b, num_shards, n_buckets) for b in block_refs]
    if n_groups == 1:
        split_out = [[r] for r in split_out]
    red = [
        reduce_.remote(
            segments_dir, lineage, codec, *[s[g] for s in split_out]
        )
        for g in range(n_groups)
    ]
    meta: dict[int, dict] = {}
    for row in ray.get(red):
        if not row:
            continue
        m = meta.setdefault(
            int(row["shard"]), {"terms": 0, "postings": 0, "bytes": 0, "buckets": 0}
        )
        m["terms"] += int(row["terms"])
        m["postings"] += int(row["postings"])
        m["bytes"] += int(row["bytes"])
        m["buckets"] += 1
    return meta


def build_index(
    pages_ds,
    index_dir: str,
    *,
    config: ScoringConfig | None = None,
    num_shards: int = 32,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    analyzer: str | dict = "default",
    lineage: str = "",
    extract_concurrency: int | tuple | None = None,
    batch_size: int = 256,
    encode_batch_size: int | None = None,
    narrow_pages_ds=None,
    narrow_paths: list[str] | None = None,
    codec: str = "vbyte",
) -> BuildResult:
    """Build the full index under ``index_dir``; resumable per stage.

    ``codec`` selects the on-disk posting-list compression ("vbyte" |
    "pfor", see index/codec.py); it is part of the lineage (a codec
    switch invalidates stage markers) and recorded in the manifest so
    the query engine decodes symmetrically."""
    import ray.data  # noqa: F401  (Dataset ops)

    config = config or ScoringConfig.create_default()
    lineage = effective_lineage(lineage, num_shards, bucket_bits, analyzer, codec)
    os.makedirs(index_dir, exist_ok=True)
    docstore_dir = os.path.join(index_dir, "docstore")
    segments_dir = os.path.join(index_dir, "segments")
    t0 = time.monotonic()

    partials_dir = os.path.join(index_dir, "_stats_partials")
    docstore_marker = stage_done(index_dir, "docstore", lineage)
    stats_marker = stage_done(index_dir, "stats", lineage)
    seg_marker = stage_done(index_dir, "segments", lineage)
    stats: CorpusStats | None = (
        CorpusStats.from_dict(stats_marker["stats"]) if stats_marker else None
    )
    shards_meta: dict[int, dict] | None = (
        {int(k): v for k, v in seg_marker["shards"].items()} if seg_marker else None
    )

    def _finish_segments(seg_ds) -> dict[int, dict]:
        seg_metrics = seg_ds.to_pandas()  # one row per (shard, bucket) — tiny
        meta: dict[int, dict] = {}
        for _, r in seg_metrics.iterrows():
            m = meta.setdefault(
                int(r["shard"]), {"terms": 0, "postings": 0, "bytes": 0, "buckets": 0}
            )
            m["terms"] += int(r["terms"])
            m["postings"] += int(r["postings"])
            m["bytes"] += int(r["bytes"])
            m["buckets"] += 1
        return meta

    if docstore_marker is None:
        # ---- FUSED fresh build: ONE streaming pipeline ------------------
        #   pages -> prededup filter -> extract -> profile -> (dedup)
        #         -> WriteDocstorePass (docstore files + stats partials,
        #            side effects) -> EncodePostings -> groupby shuffle
        #         -> per-(shard,bucket) atomic segment commits
        # No inter-stage barrier and no docstore disk re-read: the
        # postings encoder consumes the same stream the docstore write
        # just saw. Stage markers stay per-stage for resume.
        import shutil

        from ..stages.profile import prededup_pages

        def _wipe_outputs():
            for d in (docstore_dir, segments_dir, partials_dir):
                if os.path.exists(d):
                    shutil.rmtree(d)

        def _chain(pages_in, dedup_stage):
            """read -> extract -> profile -> [dedup_stage] -> docstore
            side-effect write -> encode -> runs."""
            # Extraction holds no per-actor state (one parser per page),
            # so it runs as elastic stateless TASKS by default —
            # measured ~1.6x faster than an actor pool and it can never
            # starve the read/write operators of CPUs. Pass
            # extract_concurrency for an autoscaling (1, N) actor pool
            # (never a fixed pool == num_cpus, which deadlocks the
            # streaming executor).
            if extract_concurrency is None:
                extracted = pages_in.map_batches(
                    HtmlExtract(), batch_format="pyarrow", batch_size=batch_size
                )
            else:
                extracted = pages_in.map_batches(
                    HtmlExtract,
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    concurrency=extract_concurrency,
                )
            profiled = extracted.map_batches(
                ProfileDocs(), batch_format="pyarrow", batch_size=batch_size
            )
            # prune to the docstore columns BEFORE any exchange — the
            # raw html bytes must never ride through an all-to-all
            profiled = profiled.select_columns(DOCSTORE_COLUMNS)
            docs = dedup_stage(profiled)
            # the write/encode batch size sets the FUSED chain's task
            # granularity (Ray bundles the whole fused map chain at the
            # largest batch_size): ~1k rows/task keeps >=4 tasks per CPU
            # in flight at 32 CPUs while writing ~128-row-per-bucket
            # files. Larger encode batches also mean better map-side run
            # compression (more postings combined per emitted run).
            passed = docs.map_batches(
                WriteDocstorePass(docstore_dir, bucket_bits, partials_dir),
                batch_format="pyarrow",
                batch_size=encode_batch_size or max(batch_size, 1024),
            )
            return passed.map_batches(
                EncodePostings(
                    num_shards=num_shards, bucket_bits=bucket_bits,
                    analyzer=analyzer,
                ),
                batch_format="pyarrow",
                batch_size=encode_batch_size or batch_size,
            )

        def _finish(runs):
            # materialize the COMPRESSED runs (map-side combined,
            # ~20-100x smaller than raw postings) before the exchange:
            # with an all-to-all in the same pipeline, the executor's
            # shuffle resource reservation starves the extract/encode
            # map operator at low CPU counts (measured 3-of-8 effective
            # parallelism). The runs are the one thing small enough to
            # pin.
            runs_mat = runs.materialize()
            # coalesce the many small encode-output blocks: the split
            # fan-out scales with block count, and a repartition of
            # MATERIALIZED data is a cheap ref concat
            import ray as _ray

            target = max(32, int(_ray.cluster_resources().get("CPU", 32)))
            if runs_mat.num_blocks() > target:
                runs_mat = runs_mat.repartition(target).materialize()
            # plain-task (shard, bucket) exchange + per-group commit —
            # replaces the sort-based groupby whose barrier alone cost
            # ~4.6 s of the 32-CPU build tail
            meta = _shuffle_commit_segments(
                runs_mat, segments_dir, lineage, num_shards, bucket_bits, codec
            )
            return meta, runs_mat

        # LWW URL dedup via the NARROW pre-pass: the survivor rule needs
        # only (url, warc_ts), so the all-to-all moves two columns and
        # losers are dropped by a broadcast filter BEFORE extraction —
        # the html payload never rides a shuffle and superseded crawls
        # never cost a parse. Falls back to the payload-shuffle
        # lww_dedup when the loser set is too big to broadcast or a
        # winner is tied (prededup_pages docstring). The pass runs
        # SERIALLY before the main pipeline (its result decides the
        # pipeline's shape; overlapping it via a gate actor deadlocks —
        # Ray Data's resource manager does not yield blocked tasks'
        # slots to another dataset's executor), so pass ``narrow_paths``
        # for parquet corpora: the plain-task narrow pass skips the
        # Dataset executor's fixed costs (measured 0.6 s vs 2-11 s at
        # 200k pages), shrinking the build's serial prefix.
        _wipe_outputs()
        deduped_pages, clean = prededup_pages(
            pages_ds, narrow_ds=narrow_pages_ds, narrow_paths=narrow_paths
        )
        runs = _chain(deduped_pages, (lambda d: d) if clean else lww_dedup)
        shards_meta, seg_ds = _finish(runs)
        stats = collect_stats_partials(partials_dir)
        elapsed = time.monotonic() - t0
        excerpt = _stats_excerpt(seg_ds)
        mark_stage(
            index_dir, "docstore", lineage, seconds=elapsed, ray_stats=excerpt
        )
        mark_stage(index_dir, "stats", lineage, stats=stats.to_dict(), seconds=0.0)
        mark_stage(
            index_dir, "segments", lineage, shards=shards_meta, seconds=elapsed
        )
    else:
        # ---- resume: docstore already on disk ---------------------------
        import threading

        boxes: dict[str, dict] = {"stats": {}}
        threads: list[threading.Thread] = []

        # stage 2: corpus statistics — a tiny independent aggregate,
        # overlapped with the segments shuffle. read_parquet resolves
        # paths EAGERLY on the calling thread; do it here so the thread
        # never races the stage-3 read through Ray's (non-thread-safe
        # when aiohttp is absent) fsspec probe.
        t1 = time.monotonic()
        if stats is None:
            stats_src = _read_docstore(
                docstore_dir, ["len_content", "len_title", "len_desc"]
            )

            def _stats_job():
                try:
                    s = compute_corpus_stats(stats_src)
                    mark_stage(
                        index_dir, "stats", lineage,
                        stats=s.to_dict(), seconds=time.monotonic() - t1,
                    )
                    boxes["stats"]["stats"] = s
                except BaseException as e:  # surfaced after join
                    boxes["stats"]["error"] = e

            th = threading.Thread(target=_stats_job, name="corpus-stats")
            th.start()
            threads.append(th)

        # stage 3: postings combine + shuffle -> segments
        t2 = time.monotonic()
        if shards_meta is None:
            import shutil

            if os.path.exists(segments_dir):
                shutil.rmtree(segments_dir)
            runs_src = _read_docstore(
                docstore_dir,
                ["doc_id", "title", "text", "meta_description", "lang"],
            )
            runs = runs_src.map_batches(
                EncodePostings(
                    num_shards=num_shards, bucket_bits=bucket_bits, analyzer=analyzer
                ),
                batch_format="pyarrow",
                batch_size=encode_batch_size or batch_size,
            )
            seg_ds = runs.groupby(["shard", "bucket"]).map_groups(
                lambda g: _commit_segment(g, segments_dir, lineage, codec),
                batch_format="pyarrow",
            )
            shards_meta = _finish_segments(seg_ds)
            mark_stage(
                index_dir, "segments", lineage,
                shards=shards_meta, seconds=time.monotonic() - t2,
                ray_stats=_stats_excerpt(seg_ds),
            )

        for th in threads:
            th.join()
        for box in boxes.values():
            if "error" in box:
                raise box["error"]
        if stats is None:
            stats = boxes["stats"]["stats"]
    assert stats is not None and shards_meta is not None

    manifest = {
        "version": 1,
        "lineage": lineage,
        "num_shards": num_shards,
        "bucket_bits": bucket_bits,
        "analyzer": analyzer,
        "codec": codec,
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
