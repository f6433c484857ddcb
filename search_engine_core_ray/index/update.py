"""Incremental ingest: the reference's upsert write path
(RedisSearchStorage::indexDocument / indexDocuments,
src/storage/RedisSearchStorage.cpp:127-216 — re-crawled URLs overwrite
their document, new URLs append) re-expressed as a batch operator.

``add_pages(index_dir, new_pages_ds, out_dir)`` builds a NEW index at
``out_dir`` that equals a from-scratch build over (old corpus ∪ new
pages):

1. the EXISTING docstore is read back as already-extracted documents —
   old pages are never re-fetched or re-parsed;
2. only the new pages run the extract+profile stages;
3. one LWW pass (max (warc_ts, url) per normalized URL) across the
   union decides upserts — a re-crawl of an old URL replaces its row,
   anything else appends;
4. stages 2+3 (stats + postings) rebuild from the merged docstore via
   the normal build path, so the result is byte-equivalent to a fresh
   build of the combined corpus (segments are docID-sorted and
   content-determined; asserted in tests).

Writing to a NEW directory keeps the old index serving until the
caller swaps — the same generational pattern as ``compact_index``.
Cost model: extraction is paid only for the delta; the postings
encode+shuffle is proportional to the merged corpus (the honest price
of globally-consistent df/avgdl — the reference pays it per query
instead by asking Redis for live aggregates).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..stages.extract import HtmlExtract
from ..stages.profile import ProfileDocs, lww_dedup
from .build import DOCSTORE_COLUMNS


def add_pages(
    index_dir: str,
    new_pages_ds,
    out_dir: str,
    *,
    batch_size: int = 256,
    **build_kw,
):
    """Upsert ``new_pages_ds`` into the corpus of ``index_dir``; build
    the merged index at ``out_dir`` and return its BuildResult."""
    import ray.data
    import pyarrow.dataset as pads

    from .delete import build_index_from_docs, load_tombstones

    docstore_dir = os.path.join(index_dir, "docstore")
    present = set(pads.dataset(docstore_dir).schema.names)
    cols = [c for c in DOCSTORE_COLUMNS if c in present]
    old_docs = ray.data.read_parquet(docstore_dir, columns=cols)
    # deleted docs stay deleted across generations
    tomb = set(load_tombstones(index_dir)["doc_ids"])
    if tomb:
        import pyarrow.compute as pc

        tomb_arr = pa.array(sorted(tomb))
        old_docs = old_docs.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("doc_id"), value_set=tomb_arr))
            ),
            batch_format="pyarrow",
        )

    extracted = new_pages_ds.map_batches(
        HtmlExtract(), batch_format="pyarrow", batch_size=batch_size
    )
    profiled = extracted.map_batches(
        ProfileDocs(), batch_format="pyarrow", batch_size=batch_size
    ).select_columns(DOCSTORE_COLUMNS)

    # backfill types for docstore columns missing from an old generation
    # (only string-typed TAG columns like ``category`` can legitimately
    # be absent today, but backfilling anything else as string "" would
    # union mismatched types — use the column's REAL type instead)
    _BACKFILL: dict[str, tuple[pa.DataType, object]] = {
        "doc_id": (pa.int64(), None),
        "keywords": (pa.list_(pa.string()), None),
        "quality": (pa.float64(), 0.0),
        "word_count": (pa.int32(), 0),
        "len_title": (pa.int32(), 0),
        "len_content": (pa.int32(), 0),
        "len_desc": (pa.int32(), 0),
        "warc_ts": (pa.timestamp("us"), None),
    }

    def _align(b: pa.Table) -> pa.Table:
        # old docstores may predate newer optional columns
        for c in DOCSTORE_COLUMNS:
            if c not in b.column_names:
                typ, default = _BACKFILL.get(c, (pa.string(), ""))
                col = (
                    pa.nulls(b.num_rows, typ)
                    if default is None
                    else pa.array([default] * b.num_rows, typ)
                )
                b = b.append_column(c, col)
        return b.select(DOCSTORE_COLUMNS)

    merged = old_docs.map_batches(_align, batch_format="pyarrow").union(
        profiled.map_batches(_align, batch_format="pyarrow")
    )
    # ONE LWW exchange across both generations decides every upsert
    docs = lww_dedup(merged)
    return build_index_from_docs(docs, out_dir, **build_kw)


# ---------------------------------------------------------------------------
# Generational segment merge — incremental ingest WITHOUT re-tokenizing
# ---------------------------------------------------------------------------

# total override/tombstone ids broadcast to every merge task; above this
# the delta is no longer "incremental" and the docstore-rebuild path
# (add_pages) is the honest cost model
MERGE_OVERRIDE_MAX = 50_000_000


def _segment_to_runs(
    t: "pa.Table", shard: int, bucket: int, codec: str, drop: "object"
) -> "pa.Table":
    """One input segment table -> RUNS-shaped rows for the merge kernel.

    Fast path: nothing to drop and the input is already VByte — the
    stored posting runs ARE valid merge runs (same delta+VByte layout),
    so rows pass through with zero decode. Otherwise decode (via the
    input's codec), filter dropped doc ids, and re-encode as VByte runs.
    """
    import numpy as np

    from .codec import (
        decode_postings,
        delta_encode_sorted,
        encode_group_sliced,
    )
    from .segments import RUNS_SCHEMA, _decode_runs, run_ids_from_gaps

    n_terms = t.num_rows
    df = t.column("df").to_numpy()
    shard_col = pa.array(np.full(n_terms, shard, dtype=np.int32))

    def _as_runs(tbl, n_col):
        return pa.table(
            {
                "shard": shard_col.slice(0, tbl.num_rows),
                "bucket": tbl.column("bucket"),
                "term": tbl.column("term"),
                "n": n_col,
                "docs_enc": tbl.column("docs_enc"),
                "tft_enc": tbl.column("tft_enc"),
                "tfc_enc": tbl.column("tfc_enc"),
                "tfd_enc": tbl.column("tfd_enc"),
            },
            schema=RUNS_SCHEMA,
        )

    if (drop is None or len(drop) == 0) and codec == "vbyte":
        return _as_runs(t, pa.array(df, pa.int64()))

    # decode all runs of the group at once
    if codec == "vbyte":
        gaps = _decode_runs(t.column("docs_enc").to_pylist(), df)
        tft = _decode_runs(t.column("tft_enc").to_pylist(), df)
        tfc = _decode_runs(t.column("tfc_enc").to_pylist(), df)
        tfd = _decode_runs(t.column("tfd_enc").to_pylist(), df)
    else:
        def _cat(col):
            parts = [decode_postings(col[i].as_py(), codec) for i in range(n_terms)]
            return (
                np.concatenate(parts) if parts else np.empty(0, np.uint64)
            )

        gaps = _cat(t.column("docs_enc"))
        tft = _cat(t.column("tft_enc"))
        tfc = _cat(t.column("tfc_enc"))
        tfd = _cat(t.column("tfd_enc"))
    ids = run_ids_from_gaps(gaps, df)

    keep = np.ones(len(ids), dtype=bool)
    if drop is not None and len(drop):
        pos = np.searchsorted(drop, ids)
        pos_c = np.minimum(pos, len(drop) - 1)
        keep = ~(drop[pos_c] == ids)
    term_idx = np.repeat(np.arange(n_terms, dtype=np.int64), df)
    ids_k, term_k = ids[keep], term_idx[keep]
    tft_k, tfc_k, tfd_k = tft[keep], tfc[keep], tfd[keep]
    new_df = np.bincount(term_k, minlength=n_terms).astype(np.int64)
    alive = new_df > 0
    if not alive.any():
        return RUNS_SCHEMA.empty_table()
    starts = np.concatenate(([0], np.cumsum(new_df[alive])))[:-1].astype(np.int64)
    gaps2 = delta_encode_sorted(ids_k)
    gaps2[starts] = ids_k[starts].astype(np.uint64)
    sub = t.filter(pa.array(alive))
    return pa.table(
        {
            "shard": shard_col.slice(0, int(alive.sum())),
            "bucket": sub.column("bucket"),
            "term": sub.column("term"),
            "n": pa.array(new_df[alive], pa.int64()),
            "docs_enc": encode_group_sliced(gaps2, starts),
            "tft_enc": encode_group_sliced(tft_k, starts),
            "tfc_enc": encode_group_sliced(tfc_k, starts),
            "tfd_enc": encode_group_sliced(tfd_k, starts),
        },
        schema=RUNS_SCHEMA,
    )


def _merge_one_group(
    shard: int,
    bucket: int,
    seg_paths: list,
    codecs: list,
    drop_arrs: list,
    segments_dir: str,
    lineage: str,
    out_codec: str,
) -> dict:
    """Plain-task kernel: merge one (shard, bucket) across generations
    and commit atomically (same resume rule as the build path)."""
    import ray

    from .build import _commit_segment

    # refs nested in a list are NOT auto-resolved by Ray — fetch here
    # (zero-copy read of the shared broadcast arrays)
    drop_arrs = [
        ray.get(d) if isinstance(d, ray.ObjectRef) else d for d in drop_arrs
    ]
    parts = []
    for path, codec, drop in zip(seg_paths, codecs, drop_arrs):
        if path is None or not os.path.exists(path):
            continue
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        runs = _segment_to_runs(t, shard, bucket, codec, drop)
        if runs.num_rows:
            parts.append(runs)
    if not parts:
        return {}
    group = pa.concat_tables(parts)
    m = _commit_segment(group, segments_dir, lineage, out_codec)
    if m.num_rows == 0:
        return {}
    return {
        "shard": shard,
        "bucket": bucket,
        "terms": m.column("terms")[0].as_py(),
        "postings": m.column("postings")[0].as_py(),
        "bytes": m.column("bytes")[0].as_py(),
    }


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    *,
    codec: str | None = None,
    lineage: str = "",
) -> "object":
    """Merge built indexes SEGMENT-TO-SEGMENT into ``out_dir`` — the
    north_rule's multi-way merge applied at the generation level: no
    page is re-fetched, re-parsed, or re-TOKENIZED; each (shard,
    bucket) group's posting runs from every generation k-way merge in
    one vectorized pass (the same ``merge_bucket_runs`` kernel the
    build uses, so output segments are content-identical to a fresh
    build over the surviving corpus).

    Semantics: ``index_dirs`` is oldest -> newest; a doc_id present in
    a LATER generation's docstore overrides every earlier posting and
    docstore row (the reference's upsert, RedisSearchStorage.cpp:127-216
    — equals LWW when re-crawls carry later warc_ts, which urlToKey
    guarantees is the same doc_id). Each generation's tombstones drop
    its own docs; a later re-add resurrects.

    Scale shape: one plain Ray task per (shard, bucket) — segment
    files themselves are the exchange, nothing rides through the
    object store but the override-id arrays (bounded: the DELTA
    generations' doc ids + tombstones, gated at MERGE_OVERRIDE_MAX;
    a delta too big to broadcast means the rebuild path ``add_pages``
    is the right tool and the error says so). Per-(shard,bucket)
    commits are atomic + lineage-checked, so a killed merge resumes.

    Requires equal (num_shards, bucket_bits, analyzer) across inputs
    (postings live in analyzer space; resharding needs a rebuild).
    Output ``codec`` defaults to the newest generation's.
    """
    import glob
    import json
    import shutil
    import time

    import numpy as np
    import ray

    from ..state.checkpoint import atomic_write_json, mark_stage, stage_done
    from .build import (
        BuildResult,
        WriteDocstorePass,
        collect_stats_partials,
        _read_docstore,
    )
    from .delete import load_tombstones
    from .segments import DEFAULT_BUCKET_BITS  # noqa: F401  (doc ref)

    if len(index_dirs) < 2:
        raise ValueError("merge_indexes needs at least two input indexes")
    t0 = time.monotonic()
    from .build import load_manifest

    manifests = [load_manifest(d) for d in index_dirs]
    num_shards = {int(m["num_shards"]) for m in manifests}
    bucket_bits = {int(m["bucket_bits"]) for m in manifests}
    # analyzer may be a per-language mapping (dict, unhashable):
    # compare canonical JSON forms, keep the original value
    import json as _json

    analyzer_keys = {
        _json.dumps(m.get("analyzer", "default"), sort_keys=True)
        for m in manifests
    }
    if len(num_shards) != 1 or len(bucket_bits) != 1 or len(analyzer_keys) != 1:
        raise ValueError(
            "merge_indexes requires equal num_shards/bucket_bits/analyzer "
            f"across inputs (got {num_shards}/{bucket_bits}/{analyzer_keys}); "
            "rebuild via add_pages/build_index_from_docs to reshard"
        )
    num_shards = num_shards.pop()
    bucket_bits = bucket_bits.pop()
    analyzer = manifests[0].get("analyzer", "default")
    out_codec = codec or manifests[-1].get("codec", "vbyte")
    in_codecs = [m.get("codec", "vbyte") for m in manifests]

    base = "+".join(m.get("lineage", "") for m in manifests)
    lineage = f"merge[{lineage}]:{base}|out_codec={out_codec}"

    # per-generation doc ids (narrow read) -> override + tombstone drops
    gen_ids: list[np.ndarray] = []
    for d in index_dirs[1:]:
        import pyarrow.parquet as pq

        ids = pq.read_table(
            os.path.join(d, "docstore"), columns=["doc_id"]
        ).column("doc_id").to_numpy()
        gen_ids.append(np.sort(ids))
    total_override = sum(len(a) for a in gen_ids) + sum(
        len(load_tombstones(d)["doc_ids"]) for d in index_dirs
    )
    if total_override > MERGE_OVERRIDE_MAX:
        raise ValueError(
            f"merge delta too large to broadcast ({total_override} override "
            f"ids > {MERGE_OVERRIDE_MAX}); use add_pages (docstore rebuild) "
            "for non-incremental merges"
        )
    drops: list[np.ndarray] = []
    for i, d in enumerate(index_dirs):
        tomb = np.asarray(load_tombstones(d)["doc_ids"], dtype=np.int64)
        later = gen_ids[i:]  # gen_ids[j] holds ids of index_dirs[j+1]
        parts = [a for a in later + [tomb] if len(a)]
        drops.append(
            np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )

    os.makedirs(out_dir, exist_ok=True)
    segments_dir = os.path.join(out_dir, "segments")
    docstore_dir = os.path.join(out_dir, "docstore")
    partials_dir = os.path.join(out_dir, "_stats_partials")

    # ---- segments: one plain task per (shard, bucket) ------------------
    seg_marker = stage_done(out_dir, "segments", lineage)
    if seg_marker is not None:
        shards_meta = {int(k): v for k, v in seg_marker["shards"].items()}
    else:
        drop_refs = [ray.put(a) for a in drops]
        groups: dict[tuple, list] = {}
        for i, d in enumerate(index_dirs):
            for p in glob.glob(
                os.path.join(d, "segments", "shard=*", "bucket=*.parquet")
            ):
                sh = int(os.path.basename(os.path.dirname(p)).split("=")[1])
                bk = int(os.path.basename(p).split("=")[1].split(".")[0])
                groups.setdefault((sh, bk), [None] * len(index_dirs))[i] = p
        merge_task = ray.remote(_merge_one_group)
        futs = [
            merge_task.remote(
                sh, bk, paths, in_codecs, drop_refs, segments_dir, lineage,
                out_codec,
            )
            for (sh, bk), paths in sorted(groups.items())
        ]
        shards_meta = {}
        for row in ray.get(futs):
            if not row:
                continue
            m = shards_meta.setdefault(
                int(row["shard"]),
                {"terms": 0, "postings": 0, "bytes": 0, "buckets": 0},
            )
            m["terms"] += int(row["terms"])
            m["postings"] += int(row["postings"])
            m["bytes"] += int(row["bytes"])
            m["buckets"] += 1
        mark_stage(
            out_dir, "segments", lineage,
            shards=shards_meta, seconds=time.monotonic() - t0,
        )

    # ---- docstore: filtered union, same partitioned layout -------------
    ds_marker = stage_done(out_dir, "docstore", lineage)
    if ds_marker is None:
        for dd in (docstore_dir, partials_dir):
            if os.path.exists(dd):
                shutil.rmtree(dd)
        merged = None
        for d, drop in zip(index_dirs, drops):
            # select the REAL columns only: reading a hive-partitioned
            # docstore without a column list also surfaces the `bucket`
            # partition key, which must not be re-written into files
            import pyarrow.dataset as pads

            src = os.path.join(d, "docstore")
            present = set(pads.dataset(src).schema.names)
            cols = [c for c in DOCSTORE_COLUMNS if c in present]
            part = _read_docstore(src, columns=cols)
            if len(drop):
                ref = ray.put(drop)

                def _flt(b: pa.Table, _ref=ref) -> pa.Table:
                    import pyarrow.compute as pc

                    arr = ray.get(_ref)
                    ids = b.column("doc_id").to_numpy()
                    pos = np.searchsorted(arr, ids)
                    pos_c = np.minimum(pos, len(arr) - 1)
                    return b.filter(pa.array(~(arr[pos_c] == ids)))

                part = part.map_batches(_flt, batch_format="pyarrow")
            merged = part if merged is None else merged.union(part)
        sink = merged.map_batches(
            WriteDocstorePass(docstore_dir, bucket_bits, partials_dir),
            batch_format="pyarrow",
        )
        n_docs = sink.count()  # drives the side-effect write
        mark_stage(out_dir, "docstore", lineage, docs=int(n_docs))

    stats = collect_stats_partials(partials_dir)
    manifest = {
        "version": 1,
        "lineage": lineage,
        "num_shards": num_shards,
        "bucket_bits": bucket_bits,
        "analyzer": analyzer,
        "codec": out_codec,
        "stats": stats.to_dict(),
        "config": manifests[-1].get("config", {}),
        "shards": {str(k): v for k, v in sorted(shards_meta.items())},
        "build_seconds": time.monotonic() - t0,
        "merged_from": [m.get("lineage", "") for m in manifests],
    }
    atomic_write_json(os.path.join(out_dir, "manifest.json"), manifest)
    return BuildResult(
        index_dir=out_dir,
        stats=stats,
        num_shards=num_shards,
        bucket_bits=bucket_bits,
        n_segments=len(shards_meta),
        metrics=manifest,
    )
