"""Domain deletion: tombstones + compaction.

Reference: RedisSearchStorage::deleteDocumentsByDomain
(src/storage/RedisSearchStorage.cpp:594-648) — search domain, collect
urls, delete each. The segment-file analog is two-phase:

1. ``tombstone_domain``: resolve the domain's doc_ids from the docstore
   (partition-pruned read of two columns) and append them to an atomic
   ``tombstones.json``. O(matching docs); segments untouched. The query
   engine subtracts tombstoned ids from every candidate set.
2. ``compact_index``: rewrite the index without tombstoned docs — a new
   docstore (filtered copy) + recomputed stats + rebuilt segments via
   the normal build stages, then tombstones cleared. Run it when the
   tombstone fraction justifies the rebuild (the same economics as a
   Lucene merge-on-delete).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.checkpoint import atomic_write_json, read_json

TOMBSTONES = "tombstones.json"


def load_tombstones(index_dir: str) -> dict:
    return read_json(os.path.join(index_dir, TOMBSTONES)) or {
        "domains": [],
        "doc_ids": [],
    }


def tombstone_domain(index_dir: str, domain: str) -> int:
    """Mark every doc of ``domain`` deleted; returns how many."""
    t = pq.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "domain"]
    )
    hit = t.filter(pc.equal(t.column("domain"), domain))
    ids = hit.column("doc_id").to_pylist()
    cur = load_tombstones(index_dir)
    merged = sorted(set(cur["doc_ids"]) | set(ids))
    domains = sorted(set(cur["domains"]) | {domain})
    atomic_write_json(
        os.path.join(index_dir, TOMBSTONES),
        {"domains": domains, "doc_ids": merged},
    )
    return len(ids)


def tombstone_url(index_dir: str, url: str) -> int:
    """Single-document delete — RedisSearchStorage::deleteDocument(url)
    (include/search_engine/storage/RedisSearchStorage.h:91,
    src/storage/RedisSearchStorage.cpp:203-216): the URL is normalized
    with the same rule that keyed it at index time, its doc row is
    tombstoned, and the next ``compact_index`` drops it physically.
    Returns how many docs were marked (0 when the URL isn't indexed)."""
    from ..functions.urls import normalize_url

    norm = normalize_url(url or "")
    t = pq.read_table(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "norm_url"]
    )
    hit = t.filter(pc.equal(t.column("norm_url"), norm))
    ids = hit.column("doc_id").to_pylist()
    if not ids:
        return 0
    cur = load_tombstones(index_dir)
    merged = sorted(set(cur["doc_ids"]) | set(ids))
    atomic_write_json(
        os.path.join(index_dir, TOMBSTONES),
        {"domains": cur["domains"], "doc_ids": merged},
    )
    return len(ids)


def compact_index(index_dir: str, new_index_dir: str, **build_kw) -> None:
    """Rewrite the index at ``new_index_dir`` without tombstoned docs."""
    import ray.data

    from .build import DOCSTORE_COLUMNS, build_index

    tomb = set(load_tombstones(index_dir)["doc_ids"])
    # prune to the docstore columns: the hive layout would otherwise
    # resurrect the bucket partition key as a data column. Intersect
    # with the ACTUAL schema so docstores written before newer columns
    # (e.g. category) existed still compact — the engine already reads
    # them tolerantly.
    import pyarrow.dataset as pads

    present = set(pads.dataset(os.path.join(index_dir, "docstore")).schema.names)
    docs = ray.data.read_parquet(
        os.path.join(index_dir, "docstore"),
        columns=[c for c in DOCSTORE_COLUMNS if c in present],
    )
    if tomb:
        docs = docs.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("doc_id"), value_set=__import__("pyarrow").array(sorted(tomb))))
            ),
            batch_format="pyarrow",
        )
    # the docstore is already extracted/deduped: rebuild by treating its
    # rows as pre-extracted pages (html bypass)
    build_index_from_docs(docs, new_index_dir, **build_kw)


def build_index_from_docs(docs_ds, index_dir: str, **build_kw):
    """Build stages 2+3 over an existing docs dataset (columns =
    DOCSTORE_COLUMNS); used by compaction and doc-table ingestion."""
    import shutil

    from .build import build_index

    # reuse build_index by persisting the docstore ourselves and marking
    # stage 1 done under the same lineage
    from ..state.checkpoint import mark_stage

    from .build import effective_lineage
    from .segments import DEFAULT_BUCKET_BITS

    lineage = effective_lineage(
        build_kw.get("lineage", ""),
        build_kw.get("num_shards", 32),
        build_kw.get("bucket_bits", DEFAULT_BUCKET_BITS),
        build_kw.get("analyzer", "default"),
        build_kw.get("codec", "vbyte"),
    )
    os.makedirs(index_dir, exist_ok=True)
    docstore_dir = os.path.join(index_dir, "docstore")
    if os.path.exists(docstore_dir):
        shutil.rmtree(docstore_dir)
    from .build import write_docstore

    write_docstore(
        docs_ds, docstore_dir,
        build_kw.get("bucket_bits", DEFAULT_BUCKET_BITS),
    )
    mark_stage(index_dir, "docstore", lineage, seconds=0.0)
    return build_index(None, index_dir, **build_kw)
