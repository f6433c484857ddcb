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
