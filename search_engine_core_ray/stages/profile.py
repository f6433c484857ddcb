"""Page -> document profile projection and exact URL dedup.

``ProfileDocs`` mirrors crawlResultToSiteProfile
(src/storage/ContentStorage.cpp:161-208): domain, keywords (top-10),
word count, content quality, plus the engine-side additions — normalized
URL (URLFrontier::normalizeURL, src/crawler/URLFrontier.cpp:398-432),
stable doc_id (hash of normalized url — RedisSearchStorage.cpp:23-26
analog), and per-field UTF-8 byte lengths used by BM25.

``lww_dedup`` is the batch analog of the Mongo upsert-by-url
(ContentStorage.cpp:246-283) + the frontier visited-set
(URLFrontier.cpp:25-81): one surviving row per normalized URL, last
write (max warc_ts) wins. Implemented as a *bucketed* shuffle —
hash(url) % B buckets via groupby("_bucket"), with a vectorized polars
arg-max inside each bucket — so per-group Python overhead is O(B), not
O(num_urls), and the shuffle key is uniform even when one URL is
re-crawled millions of times.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ..functions.textproc import content_quality, count_words, extract_keywords
from ..functions.urls import doc_id_for_url, extract_domain, normalize_url


class ProfileDocs:
    """map_batches stage: extracted pages -> document profiles."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        norm = [normalize_url(u or "") for u in urls]
        doc_ids = [doc_id_for_url(u) for u in norm]
        domains = [extract_domain(u) for u in norm]
        keywords = [extract_keywords(t or "") for t in texts]
        wc = [count_words(t or "") for t in texts]
        quality = [content_quality(t or "") for t in texts]

        # SiteProfile.category is optional (SiteProfile.h:51); docs
        # without one get "" and never match a category: filter
        if "category" not in batch.column_names:
            batch = batch.append_column(
                "category", pa.array([""] * batch.num_rows, pa.string())
            )
        else:
            batch = batch.set_column(
                batch.column_names.index("category"),
                "category",
                pc.fill_null(batch.column("category"), ""),
            )
        out = batch.append_column("norm_url", pa.array(norm, pa.string()))
        out = out.append_column("doc_id", pa.array(doc_ids, pa.int64()))
        out = out.append_column("domain", pa.array(domains, pa.string()))
        out = out.append_column("keywords", pa.array(keywords, pa.list_(pa.string())))
        out = out.append_column("word_count", pa.array(wc, pa.int32()))
        out = out.append_column("quality", pa.array(quality, pa.float64()))
        # per-field lengths in BYTES (reference std::string::length):
        for src, name in (
            ("title", "len_title"),
            ("text", "len_content"),
            ("meta_description", "len_desc"),
        ):
            col = pc.fill_null(batch.column(src), "")
            out = out.append_column(
                name, pc.cast(pc.binary_length(col), pa.int32())
            )
        return out


def _add_bucket(batch: pa.Table, key: str, buckets: int) -> pa.Table:
    vals = batch.column(key).to_pylist()
    b = [zlib.crc32((v or "").encode("utf-8")) % buckets for v in vals]
    return batch.append_column("_bucket", pa.array(b, pa.int32()))


def _pick_latest(group: pa.Table, key: str, ts: str) -> pa.Table:
    df = pl.from_arrow(group)
    out = (
        df.sort([key, ts, "url"])
        .group_by(key, maintain_order=True)
        .last()
        .drop("_bucket")
    )
    return out.to_arrow()


def lww_dedup(ds, key: str = "norm_url", ts: str = "warc_ts", buckets: int = 64):
    """Last-write-wins exact dedup by ``key`` over a Dataset.

    Deterministic: survivor = max (ts, url) per key. ``buckets`` bounds
    the shuffle fan-in; at cluster scale raise it so each bucket's rows
    fit one worker's memory.
    """
    ds = ds.map_batches(
        lambda b: _add_bucket(b, key, buckets), batch_format="pyarrow"
    )
    return ds.groupby("_bucket").map_groups(
        lambda g: _pick_latest(g, key, ts), batch_format="pyarrow"
    )
