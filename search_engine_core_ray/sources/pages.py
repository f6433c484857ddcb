"""Sources: load the ``pages`` input table (url, warc_ts, html, text, lang).

Two paths in:
- ``read_pages(path)``  — a parquet dataset already in pages shape
  (what a Common-Crawl-style dump looks like per BASELINE.json input_hint).
- ``read_documents_as_pages(sf_dir)`` — adapts the driver's
  ``documents.parquet`` (doc_id, text, lang, source, n_chars — FIXTURES.md
  F9) into deterministic synthetic pages so the full extract pipeline is
  exercised: every doc gets a stable url, a derived title/description and
  an HTML wrapper whose extraction yields ``title + " " + text + " "``.

The wrapper is built with vectorized pyarrow/python in ``map_batches``;
fields are DETERMINISTIC functions of (doc_id, source, text) so the
DuckDB oracle can recompute them in SQL:

    url         = 'https://' || source || '.example.com/doc/' || doc_id
    title       = 'Doc ' || doc_id || ' ' || source
    description = first 10 whitespace tokens of text, space-joined
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
# optional page columns carried through when present (SiteProfile.category,
# include/search_engine/storage/SiteProfile.h:51)
PAGES_OPTIONAL = ["category"]

# Timestamps must be deterministic: epoch + doc_id microseconds.
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs


def read_pages(path: str) -> "ray.data.Dataset":
    """Read a parquet pages table, pruning to the pages columns (plus
    any optional columns the file actually has)."""
    import pyarrow.dataset as pads

    names = set(pads.dataset(path).schema.names)
    cols = PAGES_COLUMNS + [c for c in PAGES_OPTIONAL if c in names]
    return ray.data.read_parquet(path, columns=cols)


def page_fields_for_doc(doc_id: int, source: str, text: str) -> dict:
    """Deterministic page fields for one driver document (scalar form)."""
    title = f"Doc {doc_id} {source}"
    desc = " ".join(text.split()[:10])
    url = f"https://{source}.example.com/doc/{doc_id}"
    body = _html.escape(text, quote=False)
    html = (
        f"<html><head><title>{_html.escape(title, quote=False)}</title>"
        f'<meta name="description" content="{_html.escape(desc)}">'
        f"</head><body><p>{body}</p></body></html>"
    )
    # ground truth per the reference emission rule: title node + body node
    expected_text = ""
    if title.strip():
        expected_text += title + " "
    if text.strip():
        expected_text += text + " "
    return {
        "url": url,
        "title": title,
        "description": desc,
        "html": html.encode("utf-8"),
        "text": expected_text,
    }


def documents_to_pages(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents rows -> pages rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, htmls, expected, ts = [], [], [], []
    for did, src, txt in zip(doc_ids, sources, texts):
        f = page_fields_for_doc(did, src, txt or "")
        urls.append(f["url"])
        htmls.append(f["html"])
        expected.append(f["text"])
        ts.append(_BASE_TS_US + int(did))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(expected, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # deterministic category := source (same oracle-recomputable
            # rule class as url/title above)
            "category": pa.array(sources, pa.string()),
        }
    )


def read_documents_as_pages(sf_dir: str, min_blocks: int = 8) -> "ray.data.Dataset":
    """documents.parquet -> pages Dataset (deterministic wrapper HTML).

    ``override_num_blocks`` splits the (locally single-file) input into
    enough blocks that every downstream stage can run in parallel; on a
    real corpus the many input files provide the splits for free."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=min_blocks,
    )
    return ds.map_batches(documents_to_pages, batch_format="pyarrow")
