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


# ----------------------------------------------------------------------
# Linked pages: the same deterministic wrapper plus an intra-corpus
# link structure, for the link-graph operators (link_edges / link_stats
# / pagerank).  Kept separate from ``documents_to_pages`` so the
# byte-identical extraction oracle (extract_text) is untouched.
# ----------------------------------------------------------------------

# Knuth multiplicative constant — same one _category_for uses; public
# folklore, not a reference-derived value.
_LINK_MULT = 2654435761


def link_targets_for_doc(doc_id: int, n_docs: int) -> list[int]:
    """Deterministic fixture link rule, SQL-reproducible in one line:
    doc ``i`` is DANGLING (no outlinks) when ``i % 7 == 0``; otherwise
    it has ``1 + i % 4`` link slots (1-based ``j``), self-targets
    skipped.  All link URLs live on the SOURCE page's own domain
    (site-internal hrefs — resolvable without any information about
    the target row):

    - ODD slots target ``(i + 20*((i*2654435761 + 97*j) % max(n//20,1))) % n``
      — congruent to ``i`` mod 20, so when the corpus' ``source``
      assignment is doc_id-mod-20 round-robin (the driver testdata
      shape) the URL is the target's REAL canonical page — a genuine
      intra-site in-link;
    - EVEN slots target ``(i*2654435761 + 97*j) % n`` — almost always
      another source's doc, so the URL names a page nobody crawled:
      a natural dangling node of the graph, exactly what a frontier
      sees in links to the uncrawled web."""
    if doc_id % 7 == 0:
        return []
    out = []
    for j in range(1, 2 + doc_id % 4):
        h = (doc_id * _LINK_MULT + 97 * j)
        if j % 2 == 1:
            t = (doc_id + 20 * (h % max(n_docs // 20, 1))) % n_docs
        else:
            t = h % n_docs
        if t != doc_id:
            out.append(t)
    return out


def link_hrefs_for_doc(doc_id: int, source: str, n_docs: int) -> list[tuple[str, str]]:
    """(href_as_written, canonical_dst_url) pairs for one doc.  The
    href form cycles through the reference's four resolvable shapes —
    absolute, proto-relative, path-absolute, absolute+#fragment
    (ContentParser::normalizeUrl, src/crawler/ContentParser.cpp:209-243)
    — all of which normalize_link + normalize_url collapse onto the
    canonical ``https://{source}.example.com/doc/{t}``."""
    pairs = []
    for j, t in enumerate(link_targets_for_doc(doc_id, n_docs), start=1):
        canon = f"https://{source}.example.com/doc/{t}"
        kind = (doc_id + j) % 4
        if kind == 0:
            href = canon
        elif kind == 1:
            href = f"//{source}.example.com/doc/{t}"
        elif kind == 2:
            href = f"/doc/{t}"
        else:
            href = f"{canon}#ref{j}"
        pairs.append((href, canon))
    return pairs


def documents_to_linked_pages(batch: pa.Table, n_docs: int) -> pa.Table:
    """map_batches kernel: documents rows -> pages rows whose HTML body
    carries the deterministic ``<a href>`` structure above (anchor text
    ``Doc {t}``)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, htmls, ts = [], [], []
    for did, src, txt in zip(doc_ids, sources, texts):
        f = page_fields_for_doc(did, src, txt or "")
        html = f["html"].decode("utf-8")
        anchors = "".join(
            f'<div><a href="{href}">Doc {dst.rsplit("/", 1)[1]}</a></div>'
            for href, dst in link_hrefs_for_doc(did, src, n_docs)
        )
        html = html.replace("</body></html>", anchors + "</body></html>")
        urls.append(f["url"])
        htmls.append(html.encode("utf-8"))
        ts.append(_BASE_TS_US + int(did))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_documents_as_linked_pages(sf_dir: str, min_blocks: int = 8):
    """documents.parquet -> linked pages Dataset.  The one scalar the
    kernel needs is the corpus doc count (the link rule's modulus) —
    an O(1) driver aggregate, computed before the streaming job."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=min_blocks,
    )
    return ds.map_batches(
        lambda b: documents_to_linked_pages(b, n_docs), batch_format="pyarrow"
    )
