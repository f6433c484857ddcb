"""WARC source/sink: Common-Crawl-style WARC files <-> the pages table.

WARC (ISO 28500 — a public spec; the container Common Crawl publishes)
frames records as

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (case-insensitive names)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                               (record separator)

``response`` records carry an HTTP response whose body is the page
HTML; ``warcinfo``/``request``/``metadata`` records are skipped. The
reader is stdlib-only (no warcio): strict Content-Length framing, and
``.warc.gz`` in the Common-Crawl style (one gzip MEMBER per record,
members concatenated) decoded by gzip's multi-member reader.

Scale shape: ONE WARC file is the parallel unit — Common Crawl ships
~1 GiB files, the natural Ray read-task granularity — so ``read_warc``
is a ``FileBasedDatasource``: Ray Data assigns whole files to read
tasks, streams record batches out as Arrow blocks, and the downstream
extract/index pipeline consumes them with backpressure. No record
parsing happens on the driver.

Output schema matches the BASELINE.json input_hint pages shape
(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string); ``text``/``lang`` are emitted empty — in Common Crawl
they live in sidecar WET files, and here ``HtmlExtract`` derives text
downstream (build_index never reads the input ``text``).

``write_warc`` is the sink twin (and test-fixture generator): pages
batches -> spec-shaped response records, optionally one gzip member
per record. Round-trip byte-identity is asserted in tests/test_warc.py.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"


def _parse_warc_date(s: str) -> int:
    """WARC-Date (ISO 8601, 'Z' suffix, optional fraction) -> epoch µs."""
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _format_warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str,str] lower-keyed, payload: bytes) per
    record of an UNCOMPRESSED WARC byte stream. Strict framing: raises
    ValueError on a malformed record rather than resyncing silently."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate extra blank lines between records
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        end = data.find(_CRLF2, pos)
        if end < 0:
            raise ValueError("WARC: unterminated record header block")
        block = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not block[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {block[0]!r}")
        headers: dict[str, str] = {}
        for line in block[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/invalid Content-Length") from None
        body_start = end + 4
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError("WARC: truncated record payload")
        yield headers, payload
        pos = body_start + clen


def _http_response_body(payload: bytes) -> bytes:
    """Split an application/http payload into (headers, body); return
    the body. A payload without an HTTP status line is returned as-is
    (some writers store raw html with Content-Type text/html)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(_CRLF2)
    return payload if sep < 0 else payload[sep + 4 :]


def warc_bytes_to_pages(data: bytes) -> pa.Table:
    """Parse one WARC file's bytes (gz or plain) -> pages-shaped Table."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)  # multi-member aware
    urls, tss, htmls = [], [], []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers["warc-date"]) if "warc-date" in headers else 0
        urls.append(url)
        tss.append(ts)
        htmls.append(_http_response_body(payload))
    empty = [""] * len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(tss, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(empty, pa.string()),
            "lang": pa.array(empty, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def read_warc(paths, batch_rows: int = 1024, **read_kw):
    """``ray.data.read_*`` twin for WARC: one file per read task,
    record batches of ``batch_rows`` rows per yielded block."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    class WARCDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz"]

        def _read_stream(self, f, path: str):
            # whole-file read: WARC gzip members and Content-Length
            # framing both need the full byte stream; the file is the
            # parallel unit (one task each), so this is one block's
            # worth of input by construction
            table = warc_bytes_to_pages(f.readall())
            for off in range(0, max(table.num_rows, 1), batch_rows):
                yield table.slice(off, batch_rows)

    return ray.data.read_datasource(WARCDatasource(paths), **read_kw)


def pages_to_warc_bytes(batch: pa.Table, gzip_per_record: bool = False) -> bytes:
    """Serialize a pages batch to WARC bytes (response records with an
    HTTP/1.1 envelope, Common-Crawl layout). With ``gzip_per_record``,
    each record is its own gzip member (the .warc.gz convention that
    lets a reader seek to a record without decompressing the file)."""
    out = io.BytesIO()
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()
    for url, ts, html in zip(urls, tss, htmls):
        if html is None:
            html = b""
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {_format_warc_date(ts or 0)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode() + http + _CRLF2
        if gzip_per_record:
            # mtime=0 keeps the fixture bytes deterministic
            rec = gzip.compress(rec, mtime=0)
        out.write(rec)
    return out.getvalue()


def write_warc(batch: pa.Table, path: str) -> None:
    """Write one pages batch as one WARC file (gz iff path endswith .gz)."""
    data = pages_to_warc_bytes(batch, gzip_per_record=path.endswith(".gz"))
    with open(path, "wb") as f:
        f.write(data)
