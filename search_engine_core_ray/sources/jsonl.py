"""JSONL source/sink: newline-delimited-JSON page files <-> the pages
table (the WET/CC-style distribution format next to warc.py's WARC).

One JSON object per line with the BASELINE.json input_hint fields:

    {"url": ..., "warc_ts": <ISO 8601 'Z' string, µs precision>,
     "html": <base64 of the html bytes>, "text": ..., "lang": ...}

JSON has neither a timestamp nor a bytes type, so the sink encodes
``warc_ts`` as an ISO-8601 string and ``html`` as standard base64; the
reader reverses both exactly (round-trip byte-identity asserted in
tests/test_jsonl.py). ``.jsonl.gz`` is handled by gzip sniffing.

Scale shape: like read_warc, ONE file is the parallel unit — a
FileBasedDatasource assigns whole files to Ray read tasks, decodes
records into Arrow blocks inside the task (never on the driver), and
the downstream extract/index pipeline streams them with backpressure.
Decoding is vectorized where the libs allow (one json.loads per line
is unavoidable in stdlib; base64+timestamp conversion is batched).
"""

from __future__ import annotations

import base64
import calendar
import gzip
import json
from datetime import datetime, timezone

import pyarrow as pa

from .warc import PAGES_SCHEMA

_GZIP_MAGIC = b"\x1f\x8b"


def _ts_to_iso(ts_us: int) -> str:
    # pure integer split (divmod floors, so the µs remainder is always
    # in [0, 1e6)) — a float ts_us/1e6 path loses the last microsecond
    # past the float53 limit (~year 2245)
    sec, us = divmod(int(ts_us), 10**6)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc).replace(microsecond=us)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _iso_to_us(s: str) -> int:
    # lenient ISO-8601: accepts 'Z' or numeric offsets, with or without
    # a fractional part (fromisoformat), naive strings read as UTC;
    # integer epoch arithmetic keeps the round-trip exact for any year
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return calendar.timegm(dt.utctimetuple()) * 10**6 + dt.microsecond


def jsonl_bytes_to_pages(data: bytes) -> pa.Table:
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for line in data.splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        urls.append(rec["url"])
        tss.append(_iso_to_us(rec["warc_ts"]))
        htmls.append(base64.b64decode(rec["html"]))
        texts.append(rec.get("text", ""))
        langs.append(rec.get("lang", ""))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    ).cast(PAGES_SCHEMA)


def pages_to_jsonl_bytes(batch: pa.Table, compress: bool = False) -> bytes:
    ts_us = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    out = []
    for url, ts, html, text, lang in zip(
        batch.column("url").to_pylist(),
        ts_us,
        batch.column("html").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("lang").to_pylist(),
    ):
        out.append(
            json.dumps(
                {
                    "url": url,
                    "warc_ts": _ts_to_iso(ts),
                    "html": base64.b64encode(html or b"").decode("ascii"),
                    "text": text or "",
                    "lang": lang or "",
                },
                ensure_ascii=False,
                sort_keys=True,
            )
        )
    blob = ("\n".join(out) + "\n").encode("utf-8")
    return gzip.compress(blob, mtime=0) if compress else blob


def read_jsonl_pages(paths, batch_rows: int = 1024, **read_kw):
    """Ray Dataset over JSONL page files — one read task per file."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    class JsonlPagesDatasource(FileBasedDatasource):
        def _read_stream(self, f, path: str):
            data = f.readall() if hasattr(f, "readall") else f.read()
            tbl = jsonl_bytes_to_pages(data)
            for off in range(0, max(tbl.num_rows, 1), batch_rows):
                chunk = tbl.slice(off, batch_rows)
                if chunk.num_rows:
                    yield chunk

    return ray.data.read_datasource(JsonlPagesDatasource(paths), **read_kw)


def write_jsonl(batch: pa.Table, path: str) -> None:
    """Sink twin / fixture generator: one pages batch -> one file."""
    with open(path, "wb") as f:
        f.write(
            pages_to_jsonl_bytes(
                batch, compress=str(path).endswith(".gz")
            )
        )
