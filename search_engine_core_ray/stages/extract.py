"""HTML -> (title, meta_description, text, links) extraction stage.

Reproduces the observable semantics of the reference's ContentParser
(src/crawler/ContentParser.cpp):

- ``text``: DFS over the parsed tree; every *non-whitespace* text node
  appends ``node_text + " "``; ``<script>`` and ``<style>`` subtrees are
  skipped entirely (ContentParser.cpp:153-167). Whitespace-only text runs
  are skipped because Gumbo types them GUMBO_NODE_WHITESPACE, which the
  reference's extractTextFromNode does not emit.
- ``title``: the first text child of the *first* ``<title>`` that is a
  direct child of ``<head>``; absent (null) if that title's first child is
  not a text node (ContentParser.cpp:85-130).
- ``meta_description``: DFS-first ``<meta name="description" content=…>``
  (ContentParser.cpp:132-151, 187-207).
- ``links``: every ``<a href>`` in DFS order, sanitized
  (UrlSanitizer.cpp:11-76), resolved against the page URL
  (ContentParser.cpp:209-243) and regex-validated (:245-251).

The per-page parse is inherently row-wise (like the reference), so the
stage is a callable CLASS for ``map_batches``: the parser machinery is
constructed once per actor, and ``__call__`` loops rows inside a
zero-copy Arrow batch.

HTML5 (Gumbo) tokenizer parity — the reference parses with Gumbo, an
HTML5 tree builder; Python's html.parser is an HTML4-style tokenizer,
so the divergent behaviors that change extractText output are
implemented here explicitly (tests/test_extract_html5.py pins each):

- RAWTEXT elements (``xmp iframe noembed noframes plaintext``): HTML5
  tokenizes their contents as ONE raw text node — ``<xmp><b>x</b></xmp>``
  emits the literal ``<b>x</b>``, no tag parsing, no charref decoding.
- RCDATA elements (``title textarea``): literal markup, but character
  references DO decode — ``<title>a <b> c</title>`` has the single text
  child ``a <b> c`` (html.unescape implements the HTML5 charref rules).
- Contiguous character tokens coalesce into ONE text node: stray ``<``
  before a non-letter is text per HTML5, and ``a < b`` must emit one
  node ``a < b`` (one trailing space in extractText), not three.

Pinned deviations (documented, structure-only):
- Foster parenting: HTML5 moves stray text inside ``<table>`` BEFORE the
  table, so Gumbo's DFS can emit it earlier than source order; this
  streaming extractor preserves source order (same text, same
  separators, different order for that malformed shape).
- ``</plaintext>`` terminates our raw-text mode; HTML5's PLAINTEXT
  state is unrecoverable and would keep it literal.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser

import pyarrow as pa

from ..functions.urls import is_valid_url, normalize_link, sanitize_url

_SKIP_SUBTREES = ("script", "style")
# HTML5 tokenizer content modes (WHATWG 13.2.5.1): raw text never
# decodes charrefs; RCDATA decodes charrefs but parses no tags.
_RAWTEXT = ("script", "style", "xmp", "iframe", "noembed", "noframes", "plaintext")
_RCDATA = ("title", "textarea")
# Void elements never get end tags; excluding them keeps the open-element
# stack honest when input omits optional end tags.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _PageExtractor(HTMLParser):
    """One-pass streaming extractor with Gumbo-equivalent output."""

    # html.parser enters cdata mode (no tag parsing, no charref
    # conversion) for these start tags — the HTML5 RAWTEXT/RCDATA set,
    # not just script/style
    CDATA_CONTENT_ELEMENTS = _RAWTEXT + _RCDATA

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.text_parts: list[str] = []
        self.links: list[str] = []
        self.anchor_texts: list[str] = []  # 1:1 aligned with self.links
        self.title: str | None = None
        self.meta_description: str | None = None
        self._skip_depth = 0          # nesting depth inside script/style
        self._stack: list[str] = []   # open element stack
        self._head_title_seen = False
        self._title_run: list[str] | None = None  # accumulating first-title text
        self._pending: list[str] = []  # coalescing buffer: one text NODE
        self._anchor_buf: list[str] | None = None  # open valid-href anchor text

    # -- tag events ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._flush_text()
        self._flush_title_run(ended=tag != "title")
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            self._stack.append(tag)
            return
        if tag == "a":
            # HTML5 "a inside a" parse error: a new <a> start tag
            # implicitly closes any anchor still open.
            self._finish_anchor()
            href = next((v for k, v in attrs if k == "href" and v is not None), None)
            if href is not None:
                url = normalize_link(sanitize_url(href), self.base_url)
                if is_valid_url(url):
                    self.links.append(url)
                    self._anchor_buf = []
        elif tag == "meta" and self.meta_description is None:
            a = dict(attrs)
            if a.get("name") == "description" and a.get("content") is not None:
                self.meta_description = a["content"]
        elif (
            tag == "title"
            and not self._head_title_seen
            and self._stack
            and self._stack[-1] == "head"
        ):
            # First <title> directly under <head>: start collecting its
            # leading text run (the would-be first child node).
            self._head_title_seen = True
            self._title_run = []
        if tag not in _VOID:
            self._stack.append(tag)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)
        if tag == "a":  # self-closed anchor: empty text, close immediately
            self._finish_anchor()
        if tag not in _VOID and self._stack and self._stack[-1] == tag:
            self._stack.pop()

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        self._flush_title_run(ended=True)
        if tag in _SKIP_SUBTREES and self._skip_depth > 0:
            self._skip_depth -= 1
        # pop to the matching open tag, tolerating unclosed children;
        # popping an open <a> (its own end tag, or an outer close that
        # swallows it) finalizes the anchor-text run
        if tag in self._stack:
            while self._stack:
                popped = self._stack.pop()
                if popped == "a":
                    self._finish_anchor()
                if popped == tag:
                    break

    # -- text events -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self.cdata_elem in _RCDATA:
            # RCDATA: literal markup but charrefs decode (HTML5 rules)
            data = unescape(data)
        if self._title_run is not None:
            self._title_run.append(data)
        if self._anchor_buf is not None:
            self._anchor_buf.append(data)
        # buffer: contiguous character tokens form ONE text node
        self._pending.append(data)

    def _flush_text(self) -> None:
        """Close the current text node at a structural boundary."""
        if not self._pending:
            return
        run = "".join(self._pending)
        self._pending.clear()
        if run.strip():  # whitespace-only runs are GUMBO_NODE_WHITESPACE
            self.text_parts.append(run)

    # comments / declarations / PIs are their own DOM nodes: they split
    # adjacent text into separate text nodes, exactly like a tag would
    def handle_comment(self, data: str) -> None:
        self._flush_text()

    def handle_decl(self, decl: str) -> None:
        self._flush_text()

    def handle_pi(self, data: str) -> None:
        self._flush_text()

    def unknown_decl(self, data: str) -> None:
        self._flush_text()

    def _finish_anchor(self) -> None:
        """Close the open valid-href anchor: record its text run (which
        may be empty), keeping ``anchor_texts`` 1:1 with ``links``."""
        if self._anchor_buf is None:
            return
        self.anchor_texts.append("".join(self._anchor_buf))
        self._anchor_buf = None

    def _flush_title_run(self, ended: bool) -> None:
        """Finish the first-title text run at the first structural event."""
        if self._title_run is None or not ended:
            return
        run = "".join(self._title_run)
        self._title_run = None
        # A whitespace-only run is a WHITESPACE node -> no title.
        if run.strip():
            self.title = run

    def close(self) -> None:
        if self.cdata_elem is not None and self.rawdata:
            # HTML5: EOF inside RAWTEXT/RCDATA emits the pending
            # characters as text (html.parser would silently drop them
            # while waiting for the end tag — e.g. <plaintext>, whose
            # end tag never comes, or an unclosed <title>)
            data, self.rawdata = self.rawdata, ""
            if self._skip_depth == 0:
                self.handle_data(data)
        super().close()
        self._flush_text()
        self._flush_title_run(ended=True)
        self._finish_anchor()  # EOF inside an unclosed <a>

    def result(self) -> tuple[str | None, str | None, str, list[str]]:
        text = "".join(p + " " for p in self.text_parts)
        return self.title, self.meta_description, text, self.links


def extract_page(html: str, base_url: str = "", *, anchors: bool = False) -> dict:
    """Extract one page; scalar building block and unit-test surface.

    ``anchors=True`` additionally returns ``anchor_texts`` — the text
    run inside each valid-href ``<a>``, 1:1 aligned with ``links``
    (the anchor-text ranking signal; the reference stores only the
    per-page backlink count, SiteProfile.h:65)."""
    p = _PageExtractor(base_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Poison-pill rows must not fail the block: emit empty fields.
        out = {"title": None, "meta_description": None, "text": "", "links": []}
        if anchors:
            out["anchor_texts"] = []
        return out
    title, meta, text, links = p.result()
    out = {"title": title, "meta_description": meta, "text": text, "links": links}
    if anchors:
        out["anchor_texts"] = p.anchor_texts
    return out


class HtmlExtract:
    """``map_batches`` stage: pages(url, html) -> + title/meta_description/text/links.

    Use with ``batch_format="pyarrow"``; emits Arrow columns (links as
    ``list<string>``). One Gumbo-equivalent parse per page produces all
    four outputs (the reference parses the same HTML four times —
    ContentParser.cpp:18-51 — which we deliberately do not copy).

    ``anchors=True`` (pass via ``fn_constructor_kwargs``) adds an
    ``anchor_texts`` ``list<string>`` column aligned with ``links`` —
    opt-in so every existing consumer's schema is unchanged.
    """

    def __init__(self, anchors: bool = False):
        self.anchors = anchors

    def __call__(self, batch: pa.Table) -> pa.Table:
        # The pages input may carry a recorded ground-truth `text` column
        # (FIXTURES.md F1); the engine recomputes extraction itself —
        # replace any colliding columns.
        drop = [
            c
            for c in ("title", "meta_description", "text", "links", "anchor_texts")
            if c in batch.column_names
        ]
        if drop:
            batch = batch.drop_columns(drop)
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        titles: list[str | None] = []
        metas: list[str | None] = []
        texts: list[str] = []
        links: list[list[str]] = []
        anchor_texts: list[list[str]] = []
        for url, html in zip(urls, htmls):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            r = extract_page(html or "", url or "", anchors=self.anchors)
            titles.append(r["title"])
            metas.append(r["meta_description"])
            texts.append(r["text"])
            links.append(r["links"])
            if self.anchors:
                anchor_texts.append(r["anchor_texts"])
        out = (
            batch.append_column("title", pa.array(titles, pa.string()))
            .append_column("meta_description", pa.array(metas, pa.string()))
            .append_column("text", pa.array(texts, pa.string()))
            .append_column("links", pa.array(links, pa.list_(pa.string())))
        )
        if self.anchors:
            out = out.append_column(
                "anchor_texts", pa.array(anchor_texts, pa.list_(pa.string()))
            )
        return out
