"""Adversarial HTML fixtures for stages/extract.py — messy real-web
input beyond the well-formed F1 generator subset: unclosed tags,
misnested inline elements, script/style payloads containing markup,
comments inside script, CDATA, entity edge cases, truncation, nulls,
deep nesting and table soup.

Goldens pinned from reviewed runs; each reflects the documented DFS
emission rule (every non-whitespace text node emits ``node + " "``,
script/style subtrees skipped) applied by a lenient tokenizer. Where
an HTML5 tree builder (Gumbo) could build a different TREE, the emitted
TEXT agrees on these cases: misnested formatting elements reconstruct
around the same text nodes, HTML treats CDATA as a bogus comment, and
unclosed RAWTEXT (<style>) swallows to EOF in both parsers.
"""

import pytest

from search_engine_core_ray.stages.extract import extract_page

URL = "https://ex.com/x"

CASES = {
    "unclosed_tags": (
        "<html><head><title>T</title></head><body><p>one<p>two<div>three</body></html>",
        {"title": "T", "text": "T one two three ", "links": []},
    ),
    "misnested_inline": (
        "<b>bold <i>both</b> italic?</i> after",
        {"title": None, "text": "bold  both  italic?  after ", "links": []},
    ),
    "script_with_lt": (
        "<body><script>if (a < b) { x = '<p>decoy</p>'; }</script><p>real</p></body>",
        {"title": None, "text": "real ", "links": []},
    ),
    "comment_in_script": (
        "<script><!-- var x = 1; --></script><p>visible</p>",
        {"title": None, "text": "visible ", "links": []},
    ),
    "cdata_block": (
        "<body><![CDATA[not really text]]><p>after cdata</p></body>",
        {"title": None, "text": "after cdata ", "links": []},
    ),
    "entities": (
        "<p>&amp; &lt;tag&gt; &#65; &unknown; &nbsp;x</p>",
        {"title": None, "text": "& <tag> A &unknown; \xa0x ", "links": []},
    ),
    "attr_quotes": (
        "<a href=/rel unquoted=yes><span>link text</span></a>",
        {"title": None, "text": "link text ", "links": ["https://ex.com/rel"]},
    ),
    "nested_title_not_page_title": (
        "<html><body><title>body title</title><p>text</p></body></html>",
        {"title": None, "text": "body title text ", "links": []},
    ),
    "meta_name_value_case_sensitive": (
        '<head><meta content="desc here" name="DESCRIPTION"><title>t</title></head>',
        {"title": "t", "text": "t ", "links": []},
    ),
    "truncated_mid_title": (
        "<html><head><title>Half",
        {"title": "Half", "text": "Half ", "links": []},
    ),
    "bare_text_no_tags": (
        "just text, no tags at all",
        {"title": None, "text": "just text, no tags at all ", "links": []},
    ),
    "style_unclosed_swallows_to_eof": (
        "<style>body { color: red }<p>styled away?</p>",
        {"title": None, "text": "", "links": []},
    ),
    "double_escaped_entity": (
        "<p>&amp;amp;</p>",
        {"title": None, "text": "&amp; ", "links": []},
    ),
    "empty": ("", {"title": None, "text": "", "links": []}),
    "unknown_namespaced_tags": (
        "<html xmlns:o='urn:x'><o:p>office para</o:p><p>normal</p></html>",
        {"title": None, "text": "office para normal ", "links": []},
    ),
    "null_bytes_preserved": (
        "<p>null\x00byte</p>",
        {"title": None, "text": "null\x00byte ", "links": []},
    ),
    "deep_nesting_60": (
        "<div>" * 60 + "deep" + "</div>" * 60,
        {"title": None, "text": "deep ", "links": []},
    ),
    "table_soup_implied_cells": (
        "<table><tr><td>cell1<td>cell2<tr><td>cell3</table>after",
        {"title": None, "text": "cell1 cell2 cell3 after ", "links": []},
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_adversarial_html(name):
    html, want = CASES[name]
    got = extract_page(html, URL)
    assert got["title"] == want["title"], name
    assert got["text"] == want["text"], name
    assert got["links"] == want["links"], name


def test_meta_description_cases():
    # the reference compares the name ATTRIBUTE VALUE case-sensitively
    # (nameAttr->value == "description", ContentParser.cpp:192-194), so
    # name="DESCRIPTION" does NOT match — frozen parity
    got = extract_page(
        '<head><meta content="desc here" name="DESCRIPTION"></head>', URL
    )
    assert got["meta_description"] is None
    # DFS-first wins when duplicated
    got = extract_page(
        '<head><meta name="description" content="first">'
        '<meta name="description" content="second"></head>', URL
    )
    assert got["meta_description"] == "first"


def test_huge_flat_document_does_not_blow_up():
    html = "<body>" + "".join(f"<p>para {i}</p>" for i in range(20000)) + "</body>"
    got = extract_page(html, URL)
    assert got["text"].count(" ") >= 40000
    assert got["text"].startswith("para 0 ")
