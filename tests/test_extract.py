"""HTML extraction fixtures (FIXTURES.md F2, ported from
tests/crawler/content_parser_tests.cpp:4-130) plus the byte-identical
round-trip invariant against the synthetic corpus generator."""

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.sources.pages import page_fields_for_doc
from search_engine_core_ray.stages.extract import HtmlExtract, extract_page


def test_title_extraction():
    r = extract_page("<html><head><title>Test Title</title></head><body></body></html>")
    assert r["title"] == "Test Title"


def test_no_title():
    r = extract_page("<html><head></head><body></body></html>")
    assert r["title"] is None


def test_title_must_be_in_head():
    r = extract_page("<html><head></head><body><title>Nope</title></body></html>")
    assert r["title"] is None


def test_meta_description():
    r = extract_page(
        '<html><head><meta name="description" content="Test Description">'
        "</head><body></body></html>"
    )
    assert r["meta_description"] == "Test Description"


def test_no_meta_description():
    r = extract_page("<html><head></head><body><p>x y</p></body></html>")
    assert r["meta_description"] is None


def test_text_extraction():
    r = extract_page("<html><body><p>Test paragraph</p></body></html>")
    assert "Test paragraph" in r["text"]


def test_script_style_skipped():
    r = extract_page(
        "<html><body><script>var x = 1;</script><p>Test paragraph</p>"
        "<style>body { color: red; }</style></body></html>"
    )
    assert "Test paragraph" in r["text"]
    assert "var x" not in r["text"]
    assert "color: red" not in r["text"]


def test_text_node_emission_rule():
    # DFS order; each non-whitespace text node emits node_text + " "
    r = extract_page("<html><body><h1>A</h1>\n  <p>B <b>C</b></p></body></html>")
    assert r["text"] == "A B  C "


def test_title_text_included_in_text():
    r = extract_page("<html><head><title>T</title></head><body><p>B</p></body></html>")
    assert r["text"] == "T B "


def test_links_normalized_and_validated():
    html = (
        '<html><body><a href="https://example.com">a</a>'
        '<a href="/path">b</a><a href="//example.com">c</a>'
        '<a href="not a url at all">d</a></body></html>'
    )
    r = extract_page(html, "https://base.com")
    assert r["links"] == [
        "https://example.com",
        "https://base.com/path",
        "https://example.com",
    ]


def test_persian_text_roundtrip():
    r = extract_page("<html><body><p>جستجو موتور</p></body></html>")
    assert r["text"] == "جستجو موتور "


def test_synth_corpus_roundtrip_byte_identical():
    t = synth_pages_table(SynthConfig(n_docs=150, seed=7))
    for i in range(t.num_rows):
        html = t.column("html")[i].as_py().decode()
        expected = t.column("text")[i].as_py()
        got = extract_page(html, t.column("url")[i].as_py())
        assert got["text"] == expected, t.column("url")[i].as_py()


def test_document_wrapper_roundtrip():
    f = page_fields_for_doc(42, "src9", "hello world data table")
    r = extract_page(f["html"].decode(), f["url"])
    assert r["text"] == f["text"]
    assert r["title"] == "Doc 42 src9"
    assert r["meta_description"] == f["description"]


def test_batch_stage_matches_scalar():
    import pyarrow as pa

    t = synth_pages_table(SynthConfig(n_docs=30, seed=3))
    out = HtmlExtract()(t)
    for i in range(t.num_rows):
        assert out.column("text")[i].as_py() == t.column("text")[i].as_py()
