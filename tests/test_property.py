"""Property-based robustness (hypothesis): codec round-trips, URL
normalization idempotence, parser totality (parses or raises ParseError,
never crashes), analyzer consistency, extractor crash-safety."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_core_ray.functions.analyzers import analyze, stem_token
from search_engine_core_ray.functions.textproc import extract_terms
from search_engine_core_ray.functions.urls import normalize_url, sanitize_url
from search_engine_core_ray.index.codec import (
    delta_decode,
    delta_encode_sorted,
    encode_group_sliced,
    varbyte_decode,
    varbyte_encode,
)
from search_engine_core_ray.query.parser import ParseError, QueryParser
from search_engine_core_ray.stages.extract import extract_page


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=(1 << 62)), max_size=200))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.asarray(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode_sorted(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=0, max_size=120),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_sliced_encode_matches_slices(values, data):
    arr = np.asarray(values, dtype=np.uint64)
    n_runs = data.draw(st.integers(min_value=1, max_value=6))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(arr)),
                min_size=n_runs - 1,
                max_size=n_runs - 1,
            )
        )
    )
    bounds = np.asarray([0] + cuts, dtype=np.int64)
    cells = encode_group_sliced(arr, bounds)
    edges = list(bounds[1:]) + [len(arr)]
    start = 0
    for cell, end in zip(cells, edges):
        assert np.array_equal(varbyte_decode(cell.as_py()), arr[start:end])
        start = end


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_url_converges(url):
    """The reference's sanitize is NOT idempotent on adversarial input
    (a trailing control char shields whitespace from the end-trim —
    UrlSanitizer.cpp trims first, drops controls second; hypothesis
    found '0 \\x1f'). One pass removes every control char, so the
    second pass is a pure trim and a fixed point: f^2 == f^3."""
    twice = normalize_url(normalize_url(url))
    assert normalize_url(twice) == twice
    s2 = sanitize_url(sanitize_url(url))
    assert sanitize_url(s2) == s2
    # and on control-free input a single pass IS idempotent
    clean = "".join(ch for ch in url if ord(ch) >= 0x20 and ord(ch) != 0x7F)
    assert normalize_url(normalize_url(clean)) == normalize_url(clean)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_parser_total(q):
    p = QueryParser()
    try:
        ast = p.parse(q)
        # serialization never crashes on a successful parse
        assert isinstance(p.to_redis_syntax(ast), str)
    except ParseError:
        pass


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_tokenizer_invariants(text):
    toks = extract_terms(text)
    for t in toks:
        assert len(t) >= 2
        assert t == t.lower()
        assert all(c.isascii() and c.isalnum() for c in t)
    # analyzer postconditions: stemming never lengthens nor empties
    for t in toks:
        s = stem_token(t)
        assert 1 <= len(s) <= len(t)
    assert analyze(text, "default") == toks


@given(st.text(max_size=500))
@settings(max_examples=150, deadline=None)
def test_extract_page_never_raises(html):
    r = extract_page(html, "https://base.example/x")
    assert isinstance(r["text"], str)
    assert isinstance(r["links"], list)
