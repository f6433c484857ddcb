"""URL fixtures (FIXTURES.md F3, from tests/crawler/url_frontier_tests.cpp
and src/common/UrlSanitizer.cpp / src/crawler/URLFrontier.cpp:398-432)."""

from search_engine_core_ray.functions.urls import (
    doc_id_for_url,
    extract_domain,
    is_valid_url,
    normalize_link,
    normalize_url,
    sanitize_url,
)


def test_normalize_collapses_variants():
    urls = [
        "https://example.com/page1",
        "https://example.com/page1/",
        "https://example.com/page1#section",
        "HTTPS://example.com/page1",
    ]
    assert len({normalize_url(u) for u in urls}) == 1


def test_normalize_distinct_schemes_and_hosts():
    urls = ["http://example.com", "https://example.com", "www.example.com"]
    assert len({normalize_url(u) for u in urls}) == 3


def test_root_trailing_slash_kept():
    assert normalize_url("https://example.com/") == "https://example.com/"
    assert normalize_url("https://example.com/path/") == "https://example.com/path"


def test_extract_domain_strips_port():
    assert extract_domain("https://example.com:8080/page1") == "example.com"
    assert extract_domain("http://sub.example.com/x") == "sub.example.com"
    assert extract_domain("not a url") == ""


def test_sanitize_drops_zero_width_and_controls():
    assert sanitize_url("  https://ex.com/a​‮﻿b\x01 ") == "https://ex.com/ab"


def test_valid_urls():
    assert is_valid_url("https://example.com")
    assert is_valid_url("http://sub.example.com/path")
    assert is_valid_url("https://example.com:8080/path?query=value")
    assert not is_valid_url("not-a-url")
    assert not is_valid_url("ftp://example.com")
    assert not is_valid_url("https://")


def test_link_normalization():
    base = "https://base.com/dir/page.html"
    assert normalize_link("https://x.com/a", base) == "https://x.com/a"
    assert normalize_link("//cdn.com/a", base) == "https://cdn.com/a"
    assert normalize_link("/abs", base) == "https://base.com/abs"
    assert normalize_link("rel.html", base) == "https://base.com/dir/rel.html"


def test_doc_id_deterministic_and_positive():
    a = doc_id_for_url("https://example.com/page1")
    assert a == doc_id_for_url("https://example.com/page1")
    assert a > 0
    assert a != doc_id_for_url("https://example.com/page2")
