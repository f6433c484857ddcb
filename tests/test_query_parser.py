"""Query parser parity suite (ported from
tests/search_core/TestQueryParser.cpp:7-165 — exact expected strings)."""

import pytest

from search_engine_core_ray.query.parser import ParseError, QueryParser

p = QueryParser()


@pytest.mark.parametrize("q", ["apple", "banana", "search"])
def test_simple_word(q):
    assert p.to_redis(q) == q


def test_implicit_and():
    assert p.to_redis("apple banana") == "apple banana"


def test_exact_phrase():
    assert p.to_redis('"apple pie"') == '"apple pie"'


@pytest.mark.parametrize("q", ["", "   ", "\t\n"])
def test_empty_query_throws(q):
    with pytest.raises(ParseError):
        p.to_redis(q)


def test_explicit_and():
    assert p.to_redis("apple AND banana") == "apple banana"


@pytest.mark.parametrize("q", ["apple OR banana", "apple or banana"])
def test_or_operator(q):
    assert p.to_redis(q) == "apple|banana"


def test_mixed_operators():
    assert p.to_redis("apple AND banana OR cherry") == "apple banana|cherry"


def test_multiple_ors():
    assert p.to_redis("apple OR banana OR cherry") == "apple|banana|cherry"


def test_site_filter():
    assert p.to_redis("site:example.com") == "@domain:{example.com}"


def test_site_filter_with_search():
    assert p.to_redis("site:example.com apple") == "@domain:{example.com} apple"


@pytest.mark.parametrize("field", ["title", "body", "author"])
def test_generic_field_filter(field):
    assert p.to_redis(f"{field}:test") == "@" + field + ":{test}"


def test_multiple_filters():
    assert (
        p.to_redis("site:example.com title:launch")
        == "@domain:{example.com} @title:{launch}"
    )


def test_lowercase():
    assert p.to_redis("ApPlE") == "apple"


@pytest.mark.parametrize("q", ["apple,", "apple!", "apple.", "apple;"])
def test_punctuation_stripped(q):
    assert p.to_redis(q) == "apple"


def test_hyphen_preserved():
    assert p.to_redis("e-mail") == "e-mail"


@pytest.mark.parametrize("q", ["café", "résumé", "naïve"])
def test_unicode_nonempty(q):
    assert p.to_redis(q) != ""


def test_unmatched_quotes():
    with pytest.raises(ParseError):
        p.to_redis('"unclosed')
    with pytest.raises(ParseError):
        p.to_redis('unclosed"')


@pytest.mark.parametrize("q", ["OR", "AND", "apple OR", "AND apple"])
def test_stray_operators(q):
    with pytest.raises(ParseError):
        p.to_redis(q)


def test_edge_filters():
    assert p.to_redis(":value") == "value"
    assert p.to_redis("field:") == "field"


def test_combined_features():
    r = p.to_redis('site:example.com "apple pie" OR banana recipe')
    assert "@domain:{example.com}" in r
    assert '"apple pie"' in r
    assert "|" in r


def test_multiple_sites():
    assert (
        p.to_redis("site:example.com site:test.org apple")
        == "@domain:{example.com} @domain:{test.org} apple"
    )
