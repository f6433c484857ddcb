"""Tokenizer / keywords / scalar-function fixtures (FIXTURES.md F4,
ported from tests/scoring/test_search_scorer.cpp:276-292 and
src/storage/ContentStorage.cpp:27-79)."""

from search_engine_core_ray.functions.textproc import (
    content_quality,
    count_words,
    extract_keywords,
    extract_terms,
    jaccard_similarity,
    searchable_content,
    term_frequencies,
    utf8_len,
)


def test_extract_terms_fixture():
    assert extract_terms("Machine Learning is AWESOME!") == [
        "machine",
        "learning",
        "is",
        "awesome",
    ]


def test_extract_terms_drops_single_chars():
    assert extract_terms("a b cd e fg") == ["cd", "fg"]
    assert extract_terms("e-mail") == ["mail"]


def test_extract_terms_ascii_only():
    # non-ASCII bytes act as separators (C isalnum semantics)
    assert extract_terms("café données") == ["caf", "donn", "es"]


def test_extract_terms_alnum_runs():
    assert extract_terms("abc123 45x") == ["abc123", "45x"]


def test_term_frequencies_fixture():
    tf = term_frequencies("the quick brown fox jumps over the lazy dog")
    assert tf["the"] == 2
    assert tf["quick"] == 1
    assert tf["fox"] == 1
    assert len(tf) == 8


def test_count_words():
    assert count_words("hello world  foo\nbar") == 4
    assert count_words("") == 0
    assert count_words("   ") == 0


def test_utf8_len_bytes_not_chars():
    assert utf8_len("abc") == 3
    assert utf8_len("é") == 2  # std::string::length measures bytes


def test_content_quality():
    assert content_quality("") == 0.0
    assert content_quality("x" * 10000) == 1.0
    assert content_quality("x" * 5000) == 0.5
    assert content_quality("x" * 20000) == 1.0
    assert content_quality("text", success=False) == 0.0


def test_extract_keywords_stoplist_and_length():
    text = "the the the python python data data data science word"
    kws = extract_keywords(text)
    assert "the" not in kws           # stopword
    assert "word" in kws              # len 4 > 3
    assert kws[0] == "data"           # most frequent first
    assert "science" in kws and "python" in kws


def test_extract_keywords_punct_strip_and_top10():
    text = " ".join(f"word{i}" for i in range(15)) + " best, best! best."
    kws = extract_keywords(text)
    assert len(kws) == 10
    assert kws[0] == "best"  # punctuation stripped, counted 3 times


def test_jaccard_half():
    # test_search_scorer.cpp Jaccard == 0.5 case
    assert jaccard_similarity(["a1", "b1", "c1"], ["b1", "c1", "d1"]) == 0.5
    assert jaccard_similarity([], ["x1"]) == 0.0


def test_searchable_content_title_twice():
    s = searchable_content("T", "D", "body")
    assert s == "T T D body"  # title duplicated for weight
