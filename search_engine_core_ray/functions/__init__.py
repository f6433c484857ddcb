from .textproc import (
    extract_terms,
    term_frequencies,
    count_words,
    extract_keywords,
    content_quality,
    utf8_len,
    STOPWORDS_40,
)
from .analyzers import analyze, stem_token, ANALYZERS
from .failures import FailureType, classify_failure, retry_delay_ms, should_retry
from .robots import is_allowed, parse_robots_txt, get_crawl_delay_ms
from .urls import (
    sanitize_url,
    normalize_url,
    normalize_link,
    extract_domain,
    is_valid_url,
    doc_id_for_url,
)

__all__ = [
    "extract_terms",
    "term_frequencies",
    "count_words",
    "extract_keywords",
    "content_quality",
    "utf8_len",
    "STOPWORDS_40",
    "sanitize_url",
    "normalize_url",
    "normalize_link",
    "extract_domain",
    "is_valid_url",
    "doc_id_for_url",
    "analyze",
    "stem_token",
    "ANALYZERS",
    "FailureType",
    "classify_failure",
    "retry_delay_ms",
    "should_retry",
    "is_allowed",
    "parse_robots_txt",
    "get_crawl_delay_ms",
]
