from .textproc import (
    extract_terms,
    term_frequencies,
    count_words,
    extract_keywords,
    content_quality,
    utf8_len,
    STOPWORDS_40,
)
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
]
