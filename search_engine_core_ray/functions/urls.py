"""URL sanitization / normalization / validation with reference semantics.

Reference locations are cited per function (files under /root/reference).
"""

from __future__ import annotations

import hashlib
import re
import string

_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

# Zero-width / formatting / bidi codepoints dropped by sanitizeUrl.
# Reference: src/common/UrlSanitizer.cpp:60-66.
_DROP_CODEPOINTS = frozenset(
    [0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x200E, 0x200F,
     0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
     0x2066, 0x2067, 0x2068, 0x2069]
)

_ASCII_WS = " \t\r\n"

# Validation regex. Reference: ContentParser::isValidUrl,
# src/crawler/ContentParser.cpp:245-251 (ECMAScript, icase).
_VALID_URL_RE = re.compile(
    r"^(https?:\/\/)[^\s\/:?#]+(\.[^\s\/:?#]+)*(?::\d+)?(\/[^\s?#]*)?(\?[^\s#]*)?(#[^\s]*)?$",
    re.IGNORECASE,
)

# Domain extraction. Reference: URLFrontier::extractDomain,
# src/crawler/URLFrontier.cpp:322-332 — regex https?://([^/:]+).
_DOMAIN_RE = re.compile(r"https?://([^/:]+)")


def sanitize_url(url: str) -> str:
    """Trim ASCII whitespace, drop ASCII control chars and zero-width/bidi
    formatting codepoints; all other bytes pass through unchanged.

    Reference: sanitizeUrl, src/common/UrlSanitizer.cpp:11-76.
    """
    if not url:
        return url
    s = url.strip(_ASCII_WS)
    out: list[str] = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or cp == 0x7F:
            continue
        if cp in _DROP_CODEPOINTS:
            continue
        out.append(ch)
    return "".join(out)


def normalize_url(url: str) -> str:
    """Frontier-style canonical URL: sanitize, ASCII-lowercase, strip
    ``#fragment``, strip trailing slash unless the URL is a bare root.

    Reference: URLFrontier::normalizeURL, src/crawler/URLFrontier.cpp:398-432.
    This is the dedup / doc-identity key.
    """
    normalized = sanitize_url(url)
    normalized = normalized.translate(_ASCII_LOWER)
    hash_pos = normalized.find("#")
    if hash_pos != -1:
        normalized = normalized[:hash_pos]
    if normalized.endswith("/"):
        proto_end = normalized.find("://")
        if proto_end != -1:
            domain_end = normalized.find("/", proto_end + 3)
            if domain_end == len(normalized) - 1:
                pass  # bare root keeps its trailing slash
            else:
                normalized = normalized[:-1]
        else:
            normalized = normalized[:-1]
    return normalized


def normalize_link(href: str, base_url: str) -> str:
    """Resolve a link against its page URL the way the reference does.

    Reference: ContentParser::normalizeUrl, src/crawler/ContentParser.cpp:209-243.
    Absolute http(s) passes through; ``//x`` gets ``https:``; ``/p`` joins
    the base URL's scheme+authority; anything else joins the base
    directory.
    """
    if not href:
        return ""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("//"):
        return "https:" + href
    if href.startswith("/"):
        proto_end = base_url.find("://")
        if proto_end != -1:
            domain_end = base_url.find("/", proto_end + 3)
            if domain_end != -1:
                return base_url[:domain_end] + href
        return base_url + href
    last_slash = base_url.rfind("/")
    if last_slash != -1:
        return base_url[: last_slash + 1] + href
    return base_url + "/" + href


def is_valid_url(url: str) -> bool:
    """Reference: ContentParser::isValidUrl, src/crawler/ContentParser.cpp:245-251."""
    return _VALID_URL_RE.match(url) is not None


def extract_domain(url: str) -> str:
    """Host part of an http(s) URL (port stripped).

    Reference: URLFrontier::extractDomain, src/crawler/URLFrontier.cpp:322-332.
    """
    m = _DOMAIN_RE.search(url)
    return m.group(1) if m else ""


def doc_id_for_url(url: str) -> int:
    """Stable 63-bit document id for a normalized URL.

    The reference keys index docs by ``std::hash(url)``
    (src/storage/RedisSearchStorage.cpp:23-26). std::hash is not portable,
    so we use blake2b-64 of the UTF-8 bytes, masked positive so the id
    round-trips through every int64 system (Arrow, DuckDB). Deterministic
    across processes and runs — required for resumable builds.
    """
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF
