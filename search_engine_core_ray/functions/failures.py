"""Failure classification + retry policy with reference semantics.

Reference: src/crawler/FailureClassifier.cpp. In a batch Ray pipeline,
network fetching is out of scope (the corpus is already-materialized
Parquet), but the classification/backoff policy is the data-plane
contract for row-level poison-pill handling and for pipelines that DO
fetch (the actor-pool HTTP stage a crawl integration would add):
classify the failure column -> decide retry -> compute backoff.

Semantics frozen (file:line):
- classify (:6-88): 429 -> RATE_LIMITED; permanent 4xx list (:153-185)
  -> PERMANENT; retryable HTTP set {408,429,5xx…} or any 5xx ->
  TEMPORARY; permanent curl errors (:187-209) -> PERMANENT; retryable
  curl set -> TEMPORARY; DNS-failure message substrings -> PERMANENT;
  timeout/connection/network substrings -> TEMPORARY; bad-argument /
  malformed-URL curl codes -> PERMANENT; else UNKNOWN.
- should_retry (:90-112): PERMANENT never; retry_count >= max never;
  TEMPORARY/RATE_LIMITED yes; UNKNOWN only below max/2.
- retry delay (:114-140): base * multiplier^(n-1), capped; rate-limited
  uses the 60 s rate-limit base. Defaults from CrawlConfig.h:29-52:
  base 1000 ms, multiplier 2.0, cap 30 000 ms, maxRetries 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class FailureType(Enum):
    TEMPORARY = "temporary"
    PERMANENT = "permanent"
    RATE_LIMITED = "rate_limited"
    UNKNOWN = "unknown"


PERMANENT_HTTP = frozenset(
    [400, 401, 403, 404, 405, 406, 407, 409, 410, 411, 412, 413, 414, 415,
     416, 417, 418, 421, 422, 423, 424, 426, 428, 431, 451]
)

# curl error numbers (CURLE_*) the reference treats as permanent
PERMANENT_CURL = frozenset([1, 2, 3, 4, 5, 6, 41, 42, 43, 45, 47, 48, 49, 50])
_CURL_BAD_ARG, _CURL_URL_MALFORMAT = 43, 3

DNS_ERROR_SUBSTRINGS = (
    "name or service not known",
    "no such host is known",
    "nodename nor servname provided",
)
TEMPORARY_SUBSTRINGS = ("timeout", "connection", "network")


@dataclass
class RetryConfig:
    max_retries: int = 3
    base_retry_delay_ms: int = 1000
    backoff_multiplier: float = 2.0
    max_retry_delay_ms: int = 30000
    rate_limit_delay_ms: int = 60000
    retryable_http_codes: frozenset = frozenset(
        [408, 429, 500, 502, 503, 504, 520, 521, 522, 523, 524]
    )
    retryable_curl_codes: frozenset = frozenset([7, 28, 35, 52, 55, 56])


def classify_failure(
    http_code: int = 0,
    curl_code: int = 0,
    error_message: str = "",
    config: RetryConfig | None = None,
) -> FailureType:
    config = config or RetryConfig()
    if http_code == 429:
        return FailureType.RATE_LIMITED
    if http_code > 0:
        if http_code in PERMANENT_HTTP:
            return FailureType.PERMANENT
        if http_code in config.retryable_http_codes:
            return FailureType.TEMPORARY
        if 500 <= http_code < 600:
            return FailureType.TEMPORARY
    if curl_code != 0:
        if curl_code in PERMANENT_CURL:
            return FailureType.PERMANENT
        if curl_code in config.retryable_curl_codes:
            return FailureType.TEMPORARY
    lower = error_message.lower()
    if any(s in lower for s in DNS_ERROR_SUBSTRINGS):
        return FailureType.PERMANENT
    if any(s in lower for s in TEMPORARY_SUBSTRINGS):
        return FailureType.TEMPORARY
    if curl_code in (_CURL_BAD_ARG, _CURL_URL_MALFORMAT):
        return FailureType.PERMANENT
    return FailureType.UNKNOWN


def should_retry(failure_type: FailureType, retry_count: int, max_retries: int = 3) -> bool:
    if failure_type == FailureType.PERMANENT:
        return False
    if retry_count >= max_retries:
        return False
    if failure_type in (FailureType.TEMPORARY, FailureType.RATE_LIMITED):
        return True
    if failure_type == FailureType.UNKNOWN:
        return retry_count < (max_retries // 2)
    return False


def retry_delay_ms(
    retry_count: int,
    config: RetryConfig | None = None,
    failure_type: FailureType = FailureType.TEMPORARY,
) -> int:
    config = config or RetryConfig()
    base = (
        config.rate_limit_delay_ms
        if failure_type == FailureType.RATE_LIMITED
        else config.base_retry_delay_ms
    )
    delay = int(base * (config.backoff_multiplier ** (retry_count - 1)))
    return min(delay, config.max_retry_delay_ms)
