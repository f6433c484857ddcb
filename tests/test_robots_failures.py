"""Robots.txt predicate + failure classification / backoff fixtures
(ported from tests/crawler/robots_txt_parser_tests.cpp:4-130 and the
FailureClassifier semantics, src/crawler/FailureClassifier.cpp)."""

import pyarrow as pa

from search_engine_core_ray.functions.failures import (
    FailureType,
    RetryConfig,
    classify_failure,
    retry_delay_ms,
    should_retry,
)
from search_engine_core_ray.functions.robots import (
    get_crawl_delay_ms,
    is_allowed,
    parse_robots_txt,
    robots_filter_batch,
)


def _rules(content):
    return {"example.com": parse_robots_txt(content)}


def test_simple_disallow_rules():
    r = _rules("""
        User-agent: *
        Disallow: /private/
        Disallow: /admin/
    """)
    assert not is_allowed(r, "https://example.com/private/page", "MyBot")
    assert not is_allowed(r, "https://example.com/admin/dashboard", "MyBot")
    assert is_allowed(r, "https://example.com/public/page", "MyBot")


def test_user_agent_specific_rules():
    r = _rules("""
        User-agent: MyBot
        Disallow: /mybot-private/

        User-agent: *
        Disallow: /private/
    """)
    assert not is_allowed(r, "https://example.com/mybot-private/page", "MyBot")
    # specific group exists: NO fallback to '*'
    assert is_allowed(r, "https://example.com/private/page", "MyBot")
    assert not is_allowed(r, "https://example.com/private/page", "OtherBot")


def test_allow_overrides_disallow():
    r = _rules("""
        User-agent: *
        Disallow: /private/
        Allow: /private/public/
    """)
    assert not is_allowed(r, "https://example.com/private/secret", "MyBot")
    assert is_allowed(r, "https://example.com/private/public/page", "MyBot")


def test_crawl_delay():
    r = _rules("""
        User-agent: MyBot
        Crawl-delay: 2

        User-agent: *
        Crawl-delay: 1
    """)
    assert get_crawl_delay_ms(r, "example.com", "MyBot") == 2000
    assert get_crawl_delay_ms(r, "example.com", "OtherBot") == 1000
    r2 = _rules("User-agent: *\nDisallow: /private/")
    assert get_crawl_delay_ms(r2, "example.com", "MyBot") == 1000
    assert get_crawl_delay_ms({}, "unknown.com") == 100


def test_wildcard_patterns():
    r = _rules("""
        User-agent: *
        Disallow: /*.pdf$
        Disallow: /images/*.jpg$
    """)
    assert not is_allowed(r, "https://example.com/document.pdf", "MyBot")
    assert not is_allowed(r, "https://example.com/images/photo.jpg", "MyBot")
    assert is_allowed(r, "https://example.com/document.doc", "MyBot")
    assert is_allowed(r, "https://example.com/images/photo.png", "MyBot")


def test_empty_robots_and_unknown_domain():
    r = _rules("")
    assert is_allowed(r, "https://example.com/any/path", "MyBot")
    assert is_allowed(r, "https://other.com/x", "MyBot")
    assert is_allowed(r, "no-protocol-url", "MyBot")


def test_query_string_ignored_in_path():
    r = _rules("User-agent: *\nDisallow: /private/")
    assert not is_allowed(r, "https://example.com/private/x?allow=/public/")


def test_robots_filter_batch():
    r = _rules("User-agent: *\nDisallow: /private/")
    batch = pa.table(
        {"url": ["https://example.com/ok", "https://example.com/private/no"]}
    )
    out = robots_filter_batch(batch, r)
    assert out.column("url").to_pylist() == ["https://example.com/ok"]


# ---- failure classification ------------------------------------------


def test_classify_rate_limited():
    assert classify_failure(http_code=429) == FailureType.RATE_LIMITED


def test_classify_permanent_http():
    for code in (400, 403, 404, 410, 451):
        assert classify_failure(http_code=code) == FailureType.PERMANENT


def test_classify_temporary_http():
    for code in (408, 500, 502, 503, 504, 521, 599):
        assert classify_failure(http_code=code) == FailureType.TEMPORARY


def test_classify_curl_and_messages():
    assert classify_failure(curl_code=6) == FailureType.PERMANENT  # resolve host
    assert classify_failure(curl_code=28) == FailureType.TEMPORARY  # timeout
    assert classify_failure(error_message="Name or service not known") == FailureType.PERMANENT
    assert classify_failure(error_message="Connection reset by peer") == FailureType.TEMPORARY
    assert classify_failure(error_message="weird thing") == FailureType.UNKNOWN


def test_should_retry_policy():
    assert not should_retry(FailureType.PERMANENT, 0)
    assert should_retry(FailureType.TEMPORARY, 0)
    assert should_retry(FailureType.TEMPORARY, 2)
    assert not should_retry(FailureType.TEMPORARY, 3)  # maxRetries 3
    assert should_retry(FailureType.RATE_LIMITED, 1)
    # UNKNOWN: only below max/2
    assert should_retry(FailureType.UNKNOWN, 0)
    assert not should_retry(FailureType.UNKNOWN, 1)


def test_retry_delay_exponential_capped():
    # base 1000ms x 2^(n-1), cap 30s (CrawlConfig.h:29-32)
    assert retry_delay_ms(1) == 1000
    assert retry_delay_ms(2) == 2000
    assert retry_delay_ms(3) == 4000
    assert retry_delay_ms(10) == 30000
    # rate-limited uses the 60s base, still capped
    assert retry_delay_ms(1, failure_type=FailureType.RATE_LIMITED) == 30000


def test_retry_delay_custom_config():
    cfg = RetryConfig(base_retry_delay_ms=500, backoff_multiplier=3.0, max_retry_delay_ms=10000)
    assert retry_delay_ms(1, cfg) == 500
    assert retry_delay_ms(2, cfg) == 1500
    assert retry_delay_ms(4, cfg) == 10000


def test_robots_decisions_entry_non_vacuous(ray_session):
    """The synthesized robots fixture must exercise all three outcomes:
    plain allow, prefix deny, and the allow-override beating a matching
    disallow (allow-before-disallow semantics)."""
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = QUERIES["robots_decisions"]("/root/testdata/sf0.001").to_pandas()
    out = out.set_index("url")
    assert set(out["allowed"].unique()) == {0, 1}
    # doc 17 (src17): path /doc/17 matches Disallow /doc/17 -> denied
    assert out.loc["https://src17.example.com/doc/17", "allowed"] == 0
    # doc 177 (src17): matches BOTH Allow /doc/177 and Disallow /doc/17
    # -> allow wins (checked before disallow)
    assert out.loc["https://src17.example.com/doc/177", "allowed"] == 1
    # doc 21 (src1): path /doc/21 does NOT start with /doc/1 -> allowed
    assert out.loc["https://src1.example.com/doc/21", "allowed"] == 1
    # crawl delays vary by domain (k%4+1 seconds)
    assert set(out["crawl_delay_ms"].unique()) == {1000, 2000, 3000, 4000}


def test_retry_policy_entry_covers_every_branch(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = QUERIES["retry_policy"]("/root/testdata/sf0.001").to_pandas()
    assert set(out["ftype"].unique()) == {
        "permanent", "temporary", "rate_limited", "unknown"
    }
    # permanent never retries; temp/RL retry below max; the boundary
    # retry_count >= 3 kills retries of every type
    assert (out.loc[out["ftype"] == "permanent", "retry"] == 0).all()
    assert (out.loc[out["retry_count"] >= 3, "retry"] == 0).all()
    tmp = out[(out["ftype"] == "temporary") & (out["retry_count"] < 3)]
    assert (tmp["retry"] == 1).all() and len(tmp) > 0
    # unknown only below max/2
    unk = out[out["ftype"] == "unknown"]
    assert ((unk["retry"] == 1) == (unk["retry_count"] < 1)).all()
    # backoff doubles then caps; rate-limited pinned at the 30 s cap
    assert set(out.loc[out["ftype"] != "rate_limited", "delay_ms"]) == {
        500, 1000, 2000, 4000, 8000
    }
    assert set(out.loc[out["ftype"] == "rate_limited", "delay_ms"]) == {30000}
