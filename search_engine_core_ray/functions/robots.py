"""robots.txt parsing + allow/deny predicate with reference semantics.

Reference: src/crawler/RobotsTxtParser.cpp. Used in a Ray pipeline as a
broadcast-dict filter: parse all robots files into a {domain:
DomainRules} dict on the driver, ``ray.put`` it once, and evaluate
``is_allowed`` inside ``map_batches`` (SURVEY.md §2.3) — the per-domain
rules dict is the small side of a broadcast semi-join.

Semantics frozen (file:line):
- parse (:15-62): line-by-line; '#'-comments and blanks skipped; lines
  lowercased; ``user-agent:`` switches the current rule group (default
  '*'); ``disallow:``/``allow:`` glob patterns (* -> .*, ? -> .)
  anchored at the start (PREFIX match via regex search with leading ^);
  empty disallow ignored; ``crawl-delay:`` seconds (float) -> ms.
- is_allowed (:77-156): no protocol -> allowed; unknown domain ->
  allowed; SPECIFIC user-agent rules take total precedence (allow
  checked before disallow; no fallback to '*' when a specific group
  exists); else default rules, allow-before-disallow; no match ->
  allowed. Path = URL path without query string (:64-75).
- get_crawl_delay (:158-193): unknown domain -> 100 ms; specific UA
  group's delay else default group's (1000 ms initial).
"""

from __future__ import annotations

import re
import string
from dataclasses import dataclass, field

_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)


@dataclass
class RobotsRule:
    allow: list = field(default_factory=list)      # compiled regexes
    disallow: list = field(default_factory=list)
    crawl_delay_ms: int = 1000


@dataclass
class DomainRules:
    default: RobotsRule = field(default_factory=RobotsRule)
    user_agents: dict = field(default_factory=dict)


def _glob_to_regex(pattern: str) -> re.Pattern:
    rx = "^" + pattern.replace("*", ".*")
    rx = rx.replace("?", ".")
    return re.compile(rx)


def parse_robots_txt(content: str) -> DomainRules:
    rules = DomainRules()
    current_ua = "*"
    for line in content.splitlines():
        if not line or line[0] == "#":
            continue
        line = line.strip(" \t\r\n")
        if not line:
            continue
        line = line.translate(_ASCII_LOWER)
        if line.startswith("user-agent:"):
            current_ua = line[11:].strip(" \t")
            continue
        rule = (
            rules.default
            if current_ua == "*"
            else rules.user_agents.setdefault(current_ua, RobotsRule())
        )
        if line.startswith("disallow:"):
            pattern = line[9:].strip(" \t")
            if pattern:
                rule.disallow.append(_glob_to_regex(pattern))
        elif line.startswith("allow:"):
            pattern = line[6:].strip(" \t")
            if pattern:
                rule.allow.append(_glob_to_regex(pattern))
        elif line.startswith("crawl-delay:"):
            delay = line[12:].strip(" \t")
            try:
                rule.crawl_delay_ms = int(float(delay) * 1000)
            except ValueError:
                pass
    return rules


def _extract_path(url: str) -> str:
    proto = url.find("://")
    if proto == -1:
        return "/"
    path_start = url.find("/", proto + 3)
    if path_start == -1:
        return "/"
    q = url.find("?", path_start)
    return url[path_start:] if q == -1 else url[path_start:q]


def _matches(path: str, patterns: list) -> bool:
    return any(p.search(path) for p in patterns)


def is_allowed(domain_rules: dict[str, DomainRules], url: str, user_agent: str = "*") -> bool:
    proto = url.find("://")
    if proto == -1:
        return True
    domain_start = proto + 3
    domain_end = url.find("/", domain_start)
    domain = url[domain_start:] if domain_end == -1 else url[domain_start:domain_end]
    rules = domain_rules.get(domain)
    if rules is None:
        return True
    path = _extract_path(url)
    ua = user_agent.translate(_ASCII_LOWER)
    specific = rules.user_agents.get(ua)
    if specific is not None:
        if _matches(path, specific.allow):
            return True
        if _matches(path, specific.disallow):
            return False
        return True  # specific group present: never falls back to '*'
    default = rules.default
    if _matches(path, default.allow):
        return True
    if _matches(path, default.disallow):
        return False
    return True


def get_crawl_delay_ms(domain_rules: dict[str, DomainRules], domain: str, user_agent: str = "*") -> int:
    rules = domain_rules.get(domain)
    if rules is None:
        return 100
    ua = user_agent.translate(_ASCII_LOWER)
    specific = rules.user_agents.get(ua)
    if specific is not None:
        return specific.crawl_delay_ms
    return rules.default.crawl_delay_ms


def robots_filter_batch(batch, domain_rules: dict[str, DomainRules], user_agent: str = "*"):
    """pyarrow map_batches kernel: keep pages whose url is allowed."""
    import pyarrow as pa

    urls = batch.column("url").to_pylist()
    mask = pa.array([is_allowed(domain_rules, u or "", user_agent) for u in urls])
    return batch.filter(mask)
