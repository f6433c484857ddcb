from .parser import (
    ParseError,
    Term,
    Filter,
    And,
    Or,
    QueryParser,
    parse_query,
    to_redis_syntax,
)

__all__ = [
    "ParseError",
    "Term",
    "Filter",
    "And",
    "Or",
    "QueryParser",
    "parse_query",
    "to_redis_syntax",
]
