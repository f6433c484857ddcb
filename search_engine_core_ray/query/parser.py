"""Query parser: query string -> And/Or/Term/Filter AST.

Reproduces the reference parser exactly (src/search_core/QueryParser.cpp):

- lexer (:28-144): whitespace-separated words; ``"..."`` quoted phrases
  (verbatim value, exact=True); ``field:value`` filters with ``site:``
  aliased to ``domain`` and the edge cases ``:v``->word v, ``f:``->word f;
  bare words normalized by keeping only ``[a-z0-9|:-]`` after ASCII
  lowercasing; ``AND``/``and`` and ``OR``/``or``/``|`` operators
  (case-insensitive).
- parser (:146-254): left-assoc n-ary And/Or; adjacency = implicit AND;
  errors on empty query, unmatched quote, dangling operators.
- serialization (:259-286): Term->value or "value"; Filter->@field:{value};
  And->space-join; Or->'|'-join. Kept for test parity with
  tests/search_core/TestQueryParser.cpp.
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field

_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)
_KEEP = frozenset(string.ascii_lowercase + string.digits + "-|:")
_WS = " \t\n\r\v\f"


class ParseError(ValueError):
    pass


@dataclass
class Term:
    value: str
    exact: bool = False

    def to_redis(self) -> str:
        return f'"{self.value}"' if self.exact else self.value


@dataclass
class Filter:
    field: str
    value: str

    def to_redis(self) -> str:
        return "@" + self.field + ":{" + self.value + "}"


@dataclass
class And:
    children: list = field(default_factory=list)

    def to_redis(self) -> str:
        return " ".join(c.to_redis() for c in self.children)


@dataclass
class Or:
    children: list = field(default_factory=list)

    def to_redis(self) -> str:
        return "|".join(c.to_redis() for c in self.children)


# token kinds
_WORD, _QUOTED, _AND, _OR, _FILTER, _EOF = range(6)


def _normalize(text: str) -> str:
    out = []
    for ch in text.translate(_ASCII_LOWER):
        if ch in _KEEP:
            out.append(ch)
    return "".join(out)


class _Lexer:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def next(self) -> tuple[int, str, str]:
        s, n = self.s, len(self.s)
        while self.pos < n and s[self.pos] in _WS:
            self.pos += 1
        if self.pos >= n:
            return (_EOF, "", "")
        if s[self.pos] == '"':
            self.pos += 1
            start = self.pos
            while self.pos < n and s[self.pos] != '"':
                self.pos += 1
            if self.pos >= n:
                raise ParseError("Unmatched quote in query")
            value = s[start : self.pos]
            self.pos += 1
            return (_QUOTED, value, "")
        start = self.pos
        while self.pos < n and s[self.pos] not in _WS and s[self.pos] != '"':
            self.pos += 1
        word = s[start : self.pos]
        if not word:
            raise ParseError(f"Unexpected character at position {self.pos}")
        colon = word.find(":")
        if colon != -1:
            if colon == 0:
                return (_WORD, _normalize(word[1:]), "")
            if colon == len(word) - 1:
                return (_WORD, _normalize(word[:-1]), "")
            fld, value = word[:colon], word[colon + 1 :]
            if fld == "site":
                fld = "domain"
            return (_FILTER, value, fld)
        lower = word.translate(_ASCII_LOWER)
        if lower == "and":
            return (_AND, "AND", "")
        if lower in ("or", "|"):
            return (_OR, "OR", "")
        return (_WORD, _normalize(word), "")

    def peek(self) -> tuple[int, str, str]:
        saved = self.pos
        tok = self.next()
        self.pos = saved
        return tok


class _Parser:
    def __init__(self, s: str):
        self.lexer = _Lexer(s)

    def parse(self):
        result = self._expression()
        kind, value, _ = self.lexer.next()
        if kind != _EOF:
            raise ParseError("Unexpected token: " + value)
        if result is None:
            raise ParseError("Empty query")
        return result

    def _expression(self):
        left = self._term()
        if left is None:
            return None
        while True:
            kind, _, _ = self.lexer.peek()
            if kind == _OR:
                self.lexer.next()
                right = self._term()
                if right is None:
                    raise ParseError("Expected term after OR")
                if isinstance(left, Or):
                    left.children.append(right)
                else:
                    left = Or([left, right])
            elif kind == _AND:
                self.lexer.next()
                right = self._term()
                if right is None:
                    raise ParseError("Expected term after AND")
                if isinstance(left, And):
                    left.children.append(right)
                else:
                    left = And([left, right])
            elif kind in (_WORD, _QUOTED, _FILTER):
                right = self._term()
                if right is None:
                    break
                if isinstance(left, And):
                    left.children.append(right)
                else:
                    left = And([left, right])
            else:
                break
        return left

    def _term(self):
        kind, value, fld = self.lexer.peek()
        if kind == _WORD:
            self.lexer.next()
            return Term(value, False)
        if kind == _QUOTED:
            self.lexer.next()
            return Term(value, True)
        if kind == _FILTER:
            self.lexer.next()
            return Filter(fld, value)
        return None


class QueryParser:
    """Facade mirroring hatef::search::QueryParser (parse / toRedisSyntax)."""

    def parse(self, q: str):
        stripped = q.strip(" \t\n\r")
        if not stripped:
            raise ParseError("Empty query")
        return _Parser(stripped).parse()

    def to_redis_syntax(self, ast) -> str:
        return ast.to_redis()

    def to_redis(self, q: str) -> str:
        return self.parse(q).to_redis()


def parse_query(q: str):
    return QueryParser().parse(q)


def to_redis_syntax(q: str) -> str:
    return QueryParser().to_redis(q)
