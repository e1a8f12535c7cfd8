"""CQL2-text → Catalyst Column compiler (SURVEY.md §3.3).

The reference's query side is stac-fastapi, which accepts CQL2 property
filters and hands them to pgstac for SQL evaluation
(docker-compose.yml:2-28). This module is the engine's equivalent: a
compact recursive-descent parser for the CQL2 text subset the STAC API
actually sees — comparisons, BETWEEN / IN / IS NULL / LIKE, AND/OR/NOT,
parentheses, TIMESTAMP('...') literals — compiled straight to a Column
expression, so a filter string pushes down and prunes exactly like a
hand-written predicate.

Grammar (standard precedence NOT > AND > OR):
  expr       := or_expr
  or_expr    := and_expr (OR and_expr)*
  and_expr   := unary (AND unary)*
  unary      := NOT unary | '(' expr ')' | predicate
  predicate  := operand (cmp operand | BETWEEN operand AND operand
                | [NOT] IN '(' operand (',' operand)* ')'
                | IS [NOT] NULL | [NOT] LIKE operand)
  operand    := number | string | TIMESTAMP '(' string ')'
                | true | false | identifier
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><>|<=|>=|=|<|>)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "IS", "NULL", "LIKE",
             "TRUE", "FALSE", "TIMESTAMP"}


class CQLError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise CQLError(f"bad token at: {text[pos:pos + 20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "word" and val.upper() in _KEYWORDS:
            out.append((val.upper(), val))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str:
        return self.toks[self.i][0]

    def next(self, expect: str | None = None) -> str:
        kind, val = self.toks[self.i]
        if expect is not None and kind != expect:
            raise CQLError(f"expected {expect}, got {val!r}")
        self.i += 1
        return val

    # -- operands ----------------------------------------------------------
    def operand(self) -> Column:
        k = self.peek()
        if k == "num":
            v = self.next()
            return F.lit(float(v) if "." in v else int(v))
        if k == "str":
            return F.lit(self.next()[1:-1].replace("''", "'"))
        if k == "TIMESTAMP":
            self.next()
            self.next("lp")
            s = self.next("str")[1:-1]
            self.next("rp")
            return F.lit(s).cast("timestamp")
        if k == "TRUE":
            self.next()
            return F.lit(True)
        if k == "FALSE":
            self.next()
            return F.lit(False)
        if k == "word":
            return F.col(self.next())
        raise CQLError(f"expected operand, got {self.toks[self.i][1]!r}")

    # -- predicates --------------------------------------------------------
    def predicate(self) -> Column:
        left = self.operand()
        k = self.peek()
        negate = False
        if k == "NOT":
            self.next()
            k = self.peek()
            negate = True
        if k == "op":
            op = self.next()
            right = self.operand()
            col = {
                "=": left == right, "<>": left != right,
                "<": left < right, ">": left > right,
                "<=": left <= right, ">=": left >= right,
            }[op]
        elif k == "BETWEEN":
            self.next()
            lo = self.operand()
            self.next("AND")
            hi = self.operand()
            col = (left >= lo) & (left <= hi)
        elif k == "IN":
            self.next()
            self.next("lp")
            vals = [self.operand()]
            while self.peek() == "comma":
                self.next()
                vals.append(self.operand())
            self.next("rp")
            col = left.isin(*[v for v in vals])
        elif k == "IS":
            self.next()
            if self.peek() == "NOT":
                self.next()
                negate = not negate
            self.next("NULL")
            col = left.isNull()
        elif k == "LIKE":
            self.next()
            pat = self.next("str")[1:-1].replace("''", "'")
            col = left.like(pat)
        else:
            raise CQLError(f"expected comparison, got {self.toks[self.i][1]!r}")
        return ~col if negate else col

    # -- boolean structure -------------------------------------------------
    #: Max boolean-nesting depth. A recursive-descent parser's stack
    #: tracks input nesting, so unbounded '(((…' or 'NOT NOT …' from a
    #: hostile/garbage filter would escape as RecursionError — an
    #: uncontrolled crash class for a user-facing query compiler. Any
    #: legitimate catalog filter is orders of magnitude shallower.
    MAX_DEPTH = 200

    def unary(self, depth: int = 0) -> Column:
        if depth > self.MAX_DEPTH:
            raise CQLError(
                f"filter nesting deeper than {self.MAX_DEPTH} levels"
            )
        if self.peek() == "NOT":
            self.next()
            return ~self.unary(depth + 1)
        if self.peek() == "lp":
            self.next()
            c = self.or_expr(depth + 1)
            self.next("rp")
            return c
        return self.predicate()

    def and_expr(self, depth: int = 0) -> Column:
        c = self.unary(depth)
        while self.peek() == "AND":
            self.next()
            c = c & self.unary(depth)
        return c

    def or_expr(self, depth: int = 0) -> Column:
        c = self.and_expr(depth)
        while self.peek() == "OR":
            self.next()
            c = c | self.and_expr(depth)
        return c

    def parse(self) -> Column:
        c = self.or_expr()
        if self.peek() != "eof":
            raise CQLError(f"trailing input: {self.toks[self.i][1]!r}")
        return c


def compile_cql(text: str) -> Column:
    """CQL2 text → Column predicate (feed to catalog_search(filter=…))."""
    return _Parser(_tokenize(text)).parse()
