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
  predicate  := spatial_pred | temporal_pred
              | operand (cmp operand | BETWEEN operand AND operand
                | [NOT] IN '(' operand (',' operand)* ')'
                | IS [NOT] NULL | [NOT] LIKE operand)
  operand    := number | string | TIMESTAMP '(' string ')'
                | DATE '(' string ')' | CASEI '(' operand ')'
                | true | false | identifier

Spatial / temporal operators (the pgstac surface the reference's query
side evaluates, docker-compose.yml:30-44):
  spatial_pred  := S_INTERSECTS '(' identifier ',' geom ')'
  geom          := BBOX '(' num ',' num ',' num ',' num ')'
                 | POINT '(' num num ')'
                 | POLYGON '(' '(' num num (',' num num)* ')' ')'
  temporal_pred := (T_INTERSECTS|ANYINTERACTS|T_BEFORE|T_AFTER)
                   '(' identifier ',' interval_or_instant ')'
  interval_or_instant := INTERVAL '(' str ',' str ')'   -- '..' = open
                       | TIMESTAMP '(' str ')' | DATE '(' str ')'

The engine stores footprints as bbox corner columns (not full
geometries — SURVEY §2.9 G3), so S_INTERSECTS compiles to the G3
interval-overlap arithmetic against the query geometry's ENVELOPE, and
the temporal operators compile to predicates over the item's
[start_datetime, end_datetime] interval (anyinteracts semantics for
T_INTERSECTS, strictly-before/after for T_BEFORE/T_AFTER). The spatial
property identifier resolves through ``spatial_cols`` and the temporal
one through ``temporal_cols`` — the same indirection pgstac's
queryables mapping performs. Everything compiles to plain column
arithmetic: pushdown-friendly, zero UDFs.
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
             "TRUE", "FALSE", "TIMESTAMP", "DATE", "INTERVAL", "CASEI",
             "S_INTERSECTS", "T_INTERSECTS", "T_BEFORE", "T_AFTER",
             "ANYINTERACTS", "BBOX", "POINT", "POLYGON"}

_TEMPORAL_OPS = {"T_INTERSECTS", "ANYINTERACTS", "T_BEFORE", "T_AFTER"}


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
    def __init__(
        self,
        tokens: list[tuple[str, str]],
        spatial_cols: tuple[Column, Column, Column, Column] | None = None,
        temporal_cols: tuple[Column, Column] | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.spatial_cols = spatial_cols
        self.temporal_cols = temporal_cols

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
        if k == "DATE":
            self.next()
            self.next("lp")
            s = self.next("str")[1:-1]
            self.next("rp")
            return F.lit(s).cast("date")
        if k == "CASEI":
            # CQL2 case-insensitive wrapper: CASEI(x) = CASEI('Y') must
            # match regardless of case on EITHER side — lower() both.
            self.next()
            self.next("lp")
            inner = self.operand()
            self.next("rp")
            return F.lower(inner)
        if k == "TRUE":
            self.next()
            return F.lit(True)
        if k == "FALSE":
            self.next()
            return F.lit(False)
        if k == "word":
            return F.col(self.next())
        raise CQLError(f"expected operand, got {self.toks[self.i][1]!r}")

    # -- spatial / temporal function predicates ------------------------------
    def _num(self) -> float:
        return float(self.next("num"))

    def _geom_envelope(self) -> tuple[float, float, float, float]:
        """Parse a geometry literal and return its (w, s, e, n) envelope.
        The engine's footprints are bbox corners (G3), so intersection
        against the envelope IS the engine's spatial semantics — exact
        for BBOX queries, conservative (superset) for concave polygons,
        same as any bbox-index pre-filter."""
        k = self.peek()
        if k == "BBOX":
            self.next()
            self.next("lp")
            vals = [self._num()]
            for _ in range(3):
                self.next("comma")
                vals.append(self._num())
            self.next("rp")
            w, s, e, n = vals
            return (w, s, e, n)
        if k == "POINT":
            self.next()
            self.next("lp")
            x, y = self._num(), self._num()
            self.next("rp")
            return (x, y, x, y)
        if k == "POLYGON":
            self.next()
            self.next("lp")
            self.next("lp")
            xs, ys = [self._num()], [self._num()]
            while self.peek() == "comma":
                self.next()
                xs.append(self._num())
                ys.append(self._num())
            self.next("rp")
            self.next("rp")
            return (min(xs), min(ys), max(xs), max(ys))
        raise CQLError(
            f"expected BBOX/POINT/POLYGON geometry, got {self.toks[self.i][1]!r}"
        )

    def _interval(self) -> tuple[str | None, str | None]:
        """INTERVAL('lo','hi') with '..' open ends, or a TIMESTAMP/DATE
        instant (degenerate [t, t] interval)."""
        k = self.peek()
        if k == "INTERVAL":
            self.next()
            self.next("lp")
            lo = self.next("str")[1:-1]
            self.next("comma")
            hi = self.next("str")[1:-1]
            self.next("rp")
            return (None if lo == ".." else lo, None if hi == ".." else hi)
        if k in ("TIMESTAMP", "DATE"):
            self.next()
            self.next("lp")
            s = self.next("str")[1:-1]
            self.next("rp")
            return (s, s)
        raise CQLError(
            f"expected INTERVAL/TIMESTAMP/DATE, got {self.toks[self.i][1]!r}"
        )

    def spatial_pred(self) -> Column:
        if self.spatial_cols is None:
            raise CQLError(
                "S_INTERSECTS used but no spatial columns configured — "
                "pass spatial_cols= to compile_cql"
            )
        self.next()  # S_INTERSECTS
        self.next("lp")
        self.next("word")  # the queryable name ('geometry') — resolved
        self.next("comma")  # through spatial_cols, pgstac-queryables style
        qw, qs, qe, qn = self._geom_envelope()
        self.next("rp")
        from recipes_spark.plans.catalog import bbox_intersects

        w, s, e, n = self.spatial_cols
        return bbox_intersects(w, s, e, n, qw, qs, qe, qn)

    def temporal_pred(self) -> Column:
        if self.temporal_cols is None:
            raise CQLError(
                "temporal operator used but no temporal columns configured "
                "— pass temporal_cols= to compile_cql"
            )
        op = self.next().upper()
        self.next("lp")
        self.next("word")  # the queryable name ('datetime') → interval cols
        self.next("comma")
        lo, hi = self._interval()
        self.next("rp")
        start, end = self.temporal_cols

        def ts(v: str) -> Column:
            return F.lit(v).cast("timestamp")

        if op in ("T_INTERSECTS", "ANYINTERACTS"):
            # anyinteracts: item [start,end] overlaps query [lo,hi];
            # an open end drops its bound (always satisfied that side).
            conds = []
            if hi is not None:
                conds.append(start <= ts(hi))
            if lo is not None:
                conds.append(end >= ts(lo))
            if not conds:
                return F.lit(True)
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        if op == "T_BEFORE":
            if lo is None:
                raise CQLError("T_BEFORE needs a bounded interval start")
            return end < ts(lo)
        # T_AFTER
        if hi is None:
            raise CQLError("T_AFTER needs a bounded interval end")
        return start > ts(hi)

    # -- predicates --------------------------------------------------------
    def predicate(self) -> Column:
        k = self.peek()
        if k == "S_INTERSECTS":
            return self.spatial_pred()
        if k in _TEMPORAL_OPS:
            return self.temporal_pred()
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


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def compile_cql(
    text: str,
    *,
    spatial_cols: tuple[Column | str, ...] | None = ("__item_bbox__",),
    temporal_cols: tuple[Column | str, Column | str] | None = (
        "start_datetime",
        "end_datetime",
    ),
) -> Column:
    """CQL2 text → Column predicate (feed to catalog_search(filter=…)).

    ``spatial_cols`` resolves the S_INTERSECTS queryable: either four
    (west, south, east, north) corner columns/names, or the default
    sentinel meaning the engine's STAC item shape — a 4-element ``bbox``
    array column (build_items' output). ``temporal_cols`` resolves the
    temporal queryable to the item's (start, end) interval columns.
    Pass None to reject spatial/temporal operators outright (a schema
    with no footprint)."""
    sp = None
    if spatial_cols == ("__item_bbox__",):
        b = F.col("bbox")
        sp = (b[0], b[1], b[2], b[3])
    elif spatial_cols is not None:
        if len(spatial_cols) != 4:
            raise CQLError("spatial_cols must be 4 (w, s, e, n) columns")
        sp = tuple(_as_col(c) for c in spatial_cols)
    tp = (
        (_as_col(temporal_cols[0]), _as_col(temporal_cols[1]))
        if temporal_cols is not None
        else None
    )
    return _Parser(_tokenize(text), spatial_cols=sp, temporal_cols=tp).parse()
