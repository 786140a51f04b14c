"""InfluxQL AST → query text (the inverse of parser.parse_select).

The reference never needs a printer (it forwards raw statement text to the
data nodes), but this engine does two things with reconstructed text —
display surfaces (SHOW CONTINUOUS QUERIES) and, more importantly, the
property test that hardens the whole parser: for arbitrary generated ASTs,
`parse(print(ast)) == ast` (tests/test_parser_props.py). Any tokenizer or
precedence regression breaks the round-trip on some generated case.

Printing conventions match the parser's canonical output: call names and
tags lowercase, binary expressions fully parenthesized (parentheses only
group — the parser drops them, so a fully-parenthesized print re-parses to
the identical tree regardless of precedence rules), durations rendered in
the largest unit that divides the value exactly.
"""

from __future__ import annotations

import re

from .ast import (BinaryExpr, Call, DurationLit, IntegerLit, MeasurementRef,
                  NumberLit, RegexLit, SelectField, SelectStatement, StringLit,
                  SubQuery, VarRef, Wildcard)
from .lexer import KEYWORDS

_PLAIN_IDENT = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")

# largest-first units whose ns size divides typical bucket widths
_UNITS = [("w", 604_800_000_000_000), ("d", 86_400_000_000_000),
          ("h", 3_600_000_000_000), ("m", 60_000_000_000),
          ("s", 1_000_000_000), ("ms", 1_000_000), ("us", 1_000), ("ns", 1)]


def ident(name: str) -> str:
    """Identifier, double-quoted when it needs it (reserved word or
    non-plain characters) — mirrors real InfluxQL quoting."""
    if _PLAIN_IDENT.match(name) and name.upper() not in KEYWORDS:
        return name
    return '"' + name.replace('"', '\\"') + '"'


def duration(ns: int) -> str:
    for unit, size in _UNITS:
        if ns % size == 0 and ns >= size:
            return f"{ns // size}{unit}"
    return f"{ns}ns"


def expr(e) -> str:
    if isinstance(e, VarRef):
        return ident(e.name)
    if isinstance(e, Wildcard):
        return "*"
    if isinstance(e, NumberLit):
        return repr(e.value)
    if isinstance(e, IntegerLit):
        return str(e.value)
    if isinstance(e, StringLit):
        return "'" + e.value.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(e, DurationLit):
        return e.text
    if isinstance(e, RegexLit):
        return "/" + e.pattern + "/"
    if isinstance(e, Call):
        return e.name + "(" + ", ".join(expr(a) for a in e.args) + ")"
    if isinstance(e, BinaryExpr):
        return f"({expr(e.lhs)} {e.op} {expr(e.rhs)})"
    raise TypeError(f"unprintable expression node: {e!r}")


def _source(src) -> str:
    if isinstance(src, SubQuery):
        return "(" + to_influxql(src.stmt) + ")"
    if isinstance(src, MeasurementRef):
        if src.regex is not None:
            return "/" + src.regex + "/"
        parts = []
        if src.database:
            parts.append(ident(src.database))
            parts.append(ident(src.retention_policy)
                         if src.retention_policy else "")
        parts.append(ident(src.name))
        return ".".join(parts)
    # SourceList
    return ", ".join(_source(r) for r in src.refs)


def to_influxql(s: SelectStatement) -> str:
    out = ["SELECT ",
           ", ".join(expr(f.expr) + (f" AS {ident(f.alias)}" if f.alias
                                     else "")
                     for f in s.fields)]
    if s.into is not None:
        out.append(" INTO " + _source(s.into))
    out.append(" FROM " + _source(s.source))
    if s.where is not None:
        out.append(" WHERE " + expr(s.where))
    groups = []
    if s.group_by_time_ns is not None:
        if s.group_by_offset_ns:
            groups.append(f"time({duration(s.group_by_time_ns)}, "
                          f"{duration(s.group_by_offset_ns)})")
        else:
            groups.append(f"time({duration(s.group_by_time_ns)})")
    groups += [ident(t) if t != "*" else "*" for t in s.group_by_tags]
    if groups:
        out.append(" GROUP BY " + ", ".join(groups))
    if s.fill is not None:
        out.append(f" fill({s.fill})")
    if s.order_desc:
        out.append(" ORDER BY time DESC")
    if s.limit is not None:
        out.append(f" LIMIT {s.limit}")
    if s.offset is not None:
        out.append(f" OFFSET {s.offset}")
    if s.slimit is not None:
        out.append(f" SLIMIT {s.slimit}")
    if s.soffset is not None:
        out.append(f" SOFFSET {s.soffset}")
    if s.tz is not None:
        out.append(f" tz('{s.tz}')")
    return "".join(out)
