"""Tokenizer for InfluxQL (subset) — regex-driven, single pass."""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "FILL", "ORDER", "LIMIT",
    "OFFSET", "SLIMIT", "SOFFSET", "AND", "OR", "AS", "ASC", "DESC", "INTO",
    "SHOW", "MEASUREMENTS", "DATABASES", "SERIES", "TAG", "FIELD", "KEYS",
    "VALUES", "KEY", "RETENTION", "POLICIES", "ON", "WITH", "CONTINUOUS",
    "QUERIES", "QUERY", "CREATE", "DROP", "DELETE", "DATABASE", "MEASUREMENT",
    "POLICY", "DURATION", "REPLICATION", "DEFAULT", "BEGIN", "END", "EVERY",
    "RESAMPLE", "FOR", "TRUE", "FALSE", "NULL", "LINEAR", "NONE", "PREVIOUS",
}

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+)
  | (?P<DURATION>\d+(?:ns|us|µ|ms|s|m|h|d|w)(?:\d+(?:ns|us|µ|ms|s|m|h|d|w))*)
  | (?P<NUMBER>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<INTEGER>\d+)
  | (?P<STRING>'(?:[^'\\]|\\.)*')
  | (?P<DQIDENT>"(?:[^"\\]|\\.)*")
  | (?P<IDENT>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP><=|>=|!=|<>|=~|!~|::|[-+*/%=<>(),.;*])
""", re.VERBOSE)


@dataclass
class Token:
    kind: str   # KEYWORD IDENT NUMBER INTEGER STRING DURATION OP EOF
    text: str
    pos: int


_REGEX_RE = re.compile(r"/(?:[^/\\]|\\.)*/")

def _regex_context(out: list["Token"]) -> bool:
    """A `/` starts a regex literal (not division) right after `=~`, `!~`,
    FROM, SELECT, or a comma following one of those positions — mirroring
    influxql's context-sensitive scanner (an expression can never *start*
    with division, so `,`/SELECT positions are unambiguous)."""
    if not out:
        return False
    t = out[-1]
    return (t.kind == "OP" and t.text in ("=~", "!~", ",", "(")) or \
        (t.kind == "KEYWORD" and t.text in ("FROM", "SELECT", "BY"))


def tokenize(s: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    while pos < len(s):
        if s[pos] == "/" and _regex_context(out):
            m = _REGEX_RE.match(s, pos)
            if not m:
                raise SyntaxError(f"unterminated regex at position {pos}")
            out.append(Token("REGEX", m.group()[1:-1].replace("\\/", "/"), pos))
            pos = m.end()
            continue
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise SyntaxError(f"illegal character {s[pos]!r} at position {pos}")
        kind = m.lastgroup
        text = m.group()
        if kind == "WS":
            pos = m.end()
            continue
        if kind == "IDENT" and text.upper() in KEYWORDS:
            out.append(Token("KEYWORD", text.upper(), pos))
        elif kind == "DQIDENT":
            out.append(Token(
                "IDENT", re.sub(r'\\(["\\])', r"\1", text[1:-1]), pos))
        elif kind == "STRING":
            # InfluxQL string literals support \' and \\ escapes; found by
            # the parse∘print property test (test_parser_props.py) — the
            # old \'-only unescape made backslash values unprintable
            out.append(Token(
                "STRING", re.sub(r"\\(['\\])", r"\1", text[1:-1]), pos))
        else:
            out.append(Token(kind, text, pos))
        pos = m.end()
    out.append(Token("EOF", "", pos))
    return out
