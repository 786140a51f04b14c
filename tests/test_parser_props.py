"""Property-based parser hardening: for arbitrary generated SELECT ASTs,
parse(print(ast)) == ast.

The printer fully parenthesizes binary expressions, so the round-trip is
insensitive to precedence rules — what it catches is tokenizer drift
(quoting, escapes, durations, operators) and field/clause plumbing in the
parser. Pure Python: no SparkSession involved.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from influxdb_ha_spark.influxql.ast import (BinaryExpr, Call, IntegerLit,
                                            MeasurementRef, NumberLit,
                                            RegexLit, SelectField,
                                            SelectStatement, StringLit,
                                            VarRef)
from influxdb_ha_spark.influxql.lexer import KEYWORDS
from influxdb_ha_spark.influxql.parser import parse_select
from influxdb_ha_spark.influxql.printer import to_influxql

names = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True).filter(
    lambda s: s.upper() not in KEYWORDS and s != "time")

lits = st.one_of(
    st.integers(0, 10**9).map(IntegerLit),
    st.integers(1, 10**7).map(lambda i: NumberLit(i / 10.0)),
    st.text(alphabet=string.ascii_lowercase + " 0123456789",
            max_size=12).map(StringLit))

value_exprs = st.recursive(
    st.one_of(names.map(VarRef), lits),
    lambda kids: st.one_of(
        st.builds(BinaryExpr, st.sampled_from(list("+-*/%")), kids, kids),
        st.builds(Call,
                  st.sampled_from(["mean", "sum", "min", "max", "count",
                                   "abs", "round"]),
                  st.lists(kids, min_size=1, max_size=2))),
    max_leaves=6)

comparisons = st.one_of(
    st.builds(lambda op, n, v: BinaryExpr(op, VarRef(n), v),
              st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
              names, lits),
    st.builds(lambda op, n, p: BinaryExpr(op, VarRef(n), RegexLit(p)),
              st.sampled_from(["=~", "!~"]), names,
              st.from_regex(r"[a-z]{1,6}", fullmatch=True)))

wheres = st.recursive(
    comparisons,
    lambda kids: st.builds(BinaryExpr, st.sampled_from(["AND", "OR"]),
                           kids, kids),
    max_leaves=4)

# whole multiples of one unit, so the printer's largest-divides rendering
# and the lexer's duration grammar agree
durations_ns = st.sampled_from(
    [1, 1_000, 1_000_000, 1_000_000_000, 60_000_000_000,
     3_600_000_000_000]).flatmap(
    lambda unit: st.integers(1, 500).map(lambda k: k * unit))


@st.composite
def select_statements(draw):
    gb_time = draw(st.none() | durations_ns)
    gb_offset = draw(durations_ns) if gb_time and draw(st.booleans()) else 0
    # fill(null) is InfluxQL's default and canonicalizes to fill=None in
    # the AST, so the generator never emits it as a distinct value
    fill = None
    if gb_time is not None:
        fill = draw(st.none()
                    | st.sampled_from(["none", "previous", "linear"])
                    | st.integers(-5, 5))
    return SelectStatement(
        fields=draw(st.lists(
            st.builds(SelectField, value_exprs, st.none() | names),
            min_size=1, max_size=3)),
        source=MeasurementRef(name=draw(names)),
        where=draw(st.none() | wheres),
        group_by_time_ns=gb_time,
        group_by_offset_ns=gb_offset,
        group_by_tags=draw(st.lists(names, max_size=2, unique=True)),
        fill=fill,
        order_desc=draw(st.booleans()),
        limit=draw(st.none() | st.integers(1, 1000)),
        offset=draw(st.none() | st.integers(1, 1000)),
        slimit=draw(st.none() | st.integers(1, 100)),
        soffset=draw(st.none() | st.integers(1, 100)),
        tz=draw(st.none() | st.sampled_from(["UTC", "America/Chicago"])))


@settings(max_examples=200, deadline=None)
@given(select_statements())
def test_parse_print_roundtrip(stmt):
    text = to_influxql(stmt)
    again = parse_select(text)
    assert again == stmt, text


def test_quoting_and_escapes():
    """Reserved words and special characters survive the round-trip via
    double-quoted identifiers / escaped string literals."""
    s = SelectStatement(
        fields=[SelectField(VarRef("select"), alias="group"),
                SelectField(VarRef("weird name"), alias=None)],
        source=MeasurementRef(name="from"),
        where=BinaryExpr("=", VarRef("tag"), StringLit("o'brien \\ x")))
    assert parse_select(to_influxql(s)) == s
