"""Recursive-descent parser for the InfluxQL subset the engine supports.

Grammar coverage = what the reference routes/coordinates (SURVEY.md §2.11):
SELECT (aggregates, math, GROUP BY time()/tags, fill, ORDER BY time,
LIMIT/OFFSET/SLIMIT/SOFFSET, INTO for CQs) and the SHOW meta statements.
Operator precedence mirrors influxql: OR < AND < comparison < additive <
multiplicative.
"""

from __future__ import annotations

from .ast import (BinaryExpr, Call, DurationLit, IntegerLit, MeasurementRef,
                  NumberLit, RegexLit, SelectField, SelectStatement,
                  ShowStatement, SourceList, StringLit, SubQuery, VarRef,
                  Wildcard)
from .lexer import Token, tokenize
from ..timeutil import parse_duration_ns


class Parser:
    def __init__(self, text: str):
        self.tokens = tokenize(text)
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            want = text or kind
            raise SyntaxError(
                f"error parsing query: found {got.text or 'EOF'}, expected {want} "
                f"at position {got.pos}")
        return t

    # -- statements -------------------------------------------------------
    def parse_statement(self):
        t = self.peek()
        if t.kind == "KEYWORD" and t.text == "SELECT":
            return self.parse_select()
        if t.kind == "KEYWORD" and t.text == "SHOW":
            return self.parse_show()
        raise SyntaxError(f"error parsing query: unsupported statement at {t.text!r}")

    def parse_select(self) -> SelectStatement:
        self.expect("KEYWORD", "SELECT")
        fields = [self.parse_select_field()]
        while self.accept("OP", ","):
            fields.append(self.parse_select_field())
        into = None
        if self.accept("KEYWORD", "INTO"):
            into = self.parse_measurement_ref()
        self.expect("KEYWORD", "FROM")
        if self.peek().kind == "OP" and self.peek().text == "(":
            # subquery source — unsupported in the reference
            # (README.md:190-194) but part of influxql; free on Spark
            self.next()
            inner = self.parse_select()
            self.expect("OP", ")")
            source = SubQuery(stmt=inner)
        else:
            source = self.parse_measurement_ref()
            if self.peek().kind == "OP" and self.peek().text == ",":
                # FROM m1, m2 — union of per-measurement results (the
                # reference rejects this on partitioned data,
                # README.md:196-200; free on Spark)
                refs = [source]
                while self.accept("OP", ","):
                    refs.append(self.parse_measurement_ref())
                source = SourceList(refs=refs)
        stmt = SelectStatement(fields=fields, source=source, into=into)
        if self.accept("KEYWORD", "WHERE"):
            stmt.where = self.parse_expr()
        if self.accept("KEYWORD", "GROUP"):
            self.expect("KEYWORD", "BY")
            self._parse_group_by(stmt)
        if self.accept("KEYWORD", "FILL"):
            self.expect("OP", "(")
            stmt.fill = self._parse_fill_arg()
            self.expect("OP", ")")
        if self.accept("KEYWORD", "ORDER"):
            self.expect("KEYWORD", "BY")
            tok = self.next()
            if tok.text.lower() != "time":
                raise SyntaxError("only ORDER BY time is supported")  # query_merge.go:82-85
            if self.accept("KEYWORD", "DESC"):
                stmt.order_desc = True
            else:
                self.accept("KEYWORD", "ASC")
        if self.accept("KEYWORD", "LIMIT"):
            stmt.limit = int(self.expect("INTEGER").text)
        if self.accept("KEYWORD", "OFFSET"):
            stmt.offset = int(self.expect("INTEGER").text)
        if self.accept("KEYWORD", "SLIMIT"):
            stmt.slimit = int(self.expect("INTEGER").text)
        if self.accept("KEYWORD", "SOFFSET"):
            stmt.soffset = int(self.expect("INTEGER").text)
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() == "tz":
            self.next()
            self.expect("OP", "(")
            stmt.tz = self.expect("STRING").text
            self.expect("OP", ")")
        return stmt

    def _parse_group_by(self, stmt: SelectStatement) -> None:
        while True:
            t = self.peek()
            if t.kind in ("IDENT",) and t.text.lower() == "time":
                self.next()
                self.expect("OP", "(")
                d = self.expect("DURATION")
                stmt.group_by_time_ns = parse_duration_ns(d.text)
                if self.accept("OP", ","):
                    off = self.expect("DURATION")
                    stmt.group_by_offset_ns = parse_duration_ns(off.text)
                self.expect("OP", ")")
            elif t.kind == "OP" and t.text == "*":
                self.next()
                stmt.group_by_tags.append("*")
            elif t.kind == "REGEX":
                # GROUP BY /re/ — expanded to matching tags at plan time
                stmt.group_by_tags.append("/" + self.next().text + "/")
            elif t.kind == "IDENT":
                stmt.group_by_tags.append(self.next().text)
                if self.accept("OP", "::"):
                    self.next()  # `::tag` annotation
            elif t.kind == "KEYWORD":
                # tags may collide with keywords (a tag named "tag"/"key");
                # in item position a keyword is unambiguous — influxql also
                # allows quoting ("tag") which lexes as IDENT already
                stmt.group_by_tags.append(self.next().text.lower())
            else:
                raise SyntaxError(f"error parsing query: bad GROUP BY at {t.text!r}")
            if not self.accept("OP", ","):
                break

    def _parse_fill_arg(self):
        t = self.next()
        if t.kind == "KEYWORD" and t.text in ("NONE", "NULL", "PREVIOUS", "LINEAR"):
            return {"NONE": "none", "NULL": None,
                    "PREVIOUS": "previous", "LINEAR": "linear"}[t.text]
        if t.kind == "IDENT" and t.text.lower() in ("none", "null", "previous", "linear"):
            v = t.text.lower()
            return None if v == "null" else v
        if t.kind == "INTEGER":
            return int(t.text)
        if t.kind == "NUMBER":
            return float(t.text)
        if t.kind == "OP" and t.text == "-":
            n = self.next()
            return -(int(n.text) if n.kind == "INTEGER" else float(n.text))
        raise SyntaxError(f"error parsing query: bad fill argument {t.text!r}")

    def parse_measurement_ref(self) -> MeasurementRef:
        if self.peek().kind == "REGEX":
            return MeasurementRef(name=None, regex=self.next().text)
        parts = [self.expect_name()]
        while self.accept("OP", "."):
            parts.append(self.expect_name())
        if len(parts) == 1:
            return MeasurementRef(name=parts[0])
        if len(parts) == 2:  # rp.measurement
            return MeasurementRef(name=parts[1], retention_policy=parts[0])
        return MeasurementRef(name=parts[2], database=parts[0],
                              retention_policy=parts[1])

    def expect_name(self) -> str:
        t = self.peek()
        if t.kind in ("IDENT", "STRING") or t.kind == "KEYWORD":
            return self.next().text if t.kind != "KEYWORD" else self.next().text.lower()
        raise SyntaxError(f"error parsing query: expected identifier, got {t.text!r}")

    def parse_select_field(self) -> SelectField:
        expr = self.parse_expr()
        alias = None
        if self.accept("KEYWORD", "AS"):
            alias = self.expect_name()
        return SelectField(expr=expr, alias=alias)

    # -- expressions (precedence climbing) --------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        lhs = self.parse_and()
        while self.accept("KEYWORD", "OR"):
            lhs = BinaryExpr("OR", lhs, self.parse_and())
        return lhs

    def parse_and(self):
        lhs = self.parse_cmp()
        while self.accept("KEYWORD", "AND"):
            lhs = BinaryExpr("AND", lhs, self.parse_cmp())
        return lhs

    def parse_cmp(self):
        lhs = self.parse_add()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("=", "!=", "<>", "<", "<=", ">", ">=",
                                             "=~", "!~"):
                self.next()
                op = "!=" if t.text == "<>" else t.text
                if self.peek().kind == "REGEX":
                    lhs = BinaryExpr(op, lhs, RegexLit(self.next().text))
                else:
                    lhs = BinaryExpr(op, lhs, self.parse_add())
            else:
                return lhs

    def parse_add(self):
        lhs = self.parse_mul()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                self.next()
                lhs = BinaryExpr(t.text, lhs, self.parse_mul())
            else:
                return lhs

    def parse_mul(self):
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/", "%"):
                self.next()
                lhs = BinaryExpr(t.text, lhs, self.parse_unary())
            else:
                return lhs

    def parse_unary(self):
        if self.accept("OP", "-"):
            inner = self.parse_unary()
            if isinstance(inner, NumberLit):
                return NumberLit(-inner.value)
            if isinstance(inner, IntegerLit):
                return IntegerLit(-inner.value)
            return BinaryExpr("*", IntegerLit(-1), inner)
        return self.parse_primary()

    def parse_primary(self):
        t = self.next()
        if t.kind == "REGEX":
            return RegexLit(t.text)
        if t.kind == "OP" and t.text == "(":
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "OP" and t.text == "*":
            return Wildcard()
        if t.kind == "NUMBER":
            return NumberLit(float(t.text))
        if t.kind == "INTEGER":
            return IntegerLit(int(t.text))
        if t.kind == "DURATION":
            return DurationLit(parse_duration_ns(t.text), t.text)
        if t.kind == "STRING":
            return StringLit(t.text)
        if t.kind == "KEYWORD" and t.text in ("TRUE", "FALSE"):
            return IntegerLit(1 if t.text == "TRUE" else 0)
        if t.kind == "IDENT":
            if self.accept("OP", "("):
                args = []
                if not self.accept("OP", ")"):
                    args.append(self.parse_expr())
                    while self.accept("OP", ","):
                        args.append(self.parse_expr())
                    self.expect("OP", ")")
                return Call(t.text.lower(), args)
            # influxql `ident::field` / `ident::tag` / `ident::<type>` cast
            # annotations — disambiguation hints; the engine's schema is
            # typed, so they parse and are accepted as written
            if self.accept("OP", "::"):
                self.next()  # consume the annotation word
            return VarRef(t.text)
        raise SyntaxError(f"error parsing query: unexpected token {t.text!r}")

    # -- SHOW -------------------------------------------------------------
    def parse_show(self) -> ShowStatement:
        self.expect("KEYWORD", "SHOW")
        t = self.next()
        what = t.text
        if what == "TAG" or what == "FIELD":
            nxt = self.next().text  # KEYS or VALUES (KEY in cardinality form)
            if nxt == "KEY":
                nxt = "KEYS"
            what = f"{what} {nxt}"
        elif what == "MEASUREMENT":
            what = "MEASUREMENTS"  # SHOW MEASUREMENT CARDINALITY (singular)
        elif what == "RETENTION":
            self.expect("KEYWORD", "POLICIES")
            what = "RETENTION POLICIES"
        elif what == "CONTINUOUS":
            self.expect("KEYWORD", "QUERIES")
            what = "CONTINUOUS QUERIES"
        stmt = ShowStatement(what=what)
        # SHOW <x> [EXACT] CARDINALITY (influxql 1.x cardinality surface):
        # like InfluxDB, the bare form is ESTIMATED (HLL sketch —
        # server._show) and EXACT forces the exact distinct count
        nxt = self.peek()
        if nxt.text == "EXACT":
            self.next()
            stmt.exact = True
            nxt = self.peek()
        if nxt.text == "CARDINALITY":
            self.next()
            stmt.cardinality = True
        if self.accept("KEYWORD", "ON"):
            stmt.database = self.expect_name()
        if what == "MEASUREMENTS" and self.accept("KEYWORD", "WITH"):
            # SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ (or = name)
            self.expect("KEYWORD", "MEASUREMENT")
            if self.peek().kind == "OP" and self.peek().text == "=~":
                self.next()
                stmt.measurement_regex = self.expect("REGEX").text
            else:
                self.expect("OP", "=")
                stmt.measurement = self.expect_name()
        if self.accept("KEYWORD", "FROM"):
            stmt.measurement = self.parse_measurement_ref().name
        if self.accept("KEYWORD", "WITH"):
            self.expect("KEYWORD", "KEY")
            t = self.peek()
            if t.kind == "IDENT" and t.text.upper() == "IN":
                # WITH KEY IN ("k1", "k2")
                self.next()
                self.expect("OP", "(")
                keys = [self.expect_name()]
                while self.accept("OP", ","):
                    keys.append(self.expect_name())
                self.expect("OP", ")")
                stmt.with_keys = keys
            elif t.kind == "OP" and t.text == "=~":
                self.next()
                stmt.with_key_regex = self.expect("REGEX").text
            else:
                self.expect("OP", "=")
                stmt.with_key = self.expect_name()
        if self.accept("KEYWORD", "LIMIT"):
            stmt.limit = int(self.expect("INTEGER").text)
        if self.accept("KEYWORD", "OFFSET"):
            stmt.offset = int(self.expect("INTEGER").text)
        return stmt


def parse_select(text: str) -> SelectStatement:
    p = Parser(text)
    stmt = p.parse_select()
    p.accept("OP", ";")
    p.expect("EOF")
    return stmt


def parse_query(text: str):
    """Parse a (single-statement) InfluxQL query → AST."""
    p = Parser(text)
    stmt = p.parse_statement()
    p.accept("OP", ";")
    p.expect("EOF")
    return stmt
