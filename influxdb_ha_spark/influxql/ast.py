"""InfluxQL AST node types (the shape of `influxdata/influxql`'s AST, sized
to the subset the reference actually coordinates — SURVEY.md §2.11)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class VarRef:
    name: str


@dataclass
class Wildcard:
    pass


@dataclass
class NumberLit:
    value: float


@dataclass
class IntegerLit:
    value: int


@dataclass
class StringLit:
    value: str


@dataclass
class DurationLit:
    ns: int
    text: str


@dataclass
class RegexLit:
    pattern: str


@dataclass
class Call:
    name: str
    args: list = field(default_factory=list)


@dataclass
class BinaryExpr:
    op: str  # AND OR = != <> < <= > >= + - * / % =~ !~
    lhs: object
    rhs: object


@dataclass
class MeasurementRef:
    name: str | None
    database: str | None = None
    retention_policy: str | None = None
    regex: str | None = None  # FROM /re/ — name is None


@dataclass
class SubQuery:
    stmt: object  # SelectStatement
    database: str | None = None
    regex: str | None = None  # shape-compat with MeasurementRef checks


@dataclass
class SourceList:
    refs: list  # list[MeasurementRef] — FROM m1, m2, …
    database: str | None = None
    regex: str | None = None  # shape-compat


@dataclass
class SelectField:
    expr: object
    alias: str | None = None


@dataclass
class TimeRange:
    """Extracted time bounds in ns; None = unbounded (half-open [start, end))."""
    start_ns: int | None = None
    end_ns: int | None = None


@dataclass
class SelectStatement:
    fields: list[SelectField]
    source: MeasurementRef
    where: object | None = None
    group_by_time_ns: int | None = None
    group_by_offset_ns: int = 0
    group_by_tags: list[str] = field(default_factory=list)
    fill: object = None            # None | 'none' | 'previous' | 'linear' | number
    order_desc: bool = False       # ORDER BY time DESC
    limit: int | None = None
    offset: int | None = None
    slimit: int | None = None
    soffset: int | None = None
    into: MeasurementRef | None = None  # SELECT ... INTO (continuous queries)
    tz: str | None = None          # tz('America/Chicago') — local buckets


@dataclass
class ShowStatement:
    """SHOW MEASUREMENTS / TAG KEYS / FIELD KEYS / SERIES / DATABASES /
    TAG VALUES / RETENTION POLICIES (routing.go:121-135)."""
    what: str
    database: str | None = None
    measurement: str | None = None
    with_key: str | None = None    # SHOW TAG VALUES ... WITH KEY = x
    with_keys: list | None = None  # ... WITH KEY IN ("a", "b")
    with_key_regex: str | None = None  # ... WITH KEY =~ /re/
    limit: int | None = None       # SHOW ... LIMIT n OFFSET m (paginated
    offset: int | None = None      # meta scans — series.go:67-89 pages)
    measurement_regex: str | None = None  # SHOW MEASUREMENTS WITH ... =~
    cardinality: bool = False      # SHOW <x> [EXACT] CARDINALITY
    exact: bool = False            # EXACT modifier (else HLL-estimated)
