"""InfluxQL frontend: lexer, AST, parser, and the clusterql management
language. The reference uses the public `influxdata/influxql` Go parser
(service/query_handler.go:43); nothing in Catalyst parses InfluxQL, so this
hand-rolled recursive-descent parser is the SURVEY.md §4 "custom work" item 1.
It covers the SELECT surface the reference coordinates (SURVEY.md §2.4-2.6)
plus the SHOW meta statements it routes (service/routing.go:121-135).
"""

from .ast import (  # noqa: F401
    BinaryExpr, Call, DurationLit, MeasurementRef, NumberLit, SelectStatement,
    ShowStatement, StringLit, TimeRange, VarRef, Wildcard,
)
from .parser import parse_query, parse_select  # noqa: F401
