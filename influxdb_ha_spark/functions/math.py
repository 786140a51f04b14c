"""Scalar math over (aggregated) columns.

The reference's merge tree evaluates unary math element-wise on child
results (merge/query_merge.go:165-170, 211-267) and five binary ops with
InfluxDB-compat quirks (query_merge.go:298-335): division by zero yields 0
(not null), and `%` casts both sides to int. Both quirks sit behind
`compat=True`; default is standard SQL semantics (div0 → null).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 14 unary functions the merge tree applies (query_merge.go:211-267).
MATH_FUNCS = {
    "abs": F.abs, "acos": F.acos, "asin": F.asin, "atan": F.atan,
    "ceil": F.ceil, "cos": F.cos, "floor": F.floor,
    "log": F.log, "log2": F.log2, "log10": F.log10,
    "round": F.round, "sin": F.sin, "sqrt": F.sqrt, "tan": F.tan,
    # binary math exposed as functions
    "pow": F.pow, "atan2": F.atan2, "exp": F.exp, "ln": F.log,
}


def apply_math(name: str, *cols: Column) -> Column:
    fn = MATH_FUNCS.get(name.lower())
    if fn is None:
        # unknown names are identity in the reference (query_merge.go:263-266)
        return cols[0]
    return fn(*cols)


def binary_op(op: str, left: Column, right: Column, compat: bool = False) -> Column:
    """`+ - * / %` over scalars (query_merge.go:298-335)."""
    if op == "+":
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    if op == "/":
        if compat:  # div-by-zero → 0 (query_merge.go:319-323)
            return F.when(right == 0, F.lit(0.0)).otherwise(left / right)
        return left / right
    if op == "%":
        if compat:  # int cast both sides (query_merge.go:325-329)
            return left.cast("long") % right.cast("long")
        return left % right
    raise ValueError(f"unknown binary operator: {op}")
