"""Operator library: the reference's full aggregate/selector/transform
matrix (SURVEY.md §2.4) re-expressed as native Catalyst expressions."""

from .aggregates import AGGREGATES, agg_column, is_aggregate  # noqa: F401
from .transforms import (  # noqa: F401
    cumulative_sum, derivative, difference, elapsed, histogram, integral,
    moving_average, non_negative_derivative, non_negative_difference,
)
from .fill import fill_buckets  # noqa: F401
from .math import MATH_FUNCS, apply_math  # noqa: F401
