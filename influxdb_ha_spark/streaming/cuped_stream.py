"""Streaming twin #29 of operators/timeseries.cuped: the LIVE
variance-reduced experiment readout, split along the operator's own
seam.

cuped is (per-unit covariate/metric table) → (six-moment closed-form
fold). The per-unit table is the only data-sized part, and each unit's
(x, y) pair is a pair of RUNNING SUMS — mergeable by +, the additive
twin algebra — so the streaming half maintains exactly that table:
state is keyed by the randomization UNIT (user), two int64 CENT
counters per unit (value·100 round-half-up — exact for ≤2-decimal
metrics, the operator's own coarsening contract), events routed into
the pre-period X or experiment Y counter JVM-side by the boundary
timestamp. Keying on the unit distributes 100 TB of events across the
cluster exactly like the batch per-user shuffle; no single-key funnel,
state is 2 int64s per unit.

Each micro-batch emits the CURRENT (unit, x, y) for every unit that
changed (update mode). The dashboard turns any snapshot into the CUPED
statistics with operators/timeseries.cuped itself — the batch operator
verbatim over the streamed table, so stream-fed readouts are
bit-identical to batch cuped on the union of all micro-batches
(pytest-pinned: integer cent sums cannot depend on batch boundaries).
Counters are additive, NOT idempotent: at-least-once re-delivery
shifts sums — the same caveat as every additive twin (ab_stream,
ams_stream); exactly-once sinks or idempotent upstream keys are the
production answer.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "xc long, yc long"
OUTPUT_SCHEMA = "unit long, x double, y double"


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    xc, yc = (int(state.get[0]), int(state.get[1])) if state.exists \
        else (0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    xc += int(batch["xc"].sum())
    yc += int(batch["yc"].sum())
    state.update((xc, yc))
    yield pd.DataFrame({"unit": [key[0]],
                        "x": [xc / 100.0], "y": [yc / 100.0]})


def unit_sums_stream(events: DataFrame, unit_col: str, value_col: str,
                     time_col: str, boundary_ns: int) -> DataFrame:
    """Streaming events → live per-unit CUPED input table (unit, x, y).

    Events strictly before `boundary_ns` accumulate into the pre-period
    covariate X, the rest into the experiment metric Y — the batch gate
    query's split, JVM-side. Values are converted to exact integer
    cents (floor(v·100 + 0.5), the cuped scale=100 coarsening) BEFORE
    the stateful update, so the per-unit sums are order- and
    batch-boundary-free integers. NULL units or values drop JVM-side
    (the batch filter). State: 2 int64s per unit."""
    v = F.col(value_col).cast("double")
    cents = F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("long")
    pre = F.col(time_col).cast("long") < F.lit(int(boundary_ns))
    keyed = (events
             .where(F.col(unit_col).isNotNull() & v.isNotNull())
             .select(F.col(unit_col).cast("long").alias("unit"),
                     F.when(pre, cents).otherwise(F.lit(0))
                     .alias("xc"),
                     F.when(~pre, cents).otherwise(F.lit(0))
                     .alias("yc")))
    return (keyed.groupBy("unit")
            .applyInPandasWithState(
                _update, outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA, outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
