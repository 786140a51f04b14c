"""Continuous queries as Structured Streaming jobs.

In the reference, CQs are defined/copied between nodes (`SHOW CONTINUOUS
QUERIES` → `CREATE CONTINUOUS QUERY`, syncing/importer.go:323-333, 579-594)
but *executed* by InfluxDB itself:

    CREATE CONTINUOUS QUERY avg_t ON db BEGIN
      SELECT mean(value) INTO mean_treasure FROM treasures GROUP BY time(1h)
    END

The Spark-native execution (SURVEY §2.9): a CQ is a streaming aggregation —
`readStream(source) → withWatermark → groupBy(window(time, interval), tags)
→ agg → writeStream(outputMode=append|update).trigger(interval)` into the
target table. Watermarking bounds state; the reference's accept-anything
late-data semantics are preserved by pairing the stream with a batch
backfill path (`run_batch`) for data older than the watermark.

Windows use Spark's `F.window` over a µs timestamp derived from the ns
`time` column (timeutil.ns_to_timestamp) — window state at ns fidelity isn't
needed because CQ intervals are ≥ seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..influxql.ast import SelectStatement
from ..influxql.parser import parse_select
from ..model import Catalog, TIME_COL
from ..planner import Planner
from ..timeutil import ns_to_timestamp, timestamp_to_ns


@dataclass
class ContinuousQuery:
    name: str
    database: str
    query: str                   # the inner SELECT ... INTO ... statement
    stmt: SelectStatement = None
    every: str | None = None     # RESAMPLE EVERY — trigger interval
    for_: str | None = None      # RESAMPLE FOR — recompute coverage window

    def __post_init__(self):
        if self.stmt is None:
            self.stmt = parse_select(self.query)
        if self.stmt.into is None:
            raise ValueError("continuous query requires INTO clause")


class CQRunner:
    """Registry + executor for continuous queries.

    `run_batch` materializes one catch-up pass (also the backfill path for
    late data); `run_stream` attaches the streaming pipeline to a streaming
    DataFrame of the same schema.
    """

    def __init__(self, catalog: Catalog, now_ns: int | None = None):
        self.catalog = catalog
        self.now_ns = now_ns
        self.cqs: dict[str, ContinuousQuery] = {}
        self._last_run_ns: dict[str, int] = {}

    # -- DDL surface (importer.go:579-594 round-trip) ------------------------
    def create(self, cq: ContinuousQuery) -> None:
        if cq.name in self.cqs:
            raise ValueError(f"continuous query {cq.name} already exists")
        self.cqs[cq.name] = cq

    def drop(self, name: str) -> None:
        self.cqs.pop(name, None)

    def show(self) -> DataFrame:
        # display the full CREATE statement like InfluxDB, including any
        # RESAMPLE clause
        def text(c: ContinuousQuery) -> str:
            resample = ""
            if c.every or c.for_:
                resample = " RESAMPLE"
                if c.every:
                    resample += f" EVERY {c.every}"
                if c.for_:
                    resample += f" FOR {c.for_}"
            return (f"CREATE CONTINUOUS QUERY {c.name} ON {c.database}"
                    f"{resample} BEGIN {c.query} END")

        rows = [(c.name, c.database, text(c)) for c in self.cqs.values()]
        return self.catalog.spark.createDataFrame(
            rows or [], "name string, database string, query string")

    # -- execution ------------------------------------------------------------
    def run_batch(self, name: str) -> DataFrame:
        """One batch pass of the CQ's SELECT; result registered as the INTO
        measurement (the catch-up/backfill semantics).

        With RESAMPLE FOR, only the trailing coverage window is recomputed
        and spliced over the existing target — influxql's resample
        semantics (recompute recent buckets as late data lands, leave
        older buckets untouched)."""
        import copy

        from ..influxql.ast import BinaryExpr, IntegerLit, VarRef
        from ..timeutil import parse_duration_ns

        cq = self.cqs[name]
        planner = Planner(self.catalog, cq.database, now_ns=self.now_ns)
        stmt = cq.stmt
        lo = None
        if cq.for_ and self.now_ns is not None:
            lo = self.now_ns - parse_duration_ns(cq.for_)
            stmt = copy.deepcopy(stmt)
            bound = BinaryExpr(op=">=", lhs=VarRef(name=TIME_COL),
                               rhs=IntegerLit(value=lo))
            stmt.where = (bound if stmt.where is None else
                          BinaryExpr(op="AND", lhs=stmt.where, rhs=bound))
        out = planner.plan(stmt)
        if lo is not None:
            try:
                existing = self.catalog.get(cq.database, cq.stmt.into.name).df
                out = existing.where(F.col(TIME_COL) < F.lit(lo)) \
                    .unionByName(out, allowMissingColumns=True)
            except KeyError:
                pass  # first run — nothing to splice
        tags = [c for c in out.columns
                if c in self.catalog.get(cq.database, cq.stmt.source.name).tags]
        value_cols = [c for c in out.columns if c != TIME_COL and c not in tags]
        self.catalog.register_dataframe(
            cq.database, cq.stmt.into.name, out, time_col=TIME_COL,
            tags=tags, fields=value_cols)
        return out

    def run_due(self, now_ns: int) -> list[str]:
        """Scheduler tick: run every CQ whose cadence has elapsed.

        Cadence = RESAMPLE EVERY when given, else the CQ's GROUP BY
        time() interval (influxdb's default run interval). The driver of
        this loop is external (cron, Airflow, a streaming trigger) — the
        reference likewise leaves execution timing to InfluxDB's CQ
        service. Returns the names that ran."""
        from ..timeutil import parse_duration_ns

        ran = []
        for name, cq in self.cqs.items():
            cadence = (parse_duration_ns(cq.every) if cq.every
                       else (cq.stmt.group_by_time_ns or 0))
            last = self._last_run_ns.get(name)
            if last is not None and cadence and now_ns - last < cadence:
                continue
            prev_now = self.now_ns
            self.now_ns = now_ns
            try:
                self.run_batch(name)
            finally:
                self.now_ns = prev_now
            self._last_run_ns[name] = now_ns
            ran.append(name)
        return ran

    def stream_plan(self, name: str, stream: DataFrame,
                    watermark: str = "1 hour") -> DataFrame:
        """Build the streaming aggregation plan for a CQ over a streaming
        DataFrame with the measurement's schema (ns `time` column).

        Returns the transformed streaming DataFrame; caller attaches
        `.writeStream` with checkpointing (exactly-once into the target —
        the engine-native replacement for hinted handoff,
        cluster/recovery.go:89-109).
        """
        cq = self.cqs[name]
        stmt = cq.stmt
        if stmt.group_by_time_ns is None:
            raise ValueError("continuous query requires GROUP BY time()")
        interval_s = stmt.group_by_time_ns // 1_000_000_000
        ts = ns_to_timestamp(F.col(TIME_COL))
        base = stream.withColumn("__ts", ts).withWatermark("__ts", watermark)
        keys = [F.window("__ts", f"{interval_s} seconds").alias("__w")]
        keys += [F.col(t) for t in stmt.group_by_tags]

        from ..planner import Planner as _P
        planner = _P(self.catalog, cq.database, now_ns=self.now_ns)
        agg_exprs: dict = {}
        names = []
        for f_ in stmt.fields:
            nm = f_.alias or planner._default_name(f_.expr)
            planner._collect_aggs(f_.expr, agg_exprs)
            names.append((nm, f_.expr))
        agged = base.groupBy(*keys).agg(
            *[c.alias(n) for n, c in agg_exprs.items()])
        sel = [timestamp_to_ns(F.col("__w.start")).alias(TIME_COL)]
        sel += [F.col(t) for t in stmt.group_by_tags]
        sel += [planner._post_agg_expr(e).alias(nm) for nm, e in names]
        return agged.select(*sel)
