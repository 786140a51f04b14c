"""InfluxDB data model on Spark: databases, measurements, tags, fields, series.

Reference model (SURVEY.md §1.1): a measurement holds points = (time ns,
tag set, field set); tags are string dimensions (the only columns allowed in
partition keys — cluster/partitioner.go:208-232), fields are typed values,
and a *series* is a unique (measurement, tagset) combination — the unit the
reference distributes by consistent hashing (README.md:4-6).

Spark mapping: one DataFrame/table per measurement, long format:
``time LongType(ns)`` + tag columns (StringType) + field columns. Tag/field
kind is carried in engine metadata (not guessable from data) so the SHOW
surface answers from schema, like the reference reconstructs via
`SHOW TAG KEYS` (syncing/importer.go:369-391, 596-612). The partition key
becomes the table's physical partition columns → Catalyst partition pruning
replaces hash routing (coordinator.go:304-362).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .timeutil import timestamp_to_ns

TIME_COL = "time"


def _is_utc_zone(tz: str | None) -> bool:
    """True iff the session-timezone spelling denotes UTC (offset 0).

    Resolved by offset, not by a spelling whitelist (ADVICE r4): named
    zones go through zoneinfo ('Etc/GMT', 'GMT0', 'UCT', 'Zulu', …) and
    fixed-offset forms are parsed ('Z', '+00:00', '-0:00', 'UTC+00').
    Zones with historical non-zero offsets but current offset 0 (none in
    tzdata's UTC aliases) would need full-history inspection; checking a
    fixed instant matches how Spark resolves NTZ wall-clocks at read."""
    if not tz:
        return False
    s = tz.strip()
    import re
    m = re.fullmatch(r"(?:UTC|GMT|UT)?([+-])?(\d{1,2})(?::(\d{1,2}))?"
                     r"(?::(\d{1,2}))?", s)
    if m and (m.group(1) or m.group(2)):
        return all(int(g or 0) == 0 for g in m.groups()[1:])
    # compact forms ZoneOffset.of accepts: +HHMM / +HHMMSS (r5: '+0000'
    # previously fell through to zoneinfo, which rejects it)
    m = re.fullmatch(r"(?:UTC|GMT|UT)?([+-])(\d{4}|\d{6})", s)
    if m:
        return int(m.group(2)) == 0
    if s in ("Z", "UTC", "GMT", "UT"):
        return True
    try:
        from datetime import datetime
        from zoneinfo import ZoneInfo
        off = datetime(2020, 1, 1, tzinfo=ZoneInfo(s)).utcoffset()
        return off is not None and off.total_seconds() == 0
    except Exception:
        return False


@dataclass
class Measurement:
    """A measurement: schema roles + a DataFrame provider."""

    name: str
    database: str
    tags: list[str]
    fields: list[str]
    df: DataFrame
    retention_policy: str = "autogen"
    path: str | None = None  # physical location when hive-partitioned

    def series_df(self) -> DataFrame:
        """SHOW SERIES: distinct tag combinations (importer.go FetchSeries,
        syncing/series.go:14-29 — `measurement,tag1=v1,...` keys)."""
        if not self.tags:
            return self.df.sparkSession.createDataFrame([(self.name,)], ["key"])
        key = F.concat_ws(",", F.lit(self.name), *[
            F.concat_ws("=", F.lit(t), F.col(t)) for t in self.tags])
        return (self.df.select(*self.tags).distinct()
                .select(key.alias("key")).orderBy("key"))


@dataclass
class PartitionKey:
    """Admin-defined ordered tag list (cluster/partitioner.go:208-232).

    Measurement-level key wins over database-level (partitioner.go:131-137).
    """

    database: str
    measurement: str  # "" = database-level key
    tags: list[str]


class Catalog:
    """Engine catalog: databases → measurements, partition keys, RPs.

    Replaces the reference's etcd-backed meta storages (partition keys:
    cluster/partitioner.go:145-206; RPs: syncing/models.go:3-9) with an
    in-process registry; on a real deployment this would be a metastore.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.databases: dict[str, dict[str, Measurement]] = {}
        self.partition_keys: list[PartitionKey] = []
        self.retention_policies: dict[str, list[dict]] = {}
        self.replication_factors: dict[str, int] = {"": 2}  # resolver.go:36 default 2

    # -- registration -----------------------------------------------------
    def register(self, m: Measurement) -> None:
        self.databases.setdefault(m.database, {})[m.name] = m

    def register_dataframe(self, database: str, name: str, df: DataFrame,
                           time_col: str, tags: list[str],
                           fields: list[str] | None = None) -> Measurement:
        """Adopt an arbitrary DataFrame as a measurement.

        `time_col` may be LongType ns already or a TimestampType to convert.
        Everything not time/tag becomes a field unless `fields` is given.
        """
        dtype = dict(df.dtypes)[time_col]
        if dtype == "timestamp_ntz":
            # A TIMESTAMP_NTZ wall-clock is interpreted in the session
            # timezone when cast to LTZ (timeutil.timestamp_to_ns). The
            # engine's convention (and the DuckDB oracle's epoch_ns) is
            # UTC; under any other session zone the ns values would shift
            # silently. Fail loudly instead (ADVICE r3).
            tz = self.spark.conf.get("spark.sql.session.timeZone")
            if not _is_utc_zone(tz):
                raise ValueError(
                    f"register_dataframe: time column {time_col!r} is "
                    f"TIMESTAMP_NTZ but spark.sql.session.timeZone={tz!r}; "
                    "NTZ wall-clocks are read as UTC instants — set the "
                    "session timezone to UTC (session.get_spark does) or "
                    "convert to epoch-ns yourself before registering")
        if dtype in ("timestamp", "timestamp_ntz"):
            df = df.withColumn(TIME_COL, timestamp_to_ns(F.col(time_col)))
            if time_col != TIME_COL:
                df = df.drop(time_col)
        elif time_col != TIME_COL:
            df = df.withColumnRenamed(time_col, TIME_COL)
        if fields is None:
            fields = [c for c in df.columns if c != TIME_COL and c not in tags]
        m = Measurement(name=name, database=database, tags=list(tags),
                        fields=list(fields), df=df)
        self.register(m)
        return m

    # -- lookup -----------------------------------------------------------
    def get(self, database: str, name: str) -> Measurement:
        try:
            return self.databases[database][name]
        except KeyError:
            raise KeyError(f"measurement not found: {database}.{name}") from None

    def partition_key_for(self, database: str, measurement: str) -> PartitionKey | None:
        """Measurement-level key beats db-level (partitioner.go:131-137)."""
        db_key = None
        for pk in self.partition_keys:
            if pk.database != database:
                continue
            if pk.measurement == measurement:
                return pk
            if pk.measurement == "":
                db_key = pk
        return db_key

    # -- SHOW surface (routing.go:121-135 first-available statements) -----
    def show_databases(self) -> DataFrame:
        # explicit schema: [] with list-of-column-names cannot infer types
        return self.spark.createDataFrame(
            [(d,) for d in sorted(self.databases)], "name string")

    def show_measurements(self, database: str) -> DataFrame:
        return self.spark.createDataFrame(
            [(m,) for m in sorted(self.databases.get(database, {}))],
            "name string")

    def show_tag_keys(self, database: str, measurement: str | None = None) -> DataFrame:
        rows = []
        for name, m in sorted(self.databases.get(database, {}).items()):
            if measurement and name != measurement:
                continue
            rows += [(name, t) for t in m.tags]
        return self.spark.createDataFrame(rows or [], "measurement string, tagKey string")

    def show_field_keys(self, database: str, measurement: str | None = None) -> DataFrame:
        rows = []
        for name, m in sorted(self.databases.get(database, {}).items()):
            if measurement and name != measurement:
                continue
            dtypes = dict(m.df.dtypes)
            rows += [(name, f, dtypes.get(f, "unknown")) for f in m.fields]
        return self.spark.createDataFrame(
            rows or [], "measurement string, fieldKey string, fieldType string")

    def show_tag_values(self, database: str, measurement: str, tag: str) -> DataFrame:
        m = self.get(database, measurement)
        return (m.df.select(F.lit(tag).alias("key"), F.col(tag).alias("value"))
                .distinct().orderBy("value"))

    def show_series(self, database: str, measurement: str | None = None) -> DataFrame:
        dfs = [m.series_df() for name, m in
               sorted(self.databases.get(database, {}).items())
               if measurement is None or name == measurement]
        if not dfs:
            return self.spark.createDataFrame([], "key string")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables (TESTDATA.md) as DataFrames."""
    names = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out


def events_measurement(spark: SparkSession, sf_dir: str) -> tuple[Catalog, Measurement]:
    """Register the driver `events` table as a measurement.

    Role mapping per FIXTURES.md §6: ts → time (ns), event_type → tag,
    value → field; event_id/user_id/props ride along as fields.
    """
    cat = Catalog(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    m = cat.register_dataframe("default", "events", df, time_col="ts",
                               tags=["event_type"],
                               fields=["value", "event_id", "user_id", "props"])
    cat.partition_keys.append(PartitionKey("default", "events", ["event_type"]))
    return cat, m
