"""InfluxQL frontend tests: parser units + planner goldens.

The golden expectations replicate the reference's own test queries
(service/query_handler_test.go:11-49, coordinator_test.go:86-132 — via
FIXTURES.md §1), so parity with the reference is asserted directly.
"""

import pytest

from influxdb_ha_spark.influxql import parse_query, parse_select
from influxdb_ha_spark.influxql.ast import SelectStatement, ShowStatement
from influxdb_ha_spark.planner import PartitionKeyError, QueryError, influxql_df
from influxdb_ha_spark.timeutil import DAY, HOUR, MINUTE, parse_duration_ns

from .conftest import NOW


# -- parser ----------------------------------------------------------------

def test_parse_basic_select():
    s = parse_select(
        "SELECT mean(value) FROM treasures WHERE time <= now() AND "
        "(type='gold' OR type='trash') GROUP BY time(1d) LIMIT 1")
    assert isinstance(s, SelectStatement)
    assert s.group_by_time_ns == DAY
    assert s.limit == 1
    assert s.fields[0].expr.name == "mean"


def test_parse_durations():
    assert parse_duration_ns("90m") == 90 * MINUTE
    assert parse_duration_ns("1h30m") == HOUR + 30 * MINUTE
    assert parse_duration_ns("1w") == 7 * DAY


def test_parse_fill_variants():
    for arg, want in [("none", "none"), ("previous", "previous"),
                      ("linear", "linear"), ("0", 0), ("3.5", 3.5), ("null", None)]:
        s = parse_select(f"SELECT sum(v) FROM m GROUP BY time(1h) fill({arg})")
        assert s.fill == want, arg


def test_parse_slimit_order_into():
    s = parse_select("SELECT mean(v) INTO dst FROM src GROUP BY time(1h), host "
                     "ORDER BY time DESC LIMIT 5 OFFSET 2 SLIMIT 3 SOFFSET 1")
    assert s.into.name == "dst"
    assert s.order_desc and s.limit == 5 and s.offset == 2
    assert s.slimit == 3 and s.soffset == 1
    assert s.group_by_tags == ["host"]


def test_parse_show():
    s = parse_query("SHOW MEASUREMENTS ON mydb")
    assert isinstance(s, ShowStatement) and s.what == "MEASUREMENTS"
    s = parse_query("SHOW TAG KEYS FROM cpu")
    assert s.what == "TAG KEYS" and s.measurement == "cpu"
    s = parse_query("SHOW TAG VALUES FROM cpu WITH KEY = host")
    assert s.with_key == "host"


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse_select("SELECT mean(value FROM t")
    with pytest.raises(SyntaxError):
        parse_select("SELECT mean(v) FROM t ORDER BY value")


# -- planner goldens (reference query_handler_test.go) ---------------------

def _run(cat, q, **kw):
    return influxql_df(cat, q, database="sharded", now_ns=NOW, **kw)


def test_mean_two_partitions(treasures):
    # query_handler_test.go:11-16 — values 100 (gold) & 0 (trash) in the
    # first bucket → mean 50 merged across the two partitioned tags
    rows = _run(treasures,
                "SELECT mean(value) FROM treasures WHERE time <= now() AND "
                "time > now() - 2d AND (type='gold' OR type='trash') "
                "GROUP BY time(5d) LIMIT 1").collect()
    assert len(rows) == 1
    assert rows[0]["mean"] == 50.0


def test_mean_single_partition(treasures):
    rows = _run(treasures,
                "SELECT mean(value) FROM treasures WHERE type='trash'").collect()
    assert rows[0]["mean"] == 0.0


def test_raw_merge_sorted(treasures):
    # query_handler_test.go:30-36 — columns [time, value], time-ascending
    df = _run(treasures, "SELECT value FROM treasures WHERE time <= now()")
    assert df.columns == ["time", "value"]
    vals = [r["time"] for r in df.collect()]
    assert vals == sorted(vals)


def test_raw_with_time_group_is_error(treasures):
    # query_handler_test.go:45-49 — 400
    with pytest.raises(QueryError):
        _run(treasures,
             "SELECT value FROM treasures WHERE time > now() - 5m GROUP BY time(1m)")


def test_expression_over_aggregate(treasures):
    # coordinator_test.go:114-120 — abs(round(mean * -3.55))
    rows = _run(treasures,
                "SELECT abs(round(mean(value) * -3.55)) FROM treasures "
                "WHERE type='gold'").collect()
    # mean(gold)=80 → 80*-3.55=-284 → abs(round)=284
    assert rows[0][0] == 284.0


def test_max_spread_by_tag(treasures):
    rows = {r["type"]: r for r in _run(
        treasures, "SELECT max(value), spread(value) FROM treasures "
                   "GROUP BY type").collect()}
    assert rows["gold"]["max"] == 100.0
    assert rows["gold"]["spread"] == 40.0
    assert rows["silver"]["spread"] == 48.0


def test_top_bottom(treasures):
    rows = _run(treasures, "SELECT top(value, 2) FROM treasures").collect()
    # top-2 values, emitted in time order (100@t0, 60@t0+2h)
    assert [r["top"] for r in rows] == [100.0, 60.0]
    rows = _run(treasures, "SELECT bottom(value, 1) FROM treasures").collect()
    assert [r["bottom"] for r in rows] == [0.0]


def test_distinct(treasures):
    rows = _run(treasures, "SELECT distinct(value) FROM treasures").collect()
    assert sorted(r[0] for r in rows) == [0.0, 2.0, 50.0, 60.0, 100.0]


def test_strict_partition_key(treasures):
    with pytest.raises(PartitionKeyError):
        _run(treasures, "SELECT mean(value) FROM treasures",
             strict_partition_key=True)
    # covering the key is fine
    _run(treasures, "SELECT mean(value) FROM treasures WHERE type='gold'",
         strict_partition_key=True).collect()


def test_order_desc_and_offset(treasures):
    rows = _run(treasures,
                "SELECT value FROM treasures ORDER BY time DESC LIMIT 2 OFFSET 1"
                ).collect()
    assert len(rows) == 2
    times = [r["time"] for r in rows]
    assert times == sorted(times, reverse=True)


def test_compat_div_by_zero(treasures):
    # query_merge.go:319-323 — div0 → 0 under compat, null otherwise
    rows = _run(treasures,
                "SELECT sum(value) / (count(value) - count(value)) FROM treasures "
                "WHERE type='gold'", compat=True).collect()
    assert rows[0][0] == 0.0


def test_fill_previous_and_linear(treasures):
    q = ("SELECT sum(value) FROM treasures WHERE type='gold' AND "
         f"time >= {NOW - DAY} AND time < {NOW - DAY + 6 * HOUR} "
         "GROUP BY time(1h) fill(previous)")
    rows = _run(treasures, q).collect()
    # NOW is not hour-aligned, so the spine starts at the bucket containing
    # the range start → 7 buckets cover [start, start+6h)
    assert len(rows) == 7
    assert [r["sum"] for r in rows] == [100.0, 100.0, 60.0, 60.0, 60.0, 60.0, 60.0]


def test_regex_tag_predicate(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures, "SELECT sum(value) AS s FROM treasures "
                      "WHERE type =~ /^(gold|silver)$/ GROUP BY type",
                      database="sharded")
    got = {r["type"]: r["s"] for r in out.collect()}
    assert got == {"gold": 160.0, "silver": 52.0}
    out = influxql_df(treasures, "SELECT sum(value) AS s FROM treasures "
                      "WHERE type !~ /l/ GROUP BY type", database="sharded")
    assert {r["type"] for r in out.collect()} == {"trash"}


def test_regex_from_source(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures, "SELECT count(value) AS n FROM /^trea/",
                      database="sharded")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 5 and rows[0]["measurement"] == "treasures"


def test_regex_division_not_confused():
    from influxdb_ha_spark.influxql.parser import parse_select
    stmt = parse_select("SELECT sum(a) / sum(b) FROM m WHERE c =~ /x\\/y/")
    assert stmt.where.rhs.pattern == "x/y"


def test_subquery_source(treasures):
    """InfluxQL subquery (unsupported in the reference, README.md:190-194):
    outer aggregate over an inner per-tag aggregate."""
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(
        treasures,
        "SELECT max(s) AS max_per_type FROM "
        "(SELECT sum(value) AS s FROM treasures GROUP BY type)",
        database="sharded")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["max_per_type"] == 160.0


def test_subquery_raw_filter(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(
        treasures,
        "SELECT count(value) AS n FROM "
        "(SELECT value FROM treasures WHERE type = 'gold')",
        database="sharded")
    assert out.collect()[0]["n"] == 2


def test_wildcard_aggregate_expansion(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures, "SELECT mean(*) FROM treasures GROUP BY type",
                      database="sharded")
    assert "mean_value" in out.columns
    got = {r["type"]: r["mean_value"] for r in out.collect()}
    assert got["gold"] == 80.0


def test_from_measurement_list(treasures):
    """FROM m1, m2 — rejected by the reference on partitioned data
    (README.md:196-200); here a per-measurement union."""
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures,
                      "SELECT count(value) AS n FROM treasures, treasures",
                      database="sharded")
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["n"] == 5 and r["measurement"] == "treasures" for r in rows)


def test_tz_clause_daily_buckets(spark):
    """tz('America/Chicago'): daily buckets align to local midnight
    (UTC-6 in winter), not UTC midnight."""
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.planner import influxql_df
    # 2024-01-10T05:00Z = Jan 9 23:00 Chicago; 2024-01-10T07:00Z = Jan 10 01:00
    t1 = 1704862800000000000  # 2024-01-10T05:00:00Z
    t2 = t1 + 2 * 3_600_000_000_000
    df = spark.createDataFrame([(t1, "a", 1.0), (t2, "a", 2.0)],
                               "time long, tag string, value double")
    cat = Catalog(spark)
    cat.register_dataframe("db", "m", df, time_col="time", tags=["tag"])
    out = influxql_df(cat, "SELECT sum(value) AS s FROM m "
                      "GROUP BY time(1d) fill(none) tz('America/Chicago')",
                      database="db")
    rows = {r["time"]: r["s"] for r in out.collect()}
    jan9_local_midnight_utc = 1704780000000000000   # 2024-01-09T06:00:00Z
    jan10_local_midnight_utc = 1704866400000000000  # 2024-01-10T06:00:00Z
    assert rows == {jan9_local_midnight_utc: 1.0,
                    jan10_local_midnight_utc: 2.0}
    # without tz both points land in the same UTC day
    out2 = influxql_df(cat, "SELECT sum(value) AS s FROM m "
                       "GROUP BY time(1d) fill(none)", database="db")
    assert len(out2.collect()) == 1


def test_unknown_field_returns_empty(treasures):
    """InfluxDB returns an empty result (not an error) for a nonexistent
    field."""
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures, "SELECT nosuch FROM treasures",
                      database="sharded")
    assert out.count() == 0
    out = influxql_df(treasures, "SELECT mean(nosuch) AS m FROM treasures",
                      database="sharded")
    assert out.count() == 0 and "m" in out.columns


def test_quoted_identifiers_and_strings(spark):
    """Double-quoted identifiers (weird names), single-quoted strings."""
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.planner import influxql_df
    df = spark.createDataFrame([(1, "x y", 1.0)],
                               "time long, `weird tag` string, value double")
    cat = Catalog(spark)
    cat.register_dataframe("db", "m", df, time_col="time",
                           tags=["weird tag"])
    out = influxql_df(cat, 'SELECT value FROM m WHERE "weird tag" = \'x y\'',
                      database="db")
    assert out.count() == 1


def test_negative_and_scientific_literals(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures,
                      "SELECT sum(value) * -1.5e-1 AS s FROM treasures",
                      database="sharded")
    assert out.collect()[0]["s"] == pytest.approx(-31.8)


def test_multi_statement_parse_query():
    from influxdb_ha_spark.influxql.parser import parse_query
    stmt = parse_query("SELECT mean(v) FROM m;")
    assert stmt.fields[0].expr.name == "mean"


def test_type_annotations(treasures):
    """`value::field` / `type::tag` annotations parse and behave like the
    bare identifiers (the engine schema is already typed)."""
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures,
                      "SELECT sum(value::field) AS s FROM treasures "
                      "GROUP BY type::tag", database="sharded")
    got = {r["type"]: r["s"] for r in out.collect()}
    assert got["gold"] == 160.0


def test_regex_field_selection(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures, "SELECT /^val/ FROM treasures LIMIT 2",
                      database="sharded")
    assert "value" in out.columns
    assert out.count() == 2
    agg = influxql_df(treasures, "SELECT sum(/^val/) FROM treasures "
                      "GROUP BY type", database="sharded")
    got = {r["type"]: r["sum_value"] for r in agg.collect()}
    assert got["gold"] == 160.0


def test_group_by_regex_tags(treasures):
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures,
                      "SELECT sum(value) AS s FROM treasures GROUP BY /^ty/",
                      database="sharded")
    got = {r["type"]: r["s"] for r in out.collect()}
    assert got == {"gold": 160.0, "silver": 52.0, "trash": 0.0}


def test_top_with_tag_key(treasures):
    """top(value, tag, N): the N best series-extremes, tag returned with
    each point (the reference's acknowledged TODO, coordinator.go:143-147)."""
    from influxdb_ha_spark.planner import influxql_df
    out = influxql_df(treasures,
                      "SELECT top(value, type, 2) AS top FROM treasures",
                      database="sharded")
    rows = [(r["type"], r["top"]) for r in out.collect()]
    assert sorted(rows) == [("gold", 100.0), ("silver", 50.0)]
    out = influxql_df(treasures,
                      "SELECT bottom(value, type, 2) AS b FROM treasures",
                      database="sharded")
    rows = [(r["type"], r["b"]) for r in out.collect()]
    assert sorted(rows) == [("silver", 2.0), ("trash", 0.0)]


def test_multi_transform_select(spark):
    """Round-4 planner fix: several transforms in one SELECT join on
    (time, tags); a plain aggregate riding with a transform keeps its
    own column name (it used to leak __inner_N and get dropped), and
    rider rows keep nulls where a transform is undefined."""
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.planner import influxql_df
    rows = [("a", i * 1000, float(v)) for i, v in
            enumerate([1.0, 4.0, 2.0, 8.0])]
    df = spark.createDataFrame(rows, "s string, time long, value double")
    cat = Catalog(spark)
    cat.register_dataframe("db", "m", df, time_col="time", tags=["s"])
    out = influxql_df(
        cat, "SELECT difference(value), moving_average(value, 2) FROM m",
        "db").collect()
    got = {r["time"]: (r["difference"], r["moving_average"]) for r in out}
    # difference starts at the 2nd point; ma(2) too — full outer join
    # keeps every time where either is defined
    assert got == {1000: (3.0, 2.5), 2000: (-2.0, 3.0), 3000: (6.0, 5.0)}
    # rider aggregate keeps its name next to a transform-over-aggregate
    rows2 = [("a", i * 1_000_000_000, float(i)) for i in range(4)]
    df2 = spark.createDataFrame(rows2, "s string, time long, value double")
    cat.register_dataframe("db", "m2", df2, time_col="time", tags=["s"])
    out2 = influxql_df(
        cat, "SELECT count(value), difference(count(value)) FROM m2 "
             "GROUP BY time(2s) fill(none)", "db").collect()
    assert sorted(out2[0].asDict()) == ["count", "difference", "time"]
    vals = {r["time"]: (r["count"], r["difference"]) for r in out2}
    assert vals == {0: (2, None), 2_000_000_000: (2, 0)}
    # duplicate unaliased transforms get InfluxDB's _N suffix
    out3 = influxql_df(
        cat, "SELECT difference(value), difference(value) FROM m", "db")
    assert out3.columns == ["time", "difference", "difference_1"]
