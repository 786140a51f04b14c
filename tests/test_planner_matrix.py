"""Systematic consistency matrix: every InfluxQL aggregate through the
planner must equal the directly-built DataFrame aggregation, across
grouping shapes (none / tag / time / time+tag) — a regression net over the
whole §2.4 matrix beyond the per-query goldens."""

import math

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.planner import influxql_df

AGGS = {
    "count": F.count, "sum": F.sum, "mean": F.avg, "min": F.min,
    "max": F.max, "median": F.median, "stddev": F.stddev,
    "spread": lambda c: F.max(c) - F.min(c),
    "mode": None,  # covered by agg_mode (tie-break specific)
    "first": None, "last": None,  # time-paired, covered by iq_first_last
}
GROUPINGS = ["none", "tag", "time", "time_tag"]


def _expected(df, fn, grouping):
    agg = fn(F.col("value")).alias("v")
    if grouping == "none":
        return {(): df.agg(agg).collect()[0]["v"]}
    if grouping == "tag":
        return {(r["type"],): r["v"]
                for r in df.groupBy("type").agg(agg).collect()}
    bucket = (F.col("time") - F.col("time") % (3_600_000_000_000)).alias("b")
    if grouping == "time":
        return {(r["b"],): r["v"]
                for r in df.groupBy(bucket).agg(agg).collect()}
    return {(r["b"], r["type"]): r["v"]
            for r in df.groupBy(bucket, "type").agg(agg).collect()}


@pytest.mark.parametrize("name", [k for k, v in AGGS.items() if v])
@pytest.mark.parametrize("grouping", GROUPINGS)
def test_agg_matrix(treasures, name, grouping):
    df = treasures.get("sharded", "treasures").df
    fn = AGGS[name]
    q = f"SELECT {name}(value) AS v FROM treasures"
    if grouping == "tag":
        q += " GROUP BY type"
    elif grouping == "time":
        q += " GROUP BY time(1h) fill(none)"
    elif grouping == "time_tag":
        q += " GROUP BY time(1h), type fill(none)"
    out = influxql_df(treasures, q, database="sharded")
    key_cols = {"none": [], "tag": ["type"], "time": ["time"],
                "time_tag": ["time", "type"]}[grouping]
    got = {tuple(r[k] for k in key_cols): r["v"] for r in out.collect()}
    exp = _expected(df, fn, grouping)
    if grouping in ("time", "time_tag"):
        # fill(none) drops buckets whose aggregate is null (e.g. stddev of
        # a single point) — InfluxDB emits no row for them
        exp = {k: v for k, v in exp.items() if v is not None}
    assert set(got) == set(exp), (name, grouping)
    for k in exp:
        e, g = exp[k], got[k]
        if e is None or g is None:
            assert e == g, (name, grouping, k)
        else:
            assert g == pytest.approx(e, nan_ok=True), (name, grouping, k)


TRANSFORMS = ["difference", "derivative", "cumulative_sum", "elapsed",
              "moving_average", "non_negative_difference"]


@pytest.mark.parametrize("name", TRANSFORMS)
@pytest.mark.parametrize("grouped", [True, False])
def test_transform_matrix(treasures, name, grouped):
    """Transforms through the InfluxQL planner equal the function-library
    results for both per-tag and whole-measurement (distributed-scan)
    shapes."""
    from influxdb_ha_spark.functions import transforms as T
    df = treasures.get("sharded", "treasures").df
    arg = {"moving_average": "(value, 2)", "derivative": "(value, 1s)",
           "elapsed": "(value, 1s)"}.get(name, "(value)")
    q = f"SELECT {name}{arg} AS v FROM treasures"
    by = ["type"] if grouped else []
    if grouped:
        q += " GROUP BY type"
    out = influxql_df(treasures, q, database="sharded").collect()
    kw = {"by": by} if by else {}
    if name == "moving_average":
        ref = T.moving_average(df, "value", 2, **kw)
    elif name == "derivative":
        ref = T.derivative(df, "value", unit_ns=10**9, **kw)
    elif name == "elapsed":
        ref = T.elapsed(df, unit_ns=10**9, **kw)
    elif name == "cumulative_sum":
        ref = T.cumulative_sum(df, "value", **kw)
    elif name == "non_negative_difference":
        ref = T.non_negative_difference(df, "value", **kw)
    else:
        ref = T.difference(df, "value", **kw)
    refcol = [c for c in ref.columns
              if c not in ("time", "type", "value")][0]
    exp = sorted((r["time"], r[refcol]) for r in ref.collect())
    got = sorted((r["time"], r["v"]) for r in out)
    assert len(got) == len(exp), (name, grouped)
    for (te, ve), (tg, vg) in zip(exp, got):
        assert te == tg and vg == pytest.approx(ve), (name, grouped)


def test_duplicate_unaliased_outer_transforms_get_suffix(treasures):
    """ADVICE r4: two outer transforms with the same default name over
    aggregates must emit `difference` and `difference_1` (the raw-multi
    path's suffixing), not silently overwrite one with the other."""
    q = ("SELECT difference(count(value)), difference(mean(value)) "
         "FROM treasures GROUP BY time(1h) fill(none)")
    out = influxql_df(treasures, q, database="sharded")
    assert "difference" in out.columns and "difference_1" in out.columns
    rows = out.orderBy("time").collect()
    assert len(rows) > 0
    # the two series differ (counts vs means), so the columns must not be
    # copies of each other
    assert any(r["difference"] != r["difference_1"] for r in rows)


def test_generated_suffix_avoids_explicit_alias(treasures):
    """A generated `_N` suffix must not collide with an explicit alias
    elsewhere in the SELECT: `mean(v), mean(v), mean(v) AS mean_1` used
    to emit two columns both named mean_1."""
    q = ("SELECT mean(value), mean(value), mean(value) AS mean_1 "
         "FROM treasures GROUP BY time(1d) fill(none)")
    out = influxql_df(treasures, q, database="sharded")
    names = out.columns
    assert len(names) == len(set(names)), names
    assert "mean" in names and "mean_1" in names
    # the generated name skipped to the next free suffix
    assert "mean_2" in names
