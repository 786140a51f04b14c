"""Catalog / data-model / meta-surface tests (SURVEY §2.11 SHOW statements)."""

import os

import pytest

from influxdb_ha_spark.model import Catalog, PartitionKey, events_measurement

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cat(spark):
    c, _ = events_measurement(spark, SF)
    return c


def test_show_measurements(cat):
    names = [r["name"] for r in cat.show_measurements("default").collect()]
    assert names == ["events"]


def test_show_tag_and_field_keys(cat):
    tags = [(r["measurement"], r["tagKey"])
            for r in cat.show_tag_keys("default").collect()]
    assert tags == [("events", "event_type")]
    fields = {r["fieldKey"]: r["fieldType"]
              for r in cat.show_field_keys("default", "events").collect()}
    assert fields["value"] == "double"


def test_show_tag_values(cat):
    vals = [r["value"] for r in
            cat.show_tag_values("default", "events", "event_type").collect()]
    assert "click" in vals and vals == sorted(vals)


def test_show_series_keys(cat):
    keys = [r["key"] for r in cat.show_series("default", "events").collect()]
    assert all(k.startswith("events,event_type=") for k in keys)
    assert len(keys) == 5


def test_partition_key_precedence(spark):
    c = Catalog(spark)
    c.partition_keys.append(PartitionKey("db", "", ["region"]))
    c.partition_keys.append(PartitionKey("db", "cpu", ["host"]))
    # measurement-level wins (partitioner.go:131-137)
    assert c.partition_key_for("db", "cpu").tags == ["host"]
    assert c.partition_key_for("db", "mem").tags == ["region"]


def test_ns_time_column(cat):
    m = cat.get("default", "events")
    dt = dict(m.df.dtypes)
    assert dt["time"] == "bigint"
    t = m.df.selectExpr("min(time) AS t").first()["t"]
    assert t > 1_700_000_000_000_000_000  # ns magnitude, not µs/ms


def test_register_ntz_requires_utc_session(spark):
    """ADVICE r3: a TIMESTAMP_NTZ time column under a non-UTC session
    timezone must fail loudly instead of silently shifting ns values."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2020-01-01 00:00:00' AS ts, 1.0 AS value")
    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        cat = Catalog(spark)
        with pytest.raises(ValueError, match="timeZone"):
            cat.register_dataframe("default", "ntz_m", df, "ts", tags=[])
    finally:
        spark.conf.set(tz_key, old)
    # back under UTC the same frame registers fine and lands on the epoch
    cat = Catalog(spark)
    m = cat.register_dataframe("default", "ntz_m", df, "ts", tags=[])
    assert m.df.collect()[0]["time"] == 1577836800_000_000_000


def test_utc_zone_spellings():
    """ADVICE r4: the NTZ guard resolves UTC by offset, not by a spelling
    whitelist — every UTC alias passes, every non-zero offset fails."""
    from influxdb_ha_spark.model import _is_utc_zone
    for z in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "Etc/GMT", "GMT0",
              "UCT", "Zulu", "UT", "+0:00", "-00:00", "UTC+00", "GMT+0:00",
              "Etc/Zulu", "Etc/Universal",
              # compact ZoneOffset forms (r5 review fix)
              "+0000", "-0000", "UTC+0000", "+000000"):
        assert _is_utc_zone(z), z
    for z in ("America/New_York", "Europe/Oslo", "+05:30", "-08:00",
              "GMT+1", "Etc/GMT-2", "Asia/Kolkata", "", None, "Not/AZone",
              "+0100", "UTC-0530", "+010000"):
        assert not _is_utc_zone(z), z
