"""Grammar regression corpus: every statement shape the engine claims must
keep parsing (routing surface of SURVEY §2.11/§2.12 + extensions)."""

import pytest

from influxdb_ha_spark.influxql.parser import parse_query, parse_select

SELECTS = [
    "SELECT mean(value) FROM treasures WHERE time <= now() AND "
    "(type='gold' OR type='trash') GROUP BY time(1d) LIMIT 1",
    "SELECT sum(v), count(v) FROM m GROUP BY time(1h, 30m), host fill(0)",
    "SELECT top(v, 5), bottom(v, 5) FROM m GROUP BY region",
    "SELECT percentile(v, 99.9) FROM m",
    "SELECT derivative(mean(v), 10s) FROM m GROUP BY time(10s) fill(none)",
    "SELECT abs(round(mean(v) * -3.55)) FROM m",
    "SELECT * FROM rp.m WHERE time >= '2024-01-01T00:00:00Z'",
    "SELECT v FROM db.rp.m ORDER BY time DESC LIMIT 10 OFFSET 5 "
    "SLIMIT 3 SOFFSET 1",
    "SELECT mean(*) FROM m GROUP BY *",
    "SELECT /^val/ FROM m",
    "SELECT sum(/^v/) FROM m GROUP BY /^h/",
    "SELECT v::field FROM m GROUP BY host::tag",
    "SELECT max(c) FROM (SELECT count(v) AS c FROM m GROUP BY time(1d))",
    "SELECT count(v) FROM m1, m2",
    "SELECT count(v) FROM /^cpu/",
    "SELECT v FROM m WHERE host =~ /web\\d+/ AND host !~ /staging/",
    "SELECT mean(v) INTO agg_m FROM m GROUP BY time(5m)",
    "SELECT count(v) FROM m GROUP BY time(1d) fill(linear) "
    "tz('America/Chicago')",
    "SELECT elapsed(v, 1s) FROM m",
    "SELECT sample(v, 3) FROM m",
    "SELECT distinct(v) FROM m",
]

SHOWS = [
    "SHOW MEASUREMENTS", "SHOW MEASUREMENTS WITH MEASUREMENT =~ /cpu/",
    "SHOW DATABASES", "SHOW SERIES ON db FROM m",
    "SHOW TAG KEYS FROM m", "SHOW FIELD KEYS ON db",
    'SHOW TAG VALUES FROM m WITH KEY = "host"',
    'SHOW TAG VALUES FROM m WITH KEY IN ("host", "region") LIMIT 5',
    "SHOW TAG VALUES FROM m WITH KEY =~ /^h/",
    "SHOW RETENTION POLICIES ON db",
    "SHOW MEASUREMENTS LIMIT 10 OFFSET 2",
]


@pytest.mark.parametrize("q", SELECTS)
def test_select_grammar(q):
    stmt = parse_select(q)
    assert stmt.fields


@pytest.mark.parametrize("q", SHOWS)
def test_show_grammar(q):
    stmt = parse_query(q)
    assert stmt.what
