"""Property-based round-trip: format_point → parse_line recovers the point
exactly, for arbitrary measurement/tag/field content including characters
that require escaping (commas, spaces, equals, quotes, backslashes)."""

import math

from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.lineprotocol import format_point, parse_line

name = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r\\\"",
                           exclude_categories=("Cc",)),
    min_size=1, max_size=12).filter(lambda s: s.strip() == s and s)

field_val = st.one_of(
    st.integers(min_value=-2**62, max_value=2**62),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="\n\r",
                                   exclude_categories=("Cc",)), max_size=20))


@settings(max_examples=200, deadline=None)
@given(measurement=name.filter(lambda s: not s.startswith("#")),
       tags=st.dictionaries(name, name, max_size=3),
       fields=st.dictionaries(name, field_val, min_size=1, max_size=3),
       time_ns=st.integers(min_value=0, max_value=2**62))
def test_roundtrip(measurement, tags, fields, time_ns):
    line = format_point(measurement, tags, fields, time_ns)
    recs = parse_line(line)
    assert recs and all(r["error"] is None for r in recs), (line, recs)
    r0 = recs[0]
    assert r0["measurement"] == measurement
    assert r0["tags"] == tags
    assert r0["time"] == time_ns
    got = {}
    for r in recs:
        if r["f_int"] is not None:
            got[r["field_key"]] = r["f_int"]
        elif r["f_bool"] is not None:
            got[r["field_key"]] = r["f_bool"]
        elif r["f_float"] is not None:
            got[r["field_key"]] = r["f_float"]
        else:
            got[r["field_key"]] = r["f_str"]
    for k, v in fields.items():
        if isinstance(v, bool):
            assert got[k] is v
        elif isinstance(v, float):
            assert math.isclose(got[k], v, rel_tol=0, abs_tol=0) or got[k] == v
        else:
            assert got[k] == v


@settings(max_examples=200, deadline=None)
@given(ns=st.integers(min_value=0, max_value=2**62))
def test_time_literal_roundtrip(ns):
    """RFC3339 formatting ↔ parsing agree at µs fidelity (Spark timestamp
    precision; coordinator.go:32-42 RFC3339/epoch duality)."""
    from influxdb_ha_spark.timeutil import parse_time_literal_ns
    import datetime as dt
    us = (ns // 1000) * 1000
    iso = dt.datetime.fromtimestamp(us / 1e9, tz=dt.timezone.utc) \
        .strftime("%Y-%m-%dT%H:%M:%S")
    frac_us = (us // 1000) % 1_000_000
    lit = f"{iso}.{frac_us:06d}Z"
    got = parse_time_literal_ns(lit)
    assert abs(got - us) < 1000, (lit, got, us)


@given(t=st.integers(min_value=0, max_value=2**62),
       interval=st.integers(min_value=1, max_value=10**15),
       offset=st.integers(min_value=0, max_value=10**15))
@settings(max_examples=300, deadline=None)
def test_floor_bucket_matches_time_bucket_arithmetic(t, interval, offset):
    """fill.bucket_spine's python floor must equal timeutil.time_bucket's
    column arithmetic for every (t, interval, offset) — the invariant that
    keeps fill spines joinable to aggregated buckets (the round-2
    offset-spine bug class). Evaluated in pure python on both sides:
    time_bucket is (t-o) - pmod(t-o, i) + o with pmod ≥ 0."""
    from influxdb_ha_spark.functions.fill import _floor_bucket

    offset = offset % interval if interval else 0
    shifted = t - offset
    want = shifted - (shifted % interval) + offset  # python % is pmod for i>0
    assert _floor_bucket(t, interval, offset) == want
    b = _floor_bucket(t, interval, offset)
    assert b <= t < b + interval  # the bucket actually contains t
    assert (b - offset) % interval == 0  # and sits on the offset grid
