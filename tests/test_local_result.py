"""result.local_result hardening: driver-local rows become a VALUES
LocalRelation whose collect launches no job — and since values are
embedded as SQL literals, escaping must be injection-proof for arbitrary
query text (SHOW QUERIES embeds user-supplied statements verbatim)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from influxdb_ha_spark.result import local_result

SCHEMA = [("s", "STRING"), ("d", "DOUBLE"), ("i", "BIGINT"),
          ("b", "BOOLEAN")]

nasty = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),
    max_size=25)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(nasty,
              st.none() | st.floats(allow_nan=False, allow_infinity=False,
                                    width=32).map(float),
              st.integers(-2**62, 2**62),
              st.booleans()),
    max_size=4))
def test_local_result_roundtrip(spark, rows):
    got = local_result(spark, rows, SCHEMA).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in rows]


def test_local_result_injection_shapes(spark):
    """The classic breakers: quotes, backslashes, newlines, SQL syntax."""
    rows = [
        ("'; DROP TABLE x; --", 1.0, 1, True),
        ("O'Brien \\ \\' backslash-quote", None, -5, False),
        ("multi\nline\ttab", 0.5, 0, True),
        ("ends with backslash \\", 2.0, 9, False),
    ]
    got = local_result(spark, rows, SCHEMA).collect()
    assert [tuple(r) for r in got] == rows
    # empty result keeps schema and stays collectable
    empty = local_result(spark, [], SCHEMA)
    assert empty.columns == ["s", "d", "i", "b"] and empty.collect() == []


def test_local_result_is_job_free(spark):
    """The plan must be a LocalTableScan (executeCollect, no job) — the
    liveness property SHOW QUERIES/KILL QUERY depend on under load."""
    df = local_result(spark, [("q", 0.1, 1, True)], SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan and "Exchange" not in plan
