"""Per-statement privilege checks + HTTP error mapping.

Mirrors the reference's checkAccess loop (service/query_handler.go:90-114)
and its statement-level RequiredPrivileges: a READ-only user must not be
able to run user-management/DDL statements (admin), mutations (WRITE), or
SELECT INTO (READ+WRITE); error classes map to the reference's HTTP codes
(409 duplicate — admin.go:108-112; 403 permission; 400 client error)."""

import base64
import json
import urllib.error
import urllib.request

import pytest

from influxdb_ha_spark.http_server import serve
from influxdb_ha_spark.model import Catalog
from influxdb_ha_spark.server import Engine, statement_privileges


@pytest.fixture()
def http(spark):
    cat = Catalog(spark)
    cat.register_dataframe(
        "db0", "m0",
        spark.createDataFrame([(1, "a", 1.0)],
                              "time long, type string, value double"),
        time_col="time", tags=["type"], fields=["value"])
    engine = Engine(cat, database="db0")
    srv, port = serve(engine)
    yield f"http://127.0.0.1:{port}", engine
    srv.shutdown()


def _query(base, q, user=None, pw=None):
    url = base + "/query?db=db0&q=" + urllib.request.quote(q)
    headers = {}
    if user is not None:
        creds = base64.b64encode(f"{user}:{pw}".encode()).decode()
        headers["Authorization"] = f"Basic {creds}"
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read() or b"{}")


def _code(base, q, user=None, pw=None):
    try:
        return _query(base, q, user, pw)[0]
    except urllib.error.HTTPError as e:
        return e.code


def test_statement_privileges_classifier():
    assert statement_privileges("SELECT * FROM m") == ["READ"]
    assert statement_privileges("SHOW MEASUREMENTS") == ["READ"]
    assert statement_privileges(
        "SELECT mean(v) INTO dst FROM src GROUP BY time(1h)") == \
        ["READ", "WRITE"]
    for q in ("DELETE FROM m WHERE time < 5", "DROP SERIES FROM m",
              "DROP MEASUREMENT m"):
        assert statement_privileges(q) == ["WRITE"], q
    for q in ("CREATE USER u WITH PASSWORD 'x'", "DROP USER u",
              "SET PASSWORD FOR u = 'x'", "GRANT READ ON db TO u",
              "REVOKE READ ON db FROM u", "SHOW USERS",
              "CREATE DATABASE d", "DROP DATABASE d",
              "CREATE RETENTION POLICY rp ON d DURATION 1d REPLICATION 1",
              "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT 1 END",
              "SHOW SUBSCRIPTIONS", "SHOW PARTITION KEYS",
              "CREATE PARTITION KEY type ON db.m",
              "BACKUP * TO /tmp/bk", "BACKUP db.m TO s3://bucket/"):
        assert statement_privileges(q) == ["admin"], q


def test_read_user_cannot_escalate(http):
    """The round-2 fix: a READ-only user could previously run CREATE USER
    WITH ALL PRIVILEGES (and every other management statement) through
    /query."""
    base, engine = http
    engine.admin.create_user("boss", "pw", admin=True)
    engine.admin.create_user("reader", "r", admin=False)
    engine.admin.grant("reader", "db0", "READ")

    assert _code(base, "SELECT count(value) AS n FROM m0",
                 "reader", "r") == 200
    for q in ("CREATE USER evil WITH PASSWORD 'x' WITH ALL PRIVILEGES",
              "GRANT ALL ON db0 TO reader",
              "SET PASSWORD FOR boss = 'owned'",
              "DROP USER boss",
              "DROP DATABASE db0",
              "DELETE FROM m0",
              "SELECT value INTO stolen FROM m0"):
        assert _code(base, q, "reader", "r") == 403, q
    assert "evil" not in engine.admin.users
    # boss still does all of it
    assert _code(base, "SHOW USERS", "boss", "pw") == 200
    assert _code(base, "GRANT WRITE ON db0 TO reader", "boss", "pw") == 200
    # with WRITE granted, DELETE works but admin statements still don't
    assert _code(base, "DELETE FROM m0 WHERE time > 99999", "reader", "r") == 200
    assert _code(base, "SHOW USERS", "reader", "r") == 403


def test_first_admin_bootstrap_over_http(http):
    """query_handler.go:100-105: while no admin exists, CREATE USER …
    WITH ALL PRIVILEGES passes without credentials; a non-admin first
    user is rejected 403 (PermissionError mapping)."""
    base, engine = http
    assert _code(base, "CREATE USER first WITH PASSWORD 'p'") == 403
    assert _code(base,
                 "CREATE USER root WITH PASSWORD 'p' WITH ALL PRIVILEGES") == 200
    assert engine.admin.users["root"]["admin"]
    # now auth is active: anonymous is 401, root works
    assert _code(base, "SHOW USERS") == 401
    assert _code(base, "SHOW USERS", "root", "p") == 200


def test_error_code_mapping(http):
    base, engine = http
    engine.admin.create_user("root", "p", admin=True)
    # duplicate user → 409 (ConflictError, admin.go:108-112)
    assert _code(base, "CREATE USER root WITH PASSWORD 'q'",
                 "root", "p") == 409
    # unknown user in GRANT / SET PASSWORD → 400 (KeyError)
    assert _code(base, "GRANT READ ON db0 TO ghost", "root", "p") == 400
    assert _code(base, "SET PASSWORD FOR ghost = 'x'", "root", "p") == 400
    # duplicate partition key → 409 (ClusterQL ConflictError)
    assert _code(base, "CREATE PARTITION KEY type ON db0.m0",
                 "root", "p") == 200
    assert _code(base, "CREATE PARTITION KEY type ON db0.m0",
                 "root", "p") == 409
    # bad time literal → 400, not a dropped connection
    assert _code(base, "SELECT value FROM m0 WHERE time >= '20x4-01-01'",
                 "root", "p") == 400


def test_ns_precision_time_literal():
    from influxdb_ha_spark.errors import QueryError
    from influxdb_ha_spark.timeutil import parse_time_literal_ns
    assert parse_time_literal_ns("'2023-01-01T00:00:00.123456789Z'") == \
        1672531200_123456789
    assert parse_time_literal_ns("2023-01-01T00:00:00.5Z") == \
        1672531200_500000000
    assert parse_time_literal_ns("2023-01-01") == 1672531200 * 10**9
    with pytest.raises(QueryError):
        parse_time_literal_ns("not-a-time")
    with pytest.raises(QueryError):
        parse_time_literal_ns("2023-13-45T00:00:00Z")
