"""End-to-end HTTP façade tests: /ping, /write (line protocol, gzip,
precision), /query (JSON shape, multi-statement, errors) — the reference's
three routes (service/server.go:31-35)."""

import gzip
import json
import urllib.error
import urllib.request

import pytest

from influxdb_ha_spark.http_server import serve
from influxdb_ha_spark.model import Catalog, PartitionKey
from influxdb_ha_spark.server import Engine


@pytest.fixture(scope="module")
def http(spark):
    cat = Catalog(spark)
    cat.partition_keys.append(PartitionKey("sharded", "treasures", ["type"]))
    engine = Engine(cat, database="sharded")
    srv, port = serve(engine)
    yield f"http://127.0.0.1:{port}", engine
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.headers, r.read()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers, r.read()


def test_ping(http):
    base, _ = http
    status, headers, _ = _get(base + "/ping")
    assert status == 204
    assert "influxdb" in headers["X-Influxdb-Version"].lower()


def test_write_then_query_roundtrip(http):
    base, _ = http
    body = (b"treasures,type=gold value=100 1500000000000000000\n"
            b"treasures,type=gold value=60 1500000000000000001\n"
            b"treasures,type=trash value=0 1500000000000000002\n")
    status, _, _ = _post(base + "/write?db=sharded", body)
    assert status == 204
    status, _, out = _get(base + "/query?db=sharded&q=" +
                          urllib.request.quote(
                              "SELECT sum(value) AS s FROM treasures "
                              "GROUP BY type"))
    assert status == 200
    res = json.loads(out)["results"][0]
    by_tag = {s["tags"]["type"]: s["values"][0] for s in res["series"]}
    assert by_tag["gold"][-1] == 160.0 and by_tag["trash"][-1] == 0.0


def test_write_gzip_and_precision(http):
    base, _ = http
    raw = b"treasures,type=silver value=5 1500000001\n"
    status, _, _ = _post(base + "/write?db=sharded&precision=s",
                         gzip.compress(raw),
                         {"Content-Encoding": "gzip"})
    assert status == 204
    status, _, out = _get(base + "/query?db=sharded&epoch=ns&q=" +
                          urllib.request.quote(
                              "SELECT value FROM treasures "
                              "WHERE type='silver'"))
    vals = json.loads(out)["results"][0]["series"][0]["values"]
    assert vals[0][0] == 1500000001_000_000_000  # seconds → ns


def test_write_missing_db_is_400(http):
    base, _ = http
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/write", b"m v=1")
    assert e.value.code == 400


def test_write_partition_key_violation_is_400(http):
    base, _ = http
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/write?db=sharded", b"treasures value=1 1500000000000000005")
    assert e.value.code == 400
    assert "partition key" in json.loads(e.value.read())["error"]


def test_query_multi_statement_and_errors(http):
    base, _ = http
    q = "SELECT count(value) AS n FROM treasures; SHOW MEASUREMENTS"
    status, _, out = _get(base + "/query?db=sharded&q=" +
                          urllib.request.quote(q))
    res = json.loads(out)["results"]
    assert [r["statement_id"] for r in res] == [0, 1]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/query?db=sharded&q=" +
             urllib.request.quote("DROP SHARD 1"))
    assert e.value.code == 400


def test_cq_http_roundtrip(http):
    """The full reference CQ lifecycle (importer.go:579-594) through the
    HTTP façade in one pass: /write raw points → CREATE CONTINUOUS QUERY
    via /query → scheduler tick (run_due — external cadence, like
    InfluxDB's CQ service) → /query the rolled-up measurement back with
    numeric epoch params."""
    base, engine = http
    h = 3_600_000_000_000  # 1h in ns
    t0 = 1_600_000_000_000_000_000  # aligned epoch base
    pts = []
    for i, v in enumerate((10, 30, 7, 9)):  # two points per hour bucket
        pts.append(f"cq_src,type=a value={v} {t0 + (i // 2) * h + i % 2}")
    status, _, _ = _post(base + "/write?db=sharded",
                         "\n".join(pts).encode())
    assert status == 204
    q = ("CREATE CONTINUOUS QUERY hourly_mean ON sharded BEGIN "
         "SELECT mean(value) AS value INTO cq_hourly FROM cq_src "
         "GROUP BY time(1h) fill(none) END")
    status, _, _ = _get(base + "/query?db=sharded&q=" +
                        urllib.request.quote(q))
    assert status == 200
    # the CQ shows through the HTTP surface
    status, _, out = _get(base + "/query?db=sharded&q=" +
                          urllib.request.quote("SHOW CONTINUOUS QUERIES"))
    assert b"hourly_mean" in out
    # scheduler tick — cadence driver is external (cron/stream trigger)
    ran = engine.cq.run_due(t0 + 2 * h)
    assert "hourly_mean" in ran
    status, _, out = _get(base + "/query?db=sharded&epoch=ns&q=" +
                          urllib.request.quote(
                              "SELECT value FROM cq_hourly ORDER BY time"))
    assert status == 200
    series = json.loads(out)["results"][0]["series"][0]
    assert series["name"] == "cq_hourly"
    got = {t: v for t, v in series["values"]}
    b0 = t0 - t0 % h  # bucket floor of the first two points
    assert got == {b0: 20.0, b0 + h: 8.0}


def test_auth_lifecycle(http):
    """Reference auth model (query_handler.go:90-114,
    query_handler_test.go:51-81): open until a user exists, then basic-auth
    + per-statement privileges. Runs LAST in this module (users persist on
    the shared engine)."""
    import base64
    base, engine = http
    # open access before any user exists
    _get(base + "/query?db=sharded&q=" +
         urllib.request.quote("SHOW MEASUREMENTS"))
    engine.admin.create_user("boss", "pw", admin=True)
    engine.admin.create_user("reader", "r", admin=False)
    engine.admin.grant("reader", "sharded", "READ")

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/query?db=sharded&q=" +
             urllib.request.quote("SHOW MEASUREMENTS"))
    assert e.value.code == 401

    creds = base64.b64encode(b"reader:r").decode()
    req = urllib.request.Request(
        base + "/query?db=sharded&q=" +
        urllib.request.quote("SELECT count(value) AS n FROM treasures"),
        headers={"Authorization": f"Basic {creds}"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200

    # reader has no WRITE privilege
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/write?db=sharded&u=reader&p=r",
              b"treasures,type=x value=1 1500000000000000009")
    assert e.value.code == 401
    # admin via u/p params can write
    status, _, _ = _post(base + "/write?db=sharded&u=boss&p=pw",
                         b"treasures,type=x value=1 1500000000000000009")
    assert status == 204


def test_chunked_response(http):
    base, engine = http
    # note: runs after test_auth_lifecycle → authenticate as boss
    q = "SHOW MEASUREMENTS; SHOW DATABASES"
    url = (base + "/query?db=sharded&chunked=true&u=boss&p=pw&q=" +
           urllib.request.quote(q))
    with urllib.request.urlopen(url) as r:
        body = r.read().decode().strip().splitlines()
    assert len(body) == 2
    docs = [json.loads(ln) for ln in body]
    assert [d["results"][0]["statement_id"] for d in docs] == [0, 1]


def test_chunk_size_partial_flag(http):
    """chunk_size splits a statement's values across docs with
    partial=true on every chunk but the last (query_utils.go:22-28
    Partial; reference/InfluxDB chunked semantics)."""
    base, engine = http
    q = "SELECT value FROM treasures"  # 4 points written by earlier tests
    url = (base + "/query?db=sharded&chunked=true&chunk_size=2&u=boss&p=pw"
           "&q=" + urllib.request.quote(q))
    with urllib.request.urlopen(url) as r:
        docs = [json.loads(ln) for ln in r.read().decode().strip().splitlines()]
    assert len(docs) >= 2
    n_vals = 0
    for i, d in enumerate(docs):
        res = d["results"][0]
        last = i == len(docs) - 1
        assert res.get("partial", False) == (not last)
        for s in res["series"]:
            assert len(s["values"]) <= 2
            n_vals += len(s["values"])
            assert s.get("partial", False) == (not last)
    assert n_vals >= 4


def test_bind_params(http):
    """InfluxQL bind parameters: $name placeholders resolved from the
    `params` JSON object (client-library surface; the reference forwards
    raw requests so InfluxDB resolves them — here the façade does)."""
    import urllib.parse

    base, engine = http
    _post(base + "/write?db=sharded&u=boss&p=pw",
          b"treasures,type=gold value=100 1500000000000000100")
    q = "SELECT count(value) AS n FROM treasures WHERE type = $t AND value > $lo"
    url = (base + "/query?db=sharded&u=boss&p=pw&q=" + urllib.request.quote(q)
           + "&params=" + urllib.parse.quote('{"t": "gold", "lo": 50}'))
    with urllib.request.urlopen(url) as r:
        body = json.loads(r.read())
    assert body["results"][0]["series"][0]["values"][0][-1] >= 1
    # missing parameter -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/query?db=sharded&u=boss&p=pw&q=" +
             urllib.request.quote("SELECT value FROM treasures WHERE type = $nope"))
    assert e.value.code == 400

    from influxdb_ha_spark.http_server import bind_params
    assert bind_params("WHERE a = $x AND b = $y",
                       '{"x": "o\'brien", "y": 2.5}') == \
        "WHERE a = 'o\\'brien' AND b = 2.5"


def test_routing_parity_rejected_vs_added(http):
    """The exact statement list the reference rejects (routing.go:113-119)
    must 400 through /query with the reference's message, while the
    statements this engine ADDS beyond that list (EXPLAIN, SHOW QUERIES,
    KILL QUERY) must be reachable — the round-2 regression was KILL QUERY
    landing in both camps at once."""
    base, _ = http
    auth = "&u=boss&p=pw"
    for stmt in ("DROP SHARD 1", "SHOW SHARDS", "SHOW STATS",
                 "SHOW DIAGNOSTICS"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + "/query?db=sharded" + auth + "&q=" +
                 urllib.request.quote(stmt))
        assert e.value.code == 400
        assert "not supported on cluster" in \
            json.loads(e.value.read())["error"]
    # added surface: reachable (SHOW QUERIES lists, EXPLAIN plans)
    status, _, out = _get(base + "/query?db=sharded" + auth + "&q=" +
                          urllib.request.quote("SHOW QUERIES"))
    assert status == 200
    cols = json.loads(out)["results"][0]
    status, _, out = _get(base + "/query?db=sharded" + auth + "&q=" +
                          urllib.request.quote(
                              "EXPLAIN SELECT count(value) FROM treasures"))
    assert status == 200
    plan = json.loads(out)
    assert "Physical Plan" in json.dumps(plan)
    # KILL QUERY parses and routes (unknown qid -> 400 with its own error,
    # NOT the rejected-statement message)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/query?db=sharded" + auth + "&q=" +
             urllib.request.quote("KILL QUERY 424242"))
    assert e.value.code == 400
    assert "no such query id" in json.loads(e.value.read())["error"]
