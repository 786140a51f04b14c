"""Line protocol, write path, and streaming ingest tests."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.ingest import ingest_lines, validate_partition_key, \
    dedup_replicated
from influxdb_ha_spark.lineprotocol import (errors_df, parse_line,
                                            parse_lines_df, pivot_points)
from influxdb_ha_spark.model import Catalog, PartitionKey


def test_parse_line_basic():
    recs = parse_line("weather,location=us,season=summer "
                      "temperature=82,humidity=71i,ok=true,note=\"hi\" "
                      "1465839830100400200")
    assert len(recs) == 4
    by_key = {r["field_key"]: r for r in recs}
    assert by_key["temperature"]["f_float"] == 82.0
    assert by_key["humidity"]["f_int"] == 71
    assert by_key["ok"]["f_bool"] is True
    assert by_key["note"]["f_str"] == "hi"
    assert recs[0]["tags"] == {"location": "us", "season": "summer"}
    assert recs[0]["time"] == 1465839830100400200


def test_parse_line_escapes():
    recs = parse_line(r"my\,m,tag\ key=va\=lue value=1 5")
    assert recs[0]["measurement"] == "my,m"
    assert recs[0]["tags"] == {"tag key": "va=lue"}


def test_parse_line_errors():
    assert parse_line("")[0:] == []
    bad = parse_line("no_fields_here")
    assert bad[0]["error"] is not None
    bad = parse_line("m,t= value=1")
    assert bad[0]["error"] is not None


def test_parse_lines_df_and_pivot(spark):
    lines = spark.createDataFrame(
        [("asdf,type=gold value=29 1439856000000000000",),
         ("asdf,type=gold value=29 1439859000000000000",),   # write_test.go:20-29
         ("asdf,type=silver value=3,count=2i 1439859000000000001",),
         ("garbage line without fields",)],
        "value string")
    long_df = parse_lines_df(lines)
    assert errors_df(long_df).count() == 1
    wide = pivot_points(long_df, "asdf", ["type"])
    rows = {(r["time"], r["type"]): r for r in wide.collect()}
    assert rows[(1439856000000000000, "gold")]["value"] == 29.0
    assert rows[(1439859000000000001, "silver")]["count"] == 2
    assert len(rows) == 3


def test_pivot_first_write_wins_typing(spark):
    """Field type = type of the EARLIEST write, not alphabetical min over
    type tags (f_bool < f_float would otherwise let a later bool win)."""
    lines = spark.createDataFrame(
        [("m,t=a value=1.5 1000",),          # float first
         ("m,t=a value=true 2000",)],        # bool later — must not win
        "value string")
    wide = pivot_points(parse_lines_df(lines), "m", ["t"])
    assert dict(wide.dtypes)["value"] == "double"
    vals = {r["time"]: r["value"] for r in wide.collect()}
    assert vals[1000] == 1.5 and vals[2000] is None


def test_partition_key_validation(spark):
    wide = spark.createDataFrame(
        [(1, "gold", 1.0), (2, None, 2.0)],
        "time long, type string, value double")
    valid, rejected = validate_partition_key(
        wide, PartitionKey("db", "m", ["type"]))
    assert valid.count() == 1
    rej = rejected.collect()
    assert len(rej) == 1 and "type" in rej[0]["reject_reason"]


def test_ingest_end_to_end(spark, tmp_path):
    cat = Catalog(spark)
    cat.partition_keys.append(PartitionKey("sharded", "asdf", ["type"]))
    lines = spark.createDataFrame(
        [("asdf,type=gold value=29 1439856000000000000",),
         ("asdf,type=gold value=29 1439859000000000000",),
         ("asdf value=5 1439859000000000002",)],  # missing key tag → reject
        "value string")
    res = ingest_lines(cat, lines, "sharded", "asdf", ["type"],
                       str(tmp_path / "asdf"))
    assert res.n_accepted == 2
    assert res.n_rejected == 1
    m = cat.get("sharded", "asdf")
    assert m.df.count() == 2
    # partitioned layout → partition pruning on the key tag
    assert (tmp_path / "asdf" / "type=gold").exists()


def test_dedup_replicated(spark):
    df = spark.createDataFrame([(1, "a", 1.0)] * 2 + [(2, "b", 2.0)],
                               "time long, tag string, v double")
    assert dedup_replicated(df).count() == 2


def test_stream_ingest(spark, tmp_path):
    """availableNow streaming drain — the mirror/bookmark shape."""
    from influxdb_ha_spark.streaming import stream_ingest_lines
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.txt").write_text(
        "m,host=a v=1 1000000000\n"
        "m,host=b v=2 2000000000\n"
        "m v=3 3000000000\n")          # missing tag → dead letter
    cat = Catalog(spark)
    cat.partition_keys.append(PartitionKey("db", "m", ["host"]))
    stream = spark.readStream.format("text").load(str(src))
    q = stream_ingest_lines(
        cat, stream, "db", "m", ["host"], str(tmp_path / "table"),
        str(tmp_path / "ckpt"), dead_letter_path=str(tmp_path / "dlq"),
        trigger_once=True)
    assert q.awaitTermination(600), "stream drain timed out"
    stored = spark.read.parquet(str(tmp_path / "table"))
    assert stored.count() == 2
    dlq = spark.read.json(str(tmp_path / "dlq"))
    assert dlq.count() == 1


def test_mirror_bookmark(spark, tmp_path):
    """Mirror copies only rows past the bookmark and advances it
    (syncing/importer.go:114-139 semantics)."""
    from influxdb_ha_spark.ingest import mirror_measurement
    from influxdb_ha_spark.model import Catalog

    rows = [(i * 1000, "a", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "time long, tag string, value double")
    cat = Catalog(spark)
    m = cat.register_dataframe("db", "m", df, time_col="time", tags=["tag"])
    tgt = str(tmp_path / "mirror")

    bm = mirror_measurement(m, tgt, None)
    assert bm == 9000
    assert spark.read.parquet(tgt).count() == 10
    # nothing new → bookmark unchanged, no duplicate append
    assert mirror_measurement(m, tgt, bm) == 9000
    assert spark.read.parquet(tgt).count() == 10
    # late/new data past the bookmark is picked up incrementally
    more = spark.createDataFrame([(12000, "a", 12.0)],
                                 "time long, tag string, value double")
    m2 = cat.register_dataframe("db", "m", df.unionByName(more),
                                time_col="time", tags=["tag"])
    assert mirror_measurement(m2, tgt, bm) == 12000
    assert spark.read.parquet(tgt).count() == 11


def test_upsert_last_write_wins(spark):
    """InfluxDB point-overwrite: same (time, tagset) → new field values
    replace old; fields absent from the new point survive."""
    from influxdb_ha_spark.ingest import upsert_points
    old = spark.createDataFrame(
        [(1, "a", 10.0, 100.0), (2, "a", 20.0, 200.0)],
        "time long, tag string, x double, y double")
    new = spark.createDataFrame([(2, "a", 99.0)],
                                "time long, tag string, x double")
    out = {(r["time"], r["tag"]): (r["x"], r["y"])
           for r in upsert_points(old, new, ["tag"]).collect()}
    assert out[(1, "a")] == (10.0, 100.0)
    assert out[(2, "a")] == (99.0, 200.0)  # x replaced, y survives


def test_write_lines_upsert_and_type_conflict(spark):
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.server import Engine, WriteError, write_lines
    import pytest as _pytest
    eng = Engine(Catalog(spark), database="db")
    write_lines(eng, "db", "m,tag=a x=1.5 1000\nm,tag=a x=2.5 2000\n")
    # overwrite the point at time 1000
    write_lines(eng, "db", "m,tag=a x=9.5 1000\n")
    rows = {r["time"]: r["x"] for r in
            eng.query_df("SELECT x FROM m").collect()}
    assert rows == {1000: 9.5, 2000: 2.5}
    # int field where float was first written → rejected
    with _pytest.raises(WriteError, match="exists as double"):
        write_lines(eng, "db", "m,tag=a x=3i 3000\n")


def test_line_protocol_export_roundtrip(spark):
    """Columnar export → parse round-trip (the reference's row→point
    conversion, importer.go:361-404, without per-row Python)."""
    from influxdb_ha_spark.lineprotocol import parse_lines_df, to_line_protocol
    rows = [(1000, "se,attle", "a b", 1.5, 7, "hi \"x\""),
            (2000, "nyc", None, 2.5, None, None)]
    df = spark.createDataFrame(
        rows, "time long, city string, zone string, temp double, "
              "cnt long, note string")
    lines = to_line_protocol(df, "weather m", ["city", "zone"],
                             ["temp", "cnt", "note"])
    back = parse_lines_df(lines, line_col="line").collect()
    assert all(r["error"] is None for r in back)
    by_time = {}
    for r in back:
        by_time.setdefault(r["time"], {})[r["field_key"]] = (
            r["f_float"] if r["f_float"] is not None else
            r["f_int"] if r["f_int"] is not None else r["f_str"])
        assert r["measurement"] == "weather m"
    assert by_time[1000] == {"temp": 1.5, "cnt": 7, "note": 'hi "x"'}
    assert by_time[2000] == {"temp": 2.5}
    tags = {r["time"]: r["tags"] for r in back}
    assert tags[1000] == {"city": "se,attle", "zone": "a b"}
    assert tags[2000] == {"city": "nyc"}


def test_reference_placement_goldens(spark):
    """The FNV-1a compound-key hash is byte-identical to the reference's
    placement hash: the exact goldens its own integration tests assert
    (service/query_handler_test.go:101-103)."""
    from influxdb_ha_spark.ingest import (fnv1a_32,
                                          reference_placement_manifest)
    from influxdb_ha_spark.model import PartitionKey

    assert fnv1a_32("gold") == 3966162835
    assert fnv1a_32("silver") == 3042244896
    assert fnv1a_32("trash") == 1583631877
    df = spark.createDataFrame(
        [(1, "gold", 1.0), (2, "gold", 2.0), (3, "silver", 3.0),
         (4, "trash", 4.0)],
        "time long, type string, value double")
    pk = PartitionKey("sharded", "treasures", ["type"])
    m = {r["compound_key"]: r["placement_hash"]
         for r in reference_placement_manifest(df, pk).collect()}
    assert m == {"gold": 3966162835, "silver": 3042244896,
                 "trash": 1583631877}
