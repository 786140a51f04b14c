import pytest

from influxdb_ha_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s
    s.stop()


NOW = 1_700_000_000_000_000_000
DAY = 86_400_000_000_000
HOUR = 3_600_000_000_000


@pytest.fixture(scope="session")
def treasures(spark):
    """The reference's canonical fixture (FIXTURES.md §1): db `sharded`,
    measurement `treasures`, tag `type`, field `value`, partition key [type]."""
    from influxdb_ha_spark.model import Catalog, PartitionKey
    rows = [
        (NOW - DAY, "gold", 100.0),
        (NOW - DAY + 2 * HOUR, "gold", 60.0),
        (NOW - DAY, "trash", 0.0),
        (NOW - DAY + 1_000, "silver", 50.0),
        (NOW - DAY + 3 * HOUR, "silver", 2.0),
    ]
    df = spark.createDataFrame(rows, "time long, type string, value double")
    cat = Catalog(spark)
    cat.register_dataframe("sharded", "treasures", df, time_col="time",
                           tags=["type"])
    cat.partition_keys.append(PartitionKey("sharded", "treasures", ["type"]))
    return cat


def write_json_batch(d, name, rows, mtime=None):
    """Write one micro-batch file for the file streaming source — THE
    shared scaffold (previously 19 per-test copies). The source orders
    files by MODIFICATION TIME; same-second writes tie and can process
    in either order (the quantile_bands flake class), so the helper
    pins an mtime: the caller's explicit one, else a stable value
    derived from the file name's numeric suffix (b0.json, b1.json, …) —
    batch order matches naming order with zero caller changes."""
    import json as _json
    import os as _os
    import re as _re
    p = _os.path.join(d, name)
    with open(p + ".tmp", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    _os.rename(p + ".tmp", p)
    if mtime is None:
        m = _re.search(r"(\d+)", name)
        mtime = 1_000_000_000 + int(m.group(1)) if m else None
    if mtime is not None:
        _os.utime(p, (mtime, mtime))
