"""Write-path micro-benchmark — the analog of the reference's only
benchmark (`BenchmarkRouting`, service/write_test.go:38-57: 100-point
line-protocol batches through WriteHandler with a mocked writer).

Measures `write_lines` (parse → pivot → validate → upsert-merge) into an
in-memory Engine. Prints one JSON line with points/sec per batch size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.server import Engine, write_lines
    from influxdb_ha_spark.session import get_spark

    spark = get_spark(app_name="bench_write")
    spark.range(1000).count()  # warm

    results = {}
    for n in (100, 1000, 10000):
        lines = "\n".join(
            f"cpu,host=h{i % 50},region=r{i % 5} usage={i % 97}.5,"
            f"load={i % 13}i {1_700_000_000_000_000_000 + i * 1000}"
            for i in range(n))
        eng = Engine(Catalog(spark), database="bench")
        t0 = time.time()
        accepted = write_lines(eng, "bench", lines)
        dt = time.time() - t0
        assert accepted == n, (accepted, n)
        results[str(n)] = {"sec": round(dt, 3),
                           "points_per_sec": round(n / dt)}
    print(json.dumps({"metric": "write_path", "batches": results}))
    spark.stop()


if __name__ == "__main__":
    main()
