"""Local replica of the driver's t2 correctness gate.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB over the same parquet, then compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [--vanilla] [sf_dir] [query ...]

--vanilla builds a bare SparkSession with NO engine defaults — the driver's
actual environment. The contract (__spark_entry__._ensure_confs) must make
every query work there; round 1 shipped 33 red rows because this gate
didn't exist.

Scale note (r9, measured): running the FULL inventory at sf0.1 in one
session accumulates keep()-cached intermediates and checkpointed graph
frontiers past the 1 g default driver heap — the vanilla session dies
around the graph family with ConnectionRefused for everything after.
The driver's own gate runs at sf0.01 where the default heap is fine;
for an sf0.1 sweep use the engine session with a real heap:
    SPARK_GRAFT_DRIVER_MEM=8g python tools/check_correctness.py \
        /root/testdata/sf0.1
(the scale_report.py precedent — engine DEFAULTS stay at 1 g because
larger heaps bench slower for single queries, session.py:_DEFAULTS).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))

    # Parallelism-sensitivity sweep knobs (the ts_pettitt forensics,
    # generalized): override the session shape to hunt partition-order
    # sensitivity across the whole inventory, e.g.
    #   SPARK_GATE_MASTER='local[1]' SPARK_GATE_SHUFFLE=7 \
    #       python tools/check_correctness.py --vanilla
    master = os.environ.get("SPARK_GATE_MASTER", "local[8]")
    shuffle = os.environ.get("SPARK_GATE_SHUFFLE")
    if vanilla:
        # The driver's environment: no engine defaults whatsoever.
        from pyspark.sql import SparkSession
        b = (SparkSession.builder.appName("vanilla-gate")
             .master(master).config("spark.ui.enabled", "false"))
        if shuffle:
            b = b.config("spark.sql.shuffle.partitions", shuffle)
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        from influxdb_ha_spark.session import get_spark
        extra = ({"spark.sql.shuffle.partitions": shuffle}
                 if shuffle else None)
        spark = get_spark(master=master, extra_conf=extra)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = ("SPARK_ERROR", str(e).split("\n")[0][:200])
            traceback.print_exc()
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = ("ROWS_ONLY", f"{len(srows)} rows")
            continue
        try:
            rel = con.sql(sql)
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            results[name] = ("ORACLE_ERROR", str(e).split("\n")[0][:200])
            continue
        issues = []
        if sorted(scols) != sorted(dcols):
            issues.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            issues.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not issues:
            hs, hd = df_hash(scols, srows), df_hash(dcols, drows)
            if hs != hd:
                issues.append(f"hash {hs} != {hd}")
                # show a few differing lines to debug
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in drows)
                diffs = [(a, b) for a, b in zip(ls, ld) if a != b][:3]
                for a, b in diffs:
                    print(f"    [{name}] spark: {a[:160]}")
                    print(f"    [{name}]  duck: {b[:160]}")
        dt = time.time() - t0
        results[name] = ("OK", f"{len(srows)} rows {dt:.1f}s") if not issues \
            else ("MISMATCH", "; ".join(issues))

    print()
    n_ok = n_bad = 0
    for name, (status, info) in results.items():
        mark = {"OK": "PASS", "ROWS_ONLY": "rows"}.get(status, "FAIL")
        if mark == "FAIL":
            n_bad += 1
        else:
            n_ok += 1
        print(f"{mark:5} {name:28} {status:12} {info}")
    print(f"\n{n_ok} ok, {n_bad} failing")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
