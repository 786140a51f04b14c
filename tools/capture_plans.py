"""Capture `.explain("formatted")` output for named queries() keys into
plans/<tag>/<key>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit (the judge checks plan claims against these
files without running Spark).

Usage:
    python tools/capture_plans.py <tag> <suffix> [sf_dir] key [key...]
    python tools/capture_plans.py r12 before /root/testdata/sf0.1 tpch_q1 ...

The operator persist-cache is released before every capture so the plan
is a pure function of the code (the plan_fingerprints.py discipline).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from influxdb_ha_spark import cache
from influxdb_ha_spark.session import get_spark


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, keys = rest[0], rest[1:]
    else:
        sf_dir, keys = "/root/testdata/sf0.1", rest
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    qs = entry_mod.queries()
    import contextlib
    import io
    for name in keys:
        cache.release()
        df = qs[name](spark, sf_dir)
        # capture the pre-execution formatted plan (AQE initial plan):
        # deterministic, data-independent shape — what the fingerprints
        # pin. Public explain() API (r12 advice: the former
        # PythonSQLUtils/_jdf reach-in breaks across PySpark versions,
        # e.g. the connect/classic split).
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    cache.release()
    spark.stop()


if __name__ == "__main__":
    main()
