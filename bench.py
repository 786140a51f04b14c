"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Execution is forced with the `noop` sink (full plan runs, nothing collected
to the driver) — the honest analog of cluster execution cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry

HEADLINE = [
    "tpch_q1",            # classic pricing-summary aggregation
    "agg_median_percentile",  # exact order statistics
    "join_brand_revenue",  # broadcast dim join + agg
    "iq_mean_1h",          # InfluxQL frontend: GROUP BY time()
    "iq_fill_linear",      # bucket spine + linear interpolation
    "tr_moving_average",   # per-series window frame
    "tr_derivative",       # lag arithmetic per series
    "dedup_points",        # full-row distinct (replica dedup)
    "doc_near_dups_fast",  # MinHash LSH + verified jaccard (xxhash64 prod path)
    "doc_simhash",         # 32-bit sketch, explode+agg
    "emb_brute_topk",      # broadcast cosine top-k
    "text_quality",        # map-only text scoring
    "tr_cumulative_sum",   # distributed prefix sum (scan.py)
    "emb_near_dup_lsh",    # hyperplane-LSH bucketed near-dup (no N² join)
    "iq_subquery",         # nested InfluxQL planning
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from influxdb_ha_spark.session import get_spark
    spark = get_spark(app_name="bench")

    qs = entry.queries()
    # Warm the JVM, the parquet reader, and the noop committer so the first
    # measured query doesn't absorb one-time init cost (the queries
    # themselves are still cold — nothing below caches table data).
    spark.range(1000).count()
    warm = os.path.join(sf_dir, "region.parquet")
    spark.read.parquet(warm).write.format("noop").mode("overwrite").save()
    # spawn the Arrow python workers once (several headline ops use
    # pandas_udf; worker fork cost is infrastructure, not query cost)
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def _ident(s):
        return s
    _ident.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(100).select(pandas_udf(_ident, "long")("id")).write \
        .format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        # second run: steady-state cost with plan analysis + codegen + JIT
        # already paid — the number that matters for a long-lived cluster.
        # The headline metric stays the COLD number for round-over-round
        # comparability (BENCH_r01 measured cold).
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
