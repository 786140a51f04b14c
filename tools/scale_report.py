"""Data-scaling evidence: run a representative query slice at every
available scale factor and report how wall time grows vs data size.

The 100 TB question is "what happens at 100x the data?" — this prints the
measured local answer at 100x (sf0.001 → sf0.1): a per-query table of
warm-execution wall seconds (second run of each query, so plan compile and
JIT — fixed costs that amortize on a long-lived cluster — are excluded)
and the wall ratio across each 10x data step.

Usage: python tools/scale_report.py [sf_dir ...]
Defaults to /root/testdata/sf0.001 sf0.01 sf0.1. For the r11 decade
extension, generate a synthetic sf1 first (tools/gen_scale.py — same
physical schema, deterministic) and pass it as a fourth dir:
    python tools/gen_scale.py --sf 1
    python tools/scale_report.py /root/testdata/sf0.01 \
        /root/testdata/sf0.1 /root/repo/scale_data/sf1
SCALE_QUERIES=<comma-list> restricts the slice (ad-hoc re-measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# a slice that exercises every heavy shape: scan+agg, exact order stats,
# broadcast join, time buckets, per-series windows, LSH dedup, ANN, maps
QUERIES = ["tpch_q1", "agg_median_percentile", "join_brand_revenue",
           "iq_mean_1h", "tr_moving_average", "doc_near_dups_fast",
           "emb_near_dup_lsh", "text_quality", "ts_asof_join",
           # round-4 additions: M4 reduce, inverted-index containment,
           # zlib PNG decode (Arrow map)
           "ts_m4_downsample", "doc_containment", "mm_png_px",
           # round-5 additions: SemDeDup cluster dedup, BM25 two-phase
           # retrieval, decimal-chained decomposition
           "emb_semantic_dedup", "text_bm25", "ts_decompose",
           # late round-5: bucket-table correlation, map-only probe
           # kNN graph, CUSUM recurrence, literal-log entropy
           "ts_acf", "emb_knn_graph", "ts_cusum", "text_entropy",
           # round-7/8 additions: entity-window funnel, iterative
           # fixed-point graph loop, bounded-round peeling, winnowing
           # selection, cohort revenue cells
           "ev_funnel", "graph_pagerank", "graph_kcore",
           "text_winnowing", "ev_cohort_ltv",
           # final round-8 wave: synchronous LPA (iterative vote
           # loop), basket-key pair self-join, fact-fact outer join +
           # double agg, entity-window lifecycle classification
           "graph_label_prop", "ev_basket_rules", "tpch_q13",
           "ev_lifecycle",
           # round-9 additions: bucket-quadratic pair self-join with
           # lead-column windows (matrix profile), moment-join + segment
           # routing (SAX), rank-window concentration, token-count +
           # parameter-bounded regression (zipf), widest TPC-H join
           # chain + double-role dims
           "ts_matrix_profile", "ts_sax", "ev_gini", "text_zipf",
           "tpch_q9", "tpch_q21",
           # round-9 continuation: bounded-state sketches (distinct
           # shuffle + k-rank, register max-agg, d·w-cell build) and
           # the frontier BFS loop
           "sk_kmv", "sk_hll", "sk_countmin", "graph_bfs",
           # round-10 additions: explicit two-level sketch merge
           # (shared-scan KMV+HLL partials), pairwise theta overlap
           # matrix over a persisted G·k sketch table, two-pass
           # auto-range histogram quantiles
           "sk_merge", "sk_overlap_matrix", "sk_hist_quantile_auto"]

# r11: the bench.py HEADLINE keys not already in the slice — the decade
# extension (sf0.01 -> sf0.1 -> sf1) covers headline ∪ slice, so every
# number the driver benches has a measured one-more-decade ratio
import bench  # noqa: E402

QUERIES += [q for q in bench.HEADLINE if q not in QUERIES]

if os.environ.get("SCALE_QUERIES"):
    _only = set(os.environ["SCALE_QUERIES"].split(","))
    QUERIES = [q for q in QUERIES if q in _only]


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                            "/root/testdata/sf0.01",
                            "/root/testdata/sf0.1"]
    from influxdb_ha_spark.session import get_spark
    # One long-lived session runs the whole slice x 3 SFs back to back,
    # accumulating keep()-cached LSH intermediates and checkpointed
    # graph frontiers — Spark's 1g default driver heap (which benches
    # FASTEST for single queries, see session._DEFAULTS) OOM'd here at
    # sf0.1 once the graph ops joined the slice. The measurement
    # harness gets a real heap; engine defaults are unchanged.
    extra = {"spark.driver.memory":
             os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}
    # SPARK_GRAFT_SHUFFLE: the partitions-∝-data dial (r12 — the sf10
    # graph keys spill at the fixed 32; a real cluster sizes this up)
    if os.environ.get("SPARK_GRAFT_SHUFFLE"):
        extra["spark.sql.shuffle.partitions"] = \
            os.environ["SPARK_GRAFT_SHUFFLE"]
    spark = get_spark(app_name="scale_report", extra_conf=extra)
    spark.range(1000).count()
    qs = entry.queries()
    from influxdb_ha_spark import cache
    out: dict[str, dict[str, float]] = {}
    for d in dirs:
        sf = os.path.basename(d.rstrip("/"))
        out[sf] = {}
        for name in QUERIES:
            fn = qs[name]
            # hermeticity (the plan_fingerprints r9 fix applied here):
            # drop every sibling's keep() cache before the warmup, so a
            # query's number is a function of the QUERY — 41 operators'
            # accumulated cached RDDs previously inflated late-slice
            # measurements (text_bm25 read 26.9 s at sf0.1 inside the
            # long session vs 1.1 s isolated — pure GC/memory pressure,
            # reproducible only with the full slice resident). The
            # warmup still populates the query's OWN cache, so the
            # timed second run keeps the intended warm semantics.
            cache.release()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            out[sf][name] = round(time.time() - t0, 3)
    sfs = list(out)
    print(f"{'query':26s} " + " ".join(f"{s:>9s}" for s in sfs)
          + "   ratio/10x")
    for name in QUERIES:
        times = [out[s][name] for s in sfs]
        ratios = [times[i + 1] / times[i] if times[i] > 0 else float("nan")
                  for i in range(len(times) - 1)]
        rtxt = ", ".join(f"{r:.2f}" for r in ratios)
        print(f"{name:26s} " + " ".join(f"{t:9.3f}" for t in times)
              + f"   [{rtxt}]")
    totals = {s: round(sum(v.values()), 3) for s, v in out.items()}
    print(json.dumps({"metric": "scale_report_warm_seconds",
                      "totals": totals, "per_query": out}))
    spark.stop()


if __name__ == "__main__":
    main()
