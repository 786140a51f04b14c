"""Physical-plan audit: scan every __spark_entry__.queries() plan for
scale red flags.

For each query, counts shuffles (Exchange), flags single-partition funnels
(`Exchange SinglePartition`, keyless Window), cartesian/nested-loop joins,
and row-at-a-time Python (BatchEvalPython = non-Arrow UDF). These are the
shapes that break at 100 TB even when sf0.01 correctness is green.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.001 — plan
shape, not data, is what's audited). Prints a table; exits non-zero if a
query trips a HARD flag that is not on the allowlist below.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

# Queries where a SinglePartition exchange is by-construction bounded:
#   - final global sort/limit of a small result (TakeOrderedAndProject or
#     result-sized orderBy),
#   - the P-row prefix-offset table in scan.distributed_cumsum,
#   - fill() spines over an ungrouped GROUP BY time() (rows = bucket count).
BOUNDED_SINGLE_PARTITION = {
    "iq_mean_1h", "iq_fill_zero", "iq_fill_previous", "iq_fill_linear",
    "iq_raw_limit", "iq_order_desc", "iq_sample",
    "limit_offset", "tr_cumulative_sum", "iq_cumsum_1d",
    "emb_brute_topk", "emb_ivf_topk",
    # two global aggregates (1 row each) joined for the invariant summary
    "emb_kmeans_train",
}

# Cartesian/nested-loop joins that are the *intended* plan:
#   - emb_brute_topk: corpus × broadcast(queries) — the exact baseline; the
#     corpus never shuffles, cost is |Q| dot products per corpus row.
#   - emb_ivf_topk: row × broadcast(C centroids) assignment — bounded by C.
#   - emb_near_dup_pairs: the exact all-pairs reference (quadratic by
#     definition); the production path is emb_near_dup_lsh (bucketed join).
ALLOWED_CARTESIAN = {
    "emb_brute_topk", "emb_ivf_topk", "emb_near_dup_pairs",
    # 1-row × 1-row crossJoin of two global-aggregate summaries
    "emb_kmeans_train",
}


def audit_plan(plan: str) -> dict:
    out = {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "single_part": len(re.findall(r"Exchange SinglePartition", plan)),
        "cartesian": bool(re.search(r"CartesianProduct|BroadcastNestedLoop", plan)),
        "py_row_udf": bool(re.search(r"BatchEvalPython", plan)),
        "arrow_udf": bool(re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "keyless_window": False,
    }
    for line in plan.splitlines():
        m = re.search(r"windowspecdefinition\((.*)", line.lower())
        if m and not re.match(r"\s*\w+#\d+[^,]*,.*\bpartitionby\b", m.group(1)):
            # heuristic: Spark prints "windowspecdefinition(part1, part2, ord ASC..."
            # a keyless spec starts directly with the order column + sort dir
            first = m.group(1).split(",")[0]
            if " asc" in first or " desc" in first:
                out["keyless_window"] = True
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from influxdb_ha_spark.session import get_spark
    spark = get_spark(app_name="explain_audit")

    failures = []
    print(f"{'query':28s} {'xchg':>4} {'1part':>5} {'bhj':>3} {'smj':>3} flags")
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        a = audit_plan(plan)
        flags = []
        if a["cartesian"] and name not in ALLOWED_CARTESIAN:
            flags.append("CARTESIAN")
        if a["py_row_udf"]:
            flags.append("ROW_PYTHON")
        if a["keyless_window"] and name not in BOUNDED_SINGLE_PARTITION:
            # bounded allowlist: spines below _SMALL_SPINE rows keep the
            # plain window; large spines switch to the segmented scan
            flags.append("KEYLESS_WINDOW")
        if a["single_part"] and name not in BOUNDED_SINGLE_PARTITION:
            flags.append(f"SINGLE_PARTITION×{a['single_part']}")
        hard = [f for f in flags if f != "ROW_PYTHON" or True]
        if flags:
            failures.append(name) if any(
                f.startswith(("CARTESIAN", "ROW_PYTHON", "KEYLESS_WINDOW",
                              "SINGLE_PARTITION")) for f in flags) else None
        print(f"{name:28s} {a['exchanges']:>4} {a['single_part']:>5} "
              f"{a['broadcast_joins']:>3} {a['sortmerge_joins']:>3} "
              f"{' '.join(flags) or '-'}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} queries tripped hard flags: {failures}")
        sys.exit(1)
    print("\nall plans clean")


if __name__ == "__main__":
    main()
