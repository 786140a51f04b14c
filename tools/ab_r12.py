"""Round-12 interleaved A/B harness: old-vs-new operator variants timed
back-to-back within ONE session, because only interleaved deltas measure
code on this box (BASELINE.md §4 — identical trees moved 1.7x between
same-boot batches while within-batch deltas stayed +-12%).

Experiments (the non-live variant inlined verbatim so both run in one
interpreter):
  label_prop    — self-vote folded post-join (r12, KEPT: 0.72x at sf1)
                  vs |V| self-loop rows unioned into the persisted
                  adjacency (f3ad515).
  basket_rules  — persisted 5-consumer basket + cap-filtered b side
                  (tried r12, REVERTED: 2.4x worse at sf10) vs
                  unpersisted basket + unfiltered b — the "old" variant
                  here WON and is the live operator again.
  lsh_bits      — derived bits = ceil(log2(N/64)) (r12, KEPT: 0.16x at
                  sf10) vs the old fixed bits=10 gate form.

Usage: python tools/ab_r12.py <sf_dir> [reps]   (default reps=3)
Prints a table + ONE JSON line. Run on a QUIET box, nothing concurrent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from __spark_entry__ import DAY, _events_us, _graph_edges, _t

from pyspark.sql import functions as F

from influxdb_ha_spark import cache
from influxdb_ha_spark.operators.graph import _symmetric, _truncate_lineage
from influxdb_ha_spark.operators.similarity import cosine_near_dup_pairs
from influxdb_ha_spark.operators.timeseries import (_bucket_expr,
                                                    association_rules)
from influxdb_ha_spark.operators.graph import label_propagation


# ---- old variants (measurement-only copies of the pre-r12 tree) -------

def old_label_propagation(edges, rounds=4, reliable=False):
    """f3ad515 form: self-loops unioned into the persisted adjacency."""
    sym = _symmetric(edges)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    adj = sym.unionByName(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
    adj = adj.persist()
    lab = _truncate_lineage(
        nodes.withColumn("community", F.col("node").cast("long")), reliable)
    for _ in range(rounds):
        votes = (adj.join(lab.select(F.col("node").alias("src"),
                                     "community"), "src")
                 .groupBy(F.col("dst").alias("node"), "community")
                 .agg(F.count(F.lit(1)).alias("__c")))
        lab = _truncate_lineage(
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("__c")).alias("__neg"),
                                F.col("community").alias("__l")))
                 .alias("__best"))
            .select("node", F.col("__best.__l").alias("community")),
            reliable)
    sizes = lab.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size"))
    res = lab.join(sizes, "community").select("node", "community",
                                              "community_size")
    adj.unpersist()
    return res


def old_association_rules(df, by=("user_id",), on="time",
                          type_col="event_type",
                          bucket_ns=86_400_000_000_000,
                          min_count=2, max_basket=64, round_to=6):
    """f8105f7 form: unpersisted basket, unfiltered b join side."""
    by = list(by)
    basket = (df.where(F.col(type_col).isNotNull())
              .select(*by, _bucket_expr(on, bucket_ns).alias("__b"),
                      F.col(type_col).alias("__t"))
              .distinct())
    sized = (basket.groupBy(*by, "__b")
             .agg(F.count(F.lit(1)).alias("__k")))
    ok = sized.where((F.col("__k") >= 2) & (F.col("__k") <= max_basket)) \
              .select(*by, "__b")
    nb = basket.select(*by, "__b").distinct() \
               .agg(F.count(F.lit(1)).alias("__nb"))
    singles = basket.groupBy(F.col("__t").alias("type_a")) \
                    .agg(F.count(F.lit(1)).alias("n_a"))
    a = basket.join(ok, [*by, "__b"]) \
              .select(*by, "__b", F.col("__t").alias("type_a"))
    b = basket.select(*by, "__b", F.col("__t").alias("type_b"))
    pairs = (a.join(b, [*by, "__b"])
             .where(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= int(min_count)))
    sb = singles.select(F.col("type_a").alias("type_b"),
                        F.col("n_a").alias("n_b"))
    j = (pairs.join(singles, "type_a").join(sb, "type_b")
         .crossJoin(F.broadcast(nb)))
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = float(10 ** round_to)
    rnd = lambda x: F.floor(x * F.lit(s) + F.lit(0.5)) / F.lit(s)  # noqa: E731
    supp = rnd(F.col("n_ab").cast("double") / F.col("__nb").cast("double"))
    cab = rnd(F.col("n_ab").cast("double") / F.col("n_a").cast("double"))
    cba = rnd(F.col("n_ab").cast("double") / F.col("n_b").cast("double"))
    lift = rnd((dec(F.col("n_ab")) * dec(F.col("__nb"))).cast("double")
               / (dec(F.col("n_a")) * dec(F.col("n_b"))).cast("double"))
    return j.select("type_a", "type_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("n_ab").cast("long").alias("n_ab"),
                    F.col("__nb").cast("long").alias("n_baskets"),
                    supp.alias("support"),
                    cab.alias("conf_a_to_b"), cba.alias("conf_b_to_a"),
                    lift.alias("lift"))


# ---- experiment wiring -------------------------------------------------

def _emb(spark, sf):
    return _t(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))


def experiments(spark, sf):
    ev = lambda: _events_us(spark, sf).select(  # noqa: E731
        "user_id", "event_type", "time")
    return {
        "label_prop": (
            lambda: label_propagation(_graph_edges(spark, sf), rounds=4),
            lambda: old_label_propagation(_graph_edges(spark, sf),
                                          rounds=4)),
        "basket_rules": (
            lambda: association_rules(ev(), by=["user_id"], on="time",
                                      bucket_ns=DAY, min_count=2),
            lambda: old_association_rules(ev(), by=["user_id"], on="time",
                                          bucket_ns=DAY, min_count=2)),
        "lsh_bits": (
            lambda: cosine_near_dup_pairs(_emb(spark, sf), threshold=0.9),
            lambda: cosine_near_dup_pairs(_emb(spark, sf), threshold=0.9,
                                          bits=10)),
    }


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from influxdb_ha_spark.session import get_spark
    spark = get_spark(app_name="ab_r12",
                      extra_conf={"spark.driver.memory":
                                  os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                                 "8g")})
    spark.range(1000).count()
    os.system("uptime")

    def run(mk):
        cache.release()
        mk().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    res: dict[str, dict[str, list[float]]] = {}
    exps = experiments(spark, sf)
    if os.environ.get("AB_ONLY"):
        only = set(os.environ["AB_ONLY"].split(","))
        exps = {k: v for k, v in exps.items() if k in only}
    for rep in range(reps):
        for name, (new, old) in exps.items():
            r = res.setdefault(name, {"new": [], "old": []})
            # adjacent new/old pairs — the tightest interleave
            r["new"].append(run(new))
            r["old"].append(run(old))
            print(f"rep{rep} {name:14s} new {r['new'][-1]:7.3f}  "
                  f"old {r['old'][-1]:7.3f}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {name: {"new_med": med(v["new"]), "old_med": med(v["old"]),
                      "ratio_new_over_old":
                      round(med(v["new"]) / med(v["old"]), 3),
                      "new": v["new"], "old": v["old"]}
               for name, v in res.items()}
    print(json.dumps({"sf_dir": sf, "reps": reps, "results": summary}))


if __name__ == "__main__":
    main()
