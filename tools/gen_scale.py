"""Deterministic sf1+ scale-slice generator (r10 verdict task #1).

The driver's testdata is read-only and tops out at sf0.1 (~600k lineitem
rows) — every 100 TB design claim so far has been measured across two
decades of tiny data. This tool synthesizes an sf1-equivalent (or any
--sf multiple) table set with the SAME physical schema as
/root/testdata/sf0.1 (pyarrow-verified: int32/int64/double/string/
timestamp[us]/float-list columns), so tools/scale_report.py can extend
its decade table one more 10× step on data the engine reads through the
identical code path.

Design rules:
- DETERMINISTIC and seed-derived: every value is a pure function of
  (row id, seed) via xxhash64 — no RNG state, no shuffle, rerunning
  reproduces byte-identical content for a given (sf, seed, slices).
- Spark `range`-based and map-only: each table is one projection over
  spark.range(n); generation cost is minutes at sf1 and scales linearly.
- DISTRIBUTION-matched where the engine's wall-time depends on it
  (profiled from sf0.1 with DuckDB, 2026-08-16):
    * key cardinalities scale ×10 per decade (customers 15k→150k,
      parts 20k→200k, users 1.5k→15k, sources 20, langs 5, labels 10);
    * vocabulary-bounded columns STAY bounded (31-token document vocab,
      64 distinct p_names = 8 adj × 8 noun, events.value on the
      0.01-grid below 512 → ≤ 51,200 distinct cells, discount/tax on
      the classic 0.00-0.10 / 0.00-0.08 grids) — these bounds are what
      several operators' scale arguments lean on, so the synthetic
      decade must preserve them;
    * lineitem fans out 1..8 lines/order (mean ≈ 4.06, matching the
      observed 4.07); ~2% of documents are EXACT clones of a group
      leader (sf0.1 ships duplicate texts too) so dedup operators keep
      real work; embeddings are NEAR-RANDOM like the real testdata
      (same-label cosine ≈ 0 — see gen_embeddings for why clustered
      synthetic vectors would be a data regression, not realism).
- region/nation are COPIED from sf0.1 verbatim — fixed dimension
  tables, identical at every scale factor (TPC-H semantics).

Usage:
    python tools/gen_scale.py [--sf 1.0] [--out DIR] [--seed 42]
Defaults: sf=1.0, out=/root/repo/scale_data/sf1 (gitignored).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"   # schema + fixed-dim source (read-only)

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "fr", "es", "it"]
# 8 adjectives x 8 nouns = the 64 distinct p_names profiled at sf0.1
P_ADJ = ["red", "blue", "hot", "cold", "old", "new", "large", "small"]
P_NOUN = ["bolt", "gear", "ring", "plate", "wheel", "spring", "pin",
          "cap"]
# the 31-token document vocabulary profiled at sf0.1 (Spark-ish words)
DOC_VOCAB = ["spark", "table", "query", "join", "scan", "filter",
             "group", "sort", "hash", "shuffle", "column", "row",
             "value", "key", "index", "batch", "stream", "window",
             "agg", "order", "part", "line", "customer", "vector",
             "fast", "slow", "small", "big", "a", "the", "g"]

EPOCH_1995 = 788_918_400          # 1995-01-01T00:00:00Z, seconds
EPOCH_2024 = 1_704_067_200        # 2024-01-01T00:00:00Z, seconds


def _h(seed: str, *cols):
    """Deterministic uniform int64 ≥ 0 from (seed literal, columns)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _u(seed: str, cols, mod: int):
    """Uniform integer in [0, mod) — one xxhash64, one pmod."""
    return F.pmod(_h(seed, *cols), F.lit(int(mod)))


def _pick(seed: str, cols, values: list):
    """Deterministic uniform choice from a literal list."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_u(seed, cols, len(values)) + 1)
                        .cast("int"))


def _money(seed: str, cols, lo: float, hi: float):
    """2-decimal uniform 'money' double in [lo, hi) — cents-grid exact."""
    cents = int(round((hi - lo) * 100))
    return (F.lit(float(lo))
            + _u(seed, cols, cents).cast("double") / F.lit(100.0))


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        i.alias("c_custkey"),
        F.format_string("Customer#%09d", i).alias("c_name"),
        _u("c_nat", [i], 25).cast("int").alias("c_nationkey"),
        _money("c_bal", [i], -1000.0, 10000.0).alias("c_acctbal"),
        _pick("c_seg", [i], SEGMENTS).alias("c_mktsegment"))


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        i.alias("s_suppkey"),
        F.format_string("Supplier#%09d", i).alias("s_name"),
        _u("s_nat", [i], 25).cast("int").alias("s_nationkey"),
        _money("s_bal", [i], -1000.0, 10000.0).alias("s_acctbal"))


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        i.alias("p_partkey"),
        F.concat_ws(" ", _pick("p_adj", [i], P_ADJ),
                    _pick("p_noun", [i], P_NOUN)).alias("p_name"),
        F.format_string("Brand#%d",
                        _u("p_brand", [i], 25) + 1).alias("p_brand"),
        _pick("p_type", [i], TYPES).alias("p_type"),
        (_u("p_size", [i], 50) + 1).cast("int").alias("p_size"),
        _money("p_price", [i], 900.0, 2100.0).alias("p_retailprice"))


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    i = F.col("id")
    st = _u("o_st", [i], 100)
    return spark.range(n).select(
        i.alias("o_orderkey"),
        _u("o_cust", [i], n_cust).alias("o_custkey"),
        F.when(st < 49, F.lit("O")).when(st < 98, F.lit("F"))
        .otherwise(F.lit("P")).alias("o_orderstatus"),
        _money("o_total", [i], 1000.0, 500000.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(EPOCH_1995)
            + _u("o_date", [i], 2400) * F.lit(86400))
        .cast("timestamp_ntz").alias("o_orderdate"),
        _pick("o_pri", [i], PRIORITIES).alias("o_orderpriority"))


def gen_lineitem(spark: SparkSession, n_orders: int, n_part: int,
                 n_supp: int) -> DataFrame:
    """1..8 lines per order (mean ≈ 4.06; sf0.1 profiles 4.07),
    generated by a map-only sequence explode — no join, no shuffle."""
    o = F.col("id")
    ln = F.col("l_linenumber")
    # 1 + U(0,3) + U(0,3): triangular on 1..7, mean 4 — close to the
    # profiled peaked-at-3/4 shape, never the flat uniform
    base = (spark.range(n_orders)
            .select(o.alias("l_orderkey"),
                    F.explode(F.sequence(
                        F.lit(1),
                        (_u("l_n1", [o], 4)
                         + _u("l_n2", [o], 4) + 1).cast("int")))
                    .alias("l_linenumber")))
    k = [F.col("l_orderkey"), ln]
    qty = (_u("l_qty", k, 50) + 1).cast("double")
    price = _money("l_px", k, 900.0, 2100.0)
    return base.select(
        "l_orderkey",
        _u("l_part", k, n_part).alias("l_partkey"),
        _u("l_supp", k, n_supp).alias("l_suppkey"),
        ln.cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        F.round(qty * price, 2).alias("l_extendedprice"),
        (_u("l_disc", k, 11).cast("double") / F.lit(100.0))
        .alias("l_discount"),
        (_u("l_tax", k, 9).cast("double") / F.lit(100.0))
        .alias("l_tax"),
        _pick("l_rf", k, ["A", "N", "R"]).alias("l_returnflag"),
        _pick("l_ls", k, ["O", "F"]).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(EPOCH_1995) + _u("l_ship", k, 2500) * F.lit(86400))
        .cast("timestamp_ntz").alias("l_shipdate"))


def gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    i = F.col("id")
    # 30 days of Jan 2024, microsecond jitter; value on the 0.01 grid
    # below 512 -> <= 51,200 distinct cells (the ev_ab vocabulary bound)
    return spark.range(n).select(
        i.alias("event_id"),
        F.timestamp_micros(
            F.lit(EPOCH_2024 * 1_000_000)
            + _h("e_ts", i) % F.lit(30 * 86400 * 1_000_000))
        .cast("timestamp_ntz").alias("ts"),
        _u("e_user", [i], n_users).alias("user_id"),
        _pick("e_type", [i], EVENT_TYPES).alias("event_type"),
        (_u("e_val", [i], 51200).cast("double") / F.lit(100.0))
        .alias("value"),
        F.format_string('{"k": %d}', _u("e_k", [i], 100))
        .alias("props"))


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    """10..100 tokens from the 31-word vocabulary; ~2% of docs are
    EXACT clones of their 500-block leader (planted duplicates keep
    the dedup operators honest at scale)."""
    i = F.col("id")
    dup = _u("d_dup", [i], 100) < 2
    seed_id = F.when(dup, i - F.pmod(i, F.lit(500))).otherwise(i)
    n_tok = (_u("d_len", [seed_id], 91) + 10).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda j: F.element_at(
            F.array(*[F.lit(w) for w in DOC_VOCAB]),
            (F.pmod(F.abs(F.xxhash64(F.lit("d_tok"), seed_id, j)),
                    F.lit(len(DOC_VOCAB))) + 1).cast("int")))
    text = F.array_join(toks, " ")
    return spark.range(n).select(
        i.alias("doc_id"),
        text.alias("text"),
        F.when(_u("d_lang", [i], 10) < 6, F.lit("en"))
        .otherwise(_pick("d_lang2", [i], LANGS[1:])).alias("lang"),
        F.format_string("src%d", _u("d_src", [i], 20)).alias("source"),
        F.length(text).cast("long").alias("n_chars"))


def gen_embeddings(spark: SparkSession, n: int) -> DataFrame:
    """64-dim float vectors, NEAR-RANDOM like the real testdata: the
    sf0.1 embeddings measure max pairwise cosine ≈ 0.6, mean ≈ 0.0, and
    SAME-LABEL mean cosine ≈ 0.0 — labels carry NO geometric cluster
    structure. The first cut of this generator mixed a per-label
    centroid in (same-label cosine 0.92) and the sf1 decade run blew
    the LSH/SemDeDup/kNN operators up 40-68× on the 10× step — not an
    operator regression but a DATA regression: a corpus where every
    same-label pair is a 0.9-cosine near-dup has a quadratically
    growing TRUE answer. Matching the real near-random geometry keeps
    the decade comparison apples-to-apples. Component range
    ≈ [-0.39, 0.39] like sf0.1."""
    i = F.col("id")
    label = _u("m_lab", [i], 10)
    dims = F.sequence(F.lit(0), F.lit(63))
    vec = F.transform(
        dims,
        lambda j: ((F.pmod(F.abs(F.xxhash64(F.lit("m_n"), i, j)),
                           F.lit(1601)).cast("double") - 800.0)
                   / F.lit(2050.0)).cast("float"))
    return spark.range(n).select(
        i.alias("vec_id"),
        vec.alias("embedding"),
        label.cast("int").alias("label"))


# sf1 row targets = 10x the profiled sf0.1 counts
BASE = {"customer": 150_000, "supplier": 10_000, "part": 200_000,
        "orders": 1_500_000, "events": 1_000_000,
        "documents": 50_000, "embeddings": 20_000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--slices", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()
    out = args.out or f"/root/repo/scale_data/sf{args.sf:g}"
    n = {t: max(1, int(c * args.sf)) for t, c in BASE.items()}

    from influxdb_ha_spark.session import get_spark
    spark = get_spark(app_name="gen_scale",
                      extra_conf={
                          "spark.driver.memory": "8g",
                          # the engine session reads nanos-as-long; the
                          # driver testdata is physically timestamp[us] —
                          # match it exactly (pyarrow-verified parity)
                          "spark.sql.parquet.outputTimestampType":
                              "TIMESTAMP_MICROS"})
    t0 = time.time()
    os.makedirs(out, exist_ok=True)

    def write(name: str, df: DataFrame):
        ts = time.time()
        # repartition by range id upstream is unnecessary — range() is
        # already evenly sliced; coalesce only to keep file counts sane
        (df.write.mode("overwrite")
         .parquet(os.path.join(out, f"{name}.parquet")))
        print(f"  {name:12s} {time.time() - ts:6.1f}s")

    # fixed dims: copy sf0.1 verbatim (identical at every SF)
    for t in ("region", "nation"):
        write(t, spark.read.parquet(f"{SRC}/{t}.parquet"))
    write("customer", gen_customer(spark, n["customer"]))
    write("supplier", gen_supplier(spark, n["supplier"]))
    write("part", gen_part(spark, n["part"]))
    write("orders", gen_orders(spark, n["orders"], n["customer"]))
    write("lineitem", gen_lineitem(spark, n["orders"], n["part"],
                                   n["supplier"]))
    write("events", gen_events(spark, n["events"],
                               max(1, int(1500 * args.sf * 10))))
    write("documents", gen_documents(spark, n["documents"]))
    write("embeddings", gen_embeddings(spark, n["embeddings"]))
    print(f"gen_scale sf={args.sf:g} -> {out}  "
          f"({time.time() - t0:.1f}s total)")
    spark.stop()


if __name__ == "__main__":
    main()
