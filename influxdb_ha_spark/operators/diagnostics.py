"""Plan-shape diagnostics run BEFORE committing to a shuffle strategy
(added scope — the reference proxies InfluxQL only, service/routing.go:
137-138, but every operator in this repo that documents "salt the hot
keys" or "broadcast the small side" presumes somebody MEASURED the key
distribution first; this module is that measurement, as a first-class
distributed operator rather than a notebook one-off).

- key_skew_profile : the salting decision table for a prospective
  join/groupBy key — top heavy keys with exact counts, parts-per-million
  share, and the integer salt fan-out that would level each one back to
  the mean. The companion of sketch.join_sample_estimate (which sizes
  the JOIN OUTPUT; this sizes the key DISTRIBUTION feeding it) and of
  graph.degree_histogram (the same audit on graph adjacency).
- column_profile : the one-sweep data profiler — per column: row/null
  counts, HLL-estimated distinct cardinality, lexicographic min/max —
  the "what is actually in this table" report run before schema
  decisions (which columns can bucket, which need dictionary encoding,
  which are accidentally constant or accidentally unique).

Everything is built-in DataFrame ops, integer-exact end-to-end (counts,
floor divisions — no floats anywhere), so any partitioning and any
engine agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_cols: list,
                     top: int = 20) -> DataFrame:
    """Exact skew profile of a prospective shuffle key: the `top`
    heaviest key values with, per key, the row count, its
    parts-per-million share of the table, and `salt_factor` — the
    number of salt shards that would split this key's partition back
    down to the mean key load (ceil(cnt / mean), the fan-out you pass
    to a salted repartition or the AQE skew-join threshold you set).
    `total_rows` / `n_keys` ride along as 1-row broadcast scalars so
    the table is self-contained.

    NULL is profiled as a key value like any other — the unmatched
    foreign key parked at NULL is the single most common hot key in
    production joins, and a profiler that silently dropped it would
    miss exactly the skew it exists to find.

    All arithmetic is integer floor division (share_ppm =
    cnt·10⁶ div total, mean = total div n_keys, salt_factor =
    (cnt + mean − 1) div mean), so the output is engine-exact with no
    rounding contract.

    Scale shape: ONE key-keyed count aggregation (partials combine
    map-side — the profile of a 100 TB key column moves |distinct keys|
    rows, not data rows), a TakeOrderedAndProject for the top slice
    (cnt desc, keys asc — deterministic under ties), and a 1-row scalar
    crossJoin(broadcast) for the totals (the q11/tpch_q15 convention).
    The profiler is strictly cheaper than the shuffle it de-risks.
    """
    if not key_cols:
        raise ValueError("key_skew_profile: key_cols must be non-empty")
    if top < 1:
        raise ValueError("key_skew_profile: top must be >= 1")
    counts = (df.groupBy(*[F.col(k) for k in key_cols])
              .agg(F.count(F.lit(1)).alias("cnt")))
    stats = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"))
    topk = counts.orderBy(
        F.col("cnt").desc(),
        *[F.col(k).asc_nulls_first() for k in key_cols]).limit(int(top))
    return (topk.crossJoin(F.broadcast(stats))
            .select(*key_cols, "cnt",
                    F.expr("(cnt * 1000000) div total_rows")
                    .alias("share_ppm"),
                    F.expr("(cnt + (total_rows div n_keys) - 1) "
                           "div (total_rows div n_keys)")
                    .alias("salt_factor"),
                    "total_rows", "n_keys"))


def column_profile(df: DataFrame, cols: list) -> DataFrame:
    """One-sweep column profiler: for each named column, the row count,
    null count, HLL-estimated distinct cardinality (the m = 256
    register sketch of operators/sketch.py — deterministic, so the
    estimate is a testable value), and the lexicographic min/max of the
    column's STRING rendering. The report behind storage/layout
    decisions: a column with est_distinct ≈ n_rows is a candidate
    unique key (bucket/sort on it), est_distinct in the hundreds is a
    dictionary/partition column, n_null ≈ n_rows is dead weight, and
    min_s/max_s expose accidental sentinel values ('', '0', 'NULL').

    Values are profiled through their string rendering — ONE unified
    row shape for any input schema, and exactly reproducible for
    string and integral columns (both engines render them
    identically). Float renderings differ across engines in general
    (Java's Double.toString vs DuckDB's shortest-round-trip), so
    cross-engine-gated profiles should stick to string/int columns;
    min_s/max_s compare bytewise, which for non-negative fixed-width
    integers also matches numeric order.

    Returns (col_name, n_rows, n_null, est_distinct, min_s, max_s),
    one row per profiled column; est_distinct is NULL for an all-null
    column (no values to sketch).

    Scale shape: the stack (one array-of-structs explode — map-side,
    ×|cols| rows but ZERO extra scans: column pruning keeps the read
    at exactly the profiled columns) feeds two bounded aggregations:
    a (col_name) stats agg carrying 4 integer/string partials and the
    (col_name, register) HLL maxima (≤ 256 rows per column out of the
    map side) folded by sketch._hll_fold. Both are map-side
    combinable; the final join is |cols| rows a side, broadcast. The
    ×|cols| row inflation is the price of one unified output shape —
    the alternative (C×(4+m) aggregate expressions in one pass, no
    explode) trades plan size for it and is the swap at very wide
    schemas.
    """
    if not cols:
        raise ValueError("column_profile: cols must be non-empty")
    from .sketch import hll_distinct

    stacked = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(c).cast("string").alias("__v"))
        for c in cols])).alias("s")).select("s.col_name", "s.__v")
    stats = (stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("__v").isNull().cast("long")).cast("long")
        .alias("n_null"),
        F.min("__v").alias("min_s"),
        F.max("__v").alias("max_s")))
    est = (hll_distinct(stacked, "__v", by=["col_name"])
           .select("col_name", "est_distinct"))
    return (stats.join(F.broadcast(est), "col_name", "left")
            .select("col_name", "n_rows", "n_null", "est_distinct",
                    "min_s", "max_s"))


def zone_map(df: DataFrame, value_col: str, time_col: str = "time",
             bucket_ns: int = 86_400_000_000_000,
             pred_lo=None, pred_hi=None) -> DataFrame:
    """Zone map (per-time-bucket min/max statistics) for a column, plus
    the data-skipping verdict for a half-open predicate range — the
    primitive behind EVERY "100 TB scan that doesn't read 100 TB":
    parquet row-group stats, Delta/Iceberg file skipping, and
    partition pruning are all this table consulted before I/O. The
    operator materializes it as a first-class result so the pruning
    RATIO of a planned predicate is measurable ("would a [lo, hi)
    filter skip 97% of days, or is this column uncorrelated with
    time?") — min/max involve no arithmetic, so the map is engine-
    exact even for doubles.

    `prunable` (only when pred_lo/pred_hi given) is the skip decision
    for value ∈ [pred_lo, pred_hi): TRUE iff v_max < pred_lo or
    v_min >= pred_hi — a bucket whose whole range misses the predicate
    never needs its rows read. A FALSE is conservative by
    construction (stats overlap ⇏ rows match), exactly like the real
    readers.

    Returns (bucket, n_rows, n_null, v_min, v_max[, prunable]) — one
    row per time bucket; v_min/v_max NULL for an all-null bucket
    (which is then prunable for ANY range: no values can match).

    Scale shape: ONE map-side-combinable groupBy on the bucket key —
    the zone map of a 100 TB table moves |buckets| rows; this is the
    cheapest diagnostic in the module and the one that pays for
    itself first.
    """
    if int(bucket_ns) < 1:
        raise ValueError(f"zone_map: bucket_ns must be >= 1, "
                         f"got {bucket_ns!r}")
    bkt = (F.col(time_col)
           - F.pmod(F.col(time_col), F.lit(int(bucket_ns))))
    out = (df.where(F.col(time_col).isNotNull())
           .groupBy(bkt.alias("bucket"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col(value_col).isNull().cast("long"))
                .cast("long").alias("n_null"),
                F.min(value_col).alias("v_min"),
                F.max(value_col).alias("v_max")))
    if pred_lo is None and pred_hi is None:
        return out
    if pred_lo is None or pred_hi is None:
        raise ValueError("zone_map: pass both pred_lo and pred_hi "
                         "(half-open [lo, hi)) or neither")
    prunable = (F.col("v_max").isNull()
                | (F.col("v_max") < F.lit(pred_lo))
                | (F.col("v_min") >= F.lit(pred_hi)))
    return out.withColumn("prunable", prunable)


def join_advisor(left: DataFrame, right: DataFrame,
                 left_key: str, right_key: str,
                 rate: int = 64,
                 broadcast_max_rows: int = 1_000_000,
                 skew_salt_threshold: int = 4) -> DataFrame:
    """The join-strategy decision TABLE for a prospective equi-join —
    every number the "broadcast the small side / salt the hot keys /
    let it shuffle" advice in SCALE.md presumes, measured in one
    operator, plus the decision itself as a column. Per side: exact
    row count, exact distinct-key count, the heaviest key's row count
    and the salt fan-out that would level it (the key_skew_profile
    arithmetic); across sides: the coordinated-sample join-size
    estimate (the sketch.join_sample_estimate estimator — both sides
    keep the same 1/`rate` hash slice of the key space, surviving
    pairs scale by rate ONCE). `recommendation` is a deterministic
    CASE over those numbers:

      broadcast_right / broadcast_left  — a side fits under
        `broadcast_max_rows` (rows as the proxy for the real bytes
        threshold; smaller side wins a tie);
      salted_shuffle — both sides too big and either side's heaviest
        key exceeds `skew_salt_threshold` × its mean key load (the
        partition that would straggle);
      shuffle — big, level keys: the plain hash/sort-merge exchange
        is the right plan.

    The decision is DATA-dependent by design: the same query
    broadcast-joins at sf0.01 and salt-shuffles at 100 TB — which is
    exactly why the probe exists as an operator and not as a constant
    in someone's head.

    Returns ONE row: (n_left, n_right, keys_left, keys_right,
    max_key_left, max_key_right, salt_left, salt_right,
    sampled_pairs, est_pairs, recommendation).

    Scale shape: per side ONE key-keyed count groupBy (map-side
    combinable; |distinct keys| rows) folded to a 1-row summary — the
    row count, EXACT key count and max key load all fall out of the
    same shuffle, which is why no HLL is needed here; the sample join
    touches ~1/rate of each side with the predicate pushed into the
    scan; everything then combines as 1-row broadcast scalars (the
    q11 convention). Strictly cheaper than the join it de-risks.
    """
    if rate < 1:
        raise ValueError(f"join_advisor: rate must be >= 1, got {rate!r}")
    from .hashing import hash64_expr

    def side(df, key):
        counts = (df.where(F.col(key).isNotNull())
                  .groupBy(F.col(key).alias("__k"))
                  .agg(F.count(F.lit(1)).alias("__c")))
        # coalesce to 0 for an empty/all-null side (r10 review: NULL
        # aggregates made every recommendation WHEN evaluate to NULL
        # and fall through to the wrong branch)
        return counts.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("keys"),
            F.coalesce(F.max("__c"), F.lit(0)).cast("long")
            .alias("max_key"))

    ls = side(left, left_key).select(
        F.col("n").alias("n_left"), F.col("keys").alias("keys_left"),
        F.col("max_key").alias("max_key_left"))
    rs = side(right, right_key).select(
        F.col("n").alias("n_right"), F.col("keys").alias("keys_right"),
        F.col("max_key").alias("max_key_right"))
    lh = F.pmod(hash64_expr(F.col(left_key).cast("string")),
                F.lit(int(rate)))
    rh = F.pmod(hash64_expr(F.col(right_key).cast("string")),
                F.lit(int(rate)))
    samp = (left.where(F.col(left_key).isNotNull() & (lh == 0))
            .select(F.col(left_key).alias("__k"))
            .join(right.where(F.col(right_key).isNotNull() & (rh == 0))
                  .select(F.col(right_key).alias("__k")), "__k")
            .agg(F.count(F.lit(1)).cast("long").alias("sampled_pairs")))
    one = ls.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(samp))
    # integer salt factors: ceil(max_key / mean key load), mean =
    # n div keys (the key_skew_profile arithmetic, floor-division only)
    # coalesce(…, 1): an empty side has mean load 0 div 0 = NULL — no
    # key to salt, fan-out 1
    salt_l = F.expr("coalesce((max_key_left + (n_left div keys_left) "
                    "- 1) div (n_left div keys_left), 1L)")
    salt_r = F.expr("coalesce((max_key_right + (n_right div keys_right)"
                    " - 1) div (n_right div keys_right), 1L)")
    bmax = F.lit(int(broadcast_max_rows))
    sthr = F.lit(int(skew_salt_threshold))
    rec = (F.when((F.col("n_right") <= bmax)
                  & (F.col("n_right") <= F.col("n_left")),
                  F.lit("broadcast_right"))
           .when(F.col("n_left") <= bmax, F.lit("broadcast_left"))
           .when(F.col("n_right") <= bmax, F.lit("broadcast_right"))
           .when((F.col("salt_left") >= sthr)
                 | (F.col("salt_right") >= sthr), F.lit("salted_shuffle"))
           .otherwise(F.lit("shuffle")))
    return (one
            .withColumn("salt_left", salt_l)
            .withColumn("salt_right", salt_r)
            .select("n_left", "n_right", "keys_left", "keys_right",
                    "max_key_left", "max_key_right",
                    "salt_left", "salt_right", "sampled_pairs",
                    (F.col("sampled_pairs") * F.lit(int(rate)))
                    .cast("long").alias("est_pairs"),
                    rec.alias("recommendation")))


def salted_distinct_count(df: DataFrame, key_cols: list,
                          value_col: str, salts: int = 16) -> DataFrame:
    """EXACT per-key distinct count via value-hash salting — the
    executable form of the hot-key fix every SCALE.md "salt the hot
    keys" note describes, for the aggregate where it genuinely
    matters: COUNT(DISTINCT) is not algebraic (plain map-side combine
    cannot help — Spark expands the input per distinct aggregate), so
    one hot key funnels its whole distinct set into one task. The
    two-phase form splits each key's distinct set across `salts`
    partitions on salt = xxhash64(value) mod salts — the SAME value
    always lands in the SAME salt, so per-(key, salt) exact distinct
    partials are disjoint and their plain SUM is the exact per-key
    answer. No approximation anywhere; the salting changes the PLAN
    (no single-task distinct sort), never the result — the pytest
    pins equality with the direct count_distinct, and the DuckDB
    oracle IS the direct form.

    This is the exact-count sibling of the bounded-state sketches
    (hll_distinct estimates in O(m); this pays the true shuffle but
    levels it) and the aggregation-side twin of _bottom_k's salted
    KMV build.

    Returns (key..., n_distinct).

    Scale shape: one (key, salt)-keyed distinct aggregation — the hot
    key's distinct set is split `salts` ways, each partition bounded
    by ~|distinct(key)|/salts — then a |keys|·salts → |keys| integer
    sum. Raise `salts` with cluster size; any value splits the same
    way on every executor, so the result is partitioning-independent.
    """
    if not key_cols:
        raise ValueError("salted_distinct_count: key_cols must be "
                         "non-empty")
    if int(salts) < 1:
        raise ValueError(f"salted_distinct_count: salts must be >= 1, "
                         f"got {salts!r}")
    salt = F.pmod(F.xxhash64(F.col("__v").cast("string")),
                  F.lit(int(salts)))
    partial = (df.where(F.col(value_col).isNotNull())
               .select(*key_cols, F.col(value_col).alias("__v"))
               .withColumn("__salt", salt)
               .groupBy(*key_cols, "__salt")
               .agg(F.count_distinct(F.col("__v")).alias("__p")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("__p").cast("long").alias("n_distinct")))
