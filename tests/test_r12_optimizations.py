"""Focused pins for the r12 optimization round's internal changes.

Two invariants the optimizations rely on:
1. Pre-computed norms (norm_expr / _jvm_literal_norms) produce
   BIT-identical cosines to the inline cosine_expr fold — the whole
   "3 folds → 1 fold per pair" rewrite is only legal because of this.
2. The keyed-persist graph caches change physical layout only: the
   one-round vote/contribution results are row-identical to an
   unpartitioned persist.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vecs(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)])
            for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_prenorm_cosine_bit_identical(vecs):
    """dot/(na_pre*nb_pre) == cosine_expr inline, bit for bit (no round)."""
    from influxdb_ha_spark.operators.similarity import (
        cosine_expr, dot_expr, norm_expr)
    a = vecs.select(F.col("vec_id").alias("ia"),
                    F.col("embedding").alias("va"),
                    norm_expr(F.col("embedding")).alias("na"))
    b = vecs.select(F.col("vec_id").alias("ib"),
                    F.col("embedding").alias("vb"),
                    norm_expr(F.col("embedding")).alias("nb"))
    pairs = a.crossJoin(b).where(F.col("ia") < F.col("ib"))
    both = pairs.select(
        cosine_expr(F.col("va"), F.col("vb")).alias("inline"),
        (dot_expr(F.col("va"), F.col("vb"))
         / (F.col("na") * F.col("nb"))).alias("pre"))
    # exact equality of the DOUBLE bits — no tolerance
    assert both.where(F.col("inline") != F.col("pre")).count() == 0
    assert both.count() == 60 * 59 // 2


def test_jvm_literal_norms_match_inline_fold(spark, vecs):
    """_jvm_literal_norms == the per-row inline sqrt(aggregate(...))
    including the decimal-literal parsing semantics (the reason the
    constant is evaluated in the JVM, not Python)."""
    from influxdb_ha_spark.operators.similarity import _jvm_literal_norms
    vlists = [r["embedding"] for r in vecs.limit(8).collect()]
    norms = _jvm_literal_norms(spark, vlists)
    for v, n in zip(vlists, norms):
        arr = "array(" + ", ".join(repr(float(x)) for x in v) + ")"
        inline = spark.sql(
            f"SELECT sqrt(aggregate({arr}, cast(0.0 as double), "
            f"(a, x) -> a + x * x)) AS n").first()["n"]
        assert inline == n  # bitwise


def test_literal_cos_sql_cnorm_inlining_bit_identical(spark, vecs):
    """_literal_cos_sql with (norm_col, cnorm) == the old fully-inline
    form, bit for bit, on real float32-origin vectors."""
    from influxdb_ha_spark.operators.similarity import (
        _literal_cos_sql, _jvm_literal_norms, ROW_NORM_SQL)
    cents = [r["embedding"] for r in vecs.limit(3).collect()]
    norms = _jvm_literal_norms(spark, cents)
    base = vecs.withColumn("__v", F.col("embedding")) \
               .withColumn("__nv", F.expr(ROW_NORM_SQL))
    for cv, cn in zip(cents, norms):
        old = F.expr(_literal_cos_sql(cv))                # inline norms
        new = F.expr(_literal_cos_sql(cv, norm_col="__nv", cnorm=cn))
        assert base.select((old != new).alias("d")) \
                   .where(F.col("d")).count() == 0


def _kcore_refilter(spark, edges, k, rounds):
    """The pre-r12 kcore shape, verbatim semantics: re-filter the full
    edge list by the cumulative survivor set and re-aggregate induced
    degrees every round, + the final filtered degree pass."""
    from influxdb_ha_spark.operators.graph import _symmetric
    sym = _symmetric(edges)
    keep = None
    for _ in range(rounds):
        cur = sym
        if keep is not None:
            cur = (sym.join(keep.select(F.col("node").alias("dst")), "dst")
                   .join(keep.select(F.col("node").alias("src")), "src")
                   .select("src", "dst"))
        deg = (cur.groupBy(F.col("src").alias("node"))
               .agg(F.count(F.lit(1)).alias("__d")))
        keep = deg.where(F.col("__d") >= k).select("node")
    final = (sym.join(keep.select(F.col("node").alias("dst")), "dst")
             .join(keep.select(F.col("node").alias("src")), "src")
             .groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("core_degree"))
             .where(F.col("core_degree") >= k))
    return final


@pytest.mark.parametrize("k,rounds", [(1, 1), (2, 2), (3, 4), (4, 8)])
def test_kcore_decremental_equals_refilter(spark, k, rounds):
    """The r12 decremental peel (degrees update by subtracting removed
    neighbors; early exit on an empty removed set) is row-identical to
    the old full-refilter loop for every (k, rounds) — including deep
    cascades (a path graph peels one layer per round) and the
    converged-early regime."""
    from influxdb_ha_spark.operators.graph import kcore
    import random
    rnd = random.Random(11)
    # a random graph + a long path (deep peel cascade) + a dense clique
    rows = {(rnd.randrange(40), rnd.randrange(40)) for _ in range(120)}
    rows |= {(100 + i, 101 + i) for i in range(12)}        # path
    rows |= {(200 + i, 200 + j) for i in range(6) for j in range(i + 1, 6)}
    rows = [(a, b) for a, b in rows if a != b]
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in rows],
        "src long, dst long").distinct()
    got = sorted(map(tuple, kcore(edges, k=k, rounds=rounds).collect()))
    want = sorted(map(tuple,
                      _kcore_refilter(spark, edges, k, rounds).collect()))
    assert got == want


def test_keyed_persist_row_identical_one_round(spark):
    """One pagerank-shaped round over a keyed-persisted cache equals the
    plain-persisted cache row-for-row (layout-only change)."""
    from influxdb_ha_spark.operators.graph import _keyed_persist
    edges = spark.createDataFrame(
        [(i % 17, (i * 7) % 23) for i in range(300)], "src long, dst long")
    contrib = (edges.select(F.col("src").alias("node")).distinct()
               .select(F.col("node").alias("src"),
                       (F.col("node") * 3 + 1).alias("__c")))

    def one_round(cache):
        return (cache.join(contrib.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__c").alias("__s")))

    plain = edges.persist()
    keyed = _keyed_persist(edges, "src")
    try:
        a = sorted(map(tuple, one_round(plain).collect()))
        b = sorted(map(tuple, one_round(keyed).collect()))
        assert a == b and len(a) > 0
    finally:
        plain.unpersist()
        keyed.unpersist()
