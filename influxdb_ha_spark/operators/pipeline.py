"""Corpus-level training-data pipeline operators.

The ops a pretraining data pipeline runs between raw corpus and training
shards, beyond dedup/similarity (dedup.py, similarity.py):

- decontaminate : flag training docs sharing k-gram shingles with an
                  evaluation/benchmark set (test-set contamination check).
- train_test_split : deterministic hash split — reproducible on any
                  cluster layout, no RNG state to ship.
- stratified_sample : exact-N per stratum by hash rank — balanced
                  subsampling across sources.

All deterministic via the md5-derived hash64 convention (hashing.py), so
DuckDB oracles reproduce them bit-for-bit.

Scale shapes: decontamination broadcasts the (small) benchmark shingle
set and probes it map-side — the corpus never shuffles; the split is pure
projection; stratified sampling shuffles once on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash64_expr, shingles_expr, tokens_expr
from .util import ensure_min_parallelism


def decontaminate(train: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3) -> DataFrame:
    """Benchmark-contamination check: for each training doc, the number of
    distinct k-gram shingles it shares with the evaluation set.

    The classic pretraining hygiene step (n-gram overlap decontamination):
    the eval side collapses to a distinct shingle set — small by
    construction (benchmarks are tiny next to the corpus) — which Catalyst
    broadcasts; the training corpus is probed map-side and only matching
    (doc, shingle) rows reach the count aggregation. No corpus shuffle,
    no N² anything; cost is one shingling pass over each side.

    Returns (id, n_shared_shingles) for contaminated docs only.
    """
    def sh(df):
        return F.explode(F.array_distinct(
            shingles_expr(tokens_expr(F.col(text_col)), k)))

    ev = (eval_set.select(sh(eval_set).alias("__sh")).distinct())
    tr = (ensure_min_parallelism(train)
          .select(F.col(id_col), sh(train).alias("__sh")))
    return (tr.join(F.broadcast(ev), "__sh")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared_shingles")))


def train_test_split(df: DataFrame, id_col: str = "doc_id",
                     test_pct: int = 10) -> DataFrame:
    """Deterministic split: md5-hash of the id mod 100 < test_pct → 'test'.

    Hash-based (not rand()) so the assignment is stable across runs,
    partitionings, and engines — the property that matters when the split
    must be reproducible months later on different hardware. Pure
    projection; zero shuffle.
    """
    bucket = hash64_expr(F.col(id_col).cast("string")) % 100
    return df.select(
        F.col(id_col),
        F.when(bucket < test_pct, "test").otherwise("train").alias("split"))


def stratified_sample(df: DataFrame, stratum_col: str = "source",
                      id_col: str = "doc_id", n_per_stratum: int = 10) -> DataFrame:
    """Exactly n docs per stratum, chosen by hash rank (deterministic).

    One shuffle on the stratum key; the per-stratum window is bounded by
    stratum size (strata are the partition unit, so no global funnel).
    Hash-ranking instead of rand() gives the same sample on any layout.
    """
    h = hash64_expr(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.select(stratum_col, id_col)
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= n_per_stratum)
            .drop("__r"))
