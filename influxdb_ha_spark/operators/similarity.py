"""Similarity search over embedding columns (`array<float>`).

Two paths:
- `brute_force_topk` — exact cosine top-k: queries × corpus with the query
  side broadcast. Correct baseline; O(|Q|·N) dot products, all inside
  whole-stage codegen (`zip_with` + `aggregate` — no Python, no Arrow hop).
- `ivf_topk` — IVF-style scale path: corpus is bucketed by nearest centroid
  (one broadcast join against C centroids), then each query probes only its
  `nprobe` nearest centroid buckets. At 100 TB the corpus×centroid assignment
  is a map-only pass and the probe join shuffles on `centroid_id` — search
  cost drops to ~nprobe/C of brute force.

Deterministic (tie-break on id) so the DuckDB oracle can mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, fully columnar."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `broadcast(queries)` makes the cross join a map-side nested loop — the
    corpus never shuffles, which is the property that survives a 100 TB scan.
    Excludes self-matches.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def assign_centroids(corpus: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment (broadcast join over C centroids)."""
    c = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("cent"))
    scored = (corpus.crossJoin(F.broadcast(c))
              .select(id_col, vec_col, "centroid_id",
                      cosine_expr(F.col(vec_col), F.col("cent")).alias("sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(),
                                           F.col("centroid_id").asc())
    return (scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1).drop("r", "sim"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the `nprobe` nearest centroid buckets.

    Recall < 1.0 by design; the oracle mirrors the same bucketing so the
    correctness gate checks the *algorithm*, not brute-force equivalence.
    """
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    c = centroids.select("centroid_id", F.col(vec_col).alias("cent"))
    qscored = (queries.crossJoin(F.broadcast(c))
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"), "centroid_id",
                       cosine_expr(F.col(vec_col), F.col("cent")).alias("sim")))
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("centroid_id").asc())
    probes = (qscored.withColumn("r", F.row_number().over(wq))
              .where(F.col("r") <= nprobe).select("query_id", "qv", "centroid_id"))
    cand = probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("cv"), "centroid_id"),
        "centroid_id")
    scored = (cand.where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
