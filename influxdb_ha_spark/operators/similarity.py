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

import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import keep
from .util import ensure_min_parallelism, scale_parts

# Same dial as the graph loops' edge caches (one knob, one meaning):
# source-parquet bytes per partition for the pair stages' pinned
# exchanges; the session conf is the floor, so gate/bench scales keep
# the session shape. See graph._CACHE_PART_BYTES for the calibration.
_PAIR_PART_BYTES = int(os.environ.get("SPARK_GRAFT_CACHE_PART_BYTES",
                                      str(8 * 1024 * 1024)))
_PAIR_PARTS_CAP = 8192


def _pair_parts(df: DataFrame) -> int:
    """Scale-adaptive partition count for the pair stages (util.scale_parts
    with the shared dial)."""
    return scale_parts(df, _PAIR_PART_BYTES, _PAIR_PARTS_CAP)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, fully columnar."""
    na = norm_expr(a)
    nb = norm_expr(b)
    return dot_expr(a, b) / (na * nb)


def dot_expr(a: Column, b: Column) -> Column:
    """The dot-product fold of cosine_expr, exposed so pair stages can
    divide by PRE-computed norms (see norm_expr)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(vec: Column) -> Column:
    """sqrt(Σx²) with cosine_expr's exact fold (same lambda, same float→
    double promotion, left-to-right) — a norm computed ONCE per vector
    and reused per pair produces bit-identical cosines to the inline
    form, because the IEEE op sequence per result value is unchanged.
    The r12 optimization round moved every pair-verify stage to
    `dot_expr / (na_pre * nb_pre)`: per-pair array folds drop 3 → 1
    (measured ~2× on the LSH verify stage at sf0.1), values identical."""
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension distribution stats (min/max/mean/stddev) over an
    embedding column — the profiling pass that feeds normalization /
    quantization parameter choices.

    posexplode → groupBy(dim): the shuffle key is the dimension index, so
    reduce parallelism = dim (perfectly uniform — every row contributes
    exactly one value per dim); partial aggregation means the exchange
    carries dim·P summary rows, not N·dim values.
    """
    d = ensure_min_parallelism(df)
    ex = d.select(F.posexplode(vec_col).alias("dim", "v")) \
        .select("dim", F.col("v").cast("double").alias("v"))
    return (ex.groupBy("dim")
            .agg(F.min("v").alias("dim_min"),
                 F.max("v").alias("dim_max"),
                 F.avg("v").alias("dim_mean"),
                 F.count(F.lit(1)).alias("n")))


def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """L2-normalize each embedding (map-only, codegen'd — zero shuffle).
    Zero vectors pass through unscaled (norm clamped away from /0).
    Adds `norm` (the pre-normalization magnitude) and replaces the vector.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return (ensure_min_parallelism(df)
            .withColumn("norm", norm)
            .withColumn(vec_col, F.transform(v, lambda x: x / safe)))


def scalar_quantize(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", bits: int = 8) -> DataFrame:
    """Per-dimension scalar quantization to `bits` (int8 by default) — the
    standard 4× compression step before ANN indexing.

    Two passes: (1) `dim_stats` reduces the corpus to dim rows of min/max,
    collected driver-side (O(dim) — same bounded-collect convention as the
    k-means centroids); (2) the quantization itself is a map-only
    `transform` with the per-dim ranges inlined as literal arrays — zero
    shuffle over the corpus, whole-stage codegen, no second scan cost
    beyond the stats pass. q = clamp(floor((x-min)/(max-min) * 2^bits)).
    Constant dims (max == min) quantize to 0.
    """
    levels = (1 << bits) - 1
    stats = {r["dim"]: (r["dim_min"], r["dim_max"])
             for r in dim_stats(df, vec_col).collect()}
    dims = sorted(stats)
    mn = F.array(*[F.lit(stats[d][0]) for d in dims])
    rng = F.array(*[F.lit(stats[d][1] - stats[d][0]) for d in dims])
    q = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            rng[i] > 0,
            F.least(F.lit(levels), F.greatest(F.lit(0), F.floor(
                (x.cast("double") - mn[i]) / rng[i] * F.lit(levels + 1))))
        ).otherwise(F.lit(0)).cast("int"))
    return df.select(F.col(id_col), q.alias("qvec"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `broadcast(queries)` makes the cross join a map-side nested loop — the
    corpus never shuffles, which is the property that survives a 100 TB scan.
    Excludes self-matches.
    """
    # pre-computed norms on BOTH sides of the |Q|·N nested loop: the
    # corpus row's norm folds once instead of |Q| times, the broadcast
    # query's once instead of N times — per-pair folds 3 → 1,
    # bit-identical (norm_expr)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm_expr(F.col(vec_col)).alias("__qn"))
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("__cn"))
    cos = dot_expr(F.col("qv"), F.col("cv")) / (F.col("__qn")
                                                * F.col("__cn"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# Above this many inlined literal terms (C centroids × dim), the generated
# SQL / codegen for the literal-array argmax path explodes: plan strings hit
# SparkStringUtils truncation, analysis time grows superlinearly, and the
# codegen'd method can blow the JIT's 8 KB inline budget. IVF-scale codebooks
# (C=4096, dim=768 ≈ 3M terms) must take the executor-broadcast Arrow path
# instead — still map-only, still zero corpus shuffle.
LITERAL_TERM_CAP = 65_536



def _literal_cos_sql(vec: list, norm_col: str | None = None,
                     cnorm: float | None = None) -> str:
    """Cosine of the `__v` column against one literal centroid vector —
    THE expression whose doubles must stay bit-identical between
    assign_centroids and knn_graph (home bucket = probe[0] relies on
    it) and which every IVF-family oracle replays. One definition
    (r5 review; the _fr/_bucket_means consolidation precedent).

    r12 optimization (bit-identical): the CENTROID norm is a plan-time
    constant — `_jvm_literal_norms` evaluates the EXACT same
    sqrt(aggregate(...)) expression once in the JVM at build time (a
    Python-side double fold is NOT bit-safe: Spark parses the plain
    decimal literals as DECIMAL, so x*x is exact decimal arithmetic
    before the double add — measured 18/48 last-ulp mismatches vs a
    double fold) and the captured value is inlined via cast(str as
    double), an exact repr round-trip. That removes C·dim flops/row —
    the norm used to be recomputed per row per centroid, the same order
    of work as the dots themselves. The ROW norm is likewise hoisted:
    pass `norm_col` naming a column holding `sqrt(aggregate(__v, ...))`
    computed ONCE per row; with C centroids that removes another
    (C−1)·dim flops/row. Per-row work drops ~4·C·dim → 2·C·dim + dim;
    argmax winners are unchanged because every double is unchanged."""
    arr = "array(" + ", ".join(repr(float(x)) for x in vec) + ")"
    row_norm = norm_col if norm_col is not None else (
        "sqrt(aggregate(__v, cast(0.0 as double), (a, x) -> a + x * x))")
    # r12 advice guard: a NON-FINITE captured norm would round-trip via
    # cast('nan'/'inf' as double), which relies on Spark's special-
    # literal cast parsing (an ANSI-strict/older cast yields NULL and
    # the cosines would silently go NULL instead of NaN). Fall back to
    # the inline fold for that centroid — same doubles by construction.
    if cnorm is not None and not math.isfinite(cnorm):
        cnorm = None
    cn = (f"cast('{cnorm!r}' as double)" if cnorm is not None else
          f"sqrt(aggregate({arr}, cast(0.0 as double), "
          f"(a, x) -> a + x * x))")
    return (f"aggregate(zip_with(__v, {arr}, (x, y) -> x * y), "
            f"cast(0.0 as double), (a, x) -> a + x) / "
            f"({row_norm} * {cn})")


ROW_NORM_SQL = ("sqrt(aggregate(__v, cast(0.0 as double), "
                "(a, x) -> a + x * x))")


def _jvm_literal_norms(spark, vecs) -> list[float]:
    """Evaluate sqrt(Σx²) for each literal vector ONCE in the JVM with
    the exact expression _literal_cos_sql used to inline per row — the
    values (including their decimal-literal parsing semantics) are
    bit-identical to the per-row form by construction. One driver-local
    1-row query per plan build; the parse cost is bounded by the same
    LITERAL_TERM_CAP that bounds the sims expression itself.

    NOTE (r12 advice): this makes PLAN CONSTRUCTION of the literal-path
    callers (assign_centroids, knn_graph and everything composing them)
    run one blocking driver-side Spark job — the same eager-probe
    convention as the centroid collect() those callers already perform.
    Non-finite captured norms are guarded at the inlining site
    (_literal_cos_sql falls back to the inline fold)."""
    exprs = ", ".join(
        "sqrt(aggregate(array({terms}), cast(0.0 as double), "
        "(a, x) -> a + x * x))".format(
            terms=", ".join(repr(float(x)) for x in v))
        for v in vecs)
    return [float(v) for v in spark.sql(
        f"SELECT array({exprs}) AS n").first()["n"]]


def _list_col_matrix(arr):
    """(n, dim) float64 matrix from an Arrow list<float/double> column —
    WITHOUT the per-row Python conversion loop (guide §4.2: a list
    column in a record batch is one contiguous values buffer plus an
    offsets array, so uniform-length embeddings reshape for free). The
    per-row fallback covers ragged/null inputs (degenerate by contract —
    they would have thrown in the old per-row path too). Values are
    identical to the old `np.asarray([np.asarray(v) for v in vecs])`
    stack: the same float32→float64 cast elementwise, same row order —
    measured 16 s of the sf10 semantic_dedup assignment was exactly this
    conversion loop over 208k rows."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        if arr.null_count == 0 and len(arr):
            offsets = arr.offsets.to_numpy()
            widths = np.diff(offsets)
            if (widths == widths[0]).all():
                vals = arr.values.to_numpy(zero_copy_only=False)
                m = vals[offsets[0]:offsets[-1]].astype(np.float64,
                                                        copy=False)
                return m.reshape(len(arr), int(widths[0]))
    except AttributeError:
        pass  # not a variable-length list layout — per-row fallback
    return np.asarray([np.asarray(v, dtype=np.float64)
                       for v in arr.to_pylist()])


def _assign_centroids_arrow(corpus: DataFrame, cents: list,
                            id_col: str, vec_col: str) -> DataFrame:
    """Large-C nearest-centroid assignment: one Arrow-batched matmul per
    batch against an executor-broadcast (C × dim) matrix.

    Same semantics as the literal path: cosine similarity, first-maximum
    tie-break (= lowest centroid_id — the matrix rows are sorted by id),
    and Spark's NaN-is-largest ordering (a NaN sim wins argmax; an
    all-NaN row — zero-norm vector — falls to the first centroid), so the
    two paths produce identical assignments up to summation-order ULPs.

    r13: mapInArrow instead of a pandas_udf — the batch matrix comes
    from the list column's flat values buffer (_list_col_matrix), not a
    208k-iteration Python conversion loop, and the pass-through columns
    ride the record batch untouched (no Arrow→pandas→Arrow transpose).
    The numpy expression chain is UNCHANGED op for op, so assignments
    are bit-identical to the r12 pandas_udf form."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import IntegerType, StructField

    mat = np.asarray([[float(x) for x in r[vec_col]] for r in cents],
                     dtype=np.float64)                    # (C, dim)
    cent_ids = np.asarray([int(r["centroid_id"]) for r in cents],
                          dtype=np.int32)
    cnorm = np.sqrt((mat * mat).sum(axis=1))              # (C,)
    # ship once per executor, not once per task closure
    bc = corpus.sparkSession.sparkContext.broadcast((mat, cent_ids, cnorm))
    src = ensure_min_parallelism(corpus)
    vec_idx = src.columns.index(vec_col)

    # Row-chunk the (rows × C) sims intermediate to ~32 MB: at C = N/64
    # a 10k-row Arrow batch otherwise allocates 3 × 10k×C×8 B transient
    # matrices PER WORKER (sims, the nan_to_num copy, the division
    # temp) — 32 concurrent workers × ~750 MB thrashed this 128 GB box
    # into kcompactd storms at sf10 (guide §5: bound per-task state).
    # Chunking is bit-identical: every per-row op and its operand order
    # are unchanged, rows are merely processed in slices.
    chunk = max(256, int(4e6 / max(1, len(cents))))

    def nearest(batches):
        m, cids, cn = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                yield batch.append_column(
                    "centroid_id", pa.array([], type=pa.int32()))
                continue
            M = _list_col_matrix(batch.column(vec_idx))
            out = np.empty(len(M), dtype=np.int32)
            for s in range(0, len(M), chunk):
                Mc = M[s:s + chunk]
                vnorm = np.sqrt((Mc * Mc).sum(axis=1))    # (n,)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (Mc @ m.T) / (vnorm[:, None] * cn[None, :])
                # NaN → +inf replicates Spark array_max's NaN-largest
                # ordering; np.argmax takes the FIRST max = lowest
                # centroid_id on ties
                out[s:s + chunk] = np.argmax(
                    np.nan_to_num(sims, nan=np.inf, posinf=np.inf,
                                  neginf=-np.inf), axis=1)
            yield batch.append_column(
                "centroid_id", pa.array(cids[out], type=pa.int32()))

    # NOTE: never src.schema.add(...) — StructType.add mutates the
    # DataFrame's CACHED schema object in place and corrupts src itself
    from pyspark.sql.types import StructType
    out_schema = StructType(list(src.schema.fields)
                            + [StructField("centroid_id", IntegerType())])
    return src.mapInArrow(nearest, out_schema)


def _probe_centroids_arrow(corpus: DataFrame, cents: list, nprobe: int,
                           vec_col: str,
                           out_col: str = "__probes") -> DataFrame:
    """Large-C probe-list computation: the top-`nprobe` nearest
    centroids per row, ordered (sim DESC, centroid_id ASC), as one
    Arrow-batched matmul per batch against an executor-broadcast
    (C × dim) matrix — `_assign_centroids_arrow` generalized from
    argmax to an ordered top-n.

    This is the scale path the r12 sf10 decade bought: knn_graph's old
    large-C fallback (ivf_topk with queries = the whole corpus) pushed
    N·C rows through a per-query row_number window — with the IVF
    C = N/64 contract that exchange is N²/64 ROWS, measured 71× on the
    sf1 → sf10 step (957 s at N = 200k). The same N·C cosines in
    batched numpy are GEMM flops, not shuffle rows: map-only, zero
    corpus shuffle, linear in N at bounded nprobe.

    Same ordering semantics as the literal comparator (knn_graph's
    small-C path): stable argsort on −sims with NaN → +inf, so NaN
    sims sort first (Spark's NaN-largest), and ties keep matrix order
    = ascending centroid_id. Probe lists agree with the literal path
    up to summation-order ULPs on near-tied sims (the
    _assign_centroids_arrow contract, pytest-pinned).

    r13: mapInArrow with the flat-values-buffer batch matrix — see
    _assign_centroids_arrow; the numpy chain is unchanged op for op."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import ArrayType, IntegerType, StructField

    mat = np.asarray([[float(x) for x in r[vec_col]] for r in cents],
                     dtype=np.float64)                    # (C, dim)
    cent_ids = np.asarray([int(r["centroid_id"]) for r in cents],
                          dtype=np.int32)
    cnorm = np.sqrt((mat * mat).sum(axis=1))              # (C,)
    n_probe = min(int(nprobe), len(cents))
    bc = corpus.sparkSession.sparkContext.broadcast((mat, cent_ids,
                                                     cnorm))
    src = ensure_min_parallelism(corpus)
    vec_idx = src.columns.index(vec_col)

    # same ~32 MB sims row-chunking as _assign_centroids_arrow (§5
    # per-task state bound); bit-identical — per-row ops unchanged
    chunk = max(256, int(4e6 / max(1, len(cents))))

    def probes(batches):
        m, cids, cn = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                yield batch.append_column(
                    out_col, pa.array([], type=pa.list_(pa.int32())))
                continue
            M = _list_col_matrix(batch.column(vec_idx))
            order = np.empty((len(M), n_probe), dtype=np.int64)
            for s in range(0, len(M), chunk):
                Mc = M[s:s + chunk]
                vnorm = np.sqrt((Mc * Mc).sum(axis=1))    # (n,)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (Mc @ m.T) / (vnorm[:, None] * cn[None, :])
                sims = np.nan_to_num(sims, nan=np.inf, posinf=np.inf,
                                     neginf=-np.inf)
                order[s:s + chunk] = np.argsort(
                    -sims, axis=1, kind="stable")[:, :n_probe]
            flat = pa.array(cids[order].reshape(-1), type=pa.int32())
            lists = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(M) + 1) * n_probe, n_probe,
                                   dtype=np.int32), type=pa.int32()),
                flat)
            yield batch.append_column(out_col, lists)

    # fresh StructType — StructType.add would mutate src's cached schema
    from pyspark.sql.types import StructType
    out_schema = StructType(
        list(src.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()))])
    return src.mapInArrow(probes, out_schema)


def assign_centroids(corpus: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment, MAP-ONLY.

    The C centroids are bounded (k×dim — same collect convention as the
    k-means loop), so they inline as literal arrays and each corpus row
    computes all C cosines + argmax inside one codegen'd projection.
    The previous shape (crossJoin(broadcast) → per-id row_number window)
    materialized N×C rows and shuffled them on the row id purely to pick
    a max — at 100 TB that's C× the scan volume through an exchange for
    something a projection expresses. Tie-break preserved: argmax takes
    the FIRST maximum = lowest centroid_id, exactly what the old
    (sim DESC, centroid_id ASC) ordering picked; the cosine expression
    tree is the same aggregate(zip_with(...)) shape, so the doubles are
    bit-identical and downstream oracles (IVF bucketing) see identical
    assignments.

    Size-gated: above LITERAL_TERM_CAP inlined terms (C × dim) the literal
    SQL itself becomes the bottleneck, so the assignment switches to
    `_assign_centroids_arrow` — an executor-broadcast numpy argmax, still
    map-only with zero corpus shuffle."""
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    if not cents:
        # an empty centroid frame would build a degenerate empty-array
        # argmax that assigns garbage silently (r5 advice) — fail
        # loudly, the trend-family cap convention
        raise ValueError("assign_centroids: centroid frame is empty — "
                         "train or seed centroids before assignment")
    if len(cents) * len(cents[0][vec_col]) > LITERAL_TERM_CAP:
        return _assign_centroids_arrow(corpus, cents, id_col, vec_col)
    ids = ", ".join(str(int(r["centroid_id"])) for r in cents)
    norms = _jvm_literal_norms(corpus.sparkSession,
                               [r[vec_col] for r in cents])
    sims = "array(" + ", ".join(
        _literal_cos_sql(r[vec_col], norm_col="__nv", cnorm=n)
        for r, n in zip(cents, norms)) + ")"
    other = [c for c in corpus.columns]
    return (ensure_min_parallelism(corpus)
            .withColumn("__v", F.expr(vec_col))
            .withColumn("__nv", F.expr(ROW_NORM_SQL))
            .withColumn("__sims", F.expr(sims))
            .selectExpr(*[f"`{c}`" for c in other],
                        # greatest(...,1): a degenerate all-NaN sim row
                        # (zero-norm vector) falls to centroid[0] instead
                        # of erroring on index 0
                        f"element_at(array({ids}), greatest(cast("
                        f"array_position(__sims, array_max(__sims)) as int)"
                        f", 1)) AS centroid_id"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the `nprobe` nearest centroid buckets.

    Recall < 1.0 by design; the oracle mirrors the same bucketing so the
    correctness gate checks the *algorithm*, not brute-force equivalence.
    """
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    # pre-computed norms on every side (norm_expr): the |Q|·C probe
    # scoring and the probe-bucket verify both fold only the dot —
    # per-pair folds 3 → 1, bit-identical
    c = centroids.select("centroid_id", F.col(vec_col).alias("cent"),
                         norm_expr(F.col(vec_col)).alias("__cn"))
    qpre = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qv"),
                          norm_expr(F.col(vec_col)).alias("__qn"))
    qsim = dot_expr(F.col("qv"), F.col("cent")) / (F.col("__qn")
                                                   * F.col("__cn"))
    qscored = (qpre.crossJoin(F.broadcast(c))
               .select("query_id", "qv", "__qn", "centroid_id",
                       qsim.alias("sim")))
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("centroid_id").asc())
    probes = (qscored.withColumn("r", F.row_number().over(wq))
              .where(F.col("r") <= nprobe)
              .select("query_id", "qv", "__qn", "centroid_id"))
    cand = probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("cv"), "centroid_id",
                        norm_expr(F.col(vec_col)).alias("__nn")),
        "centroid_id")
    cos = dot_expr(F.col("qv"), F.col("cv")) / (F.col("__qn")
                                                * F.col("__nn"))
    scored = (cand.where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# -- near-duplicate pairs ---------------------------------------------------

def _hyperplanes(dim: int, bits: int, tables: int,
                 seed: int = 7) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (MINSTD LCG) —
    plain literals, identical on every executor and across engines."""
    state = seed
    out = []
    for _ in range(tables):
        tbl = []
        for _ in range(bits):
            plane = []
            for _ in range(dim):
                state = (state * 48_271) % 2_147_483_647
                plane.append(state / 2_147_483_647 * 2.0 - 1.0)
            tbl.append(plane)
        out.append(tbl)
    return out


def _sign_key(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-packed sign pattern of `vec` against each hyperplane (pure
    column-expression form; kept for reference/fallback)."""
    key = F.lit(0)
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        key = key + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return key


def _sign_keys_frame(df: DataFrame, id_col: str, vec_col: str,
                     planes: list[list[list[float]]]) -> DataFrame:
    """(id, __k array<long>): all tables' bit-packed sign keys in one
    Arrow-batched matmul — (batch × dim) @ (dim × tables·bits) → signs →
    bit-pack per table. ~2 matrix ops per batch instead of
    tables×bits×dim codegen scalar ops — the documented exception to
    'stay JVM-side' for wide embedding math. r13: mapInArrow with the
    flat-values-buffer batch matrix (_list_col_matrix) instead of a
    pandas_udf's per-row conversion loop; the numpy chain is unchanged,
    so keys are bit-identical (they are exact integers anyway)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    P = np.array(planes, dtype=np.float64)          # (T, B, D)
    T_, B, D = P.shape
    flat = P.reshape(T_ * B, D).T                   # (D, T*B)
    weights = (1 << np.arange(B, dtype=np.int64))   # bit packing
    src = df.select(id_col, vec_col)

    def keys(batches):
        for batch in batches:
            if batch.num_rows == 0:
                yield pa.RecordBatch.from_arrays(
                    [batch.column(0),
                     pa.array([], type=pa.list_(pa.int64()))],
                    ["__sk_id", "__k"])
                continue
            M = _list_col_matrix(batch.column(1))
            signs = (M @ flat >= 0).reshape(len(M), T_, B)
            packed = (signs * weights).sum(axis=2)  # (N, T)
            lists = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(M) + 1) * T_, T_,
                                   dtype=np.int32), type=pa.int32()),
                pa.array(packed.reshape(-1), type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), lists], ["__sk_id", "__k"])

    out_schema = StructType([
        StructField("__sk_id", src.schema[id_col].dataType),
        StructField("__k", ArrayType(LongType()))])
    return (src.mapInArrow(keys, out_schema)
            .select(F.col("__sk_id").alias(id_col), "__k"))


def derived_lsh_bits(n: int, target_occupancy: int = 64,
                     lo: int = 4, hi: int = 24) -> int:
    """bits = ceil(log2(N / target_occupancy)), clamped to [lo, hi]:
    expected bucket occupancy N/2^bits stays ~target_occupancy as the
    corpus grows, so candidate pairs per table stay ~N·occupancy/2 —
    LINEAR in N. The r11 sf1 decade measured the fixed-bits form at
    6.35× on a 10× data step (candidates grow ~N²/2^bits at fixed
    bits); this is the same k ∝ N contract the IVF gate adopted as
    C = N/64."""
    if n <= target_occupancy:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_occupancy))))


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int = 64, bits: int | None = None,
                          tables: int = 3, target_occupancy: int = 64,
                          max_bucket: int | None = None) -> DataFrame:
    """All pairs with cosine >= threshold, LSH-bucketed — the scale path.

    Random-hyperplane LSH: vectors agreeing on all `bits` signs in any of
    `tables` hash tables become candidates; candidates are verified with
    exact cosine. Precision is exact (verification); recall is the standard
    SimHash-LSH bound (P[pair found] = 1-(1-(1-θ/π)^bits)^tables — raise
    `tables`/lower `bits` to trade cost for recall). The corpus shuffles on
    the bucket key only; no N² cross join ever materializes, unlike the
    exact baseline which is quadratic by construction.

    `bits=None` (the default) DERIVES bits from the corpus size so the
    expected bucket occupancy N/2^bits tracks `target_occupancy` — the
    bits ∝ log N contract the r11 decade showed a fixed `bits` violates
    (see derived_lsh_bits). NOTE: the derivation counts the corpus, so
    constructing the plan runs one eager Spark job (the ks_test probe
    convention); pass an explicit `bits` for lazy composition.

    `max_bucket` (opt-in) is the loud occupancy guard: if any (table,
    key) bucket exceeds it, the plan RAISES instead of silently going
    bucket-quadratic — the legitimate trigger is a corpus of mass-
    duplicated identical vectors, whose TRUE pair answer is itself
    quadratic and deserves an explicit decision, not a slow job.
    """
    if bits is None:
        bits = derived_lsh_bits(df.count(), target_occupancy)
    planes = _hyperplanes(dim, bits, tables, seed=7)
    # No ensure_min_parallelism here: the sign-key map is one numpy matmul
    # per Arrow batch (~µs/row), and the bucket join immediately shuffles
    # on (tbl, key) which restores full parallelism for the expensive
    # verify stage. Pre-repartitioning the raw vectors was measured +66%
    # at sf0.1 (BENCH_r02) for zero benefit — util.py's own guidance:
    # don't fan out ahead of cheap maps.
    #
    # Round-4 shape fix: the bucket self-join used to carry the VECTORS
    # through the (tbl, key) exchange — 3 tables × the full embedding
    # volume shuffled, and the self-join's two references ran the Arrow
    # sign-key pass twice. Now only (id, tbl, key) — three longs — enters
    # the bucket join (persisted, so the UDF runs once), and vectors are
    # joined back for the LSH-bounded candidate pairs only.
    keyed = keep(
        "cosine_near_dup_pairs.keyed",
        _sign_keys_frame(df, id_col, vec_col, planes)
        .select(id_col, F.posexplode("__k").alias("tbl", "key")))
    a = keyed.select(F.col(id_col).alias("id_a"), "tbl", "key")
    b = keyed.select(F.col(id_col).alias("id_b"), "tbl", "key")
    # r13: the candidate dedup's exchange is PINNED to the scale-adaptive
    # partition count via an explicit repartition on the pair key — the
    # dedup still costs exactly ONE exchange (the repartition REPLACES
    # the aggregation's own ENSURE_REQUIREMENTS exchange, which
    # hash-partitions on the same key), but REPARTITION_BY_NUM is never
    # AQE-coalesced. Without it, AQE coalesced the ~16-byte candidate
    # rows to its 64 MB advisory size — 1-2 partitions at sf0.1 — and the
    # verify stage's interpreted zip_with/aggregate cosine fold (the
    # expensive part: higher-order functions don't codegen) ran nearly
    # serially: measured 1.96 → 1.06 s warm at sf0.1 (verify stage
    # ~1.37 → ~0.32 s; the dedup's map-side partial is forfeited, which
    # costs ~nothing — candidate duplicates across tables are rare).
    cand = (a.join(b, ["tbl", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .repartition(_pair_parts(df), "id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))
    # pre-computed norms (norm_expr): with target_occupancy ~64 each
    # vector enters ~tables·occupancy pairs, so inlining its norm per
    # pair cost 2 extra dim-folds per candidate; hoisting them into the
    # N-row va/vb projections cuts verify folds 3 → 1, bit-identical
    # (measured 3.34 → 1.63 s warm at sf0.1 in one session)
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   norm_expr(F.col(vec_col)).alias("__na"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                   norm_expr(F.col(vec_col)).alias("__nb"))
    cos = F.round(dot_expr(F.col("va"), F.col("vb"))
                  / (F.col("__na") * F.col("__nb")), 6)
    out = (cand.join(va, "id_a").join(vb, "id_b")
           .select("id_a", "id_b", cos.alias("cosine"))
           .where(F.col("cosine") >= threshold))
    if max_bucket is not None:
        # loud occupancy guard, expressed as a FILTER predicate so no
        # downstream projection can prune it away (the hits auth_fp
        # lesson): one map-combinable count + a 1-row max broadcast
        occ = (keyed.groupBy("tbl", "key")
               .agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.coalesce(F.max("__n"), F.lit(0)).alias("__mx")))
        out = (out.crossJoin(F.broadcast(occ))
               .where(F.when(
                   F.col("__mx") > F.lit(int(max_bucket)),
                   F.raise_error(F.lit(
                       "cosine_near_dup_pairs: an LSH bucket exceeds "
                       f"max_bucket={int(max_bucket)} — the corpus has a "
                       "mass-duplicated sign pattern, so the bucket "
                       "verify stage (and likely the TRUE answer) is "
                       "quadratic; raise bits/target_occupancy, dedup "
                       "exact-identical vectors first, or raise "
                       "max_bucket deliberately")).cast("boolean"))
                   .otherwise(F.lit(True)))
               .drop("__mx"))
    return out


def cluster_purity(corpus: DataFrame, centroids: DataFrame,
                   label_col: str = "label", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Clustering-quality eval harness — the emb_recall discipline
    applied to clustering: assign every LABELED vector to its nearest
    centroid (assign_centroids' map-only literal argmax — same
    assignment the IVF family gates on) and report per-cluster purity,
    the majority-label fraction (Manning, Raghavan & Schütze, IR book
    §16.3's external clustering criterion). Majority tie-break pinned
    (count DESC, label ASC) so the winner is engine-independent; purity
    = n_majority / n_vectors, two exact integers, one round-6 division.
    Rows with NULL labels are excluded by contract (they have no vote).

    Output per non-empty cluster: (centroid_id, n_vectors,
    majority_label, n_majority, purity).

    Shape at 100 TB: assignment is map-only (zero corpus shuffle); the
    ONLY exchange carries (centroid_id, label) pair counts — ≤ C·L
    rows; the majority pick is a window over the C-sized key set.
    """
    labeled = corpus.where(F.col(label_col).isNotNull())
    a = assign_centroids(labeled, centroids, id_col=id_col,
                         vec_col=vec_col)
    cl = (a.groupBy("centroid_id", F.col(label_col).alias("label"))
          .agg(F.count(F.lit(1)).alias("__n")))
    sizes = (cl.groupBy("centroid_id")
             .agg(F.sum("__n").alias("n_vectors")))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("__n").desc(), F.col("label").asc())
    best = (cl.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("centroid_id", F.col("label").alias("majority_label"),
                    F.col("__n").alias("n_majority")))
    pur = F.floor(F.col("n_majority").cast("double")
                  / F.col("n_vectors").cast("double")
                  * F.lit(1_000_000) + F.lit(0.5)) / F.lit(1e6)
    return (sizes.join(best, "centroid_id")
            .select("centroid_id",
                    F.col("n_vectors").cast("long").alias("n_vectors"),
                    "majority_label", "n_majority", pur.alias("purity")))


def semantic_dedup(corpus: DataFrame, centroids: DataFrame, eps: float = 0.9,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster: int | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus, then remove rows whose
    embedding is within cosine `eps` of an earlier-id row in the SAME
    cluster. Returns the surviving corpus rows.

    The greedy keep rule is deterministic (a row is a duplicate iff some
    same-cluster row with a smaller id scores >= eps against it), so a
    SQL oracle can mirror it exactly — unlike the paper's
    farthest-from-centroid heuristic, which changes nothing about the
    cost model.

    100 TB shape: centroid assignment is the map-only `assign_centroids`
    pass (zero corpus shuffle); the corpus rows cross ONE exchange ever
    (the centroid_id-partitioned persist below — the pair stage reads
    both of its sides co-partitioned from that cache, exchange-free)
    and the pairwise work is quadratic strictly WITHIN a cluster —
    SemDeDup's own design point: pick k proportional to N (the paper
    uses 50k clusters for LAION-440M) so cluster sizes stay bounded, and
    the per-cluster work is s² at bounded s, never N². Only (id, vector)
    ride the exchange. The final anti-join carries NO broadcast hint on
    purpose: at the method's target regime the duplicate set is a large
    FRACTION of N (the paper prunes ~50% of LAION), so forcing a
    broadcast would collect O(N) ids to the driver — Spark auto-
    broadcasts when the set is actually small and AQE picks the join
    strategy otherwise.
    """
    # persisted (generation-bounded): both sides of the pair join
    # reference the assignment subtree — without keep() the C-cosine
    # argmax map runs twice over the corpus
    # the persisted assignment also carries each vector's norm (one
    # 8-byte double next to the dim·4-byte vector): the s²-per-cluster
    # pair stage then folds only the dot — per-pair folds 3 → 1,
    # cosines bit-identical
    #
    # r13: the cache is hash-partitioned on centroid_id at the
    # scale-adaptive count BEFORE persisting (the graph _keyed_persist
    # pattern): both pair-join sides then read co-partitioned from the
    # cache, so the pair join needs NO exchange at all — the old shape
    # re-shuffled the full (id, vector, norm) row set TWICE (once per
    # side) on centroid_id, and AQE coalesced those exchanges toward its
    # 64 MB advisory, starving the s²-per-cluster interpreted cosine
    # fold of parallelism exactly at scale (sf10's 34-60 s). One N-row
    # exchange is paid ONCE at persist; the REPARTITION_BY_NUM count is
    # never AQE-coalesced.
    parts = _pair_parts(corpus)
    assigned = keep(
        "semantic_dedup.assigned",
        assign_centroids(corpus, centroids, id_col, vec_col)
        .select(F.col("centroid_id"), F.col(id_col), F.col(vec_col),
                norm_expr(F.col(vec_col)).alias("__n"))
        .repartition(parts, "centroid_id"))
    a = assigned.select(F.col("centroid_id").alias("__ca"),
                        F.col(id_col).alias("__id_a"),
                        F.col(vec_col).alias("__va"),
                        F.col("__n").alias("__na"))
    b = assigned.select(F.col("centroid_id"),
                        F.col(id_col).alias("__id_b"),
                        F.col(vec_col).alias("__vb"),
                        F.col("__n").alias("__nb"))
    cos = (dot_expr(F.col("__va"), F.col("__vb"))
           / (F.col("__na") * F.col("__nb")))
    # r13: LEFT SEMI instead of pairs → filter → distinct. The greedy
    # rule is an EXISTS ("some earlier-id same-cluster row scores
    # >= eps"), so the semi join is the direct form: it emits each
    # duplicate id exactly once (the distinct's whole job — one O(|dup|)
    # exchange gone) and short-circuits the per-row scan of the cluster
    # bucket at the FIRST qualifying partner instead of folding cosines
    # against every earlier row. Same cosine expression, same round-6
    # comparison — the decision per id is bit-identical.
    cond = ((F.col("centroid_id") == F.col("__ca"))
            & (F.col("__id_a") < F.col("__id_b"))
            & (F.round(cos, 6) >= F.lit(eps)))
    dup_ids = (b.join(a, cond, "left_semi")
               .select(F.col("__id_b").alias(id_col)))
    out = corpus.join(dup_ids, id_col, "left_anti")
    if max_cluster is not None:
        # loud occupancy guard (opt-in, the LSH max_bucket precedent
        # verbatim — r12 verdict #4): one hot centroid makes a single
        # task own s² work (real embeddings cluster badly); expressed as
        # a FILTER predicate so no downstream projection can prune it
        # away. One map-combinable count + a 1-row max broadcast.
        occ = (assigned.groupBy("centroid_id")
               .agg(F.count(F.lit(1)).alias("__s"))
               .agg(F.coalesce(F.max("__s"), F.lit(0)).alias("__mx")))
        out = (out.crossJoin(F.broadcast(occ))
               .where(F.when(
                   F.col("__mx") > F.lit(int(max_cluster)),
                   F.raise_error(F.lit(
                       "semantic_dedup: a cluster exceeds max_cluster="
                       f"{int(max_cluster)} — the centroid set is too "
                       "coarse for this corpus (SemDeDup's k ∝ N "
                       "contract), so the within-cluster pair stage is "
                       "quadratic in that cluster; train more centroids "
                       "or raise max_cluster deliberately"))
                   .cast("boolean"))
                   .otherwise(F.lit(True)))
               .drop("__mx"))
    return out


def prototypicality(corpus: DataFrame, centroids: DataFrame,
                    prune_frac: float = 0.2, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Prototypicality scoring for data pruning (Sorscher et al. 2022,
    "Beyond neural scaling laws", arXiv:2206.14486): an example's score
    is its cosine to the assigned cluster centroid; at large data the
    winning strategy prunes the MOST prototypical (easiest) examples.
    Emits per-row `proto`, its within-cluster percentile, and a `keep`
    flag dropping the top `prune_frac` most-prototypical tail.

    Shape: assignment is the map-only `assign_centroids` pass; the
    scoring join is against the broadcast centroid table (k rows); the
    only shuffle is the within-cluster cume_dist window on
    `centroid_id` — bounded per-cluster sort under the same k ∝ N
    contract as `semantic_dedup`, and ranking per cluster (not
    globally) is the method's own design: pruning is calibrated within
    each concept, and no global all-rows window exists to funnel.
    Ordering ties break on id, so the percentile is deterministic and a
    SQL window replays it exactly.
    """
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    # centroid norms pre-folded on the k-row broadcast side (norm_expr):
    # per-row folds 3 → 2, bit-identical
    cents = centroids.select(F.col("centroid_id"),
                             F.col(vec_col).alias("__cv"),
                             norm_expr(F.col(vec_col)).alias("__cn"))
    proto = (dot_expr(F.col(vec_col), F.col("__cv"))
             / (norm_expr(F.col(vec_col)) * F.col("__cn")))
    scored = (assigned.join(F.broadcast(cents), "centroid_id")
              .select(F.col(id_col), F.col("centroid_id"),
                      F.round(proto, 6).alias("proto")))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("proto").asc(), F.col(id_col).asc())
    pctl = F.cume_dist().over(w)
    return scored.select(
        id_col, "centroid_id", "proto",
        F.round(pctl, 6).alias("pctl"),
        (pctl <= F.lit(1.0 - prune_frac)).alias("keep"))


def centroid_outliers(corpus: DataFrame, centroids: DataFrame,
                      pct: int = 5, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Distance-to-centroid outlier screen — prototypicality's
    complementary tail: where `prototypicality` prunes the top
    (easiest, most-prototypical) examples per Sorscher et al., this
    flags the BOTTOM of each cluster — vectors far from every concept
    the clustering knows, the standard embedding-space noise screen
    (mojibake, empty-ish pages, cross-modal garbage) run before
    training-set assembly.

    Each vector is assigned map-only (`assign_centroids`' literal
    argmax — the IVF assignment the whole emb family gates on), scored
    by round-6 cosine to its assigned centroid, then the bottom `pct`
    percent of each cluster is flagged by the EXACT integer rule
    100·rank ≤ pct·n over the (cosine ASC, id ASC) within-cluster
    order — a rank comparison of two integers, so no percentile
    interpolation ever touches the hash-gated plan (the ts_pettitt
    float-drift lesson applied proactively).

    Output per vector: (id, centroid_id, cosine, rank, is_outlier) —
    the audit view; filter is_outlier to apply.

    Shape at 100 TB: assignment and scoring are map-only (centroid
    table is k rows, broadcast); the ONLY shuffle is the
    within-cluster ranking window keyed by centroid_id carrying
    (id, centroid, one double) — cluster sizes are bounded under the
    same k ∝ N contract as semantic_dedup/prototypicality. The
    rank-free swap at extreme scale: approx per-cluster threshold via
    percentile_approx + a map-only compare (the quality_sample
    pattern), trading exactness at the boundary for zero sort.
    """
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    # centroid norms pre-folded on the k-row broadcast side (norm_expr):
    # per-row folds 3 → 2, bit-identical
    cents = centroids.select(F.col("centroid_id"),
                             F.col(vec_col).alias("__cv"),
                             norm_expr(F.col(vec_col)).alias("__cn"))
    cosv = (dot_expr(F.col(vec_col), F.col("__cv"))
            / (norm_expr(F.col(vec_col)) * F.col("__cn")))
    scored = (assigned.join(F.broadcast(cents), "centroid_id")
              .select(F.col(id_col), F.col("centroid_id"),
                      F.round(cosv, 6).alias("cosine")))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("cosine").asc(), F.col(id_col).asc())
    wn = Window.partitionBy("centroid_id")
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .select(id_col, "centroid_id", "cosine", "rank",
                    (F.lit(100) * F.col("rank")
                     <= F.lit(int(pct)) * F.col("__n"))
                    .alias("is_outlier")))


def l2_sq_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance of two double-array columns, fully columnar."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


# -- product quantization ----------------------------------------------------
# The last rung of the ANN compression ladder (brute → IVF → LSH → int8 SQ
# → PQ): vectors become m one-byte codes (dim·4 bytes → m bytes, 32× at the
# defaults) and query scoring becomes m table lookups instead of dim
# multiplies — the memory layout that lets a 100 TB embedding corpus fit an
# in-memory search tier.

def pq_train(corpus: DataFrame, m: int = 4, k: int = 16, iters: int = 4,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Train m per-subspace codebooks of k centroids (L2 Lloyd's, the PQ
    metric) — returns driver-side nested lists (m × k × dim/m floats,
    bounded like the k-means collect).

    Each subspace trains on a sliced projection of the corpus; the
    per-iteration shape matches kmeans_centroids (broadcast assignment →
    per-(centroid, dim) mean), only the metric differs. Deterministic
    init from the lowest-id vectors."""
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // m
    books = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.transform(vec_col, lambda x: x.cast("double")),
                    s * d + 1, d).alias("sv"))
        cents = [list(map(float, c)) for c in
                 (sub.orderBy(id_col).limit(k)
                  .select("sv").rdd.map(lambda r: r[0]).collect())]
        for _ in range(iters):
            # map-only argmin (same rationale as assign_centroids: never
            # materialize N×k rows or shuffle on the row id to pick a min);
            # size-gated like assign_centroids — beyond the literal budget
            # the codebook rides an executor broadcast through Arrow
            if k * d > LITERAL_TERM_CAP:
                assigned = (sub.withColumn(
                    "cid", _argmin_l2_udf(sub.sparkSession, cents)(
                        F.col("sv"))))
            else:
                dists = "array(" + ", ".join(
                    "aggregate(zip_with(sv, array({v}), (x, y) -> "
                    "(x - y) * (x - y)), cast(0.0 as double), (a, x) -> a + x)"
                    .format(v=", ".join(repr(float(x)) for x in c))
                    for c in cents) + ")"
                assigned = sub.selectExpr(
                    f"`{id_col}`", "sv",
                    f"cast(array_position({dists}, "
                    f"array_min({dists})) as int) - 1 AS cid")
            means = (assigned.select("cid",
                                     F.posexplode("sv").alias("pos", "v"))
                     .groupBy("cid", "pos").agg(F.avg("v").alias("mv"))
                     .groupBy("cid")
                     .agg(F.array_sort(F.collect_list(
                         F.struct("pos", "mv"))).alias("pm"))
                     .select("cid", F.transform(
                         "pm", lambda x: x["mv"]).alias("cent")))
            got = {r["cid"]: list(map(float, r["cent"]))
                   for r in means.collect()}
            cents = [got.get(i, cents[i]) for i in range(k)]
        books.append(cents)
    return books


def _argmin_l2_udf(spark_session, cents: list):
    """Arrow-batched L2 argmin against an executor-broadcast (k × d)
    codebook — the over-LITERAL_TERM_CAP fallback for the PQ training /
    encode literal paths. First-minimum tie-break matches the SQL
    `array_position(d, array_min(d))` convention."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(cents, dtype=np.float64)             # (k, d)
    bc = spark_session.sparkContext.broadcast(mat)

    def code(vecs):
        m = bc.value
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        # ‖x−c‖² per (row, centroid) via direct difference — O(N·k·d) but
        # summation order matches the SQL fold closely enough that only
        # exact ties (resolved identically: first min) are at risk
        d2 = ((M[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    code.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(code, "int")


def _books_sql(books) -> list[str]:
    """Per-subspace codebook as a SQL array<array<double>> literal."""
    return ["array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) for x in c) + ")"
        for c in book) + ")" for book in books]


def pq_encode(corpus: DataFrame, books, id_col: str = "vec_id",
              vec_col: str = "embedding",
              extra_cols: "Sequence[str]" = ()) -> DataFrame:
    """(id, [extra_cols...,] codes array<int>): per subspace, the
    L2-nearest codebook entry (first-min tie-break). Map-only —
    codebooks ride along as literals (m·k·dim/m doubles ≈ 8 KB at the
    defaults), the corpus never shuffles; one SQL string per code keeps
    the build off the py4j round-trip path. `extra_cols` pass through
    unchanged so callers composing with other map-only passes (IVF
    assignment) don't need a corpus-by-corpus join to reunite them."""
    m = len(books)
    d = len(books[0][0])
    if m * len(books[0]) * d > LITERAL_TERM_CAP:
        return _pq_encode_arrow(corpus, books, id_col, vec_col, extra_cols)
    cb = _books_sql(books)

    def sub(s: int) -> str:
        return (f"slice(transform(`{vec_col}`, x -> cast(x as double)), "
                f"{s * d + 1}, {d})")

    def code(s: int) -> str:
        dists = (f"transform({cb[s]}, c -> aggregate(zip_with({sub(s)}, c, "
                 f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), "
                 f"(a, x) -> a + x))")
        return (f"cast(array_position({dists}, array_min({dists})) - 1 "
                f"as int)")

    codes = "array(" + ", ".join(code(s) for s in range(m)) + ")"
    return (ensure_min_parallelism(corpus)
            .selectExpr(f"`{id_col}`", *[f"`{c}`" for c in extra_cols],
                        f"{codes} AS codes"))


def _pq_encode_arrow(corpus: DataFrame, books, id_col: str,
                     vec_col: str, extra_cols: "Sequence[str]" = ()
                     ) -> DataFrame:
    """Over-LITERAL_TERM_CAP pq_encode: all m codes in one Arrow pass
    against an executor-broadcast (m × k × d) codebook. Per-subspace
    matmul keeps batch memory at O(N·k), not O(N·k·d). First-min
    tie-break matches the SQL path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(books, dtype=np.float64)               # (m, k, d)
    bc = corpus.sparkSession.sparkContext.broadcast(B)

    def codes_fn(vecs):
        book = bc.value
        m_, _, d_ = book.shape
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(M), m_), dtype=np.int32)
        for s in range(m_):
            Ms = M[:, s * d_:(s + 1) * d_]                # (N, d)
            d2 = ((Ms[:, None, :] - book[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    codes_fn.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    udf = pandas_udf(codes_fn, "array<int>")
    return (ensure_min_parallelism(corpus)
            .select(F.col(id_col), *[F.col(c) for c in extra_cols],
                    udf(F.col(vec_col)).alias("codes")))


def _adc_sql(books) -> str:
    """The asymmetric-distance SQL expression Σ_s ‖q_s −
    codebook_s[code_s]‖² over columns `qv` (query vector) and `codes` —
    the single definition pq_topk and ivfpq_topk share (the scoring,
    cast chain and fold order must never diverge between them)."""
    m = len(books)
    d = len(books[0][0])
    cb = _books_sql(books)
    return " + ".join(
        f"aggregate(zip_with(slice(qv, {s * d + 1}, {d}), "
        f"element_at({cb[s]}, codes[{s}] + 1), "
        f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), "
        f"(a, x) -> a + x)" for s in range(m))


def _adc_rerank(scored: DataFrame, corpus: DataFrame, q: DataFrame,
                k: int, rerank: int, id_col: str,
                vec_col: str) -> DataFrame:
    """Shared PQ tail: keep the rerank·k best ADC candidates per query
    (adist asc, id asc tie-break), fetch their full vectors, exact-cosine
    re-rank, return top k. `scored` = (query_id, neighbor_id, adist)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc())
    cand = (scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= rerank * k)
            .select("query_id", "neighbor_id"))
    # pre-computed norms on both rerank sides (norm_expr): per-candidate
    # folds 3 → 1, bit-identical
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.transform(vec_col, lambda x: x.cast("double"))
                       .alias("nv"))
    nv = nv.withColumn("__nn", norm_expr(F.col("nv")))
    qn = q.select("query_id", "qv",
                  norm_expr(F.col("qv")).alias("__qn"))
    cosr = dot_expr(F.col("qv"), F.col("nv")) / (F.col("__qn")
                                                 * F.col("__nn"))
    exact = (cand.join(nv, "neighbor_id").join(F.broadcast(qn), "query_id")
             .select("query_id", "neighbor_id",
                     F.round(cosr, 6).alias("cosine")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))


def pq_topk(corpus: DataFrame, queries: DataFrame, books, k: int = 5,
            rerank: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance top-k: each candidate is scored as
    Σ_s ‖q_s − codebook_s[code_s]‖² — m array lookups per (query,
    candidate) instead of dim multiplies — then the top rerank·k
    candidates per query are re-ranked with exact cosine and the top k
    returned.

    Scale shape: codes are the only corpus-wide data touched by the ADC
    pass (m bytes/vector); queries broadcast; the exact re-rank join
    touches rerank·k·|Q| full vectors — a semi-joined sliver, mirroring
    the LSH verify-stage pattern."""
    codes = pq_encode(corpus, books, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.transform(vec_col, lambda x: x.cast("double"))
                       .alias("qv"))
    scored = (codes.join(F.broadcast(q),
                         codes[id_col] != q["query_id"])
              .selectExpr("query_id", f"`{id_col}` AS neighbor_id",
                          f"({_adc_sql(books)}) AS adist"))
    return _adc_rerank(scored, corpus, q, k, rerank, id_col, vec_col)


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
               books, k: int = 5, nprobe: int = 2, rerank: int = 4,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF+PQ composite search — the production ANN layout (FAISS's
    IVFPQ; Jégou et al. 2011): coarse-quantize the corpus into centroid
    buckets (IVF), compress residency to m byte-codes (PQ), then per
    query probe only `nprobe` buckets, ADC-score just those buckets'
    CODES, and exact-rerank the top rerank·k sliver.

    Scale shape: the index build is ONE map-only pass — assignment
    keeps all corpus columns, so encoding runs directly on the assigned
    frame with `centroid_id` passing through pq_encode's extra_cols
    (the earlier corpus⋈corpus join of the two passes was a full
    double exchange, r5 review fix). The search touches nprobe/C of the
    corpus and reads only m bytes per touched vector — the two savings
    multiply, which is why this is the layout that serves
    billion-vector corpora from RAM. The probe set (|Q|·nprobe rows,
    query vector included) broadcasts; full vectors are fetched only
    for the rerank·k·|Q| rerank sliver."""
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    codes = pq_encode(assigned, books, id_col, vec_col,
                      extra_cols=("centroid_id",))
    c = centroids.select("centroid_id", F.col(vec_col).alias("cent"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.transform(vec_col, lambda x: x.cast("double"))
                       .alias("qv"))
    qscored = (q.crossJoin(F.broadcast(c))
               .select("query_id", "qv", "centroid_id",
                       cosine_expr(F.col("qv"), F.col("cent")).alias("sim")))
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                                F.col("centroid_id").asc())
    probes = (qscored.withColumn("r", F.row_number().over(wq))
              .where(F.col("r") <= nprobe)
              .select("query_id", "qv", "centroid_id"))
    scored = (codes.join(F.broadcast(probes), "centroid_id")
              .where(F.col(id_col) != F.col("query_id"))
              .selectExpr("query_id", f"`{id_col}` AS neighbor_id",
                          f"({_adc_sql(books)}) AS adist"))
    return _adc_rerank(scored, corpus, q, k, rerank, id_col, vec_col)


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 5,
               pool: int = 20, lam: float = 0.5, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): take each query's `pool` nearest neighbors, then greedily
    select k of them maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    relevance traded against redundancy, the standard de-duplicated
    retrieval head over an ANN candidate pool.

    The greedy selection is inherently sequential per query (each pick
    changes the penalty term), so it runs in applyInPandas grouped by
    query_id over the POOL-BOUNDED candidate set — the same
    parallelism contract as LTTB (series = unit): the corpus-scale work
    is the candidate generation (brute force here; swap in
    ivf/pq/ivfpq for scale), and the Python stage touches only
    |Q|·pool rows. Ties break on lowest candidate id — deterministic,
    replayable."""
    import math

    import numpy as np
    import pandas as pd

    cands = brute_force_topk(corpus, queries, k=pool, id_col=id_col,
                             vec_col=vec_col)
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.transform(vec_col, lambda x: x.cast("double"))
                       .alias("nv"))
    # broadcast the POOL side (bounded: |Q|*pool rows) so fetching the
    # candidates' vectors is a map-only probe over the corpus — at sf0.01
    # AQE would broadcast the tiny corpus instead, which inverts at scale
    pool_df = F.broadcast(cands.select("query_id", "neighbor_id", "cosine")) \
        .join(nv, "neighbor_id")

    def _fold_dot(a: list, b: list) -> float:
        # sequential left-fold in index order — the oracle's list_reduce
        s = 0.0
        for x, y in zip(a, b):
            s = s + x * y
        return s

    def select(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        # pairwise cosine pinned to the ORACLE's exact operand order
        # (r5 advice): left-fold dot and squared-norm sums in index
        # order, then dot / (sqrt(na)*sqrt(nb)) — NOT normalize-then-
        # BLAS-matmul, whose pairwise summation is mathematically equal
        # but not bit-identical; the unrounded red feeds the greedy
        # argmax, so a ulp can flip a near-tied pick cross-engine.
        # Cost is pool^2 * dim floats per query — pool-bounded.
        rows = [list(map(float, v)) for v in pdf["nv"]]
        n = len(rows)
        nrm = [math.sqrt(_fold_dot(a, a)) or 1.0 for a in rows]
        pw = np.empty((n, n), dtype=np.float64)
        for i in range(n):
            for j in range(n):
                pw[i, j] = (_fold_dot(rows[i], rows[j])
                            / (nrm[i] * nrm[j]))
        sim_q = pdf["cosine"].to_numpy(dtype=np.float64)
        ids = pdf["neighbor_id"].to_numpy()
        chosen: list[int] = []
        out = []
        avail = np.ones(n, dtype=bool)
        for rank in range(1, min(k, n) + 1):
            if chosen:
                red = pw[np.ix_(avail, chosen)].max(axis=1)
            else:
                red = np.zeros(int(avail.sum()))
            score = lam * sim_q[avail] - (1.0 - lam) * red
            # first max = lowest neighbor_id (rows sorted by id)
            pick_rel = int(np.argmax(score))
            pick = np.nonzero(avail)[0][pick_rel]
            # floor-form rounding (not round()): rank-1 scores are exactly
            # 0.5 * a-6-decimal simq, i.e. permanently ON the .xxxxxx5
            # half-way boundary where Python round() (banker's) and the
            # oracle's rounding disagree — __spark_entry__._fr convention
            sc = float(score[pick_rel])
            out.append((qid, int(ids[pick]), rank,
                        math.floor(sc * 1e6 + 0.5) / 1e6))
            chosen.append(pick)
            avail[pick] = False
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "rank", "mmr_score"])

    return pool_df.groupBy("query_id").applyInPandas(
        select, "query_id long, neighbor_id long, rank int, "
                "mmr_score double")


# -- centroid training ------------------------------------------------------

def kmeans_centroids(corpus: DataFrame, k: int = 8, iters: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Distributed Lloyd's k-means for IVF centroid training.

    Each iteration: nearest-centroid assignment (broadcast of k×dim
    literals — a map-only pass over the corpus) then element-wise mean per
    cluster via posexplode → groupBy(centroid, dim) avg → regroup. The only
    driver-side data is the k×dim centroid table itself, collected per
    iteration to rebuild the broadcast — the standard distributed k-means
    shape; corpus rows never leave the executors. Deterministic init:
    lowest-id vectors.
    """
    cents = (corpus.orderBy(id_col).limit(k)
             .select(F.col(vec_col))
             .rdd.map(lambda r: r[0]).collect())

    for _ in range(iters):
        cdf = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            f"centroid_id int, {vec_col} array<double>")
        assigned = assign_centroids(corpus, cdf, id_col, vec_col)
        means = (assigned.select("centroid_id",
                                 F.posexplode(vec_col).alias("pos", "v"))
                 .groupBy("centroid_id", "pos").agg(F.avg("v").alias("m"))
                 .groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("pos", "m"))).alias("pm"))
                 .select("centroid_id",
                         F.transform("pm", lambda s: s["m"]).alias(vec_col)))
        got = {r["centroid_id"]: r[vec_col] for r in means.collect()}
        cents = [got.get(i, cents[i]) for i in range(k)]

    return corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        f"centroid_id int, {vec_col} array<double>")


def knn_graph(corpus: DataFrame, centroids: DataFrame, k: int = 5,
              nprobe: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH: every corpus vector's top-k
    neighbors by cosine (the all-pairs sibling of ivf_topk — the
    substrate of kNN-graph dedup/community detection and of graph-based
    ANN index construction).

    IVF candidate generation, but the query side is the whole corpus, so
    the ivf_topk shape (queries × centroids crossJoin → per-query
    row_number window) would push N·C rows through an exchange just to
    pick probe lists. Instead probe lists are computed MAP-ONLY: the
    bounded centroids inline as literal arrays (the assign_centroids
    convention), each row sorts its C sims in-place — array_sort with a
    (sim DESC, centroid_id ASC) comparator, the exact row_number
    ordering the oracle replays — and slices the first `nprobe`. The
    home bucket is probe[0] (same tie-break as assign_centroids'
    first-max argmax), so ONE map pass yields both sides of the bucket
    join.

    Only (id, centroid_id) enters the bucket join (the
    cosine_near_dup_pairs round-4 narrowing); vectors join back for the
    candidate sliver only. Shape at scale: map pass → bucket-key shuffle
    of two longs → per-bucket candidate pairs (bounded by nprobe·N/C per
    vector on balanced buckets) → exact verify → per-vector top-k window
    keyed by id (high-cardinality, no funnel).

    Degenerate (zero-norm) vectors: all-NaN sims make the comparator
    fall through to centroid_id order — probes become the lowest-id
    centroids, consistent on both engines only because the oracle's
    NULL/NaN ordering never surfaces when, as with the gate corpus, no
    zero-norm vectors exist; documented contract.

    Above LITERAL_TERM_CAP inlined terms the probe lists come from
    `_probe_centroids_arrow` instead — the same top-nprobe ordering via
    one executor-broadcast numpy GEMM per Arrow batch, still map-only.
    (The pre-r12 fallback here was ivf_topk(corpus, corpus), whose
    probe selection pushes N·C rows through a per-query window — with
    C = N/64 that exchange is N²/64 rows, measured 71× on the r12
    sf1 → sf10 decade step; the Arrow path re-measured it linear.)
    """
    cents = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    if cents and len(cents) * len(cents[0][vec_col]) > LITERAL_TERM_CAP:
        keyed = keep(
            "knn_graph.keyed",
            _probe_centroids_arrow(corpus, cents, nprobe, vec_col)
            .select(F.col(id_col), F.col("__probes")))
    else:
        norms = _jvm_literal_norms(corpus.sparkSession,
                                   [r[vec_col] for r in cents])
        sims = "array(" + ", ".join(
            _literal_cos_sql(r[vec_col], norm_col="__nv", cnorm=n)
            for r, n in zip(cents, norms)) + ")"
        ids = ", ".join(str(int(r["centroid_id"])) for r in cents)
        probe = (f"slice(array_sort("
                 f"zip_with(array({ids}), {sims}, (i, s) -> struct(i AS cid, s AS s)), "
                 f"(l, r) -> CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1 "
                 f"WHEN l.cid < r.cid THEN -1 ELSE 1 END), 1, {int(nprobe)})")
        keyed = keep(
            "knn_graph.keyed",
            ensure_min_parallelism(corpus)
            .withColumn("__v", F.expr(vec_col))
            .withColumn("__nv", F.expr(ROW_NORM_SQL))
            .selectExpr(f"`{id_col}`",
                        f"transform({probe}, p -> p.cid) AS __probes"))
    probes = keyed.select(F.col(id_col), F.explode("__probes").alias("centroid_id"))
    home = keyed.select(F.col(id_col).alias("neighbor_id"),
                        F.element_at("__probes", 1).alias("centroid_id"))
    # no dedup needed: a neighbor has exactly ONE home bucket and a
    # vector's probe buckets are distinct, so each (v, u) candidate pair
    # materializes at most once — a dropDuplicates here would shuffle
    # the full candidate set for nothing (removed: −1 exchange, −51%
    # wall at sf0.1: 5.57 → 2.71 s warm)
    cand = (probes.join(home, "centroid_id")
            .where(F.col("neighbor_id") != F.col(id_col))
            .select(id_col, "neighbor_id"))
    # pre-computed norms (norm_expr): per-candidate folds 3 → 1, cosines
    # bit-identical (same fold, same operand order in the division)
    va = corpus.select(F.col(id_col), F.col(vec_col).alias("__va"),
                       norm_expr(F.col(vec_col)).alias("__na"))
    vb = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("__vb"),
                       norm_expr(F.col(vec_col)).alias("__nb"))
    cos = dot_expr(F.col("__va"), F.col("__vb")) / (F.col("__na")
                                                    * F.col("__nb"))
    scored = (cand.join(va, id_col).join(vb, "neighbor_id")
              .select(id_col, "neighbor_id",
                      F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy(id_col).orderBy(F.col("cosine").desc(),
                                           F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def pca_train(corpus: DataFrame, k: int = 8, vec_col: str = "embedding"):
    """Distributed PCA training — the dense dimensionality reduction that
    completes the embedding compression ladder (l2_normalize /
    scalar_quantize / PQ are per-element or per-subspace; PCA is the
    global linear map). Two bounded passes over the corpus, each the
    cheapest form for its precision need:

    1. EXACT diagonal moments: posexplode → dim-keyed decimal sums (the
       dim_stats shuffle — uniform keys, partial agg, dim·P summary rows
       through the exchange). These feed the GATE values: per-dim
       population variances as exact micro-units (floor(v·1e6+0.5) ints),
       so total/top-k-axes variance are integer sums any engine replays.
    2. Full covariance for the eigendecomposition only: per-partition
       numpy X'X partials (dim² doubles each) collected and summed —
       the mean comes from the exact stats pass, never from here;
       a 64×64 float matrix, so driver-side
       numpy.linalg.eigh is bounded work (the k-means k×dim collect
       convention). Float order here only perturbs eigenvectors at
       ~1e-12 — the gate's exact values never touch this path.
    3. Projection (pca_project) is MAP-ONLY: mean and components inline
       as literals.

    Returns (components [k×dim rows, descending eigenvalue], eigvals,
    mean, metrics dict with the exact micro-unit variance totals).
    """
    import numpy as np

    d = (ensure_min_parallelism(corpus)
         .select(F.transform(vec_col, lambda x: x.cast("double"))
                 .alias("__v")))
    ex = d.select(F.posexplode("__v").alias("dim", "x"))
    stats = (ex.groupBy("dim")
             .agg(F.sum(F.col("x").cast("decimal(28,10)"))
                  .cast("double").alias("s1"),
                  F.sum((F.col("x") * F.col("x")).cast("decimal(28,10)"))
                  .cast("double").alias("s2"),
                  F.count(F.lit(1)).alias("n"))
             .orderBy("dim").collect())
    dim = len(stats)
    n = int(stats[0]["n"])
    # per-dim population variance in exact micro-units; the float chain
    # (decimal-exact s2/n - (s1/n)*(s1/n), then floor-round) is replayed
    # verbatim by the DuckDB oracle
    var_micro = [int(np.floor((r["s2"] / n - (r["s1"] / n) * (r["s1"] / n))
                              * 1e6 + 0.5)) for r in stats]
    mean = [r["s1"] / n for r in stats]

    def partials(batches):
        import pandas as pd
        for pdf in batches:
            X = np.array(pdf["__v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            yield pd.DataFrame({"xtx": [X.T.dot(X).ravel().tolist()]})

    parts = d.mapInPandas(partials, "xtx array<double>").collect()
    xtx = np.zeros((dim, dim))
    for p in parts:
        xtx += np.array(p["xtx"]).reshape(dim, dim)
    mu = np.array(mean)
    cov = xtx / n - np.outer(mu, mu)
    eigvals, eigvecs = np.linalg.eigh(cov)     # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T                # k × dim
    evals = eigvals[order]
    vtv = comps.dot(comps.T)
    metrics = {
        "k": k, "dim": dim, "n_rows": n,
        "total_var_micro": sum(var_micro),
        "axes_var_topk_micro": sum(sorted(var_micro, reverse=True)[:k]),
        "explained_k": float(evals.sum()),
        "trace_ok": bool(abs(float(np.trace(cov))
                             - sum(var_micro) / 1e6)
                         <= 1e-4 * max(1.0, sum(var_micro) / 1e6)),
        "orthonormal_ok": bool(
            np.abs(vtv - np.eye(k)).max() < 1e-9),
    }
    return comps.tolist(), evals.tolist(), mean, metrics


def pca_project(corpus: DataFrame, components, mean,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Map-only projection onto trained components: mean and the k×dim
    component matrix inline as literals (size-gate territory only above
    LITERAL_TERM_CAP terms — 8×64 is far below), so each row computes k
    dot products inside one codegen'd projection; zero shuffle."""
    marr = "array(" + ", ".join(repr(float(x)) for x in mean) + ")"
    cols = []
    for j, comp in enumerate(components):
        carr = "array(" + ", ".join(repr(float(x)) for x in comp) + ")"
        cols.append(
            f"aggregate(zip_with(zip_with(__v, {marr}, (x, m) -> x - m), "
            f"{carr}, (c, w) -> c * w), cast(0.0 as double), "
            f"(a, x) -> a + x) AS pc{j}")
    cols.append(
        f"aggregate(zip_with(__v, {marr}, (x, m) -> x - m), "
        f"cast(0.0 as double), (a, x) -> a + x * x) AS centered_sq_norm")
    return (ensure_min_parallelism(corpus)
            .withColumn("__v", F.transform(vec_col,
                                           lambda x: x.cast("double")))
            .selectExpr(f"`{id_col}`", *cols))


def recall_at_k(ann: DataFrame, exact: DataFrame,
                query_col: str = "query_id",
                nbr_col: str = "neighbor_id") -> DataFrame:
    """Per-query recall of an ANN result set against the exact
    baseline — THE accuracy yardstick of every ANN index (recall@k =
    |approx ∩ exact| / |exact| per query; Jégou et al. 2011's figure
    of merit). Takes the two result DataFrames (any of brute/IVF/PQ/
    IVFPQ/LSH here produce the (query_id, neighbor_id, ...) shape), so
    index parameters are swept by re-running only the cheap index side.

    Output: (query_id, n_exact, n_hits, recall) — one row per query in
    the EXACT baseline (queries the ANN side missed entirely report
    recall 0.0, never vanish — the series-cardinality convention).

    Shape at 100 TB: both inputs are k-bounded per query (|Q|·k rows
    total — result-sized, not corpus-sized); one query-keyed equi-join
    + two query-keyed aggregations. Nothing touches the corpus.
    """
    ex = exact.select(F.col(query_col), F.col(nbr_col))
    an = ann.select(F.col(query_col), F.col(nbr_col))
    en = ex.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_exact"))
    hn = (ex.join(an, [query_col, nbr_col])
          .groupBy(query_col).agg(F.count(F.lit(1)).alias("n_hits")))
    hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    recall = (F.floor(hits.cast("double") / F.col("n_exact").cast("double")
                      * F.lit(1_000_000) + F.lit(0.5)) / F.lit(1e6))
    return (en.join(hn, query_col, "left")
            .select(query_col, F.col("n_exact").cast("long").alias("n_exact"),
                    hits.alias("n_hits"), recall.alias("recall")))


def rrf_fuse(lists: dict, k: int = 10, c: int = 60,
             id_col: str = "id", score_col: str = "score") -> DataFrame:
    """Reciprocal-rank fusion of already-truncated retrieval lists
    (Cormack, Clarke & Buettcher 2009): hybrid search's standard merge
    of a LEXICAL top-k (BM25) with a SEMANTIC top-k (embedding cosine)
    — score(d) = Σ_lists 1/(c + rank_d), absent-from-a-list contributes
    0, c = 60 the published default. Rank fusion deliberately ignores
    the incomparable raw scores (BM25 is unbounded, cosine lives in
    [−1, 1]) — that immunity to score calibration is why RRF beats
    score averaging without training data.

    `lists` maps a name to a (id_col, score_col) DataFrame that is
    ALREADY a truncated top-k list (the output shape of bm25_topk and
    brute_force_topk/ivf_topk) — ranks are recomputed here from
    (score desc, id asc), so ties resolve identically in both engines.
    Output: (id, rank_<name>... in dict order, rrf_score) — the top `k`
    by fused score, rank columns NULL where the id missed that list.
    The fusion sum is written left-assoc in dict order so a SQL oracle
    replays the float chain bit-for-bit.

    Scale shape: every input is k-bounded BY CONTRACT (the expensive
    retrieval happened upstream, with its own documented scale path —
    bm25's map-only projection, IVF's pruned probe), so everything
    here — the per-list rank windows, the (n−1)-step full-outer join
    chain, the final TakeOrdered — runs on ≤ Σ|list| rows: result-sized,
    never corpus-sized. The keyless rank windows are bounded by the
    lists' own k parameters (the text_zipf allowlist argument).
    """
    if not lists:
        raise ValueError("rrf_fuse: lists must be non-empty")
    if c < 1:
        raise ValueError("rrf_fuse: c must be >= 1")
    fused = None
    rank_cols = []
    for name, df in lists.items():
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        r = df.select(F.col(id_col).alias("id"),
                      F.row_number().over(w).alias(f"rank_{name}"))
        rank_cols.append(f"rank_{name}")
        fused = r if fused is None else fused.join(r, "id", "full_outer")
    score = F.lit(0.0)
    for rc in rank_cols:
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(rc).cast("double")),
            F.lit(0.0))
    return (fused.select("id", *rank_cols,
                         F.round(score, 6).alias("rrf_score"))
            .orderBy(F.col("rrf_score").desc(), F.col("id").asc())
            .limit(int(k)))
