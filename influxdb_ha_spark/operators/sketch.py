"""Mergeable sketch summaries (added scope — the 100 TB cardinality /
frequency / quantile answers).

The reference proxies InfluxQL only (service/routing.go:137-138); its
closest surface is SHOW CARDINALITY (service/importer.go:406-612), which
IS a distinct-count question answered exactly. At 100 TB nobody answers
cardinality exactly on the hot path: the industry answers are bounded-
state, MERGEABLE sketches whose partial states combine associatively, so
the map side ships kilobytes per partition instead of re-shuffling the
raw keys. This module supplies the batch sketch core on plain DataFrames,
with a twist the usual libraries can't give: every sketch here is
DETERMINISTIC and cross-engine reproducible (the md5-derived hash64 of
operators/hashing.py, integer state, pinned float combination points), so
the DuckDB oracle reproduces the estimates bit-for-bit — the estimates
are testable values, not just "close to exact".

- kmv_distinct    : K-Minimum-Values distinct sketch (Bar-Yossef et al.
                    2002 "Counting distinct elements in a data stream";
                    the theta-sketch ancestor). State = the k smallest
                    distinct hash values; estimate = (k-1)·M / h_(k).
- hll_distinct    : HyperLogLog (Flajolet et al. 2007) with the standard
                    small-range linear-counting correction. State = m
                    6-bit registers (here one BIGINT per used register);
                    the harmonic sum Σ2^(−M_j) is carried EXACTLY as the
                    integer Σ2^(53−M_j), so no float fold order exists.
- countmin        : Count–Min frequency sketch (Cormode & Muthukrishnan
                    2005). State = d×w integer cells; point estimate =
                    min over d cells, always ≥ the true count.
- histogram_quantiles : fixed-boundary equi-width histogram quantiles —
                    the one-pass mergeable quantile path (the scale swap
                    documented next to the exact timeseries.quantile_bands),
                    with deterministic within-bin linear interpolation.

Scale shapes: every sketch is one map-side-combinable groupBy whose
output is BOUNDED (k rows, m registers, d·w cells, `bins` buckets) per
group — the raw keys never ride a shuffle a second time, and two sketch
states merge by union+re-rank / max / + / + respectively, which is
exactly what Spark's partial aggregation does for free here.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import MERSENNE_P, hash64_expr, minhash_coeffs

HASH_SPACE = 1 << 60  # hash64 is 15 hex chars = 60 uniform bits


def _grp(by):
    return list(by) if by else []


def _fr6(c):
    """floor-round-6 — the module's single pinned rounding (one
    multiply, one floor, one divide on identical bits in both engines;
    the oracles' fr(x, 6) mirrors it verbatim)."""
    s = F.lit(float(10 ** 6))
    return F.floor(c * s + F.lit(0.5)) / s


def fr6_py(x: float) -> float:
    """Python-side floor-round-6 — the SAME pinned rounding as the
    Column-side _fr6, for the streaming twins' pandas state updates.
    ONE definition (previously five per-twin copies): the twins'
    stream==batch bit-equality tests depend on this never diverging
    from the JVM expression."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def hll_fold_py(regs) -> tuple:
    """Python-side mirror of _hll_fold for the streaming twins'
    pandas state updates: fold one m-register array into
    (n_buckets_used, n_empty, est_distinct) with the IDENTICAL pinned
    arithmetic — exact integer harmonic sum Σ2^(53−M_j) (empty
    registers contribute 2^53), one IEEE divide HLL_NUMER / S, linear
    counting m·ln(m/V) via the same math.log that built the batch
    operator's driver-literal ln map, floor-round-6. ONE definition
    shared by hll_stream and hll_rollup_stream (the fr6_py
    consolidation argument: the stream==batch bit-equality tests
    depend on this never diverging from the JVM fold)."""
    used = [int(m) for m in regs if m > 0]
    n_used = len(used)
    v_empty = HLL_M - n_used
    s_total = (sum(1 << (_HLL_VBITS + 1 - m) for m in used)
               + v_empty * (1 << (_HLL_VBITS + 1)))
    e_raw = HLL_NUMER / float(s_total)
    if e_raw <= 2.5 * HLL_M and v_empty > 0:
        est = HLL_M * math.log(HLL_M / v_empty)
    else:
        est = e_raw
    return n_used, v_empty, fr6_py(est)


def _hist_bin_cols(v, lo, width, bins: int) -> tuple:
    """(bin, out-of-range) Column pair for the fixed-boundary equi-width
    histogram: bin = clamp(floor((v − lo)/width), 0, bins−1), oob =
    raw bin outside [0, bins). THE single clamp definition shared by
    histogram_quantiles, histogram_quantiles_auto's in-range branch,
    and the streaming twin (streaming/hist_quantile_stream.py) — their
    bit-identical stream==batch / Spark==oracle guarantees depend on
    this expression never diverging between copies (the _hll_jrho
    convention). `lo`/`width` may be literals or per-group Columns."""
    raw = F.floor((v - lo) / width)
    b = (F.when(raw < 0, F.lit(0))
         .when(raw >= bins, F.lit(bins - 1)).otherwise(raw))
    return b, (raw < 0) | (raw >= bins)


def _sketch_hash(c, hash_fn: str):
    """The sketch family's value hash, uniform on [0, 2^60) — the
    md5/xxhash64 production split (the minhash_signatures /
    join_sample_estimate precedent): "md5" is the cross-engine
    hash64_expr the DuckDB oracles replay bit-for-bit; "fast" is
    pmod(xxhash64, 2^60), which is EXACTLY uniform (2^64 / 2^60 is
    integral, so the mod introduces zero bias) and skips the per-row
    md5→hex→conv chain — the dominant cost of a sketch build (the
    join_sample measurement: xxhash64 probe 46% of the exact join vs
    md5's 121%). Both hash the value's STRING rendering, so the two
    paths sample the same value identity and dtype never decoordinates
    sketches built from different columns (the _coordinated_keys
    lesson). "fast" has no DuckDB mirror — production path only; every
    gated key stays on "md5"."""
    if hash_fn == "fast":
        return F.pmod(F.xxhash64(c.cast("string")), F.lit(HASH_SPACE))
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'fast', "
                         f"got {hash_fn!r}")
    return hash64_expr(c.cast("string"))


# Default salt fan-out for the two-phase bottom-k: phase 1 ranks within
# (group, hash mod KMV_SALTS), so no task ever sorts more than ~1/S of a
# group's distinct set. Raise with cluster size — the state is identical
# for ANY salts >= 1 ("k smallest of a union" is associative).
KMV_SALTS = 16


def _bottom_k(vals: DataFrame, g, k: int, salts: int = KMV_SALTS,
              salt_col: str | None = None) -> DataFrame:
    """Two-phase bottom-k over distinct (group..., __v, __h) rows: rank
    within (group, salt) keep k, then rank within group over the
    ≤ salts·k survivors keep k. The salt is derived from the hash itself
    (pmod(__h, salts)) — deterministic, free, and uniform because __h
    is. Every one of a group's k globally-smallest (h, v) pairs is also
    among the k smallest of its own salt bucket, so the final kept set —
    including the (h asc, v asc) tie-break — is IDENTICAL to a single
    global per-group window; what changes is the plan: no task ever
    sorts a whole group's distinct set (the r9 verdict's single-task
    hazard on skewed group keys), and phase 2 sorts ≤ salts·k rows.
    tests/test_sketch.py:test_kmv_two_phase_equals_single_window pins
    the state equality against the literal one-window form.

    `salt_col` names an EXISTING column to use as the phase-1 partition
    key instead (sketch_merge_proof's explicit shard — it wants a salt
    INDEPENDENT of __h so the partial states genuinely overlap); it is
    consumed (dropped) with the rank. Associativity makes the final set
    identical for ANY phase-1 partitioning, which is exactly why one
    implementation can serve both callers.
    """
    if salt_col is None:
        if int(salts) < 1:
            # pmod(h, 0) is null — every row would silently land in ONE
            # salt partition, the funnel the two phases exist to avoid
            raise ValueError(
                f"_bottom_k: salts must be >= 1, got {salts!r}")
        vals = vals.withColumn(
            "__salt", F.pmod(F.col("__h"), F.lit(int(salts))))
        salt_col = "__salt"
    order = [F.col("__h").asc(), F.col("__v").asc()]
    w1 = Window.partitionBy(*g, salt_col).orderBy(*order)
    pre = (vals
           .withColumn("__rn", F.row_number().over(w1))
           .where(F.col("__rn") <= k)
           .drop(salt_col, "__rn"))
    w2 = (Window.partitionBy(*g) if g else Window.partitionBy()
          ).orderBy(*order)
    return (pre.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .drop("__rn"))


def kmv_distinct(df: DataFrame, value_col: str, by=None,
                 k: int = 256, salts: int = KMV_SALTS,
                 hash_fn: str = "md5") -> DataFrame:
    """K-Minimum-Values distinct-count sketch per group.

    Hash every distinct value with the cross-engine hash64 (uniform on
    [0, 2^60)), keep the k smallest hashes per group; with fewer than k
    distinct values the count is exact, otherwise the unbiased estimator
    (k−1)·2^60 / h_(k) (Bar-Yossef et al. 2002; Beyer et al. 2007 for
    the unbiasedness of (k−1) over k).

    Returns (by..., k_used, kth_hash, est_distinct): k_used = min(k, n),
    kth_hash = the largest retained hash (the sketch's theta), and the
    estimate rounded at 6 (one multiply + one divide on identical operand
    bits — both engines agree exactly).

    Scale shape: one (group, value) distinct shuffle, then the TWO-PHASE
    bottom-k of _bottom_k — rank within (group, hash mod `salts`) keep
    k, re-rank within group over the ≤ salts·k survivors. No task ever
    sorts a whole group's distinct set; the state (and therefore every
    estimate) is bit-identical to a single global window because "k
    smallest of a union" is associative, which is also why two sketch
    states merge by union + re-rank. The ungrouped (by=None) path is
    shuffle-safe too: phase 1 partitions on the salt alone and the
    phase-2 keyless window ranks only the ≤ salts·k survivors — bounded
    by PARAMETERS, never by data.

    hash_fn: "md5" (oracle default, DuckDB-replayable bit-for-bit) |
    "fast" (xxhash64 — the production split, see _sketch_hash; the
    estimates differ because the sample differs, but every estimator
    property is identical and the exact-below-k branch agrees exactly).
    """
    g = _grp(by)
    vals = (df.select(*g, F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
            .withColumn("__h", _sketch_hash(F.col("__v"), hash_fn)))
    return _kmv_fold(_bottom_k(vals, g, k, salts), g, k)


def _kmv_fold(kept: DataFrame, g, k: int) -> DataFrame:
    """Fold a kept bottom-k table (group..., __v, __h) into the KMV
    output (group..., k_used, kth_hash, est_distinct) — shared by
    kmv_distinct and sketch_merge_proof (a merged kept set folds
    identically, which is the point)."""
    agg = kept.groupBy(*g).agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("__h").alias("kth_hash"))
    est = (F.when(F.col("k_used") < k,
                  F.col("k_used").cast("double"))
           .otherwise(F.lit(float(k - 1)) * F.lit(float(HASH_SPACE))
                      / F.col("kth_hash").cast("double")))
    return agg.select(*g, "k_used", "kth_hash",
                      _fr6(est).alias("est_distinct"))


# HLL constants for m = 256 registers (lg m = 8, 52 value bits remain of
# the 60-bit hash). alpha_m per Flajolet et al. 2007 §4 for m >= 128.
HLL_M = 256
_HLL_LG_M = 8
_HLL_VBITS = 52          # value bits: 60 - lg m
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha·m²·2^52-scaling folded into ONE python-float literal shared with
# the oracle text, so the only runtime float ops are 1 divide (+ 1 ln on
# the linear-counting branch) — both IEEE-pinned.
HLL_NUMER = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_VBITS + 1)


def hll_distinct(df: DataFrame, value_col: str, by=None,
                 hash_fn: str = "md5") -> DataFrame:
    """HyperLogLog distinct-count sketch per group, m = 256 registers.

    register j = hash64 mod m; remaining 52 bits w = hash64 >> 8; the
    register keeps M_j = max over its values of rho(w) = (#leading zeros
    of w in 52 bits) + 1 = 53 − bitlength(w) (bin() digit count — no
    float log, both engines share the builtin; w = 0 → rho = 53). The
    harmonic sum Σ_j 2^(−M_j) (empty registers contribute 2^0) is carried
    EXACTLY as the BIGINT S = Σ_j 2^(53−M_j) ≤ m·2^53 < 2^62, so the raw
    estimate alpha·m²·2^53 / S has no fold-order sensitivity at all; the
    standard small-range correction (E ≤ 2.5m with V empty registers > 0
    → m·ln(m/V), Flajolet et al. 2007 §4) uses a driver-literal log map
    (V has only 255 possible values — the permutation-entropy convention),
    so DuckDB's ln and Spark never need to agree on libm inside the plan.

    Returns (by..., n_buckets_used, n_empty, est_distinct) with the
    estimate rounded at 6.

    Scale shape: groupBy (group, register) max — map-side combinable,
    ≤ 256 rows per group out of the shuffle; then one ≤256-row fold per
    group. Two HLL states merge by register-wise max, which is exactly
    the partial aggregation Spark already runs.

    hash_fn: "md5" (oracle default) | "fast" (xxhash64 — the
    production split, see _sketch_hash; registers differ because the
    hash differs, but the estimator and every state bound are
    identical).
    """
    g = _grp(by)
    return _hll_fold(_hll_rows(df, value_col, g, hash_fn)
                     .groupBy(*g, "__j").agg(F.max("__rho").alias("__m")),
                     g)


def _hll_jrho() -> tuple:
    """(register, rank) Column pair derived from a `__h` hash column —
    THE single definition of the HLL register mapping (j = h mod m,
    rho = 53 − bitlength of the remaining 52 bits, w = 0 → 53), shared
    by hll_distinct (via _hll_rows), sketch_merge_proof's partial-state
    build, and the streaming twin (streaming/hll_stream.py). One
    definition, three consumers: a change here moves the batch sketch,
    the merge proof, and the stream together — desynchronizing them
    silently is the failure the sharing exists to prevent."""
    w = F.expr(f"shiftright(__h, {_HLL_LG_M})")
    j = F.pmod(F.col("__h"), F.lit(HLL_M))
    rho = (F.when(w == 0, F.lit(_HLL_VBITS + 1))
           .otherwise(F.lit(_HLL_VBITS + 1) - F.length(F.bin(w))))
    return j, rho


def _hll_rows(df: DataFrame, value_col: str, g,
              hash_fn: str = "md5") -> DataFrame:
    """Per-row HLL terms (group..., __v, __h, __j, __rho) — the map-side
    stage of hll_distinct (sketch_merge_proof derives the same __j/__rho
    from its own already-hashed rows via _hll_jrho)."""
    vals = (df.select(*g, F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull())
            .withColumn("__h", _sketch_hash(F.col("__v"), hash_fn)))
    j, rho = _hll_jrho()
    return vals.withColumn("__j", j).withColumn("__rho", rho)


def _hll_fold(regs: DataFrame, g) -> DataFrame:
    """Fold a register table (group..., __j, __m) into the HLL output
    (group..., n_buckets_used, n_empty, est_distinct). A register table
    produced by merging partial states (register-wise max) folds
    identically to the single-pass one — sketch_merge_proof's gate."""
    folded = regs.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(F.expr(f"shiftleft(1L, cast({_HLL_VBITS + 1} - __m as int))"))
        .alias("__s_used"))
    v_empty = F.lit(HLL_M) - F.col("n_buckets_used")
    s_total = (F.col("__s_used")
               + v_empty * F.lit(1 << (_HLL_VBITS + 1)))
    e_raw = F.lit(HLL_NUMER) / s_total.cast("double")
    # linear counting: literal ln(m/V) map over V in 1..m-1, emitted as
    # ONE SQL string — building 2·(m−1) Column literals costs ~500 py4j
    # round trips (~0.5 s per cold build; the hashing.py sql_minhash_sig
    # lesson), parsing the same tree JVM-side is one call
    ln_map = F.expr("map(" + ", ".join(
        f"{v}, {HLL_M * math.log(HLL_M / v)!r}"
        for v in range(1, HLL_M)) + ")")
    est = (F.when((e_raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
                  ln_map[v_empty])
           .otherwise(e_raw))
    return folded.select(*g, "n_buckets_used", v_empty.alias("n_empty"),
                         _fr6(est).alias("est_distinct"))


def ams_f2(df: DataFrame, item_col: str, by=None, d: int = 32,
           seed: int = 11, hash_fn: str = "md5") -> DataFrame:
    """AMS "tug-of-war" second-moment (F2) sketch per group — the
    self-join-size estimator (Alon, Matias & Szegedy 1996, "The space
    complexity of approximating the frequency moments"): F2 = Σ_x c_x²
    is exactly the row count of a self-equi-join on `item_col`, the
    quantity a join planner needs BEFORE committing to the shuffle, and
    the "skew energy" a uniform key minimizes. The sketch keeps d
    signed counters Z_i = Σ_rows s_i(x) with s_i(x) ∈ {−1, +1} drawn
    from the universal hash family shared with minhash/countmin
    (s_i = 1 − 2·((a_i·(h64(x) mod p) + b_i) mod p mod 2)); each Z_i²
    is an unbiased F2 estimate, and the output averages the d of them
    with one integer floor division: f2_est = (Σ_i Z_i²) div d — exact
    integers end-to-end, no rounding contract, both engines bit-equal.

    Returns (by..., n_rows, n_items, f2_exact, f2_est): n_items and
    f2_exact come from an exact key-keyed count — the audit columns
    that exist at test scale (at 100 TB the sketch replaces them; they
    are also the countmin convention, exact_cnt beside cm_est).

    Overflow headroom: Z_i² ≤ n² and Σc_x² ≤ n², so groups beyond
    n = 2²⁸ rows could push Σ_i Z_i² past int64; the build raises
    loudly there (the pettitt/modularity convention) — the documented
    swap is DECIMAL(38,0) ↔ DuckDB HUGEINT for the squares.

    Scale shape: ONE map-side-combinable groupBy carrying d+1 integer
    partial sums per group — no per-row state, no second shuffle, and
    two states merge by component-wise + (Z is a sum), which is exactly
    Spark's partial aggregation. The exact audit side is the only
    key-keyed shuffle and exists for the gate, not the production path.

    hash_fn: "md5" (oracle default, DuckDB-replayable) | "fast"
    (xxhash64 — the _sketch_hash production split; signs differ because
    the hash differs, but every estimator property is identical).
    """
    g = _grp(by)
    if int(d) < 1:
        raise ValueError(f"ams_f2: d must be >= 1, got {d!r}")
    p = F.lit(MERSENNE_P)
    coeffs = minhash_coeffs(int(d), seed=seed)
    base = (df.select(*g, F.col(item_col).alias("__i"))
            .where(F.col("__i").isNotNull())
            .withColumn("__h", _sketch_hash(F.col("__i"), hash_fn) % p))
    signs = [
        (F.lit(1) - F.lit(2)
         * (((F.lit(a) * F.col("__h") + F.lit(b)) % p) % F.lit(2)))
        .cast("long")
        for a, b in coeffs]
    zs = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(s).alias(f"__z{i}") for i, s in enumerate(signs)])
    sq_sum = sum((F.col(f"__z{i}") * F.col(f"__z{i}")
                  for i in range(1, len(coeffs))),
                 F.col("__z0") * F.col("__z0"))
    # `div` (SQL integer division — exact on int64, where a double
    # divide would round above 2^53) needs a NAMED operand in F.expr
    est = (F.when(F.col("n_rows") > F.lit(1 << 28),
                  F.raise_error(F.lit(
                      "ams_f2: group exceeds 2^28 rows — sum of Z_i^2 "
                      "leaves int64; switch the squares to "
                      "DECIMAL(38,0) (see docstring)")).cast("long"))
           .otherwise(F.expr(f"__sq div {int(d)}L")))
    exact = (base.groupBy(*g, "__i")
             .agg(F.count(F.lit(1)).cast("long").alias("__c"))
             .groupBy(*g)
             .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                  F.sum(F.col("__c") * F.col("__c")).cast("long")
                  .alias("f2_exact")))
    out = (zs.withColumn("__sq", sq_sum)
           .select(*g, "n_rows", est.cast("long").alias("f2_est")))
    if g:
        joined = out.join(exact, g)
    else:
        joined = out.crossJoin(F.broadcast(exact))
    # ungrouped empty/all-null input: the exact-audit groupBy drops to
    # zero rows before its global fold and the Z sums are over an
    # empty group — coalesce all three to 0 so the n_rows=0 row keeps
    # the integer-exact column contract (the join_advisor convention)
    return joined.select(
        *g, "n_rows",
        F.coalesce("n_items", F.lit(0)).cast("long").alias("n_items"),
        F.coalesce("f2_exact", F.lit(0)).cast("long").alias("f2_exact"),
        F.coalesce("f2_est", F.lit(0)).cast("long").alias("f2_est"))


def _theta_col(k: int):
    """Exhaustive-aware theta from a per-group sketch summary (__t =
    max retained hash, __ku = retained count): the group's k-th
    smallest hash, or the FULL hash space when the sketch is exhaustive
    (< k distinct values — an exhaustive sketch is an exact sample of
    the whole space). THE single definition of the theta convention,
    shared by kmv_setops and kmv_overlap_matrix; the oracles mirror it
    verbatim."""
    return (F.when(F.col("__ku") < k, F.lit(HASH_SPACE))
            .otherwise(F.col("__t")))


def _setops_select(counts: DataFrame, head_cols) -> DataFrame:
    """The three theta-sketch estimators over (theta, n_a, n_b,
    n_common) survivor counts — single-sourced so the pair operator
    (kmv_setops) and the matrix operator (kmv_overlap_matrix) cannot
    diverge:
        est_union        = (n_a + n_b − n_common) · 2^60 / θ
        est_intersection = n_common · 2^60 / θ
        jaccard_est      = n_common / (n_a + n_b − n_common)
    — integer counts, one pinned multiply+divide each, floor-round-6;
    jaccard NULL when both survivor sets are empty."""
    m = F.lit(float(HASH_SPACE))
    uni = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return counts.select(
        *head_cols, "theta", "n_a", "n_b", "n_common",
        _fr6(uni.cast("double") * m
             / F.col("theta").cast("double")).alias("est_union"),
        _fr6(F.col("n_common").cast("double") * m
             / F.col("theta").cast("double")).alias("est_intersection"),
        F.when(uni > 0,
               _fr6(F.col("n_common").cast("double")
                    / uni.cast("double"))).alias("jaccard_est"))


def kmv_setops(df: DataFrame, value_col: str, group_col: str,
               group_a, group_b, k: int = 256,
               salts: int = KMV_SALTS) -> DataFrame:
    """Set-operation estimates between two groups' value sets from their
    KMV sketches — the theta-sketch capability (Dasgupta, Lang, Rhodes &
    Thaler 2016, "Theta sketch framework"): |A ∪ B|, |A ∩ B| and Jaccard
    WITHOUT ever materializing the sets. The audience-overlap question
    ("how many users did both X and Y") answered from two kilobyte
    summaries.

    θ = min(θ_A, θ_B), where a group with k distinct retained hashes
    contributes its k-th smallest hash, and a group whose sketch is
    EXHAUSTIVE (fewer than k distinct values) contributes θ = 2^60 —
    an exhaustive sketch is an exact sample of the FULL hash space, so
    its theta is the whole space (the standard theta-sketch convention;
    using its max retained hash instead would inflate the estimates by
    ~(n+1)/n for small sets, since E[max of n hashes] ≈ n/(n+1)·2^60).
    Below θ both sketches are EXACT samples of [0, θ], so with
    n_a/n_b/n_common the ≤-θ survivor counts:
        est_union        = (n_a + n_b − n_common) · 2^60 / θ
        est_intersection = n_common · 2^60 / θ
        jaccard_est      = n_common / (n_a + n_b − n_common)
    — integer counts, one pinned multiply+divide each, floor-round-6.
    When BOTH groups are exhaustive, θ = 2^60 and all three estimates
    are exact.

    Returns ONE row: (theta, n_a, n_b, n_common, est_union,
    est_intersection, jaccard_est).

    Scale shape: two bounded sketches (the kmv_distinct build: one
    distinct shuffle + the two-phase salted bottom-k of _bottom_k — no
    single-task sort of a group's distinct set), then every
    join/aggregate runs on ≤ k rows per side; θ is a 1-row scalar
    broadcast (the tpch_q15 crossJoin convention). Sketch states persist
    and merge, so the pairwise matrix over G groups costs G sketch
    builds, not G² scans.
    """
    g = F.col("__g")
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull()
                   & g.isin([group_a, group_b]))
            .distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string"))))
    sk = _bottom_k(base, ["__g"], k, salts).select("__g", "__h")
    theta = (sk.groupBy("__g").agg(F.max("__h").alias("__t"),
                                   F.count(F.lit(1)).alias("__ku"))
             .select(_theta_col(k).alias("__t"))
             .agg(F.min("__t").alias("theta")))
    sa = sk.where(g == group_a).select("__h")
    sb = sk.where(g == group_b).select("__h")
    na = (sa.crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_a")))
    nb = (sb.crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_b")))
    nc = (sa.join(sb, "__h")
          .crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_common")))
    one = (theta.crossJoin(F.broadcast(na))
           .crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nc)))
    return _setops_select(one, [])


def countmin(df: DataFrame, item_col: str, d: int = 4, w: int = 1024,
             top: int = 20, seed: int = 7) -> DataFrame:
    """Count–Min sketch build + point-query audit.

    Builds the d×w sketch (row i hashes x to ((a_i·h64(x) mod p) + b_i)
    mod p mod w — the universal-hash family shared with minhash), then
    point-queries the EXACT top-`top` items so the output is the audit
    table every sketch deployment wants: (item, exact_cnt, cm_est) with
    the guaranteed one-sided error cm_est ≥ exact_cnt visible per row
    (Cormode & Muthukrishnan 2005: overshoot ≤ εN with prob 1−δ for
    w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

    Scale shape: the sketch build is ONE map-side-combinable groupBy
    whose output is bounded at d·w cells regardless of input size — the
    broadcastable summary. The exact side here exists only to audit the
    estimates at test scale; at 100 TB the sketch replaces it. The probe
    join broadcasts the top·d probe rows (bounded by construction).
    """
    p = F.lit(MERSENNE_P)
    coeffs = minhash_coeffs(d, seed=seed)
    items = (df.select(F.col(item_col).alias("item"))
             .where(F.col("item").isNotNull())
             .withColumn("__h", hash64_expr(F.col("item").cast("string"))
                         % p))
    buckets = F.array(*[
        ((F.lit(a) * F.col("__h") + F.lit(b)) % p) % F.lit(w)
        for a, b in coeffs])
    cells = (items.select(F.posexplode(buckets).alias("row", "bucket"))
             .groupBy("row", "bucket")
             .agg(F.count(F.lit(1)).alias("cell_cnt")))
    exact = (items.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.col("exact_cnt").desc(), F.col("item").asc())
             .limit(top))
    probes = (exact
              .withColumn("__h", hash64_expr(F.col("item").cast("string"))
                          % p)
              .select("item", "exact_cnt",
                      F.posexplode(buckets).alias("row", "bucket")))
    return (cells.join(F.broadcast(probes), ["row", "bucket"])
            .groupBy("item")
            .agg(F.max("exact_cnt").alias("exact_cnt"),
                 F.min("cell_cnt").alias("cm_est")))


def join_sample_estimate(left: DataFrame, right: DataFrame,
                         left_key: str, right_key: str,
                         rate: int = 64,
                         hash_fn: str = "md5") -> DataFrame:
    """Join-size estimation from COORDINATED hash samples — the
    cardinality-estimation primitive behind join reordering (the
    end-biased/correlated sampling idea of Vengerov et al. 2015,
    "Join size estimation subject to filter conditions"): both sides
    keep only rows whose JOIN-KEY hash lands in the same 1/`rate`
    slice (hash64(key) mod rate == 0), so a join pair survives iff its
    key is sampled — the estimator is sampled_pairs · rate, scaling by
    1/p ONCE (independent per-side sampling would square the rate and
    estimate from p² of the pairs; coordination keeps every surviving
    key's pair group INTACT, which is what makes per-key skew visible
    in the sample). Deterministic: the hash is the cross-engine md5
    hash64, so the sample — and therefore the estimate — is
    reproducible bit-for-bit.

    Returns ONE row: (n_left_sampled, n_right_sampled, sampled_pairs,
    est_pairs, exact_pairs) — the exact side is the audit column that
    exists at test scale; at 100 TB the whole point is that the
    estimate costs two ~1/rate scans + a sample-sized join instead of
    the full shuffle join it predicts the size of.

    Scale shape: the sample predicates push into both scans (hash of a
    scanned column — map-side, before any exchange), the sampled join
    shuffles ~1/rate of each side, and the output is one row. At 100 TB
    this is the "should I broadcast, and how big is the result" probe
    run BEFORE committing to a join strategy.

    hash_fn: "md5" (DuckDB-mirrorable, oracle default) | "fast"
    (xxhash64 on the native key — the minhash_signatures split).
    COORDINATION REQUIRES A COMMON KEY TYPE: hashing the same joining
    value through different dtypes decoordinates the samples silently
    (p² of the pairs survive, est biased ~rate× low, no error) — and
    string rendering is NOT a safe equalizer either: BIGINT 5 joins
    DOUBLE 5.0 under Spark's numeric coercion, but '5' ≠ '5.0' as
    strings. Both paths therefore hash _coordinated_keys' common-type
    cast: identical dtypes hash natively, two integral types widen to
    long, any other numeric pair goes through double (mirroring the
    join's own coercion; keys beyond 2^53 share the double cast's
    precision loss on both sides, so they stay coordinated), anything
    else is cast to string.
    MEASURED at sf0.1 (local[8], warm scans): the md5 probe costs 121%
    of the exact join it predicts — the per-row md5→hex→conv chain
    outweighs a local hash join — while the xxhash64 probe costs 46%
    with the same ~5% estimate error; and local joins are the probe's
    WORST case (compute-bound, no network): on a cluster the exact
    join pays a full network shuffle the map-side probe predicate
    never does. Production uses "fast"; "md5" exists to let the oracle
    replay the exact sample.
    """
    lc, rc = _coordinated_keys(left, right, left_key, right_key)
    if hash_fn == "fast":
        lk = F.pmod(F.xxhash64(lc), F.lit(int(rate)))
        rk = F.pmod(F.xxhash64(rc), F.lit(int(rate)))
    else:
        lk = F.pmod(hash64_expr(lc.cast("string")), F.lit(int(rate)))
        rk = F.pmod(hash64_expr(rc.cast("string")), F.lit(int(rate)))
    ls = (left.where(F.col(left_key).isNotNull() & (lk == 0))
          .select(F.col(left_key).alias("__k")))
    rs = (right.where(F.col(right_key).isNotNull() & (rk == 0))
          .select(F.col(right_key).alias("__k")))
    return _join_sample_fold(left, right, left_key, right_key,
                             ls, rs, rate)


def _coordinated_keys(left: DataFrame, right: DataFrame,
                      left_key: str, right_key: str) -> tuple:
    """Key expressions coerced to ONE common type, so both sides hash
    identical bits for a value their JOIN would match (the r10 review
    finding: string-casting only equalizes dtypes with identical string
    renderings — BIGINT 5 vs DOUBLE 5.0 render '5' vs '5.0' and stayed
    silently decoordinated). Identical dtypes pass through natively
    (the oracle-pinned path); two integral types widen to long; any
    other numeric pair casts BOTH sides to double — the same lossy
    coercion Spark applies to the equality itself, so the sample and
    the join agree on which values match; everything else goes to
    string."""
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   NumericType, ShortType)
    lt = left.schema[left_key].dataType
    rt = right.schema[right_key].dataType
    lc, rc = F.col(left_key), F.col(right_key)
    if lt == rt:
        return lc, rc
    integral = (ByteType, ShortType, IntegerType, LongType)
    if isinstance(lt, integral) and isinstance(rt, integral):
        return lc.cast("long"), rc.cast("long")
    if isinstance(lt, NumericType) and isinstance(rt, NumericType):
        return lc.cast("double"), rc.cast("double")
    return lc.cast("string"), rc.cast("string")


def _join_sample_fold(left, right, left_key, right_key, ls, rs,
                      rate: int) -> DataFrame:
    nl = ls.agg(F.count(F.lit(1)).alias("n_left_sampled"))
    nr = rs.agg(F.count(F.lit(1)).alias("n_right_sampled"))
    sp = ls.join(rs, "__k").agg(F.count(F.lit(1)).alias("sampled_pairs"))
    ex = (left.where(F.col(left_key).isNotNull())
          .select(F.col(left_key).alias("__k"))
          .join(right.where(F.col(right_key).isNotNull())
                .select(F.col(right_key).alias("__k")), "__k")
          .agg(F.count(F.lit(1)).alias("exact_pairs")))
    return (nl.crossJoin(F.broadcast(nr))
            .crossJoin(F.broadcast(sp))
            .crossJoin(F.broadcast(ex))
            .select("n_left_sampled", "n_right_sampled", "sampled_pairs",
                    (F.col("sampled_pairs") * F.lit(int(rate)))
                    .alias("est_pairs"), "exact_pairs"))


def histogram_quantiles(df: DataFrame, value_col: str, by=None,
                        lo: float = 0.0, hi: float = 1.0, bins: int = 1024,
                        qs=(0.5, 0.95, 0.99)) -> DataFrame:
    """One-pass equi-width histogram quantile estimates per group — the
    MERGEABLE quantile path (histograms over the same boundaries merge by
    cell-wise +), i.e. the single-scan 100 TB swap for the exact
    sort-based quantiles of timeseries.quantile_bands, with deterministic
    error ≤ one bin width.

    bin = clamp(floor((v − lo)/width), 0, bins−1) with width the python
    double (hi−lo)/bins — one subtraction, one divide, one floor per row,
    identical bits on both engines. For each q the target rank is
    r = ceil(q·n) over the group's n non-null values (the inverted-CDF
    convention; q must be in (0, 1] — q=0 has no rank under this
    convention and raises ValueError, matching hist_quantile_stream),
    and the estimate interpolates inside the covering bin:
    lo + width·(bin + (r − cum_below)/bin_count). Values outside [lo, hi)
    clamp into the edge bins (counted, like any fixed-boundary
    histogram) — and the per-group count of such rows is EXPOSED as
    `n_clamped`, so a mis-sized [lo, hi) range is loud in the output
    instead of silently skewing the edge-bin estimates.

    Returns (by..., q, n, n_clamped, est) with est rounded at 6.

    Scale shape: one (group, bin) count groupBy — map-side combinable,
    ≤ `bins` rows per group — then rank extraction over those bounded
    rows (a window over ≤ `bins` rows per group, never over the data;
    for by=None that window is keyless but still ≤ `bins` rows —
    bounded by the PARAMETER, test-scale-safe and scale-safe alike).
    """
    g = _grp(by)
    if not qs:
        raise ValueError("histogram_quantiles: qs must be non-empty")
    for q in qs:
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(
                f"histogram_quantiles: q must be in (0, 1] under the "
                f"ceil(q*n) inverted-CDF rank convention, got {q!r}")
    width = (hi - lo) / bins
    b, oob = _hist_bin_cols(F.col("__v"), F.lit(float(lo)),
                            F.lit(width), bins)
    hist = (df.select(*g, F.col(value_col).cast("double").alias("__v"))
            .where(F.col("__v").isNotNull())
            .withColumn("__b", b.cast("long"))
            .withColumn("__oob", oob.cast("long"))
            .groupBy(*g, "__b").agg(F.count(F.lit(1)).alias("__c"),
                                    F.sum("__oob").alias("__oc")))
    return _hist_fold(hist, g, lo, width, qs)


def _hist_fold(hist: DataFrame, g, lo: float, width: float,
               qs) -> DataFrame:
    """Quantile extraction over a built histogram table (group...,
    __b, __c, __oc) — the rank/interpolation stage of
    histogram_quantiles factored out so the single-pass operator and
    the time-bucketed rollup (histogram_rollup) fold IDENTICAL cell
    tables through ONE arithmetic definition (the _hll_fold
    convention). All windows here run over ≤ `bins` histogram rows
    per group, never the data."""
    wgrp = Window.partitionBy(*g) if g else Window.partitionBy()
    cum = (hist
           .withColumn("__cum", F.sum("__c").over(wgrp.orderBy("__b")))
           .withColumn("__n", F.sum("__c").over(wgrp))
           .withColumn("__nc", F.sum("__oc").over(wgrp)))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ranked = cum.select(*g, "__b", "__c", "__cum", "__n", "__nc", qcol)
    r = F.ceil(F.col("q") * F.col("__n").cast("double"))
    covering = ranked.where((F.col("__cum") - F.col("__c") < r)
                            & (r <= F.col("__cum")))
    est = (F.lit(float(lo))
           + F.lit(width) * (F.col("__b").cast("double")
                             + (r.cast("double")
                                - (F.col("__cum") - F.col("__c"))
                                .cast("double"))
                             / F.col("__c").cast("double")))
    return covering.select(
        *g, "q", F.col("__n").alias("n"), F.col("__nc").alias("n_clamped"),
        _fr6(est).alias("est"))


def histogram_rollup(df: DataFrame, value_col: str, time_col: str = "time",
                     by=None, bucket_ns: int = 86_400_000_000_000,
                     lo: float = 0.0, hi: float = 1.0, bins: int = 1024,
                     qs=(0.5, 0.95, 0.99)) -> DataFrame:
    """Time-bucketed HISTOGRAM rollup — the additive sibling of
    hll_rollup's max-merge: per-(group, time-bucket, bin) count
    partials (the table a continuous rollup job persists per
    hour/day), merged across time buckets by cell-wise + into
    whole-range quantile estimates. Together the two rollups cover
    the sketch family's both merge algebras: idempotent max (HLL
    registers — re-delivery-safe) and plain + (histogram cells —
    additive, the at-least-once caveat). The oracle computes the
    SINGLE-PASS histogram quantiles over the whole range, so a green
    hash certifies that per-bucket partials roll up to the exact
    global estimate — why yesterday's persisted partials answer
    "p99 this month" without rescanning raw data.

    Returns (by..., n_buckets, q, n, n_clamped, est): n_buckets = how
    many partial states were merged (provenance, like hll_rollup),
    the rest are histogram_quantiles' own columns — same q
    validation, same clamp exposure, same _hist_fold arithmetic.

    Scale shape: one (group, time-bucket, bin) map-combinable groupBy
    over the data (the persisted partial table, ≤ bins rows per
    bucket), a (group, bin) cell-wise + merge, and _hist_fold's
    ≤ bins-row rank windows. Raw values ride ONE shuffle; per query
    only the merge+fold stages run.
    """
    g = _grp(by)
    if not qs:
        raise ValueError("histogram_rollup: qs must be non-empty")
    for q in qs:
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(
                f"histogram_rollup: q must be in (0, 1] under the "
                f"ceil(q*n) inverted-CDF rank convention, got {q!r}")
    if int(bucket_ns) < 1:
        raise ValueError(f"histogram_rollup: bucket_ns must be >= 1, "
                         f"got {bucket_ns!r}")
    width = (hi - lo) / bins
    b, oob = _hist_bin_cols(F.col("__v"), F.lit(float(lo)),
                            F.lit(width), bins)
    bkt = (F.col("__t") - F.pmod(F.col("__t"), F.lit(int(bucket_ns))))
    partial = (df.select(*g, F.col(time_col).alias("__t"),
                         F.col(value_col).cast("double").alias("__v"))
               .where(F.col("__v").isNotNull() & F.col("__t").isNotNull())
               .withColumn("__bkt", bkt)
               .withColumn("__b", b.cast("long"))
               .withColumn("__oob", oob.cast("long"))
               .groupBy(*g, "__bkt", "__b")
               .agg(F.count(F.lit(1)).alias("__c"),
                    F.sum("__oob").alias("__oc")))
    merged = (partial.groupBy(*g, "__b")
              .agg(F.sum("__c").alias("__c"), F.sum("__oc").alias("__oc")))
    nb = (partial.select(*g, "__bkt").distinct()
          .groupBy(*g).agg(F.count(F.lit(1)).alias("n_buckets")))
    folded = _hist_fold(merged, g, lo, width, qs)
    if g:
        return (nb.join(folded, g)
                .select(*g, "n_buckets", "q", "n", "n_clamped", "est"))
    return (nb.crossJoin(F.broadcast(folded))
            .select("n_buckets", "q", "n", "n_clamped", "est"))


def sketch_merge_proof(df: DataFrame, value_col: str, by=None,
                       k: int = 256, shards: int = 8) -> DataFrame:
    """The mergeability claim as a GREEN ROW instead of prose: build
    per-(group, shard) PARTIAL sketch states explicitly, merge them in a
    second aggregate, and emit the same estimates as the single-pass
    kmv_distinct / hll_distinct — the DuckDB oracle computes the
    SINGLE-PASS forms, so a green hash IS the associativity proof that
    per-executor partial states combine to the exact global state (what
    Spark's partial aggregation does implicitly, made explicit and
    gated).

    shard = pmod(xxhash64(value), shards) is deliberately INDEPENDENT of
    the md5 sketch hash: every shard then holds a representative slice
    of the whole hash space, so the merge genuinely reconciles
    OVERLAPPING states (k-minima competing across shards, the same HLL
    register raced by several shards) rather than trivially disjoint
    ones. The shard key never appears in the oracle — the merged state
    is shard-invariant by construction, which is the theorem under test:

      KMV:  bottom_k(∪_s bottom_k(V_s)) = bottom_k(V)   (associative)
      HLL:  max_s(max over V_s of rho)  = max over V of rho

    Returns (by..., kmv_k_used, kmv_est, hll_buckets_used, hll_est).

    Scale shape: ONE scan — both sketch sides branch from the same
    distinct+hashed table (HLL register maxima are identical on
    distinct input, since duplicates of a value carry the same hash;
    the oracle's single-pass HLL is likewise computed over the distinct
    values), so the data pays the md5 chain and the distinct shuffle
    once — AQE's exchange reuse shares the distinct shuffle between the
    two branches at runtime (verified: the final plan carries one
    ReusedExchange; no persist needed). MEASURED at sf0.1: this is ~5%
    slower LOCALLY than the prior two-scan form (1.92 s vs 1.81 s warm
    — the HLL branch used to collapse raw rows map-side off its own
    scan; it now waits on the shared exchange), a trade taken
    deliberately: at 100 TB a second full scan of the data costs far
    more than a second read of an already-materialized shuffle, and
    scans are the term that grows with data while the reuse overhead
    is fixed. The KMV side is then two bounded windows (per-shard rank,
    then a rank over ≤ shards·k survivors); the HLL side two keyed
    groupBys whose outputs are ≤ shards·m and ≤ m rows per group; the
    final join is per-group sketch-sized. This is the plan a REAL
    multi-level rollup runs (hourly partials → daily merge → global).
    """
    g = _grp(by)
    if int(shards) < 1:
        raise ValueError(
            f"sketch_merge_proof: shards must be >= 1, got {shards!r}")
    shard = F.pmod(F.xxhash64(F.col("__v").cast("string")),
                   F.lit(int(shards)))
    vals = (df.select(*g, F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string")))
            .withColumn("__shard", shard))
    # -- KMV: per-shard bottom-k partials, merged by union + re-rank —
    # _bottom_k with the explicit shard as the phase-1 partition key is
    # EXACTLY this two-phase pipeline (one implementation, so the
    # "merged state == single-pass state" guarantee cannot drift apart)
    merged = _bottom_k(vals, g, k, salt_col="__shard")
    kmv = _kmv_fold(merged, g, k).select(
        *g, F.col("k_used").alias("kmv_k_used"),
        F.col("est_distinct").alias("kmv_est"))
    # -- HLL: per-(group, shard, register) maxima partials, merged by
    # max — branching from the SAME distinct+hashed rows as KMV, with
    # the register mapping single-sourced from _hll_jrho
    j, rho = _hll_jrho()
    partial_regs = (vals
                    .withColumn("__j", j)
                    .withColumn("__rho", rho)
                    .groupBy(*g, "__shard", "__j")
                    .agg(F.max("__rho").alias("__mp")))
    regs = (partial_regs.groupBy(*g, "__j")
            .agg(F.max("__mp").alias("__m")))
    hll = _hll_fold(regs, g).select(
        *g, F.col("n_buckets_used").alias("hll_buckets_used"),
        F.col("est_distinct").alias("hll_est"))
    if g:
        return kmv.join(hll, g)
    return kmv.crossJoin(F.broadcast(hll))


def histogram_quantiles_auto(df: DataFrame, value_col: str, by=None,
                             bins: int = 1024,
                             qs=(0.5, 0.95, 0.99)) -> DataFrame:
    """TWO-PASS histogram quantiles with per-group RANGE DISCOVERY — the
    companion histogram_quantiles needs for columns whose [lo, hi) is
    unknown (fine for SLO latencies with a known budget, wrong for
    arbitrary columns): pass 1 is one map-side-combinable per-group
    (min, max) aggregate; pass 2 bins with the DISCOVERED per-group
    boundaries lo_g = min_g, width_g = (max_g − min_g)/bins, so nothing
    ever clamps (n_clamped ≡ 0 by construction and is therefore not a
    column here — the fixed-range operator exposes it instead). The
    group's exact v_min / v_max ride along in the output. A CONSTANT
    group (max = min) degenerates to a single point: every quantile is
    exactly that value.

    Cross-engine determinism: width = (hi − lo)/bins with bins a power
    of two is an EXACT scaling of the exact min/max, and the binning /
    interpolation replay histogram_quantiles' pinned IEEE op order.

    Returns (by..., q, n, v_min, v_max, est) with est rounded at 6.

    Scale shape: two scans of the data (the price of range discovery —
    the honest alternative to guessing [lo, hi)): pass 1 collapses
    map-side to one (min, max) row per group; pass 2 is the same one
    (group, bin) count shuffle as histogram_quantiles after a broadcast
    join of the |groups|-row range table; rank extraction again runs
    over ≤ `bins` rows per group, never the data.
    """
    g = _grp(by)
    if not qs:
        raise ValueError("histogram_quantiles_auto: qs must be non-empty")
    for q in qs:
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(
                f"histogram_quantiles_auto: q must be in (0, 1] under "
                f"the ceil(q*n) inverted-CDF rank convention, got {q!r}")
    base = (df.select(*g, F.col(value_col).cast("double").alias("__v"))
            .where(F.col("__v").isNotNull()))
    rng = base.groupBy(*g).agg(F.min("__v").alias("__lo"),
                               F.max("__v").alias("__hi"))
    joined = (base.join(F.broadcast(rng), g) if g
              else base.crossJoin(F.broadcast(rng)))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    b_rng, _ = _hist_bin_cols(F.col("__v"), F.col("__lo"), width, bins)
    b = (F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
         .otherwise(b_rng))
    hist = (joined.withColumn("__b", b.cast("long"))
            .groupBy(*g, "__b").agg(F.count(F.lit(1)).alias("__c"),
                                    F.min("__lo").alias("__lo"),
                                    F.min("__hi").alias("__hi")))
    wgrp = Window.partitionBy(*g) if g else Window.partitionBy()
    cum = (hist
           .withColumn("__cum", F.sum("__c").over(wgrp.orderBy("__b")))
           .withColumn("__n", F.sum("__c").over(wgrp)))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ranked = cum.select(*g, "__b", "__c", "__cum", "__n",
                        "__lo", "__hi", qcol)
    r = F.ceil(F.col("q") * F.col("__n").cast("double"))
    covering = ranked.where((F.col("__cum") - F.col("__c") < r)
                            & (r <= F.col("__cum")))
    width2 = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    est = (F.when(F.col("__hi") == F.col("__lo"), F.col("__lo"))
           .otherwise(F.col("__lo")
                      + width2 * (F.col("__b").cast("double")
                                  + (r.cast("double")
                                     - (F.col("__cum") - F.col("__c"))
                                     .cast("double"))
                                  / F.col("__c").cast("double"))))
    return covering.select(
        *g, "q", F.col("__n").alias("n"),
        F.col("__lo").alias("v_min"), F.col("__hi").alias("v_max"),
        _fr6(est).alias("est"))


def kmv_overlap_matrix(df: DataFrame, value_col: str, group_col: str,
                       k: int = 256, salts: int = KMV_SALTS,
                       hash_fn: str = "md5") -> DataFrame:
    """PAIRWISE set-operation estimates across ALL groups from their KMV
    sketches — kmv_setops generalized from one pair to the full
    audience-overlap MATRIX ("which audiences share users", "which
    corpora share documents"), making the theta-sketch scale claim real:
    G sketch BUILDS (one distinct shuffle + the two-phase bottom-k),
    then every pairwise estimate is set algebra over the G·k-row sketch
    table — G² pairs never touch the data again.

    Per pair (a, b): θ_ab = min(θ_a, θ_b) with each group's θ = its
    k-th smallest hash, or 2^60 when its sketch is exhaustive (the
    kmv_setops theta convention); below θ_ab both sketches are exact
    samples of [0, θ_ab], so with n_a / n_b / n_common the ≤-θ survivor
    counts the estimators are kmv_setops' own, floor-round-6. Two
    exhaustive groups ⇒ that pair's row is exact.

    Returns one row per unordered pair, g_a < g_b lexicographically:
    (g_a, g_b, theta, n_a, n_b, n_common, est_union, est_intersection,
    jaccard_est); jaccard_est is NULL when both survivor sets are empty.

    Scale shape: the data-sized work is exactly the kmv_distinct build;
    the pair enumeration is a |G|×|G| nested-loop join of the G-row
    theta summary (bounded by the GROUP COUNT, never the data), the
    survivor/common counts are hash joins on the G·k-row sketch table,
    and the output is G(G−1)/2 rows. At 100 TB the sketch table for a
    thousand groups is a few MB — broadcastable — while the exact
    answer would be a thousand-way self-join of the raw keys.

    hash_fn: "md5" (oracle default) | "fast" (xxhash64 — the
    production split, see _sketch_hash; in the exhaustive regime the
    two paths return IDENTICAL exact answers, pytest-pinned).
    """
    from ..cache import keep
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__g").isNotNull() & F.col("__v").isNotNull())
            .distinct()
            .withColumn("__h", _sketch_hash(F.col("__v"), hash_fn)))
    # the sketch table is consumed by FOUR branches (theta summary +
    # three count joins); it is G·k rows — persist it (generation-
    # bounded) so the data-sized build runs once, not once per branch
    sk = keep("sk.overlap.sk",
              _bottom_k(base, ["__g"], k, salts).select("__g", "__h"))
    summ = (sk.groupBy("__g").agg(F.max("__h").alias("__t"),
                                  F.count(F.lit(1)).alias("__ku"))
            .select("__g", _theta_col(k).alias("__theta")))
    a = summ.select(F.col("__g").alias("g_a"),
                    F.col("__theta").alias("__ta"))
    b = summ.select(F.col("__g").alias("g_b"),
                    F.col("__theta").alias("__tb"))
    pairs = (a.join(b, F.col("g_a") < F.col("g_b"))
             .select("g_a", "g_b",
                     F.least("__ta", "__tb").alias("theta")))
    ska = sk.select(F.col("__g").alias("g_a"), F.col("__h").alias("__h"))
    skb = sk.select(F.col("__g").alias("g_b"), F.col("__h").alias("__h"))
    na = (pairs.join(ska, "g_a")
          .where(F.col("__h") <= F.col("theta"))
          .groupBy("g_a", "g_b").agg(F.count(F.lit(1)).alias("n_a")))
    nb = (pairs.join(skb, "g_b")
          .where(F.col("__h") <= F.col("theta"))
          .groupBy("g_a", "g_b").agg(F.count(F.lit(1)).alias("n_b")))
    nc = (pairs.join(ska, "g_a").join(skb, ["g_b", "__h"])
          .where(F.col("__h") <= F.col("theta"))
          .groupBy("g_a", "g_b").agg(F.count(F.lit(1)).alias("n_common")))
    out = (pairs
           .join(na, ["g_a", "g_b"], "left")
           .join(nb, ["g_a", "g_b"], "left")
           .join(nc, ["g_a", "g_b"], "left")
           .select("g_a", "g_b", "theta",
                   F.coalesce("n_a", F.lit(0)).alias("n_a"),
                   F.coalesce("n_b", F.lit(0)).alias("n_b"),
                   F.coalesce("n_common", F.lit(0)).alias("n_common")))
    return _setops_select(out, ["g_a", "g_b"])


def hll_rollup(df: DataFrame, value_col: str, time_col: str = "time",
               by=None, bucket_ns: int = 86_400_000_000_000,
               hash_fn: str = "md5") -> DataFrame:
    """Time-bucketed HLL ROLLUP — the hypertable pattern (hourly/daily
    partial states materialized once, whole-range answers from merging
    states, never from rescanning raw data): builds the per-(group,
    bucket) register table a continuous rollup job would persist, then
    merges it across buckets by register-wise max into the whole-range
    distinct estimate. The TIME-dimension sibling of sk_merge's
    shard-dimension proof: the oracle computes the single-pass HLL over
    the whole range, so the green hash certifies that per-bucket
    partials roll up to the exact global state (associativity again) —
    which is precisely why a day's partials answer "distinct users this
    month" without touching the raw events.

    Returns (by..., n_buckets, n_buckets_used, n_empty, est_distinct):
    n_buckets = how many partial states were merged (the rollup's
    provenance column), the rest are hll_distinct's own outputs.

    Scale shape: one (group, bucket, register) map-combinable groupBy —
    ≤ m rows per (group, bucket) — then a (group, register) merge and a
    ≤ m-row fold; the raw values ride ONE shuffle. At 100 TB the
    partial table is persisted incrementally (per day, by the ingest
    pipeline) and only the merge+fold stages run per query — this
    operator IS that query.
    """
    g = _grp(by)
    bkt = (F.col("__t") - F.pmod(F.col("__t"), F.lit(int(bucket_ns))))
    base = (df.select(*g, F.col(time_col).alias("__t"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull() & F.col("__t").isNotNull())
            .withColumn("__bkt", bkt)
            .withColumn("__h", _sketch_hash(F.col("__v"), hash_fn)))
    j, rho = _hll_jrho()
    partial = (base.withColumn("__j", j).withColumn("__rho", rho)
               .groupBy(*g, "__bkt", "__j")
               .agg(F.max("__rho").alias("__mp")))
    regs = (partial.groupBy(*g, "__j").agg(F.max("__mp").alias("__m")))
    nb = (partial.select(*g, "__bkt").distinct()
          .groupBy(*g).agg(F.count(F.lit(1)).alias("n_buckets")))
    folded = _hll_fold(regs, g)
    if g:
        return nb.join(folded, g).select(*g, "n_buckets",
                                         "n_buckets_used", "n_empty",
                                         "est_distinct")
    return (nb.crossJoin(F.broadcast(folded))
            .select("n_buckets", "n_buckets_used", "n_empty",
                    "est_distinct"))


def hll_cube(df: DataFrame, value_col: str, dims: list,
             sets: list | None = None,
             hash_fn: str = "md5") -> DataFrame:
    """Distinct-count CUBE from ONE register table — every grouping
    set of `dims` answered by merging the finest-grain HLL partials,
    never by rescanning the raw data. The OLAP generalization of
    hll_rollup's single time axis: a COUNT(DISTINCT) cube costs one
    full shuffle PER grouping set on an exact engine (distinct is not
    an algebraic aggregate — Spark literally expands the input N ways),
    while HLL states are mergeable, so the cube costs ONE data-sized
    shuffle to build the per-(dims..., register) partials and the
    grouping sets ride a single Expand over that bounded table
    (≤ m rows per finest cell).

    `sets` is a list of dim-name tuples (default: the full cube —
    every subset of `dims`, finest first); the register id is an
    always-on key, so one Catalyst grouping-sets node computes every
    set's merged registers in one pass. Output one row per (set,
    cell): (dims..., level, n_buckets_used, n_empty, est_distinct)
    where aggregated-out dims are NULL and `level` is the grouping
    bitmask (bit i set = dims[i] aggregated out — the standard
    GROUPING_ID encoding, disambiguating a genuine NULL dim value from
    an aggregated-out dim), folded by the same _hll_fold as every
    other consumer of the register mapping.

    Scale shape: one (dims..., register) map-combinable groupBy over
    the data, then Expand × |sets| over the partial table (bounded by
    m · Π|dims| cells, not by rows), each set folding ≤ m registers
    per cell. At 100 TB the partial table is the thing a rollup job
    persists; this operator is the query plan every dashboard
    drill-down shares.
    """
    if not dims:
        raise ValueError("hll_cube: dims must be non-empty")
    if sets is None:
        from itertools import combinations
        sets = [list(c) for r in range(len(dims), -1, -1)
                for c in combinations(dims, r)]
    for s in sets:
        if any(d not in dims for d in s):
            raise ValueError(f"hll_cube: set {s} not a subset of {dims}")
    rows = _hll_rows(df, value_col, _grp(dims), hash_fn)
    partial = (rows.groupBy(*dims, "__j")
               .agg(F.max("__rho").alias("__mp")))
    level = sum((F.grouping(d).cast("long") * F.lit(1 << i)
                 for i, d in enumerate(dims)), F.lit(0).cast("long"))
    regs = (partial.groupingSets([list(s) + ["__j"] for s in sets],
                                 *dims, "__j")
            .agg(F.max("__mp").alias("__m"), level.alias("level")))
    return _hll_fold(regs, list(dims) + ["level"])


def bloom_semijoin(big: DataFrame, small: DataFrame,
                   big_key: str, small_key: str,
                   m_bits: int = 1024, hashes: int = 4,
                   seed: int = 5) -> DataFrame:
    """Bloom-filter RUNTIME-FILTER audit for a semi-join — the
    measurement behind "push a bloom of the small side's keys into
    the big side's scan" (Spark AQE's runtime bloom filter, Bloom
    1970): the small side's distinct keys are folded into an m-bit
    bitmap (d word-positions per key from the shared universal hash
    family, OR-merged — bit_or is associative, commutative AND
    idempotent, so bloom states merge like HLL registers), the big
    side is probed MAP-ONLY against the bitmap embedded as a literal,
    and the output quantifies exactly what the filter buys:

      (n_small_keys, n_big_rows, n_pass_bloom, n_true_match,
       n_false_pos, fp_ppm)

    with n_false_pos = bloom-positive rows whose key is NOT in the
    small side (no false negatives by construction — the pytest pins
    n_pass_bloom ≥ n_true_match and every matching row passing) and
    fp_ppm the false-positive rate over the non-matching rows the
    filter exists to kill (floor ppm; the standard (1−e^{−dn/m})^d
    prediction is the docstring's calibration point). Deterministic:
    the md5 hash64 + LCG coefficient family is the oracle-replayable
    convention of every sketch here — decontaminate_bloom is the
    xxhash64 production sibling; this operator exists to make the
    filter's SELECTIVITY a gated, testable number.

    EAGER: collecting the ≤ m_bits/64 bitmap words runs the small
    side's aggregation at construction (m_bits/64 longs to the
    driver — 16 longs at the default; the decontaminate_bloom/zipf
    convention, noted for plan-only callers).

    Scale shape: bitmap build = one distinct + position explode into
    a (word)-keyed bit_or, ≤ m/64 rows out of the shuffle; the probe
    is a map-side literal-array bit test in the big side's scan — the
    whole point: the filter costs ZERO shuffle on the big side, and
    kills (1 − fp) of the non-matching rows before any join. The
    exact-match side here is the audit (at scale it is the join the
    bloom protects).
    """
    if int(m_bits) < 64 or int(m_bits) % 64:
        raise ValueError(f"bloom_semijoin: m_bits must be a positive "
                         f"multiple of 64, got {m_bits!r}")
    if int(hashes) < 1:
        raise ValueError(f"bloom_semijoin: hashes must be >= 1, "
                         f"got {hashes!r}")
    p = F.lit(MERSENNE_P)
    coeffs = minhash_coeffs(int(hashes), seed=seed)
    keys = (small.select(F.col(small_key).alias("__k"))
            .where(F.col("__k").isNotNull()).distinct())
    kh = keys.withColumn("__h", hash64_expr(F.col("__k").cast("string"))
                         % p)
    pos = F.array(*[((F.lit(a) * F.col("__h") + F.lit(b)) % p)
                    % F.lit(int(m_bits)) for a, b in coeffs])
    words = (kh.select(F.explode(pos).alias("__p"))
             .selectExpr("cast(__p div 64 as int) AS w",
                         "shiftleft(cast(1 as bigint), "
                         "cast(__p % 64 as int)) AS b")
             .groupBy("w").agg(F.bit_or("b").alias("bits")).collect())
    bitmap = [0] * (int(m_bits) // 64)
    for r in words:
        bitmap[r["w"]] |= r["bits"]
    bm = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    # build the probe predicate as ONE sql string over a named hash col
    tests = []
    for a, b in coeffs:
        posj = f"(({a}L * __h + {b}L) % {MERSENNE_P}L) % {int(m_bits)}L"
        tests.append(
            f"(element_at({bm}, cast(({posj}) div 64 as int) + 1) & "
            f"shiftleft(cast(1 as bigint), cast(({posj}) % 64 as int)))"
            f" != 0")
    probe = " AND ".join(tests)
    bigk = (big.select(F.col(big_key).alias("__k"))
            .where(F.col("__k").isNotNull())
            .withColumn("__h", hash64_expr(F.col("__k").cast("string"))
                        % p))
    n_big = bigk.agg(F.count(F.lit(1)).cast("long").alias("n_big_rows"))
    n_pass = (bigk.where(F.expr(probe))
              .agg(F.count(F.lit(1)).cast("long").alias("n_pass_bloom")))
    n_match = (bigk.join(F.broadcast(keys), "__k", "left_semi")
               .agg(F.count(F.lit(1)).cast("long")
                    .alias("n_true_match")))
    n_small = keys.agg(F.count(F.lit(1)).cast("long")
                       .alias("n_small_keys"))
    one = (n_small.crossJoin(F.broadcast(n_big))
           .crossJoin(F.broadcast(n_pass))
           .crossJoin(F.broadcast(n_match)))
    return one.select(
        "n_small_keys", "n_big_rows", "n_pass_bloom", "n_true_match",
        (F.col("n_pass_bloom") - F.col("n_true_match"))
        .alias("n_false_pos"),
        F.expr("((n_pass_bloom - n_true_match) * 1000000) div "
               "greatest(1L, n_big_rows - n_true_match)")
        .alias("fp_ppm"))


def kmv_difference(df: DataFrame, value_col: str, group_col: str,
                   group_a, group_b, k: int = 256,
                   salts: int = KMV_SALTS) -> DataFrame:
    """Set-DIFFERENCE and CONTAINMENT estimates between two groups'
    value sets from their KMV sketches — the third leg of the
    theta-sketch set algebra (sk_kmv_setops ships union/intersection/
    Jaccard; this ships |A∖B|, |B∖A| and the directional containments
    |A∩B|/|A| and |A∩B|/|B| — the "how much of corpus A is already
    inside corpus B" question cross-corpus dedup planning asks before
    committing to a merge). Same θ convention as kmv_setops
    (exhaustive sketch ⇒ θ = 2⁶⁰, _theta_col single-sourced); below θ
    both sketches are exact samples of [0, θ], so with n_a / n_b /
    n_common the ≤-θ survivor counts:

      est_diff_ab      = (n_a − n_common) · 2⁶⁰ / θ
      est_diff_ba      = (n_b − n_common) · 2⁶⁰ / θ
      containment_ab   = n_common / n_a        (NULL when n_a = 0)
      containment_ba   = n_common / n_b        (NULL when n_b = 0)

    — integer counts, one pinned multiply+divide each, floor-round-6.
    Two exhaustive groups ⇒ all four are exact.

    Returns ONE row: (theta, n_a, n_b, n_common, est_diff_ab,
    est_diff_ba, containment_ab, containment_ba).

    Scale shape: identical to kmv_setops — one distinct shuffle + the
    two-phase salted bottom-k build, then every join/aggregate on
    ≤ k rows per side, θ a 1-row scalar broadcast.
    """
    g = F.col("__g")
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull()
                   & g.isin([group_a, group_b]))
            .distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string"))))
    sk = _bottom_k(base, ["__g"], k, salts).select("__g", "__h")
    theta = (sk.groupBy("__g").agg(F.max("__h").alias("__t"),
                                   F.count(F.lit(1)).alias("__ku"))
             .select(_theta_col(k).alias("__t"))
             .agg(F.min("__t").alias("theta")))
    sa = sk.where(g == group_a).select("__h")
    sb = sk.where(g == group_b).select("__h")
    na = (sa.crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_a")))
    nb = (sb.crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_b")))
    nc = (sa.join(sb, "__h")
          .crossJoin(F.broadcast(theta))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).alias("n_common")))
    one = (theta.crossJoin(F.broadcast(na))
           .crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nc)))
    m = F.lit(float(HASH_SPACE))
    return one.select(
        "theta", "n_a", "n_b", "n_common",
        _fr6((F.col("n_a") - F.col("n_common")).cast("double") * m
             / F.col("theta").cast("double")).alias("est_diff_ab"),
        _fr6((F.col("n_b") - F.col("n_common")).cast("double") * m
             / F.col("theta").cast("double")).alias("est_diff_ba"),
        F.when(F.col("n_a") > 0,
               _fr6(F.col("n_common").cast("double")
                    / F.col("n_a").cast("double")))
        .alias("containment_ab"),
        F.when(F.col("n_b") > 0,
               _fr6(F.col("n_common").cast("double")
                    / F.col("n_b").cast("double")))
        .alias("containment_ba"))


def kmv_union_k(df: DataFrame, value_col: str, group_col: str,
                k: int = 256, salts: int = KMV_SALTS) -> DataFrame:
    """K-WAY theta-sketch union fold — |G₁ ∪ G₂ ∪ … ∪ G_n| over ALL
    groups of `group_col` in ONE pass (the Dasgupta et al. 2016 theta
    union operation generalized past kmv_setops' pairwise form): the
    multi-campaign audience question ("how many distinct users did ANY
    of these N campaigns reach") from G sketch builds, never G scans
    and never a global distinct of the raw keys.

    θ = min over groups of each group's theta (k-th smallest retained
    hash; 2⁶⁰ when the group's sketch is exhaustive — _theta_col, the
    single-sourced convention). Below θ every group's sketch is an
    EXACT sample of that group's hash set ∩ [0, θ] (KMV keeps the k
    smallest, and θ ≤ θ_g means nothing ≤ θ was evicted), so the
    DISTINCT union of all sketch hashes ≤ θ is exactly
    |∪ᵢ Gᵢ| ∩ [0, θ] and

      est_union = n_union · 2⁶⁰ / θ

    — integer survivor count, ONE pinned multiply+divide,
    floor-round-6. All groups exhaustive ⇒ θ = 2⁶⁰ and the estimate
    is EXACT. Zero groups ⇒ (0, 2⁶⁰, 0, 0.0) — the union of no sets,
    exactly sampled by the full space.

    Returns ONE row: (n_groups, theta, n_union, est_union).

    Scale shape: one distinct shuffle + the two-phase salted bottom-k
    build (G·k sketch rows out — the only data-sized stage), then the
    per-group theta fold (G rows), the distinct-union survivor count
    (≤ G·k rows) and 1-row scalar broadcasts (the kmv_setops
    convention). Sketch states persist and merge, so adding a new
    group to the union is one more k-row sketch, not a rescan.
    """
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull() & F.col("__g").isNotNull())
            .distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string"))))
    sk = _bottom_k(base, ["__g"], k, salts).select("__g", "__h")
    stats = (sk.groupBy("__g").agg(F.max("__h").alias("__t"),
                                   F.count(F.lit(1)).alias("__ku"))
             .select(_theta_col(k).alias("__t"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                  F.coalesce(F.min("__t"), F.lit(HASH_SPACE))
                  .cast("long").alias("theta")))
    nu = (sk.select("__h").distinct()
          .crossJoin(F.broadcast(stats.select("theta")))
          .where(F.col("__h") <= F.col("theta"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_union")))
    one = stats.crossJoin(F.broadcast(nu))
    return one.select(
        "n_groups", "theta", "n_union",
        _fr6(F.col("n_union").cast("double")
             * F.lit(float(HASH_SPACE))
             / F.col("theta").cast("double")).alias("est_union"))


def kmv_intersect_k(df: DataFrame, value_col: str, group_col: str,
                    k: int = 256, salts: int = KMV_SALTS) -> DataFrame:
    """K-WAY theta-sketch intersection — |G₁ ∩ G₂ ∩ … ∩ G_n| over ALL
    groups of `group_col` in one pass, completing the k-way set
    algebra next to kmv_union_k (the "users EVERY campaign reached"
    question, where the union fold answers "ANY"). Same build, same
    single-sourced θ convention: below θ = min over groups of the
    exhaustive-aware theta, every group's sketch is an exact sample of
    that group's hash set ∩ [0, θ], so a hash ≤ θ present in ALL G
    sketches is exactly a member of the intersection ∩ [0, θ] and

      est_intersection = n_common · 2⁶⁰ / θ

    — integer survivor count (hashes ≤ θ whose DISTINCT group count
    equals n_groups), one pinned multiply+divide, floor-round-6. All
    groups exhaustive ⇒ exact. Zero groups ⇒ (0, 2⁶⁰, 0, 0.0) by the
    kmv_union_k degenerate convention (documented, not the set-theory
    "universe" — an empty group list has no audience to intersect).

    Caveat (standard theta-sketch behavior, Dasgupta et al. 2016 §3):
    intersection error grows as the true intersection shrinks relative
    to θ·2⁻⁶⁰ sampling — a tiny overlap of huge sets can land on zero
    survivors. The exact-below-θ property still bounds it one-sided.

    Returns ONE row: (n_groups, theta, n_common, est_intersection).

    Scale shape: identical to kmv_union_k — one distinct shuffle + the
    two-phase salted bottom-k (G·k sketch rows), the G-row theta fold,
    one ≤ G·k-row (hash → distinct-group count) aggregate, 1-row
    scalar broadcasts.
    """
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull() & F.col("__g").isNotNull())
            .distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string"))))
    sk = (_bottom_k(base, ["__g"], k, salts)
          .select("__g", "__h").distinct())
    stats = (sk.groupBy("__g").agg(F.max("__h").alias("__t"),
                                   F.count(F.lit(1)).alias("__ku"))
             .select(_theta_col(k).alias("__t"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                  F.coalesce(F.min("__t"), F.lit(HASH_SPACE))
                  .cast("long").alias("theta")))
    nc = (sk.crossJoin(F.broadcast(stats))
          .where(F.col("__h") <= F.col("theta"))
          .groupBy("__h", "n_groups")
          .agg(F.count(F.lit(1)).alias("__cg"))
          .where(F.col("__cg") == F.col("n_groups"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    one = stats.crossJoin(F.broadcast(nc))
    return one.select(
        "n_groups", "theta", "n_common",
        _fr6(F.col("n_common").cast("double")
             * F.lit(float(HASH_SPACE))
             / F.col("theta").cast("double")).alias("est_intersection"))
