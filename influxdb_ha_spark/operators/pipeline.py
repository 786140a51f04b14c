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


def ngram_overlap(train: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 13, threshold: float = 0.1) -> DataFrame:
    """Per-document n-gram contamination FRACTION (the 'dirty document'
    metric of GPT-3's appendix-C decontamination analysis, Brown et al.
    2020 arXiv:2005.14165, used at 8-13 grams by the LLM-scale corpus
    audits): for EVERY training doc, the fraction of its DISTINCT word
    n-grams that appear anywhere in the evaluation set, plus a
    contaminated flag at `threshold`.

    `decontaminate` answers "which docs overlap at all, and how many
    shingles" (inner-join sliver, contaminated docs only); this op is
    the normalized AUDIT view — output cardinality is exactly |train
    docs with text| (the r6 series-cardinality convention: clean docs
    report 0.0, never vanish), which is what a contamination-rate
    report or a threshold sweep needs.

    Shape at 100 TB (single-pass, r7): the corpus is shingled ONCE —
    one projection computes the distinct-gram array, and BOTH the
    in-row denominator (`size`) and the exploded gram stream derive
    from it, so the tokenize/shingle work appears once in the plan.
    The eval n-gram set is benchmark-sized and broadcasts; the
    explode→broadcast-left-join happens map-side, and the per-doc
    groupBy's partial aggregation collapses each partition to ~|docs|
    rows before the one shuffle — grams never ride the wire. The old
    totals⋈shared join is gone entirely (one aggregation carries both
    the denominator and the hit count).
    """
    grams = lambda df: F.array_distinct(           # noqa: E731
        shingles_expr(tokens_expr(F.col(text_col)), n))
    tr = (ensure_min_parallelism(train)
          .where(F.col(text_col).isNotNull()))
    ev = (eval_set.where(F.col(text_col).isNotNull())
          .select(F.explode(grams(eval_set)).alias("__g")).distinct()
          .withColumn("__hit", F.lit(1)))
    base = tr.select(F.col(id_col), grams(tr).alias("__grams"))
    # explode_outer keeps zero-gram docs (null __g -> no hit); the
    # left join against the broadcast eval set marks hits map-side
    j = (base.select(id_col,
                     F.size("__grams").cast("long").alias("n_ngrams"),
                     F.explode_outer("__grams").alias("__g"))
         .join(F.broadcast(ev), "__g", "left")
         .groupBy(id_col)
         .agg(F.max("n_ngrams").alias("n_ngrams"),
              F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
              .cast("long").alias("n_shared")))
    frac = F.when(
        F.col("n_ngrams") > 0,
        F.floor(F.col("n_shared").cast("double")
                / F.col("n_ngrams").cast("double") * 1e6 + F.lit(0.5))
        / F.lit(1e6)).otherwise(F.lit(0.0))
    return j.select(id_col, "n_ngrams", "n_shared",
                    frac.alias("overlap_frac"),
                    (frac > F.lit(float(threshold))).alias("contaminated"))


def decontaminate_bloom(train: DataFrame, eval_set: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, m_bits: int = 1 << 16,
                        hashes: int = 4) -> DataFrame:
    """`decontaminate` with a Bloom prefilter: identical output, fixed
    probe footprint.

    The exact operator broadcasts the whole eval shingle set to every
    executor — O(|eval shingles|) memory per executor, which stops
    scaling when the decontamination list is itself large (all benchmark
    suites + held-out docs can reach 10^8 shingles). Here the eval set is
    compressed into an `m_bits` Bloom bitmap (m/8 bytes total, e.g. 8 KB
    at the default), the corpus is probed MAP-ONLY against the bitmap
    embedded as a literal array — zero shuffle, zero broadcast table —
    and only the bloom-positive sliver (true positives + the filter's FP
    rate) pays the exact broadcast verify. Bloom filters have no false
    negatives, so after verification the result equals `decontaminate`
    exactly (same oracle); `m_bits`/`hashes` trade prefilter selectivity
    for bitmap size with the standard (1-e^{-kn/m})^k FP rate.
    """
    from .hashing import sql_shingles, sql_tokens

    ev = (eval_set.select(F.explode(F.array_distinct(
        shingles_expr(tokens_expr(F.col(text_col)), k))).alias("__sh"))
        .distinct())
    # bitmap build: k word-positions per eval shingle → bit_or per 64-bit
    # word — one tiny shuffle keyed on the word index; only m/64 longs
    # ever reach the driver
    pos = [F.pmod(F.xxhash64(F.col("__sh"), F.lit(j)), F.lit(m_bits))
           for j in range(hashes)]
    words = (ev.select(F.explode(F.array(*pos)).alias("p"))
             .selectExpr("cast(p div 64 as int) AS w",
                         "shiftleft(cast(1 as bigint), "
                         "cast(p % 64 as int)) AS b")
             .groupBy("w").agg(F.bit_or("b").alias("bits")).collect())
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] |= r["bits"]
    bm_sql = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"

    def bit_test(j: int) -> str:
        p = f"pmod(xxhash64(s, {j}), {m_bits})"
        return (f"(element_at(__bm, cast({p} div 64 as int) + 1) & "
                f"shiftleft(cast(1 as bigint), cast({p} % 64 as int))) != 0")

    probe = ("exists(__sh, s -> "
             + " AND ".join(bit_test(j) for j in range(hashes)) + ")")
    cand = (ensure_min_parallelism(train)
            .selectExpr(f"`{id_col}`", f"{sql_tokens(f'`{text_col}`')} AS __t")
            .selectExpr(f"`{id_col}`",
                        f"array_distinct({sql_shingles('__t', k)}) AS __sh")
            .selectExpr(f"`{id_col}`", "__sh", f"{bm_sql} AS __bm")
            .where(F.expr(probe))
            .select(F.col(id_col), F.explode("__sh").alias("__sh")))
    # exact verify over the sliver only — removes bloom false positives
    return (cand.join(F.broadcast(ev), "__sh")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared_shingles")))


def token_budget_mixture(df: DataFrame, weights: dict[str, float],
                         total_tokens: int, text_col: str = "text",
                         id_col: str = "doc_id",
                         source_col: str = "source") -> DataFrame:
    """Token-budget corpus MIXING — the data-mixture construction step
    of Pile/LLaMA-style pretraining recipes ("x% of training tokens
    from source A, y% from B"; Gao et al. 2020 arXiv:2101.00027 §1
    frames mixing as per-set weights over a token budget): given
    per-source token FRACTIONS and a total budget, sample each source
    by deterministic hash threshold at the rate that meets its budget
    in expectation.

    EXACT integer arithmetic end to end (no float ever enters the
    plan): weights convert ONCE driver-side to parts-per-million
    (wppm = round(frac*1e6) — the only float op, on user-given nice
    fractions); per-source token totals S_s are integer aggregates;
    target_s = total_tokens * wppm // 10^6 and the acceptance
    threshold min(10^6, target_s * 10^6 // S_s) are integer floor
    divisions, compared against hash64(doc_id) % 10^6 (the
    weighted_sample convention — population-exact to 1e-6,
    reproducible on any cluster layout). A source absent from
    `weights` samples at 0.

    Output is the REPORT form, cardinality = |docs with text|:
    (doc_id, source, n_tokens, keep) — filter keep for the shard;
    clean-vs-dropped is auditable per row (the r6 never-vanish
    convention).

    Shape at 100 TB: ONE source-keyed aggregation (|sources| rows to
    the driver — the k-means collect convention) and a map-only
    projection; the corpus never shuffles.
    """
    m = 1_000_000
    toks = tokens_expr(F.col(text_col))
    base = (ensure_min_parallelism(df)
            .where(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.col(source_col),
                    F.size(toks).cast("long").alias("n_tokens")))
    totals = {r[source_col]: int(r["__s"]) for r in
              base.groupBy(source_col)
              .agg(F.sum("n_tokens").alias("__s")).collect()}
    thr = F.lit(0)
    for src in sorted(totals):
        wppm = int(round(float(weights.get(src, 0.0)) * m))
        target = int(total_tokens) * wppm // m
        t = min(m, target * m // totals[src]) if totals[src] > 0 else 0
        thr = F.when(F.col(source_col) == src, F.lit(t)).otherwise(thr)
    return base.select(
        id_col, source_col, "n_tokens",
        (hash64_expr(F.col(id_col).cast("string")) % F.lit(m) < thr)
        .alias("keep"))


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


def pack_sequences(df: DataFrame, seq_len: int = 512,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """GPT-style concat-and-chunk sequence packing layout: documents are
    concatenated in id order and cut into fixed `seq_len`-token training
    sequences; each doc reports its global token offset and the first/last
    sequence index it lands in.

    The hard part at scale is the GLOBAL running token count — a keyless
    window would funnel 100 TB through one partition. Reuses the
    distributed prefix-sum (functions/scan.distributed_cumsum): per-bucket
    cumsum + a broadcast P-row offset table, so the data never leaves its
    partitions. Deterministic (id-ordered), so the same packing layout
    comes out on any cluster.
    """
    from ..functions.scan import distributed_cumsum

    d = (ensure_min_parallelism(df)
         .select(F.col(id_col),
                 F.size(tokens_expr(F.col(text_col))).cast("long")
                 .alias("n_tokens")))
    c = distributed_cumsum(d, "n_tokens", id_col, "__cum")
    off = F.col("__cum") - F.col("n_tokens")
    last_tok = F.when(F.col("n_tokens") > 0, F.col("__cum") - 1).otherwise(off)
    return (c.select(
        F.col(id_col), F.col("n_tokens"),
        off.alias("token_offset"),
        F.floor(off / F.lit(seq_len)).cast("long").alias("first_seq"),
        F.floor(last_tok / F.lit(seq_len)).cast("long").alias("last_seq")))


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out: str = "scrubbed") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped numbers with typed
    placeholders and count each. Pure regexp column expressions — map-only,
    zero shuffle, codegen'd; exactly the shape a 100 TB scrub pass needs.
    Patterns applied in list order (email first so its digits can't be
    half-eaten by the looser number patterns)."""
    d = ensure_min_parallelism(df)
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        d = d.withColumn(f"n_{name}s",
                         F.regexp_count(scrubbed, F.lit(pat)).cast("long"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return d.withColumn(out, scrubbed)


def weighted_sample(df: DataFrame, rates: dict[str, float],
                    default_rate: float = 0.0,
                    stratum_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Domain-weighted corpus sampling (the data-mixture step): keep each
    doc with its source's rate, decided by hash threshold — deterministic,
    map-only, zero shuffle (vs. rand(): irreproducible; vs. per-source
    limits: a global shuffle). Rates are exact at the population level:
    hash64 % 1e6 is uniform, so P(keep) = rate to 1e-6."""
    m = F.lit(1_000_000)
    thr = F.lit(int(default_rate * 1_000_000))
    for src, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == src,
                     F.lit(int(rate * 1_000_000))).otherwise(thr)
    return (df.where(hash64_expr(F.col(id_col).cast("string")) % m < thr)
            .select(id_col, stratum_col))


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


def dsir_scores(df: DataFrame, target_pred, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 1024,
                alpha: float = 1.0) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — Data
    Selection for Language Models via Importance Resampling): score
    every document by the log-likelihood ratio of a target-domain
    hashed-n-gram model to the raw-corpus model; resampling by these
    weights selects raw data distributed like the target domain.

    Stages:
      1. features = unigram + bigram buckets (md5-64 mod n_buckets, the
         oracle hash family), order-preserving concat per doc;
      2. one bucket-count aggregation per side (target = target_pred
         rows, raw = the rest) — explode keyed on the bucket id, heavy
         map-side combine (B distinct keys); the collect is 2·B bounded
         rows (the lm_score-vocab / kmeans-centroid collect precedent);
      3. per-bucket add-α log weights computed in PYTHON — math.log and
         DuckDB's ln share libm, while JVM Math.log is intrinsified and
         can drift an ulp — inlined as a B-term literal array (well
         under similarity.LITERAL_TERM_CAP);
      4. per-doc score = sequential left fold of element_at(weights,
         b+1) over the doc's buckets — map-only, deterministic float
         order, floor-form rounded.

    100 TB: the corpus shuffles only inside the two count aggregations;
    scoring is a map-only pass with a broadcast-literal weight table.
    Docs with no tokens score 0.0 (the fold's initial value).
    """
    import math

    from .hashing import sql_hash64, sql_shingles, sql_tokens

    feats = (f"concat("
             f"transform(__t, x -> {sql_hash64('x')} % {n_buckets}), "
             f"transform({sql_shingles('__t', 2)}, "
             f"s -> {sql_hash64('s')} % {n_buckets}))")
    from ..cache import keep
    # keep(): base feeds BOTH the bucket-count collect and the scoring
    # pass — unpersisted, the md5 tokenize+shingle chain (the dominant
    # cost) would run twice per call (r5 review; knn_graph.keyed
    # precedent)
    base = keep(
        "dsir_scores.base",
        df.where(F.col(text_col).isNotNull())
        .selectExpr("*", f"{sql_tokens(f'`{text_col}`')} AS __t")
        .selectExpr(f"`{id_col}`",
                    f"coalesce({target_pred}, FALSE) AS __is_t",
                    f"{feats} AS __b"))
    cnt = (ensure_min_parallelism(base)
           .select("__is_t", F.explode("__b").alias("b"))
           .groupBy("__is_t", "b").agg(F.count(F.lit(1)).alias("c"))
           .collect())
    ct = {r["b"]: r["c"] for r in cnt if r["__is_t"]}
    cr = {r["b"]: r["c"] for r in cnt if not r["__is_t"]}
    nt, nr = sum(ct.values()), sum(cr.values())
    ab = alpha * n_buckets
    w = [math.log((ct.get(b, 0) + alpha) / (nt + ab))
         - math.log((cr.get(b, 0) + alpha) / (nr + ab))
         for b in range(n_buckets)]
    warr = "array(" + ", ".join(f"{x!r}D" for x in w) + ")"
    score = (f"aggregate(__b, 0.0D, (a, x) -> "
             f"a + element_at({warr}, cast(x + 1 AS INT)))")
    return base.selectExpr(f"`{id_col}`",
                           "cast(size(__b) AS BIGINT) AS n_feats",
                           f"floor(({score}) * 1e6 + 0.5) / 1e6"
                           " AS dsir_logratio")


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Overlapping token-window chunking — the RAG/embedding-prep
    sibling of pack_sequences (packing concatenates documents into
    fixed training rows and may split a doc mid-thought; chunking
    keeps each piece WITHIN its document with `overlap` tokens of
    context carried across boundaries, the retrieval-index layout):
    chunk i covers tokens [1 + i·stride, … + chunk_tokens) with
    stride = chunk_tokens − overlap; the last chunk may be short;
    starts run while start ≤ max(1, n − overlap), so no chunk is fully
    contained in its predecessor and a ≤chunk_tokens doc yields exactly
    one chunk. Zero-token docs drop (nothing to index — documented).

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text).

    Shape at 100 TB: map-only — tokenize, a sequence()/posexplode
    fan-out of ~n/stride rows per doc, and slice/array_join
    projections; no shuffle, no UDF, chunk row count is
    corpus_tokens/stride by construction.
    """
    if overlap >= chunk_tokens:
        raise ValueError("chunk_documents: overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_expr(F.col(text_col))
    base = (ensure_min_parallelism(df)
            .where(F.col(text_col).isNotNull())
            .select(F.col(id_col), toks.alias("__toks"))
            .where(F.size("__toks") > 0))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size("__toks") - F.lit(overlap)),
        F.lit(stride))
    ex = base.select(id_col, "__toks",
                     F.posexplode(starts).alias("chunk_idx", "__start"))
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return ex.select(id_col, F.col("chunk_idx").cast("long").alias("chunk_idx"),
                     F.size(piece).cast("long").alias("n_chunk_tokens"),
                     F.array_join(piece, " ").alias("chunk_text"))


def quality_sample(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   keep_frac: float = 0.3) -> DataFrame:
    """Quality-percentile pruning — the "keep the best X% by heuristic
    score" recipe step between rule filtering and model-based scoring
    (the data-pruning counterpart of prototypicality on the text side):
    score every doc with quality_score, compute the EXACT
    (1 − keep_frac) quantile as the threshold, and flag keep = score ≥
    threshold. Audit form: every doc reports (quality, threshold,
    keep) — apply is a `.where(keep)` away.

    Rank-free by design: a global rank/ntile would be one whole-corpus
    sort; the threshold form needs ONE scalar aggregate broadcast back
    onto the map-side scores. Exact interpolating percentile implies
    per-group collection at scale — swap `percentile_approx` at 100 TB
    exactly as agg_median documents (the threshold moves by the sketch
    error; the keep semantics are unchanged). Ties at the threshold all
    keep (≥), so the kept fraction can slightly exceed keep_frac —
    deterministic, unlike rank tie-breaking by physical order.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("quality_sample: keep_frac must be in (0, 1]")
    from .text import quality_score
    scored = (quality_score(df.where(F.col(text_col).isNotNull()),
                            text_col=text_col)
              .select(F.col(id_col), F.col("quality")))
    thr = scored.agg(
        _fr6(F.percentile("quality", F.lit(1.0 - keep_frac)))
        .alias("threshold"))
    return (scored.crossJoin(F.broadcast(thr))
            .select(id_col, "quality", "threshold",
                    (F.col("quality") >= F.col("threshold")).alias("keep")))


def ngram_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 2,
                 min_count: int = 2) -> DataFrame:
    """Corpus n-gram count table — the KenLM/contamination-list prep
    step (count word n-grams corpus-wide, keep those above a support
    floor): output (gram, n_total, n_docs) for every n-gram with
    n_total ≥ min_count. n_docs is the document frequency (distinct
    docs containing the gram — the df side of the Brown et al. 2020
    contamination lists); n_total counts every occurrence.

    Shape at 100 TB: explode → ONE gram-keyed aggregation computing
    both totals (count of occurrence rows) and df (count of distinct
    docs via a per-doc pre-dedup union trick is NOT needed — the
    two-level (gram, doc) partial agg collapses occurrences per
    partition first, then a gram-keyed final agg sums occurrences and
    counts doc rows). The min_count floor prunes the long tail BEFORE
    any downstream join/collect; no driver materialization.
    """
    sh = shingles_expr(tokens_expr(F.col(text_col)), n)
    ex = (ensure_min_parallelism(df)
          .where(F.col(text_col).isNotNull())
          .select(F.col(id_col), F.explode(sh).alias("gram")))
    per_doc = (ex.groupBy("gram", id_col)
               .agg(F.count(F.lit(1)).alias("__occ")))
    return (per_doc.groupBy("gram")
            .agg(F.sum("__occ").cast("long").alias("n_total"),
                 F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_total") >= min_count))


def _fr6(c):
    return F.floor(c * 1_000_000 + F.lit(0.5)) / F.lit(1e6)


def k_anonymity_report(df: DataFrame, qi_cols: list,
                       k: int = 5) -> DataFrame:
    """k-anonymity risk report over a quasi-identifier combination
    (Sweeney 2002) — the privacy audit a training-data release runs
    BEFORE shipping structured records: a row is at risk when its full
    QI combination is shared by fewer than `k` rows, because joining
    any external dataset on those columns re-identifies it. One row
    per GENERALIZATION CANDIDATE: the full QI set plus every
    leave-one-out subset, all computed from ONE grouping-sets pass —
    so the report doesn't just measure the risk, it ranks which single
    column to generalize/drop FIRST (the set whose rows_at_risk falls
    most), which is the actionable half of the audit.

    Output per set: (level, dropped, n_groups, n_violating,
    rows_at_risk, total_rows, risk_ppm) — `dropped` names the
    aggregated-out column ('(none)' = the full QI set), `level` is the
    GROUPING_ID bitmask, counts are exact integers and risk_ppm an
    integer floor division (no rounding contract).

    Scale shape: one Expand × (|QI|+1) over the input feeding a single
    map-combinable count aggregation (cells, not rows, cross the
    shuffle — the hll_cube argument applied to counting), then a
    |sets|-row fold. A genuine NULL QI value is just another cell: it
    collapses into its set's aggregate, so grouping-set NULLs never
    collide with it.
    """
    if not qi_cols:
        raise ValueError("k_anonymity_report: qi_cols must be non-empty")
    if k < 2:
        raise ValueError("k_anonymity_report: k must be >= 2")
    sets = [list(qi_cols)] + [
        [c for c in qi_cols if c != drop] for drop in qi_cols]
    level = sum((F.grouping(c).cast("long") * F.lit(1 << i)
                 for i, c in enumerate(qi_cols)), F.lit(0).cast("long"))
    cells = (df.select(*qi_cols)
             .groupingSets(sets, *qi_cols)
             .agg(F.count(F.lit(1)).alias("__n"), level.alias("level")))
    viol = F.col("__n") < F.lit(int(k))
    dropped = F.lit("(none)")
    for i, c in enumerate(qi_cols):
        dropped = F.when(F.col("level") == F.lit(1 << i),
                         F.lit(c)).otherwise(dropped)
    return (cells.groupBy("level")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum(viol.cast("long")).alias("n_violating"),
                 F.sum(F.when(viol, F.col("__n")).otherwise(F.lit(0)))
                 .alias("rows_at_risk"),
                 F.sum("__n").alias("total_rows"))
            .select("level", dropped.alias("dropped"), "n_groups",
                    "n_violating", "rows_at_risk", "total_rows",
                    F.expr("(rows_at_risk * 1000000) div total_rows")
                    .alias("risk_ppm")))


def shard_assign(df: DataFrame, id_col: str = "doc_id",
                 shards: int = 8, salt: str = "",
                 hash_fn: str = "md5") -> DataFrame:
    """Deterministic training-shard assignment + within-shard order —
    the REPRODUCIBLE global shuffle every training run needs: shard =
    hash64(salt ‖ id) mod `shards`, position = rank of the hash within
    the shard ((hash, id) tie-break). The (shard, pos) pair defines a
    total order that is a pseudo-random permutation of the corpus,
    identical across engines, partitionings and reruns — so "epoch 3,
    shard 5, position 1 204" names the SAME document forever, which is
    what makes a loss-spike reproducible and a resume-from-step exact.
    Vary `salt` per epoch for a fresh permutation with the same
    guarantee.

    Returns (id..., shard, pos): pos is 1-based within shard.

    Scale shape: the hash is map-side; the only shuffle is the
    per-shard rank window — partitioned BY SHARD, i.e. the exact sort
    a sharded training-data writer performs anyway
    (repartition(shard).sortWithinPartitions(hash) is this same plan
    with the rank materialized); each shard sorts n/shards rows, and
    `shards` is chosen to make that the writer's target file size.
    Raise `shards` with corpus size — the window is bounded by
    n/shards, not by n.
    """
    if int(shards) < 1:
        raise ValueError(f"shard_assign: shards must be >= 1, "
                         f"got {shards!r}")
    h = hash64_expr(F.concat(F.lit(salt),
                             F.col(id_col).cast("string")))
    if hash_fn == "fast":
        from .hashing import hash64_fast_expr
        h = hash64_fast_expr(F.concat(F.lit(salt),
                                      F.col(id_col).cast("string")))
    elif hash_fn != "md5":
        raise ValueError(f"shard_assign: hash_fn must be 'md5' or "
                         f"'fast', got {hash_fn!r}")
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__h").asc(), F.col(id_col).asc()))
    return (df.select(id_col)
            .where(F.col(id_col).isNotNull())
            .withColumn("__h", h)
            .withColumn("shard", F.pmod(F.col("__h"),
                                        F.lit(int(shards))))
            .withColumn("pos", F.row_number().over(w))
            .select(id_col, "shard", "pos"))


def l_diversity_report(df: DataFrame, qi_cols: list,
                       sensitive_col: str, l: int = 3) -> DataFrame:
    """l-diversity histogram over a quasi-identifier combination
    (Machanavajjhala et al. 2006, "l-diversity: privacy beyond
    k-anonymity") — the audit k-anonymity misses: a QI group can be
    large (k-anonymous) yet reveal everyone's sensitive value because
    the group is HOMOGENEOUS (all k rows share one diagnosis / one
    salary band). A group is l-diverse when its rows span ≥ l DISTINCT
    sensitive values; below that, membership alone leaks the
    attribute.

    Returns the diversity HISTOGRAM — one row per observed distinct-
    value count: (l_distinct, n_groups, n_rows, at_risk) with at_risk
    = l_distinct < `l` — so the report shows both the violation mass
    (sum of at-risk rows) and the whole distribution the threshold
    slices (is the corpus bimodal? one generalization away from
    compliant?). Exact integers end-to-end, no rounding contract.

    Scale shape: two map-combinable count aggregations — (QI,
    sensitive) cells, then per-QI-group distinct counts (cells cross
    the shuffles, not rows: the k_anonymity_report argument) — and a
    |distinct l values|-row histogram fold. NULL handling: a NULL
    sensitive value is a real value (its own cell — homogeneously-NULL
    groups are exactly as leaky as any homogeneous group); NULL QI
    cells are ordinary groups, as in k_anonymity_report.
    """
    if not qi_cols:
        raise ValueError("l_diversity_report: qi_cols must be non-empty")
    if l < 2:
        raise ValueError("l_diversity_report: l must be >= 2")
    cells = (df.groupBy(*qi_cols, F.col(sensitive_col).alias("__s"))
             .agg(F.count(F.lit(1)).alias("__n")))
    groups = (cells.groupBy(*qi_cols)
              .agg(F.count(F.lit(1)).cast("long").alias("l_distinct"),
                   F.sum("__n").cast("long").alias("__rows")))
    return (groups.groupBy("l_distinct")
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum("__rows").cast("long").alias("n_rows"))
            .select("l_distinct", "n_groups", "n_rows",
                    (F.col("l_distinct") < F.lit(int(l)))
                    .alias("at_risk")))


def t_closeness_report(df: DataFrame, qi_cols: list,
                       sensitive_col: str,
                       t_ppm_threshold: int = 200_000) -> DataFrame:
    """t-closeness audit over an ORDERED sensitive attribute (Li, Li &
    Venkatasubramanian 2007, "t-closeness: privacy beyond k-anonymity
    and l-diversity") — the third rung of the privacy ladder gated
    here (priv_k_anonymity: group too small; priv_l_diversity: group
    too uniform; this: group's sensitive DISTRIBUTION too far from
    the corpus-wide one — a group can be large AND diverse yet still
    leak, e.g. "engineers in this zip all sit in the top salary
    decile"). Distance is the Earth-Mover's Distance for ordered
    categories: EMD(p, q) = (1/(B−1))·Σ_j |P_j − Q_j| over cumulative
    distributions — computed EXACTLY in integers by cross-multiplying
    the cumulative counts (|cumg_j·N − cumG_j·n_g| — no fractions
    until the one reported floor division to ppm), so both engines
    agree bit-for-bit.

    Returns one row per QI group: (qi..., n_rows, t_ppm, at_risk)
    with t_ppm = EMD·10⁶ floored and at_risk = t_ppm >
    `t_ppm_threshold` (the conventional t = 0.2 default).

    Overflow headroom: the guards protect the ACTUAL products (the
    r10 review lesson — a corpus-size proxy bound let the real terms
    wrap below it): n_g·N ≤ 2⁶², emd_num ≤ 2⁶²/10⁶ and
    n_g·N·(B−1) ≤ 2⁶² each raise loudly against their own operands
    (the pettitt/ams convention; the documented swap is DECIMAL(38,0)
    numerators ↔ DuckDB HUGEINT). NULL sensitive values are EXCLUDED
    (no natural position in the ORDERED-category EMD — deliberately
    the opposite of l_diversity_report, where NULL is a real value;
    the oracle mirrors the exclusion).

    Scale shape: one (QI, sensitive) count shuffle + one (sensitive)
    global count (map-combinable both); the cumulative windows run
    over the group×bucket SPINE (|groups|·B rows — bounded by the
    bucket vocabulary, never the data), with the global B-row CDF
    broadcast. A single-bucket corpus (B = 1) has zero distance by
    definition and reports t_ppm = 0.
    """
    if not qi_cols:
        raise ValueError("t_closeness_report: qi_cols must be "
                         "non-empty")
    from pyspark.sql import Window
    s = F.col(sensitive_col)
    base = df.where(s.isNotNull()).select(*qi_cols, s.alias("__s"))
    cells = (base.groupBy(*qi_cols, "__s")
             .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    glob = (base.groupBy("__s")
            .agg(F.count(F.lit(1)).cast("long").alias("__gc")))
    groups = (cells.groupBy(*qi_cols)
              .agg(F.sum("__c").cast("long").alias("__ng")))
    # group x bucket spine so missing buckets contribute zero counts
    spine = groups.crossJoin(F.broadcast(glob.select("__s")))
    full = (spine.join(cells, [*qi_cols, "__s"], "left")
            .select(*qi_cols, "__s", "__ng",
                    F.coalesce("__c", F.lit(0)).cast("long")
                    .alias("__c")))
    wg = Window.partitionBy(*qi_cols).orderBy("__s")
    wgl = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    gcum = glob.select(
        "__s", F.sum("__gc").over(wgl).alias("__cum_glob"),
        F.sum("__gc").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__N"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__B"))
    # overflow guards protect the ACTUAL products, not a proxy bound
    # (r10 review finding: an N-only guard let __emd_num*1e6 and the
    # n_g*N term wrap far below it): terms need n_g*N <= 2^62, the ppm
    # scaling needs emd_num <= 2^62/10^6, the denominator needs
    # n_g*N*(B-1) <= 2^62 — each checked against its own operands
    _max62 = 1 << 62
    guarded_ng = (F.when(F.col("__ng") > F.expr(f"{_max62}L div __N"),
                         F.raise_error(F.lit(
                             "t_closeness_report: n_group * N exceeds "
                             "2^62 — the cross-multiplied cumulative "
                             "terms leave int64; switch the numerators "
                             "to DECIMAL(38,0) (see docstring)"))
                         .cast("long"))
                  .otherwise(F.col("__ng")))
    terms = (full.join(F.broadcast(gcum), "__s")
             .withColumn("__cum_grp", F.sum("__c").over(wg))
             .withColumn("__term",
                         F.abs(F.col("__cum_grp") * F.col("__N")
                               - F.col("__cum_glob") * guarded_ng)))
    emd_ok = (F.when((F.col("__emd_num") > F.lit(_max62 // 1_000_000))
                     | (F.col("n_rows")
                        > F.expr(f"(({_max62}L div __N) div "
                                 f"greatest(1L, __B - 1))")),
                     F.raise_error(F.lit(
                         "t_closeness_report: ppm scaling leaves int64 "
                         "— switch to DECIMAL(38,0) (see docstring)"))
                     .cast("long"))
              .otherwise(F.col("__emd_num")))
    return (terms.groupBy(*qi_cols)
            .agg(F.min("__ng").alias("n_rows"),
                 F.sum("__term").cast("long").alias("__emd_num"),
                 F.min("__N").alias("__N"), F.min("__B").alias("__B"))
            .withColumn("__emd_num", emd_ok)
            .select(*qi_cols, "n_rows",
                    F.when(F.col("__B") <= 1, F.lit(0).cast("long"))
                    .otherwise(F.expr(
                        "(__emd_num * 1000000) div (n_rows * __N * "
                        "(__B - 1))")).alias("t_ppm"))
            .withColumn("at_risk",
                        F.col("t_ppm") > F.lit(int(t_ppm_threshold))))
