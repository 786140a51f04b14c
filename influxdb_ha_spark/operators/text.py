"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (codegen'd, map-only —
the ideal 100 TB shape: no shuffle at all until an aggregation is asked for).

Deterministic + SQL-mirrorable; stopword tables are module constants shared
with the DuckDB oracle builder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import tokens_expr
from .util import ensure_min_parallelism

# Tiny per-language stopword tables for the n-gram/stopword-hit heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "dans", "que"],
}

LANGS = sorted(STOPWORDS)  # deterministic tie-break order


def _hits(tokens: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(lit_arr, x)))


def token_count(df: DataFrame, text_col: str = "text",
                out: str = "n_tokens") -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (≈ chars/4 bounded below by word count — the common LLM heuristic)."""
    df = ensure_min_parallelism(df)
    toks = tokens_expr(F.col(text_col))
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    bpe_est = F.greatest(n_words, F.ceil(n_chars / F.lit(4)).cast("int"))
    return df.withColumn(out, n_words).withColumn("n_tokens_bpe_est", bpe_est)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / word-shape statistics."""
    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    mean_wl = F.when(n_words > 0,
                     F.aggregate(toks, F.lit(0),
                                 lambda acc, x: acc + F.length(x))
                     .cast("double") / n_words).otherwise(F.lit(0.0))
    return (df.withColumn("n_chars_c", n_chars)
            .withColumn("n_words", n_words)
            .withColumn("punct_ratio",
                        F.round(F.when(n_chars > 0, n_punct / n_chars.cast("double"))
                                .otherwise(F.lit(0.0)), 6))
            .withColumn("mean_word_len", F.round(mean_wl, 6)))


def quality_score(df: DataFrame, text_col: str = "text",
                  out: str = "quality") -> DataFrame:
    """Heuristic document quality in [0,1]: rewards stopword presence and
    sane word lengths, penalizes punctuation soup and trivial length.
    (The classic cheap pre-filter before expensive model-based scoring.)"""
    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    sw = _hits(toks, STOPWORDS["en"])
    sw_ratio = F.when(n_words > 0, sw / n_words.cast("double")).otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(F.lit(0.0))
    mean_wl = F.when(n_words > 0,
                     F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
                     .cast("double") / n_words).otherwise(F.lit(0.0))
    len_term = F.least(n_words.cast("double") / F.lit(20.0), F.lit(1.0))
    sw_term = F.least(sw_ratio * F.lit(3.0), F.lit(1.0))
    wl_term = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * F.lit(4.0))
    score = F.round((len_term + sw_term + wl_term + punct_term) / F.lit(4.0), 6)
    return df.withColumn(out, score)


def language_id(df: DataFrame, text_col: str = "text",
                out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID across the STOPWORDS tables; deterministic
    alphabetical tie-break; 'und' (undetermined) when nothing hits."""
    df = ensure_min_parallelism(df)
    toks = tokens_expr(F.col(text_col))
    scored = F.array(*[
        F.struct(_hits(toks, STOPWORDS[lang]).alias("hits"),
                 F.lit(lang).alias("lang"))
        for lang in LANGS])
    # array_max on struct orders by first field (hits), ties by lang desc —
    # invert lang for asc tie-break determinism
    best = F.array_max(F.transform(
        scored, lambda s: F.struct(
            s["hits"].alias("hits"),
            # negative alphabetical: later langs lose ties
            F.lit(0) - F.array_position(
                F.array(*[F.lit(x) for x in LANGS]), s["lang"]).alias("neg"),
            s["lang"].alias("lang"))))
    return df.withColumn(
        out, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals over word k-grams:
    duplicate-gram fraction (1 - distinct/total) and the coverage of the
    single most frequent gram. High values flag boilerplate / spam docs.

    Shape: explode k-grams → count per (doc, gram) → collapse per doc.
    Both aggregations key on the doc id (never the gram alone), so the
    shuffle is uniform even when one gram dominates the corpus. Docs with
    fewer than k tokens have no grams and drop out (both engines agree).
    """
    from .hashing import shingles_expr

    sh = shingles_expr(tokens_expr(F.col(text_col)), k)
    ex = (ensure_min_parallelism(df)
          .select(F.col(id_col), F.explode(sh).alias("__g")))
    cnt = ex.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__n"))
    tot = F.sum("__n").cast("double")
    return (cnt.groupBy(id_col)
            .agg(F.sum("__n").alias("n_grams"),
                 F.count(F.lit(1)).alias("n_distinct_grams"),
                 (F.lit(1.0) - F.count(F.lit(1)) / tot)
                 .alias("dup_gram_frac"),
                 (F.max("__n") / tot).alias("top_gram_frac")))


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_words: int = 10, max_words: int = 100_000) -> DataFrame:
    """C4/Gopher-style rule-based keep/drop flags (the cheap deterministic
    pre-filter ahead of model scoring): word-count bounds, sane mean word
    length (3–10), stopword evidence (≥2 hits), punctuation ratio ≤ 0.1.
    Pure column expressions — map-only, zero shuffle."""
    d = ensure_min_parallelism(df)
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    mean_wl = F.when(n_words > 0,
                     F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
                     .cast("double") / n_words).otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")) \
        .otherwise(F.lit(0.0))
    ok_len = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    ok_stop = _hits(toks, STOPWORDS["en"]) >= 2
    ok_punct = punct_ratio <= 0.1
    return (d.withColumn("ok_len", ok_len)
            .withColumn("ok_mean_word_len", ok_mwl)
            .withColumn("ok_stopwords", ok_stop)
            .withColumn("ok_punct", ok_punct)
            .withColumn("keep", ok_len & ok_mwl & ok_stop & ok_punct))


def lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             vocab_size: int = 4096) -> DataFrame:
    """CCNet-style unigram language-model quality score: mean log-prob of
    each doc's tokens under the corpus's own top-`vocab_size` unigram
    distribution, plus the out-of-vocabulary fraction. Low scores flag
    gibberish; high OOV flags vocabulary mismatch — the cheap proxy for
    the perplexity filter pretraining pipelines run before model scoring.

    Two phases: (1) ONE token-keyed aggregation builds the vocabulary
    (map-side partial counts absorb the Zipf skew of common words before
    the exchange) and `vocab_size` (token, log p) pairs — bounded — come
    to the driver, the same O(k) collect convention as k-means centroids;
    (2) scoring is a map-only fold over each doc's token array with the
    vocabulary inlined as a literal map — no join, no shuffle, fold order
    = token order (deterministic). OOV tokens get the standard
    0.5/total floor.
    """
    import math

    toks_of = tokens_expr(F.col(text_col))
    ex = (ensure_min_parallelism(df)
          .select(F.explode(toks_of).alias("__t")))
    counts = ex.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c")).collect()[0][0] or 1
    top = (counts.orderBy(F.col("__c").desc(), F.col("__t").asc())
           .limit(vocab_size).collect())
    floor_lp = math.log(0.5 / total)
    vocab = F.map_from_arrays(
        F.array(*[F.lit(r["__t"]) for r in top]),
        F.array(*[F.lit(math.log(r["__c"] / total)) for r in top]))
    toks = toks_of
    n = F.size(toks)
    lps = F.transform(toks, lambda t: F.coalesce(
        vocab[t], F.lit(floor_lp)))
    score = F.when(n > 0, F.aggregate(
        lps, F.lit(0.0), lambda a, x: a + x) / n)
    n_oov = F.size(F.filter(toks, lambda t: vocab[t].isNull()))
    oov = F.when(n > 0, n_oov / n.cast("double")).otherwise(F.lit(0.0))
    return df.select(F.col(id_col), n.cast("long").alias("n_tokens"),
                     score.alias("lm_score"), oov.alias("oov_frac"))


def fingerprint(df: DataFrame, text_col: str = "text",
                out: str = "fingerprint") -> DataFrame:
    """Canonical content fingerprint: md5 of the sorted distinct token set."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(
        F.array_distinct(tokens_expr(F.col(text_col))))))
    return ensure_min_parallelism(df).withColumn(out, fp)


def rolling_fingerprints(df: DataFrame, w: int = 8, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Rabin–Karp-style rolling window fingerprints over the token stream.

    Each position i of a document yields hash(tokens[i:i+w]) =
    Σ h(tok_j)·B^(w-1-(j-i)) mod p — the winnowing/plagiarism-detection
    shape (added scope: document fingerprinting via rolling hash). Fully
    columnar: per-token hashes computed once, windows as slice+aggregate
    over the array; one output row per (doc, window position).
    """
    from .hashing import MERSENNE_P, hash64_expr, tokens_expr

    B = 1_000_003  # polynomial base, coprime with p
    p = F.lit(MERSENNE_P)
    toks = tokens_expr(F.col(text_col))
    hashes = F.transform(toks, lambda t: hash64_expr(t) % p)
    d = (ensure_min_parallelism(df)
         .select(F.col(id_col), hashes.alias("__h"))
         .where(F.size("__h") >= w))
    idx = F.sequence(F.lit(1), F.size("__h") - (w - 1))
    win = F.transform(idx, lambda i: F.aggregate(
        F.slice("__h", i, w), F.lit(0).cast("long"),
        lambda acc, h: (acc * B + h) % p))
    return (d.select(id_col, F.posexplode(win).alias("pos", "whash"))
            .select(id_col, (F.col("pos") + 1).alias("pos"), "whash"))


def winnowing_fingerprints(df: DataFrame, k: int = 8, s: int = 4,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003 — the MOSS local-fingerprinting algorithm) over the Rabin–Karp
    window hashes of `rolling_fingerprints`: slide a selection window
    of `s` consecutive k-gram hashes and keep, per window, the RIGHTMOST
    minimal hash; dedup the selections. GUARANTEE (the paper's Thm 1
    direction): any token-level match of length ≥ s + k − 1 shares at
    least one selected fingerprint, at expected density 2/(s+1) — the
    storage knob plain rolling hashing lacks (it emits EVERY position).

    Rightmost-minimal tie-break is pinned cross-engine by taking min
    over struct(whash, −pos): smallest hash first, then smallest −pos
    = LARGEST position — both engines compare structs field-by-field,
    so ties resolve identically (no engine-dependent argmin).

    Shape at 100 TB: the hash stage is map-only (rolling_fingerprints);
    selection is ONE doc-keyed running-min window (high-cardinality
    partition key, bounded s-row frame — no funnel); the dedup
    shuffles only the ~2/(s+1)-density fingerprint rows, never the
    corpus. Integer-exact throughout — nothing to round.
    """
    if s < 1:
        raise ValueError("winnowing_fingerprints: selection window s "
                         "must be >= 1")
    from pyspark.sql import Window

    r = rolling_fingerprints(df, w=k, text_col=text_col, id_col=id_col)
    wnd = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(Window.currentRow, s - 1))
    m = F.min(F.struct(F.col("whash").alias("h"),
                       (-F.col("pos")).alias("np"))).over(wnd)
    c = F.count(F.lit(1)).over(wnd)
    return (r.select(id_col, m.alias("__m"), c.alias("__c"))
            .where(F.col("__c") == s)
            .select(id_col, (-F.col("__m.np")).alias("pos"),
                    F.col("__m.h").alias("fp"))
            .distinct())


def bm25_topk(df: DataFrame, query: str, k: int = 10, k1: float = 1.2,
              b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k document retrieval (Robertson & Zaragoza 2009, using
    Lucene's non-negative idf = ln((N - df + 0.5)/(df + 0.5) + 1)) — the
    lexical-search counterpart to the embedding ANN family.

    Two phases, corpus never shuffles:
    (1) ONE global aggregation computes N, Σdl and per-query-term
        document frequencies (a sum of array_contains flags per term —
        map-side partials, the exchange carries |q|+2 scalars); the
        bounded |q|-row result collects driver-side (the k-means /
        lm_score O(k) convention) and idf values inline as literals.
    (2) Scoring is a MAP-ONLY projection — per-term tf via a codegen'd
        array filter, the BM25 sum written as an explicit left-assoc
        chain in sorted-term order so a SQL oracle replays the float
        arithmetic bit-for-bit — followed by a global top-k, which
        Spark executes as TakeOrderedAndProject (per-partition heaps +
        driver merge), never a full sort.
    Docs matching no query term (score 0) are excluded, standard IR
    semantics.
    """
    import math
    import re

    qterms = sorted({t for t in re.sub(r"[^a-z0-9]+", " ", query.lower())
                     .split() if t})
    if not qterms:
        raise ValueError("bm25_topk: query has no tokens")
    base = (ensure_min_parallelism(df)
            .select(F.col(id_col), tokens_expr(F.col(text_col))
                    .alias("__toks"))
            .withColumn("__dl", F.size("__toks")))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("sdl"),
        *[F.sum(F.array_contains("__toks", t).cast("long")).alias(f"df{i}")
          for i, t in enumerate(qterms)]).collect()[0]
    n_docs = stats["n"] or 1
    avgdl = (stats["sdl"] or 0) / n_docs
    idf = [math.log((n_docs - stats[f"df{i}"] + 0.5)
                    / (stats[f"df{i}"] + 0.5) + 1.0)
           for i in range(len(qterms))]
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))

    def _tf(term: str) -> Column:
        # NB: a 2-arg lambda here would be read by F.filter as
        # (element, index) — close over the term with a def instead
        return F.size(F.filter("__toks", lambda x: x == F.lit(term))) \
            .cast("double")

    score = F.lit(0.0)
    for i, t in enumerate(qterms):
        tf = _tf(t)
        score = score + F.lit(idf[i]) * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    out = (base.select(F.col(id_col), F.round(score, 6).alias("score"))
           .where(F.col("score") > 0)
           .orderBy(F.col("score").desc(), F.col(id_col).asc())
           .limit(k))
    return out


def tf_vectors(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", n_buckets: int = 64) -> DataFrame:
    """Hashed term-frequency document vectors (the `HashingTF` /
    feature-hashing construction, Weinberger et al. 2009): token →
    md5-64 bucket, vector slot = exact bucket count. MAP-ONLY — one
    codegen'd projection, no vocabulary pass, no shuffle; the fixed
    n_buckets dimensionality is what makes the vector layout identical
    on every executor with zero coordination, which is the whole point
    of feature hashing at 100 TB. Counts are integers, so the vectors
    are exactly representable doubles — cosine over them hits the same
    bits on any engine that folds left (the oracle's list_reduce)."""
    from .hashing import sql_hash64, sql_tokens
    h = (f"transform({sql_tokens(f'`{text_col}`')}, "
         f"t -> {sql_hash64('t')} % {n_buckets})")
    tf = (f"transform(sequence(0, {n_buckets - 1}), "
          f"i -> cast(size(filter(__h, x -> x = i)) as double))")
    return (df.where(F.col(text_col).isNotNull())
            .selectExpr(f"`{id_col}`", f"{h} AS __h")
            .selectExpr(f"`{id_col}`", f"{tf} AS tf",
                        "cast(size(__h) AS BIGINT) AS n_tokens"))


def cluster_assign(df: DataFrame, k: int = 8, text_col: str = "text",
                   id_col: str = "doc_id", n_buckets: int = 64) -> DataFrame:
    """Text-domain clustering: nearest-centroid assignment of hashed-TF
    document vectors — the cluster-then-sample domain-discovery step of
    corpus pipelines (the text-side sibling of emb_semantic_dedup's
    assignment stage).

    Centroids here are the k LOWEST-id documents' TF vectors (fixed
    deterministic seeds, so the driver contract is replayable and the
    oracle can rebuild assignment from raw text; orderBy(id).limit(k),
    NOT `id < k` — sparse or non-zero-based ids would silently yield
    fewer seeds, r5 advice); production swaps in kmeans_centroids-
    trained centroids — assign_centroids accepts any centroid frame.
    Fewer than k documents is a loud ValueError, never a quiet
    smaller clustering.

    Shape at scale: TF construction and assignment are BOTH map-only
    (the k×n_buckets centroid literals inline, the assign_centroids
    convention), so the whole operator is one projection over the
    corpus: zero shuffles, zero joins.

    NOTE: calling this function EXECUTES a Spark job eagerly (the
    seed-count validation below runs `cent.count()` at plan-construction
    time, the cap-collect convention) — it is not lazily composable the
    way pure-projection operators are.
    """
    from .similarity import assign_centroids
    tf = tf_vectors(df, text_col=text_col, id_col=id_col,
                    n_buckets=n_buckets).withColumnRenamed("tf", "embedding")
    cent = (tf.orderBy(id_col).limit(k)
            .select(F.col(id_col).alias("centroid_id"), "embedding"))
    n_cent = cent.count()
    if n_cent != k:
        raise ValueError(
            f"cluster_assign: corpus has only {n_cent} documents with "
            f"non-null text for k={k} seed centroids — lower k or use "
            f"kmeans_centroids-trained centroids")
    out = assign_centroids(tf, cent, id_col=id_col, vec_col="embedding")
    return out.select(id_col, "n_tokens", "centroid_id")


def token_entropy(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document token Shannon entropy + normalized entropy — the
    gibberish/boilerplate quality signal (low entropy = repeated
    boilerplate, maximal = no token repeated):

        H = ln(n) - (1/n) * sum_c  c * ln(c)     (c = per-token counts)
        H_norm = H / ln(n_distinct)              (0 when n_distinct = 1)

    Engine-portable WITHOUT a Python hot path: the only transcendental
    is ln over INTEGER arguments, so a log table ln(1..K) is computed
    once driver-side with math.log (libm — bit-identical to DuckDB's ln,
    while JVM Math.log is intrinsified and can drift an ulp: the DSIR /
    lm_score convention) and inlined as a literal array; K comes from
    one max-doc-length scalar aggregation (the BM25 stats precedent).
    Scoring is then a MAP-ONLY codegen'd projection: per-token counts
    via nested array filters over the lexicographically sorted distinct
    tokens (deterministic fold order both engines), each term an exact
    integer-indexed table lookup. Zero shuffle beyond the 1-scalar agg.
    """
    import math

    from .hashing import sql_tokens
    from .util import ensure_min_parallelism

    base = (df.where(F.col(text_col).isNotNull())
            .selectExpr("*", f"{sql_tokens(f'`{text_col}`')} AS __t"))
    mx = base.select(F.max(F.size("__t"))).first()[0] or 1
    if mx > 65_536:
        raise ValueError(f"token_entropy: max doc length {mx} exceeds the "
                         "literal log-table cap (65536); pre-truncate or "
                         "chunk documents first")
    tab = "array(" + ", ".join(f"{math.log(i)!r}D"
                               for i in range(1, mx + 1)) + ")"
    cnts = ("transform(array_sort(array_distinct(__t)), "
            "x -> size(filter(__t, y -> y = x)))")
    ssum = (f"aggregate(__c, 0.0D, (a, c) -> "
            f"a + cast(c AS DOUBLE) * element_at({tab}, c))")
    # the two scalar lookups (ln n, ln n_distinct) share ONE more tab
    # occurrence via a 2-element transform — the literal appears twice
    # total, not four times (at the 65536-term cap each copy is ~1.3 MB
    # of SQL to parse/codegen; r5 review)
    ln2 = (f"transform(array(cast(size(__t) AS INT), "
           f"cast(size(__c) AS INT)), "
           f"i -> element_at({tab}, greatest(i, 1)))")
    return (ensure_min_parallelism(base)
            .selectExpr(f"`{id_col}`", "__t", f"{cnts} AS __c")
            .selectExpr(f"`{id_col}`", "__t", "__c", f"{ln2} AS __ln2")
            .selectExpr(
                f"`{id_col}`",
                "cast(size(__t) AS BIGINT) AS n_tokens",
                "cast(size(__c) AS BIGINT) AS n_distinct",
                "element_at(__ln2, 2) AS __lnd",
                f"CASE WHEN size(__t) = 0 THEN 0.0D ELSE "
                f"element_at(__ln2, 1) "
                f"- ({ssum}) / cast(size(__t) AS DOUBLE) END AS __h")
            .selectExpr(
                f"`{id_col}`", "n_tokens", "n_distinct",
                "floor(__h * 1e6 + 0.5) / 1e6 AS entropy",
                "CASE WHEN n_distinct <= 1 THEN 0.0D ELSE "
                "floor(__h / __lnd * 1e6 + 0.5) / 1e6 END"
                " AS entropy_norm"))


def _bpe_merge_exprs(a: str, b: str):
    """Spark SQL expressions applying ONE BPE merge (a, b) -> a||b to a
    `syms` array column, left-to-right non-overlapping (the Sennrich
    greedy order), as pure array algebra — no UDF, no explode:

    occurrence indices -> run keys (x - i is constant within a run of
    consecutive overlapping occurrences, which only arise when a = b)
    -> keep every other occurrence within its run -> rebuild, replacing
    chosen positions with the merged symbol and dropping their second
    halves. The DuckDB oracle replays the identical algebra (1-based
    lambda indices there; the run-parity arithmetic is index-base
    invariant)."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    # CASE guard: Spark's sequence(1, 0) steps BACKWARD ([1, 0]), so a
    # 1-symbol word would probe index 0 and error
    occ = (f"CASE WHEN size(syms) < 2 THEN array() ELSE "
           f"filter(sequence(1, size(syms) - 1), "
           f"i -> element_at(syms, i) = '{qa}' "
           f"AND element_at(syms, i + 1) = '{qb}') END")
    rs = "transform(__occ, (x, i) -> x - i)"
    ch = ("filter(__occ, (x, i) -> "
          "((i + 1) - array_position(__rs, x - i)) % 2 = 0)")
    ns = (f"filter(transform(sequence(1, size(syms)), p -> "
          f"CASE WHEN array_contains(__ch, p) THEN '{qa}{qb}' "
          f"WHEN array_contains(__ch, p - 1) THEN NULL "
          f"ELSE element_at(syms, p) END), x -> x IS NOT NULL)")
    return occ, rs, ch, ns


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text",
              end_mark: str = "</w>", return_vocab: bool = False):
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909 — the byte-pair-encoding merge learner behind every
    GPT/Llama-family tokenizer). Returns the learned merge table
    (rank, left, right, pair_count), deterministic via the
    (count DESC, left ASC, right ASC) tie-break.

    The textbook-correct distributed shape: the CORPUS is touched
    exactly once — one word-count aggregation — and every merge
    iteration runs over the vocabulary-sized (word, count, syms) table,
    exactly how reference BPE trainers operate on word frequencies.
    Per iteration: adjacent-pair counts (explode + weighted sum, one
    small shuffle), a 1-row argmax collect, and a MAP-ONLY merge apply
    written as pure array algebra (_bpe_merge_exprs — no UDF), so both
    engines replay identical merges and the ORACLE IS EXACT: an
    unrolled n-stage DuckDB replay hash-matches the full merge table,
    unlike the structural gates iterative trainers usually get.
    At 100 TB practice trains on a corpus sample; the one-pass
    word-count front end is the same either way.
    """
    from .hashing import sql_tokens

    spark = df.sparkSession
    words = (df.where(F.col(text_col).isNotNull())
             .selectExpr(f"explode({sql_tokens(f'`{text_col}`')}) AS w")
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    cur = words.selectExpr(
        "w", "cnt",
        f"concat(transform(sequence(1, length(w)), "
        f"i -> substring(w, i, 1)), array('{end_mark}')) AS syms")
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (cur.where(F.size("syms") >= 2)
                 .selectExpr("cnt",
                             "explode(zip_with(slice(syms, 1, size(syms) - 1), "
                             "slice(syms, 2, size(syms) - 1), "
                             "(x, y) -> struct(x AS a, y AS b))) AS p")
                 .groupBy("p.a", "p.b").agg(F.sum("cnt").alias("c"))
                 .orderBy(F.col("c").desc(), F.col("a").asc(),
                          F.col("b").asc())
                 .limit(1).collect())
        if not pairs:
            break
        top = pairs[0]
        merges.append((rank, top["a"], top["b"], int(top["c"])))
        occ, rs, ch, ns = _bpe_merge_exprs(top["a"], top["b"])
        cur = (cur.selectExpr("w", "cnt", "syms", f"{occ} AS __occ")
               .selectExpr("w", "cnt", "syms", "__occ", f"{rs} AS __rs")
               .selectExpr("w", "cnt", "syms", "__occ", "__rs",
                           f"{ch} AS __ch")
               .selectExpr("w", "cnt", f"{ns} AS syms"))
        # materialize each generation: the next pair count would otherwise
        # re-derive the whole merge chain from raw words every iteration
        # (lineage grows quadratically); the word table is vocab-sized
        cur = cur.localCheckpoint(eager=True)
    mdf = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint")
    if return_vocab:
        # the trained word table doubles as the ENCODER: distinct word ->
        # its BPE segmentation length (vocab-sized — the apply path joins
        # against this instead of re-merging per corpus row)
        return mdf, cur.selectExpr("w", "cast(size(syms) AS BIGINT)"
                                   " AS n_tokens")
    return mdf


def bpe_encode_counts(df: DataFrame, vocab: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Apply a trained BPE segmentation to the corpus and report per-doc
    token statistics (the encode half of the tokenizer lifecycle —
    exactly the 'how many tokens is my corpus' pass every training-data
    budget starts with).

    The merge chain is NOT re-run per document: each doc's words join
    the vocabulary-sized `vocab` table (word -> BPE segment count, the
    trained word table from bpe_train(return_vocab=True)) and per-doc
    totals are one sum. Words unseen at train time fall back to their
    character count + 1 (the unmerged char segmentation — BPE's
    baseline for novel words). Shape: explode (map-side) -> one
    word-keyed join -> one doc-keyed sum; the join side is vocab-sized,
    so Spark/AQE broadcasts it when it fits.
    """
    from .hashing import sql_tokens
    ex = (df.where(F.col(text_col).isNotNull())
          .selectExpr(f"`{id_col}`",
                      f"explode({sql_tokens(f'`{text_col}`')}) AS w"))
    j = ex.join(vocab, "w", "left")
    n = F.coalesce(F.col("n_tokens"), F.length("w").cast("bigint") + 1)
    return (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(n).alias("n_bpe_tokens")))


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease + Flesch–Kincaid grade per document (Flesch
    1948 / Kincaid et al. 1975 — the classic rule-based readability
    band, still the cheap pre-filter complexity signal in LLM-corpus
    quality pipelines alongside quality_score):

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
        grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59

    with W = token count, S = sentence count (runs of [.!?], floor 1),
    Syl = per-token syllable estimate max(1, #[aeiouy]+ vowel groups) —
    the standard heuristic syllabifier; all three are EXACT integers,
    so the scores are one fixed 3-term float expression over exact
    operands, floor-rounded at 6 (cross-engine bit-stable like
    quality_score). Zero-word docs report NULL scores (unknown, not
    fake-easy). Map-only: one projection, no shuffle, no UDF.
    """
    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    toks = tokens_expr(t)
    n_words = F.size(toks).cast("long")
    n_sent = F.greatest(F.lit(1).cast("long"),
                        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"))
    syl = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda a, x: a + F.greatest(
            F.lit(1).cast("long"),
            F.regexp_count(x, F.lit(r"[aeiouy]+")).cast("long")))
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = syl.cast("double") / n_words.cast("double")
    six = F.lit(1_000_000)
    ease = (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
    grade = (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
    r6 = lambda c: F.floor(c * six + F.lit(0.5)) / six.cast("double")  # noqa: E731
    return (df.where(t.isNotNull())
            .select(F.col(id_col), n_words.alias("n_words"),
                    n_sent.alias("n_sentences"), syl.alias("n_syllables"),
                    F.when(n_words > 0, r6(ease)).alias("flesch"),
                    F.when(n_words > 0, r6(grade)).alias("fk_grade")))


def remove_boilerplate(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_df: int = 2) -> DataFrame:
    """Corpus-frequency sentence filtering — the C4 boilerplate-removal
    step (Raffel et al. 2020 arXiv:1910.10683 §2.2 removed any
    three-sentence span occurring more than once in the corpus; this is
    the sentence-granularity form): a sentence appearing in more than
    `max_df` documents corpus-wide (cookie banners, nav chrome, legal
    footers) is dropped from EVERY document; the survivors reassemble
    in original order. Output: (id, n_sentences, n_kept, clean_text)
    for every doc with text — empty docs report 0/0/'' (never vanish).

    Sentences split on `[.!?]+\\s+` runs (both engines' regex dialects
    agree — no lookbehind, which RE2 lacks); the trailing punctuation
    is not preserved in `clean_text` (dedup semantics, not rendering).
    Frequency keys on the lower/trimmed/whitespace-folded sentence
    (runs of whitespace compare equal — chrome renders don't agree on
    spacing); df counts DISTINCT docs (a sentence repeated within one
    doc is not boilerplate).

    Shape at 100 TB: the corpus is exploded once for the frequency
    build and once for the apply (the minimum for a corpus-frequency
    op) — the flagged set is pruned to count > max_df BEFORE the join
    back, so the apply side streams against the boilerplate SLIVER
    (AQE broadcasts it when small, falls back honestly) and the full
    frequency table never re-joins; ONE doc-keyed fold then carries
    the total count, kept count, and ordered reassembly together
    (arrays bounded by document length).
    """
    t = F.col(text_col)
    base = (ensure_min_parallelism(df)
            .where(t.isNotNull())
            .select(F.col(id_col),
                    F.split(t, r"[.!?]+\s+").alias("__ss")))
    ex = (base.select(id_col, F.posexplode("__ss")
                      .alias("__idx", "__s"))
          .withColumn("__k", F.regexp_replace(
              F.lower(F.trim(F.col("__s"))), r"\s+", " "))
          .where(F.length("__k") > 0))
    flagged = (ex.select("__k", id_col).distinct()
               .groupBy("__k").agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") > max_df)
               .select("__k").withColumn("__flag", F.lit(1)))
    # ONE apply pass (r7 review: the first cut re-derived the exploded
    # table in three branches): mark flagged sentences with a broadcast-
    # friendly sliver left join, then a single per-doc fold carries
    # total count, kept count, and the ordered reassembly together
    marked = ex.join(flagged, "__k", "left")
    agg = (marked.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_sentences"),
                F.sum(F.when(F.col("__flag").isNull(), 1).otherwise(0))
                .alias("n_kept"),
                F.concat_ws(" ", F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct(
                            F.col("__idx").alias("i"),
                            F.trim(F.col("__s")).alias("s"),
                            F.coalesce(F.col("__flag"), F.lit(0))
                            .alias("f")))),
                        lambda x: x["f"] == 0),
                    lambda x: x["s"])).alias("clean_text")))
    docs = base.select(id_col)
    return (docs.join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_sentences", F.lit(0)).cast("long")
                    .alias("n_sentences"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))


def line_filter(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_words: int = 3,
                require_terminal_punct: bool = False) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 arXiv:1910.10683
    §2.2 — the rules applied to each LINE before any document-level
    filtering): a line survives iff it has at least `min_words` words,
    contains no curly brace (code/template leakage), does not contain
    the phrase "lorem ipsum", and — when `require_terminal_punct`,
    the paper's strictest rule — ends with terminal punctuation.
    Survivors reassemble in order; output is
    (id, n_lines, n_kept, clean_text) for every doc with text (empty
    docs report 0/0/'' — never vanish).

    Unlike remove_boilerplate (corpus-frequency, needs a shuffle),
    every rule here is per-line local: the WHOLE operator is map-only
    — split, per-element filter, array_join — zero shuffle, zero UDF,
    the ideal 100 TB shape.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    def keeps(x):
        k = (F.size(F.split(F.trim(x), r"\s+")) >= min_words) \
            & (~x.contains("{")) & (~x.contains("}")) \
            & (~F.lower(x).contains("lorem ipsum"))
        if require_terminal_punct:
            k = k & F.trim(x).rlike(r"[.!?\"']$")
        return k
    nonempty = F.filter(lines, lambda x: F.length(F.trim(x)) > 0)
    kept = F.filter(nonempty, keeps)
    return (ensure_min_parallelism(df)
            .where(t.isNotNull())
            .select(F.col(id_col),
                    F.size(nonempty).cast("long").alias("n_lines"),
                    F.size(kept).cast("long").alias("n_kept"),
                    F.array_join(F.transform(kept, F.trim), " ")
                    .alias("clean_text")))


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_count: int = 5) -> DataFrame:
    """Corpus bigram collocations by pointwise mutual information
    (Church & Hanks 1990) — the phrase-discovery / tokenizer-merge-
    candidate signal of corpus preprocessing:

        PMI(x, y) = ln( P(xy) / (P(x) P(y)) )
                  = ln c_xy + 2 ln T - ln B - ln c_x - ln c_y

    with c_xy bigram occurrences, c_* unigram occurrences, T total
    tokens, B total bigrams; a `min_count` support floor drops the
    unstable tail (hapax pairs have maximal PMI by artifact).

    Engine parity: every ln argument is an exact INTEGER count, and the
    ln values are computed driver-side with math.log (libm — identical
    to DuckDB's ln; JVM Math.log can drift an ulp — the token_entropy /
    DSIR / lm_score convention) and inlined as a SPARSE literal map
    over the distinct count values actually present (Zipf keeps that
    set tiny next to the vocab — collected once, loud cap at 65536).
    The PMI expression then folds in one pinned order both engines
    replay; floor-rounded at 6.

    Shape at 100 TB: one tokenize pass feeds both count aggs (token-
    and bigram-keyed shuffles — uniform high-cardinality keys), the
    selected bigrams join the vocab-sized unigram table twice, and the
    distinct-count collect is |distinct counts|-bounded, not
    corpus-bounded. The corpus itself never joins anything.
    """
    import math

    from .hashing import shingles_expr

    base = (ensure_min_parallelism(df)
            .where(F.col(text_col).isNotNull())
            .select(tokens_expr(F.col(text_col)).alias("__t")))
    base = base.persist()
    uni = (base.select(F.explode("__t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    uni = uni.persist()
    big = (base.select(F.explode(shingles_expr(F.col("__t"), 2))
                       .alias("g"))
           .groupBy("g").agg(F.count(F.lit(1)).alias("n_pair")))
    big = big.persist()
    tb = uni.agg(F.sum("c").alias("T")).collect()[0]
    bb = big.agg(F.sum("n_pair").alias("B")).collect()[0]
    t_total, b_total = int(tb["T"] or 0), int(bb["B"] or 0)
    sel = (big.where(F.col("n_pair") >= F.lit(int(min_count)))
           .withColumn("w1", F.substring_index("g", " ", 1))
           .withColumn("w2", F.substring_index("g", " ", -1))
           .join(uni.select(F.col("w").alias("w1"),
                            F.col("c").alias("n_w1")), "w1")
           .join(uni.select(F.col("w").alias("w2"),
                            F.col("c").alias("n_w2")), "w2"))
    from ..cache import keep
    sel = keep("text.pmi.sel", sel)
    cnt_rows = (sel.select(F.col("n_pair").alias("c"))
                .unionByName(sel.select(F.col("n_w1").alias("c")))
                .unionByName(sel.select(F.col("n_w2").alias("c")))
                .distinct().collect())
    counts = sorted(int(r["c"]) for r in cnt_rows)
    if len(counts) > 65_536:
        raise ValueError(f"pmi_collocations: {len(counts)} distinct count "
                         "values exceed the literal log-map cap (65536); "
                         "raise min_count")
    if not counts or t_total == 0 or b_total == 0:
        base.unpersist()
        uni.unpersist()
        big.unpersist()
        return sel.select(
            "w1", "w2", "n_pair", "n_w1", "n_w2",
            F.lit(0.0).alias("pmi")).where(F.lit(False))
    logmap = F.create_map(
        *[x for c in counts
          for x in (F.lit(c).cast("long"), F.lit(math.log(c)))])
    const = 2 * math.log(t_total) - math.log(b_total)
    pmi = (F.element_at(logmap, F.col("n_pair").cast("long"))
           + F.lit(const)
           - F.element_at(logmap, F.col("n_w1").cast("long"))
           - F.element_at(logmap, F.col("n_w2").cast("long")))
    out = sel.select(
        "w1", "w2", "n_pair", "n_w1", "n_w2",
        (F.floor(pmi * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("pmi"))
    # sel's cache is already populated (the distinct-count collect ran
    # on it), so the upstream intermediates can release now — the
    # returned plan reads sel's cache, and sel itself is
    # generation-bounded under the keep() tag
    base.unpersist()
    uni.unpersist()
    big.unpersist()
    return out


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Per-document top-k keyword extraction by TF-IDF (Sparck Jones
    1972) — the classic summarize/route/label signal:

        tfidf(w, d) = tf(w, d) * (ln N - ln df(w))

    tf/df/N are exact integer counts; the two transcendentals inline
    from driver-computed libm values (ln N as a literal, ln df via the
    SPARSE log map over the distinct df values actually present — the
    pmi_collocations / token_entropy convention, because JVM Math.log
    can drift an ulp vs DuckDB's libm ln). The per-doc ranking orders
    by the ROUNDED score with a token tie-break, so rank is
    deterministic cross-engine. Tokens present in every document score
    exactly 0 (idf = ln N − ln N), the standard stopword null.

    Shape at 100 TB: one tokenize/explode pass → (doc, token) partial-
    agg tf (the exchange carries counts, not tokens-per-occurrence),
    one vocab-keyed df agg, an UNHINTED token-keyed join back (r8: the
    df table is vocab-sized — 10⁸–10⁹ tokens on a web corpus — so the
    join must be allowed to shuffle; AQE broadcasts it only when it
    actually fits), one per-doc ranking window (high-cardinality key).
    The distinct-df collect is |distinct df values|-bounded
    (Zipf-tiny), never vocab-bounded.
    """
    import math

    from pyspark.sql import Window

    base = (ensure_min_parallelism(df)
            .where(F.col(text_col).isNotNull())
            .select(F.col(id_col), tokens_expr(F.col(text_col)).alias("__t")))
    n_docs = base.count()
    if n_docs == 0:
        return base.select(
            F.col(id_col), F.lit("").alias("token"),
            F.lit(0).cast("long").alias("tf"),
            F.lit(0).cast("long").alias("df"),
            F.lit(0.0).alias("tfidf"),
            F.lit(0).alias("rank")).where(F.lit(False))
    tf = (base.select(id_col, F.explode("__t").alias("token"))
          .groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    from ..cache import keep
    tf = keep("text.tfidf.tf", tf)
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    dfs = sorted(int(r["df"]) for r in
                 dfc.select("df").distinct().collect())
    if len(dfs) > 65_536:
        raise ValueError(f"tfidf_keywords: {len(dfs)} distinct df values "
                         "exceed the literal log-map cap (65536)")
    logmap = F.create_map(
        *[x for d in dfs for x in (F.lit(d).cast("long"),
                                   F.lit(math.log(d)))])
    score = (F.col("tf")
             * (F.lit(math.log(n_docs))
                - F.element_at(logmap, F.col("df").cast("long"))))
    # token-keyed equi-join, NO broadcast hint (r8): dfc is vocab-sized
    # — 10⁸–10⁹ distinct tokens on a web corpus (URLs, typos) — so a
    # forced BroadcastExchange OOMs exactly where the operator matters;
    # AQE broadcasts it at runtime only when it is actually small
    scored = (tf.join(dfc, "token")
              .select(id_col, "token", "tf", "df",
                      (F.floor(score * F.lit(1e6) + F.lit(0.5))
                       / F.lit(1e6)).alias("tfidf")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(int(k))))


def zipf_fit(df: DataFrame, text_col: str = "text",
             top_n: int = 1000) -> DataFrame:
    """Corpus Zipf-law fit (Zipf 1949; the log-log rank-frequency line
    whose slope ≈ −1 on natural text): OLS of ln f on ln r over the
    top_n corpus token frequencies. The one-number corpus-health check
    every training-data pipeline runs — synthetic/templated/spam-heavy
    corpora bend the line (slope far from −1, poor fit), and the drift
    of the slope between ingestion batches is a cheap contamination
    alarm next to `language_mix` and `token_entropy`.

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),  x = ln r, y = ln f
        intercept = (Σy − slope_raw·Σx) / n

    Determinism: ranks are integers with the (freq DESC, token ASC)
    tie-break pinned; ln r inlines from a driver-side libm literal
    array (ranks are known 1..top_n up front), ln f via the SPARSE
    literal log map over the ≤ top_n distinct frequencies present (the
    tfidf_keywords convention — JVM Math.log drifts ulps vs libm);
    each OLS product casts to DECIMAL(28,12) before summing so the
    four sums are fold-order-free; slope/intercept are the only IEEE
    divisions, floor-rounded at 6. Degenerate corpora (< 2 ranks, or
    all frequencies equal → zero x-variance after tie-ranking) report
    NULL slope/intercept, never NaN.

    EAGER: constructing this DataFrame runs one small Spark job (the
    distinct-frequency collect behind the log map — ≤ top_n values,
    the permutation_entropy convention).

    Shape at 100 TB: one tokenize/explode → token-keyed partial-agg
    count shuffle (the exchange carries (token, count), never
    occurrences); top_n selection is TakeOrderedAndProject (no global
    sort); the regression runs on a top_n-row table — the one keyless
    rank window is bounded by the top_n PARAMETER, not by data (the
    explain-audit allowlist justification).

    Added scope (the reference has no corpus-statistics surface).
    """
    import math

    from pyspark.sql import Window

    if top_n < 2:
        raise ValueError("zipf_fit: top_n must be >= 2")
    cnt = (ensure_min_parallelism(df)
           .where(F.col(text_col).isNotNull())
           .select(F.explode(tokens_expr(F.col(text_col)))
                   .alias("token"))
           .groupBy("token").agg(F.count(F.lit(1)).alias("freq")))
    from ..cache import keep
    # keep(): the eager distinct-frequency collect below and the final
    # regression plan both consume `top` — without the generation-
    # bounded persist the whole tokenize+count pipeline runs twice
    # (the tfidf_keywords convention)
    top = keep("text.zipf.top",
               cnt.orderBy(F.col("freq").desc(), F.col("token").asc())
               .limit(int(top_n)))
    fvals = sorted({int(r["freq"]) for r in
                    top.select("freq").distinct().collect()})
    if not fvals:
        return top.select(
            F.lit(0).cast("long").alias("n_ranks"),
            F.lit(None).cast("double").alias("slope"),
            F.lit(None).cast("double").alias("intercept")) \
            .where(F.lit(False))
    lnf = F.create_map(*[x for v in fvals
                         for x in (F.lit(v).cast("long"),
                                   F.lit(math.log(v)))])
    lnr = F.array(*[F.lit(math.log(r)) for r in range(1, top_n + 1)])
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = top.select(
        F.element_at(lnr, F.row_number().over(w)).alias("__x"),
        F.element_at(lnf, F.col("freq")).alias("__y"))
    d = lambda c: c.cast("decimal(28,12)")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.sum(d(F.col("__x"))).alias("__sx"),
        F.sum(d(F.col("__y"))).alias("__sy"),
        F.sum(d(F.col("__x") * F.col("__y"))).alias("__sxy"),
        F.sum(d(F.col("__x") * F.col("__x"))).alias("__sxx"))
    # the SUMS are decimal-exact (order-free); the OLS combination runs
    # in DOUBLE with a pinned parenthesization — decimal products of two
    # (28,12) operands would cross Spark's precision-38 loss boundary,
    # and identical exact-decimal inputs make the IEEE ops identical on
    # both engines (the sax_symbols variance convention)
    nd = F.col("n_ranks").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy, sxx = F.col("__sxy").cast("double"), F.col("__sxx").cast("double")
    den = nd * sxx - sx * sx
    num = nd * sxy - sx * sy
    slope_raw = num / den
    ok = (F.col("n_ranks") >= 2) & (den != 0.0)
    intercept = ((F.col("__sy").cast("double")
                  - slope_raw * F.col("__sx").cast("double"))
                 / F.col("n_ranks").cast("double"))
    r6 = lambda c: (F.floor(c * F.lit(1e6) + F.lit(0.5))  # noqa: E731
                    / F.lit(1e6))
    return s.select(
        "n_ranks",
        F.when(ok, r6(slope_raw)).alias("slope"),
        F.when(ok, r6(intercept)).alias("intercept"))


def token_burstiness(df: DataFrame, text_col: str = "text",
                     top_n: int = 50) -> DataFrame:
    """Corpus token burstiness — the variance-to-mean ratio (index of
    dispersion) of per-document counts for the top_n corpus tokens
    (Church & Gale 1995, "Poisson mixtures"; the burstiness literature's
    standard screen): a token whose occurrences cluster in few
    documents (VMR >> 1 — topical/templated/spam) reads very
    differently from one spread Poisson-like (VMR ≈ 1 — function
    words), and a CORPUS whose common tokens are all bursty is
    template-heavy — the quality/contamination signal next to
    `zipf_fit`'s slope and `token_entropy`.

        VMR(w) = Var[c_d(w)] / E[c_d(w)]   over ALL docs d (zeros
                                            included — absence is data)

    Determinism: per-doc counts are exact integers; Σc and Σc² are
    exact integer sums over the docs CONTAINING the token, extended to
    the all-docs population by the zero-count identity (zeros add
    nothing to either sum — no |docs|×top_n dense join needed);
    population variance combines as (n·Σc² − (Σc)²) with DECIMAL(19,0)
    casts bounding operands under the precision-38 product boundary
    (documented: Σc² < 10¹⁸); VMR = ONE floor-round-6 double division.

    Shape at 100 TB: one tokenize/explode → (doc, token) partial-agg
    shuffle, one token-keyed moment agg, TakeOrderedAndProject top_n
    (no global sort); the doc-count scalar is a 1-row aggregate
    crossJoin(broadcast) (the quality_sample pattern). Zeros never
    materialize.

    Added scope (the reference has no corpus-statistics surface).
    """
    if top_n < 1:
        raise ValueError("token_burstiness: top_n must be >= 1")
    base = (ensure_min_parallelism(df)
            .where(F.col(text_col).isNotNull()))
    ndocs = base.agg(F.count(F.lit(1)).alias("__nd"))
    tf = (base.select(F.monotonically_increasing_id().alias("__doc"),
                      tokens_expr(F.col(text_col)).alias("__t"))
          .select("__doc", F.explode("__t").alias("token"))
          .groupBy("__doc", "token")
          .agg(F.count(F.lit(1)).alias("__c")))
    d19 = lambda c: c.cast("decimal(19,0)")
    mom = (tf.groupBy("token")
           .agg(F.count(F.lit(1)).alias("df_docs"),
                F.sum("__c").alias("total"),
                F.sum(d19(F.col("__c")) * d19(F.col("__c")))
                .alias("__s2")))
    # population moments over ALL docs: zeros contribute nothing to
    # Σc/Σc², only to n — so the per-token row + the 1-row doc count
    # is the whole computation
    r6 = lambda c: (F.floor(c * F.lit(1e6) + F.lit(0.5))  # noqa: E731
                    / F.lit(1e6))
    n = F.col("__nd").cast("double")
    sc = F.col("total").cast("double")
    s2 = F.col("__s2").cast("double")
    vmr = (s2 * n - sc * sc) / (n * sc)   # Var/mean = (nΣc²−(Σc)²)/(n·Σc)
    return (mom.crossJoin(F.broadcast(ndocs))
            .orderBy(F.col("total").desc(), F.col("token").asc())
            .limit(int(top_n))
            .select("token", "df_docs", "total",
                    F.col("__nd").alias("n_docs"),
                    r6(vmr).alias("vmr")))


def length_profile(df: DataFrame, group_col: str = "source",
                   len_col: str = "n_chars") -> DataFrame:
    """Per-source document-length profile — n_docs, exact interpolating
    p25/p50/p75/p95 and an exact-decimal mean of the length column: the
    first audit every corpus intake runs (a source whose length
    distribution collapses or bimodalizes between crawls changed its
    extraction pipeline, not its content — the operational sibling of
    `zipf_fit`/`token_burstiness` on the metadata axis).

    Determinism: quantiles are the exact interpolating (n−1)·q order
    statistics (Spark `percentile` ↔ DuckDB `quantile_cont`, the
    ts_quantile_bands convention); the mean is a DECIMAL(28,6)
    accumulation over int64 lengths divided once (order-free); all
    floor-rounded at 6. NULL lengths are excluded from the statistics
    but COUNTED (n_docs vs n_measured — a source suddenly producing
    NULL lengths is itself the finding, never silently conflated).

    Shape: ONE group-keyed shuffle; per-group (never global) sort for
    the order statistics; `percentile_approx` is the documented
    100 TB swap (the agg_median_percentile trade).

    Added scope (the reference has no corpus-audit surface).
    """
    d = ensure_min_parallelism(df)
    v = F.col(len_col).cast("double")
    pct = F.percentile(v, F.array(F.lit(0.25), F.lit(0.5),
                                  F.lit(0.75), F.lit(0.95)))
    r6 = lambda c: (F.floor(c * F.lit(1e6) + F.lit(0.5))  # noqa: E731
                    / F.lit(1e6))
    mean = (F.sum(F.col(len_col).cast("decimal(28,6)")).cast("double")
            / F.count(len_col))
    return (d.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count(len_col).alias("n_measured"),
                 pct.alias("__p"),
                 mean.alias("__m"))
            .select(group_col, "n_docs", "n_measured",
                    r6(F.element_at("__p", 1)).alias("p25"),
                    r6(F.element_at("__p", 2)).alias("p50"),
                    r6(F.element_at("__p", 3)).alias("p75"),
                    r6(F.element_at("__p", 4)).alias("p95"),
                    r6(F.col("__m")).alias("mean_len")))


def fuzzy_blocked_pairs(df: DataFrame, str_col: str,
                        block_pattern: str = "[a-z0-9]+$",
                        max_dist: int = 3,
                        max_block_size: int = 256) -> DataFrame:
    """Blocked fuzzy string matching — the entity-resolution candidate
    generator (record linkage's standard blocking + edit-distance
    verify, Fellegi & Sunter 1969 lineage): pairs of DISTINCT strings
    that share a blocking key (default: the last token — surname /
    product noun / domain) and sit within `max_dist` Levenshtein edits.
    The near-dup machinery for SHORT strings, where MinHash shingles
    have nothing to grip: product names, author names, header values.

    Blocking is what makes fuzzy matching distributable: the all-pairs
    edit-distance matrix is O(n²) and inherently quadratic, but pairs
    that share no block are never materialized — the same
    candidate-bounding move as dedup's LSH bands, with the block key
    playing the band hash. Blocks above `max_block_size` are DROPPED
    (the co_occurrence_edges cap convention — a degenerate block like
    an empty-string key would otherwise emit C(n, 2) pairs) and the
    drop is LOUD: every output row carries the run's
    (n_blocks_dropped, n_strings_dropped) — the n_clamped convention,
    so a block cap that silently excluded the most-duplicated entities
    is visible in the result itself. The cap and the counters are
    mirrored exactly by the oracle; production escalates an oversized
    block to a second-level key, e.g. first+last token. (Caveat: a
    run whose kept blocks produce ZERO pairs has no rows to carry the
    counters — so an all-dropped run is invisible HERE; use the public
    `fuzzy_blocked_stats` companion, which returns the 1-row counter
    table unconditionally, when that failure mode matters.)

    Levenshtein is Spark's JVM built-in (codegen, no UDF) and DuckDB's
    — the same classic unit-cost distance, so the gate is
    integer-exact. Only DISTINCT strings ride the shuffle (the
    real-world shape: match entity VOCABULARY, not rows; 100 TB of
    rows funnels to |vocabulary| strings first).

    Output (block, a, b, dist, n_blocks_dropped, n_strings_dropped):
    a < b lexicographically, dist ≤ max_dist, one block-keyed shuffle
    + within-block equi-join + a 1-row dropped-stats broadcast.
    """
    pairs, dropped = _fuzzy_blocked(df, str_col, block_pattern,
                                    max_dist, max_block_size)
    return pairs.crossJoin(F.broadcast(dropped))


def fuzzy_blocked_stats(df: DataFrame, str_col: str,
                        block_pattern: str = "[a-z0-9]+$",
                        max_dist: int = 2,
                        max_block_size: int = 256) -> DataFrame:
    """The drop counters of `fuzzy_blocked_pairs`, ALWAYS one row —
    (n_blocks_dropped, n_strings_dropped) — even when every kept block
    yields zero pairs (the one shape where the pair table can't carry
    them). Same parameters, same cap rule, same oracle-mirrorable
    arithmetic; this is the loud-by-construction view of the cap."""
    _, dropped = _fuzzy_blocked(df, str_col, block_pattern,
                                max_dist, max_block_size)
    return dropped


def _fuzzy_blocked(df: DataFrame, str_col: str, block_pattern: str,
                   max_dist: int, max_block_size: int):
    """Shared core of fuzzy_blocked_pairs / entity_clusters: returns
    (pairs, dropped) — the within-block match pairs WITHOUT the stats
    columns, and the 1-row (n_blocks_dropped, n_strings_dropped)
    aggregate over the blocks excluded by the size cap."""
    if max_dist < 1:
        raise ValueError("fuzzy_blocked_pairs: max_dist must be >= 1")
    if max_block_size < 2:
        raise ValueError("fuzzy_blocked_pairs: max_block_size "
                         "must be >= 2")
    s = (ensure_min_parallelism(df)
         .select(F.col(str_col).alias("__s"))
         .where(F.col("__s").isNotNull())
         .distinct()
         .select(F.regexp_extract(F.col("__s"), block_pattern, 0)
                 .alias("block"), F.col("__s")))
    sizes = s.groupBy("block").agg(F.count(F.lit(1)).alias("__n"))
    ok = (sizes
          .where((F.col("__n") >= 2) & (F.col("__n") <= max_block_size))
          .select("block"))
    dropped = (sizes.where(F.col("__n") > F.lit(int(max_block_size)))
               .agg(F.count(F.lit(1)).cast("long")
                    .alias("n_blocks_dropped"),
                    F.coalesce(F.sum("__n"), F.lit(0)).cast("long")
                    .alias("n_strings_dropped")))
    kept = s.join(ok, "block")
    a = kept.select("block", F.col("__s").alias("a"))
    b = kept.select("block", F.col("__s").alias("b"))
    pairs = (a.join(b, "block")
             .where(F.col("a") < F.col("b"))
             .select("block", "a", "b",
                     F.levenshtein("a", "b").alias("dist"))
             .where(F.col("dist") <= F.lit(int(max_dist))))
    return pairs, dropped


def entity_clusters(df: DataFrame, str_col: str,
                    block_pattern: str = "[a-z0-9]+$",
                    max_dist: int = 3, max_block_size: int = 256,
                    max_iter: int = 20) -> DataFrame:
    """Entity RESOLUTION over a string column — the full record-linkage
    composition (Fellegi & Sunter 1969 lineage): fuzzy_blocked_pairs
    generates the within-block Levenshtein match edges, connected
    components (dedup.connected_components' min-label propagation)
    transitively closes them into entities, and every distinct string
    gets a row: (entity, canonical, cluster_size) with `canonical` the
    component's lexicographically-smallest member (the deterministic
    cluster representative — the same smallest-id election as
    doc_dedup_clusters) and unmatched strings their own singleton
    entity. The table a pipeline joins back on `entity` to replace
    free-text variants ("acme corp", "acme corp.") with one canonical
    key before grouping — the step that turns fuzzy MATCHING into
    fuzzy DEDUPLICATION.

    Transitive closure is the point of the components pass: A~B and
    B~C link A and C even when dist(A, C) > max_dist — entity identity
    is an equivalence relation, pairwise matching is not.

    Scale shape: the pair stage is block-bounded (fuzzy_blocked_pairs'
    cap); members of an OVERSIZED block get no match edges and so
    become singleton entities — that loss is LOUD, not silent: every
    output row carries the run's (n_blocks_dropped, n_strings_dropped)
    from the pair stage (the n_clamped convention), so "the most
    duplicated entities live in the block the cap excluded" is visible
    in the result itself. The closure iterates min-label over the PAIR
    graph only (|matched vocabulary| nodes, converges in
    component-diameter rounds — shallow for edit-distance clusters);
    the singleton completion is one anti-join of the distinct
    vocabulary; cluster_size one |vocab|-row groupBy. The corpus
    itself never rides any of it — only the distinct string
    vocabulary does (the fuzzy_blocked_pairs argument).
    """
    from .dedup import connected_components
    pairs, dropped = _fuzzy_blocked(df, str_col,
                                    block_pattern=block_pattern,
                                    max_dist=max_dist,
                                    max_block_size=max_block_size)
    comp = (connected_components(pairs, id_a="a", id_b="b",
                                 max_iter=max_iter)
            .select(F.col("doc_id").alias("entity"),
                    F.col("cluster").alias("canonical")))
    vocab = (df.select(F.col(str_col).alias("entity"))
             .where(F.col("entity").isNotNull())
             .distinct())
    singles = (vocab.join(comp.select("entity"), "entity", "left_anti")
               .withColumn("canonical", F.col("entity")))
    labeled = comp.unionByName(singles)
    sizes = (labeled.groupBy("canonical")
             .agg(F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return (labeled.join(sizes, "canonical")
            .select("entity", "canonical", "cluster_size")
            .crossJoin(F.broadcast(dropped)))
