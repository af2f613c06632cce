"""Text-analysis operators for LLM data pipelines (north star,
BASELINE.json; SURVEY.md §7 step 8).

All pure built-in column expressions — JVM-side, whole-stage codegen,
no Python in the hot path — so they scale linearly with the scan.
Designed for a 100 TB documents table: every function is a narrow
projection; the only shuffles are the aggregations a caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A tiny per-language stopword table for the heuristic language ID.
# Real pipelines plug in fastText/cld3 via mapInPandas (see
# operators/multimodal.py for the binary-asset pattern); the
# heuristic keeps the hot path JVM-only.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space
# symbols — a public approximation of GPT-2's pre-tokenizer split.
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_ws(col: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count_ws(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def token_count_bpe_ish(col: Column | str) -> Column:
    """Regex-piece count approximating a BPE tokenizer's pre-split."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_REGEX), 0))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: first language whose marker-word set
    intersects the token set; 'und' otherwise. Deterministic CASE
    chain in LANG_MARKERS insertion order."""
    toks = tokens_ws(col)
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        expr = F.when(F.arrays_overlap(toks, markers), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/token counts, mean token
    length, punctuation ratio, stopword ratio, alpha ratio."""
    c = F.col(text_col)
    toks = tokens_ws(c)
    n_tok = token_count_ws(c)
    stop = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    return df.select(
        "*",
        F.length(c).alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        (F.length(F.regexp_replace(c, r"\s", "")).cast("double") / F.greatest(n_tok, F.lit(1)))
        .alias("q_mean_token_len"),
        (
            F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")).cast("double")
            / F.greatest(F.length(c), F.lit(1))
        ).alias("q_punct_ratio"),
        (
            F.size(F.filter(toks, lambda w: F.array_contains(stop, w))).cast("double")
            / F.greatest(n_tok, F.lit(1))
        ).alias("q_stopword_ratio"),
        (
            F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
            / F.greatest(F.length(c), F.lit(1))
        ).alias("q_alpha_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: weighted blend of the features
    (weights chosen like public heuristic filters: favor mid-length,
    low punctuation, some stopwords)."""
    f = quality_features(df, text_col)
    length_term = F.least(F.col("q_n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    return f.withColumn(
        "quality_score",
        F.round(
            0.4 * length_term
            + 0.3 * (1.0 - F.least(F.col("q_punct_ratio") * 5.0, F.lit(1.0)))
            + 0.3 * F.least(F.col("q_stopword_ratio") * 4.0, F.lit(1.0)),
            6,
        ),
    )


def spread(df: DataFrame) -> DataFrame:
    """Round-robin re-slice up to the session's default parallelism
    when the input arrives in FEWER partitions. A small corpus table
    is one parquet file, which `maxPartitionBytes` planning reads as
    1-2 partitions — and the CPU-heavy text paths (shingle
    transforms, per-token explodes) then run on 1-2 of the
    machine's cores (r05 scaling curve: 61 of source_overlap's
    68 s at sf1 was the 2-partition explode). The re-slice is one
    narrow round-robin exchange of (id, text) rows, trivially
    cheaper than the starved CPU it unlocks; at production scale a
    corpus scan yields hundreds of partitions and this is a no-op.
    Plan gates that forbid shuffling text allow exactly this
    RoundRobinPartitioning exchange and keep forbidding text in
    hash/range exchanges (the pair-join discipline is unchanged)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def hash60(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracles:
    first 15 hex chars of md5 → bigint. (60 bits keeps the value
    exactly representable in both engines' int64.)"""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 15), 16, 10).cast("long")


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Position-weighted document fingerprint: sum over tokens of
    (hash60(token) % 2^31) * (pos+1), mod 2^61 — an order-sensitive
    content fingerprint computable without a sequential fold (so it
    is expressible both as Spark array ops and as set-based SQL).
    """
    toks = tokens_ws(F.col(text_col))
    weighted = F.transform(
        toks, lambda w, i: (hash60(w) % F.lit(2**31)) * (i.cast("long") + 1)
    )
    fp = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x) % F.lit(2**61)
    return df.select(id_col, fp.alias("fingerprint"))


# --- scrubbing / normalization ------------------------------------------------

# Simple-dialect regexes (no lookaround) so Spark's Java regex and
# the oracle's RE2 agree character-for-character.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_REGEX = r"https?://[^\s]+"


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training-data scrub: redact emails and URLs, count what was
    removed. Pure regexp_replace/size — JVM-side, scan-bound."""
    c = F.col(text_col)
    return df.select(
        id_col,
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_REGEX, "<EMAIL>"), URL_REGEX, "<URL>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_REGEX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(URL_REGEX), 0)).alias("n_urls"),
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup keys: lowercase, trim, collapse
    internal whitespace runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def split_sentences(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sentence segmentation: split on [.!?]+ runs, trim, drop
    empties — explode(split()) keeps it in the JVM (the Python UDTF
    twin in functions/udtf.py is the §2.7 escape hatch for logic
    regex can't express)."""
    pieces = F.split(F.col(text_col), r"[.!?]+")
    return (
        df.select(F.col(id_col), F.explode(pieces).alias("__raw"))
        .select(F.col(id_col), F.trim(F.col("__raw")).alias("sentence"))
        .filter(F.col("sentence") != "")
    )


def ngrams(col: Column | str, n: int) -> Column:
    """Word n-grams WITH duplicates (shingles() is distinct — wrong
    for repetition stats, where multiplicity IS the signal). Same
    staged-projection contract: bind the tokens array first."""
    toks = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    top_bigram_frac = occurrences of the most frequent word bigram /
    total bigrams; dup_trigram_frac = fraction of trigram occurrences
    whose trigram appears more than once. High values flag boilerplate
    and spam for corpus filtering.

    ZERO-shuffle plan: the n-gram counts are per-document, so no
    rows ever need to meet — sort each doc's gram array and run-
    length encode it per row (JVM higher-order functions over bound
    attributes, staged projections per the `with_shingles` contract
    so no expression re-evaluates). The most-frequent-gram count is
    the max run length; duplicated-occurrence mass is the sum of
    runs longer than 1. At any scale this is a mapper-only pass —
    the previous (id, n, gram) count shuffle moved ~17× the source
    bytes (SHUFFLE.md) for per-doc math.
    """
    starts = (
        "case when size({b}) = 0 then array()"
        " else filter(sequence(1, size({b})),"
        "      i -> i = 1 or element_at({b}, i) != element_at({b}, i - 1)) end"
    )
    staged = (
        df.select(id_col, tokens_ws(F.col(text_col)).alias("__toks"))
        .select(
            id_col,
            F.array_sort(ngrams("__toks", 2)).alias("__b2"),
            F.array_sort(ngrams("__toks", 3)).alias("__b3"),
        )
        .select(
            id_col,
            F.size("__b2").alias("__n2"),
            F.size("__b3").alias("__n3"),
            F.expr(starts.format(b="__b2")).alias("__s2"),
            F.expr(starts.format(b="__b3")).alias("__s3"),
        )
        .select(
            id_col,
            "__n2",
            "__n3",
            # Same empty-guard as `starts`: sequence(1, 0) is the
            # DESCENDING [1, 0], whose element_at(.., 0) / element_at of
            # an empty array are ANSI runtime errors — today masked only
            # by lazy CaseWhen evaluation downstream, which any plan
            # change (CSE, cache, direct select of __l2) would defeat.
            F.expr(
                "case when size(__s2) = 0 then array() else"
                " transform(sequence(1, size(__s2)),"
                " j -> (if(j < size(__s2), element_at(__s2, j + 1), __n2 + 1))"
                "      - element_at(__s2, j)) end"
            ).alias("__l2"),
            F.expr(
                "case when size(__s3) = 0 then array() else"
                " transform(sequence(1, size(__s3)),"
                " j -> (if(j < size(__s3), element_at(__s3, j + 1), __n3 + 1))"
                "      - element_at(__s3, j)) end"
            ).alias("__l3"),
        )
    )
    frac2 = F.round(
        F.array_max("__l2").cast("double") / F.col("__n2").cast("double"), 6
    )
    dup3 = F.aggregate(
        F.col("__l3"),
        F.lit(0).cast("long"),
        lambda a, l: a + F.when(l > 1, l.cast("long")).otherwise(F.lit(0).cast("long")),
    )
    frac3 = F.round(dup3.cast("double") / F.col("__n3").cast("double"), 6)
    return staged.select(
        id_col,
        F.col("__n2").cast("long").alias("n_bigrams"),
        F.when(F.col("__n2") > 0, frac2).otherwise(F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        F.col("__n3").cast("long").alias("n_trigrams"),
        F.when(F.col("__n3") > 0, frac3).otherwise(F.lit(0.0)).alias(
            "dup_trigram_frac"
        ),
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Frequency-ranked token vocabulary: ``(token, n, token_id)``,
    ids dense from 1 by (count desc, token) — the tokenizer-training
    precursor (BPE et al. start from exactly this table).

    SCALE: the count shuffle moves (token, 1) pairs with map-side
    combine; the top-k selection is DISTRIBUTED —
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
    (per-partition bounded heaps, then a k-row merge on one task),
    so no single task ever sorts the full distinct-token table (a
    100 TB web corpus has 10⁸–10⁹ distinct tokens; the old
    unpartitioned ranking window moved ALL of them to one task —
    VERDICT r05 perf-weak #1). The ranking window that assigns
    dense ids runs strictly ABOVE the limit, over exactly k rows
    (plan-gated in tests/test_plans.py)."""
    counts = (
        df.select(F.explode(tokens_ws(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = counts.orderBy(F.desc("n"), "token").limit(int(top_k))
    # frame bounded at top_k rows. The id window partitions on a
    # constant-valued but NON-FOLDABLE column (shiftright(n, 62) = 0
    # for any real count): a literal would be stripped by
    # EliminateWindowPartitions, re-creating the empty-partition-spec
    # WindowExec warning this rewrite exists to retire — the spec
    # being non-empty documents (and asserts) that the frame is the
    # k-row limit output, not the unbounded count table.
    win = Window.partitionBy(F.shiftright(F.col("n"), 62)).orderBy(
        F.desc("n"), "token"
    )
    return topk.withColumn("token_id", F.row_number().over(win).cast("int"))


def collocation_lift(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Bigram collocation strength as LIFT = N·c(ab)/(c(a)·c(b)) —
    the log-free core of PMI (PMI = log2(lift)), kept log-free so
    every value is an exact integer ratio (deterministic across
    engines; no libm variance). High lift = words that co-occur far
    more than chance ("new york") — phrase-mining / tokenizer-merge
    signal.

    All counts are exact int64; products stay < 2^63 for corpora to
    ~1e9 tokens per distinct word pair — beyond that, scale counts
    down before multiplying. One scan emits unigrams and bigrams
    together (tagged structs, same single-pass trick as
    repetition_features); one count shuffle; the unigram table
    broadcasts back onto bigrams twice. The tagged array is
    materialized before the explode (Generate re-evaluates an
    inlined interpreted transform per OUTPUT element — PERF §21)."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    toks_df = spread(df.select(text_col)).select(
        tokens_ws(F.col(text_col)).alias("__toks")
    )
    tagged = F.concat(
        F.transform(F.col("__toks"), lambda w: F.struct(F.lit(1).alias("k"), w.alias("g"))),
        F.transform(
            ngrams("__toks", 2), lambda g: F.struct(F.lit(2).alias("k"), g.alias("g"))
        ),
    )
    tagged_arr = _truncate(toks_df.select(tagged.alias("__tag")))
    counts = (
        tagged_arr.select(F.explode("__tag").alias("t"))
        .select(F.col("t.k").alias("k"), F.col("t.g").alias("g"))
        .groupBy("k", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # n_total rides on uni as an unpartitioned window over the
    # vocabulary-sized frame (a separate agg+crossJoin branch would
    # re-run the tokenize scan + count shuffle a third time); both
    # broadcast sides are the IDENTICAL uni plan, so ReuseExchange
    # builds the broadcast once instead of re-executing per side
    uni = (
        counts.filter(F.col("k") == 1)
        .select(F.col("g").alias("w"), F.col("n").alias("c_w"))
        .withColumn("n_total", F.sum("c_w").over(Window.partitionBy(F.lit(1))))
    )
    bi = (
        counts.filter((F.col("k") == 2) & (F.col("n") >= min_count))
        .select(F.col("g").alias("bigram"), F.col("n").alias("c_ab"))
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    )
    u1, u2 = uni.alias("u1"), uni.alias("u2")
    out = (
        bi.join(F.broadcast(u1), F.col("w1") == F.col("u1.w"))
        .join(F.broadcast(u2), F.col("w2") == F.col("u2.w"))
    )
    return out.select(
        "bigram",
        F.col("c_ab").cast("int").alias("c_ab"),
        F.round(
            (F.col("c_ab") * F.col("u1.n_total")).cast("double")
            / (F.col("u1.c_w") * F.col("u2.c_w")).cast("double"),
            6,
        ).alias("lift"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Characteristic terms per group by log-free TF-IDF:
    ``score(term, g) = tf(term, g) · N_docs / docfreq(term)`` —
    the idf kept as a plain ratio rather than ``log(N/df)`` so every
    score is an exact integer ratio evaluated with one IEEE divide
    (deterministic across engines; ranking is order-isomorphic to
    true TF-IDF within a fixed term's scores, and for ranking we
    only need a consistent, monotone-in-(tf, 1/df) weight).

    SCALE: one exploded shuffle keyed (group, doc, term) with
    map-side combine; both downstream aggregates are vocabulary-
    sized, and docfreq broadcasts back. The ranking window runs per
    group over vocabulary-sized input — no corpus-sized window.
    """
    per_doc = (
        df.select(group_col, id_col, F.explode(tokens_ws(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(group_col, id_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grp = per_doc.groupBy(group_col, "token").agg(F.sum("n").alias("tf"))
    # one row per (doc, token) ⇒ row count per token IS doc frequency
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("docfreq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        grp.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("docfreq").cast("double"),
        )
    )
    win = Window.partitionBy(group_col).orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= top_k)
        .select(
            group_col,
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("docfreq").cast("long").alias("docfreq"),
            # raw double: one exact int product + one IEEE divide is
            # engine-exact; rounding would add midpoint divergence
            F.col("score").alias("score"),
            "rnk",
        )
    )


def rarity_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean inverse unigram frequency — a log-free
    surprisal/perplexity proxy (documents made of rare words score
    high; boilerplate scores ~1·N/max_count). Real pipelines swap in
    a KenLM scorer via mapInPandas; this keeps the corpus-statistics
    plumbing (global counts → broadcast → per-doc fold) JVM-only.

    Determinism: each token's inverse frequency is one IEEE divide;
    the per-doc sum uses the scaled-long trick (round(x·10⁶)→BIGINT)
    so partial-aggregation order can't change the result.

    SCALE: token-count aggregate is vocabulary-sized and broadcasts
    back onto the token stream; the only corpus-sized shuffle is the
    per-doc fold, keyed by doc id with map-side combine.
    """
    toks = (
        df.select(id_col, F.explode(tokens_ws(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    # attach the corpus total as a window over the VOCABULARY-sized
    # count table — an agg+crossJoin would plan a second subtree that
    # re-executes the corpus scan just to sum ~vocab rows
    counts = counts.withColumn(
        "n_total", F.sum("c_t").over(Window.partitionBy(F.lit(1)))
    )
    inv = (
        toks.join(F.broadcast(counts), "token")
        .withColumn(
            "__s",
            F.round(
                F.col("n_total").cast("double") / F.col("c_t").cast("double")
                * F.lit(1000000.0),
                0,
            ).cast("long"),
        )
    )
    # no final round: every op above is the identical IEEE op in any
    # engine, so the raw double is already engine-exact — a round(x, 6)
    # here would REINTRODUCE divergence (decimal-exact HALF_UP vs
    # multiply-then-round differ by 1 ulp near midpoints)
    return inv.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.sum("__s").cast("double")
            / F.lit(1000000.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_inv_freq"),
    )


def bigram_conditional(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Bigram-LM estimation: P(w2|w1) = c(w1 w2) / c(w1) as an exact
    integer ratio (the MLE a count-based n-gram LM trains on; KN
    smoothing adds only more count tables of the same shape).

    Same single-scan tagged uni+bigram emission as collocation_lift,
    with the same materialize-before-explode staging (PERF §21);
    the unigram table broadcasts back onto the bigram table.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    toks_df = spread(df.select(text_col)).select(
        tokens_ws(F.col(text_col)).alias("__toks")
    )
    tagged = F.concat(
        F.transform(F.col("__toks"), lambda w: F.struct(F.lit(1).alias("k"), w.alias("g"))),
        F.transform(
            ngrams("__toks", 2), lambda g: F.struct(F.lit(2).alias("k"), g.alias("g"))
        ),
    )
    tagged_arr = _truncate(toks_df.select(tagged.alias("__tag")))
    counts = (
        tagged_arr.select(F.explode("__tag").alias("t"))
        .select(F.col("t.k").alias("k"), F.col("t.g").alias("g"))
        .groupBy("k", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uni = counts.filter(F.col("k") == 1).select(
        F.col("g").alias("w1"), F.col("n").alias("c_w1")
    )
    bi = (
        counts.filter((F.col("k") == 2) & (F.col("n") >= min_count))
        .select(F.col("g").alias("bigram"), F.col("n").alias("c_ab"))
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
    )
    return bi.join(F.broadcast(uni), "w1").select(
        "bigram",
        "w1",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.col("c_w1").cast("long").alias("c_w1"),
        F.round(
            F.col("c_ab").cast("double") / F.col("c_w1").cast("double"), 6
        ).alias("p_cond"),
    )


def lm_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Per-document language-model predictability — the
    perplexity-style quality signal (CCNet's "LM score the corpus,
    filter the tail") in this repo's LOG-FREE exact form: train the
    bigram MLE on the corpus (:func:`bigram_conditional`), score each
    document by the mean conditional probability of its bigrams, and
    count its out-of-vocabulary bigrams (unseen under ``min_count``
    ⇒ probability 0 in the mean — the OOV penalty). Avoiding
    ``ln`` keeps the score an exact fixed-point ratio (p rounded to
    1e-6, summed as int64), so engines hash-match; the ranking it
    induces is monotone with perplexity's whenever the doc-length
    normalization agrees (mean-p vs geometric-mean-p order flips are
    possible for extreme mixes, which filtering at the tails
    tolerates).

    One corpus scan trains the LM, one scores; the LM table joins on
    the bigram key (already aggregated, so its size is vocabulary-,
    not corpus-, bounded). Docs with < 2 tokens have no bigram
    evidence and are excluded. Returns
    ``(id_col, n_bigrams, n_oov, mean_p)``.
    """
    # CPU-bound HOF work over a possibly tiny scan: a sub-MB parquet
    # reads as ONE partition, serializing the n-gram construction on
    # one core. spread() round-robins (id, text) up to the session
    # parallelism first — both the LM pass and the checkpointed
    # bigram explode below inherit the re-slice; at production scale
    # (partitions >> cores) it is a no-op and no text ever shuffles.
    df = spread(df.select(id_col, text_col))
    lm = bigram_conditional(df, text_col=text_col, min_count=min_count).select(
        "bigram", "p_cond"
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # bigram array staged as an attribute before the explode
    # (PERF §21: Generate re-evaluates inlined interpreted transforms
    # per OUTPUT element)
    bi_arr = _truncate(
        df.select(F.col(id_col), tokens_ws(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), ngrams("__toks", 2).alias("__bi"))
    )
    doc_bi = bi_arr.select(F.col(id_col), F.explode("__bi").alias("bigram"))
    # the LM is vocabulary-bounded AND min_count-thresholded — far
    # below any broadcast ceiling in practice — so broadcasting it
    # keeps the (corpus-sized) exploded side from ever shuffling; at
    # a scale where the LM outgrows broadcast, drop the hint and let
    # AQE pick the strategy
    scored = doc_bi.join(F.broadcast(lm), "bigram", "left").select(
        id_col,
        F.when(F.col("p_cond").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "__oov"
        ),
        # fixed-point: p_cond is already rounded to 6 places
        F.coalesce(
            F.round(F.col("p_cond") * 1_000_000.0).cast("long"), F.lit(0)
        ).alias("__p6"),
    )
    # the mean divides by an arbitrary n, which can land EXACTLY on a
    # 7th-decimal tie — and Spark's round (shortest-decimal half-up)
    # and DuckDB's (binary-value) break ties differently. Integer
    # half-up division floor((2a+n)/(2n)) sidesteps floats entirely.
    n = F.count(F.lit(1))
    mean_p6 = F.floor(
        (F.lit(2) * F.sum("__p6") + n) / (F.lit(2) * n)
    ).cast("long")
    return scored.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        F.sum("__oov").cast("long").alias("n_oov"),
        (mean_p6.cast("double") / 1_000_000.0).alias("mean_p"),
    )


def _bm25_aggregate(
    dt: DataFrame, n_docs: int, avgdl: float, k1: float, b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 arithmetic: idf ratio × tf saturation, fixed-point
    per-term rounding, per-doc aggregation. Both the text-scan path
    (:func:`bm25_scores`) and the inverted-index path
    (:func:`bm25_from_index`) ride this ONE implementation — the two
    are oracle-pinned identical, so the arithmetic must never fork.
    ``dt`` columns: (id_col, __w term, __tf, __dl)."""
    dfreq = dt.groupBy("__w").agg(F.countDistinct(id_col).alias("__df"))
    idf = (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5)) / (
        F.col("__df") + F.lit(0.5)
    )
    tf_sat = (F.col("__tf") * F.lit(k1 + 1.0)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * tf_sat, 6)
    return (
        dt.join(F.broadcast(dfreq), "__w")
        .select(
            id_col,
            F.round(contrib * 1_000_000.0).cast("long").alias("__c6"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
            F.round(
                F.sum("__c6").cast("double") / 1_000_000.0, 6
            ).alias("score"),
        )
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-family ranked retrieval over the corpus — the lexical
    half of a RAG stack (hybrid search = this + cosine_topk / ANN).
    Classic BM25's idf is ``ln((N-df+0.5)/(df+0.5))``; this repo's
    oracle-exactness discipline is LOG-FREE, so the idf RATIO is used
    un-logged (the repo-wide pattern: rarity_scores, collocation
    lift). Per term that is a monotone transform of BM25's idf —
    rare terms still dominate, common terms still vanish — while the
    whole score stays exact rational-and-IEEE arithmetic both
    engines reproduce bit-for-bit. Term-frequency saturation and
    length normalization are standard:
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Plan: one tokenize pass; the per-(doc, term) table joins the
    term document-frequency table (|terms| rows — broadcast); all
    corpus-level stats (N, avgdl) are two scalars. Per-term
    contributions round to 1e-6 and fixed-point-sum per doc, so the
    result hash-matches the SQL twin. Returns
    ``(id_col, n_hit_terms, score)`` for docs hitting ≥ 1 term.
    """
    base = df.select(
        F.col(id_col), tokens_ws(F.col(text_col)).alias("__t")
    ).select(id_col, F.size("__t").alias("__dl"), "__t")
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl").cast("long").alias("sumdl"),
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = float(tot["sumdl"]) / float(n_docs)
    dt = (
        base.select(id_col, "__dl", F.explode("__t").alias("__w"))
        .filter(F.col("__w").isin(list(terms)))
        .groupBy(id_col, "__dl", "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    return _bm25_aggregate(dt, n_docs, avgdl, k1, b, id_col)


def text_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Build the classic inverted index: ``postings (term, doc_id,
    tf)`` + ``doc_stats (doc_id, dl)`` — tokenize the corpus ONCE,
    then every retrieval query touches only its own terms' posting
    rows (a filter that pushes down to the postings table's scan)
    instead of re-tokenizing 100 TB of text. Persist both frames
    (parquet partitioned/bucketed by term at scale) and serve
    :func:`bm25_from_index` from them."""
    base = df.select(
        F.col(id_col), tokens_ws(F.col(text_col)).alias("__t")
    )
    doc_stats = base.select(id_col, F.size("__t").alias("dl"))
    postings = (
        base.select(id_col, F.explode("__t").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, doc_stats


def bm25_from_index(
    postings: DataFrame,
    doc_stats: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`bm25_scores` served from the inverted index instead of
    the text — identical output (pinned by the shared oracle), but
    the per-query cost is O(posting rows of the query terms): the
    ``term IN (...)`` filter reaches the postings scan, the corpus
    text is never read. This is the batch-retrieval posture at
    100 TB: index once, query many."""
    tot = doc_stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = float(tot["sumdl"]) / float(n_docs)
    dt = (
        postings.filter(F.col("term").isin(list(terms)))
        .join(doc_stats, id_col)
        .select(
            id_col,
            F.col("dl").alias("__dl"),
            F.col("term").alias("__w"),
            F.col("tf").alias("__tf"),
        )
    )
    return _bm25_aggregate(dt, n_docs, avgdl, k1, b, id_col)


# --- trigram index: substring (LIKE '%p%') acceleration -----------------------


def trigram_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-trigram inverted index: distinct ``(tri, doc_id)``
    rows. The standard index for arbitrary-substring (LIKE
    '%pattern%') search, which no B-tree/sort index can serve: build
    once (persist partitioned by ``tri`` at scale), then a query
    touches only its own pattern's trigram posting rows. Per-row
    array ops generate the trigrams; the explode carries 3-char
    strings + the id, never the text."""
    base = spread(df.select(id_col, text_col))
    tris = base.select(
        F.col(id_col),
        F.when(
            F.length(text_col) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length(text_col) - 2),
                lambda i: F.col(text_col).substr(i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("__tris"),
    )
    # materialization barrier before the explode (Generate re-evaluates
    # an inlined interpreted transform per OUTPUT element — the
    # winnow/source_overlap trap; O(len) trigram build would become
    # O(len²) per row)
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    return (
        _truncate(tris).select(id_col, F.explode("__tris").alias("tri")).distinct()
    )


def trigram_search(
    postings: DataFrame,
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring search served by the trigram index: candidate
    docs must contain EVERY trigram of the pattern (an in-list filter
    that pushes down to the postings scan + one counting aggregate),
    then candidates-only verification with ``contains`` kills the
    false positives (trigram containment does not imply substring).
    The full-text scan is avoided entirely: verification joins touch
    ~|candidates| rows. Patterns shorter than 3 chars fall back to a
    plain filter (no trigram to prune on).

    The verify predicate deliberately references the candidate side
    (``__k``) so it CANNOT be split off and pushed below the join —
    a bare ``contains(text)`` filter would be predicate-pushed onto
    the docs scan, re-scanning every document's text and defeating
    the index (pinned by
    ``test_plans.py::test_trigram_search_contains_stays_above_join``).
    """
    if len(pattern) < 3:
        return docs.where(F.col(text_col).contains(pattern))
    tris = sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})
    cand = (
        postings.where(F.col("tri").isin(tris))
        .groupBy(id_col)
        .agg(F.count_distinct("tri").alias("__k"))
        .where(F.col("__k") == len(tris))
    )
    return (
        docs.join(cand, id_col)
        .where(
            F.when(
                F.col("__k") == len(tris), F.col(text_col).contains(pattern)
            ).otherwise(F.lit(False))
        )
        .drop("__k")
    )


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram POSITIONAL postings: ``(id, pos, w)`` — one row per
    token occurrence, 0-based position. The index phrase search and
    proximity operators run on; linear in corpus tokens, built in one
    scan + posexplode (the token array is bound first, so nothing
    re-splits per element)."""
    return (
        df.select(F.col(id_col).alias("__id"), tokens_ws(F.col(text_col)).alias("__t"))
        .select("__id", F.posexplode("__t").alias("pos", "w"))
        .select(F.col("__id").alias(id_col), "pos", "w")
    )


def phrase_occurrences(
    postings: DataFrame,
    phrase: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Locate every occurrence of an n-word ``phrase`` (single row,
    columns ``w_1..w_n``) in unigram positional postings: the i-th
    word's postings are pruned by a broadcast join against the phrase
    row, then chained with n−1 equi joins on ``(id, pos + i)`` — the
    classic positional-index phrase query (Elasticsearch/Lucene
    match_phrase) as plain DataFrame ops. Returns ``(id, pos)`` of
    each match start.

    SCALE: each join key is (id, int) — narrow rows; pruned postings
    are |occurrences of word_i|, so the chain is bounded by the
    rarest word's postings, not the corpus.
    """
    words = [c for c in phrase.columns if c.startswith("w_")]
    # single-phrase contract: with >1 row the per-word broadcast
    # pruning would mix words from different phrases and report
    # positions matching NEITHER phrase — fail loudly instead
    if len(phrase.limit(2).collect()) != 1:
        raise ValueError("phrase_occurrences: phrase must be exactly one row")
    out = None
    for i, wc in enumerate(words):
        p = (
            postings.join(
                F.broadcast(phrase.select(F.col(wc).alias("__pw"))),
                postings["w"] == F.col("__pw"),
            )
            .select(F.col(id_col), (F.col("pos") - i).alias("__start"))
        )
        out = p if out is None else out.join(p, [id_col, "__start"])
    return out.select(F.col(id_col), F.col("__start").alias("pos"))


_CODE_KEYWORDS = (
    "def", "class", "import", "return", "function", "var", "const",
    "public", "void", "include",
)


def code_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    symbol_ratio_min: float = 0.03, keyword_hits_min: int = 2,
) -> DataFrame:
    """Code-vs-prose detection features per document:
    ``(id, n_chars, n_symbols, symbol_ratio, keyword_hits, is_code)``
    — symbol density over the code-punctuation class ``{}();=[]<>``
    plus whole-token hits on a fixed keyword list, flagged as code
    when BOTH the density and keyword fences pass. The standard
    curation split (code corpora are trained/filtered separately
    from prose); heuristic by design — swap thresholds per corpus.

    EXACTNESS: counts are exact ints (length arithmetic + one
    array-intersect), the ratio one correctly-rounded divide —
    oracle-checkable. SCALE: pure per-row projection, no shuffle,
    whole-stage codegen end-to-end.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_symbols = n_chars - F.length(F.regexp_replace(text, r"[{}();=\[\]<>]", ""))
    kw = F.array(*[F.lit(k) for k in _CODE_KEYWORDS])
    hits = F.size(F.array_intersect(F.array_distinct(tokens_ws(text)), kw))
    ratio = F.when(
        n_chars > 0,
        F.round(n_symbols.cast("double") / n_chars.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        n_chars.cast("long").alias("n_chars"),
        n_symbols.cast("long").alias("n_symbols"),
        ratio.alias("symbol_ratio"),
        hits.cast("long").alias("keyword_hits"),
        (
            (ratio >= F.lit(float(symbol_ratio_min)))
            & (hits >= F.lit(int(keyword_hits_min)))
        ).alias("is_code"),
    )


def blocklist_features(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 3,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Blocklist screening per document (the C4 "bad words" /
    policy-term filter): ``(id, extra…, n_tokens, bl_hits, flagged)``
    where ``bl_hits`` counts OCCURRENCES of blocklisted tokens
    (whole-token equality — substring matching flags 'scanner' for
    'scan'; don't) and ``flagged = bl_hits ≥ min_hits``. Occurrence
    counting (vs distinct-hit array_intersect) matters: one stray
    term in a long doc is noise, the same term forty times is the
    signal.

    SCALE: the blocklist ships as an ARRAY LITERAL inside a
    higher-order filter over the materialized tokens attribute —
    zero shuffle, no join, no broadcast table; the per-row cost is
    O(tokens · |terms|), fine for the hundreds-of-terms lists this
    is for (a 10⁵-term lexicon should flip to the exploded
    broadcast-join shape instead). The tokens array is staged as an
    attribute (spread + select) so the HOF lambda does not
    re-evaluate the split per element.
    """
    extras = list(extra_cols or [])
    base = spread(df.select(id_col, *extras, text_col))
    toks_df = base.select(
        id_col, *extras, tokens_ws(F.col(text_col)).alias("__toks")
    )
    # Degenerate empty blocklist: Column.isin() with zero args raises
    # inside the lambda, and "no terms" has a well-defined answer —
    # zero hits everywhere (flagged only if min_hits <= 0).
    if terms:
        hits = F.size(F.filter("__toks", lambda t: t.isin(*terms)))
    else:
        hits = F.lit(0)
    n_tokens = F.when(
        F.size("__toks") == 1, (F.element_at("__toks", 1) != "").cast("int")
    ).otherwise(F.size("__toks"))
    return toks_df.select(
        id_col,
        *extras,
        n_tokens.cast("long").alias("n_tokens"),
        hits.cast("long").alias("bl_hits"),
        (hits >= F.lit(int(min_hits))).alias("flagged"),
    )


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style composite release gate (Rae et al. 2021 §A1.1,
    public): per-document rule flags and the conjunctive ``passes``
    verdict. Rules (thresholds adapted to the short synthetic
    fixture; production values are ctor-args in spirit):

    * ``r_words``      10 ≤ word count ≤ 100000
    * ``r_mean_len``   3 ≤ mean word length ≤ 10
    * ``r_alpha``      ≥ 80% of words contain an alphabetic char
    * ``r_stop``       ≥ 2 distinct marker/stop words present
    * ``r_bigram``     top-bigram occupancy ≤ 18% of bigrams
    * ``r_trigram``    duplicated-trigram mass ≤ 30% of trigrams

    EXACTNESS: every threshold evaluates as a cross-multiplied
    INTEGER comparison (``5·n_alpha ≥ 4·n_words``, ``100·max_cnt ≤
    18·n_bigrams``) — no float ever compared, so the booleans are
    hash-exact cross-engine.

    SCALE: mapper-only, zero shuffles — the n-gram stats ride the
    same per-row sort + run-length encode as repetition_features;
    nothing leaves its input partition.
    """
    starts = (
        "case when size({b}) = 0 then array()"
        " else filter(sequence(1, size({b})),"
        "      i -> i = 1 or element_at({b}, i) != element_at({b}, i - 1)) end"
    )
    stop = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    c = F.col(text_col)
    staged = df.select(
        id_col,
        F.length(F.regexp_replace(c, r"\s", "")).alias("__chars"),
        tokens_ws(c).alias("__toks"),
    ).select(
        id_col,
        "__chars",
        F.when(
            (F.size("__toks") == 1) & (F.element_at("__toks", 1) == ""),
            F.array().cast("array<string>"),
        ).otherwise(F.col("__toks")).alias("__toks"),
    ).select(
        id_col,
        "__chars",
        F.size("__toks").alias("__nw"),
        F.size(F.filter("__toks", lambda w: w.rlike("[A-Za-z]"))).alias("__na"),
        F.size(F.array_intersect(F.array_distinct("__toks"), stop)).alias("__ns"),
        F.array_sort(ngrams("__toks", 2)).alias("__b2"),
        F.array_sort(ngrams("__toks", 3)).alias("__b3"),
    )
    rle = staged.select(
        id_col, "__chars", "__nw", "__na", "__ns",
        F.size("__b2").alias("__n2"),
        F.expr(starts.format(b="__b2")).alias("__s2"),
        F.size("__b3").alias("__n3"),
        F.expr(starts.format(b="__b3")).alias("__s3"),
        F.col("__b2"), F.col("__b3"),
    ).select(
        id_col, "__chars", "__nw", "__na", "__ns", "__n2", "__n3",
        # max run length of the sorted bigram array = top bigram count
        F.when(F.col("__n2") == 0, F.lit(0)).otherwise(
            F.array_max(F.expr(
                "transform(__s2, (s, i) -> "
                "(case when i + 1 < size(__s2) then element_at(__s2, i + 2)"
                " else size(__b2) + 1 end) - s)"
            ))
        ).alias("__top2"),
        # duplicated trigram occurrence mass = sum of runs > 1
        F.when(F.col("__n3") == 0, F.lit(0)).otherwise(
            F.aggregate(
                F.expr(
                    "transform(__s3, (s, i) -> "
                    "(case when i + 1 < size(__s3) then element_at(__s3, i + 2)"
                    " else size(__b3) + 1 end) - s)"
                ),
                F.lit(0),
                lambda acc, r: acc + F.when(r > 1, r).otherwise(F.lit(0)),
            )
        ).alias("__dup3"),
    )
    flags = rle.select(
        id_col,
        F.col("__nw").cast("long").alias("n_words"),
        ((F.col("__nw") >= 10) & (F.col("__nw") <= 100000)).alias("r_words"),
        (
            (3 * F.col("__nw") <= F.col("__chars"))
            & (F.col("__chars") <= 10 * F.col("__nw"))
        ).alias("r_mean_len"),
        (5 * F.col("__na") >= 4 * F.col("__nw")).alias("r_alpha"),
        (F.col("__ns") >= 2).alias("r_stop"),
        (100 * F.col("__top2") <= 18 * F.col("__n2")).alias("r_bigram"),
        (100 * F.col("__dup3") <= 30 * F.col("__n3")).alias("r_trigram"),
    )
    return flags.select(
        "*",
        (
            F.col("r_words") & F.col("r_mean_len") & F.col("r_alpha")
            & F.col("r_stop") & F.col("r_bigram") & F.col("r_trigram")
        ).alias("passes"),
    )


def mixed_language_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document language-consistency report: sentence-level
    marker langid, dominant language (max sentence count, tie →
    lexicographically first lang), and a ``mixed`` flag when the
    dominant share drops below 70% — code-switching / boilerplate-
    injection detection at corpus scale. Returns ``(id, n_sentences,
    dominant_lang, n_dominant, mixed)``.

    EXACTNESS: the share test is the integer comparison
    ``10·n_dominant < 7·n_sentences``. SCALE: one explode + one
    (id, lang) aggregate; the ranking window runs over the aggregated
    |docs × langs| frame (window-above-aggregate)."""
    from pyspark.sql.window import Window

    sents = split_sentences(df, text_col, id_col)
    per = (
        sents.select(F.col(id_col), lang_id("sentence").alias("__lang"))
        .groupBy(id_col, "__lang")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__n"), F.asc("__lang"))
    tot = Window.partitionBy(id_col)
    return (
        per.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_sentences", F.sum("__n").over(tot))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("n_sentences").cast("long").alias("n_sentences"),
            F.col("__lang").alias("dominant_lang"),
            F.col("__n").cast("long").alias("n_dominant"),
            (10 * F.col("__n") < 7 * F.col("n_sentences")).alias("mixed"),
        )
    )


def rake_keywords(
    df: DataFrame,
    stopwords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_phrase_len: int = 4,
    top_k: int = 50,
    score_scale: int = 10**6,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency (degree = Σ phrase length over its occurrences
    — co-occurrence within phrase incl. itself); a phrase scores the
    sum of its member word scores. Returns the corpus-level top-k:
    ``(phrase, n_occ, score_scaled)`` ordered by score desc, phrase
    asc.

    DETERMINISM: word scores are exact truncated rationals
    (deg·score_scale div freq — int64-safe while deg·scale < 2^63,
    i.e. corpus token count below ~2·10¹² at the default scale);
    phrase scores are exact long sums; the top-k total order
    (score desc, phrase asc) is unique per distinct phrase — all
    reproducible in plain SQL, so results hash-match cross-engine.

    SCALE: phrase segmentation is the gaps-and-islands idiom — ONE
    per-document window (cumulative stopword count), no self-join;
    word stats and phrase scores are hash aggregates on word/phrase
    keys; the word-score frame (|vocab| rows) broadcasts back onto
    phrase members; top-k is a distributed TakeOrdered, never a
    global sort.
    """
    from pyspark.sql.window import Window

    base = spread(df.select(id_col, text_col))
    toks = base.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens_ws(F.col(text_col))).alias("__pos", "__w"),
    )
    # empty stopword list: Column.isin() with zero args raises (the
    # blocklist_features lesson) — degrade to the empty-token boundary
    is_stop = (
        (F.col("__w").isin(list(stopwords)) | (F.length("__w") == 0))
        if stopwords
        else (F.length("__w") == 0)
    )
    w_doc = Window.partitionBy("__id").orderBy("__pos")
    marked = toks.select(
        "__id",
        "__pos",
        "__w",
        F.sum(is_stop.cast("int")).over(w_doc).alias("__ph"),
        is_stop.alias("__stop"),
    )
    members = marked.where(~F.col("__stop")).drop("__stop")
    w_ph = Window.partitionBy("__id", "__ph")
    # occ feeds the word stats AND the phrase scorer, but it is
    # CORPUS-TOKEN-scale with string payloads: checkpointing it writes
    # ~the tokenized corpus (the ADVICE-r06 novelty lesson — the
    # checkpoint becomes the bottleneck at 100 TB). The two consumers
    # share identical subplans, so AQE exchange reuse already executes
    # the tokenize+window lineage once; no cut here on purpose.
    occ = members.withColumn(
        "__plen", F.count(F.lit(1)).over(w_ph)
    ).where(F.col("__plen") <= max_phrase_len)
    wstats = occ.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    wscore = wstats.select(
        "__w",
        F.expr(f"(__deg * {score_scale}L) div __freq").alias("__ws"),
    )
    per_occ = (
        occ.join(F.broadcast(wscore), "__w")
        .groupBy("__id", "__ph")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__w"))
                    ),
                    lambda x: x["__w"],
                ),
            ).alias("phrase"),
            F.sum("__ws").alias("__score"),
        )
    )
    return (
        per_occ.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.max("__score").alias("score_scaled"),
        )
        .orderBy(F.desc("score_scaled"), F.asc("phrase"))
        .limit(top_k)
    )
