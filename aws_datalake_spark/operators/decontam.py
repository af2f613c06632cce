"""Benchmark/eval-set decontamination and exact duplicate-chunk
detection for LLM training corpora (north star, BASELINE.json).

Public method background: n-gram-overlap decontamination is the
standard published recipe (GPT-3 appendix C / PaLM §6 style — flag a
training document when too many of its n-grams appear in an eval
set); duplicate-chunk detection is the bounded-memory stand-in for
exact substring dedup (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better") — rolling k-token chunks instead of a
distributed suffix array.

100 TB design notes:
* The eval-set n-gram table is small by construction (eval sets are
  thousands of docs, not billions) → broadcast it; the corpus side is
  a single scan + one tiny (doc_id, counts) shuffle. No corpus text
  ever moves.
* duplicate_chunks shuffles (gram, doc_id) pairs — at 100 TB you
  would map grams to hash60 first so the shuffle sorts on 8-byte
  keys, and drop the gram string (keep min(gram) only when a human-
  readable report is needed). The group-by-string form here keeps the
  DuckDB oracle byte-identical; the hash-keyed form is the same plan
  shape with a narrower shuffle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_datalake_spark.operators.dedup import with_shingles
from aws_datalake_spark.operators.text import ngrams, tokens_ws


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """DISTINCT word n-grams of the eval set: one column ``__g``.
    Small by construction — callers broadcast it."""
    sh = with_shingles(eval_df, text_col=text_col, id_col=eval_df.columns[0], n=n)
    return sh.select(F.explode("__sh").alias("__g")).distinct()


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-document eval-set n-gram overlap:
    ``(id, n_shingles, n_overlap, overlap_frac, contaminated)``.

    ``overlap_frac`` = |distinct doc n-grams ∩ eval n-grams| /
    |distinct doc n-grams|; ``contaminated`` = 1 when the fraction
    reaches ``threshold``. Docs with fewer than ``n`` tokens have
    zero shingles and are never flagged.

    Plan: one corpus scan → explode_outer shingles (keeps short docs)
    → broadcast-hash left join against the eval n-gram set (marker
    column) → one (id, n_shingles) count shuffle. The broadcast join
    means contamination checking is scan-bound at any corpus size.
    """
    from aws_datalake_spark.operators.dedup import with_hashed_shingles
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # both sides reduce to int64 xxhash64 token-n-gram values
    # (with_hashed_shingles): the broadcast set holds 8-byte keys, the
    # checkpoint stores long arrays, and the probe joins longs — the
    # overlap COUNT is what the output needs, which an
    # injective-in-practice hash preserves
    ev = F.broadcast(
        with_hashed_shingles(
            eval_df, text_col=text_col, id_col=eval_df.columns[0], n=n
        )
        .select(F.explode("__sh").alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # materialized so the explode_outer does not re-evaluate the
    # shingle transform per gram (see dedup.source_overlap note)
    sh = _truncate(
        with_hashed_shingles(corpus, text_col=text_col, id_col=id_col, n=n)
    )
    exploded = sh.select(
        id_col,
        F.size("__sh").alias("n_shingles"),
        F.explode_outer("__sh").alias("__g"),
    )
    counted = (
        exploded.join(ev, "__g", "left")
        .groupBy(id_col, "n_shingles")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"))
    )
    frac = F.round(
        F.col("n_overlap").cast("double")
        / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
        6,
    )
    return counted.select(
        id_col,
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.col("n_overlap").cast("int").alias("n_overlap"),
        frac.alias("overlap_frac"),
        F.when(frac >= F.lit(threshold), F.lit(1)).otherwise(F.lit(0)).alias("contaminated"),
    )


def duplicate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Exact k-token chunks appearing in ≥ ``min_docs`` DISTINCT
    documents: ``(chunk, n_docs, n_occurrences)``.

    Rolling (positional, WITH duplicates) k-grams approximate
    suffix-array substring dedup with bounded state: a duplicated
    passage of length L ≥ k surfaces as L−k+1 duplicated chunks.

    Hash-first plan: the wide chunk TEXT never rides the main
    shuffle — pass 1 shuffles only ``(xxhash64(chunk), id)`` (8-byte
    keys, ~5× smaller; SHUFFLE.md) to find duplicated hashes; pass 2
    re-emits grams, keeps only those whose hash is duplicated
    (broadcast semi-filter), and re-counts the survivors BY TEXT —
    so a hash collision can only add a candidate that the exact
    final count then filters out, never corrupt a count. Duplicate
    chunks are rare by mass at any scale, so pass 2's shuffle is
    tiny and the result stays exact.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.text import spread

    # token array materialized ONCE before the explodes (PERF §21:
    # Generate re-evaluates inlined interpreted transforms per OUTPUT
    # element). The checkpoint stores TOKENS, not k-gram strings — the
    # gram-string form was k× the text bytes through checkpoint
    # write+read. Pass 1 never builds a string at all: it hashes the
    # k token columns directly (xxhash64(t_i..t_{i+k-1}), the
    # with_hashed_shingles device) and shuffles only (hash, id).
    toks_arr = _truncate(
        spread(df.select(id_col, text_col)).select(
            id_col, tokens_ws(F.col(text_col)).alias("__toks")
        )
    )
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1)))
    hash_arr = F.when(
        F.size(toks) >= k,
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    dup_hashes = (
        toks_arr.select(id_col, F.explode(hash_arr).alias("__h"))
        .groupBy("__h")
        .agg(F.countDistinct(id_col).cast("int").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    # pass 2: grams with their tuple-hash, broadcast semi-filter on
    # the hash, exact final count BY TEXT (a hash collision can only
    # add a candidate the exact count then filters out)
    gram_structs = F.when(
        F.size(toks) >= k,
        F.transform(
            idx,
            lambda i: F.struct(
                F.xxhash64(
                    *[F.element_at(toks, i + j + 1) for j in range(k)]
                ).alias("h"),
                F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
                ).alias("chunk"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<h:bigint,chunk:string>>"))
    grams = toks_arr.select(
        id_col, F.explode(gram_structs).alias("__g")
    ).select(id_col, F.col("__g.h").alias("__gh"), F.col("__g.chunk").alias("chunk"))
    candidates = grams.join(
        F.broadcast(dup_hashes), grams["__gh"] == F.col("__h")
    )
    return (
        candidates.groupBy("chunk")
        .agg(
            F.countDistinct(id_col).cast("int").alias("n_docs"),
            F.count(F.lit(1)).cast("int").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def excise_contaminated_spans(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Span-LEVEL decontamination (the C4/FLAN-style removal step,
    where :func:`decontaminate` is the doc-level flag): every
    position whose n-gram appears in the eval set marks tokens
    [p, p+n-1] for removal; the document is rebuilt WITHOUT the
    contaminated tokens instead of being dropped whole. Returns
    ``(id, n_tokens, n_removed, clean_text)`` for every corpus doc.

    Plan: corpus scan → positional n-grams (bound token array — the
    higher-order transforms never re-split text; the gram ARRAY is
    materialized before the explode because Generate re-evaluates an
    inlined interpreted transform per OUTPUT element, PERF §14/§21)
    → broadcast-hash join against the eval n-gram set → matched
    positions fan out to their covered token indices and collect_set
    per doc (bounded by doc length) → one co-partitioned join back
    rebuilds the text token-filtered. No corpus text ever shuffles
    except the final doc-sized rebuild join; eval grams broadcast
    (small by construction, see module docstring).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    toks = corpus.select(
        F.col(id_col).alias("__id"), tokens_ws(F.col(text_col)).alias("__t")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("__t") - n, F.lit(-1)))
    grams = F.when(
        F.size("__t") >= n,
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("p"),
                F.concat_ws(
                    " ", *[F.element_at(F.col("__t"), i + j + 1) for j in range(n)]
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,g:string>>"))
    grams_arr = _truncate(toks.select("__id", grams.alias("__pgs")))
    pos_grams = grams_arr.select("__id", F.explode("__pgs").alias("pg")).select(
        "__id", F.col("pg.p").alias("p"), F.col("pg.g").alias("__g")
    )
    ev = F.broadcast(eval_ngram_set(eval_df, text_col, n))
    removed = (
        pos_grams.join(ev, "__g")
        .select("__id", F.explode(F.sequence(F.col("p"), F.col("p") + n - 1)).alias("i"))
        .groupBy("__id")
        .agg(F.collect_set("i").alias("__rm"))
    )
    rebuilt = toks.join(removed, "__id", "left").select(
        "__id",
        "__t",
        F.coalesce("__rm", F.array().cast("array<int>")).alias("__rm"),
    )
    kept = F.filter(
        F.col("__t"), lambda x, i: ~F.array_contains(F.col("__rm"), i.cast("int"))
    )
    return rebuilt.select(
        F.col("__id").alias(id_col),
        F.size("__t").cast("long").alias("n_tokens"),
        F.size("__rm").cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def excise_repeated_spans(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Cross-document repeated-SPAN excision — the ExactSubstr dedup
    shape (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): any k-token window whose content
    appears in MORE THAN ONE document is removed from every document
    except a canonical keeper (min doc_id), and each document is
    rebuilt from its surviving tokens. Sentence- and span-level
    boilerplate (licence headers, navigation chrome, syndicated
    paragraphs) dies here while the documents themselves survive —
    the complement of whole-doc near-dup removal. Returns
    ``(id, n_tokens, n_excised, clean_text)`` for every input doc.

    Deviation from the paper's suffix-array formulation, by design:
    duplication is detected at fixed k-token granularity (a shared
    span of length L ≥ k is covered by its L−k+1 windows, so the
    excised region converges on the true span), and the keeper doc
    keeps ALL its occurrences — deterministic, join-expressible, and
    oracle-checkable, where a distributed suffix array is none of
    those.

    SCALE: positional k-grams reduce to 8-byte hash60 values INSIDE
    the gram array, which is materialized before the explode — gram
    strings never leave the map side, the checkpoint writes (p, hash)
    structs, and Generate explodes an attribute (an inlined
    interpreted transform would re-evaluate per OUTPUT element,
    PERF §14/§21). The duplicate table aggregates (doc, hash)-distinct
    rows (map-combinable); matched positions fan out to covered
    indices and collect_set per doc (bounded by doc length); one
    co-partitioned join rebuilds the text. Raw text shuffles only in
    the final doc-sized rebuild join — the same posture as
    :func:`excise_contaminated_spans`.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.text import hash60

    toks = corpus.select(
        F.col(id_col).alias("__id"), tokens_ws(F.col(text_col)).alias("__t")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("__t") - k, F.lit(-1)))
    grams = F.when(
        F.size("__t") >= k,
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("p"),
                F.concat_ws(
                    " ", *[F.element_at(F.col("__t"), i + j + 1) for j in range(k)]
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,g:string>>"))
    grams_h = F.transform(
        grams, lambda s: F.struct(s["p"].alias("p"), hash60(s["g"]).alias("h"))
    )
    grams_arr = _truncate(toks.select("__id", grams_h.alias("__pgs")))
    pos_grams = grams_arr.select("__id", F.explode("__pgs").alias("pg")).select(
        "__id", F.col("pg.p").alias("p"), F.col("pg.h").alias("__h")
    )
    dup = (
        pos_grams.select("__id", "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"), F.min("__id").alias("__keeper"))
        .filter(F.col("__nd") > 1)
        .select("__h", "__keeper")
    )
    removed = (
        pos_grams.join(dup, "__h")
        .filter(F.col("__id") != F.col("__keeper"))
        .select(
            "__id", F.explode(F.sequence(F.col("p"), F.col("p") + k - 1)).alias("i")
        )
        .groupBy("__id")
        .agg(F.collect_set("i").alias("__rm"))
    )
    rebuilt = toks.join(removed, "__id", "left").select(
        "__id",
        "__t",
        F.coalesce("__rm", F.array().cast("array<int>")).alias("__rm"),
    )
    kept = F.filter(
        F.col("__t"), lambda x, i: ~F.array_contains(F.col("__rm"), i.cast("int"))
    )
    return rebuilt.select(
        F.col("__id").alias(id_col),
        F.size("__t").cast("long").alias("n_tokens"),
        F.size("__rm").cast("long").alias("n_excised"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def contamination_coverage(
    corpus: DataFrame,
    eval_df: DataFrame,
    k: int = 3,
    corpus_id: str = "doc_id",
    eval_id: str = "eval_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-EVAL-document contamination report: the fraction of each
    eval doc's distinct k-gram shingles that appear anywhere in the
    training corpus — ``(eval_id, n_grams, n_hit, coverage)``. The
    complement of :func:`decontaminate`'s corpus-side filter: here
    the EVAL SUITE is audited (which benchmark items leak, and how
    fully) so a contaminated eval can be repaired before it
    mismeasures the model.

    SCALE: the corpus reduces to DISTINCT 8-byte hash60 grams — one
    exchange of longs, text never moves; the eval side is small by
    construction (benchmarks are thousands of docs) and joins the
    gram set with a semi-join marker. Work is scan-bound in the
    corpus at any size. Hash collisions overcount hits by
    ~|grams|²/2^61 — negligible below billions of distinct grams
    (same adjudication as containment_pairs).
    """
    from aws_datalake_spark.operators.dedup import with_shingles
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.text import hash60

    # hash60 INSIDE the array, then materialize BEFORE the explode:
    # Generate re-evaluates an inlined interpreted transform per
    # OUTPUT element (PERF §14/§21 — measured 107.9 s → linear-const
    # at sf1 when this staging landed); the staged frame is
    # (id, array<long>), ~8 bytes/gram, never gram strings
    c_arr = _truncate(
        with_shingles(corpus, text_col, corpus_id, k).select(
            F.transform("__sh", lambda s: hash60(s)).alias("__sh")
        )
    )
    c_grams = c_arr.select(F.explode("__sh").alias("__h")).distinct()
    e_arr = _truncate(
        with_shingles(eval_df, text_col, eval_id, k).select(
            F.col(eval_id),
            F.transform("__sh", lambda s: hash60(s)).alias("__sh"),
        )
    )
    e_grams = e_arr.select(eval_id, F.explode("__sh").alias("__h"))
    hits = (
        e_grams.join(
            c_grams.select(F.col("__h"), F.lit(1).alias("__hit")), "__h", "left"
        )
        .groupBy(eval_id)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"),
        )
    )
    # docs too short for any k-gram still get a row (coverage 0.0)
    base = eval_df.select(F.col(eval_id)).distinct()
    return (
        base.join(hits, eval_id, "left")
        .select(
            eval_id,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.col("n_hit").cast("double") / F.col("n_grams").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("coverage"),
        )
    )
