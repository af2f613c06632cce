"""Deduplication operators for LLM data pipelines (north star,
BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

100 TB design notes:
* Exact dedup groups on a 60-bit content hash, not the raw text —
  the shuffle moves 8-byte keys instead of documents.
* MinHash signatures are computed per-partition with array
  expressions (no UDF, no shuffle); only the banded bucket join
  shuffles, and it shuffles (band_id, band_hash) pairs — tiny.
* Candidate verification joins only within buckets; the quadratic
  blow-up is bounded per bucket, and AQE's skew-join handles hot
  buckets (e.g. boilerplate documents).
* SimHash reduces each doc to one int64; near-dup candidates come
  from banding the bits, verification is a popcount — no text moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_datalake_spark.operators.text import hash60, tokens_ws

# Mersenne prime 2^31-1: the affine-rehash modulus. a_k*h + b_k stays
# below 2^62, so the arithmetic is exact in int64 on both Spark and
# the DuckDB oracle.
M31 = (1 << 31) - 1


def affine_params(k: int) -> tuple[int, int]:
    """Deterministic per-hash affine coefficients (a_k, b_k) for the
    universal-hash family h_k(x) = (a_k*x + b_k) mod 2^31-1. Shared
    with the DuckDB oracles (queries/llm_dedup.py builds the same
    constants), so signatures match bit-for-bit."""
    a = (k * 2654435761 + 1) % M31 or 1
    b = (k * 40503 + 17) % M31
    return a, b


# --- exact -------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per identical text. The group
    key is hash60(text); the (tiny) collision risk is acceptable for
    train-data dedup — swap in sha2-256 grouping for exactness."""
    return (
        df.withColumn("__h", hash60(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


# --- shingles / minhash -------------------------------------------------------

def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) over a BOUND tokens-array
    attribute. IMPORTANT: pass a materialized column (see
    with_shingles), not an inline split expression — higher-order
    functions evaluate interpreted, and an inlined split would be
    re-evaluated per element (O(tokens²) regexp work per row)."""
    toks = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, out: str = "__sh",
) -> DataFrame:
    """(id, shingle-array) in two staged projections so the tokens
    array is an attribute when the shingle lambda indexes it. The
    multi-reference of each non-cheap alias stops CollapseProject
    from re-inlining, keeping evaluation O(tokens) per row."""
    from aws_datalake_spark.operators.text import spread

    base = spread(df.select(id_col, text_col))
    toks_df = base.select(id_col, tokens_ws(F.col(text_col)).alias("__toks"))
    return toks_df.select(id_col, shingles("__toks", n).alias(out))


def with_hashed_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, out: str = "__sh",
) -> DataFrame:
    """(id, distinct int64 shingle array): xxhash64 over the n token
    columns DIRECTLY — no gram string is ever materialized, and the
    distinct pass dedups 8-byte longs instead of strings. Set
    semantics are identical to hashing the distinct gram strings
    (whitespace tokens cannot contain the joiner, so the string form
    was injective too; collisions ~|grams|²/2^65). For consumers that
    only need set cardinalities/intersections (jaccard, containment),
    never the gram text."""
    from aws_datalake_spark.operators.text import spread

    base = spread(df.select(id_col, text_col))
    toks_df = base.select(id_col, tokens_ws(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    arr = F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )
    return toks_df.select(id_col, arr.alias(out))


def _capped_pair_counts(
    sh: DataFrame, max_df: int, a_name: str, b_name: str, ordered: bool = False
) -> DataFrame:
    """CANONICAL (a < b) candidate pairs WITH their exact shared-gram
    count ``(a, b, n_common)``, never touching the full shingle
    arrays. n_common is symmetric, so directional consumers
    (containment) derive both orientations from the one canonical row
    downstream instead of doubling the count work here (``ordered``
    is kept only as an explicit mirror for callers that cannot).

    Candidates come from grams with document frequency ≤ max_df,
    WITHOUT a postings self-join: after the freq filter each gram's
    posting list is ≤ max_df ids, so pairs expand in-memory per gram
    (≤ K²/2 structs) from one collect_list whose groupBy reuses the
    freq join's hash partitioning — one exchange replaces the two
    self-join exchanges.

    Exact verification WITHOUT shipping both full shingle arrays
    through the candidate join (the r10 plan broadcast the whole
    (id, array<long>) table twice): rare and hot grams partition the
    gram domain, so |S_a ∩ S_b| = shared-rare + shared-hot. The
    shared-RARE count per pair falls out of the pair expansion
    itself (a pair surfaces once per shared rare gram — groupBy
    count instead of dropDuplicates, same exchange); shared-HOT
    grams (df > max_df — few distinct by construction) are counted
    by probing only the CANDIDATES' hot postings with narrow
    (id, gram-hash) rows."""
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__f"))
    rare = sh.join(freq.where(F.col("__f") <= int(max_df)), "s")
    groups = rare.groupBy("s").agg(F.collect_list("__id").alias("__ids"))
    ids = F.col("__ids")
    # counts are computed ONCE on canonical a < b pairs (n_common is
    # symmetric); the ordered form mirrors afterwards — halves the
    # expansion rows, the dedup exchange, and the hot-probe volume
    pair_arr = F.filter(
        F.flatten(
            F.transform(
                ids,
                lambda x: F.transform(
                    ids, lambda y: F.struct(x.alias("a"), y.alias("b"))
                ),
            )
        ),
        lambda p: p["a"] < p["b"],
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # cand feeds the hot-gram probe AND the final left join — cut it,
    # or the whole expansion/dedup pipeline runs twice (bounded:
    # ≤ Σ_gram K²/2 pairs by construction)
    cand = _truncate(
        groups.select(F.explode(pair_arr).alias("__p"))
        .select(
            F.col("__p.a").alias(a_name), F.col("__p.b").alias(b_name)
        )
        .groupBy(a_name, b_name)
        .agg(F.count(F.lit(1)).alias("__c_rare"))
    )
    hot = sh.join(freq.where(F.col("__f") > int(max_df)), "s").select(
        "__id", "s"
    )
    c_hot = (
        cand.select(a_name, b_name)
        .join(hot.withColumnRenamed("__id", a_name), a_name)
        .join(hot.select(F.col("__id").alias(b_name), "s"), [b_name, "s"])
        .groupBy(a_name, b_name)
        .agg(F.count(F.lit(1)).alias("__c_hot"))
    )
    out = cand.join(c_hot, [a_name, b_name], "left").select(
        a_name,
        b_name,
        (
            F.col("__c_rare") + F.coalesce(F.col("__c_hot"), F.lit(0))
        ).alias("n_common"),
    )
    if ordered:
        # cut before mirroring: the union reads the counts twice
        out = _truncate(out)
        out = out.unionByName(
            out.select(
                F.col(b_name).alias(a_name),
                F.col(a_name).alias(b_name),
                "n_common",
            )
        )
    return out


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature via one base hash per shingle plus an affine
    universal-hash family: sig_k = min over shingles of
    (a_k * (hash60(s) mod 2^31-1) + b_k) mod 2^31-1.

    One md5 per shingle regardless of num_hashes — adding signature
    width costs only integer multiply-adds, so 128-hash signatures at
    100 TB stay scan-bound. Empty shingle sets get NULL sigs
    (array_min of an empty array)."""
    sh_df = with_shingles(df, text_col, id_col, shingle_n)
    base = sh_df.select(
        id_col, F.transform(F.col("__sh"), lambda s: hash60(s) % F.lit(M31)).alias("__hs")
    )
    cols = []
    for k in range(num_hashes):
        a, b = affine_params(k)
        cols.append(
            F.array_min(
                F.transform(F.col("__hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(M31))
            ).alias(f"sig_{k}")
        )
    return base.select(id_col, *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs.

    signature → band (rows_per_band sigs md5-combined) →
    self-join on (band_id, band_hash) → distinct candidate pairs →
    exact Jaccard verification on shingle sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    rows_per_band = num_hashes // bands
    # Materialize the shingle table ONCE: signatures, and both sides
    # of the verification join, all read from it. Without this the
    # tokenize+shingle lineage executes three times (once under the
    # signature pass, once per verification side). At 100 TB the
    # materialized shingles are corpus-sized — localCheckpoint spills
    # to executor-local disk (or reliable checkpoint when a dir is
    # set), the standard recompute-vs-store trade for a 3× scan win.
    # The stored arrays are the 60-bit hash60 VALUES, not the gram
    # strings: the oracle-pinned md5 is computed exactly once per
    # gram here, the signature pass folds over longs, and the exact
    # verification intersects long sets (same cardinalities as the
    # string sets — 60-bit collisions ~|pair grams|²/2^61).
    sh_base = _truncate(
        with_shingles(df, text_col, id_col, shingle_n).select(
            id_col,
            F.transform(F.col("__sh"), lambda s: hash60(s)).alias("__sh"),
        )
    )
    base = sh_base.select(
        id_col,
        F.transform(F.col("__sh"), lambda h: h % F.lit(M31)).alias("__hs"),
    )
    sig_cols = []
    for k in range(num_hashes):
        a_k, b_k = affine_params(k)
        sig_cols.append(
            F.array_min(
                F.transform(
                    F.col("__hs"), lambda h: (F.lit(a_k) * h + F.lit(b_k)) % F.lit(M31)
                )
            ).alias(f"sig_{k}")
        )
    sig = base.select(id_col, *sig_cols)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.md5(F.concat_ws("|", *[p.cast("string") for p in parts])).alias(f"band_{b}")
        )
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band_id", "bb.band_hash")
    a = melted.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = melted.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    cand = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Verification reads the SAME materialized shingle table — no
    # recompute on either join side.
    sh = sh_base.withColumnRenamed(id_col, "__id")
    cand = (
        cand.join(sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1.0)), 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- n-gram jaccard (exact all-pairs via inverted index) ----------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
    prefix_filter: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs: jaccard = common / (|a| + |b| −
    common) for every pair with jaccard ≥ threshold.

    Default path: plain inverted-index join — explode shingles,
    self-join on shingle, count common per pair. Linear in corpus
    shingle volume; only pairs that actually share a shingle appear.

    ``prefix_filter=True`` switches to the classic set-similarity-
    join bound: order each doc's shingles by ascending global
    frequency; a pair with Jaccard ≥ t must share ≥ ⌈t·|A|⌉
    shingles, so it must share one inside each side's first
    |A| − ⌈t·|A|⌉ + 1 rarest shingles — only those prefix postings
    enter the candidate self-join, and candidates are re-verified
    exactly with array_intersect (output identical to the naive
    index, asserted in tests). WHEN TO FLIP IT: corpora whose
    posting lists are skewed (stopword-like shingles indexing huge
    lists) and thresholds high enough to shrink the prefix —
    measured on this uniform fixture at t=0.2 it is ~13% SLOWER
    (PERF.md anti-case 3): the prefix keeps 80% of postings while
    adding a frequency join and a per-doc sort. The bound's win is
    skew-dependent, not universal.

    ``max_df=K`` (stop-gram cap, composable with the default path):
    candidate pairs are generated ONLY from grams whose document
    frequency is ≤ K; each candidate is then verified EXACTLY on the
    full shingle arrays. This is the production bound for the
    quadratic hot-gram case (a boilerplate gram indexing D docs
    yields D²/2 candidate pairs on its own): candidates per gram are
    capped at K²/2. Recall caveat: a qualifying pair whose EVERY
    shared gram is hotter than K is missed — real near-dups share
    rare grams, so K at a few thousand loses nothing in practice
    (the pinned test constructs both cases). The r05 scaling curve's
    one flagged exponent (1.24 at sf1) is this hot-gram case made
    total by the fixture's 30-word vocabulary — every bigram is hot,
    so candidate growth is genuinely quadratic and only a cap (or a
    bigger vocabulary) bounds it.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    if max_df is not None and prefix_filter:
        raise ValueError(
            "ngram_jaccard_pairs: max_df and prefix_filter are mutually "
            "exclusive candidate-generation strategies; pick one"
        )

    # materialized once: both explode sides and the prefix path read
    # the same shingle table, and the explode does not re-evaluate
    # the shingle transform per gram (see source_overlap note).
    # Shingles are int64 xxhash64 values from birth
    # (with_hashed_shingles): no gram string is ever built, and the
    # postings aggregates, candidate generation and array_intersect
    # verification all move 8-byte longs — jaccard depends only on
    # set cardinalities, which an injective-in-practice hash
    # preserves (collision odds ~|grams|²/2^65).
    sh_arr = _truncate(
        with_hashed_shingles(df, text_col, id_col, shingle_n).select(
            F.col(id_col).alias("__id"), F.col("__sh")
        )
    )
    if max_df is not None:
        sh = sh_arr.select("__id", F.explode("__sh").alias("s"))
        # exact n_common per candidate from narrow postings (rare
        # count from the pair expansion + hot-gram probe); only the
        # (id, n) size table joins back — the full shingle arrays
        # never cross a join
        cand = _capped_pair_counts(
            sh, int(max_df), "id_a", "id_b", ordered=False
        )
        sizes = sh_arr.select("__id", F.size("__sh").alias("n_sh"))
        cand = cand.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        ).join(
            sizes.select(F.col("__id").alias("id_b"), F.col("n_sh").alias("n_b")),
            "id_b",
        )
        n_common = F.col("n_common")
        return (
            cand.withColumn(
                "jaccard",
                F.round(
                    n_common.cast("double")
                    / (F.col("n_a") + F.col("n_b") - n_common).cast("double"),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    if not prefix_filter:
        sh = sh_arr.select("__id", F.explode("__sh").alias("s"))
        # arrays are distinct sets: |S| is the stored array length —
        # no second explode+aggregate pass
        sizes = sh_arr.select("__id", F.size("__sh").alias("n_sh"))
        a = sh.select(F.col("__id").alias("id_a"), "s")
        b = sh.select(F.col("__id").alias("id_b"), "s")
        common = (
            a.join(b, "s")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        out = (
            common.join(
                sizes.select(F.col("__id").alias("id_a"), F.col("n_sh").alias("n_a")),
                "id_a",
            )
            .join(
                sizes.select(F.col("__id").alias("id_b"), F.col("n_sh").alias("n_b")),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        return out.select("id_a", "id_b", "jaccard")

    sh = sh_arr.select("__id", F.explode("__sh").alias("s"))
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__f"))
    # per-doc shingles in ascending global-frequency order (shingle
    # tiebreak → total order, same order for every doc)
    ordered = (
        sh.join(freq, "s")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__f"), F.col("s")))
            ).alias("__ord"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        .select(
            "__id",
            F.expr("transform(__ord, x -> x.s)").alias("__set"),
            "n_sh",
        )
        .select(
            "__id",
            "__set",
            "n_sh",
            F.expr(
                "slice(__set, 1, cast(n_sh - ceil(cast(n_sh as double) * "
                f"{float(threshold)}) + 1 as int))"
            ).alias("__prefix"),
        )
    )
    # postings carry IDs ONLY — the wide set arrays would otherwise be
    # replicated once per prefix shingle through the join; they rejoin
    # per CANDIDATE PAIR after dedup, which is the small side
    pa = ordered.select(F.col("__id").alias("id_a"), F.explode("__prefix").alias("s"))
    pb = ordered.select(F.col("__id").alias("id_b"), F.explode("__prefix").alias("s"))
    cand = (
        pa.join(pb, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets_a = ordered.select(
        F.col("__id").alias("id_a"), F.col("__set").alias("__sa"), F.col("n_sh").alias("n_a")
    )
    sets_b = ordered.select(
        F.col("__id").alias("id_b"), F.col("__set").alias("__sb"), F.col("n_sh").alias("n_b")
    )
    cand = cand.join(sets_a, "id_a").join(sets_b, "id_b")
    n_common = F.size(F.array_intersect("__sa", "__sb"))
    out = cand.withColumn(
        "jaccard",
        F.round(
            n_common.cast("double")
            / (F.col("n_a") + F.col("n_b") - n_common).cast("double"),
            6,
        ),
    ).filter(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", "jaccard")


# --- simhash ------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Count-weighted SimHash over whitespace tokens: bit j of the
    output is 1 iff sum over tokens of count * (±1 per token-hash
    bit j) is positive.

    Per-token bit votes are ``bits`` narrow long columns summed by an
    ordinary grouped aggregation — partial (map-side) combine keeps
    per-group state at ``bits`` longs regardless of how many tokens a
    document has (a collect_list fold would materialize every
    token's votes per doc — unbounded memory on token-heavy docs),
    and the whole plan stays in codegen. Two shuffles total (token
    counts, doc vote sums); integer sums are order-independent so the
    SQL oracle's per-bit formulation matches bit-for-bit."""
    from aws_datalake_spark.operators.text import spread

    base = spread(df.select(F.col(id_col).alias("__id"), text_col))
    toks = base.select("__id", F.explode(tokens_ws(F.col(text_col))).alias("w"))
    tok_counts = toks.groupBy("__id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = tok_counts.select(
        "__id", "cnt", hash60(F.col("w")).alias("__h")
    )
    contrib = hashed.select(
        "__id",
        *[
            F.when(
                F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
            ).otherwise(-F.col("cnt")).cast("long").alias(f"__v{b}")
            for b in range(bits)
        ],
    )
    summed = contrib.groupBy("__id").agg(
        *[F.sum(f"__v{b}").alias(f"__s{b}") for b in range(bits)]
    )
    sim = None
    for b in range(bits):
        term = F.when(
            F.col(f"__s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return summed.select(F.col("__id").alias(id_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — bit_count is a Spark built-in."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = 32, max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-limited
    by banding the hash into 4 bit-slices (two docs within hamming d
    share at least one identical slice when d < 4)."""
    sh = simhash(df, text_col, id_col, bits)
    slice_bits = bits // 4
    mask = (1 << slice_bits) - 1
    slices = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("slice_id"),
                    F.shiftright(F.col("simhash"), i * slice_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("slice_val"),
                )
                for i in range(4)
            ])
        ).alias("sl"),
    ).select(id_col, "simhash", "sl.slice_id", "sl.slice_val")
    a = slices.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "slice_id", "slice_val")
    b = slices.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "slice_id", "slice_val")
    return (
        a.join(b, ["slice_id", "slice_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def edit_distance_verify(
    pairs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio: float = 0.2,
) -> DataFrame:
    """Verify near-dup candidate pairs with EXACT Levenshtein
    distance: ``(id_a, id_b, edit_distance, edit_ratio)`` where
    edit_ratio = lev / max(len_a, len_b). Integer edit distance is
    engine-portable bit-for-bit (no float/hash approximation), making
    it the gold verification after a probabilistic candidate stage
    (MinHash/SimHash).

    SCALE: runs on the LSH-bounded candidate set only — never
    all-pairs. The two joins ship text just for candidate ids
    (left-semi-sized); O(len_a·len_b) DP cost per pair is the
    verification budget, so cap document length upstream (truncate
    or compare fingerprint windows) for very long docs."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein("__ta", "__tb")
    ratio = F.round(
        dist.cast("double")
        / F.greatest(F.length("__ta"), F.length("__tb"), F.lit(1)).cast("double"),
        6,
    )
    return j.select(
        "id_a", "id_b", dist.alias("edit_distance"), ratio.alias("edit_ratio")
    ).filter(F.col("edit_ratio") <= max_ratio)


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 2,
    sample_mod: int = 1,
) -> DataFrame:
    """Cross-source n-gram overlap matrix — the curation diagnostic
    for contamination/duplication BETWEEN corpus sources (two crawls
    of the same sites, a dataset repackaged under a new name): for
    every source pair, the count of shared distinct shingle hashes
    and the containment ratio in each direction
    (``overlap / |source|``). High containment_a means source_a is
    largely a subset of source_b — drop or down-weight it.

    SCALE: shingles reduce to 8-byte hash60 values at the scan and
    dedupe per source BEFORE the pair join, so the join input is
    bounded by distinct (source, gram) pairs — text never shuffles.
    The gram self-join fans out only where a gram spans multiple
    sources (≤ |sources| per gram, and |sources| is small). For
    100 TB corpora set ``sample_mod=k`` to keep a deterministic
    1/k hash-sample of grams (``hash60(gram) % k == 0`` — the same
    content-stable discipline as sampling.hash_uniform): counts
    scale by ~1/k, containment RATIOS stay unbiased, and the whole
    diagnostic is scan-bound at any corpus size.

    Returns ``(source_a, source_b, overlap, containment_a,
    containment_b)`` for pairs with overlap > 0; ratios are double
    quotients of exact integers — IEEE-754 division of identical
    int operands is bit-identical across engines, so no rounding
    is needed for oracle parity.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # materialize the shingle arrays BEFORE the explode: Generate
    # re-evaluates an inlined interpreted transform per OUTPUT
    # element, turning O(tokens) shingling into O(tokens x grams)
    # (measured 57 s -> 0.4 s for this stage at sf1, PERF.md section 14)
    sh = _truncate(with_shingles(df, text_col, source_col, shingle_n))
    grams = sh.select(F.col(source_col).alias("__src"), F.explode("__sh").alias("__s"))
    h = grams.select("__src", hash60(F.col("__s")).alias("__h"))
    if sample_mod > 1:
        h = h.filter(F.col("__h") % sample_mod == 0)
    # the distinct (source, hash) set feeds THREE consumers (sizes +
    # both self-join sides) — truncate lineage once so the corpus is
    # tokenized/hashed once, not three times (minhash_lsh_pairs
    # discipline); the materialized set is 8-byte hashes, tiny
    sets = _truncate(h.distinct())
    sizes = sets.groupBy("__src").agg(F.count(F.lit(1)).alias("__n"))
    a = sets.select(F.col("__src").alias("source_a"), "__h")
    b = sets.select(F.col("__src").alias("source_b"), "__h")
    com = (
        a.join(b, "__h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        com.join(
            F.broadcast(sizes.select(F.col("__src").alias("source_a"),
                                     F.col("__n").alias("__na"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("__src").alias("source_b"),
                                     F.col("__n").alias("__nb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "overlap",
            (F.col("overlap").cast("double") / F.col("__na").cast("double"))
            .alias("containment_a"),
            (F.col("overlap").cast("double") / F.col("__nb").cast("double"))
            .alias("containment_b"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every positional k-gram, slide a window of
    ``w`` consecutive gram hashes, and keep the minimum of each
    window — a deterministic ~1/w-density selection with the
    guarantee that any match of length ≥ k + w − 1 tokens between
    two documents shares at least one selected fingerprint. The
    standard local fingerprinting scheme for plagiarism /
    contamination detection.

    Documents with fewer than ``w`` grams keep the minimum over all
    their grams (one whole-document window), so every document with
    ≥ 1 gram yields ≥ 1 fingerprint.

    SCALE: entirely array ops per row — tokenize, positional gram
    hashes, per-position slice-min — so the selection is
    partition-parallel with NO shuffle and no window sort; the only
    exchange is the final per-doc ``distinct``, over 8-byte selected
    hashes (~grams/w rows per doc), never text. The O(w) slice work
    per position is a constant factor (w is 4–16 in practice).
    Downstream pair-detection joins on ``fp`` should cap hot
    fingerprints with a max-df guard exactly like
    :func:`ngram_jaccard_pairs` — min-selection biases fingerprints
    toward globally small hash values, so the df skew is worse than
    for raw grams.

    Returns distinct ``(id_col, fp)`` rows.
    """
    from aws_datalake_spark.operators.text import spread

    base = spread(df.select(id_col, text_col))
    toks = base.select(id_col, tokens_ws(F.col(text_col)).alias("__toks"))
    # gram hash at 0-based position i (valid while i + k <= n_tokens);
    # staged selects keep each array a bound attribute so lambdas
    # evaluate O(n) per row, not O(n^2) (see with_shingles)
    n_tok = F.size(F.col("__toks"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("__toks"), i + j + 1) for j in range(k)]
    )
    # guard: Spark's sequence(0, stop) REVERSES when stop < 0, so an
    # under-k-token doc must short-circuit to an empty hash array.
    # The no-gram filter is the CHEAP equivalent predicate n_tok >= k,
    # NOT size(__hs) >= 1: a filter phrased on __hs inlines the whole
    # md5 transform and Catalyst pushes it below the spread() exchange
    # onto the 1-partition scan — the entire gram hashing then runs
    # twice, once single-threaded (measured 9.2 s -> 1.3 s at sf0.1,
    # PERF.md §18; same family as the trigram pushdown trap).
    hs = toks.where(n_tok >= k).select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), n_tok - k),
            lambda i: hash60(gram(i)),
        ).alias("__hs"),
    )
    n_gram = F.size(F.col("__hs"))
    # windows start at 0-based i for i < max(G - w + 1, 1); each is
    # min over the w hashes from i (slice is 1-based, clamped at G)
    fps = hs.select(
        id_col,
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(n_gram - w, F.lit(0)),
            ),
            lambda i: F.array_min(
                F.slice(
                    F.col("__hs"), i + 1,
                    F.least(F.lit(w), n_gram - i),
                )
            ),
        ).alias("__fps"),
    )
    # materialization barrier before the explode: Generate inlines an
    # interpreted transform and re-evaluates it per OUTPUT element,
    # turning the O(grams·w) selection into O(grams²·w) md5 work
    # (measured 136 s -> 2 s for the full operator at sf0.001 — the
    # same trap source_overlap/minhash hit; see _truncate docstring
    # for the cluster-mode reliable-checkpoint path)
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    return (
        _truncate(fps).select(id_col, F.explode("__fps").alias("fp"))
        .where(F.col("fp").isNotNull())
        .distinct()
    )


def source_signature_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 2,
) -> DataFrame:
    """Constant-state sketch twin of :func:`source_overlap`: one
    K-permutation minhash signature PER SOURCE over its shingle
    multiset, then pairwise Jaccard estimates = matching signature
    components / K. Where source_overlap's join input is the
    distinct (source, gram) set — already hash-compacted but still
    corpus-vocabulary-sized — the signature is K longs per source
    no matter the corpus: the diagnostic for when even the distinct
    gram set is too big to move. min() is duplicate-insensitive, so
    no distinct pass is needed at all: ONE groupBy(source) computes
    all K mins map-side-combined in a single scan. Estimates are
    exact integer match counts (+ an IEEE division), shared with the
    oracle via the same affine family as minhash_signature.

    Returns ``(source_a, source_b, matches, num_hashes,
    jaccard_est)`` for every unordered source pair.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    sh = _truncate(with_shingles(df, text_col, source_col, shingle_n))
    h = sh.select(
        F.col(source_col).alias("__src"), F.explode("__sh").alias("__s")
    ).select("__src", (hash60(F.col("__s")) % F.lit(M31)).alias("__h"))
    aggs = []
    for k in range(num_hashes):
        a, b = affine_params(k)
        aggs.append(
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(M31)).alias(f"sig_{k}")
        )
    wide = h.groupBy("__src").agg(*aggs)
    stack = ", ".join(f"{k}, sig_{k}" for k in range(num_hashes))
    sigs = wide.select(
        "__src", F.expr(f"stack({num_hashes}, {stack}) as (k, sig)")
    )
    left = sigs.select(
        F.col("__src").alias("source_a"), "k", F.col("sig").alias("__sa")
    )
    right = sigs.select(
        F.col("__src").alias("source_b"), "k", F.col("sig").alias("__sb")
    )
    return (
        left.join(right, "k")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.when(F.col("__sa") == F.col("__sb"), 1).otherwise(0)
            ).alias("matches"),
        )
        .select(
            "source_a", "source_b", "matches",
            F.lit(num_hashes).alias("num_hashes"),
            (F.col("matches").cast("double") / F.lit(float(num_hashes)))
            .alias("jaccard_est"),
        )
    )


def winnow_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
) -> DataFrame:
    """Near-dup pair detection on winnowing fingerprints (the match
    stage MOSS runs on the :func:`winnow_fingerprints` selection):
    ``(id_a, id_b, shared_fps)`` for pairs sharing at least
    ``min_shared`` selected fingerprints, candidates generated ONLY
    from fingerprints with document frequency <= ``max_df`` (the
    hot-fp cap the fingerprint docstring prescribes — min-selection
    biases fingerprints toward globally small hashes, so df skew is
    worse than for raw grams; a boilerplate fp indexing D docs would
    otherwise mint D²/2 candidates alone).

    SCALE: the self-join runs on (fp, id) 8-byte pairs with per-fp
    fan-out capped at max_df²/2; shared_fps counts are exact
    integers, so the report is hash-checkable. Recall caveat mirrors
    ngram_jaccard_pairs(max_df=...): a pair sharing ONLY
    hotter-than-cap fingerprints is missed. The fingerprint frame is
    materialized once (_truncate) — it feeds the df count and both
    self-join sides, which would otherwise re-tokenize the corpus
    per reference (the triangle-count lesson, PERF.md §16).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    fps = _truncate(
        winnow_fingerprints(df, text_col, id_col, k, w).select(
            F.col(id_col).alias("__id"), "fp"
        )
    )
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    rare = fps.join(freq.where(F.col("__df") <= int(max_df)), "fp").select(
        "__id", "fp"
    )
    a = rare.select(F.col("__id").alias("id_a"), "fp")
    b = rare.select(F.col("__id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= int(min_shared))
    )


def novelty_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """First-occurrence novelty per document: the fraction of a
    doc's distinct shingles whose FIRST appearance (minimum id over
    the whole corpus) is this doc — ``(id, n_shingles, n_novel,
    novelty)``. The corpus-contribution signal data curation orders
    by: a doc that only restates earlier grams scores ~0, genuinely
    new material scores ~1 (near-dups of earlier docs are exactly
    the low scorers). Deterministic: "first" is min(id), not
    ingestion order.

    SCALE: shingles reduce to 8-byte hash60 values INSIDE the array
    (F.transform) before the checkpoint, so neither the checkpoint
    write nor any exchange ever carries gram strings — the
    materialized frame is (id, array<long>), ~8 bytes/gram instead
    of ~3× corpus text; one min-by-gram aggregate + one per-doc
    count — two bounded exchanges, no window, no all-pairs anything.
    The hash ARRAY is materialized (_truncate) BEFORE the explode:
    Generate re-evaluates an inlined interpreted transform per
    OUTPUT element (PERF §14/§21 — this exact operator measured
    87.3 s → 3.4 s at sf1 when the checkpoint moved above the
    explode).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.text import hash60

    sh_arr = _truncate(
        with_shingles(df, text_col, id_col, shingle_n).select(
            F.col(id_col).alias("__id"),
            F.transform("__sh", lambda s: hash60(s)).alias("__sh"),
        )
    )
    sh = sh_arr.select("__id", F.explode("__sh").alias("__h"))
    first = sh.groupBy("__h").agg(F.min("__id").alias("__first"))
    per_doc = (
        sh.join(first, "__h")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("__first") == F.col("__id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
            6,
        ).alias("novelty"),
    )


# --- asymmetric containment (near-superset detection) -------------------------

def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    min_shingles: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Directional containment pairs: for ordered (sub, sup),
    ``containment = |S(sub) ∩ S(sup)| / |S(sub)|`` over distinct
    word-``shingle_n``-gram sets, emitting every pair with
    containment ≥ threshold and |S(sub)| ≥ min_shingles. Jaccard is
    SYMMETRIC and goes to zero when sizes diverge — a tweet quoted
    inside a long article never trips it; containment is the
    asymmetric signal dedup pipelines add to catch near-SUPERSET
    duplication (quotation, concatenation, boilerplate wrapping —
    Broder's "containment" companion to resemblance).

    Returns ``(id_sub, id_sup, n_sub, n_sup, n_common, containment)``
    with both orientations of each intersecting pair scored (an
    A⊂B pair normally qualifies A→B only).

    SCALE: the same inverted-index shape as :func:`ngram_jaccard_pairs`
    — shingle postings self-join (text never moves; candidate count
    is Σ_gram df²/2), sizes rejoin per candidate pair; ``max_df=K``
    applies the identical stop-gram cap (candidates only from grams
    with df ≤ K, exact verification on the full HASH arrays) for
    corpora with hot boilerplate grams. min_shingles guards the
    degenerate tiny-doc case where one shared gram = full
    containment. Grams are reduced to 8-byte hash60 values INSIDE
    the array (F.transform) before the checkpoint, so the
    materialized frame, the postings join, and the
    array_intersect verification all run on array<long> — gram
    strings never leave the map side (collision odds at 60 bits are
    ~|grams|²/2^61, negligible below billions of distinct grams).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # int64 xxhash64 shingles from birth (with_hashed_shingles,
    # replacing the md5-based hash60 transform): the hash never
    # leaves the engine (outputs carry only counts/sizes), so the
    # cheap codegen'd hash does the same job without building a gram
    # string or paying md5 + hex-conv per gram.
    sh_arr = _truncate(
        with_hashed_shingles(df, text_col, id_col, shingle_n).select(
            F.col(id_col).alias("__id"), F.col("__sh")
        )
    )
    sizes = sh_arr.select("__id", F.size("__sh").alias("n_sh"))
    if max_df is not None:
        sh = sh_arr.select("__id", F.explode("__sh").alias("s"))
        # exact n_common from narrow postings (rare + hot counts),
        # computed ONCE per canonical a<b pair (n_common is
        # symmetric); both orientations explode from the one scored
        # row — no array joins, no mirrored second count pass
        cand = _capped_pair_counts(
            sh, int(max_df), "__ca", "__cb", ordered=False
        )
        both = cand.join(
            sizes.select(F.col("__id").alias("__ca"), F.col("n_sh").alias("__na")),
            "__ca",
        ).join(
            sizes.select(F.col("__id").alias("__cb"), F.col("n_sh").alias("__nb")),
            "__cb",
        ).select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("__ca").alias("id_sub"),
                        F.col("__cb").alias("id_sup"),
                        F.col("__na").alias("n_sub"),
                        F.col("__nb").alias("n_sup"),
                        F.col("n_common").alias("n_common"),
                    ),
                    F.struct(
                        F.col("__cb").alias("id_sub"),
                        F.col("__ca").alias("id_sup"),
                        F.col("__nb").alias("n_sub"),
                        F.col("__na").alias("n_sup"),
                        F.col("n_common").alias("n_common"),
                    ),
                )
            ).alias("__o")
        )
        scored = both.select("__o.*")
    else:
        sh = sh_arr.select("__id", F.explode("__sh").alias("s"))
        common = (
            sh.select(F.col("__id").alias("id_sub"), "s")
            .join(sh.select(F.col("__id").alias("id_sup"), "s"), "s")
            .filter(F.col("id_sub") != F.col("id_sup"))
            .groupBy("id_sub", "id_sup")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        scored = common.join(
            sizes.select(F.col("__id").alias("id_sub"), F.col("n_sh").alias("n_sub")),
            "id_sub",
        ).join(
            sizes.select(F.col("__id").alias("id_sup"), F.col("n_sh").alias("n_sup")),
            "id_sup",
        )
    return (
        scored.filter(F.col("n_sub") >= int(min_shingles))
        .withColumn(
            "containment",
            F.round(
                F.col("n_common").cast("double") / F.col("n_sub").cast("double"), 6
            ),
        )
        .filter(F.col("containment") >= float(threshold))
        .select("id_sub", "id_sup", "n_sub", "n_sup", "n_common", "containment")
    )
