"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic order and split the token stream into fixed-budget
contexts (the standard concat-and-chunk recipe — every pack is full;
documents may span pack boundaries).

The core is a GLOBAL exclusive prefix sum of per-doc token counts.
A naive `Window.orderBy(id)` with no partition key collapses to ONE
task — the classic global-window scale trap. Instead, the two-pass
distributed prefix sum:

1. bucket docs by id range (``bucket = id div bucket_width`` — fixed
   width, so bucketing is a projection, no sampling, deterministic);
2. within-bucket exclusive cumsum via a PARTITIONED window (parallel
   across buckets, each bucket ≤ bucket_width rows);
3. per-bucket totals (tiny: N/bucket_width rows) get their own
   exclusive cumsum to become bucket offsets, then broadcast-join
   back. ``begin = bucket_offset + within_bucket_cumsum``.

100 TB notes: pass 3's offset table is N/bucket_width rows — at 1e11
docs and width 2^20 that is ~1e5 rows, fine for a single-task window
+ broadcast. If ids are sparse/clustered, empty buckets cost nothing
(absent groups) and skewed buckets are bounded by width. All integer
arithmetic is int64; ``div``/``%`` keep exactness where a double
floor() would lose precision past 2^53 (a real concern for a 100 TB
token stream: ~1e13 tokens > 2^43, products and sums stay < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_datalake_spark.operators.text import token_count_ws, tokens_ws


def global_exclusive_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out: str = "begin",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` over global
    ``order_col`` order, computed with the two-pass bucketed prefix
    sum above (no single-task global window). ``order_col`` must be
    a non-negative integral id."""
    b = df.withColumn("__b", F.expr(f"{order_col} div {bucket_width}"))
    within = Window.partitionBy("__b").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.withColumn("__local", F.coalesce(F.sum(value_col).over(within), F.lit(0)))
    totals = b.groupBy("__b").agg(F.sum(value_col).alias("__bt"))
    over_buckets = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(over_buckets), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn(out, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__b", "__local", "__off")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Assign each document its place in the packed token stream:
    ``(id, n_tokens, pack_id, offset_in_pack, n_packs)``.

    ``pack_id`` is the context the document STARTS in,
    ``offset_in_pack`` its token offset there, ``n_packs`` how many
    contexts it spans (0 for empty docs). Deterministic given the
    id order — re-runs and backfills produce identical packing,
    which is what makes checkpoint-resume of tokenization jobs safe.
    """
    w = df.select(id_col, token_count_ws(F.col(text_col)).cast("long").alias("n_tokens"))
    cum = global_exclusive_cumsum(
        w, "n_tokens", id_col, out="__begin", bucket_width=bucket_width
    )
    return cum.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.expr(f"__begin div {budget}").alias("pack_id"),
        (F.col("__begin") % budget).cast("long").alias("offset_in_pack"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"(__begin + n_tokens - 1) div {budget}")
            - F.expr(f"__begin div {budget}")
            + 1
        )
        .alias("n_packs"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size overlapping token chunks per document — the RAG /
    long-context splitter (each window advances by
    ``chunk_tokens - overlap``; the final chunk may be short; an
    empty document yields no chunks, matching explode semantics).

    All integer arithmetic (no float ceil) so chunk counts are exact
    in any engine. One narrow projection + one explode — embarrassingly
    parallel, no shuffle at all; at 100 TB this is scan-bound and the
    output inherits the input partitioning.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(tokens_ws(F.col(text_col)), lambda x: x != "")
    n = F.size(toks)
    # ceil((n - chunk)/stride) + 1 as floor((n - chunk + stride-1)/stride) + 1;
    # the double quotient is ≫ one ulp away from any integer unless the
    # division is exact, so floor() matches integer division in any engine
    n_chunks = F.when(n <= F.lit(chunk_tokens), F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(chunk_tokens) + F.lit(stride - 1)).cast("double")
            / F.lit(float(stride))
        )
        + F.lit(1)
    ).cast("int")
    base = df.select(
        id_col, toks.alias("__toks"), n_chunks.alias("__nc"), n.alias("__n")
    ).filter(F.col("__n") > 0)
    exploded = base.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * F.lit(stride) + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )


def grouped_exclusive_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    key_cols: list[str],
    out: str = "begin",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Per-key exclusive running sum over global ``order_col`` order
    — :func:`global_exclusive_cumsum` lifted to key groups with the
    same two-pass shape: the big-side window partitions by
    ``(keys, id-bucket)`` (parallel, ≤ bucket_width rows each); only
    the tiny per-(keys, bucket) totals table runs a per-key window
    (|keys| × N/bucket_width rows) before broadcasting back."""
    b = df.withColumn("__b", F.expr(f"{order_col} div {bucket_width}"))
    within = Window.partitionBy(*key_cols, "__b").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = b.withColumn("__local", F.coalesce(F.sum(value_col).over(within), F.lit(0)))
    totals = b.groupBy(*key_cols, "__b").agg(F.sum(value_col).alias("__bt"))
    over_buckets = Window.partitionBy(*key_cols).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        *key_cols, "__b",
        F.coalesce(F.sum("__bt").over(over_buckets), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), [*key_cols, "__b"])
        .withColumn(out, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__b", "__local", "__off")
    )


def bucket_pack(
    df: DataFrame,
    budget: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """NO-SPLIT packing: every document lands whole in exactly one
    pack — the SFT/instruction-tuning packer, where an example must
    not span context boundaries (contrast :func:`pack_sequences`,
    the pretraining concat-and-chunk where splitting is fine).

    Strategy: length-class shelf packing. Each doc joins the
    power-of-two class ℓ = 2^p ≥ n_tokens; a class-ℓ pack holds
    ``budget div ℓ`` docs, filled in doc-id order. Deterministic,
    set-based, and engine-exact (integer CASE + rank arithmetic —
    no transcendental log2): the known trade against true first-fit
    is ≤ 2× padding in the worst case, in exchange for a fully
    parallel plan (first-fit is an inherently sequential recurrence).

    Docs with ``n_tokens == 0`` or ``n_tokens > budget`` are
    EXCLUDED (route oversized docs through chunk_documents first).
    ``budget`` must be a power of two so every class divides it.

    The per-class rank comes from :func:`grouped_exclusive_cumsum` —
    no single-task global window at any scale. ``pack_id`` is
    ``p · 2^40 + pack_index_in_class`` (unique across classes, int64
    at any corpus size below 2^40 packs per class).

    Returns ``(id, n_tokens, len_class, pack_id, slot)``.
    """
    if budget & (budget - 1):
        raise ValueError("bucket_pack: budget must be a power of two")
    w = df.select(
        id_col, token_count_ws(F.col(text_col)).cast("long").alias("n_tokens")
    ).filter((F.col("n_tokens") > 0) & (F.col("n_tokens") <= budget))
    p_col = None
    p_max = budget.bit_length() - 1
    for p in range(p_max + 1):
        cond = F.col("n_tokens") <= F.lit(1 << p)
        p_col = F.when(cond, F.lit(p)) if p_col is None else p_col.when(cond, F.lit(p))
    cls = w.withColumn("__p", p_col.cast("int"))
    ranked = grouped_exclusive_cumsum(
        cls.withColumn("__one", F.lit(1)),
        "__one", id_col, ["__p"], out="__r", bucket_width=bucket_width,
    )
    cap = F.expr(f"{budget} div (1 << __p)")
    return ranked.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("__p").alias("len_class"),
        (F.col("__p").cast("long") * F.lit(1 << 40)
         + F.expr("__r div (" + str(budget) + " div (1 << __p))")).alias("pack_id"),
        (F.col("__r") % cap).cast("long").alias("slot"),
    )
