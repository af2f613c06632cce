"""Distributed BPE tokenizer training (merge-table learning).

The tokenizer-training step of an LLM data pipeline: learn the
byte-pair-encoding merge table from corpus statistics. The expensive
part — word frequency counting — touches the corpus ONCE; every
merge iteration then runs over the VOCABULARY table (distinct words ×
their symbol sequences), which is orders of magnitude smaller than
the corpus at web scale. That asymmetry is what makes BPE training
tractable at 100 TB: one corpus scan + K vocab-sized iterations.

Semantics notes (documented divergences from canonical BPE):
* no end-of-word marker symbol (merges never cross words anyway
  because pairs are counted within the per-word symbol sequence);
* within one apply step, repeated overlapping pairs merge
  left-to-right non-overlapping (Java regex replaceAll), matching
  the greedy left-to-right application of standard BPE.

Ties break deterministically by (count desc, pair asc), so the merge
table is reproducible across runs and cluster layouts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_datalake_spark.operators.text import ngrams, tokens_ws


def _java_replacement(s: str) -> str:
    """Escape a literal for the replacement slot of regexp_replace
    (Java Matcher semantics: backslash and dollar are special)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Learn a BPE merge table: ``(merge_rank, pair, new_symbol,
    pair_count)``, one row per learned merge in order.

    Driver-side loop, data-side work: each iteration is one
    vocab-sized aggregation (pair counts weighted by word frequency)
    plus one narrow projection applying the winning merge. The word
    table's lineage is truncated per round (localCheckpoint) so plan
    depth stays O(1) across merges.
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens_ws(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # seed symbol sequence: space-joined single characters
        .withColumn("syms", F.array_join(F.split(F.col("w"), ""), " "))
        .select("syms", "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pair_counts = (
            words.select(
                F.explode(ngrams(F.split(F.col("syms"), " "), 2)).alias("pair"),
                F.col("n"),
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .filter(F.col("c") >= min_count)
        )
        top = pair_counts.orderBy(F.desc("c"), "pair").limit(1).collect()
        if not top:
            break
        pair, count = top[0].pair, int(top[0].c)
        new_symbol = pair.replace(" ", "")
        merges.append((rank, pair, new_symbol, count))
        # merge the winning pair wherever it appears as whole symbols
        pattern = f"(?<=^|[ ]){re.escape(pair)}(?=[ ]|$)"
        words = words.select(
            F.regexp_replace(
                F.col("syms"), pattern, _java_replacement(new_symbol)
            ).alias("syms"),
            "n",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, new_symbol string, pair_count long"
    )


def bpe_merges_batched(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_count: int = 2,
    batch_candidates: int = 64,
) -> DataFrame:
    """:func:`bpe_merges` with PROVABLY-EXACT batched rounds: one
    Spark job can learn several merges, cutting driver round-trips
    (the 32k-vocab killer: sequential = 32k jobs).

    Per round, collect the top ``batch_candidates`` pairs once, then
    select the longest prefix of the (count desc, pair asc) order
    that sequential BPE would provably also pick:

    * symbol-disjoint — a candidate touching an already-selected
      symbol stops the batch (its own count may have changed);
    * created-pair dominated — merging (a,b)→ab creates pairs
      (x,ab)/(ab,y) with counts ≤ count(x,a)/count(b,y); a candidate
      stops the batch unless its count STRICTLY exceeds every such
      bound from earlier selections (ties stop too: a created pair
      could win the lexicographic tie-break). Absent-from-table pairs
      are bounded by the table cutoff (or min_count-1 when the table
      is complete).

    Within a batch the selected pairs are symbol-disjoint, so applying
    them as a chained projection equals applying them one at a time.
    Worst case (e.g. the top pair is a self-pair like 'a a') a round
    selects one merge and this degrades to the sequential algorithm —
    never to a different answer. Parity is pinned by
    tests/test_bpe.py::test_batched_merges_match_sequential.
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens_ws(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.array_join(F.split(F.col("w"), ""), " "))
        .select("syms", "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        cand = (
            words.select(
                F.explode(ngrams(F.split(F.col("syms"), " "), 2)).alias("pair"),
                F.col("n"),
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .filter(F.col("c") >= min_count)
            .orderBy(F.desc("c"), "pair")
            .limit(batch_candidates)
            .collect()
        )
        if not cand:
            break
        table = [(r.pair, int(r.c)) for r in cand]
        # bound for any pair NOT in the table
        off_table = (
            table[-1][1] if len(table) == batch_candidates else min_count - 1
        )
        by_right: dict[str, int] = {}
        by_left: dict[str, int] = {}
        for p, c in table:
            a, b = p.split(" ")
            by_right[b] = max(by_right.get(b, 0), c)
            by_left[a] = max(by_left.get(a, 0), c)
        touched: set[str] = set()
        created_bound = -1
        selected: list[tuple[str, int]] = []
        for p, c in table:
            a, b = p.split(" ")
            if selected:
                if a in touched or b in touched or c <= created_bound:
                    break
            # creation potential of selecting (a,b): new pairs
            # (x,ab) ≤ count(x,a) and (ab,y) ≤ count(b,y)
            bound_j = max(
                off_table, by_right.get(a, 0), by_left.get(b, 0)
            )
            created_bound = max(created_bound, bound_j)
            selected.append((p, c))
            touched.update((a, b))
            if len(merges) + len(selected) >= num_merges:
                break
        syms_col = F.col("syms")
        for p, c in selected:
            merges.append((len(merges) + 1, p, p.replace(" ", ""), c))
            pattern = f"(?<=^|[ ]){re.escape(p)}(?=[ ]|$)"
            syms_col = F.regexp_replace(
                syms_col, pattern, _java_replacement(p.replace(" ", ""))
            )
        words = words.select(syms_col.alias("syms"), "n").localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, new_symbol string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: one row per (doc, token) with the
    token's BPE piece array and piece count.

    With the merge list fixed (literals baked into the plan), this is
    a PURE projection — a chain of K regexp_replace ops over the
    symbol string, then one split — so encoding parallelizes with the
    scan and shuffles nothing. This is the shape a production encoder
    takes after training: merges broadcast as plan literals (or a
    pandas UDF holding a trie for very large merge tables).
    """
    toks = (
        df.select(id_col, F.explode(tokens_ws(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    syms = F.array_join(F.split(F.col("token"), ""), " ")
    for a, b in merges:
        pair = f"{a} {b}"
        pattern = f"(?<=^|[ ]){re.escape(pair)}(?=[ ]|$)"
        syms = F.regexp_replace(syms, pattern, _java_replacement(a + b))
    pieces = F.split(syms, " ")
    return toks.select(
        id_col,
        "token",
        pieces.alias("pieces"),
        F.size(pieces).alias("n_pieces"),
    )
