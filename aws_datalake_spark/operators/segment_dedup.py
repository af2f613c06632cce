"""Sub-document (line / paragraph / segment) dedup — CCNet-style
boilerplate removal.

Document-level dedup (operators/dedup.py) drops whole near-identical
docs; real web corpora ALSO carry boilerplate *inside* otherwise
unique documents (nav bars, cookie banners, license headers). The
published recipe (CCNet, Wenzek et al. 2020; Gopher's repetition
filters use the same unit) is: split each doc into segments, hash
every segment, drop segments whose document frequency exceeds a
threshold, reassemble. This module is that pipeline, Spark-first.

Fixture adaptation: the synthetic `documents` table has no newline
structure, so the default segmenter is fixed ``k``-word windows
(``segment_docs``); on real data pass ``split_pattern="\\n"`` and
segments become lines — identical downstream plan either way.

Scale shape (100 TB):
* the SEGMENT table is the only corpus-sized intermediate; its df
  count shuffles an 8-byte ``xxhash64`` per segment, never the
  segment text (``boilerplate_keys``);
* the boilerplate key set is tiny by construction (only segments in
  ≥ min_df docs) → broadcast hash anti-join back onto the segment
  table; corpus text shuffles exactly once, on doc_id, for
  reassembly — unavoidable, since reassembly IS a group-by-doc;
* per-segment hashing and joining stay whole-stage-codegen
  (built-ins only: split/slice/transform/xxhash64/posexplode).

Determinism: reassembly sorts collected (seg_idx, seg) structs with
``array_sort`` — order-free under shuffle, so md5(clean_text)
hash-matches a DuckDB STRING_AGG(... ORDER BY seg_idx) oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    split_pattern: str = " ",
) -> DataFrame:
    """(id, seg_idx, seg): non-overlapping ``k``-token windows of the
    whitespace-split text (k tokens ≈ a "line" on structureless
    text; set split_pattern='\\n' and k=1 for true line dedup).
    Empty docs yield zero segments (guarded: no descending-sequence
    ANSI trap on size-0 arrays)."""
    toks = F.split(F.col(text_col), split_pattern)
    n_seg = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    segs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    )


def seg_key(col: Column | str = "seg") -> Column:
    """8-byte shuffle key for a segment (full text never shuffles
    for counting)."""
    return F.xxhash64(col)


def boilerplate_keys(
    segments: DataFrame, id_col: str = "doc_id", min_df: int = 2
) -> DataFrame:
    """Hash keys of segments appearing in ≥ ``min_df`` DISTINCT
    docs. Output is small by construction (boilerplate is rare
    relative to corpus volume) → downstream broadcast."""
    return (
        segments.groupBy(seg_key().alias("__k"))
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("__k")
    )


def drop_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Per-doc boilerplate removal: returns (id, n_seg, n_kept,
    clean_text) where clean_text is the doc with every
    above-threshold segment deleted ('' when everything was
    boilerplate). One corpus shuffle (reassembly by id)."""
    segs = segment_docs(df, text_col, id_col, k)
    boiler = boilerplate_keys(segs, id_col, min_df)
    kept = (
        segs.join(F.broadcast(boiler), seg_key() == F.col("__k"), "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_seg"))
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            "n_seg",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def dedup_segments_keep_first(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Exact CCNet semantics: for every DISTINCT segment keep only
    its first occurrence (global order: min (doc_id, seg_idx)) and
    delete every later occurrence, then reassemble. Differs from
    drop_boilerplate, which deletes ALL occurrences of
    above-threshold segments including the first.

    Shuffle shape: winner election groups (key, doc_id, seg_idx)
    triples — 24 bytes per segment, never text; the kept (doc, idx)
    pairs rejoin the segment table on (doc, idx), then one corpus
    shuffle on doc for reassembly. Returns (id, n_seg, n_kept,
    clean_text)."""
    segs = segment_docs(df, text_col, id_col, k)
    keyed = segs.select(
        id_col, "seg_idx", seg_key().alias("__k")
    )
    winners = (
        keyed.groupBy("__k")
        .agg(
            F.min(F.struct(id_col, "seg_idx")).alias("__first"),
        )
        .select(
            F.col(f"__first.{id_col}").alias(id_col),
            F.col("__first.seg_idx").alias("seg_idx"),
        )
    )
    kept = (
        segs.join(winners, [id_col, "seg_idx"], "left_semi")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_seg"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_seg",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
