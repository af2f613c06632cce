"""Decontamination + duplicate-chunk queries (north star surface).

Eval-set convention for the fixture: ``doc_id % 41 = 0`` is the held-
out eval slice; the remaining documents are the training corpus. The
DuckDB oracles rebuild the identical n-gram pipelines set-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.operators.decontam import decontaminate, duplicate_chunks
from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _shingles_sql(src: str) -> str:
    """Distinct 3-token shingles of CTE ``src`` (same construction as
    queries/llm_dedup.py — indexed list_transform, 1-based)."""
    return f"""
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(t, (x, i) ->
             CASE WHEN i + 2 <= len(t)
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
    FROM (SELECT doc_id, {_TOKS} AS t FROM {src}))
  WHERE s IS NOT NULL
"""


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH ev_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 <> 0),
    ev AS (SELECT DISTINCT s FROM ({_shingles_sql('ev_docs')})),
    sh AS ({_shingles_sql('corpus')}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    hits AS (SELECT sh.doc_id, COUNT(*) AS n_ov
             FROM sh JOIN ev USING (s) GROUP BY sh.doc_id)
    SELECT c.doc_id,
           CAST(COALESCE(z.n_sh, 0) AS INT) AS n_shingles,
           CAST(COALESCE(h.n_ov, 0) AS INT) AS n_overlap,
           ROUND(CAST(COALESCE(h.n_ov, 0) AS DOUBLE)
                 / CAST(GREATEST(COALESCE(z.n_sh, 0), 1) AS DOUBLE), 6)
             AS overlap_frac,
           CASE WHEN ROUND(CAST(COALESCE(h.n_ov, 0) AS DOUBLE)
                     / CAST(GREATEST(COALESCE(z.n_sh, 0), 1) AS DOUBLE), 6)
                     >= 0.1
                THEN 1 ELSE 0 END AS contaminated
    FROM corpus c
    LEFT JOIN sizes z ON z.doc_id = c.doc_id
    LEFT JOIN hits h ON h.doc_id = c.doc_id
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set n-gram-overlap decontamination (GPT-3 appendix-C
    style): flag training docs whose distinct 3-gram overlap with the
    eval slice reaches 10% (operators/decontam.py:decontaminate)."""
    d = t(spark, sf_dir, "documents")
    eval_df = d.filter(F.col("doc_id") % 41 == 0).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 41 != 0).select("doc_id", "text")
    return decontaminate(corpus, eval_df, n=3, threshold=0.1)


@query(
    "llm_duplicate_chunks",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_transform(t, (x, i) ->
               CASE WHEN i + 4 <= len(t)
                    THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                         || ' ' || t[i+3] || ' ' || t[i+4] END)) AS g
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents))
    SELECT g AS chunk,
           CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
           CAST(COUNT(*) AS INT) AS n_occurrences
    FROM g WHERE g IS NOT NULL
    GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def llm_duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated 5-token chunks across the corpus — the
    bounded-state stand-in for suffix-array substring dedup
    (operators/decontam.py:duplicate_chunks)."""
    return duplicate_chunks(t(spark, sf_dir, "documents"), k=5, min_docs=2)


@query(
    "llm_decontam_excise",
    oracle=f"""
    WITH ev_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 <> 0),
    ev AS (SELECT DISTINCT s FROM ({_shingles_sql('ev_docs')})),
    tk AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
    pg AS (
      SELECT doc_id, u.p, u.s FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN struct_pack(p := i,
                             s := t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END))
               AS u
        FROM tk)
      WHERE u IS NOT NULL
    ),
    hit AS (SELECT pg.doc_id, pg.p FROM pg JOIN ev USING (s)),
    rm AS (
      SELECT DISTINCT doc_id, p + o AS i
      FROM hit, (SELECT unnest([0, 1, 2]) AS o)
    ),
    rml AS (SELECT doc_id, list(i) AS rm FROM rm GROUP BY doc_id)
    SELECT tk.doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(rm), 0) AS BIGINT) AS n_removed,
           -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
           -- concat_ws over an empty array is '' (fully-excised docs)
           COALESCE(array_to_string(
             list_filter(t, (x, i) ->
               rm IS NULL OR NOT list_contains(rm, i)), ' '), '')
             AS clean_text
    FROM tk LEFT JOIN rml ON rml.doc_id = tk.doc_id
    """,
)
def llm_decontam_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination REMOVAL (C4/FLAN style, where
    llm_decontaminate is the doc-level flag): tokens covered by any
    eval-set 3-gram are excised and the document rebuilt
    (operators/decontam.py:excise_contaminated_spans). The driver
    hash-check certifies the rebuilt TEXTS byte-for-byte, not just
    the counts. Same eval-slice convention (doc_id % 41)."""
    from aws_datalake_spark.operators.decontam import excise_contaminated_spans

    d = t(spark, sf_dir, "documents")
    eval_df = d.filter(F.col("doc_id") % 41 == 0).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 41 != 0).select("doc_id", "text")
    return excise_contaminated_spans(corpus, eval_df, n=3)


@query(
    "llm_corpus_pipeline_v3",
    oracle=f"""
    WITH ev_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0),
    corpus AS (SELECT doc_id, source, text FROM documents
               WHERE doc_id % 41 <> 0),
    ev AS (SELECT DISTINCT s FROM ({_shingles_sql('ev_docs')})),
    tk AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
    pg AS (
      SELECT doc_id, u.p, u.s FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN struct_pack(p := i,
                             s := t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END))
               AS u
        FROM tk)
      WHERE u IS NOT NULL
    ),
    hit AS (SELECT pg.doc_id, pg.p FROM pg JOIN ev USING (s)),
    rm AS (
      SELECT DISTINCT doc_id, p + o AS i
      FROM hit, (SELECT unnest([0, 1, 2]) AS o)
    ),
    rml AS (SELECT doc_id, list(i) AS rm FROM rm GROUP BY doc_id),
    ex AS (
      SELECT tk.doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(COALESCE(len(rm), 0) AS BIGINT) AS n_removed,
             COALESCE(array_to_string(
               list_filter(t, (x, i) ->
                 rm IS NULL OR NOT list_contains(rm, i)), ' '), '')
               AS clean_text
      FROM tk LEFT JOIN rml ON rml.doc_id = tk.doc_id
    ),
    kept AS (
      SELECT * FROM ex WHERE n_tokens - n_removed >= 5
    ),
    rep AS (
      SELECT MIN(doc_id) AS doc_id, clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM kept GROUP BY clean_text
    )
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(CASE WHEN e.n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN e.n_tokens - e.n_removed < 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           CAST(COUNT(r.doc_id) AS BIGINT) AS n_final,
           CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NOT NULL
                             THEN length(e.clean_text) END), 0) AS BIGINT)
             AS final_chars
    FROM corpus c
    JOIN ex e ON e.doc_id = c.doc_id
    LEFT JOIN rep r ON r.doc_id = c.doc_id
    GROUP BY c.source
    """,
)
def llm_corpus_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 curation chain composed end-to-end: span-level
    eval-set excision (excise_contaminated_spans) → minimum-length
    quality gate on the SURVIVING token count → exact dedup of the
    cleaned texts (min-id representative) → per-source release
    report (docs in / contaminated / dropped-short / final /
    released chars — all exact integers). Each stage is individually
    oracle-verified (llm_decontam_excise, llm_exact_dedup); this
    query proves the composition hash-matches the same chain in
    SQL, clean-text bytes included."""
    from aws_datalake_spark.operators.decontam import excise_contaminated_spans

    d = t(spark, sf_dir, "documents")
    eval_df = d.filter(F.col("doc_id") % 41 == 0).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 41 != 0).select(
        "doc_id", "source", "text"
    )
    ex = excise_contaminated_spans(
        corpus.select("doc_id", "text"), eval_df, n=3
    )
    kept = ex.where(F.col("n_tokens") - F.col("n_removed") >= 5)
    rep = kept.groupBy("clean_text").agg(F.min("doc_id").alias("__rep"))
    marked = (
        corpus.select("doc_id", "source")
        .join(ex, "doc_id")
        .join(
            rep.select(F.col("__rep").alias("doc_id"), F.lit(1).alias("__is_rep")),
            "doc_id",
            "left",
        )
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.sum(
            F.when(F.col("n_tokens") - F.col("n_removed") < 5, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_short"),
        F.sum(F.coalesce("__is_rep", F.lit(0))).cast("long").alias("n_final"),
        F.coalesce(
            F.sum(
                F.when(F.col("__is_rep") == 1, F.length("clean_text"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("final_chars"),
    )
