"""Sequence-packing + corpus-sampling + training-order queries.

The DuckDB oracles use a single global window (fine at oracle scale);
the Spark side uses the scalable forms (bucketed prefix sum,
hash-partitioned shard numbering) — same values, different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from aws_datalake_spark.operators.packing import pack_sequences
from aws_datalake_spark.operators.sampling import stratified_sample, training_order
from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
)


@query(
    "llm_sequence_packing",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_NTOK} AS n_tokens FROM documents),
    cum AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      FROM w)
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(b // 128 AS BIGINT) AS pack_id,
           CAST(b % 128 AS BIGINT) AS offset_in_pack,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE (b + n_tokens - 1) // 128 - b // 128 + 1
           END AS BIGINT) AS n_packs
    FROM cum
    """,
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 128-token contexts via the
    two-pass bucketed prefix sum (operators/packing.py) — no
    single-task global window."""
    return pack_sequences(t(spark, sf_dir, "documents"), budget=128)


_H60_ID = "('0x' || substr(md5('s42' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"

_RATES = {"src0": 0.9, "src1": 0.6, "src2": 0.3, "src3": 0.15}
_DEFAULT_RATE = 0.05

_RATE_CASE = "CASE source " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATES.items())
) + f" ELSE {_DEFAULT_RATE} END"


@query(
    "llm_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             ROUND(CAST({_H60_ID} % 1000000 AS DOUBLE) / 1000000.0, 6) AS u
      FROM documents)
    SELECT doc_id, source, u FROM h WHERE u < {_RATE_CASE}
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus mixing with content-stable sampling: each
    row's keep/drop is a pure function of (seed, doc_id), so retries
    and backfills are reproducible (operators/sampling.py)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(d, _RATES, default_rate=_DEFAULT_RATE).select(
        "doc_id", "source", F.col("__u").alias("u")
    )


@query(
    "llm_training_order",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_H60_ID} AS hh FROM documents)
    SELECT doc_id,
           CAST(hh % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8
                                   ORDER BY hh, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def llm_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle → (shard, position) for training
    dataloaders; reproducible mid-epoch resume
    (operators/sampling.py:training_order)."""
    return training_order(t(spark, sf_dir, "documents"), n_shards=8)


@query(
    "llm_adaptive_quality_filter",
    oracle="""
    WITH q AS (
      SELECT d.doc_id, d.source,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000 AS DOUBLE) AS score
      FROM documents d),
    r AS (SELECT source, score,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM q),
    cut AS (SELECT source, score AS cut FROM r WHERE rn = (n + 1) // 2)
    SELECT q.doc_id, q.source, q.score, cut.cut
    FROM q JOIN cut USING (source) WHERE q.score >= cut.cut
    """,
)
def llm_adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive threshold: drop the worse half of every
    source by an exact order-statistic median cut
    (operators/sampling.py:median_threshold_filter). The score here
    is a deterministic hash surrogate so the oracle is simple; the
    production form feeds operators/text.py:quality_score in."""
    from aws_datalake_spark.operators.sampling import median_threshold_filter
    from aws_datalake_spark.operators.text import hash60

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (hash60(F.col("doc_id").cast("string")) % 1000).cast("double").alias("score"),
    )
    return median_threshold_filter(d, "score", "source", "doc_id")


@query(
    "llm_corpus_pipeline",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text,
             ROUND(
               0.4 * LEAST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - LEAST(
                 (CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                  / GREATEST(length(text), 1)) * 5.0, 1.0))
             + 0.3 * LEAST(
                 (CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                      w -> list_contains(['the','and','of','to','is','el','la','de','que','los',
                                          'le','les','des','est','der','die','das','und','ist',
                                          '的','是','了','在','我'], w))) AS DOUBLE)
                  / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1)) * 4.0, 1.0),
             6) AS qs
      FROM documents),
    survivors AS (SELECT doc_id, text FROM q WHERE qs >= 0.3),
    reps AS (SELECT MIN(doc_id) AS doc_id FROM survivors GROUP BY text),
    kept AS (SELECT s.doc_id, s.text FROM survivors s JOIN reps USING (doc_id)),
    samp AS (
      SELECT doc_id, text FROM kept
      WHERE ROUND(CAST(('0x' || substr(md5('s42' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS DOUBLE) / 1000000.0, 6) < 0.5),
    w AS (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 END AS n_tokens
          FROM samp),
    cum AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      FROM w)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(b // 128 AS BIGINT) AS pack_id,
           CAST(b % 128 AS BIGINT) AS offset_in_pack,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE (b + n_tokens - 1) // 128 - b // 128 + 1 END AS BIGINT) AS n_packs
    FROM cum
    """,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end training-data pipeline: quality filter
    (score ≥ 0.3) → exact dedup (min-id representative) →
    deterministic 50% sample → sequence packing. Every stage is the
    already-tested operator; this query is their composition in one
    DAG — the shape a real 100 TB curation run takes (filter and
    sample are scan-side projections; dedup is the only text-keyed
    shuffle; packing shuffles 16-byte rows)."""
    from aws_datalake_spark.operators.dedup import exact_dedup
    from aws_datalake_spark.operators.sampling import hash_uniform
    from aws_datalake_spark.operators.text import quality_score

    d = quality_score(t(spark, sf_dir, "documents"))
    survivors = d.filter(F.col("quality_score") >= 0.3).select("doc_id", "text")
    reps = exact_dedup(survivors).select("doc_id")
    kept = survivors.join(reps, "doc_id", "left_semi")
    sampled = kept.filter(F.round(hash_uniform(F.col("doc_id")), 6) < 0.5)
    return pack_sequences(sampled, budget=128)


@query(
    "llm_chunk_documents",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE CAST(FLOOR(CAST(len(toks) - 64 + 47 AS DOUBLE) / 48.0)
                            AS BIGINT) + 1 END AS nc
      FROM toks WHERE len(toks) > 0
    ), ex AS (
      SELECT doc_id, CAST(unnest(range(nc)) AS INT) AS chunk_id, toks
      FROM base
    )
    SELECT doc_id, chunk_id,
           array_to_string(
             list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' '
           ) AS chunk_text,
           CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
                AS INT) AS n_chunk_tokens
    FROM ex
    """,
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping token chunking (64-token windows,
    16-token overlap) — operators/packing.py:chunk_documents."""
    from aws_datalake_spark.operators.packing import chunk_documents

    return chunk_documents(
        t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@query(
    "llm_mixing_weights",
    oracle=f"""
    WITH d AS (
      SELECT source, {_NTOK} AS nt FROM documents
    ), grp AS (
      SELECT source, COUNT(*) AS n_docs, SUM(nt) AS n_weight
      FROM d GROUP BY 1
    ), scaled AS (
      SELECT source, n_docs, n_weight,
             CAST(ROUND(SQRT(CAST(n_weight AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS s
      FROM grp
    ), tot AS (
      SELECT SUM(s) AS t FROM scaled
    )
    SELECT source, n_docs, CAST(n_weight AS BIGINT) AS n_weight,
           CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS weight
    FROM scaled CROSS JOIN tot
    """,
)
def llm_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature mixing weights per source
    (operators/sampling.py:mixing_weights) over whitespace token
    counts."""
    from aws_datalake_spark.operators.sampling import mixing_weights
    from aws_datalake_spark.operators.text import token_count_ws

    docs = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count_ws("text").cast("long")
    )
    return mixing_weights(docs, group_col="source", weight_col="n_tokens")


@query(
    "llm_budgeted_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {_NTOK} AS nt FROM documents
    ), grp AS (
      SELECT source, SUM(nt) AS n_weight FROM d GROUP BY 1
    ), scaled AS (
      SELECT source, n_weight,
             CAST(ROUND(SQRT(CAST(n_weight AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS s
      FROM grp
    ), tot AS (
      SELECT SUM(s) AS t FROM scaled
    ), rates AS (
      SELECT source,
             CASE WHEN n_weight > 0 THEN
               LEAST(1.0,
                     ROUND(CAST(s AS DOUBLE) / CAST(t AS DOUBLE) * 10000.0)
                     / CAST(n_weight AS DOUBLE))
             ELSE 0.0 END AS rate
      FROM scaled CROSS JOIN tot
    )
    SELECT doc_id, d.source, rate
    FROM d JOIN rates USING (source)
    WHERE ROUND(CAST({_H60_ID} % 1000000 AS DOUBLE) / 1000000.0, 6) < rate
    """,
)
def llm_budgeted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full data-mixing recipe: sqrt-temperature weights allocate a
    10k-token budget across sources; each doc kept iff its
    content-stable uniform clears its source's rate
    (operators/sampling.py:budgeted_sample)."""
    from aws_datalake_spark.operators.sampling import budgeted_sample
    from aws_datalake_spark.operators.text import token_count_ws

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count_ws("text").cast("long").alias("n_tokens")
    )
    return budgeted_sample(docs, token_budget=10000).select(
        "doc_id", "source", "rate"
    )


@query(
    "llm_rag_index",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE CAST(FLOOR(CAST(len(toks) - 64 + 47 AS DOUBLE) / 48.0)
                            AS BIGINT) + 1 END AS nc
      FROM toks WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(unnest(range(nc)) AS INT) AS chunk_id,
           64 AS n_dims, TRUE AS unit_norm
    FROM base
    """,
)
def llm_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG indexing DAG: overlapping chunking → per-chunk
    embedding (Arrow-batched encoder stub) — all narrow stages, so
    indexing 100 TB is scan-bound with zero shuffles. The oracle
    checks the verifiable contract (every chunk present, one unit-norm
    64-dim vector each); vector values are the stub's, covered by
    unit tests."""
    from aws_datalake_spark.operators.multimodal import embed_documents
    from aws_datalake_spark.operators.packing import chunk_documents

    chunks = chunk_documents(
        t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    ).withColumn(
        "chunk_key",
        F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_id"),
    )
    emb = embed_documents(
        chunks.select("chunk_key", F.col("chunk_text").alias("text")),
        dim=64,
        id_col="chunk_key",
    )
    norm2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        (F.col("chunk_key") / F.lit(1_000_000)).cast("long").alias("doc_id"),
        (F.col("chunk_key") % F.lit(1_000_000)).cast("int").alias("chunk_id"),
        F.size("embedding").alias("n_dims"),
        (F.abs(F.sqrt(norm2) - F.lit(1.0)) < F.lit(1e-3)).alias("unit_norm"),
    )


@query(
    "llm_priority_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, CAST({_NTOK} AS DOUBLE) AS w,
             CAST(({_H60_ID} % 1000000) AS DOUBLE) / 1000000.0 AS u
      FROM documents
      WHERE {_NTOK} > 0
    ), p AS (
      SELECT doc_id, w, u / w AS priority FROM d
    ), top AS (
      SELECT doc_id, w, priority FROM p
      ORDER BY priority, doc_id LIMIT 201
    ), win AS (
      SELECT doc_id, w, priority,
             ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rn,
             MAX(priority) OVER () AS tau,
             COUNT(*) OVER () AS cnt
      FROM top
    )
    SELECT doc_id, w, priority,
           CASE WHEN cnt = 201 THEN GREATEST(w, 1.0 / tau) ELSE w END AS w_est
    FROM win WHERE rn <= 200
    """,
)
def llm_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted 200-doc sample without replacement (priority
    sampling, operators/sampling.py:priority_sample): long documents
    are proportionally more likely to be kept, and summing w_est over
    the sample unbiasedly estimates the corpus token total — the
    principled way to subsample a corpus for pilot training runs."""
    from aws_datalake_spark.operators.sampling import priority_sample
    from aws_datalake_spark.operators.text import token_count_ws

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_ws")
    )
    return priority_sample(docs, 200, weight_col="n_ws", id_col="doc_id")


@query(
    "llm_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), bucketed AS (
      SELECT doc_id,
             (('0x' || substr(md5(w), 1, 15))::BIGINT % 256) AS b
      FROM toks
    ), tgt AS (
      SELECT b.b AS b FROM bucketed b
      JOIN documents d ON b.doc_id = d.doc_id WHERE d.lang = 'en'
    ), s_hist AS (SELECT b, COUNT(*) AS s_b FROM bucketed GROUP BY b),
    t_hist AS (SELECT b, COUNT(*) AS t_b FROM tgt GROUP BY b),
    totals AS (
      SELECT (SELECT COUNT(*) FROM bucketed) AS s_tot,
             (SELECT COUNT(*) FROM tgt) AS t_tot
    ), ratio AS (
      SELECT g.b,
             ROUND(((COALESCE(t_hist.t_b, 0) + 0.5)
                      / (CAST(totals.t_tot AS DOUBLE) + 0.5 * 256))
                   / ((COALESCE(s_hist.s_b, 0) + 0.5)
                      / (CAST(totals.s_tot AS DOUBLE) + 0.5 * 256)), 6) AS r
      FROM (SELECT range AS b FROM range(256)) g
      LEFT JOIN s_hist ON g.b = s_hist.b
      LEFT JOIN t_hist ON g.b = t_hist.b
      CROSS JOIN totals
    ), per_bucket AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bucketed GROUP BY doc_id, b
    ), iw AS (
      SELECT doc_id,
             CAST(SUM(CAST(ROUND(c * r * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS imp_weight
      FROM per_bucket JOIN ratio ON per_bucket.b = ratio.b
      GROUP BY doc_id
    ), d AS (
      SELECT doc_id, imp_weight AS w,
             CAST(({_H60_ID} % 1000000) AS DOUBLE) / 1000000.0 AS u
      FROM iw WHERE imp_weight > 0
    ), p AS (
      SELECT doc_id, w, u / w AS priority FROM d
    ), top AS (
      SELECT doc_id, w, priority FROM p
      ORDER BY priority, doc_id LIMIT 101
    ), win AS (
      SELECT doc_id, w, priority,
             ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rn,
             MAX(priority) OVER () AS tau,
             COUNT(*) OVER () AS cnt
      FROM top
    )
    SELECT doc_id, w, priority,
           CASE WHEN cnt = 101 THEN GREATEST(w, 1.0 / tau) ELSE w END AS w_est
    FROM win WHERE rn <= 100
    """,
)
def llm_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DSIR recipe end-to-end: hashed-unigram importance
    weights toward the English target (sampling.py:
    importance_weights), then priority sampling 100 docs WITH those
    weights — importance RESAMPLING, not just scoring. Target-like
    docs are proportionally more likely to survive, and w_est keeps
    the sample's weighted totals unbiased for the corpus."""
    from aws_datalake_spark.operators.sampling import (
        importance_weights,
        priority_sample,
    )

    docs = t(spark, sf_dir, "documents")
    iw = importance_weights(docs, docs.filter(F.col("lang") == "en"),
                            n_buckets=256)
    return priority_sample(iw, 100, weight_col="imp_weight", id_col="doc_id")


@query(
    "llm_corpus_pipeline_v2",
    oracle=f"""
    WITH words0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ), segs AS (
      SELECT doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT) AS seg_idx,
             STRING_AGG(w, ' ' ORDER BY ord) AS seg
      FROM words0 GROUP BY doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT)
    ), boiler AS (
      SELECT seg FROM (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
      ) WHERE df >= 20
    ), kept AS (
      SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)
    ), clean AS (
      SELECT k.doc_id,
             STRING_AGG(k.seg, ' ' ORDER BY k.seg_idx) AS text,
             ANY_VALUE(d.lang) AS lang
      FROM kept k JOIN documents d ON k.doc_id = d.doc_id
      GROUP BY k.doc_id
    ), toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM clean
    ), bucketed AS (
      SELECT doc_id,
             (('0x' || substr(md5(w), 1, 15))::BIGINT % 256) AS b
      FROM toks
    ), tgt AS (
      SELECT b.b AS b FROM bucketed b
      JOIN clean c ON b.doc_id = c.doc_id WHERE c.lang = 'en'
    ), s_hist AS (SELECT b, COUNT(*) AS s_b FROM bucketed GROUP BY b),
    t_hist AS (SELECT b, COUNT(*) AS t_b FROM tgt GROUP BY b),
    totals AS (
      SELECT (SELECT COUNT(*) FROM bucketed) AS s_tot,
             (SELECT COUNT(*) FROM tgt) AS t_tot
    ), ratio AS (
      SELECT g.b,
             ROUND(((COALESCE(t_hist.t_b, 0) + 0.5)
                      / (CAST(totals.t_tot AS DOUBLE) + 0.5 * 256))
                   / ((COALESCE(s_hist.s_b, 0) + 0.5)
                      / (CAST(totals.s_tot AS DOUBLE) + 0.5 * 256)), 6) AS r
      FROM (SELECT range AS b FROM range(256)) g
      LEFT JOIN s_hist ON g.b = s_hist.b
      LEFT JOIN t_hist ON g.b = t_hist.b
      CROSS JOIN totals
    ), per_bucket AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bucketed GROUP BY doc_id, b
    ), iw AS (
      SELECT doc_id,
             CAST(SUM(CAST(ROUND(c * r * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS imp_weight
      FROM per_bucket JOIN ratio ON per_bucket.b = ratio.b
      GROUP BY doc_id
    ), d AS (
      SELECT doc_id, imp_weight AS w,
             CAST(({_H60_ID} % 1000000) AS DOUBLE) / 1000000.0 AS u
      FROM iw WHERE imp_weight > 0
    ), p AS (
      SELECT doc_id, w, u / w AS priority FROM d
    ), top AS (
      SELECT doc_id, w, priority FROM p
      ORDER BY priority, doc_id LIMIT 101
    ), win AS (
      SELECT doc_id, w, priority,
             ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rn,
             MAX(priority) OVER () AS tau,
             COUNT(*) OVER () AS cnt
      FROM top
    )
    SELECT doc_id, w, priority,
           CASE WHEN cnt = 101 THEN GREATEST(w, 1.0 / tau) ELSE w END AS w_est
    FROM win WHERE rn <= 100
    """,
)
def llm_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 curation chain composed end-to-end: CCNet
    boilerplate removal (segment_dedup) → DSIR importance weighting
    of the CLEANED text toward the English target → priority
    resampling of 100 docs with the unbiased estimator. Each stage is
    individually oracle-verified (llm_segment_dedup,
    llm_importance_weights, llm_priority_sample); this query proves
    the composition — weights computed on post-dedup text, sampling
    driven by those weights — hash-matches the same chain in SQL."""
    from aws_datalake_spark.operators.sampling import (
        importance_weights,
        priority_sample,
    )
    from aws_datalake_spark.operators.segment_dedup import drop_boilerplate

    docs = t(spark, sf_dir, "documents")
    cleaned = (
        drop_boilerplate(docs, k=2, min_df=20)
        .filter(F.col("n_kept") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", F.col("clean_text").alias("text"), "lang")
    )
    iw = importance_weights(
        cleaned, cleaned.filter(F.col("lang") == "en"), n_buckets=256
    )
    return priority_sample(iw, 100, weight_col="imp_weight", id_col="doc_id")


_BUDGET_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.07}
_BUDGET_TOTAL = 1_000_000

_BUDGET_W6_CASE = "CASE source " + " ".join(
    f"WHEN '{k}' THEN {int(round(v * 1_000_000))}"
    for k, v in sorted(_BUDGET_WEIGHTS.items())
) + " ELSE 30000 END"


@query(
    "llm_epoch_plan",
    oracle=f"""
    WITH d AS (SELECT source, {_NTOK} AS nt FROM documents),
    grp AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS avail_tokens
      FROM d GROUP BY 1
    ), planned AS (
      SELECT source, n_docs, avail_tokens,
             CAST(CAST({_BUDGET_TOTAL} AS BIGINT)
                  * CAST({_BUDGET_W6_CASE} AS BIGINT) // 1000000 AS BIGINT)
               AS budget_tokens
      FROM grp)
    SELECT source, n_docs, avail_tokens, budget_tokens,
           CAST(CASE WHEN avail_tokens > 0
                THEN budget_tokens * 1000 // avail_tokens
                ELSE 0 END AS BIGINT) AS epochs_x1000
    FROM planned
    """,
)
def llm_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget / epoch planner (LLaMA-style data
    recipe): target mixing weights × global token budget → each
    source's allocation and fixed-point repeat factor
    (operators/sampling.py:token_budget_plan). One per-source
    aggregate over a two-column scan."""
    from aws_datalake_spark.operators.sampling import token_budget_plan
    from aws_datalake_spark.operators.text import token_count_ws

    docs = t(spark, sf_dir, "documents").select(
        "source", token_count_ws("text").cast("long").alias("n_tokens")
    )
    return token_budget_plan(
        docs, _BUDGET_WEIGHTS, _BUDGET_TOTAL, default_weight=0.03
    )


_BPACK_CLS = (
    "CASE WHEN n<=1 THEN 0 WHEN n<=2 THEN 1 WHEN n<=4 THEN 2 WHEN n<=8 THEN 3 "
    "WHEN n<=16 THEN 4 WHEN n<=32 THEN 5 WHEN n<=64 THEN 6 ELSE 7 END"
)

_BPACK_SQL = f"""
    WITH w AS (SELECT doc_id, {_NTOK} AS n FROM documents),
    f AS (SELECT doc_id, n FROM w WHERE n > 0 AND n <= 128),
    cls AS (SELECT doc_id, n, {_BPACK_CLS} AS p FROM f),
    r AS (SELECT doc_id, n, p,
          ROW_NUMBER() OVER (PARTITION BY p ORDER BY doc_id) - 1 AS r
          FROM cls)
"""


@query(
    "llm_bucket_packing",
    oracle=_BPACK_SQL + """
    SELECT doc_id, CAST(n AS INT) AS n_tokens, CAST(p AS INT) AS len_class,
           CAST(p * 1099511627776 + r // (128 // (1 << p)) AS BIGINT) AS pack_id,
           CAST(r % (128 // (1 << p)) AS BIGINT) AS slot
    FROM r
    """,
)
def llm_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT packing (operators/packing.py:bucket_pack) — the
    SFT/instruction-tuning packer: each doc lands whole in one
    128-token pack via power-of-two length-class shelves. The oracle
    re-derives class, rank, pack and slot with a per-class
    ROW_NUMBER, so an off-by-one in the distributed grouped prefix
    sum (the no-global-window rank) hash-mismatches."""
    from aws_datalake_spark.operators.packing import bucket_pack

    return bucket_pack(t(spark, sf_dir, "documents"), budget=128)


@query(
    "llm_packing_efficiency",
    oracle=_BPACK_SQL + """
    , agg AS (
      SELECT p, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS used_tokens,
             128 // (1 << p) AS cap
      FROM r GROUP BY p)
    SELECT CAST(p AS INT) AS len_class,
           CAST(n_docs AS BIGINT) AS n_docs,
           used_tokens,
           CAST((n_docs + cap - 1) // cap AS BIGINT) AS n_packs,
           CAST(used_tokens AS DOUBLE)
             / CAST(((n_docs + cap - 1) // cap) * 128 AS DOUBLE) AS fill_rate
    FROM agg
    """,
)
def llm_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report for the no-split packer: per length
    class, docs, used tokens, pack count, and fill rate (used /
    pack-capacity). THE metric that decides budget and class
    granularity for an SFT data build — fill_rate far below 1.0
    means the packer is burning compute on pad tokens. Derived from
    the same deterministic packing, groups-sized aggregate."""
    from aws_datalake_spark.operators.packing import bucket_pack

    packs = bucket_pack(t(spark, sf_dir, "documents"), budget=128)
    cap = F.expr("128 div (1 << len_class)")
    return (
        packs.groupBy("len_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("used_tokens"),
        )
        .select(
            "len_class",
            F.col("n_docs").cast("long").alias("n_docs"),
            "used_tokens",
            F.expr("(n_docs + (128 div (1 << len_class)) - 1)"
                   " div (128 div (1 << len_class))").cast("long").alias("n_packs"),
            (
                F.col("used_tokens").cast("double")
                / (
                    F.expr("(n_docs + (128 div (1 << len_class)) - 1)"
                           " div (128 div (1 << len_class))") * F.lit(128)
                ).cast("double")
            ).alias("fill_rate"),
        )
    )
