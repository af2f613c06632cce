"""Round-7-session additions (certify in the round-7/8 windows):
governance + curation operators — k-anonymity release gate,
histogram-matched mixture rebalancing, eval-contamination coverage,
exact grouped mode, quality-aware dedup representatives.

All new surface beyond SURVEY.md §2 (the reference has none of
these); each pairs a scalable Spark plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

# ---------------------------------------------------------------------------
# k-anonymity audit (release gate)
# ---------------------------------------------------------------------------


@query(
    "q_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS violates
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 5
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate (operators/dq.py:k_anonymity_audit):
    quasi-identifier combos (nation, segment, balance bucket) whose
    group size is below k=5 — each is a re-identification risk the
    release must generalize or suppress. ONE map-combinable
    aggregate; the corpus collapses to |combos| rows before the
    filter."""
    from aws_datalake_spark.operators.dq import k_anonymity_audit

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500.0).alias("bal_bucket"),
    )
    return k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment", "bal_bucket"], k=5
    ).where(F.col("violates"))


# ---------------------------------------------------------------------------
# histogram-matched mixture rebalancing
# ---------------------------------------------------------------------------

_HM_TARGET = {"en": 4, "zh": 3, "fr": 3}
_HM_W = sum(_HM_TARGET.values())
_HM_SQL_HASH = (
    "('0x' || substr(md5('hm' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    " % 1000000"
)


@query(
    "llm_histogram_match",
    oracle=f"""
    WITH tgt AS (
      SELECT * FROM (VALUES ('en', 4), ('zh', 3), ('fr', 3)) AS v(lang, w)
    ),
    counts AS (
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_before, t.w
      FROM documents d JOIN tgt t USING (lang)
      GROUP BY d.lang, t.w
    ),
    m AS (SELECT MIN(n_before * {_HM_W} // w) AS m FROM counts),
    rates AS (
      SELECT lang, n_before, w,
             (SELECT m FROM m) * w // {_HM_W} AS target_rows,
             ((SELECT m FROM m) * w // {_HM_W}) * 1000000 // n_before AS thr
      FROM counts
    ),
    kept AS (
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM documents d JOIN rates r USING (lang)
      WHERE {_HM_SQL_HASH} < r.thr
      GROUP BY d.lang
    )
    SELECT r.lang, r.n_before, COALESCE(k.n_kept, 0) AS n_kept,
           CAST(r.w AS INT) AS target_weight, r.target_rows
    FROM rates r LEFT JOIN kept k USING (lang)
    """,
)
def llm_histogram_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing by rejection sampling
    (operators/sampling.py:histogram_match): force the language
    distribution to 40/30/30 en/zh/fr regardless of crawl skew —
    exact integer thresholds (DIV arithmetic both engines), content-
    stable hash acceptance, filter-only plan (two scans, zero corpus
    shuffles). Returns the per-bin rebalance report."""
    from aws_datalake_spark.operators.sampling import histogram_match

    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    _, report = histogram_match(d, "lang", _HM_TARGET, id_col="doc_id")
    return report.select(
        "lang", "n_before", "n_kept",
        F.col("target_weight").cast("int").alias("target_weight"),
        "target_rows",
    )


# ---------------------------------------------------------------------------
# eval-contamination coverage report
# ---------------------------------------------------------------------------


@query(
    "llm_contamination_report",
    oracle=f"""
    WITH ev AS (
      SELECT doc_id AS eval_id,
             array_to_string(({_TOKS})[1:10], ' ') AS text
      FROM documents WHERE doc_id % 40 = 0
    ),
    eg AS (
      SELECT DISTINCT eval_id, s FROM (
        SELECT eval_id,
               unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
        FROM (SELECT eval_id, {_TOKS} AS t FROM ev))
      WHERE s IS NOT NULL
    ),
    cg AS (
      SELECT DISTINCT s FROM (
        SELECT unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
        FROM (SELECT {_TOKS} AS t FROM documents))
      WHERE s IS NOT NULL
    ),
    hits AS (
      SELECT eg.eval_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN cg.s IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM eg LEFT JOIN cg ON cg.s = eg.s
      GROUP BY eg.eval_id
    )
    SELECT e.eval_id,
           COALESCE(h.n_grams, 0) AS n_grams,
           COALESCE(h.n_hit, 0) AS n_hit,
           CASE WHEN COALESCE(h.n_grams, 0) > 0
                THEN ROUND(CAST(h.n_hit AS DOUBLE) / h.n_grams, 6)
                ELSE 0.0 END AS coverage
    FROM ev e LEFT JOIN hits h USING (eval_id)
    """,
)
def llm_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-doc contamination coverage
    (operators/decontam.py:contamination_coverage): fraction of each
    benchmark item's distinct 3-gram shingles present anywhere in
    the training corpus — the audit that says WHICH eval rows leak
    and how fully (decontaminate() is the corpus-side complement).
    Eval suite here = the first 10 tokens of every 40th document
    (guaranteed partial overlap). Corpus grams reduce to distinct
    8-byte hash60 longs; text never shuffles."""
    from aws_datalake_spark.operators.decontam import contamination_coverage
    from aws_datalake_spark.operators.text import tokens_ws

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 40 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(" ", F.slice(tokens_ws(F.col("text")), 1, 10)).alias("text"),
    )
    return contamination_coverage(docs, ev, k=3)


# ---------------------------------------------------------------------------
# exact grouped mode
# ---------------------------------------------------------------------------


@query(
    "q_group_mode",
    oracle="""
    SELECT user_id, mode_value, mode_n FROM (
      SELECT user_id, event_type AS mode_value,
             CAST(COUNT(*) AS BIGINT) AS mode_n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with deterministic lowest-value tiebreak
    (operators/stats.py:group_mode): each user's most frequent event
    type. Corpus collapses in ONE map-combinable (group, value)
    aggregate; the ranking window sees only the aggregated frame —
    window-above-aggregate discipline."""
    from aws_datalake_spark.operators.stats import group_mode

    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    return group_mode(e, "user_id", "event_type")


# ---------------------------------------------------------------------------
# quality-aware dedup representatives
# ---------------------------------------------------------------------------

# quality-score SQL over an arbitrary (doc_id, text) CTE named `c`
# (llm_text._QUALITY_SQL hardcodes FROM documents + a source column)
_Q_STOPWORDS_SQL = None  # filled below to avoid import cycles at module load


def _quality_sql_over_c() -> str:
    from aws_datalake_spark.queries.llm_text import _STOPWORDS_SQL

    return f"""
      SELECT doc_id,
             ROUND(
               0.4 * LEAST(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - LEAST(
                 (CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                  / GREATEST(length(text), 1)) * 5.0, 1.0))
             + 0.3 * LEAST(
                 (CAST(len(list_filter({_TOKS},
                      w -> list_contains([{_STOPWORDS_SQL}], w))) AS DOUBLE)
                  / GREATEST(len({_TOKS}), 1)) * 4.0, 1.0),
             6) AS quality_score
      FROM c"""


def _cluster_rep_oracle() -> str:
    from aws_datalake_spark.queries.llm_dedup import (
        _CLUSTER_CORPUS,
        _CLUSTER_PAIRS,
    )

    return f"""
    WITH RECURSIVE c AS ({_CLUSTER_CORPUS}),
    {_CLUSTER_PAIRS},
    q AS ({_quality_sql_over_c()}),
    members AS (
      SELECT comp.cluster_id, comp.node AS doc_id, q.quality_score
      FROM comp JOIN q ON q.doc_id = comp.node
    )
    SELECT cluster_id, rep_id, rep_score, n_members FROM (
      SELECT cluster_id, doc_id AS rep_id, quality_score AS rep_score,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS n_members,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY quality_score DESC, doc_id) AS rn
      FROM members
    ) WHERE rn = 1
    """


@query("llm_cluster_best_rep", oracle=_cluster_rep_oracle())
def llm_cluster_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representative selection
    (operators/dedup_cluster.py:quality_representatives): for every
    near-dup cluster keep the member with the HIGHEST heuristic
    quality score (tie → lowest id) instead of min-id keeping, which
    discards the best-written copy whenever it isn't the oldest.
    Composes the LSH→connected-components cluster stack with the
    quality scorer; only (id, score) pairs reach the ranking window."""
    from aws_datalake_spark.operators.dedup import minhash_lsh_pairs
    from aws_datalake_spark.operators.dedup_cluster import (
        connected_components,
        quality_representatives,
    )
    from aws_datalake_spark.operators.text import quality_score
    from aws_datalake_spark.queries.llm_dedup import _cluster_corpus

    corpus = _cluster_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, num_hashes=8, bands=4, jaccard_threshold=0.5
    )
    comp = connected_components(pairs)
    scored = quality_score(corpus).select("doc_id", "quality_score")
    return quality_representatives(scored, comp)


# ---------------------------------------------------------------------------
# Gopher-rules composite release gate
# ---------------------------------------------------------------------------

_STOP_SQL = None  # computed lazily below (import-cycle hygiene)


def _gopher_oracle() -> str:
    from aws_datalake_spark.operators.text import LANG_MARKERS

    stop = ", ".join(f"'{w}'" for ws in LANG_MARKERS.values() for w in ws)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             length(regexp_replace(text, '\\s', '', 'g')) AS chars,
             CASE WHEN trim(text) = '' THEN []
                  ELSE {_TOKS} END AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, chars, len(t) AS nw,
             len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS na,
             len(list_intersect(list_distinct(t), [{stop}])) AS ns,
             t
      FROM tok
    ),
    g2 AS (
      SELECT doc_id, g, COUNT(*) AS cnt FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
          CASE WHEN i + 1 <= len(t) THEN t[i] || ' ' || t[i+1] END)) AS g
        FROM base) WHERE g IS NOT NULL GROUP BY doc_id, g
    ),
    a2 AS (SELECT doc_id, SUM(cnt) AS n2, MAX(cnt) AS top2 FROM g2 GROUP BY doc_id),
    g3 AS (
      SELECT doc_id, g, COUNT(*) AS cnt FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
          CASE WHEN i + 2 <= len(t)
               THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS g
        FROM base) WHERE g IS NOT NULL GROUP BY doc_id, g
    ),
    a3 AS (SELECT doc_id, SUM(cnt) AS n3,
                  COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup3
           FROM g3 GROUP BY doc_id),
    f AS (
      SELECT b.doc_id,
             CAST(b.nw AS BIGINT) AS n_words,
             (b.nw >= 10 AND b.nw <= 100000) AS r_words,
             (3 * b.nw <= b.chars AND b.chars <= 10 * b.nw) AS r_mean_len,
             (5 * b.na >= 4 * b.nw) AS r_alpha,
             (b.ns >= 2) AS r_stop,
             (100 * COALESCE(a2.top2, 0) <= 18 * COALESCE(a2.n2, 0)) AS r_bigram,
             (100 * COALESCE(a3.dup3, 0) <= 30 * COALESCE(a3.n3, 0)) AS r_trigram
      FROM base b
      LEFT JOIN a2 ON a2.doc_id = b.doc_id
      LEFT JOIN a3 ON a3.doc_id = b.doc_id
    )
    SELECT *,
           (r_words AND r_mean_len AND r_alpha AND r_stop AND r_bigram
            AND r_trigram) AS passes
    FROM f
    """


@query("llm_gopher_rules", oracle=_gopher_oracle())
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate
    (operators/text.py:gopher_rules — Rae et al. 2021 §A1.1 rules as
    a mapper-only pass): word-count / mean-word-length / alpha-word /
    stopword-presence / top-bigram / dup-trigram flags and the
    conjunctive verdict, every threshold a cross-multiplied integer
    comparison so the booleans hash-match exactly. Zero shuffles —
    the n-gram occupancy stats run-length encode each doc's sorted
    gram array in place."""
    from aws_datalake_spark.operators.text import gopher_rules

    return gopher_rules(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# mixed-language (code-switching) detection
# ---------------------------------------------------------------------------


def _mixed_lang_oracle() -> str:
    from aws_datalake_spark.operators.text import LANG_MARKERS

    branches = " ".join(
        "WHEN list_has_any(regexp_split_to_array(trim(sentence), '\\s+'), ["
        + ", ".join(f"'{w}'" for w in words)
        + f"]) THEN '{lang}'"
        for lang, words in LANG_MARKERS.items()
    )
    return f"""
    WITH s AS (
      SELECT doc_id, sentence FROM (
        SELECT doc_id,
               trim(unnest(string_split_regex(text, '[.!?]+'))) AS sentence
        FROM documents)
      WHERE sentence <> ''
    ),
    langs AS (
      SELECT doc_id, CASE {branches} ELSE 'und' END AS lang FROM s
    ),
    per AS (
      SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM langs GROUP BY doc_id, lang
    )
    SELECT doc_id, n_sentences, dominant_lang, n_dominant,
           (10 * n_dominant < 7 * n_sentences) AS mixed
    FROM (
      SELECT doc_id, lang AS dominant_lang, n AS n_dominant,
             CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_sentences,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n DESC, lang) AS rn
      FROM per
    ) WHERE rn = 1
    """


@query("llm_mixed_lang", oracle=_mixed_lang_oracle())
def llm_mixed_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-consistency report
    (operators/text.py:mixed_language_stats): sentence-level marker
    langid → dominant language per doc (tie → lexicographically
    first) → ``mixed`` flag when the dominant share is < 70%
    (integer comparison). Detects code-switching and boilerplate
    injection; one explode + one (doc, lang) aggregate, ranking
    window above the aggregate."""
    from aws_datalake_spark.operators.text import mixed_language_stats

    return mixed_language_stats(t(spark, sf_dir, "documents"))
