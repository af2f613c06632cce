"""Text-analysis queries (north star): token counting, language ID,
quality scoring, fingerprinting — each oracle-checked against the
same deterministic formulas in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.operators.text import (
    LANG_MARKERS,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count_bpe_ish,
    token_count_ws,
)
from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query
from aws_datalake_spark.scratch import scratch_dir

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def tokens_ws_col():
    from aws_datalake_spark.operators.text import tokens_ws

    return tokens_ws(F.col("text"))


@query(
    "llm_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len({_TOKS}) END AS INT) AS n_ws,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe
    FROM documents
    """,
)
def llm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting; pure JVM regex —
    the canonical 'how many tokens is this corpus' scan."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_ws("text").cast("int").alias("n_ws"),
        token_count_bpe_ish("text").cast("int").alias("n_bpe"),
    )


def _lang_case_sql() -> str:
    branches = []
    for lang, words in LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        branches.append(f"WHEN list_has_any({_TOKS}, [{arr}]) THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


@query(
    "llm_lang_id",
    oracle=f"""
    SELECT predicted_lang, COUNT(*) AS n FROM (
      SELECT {_lang_case_sql()} AS predicted_lang FROM documents)
    GROUP BY predicted_lang
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (heuristic n-gram stand-in; a model-
    backed ID would ride the multimodal mapInPandas path)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(lang_id("text").alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count("*").alias("n"))
    )


_STOPWORDS_SQL = ", ".join(
    f"'{w}'" for ws in LANG_MARKERS.values() for w in ws
)


# Shared quality-score subquery (doc_id, source, q_n_tokens,
# quality_score) — the SQL twin of operators/text.py:quality_score,
# reused by the UDAF query below.
_QUALITY_SQL = f"""
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS INT) AS q_n_tokens,
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
      FROM documents"""


@query(
    "llm_quality_scores",
    oracle=f"""
    SELECT doc_id, q_n_tokens, quality_score FROM ({_QUALITY_SQL})
    """,
)
def llm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + punctuation + stopword
    blend (public filter style), rounded for cross-engine hashing."""
    d = quality_score(t(spark, sf_dir, "documents"))
    return d.select("doc_id", F.col("q_n_tokens").cast("int"), "quality_score")


@query(
    "llm_weighted_quality_by_source",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL})
    SELECT source,
           ROUND(CAST(SUM(CAST(ROUND(quality_score * 1000000.0) AS BIGINT)
                          * CAST(q_n_tokens AS BIGINT)) AS DOUBLE)
                 / CAST(SUM(CAST(q_n_tokens AS BIGINT)) AS DOUBLE)
                 / 1000000.0, 6) AS wq
    FROM q GROUP BY source
    """,
)
def llm_weighted_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted mean quality per source via the Arrow-batched
    GROUPED_AGG pandas UDAF (functions/udaf.py) — the §2.7 UDAF
    surface. Inputs are projected to two int64 columns before the
    shuffle (no partial agg on this path; see udaf.py docstring)."""
    from aws_datalake_spark.functions.udaf import weighted_mean_q6

    q = quality_score(t(spark, sf_dir, "documents"))
    pre = q.select(
        "source",
        F.round(F.col("quality_score") * 1e6, 0).cast("long").alias("q6"),
        F.col("q_n_tokens").cast("long").alias("w"),
    )
    return pre.groupBy("source").agg(
        F.round(weighted_mean_q6("q6", "w"), 6).alias("wq")
    )


@query(
    "llm_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS w,
             CAST(generate_subscripts({_TOKS}, 1) AS BIGINT) AS pos
      FROM documents)
    SELECT doc_id,
           CAST(SUM((('0x' || substr(md5(w), 1, 15))::BIGINT % 2147483648) * pos)
             % 2305843009213693952 AS BIGINT) AS fingerprint
    FROM toks GROUP BY doc_id
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling-style content fingerprint
    (operators/text.py:doc_fingerprint)."""
    return doc_fingerprint(t(spark, sf_dir, "documents"))


@query(
    "llm_corpus_stats",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def llm_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup by (lang, source) — the reporting query a data
    curator runs before/after filtering."""
    d = t(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "llm_pii_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g'),
             'https?://[^ \\t\\n]+', '<URL>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ \\t\\n]+')) AS INT) AS n_urls
    FROM (SELECT doc_id,
                 text || CASE WHEN doc_id % 7 = 0
                              THEN ' contact bob@example.com or https://ex.org/x'
                              ELSE '' END AS text
          FROM documents)
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.py:scrub_pii): emails/URLs redacted
    and counted. Corpus seeded with synthetic PII on every 7th doc so
    the redaction provably fires."""
    from aws_datalake_spark.operators.text import scrub_pii

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact bob@example.com or https://ex.org/x")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return scrub_pii(d)


@query(
    "llm_text_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS normalized
    FROM documents
    """,
)
def llm_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form for dedup keys
    (operators/text.py:normalize_text)."""
    from aws_datalake_spark.operators.text import normalize_text

    return t(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("normalized")
    )


@query(
    "llm_sentence_split",
    oracle="""
    SELECT doc_id, sentence FROM (
      SELECT doc_id,
             trim(unnest(string_split_regex(text, '[.!?]+'))) AS sentence
      FROM documents)
    WHERE sentence <> ''
    """,
)
def llm_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via JVM explode(split)
    (operators/text.py:split_sentences); the Python-UDTF twin is
    functions/udtf.py:SentenceSplit (equivalence tested)."""
    from aws_datalake_spark.operators.text import split_sentences

    return split_sentences(t(spark, sf_dir, "documents"))


@query(
    "llm_repetition_filters",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g2 AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
          CASE WHEN i + 1 <= len(t) THEN t[i] || ' ' || t[i+1] END)) AS g
        FROM tok) WHERE g IS NOT NULL),
    g3 AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
          CASE WHEN i + 2 <= len(t)
               THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS g
        FROM tok) WHERE g IS NOT NULL),
    c2 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, g),
    c3 AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, g),
    a2 AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
               AS top_bigram_frac
      FROM c2 GROUP BY doc_id),
    a3 AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
             ROUND(CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS DOUBLE)
                   / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_trigram_frac
      FROM c3 GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac,
           COALESCE(n_trigrams, 0) AS n_trigrams,
           COALESCE(dup_trigram_frac, 0.0) AS dup_trigram_frac
    FROM documents d LEFT JOIN a2 ON a2.doc_id = d.doc_id
                     LEFT JOIN a3 ON a3.doc_id = d.doc_id
    """,
)
def llm_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: most-frequent-bigram
    fraction and duplicated-trigram fraction per doc
    (operators/text.py:repetition_features)."""
    from aws_datalake_spark.operators.text import repetition_features

    return repetition_features(t(spark, sf_dir, "documents"))


@query(
    "llm_build_vocab",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents)
    SELECT token, n, token_id FROM (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS INT)
               AS token_id
      FROM tok WHERE token <> '' GROUP BY token)
    WHERE token_id <= 100
    """,
)
def llm_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 frequency-ranked vocabulary with dense token ids —
    the tokenizer-training precursor (operators/text.py:build_vocab)."""
    from aws_datalake_spark.operators.text import build_vocab

    return build_vocab(t(spark, sf_dir, "documents"), top_k=100)


@query(
    "llm_collocation_lift",
    oracle=f"""
    WITH tt AS (SELECT {_TOKS} AS t FROM documents),
    uni AS (SELECT unnest(t) AS w FROM tt),
    ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    ntot AS (SELECT SUM(c) AS n_total FROM ucnt),
    big AS (SELECT unnest(list_transform(t, (x, i) ->
              CASE WHEN i + 1 <= len(t) THEN t[i] || ' ' || t[i+1] END)) AS g
            FROM tt),
    bcnt AS (SELECT g, COUNT(*) AS c_ab FROM big WHERE g IS NOT NULL
             GROUP BY g HAVING COUNT(*) >= 5)
    SELECT g AS bigram, CAST(c_ab AS INT) AS c_ab,
           ROUND(CAST(c_ab * n_total AS DOUBLE)
                 / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
    FROM bcnt
    JOIN ucnt ca ON ca.w = split_part(g, ' ', 1)
    JOIN ucnt cb ON cb.w = split_part(g, ' ', 2)
    CROSS JOIN ntot
    """,
)
def llm_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation lift (log-free PMI core) for phrase mining
    (operators/text.py:collocation_lift)."""
    from aws_datalake_spark.operators.text import collocation_lift

    return collocation_lift(t(spark, sf_dir, "documents"), min_count=5)


@query(
    "llm_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, unnest({_TOKS}) AS token FROM documents
    ), per_doc AS (
      SELECT source, doc_id, token, COUNT(*) AS n
      FROM toks WHERE token <> '' GROUP BY 1, 2, 3
    ), grp AS (
      SELECT source, token, SUM(n) AS tf FROM per_doc GROUP BY 1, 2
    ), dfreq AS (
      SELECT token, COUNT(*) AS docfreq FROM per_doc GROUP BY 1
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT source, token, tf, docfreq,
             CAST(tf * n_docs AS DOUBLE) / CAST(docfreq AS DOUBLE) AS score
      FROM grp JOIN dfreq USING (token) CROSS JOIN nd
    ), ranked AS (
      SELECT source, token, tf, docfreq, score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY score DESC, token) AS INT) AS rnk
      FROM scored
    )
    SELECT source, token, CAST(tf AS BIGINT) AS tf,
           CAST(docfreq AS BIGINT) AS docfreq,
           score, rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per source via log-free TF-IDF
    (tf · N/df as an exact ratio — see operators/text.py)."""
    from aws_datalake_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(t(spark, sf_dir, "documents"), top_k=5)


@query(
    "llm_rarity_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ), t2 AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), counts AS (
      SELECT token, COUNT(*) AS c_t FROM t2 GROUP BY 1
    ), tot AS (
      SELECT SUM(c_t) AS n_total FROM counts
    ), inv AS (
      SELECT doc_id,
             CAST(ROUND(CAST(n_total AS DOUBLE) / CAST(c_t AS DOUBLE)
                        * 1000000.0) AS BIGINT) AS s
      FROM t2 JOIN counts USING (token) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(s) AS DOUBLE) / 1000000.0
             / CAST(COUNT(*) AS DOUBLE) AS mean_inv_freq
    FROM inv GROUP BY 1
    """,
)
def llm_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean inverse unigram frequency — log-free surprisal
    proxy for quality filtering (operators/text.py:rarity_scores)."""
    from aws_datalake_spark.operators.text import rarity_scores

    return rarity_scores(t(spark, sf_dir, "documents"))


@query(
    "llm_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT {_TOKS} AS t FROM documents
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ), bi AS (
      SELECT t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1, COUNT(*) AS c_ab
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT bigram, w1, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(uni.c AS BIGINT) AS c_w1,
           ROUND(CAST(c_ab AS DOUBLE) / CAST(uni.c AS DOUBLE), 6) AS p_cond
    FROM bi JOIN uni ON bi.w1 = uni.w
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM estimation P(w2|w1)
    (operators/text.py:bigram_conditional)."""
    from aws_datalake_spark.operators.text import bigram_conditional

    return bigram_conditional(t(spark, sf_dir, "documents"), min_count=5)


@query(
    "llm_source_drift",
    oracle="""
    WITH b AS (
      SELECT source, COUNT(*) AS n_base FROM documents
      WHERE doc_id % 2 = 0 GROUP BY 1
    ), c AS (
      SELECT source, COUNT(*) AS n_cur FROM documents
      WHERE doc_id % 2 = 1 GROUP BY 1
    ), j AS (
      SELECT COALESCE(b.source, c.source) AS source,
             COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
      FROM b FULL OUTER JOIN c ON b.source = c.source
    ), tot AS (
      SELECT source, n_base, n_cur,
             SUM(n_base) OVER () AS t_base, SUM(n_cur) OVER () AS t_cur
      FROM j
    )
    SELECT source, CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)
             * CAST(t_cur AS DOUBLE) AS expected,
           (CAST(n_cur AS DOUBLE)
              - CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)
                * CAST(t_cur AS DOUBLE))
           * (CAST(n_cur AS DOUBLE)
              - CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)
                * CAST(t_cur AS DOUBLE))
           / (CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)
              * CAST(t_cur AS DOUBLE)) AS chi2_part
    FROM tot WHERE n_base > 0
    """,
)
def llm_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-distribution drift between two ingest batches (even/odd
    doc_id split as the stand-in) — operators/dq.py:category_drift,
    chi-square contributions per category."""
    from aws_datalake_spark.operators.dq import category_drift

    docs = t(spark, sf_dir, "documents")
    return category_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "source",
    )


def _bpe_ctes(num_merges: int = 8, min_count: int = 2) -> list[str]:
    """The chained training CTEs shared by _bpe_oracle (merge table)
    and llm_bpe_encode's oracle (round9.py), which applies the
    learned merges back onto the corpus. See _bpe_oracle for the
    two-pass padded-replace equivalence argument."""
    ctes = ["""w0 AS MATERIALIZED (
      SELECT array_to_string(list_transform(range(1, length(w)+1), i -> w[i]), ' ') AS syms,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
      WHERE w <> '' GROUP BY 1
    )"""]
    for i in range(1, num_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""p{i} AS MATERIALIZED (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS c FROM (
        SELECT n, unnest(list_transform(range(1, len(s)), j -> s[j] || ' ' || s[j+1])) AS pair
        FROM (SELECT string_split(syms, ' ') AS s, n FROM {prev})
      ) GROUP BY pair HAVING SUM(n) >= {min_count}
    )""")
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT pair, c FROM p{i} "
            f"ORDER BY c DESC, pair LIMIT 1)"
        )
        rep = f"' ' || (SELECT pair FROM t{i}) || ' '"
        new = f"' ' || (SELECT replace(pair, ' ', '') FROM t{i}) || ' '"
        ctes.append(f"""w{i} AS MATERIALIZED (
      SELECT trim(replace(replace(' ' || syms || ' ', {rep}, {new}), {rep}, {new})) AS syms, n
      FROM {prev}
    )""")
    return ctes


def _bpe_oracle(num_merges: int = 8, min_count: int = 2) -> str:
    """Chained-CTE DuckDB twin of sequential BPE (which the batched
    trainer provably equals — operators/bpe.py): one assign/apply CTE
    pair per merge, MATERIALIZED (each CTE is referenced twice;
    inlined expansion would re-scan documents 2^K times). The merge
    application is TWO successive padded LITERAL replaces: Spark's
    Java lookaround replaceAll merges every whole-symbol occurrence
    in one pass, while a padded literal replace consumes the shared
    separator space and skips alternate occurrences of XYXY-runs —
    the skipped ones are still whole-symbol afterwards (a replacement
    never spells the old pair), so a second pass merges exactly them
    and the two-pass result equals Java's single pass for any run
    length (pinned in tests/test_bpe.py)."""
    ctes = _bpe_ctes(num_merges, min_count)
    finals = [
        f"SELECT {i} AS merge_rank, pair, replace(pair, ' ', '') AS new_symbol,"
        f" c AS pair_count FROM t{i}"
        for i in range(1, num_merges + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + " UNION ALL ".join(finals) + " ORDER BY merge_rank"
    )


@query("llm_bpe_merges", oracle=_bpe_oracle())
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): the
    corpus is scanned once for word frequencies; each merge iteration
    aggregates over the vocabulary table only. Hash-certified since
    round 7 against a chained-CTE DuckDB twin (the iterative loop
    unrolls — the same integer-PageRank technique as kmeans/PQ; the
    two-pass padded-replace equivalence is documented on
    _bpe_oracle). Determinism and parity with a pure-Python reference
    BPE stay unit-tested (tests/test_bpe.py). Uses the batched
    trainer: each Spark round learns every provably-safe disjoint top
    pair, so a 32k-vocab run is ~K/batch driver round-trips instead
    of one job per merge."""
    from aws_datalake_spark.operators.bpe import bpe_merges_batched

    return bpe_merges_batched(t(spark, sf_dir, "documents"), num_merges=8)


@query(
    "llm_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT t.token FROM (
        SELECT unnest({_TOKS}) AS token FROM documents
      ) t WHERE t.token <> ''
    ), counts AS (
      SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
    ), ranked AS (
      SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk,
             SUM(n) OVER () AS total
      FROM counts
    )
    SELECT 10 AS top_k,
           CAST(SUM(CASE WHEN rnk <= 10 THEN n END) AS BIGINT) AS covered,
           CAST(MAX(total) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN rnk <= 10 THEN n END) AS DOUBLE)
             / CAST(MAX(total) AS DOUBLE) AS coverage
    FROM ranked
    """,
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage point: what fraction of all corpus tokens
    the top-10 vocabulary entries cover — the curve that sizes a
    tokenizer vocab. NO ranking window touches the unbounded
    distinct-token table (VERDICT r05 perf-weak #1): the top-10 mass
    comes from a distributed ``orderBy().limit(10)``
    (TakeOrderedAndProject — per-partition heaps) aggregated to one
    row, the corpus total from a plain aggregate over the same token
    counts, and the two one-row frames cross-join (broadcast
    scalar). The ratio is an exact integer quotient."""
    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens_ws_col()).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    covered = (
        counts.orderBy(F.desc("n"), "token")
        .limit(10)
        .agg(F.sum("n").alias("__covered"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    return covered.crossJoin(total).select(
        F.lit(10).alias("top_k"),
        F.col("__covered").cast("long").alias("covered"),
        F.col("__total").cast("long").alias("total"),
        (
            F.col("__covered").cast("double")
            / F.col("__total").cast("double")
        ).alias("coverage"),
    )


@query(
    "llm_dataset_card",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL}),
    base AS (
      SELECT d.doc_id, d.source, d.text, q.q_n_tokens, q.quality_score,
             {{LANG_CASE}} AS lang
      FROM documents d JOIN q ON d.doc_id = q.doc_id
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(q_n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
             ROUND(CAST(SUM(CAST(ROUND(quality_score * 1000000.0) AS BIGINT))
                        AS DOUBLE) / 1000000.0
                   / CAST(COUNT(*) AS DOUBLE), 6) AS avg_quality,
             ROUND((CAST(COUNT(*) AS DOUBLE)
                    - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE))
                   / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
      FROM base GROUP BY source
    ),
    lang_rank AS (
      SELECT source, lang,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, lang) AS rn
      FROM base GROUP BY source, lang
    )
    SELECT p.source, p.n_docs, p.total_tokens, p.avg_quality,
           l.lang AS top_lang, p.dup_rate
    FROM per_source p JOIN lang_rank l
      ON p.source = l.source AND l.rn = 1
    """.replace("{LANG_CASE}", _lang_case_sql()),
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the summary a training-data release
    ships: doc and token counts, mean quality, dominant language, and
    exact-duplicate rate. One grouped pass over doc-level features
    plus a language-mode window; duplicate detection groups 16-byte
    digests, never text (operators: text.quality_score, lang_id,
    dedup-style hash grouping)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.text import lang_id, quality_score

    d = quality_score(t(spark, sf_dir, "documents")).withColumn(
        "lang", lang_id(F.col("text"))
    )
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("q_n_tokens").cast("long")).alias("total_tokens"),
        F.round(
            F.sum(F.round(F.col("quality_score") * 1e6).cast("long")).cast("double")
            / F.lit(1e6)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_quality"),
        F.round(
            (
                F.count(F.lit(1)).cast("double")
                - F.countDistinct(F.md5("text")).cast("double")
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "lang")
    top_lang = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return per_source.join(F.broadcast(top_lang), "source").select(
        "source", "n_docs", "total_tokens", "avg_quality", "top_lang", "dup_rate"
    )


# --- sub-document boilerplate dedup (CCNet-style) ----------------------------

@query(
    "llm_segment_dedup",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ), segs AS (
      SELECT doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT) AS seg_idx,
             STRING_AGG(w, ' ' ORDER BY ord) AS seg
      FROM words GROUP BY doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT)
    ), boiler AS (
      SELECT seg FROM (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
      ) WHERE df >= 20
    ), kept AS (
      SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)
    ), regen AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             MD5(STRING_AGG(seg, ' ' ORDER BY seg_idx)) AS clean_md5
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_seg FROM segs GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_seg, COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.clean_md5, MD5('')) AS clean_md5
    FROM tot t LEFT JOIN regen r ON t.doc_id = r.doc_id
    """,
)
def llm_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sub-document boilerplate removal
    (operators/segment_dedup.py): 2-word segments, drop any segment
    present in ≥20 distinct docs, reassemble; emits per-doc segment
    counts plus md5 of the cleaned text (the text itself would bloat
    the compare). k=2/min_df=20 are fixture-tuned so the synthetic
    corpus actually HAS boilerplate to drop (~17% of segments)."""
    from aws_datalake_spark.operators.segment_dedup import drop_boilerplate

    docs = t(spark, sf_dir, "documents")
    out = drop_boilerplate(docs, k=2, min_df=20)
    return out.select(
        "doc_id", "n_seg", "n_kept", F.md5("clean_text").alias("clean_md5")
    )


# --- DSIR-inspired importance weighting --------------------------------------

@query(
    "llm_importance_weights",
    oracle="""
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
    )
    SELECT doc_id,
           CAST(SUM(CAST(ROUND(c * r * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS imp_weight,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM per_bucket JOIN ratio ON per_bucket.b = ratio.b
    GROUP BY doc_id
    """,
)
def llm_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-inspired importance weighting
    (operators/sampling.py:importance_weights): score every doc by
    the smoothed hashed-unigram probability ratio between the
    English subset (target) and the full corpus (source) — the
    resample-toward-target signal; feed imp_weight into
    priority_sample/budgeted_sample downstream. Log-free for
    engine-exact hashes (see operator docstring)."""
    from aws_datalake_spark.operators.sampling import importance_weights

    docs = t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return importance_weights(docs, target, n_buckets=256)


@query(
    "llm_segment_dedup_keep_first",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ), segs AS (
      SELECT doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT) AS seg_idx,
             STRING_AGG(w, ' ' ORDER BY ord) AS seg
      FROM words GROUP BY doc_id, CAST(FLOOR((ord - 1) / 2) AS BIGINT)
    ), kept AS (
      SELECT doc_id, seg_idx, seg FROM (
        SELECT s.*, ROW_NUMBER() OVER (
          PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
        FROM segs s
      ) WHERE rn = 1
    ), regen AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             MD5(STRING_AGG(seg, ' ' ORDER BY seg_idx)) AS clean_md5
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, COUNT(*) AS n_seg FROM segs GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_seg, COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.clean_md5, MD5('')) AS clean_md5
    FROM tot t LEFT JOIN regen r ON t.doc_id = r.doc_id
    """,
)
def llm_segment_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CCNet paragraph dedup (operators/segment_dedup.py:
    dedup_segments_keep_first): every distinct segment survives
    exactly once corpus-wide — at its globally-first (doc_id,
    seg_idx) occurrence — and every later occurrence is deleted;
    reassembled text md5-matched against the oracle's row_number
    formulation."""
    from aws_datalake_spark.operators.segment_dedup import (
        dedup_segments_keep_first,
    )

    docs = t(spark, sf_dir, "documents")
    out = dedup_segments_keep_first(docs, k=2)
    return out.select(
        "doc_id", "n_seg", "n_kept", F.md5("clean_text").alias("clean_md5")
    )


def _quality_exact_oracle(n_buckets: int = 64, iters: int = 10) -> str:
    """Chained-CTE DuckDB twin of the fixed-point logistic trainer
    (operators/classifier.py:train_quality_classifier_exact): the
    fixed iteration count unrolls to ``iters`` CTE triples
    (margin → error → gradient → weight update), the sigmoid is the
    SAME piecewise-literal CASE both engines evaluate on the same
    exact integers, and every divide is the shared trunc-toward-zero
    integral divide (DuckDB ``//`` ≡ Spark ``div``) — the technique
    that certified kmeans/BPE/PageRank (VERDICT r07 item 2).

    Every CTE is MATERIALIZED: w{i} and e{i} are each referenced
    twice per iteration, so DuckDB's default inlining would expand
    the 10-step chain 2^10-fold (measured: >110 s at sf0.001 inlined
    vs 0.6 s materialized)."""
    from aws_datalake_spark.operators.classifier import (
        S_SCALE,
        X_SCALE,
        sigmoid_case_sql,
    )

    sig = sigmoid_case_sql("zq", "//")
    ctes = [
        "tok AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS w"
        " FROM documents)",
        f"feat AS MATERIALIZED (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT"
        f" % {n_buckets} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt"
        f" FROM tok GROUP BY 1, 2)",
        "tot AS MATERIALIZED (SELECT doc_id, SUM(cnt) AS tot FROM feat GROUP BY 1)",
        f"x AS MATERIALIZED (SELECT f.doc_id, f.bucket, (f.cnt * {X_SCALE}) // t.tot"
        f" AS xs FROM feat f JOIN tot t USING (doc_id))",
        "y AS MATERIALIZED (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
        " AS y FROM documents)",
        "nd AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents)",
        f"w0 AS MATERIALIZED (SELECT CAST(unnest(range(0, {n_buckets})) AS BIGINT)"
        f" AS bucket, CAST(0 AS HUGEINT) AS w)",
    ]
    for i in range(iters):
        ctes.append(
            f"z{i} AS MATERIALIZED (SELECT x.doc_id, SUM(x.xs * w{i}.w) // {X_SCALE}"
            f" AS zq FROM x JOIN w{i} ON x.bucket = w{i}.bucket GROUP BY 1)"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT z.doc_id, ({sig}) - y.y * {S_SCALE} AS err"
            f" FROM z{i} z JOIN y USING (doc_id))"
        )
        ctes.append(
            f"g{i} AS MATERIALIZED (SELECT x.bucket, SUM(CAST(x.xs AS HUGEINT) * e.err)"
            f" AS g FROM x JOIN e{i} e USING (doc_id) GROUP BY 1)"
        )
        ctes.append(
            f"w{i + 1} AS MATERIALIZED (SELECT w.bucket,"
            f" w.w - COALESCE(g.g, 0) // (2 * nd.n * {X_SCALE}) AS w"
            f" FROM w{i} w LEFT JOIN g{i} g USING (bucket) CROSS JOIN nd)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f",\n"
        f"zf AS MATERIALIZED (SELECT x.doc_id, SUM(x.xs * w{iters}.w) // {X_SCALE} AS zq"
        f" FROM x JOIN w{iters} ON x.bucket = w{iters}.bucket GROUP BY 1)\n"
        f"SELECT doc_id, CAST(({sig}) AS BIGINT) AS q_score_scaled FROM zf"
    )


@query("llm_quality_classifier", oracle=_quality_exact_oracle())
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (operators/classifier.py): the
    GPT-3/LLaMA-lineage recipe — train a linear classifier over
    hashed text features with the English subset as the positive
    reference, then score every document; downstream filters keep
    high scorers. Distributed LR: per iteration one broadcast join +
    one exact-summed gradient shuffle; the only driver state is the
    weight vector. Rows-only through r07 (float sigmoid is
    transcendental); hash-certified since r08 via the exact-integer
    twin — fixed-point features/weights + a shared piecewise-literal
    sigmoid table make all 10 training iterations AND the corpus
    scoring pass identical integers in both engines. The float
    trainer remains the production path; parity/determinism pinned
    in tests/test_clustering.py."""
    from aws_datalake_spark.operators.classifier import (
        score_quality_exact,
        train_quality_classifier_exact,
    )

    docs = t(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    w = train_quality_classifier_exact(labeled, iters=10, n_buckets=64)
    return score_quality_exact(docs, w)


@query(
    "llm_lm_doc_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ), bi AS (
      SELECT t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1, COUNT(*) AS c_ab
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ), lm AS (
      SELECT bigram,
             ROUND(CAST(c_ab AS DOUBLE) / CAST(uni.c AS DOUBLE), 6) AS p_cond
      FROM bi JOIN uni ON bi.w1 = uni.w
    ), doc_bi AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ), j AS (
      SELECT doc_id,
             CASE WHEN p_cond IS NULL THEN 1 ELSE 0 END AS oov,
             COALESCE(CAST(ROUND(p_cond * 1000000.0) AS BIGINT), 0) AS p6
      FROM doc_bi LEFT JOIN lm USING (bigram)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(CAST(FLOOR((2 * SUM(p6) + COUNT(*))
                           / (2.0 * COUNT(*))) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS mean_p
    FROM j GROUP BY 1
    """,
)
def llm_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc LM predictability + OOV counts for perplexity-style
    corpus filtering (operators/text.py:lm_doc_scores) — train the
    bigram MLE on the corpus, score every document by mean bigram
    probability in exact fixed-point (log-free, so the oracle
    hash-matches bit-for-bit)."""
    from aws_datalake_spark.operators.text import lm_doc_scores

    return lm_doc_scores(t(spark, sf_dir, "documents"))


@query(
    "llm_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS dl, t FROM toks
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM base
    ), dt AS (
      SELECT doc_id, dl, w, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(t) AS w FROM base)
      WHERE w IN ('vector', 'merge', 'window')
      GROUP BY 1, 2, 3
    ), dfreq AS (
      SELECT w, COUNT(DISTINCT doc_id) AS dfc FROM dt GROUP BY 1
    ), scored AS (
      SELECT doc_id,
        CAST(ROUND(ROUND(
          ((CAST(n AS DOUBLE) - dfc + 0.5) / (dfc + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl /
              (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
        , 6) * 1000000.0) AS BIGINT) AS c6
      FROM dt JOIN dfreq USING (w) CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
           ROUND(CAST(SUM(c6) AS DOUBLE) / 1000000.0, 6) AS score
    FROM scored GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-family lexical retrieval (operators/text.py:bm25_scores)
    — the keyword half of hybrid RAG search, in the repo's log-free
    exact form (idf as the un-logged ratio; tf saturation + length
    normalization standard). Top-20 docs for a 3-term query,
    deterministic tie-break, fixed-point-exact so the oracle
    hash-matches."""
    from aws_datalake_spark.operators.text import bm25_scores

    return (
        bm25_scores(
            t(spark, sf_dir, "documents"), ["vector", "merge", "window"]
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@query(
    "llm_filter_funnel",
    oracle=f"""
    WITH q AS (
      SELECT d.doc_id, d.lang, d.text, s.q_n_tokens, s.quality_score
      FROM documents d JOIN ({_QUALITY_SQL}) s USING (doc_id)
    ), f AS (
      SELECT *,
        (lang = 'en') AS f1,
        (lang = 'en' AND q_n_tokens >= 20) AS f2,
        (lang = 'en' AND q_n_tokens >= 20 AND quality_score >= 0.5) AS f3
      FROM q
    ), dd AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM f WHERE f3
    )
    SELECT 'p0_total' AS stage, COUNT(*) AS n_docs FROM f
    UNION ALL SELECT 'p1_lang_en', COUNT(*) FROM f WHERE f1
    UNION ALL SELECT 'p2_min_tokens', COUNT(*) FROM f WHERE f2
    UNION ALL SELECT 'p3_quality', COUNT(*) FROM f WHERE f3
    UNION ALL SELECT 'p4_exact_dedup', COUNT(*) FROM dd WHERE rn = 1
    """,
)
def llm_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel observability: how many documents survive each
    successive filter stage (language -> length -> quality -> exact
    dedup) — the attrition report every corpus release ships with.
    ONE scan computes all threshold stages as conditional counts;
    only the dedup stage adds a (text-hash-keyed) exchange over the
    already-filtered survivors."""
    from pyspark.sql.window import Window

    from aws_datalake_spark.operators.text import quality_score

    q = quality_score(t(spark, sf_dir, "documents"))
    f1 = F.col("lang") == "en"
    f2 = f1 & (F.col("q_n_tokens") >= 20)
    f3 = f2 & (F.col("quality_score") >= 0.5)
    counts = q.agg(
        F.count(F.lit(1)).alias("p0_total"),
        F.count(F.when(f1, 1)).alias("p1_lang_en"),
        F.count(F.when(f2, 1)).alias("p2_min_tokens"),
        F.count(F.when(f3, 1)).alias("p3_quality"),
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    n_dedup = (
        q.filter(f3)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stages = counts.selectExpr(
        "stack(4, 'p0_total', p0_total, 'p1_lang_en', p1_lang_en,"
        " 'p2_min_tokens', p2_min_tokens, 'p3_quality', p3_quality)"
        " AS (stage, n_docs)"
    )
    return stages.unionByName(
        n_dedup.select(
            F.lit("p4_exact_dedup").alias("stage"),
            F.col("n").alias("n_docs"),
        )
    )


@query(
    "llm_seq_len_histogram",
    oracle=f"""
    WITH t AS (
      SELECT LEAST(CAST(FLOOR(len({_TOKS}) / 64.0) AS INT), 15) AS b,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok
      FROM documents
    ), h AS (
      SELECT b, COUNT(*) AS n_docs, SUM(n_tok) AS sum_tokens FROM t GROUP BY 1
    ), tot AS (SELECT SUM(n_docs) AS nd FROM h)
    SELECT b * 64 AS len_lo, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sum_tokens AS BIGINT) AS sum_tokens,
           CAST(CAST(FLOOR((2000000 * SUM(n_docs) OVER (ORDER BY b) + nd)
                           / (2.0 * nd)) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS cum_doc_share
    FROM h CROSS JOIN tot
    """,
)
def llm_seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (64-token buckets, capped) with
    cumulative document share — the planning input for context-window
    packing: bucket occupancy picks the packing length, the tail
    share tells how much truncates. One scan + one tiny ordered
    cumulative over ≤16 bucket rows."""
    from pyspark.sql.window import Window

    from aws_datalake_spark.operators.text import token_count_ws

    t_ = t(spark, sf_dir, "documents").select(
        F.least(
            F.floor(token_count_ws(F.col("text")) / 64.0).cast("int"),
            F.lit(15),
        ).alias("b"),
        token_count_ws(F.col("text")).cast("long").alias("n_tok"),
    )
    h = t_.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
    )
    total = h.agg(F.sum("n_docs").alias("nd"))
    # frame bound: the 16-bin length histogram (b is clamped to 0..15)
    w = Window.orderBy("b")
    return (
        h.crossJoin(F.broadcast(total))
        .select(
            (F.col("b") * 64).alias("len_lo"),
            F.col("n_docs").cast("long"),
            F.col("sum_tokens").cast("long"),
            (
                F.floor(
                    (F.lit(2_000_000) * F.sum("n_docs").over(w) + F.col("nd"))
                    / (F.lit(2) * F.col("nd"))
                )
                .cast("long")
                .cast("double")
                / 1_000_000.0
            ).alias("cum_doc_share"),
        )
    )


@query(
    "llm_bm25_indexed",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS dl, t FROM toks
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM base
    ), dt AS (
      SELECT doc_id, dl, w, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(t) AS w FROM base)
      WHERE w IN ('vector', 'merge', 'window')
      GROUP BY 1, 2, 3
    ), dfreq AS (
      SELECT w, COUNT(DISTINCT doc_id) AS dfc FROM dt GROUP BY 1
    ), scored AS (
      SELECT doc_id,
        CAST(ROUND(ROUND(
          ((CAST(n AS DOUBLE) - dfc + 0.5) / (dfc + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl /
              (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
        , 6) * 1000000.0) AS BIGINT) AS c6
      FROM dt JOIN dfreq USING (w) CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
           ROUND(CAST(SUM(c6) AS DOUBLE) / 1000000.0, 6) AS score
    FROM scored GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def llm_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a PERSISTED inverted index
    (operators/text.py:text_index/bm25_from_index): the corpus is
    tokenized once into postings + doc-length tables written to
    storage; the query then reads ONLY its own terms' posting rows
    (the term filter pushes down to the postings scan — the corpus
    text is never touched). Shares llm_bm25_search's oracle verbatim,
    so index-path and scan-path results are pinned identical."""

    from aws_datalake_spark.operators.text import bm25_from_index, text_index

    postings, doc_stats = text_index(t(spark, sf_dir, "documents"))
    d = scratch_dir(prefix="bm25_idx_")
    postings.write.mode("overwrite").parquet(d + "/postings")
    doc_stats.write.mode("overwrite").parquet(d + "/doc_stats")
    pi = spark.read.parquet(d + "/postings")
    ds = spark.read.parquet(d + "/doc_stats")
    return (
        bm25_from_index(pi, ds, ["vector", "merge", "window"])
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@query(
    "llm_token_budget",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_tokens) AS total, COUNT(*) AS n FROM tok
    ), b AS (
      SELECT CAST(total // 2 AS BIGINT) AS budget FROM tot
    ), s AS (
      SELECT source, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS rn,
             SUM(n_tokens) OVER (ORDER BY n_tokens, source) AS cum
      FROM tok
    ), p AS (
      SELECT MAX(CASE WHEN (budget - cum) >= (n - rn) * n_tokens
                      THEN rn ELSE 0 END) AS pvt,
             MAX(CASE WHEN (budget - cum) >= (n - rn) * n_tokens
                      THEN cum ELSE 0 END) AS pvt_cum
      FROM s, tot, b
    ), lv AS (
      SELECT pvt, pvt_cum,
             CAST(CASE WHEN n > pvt
                  THEN (budget - pvt_cum) // (n - pvt)
                  ELSE 0 END AS BIGINT) AS lvl,
             (budget - pvt_cum)
               - CAST(CASE WHEN n > pvt
                      THEN (budget - pvt_cum) // (n - pvt)
                      ELSE 0 END AS BIGINT) * (n - pvt) AS extr
      FROM p, tot, b
    )
    SELECT source, n_tokens,
           CAST(CASE WHEN total <= budget THEN n_tokens
                WHEN rn <= pvt THEN n_tokens
                ELSE lvl + (CASE WHEN rn - pvt <= extr
                              THEN 1 ELSE 0 END)
           END AS BIGINT) AS alloc
    FROM s, tot, b, lv
    """,
)
def llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fair per-source token-budget allocation by WATERFILLING
    (operators/sampling.py:waterfill_budget): spend half the corpus's
    tokens with max-min fairness — small sources keep everything,
    large sources clip to one shared water level, allocations are
    exact integers that conserve the budget. One sort-window pass,
    no iteration; the oracle re-derives the pivot arithmetic
    independently, so an off-by-one in the level or remainder
    distribution hash-mismatches.

    The half-the-corpus budget is derived IN-PLAN via
    ``budget_frac=(1, 2)`` from the window total the operator already
    computes — an ``agg(sum).collect()`` here would launch a second
    job over the same scan+groupBy DAG and read `documents` twice
    (VERDICT r03 item 2; plan-gated single scan in test_plans.py)."""
    from aws_datalake_spark.operators.sampling import waterfill_budget
    from aws_datalake_spark.operators.text import token_count_ws

    tok = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(token_count_ws(F.col("text"))).cast("long").alias("n_tokens"))
    )
    return waterfill_budget(tok, budget_frac=(1, 2), key_col="source")


@query(
    "llm_curriculum_bins",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, CAST(ROUND(quality_score * 1000000.0) AS BIGINT) AS q6
      FROM ({_QUALITY_SQL})
    ), ranked AS (
      SELECT q6, ROW_NUMBER() OVER (ORDER BY q6) AS rn,
             COUNT(*) OVER () AS n
      FROM q
    ), edges AS (
      SELECT
        MAX(CASE WHEN rn = CAST(FLOOR(0.25 * (n - 1)) AS BIGINT) + 1 THEN q6 END) AS e1,
        MAX(CASE WHEN rn = CAST(FLOOR(0.50 * (n - 1)) AS BIGINT) + 1 THEN q6 END) AS e2,
        MAX(CASE WHEN rn = CAST(FLOOR(0.75 * (n - 1)) AS BIGINT) + 1 THEN q6 END) AS e3
      FROM ranked
    )
    SELECT doc_id, q6,
           CAST(CASE WHEN q6 <= e1 THEN 0
                     WHEN q6 <= e2 THEN 1
                     WHEN q6 <= e3 THEN 2
                     ELSE 3 END AS INT) AS bin
    FROM q CROSS JOIN edges
    """,
)
def llm_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning quality tiers: EXACT quartile edges over
    the 6-dp fixed-point quality score via histogram narrowing (no
    global sort — operators/order_stats.py), then scan-side bin
    assignment (operators/sampling.py:curriculum_bins). The oracle's
    ROW_NUMBER-over-everything form is exactly the global sort the
    operator avoids."""
    from aws_datalake_spark.operators.sampling import curriculum_bins

    q = quality_score(t(spark, sf_dir, "documents"))
    return curriculum_bins(q)


@query(
    "llm_fertility_by_lang",
    oracle=f"""
    SELECT predicted_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           CASE WHEN SUM(n_ws) > 0
                THEN CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE)
                ELSE 0.0 END AS fertility
    FROM (
      SELECT {{LANG_CASE}} AS predicted_lang,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKS}) END AS n_ws,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
      FROM documents)
    GROUP BY 1
    """.replace("{LANG_CASE}", _lang_case_sql()),
)
def llm_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE-ish pieces per
    whitespace word, the standard diagnostic for sizing a
    multilingual tokenizer vocabulary (high fertility = the tokenizer
    over-fragments that language; budgets and mixing weights are
    usually corrected by it). Pure JVM lang-ID CASE + regex counts →
    one groups-sized aggregate; the fertility ratio is an exact
    integer quotient, engine-portable. Corpus text never shuffles —
    rows reduce to (lang, counts) at the scan."""
    from aws_datalake_spark.operators.text import lang_id

    per = t(spark, sf_dir, "documents").select(
        lang_id("text").alias("predicted_lang"),
        token_count_ws("text").cast("long").alias("n_ws"),
        token_count_bpe_ish("text").cast("long").alias("n_bpe"),
    )
    return per.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").alias("total_ws"),
        F.sum("n_bpe").alias("total_bpe"),
        F.when(
            F.sum("n_ws") > 0,
            F.sum("n_bpe").cast("double") / F.sum("n_ws").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
    )


@query(
    "llm_dedup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM documents GROUP BY 1
    """,
)
def llm_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication diagnostic — the dedup-pipeline health
    metric that decides WHERE dedup effort goes (a source with 30%
    exact dups gets aggressive near-dup passes; a clean one skips
    them). Texts reduce to md5 digests at the scan, so the distinct
    aggregation shuffles 16-byte hashes keyed by source, never
    document bytes — the same never-move-text posture as exact_dedup
    (operators/dedup.py)."""
    d = t(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_dups"),
        (
            (F.count(F.lit(1)) - F.countDistinct(h)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


@query(
    "llm_diversity_by_source",
    oracle=f"""
    WITH tok AS (SELECT source, {_TOKS} AS t FROM documents),
    uni AS (SELECT source, unnest(t) AS g FROM tok),
    bi AS (
      SELECT source, g FROM (
        SELECT source, unnest(list_transform(t, (x, i) ->
          CASE WHEN i + 1 <= len(t) THEN t[i] || ' ' || t[i+1] END)) AS g
        FROM tok) WHERE g IS NOT NULL),
    a1 AS (
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT g) AS n_types
      FROM uni GROUP BY 1),
    a2 AS (
      SELECT source, COUNT(*) AS n_bigrams, COUNT(DISTINCT g) AS n_bigram_types
      FROM bi GROUP BY 1)
    SELECT a1.source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr_unigram,
           CAST(n_bigram_types AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
             AS ttr_bigram
    FROM a1 JOIN a2 ON a1.source = a2.source
    """,
)
def llm_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source — unigram/bigram type-token
    ratios (distinct-n over total-n), the standard detector for
    diversity collapse in a corpus slice (templated/boilerplate
    sources score low; synthetic-data loops degrade here first).
    Grams reduce to (source, gram) at the scan; the distinct
    aggregation shuffles gram strings keyed by source — at 100 TB
    swap the gram for hash60(gram) so 8-byte ints shuffle (the
    source_overlap discipline; strings kept here for oracle
    byte-parity). Ratios are exact integer quotients."""
    from aws_datalake_spark.operators.text import ngrams

    from aws_datalake_spark.operators.text import spread

    # spread: the explode+ngram work on a one-file corpus read would
    # otherwise run on 1-2 cores (PERF §14); the bigram transform is
    # only 2 element_ats per output element, so the §21 staging is
    # not worth a checkpoint here (measured: parallelism is the
    # whole sf1 win, 3.9 s → 2.9 s)
    tok = spread(t(spark, sf_dir, "documents").select("source", "text")).select(
        "source", tokens_ws_col().alias("__toks")
    )
    uni = tok.select("source", F.explode("__toks").alias("g"))
    bi = tok.select("source", F.explode(ngrams("__toks", 2)).alias("g"))
    a1 = uni.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("g").alias("n_types"),
    )
    a2 = bi.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("g").alias("n_bigram_types"),
    )
    return a1.join(a2, "source").select(
        "source",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / F.col("n_tokens").cast("double"))
        .alias("ttr_unigram"),
        (
            F.col("n_bigram_types").cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("ttr_bigram"),
    )


# ---------------------------------------------------------------------------
# positional-index phrase search
# ---------------------------------------------------------------------------


@query(
    "llm_phrase_search",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tri AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS g
        FROM tk)
      WHERE g IS NOT NULL GROUP BY g
    ),
    top AS (
      SELECT regexp_split_to_array(g, ' ') AS pw FROM tri
      ORDER BY cnt DESC, g LIMIT 1
    ),
    post AS (
      SELECT doc_id, u.p - 1 AS pos, u.w FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
                 struct_pack(p := i, w := x))) AS u
        FROM tk)
    )
    SELECT p0.doc_id, p0.pos,
           (SELECT array_to_string(pw, ' ') FROM top) AS phrase
    FROM post p0, top
    JOIN post p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
    JOIN post p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
    WHERE p0.w = top.pw[1] AND p1.w = top.pw[2] AND p2.w = top.pw[3]
    """,
)
def llm_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase query (the Lucene match_phrase shape):
    build unigram positional postings, derive the corpus's most
    duplicated 3-token phrase (count DESC, lexicographic tie-break),
    and locate every occurrence via per-word broadcast pruning +
    (doc, pos+i) adjacency joins
    (operators/text.py:positional_postings, phrase_occurrences).
    Join keys are (id, int) — the chain is bounded by the rarest
    phrase word's postings, never the corpus."""
    from aws_datalake_spark.operators.text import (
        phrase_occurrences,
        positional_postings,
        spread,
        tokens_ws,
    )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    # non-distinct trigram occurrences (with_shingles dedups per doc;
    # phrase frequency must count every occurrence)
    toks_df = spread(d).select("doc_id", tokens_ws(F.col("text")).alias("__t"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("__t") - 3, F.lit(-1)))
    gr = F.when(
        F.size("__t") >= 3,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("__t"), i + j + 1) for j in range(3)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # no §21 staging: the trigram transform is 3 element_ats per
    # output element (measured parity), and spread above already
    # fixes the parallelism
    grams = toks_df.select(F.explode(gr).alias("g"))
    top = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "g")
        .limit(1)
    )
    ws = F.split(F.col("g"), " ")
    phrase = top.select(
        *[F.element_at(ws, i + 1).alias(f"w_{i + 1}") for i in range(3)],
        F.col("g").alias("phrase"),
    )
    post = positional_postings(d)
    occ = phrase_occurrences(post, phrase.select("w_1", "w_2", "w_3"))
    return occ.join(F.broadcast(phrase.select("phrase")), how="cross").select(
        "doc_id", "pos", "phrase"
    )


# ---------------------------------------------------------------------------
# language-ID eval: confusion matrix + exact-rational accuracy
# ---------------------------------------------------------------------------


@query(
    "llm_lang_id_eval",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS true_lang, {_lang_case_sql()} AS predicted_lang
      FROM documents
    ),
    cm AS (
      SELECT true_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT true_lang, predicted_lang, n,
           CAST(SUM(CASE WHEN true_lang = predicted_lang THEN n ELSE 0 END)
                  OVER () AS DOUBLE)
             / SUM(n) OVER () AS overall_accuracy
    FROM cm
    """,
)
def llm_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID eval harness: confusion matrix of the marker-word
    classifier against the fixture's true `lang` labels, plus overall
    accuracy as a double quotient of exact integer counts (same-value
    on every row — the eval-summary convention that keeps one result
    schema). The windowed totals run over the |langs|² confusion
    table, never the corpus. Completes the eval-harness family
    (retrieval: llm_ann_recall; dedup: llm_lsh_recall_curve)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.text import lang_id

    d = t(spark, sf_dir, "documents")
    cm = (
        d.select(
            F.col("lang").alias("true_lang"),
            lang_id("text").alias("predicted_lang"),
        )
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # frame bound: the confusion matrix, <= n_langs^2 rows (r05 sweep)
    w = Window.partitionBy()
    correct = F.sum(
        F.when(F.col("true_lang") == F.col("predicted_lang"), F.col("n")).otherwise(
            F.lit(0)
        )
    ).over(w)
    return cm.select(
        "true_lang", "predicted_lang", "n",
        (correct.cast("double") / F.sum("n").over(w)).alias("overall_accuracy"),
    )


# ---------------------------------------------------------------------------
# rank-biased overlap between per-source top-term lists (exact p=1/2)
# ---------------------------------------------------------------------------

# RBO@10 truncated, p = 1/2 (Webber et al., TOIS 2010):
# rbo = (1-p) * sum_{d=1..K} p^(d-1) * |A_1..d ∩ B_1..d| / d.
# A shared term with ranks (ra, rb) joins every prefix d >= max(ra,rb),
# so its total contribution is the SUFFIX weight S[max(ra, rb)] —
# precomputed as exact integers at scale lcm(1..10) * 2^9 (every
# scale/(d*2^(d-1)) divides evenly). rbo = sum(S)/(2*scale): a double
# quotient of exact integers, no float powers anywhere.
_RBO_K = 10
_RBO_SCALE = 1290240
_RBO_S = {1: 1788440, 2: 498200, 3: 175640, 4: 68120, 5: 27800,
          6: 11672, 7: 4952, 8: 2072, 9: 812, 10: 252}

_RBO_S_SQL = "CASE m " + " ".join(
    f"WHEN {m} THEN {w}" for m, w in _RBO_S.items()
) + " END"


@query(
    "llm_rbo_top_terms",
    oracle=f"""
    WITH tc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT source, unnest({_TOKS}) AS w FROM documents)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, w,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, w) AS r
      FROM tc
    ),
    top AS (SELECT source, w, r FROM ranked WHERE r <= {_RBO_K}),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             GREATEST(a.r, b.r) AS m
      FROM top a JOIN top b ON a.w = b.w AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(SUM({_RBO_S_SQL}) AS BIGINT) AS rbo_scaled,
           CAST(SUM({_RBO_S_SQL}) AS DOUBLE) / {2 * _RBO_SCALE} AS rbo
    FROM shared GROUP BY 1, 2
    """,
)
def llm_rbo_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010; truncated RBO@10 at
    p = 1/2) between every source pair's top-term lists — the
    top-weighted list-similarity metric vocabulary drift reports
    need (plain set overlap ignores rank). A shared term contributes
    the SUFFIX weight of its worse rank, precomputed as exact
    integers at scale lcm(1..10)·2^9, so the metric is a double
    quotient of exact integers — no float powers. The pair join runs
    on the sources×10 top-term table, never the corpus."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "w")
    top = (
        tc.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _RBO_K)
        .select("source", "w", "r")
    )
    a = top.select(F.col("source").alias("source_a"), "w", F.col("r").alias("ra"))
    b = top.select(F.col("source").alias("source_b"), "w", F.col("r").alias("rb"))
    s_map = F.create_map(
        *[x for m, wt in _RBO_S.items() for x in (F.lit(m), F.lit(wt))]
    )
    shared = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a", "source_b",
            s_map[F.greatest("ra", "rb")].alias("__s"),
        )
    )
    return shared.groupBy("source_a", "source_b").agg(
        F.sum("__s").cast("long").alias("rbo_scaled"),
        (F.sum("__s").cast("double") / (2 * _RBO_SCALE)).alias("rbo"),
    )
