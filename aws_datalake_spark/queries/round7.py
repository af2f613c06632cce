"""Round-6-session additions (certify in the round-6/7 windows):
mass-conserving PageRank (dangling redistribution), plus the other
operators added this round.

All new surface beyond SURVEY.md §2 (the reference has none of
these); each pairs a scalable Spark plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

# ---------------------------------------------------------------------------
# mass-conserving PageRank (dangling redistribution)
# ---------------------------------------------------------------------------

_PR_ITERS, _PR_SCALE = 5, 10**12


def _pagerank_conserving_oracle() -> str:
    """Chained-CTE twin of the integer power iteration WITH the
    per-step dangling-mass redistribution term."""
    steps = []
    for i in range(_PR_ITERS):
        prev = "it0" if i == 0 else f"it{i}"
        steps.append(f"""
    dm{i} AS (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS m
      FROM {prev} r LEFT JOIN outdeg o ON o.node = r.node
      WHERE o.node IS NULL
    ),
    it{i + 1} AS (
      SELECT n.node,
             (SELECT base FROM params)
               + ((SELECT m FROM dm{i}) * 85)
                 // (100 * (SELECT cnt FROM params))
               + COALESCE(CAST(SUM((r.rank * 85) // (100 * o.outdeg))
                               AS BIGINT), 0) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {prev} r ON r.node = e.src
      LEFT JOIN outdeg o ON o.node = e.src
      GROUP BY n.node
    )""")
    return f"""
    WITH raw AS (
      SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
             'C' || CAST(o.o_custkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst AS node FROM edges)
    ),
    outdeg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY 1
    ),
    params AS (
      SELECT (15 * {_PR_SCALE}) // (100 * COUNT(*)) AS base,
             {_PR_SCALE} // COUNT(*) AS init,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM nodes
    ),
    it0 AS (
      SELECT node, CAST((SELECT init FROM params) AS BIGINT) AS rank
      FROM nodes
    ),{",".join(steps)}
    SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM it{_PR_ITERS}
    """


@query("q_graph_pagerank_conserving", oracle=_pagerank_conserving_oracle())
def q_graph_pagerank_conserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-CONSERVING exact fixed-point PageRank (operators/
    graph.py:pagerank_fixed_point, redistribute_dangling=True) over
    the supplier→customer fulfillment graph. Customers have no
    out-edges, so EVERY C-node is dangling — the variant that leaks
    dangling mass (q_graph_pagerank) loses most of the rank mass on
    this graph, while this one redistributes it each step: one
    bounded dangling-mass aggregate (the dangling SET is precomputed
    once) + one broadcast-scalar crossJoin per iteration, still
    entirely in scaled-integer arithmetic, so the result
    hash-matches a 5-level chained-CTE oracle exactly and
    Σ rank_scaled stays ≈ scale (VERDICT r05 item 6; conservation is
    asserted in tests/test_round7_ops.py)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return pagerank_fixed_point(
        edges,
        iterations=_PR_ITERS,
        scale=_PR_SCALE,
        redistribute_dangling=True,
    ).select("node", "rank_scaled")


_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_H60 = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"

# ---------------------------------------------------------------------------
# chi-square discriminative terms (feature selection)
# ---------------------------------------------------------------------------


@query(
    "llm_chi2_terms",
    oracle=f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, token, l FROM (
        SELECT doc_id, unnest({_TOKS}) AS token,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS l
        FROM documents)
      WHERE token <> ''
    ),
    perf AS (
      SELECT token AS feature,
             CAST(SUM(l) AS BIGINT) AS a,
             CAST(SUM(1 - l) AS BIGINT) AS b
      FROM pres GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS npos,
             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS nneg
      FROM documents
    ),
    cont AS (
      SELECT feature, a, b, npos - a AS c, nneg - b AS d
      FROM perf, tot
    ),
    sc AS (
      SELECT feature, a, b, c, d,
             CASE WHEN CAST((a + b) * (c + d) AS DOUBLE)
                       * CAST((a + c) * (b + d) AS DOUBLE) > 0.0
                  THEN ROUND(
                    CAST((CAST(a AS HUGEINT) + b + c + d)
                         * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                         AS DOUBLE)
                    * CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c
                           AS DOUBLE)
                    / (CAST((a + b) * (c + d) AS DOUBLE)
                       * CAST((a + c) * (b + d) AS DOUBLE)), 6)
                  ELSE 0.0 END AS chi2
      FROM cont
    )
    SELECT feature, a, b, c, d, chi2
    FROM sc ORDER BY chi2 DESC, feature LIMIT 50
    """,
)
def llm_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square discriminative terms
    (operators/stats.py:chi2_feature_scores): the 50 tokens whose
    document-level presence most separates English from non-English
    docs — the classic feature-selection signal for building
    curation classifiers (which tokens mark quality / language /
    domain). Counts are exact int64 over the distinct (doc, token)
    presence table; the score's products run in DECIMAL(38,0) and
    cast to double for ONE divide, mirrored operation-for-operation
    in the oracle. Top-k is a distributed TakeOrdered — no unbounded
    window."""
    from aws_datalake_spark.operators.stats import chi2_feature_scores
    from aws_datalake_spark.operators.text import tokens_ws

    d = t(spark, sf_dir, "documents")
    pres = (
        d.select(
            "doc_id",
            F.explode(tokens_ws(F.col("text"))).alias("token"),
            (F.col("lang") == "en").cast("int").alias("l"),
        )
        .where(F.col("token") != "")
        .dropDuplicates(["doc_id", "token"])
    )
    return chi2_feature_scores(pres, "doc_id", "token", "l", top_k=50).select(
        F.col("feature"), "a", "b", "c", "d", "chi2"
    )


# ---------------------------------------------------------------------------
# Markov event-transition matrix
# ---------------------------------------------------------------------------


@query(
    "q_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type AS from_state,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events
    ),
    c AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE to_state IS NOT NULL GROUP BY 1, 2
    ),
    tt AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS n_from
           FROM c GROUP BY 1)
    SELECT c.from_state, c.to_state, c.n, tt.n_from,
           ROUND(CAST(c.n AS DOUBLE) / CAST(tt.n_from AS DOUBLE), 6) AS p
    FROM c JOIN tt USING (from_state)
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/sessions.py:transition_matrix): exact
    conditional next-event probabilities — the clickstream model
    behind next-step prediction and improbable-transition anomaly
    scoring. One user-key window exchange emits the steps; both
    aggregates are states²-bounded."""
    from aws_datalake_spark.operators.sessions import transition_matrix

    return transition_matrix(t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------


@query(
    "q_mad_outliers",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000,
             CAST(ROUND(o_totalprice * 100.0) AS BIGINT) * 50 AS cents
      FROM orders WHERE o_orderkey % 127 = 0
    ),
    med AS (
      SELECT cents AS m FROM (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM c)
      WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    ),
    dev AS (
      SELECT o_orderkey, cents,
             ABS(cents - (SELECT m FROM med)) AS dv
      FROM c
    ),
    mad AS (
      SELECT dv AS m FROM (
        SELECT dv, ROW_NUMBER() OVER (ORDER BY dv) AS rn,
               COUNT(*) OVER () AS n
        FROM dev)
      WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    )
    SELECT o_orderkey, cents, CAST(dv AS BIGINT) AS abs_dev,
           CAST((SELECT m FROM med) AS BIGINT) AS median,
           CAST((SELECT m FROM mad) AS BIGINT) AS mad
    FROM dev
    WHERE CAST(dv AS DOUBLE) > 3.5 * CAST((SELECT m FROM mad) AS DOUBLE)
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-Absolute-Deviation robust outliers
    (operators/stats.py:mad_outliers) on order totals in exact
    cents: rows beyond 3.5·MAD of the median — the heavy-tail-safe
    fence (one wild value corrupts a mean/stddev fence; medians
    shrug it off). The base distribution is fence-clean, so the
    input is seeded with a 50× copy of every 127th order — exactly
    those must surface (and, robustly, the fence itself must not
    move: the seeds are < 1% of rows). Both medians come from the
    histogram-narrowing exact_quantile (scans with bounded
    aggregation state, no global sort); the oracle computes the same
    type-1 (lower) medians."""
    from aws_datalake_spark.operators.stats import mad_outliers

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    seeded = o.unionByName(
        o.where(F.col("o_orderkey") % 127 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            (F.col("cents") * 50).alias("cents"),
        )
    )
    return mad_outliers(seeded, "cents", k=3.5)


# ---------------------------------------------------------------------------
# first-occurrence novelty
# ---------------------------------------------------------------------------

_NOV_SHINGLES = f"""
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(t, (x, i) ->
             CASE WHEN i + 2 <= len(t)
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
    FROM (SELECT doc_id, {_TOKS} AS t FROM c))
  WHERE s IS NOT NULL
"""


@query(
    "llm_novelty_scores",
    oracle=f"""
    WITH c AS (SELECT doc_id, text FROM documents),
    sh AS ({_NOV_SHINGLES}),
    h AS (SELECT doc_id, {_H60.format(expr='s')} AS hh FROM sh),
    first AS (SELECT hh, MIN(doc_id) AS fdoc FROM h GROUP BY 1),
    per AS (
      SELECT h.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN f.fdoc = h.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM h JOIN first f ON f.hh = h.hh GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
             AS novelty
    FROM per
    """,
)
def llm_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty per document
    (operators/dedup.py:novelty_scores): the fraction of each doc's
    distinct 3-gram shingles whose corpus-wide first appearance
    (min doc_id) is this doc — the contribution-gain signal curation
    orders by (near-restatements of earlier docs score ~0). Shingles
    reduce to 8-byte hash60 values before both aggregates (same
    md5-based hash in the oracle), so text never shuffles."""
    from aws_datalake_spark.operators.dedup import novelty_scores

    return novelty_scores(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# label-centroid separation (embedding drift)
# ---------------------------------------------------------------------------


@query(
    "llm_label_centroid_drift",
    oracle="""
    WITH x AS (
      SELECT label, u.dim, u.v FROM (
        SELECT label,
               unnest(list_transform(embedding::DOUBLE[],
                 (x, i) -> struct_pack(dim := i - 1, v := x))) AS u
        FROM embeddings)
    ),
    fp AS (
      SELECT label, dim, CAST(ROUND(v * 1048576) AS BIGINT) AS xi FROM x
    ),
    s AS (
      SELECT label, dim, SUM(CAST(xi AS HUGEINT)) AS sx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM fp GROUP BY 1, 2
    ),
    d AS (
      SELECT a.label AS label_a, b.label AS label_b,
             MAX(a.n) AS n_a, MAX(b.n) AS n_b,
             SUM((a.sx * b.n - b.sx * a.n) * (a.sx * b.n - b.sx * a.n))
               AS ss
      FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT CAST(label_a AS BIGINT) AS label_a,
           CAST(label_b AS BIGINT) AS label_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(SQRT(CAST(ss AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * 1048576.0),
                 6) AS dist
    FROM d
    """,
)
def llm_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distances between per-label embedding centroids
    (operators/similarity.py:label_centroid_distances) — the
    cluster-separation / source-drift report (labels whose centroids
    collapse are not separable; a drifting source is
    distributionally off). Components fix-point to int64 at 2^20 so
    every sum is an exact DECIMAL(38,0); centroid means are never
    divided — differences run over a common denominator — so the
    result is bit-identical cross-engine. All joins/aggregates are
    bounded by labels × dim, never corpus rows."""
    from aws_datalake_spark.operators.similarity import label_centroid_distances

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    out = label_centroid_distances(e, "label")
    return out.select(
        F.col("label_a").cast("long").alias("label_a"),
        F.col("label_b").cast("long").alias("label_b"),
        "n_a", "n_b", "dist",
    )


# ---------------------------------------------------------------------------
# code-vs-prose detection
# ---------------------------------------------------------------------------

_CODE_KW_SQL = "['def', 'class', 'import', 'return', 'function', 'var', 'const', 'public', 'void', 'include']"


@query(
    "llm_code_detect",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LENGTH(text)
                - LENGTH(regexp_replace(text, '[{{}}();=\\[\\]<>]', '', 'g'))
                AS BIGINT) AS n_symbols,
           CASE WHEN LENGTH(text) > 0
                THEN ROUND(CAST(LENGTH(text)
                       - LENGTH(regexp_replace(text, '[{{}}();=\\[\\]<>]', '', 'g'))
                       AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6)
                ELSE 0.0 END AS symbol_ratio,
           CAST(len(list_filter({_CODE_KW_SQL},
                     k -> list_contains({_TOKS}, k))) AS BIGINT)
             AS keyword_hits,
           (CASE WHEN LENGTH(text) > 0
                THEN ROUND(CAST(LENGTH(text)
                       - LENGTH(regexp_replace(text, '[{{}}();=\\[\\]<>]', '', 'g'))
                       AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6)
                ELSE 0.0 END) >= 0.03
           AND len(list_filter({_CODE_KW_SQL},
                     k -> list_contains({_TOKS}, k))) >= 2 AS is_code
    FROM documents
    """,
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection features
    (operators/text.py:code_features): symbol density over the code
    punctuation class + whole-token keyword hits, flagged as code
    when both fences pass — the standard curation split (code
    corpora filter/route separately from prose). Pure per-row
    projection: exact counts, one correctly-rounded divide, no
    shuffle, whole-stage codegen end-to-end."""
    from aws_datalake_spark.operators.text import code_features

    return code_features(t(spark, sf_dir, "documents"))
