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
    from aws_datalake_spark.queries._shared import render_sc_node, sc_edges_int

    # int64 node ids end-to-end; labels rendered in the readout only
    # (see q_graph_pagerank)
    ranks = pagerank_fixed_point(
        sc_edges_int(spark, sf_dir),
        iterations=_PR_ITERS,
        scale=_PR_SCALE,
        redistribute_dangling=True,
    )
    return ranks.select(
        render_sc_node(F.col("node")).alias("node"), "rank_scaled"
    )


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


# ---------------------------------------------------------------------------
# exact ROC AUC (Mann-Whitney) eval harness
# ---------------------------------------------------------------------------

_EN_MARKERS_SQL = "('the', 'and', 'of', 'to', 'is')"


@query(
    "llm_quality_auc",
    oracle=f"""
    WITH sc AS (
      SELECT doc_id,
             len(list_filter({_TOKS},
                 tk -> tk IN {_EN_MARKERS_SQL})) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS l
      FROM documents
    ),
    per AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(l) AS BIGINT) AS np
      FROM sc GROUP BY s
    ),
    rk AS (
      SELECT s, cnt, np,
             COALESCE(SUM(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM per
    ),
    ag AS (
      SELECT SUM(CAST(np AS HUGEINT) * (2 * cum + cnt + 1)) AS r2,
             CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - np) AS BIGINT) AS n_neg
      FROM rk
    )
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             ROUND(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
                   / CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE), 6)
           END AS auc
    FROM ag
    """,
)
def llm_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of a ranking signal, no threshold picked
    (operators/stats.py:exact_auc): here, how well the English
    marker-token occurrence count ranks English documents above the
    rest — the eval every curation classifier/quality score gets
    before its cutoff is chosen. Tie-corrected Mann-Whitney on
    DOUBLED average ranks, exact integers end-to-end (sums in
    DECIMAL(38,0)), one final correctly-rounded divide. The only
    window runs over DISTINCT score values (bounded by the marker
    count's value domain, ~tens), never corpus rows."""
    from aws_datalake_spark.operators.stats import exact_auc
    from aws_datalake_spark.operators.text import LANG_MARKERS, blocklist_features

    d = t(spark, sf_dir, "documents")
    scored = blocklist_features(
        d, LANG_MARKERS["en"], extra_cols=["lang"], min_hits=1
    ).select(
        F.col("bl_hits").alias("score"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
    )
    return exact_auc(scored, "score", "is_en")


# ---------------------------------------------------------------------------
# Welch's t-test between segments
# ---------------------------------------------------------------------------


@query(
    "q_welch_ttest",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS cents
      FROM customer
    ),
    m AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(cents AS HUGEINT)) AS sx,
             SUM(CAST(cents AS HUGEINT) * cents) AS sxx
      FROM v GROUP BY g
    ),
    s AS (
      SELECT g, n,
             ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS var
      FROM m
    )
    SELECT a.g AS group_a, b.g AS group_b,
           a.n AS n_a, b.n AS n_b,
           a.mean AS mean_a, b.mean AS mean_b,
           CASE WHEN a.var / CAST(a.n AS DOUBLE)
                     + b.var / CAST(b.n AS DOUBLE) > 0.0 THEN
             ROUND((a.mean - b.mean)
                   / SQRT(a.var / CAST(a.n AS DOUBLE)
                          + b.var / CAST(b.n AS DOUBLE)), 6)
           END AS t_stat,
           CASE WHEN a.var / CAST(a.n AS DOUBLE)
                     + b.var / CAST(b.n AS DOUBLE) > 0.0 THEN
             ROUND((a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
                   * (a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
                   / ((a.var / CAST(a.n AS DOUBLE))
                        * (a.var / CAST(a.n AS DOUBLE))
                        / CAST(a.n - 1 AS DOUBLE)
                      + (b.var / CAST(b.n AS DOUBLE))
                        * (b.var / CAST(b.n AS DOUBLE))
                        / CAST(b.n - 1 AS DOUBLE)), 6)
           END AS df_w
    FROM s a JOIN s b ON a.g < b.g
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between every pair of customer
    market segments on account balance cents
    (operators/stats.py:welch_ttest_pairs) — the "is this difference
    real" significance readout (A/B tests, segment drift) computed
    verification-grade: per-group n/Σx/Σx² are exact DECIMAL(38,0)
    moments (one map-combinable aggregate), means/variances derive
    with one correctly-rounded divide each, and the t statistic +
    Welch–Satterthwaite df mirror the oracle's expression tree
    op-for-op. Pair work is |segments|²/2 on a 5-row frame."""
    from aws_datalake_spark.operators.stats import welch_ttest_pairs

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    return welch_ttest_pairs(c, "seg", F.col("cents"))


# ---------------------------------------------------------------------------
# blocklist screening report
# ---------------------------------------------------------------------------

_BL_TERMS = ["slow", "merge", "batch"]
_BL_TERMS_SQL = "('slow', 'merge', 'batch')"
_BL_MIN_HITS = 3


@query(
    "llm_blocklist_filter",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source,
             CASE WHEN len(toks) = 1 THEN
               CASE WHEN toks[1] <> '' THEN 1 ELSE 0 END
             ELSE len(toks) END AS n_tokens,
             len(list_filter(toks, tk -> tk IN {_BL_TERMS_SQL})) AS bl_hits
      FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN bl_hits >= {_BL_MIN_HITS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN bl_hits >= {_BL_MIN_HITS} THEN 0 ELSE 1 END)
                AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN bl_hits >= {_BL_MIN_HITS} THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS flag_rate,
           CAST(SUM(CASE WHEN bl_hits >= {_BL_MIN_HITS} THEN 0
                    ELSE n_tokens END) AS BIGINT) AS kept_tokens
    FROM f GROUP BY source
    """,
)
def llm_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist screening report per source
    (operators/text.py:blocklist_features): whole-token OCCURRENCE
    counts against a policy term list (zero-shuffle array-literal
    filter over the materialized tokens attribute — no join, no
    broadcast table), flagged at ≥ 3 hits, rolled up to the
    per-source release report (docs kept/flagged, flag rate,
    surviving token budget). The aggregate is |sources|-bounded."""
    from aws_datalake_spark.operators.text import blocklist_features

    d = t(spark, sf_dir, "documents")
    bl = blocklist_features(
        d, _BL_TERMS, extra_cols=["source"], min_hits=_BL_MIN_HITS
    )
    return bl.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("flagged").cast("int")).cast("long").alias("n_flagged"),
        F.sum((~F.col("flagged")).cast("int")).cast("long").alias("n_kept"),
        F.round(
            F.sum(F.col("flagged").cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("flag_rate"),
        F.sum(
            F.when(~F.col("flagged"), F.col("n_tokens")).otherwise(F.lit(0))
        ).cast("long").alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# asymmetric containment pairs (near-superset dedup)
# ---------------------------------------------------------------------------


_CT_CAP = 40  # stop-gram cap: same production bound as llm_ngram_jaccard_capped


@query(
    "llm_containment_pairs",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || ' neardupmarker' AS text
      FROM documents WHERE doc_id < 60
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 2 <= len(t)
                      THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM c))
      WHERE s IS NOT NULL
    ),
    freq AS (SELECT s, COUNT(*) AS f FROM sh GROUP BY 1),
    rare AS (
      SELECT doc_id, sh.s FROM sh JOIN freq ON freq.s = sh.s
      WHERE freq.f <= {_CT_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_sub, b.doc_id AS id_sup
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id <> b.doc_id),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
              FROM sh GROUP BY doc_id),
    com AS (
      SELECT x.doc_id AS id_sub, y.doc_id AS id_sup,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id <> y.doc_id
      GROUP BY 1, 2
    )
    SELECT com.id_sub, com.id_sup, sa.n_sh AS n_sub, sb.n_sh AS n_sup,
           n_common,
           ROUND(CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6)
             AS containment
    FROM com
    JOIN cand ON cand.id_sub = com.id_sub AND cand.id_sup = com.id_sup
    JOIN sizes sa ON sa.doc_id = com.id_sub
    JOIN sizes sb ON sb.doc_id = com.id_sup
    WHERE sa.n_sh >= 3
      AND ROUND(CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6) >= 0.9
    """,
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-superset pairs, PRODUCTION-BOUNDED
    (operators/dedup.py:containment_pairs with the max_df stop-gram
    cap): |S(sub) ∩ S(sup)| / |S(sub)| ≥ 0.9 over distinct 3-gram
    shingle sets — Broder's asymmetric companion to Jaccard
    resemblance, the signal that catches a document
    QUOTED/CONCATENATED inside a bigger one (Jaccard vanishes as
    sizes diverge; containment stays 1.0). Run on the seeded
    near-dup corpus, where each original is contained in its
    marker-extended copy.

    Candidates come only from grams with document frequency ≤ 40 and
    each survivor is verified EXACTLY on the full shingle arrays —
    the same bound as llm_ngram_jaccard_capped, registered here from
    birth because the uncapped inverted index measured a 1.71 sf1
    exponent on the dense-vocab fixture (the adjudicated hot-gram
    Σ df² shape; SCALE.md). Recall caveat as there: a pair sharing
    ONLY hotter-than-cap grams is missed — containment pairs share
    the sub's rare grams by construction."""
    from aws_datalake_spark.operators.dedup import containment_pairs
    from aws_datalake_spark.queries.llm_dedup import _neardup_corpus

    return containment_pairs(
        _neardup_corpus(spark, sf_dir), threshold=0.9, min_shingles=3,
        max_df=_CT_CAP,
    )


# ---------------------------------------------------------------------------
# TextRank extractive summaries (keyed PageRank)
# ---------------------------------------------------------------------------

_TR_ITERS, _TR_SCALE = 3, 10**9
_TR_MIN_TOK = 4


def _textrank_oracle() -> str:
    """Chained-CTE twin of the per-document keyed integer power
    iteration (same arithmetic as the pagerank oracles, with every
    scalar now a per-doc column)."""
    steps = []
    for i in range(_TR_ITERS):
        prev = f"it{i}"
        steps.append(f"""
    it{i + 1} AS (
      SELECT n.doc_id, n.node,
             p.base + COALESCE(CAST(SUM((r.rank * 85) // (100 * o.outdeg))
                                    AS BIGINT), 0) AS rank
      FROM nodes n
      JOIN par p ON p.doc_id = n.doc_id
      LEFT JOIN edges e ON e.doc_id = n.doc_id AND e.dst = n.node
      LEFT JOIN {prev} r ON r.doc_id = e.doc_id AND r.node = e.src
      LEFT JOIN outdeg o ON o.doc_id = e.doc_id AND o.node = e.src
      GROUP BY n.doc_id, n.node, p.base
    )""")
    return f"""
    WITH sent AS (
      SELECT doc_id, u.idx AS idx, trim(u.s) AS sentence FROM (
        SELECT doc_id,
               unnest(list_transform(string_split_regex(text, '[.!?]+'),
                 (x, i) -> struct_pack(idx := i - 1, s := x))) AS u
        FROM documents)
      WHERE trim(u.s) <> ''
    ),
    tok AS (
      SELECT DISTINCT doc_id, idx, tk FROM (
        SELECT doc_id, idx,
               unnest(regexp_split_to_array(trim(sentence), '\\s+')) AS tk
        FROM sent)
      WHERE LENGTH(tk) >= {_TR_MIN_TOK}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id, a.idx AS src, b.idx AS dst
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND a.tk = b.tk AND a.idx <> b.idx
    ),
    nodes AS (SELECT doc_id, idx AS node FROM sent),
    cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM nodes GROUP BY 1),
    par AS (
      SELECT doc_id, CAST({_TR_SCALE} AS BIGINT) // n AS init,
             (CAST(15 AS BIGINT) * {_TR_SCALE}) // (100 * n) AS base
      FROM cnt
    ),
    outdeg AS (
      SELECT doc_id, src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY 1, 2
    ),
    it0 AS (
      SELECT n.doc_id, n.node, CAST(p.init AS BIGINT) AS rank
      FROM nodes n JOIN par p ON p.doc_id = n.doc_id
    ),{",".join(steps)},
    ranked AS (
      SELECT doc_id, node, rank,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY rank DESC, node) AS rn
      FROM it{_TR_ITERS}
    )
    SELECT r.doc_id, CAST(r.node AS BIGINT) AS sent_idx,
           CAST(r.rank AS BIGINT) AS rank_scaled, s.sentence
    FROM ranked r JOIN sent s ON s.doc_id = r.doc_id AND s.idx = r.node
    WHERE rn = 1
    """


@query("llm_textrank_summary", oracle=_textrank_oracle())
def llm_textrank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank extractive one-sentence summaries (Mihalcea & Tarau
    EMNLP'04 shape): per document, sentences are nodes, two sentences
    are linked when they share a token of ≥ 4 chars, and 3 exact
    scaled-integer power steps pick the most central sentence — the
    classic unsupervised summary/key-sentence signal for dataset
    cards and doc previews. Runs as ONE distributed plan over every
    document at once via operators/graph.py:pagerank_keyed (per-doc
    node counts are COLUMNS, not driver scalars — no per-key loop, no
    collect); the token inverted index builds within-doc edges
    without any all-pairs join ever leaving a document. The final
    top-1 window partitions by doc (frame bounded by sentences/doc).
    Integer arithmetic end-to-end — the iterative result hash-matches
    a 3-level chained-CTE oracle exactly."""
    from aws_datalake_spark.operators.graph import pagerank_keyed
    from aws_datalake_spark.operators.text import spread, tokens_ws
    from pyspark.sql import Window

    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    sent = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"[.!?]+")).alias("idx", "__raw"),
        )
        .select("doc_id", "idx", F.trim(F.col("__raw")).alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    tok = (
        sent.select(
            "doc_id", "idx", F.explode(tokens_ws(F.col("sentence"))).alias("tk")
        )
        .filter(F.length("tk") >= _TR_MIN_TOK)
        .distinct()
    )
    edges = (
        tok.select("doc_id", F.col("idx").alias("src"), "tk")
        .join(tok.select("doc_id", F.col("idx").alias("dst"), "tk"), ["doc_id", "tk"])
        .filter(F.col("src") != F.col("dst"))
        .select("doc_id", "src", "dst")
        .distinct()
    )
    nodes = sent.select("doc_id", "idx")
    pr = pagerank_keyed(
        edges, nodes, key="doc_id", src="src", dst="dst",
        iterations=_TR_ITERS, scale=_TR_SCALE,
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("rank_scaled"), F.col("node"))
    top1 = pr.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        top1.join(
            sent.select("doc_id", F.col("idx").alias("node"), "sentence"),
            ["doc_id", "node"],
        )
        .select(
            "doc_id",
            F.col("node").cast("long").alias("sent_idx"),
            "rank_scaled",
            "sentence",
        )
    )


# ---------------------------------------------------------------------------
# cross-doc repeated-span excision (ExactSubstr dedup shape)
# ---------------------------------------------------------------------------

_XS_K = 8
_XS_GRAM = " || ' ' || ".join(f"t[i+{j}]" for j in range(_XS_K))
_XS_OFFS = ", ".join(str(j) for j in range(_XS_K))


@query(
    "llm_exact_substr_excise",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || ' neardupmarker' AS text
      FROM documents WHERE doc_id < 60
    ),
    tk AS (SELECT doc_id, {_TOKS} AS t FROM c),
    pg AS (
      SELECT doc_id, u.p AS p,
             ('0x' || substr(md5(u.g), 1, 15))::BIGINT AS h
      FROM (
        SELECT doc_id, unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + {_XS_K - 1} <= len(t)
                      THEN struct_pack(p := i, g := {_XS_GRAM}) END)) AS u
        FROM tk)
      WHERE u IS NOT NULL
    ),
    dup AS (
      SELECT h, MIN(doc_id) AS keeper
      FROM (SELECT DISTINCT doc_id, h FROM pg)
      GROUP BY h HAVING COUNT(*) > 1
    ),
    hit AS (
      SELECT pg.doc_id, pg.p FROM pg JOIN dup USING (h)
      WHERE pg.doc_id <> dup.keeper
    ),
    rm AS (
      SELECT DISTINCT doc_id, p + o AS i
      FROM hit, (SELECT unnest([{_XS_OFFS}]) AS o)
    ),
    rml AS (SELECT doc_id, list(i) AS rm FROM rm GROUP BY doc_id)
    SELECT tk.doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(rm), 0) AS BIGINT) AS n_excised,
           COALESCE(array_to_string(
             list_filter(t, (x, i) ->
               rm IS NULL OR NOT list_contains(rm, i)), ' '), '')
             AS clean_text
    FROM tk LEFT JOIN rml ON rml.doc_id = tk.doc_id
    """,
)
def llm_exact_substr_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span excision
    (operators/decontam.py:excise_repeated_spans) — the ExactSubstr
    dedup shape (Lee et al. 2022): every 8-token window appearing in
    more than one document is cut from all but the min-doc_id keeper
    and the texts rebuilt, killing span-level boilerplate the
    whole-doc near-dup detectors can't see. Run on the seeded
    near-dup corpus (each original is the keeper; its marker-extended
    copy loses the shared interior). The driver hash certifies the
    rebuilt texts byte-for-byte. Gram strings reduce to hash60 before
    any exchange; raw text shuffles only in the final rebuild join."""
    from aws_datalake_spark.operators.decontam import excise_repeated_spans
    from aws_datalake_spark.queries.llm_dedup import _neardup_corpus

    return excise_repeated_spans(_neardup_corpus(spark, sf_dir), k=_XS_K)


# ---------------------------------------------------------------------------
# seasonal baseline anomalies (hour-of-day median + MAD fence)
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_anomaly",
    oracle="""
    WITH cnt AS (
      SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT hr,
             list_sort(list(n))[CAST(FLOOR((COUNT(*) - 1) / 2) AS INT) + 1]
               AS med
      FROM cnt GROUP BY hr
    ),
    dev AS (
      SELECT cnt.d, cnt.hr, cnt.n, med.med,
             ABS(cnt.n - med.med) AS abs_dev
      FROM cnt JOIN med USING (hr)
    ),
    mad AS (
      SELECT hr,
             list_sort(list(abs_dev))[CAST(FLOOR((COUNT(*) - 1) / 2) AS INT) + 1]
               AS mad
      FROM dev GROUP BY hr
    )
    SELECT dev.d, CAST(dev.hr AS BIGINT) AS hr, dev.n, dev.med,
           CAST(dev.abs_dev AS BIGINT) AS abs_dev, mad.mad,
           CAST(dev.abs_dev AS DOUBLE) > 3.5 * CAST(mad.mad AS DOUBLE)
             AS is_anomaly
    FROM dev JOIN mad USING (hr)
    """,
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly report on hourly event volume: each
    (day, hour) cell is compared against ITS HOUR-OF-DAY's median
    across days with a 3.5·MAD robust fence — the load-monitoring
    shape that doesn't false-alarm on the daily traffic cycle (3am
    volume is judged against 3am history, not the global mean) and
    whose fence one outage spike cannot drag. All counts, medians,
    and deviations are exact integers (type-1 lower medians over the
    per-hour day lists); the only float op is the final fence
    compare, mirrored op-for-op in the oracle.

    SCALE: corpus rows collapse in ONE map-combinable (day, hour)
    aggregate; everything after runs on the days×24 cell frame —
    the per-hour collect_list is bounded by the day count (documented
    per the r05 window-bound discipline; a multi-year hypertable
    still yields only ~365·years values per hour)."""
    e = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), F.hour("ts").alias("hr")
    )
    cnt = e.groupBy("d", "hr").agg(F.count(F.lit(1)).alias("n"))
    med_idx = (F.floor((F.count(F.lit(1)) - 1) / 2) + 1).cast("int")
    med = cnt.groupBy("hr").agg(
        F.element_at(F.sort_array(F.collect_list("n")), med_idx).alias("med")
    )
    dev = cnt.join(med, "hr").select(
        "d", "hr", "n", "med", F.abs(F.col("n") - F.col("med")).alias("abs_dev")
    )
    mad = dev.groupBy("hr").agg(
        F.element_at(F.sort_array(F.collect_list("abs_dev")), med_idx).alias("mad")
    )
    return dev.join(mad, "hr").select(
        "d",
        F.col("hr").cast("long").alias("hr"),
        "n",
        "med",
        F.col("abs_dev").cast("long").alias("abs_dev"),
        "mad",
        (
            F.col("abs_dev").cast("double") > 3.5 * F.col("mad").cast("double")
        ).alias("is_anomaly"),
    )
