"""Round-7-session additions, batch 2: association-rule mining,
exact OLS trend regression, CUSUM change-point detection,
l-diversity release gate.

All new surface beyond SURVEY.md §2 (the reference has none of
these); each pairs a scalable Spark plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

# ---------------------------------------------------------------------------
# association-rule mining (market basket)
# ---------------------------------------------------------------------------

_AP_MIN_SUPPORT = 3


@query(
    "q_basket_pairs",
    oracle=f"""
    WITH m AS (
      SELECT DISTINCT l.l_orderkey AS ctx, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ctx) AS BIGINT) AS n FROM m),
    ic AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS ni FROM m GROUP BY 1
    ),
    pr AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM m a JOIN m b ON a.ctx = b.ctx AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_AP_MIN_SUPPORT}
    )
    SELECT pr.item_a, pr.item_b, pr.n_ab, ia.ni AS n_a, ib.ni AS n_b,
           ROUND(CAST(pr.n_ab AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
             AS support,
           ROUND(CAST(pr.n_ab AS DOUBLE) / CAST(ia.ni AS DOUBLE), 6)
             AS conf_a_b,
           ROUND(CAST(pr.n_ab AS DOUBLE) / CAST(ib.ni AS DOUBLE), 6)
             AS conf_b_a,
           ROUND(CAST(pr.n_ab AS DOUBLE) * CAST(n.n AS DOUBLE)
                 / CAST(ia.ni AS DOUBLE) / CAST(ib.ni AS DOUBLE), 6)
             AS lift
    FROM pr
    JOIN ic ia ON ia.item = pr.item_a
    JOIN ic ib ON ib.item = pr.item_b, n
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets
    (operators/mining.py:association_pairs): every brand pair bought
    together in >= 3 orders, with exact support / confidence / lift
    — the level-2 Apriori pass as plain DataFrame ops. The
    per-context self-join fans out C(m,2) on ~4-item baskets
    (bounded); item counts and the context total broadcast onto the
    pair frame, so the corpus shuffles once. Rule metrics are
    fixed-order IEEE quotients of exact longs — hash-identical to
    the SQL twin."""
    from aws_datalake_spark.operators.mining import association_pairs

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("l_orderkey").alias("ctx"), F.col("p_brand").alias("item")
    )
    return association_pairs(
        baskets, "ctx", "item", min_pair_support=_AP_MIN_SUPPORT
    )


# ---------------------------------------------------------------------------
# exact OLS trend regression per group
# ---------------------------------------------------------------------------


@query(
    "q_regression_trend",
    oracle="""
    WITH daily AS (
      SELECT n.n_name,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                            * 10000.0) AS BIGINT)) AS y
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM daily GROUP BY 1
    )
    SELECT n_name, n,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     > 0.0 THEN
             ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                   / 10000.0, 6)
           END AS slope,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     > 0.0 THEN
             ROUND((CAST(sy AS DOUBLE)
                    - (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / 10000.0, 6)
           END AS intercept,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     > 0.0
                 AND CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
                     > 0.0 THEN
             ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                   * CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                   / (CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                      * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)),
                   6)
           END AS r2
    FROM m
    """,
)
def q_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend via exact-moment OLS
    (operators/stats.py:ols_by_group): slope / intercept / R² of
    daily revenue (fixed-point 1e-4) against the day index — the
    "is this segment growing, how fast, how linear" readout computed
    verification-grade. The corpus collapses in one (nation, day)
    aggregate; the six regression moments accumulate exactly in
    DECIMAL(38,0) in a second map-combinable aggregate to |nations|
    rows; the statistics are fixed-order IEEE expressions the oracle
    mirrors — bit-identical cross-engine."""
    from aws_datalake_spark.operators.stats import ols_by_group

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000.0),
        0,
    ).cast("long")
    daily = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
            )
            .cast("long")
            .alias("x"),
            rev.alias("r"),
        )
        .groupBy("n_name", "x")
        .agg(F.sum("r").alias("y"))
    )
    return ols_by_group(daily, ["n_name"], F.col("x"), F.col("y"), y_scale=4)


# ---------------------------------------------------------------------------
# CUSUM change-point detection
# ---------------------------------------------------------------------------

_CUSUM_MULT = 2


@query(
    "q_cusum_changepoint",
    oracle=f"""
    WITH per AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS ng,
             CAST(SUM(x) AS HUGEINT) AS tg
      FROM per GROUP BY 1
    ),
    d AS (
      SELECT p.event_type, p.day, t.ng * p.x - t.tg AS d, t.tg
      FROM per p JOIN tot t USING (event_type)
    ),
    c AS (
      SELECT event_type, day, tg,
             SUM(d) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS c
      FROM d
    ),
    s AS (
      SELECT event_type, day, tg,
             c - LEAST(CAST(0 AS HUGEINT),
                       MIN(c) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS UNBOUNDED PRECEDING)) AS s
      FROM c
    )
    SELECT event_type, day, CAST(s AS BIGINT) AS cusum_scaled,
           s > {_CUSUM_MULT} * tg AS alarm
    FROM s
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volumes per type
    (operators/stats.py:cusum_report): the max(0, S+dev) recursion
    rewritten as cumsum-minus-running-min — two PARTITIONED window
    functions over the (type, day) aggregate, never raw events.
    Deviations scale to exact integers (n_g·x_t − T_g), so the
    CUSUM statistic and the alarm flag hash-match the SQL twin."""
    from aws_datalake_spark.operators.stats import cusum_report

    per = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return cusum_report(
        per, "event_type", "day", "x", threshold_mult=_CUSUM_MULT
    )


# ---------------------------------------------------------------------------
# l-diversity release gate
# ---------------------------------------------------------------------------


@query(
    "q_l_diversity",
    oracle="""
    SELECT c_nationkey,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
           TRUE AS violates
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT c_mktsegment) < 4
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release gate (operators/dq.py:l_diversity_audit):
    QI combos (nation, balance bucket) whose members span fewer than
    l=4 distinct market segments — groups k-anonymity passes but a
    homogeneity attack still reads. ONE map-combinable
    count+count_distinct aggregate; the corpus collapses to |combos|
    rows before the filter."""
    from aws_datalake_spark.operators.dq import l_diversity_audit

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
        "c_mktsegment",
    )
    return l_diversity_audit(
        c, ["c_nationkey", "bal_bucket"], "c_mktsegment", l=4
    ).where(F.col("violates"))


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

_HITS_ITERS, _HITS_SCALE = 3, 10**12


def _hits_oracle() -> str:
    """Chained-CTE twin of the integer HITS power iteration."""
    steps = []
    for i in range(1, _HITS_ITERS + 1):
        prev_h = "h0" if i == 1 else f"h{i - 1}"
        steps.append(f"""
    a{i}raw AS (
      SELECT e.dst AS node, SUM(CAST(h.score AS HUGEINT)) AS raw
      FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY 1
    ),
    a{i} AS (
      SELECT node,
             raw * {_HITS_SCALE} // (SELECT SUM(raw) FROM a{i}raw) AS score
      FROM a{i}raw
    ),
    h{i}raw AS (
      SELECT e.src AS node, SUM(CAST(a.score AS HUGEINT)) AS raw
      FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY 1
    ),
    h{i} AS (
      SELECT node,
             raw * {_HITS_SCALE} // (SELECT SUM(raw) FROM h{i}raw) AS score
      FROM h{i}raw
    )""")
    return f"""
    WITH edges AS (
      SELECT DISTINCT l.l_suppkey AS src, o.o_custkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (
      SELECT DISTINCT src AS node, CAST({_HITS_SCALE} AS HUGEINT) AS score
      FROM edges
    ),{",".join(steps)}
    SELECT 'hub' AS side, node, CAST(score AS BIGINT) AS score_scaled
    FROM h{_HITS_ITERS}
    UNION ALL
    SELECT 'auth' AS side, node, CAST(score AS BIGINT) AS score_scaled
    FROM a{_HITS_ITERS}
    """


@query("q_graph_hits", oracle=_hits_oracle())
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the supplier→customer fulfillment
    graph (operators/graph.py:hits_fixed_point): 3 power steps in
    exact scaled-integer arithmetic with L1 normalization as a
    128-bit integral division — the iterative result hash-matches a
    3-level chained-CTE oracle (float HITS never can). Hub scores
    rank suppliers by how broadly they serve strong customers;
    authority scores rank customers by how many strong suppliers
    serve them. Each half-step is one edge⋈score join + one
    aggregate (Pregel shape), with the L1 total a bounded broadcast
    scalar; lineage cut per step."""
    from aws_datalake_spark.operators.graph import hits_fixed_point

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
        )
        .distinct()
    )
    return hits_fixed_point(
        edges, iterations=_HITS_ITERS, scale=_HITS_SCALE
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_STOPS = ["the", "a", "merge", "join", "scan"]
_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
_RAKE_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "llm_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(range(0, len(t))) AS pos,
             unnest(t) AS w
      FROM (SELECT doc_id, {_RAKE_TOKS} AS t FROM documents)
    ),
    marked AS (
      SELECT doc_id, pos, w,
             SUM(CASE WHEN w IN ({_RAKE_STOPS_SQL}) OR length(w) = 0
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS ph,
             (w IN ({_RAKE_STOPS_SQL}) OR length(w) = 0) AS stop
      FROM toks
    ),
    occ AS (
      SELECT doc_id, pos, w, ph,
             COUNT(*) OVER (PARTITION BY doc_id, ph) AS plen
      FROM marked WHERE NOT stop
      QUALIFY plen <= 4
    ),
    ws AS (
      SELECT w, (SUM(plen) * 1000000) // COUNT(*) AS ws
      FROM occ GROUP BY w
    ),
    po AS (
      SELECT o.doc_id, o.ph,
             string_agg(o.w, ' ' ORDER BY o.pos) AS phrase,
             SUM(ws.ws) AS score
      FROM occ o JOIN ws USING (w)
      GROUP BY o.doc_id, o.ph
    )
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MAX(score) AS BIGINT) AS score_scaled
    FROM po GROUP BY phrase
    ORDER BY score_scaled DESC, phrase
    LIMIT 50
    """,
)
def llm_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus
    (operators/text.py:rake_keywords): stopword-bounded candidate
    phrases (gaps-and-islands, ONE per-doc window), exact
    degree/frequency word scores as truncated rationals, corpus
    top-50 phrases by exact-integer phrase score — the keyword
    complement to TextRank's sentence extraction. Word scores
    broadcast onto phrase members; top-k is distributed
    TakeOrdered."""
    from aws_datalake_spark.operators.text import rake_keywords

    return rake_keywords(
        t(spark, sf_dir, "documents").select("doc_id", "text"),
        stopwords=_RAKE_STOPS,
        max_phrase_len=4,
        top_k=50,
    )


# ---------------------------------------------------------------------------
# inter-arrival burstiness
# ---------------------------------------------------------------------------


@query(
    "q_interarrival_burstiness",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    g AS (
      SELECT user_id,
             us - LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS g
      FROM e
    ),
    m AS (
      SELECT user_id, CAST(COUNT(g) AS BIGINT) AS n,
             SUM(CAST(g AS HUGEINT)) AS sg,
             SUM(CAST(g AS HUGEINT) * g) AS sgg
      FROM g WHERE g IS NOT NULL
      GROUP BY 1
      HAVING COUNT(g) >= 5
    )
    SELECT user_id, n AS n_gaps,
           ROUND(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
             AS mean_gap_s,
           CASE WHEN n >= 2
                 AND SQRT(CAST(CAST(n AS HUGEINT) * sgg - sg * sg AS DOUBLE)
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     / 1000000.0
                     + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                     > 0.0 THEN
             ROUND((SQRT(CAST(CAST(n AS HUGEINT) * sgg - sg * sg AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    / 1000000.0
                    - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
                   / (SQRT(CAST(CAST(n AS HUGEINT) * sgg - sg * sg AS DOUBLE)
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                      / 1000000.0
                      + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0),
                   6)
           END AS burstiness
    FROM m
    """,
)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness
    (operators/stats.py:interarrival_burstiness): Goh–Barabási
    B = (σ−μ)/(σ+μ) over event gap microseconds — bot/scraper
    traffic-shape detection computed verification-grade. One
    partitioned LAG window + one exact DECIMAL(38,0) moment
    aggregate to |users| rows; µ/σ convert to seconds before
    rounding (double representability discipline)."""
    from aws_datalake_spark.operators.stats import interarrival_burstiness

    return interarrival_burstiness(
        t(spark, sf_dir, "events").select("user_id", "ts", "event_id"),
        "user_id",
        "ts",
        "event_id",
        min_gaps=5,
    )


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------

_CC_MINSUP = 2


@query(
    "q_clustering_coefficient",
    oracle=f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_CC_MINSUP}
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)
      GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN (ds.degree, e.s) < (dd.degree, e.d)
                  THEN e.s ELSE e.d END AS u,
             CASE WHEN (ds.degree, e.s) < (dd.degree, e.d)
                  THEN e.d ELSE e.s END AS v
      FROM e JOIN deg ds ON ds.node = e.s JOIN deg dd ON dd.node = e.d
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM o e1
      JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN (SELECT LEAST(u, v) AS lo, GREATEST(u, v) AS hi FROM o) e3
        ON e3.lo = e1.v AND e3.hi = e2.v
    ),
    pn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (SELECT a AS node FROM tri UNION ALL
            SELECT b FROM tri UNION ALL SELECT c FROM tri)
      GROUP BY 1
    )
    SELECT deg.node AS part, deg.degree,
           COALESCE(pn.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2 THEN
             ROUND(2.0 * CAST(COALESCE(pn.triangles, 0) AS DOUBLE)
                   / (CAST(deg.degree AS DOUBLE)
                      * (CAST(deg.degree AS DOUBLE) - 1.0)), 6)
           END AS cc
    FROM deg LEFT JOIN pn USING (node)
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part over the co-order graph
    (operators/graph.py:clustering_coefficients): cc = 2T/(d(d−1))
    from the degree-ordered triangle counts — neighborhood
    cliquishness (community tightness / bundling detection). Exact
    integer T, d; one correctly-rounded divide."""
    from aws_datalake_spark.operators.graph import (
        clustering_coefficients,
        cooccurrence_edges,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=_CC_MINSUP
    )
    return clustering_coefficients(edges).select(
        F.col("node").alias("part"), "degree", "triangles", "cc"
    )


# ---------------------------------------------------------------------------
# interval-union coverage
# ---------------------------------------------------------------------------

_IC_HOLD_S = 600


@query(
    "q_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + {_IC_HOLD_S} AS BIGINT) AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM m
    ),
    g AS (
      SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(e) - MIN(s) AS len
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len) AS BIGINT) AS covered
    FROM g GROUP BY 1
    """,
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True active seconds per user under overlapping activity
    intervals (operators/sessions.py:interval_coverage): each event
    opens a 10-minute hold; covered = exact union length of the
    holds (naive SUM double-counts overlaps). Gaps-and-islands
    sweep: two key-partitioned windows + one aggregate, all exact
    integer seconds."""
    from aws_datalake_spark.operators.sessions import interval_coverage

    iv = t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("s"),
        ((F.unix_micros("ts") / F.lit(1000000)).cast("long") + _IC_HOLD_S).alias(
            "e"
        ),
    )
    return interval_coverage(iv, "user_id", "s", "e")


# ---------------------------------------------------------------------------
# total-variation drift
# ---------------------------------------------------------------------------


@query(
    "q_tvd_drift",
    oracle="""
    WITH cell AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS c,
             CAST(COUNT(*) AS BIGINT) AS ngc
      FROM events GROUP BY 1, 2
    ),
    pg AS (SELECT day, SUM(ngc) AS ng FROM cell GROUP BY 1),
    pc AS (SELECT c, SUM(ngc) AS nc FROM cell GROUP BY 1),
    tot AS (SELECT SUM(ngc) AS nn FROM cell),
    grid AS (
      SELECT pg.day, pg.ng, tot.nn,
             ABS(CAST(COALESCE(cell.ngc, 0) AS HUGEINT) * tot.nn
                 - CAST(pc.nc AS HUGEINT) * pg.ng) AS term
      FROM pg CROSS JOIN pc CROSS JOIN tot
      LEFT JOIN cell ON cell.day = pg.day AND cell.c = pc.c
    ),
    agg AS (
      SELECT day, ng, nn, SUM(term) AS num
      FROM grid GROUP BY 1, 2, 3
    )
    SELECT day, CAST(ng AS BIGINT) AS n,
           CAST(num AS VARCHAR) AS tvd_num,
           CAST(CAST(2 AS HUGEINT) * ng * nn AS VARCHAR) AS tvd_den,
           ROUND(CAST(num AS DOUBLE) / CAST(2 * ng * nn AS DOUBLE), 6)
             AS tvd
    FROM agg
    """,
)
def q_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type mix drift vs the global mix as EXACT
    total-variation distance (operators/stats.py:tvd_drift) — the
    log-free alternative to PSI/KL, a quotient of exact integers
    over the common denominator n_g·N. Missing cells contribute via
    the bounded group×category grid; the corpus collapses in one
    (day, type) aggregate."""
    from aws_datalake_spark.operators.stats import tvd_drift

    e = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    return tvd_drift(e, "day", "event_type")


# ---------------------------------------------------------------------------
# BPE corpus encoding (train -> apply)
# ---------------------------------------------------------------------------

_BPE_K = 8


def _bpe_encode_oracle() -> str:
    """Training CTEs shared with llm_bpe_merges (_bpe_ctes), then the
    learned merges applied back onto the DISTINCT-word table with the
    same two-pass padded replace per merge, then per-source token /
    piece totals."""
    from aws_datalake_spark.queries.llm_text import _bpe_ctes

    ctes = _bpe_ctes(_BPE_K)
    enc = ["""enc0 AS (
      SELECT w,
             array_to_string(list_transform(range(1, length(w)+1),
                                            i -> w[i]), ' ') AS s
      FROM (SELECT DISTINCT w FROM tok)
    )"""]
    for i in range(1, _BPE_K + 1):
        rep = f"' ' || (SELECT pair FROM t{i}) || ' '"
        new = f"' ' || (SELECT replace(pair, ' ', '') FROM t{i}) || ' '"
        enc.append(f"""enc{i} AS (
      SELECT w, trim(replace(replace(' ' || s || ' ', {rep}, {new}),
                             {rep}, {new})) AS s
      FROM enc{i - 1}
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """,
    tok AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1, 2
    ),
    """
        + ",\n".join(enc)
        + f"""
    SELECT tok.source,
           CAST(SUM(tok.n) AS BIGINT) AS n_tokens,
           CAST(SUM(tok.n * len(string_split(e.s, ' '))) AS BIGINT)
             AS total_pieces,
           ROUND(CAST(SUM(tok.n * len(string_split(e.s, ' '))) AS DOUBLE)
                 / CAST(SUM(tok.n) AS DOUBLE), 6) AS fertility
    FROM tok JOIN enc{_BPE_K} e USING (w)
    GROUP BY 1
    """
    )


@query("llm_bpe_encode", oracle=_bpe_encode_oracle())
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer train→APPLY end-to-end (operators/bpe.py:bpe_encode):
    train the 8-merge BPE table on the corpus (hash-certified trainer,
    llm_bpe_merges), pull the K-row merge table to the driver (the
    bounded k-centroids-style pull), bake the merges into the plan as
    literal replace chains, and encode the DISTINCT-word table — each
    word is encoded once however often it occurs; per-source token
    and piece totals then come from one (source, word)-count join.
    Fertility under the TRAINED tokenizer (vs llm_fertility_by_lang's
    regex proxy) is the signal that actually sizes vocabularies.
    Encoding is a pure projection (no shuffle); the oracle replays
    the merges with the proven two-pass padded replace."""
    from aws_datalake_spark.operators.bpe import bpe_encode, bpe_merges_batched
    from aws_datalake_spark.operators.text import tokens_ws

    docs = t(spark, sf_dir, "documents")
    merges_rows = (
        bpe_merges_batched(docs, num_merges=_BPE_K).orderBy("merge_rank").collect()
    )
    merges = [tuple(r.pair.split(" ", 1)) for r in merges_rows]
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # tok feeds the distinct-word frame AND the final join (PERF §26)
    tok = _truncate(
        docs.select(
            "source", F.explode(tokens_ws(F.col("text"))).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uniq = tok.select("w").distinct()
    enc = bpe_encode(uniq, merges, text_col="w", id_col="w").select(
        F.col("token").alias("w"), F.col("n_pieces")
    )
    joined = tok.join(enc, "w")
    return joined.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * F.col("n_pieces")).alias("total_pieces"),
        F.round(
            F.sum(F.col("n") * F.col("n_pieces")).cast("double")
            / F.sum("n").cast("double"),
            6,
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


@query(
    "q_ks_test",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS cents
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    pv AS (
      SELECT cents,
             CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM v GROUP BY 1
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS cuma,
             SUM(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS cumb
      FROM pv
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM pv),
    d AS (
      SELECT MAX(ABS(CAST(cuma AS HUGEINT) * tot.nb
                     - CAST(cumb AS HUGEINT) * tot.na)) AS dnum,
             MAX(tot.na) AS na, MAX(tot.nb) AS nb
      FROM cum, tot
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(dnum AS VARCHAR) AS d_num,
           CAST(CAST(na AS HUGEINT) * nb AS VARCHAR) AS d_den,
           ROUND(CAST(dnum AS DOUBLE)
                 / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE), 6) AS d
    FROM d
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between two
    customer segments' balance distributions
    (operators/stats.py:ks_two_sample): D over the common
    denominator n_a·n_b is a max of exact DECIMAL(38,0) terms — the
    nonparametric shape-shift complement to q_welch_ttest's
    mean test. The only window runs over the DISTINCT-cents domain
    (exact_auc discipline), never corpus rows."""
    from aws_datalake_spark.operators.stats import ks_two_sample

    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    return ks_two_sample(
        c, "c_mktsegment", F.col("cents"), "AUTOMOBILE", "BUILDING"
    )


# ---------------------------------------------------------------------------
# Kruskal–Wallis H
# ---------------------------------------------------------------------------


@query(
    "q_kruskal_wallis",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS val
      FROM customer
    ),
    gv AS (
      SELECT g, val, CAST(COUNT(*) AS BIGINT) AS cgv
      FROM v GROUP BY 1, 2
    ),
    pv AS (SELECT val, SUM(cgv) AS cv FROM gv GROUP BY 1),
    ranked AS (
      SELECT val, cv,
             2 * COALESCE(SUM(cv) OVER (ORDER BY val
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) + cv + 1 AS dr
      FROM pv
    ),
    per_g AS (
      SELECT gv.g, SUM(gv.cgv) AS n,
             SUM(CAST(gv.cgv AS HUGEINT) * ranked.dr) AS d
      FROM gv JOIN ranked USING (val)
      GROUP BY 1
    ),
    folded AS (
      SELECT SUM(CAST(d * d AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))
               OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS s,
             SUM(n) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS ncum,
             ROW_NUMBER() OVER (ORDER BY g) AS rn,
             COUNT(*) OVER () AS k
      FROM per_g
    ),
    ties AS (
      SELECT SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS t FROM pv
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(ncum AS BIGINT) AS n,
           CAST(t AS BIGINT) AS ties_t,
           ROUND(12.0 * s / (CAST(ncum AS DOUBLE)
                             * (CAST(ncum AS DOUBLE) + 1.0))
                 - 3.0 * (CAST(ncum AS DOUBLE) + 1.0), 6) AS h,
           CASE WHEN 1.0 - CAST(t AS DOUBLE)
                      / CAST(CAST(ncum AS HUGEINT) * ncum * ncum - ncum
                             AS DOUBLE) > 0.0 THEN
             ROUND((12.0 * s / (CAST(ncum AS DOUBLE)
                                * (CAST(ncum AS DOUBLE) + 1.0))
                    - 3.0 * (CAST(ncum AS DOUBLE) + 1.0))
                   / (1.0 - CAST(t AS DOUBLE)
                      / CAST(CAST(ncum AS HUGEINT) * ncum * ncum - ncum
                             AS DOUBLE)), 6)
           END AS h_adj
    FROM folded, ties
    WHERE rn = k
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across all five customer segments on balance
    cents (operators/stats.py:kruskal_wallis): the nonparametric
    ANOVA with tie correction, computed verification-grade — doubled
    average ranks are exact DECIMAL(38,0) integers (exact_auc
    device); the k per-group float terms fold in a pinned
    left-to-right order via a cumulative window over the k-row
    frame, so even IEEE addition order matches the oracle. The rank
    window runs over the DISTINCT-cents domain only."""
    from aws_datalake_spark.operators.stats import kruskal_wallis

    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    return kruskal_wallis(c, "c_mktsegment", F.col("cents"))


# ---------------------------------------------------------------------------
# t-closeness release gate
# ---------------------------------------------------------------------------


@query(
    "q_t_closeness",
    oracle="""
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS sens
      FROM customer
    ),
    cell AS (
      SELECT c_nationkey, sens, CAST(COUNT(*) AS BIGINT) AS ngc
      FROM base GROUP BY 1, 2
    ),
    pg AS (SELECT c_nationkey, SUM(ngc) AS ng FROM cell GROUP BY 1),
    pc AS (SELECT sens, SUM(ngc) AS nc FROM cell GROUP BY 1),
    tot AS (
      SELECT SUM(ngc) AS nn, COUNT(DISTINCT sens) AS m FROM cell
    ),
    grid AS (
      SELECT pg.c_nationkey, pc.sens, pg.ng, tot.nn, tot.m,
             CAST(COALESCE(cell.ngc, 0) AS HUGEINT) * tot.nn
               - CAST(pc.nc AS HUGEINT) * pg.ng AS d
      FROM pg CROSS JOIN pc CROSS JOIN tot
      LEFT JOIN cell ON cell.c_nationkey = pg.c_nationkey
                    AND cell.sens = pc.sens
    ),
    cum AS (
      SELECT c_nationkey, ng, nn, m,
             SUM(d) OVER (PARTITION BY c_nationkey ORDER BY sens
                          ROWS UNBOUNDED PRECEDING) AS cumd
      FROM grid
    ),
    agg AS (
      SELECT c_nationkey, ng, nn, m, SUM(ABS(cumd)) AS num
      FROM cum GROUP BY 1, 2, 3, 4
    )
    SELECT c_nationkey, CAST(ng AS BIGINT) AS n,
           CAST(num AS VARCHAR) AS emd_num,
           CAST(CAST(ng AS HUGEINT) * nn * (m - 1) AS VARCHAR) AS emd_den,
           ROUND(CAST(num AS DOUBLE)
                 / CAST(ng * nn * (m - 1) AS DOUBLE), 6) AS emd,
           num * 4 > CAST(1 AS HUGEINT) * ng * nn * (m - 1) AS violates
    FROM agg
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release gate (operators/dq.py:t_closeness_audit):
    per-nation EMD between the group's ordered balance-bucket
    distribution and the global one, in the Li et al. unit-distance
    closed form — exact DECIMAL(38,0) cumulative terms over the
    common denominator n_g·N·(m−1), the violation compared in exact
    integers (no float in the gate). Completes the
    k-anonymity / l-diversity / t-closeness trio."""
    from aws_datalake_spark.operators.dq import t_closeness_audit

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000.0).alias("sens"),
    )
    return t_closeness_audit(
        c, ["c_nationkey"], "sens", t_threshold_num=1, t_threshold_den=4
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend + Theil–Sen slope
# ---------------------------------------------------------------------------


@query(
    "q_mann_kendall",
    oracle="""
    WITH monthly AS (
      SELECT r.r_name AS g,
             CAST(EXTRACT(year FROM o.o_orderdate) * 12
                  + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS t,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                            * 100.0) AS BIGINT)) AS x
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.g,
             CAST(SIGN(b.x - a.x) AS BIGINT) AS sgn,
             ((b.x - a.x) * 1000000) // (b.t - a.t) AS sl
      FROM monthly a JOIN monthly b
        ON a.g = b.g AND a.t < b.t
    ),
    sen AS (
      SELECT g, sl AS sen_sl FROM (
        SELECT g, sl,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY sl) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS cnt
        FROM pairs
      ) WHERE rn = (cnt + 1) // 2
    ),
    sagg AS (SELECT g, CAST(SUM(sgn) AS BIGINT) AS s FROM pairs GROUP BY 1),
    nagg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY 1),
    ties AS (
      SELECT g, SUM(CAST(tc AS HUGEINT) * (tc - 1) * (2 * tc + 5)) AS tt
      FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS tc
            FROM monthly GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT nagg.g AS region, nagg.n, sagg.s,
           CASE WHEN CAST(CAST(nagg.n AS HUGEINT) * (nagg.n - 1)
                          * (2 * nagg.n + 5) - ties.tt AS DOUBLE) / 18.0
                     <= 0.0 THEN NULL
                WHEN sagg.s > 0 THEN
             ROUND((CAST(sagg.s AS DOUBLE) - 1.0)
                   / SQRT(CAST(CAST(nagg.n AS HUGEINT) * (nagg.n - 1)
                               * (2 * nagg.n + 5) - ties.tt AS DOUBLE)
                          / 18.0), 6)
                WHEN sagg.s < 0 THEN
             ROUND((CAST(sagg.s AS DOUBLE) + 1.0)
                   / SQRT(CAST(CAST(nagg.n AS HUGEINT) * (nagg.n - 1)
                               * (2 * nagg.n + 5) - ties.tt AS DOUBLE)
                          / 18.0), 6)
                ELSE 0.0
           END AS z,
           ROUND(CAST(sen.sen_sl AS DOUBLE) / 1000000.0, 6) AS sen_slope
    FROM nagg JOIN sagg USING (g) JOIN ties USING (g) JOIN sen USING (g)
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test + Theil–Sen slope on monthly
    revenue cents per region (operators/stats.py:mann_kendall): the
    robust trend readout — exact integer S and tie-corrected
    variance, truncated-rational pairwise slopes, exact lower-median
    Sen slope. The |T|²/2 pair join runs on the AGGREGATED monthly
    frame (~84 rows per region), never corpus rows."""
    from aws_datalake_spark.operators.stats import mann_kendall

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("long").alias("t"),
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * F.lit(100.0),
                0,
            )
            .cast("long")
            .alias("cents"),
        )
        .groupBy("region", "t")
        .agg(F.sum("cents").alias("x"))
    )
    return mann_kendall(monthly, "region", "t", F.col("x"))


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------

_KC_K, _KC_ROUNDS, _KC_MINSUP = 3, 4, 2


def _kcore_oracle() -> str:
    ctes = [f"""lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_KC_MINSUP}
    )"""]
    for i in range(1, _KC_ROUNDS + 1):
        prev = f"e{i - 1}"
        ctes.append(f"""k{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, COUNT(*) AS degree FROM (
          SELECT s AS node FROM {prev} UNION ALL SELECT d FROM {prev}
        ) GROUP BY 1
      ) WHERE degree >= {_KC_K}
    )""")
        ctes.append(f"""e{i} AS MATERIALIZED (
      SELECT s, d FROM {prev}
      WHERE s IN (SELECT node FROM k{i}) AND d IN (SELECT node FROM k{i})
    )""")
    last = f"e{_KC_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    fin AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT s AS node FROM {last} UNION ALL SELECT d FROM {last}
      ) GROUP BY 1
    ),
    bad AS (
      SELECT COALESCE(SUM(CASE WHEN degree < {_KC_K} THEN 1 ELSE 0 END), 0)
               AS nbad
      FROM fin
    )
    SELECT fin.node AS part, fin.degree, bad.nbad = 0 AS converged
    FROM fin, bad
    """
    )


@query("q_graph_kcore", oracle=_kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone of the part co-order graph
    (operators/graph.py:kcore_peel): 4 fixed peeling rounds at k=3 —
    exact integer degrees, chained-CTE oracle (the PageRank/HITS
    fixed-iteration discipline), and a RESULT-derived convergence
    certificate (true iff no survivor still has degree < k), so an
    insufficient round budget reports itself. Each round is one
    degree aggregate + two keys-only semi-joins on the shrinking
    edge frame."""
    from aws_datalake_spark.operators.graph import (
        cooccurrence_edges,
        kcore_peel,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=_KC_MINSUP
    )
    return kcore_peel(edges, k=_KC_K, rounds=_KC_ROUNDS).select(
        F.col("node").alias("part"), "degree", "converged"
    )


# ---------------------------------------------------------------------------
# label-propagation communities
# ---------------------------------------------------------------------------

_LPA_ITERS, _LPA_MINSUP = 3, 2


def _lpa_oracle() -> str:
    ctes = [f"""lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    raw AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_LPA_MINSUP}
    ),
    bi AS MATERIALIZED (
      SELECT s AS a, d AS b FROM raw
      UNION SELECT d, s FROM raw
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM bi)"""]
    for i in range(1, _LPA_ITERS + 1):
        prev = f"l{i - 1}"
        ctes.append(f"""l{i} AS MATERIALIZED (
      SELECT a AS node, label FROM (
        SELECT bi.a, p.label, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY bi.a
                                  ORDER BY COUNT(*) DESC, p.label) AS rn
        FROM bi JOIN {prev} p ON p.node = bi.b
        GROUP BY bi.a, p.label
      ) WHERE rn = 1
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT node AS part, CAST(label AS BIGINT) AS label
    FROM l{_LPA_ITERS}
    """
    )


@query("q_graph_communities", oracle=_lpa_oracle())
def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities on the part co-order graph
    (operators/graph.py:label_propagation): 3 synchronous rounds,
    most-frequent neighbor label with MIN-label tie-break — fully
    deterministic, so the iterative result hash-matches a
    chained-CTE oracle (random-order LPA never could). Splits the
    co-purchase graph into dense bundles where connected components
    (llm_dedup_clusters' machinery) would merge everything
    reachable."""
    from aws_datalake_spark.operators.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=_LPA_MINSUP
    )
    return label_propagation(edges, iterations=_LPA_ITERS).select(
        F.col("node").alias("part"), F.col("label").cast("long").alias("label")
    )


# ---------------------------------------------------------------------------
# k-truss peeling
# ---------------------------------------------------------------------------

_KT_K, _KT_ROUNDS, _KT_MINSUP = 3, 3, 2


def _ktruss_oracle() -> str:
    def support_ctes(r: int, src: str) -> list[str]:
        return [f"""d{r} AS MATERIALIZED (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT s AS node FROM {src} UNION ALL SELECT d FROM {src}
      ) GROUP BY 1
    )""", f"""o{r} AS MATERIALIZED (
      SELECT CASE WHEN (ds.degree, e.s) < (dd.degree, e.d)
                  THEN e.s ELSE e.d END AS u,
             CASE WHEN (ds.degree, e.s) < (dd.degree, e.d)
                  THEN e.d ELSE e.s END AS v
      FROM {src} e JOIN d{r} ds ON ds.node = e.s
                   JOIN d{r} dd ON dd.node = e.d
    )""", f"""tri{r} AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM o{r} e1
      JOIN o{r} e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN (SELECT LEAST(u, v) AS lo, GREATEST(u, v) AS hi FROM o{r}) e3
        ON e3.lo = e1.v AND e3.hi = e2.v
    )""", f"""sup{r} AS MATERIALIZED (
      SELECT s, d, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT LEAST(a, b) AS s, GREATEST(a, b) AS d FROM tri{r}
        UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tri{r}
        UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM tri{r}
      ) GROUP BY 1, 2
    )"""]

    ctes = [f"""lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_KT_MINSUP}
    )"""]
    for r in range(_KT_ROUNDS):
        ctes += support_ctes(r, f"e{r}")
        ctes.append(f"""e{r + 1} AS MATERIALIZED (
      SELECT e.s, e.d FROM e{r} e JOIN sup{r} USING (s, d)
      WHERE support >= {_KT_K - 2}
    )""")
    rf = _KT_ROUNDS
    ctes += support_ctes(rf, f"e{rf}")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    fin AS (
      SELECT e.s, e.d, COALESCE(sup{rf}.support, 0) AS support
      FROM e{rf} e LEFT JOIN sup{rf} USING (s, d)
    ),
    bad AS (
      SELECT COALESCE(SUM(CASE WHEN support < {_KT_K - 2} THEN 1 ELSE 0 END),
                      0) AS nbad
      FROM fin
    )
    SELECT fin.s AS part_a, fin.d AS part_b, fin.support,
           bad.nbad = 0 AS converged
    FROM fin, bad
    """
    )


@query("q_graph_ktruss", oracle=_ktruss_oracle())
def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss backbone of the part co-order graph
    (operators/graph.py:ktruss_peel): edges kept only while in ≥ 1
    triangle — the EDGE-level density gate, stricter than k-core.
    3 fixed peeling rounds, each one degree-ordered m^1.5 triangle
    enumeration + an edge filter; final supports recomputed on the
    survivors with a result-derived convergence certificate. Exact
    integer supports hash-match a chained-CTE oracle."""
    from aws_datalake_spark.operators.graph import (
        cooccurrence_edges,
        ktruss_peel,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=_KT_MINSUP
    )
    return ktruss_peel(edges, k=_KT_K, rounds=_KT_ROUNDS).select(
        F.col("s").alias("part_a"),
        F.col("d").alias("part_b"),
        "support",
        "converged",
    )


# ---------------------------------------------------------------------------
# AMS F2 sketch + accuracy harness
# ---------------------------------------------------------------------------

_AMS_K = 8
_AMS_H60 = "('0x' || substr(md5('ams' || CAST(k AS VARCHAR) || '|' || w), 1, 15))::BIGINT"


@query(
    "q_ams_f2",
    oracle=f"""
    WITH counts AS (
      SELECT source AS g, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT g, SUM(CAST(c AS HUGEINT) * c) AS f2 FROM counts GROUP BY 1
    ),
    signed AS (
      SELECT g, k, (1 - 2 * ({_AMS_H60} % 2)) * c AS sc
      FROM counts CROSS JOIN (SELECT unnest(range(0, {_AMS_K})) AS k)
    ),
    sk AS (SELECT g, k, SUM(sc) AS x FROM signed GROUP BY 1, 2),
    est AS (
      SELECT g, SUM(CAST(x AS HUGEINT) * x) AS sx2,
             CAST(COUNT(*) AS BIGINT) AS kc
      FROM sk GROUP BY 1
    )
    SELECT truth.g AS source, CAST(truth.f2 AS BIGINT) AS f2_true,
           ROUND(CAST(est.sx2 AS DOUBLE) / CAST(est.kc AS DOUBLE), 6)
             AS ams_estimate,
           CASE WHEN truth.f2 > 0 THEN
             ROUND(ABS(CAST(est.sx2 AS DOUBLE) / CAST(est.kc AS DOUBLE)
                       - CAST(truth.f2 AS DOUBLE))
                   / CAST(truth.f2 AS DOUBLE), 6)
           END AS rel_err
    FROM truth JOIN est USING (g)
    """,
)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch vs exact truth on per-source token
    frequencies (operators/sketches.py:ams_f2_report): 8
    deterministic ±1 sketches, exact-integer sketch state, mean-of-
    squares estimate with its relative error against Σc² — the
    sketch AND its accuracy harness in one plan (self-join size /
    skew estimation at 100 TB keeps K longs per group)."""
    from aws_datalake_spark.operators.sketches import ams_f2_report
    from aws_datalake_spark.operators.text import tokens_ws

    toks = t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_ws(F.col("text"))).alias("w")
    )
    return ams_f2_report(toks, "source", "w", num_sketches=_AMS_K).select(
        F.col("source"), "f2_true", "ams_estimate", "rel_err"
    )


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------

_PPR_ITERS, _PPR_SCALE = 5, 10**12


def _ppr_oracle() -> str:
    steps = []
    for i in range(_PPR_ITERS):
        prev = "it0" if i == 0 else f"it{i}"
        steps.append(f"""
    it{i + 1} AS (
      SELECT n.node,
             CASE WHEN n.node IN (SELECT node FROM seeds)
                  THEN (SELECT base FROM params) ELSE 0 END
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
    seeds AS (
      SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
      FROM supplier WHERE s_suppkey % 5 = 0
    ),
    sg AS (SELECT node FROM nodes WHERE node IN (SELECT node FROM seeds)),
    outdeg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY 1
    ),
    params AS (
      SELECT (15 * {_PPR_SCALE}) // (100 * COUNT(*)) AS base,
             {_PPR_SCALE} // COUNT(*) AS init
      FROM sg
    ),
    it0 AS (
      SELECT n.node,
             CASE WHEN n.node IN (SELECT node FROM sg)
                  THEN CAST((SELECT init FROM params) AS BIGINT)
                  ELSE 0 END AS rank
      FROM nodes n
    ),{",".join(steps)}
    SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM it{_PPR_ITERS}
    """


@query("q_graph_ppr", oracle=_ppr_oracle())
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed supplier pool (every fifth
    supplier key — non-empty at every fixture scale) over the
    supplier→customer graph (operators/graph.py:
    personalized_pagerank): restart mass only on the seed suppliers,
    so ranks measure reach FROM that pool — topic-sensitive
    centrality, exact scaled-integer, 5-level chained-CTE oracle.
    Same Pregel shape and lineage discipline as q_graph_pagerank."""
    from aws_datalake_spark.operators.graph import personalized_pagerank
    from aws_datalake_spark.queries._shared import render_sc_node, sc_edges_int

    # int64 node ids end-to-end; labels rendered in the readout only
    # (see q_graph_pagerank)
    seeds = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 5 == 0)
        .select((F.col("s_suppkey") * 2).alias("node"))
    )
    ranks = personalized_pagerank(
        sc_edges_int(spark, sf_dir), seeds,
        iterations=_PPR_ITERS, scale=_PPR_SCALE,
    )
    return ranks.select(
        render_sc_node(F.col("node")).alias("node"), "rank_scaled"
    )


# ---------------------------------------------------------------------------
# Davies–Bouldin cluster-quality index
# ---------------------------------------------------------------------------

_DB_K, _DB_ITERS, _DB_DIM = 8, 3, 64


def _db_index_oracle() -> str:
    from aws_datalake_spark.queries.llm_similarity import _kmeans_ctes

    ctes, d2 = _kmeans_ctes(_DB_K, _DB_ITERS, _DB_DIM)
    cN = f"c{_DB_ITERS}"
    md2 = (
        "list_sum(list_transform(range(0,%d), "
        "x -> (a.c[x+1]-b.c[x+1])*(a.c[x+1]-b.c[x+1])))" % _DB_DIM
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    a AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT e.vec_id, {cN}.cid, {d2} AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, {cN}.cid) AS rn
        FROM e, {cN}
      ) WHERE rn = 1
    ),
    s AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(d2 AS HUGEINT)) AS sd
      FROM a GROUP BY 1
    ),
    mm AS (
      SELECT a.cid AS i, b.cid AS j, {md2} AS m
      FROM {cN} a, {cN} b WHERE a.cid <> b.cid
    ),
    ratios AS (
      SELECT mm.i AS cid,
             (CAST(si.sd AS DOUBLE) / CAST(si.n AS DOUBLE)
              + CAST(sj.sd AS DOUBLE) / CAST(sj.n AS DOUBLE))
               / CAST(mm.m AS DOUBLE) AS ratio
      FROM mm JOIN s si ON si.cid = mm.i JOIN s sj ON sj.cid = mm.j
      WHERE mm.m > 0
    ),
    r AS (SELECT cid, MAX(ratio) AS rmax FROM ratios GROUP BY 1),
    folded AS (
      SELECT SUM(rmax) OVER (ORDER BY cid ROWS UNBOUNDED PRECEDING) AS srm,
             ROW_NUMBER() OVER (ORDER BY cid) AS rn,
             COUNT(*) OVER () AS kk
      FROM r
    ),
    db AS (SELECT srm / CAST(kk AS DOUBLE) AS dbi FROM folded WHERE rn = kk)
    SELECT s.cid, s.n,
           ROUND(CAST(s.sd AS DOUBLE) / CAST(s.n AS DOUBLE)
                 / 1000000000000.0, 6) AS s_mean,
           ROUND(r.rmax, 6) AS r_max,
           ROUND(db.dbi, 6) AS db_index
    FROM s JOIN r USING (cid), db
    """
    )


@query("llm_cluster_db_index", oracle=_db_index_oracle())
def llm_cluster_db_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin index over the exact-integer k-means fit
    (operators/clustering.py:davies_bouldin_exact): sqrt-free
    squared-distance variant — exact DECIMAL scatter sums, literal
    centroid-pair distances, mirrored IEEE ratios, and a PINNED-order
    fold for the final mean — the clustering-quality eval harness
    beside llm_kmeans_cells (lower = tighter/better-separated; the
    number that says whether k fits)."""
    from aws_datalake_spark.operators.clustering import (
        davies_bouldin_exact,
        kmeans_fit_exact,
        quantize_vectors_int,
    )
    from aws_datalake_spark.queries.llm_similarity import _emb_double

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # materialized once: the quantize transform over the parquet read
    # otherwise re-executes per k-means iteration (init + 3 updates)
    # and again for the DB-index scatter pass
    e = _truncate(
        quantize_vectors_int(
            _emb_double(spark, sf_dir).select("vec_id", "embedding")
        )
    )
    cents = kmeans_fit_exact(e, k=_DB_K, max_iter=_DB_ITERS)
    return davies_bouldin_exact(e, cents)


# ---------------------------------------------------------------------------
# rolling-window OLS trend
# ---------------------------------------------------------------------------

_ROLL_W = 30


@query(
    "q_rolling_regression",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS g,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT g, t,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             SUM(CAST(t AS HUGEINT)) OVER w AS sx,
             SUM(CAST(y AS HUGEINT)) OVER w AS sy,
             SUM(CAST(t AS HUGEINT) * t) OVER w AS sxx,
             SUM(CAST(t AS HUGEINT) * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY g ORDER BY t
                   ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT g AS event_type, t, n AS n_window,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     > 0.0 THEN
             ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                   / 1.0, 6)
           END AS slope
    FROM agg
    """,
)
def q_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-bucket OLS slope of daily event volume per type
    (operators/stats.py:rolling_ols): "is this stream accelerating
    RIGHT NOW" — all five regression moments as exact-integer window
    sums in ONE key-partitioned WindowExec over the (type, day)
    aggregate, then the ols_by_group decimal algebra per row."""
    from aws_datalake_spark.operators.stats import rolling_ols

    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).cast("long").alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return rolling_ols(
        daily, "event_type", "t", F.col("y"), window_rows=_ROLL_W
    )


# ---------------------------------------------------------------------------
# Gini–Simpson diversity
# ---------------------------------------------------------------------------


@query(
    "llm_simpson_diversity",
    oracle="""
    WITH counts AS (
      SELECT source AS g, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    g AS (
      SELECT g, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS t,
             SUM(CAST(c AS HUGEINT) * (c - 1)) AS ss
      FROM counts GROUP BY 1
    )
    SELECT g AS source, CAST(n AS BIGINT) AS n, t AS n_types,
           CASE WHEN n >= 2 THEN
             ROUND(1.0 - CAST(ss AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE), 6)
           END AS simpson
    FROM g
    """,
)
def llm_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Gini–Simpson token diversity per source
    (operators/stats.py:simpson_diversity): the log-free
    abundance-weighted collapse detector beside the type-token
    ratios of llm_diversity_by_source — two map-combinable
    aggregates, exact DECIMAL(38,0) integers, one rounded divide."""
    from aws_datalake_spark.operators.stats import simpson_diversity
    from aws_datalake_spark.operators.text import tokens_ws

    toks = t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_ws(F.col("text"))).alias("w")
    )
    return simpson_diversity(toks, "source", "w")


# ---------------------------------------------------------------------------
# decile lift / gains table
# ---------------------------------------------------------------------------

_LIFT_PRICE = 200000.0


@query(
    "q_decile_lift",
    oracle=f"""
    WITH resp AS (
      SELECT c.c_custkey,
             CAST(ROUND(c.c_acctbal * 100.0) AS BIGINT) AS score,
             CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > {_LIFT_PRICE}
             ) THEN 1 ELSE 0 END AS responder
      FROM customer c
    ),
    ranked AS (
      SELECT score, responder,
             ROW_NUMBER() OVER (ORDER BY score DESC, c_custkey) AS rn,
             COUNT(*) OVER () AS n
      FROM resp
    ),
    dec AS (
      SELECT ((rn - 1) * 10) // n + 1 AS decile, responder, n FROM ranked
    ),
    per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(responder) AS BIGINT) AS responders
      FROM dec GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_customers) AS BIGINT) AS nt,
             CAST(SUM(responders) AS BIGINT) AS rt
      FROM per
    )
    SELECT per.decile, per.n_customers, per.responders,
           ROUND(CAST(per.responders AS DOUBLE)
                 / CAST(per.n_customers AS DOUBLE), 6) AS response_rate,
           CASE WHEN tot.rt > 0 THEN
             ROUND(CAST(per.responders AS DOUBLE)
                   / CAST(per.n_customers AS DOUBLE)
                   / (CAST(tot.rt AS DOUBLE) / CAST(tot.nt AS DOUBLE)), 6)
           END AS lift
    FROM per, tot
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table: customers ranked by balance cents
    (deterministic custkey tiebreak), deciles via the exact integer
    formula ((rn−1)·10) div n + 1 — NO ntile (its tie behavior is
    engine-defined), response = placed a large order, lift = decile
    rate over the overall rate in a fixed IEEE order. The ranking
    window runs over the customer dimension (bounded), the responder
    flag is one semi-join, totals broadcast."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("score"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _LIFT_PRICE)
        .select("o_custkey")
        .distinct()
    )
    resp = c.join(
        o.withColumnRenamed("o_custkey", "c_custkey").withColumn(
            "__r", F.lit(1)
        ),
        "c_custkey",
        "left",
    ).select(
        "c_custkey", "score", F.coalesce(F.col("__r"), F.lit(0)).alias("responder")
    )
    w = Window.orderBy(F.desc("score"), F.asc("c_custkey"))
    ranked = resp.select(
        "responder",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    per = (
        ranked.select(
            F.expr("((rn - 1) * 10) div n + 1").alias("decile"), "responder"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("responder").alias("responders"),
        )
    )
    tot = per.agg(
        F.sum("n_customers").alias("nt"), F.sum("responders").alias("rt")
    )
    rate = F.col("responders").cast("double") / F.col("n_customers").cast(
        "double"
    )
    overall = F.col("rt").cast("double") / F.col("nt").cast("double")
    return per.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "responders",
        F.round(rate, 6).alias("response_rate"),
        F.when(F.col("rt") > 0, F.round(rate / overall, 6)).alias("lift"),
    )


# ---------------------------------------------------------------------------
# ABC / Pareto classification
# ---------------------------------------------------------------------------


@query(
    "q_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100.0)
                      AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, cents,
             SUM(CAST(cents AS HUGEINT))
               OVER (ORDER BY cents DESC, l_partkey
                     ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(cents AS HUGEINT)) OVER () AS total
      FROM rev
    ),
    classed AS (
      SELECT l_partkey, cents,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY 1
    """,
)
def q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue
    cents, class boundaries decided in EXACT integers
    (cum·100 ≤ total·80 — no float share ever computed), summarized
    per class. The cumulative window runs over the parts aggregate
    (bounded), never lineitem rows."""
    from pyspark.sql import Window

    rev = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0,
                0,
            )
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.orderBy(F.desc("cents"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    classed = rev.select(
        "cents",
        F.when(
            dec(F.sum("cents").over(w)) * 100 <= dec(F.sum("cents").over(wt)) * 80,
            F.lit("A"),
        )
        .when(
            dec(F.sum("cents").over(w)) * 100 <= dec(F.sum("cents").over(wt)) * 95,
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test
# ---------------------------------------------------------------------------


@query(
    "q_runs_test",
    oracle="""
    WITH per AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nd, CAST(SUM(x) AS HUGEINT) AS tx
      FROM per
    ),
    signed AS (
      SELECT day, CASE WHEN tot.nd * per.x > tot.tx THEN 1 ELSE 0 END AS s
      FROM per, tot
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                       OR LAG(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS brk
      FROM signed
    ),
    agg AS (
      SELECT CAST(SUM(brk) AS BIGINT) AS r,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM runs
    )
    SELECT r, n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0 AND (n1 + n2) > 1
                 AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                     / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                        * (CAST(n1 + n2 AS DOUBLE) - 1.0)) > 0.0 THEN
             ROUND((CAST(r AS DOUBLE)
                    - (2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE) + 1.0))
                   / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                          / (CAST(n1 + n2 AS DOUBLE)
                             * CAST(n1 + n2 AS DOUBLE)
                             * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 6)
           END AS z
    FROM agg
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily event volume (above/below
    the MEAN, decided in exact integers n·x > T — the log-free
    randomness check: too few runs = trending/clustered, too many =
    oscillating). Runs counted by the LAG-break idiom over the
    (day,) aggregate; z uses the standard normal approximation with
    mirrored IEEE ops."""
    from pyspark.sql import Window
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    per = _truncate(
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nd"),
        F.sum("x").cast("decimal(38,0)").alias("tx"),
    )
    signed = per.crossJoin(F.broadcast(tot)).select(
        "day",
        F.when(
            F.col("nd") * F.col("x").cast("decimal(38,0)") > F.col("tx"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("s"),
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    agg = runs.agg(
        F.sum("brk").alias("r"),
        F.sum("s").alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    var = (
        F.lit(2.0) * n1d * n2d * (F.lit(2.0) * n1d * n2d - (F.col("n1") + F.col("n2")))
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & ((F.col("n1") + F.col("n2")) > 1)
        & (var > 0.0),
        F.round(
            (F.col("r").cast("double") - (F.lit(2.0) * n1d * n2d / nd + F.lit(1.0)))
            / F.sqrt(var),
            6,
        ),
    )
    return agg.select(
        F.col("r").cast("long").alias("r"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        z.alias("z"),
    )
