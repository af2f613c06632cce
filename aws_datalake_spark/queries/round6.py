"""Round-5-session additions (certify in the round-6 window):
gap-based sessionization with journey stats, count-min frequency
sketching, mergeable binned quantile sketches, MOSS winnowing
fingerprints, degree-oriented triangle counting, sequence n-gram
mining, exact-arithmetic correlation, weighted exact quantiles
(global + by-group), the shard-skew Gini report, interval-overlap
joins, and rolling distinct-day windows.

All new surface beyond SURVEY.md §2 (the reference has none of
these); each pairs a scalable Spark plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_H60 = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"

# ---------------------------------------------------------------------------
# sessionization + journeys
# ---------------------------------------------------------------------------

_GAP = 4 * 3600  # 4 hours


@query(
    "q_session_journeys",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    lagged AS (
      SELECT *, LAG(es) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM e
    ),
    s AS (
      SELECT *, CAST(SUM(CASE WHEN prev IS NULL OR es - prev > {_GAP}
                         THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
      FROM lagged
    ),
    r AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                           ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                           ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM s
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
             - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_sec,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn_a = 1 THEN event_type END) AS entry_event,
           MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_event,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types
    FROM r GROUP BY user_id, session_seq
    """,
)
def q_session_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessions.py): label every
    event with a per-user session (4 h inactivity gap, integer
    epoch-second comparisons, (ts, event_id) tie-break), then one
    map-combinable rollup per session — entry/exit via min_by/max_by,
    no second window sort. Both windows partition by user_id: one
    hash exchange, per-partition sorts, no global state."""
    from aws_datalake_spark.operators.sessions import session_stats, sessionize

    ev = t(spark, sf_dir, "events")
    return session_stats(sessionize(ev, gap_seconds=_GAP))


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

_CM_D, _CM_W = 4, 32


def _cm_cells_sql(expr: str) -> str:
    """UNION ALL of the depth hash rows for ``expr`` (oracle twin of
    the countmin explode)."""
    rows = []
    for i in range(_CM_D):
        h = _H60.format(expr=f"'cm{i}' || {expr}")
        rows.append(f"SELECT {i} AS d, ({h}) % {_CM_W} AS bucket, user_id FROM base")
    return "\nUNION ALL\n".join(rows)


@query(
    "q_countmin_frequencies",
    oracle=f"""
    WITH base AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
    probes AS ({_cm_cells_sql('k')}),
    cells AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM probes GROUP BY 1, 2
    ),
    key_probes AS (
      SELECT DISTINCT d, bucket, user_id FROM probes
    ),
    est AS (
      SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS est
      FROM key_probes p LEFT JOIN cells c USING (d, bucket)
      GROUP BY 1
    ),
    truth AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY 1
    )
    SELECT e.user_id, e.est, tr.true_cnt,
           e.est - tr.true_cnt AS over_est
    FROM est e JOIN truth tr USING (user_id)
    """,
)
def q_countmin_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimation (operators/sketches.py):
    a depth-4 × width-32 sketch over event user_ids (width ≪ key
    cardinality, forcing real collisions), point-queried for every
    distinct user and joined to exact counts. over_est = est −
    true_cnt is provably ≥ 0 (one-sided error) — the driver
    hash-check certifies the estimates cell-for-cell. Sketch state
    is ≤ d·w cells however many keys stream through: the mergeable
    bounded-memory shape for 100 TB frequency monitoring."""
    from aws_datalake_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    ev = t(spark, sf_dir, "events")
    cms = countmin_table(ev, "user_id", depth=_CM_D, width=_CM_W)
    keys = ev.select("user_id").distinct()
    est = countmin_estimate(cms, keys, "user_id", depth=_CM_D, width=_CM_W)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    return est.join(truth, "user_id").select(
        "user_id", "est", "true_cnt",
        (F.col("est") - F.col("true_cnt")).alias("over_est"),
    )


# ---------------------------------------------------------------------------
# mergeable binned quantile sketch
# ---------------------------------------------------------------------------

_QB_LO, _QB_W, _QB_N = 0.0, 5000.0, 128


@query(
    "q_quantile_sketch",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority AS scope,
             LEAST(GREATEST(CAST(FLOOR((o_totalprice - {_QB_LO})
                                        / {_QB_W}) AS BIGINT), 0),
                   {_QB_N - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    hh AS (
      SELECT scope, bin, cnt FROM h
      UNION ALL
      SELECT 'ALL' AS scope, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM h GROUP BY 2
    ),
    c AS (
      SELECT scope, bin, cnt,
             SUM(cnt) OVER (PARTITION BY scope ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY scope) AS n
      FROM hh
    )
    SELECT scope, q,
           {_QB_LO} + CAST(MIN(bin) AS DOUBLE) * {_QB_W} AS est,
           CAST(MIN(n) AS BIGINT) AS n
    FROM c, (SELECT UNNEST([0.5::DOUBLE, 0.95::DOUBLE]) AS q)
    WHERE cum >= CEIL(q * CAST(n AS DOUBLE))
    GROUP BY scope, q
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile sketch (operators/sketches.py):
    per-priority histograms of o_totalprice (128 bins × 5000), plus
    the MERGED 'ALL' scope built by summing the per-group partials
    bin-wise — never re-scanning orders — then p50/p95 estimates
    read from each tiny histogram. One scan into bounded cells; the
    mergeable counterpart to the exact-quantile operator for
    continuous 100 TB profiling. Estimates are bin lower edges
    (error ≤ one bin width), identical double arithmetic in the
    oracle."""
    from aws_datalake_spark.operators.sketches import (
        binned_histogram,
        histogram_quantiles,
    )

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("scope"), "o_totalprice"
    )
    h = binned_histogram(o, "o_totalprice", _QB_LO, _QB_W, _QB_N, ["scope"])
    merged = h.groupBy("bin").agg(F.sum("cnt").alias("cnt")).select(
        F.lit("ALL").alias("scope"), "bin", "cnt"
    )
    hh = h.unionByName(merged)
    return histogram_quantiles(hh, [0.5, 0.95], _QB_LO, _QB_W, ["scope"])


# ---------------------------------------------------------------------------
# MOSS winnowing fingerprints
# ---------------------------------------------------------------------------

_WIN_K, _WIN_W = 3, 4


@query(
    "llm_winnow_fingerprints",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tz
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_filter(
               list_transform(tz, (x, i) ->
                 CASE WHEN i + {_WIN_K - 1} <= len(tz)
                      THEN {_H60.format(
                        expr="tz[i] || ' ' || tz[i+1] || ' ' || tz[i+2]")}
                 END),
               v -> v IS NOT NULL) AS hl
      FROM tk
    ),
    g AS (SELECT doc_id, hl, len(hl) AS ng FROM hs WHERE len(hl) >= 1),
    wins AS (
      SELECT doc_id,
             unnest(list_transform(hl, (x, i) ->
               CASE WHEN i <= GREATEST(ng - {_WIN_W - 1}, 1)
                    THEN list_aggregate(
                           list_slice(hl, i, i + {_WIN_W - 1}), 'min')
               END)) AS fp
      FROM g
    )
    SELECT DISTINCT doc_id, fp FROM wins WHERE fp IS NOT NULL
    """,
)
def llm_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing (operators/dedup.py:winnow_fingerprints;
    Schleimer et al., SIGMOD 2003): minimum gram-hash per sliding
    window of 4 consecutive 3-gram hashes — a deterministic ~1/w
    fingerprint selection guaranteeing any shared run of ≥ k+w−1
    tokens shares a fingerprint. Pure per-row array ops (no shuffle,
    no window sort); the only exchange is the final per-doc
    distinct over 8-byte hashes."""
    from aws_datalake_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        t(spark, sf_dir, "documents"), k=_WIN_K, w=_WIN_W
    )


# ---------------------------------------------------------------------------
# trigram-index substring search
# ---------------------------------------------------------------------------

_PATTERN = "merge batch"


@query(
    "q_trigram_substring_search",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE contains(text, '{_PATTERN}')
    """,
)
def q_trigram_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-substring (LIKE '%p%') search served by a character
    trigram inverted index (operators/text.py:trigram_postings /
    trigram_search): candidates must hold EVERY pattern trigram
    (in-list filter pushed to the postings scan + one counting
    aggregate), then contains() verifies candidates only. The oracle
    full-scans with contains(); the Spark path proves the
    index-pruned plan returns the identical doc set. At 100 TB the
    postings are built once (partitioned by trigram) and each query
    touches only its own trigrams' rows."""
    from aws_datalake_spark.operators.text import trigram_postings, trigram_search

    d = t(spark, sf_dir, "documents")
    postings = trigram_postings(d)
    return trigram_search(postings, d, _PATTERN).select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# exact fixed-point PageRank
# ---------------------------------------------------------------------------

_PR_ITERS, _PR_SCALE = 5, 10**12


def _pagerank_oracle() -> str:
    """Chained-CTE twin of the integer power iteration."""
    steps = []
    for i in range(_PR_ITERS):
        prev = "it0" if i == 0 else f"it{i}"
        steps.append(f"""
    it{i + 1} AS (
      SELECT n.node,
             (SELECT base FROM params)
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
             {_PR_SCALE} // COUNT(*) AS init
      FROM nodes
    ),
    it0 AS (
      SELECT node, CAST((SELECT init FROM params) AS BIGINT) AS rank
      FROM nodes
    ),{",".join(steps)}
    SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM it{_PR_ITERS}
    """


@query("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point PageRank (operators/graph.py) over the
    supplier→customer fulfillment graph (distinct edges from
    lineitem⋈orders): 5 power steps entirely in scaled-integer
    arithmetic — order-independent partial sums, integral divisions
    — so the ITERATIVE result hash-matches a 5-level chained-CTE
    oracle exactly (float PageRank can never be cross-engine
    exact). Each step is one src-key join + one dst-key aggregate
    (the Pregel pattern as DataFrame ops); lineage is cut per step.
    The only driver value is the node count (one bounded scalar)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point
    from aws_datalake_spark.queries._shared import render_sc_node, sc_edges_int

    # int64 node ids end-to-end (2·suppkey / 2·custkey+1): the edge
    # distinct and every power-step join/aggregate move longs; the
    # oracle's 'S…'/'C…' labels are rendered only in this readout
    # projection, so output is byte-identical to the string-keyed form
    ranks = pagerank_fixed_point(
        sc_edges_int(spark, sf_dir), iterations=_PR_ITERS, scale=_PR_SCALE
    )
    return ranks.select(
        render_sc_node(F.col("node")).alias("node"), "rank_scaled"
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------

_KMV_K = 128
_H60_SPACE = 1 << 60


@query(
    "q_kmv_distinct_docs",
    oracle=f"""
    WITH hd AS (
      SELECT DISTINCT source, {_H60.format(expr="'kmv' || text")} AS h
      FROM documents
    ),
    r AS (
      SELECT source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS pos
      FROM hd
    ),
    sk AS (SELECT source, h FROM r WHERE pos <= {_KMV_K}),
    per AS (
      SELECT source AS scope, CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(h) AS hk
      FROM sk GROUP BY 1
    ),
    m AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos
      FROM (SELECT DISTINCT h FROM sk)
    ),
    mall AS (
      SELECT 'ALL' AS scope, CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(h) AS hk
      FROM m WHERE pos <= {_KMV_K}
    ),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM mall),
    tru AS (
      SELECT source AS scope,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS true_distinct
      FROM documents GROUP BY 1
      UNION ALL
      SELECT 'ALL', CAST(COUNT(DISTINCT text) AS BIGINT) FROM documents
    )
    SELECT u.scope, u.n_kept,
           CASE WHEN u.n_kept < {_KMV_K} THEN u.n_kept
                ELSE CAST(({_KMV_K - 1}::HUGEINT * {_H60_SPACE}) // u.hk
                          AS BIGINT)
           END AS n_distinct_est,
           tru.true_distinct
    FROM u JOIN tru USING (scope)
    """,
)
def q_kmv_distinct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (operators/sketches.py:kmv_sketch /
    kmv_estimate): per-source unique-document estimates from the 128
    smallest text hashes, PLUS the 'ALL' scope estimated by MERGING
    the per-source sketches (k smallest of the sketch union — never
    re-scanning documents), joined to exact distinct counts. KMV is
    deterministic given the hash family, so unlike HLL the estimates
    hash-match the SQL oracle exactly. Bounded k-per-group state,
    two-phase top-k (no full distinct set ever sorts in one task)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.sketches import kmv_estimate, kmv_sketch

    d = t(spark, sf_dir, "documents").select("source", "text")
    sk = kmv_sketch(d, "text", k=_KMV_K, group_cols=["source"])
    per = kmv_estimate(sk, _KMV_K, ["source"]).select(
        F.col("source").alias("scope"), "n_kept", "n_distinct_est"
    )
    # frame bound: the UNION OF SKETCHES, <= n_sources * k rows (each
    # per-source sketch is already capped at k) — never the documents
    # table (r05 sweep)
    merged = (
        sk.select("h").distinct()
        .withColumn(
            "pos", F.row_number().over(Window.partitionBy().orderBy("h"))
        )
        .where(F.col("pos") <= _KMV_K)
    )
    mall = kmv_estimate(merged, _KMV_K).select(
        F.lit("ALL").alias("scope"), "n_kept", "n_distinct_est"
    )
    tru = (
        d.groupBy(F.col("source").alias("scope"))
        .agg(F.countDistinct("text").alias("true_distinct"))
        .unionByName(
            d.agg(F.countDistinct("text").alias("true_distinct"))
            .select(F.lit("ALL").alias("scope"), "true_distinct")
        )
    )
    return per.unionByName(mall).join(tru, "scope")


# ---------------------------------------------------------------------------
# source similarity via per-source minhash signatures
# ---------------------------------------------------------------------------

_SRCSIG_K = 16


def _srcsig_oracle() -> str:
    from aws_datalake_spark.operators.dedup import M31, affine_params

    h = _H60.format(expr="s")
    branches = []
    for k in range(_SRCSIG_K):
        a, b = affine_params(k)
        branches.append(
            f"SELECT source, {k} AS k,"
            f" MIN(({a} * h + {b}) % {M31}) AS sig FROM hh GROUP BY 1"
        )
    sigs = "\nUNION ALL\n".join(branches)
    return f"""
    WITH tk AS (
      SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tz
      FROM documents
    ),
    sh AS (
      SELECT source, unnest(list_transform(tz, (x, i) ->
               CASE WHEN i + 1 <= len(tz)
                    THEN tz[i] || ' ' || tz[i+1] END)) AS s
      FROM tk
    ),
    hh AS (
      SELECT source, ({h}) % {M31} AS h FROM sh WHERE s IS NOT NULL
    ),
    sigs AS ({sigs})
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)
                AS BIGINT) AS matches,
           {_SRCSIG_K} AS num_hashes,
           CAST(SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)
                AS DOUBLE) / {_SRCSIG_K}.0 AS jaccard_est
    FROM sigs a JOIN sigs b ON a.k = b.k AND a.source < b.source
    GROUP BY 1, 2
    """


@query("llm_source_similarity_sketch", oracle=_srcsig_oracle())
def llm_source_similarity_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-state source-similarity sketch
    (operators/dedup.py:source_signature_matrix): ONE 16-permutation
    minhash signature per source over its 2-gram shingle multiset
    (min is duplicate-insensitive, so a single map-combinable
    groupBy — no distinct pass at all), then pairwise Jaccard
    estimates from matching components. The bounded-state companion
    to llm_source_overlap for when even the distinct (source, gram)
    hash set is too large to move: K longs per source at any corpus
    size. Match counts are exact integers; the oracle shares the
    affine hash family bit-for-bit."""
    from aws_datalake_spark.operators.dedup import source_signature_matrix

    return source_signature_matrix(
        t(spark, sf_dir, "documents"), num_hashes=_SRCSIG_K, shingle_n=2
    )


# ---------------------------------------------------------------------------
# degree-oriented triangle counting (part co-order graph)
# ---------------------------------------------------------------------------

_TRI_MINSUP = 2


@query(
    "q_triangle_count",
    oracle=f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MINSUP}
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
           COALESCE(pn.triangles, 0) AS triangles
    FROM deg LEFT JOIN pn USING (node)
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-order graph (parts
    co-ordered >= 2 times share an edge), via degree-ordered
    orientation (operators/graph.py:triangle_counts) — every
    out-neighborhood is O(sqrt(m)), so the wedge join is m^1.5 TOTAL
    work with no hub-node hot reducer; three plain equi hash joins,
    no nested loop. min_support=2 is the standard co-occurrence
    sparsifier (drops single-co-occurrence noise edges and bounds
    triangle work). Exact integer counts — hash-checkable."""
    from aws_datalake_spark.operators.graph import (
        cooccurrence_edges,
        triangle_counts,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=_TRI_MINSUP
    )
    return triangle_counts(edges).select(
        F.col("node").alias("part"), "degree", "triangles"
    )


# ---------------------------------------------------------------------------
# sequential pattern mining: frequent event-type trigrams
# ---------------------------------------------------------------------------

_SEQ_MINSUP = 5


@query(
    "q_event_sequences",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             event_type AS step_1,
             LEAD(event_type, 1) OVER w AS step_2,
             LEAD(event_type, 2) OVER w AS step_3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT step_1, step_2, step_3,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS support,
           CAST(COUNT(*) AS BIGINT) AS occurrences
    FROM g WHERE step_3 IS NOT NULL
    GROUP BY 1, 2, 3
    HAVING COUNT(DISTINCT user_id) >= {_SEQ_MINSUP}
    """,
)
def q_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequential pattern mining
    (operators/sessions.py:sequence_ngrams): event-type trigrams
    over per-user (ts, event_id)-ordered streams, support = distinct
    users containing the pattern, occurrences = total overlapping
    matches. One per-user window exchange + one map-combinable
    aggregate over <= |types|^3 groups — never a per-user
    collect_list."""
    from aws_datalake_spark.operators.sessions import sequence_ngrams

    return sequence_ngrams(
        t(spark, sf_dir, "events"), n=3, min_support=_SEQ_MINSUP
    )


# ---------------------------------------------------------------------------
# exact-arithmetic Pearson correlation
# ---------------------------------------------------------------------------


@query(
    "q_correlation_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      -- sums stay HUGEINT (SUM of y*y overflows int64 at scale)
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM m GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                        * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS corr
    FROM s
    """,
)
def q_correlation_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verification-grade Pearson correlation
    (operators/stats.py:exact_corr) of quantity vs extended price
    (cents) per (returnflag, linestatus): the five moment sums
    accumulate as exact integers (order-independent — float-moment
    corr() is partition-order-dependent in its last ulps), combined
    in DECIMAL(38,0)/HUGEINT, with only correctly-rounded IEEE steps
    (cast, sqrt, divide) at the end — bit-identical across engines.
    One map-combinable aggregate; the single-shuffle groupBy shape at
    any scale."""
    from aws_datalake_spark.operators.stats import exact_corr

    li = t(spark, sf_dir, "lineitem")
    return exact_corr(
        li,
        F.col("l_quantity"),
        F.round(F.col("l_extendedprice") * 100, 0),
        by=["l_returnflag", "l_linestatus"],
    )


# ---------------------------------------------------------------------------
# weighted exact quantiles (token-mass length quantiles)
# ---------------------------------------------------------------------------

_WQ = ((1, 2), (9, 10))


@query(
    "llm_weighted_length_quantiles",
    oracle=f"""
    WITH w AS (
      SELECT n_chars AS v, CAST(n_chars AS BIGINT) AS wt FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    g AS (
      SELECT v, SUM(wt) AS ww FROM w GROUP BY 1
    ),
    c AS (
      SELECT v, SUM(ww) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(ww) OVER () AS total
      FROM g
    ),
    qs AS (SELECT * FROM (VALUES {', '.join(f'({n}, {d})' for n, d in _WQ)})
           AS t(q_num, q_den))
    SELECT q_num, q_den, MIN(v) AS value
    FROM c, qs
    WHERE cum >= CAST((total * q_num + q_den - 1) // q_den AS BIGINT)
    GROUP BY 1, 2
    """,
)
def llm_weighted_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-mass length quantiles
    (operators/order_stats.py:exact_weighted_quantile): the document
    length below which half (resp. 90%) of all corpus CHARACTERS
    live — the weighted analogue of the exact-quantile operator,
    with rational q and integer weights so the crossing threshold is
    exact. Histogram-narrowing scans (bounded aggregation state, no
    data shuffle) + a survivors-only finish; the curriculum/packing
    planner's 'where is the token mass' primitive at corpus scale."""
    from aws_datalake_spark.operators.order_stats import exact_weighted_quantile

    d = t(spark, sf_dir, "documents")
    rows = [
        (num, den, int(exact_weighted_quantile(
            d, "n_chars", "n_chars", num, den, direct_threshold=100,
        )))
        for num, den in _WQ
    ]
    return spark.createDataFrame(
        rows, "q_num int, q_den int, value bigint"
    )


# ---------------------------------------------------------------------------
# output-shard balance diagnostic: exact-rational Gini coefficient
# ---------------------------------------------------------------------------

_N_SHARDS = 32


@query(
    "q_shard_skew_gini",
    oracle=f"""
    WITH s AS (
      SELECT ({_H60.format(expr="CAST(doc_id AS VARCHAR)")}) % {_N_SHARDS}
               AS shard,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1
    ),
    r AS (
      SELECT bytes,
             ROW_NUMBER() OVER (ORDER BY bytes, shard) AS i,
             COUNT(*) OVER () AS n,
             SUM(bytes) OVER () AS tot
      FROM s
    )
    SELECT CAST(MIN(n) AS BIGINT) AS n_shards,
           CAST(MIN(tot) AS BIGINT) AS total_bytes,
           CAST(MIN(bytes) AS BIGINT) AS min_bytes,
           CAST(MAX(bytes) AS BIGINT) AS max_bytes,
           CAST(2 * SUM(i * bytes) - (MIN(n) + 1) * MIN(tot) AS DOUBLE)
             / (MIN(n) * MIN(tot)) AS gini
    FROM r
    """,
)
def q_shard_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard balance report: documents hashed into
    {N} shards, per-shard byte totals, and the Gini coefficient of
    the byte distribution — G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)
    over ascending shard sizes, all integer sums, final value a
    double quotient of exact integers. The straggler early-warning
    for any partitioned write: G near 0 = balanced shards, G near 1
    = one hot shard owns the bytes. SCALE: the ranked frame is
    |shards|-sized (the corpus aggregates to n_shards rows before
    any window), so the global window is over {N} rows however big
    the corpus.""".replace("{N}", str(_N_SHARDS))
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    from aws_datalake_spark.operators.text import hash60

    shards = d.groupBy(
        (hash60(F.col("doc_id").cast("string")) % _N_SHARDS).alias("shard")
    ).agg(F.sum("n_chars").cast("long").alias("bytes"))
    # frame bound: exactly _N_SHARDS rows (the per-shard byte totals)
    w = Window.orderBy("bytes", "shard")
    r = shards.select(
        "bytes",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("bytes").over(Window.partitionBy()).alias("tot"),
    )
    return r.agg(
        F.min("n").cast("long").alias("n_shards"),
        F.min("tot").cast("long").alias("total_bytes"),
        F.min("bytes").cast("long").alias("min_bytes"),
        F.max("bytes").cast("long").alias("max_bytes"),
        (
            (2 * F.sum(F.col("i") * F.col("bytes"))
             - (F.min("n") + 1) * F.min("tot")).cast("double")
            / (F.min("n") * F.min("tot"))
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# grouped weighted quantiles (char-mass median length per source)
# ---------------------------------------------------------------------------


@query(
    "llm_weighted_median_by_source",
    oracle="""
    WITH w AS (
      SELECT source, n_chars AS v, CAST(n_chars AS BIGINT) AS wt
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    g AS (SELECT source, v, SUM(wt) AS ww FROM w GROUP BY 1, 2),
    c AS (
      SELECT source, v,
             SUM(ww) OVER (PARTITION BY source ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(ww) OVER (PARTITION BY source) AS total
      FROM g
    )
    SELECT source, MIN(v) AS quantile
    FROM c
    WHERE cum >= CAST((total + 1) // 2 AS BIGINT)
    GROUP BY source
    """,
)
def llm_weighted_median_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-mass median length PER SOURCE
    (operators/order_stats.py:exact_weighted_quantile_by_group): for
    each source, the document length below which half of that
    source's characters live. All groups narrow together — one
    weight-histogram scan per round for every active source, finish
    over survivors only — so cost does not multiply by group count.
    The per-source companion to llm_weighted_length_quantiles."""
    from aws_datalake_spark.operators.order_stats import (
        exact_weighted_quantile_by_group,
    )

    d = t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    return exact_weighted_quantile_by_group(
        d, "source", "n_chars", "n_chars", 1, 2, direct_threshold=10
    )


# ---------------------------------------------------------------------------
# interval-overlap join: user sessions vs error-burst windows
# ---------------------------------------------------------------------------

_BURST_MIN = 3  # errors per hour that make an incident window


@query(
    "q_session_incident_overlap",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    lagged AS (
      SELECT *, LAG(es) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM e
    ),
    s AS (
      SELECT *, CAST(SUM(CASE WHEN prev IS NULL OR es - prev > {_GAP}
                         THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_seq
      FROM lagged
    ),
    sess AS (
      SELECT user_id, session_seq,
             MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM s GROUP BY 1, 2
    ),
    bursts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS burst_start,
             CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR
                  - INTERVAL 1 SECOND AS TIMESTAMP) AS burst_end,
             CAST(COUNT(*) AS BIGINT) AS n_errors
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2 HAVING COUNT(*) >= {_BURST_MIN}
    )
    SELECT sess.user_id, sess.session_seq,
           sess.session_start, sess.session_end,
           b.burst_start, b.n_errors
    FROM sess JOIN bursts b
      ON sess.session_start <= b.burst_end
     AND b.burst_start <= sess.session_end
    """,
)
def q_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join
    (operators/joins.py:bucketed_interval_overlap_join): which user
    sessions overlap an error-burst hour (>= 3 error events). Both
    interval sets explode into hour buckets and equi-join on the
    bucket; a pair survives only in the FIRST bucket the two
    intervals share, so no distinct() pass and no nested loop —
    a plain shuffled hash join at any scale. Sessions come from the
    oracle-certified gap sessionizer; bursts from one tumbling-hour
    aggregate."""
    from aws_datalake_spark.operators.joins import bucketed_interval_overlap_join
    from aws_datalake_spark.operators.sessions import sessionize

    ev = t(spark, sf_dir, "events")
    sess = (
        sessionize(ev, gap_seconds=_GAP)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    hour = F.date_trunc("hour", F.col("ts"))
    bursts = (
        ev.where(F.col("event_type") == "error")
        .groupBy(hour.alias("burst_start"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .where(F.col("n_errors") >= _BURST_MIN)
        .select(
            "burst_start",
            (F.col("burst_start") + F.expr("INTERVAL 1 HOUR")
             - F.expr("INTERVAL 1 SECOND")).alias("burst_end"),
            "n_errors",
        )
    )
    joined = bucketed_interval_overlap_join(
        sess, bursts,
        "session_start", "session_end", "burst_start", "burst_end",
        bucket_width_s=3600,
    )
    return joined.select(
        "user_id", "session_seq", "session_start", "session_end",
        "burst_start", "n_errors",
    )


# ---------------------------------------------------------------------------
# rolling distinct-day engagement (windowed count-distinct done right)
# ---------------------------------------------------------------------------


@query(
    "q_rolling_active_days",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(date_trunc('day', ts)) / 86400) AS BIGINT)
               AS day_idx
      FROM events
    )
    SELECT user_id, day_idx,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY day_idx
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS active_days_7d
    FROM d
    """,
)
def q_rolling_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active-day count per user-day — windowed
    COUNT DISTINCT done the scalable way: window functions cannot
    count distinct, so collapse to DISTINCT (user, day) FIRST (the
    frame is then a plain COUNT over a RANGE frame on the integer
    day index). The pre-distinct bounds the windowed table at
    |users| x |days| however many raw events arrive; one user_id
    exchange serves both the distinct and the window."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.floor(
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400
        ).alias("day_idx"),
    ).distinct()
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return d.select(
        "user_id",
        "day_idx",
        F.count(F.lit(1)).over(w).alias("active_days_7d"),
    )


# ---------------------------------------------------------------------------
# winnowing match stage (near-dup pairs on selected fingerprints)
# ---------------------------------------------------------------------------

_WM_MINSH, _WM_MAXDF = 2, 8


@query(
    "llm_winnow_matches",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || ' neardupmarker' AS text
      FROM documents WHERE doc_id < 60
    ),
    tk AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tz FROM c
    ),
    hs AS (
      SELECT doc_id,
             list_filter(
               list_transform(tz, (x, i) ->
                 CASE WHEN i + {_WIN_K - 1} <= len(tz)
                      THEN {_H60.format(
                        expr="tz[i] || ' ' || tz[i+1] || ' ' || tz[i+2]")}
                 END),
               v -> v IS NOT NULL) AS hl
      FROM tk
    ),
    g AS (SELECT doc_id, hl, len(hl) AS ng FROM hs WHERE len(hl) >= 1),
    wins AS (
      SELECT doc_id,
             unnest(list_transform(hl, (x, i) ->
               CASE WHEN i <= GREATEST(ng - {_WIN_W - 1}, 1)
                    THEN list_aggregate(
                           list_slice(hl, i, i + {_WIN_W - 1}), 'min')
               END)) AS fp
      FROM g
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE fp IS NOT NULL),
    freq AS (SELECT fp, COUNT(*) AS df FROM fps GROUP BY 1),
    rare AS (SELECT fps.doc_id, fps.fp FROM fps
             JOIN freq ON freq.fp = fps.fp AND freq.df <= {_WM_MAXDF})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= {_WM_MINSH}
    """,
)
def llm_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing MATCH stage (operators/dedup.py:winnow_matches) over
    the seeded near-dup corpus: pairs sharing >= 2 selected
    fingerprints, candidates restricted to fingerprints with df <= 8
    (min-selection skews fp frequency, so the hot-fp cap matters
    more than for raw grams; df<=8 keeps all 60 seeded pairs on this
    fixture while cutting candidates 6x — df<=4 loses 16). The
    fingerprint frame is materialized once. Seeded copies share nearly every
    fingerprint, so true pairs provably surface; exact shared counts
    hash-match the SQL twin."""
    from aws_datalake_spark.operators.dedup import winnow_matches
    from aws_datalake_spark.queries.llm_dedup import _neardup_corpus

    return winnow_matches(
        _neardup_corpus(spark, sf_dir),
        k=_WIN_K, w=_WIN_W, min_shared=_WM_MINSH, max_df=_WM_MAXDF,
    )


# ---------------------------------------------------------------------------
# data-quality: functional-dependency + referential-integrity reports
# ---------------------------------------------------------------------------


@query(
    "q_fd_violations",
    oracle="""
    WITH seeded AS (
      SELECT o_orderkey, o_orderstatus FROM orders
      UNION ALL
      SELECT o_orderkey, 'X' AS o_orderstatus FROM orders
      WHERE o_orderkey % 97 = 0 AND o_orderstatus <> 'X'
    )
    SELECT o_orderkey,
           CAST(COUNT(DISTINCT o_orderstatus)
                + MAX(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rhs_values,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM seeded GROUP BY 1
    HAVING COUNT(DISTINCT o_orderstatus)
           + MAX(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) > 1
    """,
)
def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency conformance report
    (operators/dq.py:fd_violations): o_orderkey → o_orderstatus holds
    in the base table, so the input is seeded with a conflicting
    status for every 97th key — exactly those keys must surface, with
    exact counts. One map-combinable aggregate; only violating keys
    leave the executors."""
    from aws_datalake_spark.operators.dq import fd_violations

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    seeded = o.unionByName(
        o.where(
            (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderstatus") != "X")
        ).select("o_orderkey", F.lit("X").alias("o_orderstatus"))
    )
    return fd_violations(seeded, ["o_orderkey"], "o_orderstatus")


@query(
    "q_ri_violations",
    oracle="""
    WITH child AS (
      SELECT l_orderkey FROM lineitem
      UNION ALL
      SELECT l_orderkey + 1000000000 AS l_orderkey FROM lineitem
      WHERE l_orderkey % 101 = 0
    ),
    keys AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_orphans
      FROM child WHERE l_orderkey IS NOT NULL GROUP BY 1
    )
    SELECT k.l_orderkey, k.n_orphans
    FROM keys k LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
      ON p.o_orderkey = k.l_orderkey
    WHERE p.o_orderkey IS NULL
    """,
)
def q_ri_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity orphan report
    (operators/dq.py:ri_violations): lineitem → orders holds at every
    SF, so the child is seeded with shifted keys (every 101st key
    + 1e9) — exactly those must surface as orphans. The child
    aggregates to distinct keys BEFORE the anti-join, so the probe is
    |keys|-sized however many child rows exist."""
    from aws_datalake_spark.operators.dq import ri_violations

    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    seeded = li.unionByName(
        li.where(F.col("l_orderkey") % 101 == 0).select(
            (F.col("l_orderkey") + 1000000000).alias("l_orderkey")
        )
    )
    return ri_violations(seeded, t(spark, sf_dir, "orders"), "l_orderkey", "o_orderkey")


# ---------------------------------------------------------------------------
# funnel conversion-time quantiles per cohort
# ---------------------------------------------------------------------------


@query(
    "q_conversion_time_quantiles",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY 1
    ),
    delays AS (
      SELECT fv.user_id,
             CAST(FLOOR(epoch(date_trunc('week', fv.first_view)) / 86400)
                  AS BIGINT) AS cohort_day,
             CAST(FLOOR(epoch(fp.first_purchase)) AS BIGINT)
               - CAST(FLOOR(epoch(fv.first_view)) AS BIGINT) AS delay_sec
      FROM fv JOIN fp ON fp.user_id = fv.user_id
    ),
    r AS (
      SELECT cohort_day, delay_sec,
             ROW_NUMBER() OVER (PARTITION BY cohort_day
                                ORDER BY delay_sec) AS rn,
             COUNT(*) OVER (PARTITION BY cohort_day) AS n
      FROM delays
    )
    SELECT cohort_day,
           CAST(MIN(n) AS BIGINT) AS n_converted,
           MAX(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
                    THEN delay_sec END) AS median_delay_sec,
           MAX(CASE WHEN rn = CAST(FLOOR(0.9 * (n - 1)) AS BIGINT) + 1
                    THEN delay_sec END) AS p90_delay_sec
    FROM r GROUP BY 1
    """,
)
def q_conversion_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion-delay distribution per first-view weekly
    cohort: first view → first subsequent purchase per user, then
    EXACT median and p90 of the integer-second delays via the
    histogram-narrowing by-group quantile operator
    (operators/order_stats.py:exact_quantile_by_group) — no global
    sort; first-touch events come from one min-aggregate per type,
    reusing the user_id partitioning."""
    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    ev = t(spark, sf_dir, "events")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    delays = fv.join(fp, "user_id").select(
        F.floor(
            F.unix_timestamp(F.date_trunc("week", F.col("first_view"))) / 86400
        ).alias("cohort_day"),
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).alias("delay_sec"),
    )
    # materialize the multi-join delay frame once: the quantile
    # narrowing and the count aggregate otherwise re-execute the
    # fv/fp join lineage per consuming pass; median and p90 share
    # one narrowing scan per round (exact_quantiles_by_group)
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.order_stats import (
        exact_quantiles_by_group,
    )

    delays = _truncate(delays)
    qt = exact_quantiles_by_group(
        delays, "cohort_day", "delay_sec", (0.5, 0.9), direct_threshold=1000
    )
    both = qt.groupBy("cohort_day").agg(
        F.max(F.when(F.col("__qi") == 0, F.col("quantile"))).alias(
            "median_delay_sec"
        ),
        F.max(F.when(F.col("__qi") == 1, F.col("quantile"))).alias(
            "p90_delay_sec"
        ),
    )
    n = delays.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_converted")
    )
    return n.join(both, "cohort_day").select(
        "cohort_day", "n_converted", "median_delay_sec", "p90_delay_sec"
    )


# ---------------------------------------------------------------------------
# one-pass correlation matrix over lineitem numerics
# ---------------------------------------------------------------------------


@query(
    "q_correlation_matrix",
    oracle="""
    WITH m AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(qty AS HUGEINT)) AS s_qty,
             SUM(CAST(price_c AS HUGEINT)) AS s_price,
             SUM(CAST(disc_c AS HUGEINT)) AS s_disc,
             SUM(CAST(tax_c AS HUGEINT)) AS s_tax,
             SUM(CAST(qty AS HUGEINT) * qty) AS q_qty,
             SUM(CAST(price_c AS HUGEINT) * price_c) AS q_price,
             SUM(CAST(disc_c AS HUGEINT) * disc_c) AS q_disc,
             SUM(CAST(tax_c AS HUGEINT) * tax_c) AS q_tax,
             SUM(CAST(qty AS HUGEINT) * price_c) AS x_qty_price,
             SUM(CAST(qty AS HUGEINT) * disc_c) AS x_qty_disc,
             SUM(CAST(qty AS HUGEINT) * tax_c) AS x_qty_tax,
             SUM(CAST(price_c AS HUGEINT) * disc_c) AS x_price_disc,
             SUM(CAST(price_c AS HUGEINT) * tax_c) AS x_price_tax,
             SUM(CAST(disc_c AS HUGEINT) * tax_c) AS x_disc_tax
      FROM m
    ),
    pairs AS (
      SELECT 'qty' AS col_x, 'price_c' AS col_y, n,
             x_qty_price AS sxy, s_qty AS sx, s_price AS sy,
             q_qty AS sxx, q_price AS syy FROM s
      UNION ALL SELECT 'qty', 'disc_c', n, x_qty_disc, s_qty, s_disc,
             q_qty, q_disc FROM s
      UNION ALL SELECT 'qty', 'tax_c', n, x_qty_tax, s_qty, s_tax,
             q_qty, q_tax FROM s
      UNION ALL SELECT 'price_c', 'disc_c', n, x_price_disc, s_price,
             s_disc, q_price, q_disc FROM s
      UNION ALL SELECT 'price_c', 'tax_c', n, x_price_tax, s_price,
             s_tax, q_price, q_tax FROM s
      UNION ALL SELECT 'disc_c', 'tax_c', n, x_disc_tax, s_disc, s_tax,
             q_disc, q_tax FROM s
    )
    SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                        * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS corr
    FROM pairs
    """,
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass pairwise correlation matrix
    (operators/stats.py:exact_corr_matrix) over four lineitem
    numerics (quantity + price/discount/tax in exact cents): every
    sum, square-sum, and cross-sum accumulates in a SINGLE
    map-combinable aggregate — one corpus scan for all 6 pairs — and
    the matrix rows explode from the one aggregate row. Pairs are
    emitted in declaration order on both sides."""
    from aws_datalake_spark.operators.stats import exact_corr_matrix

    li = t(spark, sf_dir, "lineitem")
    return exact_corr_matrix(
        li,
        {
            "qty": F.col("l_quantity"),
            "price_c": F.round(F.col("l_extendedprice") * 100, 0),
            "disc_c": F.round(F.col("l_discount") * 100, 0),
            "tax_c": F.round(F.col("l_tax") * 100, 0),
        },
    )


# ---------------------------------------------------------------------------
# winsorized (robust) mean per group at exact [p05, p95]
# ---------------------------------------------------------------------------


@query(
    "q_winsorized_mean",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    r AS (
      SELECT g, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM m
    ),
    qs AS (
      SELECT g,
             MAX(CASE WHEN rn = CAST(FLOOR(0.05 * (n - 1)) AS BIGINT) + 1
                      THEN v END) AS p05,
             MAX(CASE WHEN rn = CAST(FLOOR(0.95 * (n - 1)) AS BIGINT) + 1
                      THEN v END) AS p95
      FROM r GROUP BY g
    )
    SELECT m.g AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           qs.p05 AS p05_cents, qs.p95 AS p95_cents,
           CAST(SUM(LEAST(GREATEST(m.v, qs.p05), qs.p95)) AS DOUBLE)
             / COUNT(*) AS winsorized_mean_cents
    FROM m JOIN qs ON qs.g = m.g
    GROUP BY m.g, qs.p05, qs.p95
    """,
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) mean per returnflag: extended price in
    exact cents clipped at the group's EXACT p05/p95 (histogram-
    narrowing by-group quantiles, no global sort), then a plain
    integer-sum mean — the clipped sum is an exact integer, so the
    mean is a double quotient of exact integers. Two narrowing
    passes + one clip-aggregate scan; the broadcast quantile table
    is |groups|-sized."""
    from aws_datalake_spark.operators.order_stats import (
        exact_quantiles_by_group,
    )

    li = t(spark, sf_dir, "lineitem")
    m = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    # p05 and p95 share one narrowing scan per round instead of two
    # independent narrowing passes over the same frame
    qt = exact_quantiles_by_group(m, "g", "v", (0.05, 0.95),
                                  direct_threshold=20000)
    qs = F.broadcast(
        qt.groupBy("g").agg(
            F.max(F.when(F.col("__qi") == 0, F.col("quantile"))).alias("p05"),
            F.max(F.when(F.col("__qi") == 1, F.col("quantile"))).alias("p95"),
        )
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95"))
    return (
        m.join(qs, "g")
        .groupBy(F.col("g").alias("l_returnflag"), "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(clipped).cast("double") / F.count(F.lit(1))).alias(
                "winsorized_mean_cents"
            ),
        )
        .select(
            "l_returnflag", "n",
            F.col("p05").alias("p05_cents"), F.col("p95").alias("p95_cents"),
            "winsorized_mean_cents",
        )
    )


# ---------------------------------------------------------------------------
# 2-D skyline: best-value parts (max size, min price)
# ---------------------------------------------------------------------------


@query(
    "q_skyline_parts",
    oracle="""
    WITH m AS (
      SELECT p_partkey, p_size,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
      FROM part
    )
    SELECT a.p_partkey, CAST(a.p_size AS BIGINT) AS p_size, a.price_c
    FROM m a
    WHERE NOT EXISTS (
      SELECT 1 FROM m b
      WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
        AND (b.p_size > a.p_size OR b.price_c < a.price_c)
    )
    """,
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (operators/skyline.py:skyline_2d, Börzsönyi et al.
    ICDE 2001 semantics): parts Pareto-optimal on (size high, price
    low). The operator buckets by size, kills cross-bucket dominance
    with one B-row suffix-max broadcast, and finishes each bucket
    with two partitioned windows — no quadratic NOT-EXISTS anywhere
    (the oracle states the naive definition; the plan never runs
    it). Price is negated cents so both axes maximize."""
    from aws_datalake_spark.operators.skyline import skyline_2d

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_c"),
    )
    return skyline_2d(p, F.col("p_size"), -F.col("price_c")).select(
        "p_partkey", "p_size", "price_c"
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance (fraud/synthetic-data smell test)
# ---------------------------------------------------------------------------

# log10(1 + 1/d), d = 1..9, rounded to 12 places — shared LITERALS on
# both engines (no runtime log)
_BENFORD = [
    0.301029995664, 0.176091259056, 0.124938736608, 0.096910013008,
    0.079181246048, 0.066946789631, 0.057991946978, 0.051152522447,
    0.045757490561,
]


@query(
    "q_benford_digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COUNT(*)) OVER () AS total
      FROM d GROUP BY 1
    ),
    exp AS (
      SELECT * FROM (VALUES
        {', '.join(f'({i + 1}, {v!r})' for i, v in enumerate(_BENFORD))})
        AS t(digit, expected_frac)
    )
    SELECT c.digit, c.n,
           CAST(c.n AS DOUBLE) / CAST(c.total AS BIGINT) AS observed_frac,
           CAST(exp.expected_frac AS DOUBLE) AS expected_frac,
           CAST(c.n AS DOUBLE) / CAST(c.total AS BIGINT)
             - CAST(exp.expected_frac AS DOUBLE) AS deviation
    FROM c JOIN exp USING (digit)
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance of order totals — the classic
    fraud / synthetic-data smell test: observed first-digit fractions
    (exact-integer quotients) against the log10(1+1/d) expectation
    shipped as shared literals (no runtime transcendental, so both
    engines agree bit-for-bit). First digit comes from the
    integer-cents string, which formats identically everywhere. One
    map-combinable aggregate into 9 cells."""
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
    ).cast("long")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    c = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy())
    exp = F.broadcast(
        o.sparkSession.createDataFrame(
            [(i + 1, v) for i, v in enumerate(_BENFORD)],
            "digit long, expected_frac double",
        )
    )
    obs = F.col("n").cast("double") / F.col("total")
    return (
        c.withColumn("total", total)
        .join(exp, "digit")
        .select(
            "digit", "n", obs.alias("observed_frac"), "expected_frac",
            (obs - F.col("expected_frac")).alias("deviation"),
        )
    )
