"""Round-10 batch: the retrieval-eval completion (nDCG@k), the
perceptual-hash media near-dup (VERDICT r09 items 3-4), and the
robust/diagnostic statistics + ops-analytics families.

House rules (queries/_shared.py): exact integer/decimal accumulation
for anything hash-compared; float folds in PINNED order via the
ordered-list reduce; libm-free math (shared literal tables computed
once in Python and injected into BOTH engines — the Benford device);
quotients left unrounded (one correctly-rounded IEEE op).

DuckDB literal gotcha (found building pHash): a bare decimal LIST
literal (`[0.1, 0.2, ...]`) is unified to ONE DECIMAL(p,s) type and
silently 1-ulp-rounds elements needing more scale — e-notation
(`1.0e-1`) parses each element as DOUBLE directly. Every shared
float table below is emitted in e-notation on the oracle side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query


# ---------------------------------------------------------------------------
# nDCG@10 retrieval eval (VERDICT r09 item 3) — completes the
# recall / MRR / MAP / nDCG eval family on the shared cosine top-k
# ---------------------------------------------------------------------------

_NDCG_K = 10
# binary gains: DCG is a sum of 1/log2(r+1) literals over the rank
# domain — computed ONCE here, shipped to both engines verbatim, so
# no libm log enters either plan (the Benford-table device)
_NDCG_GAIN = [1.0 / math.log2(r + 1) for r in range(1, _NDCG_K + 1)]
# ideal DCG prefix sums, strict left fold (python float = IEEE double)
_NDCG_IDEAL: list[float] = []
_acc = 0.0
for _g in _NDCG_GAIN:
    _acc += _g
    _NDCG_IDEAL.append(_acc)


def _lit_arr(vals: list[float]) -> str:
    """DuckDB DOUBLE[] literal in e-notation (see module docstring)."""
    return "[" + ", ".join(f"{v:.17e}" for v in vals) + "]"


def _ndcg_oracle() -> str:
    from aws_datalake_spark.queries.r09_batch import _ev_ranked_sql

    garr = _lit_arr(_NDCG_GAIN)
    parr = _lit_arr(_NDCG_IDEAL)
    return f"""
    WITH {_ev_ranked_sql()},
    flagged AS (
      SELECT qid, tlabel, rk,
             CASE WHEN nlabel = tlabel THEN 1 ELSE 0 END AS rel
      FROM top
    ),
    dcg AS (
      SELECT qid, tlabel,
             list_reduce(list(CASE WHEN rel = 1 THEN
                                ({garr})[CAST(rk AS INT)]
                              ELSE 0.0 END ORDER BY rk),
                         (p, q) -> p + q) AS dcg
      FROM flagged GROUP BY 1, 2
    ),
    rlab AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS r FROM c GROUP BY 1
    ),
    scored AS (
      SELECT dcg.qid, dcg.tlabel,
             dcg.dcg / ({parr})[CAST(LEAST(rlab.r, {_NDCG_K}) AS INT)]
               AS ndcg
      FROM dcg JOIN rlab ON dcg.tlabel = rlab.label
    )
    SELECT tlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
           list_reduce(list(ndcg ORDER BY qid), (p, q) -> p + q)
             / CAST(COUNT(*) AS DOUBLE) AS ndcg10
    FROM scored GROUP BY 1
    """


@query("llm_ndcg_eval", oracle=_ndcg_oracle())
def llm_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per label over the embedding space
    (operators/similarity.py:cosine_topk): the graded-position
    ranking eval that completes the recall/MRR/MAP triple — DCG
    discounts each relevant hit by 1/log2(rank+1), normalized by the
    best achievable ordering (min(R, k) relevant on top). Binary
    gains make DCG a pinned-order fold of SHARED literal gains (no
    libm log in either plan); IDCG is a literal prefix-sum lookup;
    one divide per query, per-label mean folds in pinned query
    order. Reference: aws_datalake eval notebooks compute MRR/MAP
    only; nDCG added as the standard third metric."""
    from aws_datalake_spark.operators.similarity import cosine_topk
    from aws_datalake_spark.queries.llm_similarity import _emb_double
    from aws_datalake_spark.queries.r09_batch import _EV_NQ

    e = _emb_double(spark, sf_dir)
    queries_df = e.where(F.col("vec_id") < _EV_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("tlabel"),
        "embedding",
    )
    corpus = e.where(F.col("vec_id") >= _EV_NQ)
    topk = cosine_topk(
        corpus, queries_df.select("query_id", "embedding"), k=_NDCG_K
    )
    garr = F.array(*[F.lit(v) for v in _NDCG_GAIN])
    parr = F.array(*[F.lit(v) for v in _NDCG_IDEAL])
    flagged = (
        topk.join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .join(queries_df.select("query_id", "tlabel"), "query_id")
        .select(
            "query_id",
            "tlabel",
            "rank",
            (F.col("nlabel") == F.col("tlabel")).cast("int").alias("rel"),
        )
    )
    term = F.when(
        F.col("rel") == 1, F.element_at(garr, F.col("rank").cast("int"))
    ).otherwise(F.lit(0.0))
    dcg = (
        flagged.select("query_id", "tlabel", "rank", term.alias("g"))
        .groupBy("query_id", "tlabel")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "g"))),
                    lambda st: st["g"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dcg")
        )
    )
    rlab = corpus.groupBy(F.col("label").alias("tlabel")).agg(
        F.count(F.lit(1)).alias("r")
    )
    idcg = F.element_at(
        parr, F.least(F.col("r"), F.lit(_NDCG_K)).cast("int")
    )
    scored = dcg.join(F.broadcast(rlab), "tlabel").select(
        "query_id", "tlabel", (F.col("dcg") / idcg).alias("ndcg")
    )
    return (
        scored.groupBy("tlabel")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("query_id", "ndcg"))
                        ),
                        lambda st: st["ndcg"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("ndcg10"),
        )
        .select(F.col("tlabel").alias("label"), "n_queries", "ndcg10")
    )


# ---------------------------------------------------------------------------
# pHash media near-dup (VERDICT r09 item 4)
# ---------------------------------------------------------------------------

_PH_MAX_HAMMING = 3


def _phash_oracle() -> str:
    from aws_datalake_spark.operators.multimodal import phash63_duckdb_cte

    cte = phash63_duckdb_cte(
        "SELECT doc_id AS asset_id, hex(encode(text)) AS h "
        "FROM documents WHERE doc_id % 3 = 0 AND len(text) > 0"
    )
    return f"""
    WITH {cte},
    sl AS (
      SELECT asset_id, ph, CAST(r.i AS INT) AS slice_id,
             (ph >> CAST(r.i * 16 AS INT)) & 65535 AS slice_val
      FROM phash, range(0, 4) r(i)
    ),
    pairs AS (
      SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
             CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
      FROM sl a
      JOIN sl b ON a.slice_id = b.slice_id
               AND a.slice_val = b.slice_val
               AND a.asset_id < b.asset_id
    )
    SELECT asset_a, asset_b, hamming
    FROM pairs WHERE hamming <= {_PH_MAX_HAMMING}
    """


@query("llm_media_phash_neardup", oracle=_phash_oracle())
def llm_media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-payload near-duplicates by perceptual hash
    (operators/multimodal.py:with_phash63 + phash_neardup_pairs):
    an 8×8 strided byte-grid → separable orthonormal DCT-II (shared
    literal basis) → 63 AC bits vs the median coefficient → 4×16-bit
    banded self-join → hamming ≤ 3. The DCT/threshold/banding
    pipeline is the real production shape — only the byte sampler
    stands in for pixel decode (swap in PIL grayscale-resize(8,8)
    and nothing downstream moves). Media bytes never shuffle: the
    hash is a scan-side JVM expression and only (id, 63-bit long)
    pairs reach the band join. Detection at hamming ≤ 3 is EXACT by
    pigeonhole over the 4 slices."""
    from aws_datalake_spark.operators.multimodal import (
        make_media_table,
        phash_neardup_pairs,
        with_phash63,
    )

    docs = t(spark, sf_dir, "documents").where(F.length("text") > 0)
    media = make_media_table(docs).where(F.col("media_type") == "image")
    hashed = with_phash63(media, "payload", "ph").select("asset_id", "ph")
    return phash_neardup_pairs(
        hashed, max_hamming=_PH_MAX_HAMMING
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (weekly revenue)
# ---------------------------------------------------------------------------


@query(
    "q_theil_sen",
    oracle="""
    WITH wk AS (
      SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
                  AS BIGINT) AS w,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
      FROM orders GROUP BY 1
    ),
    pr AS (
      SELECT CAST(b.v - a.v AS DOUBLE) / CAST(b.w - a.w AS DOUBLE)
               AS slope
      FROM wk a JOIN wk b ON a.w < b.w
    ),
    rk AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             COUNT(*) OVER () AS np
      FROM pr
    )
    SELECT CAST((SELECT COUNT(*) FROM wk) AS BIGINT) AS n_weeks,
           CAST(np AS BIGINT) AS n_pairs, slope AS theil_sen_slope
    FROM rk WHERE rn = (np - 1) // 2 + 1
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of weekly order revenue: the LOWER
    MEDIAN of all pairwise slopes — the outlier-immune answer to
    q_regression_trend's OLS slope (breakdown point 29%). Each slope
    is ONE correctly-rounded divide of exact integer cents over an
    exact week gap, so the sorted order — and therefore the selected
    median element — is bit-identical cross-engine.

    SCALE: the pair set is CALENDAR-bounded (weeks², ~61k pairs for
    a 7-year lake) regardless of corpus rows — the one weekly
    aggregate collapses 100 TB to the week domain first; the
    selection window sorts only that bounded set."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.floor(
            F.unix_date(F.col("o_orderdate").cast("date")) / F.lit(7)
        ).cast("long").alias("w")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("v")
    )
    a, b = wk.alias("a"), wk.alias("b")
    pr = a.join(b, F.col("a.w") < F.col("b.w")).select(
        (
            (F.col("b.v") - F.col("a.v")).cast("double")
            / (F.col("b.w") - F.col("a.w")).cast("double")
        ).alias("slope")
    )
    w_all = Window.orderBy("slope")
    rk = pr.select(
        "slope",
        F.row_number().over(w_all).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("np"),
    ).where(F.col("rn") == F.floor((F.col("np") - 1) / F.lit(2)) + 1)
    nw = wk.agg(F.count(F.lit(1)).alias("n_weeks"))
    return rk.crossJoin(F.broadcast(nw)).select(
        F.col("n_weeks").cast("long"),
        F.col("np").cast("long").alias("n_pairs"),
        F.col("slope").alias("theil_sen_slope"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta effect size (ordinal, rank-based)
# ---------------------------------------------------------------------------


@query(
    "q_cliffs_delta",
    oracle="""
    WITH xa AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
    ),
    xr AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ),
    dom AS (
      SELECT v FROM xa UNION SELECT v FROM xr
    ),
    cum AS (
      SELECT dom.v, COALESCE(xr.c, 0) AS c,
             COALESCE(SUM(COALESCE(xr.c, 0)) OVER (ORDER BY dom.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(COALESCE(xr.c, 0)) OVER ()
               - SUM(COALESCE(xr.c, 0)) OVER (ORDER BY dom.v
                   ROWS UNBOUNDED PRECEDING) AS above
      FROM dom LEFT JOIN xr ON dom.v = xr.v
    ),
    terms AS (
      SELECT CAST(SUM(xa.c * cum.below) AS BIGINT) AS gt,
             CAST(SUM(xa.c * cum.above) AS BIGINT) AS lt
      FROM xa JOIN cum ON xa.v = cum.v
    ),
    ns AS (
      SELECT (SELECT SUM(c) FROM xa) AS na, (SELECT SUM(c) FROM xr) AS nr
    )
    SELECT CAST(ns.na AS BIGINT) AS n_a, CAST(ns.nr AS BIGINT) AS n_r,
           terms.gt, terms.lt,
           CAST(terms.gt - terms.lt AS DOUBLE)
             / CAST(ns.na * ns.nr AS DOUBLE) AS cliffs_delta
    FROM terms, ns
    """,
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between returned ('A') and refused
    ('R') line quantities: δ = (#(x>y) − #(x<y)) / (n_a·n_r) — the
    ordinal, distribution-free companion to q_cohens_d (how often
    does one group exceed the other, ignoring magnitudes). The
    quadratic pair count collapses to the BOUNDED quantity domain
    (50 distinct values): per-value counts × cumulative counts give
    exact integer gt/lt tallies; one divide. The cumulative table is
    built over the UNION of both groups' value domains so values
    present only in one group still see the correct
    below/above-count (left join, zero-filled)."""
    li = t(spark, sf_dir, "lineitem")
    xa = (
        li.where(F.col("l_returnflag") == "A")
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    xr = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    dom = xa.select("v").union(xr.select("v")).distinct()
    wv = Window.orderBy("v")
    joined = dom.join(xr, "v", "left").select(
        "v", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    cum = joined.select(
        "v",
        F.coalesce(
            F.sum("c").over(
                wv.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below"),
        (
            F.sum("c").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.sum("c").over(
                wv.rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("above"),
    )
    terms = xa.join(cum, "v").agg(
        F.sum(F.col("c") * F.col("below")).cast("long").alias("gt"),
        F.sum(F.col("c") * F.col("above")).cast("long").alias("lt"),
    )
    ns = xa.agg(F.sum("c").alias("na")).crossJoin(
        xr.agg(F.sum("c").alias("nr"))
    )
    return terms.crossJoin(F.broadcast(ns)).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nr").cast("long").alias("n_r"),
        "gt",
        "lt",
        (
            (F.col("gt") - F.col("lt")).cast("double")
            / (F.col("na") * F.col("nr")).cast("double")
        ).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# Grubbs max-outlier statistic per segment
# ---------------------------------------------------------------------------


@query(
    "q_grubbs_outlier",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
      FROM customer
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q,
             CAST(MIN(x) AS BIGINT) AS mn, CAST(MAX(x) AS BIGINT) AS mx
      FROM v GROUP BY 1
    )
    SELECT g AS segment, n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
           CASE WHEN n > 1 AND
                     (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE))
                       / CAST(n - 1 AS DOUBLE) > 0.0
                THEN GREATEST(
                       CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                         - CAST(mn AS DOUBLE),
                       CAST(mx AS DOUBLE)
                         - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                     / SQRT((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE))
                        / CAST(n - 1 AS DOUBLE))
           END AS grubbs_g
    FROM per_g
    """,
)
def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max-studentized-deviation statistic per customer
    segment on balance cents: G = max(x̄−min, max−x̄)/s — "does this
    segment contain at least one extreme outlier" (compare against
    the Grubbs critical value for n). The extreme deviation needs
    only MIN/MAX (not a per-row scan against the mean), so the whole
    test is one grouped aggregate of exact integer moments and a
    fixed mirrored IEEE tree (÷, √ only — both correctly rounded)."""
    from aws_datalake_spark.operators.stats import _dec

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    )
    per_g = c.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x"))).alias("s"),
        F.sum(_dec(F.col("x")) * _dec(F.col("x"))).alias("q"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n_d
    var = (
        F.col("q").cast("double") - mean * F.col("s").cast("double")
    ) / (F.col("n") - 1).cast("double")
    g_stat = F.greatest(
        mean - F.col("mn").cast("double"),
        F.col("mx").cast("double") - mean,
    ) / F.sqrt(var)
    return per_g.select(
        F.col("g").alias("segment"),
        F.col("n").cast("long").alias("n"),
        mean.alias("mean_cents"),
        F.when((F.col("n") > 1) & (var > 0.0), g_stat).alias("grubbs_g"),
    )


# ---------------------------------------------------------------------------
# Mood's median test (k-sample, rank-free counting)
# ---------------------------------------------------------------------------


@query(
    "q_mood_median",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x
      FROM lineitem
    ),
    vc AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1),
    med AS (
      SELECT x AS m FROM (
        SELECT x, SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                 AS cum,
               SUM(c) OVER () AS n
        FROM vc
      ) WHERE cum >= (n - 1) // 2 + 1
      ORDER BY x LIMIT 1
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN x > (SELECT m FROM med)
                      THEN 1 ELSE 0 END) AS BIGINT) AS ab
      FROM v GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(ab) AS BIGINT) AS ta
      FROM per_g
    ),
    terms AS (
      SELECT per_g.g, per_g.n, per_g.ab,
             CAST(per_g.n AS DOUBLE) * CAST(tot.ta AS DOUBLE)
               / CAST(tot.nn AS DOUBLE) AS ea,
             CAST(per_g.n AS DOUBLE)
               * CAST(tot.nn - tot.ta AS DOUBLE)
               / CAST(tot.nn AS DOUBLE) AS eb
      FROM per_g, tot
    ),
    chi AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list(
               (CAST(ab AS DOUBLE) - ea) * (CAST(ab AS DOUBLE) - ea) / ea
               + (CAST(n - ab AS DOUBLE) - eb)
                 * (CAST(n - ab AS DOUBLE) - eb) / eb
               ORDER BY g), (p, q) -> p + q) AS chi2
      FROM terms WHERE ea > 0.0 AND eb > 0.0
    )
    SELECT chi.k, tot.nn AS n, CAST((SELECT m FROM med) AS BIGINT)
             AS pooled_median, chi.chi2
    FROM chi, tot
    """,
)
def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the three return flags on quantity:
    are the group MEDIANS equal — counts above/below the pooled
    lower-median feed a k×2 chi-square. The robust, outlier-immune
    sibling of q_anova_f (means) and q_kruskal_wallis (ranks); the
    pooled median is an exact selection over the BOUNDED quantity
    domain (50 values), the contingency counts are exact integers,
    and the χ² terms fold in pinned group order."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    vc = v.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    wx = Window.orderBy("x")
    med = (
        vc.select(
            "x",
            F.sum("c").over(
                wx.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
            F.sum("c").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        .where(
            F.col("cum") >= F.floor((F.col("n") - 1) / F.lit(2)) + 1
        )
        .orderBy("x")
        .limit(1)
        .select(F.col("x").alias("m"))
    )
    per_g = (
        v.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("x") > F.col("m")).cast("long")).alias("ab"),
        )
    )
    tot = per_g.agg(
        F.sum("n").alias("nn"), F.sum("ab").alias("ta")
    )
    terms = per_g.crossJoin(F.broadcast(tot)).select(
        "g",
        "n",
        "ab",
        "nn",
        (
            F.col("n").cast("double")
            * F.col("ta").cast("double")
            / F.col("nn").cast("double")
        ).alias("ea"),
        (
            F.col("n").cast("double")
            * (F.col("nn") - F.col("ta")).cast("double")
            / F.col("nn").cast("double")
        ).alias("eb"),
    )
    term = (F.col("ab").cast("double") - F.col("ea")) * (
        F.col("ab").cast("double") - F.col("ea")
    ) / F.col("ea") + (
        (F.col("n") - F.col("ab")).cast("double") - F.col("eb")
    ) * (
        (F.col("n") - F.col("ab")).cast("double") - F.col("eb")
    ) / F.col("eb")
    chi = (
        terms.where((F.col("ea") > 0.0) & (F.col("eb") > 0.0))
        .select("g", term.alias("t"))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("g", "t"))),
                    lambda st: st["t"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("chi2"),
        )
    )
    return (
        chi.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .select(
            "k",
            F.col("nn").cast("long").alias("n"),
            F.col("m").cast("long").alias("pooled_median"),
            "chi2",
        )
    )


# ---------------------------------------------------------------------------
# Atkinson inequality index (ε = 1/2) per nation
# ---------------------------------------------------------------------------


@query(
    "q_atkinson_index",
    oracle="""
    WITH per_u AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS u,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS v
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(v AS HUGEINT)) AS BIGINT) AS tot,
             list_reduce(list(SQRT(CAST(v AS DOUBLE)) ORDER BY u),
                         (p, q) -> p + q) AS ssq
      FROM per_u GROUP BY 1
    )
    SELECT n.n_name, agg.k AS n_suppliers,
           CASE WHEN agg.tot > 0 THEN
             1.0 - (agg.ssq / CAST(agg.k AS DOUBLE))
                   * (agg.ssq / CAST(agg.k AS DOUBLE))
                   / (CAST(agg.tot AS DOUBLE) / CAST(agg.k AS DOUBLE))
           END AS atkinson_half
    FROM agg JOIN nation n ON agg.nk = n.n_nationkey
    """,
)
def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (ε=½) of supplier revenue per
    nation: A = 1 − (mean√x)²/mean(x) — the welfare-theoretic
    inequality measure beside q_hhi_concentration (market power) and
    q_lorenz_curve (the plot). ε=½ keeps the generalized mean a
    SQRT (IEEE correctly-rounded in both engines — no libm pow/ln):
    per-supplier √revenue folds in pinned supplier order; totals are
    exact integers; the final expression is one mirrored tree."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    per_u = (
        li.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("s_nationkey").alias("nk"),
            F.col("l_suppkey").alias("u"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("v")
        )
    )
    agg = per_u.groupBy("nk").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("v").alias("tot"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "u", F.sqrt(F.col("v").cast("double")).alias("sq")
                        )
                    )
                ),
                lambda st: st["sq"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("ssq"),
    )
    mean_sq = F.col("ssq") / F.col("k").cast("double")
    mean_x = F.col("tot").cast("double") / F.col("k").cast("double")
    return agg.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        agg.nk == F.col("n_nationkey"),
    ).select(
        "n_name",
        F.col("k").alias("n_suppliers"),
        F.when(
            F.col("tot") > 0,
            F.lit(1.0) - mean_sq * mean_sq / mean_x,
        ).alias("atkinson_half"),
    )


# ---------------------------------------------------------------------------
# ACF at lags 1..7 + Yule–Walker AR(2) on the daily revenue series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_DAILY_SQL = """
    daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    )"""


def _acf_oracle(max_lag: int) -> str:
    lag_cols = ", ".join(
        f"LAG(v, {k}) OVER (ORDER BY i) AS l{k}"
        for k in range(1, max_lag + 1)
    )
    per_k = "\n      UNION ALL\n".join(
        f"""      SELECT {k} AS lag, CAST(COUNT(l{k}) AS BIGINT) AS cnt,
             SUM(CAST(l{k} AS HUGEINT) * v) AS sxy,
             SUM(CASE WHEN l{k} IS NOT NULL
                 THEN CAST(v AS HUGEINT) END) AS st,
             SUM(CAST(l{k} AS HUGEINT)) AS sh
      FROM lagd"""
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH {_DAILY_SQL},
    lagd AS (SELECT v, {lag_cols} FROM idx),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS s,
             SUM(CAST(v AS HUGEINT) * v) AS q
      FROM idx
    ),
    per_k AS (
{per_k}
    )
    SELECT per_k.lag AS lag, per_k.cnt AS n_pairs,
           CASE WHEN CAST(base.q AS DOUBLE)
                     - (CAST(base.s AS DOUBLE) / CAST(base.n AS DOUBLE))
                       * CAST(base.s AS DOUBLE) > 0.0
                     AND per_k.cnt >= 2 THEN
             (CAST(per_k.sxy AS DOUBLE)
              - (CAST(base.s AS DOUBLE) / CAST(base.n AS DOUBLE))
                * (CAST(per_k.sh AS DOUBLE) + CAST(per_k.st AS DOUBLE))
              + CAST(per_k.cnt AS DOUBLE)
                * (CAST(base.s AS DOUBLE) / CAST(base.n AS DOUBLE))
                * (CAST(base.s AS DOUBLE) / CAST(base.n AS DOUBLE)))
             / (CAST(base.q AS DOUBLE)
                - (CAST(base.s AS DOUBLE) / CAST(base.n AS DOUBLE))
                  * CAST(base.s AS DOUBLE))
           END AS acf
    FROM per_k, base
    """


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("v")
    )
    return daily.select(
        "d", "v", F.row_number().over(Window.orderBy("d")).alias("i")
    )


def _acf_frame(
    spark: SparkSession, sf_dir: str, max_lag: int
) -> DataFrame:
    """(lag, n_pairs, acf) for lags 1..max_lag — shared by
    q_acf_lags and q_yule_walker_ar2."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.stats import _dec

    idx = _daily_series(spark, sf_dir)
    wi = Window.orderBy("i")
    lagd = idx.select(
        "v",
        *[
            F.lag("v", k).over(wi).alias(f"l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("v"))).alias("s"),
        F.sum(_dec(F.col("v")) * _dec(F.col("v"))).alias("q"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"l{k}")
        aggs += [
            F.count(lk).alias(f"cnt{k}"),
            F.sum(_dec(lk) * _dec(F.col("v"))).alias(f"sxy{k}"),
            F.sum(F.when(lk.isNotNull(), _dec(F.col("v")))).alias(
                f"st{k}"
            ),
            F.sum(_dec(lk)).alias(f"sh{k}"),
        ]
    a = lagd.agg(*aggs)
    xbar = F.col("s").cast("double") / F.col("n").cast("double")
    den = F.col("q").cast("double") - xbar * F.col("s").cast("double")
    rows = []
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"sxy{k}").cast("double")
            - xbar
            * (
                F.col(f"sh{k}").cast("double")
                + F.col(f"st{k}").cast("double")
            )
            + F.col(f"cnt{k}").cast("double") * xbar * xbar
        )
        rows.append(
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.col(f"cnt{k}").cast("long").alias("n_pairs"),
                F.when(
                    (den > 0.0) & (F.col(f"cnt{k}") >= 2), num / den
                ).alias("acf"),
            )
        )
    return a.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.lag", "r.n_pairs", "r.acf"
    )


@query("q_acf_lags", oracle=_acf_oracle(_ACF_MAX_LAG))
def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily order revenue at lags 1..7:
    the weekly-seasonality / persistence diagnostic that generalizes
    q_autocorr's single lag (read: is there a 7-day echo?). Each
    r_k expands algebraically into EXACT integer sums
    (Σx_t·x_{t+k}, head/tail sums, full-series moments in
    DECIMAL/HUGEINT) and one fixed mirrored IEEE tree — no per-row
    float folds at all.

    SCALE: one daily aggregate collapses the corpus; the lag window
    runs over the CALENDAR-bounded series (~2400 rows), and all 7
    lags ride a single window pass + single aggregate."""
    return _acf_frame(spark, sf_dir, _ACF_MAX_LAG)


@query(
    "q_yule_walker_ar2",
    oracle=f"""
    WITH acf AS ({_acf_oracle(2)})
    SELECT mx.n_pairs, r1.acf AS r1, r2.acf AS r2,
           CASE WHEN r1.acf IS NOT NULL AND r2.acf IS NOT NULL
                     AND 1.0 - r1.acf * r1.acf <> 0.0 THEN
             r1.acf * (1.0 - r2.acf) / (1.0 - r1.acf * r1.acf)
           END AS phi1,
           CASE WHEN r1.acf IS NOT NULL AND r2.acf IS NOT NULL
                     AND 1.0 - r1.acf * r1.acf <> 0.0 THEN
             (r2.acf - r1.acf * r1.acf) / (1.0 - r1.acf * r1.acf)
           END AS phi2
    FROM (SELECT acf FROM acf WHERE lag = 1) r1,
         (SELECT acf FROM acf WHERE lag = 2) r2,
         (SELECT MAX(n_pairs) AS n_pairs FROM acf) mx
    """,
)
def q_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule–Walker AR(2) fit of daily revenue from the exact ACF:
    φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) — the closed-form
    autoregression behind q_acf_lags ("how much does today load on
    yesterday vs the day before, holding the other fixed"). The r's
    are the bit-identical ACF values, so the φ's are one mirrored
    IEEE tree over them."""
    acf = _acf_frame(spark, sf_dir, 2)
    r1 = acf.where(F.col("lag") == 1).select(
        F.col("acf").alias("r1")
    )
    r2 = acf.where(F.col("lag") == 2).select(
        F.col("acf").alias("r2")
    )
    mx = acf.agg(F.max("n_pairs").alias("n_pairs"))
    j = mx.crossJoin(F.broadcast(r1)).crossJoin(F.broadcast(r2))
    ok = (
        F.col("r1").isNotNull()
        & F.col("r2").isNotNull()
        & (F.lit(1.0) - F.col("r1") * F.col("r1") != 0.0)
    )
    return j.select(
        "n_pairs",
        "r1",
        "r2",
        F.when(
            ok,
            F.col("r1")
            * (F.lit(1.0) - F.col("r2"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1")),
        ).alias("phi1"),
        F.when(
            ok,
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1")),
        ).alias("phi2"),
    )


# ---------------------------------------------------------------------------
# Regression diagnostics on the daily series: Cook's distance +
# Breusch–Pagan heteroskedasticity
# ---------------------------------------------------------------------------

_OLS_SQL = f"""
    {_DAILY_SQL},
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(i AS HUGEINT)) AS si,
             SUM(CAST(i AS HUGEINT) * i) AS sii,
             SUM(CAST(v AS HUGEINT)) AS sv,
             SUM(CAST(i AS HUGEINT) * v) AS siv
      FROM idx
    ),
    fit AS (
      SELECT n,
             CAST(si AS DOUBLE) / CAST(n AS DOUBLE) AS ibar,
             CAST(sii AS DOUBLE)
               - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(si AS DOUBLE) AS sxx,
             (CAST(siv AS DOUBLE)
               - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(sv AS DOUBLE))
             / (CAST(sii AS DOUBLE)
               - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(si AS DOUBLE)) AS b,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
               - ((CAST(siv AS DOUBLE)
                   - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
                     * CAST(sv AS DOUBLE))
                  / (CAST(sii AS DOUBLE)
                     - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
                       * CAST(si AS DOUBLE)))
                 * (CAST(si AS DOUBLE) / CAST(n AS DOUBLE)) AS a
      FROM base
    ),
    resid AS (
      SELECT idx.d, idx.i, idx.v, fit.n, fit.ibar, fit.sxx,
             CAST(idx.v AS DOUBLE)
               - (fit.a + fit.b * CAST(idx.i AS DOUBLE)) AS e,
             1.0 / CAST(fit.n AS DOUBLE)
               + (CAST(idx.i AS DOUBLE) - fit.ibar)
                 * (CAST(idx.i AS DOUBLE) - fit.ibar) / fit.sxx AS h
      FROM idx, fit
    )"""


@query(
    "q_cooks_distance",
    oracle=f"""
    WITH {_OLS_SQL},
    sse AS (
      SELECT MIN(n) AS n,
             list_reduce(list(e * e ORDER BY i), (p, q) -> p + q)
               AS sse
      FROM resid
    ),
    scored AS (
      SELECT resid.d, resid.v, resid.e, resid.h,
             (resid.e * resid.e
              / (2.0 * (sse.sse / CAST(sse.n - 2 AS DOUBLE))))
             * (resid.h / ((1.0 - resid.h) * (1.0 - resid.h)))
               AS cooks_d
      FROM resid, sse
    )
    SELECT d AS day, CAST(v AS BIGINT) AS revenue_cents, e AS residual,
           h AS leverage, cooks_d
    FROM scored
    ORDER BY cooks_d DESC, d ASC LIMIT 10
    """,
)
def q_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most influential days in the revenue-vs-time OLS by
    Cook's distance: D_i = e_i²/(p·s²) · h_i/(1−h_i)² — "which days
    single-handedly bend the trend line" (the influence diagnostic
    beside q_regression_trend's fit and q_mad_outliers' values-only
    view). Simple-regression leverage is closed-form (h_i = 1/n +
    (i−ī)²/Sxx from exact integer sums); residuals are one mirrored
    tree per row; SSE folds in pinned day order.

    SCALE: the corpus collapses to the calendar-bounded daily series
    before any per-row float work; the top-10 selection sorts only
    that bounded set."""
    from aws_datalake_spark.operators.stats import _dec

    idx = _daily_series(spark, sf_dir)
    base = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("i"))).alias("si"),
        F.sum(_dec(F.col("i")) * _dec(F.col("i"))).alias("sii"),
        F.sum(_dec(F.col("v"))).alias("sv"),
        F.sum(_dec(F.col("i")) * _dec(F.col("v"))).alias("siv"),
    )
    ibar = F.col("si").cast("double") / F.col("n").cast("double")
    sxx = F.col("sii").cast("double") - ibar * F.col("si").cast("double")
    b = (
        F.col("siv").cast("double") - ibar * F.col("sv").cast("double")
    ) / sxx
    a = F.col("sv").cast("double") / F.col("n").cast("double") - b * ibar
    fit = base.select(
        "n", ibar.alias("ibar"), sxx.alias("sxx"), b.alias("b"),
        a.alias("a"),
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "d",
        "i",
        "v",
        "n",
        (
            F.col("v").cast("double")
            - (F.col("a") + F.col("b") * F.col("i").cast("double"))
        ).alias("e"),
        (
            F.lit(1.0) / F.col("n").cast("double")
            + (F.col("i").cast("double") - F.col("ibar"))
            * (F.col("i").cast("double") - F.col("ibar"))
            / F.col("sxx")
        ).alias("h"),
    )
    sse = resid.agg(
        F.min("n").alias("n"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("i", (F.col("e") * F.col("e")).alias("ee"))
                    )
                ),
                lambda st: st["ee"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sse"),
    )
    scored = resid.crossJoin(F.broadcast(sse.select("sse", F.col("n").alias("__n")))).select(
        "d",
        "v",
        "e",
        "h",
        (
            F.col("e")
            * F.col("e")
            / (
                F.lit(2.0)
                * (
                    F.col("sse")
                    / (F.col("__n") - 2).cast("double")
                )
            )
            * (
                F.col("h")
                / ((F.lit(1.0) - F.col("h")) * (F.lit(1.0) - F.col("h")))
            )
        ).alias("cooks_d"),
    )
    return (
        scored.orderBy(F.desc("cooks_d"), F.asc("d"))
        .limit(10)
        .select(
            F.col("d").alias("day"),
            F.col("v").cast("long").alias("revenue_cents"),
            F.col("e").alias("residual"),
            F.col("h").alias("leverage"),
            "cooks_d",
        )
    )


@query(
    "q_breusch_pagan",
    oracle=f"""
    WITH {_OLS_SQL},
    folds AS (
      SELECT MIN(n) AS n, MIN(ibar) AS ibar, MIN(sxx) AS sxx,
             list_reduce(list(e * e ORDER BY i), (p, q) -> p + q)
               AS su,
             list_reduce(list(e * e * e * e ORDER BY i),
                         (p, q) -> p + q) AS suu,
             list_reduce(list(CAST(i AS DOUBLE) * (e * e) ORDER BY i),
                         (p, q) -> p + q) AS siu
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN sxx > 0.0 AND
                     suu - (su / CAST(n AS DOUBLE)) * su > 0.0 THEN
             CAST(n AS DOUBLE)
             * ((siu - ibar * su) * (siu - ibar * su))
             / (sxx * (suu - (su / CAST(n AS DOUBLE)) * su))
           END AS bp_stat
    FROM folds
    """,
)
def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroskedasticity test on the daily-revenue
    OLS: regress squared residuals on the day index; BP = n·R² —
    "is the variance drifting over time" (the precondition check
    for trusting q_regression_trend's standard errors; pairs with
    q_durbin_watson's autocorrelation check). Residuals are the
    bit-identical OLS tree; Σu, Σu², Σi·u fold in pinned day order;
    BP is one mirrored tree (auxiliary R² in closed form —
    Σ(i−ī)u = Σiu − ī·Σu needs no second pass)."""
    idx = _daily_series(spark, sf_dir)
    from aws_datalake_spark.operators.stats import _dec

    base = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("i"))).alias("si"),
        F.sum(_dec(F.col("i")) * _dec(F.col("i"))).alias("sii"),
        F.sum(_dec(F.col("v"))).alias("sv"),
        F.sum(_dec(F.col("i")) * _dec(F.col("v"))).alias("siv"),
    )
    ibar = F.col("si").cast("double") / F.col("n").cast("double")
    sxx = F.col("sii").cast("double") - ibar * F.col("si").cast("double")
    b = (
        F.col("siv").cast("double") - ibar * F.col("sv").cast("double")
    ) / sxx
    a = F.col("sv").cast("double") / F.col("n").cast("double") - b * ibar
    fit = base.select(
        "n", ibar.alias("ibar"), sxx.alias("sxx"), b.alias("b"),
        a.alias("a"),
    )
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "i",
        "n",
        "ibar",
        "sxx",
        (
            F.col("v").cast("double")
            - (F.col("a") + F.col("b") * F.col("i").cast("double"))
        ).alias("e"),
    )
    def _fold(expr, alias):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", expr.alias("t")))),
                lambda st: st["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(alias)

    e = F.col("e")
    folds = resid.agg(
        F.min("n").alias("n"),
        F.min("ibar").alias("ibar"),
        F.min("sxx").alias("sxx"),
        _fold(e * e, "su"),
        _fold(e * e * e * e, "suu"),
        _fold(F.col("i").cast("double") * (e * e), "siu"),
    )
    n_d = F.col("n").cast("double")
    siu_c = F.col("siu") - F.col("ibar") * F.col("su")
    suu_c = F.col("suu") - (F.col("su") / n_d) * F.col("su")
    return folds.select(
        F.col("n").cast("long").alias("n"),
        F.when(
            (F.col("sxx") > 0.0) & (suu_c > 0.0),
            n_d * (siu_c * siu_c) / (F.col("sxx") * suu_c),
        ).alias("bp_stat"),
    )


# ---------------------------------------------------------------------------
# Adamic–Adar link prediction (shared 1/ln(deg) literal table)
# ---------------------------------------------------------------------------

_AA_K = 50
_AA_MAXDEG = 1000


def _aa_oracle() -> str:
    from aws_datalake_spark.queries.r09_batch import _BFS_EDGE_SQL

    wvals = ", ".join(
        f"({d}, {1.0 / math.log(d):.17e})"
        for d in range(2, _AA_MAXDEG + 1)
    )
    return f"""
    WITH e AS ({_BFS_EDGE_SQL}),
    wt(deg, w) AS (SELECT * FROM (VALUES {wvals})),
    bi AS (
      SELECT s AS node, d AS nbr FROM e
      UNION ALL SELECT d, s FROM e
    ),
    dg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY 1
    ),
    mid AS (
      SELECT bi.node, bi.nbr, wt.w
      FROM bi JOIN dg USING (node) JOIN wt USING (deg)
      WHERE dg.deg <= {_AA_MAXDEG}
    ),
    wed AS (
      SELECT a.nbr AS u, b.nbr AS v, a.node AS m, a.w AS term
      FROM mid a JOIN mid b ON a.node = b.node AND a.nbr < b.nbr
    ),
    cand AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
             list_reduce(list(term ORDER BY m), (p, q) -> p + q) AS aa
      FROM wed GROUP BY 1, 2
    ),
    nonadj AS (
      SELECT cand.u, cand.v, cand.cn, cand.aa
      FROM cand LEFT JOIN e ON cand.u = e.s AND cand.v = e.d
      WHERE e.s IS NULL
    ),
    pruned AS (
      SELECT u, v, cn, aa FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                                     ORDER BY aa DESC, v) AS pk
        FROM nonadj
      ) WHERE pk <= {_AA_K}
    ),
    ranked AS (
      SELECT u, v, cn, aa,
             ROW_NUMBER() OVER (ORDER BY aa DESC, u, v) AS rk
      FROM pruned
    )
    SELECT u, v, cn, aa FROM ranked WHERE rk <= {_AA_K}
    """


@query("q_graph_adamic_adar", oracle=_aa_oracle())
def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the part co-order graph
    (operators/graph.py:adamic_adar_candidates): common neighbors
    weighted 1/ln(degree) — the log-damped middle ground between raw
    counts (q_graph_common_neighbors) and the aggressive 1/deg
    (q_graph_resource_allocation); the trio is the standard
    neighborhood-based link-prediction benchmark set. libm-free:
    1/ln(d) comes from a SHARED literal table over the bounded
    degree domain (broadcast dim on the engine, VALUES list in the
    twin); AA folds in pinned middle order."""
    from aws_datalake_spark.operators.graph import (
        adamic_adar_candidates,
        cooccurrence_edges,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return adamic_adar_candidates(
        edges.select("s", "d"), k=_AA_K, max_degree=_AA_MAXDEG
    )


# ---------------------------------------------------------------------------
# SPC: Individuals/Moving-Range control limits on daily revenue
# ---------------------------------------------------------------------------

# 3/d2(2): the I-MR chart constant (d2 for subgroup size 2), shipped
# as one shared literal so neither engine computes it
_IMR_C = 3.0 / 1.128


@query(
    "q_spc_imr_chart",
    oracle=f"""
    WITH {_DAILY_SQL},
    mr AS (
      SELECT i, v,
             ABS(v - LAG(v) OVER (ORDER BY i)) AS m
      FROM idx
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(m) AS BIGINT) AS sm,
             CAST(COUNT(m) AS BIGINT) AS nm
      FROM mr
    ),
    lim AS (
      SELECT n,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
             CAST(sm AS DOUBLE) / CAST(nm AS DOUBLE) AS mrbar,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
               + {_IMR_C:.17e} * (CAST(sm AS DOUBLE)
                                  / CAST(nm AS DOUBLE)) AS ucl,
             CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
               - {_IMR_C:.17e} * (CAST(sm AS DOUBLE)
                                  / CAST(nm AS DOUBLE)) AS lcl
      FROM st WHERE nm > 0
    )
    SELECT lim.n, lim.xbar, lim.mrbar, lim.ucl, lim.lcl,
           CAST((SELECT COUNT(*) FROM mr, lim
                 WHERE CAST(mr.v AS DOUBLE) > lim.ucl
                    OR CAST(mr.v AS DOUBLE) < lim.lcl) AS BIGINT)
             AS n_out_of_control
    FROM lim
    """,
)
def q_spc_imr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart Individuals/Moving-Range control limits on daily
    revenue: center x̄, average moving range, UCL/LCL = x̄ ±
    (3/d₂)·MR̄, and the count of out-of-control days — the
    process-monitoring view beside q_cusum_changepoint's
    change-detection (SPC answers "is today ABNORMAL", CUSUM "did
    the level SHIFT"). Moving ranges are exact integer |Δcents|;
    the d₂ constant is one shared literal; limits are one mirrored
    tree and the violation count is exact."""
    from pyspark.sql import Window

    idx = _daily_series(spark, sf_dir)
    mr = idx.select(
        "i",
        "v",
        F.abs(
            F.col("v") - F.lag("v").over(Window.orderBy("i"))
        ).alias("m"),
    )
    st = mr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum("m").alias("sm"),
        F.count("m").alias("nm"),
    )
    xbar = F.col("sv").cast("double") / F.col("n").cast("double")
    mrbar = F.col("sm").cast("double") / F.col("nm").cast("double")
    lim = st.where(F.col("nm") > 0).select(
        F.col("n").cast("long").alias("n"),
        xbar.alias("xbar"),
        mrbar.alias("mrbar"),
        (xbar + F.lit(_IMR_C) * mrbar).alias("ucl"),
        (xbar - F.lit(_IMR_C) * mrbar).alias("lcl"),
    )
    out = (
        mr.crossJoin(F.broadcast(lim))
        .where(
            (F.col("v").cast("double") > F.col("ucl"))
            | (F.col("v").cast("double") < F.col("lcl"))
        )
        .agg(F.count(F.lit(1)).alias("n_out_of_control"))
    )
    return lim.crossJoin(F.broadcast(out)).select(
        "n", "xbar", "mrbar", "ucl", "lcl", "n_out_of_control"
    )


# ---------------------------------------------------------------------------
# Process capability (Cp / Cpk) of line quantity vs spec limits
# ---------------------------------------------------------------------------

_CPK_LSL = 1.0
_CPK_USL = 50.0


@query(
    "q_process_capability",
    oracle=f"""
    WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM v
    )
    SELECT n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           SQRT((CAST(q AS DOUBLE)
                 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * CAST(s AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
             AS sd,
           CASE WHEN n > 1 THEN
             ({_CPK_USL!r} - {_CPK_LSL!r})
             / (6.0 * SQRT((CAST(q AS DOUBLE)
                 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * CAST(s AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))
           END AS cp,
           CASE WHEN n > 1 THEN
             LEAST({_CPK_USL!r} - CAST(s AS DOUBLE) / CAST(n AS DOUBLE),
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - {_CPK_LSL!r})
             / (3.0 * SQRT((CAST(q AS DOUBLE)
                 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * CAST(s AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))
           END AS cpk
    FROM st
    """,
)
def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability of line quantity against spec limits
    [1, 50]: Cp = (USL−LSL)/6σ and Cpk = min(USL−μ, μ−LSL)/3σ — the
    manufacturing-style "is the process centered and tight enough"
    summary that pairs with q_spc_imr_chart's stability check (SPC
    first, capability second is the textbook order). Exact integer
    moments; ÷ and √ only."""
    from aws_datalake_spark.operators.stats import _dec

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x")
    )
    st = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x"))).alias("s"),
        F.sum(_dec(F.col("x")) * _dec(F.col("x"))).alias("q"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n_d
    sd = F.sqrt(
        (F.col("q").cast("double") - mean * F.col("s").cast("double"))
        / (F.col("n") - 1).cast("double")
    )
    return st.select(
        F.col("n").cast("long").alias("n"),
        mean.alias("mean"),
        sd.alias("sd"),
        F.when(
            F.col("n") > 1,
            F.lit(_CPK_USL - _CPK_LSL) / (F.lit(6.0) * sd),
        ).alias("cp"),
        F.when(
            F.col("n") > 1,
            F.least(F.lit(_CPK_USL) - mean, mean - F.lit(_CPK_LSL))
            / (F.lit(3.0) * sd),
        ).alias("cpk"),
    )


# ---------------------------------------------------------------------------
# Arc (midpoint) price elasticity per brand, consecutive years
# ---------------------------------------------------------------------------


@query(
    "q_arc_elasticity",
    oracle="""
    WITH by_y AS (
      SELECT p.p_brand AS brand,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS y,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.brand, a.y AS y1, b.y AS y2,
             a.qty AS q1, b.qty AS q2, a.rev AS r1, b.rev AS r2
      FROM by_y a JOIN by_y b
        ON a.brand = b.brand AND b.y = a.y + 1
    )
    SELECT brand, y1, y2,
           CASE WHEN (q2 + q1) > 0 AND
                     (CAST(r2 AS HUGEINT) * q1
                      - CAST(r1 AS HUGEINT) * q2) <> 0 THEN
             (CAST(q2 - q1 AS DOUBLE)
              * CAST(CAST(r2 AS HUGEINT) * q1
                     + CAST(r1 AS HUGEINT) * q2 AS DOUBLE))
             / (CAST(q2 + q1 AS DOUBLE)
                * CAST(CAST(r2 AS HUGEINT) * q1
                       - CAST(r1 AS HUGEINT) * q2 AS DOUBLE))
           END AS arc_elasticity
    FROM pairs
    """,
)
def q_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc (midpoint) price elasticity of demand per brand across
    consecutive ship years: %Δq/%Δp with midpoint bases, which
    algebraically reduces to (q₂−q₁)(r₂q₁+r₁q₂) /
    ((q₂+q₁)(r₂q₁−r₁q₂)) over exact integer quantity and revenue
    totals — elasticity without ever materializing a unit price, so
    NO log and NO intermediate rational (the pitfall of the log-log
    form). One divide per (brand, year-pair); the part dim
    broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    by_y = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year(F.col("l_shipdate").cast("date"))
            .cast("long")
            .alias("y"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("rev"),
        )
    )
    a, b = by_y.alias("a"), by_y.alias("b")
    pairs = a.join(
        b,
        (F.col("a.brand") == F.col("b.brand"))
        & (F.col("b.y") == F.col("a.y") + 1),
    ).select(
        F.col("a.brand").alias("brand"),
        F.col("a.y").alias("y1"),
        F.col("b.y").alias("y2"),
        F.col("a.qty").alias("q1"),
        F.col("b.qty").alias("q2"),
        F.col("a.rev").cast("decimal(38,0)").alias("r1"),
        F.col("b.rev").cast("decimal(38,0)").alias("r2"),
    )
    cross_sum = (
        F.col("r2") * F.col("q1") + F.col("r1") * F.col("q2")
    ).cast("double")
    cross_diff = (
        F.col("r2") * F.col("q1") - F.col("r1") * F.col("q2")
    )
    ok = ((F.col("q2") + F.col("q1")) > 0) & (cross_diff != 0)
    return pairs.select(
        "brand",
        "y1",
        "y2",
        F.when(
            ok,
            (
                (F.col("q2") - F.col("q1")).cast("double") * cross_sum
            )
            / (
                (F.col("q2") + F.col("q1")).cast("double")
                * cross_diff.cast("double")
            ),
        ).alias("arc_elasticity"),
    )


# ---------------------------------------------------------------------------
# Exact trimmed mean per segment (pairs with q_winsorized_mean)
# ---------------------------------------------------------------------------


@query(
    "q_trimmed_mean",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
             c_custkey AS k
      FROM customer
    ),
    rk AS (
      SELECT g, x,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, k) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM v
    )
    SELECT g AS segment, CAST(MIN(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS trimmed_mean_cents
    FROM rk
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY g
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of balance cents per segment: drop
    the bottom and top ⌊n/10⌋ by rank, average the middle — the
    companion to q_winsorized_mean (winsorize CLAMPS the tails,
    trimming EXCLUDES them; comparing the two bounds tail
    influence). Rank trim is an exact selection (ties broken by
    custkey, though equal values are interchangeable for the sum);
    kept-set sum and count are exact integers; one divide.

    SCALE: the rank window is PARTITIONED by segment — no global
    sort; at 1000 executors each segment sorts independently."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
        F.col("c_custkey").alias("k"),
    )
    wg = Window.partitionBy("g").orderBy("x", "k")
    rk = c.select(
        "g",
        "x",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    trim = F.floor(F.col("n") / F.lit(10))
    return (
        rk.where((F.col("rn") > trim) & (F.col("rn") <= F.col("n") - trim))
        .groupBy("g")
        .agg(
            F.min("n").cast("long").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            (
                F.sum("x").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("trimmed_mean_cents"),
        )
        .select(
            F.col("g").alias("segment"),
            "n_total",
            "n_kept",
            "trimmed_mean_cents",
        )
    )


# ---------------------------------------------------------------------------
# Streaming batch-twins: windowed top-N + watermark-window dedup
# ---------------------------------------------------------------------------


@query(
    "st_top_n_per_window",
    oracle="""
    WITH wc AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
               ORDER BY n_events DESC, event_type) AS rn
      FROM wc
    )
    SELECT window_start, event_type, n_events,
           CAST(rn AS BIGINT) AS rank
    FROM rk WHERE rn <= 3
    """,
)
def st_top_n_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — top-3 event types per 1-hour tumbling window by count
    (ties break by type): the rolling leaderboard every ops
    dashboard runs. As a stream this is the tumbling-window agg +
    per-window rank pattern (rank applied on the complete window at
    watermark close — Structured Streaming emits the finalized
    window in append mode; the batch twin is value-identical).
    Counts exact; the rank window is PARTITIONED by window start —
    parallel across windows."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    wc = ev.groupBy(
        F.window("ts", "1 hour").alias("w"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wc = wc.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )
    rk = wc.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.desc("n_events"), F.asc("event_type")
            )
        ),
    )
    return rk.where(F.col("rank") <= 3).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("rank").cast("long").alias("rank"),
    )


@query(
    "st_dedup_late_events",
    oracle="""
    WITH keyed AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             user_id, event_type, ts, event_id
    FROM events
    ),
    first_seen AS (
      SELECT window_start, user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY window_start, user_id,
                                event_type ORDER BY ts, event_id) AS rn
      FROM keyed
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM first_seen GROUP BY 1
    """,
)
def st_dedup_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — per-window dedup accounting: within each 1-hour window,
    keep the FIRST (ts, event_id) occurrence of each (user, type)
    key and count retained vs dropped — the batch twin of
    ``dropDuplicates`` within a watermark (the at-least-once
    ingestion repair every streaming pipeline runs; state is bounded
    by keys-per-window exactly as the watermark bounds streaming
    state). Deterministic tiebreak on event_id; exact counts; the
    dedup window is PARTITIONED by (window, user, type)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    keyed = ev.select(
        F.window("ts", "1 hour").alias("w"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    ).select(
        F.col("w.start").alias("window_start"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    rn = F.row_number().over(
        Window.partitionBy("window_start", "user_id", "event_type")
        .orderBy("ts", "event_id")
    )
    flagged = keyed.select("window_start", rn.alias("rn"))
    return flagged.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_retained"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Unicode script-mix profile per source (text-analysis family)
# ---------------------------------------------------------------------------


@query(
    "llm_script_mix",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(text) AS total,
             len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))
               AS alpha,
             len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
               AS digit,
             len(text) - len(regexp_replace(text, '[ \\t\\n\\r]', '', 'g'))
               AS ws,
             len(text) - len(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
               AS nonascii
      FROM documents WHERE len(text) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(total) AS BIGINT) AS n_chars,
           CAST(SUM(alpha) AS DOUBLE) / CAST(SUM(total) AS DOUBLE)
             AS alpha_ratio,
           CAST(SUM(digit) AS DOUBLE) / CAST(SUM(total) AS DOUBLE)
             AS digit_ratio,
           CAST(SUM(ws) AS DOUBLE) / CAST(SUM(total) AS DOUBLE)
             AS ws_ratio,
           CAST(SUM(nonascii) AS DOUBLE) / CAST(SUM(total) AS DOUBLE)
             AS nonascii_ratio,
           CAST(SUM(CASE WHEN nonascii * 20 > total
                         AND (total - nonascii) * 20 > total
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed_script
    FROM per_doc GROUP BY source
    """,
)
def llm_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class profile: alpha / digit /
    whitespace / non-ASCII ratios plus a mixed-script doc count
    (both ASCII and non-ASCII above 5% — the mojibake / wrong-
    language-tag tripwire that complements llm_lang_id's
    whole-doc verdict). Counts via length-difference after
    regexp_replace (identical char semantics in both engines — no
    regexp_count dialect risk); corpus-level ratios are exact-count
    divides, NOT means of per-doc ratios, so the aggregation
    collapses map-side with no per-doc float folds."""
    docs = t(spark, sf_dir, "documents").where(F.length("text") > 0)

    def n_matches(pat: str):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pat, "")
        )

    per_doc = docs.select(
        "source",
        F.length("text").alias("total"),
        n_matches("[A-Za-z]").alias("alpha"),
        n_matches("[0-9]").alias("digit"),
        n_matches("[ \\t\\n\\r]").alias("ws"),
        n_matches("[^\\x00-\\x7F]").alias("nonascii"),
    )
    mixed = (
        (F.col("nonascii") * 20 > F.col("total"))
        & ((F.col("total") - F.col("nonascii")) * 20 > F.col("total"))
    ).cast("long")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("total").alias("n_chars"),
        (
            F.sum("alpha").cast("double")
            / F.sum("total").cast("double")
        ).alias("alpha_ratio"),
        (
            F.sum("digit").cast("double")
            / F.sum("total").cast("double")
        ).alias("digit_ratio"),
        (
            F.sum("ws").cast("double") / F.sum("total").cast("double")
        ).alias("ws_ratio"),
        (
            F.sum("nonascii").cast("double")
            / F.sum("total").cast("double")
        ).alias("nonascii_ratio"),
        F.sum(mixed).alias("n_mixed_script"),
    )


# ---------------------------------------------------------------------------
# Benford chi-square GOF (statistic over the existing literal table)
# ---------------------------------------------------------------------------


def _benford_chi2_oracle() -> str:
    from aws_datalake_spark.queries.round6 import _BENFORD

    vals = ", ".join(
        f"({i + 1}, {v!r})" for i, v in enumerate(_BENFORD)
    )
    return f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    exp AS (SELECT * FROM (VALUES {vals}) AS t(digit, p)),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    terms AS (
      SELECT exp.digit,
             COALESCE(c.n, 0) AS n,
             CAST(tot.total AS DOUBLE) * CAST(exp.p AS DOUBLE) AS e
      FROM exp LEFT JOIN c USING (digit), tot
    )
    SELECT CAST((SELECT total FROM tot) AS BIGINT) AS n,
           list_reduce(list(
             (CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e) / e
             ORDER BY digit), (p, q) -> p + q) AS chi2,
           list_reduce(list(
             ABS(CAST(n AS DOUBLE)
                 / CAST((SELECT total FROM tot) AS DOUBLE)
                 - CAST(e AS DOUBLE)
                   / CAST((SELECT total FROM tot) AS DOUBLE))
             ORDER BY digit), (p, q) -> p + q) / 9.0 AS mad
    FROM terms
    """


@query("q_benford_chi2", oracle=_benford_chi2_oracle())
def q_benford_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of order-total first digits against
    Benford's law plus the mean-absolute-deviation conformity score —
    the one-number verdicts on top of q_benford_digits' per-digit
    table (χ² ~ χ²₈ under conformity; MAD < 0.006 is Nigrini's
    'close conformity' band). Same shared log10 literal table; all 9
    digits enter via the expected-side left join (absent digits
    contribute their full N·p term); χ²/MAD fold in pinned digit
    order."""
    from aws_datalake_spark.queries.round6 import _BENFORD

    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    c = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # exp is the LEFT side of the left join — broadcasting the
    # probe side is unsupported (Spark hint warning); the 9-digit
    # counts frame broadcasts as the build side on its own
    exp = o.sparkSession.createDataFrame(
        [(i + 1, v) for i, v in enumerate(_BENFORD)],
        "digit long, p double",
    )
    tot = c.agg(F.sum("n").alias("total"))
    terms = (
        exp.join(F.broadcast(c), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            (F.col("total").cast("double") * F.col("p")).alias("e"),
            "total",
        )
    )
    chi_term = (
        (F.col("n").cast("double") - F.col("e"))
        * (F.col("n").cast("double") - F.col("e"))
        / F.col("e")
    )
    mad_term = F.abs(
        F.col("n").cast("double") / F.col("total").cast("double")
        - F.col("e").cast("double") / F.col("total").cast("double")
    )
    def _fold9(expr, alias):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("digit", expr.alias("t")))
                ),
                lambda st: st["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(alias)

    return terms.agg(
        F.min("total").cast("long").alias("n"),
        _fold9(chi_term, "chi2"),
        (_fold9(mad_term, "__mad") / F.lit(9.0)).alias("mad"),
    ).select("n", "chi2", "mad")


# ---------------------------------------------------------------------------
# Welch's heteroskedastic one-way ANOVA + Games-Howell pairwise
# ---------------------------------------------------------------------------

_WELCH_MOMENTS_SQL = """
    v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
      FROM customer
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM v GROUP BY 1 HAVING COUNT(*) > 1
    ),
    mom AS (
      SELECT g, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             (CAST(q AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * CAST(s AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
      FROM per_g
    )"""


@query(
    "q_welch_anova",
    oracle=f"""
    WITH {_WELCH_MOMENTS_SQL},
    wg AS (
      SELECT g, n, m, var,
             CAST(n AS DOUBLE) / var AS w
      FROM mom WHERE var > 0.0
    ),
    s1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list(w ORDER BY g), (p, q) -> p + q) AS ww,
             list_reduce(list(w * m ORDER BY g), (p, q) -> p + q) AS wm
      FROM wg
    ),
    s2 AS (
      SELECT s1.k, s1.ww,
             list_reduce(list(
               wg.w * (wg.m - s1.wm / s1.ww) * (wg.m - s1.wm / s1.ww)
               ORDER BY wg.g), (p, q) -> p + q) AS a,
             list_reduce(list(
               (1.0 - wg.w / s1.ww) * (1.0 - wg.w / s1.ww)
                 / CAST(wg.n - 1 AS DOUBLE)
               ORDER BY wg.g), (p, q) -> p + q) AS b
      FROM wg, s1 GROUP BY s1.k, s1.ww
    )
    SELECT k,
           CASE WHEN k > 1 THEN
             (a / CAST(k - 1 AS DOUBLE))
             / (1.0 + (2.0 * CAST(k - 2 AS DOUBLE)
                       / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))
                      * b)
           END AS f_star
    FROM s2
    """,
)
def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA on balance cents across
    segments: the equal-means test that does NOT assume equal
    variances — the robust default when q_brown_forsythe rejects
    (classic q_anova_f is anti-conservative under variance
    heterogeneity). Per-group exact moments → precision weights
    w=n/s²; the two weighted folds run in pinned group order and F*
    is one mirrored tree."""
    from aws_datalake_spark.operators.stats import _dec

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    )
    per_g = (
        c.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("x"))).alias("s"),
            F.sum(_dec(F.col("x")) * _dec(F.col("x"))).alias("q"),
        )
        .where(F.col("n") > 1)
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("q").cast("double") - m * F.col("s").cast("double")
    ) / (F.col("n") - 1).cast("double")
    wg = per_g.select(
        "g", "n", m.alias("m"), var.alias("var")
    ).where(F.col("var") > 0.0).select(
        "g", "n", "m", "var",
        (F.col("n").cast("double") / F.col("var")).alias("w"),
    )

    def _foldg(df, expr, alias):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("g", expr.alias("t")))
                ),
                lambda st: st["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(alias)

    s1 = wg.agg(
        F.count(F.lit(1)).alias("k"),
        _foldg(wg, F.col("w"), "ww"),
        _foldg(wg, F.col("w") * F.col("m"), "wm"),
    )
    j = wg.crossJoin(F.broadcast(s1))
    mw = F.col("wm") / F.col("ww")
    a_term = F.col("w") * (F.col("m") - mw) * (F.col("m") - mw)
    b_term = (
        (F.lit(1.0) - F.col("w") / F.col("ww"))
        * (F.lit(1.0) - F.col("w") / F.col("ww"))
        / (F.col("n") - 1).cast("double")
    )
    s2 = j.groupBy("k", "ww").agg(
        _foldg(j, a_term, "a"),
        _foldg(j, b_term, "b"),
    )
    k_d = F.col("k").cast("double")
    return s2.select(
        F.col("k").cast("long").alias("k"),
        F.when(
            F.col("k") > 1,
            (F.col("a") / (k_d - F.lit(1.0)))
            / (
                F.lit(1.0)
                + (F.lit(2.0) * (k_d - F.lit(2.0)) / (k_d * k_d - F.lit(1.0)))
                * F.col("b")
            ),
        ).alias("f_star"),
    )


@query(
    "q_games_howell_pairs",
    oracle=f"""
    WITH {_WELCH_MOMENTS_SQL}
    SELECT a.g AS seg_a, b.g AS seg_b,
           a.m - b.m AS mean_diff,
           (a.m - b.m) / SQRT(a.var / CAST(a.n AS DOUBLE)
                              + b.var / CAST(b.n AS DOUBLE)) AS t_stat,
           ((a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
            * (a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE)))
           / ((a.var / CAST(a.n AS DOUBLE))
              * (a.var / CAST(a.n AS DOUBLE))
              / CAST(a.n - 1 AS DOUBLE)
              + (b.var / CAST(b.n AS DOUBLE))
                * (b.var / CAST(b.n AS DOUBLE))
                / CAST(b.n - 1 AS DOUBLE)) AS welch_df
    FROM mom a JOIN mom b ON a.g < b.g
    WHERE a.var > 0.0 AND b.var > 0.0
    """,
)
def q_games_howell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Games–Howell pairwise statistics across all segment pairs:
    Welch t and Welch–Satterthwaite df per pair — the post-hoc that
    belongs after q_welch_anova rejects ("WHICH segments differ",
    without equal-variance or equal-n assumptions). Pure per-pair
    IEEE trees over the per-group exact moments; the k×k pair join
    is a broadcast of a k-row frame."""
    from aws_datalake_spark.operators.stats import _dec

    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    )
    per_g = (
        c.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("x"))).alias("s"),
            F.sum(_dec(F.col("x")) * _dec(F.col("x"))).alias("q"),
        )
        .where(F.col("n") > 1)
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("q").cast("double") - m * F.col("s").cast("double")
    ) / (F.col("n") - 1).cast("double")
    mom = per_g.select("g", "n", m.alias("m"), var.alias("var"))
    a, b = mom.alias("a"), F.broadcast(mom.alias("b"))
    j = a.join(b, F.col("a.g") < F.col("b.g")).where(
        (F.col("a.var") > 0.0) & (F.col("b.var") > 0.0)
    )
    se2a = F.col("a.var") / F.col("a.n").cast("double")
    se2b = F.col("b.var") / F.col("b.n").cast("double")
    return j.select(
        F.col("a.g").alias("seg_a"),
        F.col("b.g").alias("seg_b"),
        (F.col("a.m") - F.col("b.m")).alias("mean_diff"),
        ((F.col("a.m") - F.col("b.m")) / F.sqrt(se2a + se2b)).alias(
            "t_stat"
        ),
        (
            ((se2a + se2b) * (se2a + se2b))
            / (
                se2a * se2a / (F.col("a.n") - 1).cast("double")
                + se2b * se2b / (F.col("b.n") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Seasonal/trend strength (FPP) over the q_seasonal_decompose frame
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_strength",
    oracle="""
    WITH ser AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT m, y,
             LAG(y, 6) OVER (ORDER BY m)
               + 2 * SUM(y) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING
                                  AND 5 FOLLOWING)
               + LEAD(y, 6) OVER (ORDER BY m) AS cma24
      FROM ser
    ),
    det AS (
      SELECT m, y, cma24, m % 12 AS moy, 24 * y - cma24 AS detr24
      FROM tr
    ),
    szn AS (
      SELECT moy, CAST(COUNT(detr24) AS BIGINT) AS cnt,
             SUM(detr24) AS sd
      FROM det WHERE detr24 IS NOT NULL GROUP BY 1
    ),
    comp AS (
      SELECT det.m,
             CAST(det.cma24 AS DOUBLE) / 24.0 AS trend,
             (CAST(szn.sd AS DOUBLE) / CAST(szn.cnt AS DOUBLE)) / 24.0
               AS seasonal,
             CAST(det.y AS DOUBLE)
               - CAST(det.cma24 AS DOUBLE) / 24.0
               - (CAST(szn.sd AS DOUBLE) / CAST(szn.cnt AS DOUBLE))
                 / 24.0 AS rem
      FROM det JOIN szn ON det.moy = szn.moy
      WHERE det.cma24 IS NOT NULL
    ),
    folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list(rem ORDER BY m), (p, q) -> p + q) AS sr,
             list_reduce(list(rem * rem ORDER BY m),
                         (p, q) -> p + q) AS srr,
             list_reduce(list(seasonal + rem ORDER BY m),
                         (p, q) -> p + q) AS ss,
             list_reduce(list((seasonal + rem) * (seasonal + rem)
                              ORDER BY m), (p, q) -> p + q) AS sss,
             list_reduce(list(trend + rem ORDER BY m),
                         (p, q) -> p + q) AS st,
             list_reduce(list((trend + rem) * (trend + rem)
                              ORDER BY m), (p, q) -> p + q) AS stt
      FROM comp
    )
    SELECT n,
           CASE WHEN sss / CAST(n AS DOUBLE)
                     - (ss / CAST(n AS DOUBLE))
                       * (ss / CAST(n AS DOUBLE)) > 0.0 THEN
             GREATEST(0.0, 1.0 -
               (srr / CAST(n AS DOUBLE)
                - (sr / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE)))
               / (sss / CAST(n AS DOUBLE)
                  - (ss / CAST(n AS DOUBLE))
                    * (ss / CAST(n AS DOUBLE))))
           END AS seasonal_strength,
           CASE WHEN stt / CAST(n AS DOUBLE)
                     - (st / CAST(n AS DOUBLE))
                       * (st / CAST(n AS DOUBLE)) > 0.0 THEN
             GREATEST(0.0, 1.0 -
               (srr / CAST(n AS DOUBLE)
                - (sr / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE)))
               / (stt / CAST(n AS DOUBLE)
                  - (st / CAST(n AS DOUBLE))
                    * (st / CAST(n AS DOUBLE))))
           END AS trend_strength
    FROM folds
    """,
)
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend STRENGTH (Hyndman FPP: 1 −
    Var(remainder)/Var(component + remainder), floored at 0) over
    the exact q_seasonal_decompose frame — the one-number "is this
    series seasonal / trending enough to model" gate that decides
    between q_holt_linear and a seasonal model. Components are the
    bit-identical decomposition doubles; the six moment folds run in
    pinned month order over the calendar-bounded frame; strengths
    are one mirrored tree."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    ser = o.groupBy(
        (
            F.year(F.col("o_orderdate").cast("date")) * 12
            + F.month(F.col("o_orderdate").cast("date"))
        ).cast("long").alias("m")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("y")
    )
    wm = Window.orderBy("m")
    tr = ser.select(
        "m",
        "y",
        (
            F.lag("y", 6).over(wm)
            + F.lit(2) * F.sum("y").over(wm.rowsBetween(-5, 5))
            + F.lead("y", 6).over(wm)
        ).alias("cma24"),
    )
    det = tr.select(
        "m",
        "y",
        "cma24",
        F.pmod(F.col("m"), F.lit(12)).alias("moy"),
        (F.lit(24) * F.col("y") - F.col("cma24")).alias("detr24"),
    )
    szn = (
        det.where(F.col("detr24").isNotNull())
        .groupBy("moy")
        .agg(
            F.count("detr24").alias("cnt"),
            F.sum("detr24").alias("sd"),
        )
    )
    seasonal = (
        F.col("sd").cast("double") / F.col("cnt").cast("double")
    ) / F.lit(24.0)
    comp = (
        det.join(F.broadcast(szn), "moy")
        .where(F.col("cma24").isNotNull())
        .select(
            "m",
            (F.col("cma24").cast("double") / F.lit(24.0)).alias("trend"),
            seasonal.alias("seasonal"),
            (
                F.col("y").cast("double")
                - F.col("cma24").cast("double") / F.lit(24.0)
                - seasonal
            ).alias("rem"),
        )
    )

    def _foldm(expr, alias):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("m", expr.alias("t")))
                ),
                lambda st: st["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(alias)

    r = F.col("rem")
    sr_ = F.col("seasonal") + F.col("rem")
    tr_ = F.col("trend") + F.col("rem")
    folds = comp.agg(
        F.count(F.lit(1)).alias("n"),
        _foldm(r, "sr"),
        _foldm(r * r, "srr"),
        _foldm(sr_, "ss"),
        _foldm(sr_ * sr_, "sss"),
        _foldm(tr_, "st"),
        _foldm(tr_ * tr_, "stt"),
    )
    n_d = F.col("n").cast("double")
    var_r = F.col("srr") / n_d - (F.col("sr") / n_d) * (F.col("sr") / n_d)
    var_s = F.col("sss") / n_d - (F.col("ss") / n_d) * (F.col("ss") / n_d)
    var_t = F.col("stt") / n_d - (F.col("st") / n_d) * (F.col("st") / n_d)
    return folds.select(
        F.col("n").cast("long").alias("n"),
        F.when(
            var_s > 0.0,
            F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_s),
        ).alias("seasonal_strength"),
        F.when(
            var_t > 0.0,
            F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_t),
        ).alias("trend_strength"),
    )
