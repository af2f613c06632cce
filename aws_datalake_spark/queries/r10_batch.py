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
    cum AS (
      SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below,
             SUM(c) OVER () - SUM(c) OVER (ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS above
      FROM xr
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
    exact integer gt/lt tallies; one divide.

    Note both groups share the same value domain via the inner join
    on xa's values — values absent from one side contribute zero
    pairs on that side by construction."""
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

    wv = Window.orderBy("v")
    cum = xr.select(
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
