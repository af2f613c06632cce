"""Round-10 batch: pHash media near-dup, nDCG@10, MAP count-grid
rework, and the r10 stats/ops families."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# pHash: planted near-copy detection + bit-exactness
# ---------------------------------------------------------------------------


def _ref_phash(payload: bytes) -> int:
    """Strict per-spec Python reference (pinned-order folds)."""
    from aws_datalake_spark.operators.multimodal import PHASH_DCT

    nb = len(payload)
    g = [float(payload[(k * nb) // 64]) for k in range(64)]
    m = PHASH_DCT
    r = []
    for j in range(64):
        x, v = j // 8, j % 8
        acc = 0.0
        for y in range(8):
            acc += m[v * 8 + y] * g[x * 8 + y]
        r.append(acc)
    c = []
    for j in range(64):
        u, v = j // 8, j % 8
        acc = 0.0
        for xx in range(8):
            acc += m[u * 8 + xx] * r[xx * 8 + v]
        c.append(acc)
    med = sorted(c)[32]
    ph = 0
    for j in range(63, 0, -1):
        ph = ph * 2 + (1 if c[j] > med else 0)
    return ph


_BASE_TEXT = (
    "The quick brown fox jumps over the lazy dog while the band "
    "plays on and the caravan moves slowly across the high desert "
    "plain toward the distant mountain pass at dusk."
)
# same-LENGTH substitution (a length change re-strides every sampled
# byte — the byte-grid analog of rescaling an image, which classic
# pHash is also not robust to without size normalization)
_NEAR_TEXT = _BASE_TEXT.replace("quick", "quack").replace("lazy", "hazy")
_FAR_TEXT = (
    "Completely unrelated content about numerical linear algebra, "
    "orthonormal transforms, energy compaction, and the discrete "
    "cosine basis used by perceptual hashing systems everywhere."
)


def test_phash_planted_near_copy_detected(spark):
    """A same-length 2-word substitution must land within hamming 3
    and be returned as a near-dup pair; the unrelated text must
    not."""
    from aws_datalake_spark.operators.multimodal import (
        phash_neardup_pairs,
        with_phash63,
    )

    docs = spark.createDataFrame(
        [(0, _BASE_TEXT), (1, _NEAR_TEXT), (2, _FAR_TEXT)],
        "asset_id long, text string",
    ).withColumn("payload", F.encode("text", "UTF-8"))
    hashed = with_phash63(docs, "payload", "ph").select("asset_id", "ph")
    got = {r.asset_id: r.ph for r in hashed.collect()}
    ham_near = bin(got[0] ^ got[1]).count("1")
    ham_far = bin(got[0] ^ got[2]).count("1")
    assert ham_near <= 3, f"planted near-copy at hamming {ham_near}"
    assert ham_far > 3
    pairs = phash_neardup_pairs(hashed, max_hamming=3).collect()
    assert [(p.asset_a, p.asset_b) for p in pairs] == [(0, 1)]
    assert pairs[0].hamming == ham_near


def test_phash_matches_python_reference(spark):
    from aws_datalake_spark.operators.multimodal import with_phash63

    texts = [_BASE_TEXT, _NEAR_TEXT, _FAR_TEXT, "x", "ab"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "asset_id long, text string"
    ).withColumn("payload", F.encode("text", "UTF-8"))
    got = {
        r.asset_id: r.ph
        for r in with_phash63(docs, "payload").select(
            "asset_id", "ph"
        ).collect()
    }
    for i, t_ in enumerate(texts):
        assert got[i] == _ref_phash(t_.encode()), f"text {i}"


def test_phash_matches_duckdb_twin(spark):
    import duckdb

    from aws_datalake_spark.operators.multimodal import (
        phash63_duckdb_cte,
        with_phash63,
    )

    texts = [_BASE_TEXT, _NEAR_TEXT, _FAR_TEXT, "zq", "hello"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "asset_id long, text string"
    ).withColumn("payload", F.encode("text", "UTF-8"))
    eng = {
        r.asset_id: r.ph
        for r in with_phash63(docs, "payload").select(
            "asset_id", "ph"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{txt}')" for i, txt in enumerate(texts))
        + ") v(asset_id, text)"
    )
    cte = phash63_duckdb_cte(
        "SELECT asset_id, hex(encode(text)) AS h FROM t"
    )
    ora = dict(
        con.execute(f"WITH {cte} SELECT asset_id, ph FROM phash").fetchall()
    )
    assert eng == ora


def test_phash_empty_payload_is_null(spark):
    from aws_datalake_spark.operators.multimodal import with_phash63

    docs = spark.createDataFrame(
        [(0, ""), (1, "y")], "asset_id long, text string"
    ).withColumn("payload", F.encode("text", "UTF-8"))
    got = {
        r.asset_id: r.ph
        for r in with_phash63(docs, "payload").select(
            "asset_id", "ph"
        ).collect()
    }
    assert got[0] is None and got[1] is not None


# ---------------------------------------------------------------------------
# nDCG@10
# ---------------------------------------------------------------------------


def test_ndcg_literal_tables_consistent():
    from aws_datalake_spark.queries.r10_batch import (
        _NDCG_GAIN,
        _NDCG_IDEAL,
        _NDCG_K,
    )

    assert len(_NDCG_GAIN) == len(_NDCG_IDEAL) == _NDCG_K
    assert _NDCG_GAIN[0] == 1.0  # 1/log2(2)
    for m in range(_NDCG_K):
        # prefix sums are a strict left fold of the gains
        acc = 0.0
        for g in _NDCG_GAIN[: m + 1]:
            acc += g
        assert _NDCG_IDEAL[m] == acc
    # gains strictly decreasing
    assert all(
        a > b for a, b in zip(_NDCG_GAIN, _NDCG_GAIN[1:])
    )


def test_ndcg_bounds_and_schema(spark):
    from aws_datalake_spark.queries.r10_batch import llm_ndcg_eval

    rows = llm_ndcg_eval(spark, SF_SMOKE).collect()
    assert rows and len(rows) == 10  # one per label
    for r in rows:
        assert 0.0 <= r.ndcg10 <= 1.0
        assert r.n_queries > 0


def test_ndcg_perfect_ranking_is_one(spark):
    """If every top-k hit is relevant and R >= k, nDCG must be
    exactly 1 — the DCG fold equals the IDCG prefix literal."""
    from aws_datalake_spark.queries.r10_batch import (
        _NDCG_GAIN,
        _NDCG_IDEAL,
    )

    # simulate the fold directly (device check, engine-independent)
    dcg = 0.0
    for g in _NDCG_GAIN:
        dcg += g
    assert dcg / _NDCG_IDEAL[-1] == 1.0


# ---------------------------------------------------------------------------
# MAP count-grid rework (same result class, scale-safe fold)
# ---------------------------------------------------------------------------


def test_map_eval_still_bounded_and_sane(spark):
    from aws_datalake_spark.queries.r09_batch import llm_map_eval

    rows = llm_map_eval(spark, SF_SMOKE).collect()
    assert rows and len(rows) == 10
    for r in rows:
        assert 0.0 <= r.map10 <= 1.0


def test_map_engine_has_no_per_label_query_list(spark):
    """The per-label aggregate must fold over the (label, ap_num)
    count grid — collect_list sizes are bounded by distinct ap_num
    values, not query count. Verified structurally: the final
    aggregate's collect_list takes (ap_num, term), not
    (query_id, ap)."""
    import inspect

    from aws_datalake_spark.queries import r09_batch

    src = inspect.getsource(r09_batch.llm_map_eval)
    assert 'F.struct(\n                            "ap_num",' in src
    assert '"query_id", "ap"' not in src


# ---------------------------------------------------------------------------
# r10 stats/ops family — invariants and textbook checks
# ---------------------------------------------------------------------------


def test_adamic_adar_star_graph(spark):
    """K1,4 star through middle 0: every non-adjacent pair (i, j)
    among the leaves shares exactly middle 0 with degree 4 → AA =
    1/ln(4), bit-equal to the shared literal table entry."""
    from aws_datalake_spark.operators.graph import adamic_adar_candidates

    e = spark.createDataFrame([(0, i) for i in range(1, 5)], "s long, d long")
    rows = adamic_adar_candidates(e, k=10).collect()
    assert [(r.u, r.v, r.cn) for r in rows] == [
        (1, 2, 1), (1, 3, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1), (3, 4, 1)
    ]
    expect = 1.0 / math.log(4)
    for r in rows:
        assert r.aa == expect


def test_theil_sen_known_series(spark, tmp_path):
    """Slope recovered exactly on a clean linear weekly series built
    as a tiny orders lake."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_theil_sen

    # one order per week, totalprice = 7.00 + 3.50/week (cents slope
    # 350/week)
    dates, prices = [], []
    base = pd.Timestamp("1995-01-02")
    for wk in range(10):
        dates.append((base + pd.Timedelta(weeks=wk)).date())
        prices.append(7.0 + 3.5 * wk)
    df = pd.DataFrame({"o_orderdate": dates, "o_totalprice": prices})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    r = q_theil_sen(spark, str(tmp_path)).collect()[0]
    assert r.n_weeks == 10 and r.n_pairs == 45
    assert r.theil_sen_slope == 350.0


def test_cliffs_delta_disjoint_groups_is_one(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_cliffs_delta

    df = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 3 + ["R"] * 3,
            "l_quantity": [10.0, 11.0, 12.0, 1.0, 2.0, 3.0],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df), str(tmp_path / "lineitem.parquet")
    )
    r = q_cliffs_delta(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_r, r.gt, r.lt) == (3, 3, 9, 0)
    assert r.cliffs_delta == 1.0


def test_acf_guards_constant_series(spark, tmp_path):
    """A constant series has zero variance — every acf must be NULL
    (the den > 0 guard), not NaN."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_acf_lags

    base = pd.Timestamp("1995-01-02")
    df = pd.DataFrame(
        {
            "o_orderdate": [(base + pd.Timedelta(days=i)).date() for i in range(30)],
            "o_totalprice": [5.0] * 30,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    rows = q_acf_lags(spark, str(tmp_path)).collect()
    assert len(rows) == 7
    assert all(r.acf is None for r in rows)


def test_cooks_distance_planted_outlier_ranks_first(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_cooks_distance

    base = pd.Timestamp("1995-01-02")
    vals = [10.0 + 0.5 * i for i in range(40)]
    vals[39] = 500.0  # planted end-point spike: high residual AND leverage
    df = pd.DataFrame(
        {
            "o_orderdate": [(base + pd.Timedelta(days=i)).date() for i in range(40)],
            "o_totalprice": vals,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    rows = q_cooks_distance(spark, str(tmp_path)).collect()
    assert rows[0].day == df["o_orderdate"][39]
    assert rows[0].cooks_d > 10 * rows[1].cooks_d


def test_spc_imr_flags_planted_spike(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_spc_imr_chart

    base = pd.Timestamp("1995-01-02")
    vals = [100.0 + (i % 3) for i in range(30)]
    vals[15] = 1000.0
    df = pd.DataFrame(
        {
            "o_orderdate": [(base + pd.Timedelta(days=i)).date() for i in range(30)],
            "o_totalprice": vals,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    r = q_spc_imr_chart(spark, str(tmp_path)).collect()[0]
    assert r.n == 30
    assert r.n_out_of_control >= 1
    assert r.lcl < r.xbar < r.ucl


def test_trimmed_mean_hand_data(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_trimmed_mean

    # 10 values 0..9 dollars; 10% trim drops min and max -> mean of
    # 1..8 dollars = 450 cents
    df = pd.DataFrame(
        {
            "c_mktsegment": ["S"] * 10,
            "c_acctbal": [float(i) for i in range(10)],
            "c_custkey": list(range(10)),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "customer.parquet"))
    r = q_trimmed_mean(spark, str(tmp_path)).collect()[0]
    assert (r.n_total, r.n_kept) == (10, 8)
    assert r.trimmed_mean_cents == 450.0


def test_yule_walker_bounds(spark):
    from aws_datalake_spark.queries.r10_batch import q_yule_walker_ar2

    r = q_yule_walker_ar2(spark, SF_SMOKE).collect()[0]
    if r.phi1 is not None:
        # stationarity region for AR(2): |phi2| < 1, phi1 + phi2 < 1
        assert abs(r.phi2) < 1.0
        assert r.phi1 + r.phi2 < 1.0


def test_mood_median_and_bp_sane(spark):
    from aws_datalake_spark.queries.r10_batch import (
        q_breusch_pagan,
        q_mood_median,
    )

    m = q_mood_median(spark, SF_SMOKE).collect()[0]
    assert m.k == 3 and m.chi2 >= 0.0
    assert 1 <= m.pooled_median <= 50
    b = q_breusch_pagan(spark, SF_SMOKE).collect()[0]
    assert b.bp_stat is None or b.bp_stat >= 0.0


def test_atkinson_bounds_and_equality_case(spark):
    from aws_datalake_spark.queries.r10_batch import q_atkinson_index

    rows = q_atkinson_index(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.atkinson_half is not None:
            assert -1e-12 <= r.atkinson_half < 1.0


def test_script_mix_ratios_sum_sane(spark):
    from aws_datalake_spark.queries.r10_batch import llm_script_mix

    rows = llm_script_mix(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for c in ("alpha_ratio", "digit_ratio", "ws_ratio", "nonascii_ratio"):
            assert 0.0 <= getattr(r, c) <= 1.0
        assert 0 <= r.n_mixed_script <= r.n_docs


# ---------------------------------------------------------------------------
# r10 batch 2: Welch family, Benford chi2, seasonal strength
# ---------------------------------------------------------------------------


def test_welch_anova_agrees_with_classic_under_homoskedasticity(spark, tmp_path):
    """With equal group variances and equal n, Welch's F* ≈ classic
    F (they coincide asymptotically; on balanced exact data the two
    are close)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_welch_anova

    rows = []
    for gi, base in enumerate([10.0, 12.0, 14.0]):
        for j in range(20):
            rows.append((f"G{gi}", base + (j % 5)))
    df = pd.DataFrame(
        {
            "c_mktsegment": [g for g, _ in rows],
            "c_acctbal": [v for _, v in rows],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "customer.parquet"))
    r = q_welch_anova(spark, str(tmp_path)).collect()[0]
    assert r.k == 3
    # classic F on this data (textbook):
    import statistics

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v * 100)
    k, n = 3, 60
    gm = statistics.mean([v for vs in groups.values() for v in vs])
    ssb = sum(len(vs) * (statistics.mean(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum((v - statistics.mean(vs)) ** 2 for vs in groups.values() for v in vs)
    f_classic = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.f_star == pytest.approx(f_classic, rel=0.05)


def test_games_howell_antisymmetric_pairs(spark):
    from aws_datalake_spark.queries.r10_batch import q_games_howell_pairs

    rows = q_games_howell_pairs(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r.seg_a < r.seg_b
        assert r.welch_df > 1.0
        # t and mean_diff share sign
        assert (r.t_stat >= 0) == (r.mean_diff >= 0)


def test_benford_chi2_includes_absent_digits(spark, tmp_path):
    """Orders whose totals all start with 1 → digits 2..9 absent;
    each must still contribute its full N·p term."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_benford_chi2
    from aws_datalake_spark.queries.round6 import _BENFORD

    df = pd.DataFrame({"o_totalprice": [1.0, 10.5, 150.0, 19.99]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    r = q_benford_chi2(spark, str(tmp_path)).collect()[0]
    assert r.n == 4
    # reference: O_1 = 4, O_d = 0 otherwise
    chi = 0.0
    for i, p in enumerate(_BENFORD):
        e = 4.0 * p
        o = 4.0 if i == 0 else 0.0
        chi += (o - e) * (o - e) / e
    assert r.chi2 == pytest.approx(chi, rel=1e-12)


def test_seasonal_strength_bounds(spark):
    from aws_datalake_spark.queries.r10_batch import q_seasonal_strength

    r = q_seasonal_strength(spark, SF_SMOKE).collect()[0]
    for v in (r.seasonal_strength, r.trend_strength):
        if v is not None:
            assert 0.0 <= v <= 1.0
