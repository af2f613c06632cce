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
