"""Crypto goldens (SURVEY B5; ported from ccrypto.py:54-89)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.functions.crypto import generate_key, make_crypto_udfs, sha224_hash

# Fixed SHA-224 digests from /root/reference/ccrypto.py:78-89
SHA224_GOLDENS = {
    3: "4cfc3a1811fe40afa401b25ef7fa0379f1f7c1930a04f8755d678474",
    12: "3c794f0c67bd561ce841fc6a5999bf0df298a0f0ae3487efda9d0ef4",
    26: "958d42a83cf840cde79922f0795fd6ac7da4d2df828edc32244bb3ba",
    53: "6c905a484091b8fd5e27b0cbdb51751f6de1f15f2f0d9d1b06149e92",
}


def test_sha224_matches_reference_goldens(spark):
    df = spark.createDataFrame([(k,) for k in SHA224_GOLDENS], "v long")
    out = {r.v: r.h for r in df.select("v", sha224_hash("v").alias("h")).collect()}
    assert out == SHA224_GOLDENS


def test_fernet_roundtrip_ints_and_floats(spark):
    # reference round-trips ints [30,40,20,13,9] and floats
    # [1000.00, 3434.34, 3433, 43432] (ccrypto.py:55-75)
    values = ["30", "40", "20", "13", "9", "1000.0", "3434.34", "3433.0", "43432.0"]
    enc, dec = make_crypto_udfs(spark, generate_key())
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select("v", dec(enc(F.col("v"))).alias("back")).collect()
    assert all(r.v == r.back for r in out)


def test_fernet_tokens_differ_per_row_and_null_passthrough(spark):
    enc, _ = make_crypto_udfs(spark, generate_key())
    df = spark.createDataFrame([("x",), ("x",), (None,)], "v string")
    rows = df.select(enc(F.col("v")).alias("t")).collect()
    tokens = [r.t for r in rows]
    assert tokens[2] is None
    assert tokens[0] != tokens[1]  # random IV per value


def test_two_keys_are_independent(spark):
    enc1, _ = make_crypto_udfs(spark, generate_key())
    _, dec2 = make_crypto_udfs(spark, generate_key())
    df = spark.createDataFrame([("secret",)], "v string")
    token = df.select(enc1(F.col("v")).alias("t")).collect()[0].t
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.createDataFrame([(token,)], "t string").select(
            dec2(F.col("t")).alias("x")
        ).collect()
