"""Column crypto (SURVEY.md U1-U6).

Reference (/root/reference/ccrypto.py:15-52, createKey.py:107-132):
Fernet encrypt/decrypt exposed as row-at-a-time Spark UDFs with the
key broadcast to executors, plus SHA-224 pseudonymization.

Spark-first differences:
* encrypt/decrypt are Arrow-batched ``pandas_udf``s (vectorized
  Python, ~10-100× the row-at-a-time UDF throughput the reference
  notebooks used);
* SHA-224 needs no Python at all — the built-in ``sha2(col, 224)``
  runs JVM-side in whole-stage codegen (golden digests from
  ccrypto.py:78-89 are asserted in tests/test_crypto.py);
* the key travels via a real broadcast variable (createKey.py:84-86
  pattern), not a closure copy per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:
    from cryptography.fernet import Fernet

    HAVE_FERNET = True
except ImportError:  # pragma: no cover - env always has cryptography
    HAVE_FERNET = False


def generate_key() -> bytes:
    """U5 — Fernet keygen (ccrypto.py:8-13)."""
    if not HAVE_FERNET:
        raise NotImplementedError("cryptography not installed")
    return Fernet.generate_key()


def make_crypto_udfs(spark: SparkSession, key: bytes):
    """Build (encrypt_udf, decrypt_udf) with ``key`` broadcast to the
    executors (createKey.py:62-86). Values round-trip via str() like
    the reference's encrypt_val/decrypt_val (ccrypto.py:15-29)."""
    if not HAVE_FERNET:
        raise NotImplementedError("cryptography not installed")
    bkey = spark.sparkContext.broadcast(key)

    @pandas_udf("string")
    def encrypt_col(s: pd.Series) -> pd.Series:
        f = Fernet(bkey.value)
        return s.map(
            lambda v: None if v is None else f.encrypt(str(v).encode("utf-8")).decode("ascii")
        )

    @pandas_udf("string")
    def decrypt_col(s: pd.Series) -> pd.Series:
        f = Fernet(bkey.value)
        return s.map(
            lambda v: None if v is None else f.decrypt(v.encode("ascii")).decode("utf-8")
        )

    return encrypt_col, decrypt_col


def sha224_hash(col: Column | str) -> Column:
    """U3 — SHA-224 pseudonymization of an int-like column
    (ccrypto.py:48-52: hashlib.sha224(str(value)).hexdigest()).
    Built-in sha2 — no UDF, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 224)
