"""Multimodal column conventions + decode plumbing (north star,
BASELINE.json).

Images/audio/video live in the lake as opaque ``binary`` columns
with typed metadata (media_type, byte length, source id). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: the Spark-side plumbing — schema contract,
partition sizing, batch shape — is real and tested; the actual
codec call is stubbed behind ``DECODERS`` because the image/audio
libraries are not in this container (a real deployment registers
PIL/ffmpeg-backed decoders with the same signature).

100 TB design notes:
* Binary payloads never pass through a shuffle here — decode is a
  narrow mapInPandas over the scan; downstream aggregations see only
  small feature columns.
* ``spark.sql.files.maxPartitionBytes`` bounds decoded batch memory;
  metadata columns make size-based file pruning possible before any
  byte is decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id long, media_type string, payload binary, byte_len long, source string"
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, byte_len long, "
    "width int, height int, channels int, n_frames int, checksum60 long"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: derives pseudo-dimensions
    from the byte length. A real deployment replaces this (and ONLY
    this) with PIL/ffmpeg; the schema and batch plumbing stay."""
    n = len(payload)
    return {
        "width": 16 + (n % 1024),
        "height": 16 + ((n * 7) % 768),
        "channels": 3,
        "n_frames": 1 + (n % 30),
    }


DECODERS = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def make_media_table(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture: text
    bytes become the opaque payload (the plumbing doesn't care that
    the bytes aren't a real JPEG)."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        "source",
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode → feature columns via mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [DECODERS[m](bytes(p)) for m, p in zip(pdf["media_type"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out.insert(2, "byte_len", pdf["byte_len"].values)
            # 60-bit payload checksum keeps lineage verifiable without
            # shipping the payload downstream
            out["checksum60"] = [
                int.from_bytes(__import__("hashlib").md5(bytes(p)).digest()[:7], "big") % (1 << 60)
                for p in pdf["payload"]
            ]
            yield out

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.
    Frame count comes from the (stubbed) decode; the explode is the
    real Spark shape a frame pipeline has."""
    feats = extract_features(media.filter(F.col("media_type") == "video"))
    return feats.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


RESIZED_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "width int, height int, channels int"
)


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image resize plumbing: Arrow-batched mapInPandas in, resized
    payload + dims out. The pixel work is a deterministic fake
    (byte stream truncated/padded to w*h*3 — a real deployment swaps
    in PIL's resize and nothing else changes); the batch contract,
    binary round-trip, and output schema are the real thing."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h * 3
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"]
            resized = [
                (bytes(p) * (size // max(len(bytes(p)), 1) + 1))[:size]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": resized,
                    "width": target_w,
                    "height": target_h,
                    "channels": 3,
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "asset_id long, chunk_idx int, start_byte long, chunk_len int, "
    "chunk binary"
)


def chunk_audio(media: DataFrame, chunk_bytes: int = 4096,
                overlap: int = 0) -> DataFrame:
    """Audio windowing plumbing: split each audio payload into
    fixed-size (optionally overlapping) byte windows — one row per
    window, ready for a per-window encoder (the audio analogue of
    video frame_sample and image resize). Byte windows stand in for
    PCM frames exactly like the fake decode stands in for a codec:
    a real deployment swaps the slicer for librosa/ffmpeg framing
    and the schema, Arrow batching, and downstream joins stay.

    Scale: mapInPandas emits windows partition-locally (no shuffle);
    window count per asset is len/stride, so output size is
    predictable from byte_len before running.
    """
    stride = max(chunk_bytes - overlap, 1)

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "audio"]
            rows = {"asset_id": [], "chunk_idx": [], "start_byte": [],
                    "chunk_len": [], "chunk": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                idx = 0
                for start in range(0, max(len(b) - overlap, 1), stride):
                    piece = b[start:start + chunk_bytes]
                    if not piece:
                        break
                    rows["asset_id"].append(aid)
                    rows["chunk_idx"].append(idx)
                    rows["start_byte"].append(start)
                    rows["chunk_len"].append(len(piece))
                    rows["chunk"].append(piece)
                    idx += 1
            yield pd.DataFrame(rows)

    return media.mapInPandas(chunk_batches, schema=AUDIO_CHUNK_SCHEMA)


def embed_documents(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus → embedding stage: Arrow-batched ``mapInPandas``
    encoder producing unit-norm ``array<float>`` vectors.

    The encoder itself is a deterministic hashing stub (signed
    token-hash bag, L2-normalized) because no model runtime ships in
    this container; a real deployment swaps the inner loop for a
    sentence-transformer/ONNX call with the SAME batch iterator,
    schema contract, and partition inheritance — which is what this
    function actually tests.

    SCALE: narrow map over the scan, no shuffle; batch size is
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch, which is
    the knob that caps encoder memory (activation footprint) per
    task. Output vectors feed operators/similarity.py unchanged.
    """
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for text in pdf[text_col].astype(str):
                v = np.zeros(dim, dtype=np.float64)
                for tok in text.split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
                    )
                    sign = 1.0 if (h >> 8) & 1 else -1.0
                    v[h % dim] += sign
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    v[0] = 1.0
                    n = 1.0
                embs.append((v / n).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} long, embedding array<float>"
    )


def embed_media_chunks(chunks: DataFrame, dim: int = 64) -> DataFrame:
    """Per-chunk media encoder stage: Arrow-batched ``mapInPandas``
    over binary windows → unit-norm ``array<float>`` vectors, keyed
    ``(asset_id, chunk_idx)``. Encoder is a byte-4-gram hashing stub
    (same swap-the-inner-loop contract as :func:`embed_documents` —
    a CLAP/wav2vec call replaces the loop, nothing else moves).
    Narrow map, no shuffle; feeds operators/similarity.py unchanged.
    """
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for payload in pdf["chunk"]:
                b = bytes(payload)
                v = np.zeros(dim, dtype=np.float64)
                for i in range(0, max(len(b) - 3, 1), 4):
                    h = int.from_bytes(
                        hashlib.md5(b[i : i + 4]).digest()[:8], "little"
                    )
                    sign = 1.0 if (h >> 8) & 1 else -1.0
                    v[h % dim] += sign
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    v[0] = 1.0
                    n = 1.0
                embs.append((v / n).astype(np.float32))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "chunk_idx": pdf["chunk_idx"],
                    "embedding": embs,
                }
            )

    return chunks.select("asset_id", "chunk_idx", "chunk").mapInPandas(
        batches, "asset_id long, chunk_idx int, embedding array<float>"
    )


# ---------------------------------------------------------------------------
# Perceptual hash (DCT over the byte-grid) — VERDICT r09 item 4
# ---------------------------------------------------------------------------
#
# A pure-expression pHash: sample 64 bytes stride-evenly across the
# payload into an 8×8 grid, apply the separable orthonormal 2-D
# DCT-II (basis shipped as 64 shared double literals), threshold the
# 63 AC coefficients against the upper-median coefficient, and pack
# the bits into one 63-bit long. Every arithmetic step is a pinned
# left fold or a single IEEE op mirrored verbatim by the DuckDB twin
# (`phash63_duckdb_sql`), so the hash — and therefore the banded
# near-dup pair set — matches bit-for-bit cross-engine.
#
# This is the "graduate the encoder stub one notch" step: the DCT is
# real; only the byte-grid stands in for decoded luma pixels. A real
# deployment swaps the strided byte sampler for a PIL `Image.open →
# grayscale → resize(8, 8)` and the DCT/threshold/banding pipeline —
# the part that shuffles — is unchanged.
#
# 100 TB notes: the hash is a narrow scan-side projection (payload
# bytes never reach a shuffle — only the 63-bit long does), and the
# banded self-join buckets on 16-bit slice values exactly like
# dedup.simhash_neardup_pairs (hamming ≤ 3 detection is EXACT by
# pigeonhole over 4 slices).

import math


def _phash_dct_matrix() -> list[float]:
    """Orthonormal 8×8 DCT-II basis, row-major M[u*8+x]."""
    out = []
    for u in range(8):
        a = math.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            out.append(a * math.cos((2 * x + 1) * u * math.pi / 16.0))
    return out


PHASH_DCT = _phash_dct_matrix()


def _let(val, body):
    """Let-binding for Spark expressions: evaluate ``val`` ONCE and
    bind it to a lambda variable inside ``body`` — encoded as
    ``element_at(transform(array(val), body), 1)``. Lambda variables
    are bound to evaluated values, so ``body`` may reference the
    binding any number of times at zero re-evaluation cost. This is
    the load-bearing device for multi-stage per-row pipelines:
    Catalyst's CollapseProject inlines staged withColumns into every
    downstream reference, and HOF lambdas defeat subexpression
    elimination — a staged 8×8 DCT re-evaluated the hex-decode per
    coefficient reference (~2 s/row measured). With let-bindings the
    whole hash is ONE linear-cost expression."""
    return F.element_at(F.transform(F.array(val), body), 1)


def with_phash63(
    df: DataFrame, payload_col: str, out_col: str = "ph"
) -> DataFrame:
    """Add a 63-bit perceptual-hash column computed JVM-side with
    higher-order functions (no Python UDF): hex-decode → strided
    8×8 byte grid → separable orthonormal DCT-II (PHASH_DCT literal
    basis) → 63 AC bits vs the upper-median coefficient, packed into
    one long. Every stage is let-bound (see :func:`_let`) so the
    expression evaluates each stage exactly once per row. Rows with
    empty payloads get NULL."""
    hx_expr = F.hex(F.col(payload_col))  # uppercase hex, 2 chars/byte
    marr = F.array(*[F.lit(v) for v in PHASH_DCT])

    def pipeline(hx):
        # bind the hex string once; the grid stage reads only the 128
        # chars it samples — decoding EVERY nibble first (the r10
        # mid-build form) paid O(payload bytes) interpreted lambda
        # evals per row for 64 used bytes
        return _let(hx, _grid_stage)

    def _grid_stage(h):
        nb = (F.length(h) / F.lit(2)).cast("int")

        # nibble values: ascii 48-57 → 0-9, 65-70 → 10-15
        def nib(pos):
            a = F.ascii(F.substr(h, pos.cast("int"), F.lit(1)))
            return F.when(a >= 65, a - 55).otherwise(a - 48)

        # 8×8 grid: strided byte sample idx(k) = (k*nb) // 64
        def byte_at(k):
            idx = F.floor((k * nb) / F.lit(64)).cast("int")
            return (
                F.lit(16) * nib(F.lit(2) * idx + 1)
                + nib(F.lit(2) * idx + 2)
            ).cast("double")

        grid_expr = F.transform(F.sequence(F.lit(0), F.lit(63)), byte_at)
        return _let(grid_expr, _row_stage)

    def _row_stage(g):
        # separable DCT: R[8x+v] = Σ_y M[v*8+y]*g[8x+y] (left fold)
        def row_pass(j):
            x = F.floor(j / F.lit(8)).cast("int")
            v = F.pmod(j, F.lit(8)).cast("int")
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(7)),
                F.lit(0.0),
                lambda acc, y: acc
                + F.element_at(marr, (v * 8 + y + 1).cast("int"))
                * F.element_at(g, (x * 8 + y + 1).cast("int")),
            )

        r_expr = F.transform(F.sequence(F.lit(0), F.lit(63)), row_pass)
        return _let(r_expr, _col_stage)

    def _col_stage(r):
        # C[8u+v] = Σ_x M[u*8+x] * R[8x+v] (left fold, x asc)
        def col_pass(j):
            u = F.floor(j / F.lit(8)).cast("int")
            v = F.pmod(j, F.lit(8)).cast("int")
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(7)),
                F.lit(0.0),
                lambda acc, x: acc
                + F.element_at(marr, (u * 8 + x + 1).cast("int"))
                * F.element_at(r, (x * 8 + v + 1).cast("int")),
            )

        c_expr = F.transform(F.sequence(F.lit(0), F.lit(63)), col_pass)
        return _let(c_expr, _pack_stage)

    def _pack_stage(c):
        # upper median of the 64 coefficients, bound once
        return _let(
            F.element_at(F.array_sort(c), 33),
            lambda med: F.aggregate(
                # pack bits 1..63 (AC coeffs), MSB-first: acc*2 + bit
                F.sequence(F.lit(63), F.lit(1), F.lit(-1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc * F.lit(2).cast("long")
                + F.when(
                    F.element_at(c, (j + 1).cast("int")) > med, 1
                )
                .otherwise(0)
                .cast("long"),
            ),
        )

    return df.withColumn(
        out_col,
        F.when(F.length(F.col(payload_col)) > 0, pipeline(hx_expr)),
    )


def phash63_duckdb_cte(src_sql: str) -> str:
    """The DuckDB twin of :func:`phash63` as a WITH-clause fragment.
    ``src_sql`` must yield ``(asset_id, h)`` with ``h`` the
    uppercase-hex string of the payload (non-empty). Produces CTEs
    ``psrc → pnib → pgrid → prow → pcol → pmed → phash`` where
    ``phash`` is ``(asset_id, ph)``. Shares the PHASH_DCT literals;
    every fold is the same pinned left fold ([0.0] is prepended
    because DuckDB's list_reduce seeds from the first element)."""
    # e-notation forces each element to parse as DOUBLE — a bare
    # decimal list literal is unified to ONE DECIMAL(p,s) type and
    # 1-ulp-rounds elements that need more scale than the unified type
    marr = "[" + ", ".join(f"{v:.17e}" for v in PHASH_DCT) + "]"
    return f"""
    psrc AS ({src_sql}),
    pnib AS (
      SELECT asset_id, len(h) // 2 AS nb,
             list_transform(range(1, len(h) + 1), i ->
               CASE WHEN ascii(substr(h, CAST(i AS INT), 1)) >= 65
                    THEN ascii(substr(h, CAST(i AS INT), 1)) - 55
                    ELSE ascii(substr(h, CAST(i AS INT), 1)) - 48
               END) AS nibs
      FROM psrc
    ),
    pgrid AS (
      SELECT asset_id,
             list_transform(range(0, 64), k -> CAST(
               16 * nibs[CAST(2 * ((k * nb) // 64) + 1 AS INT)]
               + nibs[CAST(2 * ((k * nb) // 64) + 2 AS INT)] AS DOUBLE))
               AS g
      FROM pnib
    ),
    prow AS (
      SELECT asset_id,
             list_transform(range(0, 64), j -> list_reduce(
               [0.0] || list_transform(range(0, 8), y ->
                 ({marr})[CAST((j % 8) * 8 + y + 1 AS INT)]
                 * g[CAST((j // 8) * 8 + y + 1 AS INT)]),
               (p, q) -> p + q)) AS r
      FROM pgrid
    ),
    pcol AS (
      SELECT asset_id,
             list_transform(range(0, 64), j -> list_reduce(
               [0.0] || list_transform(range(0, 8), x ->
                 ({marr})[CAST((j // 8) * 8 + x + 1 AS INT)]
                 * r[CAST(x * 8 + (j % 8) + 1 AS INT)]),
               (p, q) -> p + q)) AS c
      FROM prow
    ),
    pmed AS (SELECT asset_id, c, list_sort(c)[33] AS med FROM pcol),
    phash AS (
      SELECT asset_id,
             list_reduce([CAST(0 AS BIGINT)] ||
               list_transform(range(63, 0, -1), j ->
                 CAST(CASE WHEN c[CAST(j + 1 AS INT)] > med
                      THEN 1 ELSE 0 END AS BIGINT)),
               (p, q) -> p * 2 + q) AS ph
      FROM pmed
    )"""


def phash_neardup_pairs(
    hashed: DataFrame,
    id_col: str = "asset_id",
    hash_col: str = "ph",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup asset pairs by pHash hamming distance, candidate-
    limited by banding the 63-bit hash into four 16-bit slices
    (pigeonhole: two hashes within hamming 3 agree on at least one
    slice, so detection at ``max_hamming`` ≤ 3 is EXACT — the
    dedup.simhash_neardup_pairs device). Returns
    ``(asset_a, asset_b, hamming)``.

    SCALE: the self-join buckets on (slice_id, 16-bit slice value) —
    65 536 buckets per slice spread the corpus; only (id, hash) longs
    shuffle, never payload bytes.

    The lineage cut below is DELIBERATE: the slice explode references
    the hash column 5× and the self-join doubles that, and Catalyst
    pushes projections through a mere Repartition — without a hard
    barrier CollapseProject inlines the ~10^3-node staged DCT
    expression into every reference and the re-exploded tree stalls
    codegen for minutes even at sf0.001. Checkpointing the tiny
    (id, 63-bit hash) frame materializes the hash exactly once (the
    per-hop bfs_layers device); each join side then reads 16-byte
    rows."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    hashed = _truncate(hashed.select(id_col, hash_col))
    slices = hashed.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("slice_id"),
                        F.shiftright(F.col(hash_col), i * 16)
                        .bitwiseAND(F.lit(65535))
                        .alias("slice_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("sl"),
    ).select(id_col, hash_col, "sl.slice_id", "sl.slice_val")
    a = slices.select(
        F.col(id_col).alias("asset_a"),
        F.col(hash_col).alias("__ha"),
        "slice_id",
        "slice_val",
    )
    b = slices.select(
        F.col(id_col).alias("asset_b"),
        F.col(hash_col).alias("__hb"),
        "slice_id",
        "slice_val",
    )
    return (
        a.join(b, ["slice_id", "slice_val"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select(
            "asset_a",
            "asset_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
