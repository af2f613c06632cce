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
