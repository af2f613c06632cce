"""Zone layout (SURVEY.md §1.1, S13/S14, P20).

The reference moves objects between raw → partitioning →
transformation S3 prefixes by rewriting key strings
(cleansing.py:24-25, transformation.py:250-252). Here zones are a
medallion directory convention; "copying" a dataset between zones is
a distributed read→write (S13), not a per-object driver loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

ZONES = ("raw", "cleansed", "transformed", "curated")


@dataclass(frozen=True)
class ZonePaths:
    root: str

    def path(self, zone: str, dataset: str) -> str:
        if zone not in ZONES:
            raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
        return os.path.join(self.root, zone, dataset)

    def promote(self, from_zone: str, dataset: str) -> tuple[str, str]:
        """P20 — the raw→next-zone path rewrite as a pure function."""
        i = ZONES.index(from_zone)
        if i + 1 >= len(ZONES):
            raise ValueError(f"{from_zone} is the last zone")
        return self.path(from_zone, dataset), self.path(ZONES[i + 1], dataset)


def copy_zone(spark: SparkSession, src: str, dst: str, fmt: str = "parquet") -> None:
    """S13 — zone-to-zone dataset copy (partitioning.py:54-56) as a
    distributed passthrough."""
    df: DataFrame = spark.read.format(fmt).load(src)
    df.write.mode("overwrite").format(fmt).save(dst)


def discover_datasets(root_zone_path: str) -> list[str]:
    """S14 — dataset discovery under a zone prefix
    (partitioning.py:28-32 list-keys-with-a-dot), driver-side like
    the reference but over directories; Spark's own glob handles the
    per-dataset file listing."""
    if not os.path.isdir(root_zone_path):
        return []
    return sorted(
        d for d in os.listdir(root_zone_path)
        if os.path.isdir(os.path.join(root_zone_path, d)) or "." in d
    )
