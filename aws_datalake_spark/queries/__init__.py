"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 is exposed here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL twin. The driver
hash-compares the two at sf0.01; see ``/root/repo/__spark_entry__.py``.

Import side effects register the queries; keep module list exhaustive.
"""

from __future__ import annotations

from aws_datalake_spark.queries.registry import (  # noqa: F401
    QueryFn,
    all_oracles,
    all_queries,
    query,
)

# Import for registration side-effects.
from aws_datalake_spark.queries import relational  # noqa: F401,E402
from aws_datalake_spark.queries import relational_ext  # noqa: F401,E402
from aws_datalake_spark.queries import relational_tpch  # noqa: F401,E402
from aws_datalake_spark.queries import sketches  # noqa: F401,E402
from aws_datalake_spark.queries import reference_ops  # noqa: F401,E402
from aws_datalake_spark.queries import llm_text  # noqa: F401,E402
from aws_datalake_spark.queries import llm_dedup  # noqa: F401,E402
from aws_datalake_spark.queries import llm_decontam  # noqa: F401,E402
from aws_datalake_spark.queries import llm_packing  # noqa: F401,E402
from aws_datalake_spark.queries import llm_similarity  # noqa: F401,E402
from aws_datalake_spark.queries import streaming_batch  # noqa: F401,E402
from aws_datalake_spark.queries import entity_e2e  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-window rotation
# ---------------------------------------------------------------------------
# The external driver hash-checks the FIRST 50 registry entries each
# round. Left in raw registration order that window never moves, so
# most of the registry would stay driver-unverified forever. Reorder
# so queries WITHOUT a green row in any prior round's
# CORRECTNESS_r*.json come first — reference-parity (ref_*) queries
# and the flagship LLM-pipeline operators ahead of the rest — and
# already-certified queries sink to the back. Each round the window
# then certifies ~50 new queries and cumulative driver coverage
# converges on the whole registry, with zero code changes per round.

# Order matters: the first entries claim whatever window slots remain
# after the ref_* family, so the externally-named flagship set
# (minhash LSH, dedup clusters, cosine/ANN top-k, decontamination,
# sequence packing, leakage-safe split) outranks the rest.
_FLAGSHIP = (
    "llm_minhash_lsh_pairs",
    "llm_dedup_clusters",
    "llm_cosine_topk",
    "llm_ann_ivf_topk",
    "llm_ann_lsh_topk",
    "llm_decontaminate",
    "llm_sequence_packing",
    "llm_train_test_split",
    # the two queries specifically flagged for round-2 certification:
    # the de-crossjoined semantic dedup and the composed entity flow
    "llm_semantic_dedup_keep",
    "ref_entity_end_to_end",
)


def _driver_green_names() -> set[str]:
    """Query names with a fully-green row in any prior round's driver
    artifact (rows+schema+hash all matched)."""
    import json
    from pathlib import Path

    green: set[str] = set()
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            if r.get("rows_match") and r.get("schema_match") and (
                r.get("hash_match") in (True, None)
            ):
                green.add(name)
    return green


def driver_ordered_queries() -> dict[str, QueryFn]:
    """`all_queries()` reordered for the driver's 50-entry window:
    never-yet-green first (ref_* parity, then flagship llm_*, then
    remaining llm_/st_, then generic q_*), previously-green last.
    Deterministic given the same CORRECTNESS_r*.json files."""
    reg = all_queries()
    green = _driver_green_names()
    flagship_rank = {n: i for i, n in enumerate(_FLAGSHIP)}
    order = {n: i for i, n in enumerate(reg)}

    def key(name: str) -> tuple:
        # the externally-named flagship set outranks everything (it
        # was called out by name as round-2 window priority); ref_*
        # parity next (older parity ops registered first), then the
        # remaining llm_/st_ surface, then generic queries
        if name in flagship_rank:
            family = 0
        elif name.startswith("ref_"):
            family = 1
        elif name.startswith(("llm_", "st_")):
            family = 2
        else:
            family = 3
        return (name in green, family, flagship_rank.get(name, 0), order[name])

    return {n: reg[n] for n in sorted(reg, key=key)}
