"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 is exposed here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL twin. The driver
hash-compares the two at sf0.01; see ``/root/repo/__spark_entry__.py``.

Import side effects register the queries; keep module list exhaustive.
"""

from __future__ import annotations

from aws_datalake_spark.queries.registry import (  # noqa: F401
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
