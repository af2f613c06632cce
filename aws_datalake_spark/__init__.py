"""aws_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference ELT pipeline (vibh998/aws_datalake):
config-driven projection rules, nested flatten/explode, SCD Type-2
merges, cumulative→delta stateful computation, data-quality
expectations, column crypto — plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Everything here is plain public PySpark (DataFrame / SQL / Structured
Streaming). No custom Catalyst rules are needed (see SURVEY.md §4):
the custom work is operator-level and lives in ``operators/``.
"""

__version__ = "0.1.0"

from aws_datalake_spark.session import get_spark  # noqa: F401
from aws_datalake_spark.catalog import load_tables, TABLE_NAMES  # noqa: F401
