"""Structured Streaming surface (SURVEY.md §2.6).

The reference's only streaming construct is a per-micro-batch DQ
hook (ST1/ST2); daily batch partitions stand in for event-time
processing. This package supplies the idiomatic Spark equivalents:
foreachBatch pipelines, watermarked event-time windows (tumbling /
sliding / session), and an applyInPandasWithState form of the
cumulative→delta operator (ST4).
"""
