"""Streaming cumulative→delta (SURVEY.md ST4 / A3).

The reference's state store is DynamoDB keyed (_id, reference_id)
holding last-seen cumulative metrics, updated per row
(/root/reference/transformation.py:78-241). In Structured Streaming
the state lives in the state store via applyInPandasWithState: per
key, delta = current cumulative − state; state ← current.

Batch twin: operators/state_delta.py (join + upsert).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def delta_stateful_stream(
    stream_df: DataFrame,
    keys: list[str],
    metrics: list[str],
) -> DataFrame:
    """applyInPandasWithState over ``keys``: emits each input row
    with metrics replaced by deltas vs the stored cumulative."""
    out_schema = ", ".join(
        [f"{k} long" for k in keys] + [f"{m} long" for m in metrics]
    )
    state_schema = ", ".join(f"{m} long" for m in metrics)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = dict(zip(metrics, state.get)) if state.exists else {m: 0 for m in metrics}
        outs = []
        for pdf in pdfs:
            # within a batch, successive rows of the same key chain:
            # state advances row by row like the reference's loop
            pdf = pdf.sort_index()
            deltas = {}
            for m in metrics:
                cur = pdf[m].fillna(0).astype("int64")
                base = pd.Series([prev[m]] + list(cur[:-1]), index=cur.index)
                deltas[m] = cur - base
                prev[m] = int(cur.iloc[-1])
            out = pd.DataFrame({k: pdf[k_col] for k, k_col in zip(keys, keys)})
            for m in metrics:
                out[m] = deltas[m]
            outs.append(out)
        state.update(tuple(prev[m] for m in metrics))
        yield from outs

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
