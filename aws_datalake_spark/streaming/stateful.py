"""Streaming stateful operators (SURVEY.md ST4 / A3 + engine
extensions).

``delta_stateful_stream``: the reference's state store is DynamoDB
keyed (_id, reference_id) holding last-seen cumulative metrics,
updated per row (/root/reference/transformation.py:78-241). In
Structured Streaming the state lives in the state store via
applyInPandasWithState: per key, delta = current cumulative − state;
state ← current. Batch twin: operators/state_delta.py (join +
upsert).

``session_stateful_stream``: gap-based sessionization as a CUSTOM
stateful operator — unlike ``F.session_window`` (which only yields
windowed aggregates) this keeps arbitrary per-session state (entry
event, counters) and emits one finalized row per closed session,
using event-time timeouts so sessions close exactly when the
watermark passes last-event + gap. Batch twin:
operators/sessions.py (sessionize + session_stats).
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


def session_stateful_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 4 * 3600,
) -> DataFrame:
    """Per-key gap sessionization over a watermarked stream: emits
    ``(key, session_start, session_end, n_events)`` once a session is
    CLOSED — either by a later event arriving past the gap, or by the
    event-time timeout firing when the watermark passes
    last-event + gap (so the final session of an idle key still
    flushes; a processing-time timeout would instead depend on
    wall-clock luck).

    State per key is one (start, end, count) triple — constant bytes
    per active key in the state store, the bounded-state shape at any
    event volume. Input must carry ``withWatermark(ts_col, ...)``.
    """
    out_schema = (
        f"{key_col} long, session_start timestamp, "
        f"session_end timestamp, n_events long"
    )
    state_schema = "start_us long, end_us long, n long"
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            # micro-batch rows for the key, in event-time order
            ts_all = []
            for pdf in pdfs:
                ts_all.extend(
                    int(v.value) // 1000  # ns → µs
                    for v in pd.to_datetime(pdf[ts_col])
                )
            for t_us in sorted(ts_all):
                if cur is None:
                    cur = [t_us, t_us, 0]
                elif t_us - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [t_us, t_us, 0]
                cur[1] = max(cur[1], t_us)
                cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # close when the watermark passes last-event + gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
