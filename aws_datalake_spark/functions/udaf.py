"""Pandas GROUPED_AGG UDAF surface (SURVEY.md §2.7: the reference has
no UDAF; the engine exposes the Arrow-batched grouped-agg path for
completeness).

PERF/SCALE: a GROUPED_AGG pandas_udf has NO partial aggregation —
every raw row shuffles to its group's reducer, unlike built-in
aggregates which combine map-side. That is why the engine's own
aggregations are built-ins; this path exists for semantics the
built-ins cannot express. Keep the shuffled row narrow (project to
the UDAF inputs first).

Numeric determinism: inputs are pre-scaled to int64 and summed in
int64 inside pandas (exact, order-free), then converted to double in
a fixed operation order — the same policy as queries/_shared.py, so
DuckDB oracles hash-match.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean_q6(q6: pd.Series, w: pd.Series) -> float:
    """Weighted mean of a 6-decimal-scaled integer metric ``q6`` with
    int64 weights ``w``: exact integer accumulation, then
    float(num)/float(den)/1e6 (fixed double-op order)."""
    den = int(w.sum())
    if den == 0:
        return 0.0
    num = int((q6 * w).sum())
    return float(num) / float(den) / 1e6
