"""SCD Type-2 merge (SURVEY.md §2.3 J2/J3, §3.3).

Reference semantics (/root/reference/loading.py:25-133, repeated per
entity):

1. close-out: UPDATE target SET actv_flg='N', record_to=now
   WHERE key IN (SELECT key FROM staging GROUP BY key) AND actv_flg='Y'
2. insert: every staging row appended with actv_flg='Y',
   record_to=NULL — UNCONDITIONALLY, even if nothing changed.
3. composite-key quirk (loading.py:934-938): for line_item_creative
   the close-out predicate is COLUMN-WISE — creative_id IN (staged
   creative_ids) AND line_item_id IN (staged line_item_ids) — NOT a
   pair-wise tuple match. Reproduced exactly via two semi-join-style
   IN sets.

Spark-first design: the merge is expressed as a union of two
branches computed from the current snapshot + staging DataFrames —
no row-at-a-time updates. On a transactional table format the same
logic is one MERGE statement; here the engine returns the new table
state so any sink (parquet overwrite, Delta/Iceberg MERGE) can
persist it. Close-out membership uses broadcast left-semi/anti joins
on the distinct staged keys (A1) — the staged key set is small
relative to the target, so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTIVE = "Y"
INACTIVE = "N"


def scd2_merge(
    target: DataFrame,
    staging: DataFrame,
    keys: list[str],
    flag_col: str = "actv_flg",
    close_ts_col: str = "record_to",
    close_ts=None,
    columnwise_keys: bool = False,
) -> DataFrame:
    """Return the post-merge table state.

    ``columnwise_keys=True`` reproduces the J3 quirk: a target row is
    closed when EACH key column independently appears in staging's
    set for that column (loading.py:934-938).
    """
    if close_ts is None:
        close_ts = F.date_trunc("second", F.current_timestamp())

    staged_keys = staging.select(*keys).distinct()

    if columnwise_keys:
        # mark membership per key column with broadcast left joins,
        # then split on the AND of the marks — one pass, no exceptAll
        marked = target
        marks = []
        for k in keys:
            mark = f"__in_{k}"
            vals = staging.select(k).distinct().withColumn(mark, F.lit(True))
            marked = marked.join(F.broadcast(vals), on=k, how="left")
            marks.append(mark)
        pred = F.lit(True)
        for m in marks:
            pred = pred & F.coalesce(F.col(m), F.lit(False))
        marked = marked.withColumn("__closed", pred).drop(*marks)
        closed_candidates = marked.filter(F.col("__closed")).drop("__closed").select(*target.columns)
        survivors = marked.filter(~F.col("__closed")).drop("__closed").select(*target.columns)
    else:
        closed_candidates = target.join(F.broadcast(staged_keys), on=keys, how="left_semi")
        survivors = target.join(F.broadcast(staged_keys), on=keys, how="left_anti")

    active = F.col(flag_col) == ACTIVE
    closed = closed_candidates.withColumn(
        flag_col, F.when(active, F.lit(INACTIVE)).otherwise(F.col(flag_col))
    ).withColumn(
        close_ts_col,
        F.when(F.lit(INACTIVE) == F.col(flag_col), F.coalesce(F.col(close_ts_col), close_ts)).otherwise(
            F.col(close_ts_col)
        ),
    )

    incoming = staging.withColumn(flag_col, F.lit(ACTIVE)).withColumn(
        close_ts_col, F.lit(None).cast("timestamp")
    )
    incoming = incoming.select(*closed.columns)

    return survivors.unionByName(closed).unionByName(incoming)


def close_out_only(
    target: DataFrame,
    staging: DataFrame,
    keys: list[str],
    flag_col: str = "actv_flg",
    close_ts_col: str = "record_to",
    close_ts=None,
) -> DataFrame:
    """Just step 1 (the J2 UPDATE), for tests and partial pipelines."""
    if close_ts is None:
        close_ts = F.date_trunc("second", F.current_timestamp())
    staged_keys = staging.select(*keys).distinct()
    in_staging = target.join(F.broadcast(staged_keys), on=keys, how="left_semi")
    rest = target.join(F.broadcast(staged_keys), on=keys, how="left_anti")
    active = F.col(flag_col) == ACTIVE
    return rest.unionByName(
        in_staging.withColumn(
            close_ts_col, F.when(active, close_ts).otherwise(F.col(close_ts_col))
        ).withColumn(flag_col, F.when(active, F.lit(INACTIVE)).otherwise(F.col(flag_col)))
    )


def scd2_asof(
    table: DataFrame,
    ts,
    from_col: str = "record_from",
    to_col: str = "record_to",
) -> DataFrame:
    """Read an SCD2 dimension AS OF a past instant: the version whose
    validity interval covers ``ts`` (``record_from <= ts < record_to``,
    open interval = NULL record_to). This is the query-side payoff of
    versioning — point-in-time joins against facts — and a plain
    filter, so partition/file pruning on record_from applies."""
    c = F.lit(ts).cast("timestamp") if isinstance(ts, str) else ts
    return table.filter(
        (F.col(from_col) <= c)
        & (F.col(to_col).isNull() | (F.col(to_col) > c))
    )
