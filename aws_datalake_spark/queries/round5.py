"""Round-5 additions: record linkage, fixed-width ingestion,
watermark late-data semantics, OHLC time-series bars, robust outlier
filtering, salted skew joins, marketing attribution, and exact
stratified eval splits.

Each query pairs a scalable Spark plan with a DuckDB oracle twin;
the module docstrings in the backing operators carry the 100 TB
posture. Registration order puts the ref_* source query with its
family; everything here is new surface beyond SURVEY.md §2 (the
reference has none of these capabilities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import dsum, t
from aws_datalake_spark.queries.registry import query
from aws_datalake_spark.scratch import scratch_dir

# ---------------------------------------------------------------------------
# record linkage / fuzzy entity resolution
# ---------------------------------------------------------------------------

# deterministic "dirty feed": per suppkey % 4 — 0: last char typo
# (dist 1), 1: last two chars typo (dist 2), 2: unchanged (dist 0),
# 3: corrupted beyond the block's typo model (prefix change → never
# a candidate, correctly absent from the result)
_DIRTY_SQL = """
    CASE s_suppkey % 4
      WHEN 0 THEN substr(s_name, 1, length(s_name) - 1) || 'X'
      WHEN 1 THEN substr(s_name, 1, length(s_name) - 2) || 'ZZ'
      WHEN 2 THEN s_name
      ELSE 'BAD-' || s_name
    END
"""


@query(
    "q_entity_resolution",
    oracle=f"""
    WITH dirty AS (
      SELECT s_suppkey + 1000000 AS d_id, {_DIRTY_SQL} AS d_name
      FROM supplier
    ),
    cand AS (
      SELECT s.s_suppkey, s.s_name, d.d_id, d.d_name,
             CAST(levenshtein(s.s_name, d.d_name) AS INT) AS edit_dist
      FROM supplier s JOIN dirty d
        ON substr(s.s_name, 1, length(s.s_name) - 2)
         = substr(d.d_name, 1, length(d.d_name) - 2)
    )
    SELECT s_suppkey, s_name, d_id, d_name, edit_dist
    FROM cand WHERE edit_dist <= 2
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution with BLOCKING (operators/linkage.py):
    a dirty feed re-states every supplier with suffix typos; the
    blocked fuzzy join equi-joins on the all-but-last-2-chars block
    key (the typo model) and verifies candidates with exact
    levenshtein ≤ 2 — never an all-pairs scan, so the same plan holds
    when both feeds are corpus-sized. Rows corrupted beyond the typo
    model fall outside every block and are (correctly) unmatched.
    """
    from aws_datalake_spark.operators.linkage import blocked_fuzzy_join

    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dirty = s.select(
        (F.col("s_suppkey") + 1_000_000).alias("d_id"),
        F.expr(_DIRTY_SQL).alias("d_name"),
    )
    blk_l = F.expr("substr(s_name, 1, length(s_name) - 2)")
    blk_r = F.expr("substr(d_name, 1, length(d_name) - 2)")
    return blocked_fuzzy_join(
        s, dirty, "s_name", "d_name", max_dist=2, block=blk_l, block_right=blk_r
    ).select(
        "s_suppkey", "s_name", "d_id", "d_name",
        F.col("edit_dist").cast("int").alias("edit_dist"),
    )


# ---------------------------------------------------------------------------
# fixed-width source
# ---------------------------------------------------------------------------


@query(
    "ref_fixed_width_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def ref_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (copybook-style) file roundtrip: format nation as
    22-char fixed lines, write as text, read back with
    sources/readers.py:read_fixed_width (substring+trim+cast — pure
    codegen, no Python). Rounds out the interchange matrix alongside
    CSV/TSV/pipe/JSON/XML/ORC; the parse distributes per line split
    like any text scan. The name field is sized from the data
    (rpad silently TRUNCATES over-width values — ADVICE r05 #3): one
    bounded max-length aggregate picks the width, so 'UNITED
    KINGDOM'-length names roundtrip byte-exactly too."""
    from aws_datalake_spark.sources.readers import read_fixed_width

    n = t(spark, sf_dir, "nation")
    max_len = n.agg(F.max(F.length("n_name")).alias("w")).collect()[0]["w"]
    name_w = max(12, int(max_len or 1))
    tmp = scratch_dir(prefix="fixed_width_")
    n.select(
        F.concat(
            F.rpad(F.col("n_nationkey").cast("string"), 6, " "),
            F.rpad(F.col("n_name"), name_w, " "),
            F.rpad(F.col("n_regionkey").cast("string"), 4, " "),
        ).alias("value")
    ).write.mode("overwrite").text(tmp)
    return read_fixed_width(
        spark,
        tmp,
        [
            ("n_nationkey", 1, 6, "int"),
            ("n_name", 7, name_w, "string"),
            ("n_regionkey", 7 + name_w, 4, "int"),
        ],
    )


# ---------------------------------------------------------------------------
# watermark late-data semantics (batch twin)
# ---------------------------------------------------------------------------


@query(
    "st_late_data_drop",
    oracle="""
    WITH m AS (SELECT MAX(ts) AS mx FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events, m
    WHERE ts >= mx - INTERVAL 3 DAY
    GROUP BY event_type
    """,
)
def st_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP, batch twin
    (streaming/windows.py:drop_late_events): Structured Streaming
    discards rows older than max(event time) − delay before they
    reach stateful operators; the batch replay keeps ts ≥ max(ts) −
    3 days and aggregates the survivors. The max is a one-row
    broadcast — the events side is filter-only, no data-row shuffle
    before the final per-type aggregate."""
    from aws_datalake_spark.streaming.windows import drop_late_events

    ev = t(spark, sf_dir, "events")
    return (
        drop_late_events(ev, delay="3 days")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC bars
# ---------------------------------------------------------------------------


@query(
    "st_ohlc_bars",
    oracle="""
    WITH x AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_start,
             event_type, value, ts, event_id
      FROM events
    ), w AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY bar_start, event_type
                           ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY bar_start, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM x
    )
    SELECT bar_start, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM w GROUP BY bar_start, event_type
    """,
)
def st_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-series downsampling per (hour bar, event_type)
    (streaming/windows.py:ohlc_bars): open/close are exact
    first/last by (ts, event_id) via min_by/max_by — ONE hash
    aggregate, map-side combinable, no window sort. The oracle pays
    two ranking windows for the same answer; at 100 TB the agg form
    is the only one that avoids a per-bar sort of every tick."""
    from aws_datalake_spark.streaming.windows import ohlc_bars

    return ohlc_bars(
        t(spark, sf_dir, "events"), keys=["event_type"], bar="1 hour"
    )


# ---------------------------------------------------------------------------
# MAD robust outlier filter
# ---------------------------------------------------------------------------


@query(
    "llm_length_outliers",
    oracle="""
    WITH med AS (
      SELECT lang, v AS med FROM (
        SELECT lang, n_chars AS v,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
      ) WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    ),
    mad AS (
      SELECT lang, v AS mad FROM (
        SELECT d.lang, ABS(d.n_chars - m.med) AS v,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                                  ORDER BY ABS(d.n_chars - m.med)) AS rn,
               COUNT(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN med m USING (lang)
      ) WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    )
    SELECT d.doc_id, d.lang, d.n_chars, m.med, x.mad
    FROM documents d
    JOIN med m USING (lang) JOIN mad x USING (lang)
    WHERE 2 * ABS(d.n_chars - m.med) > 3 * x.mad
    """,
)
def llm_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier detection per language: median and MAD
    (median absolute deviation) via the no-global-sort by-group
    quantile operator (operators/order_stats.py), flagging docs with
    |len − med| > 1.5·MAD — the robust z-score curation filter that
    survives the heavy-tailed length distributions real corpora have
    (stddev-based cuts don't). The fixture's lengths are uniform (no
    true outliers), so the classic 3·MAD cut selects nothing and the
    driver check would be vacuous; 1.5·MAD deterministically selects
    the distribution tails. The comparison is 2·|dev| > 3·MAD — pure
    integers, no 1.5 float anywhere. Two narrowing passes + two
    broadcast joins; all arithmetic integer-exact."""
    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    med = exact_quantile_by_group(d, "lang", "n_chars", 0.5).select(
        "lang", F.col("quantile").alias("med")
    )
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "__dev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = exact_quantile_by_group(dev, "lang", "__dev", 0.5).select(
        "lang", F.col("quantile").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "lang")
        .where(2 * F.col("__dev") > 3 * F.col("mad"))
        .select("doc_id", "lang", "n_chars", "med", "mad")
    )


# ---------------------------------------------------------------------------
# salted skew join
# ---------------------------------------------------------------------------


@query(
    "q_skew_salted_join",
    oracle="""
    WITH seg AS (
      SELECT c_custkey % 50 AS seg_key,
             CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS DOUBLE)
               / 100.0 AS seg_balance
      FROM customer GROUP BY 1
    )
    SELECT o.o_custkey % 50 AS seg_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue,
           MIN(s.seg_balance) AS seg_balance
    FROM orders o JOIN seg s ON o.o_custkey % 50 = s.seg_key
    GROUP BY 1
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join via SALTING
    (operators/skew.py:salted_join): orders are folded onto 50 hot
    segment keys (each key ~2% of the fact table — the hot-key shape
    that stalls a plain shuffle join on one reducer); the salted join
    spreads every hot key over 16 (key, salt) partitions by
    replicating the 50-row segment side per salt. Result is
    value-identical to the plain join the oracle runs."""
    from aws_datalake_spark.operators.skew import salted_join

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").withColumn(
        "seg_key", F.col("o_custkey") % 50
    )
    seg = (
        c.groupBy((F.col("c_custkey") % 50).alias("seg_key"))
        .agg(dsum("c_acctbal", "seg_balance", scale=2))
    )
    joined = salted_join(o, seg, ["seg_key"], salt_from="o_orderkey")
    return joined.groupBy("seg_key").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue", scale=2),
        F.min("seg_balance").alias("seg_balance"),
    )


# ---------------------------------------------------------------------------
# first/last-touch attribution
# ---------------------------------------------------------------------------


@query(
    "q_attribution_first_last",
    oracle="""
    WITH conv AS (
      SELECT user_id, MIN(ts) AS conv_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pre AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id, c.conv_ts,
        ROW_NUMBER() OVER (PARTITION BY e.user_id
                           ORDER BY e.ts, e.event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY e.user_id
                           ORDER BY e.ts DESC, e.event_id DESC) AS rn_d
      FROM events e JOIN conv c USING (user_id)
      WHERE e.ts < c.conv_ts AND e.event_type <> 'purchase'
    )
    SELECT user_id, MIN(conv_ts) AS conv_ts,
           MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
           MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM pre GROUP BY user_id
    """,
)
def q_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch marketing attribution: per converting user
    (first 'purchase'), attribute to the earliest and the latest
    non-purchase event before conversion. Conversions are one hash
    aggregate; touches re-join on user_id (the natural shuffle key)
    and first/last come from min_by/max_by over the (ts, event_id)
    struct — one aggregate, no ranking windows, deterministic under
    ts ties."""
    ev = t(spark, sf_dir, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    order = F.struct(F.col("ts"), F.col("event_id"))
    pre = ev.join(conv, "user_id").where(
        (F.col("ts") < F.col("conv_ts")) & (F.col("event_type") != "purchase")
    )
    return pre.groupBy("user_id").agg(
        F.min("conv_ts").alias("conv_ts"),
        F.min_by("event_type", order).alias("first_touch"),
        F.max_by("event_type", order).alias("last_touch"),
        F.count(F.lit(1)).alias("n_touches"),
    )


# ---------------------------------------------------------------------------
# exact stratified eval split
# ---------------------------------------------------------------------------

_N_EVAL = 120
_H60_ID = "('0x' || substr(md5('s42' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@query(
    "llm_stratified_eval_split",
    oracle=f"""
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cc
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(cc) AS C FROM c),
    a AS (
      SELECT lang, source, cc,
             (cc * {_N_EVAL}) // C AS base,
             (cc * {_N_EVAL}) % C AS rem
      FROM c, tot
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rk,
             (SELECT {_N_EVAL} - SUM(base) FROM a) AS deficit
      FROM a
    ),
    alloc AS (
      SELECT lang, source,
             LEAST(cc, base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END) AS n_s
      FROM r
    ),
    h AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY {_H60_ID}, doc_id) AS rn
      FROM documents
    )
    SELECT h.doc_id, h.lang, h.source,
           CASE WHEN h.rn <= al.n_s THEN 'eval' ELSE 'train' END AS split
    FROM h JOIN alloc al USING (lang, source)
    """,
)
def llm_stratified_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified eval split by largest-remainder
    apportionment (operators/sampling.py:stratified_eval_split):
    exactly 120 eval docs allocated proportionally across
    (lang, source) strata — every stratum gets ⌊share⌋ or ⌊share⌋+1,
    rare strata can't round to zero twice, and the winners per
    stratum are the smallest content-stable hashes (rerun-stable,
    no RNG). DECIMAL(38,0) products keep the apportionment exact at
    any corpus size."""
    from aws_datalake_spark.operators.sampling import stratified_eval_split

    return stratified_eval_split(
        t(spark, sf_dir, "documents"), n_eval=_N_EVAL
    )
