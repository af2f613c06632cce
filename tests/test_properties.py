"""Property-based equivalence: optimized operators vs naive
formulations on randomized inputs (hypothesis; reference test style
upgraded per SURVEY.md §5)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_datalake_spark.operators.joins import asof_join, bucketed_range_join

_BASE = datetime.datetime(2024, 1, 1)


def _t(minutes: int) -> datetime.datetime:
    return _BASE + datetime.timedelta(minutes=minutes)


events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),  # (user, minute)
    min_size=0, max_size=25,
)


@pytest.mark.slow
@given(left=events, right=events)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_naive(spark_global, left, right):
    spark = spark_global
    ldf = spark.createDataFrame(
        [(i, u, _t(m)) for i, (u, m) in enumerate(left)] or [(0, 0, _t(0))],
        "id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(1000 + i, u, _t(m)) for i, (u, m) in enumerate(right)] or [(999, 99, _t(0))],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        r.id: r.rid_r
        for r in asof_join(ldf, rdf, on="ts", by=["user_id"]).collect()
    }
    rows_l = ldf.collect()
    rows_r = rdf.collect()
    for lr in rows_l:
        cands = [
            rr for rr in rows_r if rr.user_id == lr.user_id and rr.ts <= lr.ts
        ]
        # operator tiebreak: max payload tuple — rid is first payload field
        want = max(cands, key=lambda rr: (rr.ts, rr.rid)).rid if cands else None
        assert got[lr.id] == want


@given(points=events, intervals=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 180)),
    min_size=0, max_size=15,
))
@pytest.mark.slow
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_bucketed_range_join_matches_naive(spark_global, points, intervals):
    spark = spark_global
    pdf = spark.createDataFrame(
        [(i, u, _t(m)) for i, (u, m) in enumerate(points)] or [(0, 0, _t(0))],
        "pid long, user_id long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(100 + i, u, _t(m), _t(m + w)) for i, (u, m, w) in enumerate(intervals)]
        or [(99, 99, _t(0), _t(1))],
        "iid long, user_id long, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(
            pdf, idf, point_ts="ts", start_col="s", end_col="e",
            by=["user_id"], bucket_width_s=1800,
        ).collect()
    )
    want = sorted(
        (p.pid, i.iid)
        for p in pdf.collect()
        for i in idf.collect()
        if p.user_id == i.user_id and i.s <= p.ts <= i.e
    )
    assert got == want


texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40),
    min_size=1, max_size=8,
)


@given(docs=texts, chunk=st.integers(2, 10), overlap=st.integers(0, 5))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_documents_covers_every_token(spark_global, docs, chunk, overlap):
    from aws_datalake_spark.operators.packing import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    df = spark_global.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    for doc_id, text in enumerate(docs):
        toks = text.split()
        chunks = by_doc.get(doc_id, {})
        if not toks:
            assert chunks == {}
            continue
        # chunk ids dense from 0; every chunk matches its slice of the
        # token list; the final chunk reaches the last token
        assert sorted(chunks) == list(range(len(chunks)))
        for cid, ctoks in chunks.items():
            start = cid * stride
            assert ctoks == toks[start : start + chunk]
        last_start = (len(chunks) - 1) * stride
        assert last_start + len(chunks[len(chunks) - 1]) == len(toks)
        # no earlier chunking would have covered: one more full stride
        # would start past the end
        assert len(chunks) == 1 or last_start < len(toks)


rows_kv = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 3)),  # (key, value)
    min_size=0, max_size=12, unique_by=lambda t: t[0],
)


@pytest.mark.slow
@given(old=rows_kv, new=rows_kv)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_snapshot_diff_matches_set_algebra(spark_global, old, new):
    from aws_datalake_spark.operators.cdc import snapshot_diff

    spark = spark_global
    odf = spark.createDataFrame(old or [(99, 0)], "k long, v long")
    ndf = spark.createDataFrame(new or [(99, 0)], "k long, v long")
    old_m = dict(old or [(99, 0)])
    new_m = dict(new or [(99, 0)])
    got = {r.k: r.change_type for r in snapshot_diff(odf, ndf, ["k"]).collect()}
    want = {}
    for k in new_m.keys() - old_m.keys():
        want[k] = "insert"
    for k in old_m.keys() - new_m.keys():
        want[k] = "delete"
    for k in old_m.keys() & new_m.keys():
        if old_m[k] != new_m[k]:
            want[k] = "update"
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=300,
    ),
    q=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_quantile_matches_sorted_list(spark_global, vals, q):
    from aws_datalake_spark.operators.order_stats import exact_quantile

    spark = spark_global
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantile(df, "x", q, n_bins=8, direct_threshold=10)
    assert got == sorted(vals)[int(q * (len(vals) - 1))]


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=300,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_quantiles_multi_matches_sorted_list(spark_global, vals):
    """Shared-pass multi-quantile narrowing must agree with the plain
    sorted-list definition for every edge simultaneously — including
    duplicate values, tiny inputs, and narrowing-forced shapes."""
    from aws_datalake_spark.operators.order_stats import exact_quantiles

    spark = spark_global
    qs = (0.0, 0.25, 0.5, 0.75, 1.0)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(df, "x", qs, n_bins=8, direct_threshold=10)
    sv = sorted(vals)
    assert got == [sv[int(q * (len(vals) - 1))] for q in qs]


@given(
    rows=st.lists(st.integers(0, 8), min_size=1, max_size=200),
    support=st.sampled_from([0.1, 0.25, 0.4]),
)
@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_heavy_hitters_matches_exact_groupby(spark_global, rows, support):
    from collections import Counter

    from aws_datalake_spark.operators.sketches import heavy_hitters

    spark = spark_global
    df = spark.createDataFrame([(f"k{v}",) for v in rows], "token string")
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", support).collect()}
    counts = Counter(f"k{v}" for v in rows)
    expect = {k: c for k, c in counts.items() if c > support * len(rows)}
    assert got == expect


# --- txn table vs dict model --------------------------------------------------

txn_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 3), st.integers(1, 5)),
        st.tuples(st.just("merge"), st.integers(0, 3), st.integers(1, 5)),
        st.tuples(st.just("overwrite"), st.integers(0, 3), st.integers(1, 5)),
        st.tuples(st.just("compact"), st.just(0), st.just(0)),
        st.tuples(st.just("delete_dv"), st.integers(0, 3), st.just(0)),
        st.tuples(st.just("delete_eq"), st.integers(0, 3), st.just(0)),
        st.tuples(st.just("purge_dv"), st.just(0), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow
@given(ops=txn_ops)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_txn_table_matches_dict_model(spark_global, tmp_path_factory, ops):
    """Random append/merge/overwrite/compact/delete-dv/delete-eq/
    purge-dv sequences: the txn
    table's live snapshot must equal a plain dict model (merge keyed
    on k; append multiplies rows; overwrite resets; compact is a
    no-op on content), and every historical version must still
    replay."""
    from pyspark.sql import Row
    from aws_datalake_spark.sources import txn_table as tt

    spark = spark_global
    root = str(tmp_path_factory.mktemp("txnprop") / "t")
    model: list[tuple[int, int]] = []  # (k, v) rows; merges key on k

    def batch(base, n, tag):
        return [(base * 10 + i, tag) for i in range(n)]

    for step, (op, base, n) in enumerate(ops):
        rows = batch(base, n, step)
        df = spark.createDataFrame(
            [Row(k=k, v=v) for k, v in rows] or [Row(k=-1, v=-1)]
        ).coalesce(1)
        if op == "append":
            tt.write(df, root, mode="append")
            model.extend(rows)
        elif op == "overwrite":
            tt.write(df, root, mode="overwrite")
            model = list(rows)
        elif op == "merge":
            if not tt.is_txn_table(root):
                tt.write(df, root, mode="append")
                model.extend(rows)
            else:
                tt.merge_upsert(spark, root, df, keys=["k"])
                keys = {k for k, _ in rows}
                model = [r for r in model if r[0] not in keys] + rows
        elif op == "compact":
            if tt.is_txn_table(root):
                tt.compact(spark, root, target_files=1)
        elif op == "delete_dv":
            # merge-on-read delete of one key-decade; model filters
            if tt.is_txn_table(root):
                tt.delete_where_dv(
                    spark, root, f"k >= {base * 10} AND k < {base * 10 + 10}"
                )
                model = [
                    r for r in model
                    if not (base * 10 <= r[0] < base * 10 + 10)
                ]
        elif op == "delete_eq":
            # equality delete of one key-decade: the dict model drops
            # the rows that exist NOW; later appends of the same keys
            # re-enter — exactly the sequence semantics the table
            # implements with data sequence numbers
            if tt.is_txn_table(root):
                tt.delete_where_eq(
                    spark, root,
                    spark.createDataFrame(
                        [(k,) for k in range(base * 10, base * 10 + 10)],
                        "k long",
                    ),
                )
                model = [
                    r for r in model
                    if not (base * 10 <= r[0] < base * 10 + 10)
                ]
        elif op == "purge_dv":
            if tt.is_txn_table(root):
                tt.purge_dv(spark, root)
    if not tt.is_txn_table(root):
        assert model == []  # only no-op maintenance ran; nothing to read
        return
    got = sorted(
        (r.k, r.v) for r in tt.read(spark, root).collect()
    )
    assert got == sorted(model)
    # every version replays without error and row counts are sane
    for h in tt.history(root):
        assert tt.snapshot(root, h["version"])["version"] == h["version"]


@given(
    pairs=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(1, 20)),
        min_size=1,
        max_size=200,
    ),
    q=st.sampled_from([(0, 1), (1, 4), (1, 2), (9, 10), (1, 1)]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_weighted_quantile_matches_cumsum(spark_global, pairs, q):
    """Weighted quantile == first value whose cumulative weight
    reaches ceil(W * num/den) over the value-sorted list."""
    from aws_datalake_spark.operators.order_stats import exact_weighted_quantile

    num, den = q
    df = spark_global.createDataFrame(pairs, "v long, w long")
    got = exact_weighted_quantile(
        df, "v", "w", num, den, n_bins=8, direct_threshold=10
    )
    total = sum(w for _, w in pairs)
    target = max(1, -((-total * num) // den))
    acc = 0
    for v, w in sorted(pairs):
        acc += w
        if acc >= target:
            assert got == v
            return
    raise AssertionError("unreachable")


@given(
    rows=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
        min_size=2,
        max_size=150,
    ),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_exact_corr_matches_float_formula(spark_global, rows):
    """Integer-moment corr matches the closed-form float computation
    to 1e-9 relative (both zero-variance guards agree exactly)."""
    import math

    from aws_datalake_spark.operators.stats import exact_corr

    df = spark_global.createDataFrame(rows, "x long, y long")
    got = exact_corr(df, F.col("x"), F.col("y")).collect()[0]["corr"]
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    vx = n * sum(x * x for x, _ in rows) - sx * sx
    vy = n * sum(y * y for _, y in rows) - sy * sy
    if vx <= 0 or vy <= 0:
        assert got is None
    else:
        want = (n * sum(x * y for x, y in rows) - sx * sy) / (
            math.sqrt(vx) * math.sqrt(vy)
        )
        assert got == pytest.approx(want, rel=1e-9, abs=1e-12)


# ---------------------------------------------------------------------------
# r09 statistics operators vs naive references
# ---------------------------------------------------------------------------

_groups2 = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(-50, 50)),
    min_size=4,
    max_size=30,
).filter(
    lambda rows: len({g for g, _ in rows}) == 2
    and all(
        sum(1 for g, _ in rows if g == x) >= 2 for x in ("a", "b")
    )
)


@given(rows=_groups2)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_mann_whitney_u_matches_pair_counting(spark_global, rows):
    from aws_datalake_spark.operators.stats import mann_whitney_u

    df = spark_global.createDataFrame(rows, "g string, x long")
    r = mann_whitney_u(df, "g", F.col("x"), "a", "b").collect()[0]
    av = [v for g, v in rows if g == "a"]
    bv = [v for g, v in rows if g == "b"]
    u2 = sum(
        2 if a > b else (1 if a == b else 0) for a in av for b in bv
    )
    assert r.u2 == u2
    assert r.n_a == len(av) and r.n_b == len(bv)


@given(rows=_groups2)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_wasserstein_matches_cdf_integral(spark_global, rows):
    from aws_datalake_spark.operators.stats import wasserstein_1

    df = spark_global.createDataFrame(rows, "g string, x long")
    r = wasserstein_1(df, "g", F.col("x"), "a", "b").collect()[0]
    av = sorted(v for g, v in rows if g == "a")
    bv = sorted(v for g, v in rows if g == "b")

    def cdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    lo, hi = min(av + bv), max(av + bv)
    ref = sum(abs(cdf(av, x) - cdf(bv, x)) for x in range(lo, hi))
    assert r.w1 == pytest.approx(ref, rel=1e-9, abs=1e-12)


@given(rows=_groups2)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_anova_matches_textbook_random(spark_global, rows):
    from aws_datalake_spark.operators.stats import anova_oneway

    df = spark_global.createDataFrame(rows, "g string, x long")
    r = anova_oneway(df, "g", F.col("x")).collect()[0]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2
        for vs in groups.values()
        for v in vs
    )
    assert r.ss_between == pytest.approx(ssb, rel=1e-9, abs=1e-6)
    assert r.ss_within == pytest.approx(ssw, rel=1e-9, abs=1e-6)
    if r.f_stat is not None:
        assert r.f_stat == pytest.approx(
            (ssb / (k - 1)) / (ssw / (n - k)), rel=1e-9
        )
    else:
        assert ssw == pytest.approx(0.0, abs=1e-9)


_units = st.lists(
    st.tuples(st.integers(0, 5), st.integers(1, 1000)),
    min_size=1,
    max_size=20,
)


@given(rows=_units)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_hhi_bounds_and_reference(spark_global, rows):
    from aws_datalake_spark.operators.stats import hhi_concentration

    df = spark_global.createDataFrame(
        [("m", f"u{u}", v) for u, v in rows], "g string, u string, v long"
    )
    r = hhi_concentration(df, "g", "u", F.col("v")).collect()[0]
    per = {}
    for u, v in rows:
        per[u] = per.get(u, 0) + v
    tot = sum(per.values())
    ref = sum((v / tot) ** 2 for v in per.values())
    assert r.hhi == pytest.approx(ref, rel=1e-9)
    assert 1.0 / len(per) - 1e-9 <= r.hhi <= 1.0 + 1e-9


_survival = st.lists(
    st.tuples(st.integers(1, 12), st.integers(0, 1)),
    min_size=2,
    max_size=20,
).filter(lambda rows: any(o == 1 for _, o in rows))


@given(rows=_survival)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_nelson_aalen_matches_naive(spark_global, rows):
    from aws_datalake_spark.operators.stats import nelson_aalen

    df = spark_global.createDataFrame(rows, "dur long, obs int")
    got = {
        r.t: (r.n_risk, r.d_events, r.cum_hazard)
        for r in nelson_aalen(df, "dur", "obs").collect()
    }
    times = sorted({t for t, _ in rows})
    h = 0.0
    for t in times:
        n_risk = sum(1 for d, _ in rows if d >= t)
        d_ev = sum(1 for d, o in rows if d == t and o == 1)
        h += d_ev / n_risk
        if d_ev > 0:
            nr, de, ch = got[t]
            assert (nr, de) == (n_risk, d_ev)
            assert ch == pytest.approx(h, rel=1e-12)


# ---------------------------------------------------------------------------
# r10: Cliff's delta + Adamic-Adar property checks
# ---------------------------------------------------------------------------

_cliffs_rows = st.lists(
    st.tuples(st.sampled_from(["A", "R"]), st.integers(1, 20)),
    min_size=4,
    max_size=40,
).filter(
    lambda rs: len({g for g, _ in rs}) == 2
)


@given(rows=_cliffs_rows)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_cliffs_delta_matches_bruteforce(spark_global, tmp_path_factory, rows):
    """The domain-counting formulation must equal the O(n²) pair
    definition δ = (#(x>y) − #(x<y))/(n_a·n_r) exactly."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_datalake_spark.queries.r10_batch import q_cliffs_delta

    root = tmp_path_factory.mktemp("cliffs")
    df = pd.DataFrame(
        {
            "l_returnflag": [g for g, _ in rows],
            "l_quantity": [float(v) for _, v in rows],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(root / "lineitem.parquet"))
    r = q_cliffs_delta(spark_global, str(root)).collect()[0]
    av = [v for g, v in rows if g == "A"]
    rv = [v for g, v in rows if g == "R"]
    gt = sum(1 for a in av for b in rv if a > b)
    lt = sum(1 for a in av for b in rv if a < b)
    assert (r.gt, r.lt) == (gt, lt)
    assert r.cliffs_delta == (gt - lt) / (len(av) * len(rv))


_aa_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=2,
    max_size=20,
)


@pytest.mark.slow
@given(edges=_aa_edges)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_adamic_adar_matches_bruteforce(spark_global, edges):
    """AA over random small graphs equals the brute-force definition
    (pinned middle-order fold) for every returned pair."""
    import math

    from aws_datalake_spark.operators.graph import adamic_adar_candidates

    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    e = spark_global.createDataFrame(canon, "s long, d long")
    got = adamic_adar_candidates(e, k=100).collect()
    # brute force
    adj: dict[int, set[int]] = {}
    for s, d in canon:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {n: len(v) for n, v in adj.items()}
    for r in got:
        mids = sorted(adj[r.u] & adj[r.v])
        assert (r.u, r.v) not in [(a, b) for a, b in canon]
        assert r.cn == len(mids)
        acc = 0.0
        for m in mids:
            acc += 1.0 / math.log(deg[m])
        assert r.aa == acc
