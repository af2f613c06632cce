"""Graph centrality on edge tables: deterministic fixed-point
PageRank.

PageRank is usually float-iterated, which makes results depend on
partial-aggregation order — fine for ranking, useless for exact
cross-engine verification. This implementation runs the power
iteration entirely in SCALED INTEGER arithmetic (rank values are
int64 at a fixed scale; damping is a rational (85, 100); every
division is integral truncation), so partial sums are
order-independent and a SQL engine computes bit-identical ranks —
the iteration is exactly oracle-checkable, unlike the usual
float-Pregel formulation.

Semantics (per iteration, damping d = num/den):

    rank'(v) = base + Σ_{u→v} (rank(u) · num) div (den · outdeg(u))
    base     = (den − num) · scale div (den · N)

Dangling nodes (no out-edges) leak their mass by default — the
standard simplification; ``redistribute_dangling=True`` adds the
conserving correction (one bounded aggregate + one broadcast scalar
per iteration), still exact-integer and oracle-checkable.

SCALE (100 TB): each iteration is one shuffle join of the edge
table with the N-row rank frame on the source key plus one hash
aggregate on the destination key — the Pregel pattern as plain
DataFrame ops, partition-parallel, bounded state. Lineage is cut
per iteration (`_truncate`: reliable checkpoint when a checkpoint
dir is configured, eager localCheckpoint in local mode) so plan
depth stays constant across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    context_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Undirected co-occurrence edges from an (context, item) table:
    ``(s, d, w)`` with ``s < d`` canonical and ``w`` = the number of
    contexts both items share, kept when ``w >= min_support``.

    SCALE: the self-join fans out per context as C(items, 2) — safe
    when per-context membership is bounded (orders hold ~4 parts at
    any TPC-H scale); for heavy contexts cap membership upstream.
    ``min_support >= 2`` is the standard sparsifier: it drops the
    long tail of single-co-occurrence noise edges and bounds the
    downstream triangle work.
    """
    m = df.select(
        F.col(context_col).alias("__ctx"), F.col(item_col).alias("__item")
    ).distinct()
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, (F.col("a.__ctx") == F.col("b.__ctx"))
               & (F.col("a.__item") < F.col("b.__item")))
        .groupBy(
            F.col("a.__item").alias("s"), F.col("b.__item").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= min_support)
    )


def triangle_counts(edges: DataFrame, src: str = "s", dst: str = "d") -> DataFrame:
    """Per-node triangle counts and degrees over an undirected simple
    graph (edges canonical ``src < dst``, no parallel edges):
    ``(node, degree, triangles)`` for every node of degree >= 1.

    Degree-ordered orientation (Suri & Vassilvitskii, WWW 2011 —
    "Counting triangles and the curse of the last reducer"): each
    edge points from its lower-(degree, id) endpoint to the higher
    one, so every out-neighborhood has O(sqrt(m)) size and the wedge
    join below is m^1.5 worst-case TOTAL work, evenly partitioned —
    no hub node ever owns a quadratic reducer. Each triangle is then
    found exactly once: its (deg, id)-minimal vertex emits the wedge
    and one hash join against the oriented edge set confirms the
    closing edge. Three shuffles total (degree agg, wedge self-join,
    closing join) — all plain equi hash joins, no nested loop.

    Determinism: counts are exact integers; cross-engine
    oracle-checkable (same orientation rule is plain SQL).

    The edge frame is materialized once up front (`_truncate`:
    reliable checkpoint when configured, eager localCheckpoint in
    local mode): it is referenced by the degree aggregate, both
    orientation join sides, and the closing-edge probe — without the
    cut, an expensive upstream builder (e.g. the co-occurrence
    self-join) re-executes for every reference.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    e = _truncate(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    # deg feeds the orientation (twice) and the final join-back; the
    # oriented edge set feeds both wedge sides and the closing probe —
    # cut both, or the degree aggregate re-executes 4x and the
    # orientation joins 3x (the r10 plan showed 100 Exchange refs
    # from exactly this duplication)
    deg = _truncate(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ds = deg.select(F.col("node").alias("s"), F.col("degree").alias("__degs"))
    dd = deg.select(F.col("node").alias("d"), F.col("degree").alias("__degd"))
    # orient low (degree, id) -> high (degree, id)
    ordered = e.join(ds, "s").join(dd, "d")
    fwd = (F.col("__degs") < F.col("__degd")) | (
        (F.col("__degs") == F.col("__degd")) & (F.col("s") < F.col("d"))
    )
    o = _truncate(
        ordered.select(
            F.when(fwd, F.col("s")).otherwise(F.col("d")).alias("u"),
            F.when(fwd, F.col("d")).otherwise(F.col("s")).alias("v"),
        )
    )
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
    ).select(
        F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"),
    )
    # the closing edge may be oriented b->c or c->b; wedges emitted
    # with b < c by id, so probe both oriented directions
    closing = o.select(
        F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("b").alias("node")))
        .unionByName(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias("triangles"),
    )


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Ranks after ``iterations`` exact integer power steps:
    ``(node, rank_scaled)`` with Σ rank_scaled ≤ scale (truncation
    and dangling loss only ever shrink mass). Distinct edges are
    assumed (dedupe upstream if parallel edges shouldn't double-
    count).

    ``redistribute_dangling=True`` adds the standard dangling-mass
    correction (what most users expect from "PageRank"): each step,
    the rank held by nodes with no out-edges is summed (one bounded
    aggregate — the dangling node SET is precomputed once) and every
    node receives ``(dangling · num) div (den · N)`` — one broadcast
    scalar crossJoin per iteration, still exact integer arithmetic,
    so the conserving variant stays oracle-checkable. Mass is then
    conserved up to integral-truncation dust: per step the loss is
    < E + 3N units of 1/scale, so Σ rank_scaled / scale → 1 at any
    real scale (asserted in tests)."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    # materialize the edge frame ONCE (the §16 triangle-counting
    # lesson): without this the caller's edge lineage — typically a
    # fact-fact join + distinct — re-executes inside every power
    # iteration (measured 5× re-scan of lineitem⋈orders at sf0.1,
    # PERF §26)
    from aws_datalake_spark.operators.dedup_cluster import _truncate as _tr

    e = _tr(edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst")))
    nodes = _truncate(
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    outdeg = _truncate(
        e.groupBy(F.col("__src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
    )
    n_nodes = nodes.count()
    init = scale // n_nodes
    base = (den - num) * scale // (den * n_nodes)
    dangling = (
        _truncate(nodes.join(outdeg, "node", "left_anti"))
        if redistribute_dangling
        else None
    )
    # outdeg is loop-invariant: attach the per-edge divisor den·outdeg
    # ONCE before the loop instead of re-joining outdeg every step
    # (one join + one broadcast build per iteration saved)
    ew = _truncate(
        e.join(outdeg.withColumnRenamed("node", "__src"), "__src").select(
            "__src", "__dst",
            (F.lit(den).cast("long") * F.col("outdeg")).alias("__d"),
        )
    )
    rank = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(rank.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"(rank * {num}) div __d").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        new_rank = nodes.join(contrib, "node", "left")
        if dangling is not None:
            dang_mass = (
                rank.join(dangling, "node", "left_semi")
                .agg(
                    F.coalesce(F.sum("rank"), F.lit(0))
                    .cast("long")
                    .alias("__dm")
                )
            )
            share = F.expr(f"(__dm * {num}) div ({den}L * {n_nodes})")
            new_rank = new_rank.crossJoin(F.broadcast(dang_mass)).select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                    + share
                ).alias("rank"),
            )
        else:
            new_rank = new_rank.select(
                "node",
                (F.lit(base).cast("long")
                 + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                 ).alias("rank"),
            )
        rank = _truncate(new_rank)
    return rank.select("node", F.col("rank").alias("rank_scaled"))


def pagerank_keyed(
    edges: DataFrame,
    nodes: DataFrame,
    key: str = "key",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**9,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """PageRank run independently inside EVERY key group at once —
    millions of small graphs in one distributed plan (TextRank over
    per-document sentence graphs is the canonical use). Same exact
    scaled-integer semantics as :func:`pagerank_fixed_point`
    (dangling mass leaks — the TextRank simplification), but every
    scalar that was a driver value there (node count N, init, base)
    becomes a per-key COLUMN here: no ``count()``, no broadcast
    scalar, nothing driver-side at all.

    ``nodes`` must list every (key, node) vertex — including
    isolated ones, which hold their base rank; ``edges`` must be
    distinct (key, src, dst) rows.

    SCALE: per iteration, one join of edges with the rank frame on
    (key, src) and one aggregate on (key, dst) — both hash-partition
    by the SAME compound key, so AQE coalesces them into co-located
    exchanges; state is |vertices| rows regardless of iteration
    count, and lineage is cut per step. Never a per-key collect or a
    driver loop over keys.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    e = edges.select(
        F.col(key).alias("__k"), F.col(src).alias("__src"), F.col(dst).alias("__dst")
    )
    node_col = next(c for c in nodes.columns if c != key)
    v = _truncate(
        nodes.select(F.col(key).alias("__k"), F.col(node_col).alias("node"))
    )
    counts = v.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"))
    v = _truncate(
        v.join(counts, "__k").select(
            "__k",
            "node",
            F.expr(f"{scale}L div __n").alias("__init"),
            F.expr(f"{(den - num) * scale}L div ({den}L * __n)").alias("__base"),
        )
    )
    outdeg = _truncate(
        e.groupBy("__k", F.col("__src").alias("node")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
    )
    rank = v.select("__k", "node", F.col("__init").cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(
                rank.withColumnRenamed("node", "__src"),
                ["__k", "__src"],
            )
            .join(
                outdeg.withColumnRenamed("node", "__src"),
                ["__k", "__src"],
            )
            .select(
                "__k",
                F.col("__dst").alias("node"),
                F.expr(f"(rank * {num}) div ({den}L * outdeg)").alias("__c"),
            )
            .groupBy("__k", "node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = _truncate(
            v.join(contrib, ["__k", "node"], "left").select(
                "__k",
                "node",
                (
                    F.col("__base").cast("long")
                    + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                ).alias("rank"),
            )
        )
    return rank.select(
        F.col("__k").alias(key), "node", F.col("rank").alias("rank_scaled")
    )


def hits_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) after
    ``iterations`` exact integer power steps: ``(side, node,
    score_scaled)`` with side ∈ {'hub', 'auth'} — the bipartite
    centrality readout PageRank's single score can't give (who are
    the strong *pointers* vs the strong *pointees*). Distinct edges
    assumed (dedupe upstream).

    Float HITS normalizes by the L2 norm — order-dependent and
    never cross-engine exact. This implementation normalizes each
    half-step by the L1 SUM instead (same fixed point direction,
    standard variant): raw scores are exact DECIMAL(38,0) sums of
    int64 scores, and the normalization ``raw·scale div Σraw`` is a
    single 128-bit integral division both engines truncate
    identically — the iteration hash-matches a chained-CTE oracle.

    SCALE (100 TB): per half-step one shuffle join of the edge table
    with the bounded score frame + one hash aggregate — the Pregel
    shape, same as pagerank_fixed_point; the L1 total is one bounded
    aggregate broadcast back (scalar crossJoin). Lineage cut per
    iteration. Headroom: Σraw ≤ E·scale ≈ 10³¹ at a trillion edges —
    well inside DECIMAL(38,0).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    if iterations < 1:  # auth is built inside the loop (ADVICE r07)
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = _truncate(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    )

    def _normalize(raw: DataFrame) -> DataFrame:
        tot = raw.agg(F.sum("__raw").alias("__tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            F.expr(f"CAST((__raw * {scale}) DIV __tot AS BIGINT)").alias(
                "score"
            ),
        )

    hub = e.select(F.col("__src").alias("node")).distinct().select(
        "node", F.lit(scale).cast("long").alias("score")
    )
    auth = None
    dec_score = F.col("score").cast("decimal(38,0)")
    for _ in range(iterations):
        auth = _truncate(
            _normalize(
                e.join(hub.withColumnRenamed("node", "__src"), "__src")
                .groupBy(F.col("__dst").alias("node"))
                .agg(F.sum(dec_score).alias("__raw"))
            )
        )
        hub = _truncate(
            _normalize(
                e.join(auth.withColumnRenamed("node", "__dst"), "__dst")
                .groupBy(F.col("__src").alias("node"))
                .agg(F.sum(dec_score).alias("__raw"))
            )
        )
    return hub.select(
        F.lit("hub").alias("side"), "node", F.col("score").alias("score_scaled")
    ).unionByName(
        auth.select(
            F.lit("auth").alias("side"),
            "node",
            F.col("score").alias("score_scaled"),
        )
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "s", dst: str = "d"
) -> DataFrame:
    """Local clustering coefficient per node over an undirected
    simple graph: ``(node, degree, triangles, cc)`` with
    cc = 2·T / (d·(d−1)) — how close each node's neighborhood is to
    a clique (community tightness, spam-ring detection). Nodes of
    degree < 2 get cc NULL (undefined).

    Exact integer T and d come from :func:`triangle_counts`
    (degree-ordered orientation, m^1.5 total wedge work); the
    coefficient is ONE correctly-rounded IEEE divide of exact longs
    — hash-checkable cross-engine like every stat in this module.
    """
    tc = triangle_counts(edges, src=src, dst=dst)
    cc = F.when(
        F.col("degree") >= 2,
        F.round(
            (2.0 * F.col("triangles").cast("double"))
            / (
                F.col("degree").cast("double")
                * (F.col("degree").cast("double") - 1.0)
            ),
            6,
        ),
    )
    return tc.select("node", "degree", "triangles", cc.alias("cc"))


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """k-core peeling after a FIXED number of rounds: repeatedly drop
    nodes of degree < k (and their edges), ``rounds`` times, then
    report the surviving subgraph's ``(node, degree, converged)`` —
    the dense-backbone extraction (spam rings, co-purchase cores,
    collaboration kernels). A fixed round count keeps the iteration
    exactly oracle-checkable (the PageRank/HITS discipline);
    ``converged`` is computed from the RESULT, not the loop — true
    iff no surviving node still has degree < k — so a short round
    budget is reported honestly instead of silently wrong.

    SCALE: each round is one degree aggregate + two semi-joins on
    the shrinking edge frame (keys only — the keep-set is node ids);
    lineage cut per round. Exact integer degrees; the converged flag
    is one bounded aggregate broadcast back.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    e = _truncate(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    )

    def _degrees(ef: DataFrame) -> DataFrame:
        return (
            ef.select(F.col("__s").alias("node"))
            .unionByName(ef.select(F.col("__d").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    for _ in range(rounds):
        keep = _degrees(e).where(F.col("degree") >= k).select("node")
        e = _truncate(
            e.join(keep.withColumnRenamed("node", "__s"), "__s", "left_semi")
            .join(keep.withColumnRenamed("node", "__d"), "__d", "left_semi")
        )
    final = _truncate(_degrees(e))
    not_done = final.agg(
        F.sum((F.col("degree") < k).cast("int")).alias("__bad")
    )
    return final.crossJoin(F.broadcast(not_done)).select(
        "node",
        "degree",
        (F.coalesce(F.col("__bad"), F.lit(0)) == 0).alias("converged"),
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    et al. 2007) with a DETERMINISTIC tie-break: every node starts
    as its own label; each round it adopts the most frequent label
    among its neighbors, ties broken by MINIMUM label. Synchronous
    updates + total tie order make the iteration exactly
    reproducible — and therefore oracle-checkable as chained CTEs
    (float-free; the usual random-order LPA never is). Returns
    ``(node, label)`` after ``iterations`` rounds.

    Complements dedup_cluster's min-label CONNECTED components:
    LPA splits a connected graph into dense communities; CC only
    finds reachability classes.

    SCALE: per round one join of the bidirectional edge list with
    the node-label frame + one (node, label) count + one
    node-partitioned ranking window over the per-node label counts
    (bounded by each node's distinct neighbor labels). Lineage cut
    per round.
    """
    from pyspark.sql import Window
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    e = edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
    bi = _truncate(
        e.unionByName(
            e.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
        ).distinct()
    )
    lab = bi.select(F.col("__a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("__a").orderBy(F.desc("__cnt"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            bi.join(lab.withColumnRenamed("node", "__b"), "__b")
            .groupBy("__a", "label")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        lab = _truncate(
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col("__a").alias("node"), "label")
        )
    return lab


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over canonical (s < d) edges:
    ``(s, d, support)`` for EVERY input edge (support 0 included).
    Degree-ordered orientation keeps the wedge join m^1.5 total
    (the triangle_counts bound); each triangle then credits its
    three edges via one explode + count."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # deg is read twice by the orientation; the oriented set feeds
    # both wedge sides and the closing probe — cut both so each
    # support pass runs the degree aggregate and orientation joins
    # ONCE (ktruss calls this per peel round)
    deg = _truncate(
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ds = deg.select(F.col("node").alias("s"), F.col("degree").alias("__degs"))
    dd = deg.select(F.col("node").alias("d"), F.col("degree").alias("__degd"))
    ordered = e.join(ds, "s").join(dd, "d")
    fwd = (F.col("__degs") < F.col("__degd")) | (
        (F.col("__degs") == F.col("__degd")) & (F.col("s") < F.col("d"))
    )
    o = _truncate(
        ordered.select(
            F.when(fwd, F.col("s")).otherwise(F.col("d")).alias("u"),
            F.when(fwd, F.col("d")).otherwise(F.col("s")).alias("v"),
        )
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
    ).select(
        F.col("e1.u").alias("a"),
        F.col("e1.v").alias("b"),
        F.col("e2.v").alias("c"),
    )
    closing = o.select(
        F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"])
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d")
                ),
                F.struct(
                    F.least("a", "c").alias("s"), F.greatest("a", "c").alias("d")
                ),
                F.struct(
                    F.least("b", "c").alias("s"), F.greatest("b", "c").alias("d")
                ),
            )
        ).alias("__e")
    ).select(F.col("__e.s").alias("s"), F.col("__e.d").alias("d"))
    sup = tri_edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("support"))
    return e.join(sup, ["s", "d"], "left").select(
        "s",
        "d",
        F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"),
    )


def ktruss_peel(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """k-truss peeling after a FIXED number of rounds: repeatedly
    drop edges in fewer than k−2 triangles, ``rounds`` times —
    the EDGE-level dense-backbone (stricter than k-core: an edge
    survives only inside overlapping triangles; Cohen 2008). Returns
    the surviving edges ``(s, d, support, converged)`` with the
    support recomputed on the final subgraph and the
    RESULT-derived certificate converged ⇔ every surviving edge
    already meets support ≥ k−2 (the kcore_peel honesty rule).

    SCALE: each round is one degree-ordered triangle enumeration
    (m^1.5 total wedge work, no hub hot spot) + one edge filter on
    the shrinking frame; lineage cut per round. Exact integer
    supports — chained-CTE oracle-checkable.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # Canonicalize on entry (ADVICE r07): _edge_support assumes distinct
    # s < d edges — a reversed or duplicated edge would silently get
    # support 0 on the join-back and be peeled away. least/greatest +
    # distinct (self-loops dropped: never in a triangle) makes the
    # precondition a guarantee; one cheap exchange next to the m^1.5
    # wedge work.
    e = _truncate(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("d"),
        )
        .where(F.col("s") < F.col("d"))
        .distinct()
    )
    for _ in range(rounds):
        e = _truncate(
            _edge_support(e)
            .where(F.col("support") >= k - 2)
            .select("s", "d")
        )
    # final is consumed by the certificate aggregate AND the output —
    # without a cut the triangle enumeration runs twice
    final = _truncate(_edge_support(e))
    bad = final.agg(
        F.sum((F.col("support") < k - 2).cast("int")).alias("__bad")
    )
    return final.crossJoin(F.broadcast(bad)).select(
        "s",
        "d",
        "support",
        (F.coalesce(F.col("__bad"), F.lit(0)) == 0).alias("converged"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: the restart mass
    lands ONLY on the ``seeds`` node set (one ``node`` column), so
    ranks measure proximity TO the seeds — "which customers does
    nation X's supplier pool actually reach", recommendation
    neighborhoods, trust propagation. Same exact scaled-integer
    discipline as :func:`pagerank_fixed_point`: per step

        rank'(v) = base·[v ∈ S] + Σ_{u→v} (rank(u)·num) div (den·outdeg(u))
        base     = (den − num)·scale div (den·|S|),

    init = the restart distribution (scale div |S| on seeds, 0
    elsewhere) — every quantity an exact integer, hash-matching a
    chained-CTE oracle.

    SCALE: identical Pregel shape (one edge⋈rank join + one dst
    aggregate per step, lineage cut); the seed set joins in as a
    keys-only frame. The only driver scalar is |S|.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    e = _truncate(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    )
    nodes = _truncate(
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    seed_nodes = _truncate(
        nodes.join(seeds.select("node").distinct(), "node", "left_semi")
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("no seed node appears in the graph")
    outdeg = _truncate(
        e.groupBy(F.col("__src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
    )
    init = scale // n_seeds
    base = (den - num) * scale // (den * n_seeds)
    is_seed = F.col("__seed").isNotNull()
    marked = nodes.join(
        seed_nodes.select(F.col("node"), F.lit(1).alias("__seed")),
        "node",
        "left",
    )
    rank = marked.select(
        "node",
        F.when(is_seed, F.lit(init)).otherwise(F.lit(0)).cast("long").alias(
            "rank"
        ),
    )
    # loop-invariant divisor attached once (see pagerank_fixed_point)
    ew = _truncate(
        e.join(outdeg.withColumnRenamed("node", "__src"), "__src").select(
            "__src", "__dst",
            (F.lit(den).cast("long") * F.col("outdeg")).alias("__d"),
        )
    )
    for _ in range(iterations):
        contrib = (
            ew.join(rank.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"(rank * {num}) div __d").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = _truncate(
            marked.join(contrib, "node", "left").select(
                "node",
                (
                    F.when(is_seed, F.lit(base)).otherwise(F.lit(0)).cast(
                        "long"
                    )
                    + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                ).alias("rank"),
            )
        )
    return rank.select("node", F.col("rank").alias("rank_scaled"))


def degree_assortativity(
    edges: DataFrame, src: str = "s", dst: str = "d"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all edge ends — one row
    ``(m_edges, r)``. Positive r = hubs attach to hubs (social
    cores); negative = hub-and-spoke (dependency graphs). Assumes
    distinct undirected edges (canonical s < d).

    EXACTNESS: over the symmetrized end list (each edge contributes
    (deg_s,deg_d) AND (deg_d,deg_s)) the x and y marginals coincide,
    so r = (M·Σxy − Sx²)/(M·Σx² − Sx²) with M = 2m and every sum an
    exact DECIMAL(38,0) of int64 per-row products (degrees ≤ 2^31
    leave headroom); one correctly-rounded divide.

    SCALE: one degree aggregate + two broadcast-sized joins of the
    edge list against the degree table + one map-combinable moment
    aggregate. No windows, no iteration.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # e is read by the degree aggregate (2x via the union) and the
    # ends join — cut it so an expensive upstream builder runs once
    e = _truncate(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ends = (
        e.join(deg.withColumnRenamed("node", "s"), "s")
        .withColumnRenamed("deg", "__dx")
        .join(
            deg.select(F.col("node").alias("d"), F.col("deg").alias("__dy")),
            "d",
        )
    )
    # symmetrize via moment algebra instead of a 2× union: over both
    # orientations Σx = Σy = Σ(dx+dy), Σx² = Σy² = Σ(dx²+dy²),
    # Σxy = 2Σ dx·dy, M = 2m
    agg = ends.agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(dec(F.col("__dx")) + dec(F.col("__dy"))).alias("__sx"),
        F.sum(
            dec(F.col("__dx")) * dec(F.col("__dx"))
            + dec(F.col("__dy")) * dec(F.col("__dy"))
        ).alias("__sxx"),
        F.sum(dec(F.col("__dx")) * dec(F.col("__dy"))).alias("__sxy"),
    )
    m2 = dec(F.col("__m")) * dec(F.lit(2))
    num = (m2 * dec(F.lit(2)) * F.col("__sxy") - F.col("__sx") * F.col("__sx"))
    den = (m2 * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
    return agg.select(
        F.col("__m").cast("long").alias("m_edges"),
        F.when(
            den.cast("double") > 0.0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("r"),
    )


def common_neighbor_candidates(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 1000,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Link prediction by common-neighbor count: the top-``k``
    NON-adjacent pairs ranked by shared neighbors, with the Jaccard
    overlap of their neighborhoods: ``(u, v, cn, deg_u, deg_v,
    jaccard)`` — "which parts are never co-ordered but share the most
    co-order partners" (recommendation candidates, missing-edge
    detection). Assumes distinct canonical (s < d) edges.

    EXACTNESS: cn and degrees are exact integers; jaccard =
    cn/(deg_u + deg_v − cn) is one correctly-rounded divide; the
    top-k tie order is pinned by (cn DESC, u, v).

    SCALE: wedges route through the MIDDLE node, so one hub of degree
    h yields h²/2 candidate pairs — ``max_degree`` caps the routing
    nodes (the max_df device from dedup: drop middles above the cap,
    docstring-documented approximation standard in link prediction at
    scale); the wedge join is then Σ min(deg, cap)² over middles,
    and the anti-join + top-k bound the output.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # e feeds adj (twice via the union), the anti-join, and — through
    # adj — deg and mid; without a cut an expensive upstream edge
    # builder (the co-occurrence self-join) re-executes per reference
    # (the r10 plan held 122 Exchange refs from this). deg and mid
    # are cut too: deg is read by the mid filter and both endpoint
    # joins, mid by both wedge sides.
    e = _truncate(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    adj = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).select(F.col("s").alias("node"), F.col("d").alias("nbr"))
    deg = _truncate(adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    mid = _truncate(
        adj.join(
            deg.where(F.col("deg") <= max_degree), "node"
        ).select("node", "nbr")
    )
    a, b = mid.alias("a"), mid.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.node") == F.col("b.node"))
            & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(
            e.select(F.col("s").alias("u"), F.col("d").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    # Per-u partial top-k BEFORE the global single-partition window
    # (ADVICE r08): the global order restricted to a fixed u is
    # (cn DESC, v), so each u can contribute at most its per-u top-k
    # to the global top-k — the parallel partitioned window prunes the
    # unbounded candidate set down to ≤ k rows per u, and only that
    # bounded frame funnels through the one-partition ranking.
    pruned = cand.withColumn(
        "__pk",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.desc("cn"), F.asc("v"))
        ),
    ).where(F.col("__pk") <= k).drop("__pk")
    ranked = (
        pruned.join(deg.select(F.col("node").alias("u"),
                               F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("node").alias("v"),
                         F.col("deg").alias("deg_v")), "v")
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.orderBy(F.desc("cn"), F.asc("u"), F.asc("v"))
            ),
        )
        .where(F.col("__rk") <= k)
    )
    return ranked.select(
        "u",
        "v",
        F.col("cn").cast("long").alias("cn"),
        F.col("deg_u").cast("long").alias("deg_u"),
        F.col("deg_v").cast("long").alias("deg_v"),
        F.round(
            F.col("cn").cast("double")
            / (F.col("deg_u") + F.col("deg_v") - F.col("cn")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def bfs_layers(
    edges: DataFrame,
    max_hops: int = 4,
    src: str = "s",
    dst: str = "d",
    broadcast_max: int = 100_000,
) -> DataFrame:
    """Breadth-first hop distances from the MINIMUM node id (a pinned,
    data-derived source): ``(hop, n_nodes)`` for hops 0..max_hops —
    the reachability/diameter probe ("how much of the graph is within
    h hops of the anchor"). Unreached nodes are absent.

    EXACTNESS: frontier iteration with an anti-join against the
    visited set computes MIN-hop exactly (a node enters at its first
    reachable level and never re-enters); all integers.

    SCALE: per hop one join of the frontier with the bidirectional
    adjacency list + one distinct + one anti-join — each distributed
    on the node key, no global structure; lineage cut per hop so the
    plan stays O(1) deep. The hop cap bounds total work at
    max_hops · |E| regardless of graph shape. The frontier side of
    the expansion join broadcasts only while its COUNTED size stays
    ≤ ``broadcast_max`` (the count is a local scan of the
    just-checkpointed frontier, not a recompute) — on a dense graph
    whose hop-2 frontier is already most of the node set the join
    falls back to a shuffle instead of shipping it to every executor
    (ADVICE r09: the previous fixed hop≤2 hint was size-blind).
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    bi = _truncate(
        e.unionByName(
            e.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
    )
    source = bi.agg(F.min("s").alias("node"))
    visited = _truncate(
        source.select("node", F.lit(0).cast("int").alias("hop"))
    )
    frontier = visited
    frontier_n = 1  # single pinned source
    for h in range(1, max_hops + 1):
        sel = frontier.select(F.col("node").alias("s"))
        nxt = (
            bi.join(
                sel.hint("broadcast") if frontier_n <= broadcast_max
                else sel,
                "s",
            )
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(h).cast("int").alias("hop"))
        )
        frontier = _truncate(nxt)
        frontier_n = frontier.count()
        visited = _truncate(visited.unionByName(frontier))
    return (
        visited.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("hop").cast("int").alias("hop"), "n_nodes")
    )


def resource_allocation_candidates(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 1000,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009):
    the top-``k`` non-adjacent pairs ranked by RA(u,v) =
    Σ_{z ∈ CN(u,v)} 1/deg(z) — common neighbors weighted by how
    EXCLUSIVE they are (a hub middle contributes almost nothing; a
    degree-2 middle is a strong signal). Returns
    ``(u, v, cn, ra)``.

    EXACTNESS: each term is one correctly-rounded divide of exact
    integers; RA folds in PINNED middle-node order (ordered-list
    reduce), so the double ranking is bit-identical cross-engine.
    Ties break by (u, v).

    SCALE: same wedge routing and bounds as
    common_neighbor_candidates — max_degree caps the middles, a
    per-u partial top-k prunes before the single-partition global
    ranking (the global order restricted to fixed u is (ra, v), so
    per-u top-k is exact).
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # same duplication cuts as common_neighbor_candidates: e feeds
    # adj (2x) + the anti-join, mid feeds both wedge sides
    e = _truncate(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    adj = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).select(F.col("s").alias("node"), F.col("d").alias("nbr"))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    mid = _truncate(
        adj.join(
            deg.where(F.col("deg") <= max_degree), "node"
        ).select("node", "nbr", "deg")
    )
    a, b = mid.alias("a"), mid.alias("b")
    wedges = a.join(
        b,
        (F.col("a.node") == F.col("b.node"))
        & (F.col("a.nbr") < F.col("b.nbr")),
    ).select(
        F.col("a.nbr").alias("u"),
        F.col("b.nbr").alias("v"),
        F.col("a.node").alias("m"),
        (F.lit(1.0) / F.col("a.deg").cast("double")).alias("term"),
    )
    cand = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "term"))),
                    lambda st: st["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("ra"),
        )
        .join(
            e.select(F.col("s").alias("u"), F.col("d").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    pruned = cand.withColumn(
        "__pk",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.desc("ra"), F.asc("v"))
        ),
    ).where(F.col("__pk") <= k).drop("__pk")
    ranked = pruned.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.desc("ra"), F.asc("u"), F.asc("v"))
        ),
    ).where(F.col("__rk") <= k)
    return ranked.select(
        "u", "v", F.col("cn").cast("long").alias("cn"), "ra"
    )


def adamic_adar_candidates(
    edges: DataFrame,
    k: int = 50,
    max_degree: int = 1000,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003): top-``k``
    non-adjacent pairs by AA(u,v) = Σ_{z ∈ CN(u,v)} 1/ln(deg(z)) —
    the log-damped sibling of resource_allocation_candidates (hubs
    are discounted, but gently: 1/ln vs 1/deg). Returns
    ``(u, v, cn, aa)``.

    EXACTNESS: libm ln never enters either engine — the weight
    1/ln(d) is a SHARED LITERAL TABLE over the bounded degree domain
    (2..max_degree, computed once in Python; the Benford-table
    device), broadcast-joined on the middle's degree here and
    inlined as a VALUES list in the SQL twin. AA folds in pinned
    middle order; ties break by (u, v).

    SCALE: identical wedge routing/bounds to
    resource_allocation_candidates; the weight join is a broadcast
    against a ≤max_degree-row dim.
    """
    import math

    from pyspark.sql import Window

    spark = edges.sparkSession
    wtab = spark.createDataFrame(
        [(d, 1.0 / math.log(d)) for d in range(2, max_degree + 1)],
        "deg long, w double",
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # same duplication cuts as common_neighbor_candidates
    e = _truncate(edges.select(F.col(src).alias("s"), F.col(dst).alias("d")))
    adj = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).select(F.col("s").alias("node"), F.col("d").alias("nbr"))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    mid = _truncate(
        adj.join(deg.where(F.col("deg") <= max_degree), "node")
        # middles adjacent to both endpoints have deg >= 2, so the
        # 1/ln(1) pole is unreachable; the join enforces it anyway
        .join(F.broadcast(wtab), "deg")
        .select("node", "nbr", "w")
    )
    a, b = mid.alias("a"), mid.alias("b")
    wedges = a.join(
        b,
        (F.col("a.node") == F.col("b.node"))
        & (F.col("a.nbr") < F.col("b.nbr")),
    ).select(
        F.col("a.nbr").alias("u"),
        F.col("b.nbr").alias("v"),
        F.col("a.node").alias("m"),
        F.col("a.w").alias("term"),
    )
    cand = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "term"))),
                    lambda st: st["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("aa"),
        )
        .join(
            e.select(F.col("s").alias("u"), F.col("d").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    pruned = cand.withColumn(
        "__pk",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.desc("aa"), F.asc("v"))
        ),
    ).where(F.col("__pk") <= k).drop("__pk")
    ranked = pruned.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.desc("aa"), F.asc("u"), F.asc("v"))
        ),
    ).where(F.col("__rk") <= k)
    return ranked.select(
        "u", "v", F.col("cn").cast("long").alias("cn"), "aa"
    )
