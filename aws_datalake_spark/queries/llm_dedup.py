"""Deduplication queries (north star): exact, MinHash signatures,
MinHash+LSH pairs, SimHash, n-gram Jaccard — oracle-checked.

Near-dup queries run over a corpus seeded with synthetic
near-duplicates (each doc_id < 60 gets a copy at doc_id+100000 with
one token appended) because the random-word fixture corpus contains
no natural near-dups — both engines build the same seeded corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.operators.dedup import (
    M31,
    affine_params,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from aws_datalake_spark.operators.dedup_cluster import (
    connected_components,
    dedup_representatives,
)
from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_H60 = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"

# Seeded near-dup corpus (SQL side)
_NEARDUP_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' neardupmarker' AS text
  FROM documents WHERE doc_id < 60
"""

# 3-token shingles, distinct, for a corpus CTE named c.
# (indexed list_transform instead of a lateral range() join, which
# DuckDB's range table function does not support)
_SHINGLES = f"""
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(t, (x, i) ->
             CASE WHEN i + 2 <= len(t)
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END)) AS s
    FROM (SELECT doc_id, {_TOKS} AS t FROM c))
  WHERE s IS NOT NULL
"""


def _sig_select(num_hashes: int) -> str:
    """SQL twin of operators/dedup.py:minhash_signature — one base
    60-bit md5 hash per shingle, then the affine family
    (a_k*h + b_k) mod 2^31-1, MIN per doc. Same affine_params, so
    values match Spark bit-for-bit."""
    base = f"({_H60.format(expr='s')}) % {M31}"
    parts = []
    for k in range(num_hashes):
        a, b = affine_params(k)
        parts.append(f"MIN(({a} * ({base}) + {b}) % {M31}) AS sig_{k}")
    return ",\n           ".join(parts)


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") < 60)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" neardupmarker")).alias("text"),
        )
    )
    return d.unionByName(dups)


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY text
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, min-id representative
    (operators/dedup.py:exact_dedup). Input is the corpus doubled so
    every group provably collapses (n_copies = 2)."""
    d = t(spark, sf_dir, "documents")
    return exact_dedup(d.unionByName(d))


@query(
    "llm_minhash_signature",
    oracle=f"""
    WITH c AS (SELECT doc_id, text FROM documents),
    sh AS ({_SHINGLES})
    SELECT doc_id,
           {_sig_select(4)}
    FROM sh GROUP BY doc_id
    """,
)
def llm_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 hashes shown; operator supports any k)
    over distinct word-trigram shingles — one md5 base hash per
    shingle + affine rehash family, shared bit-for-bit with the
    oracle."""
    d = t(spark, sf_dir, "documents")
    return minhash_signature(d, num_hashes=4)


def _lsh_ctes(threshold: float) -> str:
    """LSH candidate->verified pair CTE chain over a corpus CTE
    named c; terminal CTE is lsh_pairs(id_a, id_b, jaccard)."""
    return f"""
sh AS ({_SHINGLES}),
sig AS (
  SELECT doc_id,
           {_sig_select(8)}
  FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band_id,
         md5(sig_0::VARCHAR || '|' || sig_1::VARCHAR) AS bh FROM sig
  UNION ALL
  SELECT doc_id, 1, md5(sig_2::VARCHAR || '|' || sig_3::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 2, md5(sig_4::VARCHAR || '|' || sig_5::VARCHAR) FROM sig
  UNION ALL
  SELECT doc_id, 3, md5(sig_6::VARCHAR || '|' || sig_7::VARCHAR) FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
com AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  JOIN cand ON cand.id_a = x.doc_id AND cand.id_b = y.doc_id
  GROUP BY x.doc_id, y.doc_id),
lsh_pairs AS (
  SELECT com.id_a, com.id_b,
         ROUND(CAST(n_common AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
  FROM com
  JOIN sizes sa ON sa.doc_id = com.id_a
  JOIN sizes sb ON sb.doc_id = com.id_b
  WHERE CAST(n_common AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {threshold})
"""


_LSH_ORACLE = f"""
WITH c AS ({_NEARDUP_CORPUS}),
{_lsh_ctes(0.5)}
SELECT id_a, id_b, jaccard FROM lsh_pairs
"""


@query("llm_minhash_lsh_pairs", oracle=_LSH_ORACLE)
def llm_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection end-to-end: signature → band →
    bucket join → candidate pairs → exact-Jaccard verification
    (operators/dedup.py:minhash_lsh_pairs). The oracle replicates
    the banding exactly, so even LSH's misses must match."""
    corpus = _neardup_corpus(spark, sf_dir)
    return minhash_lsh_pairs(corpus, num_hashes=8, bands=4, jaccard_threshold=0.5)


@query(
    "llm_ngram_jaccard_pairs",
    oracle=f"""
    WITH c AS ({_NEARDUP_CORPUS}),
    sh AS ({_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    com AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id)
    SELECT id_a, id_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
    FROM com JOIN sizes sa ON sa.doc_id = id_a
             JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(CAST(n_common AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) >= 0.2
    """,
)
def llm_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via the inverted shingle
    index (no LSH approximation) — this registered query IS the
    TRUTH PATH (operators/dedup.py:ngram_jaccard_pairs): it verifies
    the LSH/minhash production detectors and the llm_lsh_recall_curve
    eval. Its cost is genuinely Σ_gram df²/2 candidates, quadratic
    when every gram is hot (the dense-vocab fixture makes that total
    — the adjudicated 1.24 sf1 exponent in SCALE.md), so it is
    EXCLUDED from the scaling-exponent gate by design. At 100 TB run
    the truth side on a sampled panel (deterministic doc_id hash
    sample, like llm_lsh_recall_curve's seeded panel); the
    production-bounded path is the max_df-capped twin registered as
    llm_ngram_jaccard_capped."""
    corpus = _neardup_corpus(spark, sf_dir)
    return ngram_jaccard_pairs(corpus, threshold=0.2)


_CAP_DF = 40  # stop-gram cap for the production-bounded twin


@query(
    "llm_ngram_jaccard_capped",
    oracle=f"""
    WITH c AS ({_NEARDUP_CORPUS}),
    sh AS ({_SHINGLES}),
    freq AS (SELECT s, COUNT(*) AS f FROM sh GROUP BY 1),
    rare AS (
      SELECT doc_id, sh.s FROM sh JOIN freq ON freq.s = sh.s
      WHERE freq.f <= {_CAP_DF}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    com AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2)
    SELECT com.id_a, com.id_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
    FROM com
    JOIN cand ON cand.id_a = com.id_a AND cand.id_b = com.id_b
    JOIN sizes sa ON sa.doc_id = com.id_a
    JOIN sizes sb ON sb.doc_id = com.id_b
    WHERE ROUND(CAST(n_common AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) >= 0.2
    """,
)
def llm_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-BOUNDED n-gram-Jaccard near-dup pairs: candidates
    come only from grams with document frequency ≤ max_df (stop-gram
    cap — per-gram candidate work bounded at K²/2 instead of the
    truth path's unbounded df²/2), then every candidate is verified
    EXACTLY on the full shingle arrays, so surviving pairs carry the
    same exact jaccard as llm_ngram_jaccard_pairs. This is the
    headline path to run corpus-wide at 100 TB; the documented
    recall caveat (a qualifying pair whose EVERY shared gram is
    hotter than K is missed) is pinned by
    test_dedup.py::test_ngram_jaccard_max_df_prunes_hot_grams_keeps_rare_pairs
    (VERDICT r05 item 5)."""
    corpus = _neardup_corpus(spark, sf_dir)
    return ngram_jaccard_pairs(corpus, threshold=0.2, max_df=_CAP_DF)


_SIMHASH_SQL = f"""
  SELECT doc_id, CAST(SUM(bit_val) AS BIGINT) AS simhash FROM (
    SELECT doc_id, bit,
           CASE WHEN SUM(contrib) > 0
                THEN (1::BIGINT << bit) ELSE 0::BIGINT END AS bit_val
    FROM (
      SELECT tc.doc_id, gs.bit,
             CASE WHEN ((('0x' || substr(md5(tc.w), 1, 15))::BIGINT >> gs.bit) & 1) = 1
                  THEN tc.cnt ELSE -tc.cnt END AS contrib
      FROM (SELECT doc_id, w, COUNT(*) AS cnt FROM
              (SELECT doc_id, unnest({_TOKS}) AS w FROM c)
            GROUP BY doc_id, w) tc,
           (SELECT unnest(range(0, 32)) AS bit) gs)
    GROUP BY doc_id, bit)
  GROUP BY doc_id
"""


@query(
    "llm_simhash",
    oracle=f"""
    WITH c AS (SELECT doc_id, text FROM documents)
    {_SIMHASH_SQL}
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-weighted 32-bit SimHash per document
    (operators/dedup.py:simhash)."""
    return simhash(t(spark, sf_dir, "documents"))


@query(
    "llm_simhash_neardup",
    oracle=f"""
    WITH c AS ({_NEARDUP_CORPUS}),
    sh AS ({_SIMHASH_SQL}),
    sliced AS (
      SELECT doc_id, simhash, sl AS slice_id,
             (simhash >> (sl * 8)) & 255 AS slice_val
      FROM sh, (SELECT unnest(range(0, 4)) AS sl)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM sliced a JOIN sliced b
        ON a.slice_id = b.slice_id AND a.slice_val = b.slice_val
       AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def llm_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 8-bit slice banding for candidates,
    popcount-of-XOR verification ≤ 3 bits
    (operators/dedup.py:simhash_neardup_pairs)."""
    corpus = _neardup_corpus(spark, sf_dir)
    out = simhash_neardup_pairs(corpus, bits=32, max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("int"))


# --- dedup-cluster resolution (connected components) ----------------
# Corpus seeded with TWO near-copies per doc_id < 40 so components
# have >= 3 nodes and min-label must actually propagate.

_CLUSTER_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' neardupmarker'
  FROM documents WHERE doc_id < 40
  UNION ALL
  SELECT doc_id + 200000, text || ' neardupmarker neardupmarker'
  FROM documents WHERE doc_id < 40
"""

_CLUSTER_PAIRS = f"""
{_lsh_ctes(0.5)},
edges AS (
  SELECT id_a AS s, id_b AS d FROM lsh_pairs
  UNION SELECT id_b, id_a FROM lsh_pairs),
walk(node, label) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.node),
comp AS (SELECT node, MIN(label) AS cluster_id FROM walk GROUP BY node)
"""

def _cluster_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    parts = [d]
    for i, marker in ((1, " neardupmarker"), (2, " neardupmarker neardupmarker")):
        parts.append(
            d.filter(F.col("doc_id") < 40).select(
                (F.col("doc_id") + 100000 * i).alias("doc_id"),
                F.concat(F.col("text"), F.lit(marker)).alias("text"),
            )
        )
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@query(
    "llm_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE c AS ({_CLUSTER_CORPUS}),
    {_CLUSTER_PAIRS}
    SELECT node AS doc_id, cluster_id FROM comp
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup cluster resolution: MinHash+LSH near-dup pairs
    become edges (the 100 TB path: candidates are band-pruned, never
    all-pairs); iterative min-label propagation groups transitive
    near-dups into components (operators/dedup_cluster.py). Oracle
    twin replicates the banding and runs a recursive CTE over the
    identical edge set."""
    pairs = minhash_lsh_pairs(
        _cluster_corpus(spark, sf_dir), num_hashes=8, bands=4, jaccard_threshold=0.5
    )
    comp = connected_components(pairs)
    return comp.select(F.col("node").alias("doc_id"), "cluster_id")


@query(
    "llm_dedup_keep",
    oracle=f"""
    WITH RECURSIVE c AS ({_CLUSTER_CORPUS}),
    {_CLUSTER_PAIRS}
    SELECT doc_id, text FROM c
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE node != cluster_id)
    """,
)
def llm_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: pairs → components → keep every
    unclustered doc plus each cluster's min-id representative via a
    broadcast anti-join, so the full corpus is never shuffled
    (operators/dedup_cluster.py:dedup_representatives)."""
    corpus = _cluster_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, num_hashes=8, bands=4, jaccard_threshold=0.5)
    comp = connected_components(pairs)
    return dedup_representatives(corpus, comp)


@query(
    "llm_edit_distance_verify",
    oracle=f"""
    WITH c AS ({_NEARDUP_CORPUS}),
    {_lsh_ctes(0.5)}
    SELECT p.id_a, p.id_b,
           levenshtein(a.text, b.text) AS edit_distance,
           ROUND(CAST(levenshtein(a.text, b.text) AS DOUBLE)
                 / CAST(GREATEST(length(a.text), length(b.text), 1) AS DOUBLE), 6)
             AS edit_ratio
    FROM lsh_pairs p
    JOIN c a ON a.doc_id = p.id_a
    JOIN c b ON b.doc_id = p.id_b
    WHERE CAST(levenshtein(a.text, b.text) AS DOUBLE)
          / CAST(GREATEST(length(a.text), length(b.text), 1) AS DOUBLE) <= 0.2
    """,
)
def llm_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic→exact two-stage dedup: MinHash+LSH proposes
    candidates, exact Levenshtein confirms (integer edit distance —
    no approximation in the final verdict). The standard production
    shape: cheap recall stage, expensive precision stage on the
    candidate set only (operators/dedup.py:edit_distance_verify)."""
    from aws_datalake_spark.operators.dedup import edit_distance_verify

    corpus = _neardup_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, num_hashes=8, bands=4, jaccard_threshold=0.5)
    return edit_distance_verify(pairs, corpus, max_ratio=0.2)


@query(
    "llm_incremental_dedup",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
    ), incoming AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id FROM incoming
    WHERE h NOT IN (SELECT h FROM existing)
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: new documents are kept only if
    their content hash is absent from the already-ingested corpus's
    fingerprint table — an anti-join against a hash-only frame, so
    the existing corpus contributes 16 bytes/doc and the incoming
    text never shuffles (hash computed in place, join on the hash).
    Here the even/odd doc_id split stands in for corpus/new-batch."""
    docs = t(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("h")
    )
    return incoming.join(existing, "h", "left_anti").select("doc_id")


@query(
    "llm_train_test_split",
    oracle=f"""
    WITH RECURSIVE c AS ({_CLUSTER_CORPUS}),
    {_CLUSTER_PAIRS},
    keyed AS (
      SELECT c.doc_id,
             CAST(COALESCE(comp.cluster_id, c.doc_id) AS VARCHAR) AS k
      FROM c LEFT JOIN comp ON c.doc_id = comp.node
    ),
    bucketed AS (
      SELECT doc_id,
             FLOOR((CAST(('0x' || substr(md5('s42' || k), 1, 15))::BIGINT
                    % 1000000 AS DOUBLE) / 1000000.0) * 10) AS b
      FROM keyed
    )
    SELECT doc_id,
           CASE WHEN b < 8 THEN 'train'
                WHEN b < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split: near-dup clusters (same LSH edge
    set as llm_dedup_clusters) are split by their cluster
    representative so no near-copy straddles train and test
    (operators/sampling.py:leakage_safe_split)."""
    from aws_datalake_spark.operators.sampling import leakage_safe_split

    docs = _cluster_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, jaccard_threshold=0.5
    )
    return leakage_safe_split(docs.select("doc_id"), pairs)


@query(
    "llm_source_overlap",
    oracle=f"""
    WITH c AS (SELECT source AS src, text FROM documents),
    sh AS (
      SELECT DISTINCT src, {_H60.format(expr='s')} AS h FROM (
        SELECT src,
               unnest(list_transform(t, (x, i) ->
                 CASE WHEN i + 1 <= len(t)
                      THEN t[i] || ' ' || t[i+1] END)) AS s
        FROM (SELECT src, {_TOKS} AS t FROM c))
      WHERE s IS NOT NULL),
    sizes AS (SELECT src, COUNT(*) AS n FROM sh GROUP BY 1),
    com AS (
      SELECT x.src AS source_a, y.src AS source_b, COUNT(*) AS overlap
      FROM sh x JOIN sh y ON x.h = y.h AND x.src < y.src
      GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(overlap AS BIGINT) AS overlap,
           CAST(overlap AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment_a,
           CAST(overlap AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment_b
    FROM com JOIN sizes sa ON sa.src = source_a
             JOIN sizes sb ON sb.src = source_b
    """,
)
def llm_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source bigram overlap/containment matrix
    (operators/dedup.py:source_overlap) — the between-sources
    contamination diagnostic (a repackaged or re-crawled dataset
    shows near-1.0 containment). Grams reduce to hash60 values and
    dedupe per source before the pair join; text never shuffles; at
    100 TB the deterministic gram sample (``sample_mod``) bounds the
    whole thing — ratios stay unbiased."""
    from aws_datalake_spark.operators.dedup import source_overlap

    return source_overlap(t(spark, sf_dir, "documents"), shingle_n=2)


# ---------------------------------------------------------------------------
# dedup eval harness: LSH recall curve vs exact-Jaccard ground truth
# ---------------------------------------------------------------------------

# Graded near-dup corpus: tier 1 = one appended token (j ~ 0.9+),
# tier 2 = 60% token prefix (j ~ 0.6), tier 3 = 30% prefix
# (j ~ 0.3) — so the truth spans deciles and the LSH S-curve has
# something to miss. Both engines build it bit-identically.
_GRADED_CORPUS = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' neardupmarker'
  FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(t[1 : GREATEST(2, (len(t) * 3) // 5)], ' ')
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 60)
  UNION ALL
  SELECT doc_id + 300000,
         array_to_string(t[1 : GREATEST(2, (len(t) * 3) // 10)], ' ')
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 60)
"""

# 8 signatures in 2 bands of 4 (collision prob per band j^4): the
# deliberately-hard banding whose misses the curve measures
_BANDED_2x4 = """
banded AS (
  SELECT doc_id, 0 AS band_id,
         md5(sig_0::VARCHAR || '|' || sig_1::VARCHAR || '|' ||
             sig_2::VARCHAR || '|' || sig_3::VARCHAR) AS bh FROM sig
  UNION ALL
  SELECT doc_id, 1,
         md5(sig_4::VARCHAR || '|' || sig_5::VARCHAR || '|' ||
             sig_6::VARCHAR || '|' || sig_7::VARCHAR) FROM sig)
"""

_LSH_RECALL_ORACLE = f"""
WITH c AS ({_GRADED_CORPUS}),
sh AS ({_SHINGLES}),
sig AS (
  SELECT doc_id,
           {_sig_select(8)}
  FROM sh GROUP BY doc_id),
{_BANDED_2x4.strip()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
comt AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id),
truth AS (
  -- ROUND(j, 6) BEFORE the threshold and the decile so both engines
  -- share the same boundary arithmetic: the Spark side
  -- (ngram_jaccard_pairs) rounds to 6 dp before its >= filter, and a
  -- pair within 5e-7 of a decile/threshold boundary would otherwise
  -- classify differently across engines (ADVICE r05 #1).
  SELECT id_a, id_b,
         ROUND(CAST(n_common AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS j
  FROM comt JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(CAST(n_common AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) >= 0.2),
lsh_pairs AS (
  SELECT t.id_a, t.id_b FROM truth t
  JOIN cand ON cand.id_a = t.id_a AND cand.id_b = t.id_b),
marked AS (
  SELECT LEAST(CAST(FLOOR(t.j * 10) AS BIGINT), 9) AS decile,
         CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END AS found
  FROM truth t LEFT JOIN lsh_pairs l
    ON l.id_a = t.id_a AND l.id_b = t.id_b),
curve AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(found) AS BIGINT) AS n_found
  FROM marked GROUP BY 1)
SELECT decile, n_true, n_found,
       CAST(n_found AS DOUBLE) / n_true AS recall
FROM curve
UNION ALL
SELECT -1 AS decile, CAST(SUM(n_true) AS BIGINT),
       CAST(SUM(n_found) AS BIGINT),
       CAST(SUM(n_found) AS DOUBLE) / SUM(n_true)
FROM curve
"""


def _graded_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _GRADED_CORPUS: three near-dup tiers per seed
    doc (append one token / 60% token prefix / 30% prefix)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = d.filter(F.col("doc_id") < 60)
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def prefix(divisor: int, offset: int) -> DataFrame:
        k = F.greatest(F.lit(2), F.expr(f"(size(__t) * 3) div {divisor}"))
        return (
            seeds.withColumn("__t", toks)
            .select(
                (F.col("doc_id") + offset).alias("doc_id"),
                F.concat_ws(" ", F.slice(F.col("__t"), 1, k)).alias("text"),
            )
        )

    tier1 = seeds.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" neardupmarker")).alias("text"),
    )
    tier2 = prefix(divisor=5, offset=200000)    # 3/5 of tokens
    tier3 = prefix(divisor=10, offset=300000)   # 3/10 of tokens
    return d.unionByName(tier1).unionByName(tier2).unionByName(tier3)


@query("llm_lsh_recall_curve", oracle=_LSH_RECALL_ORACLE)
def llm_lsh_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup eval harness: per-Jaccard-decile recall of the banded
    MinHash-LSH detector against the exact inverted-index ground
    truth — the measured S-curve that tells you whether your (hashes,
    bands) sit where your dedup threshold needs them. The corpus
    seeds three graded near-dup tiers (j ~ 0.9 / 0.6 / 0.3) and the
    banding is the deliberately hard 2 bands x 4 rows (collision
    prob 1-(1-j^4)^2 ~ 0.02 at j=0.3), so the curve has real misses
    at the bottom and saturates at the top. Counts are exact
    integers; recalls are double quotients of exact integers
    (deterministic under any aggregation order). Precision is 1 by
    construction (LSH candidates are exact-verified), so recall IS
    the quality axis. SCALE: the eval join touches only the two pair
    tables; the truth side is the documented inverted-index path —
    at 100 TB run it on a sampled panel exactly like this seeded
    one."""
    corpus = _graded_corpus(spark, sf_dir)
    truth = ngram_jaccard_pairs(corpus, threshold=0.2).select(
        "id_a", "id_b", "jaccard"
    )
    lsh = minhash_lsh_pairs(
        corpus, num_hashes=8, bands=2, jaccard_threshold=0.2
    ).select("id_a", "id_b", F.lit(1).alias("__found"))
    marked = truth.join(lsh, ["id_a", "id_b"], "left").select(
        F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
        .cast("long")
        .alias("decile"),
        F.coalesce("__found", F.lit(0)).alias("found"),
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # the ≤10-row curve feeds both the output union and the overall
    # aggregate — cut it, or the whole truth⋈lsh eval join (and the
    # two pair pipelines above their internal checkpoints) runs twice
    curve = _truncate(
        marked.groupBy("decile").agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum("found").cast("long").alias("n_found"),
        )
    )
    overall = curve.agg(
        F.sum("n_true").alias("__t"), F.sum("n_found").alias("__f")
    ).select(
        F.lit(-1).cast("long").alias("decile"),
        F.col("__t").cast("long").alias("n_true"),
        F.col("__f").cast("long").alias("n_found"),
    )
    out = curve.unionByName(overall)
    return out.select(
        "decile", "n_true", "n_found",
        (F.col("n_found") / F.col("n_true")).alias("recall"),
    )
