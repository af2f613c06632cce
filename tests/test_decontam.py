"""Decontamination + duplicate-chunk operators: planted-contamination
detection, short-doc safety, chunk multiplicity semantics."""

from __future__ import annotations

from aws_datalake_spark.operators.decontam import (
    decontaminate,
    duplicate_chunks,
    eval_ngram_set,
)

EVAL_DOC = "the quick brown fox jumps over the lazy dog today"


def test_planted_copy_is_flagged(spark):
    eval_df = spark.createDataFrame([(100, EVAL_DOC)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, EVAL_DOC),  # verbatim eval copy → frac 1.0
            (2, "the quick brown fox sat still and unrelated words follow here"),
            (3, "completely disjoint vocabulary nothing shared at all anywhere"),
            (4, "tiny doc"),  # < n tokens → zero shingles, never flagged
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, eval_df, n=3, threshold=0.5).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].overlap_frac == 1.0 and rows[1].contaminated == 1
    assert rows[2].n_overlap >= 1 and rows[2].contaminated == 0
    assert rows[3].n_overlap == 0 and rows[3].contaminated == 0
    assert rows[4].n_shingles == 0 and rows[4].overlap_frac == 0.0


def test_eval_ngram_set_distinct(spark):
    eval_df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c")], "doc_id long, text string"
    )
    grams = sorted(r["__g"] for r in eval_ngram_set(eval_df, n=3).collect())
    # a b c / b c a / c a b — distinct across repeats AND docs
    assert grams == ["a b c", "b c a", "c a b"]


def test_duplicate_chunks_counts_multiplicity(spark):
    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, f"{shared} tail words here"),
            (2, f"prefix {shared}"),
            (3, f"{shared} {shared}"),  # twice in one doc
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    out = {r.chunk: (r.n_docs, r.n_occurrences) for r in duplicate_chunks(df, k=5).collect()}
    assert out[shared] == (3, 4)
    # every chunk reported must span >= 2 distinct docs
    assert all(nd >= 2 for nd, _ in out.values())


def test_decontaminate_plan_broadcasts_eval_side(spark):
    eval_df = spark.createDataFrame([(1, EVAL_DOC)], "doc_id long, text string")
    corpus = spark.createDataFrame([(2, EVAL_DOC)], "doc_id long, text string")
    plan = decontaminate(corpus, eval_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
