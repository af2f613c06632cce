

def test_source_overlap_sampling_deterministic_and_ratio_stable(spark):
    """source_overlap's hash-sampled mode (the 100 TB path) must be
    deterministic across reruns and keep containment ratios close to
    the full computation (unbiased hash sample)."""
    from aws_datalake_spark.operators.dedup import source_overlap

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r.source_a, r.source_b): r for r in source_overlap(d, shingle_n=1).collect()}
    s1 = {(r.source_a, r.source_b): r for r in
          source_overlap(d, shingle_n=1, sample_mod=2).collect()}
    s2 = {(r.source_a, r.source_b): r for r in
          source_overlap(d, shingle_n=1, sample_mod=2).collect()}
    assert {k: (v.overlap, v.containment_a) for k, v in s1.items()} == {
        k: (v.overlap, v.containment_a) for k, v in s2.items()
    }
    # sampled counts shrink; ratios stay in the same ballpark where
    # the pair survives (unigram matrix at sf0.001 is dense: c≈1.0)
    assert s1 and all(v.overlap <= full[k].overlap for k, v in s1.items())
    assert all(abs(v.containment_a - full[k].containment_a) < 0.35 for k, v in s1.items())


def test_source_overlap_text_never_shuffles(spark):
    """Plan gate: the gram pair join runs on 8-byte hash60 values —
    no keyed (hash/range) Exchange may carry the text column. The
    one allowed text-carrying exchange is the roundrobin `spread`
    re-slice (parallelism repair for few-partition inputs — a no-op
    at production partition counts; operators/text.py:spread)."""
    from aws_datalake_spark.operators.dedup import source_overlap

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = source_overlap(d, shingle_n=2)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "roundrobin" not in line.lower():
            assert "text" not in line, line


def test_ngram_jaccard_max_df_prunes_hot_grams_keeps_rare_pairs(spark):
    """Stop-gram cap (r05): candidates come only from grams with
    df <= max_df; verification is exact on full sets. Docs 1/2 share
    RARE grams (pair survives the cap, jaccard exact incl. the hot
    gram); docs 3/4 share ONLY the boilerplate gram (documented
    recall loss: pruned under the cap, present without it)."""
    from aws_datalake_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "x y"  # bigram present in every doc
    rows = [
        (1, "x y a b c d"),
        (2, "x y a b c e"),
        (3, "x y p q"),
        (4, "x y r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(df, shingle_n=2, threshold=0.1).collect()}
    capped = {(r.id_a, r.id_b): r.jaccard
              for r in ngram_jaccard_pairs(
                  df, shingle_n=2, threshold=0.1, max_df=3).collect()}
    assert (1, 2) in capped and capped[(1, 2)] == full[(1, 2)]
    assert (3, 4) in full and (3, 4) not in capped  # only-hot-gram pair
    # surviving pairs' jaccard values match the exact path everywhere
    for k, v in capped.items():
        assert full[k] == v, k


def test_ngram_jaccard_rejects_max_df_with_prefix_filter(spark):
    """max_df and prefix_filter are different candidate-generation
    strategies; asking for both must fail loudly instead of silently
    taking the max_df path (ADVICE r05 #4)."""
    import pytest

    from aws_datalake_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mutually exclusive"):
        ngram_jaccard_pairs(df, max_df=5, prefix_filter=True)
