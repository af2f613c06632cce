

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
