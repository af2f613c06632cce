"""Distributed BPE vs a pure-Python reference implementation."""

from __future__ import annotations

import pytest

from collections import Counter


def _merge_tokens(toks, a, b, new):
    # left-to-right non-overlapping, same as Java replaceAll
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _reference_bpe(texts, num_merges, min_count=2):
    words = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a} {b}"] += n
        pairs = Counter({p: c for p, c in pairs.items() if c >= min_count})
        if not pairs:
            break
        # (count desc, pair asc) — same deterministic tie-break
        pair, count = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = pair.split(" ")
        new = a + b
        merges.append((rank, pair, new, count))
        folded: Counter = Counter()
        for syms, n in vocab.items():
            folded[tuple(_merge_tokens(list(syms), a, b, new))] += n
        vocab = dict(folded)
    return merges


def test_bpe_matches_reference_implementation(spark):
    from aws_datalake_spark.operators.bpe import bpe_merges

    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
        "a-b a-b a-b c$d c$d",   # regex metacharacters as symbols
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.pair, r.new_symbol, r.pair_count)
        for r in bpe_merges(df, num_merges=10).orderBy("merge_rank").collect()
    ]
    assert got == _reference_bpe(texts, 10)


def test_bpe_deterministic_and_min_count_stops(spark):
    from aws_datalake_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [(1, "ab ab xy")], "doc_id long, text string"
    )
    out1 = [(r.merge_rank, r.pair) for r in bpe_merges(df, num_merges=5).collect()]
    out2 = [(r.merge_rank, r.pair) for r in bpe_merges(df, num_merges=5).collect()]
    # only "a b" (count 2) clears min_count=2; "x y" has count 1
    assert out1 == out2 == [(1, "a b")]


def test_bpe_encode_applies_merges_in_order(spark):
    from aws_datalake_spark.operators.bpe import bpe_encode, bpe_merges

    train = spark.createDataFrame(
        [(1, "low low low low low lower lower "
             "newest newest newest newest newest newest widest widest widest")],
        "doc_id long, text string",
    )
    merges = [
        (r.pair.split(" ")[0], r.pair.split(" ")[1])
        for r in bpe_merges(train, num_merges=6).orderBy("merge_rank").collect()
    ]
    test_df = spark.createDataFrame(
        [(1, "lowest low newest")], "doc_id long, text string"
    )
    out = {r.token: (list(r.pieces), r.n_pieces)
           for r in bpe_encode(test_df, merges).collect()}
    # learned merges: es, est, lo, low, ew, ewest
    assert out["low"] == (["low"], 1)
    assert out["lowest"] == (["low", "est"], 2)
    assert out["newest"] == (["n", "ewest"], 2)


@pytest.mark.slow
def test_batched_merges_match_sequential(spark):
    """The batched trainer must produce the EXACT sequential merge
    table — including on adversarial corpora (self-pairs, chained
    merges feeding each other, ties) where naive batching diverges."""
    from aws_datalake_spark.operators.bpe import bpe_merges, bpe_merges_batched

    corpora = [
        # natural text
        ["the quick brown fox", "the lazy dog", "the the the quick"] * 3,
        # self-pair top candidate ('a a') forces batch size 1
        ["aaaa aaab aaba", "aaab baaa"] * 4,
        # created pairs outrank later candidates (merge chains)
        ["abab abab abcd", "abab cdcd", "ababab cd"] * 3,
        # heavy ties: lexicographic tie-breaks must survive batching
        ["xy xz yz zy", "xy xz yz", "zz yy xx"] * 3,
    ]
    for rows in corpora:
        df = spark.createDataFrame([(t,) for t in rows], "text string")
        seq = [
            (r.merge_rank, r.pair, r.new_symbol, r.pair_count)
            for r in bpe_merges(df, num_merges=12).orderBy("merge_rank").collect()
        ]
        for m in (2, 64):
            bat = [
                (r.merge_rank, r.pair, r.new_symbol, r.pair_count)
                for r in bpe_merges_batched(
                    df, num_merges=12, batch_candidates=m
                ).orderBy("merge_rank").collect()
            ]
            assert bat == seq, (rows[0], m)


def test_batched_merges_use_fewer_rounds(spark):
    """On merge-friendly corpora a round must learn >1 merge (the whole
    point: ~K/driver-round-trips for a 32k vocab)."""
    from aws_datalake_spark.operators.bpe import bpe_merges_batched

    df = spark.createDataFrame(
        [("abcdef ghijkl mnopqr",), ("abcdef ghijkl",), ("mnopqr abcdef",)],
        "text string",
    )
    # count collect-rounds by patching DataFrame.collect is brittle;
    # instead assert the result is right and rely on the disjointness
    # of these pairs making one-round batches possible
    out = bpe_merges_batched(df, num_merges=6, batch_candidates=64)
    assert out.count() == 6


def test_two_pass_padded_replace_equals_java_lookaround(spark):
    """The DuckDB oracle applies merges as TWO successive padded
    literal replaces; Spark applies one Java lookaround replaceAll.
    Pin their equality on the adversarial shapes: XYXY runs (where a
    single padded pass skips alternate occurrences), overlapping
    same-symbol runs, and boundary occurrences."""
    import duckdb

    cases = [
        ("a b a b a b", "a b", "ab"),        # 3 adjacent occurrences
        ("a b a b a b a b a b", "a b", "ab"),  # 5
        ("a a a", "a a", "aa"),              # overlapping run
        ("x a b", "a b", "ab"),              # at end
        ("a b x", "a b", "ab"),              # at start
        ("b a b a b", "a b", "ab"),          # interior adjacents
        ("q r s", "a b", "ab"),              # no occurrence
    ]
    import re as _re
    con = duckdb.connect()
    for syms, pair, new in cases:
        # Java lookaround single pass (the Spark path, via JVM regex)
        df = spark.createDataFrame([(syms,)], "syms string")
        from pyspark.sql import functions as F
        pattern = f"(?<=^|[ ]){_re.escape(pair)}(?=[ ]|$)"
        java = df.select(
            F.regexp_replace("syms", pattern, new).alias("r")
        ).collect()[0].r
        duck = con.execute(
            "SELECT trim(replace(replace(' ' || ? || ' ', ?, ?), ?, ?))",
            [syms, f" {pair} ", f" {new} ", f" {pair} ", f" {new} "],
        ).fetchone()[0]
        assert java == duck, (syms, java, duck)
